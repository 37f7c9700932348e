package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopK

/** BoundedTopK must reproduce the window-rank total order exactly —
  * (distance asc, id asc) — across partition boundaries, under ties, and
  * with malformed (null) distances excluded. */
class TopKAggSpec extends SparkSpec {

  import spark.implicits._

  test("bounded_topk equals row_number window order, ties broken on id") {
    // duplicate distances force tie-breaks; 7 partitions force merges
    val df = (1L to 200L).map(i => (i % 3, i, (i % 10).toDouble))
      .toDF("qid", "id", "d").repartition(7)

    val viaAgg = df.groupBy("qid")
      .agg(BoundedTopK.topk(col("d"), col("id"), 5).as("tops"))
      .select(col("qid"), posexplode(col("tops")).as(Seq("r0", "t")))
      .select(col("qid"), col("t.id").as("id"), col("t.distance").as("d"),
        (col("r0") + 1).cast("int").as("rank"))

    val w = Window.partitionBy("qid").orderBy(col("d").asc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("id"), col("d"), col("rank"))

    viaAgg.orderBy("qid", "rank").collect().map(_.toString).toSeq shouldBe
      viaWindow.orderBy("qid", "rank").collect().map(_.toString).toSeq
  }

  test("null distances are excluded; k larger than group is fine") {
    val df = Seq((0L, 1L, Some(2.0)), (0L, 2L, None), (0L, 3L, Some(1.0)))
      .toDF("qid", "id", "d")
    val out = df.groupBy("qid")
      .agg(BoundedTopK.topk(col("d"), col("id"), 10).as("tops"))
      .select(posexplode(col("tops")).as(Seq("r0", "t")))
      .select(col("t.id")).as[Long].collect().toSeq
    out shouldBe Seq(3L, 1L)
  }
}

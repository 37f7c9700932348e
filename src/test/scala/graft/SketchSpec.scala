package graft

import org.apache.spark.sql.functions._

import graft.functions.{HeavyHitters, KmvDistinct}
import graft.operators.Sampling

/** The mergeable sketches: KMV distinct-count (exact below k, estimator
  * at k, partitioning-invariant) and Misra–Gries heavy hitters (exact
  * at capacity, guaranteed bounds below it). */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private def kmvOf(df: org.apache.spark.sql.DataFrame, keyCol: String,
                    k: Int): Double =
    df.agg(KmvDistinct.kmv(Sampling.keyHash(col(keyCol)), k).as("est"))
      .head().getDouble(0)

  test("kmv: exact count while fewer than k distinct keys") {
    // 100 distinct keys, each seen 5 times — duplicates must not count
    val df = (0 until 500).map(i => s"key${i % 100}").toDF("k").repartition(7)
    kmvOf(df, "k", 256) shouldBe 100.0
  }

  test("kmv: estimator matches the (k-1)*range/kthMin replay and is calibrated") {
    val n = 5000
    val df = (0 until n).map(i => s"user$i").toDF("k").repartition(13)
    val k = 64
    // independent replay: k-th smallest distinct hash, same arithmetic
    val kth = df.select(Sampling.keyHash(col("k")).as("h")).distinct()
      .orderBy("h").limit(k).orderBy(col("h").desc).head().getLong(0)
    val expected = (k - 1).toDouble * KmvDistinct.KeyHashRange / kth.toDouble
    val est = kmvOf(df, "k", k)
    est shouldBe expected
    // KMV relative error concentrates around 1/sqrt(k-2) ≈ 12.7%
    math.abs(est - n) / n should be < 0.5
  }

  test("kmv: merge is partitioning-invariant") {
    val rows = (0 until 3000).map(i => s"id${i % 700}")
    val one = kmvOf(rows.toDF("k").coalesce(1), "k", 32)
    val many = kmvOf(rows.toDF("k").repartition(17), "k", 32)
    one shouldBe many
  }

  test("kmv: null keys hash as the empty key (kept or dropped together)") {
    // keyHash maps NULL and "" to the same bucket — the sketch sees ONE
    // distinct hash for them, matching the sampling layer's convention
    val df = Seq(Some("a"), Some("b"), None, None).toDF("k")
    kmvOf(df, "k", 16) shouldBe 3.0
  }

  test("heavy hitters: exact group-by counts when capacity covers the keys") {
    val rows = (0 until 2000).map(i => s"tok${i % 23}")
    val out = rows.toDF("k").repartition(9)
      .agg(HeavyHitters.hitters(col("k"), 64).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.length shouldBe 23
    out.foreach { case (_, c, err) =>
      err shouldBe 0L
      c should (be(86L) or be(87L)) // 2000/23 rounds to 86 or 87 per key
    }
    out.map(_._2).sum shouldBe 2000L
  }

  test("heavy hitters: Misra–Gries bounds hold below capacity") {
    // one dominant key (40%) over a long tail of 400 distinct keys
    val rows = (0 until 4000).map(i =>
      if (i % 5 < 2) "dominant" else s"tail${i % 400}")
    val n = rows.size.toLong
    val m = 20
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = rows.toDF("k").repartition(11)
      .agg(HeavyHitters.hitters(col("k"), m).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.key"), col("h.count"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.length should be <= m
    // any key with true frequency > N/(m+1) is guaranteed to survive
    out.map(_._1) should contain("dominant")
    out.foreach { case (key, est, err) =>
      est should be <= truth(key)          // counter is a lower bound
      (est + err) should be >= truth(key)  // offset restores an upper bound
      err should be <= n / (m + 1)         // decrement depth bound
    }
  }

  test("sketches are callable from SQL") {
    graft.functions.GraftFunctions.register(spark)
    (0 until 300).map(i => s"k${i % 50}").toDF("k")
      .createOrReplaceTempView("sketch_in")
    val kmv = spark.sql(
      """SELECT kmv_distinct(
        |  pmod((aggregate(split(k, ''), 7L, (h, c) -> (h * 131 + ascii(c)) % 1000000007)
        |        * 2654435761), 1000000007), 128) AS est
        |FROM sketch_in""".stripMargin).head().getDouble(0)
    kmv shouldBe 50.0
    val hh = spark.sql(
      "SELECT heavy_hitters(k, 64) AS hh FROM sketch_in")
      .select(org.apache.spark.sql.functions.size(col("hh"))).head().getInt(0)
    hh shouldBe 50
  }
}

package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.operators.Knn

/** Golden-corpus kNN correctness, mirroring the reference's groundtruth
  * evaluation (`QueryTestSuite.scala:50-56`, fixtures from
  * `src/test/resources/groundtruth/`): 2000 rows × 10 dims, Manhattan
  * distance, k=100; ids exact, distances within 1e-4. */
class GroundtruthSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/groundtruth/$name").getPath

  lazy val data: DataFrame = spark.read
    .option("sep", "\t").option("header", "true")
    .csv(res("data.tsv"))
    .select(
      col("id").cast("long").as("tid"),
      split(col("feature"), ",").cast("array<float>").as("vectorfield"),
      col("stringfield"),
      col("floatfield").cast("float"),
      col("doublefield").cast("double"),
      col("intfield").cast("int"),
      col("longfield").cast("long"),
      col("booleanfield").cast("boolean"))

  lazy val queryVec: Seq[Double] = {
    val src = scala.io.Source.fromFile(res("nnquery.txt"))
    try src.mkString.trim.split(",").toSeq.map(_.toDouble) finally src.close()
  }

  private def expected(name: String): Seq[(Double, Long)] = {
    val src = scala.io.Source.fromFile(res(name))
    try src.getLines().map { l =>
      val Array(d, id) = l.split("\t")
      (d.toDouble, id.toLong)
    }.toList finally src.close()
  }

  test("data fixture loads 2000 rows") {
    data.count() shouldBe 2000L
    data.select(org.apache.spark.sql.functions.size(col("vectorfield"))).distinct().collect()
      .map(_.getInt(0)).toSeq shouldBe Seq(10)
  }

  test("sequential Manhattan kNN matches golden 100nn results") {
    val exp = expected("100nn-results.tsv")
    val got = Knn.knn(data,
        Distances.manhattan(col("vectorfield"), Distances.vecLit(queryVec)),
        100, col("tid"))
      .select("tid", Knn.DistanceCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // golden file holds the first 99 neighbours
    got.take(exp.size).zip(exp).foreach { case ((gid, gd), (ed, eid)) =>
      math.abs(gd - ed) should be < Epsilon
      gid shouldBe eid
    }
  }

  test("Boolean-filtered kNN matches golden bq results") {
    val exp = expected("100nn-bq-results.tsv")
    val got = Knn.knnFiltered(data, col("stringfield") === "bq",
        Distances.manhattan(col("vectorfield"), Distances.vecLit(queryVec)),
        100, col("tid"))
      .select("tid", Knn.DistanceCol).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    got.length shouldBe exp.size
    got.zip(exp).foreach { case ((gid, gd), (ed, eid)) =>
      math.abs(gd - ed) should be < Epsilon
      gid shouldBe eid
    }
  }

  test("zero weights make every distance zero (reference QueryTestSuite.scala:59-75)") {
    val w = Distances.vecLit(Seq.fill(10)(0.0))
    val got = Knn.knn(data,
        Distances.manhattanW(col("vectorfield"), Distances.vecLit(queryVec), w),
        100, col("tid"))
      .select(Knn.DistanceCol).collect().map(_.getDouble(0))
    all(got) shouldBe 0.0
  }

  test("rerank over a candidate superset equals brute force") {
    val brute = Knn.knn(data,
        Distances.manhattan(col("vectorfield"), Distances.vecLit(queryVec)),
        50, col("tid"))
      .select("tid").collect().map(_.getLong(0)).toSeq
    val candidates = Knn.knn(data,
        Distances.manhattan(col("vectorfield"), Distances.vecLit(queryVec)),
        500, col("tid")).select("tid")
    val reranked = Knn.rerank(data, candidates, "tid",
        Distances.manhattan(col("vectorfield"), Distances.vecLit(queryVec)), 50)
      .select("tid").collect().map(_.getLong(0)).toSeq
    reranked shouldBe brute
  }
}

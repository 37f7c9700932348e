package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators._

/** Set algebra, projections, and predicate atoms over small frames. */
class OperatorSpec extends SparkSpec {

  import spark.implicits._

  private def ids(xs: (Long, Double)*): DataFrame =
    xs.toSeq.toDF("id", "distance")

  private def resultIds(df: DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("union keeps duplicates (reference does not dedupe)") {
    val u = SetAlgebra.union(ids(1L -> 0.1, 2L -> 0.2), ids(2L -> 0.3, 3L -> 0.4), "id")
    u.count() shouldBe 4
    u.select("distance").distinct().head().getDouble(0) shouldBe 0.0
  }

  test("intersect") {
    resultIds(SetAlgebra.intersect(ids(1L -> 0.1, 2L -> 0.2), ids(2L -> 0.3, 3L -> 0.4), "id")) shouldBe Set(2L)
  }

  test("except") {
    resultIds(SetAlgebra.except(ids(1L -> 0.1, 2L -> 0.2), ids(2L -> 0.3, 3L -> 0.4), "id")) shouldBe Set(1L)
  }

  test("fuzzyUnion takes min score, missing side defaults 0.0") {
    val m = SetAlgebra.fuzzyUnion(ids(1L -> 0.4, 2L -> 0.6), ids(2L -> 0.2, 3L -> 0.9), "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m(1L) shouldBe 0.0 // min(0.4, default 0.0)
    m(2L) shouldBe 0.2
    m(3L) shouldBe 0.0
  }

  test("fuzzyIntersect takes max score") {
    val m = SetAlgebra.fuzzyIntersect(ids(1L -> 0.4, 2L -> 0.6), ids(2L -> 0.2, 3L -> 0.9), "id")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m(1L) shouldBe 0.4
    m(2L) shouldBe 0.6
    m(3L) shouldBe 0.9
  }

  test("vote scores 1 - count/n and ranks ascending") {
    val r = SetAlgebra.vote(Seq(ids(1L -> 0.0, 2L -> 0.0), ids(1L -> 0.0, 3L -> 0.0),
      ids(1L -> 0.0, 2L -> 0.0)), "id", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    r.head shouldBe (1L, 0.0) // in all 3
    r(1)._1 shouldBe 2L // in 2 of 3
    math.abs(r(1)._2 - (1.0 - 2.0 / 3)) should be < Epsilon
  }

  test("projections: named, count, exists, distinct") {
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("k", "v")
    Projections.project(df, Seq("v")).columns.toSeq shouldBe Seq("v")
    Projections.countRows(df).head().getLong(0) shouldBe 3L
    Projections.existsRows(df.filter($"k" > 2)).head().getBoolean(0) shouldBe true
    Projections.existsRows(df.filter($"k" > 9)).head().getBoolean(0) shouldBe false
    Projections.distinctRows(df, Seq("v")).count() shouldBe 2L
  }

  test("predicate atoms build correct filters") {
    import BooleanPredicates._
    val df = Seq((1, "aa", 1.5), (2, "ab", 2.5), (3, "bb", 3.5)).toDF("k", "s", "x")
    df.filter(toColumn(Predicate("k", "in", Seq(1, 3)))).count() shouldBe 2
    df.filter(toColumn(Predicate("k", "!=", Seq(2)))).count() shouldBe 2
    df.filter(toColumn(Predicate("x", ">=", Seq(2.5)))).count() shouldBe 2
    df.filter(toColumn(Predicate("s", "like", Seq("a%")))).count() shouldBe 2
    df.filter(toColumn(Predicate("s", "isnotnull", Nil))).count() shouldBe 3
    df.filter(conjunction(Seq(
      Predicate("k", ">", Seq(1)), Predicate("s", "like", Seq("%b"))))).count() shouldBe 2
  }

  test("predicate with missing value raises IllegalArgumentException") {
    an[IllegalArgumentException] should be thrownBy
      BooleanPredicates.toColumn(BooleanPredicates.Predicate("k", "<", Nil))
  }

  test("unsupported predicate op raises") {
    an[IllegalArgumentException] should be thrownBy
      BooleanPredicates.toColumn(BooleanPredicates.Predicate("k", "regex", Seq("x")))
  }

  test("profile: one row per column with exact null accounting") {
    import spark.implicits._
    val df = Seq((Some(1.0), 10L), (None, 20L), (Some(3.0), 30L))
      .toDF("a", "b")
    val p = graft.operators.Projections.profile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    p("a").getLong(1) shouldBe 3L  // n_rows
    p("a").getLong(2) shouldBe 1L  // n_nulls
    p("a").getDouble(3) shouldBe 1.0
    p("a").getDouble(4) shouldBe 3.0
    p("a").getDouble(5) shouldBe 2.0
    p("b").getLong(2) shouldBe 0L
    p("b").getDouble(6) shouldBe 10.0 // stddev_samp of 10,20,30
    an[IllegalArgumentException] should be thrownBy
      graft.operators.Projections.profile(df, Nil)
    // duplicate column list → refused up front, not an opaque
    // ambiguous-reference AnalysisException from the unpivot
    an[IllegalArgumentException] should be thrownBy
      graft.operators.Projections.profile(df, Seq("a", "a"))
  }
}

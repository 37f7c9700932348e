package graft


import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join semantics + plan shape. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pts = Seq((1L, 5.0), (2L, 10.0), (3L, 10.5), (4L, 25.0), (5L, -3.0))
    .toDF("pid", "v")
  private def ivs = Seq((100L, 0.0, 10.0), (101L, 10.0, 20.0), (102L, -5.0, -1.0),
    (103L, 30.0, 40.0)).toDF("iid", "lo", "hi")

  test("matches BETWEEN semantics exactly (inclusive bounds, negatives)") {
    val got = RangeJoin.pointsInIntervals(pts, "v", ivs, "lo", "hi", binWidth = 4.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = pts.crossJoin(ivs).filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe want
    // boundary point 10.0 is in BOTH [0,10] and [10,20]
    got should contain((2L, 100L))
    got should contain((2L, 101L))
    got should contain((5L, 102L))
  }

  test("each true match joins exactly once (no dup from multi-bin intervals)") {
    // interval spans many bins at tiny width; point matches once
    val out = RangeJoin.pointsInIntervals(pts, "v", ivs, "lo", "hi", binWidth = 0.5)
      .select("pid", "iid").collect()
    out.length shouldBe out.toSet.size
    out.length shouldBe 5 // same cardinality as the cross-filter reference
  }

  test("equi keys restrict matches to the same key") {
    val p = Seq(("a", 1L, 5.0), ("b", 2L, 5.0)).toDF("k", "pid", "v")
    val i = Seq(("a", 10L, 0.0, 10.0)).toDF("k", "iid", "lo", "hi")
    val got = RangeJoin.pointsInIntervals(p, "v", i, "lo", "hi", 4.0, keys = Seq("k"))
      .select("pid").collect().map(_.getLong(0)).toSet
    got shouldBe Set(1L)
  }

  test("inverted (empty) intervals match nothing") {
    val i = Seq((1L, 10.0, 0.0)).toDF("iid", "lo", "hi")
    RangeJoin.pointsInIntervals(pts, "v", i, "lo", "hi", 4.0).count() shouldBe 0L
  }

  test("span guard fails loudly on pathological intervals") {
    val i = Seq((1L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] { // SparkRuntimeException (USER_RAISED_EXCEPTION)
      RangeJoin.pointsInIntervals(pts, "v", i, "lo", "hi", 1.0,
        maxBinsPerInterval = 100L).count()
    }
    ex.getMessage should include("spans more than 100 bins")
  }

  test("plan is a hash equi-join, not a nested loop") {
    val df = RangeJoin.pointsInIntervals(pts, "v", ivs, "lo", "hi", 4.0)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
    plan should include("Join")
  }

  test("intervalsOverlap matches the cross-filter reference exactly once") {
    val l = Seq((1L, 0.0, 10.0), (2L, 5.0, 6.0), (3L, 20.0, 30.0), (4L, -8.0, -1.0))
      .toDF("lid", "l_lo", "l_hi")
    val r = Seq((10L, 9.0, 25.0), (11L, 6.0, 6.0), (12L, 100.0, 120.0),
      (13L, -2.0, 3.0)).toDF("rid", "r_lo", "r_hi")
    for (w <- Seq(0.7, 4.0, 50.0)) {
      val got = RangeJoin.intervalsOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      val want = l.crossJoin(r)
        .filter(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      withClue(s"width $w: ") {
        got.length shouldBe got.toSet.size // exactly once despite shared bins
        got.toSet shouldBe want
      }
    }
    // inclusive touch: [0,10] meets [9,25] and the degenerate [6,6]
    val touch = RangeJoin.intervalsOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 4.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    touch should contain((1L, 10L))
    touch should contain((1L, 11L))
    touch should contain((4L, 13L)) // negative-range overlap
  }

  test("intervalsOverlap honors equi keys and rejects inverted intervals") {
    val l = Seq(("a", 1L, 0.0, 10.0), ("b", 2L, 0.0, 10.0)).toDF("k", "lid", "l_lo", "l_hi")
    val r = Seq(("a", 10L, 5.0, 15.0), ("a", 11L, 9.0, 1.0)).toDF("k", "rid", "r_lo", "r_hi")
    val got = RangeJoin.intervalsOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
        4.0, keys = Seq("k"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    got shouldBe Set((1L, 10L)) // key b never matches; inverted rid 11 dropped
  }

  test("column collisions and bad widths are refused") {
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointsInIntervals(pts, "v", ivs.withColumnRenamed("iid", "pid"),
        "lo", "hi", 4.0)
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointsInIntervals(pts, "v", ivs, "lo", "hi", 0.0)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics: direction, strictness, tolerance, tie-breaks,
  * unmatched rows, and the single-shuffle plan shape. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // left: lookups (user, time); right: quotes (user, time, qid, px)
  private def leftDf = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (1L, ts("2024-01-01 10:30:00"), "b"),
    (2L, ts("2024-01-01 09:00:00"), "c"), // before any right row of user 2
    (3L, ts("2024-01-01 10:00:00"), "d")  // user with no right rows at all
  ).toDF("user_id", "ts", "tag")

  private def rightDf = Seq(
    (1L, ts("2024-01-01 09:59:00"), 10L, 1.0),
    (1L, ts("2024-01-01 10:00:00"), 11L, 2.0), // exactly at left "a"
    (1L, ts("2024-01-01 10:10:00"), 12L, 3.0),
    (2L, ts("2024-01-01 11:00:00"), 20L, 4.0)
  ).toDF("user_id", "ts", "qid", "px")

  private def run(direction: String = "backward", strict: Boolean = false,
                  tol: Option[Long] = None) =
    AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid",
        Seq("qid", "px"), direction, strict, tol)
      .select("tag", "qid", "px")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getLong(1).asInstanceOf[AnyRef]))
      .toMap

  test("backward inclusive: equal-time right row matches; latest wins") {
    val m = run()
    m("a") shouldBe 11L // 10:00 quote, not the 09:59 one
    m("b") shouldBe 12L // most recent before 10:30
    m("c") shouldBe null // no quote at-or-before 09:00
    m("d") shouldBe null // user 3 has no quotes
  }

  test("backward strict: equal-time right row is excluded") {
    run(strict = true)("a") shouldBe 10L // falls back to 09:59
  }

  test("forward inclusive vs strict at an exact-time match") {
    val fwd = AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid",
      Seq("qid"), direction = "forward")
      .select("tag", "qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    fwd("a") shouldBe 11L // inclusive: the 10:00 quote itself
    fwd("b") shouldBe -1L // nothing at-or-after 10:30 for user 1
    fwd("c") shouldBe 20L // user 2's 11:00 quote

    val fwdStrict = AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid",
      Seq("qid"), direction = "forward", strict = true)
      .select("tag", "qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    fwdStrict("a") shouldBe 12L // skips the exactly-at-10:00 quote
  }

  test("tolerance nulls out matches beyond the horizon") {
    // user 2 lookup at 09:00, quote at 11:00 → forward gap is 2 h
    val m = AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid",
      Seq("qid"), direction = "forward", toleranceMicros = Some(3600L * 1000000L))
      .select("tag", "qid").collect()
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    m("c") shouldBe true   // 2 h > 1 h tolerance
    m("a") shouldBe false  // 0 gap
  }

  test("equal-timestamp right rows tie-break deterministically by tieCol") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, 1.0),
      (1L, ts("2024-01-01 10:00:00"), 7L, 2.0),
      (1L, ts("2024-01-01 10:00:00"), 6L, 3.0)
    ).toDF("user_id", "ts", "qid", "px")
    val l = Seq((1L, ts("2024-01-01 11:00:00"), "x")).toDF("user_id", "ts", "tag")
    // backward: highest tie id wins (ORDER BY ts DESC, tie DESC LIMIT 1)
    AsOfJoin.asOf(l, right, Seq("user_id"), "ts", "qid", Seq("qid", "px"))
      .select("qid", "px").head() match {
      case r => r.getLong(0) shouldBe 7L; r.getDouble(1) shouldBe 2.0
    }
    // forward: lowest tie id wins (ORDER BY ts ASC, tie ASC LIMIT 1)
    val l2 = Seq((1L, ts("2024-01-01 09:00:00"), "y")).toDF("user_id", "ts", "tag")
    AsOfJoin.asOf(l2, right, Seq("user_id"), "ts", "qid", Seq("qid", "px"),
      direction = "forward")
      .select("qid", "px").head() match {
      case r => r.getLong(0) shouldBe 5L; r.getDouble(1) shouldBe 1.0
    }
  }

  test("payload columns come from the SAME matched row (struct, not per-column last)") {
    val m = run()
    // "b" matched qid 12 whose px is 3.0 — a per-column last() would
    // still agree here, so check the null-px hazard explicitly:
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, Some(9.0)),
      (1L, ts("2024-01-01 10:10:00"), 2L, None) // later row, null px
    ).toDF("user_id", "ts", "qid", "px")
    val l = Seq((1L, ts("2024-01-01 11:00:00"), "z")).toDF("user_id", "ts", "tag")
    val r = AsOfJoin.asOf(l, right, Seq("user_id"), "ts", "qid", Seq("qid", "px"))
      .select("qid", "px").head()
    r.getLong(0) shouldBe 2L
    r.isNullAt(1) shouldBe true // px of row 2, NOT row 1's 9.0
    m("a") shouldBe 11L
  }

  test("matched right timestamp is exposed") {
    val r = AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid",
        Seq("qid"))
      .filter(col("tag") === "b").select(AsOfJoin.MatchedTsCol).head()
    r.getTimestamp(0) shouldBe ts("2024-01-01 10:10:00")
  }

  test("plan has exactly one exchange (union + single keyed window, no join)") {
    val df = AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid", Seq("qid"))
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Join"
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("null-time and null-key right rows are never served as matches") {
    // A right row with NULL ts would sort first (nulls-first) and, unfixed,
    // become the running match with a null ap_asof_ts; a right row with a
    // NULL key would pair with null-key left rows via partitionBy's
    // null-grouping. Both must behave like the equi-join / LATERAL oracle:
    // no match.
    val right = Seq(
      (Some(1L), Option.empty[Timestamp], 99L, 0.0),             // null ts
      (Option.empty[Long], Some(ts("2024-01-01 09:00:00")), 98L, 0.0), // null key
      (Some(1L), Some(ts("2024-01-01 09:30:00")), 42L, 1.0)      // real match
    ).toDF("user_id", "ts", "qid", "px")
    val l = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), "real"),
      (Option.empty[Long], ts("2024-01-01 10:00:00"), "nullkey")
    ).toDF("user_id", "ts", "tag")
    val m = AsOfJoin.asOf(l, right, Seq("user_id"), "ts", "qid", Seq("qid", "px"))
      .select("tag", "qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    m("real") shouldBe 42L    // the null-ts row 99 must not shadow this
    m("nullkey") shouldBe -1L // NULL = NULL is not a join match
  }

  test("null-time left rows fall through unmatched but are emitted") {
    val l = Seq(
      (1L, Some(ts("2024-01-01 10:00:00")), "t"),
      (1L, Option.empty[Timestamp], "nots")
    ).toDF("user_id", "ts", "tag")
    val m = AsOfJoin.asOf(l, rightDf, Seq("user_id"), "ts", "qid", Seq("qid"))
      .select("tag", "qid").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    m("t") shouldBe 11L
    m("nots") shouldBe -1L // left join: row kept, no match
  }

  test("invalid arguments are refused") {
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid", Seq("qid"),
        direction = "sideways")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid", Seq("tag"))
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asOf(leftDf, rightDf, Seq("user_id"), "ts", "qid", Seq("qid"),
        toleranceMicros = Some(-1L))
  }
}

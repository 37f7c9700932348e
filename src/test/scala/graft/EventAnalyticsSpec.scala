package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

/** Funnel (greedy earliest-chain) and retention-cohort semantics. */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
  private def tsd(day: Int, hour: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel: greedy chain counts in-order steps only") {
    val ev = Seq(
      // user 1 completes in order
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"), (3L, ts(3), 1L, "purchase"),
      // user 2: purchase BEFORE view -> stops at 2 steps
      (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "purchase"), (6L, ts(3), 2L, "view"),
      // user 3: never clicks -> 0 even though later steps occur
      (7L, ts(1), 3L, "view"), (8L, ts(2), 3L, "purchase"),
      // user 4: only clicks
      (9L, ts(5), 4L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnel(ev, Seq("click", "view", "purchase"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    out(1L) shouldBe ((3, true))
    out(2L) shouldBe ((2, false))
    out(3L) shouldBe ((0, false))
    out(4L) shouldBe ((1, false))
  }

  test("funnel: greedy earliest choice never misses a later valid chain") {
    // click at t1 and t4; view only at t2. Greedy takes click@t1 and
    // still finds view@t2. A last-click rule would miss it.
    val ev = Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"), (3L, ts(4), 1L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    EventAnalytics.funnel(ev, Seq("click", "view"))
      .head().getInt(1) shouldBe 2
  }

  test("funnel: same-timestamp events do not advance (strictly-after)") {
    val ev = Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(1), 1L, "view"), // same instant
      (3L, ts(2), 2L, "click"), (4L, ts(3), 2L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnel(ev, Seq("click", "view"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out(1L) shouldBe 1 // view at the click's own instant doesn't count
    out(2L) shouldBe 2
  }

  test("funnel: non-step events never enter the per-user collect (map-side null-out)") {
    // user 1's history is dominated by non-step noise; user 5 has ONLY
    // non-step events and must still appear with 0 steps (all-users
    // contract — a plain pre-filter would drop the row entirely)
    val noise = (100L to 140L).map(i => (i, ts((i % 50).toInt), 1L, "scroll"))
    val ev = (Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"),
      (3L, ts(3), 5L, "hover"), (4L, ts(4), 5L, "scroll")
    ) ++ noise).toDF("event_id", "ts", "user_id", "event_type")
    val df = EventAnalytics.funnel(ev, Seq("click", "view", "purchase"))
    val out = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out(1L) shouldBe 2
    out(5L) shouldBe 0 // present, unmatched — not silently dropped

    // the step-type restriction must run in the PARTIAL aggregate, i.e.
    // below the exchange, so non-step events never shuffle: the plan
    // section after the Exchange line carries the conditional collect
    val plan = df.queryExecution.executedPlan.toString
    val afterExchange = plan.substring(plan.indexOf("Exchange"))
    afterExchange should include("partial_collect_list")
    afterExchange should include("IN (click,view,purchase)")
  }

  test("funnel refuses empty or duplicate step lists") {
    val ev = Seq((1L, ts(1), 1L, "click")).toDF("event_id", "ts", "user_id", "event_type")
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnel(ev, Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnel(ev, Seq("click", "click"))
  }

  test("sessions: gap merges, numbering, bounds, and counts per user") {
    val ev = Seq(
      (1L, ts(1), 1L, "x"), (2L, ts(5), 1L, "x"),   // session 1: gap 4 < 10
      (3L, ts(20), 1L, "x"),                        // session 2: gap 15 > 10
      (4L, ts(7), 2L, "x")                          // user 2: singleton
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.sessions(ev, gapMicros = 10L * 60 * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    out((1L, 1L)) shouldBe ((ts(1).getTime * 1000, ts(5).getTime * 1000, 2L))
    out((1L, 2L)) shouldBe ((ts(20).getTime * 1000, ts(20).getTime * 1000, 1L))
    out((2L, 1L))._3 shouldBe 1L
    out.size shouldBe 3
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.sessions(ev, gapMicros = 0L)
  }

  test("retention: cohorts by first day, distinct active offsets") {
    val ev = Seq(
      // user 1: first seen day 1, active days 1, 2, 4 (two events day 2)
      (1L, tsd(1, 9), 1L, "click"), (2L, tsd(2, 9), 1L, "view"),
      (3L, tsd(2, 20), 1L, "view"), (4L, tsd(4, 9), 1L, "click"),
      // user 2: first seen day 2, active day 2 only
      (5L, tsd(2, 12), 2L, "click"),
      // user 3: first seen day 1, active days 1 and 2
      (6L, tsd(1, 23), 3L, "view"), (7L, tsd(2, 1), 3L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.retention(ev).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    out(("2024-01-01", 0)) shouldBe 2L // users 1 and 3 on their day 0
    out(("2024-01-01", 1)) shouldBe 2L // both return next day (dup events collapse)
    out(("2024-01-01", 3)) shouldBe 1L // only user 1 on day 3
    out(("2024-01-02", 0)) shouldBe 1L // user 2's own cohort
    out.keySet.map(_._1) shouldBe Set("2024-01-01", "2024-01-02")
  }

  test("transitionMatrix: per-user consecutive pairs, cross-user never pairs") {
    val ev = Seq(
      // user 1: click -> view -> click; user 2: view -> view
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"), (3L, ts(3), 1L, "click"),
      (4L, ts(1), 2L, "view"), (5L, ts(2), 2L, "view"),
      // user 3: a single event -> no transition
      (6L, ts(1), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = EventAnalytics.transitionMatrix(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    got shouldBe Map(
      ("click", "view") -> 1L, ("view", "click") -> 1L, ("view", "view") -> 1L)
    // same-timestamp ties order by event_id: 10(a) then 11(b) -> a->b
    val tie = Seq((10L, ts(1), 9L, "a"), (11L, ts(1), 9L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    EventAnalytics.transitionMatrix(tie).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq shouldBe Seq(("a", "b"))
  }

  test("topPaths: first-N prefix in (ts, id) order; ties break on event_id") {
    val ev = Seq(
      // user 1: a>b>c (d falls past steps=3)
      (1L, ts(1), 1L, "a"), (2L, ts(2), 1L, "b"), (3L, ts(3), 1L, "c"),
      (4L, ts(4), 1L, "d"),
      // user 2: same prefix a>b>c
      (5L, ts(1), 2L, "a"), (6L, ts(2), 2L, "b"), (7L, ts(3), 2L, "c"),
      // user 3: same-timestamp tie — event_id order decides: a>b
      (9L, ts(1), 3L, "b"), (8L, ts(1), 3L, "a"),
      // user 4: shorter than steps — path is just what exists
      (10L, ts(1), 4L, "z")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.topPaths(ev, steps = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a>b>c" -> 2L, "a>b" -> 1L, "z" -> 1L)
    // k cuts deterministically by (count desc, path asc)
    EventAnalytics.topPaths(ev, steps = 3, k = 2)
      .collect().map(_.getString(0)).toSeq shouldBe Seq("a>b>c", "a>b")
  }

  test("propsStats: JSON field extraction with missing-parse accounting") {
    val ev = Seq(
      (1L, ts(1), 1L, "x", """{"k": 10}"""),
      (2L, ts(2), 1L, "x", """{"k": 30}"""),
      (3L, ts(3), 2L, "x", """{"other": 1}"""), // key absent -> missing
      (4L, ts(4), 2L, "y", "not json"),         // malformed -> missing
      (5L, ts(5), 2L, "y", """{"k": 7}""")
    ).toDF("event_id", "ts", "user_id", "event_type", "props")
    val out = EventAnalytics.propsStats(ev, "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    out("x") shouldBe ((2L, 1L, 10.0, 30.0, 20.0))
    out("y") shouldBe ((1L, 1L, 7.0, 7.0, 7.0))
  }

  test("hourlyAnomalies: z-score flags the spike hour; flat series emit nothing") {
    // type "spiky": 9 hours at 2 events + one hour at 30 → huge z there
    // type "flat": constant 3/hour → σ=0 → no measurable anomaly
    val spiky = (0 until 9).flatMap(h => Seq(
      (h * 10L, tsd(1 + h / 24, h % 24), 1L, "spiky"),
      (h * 10L + 1, tsd(1 + h / 24, h % 24), 2L, "spiky"))) ++
      (0 until 30).map(i => (900L + i, tsd(2, 10), 1L, "spiky"))
    val flat = (0 until 8).flatMap(h => (0 until 3).map(i =>
      (2000L + h * 10 + i, tsd(3, h), 1L, "flat")))
    val ev = (spiky ++ flat)
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.hourlyAnomalies(ev, threshold = 2.0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    out.map(_._1).toSet shouldBe Set("spiky")
    out.length shouldBe 1
    out.head._2 shouldBe "2024-01-02 10:00"
    out.head._3 shouldBe 30L
  }

  test("funnelCycles: counts repeat completions, resets after each cycle") {
    val ev = Seq(
      // user 1: two full click->view cycles plus a dangling click
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"),
      (3L, ts(3), 1L, "click"), (4L, ts(4), 1L, "view"), (5L, ts(5), 1L, "click"),
      // user 2: view before any click, then one cycle
      (6L, ts(1), 2L, "view"), (7L, ts(2), 2L, "click"), (8L, ts(3), 2L, "view"),
      // user 3: no step events at all -> absent from output
      (9L, ts(1), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelCycles(ev, Seq("click", "view"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 2L
    out(2L) shouldBe 1L
    out.keySet shouldBe Set(1L, 2L) // user 3 pre-filtered out
  }

  test("funnelCycles: strictly-after tie rule; completion can't start next cycle") {
    val ev = Seq(
      // view at the SAME ts as the click: not strictly after -> no cycle
      (1L, ts(1), 1L, "click"), (2L, ts(1), 1L, "view"),
      // user 2: a completing view cannot double as the next cycle's view
      // even though a click follows: c@1 v@2 c@3 -> exactly 1 cycle
      (3L, ts(1), 2L, "click"), (4L, ts(2), 2L, "view"), (5L, ts(3), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelCycles(ev, Seq("click", "view"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 0L
    out(2L) shouldBe 1L
  }

  test("funnelCycles: saturates at maxCycles; 3-step funnel counts") {
    val many = (1 to 10).flatMap(i =>
      Seq((i * 2L, ts(2 * i - 1), 1L, "click"), (i * 2L + 1, ts(2 * i), 1L, "view")))
      .toDF("event_id", "ts", "user_id", "event_type")
    EventAnalytics.funnelCycles(many, Seq("click", "view"), maxCycles = 3)
      .head().getLong(1) shouldBe 3L
    val three = Seq(
      (1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"), (3L, ts(3), 1L, "purchase"),
      (4L, ts(4), 1L, "click"), (5L, ts(5), 1L, "view"), // second cycle incomplete
      (6L, ts(6), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = EventAnalytics.funnelCycles(three, Seq("click", "view", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out(1L) shouldBe 1L
    out(2L) shouldBe 0L // started but never completed
  }

  test("funnelCycles: pre-1970 event time fails loudly (packing epoch floor)") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("1950-01-01 00:00:00"), 1L, "click"),
      (2L, ts(2), 1L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val ex = intercept[Exception] {
      EventAnalytics.funnelCycles(ev, Seq("click", "view")).collect()
    }
    ex.getMessage should include("funnelCycles event time outside")
    // upper boundary: t = 2^51 - 1 micros would store lastTs+1 = 2^51
    // on a step match, carrying into the nextStep bit field — must
    // raise too, not silently corrupt the state machine
    val maxT = new java.sql.Timestamp(2251799813L * 1000L)
    maxT.setNanos(685247000) // epoch micros = 2^51 - 1
    val evHi = Seq((1L, maxT, 1L, "click"), (2L, ts(2), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val exHi = intercept[Exception] {
      EventAnalytics.funnelCycles(evHi, Seq("click", "view")).collect()
    }
    exHi.getMessage should include("funnelCycles event time outside")
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelCycles(ev, (1 to 9).map("s" + _))
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.funnelCycles(ev, Seq("click"), maxCycles = 256)
  }
}

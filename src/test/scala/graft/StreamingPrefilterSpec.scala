package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.{Prefilter, Projections}
import graft.streaming.EventStream

/** Structured-Streaming operators (MemoryStream-driven) and the
  * sequential-scan prefilter trichotomy. */
class StreamingPrefilterSpec extends SparkSpec {

  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed counts aggregate a streamed batch with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.windowedCounts(events, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      mem.addData((1L, ts(5), "click", 1.0), (2L, ts(10), "click", 2.0),
        (3L, ts(20), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getDouble(3))).toSet
      rows shouldBe Set(("click", 2L, 3.0), ("view", 1L, 5.0))
    } finally q.stop()
  }

  test("streaming geofence counts match a batch replay; overlapping fences both count") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.GeoAlgebra
    val fences = Seq(
      (1L, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
      (2L, "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))")) // overlaps fence 1
      .toDF("fence_id", "wkt")
      .select(col("fence_id"), GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
    val mem = MemoryStream[(Long, Timestamp, Double, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "x", "y")
    val q = EventStream.geofenceCounts(events, "x", "y", "ts",
        fences, "fence_id", "ring", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("geofence")
      .outputMode("update").start()
    try {
      val rows = Seq(
        (1L, ts(5), 2.0, 2.0),   // fence 1 only
        (2L, ts(10), 7.0, 7.0),  // overlap region: both fences
        (3L, ts(15), 12.0, 12.0), // fence 2 only
        (4L, ts(20), 20.0, 20.0)) // no fence
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("geofence").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      got shouldBe Set((1L, 2L), (2L, 2L))
      // batch replay of the identical rows through the same predicate
      val batch = rows.toDF("event_id", "ts", "x", "y")
        .join(broadcast(fences), GeoAlgebra.stContains(col("ring"), col("x"), col("y")))
        .groupBy("fence_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      batch shouldBe got
    } finally q.stop()
  }

  test("streaming geodesic radius alerts match a batch replay; overlap counts twice") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Geo
    // two depots ~157 km apart (1° lat + 1° lng at the equator); a
    // 200 km radius overlaps between them
    val pois = Seq((10L, 0.0, 0.0), (20L, 1.0, 1.0))
      .toDF("poi_id", "plat", "plng")
    val mem = MemoryStream[(Long, Timestamp, Double, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "lat", "lng")
    val q = EventStream.geoRadiusAlerts(events, "lat", "lng", "ts",
        pois, "poi_id", "plat", "plng", 200000.0, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("georadius")
      .outputMode("update").start()
    try {
      val rows = Seq(
        (1L, ts(5), 0.1, 0.1),   // near depot 10; ~141 km from 20 → both
        (2L, ts(10), 1.0, 1.0),  // at depot 20; ~157 km from 10 → both
        (3L, ts(15), 1.5, 1.5),  // ~78 km from depot 20 only
        (4L, ts(20), 10.0, 10.0)) // nowhere
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("georadius").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      val batch = rows.toDF("event_id", "ts", "lat", "lng")
        .join(broadcast(pois), Geo.withinRadius(col("lat"), col("lng"),
          col("plat"), col("plng"), lit(200000.0)))
        .groupBy("poi_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe batch
      got.map(_._1) shouldBe Set(10L, 20L)
      got.toMap.apply(20L) shouldBe 3L // events 1, 2, 3
    } finally q.stop()
  }

  test("windowed KMV distinct-users matches a batch replay of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "user_id")
    val q = EventStream.windowedDistinctUsers(events, k = 8, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_kmv")
      .outputMode("update").start()
    try {
      // 20 distinct users for click (> k=8 → estimator path, merged
      // ACROSS two micro-batches), 3 for view (< k → exact)
      mem.addData((0 until 10).map(i => (i.toLong, ts(5), "click", 100L + i)): _*)
      q.processAllAvailable()
      mem.addData((0 until 10).map(i => (50L + i, ts(15), "click", 200L + i)) ++
        Seq((90L, ts(20), "view", 1L), (91L, ts(25), "view", 2L),
          (92L, ts(30), "view", 1L), (93L, ts(40), "view", 3L)): _*)
      q.processAllAvailable()
      val latest = spark.table("win_kmv").collect()
        .map(r => (r.getString(0), r.getDouble(2))).groupBy(_._1)
        .map { case (k2, vs) => k2 -> vs.last._2 }
      // batch replay over the identical rows must agree exactly — the
      // sketch is deterministic and merge-order-free
      val batch = ((0 until 10).map(i => ("click", 100L + i)) ++
        (0 until 10).map(i => ("click", 200L + i)) ++
        Seq(("view", 1L), ("view", 2L), ("view", 1L), ("view", 3L)))
        .toDF("event_type", "user_id")
        .groupBy("event_type")
        .agg(graft.functions.KmvDistinct.kmv(
          graft.operators.Sampling.keyHash(col("user_id")), 8).as("est"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      latest("view") shouldBe 3.0
      latest("click") shouldBe batch("click")
      batch("click") should be > 8.0
    } finally q.stop()
  }

  test("windowed heavy hitters carry MG bounds through streaming state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.windowedHeavyHitters(events, "event_type", m = 2,
        "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_hh")
      .outputMode("update").start()
    try {
      // dominant key across micro-batches + a tail the m=2 summary drops
      mem.addData((0 until 8).map(i => (i.toLong, ts(5), "hot")) ++
        Seq((20L, ts(6), "a"), (21L, ts(7), "b")): _*)
      q.processAllAvailable()
      mem.addData((30 until 36).map(i => (i.toLong, ts(10), "hot")) ++
        Seq((40L, ts(11), "c")): _*)
      q.processAllAvailable()
      val rows = spark.table("win_hh").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      val hot = rows.filter(_._1 == "hot").maxBy(_._2)
      // true count 14; MG lower bound ≤ truth ≤ bound + err
      hot._2 should be <= 14L
      (hot._2 + hot._3) should be >= 14L
    } finally q.stop()
  }

  test("windowed value quantiles match a batch replay of the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.windowedValueQuantiles(events, k = 8, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_qn")
      .outputMode("update").start()
    try {
      // 20 click rows (> k=8 → sampled path, merged ACROSS two
      // micro-batches), 3 view rows (< k → exact quantiles)
      mem.addData((0 until 10).map(i => (i.toLong, ts(5), "click", i * 10.0)): _*)
      q.processAllAvailable()
      mem.addData((0 until 10).map(i => (50L + i, ts(15), "click", 500.0 + i)) ++
        Seq((90L, ts(20), "view", 7.0), (91L, ts(25), "view", 3.0),
          (92L, ts(30), "view", 11.0)): _*)
      q.processAllAvailable()
      val latest = spark.table("win_qn").collect()
        .map(r => (r.getString(0), (r.getInt(2), r.getDouble(3), r.getDouble(5))))
        .groupBy(_._1).map { case (k2, vs) => k2 -> vs.last._2 }
      // view: exact — p50 of {3,7,11} = 7, p99 = 11, full sample kept
      latest("view") shouldBe ((3, 7.0, 11.0))
      // click: the deterministic batch replay of the identical rows
      val batchRows = (0 until 10).map(i => (i.toLong, i * 10.0)) ++
        (0 until 10).map(i => (50L + i, 500.0 + i))
      val batch = batchRows.toDF("event_id", "value")
        .agg(graft.functions.BottomKSample.sample(
          graft.operators.Sampling.keyHash(col("event_id")), col("value"), 8).as("s"))
        .select(graft.functions.BottomKSample.quantileAt(col("s"), 0.5),
          graft.functions.BottomKSample.quantileAt(col("s"), 0.99))
        .head()
      latest("click") shouldBe ((8, batch.getDouble(0), batch.getDouble(1)))
    } finally q.stop()
  }

  test("anomaly stream: spike scored against PRE-spike running stats, state persists") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.BucketCount]
    val q = EventStream.anomalyStream(mem.toDS(), threshold = 2.0, minBuckets = 4)
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    try {
      // six steady buckets train the baseline (counts 10±1)...
      mem.addData((0 until 6).map(h =>
        EventStream.BucketCount("click", ts(h), 10L + (h % 2))): _*)
      q.processAllAvailable()
      // ...then a 40-count spike in a later micro-batch
      mem.addData(EventStream.BucketCount("click", ts(30), 40L))
      q.processAllAvailable()
      val rows = spark.table("anom").collect()
        .map(r => (r.getLong(2), r.getDouble(4), r.getBoolean(5)))
      rows.length shouldBe 7
      val spike = rows.maxBy(_._1)
      spike._3 shouldBe true // flagged
      spike._2 should be > 2.0 // z against the 10.5-mean baseline
      // the training buckets were never flagged
      rows.filter(_._1 <= 11L).forall(!_._3) shouldBe true
    } finally q.stop()
  }

  test("running totals keep per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStream.UserEvent]
    val q = EventStream.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("run_totals")
      .outputMode("update").start()
    try {
      mem.addData(EventStream.UserEvent(1L, ts(1), 10.0))
      q.processAllAvailable()
      mem.addData(EventStream.UserEvent(1L, ts(2), 5.0),
        EventStream.UserEvent(2L, ts(3), 7.0))
      q.processAllAvailable()
      val byUser = spark.table("run_totals").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      byUser(1L) shouldBe ((2L, 15.0))
      byUser(2L) shouldBe ((1L, 7.0))
    } finally q.stop()
  }

  test("sliding means produce overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventStream.slidingMeans(events, "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("slide_means")
      .outputMode("update").start()
    try {
      mem.addData((1L, ts(5), "click", 4.0))
      q.processAllAvailable()
      // a single event lands in two overlapping hour windows
      spark.table("slide_means").count() shouldBe 2
    } finally q.stop()
  }

  test("session windows merge events within the gap, split beyond it") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = EventStream.sessionWindows(events, gap = "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      // user 1: 10:01,10:05 (one session) then 10:30 (new session);
      // user 2: a single event
      mem.addData((1L, ts(1)), (1L, ts(5)), (1L, ts(30)), (2L, ts(7)))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSeq.sorted
      rows shouldBe Seq((1L, 1L), (1L, 2L), (2L, 1L))
    } finally q.stop()
  }

  test("streaming doc dedup drops duplicate content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupDocStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(1), "Same  Doc"), (2L, ts(2), "same doc"), // dup (normalized)
        (3L, ts(3), "other doc"))
      q.processAllAvailable()
      mem.addData((4L, ts(4), "SAME DOC")) // dup again, later micro-batch
      q.processAllAvailable()
      spark.table("dedup_stream").select("doc_id").collect()
        .map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
    } finally q.stop()
  }

  test("streaming URL dedup keys state on the CANONICAL form") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val docs = mem.toDF().toDF("doc_id", "ts", "url")
    val q = EventStream.dedupUrlStream(docs, "url", "ts")
      .writeStream.format("memory").queryName("url_dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts(1), "https://Example.com/a?id=1&utm_source=x"),
        (2L, ts(2), "https://example.com/a/?id=1&gclid=y"), // same canonical
        (3L, ts(3), "https://example.com/b?id=2"))
      q.processAllAvailable()
      mem.addData((4L, ts(4), "HTTPS://example.com:443/a?id=1")) // dup, later batch
      q.processAllAvailable()
      spark.table("url_dedup_stream").select("doc_id").collect()
        .map(_.getLong(0)).toSet shouldBe Set(1L, 3L)
    } finally q.stop()
  }

  test("stream-stream interval join correlates events within the bound only") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long, String)]
    val memR = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStream.correlate(
        memL.toDF().toDF(cols: _*), memR.toDF().toDF(cols: _*),
        within = "10 minutes")
      .writeStream.format("memory").queryName("correlated")
      .outputMode("append").start()
    try {
      // user 1: click at t5, purchase at t9 (within 10m) and t40 (beyond);
      // user 2: purchase with NO prior click — never correlated
      memL.addData((1L, ts(5), 1L, "click"))
      memR.addData((100L, ts(9), 1L, "purchase"), (101L, ts(40), 1L, "purchase"),
        (102L, ts(9), 2L, "purchase"))
      q.processAllAvailable()
      // advance both watermarks far past every match window to flush
      memL.addData((2L, ts(300), 9L, "click"))
      memR.addData((199L, ts(300), 9L, "noise"))
      q.processAllAvailable()
      val rows = spark.table("correlated").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      rows shouldBe Set((1L, 1L, 100L))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched clicks after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long, String)]
    val memR = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStream.correlate(
        memL.toDF().toDF(cols: _*), memR.toDF().toDF(cols: _*),
        within = "10 minutes", watermark = "1 minute", joinType = "leftOuter")
      .writeStream.format("memory").queryName("correlated_outer")
      .outputMode("append").start()
    try {
      // user 1 converts inside the window; user 3's click never matches —
      // it must STILL be emitted (null right side) once the watermark
      // proves no purchase can arrive
      memL.addData((1L, ts(5), 1L, "click"), (2L, ts(5), 3L, "click"))
      memR.addData((100L, ts(9), 1L, "purchase"))
      q.processAllAvailable()
      memL.addData((9L, ts(300), 9L, "click"))
      memR.addData((199L, ts(300), 9L, "noise"))
      q.processAllAvailable()
      val rows = spark.table("correlated_outer").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      rows should contain((1L, 1L, 100L))  // matched pair
      rows should contain((3L, 2L, -1L))   // unmatched click, null right
    } finally q.stop()
  }

  test("streaming as-of join answers each left with the final top-1 right") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("event_id", "ts", "user_id")
    val q = EventStream.asOfCorrelate(
        memL.toDF().toDF(cols: _*), memR.toDF().toDF(cols: _*),
        toleranceMs = 30L * 60 * 1000, watermark = "1 minute")
      .writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").start()
    try {
      // user 1: rights at t2 (ids 100 & 101, tie -> 101) and t8; lefts at
      // t5 (sees the t2 tie) and t9 (sees t8). user 2: left with no
      // right at all. user 3: left whose only right is 40 min stale.
      memR.addData((100L, ts(2), 1L), (101L, ts(2), 1L), (102L, ts(8), 1L),
        (300L, ts(5), 3L))
      memL.addData((1L, ts(5), 1L), (2L, ts(9), 1L), (20L, ts(9), 2L),
        (30L, ts(45), 3L))
      q.processAllAvailable()
      // push the watermark far past every pending left to flush answers
      memL.addData((99L, ts(500), 9L))
      memR.addData((199L, ts(500), 9L))
      q.processAllAvailable()
      memL.addData((98L, ts(510), 9L)) // one more batch so timeouts fire
      q.processAllAvailable()
      val rows = spark.table("asof_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      rows should contain((1L, 1L, 101L))  // tie at t2 -> highest id
      rows should contain((1L, 2L, 102L))  // most recent at-or-before t9
      rows should contain((2L, 20L, -1L))  // no right ever -> null answer
      rows should contain((3L, 30L, -1L))  // only right is beyond tolerance
      // each left answered exactly once
      val answered = spark.table("asof_stream").collect().map(_.getLong(1))
      answered.length shouldBe answered.distinct.length
    } finally q.stop()
  }

  test("streaming as-of answer arrives only after the watermark makes it final") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Long)]
    val memR = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("event_id", "ts", "user_id")
    // 5-minute watermark delay: after the first batch (max ts = t10) the
    // watermark sits at t5, so the t9 right in the SECOND batch is
    // in-time data, not late
    val q = EventStream.asOfCorrelate(
        memL.toDF().toDF(cols: _*), memR.toDF().toDF(cols: _*),
        toleranceMs = 30L * 60 * 1000, watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_final")
      .outputMode("append").start()
    try {
      memL.addData((1L, ts(10), 1L))
      memR.addData((100L, ts(2), 1L))
      q.processAllAvailable()
      // watermark is still behind t10 — a better right (t9) could yet
      // arrive, so nothing may be emitted
      spark.table("asof_final").count() shouldBe 0L
      memR.addData((101L, ts(9), 1L)) // it does arrive, same batch horizon
      q.processAllAvailable()
      memL.addData((99L, ts(500), 9L))
      memR.addData((199L, ts(500), 9L))
      q.processAllAvailable()
      memL.addData((98L, ts(510), 9L))
      q.processAllAvailable()
      val ans = spark.table("asof_final").collect()
        .filter(_.getLong(1) == 1L).map(_.getLong(3))
      ans.toSeq shouldBe Seq(101L) // the late-but-in-time t9 right won
    } finally q.stop()
  }

  test("streaming funnel emits one row per step advance, in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.funnelStream(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("click", "view", "purchase"), watermark = "5 minutes")
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // user 1 advances over two batches; user 2's purchase-before-view
      // never advances past step 1; "noise" types are not even buffered
      mem.addData((1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "noise"),
        (3L, ts(1), 2L, "click"), (4L, ts(2), 2L, "purchase"))
      q.processAllAvailable()
      mem.addData((5L, ts(3), 1L, "view"), (6L, ts(4), 1L, "purchase"))
      q.processAllAvailable()
      mem.addData((97L, ts(500), 9L, "noise"))
      q.processAllAvailable()
      mem.addData((96L, ts(510), 9L, "noise"))
      q.processAllAvailable()
      val rows = spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      rows.filter(_._1 == 1L).map(_._2).sorted shouldBe Seq(1, 2, 3)
      rows.filter(_._1 == 2L).map(_._2) shouldBe Seq(1) // purchase skipped step 2

      // a COMPLETED user's later events must not restart the funnel —
      // the tombstone state blocks re-emission (exactly-once per level)
      mem.addData((7L, ts(520), 1L, "click"), (8L, ts(521), 1L, "view"))
      q.processAllAvailable()
      mem.addData((95L, ts(900), 9L, "noise"))
      q.processAllAvailable()
      mem.addData((94L, ts(910), 9L, "noise"))
      q.processAllAvailable()
      spark.table("funnel_stream").collect()
        .map(r => (r.getLong(0), r.getInt(1))).count(_._1 == 1L) shouldBe 3
    } finally q.stop()
  }

  test("streaming funnel cycles reset per completion across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.funnelCyclesStream(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("click", "view"), watermark = "5 minutes")
      .writeStream.format("memory").queryName("cycles_stream")
      .outputMode("append").start()
    try {
      // user 1: two full cycles split across batches; user 2: same-ts
      // view never completes (strictly-after tie rule)
      mem.addData((1L, ts(1), 1L, "click"), (2L, ts(2), 1L, "view"),
        (3L, ts(1), 2L, "click"), (4L, ts(1), 2L, "view"))
      q.processAllAvailable()
      mem.addData((5L, ts(3), 1L, "click"), (6L, ts(4), 1L, "view"))
      q.processAllAvailable()
      mem.addData((97L, ts(500), 9L, "noise"))
      q.processAllAvailable()
      mem.addData((96L, ts(510), 9L, "noise"))
      q.processAllAvailable()
      val rows = spark.table("cycles_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      rows.filter(_._1 == 1L).map(_._2).sorted shouldBe Seq(1L, 2L)
      rows.filter(_._1 == 2L) shouldBe empty
    } finally q.stop()
  }

  test("streaming funnel folds late-but-in-time events in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.funnelStream(
        mem.toDF().toDF("event_id", "ts", "user_id", "event_type"),
        Seq("click", "view"), watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel_late")
      .outputMode("append").start()
    try {
      // the view ARRIVES first; the click arrives later with an EARLIER
      // event time (still inside the watermark). A fold-on-arrival would
      // reject the view; the buffered fold completes the funnel.
      mem.addData((1L, ts(8), 1L, "view"))
      q.processAllAvailable()
      mem.addData((2L, ts(2), 1L, "click"))
      q.processAllAvailable()
      mem.addData((99L, ts(500), 9L, "x"))
      q.processAllAvailable()
      mem.addData((98L, ts(510), 9L, "x"))
      q.processAllAvailable()
      val rows = spark.table("funnel_late").collect()
        .filter(_.getLong(0) == 1L).map(r => (r.getInt(1), r.getTimestamp(2))).sortBy(_._1)
      rows.map(_._1).toSeq shouldBe Seq(1, 2)
      rows.map(_._2).toSeq shouldBe Seq(ts(2), ts(8)) // advances in EVENT order
    } finally q.stop()
  }

  test("per-row quality verdicts run natively on a stream (stateless map stage)") {
    // the zero-shuffle kernel form needs no foreachBatch: it is a pure
    // projection, so Structured Streaming accepts it directly
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val verdicts = graft.operators.TextAnalysis.qualityVerdictsPerRow(
      docs, "text", "doc_id",
      minQuality = 0.0, maxDupTokenFrac = 0.5, maxTopTokenFrac = 0.9,
      maxDupBigramFrac = 0.9, maxPii = 0)
    val q = verdicts.writeStream.format("memory").queryName("verdict_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "spam spam spam spam spam spam spam spam"),
        (2L, "a varied sentence about the query engine and its storage layer"))
      q.processAllAvailable()
      mem.addData((3L, "another well formed line of text with the usual words in it"))
      q.processAllAvailable()
      val rows = spark.table("verdict_stream")
        .select("id", "keep", "reason").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
      rows(1L) shouldBe ((false, "dup_tokens"))
      rows(2L) shouldBe ((true, "ok"))
      rows(3L) shouldBe ((true, "ok"))
    } finally q.stop()
  }

  private lazy val base = (1L to 1000L).toDF("id")
  private lazy val wanted = Seq(5L, 10L, 700L).toDF("id")

  test("prefilter strategies agree (bloom is a superset)") {
    val semi = Prefilter(base, wanted, "id", Prefilter.SemiJoin)
      .collect().map(_.getLong(0)).toSet
    val isin = Prefilter(base, wanted, "id", Prefilter.ChunkedIsin)
      .collect().map(_.getLong(0)).toSet
    val bloom = Prefilter(base, wanted, "id", Prefilter.Bloom)
      .collect().map(_.getLong(0)).toSet
    semi shouldBe Set(5L, 10L, 700L)
    isin shouldBe semi
    bloom.intersect(semi) shouldBe semi // bloom may over-admit, never drop
    Prefilter.auto(base, wanted, "id").count() should be >= 3L
  }

  test("auto picks chunked-isin in the middle cardinality band") {
    // 6000 candidates: above the Bloom cap (5000), under the isin
    // collect cap (100k) — auto must push IN-lists, not plan a join
    val big = (1L to 7000L).toDF("id")
    val mid = (1L to 6000L).toDF("id")
    val picked = Prefilter.auto(big, mid, "id")
    picked.queryExecution.executedPlan.toString should not include "Join"
    picked.count() shouldBe 6000
  }

  test("chunked-isin above the cardinality cap degrades to a semi-join") {
    val many = (1L to 500L).toDF("id")
    val capped = Prefilter(base, many, "id", Prefilter.ChunkedIsin, isinMaxIds = 100)
    // above the cap: no driver collect, plan is the distributed semi-join
    capped.queryExecution.executedPlan.toString should include("LeftSemi")
    capped.count() shouldBe 500
    val under = Prefilter(base, wanted, "id", Prefilter.ChunkedIsin, isinMaxIds = 100)
    under.queryExecution.executedPlan.toString should not include "LeftSemi"
    under.count() shouldBe 3
  }

  test("salted join equals plain join on skewed keys") {
    // 90% of probe rows share one hot key
    val probe = (1L to 1000L).map(i => (if (i % 10 == 0) i % 7 else 1L, i))
      .toDF("k", "payload")
    val build = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "v")
    val plain = probe.join(build, "k")
    val salted = graft.operators.Skew.saltedJoin(probe, build, "k", nSalts = 8)
    salted.count() shouldBe plain.count()
    salted.columns.toSet shouldBe plain.columns.toSet
    // the physical join key carries the salt, spreading the hot key
    salted.queryExecution.executedPlan.toString should include("ap_salt")
    salted.select("payload").collect().map(_.getLong(0)).sorted shouldBe
      plain.select("payload").collect().map(_.getLong(0)).sorted
  }

  test("preview, empty relation, sketch helpers") {
    Projections.preview(base, 7).count() shouldBe 7
    val empty = Projections.emptyResult(spark)
    empty.count() shouldBe 0
    empty.columns.toSeq shouldBe Seq("ap_id", "ap_distance")
    val cms = Projections.countMinSketch(base.withColumn("k", col("id") % 10), "k")
    cms.estimateCount(3L) should be >= 100L
    val c = Projections.centroid(
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).toDF("v"), "v")
    c shouldBe Seq(2.0, 3.0)
  }
}

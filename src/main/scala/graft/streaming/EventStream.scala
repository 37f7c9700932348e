package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * `(event_id, ts, user_id, event_type, value, props)`.
  *
  * The reference has no dataflow streaming (its "streaming" is gRPC
  * result pagination, SURVEY §2.8); this module is the north-star
  * extension: the same engine operators expressed over unbounded input
  * with watermarks and managed state. Everything here works identically
  * on a bounded DataFrame (batch) and a streaming Dataset — the
  * transformations are pure, and Structured Streaming handles
  * incrementalization.
  */
object EventStream {

  /** Tumbling-window counts per event type with a watermark bounding
    * state: the streaming analog of the `events_hourly` batch query. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), window_))
      .agg(count(lit(1)).as("cnt"), sum("value").as("total_value"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("cnt"), col("total_value"))

  /** Sliding-window mean value per type. */
  def slidingMeans(events: DataFrame, window_ : String = "1 hour",
                   slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), window_, slide))
      .agg(avg("value").as("mean_value"), count(lit(1)).as("cnt"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("mean_value"), col("cnt"))

  /** Gap-based sessionization via the native `session_window` aggregate —
    * the streaming analog of the batch `event_sessions` query. A session
    * extends while consecutive events arrive within `gap`; the watermark
    * closes (and garbage-collects) sessions whose gap has provably
    * passed. Works identically on bounded input. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("events"))

  /** Tumbling-window distinct-user estimate per event type via the KMV
    * sketch — the streaming analog of the `distinct_kmv` batch query.
    * `count(DISTINCT)` is unsupported in streaming aggregations (state
    * would hold every key); the mergeable O(K) KMV buffer is exactly
    * what the state store CAN hold per (type, window), and watermark
    * expiry garbage-collects closed windows. Same estimator, same
    * portable hash — a batch replay of the same rows produces the same
    * estimates. */
  def windowedDistinctUsers(events: DataFrame, k: Int = 64,
                            window_ : String = "1 hour",
                            watermark: String = "2 hours"): DataFrame =
    events
      .filter(col("event_type").isNotNull && col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), window_))
      .agg(graft.functions.KmvDistinct.kmv(
        graft.operators.Sampling.keyHash(col("user_id")), k).as("kmv_users"))
      .select(col("event_type"), col("window.start").as("window_start"),
        col("kmv_users"))

  /** Tumbling-window heavy hitters per window via the bounded
    * Misra–Gries summary: the top event types (or any string key) with
    * guaranteed [count, count+err] bounds, O(m) state per window — the
    * streaming "what is trending" primitive that a per-key groupBy
    * cannot provide over an unbounded key domain. */
  def windowedHeavyHitters(events: DataFrame, keyCol: String, m: Int = 64,
                           window_ : String = "1 hour",
                           watermark: String = "2 hours"): DataFrame =
    events
      .filter(col(keyCol).isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_))
      .agg(graft.functions.HeavyHitters.hitters(col(keyCol), m).as("hh"))
      .select(col("window.start").as("window_start"),
        explode(col("hh")).as("h"))
      .select(col("window_start"), col("h.key").as("key"),
        col("h.count").as("cnt"), col("h.err").as("err"))

  /** Tumbling-window value quantiles per event type via the bottom-k
    * sample aggregate — the quantile member of the streaming sketch
    * trio (KMV distinct, MG hitters, this). State per (type, window) is
    * O(k) regardless of event volume, and the sample membership is a
    * pure function of the event ids, so a replayed/reordered stream
    * yields the SAME windows (the batch `value_quantile_sketch`
    * semantics, windowed). */
  def windowedValueQuantiles(events: DataFrame, k: Int = 64,
                             window_ : String = "1 hour",
                             watermark: String = "2 hours"): DataFrame = {
    import graft.functions.BottomKSample
    events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), window_))
      .agg(BottomKSample.sample(
        graft.operators.Sampling.keyHash(col("event_id")),
        col("value"), k).as("smp"))
      .select(col("event_type"), col("window.start").as("window_start"),
        size(col("smp")).as("n_sample"),
        BottomKSample.quantileAt(col("smp"), 0.5).as("p50"),
        BottomKSample.quantileAt(col("smp"), 0.9).as("p90"),
        BottomKSample.quantileAt(col("smp"), 0.99).as("p99"))
  }

  /** Streaming exact dedup for a document stream: normalized content
    * hash, duplicates dropped within the watermark horizon — the state
    * store only keeps hashes younger than the watermark, which is what
    * makes exact dedup feasible on an unbounded 100 TB/day feed (global
    * exact dedup needs the batch operator). */
  def dedupDocStream(docs: DataFrame, textCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming URL-level dedup — crawl-frontier dedup for an unbounded
    * fetch feed: canonicalize first
    * ([[graft.operators.Url.canonicalizeUrl]]), then drop rows whose
    * CANONICAL URL was already seen inside the watermark horizon.
    * Tracking-param / case / default-port / fragment variants collapse
    * BEFORE the state lookup, so the state key is the canonical form —
    * a raw-string keyed dedup would refetch every utm-tagged repost.
    * Same state-GC story as [[dedupDocStream]]: the store keeps only
    * URLs younger than the watermark. */
  def dedupUrlStream(docs: DataFrame, urlCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("url_canon", graft.operators.Url.canonicalizeUrl(col(urlCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url_canon")

  /** Watermarked stream-stream interval join: correlate each left event
    * with right events of the SAME user within `(0, within]` after it —
    * the click→conversion attribution shape. Both sides carry
    * watermarks and the join condition bounds event time in BOTH
    * directions, so Spark can size the join state buffers and
    * garbage-collect rows whose match window has provably passed — the
    * requirement for running this on two unbounded 100 TB/day feeds.
    * Works identically on bounded frames (batch backfill). */
  def correlate(left: DataFrame, right: DataFrame, within: String,
                watermark: String = "2 hours",
                joinType: String = "inner"): DataFrame = {
    // the user key is aliased DIFFERENTLY per side: with both sides
    // derived from the same batch frame (self-join backfill),
    // l("user_id") === r("user_id") resolves both refs to the same
    // attribute — a trivially-true predicate that would silently pair
    // events ACROSS users
    val l = left.select(col("event_id").as("l_id"), col("ts").as("l_ts"),
        col("user_id").as("l_user"), col("event_type").as("l_type"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col("event_id").as("r_id"), col("ts").as("r_ts"),
        col("user_id").as("r_user"), col("event_type").as("r_type"))
      .withWatermark("r_ts", watermark)
    // joinType "leftOuter" emits unmatched left events (null right
    // columns) once the watermark proves no match can still arrive —
    // the funnel-drop-off side of attribution; same state bounds
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"), joinType)
      .select(col("l_user").as("user_id"), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  final case class AsOfEvent(key: Long, ts: java.sql.Timestamp, id: Long, left: Boolean)
  final case class AsOfPend(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long)])
  final case class AsOfOut(user_id: Long, l_id: Long, l_ts: java.sql.Timestamp,
                           r_id: Option[Long], r_ts: Option[java.sql.Timestamp])

  /** STREAMING as-of join: each left event answered with the single most
    * recent right event of the same user at-or-before it, within
    * `toleranceMs` — emitted exactly once, as soon as the watermark
    * proves the answer final (no earlier right event can still arrive).
    * Unmatched left events emit with null right columns (the funnel
    * side), mirroring [[graft.operators.AsOfJoin]]'s batch semantics
    * (inclusive backward, ties to the highest right id).
    *
    * Spark's stream-stream joins can't express per-row top-1, so this is
    * `flatMapGroupsWithState` over the tagged union of both feeds:
    *  - state per user = pending left events (not yet past the
    *    watermark) + the right-event buffer pruned to the tolerance
    *    horizon behind the watermark — BOTH bounded: lefts drain as the
    *    watermark passes them (event-time timeouts re-fire the group
    *    without new input), rights expire `toleranceMs` behind it. The
    *    required tolerance is exactly what makes 100 TB/day feeds
    *    feasible — unbounded lookback would pin every right event
    *    forever (same argument as [[correlate]]'s two-sided bound).
    *  - a left at `lts` is answerable once `watermark >= lts`: every
    *    right with `rts <= lts` has either arrived or is provably late.
    *
    * Streaming-only: under batch execution the watermark is absent, so
    * nothing ever becomes answerable — batch callers use
    * `AsOfJoin.asOf`, which produces identical results one plan cheaper.
    */
  def asOfCorrelate(left: DataFrame, right: DataFrame, toleranceMs: Long,
                    watermark: String = "2 hours"): Dataset[AsOfOut] = {
    require(toleranceMs > 0, "toleranceMs must be positive (it bounds join state)")
    import left.sparkSession.implicits._
    // NULL keys/event times drop on BOTH sides: a null-time event has
    // no position against the watermark (it can never be proven final)
    // and a null key is not an equi-join key — and either would break
    // the non-nullable AsOfEvent encoding. The batch twin emits
    // null-key/time LEFT rows as unmatched output (no finality proof
    // needed there); the divergence is documented here.
    def clean(df: DataFrame): DataFrame =
      df.filter(col("user_id").isNotNull && col("ts").isNotNull)
    val l = clean(left).select(col("user_id").as("key"), col("ts"),
      col("event_id").as("id"), lit(true).as("left"))
    val r = clean(right).select(col("user_id").as("key"), col("ts"),
      col("event_id").as("id"), lit(false).as("left"))
    l.unionByName(r).withWatermark("ts", watermark).as[AsOfEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfPend, AsOfOut](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (key, rows, state) =>
        val st = state.getOption.getOrElse(AsOfPend(Nil, Nil))
        val incoming = rows.toSeq
        val lefts = st.lefts ++
          incoming.filter(_.left).map(e => (e.ts.getTime, e.id))
        val rights = st.rights ++
          incoming.filterNot(_.left).map(e => (e.ts.getTime, e.id))
        val wm = state.getCurrentWatermarkMs()
        val (ready, pending) = lefts.partition(_._1 <= wm)
        val out = ready.sorted.map { case (lts, lid) =>
          val cand = rights.filter { case (rts, _) =>
            rts <= lts && lts - rts <= toleranceMs }
          if (cand.isEmpty) AsOfOut(key, lid, new java.sql.Timestamp(lts), None, None)
          else {
            val (rts, rid) = cand.max // lexicographic: latest ts, then highest id
            AsOfOut(key, lid, new java.sql.Timestamp(lts),
              Some(rid), Some(new java.sql.Timestamp(rts)))
          }
        }
        // a future left has lts > wm, so its candidates have
        // rts >= lts - tolerance > wm - tolerance
        val keepRights = rights.filter { case (rts, _) => rts > wm - toleranceMs }
        if (pending.isEmpty && keepRights.isEmpty) state.remove()
        else {
          state.update(AsOfPend(pending, keepRights))
          // pending lefts flush when the watermark passes the earliest
          // one; a rights-only buffer gets garbage-collected one
          // tolerance later
          if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
          else state.setTimeoutTimestamp(wm + toleranceMs)
        }
        out.iterator
      }
  }

  final case class FunnelState(step: Int, lastTs: Long, pending: Seq[(Long, String)])
  final case class FunnelAdvance(user_id: Long, steps_completed: Int,
                                 at_ts: java.sql.Timestamp)

  /** STREAMING funnel: emits one row per user per step ADVANCE — the
    * incremental form of [[graft.operators.EventAnalytics.funnel]]'s
    * greedy earliest-chain semantics (exact for existence), on an
    * unbounded feed.
    *
    * Out-of-order safety: events buffer per user until the watermark
    * passes them, then fold into the persistent (step, lastTs) state in
    * event-time order — so a late-but-in-time step-k event arriving
    * after a step-k+1 event still matches in the right order, exactly
    * as the batch operator would. State per user = the constant-size
    * fold state + a buffer bounded by the watermark delay; event-time
    * timeouts drain buffered events without new traffic. Each advance
    * emits exactly once (append mode), so downstream consumers see the
    * funnel as a monotone step stream per user. */
  def funnelStream(events: DataFrame, steps: Seq[String],
                   watermark: String = "2 hours"): Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        val st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
        val all = st.pending ++ rows.toSeq
          // only steps the funnel could ever use need buffering
          .filter(e => stepIdx.contains(e._3))
          .map(e => (e._2.getTime, e._3))
        val wm = state.getCurrentWatermarkMs()
        val (ready, pending) = all.partition(_._1 <= wm)
        var step = st.step
        var lastTs = st.lastTs
        val out = Seq.newBuilder[FunnelAdvance]
        // tie-break same-timestamp events by FUNNEL position, not type
        // name, matching the batch fold's (ts, stepIdx) packed order
        ready.sortBy { case (t, y) => (t, stepIdx(y)) }.foreach { case (t, y) =>
          if (step < steps.size && y == steps(step) && t > lastTs) {
            step += 1; lastTs = t
            out += FunnelAdvance(user, step, new java.sql.Timestamp(t))
          }
        }
        // completed users keep a constant-size tombstone — removing it
        // would RESTART the funnel on their next event and double-emit
        // advances, breaking the exactly-once-per-level contract
        state.update(FunnelState(step, lastTs, pending))
        if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
        out.result().iterator
      }
  }

  final case class CycleState(step: Int, lastTs: Long, cycles: Long,
                              pending: Seq[(Long, String)])
  final case class CycleComplete(user_id: Long, cycle: Long,
                                 completed_at: java.sql.Timestamp)

  /** STREAMING funnel CYCLES: one row per COMPLETED cycle — the
    * incremental twin of
    * [[graft.operators.EventAnalytics.funnelCycles]]: the per-user
    * state machine resets to step 0 after every completion and keeps
    * counting on the unbounded feed (cycle numbers are 1-based and
    * strictly increasing per user). Same out-of-order discipline as
    * [[funnelStream]]: step events buffer until the watermark passes
    * them, then fold in event-time order, so a late-but-in-time event
    * matches exactly as the batch operator would. Unlike the batch
    * form, state here is a native struct — the 63-bit packing (and its
    * 255-cycle / 2041 bounds) exists for ENGINE REPLAY of the batch
    * fold, not for streaming state, so no cap applies. */
  def funnelCyclesStream(events: DataFrame, steps: Seq[String],
                         watermark: String = "2 hours"): Dataset[CycleComplete] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withWatermark("ts", watermark)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CycleState, CycleComplete](OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) { (user, rows, state) =>
        val st = state.getOption.getOrElse(CycleState(0, Long.MinValue, 0L, Nil))
        val all = st.pending ++ rows.toSeq
          .filter(e => stepIdx.contains(e._3))
          .map(e => (e._2.getTime, e._3))
        val wm = state.getCurrentWatermarkMs()
        val (ready, pending) = all.partition(_._1 <= wm)
        var step = st.step
        var lastTs = st.lastTs
        var cycles = st.cycles
        val out = Seq.newBuilder[CycleComplete]
        // same (ts, stepIdx) tie order as the batch packed fold
        ready.sortBy { case (t, y) => (t, stepIdx(y)) }.foreach { case (t, y) =>
          if (y == steps(step) && t > lastTs) {
            lastTs = t
            if (step + 1 == steps.size) {
              step = 0; cycles += 1
              out += CycleComplete(user, cycles, new java.sql.Timestamp(t))
            } else step += 1
          }
        }
        state.update(CycleState(step, lastTs, cycles, pending))
        if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
        out.result().iterator
      }
  }

  final case class BucketCount(event_type: String,
                               window_start: java.sql.Timestamp, cnt: Long)
  final case class BucketAnomaly(event_type: String,
                                 window_start: java.sql.Timestamp, cnt: Long,
                                 mean_before: Double, z: Double,
                                 anomalous: Boolean)
  /** Online mean/variance accumulator (public: the state encoder's
    * generated code must reach the accessors). */
  final case class Welford(n: Long, mean: Double, m2: Double)

  /** Streaming twin of the batch hourly-anomaly detector: score each
    * closed (type, window) bucket count against the type's RUNNING
    * mean/σ (Welford online update), maintained in `mapGroupsWithState`
    * — state per type is three doubles, regardless of stream length.
    * Each bucket is scored against the statistics of the buckets BEFORE
    * it (a spike must not mask itself by inflating the baseline it is
    * judged against); the first `minBuckets` buckets per type only
    * train. Feed it CLOSED windows — the append-mode output of a
    * watermarked [[windowedCounts]]-style aggregation — so each bucket
    * is counted exactly once. */
  def anomalyStream(buckets: Dataset[BucketCount], threshold: Double = 3.0,
                    minBuckets: Int = 5): Dataset[BucketAnomaly] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(_.event_type)
      .flatMapGroupsWithState[Welford, BucketAnomaly](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (tp: String, rows: Iterator[BucketCount], state: GroupState[Welford]) =>
          var st = state.getOption.getOrElse(Welford(0L, 0.0, 0.0))
          // deterministic scoring order within a micro-batch
          val out = rows.toSeq.sortBy(_.window_start.getTime).map { b =>
            val sd = if (st.n > 1) math.sqrt(st.m2 / st.n) else 0.0
            val z = if (sd > 0) (b.cnt - st.mean) / sd else 0.0
            val scored = BucketAnomaly(tp, b.window_start, b.cnt, st.mean, z,
              anomalous = st.n >= minBuckets && sd > 0 &&
                math.abs(z) >= threshold)
            val d = b.cnt - st.mean
            val n1 = st.n + 1
            val mean1 = st.mean + d / n1
            st = Welford(n1, mean1, st.m2 + d * (b.cnt - mean1))
            scored
          }
          state.update(st)
          out.iterator
      }
  }

  /** STREAMING geofence: tag each event with every fence polygon
    * containing its (x, y) point, then count per (fence, tumbling
    * window). Containment is the stateless
    * [[graft.operators.GeoAlgebra.stContains]] raycast evaluated against
    * a BROADCAST static fence dim, so the tagging stage carries ZERO
    * streaming state and no stream-side shuffle; the watermarked
    * windowed count is the only stateful stage. A point inside k
    * overlapping fences counts toward all k. Fence sets too large to
    * broadcast should pre-bucket on [[graft.operators.GeoAlgebra
    * .containsJoin]]'s grid tiles instead — for the dim-sized fence
    * tables this models (the PostGIS-role geofence alerting shape), the
    * broadcast is the right plan. */
  def geofenceCounts(events: DataFrame, xCol: String, yCol: String, tsCol: String,
                     fences: DataFrame, fenceKey: String, ringCol: String,
                     window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .join(broadcast(fences),
        graft.operators.GeoAlgebra.stContains(col(ringCol), col(xCol), col(yCol)))
      .groupBy(window(col(tsCol), window_), col(fenceKey))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(fenceKey), col("cnt"))

  /** STREAMING geodesic proximity alerts — the GEOGRAPHY-role twin of
    * [[geofenceCounts]]: tag each event with every POI within
    * `radiusMeters` great-circle distance of its (lat, lng), then count
    * per (poi, tumbling window). The Haversine predicate
    * ([[graft.operators.Geo.withinRadius]]) evaluates against a
    * BROADCAST static POI dim, so tagging carries ZERO streaming state
    * and no stream-side shuffle; the watermarked windowed count is the
    * only stateful stage. An event inside k POIs' radii counts toward
    * all k. POI sets too large to broadcast should pre-bucket on
    * [[graft.operators.Geo.radiusJoin]]'s lat/lng grid instead — for
    * the dim-sized POI tables this models, the broadcast is the right
    * plan. */
  def geoRadiusAlerts(events: DataFrame, latCol: String, lngCol: String,
                      tsCol: String, pois: DataFrame, poiKey: String,
                      poiLatCol: String, poiLngCol: String,
                      radiusMeters: Double,
                      window_ : String = "1 hour",
                      watermark: String = "2 hours"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .join(broadcast(pois),
        graft.operators.Geo.withinRadius(col(latCol), col(lngCol),
          col(poiLatCol), col(poiLngCol), lit(radiusMeters)))
      .groupBy(window(col(tsCol), window_), col(poiKey))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col(poiKey), col("cnt"))

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(user_id: Long, events: Long, total: Double)

  /** Per-user running totals via `mapGroupsWithState` — arbitrary
    * stateful processing. Pass `idleTimeout` to evict idle users' state
    * on a processing-time timeout (the state-bounding requirement at
    * 100 TB); `None` keeps state indefinitely. */
  def runningTotals(events: Dataset[UserEvent],
                    idleTimeout: Option[String] = None): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None => GroupStateTimeout.NoTimeout
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](timeoutConf) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
            var n = prev.events
            var t = prev.total
            rows.foreach { e => n += 1; t += e.value }
            val next = UserRunning(uid, n, t)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}

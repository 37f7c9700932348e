package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `(event_id, ts, user_id,
  * event_type, …)` shape: funnels and retention cohorts — the product
  * analytics every event warehouse runs, expressed as single-pass
  * Spark plans.
  *
  * Reference scope: ADAMpro has no event analytics at all; this extends
  * the engine's streaming/event brief (sessionization, attribution,
  * as-of) with the remaining classic shapes.
  */
object EventAnalytics {

  /** Funnel completion per user: how far each user progresses through
    * the ordered `steps` sequence under GREEDY earliest-chain semantics
    * (earliest step-1 event, then the earliest step-2 event strictly
    * after it, and so on). Greedy is exact for existence: taking the
    * earliest completion of step k maximizes the time available for
    * step k+1, so a user completes the funnel under greedy iff ANY
    * in-order completion exists. Output: `user_id`, `steps_completed`
    * (0..steps.length), `completed` flag.
    *
    * Plan shape: ONE shuffle (groupBy user) collecting each user's
    * STEP-TYPE (ts, type) pairs time-sorted, then a codegen `aggregate`
    * HOF walks the sorted array once advancing a (step, lastTs) state.
    * Non-step events are nulled out INSIDE the collect (`collect_list`
    * skips nulls), so they never enter the per-user array or the
    * exchange — at 100 TB with whale users and dozens of event types
    * the shuffled/materialized per-key state is bounded by step events
    * only, not the user's whole history — while every user still owns a
    * group (a plain pre-filter would silently drop zero-step users from
    * the output, changing the left-join contract the oracle checks).
    * No join or second shuffle exists; the alternative cascade (one
    * conditional aggregation + join per step) costs `2k` shuffles.
    *
    * Ties: an event at exactly the same timestamp as the previous
    * step's match does NOT advance the funnel (strictly-after
    * semantics, `ts > lastTs`); events of the same type and timestamp
    * are interchangeable. */
  def funnel(events: DataFrame, steps: Seq[String],
             tsCol: String = "ts", userCol: String = "user_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val stepArr = array(steps.map(lit): _*)
    val evs = sort_array(collect_list(when(col(typeCol).isin(steps: _*),
      struct(
        unix_micros(col(tsCol).cast("timestamp")).as("t"),
        col(typeCol).as("y")))))
    // state: (next step index to match, ts of the last matched step)
    val init = struct(lit(0).as("i"), lit(Long.MinValue).as("last"))
    val walk = aggregate(
      evs, init,
      (st, e) => when(
        st.getField("i") < steps.size &&
          e.getField("y") === element_at(stepArr, st.getField("i") + 1) &&
          e.getField("t") > st.getField("last"),
        struct((st.getField("i") + 1).as("i"), e.getField("t").as("last")))
        .otherwise(st))
    events.groupBy(col(userCol).as("user_id"))
      .agg(walk.getField("i").as("steps_completed"))
      .withColumn("completed", col("steps_completed") === steps.size)
  }

  /** Completed funnel CYCLES per user — the repeat-conversion twin of
    * [[funnel]]: instead of reporting how FAR a user got once, count how
    * many TIMES the full `steps` sequence completes (the state machine
    * resets to step 0 after each completion), e.g. repeat
    * view→click→purchase loops. Greedy earliest-chain matching per
    * cycle; matches are strictly-after the previous match (same tie rule
    * as [[funnel]]), and a completing event cannot also start the next
    * cycle. Output: `user_id`, `cycles` (0..`maxCycles`).
    *
    * `cycles` saturates at `maxCycles` (≤ 255) and `steps.size` is
    * capped at 8 — both so the whole fold packs into 63-bit integer
    * arithmetic that any SQL engine replays bit-for-bit: each step
    * event packs as `ts·8 + stepIdx` (sorting the packed longs IS the
    * (ts, stepIdx) sort) and the fold state packs as
    * `(cycles·8 + nextStep)·2^51 + lastTs+1` — ≤ 2047·2^51 + 2^51
    * < 2^62, so both sides stay plain BIGINTs and the whole walk is a
    * `list_reduce` over integers in DuckDB/Trino/anything. The encode
    * constrains event time to `[0, 2^51)` micros (1970..2041); an event
    * outside that window fails loudly via `raise_error` rather than
    * silently corrupting the packing (the epoch floor is intrinsic to
    * the wire-replayable form, not a soft default).
    *
    * Plan shape: identical to [[funnel]] — one user-keyed shuffle of
    * step events only (pre-filtered, so whale users' non-step history
    * never moves; 8 bytes per step event on the wire, no struct
    * overhead), one codegen `aggregate` walk. Users with zero step
    * events are absent (unlike [[funnel]], which keeps every user: a
    * zero-cycle row carries no more signal than absence here, and the
    * pre-filter is what bounds the exchange). */
  def funnelCycles(events: DataFrame, steps: Seq[String],
                   tsCol: String = "ts", userCol: String = "user_id",
                   typeCol: String = "event_type",
                   maxCycles: Int = 255): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"funnelCycles supports 1..8 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(maxCycles > 0 && maxCycles <= 255,
      s"maxCycles must be in 1..255, got $maxCycles")
    val tsLimit = 1L << 51
    val idxCol = steps.zipWithIndex.tail
      .foldLeft(when(col(typeCol) === steps.head, lit(0L))) {
        case (acc, (s, i)) => acc.when(col(typeCol) === s, lit(i.toLong))
      }
    val t = unix_micros(col(tsCol).cast("timestamp"))
    // upper bound is tsLimit-1, NOT tsLimit: a step match stores
    // lastTs+1 in the low 51 bits, so t = 2^51-1 would store 2^51 and
    // carry into the nextStep field (lastTs decodes as -1) — the guard
    // must exclude the last representable microsecond too
    val packed = when(t >= 0L && t < tsLimit - 1L, t * 8L + idxCol)
      .otherwise(raise_error(concat(
        lit("funnelCycles event time outside [1970, 2041) micros: "),
        col(tsCol).cast("string"))))
    val evs = sort_array(collect_list(packed))
    // state = (cycles*8 + nextStep) << 51 | (lastTs + 1); init: all zero
    val walk = aggregate(evs, lit(0L), (st, e) => {
      val evTs = shiftright(e, 3)
      val evIdx = e.bitwiseAND(lit(7L))
      val nextStep = shiftright(st, 51).bitwiseAND(lit(7L))
      val cycles = shiftright(st, 54)
      val lastTs = st.bitwiseAND(lit(tsLimit - 1L)) - 1L
      when(evIdx === nextStep && evTs > lastTs,
        when(nextStep + 1L === steps.size.toLong,
          shiftleft(least(cycles + 1L, lit(maxCycles.toLong)) * 8L, 51)
            + evTs + 1L)
          .otherwise(shiftleft(cycles * 8L + nextStep + 1L, 51) + evTs + 1L))
        .otherwise(st)
    })
    events
      .filter(col(typeCol).isin(steps: _*) &&
        col(tsCol).isNotNull && col(userCol).isNotNull)
      .groupBy(col(userCol).as("user_id"))
      .agg(shiftright(walk, 54).as("cycles"))
  }

  /** Event-type TRANSITION MATRIX: counts of consecutive
    * `(from → to)` event-type pairs over each user's time-ordered
    * stream — the Markov-chain view of product flows (where do users go
    * after a search? what precedes churn-adjacent events?). Ties on
    * timestamp break on the event id, so the matrix is deterministic
    * under re-runs. Output: `(from_type, to_type, n)`.
    *
    * Plan shape: ONE user-keyed window shuffle computes each event's
    * successor (`lead`), then a map-side-combined count on the
    * (from, to) pair — at 100 TB the second exchange carries at most
    * |types|² rows. Payload columns never move: only (user, ts, id,
    * type) enter the window. */
  def transitionMatrix(events: DataFrame, tsCol: String = "ts",
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      // a null type is not a state: dropping it here (not post-lead)
      // makes transitions skip over it, identically in any engine —
      // and keeps from_type never-null so result ordering is
      // NULLS-placement-independent
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top user-journey PREFIXES: each user's first `steps` event types
    * in (ts, id) order joined with `>`, counted across users — the
    * path-mining view of onboarding ("what do users actually do
    * first"), the sequence twin of [[transitionMatrix]]'s one-step
    * pairs. Output: `(path, n_users)`, top `k` by (count desc, path).
    *
    * Plan shape: the user-keyed window's hash partitioning is REUSED by
    * the per-user fold (same key → no second exchange); only
    * (user, ts, id, type) enter the window, rows beyond rank `steps`
    * drop before the fold, and the path count is map-side combined —
    * the final exchange carries at most |observed paths| rows, then a
    * TakeOrdered bounds output at k. */
  def topPaths(events: DataFrame, steps: Int = 5, k: Int = 20,
               tsCol: String = "ts", userCol: String = "user_id",
               typeCol: String = "event_type",
               idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps > 0 && k > 0, s"steps and k must be positive: $steps, $k")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .filter(col(tsCol).isNotNull && col(userCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= steps)
      .groupBy(col(userCol))
      // (rn, type) structs sort by the unique rank — deterministic
      // regardless of collect_list's arrival order
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn"), col(typeCol).as("t")))),
        s => s.getField("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Hourly volume ANOMALIES per event type: z-score of each
    * (type, hour) bucket count against the type's own hourly
    * mean / population-stddev; emit buckets with `|z| ≥ threshold` —
    * the spike/outage detector over an event feed. Types whose hourly
    * volume never varies (σ = 0) have no measurable anomaly and emit
    * nothing.
    *
    * Plan shape: one map-side-combined bucket count, then a |types|-row
    * stats table BROADCAST back onto the buckets — the second pass
    * joins |types·hours| rows against |types| rows, no re-shuffle of
    * the bucket relation. */
  def hourlyAnomalies(events: DataFrame, threshold: Double = 3.0,
                      tsCol: String = "ts",
                      typeCol: String = "event_type"): DataFrame = {
    require(threshold > 0, s"threshold must be positive: $threshold")
    val hourly = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol),
        date_trunc("hour", col(tsCol)).as("__hb"))
      .agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy(col(typeCol))
      .agg(avg(col("cnt")).as("__mean"), stddev_pop(col("cnt")).as("__sd"))
    hourly.join(broadcast(stats), Seq(typeCol))
      .where(col("__sd") > 0 &&
        abs((col("cnt") - col("__mean")) / col("__sd")) >= threshold)
      .select(col(typeCol),
        date_format(col("__hb"), "yyyy-MM-dd HH:00").as("hour"),
        col("cnt"),
        round(col("__mean"), 4).as("mean_cnt"),
        round((col("cnt") - col("__mean")) / col("__sd"), 4).as("z"))
  }

  /** Typed stats over a JSON properties column: extract `$.field` as a
    * number per event and aggregate per type — the "parse the props
    * blob once, keep it columnar" step every event pipeline runs.
    * Malformed / missing extractions count separately instead of
    * silently vanishing. Zero-shuffle until the |types|-row aggregate. */
  def propsStats(events: DataFrame, field: String,
                 propsCol: String = "props",
                 typeCol: String = "event_type"): DataFrame = {
    val v = get_json_object(col(propsCol), s"$$.$field").cast("double")
    events
      .filter(col(typeCol).isNotNull)
      .groupBy(col(typeCol))
      .agg(
        count(v).as("n_parsed"),
        (count(lit(1)) - count(v)).as("n_missing"),
        min(v).as("min_v"),
        max(v).as("max_v"),
        round(avg(v), 4).as("avg_v"))
  }

  /** Gap-based session INTERVALS per user: consecutive events within
    * `gapMicros` merge into one session; output one row per session
    * with `user_id`, `session_id` (1-based per user), and the inclusive
    * `[start_us, end_us]` micros bounds — the interval relation that
    * feeds overlap joins and duration analytics (the batch twin of the
    * streaming `session_window` aggregation, but emitting bounds rather
    * than counts). One user-keyed window shuffle: lag flags session
    * starts, a running sum numbers them, one groupBy folds bounds. */
  def sessions(events: DataFrame, gapMicros: Long,
               tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(gapMicros > 0, "gap must be positive")
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("ap_prev", lag(col(tsCol), 1).over(w))
      .withColumn("ap_new", when(col("ap_prev").isNull ||
        us - unix_micros(col("ap_prev").cast("timestamp")) > gapMicros, 1).otherwise(0))
      .withColumn("ap_sid", sum(col("ap_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col(userCol).as("user_id"), col("ap_sid").as("session_id"))
      .agg(min(us).as("start_us"), max(us).as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Retention cohorts: users grouped by their first-activity day, with
    * active-user counts at each day offset since that first day.
    * Output: `cohort_day` (date), `day_offset`, `n_users` — the
    * retention-curve relation a cohort chart reads directly.
    *
    * Plan shape: one shuffle keyed by user computes each user's cohort
    * day inline with its distinct activity days (a single groupBy with
    * `min` + `collect_set`), then a bounded explode of per-user day
    * offsets feeds one partial-aggregated rollup on (cohort, offset).
    * Shuffled rows are (user, day) pairs and then (cohort, offset)
    * partials — event payloads never move. */
  def retention(events: DataFrame, tsCol: String = "ts",
                userCol: String = "user_id"): DataFrame = {
    val day = to_date(col(tsCol).cast("timestamp"))
    events
      .groupBy(col(userCol).as("user_id"))
      .agg(min(day).as("cohort_day"), collect_set(day).as("days"))
      .select(col("cohort_day"),
        explode(col("days")).as("active_day"))
      .select(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing-`days`-day rolling mean of daily event volume per type,
    * via a RANGE window frame binding event-time seconds over the
    * |types|·|days| DAILY aggregate — gaps in the series are handled by
    * the frame (a ROWS frame would silently average over missing days),
    * and the window never sees raw events. Output: (event_type, day,
    * cnt, avg7) with `avg7` rounded to 4. */
  def rollingDailyAvg(events: DataFrame, days: Int = 7,
                      tsCol: String = "ts",
                      typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("day").cast("long"))
      .rangeBetween(-(days - 1).toLong * 86400, 0)
    daily.select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"), round(avg("cnt").over(w), 4).as("avg7"))
  }

  /** Pearson correlation between event types' daily-count series: the
    * daily aggregate self-joins on day (|types|·|days| rows — the raw
    * events never join), correlated per unordered type pair. */
  def dailyCorr(events: DataFrame, tsCol: String = "ts",
                typeCol: String = "event_type"): DataFrame = {
    val daily = events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol).as("event_type"),
        date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val a = daily.select(col("event_type").as("type_a"),
      col("day"), col("cnt").as("cnt_a"))
    val b = daily.select(col("event_type").as("type_b"),
      col("day"), col("cnt").as("cnt_b"))
    a.join(b, Seq("day")).filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(round(corr(col("cnt_a"), col("cnt_b")), 4).as("corr_daily"),
        count(lit(1)).as("n_days"))
  }

  /** CUBE over (event_type, day): all four grouping sets in one Expand
    * + aggregate — one shuffle carries the partial aggregates of every
    * subtotal level, vs four group-bys re-reading the fact table.
    * Rolled-up cells are labeled `'(all)'` after a not-null filter so
    * the subtotal marker can never collide with data. */
  def cubeReport(events: DataFrame, tsCol: String = "ts",
                 typeCol: String = "event_type",
                 valueCol: String = "value"): DataFrame =
    events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .cube(col(typeCol).as("event_type"), col("day"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
        round(sum(valueCol), 2).as("total_value"))
      .select(col("gid"),
        coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("day"), lit("(all)")).as("day"),
        col("cnt"), col("total_value"))
}

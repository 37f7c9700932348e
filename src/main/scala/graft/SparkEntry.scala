package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Distances, HeavyHitters, KmvDistinct, TextNorm}
import graft.api.QueryOps
import graft.index._
import graft.operators._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2 + the LLM-pipeline battery), each with a DuckDB-oracle
  * SQL equivalent where SQL-expressible.
  *
  * Conventions keeping the Spark result and the DuckDB oracle
  * hash-comparable:
  *  - every floating-point output column is `round(_, 4..6)` in BOTH
  *    engines (absorbs summation-order ulp drift);
  *  - every query has a deterministic total ORDER BY (unrounded sort
  *    keys, then ids);
  *  - aggregate / computed columns carry identical aliases on both sides;
  *  - timestamps are formatted to strings on both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: exact Manhattan kNN, k=100. */
  def entry(spark: SparkSession): DataFrame =
    knnQuery(Distances.manhattan, 100)(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  /** The canonical query vector: embedding of vec_id 0 from the same sf
    * directory, broadcast as a 1-row frame so the whole query stays one
    * distributed plan (no driver collect). */
  private def withQueryVec(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    emb.crossJoin(broadcast(
      emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
  }

  private def knnQuery(dist: (Column, Column) => Column, k: Int,
                       roundTo: Int = 4)(spark: SparkSession, dir: String): DataFrame =
    Knn.knn(withQueryVec(spark, dir), dist(col("embedding"), col("qv")), k, col("vec_id"))
      .select(col("vec_id"), round(col(Knn.DistanceCol), roundTo).as("distance"))

  /** DuckDB-side elementwise fold over the 64-dim embedding vs query. */
  private def duckSum(expr: String): String =
    s"list_sum(list_transform(generate_series(1,64), i -> $expr))"
  private val dx = "CAST(e.embedding[i] AS DOUBLE)"
  private val dq = "CAST(q.qv[i] AS DOUBLE)"
  private def duckKnn(distExpr: String, k: Int, where: String = "",
                      roundTo: Int = 4): String =
    // `+ 0.0` normalizes IEEE signed zero: DuckDB's cosine self-match row
    // rounds to -0.0 while Spark's fused kernel yields +0.0 (hash-relevant).
    s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(d, $roundTo) + 0.0 AS distance FROM (
       |  SELECT e.vec_id, $distExpr AS d FROM embeddings e, q $where
       |) ORDER BY d, vec_id LIMIT $k""".stripMargin

  private val duckDot = duckSum(s"$dx * $dq")
  private val duckNormE = s"sqrt(${duckSum(s"$dx * $dx")})"
  private val duckNormQ = s"sqrt(${duckSum(s"$dq * $dq")})"

  // ---- the battery --------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational operators (SURVEY §2.1, §2.2, §2.5) ---
    "q1_agg" -> ((s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")),

    "projection_filter" -> ((s, d) => Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")),

    "count_lineitem" -> ((s, d) => Projections.countRows(Tables.lineitem(s, d))),

    "exists_highvalue" -> ((s, d) => Projections.existsRows(
      Tables.orders(s, d).filter(col("o_totalprice") > 400000))),

    "distinct_flags" -> ((s, d) => Projections.distinctRows(
      Tables.lineitem(s, d), Seq("l_returnflag", "l_linestatus"))
      .orderBy("l_returnflag", "l_linestatus")),

    "entity_preview" -> ((s, d) =>
      // preview over a deterministically-ordered frame so the k-row
      // sample is oracle-comparable (reference previewData)
      Projections.preview(Tables.documents(s, d).orderBy("doc_id"), 50)
        .select("doc_id")),

    "empty_relation" -> ((s, d) =>
      // the empty-relation operator: a contradiction filter must plan
      // and aggregate to a zero count, not error
      Projections.countRows(Tables.lineitem(s, d).filter(lit(false)))),

    "cached_query" -> ((s, d) => {
      // result-cache node: both evaluations resolve through the cache;
      // the returned frame must still equal the uncached computation
      def compute() = Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
      QueryOps.cached(s"battery-agg-$d")(compute())
      QueryOps.cached(s"battery-agg-$d")(compute())
    }),

    "predicate_in_lt" -> ((s, d) => Tables.lineitem(s, d)
      .filter(BooleanPredicates.conjunction(Seq(
        BooleanPredicates.Predicate("l_returnflag", "in", Seq("A", "N")),
        BooleanPredicates.Predicate("l_quantity", "<", Seq(5.0)))))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")),

    "predicate_like" -> ((s, d) => Tables.orders(s, d)
      .filter(BooleanPredicates.toColumn(
        BooleanPredicates.Predicate("o_orderpriority", "like", Seq("1%"))))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")),

    "predicate_daterange" -> ((s, d) => Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
      .orderBy("o_orderkey")),

    "topk_orders" -> ((s, d) => Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))),

    "events_hourly" -> ((s, d) => Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "hour")),

    "q3_shipping" -> ((s, d) => {
      // TPC-H Q3 shape: small dims broadcast into the fact scan
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(100)
    }),

    "event_sessions" -> ((s, d) => {
      // sessionization: a new session starts after a 30-minute gap
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            tsMicros(col("ts")) - tsMicros(col("prev_ts")) > 1800L * 1000000, 1)
            .otherwise(0))
        .groupBy("user_id")
        .agg(sum("new_session").as("sessions"), count(lit(1)).as("events"))
        .orderBy("user_id")
    }),

    // --- set algebra (SURVEY §2.4) ---
    "set_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      SetAlgebra.union(
        o.filter(col("o_totalprice") > 450000).select(col("o_orderkey").as("id")),
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey").as("id")),
        "id").orderBy("id")
    }),

    "set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      SetAlgebra.intersect(
        o.filter(col("o_totalprice") > 450000).select(col("o_orderkey").as("id")),
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey").as("id")),
        "id").orderBy("id")
    }),

    "set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      SetAlgebra.except(
        o.filter(col("o_totalprice") > 450000).select(col("o_orderkey").as("id")),
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey").as("id")),
        "id").orderBy("id")
    }),

    "fuzzy_union" -> ((s, d) => fuzzyInputs(s, d) match {
      case (l, r) => SetAlgebra.fuzzyUnion(l, r, "id")
        .select(col("id"), round(col("distance"), 6).as("distance")).orderBy("id")
    }),

    "fuzzy_intersect" -> ((s, d) => fuzzyInputs(s, d) match {
      case (l, r) => SetAlgebra.fuzzyIntersect(l, r, "id")
        .select(col("id"), round(col("distance"), 6).as("distance")).orderBy("id")
    }),

    "compound_setalgebra" -> ((s, d) => {
      // recursive compound query tree — the reference's nested
      // AggregationExpression shape (((A ∪ B) ∩ C) \ D) evaluated as one
      // declarative plan; previously only the gRPC glue exercised it
      val o = Tables.orders(s, d)
      def ids(c: Column) = o.filter(c).select(col("o_orderkey").as("id"))
      val u = SetAlgebra.union(
        ids(col("o_totalprice") > 400000),
        ids(col("o_orderpriority") === "1-URGENT"), "id")
      val i = SetAlgebra.intersect(u, ids(col("o_orderstatus") === "F"), "id")
      SetAlgebra.except(i, ids(col("o_orderdate") < lit("1995-01-01")), "id")
        .orderBy("id")
    }),

    "distance_dispatch" -> ((s, d) => {
      // name-based dispatch through the canonical alias map (§2.7
      // dispatch glue): alias spellings and the generic minkowski-p
      // resolve to the same kernels the named queries use; unknown
      // names fall back to euclidean (reference MessageParser default)
      def by(n: String) = Distances.byName(n)(col("embedding"), col("qv"))
      withQueryVec(s, d).select(col("vec_id"),
          round(by("Minkowski-1"), 4).as("d_l1"),
          round(by("minkowski-2"), 4).as("d_l2"),
          round(by("SquaredEuclidean"), 4).as("d_l2sq"),
          round(by("minkowski-inf"), 4).as("d_linf"),
          round(by("no-such-distance"), 4).as("d_default"))
        .orderBy("vec_id")
    }),

    "vote_topk" -> ((s, d) => {
      val o = Tables.orders(s, d)
      SetAlgebra.vote(Seq(
        o.filter(col("o_totalprice") > 450000).select(col("o_orderkey").as("id")),
        o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey").as("id")),
        o.filter(col("o_orderstatus") === "F").select(col("o_orderkey").as("id"))),
        "id", 500)
        .select(col("id"), round(col("distance"), 6).as("distance"))
    }),

    // --- sequential kNN, 12 distances (SURVEY §2.1, §2.7) ---
    "knn_manhattan" -> knnQuery(Distances.manhattan, 100),
    "knn_euclidean" -> knnQuery(Distances.euclidean, 100),
    "knn_sqeuclidean" -> knnQuery(Distances.sqEuclidean, 100),
    "knn_chebyshev" -> knnQuery(Distances.chebyshev, 100),
    "knn_cosine" -> knnQuery(Distances.cosine, 100, roundTo = 6),
    "knn_minkowski3" -> knnQuery(Distances.minkowski(_, _, 3.0), 100),
    "knn_hamming" -> knnQuery(Distances.hamming, 100),
    "knn_spannorm" -> knnQuery(Distances.spanNorm, 100),
    "knn_correlation" -> knnQuery(Distances.correlation, 100, roundTo = 6),
    "knn_chisquared" -> knnQuery((a, b) =>
      Distances.chiSquared(posify(a), posify(b)), 100),
    "knn_kl" -> knnQuery((a, b) =>
      Distances.kullbackLeibler(posify(a), posify(b)), 100),
    "knn_jaccard" -> knnQuery((a, b) =>
      Distances.jaccard(posify(a), posify(b)), 100, roundTo = 6),
    "knn_modulo" -> knnQuery((a, b) =>
      Distances.modulo(posify(a), posify(b)), 100),
    "knn_haversine" -> knnQuery((a, b) =>
      Distances.haversine(geoify(a), geoify(b)), 100, roundTo = 2),

    // --- Boolean-filtered kNN + candidate rerank (SURVEY §2.1, §2.3) ---
    "knn_manhattan_weighted" -> ((s, d) => {
      val w = Distances.vecLit((1 to 64).map(i => (i % 4 + 1) * 0.25))
      Knn.knn(withQueryVec(s, d),
          Distances.manhattanW(col("embedding"), col("qv"), w), 100, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "knn_chisquared_weighted" -> ((s, d) => {
      val w = Distances.vecLit((1 to 64).map(i => (i % 4 + 1) * 0.25))
      Knn.knn(withQueryVec(s, d),
          Distances.chiSquaredW(posify(col("embedding")), posify(col("qv")), w),
          100, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "knn_hamming_weighted" -> ((s, d) => {
      val w = Distances.vecLit((1 to 64).map(i => (i % 4 + 1) * 0.25))
      Knn.knn(withQueryVec(s, d),
          Distances.hammingW(col("embedding"), col("qv"), w), 100, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "stream_windowed_counts" -> ((s, d) =>
      // batch execution of the Structured Streaming operator — identical
      // code path runs incrementally over readStream input
      graft.streaming.EventStream.windowedCounts(Tables.events(s, d))
        .select(col("event_type"),
          date_format(col("window_start"), "yyyy-MM-dd HH:00").as("hour"),
          col("cnt"), round(col("total_value"), 4).as("total_value"))
        .orderBy("event_type", "hour")),

    "event_session_windows" -> ((s, d) =>
      // native session_window aggregation, batch execution of the
      // streaming operator (same code path runs over readStream input)
      graft.streaming.EventStream.sessionWindows(Tables.events(s, d))
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("events"))
        .orderBy("user_id", "session_start")),

    "event_attribution" -> ((s, d) => {
      // click→purchase attribution through the watermarked interval
      // join, run in batch mode (identical code path runs over two
      // readStream feeds; the (0, within] bound keeps stream state
      // GC-able). Timestamps emitted as epoch micros — harness-sortable
      // on both engines.
      val ev = Tables.events(s, d)
      graft.streaming.EventStream.correlate(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          within = "30 minutes")
        .select(col("user_id"), col("l_id"), col("r_id"),
          tsMicros(col("l_ts")).as("l_us"), tsMicros(col("r_ts")).as("r_us"))
        .orderBy("user_id", "l_id", "r_id")
    }),

    "event_attribution_unmatched" -> ((s, d) => {
      // the funnel-drop-off side: clicks with NO purchase inside the
      // window, via the left-outer interval join (streaming emits these
      // once the watermark proves no match can arrive)
      val ev = Tables.events(s, d)
      graft.streaming.EventStream.correlate(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "purchase"),
          within = "30 minutes", joinType = "leftOuter")
        .filter(col("r_id").isNull)
        .select(col("user_id"), col("l_id"), tsMicros(col("l_ts")).as("l_us"))
        .orderBy("user_id", "l_id")
    }),

    "geo_radius_join" -> ((s, d) => {
      // 2-D grid-binned radius JOIN (every point within 300 km of every
      // 50th point as POI) — one hash equi-join on radius-sized lat/lng
      // cells, never a nested loop; exact Haversine filter after.
      // Grid built with 5 mm slack past the radius so the rounded
      // cutoff below is the ONLY cut both engines apply.
      val emb = Tables.embeddings(s, d)
      def latOf(c: Column) = (element_at(c, 1).cast("double") * 20.0)
      def lngOf(c: Column) = (element_at(c, 2).cast("double") * 40.0)
      val pts = emb.select(col("vec_id"), latOf(col("embedding")).as("lat"),
        lngOf(col("embedding")).as("lng"))
      val pois = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("poi_id"), latOf(col("embedding")).as("poi_lat"),
          lngOf(col("embedding")).as("poi_lng"))
      Geo.radiusJoin(pts, "lat", "lng", pois, "poi_lat", "poi_lng", 300000.005)
        .select(col("poi_id"), col("vec_id"), round(col("dist_m"), 2).as("dist_m"))
        .filter(col("dist_m") <= 300000.0)
        .orderBy("poi_id", "vec_id")
    }),

    "table_profile" -> ((s, d) =>
      // ANALYZE-style column statistics in ONE aggregation pass
      Projections.profile(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("column")),

    "corpus_mix_rollup" -> ((s, d) =>
      // OLAP rollup: per-(source, lang) counts with per-source and
      // grand totals in one Expand-based aggregation
      Tables.documents(s, d)
        .rollup(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .select(coalesce(col("source"), lit("<all>")).as("source"),
          coalesce(col("lang"), lit("<all>")).as("lang"),
          col("n_docs"), col("total_chars"))
        .orderBy("source", "lang")),

    "event_funnel" -> ((s, d) =>
      // greedy earliest-chain funnel in ONE shuffle: per-user sorted
      // event collect + codegen aggregate() fold (the 2k-shuffle
      // cascade alternative is the oracle's formulation)
      EventAnalytics.funnel(Tables.events(s, d),
          Seq("click", "view", "purchase"))
        .orderBy("user_id")),

    "event_retention" -> ((s, d) =>
      EventAnalytics.retention(Tables.events(s, d))
        .orderBy("cohort_day", "day_offset")),

    "event_transitions" -> ((s, d) =>
      EventAnalytics.transitionMatrix(Tables.events(s, d))
        .orderBy("from_type", "to_type")),

    "event_top_paths" -> ((s, d) =>
      // top user-journey prefixes (first 5 event types per user) — the
      // sequence view of onboarding; one user-keyed exchange, reused by
      // the per-user fold
      EventAnalytics.topPaths(Tables.events(s, d), steps = 5, k = 20)),

    "event_props_stats" -> ((s, d) =>
      // typed extraction over the JSON props blob: per-type stats of
      // $.k with explicit missing-parse accounting
      EventAnalytics.propsStats(Tables.events(s, d), "k")
        .orderBy("event_type")),

    "event_anomalies" -> ((s, d) =>
      // hourly volume spikes/dips: |z| >= 3 vs the type's own hourly
      // distribution; stats table broadcast back onto the buckets
      EventAnalytics.hourlyAnomalies(Tables.events(s, d), threshold = 3.0)
        .orderBy("event_type", "hour")),

    "event_value_quantiles" -> ((s, d) =>
      // per-type value distribution (exact interpolated percentiles,
      // same continuous-quantile definition both engines share)
      Tables.events(s, d)
        .filter(col("event_type").isNotNull) // Spark sorts NULLS FIRST,
        // DuckDB NULLS LAST — excluded on both sides for hash parity
        .groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.95)"), 4).as("p95"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy("event_type")),

    "events_active_users" -> ((s, d) => {
      // DAU + trailing-7-day WAU in two aggregations: each (user, day)
      // activity row explodes into the 7 window-END days it contributes
      // to — the scalable alternative to a per-day distinct-over-range
      // self-join; the exchange carries (user, day) pairs only
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ud.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
      val wau = ud.select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, Seq("day")).orderBy("day")
    }),

    "event_funnel_report" -> ((s, d) =>
      // the chart-facing rollup of event_funnel: users per funnel depth
      EventAnalytics.funnel(Tables.events(s, d), Seq("click", "view", "purchase"))
        .groupBy("steps_completed").agg(count(lit(1)).as("n_users"))
        .orderBy("steps_completed")),

    "session_overlap_join" -> ((s, d) => {
      // interval-interval overlap: activity sessions (7-day gap) of two
      // event types, per user — binned on the overlap-start bin so
      // every overlapping pair joins exactly once, no nested loop
      val ev = Tables.events(s, d)
      val gapUs = 7L * 86400L * 1000000L
      def sessionsOf(tpe: String, pre: String) =
        EventAnalytics.sessions(ev.filter(col("event_type") === tpe), gapUs)
          .select(col("user_id"), col("session_id").as(s"${pre}_sid"),
            col("start_us").as(s"${pre}_s"), col("end_us").as(s"${pre}_e"))
      RangeJoin.intervalsOverlap(
          sessionsOf("click", "c"), "c_s", "c_e",
          sessionsOf("error", "e"), "e_s", "e_e",
          binWidth = gapUs.toDouble, keys = Seq("user_id"))
        .select("user_id", "c_sid", "e_sid", "c_s", "c_e", "e_s", "e_e")
        .orderBy("user_id", "c_sid", "e_sid")
    }),

    "range_join_price_bands" -> ((s, d) => {
      // pure range-predicate join (no equi key) — Catalyst alone would
      // plan BroadcastNestedLoopJoin; the binned form is a hash join on
      // floor(value/width) with exactly-once match semantics
      val bands = Tables.part(s, d).select(col("p_partkey"),
        (col("p_retailprice") - 5).as("lo"), (col("p_retailprice") + 5).as("hi"))
      val pts = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      RangeJoin.pointsInIntervals(pts, "l_extendedprice", bands, "lo", "hi",
          binWidth = 10.0)
        .groupBy("p_partkey")
        .agg(count(lit(1)).as("n_in_band"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"))
        .orderBy("p_partkey")
    }),

    "event_asof_attribution" -> ((s, d) => {
      // as-of join: every purchase attributed to the MOST RECENT click
      // of the same user at-or-before it, within a 30-minute horizon —
      // the point-in-time top-1 the interval join can't express without
      // a per-row re-aggregation. One shuffle on user_id, running
      // last(ignoreNulls) window, no range-join row explosion.
      val ev = Tables.events(s, d)
      AsOfJoin.asOf(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id").as("p_id"), col("ts"), col("user_id")),
          ev.filter(col("event_type") === "click")
            .select(col("event_id").as("c_id"), col("ts"), col("user_id")),
          keys = Seq("user_id"), tsCol = "ts", tieCol = "c_id",
          payload = Seq("c_id"),
          toleranceMicros = Some(1800L * 1000000L))
        .select(col("user_id"), col("p_id"), tsMicros(col("ts")).as("p_us"),
          col("c_id"), tsMicros(col(AsOfJoin.MatchedTsCol)).as("c_us"))
        .orderBy("user_id", "p_id")
    }),

    "event_asof_next" -> ((s, d) => {
      // forward + strict variant: each click's NEXT strictly-later
      // purchase within 30 minutes (earliest wins, lowest id on ties) —
      // same single-shuffle union+window plan scanned on negated time
      val ev = Tables.events(s, d)
      AsOfJoin.asOf(
          ev.filter(col("event_type") === "click")
            .select(col("event_id").as("c_id"), col("ts"), col("user_id")),
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id").as("p_id"), col("ts"), col("user_id")),
          keys = Seq("user_id"), tsCol = "ts", tieCol = "p_id",
          payload = Seq("p_id"),
          direction = "forward", strict = true,
          toleranceMicros = Some(1800L * 1000000L))
        .select(col("user_id"), col("c_id"), tsMicros(col("ts")).as("c_us"),
          col("p_id"), tsMicros(col(AsOfJoin.MatchedTsCol)).as("p_us"))
        .orderBy("user_id", "c_id")
    }),

    "text_bpeish_tokens" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.bpeishTokenCount(col("text")).as("bpeish_cnt"))
      .orderBy("doc_id")),

    "ann_ivf_topk" -> ((s, d) => {
      // IVF-flat = eCP coarse quantizer; whole query batch in ONE job
      val emb = Tables.embeddings(s, d)
      val idx = cachedIndex(s, d, "ecp").asInstanceOf[ECPIndex]
      val queries = emb.filter(col("vec_id") <= 2)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toSeq
      Ann.ivfTopK(emb, idx, "vec_id", "embedding", queries, k = 10, timesK = 50)
        .select(col("qid"), col("vec_id"), round(col("distance"), 4).as("distance"))
        .orderBy("qid", "distance", "vec_id")
    }),

    "index_vote_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val dist = Distances.euclidean(col("embedding"), Distances.vecLit(q))
      val ecp = cachedIndex(s, d, "ecp")
      val pq = cachedIndex(s, d, "pq")
      val voted = SetAlgebra.vote(
        Seq(ecp.candidates(q, 100), pq.candidates(q, 100)), "vec_id", 500)
      Knn.rerank(emb, voted, "vec_id", dist, 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "lsh_cosine_neardup" -> ((s, d) =>
      Ann.lshCosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        0.5, dim = 64).orderBy("id_a", "id_b")),

    "corpus_cosine_neardup" -> ((s, d) => {
      // embedding admission check: incoming vectors (vec_id >= 400) vs
      // the ingested corpus; the banded corpus index is a build-once
      // artifact cached per data dir (cosine twin of corpus_neardup)
      val emb = Tables.embeddings(s, d)
      val idx = cosineCorpusIndexes.getOrElseUpdate(d,
        Ann.indexCorpusCosine(emb.filter(col("vec_id") < 400),
          "vec_id", "embedding", dim = 64))
      Ann.cosineNearDupAgainstCorpus(emb.filter(col("vec_id") >= 400),
          "vec_id", "embedding", idx, 0.5)
        .orderBy("in_id", "corpus_id")
    }),

    "knn_filtered" -> ((s, d) =>
      Knn.knnFiltered(withQueryVec(s, d), col("label") < 5,
        Distances.manhattan(col("embedding"), col("qv")), 50, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))),

    "prefilter_isin_knn" -> ((s, d) => {
      val base = withQueryVec(s, d)
      val candidates = base.filter(col("vec_id") % 3 === 0).select("vec_id")
      val filtered = Prefilter(base, candidates, "vec_id", Prefilter.ChunkedIsin)
      Knn.knn(filtered, Distances.manhattan(col("embedding"), col("qv")), 50, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "knn_radius" -> ((s, d) => {
      // range query through the VA-file's jobless range prune + exact
      // verify; compares on the 4-dp-rounded distance on both sides,
      // with prune slack covering the rounding half-step
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val vaf = cachedIndex(s, d, "vaf").asInstanceOf[VAIndex]
      val pruned = emb.join(vaf.rangeCandidates(q, 1.2501), Seq("vec_id"), "left_semi")
      Knn.radius(pruned,
          round(Distances.euclidean(col("embedding"), Distances.vecLit(q)), 4),
          1.25, col("vec_id"))
        .select(col("vec_id"), col(Knn.DistanceCol).as("distance"))
    }),

    "knn_rerank_half" -> ((s, d) => {
      val base = withQueryVec(s, d)
      Knn.rerank(base, base.filter(col("vec_id") % 2 === 0), "vec_id",
        Distances.manhattan(col("embedding"), col("qv")), 50)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    // --- ANN batch search + embedding near-dup (LLM pipeline) ---
    "ann_batch_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.bruteForceTopK(emb,
        emb.filter(col("vec_id") <= 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "vec_id", "qid", "embedding", "qv", Distances.euclidean, 10)
        .select(col("qid"), col("vec_id"),
          round(col("distance"), 4).as("distance"), col("rank").as("rnk"))
        .orderBy("qid", "rnk")
    }),

    "ann_binary_topk" -> ((s, d) => {
      // 1-bit-per-dim sign codes: Hamming over the packed-long relation
      // (32x less I/O than the float table) prunes to 4k candidates,
      // exact cosine reranks only those
      val emb = Tables.embeddings(s, d)
      Ann.binarySignTopK(emb,
        emb.filter(col("vec_id") <= 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "vec_id", "qid", "embedding", "qv", dim = 64, k = 10)
        .select(col("qid"), col("vec_id"),
          round(col("distance"), 6).as("distance"), col("rank").as("rnk"))
        .orderBy("qid", "rnk")
    }),

    // headline runs the banded scale path (same verified result on the
    // fixed corpus); the exact O(n^2) form survives only as the
    // in-bucket verifier inside Ann.lshCosineNearDupPairs. This entry
    // DELIBERATELY identical to lsh_cosine_neardup: the exact O(n^2)
    // headline this entry used to run is a non-plan at scale (verdict:
    // BroadcastNestedLoopJoin), and every differentiation was MEASURED
    // unsound on this corpus — 8-bit chunks miss the single borderline
    // 0.513 pair (~28% collision odds), threshold 0.45 catches only
    // 12/14 exact pairs under the default banding. Both names pin the
    // one config whose recall the fixed corpus verifies; the exact form
    // remains the in-bucket verifier inside lshCosineNearDupPairs and
    // is exercised directly in DedupTextSpec.
    "cosine_neardup" -> ((s, d) =>
      Ann.lshCosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        0.5, dim = 64).orderBy("id_a", "id_b")),

    // --- vector index scans + exact rerank (SURVEY §2.6) ---
    // Exact family (vaf/vav/vap): candidates are provably lossless, so the
    // reranked result equals brute force and is oracle-checkable.
    "index_vaf_knn" -> indexKnn("vaf"),
    "index_vav_knn" -> indexKnn("vav"),
    "index_vap_knn" -> indexKnn("vap"),
    // Approximate family: params tuned so candidates cover the exact
    // top-100 on the fixed corpus (recall=1.0 asserted in IndexSpec) —
    // the reranked result then equals brute force and is oracle-checked.
    "index_ecp_knn" -> indexKnn("ecp"),
    "index_pq_knn" -> indexKnn("pq"),
    "index_sh_knn" -> indexKnn("sh", timesK = 10),
    "index_lsh_knn" -> indexKnn("lsh"),
    "index_mi_knn" -> indexKnn("mi", timesK = 10),
    "index_ivfpq_knn" -> indexKnn("ivfpq"),
    "index_sq_knn" -> indexKnn("sq"),
    // OPQ: learned-rotation PQ (Ge et al. CVPR'13) — same ADC scan as
    // pq, candidates from the rotated space, exact euclidean rerank
    "index_opq_knn" -> indexKnn("opq"),
    "index_nsw_knn" -> indexKnn("nsw"),
    // the recommended (served-default) NSW build: heuristic neighbor
    // selection at the Run-29 budget ladder — exact at the verify SF
    // (ef ≥ shard size ⇒ provable candidate cover), recall 0.99 at scale
    "index_nsw_heur_knn" -> indexKnn("nsw_heur"),

    "ann_refine_topk" -> ((s, d) => {
      // three-stage funnel: 1-bit Hamming coarse scan → 8-bit ADC refine
      // over coarse survivors only (semi-join) → exact cosine top-50.
      // Full vectors are read for 100 rows; the corpus pass is 1 bit/dim
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val bsq = cachedIndex(s, d, "bsq")
      val sq = hybridSqIndexes.getOrElseUpdate(d,
        Ann.buildCosineSQIndex(emb, "vec_id", "embedding"))
      Ann.refineTopK(emb, "vec_id", "embedding", bsq, sq, q, 50)
        .select(col("vec_id"),
          round(col(Knn.DistanceCol), 6).as("distance"))
    }),

    "index_bsq_knn" -> ((s, d) => {
      // persisted sign-code index: Hamming candidates (angular proxy),
      // exact COSINE rerank — bsq conforms to the cosine family only,
      // and its oracle replays BOTH phases exactly, so correctness does
      // not depend on candidate recall like the L2-oracled family
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val idx = cachedIndex(s, d, "bsq")
      idx.knn(emb, "vec_id",
          Distances.cosine(col("embedding"), Distances.vecLit(q)), q, 100, 5)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 6).as("distance"))
    }),

    // --- lifecycle / planner / progressive / partitioning / multimodal ---
    "entity_lifecycle" -> ((s, d) => {
      val base = freshScratch("lifecycle")
      val e = graft.core.Entity.create(s, base, "li")
      val src = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      e.insert(src.filter(col("l_returnflag") === "A"))
      e.insert(src.filter(col("l_returnflag") =!= "A"))
      e.deleteWhere(col("l_linestatus") === "F")
      e.read().groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("l_returnflag")
    }),

    "entity_snapshot_diff" -> ((s, d) => {
      // incremental-consumer view of entity history: what changed
      // between snapshot v1 and the live v3 after an upsert (reprice +
      // new band) and a delete — keys only, ops aggregated with key
      // bounds so the oracle replays from the base table
      val base = freshScratch("snapdiff")
      val e = graft.core.Entity.create(s, base, "sd")
        .retainVersions(3) // keep v1..v3 snapshots on disk for the diff
      val orders = Tables.orders(s, d)
      e.insert(orders.filter(col("o_totalprice") >= 400000)) // v1
      val repriced = orders.filter(col("o_totalprice") >= 400000 &&
          col("o_orderstatus") === "O")
        .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
      val fresh = orders.filter(col("o_totalprice") >= 300000 &&
        col("o_totalprice") < 400000)
      e.upsert(repriced.unionByName(fresh), "o_orderkey") // v2
      e.deleteWhere(col("o_orderstatus") === "F")          // v3
      e.diffVersions(1, 3, "o_orderkey")
        .groupBy("op")
        .agg(count(lit(1)).as("cnt"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("op")
    }),

    "entity_upsert" -> ((s, d) => {
      // merge-by-key: expensive orders get repriced (replace), a band of
      // mid-priced orders arrives as new keys (append) — one atomic
      // versioned rewrite, survivors via a single keyed anti-join
      val base = freshScratch("upsert")
      val e = graft.core.Entity.create(s, base, "up")
      val orders = Tables.orders(s, d)
      e.insert(orders.filter(col("o_totalprice") >= 400000))
      val repriced = orders.filter(col("o_totalprice") >= 400000 &&
          col("o_orderstatus") === "O")
        .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
      val fresh = orders.filter(col("o_totalprice") >= 300000 &&
        col("o_totalprice") < 400000)
      e.upsert(repriced.unionByName(fresh), "o_orderkey")
      e.read().groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    "planner_hint_knn" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val vaf = cachedIndex(s, d, "vaf")
      val plan = graft.plans.Planner.choose(
        Seq(graft.plans.Planner.ExactHint), Seq(vaf), "euclidean")
      graft.plans.Planner.run(plan, emb, "vec_id",
          Distances.euclidean(col("embedding"), Distances.vecLit(q)), q, 100)
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "progressive_knn" -> ((s, d) => {
      import scala.concurrent.ExecutionContext.Implicits.global
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val dist = Distances.euclidean(col("embedding"), Distances.vecLit(q))
      def seqPlan() = Knn.knn(emb, dist, 100, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
      val ecp = cachedIndex(s, d, "ecp")
      val best = graft.plans.Progressive.timed(s, Seq(
        graft.plans.Progressive.PlanSpec("sequential", 1.0, () => seqPlan()),
        graft.plans.Progressive.PlanSpec("index:ecp", 0.5,
          () => ecp.knn(emb, "vec_id", dist, q, 100)
            .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance")))),
        deadlineMs = 300000)
      // highest confidence wins => the exact sequential result
      s.createDataFrame(java.util.Arrays.asList(best.result.get: _*), seqPlan().schema)
    }),

    "timed_knn" -> ((s, d) => {
      import scala.concurrent.ExecutionContext.Implicits.global
      // the §2.8 TIMED query as a correctness row: with a deadline
      // generous enough for the exact leg to land, the winner is
      // always the max-confidence (exact) result — deterministic and
      // oracle-checkable — and the losing index leg is cancelled. The
      // deadline-expired fallback path stays spec-covered
      // (PlannerSpec), where nondeterminism is the point.
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val dist = Distances.euclidean(col("embedding"), Distances.vecLit(q))
      def exact() = Knn.knn(emb, dist, 50, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
      val lsh = cachedIndex(s, d, "lsh")
      val best = graft.plans.Progressive.timed(s, Seq(
        graft.plans.Progressive.PlanSpec("timed-sequential", 1.0, () => exact()),
        graft.plans.Progressive.PlanSpec("timed-index:lsh", 0.5,
          () => lsh.knn(emb, "vec_id", dist, q, 50)
            .select(col("vec_id"),
              round(col(Knn.DistanceCol), 4).as("distance")))),
        deadlineMs = 600000)
      s.createDataFrame(java.util.Arrays.asList(best.result.get: _*),
        exact().schema)
    }),

    "partition_pruned_scan" -> ((s, d) => {
      // ByColumn layout + key-skip: kNN over ONLY the label∈{0,1,2}
      // parquet directories (Catalyst partition pruning, no data IO for
      // the other labels) — lossless, so the exact kNN oracle applies.
      // eCP leader-skip stays the approximate variant (PlannerSpec):
      // measured on this corpus, exact top-k recall under leader-skip
      // requires keep = ALL clusters, so it cannot carry this oracle.
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      // the partitioned entity is a one-time artifact (like an index
      // build) — created once per (JVM, data dir), reused by scans;
      // pruned reads go through Entity.readPrunedKeys
      val pruned = graft.core.Entity.open(s, partLayout(s, d), "embp")
        .readPrunedKeys(Seq(0, 1, 2))
      Knn.knn(pruned, Distances.euclidean(col("embedding"), Distances.vecLit(q)),
          50, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "zorder_pruned_scan" -> ((s, d) =>
      // z-order layout queried on the NON-leading column: a plain
      // single-column sort would leave l_partkey scattered across every
      // file, but the Morton layout gives each file a bounded l_partkey
      // range, so the pushed BETWEEN filter skips most row groups
      // (pruning asserted file-by-file in Plans). Lossless by
      // construction — the oracle is the unlaid-out filtered scan.
      s.read.parquet(zorderLayout(s, d))
        .filter(col("l_partkey").between(100, 120))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("l_quantity"), 2).as("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    "entity_vacuum" -> ((s, d) => {
      val base = freshScratch("vac")
      val e = graft.core.Entity.create(s, base, "li")
      e.insert(Tables.lineitem(s, d).filter(col("l_quantity") >= 49))
      e.vacuum(numPartitions = 4) // rewrite must preserve content exactly
      e.read().groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("l_returnflag")
    }),

    "sparse_roundtrip" -> ((s, d) => {
      // sparsify → densify round trip preserves every element
      val base = freshScratch("sparse")
      val e = graft.core.Entity.create(s, base, "emb")
      e.insert(Tables.embeddings(s, d).select("vec_id", "embedding"))
      e.sparsify("embedding")
      e.read().select(col("vec_id"),
          round(aggregate(graft.functions.SparseVectors.densify(col("embedding")),
            lit(0.0), (a, x) => a + x.cast("double")), 4).as("vec_sum"))
        .orderBy("vec_id")
    }),

    "knn_sparse" -> ((s, d) => {
      // the sparse struct is scanned DIRECTLY by the sparse kernel —
      // no densify in the plan, O(nnz) work per row on sparse data
      // (reference Distance.scala:26-55 sparse path). The sparsified
      // entity is a one-time layout artifact, reused across scans.
      val q = queryVecOf(Tables.embeddings(s, d))
      val e = graft.core.Entity.open(s, sparseLayout(s, d), "emb")
      Knn.knn(e.read(),
          graft.functions.SparseDistances.toQuery("euclidean", col("embedding"), q),
          100, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "centroid_by_label" -> ((s, d) => Tables.embeddings(s, d)
      .select(col("label"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(round(avg("v"), 6).as("m"))
      .orderBy("label", "dim")),

    "import_export_roundtrip" -> ((s, d) => {
      val out = freshScratch("ie") + "/docs"
      graft.core.ImportExport.export(Tables.documents(s, d), "json", out)
      graft.core.ImportExport.importTable(s, "json", out)
        .select("doc_id").orderBy("doc_id")
    }),

    "random_gen_stats" -> ((s, d) =>
      // the RNG itself has no cross-engine oracle; its CONTRACT does
      graft.core.RandomData.generate(s, 500, 16)
        .agg(count(lit(1)).as("n"), min(size(col("feature"))).as("dmin"),
          max(size(col("feature"))).as("dmax"))),

    "prefilter_bloom_knn" -> ((s, d) => {
      // Bloom pre-prune (may over-admit) + exact semi-join verify + kNN:
      // the correctness-preserving two-stage composition
      val base = withQueryVec(s, d)
      val candidates = base.filter(col("vec_id") % 5 === 0).select("vec_id")
      val admitted = Prefilter(base, candidates, "vec_id", Prefilter.Bloom)
      val verified = Prefilter(admitted, candidates, "vec_id", Prefilter.SemiJoin)
      Knn.knn(verified, Distances.manhattan(col("embedding"), col("qv")), 50, col("vec_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
    }),

    "vertical_reassembly" -> ((s, d) => {
      // per-attribute handler assignment: scalar group in parquet, price
      // group in ORC; reassembly = pk join (reference Entity.scala:91-110)
      val base = verticalScratch
      val groups = Seq(
        graft.core.Vertical.Group("meta", Seq("o_orderstatus", "o_orderpriority")),
        graft.core.Vertical.Group("price", Seq("o_totalprice"),
          graft.sources.StorageHandlers("orc")))
      graft.core.Vertical.write(Tables.orders(s, d), "o_orderkey", groups, base,
        numPartitions = 8)
      graft.core.Vertical.read(s, "o_orderkey", groups, base,
          Seq("o_orderstatus", "o_totalprice"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    "multimodal_decode" -> ((s, d) => {
      val assets = Multimodal.syntheticAssets(Tables.documents(s, d), "doc_id", "text")
      Multimodal.decodeAssets(assets, dim = 16)
        .select(col("asset_id"), col("modality"), col("n_bytes"))
        .orderBy("asset_id")
    }),

    "video_keyframe_plan" -> ((s, d) => {
      // H.264-shaped frame sampling with NO decoder: real ISO-BMFF bytes
      // per doc (deterministic stsz sizes / stss sync samples), keyframe
      // positions + byte sizes read back from the container tables, first
      // 2 keyframes per asset. The oracle replays the generator formula —
      // so build → parse → plan is byte-level verified end to end.
      val assets = Multimodal.syntheticMp4Assets(Tables.documents(s, d), "doc_id")
      Multimodal.mp4KeyframePlan(assets, maxFrames = 2)
        .orderBy("asset_id", "frame_idx")
    }),

    "image_neardup_dhash" -> ((s, d) => {
      // REAL perceptual pipeline: deterministic pattern PNGs (3 variants
      // per group: base / rescaled / one-cell edit) → ImageIO decode →
      // 9×8 grid dHash → 4×16-bit banded pairs (exact for Hamming ≤ 3).
      // The oracle never decodes a pixel: it replays Multimodal.patternLum
      // analytically (constant-luminance cells aligned to the dHash grid
      // make expected == actual bit-for-bit) and re-derives the pair set.
      val ids = Tables.documents(s, d).filter(col("doc_id") < 600).select("doc_id")
      Multimodal.imageNearDupPairs(
          Multimodal.syntheticPatternImages(ids, "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "audio_neardup_ahash" -> ((s, d) => {
      // same contract for audio: envelope WAVs (base / 16 kHz resample /
      // one silenced window) → sampled-audio decode → 65-window RMS
      // aHash → banded pairs; oracle replays Multimodal.envAmp (adjacent
      // windows differ by ≥ 2000, so RMS ordering == amp ordering)
      val ids = Tables.documents(s, d).filter(col("doc_id") < 600).select("doc_id")
      Multimodal.audioNearDupPairs(
          Multimodal.syntheticEnvelopeAudio(ids, "doc_id"))
        .orderBy("id_a", "id_b")
    }),

    "strip_lines" -> ((s, d) => {
      // C4-style line-level dedup; the bundled corpus carries no
      // newlines, so line structure is derived in-plan (one word per
      // line) — the operator's split/normalize/count-distinct/rewrite
      // path is exercised for real, and the oracle replays it in SQL
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), translate(col("text"), " ", "\n").as("ltext"))
      Dedup.stripRepeatedLines(docs, "doc_id", "ltext", minDocs = 10)
        .orderBy("doc_id")
    }),

    // --- dedup + text analysis (LLM pipeline) ---
    "dedup_exact_groups" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .orderBy("content_hash")),

    "dedup_survivors" -> ((s, d) =>
      Dedup.dropExactDups(Tables.documents(s, d), "text", "doc_id")
        .select("doc_id").orderBy("doc_id")),

    "dedup_pipeline" -> ((s, d) =>
      Dedup.dedupPipeline(Tables.documents(s, d), "text", "doc_id",
        minQuality = 0.5, threshold = 0.5).orderBy("doc_id")),

    "minhash_neardup" -> ((s, d) =>
      Dedup.minhashNearDupPairs(Tables.documents(s, d), "text", "doc_id", 0.5)
        .orderBy("id_a", "id_b")),

    // the mega-bucket-guarded plan: maxBucket=32 sits far above the
    // corpus's real bucket maximum (3 at sf0.01, 4 at sf0.1 — measured),
    // so the result is bit-identical to the uncapped run and the exact
    // cartesian oracle still applies; the cap's DROP semantics are
    // spec-verified on a synthetic boilerplate corpus (DedupTextSpec)
    "minhash_neardup_capped" -> ((s, d) =>
      Dedup.minhashNearDupPairs(Tables.documents(s, d), "text", "doc_id", 0.5,
          maxBucket = 32)
        .orderBy("id_a", "id_b")),

    "ngram_jaccard_neardup" -> ((s, d) =>
      Dedup.ngramJaccardNearDupPairs(Tables.documents(s, d), "text", "doc_id", 0.5)
        .orderBy("id_a", "id_b")),

    "dedup_components" -> ((s, d) =>
      // clustering over the banded-minhash candidates — what a production
      // pipeline feeds the clustering step. The oracle's closure runs over
      // the EXACT pair set; they agree because minhash recall on this
      // corpus is verified 1.0 (same caveat as minhash_neardup itself —
      // the lossless ngram generator would double the most expensive
      // query in the battery for no additional verification power)
      Dedup.connectedComponents(
        Dedup.minhashNearDupPairs(Tables.documents(s, d), "text", "doc_id", 0.5))
        .orderBy("id")),

    "neardup_keep_best" -> ((s, d) =>
      // near-dup cluster survivors: keep the LONGEST doc per connected
      // component (ties → lowest id), pass unclustered docs through —
      // the keep-best policy a production dedup actually ships (same
      // minhash-recall caveat as dedup_components)
      Dedup.nearDupKeepBest(Tables.documents(s, d), "text", "doc_id",
          threshold = 0.5, priority = col("n_chars"))
        .select("doc_id").orderBy("doc_id")),

    "hybrid_search_rrf" -> ((s, d) => {
      // hybrid retrieval: BM25 top-50 and cosine top-50 fused by
      // reciprocal rank; both rankings are TakeOrdered-bounded BEFORE
      // the rank window, so the windows and the fusion join see 50 rows
      // each regardless of corpus size. The vector leg rides the SQ8
      // index over NORMALIZED embeddings (unit vectors: L2 ranks as
      // cosine) — the ranking scan reads the byte-codes relation, and
      // the raw embedding table is touched only by the candidate-bounded
      // exact rerank (IndexSpec asserts id-for-id equality with the
      // brute-force leg)
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val lex = TextSearch.bm25TopK(docs, "doc_id", "text",
          Seq("vector", "join", "hash"), 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id").asc)))
      val idx = hybridSqIndexes.getOrElseUpdate(d,
        Ann.buildCosineSQIndex(emb, "vec_id", "embedding"))
      val vec = Ann.cosineTopKIndexed(emb, "vec_id", "embedding", idx, q, 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col(Knn.DistanceCol).asc, col("vec_id").asc)))
        .withColumnRenamed("vec_id", "doc_id")
      TextSearch.rrfFuse(lex, vec, "doc_id")
        .orderBy(col("rrf").desc, col("doc_id").asc).limit(20)
        .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))
    }),

    "corpus_neardup" -> ((s, d) => {
      // admission check: incoming docs (id >= 400) vs the ingested corpus;
      // the corpus index is a build-once artifact (cached per data dir —
      // rebuilding per query would leak one persisted pair per call)
      val docs = Tables.documents(s, d)
      val idx = corpusIndexes.getOrElseUpdate(d,
        Dedup.indexCorpus(docs.filter(col("doc_id") < 400), "text", "doc_id"))
      Dedup.nearDupAgainstCorpus(docs.filter(col("doc_id") >= 400),
          "text", "doc_id", idx, 0.5)
        .orderBy("in_id", "corpus_id")
    }),

    "simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDupPairs(Tables.documents(s, d), "text", "doc_id", 3)
        .orderBy("id_a", "id_b")),

    "repeated_chunks" -> ((s, d) =>
      Dedup.repeatedChunks(Tables.documents(s, d), "doc_id", "text")
        .orderBy("chunk_hash")),

    "strip_repeated_chunks" -> ((s, d) =>
      // boilerplate REMOVAL: rewrite every document with the tokens of
      // corpus-duplicated windows stripped (the fix, not just the report)
      Dedup.stripRepeatedChunks(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "dedup_keep_longest" -> ((s, d) =>
      Dedup.dropExactDupsBy(Tables.documents(s, d), "text", "doc_id",
          length(col("text")))
        .select("doc_id").orderBy("doc_id")),

    "corpus_mix_report" -> ((s, d) => Tables.documents(s, d)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"))
      .orderBy("source", "lang")),

    "unigram_logppl" -> ((s, d) =>
      TextAnalysis.unigramLogPerplexity(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "bigram_logppl" -> ((s, d) =>
      // interpolated bigram LM perplexity: boilerplate repeating common
      // TRANSITIONS (not just common words) scores low; the model build
      // and the scoring are one plan (three counts + joins, no collect)
      TextAnalysis.bigramLogPerplexity(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "text_nfc_normalize" -> ((s, d) =>
      // Unicode NFC via the codegen'd NfcNormalizeExpr; the appended
      // suffix mixes decomposed e+U+0301, the U+212B angstrom singleton,
      // and A+U+030A so the normalization actually has work to do on
      // the (mostly-ASCII) corpus — all three compose to precomposed
      // forms that must match DuckDB's nfc_normalize byte-for-byte
      Tables.documents(s, d)
        .select(col("doc_id"),
          TextNorm.nfc(concat(col("text"),
            lit(" cafe\u0301 \u212B A\u030A"))).as("norm"))
        .orderBy("doc_id")),

    "event_funnel_cycles" -> ((s, d) =>
      EventAnalytics.funnelCycles(Tables.events(s, d),
          Seq("click", "view", "purchase"))
        .orderBy("user_id")),

    "sample_split_assign" -> ((s, d) =>
      Sampling.splitAssign(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split").orderBy("doc_id")),

    "sample_split_by_content" -> ((s, d) =>
      // leakage-safe split: the split key is the NORMALIZED CONTENT
      // hash, so exact/whitespace-case duplicates always land in the
      // same split — the train/test contamination a row-keyed split
      // cannot prevent
      Sampling.splitAssign(
          Tables.documents(s, d)
            .withColumn("content_key", md5(Dedup.normalize(col("text")))),
          "content_key", Seq("train" -> 0.9, "test" -> 0.1))
        .select("doc_id", "split").orderBy("doc_id")),

    // --- web-corpus URL hygiene (no url column in testdata: messyUrl
    // derives a deterministic crawl-style URL per doc, with scheme case,
    // default ports, tracking params, param order, trailing slashes and
    // fragments all varying — both engines build the identical string) ---
    "url_canonicalize" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), messyUrl(col("doc_id")).as("url_raw"))
        .select(col("doc_id"), col("url_raw"),
          Url.canonicalizeUrl(col("url_raw")).as("url_canon"),
          Url.registrableDomain(Url.host(col("url_raw"))).as("domain"))
        .orderBy("doc_id")),

    "url_dedup_canonical" -> ((s, d) =>
      // raw URLs are all distinct (per-doc tracking params); canonical
      // forms collapse to ≤60 groups — the URL-level dedup C4/FineWeb
      // run before any content hashing
      Url.dedupByCanonicalUrl(
          Tables.documents(s, d)
            .select(col("doc_id"), messyUrl(col("doc_id")).as("url")),
          "url", "doc_id")
        .orderBy("url_canon")),

    "url_domain_cap" -> ((s, d) =>
      // FineWeb-style per-domain cap: ≤25 docs per registrable domain,
      // chosen by deterministic key-hash order (growth-stable)
      Url.domainCap(
          Tables.documents(s, d)
            .select(col("doc_id"), messyUrl(col("doc_id")).as("url")),
          "url", "doc_id", cap = 25)
        .orderBy("id")),

    "url_blocklist_filter" -> ((s, d) =>
      // crawl kill-list: registrable-domain anti-join, corpus never
      // shuffles (blocklist broadcast)
      Url.domainBlocklistFilter(
          Tables.documents(s, d)
            .select(col("doc_id"), messyUrl(col("doc_id")).as("url")),
          "url", Seq("site.org", "example.co.uk"))
        .select("doc_id").orderBy("doc_id")),

    "ngram_novelty" -> ((s, d) =>
      // graded cross-doc originality: fraction of a doc's distinct
      // 3-gram shingles found in no other document
      TextAnalysis.ngramNovelty(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id").orderBy("doc_id")),

    "text_script_profile" -> ((s, d) =>
      // multilingual triage: per-doc Latin/Cyrillic/Han/Arabic/digit
      // counts + dominant script; the ASCII corpus gets a per-doc
      // multi-script suffix (both engines build the identical string)
      TextAnalysis.scriptProfile(
          Tables.documents(s, d).withColumn("text",
            concat(col("text"), element_at(array(
              lit(" Пример текста"), lit(" 你好世界"),
              lit(" مرحبا بالعالم"), lit(" plain ascii 42")),
              (pmod(col("doc_id"), lit(4L)) + 1).cast("int")))),
          "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")),

    "quality_adaptive_length" -> ((s, d) =>
      // per-source data-driven length band: keep docs inside the
      // source's [p10, p90] char-count band (broadcast of |sources| rows)
      TextAnalysis.adaptiveLengthFilter(Tables.documents(s, d),
          "n_chars", "source")
        .select("doc_id", "source", "n_chars").orderBy("doc_id")),

    "dedup_cluster_histogram" -> ((s, d) =>
      // the chart a dedup run ends with: how many content clusters of
      // each size exist (size 1 = unique docs)
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .groupBy(col("cnt").as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
        .orderBy("cluster_size")),

    // CDC corpus: documents plus head-shifted copies of the first 50 —
    // the exact case fixed-offset window hashing misses and
    // content-defined boundaries re-synchronize on
    "cdc_chunks" -> ((s, d) =>
      Dedup.cdcChunks(cdcBase(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "chunk_idx")),

    "cdc_repeated_chunks" -> ((s, d) =>
      Dedup.cdcRepeatedChunks(cdcBase(s, d), "text", "doc_id")
        .orderBy("chunk_hash")),

    "chunk_text" -> ((s, d) =>
      TextAnalysis.chunkText(Tables.documents(s, d), "text", "doc_id",
          window = 128, stride = 96)
        .withColumnRenamed("id", "doc_id").orderBy("doc_id", "chunk_idx")),

    "hash_features" -> ((s, d) =>
      // the operator returns the dense array<long>; the driver-facing
      // query flattens it to a CSV string because the oracle harness
      // canonicalizes by sorting every column (arrays aren't sortable)
      TextAnalysis.hashFeatures(Tables.documents(s, d), "text", "doc_id", dim = 64)
        .withColumnRenamed("id", "doc_id")
        .select(col("doc_id"), array_join(col("features"), ",").as("features"))
        .orderBy("doc_id")),

    "top_bigrams" -> ((s, d) =>
      // most frequent bigrams across the corpus — the boilerplate
      // detector a pipeline runs before writing filter rules; ties
      // break on the gram text for a deterministic cut
      Dedup.topNgrams(Tables.documents(s, d), "text", "doc_id", n = 2, k = 50)
        .withColumnRenamed("ngram", "bigram")),

    "distinct_kmv" -> ((s, d) =>
      // per-type distinct-user cardinality: exact count(DISTINCT) next
      // to the KMV-64 sketch estimate. The fixture has 150 distinct
      // users per type > k=64, so the ESTIMATOR path runs (not the
      // exact-below-k fallback); the oracle replays the portable hash
      // and the same (k-1)*range/kthMin arithmetic bit-for-bit. At
      // scale the sketch ships ≤64 longs per (partition, group) through
      // the exchange where count(DISTINCT) shuffles every distinct key.
      Tables.events(s, d)
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_exact"),
          round(KmvDistinct.kmv(Sampling.keyHash(col("user_id")), 64), 4)
            .as("kmv_est"))
        .orderBy("event_type")),

    "sketch_profile" -> ((s, d) => {
      // per-source corpus profile in ONE aggregation pass: doc/token
      // volumes, KMV-16 distinct-token estimate (k < the ~31-token
      // vocabulary → estimator path) with the exact count alongside,
      // and the top token from the exact-regime MG summary — the
      // text-corpus `table_profile` built from bounded-memory state
      val toks = Tables.documents(s, d)
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
      toks.groupBy("source")
        .agg(
          count(lit(1)).as("n_tokens"),
          countDistinct(col("tok")).as("n_distinct_exact"),
          round(KmvDistinct.kmv(Sampling.keyHash(col("tok")), 16), 4)
            .as("kmv_est"),
          element_at(graft.functions.HeavyHitters.hitters(col("tok"), 64), 1)
            .getField("key").as("top_token"))
        .orderBy("source")
    }),

    "distinct_overlap" -> ((s, d) =>
      // audience overlap between event types WITHOUT joining the raw
      // keys (Sketches.audienceOverlap): per-type KMV min-sets +
      // theta-sketch pair estimates. The battery opts INTO the exact
      // calibration column (`exact = true` — a distinct-pair self-join,
      // deliberately not the library default at scale) so the oracle
      // can check the estimates against DuckDB's exact replay.
      graft.operators.Sketches.audienceOverlap(
          Tables.events(s, d), "event_type", "user_id", k = 64, exact = true)
        .orderBy("type_a", "type_b")),

    "heavy_hitters" -> ((s, d) =>
      // corpus-vocabulary heavy hitters via the bounded Misra–Gries
      // summary: capacity 64 ≥ the synthetic vocabulary, so the summary
      // is PROVABLY exact (err 0) and the plain group-by-count oracle
      // replays it; the capacity-bounded lossy regime (where no SQL
      // replay exists) is spec-covered with its guarantee bounds. The
      // aggregate state stays O(64) per partition no matter how many
      // distinct tokens stream through — the 100 TB form of "top
      // tokens" without a per-token shuffle.
      Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .agg(HeavyHitters.hitters(col("tok"), 64).as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.key").as("token"), col("h.count").as("cnt"),
          col("h.err").as("err"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20)),

    "quality_classifier_scores" -> ((s, d) => {
      // learned quality filter end-to-end: train Pegasos on the fixed
      // labeled sample (driver-side, bounded, deterministic), then score
      // the whole corpus as a join-free projection — the weight vector
      // ships as a literal, so corpus-side cost is the featurization
      val w = qcWeights(s, d)
      QualityClassifier.score(Tables.documents(s, d), "text", "doc_id", w)
        .select(col("id").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")
    }),

    "knn_doc_lookup" -> ((s, d) => {
      // similarity search with metadata return: top-20 nearest
      // embeddings joined back to their documents (vec_id = doc_id on
      // the synthetic tables) — the result a retrieval caller actually
      // wants. The doc side joins AFTER the top-k, so only k rows join.
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      val top = Knn.knn(emb, Distances.euclidean(col("embedding"),
        Distances.vecLit(q)), 20, col("vec_id"))
      top.join(Tables.documents(s, d), col("vec_id") === col("doc_id"))
        .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"),
          col("lang"), col("source"))
        .orderBy("distance", "vec_id")
    }),

    "length_quantiles" -> ((s, d) => Tables.documents(s, d)
      // exact interpolated percentiles (rank = p·(n−1)) — both engines
      // implement the same continuous-quantile definition
      .groupBy(col("source"))
      .agg(round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 4).as("p90"))
      .orderBy("source")),

    "semantic_dedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.semanticDedupPairs(emb, "vec_id", "embedding",
          seedCentroids(emb, 16), 0.35)
        .orderBy("cluster", "id_a", "id_b")
    }),

    "semantic_dedup_survivors" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Ann.semanticDedupSurvivors(emb, "vec_id", "embedding",
          seedCentroids(emb, 16), 0.35)
        .select("vec_id").orderBy("vec_id")
    }),

    "corpus_semantic_neardup" -> ((s, d) => {
      // cluster-pruned admission: incoming (vec_id >= 400) checks only
      // its own centroid cell of the pre-assigned corpus (vec_id < 400)
      val emb = Tables.embeddings(s, d)
      val idx = semanticCorpusIndexes.getOrElseUpdate(d,
        Ann.indexCorpusSemantic(emb.filter(col("vec_id") < 400),
          "vec_id", "embedding", seedCentroids(emb, 16)))
      Ann.semanticNearDupAgainstCorpus(emb.filter(col("vec_id") >= 400),
          "vec_id", "embedding", idx, 0.35)
        .orderBy("in_id", "corpus_id")
    }),

    "text_stats" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("token_cnt"),
        round(TextAnalysis.avgWordLen(col("text")), 4).as("avg_word_len"),
        round(TextAnalysis.punctRatio(col("text")), 4).as("punct_ratio"),
        round(TextAnalysis.stopwordRatio(col("text")), 4).as("stopword_ratio"))
      .orderBy("doc_id")),

    "text_quality" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        round(TextAnalysis.qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id")),

    "dataset_card" -> ((s, d) =>
      // the corpus summary a training-data team publishes: size, token
      // mass, source/language diversity, exact-dup mass, PII presence —
      // ONE aggregation pass (count-distincts expand, stay partial),
      // all-integer so the card replays with zero float-order caveats
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(md5(Dedup.normalize(col("text")))).as("n_distinct_contents"),
        sum(when(TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe) > 0, 1L)
          .otherwise(0L)).as("n_docs_with_email"))),

    "lang_id" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")),

    "text_fingerprint" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")),

    // --- full-text search (reference routes TEXTTYPE to Solr; native here) ---
    "text_match_all" -> ((s, d) =>
      TextSearch.matchAll(Tables.documents(s, d), "text", Seq("vector", "join"))
        .select("doc_id").orderBy("doc_id")),

    "text_phrase" -> ((s, d) =>
      TextSearch.phraseMatch(Tables.documents(s, d), "text", Seq("fast", "table"))
        .select("doc_id").orderBy("doc_id")),

    "text_bm25" -> ((s, d) =>
      TextSearch.bm25Scores(Tables.documents(s, d), "doc_id", "text",
          Seq("vector", "join", "hash"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")),

    "text_index_bm25" -> ((s, d) =>
      // BM25 served from the PERSISTED full-text layout (bucketed
      // postings + lengths + stats; the Solr-engine role) — never
      // re-tokenizes the corpus; the oracle recomputes from raw text,
      // so build -> store -> serve is verified end to end
      graft.sources.FullTextStore.bm25Scores(s, fullTextLayout(s, d),
          Seq("vector", "join", "hash"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")),

    "text_index_match" -> ((s, d) =>
      // posting-intersection ALL-terms match from the same layout
      graft.sources.FullTextStore.matchAll(s, fullTextLayout(s, d),
          Seq("vector", "join"))
        .orderBy("doc_id")),

    "maxsim_topk" -> ((s, d) => {
      // late-interaction MaxSim: 4-chunk multi-vector docs (vec_id DIV 4)
      // scored against a 3-vector query set (the deterministic seed
      // vectors the SQL oracle can reproduce); one shuffle of 3 doubles
      // per doc, chunks never move
      val emb = Tables.embeddings(s, d)
      Ann.maxSimTopK(
          emb.select(expr("vec_id DIV 4").as("doc"), col("embedding")),
          "doc", "embedding", seedCentroids(emb, 3), 50)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    "maxsim_ivf_topk" -> ((s, d) => {
      // the scale path: candidate chunks from the SQ8 codes scan per
      // query vector, exact MaxSim rerun over the candidate DOCS only —
      // generous timesK makes doc recall total on this corpus, so the
      // exact-MaxSim oracle applies (the ann_ivf_topk pattern)
      val emb = Tables.embeddings(s, d)
      val idx = hybridSqIndexes.getOrElseUpdate(d,
        Ann.buildCosineSQIndex(emb, "vec_id", "embedding"))
      Ann.maxSimTopKIndexed(
          emb.select(expr("vec_id DIV 4").as("doc"), col("vec_id"), col("embedding")),
          "doc", "embedding", "vec_id", idx, seedCentroids(emb, 3), 50,
          timesK = 40)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
    }),

    "text_bm25f" -> ((s, d) => {
      // fielded BM25 with a 2x title boost; the "title" field is the
      // first 8 tokens derived in-plan (the fixture carries one text
      // column), so the oracle replays the same derivation
      val docs = Tables.documents(s, d).withColumn("title",
        array_join(slice(graft.operators.TextAnalysis.tokens(col("text")), 1, 8), " "))
      TextSearch.bm25fScores(docs, "doc_id",
          Seq(("title", 2.0), ("text", 1.0)), Seq("vector", "join", "hash"))
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("doc_id")
    }),

    "text_index_phrase" -> ((s, d) =>
      // adjacency from STORED POSITIONS only — the oracle re-tests the
      // phrase against raw token positions, so the stored position
      // lists are verified, not just tf
      graft.sources.FullTextStore.phraseMatch(s, fullTextLayout(s, d),
          Seq("fast", "table"))
        .orderBy("doc_id")),

    // --- quality filtering + sampling (LLM pipeline, round-6 surface) ---
    "repetition_signals" -> ((s, d) =>
      TextAnalysis.repetitionSignals(Tables.documents(s, d), "text", "doc_id")
        .orderBy("id")),

    "repetition_signals_perrow" -> ((s, d) =>
      TextAnalysis.repetitionSignalsPerRow(Tables.documents(s, d), "text", "doc_id")
        .orderBy("id")),

    "pii_scan" -> ((s, d) => Tables.documents(s, d)
      .select(col("doc_id"), piiText.as("text"))
      .select(col("doc_id"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.EmailRe).as("emails"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.PhoneRe).as("phones"),
        TextAnalysis.piiCount(col("text"), TextAnalysis.Ipv4Re).as("ips"),
        TextAnalysis.redactPii(col("text")).as("redacted"))
      .orderBy("doc_id")),

    "sample_bernoulli" -> ((s, d) =>
      Sampling.bernoulliSample(Tables.documents(s, d), "text", 0.25)
        .select("doc_id").orderBy("doc_id")),

    "training_order_shuffle" -> ((s, d) =>
      // reproducible pre-training shuffle: hash-of-(id, seed) sort key,
      // replayable by any engine; the key values ARE the verified order
      Sampling.deterministicShuffle(
          Tables.documents(s, d).select("doc_id"), "doc_id", seed = 42)
        .select(col("doc_id"), col("shuffle_key"))),

    "sample_weighted_mix" -> ((s, d) =>
      Sampling.weightedMix(Tables.documents(s, d), "lang", "text",
          weights = Map("en" -> 0.5, "de" -> 0.2), defaultWeight = 0.1)
        .select("doc_id", "lang").orderBy("doc_id")),

    "sample_epoch_mix" -> ((s, d) =>
      // fractional-epoch mixture: src1 repeats 2.5x (2 copies + hash-
      // gated third), src0 downsamples to 0.25, everything else 1 epoch
      Sampling.epochMix(Tables.documents(s, d), "source", "text",
          epochs = Map("src0" -> 0.25, "src1" -> 2.5), defaultEpochs = 1.0)
        .select("doc_id", "source", "ap_epoch")
        .orderBy("doc_id", "ap_epoch")),

    "sample_temperature_mix" -> ((s, d) =>
      // sqrt-temperature rebalance over a SKEWED derived mixture (the
      // bundled sources are uniform, which would make every factor
      // exactly 1.0): web 60% / books 30% / code 10% flatten toward
      // sqrt-shares — web downsamples (~0.79x), books ~1.11x, code
      // repeats ~1.93x. All factor math is integer (milli-isqrt +
      // per-10000 cut), so DuckDB replays the kept multiset bit-for-bit
      Sampling.sqrtTemperatureMix(
          Tables.documents(s, d).withColumn("dom",
            when(pmod(col("doc_id"), lit(10)) < 6, "web")
              .when(pmod(col("doc_id"), lit(10)) < 9, "books")
              .otherwise("code")),
          "dom", "text")
        .select("doc_id", "dom", "ap_epoch")
        .orderBy("doc_id", "ap_epoch")),

    "sample_token_budget" -> ((s, d) =>
      // per-domain TOKEN budgets (not row counts): longest docs first,
      // src0 dropped outright, src1 effectively uncapped
      Sampling.tokenBudgetSample(Tables.documents(s, d), "source", "doc_id",
          TextAnalysis.tokenCount(col("text")).cast("long"),
          budgets = Map("src0" -> 0L, "src1" -> 100000L), defaultBudget = 800L,
          priority = Some(col("n_chars")))
        .select("doc_id", "source").orderBy("doc_id")),

    "sample_weighted_len" -> ((s, d) =>
      // soft length filter: keep probability = min(1, n_chars / 4000)
      Sampling.weightedBernoulli(Tables.documents(s, d), "text",
          least(lit(1.0), col("n_chars") / lit(4000.0)))
        .select("doc_id", "n_chars").orderBy("doc_id")),

    "sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id", 0.2)
        .select("doc_id", "lang").orderBy("doc_id")),

    "quality_filter_verdicts" -> ((s, d) =>
      TextAnalysis.qualityVerdicts(Tables.documents(s, d), "text", "doc_id",
          minQuality = 0.5, maxDupTokenFrac = 0.6, maxTopTokenFrac = 0.15,
          maxDupBigramFrac = 0.08, maxPii = 0)
        .orderBy("id")),

    "quality_filter_verdicts_perrow" -> ((s, d) =>
      TextAnalysis.qualityVerdictsPerRow(Tables.documents(s, d), "text", "doc_id",
          minQuality = 0.5, maxDupTokenFrac = 0.6, maxTopTokenFrac = 0.15,
          maxDupBigramFrac = 0.08, maxPii = 0)
        .orderBy("id")),

    "sample_stratified_by" -> ((s, d) =>
      Sampling.stratifiedSampleBy(Tables.documents(s, d), "lang", "doc_id",
          fractions = Map("en" -> 0.5, "zh" -> 0.0), defaultFraction = 0.1)
        .select("doc_id", "lang").orderBy("doc_id")),

    "sample_exact_n" -> ((s, d) =>
      Sampling.exactSample(Tables.documents(s, d), "doc_id", 100)
        .select("doc_id").orderBy("doc_id")),

    "corpus_contamination" -> ((s, d) => {
      // decontamination check: is a training doc contaminated with one of
      // the benchmark items? the benchmark side (docs 0-49) stays FIXED
      // and small at every scale factor — the incoming side is what grows
      val docs = Tables.documents(s, d)
      val idx = benchIndexes.getOrElseUpdate(d,
        Dedup.indexCorpus(docs.filter(col("doc_id") < 50), "text", "doc_id"))
      Dedup.contaminationAgainstCorpus(docs.filter(col("doc_id") >= 50),
          "text", "doc_id", idx, 0.5)
        .orderBy("in_id", "corpus_id")
    }),

    "contamination_rate_report" -> ((s, d) => {
      // the dashboard number a decontamination run ends with: per
      // source, how many incoming docs hit a benchmark item — the
      // benchmark postings broadcast exactly as in corpus_contamination,
      // one extra source-keyed rollup
      val docs = Tables.documents(s, d)
      val idx = benchIndexes.getOrElseUpdate(d,
        Dedup.indexCorpus(docs.filter(col("doc_id") < 50), "text", "doc_id"))
      val flagged = Dedup.contaminationAgainstCorpus(
          docs.filter(col("doc_id") >= 50), "text", "doc_id", idx, 0.5)
        .select(col("in_id").as("doc_id")).distinct()
        .withColumn("flag", lit(1))
      docs.filter(col("doc_id") >= 50)
        .join(flagged, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("flag"), lit(0))).cast("long").as("n_contaminated"))
        .orderBy("source")
    }),

    "plan_shapes" -> ((s, d) => {
      // the Plans audit as a correctness row: every scale-critical
      // physical-plan shape (pushed filters, bounded top-k, broadcast
      // dims, no-NLJ binned joins, zero-shuffle per-row kernels,
      // z-order file stats) must hold, or this row hash-mismatches the
      // all-true oracle and the ROUND goes red — not just the suite
      import s.implicits._
      graft.Plans.audit(s, d).map { case (n, ok, _) => (n, ok) }
        .toDF("check_name", "ok").orderBy("check_name")
    }),

    "corpus_simhash_neardup" -> ((s, d) => {
      // admission check, SimHash flavor: same build-once corpus-index
      // contract as corpus_neardup / corpus_cosine_neardup
      val docs = Tables.documents(s, d)
      val idx = simhashCorpusIndexes.getOrElseUpdate(d,
        Dedup.simhashIndexCorpus(docs.filter(col("doc_id") < 400), "text", "doc_id"))
      Dedup.simhashAgainstCorpus(docs.filter(col("doc_id") >= 400),
          "text", "doc_id", idx, 3)
        .orderBy("in_id", "corpus_id")
    }),

    "pack_chunks" -> ((s, d) =>
      Packing.chunkAssignments(
        Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("tok_cnt")),
        "doc_id", "tok_cnt", budget = 512L, nShards = 8)
        .orderBy("id")),

    "pipeline_end_to_end" -> ((s, d) => {
      // the whole training-data pipeline as ONE declarative plan:
      // quality floor → exact dedup → SemDeDup survivors (over the
      // docs' embeddings) → sequence packing of what remains. Every
      // stage is the verified operator above; Catalyst fuses the lot.
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val floor = docs.filter(TextAnalysis.qualityScore(col("text")) >= 0.5)
      val ex = Dedup.dropExactDups(floor, "text", "doc_id")
      // the cleaned frame feeds the pair join twice (a/b sides) and the
      // final anti-join — materialize it ONCE, call-scoped, or the
      // quality scan + dedup window + join replay per reference (same
      // pattern as dedupPipeline's internal checkpoint)
      val joined = graft.core.Materialize(
        ex.join(emb, col("doc_id") === col("vec_id")))
      val surv = Ann.semanticDedupSurvivors(joined, "doc_id", "embedding",
        seedCentroids(emb, 16), 0.35)
      Packing.chunkAssignments(
        surv.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("tok_cnt")),
        "doc_id", "tok_cnt", budget = 512L, nShards = 8)
        .orderBy("id")
    }),

    "pack_chunk_rows" -> ((s, d) =>
      Packing.chunkRows(
        Tables.documents(s, d).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("tok_cnt")),
        "doc_id", "tok_cnt", budget = 512L, nShards = 8)
        .orderBy("id", "chunk_idx")),

    "kv_point_lookup" -> ((s, d) => {
      // LevelDB/PalDB-role point lookup: bucket-pruned + row-group-skipped
      // read from the one-time key-value layout artifact
      val dir = kvLayout(s, d)
      kvHandler.get(s, dir, Seq(10L, 57L, 150L))
        .select(col("p_partkey"), col("p_name"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
        .orderBy("p_partkey")
    }),

    // --- geometry slice: WKT point attribute + Haversine radius scan ---
    "geo_radius" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = queryVecOf(emb)
      // WKT round-trips the exact double (shortest-repr print + reparse),
      // so the distance equals computing straight off the raw columns —
      // which is exactly what the oracle does
      val wkt = emb.select(col("vec_id"),
        Geo.wktPoint(element_at(col("embedding"), 2).cast("double") * 40.0,
          element_at(col("embedding"), 1).cast("double") * 20.0).as("wkt"))
      wkt.select(col("vec_id"),
          round(Geo.haversineMeters(Geo.wktLat(col("wkt")), Geo.wktLng(col("wkt")),
            lit(q(0) * 20.0), lit(q(1) * 40.0)), 2).as("dist_m"))
        .filter(col("dist_m") <= 250000.0)
        .orderBy("vec_id")
    }),

    // --- planar geometry algebra (r18): contains/intersects/buffer/
    //     distance over WKT columns — the PostGIS-role slice. All pure
    //     codegen expressions (raycast/shoelace/orientation), quarter-grid
    //     fixtures so every op except the trig-bearing buffer is
    //     bit-identical to the DuckDB oracle with NO rounding slack.
    "geo_polygon_stats" -> ((s, d) => {
      // WKT round-trips the exact doubles, so parsing the printed polygon
      // and measuring it equals measuring the generating arithmetic —
      // which is exactly what the oracle does numerically.
      val ring = GeoAlgebra.wktPolygonRing(col("wkt"))
      val cen = GeoAlgebra.stCentroid(ring)
      val env = GeoAlgebra.stEnvelope(ring)
      nationPolys(s, d).select(col("n_nationkey"),
          round(GeoAlgebra.stArea(ring), 6).as("area"),
          round(GeoAlgebra.stLength(ring), 6).as("perimeter"),
          round(cen.getField("x"), 6).as("cx"),
          round(cen.getField("y"), 6).as("cy"),
          round(env.getField("xmin"), 6).as("xmin"),
          round(env.getField("ymin"), 6).as("ymin"),
          round(env.getField("xmax"), 6).as("xmax"),
          round(env.getField("ymax"), 6).as("ymax"))
        .orderBy("n_nationkey")
    }),

    "geo_polygon_contains" -> ((s, d) => {
      // Point-in-polygon SCAN: even-odd raycast against a non-convex
      // literal star — a per-row codegen predicate, no join, no shuffle
      // before the presentation sort.
      val ring = GeoAlgebra.wktPolygonRing(lit(
        "POLYGON ((21 10, 15 13, 12 19, 9 13, 3 10, 9 7, 12 1, 15 7, 21 10))"))
      customerPoints(s, d)
        .filter(GeoAlgebra.stContains(ring, col("px"), col("py")))
        .orderBy("c_custkey")
    }),

    "geo_contains_join" -> ((s, d) => {
      // Points-in-polygons JOIN via the square-grid equi-join (each point
      // one tile, each polygon its envelope's tiles) + exact raycast —
      // never a nested loop; the shape that survives 10⁹ points × 10⁶
      // polygons.
      val polys = nationPolys(s, d).select(col("n_nationkey"),
        GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
      GeoAlgebra.containsJoin(customerPoints(s, d), "px", "py",
          polys, "ring", cell = 4.0)
        .select("n_nationkey", "c_custkey")
        .orderBy("n_nationkey", "c_custkey")
    }),

    "geo_polygon_intersects" -> ((s, d) => {
      // Polygon-polygon intersects: proper edge crossing (orientation
      // signs — exact integer-grid arithmetic) or either first vertex
      // contained. The 5-row region dim broadcasts; at scale the big side
      // streams through the predicate without reshuffling.
      val np = nationPolys(s, d).select(col("n_nationkey"),
        GeoAlgebra.wktPolygonRing(col("wkt")).as("ring_n"))
      val rp = regionPolys(s, d).select(col("r_regionkey"),
        GeoAlgebra.wktPolygonRing(col("rwkt")).as("ring_r"))
      np.crossJoin(broadcast(rp))
        .filter(GeoAlgebra.stIntersects(col("ring_n"), col("ring_r")))
        .select("n_nationkey", "r_regionkey")
        .orderBy("n_nationkey", "r_regionkey")
    }),

    "geo_line_distance" -> ((s, d) => {
      // Distance-to-route: min over the linestring's segments of the
      // clamped-projection point-segment distance — per-row kernel over
      // the scan, dwithin filter on the rounded value.
      val line = GeoAlgebra.wktLineString(lit(
        "LINESTRING (0 0, 6 8, 12 2, 18 14, 24 6)"))
      customerPoints(s, d)
        .withColumn("dist", round(GeoAlgebra.stDistanceLine(line,
          col("px"), col("py")), 6))
        .filter(col("dist") <= 3.0)
        .orderBy("c_custkey")
    }),

    "geo_buffer_contains" -> ((s, d) => {
      // ST_Buffer(point) as an off-axis regular octagon ring, then the
      // grid containment join counts customers inside each supplier's
      // buffer; buffer area via shoelace. The one trig-bearing query —
      // measures rounded to absorb cross-engine libm ulps.
      val sup = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") % 23).cast("double") + 0.125).as("sx"),
        ((col("s_suppkey") % 19).cast("double") + 0.125).as("sy"),
        (lit(1.0) + (col("s_suppkey") % 4).cast("double") * 0.5).as("r"))
      val polys = sup.select(col("s_suppkey"),
        GeoAlgebra.stBufferPoint(col("sx"), col("sy"), col("r"), 8).as("ring"))
      val inside = GeoAlgebra.containsJoin(customerPoints(s, d), "px", "py",
          polys, "ring", cell = 1.0)
        .groupBy("s_suppkey").agg(count(lit(1)).as("n_inside"))
      polys.select(col("s_suppkey"),
          round(GeoAlgebra.stArea(col("ring")), 6).as("buf_area"))
        .join(inside, Seq("s_suppkey"), "left")
        .na.fill(0L, Seq("n_inside"))
        .orderBy("s_suppkey")
    }),

    // --- geodesic (GEOGRAPHY-role) measures (r19): great-circle length
    //     and spherical (Chamberlain–Duquette) area on the R = 6371 km
    //     Haversine sphere, same WKT fixtures read as lng/lat. Trig-
    //     bearing like the buffer query — measures rounded to absorb
    //     cross-engine libm ulps.
    "geo_geodesic_measures" -> ((s, d) => {
      val wkt = col("wkt")
      nationPolys(s, d).select(col("n_nationkey"),
          round(Geo.stLengthGeo(wkt), 2).as("perim_m"),
          round(Geo.stAreaGeo(wkt) / 1e6, 2).as("area_km2"))
        .orderBy("n_nationkey")
    }),

    "geo_geodesic_dwithin" -> ((s, d) => {
      // ST_DWithin(geography): customers as WKT lng/lat points within
      // 600 km great-circle of a query point. The predicate prunes with
      // a half-cm slack; the exact cut is on the rounded distance (the
      // geo_radius convention, so both engines decide ties identically).
      val q = lit("POINT (10 10)")
      customerPoints(s, d)
        .withColumn("wkt", Geo.wktPoint(col("px"), col("py")))
        .filter(Geo.stDWithinGeo(col("wkt"), q, lit(600000.01)))
        .select(col("c_custkey"),
          round(Geo.stDistanceGeo(col("wkt"), q), 2).as("dist_m"))
        .filter(col("dist_m") <= 600000.0)
        .orderBy("c_custkey")
    }),

    "geo_tiling_adjacency" -> ((s, d) => {
      // boundary-inclusive intersects under the oracle gate: nations as
      // a 5×5 tiling of side-2 squares whose neighbors share edges or
      // corners — interiors are disjoint, so the general-position test
      // reports every distinct pair disjoint while the inclusive sweep
      // reports exactly the grid adjacency (which the oracle states as
      // pure integer arithmetic, no geometry needed). 25×25 broadcast
      // dim pairs — the geo_polygon_intersects precedent.
      val tiles = Tables.nation(s, d).select(col("n_nationkey"),
        GeoAlgebra.wktPolygon(offsetRing(
          (col("n_nationkey") % 5).cast("double") * 2.0 + 1.0,
          floor(col("n_nationkey") / lit(5.0)) * 2.0 + 1.0, lit(1.0),
          Seq((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)))).as("wkt"))
      val a = tiles.select(col("n_nationkey").as("n_a"),
        GeoAlgebra.wktPolygonRing(col("wkt")).as("ring_a"))
      val b = tiles.select(col("n_nationkey").as("n_b"),
        GeoAlgebra.wktPolygonRing(col("wkt")).as("ring_b"))
      a.crossJoin(broadcast(b))
        .filter(col("n_a") < col("n_b"))
        .filter(GeoAlgebra.stIntersectsInclusive(col("ring_a"), col("ring_b")) &&
          !GeoAlgebra.stIntersects(col("ring_a"), col("ring_b")))
        .select("n_a", "n_b")
        .orderBy("n_a", "n_b")
    }),

    "geo_tiling_adjacency_join" -> ((s, d) => {
      // the SAME adjacency through the big×big path: grid-partitioned
      // polygon-polygon intersects JOIN (PBSM report-once — each pair
      // from its min common tile, no distinct) instead of the broadcast
      // cross product. Identical oracle = the two paths must agree.
      val tiles = Tables.nation(s, d).select(col("n_nationkey"),
        GeoAlgebra.wktPolygonRing(GeoAlgebra.wktPolygon(offsetRing(
          (col("n_nationkey") % 5).cast("double") * 2.0 + 1.0,
          floor(col("n_nationkey") / lit(5.0)) * 2.0 + 1.0, lit(1.0),
          Seq((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))))).as("ring"))
      val a = tiles.select(col("n_nationkey").as("n_a"), col("ring").as("ring_a"))
      val b = tiles.select(col("n_nationkey").as("n_b"), col("ring").as("ring_b"))
      GeoAlgebra.intersectsJoin(a, "ring_a", b, "ring_b",
          cell = 2.0, inclusive = true)
        .filter(col("n_a") < col("n_b"))
        .select("n_a", "n_b")
        .orderBy("n_a", "n_b")
    }),

    "geo_geodesic_buffer" -> ((s, d) => {
      // geodesic ST_Buffer(point): destination-point octagon at each
      // depot's service radius, measured with the spherical kernels —
      // every op trig-bearing, so both measures round (the buffer
      // convention), per-row over the supplier dim scan.
      val dep = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") % 19).cast("double") + 0.125).as("dlat"),
        ((col("s_suppkey") % 23).cast("double") + 0.125).as("dlng"),
        (lit(50000.0) + (col("s_suppkey") % 4).cast("double") * 25000.0).as("r"))
      val ring = Geo.stBufferPointGeo(col("dlat"), col("dlng"), col("r"), 8)
      dep.select(col("s_suppkey"),
          round(Geo.lengthGeoMeters(ring), 2).as("perim_m"),
          round(Geo.areaGeoSqMeters(ring) / 1e6, 2).as("area_km2"))
        .orderBy("s_suppkey")
    }),

    "geo_geodesic_antimeridian" -> ((s, d) => {
      // dateline-straddling rings: the SAME nation stars with every
      // longitude shifted half a world east and re-wrapped into
      // [-180, 180) — vertices land on BOTH sides of ±180°, so every
      // seam-crossing edge exercises areaGeoSqMeters' Δλ wrap (without
      // it the ±2π jumps integrate the polygon's WORLD-COMPLEMENT).
      // Shift arithmetic is exact (quarter-grid doubles through
      // +/fmod/−), the only rounding is the usual trig round(_, 2),
      // and GeoSpec asserts the shift-invariance property against the
      // unshifted measures.
      val shifted = Tables.nation(s, d).select(col("n_nationkey"),
        transform(offsetRing(
          (col("n_nationkey") % 5).cast("double") * 5.0,
          floor(col("n_nationkey") / lit(5.0)) * 5.0,
          lit(1.0) + (col("n_nationkey") % 3).cast("double") * 0.5,
          starOffsets), p =>
          struct((pmod(p.getField("x") + 360.0, lit(360.0)) - 180.0).as("x"),
            p.getField("y").as("y"))).as("ring"))
      shifted.select(col("n_nationkey"),
          round(Geo.lengthGeoMeters(col("ring")), 2).as("perim_m"),
          round(Geo.areaGeoSqMeters(col("ring")) / 1e6, 2).as("area_km2"))
        .orderBy("n_nationkey")
    }),

    "geo_geodesic_spheroid" -> ((s, d) => {
      // WGS84 first-order spheroid corrections (PostGIS geography is
      // ellipsoidal by default): areas on the authalic sphere, lengths
      // on the rectifying sphere — same fixtures as
      // geo_geodesic_measures, same per-row zero-shuffle shape; the
      // residual vs true WGS84 geodesics is documented on the Geo
      // constants (~0.1 % areas, ≤0.5 % lengths worst-case).
      val wkt = col("wkt")
      nationPolys(s, d).select(col("n_nationkey"),
          round(Geo.stLengthGeo(wkt, spheroid = true), 2).as("perim_m"),
          round(Geo.stAreaGeo(wkt, spheroid = true) / 1e6, 2).as("area_km2"))
        .orderBy("n_nationkey")
    }),

    "geo_geodesic_azimuth" -> ((s, d) => {
      // ST_Azimuth(geography): initial great-circle bearing from the
      // query point to every customer point, radians clockwise from
      // north in [0, 2π); the coincident row (customer at the query
      // point) is NULL — the PostGIS no-bearing convention.
      // Due-north/south rows hit the formula's exact-zero branches
      // (sin 0 = 0 is exact in both engines), so the 0/2π wrap never
      // straddles a rounding ulp; everything else rounds (6).
      customerPoints(s, d).select(col("c_custkey"),
          round(Geo.azimuthGeo(lit(10.0), lit(10.0), col("py"), col("px")), 6)
            .as("az_rad"),
          round(Geo.haversineMeters(lit(10.0), lit(10.0), col("py"), col("px")), 2)
            .as("dist_m"))
        .orderBy("c_custkey")
    }),

    "geo_geodesic_nearest" -> ((s, d) => {
      // nearest-depot: each customer's 2 closest supplier depots by
      // great-circle distance within 300 km — radius-grid candidates +
      // per-point window, never a nested loop. Grid radius carries the
      // 5 mm slack so the rounded cutoff is the ONLY cut both engines
      // apply (the geo_radius_join convention).
      val dep = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") % 19).cast("double") + 0.125).as("dep_lat"),
        ((col("s_suppkey") % 23).cast("double") + 0.125).as("dep_lng"))
      Geo.nearestJoinGeo(customerPoints(s, d), "c_custkey", "py", "px",
          dep, "dep_lat", "dep_lng", "s_suppkey", 300000.005, k = 2)
        .select(col("c_custkey"), col("s_suppkey"),
          col("nn_rank").cast("long").as("nn_rank"),
          round(col("dist_m"), 2).as("dist_m"))
        .filter(col("dist_m") <= 300000.0)
        .orderBy("c_custkey", "nn_rank")
    }),

    "geo_covers_boundary" -> ((s, d) => {
      // ST_Covers semantics: boundary-INCLUSIVE containment — customers
      // on the 0.25-lattice land exactly on the square's edges, where
      // the raw even-odd raycast is deterministic-but-arbitrary; covers
      // must report every closed-box point, with the exact on-segment
      // test flagged alongside.
      val wkt = lit("POLYGON ((2 2, 12 2, 12 12, 2 12, 2 2))")
      val ring = GeoAlgebra.wktPolygonRing(wkt)
      customerPoints(s, d)
        .filter(GeoAlgebra.stCoversWkt(wkt, col("px"), col("py")))
        .select(col("c_custkey"), col("px"), col("py"),
          GeoAlgebra.stOnBoundary(ring, col("px"), col("py")).as("on_edge"))
        .orderBy("c_custkey")
    }),

    // --- fuzzy string matching (r18): FastSS deletion-neighborhood
    //     edit-distance joins — exact, never all-pairs.
    "fuzzy_name_pairs" -> ((s, d) => {
      // all distinct part-name pairs within edit distance 2; the name
      // itself is the id (string < gives the deterministic pair order)
      val names = Tables.part(s, d).select("p_name").distinct()
      FuzzyJoin.editDistancePairs(names, "p_name", "p_name", maxDist = 2)
        .select(col("id_a").as("name_a"), col("id_b").as("name_b"),
          col("dist").cast("long").as("dist"))
        .orderBy("name_a", "name_b")
    }),

    "fuzzy_typo_lookup" -> ((s, d) => {
      // dictionary correction: every part name with one deterministic
      // character deleted, matched back against the distinct-name
      // dictionary at edit distance <= 1
      val name = col("p_name")
      val pos = pmod(col("p_partkey"), length(name)) + 1
      val typos = Tables.part(s, d).select(col("p_partkey"),
        concat(name.substr(lit(1), pos - 1),
          name.substr(pos + 1, length(name))).as("typo"))
      val dict = Tables.part(s, d).select(col("p_name").as("name")).distinct()
      FuzzyJoin.editDistanceJoin(typos, "typo", "p_partkey",
          dict, "name", "name", maxDist = 1)
        .select(col("p_partkey"), col("typo"), col("name"),
          col("dist").cast("long").as("dist"))
        .orderBy("p_partkey", "name")
    }),

    "geo_multipolygon_contains" -> ((s, d) => {
      // full WKT polygon semantics: even-odd parity across every ring —
      // a POLYGON's hole subtracts, a MULTIPOLYGON's parts union. Same
      // exact-arithmetic contract as the single-ring raycast.
      val donut = lit(
        "POLYGON ((2 2, 22 2, 22 20, 2 20, 2 2), (8 6, 16 6, 16 14, 8 14, 8 6))")
      val multi = lit("MULTIPOLYGON (((0 0, 6 0, 6 6, 0 6, 0 0)), " +
        "((18 14, 24 14, 24 22, 18 22, 18 14)))")
      customerPoints(s, d).select(col("c_custkey"), col("px"), col("py"),
          GeoAlgebra.stContainsWkt(donut, col("px"), col("py")).as("in_donut"),
          GeoAlgebra.stContainsWkt(multi, col("px"), col("py")).as("in_multi"))
        .filter(col("in_donut") || col("in_multi"))
        .orderBy("c_custkey")
    }),

    "fuzzy_name_components" -> ((s, d) => {
      // fuzzy clustering end to end: FastSS ED≤2 pairs feed the
      // min-label connected components. Node ids are the PORTABLE
      // identity hash (Sampling.keyHash62 — TWO independent rolling
      // hashes packed into one BIGINT, both replayed by the oracle) so
      // id assignment is a pure per-row projection: a dense rank would
      // force a single-partition global sort of all distinct names,
      // and a single 30-bit hash would silently MERGE components at
      // ~4·10⁴ distinct names (keyHash62's horizon is ~10⁹ — the
      // collision-bound note on the hash itself).
      val names = Tables.part(s, d).select("p_name").distinct()
      val ids = names.withColumn("nid", Sampling.keyHash62(col("p_name")))
      val pairs = FuzzyJoin.editDistancePairs(names, "p_name", "p_name", 2)
        .join(broadcast(ids.select(col("p_name").as("id_a"), col("nid").as("nid_a"))), Seq("id_a"))
        .join(broadcast(ids.select(col("p_name").as("id_b"), col("nid").as("nid_b"))), Seq("id_b"))
        .select("nid_a", "nid_b")
      Dedup.connectedComponents(pairs, "nid_a", "nid_b")
        .join(broadcast(ids), col("id") === col("nid"))
        .select(col("p_name").as("name"), col("component"))
        .orderBy("name")
    }),

    "geo_donut_measures" -> ((s, d) => {
      // hole-aware measures: per-nation donuts (star shell + a scaled
      // hole) — area subtracts the hole, perimeter counts both rings'
      // boundaries. Quarter-grid arithmetic → bit-identical oracle.
      val shell = offsetRing((col("n_nationkey") % 5).cast("double") * 5.0,
        floor(col("n_nationkey") / lit(5.0)) * 5.0,
        lit(1.0) + (col("n_nationkey") % 3).cast("double") * 0.5, starOffsets)
      val hole = offsetRing((col("n_nationkey") % 5).cast("double") * 5.0,
        floor(col("n_nationkey") / lit(5.0)) * 5.0, lit(0.25), starOffsets)
      val wkt = concat(lit("POLYGON (("),
        array_join(transform(shell, p => concat(p.getField("x").cast("string"),
          lit(" "), p.getField("y").cast("string"))), ", "),
        lit("), ("),
        array_join(transform(hole, p => concat(p.getField("x").cast("string"),
          lit(" "), p.getField("y").cast("string"))), ", "),
        lit("))"))
      Tables.nation(s, d).select(col("n_nationkey"),
          round(GeoAlgebra.stAreaWkt(wkt), 6).as("area"),
          round(GeoAlgebra.stLengthWkt(wkt), 6).as("perimeter"))
        .orderBy("n_nationkey")
    }),

    "geo_extent_by_nation" -> ((s, d) => {
      // grouped spatial extents: per-nation point count, bounding box,
      // mean center — one map-side-combined aggregation over the point
      // scan (no geometry objects shuffle, just 4 doubles + count).
      // Quarter-grid coords: sums exact, mean = one division → the
      // oracle replays bit-identically.
      Tables.customer(s, d).select(col("c_nationkey"),
          ((col("c_custkey") % 97).cast("double") * 0.25).as("px"),
          ((col("c_custkey") % 89).cast("double") * 0.25).as("py"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_points"),
          min("px").as("xmin"), min("py").as("ymin"),
          max("px").as("xmax"), max("py").as("ymax"),
          round(sum("px") / count(lit(1)), 6).as("cx"),
          round(sum("py") / count(lit(1)), 6).as("cy"))
        .orderBy("c_nationkey")
    }),

    "predicate_geo_dwithin" -> ((s, d) => {
      // PostGIS-role predicates through the Boolean front door: a WKT
      // point ATTRIBUTE queried with st_within (polygon) AND st_dwithin
      // (route linestring) — the reference's GEOMETRYTYPE WHERE
      // pass-through, evaluated in-engine. WKT round-trips the exact
      // doubles, so the oracle computes off the raw coordinates.
      val pts = customerPoints(s, d)
        .withColumn("loc", Geo.wktPoint(col("px"), col("py")))
      pts.filter(BooleanPredicates.conjunction(Seq(
          BooleanPredicates.Predicate("loc", "st_within", Seq(
            "POLYGON ((21 10, 15 13, 12 19, 9 13, 3 10, 9 7, 12 1, 15 7, 21 10))")),
          BooleanPredicates.Predicate("loc", "st_dwithin", Seq(
            "LINESTRING (0 0, 6 8, 12 2, 18 14, 24 6)", "4.0")))))
        .select("c_custkey", "px", "py")
        .orderBy("c_custkey")
    }),

    "geo_tile_pruned_scan" -> ((s, d) => {
      // The PostGIS-spatial-index ROLE as an ENTITY layout: points
      // tile-partitioned via Partitioning.Tile (survives inserts and
      // mutation rewrites like any entity layout), the radius read
      // prunes to the covered tile dirs (plan-gated PartitionFilters),
      // exact distance filter on the pruned scan. Lossless: the tile
      // set covers the circle's bounding box.
      val (qx, qy, r) = (12.0, 10.0, 3.0)
      val d2 = (col("px") - qx) * (col("px") - qx) +
        (col("py") - qy) * (col("py") - qy)
      graft.core.Entity.open(s, geoLayout(s, d), "geopts")
        .readPrunedRadius(qx, qy, r)
        .filter(d2 <= r * r)
        .select(col("c_custkey"), col("px"), col("py"),
          round(sqrt(d2), 6).as("dist"))
        .orderBy("c_custkey")
    }),

    "geo_nearest_poi" -> ((s, d) => {
      // Bounded-radius nearest-neighbor spatial join: candidates from
      // the maxDist grid (poi → 3×3 neighborhood — lossless), exact
      // distance filter, one per-point window picks the closest. Exact
      // planar arithmetic → rankings replay bit-identically in DuckDB.
      val pois = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") % 23).cast("double") + 0.125).as("sx"),
        ((col("s_suppkey") % 19).cast("double") + 0.125).as("sy"))
      GeoAlgebra.nearestJoin(customerPoints(s, d), "c_custkey", "px", "py",
          pois, "sx", "sy", "s_suppkey", maxDist = 3.0)
        .select(col("c_custkey"), col("s_suppkey"), round(col("dist"), 6).as("dist"))
        .orderBy("c_custkey")
    }),

    "geo_clip_area" -> ((s, d) => {
      // ST_Intersection (convex clip): each region diamond folded
      // through the literal window's half-planes (Sutherland–Hodgman as
      // a pure expression fold). Slope-±1 edges, power-of-two radius,
      // and quarter-grid bounds keep every intersection vertex an exact
      // dyadic double, so the fold and the oracle's INDEPENDENT
      // convex-vertex-set computation (candidate points → angular sort
      // → shoelace) agree bit-for-bit.
      val window = GeoAlgebra.wktPolygonRing(lit(
        "POLYGON ((4 6.5, 18 6.5, 18 13.5, 4 13.5, 4 6.5))"))
      regionPolys(s, d).select(col("r_regionkey"),
          round(GeoAlgebra.stIntersectionArea(
            GeoAlgebra.wktPolygonRing(col("rwkt")), window), 6).as("clip_area"))
        .orderBy("r_regionkey")
    }),

    "geo_fence_hourly" -> ((s, d) => {
      // Batch twin of EventStream.geofenceCounts: events tagged with
      // every containing fence via the broadcast raycast (stateless,
      // dim-sized fence table — the geofence-alerting shape), counted
      // per (hour, fence). Overlapping fences each count the event.
      val ev = Tables.events(s, d).select(col("event_id"), col("ts"),
        ((col("event_id") % 101).cast("double") * 0.25).as("ex"),
        ((col("event_id") % 103).cast("double") * 0.25).as("ey"))
      val fences = nationPolys(s, d).select(col("n_nationkey"),
        GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
      ev.join(broadcast(fences),
          GeoAlgebra.stContains(col("ring"), col("ex"), col("ey")))
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
          .as("hour"), col("n_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("hour", "n_nationkey")
    }),

    // --- multi-join analytics breadth (r17) ---
    "q5_region_revenue" -> ((s, d) => {
      // TPC-H Q5 shape — the 6-way star join. region⋈nation collapses
      // to a 5-row broadcast; supplier picks up n_name through it and
      // stays broadcast-able (SF×10k rows). The only at-scale shuffles
      // are lineitem⋈orders on orderkey and the custkey exchange; the
      // c_nationkey = s_nationkey local-supplier predicate rides the
      // supplier join, never a separate exchange.
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q18_large_orders" -> ((s, d) => {
      // TPC-H Q18 shape — aggregation-filtered join-back: the HAVING
      // side is the one big orderkey shuffle; the surviving "large"
      // orders are rare (p99 of sum_qty), so the join back to orders/
      // customer is a small-side join and the final cut is a bounded
      // TakeOrdered, never a global sort.
      val big = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
        .orderBy(col("totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    "events_pivot" -> ((s, d) =>
      // wide daily report via PIVOT with an EXPLICIT value list: the
      // explicit list keeps the pivot a single pass (no extra
      // distinct-values job) and pins the output schema — the form
      // that scales and the form an engine swap must reproduce
      Tables.events(s, d)
        .filter(col("event_type").isNotNull && col("ts").isNotNull)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day")),

    "q7_nation_volume" -> ((s, d) => {
      // TPC-H Q7 shape: the two nation dims broadcast onto the
      // supplier/customer legs, the directional pair filter rides the
      // join output, and the only at-scale exchanges are the
      // lineitem⋈orders orderkey shuffle + the custkey/suppkey joins
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = Tables.supplier(s, d).join(broadcast(n1),
        col("s_nationkey") === col("s_nk"))
      val cust = Tables.customer(s, d).join(broadcast(n2),
        col("c_nationkey") === col("c_nk"))
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") <= lit("1996-12-31"))
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(cust, o("o_custkey") === cust("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    "q10_returned_items" -> ((s, d) => {
      // TPC-H Q10 shape: quarter-filtered orders join the R-flagged
      // lineitems; the customer dim joins AFTER aggregation is not
      // possible (revenue groups by customer), so customer rides the
      // custkey exchange and nation broadcasts; final cut is a bounded
      // TakeOrdered
      val l = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-10-01") &&
          col("o_orderdate") < lit("1996-01-01"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "q4_order_priority" -> ((s, d) => {
      // TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join — each
      // order survives once no matter how many lineitems match, and the
      // only exchange is the orderkey shuffle (the correlated
      // l_shipdate > o_orderdate predicate rides the join condition, so
      // no second pass re-filters). The grouped count is 5 rows.
      // Adapted predicate: the fixture lineitem has no
      // commit/receipt dates, so "late" = shipped after the order date.
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-04-01") &&
          col("o_orderdate") < lit("1995-07-01"))
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    "q12_late_shipment" -> ((s, d) => {
      // TPC-H Q12 shape (shipmode → lateness bands: the fixture has no
      // l_shipmode/commitdate): one orderkey join, then a two-way CASE
      // split aggregated per band — the classic "pivot a priority flag
      // under a group" plan. High = 1-URGENT/2-HIGH.
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val lag = datediff(col("l_shipdate"), col("o_orderdate"))
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .withColumn("ship_band",
          when(lag <= 30, "0-30d").when(lag <= 90, "31-90d").otherwise("90d+"))
        .groupBy("ship_band")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("ship_band")
    }),

    "q14_promo_revenue" -> ((s, d) => {
      // TPC-H Q14 shape: month-filtered lineitem joins the broadcast
      // part dim; promo share is one conditional aggregate over the
      // joined scan — a single-row answer with zero wide exchange
      // (partial aggregation collapses before the final gather).
      val l = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-09-01") &&
          col("l_shipdate") < lit("1995-10-01"))
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
            sum(rev), 4).as("promo_pct"))
    }),

    "q19_disjunctive_revenue" -> ((s, d) => {
      // TPC-H Q19 shape: three disjunctive brand×quantity×size arms.
      // The per-table halves of the disjunction (brand/size on part,
      // quantity on lineitem) are pushed as an OR-of-ranges into each
      // scan; the cross-table residual evaluates on the broadcast-join
      // output. One row out.
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val j = l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val arm1 = col("p_brand") === "Brand#11" &&
        col("l_quantity").between(1, 11) && col("p_size").between(1, 5)
      val arm2 = col("p_brand") === "Brand#12" &&
        col("l_quantity").between(10, 20) && col("p_size").between(1, 10)
      val arm3 = col("p_brand") === "Brand#13" &&
        col("l_quantity").between(20, 30) && col("p_size").between(1, 15)
      j.filter(arm1 || arm2 || arm3)
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    }),

    "q22_idle_balance" -> ((s, d) => {
      // TPC-H Q22 shape: scalar-subquery average broadcast onto the
      // customer scan, then a LEFT ANTI join drops customers with a
      // matching order — the "has money, hasn't converted" cohort per
      // segment. Segments stand in for the fixture's missing phone
      // prefixes; the anti side is urgent-1995 orders because every
      // fixture customer has SOME order (all-orders would be empty).
      val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
      val c = Tables.customer(s, d).filter(col("c_mktsegment").isin(segs: _*))
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(avg(col("c_acctbal")).as("__avg_bal"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") < lit("1996-01-01"))
        .select("o_custkey")
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("__avg_bal"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal")), 2).as("totacctbal"))
        .orderBy("c_mktsegment")
    }),

    // --- TPC-H completion (r18): every remaining query shape the fixture
    //     schema can express (no partsupp table, no commit/receipt dates
    //     or containers — Q2/Q11/Q16 are inexpressible; Q9/Q13/Q20/Q21
    //     adapt their predicates, keeping the reference join shape).
    "q6_forecast_revenue" -> ((s, d) => {
      // TPC-H Q6: the pure scan-aggregate. Every predicate pushes to the
      // parquet scan (plan-gated); partial sums collapse map-side, so the
      // only exchange carries ONE row per task.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    "q8_market_share" -> ((s, d) => {
      // TPC-H Q8: national market share inside a region's customers.
      // part (type-filtered), supplier, and both nation legs broadcast;
      // the two at-scale exchanges are lineitem⋈orders (orderkey) and
      // orders⋈customer (custkey). The share is a conditional-sum ratio
      // per year — 2 rows out.
      val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val n1 = Tables.nation(s, d).filter(col("n_regionkey") === 1)
        .select(col("n_nationkey").as("c_nkey"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val c = Tables.customer(s, d)
        .join(broadcast(n1), col("c_nationkey") === col("c_nkey"))
        .select("c_custkey")
      val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01") &&
          col("o_orderdate") <= lit("1996-12-31"))
      val vol = (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume")
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(year(col("o_orderdate")).as("o_year"), vol, col("supp_nation"))
        .groupBy("o_year")
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(0.0)) /
            sum(col("volume")), 4).as("mkt_share"))
        .orderBy("o_year")
    }),

    "q9_product_profit" -> ((s, d) => {
      // TPC-H Q9 shape (profit = revenue; the fixture has no partsupp /
      // supplycost): name-matched parts and supplier→nation broadcast
      // into the lineitem scan, orders joined on the one orderkey
      // exchange, grouped by (nation, year).
      val p = Tables.part(s, d).filter(col("p_name").like("%red%"))
        .select("p_partkey")
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    "q13_order_distribution" -> ((s, d) => {
      // TPC-H Q13: the histogram-of-counts double aggregation. LEFT
      // OUTER join keeps zero-order customers; the join predicate's
      // order filter (priority stands in for the fixture's missing
      // o_comment pattern) rides the join so non-matching orders count
      // as absent, not as zero rows dropped. One custkey exchange; the
      // second aggregate is |distinct counts| rows.
      val c = Tables.customer(s, d).select("c_custkey")
      val o = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "3-MEDIUM")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    "q15_top_supplier" -> ((s, d) => {
      // TPC-H Q15: the revenue view + scalar-max subquery. Revenue
      // aggregates to |suppliers| rows on one suppkey exchange; the max
      // broadcasts back as a 1-row build (BroadcastNestedLoopJoin is the
      // right plan for a scalar); the surviving ~1 row broadcasts into
      // the supplier dim. Revenue rounds BEFORE the max so tie
      // semantics are exact 2-dp arithmetic in both engines.
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1996-04-01"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mx"))
      val top = rev.join(broadcast(mx), col("total_revenue") === col("__mx"))
      Tables.supplier(s, d)
        .join(broadcast(top), col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    "q17_small_quantity_revenue" -> ((s, d) => {
      // TPC-H Q17: the correlated per-part average. Brand-filtered parts
      // broadcast into the lineitem scan; the per-part (sum, count)
      // aggregate — |parts-in-brand| rows — broadcasts back onto the
      // same joined relation. The threshold l_quantity < 0.2·avg is
      // evaluated as qty·cnt·5 < sum: quantities are integral doubles,
      // so both sides are EXACT integer arithmetic — no avg-rounding
      // ulp can flip a row (0.2·avg itself is inexact in binary).
      val p = Tables.part(s, d)
        .filter(col("p_brand") === "Brand#11" && col("p_size") <= 5)
        .select("p_partkey")
      val li = Tables.lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val perPart = li.groupBy(col("p_partkey").as("ap_pk"))
        .agg(sum(col("l_quantity")).as("ap_sum"), count(lit(1)).as("ap_cnt"))
      li.join(broadcast(perPart), col("p_partkey") === col("ap_pk"))
        .filter(col("l_quantity") * col("ap_cnt") * 5.0 < col("ap_sum"))
        .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    }),

    "q20_excess_suppliers" -> ((s, d) => {
      // TPC-H Q20 shape (availqty lives in the missing partsupp; the
      // aggregate-then-semi-join nesting is the point): suppliers who
      // shipped > 40 units of any single PROMO part in 1995. The inner
      // aggregate shuffles once on (suppkey, partkey); its distinct
      // suppkeys broadcast as a LEFT SEMI into the supplier dim.
      val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select("p_partkey")
      val heavy = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01") &&
          col("l_shipdate") < lit("1996-01-01"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 40.0)
        .select("l_suppkey")
      Tables.supplier(s, d)
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    "q21_waiting_suppliers" -> ((s, d) => {
      // TPC-H Q21 shape: the EXISTS / NOT EXISTS pair over same-order
      // lines. Instead of the textbook three lineitem self-joins (three
      // orderkey shuffles), both existence tests fold into ONE orderkey
      // window: distinct suppliers on the order, and distinct LATE
      // suppliers (late = shipped >90 days after the order date — the
      // fixture has no receipt/commit dates). A line waits alone iff it
      // is late, others supplied the order, and no OTHER supplier was
      // late. Supplier and nation broadcast; numwait counts l1 lines,
      // as in the reference query.
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val j = Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      val w = Window.partitionBy("l_orderkey")
      val flagged = j
        .withColumn("n_supps", size(collect_set(col("l_suppkey")).over(w)))
        .withColumn("n_late", size(collect_set(
          when(col("late"), col("l_suppkey"))).over(w)))
        .filter(col("late") && col("n_supps") > 1 && col("n_late") === 1)
      val sn = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      flagged.join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    "skew_salted_join" -> ((s, d) => {
      // Salted join demo with an exactness oracle: result ==
      // plain probe⋈build regardless of salt count. lineitem probes,
      // orders replicates 8×; the hot-key risk this mitigates at 100 TB
      // (one viral orderkey) is absent in the fixture, so the oracle is
      // simply the unsalted join — which is the operator's contract.
      val probe = Tables.lineitem(s, d).select(
        col("l_orderkey").as("okey"), col("l_quantity"))
      val build = Tables.orders(s, d).select(
        col("o_orderkey").as("okey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(probe, build, "okey", 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    "winnow_profile" -> ((s, d) =>
      // zero-shuffle scan: fingerprints + counts are one codegen kernel
      // call per row (see Plans.winnowProfileShape)
      graft.operators.Winnow.profile(
        Tables.documents(s, d), "text", "doc_id", k = 8, w = 15)
        .orderBy("id")),

    "winnow_neardup" -> ((s, d) =>
      // local-passage overlap on the CDC demo corpus (head-inserted
      // copies): winnowing's guarantee says every shared run of
      // >= w+k-1 = 22 normalized chars yields a shared fingerprint, so
      // each planted copy pairs with its original at containment ~1.0.
      // maxBucket=64 drops corpus-ubiquitous fingerprints (the MOSS
      // boilerplate rule) — the sf0.1 probe (SCALING.md) measured 96%
      // of the self-join's pair-work in buckets >64 that contribute
      // zero true near-dup signal
      graft.operators.Winnow.overlapPairs(cdcBase(s, d), "text", "doc_id",
          k = 8, w = 15, minShared = 5, maxBucket = 64)
        .filter(col("containment") >= 0.5)
        .orderBy("id_a", "id_b")),

    "events_cube" -> ((s, d) =>
      EventAnalytics.cubeReport(Tables.events(s, d))
        .orderBy("gid", "event_type", "day")),

    "events_rolling_avg" -> ((s, d) =>
      EventAnalytics.rollingDailyAvg(Tables.events(s, d))
        .orderBy("event_type", "day")),

    "events_corr" -> ((s, d) =>
      EventAnalytics.dailyCorr(Tables.events(s, d))
        .orderBy("type_a", "type_b")),

    "doc_top_terms" -> ((s, d) =>
      TextAnalysis.topTerms(Tables.documents(s, d), "text", "doc_id", k = 3)
        .orderBy("doc_id", "rank")),

    "value_quantile_sketch" -> ((s, d) => {
      // quantile member of the sketch trio: per-type p50/p90/p99 of
      // `value` from a bottom-k-by-hash row sample (k=64 < ~2000 rows
      // per type at sf0.01 → genuinely the sampled path). O(k) state
      // per group and ≤k (hash, value) pairs through the exchange where
      // exact percentile_approx-style summaries grow with data; the
      // deterministic hash membership is what the oracle replays.
      val k = 64
      Tables.events(s, d)
        .filter(col("event_type").isNotNull && col("value").isNotNull)
        .groupBy("event_type")
        .agg(
          graft.functions.BottomKSample.sample(
            Sampling.keyHash(col("event_id")), col("value"), k).as("smp"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("n_rows"),
          size(col("smp")).as("n_sample"),
          round(graft.functions.BottomKSample.quantileAt(col("smp"), 0.5), 2).as("p50_est"),
          round(graft.functions.BottomKSample.quantileAt(col("smp"), 0.9), 2).as("p90_est"),
          round(graft.functions.BottomKSample.quantileAt(col("smp"), 0.99), 2).as("p99_est"))
        .orderBy("event_type")
    }),

    "quality_percentile_band" -> ((s, d) => {
      // DCLM-style percentile gate: keep each language's top-30% by
      // quality score, ranked WITHIN the language so no language is
      // wiped out by a global threshold. One lang-keyed window
      // exchange; the rank is over the ROUNDED score with doc_id
      // tie-break, so the ordering (and the band cut) is exact integer
      // /4-dp arithmetic both engines replay bit-identically.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang")
        .orderBy(col("quality").desc, col("doc_id"))
      Tables.documents(s, d)
        .withColumn("quality", round(TextAnalysis.qualityScore(col("text")), 4))
        .withColumn("pct", round(percent_rank().over(w), 4))
        .filter(col("pct") <= 0.3)
        .select("doc_id", "lang", "quality", "pct")
        .orderBy("lang", "pct", "doc_id")
    }),
  )

  /** Epoch micros for either TIMESTAMP or TIMESTAMP_NTZ input. The
    * driver's parquet encodes `ts` as NTZ, which `unix_micros` rejects;
    * casting through TIMESTAMP under the session's UTC zone gives the
    * same epoch value DuckDB's `epoch_us` computes on the NTZ column. */
  private def tsMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Deterministic messy crawl-style URL per document (the testdata has
    * no url column). Variants key off `doc_id % 60` so canonical forms
    * COLLIDE across docs, while the tracking params carry the raw
    * `doc_id` so the RAW strings stay distinct — exactly the shape
    * URL canonicalization exists to collapse. The DuckDB oracles build
    * the identical string ([[oracleSql]] `url_*` entries). */
  private def messyUrl(id: Column): Column = {
    val uid = pmod(id, lit(60L))
    val hostPick = element_at(array(
      lit("Example.COM"), lit("news.example.co.uk"), lit("blog.example.com"),
      lit("EXAMPLE.com:443"), lit("cdn.site.org:80"), lit("shop.site.org"),
      lit("a.b.example.co.uk"),
      // PSL-challenging hosts: multi-level ccTLD suffixes, a private
      // (GitHub Pages) suffix, and a *.ck wildcard rule — naive
      // last-two-labels groups all of these wrong
      lit("Shop.Example.COM.CN"), lit("docs.portal.co.il"),
      lit("user1.github.io"), lit("pages.user2.GitHub.IO"),
      lit("a.b.cdn.foo.ck")), (pmod(uid, lit(12L)) + 1).cast("int"))
    concat(
      when(pmod(uid, lit(2L)) === 0, lit("https://")).otherwise(lit("HTTP://")),
      hostPick,
      lit("/articles/item-"), pmod(uid, lit(10L)).cast("string"),
      when(pmod(uid, lit(3L)) === 0, lit("/")).otherwise(lit("")),
      when(pmod(id, lit(2L)) === 0,
        concat(lit("?utm_source=feed&id="), pmod(uid, lit(5L)).cast("string"),
          lit("&utm_campaign=c"), pmod(id, lit(9L)).cast("string")))
        .otherwise(concat(lit("?id="), pmod(uid, lit(5L)).cast("string"),
          lit("&gclid=g"), id.cast("string"))),
      when(pmod(uid, lit(4L)) === 0, lit("#section-2")).otherwise(lit("")))
  }

  private def posify(v: Column): Column = transform(v, x => abs(x.cast("double")) + 1.0)

  /** Derive an in-range (lat, lng) pair from the first two embedding
    * dims so the haversine kernel gets geo-plausible input. */
  private def geoify(v: Column): Column = array(
    element_at(v, 1).cast("double") * 20.0,
    element_at(v, 2).cast("double") * 40.0)

  private def queryVecOf(emb: DataFrame): Seq[Double] =
    emb.filter(col("vec_id") === 0).select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)

  /** The k lowest-id embeddings double as deterministic cluster seeds for
    * the SemDeDup queries — a stand-in for trained k-means centroids that
    * the SQL oracle can reproduce exactly (bounded k-row collect). */
  private def seedCentroids(emb: DataFrame, k: Int): Seq[Seq[Double]] =
    emb.filter(col("vec_id") < k).orderBy("vec_id")
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0)).toSeq

  /** The index configurations the driver battery scans — built ONCE per
    * (JVM, data dir) and served from the persisted store thereafter
    * ([[graft.index.IndexCache]]), the way a real deployment treats
    * indexes: artifacts created ahead of query time, not per query. */
  val indexBuilders: Map[String, DataFrame => VectorIndex] = Map(
    "vaf" -> (df => VAIndex.buildFixed(df, "vec_id", "embedding", p = 2.0)),
    "vav" -> (df => VAIndex.buildVariable(df, "vec_id", "embedding", p = 2.0)),
    "vap" -> (df => VAIndex.buildPlus(df, "vec_id", "embedding")),
    "ecp" -> (df => ECPIndex.build(df, "vec_id", "embedding")),
    "pq" -> (df => PQIndex.build(df, "vec_id", "embedding", nsq = 8, nCentroids = 16)),
    "sh" -> (df => SHIndex.build(df, "vec_id", "embedding", nBits = 32)),
    // 8 single-hash tables + multi-probe(2): recall=1.0 at the verify SF
    // for k=100 with a 4x smaller table relation than the 32-table
    // equivalent (tight AND-combos can't cover a fifth of the corpus).
    "lsh" -> (df => LSHIndex.build(df, "vec_id", "embedding",
      nTables = 8, nHashes = 1, probes = 2)),
    "mi" -> (df => MIIndex.build(df, "vec_id", "embedding", ki = 15, ks = 15)),
    "ivfpq" -> (df => IVFPQIndex.build(df, "vec_id", "embedding", nsq = 8, nCentroids = 16)),
    "sq" -> (df => SQIndex.build(df, "vec_id", "embedding")),
    "bsq" -> (df => BSQIndex.build(df, "vec_id", "embedding")),
    "opq" -> (df => OPQIndex.build(df, "vec_id", "embedding", nsq = 8, nCentroids = 16)),
    // 4 shards × ef 128: at the verify SF the beam covers each ≤500/4
    // shard exhaustively (provable candidate cover); at corpus scale
    // the same ef bounds the walk instead
    "nsw" -> (df => NSWIndex.build(df, "vec_id", "embedding",
      nShards = 4, m = 8, efC = 64, ef = 128)),
    // the SERVED default config (SCALING.md Run 29 budget ladder:
    // heuristic diverse selection, m=16, efC=128, ef=256 — recall 0.99
    // with the family's fastest walk at corpus scale) pinned under the
    // correctness gate as its own row
    "nsw_heur" -> (df => NSWIndex.build(df, "vec_id", "embedding",
      nShards = 4, m = 16, efC = 128, ef = 256)))

  private def cachedIndex(s: SparkSession, d: String, key: String): VectorIndex =
    IndexCache.of(s, d, key)(indexBuilders(key)(Tables.embeddings(s, d)))

  private val partLayouts =
    new graft.core.OnceMemo[String, String]

  private val sparseLayouts =
    new graft.core.OnceMemo[String, String]

  /** Label-partitioned embeddings entity — one-time layout artifact per
    * (JVM, data dir). */
  private def partLayout(s: SparkSession, d: String): String =
    partLayouts.getOrElseUpdate(d, {
      val dir = freshScratch(s"part-${dirTag(d)}")
      val e = graft.core.Entity.create(s, dir, "embp")
      e.insert(Tables.embeddings(s, d))
      e.partitionLayout(graft.core.Partitioning.ByColumn("label"))
      dir
    })

  private val zorderDirs =
    new graft.core.OnceMemo[String, String]

  private val qcWeightsCache =
    new graft.core.OnceMemo[String, Seq[Double]]
  // the most recent training run — read by oracleSql (a def, evaluated
  // by Verify AFTER all queries ran) to inline the weights as literals
  @volatile private var lastQcWeights: Seq[Double] = Seq.fill(64)(0.0)

  /** Pegasos weights for the learned quality filter, trained on a FIXED
    * deterministic sample (doc_id < 300, labeled by the n_chars ≥ 200
    * length rule) — the same weights per (data dir), so the DuckDB
    * oracle can replay scoring with the vector inlined as literals. */
  private def qcWeights(s: SparkSession, d: String): Seq[Double] = {
    val w = qcWeightsCache.getOrElseUpdate(d, {
      val labeled = Tables.documents(s, d).filter(col("doc_id") < 300)
        .withColumn("label", when(col("n_chars") >= 200, 1).otherwise(-1))
      QualityClassifier.train(labeled, "text", "doc_id", "label", dim = 64)
    })
    lastQcWeights = w
    w
  }

  /** Lineitem z-ordered on (l_orderkey, l_partkey) — one-time layout
    * artifact per (JVM, data dir); every output file covers a small
    * rectangle in key space so parquet min/max stats prune scans
    * filtered on EITHER column. */
  private[graft] def zorderLayout(s: SparkSession, d: String): String =
    zorderDirs.getOrElseUpdate(d, {
      val dir = freshScratch(s"zorder-${dirTag(d)}")
      graft.core.Partitioning.write(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        graft.core.Partitioning.ZOrder("l_orderkey", "l_partkey", 16), dir)
      dir
    })

  /** Sparsified embeddings entity — one-time layout artifact per
    * (JVM, data dir). */
  private def sparseLayout(s: SparkSession, d: String): String =
    sparseLayouts.getOrElseUpdate(d, {
      val dir = freshScratch(s"sparseknn-${dirTag(d)}")
      val e = graft.core.Entity.create(s, dir, "emb")
      e.insert(Tables.embeddings(s, d).select("vec_id", "embedding"))
      e.sparsify("embedding")
      dir
    })

  private val kvLayouts =
    new graft.core.OnceMemo[String, String]

  private[graft] val kvHandler = graft.sources.StorageHandlers.keyValue("p_partkey")

  private val fullTextLayouts =
    new graft.core.OnceMemo[String, String]

  /** Persisted full-text index over `documents` — one-time layout
    * artifact per (JVM, data dir), the Solr-engine analogue. */
  private def fullTextLayout(s: SparkSession, d: String): String =
    fullTextLayouts.getOrElseUpdate(d, {
      val dir = freshScratch(s"fts-${dirTag(d)}")
      graft.sources.FullTextStore.write(s, dir, Tables.documents(s, d),
        "doc_id", "text")
      dir
    })

  // ---- geometry fixtures (r18) -------------------------------------------
  // Quarter-grid synthetic planar coordinates derived from keys: every
  // coordinate is an exact binary double (multiple of 1/4), so raycast /
  // shoelace / orientation arithmetic — IEEE correctly-rounded ops only —
  // is BIT-IDENTICAL between Spark and the DuckDB oracle.

  /** Customer points on the quarter grid: px ∈ [0, 24], py ∈ [0, 22]. */
  private def customerPoints(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      ((col("c_custkey") % 97).cast("double") * 0.25).as("px"),
      ((col("c_custkey") % 89).cast("double") * 0.25).as("py"))

  /** Non-convex 8-point star offsets (unit scale). */
  private val starOffsets = Seq((3.0, 0.0), (1.0, 1.0), (0.0, 3.0),
    (-1.0, 1.0), (-3.0, 0.0), (-1.0, -1.0), (0.0, -3.0), (1.0, -1.0))

  /** Closed ring: center + scaled offsets, closing vertex repeated. */
  private def offsetRing(cx: Column, cy: Column, scale: Column,
                         offsets: Seq[(Double, Double)]): Column =
    array((offsets :+ offsets.head).map { case (ox, oy) =>
      struct((cx + lit(ox) * scale).as("x"), (cy + lit(oy) * scale).as("y"))
    }: _*)

  /** One star polygon per nation: centers on a 5×5 grid of pitch 5,
    * scale cycling 1.0/1.5/2.0 — neighbors overlap, so intersects and
    * containment queries exercise both outcomes. */
  private def nationPolys(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(col("n_nationkey"),
      GeoAlgebra.wktPolygon(offsetRing(
        (col("n_nationkey") % 5).cast("double") * 5.0,
        floor(col("n_nationkey") / lit(5.0)) * 5.0,
        lit(1.0) + (col("n_nationkey") % 3).cast("double") * 0.5,
        starOffsets)).as("wkt"))

  /** One diamond per region, centered on the y = 10 row. */
  private def regionPolys(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).select(col("r_regionkey"),
      GeoAlgebra.wktPolygon(offsetRing(
        col("r_regionkey").cast("double") * 5.0 + 2.0, lit(10.0), lit(1.0),
        Seq((4.0, 0.0), (0.0, 4.0), (-4.0, 0.0), (0.0, -4.0)))).as("rwkt"))

  /** DuckDB twin of [[nationPolys]]: per-nation star vertices `nv` and
    * directed edges `ne(n_nationkey, x1, y1, x2, y2)` — same arithmetic,
    * exact doubles. Starts inside a WITH clause (no leading `WITH`). */
  private val nationEdgesSql =
    """off(i, dx, dy) AS (VALUES
      |  (0,3.0,0.0),(1,1.0,1.0),(2,0.0,3.0),(3,-1.0,1.0),
      |  (4,-3.0,0.0),(5,-1.0,-1.0),(6,0.0,-3.0),(7,1.0,-1.0)),
      |nv AS (SELECT n_nationkey, i,
      |         (n_nationkey % 5) * 5.0 + dx * (1.0 + (n_nationkey % 3) * 0.5) AS x,
      |         floor(n_nationkey / 5.0) * 5.0 + dy * (1.0 + (n_nationkey % 3) * 0.5) AS y
      |       FROM nation CROSS JOIN off),
      |ne AS (SELECT a.n_nationkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
      |       FROM nv a JOIN nv b ON a.n_nationkey = b.n_nationkey
      |                          AND b.i = (a.i + 1) % 8)""".stripMargin

  /** DuckDB twin of [[customerPoints]]. */
  private val customerPointsSql =
    """cp AS (SELECT c_custkey, (c_custkey % 97) * 0.25 AS px,
      |         (c_custkey % 89) * 0.25 AS py FROM customer)""".stripMargin

  /** Antimeridian wrap of an edge's longitude step into [−π, π) — the
    * exact mirror of [[graft.operators.Geo.areaGeoSqMeters]]'s `wrapPi`
    * (`Δλ − 2π·⌊Δλ/2π + ½⌋`, identity for |Δλ| < π; all exact-rounded
    * ops, 6.283185307179586 is the double 2π both engines share). */
  private def duckWrapPi(e: String): String =
    s"(($e) - 6.283185307179586 * floor(($e) / 6.283185307179586 + 0.5))"

  /** Even-odd raycast crossing term against an edge row — the exact
    * mirror of [[GeoAlgebra.stContains]]'s fold body. */
  private def raycastSql(e: String = "", px: String = "px", py: String = "py"): String =
    s"""CASE WHEN (${e}y1 > $py) <> (${e}y2 > $py)
       | AND $px < (${e}x2 - ${e}x1) * ($py - ${e}y1) / (${e}y2 - ${e}y1) + ${e}x1
       | THEN 1 ELSE 0 END""".stripMargin.replace("\n", "")

  /** Key-value store over `part` — one-time layout artifact per
    * (JVM, data dir), the embedded-KV-engine analogue. */
  private def kvLayout(s: SparkSession, d: String): String =
    kvLayouts.getOrElseUpdate(d, {
      val dir = freshScratch(s"kv-${dirTag(d)}")
      kvHandler.write(s, dir, Tables.part(s, d), overwrite = true)
      dir
    })

  private val geoLayouts =
    new graft.core.OnceMemo[String, String]

  /** Tile-partitioned point ENTITY (cell 2.0) — the PostGIS-spatial-
    * index role as a partition-pruned entity layout; one-time artifact
    * per (JVM, data dir). */
  private def geoLayout(s: SparkSession, d: String): String =
    geoLayouts.getOrElseUpdate(d, {
      val dir = freshScratch(s"geo-${dirTag(d)}")
      val e = graft.core.Entity.create(s, dir, "geopts")
      e.insert(customerPoints(s, d))
      e.partitionLayout(graft.core.Partitioning.Tile("px", "py", 2.0))
      dir
    })

  /** Pre-build the one-time entity-layout artifacts (untimed bench
    * warmup, alongside [[warmIndexes]]). */
  def warmLayouts(s: SparkSession, d: String): Unit = {
    partLayout(s, d)
    sparseLayout(s, d)
    kvLayout(s, d)
    fullTextLayout(s, d)
    geoLayout(s, d)
  }

  /** Pre-build the corpus admission indexes (MinHash bands, cosine
    * bands, SimHash bands) — like the vector indexes, these are
    * build-once artifacts a deployment prepares ahead of query time, so
    * the bench warms them untimed and the per-query numbers measure the
    * admission JOIN, the steady-state cost. */
  def warmCorpusIndexes(s: SparkSession, d: String): Unit = {
    val docs = Tables.documents(s, d)
    // persist is lazy — count() each cached relation so the signature
    // kernels actually run during the untimed warmup
    val mh = corpusIndexes.getOrElseUpdate(d,
      Dedup.indexCorpus(docs.filter(col("doc_id") < 400), "text", "doc_id"))
    mh.banded.count(); mh.shingles.count()
    val bench = benchIndexes.getOrElseUpdate(d,
      Dedup.indexCorpus(docs.filter(col("doc_id") < 50), "text", "doc_id"))
    bench.banded.count(); bench.shingles.count()
    val sh = simhashCorpusIndexes.getOrElseUpdate(d,
      Dedup.simhashIndexCorpus(docs.filter(col("doc_id") < 400), "text", "doc_id"))
    sh.banded.count()
    val emb = Tables.embeddings(s, d)
    val cs = cosineCorpusIndexes.getOrElseUpdate(d,
      Ann.indexCorpusCosine(emb.filter(col("vec_id") < 400), "vec_id", "embedding",
        dim = 64))
    cs.banded.count(); cs.vectors.count()
    val sem = semanticCorpusIndexes.getOrElseUpdate(d,
      Ann.indexCorpusSemantic(emb.filter(col("vec_id") < 400), "vec_id", "embedding",
        seedCentroids(emb, 16)))
    sem.assigned.count()
  }

  /** ONE scratch root per JVM for every battery query that writes a
    * throwaway entity/export (lifecycle, upsert, vacuum, sparse, import/
    * export, vertical). Deleted by a single shutdown hook; per-query
    * subdirs are wiped-and-recreated per invocation by [[freshScratch]],
    * so repeated battery runs in one JVM leave zero orphaned `graft-*`
    * dirs AND bounded disk (each query owns exactly one live subdir). */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.core.Entity.deleteRecursively(p)))
    p
  }

  /** Collision-free tag for a data-dir path in a scratch-dir name —
    * MD5 over the full path (String.hashCode is 32-bit and two data
    * dirs colliding would silently cross-serve each other's layouts). */
  private def dirTag(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** A clean per-query scratch dir under [[scratchRoot]]. Synchronized:
    * the wipe is not safe against a concurrent invocation of the SAME
    * query name — acceptable for the bench/battery surface these back
    * (the server's entity store uses its own per-entity dirs). */
  private def freshScratch(name: String): String = synchronized {
    val d = scratchRoot.resolve(name)
    graft.core.Entity.deleteRecursively(d)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Vertical-layout scratch, reused across runs (group handlers write
    * with overwrite=true — no per-invocation wipe needed). */
  private lazy val verticalScratch: String = {
    val d = scratchRoot.resolve("vert")
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Drop every per-data-dir cached index/layout artifact for `dir` —
    * the eviction seam for a long-lived server (hung off entity drop /
    * vacuum), so caches track live entities instead of growing without
    * bound. Unpersists cached frames, deletes layout temp dirs, and
    * evicts the persisted vector indexes. Returns how many cache
    * entries were released. */
  def releaseCaches(dir: String): Int = {
    var n = 0
    def drop[A](m: graft.core.OnceMemo[String, A])
               (free: A => Unit): Unit =
      m.remove(dir).foreach { v => free(v); n += 1 }
    drop(corpusIndexes)(_.release())
    drop(benchIndexes)(_.release())
    drop(simhashCorpusIndexes)(_.release())
    drop(cosineCorpusIndexes)(_.release())
    drop(semanticCorpusIndexes)(_.release())
    drop(hybridSqIndexes)(_ => ())
    drop(qcWeightsCache)(_ => ())
    val del = (p: String) =>
      graft.core.Entity.deleteRecursively(java.nio.file.Paths.get(p))
    drop(partLayouts)(del)
    drop(sparseLayouts)(del)
    drop(zorderDirs)(del)
    drop(kvLayouts)(del)
    drop(fullTextLayouts)(del)
    n + IndexCache.release(dir)
  }

  private val corpusIndexes =
    new graft.core.OnceMemo[String, Dedup.CorpusIndex]

  /** SQ8-over-normalized-embeddings index for the hybrid vector leg —
    * build-once per data dir (one min/max agg + one encode pass). */
  private val hybridSqIndexes =
    new graft.core.OnceMemo[String, graft.index.SQIndex]

  private val cosineCorpusIndexes =
    new graft.core.OnceMemo[String, Ann.CosineCorpusIndex]

  private val simhashCorpusIndexes =
    new graft.core.OnceMemo[String, Dedup.SimHashCorpusIndex]

  private val semanticCorpusIndexes =
    new graft.core.OnceMemo[String, Ann.SemanticCorpusIndex]

  private val benchIndexes =
    new graft.core.OnceMemo[String, Dedup.CorpusIndex]

  /** Documents text with synthetic PII appended (email + IP + phone
    * derived from doc_id) so the PII scan exercises real matches; every
    * piece is replayable by the oracle's `||` concatenation. */
  private def piiText: Column = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@mail.example or 192.168."), (col("doc_id") % 254 + 1).cast("string"),
    lit(".7 call 555-867-530"), (col("doc_id") % 10).cast("string"), lit("."))

  /** Pre-build + persist every index for `dir` (untimed bench warmup). */
  def warmIndexes(s: SparkSession, d: String): Unit = {
    indexBuilders.keys.toSeq.sorted.foreach(cachedIndex(s, d, _))
    // the hybrid leg's SQ8-over-normalized index is a build-once
    // artifact like the rest of the family — build AND materialize it
    // untimed (persist is lazy), so hybrid_search_rrf measures the
    // fused query, not a first-touch index build
    val emb = Tables.embeddings(s, d)
    val idx = hybridSqIndexes.getOrElseUpdate(d,
      Ann.buildCosineSQIndex(emb, "vec_id", "embedding"))
    idx.candidates(queryVecOf(emb), 1, 1).count()
  }

  /** Scan a stored index for the canonical query vector, exact-rerank
    * with Euclidean, k=100. */
  private def indexKnn(key: String, timesK: Int = 5)
  : (SparkSession, String) => DataFrame = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = queryVecOf(emb)
    val idx = cachedIndex(s, d, key)
    idx.knn(emb, "vec_id", Distances.euclidean(col("embedding"), Distances.vecLit(q)),
        q, 100, timesK)
      .select(col("vec_id"), round(col(Knn.DistanceCol), 4).as("distance"))
  }

  private def fuzzyInputs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val l = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice") / 1000000.0).as("distance"))
    val r = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("id"))
      .agg((sum("l_quantity") / 100.0).as("distance"))
      .filter(col("distance") > 1.0)
    (l, r)
  }

  // ---- DuckDB oracles ------------------------------------------------------

  private val duckPos = "abs(CAST(e.embedding[i] AS DOUBLE)) + 1.0"
  private val duckPosQ = "abs(CAST(q.qv[i] AS DOUBLE)) + 1.0"
  private val duckToks =
    "string_split_regex(lower(trim(text)), '\\s+')"
  private val duckNorm =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val duckShingles =
    s"""list_distinct(CASE WHEN len(toks) <= 3 THEN [array_to_string(toks, ' ')]
       | ELSE list_transform(generate_series(1, len(toks)-2),
       |   i -> array_to_string(toks[i:i+2], ' ')) END)""".stripMargin
  private val duckStops =
    TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ",", "]")

  /** Portable key hash — the DuckDB replay of
    * [[graft.operators.Sampling.keyHash]]: rolling `h = (h·131 +
    * codepoint) mod 1e9+7` (seed 7, NULL/empty → 7) finalized with the
    * `· 2654435761 mod p` avalanche step. */
  private def duckRawHash(expr: String) =
    s"""((CASE WHEN $expr IS NULL OR length($expr) = 0 THEN CAST(7 AS BIGINT) ELSE
       | list_reduce(list_prepend(CAST(7 AS BIGINT),
       |   list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS BIGINT))),
       |   (h, c) -> (h * 131 + c) % 1000000007) END) * 2654435761) % 1000000007""".stripMargin

  /** The independent second hash ([[graft.operators.Sampling.keyHash2]]):
    * multiplier 137, modulus 998244353, seed 11, avalanche 3266489917. */
  private def duckRawHash2(expr: String) =
    s"""((CASE WHEN $expr IS NULL OR length($expr) = 0 THEN CAST(11 AS BIGINT) ELSE
       | list_reduce(list_prepend(CAST(11 AS BIGINT),
       |   list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS BIGINT))),
       |   (h, c) -> (h * 137 + c) % 998244353) END) * 3266489917) % 998244353""".stripMargin

  /** [[graft.operators.Sampling.keyHash62]]: the identity-grade packed
    * pair `h1 · 2³¹ + h2`. */
  private def duckKeyHash62(expr: String) =
    s"(${duckRawHash(expr)}) * 2147483648 + (${duckRawHash2(expr)})"

  /** The CDC demo corpus: every document plus, for `doc_id < 50`, a
    * copy with text prefixed (head insertion) under `doc_id + 10000` —
    * chunk hashes after the first content boundary must survive the
    * shift. */
  private def cdcBase(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") < 50)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(lit("NEW PREFIX "), col("text")).as("text")))
  }

  /** Unrolled DuckDB replay of the CDC window hash over the trailing
    * `w` chars of `tExpr` ending at 1-based position `iExpr` — the
    * `h·131 + c mod 1e9+7` recurrence, seed 7, one mod per step. */
  private def duckWinHash(tExpr: String, iExpr: String, w: Int): String =
    (0 until w).foldLeft("CAST(7 AS BIGINT)") { (acc, j) =>
      s"(($acc * 131 + unicode(substr($tExpr, $iExpr - ${w - 1 - j}, 1))) % 1000000007)"
    }

  /** CDC base corpus + boundary + chunk CTEs shared by the `cdc_*`
    * oracles — the DuckDB replay of [[cdcBase]] and
    * [[graft.operators.Dedup.cdcChunks]] (window 8, divisor 64).
    * Yields `cch(doc_id, chunk_idx, start_pos, chunk_len, ctext)`. */
  private val duckCdcCtes: String = {
    val wh = duckWinHash("text", "i", 8)
    s"""cbase AS (SELECT doc_id, text FROM documents
       | UNION ALL
       | SELECT doc_id + 10000, concat('NEW PREFIX ', text) FROM documents
       | WHERE doc_id < 50),
       |cpos AS (SELECT doc_id, text, unnest(generate_series(8, length(text))) AS i
       |         FROM cbase WHERE length(text) >= 8),
       |cbnd AS (SELECT doc_id, i FROM cpos
       |         WHERE ($wh) % 64 = 0 AND i != length(text)),
       |cbl AS (SELECT doc_id, list_sort(list(i)) AS cuts FROM cbnd GROUP BY doc_id),
       |cwb AS (SELECT b.doc_id, b.text,
       |  list_append(list_prepend(CAST(0 AS BIGINT),
       |    coalesce(cuts, CAST([] AS BIGINT[]))), CAST(length(b.text) AS BIGINT)) AS bs
       | FROM cbase b LEFT JOIN cbl ON b.doc_id = cbl.doc_id),
       |cch AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS chunk_idx, bs[j] AS start_pos,
       |               bs[j+1] - bs[j] AS chunk_len,
       |               substr(text, CAST(bs[j] + 1 AS INT), CAST(bs[j+1] - bs[j] AS INT)) AS ctext
       |        FROM (SELECT doc_id, text, bs,
       |                unnest(generate_series(1, len(bs) - 1)) AS j FROM cwb)
       |        WHERE bs[j+1] - bs[j] > 0)""".stripMargin
  }

  /** Winnowing-fingerprint CTEs over a `(doc_id, text)` corpus CTE —
    * the DuckDB replay of [[graft.operators.Winnow]] (k=8, w=15) via
    * the window-min formulation (a DIFFERENT algorithm from the
    * monotonic-deque kernel, which is the point of the oracle). Yields
    * `wg(doc_id, G)` (gram counts, every doc) and
    * `wfp(doc_id, G, m)` (selected packed fingerprints `hash·2^33 +
    * pos0`). Window starts are capped at `G - w + 1` — trailing
    * partial windows are not windows, matching the kernel. */
  private def duckWinnowCtes(corpus: String): String = {
    val gram = duckWinHash("t", "p + 7", 8)
    s"""wn AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
       |       FROM $corpus),
       |wg AS (SELECT doc_id, t, greatest(length(t) - 7, 0) AS G FROM wn),
       |wp AS (SELECT doc_id, G, t, unnest(generate_series(1, G)) AS p
       |       FROM wg WHERE G >= 1),
       |wpk AS (SELECT doc_id, G, p,
       |          ($gram) * 8589934592 + (p - 1) AS pk FROM wp),
       |wsel AS (SELECT doc_id, G, p,
       |    min(pk) OVER (PARTITION BY doc_id ORDER BY p
       |      ROWS BETWEEN CURRENT ROW AND 14 FOLLOWING) AS m
       |  FROM wpk),
       |wfp AS (SELECT DISTINCT doc_id, G, m FROM wsel
       |        WHERE p <= greatest(G - 15, 0) + 1)""".stripMargin
  }

  /** Raw-URL construction + canonicalization + registrable-domain CTEs
    * shared by the `url_*` oracles — the DuckDB replay of [[messyUrl]],
    * [[graft.operators.Url.canonicalizeUrl]] and
    * [[graft.operators.Url.registrableDomain]]. Yields
    * `uk(doc_id, url, url_canon, domain)`. */
  private val duckUrlCtes: String =
    """uraw AS (SELECT doc_id,
      |  concat(
      |   CASE WHEN (doc_id % 60) % 2 = 0 THEN 'https://' ELSE 'HTTP://' END,
      |   (['Example.COM','news.example.co.uk','blog.example.com',
      |     'EXAMPLE.com:443','cdn.site.org:80','shop.site.org',
      |     'a.b.example.co.uk','Shop.Example.COM.CN','docs.portal.co.il',
      |     'user1.github.io','pages.user2.GitHub.IO',
      |     'a.b.cdn.foo.ck'])[CAST((doc_id % 60) % 12 + 1 AS INT)],
      |   '/articles/item-', CAST((doc_id % 60) % 10 AS VARCHAR),
      |   CASE WHEN (doc_id % 60) % 3 = 0 THEN '/' ELSE '' END,
      |   CASE WHEN doc_id % 2 = 0
      |    THEN concat('?utm_source=feed&id=', CAST((doc_id % 60) % 5 AS VARCHAR),
      |                '&utm_campaign=c', CAST(doc_id % 9 AS VARCHAR))
      |    ELSE concat('?id=', CAST((doc_id % 60) % 5 AS VARCHAR),
      |                '&gclid=g', CAST(doc_id AS VARCHAR)) END,
      |   CASE WHEN (doc_id % 60) % 4 = 0 THEN '#section-2' ELSE '' END) AS url
      | FROM documents),
      |upp AS (SELECT doc_id, url,
      |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS sch,
      |  regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
      |  regexp_extract(url, '\?([^#]*)', 1) AS q
      | FROM uraw),
      |uhh AS (SELECT doc_id, url, sch,
      |  CASE WHEN sch = 'http'
      |       THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':80$', '')
      |       WHEN sch = 'https'
      |       THEN regexp_replace(lower(regexp_extract(rest, '^([^/?#]*)', 1)), ':443$', '')
      |       ELSE lower(regexp_extract(rest, '^([^/?#]*)', 1)) END AS hostport,
      |  regexp_replace(regexp_extract(rest, '^[^/?#]*([^?#]*)', 1), '/+$', '') AS pth, q
      | FROM upp),
      |ukk AS (SELECT doc_id, url, sch, hostport, pth,
      |  array_to_string(list_sort(list_filter(string_split(q, '&'),
      |    p -> length(p) > 0 AND NOT regexp_matches(p,
      |      '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)='))), '&') AS kept
      | FROM uhh),
      |ucc AS (SELECT doc_id, url, hostport,
      |  concat(sch, '://', hostport, pth,
      |   CASE WHEN length(kept) > 0 THEN concat('?', kept) ELSE '' END) AS url_canon
      | FROM ukk),
      |upsl AS (SELECT regexp_extract(rule, '^(\S+)', 1) AS r
      | FROM read_csv('/root/repo/src/main/resources/graft/public_suffix_list.dat',
      |   header=false, delim='\t', quote='', columns={'rule': 'VARCHAR'})
      | WHERE length(trim(rule)) > 0 AND rule NOT LIKE '//%'),
      |upex AS (SELECT r FROM upsl WHERE r NOT LIKE '*.%' AND r NOT LIKE '!%'),
      |upwc AS (SELECT substr(r, 3) AS b FROM upsl WHERE r LIKE '*.%'),
      |upxc AS (SELECT substr(r, 2) AS r FROM upsl WHERE r LIKE '!%'),
      |uhb AS (SELECT doc_id, url, url_canon,
      |          string_split(regexp_replace(hostport, ':[0-9]+$', ''), '.') AS ls
      |        FROM ucc),
      |usm AS (SELECT doc_id, i, n, array_to_string(ls[i:n], '.') AS sfx,
      |          CASE WHEN i < n THEN array_to_string(ls[i+1:n], '.') END AS tl
      |        FROM (SELECT doc_id, ls, len(ls) AS n,
      |                unnest(generate_series(1, len(ls))) AS i FROM uhb)),
      |urx AS (SELECT usm.doc_id,
      |          min(CASE WHEN xr.r IS NOT NULL THEN i END) AS exc_i,
      |          min(CASE WHEN er.r IS NOT NULL OR wr.b IS NOT NULL THEN i END) AS mat_i
      |        FROM usm
      |        LEFT JOIN upex er ON usm.sfx = er.r
      |        LEFT JOIN upwc wr ON usm.tl = wr.b
      |        LEFT JOIN upxc xr ON usm.sfx = xr.r
      |        GROUP BY usm.doc_id),
      |uk AS (SELECT u.doc_id, u.url, u.url_canon,
      |  array_to_string(u.ls[greatest(coalesce(x.exc_i, coalesce(x.mat_i, u.n) - 1), 1):u.n], '.') AS domain
      | FROM (SELECT doc_id, url, url_canon, ls, len(ls) AS n FROM uhb) u
      | JOIN urx x USING (doc_id))""".stripMargin

  /** Token/bigram repetition CTEs over `documents` — the DuckDB replay of
    * [[graft.operators.TextAnalysis.repetitionSignals]]'s two
    * aggregations. Yields `tk/ts/bs` for the select in [[duckRepCols]]. */
  private val duckRepCtes =
    s"""tk AS (SELECT doc_id, list_filter($duckToks, t -> length(t) > 0) AS toks
       |       FROM documents),
       |ts AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS token_cnt,
       |              count(*) AS distinct_toks, max(cnt) AS top_cnt
       |       FROM (SELECT doc_id, g, count(*) AS cnt
       |             FROM (SELECT doc_id, unnest(toks) AS g FROM tk)
       |             GROUP BY doc_id, g)
       |       GROUP BY doc_id),
       |bs AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS bigram_cnt,
       |              count(*) AS distinct_bigrams
       |       FROM (SELECT doc_id, g, count(*) AS cnt
       |             FROM (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN [] ELSE
       |                     list_transform(generate_series(1, len(toks)-1),
       |                       i -> toks[i] || ' ' || toks[i+1]) END) AS g
       |                   FROM tk)
       |             GROUP BY doc_id, g)
       |       GROUP BY doc_id)""".stripMargin

  private val duckRepCols =
    """coalesce(ts.token_cnt, 0) AS token_cnt,
      | coalesce(round(CAST(ts.token_cnt - ts.distinct_toks AS DOUBLE) / ts.token_cnt, 4), 0.0) AS dup_token_frac,
      | coalesce(round(CAST(ts.top_cnt AS DOUBLE) / ts.token_cnt, 4), 0.0) AS top_token_frac,
      | coalesce(round(CAST(bs.bigram_cnt - bs.distinct_bigrams AS DOUBLE) / bs.bigram_cnt, 4), 0.0) AS dup_bigram_frac""".stripMargin

  /** The synthetic-PII text of the `pii_scan` query, in DuckDB `||`.
    * Single line: `||` at a line start would lose a pipe to the OUTER
    * interpolating string's stripMargin. */
  private val duckPiiText =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example or 192.168.' " +
      "|| CAST(doc_id % 254 + 1 AS VARCHAR) || '.7 call 555-867-530' " +
      "|| CAST(doc_id % 10 AS VARCHAR) || '.'"

  /** Quality-verdict oracle, shared by `quality_filter_verdicts` (merge
    * form) and `quality_filter_verdicts_perrow` (kernel form) — equal on
    * the unique-doc_id corpus. */
  private lazy val duckQualityVerdictsSql: String = {
    val quality =
      s"""( least(length(text) / 200.0, 1.0)
         |  + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0)
         |  + least((CAST(len(list_filter($duckToks, t -> list_contains($duckStops, t))) AS DOUBLE) / len($duckToks)) * 5.0, 1.0)
         | ) / 3.0""".stripMargin
    val reason =
      """CASE WHEN quality < 0.5 THEN 'low_quality'
        |      WHEN dup_token_frac > 0.6 THEN 'dup_tokens'
        |      WHEN top_token_frac > 0.15 THEN 'top_token'
        |      WHEN dup_bigram_frac > 0.08 THEN 'dup_bigrams'
        |      WHEN pii_cnt > 0 THEN 'pii'
        |      ELSE 'ok' END""".stripMargin
    s"""WITH $duckRepCtes,
       |q AS (SELECT doc_id, round($quality, 4) AS quality,
       |        CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailRe}'))
       |          + len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}'))
       |          + len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}')) AS BIGINT) AS pii_cnt
       |      FROM documents),
       |r AS (SELECT q.doc_id AS id, q.quality, q.pii_cnt, $duckRepCols
       |      FROM q LEFT JOIN ts ON q.doc_id = ts.doc_id
       |             LEFT JOIN bs ON q.doc_id = bs.doc_id)
       |SELECT id, quality, token_cnt, dup_token_frac, top_token_frac,
       |       dup_bigram_frac, pii_cnt,
       |       ($reason) = 'ok' AS keep, $reason AS reason
       |FROM r ORDER BY id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base, round(avg(l_discount),6) AS avg_disc,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "projection_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "count_lineitem" -> "SELECT count(*) AS n FROM lineitem",

    "exists_highvalue" ->
      """SELECT count(*) > 0 AS "exists" FROM
        | (SELECT 1 FROM orders WHERE o_totalprice > 400000 LIMIT 1)""".stripMargin,

    "distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "entity_preview" ->
      "SELECT doc_id FROM documents ORDER BY doc_id LIMIT 50",

    "empty_relation" ->
      "SELECT CAST(0 AS BIGINT) AS n",

    "cached_query" ->
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "predicate_in_lt" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |WHERE l_returnflag IN ('A','N') AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "predicate_like" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
        |WHERE o_orderpriority LIKE '1%'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "predicate_daterange" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS od FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice,2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "events_hourly" ->
      """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        | count(*) AS cnt
        |FROM events GROUP BY event_type, hour ORDER BY event_type, hour""".stripMargin,

    "q3_shipping" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey LIMIT 100""".stripMargin,

    "event_sessions" ->
      """SELECT user_id, CAST(sum(new_session) AS BIGINT) AS sessions, count(*) AS events FROM (
        | SELECT user_id,
        |  CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |       THEN 1 ELSE 0 END AS new_session
        | FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |       FROM events)
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,

    "event_attribution" ->
      """SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id,
        |  epoch_us(l.ts) AS l_us, epoch_us(r.ts) AS r_us
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |WHERE l.event_type = 'click' AND r.event_type = 'purchase'
        |  AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
        |ORDER BY l.user_id, l_id, r_id""".stripMargin,

    "event_attribution_unmatched" ->
      """SELECT l.user_id, l.event_id AS l_id, epoch_us(l.ts) AS l_us
        |FROM events l
        |WHERE l.event_type = 'click' AND NOT EXISTS (
        |  SELECT 1 FROM events r WHERE r.user_id = l.user_id
        |    AND r.event_type = 'purchase'
        |    AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE)
        |ORDER BY l.user_id, l_id""".stripMargin,

    "table_profile" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS "column", count(*) AS n_rows,
        |    count(*) - count(l_quantity) AS n_nulls,
        |    CAST(min(l_quantity) AS DOUBLE) AS min_v, CAST(max(l_quantity) AS DOUBLE) AS max_v,
        |    round(avg(l_quantity), 4) AS mean_v, round(stddev_samp(l_quantity), 4) AS stddev_v
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
        |    CAST(min(l_extendedprice) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE),
        |    round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', count(*), count(*) - count(l_discount),
        |    CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
        |    round(avg(l_discount), 4), round(stddev_samp(l_discount), 4)
        |  FROM lineitem
        |) ORDER BY "column"""".stripMargin,

    "corpus_mix_rollup" ->
      """SELECT coalesce(source, '<all>') AS source, coalesce(lang, '<all>') AS lang,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY source, lang""".stripMargin,

    "event_funnel" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |       WHERE event_type = 'click' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT u.user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_completed,
        |  (t3 IS NOT NULL) AS completed
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)
        |ORDER BY u.user_id""".stripMargin,

    "event_funnel_report" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |       WHERE event_type = 'click' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT steps_completed, count(*) AS n_users FROM (
        | SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |             WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_completed
        | FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |   LEFT JOIN s3 USING (user_id))
        |GROUP BY steps_completed ORDER BY steps_completed""".stripMargin,

    "event_value_quantiles" ->
      """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.95), 4) AS p95,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events WHERE event_type IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "event_transitions" ->
      """WITH seq AS (SELECT event_type AS f,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
        | FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |   AND event_type IS NOT NULL)
        |SELECT f AS from_type, t AS to_type, count(*) AS n FROM seq
        |WHERE t IS NOT NULL GROUP BY f, t
        |ORDER BY from_type, to_type""".stripMargin,

    "event_top_paths" ->
      """WITH p AS (
        | SELECT user_id,
        |   array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
        | FROM events
        | WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL
        | GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "event_anomalies" ->
      """WITH h AS (
        | SELECT event_type, date_trunc('hour', ts) AS hb, count(*) AS cnt
        | FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        | GROUP BY 1, 2),
        |s AS (
        | SELECT event_type, avg(cnt) AS m, stddev_pop(cnt) AS sd
        | FROM h GROUP BY 1)
        |SELECT event_type, strftime(hb, '%Y-%m-%d %H:00') AS hour, cnt,
        |  round(m, 4) AS mean_cnt, round((cnt - m) / sd, 4) AS z
        |FROM h JOIN s USING (event_type)
        |WHERE sd > 0 AND abs((cnt - m) / sd) >= 3.0
        |ORDER BY event_type, hour""".stripMargin,

    "event_props_stats" ->
      """WITH v AS (
        | SELECT event_type,
        |   TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        | FROM events WHERE event_type IS NOT NULL)
        |SELECT event_type,
        |  count(k) AS n_parsed,
        |  count(*) - count(k) AS n_missing,
        |  min(k) AS min_v, max(k) AS max_v,
        |  round(avg(k), 4) AS avg_v
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY day),
        |wau AS (SELECT d2 AS day, count(DISTINCT user_id) AS wau FROM (
        |  SELECT user_id,
        |    day + CAST(unnest(generate_series(0, 6)) AS INTEGER) AS d2 FROM ud)
        | GROUP BY d2)
        |SELECT day, dau, wau FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin,

    "event_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT user_id, min(d) AS cohort_day FROM ud GROUP BY user_id)
        |SELECT c.cohort_day, datediff('day', c.cohort_day, ud.d) AS day_offset,
        |  count(*) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "session_overlap_join" -> {
      def sess(tpe: String, pre: String) =
        s"""SELECT user_id, CAST(sid AS BIGINT) AS ${pre}_sid,
           | min(us) AS ${pre}_s, max(us) AS ${pre}_e FROM (
           | SELECT user_id, us, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           | FROM (SELECT user_id, epoch_us(ts) AS us,
           |        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           |             OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
           |                > 604800000000
           |             THEN 1 ELSE 0 END AS new_s
           |       FROM events WHERE event_type = '$tpe'))
           |GROUP BY user_id, sid""".stripMargin
      s"""WITH c AS (${sess("click", "c")}), e AS (${sess("error", "e")})
         |SELECT c.user_id, c_sid, e_sid, c_s, c_e, e_s, e_e
         |FROM c JOIN e ON c.user_id = e.user_id AND c_s <= e_e AND e_s <= c_e
         |ORDER BY c.user_id, c_sid, e_sid""".stripMargin
    },

    "range_join_price_bands" ->
      """SELECT p_partkey, count(*) AS n_in_band,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM part JOIN lineitem
        |  ON l_extendedprice BETWEEN p_retailprice - 5 AND p_retailprice + 5
        |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin,

    "event_asof_attribution" ->
      """SELECT p.user_id, p.event_id AS p_id, epoch_us(p.ts) AS p_us, c.c_id, c.c_us
        |FROM events p LEFT JOIN LATERAL (
        |  SELECT r.event_id AS c_id, epoch_us(r.ts) AS c_us FROM events r
        |  WHERE r.user_id = p.user_id AND r.event_type = 'click'
        |    AND r.ts <= p.ts AND r.ts >= p.ts - INTERVAL 30 MINUTE
        |  ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) c ON true
        |WHERE p.event_type = 'purchase'
        |ORDER BY user_id, p_id""".stripMargin,

    "event_asof_next" ->
      """SELECT l.user_id, l.event_id AS c_id, epoch_us(l.ts) AS c_us, n.p_id, n.p_us
        |FROM events l LEFT JOIN LATERAL (
        |  SELECT r.event_id AS p_id, epoch_us(r.ts) AS p_us FROM events r
        |  WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
        |    AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
        |  ORDER BY r.ts ASC, r.event_id ASC LIMIT 1) n ON true
        |WHERE l.event_type = 'click'
        |ORDER BY user_id, c_id""".stripMargin,

    "compound_setalgebra" ->
      """SELECT id, CAST(0.0 AS DOUBLE) AS distance FROM (
        | SELECT id FROM (
        |  SELECT id FROM (
        |   SELECT o_orderkey AS id FROM orders WHERE o_totalprice > 400000
        |   UNION ALL
        |   SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  INTERSECT
        |  SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        | EXCEPT
        | SELECT o_orderkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
        |) ORDER BY id""".stripMargin,

    "distance_dispatch" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         | round(${duckSum(s"abs($dx - $dq)")}, 4) AS d_l1,
         | round(sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}), 4) AS d_l2,
         | round(${duckSum(s"($dx - $dq)*($dx - $dq)")}, 4) AS d_l2sq,
         | round(list_max(list_transform(generate_series(1,64), i -> abs($dx - $dq))), 4) AS d_linf,
         | round(sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}), 4) AS d_default
         |FROM embeddings e, q ORDER BY e.vec_id""".stripMargin,

    "set_union" ->
      """SELECT id, CAST(0.0 AS DOUBLE) AS distance FROM (
        | SELECT o_orderkey AS id FROM orders WHERE o_totalprice > 450000
        | UNION ALL
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY id""".stripMargin,

    "set_intersect" ->
      """SELECT id, CAST(0.0 AS DOUBLE) AS distance FROM (
        | SELECT o_orderkey AS id FROM orders WHERE o_totalprice > 450000
        | INTERSECT
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY id""".stripMargin,

    "set_except" ->
      """SELECT id, CAST(0.0 AS DOUBLE) AS distance FROM (
        | SELECT o_orderkey AS id FROM orders WHERE o_totalprice > 450000
        | EXCEPT
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |) ORDER BY id""".stripMargin,

    "fuzzy_union" -> fuzzyOracle("least"),
    "fuzzy_intersect" -> fuzzyOracle("greatest"),

    "vote_topk" ->
      """SELECT id, round(1.0 - count(*) / 3.0, 6) AS distance FROM (
        | SELECT o_orderkey AS id FROM orders WHERE o_totalprice > 450000
        | UNION ALL SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
        |) GROUP BY id ORDER BY 1.0 - count(*) / 3.0, id LIMIT 500""".stripMargin,

    "knn_manhattan" -> duckKnn(duckSum(s"abs($dx - $dq)"), 100),
    "knn_euclidean" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "knn_sqeuclidean" -> duckKnn(duckSum(s"($dx - $dq)*($dx - $dq)"), 100),
    "knn_chebyshev" -> duckKnn(
      s"list_aggregate(list_transform(generate_series(1,64), i -> abs($dx - $dq)), 'max')", 100),
    "knn_cosine" -> duckKnn(
      s"""CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
         | ELSE 1.0 - ($duckDot) / ($duckNormE * $duckNormQ) END""".stripMargin,
      100, roundTo = 6),
    "knn_minkowski3" -> duckKnn(
      s"power(${duckSum(s"power(abs($dx - $dq), 3.0)")}, 1.0/3.0)", 100),
    "knn_hamming" -> duckKnn(
      duckSum(s"CASE WHEN $dx != $dq THEN 1.0 ELSE 0.0 END"), 100),
    "knn_spannorm" -> duckKnn(
      s"""list_aggregate(list_transform(generate_series(1,64), i -> $dx - $dq), 'max')
         | - list_aggregate(list_transform(generate_series(1,64), i -> $dx - $dq), 'min')""".stripMargin,
      100),
    "knn_correlation" -> {
      val meanE = s"(${duckSum(dx)} / 64.0)"
      val meanQ = s"(${duckSum(dq)} / 64.0)"
      val cDot = duckSum(s"($dx - $meanE) * ($dq - $meanQ)")
      val cNormE = s"sqrt(${duckSum(s"($dx - $meanE) * ($dx - $meanE)")})"
      val cNormQ = s"sqrt(${duckSum(s"($dq - $meanQ) * ($dq - $meanQ)")})"
      duckKnn(
        s"""CASE WHEN $cNormE < 1e-5 OR $cNormQ < 1e-5 THEN 0.0
           | ELSE 1.0 - ($cDot) / ($cNormE * $cNormQ) END""".stripMargin,
        100, roundTo = 6)
    },
    "knn_chisquared" -> duckKnn(duckSum(
      s"""CASE WHEN ($duckPos) + ($duckPosQ) > 0
         | THEN (($duckPos) - ($duckPosQ)) * (($duckPos) - ($duckPosQ)) / (($duckPos) + ($duckPosQ))
         | ELSE 0.0 END""".stripMargin), 100),
    "knn_kl" -> duckKnn(duckSum(
      s"""CASE WHEN abs($duckPos) < 1e-5 OR abs($duckPosQ) < 1e-5 THEN 0.0
         | ELSE ($duckPos) * ln(($duckPos) / ($duckPosQ)) END""".stripMargin), 100),
    "knn_jaccard" -> duckKnn(
      s"""1.0 - ${duckSum(s"least($duckPos, $duckPosQ)")}
         | / ${duckSum(s"greatest($duckPos, $duckPosQ)")}""".stripMargin,
      100, roundTo = 6),

    "entity_lifecycle" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity),2) AS qty
        |FROM lineitem WHERE l_quantity >= 49 AND l_linestatus != 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // v1 = expensive orders; v3 = after reprice-upsert ('O' rows
    // changed), band append (added unless F), delete F (removed)
    "entity_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_totalprice >= 400000),
        |fresh AS (
        |  SELECT o_orderkey, o_orderstatus FROM orders
        |  WHERE o_totalprice >= 300000 AND o_totalprice < 400000),
        |diff AS (
        |  SELECT 'removed' AS op, o_orderkey FROM old WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'changed', o_orderkey FROM old WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT 'added', o_orderkey FROM fresh WHERE o_orderstatus <> 'F')
        |SELECT op, count(*) AS cnt, min(o_orderkey) AS min_key,
        |  max(o_orderkey) AS max_key
        |FROM diff GROUP BY op ORDER BY op""".stripMargin,

    // the merged table = untouched expensive rows + repriced 'O' rows
    // (replaced by key) + the newly-appended mid-price band
    "entity_upsert" ->
      """WITH fin AS (
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |   WHERE o_totalprice >= 400000 AND o_orderstatus <> 'O'
        |  UNION ALL
        |  SELECT o_orderstatus, round(o_totalprice + 1000, 2) FROM orders
        |   WHERE o_totalprice >= 400000 AND o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |   WHERE o_totalprice >= 300000 AND o_totalprice < 400000
        |)
        |SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM fin GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "planner_hint_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "progressive_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    // timed race with a generous deadline: winner is the exact leg
    "timed_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 50),

    "vertical_reassembly" ->
      """SELECT o_orderstatus, count(*) AS cnt, round(sum(o_totalprice),2) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "entity_vacuum" ->
      """SELECT l_returnflag, count(*) AS cnt, round(sum(l_quantity),2) AS qty
        |FROM lineitem WHERE l_quantity >= 49
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "sparse_roundtrip" ->
      """SELECT vec_id, round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "centroid_by_label" ->
      """SELECT label, i - 1 AS dim, round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
        |FROM embeddings, generate_series(1, 64) AS t(i)
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "import_export_roundtrip" ->
      "SELECT doc_id FROM documents ORDER BY doc_id",

    "random_gen_stats" ->
      "SELECT CAST(500 AS BIGINT) AS n, CAST(16 AS INT) AS dmin, CAST(16 AS INT) AS dmax",

    "prefilter_bloom_knn" -> duckKnn(duckSum(s"abs($dx - $dq)"), 50,
      where = "WHERE e.vec_id % 5 = 0"),

    "multimodal_decode" ->
      """SELECT doc_id AS asset_id,
        | (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |FROM documents ORDER BY asset_id""".stripMargin,

    // keyframes fall every 3rd frame from 1 and every asset has >= 4
    // frames, so the 2-keyframe cap always selects frames 1 and 4; the
    // byte sizes replay the generator's formula
    "video_keyframe_plan" ->
      """SELECT doc_id AS asset_id, i AS frame_idx,
        | CAST(500 + (doc_id * 31 + i * 17) % 100 AS BIGINT) AS frame_bytes,
        | TRUE AS keyframe
        |FROM documents CROSS JOIN (VALUES (1), (4)) AS t(i)
        |ORDER BY asset_id, frame_idx""".stripMargin,

    // dHash oracle: NO pixel decode — the pattern's cell luminance is a
    // closed formula (Multimodal.patternLum), cells align exactly with
    // the 9×8 dHash grid and PNG is lossless, so expected bit (gy,gx) =
    // lum(gx) < lum(gx+1) analytically; pairs re-derived per bit with
    // Hamming ≤ 3 (the banding is exact in that range)
    "image_neardup_dhash" ->
      """WITH ids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS g, CAST(doc_id % 3 AS INT) AS v
        |  FROM documents WHERE doc_id < 600),
        |bits AS (
        |  SELECT id, t.i AS i,
        |    (CASE WHEN v = 2 AND (t.i % 8) = g % 8 AND (t.i // 8) = (g // 8) % 8 THEN 0
        |          ELSE 10 + (((t.i % 8) * 29 + (t.i // 8) * 13 + g * 17) % 200) END
        |     <
        |     CASE WHEN v = 2 AND (t.i % 8) + 1 = g % 8 AND (t.i // 8) = (g // 8) % 8 THEN 0
        |          ELSE 10 + ((((t.i % 8) + 1) * 29 + (t.i // 8) * 13 + g * 17) % 200) END) AS bit
        |  FROM ids, generate_series(0, 63) AS t(i))
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(count(*) FILTER (WHERE a.bit <> b.bit) AS INT) AS hamming
        |FROM bits a JOIN bits b ON a.i = b.i AND a.id < b.id
        |GROUP BY a.id, b.id
        |HAVING count(*) FILTER (WHERE a.bit <> b.bit) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // aHash oracle: expected bit k = amp(k) < amp(k+1) from
    // Multimodal.envAmp (adjacent window amplitudes always differ by ≥
    // 2000, far above the carrier's RMS estimation noise)
    "audio_neardup_ahash" ->
      """WITH ids AS (
        |  SELECT doc_id AS id, doc_id // 3 AS g, CAST(doc_id % 3 AS INT) AS v
        |  FROM documents WHERE doc_id < 600),
        |bits AS (
        |  SELECT id, t.k AS k,
        |    (CASE WHEN v = 2 AND t.k = (g % 63) + 1 THEN 0
        |          ELSE 2000 + ((t.k + g) % 7) * 2000 END
        |     <
        |     CASE WHEN v = 2 AND t.k + 1 = (g % 63) + 1 THEN 0
        |          ELSE 2000 + ((t.k + 1 + g) % 7) * 2000 END) AS bit
        |  FROM ids, generate_series(0, 63) AS t(k))
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(count(*) FILTER (WHERE a.bit <> b.bit) AS INT) AS hamming
        |FROM bits a JOIN bits b ON a.k = b.k AND a.id < b.id
        |GROUP BY a.id, b.id
        |HAVING count(*) FILTER (WHERE a.bit <> b.bit) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // line dedup over the derived one-word-per-line text: a line is
    // dropped where its normalized form appears in >= 10 distinct docs;
    // blank lines never count as duplicates and always survive
    "strip_lines" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(replace(text, ' ', chr(10)), chr(10)) AS ls
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, generate_subscripts(ls, 1) - 1 AS p, unnest(ls) AS line
        |  FROM d),
        |n AS (
        |  SELECT doc_id, p, line,
        |         regexp_replace(lower(trim(line)), '\s+', ' ', 'g') AS norm
        |  FROM o),
        |dup AS (
        |  SELECT norm FROM n WHERE norm <> ''
        |  GROUP BY norm HAVING count(DISTINCT doc_id) >= 10)
        |SELECT n.doc_id,
        |  coalesce(string_agg(CASE WHEN dup.norm IS NULL THEN n.line END,
        |                      chr(10) ORDER BY n.p), '') AS cleaned_text,
        |  CAST(count(CASE WHEN dup.norm IS NOT NULL THEN 1 END) AS BIGINT) AS n_removed
        |FROM n LEFT JOIN dup ON n.norm = dup.norm
        |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin,

    // the ByColumn layout makes the pruned scan EXACTLY the label-subset
    // scan, so the oracle is a plain filtered kNN — no recall caveat
    "partition_pruned_scan" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 50,
      where = "WHERE e.label IN (0, 1, 2)"),

    "zorder_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, round(l_quantity, 2) AS l_quantity
        |FROM lineitem WHERE l_partkey BETWEEN 100 AND 120
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // the sparse kernel's recomposed sum (base + nonzero walk) differs
    // from left-to-right dense summation only in float rounding order;
    // round(…, 4) absorbs it (asserted to ~1e-9 in DistanceSpec)
    "knn_sparse" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),

    "index_vaf_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_vav_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_vap_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),

    // Approximate-index scans equal brute force whenever candidates ⊇ the
    // true top-k: on the FIXED sf corpus + fixed seeds the candidate sets
    // are verified to cover the exact top-100 (IndexSpec recall=1.0
    // assertions), so the exact-kNN oracle applies. Data-dependent by
    // nature — on another corpus the approximate family could recall < 1.
    "index_ecp_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_pq_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_sh_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_lsh_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_mi_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_vote_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_ivfpq_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_opq_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_nsw_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    "index_nsw_heur_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),
    // the funnel equals exact cosine while each stage's survivors cover
    // the true top-k (IndexSpec pins this on the verify corpus)
    "ann_refine_topk" -> duckKnn(
      s"""CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
         | ELSE 1.0 - ($duckDot) / ($duckNormE * $duckNormQ) END""".stripMargin,
      50, roundTo = 6),
    "index_bsq_knn" -> {
      // exact two-phase replay: sign-mismatch Hamming top-500 (the
      // (hd, id) total order matches the index's TakeOrdered), cosine
      // rerank top-100 with the signed-zero normalization
      val signDiff = duckSum(
        s"CASE WHEN ($dx > 0) != ($dq > 0) THEN 1.0 ELSE 0.0 END")
      val cosD =
        s"""CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
           | ELSE 1.0 - ($duckDot) / ($duckNormE * $duckNormQ) END""".stripMargin
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |bham AS (SELECT e.vec_id, $signDiff AS hd FROM embeddings e, q),
         |bcand AS (SELECT vec_id FROM bham ORDER BY hd, vec_id LIMIT 500)
         |SELECT vec_id, round(d, 6) + 0.0 AS distance FROM (
         |  SELECT e.vec_id, $cosD AS d FROM embeddings e, q
         |  WHERE e.vec_id IN (SELECT vec_id FROM bcand)
         |) ORDER BY d, vec_id LIMIT 100""".stripMargin
    },

    "index_sq_knn" -> duckKnn(s"sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")})", 100),

    "ann_ivf_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id <= 2)
         |SELECT qid, vec_id, round(d, 4) AS distance FROM (
         |  SELECT qid, vec_id, d,
         |    row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |  FROM (SELECT q.qid, e.vec_id,
         |          sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}) AS d
         |        FROM embeddings e, q)
         |) WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    "text_fingerprint" ->
      """SELECT doc_id, CASE WHEN length(nrm) = 0 THEN CAST(7 AS BIGINT) ELSE
        |  list_reduce(
        |    list_prepend(CAST(7 AS BIGINT),
        |      list_transform(string_split(nrm, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> (h * 131 + c) % 1000000007) END AS fingerprint
        |FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // Distances.modulo(a, b) = Σ (b mod a), reference w*(v2 % v1)
    "knn_modulo" -> duckKnn(duckSum(s"fmod($duckPosQ, $duckPos)"), 100),
    "knn_haversine" -> {
      // mirror Distances.haversine exactly: lat clamp, lng wrap, R=6371000
      def lat(e: String) = s"radians(greatest(-90.0, least(90.0, CAST($e[1] AS DOUBLE) * 20.0)))"
      def lng(e: String) =
        s"""radians(CASE WHEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${lat("e.embedding")} - ${lat("q.qv")}) / 2), 2)
           | + cos(${lat("q.qv")}) * cos(${lat("e.embedding")})
           |   * power(sin((${lng("e.embedding")} - ${lng("q.qv")}) / 2), 2))""".stripMargin
      duckKnn(s"2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h))", 100, roundTo = 2)
    },

    "knn_radius" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, rd AS distance FROM (
         |  SELECT e.vec_id, round(sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}), 4) AS rd
         |  FROM embeddings e, q
         |) WHERE rd <= 1.25 ORDER BY rd, vec_id""".stripMargin,

    "knn_filtered" -> duckKnn(duckSum(s"abs($dx - $dq)"), 50, where = "WHERE e.label < 5"),
    "knn_rerank_half" -> duckKnn(duckSum(s"abs($dx - $dq)"), 50,
      where = "WHERE e.vec_id % 2 = 0"),
    "prefilter_isin_knn" -> duckKnn(duckSum(s"abs($dx - $dq)"), 50,
      where = "WHERE e.vec_id % 3 = 0"),

    "knn_manhattan_weighted" -> duckKnn(
      duckSum(s"((i % 4 + 1) * 0.25) * abs($dx - $dq)"), 100),
    "knn_chisquared_weighted" -> duckKnn(duckSum(
      s"""((i % 4 + 1) * 0.25) * (CASE WHEN ($duckPos) + ($duckPosQ) > 0
         | THEN (($duckPos) - ($duckPosQ)) * (($duckPos) - ($duckPosQ)) / (($duckPos) + ($duckPosQ))
         | ELSE 0.0 END)""".stripMargin), 100),
    "knn_hamming_weighted" -> duckKnn(
      duckSum(s"((i % 4 + 1) * 0.25) * (CASE WHEN $dx != $dq THEN 1.0 ELSE 0.0 END)"), 100),

    // session_window is half-open [start, last + gap): a gap of EXACTLY
    // 30 min starts a new session, hence >= in the break condition
    "event_session_windows" ->
      """WITH w AS (SELECT user_id, ts,
        |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |           FROM events),
        |b AS (SELECT user_id, ts,
        |        CASE WHEN prev_ts IS NULL
        |              OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
        |             THEN 1 ELSE 0 END AS brk FROM w),
        |s AS (SELECT user_id, ts,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid FROM b)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "stream_windowed_counts" ->
      """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
        | count(*) AS cnt, round(sum(value), 4) AS total_value
        |FROM events GROUP BY event_type, hour ORDER BY event_type, hour""".stripMargin,

    "text_bpeish_tokens" ->
      """SELECT doc_id,
        | len(string_split_regex(trim(text), '\s+'))
        |  + length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS bpeish_cnt
        |FROM documents ORDER BY doc_id""".stripMargin,

    "lsh_cosine_neardup" ->
      """SELECT id_a, id_b, round(cs, 4) AS cos_sim FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CASE WHEN sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) < 1e-5
        |        OR sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))) < 1e-5 THEN 0.0
        |   ELSE list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))) END AS cs
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
        |) WHERE cs >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // exact incoming-vs-corpus cross pairs; same fixed-corpus banding
    // caveat as the minhash admission check
    "corpus_cosine_neardup" ->
      """SELECT in_id, corpus_id, round(cs, 4) AS cos_sim FROM (
        | SELECT a.vec_id AS in_id, b.vec_id AS corpus_id,
        |  CASE WHEN sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) < 1e-5
        |        OR sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))) < 1e-5 THEN 0.0
        |   ELSE list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))) END AS cs
        | FROM embeddings a, embeddings b WHERE a.vec_id >= 400 AND b.vec_id < 400
        |) WHERE cs >= 0.5 ORDER BY in_id, corpus_id""".stripMargin,

    "ann_batch_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id <= 4)
         |SELECT qid, vec_id, round(d, 4) AS distance, rnk FROM (
         |  SELECT qid, vec_id, d,
         |    row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rnk
         |  FROM (SELECT q.qid, e.vec_id,
         |          sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}) AS d
         |        FROM embeddings e, q)
         |) WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin,

    // phase-1 Hamming replayed WITHOUT the packing: #dims whose sign
    // differs (mathematically equal to popcount(xor) over sign codes, so
    // the oracle independently cross-checks the packed representation);
    // same (distance, id) total order at both cuts
    "ann_binary_topk" -> {
      val signDiff = duckSum(
        s"CASE WHEN ($dx > 0) != ($dq > 0) THEN 1.0 ELSE 0.0 END")
      val cosD =
        s"""CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
           | ELSE 1.0 - ($duckDot) / ($duckNormE * $duckNormQ) END""".stripMargin
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id <= 4),
         |ham AS (SELECT q.qid, e.vec_id, $signDiff AS hd FROM embeddings e, q),
         |cand AS (SELECT qid, vec_id FROM (
         |  SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY hd, vec_id) AS hr
         |  FROM ham) WHERE hr <= 40)
         |SELECT qid, vec_id, round(cd, 6) + 0.0 AS distance, rnk FROM (
         |  SELECT qid, vec_id, cd,
         |    row_number() OVER (PARTITION BY qid ORDER BY cd, vec_id) AS rnk
         |  FROM (SELECT c.qid, e.vec_id, $cosD AS cd
         |        FROM cand c, embeddings e, q
         |        WHERE e.vec_id = c.vec_id AND q.qid = c.qid)
         |) WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin
    },

    "cosine_neardup" ->
      """SELECT id_a, id_b, round(cs, 4) AS cos_sim FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  CASE WHEN sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE)))) < 1e-5
        |        OR sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))) < 1e-5 THEN 0.0
        |   ELSE list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(a.embedding[i] AS DOUBLE)*CAST(a.embedding[i] AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(generate_series(1,64), i -> CAST(b.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE))))) END AS cs
        | FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
        |) WHERE cs >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    "dedup_exact_groups" ->
      s"""SELECT md5($duckNorm) AS content_hash, count(*) AS cnt, min(doc_id) AS keep_id
         |FROM documents GROUP BY content_hash ORDER BY content_hash""".stripMargin,

    "dedup_survivors" ->
      s"""SELECT doc_id FROM documents
         |QUALIFY row_number() OVER (PARTITION BY md5($duckNorm) ORDER BY doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    "dedup_pipeline" -> {
      val quality =
        s"""( least(length(text) / 200.0, 1.0)
           |  + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0)
           |  + least((CAST(len(list_filter($duckToks, t -> list_contains($duckStops, t))) AS DOUBLE) / len($duckToks)) * 5.0, 1.0)
           | ) / 3.0""".stripMargin
      s"""WITH q AS (SELECT doc_id, text FROM documents WHERE $quality >= 0.5),
         |ex AS (SELECT doc_id, text FROM q
         |       QUALIFY row_number() OVER (PARTITION BY md5($duckNorm) ORDER BY doc_id) = 1),
         |d AS (SELECT doc_id, $duckShingles AS sh FROM
         |      (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM ex)),
         |pairs AS (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh)) * 1.0
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         | FROM d a, d b WHERE a.doc_id < b.doc_id
         |),
         |drops AS (SELECT DISTINCT id_b FROM pairs WHERE j >= 0.5)
         |SELECT doc_id FROM ex WHERE doc_id NOT IN (SELECT id_b FROM drops)
         |ORDER BY doc_id""".stripMargin
    },

    "repeated_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents
        |), chunks AS (
        |  SELECT doc_id, md5(array_to_string(t[s+1:s+20], ' ')) AS chunk_hash
        |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-20, 10)) AS s
        |        FROM toks WHERE len(t) >= 20)
        |)
        |SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs, count(*) AS n_hits,
        |  min(doc_id) AS first_doc
        |FROM chunks GROUP BY chunk_hash HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    "strip_repeated_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        |  FROM documents
        |), occ AS (
        |  SELECT doc_id, s, md5(array_to_string(t[s+1:s+20], ' ')) AS h
        |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t)-20, 10)) AS s
        |        FROM toks WHERE len(t) >= 20)
        |), dup AS (
        |  SELECT h FROM occ GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        |), starts AS (
        |  SELECT doc_id, list(DISTINCT s) AS ss FROM occ JOIN dup USING (h) GROUP BY doc_id
        |), flat AS (
        |  SELECT doc_id, unnest(t) AS tok, unnest(range(1, len(t)+1)) AS i FROM toks
        |), kept AS (
        |  SELECT f.doc_id, f.tok, f.i
        |  FROM flat f LEFT JOIN starts st ON f.doc_id = st.doc_id
        |  WHERE st.ss IS NULL OR len(list_filter(st.ss, s -> f.i > s AND f.i <= s + 20)) = 0
        |), agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS cleaned, count(*) AS n_kept
        |  FROM kept GROUP BY doc_id
        |)
        |SELECT t.doc_id, coalesce(a.cleaned, '') AS cleaned_text,
        |  CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "dedup_keep_longest" ->
      s"""SELECT doc_id FROM documents
         |QUALIFY row_number() OVER (PARTITION BY md5($duckNorm)
         |  ORDER BY length(text) DESC, doc_id) = 1
         |ORDER BY doc_id""".stripMargin,

    "corpus_mix_report" ->
      s"""SELECT source, lang, count(*) AS n_docs,
         | CAST(sum(n_chars) AS BIGINT) AS total_chars,
         | CAST(sum(len($duckToks)) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    "top_bigrams" ->
      s"""WITH sh AS (
         | SELECT unnest(list_distinct(
         |  CASE WHEN len(toks) <= 2 THEN [array_to_string(toks, ' ')]
         |   ELSE list_transform(generate_series(1, len(toks)-1),
         |     i -> array_to_string(toks[i:i+1], ' ')) END)) AS bigram
         | FROM (SELECT string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT bigram, count(*) AS n_docs FROM sh GROUP BY bigram
         |ORDER BY n_docs DESC, bigram ASC LIMIT 50""".stripMargin,

    // KMV replay: k-th smallest DISTINCT portable hash per group, same
    // (k-1)*range/kthMin arithmetic (IEEE double division is exactly
    // rounded in both engines, so the estimates agree bit-for-bit)
    "distinct_kmv" ->
      s"""WITH h AS (
         | SELECT DISTINCT event_type,
         |        ${duckRawHash("CAST(user_id AS VARCHAR)")} AS hv
         | FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
         |r AS (
         | SELECT event_type, hv,
         |        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
         |        count(*) OVER (PARTITION BY event_type) AS nd
         | FROM h)
         |SELECT event_type,
         |  CAST(max(nd) AS BIGINT) AS n_exact,
         |  round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |    ELSE 63.0 * 1000000007.0 /
         |         CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)
         |    END, 4) AS kmv_est
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // per-source token stream; KMV-16 replay + exact top token
    "sketch_profile" ->
      s"""WITH t AS (
         | SELECT source, unnest($duckToks) AS tok FROM documents),
         |tt AS (SELECT source, tok FROM t WHERE tok <> ''),
         |h AS (SELECT DISTINCT source, ${duckRawHash("tok")} AS hv FROM tt),
         |r AS (SELECT source, hv,
         |        row_number() OVER (PARTITION BY source ORDER BY hv) AS rn,
         |        count(*) OVER (PARTITION BY source) AS nd FROM h),
         |kmv AS (SELECT source,
         |  CASE WHEN max(nd) < 16 THEN CAST(max(nd) AS DOUBLE)
         |    ELSE 15.0 * 1000000007.0 /
         |         CAST(max(CASE WHEN rn = 16 THEN hv END) AS DOUBLE) END AS est
         |  FROM r GROUP BY source),
         |tc AS (SELECT source, tok, count(*) AS c FROM tt GROUP BY 1, 2),
         |top AS (SELECT source, tok FROM (
         |  SELECT source, tok,
         |    row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rk
         |  FROM tc) WHERE rk = 1)
         |SELECT tt.source,
         |  count(*) AS n_tokens,
         |  count(DISTINCT tt.tok) AS n_distinct_exact,
         |  round(any_value(kmv.est), 4) AS kmv_est,
         |  any_value(top.tok) AS top_token
         |FROM tt
         |JOIN kmv ON kmv.source = tt.source
         |JOIN top ON top.source = tt.source
         |GROUP BY tt.source ORDER BY tt.source""".stripMargin,

    // theta-sketch replay: per-type k-min sets, per-pair union k-mins,
    // matching fraction, identical estimator arithmetic
    "distinct_overlap" ->
      s"""WITH d AS (
         | SELECT DISTINCT event_type AS t, user_id AS u,
         |   ${duckRawHash("CAST(user_id AS VARCHAR)")} AS hv
         | FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
         |h AS (SELECT DISTINCT t, hv FROM d),
         |r AS (SELECT t, hv, row_number() OVER (PARTITION BY t ORDER BY hv) AS rn,
         |        count(*) OVER (PARTITION BY t) AS nd FROM h),
         |tn AS (SELECT t, max(nd) AS nd FROM r GROUP BY t),
         |mins AS (SELECT t, hv FROM r WHERE rn <= 64),
         |tl AS (SELECT DISTINCT t FROM mins),
         |pairs AS (SELECT a.t AS ta, b.t AS tb FROM tl a, tl b WHERE a.t < b.t),
         |allu AS (SELECT DISTINCT p.ta, p.tb, m.hv
         |  FROM pairs p JOIN mins m ON m.t = p.ta OR m.t = p.tb),
         |ur AS (SELECT ta, tb, hv,
         |        row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
         |  FROM allu),
         |uagg AS (SELECT ta, tb, count(*) AS nall FROM allu GROUP BY 1, 2),
         |theta AS (SELECT ta, tb, max(hv) AS th FROM ur WHERE rn <= 64 GROUP BY 1, 2),
         |jj AS (SELECT u.ta, u.tb, count(*) AS j FROM ur u
         |  JOIN mins ma ON ma.t = u.ta AND ma.hv = u.hv
         |  JOIN mins mb ON mb.t = u.tb AND mb.hv = u.hv
         |  WHERE u.rn <= 64 GROUP BY 1, 2),
         |iex AS (SELECT ma.t AS ta, mb.t AS tb, count(*) AS ni
         |  FROM mins ma JOIN mins mb ON ma.hv = mb.hv AND ma.t < mb.t
         |  GROUP BY 1, 2),
         |ex AS (SELECT a.t AS ta, b.t AS tb, count(*) AS ne
         |  FROM d a JOIN d b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
         |SELECT p.ta AS type_a, p.tb AS type_b,
         |  round(CASE WHEN xa.nd < 64 AND xb.nd < 64 THEN CAST(ua.nall AS DOUBLE)
         |    ELSE 63.0 * 1000000007.0 / CAST(th.th AS DOUBLE) END, 4) AS est_union,
         |  round(CASE WHEN xa.nd < 64 AND xb.nd < 64 THEN CAST(coalesce(ix.ni, 0) AS DOUBLE)
         |    ELSE CAST(coalesce(jj.j, 0) AS DOUBLE) / 64.0 *
         |         (63.0 * 1000000007.0 / CAST(th.th AS DOUBLE)) END, 4) AS est_intersect,
         |  CAST(coalesce(ex.ne, 0) AS BIGINT) AS n_exact
         |FROM pairs p
         |JOIN tn xa ON xa.t = p.ta
         |JOIN tn xb ON xb.t = p.tb
         |JOIN uagg ua ON ua.ta = p.ta AND ua.tb = p.tb
         |JOIN theta th ON th.ta = p.ta AND th.tb = p.tb
         |LEFT JOIN jj ON jj.ta = p.ta AND jj.tb = p.tb
         |LEFT JOIN iex ix ON ix.ta = p.ta AND ix.tb = p.tb
         |LEFT JOIN ex ON ex.ta = p.ta AND ex.tb = p.tb
         |ORDER BY type_a, type_b""".stripMargin,

    // capacity ≥ vocabulary → the MG summary equals the exact count
    "heavy_hitters" ->
      s"""SELECT tok AS token, count(*) AS cnt, CAST(0 AS BIGINT) AS err
         |FROM (SELECT unnest($duckToks) AS tok FROM documents)
         |WHERE tok <> '' GROUP BY tok
         |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "knn_doc_lookup" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |top AS (
         | SELECT e.vec_id, sqrt(${duckSum(s"($dx - $dq)*($dx - $dq)")}) AS d
         | FROM embeddings e, q ORDER BY d, vec_id LIMIT 20)
         |SELECT t.vec_id, round(d, 4) AS distance, doc.lang, doc.source
         |FROM top t JOIN documents doc ON t.vec_id = doc.doc_id
         |ORDER BY distance, vec_id""".stripMargin,

    "hash_features" ->
      s"""WITH tk AS (SELECT doc_id,
         |  unnest(list_filter($duckToks, t -> length(t) > 0)) AS tok FROM documents),
         |cnts AS (SELECT doc_id, ${duckRawHash("tok")} % 64 AS idx, count(*) AS cnt
         |         FROM tk GROUP BY doc_id, idx),
         |dense AS (SELECT g.doc_id, u.i, coalesce(c.cnt, 0) AS cnt
         |          FROM (SELECT DISTINCT doc_id FROM tk) g
         |          CROSS JOIN generate_series(0, 63) u(i)
         |          LEFT JOIN cnts c ON c.doc_id = g.doc_id AND c.idx = u.i)
         |SELECT doc_id, array_to_string(list(cnt ORDER BY i), ',') AS features
         |FROM dense GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // scoring replay with the TRAINED weight vector inlined as literals:
    // oracleSql is a def, evaluated by Verify after every query ran, so
    // lastQcWeights holds the deterministic training result by then
    "quality_classifier_scores" -> {
      val values = lastQcWeights.zipWithIndex
        .map { case (wt, i) => s"($i, CAST($wt AS DOUBLE))" }.mkString(", ")
      s"""WITH tk AS (SELECT doc_id,
         |  unnest(list_filter($duckToks, t -> length(t) > 0)) AS tok FROM documents),
         |cnts AS (SELECT doc_id, ${duckRawHash("tok")} % 64 AS idx, count(*) AS cnt
         |         FROM tk GROUP BY doc_id, idx),
         |w(idx, wt) AS (SELECT * FROM (VALUES $values) v(idx, wt)),
         |nrm AS (SELECT doc_id, sqrt(sum(cnt * cnt)) AS n FROM cnts GROUP BY doc_id),
         |dots AS (SELECT c.doc_id, sum(c.cnt * w.wt) AS dot
         |         FROM cnts c JOIN w ON c.idx = w.idx GROUP BY c.doc_id)
         |SELECT n.doc_id, round(CASE WHEN n.n < 1e-9 THEN 0.0 ELSE d.dot / n.n END, 4) AS score
         |FROM nrm n JOIN dots d ON n.doc_id = d.doc_id ORDER BY n.doc_id""".stripMargin
    },

    "chunk_text" ->
      s"""WITH toks AS (SELECT doc_id,
         |  list_filter($duckToks, t -> length(t) > 0) AS t FROM documents),
         |w AS (SELECT doc_id, t,
         |  unnest(generate_series(0, CAST(ceil(len(t) / 96.0) AS BIGINT) * 96 - 96, 96)) AS s
         |  FROM toks WHERE len(t) > 0)
         |SELECT doc_id, s // 96 AS chunk_idx,
         |  array_to_string(t[s+1:s+128], ' ') AS chunk_text,
         |  least(128, len(t) - s) AS n_tokens
         |FROM w WHERE s < len(t) ORDER BY doc_id, chunk_idx""".stripMargin,

    "unigram_logppl" ->
      s"""WITH tk AS (SELECT doc_id,
         |  unnest(list_filter($duckToks, t -> length(t) > 0)) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY tok),
         |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM freq)
         |SELECT doc_id, round(avg(-ln(cnt / total)), 4) AS log_ppl
         |FROM tk JOIN freq USING (tok), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // (prev, tok) pairs via positional subscripts (generate_subscripts +
    // unnest is the portable posexplode); BOS sentinel at i=1. The float
    // shape mirrors Spark exactly: 0.7*bc/cc + (1.0-0.7)*uc/total, all
    // counts divided as DOUBLEs, natural log, round 4.
    "bigram_logppl" ->
      s"""WITH tk AS (SELECT doc_id,
         |  list_filter($duckToks, t -> length(t) > 0) AS t FROM documents
         |  WHERE len(list_filter($duckToks, t -> length(t) > 0)) > 0),
         |px AS (SELECT doc_id, t, generate_subscripts(t, 1) AS i,
         |         unnest(t) AS tok FROM tk),
         |pairs AS (SELECT doc_id,
         |  CASE WHEN i = 1 THEN '<s>' ELSE t[i-1] END AS prev, tok FROM px),
         |big AS (SELECT prev, tok, count(*) AS bc FROM pairs GROUP BY prev, tok),
         |ctx AS (SELECT prev, count(*) AS cc FROM pairs GROUP BY prev),
         |uni AS (SELECT tok, count(*) AS uc FROM pairs GROUP BY tok),
         |tot AS (SELECT CAST(sum(uc) AS DOUBLE) AS total FROM uni)
         |SELECT doc_id, round(avg(-ln(
         |  CAST(0.7 AS DOUBLE) * CAST(bc AS DOUBLE) / CAST(cc AS DOUBLE)
         |  + (CAST(1.0 AS DOUBLE) - CAST(0.7 AS DOUBLE))
         |    * CAST(uc AS DOUBLE) / total)), 4) AS log_ppl
         |FROM pairs JOIN big USING (prev, tok) JOIN ctx USING (prev)
         |  JOIN uni USING (tok), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // chr(769)=U+0301 combining acute, chr(8491)=U+212B angstrom sign,
    // chr(778)=U+030A combining ring — DuckDB's nfc_normalize must
    // compose them to the same bytes NfcNormalizeExpr emits
    "text_nfc_normalize" ->
      """SELECT doc_id,
        |  nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(8491)
        |                || ' A' || chr(778)) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // bit-for-bit replay of the packed-integer funnel-cycles fold:
    // event = ts*8+stepIdx, state = (cycles*8+nextStep)*2^51 + lastTs+1
    // (2^51 = 2251799813685248). The engine raise_errors on
    // epoch_us >= 2^51 - 1 (lastTs+1 must stay inside the 51-bit
    // field), so this replay never sees a ts the fold would mis-pack.
    // Folded via a RECURSIVE CTE, one step per list index, NOT
    // list_reduce: DuckDB 1.0.0's list_reduce returns wrong results
    // when a batch holds rows of differing list lengths AND the lambda
    // sometimes returns the accumulator unchanged (verified: batched
    // fold diverges from the same query on a single row and from a
    // by-hand replay of the identical lambda).
    "event_funnel_cycles" ->
      """WITH RECURSIVE se AS (
        |  SELECT user_id, epoch_us(ts) * 8 +
        |    CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 ELSE 2 END AS e
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase')
        |    AND ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT user_id, list_sort(list(e)) AS l FROM se GROUP BY user_id),
        |r AS (
        |  SELECT user_id, 1 AS i, CAST(0 AS BIGINT) AS st FROM g
        |  UNION ALL
        |  SELECT r.user_id, r.i + 1,
        |    CASE
        |      WHEN (g.l[r.i] % 8) = ((r.st // 2251799813685248) % 8)
        |       AND (g.l[r.i] // 8) > (r.st % 2251799813685248) - 1
        |      THEN CASE WHEN ((r.st // 2251799813685248) % 8) + 1 = 3
        |        THEN (least((r.st // 2251799813685248) // 8 + 1, 255) * 8)
        |             * 2251799813685248 + (g.l[r.i] // 8) + 1
        |        ELSE ((r.st // 2251799813685248) // 8 * 8
        |              + ((r.st // 2251799813685248) % 8) + 1)
        |             * 2251799813685248 + (g.l[r.i] // 8) + 1 END
        |      ELSE r.st END
        |  FROM r JOIN g USING (user_id) WHERE r.i <= len(g.l))
        |SELECT user_id, CAST(st // 2251799813685248 // 8 AS BIGINT) AS cycles
        |FROM r JOIN g USING (user_id) WHERE r.i = len(g.l) + 1
        |ORDER BY user_id""".stripMargin,

    "sample_split_assign" ->
      s"""SELECT doc_id,
         |  CASE WHEN h % 10000 < 8000 THEN 'train'
         |       WHEN h % 10000 < 9000 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${duckRawHash("CAST(doc_id AS VARCHAR)")} AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "sample_split_by_content" ->
      s"""SELECT doc_id,
         |  CASE WHEN h % 10000 < 9000 THEN 'train' ELSE 'test' END AS split
         |FROM (SELECT doc_id, ${duckRawHash(s"md5($duckNorm)")} AS h
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "url_canonicalize" ->
      s"""WITH $duckUrlCtes
         |SELECT doc_id, url AS url_raw, url_canon, domain
         |FROM uk ORDER BY doc_id""".stripMargin,

    "url_dedup_canonical" ->
      s"""WITH $duckUrlCtes
         |SELECT url_canon, count(*) AS n_dups, min(doc_id) AS survivor_id
         |FROM uk GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    "url_domain_cap" ->
      s"""WITH $duckUrlCtes,
         |ur AS (SELECT doc_id AS id, domain,
         |  row_number() OVER (PARTITION BY domain ORDER BY kh, doc_id) AS rn
         | FROM (SELECT doc_id, domain,
         |         ${duckRawHash("CAST(doc_id AS VARCHAR)")} AS kh FROM uk))
         |SELECT id, domain FROM ur WHERE rn <= 25 ORDER BY id""".stripMargin,

    "url_blocklist_filter" ->
      s"""WITH $duckUrlCtes
         |SELECT doc_id FROM uk
         |WHERE domain NOT IN ('site.org', 'example.co.uk')
         |ORDER BY doc_id""".stripMargin,

    // RE2 spells script classes \p{Latin}; Spark's Java regex
    // \p{IsLatin} — same script property, same counts
    "text_script_profile" ->
      """WITH sx AS (SELECT doc_id,
        |  concat(text, ([' Пример текста',' 你好世界',
        |    ' مرحبا بالعالم',' plain ascii 42'])[CAST(doc_id % 4 + 1 AS INT)]) AS text
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Latin}', '', 'g')) AS INTEGER) AS n_latin,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Cyrillic}', '', 'g')) AS INTEGER) AS n_cyrillic,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Han}', '', 'g')) AS INTEGER) AS n_han,
        |  CAST(length(text) - length(regexp_replace(text, '\p{Arabic}', '', 'g')) AS INTEGER) AS n_arabic,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INTEGER) AS n_digit
        | FROM sx)
        |SELECT doc_id, n_latin, n_cyrillic, n_han, n_arabic, n_digit,
        |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_han AND n_latin >= n_arabic THEN 'latin'
        |       WHEN n_cyrillic >= n_han AND n_cyrillic >= n_arabic THEN 'cyrillic'
        |       WHEN n_han >= n_arabic THEN 'han' ELSE 'arabic' END AS dominant
        |FROM sc ORDER BY doc_id""".stripMargin,

    "quality_adaptive_length" ->
      """WITH b AS (SELECT source, quantile_cont(n_chars, 0.1) AS lo,
        |                   quantile_cont(n_chars, 0.9) AS hi
        |           FROM documents GROUP BY source)
        |SELECT doc_id, source, n_chars FROM documents JOIN b USING (source)
        |WHERE n_chars >= lo AND n_chars <= hi ORDER BY doc_id""".stripMargin,

    "dedup_cluster_histogram" ->
      s"""WITH g AS (SELECT md5($duckNorm) AS h, count(*) AS cnt
         |           FROM documents GROUP BY h)
         |SELECT cnt AS cluster_size, count(*) AS n_clusters
         |FROM g GROUP BY cnt ORDER BY cluster_size""".stripMargin,

    "cdc_chunks" ->
      s"""WITH $duckCdcCtes
         |SELECT doc_id, chunk_idx, start_pos, chunk_len,
         |  ${duckKeyHash62("ctext")} AS chunk_hash
         |FROM cch ORDER BY doc_id, chunk_idx""".stripMargin,

    "cdc_repeated_chunks" ->
      s"""WITH $duckCdcCtes
         |SELECT chunk_hash, count(*) AS n_docs FROM (
         |  SELECT DISTINCT doc_id, ${duckKeyHash62("ctext")} AS chunk_hash FROM cch)
         |GROUP BY chunk_hash HAVING count(*) >= 2 ORDER BY chunk_hash""".stripMargin,

    "ngram_novelty" ->
      s"""WITH shg AS (SELECT doc_id, unnest($duckShingles) AS shingle FROM
         |      (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)),
         |fr AS (SELECT shingle, count(*) AS df FROM shg GROUP BY shingle)
         |SELECT doc_id, count(*) AS n_shingles,
         |  round(avg(CASE WHEN df = 1 THEN CAST(1.0 AS DOUBLE)
         |            ELSE CAST(0.0 AS DOUBLE) END), 4) AS novelty
         |FROM shg JOIN fr USING (shingle)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "length_quantiles" ->
      """SELECT source, round(quantile_cont(n_chars, 0.5), 4) AS p50,
        | round(quantile_cont(n_chars, 0.9), 4) AS p90
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "semantic_dedup" -> {
      val dotNC = duckSum("CAST(n.embedding[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotCC = duckSum("CAST(c.cv[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotNN = duckSum("CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)")
      val dotAB = duckSum("CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)")
      s"""WITH c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |            embedding AS cv FROM embeddings WHERE vec_id < 16),
         |n AS (SELECT vec_id, embedding, sqrt($dotNN) AS nrm FROM embeddings),
         |sim AS (SELECT n.vec_id, c.cid,
         |  CASE WHEN sqrt($dotCC) < 1e-5 OR n.nrm < 1e-5 THEN 0.0
         |       ELSE $dotNC / (n.nrm * sqrt($dotCC)) END AS cs
         |  FROM n, c),
         |best AS (SELECT vec_id, cid AS cluster FROM sim
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) = 1),
         |nb AS (SELECT b.cluster, n.vec_id, n.embedding, n.nrm
         |       FROM n JOIN best b ON n.vec_id = b.vec_id)
         |SELECT cluster, id_a, id_b, round(cs, 4) AS cos_sim FROM (
         |  SELECT a.cluster, a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN a.nrm < 1e-5 OR b.nrm < 1e-5 THEN 0.0
         |         ELSE $dotAB / (a.nrm * b.nrm) END AS cs
         |  FROM nb a JOIN nb b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |) WHERE cs >= 0.35 ORDER BY cluster, id_a, id_b""".stripMargin
    },

    "corpus_semantic_neardup" -> {
      val dotNC = duckSum("CAST(n.embedding[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotCC = duckSum("CAST(c.cv[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotNN = duckSum("CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)")
      val dotAB = duckSum("CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)")
      s"""WITH c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |            embedding AS cv FROM embeddings WHERE vec_id < 16),
         |n AS (SELECT vec_id, embedding, sqrt($dotNN) AS nrm FROM embeddings),
         |sim AS (SELECT n.vec_id, c.cid,
         |  CASE WHEN sqrt($dotCC) < 1e-5 OR n.nrm < 1e-5 THEN 0.0
         |       ELSE $dotNC / (n.nrm * sqrt($dotCC)) END AS cs
         |  FROM n, c),
         |best AS (SELECT vec_id, cid AS cluster FROM sim
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) = 1),
         |nb AS (SELECT b.cluster, n.vec_id, n.embedding, n.nrm
         |       FROM n JOIN best b ON n.vec_id = b.vec_id)
         |SELECT in_id, corpus_id, round(cs, 4) AS cos_sim FROM (
         |  SELECT a.vec_id AS in_id, b.vec_id AS corpus_id,
         |    CASE WHEN a.nrm < 1e-5 OR b.nrm < 1e-5 THEN 0.0
         |         ELSE $dotAB / (a.nrm * b.nrm) END AS cs
         |  FROM nb a JOIN nb b ON a.cluster = b.cluster
         |  WHERE a.vec_id >= 400 AND b.vec_id < 400
         |) WHERE cs >= 0.35 ORDER BY in_id, corpus_id""".stripMargin
    },

    "semantic_dedup_survivors" -> {
      val dotNC = duckSum("CAST(n.embedding[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotCC = duckSum("CAST(c.cv[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotNN = duckSum("CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)")
      val dotAB = duckSum("CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)")
      s"""WITH c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |            embedding AS cv FROM embeddings WHERE vec_id < 16),
         |n AS (SELECT vec_id, embedding, sqrt($dotNN) AS nrm FROM embeddings),
         |sim AS (SELECT n.vec_id, c.cid,
         |  CASE WHEN sqrt($dotCC) < 1e-5 OR n.nrm < 1e-5 THEN 0.0
         |       ELSE $dotNC / (n.nrm * sqrt($dotCC)) END AS cs
         |  FROM n, c),
         |best AS (SELECT vec_id, cid AS cluster FROM sim
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) = 1),
         |nb AS (SELECT b.cluster, n.vec_id, n.embedding, n.nrm
         |       FROM n JOIN best b ON n.vec_id = b.vec_id),
         |pairs AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CASE WHEN a.nrm < 1e-5 OR b.nrm < 1e-5 THEN 0.0
         |         ELSE $dotAB / (a.nrm * b.nrm) END AS cs
         |  FROM nb a JOIN nb b ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE cs >= 0.35)
         |ORDER BY vec_id""".stripMargin
    },

    // NOTE: the minhash/lsh/pipeline oracles are exact all-pairs answers;
    // the Spark side is LSH-banded (recall < 1 by construction). The gate
    // holds because the sf0.01 corpus is fixed and its near-threshold
    // pairs are verified to collide under the fixed seeds — a pair with
    // similarity exactly at the threshold on other data could miss.
    "minhash_neardup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh)) * 1.0
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         | FROM d a, d b WHERE a.doc_id < b.doc_id
         |) WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // maxBucket=32 > the corpus's measured bucket maximum, so the capped
    // plan's answer equals the uncapped exact-cartesian oracle
    "minhash_neardup_capped" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh)) * 1.0
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         | FROM d a, d b WHERE a.doc_id < b.doc_id
         |) WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // NO recall caveat here: the Spark side is the prefix-filtered EXACT
    // set-similarity join (lossless by the All-Pairs prefix lemma), so it
    // matches the exact all-pairs answer on any corpus, not just this one.
    "ngram_jaccard_neardup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT id_a, id_b, round(j, 4) AS jaccard FROM (
         | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  len(list_intersect(a.sh, b.sh)) * 1.0
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         | FROM d a, d b WHERE a.doc_id < b.doc_id
         |) WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,

    // recursive reachability closure over the exact pair set: component =
    // min id reachable through near-dup edges (nodes appearing in pairs)
    "dedup_components" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |),
         |e AS (
         | SELECT id_a, id_b FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |   len(list_intersect(a.sh, b.sh)) * 1.0
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         | ) WHERE j >= 0.5
         |),
         |ed AS (SELECT id_a AS s, id_b AS t FROM e
         |       UNION SELECT id_b, id_a FROM e),
         |r AS (
         |  SELECT s AS id, t AS reach FROM ed
         |  UNION
         |  SELECT r.id, ed.t FROM r JOIN ed ON r.reach = ed.s
         |)
         |SELECT id, CAST(least(id, min(reach)) AS BIGINT) AS component
         |FROM r GROUP BY id ORDER BY id""".stripMargin,

    // same pair set as dedup_components, then keep-longest per component
    // (ties -> lowest id); unclustered docs pass through
    "neardup_keep_best" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |),
         |e AS (
         | SELECT id_a, id_b FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |   len(list_intersect(a.sh, b.sh)) * 1.0
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         |  FROM d a, d b WHERE a.doc_id < b.doc_id
         | ) WHERE j >= 0.5
         |),
         |ed AS (SELECT id_a AS s, id_b AS t FROM e
         |       UNION SELECT id_b, id_a FROM e),
         |r AS (
         |  SELECT s AS id, t AS reach FROM ed
         |  UNION
         |  SELECT r.id, ed.t FROM r JOIN ed ON r.reach = ed.s
         |),
         |comp AS (SELECT id, CAST(least(id, min(reach)) AS BIGINT) AS component
         |         FROM r GROUP BY id),
         |losers AS (SELECT id FROM (
         |  SELECT c.id, row_number() OVER (PARTITION BY c.component
         |    ORDER BY doc.n_chars DESC, c.id ASC) AS rk
         |  FROM comp c JOIN documents doc ON c.id = doc.doc_id) WHERE rk > 1)
         |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    "hybrid_search_rrf" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
         |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |posts AS (SELECT doc_id, term, count(*) AS tf
         |          FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
         |          WHERE term IN ('vector','join','hash') GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM posts GROUP BY term),
         |bm_all AS (SELECT doc_id, sum(
         |  ln(1.0 + (n - df + 0.5) / (df + 0.5))
         |   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
         | FROM posts JOIN dfreq USING (term) JOIN dl USING (doc_id), c
         | GROUP BY doc_id),
         |bm AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC)
         |         AS lex_rank
         |       FROM bm_all ORDER BY score DESC, doc_id ASC LIMIT 50),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |vs0 AS (SELECT e.vec_id,
         |  CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
         |   ELSE 1.0 - ($duckDot) / ($duckNormE * $duckNormQ) END AS dist
         |  FROM embeddings e, q),
         |vs AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY dist ASC, vec_id ASC)
         |         AS vec_rank
         |       FROM vs0 ORDER BY dist ASC, vec_id ASC LIMIT 50),
         |f AS (SELECT coalesce(bm.doc_id, vs.doc_id) AS doc_id,
         |  coalesce(CAST(1.0 AS DOUBLE) / (60 + lex_rank), 0.0)
         |   + coalesce(CAST(1.0 AS DOUBLE) / (60 + vec_rank), 0.0) AS rrf
         |  FROM bm FULL OUTER JOIN vs ON bm.doc_id = vs.doc_id)
         |SELECT doc_id, round(rrf, 6) AS rrf FROM f
         |ORDER BY rrf DESC, doc_id ASC LIMIT 20""".stripMargin,

    // same exact-all-pairs-vs-banded caveat as minhash_neardup above
    "corpus_neardup" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT in_id, corpus_id, round(j, 4) AS jaccard FROM (
         | SELECT a.doc_id AS in_id, b.doc_id AS corpus_id,
         |  len(list_intersect(a.sh, b.sh)) * 1.0
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS j
         | FROM d a, d b WHERE a.doc_id >= 400 AND b.doc_id < 400
         |) WHERE j >= 0.5 ORDER BY in_id, corpus_id""".stripMargin,

    // Exact replay of the portable 60-bit SimHash (SimHashPortableExpr):
    // per-token seeded rolling hash, affine vote per bit, then all-pairs
    // Hamming. The Spark side's 4x15-bit banding is exact for Hamming<=3
    // (pigeonhole), so both engines produce the same pair set.
    "simhash_neardup" ->
      s"""WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents),
         |rs AS (SELECT doc_id, list_transform(toks, tok ->
         |         CASE WHEN length(tok) = 0 THEN CAST(7 AS BIGINT) ELSE
         |           list_reduce(list_prepend(CAST(7 AS BIGINT),
         |             list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
         |             (h, c) -> (h * 131 + c) % 1000000007) END) AS rs FROM tk),
         |sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), i ->
         |         CASE WHEN list_sum(list_transform(rs, r ->
         |             CASE WHEN ((2654435761 * (i + 1)) % 1000000007 * r
         |                        + (40503 * (i + 1) + 2531011) % 1000000007) % 1000000007
         |                       > 500000003
         |                  THEN 1 ELSE -1 END)) > 0
         |              THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sim
         |        FROM rs)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         |FROM sig a, sig b
         |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,

    "text_stats" ->
      s"""SELECT doc_id, len(toks) AS token_cnt,
         | round(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE))) / len(toks), 4) AS avg_word_len,
         | round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |   CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END, 4) AS punct_ratio,
         | round(CAST(len(list_filter(toks, t -> list_contains($duckStops, t))) AS DOUBLE) / len(toks), 4) AS stopword_ratio
         |FROM (SELECT doc_id, text, $duckToks AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id, round((
         |  least(length(text) / 200.0, 1.0)
         |  + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0)
         |  + least((CAST(len(list_filter($duckToks, t -> list_contains($duckStops, t))) AS DOUBLE) / len($duckToks)) * 5.0, 1.0)
         | ) / 3.0, 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,

    "dataset_card" ->
      s"""SELECT count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
         |  CAST(sum(len($duckToks)) AS BIGINT) AS total_tokens,
         |  count(DISTINCT source) AS n_sources,
         |  count(DISTINCT lang) AS n_langs,
         |  count(DISTINCT md5($duckNorm)) AS n_distinct_contents,
         |  CAST(sum(CASE WHEN len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) > 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_email
         |FROM documents""".stripMargin,

    "text_match_all" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $duckToks AS toks FROM documents)
         |WHERE list_contains(toks, 'vector') AND list_contains(toks, 'join')
         |ORDER BY doc_id""".stripMargin,

    "text_phrase" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $duckToks AS toks FROM documents)
         |WHERE len(toks) >= 2 AND len(list_filter(generate_series(1, len(toks) - 1),
         |  i -> toks[i] = 'fast' AND toks[i+1] = 'table')) > 0
         |ORDER BY doc_id""".stripMargin,

    // the index-served rows recompute from RAW text here — the layout
    // (bucketed postings, stored lengths/stats) must reproduce the
    // from-scratch ranking exactly
    "text_index_bm25" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
         |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |posts AS (SELECT doc_id, term, count(*) AS tf
         |          FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
         |          WHERE term IN ('vector','join','hash') GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM posts GROUP BY term)
         |SELECT doc_id, round(sum(
         |  ln(1.0 + (n - df + 0.5) / (df + 0.5))
         |   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
         |FROM posts JOIN dfreq USING (term) JOIN dl USING (doc_id), c
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_index_match" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $duckToks AS toks FROM documents)
         |WHERE list_contains(toks, 'vector') AND list_contains(toks, 'join')
         |ORDER BY doc_id""".stripMargin,

    // the indexed variant is exact whenever candidate-doc recall covers
    // the true top-50 (generous timesK; asserted by sharing the exact
    // oracle below)
    "maxsim_ivf_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
         |sims AS (
         |  SELECT e.vec_id // 4 AS doc_id, q.qid,
         |    CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
         |         ELSE ($duckDot) / ($duckNormE * $duckNormQ) END AS sim
         |  FROM embeddings e, q),
         |mx AS (SELECT doc_id, qid, max(sim) AS m FROM sims GROUP BY doc_id, qid)
         |SELECT doc_id, round(sum(m), 4) + 0.0 AS score
         |FROM mx GROUP BY doc_id
         |ORDER BY sum(m) DESC, doc_id LIMIT 50""".stripMargin,

    // MaxSim replay: per-(chunk, query) cosine similarity with the same
    // zero-norm guard as the Spark kernel, max per (doc, query), sum of
    // maxes per doc, top-50 by the UNROUNDED score with doc tie-break
    "maxsim_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 3),
         |sims AS (
         |  SELECT e.vec_id // 4 AS doc_id, q.qid,
         |    CASE WHEN $duckNormE < 1e-5 OR $duckNormQ < 1e-5 THEN 0.0
         |         ELSE ($duckDot) / ($duckNormE * $duckNormQ) END AS sim
         |  FROM embeddings e, q),
         |mx AS (SELECT doc_id, qid, max(sim) AS m FROM sims GROUP BY doc_id, qid)
         |SELECT doc_id, round(sum(m), 4) + 0.0 AS score
         |FROM mx GROUP BY doc_id
         |ORDER BY sum(m) DESC, doc_id LIMIT 50""".stripMargin,

    // BM25F replay: the title field re-derives exactly as the Spark
    // plan does (join first-8 tokens with spaces, then re-tokenize, so
    // the empty-text -> [""] edge reproduces identically); weighted
    // dl sums are integer-valued doubles, so avgdl matches bit-for-bit
    "text_bm25f" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |tt AS (SELECT doc_id, toks,
         |         string_split_regex(lower(trim(array_to_string(toks[1:8], ' '))), '\\s+') AS ttoks
         |       FROM tk),
         |dl AS (SELECT doc_id, 2.0 * len(ttoks) + 1.0 * len(toks) AS dl FROM tt),
         |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |pf AS (
         |  SELECT doc_id, term, 2.0 * count(*) AS wtf
         |  FROM (SELECT doc_id, unnest(ttoks) AS term FROM tt)
         |  WHERE term IN ('vector','join','hash') GROUP BY doc_id, term
         |  UNION ALL
         |  SELECT doc_id, term, 1.0 * count(*) AS wtf
         |  FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
         |  WHERE term IN ('vector','join','hash') GROUP BY doc_id, term),
         |posts AS (SELECT doc_id, term, sum(wtf) AS tf FROM pf GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM posts GROUP BY term)
         |SELECT doc_id, round(sum(
         |  ln(1.0 + (n - df + 0.5) / (df + 0.5))
         |   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
         |FROM posts JOIN dfreq USING (term) JOIN dl USING (doc_id), c
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_index_phrase" ->
      s"""SELECT doc_id FROM (SELECT doc_id, $duckToks AS toks FROM documents)
         |WHERE len(toks) >= 2 AND len(list_filter(generate_series(1, len(toks) - 1),
         |  i -> toks[i] = 'fast' AND toks[i+1] = 'table')) > 0
         |ORDER BY doc_id""".stripMargin,

    "text_bm25" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
         |c AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
         |posts AS (SELECT doc_id, term, count(*) AS tf
         |          FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
         |          WHERE term IN ('vector','join','hash') GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM posts GROUP BY term)
         |SELECT doc_id, round(sum(
         |  ln(1.0 + (n - df + 0.5) / (df + 0.5))
         |   * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS score
         |FROM posts JOIN dfreq USING (term) JOIN dl USING (doc_id), c
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "lang_id" -> {
      def score(markers: Seq[String]) =
        s"len(list_filter($duckToks, t -> list_contains(${markers.map(w => s"'$w'").mkString("[", ",", "]")}, t)))"
      val ss = TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
        .map { case (l, m) => l -> score(m) }
      val maxExpr = s"greatest(${ss.map(_._2).mkString(", ")})"
      val cases = ss.map { case (l, sc) => s"WHEN $sc = $maxExpr THEN '$l'" }.mkString(" ")
      s"""SELECT doc_id, CASE WHEN $maxExpr = 0 THEN 'und' $cases END AS lang_pred
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "repetition_signals" ->
      s"""WITH $duckRepCtes
         |SELECT d.doc_id AS id, $duckRepCols
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN ts ON d.doc_id = ts.doc_id
         |LEFT JOIN bs ON d.doc_id = bs.doc_id
         |ORDER BY id""".stripMargin,

    // doc_id is unique in `documents`, so the per-row kernel's answer
    // equals the aggregation form's — one oracle body serves both
    "repetition_signals_perrow" ->
      s"""WITH $duckRepCtes
         |SELECT d.doc_id AS id, $duckRepCols
         |FROM (SELECT DISTINCT doc_id FROM documents) d
         |LEFT JOIN ts ON d.doc_id = ts.doc_id
         |LEFT JOIN bs ON d.doc_id = bs.doc_id
         |ORDER BY id""".stripMargin,

    "pii_scan" ->
      s"""WITH p AS (SELECT doc_id, $duckPiiText AS text FROM documents)
         |SELECT doc_id,
         | len(regexp_extract_all(text, '${TextAnalysis.EmailRe}')) AS emails,
         | len(regexp_extract_all(text, '${TextAnalysis.PhoneRe}')) AS phones,
         | len(regexp_extract_all(text, '${TextAnalysis.Ipv4Re}')) AS ips,
         | regexp_replace(regexp_replace(regexp_replace(text,
         |   '${TextAnalysis.EmailRe}', '<EMAIL>', 'g'),
         |   '${TextAnalysis.PhoneRe}', '<PHONE>', 'g'),
         |   '${TextAnalysis.Ipv4Re}', '<IP>', 'g') AS redacted
         |FROM p ORDER BY doc_id""".stripMargin,

    "sample_bernoulli" ->
      s"""SELECT doc_id FROM
         | (SELECT doc_id, ${duckRawHash("text")} AS h FROM documents)
         |WHERE h % 10000 < 2500 ORDER BY doc_id""".stripMargin,

    "training_order_shuffle" ->
      s"""SELECT doc_id,
         | ${duckRawHash("(CAST(doc_id AS VARCHAR) || ':42')")} AS shuffle_key
         |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,

    "sample_weighted_mix" ->
      s"""SELECT doc_id, lang FROM
         | (SELECT doc_id, lang, ${duckRawHash("text")} AS h FROM documents)
         |WHERE h % 10000 < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
         |                   ELSE 1000 END)
         |ORDER BY doc_id""".stripMargin,

    "sample_epoch_mix" ->
      s"""SELECT doc_id, source, unnest(generate_series(1, n)) AS ap_epoch FROM (
         | SELECT doc_id, source,
         |  CAST(floor(e) AS BIGINT)
         |   + CASE WHEN (h % 10000) < CAST(round((e - floor(e)) * 10000) AS INT)
         |          THEN 1 ELSE 0 END AS n
         | FROM (SELECT doc_id, source,
         |        CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 2.5
         |             ELSE 1.0 END AS e,
         |        ${duckRawHash("text")} AS h
         |       FROM documents))
         |ORDER BY doc_id, ap_epoch""".stripMargin,

    // integer replay of the sqrt-temperature factors: milli-isqrt
    // (floor over a correctly-rounded sqrt of an exactly-representable
    // integer), integer sums, one integer division per domain — no
    // float pow anywhere, so Spark and DuckDB agree bit-for-bit
    "sample_temperature_mix" ->
      s"""WITH dd AS (
         |  SELECT doc_id, text,
         |    CASE WHEN doc_id % 10 < 6 THEN 'web'
         |         WHEN doc_id % 10 < 9 THEN 'books' ELSE 'code' END AS dom
         |  FROM documents),
         |c AS (SELECT dom, count(*) AS n FROM dd GROUP BY dom),
         |s AS (SELECT dom, n,
         |        CAST(floor(sqrt(CAST(n AS DOUBLE) * 1000000)) AS BIGINT) AS sd FROM c),
         |t AS (SELECT sum(sd) AS ssum, sum(n) AS ntot FROM s),
         |f AS (SELECT dom, (sd * ntot * 10000) // (ssum * n) AS fd FROM s, t)
         |SELECT doc_id, dom, unnest(generate_series(1, nc)) AS ap_epoch FROM (
         | SELECT d.doc_id, d.dom,
         |  CAST(fd // 10000
         |       + CASE WHEN (h % 10000) < fd % 10000 THEN 1 ELSE 0 END AS BIGINT) AS nc
         | FROM (SELECT doc_id, dom, ${duckRawHash("text")} AS h FROM dd) d
         | JOIN f USING (dom))
         |ORDER BY doc_id, ap_epoch""".stripMargin,

    "sample_token_budget" ->
      s"""SELECT doc_id, source FROM (
         | SELECT doc_id, source, tok,
         |  CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 100000 ELSE 800 END AS b,
         |  sum(tok) OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM (SELECT doc_id, source, n_chars,
         |         CAST(len($duckToks) AS BIGINT) AS tok FROM documents))
         |WHERE cum - tok < b ORDER BY doc_id""".stripMargin,

    // floor on BOTH engines: DuckDB's double->int CAST rounds while
    // Spark's truncates, so the cut is an explicit floor everywhere
    "sample_weighted_len" ->
      s"""SELECT doc_id, n_chars FROM
         | (SELECT doc_id, n_chars, ${duckRawHash("text")} AS h FROM documents)
         |WHERE h % 10000 < floor(least(1.0, n_chars / 4000.0) * 10000)
         |ORDER BY doc_id""".stripMargin,

    "sample_stratified" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |             ${duckRawHash("CAST(doc_id AS VARCHAR)")} AS kh
         |           FROM documents),
         |r AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY lang ORDER BY kh, doc_id) AS rn,
         |        ceil(0.2 * count(*) OVER (PARTITION BY lang)) AS quota FROM h)
         |SELECT doc_id, lang FROM r WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    "quality_filter_verdicts" -> duckQualityVerdictsSql,

    // doc_id unique -> the per-row kernel equals the merge-form answer
    "quality_filter_verdicts_perrow" -> duckQualityVerdictsSql,

    "sample_stratified_by" ->
      s"""WITH h AS (SELECT doc_id, lang,
         |             ${duckRawHash("CAST(doc_id AS VARCHAR)")} AS kh
         |           FROM documents),
         |r AS (SELECT doc_id, lang,
         |        row_number() OVER (PARTITION BY lang ORDER BY kh, doc_id) AS rn,
         |        ceil((CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.0 ELSE 0.1 END)
         |             * count(*) OVER (PARTITION BY lang)) AS quota FROM h)
         |SELECT doc_id, lang FROM r WHERE rn <= quota ORDER BY doc_id""".stripMargin,

    "sample_exact_n" ->
      s"""SELECT doc_id FROM (
         |  SELECT doc_id FROM
         |   (SELECT doc_id, ${duckRawHash("CAST(doc_id AS VARCHAR)")} AS h FROM documents)
         |  ORDER BY h, doc_id LIMIT 100
         |) ORDER BY doc_id""".stripMargin,

    // exact one-sided containment |S(bench) ∩ S(doc)| / |S(bench)|; the
    // Spark side's posting-count join is LOSSLESS (count = |∩| since
    // shingle sets are distinct) — no banding, no recall caveat
    "corpus_contamination" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |)
         |SELECT in_id, corpus_id, round(c, 4) AS containment FROM (
         | SELECT a.doc_id AS in_id, b.doc_id AS corpus_id,
         |  len(list_intersect(b.sh, a.sh)) * 1.0 / len(b.sh) AS c
         | FROM d a, d b WHERE a.doc_id >= 50 AND b.doc_id < 50
         |) WHERE c >= 0.5 ORDER BY in_id, corpus_id""".stripMargin,

    "contamination_rate_report" ->
      s"""WITH d AS (
         |  SELECT doc_id, $duckShingles AS sh FROM
         |   (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents)
         |),
         |fl AS (SELECT DISTINCT a.doc_id AS did FROM d a, d b
         |       WHERE a.doc_id >= 50 AND b.doc_id < 50
         |         AND len(list_intersect(b.sh, a.sh)) * 1.0 / len(b.sh) >= 0.5)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN doc_id IN (SELECT did FROM fl)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
         |FROM documents WHERE doc_id >= 50
         |GROUP BY source ORDER BY source""".stripMargin,

    // generated from the SAME list the audit runs, so adding a check
    // to Plans.checkNames automatically extends this oracle
    "plan_shapes" -> graft.Plans.checkNames
      .map(n => s"('$n', true)")
      .mkString("SELECT * FROM (VALUES ", ", ",
        ") AS t(check_name, ok) ORDER BY check_name"),

    // same portable-SimHash replay as simhash_neardup, restricted to the
    // incoming (id >= 400) × corpus (id < 400) cross pairs
    "corpus_simhash_neardup" ->
      s"""WITH tk AS (SELECT doc_id, string_split($duckNorm, ' ') AS toks FROM documents),
         |rs AS (SELECT doc_id, list_transform(toks, tok ->
         |         CASE WHEN length(tok) = 0 THEN CAST(7 AS BIGINT) ELSE
         |           list_reduce(list_prepend(CAST(7 AS BIGINT),
         |             list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))),
         |             (h, c) -> (h * 131 + c) % 1000000007) END) AS rs FROM tk),
         |sig AS (SELECT doc_id, CAST(list_sum(list_transform(generate_series(0, 59), i ->
         |         CASE WHEN list_sum(list_transform(rs, r ->
         |             CASE WHEN ((2654435761 * (i + 1)) % 1000000007 * r
         |                        + (40503 * (i + 1) + 2531011) % 1000000007) % 1000000007
         |                       > 500000003
         |                  THEN 1 ELSE -1 END)) > 0
         |              THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sim
         |        FROM rs)
         |SELECT a.doc_id AS in_id, b.doc_id AS corpus_id,
         |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         |FROM sig a, sig b
         |WHERE a.doc_id >= 400 AND b.doc_id < 400 AND bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY in_id, corpus_id""".stripMargin,

    "pipeline_end_to_end" -> {
      val quality =
        s"""( least(length(text) / 200.0, 1.0)
           |  + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |      CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0)
           |  + least((CAST(len(list_filter($duckToks, t -> list_contains($duckStops, t))) AS DOUBLE) / len($duckToks)) * 5.0, 1.0)
           | ) / 3.0""".stripMargin
      val dotNC = duckSum("CAST(n.embedding[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotCC = duckSum("CAST(c.cv[i] AS DOUBLE)*CAST(c.cv[i] AS DOUBLE)")
      val dotEE = duckSum("CAST(em.embedding[i] AS DOUBLE)*CAST(em.embedding[i] AS DOUBLE)")
      val dotAB = duckSum("CAST(a.embedding[i] AS DOUBLE)*CAST(b.embedding[i] AS DOUBLE)")
      s"""WITH q AS (SELECT doc_id, text FROM documents WHERE $quality >= 0.5),
         |ex AS (SELECT doc_id, text FROM q
         |       QUALIFY row_number() OVER (PARTITION BY md5($duckNorm) ORDER BY doc_id) = 1),
         |c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
         |       embedding AS cv FROM embeddings WHERE vec_id < 16),
         |n AS (SELECT e.doc_id, e.text, em.embedding, sqrt($dotEE) AS nrm
         |      FROM ex e JOIN embeddings em ON e.doc_id = em.vec_id),
         |sim AS (SELECT n.doc_id, c.cid,
         |  CASE WHEN sqrt($dotCC) < 1e-5 OR n.nrm < 1e-5 THEN 0.0
         |       ELSE $dotNC / (n.nrm * sqrt($dotCC)) END AS cs
         |  FROM n, c),
         |best AS (SELECT doc_id, cid AS cluster FROM sim
         |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY cs DESC, cid ASC) = 1),
         |nb AS (SELECT b.cluster, n.doc_id, n.text, n.embedding, n.nrm
         |       FROM n JOIN best b ON n.doc_id = b.doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CASE WHEN a.nrm < 1e-5 OR b.nrm < 1e-5 THEN 0.0
         |         ELSE $dotAB / (a.nrm * b.nrm) END AS cs
         |  FROM nb a JOIN nb b ON a.cluster = b.cluster AND a.doc_id < b.doc_id),
         |surv AS (SELECT doc_id, text FROM nb
         |  WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs WHERE cs >= 0.35)),
         |t AS (SELECT doc_id AS id, CAST(len($duckToks) AS BIGINT) AS tok,
         |        ${duckRawHash("CAST(doc_id AS VARCHAR)")} % 8 AS shard FROM surv),
         |packed AS (SELECT id, shard, tok,
         |  CAST(sum(tok) OVER (PARTITION BY shard ORDER BY id) AS BIGINT) AS end_off FROM t)
         |SELECT id, shard, end_off - tok AS start_off,
         |       (end_off - tok) // 512 AS first_chunk,
         |       CASE WHEN tok = 0 THEN 0
         |            ELSE (end_off - 1) // 512 - (end_off - tok) // 512 + 1 END AS n_chunks
         |FROM packed ORDER BY id""".stripMargin
    },

    "pack_chunks" ->
      s"""WITH t AS (SELECT doc_id AS id, CAST(len($duckToks) AS BIGINT) AS tok,
         |             ${duckRawHash("CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |           FROM documents),
         |c AS (SELECT id, shard, tok,
         |        CAST(sum(tok) OVER (PARTITION BY shard ORDER BY id) AS BIGINT) AS end_off FROM t)
         |SELECT id, shard, end_off - tok AS start_off,
         |       (end_off - tok) // 512 AS first_chunk,
         |       CASE WHEN tok = 0 THEN 0
         |            ELSE (end_off - 1) // 512 - (end_off - tok) // 512 + 1 END AS n_chunks
         |FROM c ORDER BY id""".stripMargin,

    "pack_chunk_rows" ->
      s"""WITH t AS (SELECT doc_id AS id, CAST(len($duckToks) AS BIGINT) AS tok,
         |             ${duckRawHash("CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |           FROM documents),
         |c AS (SELECT id, shard, tok,
         |        CAST(sum(tok) OVER (PARTITION BY shard ORDER BY id) AS BIGINT) AS end_off FROM t),
         |b AS (SELECT id, shard, tok, end_off, end_off - tok AS start_off
         |      FROM c WHERE tok > 0),
         |r AS (SELECT id, shard, start_off, end_off,
         |        unnest(generate_series(start_off // 512, (end_off - 1) // 512)) AS ci
         |      FROM b)
         |SELECT id, shard, CAST(ci AS BIGINT) AS chunk_idx,
         |       CAST(least(end_off, (ci + 1) * 512) -
         |            greatest(start_off, ci * 512) AS BIGINT) AS tok_in_chunk
         |FROM r ORDER BY id, chunk_idx""".stripMargin,

    "kv_point_lookup" ->
      """SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
        |FROM part WHERE p_partkey IN (10, 57, 150) ORDER BY p_partkey""".stripMargin,

    "geo_radius" -> {
      def glat(e: String) = s"radians(greatest(-90.0, least(90.0, CAST($e[1] AS DOUBLE) * 20.0)))"
      def glng(e: String) =
        s"""radians(CASE WHEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${glat("e.embedding")} - ${glat("q.qv")}) / 2), 2)
           | + cos(${glat("q.qv")}) * cos(${glat("e.embedding")})
           |   * power(sin((${glng("e.embedding")} - ${glng("q.qv")}) / 2), 2))""".stripMargin
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, dist_m FROM (
         |  SELECT e.vec_id,
         |         round(2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)), 2) AS dist_m
         |  FROM embeddings e, q
         |) WHERE dist_m <= 250000.0 ORDER BY vec_id""".stripMargin
    },

    "geo_radius_join" -> {
      def glat(e: String) = s"radians(greatest(-90.0, least(90.0, CAST($e[1] AS DOUBLE) * 20.0)))"
      def glng(e: String) =
        s"""radians(CASE WHEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod(CAST($e[2] AS DOUBLE) * 40.0, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        """(power(sin((pla - qla) / 2), 2)
          | + cos(qla) * cos(pla) * power(sin((plo - qlo) / 2), 2))""".stripMargin
      s"""WITH p AS (SELECT vec_id, ${glat("embedding")} AS pla, ${glng("embedding")} AS plo
         |           FROM embeddings),
         |q AS (SELECT vec_id AS poi_id, ${glat("embedding")} AS qla, ${glng("embedding")} AS qlo
         |      FROM embeddings WHERE vec_id % 50 = 0)
         |SELECT poi_id, vec_id, dist_m FROM (
         |  SELECT q.poi_id, p.vec_id,
         |         round(2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)), 2) AS dist_m
         |  FROM p, q
         |) WHERE dist_m <= 300000.0 ORDER BY poi_id, vec_id""".stripMargin
    },

    // --- geometry algebra oracles (r18): same quarter-grid fixtures, same
    //     IEEE formulas — bit-identical; round(_, 6) only absorbs
    //     summation-order / libm ulps where noted.
    "geo_polygon_stats" ->
      s"""WITH $nationEdgesSql
         |SELECT n_nationkey,
         |  round(abs(sum(x1*y2 - x2*y1)) / 2.0, 6) AS area,
         |  round(sum(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))), 6) AS perimeter,
         |  round(sum((x1+x2)*(x1*y2 - x2*y1)) / (sum(x1*y2 - x2*y1) / 2.0 * 6.0), 6) AS cx,
         |  round(sum((y1+y2)*(x1*y2 - x2*y1)) / (sum(x1*y2 - x2*y1) / 2.0 * 6.0), 6) AS cy,
         |  round(min(least(x1, x2)), 6) AS xmin,
         |  round(min(least(y1, y2)), 6) AS ymin,
         |  round(max(greatest(x1, x2)), 6) AS xmax,
         |  round(max(greatest(y1, y2)), 6) AS ymax
         |FROM ne GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin,

    "geo_polygon_contains" ->
      s"""WITH poly(i, x1, y1) AS (VALUES
         |  (0,21.0,10.0),(1,15.0,13.0),(2,12.0,19.0),(3,9.0,13.0),
         |  (4,3.0,10.0),(5,9.0,7.0),(6,12.0,1.0),(7,15.0,7.0)),
         |e AS (SELECT a.x1, a.y1, b.x1 AS x2, b.y1 AS y2
         |      FROM poly a JOIN poly b ON b.i = (a.i + 1) % 8),
         |$customerPointsSql
         |SELECT c_custkey, px, py FROM (
         |  SELECT cp.c_custkey, cp.px, cp.py, sum(${raycastSql()}) AS cr
         |  FROM cp CROSS JOIN e GROUP BY cp.c_custkey, cp.px, cp.py)
         |WHERE cr % 2 = 1 ORDER BY c_custkey""".stripMargin,

    "geo_contains_join" ->
      s"""WITH $nationEdgesSql,
         |$customerPointsSql
         |SELECT n_nationkey, c_custkey FROM (
         |  SELECT ne.n_nationkey, cp.c_custkey, sum(${raycastSql()}) AS cr
         |  FROM cp CROSS JOIN ne GROUP BY 1, 2)
         |WHERE cr % 2 = 1 ORDER BY n_nationkey, c_custkey""".stripMargin,

    "geo_polygon_intersects" ->
      s"""WITH $nationEdgesSql,
         |roff(i, dx, dy) AS (VALUES (0,4.0,0.0),(1,0.0,4.0),(2,-4.0,0.0),(3,0.0,-4.0)),
         |rv AS (SELECT r_regionkey, i,
         |         r_regionkey * 5.0 + 2.0 + dx * 1.0 AS x, 10.0 + dy * 1.0 AS y
         |       FROM region CROSS JOIN roff),
         |re AS (SELECT a.r_regionkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |       FROM rv a JOIN rv b ON a.r_regionkey = b.r_regionkey
         |                          AND b.i = (a.i + 1) % 4),
         |crossed AS (
         |  SELECT ne.n_nationkey, re.r_regionkey FROM ne CROSS JOIN re
         |  WHERE ((ne.x2-ne.x1)*(re.y1-ne.y1) - (ne.y2-ne.y1)*(re.x1-ne.x1))
         |      * ((ne.x2-ne.x1)*(re.y2-ne.y1) - (ne.y2-ne.y1)*(re.x2-ne.x1)) < 0
         |    AND ((re.x2-re.x1)*(ne.y1-re.y1) - (re.y2-re.y1)*(ne.x1-re.x1))
         |      * ((re.x2-re.x1)*(ne.y2-re.y1) - (re.y2-re.y1)*(ne.x2-re.x1)) < 0
         |  GROUP BY 1, 2),
         |n_in_r AS (
         |  SELECT v.n_nationkey, re.r_regionkey,
         |    sum(${raycastSql("re.", "v.x", "v.y")}) AS cr
         |  FROM (SELECT n_nationkey, x, y FROM nv WHERE i = 0) v
         |  CROSS JOIN re GROUP BY 1, 2),
         |r_in_n AS (
         |  SELECT ne.n_nationkey, v.r_regionkey,
         |    sum(${raycastSql("ne.", "v.x", "v.y")}) AS cr
         |  FROM (SELECT r_regionkey, x, y FROM rv WHERE i = 0) v
         |  CROSS JOIN ne GROUP BY 1, 2)
         |SELECT DISTINCT n_nationkey, r_regionkey FROM (
         |  SELECT * FROM crossed
         |  UNION ALL SELECT n_nationkey, r_regionkey FROM n_in_r WHERE cr % 2 = 1
         |  UNION ALL SELECT n_nationkey, r_regionkey FROM r_in_n WHERE cr % 2 = 1)
         |ORDER BY n_nationkey, r_regionkey""".stripMargin,

    "geo_line_distance" ->
      s"""WITH seg(x1, y1, x2, y2) AS (VALUES
         |  (0.0,0.0,6.0,8.0),(6.0,8.0,12.0,2.0),
         |  (12.0,2.0,18.0,14.0),(18.0,14.0,24.0,6.0)),
         |$customerPointsSql
         |SELECT c_custkey, px, py, dist FROM (
         |  SELECT c_custkey, px, py,
         |    round(min(sqrt((px - (x1 + t*(x2-x1))) * (px - (x1 + t*(x2-x1)))
         |                 + (py - (y1 + t*(y2-y1))) * (py - (y1 + t*(y2-y1))))), 6) AS dist
         |  FROM (SELECT cp.*, seg.*,
         |          greatest(0.0, least(1.0,
         |            ((px-x1)*(x2-x1) + (py-y1)*(y2-y1))
         |            / ((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)))) AS t
         |        FROM cp CROSS JOIN seg)
         |  GROUP BY c_custkey, px, py)
         |WHERE dist <= 3.0 ORDER BY c_custkey""".stripMargin,

    "geo_buffer_contains" ->
      s"""WITH sup AS (SELECT s_suppkey, (s_suppkey % 23) + 0.125 AS sx,
         |               (s_suppkey % 19) + 0.125 AS sy,
         |               1.0 + (s_suppkey % 4) * 0.5 AS r FROM supplier),
         |idx(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
         |v AS (SELECT s_suppkey, i,
         |        sx + r * cos(2.0 * pi() * i / 8.0 + pi() / 8.0) AS x,
         |        sy + r * sin(2.0 * pi() * i / 8.0 + pi() / 8.0) AS y
         |      FROM sup CROSS JOIN idx),
         |e AS (SELECT a.s_suppkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |      FROM v a JOIN v b ON a.s_suppkey = b.s_suppkey
         |                       AND b.i = (a.i + 1) % 8),
         |$customerPointsSql,
         |cnt AS (SELECT e.s_suppkey, cp.c_custkey, sum(${raycastSql()}) AS cr
         |        FROM cp CROSS JOIN e GROUP BY 1, 2),
         |ins AS (SELECT s_suppkey, count(*) AS n_inside FROM cnt
         |        WHERE cr % 2 = 1 GROUP BY 1),
         |ar AS (SELECT s_suppkey, round(abs(sum(x1*y2 - x2*y1)) / 2.0, 6) AS buf_area
         |       FROM e GROUP BY 1)
         |SELECT sup.s_suppkey, ar.buf_area, coalesce(ins.n_inside, 0) AS n_inside
         |FROM sup JOIN ar USING (s_suppkey) LEFT JOIN ins USING (s_suppkey)
         |ORDER BY s_suppkey""".stripMargin,

    // geodesic replays: the same Haversine text as knn_haversine (lat
    // clamp, lng wrap, R = 6371000) over the nation-star edges /
    // customer lattice; Chamberlain–Duquette area term mirrors
    // Geo.areaGeoSqMeters op-for-op, round(_, 2) absorbing libm ulps
    // and the SUM-vs-ordered-fold addition order.
    "geo_geodesic_measures" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${gla("y2")} - ${gla("y1")}) / 2), 2)
           | + cos(${gla("y1")}) * cos(${gla("y2")})
           |   * power(sin((${gln("x2")} - ${gln("x1")}) / 2), 2))""".stripMargin
      s"""WITH $nationEdgesSql,
         |seg AS (SELECT n_nationkey,
         |          2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)) AS len_m,
         |          ${duckWrapPi("radians(x2) - radians(x1)")}
         |            * (2.0 + sin(radians(y1)) + sin(radians(y2))) AS aterm
         |        FROM ne)
         |SELECT n_nationkey, round(sum(len_m), 2) AS perim_m,
         |       round(abs(sum(aterm)) * 6371000.0 * 6371000.0 / 2.0
         |             / 1000000.0, 2) AS area_km2
         |FROM seg GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
    },

    "geo_geodesic_dwithin" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${gla("10.0")} - ${gla("py")}) / 2), 2)
           | + cos(${gla("py")}) * cos(${gla("10.0")})
           |   * power(sin((${gln("10.0")} - ${gln("px")}) / 2), 2))""".stripMargin
      s"""WITH $customerPointsSql,
         |d AS (SELECT c_custkey,
         |        round(2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)), 2) AS dist_m
         |      FROM cp)
         |SELECT c_custkey, dist_m FROM d
         |WHERE dist_m <= 600000.0 ORDER BY c_custkey""".stripMargin
    },

    // interiors of a tiling are disjoint, so inclusive-minus-plain
    // intersects IS the 8-neighbor grid adjacency — statable exactly in
    // integer arithmetic, no geometry replay needed
    "geo_tiling_adjacency" ->
      """WITH g AS (SELECT n_nationkey, n_nationkey % 5 AS gx,
        |             CAST(floor(n_nationkey / 5.0) AS BIGINT) AS gy FROM nation)
        |SELECT a.n_nationkey AS n_a, b.n_nationkey AS n_b
        |FROM g a JOIN g b ON a.n_nationkey < b.n_nationkey
        | AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
        |ORDER BY n_a, n_b""".stripMargin,

    "geo_tiling_adjacency_join" ->
      """WITH g AS (SELECT n_nationkey, n_nationkey % 5 AS gx,
        |             CAST(floor(n_nationkey / 5.0) AS BIGINT) AS gy FROM nation)
        |SELECT a.n_nationkey AS n_a, b.n_nationkey AS n_b
        |FROM g a JOIN g b ON a.n_nationkey < b.n_nationkey
        | AND abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1
        |ORDER BY n_a, n_b""".stripMargin,

    "geo_geodesic_buffer" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${gla("y2")} - ${gla("y1")}) / 2), 2)
           | + cos(${gla("y1")}) * cos(${gla("y2")})
           |   * power(sin((${gln("x2")} - ${gln("x1")}) / 2), 2))""".stripMargin
      s"""WITH sup AS (SELECT s_suppkey, (s_suppkey % 19) + 0.125 AS dlat,
         |               (s_suppkey % 23) + 0.125 AS dlng,
         |               50000.0 + (s_suppkey % 4) * 25000.0 AS r FROM supplier),
         |idx(i) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
         |b0 AS (SELECT s_suppkey, i,
         |         ${gla("dlat")} AS p1, ${gln("dlng")} AS l1,
         |         r / 6371000.0 AS dl, 2.0 * pi() * i / 8.0 + pi() / 8.0 AS th
         |       FROM sup CROSS JOIN idx),
         |b1 AS (SELECT *, asin(sin(p1) * cos(dl) + cos(p1) * sin(dl) * cos(th)) AS p2
         |       FROM b0),
         |v AS (SELECT s_suppkey, i,
         |        degrees(l1 + atan2(sin(th) * sin(dl) * cos(p1),
         |                           cos(dl) - sin(p1) * sin(p2))) AS x,
         |        degrees(p2) AS y
         |      FROM b1),
         |e AS (SELECT a.s_suppkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |      FROM v a JOIN v b ON a.s_suppkey = b.s_suppkey
         |                       AND b.i = (a.i + 1) % 8),
         |seg AS (SELECT s_suppkey,
         |          2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)) AS len_m,
         |          ${duckWrapPi("radians(x2) - radians(x1)")}
         |            * (2.0 + sin(radians(y1)) + sin(radians(y2))) AS aterm
         |        FROM e)
         |SELECT s_suppkey, round(sum(len_m), 2) AS perim_m,
         |       round(abs(sum(aterm)) * 6371000.0 * 6371000.0 / 2.0
         |             / 1000000.0, 2) AS area_km2
         |FROM seg GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin
    },

    // the same star fixtures shifted half a world east and re-wrapped
    // into [-180, 180): seam-crossing edges exercise the Δλ wrap — the
    // shift arithmetic (+360 / pmod / −180 on quarter-grid doubles) is
    // exact, so only the usual trig rounding applies
    "geo_geodesic_antimeridian" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${gla("y2")} - ${gla("y1")}) / 2), 2)
           | + cos(${gla("y1")}) * cos(${gla("y2")})
           |   * power(sin((${gln("x2")} - ${gln("x1")}) / 2), 2))""".stripMargin
      s"""WITH off(i, dx, dy) AS (VALUES
         |  (0,3.0,0.0),(1,1.0,1.0),(2,0.0,3.0),(3,-1.0,1.0),
         |  (4,-3.0,0.0),(5,-1.0,-1.0),(6,0.0,-3.0),(7,1.0,-1.0)),
         |nv AS (SELECT n_nationkey, i,
         |         fmod(fmod((n_nationkey % 5) * 5.0
         |             + dx * (1.0 + (n_nationkey % 3) * 0.5) + 360.0, 360.0)
         |           + 360.0, 360.0) - 180.0 AS x,
         |         floor(n_nationkey / 5.0) * 5.0
         |           + dy * (1.0 + (n_nationkey % 3) * 0.5) AS y
         |       FROM nation CROSS JOIN off),
         |ne AS (SELECT a.n_nationkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
         |       FROM nv a JOIN nv b ON a.n_nationkey = b.n_nationkey
         |                          AND b.i = (a.i + 1) % 8),
         |seg AS (SELECT n_nationkey,
         |          2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)) AS len_m,
         |          ${duckWrapPi("radians(x2) - radians(x1)")}
         |            * (2.0 + sin(radians(y1)) + sin(radians(y2))) AS aterm
         |        FROM ne)
         |SELECT n_nationkey, round(sum(len_m), 2) AS perim_m,
         |       round(abs(sum(aterm)) * 6371000.0 * 6371000.0 / 2.0
         |             / 1000000.0, 2) AS area_km2
         |FROM seg GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
    },

    // spheroid-corrected twin of geo_geodesic_measures: lengths on the
    // WGS84 rectifying sphere, areas on the authalic sphere — the same
    // constants the Geo object documents
    "geo_geodesic_spheroid" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val h =
        s"""(power(sin((${gla("y2")} - ${gla("y1")}) / 2), 2)
           | + cos(${gla("y1")}) * cos(${gla("y2")})
           |   * power(sin((${gln("x2")} - ${gln("x1")}) / 2), 2))""".stripMargin
      s"""WITH $nationEdgesSql,
         |seg AS (SELECT n_nationkey,
         |          2.0 * 6367449.145823415 * atan2(sqrt($h), sqrt(1.0 - $h)) AS len_m,
         |          ${duckWrapPi("radians(x2) - radians(x1)")}
         |            * (2.0 + sin(radians(y1)) + sin(radians(y2))) AS aterm
         |        FROM ne)
         |SELECT n_nationkey, round(sum(len_m), 2) AS perim_m,
         |       round(abs(sum(aterm)) * 6371007.1809184737 * 6371007.1809184737
         |             / 2.0 / 1000000.0, 2) AS area_km2
         |FROM seg GROUP BY n_nationkey ORDER BY n_nationkey""".stripMargin
    },

    // bearing replay: same atan2 text as Geo.azimuthGeo, wrap via
    // fmod(fmod(θ,2π)+2π,2π) — θ ∈ (−π, π] makes the first fmod the
    // identity; the shared 2π double literal keeps the wrap exact
    "geo_geodesic_azimuth" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      val dl = s"(${gln("px")} - ${gln("10.0")})"
      val theta =
        s"""atan2(sin($dl) * cos(${gla("py")}),
           | cos(${gla("10.0")}) * sin(${gla("py")})
           |   - sin(${gla("10.0")}) * cos(${gla("py")}) * cos($dl))""".stripMargin
      val az =
        s"""CASE WHEN ${gla("py")} = ${gla("10.0")} AND $dl = 0.0 THEN NULL
           | ELSE fmod(fmod($theta, 6.283185307179586)
           |   + 6.283185307179586, 6.283185307179586) END""".stripMargin
      val h =
        s"""(power(sin((${gla("py")} - ${gla("10.0")}) / 2), 2)
           | + cos(${gla("10.0")}) * cos(${gla("py")})
           |   * power(sin((${gln("px")} - ${gln("10.0")}) / 2), 2))""".stripMargin
      s"""WITH $customerPointsSql
         |SELECT c_custkey, round($az, 6) AS az_rad,
         |       round(2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)), 2) AS dist_m
         |FROM cp ORDER BY c_custkey""".stripMargin
    },

    "geo_geodesic_nearest" -> {
      def gla(e: String) = s"radians(greatest(-90.0, least(90.0, $e)))"
      def gln(e: String) =
        s"""radians(CASE WHEN fmod(fmod($e, 360.0) + 360.0, 360.0) >= 180.0
           | THEN fmod(fmod($e, 360.0) + 360.0, 360.0) - 360.0
           | ELSE fmod(fmod($e, 360.0) + 360.0, 360.0) END)""".stripMargin
      // radiusJoin computes haversine(pointLat, pointLng, poiLat, poiLng)
      val h =
        s"""(power(sin((${gla("dlat")} - ${gla("py")}) / 2), 2)
           | + cos(${gla("py")}) * cos(${gla("dlat")})
           |   * power(sin((${gln("dlng")} - ${gln("px")}) / 2), 2))""".stripMargin
      s"""WITH $customerPointsSql,
         |dep AS (SELECT s_suppkey, (s_suppkey % 19) + 0.125 AS dlat,
         |          (s_suppkey % 23) + 0.125 AS dlng FROM supplier),
         |d AS (SELECT c_custkey, s_suppkey,
         |        2.0 * 6371000.0 * atan2(sqrt($h), sqrt(1.0 - $h)) AS dm
         |      FROM cp CROSS JOIN dep),
         |r AS (SELECT c_custkey, s_suppkey, dm,
         |        row_number() OVER (PARTITION BY c_custkey
         |                           ORDER BY dm, s_suppkey) AS nn_rank
         |      FROM d WHERE dm <= 300000.005)
         |SELECT c_custkey, s_suppkey, CAST(nn_rank AS BIGINT) AS nn_rank,
         |       round(dm, 2) AS dist_m
         |FROM r WHERE nn_rank <= 2 AND round(dm, 2) <= 300000.0
         |ORDER BY c_custkey, nn_rank""".stripMargin
    },

    // covers on an axis-aligned square IS the closed box; on-edge is the
    // exact lattice condition — both sides decide with exact arithmetic
    "geo_covers_boundary" ->
      s"""WITH $customerPointsSql
         |SELECT c_custkey, px, py,
         |       (px = 2.0 OR px = 12.0 OR py = 2.0 OR py = 12.0) AS on_edge
         |FROM cp
         |WHERE px >= 2.0 AND px <= 12.0 AND py >= 2.0 AND py <= 12.0
         |ORDER BY c_custkey""".stripMargin,

    "fuzzy_name_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM n a JOIN n b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY name_a, name_b""".stripMargin,

    "fuzzy_typo_lookup" ->
      """WITH t AS (SELECT p_partkey,
        |    substr(p_name, 1, (p_partkey % length(p_name)))
        |      || substr(p_name, (p_partkey % length(p_name)) + 2) AS typo
        |  FROM part),
        |n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT p_partkey, typo, name,
        |       CAST(levenshtein(typo, name) AS BIGINT) AS dist
        |FROM t CROSS JOIN n WHERE levenshtein(typo, name) <= 1
        |ORDER BY p_partkey, name""".stripMargin,

    "geo_multipolygon_contains" ->
      s"""WITH $customerPointsSql,
         |de(x1, y1, x2, y2) AS (VALUES
         |  (2.0,2.0,22.0,2.0),(22.0,2.0,22.0,20.0),(22.0,20.0,2.0,20.0),(2.0,20.0,2.0,2.0),
         |  (8.0,6.0,16.0,6.0),(16.0,6.0,16.0,14.0),(16.0,14.0,8.0,14.0),(8.0,14.0,8.0,6.0)),
         |me(x1, y1, x2, y2) AS (VALUES
         |  (0.0,0.0,6.0,0.0),(6.0,0.0,6.0,6.0),(6.0,6.0,0.0,6.0),(0.0,6.0,0.0,0.0),
         |  (18.0,14.0,24.0,14.0),(24.0,14.0,24.0,22.0),(24.0,22.0,18.0,22.0),(18.0,22.0,18.0,14.0)),
         |dq AS (SELECT c_custkey, sum(${raycastSql()}) AS cr
         |       FROM cp CROSS JOIN de GROUP BY 1),
         |mq AS (SELECT c_custkey, sum(${raycastSql()}) AS cr
         |       FROM cp CROSS JOIN me GROUP BY 1)
         |SELECT cp.c_custkey, cp.px, cp.py,
         |       dq.cr % 2 = 1 AS in_donut, mq.cr % 2 = 1 AS in_multi
         |FROM cp JOIN dq ON cp.c_custkey = dq.c_custkey
         |        JOIN mq ON cp.c_custkey = mq.c_custkey
         |WHERE dq.cr % 2 = 1 OR mq.cr % 2 = 1
         |ORDER BY cp.c_custkey""".stripMargin,

    "fuzzy_name_components" ->
      s"""WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        |ids AS (SELECT p_name,
        |          CAST(${duckKeyHash62("p_name")} AS BIGINT) AS nid
        |        FROM n),
        |e AS (SELECT a.nid AS id_a, b.nid AS id_b
        |      FROM ids a JOIN ids b ON a.p_name < b.p_name
        |      WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |ed AS (SELECT id_a AS s, id_b AS t FROM e
        |       UNION SELECT id_b, id_a FROM e),
        |r AS (SELECT s AS id, t AS reach FROM ed
        |      UNION SELECT r.id, ed.t FROM r JOIN ed ON r.reach = ed.s),
        |comp AS (SELECT id, CAST(least(id, min(reach)) AS BIGINT) AS component
        |         FROM r GROUP BY id)
        |SELECT ids.p_name AS name, comp.component
        |FROM comp JOIN ids ON comp.id = ids.nid
        |ORDER BY name""".stripMargin,

    "geo_donut_measures" ->
      """WITH off(i, dx, dy) AS (VALUES
        |  (0,3.0,0.0),(1,1.0,1.0),(2,0.0,3.0),(3,-1.0,1.0),
        |  (4,-3.0,0.0),(5,-1.0,-1.0),(6,0.0,-3.0),(7,1.0,-1.0)),
        |sv AS (SELECT n_nationkey, i,
        |         (n_nationkey % 5) * 5.0 + dx * (1.0 + (n_nationkey % 3) * 0.5) AS x,
        |         floor(n_nationkey / 5.0) * 5.0 + dy * (1.0 + (n_nationkey % 3) * 0.5) AS y
        |       FROM nation CROSS JOIN off),
        |se AS (SELECT a.n_nationkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        |       FROM sv a JOIN sv b ON a.n_nationkey = b.n_nationkey
        |                          AND b.i = (a.i + 1) % 8),
        |hv AS (SELECT n_nationkey, i,
        |         (n_nationkey % 5) * 5.0 + dx * 0.25 AS x,
        |         floor(n_nationkey / 5.0) * 5.0 + dy * 0.25 AS y
        |       FROM nation CROSS JOIN off),
        |he AS (SELECT a.n_nationkey, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        |       FROM hv a JOIN hv b ON a.n_nationkey = b.n_nationkey
        |                          AND b.i = (a.i + 1) % 8),
        |sa AS (SELECT n_nationkey, abs(sum(x1*y2 - x2*y1)) / 2.0 AS a,
        |              sum(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))) AS p
        |       FROM se GROUP BY n_nationkey),
        |ha AS (SELECT n_nationkey, abs(sum(x1*y2 - x2*y1)) / 2.0 AS a,
        |              sum(sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1))) AS p
        |       FROM he GROUP BY n_nationkey)
        |SELECT sa.n_nationkey, round(sa.a - ha.a, 6) AS area,
        |       round(sa.p + ha.p, 6) AS perimeter
        |FROM sa JOIN ha ON sa.n_nationkey = ha.n_nationkey
        |ORDER BY sa.n_nationkey""".stripMargin,

    "geo_extent_by_nation" ->
      """SELECT c_nationkey, count(*) AS n_points,
        |  min((c_custkey % 97) * 0.25) AS xmin, min((c_custkey % 89) * 0.25) AS ymin,
        |  max((c_custkey % 97) * 0.25) AS xmax, max((c_custkey % 89) * 0.25) AS ymax,
        |  round(sum((c_custkey % 97) * 0.25) / count(*), 6) AS cx,
        |  round(sum((c_custkey % 89) * 0.25) / count(*), 6) AS cy
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "predicate_geo_dwithin" ->
      s"""WITH poly(i, x1, y1) AS (VALUES
         |  (0,21.0,10.0),(1,15.0,13.0),(2,12.0,19.0),(3,9.0,13.0),
         |  (4,3.0,10.0),(5,9.0,7.0),(6,12.0,1.0),(7,15.0,7.0)),
         |e AS (SELECT a.x1, a.y1, b.x1 AS x2, b.y1 AS y2
         |      FROM poly a JOIN poly b ON b.i = (a.i + 1) % 8),
         |seg(x1, y1, x2, y2) AS (VALUES
         |  (0.0,0.0,6.0,8.0),(6.0,8.0,12.0,2.0),
         |  (12.0,2.0,18.0,14.0),(18.0,14.0,24.0,6.0)),
         |$customerPointsSql,
         |inq AS (SELECT cp.c_custkey, cp.px, cp.py, sum(${raycastSql()}) AS cr
         |        FROM cp CROSS JOIN e GROUP BY 1, 2, 3),
         |dq AS (SELECT c_custkey,
         |         min(sqrt((px - (x1 + t*(x2-x1))) * (px - (x1 + t*(x2-x1)))
         |               + (py - (y1 + t*(y2-y1))) * (py - (y1 + t*(y2-y1))))) AS dist
         |       FROM (SELECT cp.*, seg.*,
         |               greatest(0.0, least(1.0,
         |                 ((px-x1)*(x2-x1) + (py-y1)*(y2-y1))
         |                 / ((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)))) AS t
         |             FROM cp CROSS JOIN seg)
         |       GROUP BY c_custkey)
         |SELECT i.c_custkey, i.px, i.py
         |FROM inq i JOIN dq ON i.c_custkey = dq.c_custkey
         |WHERE i.cr % 2 = 1 AND dq.dist <= 4.0
         |ORDER BY i.c_custkey""".stripMargin,

    "geo_tile_pruned_scan" ->
      s"""WITH $customerPointsSql
         |SELECT c_custkey, px, py,
         |  round(sqrt((px - 12.0) * (px - 12.0) + (py - 10.0) * (py - 10.0)), 6) AS dist
         |FROM cp
         |WHERE (px - 12.0) * (px - 12.0) + (py - 10.0) * (py - 10.0) <= 9.0
         |ORDER BY c_custkey""".stripMargin,

    "geo_nearest_poi" ->
      s"""WITH $customerPointsSql,
         |sp AS (SELECT s_suppkey, (s_suppkey % 23) + 0.125 AS sx,
         |         (s_suppkey % 19) + 0.125 AS sy FROM supplier),
         |cand AS (
         |  SELECT c_custkey, s_suppkey,
         |         (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2
         |  FROM cp CROSS JOIN sp
         |  WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy) <= 9.0),
         |rk AS (SELECT c_custkey, s_suppkey, d2,
         |         row_number() OVER (PARTITION BY c_custkey
         |           ORDER BY d2, s_suppkey) AS rn
         |       FROM cand)
         |SELECT c_custkey, s_suppkey, round(sqrt(d2), 6) AS dist
         |FROM rk WHERE rn = 1 ORDER BY c_custkey""".stripMargin,

    // independent convex∩convex area: candidate vertices (subject verts
    // in window ∪ window corners in subject ∪ edge×edge crossings) →
    // filter to both shapes → dedupe → angular sort → shoelace. Never
    // runs the Sutherland–Hodgman fold it checks.
    "geo_clip_area" ->
      """WITH rp AS (SELECT r_regionkey, r_regionkey * 5.0 + 2.0 AS cx,
        |              10.0 AS cy FROM region),
        |dv(i, ox, oy) AS (VALUES (0,4.0,0.0),(1,0.0,4.0),(2,-4.0,0.0),(3,0.0,-4.0)),
        |dverts AS (SELECT r_regionkey, cx, cy, i, cx + ox AS x, cy + oy AS y
        |           FROM rp CROSS JOIN dv),
        |dedges AS (SELECT a.r_regionkey, a.cx, a.cy, a.x AS x1, a.y AS y1,
        |                  b.x AS x2, b.y AS y2
        |           FROM dverts a JOIN dverts b
        |             ON a.r_regionkey = b.r_regionkey AND b.i = (a.i + 1) % 4),
        |rv(j, x, y) AS (VALUES (0,4.0,6.5),(1,18.0,6.5),(2,18.0,13.5),(3,4.0,13.5)),
        |redges AS (SELECT a.j, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        |           FROM rv a JOIN rv b ON b.j = (a.j + 1) % 4),
        |xing AS (
        |  SELECT de.r_regionkey,
        |         de.x1 + t * (de.x2 - de.x1) AS x,
        |         de.y1 + t * (de.y2 - de.y1) AS y
        |  FROM (
        |    SELECT de.*,
        |      ((re.x2-re.x1)*(de.y1-re.y1) - (re.y2-re.y1)*(de.x1-re.x1))
        |      / ((re.y2-re.y1)*(de.x2-de.x1) - (re.x2-re.x1)*(de.y2-de.y1)) AS t
        |    FROM dedges de CROSS JOIN redges re) de
        |  WHERE t >= 0 AND t <= 1),
        |cand AS (
        |  SELECT r_regionkey, cx, cy, x, y FROM dverts
        |  UNION ALL SELECT r_regionkey, cx, cy, rv.x, rv.y FROM rp CROSS JOIN rv
        |  UNION ALL SELECT x.r_regionkey, rp.cx, rp.cy, x.x, x.y
        |            FROM xing x JOIN rp USING (r_regionkey)),
        |verts AS (
        |  SELECT DISTINCT r_regionkey, x, y FROM cand
        |  WHERE abs(x - cx) + abs(y - cy) <= 4.0
        |    AND x >= 4.0 AND x <= 18.0 AND y >= 6.5 AND y <= 13.5),
        |cent AS (SELECT r_regionkey, avg(x) AS mx, avg(y) AS my,
        |                count(*) AS n
        |         FROM verts GROUP BY r_regionkey),
        |ordered AS (
        |  SELECT v.r_regionkey, v.x, v.y, c.n,
        |    row_number() OVER (PARTITION BY v.r_regionkey
        |      ORDER BY atan2(v.y - c.my, v.x - c.mx)) AS rn
        |  FROM verts v JOIN cent c USING (r_regionkey)),
        |area AS (
        |  SELECT a.r_regionkey,
        |         round(abs(sum(a.x * b.y - b.x * a.y)) / 2.0, 6) AS clip_area
        |  FROM ordered a JOIN ordered b
        |    ON a.r_regionkey = b.r_regionkey AND b.rn = a.rn % a.n + 1
        |  GROUP BY a.r_regionkey)
        |SELECT r.r_regionkey, coalesce(area.clip_area, 0.0) AS clip_area
        |FROM region r LEFT JOIN area ON r.r_regionkey = area.r_regionkey
        |ORDER BY r.r_regionkey""".stripMargin,

    "geo_fence_hourly" ->
      s"""WITH $nationEdgesSql,
         |ev AS (SELECT event_id, ts, (event_id % 101) * 0.25 AS ex,
         |         (event_id % 103) * 0.25 AS ey FROM events),
         |hit AS (SELECT ev.event_id, ev.ts, ne.n_nationkey,
         |          sum(${raycastSql("", "ex", "ey")}) AS cr
         |        FROM ev CROSS JOIN ne GROUP BY 1, 2, 3)
         |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         |       n_nationkey, count(*) AS cnt
         |FROM hit WHERE cr % 2 = 1
         |GROUP BY 1, 2 ORDER BY hour, n_nationkey""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice, sum_qty
        |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(sum(l_quantity), 2) > 250)
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey  = o_custkey
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "events_pivot" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'view') AS view,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'error') AS error
        |FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |         year(l_shipdate) AS l_year,
        |         l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  JOIN supplier ON s_suppkey  = l_suppkey
        |  JOIN customer ON c_custkey  = o_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate <= TIMESTAMP '1996-12-31')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  round(c_acctbal, 2) AS acctbal, n_name
        |FROM lineitem
        |JOIN orders   ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey  = o_custkey
        |JOIN nation   ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1995-10-01'
        |  AND o_orderdate <  TIMESTAMP '1996-01-01'
        |GROUP BY c_custkey, c_name, round(c_acctbal, 2), n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-04-01'
        |  AND o_orderdate <  TIMESTAMP '1995-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_late_shipment" ->
      """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN '0-30d'
        |            WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN '31-90d'
        |            ELSE '90d+' END AS ship_band,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_promo_revenue" ->
      """SELECT round(100.0 *
        |  sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
        |  sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-09-01'
        |  AND l_shipdate <  TIMESTAMP '1995-10-01'""".stripMargin,

    "q19_disjunctive_revenue" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#12' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#13' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""".stripMargin,

    "q22_idle_balance" ->
      """SELECT c_mktsegment, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer
        |WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY')
        |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0.0
        |                     AND c_mktsegment IN ('AUTOMOBILE','BUILDING','MACHINERY'))
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT'
        |                  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |                  AND o_orderdate <  TIMESTAMP '1996-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // --- TPC-H completion oracles (r18) ---
    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q8_market_share" ->
      """SELECT o_year,
        |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END)
        |        / sum(volume), 4) AS mkt_share
        |FROM (
        |  SELECT year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part      ON p_partkey = l_partkey
        |  JOIN supplier  ON s_suppkey = l_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  JOIN orders    ON l_orderkey = o_orderkey
        |  JOIN customer  ON o_custkey  = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND n1.n_regionkey = 1
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate <= TIMESTAMP '1996-12-31')
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_product_profit" ->
      """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS amount
        |  FROM lineitem
        |  JOIN part     ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN orders   ON o_orderkey = l_orderkey
        |  WHERE p_name LIKE '%red%')
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '3-MEDIUM'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q17_small_quantity_revenue" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey
        |JOIN (SELECT l_partkey AS ap_pk, sum(l_quantity) AS ap_sum,
        |             count(*) AS ap_cnt
        |      FROM lineitem JOIN part ON p_partkey = l_partkey
        |      WHERE p_brand = 'Brand#11' AND p_size <= 5
        |      GROUP BY l_partkey) ON p_partkey = ap_pk
        |WHERE p_brand = 'Brand#11' AND p_size <= 5
        |  AND l_quantity * ap_cnt * 5.0 < ap_sum""".stripMargin,

    "q20_excess_suppliers" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_type = 'PROMO'
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(l_quantity) > 40.0)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey  = l1.l_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |WHERE datediff('day', o_orderdate, l1.l_shipdate) > 90
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND datediff('day', o_orderdate, l3.l_shipdate) > 90)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,

    "skew_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "winnow_profile" ->
      s"""WITH ${duckWinnowCtes("documents")}
         |SELECT g.doc_id AS id, g.G AS n_grams,
         |  coalesce(f.n_fps, 0) AS n_fps,
         |  coalesce(f.n_dh, 0) AS n_distinct_hashes
         |FROM wg g LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_fps,
         |         count(DISTINCT m // 8589934592) AS n_dh
         |  FROM wfp GROUP BY 1) f ON g.doc_id = f.doc_id
         |ORDER BY id""".stripMargin,

    "winnow_neardup" ->
      s"""WITH wbase AS (SELECT doc_id, text FROM documents
         | UNION ALL
         | SELECT doc_id + 10000, concat('NEW PREFIX ', text) FROM documents
         | WHERE doc_id < 50),
         |${duckWinnowCtes("wbase")},
         |wrel0 AS (SELECT DISTINCT doc_id, m // 8589934592 AS fp_hash FROM wfp),
         |wok AS (SELECT fp_hash FROM wrel0 GROUP BY fp_hash
         |        HAVING count(*) <= 64),
         |wrel AS (SELECT wrel0.* FROM wrel0 JOIN wok USING (fp_hash)),
         |wcnt AS (SELECT doc_id, count(*) AS n FROM wrel GROUP BY 1),
         |wpairs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
         |  FROM wrel a JOIN wrel b ON a.fp_hash = b.fp_hash
         |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT id_a, id_b, shared_fps,
         |  round(shared_fps / least(ca.n, cb.n), 4) AS containment
         |FROM wpairs
         |JOIN wcnt ca ON ca.doc_id = id_a
         |JOIN wcnt cb ON cb.doc_id = id_b
         |WHERE shared_fps >= 5
         |  AND round(shared_fps / least(ca.n, cb.n), 4) >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    "events_cube" ->
      """SELECT GROUPING(event_type, d) AS gid,
        |  coalesce(event_type, '(all)') AS event_type,
        |  coalesce(d, '(all)') AS day,
        |  count(*) AS cnt, round(sum(value), 2) AS total_value
        |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS d, value
        |      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL)
        |GROUP BY CUBE(event_type, d)
        |ORDER BY gid, event_type, day""".stripMargin,

    "events_rolling_avg" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt,
        |  round(avg(cnt) OVER (PARTITION BY event_type ORDER BY d
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 4) AS avg7
        |FROM daily ORDER BY event_type, day""".stripMargin,

    "events_corr" ->
      """WITH daily AS (
        |  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS cnt
        |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  round(corr(a.cnt, b.cnt), 4) AS corr_daily, count(*) AS n_days
        |FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,

    "doc_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |    FROM documents)
        |  WHERE term <> '' AND regexp_full_match(term, '[a-z]+')
        |  GROUP BY doc_id, term),
        | dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
        | n AS (SELECT count(*) AS n_docs FROM documents),
        | scored AS (
        |  SELECT doc_id, term,
        |    round(tf * ln((n_docs + 1.0) / (dfreq + 1.0)), 4) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, rank, term, score FROM (
        |  SELECT doc_id, term, score, row_number() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM scored)
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "value_quantile_sketch" ->
      s"""WITH b AS (SELECT event_type, ${duckRawHash("CAST(event_id AS VARCHAR)")} AS h, value
         |           FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
         | n AS (SELECT event_type, count(*) AS n_rows FROM b GROUP BY event_type),
         | dh AS (SELECT event_type, h, min(value) AS v FROM b GROUP BY event_type, h),
         | rk AS (SELECT event_type, v,
         |          row_number() OVER (PARTITION BY event_type ORDER BY h) AS r FROM dh),
         | smp AS (SELECT event_type, list_sort(list(v)) AS ls
         |         FROM rk WHERE r <= 64 GROUP BY event_type)
         |SELECT smp.event_type, n.n_rows, len(ls) AS n_sample,
         |  round(ls[greatest(1, CAST(ceil(0.5 * len(ls)) AS BIGINT))], 2) AS p50_est,
         |  round(ls[greatest(1, CAST(ceil(0.9 * len(ls)) AS BIGINT))], 2) AS p90_est,
         |  round(ls[greatest(1, CAST(ceil(0.99 * len(ls)) AS BIGINT))], 2) AS p99_est
         |FROM smp JOIN n ON smp.event_type = n.event_type
         |ORDER BY smp.event_type""".stripMargin,

    "quality_percentile_band" ->
      s"""SELECT doc_id, lang, quality, pct FROM (
         | SELECT doc_id, lang, quality,
         |   round(percent_rank() OVER
         |     (PARTITION BY lang ORDER BY quality DESC, doc_id), 4) AS pct
         | FROM (SELECT doc_id, lang, round((
         |   least(length(text) / 200.0, 1.0)
         |   + greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE
         |       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END) * 5.0)
         |   + least((CAST(len(list_filter($duckToks, t -> list_contains($duckStops, t))) AS DOUBLE) / len($duckToks)) * 5.0, 1.0)
         |  ) / 3.0, 4) AS quality FROM documents))
         |WHERE pct <= 0.3 ORDER BY lang, pct, doc_id""".stripMargin,
  )

  private def fuzzyOracle(mergeFn: String): String =
    s"""WITH l AS (SELECT o_orderkey AS id, o_totalprice / 1000000.0 AS d
       |           FROM orders WHERE o_orderstatus = 'F'),
       |     r AS (SELECT l_orderkey AS id, sum(l_quantity) / 100.0 AS d
       |           FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) / 100.0 > 1.0)
       |SELECT COALESCE(l.id, r.id) AS id,
       |  round($mergeFn(COALESCE(l.d, 0.0), COALESCE(r.d, 0.0)), 6) AS distance
       |FROM l FULL JOIN r ON l.id = r.id ORDER BY id""".stripMargin
}

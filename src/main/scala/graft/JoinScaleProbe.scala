package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{AsOfJoin, Geo, RangeJoin}

/** 10× scaling probe for the round-14 join operators (as-of, binned
  * range, geo radius): expand the input 10× with fresh keys (per-key
  * density constant — like a real 10× corpus, not 10 hot copies of one
  * key), measure both sizes, and report the wall-clock ratio. A plan
  * that survives 100 TB must scale ~linearly here; a quadratic shape
  * (nested loop, unbanded self-join) would show ≈100×. Run:
  * `sbt "runMain graft.JoinScaleProbe /root/testdata/sf0.1 10"` —
  * the table lands on stdout for SCALING.md. */
object JoinScaleProbe {

  private def time[T](run: => Long): (Long, Long) = {
    val t0 = System.nanoTime()
    val n = run
    (n, (System.nanoTime() - t0) / 1000000L)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder("local[8]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(1)
        .select(explode(sequence(lit(0L), lit(factor - 1L))).as("ap_copy")))

    // events: fresh users per copy — per-user event density constant
    val ev = Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "event_type")
    def expandEv(f: Int): DataFrame =
      if (f == 1) ev
      else copies(ev).select(
        (col("event_id") + col("ap_copy") * 1000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("ap_copy") * 10000000L).as("user_id"),
        col("event_type"))

    def asofOf(e: DataFrame): Long =
      AsOfJoin.asOf(
        e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("ts"), col("user_id")),
        e.filter(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("ts"), col("user_id")),
        Seq("user_id"), "ts", "c_id", Seq("c_id"),
        toleranceMicros = Some(1800L * 1000000L)).count()

    def asofCount(f: Int): Long = asofOf(expandEv(f))

    // range join: 10× points against the same interval relation
    val bands = Tables.part(spark, sfDir).select(col("p_partkey"),
      (col("p_retailprice") - 5).as("lo"), (col("p_retailprice") + 5).as("hi"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    def rangeCount(f: Int): Long = {
      val pts = if (f == 1) li else copies(li)
        .select((col("l_orderkey") + col("ap_copy") * 1000000000L).as("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice"))
      RangeJoin.pointsInIntervals(pts, "l_extendedprice", bands, "lo", "hi", 10.0).count()
    }

    // geo join: 10× points against the same POI set
    val emb = Tables.embeddings(spark, sfDir)
    def geoPts(f: Int): DataFrame = {
      val base = emb.select(col("vec_id"),
        (element_at(col("embedding"), 1).cast("double") * 20.0).as("lat"),
        (element_at(col("embedding"), 2).cast("double") * 40.0).as("lng"))
      if (f == 1) base else copies(base)
        .select((col("vec_id") + col("ap_copy") * 1000000000L).as("vec_id"),
          col("lat"), col("lng"))
    }
    val pois = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("poi_id"),
        (element_at(col("embedding"), 1).cast("double") * 20.0).as("poi_lat"),
        (element_at(col("embedding"), 2).cast("double") * 40.0).as("poi_lng"))
    def geoCount(f: Int): Long =
      Geo.radiusJoin(geoPts(f), "lat", "lng", pois, "poi_lat", "poi_lng", 300000.0).count()
    // geodesic k-NN: same grid candidates + a per-point window; output
    // is bounded at k rows/point, so rows_Nx ≈ N · rows_1x and wall must
    // stay ~linear (the window shuffles only radius-filtered pairs)
    def geoNearestCount(f: Int): Long =
      Geo.nearestJoinGeo(geoPts(f), "vec_id", "lat", "lng",
        pois, "poi_lat", "poi_lng", "poi_id", 300000.0, k = 2).count()

    // interval overlap: sessions of two event types, users fresh per copy
    def overlapCount(f: Int): Long = {
      val e = expandEv(f)
      val gapUs = 7L * 86400L * 1000000L
      def sess(tpe: String, pre: String) =
        graft.operators.EventAnalytics.sessions(
            e.filter(col("event_type") === tpe), gapUs)
          .select(col("user_id"), col("session_id").as(s"${pre}_sid"),
            col("start_us").as(s"${pre}_s"), col("end_us").as(s"${pre}_e"))
      RangeJoin.intervalsOverlap(sess("click", "c"), "c_s", "c_e",
        sess("error", "e"), "e_s", "e_e",
        binWidth = gapUs.toDouble, keys = Seq("user_id")).count()
    }

    // containment join: N× points against a fixed fence set — the grid
    // tile equi-join + codegen raycast; per-cell density grows ×N, the
    // plan must stay ~linear (an NLJ regression would show ≈N²)
    val fences = Tables.supplier(spark, sfDir).select(col("s_suppkey"),
      graft.operators.GeoAlgebra.stBufferPoint(
        (col("s_suppkey") % 23).cast("double") + 0.125,
        (col("s_suppkey") % 19).cast("double") + 0.125,
        lit(1.0) + (col("s_suppkey") % 4).cast("double") * 0.5, 8).as("ring"))
    val custPts = Tables.customer(spark, sfDir).select(col("c_custkey"),
      ((col("c_custkey") % 97).cast("double") * 0.25).as("px"),
      ((col("c_custkey") % 89).cast("double") * 0.25).as("py"))
    def containsCount(f: Int): Long = {
      val pts = if (f == 1) custPts else copies(custPts)
        .select((col("c_custkey") + col("ap_copy") * 1000000000L).as("c_custkey"),
          col("px"), col("py"))
      graft.operators.GeoAlgebra.containsJoin(pts, "px", "py",
        fences, "ring", cell = 1.0).count()
    }

    // polygon×polygon grid join: copies shift SPATIALLY (fresh y band
    // per copy) so density per cell stays constant and true pairs scale
    // ×N — a non-shifted copy set would overlap identically and grow
    // pairs ×N², measuring the fixture, not the plan
    def fencePolys(f: Int, tag: String): DataFrame = {
      val base = Tables.supplier(spark, sfDir).select(
        col("s_suppkey"),
        ((col("s_suppkey") % 23).cast("double") + 0.125).as("fx"),
        ((col("s_suppkey") % 19).cast("double") + 0.125).as("fy"),
        (lit(1.0) + (col("s_suppkey") % 4).cast("double") * 0.5).as("fr"))
      val shifted = if (f == 1) base.withColumn("ap_copy", lit(0L))
        else copies(base)
      shifted.select(
        (col("s_suppkey") + col("ap_copy") * 1000000000L).as(s"${tag}_id"),
        graft.operators.GeoAlgebra.stBufferPoint(col("fx"),
          col("fy") + col("ap_copy").cast("double") * 100.0, col("fr"), 8)
          .as(s"${tag}_ring"))
    }
    def polyJoinCount(f: Int): Long =
      graft.operators.GeoAlgebra.intersectsJoin(
        fencePolys(f, "pa"), "pa_ring", fencePolys(f, "pb"), "pb_ring",
        cell = 4.0).count()

    val probes: Seq[(String, Int => Long)] = Seq(
      ("asof_join", asofCount), ("range_join", rangeCount),
      ("geo_radius_join", geoCount), ("interval_overlap", overlapCount),
      ("geo_contains_join", containsCount),
      ("geo_nearest_geo", geoNearestCount),
      ("geo_intersects_join", polyJoinCount))

    println(f"${"operator"}%-16s ${"rows_1x"}%10s ${"ms_1x"}%8s ${"rows_Nx"}%12s ${"ms_Nx"}%8s ratio")
    probes.foreach { case (name, run) =>
      run(1) // warm-up: JIT + parquet footer caches
      val (n1, t1) = time(run(1))
      val (nN, tN) = time(run(factor))
      val ratio = tN.toDouble / math.max(1L, t1)
      println(f"$name%-16s $n1%10d $t1%8d $nN%12d $tN%8d ${ratio}%5.1fx")
    }

    // --- hot-key variant: copy 0's users all collapse into user 1, so
    // at factor f ONE user owns ~1/f of every event. The keyed-window
    // operators (as-of, sessions) then pay one task that sorts the hot
    // key alone — the per-key ordered bound AQE cannot split and salting
    // cannot help (order-sensitive state spans the whole key). Measured
    // here: wall + max/median task time vs the uniform expansion.
    def expandEvHot(f: Int): DataFrame =
      copies(ev).select(
        (col("event_id") + col("ap_copy") * 1000000000L).as("event_id"),
        col("ts"),
        when(col("ap_copy") === 0, lit(1L))
          .otherwise(col("user_id") + col("ap_copy") * 10000000L).as("user_id"),
        col("event_type"))

    val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskMs.add(te.taskMetrics.executorRunTime)
    }
    spark.sparkContext.addSparkListener(listener)
    def measured(run: => Long): (Long, Long, Long, Long) = {
      taskMs.clear()
      val (n, wall) = time(run)
      Thread.sleep(800) // let the listener bus drain task-end events
      import scala.jdk.CollectionConverters._
      val ts = taskMs.asScala.toSeq.sorted
      (n, wall, if (ts.isEmpty) 0L else ts.max,
        if (ts.isEmpty) 0L else ts(ts.size / 2))
    }
    val gapUs = 7L * 86400L * 1000000L
    def sessionsCount(e: DataFrame): Long =
      graft.operators.EventAnalytics.sessions(
        e.filter(col("event_type") === "click"), gapUs).count()

    println(f"%n${"hot-key probe"}%-22s ${"rows"}%10s ${"wall_ms"}%8s ${"maxTask"}%8s ${"p50Task"}%8s")
    Seq[(String, DataFrame => Long)](
      ("asof_join", asofOf), ("sessions", sessionsCount)).foreach {
      case (name, run) =>
        run(expandEv(factor)) // warm
        val (nU, wU, mU, pU) = measured(run(expandEv(factor)))
        val (nH, wH, mH, pH) = measured(run(expandEvHot(factor)))
        println(f"$name%-14s uniform $nU%10d $wU%8d $mU%8d $pU%8d")
        println(f"$name%-14s hotkey  $nH%10d $wH%8d $mH%8d $pH%8d")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Geo
import graft.functions.Distances

/** WKT point attributes + Haversine radius predicate (the minimal
  * geometry slice of the reference's GEOMETRY/GEOGRAPHY types). */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  test("WKT point round-trips the exact double") {
    val pts = Seq((1.5, -30.25), (0.1 + 0.2, 89.99999999), (-179.5e-3, 0.0))
      .toDF("lng", "lat")
    val r = pts.select(
      Geo.wktPoint(col("lng"), col("lat")).as("wkt"),
      col("lng"), col("lat"))
      .select(Geo.wktLng(col("wkt")).as("lng2"), Geo.wktLat(col("wkt")).as("lat2"),
        col("lng"), col("lat"))
      .collect()
    r.foreach { row =>
      row.getDouble(0) shouldBe row.getDouble(2) // bit-exact, no tolerance
      row.getDouble(1) shouldBe row.getDouble(3)
    }
  }

  test("malformed WKT parses to null; whitespace variation tolerated") {
    val r = Seq("POINT (1 2)", "LINESTRING (0 0, 1 1)", "garbage",
        "POINT(1 2)", "POINT ( 1  2 )", "POINT (1)")
      .toDF("wkt")
      .select(Geo.wktLng(col("wkt")).as("lng")).collect()
    r(0).getDouble(0) shouldBe 1.0
    r(1).isNullAt(0) shouldBe true
    r(2).isNullAt(0) shouldBe true
    // compact + padded forms parse like the canonical one — the same
    // tolerance contract as the POLYGON/LINESTRING parsers
    r(3).getDouble(0) shouldBe 1.0
    r(4).getDouble(0) shouldBe 1.0
    r(5).isNullAt(0) shouldBe true
  }

  test("scalar haversine agrees with the vector kernel and known distances") {
    // Paris (48.8566, 2.3522) -> London (51.5074, -0.1278) ~ 343.5 km
    val m = Seq((48.8566, 2.3522, 51.5074, -0.1278)).toDF("la", "lo", "lb", "lob")
      .select(Geo.haversineMeters(col("la"), col("lo"), col("lb"), col("lob")))
      .head().getDouble(0)
    m shouldBe 343.5e3 +- 1e3
    // agrees with Distances.haversine on the same pair (vector [lat, lng])
    val v = Seq((Seq(48.8566, 2.3522), Seq(51.5074, -0.1278))).toDF("a", "b")
      .select(Distances.haversine(col("a"), col("b"))).head().getDouble(0)
    m shouldBe v // identical formula, bit-exact
  }

  test("radiusJoin is lossless vs the cross-filter reference, exactly once") {
    // pseudo-random spread over mid and high latitudes (high lat widens
    // the longitude cell span — the lossy case a naive square grid misses)
    val pts = (0 until 120).map { i =>
      (i.toLong, ((i * 37) % 160 - 80) * 0.9, ((i * 53) % 360 - 180) * 0.95)
    }.toDF("pid", "lat", "lng")
    val pois = (0 until 25).map { i =>
      (1000L + i, ((i * 71) % 160 - 80) * 0.9, ((i * 29) % 360 - 180) * 0.95)
    }.toDF("qid", "qlat", "qlng")
    for (radius <- Seq(200000.0, 1000000.0)) {
      val got = Geo.radiusJoin(pts, "lat", "lng", pois, "qlat", "qlng", radius)
        .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = pts.crossJoin(pois)
        .filter(Geo.haversineMeters(col("lat"), col("lng"),
          col("qlat"), col("qlng")) <= radius)
        .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      withClue(s"radius $radius: ") {
        got.length shouldBe got.toSet.size // exactly-once
        got.toSet shouldBe want
        want.size should be > 0 // the comparison actually exercised pairs
      }
    }
  }

  test("nearestJoinGeo == brute-force k-NN within radius; ranks; bounded drop") {
    val pts = (0 until 120).map { i =>
      (i.toLong, ((i * 37) % 160 - 80) * 0.9, ((i * 53) % 360 - 180) * 0.95)
    }.toDF("pid", "lat", "lng")
    val pois = (0 until 25).map { i =>
      (1000L + i, ((i * 71) % 160 - 80) * 0.9, ((i * 29) % 360 - 180) * 0.95)
    }.toDF("qid", "qlat", "qlng")
    val radius = 2000000.0
    val got = Geo.nearestJoinGeo(pts, "pid", "lat", "lng",
        pois, "qlat", "qlng", "qid", radius, k = 2)
      .select("pid", "qid", "nn_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force: rank all in-radius pairs per point, keep 2
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("pid").orderBy(col("dm").asc, col("qid").asc)
    val want = pts.crossJoin(pois)
      .withColumn("dm", Geo.haversineMeters(col("lat"), col("lng"),
        col("qlat"), col("qlng")))
      .filter(col("dm") <= radius)
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= 2)
      .select("pid", "qid", "nn_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe want
    want.size should be > 0
    // bounded contract: some point has no poi within a small radius
    val small = Geo.nearestJoinGeo(pts, "pid", "lat", "lng",
      pois, "qlat", "qlng", "qid", 50000.0, k = 1)
    small.select("pid").distinct().count() should be < 120L
    // output-name clash rejected eagerly
    an[IllegalArgumentException] should be thrownBy
      Geo.nearestJoinGeo(pts.withColumn("nn_rank", lit(1)), "pid", "lat",
        "lng", pois, "qlat", "qlng", "qid", radius)
    // a caller's __graft_* working-name column survives untouched
    val marked = pts.withColumn("__graft_clat_0", lit("keep"))
    Geo.nearestJoinGeo(marked, "pid", "lat", "lng",
        pois, "qlat", "qlng", "qid", radius)
      .select("__graft_clat_0").distinct().as[String].collect()
      .toSeq shouldBe Seq("keep")
  }

  test("geodesic point buffer: vertices at exact radius, octagon measures, closure") {
    val r = 80000.0
    val ring = Seq((10.0, 20.0)).toDF("lat", "lng")
      .select(Geo.stBufferPointGeo(col("lat"), col("lng"), lit(r), 8).as("ring"),
        col("lat"), col("lng"))
    // every vertex sits exactly r great-circle meters from the center
    val devs = ring.select(explode(col("ring")).as("p"), col("lat"), col("lng"))
      .select(abs(Geo.haversineMeters(col("p.y"), col("p.x"),
        col("lat"), col("lng")) - r))
      .as[Double].collect()
    devs.length shouldBe 9
    all(devs) should be < 1e-6
    // closing vertex repeats the first exactly
    val vs = ring.select(col("ring")).as[Seq[(Double, Double)]].head()
    vs.head shouldBe vs.last
    // regular-octagon limits: area -> (n/2)sin(2π/n)r², perimeter ->
    // n·2r·sin(π/n) as r/R -> 0 (chord ≈ arc at 80 km)
    val area = ring.select(Geo.areaGeoSqMeters(col("ring"))).as[Double].head()
    val planarOct = 4.0 * math.sin(math.Pi / 4) * r * r
    math.abs(area - planarOct) / planarOct should be < 1e-3
    val perim = ring.select(Geo.lengthGeoMeters(col("ring"))).as[Double].head()
    val planarPerim = 16.0 * r * math.sin(math.Pi / 8)
    math.abs(perim - planarPerim) / planarPerim should be < 1e-3
    // high latitude: the same invariant holds where lng degrees shrink
    val hi = Seq((72.0, -150.0)).toDF("lat", "lng")
      .select(Geo.stBufferPointGeo(col("lat"), col("lng"), lit(r), 6).as("ring"),
        col("lat"), col("lng"))
      .select(explode(col("ring")).as("p"), col("lat"), col("lng"))
      .select(abs(Geo.haversineMeters(col("p.y"), col("p.x"),
        col("lat"), col("lng")) - r))
      .as[Double].collect()
    all(hi) should be < 1e-6
  }

  test("azimuthGeo/projectGeo: compass points exact, roundtrip closes, buffer uses project") {
    // cardinal bearings from the origin (ST_Azimuth convention:
    // radians clockwise from north)
    val az = Seq((0.0, 10.0, math.Pi / 2), (10.0, 0.0, 0.0),
        (0.0, -10.0, 3 * math.Pi / 2), (-10.0, 0.0, math.Pi))
      .toDF("blat", "blng", "want")
      .select(Geo.azimuthGeo(lit(0.0), lit(0.0), col("blat"), col("blng"))
        .as("az"), col("want"))
      .as[(Double, Double)].collect()
    az.foreach { case (got, want) => got shouldBe want +- 1e-12 }
    // a coincident pair has NO bearing — NULL, the PostGIS ST_Azimuth
    // convention (atan2(0,0)=0 would claim due north)
    Seq(1).toDF("one")
      .select(Geo.azimuthGeo(lit(10.0), lit(10.0), lit(10.0), lit(10.0)))
      .collect().head.isNullAt(0) shouldBe true
    // roundtrip: project then re-measure — distance and initial
    // bearing both recovered
    val rt = Seq(1).toDF("one")
      .select(Geo.projectGeo(lit(35.0), lit(20.0), lit(500000.0), lit(1.2)).as("p"))
      .select(Geo.haversineMeters(lit(35.0), lit(20.0),
          col("p.y"), col("p.x")).as("d"),
        Geo.azimuthGeo(lit(35.0), lit(20.0), col("p.y"), col("p.x")).as("a"))
      .as[(Double, Double)].head()
    rt._1 shouldBe 500000.0 +- 1e-6
    rt._2 shouldBe 1.2 +- 1e-12
    // SQL surface + WKT round-trip
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT st_azimuth_geo('POINT (0 0)', 'POINT (10 0)')")
      .as[Double].head() shouldBe (math.Pi / 2) +- 1e-12
    val d = spark.sql(
      """SELECT st_distance_geo('POINT (20 35)',
        |  st_project_geo(35.0, 20.0, 75000.0, 0.7))""".stripMargin)
      .as[Double].head()
    d shouldBe 75000.0 +- 1e-6
  }

  test("areaGeoSqMeters is antimeridian-safe: 180° lng shift leaves measures unchanged") {
    // rings centered near lng 0, shifted half a world east and
    // re-wrapped into [-180, 180): the shifted coordinates JUMP across
    // ±180° mid-ring (…179.8, −179.9…), so every seam edge exercises
    // the Δλ wrap — without it the crossing edges integrate ±2π jumps
    // (the world-complement area)
    val rings = Seq(
      Geo.stBufferPointGeo(lit(35.0), lit(0.4), lit(60000.0), 8),
      Geo.stBufferPointGeo(lit(-10.0), lit(-0.2), lit(250000.0), 6))
    rings.foreach { ring =>
      val df = Seq(1).toDF("one").select(ring.as("ring"))
      def shiftLng(r: org.apache.spark.sql.Column) = transform(r, p =>
        struct((pmod(p.getField("x") + 360.0, lit(360.0)) - 180.0).as("x"),
          p.getField("y").as("y")))
      // the shifted ring really does straddle the seam
      val sides = df.select(shiftLng(col("ring")).as("r"))
        .select(explode(col("r")).as("p"))
        .select(signum(col("p.x"))).as[Double].collect().toSet
      sides should contain allOf (1.0, -1.0)
      val base = df.select(Geo.areaGeoSqMeters(col("ring")).as("a"),
        Geo.lengthGeoMeters(col("ring")).as("p")).head()
      val shifted = df.select(Geo.areaGeoSqMeters(shiftLng(col("ring"))).as("a"),
        Geo.lengthGeoMeters(shiftLng(col("ring"))).as("p")).head()
      math.abs(shifted.getDouble(0) - base.getDouble(0)) /
        base.getDouble(0) should be < 1e-9
      math.abs(shifted.getDouble(1) - base.getDouble(1)) /
        base.getDouble(1) should be < 1e-9
    }
    // direct seam ring: ~1°×1° quad across ±180° must measure ~1.2e10 m²
    // (the small patch), never the world complement
    val quad = Seq(1).toDF("one").select(array(
      struct(lit(179.5).as("x"), lit(0.0).as("y")),
      struct(lit(-179.5).as("x"), lit(0.0).as("y")),
      struct(lit(-179.5).as("x"), lit(1.0).as("y")),
      struct(lit(179.5).as("x"), lit(1.0).as("y")),
      struct(lit(179.5).as("x"), lit(0.0).as("y"))).as("ring"))
    val a = quad.select(Geo.areaGeoSqMeters(col("ring"))).as[Double].head()
    a should be > 1.0e10
    a should be < 1.5e10
  }

  test("spheroid option scales measures by the documented WGS84 radii ratios") {
    val wkt = lit("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
    val df = Seq(1).toDF("one")
    val row = df.select(
      Geo.stAreaGeo(wkt).as("a"), Geo.stAreaGeo(wkt, spheroid = true).as("as"),
      Geo.stLengthGeo(wkt).as("l"),
      Geo.stLengthGeo(wkt, spheroid = true).as("ls")).head()
    val ra = Geo.AuthalicRadiusMeters / Geo.SphereRadiusMeters
    val rr = Geo.RectifyingRadiusMeters / Geo.SphereRadiusMeters
    row.getDouble(1) / row.getDouble(0) shouldBe (ra * ra) +- 1e-12
    row.getDouble(3) / row.getDouble(2) shouldBe rr +- 1e-12
    // the corrections point the documented directions: authalic area up
    // (Ra > R), rectifying length down (Rr < R)
    row.getDouble(1) should be > row.getDouble(0)
    row.getDouble(3) should be < row.getDouble(2)
  }

  test("radiusJoin wraps the antimeridian: pairs straddling ±180° join exactly once") {
    // 179.9° vs −179.9° is a 0.2° (~22 km) gap across the seam — a
    // non-wrapping grid puts them at opposite ends of the ring
    val pts = Seq((1L, 10.0, 179.9), (2L, 10.0, 170.0)).toDF("pid", "lat", "lng")
    val pois = Seq((100L, 10.0, -179.9)).toDF("qid", "qlat", "qlng")
    val got = Geo.radiusJoin(pts, "lat", "lng", pois, "qlat", "qlng", 25000.0)
      .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((1L, 100L)) // seam pair found, exactly once

    // full-ring case: near-polar poi whose widened span laps the ring —
    // every in-radius point joins exactly once, no duplicate cells
    val ringPts = (0 until 12).map(i => (i.toLong, 85.0, i * 30.0 - 180.0))
      .toDF("pid", "lat", "lng")
    val ringPoi = Seq((200L, 85.0, 0.0)).toDF("qid", "qlat", "qlng")
    val radius = 600000.0
    val rg = Geo.radiusJoin(ringPts, "lat", "lng", ringPoi, "qlat", "qlng",
        radius, maxCellsPerRow = 100000L)
      .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val rw = ringPts.crossJoin(ringPoi)
      .filter(Geo.haversineMeters(col("lat"), col("lng"),
        col("qlat"), col("qlng")) <= radius)
      .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rg.length shouldBe rg.toSet.size
    rg.toSet shouldBe rw
    rw.size should be > 1
  }

  test("radiusJoin property: seam-heavy random corpora match the cross-filter at 3 radii") {
    // deterministic LCG so every run checks the same corpora; longitudes
    // biased toward ±180 so wrap-around pairs actually occur
    def lcg(seed: Long): Iterator[Double] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
        .map(s => (s >>> 11).toDouble / (1L << 53).toDouble)
    for (seed <- 1L to 3L) {
      val rnd = lcg(seed)
      def lng() = { val u = rnd.next(); val v = rnd.next()
        // half the mass within 3 degrees of the seam
        if (u < 0.5) (if (v < 0.5) -180.0 + v * 6 else 180.0 - (v - 0.5) * 6)
        else v * 360.0 - 180.0 }
      def lat() = rnd.next() * 160.0 - 80.0
      val pts = (0 until 80).map(i => (i.toLong, lat(), lng())).toDF("pid", "lat", "lng")
      val pois = (0 until 15).map(i => (100L + i, lat(), lng())).toDF("qid", "qlat", "qlng")
      for (radius <- Seq(50000.0, 300000.0, 1500000.0)) {
        val got = Geo.radiusJoin(pts, "lat", "lng", pois, "qlat", "qlng", radius,
            maxCellsPerRow = 100000L)
          .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1)))
        val want = pts.crossJoin(pois)
          .filter(Geo.haversineMeters(col("lat"), col("lng"),
            col("qlat"), col("qlng")) <= radius)
          .select("pid", "qid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        withClue(s"seed $seed radius $radius: ") {
          got.length shouldBe got.toSet.size // exactly once
          got.toSet shouldBe want            // lossless incl. seam pairs
        }
      }
    }
  }

  test("radiusJoin plans as a hash equi-join and guards polar fan-out") {
    val pts = Seq((1L, 10.0, 10.0)).toDF("pid", "lat", "lng")
    val pois = Seq((2L, 10.1, 10.1)).toDF("qid", "qlat", "qlng")
    val plan = Geo.radiusJoin(pts, "lat", "lng", pois, "qlat", "qlng", 50000.0)
      .queryExecution.executedPlan.toString
    plan should not include "NestedLoop"
    plan should not include "CartesianProduct"
    // a POI at 89.9 degrees: the 1/cos span explodes past the cap
    val polar = Seq((3L, 89.9, 0.0)).toDF("qid", "qlat", "qlng")
    val ex = intercept[Exception] {
      Geo.radiusJoin(pts, "lat", "lng", polar, "qlat", "qlng", 500000.0,
        maxCellsPerRow = 16L).count()
    }
    ex.getMessage should include("spans more than 16 cells")
  }

  test("radius predicate filters and pushes like a normal filter") {
    val pts = Seq((1L, 48.8566, 2.3522), (2L, 51.5074, -0.1278), (3L, 40.7128, -74.006))
      .toDF("id", "lat", "lng")
    val near = pts.filter(Geo.withinRadius(col("lat"), col("lng"),
        lit(48.8566), lit(2.3522), lit(400000.0)))
      .select("id").as[Long].collect().toSet
    near shouldBe Set(1L, 2L) // Paris itself + London; NYC excluded
  }
}

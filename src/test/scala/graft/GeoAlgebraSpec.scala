package graft

import org.apache.spark.sql.functions._
import graft.operators.GeoAlgebra

/** Planar geometry algebra: WKT round-trip, raycast containment,
  * measures, segment intersection, buffer, and the grid containment
  * join vs the cross-filter reference. */
class GeoAlgebraSpec extends SparkSpec {
  import spark.implicits._

  // unit square, closed
  private val squareWkt = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
  // non-convex star (same as the battery literal, scaled down)
  private val starWkt = "POLYGON ((7 0, 1 1, 0 7, -1 1, -7 0, -1 -1, 0 -7, 1 -1, 7 0))"

  private def one(wkt: String) = Seq(wkt).toDF("wkt")
    .select(GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))

  test("WKT polygon parse/emit round-trips the exact doubles") {
    val back = one(squareWkt)
      .select(GeoAlgebra.wktPolygon(col("ring"))).as[String].head()
    // emit prints shortest-repr doubles: 0 -> 0.0
    back shouldBe "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
    val reparsed = Seq(back).toDF("wkt")
      .select(GeoAlgebra.stArea(GeoAlgebra.wktPolygonRing(col("wkt"))))
      .as[Double].head()
    reparsed shouldBe 16.0
  }

  test("malformed WKT parses to null, not an error") {
    Seq("POINT (1 2)", "garbage").toDF("wkt")
      .select(GeoAlgebra.wktPolygonRing(col("wkt")))
      .collect().foreach(r => assert(r.isNullAt(0)))
  }

  test("stContainsWkt: holes subtract, multipolygon parts union, malformed null") {
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    val multi = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 8 5, 8 8, 5 8, 5 5)))"
    val mpHoles = "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(3 3, 7 3, 7 7, 3 7, 3 3)), ((20 20, 22 20, 22 22, 20 22, 20 20)))"
    def in(wkt: String, x: Double, y: Double): Boolean =
      Seq((x, y)).toDF("x", "y")
        .select(GeoAlgebra.stContainsWkt(lit(wkt), col("x"), col("y")))
        .as[Boolean].head()
    in(donut, 1.0, 1.0) shouldBe true    // shell, outside hole
    in(donut, 5.0, 5.0) shouldBe false   // inside the hole
    in(donut, 12.0, 5.0) shouldBe false  // outside entirely
    in(multi, 1.0, 1.0) shouldBe true    // first part
    in(multi, 6.0, 6.0) shouldBe true    // second part
    in(multi, 3.5, 3.5) shouldBe false   // between parts
    in(mpHoles, 5.0, 5.0) shouldBe false // hole inside a multi part
    in(mpHoles, 1.0, 1.0) shouldBe true
    in(mpHoles, 21.0, 21.0) shouldBe true
    // malformed input -> null rings -> null verdict (not an error)
    Seq(("garbage", 0.0, 0.0)).toDF("w", "x", "y")
      .select(GeoAlgebra.stContainsWkt(col("w"), col("x"), col("y")))
      .collect().head.isNullAt(0) shouldBe true
    // single-ring POLYGON agrees with the single-ring kernel
    in(squareWkt, 2.0, 2.0) shouldBe true
    in(squareWkt, 5.0, 2.0) shouldBe false
  }

  test("hole-aware area/length: holes subtract from area, add to boundary") {
    val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
    val multi = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 8 5, 8 8, 5 8, 5 5)))"
    val r = Seq((donut, multi)).toDF("d", "m").select(
      GeoAlgebra.stAreaWkt(col("d")), GeoAlgebra.stLengthWkt(col("d")),
      GeoAlgebra.stAreaWkt(col("m")), GeoAlgebra.stLengthWkt(col("m")),
      GeoAlgebra.stAreaWkt(lit(squareWkt)),
      GeoAlgebra.stAreaWkt(lit("junk"))).head()
    r.getDouble(0) shouldBe 96.0   // 100 - 4
    r.getDouble(1) shouldBe 48.0   // 40 + 8
    r.getDouble(2) shouldBe 13.0   // 4 + 9
    r.getDouble(3) shouldBe 20.0   // 8 + 12
    r.getDouble(4) shouldBe 16.0   // plain polygon unchanged
    r.isNullAt(5) shouldBe true
  }

  test("contains: convex membership matches the half-plane definition") {
    val pts = for (x <- -1 to 5; y <- -1 to 5) yield (x + 0.5, y + 0.5)
    val got = pts.toDF("x", "y")
      .withColumn("ring", GeoAlgebra.wktPolygonRing(lit(squareWkt)))
      .filter(GeoAlgebra.stContains(col("ring"), col("x"), col("y")))
      .select("x", "y").as[(Double, Double)].collect().toSet
    val want = pts.filter { case (x, y) => x > 0 && x < 4 && y > 0 && y < 4 }.toSet
    got shouldBe want
  }

  test("contains: non-convex star includes spikes, excludes notches") {
    val cases = Seq(
      (0.0, 0.1, true),   // center-ish
      (5.0, 0.1, true),   // inside the +x spike
      (3.0, 3.0, false),  // notch between +x and +y spikes
      (0.1, 5.0, true),   // +y spike
      (-5.0, -0.1, true), // -x spike
      (8.0, 0.0, false))  // outside entirely
    val got = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .withColumn("ring", GeoAlgebra.wktPolygonRing(lit(starWkt)))
      .select(GeoAlgebra.stContains(col("ring"), col("x"), col("y")))
      .as[Boolean].collect()
    got.toSeq shouldBe cases.map(_._3)
  }

  test("area / perimeter / centroid / envelope of known shapes") {
    val row = one(squareWkt).select(
      GeoAlgebra.stArea(col("ring")),
      GeoAlgebra.stLength(col("ring")),
      GeoAlgebra.stCentroid(col("ring")).getField("x"),
      GeoAlgebra.stCentroid(col("ring")).getField("y"),
      GeoAlgebra.stEnvelope(col("ring")).getField("xmax")).head()
    row.getDouble(0) shouldBe 16.0
    row.getDouble(1) shouldBe 16.0
    row.getDouble(2) shouldBe 2.0
    row.getDouble(3) shouldBe 2.0
    row.getDouble(4) shouldBe 4.0
    // signed area: the square above is counter-clockwise
    one(squareWkt).select(GeoAlgebra.stSignedArea(col("ring")))
      .as[Double].head() shouldBe 16.0
  }

  test("area is translation-invariant; centroid translates") {
    val shifted = "POLYGON ((10 20, 14 20, 14 24, 10 24, 10 20))"
    val a = one(shifted).select(GeoAlgebra.stArea(col("ring")),
      GeoAlgebra.stCentroid(col("ring")).getField("x")).head()
    a.getDouble(0) shouldBe 16.0
    a.getDouble(1) shouldBe 12.0
  }

  test("stDistance: zero inside, exact boundary distance outside") {
    val d = Seq((2.0, 2.0), (6.0, 2.0), (-3.0, 0.0), (7.0, 8.0))
      .toDF("x", "y")
      .withColumn("ring", GeoAlgebra.wktPolygonRing(lit(squareWkt)))
      .select(GeoAlgebra.stDistance(col("ring"), col("x"), col("y")))
      .as[Double].collect()
    d(0) shouldBe 0.0
    d(1) shouldBe 2.0 // right of the x=4 edge
    d(2) shouldBe 3.0 // left of x=0 (projects onto the corner segment)
    d(3) shouldBe math.sqrt(9.0 + 16.0) // corner (4,4) is nearest
  }

  test("stDistanceLine: clamped projection onto segment interiors and endpoints") {
    val line = GeoAlgebra.wktLineString(lit("LINESTRING (0 0, 10 0, 10 10)"))
    val d = Seq((5.0, 3.0), (-4.0, 3.0), (13.0, 14.0)).toDF("x", "y")
      .select(GeoAlgebra.stDistanceLine(line, col("x"), col("y")))
      .as[Double].collect()
    d(0) shouldBe 3.0
    d(1) shouldBe 5.0 // endpoint (0,0)
    d(2) shouldBe 5.0 // endpoint (10,10)
  }

  test("intersects: crossing, containment, disjoint") {
    val a = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    val cases = Seq(
      ("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))", true),   // proper overlap
      ("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", true),   // fully inside
      ("POLYGON ((-2 -2, 7 -2, 7 7, -2 7, -2 -2))", true), // contains a
      ("POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))", false)) // disjoint
    val got = cases.map(_._1).toDF("wkt")
      .select(GeoAlgebra.stIntersects(
        GeoAlgebra.wktPolygonRing(lit(a)),
        GeoAlgebra.wktPolygonRing(col("wkt"))))
      .as[Boolean].collect()
    got.toSeq shouldBe cases.map(_._2)
  }

  test("buffer: off-axis n-gon, area approaches the disc from inside") {
    val r = 2.0
    val row = Seq((0.0, 0.0)).toDF("x", "y")
      .select(GeoAlgebra.stArea(GeoAlgebra.stBufferPoint(col("x"), col("y"),
        lit(r), 16)).as("a"))
      .as[Double].head()
    val disc = math.Pi * r * r
    val inscribed16 = 0.5 * 16 * r * r * math.sin(2 * math.Pi / 16)
    row shouldBe inscribed16 +- 1e-9
    assert(row < disc && row > 0.9 * disc)
    // rotation keeps every vertex off the axes
    val ring = Seq((0.0, 0.0)).toDF("x", "y")
      .select(GeoAlgebra.stBufferPoint(col("x"), col("y"), lit(r), 8))
      .head().getSeq[org.apache.spark.sql.Row](0)
    ring.foreach { v =>
      assert(math.abs(v.getDouble(0)) > 1e-9 && math.abs(v.getDouble(1)) > 1e-9)
    }
  }

  test("codegen raycast/dist2 kernels == the interpreted HOF folds, bit-for-bit") {
    // dense point sweep over the star: interiors, spikes, notches,
    // boundary-adjacent and exactly-on-vertex points
    val pts = (for (xi <- -32 to 32; yi <- -16 to 16 by 2)
      yield (xi * 0.25, yi * 0.5)).toDF("x", "y")
      .withColumn("ring", GeoAlgebra.wktPolygonRing(lit(starWkt)))
    val mismatch = pts.filter(
      GeoAlgebra.stContains(col("ring"), col("x"), col("y")) =!=
        GeoAlgebra.stContainsFold(col("ring"), col("x"), col("y"))).count()
    mismatch shouldBe 0L
    val line = GeoAlgebra.wktLineString(lit("LINESTRING (0 0, 6 8, 12 2, 18 14, 24 6)"))
    val d2 = pts.select(
      graft.functions.GeoKernel(graft.functions.GeoKernel.Dist2, line, col("x"), col("y")).as("k"),
      GeoAlgebra.boundaryDist2Fold(line, col("x"), col("y")).as("f"))
    d2.filter(col("k") =!= col("f")).count() shouldBe 0L
    // on_boundary kernel == its fold on the same sweep (the 0.25/0.5
    // lattice lands points exactly on star edges and vertices)
    val ob = pts.filter(
      GeoAlgebra.stOnBoundary(col("ring"), col("x"), col("y")) =!=
        GeoAlgebra.stOnBoundaryFold(col("ring"), col("x"), col("y"))).count()
    ob shouldBe 0L
    pts.filter(GeoAlgebra.stOnBoundary(col("ring"), col("x"), col("y")))
      .count() should be > 0L // the sweep actually hits boundary points
    // the kernel reaches the executed plan over a REAL scan (a local
    // relation would be constant-folded away) — not CodegenFallback
    val plan = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .withColumn("ring", GeoAlgebra.wktPolygonRing(lit(starWkt)))
      .filter(GeoAlgebra.stContains(col("ring"),
        col("c_acctbal"), col("c_acctbal")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("poly_contains"))
  }

  test("poly_contains / poly_dist2 registered as SQL functions") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT poly_contains(array(struct(0.0d AS x, 0.0d AS y), struct(4.0d AS x, 0.0d AS y),
        |  struct(4.0d AS x, 4.0d AS y), struct(0.0d AS x, 4.0d AS y),
        |  struct(0.0d AS x, 0.0d AS y)), 2.0, 2.0) AS c,
        |  poly_dist2(array(struct(0.0d AS x, 0.0d AS y), struct(4.0d AS x, 0.0d AS y)),
        |  2.0, 3.0) AS d
        |""".stripMargin).head()
    r.getBoolean(0) shouldBe true
    r.getDouble(1) shouldBe 9.0
  }

  test("convex clip: known areas, symmetry halving, containment, disjoint") {
    def clipArea(subj: String, clip: String): Double =
      Seq((subj, clip)).toDF("s", "c")
        .select(GeoAlgebra.stIntersectionArea(
          GeoAlgebra.wktPolygonRing(col("s")),
          GeoAlgebra.wktPolygonRing(col("c"))))
        .as[Double].head()
    // overlapping axis rectangles: exact overlap area
    clipArea("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((2 1, 10 1, 10 3, 2 3, 2 1))") shouldBe 4.0 // [2,4]x[1,3]
    // star (area 28) clipped by the right half square: symmetric half
    clipArea(starWkt, "POLYGON ((0 -10, 10 -10, 10 10, 0 10, 0 -10))") shouldBe 14.0
    // subject fully inside the clip window: full star area
    clipArea(starWkt, "POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))") shouldBe 28.0
    // clip window fully inside the subject: window area
    clipArea(squareWkt, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") shouldBe 1.0
    // disjoint: empty
    clipArea(squareWkt, "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))") shouldBe 0.0
    // single-point touch: degenerate, zero area
    clipArea("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
      "POLYGON ((4 4, 8 4, 8 8, 4 8, 4 4))") shouldBe 0.0
  }

  test("convex clip: fold through all four half-planes yields the hexagon") {
    // diamond r=4 at (12,10) clipped to [4,18]x[6.5,13.5]: y-tips cut
    val got = Seq(1).toDF("i").select(GeoAlgebra.stClipConvex(
        GeoAlgebra.wktPolygonRing(lit(
          "POLYGON ((16 10, 12 14, 8 10, 12 6, 16 10))")),
        GeoAlgebra.wktPolygonRing(lit(
          "POLYGON ((4 6.5, 18 6.5, 18 13.5, 4 13.5, 4 6.5))"))))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    // hexagon: diamond verts (16,10),(8,10) survive; tips replaced by
    // crossings of the slope-±1 edges with y = 13.5 and y = 6.5
    got shouldBe Set((16.0, 10.0), (8.0, 10.0),
      (12.5, 13.5), (11.5, 13.5), (11.5, 6.5), (12.5, 6.5))
    // area via the independent trapezoid decomposition:
    // full diamond 32 minus two tips of height 0.5 (area 2*(0.5^2)) each
    Seq(1).toDF("i").select(GeoAlgebra.stIntersectionArea(
        GeoAlgebra.wktPolygonRing(lit(
          "POLYGON ((16 10, 12 14, 8 10, 12 6, 16 10))")),
        GeoAlgebra.wktPolygonRing(lit(
          "POLYGON ((4 6.5, 18 6.5, 18 13.5, 4 13.5, 4 6.5))"))))
      .as[Double].head() shouldBe (32.0 - 2 * 0.25)
  }

  test("contains matches java.awt Path2D (even-odd) on random star polygons") {
    // independent reference implementation from the JDK: Path2D with
    // WIND_EVEN_ODD. Star-shaped polygons (random radii at sorted
    // angles) are simple by construction; probe points keep a margin
    // from the boundary so the two implementations' last-ulp behavior
    // cannot differ on the in/out verdict.
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val n = 5 + rnd.nextInt(8)
      val angles = Seq.fill(n)(rnd.nextDouble() * 2 * math.Pi).sorted
      val verts = angles.map { a =>
        val r = 1.0 + rnd.nextDouble() * 9.0
        (r * math.cos(a), r * math.sin(a))
      }
      val path = new java.awt.geom.Path2D.Double(
        java.awt.geom.Path2D.WIND_EVEN_ODD)
      path.moveTo(verts.head._1, verts.head._2)
      verts.tail.foreach { case (x, y) => path.lineTo(x, y) }
      path.closePath()
      val wkt = "POLYGON ((" + (verts :+ verts.head)
        .map { case (x, y) => s"$x $y" }.mkString(", ") + "))"
      def segDist(px: Double, py: Double): Double =
        (verts :+ verts.head).sliding(2).map { case Seq((ax, ay), (bx, by)) =>
          val (dx, dy) = (bx - ax, by - ay)
          val len2 = dx * dx + dy * dy
          val t = math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
          math.hypot(px - (ax + t * dx), py - (ay + t * dy))
        }.min
      val probes = Seq.fill(200)((rnd.nextDouble() * 22 - 11, rnd.nextDouble() * 22 - 11))
        .filter { case (x, y) => segDist(x, y) > 1e-6 }
      val got = probes.toDF("x", "y")
        .select(GeoAlgebra.stContains(
          GeoAlgebra.wktPolygonRing(lit(wkt)), col("x"), col("y")))
        .as[Boolean].collect()
      probes.zip(got).foreach { case ((x, y), in) =>
        assert(in == path.contains(x, y),
          s"disagree at ($x, $y) for $wkt")
      }
    }
  }

  test("st_within / st_dwithin predicates through the Boolean front door") {
    import graft.operators.{BooleanPredicates, Geo}
    val pts = Seq((1L, 2.0, 2.0), (2L, 3.5, 0.5), (3L, 20.0, 20.0))
      .toDF("pid", "x", "y")
      .withColumn("loc", Geo.wktPoint(col("x"), col("y")))
    def ids(p: BooleanPredicates.Predicate): Seq[Long] =
      pts.filter(BooleanPredicates.toColumn(p)).select("pid")
        .as[Long].collect().toSeq
    ids(BooleanPredicates.Predicate("loc", "st_within",
      Seq(squareWkt))) shouldBe Seq(1L, 2L)
    // point form: within 1.0 of POINT (2 2) — only pid 1
    ids(BooleanPredicates.Predicate("loc", "st_dwithin",
      Seq("POINT (2 2)", "1.0"))) shouldBe Seq(1L)
    // linestring form: the x-axis within 1.0 — only pid 2 (y=0.5)
    ids(BooleanPredicates.Predicate("loc", "st_dwithin",
      Seq("LINESTRING (0 0, 30 0)", "1.0"))) shouldBe Seq(2L)
    // polygon form: distance 0 inside, boundary distance outside
    ids(BooleanPredicates.Predicate("loc", "st_dwithin",
      Seq(squareWkt, "0.9"))) shouldBe Seq(1L, 2L)
    // degenerate: missing distance arg fails loudly
    intercept[IllegalArgumentException] {
      BooleanPredicates.toColumn(
        BooleanPredicates.Predicate("loc", "st_dwithin", Seq(squareWkt)))
    }
    // holes honored through the predicate path: pid 1 (2,2) falls in
    // the donut's hole, pid 2 stays in the shell
    ids(BooleanPredicates.Predicate("loc", "st_within", Seq(
      "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))"
    ))) shouldBe Seq(2L)
    // st_covers: a point ON the boundary counts (pid 4 sits on the
    // square's bottom edge)
    val withEdge = pts.unionByName(Seq((4L, 2.0, 0.0)).toDF("pid", "x", "y")
      .withColumn("loc", Geo.wktPoint(col("x"), col("y"))))
    withEdge.filter(BooleanPredicates.toColumn(BooleanPredicates.Predicate(
        "loc", "st_covers", Seq(squareWkt))))
      .select("pid").as[Long].collect().toSeq.sorted shouldBe Seq(1L, 2L, 4L)
    // st_dwithin_geo: one degree of latitude ≈ 111.19 km on the sphere
    val geoPts = Seq((1L, "POINT (0 0)"), (2L, "POINT (0 1)"),
      (3L, "POINT (0 2)")).toDF("pid", "loc")
    geoPts.filter(BooleanPredicates.toColumn(BooleanPredicates.Predicate(
        "loc", "st_dwithin_geo", Seq("POINT (0 0)", "120000"))))
      .select("pid").as[Long].collect().toSeq shouldBe Seq(1L, 2L)
  }

  test("containsJoin matches the cross-filter reference, joins each pair once") {
    val pts = (1 to 400).map(i => (i.toLong, (i % 29) * 0.7, (i % 23) * 0.9))
      .toDF("pid", "x", "y")
    val polys = Seq(
      (1L, "POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))"),
      (2L, "POLYGON ((5 5, 20 5, 20 20, 5 20, 5 5))"),
      (3L, "POLYGON ((17 0, 11 1, 10 7, 9 1, 3 0, 9 -1, 10 -7, 11 -1, 17 0))"))
      .toDF("gid", "wkt")
      .select(col("gid"), GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
    val got = GeoAlgebra.containsJoin(pts, "x", "y", polys, "ring", cell = 3.0)
      .select("pid", "gid").as[(Long, Long)].collect()
    val want = pts.crossJoin(polys)
      .filter(GeoAlgebra.stContains(col("ring"), col("x"), col("y")))
      .select("pid", "gid").as[(Long, Long)].collect().toSet
    got.length shouldBe got.toSet.size // exactly-once
    got.toSet shouldBe want
    want.size should be > 100 // the fixture actually exercises containment
  }

  test("nearestJoin == brute-force NN within maxDist; k>1 ranks; bounded drop") {
    val pts = (1 to 300).map(i => (i.toLong, (i % 31) * 0.7, (i % 27) * 0.9))
      .toDF("pid", "x", "y")
    val pois = (1 to 40).map(j => (100L + j, (j % 13) * 1.7, (j % 11) * 2.3))
      .toDF("poi", "qx", "qy")
    val got = GeoAlgebra.nearestJoin(pts, "pid", "x", "y",
        pois, "qx", "qy", "poi", maxDist = 4.0, k = 2)
      .select("pid", "poi", "nn_rank").as[(Long, Long, Int)].collect().toSet
    // brute force: all pairs within 4.0, rank by (d2, poi), keep top 2
    import org.apache.spark.sql.expressions.Window
    val d2 = (col("x") - col("qx")) * (col("x") - col("qx")) +
      (col("y") - col("qy")) * (col("y") - col("qy"))
    val want = pts.crossJoin(pois).withColumn("d2", d2)
      .filter(col("d2") <= 16.0)
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(col("d2"), col("poi"))))
      .filter(col("rn") <= 2)
      .select("pid", "poi", "rn").as[(Long, Long, Int)].collect().toSet
    got shouldBe want
    want.size should be > 100
    // some point has NO poi within range and drops (bounded contract)
    val covered = got.map(_._1)
    assert(covered.size < 300)
  }

  test("containsJoin plans a hash equi-join on the tile key, never NLJ") {
    val pts = Seq((1L, 1.0, 1.0)).toDF("pid", "x", "y")
    val polys = Seq((1L, squareWkt)).toDF("gid", "wkt")
      .select(col("gid"), GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
    val plan = GeoAlgebra.containsJoin(pts, "x", "y", polys, "ring", cell = 2.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Join"))
  }

  test("tolerant WKT parse: compact and extra-spaced forms equal canonical") {
    val canonical = one(squareWkt).select(GeoAlgebra.stArea(col("ring")))
      .as[Double].head()
    Seq("POLYGON((0 0,4 0,4 4,0 4,0 0))",
        "POLYGON (( 0 0 ,  4 0 , 4 4 , 0 4 , 0 0 ))").foreach { w =>
      one(w).select(GeoAlgebra.stArea(col("ring"))).as[Double].head() shouldBe canonical
    }
    // compact MULTIPOLYGON through wktRings
    val m = Seq("MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((5 5,8 5,8 8,5 8,5 5)))")
      .toDF("wkt")
    m.select(GeoAlgebra.stAreaWkt(col("wkt"))).as[Double].head() shouldBe 13.0
  }

  test("coordinate-level garbage nulls the chain instead of throwing (ANSI)") {
    // non-numeric coordinate, missing coordinate, empty vertex
    val bad = Seq("POLYGON ((0 0, x 0, 4 4, 0 0))",
      "POLYGON ((0 0, 4, 4 4, 0 0))",
      "LINESTRING (0 0, oops 3)")
    bad.take(2).toDF("wkt").select(GeoAlgebra.wktPolygonRing(col("wkt")))
      .collect().foreach(r => assert(r.isNullAt(0)))
    bad.take(2).toDF("wkt").select(GeoAlgebra.wktRings(col("wkt")))
      .collect().foreach(r => assert(r.isNullAt(0)))
    Seq(bad(2)).toDF("wkt").select(GeoAlgebra.wktLineString(col("wkt")))
      .collect().foreach(r => assert(r.isNullAt(0)))
    // and the measures follow: null, not an exception
    bad.take(2).toDF("wkt").select(GeoAlgebra.stAreaWkt(col("wkt")))
      .collect().foreach(r => assert(r.isNullAt(0)))
  }

  test("stCovers: boundary-inclusive — edges and vertices count, outside doesn't") {
    val ring = GeoAlgebra.wktPolygonRing(lit(squareWkt))
    val pts = Seq(
      (2.0, 0.0, true),   // on bottom edge
      (4.0, 4.0, true),   // vertex
      (0.0, 3.0, true),   // on left edge
      (2.0, 2.0, true),   // interior
      (4.5, 2.0, false),  // outside, collinear with nothing
      (5.0, 0.0, false),  // outside but collinear with the bottom edge line
      (-1.0, 0.0, false)) // outside, collinear with bottom edge, other side
      .toDF("px", "py", "want")
    pts.select(GeoAlgebra.stCovers(ring, col("px"), col("py")).as("got"),
        col("want")).collect()
      .foreach(r => r.getBoolean(0) shouldBe r.getBoolean(1))
    // covers ⊇ contains everywhere on a lattice sweep
    val sweep = (0 to 20).flatMap(i => (0 to 20).map(j => (i * 0.25, j * 0.25)))
      .toDF("px", "py")
    sweep.filter(GeoAlgebra.stContains(ring, col("px"), col("py")) &&
        !GeoAlgebra.stCovers(ring, col("px"), col("py"))).count() shouldBe 0L
  }

  test("stCoversWkt: a hole's boundary is covered, its interior is not") {
    val donut = lit(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))")
    val pts = Seq(
      (3.0, 5.0, true),   // on the hole's boundary — covered (PostGIS)
      (5.0, 5.0, false),  // inside the hole — not covered
      (1.0, 1.0, true),   // in the annulus
      (10.0, 10.0, true), // outer vertex
      (11.0, 5.0, false)) // outside
      .toDF("px", "py", "want")
    pts.select(GeoAlgebra.stCoversWkt(donut, col("px"), col("py")).as("got"),
        col("want")).collect()
      .foreach(r => r.getBoolean(0) shouldBe r.getBoolean(1))
  }

  test("stCentroidWkt: holes subtract moments, multipolygon parts sum") {
    def cOf(wkt: String): (Double, Double) = {
      val c = Seq(wkt).toDF("wkt")
        .select(GeoAlgebra.stCentroidWkt(col("wkt")).as("c"))
        .select(col("c.x"), col("c.y")).head()
      (c.getDouble(0), c.getDouble(1))
    }
    // single ring: plain centroid
    cOf(squareWkt) shouldBe ((2.0, 2.0))
    // symmetric hole: centroid unmoved
    cOf("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(4 4, 6 4, 6 6, 4 6, 4 4))") shouldBe ((5.0, 5.0))
    // offset hole: moments subtract — (100·5 − 4·7) / 96
    val (hx, hy) = cOf("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), " +
      "(6 6, 8 6, 8 8, 6 8, 6 6))")
    hx shouldBe ((100.0 * 5 - 4.0 * 7) / 96.0 +- 1e-12)
    hy shouldBe hx
    // multipolygon: area-weighted part centroids — (4·1 + 16·6)/20
    val (mx, my) = cOf("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), " +
      "((4 0, 8 0, 8 4, 4 4, 4 0)))")
    mx shouldBe ((4.0 * 1 + 16.0 * 6) / 20.0 +- 1e-12)
    my shouldBe ((4.0 * 1 + 16.0 * 2) / 20.0 +- 1e-12)
    // and through SQL registration
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT c.x FROM (SELECT st_centroid('POLYGON ((0 0, 10 0, " +
        "10 10, 0 10, 0 0), (6 6, 8 6, 8 8, 6 8, 6 6))') AS c)")
      .as[Double].head() shouldBe (hx +- 1e-12)
  }

  test("st_covers / st_area_geo / st_length_geo / st_dwithin_geo in SQL") {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT st_covers('$squareWkt', 2.0, 0.0)")
      .as[Boolean].head() shouldBe true
    spark.sql(s"SELECT st_covers('$squareWkt', 5.0, 0.0)")
      .as[Boolean].head() shouldBe false
    // quarter-meridian: equator to pole along a meridian = π·R/2
    val quarter = spark.sql("SELECT st_length_geo('LINESTRING (0 0, 0 90)')")
      .as[Double].head()
    quarter shouldBe (math.Pi * 6371000.0 / 2.0 +- 1e-3)
    val d = spark.sql(
      "SELECT st_dwithin_geo('POINT (0 0)', 'POINT (0 1)', 111200.0)")
      .as[Boolean].head()
    d shouldBe true // one degree of latitude ≈ 111.195 km
    spark.sql("SELECT st_area_geo('POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')")
      .as[Double].head() should be > 0.0
    // buffer constructors emit WKT that round-trips through the parsers
    val bufArea = spark.sql(
      "SELECT st_area(st_buffer_point(3.0, 4.0, 2.0))").as[Double].head()
    bufArea shouldBe (4.0 * math.sin(math.Pi / 4) * 4.0 +- 1e-9) // octagon r=2
    val geoArea = spark.sql(
      "SELECT st_area_geo(st_buffer_point_geo(10.0, 20.0, 50000.0))")
      .as[Double].head()
    val oct = 4.0 * math.sin(math.Pi / 4) * 50000.0 * 50000.0
    math.abs(geoArea - oct) / oct should be < 1e-3
    // optional use_spheroid literal (the PostGIS ST_Area(geog, bool)
    // shape): measures scale by the documented WGS84 radii ratios
    val sq = "'POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))'"
    val r = spark.sql(
      s"""SELECT st_area_geo($sq, true) / st_area_geo($sq) AS ar,
         |  st_length_geo($sq, true) / st_length_geo($sq) AS lr""".stripMargin)
      .as[(Double, Double)].head()
    val ra = graft.operators.Geo.AuthalicRadiusMeters /
      graft.operators.Geo.SphereRadiusMeters
    r._1 shouldBe (ra * ra +- 1e-12)
    r._2 shouldBe (graft.operators.Geo.RectifyingRadiusMeters /
      graft.operators.Geo.SphereRadiusMeters +- 1e-12)
    // non-literal spheroid arg is rejected eagerly, never half-applied
    an[Exception] should be thrownBy
      spark.sql(s"SELECT st_area_geo($sq, 1 = 1)").collect()
  }

  test("geodesic measures: known great-circle values, planar limit, holes") {
    import graft.operators.Geo
    // 1° of longitude along the equator = π·R/180
    val oneDeg = Seq("LINESTRING (10 0, 11 0)").toDF("wkt")
      .select(Geo.stLengthGeo(col("wkt"))).as[Double].head()
    oneDeg shouldBe (math.Pi * 6371000.0 / 180.0 +- 1e-4)
    // small square at the equator ≈ its planar area in meters
    val mPerDeg = math.Pi * 6371000.0 / 180.0
    val sq = Seq("POLYGON ((10 0, 10.1 0, 10.1 0.1, 10 0.1, 10 0))").toDF("wkt")
    val area = sq.select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    val planar = (0.1 * mPerDeg) * (0.1 * mPerDeg)
    math.abs(area - planar) / planar should be < 1e-4
    // perimeter of the same square ≈ 4 sides (meridian sides exact, the
    // two parallel sides shrink by cos(lat) ≤ 1)
    val perim = sq.select(Geo.stLengthGeo(col("wkt"))).as[Double].head()
    perim shouldBe (0.4 * mPerDeg +- 0.4 * mPerDeg * 1e-4)
    // holes subtract on the sphere exactly as on the plane
    val withHole = Seq(("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0), " +
      "(0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))")).toDF("wkt")
    val full = Seq("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))").toDF("wkt")
      .select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    val hole = Seq("POLYGON ((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))")
      .toDF("wkt").select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    val holed = withHole.select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    holed shouldBe (full - hole +- 1e-6 * full)
    // antimeridian-adjacent sanity: symmetric east/west rings agree
    val east = Seq("POLYGON ((100 10, 101 10, 101 11, 100 11, 100 10))")
      .toDF("wkt").select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    val west = Seq("POLYGON ((-101 10, -100 10, -100 11, -101 11, -101 10))")
      .toDF("wkt").select(Geo.stAreaGeo(col("wkt"))).as[Double].head()
    east shouldBe (west +- 1e-6 * east)
  }

  test("stIntersectsInclusive: touching counts — shared vertex, shared edge, tangent") {
    def rings(a: String, b: String) = Seq((a, b)).toDF("a", "b")
      .select(GeoAlgebra.wktPolygonRing(col("a")).as("ra"),
        GeoAlgebra.wktPolygonRing(col("b")).as("rb"))
    def check(a: String, b: String): (Boolean, Boolean) = {
      val r = rings(a, b).select(
        GeoAlgebra.stIntersects(col("ra"), col("rb")),
        GeoAlgebra.stIntersectsInclusive(col("ra"), col("rb"))).head()
      (r.getBoolean(0), r.getBoolean(1))
    }
    val sq = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    // corner touch at (2,2): general-position test misses, inclusive hits
    check(sq, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))") shouldBe ((false, true))
    // shared edge x=2: inclusive hits
    check(sq, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))") shouldBe ((false, true))
    // vertex of B on A's edge interior (tangent): inclusive hits
    check(sq, "POLYGON ((2 1, 4 0, 4 2, 2 1))") shouldBe ((false, true))
    // proper overlap: both
    check(sq, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))") shouldBe ((true, true))
    // containment: both
    check(sq, "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))") shouldBe
      ((true, true))
    // disjoint: neither
    check(sq, "POLYGON ((5 5, 7 5, 7 7, 5 7, 5 5))") shouldBe ((false, false))
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT st_intersects_inclusive('$sq', " +
        "'POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))')")
      .as[Boolean].head() shouldBe true
  }

  test("geodesic area property: lat/lng rectangles equal the closed-form spherical area") {
    // for a rectangle [λ1,λ2]×[φ1,φ2] the Chamberlain–Duquette line
    // integral telescopes EXACTLY to R²·Δλ·(sin φ2 − sin φ1) — the
    // classic spherical-zone area; random rectangles must agree to
    // fp round-off, not just approximation error
    import graft.operators.Geo
    val rnd = new scala.util.Random(7)
    val R = 6371000.0
    val cases = (1 to 25).map { _ =>
      val lng1 = rnd.nextDouble() * 300 - 150
      val lat1 = rnd.nextDouble() * 140 - 70
      val dLng = rnd.nextDouble() * 20 + 0.01
      val dLat = rnd.nextDouble() * 15 + 0.01
      (lng1, lat1, math.min(170.0, lng1 + dLng), math.min(85.0, lat1 + dLat))
    }
    val wkts = cases.map { case (x1, y1, x2, y2) =>
      s"POLYGON (($x1 $y1, $x2 $y1, $x2 $y2, $x1 $y2, $x1 $y1))"
    }
    val got = wkts.toDF("wkt").select(Geo.stAreaGeo(col("wkt")))
      .as[Double].collect()
    got.zip(cases).foreach { case (a, (x1, y1, x2, y2)) =>
      val want = R * R * math.toRadians(x2 - x1) *
        (math.sin(math.toRadians(y2)) - math.sin(math.toRadians(y1)))
      withClue(s"rect ($x1,$y1)-($x2,$y2): ") {
        math.abs(a - want) / want should be < 1e-9
      }
    }
  }

  test("containsJoin / nearestJoin tolerate caller __graft_* and grid-name columns") {
    // a caller frame already carrying the old fixed working names must
    // survive unharmed (the freshNamer discipline)
    val pts = Seq((1L, 1.0, 1.0, "keepme")).toDF("pid", "x", "y", "__graft_gx_0")
    val polys = Seq((10L, squareWkt)).toDF("gid", "wkt")
      .select(col("gid"), GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
    val got = GeoAlgebra.containsJoin(pts, "x", "y", polys, "ring", cell = 2.0)
    got.columns should contain("__graft_gx_0")
    got.select("pid", "gid", "__graft_gx_0").as[(Long, Long, String)]
      .collect().toSeq shouldBe Seq((1L, 10L, "keepme"))
    val pois = Seq((7L, 1.1, 1.1)).toDF("poi", "qx", "qy")
    val nn = GeoAlgebra.nearestJoin(pts, "pid", "x", "y",
      pois, "qx", "qy", "poi", maxDist = 1.0)
    nn.columns should contain("__graft_gx_0")
    nn.select("pid", "poi").as[(Long, Long)].collect().toSeq shouldBe Seq((1L, 7L))
    // reserved output names are rejected eagerly, not clobbered
    val clash = Seq((1L, 1.0, 1.0, 9.9)).toDF("pid", "x", "y", "dist")
    an[IllegalArgumentException] should be thrownBy
      GeoAlgebra.nearestJoin(clash, "pid", "x", "y",
        pois, "qx", "qy", "poi", maxDist = 1.0)
  }

  test("intersectsJoin == cross-filter reference, each pair exactly once, no NLJ") {
    // random stars vs random diamonds over a shared field — sizes vary
    // so pairs share 1..many tiles; report-once must still emit one row
    def stars(seed: Int, n: Int, tag: String) = {
      val rnd = new scala.util.Random(seed)
      (1 to n).map { i =>
        val cx = rnd.nextInt(40) * 1.0; val cy = rnd.nextInt(40) * 1.0
        val s = 1.0 + rnd.nextInt(3) * 0.75
        (i.toLong, Seq((3 * s, 0.0), (0.0, 3 * s), (-3 * s, 0.0), (0.0, -3 * s))
          .map { case (dx, dy) => (cx + dx, cy + dy) })
      }.toDF(s"${tag}_id", s"${tag}_pts")
        .select(col(s"${tag}_id"), transform(col(s"${tag}_pts"), p =>
          struct(p.getField("_1").as("x"), p.getField("_2").as("y")))
          .as(s"${tag}_pre"))
        .select(col(s"${tag}_id"),
          concat(col(s"${tag}_pre"), slice(col(s"${tag}_pre"), 1, 1))
            .as(s"${tag}_ring"))
    }
    val a = stars(3, 40, "a")
    val b = stars(9, 35, "b")
    for (cell <- Seq(2.0, 5.0, 11.0)) {
      val got = GeoAlgebra.intersectsJoin(a, "a_ring", b, "b_ring", cell)
        .select("a_id", "b_id").as[(Long, Long)].collect()
      withClue(s"cell $cell: ") {
        got.length shouldBe got.toSet.size // exactly once, no distinct
        // reference deliberately uses the interpreted FOLD — this also
        // pins codegen pair kernel == fold on every candidate pair
        val want = a.crossJoin(b)
          .filter(GeoAlgebra.stIntersectsFold(col("a_ring"), col("b_ring")))
          .select("a_id", "b_id").as[(Long, Long)].collect().toSet
        got.toSet shouldBe want
        want.size should be > 10
      }
    }
    // inclusive kernel == inclusive fold over the full cross product
    a.crossJoin(b).filter(
      GeoAlgebra.stIntersectsInclusive(col("a_ring"), col("b_ring")) =!=
        GeoAlgebra.stIntersectsInclusiveFold(col("a_ring"), col("b_ring")))
      .count() shouldBe 0L
    // inclusive mode reports touching pairs the plain test misses
    val t1 = Seq((1L, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"))
      .toDF("a_id", "wkt")
      .select(col("a_id"), GeoAlgebra.wktPolygonRing(col("wkt")).as("a_ring"))
    val t2 = Seq((2L, "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"))
      .toDF("b_id", "wkt")
      .select(col("b_id"), GeoAlgebra.wktPolygonRing(col("wkt")).as("b_ring"))
    GeoAlgebra.intersectsJoin(t1, "a_ring", t2, "b_ring", 2.0).count() shouldBe 0L
    GeoAlgebra.intersectsJoin(t1, "a_ring", t2, "b_ring", 2.0,
      inclusive = true).count() shouldBe 1L
    // plans as a hash equi-join on the tile key
    val plan = GeoAlgebra.intersectsJoin(a, "a_ring", b, "b_ring", 5.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Join"))
  }

  test("intersectsJoin planar contract: seam pairs disjoint as documented; the shift recovers them") {
    // two lat/lng squares overlapping ACROSS ±180° — in planar
    // coordinates they sit 360° apart, so the non-wrapping tiling
    // reports disjoint (the documented contract, unlike radiusJoin)
    def sq(id: Long, x0: Double, tag: String) = Seq((id,
        Seq(x0, x0 + 0.4, x0 + 0.4, x0, x0).zip(Seq(0.0, 0.0, 1.0, 1.0, 0.0))))
      .toDF(s"${tag}_id", s"${tag}_pts")
      .select(col(s"${tag}_id"), transform(col(s"${tag}_pts"), p =>
        struct(p.getField("_1").as("x"), p.getField("_2").as("y")))
        .as(s"${tag}_ring"))
    val east = sq(1L, 179.7, "a")   // 179.7..180.1 (continuous past 180)
    val west = sq(2L, -180.1, "b")  // -180.1..-179.7 = 179.9..180.3 wrapped
    GeoAlgebra.intersectsJoin(east, "a_ring", west, "b_ring", 1.0)
      .count() shouldBe 0L
    // the documented client-side re-centering (pmod(lng+360, 360) maps
    // both into one contiguous window) makes the same pair join —
    // exactly once, through the same grid path
    def recenter(df: org.apache.spark.sql.DataFrame, ring: String) =
      df.withColumn(ring, transform(col(ring), p =>
        struct(pmod(p.getField("x") + 360.0, lit(360.0)).as("x"),
          p.getField("y").as("y"))))
    val got = GeoAlgebra.intersectsJoin(
        recenter(east, "a_ring"), "a_ring",
        recenter(west, "b_ring"), "b_ring", 1.0)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    got shouldBe Seq((1L, 2L))
  }

  test("containsJoin: oversized envelope fails loudly via the cell guard") {
    val pts = Seq((1L, 1.0, 1.0)).toDF("pid", "x", "y")
    val polys = Seq((1L, "POLYGON ((0 0, 9000 0, 9000 9000, 0 9000, 0 0))"))
      .toDF("gid", "wkt")
      .select(col("gid"), GeoAlgebra.wktPolygonRing(col("wkt")).as("ring"))
    val e = intercept[Exception] {
      GeoAlgebra.containsJoin(pts, "x", "y", polys, "ring", cell = 1.0,
        maxCellsPerRow = 64).count()
    }
    assert(e.getMessage != null)
  }
}

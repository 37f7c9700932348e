package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal geometry slice: WKT point attributes + a Haversine radius
  * predicate — the cheap end of the reference's GEOMETRY/GEOGRAPHY
  * attribute types (`/root/reference/src/main/scala/org/vitrivr/adampro/data/datatypes/AttributeTypes.scala:41-43`,
  * backed by PostGIS in `.../gis/GeometryWrapper.scala`; here a plain
  * `StringType` column carries the WKT, so it flows through every Spark
  * source/sink with no special storage handler).
  *
  * All pure Catalyst expressions (concat/regexp/trig): codegen'd, no
  * shuffle, and the radius predicate pushes through projections like any
  * other filter. The Haversine kernel mirrors
  * [[graft.functions.Distances.haversine]] exactly (lat clamp to ±90,
  * lng wrap to [-180, 180), R = 6371000 m) so scalar and vector forms
  * agree to the bit.
  */
object Geo {

  /** WKT `POINT (lng lat)` from scalar coordinate columns. Doubles render
    * via their shortest decimal representation, so [[wktLng]]/[[wktLat]]
    * round-trip the exact double back. */
  def wktPoint(lng: Column, lat: Column): Column =
    concat(lit("POINT ("), lng.cast("double").cast("string"), lit(" "),
      lat.cast("double").cast("string"), lit(")"))

  // whitespace-tolerant like the POLYGON/LINESTRING parsers in
  // GeoAlgebra: compact `POINT(x y)` parses the same as the canonical
  // spaced form — one tolerance contract across the whole WKT surface
  private val PointRe =
    "^POINT\\s*\\(\\s*([-+0-9.eE]+)\\s+([-+0-9.eE]+)\\s*\\)$"

  /** Longitude (first coordinate) of a WKT point; null on malformed input. */
  def wktLng(wkt: Column): Column = {
    val m = regexp_extract(wkt, PointRe, 1)
    when(m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** Latitude (second coordinate) of a WKT point; null on malformed input. */
  def wktLat(wkt: Column): Column = {
    val m = regexp_extract(wkt, PointRe, 2)
    when(m === "", lit(null).cast("double")).otherwise(m.cast("double"))
  }

  /** The Haversine kernel's sphere: R = 6 371 000 m, shared with
    * [[graft.functions.Distances.haversine]]. */
  val SphereRadiusMeters = 6371000.0

  /** WGS84 authalic (equal-total-area) sphere radius — the standard
    * first-order spheroid correction for AREAS (Snyder, "Map
    * Projections — A Working Manual", USGS PP 1395, eq. 3-11/3-13):
    * a sphere of this radius has exactly the ellipsoid's surface area,
    * so authalic-sphere areas track WGS84 ellipsoidal areas to ~0.1 %
    * locally (the mapping's latitude-dependent scale residual). */
  val AuthalicRadiusMeters = 6371007.1809184737

  /** WGS84 rectifying sphere radius (the meridian-arc mean
    * `A = a/(1+n)·(1+n²/4+n⁴/64)` of Karney, "Transverse Mercator with
    * an accuracy of a few nanometers", 2011 — pole-to-pole meridian
    * length exact): the matching first-order correction for LENGTHS.
    * Residual vs true WGS84 geodesics stays within ~0.2 % typically
    * and ~0.5 % worst-case (equatorial east–west runs, where the
    * ellipsoid's normal radius exceeds the rectifying mean); full
    * Karney geodesics are out of scope. */
  val RectifyingRadiusMeters = 6367449.145823415

  /** Clamped latitude in radians — the Haversine kernel's input
    * normalization, shared by every geodesic formula here. */
  private def latRad(v: Column): Column =
    radians(greatest(lit(-90.0), least(lit(90.0), v.cast("double"))))

  /** Wrapped longitude in radians ([−π, π)) — ditto. */
  private def lngRad(v: Column): Column = {
    val wrapped = (v.cast("double") % 360.0 + 360.0) % 360.0
    radians(when(wrapped >= 180.0, wrapped - 360.0).otherwise(wrapped))
  }

  /** Great-circle distance in meters between two (lat, lng) pairs —
    * scalar twin of `Distances.haversine`. `radiusMeters` selects the
    * sphere (default the Haversine R; pass [[RectifyingRadiusMeters]]
    * for the spheroid-corrected length convention). */
  def haversineMeters(latA: Column, lngA: Column, latB: Column, lngB: Column,
                      radiusMeters: Double = SphereRadiusMeters): Column = {
    val earthR = lit(radiusMeters)
    val dPhi = latRad(latB) - latRad(latA)
    val dLam = lngRad(lngB) - lngRad(lngA)
    val h = pow(sin(dPhi / 2), 2) +
      cos(latRad(latA)) * cos(latRad(latB)) * pow(sin(dLam / 2), 2)
    lit(2.0) * earthR * atan2(sqrt(h), sqrt(lit(1.0) - h))
  }

  /** Initial great-circle bearing from (latA, lngA) toward
    * (latB, lngB), in radians clockwise from true north, normalized to
    * [0, 2π) — `ST_Azimuth(geography)` semantics (aviation formulary:
    * `θ = atan2(sin Δλ·cos φ₂, cos φ₁·sin φ₂ − sin φ₁·cos φ₂·cos Δλ)`),
    * including the NULL-for-coincident-points convention (a self-pair
    * has no bearing; without the guard `atan2(0, 0) = 0` would claim
    * due north). Due-north/south inputs hit the formula's exact-zero
    * first argument (`sin 0 = 0` exactly), so the 0/2π wrap boundary
    * is never straddled by a rounding ulp — the property that makes
    * the rounded oracle replay safe. */
  def azimuthGeo(latA: Column, lngA: Column, latB: Column, lngB: Column): Column = {
    val phi1 = latRad(latA); val phi2 = latRad(latB)
    val dLam = lngRad(lngB) - lngRad(lngA)
    val theta = atan2(sin(dLam) * cos(phi2),
      cos(phi1) * sin(phi2) - sin(phi1) * cos(phi2) * cos(dLam))
    val twoPi = 2.0 * math.Pi
    when(phi1 === phi2 && dLam === 0.0, lit(null).cast("double"))
      .otherwise((theta % twoPi + twoPi) % twoPi)
  }

  /** Great-circle DESTINATION point: start at (lat, lng), travel
    * `rMeters` along initial bearing `bearingRad` (radians clockwise
    * from north) — `ST_Project(geography)` semantics via the direct
    * geodesy formulas on the sphere (aviation formulary):
    * `φ₂ = asin(sin φ₁ cos δ + cos φ₁ sin δ cos θ)`,
    * `λ₂ = λ₁ + atan2(sin θ sin δ cos φ₁, cos δ − sin φ₁ sin φ₂)` with
    * `δ = r/R`. Returns `struct<x:lng, y:lat>` in degrees; the
    * longitude is not re-wrapped (the [[stBufferPointGeo]] convention —
    * destinations past the ±180° seam come back with |lng| > 180,
    * still correct for the distance/area kernels, which wrap
    * internally). */
  def projectGeo(lat: Column, lng: Column, rMeters: Column,
                 bearingRad: Column): Column = {
    val delta = rMeters.cast("double") / SphereRadiusMeters
    // inputs take the sibling entry points' normalization (lat clamp,
    // lng wrap). NB the wrap is only VALUE-preserving for in-range
    // longitudes, not bit-preserving (x+360−360 re-rounds off the
    // dyadic grid) — the buffer oracle therefore replays gla/gln
    // rather than raw radians(), keeping the mirror exact for any
    // fixture. The bearing is naturally periodic and stays raw.
    val phi1 = latRad(lat)
    val lam1 = lngRad(lng)
    val theta = bearingRad.cast("double")
    val phi2 = asin(sin(phi1) * cos(delta) + cos(phi1) * sin(delta) * cos(theta))
    val lam2 = lam1 + atan2(sin(theta) * sin(delta) * cos(phi1),
      cos(delta) - sin(phi1) * sin(phi2))
    struct(degrees(lam2).as("x"), degrees(phi2).as("y"))
  }

  /** [[azimuthGeo]] over two WKT `POINT (lng lat)` values; null if
    * either fails to parse. */
  def stAzimuthGeo(wktA: Column, wktB: Column): Column =
    azimuthGeo(wktLat(wktA), wktLng(wktA), wktLat(wktB), wktLng(wktB))

  /** Radius predicate: point within `meters` of (qLat, qLng). */
  def withinRadius(lat: Column, lng: Column, qLat: Column, qLng: Column,
                   meters: Column): Column =
    haversineMeters(lat, lng, qLat, qLng) <= meters

  // ---- geodesic (GEOGRAPHY-role) measures --------------------------------
  //
  // The reference routes its GEOGRAPHYTYPE to PostGIS geography
  // (`/root/reference/src/main/scala/org/vitrivr/adampro/data/datatypes/gis/GeographyWrapper.scala`);
  // here great-circle measures evaluate in-engine on the same
  // R = 6 371 000 m sphere the Haversine kernel uses, over the planar
  // algebra's WKT parse (x = longitude, y = latitude — WKT axis order).
  // Like the buffer op these are trig-bearing: consumers needing
  // cross-engine bit-parity round derived measures (the class-level
  // numeric-contract note in GeoAlgebra).

  /** Great-circle length in meters of a lat/lng vertex chain
    * (`array<struct<x:lng,y:lat>>`): Σ Haversine over consecutive
    * vertices — a closed ring yields its geodesic perimeter, an open
    * linestring its route length. */
  def lengthGeoMeters(chain: Column,
                      radiusMeters: Double = SphereRadiusMeters): Column =
    aggregate(GeoAlgebra.edges(chain), lit(0.0), (acc, e) =>
      acc + haversineMeters(e.getField("ay"), e.getField("ax"),
        e.getField("by"), e.getField("bx"), radiusMeters))

  /** Spherical polygon area in m² of a closed lat/lng ring — the
    * Chamberlain–Duquette line integral (JPL Publication 07-3):
    * `|Σ Δλ'·(2 + sin φ₁ + sin φ₂)| · R²/2`, summed over the ring's
    * edges in radians, with each edge's longitude step wrapped into
    * [−π, π): `Δλ' = Δλ − 2π·⌊Δλ/2π + ½⌋`. The wrap is the IDENTITY
    * for edges that stay inside one 360° window (⌊·⌋ = 0, `Δλ − 0.0`
    * is bit-exact), and makes dateline-crossing rings — a vertex at
    * +179.9° linked to one at −179.9° — integrate their true small
    * step instead of the ±2π jump, so the formula is correct across
    * the ±180° antimeridian with no change to non-crossing results.
    * All wrap arithmetic is exact-rounded (multiply/divide/floor/
    * subtract), so the oracle replays it bit-identically. Excellent
    * for polygons small against the Earth (the geodesic twin of the
    * planar shoelace). */
  def areaGeoSqMeters(ring: Column,
                      radiusMeters: Double = SphereRadiusMeters): Column = {
    val r = lit(radiusMeters)
    val twoPi = 2.0 * math.Pi
    def wrapPi(d: Column): Column = d - lit(twoPi) * floor(d / twoPi + 0.5)
    abs(aggregate(GeoAlgebra.edges(ring), lit(0.0), (acc, e) =>
      acc + wrapPi(radians(e.getField("bx")) - radians(e.getField("ax"))) *
        (lit(2.0) + sin(radians(e.getField("ay"))) +
          sin(radians(e.getField("by")))))) * r * r / 2.0
  }

  /** Geodesic area of full WKT text (`POLYGON`/`MULTIPOLYGON`, holes
    * subtract, parts sum) — `ST_Area(geography)` semantics. Null on
    * malformed input. `spheroid = true` evaluates on the WGS84
    * authalic sphere ([[AuthalicRadiusMeters]]) — the PostGIS
    * `geography` ellipsoidal-default analogue, accurate to ~0.1 % of
    * true WGS84 areas — instead of the Haversine sphere. */
  def stAreaGeo(wkt: Column, spheroid: Boolean = false): Column =
    GeoAlgebra.areaWktWith(wkt, areaGeoSqMeters(_,
      if (spheroid) AuthalicRadiusMeters else SphereRadiusMeters))

  /** Geodesic length in meters of full WKT text: a `LINESTRING`'s route
    * length, or the boundary length of a `POLYGON`/`MULTIPOLYGON`
    * (every ring counts — the geodesic `ST_Perimeter`). Null on
    * malformed input. `spheroid = true` measures on the WGS84
    * rectifying sphere ([[RectifyingRadiusMeters]]) — see that
    * constant's residual-error note. */
  def stLengthGeo(wkt: Column, spheroid: Boolean = false): Column = {
    val r = if (spheroid) RectifyingRadiusMeters else SphereRadiusMeters
    val line = GeoAlgebra.wktLineString(wkt)
    when(line.isNotNull, lengthGeoMeters(line, r))
      .otherwise(aggregate(GeoAlgebra.wktRings(wkt), lit(0.0),
        (acc, rr) => acc + lengthGeoMeters(rr, r)))
  }

  /** Closed regular-n-gon ring of great-circle DESTINATION points at
    * `rMeters` around (lat, lng) — the geodesic `ST_Buffer(point)`
    * analogue of [[GeoAlgebra.stBufferPoint]], via the standard
    * direct-geodesy formulas on the sphere (aviation formulary):
    * `φ₂ = asin(sin φ₁ cos δ + cos φ₁ sin δ cos θ)`,
    * `λ₂ = λ₁ + atan2(sin θ sin δ cos φ₁, cos δ − sin φ₁ sin φ₂)`
    * with `δ = r/R` and bearings rotated half a step off-axis (no
    * vertex due north). Returns `array<struct<x:lng, y:lat>>` in
    * degrees, closing vertex repeated — feed it [[areaGeoSqMeters]] /
    * [[lengthGeoMeters]] or emit as WKT. Every vertex sits exactly
    * `rMeters` from the center by construction. Longitudes are not
    * re-wrapped: buffers touching the ±180° seam come back with
    * |lng| > 180 (still correct for the distance/area kernels, which
    * wrap internally). */
  def stBufferPointGeo(lat: Column, lng: Column, rMeters: Column,
                       n: Int = 8): Column = {
    require(n >= 3, "buffer polygon needs at least 3 vertices")
    transform(sequence(lit(0), lit(n)), i => {
      val theta = lit(2.0) * lit(math.Pi) * (i % n).cast("double") / n.toDouble +
        lit(math.Pi) / n.toDouble
      // each vertex IS the ST_Project destination at bearing θ —
      // identical arithmetic, shared formula
      projectGeo(lat, lng, rMeters, theta)
    })
  }

  /** Great-circle distance in meters between two WKT `POINT (lng lat)`
    * values; null if either fails to parse. */
  def stDistanceGeo(wktA: Column, wktB: Column): Column =
    haversineMeters(wktLat(wktA), wktLng(wktA), wktLat(wktB), wktLng(wktB))

  /** Geodesic within-distance predicate over two WKT points —
    * `ST_DWithin(geography)` semantics. */
  def stDWithinGeo(wktA: Column, wktB: Column, meters: Column): Column =
    stDistanceGeo(wktA, wktB) <= meters

  /** Meridian degree length on the spherical Earth the Haversine kernel
    * uses (R = 6 371 000 m): π·R/180. */
  private val MetersPerDeg = 6371000.0 * math.Pi / 180.0

  /** Geo radius JOIN: every (point, poi) pair within `radiusMeters`
    * great-circle distance — the 2-D twin of
    * [[RangeJoin.pointsInIntervals]]. Catalyst would plan the raw
    * distance predicate as a nested-loop join; here both sides map onto
    * a lat/lng grid of `radius`-sized cells: each point lands in ONE
    * cell, each poi explodes to the cells its radius bounding box
    * overlaps (latitude span is the radius itself; longitude span
    * widens by 1/cos at the box's extreme latitude, with a 1.001 slack
    * absorbing the sub-linear chord bound — lossless for any radius
    * small against the Earth), and one hash equi-join on the cell key
    * feeds the exact Haversine filter. Cell fan-out per poi is
    * O((2 + 1/cosφ)²), guarded by `maxCellsPerRow` via a distributed
    * `raise_error` (polar bounding boxes fail loudly rather than
    * exploding a task). Pairs join exactly once (a point's cell is
    * unique, a poi emits each cell once).
    *
    * The longitude grid WRAPS at the ±180° antimeridian: the ring is
    * divided into an integral number of cells (width 360/⌈360/dDeg⌉ ≤
    * the radius, so coverage stays lossless) and poi-side cell indexes
    * wrap modulo that count, so a poi at −179.9° reaches a point at
    * +179.9°. When a poi's widened span covers the whole ring (extreme
    * latitudes), the full ring is emitted exactly once — pairs still
    * join exactly once, no distinct needed. Latitude is clamped, not
    * wrapped (poles hit the cell-count guard).
    *
    * Output: all columns of both sides + `dist_m`. Non-shared column
    * names must be disjoint. */
  def radiusJoin(points: org.apache.spark.sql.DataFrame, latCol: String, lngCol: String,
                 pois: org.apache.spark.sql.DataFrame, poiLatCol: String, poiLngCol: String,
                 radiusMeters: Double, maxCellsPerRow: Long = 256L): org.apache.spark.sql.DataFrame = {
    require(radiusMeters > 0, "radius must be positive")
    require(maxCellsPerRow > 0, "maxCellsPerRow must be positive")
    val overlap = points.columns.toSet.intersect(pois.columns.toSet)
    require(overlap.isEmpty, s"columns ${overlap.mkString(",")} appear on both sides")
    // output column is contract; internal grid columns are fresh names
    // (the Sampling.freshNamer discipline — a caller's same-named column
    // must neither be clobbered nor made join-ambiguous)
    require(!points.columns.contains("dist_m") && !pois.columns.contains("dist_m"),
      "output column 'dist_m' already exists on an input — rename it away")
    val taken = (points.columns ++ pois.columns).toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"__graft_${base}_$i").filterNot(taken).next()
    val (cLat, cLng) = (fresh("clat"), fresh("clng"))
    val dDeg = radiusMeters / MetersPerDeg
    // integral cells per longitude ring → the grid wraps EXACTLY at the
    // seam; cell width shrinks to ≤ dDeg, never widens, so the degree
    // span math below stays lossless
    val nLng = math.max(1L, math.ceil(360.0 / dDeg).toLong)
    val lngW = 360.0 / nLng

    def normLat(c: Column) = greatest(lit(-90.0), least(lit(90.0), c.cast("double")))
    def normLng(c: Column) = {
      val w = (c.cast("double") % 360.0 + 360.0) % 360.0
      when(w >= 180.0, w - 360.0).otherwise(w)
    }
    def cellOf(v: Column) = floor(v / dDeg).cast("long")
    // ring cell in [0, nLng): shifted to [0, 360) then clamped against
    // the floating-point edge at exactly 360/lngW
    def lngCell(c: Column) =
      least(floor((normLng(c) + 180.0) / lngW), lit(nLng - 1)).cast("long")

    // fan the point side out before the grid probe: the poi side is the
    // (small) broadcast build, so the haversine probe + radius filter
    // ride the point scan's own partitioning — on a narrow scan the
    // whole kernel serializes (r22 geo_geodesic_nearest: 1.7 s wall at
    // 2.0 CPU-s on one split). No-op when the scan is already wide.
    val p = graft.core.Parallelism.fanOut(points)
      .withColumn(cLat, cellOf(normLat(col(latCol))))
      .withColumn(cLng, lngCell(col(lngCol)))

    val lat0 = normLat(col(poiLatCol))
    val lng0s = normLng(col(poiLngCol)) + 180.0
    // widest longitude span inside the box: at its extreme latitude
    val cosM = cos(radians(least(lit(89.9), abs(lat0) + lit(dDeg))))
    val lngSpan = lit(dDeg * 1.001) / cosM
    val latLo = cellOf(lat0 - dDeg * 1.001)
    val latHi = cellOf(lat0 + dDeg * 1.001)
    // raw (unwrapped) ring indexes; may run negative or past nLng
    val lngLoRaw = floor((lng0s - lngSpan) / lngW).cast("long")
    val lngHiRaw = floor((lng0s + lngSpan) / lngW).cast("long")
    val rawLngCount = lngHiRaw - lngLoRaw + 1
    // guard rides the sequence bound so projection pruning can't skip it
    val tooMany =
      (latHi - latLo + 1) * least(rawLngCount, lit(nLng)) > maxCellsPerRow
    def guarded(c: Column): Column = coalesce(
      when(tooMany, raise_error(concat(
        lit(s"poi radius box spans more than $maxCellsPerRow cells at lat "),
        lat0.cast("string")))).cast("long"),
      c)
    // span ≥ full ring → every ring cell exactly once; otherwise the raw
    // range wraps via pmod — values stay pairwise distinct, so each
    // (point, poi) pair still joins exactly once
    val lngCells = when(rawLngCount >= nLng,
        sequence(lit(0L), guarded(lit(nLng - 1))))
      .otherwise(transform(sequence(lngLoRaw, guarded(lngHiRaw)),
        i => pmod(i, lit(nLng))))
    val b = pois
      .withColumn(cLat, explode(sequence(latLo, latHi)))
      .withColumn(cLng, explode(lngCells))

    p.join(b, Seq(cLat, cLng))
      .withColumn("dist_m", haversineMeters(col(latCol), col(lngCol),
        col(poiLatCol), col(poiLngCol)))
      .filter(col("dist_m") <= radiusMeters)
      .drop(cLat, cLng)
  }

  /** Geodesic bounded k-nearest join: for each point, its `k` nearest
    * pois by great-circle distance WITHIN `radiusMeters` — the
    * nearest-depot / nearest-station shape, the spherical twin of
    * [[GeoAlgebra.nearestJoin]]. Candidates come from [[radiusJoin]]'s
    * lossless lat/lng grid (one hash equi-join, antimeridian-wrapping,
    * never a nested loop); a per-point window keeps the k closest, ties
    * broken on `poiKey`. Points with no poi inside the radius drop —
    * the bounded contract that keeps the candidate set O(density·area)
    * instead of O(|points|·|pois|). At scale the window shuffles only
    * the radius-filtered pairs on the point key.
    *
    * Output: all point columns + `poiKey` + `dist_m` + `nn_rank`;
    * other poi columns drop ([[GeoAlgebra.nearestJoin]] parity). */
  def nearestJoinGeo(points: org.apache.spark.sql.DataFrame,
                     pointKey: String, latCol: String, lngCol: String,
                     pois: org.apache.spark.sql.DataFrame,
                     poiLatCol: String, poiLngCol: String, poiKey: String,
                     radiusMeters: Double, k: Int = 1,
                     maxCellsPerRow: Long = 256L): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(!points.columns.contains("nn_rank") && !pois.columns.contains("nn_rank"),
      "output column 'nn_rank' already exists on an input — rename it away")
    val within = radiusJoin(points, latCol, lngCol, pois, poiLatCol, poiLngCol,
      radiusMeters, maxCellsPerRow)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pointKey))
      .orderBy(col("dist_m").asc, col(poiKey).asc)
    within
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      .drop(pois.columns.filter(c => c != poiKey): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planar geometry algebra over WKT columns — the contains / intersects /
  * buffer / distance slice of the reference's GEOMETRY attribute type
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/data/datatypes/AttributeTypes.scala:41-43`,
  * which delegates to PostGIS via `.../gis/GeometryWrapper.scala`; here
  * the algebra is evaluated in-engine so it distributes with the scan
  * instead of round-tripping an external store).
  *
  * Representation: a ring is `array<struct<x:double, y:double>>`, closed
  * (last vertex repeats the first, as WKT prints it); a linestring is the
  * same array, open. Every operation below is a pure Catalyst expression
  * tree (`transform`/`aggregate`/`exists` over the vertex array — all
  * codegen'd, zero shuffle, per-row), so predicates like [[stContains]]
  * push through projections and run inside the scan stage like any other
  * filter.
  *
  * Numeric contract: everything except [[stBufferPoint]] uses only IEEE
  * `+ - * /` and `sqrt`, all correctly-rounded operations — so given the
  * same inputs the results are BIT-IDENTICAL across engines (the DuckDB
  * oracles replay the same formulas verbatim). Boundary semantics follow
  * the even-odd raycast: a point exactly on an edge lands deterministically
  * on one side, the same side in every engine. [[stIntersects]] assumes
  * simple polygons in general position (boundary-touching without proper
  * crossing may report disjoint — the PostGIS `ST_Relate` boundary cases
  * are out of scope).
  */
object GeoAlgebra {

  // ---- WKT parse / emit ------------------------------------------------
  //
  // Tolerant of whitespace variation (compact `POLYGON((0 0,1 0,...))`
  // parses the same as the canonical spaced form) and of coordinate-level
  // garbage: a non-numeric or missing coordinate nulls the whole chain
  // via try_element_at/try_cast instead of throwing under ANSI mode —
  // "null on malformed input" holds all the way down, not just for
  // header-level regex misses.

  private val ChainType = "array<struct<x:double,y:double>>"

  private def pt(s: Column): Column = {
    val c = split(trim(s), "\\s+")
    struct(try_element_at(c, lit(1)).try_cast("double").as("x"),
      try_element_at(c, lit(2)).try_cast("double").as("y"))
  }

  private def ringOf(inner: Column): Column =
    transform(split(inner, ",\\s*"), s => pt(s))

  /** Null when any vertex failed to parse, the chain otherwise. */
  private def validChain(chain: Column): Column =
    when(exists(chain, p =>
        p.getField("x").isNull || p.getField("y").isNull),
      lit(null).cast(ChainType)).otherwise(chain)

  /** Exterior ring (ringIdx = 0) or hole of a WKT `POLYGON ((...), (...))`;
    * null on malformed input or a missing ring. Vertices keep the closing
    * repeat. */
  def wktPolygonRing(wkt: Column, ringIdx: Int = 0): Column = {
    val body = regexp_extract(wkt, "^POLYGON\\s*\\(\\((.+)\\)\\)$", 1)
    val rings = split(body, "\\)\\s*,\\s*\\(")
    // ConstFold: a literal-WKT parse would otherwise re-execute per row
    // (HOF lambdas block Catalyst constant folding); column inputs pass
    // through untouched
    graft.core.ConstFold(when(body === "", lit(null))
      .otherwise(validChain(ringOf(try_element_at(rings, lit(ringIdx + 1))))))
  }

  /** Vertex chain of a WKT `LINESTRING (x y, x y, ...)`; null on malformed
    * input. */
  def wktLineString(wkt: Column): Column = {
    val body = regexp_extract(wkt, "^LINESTRING\\s*\\((.+)\\)$", 1)
    graft.core.ConstFold(
      when(body === "", lit(null)).otherwise(validChain(ringOf(body))))
  }

  /** ALL rings of a WKT `POLYGON` (shell + holes) or `MULTIPOLYGON`
    * (every polygon's shell + holes) as `array<array<struct<x,y>>>`;
    * null on malformed input. Ring grouping is deliberately flattened:
    * the even-odd rule over the union of ring boundaries is exactly
    * polygon-with-holes / multipolygon membership. */
  def wktRings(wkt: Column): Column = {
    val polyBody = regexp_extract(wkt, "^POLYGON\\s*\\(\\((.+)\\)\\)$", 1)
    val multiBody = regexp_extract(wkt, "^MULTIPOLYGON\\s*\\(\\(\\((.+)\\)\\)\\)$", 1)
    def ringsOf(body: Column): Column =
      transform(split(body, "\\)\\s*,\\s*\\("), r => validChain(ringOf(r)))
    def allValid(rings: Column): Column =
      when(exists(rings, _.isNull), lit(null).cast(s"array<$ChainType>"))
        .otherwise(rings)
    graft.core.ConstFold(when(polyBody =!= "", allValid(ringsOf(polyBody)))
      .when(multiBody =!= "",
        // polygons separate with ")), ((", rings inside with "), (" —
        // splitting on BOTH separators yields the flat ring list
        allValid(transform(
          split(multiBody, "\\)\\)\\s*,\\s*\\(\\(|\\)\\s*,\\s*\\("),
          r => validChain(ringOf(r)))))
      .otherwise(lit(null)))
  }

  /** Point membership for full WKT polygon semantics: even-odd parity
    * across every ring, so holes subtract and MULTIPOLYGON parts union.
    * Accepts `POLYGON` and `MULTIPOLYGON` text. */
  def stContainsWkt(wkt: Column, px: Column, py: Column): Column = {
    val rings = wktRings(wkt) // ConstFold'd inside for literal WKT
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    org.apache.spark.sql.graft.Bridge.expressionEager(rings) match {
      // literal ring set: unroll the parity fold into an XOR chain of
      // the codegen raycast kernel — same expression per ring in the
      // same order as the aggregate fold, but whole-stage-codegen'd
      // instead of an interpreted per-row lambda
      case Literal(null, _) => lit(null).cast("boolean")
      case Literal(arr: ArrayData, ArrayType(et, _)) =>
        (0 until arr.numElements()).map(i =>
            org.apache.spark.sql.graft.Bridge.column(Literal(arr.get(i, et), et)))
          .foldLeft(lit(false))((acc, r) => acc =!= stContains(r, px, py))
      case _ =>
        aggregate(rings, lit(false), (acc, r) => acc =!= stContains(r, px, py))
    }
  }

  /** Hole-aware area of full WKT text (PostGIS `ST_Area` semantics):
    * each polygon contributes shell minus holes; MULTIPOLYGON parts
    * sum. Computed per polygon body as `2·area(shell) − Σ area(ring)`
    * (= shell − Σ holes), all exact-rounded ops. Null on malformed
    * input. */
  def stAreaWkt(wkt: Column): Column = areaWktWith(wkt, stArea)

  /** The ONE shell-minus-holes / parts-sum WKT fold skeleton: parse
    * the polygon bodies, route every ring through [[validChain]]
    * (identity for well-formed input — coordinate-level garbage nulls
    * the measure by the same contract as every other parser), fold
    * `kernel` over the rings with `add` from `zero`, and combine each
    * polygon as `shell2Minus(kernel(shell), total)` (= shell − Σ holes
    * when it is `s·2 − t`); MULTIPOLYGON parts `add` up. The scalar
    * instance serves [[stAreaWkt]] / [[Geo.stAreaGeo]] /
    * [[stLengthWkt]]'s family, the struct instance [[stCentroidWkt]] —
    * a parser fix lands here ONCE for all of them. */
  private def wktFoldWith(wkt: Column, kernel: Column => Column,
                          zero: Column, add: (Column, Column) => Column,
                          shell2Minus: (Column, Column) => Column,
                          nullValue: Column): Column = {
    def polyVal(body: Column): Column = {
      val rings = transform(split(body, "\\)\\s*,\\s*\\("),
        r => validChain(ringOf(r)))
      val total = aggregate(rings, zero, (acc, r) => add(acc, kernel(r)))
      shell2Minus(kernel(element_at(rings, 1)), total)
    }
    val polyBody = regexp_extract(wkt, "^POLYGON\\s*\\(\\((.+)\\)\\)$", 1)
    val multiBody = regexp_extract(wkt, "^MULTIPOLYGON\\s*\\(\\(\\((.+)\\)\\)\\)$", 1)
    // ConstFold: a literal-WKT measure is a constant — fold the whole
    // parse+fold to one value instead of re-running it per row
    graft.core.ConstFold(when(polyBody =!= "", polyVal(polyBody))
      .when(multiBody =!= "",
        aggregate(split(multiBody, "\\)\\)\\s*,\\s*\\(\\("), zero,
          (acc, p) => add(acc, polyVal(p))))
      .otherwise(nullValue))
  }

  /** Scalar instance of [[wktFoldWith]] for per-ring area kernels —
    * the planar shoelace ([[stAreaWkt]]) and the spherical line
    * integral ([[Geo.stAreaGeo]]) share it. */
  private[operators] def areaWktWith(wkt: Column,
                                     ringArea: Column => Column): Column =
    wktFoldWith(wkt, ringArea, lit(0.0), _ + _, (s, t) => s * 2.0 - t,
      lit(null).cast("double"))

  /** Boundary length of full WKT text: every ring's perimeter counts
    * (holes are boundary too — PostGIS `ST_Perimeter`). */
  def stLengthWkt(wkt: Column): Column =
    graft.core.ConstFold(
      aggregate(wktRings(wkt), lit(0.0), (acc, r) => acc + stLength(r)))

  /** Hole-aware centroid of full WKT text (PostGIS `ST_Centroid`
    * semantics): area-weighted moments, holes subtracting and
    * MULTIPOLYGON parts summing — same shell·2 − Σ skeleton as
    * [[stAreaWkt]], orientation-independent because each ring's moment
    * is its |area|-weighted centroid. ONE parse/fold pass: the kernel
    * returns `struct(mx, my, a)` and the skeleton combines
    * component-wise (arithmetic per component identical to three
    * scalar passes — the bit-parity contract), with rings routed
    * through [[validChain]] like every other parser. Undefined
    * (NaN/null) for zero-total-area input; null on malformed text. */
  def stCentroidWkt(wkt: Column): Column = {
    def kernel(r: Column): Column = {
      val c = stCentroid(r)
      val ar = stArea(r)
      struct((c.getField("x") * ar).as("mx"),
        (c.getField("y") * ar).as("my"), ar.as("a"))
    }
    def each(f: (Column, Column) => Column)(a: Column, b: Column): Column =
      struct(f(a.getField("mx"), b.getField("mx")).as("mx"),
        f(a.getField("my"), b.getField("my")).as("my"),
        f(a.getField("a"), b.getField("a")).as("a"))
    val m = wktFoldWith(wkt, kernel,
      zero = struct(lit(0.0).as("mx"), lit(0.0).as("my"), lit(0.0).as("a")),
      add = each(_ + _), shell2Minus = each((s, t) => s * 2.0 - t),
      nullValue = lit(null).cast("struct<mx:double,my:double,a:double>"))
    struct((m.getField("mx") / m.getField("a")).as("x"),
      (m.getField("my") / m.getField("a")).as("y"))
  }

  /** Literal-WKT containment: the codegen single-ring kernel when the
    * text is a plain POLYGON, the all-rings parity fold when holes or
    * MULTIPOLYGON parts are present (the fold wraps the kernel in an
    * interpreted lambda — correct, but only worth paying when the
    * geometry needs it). */
  def stContainsWktLiteral(wkt: String, px: Column, py: Column): Column =
    if (wkt.startsWith("MULTIPOLYGON") || wkt.contains("), ("))
      stContainsWkt(lit(wkt), px, py)
    else stContains(wktPolygonRing(lit(wkt)), px, py)

  /** WKT `POLYGON ((...))` from a closed ring array. Doubles print their
    * shortest decimal representation, so the text round-trips the exact
    * bits back through [[wktPolygonRing]]. */
  def wktPolygon(ring: Column): Column =
    concat(lit("POLYGON (("),
      array_join(transform(ring, p =>
        concat(p.getField("x").cast("string"), lit(" "),
          p.getField("y").cast("string"))), ", "),
      lit("))"))

  // ---- edge decomposition ----------------------------------------------

  /** Consecutive vertex pairs as `array<struct<ax,ay,bx,by>>` — the n-1
    * edges of a closed ring (the closing repeat supplies the wrap edge)
    * or an open linestring. */
  def edges(chain: Column): Column =
    transform(sequence(lit(1), size(chain) - 1), i => {
      val a = element_at(chain, i)
      val b = element_at(chain, i + 1)
      struct(a.getField("x").as("ax"), a.getField("y").as("ay"),
        b.getField("x").as("bx"), b.getField("y").as("by"))
    })

  // ---- predicates -------------------------------------------------------

  /** Point-in-polygon (even-odd rule) — the native codegen raycast
    * ([[graft.functions.GeoKernel]]), op-for-op identical to
    * [[stContainsFold]]. `ring` is a closed ring array. */
  def stContains(ring: Column, px: Column, py: Column): Column =
    graft.functions.GeoKernel(graft.functions.GeoKernel.Contains,
      ring, px.cast("double"), py.cast("double"))

  /** Pure higher-order-function raycast — interpreted (Spark HOFs are
    * CodegenFallback), kept as the independently-written reference the
    * codegen kernel is spec-checked against. */
  private[graft] def stContainsFold(ring: Column, px: Column, py: Column): Column =
    aggregate(edges(ring), lit(0L), (acc, e) => {
      val ax = e.getField("ax"); val ay = e.getField("ay")
      val bx = e.getField("bx"); val by = e.getField("by")
      val straddles = (ay > py) =!= (by > py)
      val crossX = (bx - ax) * (py - ay) / (by - ay) + ax
      acc + when(straddles && px < crossX, 1L).otherwise(0L)
    }) % 2 === 1

  /** True when the point lies ON the chain — some segment has a zero
    * orientation cross-product with the point AND the point falls inside
    * that segment's bounding box (collinear + between = on-segment).
    * Exact for coordinates whose products stay inside the 53-bit
    * mantissa, the same contract as [[stIntersects]]'s orientation
    * tests. Works on closed rings (boundary membership) and open
    * linestrings alike. */
  def stOnBoundary(chain: Column, px: Column, py: Column): Column =
    graft.functions.GeoKernel(graft.functions.GeoKernel.OnBoundary,
      chain, px.cast("double"), py.cast("double"))

  /** HOF twin of [[stOnBoundary]] — the independently-written reference
    * the codegen kernel is spec-checked against. */
  private[graft] def stOnBoundaryFold(chain: Column, px: Column, py: Column): Column = {
    val x = px.cast("double"); val y = py.cast("double")
    exists(edges(chain), e => {
      val ax = e.getField("ax"); val ay = e.getField("ay")
      val bx = e.getField("bx"); val by = e.getField("by")
      orient(ax, ay, bx, by, x, y) === 0.0 &&
        x >= least(ax, bx) && x <= greatest(ax, bx) &&
        y >= least(ay, by) && y <= greatest(ay, by)
    })
  }

  /** Boundary-INCLUSIVE point containment — PostGIS `ST_Covers`
    * semantics: a point on an edge or vertex counts as covered, where
    * the raw even-odd raycast of [[stContains]] lands it
    * deterministically but arbitrarily. One extra exact on-segment
    * sweep over the ring; use [[stContains]] when boundary points
    * don't matter. */
  def stCovers(ring: Column, px: Column, py: Column): Column =
    stOnBoundary(ring, px, py) || stContains(ring, px, py)

  /** [[stCovers]] over full WKT text (`POLYGON`/`MULTIPOLYGON`, holes):
    * covered = on ANY ring's boundary (a hole's boundary belongs to the
    * polygon — PostGIS convention) or even-odd inside. */
  def stCoversWkt(wkt: Column, px: Column, py: Column): Column = {
    val rings = wktRings(wkt) // ConstFold'd inside for literal WKT
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    val boundary = org.apache.spark.sql.graft.Bridge.expressionEager(rings) match {
      // literal ring set: unroll `exists` into an OR chain of the
      // codegen on-boundary kernel (same three-valued OR semantics,
      // whole-stage-codegen'd instead of an interpreted lambda)
      case Literal(null, _) => lit(null).cast("boolean")
      case Literal(arr: ArrayData, ArrayType(et, _)) =>
        (0 until arr.numElements()).map(i =>
            org.apache.spark.sql.graft.Bridge.column(Literal(arr.get(i, et), et)))
          .foldLeft(lit(false))((acc, r) => acc || stOnBoundary(r, px, py))
      case _ => exists(rings, r => stOnBoundary(r, px, py))
    }
    boundary || stContainsWkt(wkt, px, py)
  }

  /** Orientation sign of (p→q, p→r): positive = counter-clockwise. Exact
    * for coordinates whose products stay inside the 53-bit mantissa. */
  private def orient(px: Column, py: Column, qx: Column, qy: Column,
                     rx: Column, ry: Column): Column =
    (qx - px) * (ry - py) - (qy - py) * (rx - px)

  /** Proper segment crossing (interiors intersect). Touching endpoints /
    * collinear overlap report false — see the class-level general-position
    * note. */
  private def properCross(ea: Column, eb: Column): Column = {
    val (ax, ay) = (ea.getField("ax"), ea.getField("ay"))
    val (bx, by) = (ea.getField("bx"), ea.getField("by"))
    val (cx, cy) = (eb.getField("ax"), eb.getField("ay"))
    val (dx, dy) = (eb.getField("bx"), eb.getField("by"))
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    o1 * o2 < 0 && o3 * o4 < 0
  }

  /** Polygon-polygon intersection for simple rings in general position:
    * some edge pair properly crosses, or one ring's first vertex lies
    * inside the other (covers full containment). O(|A|·|B|) per row —
    * rings are small attribute payloads, not relations; the native
    * codegen pair kernel ([[graft.functions.GeoPairKernel]]) keeps the
    * [[intersectsJoin]] candidate filter inside whole-stage codegen.
    * Boundary-touching without proper crossing may report disjoint —
    * use [[stIntersectsInclusive]] when touch must count. */
  def stIntersects(ringA: Column, ringB: Column): Column =
    graft.functions.GeoPairKernel(
      graft.functions.GeoPairKernel.Intersects, ringA, ringB)

  /** HOF twin of [[stIntersects]] — the independently-written reference
    * the codegen pair kernel is spec-checked against. */
  private[graft] def stIntersectsFold(ringA: Column, ringB: Column): Column = {
    val edgeCross = exists(edges(ringA), ea =>
      exists(edges(ringB), eb => properCross(ea, eb)))
    val a0 = element_at(ringA, 1)
    val b0 = element_at(ringB, 1)
    edgeCross ||
      stContains(ringB, a0.getField("x"), a0.getField("y")) ||
      stContains(ringA, b0.getField("x"), b0.getField("y"))
  }

  /** Boundary-INCLUSIVE polygon-polygon intersects — the PostGIS
    * `ST_Intersects` convention where mere TOUCHING counts:
    * [[stIntersects]]' general-position test OR'd with an exact
    * vertex-on-boundary sweep in both directions. Complete for simple
    * closed polygons: two boundaries that meet do so either at a proper
    * crossing (detected by the orientation test) or at a point that is
    * a VERTEX of at least one ring (two non-collinear segments meeting
    * at a non-endpoint interior point of both cross properly; collinear
    * overlap puts an endpoint of one inside the other) — and every such
    * vertex trips [[stOnBoundary]]. Same O(|A|·|B|) class, same codegen
    * pair kernel. */
  def stIntersectsInclusive(ringA: Column, ringB: Column): Column =
    graft.functions.GeoPairKernel(
      graft.functions.GeoPairKernel.IntersectsInclusive, ringA, ringB)

  /** HOF twin of [[stIntersectsInclusive]] — the spec-check reference. */
  private[graft] def stIntersectsInclusiveFold(ringA: Column, ringB: Column): Column =
    stIntersectsFold(ringA, ringB) ||
      exists(ringA, p => stOnBoundaryFold(ringB, p.getField("x"), p.getField("y"))) ||
      exists(ringB, p => stOnBoundaryFold(ringA, p.getField("x"), p.getField("y")))

  // ---- measures ----------------------------------------------------------

  /** Signed shoelace area (positive = counter-clockwise ring). */
  def stSignedArea(ring: Column): Column =
    aggregate(edges(ring), lit(0.0), (acc, e) =>
      acc + (e.getField("ax") * e.getField("by") -
        e.getField("bx") * e.getField("ay"))) / 2.0

  /** Polygon area. */
  def stArea(ring: Column): Column = abs(stSignedArea(ring))

  /** Ring perimeter / linestring length. */
  def stLength(chain: Column): Column =
    aggregate(edges(chain), lit(0.0), (acc, e) => {
      val dx = e.getField("bx") - e.getField("ax")
      val dy = e.getField("by") - e.getField("ay")
      acc + sqrt(dx * dx + dy * dy)
    })

  /** Polygon centroid `struct<x, y>` (shoelace-weighted; undefined for
    * zero-area rings). */
  def stCentroid(ring: Column): Column = {
    val a6 = stSignedArea(ring) * 6.0
    def momentum(f: Column => Column): Column =
      aggregate(edges(ring), lit(0.0), (acc, e) => {
        val cross = e.getField("ax") * e.getField("by") -
          e.getField("bx") * e.getField("ay")
        acc + f(e) * cross
      })
    struct(
      (momentum(e => e.getField("ax") + e.getField("bx")) / a6).as("x"),
      (momentum(e => e.getField("ay") + e.getField("by")) / a6).as("y"))
  }

  /** Bounding box `struct<xmin, ymin, xmax, ymax>`. */
  def stEnvelope(chain: Column): Column = struct(
    array_min(transform(chain, _.getField("x"))).as("xmin"),
    array_min(transform(chain, _.getField("y"))).as("ymin"),
    array_max(transform(chain, _.getField("x"))).as("xmax"),
    array_max(transform(chain, _.getField("y"))).as("ymax"))

  /** Squared distance from (px, py) to the nearest point of the chain's
    * edges (boundary distance — combine with [[stContains]] for the
    * interior-is-zero polygon convention). Native codegen kernel. */
  private def boundaryDist2(chain: Column, px: Column, py: Column): Column =
    graft.functions.GeoKernel(graft.functions.GeoKernel.Dist2,
      chain, px.cast("double"), py.cast("double"))

  /** HOF twin of [[boundaryDist2]] — the spec-check reference. */
  private[graft] def boundaryDist2Fold(chain: Column, px: Column, py: Column): Column =
    aggregate(edges(chain), lit(Double.MaxValue), (acc, e) => {
      val ax = e.getField("ax"); val ay = e.getField("ay")
      val dx = e.getField("bx") - ax
      val dy = e.getField("by") - ay
      val len2 = dx * dx + dy * dy
      val tRaw = ((px - ax) * dx + (py - ay) * dy) / len2
      val t = greatest(lit(0.0), least(lit(1.0), tRaw))
      val qx = ax + t * dx
      val qy = ay + t * dy
      val d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
      val toA = (px - ax) * (px - ax) + (py - ay) * (py - ay)
      least(acc, when(len2 === 0.0, toA).otherwise(d2))
    })

  /** Distance from a point to a linestring (min over segments). */
  def stDistanceLine(line: Column, px: Column, py: Column): Column =
    sqrt(boundaryDist2(line, px, py))

  /** Distance from a point to a polygon: 0 inside, else boundary
    * distance. */
  def stDistance(ring: Column, px: Column, py: Column): Column =
    when(stContains(ring, px, py), lit(0.0))
      .otherwise(sqrt(boundaryDist2(ring, px, py)))

  /** Closed regular-n-gon ring approximating the radius-`r` disc around
    * (x, y), rotated half a step off-axis so no vertex or edge midpoint is
    * axis-aligned. The one trig-bearing operation here (everything else in
    * the algebra is exact-rounded arithmetic); consumers that need
    * cross-engine bit-parity should round derived measures. */
  def stBufferPoint(x: Column, y: Column, r: Column, n: Int = 8): Column = {
    require(n >= 3, "buffer polygon needs at least 3 vertices")
    transform(sequence(lit(0), lit(n)), i => {
      val theta = lit(2.0) * lit(math.Pi) * (i % n).cast("double") / n.toDouble +
        lit(math.Pi) / n.toDouble
      struct((x + r * cos(theta)).as("x"), (y + r * sin(theta)).as("y"))
    })
  }

  // ---- bounded nearest-neighbor join ---------------------------------------

  /** For each point, its k nearest `pois` within `maxDist` (planar
    * Euclidean) — the bounded-radius NN spatial join. Candidates come
    * from a `maxDist`-sized grid: each point lands in ONE cell, each poi
    * replicates to its 3×3 cell neighborhood (lossless: any point within
    * maxDist of the poi lies in one of those cells), one hash equi-join
    * on the cell key feeds the exact distance filter, and a per-point
    * window keeps the k closest (ties break on `poiKey`). Points with no
    * poi within `maxDist` drop — the bounded contract that keeps the
    * candidate set O(density·area) instead of O(|points|·|pois|).
    *
    * Output: all point columns + `poiKey` + `nn_rank` + `dist`.
    * `pointKey` must identify a point row (the window key). */
  def nearestJoin(points: DataFrame, pointKey: String, xCol: String, yCol: String,
                  pois: DataFrame, poiXCol: String, poiYCol: String,
                  poiKey: String, maxDist: Double, k: Int = 1): DataFrame = {
    require(maxDist > 0, "maxDist must be positive")
    require(k >= 1, "k must be >= 1")
    val overlap = points.columns.toSet.intersect(pois.columns.toSet)
    require(overlap.isEmpty, s"columns ${overlap.mkString(",")} appear on both sides")
    // output columns are part of the contract and must not clobber;
    // internal working columns get collision-free fresh names instead
    // (the Sampling.freshNamer discipline)
    val fresh = freshNames(points.columns ++ pois.columns)
    Seq("nn_rank", "dist").foreach(c =>
      require(!points.columns.contains(c) && !pois.columns.contains(c),
        s"output column '$c' already exists on an input — rename it away"))
    val (gx, gy, d2n) = (fresh("gx"), fresh("gy"), fresh("d2"))

    def cell(v: Column) = floor(v / maxDist).cast("long")
    val p = points
      .withColumn(gx, cell(col(xCol).cast("double")))
      .withColumn(gy, cell(col(yCol).cast("double")))
    val neighbors = Seq(-1L, 0L, 1L)
    def offsets = explode(array(neighbors.map(lit): _*))
    val b = pois
      .withColumn(gx, offsets)
      .withColumn(gy, offsets)
      .withColumn(gx, cell(col(poiXCol).cast("double")) + col(gx))
      .withColumn(gy, cell(col(poiYCol).cast("double")) + col(gy))

    val dx = col(xCol).cast("double") - col(poiXCol).cast("double")
    val dy = col(yCol).cast("double") - col(poiYCol).cast("double")
    val d2 = dx * dx + dy * dy
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pointKey))
      .orderBy(col(d2n).asc, col(poiKey).asc)
    p.join(b, Seq(gx, gy))
      .withColumn(d2n, d2)
      .filter(col(d2n) <= maxDist * maxDist)
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= k)
      .withColumn("dist", sqrt(col(d2n)))
      .drop(gx, gy, d2n)
      .drop(pois.columns.filter(c => c != poiKey): _*)
  }

  // ---- convex clipping (ST_Intersection slice) ----------------------------

  /** Signed side of point p relative to the directed clip edge (a→b):
    * positive = left (inside, for a counter-clockwise clip ring). */
  private def sideOf(e: Column, px: Column, py: Column): Column =
    orient(e.getField("ax"), e.getField("ay"),
      e.getField("bx"), e.getField("by"), px, py)

  /** One Sutherland–Hodgman pass: keep the part of the (closed) ring on
    * the inside of the clip edge's infinite line. Returns a closed ring,
    * or an empty array when nothing survives. */
  private def clipHalfPlane(ring: Column, ce: Column): Column = {
    val open = flatten(transform(edges(ring), se => {
      val ax = se.getField("ax"); val ay = se.getField("ay")
      val bx = se.getField("bx"); val by = se.getField("by")
      val sa = sideOf(ce, ax, ay)
      val sb = sideOf(ce, bx, by)
      val t = sa / (sa - sb)
      val ix = ax + t * (bx - ax)
      val iy = ay + t * (by - ay)
      val b = array(struct(bx.as("x"), by.as("y")))
      val i = array(struct(ix.as("x"), iy.as("y")))
      when(sa >= 0 && sb >= 0, b)
        .when(sa >= 0 && sb < 0, i)
        .when(sa < 0 && sb >= 0, concat(i, b))
        .otherwise(array().cast("array<struct<x:double,y:double>>"))
    }))
    // close the ring (each input vertex appeared once as an edge head);
    // guard FIRST on the incoming ring — edges() on an empty array would
    // otherwise build sequence(1, -1), a descending index range
    when(size(ring) < 4,
        array().cast("array<struct<x:double,y:double>>"))
      .when(size(open) >= 3, concat(open, slice(open, 1, 1)))
      .otherwise(array().cast("array<struct<x:double,y:double>>"))
  }

  /** Intersection of a simple ring with a CONVEX clip ring (Sutherland–
    * Hodgman): fold the subject through each clip edge's half-plane. The
    * clip ring must be counter-clockwise and convex; the subject may be
    * any simple polygon (a non-convex subject clipped to a convex window
    * stays a single ring up to degenerate bridging edges, the standard
    * SH caveat). Empty array = empty intersection. Pure expression fold
    * — O(|subject|·|clip|) per row, zero shuffle. */
  def stClipConvex(subject: Column, clip: Column): Column =
    aggregate(edges(clip), subject, (ring, ce) => clipHalfPlane(ring, ce))

  /** Area of `ring ∩ convex clip ring` — 0.0 for empty intersection. */
  def stIntersectionArea(subject: Column, clip: Column): Column = {
    val clipped = stClipConvex(subject, clip)
    when(size(clipped) < 4, lit(0.0)).otherwise(stArea(clipped))
  }

  // ---- scale operator: grid-partitioned containment join ------------------

  /** Points-in-polygons JOIN: every (point, polygon) pair where the point
    * lies inside the polygon ring. Catalyst would plan the raw
    * [[stContains]] predicate as a nested-loop join; here both sides map
    * onto a square grid of `cell`-sized tiles — each point lands in ONE
    * tile, each polygon explodes to the tiles its envelope overlaps — and
    * one hash equi-join on the tile key feeds the exact raycast filter.
    * Pairs join exactly once (a point's tile is unique; a polygon emits
    * each tile once). Tile fan-out per polygon is (envelope/cell)²,
    * guarded by `maxCellsPerRow` via a distributed `raise_error` —
    * mirror of [[Geo.radiusJoin]]'s lat/lng grid.
    *
    * Output: all columns of both sides. Non-shared names must be
    * disjoint; `ringCol` names the polygon-side closed-ring array. */
  def containsJoin(points: DataFrame, xCol: String, yCol: String,
                   polys: DataFrame, ringCol: String,
                   cell: Double, maxCellsPerRow: Long = 1024L): DataFrame = {
    require(cell > 0, "cell must be positive")
    require(maxCellsPerRow > 0, "maxCellsPerRow must be positive")
    val overlap = points.columns.toSet.intersect(polys.columns.toSet)
    require(overlap.isEmpty, s"columns ${overlap.mkString(",")} appear on both sides")
    val fresh = freshNames(points.columns ++ polys.columns)
    val (gx, gy) = (fresh("gx"), fresh("gy"))

    def tile(v: Column) = floor(v / cell).cast("long")

    val p = points
      .withColumn(gx, tile(col(xCol).cast("double")))
      .withColumn(gy, tile(col(yCol).cast("double")))

    val b = tileExplode(polys, ringCol, cell, maxCellsPerRow, gx, gy)

    p.join(b, Seq(gx, gy))
      .filter(stContains(col(ringCol), col(xCol).cast("double"),
        col(yCol).cast("double")))
      .drop(gx, gy)
  }

  /** Explode a polygon relation to the grid tiles its envelope overlaps
    * (each tile once), with the fan-out guard riding the sequence bound
    * so projection pruning can't skip it — shared by [[containsJoin]]
    * and [[intersectsJoin]]. */
  private def tileExplode(df: DataFrame, ringCol: String, cell: Double,
                          maxCellsPerRow: Long, gx: String, gy: String): DataFrame = {
    def tile(v: Column) = floor(v / cell).cast("long")
    val env = stEnvelope(col(ringCol))
    val gxLo = tile(env.getField("xmin"))
    val gxHi = tile(env.getField("xmax"))
    val gyLo = tile(env.getField("ymin"))
    val gyHi = tile(env.getField("ymax"))
    val tooMany = (gxHi - gxLo + 1) * (gyHi - gyLo + 1) > maxCellsPerRow
    def guarded(c: Column): Column = coalesce(
      when(tooMany, raise_error(concat(
        lit(s"polygon envelope spans more than $maxCellsPerRow cells of size $cell"),
        lit("")))).cast("long"),
      c)
    df.withColumn(gx, explode(sequence(gxLo, guarded(gxHi))))
      .withColumn(gy, explode(sequence(gyLo, guarded(gyHi))))
  }

  /** Polygon-polygon intersects JOIN: every (a, b) pair whose rings
    * intersect — the big×big spatial join the broadcast form of
    * [[stIntersects]] can't serve. Both sides explode to their
    * envelopes' grid tiles (guarded fan-out), ONE hash equi-join on the
    * tile key feeds the exact orientation/raycast test, and each
    * qualifying pair reports EXACTLY ONCE with NO distinct shuffle:
    * a pair is emitted only from the MIN COMMON TILE of the two
    * envelopes (the PBSM report-once rule — that tile is the
    * component-wise max of the lower tile corners, computable per
    * candidate row from the two rings alone, and always lies in the
    * shared-tile range). `inclusive = true` uses
    * [[stIntersectsInclusive]] so boundary-touching pairs count.
    *
    * Output: all columns of both sides (names must be disjoint). Scale
    * shape: candidates are O(Σ shared tiles), never |A|·|B|; size
    * `cell` near the typical polygon diameter so fan-out stays a few
    * tiles per row.
    *
    * PLANAR contract: coordinates tile a flat grid — unlike
    * [[Geo.radiusJoin]]'s lat/lng grid, the tiling does NOT wrap at
    * the ±180° antimeridian, so two lat/lng polygons meeting across
    * the dateline (one at +179.9°, one at −179.9°) land in far-apart
    * tiles and report disjoint. For dateline-straddling lat/lng data,
    * shift longitudes into one contiguous window first (e.g.
    * `pmod(lng + 360, 360)` re-centers the seam at 0°/360°); true
    * spherical polygon joins are out of scope (the geodesic family
    * covers points/radii, not polygon×polygon). */
  def intersectsJoin(as: DataFrame, ringColA: String,
                     bs: DataFrame, ringColB: String,
                     cell: Double, inclusive: Boolean = false,
                     maxCellsPerRow: Long = 1024L): DataFrame = {
    require(cell > 0, "cell must be positive")
    require(maxCellsPerRow > 0, "maxCellsPerRow must be positive")
    val overlap = as.columns.toSet.intersect(bs.columns.toSet)
    require(overlap.isEmpty, s"columns ${overlap.mkString(",")} appear on both sides")
    val fresh = freshNames(as.columns ++ bs.columns)
    val (gx, gy) = (fresh("gx"), fresh("gy"))
    def tile(v: Column) = floor(v / cell).cast("long")

    val ja = tileExplode(as, ringColA, cell, maxCellsPerRow, gx, gy)
    val jb = tileExplode(bs, ringColB, cell, maxCellsPerRow, gx, gy)
    val envA = stEnvelope(col(ringColA))
    val envB = stEnvelope(col(ringColB))
    val minCommonX = greatest(tile(envA.getField("xmin")), tile(envB.getField("xmin")))
    val minCommonY = greatest(tile(envA.getField("ymin")), tile(envB.getField("ymin")))
    val test =
      if (inclusive) stIntersectsInclusive(col(ringColA), col(ringColB))
      else stIntersects(col(ringColA), col(ringColB))
    ja.join(jb, Seq(gx, gy))
      .filter(col(gx) === minCommonX && col(gy) === minCommonY)
      .filter(test)
      .drop(gx, gy)
  }

  /** Collision-free working-column namer over the union of both sides'
    * columns — the [[Sampling]] freshNamer discipline: a caller frame
    * already carrying a `__graft_*` name must never be clobbered by a
    * withColumn or made ambiguous by the grid equi-join. */
  private def freshNames(taken: Iterable[String]): String => String = {
    val t = taken.toSet
    base => Iterator.from(0).map(i => s"__graft_${base}_$i").filterNot(t).next()
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boolean where-clause atoms — the reference's `Predicate`
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/query/query/QueryObject.scala:29-74`).
  *
  * The reference renders predicates to a SQL string by concatenation
  * (`Predicate.sqlString`, `:55-73` — injection-prone and opaque to the
  * optimizer across operator boundaries). We build Catalyst `Column`
  * predicates instead: Catalyst pushes them into the Parquet scan
  * (`PushedFilters` in explain) and they compose with any plan.
  *
  * Semantics preserved: multi-value `=` becomes `IN`, `!=` becomes `NOT IN`,
  * atoms combine conjunctively (AND), matching `QueryObject.scala:43-52`.
  */
object BooleanPredicates {

  final case class Predicate(attribute: String, op: String, values: Seq[Any])

  def toColumn(p: Predicate): Column = {
    val c = col(p.attribute)
    val op = p.op.toLowerCase(java.util.Locale.ROOT).trim
    def v: Any = {
      require(p.values.nonEmpty,
        s"predicate '$op' on '${p.attribute}' requires at least one value")
      p.values.head
    }
    op match {
      case "=" | "==" | "in" =>
        if (p.values.size == 1) c === lit(v) else c.isin(p.values: _*)
      case "!=" | "<>" =>
        if (p.values.size == 1) c =!= lit(v) else !c.isin(p.values: _*)
      case "<"  => c < lit(v)
      case "<=" => c <= lit(v)
      case ">"  => c > lit(v)
      case ">=" => c >= lit(v)
      case "like" => c.like(v.toString)
      case "isnull" => c.isNull
      case "isnotnull" => c.isNotNull
      // PostGIS-role predicates (the reference's GEOMETRYTYPE attributes
      // query through PostGIS WHERE pass-through; here they evaluate
      // in-engine on a WKT point attribute and compose/push like any
      // other atom). st_within: value = polygon WKT. st_dwithin:
      // values = [geometry WKT (POINT|LINESTRING|POLYGON), distance].
      case "st_within" =>
        val (px, py) = (Geo.wktLng(c), Geo.wktLat(c))
        GeoAlgebra.stContainsWktLiteral(v.toString, px, py)
      // boundary-inclusive variant (PostGIS ST_Covers): edge/vertex
      // points count as inside — value = polygon WKT
      case "st_covers" =>
        val (px, py) = (Geo.wktLng(c), Geo.wktLat(c))
        GeoAlgebra.stCoversWkt(lit(v.toString), px, py)
      // geodesic within-distance (PostGIS ST_DWithin(geography)):
      // values = [point WKT, meters] on the R = 6371 km sphere
      case "st_dwithin_geo" =>
        require(p.values.size == 2,
          s"st_dwithin_geo on '${p.attribute}' needs [point wkt, meters]")
        Geo.stDWithinGeo(c, lit(v.toString), lit(p.values(1).toString.toDouble))
      case "st_dwithin" =>
        require(p.values.size == 2,
          s"st_dwithin on '${p.attribute}' needs [wkt, distance]")
        val wkt = v.toString
        val dist = p.values(1).toString.toDouble
        val (px, py) = (Geo.wktLng(c), Geo.wktLat(c))
        val d =
          if (wkt.startsWith("POLYGON")) GeoAlgebra.stDistance(
            GeoAlgebra.wktPolygonRing(lit(wkt)), px, py)
          else if (wkt.startsWith("LINESTRING")) GeoAlgebra.stDistanceLine(
            GeoAlgebra.wktLineString(lit(wkt)), px, py)
          else {
            val q = lit(wkt)
            val dx = px - Geo.wktLng(q)
            val dy = py - Geo.wktLat(q)
            sqrt(dx * dx + dy * dy)
          }
        d <= dist
      case other => throw new IllegalArgumentException(s"unsupported predicate op: $other")
    }
  }

  /** Conjunction of atoms (the reference ANDs its where-clause list). */
  def conjunction(ps: Seq[Predicate]): Column =
    ps.map(toColumn).reduceOption(_ && _).getOrElse(lit(true))
}

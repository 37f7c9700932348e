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

  private val PointRe = "^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$"

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

  /** Great-circle distance in meters between two (lat, lng) pairs —
    * scalar twin of `Distances.haversine`. */
  def haversineMeters(latA: Column, lngA: Column, latB: Column, lngB: Column): Column = {
    val earthR = lit(6371000.0)
    def lat(v: Column) = radians(greatest(lit(-90.0), least(lit(90.0), v.cast("double"))))
    def lng(v: Column) = {
      val wrapped = (v.cast("double") % 360.0 + 360.0) % 360.0
      radians(when(wrapped >= 180.0, wrapped - 360.0).otherwise(wrapped))
    }
    val dPhi = lat(latB) - lat(latA)
    val dLam = lng(lngB) - lng(lngA)
    val h = pow(sin(dPhi / 2), 2) + cos(lat(latA)) * cos(lat(latB)) * pow(sin(dLam / 2), 2)
    lit(2.0) * earthR * atan2(sqrt(h), sqrt(lit(1.0) - h))
  }

  /** Radius predicate: point within `meters` of (qLat, qLng). */
  def withinRadius(lat: Column, lng: Column, qLat: Column, qLng: Column,
                   meters: Column): Column =
    haversineMeters(lat, lng, qLat, qLng) <= meters
}

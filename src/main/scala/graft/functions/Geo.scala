package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo-distance primitives for the query DSL — the Spark re-expression
  * of ES's `geo_distance` filter and geo decay scoring over geo_point
  * fields. The reference ships geo_point columns in its own fixtures
  * (reference tests/__init__.py:38-74, the flights OriginLocation) and
  * passes raw geo DSL through to the engine
  * (eland/query_compiler.py:490-491); until now EsQueryDsl refused the
  * clause.
  *
  * Model: a geo point is a STRUCT column with `lat`/`lon` DOUBLE
  * subfields (the parquet-native spelling of ES's geo_point object
  * form). Distance is the haversine great-circle approximation on the
  * mean-radius sphere (R = 6 371 000 m — ES's GeoUtils mean earth
  * radius), written as one fixed expression tree that a DuckDB oracle
  * mirrors operation-for-operation (radians/sin/cos/asin/sqrt exist in
  * both engines).
  *
  * Cross-engine float discipline (the f24 decay-gate analysis, scaled
  * to this value range): sin/cos/asin are libm-dependent (≤ 1 ulp
  * drift), so a megameter-scale distance carries ~1e-9 m of
  * cross-engine noise. FILTER comparisons against a fixed radius are
  * safe with raw doubles (a flip needs the true distance within the
  * noise band of the radius — measure-zero for integer-derived
  * fixtures). Distance VALUES exported for comparison should round no
  * finer than ~1 m granularity (`round(km, 3)`) so the noise cannot
  * straddle a rounding tie; 6-dp METER rounding would flip with
  * probability ~1e-3 per row. Decay SCORES are O(1) values, where the
  * f24 6-dp rounding is safe as-is.
  */
object Geo {

  /** ES GeoUtils.EARTH_MEAN_RADIUS (meters). */
  val EarthRadiusMeters: Double = 6371000.0

  /** Haversine distance in meters between (lat1, lon1) and
    * (lat2, lon2), degrees in, as one fixed Column tree:
    *
    *   a = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)
    *   d = 2R · asin(√min(a, 1))
    *
    * The min-1 clamp keeps near-antipodal rounding (a = 1 + ulp) from
    * producing NaN. NULL in any coordinate → NULL distance (which a
    * filter drops — ES's missing-field semantics).
    */
  def haversineMeters(lat1: Column, lon1: Column,
                      lat2: Column, lon2: Column): Column = {
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(2.0 * EarthRadiusMeters) * asin(sqrt(least(a, lit(1.0))))
  }

  /** [[haversineMeters]] from a geo-point STRUCT column (`lat`/`lon`
    * subfields) to a fixed origin — the DSL-clause shape.
    */
  def distanceToMeters(point: Column, originLat: Double,
                       originLon: Double): Column =
    haversineMeters(lit(originLat), lit(originLon),
      point.getField("lat").cast("double"),
      point.getField("lon").cast("double"))

  /** ES distance-unit string → meters: "200km", "5000m", "10mi",
    * "3NM", or a bare number (meters — the ES default unit). The
    * engine-portable subset; unknown units refuse loudly.
    */
  def parseDistanceMeters(s: String): Double = {
    val t = s.trim
    val m = "^([0-9]*\\.?[0-9]+)\\s*([A-Za-z]*)$".r
    t match {
      case m(num, unit) =>
        val v = num.toDouble
        unit.toLowerCase(java.util.Locale.ROOT) match {
          case "" | "m" | "meters"      => v
          case "km" | "kilometers"      => v * 1000.0
          case "mi" | "miles"           => v * 1609.344
          case "nm" | "nmi"             => v * 1852.0
          case "cm"                     => v / 100.0
          case "mm"                     => v / 1000.0
          case "ft" | "feet"            => v * 0.3048
          case "yd" | "yards"           => v * 0.9144
          case "in" | "inch"            => v * 0.0254
          case u => throw new IllegalArgumentException(
            s"unknown distance unit '$u' in '$s' (m, km, mi, nm, cm, " +
              "mm, ft, yd, in)")
        }
      case _ => throw new IllegalArgumentException(
        s"cannot parse distance '$s' (expected <number><unit>, e.g. " +
          "\"200km\")")
    }
  }
}

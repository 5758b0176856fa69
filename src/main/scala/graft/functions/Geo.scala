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

  /** Meters per degree of great-circle arc on the mean sphere:
    * R·π∕180 ≈ 111 194.93. `R·|Δlat°|·MetersPerDegree` is an exact
    * LOWER bound on the distance between two points, which is what
    * makes the cell enumeration below provably covering.
    */
  val MetersPerDegree: Double = EarthRadiusMeters * math.Pi / 180.0

  /** Integer grid cell of a geo point at `cellDeg` resolution — the
    * engine's geohash-grid analog, as ONE packed long so it can be a
    * parquet partition column: latCell·nLon + lonCell with
    * latCell = floor((lat + 90) ∕ cellDeg),
    * lonCell = floor((lon + 180) ∕ cellDeg),
    * nLon = ceil(360 ∕ cellDeg). Pure floor arithmetic over the same
    * doubles on every engine (and in [[cellIdOf]], the driver twin),
    * so layout and query planning can never disagree on a cell.
    *
    * Domain-edge points clamp INTO range: lat = 90 and lon = 180 land
    * in the last row/column of the grid rather than aliasing to a
    * neighboring cell's packed id (lonCell = nLon would pack as
    * (latCell+1, 0)) — so cell ids are safe for any consumer
    * (cell-level aggregation, partition layout), not just the
    * radius read whose ±1 widening happened to absorb the alias.
    */
  def cellId(point: Column, cellDeg: Double): Column = {
    requireCellDeg(cellDeg)
    val nLon = math.ceil(360.0 / cellDeg).toLong
    val nLat = math.ceil(180.0 / cellDeg).toLong
    // greatest/least IGNORE nulls, so clamp behind an isNotNull gate —
    // a null point must keep digesting to a null cell (the null-drop
    // contract of GeoLayout.writeCellPartitioned)
    def clamp(raw: Column, max: Long): Column =
      when(raw.isNotNull, greatest(lit(0L), least(lit(max), raw)))
    val latC = clamp(floor((point.getField("lat").cast("double") + 90.0)
      / cellDeg).cast("long"), nLat - 1)
    val lonC = clamp(floor((point.getField("lon").cast("double") + 180.0)
      / cellDeg).cast("long"), nLon - 1)
    latC * nLon + lonC
  }

  /** Driver twin of [[cellId]] (same doubles, same floors, same
    * domain-edge clamp).
    */
  def cellIdOf(lat: Double, lon: Double, cellDeg: Double): Long = {
    requireCellDeg(cellDeg)
    val nLon = math.ceil(360.0 / cellDeg).toLong
    val nLat = math.ceil(180.0 / cellDeg).toLong
    val latC = math.max(0L, math.min(nLat - 1,
      math.floor((lat + 90.0) / cellDeg).toLong))
    val lonC = math.max(0L, math.min(nLon - 1,
      math.floor((lon + 180.0) / cellDeg).toLong))
    latC * nLon + lonC
  }

  private def requireCellDeg(cellDeg: Double): Unit =
    require(cellDeg > 0 && cellDeg <= 90,
      s"cellDeg must be in (0, 90], got $cellDeg")

  /** The candidate cells a `radiusMeters` disk around the origin can
    * touch — a PROVABLY COVERING superset, enumerated driver-side:
    *
    *  - latitude band: |Δlat°| ≤ r ∕ [[MetersPerDegree]] (exact: the
    *    meridian arc is never longer than the great circle),
    *  - longitude width from the haversine inequality
    *    sin²(d∕2R) ≥ cosφ₁·cosφ₂·sin²(Δλ∕2):
    *    Δλ ≤ 2·asin(sin(r∕2R) ∕ √(cosφ₀·min cosφ over the band)) —
    *    correct arbitrarily close to the poles, where the naive
    *    r∕(R·cosφ) parallel-arc bound UNDER-covers (two near-pole
    *    points 180° apart are close on the great circle); a band
    *    touching a pole or an argument ≥ 1 degrades to all
    *    longitudes,
    *  - each side widened by one cell (float paranoia — the exact
    *    haversine verify downstream makes over-coverage free),
    *  - antimeridian wrap handled by floorMod cell indices.
    *
    * Refuses loudly past `maxCells` (a radius∕cellDeg mismatch would
    * otherwise enumerate the planet).
    */
  def cellsWithinRadius(originLat: Double, originLon: Double,
                        radiusMeters: Double, cellDeg: Double,
                        maxCells: Int = 100000): Seq[Long] = {
    requireCellDeg(cellDeg)
    require(radiusMeters >= 0, s"negative radius $radiusMeters")
    val nLon = math.ceil(360.0 / cellDeg).toLong
    val dLat = radiusMeters / MetersPerDegree
    val latLo = math.max(-90.0, originLat - dLat)
    val latHi = math.min(90.0, originLat + dLat)
    val latCellLo = math.floor((latLo + 90.0) / cellDeg).toLong - 1
    val latCellHi = math.floor((latHi + 90.0) / cellDeg).toLong + 1
    val maxAbsLat = math.max(math.abs(latLo), math.abs(latHi))
    val cosBand = math.cos(math.toRadians(maxAbsLat))
    val cosO = math.cos(math.toRadians(originLat))
    val sinHalf = math.sin(radiusMeters / (2.0 * EarthRadiusMeters))
    val denom = math.sqrt(math.max(0.0, cosO * cosBand))
    val fullWrap = latLo <= -90.0 + 1e-12 || latHi >= 90.0 - 1e-12 ||
      denom <= 1e-12 || sinHalf / denom >= 1.0
    val lonCells: Seq[Long] =
      if (fullWrap) 0L until nLon
      else {
        val dLon = 2.0 * math.toDegrees(math.asin(sinHalf / denom))
        val lo = math.floor((originLon - dLon + 180.0) / cellDeg).toLong - 1
        val hi = math.floor((originLon + dLon + 180.0) / cellDeg).toLong + 1
        if (hi - lo + 1 >= nLon) 0L until nLon
        else (lo to hi).map(c => java.lang.Math.floorMod(c, nLon))
      }
    val latCells = latCellLo to latCellHi
    val total = latCells.length.toLong * lonCells.length
    require(total <= maxCells,
      s"radius $radiusMeters m at cellDeg $cellDeg enumerates $total " +
        s"cells (> $maxCells) — coarsen the grid or raise maxCells")
    for (la <- latCells; lo <- lonCells) yield la * nLon + lo
  }

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

  /** ES `geo_centroid` aggregation: per group, the arithmetic mean of
    * the member points' coordinates plus the contributing count —
    * (groupCols…, centroid_lat, centroid_lon, n_points). Rows whose
    * point (or either coordinate) is null are excluded, like docs
    * missing the field in ES. Coordinates round at 6 dp (~0.1 m — the
    * repo's geo value granularity; ES emits raw doubles, the rounding
    * is this engine's cross-engine determinism discipline). One
    * map-side-combined aggregate — the centroid of 100 TB of points
    * costs the scan.
    */
  def geoCentroid(df: org.apache.spark.sql.DataFrame, pointCol: String,
                  groupCols: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    val p = col(pointCol)
    val ok = p.isNotNull && p.getField("lat").isNotNull &&
      p.getField("lon").isNotNull
    val lat = when(ok, p.getField("lat").cast("double"))
    val lon = when(ok, p.getField("lon").cast("double"))
    val aggs = Seq(
      round(avg(lat), 6).as("centroid_lat"),
      round(avg(lon), 6).as("centroid_lon"),
      count(lat).cast("long").as("n_points"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** ES `geo_bounds` aggregation: per group, the smallest bounding
    * box containing every member point — (groupCols…, top, bottom,
    * left_lon, right_lon, n_points). Latitude bounds are plain
    * min/max. Longitude follows ES's `wrap_longitude: true` rule
    * (the one subtlety of this agg): track min/max of the
    * NON-NEGATIVE and NEGATIVE longitudes separately, then pick the
    * narrower of the two candidate boxes — unwrapped [negLeft,
    * posRight] (width posRight − negLeft) vs the
    * ANTIMERIDIAN-CROSSING [posLeft, negRight] (width 360 − posLeft
    * + negRight); ties keep the unwrapped box (ES's `<=`). A
    * crossing box reports left_lon > right_lon, exactly ES's
    * top_left/bottom_right wrap encoding (the f30 bbox-wrap query is
    * the round trip). `wrapLongitude = false` always returns the
    * unwrapped box. Rows with a null point/coordinate are excluded
    * like docs missing the field.
    *
    * Scale shape: ONE map-side-combined aggregate of six conditional
    * min/max cells + a count — the bounds of 100 TB of points cost
    * the scan; the wrap decision is per-GROUP arithmetic on the
    * reduced row.
    */
  def geoBounds(df: org.apache.spark.sql.DataFrame, pointCol: String,
                groupCols: Seq[String] = Nil,
                wrapLongitude: Boolean = true)
      : org.apache.spark.sql.DataFrame = {
    val p = col(pointCol)
    val ok = p.isNotNull && p.getField("lat").isNotNull &&
      p.getField("lon").isNotNull
    val lat = when(ok, p.getField("lat").cast("double"))
    val lon = when(ok, p.getField("lon").cast("double"))
    val aggs = Seq(
      max(lat).as("top"), min(lat).as("bottom"),
      min(when(lon >= 0, lon)).as("_pl"),
      max(when(lon >= 0, lon)).as("_pr"),
      min(when(lon < 0, lon)).as("_nl"),
      max(when(lon < 0, lon)).as("_nr"),
      count(lat).cast("long").as("n_points"))
    val cells =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val wrapNarrower =
      if (!wrapLongitude) lit(false)
      else (col("_pr") - col("_nl")) >
        (lit(360.0) - col("_pl") + col("_nr"))
    val left = when(col("_pl").isNull, col("_nl"))
      .when(col("_nl").isNull, col("_pl"))
      .when(wrapNarrower, col("_pl")).otherwise(col("_nl"))
    val right = when(col("_pl").isNull, col("_nr"))
      .when(col("_nl").isNull, col("_pr"))
      .when(wrapNarrower, col("_nr")).otherwise(col("_pr"))
    cells.select(groupCols.map(col) ++ Seq(
      col("top"), col("bottom"), left.as("left_lon"),
      right.as("right_lon"), col("n_points")): _*)
  }

  /** Point-in-polygon — the `geo_polygon` query's containment test,
    * as Franklin's PNPOLY ray cast (crossing-parity of the eastward
    * horizontal ray) unrolled over the polygon's vertex literals: one
    * comparison + one interpolated crossing test per edge, pure
    * codegen arithmetic, identical expression on any engine. The test
    * is planar over raw degrees — exactly ES's `geo_polygon`
    * (Lucene's tessellated containment is likewise planar per
    * triangle); polygons spanning a pole or the antimeridian must be
    * pre-split by the caller (the same contract as the bbox wrap —
    * refused implicitly since the ray cast would read the wrong
    * side). Boundary points follow the strict ray-cast inequalities
    * (edges are half-open — a shared vertex counts once, the standard
    * PNPOLY behavior). NULL coordinates → false (ES's missing-field
    * semantics under a filter).
    */
  def pointInPolygon(lat: Column, lon: Column,
                     polygon: Seq[(Double, Double)]): Column = {
    require(polygon.size >= 3,
      s"polygon needs at least 3 vertices, got ${polygon.size}")
    require(polygon.forall { case (la, lo) =>
      la >= -90 && la <= 90 && lo >= -180 && lo <= 180 },
      s"polygon vertices out of (lat, lon) domain: $polygon")
    val crossings = polygon.indices.map { i =>
      val (y1, x1) = polygon(i)
      val (y2, x2) = polygon((i + 1) % polygon.size)
      if (y1 == y2) lit(false) // horizontal edge never crosses the ray
      else ((lit(y1) > lat) =!= (lit(y2) > lat)) &&
        (lon < lit(x2 - x1) * (lat - y1) / lit(y2 - y1) + x1)
    }
    coalesce(
      crossings.map(c => when(c, 1).otherwise(0)).reduce(_ + _) % 2 === 1,
      lit(false))
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0, 0.0), (2L, 1.0, 0.0), (3L, 0.0, 1.0),
    (4L, 52.52, 13.405),   // Berlin
    (5L, 48.8566, 2.3522), // Paris
    (6L, -33.8688, 151.2093)) // Sydney
    .toDF("id", "lat", "lon")
    .withColumn("loc", struct(col("lat"), col("lon")))

  test("haversine hits the textbook references") {
    val d = points.select(col("id"),
      Geo.haversineMeters(lit(0.0), lit(0.0), col("lat"), col("lon"))
        .as("m")).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // one degree of latitude (or equatorial longitude) on the mean
    // sphere: R * pi/180 = 111194.93 m
    assert(math.abs(d(2L) - 111194.93) < 1.0, d(2L))
    assert(math.abs(d(3L) - 111194.93) < 1.0, d(3L))
    assert(d(1L) == 0.0)
    // Berlin <-> Paris: ~877.46 km on the mean sphere
    val bp = points.filter($"id" === 4L).select(
      Geo.haversineMeters(lit(48.8566), lit(2.3522), col("lat"), col("lon")))
      .head().getDouble(0)
    assert(math.abs(bp / 1000.0 - 877.46) < 1.0, bp)
  }

  test("distance unit parsing: the portable subset, loud on the rest") {
    assert(Geo.parseDistanceMeters("2000km") == 2000000.0)
    assert(Geo.parseDistanceMeters("1.5 km") == 1500.0)
    assert(Geo.parseDistanceMeters("500") == 500.0)
    assert(Geo.parseDistanceMeters("500m") == 500.0)
    assert(Geo.parseDistanceMeters("1mi") == 1609.344)
    assert(Geo.parseDistanceMeters("1NM") == 1852.0)
    assert(Geo.parseDistanceMeters("30cm") == 0.3)
    assert(intercept[IllegalArgumentException](
      Geo.parseDistanceMeters("3 parsecs")).getMessage.contains("unit"))
    assert(intercept[IllegalArgumentException](
      Geo.parseDistanceMeters("km")).getMessage.contains("cannot parse"))
  }

  test("geo_distance DSL: every origin spelling, radius semantics, " +
      "null point drops") {
    val df = points.unionByName(
      Seq((9L, Option.empty[Double], Option.empty[Double]))
        .toDF("id", "lat", "lon")
        .withColumn("loc",
          when(lit(false), struct(col("lat"), col("lon")))))
    def ids(json: String): Seq[Long] =
      df.filter(EsQueryDsl.toColumn(json)).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
    val objForm =
      """{"geo_distance": {"distance": "200km",
        |                  "loc": {"lat": 0.5, "lon": 0.0}}}""".stripMargin
    // within 200 km of (0.5, 0): ids 1 and 2 (55.6 km each); 3 is
    // ~124.7 km... sqrt(55.6^2+111.2^2) -> inside too
    assert(ids(objForm) == Seq(1L, 2L, 3L))
    val strForm =
      """{"geo_distance": {"distance": "60km", "loc": "0.5,0.0"}}"""
    assert(ids(strForm) == Seq(1L, 2L))
    val arrForm = // GeoJSON [lon, lat]
      """{"geo_distance": {"distance": "60km", "loc": [0.0, 0.5]}}"""
    assert(ids(arrForm) == Seq(1L, 2L))
    // meters are the default unit for bare numbers
    assert(ids("""{"geo_distance": {"distance": 60000,
                   "loc": "0.5,0.0"}}""") == Seq(1L, 2L))
    // refusals: plane metric, geohash origin, two fields
    assert(intercept[IllegalArgumentException](ids(
      """{"geo_distance": {"distance": "1km", "distance_type": "plane",
           "loc": {"lat": 0, "lon": 0}}}""")).getMessage
      .contains("arc"))
    assert(intercept[IllegalArgumentException](ids(
      """{"geo_distance": {"distance": "1km", "loc": "u33dc0"}}"""))
      .getMessage.contains("geo point"))
    assert(intercept[IllegalArgumentException](ids(
      """{"geo_distance": {"distance": "1km",
           "a": {"lat": 0, "lon": 0}, "b": {"lat": 0, "lon": 0}}}"""))
      .getMessage.contains("exactly one field"))
  }

  test("geo_bounding_box: corner and flat spellings, inclusive edges, " +
      "antimeridian wrap") {
    def ids(json: String): Seq[Long] =
      points.filter(EsQueryDsl.toColumn(json)).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
    val corners =
      """{"geo_bounding_box": {"loc": {
        |  "top_left": {"lat": 1.0, "lon": 0.0},
        |  "bottom_right": {"lat": 0.0, "lon": 1.0}}}}""".stripMargin
    // edges are inclusive: all three unit-square points qualify
    assert(ids(corners) == Seq(1L, 2L, 3L))
    val flat =
      """{"geo_bounding_box": {"loc": {
        |  "top": 0.5, "left": -1, "bottom": -1, "right": 1}}}""".stripMargin
    assert(ids(flat) == Seq(1L, 3L))
    // Berlin box catches only Berlin
    assert(ids(
      """{"geo_bounding_box": {"loc": {
        |  "top_left": [13.0, 53.0],
        |  "bottom_right": [14.0, 52.0]}}}""".stripMargin) == Seq(4L))
    // left > right IS ES's antimeridian-crossing box: two lon ranges
    // OR'd — [150, 180] ∪ [-180, -170] catches Sydney (151.2) only
    assert(ids(
      """{"geo_bounding_box": {"loc": {
        |  "top_left": {"lat": 10, "lon": 150},
        |  "bottom_right": {"lat": -60, "lon": -170}}}}""".stripMargin)
      == Seq(6L))
    // the same wrap excluding Sydney's longitude catches nothing
    assert(ids(
      """{"geo_bounding_box": {"loc": {
        |  "top_left": {"lat": 10, "lon": 160},
        |  "bottom_right": {"lat": -60, "lon": -170}}}}""".stripMargin)
      .isEmpty)
  }

  test("gauss geo decay: 1.0 at origin (and inside offset), = decay at " +
      "offset + scale, 1.0 on a null point") {
    val df = points.unionByName(
      Seq((9L, Option.empty[Double], Option.empty[Double]))
        .toDF("id", "lat", "lon")
        .withColumn("loc",
          when(lit(false), struct(col("lat"), col("lon")))))
    val scored = graft.api.GraftFrame(df, "id").esQueryScored(
      """{"function_score": {
        |  "query": {"match_all": {}},
        |  "functions": [
        |    {"gauss": {"loc": {"origin": {"lat": 0, "lon": 0},
        |                       "scale": "100km", "offset": "10km"}}}
        |  ],
        |  "boost_mode": "multiply"
        |}}""".stripMargin,
      matchOnlyTextFields = false)
      .df.select(col("id"), col("_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) == 1.0)          // at origin
    assert(scored(9L) == 1.0)          // null point -> ES's 1.0
    // id 2 is 111.195 km out: dist-offset = 101.195 km, just past
    // scale -> slightly under the 0.5 decay value
    assert(scored(2L) < 0.5 && scored(2L) > 0.45, scored(2L))
    assert(scored(6L) < 1e-6)          // Sydney: essentially zero
    // exp and linear geo legs parse too and decay monotonically
    for (kind <- Seq("exp", "linear")) {
      val s2 = graft.api.GraftFrame(df.filter($"id" <= 3), "id")
        .esQueryScored(
          s"""{"function_score": {
             |  "query": {"match_all": {}},
             |  "functions": [
             |    {"$kind": {"loc": {"origin": "0.0,0.0",
             |                       "scale": "200km"}}}
             |  ],
             |  "boost_mode": "multiply"
             |}}""".stripMargin,
          matchOnlyTextFields = false)
        .df.select(col("id"), col("_score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(s2(1L) == 1.0, s"$kind at origin")
      assert(s2(2L) < 1.0 && s2(2L) > 0.0, s"$kind decays")
    }
  }

  test("pointInPolygon: PNPOLY parity on convex, concave, null, DSL") {
    val pts = Seq(
      (1L, Some(5.0), Some(5.0)),    // inside the square
      (2L, Some(15.0), Some(5.0)),   // outside (north)
      (3L, Some(2.0), Some(9.0)),    // inside square, outside concave
      (4L, None, Some(1.0)),         // null lat
      (5L, Some(-5.0), Some(-5.0)))  // outside (southwest)
      .toDF("id", "lat", "lon")
    val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    def in(poly: Seq[(Double, Double)]): Set[Long] =
      pts.filter(Geo.pointInPolygon(col("lat"), col("lon"), poly))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(in(square) == Set(1L, 3L))
    // concave "C" shape: square with a bite from the east at
    // lat 1..9, lon 4..10 — (2, 9) falls in the bite, (5,...) wait:
    // bite spans lat 1..9 lon 4..10, so (5, 5) is IN the bite too;
    // (2, 9)? lat 2 in [1,9], lon 9 in [4,10] → bite. Use (0.5, 9):
    val concave = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (1.0, 4.0),
      (1.0, 9.0), (10.0, 9.0), (10.0, 10.0), (0.0, 10.0))
    val withEdge = pts.unionByName(
      Seq((6L, Some(0.5), Some(9.0))).toDF("id", "lat", "lon"))
    val got = withEdge.filter(Geo.pointInPolygon(col("lat"), col("lon"),
      concave)).select("id").collect().map(_.getLong(0)).toSet
    // (5,5) sits in the bite → out; (0.5, 9) is below the bite → in;
    // (2, 9) lies exactly ON the bite's east edge — the strict
    // ray-cast inequality does not count a point's own edge, so the
    // boundary point resolves INSIDE via the outer wall (the
    // documented half-open-edge behavior)
    assert(got == Set(3L, 6L), got)
    // DSL face over a struct field
    import graft.api.GraftFrame
    val f = GraftFrame(pts.select(col("id"),
      struct(col("lat"), col("lon")).as("loc")), "id")
    assert(f.esQuery(
      """{"geo_polygon": {"loc": {"points": [
        |  {"lat": 0, "lon": 0}, {"lat": 10, "lon": 0},
        |  {"lat": 10, "lon": 10}, {"lat": 0, "lon": 10}]}}}"""
        .stripMargin).df.select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 3L))
    intercept[IllegalArgumentException](f.esQuery(
      """{"geo_polygon": {"loc": {"points": [
        |  {"lat": 0, "lon": 0}, {"lat": 10, "lon": 0}]}}}"""
        .stripMargin))
    intercept[IllegalArgumentException](
      Geo.pointInPolygon(col("lat"), col("lon"),
        Seq((0.0, 0.0), (95.0, 0.0), (0.0, 10.0))))
  }

  test("geoBounds: wrap_longitude picks the narrower box, ties unwrapped") {
    def pts(rows: (String, Double, Double)*) = rows.toSeq
      .toDF("g", "lat", "lon")
      .withColumn("loc", struct(col("lat"), col("lon")))
    def one(df: org.apache.spark.sql.DataFrame, wrap: Boolean = true) = {
      val r = Geo.geoBounds(df, "loc", Seq("g"), wrap).collect().head
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getLong(5))
    }
    // cluster at the antimeridian: wrapped box [170, -170] (width 20)
    // beats unwrapped [-170, 170] (width 340) → left > right
    val am = pts(("a", 10.0, 170.0), ("a", -5.0, -170.0))
    assert(one(am) == (10.0, -5.0, 170.0, -170.0, 2L))
    // wrap_longitude = false keeps the unwrapped box
    assert(one(am, wrap = false) == (10.0, -5.0, -170.0, 170.0, 2L))
    // widths equal (unwrapped 180 vs wrapped 180): ES's <= keeps
    // the unwrapped box
    assert(one(pts(("a", 0.0, 90.0), ("a", 0.0, -90.0))) ==
      (0.0, 0.0, -90.0, 90.0, 2L))
    // single-sign longitudes: plain min/max, no wrap decision
    assert(one(pts(("a", 1.0, 20.0), ("a", 2.0, 40.0))) ==
      (2.0, 1.0, 20.0, 40.0, 2L))
    assert(one(pts(("a", 1.0, -20.0), ("a", 2.0, -40.0))) ==
      (2.0, 1.0, -40.0, -20.0, 2L))
    // null points drop like ES's missing-field docs
    val withNull = Seq(("a", Some(1.0), Some(5.0)),
      ("a", None: Option[Double], None: Option[Double]))
      .toDF("g", "lat", "lon")
      .withColumn("loc", when(col("lat").isNotNull,
        struct(col("lat"), col("lon"))))
    assert(one(withNull) == (1.0, 1.0, 5.0, 5.0, 1L))
    // global (no group) face
    val g = Geo.geoBounds(pts(("a", 3.0, 7.0)), "loc").collect().head
    assert(g.getDouble(0) == 3.0 && g.getLong(4) == 1L)
  }
}

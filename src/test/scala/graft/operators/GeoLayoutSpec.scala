package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.functions.Geo

class GeoLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit(); f.toString
  }

  // deterministic pseudo-random points covering poles and the
  // antimeridian neighbourhood — the regions where a naive
  // parallel-arc longitude bound under-covers
  private def randomPoints(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, rnd.nextDouble() * 180.0 - 90.0,
        rnd.nextDouble() * 360.0 - 180.0)
    }.toDF("id", "lat", "lon")
      .withColumn("loc", struct(col("lat"), col("lon")))
  }

  test("cellId: Column and driver twins agree; cells partition the globe") {
    val pts = randomPoints(500, 7)
    val got = pts.select(col("lat"), col("lon"),
      Geo.cellId(col("loc"), 15.0).as("c")).collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        Geo.cellIdOf(r.getDouble(0), r.getDouble(1), 15.0))
    }
    assert(intercept[IllegalArgumentException](
      Geo.cellIdOf(0, 0, 0.0)).getMessage.contains("cellDeg"))
  }

  test("covering enumeration: pruned radius read == full-scan filter, " +
      "including near-pole and antimeridian origins") {
    val pts = randomPoints(3000, 42)
    val dir = tmp("graft-geolayout")
    GeoLayout.writeCellPartitioned(pts, "loc", dir, cellDeg = 10.0)
    val cases = Seq(
      (10.0, 20.0, 2000e3),   // mid-latitude
      (87.0, 5.0, 1500e3),    // near-pole: parallel-arc bound would lose
      (-85.0, 100.0, 800e3),  // near south pole
      (0.0, 179.5, 1200e3),   // antimeridian wrap
      (45.0, -179.9, 600e3),  // wrap the other way
      (52.0, 13.0, 50e3),     // small radius
      (0.0, 0.0, 0.0))        // zero radius
    for ((la, lo, r) <- cases) {
      val pruned = GeoLayout.readWithinRadius(spark, dir, la, lo, r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      val full = pts.filter(
          Geo.distanceToMeters(col("loc"), la, lo) <= r)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
      assert(pruned == full, s"origin ($la, $lo) r $r")
    }
    // a band touching the pole degrades to all longitudes, still exact
    val allLon = Geo.cellsWithinRadius(89.5, 0.0, 500e3, 10.0)
    assert(allLon.nonEmpty)
  }

  test("the cell predicate prunes partition directories at planning time") {
    val pts = randomPoints(2000, 11)
    val dir = tmp("graft-geolayout-prune")
    GeoLayout.writeCellPartitioned(pts, "loc", dir, cellDeg = 15.0)
    val df = GeoLayout.readWithinRadius(spark, dir, 10.0, 20.0, 1500e3)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "no PartitionFilters — the cell IN-list is not pruning")
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters).length
    val total = scan.relation.location.listFiles(Nil, Nil).length
    assert(selected < total,
      s"selected $selected of $total partitions — nothing pruned")
  }

  test("contracts: meta required, cell blowup refused, null points drop") {
    val e = intercept[IllegalArgumentException] {
      GeoLayout.readWithinRadius(spark, tmp("graft-geolayout-bare"),
        0, 0, 1000)
    }
    assert(e.getMessage.contains("_geo_meta"))
    val blow = intercept[IllegalArgumentException] {
      Geo.cellsWithinRadius(0, 0, 2.0e7, 0.01)
    }
    assert(blow.getMessage.contains("cells"), blow.getMessage)
    val withNull = randomPoints(10, 3).unionByName(
      Seq((99L, Option.empty[Double], Option.empty[Double]))
        .toDF("id", "lat", "lon")
        .withColumn("loc", when(lit(false), struct(col("lat"), col("lon")))))
    val dir = tmp("graft-geolayout-null")
    GeoLayout.writeCellPartitioned(withNull, "loc", dir, cellDeg = 30.0)
    val hit = GeoLayout.readWithinRadius(spark, dir, 0, 0, 2.1e7)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!hit.contains(99L) && hit.nonEmpty)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("bucketed join equals the naive BETWEEN cross join") {
    val pts = spark.range(500).select(
      col("id").as("pid"),
      timestamp_seconds(pmod(col("id") * 97 + 13, lit(10000))).as("pt"))
    val ints = spark.range(60).select(
      col("id").as("iid"),
      timestamp_seconds(pmod(col("id") * 311, lit(9000))).as("s"))
      .withColumn("e", col("s") + expr("INTERVAL 25 MINUTES"))

    // bucket width deliberately NOT aligned with the interval length
    val got = RangeJoin.pointInInterval(pts, "pt", ints, "s", "e", 600)
      .select("pid", "iid")
    val exp = pts.crossJoin(ints)
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid")

    assert(got.count() > 0)
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("bounds are inclusive and pairs are emitted exactly once") {
    import spark.implicits._
    val pts = Seq((1L, 600L), (2L, 1200L), (3L, 1201L))
      .toDF("pid", "pt").withColumn("pt", timestamp_seconds(col("pt")))
    val ints = Seq((10L, 600L, 1200L)).toDF("iid", "s", "e")
      .withColumn("s", timestamp_seconds(col("s")))
      .withColumn("e", timestamp_seconds(col("e")))
    val got = RangeJoin.pointInInterval(pts, "pt", ints, "s", "e", 300)
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("malformed intervals drop cleanly; degenerate spans abort with a clear error") {
    val pts = spark.range(10).select(col("id").as("pid"),
      timestamp_seconds(col("id") * 100).as("pt"))
    // end < start: sequence's default negative step would walk
    // descending and emit garbage buckets; the filter drops the row
    val bad = spark.range(1).select(col("id").as("iid"),
      timestamp_seconds(lit(5000)).as("s"),
      timestamp_seconds(lit(100)).as("e"))
    assert(RangeJoin.pointInInterval(pts, "pt", bad, "s", "e", 60)
      .count() == 0)
    // a valid interval alongside still matches
    val mixed = bad.unionByName(spark.range(1).select(
      (col("id") + 1).as("iid"), timestamp_seconds(lit(0)).as("s"),
      timestamp_seconds(lit(250)).as("e")))
    assert(RangeJoin.pointInInterval(pts, "pt", mixed, "s", "e", 60)
      .count() == 3) // points at 0, 100, 200
    // an interval spanning more buckets than the cap aborts loudly
    val huge = spark.range(1).select(col("id").as("iid"),
      timestamp_seconds(lit(0)).as("s"),
      timestamp_seconds(lit(10000000)).as("e"))
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "pt", huge, "s", "e", 60,
        maxBucketsPerInterval = 1000).count()
    }
    assert(err.getMessage != null &&
      (err.getMessage.contains("buckets") ||
        err.getCause != null && err.getCause.getMessage.contains("buckets")))
  }

  test("no cartesian or nested-loop join in the physical plan") {
    val pts = spark.range(100).select(col("id").as("pid"),
      timestamp_seconds(col("id") * 7).as("pt"))
    val ints = spark.range(10).select(col("id").as("iid"),
      timestamp_seconds(col("id") * 60).as("s"))
      .withColumn("e", col("s") + expr("INTERVAL 5 MINUTES"))
    val plan = RangeJoin.pointInInterval(pts, "pt", ints, "s", "e", 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}

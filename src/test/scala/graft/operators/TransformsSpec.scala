package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransformsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pivot: histogram + fixed-interval date_histogram groups, " +
      "agg matrix, deterministic order") {
    val df = Seq(
      ("a", 5.0, "2020-01-01 00:10:00"),
      ("a", 15.0, "2020-01-01 00:50:00"),
      ("b", 25.0, "2020-01-01 01:20:00")
    ).toDF("k", "v", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = Transforms.pivot(df,
      """{"pivot": {
        |  "group_by": {
        |    "bucket": {"histogram": {"field": "v", "interval": 10}},
        |    "hour": {"date_histogram": {"field": "ts",
        |      "fixed_interval": "1h"}}},
        |  "aggregations": {
        |    "n": {"value_count": {"field": "k"}},
        |    "vmax": {"max": {"field": "v"}}}
        |}}""".stripMargin)
    assert(out.columns.toSeq == Seq("bucket", "hour", "n", "vmax"))
    val rows = out.collect().map(r => (r.getDouble(0),
      r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      (0.0, "2020-01-01 00:00:00.0", 1L, 5.0),
      (10.0, "2020-01-01 00:00:00.0", 1L, 15.0),
      (20.0, "2020-01-01 01:00:00.0", 1L, 25.0)))
    // refusals: unknown group source / agg kind, bad intervals
    intercept[IllegalArgumentException](Transforms.pivot(df,
      """{"pivot": {"group_by": {"g": {"geo": {"field": "v"}}},
        |"aggregations": {"n": {"value_count": {"field": "k"}}}}}"""
        .stripMargin))
    intercept[IllegalArgumentException](Transforms.pivot(df,
      """{"pivot": {"group_by": {"g": {"terms": {"field": "k"}}},
        |"aggregations": {"p": {"percentiles": {"field": "v"}}}}}"""
        .stripMargin))
    intercept[IllegalArgumentException](Transforms.pivot(df,
      """{"pivot": {"group_by": {"g": {"histogram": {"field": "v",
        |"interval": 0}}},
        |"aggregations": {"n": {"value_count": {"field": "k"}}}}}"""
        .stripMargin))
  }

  test("latest: newest per key, sort tie closed by the tie breaker, " +
      "multi-key, refusals") {
    val df = Seq(
      (1L, "x", 10L, "old"), (1L, "x", 20L, "new"),
      (1L, "y", 5L, "only"),
      (2L, "x", 7L, "lo-tie"), (2L, "x", 7L, "hi-tie")
    ).toDF("k1", "k2", "ts", "tag")
      .withColumn("id", monotonically_increasing_id())
    val out = Transforms.latest(df,
      """{"latest": {"unique_key": ["k1", "k2"],
        |"sort": "ts"}}""".stripMargin, tieBreaker = "id")
      .select("k1", "k2", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    // (2, x): equal ts -> LARGER tie breaker wins (the deterministic
    // stand-in for ES's last-ingested)
    assert(out == Seq((1L, "x", "new"), (1L, "y", "only"),
      (2L, "x", "hi-tie")))
    intercept[IllegalArgumentException](Transforms.latest(df,
      """{"latest": {"unique_key": [], "sort": "ts"}}""", "id"))
    intercept[IllegalArgumentException](Transforms.latest(df,
      """{"latest": {"unique_key": ["k1"], "sort": "ts"}}""", "ghost"))
  }

  test("latest plans as a keyed aggregation — no Window, no Join") {
    val df = Seq((1L, 10L, "a")).toDF("k", "ts", "v")
    val p = Transforms.latest(df,
      """{"latest": {"unique_key": ["k"], "sort": "ts"}}""", "ts")
      .queryExecution.sparkPlan.toString
    assert(!p.contains("Window") && !p.contains("Join"), p)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("co-located join of two bucketed tables runs without any Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val orders = Tables.load(spark, TestSpark.sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.load(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Bucketing.saveBucketed(orders, "b_orders", dir + "/o", "o_orderkey", 4)
    Bucketing.saveBucketed(lineitem, "b_lineitem", dir + "/l", "l_orderkey", 4)
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a merge join so the exchange-free property is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readBucketed(spark, "b_lineitem")
        .join(Bucketing.readBucketed(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      joined.collect() // finalize AQE stages
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the whole point: both sides pre-partitioned and pre-sorted by
      // the bucket key, and the downstream agg groups on the same key —
      // the ENTIRE plan runs without a single shuffle, at any scale
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // correctness identical to the plain-parquet join
      val expect = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey")).count()
      val got = Bucketing.readBucketed(spark, "b_lineitem")
        .join(Bucketing.readBucketed(spark, "b_orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}

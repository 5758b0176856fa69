package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's single-index scan entry point
  * (eland/operations.py:1558-1664) — in Spark the partitioned parquet
  * scan replaces PIT + search_after cursor pagination entirely; filter
  * and projection pushdown reach the scan via Catalyst.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
      // outright; read nanos as long and truncate to micro precision.
      // Integer DIV, not `/`: ns epochs (~1.7e18) exceed double's 53-bit
      // exact-integer range.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", org.apache.spark.sql.functions
            .expr("timestamp_micros(ts DIV 1000)"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

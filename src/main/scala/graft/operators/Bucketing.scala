package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the co-located-join story for repeated
  * large joins (SURVEY §4: the reference has no equivalent because ES
  * has no joins at all; on Spark, bucketing IS the mechanism that
  * amortizes a fact table's join shuffle across every downstream
  * query).
  *
  * Writing both sides bucketed (same column, same bucket count) lets a
  * sort-merge join read both pre-partitioned and pre-sorted: NO
  * Exchange on either side, at any scale — the shuffle is paid once at
  * write time instead of per query. `BucketingSpec` asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted parquet table at
    * `path`, registered as `table` (external — the path outlives the
    * catalog entry). Bucket count sets join parallelism for every
    * future co-located join; pick it for the TARGET deployment (e.g.
    * 2-4× executor cores), not the writer's.
    */
  def saveBucketed(df: DataFrame, table: String, path: String,
                   keyCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog — a raw `spark.read.parquet(path)` loses it).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}

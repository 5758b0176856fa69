package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DataType

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

  /** Multi-table wildcard scan — eland frames over an index PATTERN
    * (`ed.DataFrame(es, "flights*")`): all matching indices scan as
    * one frame, with mapping conflicts resolved FIRST-WINS in index
    * order (eland/field_mappings.py:280-288 keeps the first mapping it
    * sees for a field and ignores later ones). Here: every
    * `<name>.parquet` under `dir` whose table name matches the glob
    * (`*`/`?`) unions by column name (missing columns null-padded),
    * and a column whose dtype differs from the first table's is CAST
    * to the first table's dtype — but only within a coercible type
    * family (numeric↔numeric, date↔timestamp). A cross-family
    * conflict (e.g. string vs double) FAILS FAST: under non-ANSI mode
    * that cast would silently null out every row of the losing table,
    * which is strictly worse than an error. Table order is the sorted
    * name list, so "first" is deterministic.
    *
    * Listing goes through the Hadoop FileSystem API, so `dir` may be
    * any Spark-readable URI (file://, hdfs://, s3a://), same as
    * [[load]] — on a real cluster the table directory is rarely
    * driver-local.
    *
    * Scale shape: this is a plan-level union of parquet scans — each
    * branch keeps its own pushdown/pruning, and Catalyst collapses
    * the union into one multi-path scan stage; nothing materializes.
    */
  def loadPattern(spark: SparkSession, dir: String, pattern: String): DataFrame = {
    val rx = ("^" + pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c   => java.util.regex.Pattern.quote(c.toString)
    } + "$").r
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(dirPath)
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .filter(n => rx.matches(n))
      .sorted.toSeq
    require(names.nonEmpty, s"no tables match '$pattern' in $dir")
    val frames = names.map(n => n -> load(spark, dir, n))
    // first-mapping-wins dtype resolution
    val firstDtype = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    frames.foreach(_._2.schema.fields.foreach(f =>
      if (!firstDtype.contains(f.name)) firstDtype(f.name) = f.dataType))
    frames.map { case (n, f) =>
      f.select(f.schema.fieldNames.toSeq.map { c =>
        val target = firstDtype(c)
        val from = f.schema(c).dataType
        if (from == target) col(c)
        else {
          require(coercible(from, target),
            s"loadPattern: column '$c' of table '$n' is ${from.catalogString} " +
              s"but the first-seen mapping is ${target.catalogString} — " +
              "cross-family cast would produce silent nulls; align the " +
              "schemas or exclude the table from the pattern")
          col(c).cast(target).as(c)
        }
      }: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Write `df` as a hive-layout partitioned parquet table (one
    * directory per partition-column value). The 100 TB data-layout
    * primitive: a time- or source-partitioned corpus lets every
    * partition-predicated query skip whole directories at PLANNING
    * time (`PartitionFilters` in the scan node), instead of reading
    * and filtering 100 TB of row groups. Pair with
    * `sortWithinPartitions` on a secondary key before calling to also
    * get tight parquet min/max row-group stats for non-partition
    * predicates.
    */
  def savePartitioned(df: DataFrame, path: String, partCols: Seq[String],
                      mode: String = "overwrite"): Unit =
    df.write.partitionBy(partCols: _*).mode(mode).parquet(path)

  /** Read a partitioned table written by [[savePartitioned]].
    * `basePath` keeps partition columns in the schema; Catalyst prunes
    * directories from any filter on them.
    */
  def loadPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.option("basePath", path).parquet(path)

  /** Same-family coercions only: numeric↔numeric and date↔timestamp
    * are value-preserving enough for first-wins resolution; anything
    * else (string↔numeric, array↔scalar, …) nulls under non-ANSI cast.
    */
  private def coercible(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (_: NumericType, _: NumericType) => true
      case (DateType, TimestampType) | (TimestampType, DateType) => true
      case _ => false
    }
  }
}

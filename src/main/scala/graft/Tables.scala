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
    * to the first table's dtype. Table order is the sorted name list,
    * so "first" is deterministic.
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
    val names = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .filter(n => rx.matches(n))
      .sorted.toSeq
    require(names.nonEmpty, s"no tables match '$pattern' in $dir")
    val frames = names.map(n => load(spark, dir, n))
    // first-mapping-wins dtype resolution
    val firstDtype = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    frames.foreach(_.schema.fields.foreach(f =>
      if (!firstDtype.contains(f.name)) firstDtype(f.name) = f.dataType))
    frames.map { f =>
      f.select(f.schema.fieldNames.toSeq.map { c =>
        if (f.schema(c).dataType == firstDtype(c)) col(c)
        else col(c).cast(firstDtype(c)).as(c)
      }: _*)
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}

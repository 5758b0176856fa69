package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingest/egress parity (SURVEY §2.1):
  *  - S7 `pandas_to_eland` → `saveTable` with fail/replace/append modes
  *    and the mapping-compatibility check (eland/etl.py:40-232,
  *    eland/field_mappings.py:892-931);
  *  - S8 `csv_to_eland` → `csvToParquet` (eland/etl.py:297-561) —
  *    Spark's chunked CSV reader replaces the pandas chunksize loop;
  *  - S5/S6 CSV/JSON sinks live on GraftFrame (toCsv/toJson).
  *
  * eland bulk-ingests with 4 threads × 10k-row chunks
  * (eland/etl.py:49,215-227); Spark's parallel DataFrameWriter writes
  * one file per partition, so parallelism == partition count and the
  * chunking machinery disappears.
  */
object Ingest {

  /** Structural schema compatibility: every incoming field must exist
    * in the target with the same type (the reference additionally
    * tolerates missing-from-frame fields — extra target columns are
    * fine on append).
    */
  def verifyCompatible(target: StructType, incoming: StructType): Unit = {
    val t = target.fields.map(f => f.name -> f.dataType).toMap
    val bad = incoming.fields.flatMap { f =>
      t.get(f.name) match {
        case None => Some(s"${f.name}: missing from target")
        case Some(dt) if dt != f.dataType =>
          Some(s"${f.name}: ${f.dataType.simpleString} vs target ${dt.simpleString}")
        case _ => None
      }
    }
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"incompatible schema on append: ${bad.mkString("; ")}")
  }

  /** Write a frame as a parquet table with eland's es_if_exists modes. */
  def saveTable(df: DataFrame, path: String, ifExists: String = "fail"): Unit = {
    val spark = df.sparkSession
    val exists = try {
      spark.read.parquet(path).schema; true
    } catch { case _: Throwable => false }
    ifExists match {
      case "fail" =>
        if (exists)
          throw new IllegalArgumentException(s"table $path already exists")
        df.write.parquet(path)
      case "replace" =>
        df.write.mode("overwrite").parquet(path)
      case "append" =>
        if (exists) verifyCompatible(spark.read.parquet(path).schema, df.schema)
        df.write.mode("append").parquet(path)
      case other =>
        throw new IllegalArgumentException(s"ifExists: $other")
    }
  }

  /** CSV → parquet table, header + schema inference on by default
    * (mirrors csv_to_eland's pandas read_csv passthrough defaults).
    */
  def csvToParquet(spark: SparkSession, csvPath: String, destPath: String,
                   header: Boolean = true, inferSchema: Boolean = true,
                   ifExists: String = "fail"): DataFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(csvPath)
    saveTable(df, destPath, ifExists)
    spark.read.parquet(destPath)
  }

  /** CSV → GraftFrame with row identity, like csv_to_eland's
    * `index_col` used as `_id` (eland/etl.py:414-443, the churn-csv
    * fixture): pin an existing column as the id, or mint a content
    * hash when the CSV has no key.
    */
  def csvToFrame(spark: SparkSession, csvPath: String,
                 indexCol: Option[String] = None,
                 header: Boolean = true): graft.api.GraftFrame = {
    val df = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .csv(csvPath)
    indexCol match {
      case Some(c) => graft.api.GraftFrame(df, c)
      case None    => graft.api.GraftFrame.withMintedId(df)
    }
  }
}

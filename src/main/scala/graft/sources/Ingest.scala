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

  /** Upsert (merge-by-key): incoming rows replace existing rows with
    * the same key, everything else is kept, new keys are inserted.
    * eland's append ingest is implicitly an upsert — ES indexing is
    * idempotent per `_id` (eland/etl.py:219-227 streams index actions
    * keyed by the frame index) — but parquet has no primary key, so
    * the merge materializes as read → anti-join → union → swap.
    *
    * Incoming keys must be unique (the same contract ES enforces per
    * bulk chunk); duplicate incoming keys would both survive.
    *
    * Scale shape: ONE hash join on the key (the incoming side is
    * typically small and broadcasts), no window, no global sort. The
    * rewrite is staged to `<path>__upsert_tmp` and swapped in with a
    * filesystem rename, so the table read and the table write never
    * overlap. Cost is proportional to the whole table — the
    * unpartitioned-parquet trade; at 100 TB keep the table
    * hive-partitioned ([[graft.Tables.savePartitioned]]) and upsert
    * only the partitions the incoming keys touch.
    */
  def upsertTable(df: DataFrame, path: String, key: String): Unit = {
    val spark = df.sparkSession
    val hp = new org.apache.hadoop.fs.Path(path)
    val fsys = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new org.apache.hadoop.fs.Path(path + "__upsert_old")
    // crash recovery: a previous upsert that died between its two
    // renames left the only complete copy at __upsert_old — restore it
    // BEFORE deciding whether the table exists, else this call would
    // silently rebuild the table from the incoming batch alone and a
    // later call would delete the backup
    if (!fsys.exists(hp) && fsys.exists(oldP)) {
      if (!fsys.rename(oldP, hp))
        throw new java.io.IOException(
          s"upsert recovery failed: $oldP -> $path")
    }
    if (!fsys.exists(hp)) { df.write.parquet(path); return }
    val target = spark.read.parquet(path)
    verifyCompatible(target.schema, df.schema)
    val cols = target.columns.toSeq
    val merged = target.join(df.select(key), Seq(key), "left_anti")
      .unionByName(df.selectExpr(cols: _*))

    val tmp = new org.apache.hadoop.fs.Path(path + "__upsert_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // swap-then-delete, never delete-then-swap: at every instant at
    // least one complete copy of the table exists on disk (a crash
    // between the renames leaves the old table at __upsert_old, which
    // the recovery branch above restores on the next call)
    fsys.delete(oldP, true)
    if (!fsys.rename(hp, oldP))
      throw new java.io.IOException(s"upsert swap failed: $path -> $oldP")
    if (!fsys.rename(tmp, hp)) {
      fsys.rename(oldP, hp) // restore; ignore result — best effort
      throw new java.io.IOException(s"upsert swap failed: $tmp -> $path")
    }
    fsys.delete(oldP, true)
  }

  /** The read_csv kwargs `csv_to_eland` forwards to pandas
    * (eland/etl.py:297-561: sep, names, usecols, dtype, na_values,
    * parse_dates, quotechar, escapechar, comment, nrows, encoding, ...),
    * re-expressed as Spark CSV reader options plus post-read plan steps
    * (projection, casts) — the post-read steps are Columns, so column
    * pruning and pushdown still apply downstream.
    */
  final case class CsvOptions(
      sep: String = ",",
      header: Boolean = true,
      inferSchema: Boolean = true,
      /** Override column names positionally (pandas `names`). */
      names: Seq[String] = Nil,
      /** Keep only these columns (pandas `usecols`). */
      usecols: Seq[String] = Nil,
      /** Per-column Spark type overrides (pandas `dtype`), applied as
        * casts after the read so inference stays on for the rest. */
      dtype: Map[String, String] = Map.empty,
      /** Null sentinels (pandas `na_values`); the first rides the
        * reader's nullValue option, the rest post-filter string cols. */
      naValues: Seq[String] = Nil,
      /** Cast these columns to timestamp (pandas `parse_dates`),
        * honoring `timestampFormat` when set. */
      parseDates: Seq[String] = Nil,
      quote: String = "\"",
      escape: String = "\\",
      comment: Option[Char] = None,
      encoding: String = "UTF-8",
      dateFormat: Option[String] = None,
      timestampFormat: Option[String] = None,
      /** Row cap (pandas `nrows`): the FIRST n data rows in FILE
        * order. Spark's limit(n) over a splittable scan has no order
        * (splits are bin-packed by size, not offset), so when set the
        * read runs in whole-file mode (multiLine — a non-splittable
        * parse) over exactly ONE csv file; a glob/directory input is
        * refused loudly. Bounded by construction (n rows out), so the
        * lost split parallelism is irrelevant.
        */
      nrows: Option[Int] = None)

  /** Read a CSV with the eland-parity option set. */
  def readCsv(spark: SparkSession, csvPath: String,
              opts: CsvOptions = CsvOptions()): DataFrame = {
    import org.apache.spark.sql.functions._
    var r = spark.read
      .option("sep", opts.sep)
      .option("header", opts.header.toString)
      .option("inferSchema", opts.inferSchema.toString)
      .option("quote", opts.quote)
      .option("escape", opts.escape)
      .option("encoding", opts.encoding)
    opts.naValues.headOption.foreach(v => r = r.option("nullValue", v))
    opts.comment.foreach(c => r = r.option("comment", c.toString))
    opts.dateFormat.foreach(f => r = r.option("dateFormat", f))
    opts.timestampFormat.foreach(f => r = r.option("timestampFormat", f))
    if (opts.nrows.isDefined) {
      // see CsvOptions.nrows: whole-file parse (not splittable) keeps
      // file order, so the limit below is exactly pandas's "first n"
      r = r.option("multiLine", "true")
      val hp = new org.apache.hadoop.fs.Path(csvPath)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        .flatMap(st => if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filterNot(_.isDirectory)
        else Seq(st))
      require(files.size == 1,
        s"nrows means 'the first n data rows in file order', which " +
          s"needs exactly ONE csv file — $csvPath resolves to " +
          s"${files.size} files; read them separately or drop nrows")
    }
    var df = r.csv(csvPath)
    if (opts.names.nonEmpty) {
      require(opts.names.size == df.columns.length,
        s"names has ${opts.names.size} entries for ${df.columns.length} columns")
      df = df.toDF(opts.names: _*)
    }
    // extra null sentinels beyond the reader's single nullValue slot
    val extraNa = opts.naValues.drop(1)
    if (extraNa.nonEmpty) {
      import org.apache.spark.sql.types.StringType
      val cols = df.schema.fields.map { f =>
        if (f.dataType == StringType)
          when(col(f.name).isin(extraNa: _*), lit(null)).otherwise(col(f.name))
            .as(f.name)
        else col(f.name)
      }
      df = df.select(cols.toSeq: _*)
      // Schema inference ran BEFORE the extra sentinels were nulled, so
      // a numeric column containing "NULL" was inferred as string.
      // Re-infer those columns like pandas does (which drops na_values
      // before type inference): one aggregate pass counts try_cast
      // successes, and columns whose every surviving value is numeric
      // are cast accordingly. Explicit dtype overrides win untouched.
      if (opts.inferSchema) {
        import graft.api.Names.bq
        val cands = df.schema.fields
          .filter(f => f.dataType == StringType && !opts.dtype.contains(f.name))
          .map(_.name)
        if (cands.nonEmpty) {
          val aggs = cands.flatMap { c =>
            Seq(count(col(c)).as(s"${c}__n"),
              count(expr(s"try_cast(${bq(c)} as bigint)")).as(s"${c}__l"),
              count(expr(s"try_cast(${bq(c)} as double)")).as(s"${c}__d"))
          }
          val r = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
          cands.foreach { c =>
            val n = r.getAs[Long](s"${c}__n")
            val l = r.getAs[Long](s"${c}__l")
            val d = r.getAs[Long](s"${c}__d")
            if (n > 0 && l == n) df = df.withColumn(c, col(c).cast("bigint"))
            else if (n > 0 && d == n) df = df.withColumn(c, col(c).cast("double"))
          }
        }
      }
    }
    for ((c, t) <- opts.dtype) df = df.withColumn(c, col(c).cast(t))
    for (c <- opts.parseDates) df = df.withColumn(c,
      opts.timestampFormat match {
        case Some(f) => to_timestamp(col(c), f)
        case None    => col(c).cast("timestamp")
      })
    if (opts.usecols.nonEmpty) {
      val missing = opts.usecols.filterNot(df.columns.contains)
      require(missing.isEmpty, s"usecols not in CSV: ${missing.mkString(",")}")
      df = df.select(opts.usecols.map(col): _*)
    }
    opts.nrows.foreach(n => df = df.limit(n))
    df
  }

  /** ES `update_by_query` at the table layer: apply `updates` (column
    * → new-value expression, the "script" as Column trees) to every
    * row matching `predicate`, leaving other rows untouched. Rides
    * [[upsertTable]]'s crash-safe merge: ONLY the matching rows are
    * recomputed and upserted by key — the predicate pushes into the
    * table scan, so finding them is a pruned read, and the merge is
    * the one keyed join upsertTable already pays. Returns the number
    * of rows updated (ES's `updated` count); zero matches touch
    * nothing.
    */
  def updateWhere(spark: SparkSession, path: String, key: String,
                  predicate: org.apache.spark.sql.Column,
                  updates: Map[String, org.apache.spark.sql.Column]): Long = {
    require(updates.nonEmpty, "update_by_query needs at least one update")
    val target = spark.read.parquet(path)
    require(!updates.contains(key),
      s"refusing to rewrite the key column '$key' (ES likewise " +
        "cannot update _id)")
    updates.keys.foreach(c => require(target.columns.contains(c),
      s"unknown column '$c' (update_by_query cannot add fields to a " +
        "typed table; transform + saveTable for schema changes)"))
    // every update expression evaluates against the ORIGINAL row (one
    // select, not a withColumn chain — map iteration order must never
    // decide whether an update sees another's output). localCheckpoint,
    // not persist: the updated rows' lineage reads the SAME path
    // upsertTable is about to swap — a cache eviction under persist
    // would silently recompute the update over the already-updated
    // table (double-applying e.g. a price bump); cutting the lineage
    // makes that impossible
    val changed = target.filter(predicate)
      .select(target.columns.toSeq.map(c =>
        updates.getOrElse(c,
          org.apache.spark.sql.functions.col(c)).as(c)): _*)
      .localCheckpoint(true)
    val n = changed.count()
    if (n > 0) upsertTable(changed, path, key)
    n
  }

  /** CSV → parquet table, header + schema inference on by default
    * (mirrors csv_to_eland's pandas read_csv passthrough defaults).
    */
  def csvToParquet(spark: SparkSession, csvPath: String, destPath: String,
                   header: Boolean = true, inferSchema: Boolean = true,
                   ifExists: String = "fail"): DataFrame =
    csvToParquet(spark, csvPath, destPath,
      CsvOptions(header = header, inferSchema = inferSchema), ifExists)

  /** CSV → parquet table with the full option set. */
  def csvToParquet(spark: SparkSession, csvPath: String, destPath: String,
                   opts: CsvOptions, ifExists: String): DataFrame = {
    saveTable(readCsv(spark, csvPath, opts), destPath, ifExists)
    spark.read.parquet(destPath)
  }

  /** CSV → GraftFrame with row identity, like csv_to_eland's
    * `index_col` used as `_id` (eland/etl.py:414-443, the churn-csv
    * fixture): pin an existing column as the id, or mint a content
    * hash when the CSV has no key.
    */
  def csvToFrame(spark: SparkSession, csvPath: String,
                 indexCol: Option[String] = None,
                 header: Boolean = true): graft.api.GraftFrame =
    csvToFrame(spark, csvPath, indexCol, CsvOptions(header = header))

  /** CSV → GraftFrame with the full option set. */
  def csvToFrame(spark: SparkSession, csvPath: String,
                 indexCol: Option[String],
                 opts: CsvOptions): graft.api.GraftFrame = {
    val df = readCsv(spark, csvPath, opts)
    indexCol match {
      case Some(c) => graft.api.GraftFrame(df, c)
      case None    => graft.api.GraftFrame.withMintedId(df)
    }
  }
}

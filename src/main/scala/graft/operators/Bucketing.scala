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

  /** Deterministic catalog name for a PATH-addressed bucketed batch —
    * the registries address storage by directory, not by table name,
    * and the name must survive nothing: it is re-derived from the path
    * every time.
    */
  private def tableNameFor(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      new org.apache.hadoop.fs.Path(path).toUri.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "graft_bkt_" + d.take(8).map("%02x".format(_)).mkString
  }

  private def specPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_bucket_spec.json")

  /** Save `df` as a bucketed BATCH DIRECTORY (the registries' unit of
    * commitment): bucketed+sorted parquet at `path` via a path-derived
    * catalog name, plus a `_bucket_spec.json` carrying (columns,
    * buckets, schema) so a FUTURE SESSION — whose catalog never saw
    * this table — can re-register it from the directory alone. The
    * data files and `_SUCCESS` land via the normal committer, so the
    * registry's commit protocol (marker-gated reads, manifest heal)
    * sees this dir exactly like a plain one.
    *
    * The caller should pre-partition `df` by the key columns into
    * `buckets` partitions — otherwise every write task splits its rows
    * across all buckets and the dir holds tasks×buckets files.
    */
  def saveBucketedBatch(df: DataFrame, path: String, keyCols: Seq[String],
                        buckets: Int): Unit = {
    require(keyCols.nonEmpty && buckets >= 1)
    val spark = df.sparkSession
    val name = tableNameFor(path)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(name)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val spec = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        org.json4s.JObject(
          "cols" -> org.json4s.JArray(
            keyCols.map(org.json4s.JString(_)).toList),
          "buckets" -> org.json4s.JInt(buckets),
          "schema" -> org.json4s.JString(df.schema.toDDL))))
    val out = fs.create(specPath(path), true)
    try out.write(spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Does `path` hold a [[saveBucketedBatch]] directory? */
  def isBucketedBatch(fs: org.apache.hadoop.fs.FileSystem,
                      path: String): Boolean =
    fs.exists(specPath(path))

  /** Read a [[saveBucketedBatch]] dir WITH its bucket distribution,
    * re-registering the external table from `_bucket_spec.json` when
    * this session's catalog has not seen the path (stream restart, new
    * driver). A plain `spark.read.parquet` of the same dir stays
    * correct — it just loses the Exchange-free probe.
    */
  def readBucketedBatch(spark: SparkSession, path: String): DataFrame = {
    val name = tableNameFor(path)
    if (!spark.catalog.tableExists(name)) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(specPath(path))
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
      val spec = org.json4s.jackson.JsonMethods.parse(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
      val cols = (spec \ "cols").extract[List[String]]
      val buckets = (spec \ "buckets").extract[Int]
      val schema = (spec \ "schema").extract[String]
      val colList = cols.mkString(", ")
      spark.sql(
        s"CREATE TABLE $name ($schema) USING PARQUET " +
          s"CLUSTERED BY ($colList) SORTED BY ($colList) " +
          s"INTO $buckets BUCKETS LOCATION '$path'")
    }
    spark.table(name)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The segment-store discipline shared by the persistent indexes
  * ([[InvertedIndex]], [[VectorIndex]]): immutable segments committed
  * by a stats-last marker, segment-scoped tombstone batches, an
  * exactly-once ingest ledger, and manifest-healed compaction.
  *
  * Everything here is layout mechanics — what counts as committed,
  * how tombstones apply, how a crashed compaction replays. The
  * indexes own their payloads (postings vs vectors), their scoring,
  * and their stats arithmetic; this module owns the directories, so
  * the two stores cannot drift on the crash-safety contract.
  *
  * Layout under an index root:
  * {{{
  *   segments/<name>/...      payload + stats/ (marker: stats/_SUCCESS)
  *   deletes/batch-<uuid>/    ids/ + segs/ + stats/ (marker: stats/_SUCCESS)
  *   ingested/batch-<id>      exactly-once ledger markers
  *   compacting               manifest of an in-flight compaction
  * }}}
  */
private[graft] object SegmentStore {

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed segment dirs (stats marker present), sorted. */
  def committedSegments(spark: SparkSession, indexPath: String): Seq[String] =
    committedUnder(spark, s"$indexPath/segments")

  /** Committed tombstone batch dirs — same stats-last commit marker as
    * segments, so a crashed delete is invisible to every reader.
    */
  def committedDeletes(spark: SparkSession, indexPath: String): Seq[String] =
    committedUnder(spark, s"$indexPath/deletes")

  def committedUnder(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => fs.exists(
        new org.apache.hadoop.fs.Path(d, "stats/_SUCCESS")))
      .map(_.toString).sorted.toSeq
  }

  /** Drop marker-less crash leftovers (a segment whose append died
    * before its stats commit, a tombstone batch whose delete died
    * likewise): no reader consumes them, but left alone they
    * accumulate forever on a long-lived index and every committed-dir
    * listing stat-probes them. Safe only under the compaction's
    * offline single-writer contract — nothing is mid-write while this
    * runs.
    */
  def sweepUncommitted(fs: org.apache.hadoop.fs.FileSystem,
                       indexPath: String): Unit =
    Seq("segments", "deletes").foreach { sub =>
      val root = new org.apache.hadoop.fs.Path(s"$indexPath/$sub")
      if (fs.exists(root))
        fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
          .filterNot(p => fs.exists(
            new org.apache.hadoop.fs.Path(p, "stats/_SUCCESS")))
          .foreach(p => fs.delete(p, true))
    }

  /** (id, _seg) applicability pairs of the committed tombstones: a
    * row means "id is dead IN that segment". Bounded between
    * compactions — always broadcast, never shuffled against payloads.
    */
  def tombstonePairs(spark: SparkSession, dels: Seq[String]): DataFrame =
    dels.map(d => spark.read.parquet(s"$d/ids")
        .crossJoin(spark.read.parquet(s"$d/segs")))
      .reduce(_ unionByName _)

  /** Commit one tombstone batch: ids, then scope, then stats LAST (the
    * marker). The SCOPE is the segments committed at the caller's
    * probe time (the only ones that can hold the ids) and never a
    * later segment — so a deleted id can be re-ingested (the upsert
    * model) and the new payload is not masked. `statsCols` is the
    * index's own charge accounting (the inverted index records
    * (n, sum_len); the vector index records n).
    */
  def writeTombstone(spark: SparkSession, indexPath: String,
                     segs: Seq[String], ids: DataFrame,
                     statsCols: Seq[Column]): Unit = {
    val dir = s"$indexPath/deletes/batch-${java.util.UUID.randomUUID()}"
    // ids and scope are independent and both precede the marker —
    // overlap them (guide §2.6); stats stays LAST (the commit marker)
    inParallel(Seq(
      () => labeled(spark, "tomb: ids write")(
        ids.write.mode("overwrite").parquet(s"$dir/ids")),
      () => labeled(spark, "tomb: segs write")(
        spark.createDataFrame(
            segs.map(s => Tuple1(new org.apache.hadoop.fs.Path(s).getName)))
          .toDF("_seg")
          .write.mode("overwrite").parquet(s"$dir/segs"))))
    labeled(spark, "tomb: stats commit")(
      spark.range(1).select(statsCols: _*)
        .write.mode("overwrite").parquet(s"$dir/stats"))
  }

  /** Per-segment ledger rows (`<seg>/<sub>` — the inverted index's
    * `lens`, the vector index's `ids`) tagged with their segment name,
    * minus the tombstones applicable to each segment: exactly the live
    * corpus bookkeeping — ONE FRAME PER SEGMENT, so a compacted
    * segment's id-bucketed ledger keeps its HashPartitioning into
    * whatever join the caller builds (a union would erase it). The
    * broadcast tombstone anti-join preserves the child's partitioning.
    * Callers that join these frames must join per frame and union the
    * RESULTS; semi-joins distribute over the left union, so that
    * rewrite is always sound.
    */
  def liveLedgerFrames(spark: SparkSession, segs: Seq[String],
                       dels: Seq[String], sub: String): Seq[DataFrame] = {
    val fs = fsOf(spark, segs.head)
    val tomb =
      if (dels.isEmpty) None
      else Some(org.apache.spark.sql.functions.broadcast(
        tombstonePairs(spark, dels)))
    segs.map { s =>
      val path = s"$s/$sub"
      val base =
        if (Bucketing.isBucketedBatch(fs, path))
          Bucketing.readBucketedBatch(spark, path)
        else spark.read.parquet(path)
      val tagged = base.withColumn("_seg",
        org.apache.spark.sql.functions.lit(
          new org.apache.hadoop.fs.Path(s).getName))
      tomb.map(t => tagged.join(t, Seq("id", "_seg"), "left_anti"))
        .getOrElse(tagged)
    }
  }

  /** Label every Spark job `body` submits (guide §1.5) so the UI and
    * the job-level profiler attribute index-lifecycle time to phases
    * instead of one opaque foreachBatch call site. Thread-local;
    * restores the previous description on exit.
    */
  def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }

  /** Run independent Spark write jobs concurrently and wait for all —
    * the guide-§2.6 overlap: a segment's payload and ledger writes read
    * the same persisted staged frame and land in different directories,
    * so running them serially leaves the cluster idle through each
    * job's tail. Exceptions propagate (first failure wins); the caller
    * still writes its commit marker (stats) strictly AFTER this
    * returns, so the stats-last discipline is untouched.
    */
  def inParallel(tasks: Seq[() => Unit]): Unit =
    if (tasks.length <= 1) tasks.foreach(_())
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val started = tasks.map(t => Future(t()))
      started.foreach(Await.result(_, Duration.Inf))
    }

  def manifestPath(indexPath: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$indexPath/compacting")

  /** Resolve a compaction that crashed between committing its merged
    * segment and deleting the inputs (see [[Manifest]]): merged
    * committed → finish the input deletes; merged uncommitted → drop
    * the partial merged dir — then clear the manifest. Idempotent.
    * Entries are index-relative ("segments/seg-x", "deletes/batch-y")
    * so one manifest covers segment inputs AND the tombstone dirs a
    * compaction applies physically; the commit marker of both kinds
    * is their stats table.
    */
  def heal(spark: SparkSession, indexPath: String): Unit =
    Manifest.heal(fsOf(spark, indexPath), manifestPath(indexPath),
      indexPath,
      d => new org.apache.hadoop.fs.Path(s"$d/stats/_SUCCESS"))

  /** The exactly-once ingest ledger marker for `batchId`. */
  def ingestMarker(indexPath: String, batchId: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(s"$indexPath/ingested/batch-$batchId")
}

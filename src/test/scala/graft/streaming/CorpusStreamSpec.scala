package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Single-file micro-batches with pinned arrival order; `offset`
    * lets a later call add files AFTER an earlier batch set without
    * reusing a path the stream's checkpoint has already consumed.
    */
  private def writeBatches(dir: String,
                           batches: Seq[Seq[(Long, String)]],
                           offset: Int = 0): Unit = {
    import spark.implicits._
    batches.zipWithIndex.foreach { case (rows, k0) =>
      val k = k0 + offset
      val stage = new java.io.File(dir, s"_stage$k")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().find(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, s"batch-$k.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.setLastModified(1700000000000L + k * 60000L)
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
  }

  test("streamed incremental dedup == the batch registry chain") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-spec").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    // batch 0 has an in-batch dup (2 ~ 1); batch 1 re-sends "aaa"
    // (cross-batch dup) and introduces "ccc"; batch 2 re-sends "ccc"
    // under a SMALLER id — first-arrival must win, not min-id
    writeBatches(src.toString, Seq(
      Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")),
      Seq((10L, "aaa"), (11L, "ccc")),
      Seq((5L, "ccc"), (6L, "ddd"))))

    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalDedup(stream, "doc_id", "text",
      s"$work/registry", s"$work/out", s"$work/ckp")
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(s"$work/out")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L, 6L, 11L))

    // the registry survives the stream: a fresh BATCH call against it
    // still dedups (the cross-restart story)
    val post = graft.operators.Dedup.incrementalExactDedup(
      { import spark.implicits._
        Seq((20L, "bbb"), (21L, "eee")).toDF("doc_id", "text") },
      "doc_id", "text", s"$work/registry")
    assert(post.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(21L))
  }

  test("streamed index ingest == one-shot build; batch retry is idempotent") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-idx").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    val b0 = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"))
    val b1 = Seq((3L, "alpha delta"), (4L, "gamma gamma gamma beta"))
    writeBatches(src.toString, Seq(b0, b1))
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalIndex(stream, "doc_id", "text",
      s"$work/index", s"$work/ckp")
    try q.processAllAvailable() finally q.stop()

    def top(path: String) = graft.operators.InvertedIndex
      .searchTopK(spark, path, Seq("beta", "gamma"), k = 4,
        idColName = "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val streamed = top(s"$work/index")
    graft.operators.InvertedIndex.build((b0 ++ b1).toDF("doc_id", "text"),
      "doc_id", "text", s"$work/flat")
    assert(streamed == top(s"$work/flat"))
    assert(streamed.nonEmpty)

    // a checkpoint-replayed batch rewrites its own segment: re-ingest
    // batch 1 with the same id — segment count and answers unchanged
    val segsBefore = new java.io.File(s"$work/index/segments")
      .listFiles.count(_.isDirectory)
    graft.operators.InvertedIndex.ingestBatch(b1.toDF("doc_id", "text"),
      "doc_id", "text", s"$work/index", batchId = 1L)
    val segsAfter = new java.io.File(s"$work/index/segments")
      .listFiles.count(_.isDirectory)
    assert(segsBefore == segsAfter)
    assert(top(s"$work/index") == streamed)

    // empty batches are skipped, not written as unreadable segments
    graft.operators.InvertedIndex.ingestBatch(
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", s"$work/index", batchId = 99L)
    assert(new java.io.File(s"$work/index/segments")
      .listFiles.count(_.isDirectory) == segsAfter)

    // in-stream compaction cadence bounds segments without changing
    // answers
    val src2 = new java.io.File(work, "src2"); src2.mkdirs()
    writeBatches(src2.toString, Seq(b0, b1))
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src2.toString)
    val q2 = CorpusStream.incrementalIndex(stream2, "doc_id", "text",
      s"$work/index2", s"$work/ckp2", compactEvery = Some(2))
    try q2.processAllAvailable() finally q2.stop()
    assert(new java.io.File(s"$work/index2/segments")
      .listFiles.count(_.isDirectory) == 1)
    assert(top(s"$work/index2") == streamed)
  }

  test("exactly-once dedup stream: delivered view == plain stream, crash leftovers invisible") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-eo").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString, Seq(
      Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")),
      Seq((10L, "aaa"), (11L, "ccc")),
      Seq((5L, "ccc"), (6L, "ddd"))))
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalDedupExactlyOnce(stream, "doc_id",
      "text", s"$work/registry", s"$work/out", s"$work/ckp",
      compactEvery = Some(2))
    try q.processAllAvailable() finally q.stop()
    def delivered() = CorpusStream.deliveredOutput(spark, s"$work/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    // same survivors as the plain stream's contract (first arrival
    // wins across batches), one committed dir per batch
    assert(delivered() == Seq(1L, 3L, 6L, 11L))
    assert(new java.io.File(s"$work/out").listFiles
      .count(_.isDirectory) == 3)
    // an uncommitted crash leftover is invisible to the reader
    val junk = new java.io.File(s"$work/out/batch-9"); junk.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$work/out/batch-9/part-junk.parquet"),
      Array[Byte](9, 9))
    assert(delivered() == Seq(1L, 3L, 6L, 11L))
    // a restarted stream with one more source batch appends exactly
    // its new survivors
    writeBatches(src.toString, Seq(Seq((7L, "ddd"), (8L, "fff"))),
      offset = 3)
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q2 = CorpusStream.incrementalDedupExactlyOnce(stream2, "doc_id",
      "text", s"$work/registry", s"$work/out", s"$work/ckp")
    try q2.processAllAvailable() finally q2.stop()
    assert(delivered() == Seq(1L, 3L, 6L, 8L, 11L))
  }

  test("exactly-once stream refuses a fresh checkpoint over a stale output") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-stale").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString, Seq(Seq((1L, "aaa"))))
    val schema = spark.read.parquet(src.toString).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalDedupExactlyOnce(stream(), "doc_id",
      "text", s"$work/registry", s"$work/out", s"$work/ckp")
    try q.processAllAvailable() finally q.stop()
    // same outPath, FRESH checkpoint: batch ids would restart at 0 and
    // the stale batch-0/_SUCCESS would silently suppress delivery —
    // must refuse at start, before any batch runs
    val e = intercept[IllegalArgumentException](
      CorpusStream.incrementalDedupExactlyOnce(stream(), "doc_id",
        "text", s"$work/registry", s"$work/out", s"$work/ckp2"))
    assert(e.getMessage.contains("fresh"))
    // the original checkpoint continues fine
    val q2 = CorpusStream.incrementalDedupExactlyOnce(stream(), "doc_id",
      "text", s"$work/registry", s"$work/out", s"$work/ckp")
    try q2.processAllAvailable() finally q2.stop()
    assert(CorpusStream.deliveredOutput(spark, s"$work/out")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("index streams refuse a fresh checkpoint over an existing index") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-idx-stale").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString, Seq(Seq((1L, "alpha beta"))))
    val schema = spark.read.parquet(src.toString).schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalIndex(stream(), "doc_id", "text",
      s"$work/index", s"$work/ckp")
    try q.processAllAvailable() finally q.stop()
    // same indexPath, FRESH checkpoint: batch ids restart at 0 and the
    // stale ingested/batch-0 ledger marker makes ingestBatch return
    // without ingesting — the new stream's batches silently vanish, so
    // both index streams must refuse at start
    val e = intercept[IllegalArgumentException](
      CorpusStream.incrementalIndex(stream(), "doc_id", "text",
        s"$work/index", s"$work/ckp2"))
    assert(e.getMessage.contains("fresh"))
    val e2 = intercept[IllegalArgumentException](
      CorpusStream.incrementalUpsertIndex(stream(), "doc_id", "text",
        s"$work/index", s"$work/ckp3"))
    assert(e2.getMessage.contains("fresh"))
    val e3 = intercept[IllegalArgumentException](
      CorpusStream.incrementalCdcIndex(stream(), "doc_id", "text", "op",
        s"$work/index", s"$work/ckp4"))
    assert(e3.getMessage.contains("fresh"))
    // the original checkpoint continues fine and stays answer-correct
    val q2 = CorpusStream.incrementalIndex(stream(), "doc_id", "text",
      s"$work/index", s"$work/ckp")
    try q2.processAllAvailable() finally q2.stop()
    assert(graft.operators.InvertedIndex.searchTopK(spark,
      s"$work/index", Seq("alpha"), k = 2, idColName = "doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("near-dup stream restart heals a crashed compaction before probing") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-heal").toString
    val base = "the quick brown fox jumps over the lazy dog near the river"
    // register the base doc, then craft compactNearDupRegistry's crash
    // window on the shingle store: committed target copy + manifest,
    // input dir still present — rows duplicated until healed
    val reg = s"$work/registry"
    graft.operators.Dedup.nearDupAgainstRegistry(
      Seq((0L, base)).toDF("doc_id", "text"), "doc_id", "text", reg)
    val sh = s"$reg/shingles"
    val input = new java.io.File(sh).listFiles()
      .filter(_.isDirectory).head.getName
    spark.read.parquet(s"$sh/$input")
      .write.mode("overwrite").parquet(s"$sh/batch-crash")
    graft.operators.Manifest.write(
      new org.apache.hadoop.fs.Path(sh)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(s"$sh/compacting"),
      Seq("batch-crash", input))
    // a restarted stream must emit the near-dup match exactly ONCE:
    // incrementalNearDup heals on start, before the first probe
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString,
      Seq(Seq((10L, base.replace("river", "creek")))))
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalNearDup(stream, "doc_id", "text",
      reg, s"$work/out", s"$work/ckp", threshold = 0.5)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$work/out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 0L)))
  }

  test("dedup stream with compaction cadence: same survivors, one registry dir") {
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-cadence").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString, Seq(
      Seq((1L, "aaa"), (2L, "bbb")),
      Seq((3L, "aaa"), (4L, "ccc")),
      Seq((5L, "ccc"), (6L, "ddd")),
      Seq((7L, "ddd"), (8L, "eee"))))
    val schema = spark.read.parquet(src.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    val q = CorpusStream.incrementalDedup(stream, "doc_id", "text",
      s"$work/registry", s"$work/out", s"$work/ckp",
      compactEvery = Some(2))
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(s"$work/out")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 4L, 6L, 8L))
    // 4 appends, compacted at batches 1 and 3: the final compact
    // collapsed everything into one committed batch dir
    val dirs = new java.io.File(s"$work/registry")
      .listFiles.count(_.isDirectory)
    assert(dirs == 1, s"registry holds $dirs batch dirs after compaction")
  }

  test("bucketed cadence compaction: exact and near-dup streams match the plain layout") {
    import spark.implicits._
    val work = java.nio.file.Files
      .createTempDirectory("graft-cs-bktcad").toString
    val src = new java.io.File(work, "src"); src.mkdirs()
    writeBatches(src.toString, Seq(
      Seq((1L, "aaa"), (2L, "bbb")),
      Seq((3L, "aaa"), (4L, "ccc")),
      Seq((5L, "ccc"), (6L, "ddd")),
      Seq((7L, "ddd"), (8L, "eee"))))
    val schema = spark.read.parquet(src.toString).schema
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src.toString)
    // exact: compactBuckets routes the cadence through the bucketed
    // compactor; batches AFTER a compaction probe the bucketed store
    val q = CorpusStream.incrementalDedup(stream, "doc_id", "text",
      s"$work/registry", s"$work/out", s"$work/ckp",
      compactEvery = Some(2), compactBuckets = Some(4))
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$work/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 4L, 6L, 8L))
    // the registry's surviving batch dir is the bucketed layout
    val reg = new java.io.File(s"$work/registry")
      .listFiles.filter(_.isDirectory).map(_.getName).toSeq
    assert(reg.count(_.startsWith("batch-")) == 1, reg.toString)
    assert(reg.filter(_.startsWith("batch-")).forall(n =>
      new java.io.File(s"$work/registry/$n/_bucket_spec.json").exists))

    // near-dup: same shape; matches against pre-compaction registrants
    // must survive the layout change, sidecar included
    val nsrc = new java.io.File(work, "nsrc"); nsrc.mkdirs()
    val long1 = "the quick brown fox jumps over the lazy dog near the river today"
    val long2 = "completely different prose about catalyst optimizer rule batches"
    writeBatches(nsrc.toString, Seq(
      Seq((1L, long1), (2L, long2)),
      Seq((3L, "yet another unrelated sentence with original words entirely")),
      Seq((10L, long1.replace("today", "tomorrow")),
        (11L, long2))))
    val nschema = spark.read.parquet(nsrc.toString).schema
    val nstream = spark.readStream.schema(nschema)
      .option("maxFilesPerTrigger", 1).parquet(nsrc.toString)
    val nq = CorpusStream.incrementalNearDup(nstream, "doc_id", "text",
      s"$work/nreg", s"$work/nout", s"$work/nckp", threshold = 0.5,
      compactEvery = Some(2), compactBuckets = Some(4))
    try nq.processAllAvailable() finally nq.stop()
    val m = spark.read.parquet(s"$work/nout")
      .select("doc_id", "reg_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch 2 (after the batch-1 bucketed compaction): 10 near-dups 1,
    // 11 exact-dups 2 — both matched THROUGH the bucketed stores
    assert(m == Set((10L, 1L), (11L, 2L)))
    assert(new java.io.File(s"$work/nreg/bands")
      .listFiles.map(_.getName).exists(_.startsWith("ids-")))
  }
}

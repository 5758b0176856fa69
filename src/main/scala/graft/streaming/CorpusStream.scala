package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Continuous-ingest corpus pipelines: the streaming face of the
  * incremental dedup registries. `EventsStream` covers the stateful
  * per-event operators (windows, watermark dedup, interval joins);
  * this module composes `foreachBatch` with the batch-incremental
  * operators in [[graft.operators.Dedup]], which already solve the
  * hard part — crash-safe persistent registries — so the stream gets
  * cross-RESTART dedup, not just cross-batch: state lives in the
  * registry, not in the streaming state store.
  *
  * Delivery contract (inherited from `incrementalExactDedup` +
  * checkpointing): a batch that commits its registry append and then
  * crashes before the sink write is re-run by the checkpoint as the
  * same epoch, and its rows — already registered — dedup to empty, so
  * rows are delivered at-most-once to `outPath` while the registry
  * itself stays exact (never double-registers, never loses a digest).
  * When delivery itself must be exact, use
  * [[incrementalDedupExactlyOnce]]: per-batch committed output dirs
  * written BEFORE the registry append make every crash window replay
  * to the same delivered rows.
  */
object CorpusStream {

  /** Stream micro-batches through
    * [[graft.operators.Dedup.incrementalExactDedup]] against the
    * persistent digest registry at `registryPath`, appending each
    * batch's survivors (first occurrence of each content digest across
    * the whole stream history) to `outPath` as parquet.
    *
    * Scale shape per micro-batch: one digest-only anti-join against
    * the registry (16-byte rows, never documents) + one digest append
    * — O(batch) work regardless of how much history the registry
    * holds, the property that makes this viable as a continuous
    * 100 TB ingest gate where re-running corpus-wide dedup per batch
    * would be O(corpus).
    */
  def incrementalDedup(docs: DataFrame, idCol: String, textCol: String,
                       registryPath: String, outPath: String,
                       checkpoint: String,
                       compactEvery: Option[Int] = None,
                       compactBuckets: Option[Int] = None): StreamingQuery = {
    // a PREVIOUS run may have died mid-compaction; replay its
    // interrupted delete before the first batch probes (duplicate
    // digests are anti-join-harmless but double the probe scan)
    Dedup.healExactRegistry(docs.sparkSession, registryPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.incrementalExactDedup(batch.toDF(), idCol, textCol,
            registryPath)
          .write.mode("append").parquet(outPath)
        // same single-writer argument as incrementalIndex: the stream
        // thread owns the registry, so in-stream compaction honors the
        // offline contract; a cadence keeps the batch-dir count (and
        // thus every probe's file listing) flat on long streams
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            compactExact(batch.sparkSession, registryPath, compactBuckets)
        }
        ()
      }
      .start()
  }

  /** Run the cadence compaction in the layout the caller asked for:
    * `compactBuckets = Some(b)` writes the compacted store bucketed
    * (the Exchange-free per-batch probe at scale —
    * [[graft.operators.Dedup.compactExactRegistryBucketed]]); None
    * keeps the plain layout.
    */
  private def compactExact(spark: org.apache.spark.sql.SparkSession,
                           registryPath: String,
                           compactBuckets: Option[Int]): Unit =
    compactBuckets match {
      case Some(b) => Dedup.compactExactRegistryBucketed(spark, registryPath, b)
      case None => Dedup.compactExactRegistry(spark, registryPath)
    }

  private def compactNearDup(spark: org.apache.spark.sql.SparkSession,
                             registryPath: String,
                             compactBuckets: Option[Int]): Unit =
    compactBuckets match {
      case Some(b) =>
        Dedup.compactNearDupRegistryBucketed(spark, registryPath, b)
      case None => Dedup.compactNearDupRegistry(spark, registryPath)
    }

  /** [[incrementalDedup]] upgraded to EXACTLY-ONCE delivery — the
    * "idempotent-sink upgrade" the module doc describes: each batch's
    * survivors land in their own committed directory
    * `outPath/batch-<batchId>` via
    * [[graft.operators.Dedup.incrementalExactDedupTo]]'s
    * deliver-then-register ordering, so a crash ANYWHERE in the batch
    * replays to the same delivered rows — never dropped (the
    * at-most-once gap: registered but unwritten), never doubled (the
    * committed-delivery skip). Read the result with
    * [[deliveredOutput]]; a flat `spark.read.parquet(outPath)` would
    * also pick up uncommitted crash leftovers.
    *
    * Same per-batch scale shape as [[incrementalDedup]]; the only
    * added cost is one `_SUCCESS` existence probe per batch.
    */
  /** Refuse the one configuration where the committed-delivery skip
    * turns into silent data loss: a FRESH checkpoint (batch ids
    * restart at 0) pointed at an outPath that already holds delivered
    * batch dirs from a previous stream. The stale `batch-0/_SUCCESS`
    * would suppress the new stream's delivery while the registry
    * append still ran — rows registered, never delivered, no error
    * anywhere. Continuations (checkpoint offsets exist) pass.
    */
  private def requireFreshOrContinuing(
      spark: org.apache.spark.sql.SparkSession,
      checkpoint: String, outPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val continuing = fs.exists(
      new org.apache.hadoop.fs.Path(s"$checkpoint/offsets"))
    if (!continuing) {
      val stale = Dedup.committedBatchDirs(fs, outPath)
      require(stale.isEmpty,
        s"checkpoint $checkpoint is fresh but $outPath already holds " +
          s"${stale.length} delivered batch dirs — their _SUCCESS " +
          "markers would silently suppress the restarted batch-id " +
          "sequence's deliveries; use a fresh outPath or restore the " +
          "original checkpoint")
    }
  }

  /** The index-stream twin of [[requireFreshOrContinuing]]: a FRESH
    * checkpoint (batch ids restart at 0) pointed at an indexPath that
    * already holds `ingested/batch-<id>` ledger markers from a
    * previous stream makes [[graft.operators.InvertedIndex.ingestBatch]]
    * /`ingestUpsertBatch` return WITHOUT ingesting — the new stream's
    * first batches silently vanish, rows never indexed, no error
    * anywhere. Continuations (checkpoint offsets exist) pass.
    */
  private def requireFreshOrContinuingIndex(
      spark: org.apache.spark.sql.SparkSession,
      checkpoint: String, indexPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val continuing = fs.exists(
      new org.apache.hadoop.fs.Path(s"$checkpoint/offsets"))
    if (!continuing) {
      val ledger = new org.apache.hadoop.fs.Path(s"$indexPath/ingested")
      val stale =
        if (fs.exists(ledger)) fs.listStatus(ledger).length else 0
      val segments = new org.apache.hadoop.fs.Path(s"$indexPath/segments")
      val staleSegs =
        if (fs.exists(segments)) fs.listStatus(segments).length else 0
      require(stale == 0 && staleSegs == 0,
        s"checkpoint $checkpoint is fresh but $indexPath already holds " +
          s"$stale ingested-batch ledger markers and $staleSegs " +
          "segments — the restarted batch-id sequence would match the " +
          "ledger and silently skip ingesting the new stream's first " +
          "batches; use a fresh indexPath or restore the original " +
          "checkpoint")
    }
  }

  def incrementalDedupExactlyOnce(docs: DataFrame, idCol: String,
                                  textCol: String,
                                  registryPath: String, outPath: String,
                                  checkpoint: String,
                                  compactEvery: Option[Int] = None,
                                  compactBuckets: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuing(docs.sparkSession, checkpoint, outPath)
    Dedup.healExactRegistry(docs.sparkSession, registryPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.incrementalExactDedupTo(batch.toDF(), idCol, textCol,
          registryPath, s"$outPath/batch-$batchId")
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            compactExact(batch.sparkSession, registryPath, compactBuckets)
        }
        ()
      }
      .start()
  }

  /** The committed view of an [[incrementalDedupExactlyOnce]] output:
    * reads only `batch-*` directories whose `_SUCCESS` marker exists,
    * so a delivery the stream crashed mid-write stays invisible until
    * its replay commits it. Fails loudly on an empty/absent output —
    * "no batches delivered yet" must not read as an empty corpus.
    */
  def deliveredOutput(spark: org.apache.spark.sql.SparkSession,
                      outPath: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = Dedup.committedBatchDirs(fs, outPath)
    require(dirs.nonEmpty, s"$outPath has no committed delivered batches")
    spark.read.parquet(dirs: _*)
  }

  /** The near-dup sibling: stream micro-batches through
    * [[graft.operators.Dedup.nearDupAgainstRegistry]], appending each
    * batch's verified matches (idCol, reg_id, jaccard ≥ threshold) to
    * `outPath`; clean rows register into the persistent LSH registry
    * and become the match targets of every later batch. Re-run
    * semantics follow the batch operator: ids the registry already
    * committed neither probe nor re-register, so a committed batch's
    * checkpoint retry emits nothing — no self-matches, and no
    * spurious matches between intra-batch siblings that registered
    * cleanly on the first run.
    *
    * Per micro-batch cost: narrow registry-column scans (the
    * retry-guard anti-joins read only the stores' id columns, the
    * probe reads the 24 B band index — never documents or shingle
    * sets, each scanned ONCE per batch behind a checkpoint) + a
    * band-key probe join + per-candidate verify. Shuffled bytes are
    * O(batch + candidates); compact the registry on a cadence so the
    * index scans stay a handful of files (see the registry-layout
    * note in [[graft.operators.Dedup]]).
    */
  def incrementalNearDup(docs: DataFrame, idCol: String, textCol: String,
                         registryPath: String, outPath: String,
                         checkpoint: String,
                         threshold: Double = 0.8,
                         compactEvery: Option[Int] = None,
                         compactBuckets: Option[Int] = None): StreamingQuery = {
    // MANDATORY heal before the first probe: a compaction the previous
    // run crashed mid-way leaves duplicated shingle/band rows, and —
    // unlike the exact registry's anti-join — the probe would emit
    // every match against a duplicated id TWICE into outPath, an
    // error no later compaction can retract
    Dedup.healNearDupRegistry(docs.sparkSession, registryPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.nearDupAgainstRegistry(batch.toDF(), idCol, textCol,
            registryPath, threshold = threshold)
          .write.mode("append").parquet(outPath)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            compactNearDup(batch.sparkSession, registryPath, compactBuckets)
        }
        ()
      }
      .start()
  }

  /** The PERCEPTUAL sibling for media streams: each micro-batch of
    * (id, blob) images probes the persistent dHash registry
    * ([[graft.operators.Dedup.perceptualDedupAgainstRegistry]]),
    * appends its verified matches (idCol, reg_id, ham) to `outPath`,
    * and registers its clean rows' hashes as later batches' targets.
    * Re-run semantics follow the batch operator: committed ids
    * neither probe nor re-register, so a checkpoint retry emits
    * nothing. Per micro-batch cost: one decode+hash pass over the
    * batch, narrow (id, hash) registry scans, a banded join — pixels
    * never enter the registry or the shuffle.
    *
    * Delivery is AT-MOST-ONCE for the match rows (the
    * [[incrementalNearDup]] trade): the registry append lands inside
    * the probe call, BEFORE this sink's match write, so a crash
    * between the two permanently drops that batch's matches — the
    * committed retry probes nothing and emits nothing. When the match
    * stream is the product (not just telemetry), use
    * [[incrementalImageNearDupExactlyOnce]].
    */
  def incrementalImageNearDup(media: DataFrame, idCol: String,
                              registryPath: String, outPath: String,
                              checkpoint: String,
                              bands: Int = 4, maxHamming: Int = 3,
                              gridW: Int = 8, gridH: Int = 8)
  : StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Dedup.perceptualDedupAgainstRegistry(batch.toDF(), idCol,
            registryPath, bands, maxHamming, gridW, gridH)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()

  /** [[incrementalImageNearDup]] with EXACTLY-ONCE delivery of the
    * match rows: each batch's verified matches land in their own
    * committed `outPath/batch-<batchId>` directory BEFORE the batch's
    * clean hashes register
    * ([[graft.operators.Dedup.perceptualDedupAgainstRegistryTo]]), so
    * a crash between the match write and the registry append can no
    * longer lose the matches — the perceptual twin of
    * [[incrementalNearDupExactlyOnce]], same fresh-checkpoint guard,
    * read with [[deliveredOutput]].
    */
  def incrementalImageNearDupExactlyOnce(media: DataFrame, idCol: String,
                                         registryPath: String,
                                         outPath: String,
                                         checkpoint: String,
                                         bands: Int = 4, maxHamming: Int = 3,
                                         gridW: Int = 8, gridH: Int = 8)
  : StreamingQuery = {
    requireFreshOrContinuing(media.sparkSession, checkpoint, outPath)
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.perceptualDedupAgainstRegistryTo(batch.toDF(), idCol,
          registryPath, s"$outPath/batch-$batchId",
          bands, maxHamming, gridW, gridH)
        ()
      }
      .start()
  }

  /** [[incrementalNearDup]] with EXACTLY-ONCE delivery of the match
    * rows: each batch's verified matches land in their own committed
    * `outPath/batch-<batchId>` directory BEFORE the batch's clean rows
    * register ([[graft.operators.Dedup.nearDupAgainstRegistryTo]]), so
    * a crash between the match write and the registry append can no
    * longer lose the matches (the plain variant's at-most-once
    * window: a committed re-run probes nothing and emits nothing).
    * Read with [[deliveredOutput]].
    */
  def incrementalNearDupExactlyOnce(docs: DataFrame, idCol: String,
                                    textCol: String,
                                    registryPath: String, outPath: String,
                                    checkpoint: String,
                                    threshold: Double = 0.8,
                                    compactEvery: Option[Int] = None,
                                    compactBuckets: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuing(docs.sparkSession, checkpoint, outPath)
    Dedup.healNearDupRegistry(docs.sparkSession, registryPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Dedup.nearDupAgainstRegistryTo(batch.toDF(), idCol, textCol,
          registryPath, s"$outPath/batch-$batchId", threshold = threshold)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            compactNearDup(batch.sparkSession, registryPath, compactBuckets)
        }
        ()
      }
      .start()
  }

  /** Stateless streaming CURATION: per micro-batch, drop documents
    * sharing >= `minHits` distinct `shingleN`-grams with the STATIC
    * benchmark frame ([[graft.operators.Decontam.contaminatedIds]] —
    * batch-local evaluation is exact because the decision depends
    * only on the document and the static benchmark, never on other
    * corpus rows), then apply the Gopher quality + repetition
    * predicates; survivors append to `outPath`. No state store and
    * no registry — every rule is per-document, so this is the
    * curation sweep the batch gates prove, running unchanged on a
    * stream. Delivery is at-least-once per crash window (idempotent
    * upstream of a dedup stage; put [[incrementalDedup]] downstream
    * when exact delivery matters).
    */
  /** Streaming percolate — alert/routing rules over a document
    * stream: every micro-batch matches against the STATIC rule table
    * ([[graft.operators.Percolate]]'s term-set subset), appending
    * (id, query_id, matched_terms) rows. Stateless — no registry, no
    * state store: rules validate once here and broadcast inside every
    * trigger's join, so a crash replays a batch to the identical
    * match rows (the file sink's commit log dedups the epoch).
    */
  /** Streaming INGEST: an [[graft.operators.IngestPipeline]] (pure
    * narrow Column transforms by construction — no processor
    * shuffles) applied per micro-batch. Stateless, so the union of
    * all batches' outputs ≡ the batch pipeline over the whole input
    * (the streamingPercolate discipline — the gate's oracle replays
    * exactly that batch equivalence). Enrich processors compose: the
    * policy frame is static and broadcast per batch, ES's own
    * enrich-at-ingest shape.
    */
  def ingestPipeline(docs: DataFrame,
                     pipe: DataFrame => DataFrame,
                     outPath: String,
                     checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        pipe(batch.toDF()).write.mode("append").parquet(outPath)
        ()
      }
      .start()

  def streamingPercolate(docs: DataFrame, idCol: String,
                         textCol: String,
                         rules: Seq[(String, Seq[String], Int)],
                         outPath: String,
                         checkpoint: String): StreamingQuery = {
    require(rules.nonEmpty, "streamingPercolate: no rules")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.operators.Percolate
          .percolateRules(batch.toDF(), idCol, textCol, rules)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }

  def curationFilter(docs: DataFrame, idCol: String, textCol: String,
                     bench: DataFrame, benchTextCol: String,
                     shingleN: Int, minHits: Long,
                     outPath: String, checkpoint: String,
                     minStopHits: Long = 2L): StreamingQuery = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis
    // the benchmark gram set is STATIC across the stream's life:
    // distinct it once, persist, and materialize eagerly — rebuilding
    // the tokenize+explode+distinct shuffle inside foreachBatch would
    // add a full benchmark job + broadcast to EVERY trigger's latency.
    // (Persisted for the query's lifetime; the caller stops the query
    // and owns the session, so the handful of MB ride until then.)
    val benchGrams =
      bench.select(TextAnalysis.tokens(col(benchTextCol)).as("_toks"))
        .select(explode(
          TextAnalysis.shinglesFromTokens(col("_toks"), shingleN))
          .as("_gram"))
        .distinct()
        .persist()
    benchGrams.count()
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        // dc1's shape over the CACHED gram set: batch grams hash-join
        // the broadcast bench grams, >= minHits distinct hits flag the
        // doc, anti-join removes it
        val contaminated = batch
          .select(col(idCol),
            TextAnalysis.tokens(col(textCol)).as("_toks"))
          .select(col(idCol), explode(
            TextAnalysis.shinglesFromTokens(col("_toks"), shingleN))
            .as("_gram"))
          .join(broadcast(benchGrams), Seq("_gram"))
          .groupBy(idCol)
          .agg(count_distinct(col("_gram")).as("_nh"))
          .filter(col("_nh") >= minHits)
          .select(idCol)
        batch.join(contaminated, Seq(idCol), "left_anti")
          .filter(graft.operators.QualityRules.gopherPass(col(textCol),
            minStopHits = minStopHits) &&
            graft.operators.Repetition.gopherPass(col(textCol)))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
  }

  /** Stream micro-batches into a persistent
    * [[graft.operators.InvertedIndex]]: each batch lands as one
    * immutable segment named by its batch id, so a checkpoint-replayed
    * batch REWRITES its own segment instead of double-registering its
    * postings (exactly-once ingest per batch id). Searches stay
    * O(query-term postings) while the stream runs; compact() on a
    * cadence keeps the segment count flat.
    *
    * Append contract (inherited): doc ids must be new across batches —
    * put [[incrementalDedup]] upstream when the stream can re-send
    * documents under fresh ids.
    */
  def incrementalIndex(docs: DataFrame, idCol: String, textCol: String,
                       indexPath: String, checkpoint: String,
                       buckets: Int = 0,
                       compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(docs.sparkSession, checkpoint, indexPath)
    // replay an interrupted compact() before serving or appending:
    // the crashed window holds postings twice, and ingestBatch's
    // batch-id ledger (not segment names, which compaction renames)
    // is what keeps replayed batches from re-appending afterwards
    graft.operators.InvertedIndex.heal(docs.sparkSession, indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.InvertedIndex.ingestBatch(batch.toDF(), idCol,
          textCol, indexPath, batchId, bucketsIfNew = buckets)
        // in-stream compaction is safe under the index's single-writer
        // contract — the stream thread IS the writer; `compactEvery`
        // bounds the segment count a long-running ingest accumulates
        // (searches during the compaction window see the documented
        // transient duplicate-postings state, so leave this None if
        // queries run concurrently and compact offline instead)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.InvertedIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }

  /** [[incrementalIndex]] with UPSERT semantics — CDC-style index
    * maintenance: a batch may re-send earlier ids with new content,
    * and [[graft.operators.InvertedIndex.ingestUpsertBatch]]
    * tombstones the live versions (scoped to the OTHER segments —
    * never the batch's own retry target) before landing the batch as
    * its own segment. Last arrival wins per id, exactly once per
    * batch id, crash windows replay as documented on the operator.
    */
  /** The FULL CDC face: op-typed events — `upsert` rows carrying new
    * content AND `delete` rows that tombstone — applied exactly once
    * per batch id by
    * [[graft.operators.InvertedIndex.ingestCdcBatch]].
    * [[incrementalUpsertIndex]] serves feeds that only update; a real
    * change-data-capture feed also deletes, and this is the streaming
    * path for those events. Deletes of ids that are not live no-op
    * (replay idempotence; ES's 404-not-failure), one event per id per
    * batch (collapse last-op-wins upstream), crash windows replay as
    * documented on the operator.
    */
  def incrementalCdcIndex(events: DataFrame, idCol: String,
                          textCol: String, opCol: String,
                          indexPath: String, checkpoint: String,
                          buckets: Int = 0,
                          compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(events.sparkSession, checkpoint, indexPath)
    graft.operators.InvertedIndex.heal(events.sparkSession, indexPath)
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.InvertedIndex.ingestCdcBatch(batch.toDF(),
          idCol, textCol, opCol, indexPath, batchId,
          bucketsIfNew = buckets)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.InvertedIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }

  /** Stream micro-batches into a persistent
    * [[graft.operators.VectorIndex]] — the ANN twin of
    * [[incrementalIndex]]: each batch lands as one cell-partitioned
    * segment named by its batch id (exactly-once per batch id via the
    * shared ingest ledger), the FIRST batch trains the frozen
    * quantizer (it must carry ≥ `nlist` vectors), and `compactEvery`
    * folds segments + tombstones on a cadence so searches list few
    * dirs and the ids ledger goes id-bucketed (the Exchange-free
    * probe layout). Append contract inherited: ids new across
    * batches.
    */
  def incrementalVectorIndex(docs: DataFrame, idCol: String,
                             vecCol: String,
                             indexPath: String, checkpoint: String,
                             nlist: Int = 16,
                             compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(docs.sparkSession, checkpoint, indexPath)
    graft.operators.VectorIndex.heal(docs.sparkSession, indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.VectorIndex.ingestBatch(batch.toDF(), idCol,
          vecCol, indexPath, batchId, nlistIfNew = nlist)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.VectorIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }

  /** The full CDC face for the vector index — op-typed events
    * (`upsert` rows carrying new vectors AND `delete` rows) applied
    * exactly once per batch id by
    * [[graft.operators.VectorIndex.ingestCdcBatch]]; the
    * [[incrementalCdcIndex]] contract verbatim (one event per id per
    * batch, deletes of non-live ids no-op, crash windows replay as
    * documented on the operator).
    */
  def incrementalCdcVectorIndex(events: DataFrame, idCol: String,
                                vecCol: String, opCol: String,
                                indexPath: String, checkpoint: String,
                                nlist: Int = 16,
                                compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(events.sparkSession, checkpoint, indexPath)
    graft.operators.VectorIndex.heal(events.sparkSession, indexPath)
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.VectorIndex.ingestCdcBatch(batch.toDF(), idCol,
          vecCol, opCol, indexPath, batchId, nlistIfNew = nlist)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.VectorIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }

  /** [[incrementalVectorIndex]] with UPSERT semantics: a batch may
    * re-send earlier ids with new vectors, and
    * [[graft.operators.VectorIndex.ingestUpsertBatch]] tombstones the
    * live versions (scoped to the OTHER segments — never the batch's
    * own retry target) before landing the batch as its own segment.
    * Last arrival wins per id, exactly once per batch id.
    */
  def incrementalUpsertVectorIndex(docs: DataFrame, idCol: String,
                                   vecCol: String,
                                   indexPath: String, checkpoint: String,
                                   nlist: Int = 16,
                                   compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(docs.sparkSession, checkpoint, indexPath)
    graft.operators.VectorIndex.heal(docs.sparkSession, indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.VectorIndex.ingestUpsertBatch(batch.toDF(), idCol,
          vecCol, indexPath, batchId, nlistIfNew = nlist)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.VectorIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }

  def incrementalUpsertIndex(docs: DataFrame, idCol: String,
                             textCol: String,
                             indexPath: String, checkpoint: String,
                             buckets: Int = 0,
                             compactEvery: Option[Int] = None): StreamingQuery = {
    requireFreshOrContinuingIndex(docs.sparkSession, checkpoint, indexPath)
    graft.operators.InvertedIndex.heal(docs.sparkSession, indexPath)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.operators.InvertedIndex.ingestUpsertBatch(batch.toDF(),
          idCol, textCol, indexPath, batchId, bucketsIfNew = buckets)
        compactEvery.foreach { n =>
          if (n > 0 && batchId % n == n - 1)
            graft.operators.InvertedIndex.compact(
              batch.sparkSession, indexPath)
        }
        ()
      }
      .start()
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.Tables
import graft.functions.{TextAnalysis, VectorOps}
import graft.operators.{AsofJoin, Decontam, Dedup, Packing, Quantization, RangeJoin, Repetition, Sampling, Similarity}
import graft.plans.VectorExpressions
import graft.streaming.EventsStream

/** Round-5 training-pipeline surface: engine-portable deterministic
  * sampling (the md5 trick turns the sampling family from rows-only to
  * full-oracle), distributed sequence packing, connected-components
  * dedup clustering, LSH-ANN recall proof on planted clones, portable
  * fingerprinting, strided real-video frame sampling, and
  * partition-pruned data layout.
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Micro-precision copy of `events` for the streaming file source
    * (the raw parquet is TIMESTAMP(NANOS), which the source rejects);
    * written once per sf dir, reused by every streaming gate.
    */
  private def eventsStreamFixture(s: SparkSession, d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val src = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-st1-$tag").toString
    if (!new java.io.File(s"$src/_SUCCESS").exists()) {
      Tables.load(s, d, "events").write.mode("overwrite").parquet(src)
    }
    src
  }

  /** Documents split into 4 single-file micro-batches (batch k = docs
    * with doc_id ≡ k mod 4) with STRICTLY ASCENDING modification
    * times: the parquet file stream source admits files oldest-first,
    * so with maxFilesPerTrigger=1 the batch arrival order 0,1,2,3 is
    * pinned — which makes cross-batch registry precedence (who
    * registered a digest first) deterministic and oracle-replayable.
    * Written once per sf dir.
    */
  private def docsStreamFixture(s: SparkSession, d: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft-st4fix-$tag")
    val done = new java.io.File(dir, "_FIXTURE_READY")
    // invalidate on source change: a fixture older than the documents
    // parquet it snapshots would stream stale batches while the oracle
    // reads the fresh table — a guaranteed mismatch masquerading as an
    // engine bug
    // deepest mtime in the parquet tree, not the top-level dir's: an
    // in-place rewrite of a data file under documents.parquet/ need
    // not advance the directory mtime. (Local-path helper by design —
    // the driver's testdata is always a local dir; a non-local URI
    // skips the check exactly as before.)
    def maxMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified() +:
          Option(f.listFiles).toSeq.flatten.map(maxMtime)).max
      else f.lastModified()
    val src = new java.io.File(s"$d/documents.parquet")
    if (done.exists() && src.exists() &&
        maxMtime(src) > done.lastModified()) {
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(dir)
    }
    if (!done.exists()) {
      dir.mkdirs()
      // the corpus has NO natural exact dups (dd1: n_unique == n_docs),
      // so clones are planted with +10001 — the +1 shifts the batch
      // class, making every planted dup CROSS-batch: the clone of doc k
      // arrives one batch after it, except k ≡ 3 (mod 4) where the
      // clone arrives in batch 0 BEFORE its original — so the gate also
      // proves first-arrival-wins over a later smaller id
      val base = t(s, d, "documents").select("doc_id", "text")
      val docs = base.unionByName(base.filter(col("doc_id") < 100)
        .select((col("doc_id") + 10001).as("doc_id"), col("text")))
      for (k <- 0 until 4) {
        val stage = new java.io.File(dir, s"_stage$k")
        docs.filter(col("doc_id") % 4 === k).coalesce(1)
          .write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(dir, s"batch-$k.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(1700000000000L + k * 60000L)
        stage.listFiles().foreach(_.delete())
        stage.delete()
      }
      done.createNewFile()
    }
    dir.toString
  }

  /** Run a streaming DataFrame to completion into a memory sink and
    * return the sink table. `processAllAvailable` drains the (finite)
    * file source; the temp view outlives the stopped query.
    */
  private def drainToTable(s: SparkSession, stream: DataFrame,
                           name: String, mode: OutputMode,
                           statePartitions: Option[Int] = None): DataFrame = {
    try s.catalog.dropTempView(name) catch { case _: Exception => () }
    // stateful streaming jobs size their state partitioning to active
    // keys, not to batch CPU count: every state partition pays a
    // per-micro-batch store commit, so 32 partitions for ~50 active
    // keys is mostly commit overhead. The setting is pinned into the
    // query at start() (streaming shuffle partitioning is fixed for
    // the query's lifetime), then restored for batch work.
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    statePartitions.foreach(n =>
      s.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
      try { q.processAllAvailable() } finally { q.stop() }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.table(name)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic seeded sample — md5 keys replayable by DuckDB, so
    // unlike g11's xxhash64 order this one faces the FULL oracle
    "sm1_sample_det" -> ((s, d) => {
      Sampling.deterministicSample(t(s, d, "orders"), "o_orderkey",
          n = 50, seed = 42)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),
    // exact n-per-stratum balanced subset (cap each market segment)
    "sm2_sample_strat" -> ((s, d) => {
      Sampling.stratifiedSample(t(s, d, "customer"), "c_custkey",
          "c_mktsegment", nPerStratum = 10, seed = 7)
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_mktsegment", "c_custkey")
    }),
    // weighted source mixing — per-row threshold test, zero shuffle
    "sm3_weighted_mix" -> ((s, d) => {
      Sampling.weightedMix(t(s, d, "documents"), "doc_id", "source",
          Map("src0" -> 0.9, "src1" -> 0.5, "src2" -> 0.25),
          seed = 11, defaultFraction = 0.1)
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),
    // token-BUDGET mixing (recipes stated in tokens, not keep
    // probabilities): per-source md5-priority draw until the budget
    // is spent, via the per-source two-phase distributed prefix sum;
    // exercises a mid-source cut (src0), an explicit zero (src1
    // dropped), a budget above the source total (src2 kept whole),
    // and the default budget on every other source. The oracle IS
    // the per-source window the distributed layout replaces.
    "sm6_token_budget_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Sampling.tokenBudgetMix(docs, "doc_id", "source", "n_tok",
          Map("src0" -> 700L, "src1" -> 0L, "src2" -> 100000L),
          seed = 13, defaultBudget = 120L)
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")
    }),
    // temperature-scaled mixing (T5/mT5 alpha-sampling) over a SKEWED
    // derived source split (60/30/10 — the fixture's real sources are
    // uniform, which would make tempering a no-op): tau = 0.3
    // upweights the small source to keep-all and down-samples the
    // big ones toward the tempered share; fractions 6-dp
    // floor-half-up rounded so libm pow drift cannot leak
    "sm8_temperature_mix" -> ((s, d) => {
      val docs = t(s, d, "documents").withColumn("src_grp",
        when(pmod(col("doc_id"), lit(10)) < 6, "g0")
          .when(pmod(col("doc_id"), lit(10)) < 9, "g1")
          .otherwise("g2"))
      Sampling.temperatureMix(docs, "doc_id", "src_grp",
          tau = 0.3, seed = 17)
        .select("doc_id", "src_grp")
        .orderBy("doc_id")
    }),
    // quality selection as a RANK cut (FineWeb's "best X% per
    // source"): top 30% of each source by token count, ties by id —
    // exactly replayable, unlike an interpolated quantile threshold
    "qf1_top_fraction" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      graft.operators.Selection.topFractionPerGroup(
          docs, "source", "n_tok", 0.3, "doc_id")
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")
    }),
    // epoch-weighted UPSAMPLING (weights > 1 are repetition): src0 at
    // 2.5 epochs (2 full copies + a 0.5 partial draw), src1 at exactly
    // 1.0 (one copy, no partial), src2 at 0.4 (partial only),
    // everything else dropped; per-(id, epoch) portable draw
    "sm7_epoch_mix" -> ((s, d) => {
      Sampling.epochMix(t(s, d, "documents"), "doc_id", "source",
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.4), seed = 7)
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")
    }),
    // the MATERIALIZED packed sequences (the dataloader artifact):
    // per bin, member ids in layout order and the boundary-joined
    // text stream; ids as CSV and text as md5 so the compare stays
    // scalar. The oracle replays the window layout + ordered
    // string_agg.
    "pack2_pack_sequences" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        .withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
      Packing.packSequences(docs, "doc_id", "n_tok", "text", budget = 512)
        .select(col("bin"), col("n_docs"), col("total_tokens"),
          array_join(transform(col("doc_ids"), i => i.cast("string")), ",")
            .as("ids"),
          md5(col("packed_text")).as("text_md5"))
        .orderBy("bin")
    }),
    // sequence packing via two-phase distributed prefix sum (the
    // single-partition window this replaces is fatal at scale); the
    // oracle IS that window, proving the distributed layout
    // byte-identical
    // length-bucketed batching (group_by_length): sort by token count
    // through the distributed prefix-sum ordinal, fixed-size batches,
    // per-batch padding accounting
    "lb1_length_batches" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long").as("n_tok"))
      val batched = graft.operators.Packing.lengthBucketedBatches(
        docs, "doc_id", "n_tok", 32)
      graft.operators.Packing.batchPaddingStats(batched, "n_tok")
        .select(col("batch_id"), col("rows").as("n_rows"),
          col("max_len"), col("sum_len"),
          graft.queries.QueryUtil.rhu(col("padding_frac"), 6)
            .as("padding_frac"))
        .orderBy("batch_id")
    }),
    // RLHF preference pairs: per source group, best-vs-worst scored
    // doc via the native idxmax/idxmin aggregate (ties -> smallest
    // id), equal-score groups drop
    // GRPO/RLOO group-advantage preprocessing: rewards normalize
    // against THEIR prompt group (population std for GRPO, the
    // leave-one-out baseline for RLOO); degenerate groups pin to 0.0
    // instead of NaN — the oracle replays both normalizers
    "grpo1_group_advantage" -> ((s, d) => {
      graft.operators.Objectives.groupAdvantages(
        t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("double").as("reward")),
        "source", "reward")
        .select(col("doc_id"), col("source"), col("grpo_adv"),
          col("rloo_adv"))
        .orderBy("doc_id")
    }),
    "pref1_preference_pairs" -> ((s, d) => {
      graft.operators.Sampling.preferencePairs(
        t(s, d, "documents").select(col("source"), col("doc_id"),
          col("n_chars")),
        "source", "doc_id", "n_chars")
    }),
    "pack1_token_packing" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok"))
      Packing.packByBudget(docs, "doc_id", "n_tok", budget = 512)
        .orderBy("doc_id")
    }),
    // pairs -> clusters: alternating large-star/small-star connected
    // components over the LSH->verify near-dup graph; DuckDB replays
    // it as a recursive-CTE reachability closure over the exact
    // all-pairs graph
    "dd9_components" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val cand = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.2,
        maxBucketSize = 100)
      val verified = Dedup.ngramJaccard(docs, "doc_id", "text",
          cand.select("id_a", "id_b"), shingleN = 3)
        .filter(col("jaccard") >= 0.8)
      Dedup.connectedComponents(verified.select("id_a", "id_b"))
        .orderBy("id")
    }),
    // LSH ANN recall PROOF on planted clones: 5 queries cloned from
    // corpus vectors with a deterministic ±0.0015 jitter (cos to the
    // original ≈ 0.99999, corpus max elsewhere ≈ 0.6), so the LSH
    // top-1 must equal the global brute-force argmax — which is what
    // the oracle computes. Non-vacuous by construction (sim2's gap):
    // a broken bucket join returns nothing and fails rows_match.
    "sim4_lsh_planted" -> ((s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      val qs = base.filter(col("vec_id") < 5).select(
        (col("vec_id") + 200000).as("pid"),
        transform(col("v"), (x, i) =>
          x + (((col("vec_id") * 13 + i * 11) % 7).cast("double") - 3.0) * 0.0005)
          .as("v"))
        .select(col("pid").as("vec_id"), col("v"))
      Similarity.lshTopK(qs, base, "vec_id", "v", k = 1,
          planes = 6, tables = 4, roundTo = 5)
        .orderBy("q_id")
    }),
    // engine-portable rolling fingerprint (md5-based) — full oracle,
    // unlike t5's xxhash64 fast path
    "t6_fingerprint_md5" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprintPortable(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    // strided frame sampling on the REAL video decode path: decode
    // every 2nd frame of genuine RIFF/AVI bytes, skip the pixel pass
    // for the rest
    "mm7_video_stride" -> ((s, d) => {
      graft.operators.Multimodal.decodeVideoFrames(
        graft.operators.Multimodal.synthesizeAvi(
          t(s, d, "documents").select("doc_id"), "doc_id"),
        stride = 2)
        .select(col("media_id"), col("frame_no"), col("width"), col("height"),
          round(col("mean_luma"), 6).as("mean_luma"))
        .orderBy("media_id", "frame_no")
    }),
    // Z-order (Morton) layout key — the multi-column file-skipping
    // layout (Delta OPTIMIZE ZORDER discipline): each column
    // equi-width bucketed to [0, 2^8) between its own min/max with
    // exact integral arithmetic, buckets bit-interleaved. The oracle
    // replays the bucket `div` and the unrolled shift/and/or
    // interleave bit-for-bit; LayoutSpec proves the pruning win.
    "zo1_zorder_key" -> ((s, d) => {
      graft.operators.Layout.withZorderKey(
          t(s, d, "events").select("event_id", "user_id"),
          Seq("user_id", "event_id"), bits = 8)
        .select("event_id", "user_id", "zkey")
        .orderBy("zkey", "event_id")
        .limit(100)
    }),
    // partition-pruned data layout: orders written once (per sf dir)
    // as a year-partitioned table; the year predicate then prunes
    // directories at planning time (PartitionFilters — pinned in
    // PlanQualitySpec), the 100 TB layout discipline
    "pp1_partition_prune" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-pp1-$tag").toString
      if (!new java.io.File(s"$tmp/_SUCCESS").exists()) {
        Tables.savePartitioned(
          t(s, d, "orders").withColumn("o_year", year(col("o_orderdate"))),
          tmp, Seq("o_year"))
      }
      Tables.loadPartitioned(s, tmp)
        .filter(col("o_year") === 1996)
        .groupBy(month(col("o_orderdate")).cast("long").as("mth"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("mth")
    }),
    // cell-partitioned GEO layout: points written once under their
    // grid cell, the radius query enumerates candidate cells
    // driver-side and prunes partition directories at planning time
    // (the pp1 discipline for geo), exact haversine verifies. The
    // oracle is a FULL-SCAN radius filter over the raw table —
    // equality proves the covering-cell enumeration loses nothing
    "gc1_geo_cell_radius" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-gc1-$tag").toString
      if (!new java.io.File(s"$tmp/_geo_meta/_SUCCESS").exists()) {
        graft.operators.GeoLayout.writeCellPartitioned(
          t(s, d, "customer").select(col("c_custkey"), struct(
            ((col("c_custkey") % 121) - 60).cast("double").as("lat"),
            (((col("c_custkey") * 7) % 301) - 150).cast("double")
              .as("lon")).as("loc")),
          "loc", tmp, cellDeg = 15.0)
      }
      graft.operators.GeoLayout.readWithinRadius(s, tmp,
          originLat = 10.0, originLon = 20.0, radiusMeters = 2000000.0)
        .select(col("c_custkey"),
          graft.queries.QueryUtil.rhu(graft.functions.Geo
            .haversineMeters(lit(10.0), lit(20.0),
              col("loc.lat"), col("loc.lon")) / 1000.0, 3)
            .as("dist_km"))
        .orderBy("c_custkey")
    }),
    // int8-quantized embedding top-k, FULL oracle: the corpus is
    // stored quantized (4x smaller — the 100 TB embedding layout) and
    // searched WITHOUT dequantization: cosine is scale-invariant, so
    // the codegen cosine kernel runs directly over the int arrays.
    // DuckDB replays the identical quantization (floor-based half-up)
    // and cosine arithmetic.
    "emb2_int8_topk" -> ((s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      val enc = Quantization.encode(base, "vec_id", "v")
      val qs = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"))
      val scored = enc.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos8",
          round(VectorExpressions.cosine(col("q"), col("q_v")), 6))
      // two-phase top-k: no corpus-sized single-partition-per-query sort
      Similarity.rankTopKPerQuery(scored, 3, "q_id", "vec_id", "cos8")
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("cos8"))
        .orderBy("q_id", "rank")
    }),
    // Structured Streaming tumbling-window aggregation, FULL oracle:
    // the stream (file source over a normalized copy of events) must
    // produce exactly what the batch plan computes — stream==batch as
    // a driver gate, not just a spec. Complete output into a memory
    // sink, drained with processAllAvailable.
    "st1_stream_window" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val agg = EventsStream.windowedCounts(
        EventsStream.readEvents(s, eventsStreamFixture(s, d)),
        "1 hour", "30 minutes")
      drainToTable(s, agg, s"graft_st1_$tag", OutputMode.Complete(),
          statePartitions = Some(8))
        .select(col("window_start"), col("event_type"),
          col("cnt").cast("long").as("cnt"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("window_start", "event_type")
    }),
    // streaming exact dedup (dropDuplicatesWithinWatermark) — the
    // continuous-ingest face of exact corpus dedup, gated against the
    // batch DISTINCT oracle
    "st2_stream_dedup" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val dd = EventsStream.dedupedEvents(
        EventsStream.readEvents(s, eventsStreamFixture(s, d))
          .select(col("ts"), col("user_id"), col("event_type")),
        Seq("user_id", "event_type"), "30 minutes")
      drainToTable(s, dd, s"graft_st2_$tag", OutputMode.Append(),
          statePartitions = Some(8))
        .select(col("user_id"), col("event_type"))
        .orderBy("user_id", "event_type")
    }),
    // PII redaction sweep. The synthetic corpus contains no PII, so
    // the gate PLANTS one email + one phone per document (the dd8
    // lesson: a gate whose correct answer is a no-op proves nothing)
    // and the oracle replays the identical RE2-safe patterns
    "t7_redact" -> ((s, d) => {
      val withPii = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      withPii.select(col("doc_id"),
        TextAnalysis.countMatches(col("text"), TextAnalysis.EmailRe).as("n_emails"),
        TextAnalysis.countMatches(col("text"), TextAnalysis.PhoneRe).as("n_phones"),
        TextAnalysis.redactPii(col("text")).as("redacted"))
        .orderBy("doc_id")
    }),
    // context-window truncation, all three strategies unioned: the
    // budget (58) straddles the corpus token counts so both the
    // truncated and the pass-through paths carry rows; kept text,
    // kept count, and the truncated flag all replay
    "trunc1_token_budget" -> ((s, d) => {
      val d40 = t(s, d, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text"))
      Seq("head", "tail", "middle_out").map(st =>
          graft.operators.Chunking.truncateTokens(
            d40, "doc_id", "text", maxTokens = 58, strategy = st)
          .withColumn("strategy", lit(st)))
        .reduce(_ unionByName _)
        .orderBy("strategy", "doc_id")
    }),
    // BERT MLM masking (80/10/10 over md5-drawn positions, in-doc
    // random replacement): corrupted stream, the "pos:original" label
    // list, and the selected count all hash-checked against the
    // per-position SQL replay. Gate outputs must be scalar-only (the
    // driver's checker sorts every column), so the label list exports
    // space-joined — the "pos:original" entries are whitespace-free by
    // construction, so the join is lossless
    "mlm1_masking" -> ((s, d) => {
      graft.operators.Objectives.mlmMask(
          t(s, d, "documents").filter(col("doc_id") < 50)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", maskRate = 0.15, seed = 7)
        .withColumn("labels", concat_ws(" ", col("labels")))
        .orderBy("doc_id")
    }),
    // T5 span corruption (deterministic block recipe): numbered
    // sentinels replace each window's hash-drawn masked span in the
    // inputs, the targets list sentinel+hidden tokens plus the
    // terminator — inputs, targets, AND the masked-token count all
    // hash-checked against a per-window SQL replay
    "span1_corruption" -> ((s, d) => {
      graft.operators.Objectives.spanCorrupt(
          t(s, d, "documents").filter(col("doc_id") < 50)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", blockSize = 16, maxSpan = 4, seed = 7)
        .orderBy("doc_id")
    }),
    // SFT loss-mask rendering with a GLUING separator (no leading
    // space — the marker merges into the prompt's last token): the
    // mask boundary must come from tokenizing the rendered prefix,
    // and the oracle's closed form (mask 5, n len+1) holds only if
    // the glue-aware counting is exact
    "sft1_loss_mask" -> ((s, d) => {
      val toks = graft.functions.TextAnalysis.tokens(col("text"))
      val base = t(s, d, "documents")
        .filter(size(toks) >= 6)
        .select(col("doc_id"),
          concat_ws(" ", slice(toks, 1, 4)).as("prompt"),
          concat_ws(" ", slice(toks, 5, 100000)).as("response"))
      graft.operators.Objectives.sftLossMask(base, "doc_id",
          "prompt", "response", preamble = "<|user|> ",
          separator = "<|assistant|>: ")
        .orderBy("doc_id")
    }),
    // multi-turn SFT masks: two-turn conversations synthesized from
    // the corpus (user = first 3 tokens, assistant = the rest); every
    // turn's [from, to) token span must land on the additive
    // closed form — a seam-glue or an off-by-one in any piece shifts
    // every later boundary and misses the hash
    "sft2_multi_turn_masks" -> ((s, d) => {
      val toks = graft.functions.TextAnalysis.tokens(col("text"))
      val base = t(s, d, "documents")
        .filter(size(toks) >= 4)
        .select(col("doc_id"), array(
          struct(lit("user").as("role"),
            concat_ws(" ", slice(toks, 1, 3)).as("content")),
          struct(lit("assistant").as("role"),
            concat_ws(" ", slice(toks, 4, 100000)).as("content")))
          .as("turns"))
      graft.operators.Objectives.sftMultiTurnMasks(base, "doc_id",
          "turns")
        .orderBy("doc_id", "turn")
    }),
    // fill-in-the-middle objective transform (Bavarian et al. 2022):
    // seeded md5 draws pick the documents and BOTH character cuts, so
    // the PSM rewrite replays byte-for-byte — fim_applied and the
    // transformed text both hash-checked
    "fim1_transform" -> ((s, d) => {
      graft.operators.Objectives.fimTransform(
          t(s, d, "documents").filter(col("doc_id") < 60)
            .select(col("doc_id"), col("text")),
          "doc_id", "text", fimRate = 0.5, seed = 7)
        .orderBy("doc_id")
    }),
    // corpus snapshot diff (dataset versioning): the new cut drops
    // every 7th doc, rewrites every 10th (non-dropped), adds shifted
    // clones of every 13th — one digest-only full outer join verdicts
    // all four states; a NULL-text pair must read unchanged (presence
    // flags, not digest nullness). Oracle = the same join in SQL
    "vd1_snapshot_diff" -> ((s, d) => {
      val old = t(s, d, "documents").select(col("doc_id"), col("text"))
      val newer = old.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(old.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.operators.Snapshot.diff(old, newer, "doc_id", "text")
        .orderBy("doc_id")
    }),
    // EXTENDED PII sweep: IPv4 candidates and LUHN-GATED card
    // candidates on top of the email/phone chain — the planted
    // fixture carries one VALID card (must redact), one single-digit-
    // off INVALID card and a non-card 16-digit run (both must
    // survive), an IP and an email; the oracle replays the regexes,
    // the Luhn arithmetic, and the validated-match replace fold
    "t16_redact_extended" -> ((s, d) => {
      val withPii = t(s, d, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), concat(col("text"), element_at(array(
          lit(" card 4111-1111-1111-1111 now"),
          lit(" card 4111 1111 1111 1112 now"),
          lit(" from 10.0.0.1 by ops@example.com"),
          lit(" plain 1234567890123456")),
          (col("doc_id") % 4 + 1).cast("int"))).as("text"))
      withPii.select(col("doc_id"),
        TextAnalysis.redactPiiExtended(col("text")).as("redacted"))
        .orderBy("doc_id")
    }),
    // repetition/boilerplate quality signals (the Gopher-rule family):
    // duplicate-token ratio and top-token share per document. Explode →
    // two-level aggregation — ONE shuffle on (doc_id, token) with
    // map-side partial aggregation, the shape that survives 100 TB
    // (a per-row HOF counting pass would be O(n·distinct) interpreted
    // work per document instead)
    "t8_repetition" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .groupBy("doc_id")
        .agg(sum("cnt").cast("long").as("n_tokens"),
          count(lit(1)).cast("long").as("n_distinct"),
          max("cnt").cast("long").as("top_cnt"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          (lit(1.0) - col("n_distinct") / col("n_tokens")).as("dup_token_ratio"),
          (col("top_cnt") / col("n_tokens")).as("top_token_ratio"))
        .orderBy("doc_id")
    }),
    // the full Gopher repetition-signal family (13 per-doc signals,
    // zero-shuffle sorted-adjacency sweep). Non-vacuous by planting,
    // per doc_id % 40 = 0: +40000 duplicated LINES, +50000 duplicated
    // PARAGRAPHS, +60000 a doubled token stream (every n-gram
    // duplicated); base docs exercise the single-occurrence top-gram
    // path
    "t13_repetition_signals" -> ((s, d) => {
      Repetition.signals(repetitionCorpus(t(s, d, "documents")),
          "doc_id", "text")
        .orderBy("doc_id")
    }),
    // the filter face: survivors under the published Gopher
    // thresholds — planted docs die by construction, most base docs
    // survive (small-vocab synthetic text trips a threshold now and
    // then, which keeps BOTH branches populated)
    "qf2_gopher_filter" -> ((s, d) => {
      Repetition.gopherFilter(
          repetitionCorpus(t(s, d, "documents")), "text")
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // CCNet perplexity buckets: per-source head/middle/tail thirds of
    // the self-trained bigram fluency ranking, rank-cut with integer
    // arithmetic (rn*3 <= n) on the 6-dp-rounded score ppl1 already
    // proves cross-engine — the distributed prefix-sum rank, not the
    // one-partition-per-language window
    "qf3_perplexity_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.LanguageModel.perplexityBuckets(docs, docs,
          "doc_id", "text", "source")
        .orderBy("doc_id")
    }),
    // the quality half of the Gopher rules (word-count/word-length
    // bounds, symbol ratio, bullet/ellipsis lines, alpha share,
    // required stopwords). Planted per doc_id % 20 = 0: a variant
    // suffixed with all 8 required stopwords — the synthetic vocab
    // only contains "the", so base docs fail the >= 2-stopword rule
    // and planted docs pass everything their length allows
    "t14_gopher_quality_signals" -> ((s, d) => {
      graft.operators.QualityRules.signals(
          qualityCorpus(t(s, d, "documents")), "doc_id", "text")
        .orderBy("doc_id")
    }),
    "qf4_gopher_quality_filter" -> ((s, d) => {
      graft.operators.QualityRules.gopherFilter(
          qualityCorpus(t(s, d, "documents")), "text")
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // the end-to-end curation chain as ONE call (lazy up to the
    // perplexity stage, whose prefix-sum rank runs eager count jobs
    // by design — see ordinalByKey): Gopher quality
    // rules (stopword bound loosened to 1 — the synthetic vocab only
    // carries "the") -> Gopher repetition rules -> exact dedup
    // keep-first -> self-trained perplexity buckets per source, tail
    // third dropped. Every stage's semantics are oracle-proven alone
    // (qf4/qf2/dd6/qf3); this gate proves the COMPOSITION replays —
    // each filter feeds the next, the LM trains on the deduped
    // survivors only
    "pipe3_curation_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source", "text")
      val q = graft.operators.QualityRules.gopherFilter(docs, "text",
        minStopHits = 1L)
      // STAGE the reused frames (guide §5: cache when reused and
      // recomputation is expensive): exactKeepFirst consumes its input
      // twice (keep-agg + semi-join back) and perplexityBuckets(dd, dd)
      // consumes dd several times (model counts, the scoring pass, the
      // group join) — unstaged, the quality + repetition-kernel chain
      // re-ran up to 8x inside this one query (r17-opt: 9.4 -> ~4 s
      // warm at sf0.1). r18 (the r17 ADVICE ask): the persists are
      // RELEASED by the listener when the query's terminal action
      // completes — repeated facade calls in a long-lived session no
      // longer accumulate cached frames until LRU eviction.
      val r = graft.operators.Repetition.gopherFilter(q, "text").persist()
      val dd = Dedup.exactKeepFirst(r, "doc_id", "text").persist()
      Dedup.releaseAfter(
        graft.operators.LanguageModel.perplexityBuckets(dd, dd,
            "doc_id", "text", "source")
          .filter(col("bucket") =!= "tail")
          .select("doc_id", "source", "bucket")
          .orderBy("doc_id"),
        Seq(r, dd))
    }),
    // the per-source data-card report: volume + what each rule family
    // would remove + exact-dup mass, all INTEGER counts (float means
    // would hash-differ on addition order). Plants per source: quality
    // passers (+70000 stopword suffix), repetition failers (+60000
    // doubled tokens), exact dups (+120000 verbatim copies)
    "rep1_corpus_report" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "source", "text")
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 70000).as("doc_id"), col("source"),
            concat(col("text"),
              lit(" the be to of and that have with")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 60000).as("doc_id"), col("source"),
            concat(col("text"), lit(" "), col("text")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 120000).as("doc_id"), col("source"),
            col("text")))
      graft.operators.CorpusReport.bySource(corpus, "text", "source",
          minStopHits = 1L)
        .orderBy("source")
    }),
    // Zipf fit over the top-100 vocabulary: OLS of ln(freq) on
    // ln(rank) under the (freq desc, term asc) total order — the
    // data-card naturalness signal; the oracle replays term counts,
    // the rank cut and the closed-form moments
    "zipf1_zipf_fit" -> ((s, d) => {
      graft.operators.CorpusReport.zipfFit(
        t(s, d, "documents"), "text", k = 100)
    }),
    // leakage-safe group split: all docs of a source land in ONE split
    // (the near-dup-leakage guard); md5 group draw, full oracle
    "sm4_group_split" -> ((s, d) => {
      Sampling.groupSplit(t(s, d, "documents"),
          "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          seed = 13)
        .select("doc_id", "source", "split")
        .orderBy("doc_id")
    }),
    // frame→table ingest (eland pandas_to_eland): replace then append
    // with the schema-compat check on the append path, re-read and
    // oracle against the source
    "io3_ingest" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-io3-$tag").toString
      val src = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      graft.sources.Ingest.saveTable(
        src.where(col("c_custkey") % 2 === 0), path, "replace")
      graft.sources.Ingest.saveTable(
        src.where(col("c_custkey") % 2 === 1), path, "append")
      s.read.parquet(path).orderBy("c_custkey")
    }),
    // as-of (point-in-time) join: every purchase picks up the user's
    // latest prior click — union + running window, ONE shuffle on the
    // key, no range cross product. The right side is pre-aggregated to
    // one row per (user_id, ts) so the tie case is deterministic in
    // both engines; DuckDB replays it with a native ASOF LEFT JOIN.
    "asof1_pointintime" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        .withColumnRenamed("ts", "click_ts")
      AsofJoin.backward(purchases, clicks, "user_id", "ts", "click_ts")
        .select("event_id", "user_id", "ts", "value", "click_ts",
          "click_value")
        .orderBy("event_id")
    }),
    // ES EQL sequence (the security-analytics face): signup ->
    // purchase -> error per user within a 2h maxspan, anchored-greedy
    // chains (every step takes the EARLIEST strictly-later event in
    // (ts, id) order — the replayable semantics whose anchor match
    // set equals ES's state machine, see Eql.scala); k-1 union+window
    // passes, never an interval cross product. The oracle replays the
    // greedy chain with row_number-over-join steps
    "eql1_sequence" -> ((s, d) => {
      graft.operators.Eql.sequence(t(s, d, "events"), "user_id",
        "ts", "event_id",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase",
          col("event_type") === "error"),
        maxspanMs = 2L * 3600 * 1000)
        .select(col("user_id"), col("id_1"), col("id_2"), col("id_3"))
        .orderBy("user_id", "id_1")
    }),
    // EQL `until`: a view event strictly between the signup and the
    // purchase expires the pending sequence (ES's state discard);
    // the oracle replays the greedy chain plus a NOT EXISTS between
    // the transition's composite (ts, id) bounds
    "eql2_sequence_until" -> ((s, d) => {
      graft.operators.Eql.sequence(t(s, d, "events"), "user_id",
        "ts", "event_id",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase"),
        maxspanMs = 2L * 3600 * 1000,
        until = Some(col("event_type") === "view"))
        .select(col("user_id"), col("id_1"), col("id_2"))
        .orderBy("user_id", "id_1")
    }),
    // point-in-interval range join, bucketed to an equi-join: events
    // landing inside each error's 10-minute aftermath window. A raw
    // BETWEEN join would plan as a nested-loop product; the bucket
    // expansion makes it a plain shuffled hash join (pinned cartesian-
    // free in PlanQualitySpec). Non-vacuous: every window contains at
    // least its own error event.
    "rj1_range_window" -> ((s, d) => {
      val ev = t(s, d, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      val pts = ev.select(col("event_id"), col("ts"))
      RangeJoin.pointInInterval(pts, "ts", errors, "w_start", "w_end",
          bucketSeconds = 600)
        .groupBy("err_id")
        .agg(count(lit(1)).cast("long").as("n_in_window"))
        .orderBy("err_id")
    }),
    // benchmark decontamination: corpus docs sharing any 3-gram with
    // the "benchmark" subset (doc_id % 50 = 0 — benchmarks drawn from
    // the corpus guarantee overlap, so the gate is non-vacuous). The
    // benchmark gram set broadcasts; the corpus is filtered map-side
    // and never shuffled to find matches.
    "dc1_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Decontam.contaminationReport(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy("doc_id")
    }),
    // same report through the 100 TB membership plumbing: benchmark
    // grams broadcast as a BLOOM FILTER (bits, not strings) and the
    // corpus prefiltered by a codegen mightContain before the exact
    // confirm join. Output is EXACT — the oracle is dc1's SQL verbatim,
    // which is the point: approximation lives only in the prefilter,
    // never in the answer
    "dc3_bloom_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Decontam.bloomContaminationReport(docs, "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "text", n = 3)
        .orderBy("doc_id")
    }),
    // semantic decontamination on PLANTED paraphrases (sd1's jitter
    // discipline): bench = vec_id % 25 = 0, corpus = the rest plus 20
    // jittered copies of bench vectors (cos ≈ 0.999996); the corpus's
    // own cross-bench cosines stay ~0.6, so the 0.92-threshold answer
    // is exactly the planted set with exact argmax bench ids
    "dc4_semantic_decontam" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      val bench = emb.filter(col("vec_id") % 25 === 0)
      val planted = bench
        .select((col("vec_id") + 300000).as("pid"),
          transform(col("v"), (x, i) =>
            x + (((col("vec_id") * 37 + i * 11) % 7).cast("double") - 3.0)
              * 0.0005).as("v"))
        .select(col("pid").as("vec_id"), col("v"))
      val corpus = emb.filter(col("vec_id") % 25 =!= 0)
        .unionByName(planted)
      Decontam.semanticContamination(corpus, "vec_id", "v",
          bench, "vec_id", "v", minCosine = 0.92)
        .orderBy("vec_id")
    }),
    // keep-BEST dedup: within each duplicate group (key = first-5-
    // token prefix) the highest-score row survives (score = text
    // length), ties to the smallest id. Planted longer variants force
    // the score branch; the corpus's exact-dup texts (equal lengths)
    // force the id tie-break
    "dd19_keep_best_by_key" -> ((s, d) => {
      val docs = t(s, d, "documents").select("doc_id", "text")
      // variants of doc_id < 40: same dedup KEY (first 5 tokens),
      // different lengths — keep-best must pick the longest, and on
      // exact ties the smallest id
      val variants = docs.filter(col("doc_id") < 40)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" extra tail words")).as("text"))
      val corpus = docs.unionByName(variants)
      Dedup.keepBestByKey(corpus, "doc_id",
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 5)),
          length(col("text")))
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // span-level decontamination — the 13-gram-overlap recipe of the
    // GPT-3/PaLM decontam reports: merged contaminated token spans per
    // doc, not just a shared-gram count. Non-vacuous two ways: the
    // benchmark docs (doc_id % 50 = 0) live in the corpus (whole-doc
    // spans), and 10 planted docs QUOTE a 15-token benchmark passage
    // between sentinels (partial spans with window merging — 3
    // overlapping 13-gram hits collapse to one 15-token span)
    "dc2_span_decontam" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val toks = docs.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("_toks"))
      val quoters = toks
        .filter(col("doc_id") % 50 === 0 && size(col("_toks")) >= 18)
        .select((col("doc_id") + 30000).as("doc_id"),
          concat_ws(" ", lit("pfq"), lit("qfq"),
            array_join(slice(col("_toks"), 4, 15), " "), lit("zfq")).as("text"))
      val corpus = docs.select("doc_id", "text").unionByName(quoters)
      Decontam.spanContamination(corpus, "doc_id", "text",
          docs.filter(col("doc_id") % 50 === 0), "text", minTokens = 13)
        .orderBy("doc_id")
    }),
    // stream-stream interval join: purchases joined to the clicks of
    // the same user within the preceding 10 minutes, as two watermarked
    // streams (state bounded by watermark+lookback); the oracle is the
    // batch interval join. Non-vacuous: the corpus interleaves clicks
    // and purchases per user.
    "st3_stream_join" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val src = eventsStreamFixture(s, d)
      val p = EventsStream.readEvents(s, src)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val c = EventsStream.readEvents(s, src)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      val j = EventsStream.intervalJoin(p, "p_ts", "p_user",
          c, "c_ts", "c_user", lookbackSeconds = 600)
        .select(col("p_id"), col("c_id"))
      drainToTable(s, j, s"graft_st3_$tag", OutputMode.Append(),
          statePartitions = Some(8))
        .orderBy("p_id", "c_id")
    }),
    // streaming incremental exact dedup — foreachBatch composed with
    // the persistent digest registry (dd11's operator) over a 4-batch
    // docs stream: the end-to-end continuous-ingest dedup story. The
    // registry/output/checkpoint dirs are FRESH per invocation (a
    // registry is stateful by design; reruns must start empty). The
    // oracle replays cross-batch precedence literally: the survivor of
    // each digest is the min doc_id of the EARLIEST-ARRIVING batch
    // containing it — (doc_id % 4, doc_id) lexicographic order — which
    // differs from whole-corpus keep-first whenever a dup's smaller id
    // sits in a later batch, so the gate proves arrival-order registry
    // semantics, not just global dedup.
    // the curation sweep running UNCHANGED on a stream: per micro-
    // batch decontam vs a static benchmark (batch-local is exact —
    // per-document decision) + both Gopher rule predicates, no state
    // store. The oracle is the pure batch replay over all four
    // batches' rows — stateless rules cannot depend on arrival order
    // streaming ingest: the ig-family pipeline applied per
    // micro-batch (stateless narrow transforms — union of batches ≡
    // the batch pipeline over the whole fixture, which IS the oracle)
    "st15_stream_ingest" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st15-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val pipe = graft.operators.IngestPipeline(
        """{"processors": [
          |  {"set": {"field": "engine", "value": "graft"}},
          |  {"convert": {"field": "doc_id", "type": "string",
          |    "target_field": "key_str"}},
          |  {"gsub": {"field": "text", "pattern": "stream",
          |    "replacement": "flow", "target_field": "t2"}}
          |]}""".stripMargin)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.ingestPipeline(stream,
          pipe, s"$work/out", s"$work/ckp")
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$work/out")
        .select(col("doc_id"), col("key_str"), col("engine"),
          col("t2"))
        .orderBy("doc_id")
    }),
    "st13_stream_curation" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st13-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val bench = t(s, d, "documents")
        .filter(col("doc_id") % 50 === 0).select("text")
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.curationFilter(stream,
          "doc_id", "text", bench, "text", shingleN = 3, minHits = 2,
          s"$work/out", s"$work/ckp", minStopHits = 1L)
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$work/out").select("doc_id").orderBy("doc_id")
    }),
    // streaming percolate: the pc1 rule table applied per micro-batch
    // (stateless routing — union of all batches' matches ≡ the batch
    // percolate of the whole fixture corpus, which IS the oracle)
    "st14_stream_percolate" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st14-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.streamingPercolate(stream,
          "doc_id", "text", Seq(
            ("stream_filter", Seq("stream", "filter"), 2),
            ("any_join", Seq("join", "merge"), 1),
            ("heavy_sort", Seq("window", "sort", "order"), 3)),
          s"$work/out", s"$work/ckp")
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$work/out")
        .orderBy("doc_id", "query_id")
    }),
    "st4_stream_incdedup" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st4-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalDedup(stream,
          "doc_id", "text", s"$work/registry", s"$work/out", s"$work/ckp")
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$work/out")
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .orderBy("doc_id")
    }),
    // streaming incremental NEAR-dup — dd12's streaming face: the same
    // 4-batch pinned-order stream probed through the persistent LSH
    // registry; each batch's verified matches append to the output,
    // its clean rows register and become later batches' targets. The
    // oracle replays the sequential clean-set construction batch by
    // batch (a doc that matched never registers, so it can never be a
    // later match's reg_id).
    "st5_stream_neardup" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st5-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalNearDup(stream,
          "doc_id", "text", s"$work/registry", s"$work/out", s"$work/ckp",
          threshold = 0.8)
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(s"$work/out")
        .select(col("doc_id"), col("reg_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_id", "reg_id")
    }),
    // streaming index ingest — idx2's streaming face: the 4-batch
    // pinned-order stream lands one immutable segment per micro-batch
    // (segment named by batch id, so checkpoint replays rewrite
    // rather than double-register); the search result must equal
    // DuckDB's flat BM25 replay over the whole fixture corpus
    "st6_stream_index" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st6-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalIndex(stream,
          "doc_id", "text", s"$work/index", s"$work/ckp")
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.operators.InvertedIndex.searchTopK(s, s"$work/index",
          Seq("stream", "filter"), k = 12, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // CDC-style streaming index upsert: batch k carries its own
    // documents PLUS updates that rewrite the previous batch's docs
    // (updater doc_id → target doc_id - 1, new text with a marker
    // token), with in-stream compaction consuming tombstones mid-run;
    // the search must equal DuckDB's BM25 replay over the
    // last-arrival-wins corpus — a tombstone leaking onto a re-sent
    // doc's new segment, stale stats, or a lost update all miss
    "st9_stream_upsert_index" -> ((s, d) => {
      val work = java.nio.file.Files
        .createTempDirectory("graft-st9-run").toString
      val src = new java.io.File(work, "src"); src.mkdirs()
      val base = t(s, d, "documents").select("doc_id", "text")
      // 3 batches, compactEvery = 2 — the minimal fixture that still
      // exercises every lifecycle property: cross-batch update (k >= 1
      // rewrites id-1), MID-stream compaction (fires after batch 2
      // with batch 3 still to come), an update landing on a doc whose
      // last version sits in an already-COMPACTED segment (batch 3
      // rewrites batch-2 docs), and a final read that must merge a
      // compacted segment with a live uncompacted one (no end-of-
      // stream compaction fires at 3 % 2 != 0). A 4th batch (r11's
      // shape) re-proved the same properties one more time for ~1/3
      // more micro-batch commit cost. st10/st12 genuinely need their
      // 4th batch — the two CDC delete windows (tombstone consumed BY
      // compaction vs tombstone created AFTER it) live in different
      // batches by construction.
      for (k <- 0 until 3) {
        val orig = base.filter(col("doc_id") % 3 === k)
        val rows =
          if (k == 0) orig
          else orig.unionByName(base.filter(col("doc_id") % 3 === k)
            .select((col("doc_id") - 1).as("doc_id"),
              concat(col("text"), lit(" updatedmark")).as("text")))
        val stage = new java.io.File(src, s"_stage$k")
        rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch-$k.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(1700000000000L + k * 60000L)
        stage.listFiles().foreach(_.delete()); stage.delete()
      }
      val schema = s.read.parquet(s"$src/batch-0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalUpsertIndex(
          stream, "doc_id", "text", s"$work/index", s"$work/ckp",
          compactEvery = Some(2))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.operators.InvertedIndex.searchTopK(s, s"$work/index",
          Seq("stream", "filter", "join"), k = 12, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // FULL CDC streaming: batch k carries upserts (its own docs plus
    // updates rewriting the previous class's docs, st9's shape) AND
    // op-typed DELETE events — batch 2 deletes a slice of batch 0's
    // docs, batch 3 a slice of batch 1's (each slice updated in
    // between, so the tombstone must kill the UPDATED version in its
    // re-ingest segment, not just the original). Search must equal
    // DuckDB's BM25 replay over the last-wins-minus-deleted corpus —
    // a leaked tombstone, a surviving deleted doc, or stats still
    // counting the dead docs' lengths all miss
    "st10_stream_cdc_index" -> ((s, d) => {
      val work = java.nio.file.Files
        .createTempDirectory("graft-st10-run").toString
      val src = new java.io.File(work, "src"); src.mkdirs()
      val base = t(s, d, "documents").select("doc_id", "text")
      for (k <- 0 until 4) {
        val own = base.filter(col("doc_id") % 4 === k)
          .withColumn("op", lit("upsert"))
        val upd =
          if (k == 0) own.limit(0)
          else base.filter(col("doc_id") % 4 === k)
            .select((col("doc_id") - 1).as("doc_id"),
              concat(col("text"), lit(" updatedmark")).as("text"))
            .withColumn("op", lit("upsert"))
        val del = k match {
          case 2 => base.filter(col("doc_id") % 16 === 4)
            .select(col("doc_id"), lit("").as("text"),
              lit("delete").as("op"))
          case 3 => base.filter(col("doc_id") % 16 === 9)
            .select(col("doc_id"), lit("").as("text"),
              lit("delete").as("op"))
          case _ => own.limit(0)
        }
        val rows = own.unionByName(upd).unionByName(del)
        val stage = new java.io.File(src, s"_stage$k")
        rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch-$k.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(1700000000000L + k * 60000L)
        stage.listFiles().foreach(_.delete()); stage.delete()
      }
      val schema = s.read.parquet(s"$src/batch-0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalCdcIndex(
          stream, "doc_id", "text", "op", s"$work/index", s"$work/ckp",
          compactEvery = Some(2))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.operators.InvertedIndex.searchTopK(s, s"$work/index",
          Seq("stream", "filter", "join"), k = 12, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // batched index search — the query-SERVING face: a whole queries
    // TABLE (q_id, terms) answered in ONE plan (each touched bucket
    // directory read once, df/idf computed once per term, two-phase
    // per-query top-k), per-query row-identical to searchTopK. The
    // oracle replays every query's BM25 from the flat table and ranks
    // with the same tie-break
    "idx6_batch_search" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx6-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      val queries = Seq(
        (1L, Seq("stream", "filter", "join")),
        (2L, Seq("spark", "hash")),
        (3L, Seq("vector", "spark", "filter"))).toDF("q_id", "terms")
      graft.operators.InvertedIndex.searchTopKBatch(queries, path,
          k = 10, idColName = "doc_id")
        .orderBy("q_id", "rank")
    }),
    // positional phrase search served from the index (the Lucene
    // phrase-query role): postings carry per-occurrence token
    // offsets, the two terms' buckets are the only directories read,
    // and adjacency tests over the position arrays — the oracle is
    // the scan phrase-match replay (g10's spelling), so a lost or
    // mis-offset position list cannot match
    "idx7_phrase_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx7-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path, positions = true)
      graft.operators.InvertedIndex.phraseSearch(s, path,
          Seq("the", "fast"), idColName = "doc_id")
        .orderBy("doc_id")
    }),
    // SCORED phrase search (Lucene PhraseQuery under BM25): the
    // phrase is one synthetic term — tf = exact-adjacency occurrence
    // count from the position arrays, idf = Σ of the constituent
    // terms' idfs, Okapi saturation; the oracle recounts every doc's
    // adjacent pairs and replays the full formula
    // index-served SLOPPY phrase (match_phrase with slop): Lucene's
    // exact match SET — max(pᵢ−i) − min(pᵢ−i) ≤ slop over an
    // assignment of slots to positions, which admits TRANSPOSED terms
    // at slop ≥ 2 (the two-moves rule) — with the anchored-count
    // adjudication on tf only: occurrences = first-term positions in
    // ≥1 valid assignment, weight 1 each (Lucene's 1/(1+matchLength)
    // weights ride a retrying matcher no engine replays); slop 0 ≡ idx8
    "idx19_sloppy_phrase" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx19-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path, positions = true)
      graft.operators.InvertedIndex.phraseSearchTopK(s, path,
          Seq("stream", "filter"), k = 12, idColName = "doc_id",
          slop = 2)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "idx8_phrase_score" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx8-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path, positions = true)
      graft.operators.InvertedIndex.phraseSearchTopK(s, path,
          Seq("the", "fast"), k = 15, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // st4's dedup answer through the EXACTLY-ONCE delivery path: each
    // batch's survivors land in their own committed output dir BEFORE
    // their digests register (deliver-then-register — no crash window
    // loses or doubles a delivered row), with in-stream registry
    // compaction on a cadence; the committed view must replay to the
    // identical cross-batch-precedence answer as st4
    "st7_stream_exactly_once" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st7-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalDedupExactlyOnce(
          stream, "doc_id", "text", s"$work/registry", s"$work/out",
          s"$work/ckp", compactEvery = Some(2))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.streaming.CorpusStream.deliveredOutput(s, s"$work/out")
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .orderBy("doc_id")
    }),
    // st5's near-dup answer through the exactly-once match delivery:
    // verified matches land in committed per-batch dirs BEFORE the
    // clean rows register, and the committed view must equal the
    // plain stream's sequential clean-set replay
    "st8_stream_neardup_eo" -> ((s, d) => {
      val src = docsStreamFixture(s, d)
      val work = java.nio.file.Files
        .createTempDirectory("graft-st8-run").toString
      val schema = s.read.parquet(src).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalNearDupExactlyOnce(
          stream, "doc_id", "text", s"$work/registry", s"$work/out",
          s"$work/ckp", threshold = 0.8)
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      graft.streaming.CorpusStream.deliveredOutput(s, s"$work/out")
        .select(col("doc_id"), col("reg_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_id", "reg_id")
    }),
    // streaming vector-index upsert: batch k carries its own vectors
    // PLUS updates rewriting id-1 with the SENDER's affine-jittered
    // vector (the st9 successor shape), with in-stream compaction
    // consuming tombstones mid-run; the final every-cell search must
    // equal DuckDB's brute-force replay over the last-arrival-wins
    // corpus — a tombstone leaking onto a re-sent id's new segment, a
    // lost update, or a dead vector surviving the compaction all miss
    "st11_stream_vector_index" -> ((s, d) => {
      val work = java.nio.file.Files
        .createTempDirectory("graft-st11-run").toString
      val src = new java.io.File(work, "src"); src.mkdirs()
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      // 3-batch fixture — st9's trim rationale applies verbatim (see
      // the comment there); st12 keeps 4 batches for the delete windows
      for (k <- 0 until 3) {
        val own = base.filter(col("vec_id") % 3 === k)
        val upd =
          if (k == 0) own.limit(0)
          else base.filter(col("vec_id") % 3 === k)
            .select((col("vec_id") - 1).as("vec_id"),
              transform(col("embedding"), x => x * 0.5 + 0.1)
                .as("embedding"))
        val rows = own.unionByName(upd)
        val stage = new java.io.File(src, s"_stage$k")
        rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch-$k.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(1700000000000L + k * 60000L)
        stage.listFiles().foreach(_.delete()); stage.delete()
      }
      val schema = s.read.parquet(s"$src/batch-0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalUpsertVectorIndex(
          stream, "vec_id", "embedding", s"$work/index", s"$work/ckp",
          nlist = 4, compactEvery = Some(2))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      val qs = base.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopK(qs, s"$work/index", k = 5,
          nprobe = 4, idColName = "n_id")
        .orderBy("q_id", "rank")
    }),
    // FULL CDC streaming for the vector index (st10's shape over
    // vectors): batch k carries its own class's vectors, updates
    // rewriting id-1 with the sender's affine-jittered vector, AND
    // op-typed DELETE events — batch 2 deletes a slice of class-0
    // (updated in batch 1, so the tombstone must kill the UPDATED
    // version in its re-ingest segment), batch 3 a slice of class-1
    // (updated in batch 2). Search must equal DuckDB's brute-force
    // replay over the last-wins-minus-deleted corpus
    "st12_stream_cdc_vector" -> ((s, d) => {
      val work = java.nio.file.Files
        .createTempDirectory("graft-st12-run").toString
      val src = new java.io.File(work, "src"); src.mkdirs()
      val base = t(s, d, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      for (k <- 0 until 4) {
        val own = base.filter(col("vec_id") % 4 === k)
          .withColumn("op", lit("upsert"))
        val upd =
          if (k == 0) own.limit(0)
          else base.filter(col("vec_id") % 4 === k)
            .select((col("vec_id") - 1).as("vec_id"),
              transform(col("embedding"), x => x * 0.5 + 0.1)
                .as("embedding"))
            .withColumn("op", lit("upsert"))
        val del = k match {
          case 2 => base.filter(col("vec_id") % 16 === 4)
            .withColumn("op", lit("delete"))
          case 3 => base.filter(col("vec_id") % 16 === 9)
            .withColumn("op", lit("delete"))
          case _ => own.limit(0)
        }
        val rows = own.unionByName(upd).unionByName(del)
        val stage = new java.io.File(src, s"_stage$k")
        rows.coalesce(1).write.mode("overwrite").parquet(stage.toString)
        val part = stage.listFiles().find(f =>
          f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        val dst = new java.io.File(src, s"batch-$k.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        dst.setLastModified(1700000000000L + k * 60000L)
        stage.listFiles().foreach(_.delete()); stage.delete()
      }
      val schema = s.read.parquet(s"$src/batch-0.parquet").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src.toString)
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = graft.streaming.CorpusStream.incrementalCdcVectorIndex(
          stream, "vec_id", "embedding", "op", s"$work/index",
          s"$work/ckp", nlist = 4, compactEvery = Some(2))
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      val qs = base.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopK(qs, s"$work/index", k = 5,
          nprobe = 4, idColName = "n_id")
        .orderBy("q_id", "rank")
    }),
    // engine-portable SimHash (md5 token hash) — the full-oracle face
    // of dd3's xxhash64 sketch: DuckDB replays every per-bit ±1 sum
    "dd10_simhash_md5" -> ((s, d) => {
      t(s, d, "documents")
        .filter(size(TextAnalysis.tokens(col("text"))) > 0)
        .select(col("doc_id"),
          TextAnalysis.simhashPortable(col("text")).as("simhash"))
        .orderBy("doc_id")
    }),
    // distribution-drift monitor: per-token KL(A||B) contributions
    // between the whole corpus and its src0 slice — add-0.5 smoothing
    // over the union vocab, top movers by contribution. Every number
    // replays exactly (long counts, dyadic smoothing, ln 6-dp rounded)
    "kl1_corpus_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.LanguageModel.unigramKlContributions(
          docs, docs.filter(col("source") === "src0"), "text")
        .select(col("token"), col("n_a"), col("n_b"),
          round(col("kl_term"), 6).as("kl_term"))
        .orderBy(round(col("kl_term"), 6).desc, col("token"))
        .limit(20)
    }),
    // bigram-LM fluency scoring (the CCNet perplexity-filter recipe
    // as a declarative bigram model, self-trained on the corpus);
    // DuckDB replays the smoothed probabilities exactly
    "ppl1_bigram_lm" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.LanguageModel.bigramScore(docs, docs, "doc_id", "text")
        .orderBy("doc_id")
    }),
    // trigram stupid backoff (Brants et al. 2007 — the web-scale LM
    // recipe): relative frequencies with a fixed α penalty per backoff
    // level, add-k floor at the unigram; DuckDB replays every branch
    // of the backoff CASE exactly
    "ppl2_trigram_backoff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.LanguageModel.trigramBackoffScore(docs, docs,
          "doc_id", "text")
        .orderBy("doc_id")
    }),
    // BM25 ranked retrieval (the reference engine's Okapi scoring as a
    // declarative aggregation): top-10 docs for a 3-term query; DuckDB
    // replays idf/tf/length normalization exactly
    "bm1_bm25_topk" -> ((s, d) => {
      graft.operators.Ranking.bm25TopK(t(s, d, "documents"),
          "doc_id", "text", Seq("spark", "vector", "hash"), k = 10)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // ES combined_fields (simple BM25F): weighted tf/len combine
    // BEFORE saturation — not most_fields' per-field-saturate-then-sum
    // double-dip; the oracle replays the combined arithmetic over the
    // synthesized title + text pair
    "cf1_combined_fields" -> ((s, d) => {
      val docs0 = t(s, d, "documents").withColumn("title",
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 6)))
      graft.operators.Ranking.bm25fTopK(docs0, "doc_id",
          Seq("title" -> 2.0, "text" -> 1.0),
          Seq("stream", "filter", "join"), k = 15)
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // in-engine TRAINED quality classifier: logistic regression fit
    // by IRLS (8 map-side-combined scans; the model's d+1 doubles
    // live driver-side and fold into each scan as literals — nothing
    // model-shaped shuffles). Labels come from a margin-separated
    // rule (token count >= 60, the 56..64 band excluded), so the data
    // is linearly separable by construction and a correct fit MUST
    // score 100% — the oracle replays the label rule and checks the
    // per-doc `correct` booleans literally (the ax1 discipline:
    // in-engine evaluation, engine-independent verdicts)
    "qc1_quality_classifier" -> ((s, d) => {
      val feats = t(s, d, "documents").select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("double").as("tc"),
        (length(col("text")).cast("double") /
          (TextAnalysis.tokenCount(col("text")) + lit(1)).cast("double"))
          .as("awl"))
      val labeled = feats.filter(col("tc") < 56 || col("tc") > 64)
        .withColumn("label", (col("tc") >= 60).cast("int"))
      val model = graft.operators.QualityClassifier.fitIrls(
        labeled, Seq("tc", "awl"), "label", iters = 8)
      labeled.select(col("doc_id"), col("label"),
          (model.predict === col("label")).as("correct"))
        .orderBy("doc_id")
    }),
    // hybrid retrieval over the PERSISTENT serving stack: the
    // segmented inverted index's BM25 top-30 fuses with the IVF
    // vector index's every-cell (exact) knn top-30 via RRF — the hy1
    // composition, served from the indexes instead of scans; the
    // oracle is the same flat replay (index ≡ scan is pinned by
    // idx1/vx1), so a stale segment stat, a leaked tombstone, or a
    // probe-rule drift on either index breaks the fused ranking
    "hy2_hybrid_index_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val ipath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy2i-$tag").toString
      val vpath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy2v-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", ipath)
      val lex = graft.operators.InvertedIndex.searchTopK(s, ipath,
          Seq("stream", "filter", "join"), k = 30, idColName = "doc_id")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      graft.operators.VectorIndex.build(t(s, d, "embeddings"),
        "vec_id", "embedding", vpath, nlist = 8)
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val sem = graft.operators.VectorIndex.searchTopK(
        Seq((1L, qv)).toDF("q_id", "vec"), vpath, k = 30, nprobe = 8,
        idColName = "doc_id")
      graft.operators.Ranking.rrfFuse(
          Seq(lex.select("doc_id", "rank"), sem.select("doc_id", "rank")),
          "doc_id", "rank", k = 20)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),
    // the ONE-CALL serving facade: hy2's hand-wired composition as a
    // library face — a query frame carrying (terms, vec) answered
    // from BOTH persistent indexes (batched BM25 leg + IVF knn leg)
    // and fused per query; same flat-replay oracle as hy1/hy2, so a
    // drift anywhere in the two-index + per-query-fusion stack misses
    "hy3_search_hybrid" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val ipath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy3i-$tag").toString
      val vpath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy3v-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", ipath)
      graft.operators.VectorIndex.build(t(s, d, "embeddings"),
        "vec_id", "embedding", vpath, nlist = 8)
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val queries = Seq((1L, Seq("stream", "filter", "join"), qv))
        .toDF("q_id", "terms", "vec")
      graft.operators.Serving.searchHybrid(queries, ipath, vpath,
          k = 20, perLegK = 30, nprobe = 8, idColName = "doc_id")
        .select("doc_id", "rrf_score")
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),
    // the facade's LINEAR combiner over the persistent stack: same
    // two-index serve as hy3, fused by per-query min-max weighted
    // sum instead of RRF — the flat replay is hy4's (index ≡ scan
    // pinned), so a normalization-range drift on either leg misses
    "hy5_hybrid_index_linear" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val ipath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy5i-$tag").toString
      val vpath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-hy5v-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", ipath)
      graft.operators.VectorIndex.build(t(s, d, "embeddings"),
        "vec_id", "embedding", vpath, nlist = 8)
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val queries = Seq((1L, Seq("stream", "filter", "join"), qv))
        .toDF("q_id", "terms", "vec")
      graft.operators.Serving.searchHybrid(queries, ipath, vpath,
          k = 20, perLegK = 30, nprobe = 8, idColName = "doc_id",
          fusion = "linear", legWeights = Seq(0.7, 0.3))
        .select("doc_id", "lin_score")
        .orderBy(col("lin_score").desc, col("doc_id"))
    }),
    // index-served BOOLEAN search (the query_string grammar flattened
    // to one bool level): conj leg = must+must_not through the single
    // pruned-postings pivot, disj leg = should with ES's at-least-one
    // default; the oracle replays the gates and the Okapi sum from
    // the raw table
    "idx15_query_string_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx15-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      val conj = graft.operators.InvertedIndex.queryStringSearchTopK(
          s, path, "stream + filter -join", 10, idColName = "doc_id")
        .withColumn("q", lit("conj"))
      val disj = graft.operators.InvertedIndex.queryStringSearchTopK(
          s, path, "merge | sort", 10, idColName = "doc_id")
        .withColumn("q", lit("disj"))
      conj.unionByName(disj)
        .orderBy(col("q"), col("score").desc, col("doc_id"))
    }),
    // index-backed BM25: build the persistent postings index (ONE
    // corpus shuffle, partitioned by md5 term bucket) then search it
    // reading only the query terms' buckets — the query-serving face
    // of bm1 (Lucene's role in the reference). The oracle replays the
    // same Okapi formula from the raw table, so the gate proves
    // build + pruned search ≡ corpus-scan scoring end-to-end
    "idx1_index_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx1-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("stream", "filter", "join"), k = 10, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // ES ingest pipeline: 8 ordered processors (dissect, convert,
    // lowercase, set, convert-to-string, gsub, a date format LADDER
    // where the first format misses and the second parses) as ONE
    // narrow projection stage — the oracle replays every processor,
    // so a wrong order, a greedy dissect, or a first-format-wins
    // mistake cannot match
    "ig1_ingest_pipeline" -> ((s, d) => {
      val pipe = graft.operators.IngestPipeline(
        """{"processors": [
          |  {"dissect": {"field": "o_orderpriority",
          |    "pattern": "%{prio_num}-%{prio_word}"}},
          |  {"convert": {"field": "prio_num", "type": "long"}},
          |  {"lowercase": {"field": "prio_word"}},
          |  {"set": {"field": "engine", "value": "graft"}},
          |  {"convert": {"field": "o_orderkey", "type": "string",
          |    "target_field": "o_key"}},
          |  {"gsub": {"field": "o_orderstatus", "pattern": "^O$",
          |    "replacement": "OPEN", "target_field": "status_x"}},
          |  {"convert": {"field": "o_orderdate", "type": "string",
          |    "target_field": "od_str"}},
          |  {"date": {"field": "od_str",
          |    "formats": ["UNIX", "yyyy-MM-dd HH:mm:ss"],
          |    "target_field": "ots"}}
          |]}""".stripMargin)
      pipe(t(s, d, "orders"))
        .select(col("o_orderkey"), col("prio_num"), col("prio_word"),
          col("engine"), col("o_key"), col("status_x"),
          col("ots").cast("string").as("ots_str"))
        .orderBy("o_orderkey")
    }),
    // ES enrich processor: the nation policy joins as a BROADCAST
    // dimension with max_matches=1 uniqueness enforced in-plan; the
    // copied fields land as ES's object (a struct), read back as
    // scalars
    "ig2_ingest_enrich" -> ((s, d) => {
      val policies = Map("nations" ->
        graft.operators.IngestPipeline.EnrichPolicy(
          t(s, d, "nation"), "n_nationkey",
          Seq("n_name", "n_regionkey")))
      val pipe = graft.operators.IngestPipeline(
        """{"processors": [
          |  {"enrich": {"policy_name": "nations",
          |    "field": "c_nationkey", "target_field": "nation"}}
          |]}""".stripMargin, policies)
      pipe(t(s, d, "customer"))
        .select(col("c_custkey"),
          col("nation.n_name").as("nation_name"),
          col("nation.n_regionkey").as("nation_region"))
        .orderBy("c_custkey")
    }),
    // ES _terms_enum: lexicographic prefix enumeration from the
    // vocabulary sidecar with the search_after cursor — two pages
    // tile exactly; the oracle enumerates distinct tokens from the
    // raw corpus, so a stale vocab, a lost term, or a cursor
    // overlap/gap cannot match
    "te1_terms_enum" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft-te1-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.buildVocabulary(s, path)
      val p1 = graft.operators.InvertedIndex.termsEnum(
        s, path, "s", size = 4)
      val last = p1.collect().map(_.getString(0)).max
      val p2 = graft.operators.InvertedIndex.termsEnum(
        s, path, "s", size = 4, searchAfter = Some(last))
      p1.withColumn("page", lit(1L))
        .unionByName(p2.withColumn("page", lit(2L)))
        .orderBy("page", "term")
    }),
    // index-served SYNONYM search: the query position "hash" expands
    // through the rule set and scores as ONE SynonymQuery pseudo-term
    // over the members' postings — tf sums per doc, df blends as the
    // member MAX — while "scan" stays a singleton; the oracle replays
    // the blend from the raw table, so a per-member scoring (the
    // plain arithmetic) ranks docs holding both members differently
    // and cannot match
    "idx21_synonym_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft-idx21-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.searchTopKSynonyms(s, path,
          Seq("hash", "scan"), Seq("hash, key"), k = 12,
          idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // index-served FUZZY search: typo'd query terms resolve through
    // the SymSpell deletion dictionary (exact recall at edit distance
    // <= 1, O(term length) lookups — never the f17 brute scan over
    // every token) then ride the ordinary pruned-postings BM25. The
    // oracle resolves by BRUTE levenshtein over the whole vocabulary
    // and replays the same scoring — equality proves the deletion
    // neighborhood loses no term and the serving path scores
    // identically
    "fz1_fuzzy_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-fz1-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.buildFuzzyDictionary(s, path)
      graft.operators.InvertedIndex.fuzzySearchTopK(s, path,
          Seq("streem", "filtir"), k = 12, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // cross-index search (es index-* patterns) with GLOBAL stats:
    // even docs in one index at 64 buckets, odd docs in another at 32
    // (different layouts MUST co-search), merged moments + cross-index
    // df — the oracle replays BM25 over the flat union corpus, so a
    // stats-merge or per-index-df mistake cannot match
    "idx10_multi_index" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx10-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        s"$base/even", buckets = 64)
      graft.operators.InvertedIndex.build(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        s"$base/odd", buckets = 32)
      graft.operators.InvertedIndex.searchTopKIndices(s,
          Seq(s"$base/even", s"$base/odd"),
          Seq("vector", "merge", "sort"), k = 15, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // FIELDED index (every mapped text field indexed, the ES model):
    // a short derived `title` field + the full text under one root,
    // exercised across build + append + delete + compact, then
    // multi_match served from postings in BOTH modes — best_fields
    // (dis_max, tie_breaker 0.3) and most_fields (sum) — with title
    // boosted 2x. Per-field stats (n, avg len, df) and the RAW
    // per-field scores combine exactly like the scan-side scored
    // query (parity spec-pinned); the oracle replays the whole thing
    // from the live doc set, where neither the index nor per-field
    // layout exists — a stats blend, a per-field rounding, or a
    // per-field top-k truncation before the combine all mismatch
    // field-scoped query_string served from the FIELDED index: a
    // scoped should clause (title:stream), an unscoped one spreading
    // dis_max over title^2/text, and an unscoped negation — one
    // stats job, one pruned postings read per field, clause legs
    // broadcast
    "idx18_fielded_query_string" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx18-$tag").toString
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 4)).as("title"))
      graft.operators.FieldedIndex.build(docs, "doc_id",
        Seq("title", "text"), root, buckets = 16)
      graft.operators.FieldedIndex.queryStringSearchTopK(s, root,
          "title:stream filter -join",
          Seq("title" -> 2.0, "text" -> 1.0), k = 12,
          idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "idx11_fielded_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx11-$tag").toString
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 4)).as("title"))
      // buckets = 16: the gate writes 8 segments (2 fields x
      // build/append/compact stages) — 64 dirs each would be pure
      // small-file commit overhead at gate scale; pruning still reads
      // <= 3 of 16 buckets per field
      graft.operators.FieldedIndex.build(docs.filter(col("doc_id") < 250),
        "doc_id", Seq("title", "text"), root, buckets = 16)
      graft.operators.FieldedIndex.append(
        docs.filter(col("doc_id") >= 250), "doc_id", root)
      graft.operators.FieldedIndex.deleteDocs(
        docs.filter(col("doc_id") % 11 === 0).select("doc_id"), root)
      graft.operators.FieldedIndex.compact(s, root)
      Seq(("best_fields", 0.3), ("most_fields", 0.0)).map {
        case (m, tie) =>
          graft.operators.FieldedIndex.searchTopK(s, root,
              "stream filter join", Seq("title" -> 2.0, "text" -> 1.0),
              k = 10, mode = m, tieBreaker = tie, idColName = "doc_id")
            .withColumn("mode", lit(m))
      }.reduce(_ unionByName _)
        .orderBy(col("mode"), col("score").desc, col("doc_id"))
    }),
    // fielded multi_match type PHRASE served from per-field
    // POSITIONAL postings: per-field adjacency tf + per-field
    // df/avg-len under dis_max with boosts and tie_breaker, live
    // stats after a delete. The oracle replays the whole thing from
    // the live doc set — neither the index nor its positions exist
    // oracle-side, so per-field stat/adjacency/combine slips mismatch
    "idx12_fielded_phrase" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx12-$tag").toString
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 6)).as("title"))
      graft.operators.FieldedIndex.build(docs, "doc_id",
        Seq("title", "text"), root, buckets = 16, positions = true)
      graft.operators.FieldedIndex.deleteDocs(
        docs.filter(col("doc_id") % 13 === 0).select("doc_id"), root)
      graft.operators.FieldedIndex.searchTopK(s, root, "order fast",
          Seq("title" -> 2.0, "text" -> 1.0), k = 12, mode = "phrase",
          tieBreaker = 0.4, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // the ES term suggester ("did you mean") from the fuzzy
    // dictionary: a typo suggests its distance-1 vocabulary neighbors
    // with live df, and suggest_mode=missing yields NOTHING for a
    // term the vocabulary already holds — both behaviors in one
    // union, oracle-replayed by brute vocabulary levenshtein
    "sg1_term_suggest" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-sg1-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.buildFuzzyDictionary(s, path)
      val a = graft.operators.InvertedIndex
        .suggestTerms(s, path, "filtir", k = 5).withColumn("q", lit("filtir"))
      val b = graft.operators.InvertedIndex
        .suggestTerms(s, path, "stream", k = 5).withColumn("q", lit("stream"))
      a.unionByName(b).orderBy(col("q"), col("df").desc, col("term"))
    }),
    // the ES COMPLETION suggester ("search-as-you-type" box): top-k
    // vocabulary terms extending a prefix by LIVE df, served from the
    // sorted vocabulary sidecar (range-pruned — the md5 term buckets
    // scatter prefixes by design) + sg1's bucket-pruned df read. The
    // oracle ranks the brute vocabulary scan — the sidecar never
    // exists oracle-side, so a range-bound or ranking slip mismatches
    "sg2_prefix_suggest" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-sg2-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.buildVocabulary(s, path)
      val a = graft.operators.InvertedIndex
        .suggestCompletions(s, path, "s", k = 5).withColumn("q", lit("s"))
      val b = graft.operators.InvertedIndex
        .suggestCompletions(s, path, "wi", k = 5).withColumn("q", lit("wi"))
      a.unionByName(b).orderBy(col("q"), col("df").desc, col("term"))
    }),
    // the ES PHRASE suggester ("did you mean" whole phrases): per-
    // position distance-1 candidates from the corpus vocabulary
    // (frequency-ranked top-3 + the observed term), ≤-1-changed-
    // position enumeration, stupid-backoff bigram LM + noisy-channel
    // keep/change likelihoods, confidence cut vs the input phrase's
    // own score. The oracle replays the WHOLE recipe — levenshtein
    // candidate generation, the combination filter, and the exact
    // left-to-right log-sum
    "sg3_phrase_suggest" -> ((s, d) => {
      graft.operators.PhraseSuggest.suggest(t(s, d, "documents"),
        "text", "hash joinn scan", k = 3, numCandidates = 3,
        maxErrors = 1)
    }),
    // ES completion suggester with per-entry WEIGHT and CONTEXTS (sg2
    // ranks by live df; the completion FIELD ranks by indexed weight
    // and filters by context): entries = (first token, doc_id % 97,
    // [source]) per doc; all-contexts vs a two-context filter, both
    // ranked (max weight desc, term asc) — skip_duplicates keeping
    // the highest weight
    "sg4_weighted_suggest" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-sg4-$tag").toString
      val entries = t(s, d, "documents").select(
        element_at(graft.functions.TextAnalysis.tokens(col("text")), 1)
          .as("term"),
        (col("doc_id") % 97).as("weight"),
        col("source").as("ctx"))
      graft.operators.InvertedIndex.buildSuggestEntries(entries, "term",
        "weight", path, contextsCol = Some("ctx"))
      val all = graft.operators.InvertedIndex.suggestWeighted(s, path,
        "s", k = 8).withColumn("q", lit("all"))
      val fil = graft.operators.InvertedIndex.suggestWeighted(s, path,
          "s", k = 8, contexts = Seq("src3", "src7"))
        .withColumn("q", lit("ctx"))
      all.unionByName(fil)
        .orderBy(col("q"), col("weight").desc, col("term"))
    }),
    // more_like_this served from the index: doc 5's text is the like
    // input, term selection (like-tf >= 2, live df >= 5, top 5 by
    // 6dp-rounded tf*idf, term-asc ties) then BM25 with a 30%-floored
    // minimum-should-match cut and the like-doc excluded from the
    // RESULT (not from df). The oracle replays the whole recipe —
    // selection, msm arithmetic, and the Okapi sum
    "mlt1_more_like_this" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-mlt1-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      val like = docs.filter(col("doc_id") === 5)
        .select("text").head().getString(0)
      graft.operators.InvertedIndex.moreLikeThisTopK(s, path, like,
          k = 10, idColName = "doc_id", maxQueryTerms = 5,
          minTermFreq = 2, minDocFreq = 5, minShouldMatchPct = 30,
          excludeId = Some(5L))
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // index built through the ES-`minimal_english` analysis chain
    // (build(analyzer = "english")): postings hold STEMMED terms, the
    // stats record the analyzer, and searchTopK analyzes its query
    // terms the same way — "queries" resolves to "query" and MERGES
    // with the corpus word's occurrences (doc-side stemming changes
    // tf/df, not just query rewriting). The oracle replays BM25 over
    // stemmed token lists with the stem CASE macro applied to both
    // sides — an unstemmed build or an unanalyzed query both
    // hash-mismatch
    "idx9_stemmed_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx9-$tag").toString
      val docs2 = t(s, d, "documents").withColumn("text2",
        graft.queries.QueryUtil.stemFixtureText(col("text"), col("doc_id")))
      graft.operators.InvertedIndex.build(docs2, "doc_id", "text2", path,
        analyzer = "english")
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("Queries", "dogs", "glass"), k = 12, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // incremental index ingest: half the corpus built, half APPENDED
    // as a second immutable segment (the Lucene segment model; stats
    // moments additive, df summed across disjoint doc sets). The
    // oracle replays BM25 over the WHOLE flat table — equality proves
    // the multi-segment merge math introduces no drift
    "idx2_index_append" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx2-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
      graft.operators.InvertedIndex.append(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", path)
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("spark", "hash"), k = 15, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // tombstone deletes (the Lucene delete model): every 7th doc is
    // deleted AFTER the build and the search runs with the tombstones
    // LIVE — the logical-subtraction path (postings anti-join plus
    // lens-exact n/avg-len adjustment, the riskier math; the spec pins
    // logical == compacted == rebuilt). The oracle replays BM25 over a
    // corpus that never held the deleted docs — equality proves
    // deletion adjusts df, n, AND avg doc length exactly, not just
    // masks postings
    // index-served match_bool_prefix (search-as-you-type): full-term
    // BM25 (tombstone-adjusted) + the constant-1.0 prefix clause,
    // prefix resolved from the vocabulary sidecar; delete-aware
    // without a vocab rebuild (tombstones keep the segment set). The
    // oracle replays the whole thing over the live docs — Okapi
    // arithmetic, AND gate, prefix test, +1, one 6-dp rounding
    // ES search_after pagination of the index ranking: page 2 starts
    // strictly after page 1's (score, id) cursor on the ROUNDED
    // surface — the oracle proves exact tiling by checking page 2
    // against rank positions 8..14 of the full replayed ranking
    "idx17_search_after" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx17-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      val terms = Seq("stream", "filter", "join")
      val p1 = graft.operators.InvertedIndex.searchTopK(s, path, terms,
        k = 7, idColName = "doc_id")
      val rows = p1.orderBy(col("score").desc, col("doc_id")).collect()
      val last = rows.last
      val p2 = graft.operators.InvertedIndex.searchAfter(s, path, terms,
        k = 7, afterScore = last.getDouble(1), afterId = last.getLong(0),
        idColName = "doc_id")
      p1.withColumn("q", lit("p1"))
        .unionByName(p2.withColumn("q", lit("p2")))
        .orderBy(col("q"), col("score").desc, col("doc_id"))
    }),
    // ES search_after for the FIELDED index (idx17's cursor contract
    // lifted to the multi-field ranking): page 2 starts strictly
    // after page 1's (score, id) cursor on the ROUNDED combined
    // best_fields score; the oracle proves exact tiling — p2 equals
    // rank positions 8..14 of the full replayed ranking
    "idx20_fielded_search_after" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val root = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx20-$tag").toString
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"),
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 4)).as("title"))
      graft.operators.FieldedIndex.build(docs, "doc_id",
        Seq("title", "text"), root, buckets = 16)
      val fb = Seq("title" -> 2.0, "text" -> 1.0)
      val p1 = graft.operators.FieldedIndex.searchTopK(s, root,
        "stream filter join", fb, k = 7, tieBreaker = 0.3,
        idColName = "doc_id")
      val last = p1.orderBy(col("score").desc, col("doc_id"))
        .collect().last
      val p2 = graft.operators.FieldedIndex.searchAfterTopK(s, root,
        "stream filter join", fb, k = 7,
        afterScore = last.getDouble(1), afterId = last.getLong(0),
        tieBreaker = 0.3, idColName = "doc_id")
      p1.withColumn("q", lit("p1"))
        .unionByName(p2.withColumn("q", lit("p2")))
        .orderBy(col("q"), col("score").desc, col("doc_id"))
    }),
    // index-served match_phrase_prefix (the THIRD search-as-you-type
    // face): full terms adjacent + a prefix-completing token at the
    // next position; phrase-BM25 over completed occurrences + the
    // constant prefix clause (the idx13 discipline); plus the bare
    // one-term prefix box at constant 1.0
    "idx16_phrase_prefix_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx16-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path,
        positions = true)
      graft.operators.InvertedIndex.buildVocabulary(s, path)
      val ph = graft.operators.InvertedIndex.phrasePrefixSearchTopK(
          s, path, "the fas", k = 15, idColName = "doc_id")
        .withColumn("q", lit("phrase"))
      val bare = graft.operators.InvertedIndex.phrasePrefixSearchTopK(
          s, path, "mer", k = 15, idColName = "doc_id")
        .withColumn("q", lit("bare"))
      ph.unionByName(bare)
        .orderBy(col("q"), col("score").desc, col("doc_id"))
    }),
    "idx13_bool_prefix" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx13-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      graft.operators.InvertedIndex.buildVocabulary(s, path)
      graft.operators.InvertedIndex.deleteDocs(
        docs.filter(col("doc_id") % 9 === 4).select("doc_id"), path)
      graft.operators.InvertedIndex.boolPrefixSearchTopK(s, path,
          "stream fil", k = 15, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // ES _explain: the BM25 component breakdown per (doc, term) for
    // docs 0-9, df/idf from the FULL live corpus (restricting the
    // explained docs must not move statistics)
    "ex1_explain_score" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-ex1-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.explainScore(s, path,
          Seq("stream", "filter", "join"), idColName = "doc_id",
          onlyIds = Some((0L to 9L).toSeq))
        .orderBy("doc_id", "term")
    }),
    // ES delete_by_query: tombstone every doc containing 'join', then
    // search — the oracle replays BM25 over the surviving corpus with
    // the adjusted n/avg/df
    "idx14_delete_by_query" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx14-$tag").toString
      graft.operators.InvertedIndex.build(t(s, d, "documents"),
        "doc_id", "text", path)
      graft.operators.InvertedIndex.deleteByQuery(s, path, "join")
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("stream", "filter"), k = 15, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    "idx3_index_delete" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx3-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      graft.operators.InvertedIndex.deleteDocs(
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"), path)
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("stream", "filter", "join"), k = 10, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // live per-term document frequency (the _termvectors df face),
    // tombstone-adjusted: build, delete every 7th doc, ask for df of
    // terms across the LIVE corpus only — oracle counts distinct
    // surviving docs per term
    "idx5_term_stats" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx5-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      graft.operators.InvertedIndex.deleteDocs(
        docs.filter(col("doc_id") % 7 === 0).select("doc_id"), path)
      graft.operators.InvertedIndex.termStats(s, path,
          Seq("stream", "filter", "join", "spark", "hash"))
        .orderBy("term")
    }),
    // ES-style upsert (segment-scoped tombstones, real Lucene delete
    // semantics): every 10th doc is UPDATED with new text and a batch
    // of genuinely-new docs rides along; no compact() runs, so the
    // updated docs are served by their new segment while their old
    // postings are masked only in the tombstones' own scope. Oracle =
    // BM25 over the post-update corpus
    "idx4_index_upsert" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-idx4-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      val updated = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" stream graftupd")).as("text"))
      val fresh = docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 90000).as("doc_id"),
          concat(lit("filter stream "), col("text")).as("text"))
      graft.operators.InvertedIndex.upsertDocs(
        updated.unionByName(fresh), "doc_id", "text", path)
      graft.operators.InvertedIndex.searchTopK(s, path,
          Seq("stream", "filter", "join"), k = 10, idColName = "doc_id")
        .orderBy(col("score").desc, col("doc_id"))
    }),
    // hybrid retrieval via reciprocal-rank fusion (the ES 8.x
    // rank.rrf combiner): a BM25 top-30 over the text corpus fuses
    // with a cosine top-30 over the embeddings (same id space) as
    // 1/(60 + rank) sums — rank-based, so the score scales never need
    // normalizing. The oracle replays both rankings AND the fusion;
    // a score-weighted combiner, a wrong rrfK, or a ranking leaking
    // past its k all miss
    // the ES 8.14 retriever TREE: an rrf node composing a standard
    // (scored-scan BM25 match) leg with a knn (exact cosine) leg —
    // the modern search-request surface as one JSON tree; the oracle
    // replays both legs, the per-leg rank cuts, and the fusion
    "rtv1_retriever_tree" -> ((s, d) => {
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val tree =
        s"""{"rrf": {"rank_constant": 60, "rank_window_size": 30,
           |"retrievers": [
           |  {"standard": {"query":
           |    {"match": {"text": "stream filter"}}}},
           |  {"knn": {"query_vector": ${qv.mkString("[", ", ", "]")},
           |   "k": 30}}]}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding",
        tree, k = 20, rankWindowSize = 30)
    }),
    // knn retriever WITH a metadata filter (ES's knn.filter inside
    // the tree): the term predicate resolves against the DOCS frame
    // and semi-joins the candidate set BEFORE scoring (the vx4
    // placement); ranks re-number within the filtered corpus
    "rtv4_filtered_knn_tree" -> ((s, d) => {
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val tree =
        s"""{"knn": {"query_vector": ${qv.mkString("[", ", ", "]")},
           |"k": 15, "filter": {"term": {"lang": "en"}}}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding", tree,
        k = 15, rankWindowSize = 30)
    }),
    // ES 8.18 `rescorer` retriever node: the child's top
    // window_size re-scores under a second match query with Lucene's
    // QueryRescorer combine (query_weight x base +
    // rescore_query_weight x rescore); windowed docs missing the
    // rescore query keep the weighted base, docs beyond window_size
    // keep their child scores — the oracle replays both BM25 legs,
    // the window cut, the combine arms and the re-rank
    "rtv7_rescorer_node" -> ((s, d) => {
      val tree =
        """{"rescorer": {
          |  "retriever": {"standard": {"query":
          |    {"match": {"text": "stream filter"}}}},
          |  "rank_window_size": 30,
          |  "rescore": {"window_size": 10, "query": {
          |    "rescore_query": {"match": {"text": "join merge"}},
          |    "query_weight": 0.7,
          |    "rescore_query_weight": 1.2,
          |    "score_mode": "total"}}
          |}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding",
        tree, k = 20, rankWindowSize = 30)
    }),
    // ES 8.18 `semantic` retriever leg: the query text embeds
    // driver-side through the SAME stub encoder that embedded the
    // docs, exact cosine, fused with a lexical leg under rrf — the
    // oracle replays the md5 stub per dimension, the cosine, both
    // rank cuts and the fusion
    "rtv8_semantic_leg" -> ((s, d) => {
      val docsF = t(s, d, "documents").filter(col("doc_id") < 200)
      val vec = graft.ml.Inference.embedText(
        docsF.select(col("doc_id"), col("text")), "doc_id", "text",
        graft.ml.Inference.hashEncoder(8))
      val tree =
        """{"rrf": {"rank_constant": 60, "rank_window_size": 25,
          |"retrievers": [
          |  {"standard": {"query":
          |    {"match": {"text": "stream filter"}}}},
          |  {"semantic": {"query": "stream filter merge", "k": 25}}
          |]}}""".stripMargin
      graft.operators.Serving.retrieverSearch(docsF, "doc_id", vec,
        "doc_id", "embedding", tree, k = 15, rankWindowSize = 25)
    }),
    // the one-call RAG path: chunk -> embed (the deterministic stub
    // through the pluggable seam) -> query embedded with the SAME
    // encoder -> exact-cosine top-k chunks; the oracle replays the
    // chunk windows, the md5 stub per dimension (float-quantized),
    // the cosine and the rank cut end to end
    "rag1_semantic_search" -> ((s, d) => {
      graft.operators.Serving.semanticSearchText(
        t(s, d, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", queryText = "stream filter merge", k = 12,
        chunkSize = 16, stride = 8)
    }),
    // the PERSISTENT semantic_text stack: chunk + embed (stub seam) +
    // cell-partitioned VectorIndex build in ONE call, queried at full
    // probing (nprobe >= nlist = exact) — must land on rag1's ad-hoc
    // answer exactly; the packed chunk key makes the index tie order
    // (score, doc_id, chunk_no), replayed by the shared oracle
    "sx1_semantic_index_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-sx1-$tag").toString
      graft.operators.Serving.buildSemanticIndex(
        t(s, d, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", path, chunkSize = 16, stride = 8, nlist = 4)
      graft.operators.Serving.semanticSearchIndex(s, path,
        "stream filter merge", k = 12, nprobe = 99)
    }),
    // pinned retriever (ES 8.16): ids [42, 999999, 7] rank first in
    // GIVEN order — 999999 is absent and must skip without leaving a
    // rank gap — with the sentinel 1e9 − position scores; the organic
    // BM25 leg fills after with pinned ids excluded
    "rtv3_pinned_tree" -> ((s, d) => {
      val tree =
        """{"pinned": {"ids": [42, 999999, 7],
          |"rank_window_size": 25,
          |"retriever": {"standard": {"query":
          |  {"match": {"text": "stream filter"}}}}}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding", tree,
        k = 15, rankWindowSize = 25)
    }),
    // text_similarity_reranker (ES 8.15): the child BM25 leg's top-30
    // re-scores through the pluggable cross-encoder SEAM (here the
    // deterministic md5 stub — the emb4 discipline: plumbing real,
    // model pluggable) and re-ranks; the oracle replays the BM25 cut,
    // the md5 pair score and the re-rank
    "rtv2_reranked_tree" -> ((s, d) => {
      val tree =
        """{"text_similarity_reranker": {
          |  "retriever": {"standard": {"query":
          |    {"match": {"text": "stream filter"}}}},
          |  "field": "text",
          |  "inference_text": "streaming filters",
          |  "rank_window_size": 30}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding", tree,
        k = 15, rankWindowSize = 30,
        reranker = Some((q, c) =>
          conv(substring(md5(concat(lit(q), lit(":"), c)), 1, 8),
            16, 10).cast("long") / lit(4294967296.0)))
    }),
    // rule retriever (ES 8.15 query rules, inline rulesets): the
    // request metadata fires rule 1 (contains + gte criteria ->
    // pin [42, 7]) and rule 3 (prefix -> exclude [7, 3]) but NOT
    // rule 2 (exact mismatch); exclusion wins over pinning (7 drops),
    // excluded ids vanish BEFORE ranks assign (survivors re-rank
    // densely), and the surviving pin rides the f37 sentinel ladder
    "rtv5_rule_retriever" -> ((s, d) => {
      val tree =
        """{"rule": {
          |  "match_criteria": {"user_query": "stream pipelines",
          |                     "tier": 3},
          |  "rules": [
          |    {"type": "pinned", "ids": [42, 7],
          |     "criteria": [
          |       {"type": "contains", "metadata": "user_query",
          |        "values": ["stream"]},
          |       {"type": "gte", "metadata": "tier", "values": [2]}]},
          |    {"type": "pinned", "ids": [1],
          |     "criteria": [{"type": "exact", "metadata": "user_query",
          |                   "values": ["dogs"]}]},
          |    {"type": "exclude", "ids": [7, 3],
          |     "criteria": [{"type": "prefix", "metadata": "user_query",
          |                   "values": ["str"]}]}],
          |  "rank_window_size": 25,
          |  "retriever": {"standard": {"query":
          |    {"match": {"text": "stream filter"}}}}}}""".stripMargin
      graft.operators.Serving.retrieverSearch(t(s, d, "documents"),
        "doc_id", t(s, d, "embeddings"), "vec_id", "embedding", tree,
        k = 15, rankWindowSize = 25)
    }),
    // sparse_vector as a retriever-tree leg (ES 8.15 — the ELSER leg
    // of the modern search request): the standard node's scored scan
    // serves the sparse dot product over array<struct<token, weight>>
    // and the tree's rank plumbing cuts under (score desc, id asc)
    "rtv6_sparse_leg" -> ((s, d) => {
      val sv = t(s, d, "documents")
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysis.tokens(col("text")))
            .as("token"))
        .groupBy("doc_id", "token")
        .agg(count(lit(1)).cast("double").as("weight"))
        .groupBy("doc_id")
        .agg(collect_list(struct(col("token"), col("weight")))
          .as("ml_tokens"))
      val tree =
        """{"standard": {"query": {"sparse_vector":
          |  {"field": "ml_tokens",
          |   "query_vector": {"stream": 2.0, "merge": 1.0}}}}}"""
          .stripMargin
      graft.operators.Serving.retrieverSearch(sv, "doc_id",
        t(s, d, "embeddings"), "vec_id", "embedding", tree,
        k = 15, rankWindowSize = 30)
    }),
    "hy1_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lex = graft.operators.Ranking.bm25TopK(t(s, d, "documents"),
          "doc_id", "text", Seq("stream", "filter", "join"), k = 30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val sem = t(s, d, "embeddings")
        .select(col("vec_id").as("doc_id"),
          round(VectorExpressions.cosine(col("embedding"),
            typedLit(qv)), 6).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(30)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cos").desc, col("doc_id"))).cast("long"))
      graft.operators.Ranking.rrfFuse(
          Seq(lex.select("doc_id", "rank"), sem.select("doc_id", "rank")),
          "doc_id", "rank", k = 20)
        .orderBy(col("rrf_score").desc, col("doc_id"))
    }),
    // weighted linear hybrid fusion (the ES 8.x `linear` retriever):
    // each leg's top-30 scores min-max normalize over their own set,
    // fused = 0.7 × lexical + 0.3 × semantic — the score-magnitude
    // sibling of hy1's rank-based RRF; the oracle replays both legs,
    // both normalizations, and the weighted sum
    "hy4_hybrid_linear" -> ((s, d) => {
      val lex = graft.operators.Ranking.bm25TopK(t(s, d, "documents"),
        "doc_id", "text", Seq("stream", "filter", "join"), k = 30)
      val qv = (0 until 64).map(i => ((i * 7) % 13 - 6) / 10.0)
      val sem = t(s, d, "embeddings")
        .select(col("vec_id").as("doc_id"),
          round(VectorExpressions.cosine(col("embedding"),
            typedLit(qv)), 6).as("cos"))
        .orderBy(col("cos").desc, col("doc_id")).limit(30)
      graft.operators.Ranking.linearFuse(
          Seq(lex.select(col("doc_id"), col("score")),
            sem.select(col("doc_id"), col("cos").as("score"))),
          "doc_id", "score", Seq(0.7, 0.3), k = 20)
        .orderBy(col("lin_score").desc, col("doc_id"))
    }),
    // persistent IVF vector index, exact configuration: build the
    // cell-partitioned index (quantizer trained once, frozen), then
    // serve a query frame probing EVERY cell — must equal brute-force
    // cosine top-k, which DuckDB replays from the raw table. Query ids
    // are shifted out of the corpus id space: the index has no notion
    // of query identity, so the oracle replay includes each query's
    // own corpus twin at cosine 1.0.
    "vx1_vector_index_search" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-vx1-$tag").toString
      val e = t(s, d, "embeddings")
      graft.operators.VectorIndex.build(e, "vec_id", "embedding", path,
        nlist = 8)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopK(q, path, k = 5, nprobe = 8,
          idColName = "n_id")
        .orderBy("q_id", "rank")
    }),
    // ES knn.filter — filtered ANN: candidates restrict to an id set
    // BEFORE ranking (the semi-join lands after the cell pruning,
    // filtered vectors are never dotted); exact configuration (all
    // cells probed) so the oracle is brute force over the filtered
    // corpus
    "vx4_filtered_knn" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-vx4-$tag").toString
      val e = t(s, d, "embeddings")
      graft.operators.VectorIndex.build(e, "vec_id", "embedding", path,
        nlist = 8)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      val keep = e.filter(col("vec_id") % 2 === 0).select("vec_id")
      graft.operators.VectorIndex.searchTopK(q, path, k = 5, nprobe = 8,
          idColName = "n_id", filterIds = Some(keep))
        .orderBy("q_id", "rank")
    }),
    // ES 8.8 knn.similarity — a minimum-cosine cut: sub-threshold
    // candidates drop BEFORE the k-cut (queries may return fewer
    // than k rows); the threshold compares the ROUNDED score, the
    // engine's score surface, so the cut replays exactly. Exact
    // configuration → brute-force oracle with the same HAVING-style
    // cut
    "vx5_knn_similarity" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-vx5-$tag").toString
      val e = t(s, d, "embeddings")
      graft.operators.VectorIndex.build(e, "vec_id", "embedding", path,
        nlist = 8)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopK(q, path, k = 10,
          nprobe = 8, idColName = "n_id",
          minSimilarity = Some(0.30))
        .orderBy("q_id", "rank")
    }),
    // the IVF-PQ serving path, exact configuration: the index stores
    // per-segment PQ code tables (pqM = 8 subspaces), ADC stage 1
    // scans only the probed cells' codes, stage 2 re-ranks exact —
    // with every cell probed and candidates >= corpus the result must
    // equal brute force, which DuckDB replays from the raw table
    // (codebooks/codes/tables never exist oracle-side)
    "vx3_vector_index_adc" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-vx3-$tag").toString
      val e = t(s, d, "embeddings")
      graft.operators.VectorIndex.build(e, "vec_id", "embedding", path,
        nlist = 8, pqM = 8)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopKAdc(q, path, k = 5,
          candidates = 10000000, nprobe = 8, idColName = "n_id")
        .orderBy("q_id", "rank")
    }),
    // vector-index upsert + delete lifecycle: every 10th vector is
    // UPDATED with a deterministic jitter (plus fresh ids appended),
    // every (id % 7 == 3) is tombstoned — including ids that were
    // JUST updated, so the delete must charge the upsert segment's
    // live version, not the masked original. Search probes every cell;
    // the oracle replays brute force over the last-wins-minus-deleted
    // corpus
    "vx2_vector_index_upsert" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-vx2-$tag").toString
      val e = t(s, d, "embeddings")
      graft.operators.VectorIndex.build(e, "vec_id", "embedding", path,
        nlist = 8)
      val updated = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            (x, i) => x + ((col("vec_id") * 31 + i * 7) % 5 - lit(2.0)) * 0.001)
            .as("embedding"))
      val fresh = e.filter(col("vec_id") < 3)
        .select((col("vec_id") + 500000).as("vec_id"),
          col("embedding").cast("array<double>").as("embedding"))
      graft.operators.VectorIndex.upsertDocs(updated.unionByName(fresh),
        "vec_id", "embedding", path)
      graft.operators.VectorIndex.deleteDocs(
        e.filter(col("vec_id") % 7 === 3).select("vec_id"), path)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 900000).as("q_id"),
          col("embedding").as("vec"))
      graft.operators.VectorIndex.searchTopK(q, path, k = 5, nprobe = 8,
          idColName = "n_id")
        .orderBy("q_id", "rank")
    }),
    // deterministic global shuffle (reproducible training order):
    // distributed two-phase ordinal assignment — the single-partition
    // window spelling is pinned OUT in PlanQualitySpec; DuckDB replays
    // the same md5 permutation with a plain window
    "sm5_shuffle" -> ((s, d) => {
      Sampling.deterministicShuffle(t(s, d, "customer"), "c_custkey",
          seed = 17)
        .select("c_custkey", "ordinal")
        .orderBy("c_custkey")
    }),
    // top-k token vocabulary with dense ids, (count desc, token) order
    "voc1_vocab" -> ((s, d) => {
      graft.operators.Vocabulary.build(t(s, d, "documents"), "text", k = 100)
        .orderBy("token_id")
    }),
    // sequence encoding against the vocab: (doc, pos, token_id), OOV
    // -1; the vocab broadcasts, the corpus never shuffles to encode
    "voc2_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Vocabulary.encodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text",
          graft.operators.Vocabulary.build(docs, "text", k = 100))
        .orderBy("doc_id", "pos")
    }),
    // DSIR importance resampling (Xie et al. NeurIPS'23): hashed
    // token-bucket histograms of target (doc_id % 7 == 0) vs raw,
    // smoothed log ratios broadcast onto the corpus, Gumbel top-n on
    // the portable md5 draw — DuckDB replays every bucket count,
    // every rounded ratio, every per-doc sum, and the sampling keys
    "ir1_dsir_sample" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Selection.dsirSample(docs,
          docs.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          n = 100, buckets = 512, seed = 23)
        .orderBy(col("skey").desc, col("doc_id"))
    }),
    // tokenizer-prep COMPOSITION: BPE piece counts (the real
    // context-window unit) feed the distributed prefix-sum packer —
    // train, segment-count, and pack in one flow; the oracle replays
    // the merge chain, the per-doc piece sums, AND the cumsum layout
    "pipe2_bpe_pack" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.Vocabulary
        .trainBpe(docs, "text", numMerges = 24)
      val counts = graft.operators.Vocabulary
        .bpeTokenCount(docs, "doc_id", "text", model)
      graft.operators.Packing
        .packByBudget(counts, "doc_id", "n_pieces", budget = 512)
        .orderBy("doc_id")
    }),
    // distributed full-corpus k-means (Lloyd): every iteration is one
    // broadcast-expression assignment scan + one map-side-combined
    // (cluster, dim) average, k x dim doubles to the driver; the
    // oracle replays init (smallest ids), every rounded distance,
    // every argmin tie, and every rounded centroid update
    "km1_kmeans" -> ((s, d) => {
      graft.operators.Clustering.kmeans(t(s, d, "embeddings"),
          "vec_id", "embedding", k = 5, iters = 3)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),
    // topic-balanced subset: km1's exact kmeans assignment, then every
    // cluster capped at 30 by the portable md5 draw (sm2's window) —
    // the cluster-then-prune diversity recipe as ONE call
    "qf5_cluster_capped" -> ((s, d) => {
      graft.operators.Clustering.clusterCappedSample(t(s, d, "embeddings"),
          "vec_id", "embedding", k = 5, iters = 3,
          capPerCluster = 30, seed = 11)
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),
    // content-defined chunking: boundaries where the md5 hash of the
    // 3-gram ending at a position divides 16 — edit-stable chunks
    // (FastCDC at token level); DuckDB replays every boundary, the
    // per-doc running chunk ids, and the re-assembled chunk text
    "cd1_content_chunks" -> ((s, d) => {
      graft.operators.Chunking.contentDefinedChunks(
          t(s, d, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", window = 3, divisor = 16)
        .orderBy("doc_id", "chunk_id")
    }),
    // curriculum-ordered shard export: ordinals follow (n_chars, id)
    // asc — the easy-to-hard training-order recipe — through the same
    // prefix-sum + manifest-committed layout as sh1
    "cu1_curriculum_shards" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-cu1-$tag")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(out)
      Sampling.exportShardsOrdered(
        t(s, d, "documents").select("doc_id", "n_chars", "text"),
        "doc_id", "n_chars", rowsPerShard = 100, out.toString)
      s.read.parquet(out.toString + "/data")
        .select(col("doc_id"), col("shard").cast("long").as("shard"),
          col("ordinal"))
        .orderBy("ordinal")
    }),
    // training-shard export: portable md5 permutation -> fixed-size
    // shard dirs + committed manifest; the gate round-trips the
    // EXPORTED files and DuckDB replays ordinal and shard assignment
    // for every row
    "sh1_export_shards" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val out = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-sh1-$tag")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(out)
      Sampling.exportShards(t(s, d, "customer"), "c_custkey",
        rowsPerShard = 100, seed = 17, out.toString)
      s.read.parquet(out.toString + "/data")
        .select(col("c_custkey"), col("shard").cast("long").as("shard"),
          col("ordinal"))
        .orderBy("ordinal")
    }),
    // MaxSim late-interaction rerank (ColBERT, SIGIR'20): stage 1 is
    // batch BM25 top-30 per query (the lexical first-stage
    // retriever), stage 2 rescores ONLY those candidates by
    // sum-over-query-tokens of max-over-doc-tokens cosine. Token
    // vectors are deterministic md5-derived 8-dim pseudo-embeddings
    // so DuckDB replays vectors, cosines, maxes, sums, and both rank
    // cuts literally
    "mv1_maxsim_rerank" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val dv = docs
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), mdTokVec(col("tok")).as("vec"))
      val qt = Seq((1L, 0L, "stream"), (1L, 1L, "filter"), (1L, 2L, "join"),
          (2L, 0L, "spark"), (2L, 1L, "hash"),
          (3L, 0L, "vector"), (3L, 1L, "spark"), (3L, 2L, "filter"))
        .toDF("q_id", "qpos", "tok")
      val qv = qt.select(col("q_id"), col("qpos"),
        mdTokVec(col("tok")).as("vec"))
      val qdefs = Seq(1L -> Seq("stream", "filter", "join"),
        2L -> Seq("spark", "hash"), 3L -> Seq("vector", "spark", "filter"))
      val cands = qdefs.map { case (q, terms) =>
        graft.operators.Ranking.bm25TopK(docs, "doc_id", "text", terms, 30)
          .select(lit(q).as("q_id"), col("doc_id"))
      }.reduce(_ unionByName _)
      graft.operators.Ranking.maxSimRerank(dv, qv, cands,
          "doc_id", "q_id", "qpos", "vec", k = 10)
        .orderBy("q_id", "rank")
    }),
    // the same late-interaction rerank served from the PERSISTENT
    // stack: candidates come from the segmented index's batch search
    // (searchTopKBatch top-30 per query ≡ scan BM25 top-30, pinned by
    // idx6), so the fused answer replays against mv1's exact oracle —
    // stale index stats or a batch-search drift break the reranking
    "mv2_maxsim_index_rerank" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-mv2-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      val queries = Seq(
        (1L, Seq("stream", "filter", "join")),
        (2L, Seq("spark", "hash")),
        (3L, Seq("vector", "spark", "filter"))).toDF("q_id", "terms")
      val cands = graft.operators.InvertedIndex.searchTopKBatch(
          queries, path, k = 30, idColName = "doc_id")
        .select("q_id", "doc_id")
      val dv = docs
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), mdTokVec(col("tok")).as("vec"))
      val qt = Seq((1L, 0L, "stream"), (1L, 1L, "filter"), (1L, 2L, "join"),
          (2L, 0L, "spark"), (2L, 1L, "hash"),
          (3L, 0L, "vector"), (3L, 1L, "spark"), (3L, 2L, "filter"))
        .toDF("q_id", "qpos", "tok")
      val qv = qt.select(col("q_id"), col("qpos"),
        mdTokVec(col("tok")).as("vec"))
      graft.operators.Ranking.maxSimRerank(dv, qv, cands,
          "doc_id", "q_id", "qpos", "vec", k = 10)
        .orderBy("q_id", "rank")
    }),
    // the ONE-CALL retrieve-then-rerank facade: mv2's hand-wired
    // batch-BM25 → MaxSim composition as a library face — same
    // fixture, same flat-replay oracle, so a drift anywhere in the
    // index-candidates + late-interaction stack misses
    "mv3_maxsim_served" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-mv3-$tag").toString
      val docs = t(s, d, "documents")
      graft.operators.InvertedIndex.build(docs, "doc_id", "text", path)
      val queries = Seq(
        (1L, Seq("stream", "filter", "join")),
        (2L, Seq("spark", "hash")),
        (3L, Seq("vector", "spark", "filter"))).toDF("q_id", "terms")
      val dv = docs
        .select(col("doc_id"),
          explode(graft.functions.TextAnalysis.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), mdTokVec(col("tok")).as("vec"))
      val qv = Seq((1L, 0L, "stream"), (1L, 1L, "filter"), (1L, 2L, "join"),
          (2L, 0L, "spark"), (2L, 1L, "hash"),
          (3L, 0L, "vector"), (3L, 1L, "spark"), (3L, 2L, "filter"))
        .toDF("q_id", "qpos", "tok")
        .select(col("q_id"), col("qpos"), mdTokVec(col("tok")).as("vec"))
      graft.operators.Serving.searchMaxSim(queries, path, dv, qv,
          k = 10, fetchK = 30, idColName = "doc_id")
        .orderBy("q_id", "rank")
    }),
    // distributed BPE training (Sennrich ACL'16): ONE corpus
    // word-count shuffle feeds a driver-side merge loop over the
    // Zipf-bounded dict (the IVF-quantizer discipline — train small
    // on the driver, apply distributed); the oracle replays all 24
    // merge iterations (adjacent-pair recount, (count desc, l, r)
    // argmax, two-space-separator replace) literally in DuckDB
    "bpe1_train_merges" -> ((s, d) => {
      graft.operators.Vocabulary
        .trainBpe(t(s, d, "documents"), "text", numMerges = 24)
        .toDF(s).orderBy("rank")
    }),
    // WordPiece TRAINING (BERT's tokenizer, the third leg next to
    // BPE and unigram): merges by the LIKELIHOOD score
    // count(lr)/(count(l)*count(r)) — the oracle replays all 12
    // iterations (pair AND symbol recounts, the double-ratio argmax
    // with (l, r) ties, the ##-stripping merge rewrite) literally
    "wp1_train" -> ((s, d) => {
      graft.operators.WordPiece
        .train(t(s, d, "documents"), "text", numMerges = 12)
        .toDF(s).orderBy("rank")
    }),
    // WordPiece ENCODING: greedy longest-match-first over the learned
    // vocabulary with the ## continuation convention, whole-word
    // [UNK] on any miss — run once per DISTINCT word as a pure Column
    // walk and broadcast back (the bpe2 corpus shape); the oracle
    // re-trains the chain and replays the greedy walk as a recursive
    // CTE
    "wp2_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.WordPiece.train(docs, "text",
        numMerges = 12)
      graft.operators.WordPiece.wordPieceEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", model)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // unigram-LM (SentencePiece-style) tokenizer TRAINING: seed from
    // frequent substrings, 2 Viterbi-EM rounds, prune to 60 pieces.
    // The oracle replays the whole walk — seeding cut, per-iteration
    // rhu-6dp scores, the unrolled DP with shortest-last-piece ties,
    // the singles add-one floor, the prune — as generated CTEs (the
    // bpe1/km1 discipline)
    "spm1_train" -> ((s, d) => {
      graft.operators.Unigram.trainUnigram(t(s, d, "documents"), "text")
        .toDF(s).orderBy("piece")
    }),
    // unigram ENCODING: Viterbi segmentation under the trained model,
    // run once per DISTINCT word as pure Column HOFs and broadcast
    // back (the bpe2 corpus shape); the oracle re-runs the final
    // model's DP over the word table and re-explodes the corpus
    "spm2_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.Unigram.trainUnigram(docs, "text")
      graft.operators.Unigram.unigramEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", model)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // SentencePiece .vocab interop (bpe4's role for the unigram side):
    // export the trained model in the piece<TAB>logprob spelling,
    // import it back, encode from the IMPORTED model — identical rows
    // to spm2 prove the format carries the exact Viterbi scores
    // (shortest round-trip double repr, bit-exact re-parse)
    "spm3_encode_spm_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val file = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-spm3-$tag.vocab")
      val model = graft.operators.Unigram.trainUnigram(docs, "text")
      graft.operators.Unigram.exportSpmVocabTxt(s, model, file.toString)
      val imported = graft.operators.Unigram.importSpmVocabTxt(
        s, file.toString)
      graft.operators.Unigram.unigramEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", imported)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // BPE encoding: the learned merges fold as chained codegen
    // `replace` over each DISTINCT word (Zipf-bounded), then the
    // segmentation broadcasts back onto the exploded corpus — the
    // corpus itself never shuffles to encode
    "bpe2_encode" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.Vocabulary
        .trainBpe(docs, "text", numMerges = 24)
      graft.operators.Vocabulary.bpeEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", model)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // the tokenizer-persistence round-trip: train, SAVE the committed
    // model artifact (merge table, _SUCCESS-markered), LOAD it back,
    // and encode from the LOADED model — train-once-encode-forever;
    // identical rows to bpe2 prove the artifact carries the exact
    // rank-ordered merge walk
    "bpe3_encode_loaded" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val mpath = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-bpe3-$tag").toString
      val model = graft.operators.Vocabulary
        .trainBpe(docs, "text", numMerges = 24)
      graft.operators.Vocabulary.saveBpeModel(s, model, mpath)
      val loaded = graft.operators.Vocabulary.loadBpeModel(s, mpath)
      graft.operators.Vocabulary.bpeEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", loaded)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // Hugging Face merges.txt interop: export the trained merge walk
    // in the HF BPE spelling, import it back, and encode from the
    // IMPORTED model — identical rows to bpe2 prove the interop
    // format carries the walk losslessly (the path for feeding a
    // corpus-trained tokenizer to a production stack, or encoding
    // under a production tokenizer's merges)
    "bpe4_encode_hf_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val file = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft-bpe4-$tag-merges.txt").toString
      val model = graft.operators.Vocabulary
        .trainBpe(docs, "text", numMerges = 24)
      graft.operators.Vocabulary.exportBpeMergesTxt(s, model, file)
      val imported = graft.operators.Vocabulary.importBpeMergesTxt(s, file)
      graft.operators.Vocabulary.bpeEncodeExploded(
          docs.filter(col("doc_id") < 50), "doc_id", "text", imported)
        .orderBy("doc_id", "pos", "piece_pos")
    }),
    // incremental NEAR-dup against a persistent LSH registry: batch 1
    // (even ids) registers its band index + shingle sets; batch 2
    // (odd ids) probes, exact-verifies, and must report exactly the
    // all-pairs cross-batch matches >= 0.8 that DuckDB recomputes
    // (the dd7 recall argument, across batches)
    "dd12_incremental_neardup" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val reg = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-dd12-$tag")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(reg)
      val docs = t(s, d, "documents")
      Dedup.nearDupAgainstRegistry(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", reg.toString)
      Dedup.nearDupAgainstRegistry(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", reg.toString)
        .select(col("doc_id"), col("reg_id"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_id", "reg_id")
    }),
    // incremental exact dedup against a persistent digest registry:
    // batch 1 (even ids) registers its digests; batch 2 (odd ids) must
    // drop everything batch 1 already saw plus its own in-batch dups.
    // The registry is wiped first so repeated runs are deterministic.
    "dd11_incremental_dedup" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val reg = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-dd11-$tag")
      def wipe(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(wipe)); f.delete(); ()
      }
      wipe(reg)
      val docs = t(s, d, "documents")
      Dedup.incrementalExactDedup(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", reg.toString)
      Dedup.incrementalExactDedup(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", reg.toString)
        .select("doc_id")
        .orderBy("doc_id")
    }),
    // matryoshka-truncated search: top-3 cosine neighbors over the
    // FIRST 16 of 64 dims — a 4x scan cut with no renormalization
    // needed (cosine divides by the truncated norms). DuckDB replays
    // the prefix arithmetic exactly.
    "emb3_matryoshka_topk" -> ((s, d) => {
      val base = t(s, d, "embeddings")
        .select(col("vec_id"), VectorOps.truncate(col("embedding"), 16).as("v"))
      val qs = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("v").as("q_v"))
      val scored = base.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos16",
          round(VectorExpressions.cosine(col("v"), col("q_v")), 6))
      // two-phase top-k: no corpus-sized single-partition-per-query sort
      Similarity.rankTopKPerQuery(scored, 3, "q_id", "vec_id", "cos16")
        .select(col("q_id"), col("rank"), col("vec_id").as("n_id"), col("cos16"))
        .orderBy("q_id", "rank")
    }),
    // document chunking: overlapping token windows (size 32, stride
    // 16) — the embedding/context-window preprocessing step. Pure
    // per-row explode over staged tokens, no shuffle; DuckDB replays
    // the chunk arithmetic exactly
    "chunk1_token_windows" -> ((s, d) => {
      graft.operators.Chunking.chunkByTokens(
          t(s, d, "documents"), "doc_id", "text",
          chunkSize = 32, stride = 16)
        .orderBy("doc_id", "chunk_no")
    }),
    // the flagship composition: exact dedup -> benchmark
    // decontamination -> quality floor -> leakage-safe split, ONE
    // declarative plan (no materialization between stages — Catalyst
    // sees the whole pipeline). Each stage is individually
    // oracle-proven (dd6 / dc1 / t1 / sm4); this gate proves they
    // COMPOSE, replaying the entire pipeline in DuckDB.
    "pipe1_corpus_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val deduped = Dedup.exactKeepFirst(docs, "doc_id", "text")
      val dirty = Decontam.contaminatedIds(docs, "doc_id", "text",
        docs.filter(col("doc_id") % 250 === 0), "text", n = 5)
      val clean = deduped.join(dirty, Seq("doc_id"), "left_anti")
      Sampling.groupSplit(
          clean.withColumn("n_tok", TextAnalysis.tokenCount(col("text")))
            .filter(col("n_tok") >= 5),
          "source", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          seed = 13)
        .filter(col("split") === "train")
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")
    }),
    // upsert ingest (the eland append-by-_id semantics on parquet):
    // replace-write the base table, upsert modified + brand-new rows,
    // re-read; the oracle recomputes the merge from the source
    "io4_upsert" -> ((s, d) => {
      import s.implicits._
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-io4-$tag").toString
      val src = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      graft.sources.Ingest.saveTable(src, path, "replace")
      val updates = src.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
        .unionByName(Seq(
          (9000001L, "upsert new a", 1.5), (9000002L, "upsert new b", 2.5))
          .toDF("c_custkey", "c_name", "c_acctbal"))
      graft.sources.Ingest.upsertTable(updates, path, "c_custkey")
      s.read.parquet(path).orderBy("c_custkey")
    }),
    // update_by_query at the table layer: predicate + column rewrite
    // applied through the crash-safe keyed upsert (only matching rows
    // recompute); the oracle replays the CASE rewrite over the source
    "io7_update_by_query" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-io7-$tag").toString
      val src = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      graft.sources.Ingest.saveTable(src, path, "replace")
      graft.sources.Ingest.updateWhere(s, path, "c_custkey",
        col("c_mktsegment") === "BUILDING" && col("c_acctbal") < 0,
        Map("c_acctbal" -> lit(0.0),
          "c_mktsegment" -> lit("BUILDING_RESET")))
      s.read.parquet(path).orderBy("c_custkey")
    }),
    // JSON sink round trip (eland to_json): write, re-read with an
    // explicit schema, oracle against the source rows
    "io2_json_roundtrip" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-io2-$tag").toString
      graft.api.GraftFrame(t(s, d, "orders"), "o_orderkey")
        .where(col("o_orderkey") <= 1000)
        .select(Seq("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
        .toJson(dir)
      s.read.schema(
          "o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE, " +
            "o_orderpriority STRING")
        .json(dir)
        .orderBy("o_orderkey")
    }),
    // ORC sink round trip: unlike CSV/JSON the schema travels with
    // the file, so the re-read needs no schema and the oracle proves
    // the types survive (parity-plus: the reference has no ORC sink)
    "io5_orc_roundtrip" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val dir = new java.io.File(
        System.getProperty("java.io.tmpdir"), s"graft-io5-$tag").toString
      graft.api.GraftFrame(t(s, d, "orders"), "o_orderkey")
        .where(col("o_orderkey") <= 1000)
        .select(Seq("o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority"))
        .toOrc(dir)
      s.read.orc(dir).orderBy("o_orderkey")
    })
  )

  private val toksSql =
    raw"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"

  /** t13/qf2's planted corpus: base docs plus, per doc_id % 40 = 0,
    * a duplicated-lines, a duplicated-paragraphs, and a doubled-token
    * variant (offsets clear of every SF's id range).
    */
  private def repetitionCorpus(docs: DataFrame): DataFrame = {
    val planted = docs.filter(col("doc_id") % 40 === 0)
    def variant(off: Int, sep: String) =
      planted.select((col("doc_id") + off).as("doc_id"),
        concat(col("text"), lit(sep), col("text")).as("text"))
    docs.select("doc_id", "text")
      .unionByName(variant(40000, "\n"))
      .unionByName(variant(50000, "\n\n"))
      .unionByName(variant(60000, " "))
  }

  private val repetitionCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 40000, text || chr(10) || text
      |  FROM documents WHERE doc_id % 40 = 0
      |UNION ALL SELECT doc_id + 50000, text || chr(10) || chr(10) || text
      |  FROM documents WHERE doc_id % 40 = 0
      |UNION ALL SELECT doc_id + 60000, text || ' ' || text
      |  FROM documents WHERE doc_id % 40 = 0""".stripMargin

  /** t14/qf4's planted corpus: base docs plus, per doc_id % 20 = 0, a
    * variant suffixed with all eight Gopher required stopwords.
    */
  private def qualityCorpus(docs: DataFrame): DataFrame =
    docs.select("doc_id", "text").unionByName(
      docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 70000).as("doc_id"),
          concat(col("text"),
            lit(" the be to of and that have with")).as("text")))

  private val qualityCorpusSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 70000, text || ' the be to of and that have with'
      |FROM documents WHERE doc_id % 20 = 0""".stripMargin

  /** The 7 Gopher quality signals as a `{p}sig` CTE chain FRAGMENT
    * (no leading WITH — composable; `p` prefixes every CTE name so
    * pipeline oracles can chain several signal families). Mirrors
    * graft.operators.QualityRules.withSignals signal for signal;
    * every fraction is one double division of exact integers.
    */
  private def qualitySigSql(corpusSql: String, p: String = ""): String =
    raw"""${p}corpus AS ($corpusSql),
         |${p}b AS (SELECT doc_id, text, $toksSql AS toks,
         |        list_filter(list_transform(
         |          regexp_split_to_array(text, '\r?\n'), x -> trim(x)),
         |          x -> x <> '') AS lns
         |      FROM ${p}corpus),
         |${p}sig AS (SELECT doc_id,
         |  CAST(len(toks) AS BIGINT) AS n_words,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
         |      / len(toks) ELSE 0.0 END AS mean_word_len,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST((length(text) - length(replace(text, '#', ''))) +
         |         (length(text) - length(replace(text, '...', ''))) // 3
         |      AS DOUBLE) / len(toks) ELSE 0.0 END AS symbol_word_ratio,
         |  CASE WHEN len(lns) > 0 THEN
         |    CAST(len(list_filter(lns, l -> substr(l, 1, 1) = '•' OR
         |           substr(l, 1, 1) = '*' OR substr(l, 1, 1) = '-'))
         |      AS DOUBLE) / len(lns) ELSE 0.0 END AS bullet_start_frac,
         |  CASE WHEN len(lns) > 0 THEN
         |    CAST(len(list_filter(lns, l -> l LIKE '%...' OR l LIKE '%…'))
         |      AS DOUBLE) / len(lns) ELSE 0.0 END AS ellipsis_end_frac,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(len(list_filter(toks, t -> regexp_matches(t, '\p{L}')))
         |      AS DOUBLE) / len(toks) ELSE 0.0 END AS alpha_word_frac,
         |  (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END +
         |   CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END
         |  )::BIGINT AS stop_hits
         |  FROM ${p}b)""".stripMargin

  /** The 13 Gopher repetition signals as a `{p}sig` CTE chain FRAGMENT
    * (no leading WITH, prefixable like qualitySigSql; mirrors
    * graft.operators.Repetition.withSignals signal for signal): unit
    * stats from (doc, unit) counts — sum(cnt-1) IS the sorted-
    * adjacency 2nd+ count — top runs by (cnt, cnt*len) row_number,
    * dup coverage as sum(cnt*glen) over cnt>=2. Every output is a
    * single double division of exact integers, so both engines land
    * on identical bits with no rounding.
    */
  private def repetitionSigSql(corpusSql: String, p: String = ""): String =
    raw"""${p}corpus AS ($corpusSql),
         |${p}base AS (SELECT doc_id, text, length(text) AS tlen,
         |                $toksSql AS toks FROM ${p}corpus),
         |${p}lu AS (SELECT doc_id, unnest(list_filter(list_transform(
         |         regexp_split_to_array(text, '\r?\n'), x -> trim(x)),
         |         x -> x <> '')) AS u FROM ${p}corpus),
         |${p}lc AS (SELECT doc_id, u, count(*) AS cnt, length(u) AS ulen
         |       FROM ${p}lu GROUP BY 1, 2),
         |${p}la AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS m,
         |              CAST(sum(cnt * ulen) AS DOUBLE) AS totc,
         |              CAST(sum(cnt - 1) AS DOUBLE) AS nd,
         |              CAST(sum((cnt - 1) * ulen) AS DOUBLE) AS dupc
         |       FROM ${p}lc GROUP BY 1),
         |${p}pu AS (SELECT doc_id, unnest(list_filter(list_transform(
         |         regexp_split_to_array(text, '\r?\n\s*\r?\n'),
         |         x -> trim(x)), x -> x <> '')) AS u FROM ${p}corpus),
         |${p}pc AS (SELECT doc_id, u, count(*) AS cnt, length(u) AS ulen
         |       FROM ${p}pu GROUP BY 1, 2),
         |${p}pa AS (SELECT doc_id, CAST(sum(cnt) AS DOUBLE) AS m,
         |              CAST(sum(cnt * ulen) AS DOUBLE) AS totc,
         |              CAST(sum(cnt - 1) AS DOUBLE) AS nd,
         |              CAST(sum((cnt - 1) * ulen) AS DOUBLE) AS dupc
         |       FROM ${p}pc GROUP BY 1),
         |${p}gu AS (SELECT doc_id, v.n, unnest(list_transform(
         |         range(1, len(toks) - v.n + 2),
         |         i -> array_to_string(toks[i:i + v.n - 1], ' '))) AS g
         |       FROM ${p}base, (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) v(n)
         |       WHERE len(toks) >= v.n),
         |${p}gc AS (SELECT doc_id, n, g, count(*) AS cnt, length(g) AS glen
         |       FROM ${p}gu GROUP BY 1, 2, 3),
         |${p}tops AS (SELECT doc_id, n, chars FROM
         |          (SELECT doc_id, n, cnt * glen AS chars,
         |             row_number() OVER (PARTITION BY doc_id, n
         |               ORDER BY cnt DESC, cnt * glen DESC) AS rn FROM ${p}gc)
         |         WHERE rn = 1),
         |${p}topp AS (SELECT doc_id,
         |           CAST(max(CASE WHEN n = 2 THEN chars END) AS DOUBLE) AS t2,
         |           CAST(max(CASE WHEN n = 3 THEN chars END) AS DOUBLE) AS t3,
         |           CAST(max(CASE WHEN n = 4 THEN chars END) AS DOUBLE) AS t4
         |         FROM ${p}tops GROUP BY 1),
         |${p}dgc AS (SELECT doc_id, n, CAST(sum(cnt * glen) AS DOUBLE) AS chars
         |        FROM ${p}gc WHERE cnt >= 2 GROUP BY 1, 2),
         |${p}dupp AS (SELECT doc_id,
         |           max(CASE WHEN n = 5 THEN chars END) AS d5,
         |           max(CASE WHEN n = 6 THEN chars END) AS d6,
         |           max(CASE WHEN n = 7 THEN chars END) AS d7,
         |           max(CASE WHEN n = 8 THEN chars END) AS d8,
         |           max(CASE WHEN n = 9 THEN chars END) AS d9,
         |           max(CASE WHEN n = 10 THEN chars END) AS d10
         |         FROM ${p}dgc GROUP BY 1),
         |${p}sig AS (SELECT b.doc_id,
         |  coalesce(la.nd / la.m, 0.0) AS dup_line_frac,
         |  coalesce(pa.nd / pa.m, 0.0) AS dup_para_frac,
         |  coalesce(la.dupc / la.totc, 0.0) AS dup_line_char_frac,
         |  coalesce(pa.dupc / pa.totc, 0.0) AS dup_para_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(t.t2 / b.tlen, 0.0)
         |       ELSE 0.0 END AS top_2gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(t.t3 / b.tlen, 0.0)
         |       ELSE 0.0 END AS top_3gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(t.t4 / b.tlen, 0.0)
         |       ELSE 0.0 END AS top_4gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d5 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_5gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d6 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_6gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d7 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_7gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d8 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_8gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d9 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_9gram_char_frac,
         |  CASE WHEN b.tlen > 0 THEN coalesce(dp.d10 / b.tlen, 0.0)
         |       ELSE 0.0 END AS dup_10gram_char_frac
         |  FROM ${p}base b
         |  LEFT JOIN ${p}la la ON la.doc_id = b.doc_id
         |  LEFT JOIN ${p}pa pa ON pa.doc_id = b.doc_id
         |  LEFT JOIN ${p}topp t ON t.doc_id = b.doc_id
         |  LEFT JOIN ${p}dupp dp ON dp.doc_id = b.doc_id)""".stripMargin

  /** Deterministic md5-derived 8-dim pseudo token vector (mv1/mv2's
    * replayable fixture — the API takes any real vector column).
    */
  private def mdTokVec(tok: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    array((0 until 8).map { j =>
      (conv(substring(md5(concat(tok, lit(":" + j))), 1, 8), 16, 10)
        .cast("long") % 2000L).cast("double") / lit(1000.0) - lit(1.0)
    }: _*)

  /** Generated K-iteration BPE-training replay (mirrors
    * `Vocabulary.trainBpe`'s determinism contract): a CTE chain where
    * iteration i recounts adjacent symbol pairs over word state s{i},
    * picks the (count desc, l, r) argmax, and applies the merge with
    * the SAME two-space-separator replace the trainer uses — so
    * DuckDB walks the identical merge sequence. Appends CTEs w, s0,
    * then (p_i, m_i, s_{i+1}) per iteration; callers add the final
    * SELECT over m_* (merge table) or s{K} (segmentations).
    */
  private def bpeChainSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      raw"""WITH w AS MATERIALIZED (
           |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest($toksSql) AS t FROM documents)
           |  GROUP BY 1),
           |s0 AS MATERIALIZED (SELECT word,
           |  ' ' || array_to_string(list_transform(
           |    range(1, length(word) + 1), i -> word[i]), '  ') || ' ' AS s,
           |  freq FROM w)""".stripMargin)
    for (i <- 0 until numMerges) {
      sb.append(
        raw""",
             |p$i AS MATERIALIZED (SELECT syms[j] AS l, syms[j+1] AS r, sum(freq) AS c
             |  FROM (SELECT unnest(range(1, len(syms))) AS j, syms, freq
             |        FROM (SELECT string_split(trim(s), '  ') AS syms, freq
             |              FROM s$i))
             |  GROUP BY 1, 2),
             |m$i AS MATERIALIZED (SELECT l, r FROM p$i ORDER BY c DESC, l, r LIMIT 1),
             |s${i + 1} AS MATERIALIZED (SELECT word,
             |  CASE WHEN m.l IS NULL THEN s
             |       ELSE replace(s, ' ' || m.l || '  ' || m.r || ' ',
             |                    ' ' || m.l || m.r || ' ') END AS s,
             |  freq FROM s$i LEFT JOIN m$i m ON TRUE)""".stripMargin)
    }
    sb.toString
  }
  /** Generated K-iteration WordPiece-training replay (mirrors
    * `WordPiece.train`'s determinism contract — the bpeChainSql
    * discipline with the LIKELIHOOD argmax): iteration i recounts
    * adjacent pairs AND symbol occurrences over word state s{i},
    * picks the pair maximizing CAST(c AS DOUBLE) ∕ (cl · cr) (ties
    * (l, r) asc), and applies the merge (l + r-without-##) with the
    * same two-space replace. Appends CTEs w, s0, alpha, then
    * (y_i, u_i, p_i, m_i, s_{i+1}) per iteration; callers add the
    * final SELECT over alpha + the m_i merge outputs (wp1) or hand
    * the final vocab to the greedy-walk encode (wp2).
    */
  private def wpChainSql(numMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      raw"""w AS MATERIALIZED (
           |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
           |  FROM (SELECT unnest($toksSql) AS t FROM documents)
           |  GROUP BY 1),
           |s0 AS MATERIALIZED (SELECT word,
           |  ' ' || word[1] || CASE WHEN length(word) > 1
           |    THEN '  ' || array_to_string(list_transform(
           |      range(2, length(word) + 1), i -> '##' || word[i]), '  ')
           |    ELSE '' END || ' ' AS s,
           |  freq FROM w),
           |alpha AS MATERIALIZED (SELECT DISTINCT sym FROM
           |  (SELECT unnest(string_split(trim(s), '  ')) AS sym FROM s0))"""
        .stripMargin)
    for (i <- 0 until numMerges) {
      sb.append(
        raw""",
             |y$i AS MATERIALIZED (SELECT string_split(trim(s), '  ') AS syms,
             |  freq FROM s$i),
             |u$i AS MATERIALIZED (SELECT sym, sum(freq) AS c
             |  FROM (SELECT unnest(syms) AS sym, freq FROM y$i)
             |  GROUP BY 1),
             |p$i AS MATERIALIZED (SELECT syms[j] AS l, syms[j+1] AS r,
             |    sum(freq) AS c
             |  FROM (SELECT unnest(range(1, len(syms))) AS j, syms, freq
             |        FROM y$i)
             |  GROUP BY 1, 2),
             |m$i AS MATERIALIZED (SELECT p.l, p.r,
             |    p.l || CASE WHEN starts_with(p.r, '##')
             |                THEN p.r[3:] ELSE p.r END AS nw
             |  FROM p$i p
             |  JOIN u$i ul ON ul.sym = p.l
             |  JOIN u$i ur ON ur.sym = p.r
             |  ORDER BY CAST(p.c AS DOUBLE) /
             |    (CAST(ul.c AS DOUBLE) * CAST(ur.c AS DOUBLE)) DESC,
             |    p.l, p.r LIMIT 1),
             |s${i + 1} AS MATERIALIZED (SELECT word,
             |  CASE WHEN m.l IS NULL THEN s
             |       ELSE replace(s, ' ' || m.l || '  ' || m.r || ' ',
             |                    ' ' || m.nw || ' ') END AS s,
             |  freq FROM s$i LEFT JOIN m$i m ON TRUE)""".stripMargin)
    }
    // the deterministic vocab: alphabet sorted, then merges in order
    sb.append(
      raw""",
           |wpvocab AS MATERIALIZED (
           |  SELECT CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT)
           |    AS rank, sym AS piece FROM alpha
           |  UNION ALL
           |  SELECT (SELECT count(*) FROM alpha) + mi AS rank, nw FROM (
           |${(0 until numMerges).map(i =>
               s"    SELECT CAST($i AS BIGINT) AS mi, nw FROM m$i")
             .mkString("\n    UNION ALL\n")}
           |  ))""".stripMargin)
    sb.toString
  }

  /** The greedy longest-match walk of `WordPiece.wordPieceSegment`
    * replayed as a RECURSIVE CTE over `wpvocab` (the per-distinct-word
    * shape), then re-exploded onto the corpus — wp2's tail. A state
    * advances by the longest vocabulary piece matching at `pos`
    * (`##`-stripped length consumed; at most one piece per consumed
    * length can match, so arg_max is total); no match fails the whole
    * word to ['[UNK]'] (the Hugging Face behavior).
    */
  private def wpEncodeTailSql: String =
    raw""",
         |words AS MATERIALIZED (SELECT DISTINCT t AS word
         |  FROM (SELECT unnest($toksSql) AS t FROM documents
         |        WHERE doc_id < 50)),
         |seg AS (
         |  SELECT word, length(word) AS n, 1 AS pos,
         |    CAST([] AS VARCHAR[]) AS pieces, FALSE AS failed
         |  FROM words
         |  UNION ALL
         |  SELECT word, n,
         |    CASE WHEN cp IS NULL THEN pos ELSE pos + clen END AS pos,
         |    CASE WHEN cp IS NULL THEN pieces
         |         ELSE list_append(pieces, cp) END AS pieces,
         |    cp IS NULL AS failed
         |  FROM (
         |    SELECT s.word, s.n, s.pos, s.pieces,
         |      max(length(v.piece) -
         |        CASE WHEN starts_with(v.piece, '##') THEN 2 ELSE 0 END)
         |        AS clen,
         |      arg_max(v.piece, length(v.piece) -
         |        CASE WHEN starts_with(v.piece, '##') THEN 2 ELSE 0 END)
         |        AS cp
         |    FROM seg s LEFT JOIN wpvocab v ON
         |      CASE WHEN s.pos = 1 THEN NOT starts_with(v.piece, '##')
         |           ELSE starts_with(v.piece, '##') END
         |      AND length(v.piece) -
         |        CASE WHEN starts_with(v.piece, '##') THEN 2 ELSE 0 END
         |        BETWEEN 1 AND s.n - s.pos + 1
         |      AND (CASE WHEN starts_with(v.piece, '##')
         |                THEN v.piece[3:] ELSE v.piece END) =
         |          s.word[s.pos : s.pos + length(v.piece) -
         |            CASE WHEN starts_with(v.piece, '##')
         |                 THEN 2 ELSE 0 END - 1]
         |    WHERE NOT s.failed AND s.pos <= s.n
         |    GROUP BY s.word, s.n, s.pos, s.pieces)),
         |term AS (SELECT word,
         |    CASE WHEN failed THEN ['[UNK]'] ELSE pieces END AS pieces
         |  FROM seg WHERE failed OR pos > n),
         |toks0 AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS p
         |  FROM (SELECT doc_id, $toksSql AS tk FROM documents
         |        WHERE doc_id < 50)),
         |toks AS (SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
         |    tk[CAST(p AS INT)] AS t FROM toks0),
         |ex0 AS (SELECT doc_id, pos, pieces,
         |    unnest(range(1, len(pieces) + 1)) AS i
         |  FROM toks JOIN term ON term.word = toks.t)
         |SELECT doc_id, pos, CAST(i - 1 AS BIGINT) AS piece_pos,
         |  pieces[CAST(i AS INT)] AS piece
         |FROM ex0 ORDER BY doc_id, pos, piece_pos""".stripMargin

  /** Generated Viterbi-EM replay of [[graft.operators.Unigram]]'s
    * determinism contract (the bpeChainSql discipline applied to the
    * unigram trainer): seed = all single code points + top-`seedSize`
    * substrings, then per EM iteration a score table (rhu-6dp ln of
    * cnt/total), an UNROLLED per-position Viterbi DP (maxJ steps, each
    * a 4-way vocab join picking max score / shortest-last-piece ties),
    * an unrolled backtrace, and the recount with the singles' add-one
    * floor. `withEncode` appends a final-model DP/backtrace + the
    * corpus explode (bpeEncodeSql's tail) for spm2.
    */
  private def spmChainSql(vocabSize: Int, maxPieceLen: Int, iters: Int,
                          seedSize: Int, maxJ: Int,
                          withEncode: Boolean): String = {
    val sb = new StringBuilder
    def dpChain(sc: String, pfx: String): Unit = {
      sb.append(raw""",
        |${pfx}0 AS MATERIALIZED (SELECT word, freq, n,
        |  [CAST(0.0 AS DOUBLE)] AS vs, [0] AS bls FROM wc, chk)""".stripMargin)
      for (j <- 1 to maxJ) {
        val cands = (1 to maxPieceLen).map { l =>
          val vIdx = s"greatest(${j - l + 1}, 1)"
          if (l == 1)
            s"{v: d0.vs[$j] + coalesce(s1.s, CAST(-100.0 AS DOUBLE)), l: 1}"
          else
            s"CASE WHEN $j >= $l AND s$l.s IS NOT NULL " +
              s"THEN {v: d0.vs[$vIdx] + s$l.s, l: $l} END"
        }.mkString(",\n        ")
        val joins = (1 to maxPieceLen).map { l =>
          if (l == 1) s"LEFT JOIN $sc s1 ON s1.piece = d0.word[$j:$j]"
          else s"LEFT JOIN $sc s$l ON $j >= $l AND " +
            s"s$l.piece = d0.word[${j - l + 1}:$j]"
        }.mkString("\n    ")
        sb.append(raw""",
          |$pfx$j AS MATERIALIZED (
          |  SELECT word, freq, n,
          |    CASE WHEN $j > n THEN vs
          |         ELSE list_append(vs, list_max([c.v FOR c IN cand])) END
          |      AS vs,
          |    CASE WHEN $j > n THEN bls
          |         ELSE list_append(bls, list_min([c.l FOR c IN cand
          |                IF c.v = list_max([x.v FOR x IN cand])])) END
          |      AS bls
          |  FROM (
          |    SELECT d0.word, d0.freq, d0.n, d0.vs, d0.bls,
          |      [c FOR c IN [
          |        $cands
          |      ] IF c IS NOT NULL] AS cand
          |    FROM $pfx${j - 1} d0
          |    $joins
          |  ))""".stripMargin)
      }
    }
    def btChain(dTable: String, pfx: String): Unit = {
      sb.append(raw""",
        |${pfx}0 AS MATERIALIZED (SELECT word, freq, n AS j,
        |  CAST([] AS VARCHAR[]) AS ps, bls FROM $dTable)""".stripMargin)
      for (m <- 1 to maxJ) {
        sb.append(raw""",
          |$pfx$m AS MATERIALIZED (
          |  SELECT word, freq,
          |    CASE WHEN j > 0 THEN j - bls[j + 1] ELSE j END AS j,
          |    CASE WHEN j > 0
          |         THEN list_prepend(word[j - bls[j + 1] + 1 : j], ps)
          |         ELSE ps END AS ps,
          |    bls
          |  FROM $pfx${m - 1})""".stripMargin)
      }
    }
    sb.append(raw"""WITH w AS MATERIALIZED (
      |  SELECT t AS word, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest($toksSql) AS t FROM documents) GROUP BY 1),
      |wc AS MATERIALIZED (SELECT word, freq, length(word) AS n FROM w),
      |chk AS MATERIALIZED (
      |  SELECT CASE WHEN max(n) > $maxJ THEN error(
      |    'spm oracle: corpus word exceeds the unrolled DP depth $maxJ'
      |  ) ELSE 0 END AS ok FROM wc),
      |sub AS MATERIALIZED (
      |  SELECT word, freq, l, word[i:i+l-1] AS piece
      |  FROM (SELECT word, freq, n, unnest(range(1, n + 1)) AS i FROM wc),
      |       (SELECT unnest(range(1, ${maxPieceLen + 1})) AS l)
      |  WHERE i + l - 1 <= n),
      |singles AS MATERIALIZED (
      |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
      |  FROM sub WHERE l = 1 GROUP BY 1),
      |v0 AS MATERIALIZED (
      |  SELECT piece, cnt FROM singles
      |  UNION ALL
      |  SELECT piece, cnt FROM (
      |    SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
      |    FROM sub WHERE l > 1 GROUP BY 1
      |    ORDER BY cnt DESC, piece LIMIT $seedSize))""".stripMargin)
    for (k <- 0 until iters) {
      sb.append(raw""",
        |t$k AS MATERIALIZED (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM v$k),
        |sc$k AS MATERIALIZED (SELECT piece,
        |    floor(ln(CAST(cnt AS DOUBLE) / t) * 1000000 + 0.5) / 1000000 AS s
        |  FROM v$k, t$k)""".stripMargin)
      dpChain(s"sc$k", s"d${k}_")
      btChain(s"d${k}_$maxJ", s"b${k}_")
      sb.append(raw""",
        |pc$k AS MATERIALIZED (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT freq, unnest(ps) AS piece FROM b${k}_$maxJ)
        |  GROUP BY 1),
        |v${k + 1} AS MATERIALIZED (
        |  SELECT s.piece, coalesce(pc.cnt, CAST(0 AS BIGINT)) + 1 AS cnt
        |  FROM singles s LEFT JOIN pc$k pc USING (piece)
        |  UNION ALL
        |  SELECT piece, cnt FROM pc$k WHERE length(piece) > 1)""".stripMargin)
    }
    sb.append(raw""",
      |nsing AS MATERIALIZED (SELECT count(*) AS ns FROM singles),
      |keepm AS MATERIALIZED (SELECT piece, cnt FROM (
      |    SELECT piece, cnt,
      |      row_number() OVER (ORDER BY cnt DESC, piece) AS rn
      |    FROM v$iters WHERE length(piece) > 1), nsing
      |  WHERE rn <= $vocabSize - ns),
      |fin AS MATERIALIZED (
      |  SELECT piece, cnt FROM v$iters WHERE length(piece) = 1
      |  UNION ALL SELECT piece, cnt FROM keepm),
      |tfin AS MATERIALIZED (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM fin)"""
      .stripMargin)
    if (!withEncode) {
      sb.append(raw"""
        |SELECT piece, cnt,
        |  floor(ln(CAST(cnt AS DOUBLE) / t) * 1000000 + 0.5) / 1000000
        |    AS logp
        |FROM fin, tfin ORDER BY piece""".stripMargin)
    } else {
      sb.append(raw""",
        |scF AS MATERIALIZED (SELECT piece,
        |    floor(ln(CAST(cnt AS DOUBLE) / t) * 1000000 + 0.5) / 1000000 AS s
        |  FROM fin, tfin)""".stripMargin)
      dpChain("scF", "e_")
      btChain(s"e_$maxJ", "f_")
      sb.append(raw""",
        |seg AS MATERIALIZED (SELECT word, ps AS pieces FROM f_$maxJ),
        |tok AS (SELECT doc_id, unnest($toksSql) AS t,
        |          generate_subscripts($toksSql, 1) AS pos
        |        FROM documents WHERE doc_id < 50)
        |SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
        |       CAST(pp - 1 AS BIGINT) AS piece_pos, piece
        |FROM (SELECT doc_id, pos, unnest(pieces) AS piece,
        |             generate_subscripts(pieces, 1) AS pp
        |      FROM tok JOIN seg ON tok.t = seg.word)
        |ORDER BY doc_id, pos, piece_pos""".stripMargin)
    }
    sb.toString
  }

  /** Generated Lloyd-iteration replay (mirrors `Clustering.kmeansFit`'s
    * determinism contract): c0 = the k smallest-id vectors; iteration i
    * assigns by rounded −2·v·c + ‖c‖² with smallest-cluster ties, then
    * recomputes per-dim averages rounded to 6 dp (empty clusters keep
    * their centroid). Callers append the final assignment over
    * c{iters}.
    */
  private def kmeansChainSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      raw"""WITH pts AS MATERIALIZED (
           |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |c0 AS MATERIALIZED (
           |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
           |           AS cl, v AS c
           |  FROM (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT $k))"""
        .stripMargin)
    for (i <- 0 until iters) {
      sb.append(
        raw""",
             |d$i AS MATERIALIZED (SELECT p.vec_id, c.cl,
             |    round(-2 * list_dot_product(p.v, c.c) +
             |          list_dot_product(c.c, c.c), 6) AS d
             |  FROM pts p, c$i c),
             |a$i AS MATERIALIZED (SELECT vec_id, cl FROM (
             |    SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id
             |      ORDER BY d, cl) AS rk FROM d$i) WHERE rk = 1),
             |m$i AS MATERIALIZED (SELECT cl, list(xr ORDER BY dim) AS c
             |  FROM (
             |    SELECT cl, dim, round(avg(x), 6) AS xr FROM (
             |      SELECT a.cl, generate_subscripts(p.v, 1) AS dim,
             |             unnest(p.v) AS x
             |      FROM a$i a JOIN pts p USING (vec_id))
             |    GROUP BY cl, dim) GROUP BY cl),
             |c${i + 1} AS MATERIALIZED (SELECT o.cl, coalesce(m.c, o.c) AS c
             |  FROM c$i o LEFT JOIN m$i m USING (cl))""".stripMargin)
    }
    sb.toString
  }

  /** Word n-gram SQL for any n (mirrors TextAnalysis.shingles). */
  private def shinglesSqlN(n: Int): String =
    raw"""CASE WHEN len($toksSql) >= $n
         | THEN list_distinct(list_transform(range(1, len($toksSql) - ${n - 2}),
         |        i -> array_to_string(($toksSql)[i:i+${n - 1}], ' ')))
         | ELSE [] END""".stripMargin
  private val shinglesSql = shinglesSqlN(3)

  /** The sequential 4-batch near-dup replay shared by st5 and st8:
    * clean_k = batch k minus its matches against clean_0..k-1;
    * matches accumulate across batches. Delivery discipline (append
    * vs committed per-batch dirs) does not change which rows match.
    */
  /** rag1's end-to-end replay — chunk windows, the md5 stub per
    * dimension (float-quantized), cosine and the rank cut — shared
    * verbatim by sx1: the persistent semantic index at full probing
    * must land on the ad-hoc path's exact answer.
    */
  private lazy val semanticSearchReplaySql: String =
    raw"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents
         |           WHERE doc_id < 200),
         |c AS (SELECT doc_id, toks,
         |        CAST(ceil(greatest(len(toks) - 16, 0) / 8.0) AS INT)
         |          + 1 AS nch
         |      FROM b),
         |e AS (SELECT doc_id, toks,
         |        unnest(generate_series(0, nch - 1)) AS i FROM c),
         |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
         |         array_to_string(toks[i*8+1 : i*8+16], ' ')
         |           AS chunk_text
         |       FROM e),
         |emb AS (SELECT doc_id, chunk_no, chunk_text,
         |          list_transform(range(0, 8), dd ->
         |            CAST(CAST((('0x' || substr(md5(CAST(dd AS VARCHAR)
         |                || ':' || chunk_text), 1, 8))::BIGINT % 2000)
         |              AS DOUBLE) / 1000.0 - 1.0 AS FLOAT)) AS v
         |        FROM ch),
         |q AS (SELECT list_transform(range(0, 8), dd ->
         |        CAST(CAST((('0x' || substr(md5(CAST(dd AS VARCHAR)
         |            || ':stream filter merge'), 1, 8))::BIGINT % 2000)
         |          AS DOUBLE) / 1000.0 - 1.0 AS FLOAT)) AS qv),
         |sc AS (SELECT doc_id, chunk_no, chunk_text,
         |         round(list_dot_product(v::DOUBLE[], qv::DOUBLE[]) /
         |           (sqrt(list_dot_product(v::DOUBLE[], v::DOUBLE[])) *
         |            sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))),
         |           6) AS score
         |       FROM emb, q),
         |f AS (SELECT * FROM sc
         |      ORDER BY score DESC, doc_id, chunk_no LIMIT 12)
         |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id,
         |         chunk_no) AS BIGINT) AS rank,
         |       doc_id, chunk_no, chunk_text, score
         |FROM f ORDER BY rank""".stripMargin

  private lazy val seqNearDupReplaySql: String =
    raw"""WITH u AS (SELECT doc_id, text FROM documents
         |           UNION ALL
         |           SELECT doc_id + 10001, text FROM documents
         |           WHERE doc_id < 100),
         |v AS (SELECT doc_id, CAST(doc_id % 4 AS INT) AS b,
         |             $shinglesSql AS sh
         |      FROM u),
         |s AS (SELECT doc_id, b, sh FROM v WHERE len(sh) > 0),
         |c0 AS (SELECT doc_id, sh FROM s WHERE b = 0),
         |j1 AS (SELECT a.doc_id, r.doc_id AS reg_id,
         |         CAST(len(list_intersect(a.sh, r.sh)) AS DOUBLE) /
         |         (len(a.sh) + len(r.sh) -
         |          len(list_intersect(a.sh, r.sh))) AS jx
         |       FROM s a JOIN c0 r ON a.b = 1),
         |m1 AS (SELECT * FROM j1 WHERE jx >= 0.8),
         |c1 AS (SELECT doc_id, sh FROM s WHERE b = 1
         |       AND doc_id NOT IN (SELECT doc_id FROM m1)),
         |r1 AS (SELECT * FROM c0 UNION ALL SELECT * FROM c1),
         |j2 AS (SELECT a.doc_id, r.doc_id AS reg_id,
         |         CAST(len(list_intersect(a.sh, r.sh)) AS DOUBLE) /
         |         (len(a.sh) + len(r.sh) -
         |          len(list_intersect(a.sh, r.sh))) AS jx
         |       FROM s a JOIN r1 r ON a.b = 2),
         |m2 AS (SELECT * FROM j2 WHERE jx >= 0.8),
         |c2 AS (SELECT doc_id, sh FROM s WHERE b = 2
         |       AND doc_id NOT IN (SELECT doc_id FROM m2)),
         |r2 AS (SELECT * FROM r1 UNION ALL SELECT * FROM c2),
         |j3 AS (SELECT a.doc_id, r.doc_id AS reg_id,
         |         CAST(len(list_intersect(a.sh, r.sh)) AS DOUBLE) /
         |         (len(a.sh) + len(r.sh) -
         |          len(list_intersect(a.sh, r.sh))) AS jx
         |       FROM s a JOIN r2 r ON a.b = 3),
         |m3 AS (SELECT * FROM j3 WHERE jx >= 0.8),
         |allm AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2
         |         UNION ALL SELECT * FROM m3)
         |SELECT doc_id, reg_id, round(jx, 6) AS jaccard
         |FROM allm ORDER BY doc_id, reg_id""".stripMargin

  /** Shared by hy1 (scan stack) and hy2 (persistent-index stack):
    * index ≡ scan is pinned by idx1/vx1, so both hybrids replay to
    * the same flat BM25 + brute-cosine + RRF arithmetic. */
  private val hybridRrfSql =
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |lex AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 30)),
           |q AS (SELECT list_transform(range(0, 64),
           |        i -> CAST((i*7) % 13 - 6 AS DOUBLE)/10.0) AS v),
           |sem0 AS (SELECT vec_id AS doc_id,
           |           round(list_dot_product(embedding::DOUBLE[], q.v) /
           |             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
           |              sqrt(list_dot_product(q.v, q.v))), 6) AS cos
           |         FROM embeddings, q),
           |sem AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
           |        FROM (SELECT * FROM sem0 ORDER BY cos DESC, doc_id LIMIT 30)),
           |u AS (SELECT doc_id, 1.0/(60 + rank) AS c FROM lex
           |      UNION ALL SELECT doc_id, 1.0/(60 + rank) AS c FROM sem)
           |SELECT doc_id, round(sum(c), 6) AS rrf_score FROM u GROUP BY doc_id
           |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin

  /** Shared by mv1 (scan-BM25 candidates) and mv2 (persistent-index
    * batch-search candidates): batch index BM25 top-30 ≡ scan BM25
    * top-30 (pinned by idx6), so both rerank paths replay to the same
    * candidates + vectors + maxes + sums + rank cuts. */
  private val maxSimRerankSql: String = {
      val vec = (t: String) =>
        raw"""list_transform(range(0, 8), j ->
             |  CAST(('0x' || substr(md5($t || ':' || j), 1, 8))::BIGINT
             |       % 2000 AS DOUBLE) / 1000.0 - 1.0)""".stripMargin
      raw"""WITH qt AS (SELECT CAST(q AS BIGINT) AS q_id,
           |              CAST(p AS BIGINT) AS qpos, t
           |            FROM (VALUES (1,0,'stream'),(1,1,'filter'),
           |              (1,2,'join'),(2,0,'spark'),(2,1,'hash'),
           |              (3,0,'vector'),(3,1,'spark'),(3,2,'filter'))
           |              AS v(q,p,t)),
           |s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |sc AS (SELECT q.q_id, f.doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf *
           |           (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |           AS score
           |       FROM tf f JOIN dft USING (t)
           |            JOIN (SELECT DISTINCT q_id, t FROM qt) q USING (t), st
           |       GROUP BY 1, 2),
           |cand AS (SELECT q_id, doc_id FROM (SELECT q_id, doc_id,
           |           row_number() OVER (PARTITION BY q_id
           |             ORDER BY score DESC, doc_id) AS rk FROM sc)
           |         WHERE rk <= 30),
           |dvec AS (SELECT doc_id, ${vec("t")} AS v
           |         FROM (SELECT doc_id, unnest(toks) AS t FROM s)),
           |qvec AS (SELECT q_id, qpos, ${vec("t")} AS v FROM qt),
           |pr AS (SELECT c.q_id, c.doc_id, q.qpos,
           |         round(list_dot_product(d.v, q.v) /
           |           (sqrt(list_dot_product(d.v, d.v)) *
           |            sqrt(list_dot_product(q.v, q.v))), 6) AS cos
           |       FROM cand c JOIN dvec d ON c.doc_id = d.doc_id
           |            JOIN qvec q ON c.q_id = q.q_id),
           |mx AS (SELECT q_id, doc_id, qpos, max(cos) AS m
           |       FROM pr GROUP BY 1, 2, 3),
           |ms AS (SELECT q_id, doc_id, round(sum(m), 6) AS maxsim
           |       FROM mx GROUP BY 1, 2),
           |r AS (SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY maxsim DESC, doc_id) AS BIGINT) AS rank,
           |         doc_id, maxsim FROM ms)
           |SELECT q_id, rank, doc_id, maxsim FROM r WHERE rank <= 10
           |ORDER BY q_id, rank""".stripMargin
    }

  /** Shared by bpe2 (in-memory model) and bpe3 (save/load round-trip):
    * both encode doc_id < 50 from the same 24-merge walk.
    */
  private val bpeEncodeSql: String = {
    val k = 24
    bpeChainSql(k) +
      raw""",
           |seg AS (SELECT word, string_split(trim(s), '  ') AS pieces
           |        FROM s$k),
           |tok AS (SELECT doc_id, unnest($toksSql) AS t,
           |          generate_subscripts($toksSql, 1) AS pos
           |        FROM documents WHERE doc_id < 50)
           |SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
           |       CAST(pp - 1 AS BIGINT) AS piece_pos, piece
           |FROM (SELECT doc_id, pos, unnest(pieces) AS piece,
           |             generate_subscripts(pieces, 1) AS pp
           |      FROM tok JOIN seg ON tok.t = seg.word)
           |ORDER BY doc_id, pos, piece_pos""".stripMargin
  }

  /** Shared by hy4 (scan stack) and hy5 (persistent-index stack via
    * the facade): index ≡ scan is pinned by idx1/idx6/vx1, so both
    * replay to the same flat BM25 + brute-cosine + per-leg min-max +
    * 0.7/0.3 weighted-sum arithmetic (degenerate range → 1.0).
    */
  private val hybridLinearSql =
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |lexk AS (SELECT doc_id, score FROM bm
           |         ORDER BY score DESC, doc_id LIMIT 30),
           |lmm AS (SELECT min(score) AS mn, max(score) AS mx FROM lexk),
           |lc AS (SELECT doc_id,
           |         (CASE WHEN mx = mn THEN 1.0
           |               ELSE (score - mn) / (mx - mn) END) * 0.7 AS c
           |       FROM lexk, lmm),
           |q AS (SELECT list_transform(range(0, 64),
           |        i -> CAST((i*7) % 13 - 6 AS DOUBLE)/10.0) AS v),
           |sem0 AS (SELECT vec_id AS doc_id,
           |           round(list_dot_product(embedding::DOUBLE[], q.v) /
           |             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
           |              sqrt(list_dot_product(q.v, q.v))), 6) AS cos
           |         FROM embeddings, q),
           |semk AS (SELECT doc_id, cos FROM sem0
           |         ORDER BY cos DESC, doc_id LIMIT 30),
           |smm AS (SELECT min(cos) AS mn, max(cos) AS mx FROM semk),
           |sc AS (SELECT doc_id,
           |         (CASE WHEN mx = mn THEN 1.0
           |               ELSE (cos - mn) / (mx - mn) END) * 0.3 AS c
           |       FROM semk, smm),
           |u AS (SELECT * FROM lc UNION ALL SELECT * FROM sc)
           |SELECT doc_id, round(sum(c), 6) AS lin_score FROM u
           |GROUP BY doc_id
           |ORDER BY lin_score DESC, doc_id LIMIT 20""".stripMargin

  val oracles: Map[String, String] = Map(
    "mv2_maxsim_index_rerank" -> maxSimRerankSql,
    "mv3_maxsim_served" -> maxSimRerankSql,
    "hy2_hybrid_index_rrf" -> hybridRrfSql,
    "hy3_search_hybrid" -> hybridRrfSql,
    "sm1_sample_det" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT * FROM orders
        |  ORDER BY md5('42:' || CAST(o_orderkey AS VARCHAR)) LIMIT 50)
        |ORDER BY o_orderkey""".stripMargin,
    "sm2_sample_strat" ->
      """WITH r AS (
        |  SELECT c_custkey, c_mktsegment,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |           ORDER BY md5('7:' || CAST(c_custkey AS VARCHAR))) AS rn
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment FROM r WHERE rn <= 10
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "sm3_weighted_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      / 4294967296.0
        |    < CASE source WHEN 'src0' THEN 0.9 WHEN 'src1' THEN 0.5
        |                  WHEN 'src2' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin,
    "sm6_token_budget_mix" ->
      raw"""WITH b AS (
           |  SELECT doc_id, source,
           |         CAST(len($toksSql) AS BIGINT) AS n_tok
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, source, n_tok,
           |         COALESCE(SUM(n_tok) OVER (PARTITION BY source
           |           ORDER BY md5('13:' || CAST(doc_id AS VARCHAR))
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS cb
           |  FROM b)
           |SELECT doc_id, source, n_tok FROM c
           |WHERE cb < CASE source WHEN 'src0' THEN 700 WHEN 'src1' THEN 0
           |                       WHEN 'src2' THEN 100000 ELSE 120 END
           |ORDER BY doc_id""".stripMargin,
    // the exponent is spelled (0.3 - 1.0), NOT -0.7: both engines then
    // subtract the same two doubles and feed pow the IDENTICAL
    // exponent (the literal -0.7 is a different double than 0.3 - 1.0)
    "sm8_temperature_mix" ->
      raw"""WITH d AS (SELECT doc_id,
           |    CASE WHEN doc_id % 10 < 6 THEN 'g0'
           |         WHEN doc_id % 10 < 9 THEN 'g1'
           |         ELSE 'g2' END AS src_grp
           |  FROM documents),
           |n AS (SELECT src_grp, CAST(count(*) AS DOUBLE) AS ns
           |      FROM d GROUP BY src_grp),
           |tot AS (SELECT sum(ns) AS nt FROM n),
           |r AS (SELECT src_grp, pow(ns / nt, 0.3 - 1.0) AS raw FROM n, tot),
           |mx AS (SELECT max(raw) AS m FROM r),
           |f AS (SELECT src_grp,
           |        floor(raw / m * 1000000 + 0.5) / 1000000.0 AS frac
           |      FROM r, mx)
           |SELECT d.doc_id, d.src_grp FROM d JOIN f USING (src_grp)
           |WHERE ('0x' || substr(md5('17:' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
           |      / 4294967296.0 < f.frac
           |ORDER BY d.doc_id""".stripMargin,
    "qf1_top_fraction" ->
      raw"""WITH b AS (
           |  SELECT doc_id, source,
           |         CAST(len($toksSql) AS BIGINT) AS n_tok
           |  FROM documents),
           |r AS (SELECT doc_id, source, n_tok,
           |        row_number() OVER (PARTITION BY source
           |          ORDER BY n_tok DESC, doc_id) AS rn,
           |        count(*) OVER (PARTITION BY source) AS n
           |      FROM b)
           |SELECT doc_id, source, n_tok FROM r
           |WHERE rn <= ceil(n * 0.3)
           |ORDER BY doc_id""".stripMargin,
    "sm7_epoch_mix" ->
      raw"""WITH w AS (
           |  SELECT doc_id, source,
           |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
           |                WHEN 'src2' THEN 0.4 ELSE 0.0 END AS wt
           |  FROM documents),
           |x AS (SELECT doc_id, source, wt, unnest(generate_series(0, 2)) AS epoch
           |      FROM w)
           |SELECT doc_id, source, epoch FROM x
           |WHERE epoch < floor(wt)
           |   OR (epoch = floor(wt) AND
           |       ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR) || '#' ||
           |          CAST(epoch AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0
           |         < wt - floor(wt))
           |ORDER BY doc_id, epoch""".stripMargin,
    "pack2_pack_sequences" ->
      raw"""WITH b AS (
           |  SELECT doc_id, text, CAST(len($toksSql) AS BIGINT) AS n_tok
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, text, n_tok,
           |         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS cb
           |  FROM b),
           |p AS (SELECT doc_id, text, n_tok,
           |        CAST(floor(cb / 512.0) AS BIGINT) AS bin FROM c)
           |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS ids,
           |  md5(string_agg(text, chr(10) || '<|doc|>' || chr(10)
           |      ORDER BY doc_id)) AS text_md5
           |FROM p GROUP BY bin ORDER BY bin""".stripMargin,
    // row_number over (len desc, id) replays the ordinal; batches and
    // padding are pure arithmetic over it
    "lb1_length_batches" -> {
      val r6 = graft.queries.QueryUtil.rhuSql(
        "CAST(n_rows * max_len - sum_len AS DOUBLE) / " +
          "(n_rows * max_len)", 6)
      raw"""WITH t AS (SELECT doc_id,
           |    CAST(len($toksSql) AS BIGINT) AS n_tok FROM documents),
           |r AS (SELECT doc_id, n_tok, row_number() OVER (
           |    ORDER BY n_tok DESC, doc_id) AS rn FROM t),
           |g AS (SELECT CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
           |    CAST(count(*) AS BIGINT) AS n_rows,
           |    max(n_tok) AS max_len,
           |    CAST(sum(n_tok) AS BIGINT) AS sum_len
           |  FROM r GROUP BY 1)
           |SELECT batch_id, n_rows, max_len, sum_len,
           |  $r6 AS padding_frac
           |FROM g ORDER BY batch_id""".stripMargin
    },
    // best/worst replay with the idxmax tie rule (score desc/asc,
    // then smallest id), equal-score groups dropped
    "grpo1_group_advantage" ->
      """WITH s AS (SELECT doc_id, source,
        |             CAST(n_chars AS DOUBLE) AS r FROM documents),
        |g AS (SELECT source, CAST(count(*) AS DOUBLE) AS gn,
        |        avg(r) AS gm, coalesce(stddev_pop(r), 0) AS gs,
        |        sum(r) AS gsum
        |      FROM s GROUP BY 1)
        |SELECT doc_id, source,
        |  CASE WHEN gn > 1 AND gs > 0 THEN
        |    floor((r - gm) / gs * 1000000 + 0.5) / 1000000
        |  ELSE 0.0 END AS grpo_adv,
        |  CASE WHEN gn > 1 THEN
        |    floor((r - (gsum - r) / (gn - 1)) * 1000000 + 0.5) / 1000000
        |  ELSE 0.0 END AS rloo_adv
        |FROM s JOIN g USING (source) ORDER BY doc_id""".stripMargin,
    "pref1_preference_pairs" ->
      """WITH r AS (SELECT source, doc_id,
        |    CAST(n_chars AS DOUBLE) AS s FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |w AS (SELECT source, doc_id, s,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY s DESC, doc_id) AS rh,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY s ASC, doc_id) AS rl
        |  FROM r),
        |hi AS (SELECT source, doc_id AS chosen_id, s AS smax
        |       FROM w WHERE rh = 1),
        |lo AS (SELECT source, doc_id AS rejected_id, s AS smin
        |       FROM w WHERE rl = 1)
        |SELECT hi.source, chosen_id, rejected_id,
        |       smax - smin AS margin
        |FROM hi JOIN lo ON hi.source = lo.source
        |WHERE smax - smin > 0 ORDER BY hi.source""".stripMargin,
    "pack1_token_packing" ->
      raw"""WITH b AS (
           |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, n_tokens,
           |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS cum_before
           |  FROM b)
           |SELECT doc_id, n_tokens, CAST(cum_before AS BIGINT) AS cum_before,
           |       CAST(floor(cum_before / 512.0) AS BIGINT) AS bin
           |FROM c ORDER BY doc_id""".stripMargin,
    "dd9_components" ->
      raw"""WITH RECURSIVE sh AS (SELECT doc_id, $shinglesSql AS s FROM documents),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
           |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
           |j AS (SELECT id_a, id_b,
           |  CASE WHEN len(list_distinct(list_concat(sa, sb))) > 0 THEN
           |    CAST(len(list_distinct(list_intersect(sa, sb))) AS DOUBLE) /
           |    len(list_distinct(list_concat(sa, sb)))
           |  ELSE 0.0 END AS jx
           |FROM p),
           |e AS (SELECT id_a AS u, id_b AS v FROM j WHERE jx >= 0.8),
           |sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
           |nodes AS (SELECT DISTINCT u AS id FROM sym),
           |reach(id, lbl) AS (
           |  SELECT id, id FROM nodes
           |  UNION
           |  SELECT s2.v, r.lbl FROM reach r JOIN sym s2 ON s2.u = r.id)
           |SELECT id, CAST(min(lbl) AS BIGINT) AS component
           |FROM reach GROUP BY id ORDER BY id""".stripMargin,
    "sim4_lsh_planted" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id + 200000 AS q_id,
        |        list_transform(v, (x, i) ->
        |          x + (CAST((vec_id*13 + (i-1)*11) % 7 AS DOUBLE) - 3.0)*0.0005) AS v
        |      FROM base WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 5) AS cos
        |      FROM q, base c),
        |r AS (SELECT q_id, n_id, cos,
        |        row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rn
        |      FROM s)
        |SELECT q_id, CAST(1 AS BIGINT) AS rank, n_id, cos FROM r WHERE rn = 1
        |ORDER BY q_id""".stripMargin,
    "t6_fingerprint_md5" ->
      raw"""SELECT doc_id,
           |  list_reduce(
           |    list_prepend(CAST(0 AS BIGINT),
           |      list_transform($toksSql,
           |        t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)),
           |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
           |FROM documents ORDER BY doc_id""".stripMargin,
    "mm7_video_stride" ->
      """SELECT d.doc_id AS media_id, CAST(f.f AS INT) AS frame_no,
        |  CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
        |  round((SELECT avg(CAST((d.doc_id * 31 + f.f * 19 + x.x * 7 + y.y * 13) % 256 AS DOUBLE))
        |         FROM generate_series(0, 7) x(x), generate_series(0, 7) y(y)), 6)
        |    AS mean_luma
        |FROM documents d, generate_series(0, 3, 2) f(f)
        |ORDER BY media_id, frame_no""".stripMargin,
    "zo1_zorder_key" -> {
      // unrolled Morton interleave: bit j of column i -> output bit
      // j*2 + i (i=0 user bucket, i=1 event bucket), 8 bits each
      val terms = (0 until 8).flatMap { j =>
        Seq(s"(((bu >> $j) & 1) << ${2 * j})",
          s"(((be >> $j) & 1) << ${2 * j + 1})")
      }.mkString(" | ")
      raw"""WITH mm AS (SELECT min(user_id) AS mnu, max(user_id) AS mxu,
           |  min(event_id) AS mne, max(event_id) AS mxe FROM events),
           |b AS (SELECT event_id, user_id,
           |  coalesce(((user_id - mnu) * 255) // nullif(mxu - mnu, 0), 0) AS bu,
           |  coalesce(((event_id - mne) * 255) // nullif(mxe - mne, 0), 0) AS be
           |FROM events, mm)
           |SELECT event_id, user_id, $terms AS zkey
           |FROM b ORDER BY zkey, event_id LIMIT 100""".stripMargin
    },
    "pp1_partition_prune" ->
      """SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
        |       CAST(count(*) AS BIGINT) AS n,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders WHERE year(o_orderdate) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical quantization arithmetic (floor-based half-up over
    // max|v|/127), identical cosine over the INT vectors
    "emb2_int8_topk" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |       FROM base),
        |enc AS (SELECT vec_id,
        |          list_transform(v, x -> floor(x / scale + 0.5)) AS q
        |        FROM sc WHERE scale > 0),
        |qs AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 5),
        |s AS (SELECT qs.q_id, e.vec_id AS n_id,
        |        round(list_dot_product(e.q, qs.qv) /
        |          (sqrt(list_dot_product(e.q, e.q)) *
        |           sqrt(list_dot_product(qs.qv, qs.qv))), 6) AS cos8
        |      FROM enc e, qs WHERE e.vec_id <> qs.q_id),
        |r AS (SELECT q_id, n_id, cos8,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY cos8 DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos8 FROM r WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,
    // the batch face of the tumbling window: epoch-aligned hour buckets
    "st1_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, CAST(count(*) AS BIGINT) AS cnt,
        |       round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "asof1_pointintime" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, max(value) AS click_value
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       c.click_ts, c.click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.click_ts
        |ORDER BY p.event_id""".stripMargin,
    "eql1_sequence" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type
        |           FROM events),
        |s1 AS (SELECT user_id, ts AS t1, event_id AS i1 FROM e
        |       WHERE event_type = 'signup'),
        |c2 AS (SELECT user_id, t1, i1, t2, i2 FROM (
        |  SELECT s1.user_id, s1.t1, s1.i1, e.ts AS t2,
        |    e.event_id AS i2,
        |    row_number() OVER (PARTITION BY s1.user_id, s1.i1
        |      ORDER BY e.ts, e.event_id) AS rn
        |  FROM s1 JOIN e ON e.user_id = s1.user_id
        |    AND e.event_type = 'purchase'
        |    AND (e.ts > s1.t1 OR (e.ts = s1.t1 AND e.event_id > s1.i1)))
        |  WHERE rn = 1),
        |c3 AS (SELECT user_id, t1, i1, i2, t3, i3 FROM (
        |  SELECT c2.user_id, c2.t1, c2.i1, c2.i2, e.ts AS t3,
        |    e.event_id AS i3,
        |    row_number() OVER (PARTITION BY c2.user_id, c2.i1
        |      ORDER BY e.ts, e.event_id) AS rn
        |  FROM c2 JOIN e ON e.user_id = c2.user_id
        |    AND e.event_type = 'error'
        |    AND (e.ts > c2.t2 OR (e.ts = c2.t2 AND e.event_id > c2.i2)))
        |  WHERE rn = 1)
        |SELECT user_id, i1 AS id_1, i2 AS id_2, i3 AS id_3 FROM c3
        |WHERE epoch_ms(t3) - epoch_ms(t1) <= 7200000
        |ORDER BY user_id, i1""".stripMargin,
    "eql2_sequence_until" ->
      """WITH e AS (SELECT event_id, ts, user_id, event_type
        |           FROM events),
        |s1 AS (SELECT user_id, ts AS t1, event_id AS i1 FROM e
        |       WHERE event_type = 'signup'),
        |c2 AS (SELECT user_id, t1, i1, t2, i2 FROM (
        |  SELECT s1.user_id, s1.t1, s1.i1, e.ts AS t2,
        |    e.event_id AS i2,
        |    row_number() OVER (PARTITION BY s1.user_id, s1.i1
        |      ORDER BY e.ts, e.event_id) AS rn
        |  FROM s1 JOIN e ON e.user_id = s1.user_id
        |    AND e.event_type = 'purchase'
        |    AND (e.ts > s1.t1 OR (e.ts = s1.t1 AND e.event_id > s1.i1)))
        |  WHERE rn = 1)
        |SELECT user_id, i1 AS id_1, i2 AS id_2 FROM c2 c
        |WHERE epoch_ms(t2) - epoch_ms(t1) <= 7200000
        |  AND NOT EXISTS (SELECT 1 FROM e u
        |    WHERE u.user_id = c.user_id AND u.event_type = 'view'
        |    AND (u.ts > c.t1 OR (u.ts = c.t1 AND u.event_id > c.i1))
        |    AND (u.ts < c.t2 OR (u.ts = c.t2 AND u.event_id < c.i2)))
        |ORDER BY user_id, id_1""".stripMargin,
    "rj1_range_window" ->
      """WITH e AS (SELECT event_id AS err_id, ts AS w_start,
        |                  ts + INTERVAL 10 MINUTE AS w_end
        |           FROM events WHERE event_type = 'error')
        |SELECT err_id, CAST(count(*) AS BIGINT) AS n_in_window
        |FROM e JOIN events p ON p.ts >= e.w_start AND p.ts <= e.w_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dc1_decontam" ->
      raw"""WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents),
           |b AS (SELECT DISTINCT g
           |      FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0)),
           |cg AS (SELECT DISTINCT doc_id, g
           |       FROM (SELECT doc_id, unnest(s) AS g FROM sh))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams
           |FROM cg JOIN b USING (g)
           |GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact all-pairs vs the broadcast bench: planted jittered copies
    // are the only mass above 0.92; best match by (cos DESC, bench id)
    "dc4_semantic_decontam" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |bench AS (SELECT vec_id, v FROM base WHERE vec_id % 25 = 0),
        |planted AS (
        |  SELECT vec_id + 300000 AS pid,
        |         list_transform(v, (x, i) ->
        |           x + (CAST((vec_id*37 + (i-1)*11) % 7 AS DOUBLE) - 3.0)*0.0005) AS v
        |  FROM bench),
        |corpus AS (SELECT vec_id, v FROM base WHERE vec_id % 25 <> 0
        |           UNION ALL SELECT pid AS vec_id, v FROM planted),
        |s AS (SELECT c.vec_id, b.vec_id AS bid,
        |        round(list_dot_product(c.v, b.v) /
        |          (sqrt(list_dot_product(c.v, c.v)) *
        |           sqrt(list_dot_product(b.v, b.v))), 5) AS cos
        |      FROM corpus c CROSS JOIN bench b),
        |best AS (SELECT vec_id, bid, cos,
        |           row_number() OVER (PARTITION BY vec_id
        |             ORDER BY cos DESC, bid) AS rn
        |         FROM s WHERE cos >= 0.92)
        |SELECT vec_id, bid AS bench_id, cos AS cosine
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // keep-best replay: rank each prefix-key group by (length DESC,
    // doc_id) and keep the top row
    "dd19_keep_best_by_key" ->
      raw"""WITH corpus AS (SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' extra tail words'
           |  FROM documents WHERE doc_id < 40),
           |k AS (SELECT doc_id,
           |        array_to_string(($toksSql)[1:5], ' ') AS key,
           |        length(text) AS sc
           |      FROM corpus)
           |SELECT doc_id FROM (
           |  SELECT doc_id, row_number() OVER (PARTITION BY key
           |    ORDER BY sc DESC, doc_id) AS rn FROM k)
           |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // identical SQL to dc1 by design: the Bloom prefilter is plumbing,
    // not semantics — false positives die at the confirm join, false
    // negatives don't exist (Bloom guarantee), so the answer is exact
    "dc3_bloom_decontam" ->
      raw"""WITH sh AS (SELECT doc_id, $shinglesSql AS s FROM documents),
           |b AS (SELECT DISTINCT g
           |      FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0)),
           |cg AS (SELECT DISTINCT doc_id, g
           |       FROM (SELECT doc_id, unnest(s) AS g FROM sh))
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_ngrams
           |FROM cg JOIN b USING (g)
           |GROUP BY 1 ORDER BY 1""".stripMargin,
    // survivor of each digest = min doc_id of the earliest-arriving
    // batch (batch k = doc_id % 4, arrival order pinned by mod times);
    // the planted +10001 clones replay identically
    // batch replay: the streamed corpus (incl. the +10001 clones the
    // fixture plants), per-doc distinct-hit counts vs the static
    // benchmark grams, both signal fragments, one survivors WHERE
    // stateless streaming ⇒ the union of per-batch matches equals the
    // batch percolate of the whole FIXTURE corpus (documents + the
    // planted +10001 clones) — pc1's replay over that union
    "st15_stream_ingest" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 10001, text FROM documents
        |           WHERE doc_id < 100)
        |SELECT doc_id, CAST(doc_id AS VARCHAR) AS key_str,
        |  'graft' AS engine,
        |  regexp_replace(text, 'stream', 'flow', 'g') AS t2
        |FROM u ORDER BY doc_id""".stripMargin,
    "st14_stream_percolate" ->
      raw"""WITH u AS (SELECT doc_id, text FROM documents
           |           UNION ALL
           |           SELECT doc_id + 10001, text FROM documents
           |           WHERE doc_id < 100),
           |t AS (SELECT doc_id, list_distinct(
           |    list_filter(string_split_regex(lower(text), '\s+'),
           |      x -> x <> '')) AS toks FROM u),
           |r(query_id, terms, msm) AS (VALUES
           |  ('stream_filter', ['stream', 'filter'], 2),
           |  ('any_join', ['join', 'merge'], 1),
           |  ('heavy_sort', ['window', 'sort', 'order'], 3))
           |SELECT doc_id, query_id,
           |  CAST(len(list_filter(r.terms,
           |    x -> list_contains(t.toks, x))) AS BIGINT)
           |    AS matched_terms
           |FROM t, r
           |WHERE len(list_filter(r.terms,
           |    x -> list_contains(t.toks, x))) >= msm
           |ORDER BY doc_id, query_id""".stripMargin,
    "st13_stream_curation" ->
      raw"""WITH u AS (SELECT doc_id, text FROM documents
           |           UNION ALL
           |           SELECT doc_id + 10001, text FROM documents
           |           WHERE doc_id < 100),
           |bg AS (SELECT DISTINCT g FROM
           |         (SELECT unnest($shinglesSql) AS g FROM documents
           |          WHERE doc_id % 50 = 0)),
           |cg AS (SELECT doc_id, unnest($shinglesSql) AS g FROM u),
           |h AS (SELECT doc_id, count(DISTINCT cg.g) AS nh
           |      FROM cg JOIN bg USING (g) GROUP BY 1),
           |${qualitySigSql("SELECT doc_id, text FROM u", "q_")},
           |${repetitionSigSql("SELECT doc_id, text FROM u", "r_")}
           |SELECT u.doc_id FROM u
           |JOIN q_sig q ON q.doc_id = u.doc_id
           |JOIN r_sig r ON r.doc_id = u.doc_id
           |LEFT JOIN h ON h.doc_id = u.doc_id
           |WHERE coalesce(h.nh, 0) < 2
           |  AND q.n_words >= 50 AND q.n_words <= 100000
           |  AND q.mean_word_len >= 3.0 AND q.mean_word_len <= 10.0
           |  AND q.symbol_word_ratio <= 0.1
           |  AND q.bullet_start_frac <= 0.9 AND q.ellipsis_end_frac <= 0.3
           |  AND q.alpha_word_frac >= 0.8 AND q.stop_hits >= 1
           |  AND r.dup_line_frac <= 0.30 AND r.dup_para_frac <= 0.30
           |  AND r.dup_line_char_frac <= 0.20 AND r.dup_para_char_frac <= 0.20
           |  AND r.top_2gram_char_frac <= 0.20 AND r.top_3gram_char_frac <= 0.18
           |  AND r.top_4gram_char_frac <= 0.16 AND r.dup_5gram_char_frac <= 0.15
           |  AND r.dup_6gram_char_frac <= 0.14 AND r.dup_7gram_char_frac <= 0.13
           |  AND r.dup_8gram_char_frac <= 0.12 AND r.dup_9gram_char_frac <= 0.11
           |  AND r.dup_10gram_char_frac <= 0.10
           |ORDER BY u.doc_id""".stripMargin,
    "st4_stream_incdedup" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 10001, text FROM documents
        |           WHERE doc_id < 100),
        |r AS (SELECT doc_id, md5(text) AS digest,
        |        row_number() OVER (PARTITION BY md5(text)
        |          ORDER BY doc_id % 4, doc_id) AS rn
        |      FROM u)
        |SELECT doc_id, digest FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // identical replay: exactly-once delivery changes WHERE survivors
    // land (committed per-batch dirs), never WHICH rows survive
    "st7_stream_exactly_once" ->
      """WITH u AS (SELECT doc_id, text FROM documents
        |           UNION ALL
        |           SELECT doc_id + 10001, text FROM documents
        |           WHERE doc_id < 100),
        |r AS (SELECT doc_id, md5(text) AS digest,
        |        row_number() OVER (PARTITION BY md5(text)
        |          ORDER BY doc_id % 4, doc_id) AS rn
        |      FROM u)
        |SELECT doc_id, digest FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // positional 13-gram hits against the benchmark gram set, merged
    // into disjoint token intervals per doc by the running-max window
    "dc2_span_decontam" ->
      raw"""WITH tk0 AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |qt AS (SELECT doc_id + 30000 AS doc_id,
           |         concat_ws(' ', 'pfq', 'qfq',
           |                   array_to_string(toks[4:18], ' '), 'zfq') AS text
           |       FROM tk0 WHERE doc_id % 50 = 0 AND len(toks) >= 18),
           |corpus AS (SELECT doc_id, text FROM documents
           |           UNION ALL SELECT doc_id, text FROM qt),
           |tk AS (SELECT doc_id, $toksSql AS toks FROM corpus),
           |bg AS (SELECT DISTINCT array_to_string(toks[p + 1 : p + 13], ' ') AS sh
           |       FROM (SELECT toks,
           |               unnest(generate_series(0, len(toks) - 13)) AS p
           |             FROM tk0
           |             WHERE doc_id % 50 = 0 AND len(toks) >= 13)),
           |post AS (SELECT doc_id, pos,
           |           array_to_string(toks[pos + 1 : pos + 13], ' ') AS sh
           |         FROM (SELECT doc_id, toks,
           |                 unnest(generate_series(0, len(toks) - 13)) AS pos
           |               FROM tk WHERE len(toks) >= 13)),
           |hits AS (SELECT doc_id, pos FROM post JOIN bg USING (sh)),
           |w AS (SELECT doc_id, pos,
           |        max(pos + 12) OVER (PARTITION BY doc_id ORDER BY pos
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           |          AS prev_end
           |      FROM hits),
           |g AS (SELECT doc_id, pos,
           |        sum(CASE WHEN prev_end IS NULL OR pos > prev_end
           |                 THEN 1 ELSE 0 END)
           |          OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           |      FROM w),
           |spans AS (SELECT doc_id, grp, min(pos) AS s, max(pos) + 12 AS e
           |          FROM g GROUP BY doc_id, grp)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
           |  CAST(sum(e - s + 1) AS BIGINT) AS contaminated_tokens,
           |  CAST(max(e - s + 1) AS BIGINT) AS max_span_len
           |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "st3_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
        |ORDER BY 1, 2""".stripMargin,
    "dd10_simhash_md5" ->
      raw"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
           |h AS (SELECT doc_id,
           |        ('0x' || substr(md5(t), 1, 15))::BIGINT AS hv FROM tok),
           |bits AS (SELECT doc_id, j,
           |           sum(CASE WHEN (hv & (1::BIGINT << j)) != 0
           |               THEN 1 ELSE -1 END) AS s
           |         FROM h, generate_series(0, 59) g(j) GROUP BY 1, 2)
           |SELECT doc_id,
           |       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)
           |         AS BIGINT) AS simhash
           |FROM bits GROUP BY 1 ORDER BY 1""".stripMargin,
    "kl1_corpus_drift" ->
      raw"""WITH a AS (SELECT unnest($toksSql) AS token FROM documents),
           |b AS (SELECT unnest($toksSql) AS token FROM documents
           |      WHERE source = 'src0'),
           |cnta AS (SELECT token, CAST(count(*) AS BIGINT) AS n_a
           |         FROM a GROUP BY token),
           |cntb AS (SELECT token, CAST(count(*) AS BIGINT) AS n_b
           |         FROM b GROUP BY token),
           |j AS (SELECT coalesce(cnta.token, cntb.token) AS token,
           |        coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
           |      FROM cnta FULL OUTER JOIN cntb ON cnta.token = cntb.token),
           |tot AS (SELECT sum(n_a) AS na, sum(n_b) AS nb,
           |               count(*) AS v FROM j),
           |p AS (SELECT token, n_a, n_b,
           |        (n_a + 0.5) / (na + 0.5 * v) AS pa,
           |        (n_b + 0.5) / (nb + 0.5 * v) AS pb
           |      FROM j, tot)
           |SELECT token, n_a, n_b, round(pa * ln(pa / pb), 6) AS kl_term
           |FROM p ORDER BY round(pa * ln(pa / pb), 6) DESC, token
           |LIMIT 20""".stripMargin,
    "ppl1_bigram_lm" ->
      raw"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |tr AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2
           |       FROM b WHERE len(toks) >= 2),
           |big AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
           |        FROM tr GROUP BY 1, 2),
           |uni AS (SELECT t AS w1, CAST(count(*) AS DOUBLE) AS cu
           |        FROM (SELECT unnest(toks) AS t FROM b) GROUP BY 1),
           |v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni)
           |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_trans,
           |  round(avg(ln((coalesce(cb, 0) + 0.5) /
           |               (coalesce(cu, 0) + 0.5 * vs))), 6) AS mean_logp
           |FROM tr LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1), v
           |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // every branch of the stupid-backoff CASE replayed: trigram
    // relative frequency, α-penalized bigram, α²-penalized add-k
    // unigram floor
    "ppl2_trigram_backoff" ->
      raw"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |tri AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
           |               unnest(toks[2:len(toks)-1]) AS w2,
           |               unnest(toks[3:len(toks)]) AS w3
           |        FROM b WHERE len(toks) >= 3),
           |c3 AS (SELECT w1, w2, w3, CAST(count(*) AS DOUBLE) AS c
           |       FROM tri GROUP BY 1, 2, 3),
           |bi AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS a,
           |              unnest(toks[2:len(toks)]) AS bb
           |       FROM b WHERE len(toks) >= 2),
           |c2 AS (SELECT a, bb, CAST(count(*) AS DOUBLE) AS c
           |       FROM bi GROUP BY 1, 2),
           |c1 AS (SELECT t AS w, CAST(count(*) AS DOUBLE) AS c
           |       FROM (SELECT unnest(toks) AS t FROM b) GROUP BY 1),
           |nv AS (SELECT CAST(sum(c) AS DOUBLE) AS n,
           |              CAST(count(*) AS DOUBLE) AS v FROM c1),
           |sc AS (SELECT t.doc_id,
           |         CASE WHEN c3.c IS NOT NULL THEN c3.c / p2.c
           |              WHEN b2.c IS NOT NULL THEN 0.4 * b2.c / u2.c
           |              ELSE 0.4 * 0.4 * (coalesce(u3.c, 0) + 0.5) /
           |                   (nv.n + 0.5 * nv.v) END AS s
           |       FROM tri t
           |       LEFT JOIN c3 ON t.w1 = c3.w1 AND t.w2 = c3.w2
           |                   AND t.w3 = c3.w3
           |       LEFT JOIN c2 p2 ON t.w1 = p2.a AND t.w2 = p2.bb
           |       LEFT JOIN c2 b2 ON t.w2 = b2.a AND t.w3 = b2.bb
           |       LEFT JOIN c1 u2 ON t.w2 = u2.w
           |       LEFT JOIN c1 u3 ON t.w3 = u3.w, nv)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ctx,
           |       round(avg(ln(s)), 6) AS mean_logs
           |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "bm1_bm25_topk" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('spark', 'vector', 'hash') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // BM25F replay: weighted combined tf (2× for title occurrences),
    // weighted combined length, any-field df, one saturation
    "cf1_combined_fields" ->
      raw"""WITH s AS (SELECT doc_id, toks, toks[1:6] AS ttoks,
           |             2.0 * len(toks[1:6]) + 1.0 * len(toks) AS clen
           |           FROM (SELECT doc_id, $toksSql AS toks
           |                 FROM documents)),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(clen) AS avg_cl FROM s),
           |occ AS (SELECT doc_id, clen, t, 2.0 AS w FROM (
           |          SELECT doc_id, clen, unnest(ttoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')
           |        UNION ALL
           |        SELECT doc_id, clen, t, 1.0 AS w FROM (
           |          SELECT doc_id, clen, unnest(toks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')),
           |tfc AS (SELECT doc_id, clen, t, sum(w) AS tf
           |        FROM occ GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tfc GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * clen / avg_cl))), 6) AS score
           |FROM tfc JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // the label rule replayed + literal TRUE for every correct bit:
    // the gate passes iff the trained model misclassifies nothing
    "qc1_quality_classifier" ->
      raw"""WITH f AS (SELECT doc_id,
           |  CAST(len($toksSql) AS DOUBLE) AS tc FROM documents)
           |SELECT doc_id, CAST(tc >= 60 AS INT) AS label,
           |       TRUE AS correct
           |FROM f WHERE tc < 56 OR tc > 64 ORDER BY doc_id""".stripMargin,
    // conj: docs with BOTH stream and filter and NOT join, scored on
    // the two must terms; disj: docs with merge or sort, scored on
    // whichever are present — same Okapi arithmetic as idx1
    "idx15_query_string_search" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'merge', 'sort')
           |       GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id, t,
           |         ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) AS c
           |       FROM tf JOIN dft USING (t), st),
           |conj AS (SELECT b.doc_id, round(sum(b.c), 6) AS score,
           |           'conj' AS q
           |         FROM bm b JOIN s ON s.doc_id = b.doc_id
           |         WHERE b.t IN ('stream', 'filter')
           |           AND list_contains(s.toks, 'stream')
           |           AND list_contains(s.toks, 'filter')
           |           AND NOT list_contains(s.toks, 'join')
           |         GROUP BY b.doc_id
           |         ORDER BY score DESC, b.doc_id LIMIT 10),
           |disj AS (SELECT doc_id, round(sum(c), 6) AS score,
           |           'disj' AS q
           |         FROM bm WHERE t IN ('merge', 'sort')
           |         GROUP BY doc_id
           |         ORDER BY score DESC, doc_id LIMIT 10)
           |SELECT doc_id, score, q FROM conj
           |UNION ALL SELECT doc_id, score, q FROM disj
           |ORDER BY q, score DESC, doc_id""".stripMargin,
    "idx1_index_search" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "ig1_ingest_pipeline" ->
      """SELECT o_orderkey,
        |  CAST(regexp_extract(o_orderpriority, '^(.*?)-(.*)$', 1)
        |    AS BIGINT) AS prio_num,
        |  lower(regexp_extract(o_orderpriority, '^(.*?)-(.*)$', 2))
        |    AS prio_word,
        |  'graft' AS engine,
        |  CAST(o_orderkey AS VARCHAR) AS o_key,
        |  regexp_replace(o_orderstatus, '^O$', 'OPEN', 'g') AS status_x,
        |  CAST(o_orderdate AS VARCHAR) AS ots_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "ig2_ingest_enrich" ->
      """SELECT c_custkey, n_name AS nation_name,
        |  n_regionkey AS nation_region
        |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "te1_terms_enum" ->
      raw"""WITH v AS (SELECT DISTINCT t FROM
           |  (SELECT unnest($toksSql) AS t FROM documents)
           |  WHERE t LIKE 's%'),
           |p1 AS (SELECT t FROM v ORDER BY t LIMIT 4),
           |p2 AS (SELECT t FROM v WHERE t > (SELECT max(t) FROM p1)
           |       ORDER BY t LIMIT 4)
           |SELECT CAST(1 AS BIGINT) AS page, t AS term FROM p1
           |UNION ALL
           |SELECT CAST(2 AS BIGINT) AS page, t AS term FROM p2
           |ORDER BY page, term""".stripMargin,
    "idx21_synonym_search" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('hash', 'key', 'scan') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |map AS (SELECT * FROM (VALUES ('hash', 0), ('key', 0),
           |                              ('scan', 1)) AS v(t, g)),
           |gdf AS (SELECT g, max(df) AS df FROM dft JOIN map USING (t)
           |        GROUP BY 1),
           |gtf AS (SELECT doc_id, dl, g, sum(tf) AS tf
           |        FROM tf JOIN map USING (t) GROUP BY 1, 2, 3)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - gdf.df + 0.5) / (gdf.df + 0.5)) *
           |    gtf.tf * (1.2 + 1) /
           |    (gtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |    AS score
           |FROM gtf JOIN gdf USING (g), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    // brute-resolution replay: the oracle finds every vocabulary term
    // within levenshtein 1 of each typo'd query term by scanning the
    // WHOLE vocabulary — the deletion dictionary never exists
    // oracle-side — then scores the same per-term Okapi sum
    "fz1_fuzzy_search" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |voc AS (SELECT DISTINCT unnest(toks) AS t FROM s),
           |rt AS (SELECT t FROM voc
           |       WHERE levenshtein(t, 'streem') <= 1
           |          OR levenshtein(t, 'filtir') <= 1),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN (SELECT t FROM rt) GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    // full-scan radius replay: the cell layout never exists
    // oracle-side, so an under-covering enumeration cannot hide
    "gc1_geo_cell_radius" ->
      raw"""WITH pts AS (
           |  SELECT c_custkey,
           |         CAST((c_custkey % 121) - 60 AS DOUBLE) AS lat,
           |         CAST(((c_custkey * 7) % 301) - 150 AS DOUBLE) AS lon
           |  FROM customer),
           |dm AS (SELECT c_custkey,
           |         ${graft.queries.QueryUtil.haversineSqlMeters(
                        "10.0", "20.0", "lat", "lon")} AS dist_m
           |       FROM pts)
           |SELECT c_custkey,
           |  ${graft.queries.QueryUtil.rhuSql("dist_m / 1000.0", 3)}
           |    AS dist_km
           |FROM dm WHERE dist_m <= 2000000.0
           |ORDER BY c_custkey""".stripMargin,
    // the flat-union replay: neither index exists oracle-side, so
    // cross-index stats/df merge errors cannot cancel out (idx2's
    // discipline, one level up)
    "idx10_multi_index" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('vector', 'merge', 'sort') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // fielded multi_match replay over the LIVE doc set: per-field
    // corpus stats and df, RAW per-field Okapi sums, boosts, dis_max
    // with tie_breaker / plain sum, one final 6-dp round, rank cut
    // per mode — no index, no per-field layout oracle-side
    // per-field per-term BM25 replay: the scoped clause rides title
    // stats at boost 2, the unscoped clause takes the max of its two
    // field legs, the negation gates on containment in either field
    "idx18_fielded_query_string" ->
      raw"""WITH s0 AS (SELECT doc_id, $toksSql AS btoks FROM documents),
           |s AS (SELECT doc_id, btoks, btoks[1:4] AS ttoks FROM s0),
           |stt AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(ttoks) AS DOUBLE)) AS avg_len FROM s),
           |tft AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(ttoks) AS DOUBLE) AS dl,
           |                unnest(ttoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dftt AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tft GROUP BY 1),
           |ct AS (SELECT doc_id, t,
           |         ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) AS fs
           |       FROM tft JOIN dftt USING (t), stt),
           |stb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(btoks) AS DOUBLE)) AS avg_len FROM s),
           |tfb AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(btoks) AS DOUBLE) AS dl,
           |                unnest(btoks) AS t FROM s)
           |        WHERE t = 'filter' GROUP BY 1, 2, 3),
           |dftb AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tfb GROUP BY 1),
           |cb AS (SELECT doc_id, t,
           |         ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) AS fs
           |       FROM tfb JOIN dftb USING (t), stb),
           |g AS (SELECT doc_id FROM s
           |      WHERE (list_contains(ttoks, 'stream')
           |          OR list_contains(ttoks, 'filter')
           |          OR list_contains(btoks, 'filter'))
           |        AND NOT (list_contains(ttoks, 'join')
           |              OR list_contains(btoks, 'join'))),
           |c0 AS (SELECT doc_id, 2.0 * fs AS v FROM ct
           |       WHERE t = 'stream'),
           |c1 AS (SELECT doc_id, max(v) AS v FROM (
           |         SELECT doc_id, 2.0 * fs AS v FROM ct
           |         WHERE t = 'filter'
           |         UNION ALL
           |         SELECT doc_id, 1.0 * fs FROM cb WHERE t = 'filter')
           |       GROUP BY doc_id)
           |SELECT g.doc_id,
           |  round(coalesce(c0.v, 0) + coalesce(c1.v, 0), 6) AS score
           |FROM g LEFT JOIN c0 ON c0.doc_id = g.doc_id
           |       LEFT JOIN c1 ON c1.doc_id = g.doc_id
           |ORDER BY score DESC, g.doc_id LIMIT 12""".stripMargin,
    "idx11_fielded_search" ->
      raw"""WITH live AS (SELECT doc_id, text FROM documents
           |              WHERE doc_id % 11 <> 0),
           |s0 AS (SELECT doc_id, $toksSql AS btoks FROM live),
           |s AS (SELECT doc_id, btoks, btoks[1:4] AS ttoks FROM s0),
           |stt AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(ttoks) AS DOUBLE)) AS avg_len FROM s),
           |tft AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(ttoks) AS DOUBLE) AS dl,
           |                unnest(ttoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')
           |        GROUP BY 1, 2, 3),
           |dftt AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tft GROUP BY 1),
           |ft AS (SELECT doc_id,
           |         sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))) AS fs
           |       FROM tft JOIN dftt USING (t), stt GROUP BY doc_id),
           |stb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(btoks) AS DOUBLE)) AS avg_len FROM s),
           |tfb AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(btoks) AS DOUBLE) AS dl,
           |                unnest(btoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')
           |        GROUP BY 1, 2, 3),
           |dftb AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tfb GROUP BY 1),
           |fb AS (SELECT doc_id,
           |         sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))) AS fs
           |       FROM tfb JOIN dftb USING (t), stb GROUP BY doc_id),
           |u AS (SELECT doc_id, fs * 2.0 AS sc FROM ft
           |      UNION ALL SELECT doc_id, fs * 1.0 FROM fb),
           |c AS (SELECT doc_id, max(sc) AS best, sum(sc) AS tot
           |      FROM u GROUP BY doc_id),
           |r AS (SELECT 'best_fields' AS mode, doc_id,
           |             round(best + 0.3 * (tot - best), 6) AS score FROM c
           |      UNION ALL
           |      SELECT 'most_fields', doc_id, round(tot, 6) FROM c),
           |rr AS (SELECT mode, doc_id, score, row_number() OVER (
           |         PARTITION BY mode ORDER BY score DESC, doc_id) AS rn
           |       FROM r)
           |SELECT mode, doc_id, score FROM rr WHERE rn <= 10
           |ORDER BY mode, score DESC, doc_id""".stripMargin,
    // the idx11 best_fields replay (no deletes) ranked once; p1/p2 =
    // rank ranges 1..7 / 8..14 — exact tiling, no overlap, no gap
    "idx20_fielded_search_after" ->
      raw"""WITH s0 AS (SELECT doc_id, $toksSql AS btoks FROM documents),
           |s AS (SELECT doc_id, btoks, btoks[1:4] AS ttoks FROM s0),
           |stt AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(ttoks) AS DOUBLE)) AS avg_len FROM s),
           |tft AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(ttoks) AS DOUBLE) AS dl,
           |                unnest(ttoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')
           |        GROUP BY 1, 2, 3),
           |dftt AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tft GROUP BY 1),
           |ft AS (SELECT doc_id,
           |         sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))) AS fs
           |       FROM tft JOIN dftt USING (t), stt GROUP BY doc_id),
           |stb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(btoks) AS DOUBLE)) AS avg_len FROM s),
           |tfb AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |        FROM (SELECT doc_id, CAST(len(btoks) AS DOUBLE) AS dl,
           |                unnest(btoks) AS t FROM s)
           |        WHERE t IN ('stream', 'filter', 'join')
           |        GROUP BY 1, 2, 3),
           |dftb AS (SELECT t, CAST(count(*) AS DOUBLE) AS df
           |         FROM tfb GROUP BY 1),
           |fb AS (SELECT doc_id,
           |         sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))) AS fs
           |       FROM tfb JOIN dftb USING (t), stb GROUP BY doc_id),
           |u AS (SELECT doc_id, fs * 2.0 AS sc FROM ft
           |      UNION ALL SELECT doc_id, fs * 1.0 FROM fb),
           |c AS (SELECT doc_id, max(sc) AS best, sum(sc) AS tot
           |      FROM u GROUP BY doc_id),
           |r AS (SELECT doc_id,
           |        round(best + 0.3 * (tot - best), 6) AS score FROM c),
           |rr AS (SELECT doc_id, score, row_number() OVER (
           |         ORDER BY score DESC, doc_id) AS rn FROM r)
           |SELECT CASE WHEN rn <= 7 THEN 'p1' ELSE 'p2' END AS q,
           |       doc_id, score
           |FROM rr WHERE rn <= 14
           |ORDER BY q, score DESC, doc_id""".stripMargin,
    // the weighted-suggest replay: first tokens as entries, weight =
    // doc_id % 97, max-weight dedup, context IN filter — the sidecar
    // table and its range layout never exist oracle-side
    "sg4_weighted_suggest" ->
      raw"""WITH e AS (SELECT lower(toks[1]) AS term,
           |        doc_id % 97 AS weight, source AS ctx
           |      FROM (SELECT doc_id, source, $toksSql AS toks
           |            FROM documents)
           |      WHERE len(toks) > 0),
           |p AS (SELECT * FROM e WHERE starts_with(term, 's')),
           |a AS (SELECT term, CAST(max(weight) AS BIGINT) AS weight,
           |        'all' AS q
           |      FROM p GROUP BY term
           |      ORDER BY weight DESC, term LIMIT 8),
           |c AS (SELECT term, CAST(max(weight) AS BIGINT) AS weight,
           |        'ctx' AS q
           |      FROM p WHERE ctx IN ('src3', 'src7')
           |      GROUP BY term ORDER BY weight DESC, term LIMIT 8)
           |SELECT term, weight, q FROM a
           |UNION ALL SELECT term, weight, q FROM c
           |ORDER BY q, weight DESC, term""".stripMargin,
    // brute suggester replay: whole-vocabulary levenshtein + live df
    // + the missing-mode NOT EXISTS — the dictionary never exists
    // oracle-side
    "sg1_term_suggest" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |voc AS (SELECT t AS term,
           |          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |        FROM (SELECT doc_id, unnest(toks) AS t FROM s)
           |        GROUP BY 1)
           |SELECT term, df, CAST(1 AS INT) AS distance, 'filtir' AS q
           |FROM voc WHERE levenshtein(term, 'filtir') = 1
           |  AND NOT EXISTS (SELECT 1 FROM voc v2 WHERE v2.term = 'filtir')
           |UNION ALL
           |SELECT term, df, CAST(1 AS INT), 'stream'
           |FROM voc WHERE levenshtein(term, 'stream') = 1
           |  AND NOT EXISTS (SELECT 1 FROM voc v2 WHERE v2.term = 'stream')
           |ORDER BY q, df DESC, term""".stripMargin,
    // f31's per-field phrase replay over the LIVE doc set (the index,
    // its positions, and the per-field layout never exist oracle-side)
    "idx12_fielded_phrase" ->
      raw"""WITH live AS (SELECT doc_id, text FROM documents
           |              WHERE doc_id % 13 <> 0),
           |s AS (SELECT doc_id, $toksSql AS btoks FROM live),
           |t2 AS (SELECT doc_id, btoks, btoks[1:6] AS ttoks FROM s),
           |stt AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(ttoks) AS DOUBLE)) AS avg_len FROM t2),
           |stb AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |          avg(CAST(len(btoks) AS DOUBLE)) AS avg_len FROM t2),
           |pdt AS (SELECT
           |  CAST((SELECT count(*) FROM t2
           |        WHERE list_contains(ttoks, 'order')) AS DOUBLE) AS df1,
           |  CAST((SELECT count(*) FROM t2
           |        WHERE list_contains(ttoks, 'fast')) AS DOUBLE) AS df2),
           |pdb AS (SELECT
           |  CAST((SELECT count(*) FROM t2
           |        WHERE list_contains(btoks, 'order')) AS DOUBLE) AS df1,
           |  CAST((SELECT count(*) FROM t2
           |        WHERE list_contains(btoks, 'fast')) AS DOUBLE) AS df2),
           |ptt AS (SELECT doc_id, CAST(len(ttoks) AS DOUBLE) AS dl,
           |          CAST(len([i FOR i IN generate_series(1, len(ttoks) - 1)
           |                    IF ttoks[i] = 'order' AND
           |                       ttoks[i + 1] = 'fast']) AS DOUBLE) AS ptf
           |        FROM t2),
           |ptb AS (SELECT doc_id, CAST(len(btoks) AS DOUBLE) AS dl,
           |          CAST(len([i FOR i IN generate_series(1, len(btoks) - 1)
           |                    IF btoks[i] = 'order' AND
           |                       btoks[i + 1] = 'fast']) AS DOUBLE) AS ptf
           |        FROM t2),
           |ft AS (SELECT doc_id,
           |         (ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) +
           |          ln(1 + (n - df2 + 0.5) / (df2 + 0.5)))
           |         * ptf * (1.2 + 1) /
           |         (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) * 2.0
           |           AS sc
           |       FROM ptt, stt, pdt WHERE ptf > 0),
           |fb AS (SELECT doc_id,
           |         (ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) +
           |          ln(1 + (n - df2 + 0.5) / (df2 + 0.5)))
           |         * ptf * (1.2 + 1) /
           |         (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) * 1.0
           |           AS sc
           |       FROM ptb, stb, pdb WHERE ptf > 0),
           |c AS (SELECT doc_id, max(sc) AS best, sum(sc) AS tot
           |      FROM (SELECT * FROM ft UNION ALL SELECT * FROM fb)
           |      GROUP BY doc_id),
           |r AS (SELECT doc_id,
           |        round(best + 0.4 * (tot - best), 6) AS score,
           |        row_number() OVER (ORDER BY
           |          round(best + 0.4 * (tot - best), 6) DESC, doc_id)
           |          AS rn
           |      FROM c)
           |SELECT doc_id, score FROM r WHERE rn <= 12
           |ORDER BY score DESC, doc_id""".stripMargin,
    // brute prefix-completion replay: whole-vocabulary prefix scan +
    // df ranking with the per-prefix rank cut
    "sg2_prefix_suggest" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |voc AS (SELECT t AS term,
           |          CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |        FROM (SELECT doc_id, unnest(toks) AS t FROM s)
           |        GROUP BY 1),
           |r AS (SELECT q, term, df, row_number() OVER (
           |        PARTITION BY q ORDER BY df DESC, term) AS rn
           |      FROM (SELECT 's' AS q, term, df FROM voc
           |            WHERE starts_with(term, 's')
           |            UNION ALL
           |            SELECT 'wi', term, df FROM voc
           |            WHERE starts_with(term, 'wi')))
           |SELECT term, df, q FROM r WHERE rn <= 5
           |ORDER BY q, df DESC, term""".stripMargin,
    // full-recipe phrase-suggester replay: unigram/bigram counts,
    // levenshtein candidate generation with the same (c desc, token)
    // rank + observed-term union, the ≤-1-change cross join, and the
    // exact left-to-right stupid-backoff + channel log-sum
    "sg3_phrase_suggest" ->
      raw"""WITH toks AS (SELECT $toksSql AS t FROM documents),
           |uni AS (SELECT u AS token, CAST(count(*) AS BIGINT) AS c
           |        FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1),
           |bi AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
           |    SELECT t[i] AS w1, t[i + 1] AS w2
           |    FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
           |          FROM toks WHERE len(t) >= 2)) GROUP BY 1, 2),
           |nn AS (SELECT CAST(sum(c) AS DOUBLE) AS N FROM uni),
           |c1 AS (SELECT token FROM (SELECT token FROM uni
           |         WHERE length(token) BETWEEN 3 AND 5
           |           AND levenshtein(token, 'hash') <= 1
           |         ORDER BY c DESC, token LIMIT 3) UNION SELECT 'hash'),
           |c2 AS (SELECT token FROM (SELECT token FROM uni
           |         WHERE length(token) BETWEEN 4 AND 6
           |           AND levenshtein(token, 'joinn') <= 1
           |         ORDER BY c DESC, token LIMIT 3) UNION SELECT 'joinn'),
           |c3 AS (SELECT token FROM (SELECT token FROM uni
           |         WHERE length(token) BETWEEN 3 AND 5
           |           AND levenshtein(token, 'scan') <= 1
           |         ORDER BY c DESC, token LIMIT 3) UNION SELECT 'scan'),
           |combos AS (SELECT c1.token AS w1, c2.token AS w2,
           |    c3.token AS w3,
           |    (CASE WHEN c1.token <> 'hash' THEN 1 ELSE 0 END +
           |     CASE WHEN c2.token <> 'joinn' THEN 1 ELSE 0 END +
           |     CASE WHEN c3.token <> 'scan' THEN 1 ELSE 0 END) AS changed
           |  FROM c1, c2, c3
           |  WHERE (CASE WHEN c1.token <> 'hash' THEN 1 ELSE 0 END +
           |         CASE WHEN c2.token <> 'joinn' THEN 1 ELSE 0 END +
           |         CASE WHEN c3.token <> 'scan' THEN 1 ELSE 0 END) <= 1),
           |scored AS (SELECT combos.w1 || ' ' || combos.w2 || ' ' ||
           |    combos.w3 AS suggestion, changed,
           |    (ln(CASE WHEN u1.c IS NOT NULL THEN u1.c / N
           |             ELSE 0.4 / N END)
           |     + CASE WHEN b12.c12 IS NOT NULL AND u1.c IS NOT NULL
           |            THEN ln(b12.c12 / u1.c)
           |            ELSE ln(0.4 * (CASE WHEN u2.c IS NOT NULL
           |                 THEN u2.c / N ELSE 0.4 / N END)) END
           |     + CASE WHEN b23.c12 IS NOT NULL AND u2.c IS NOT NULL
           |            THEN ln(b23.c12 / u2.c)
           |            ELSE ln(0.4 * (CASE WHEN u3.c IS NOT NULL
           |                 THEN u3.c / N ELSE 0.4 / N END)) END
           |     + ((3 - changed) * ln(0.95) + changed * ln(0.05)))
           |      AS score
           |  FROM combos CROSS JOIN nn
           |  LEFT JOIN uni u1 ON u1.token = combos.w1
           |  LEFT JOIN uni u2 ON u2.token = combos.w2
           |  LEFT JOIN uni u3 ON u3.token = combos.w3
           |  LEFT JOIN bi b12 ON b12.w1 = combos.w1 AND b12.w2 = combos.w2
           |  LEFT JOIN bi b23 ON b23.w1 = combos.w2 AND b23.w2 = combos.w3),
           |inp AS (SELECT score AS s0 FROM scored WHERE changed = 0)
           |SELECT suggestion,
           |       floor(score * 1000000 + 0.5) / 1000000.0 AS score
           |FROM scored CROSS JOIN inp
           |WHERE changed > 0 AND score > s0
           |ORDER BY 2 DESC, 1 LIMIT 3""".stripMargin,
    // full-recipe MLT replay: like-term tf from doc 5, corpus df,
    // rounded tf*idf selection with the LIMIT cut, the 30%-floor msm,
    // Okapi scoring over the selected terms, like-doc excluded from
    // results AFTER df counts it
    "mlt1_more_like_this" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |lt AS (SELECT t AS term, CAST(count(*) AS DOUBLE) AS ltf
           |       FROM (SELECT unnest(toks) AS t FROM s WHERE doc_id = 5)
           |       GROUP BY 1 HAVING count(*) >= 2),
           |cdf AS (SELECT t AS term,
           |          CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM (SELECT doc_id, unnest(toks) AS t FROM s)
           |        WHERE t IN (SELECT term FROM lt) GROUP BY 1),
           |sel AS (SELECT term FROM (
           |          SELECT l.term,
           |            floor(l.ltf * ln(1 + (st.n - c.df + 0.5) /
           |              (c.df + 0.5)) * 1000000 + 0.5) / 1000000.0 AS ss
           |          FROM lt l JOIN cdf c USING (term), st
           |          WHERE c.df >= 5)
           |        ORDER BY ss DESC, term LIMIT 5),
           |msm AS (SELECT greatest(1,
           |          CAST(floor(count(*) * 30 / 100.0) AS BIGINT)) AS m
           |        FROM sel),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN (SELECT term FROM sel) GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st, msm
           |WHERE doc_id <> 5
           |GROUP BY doc_id, msm.m HAVING count(*) >= msm.m
           |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // BM25 over the STEMMED corpus: doc tokens run the stem CASE
    // macro (list_transform), the query literals run the same macro —
    // the whole minimal_english chain replays rule-for-rule
    "idx9_stemmed_search" ->
      raw"""WITH d2 AS (${graft.queries.QueryUtil.stemFixtureSql}),
           |s AS (SELECT doc_id,
           |        list_transform($toksSql,
           |          t -> ${graft.queries.QueryUtil.stemSql("t")}) AS toks
           |      FROM d2),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN (${graft.queries.QueryUtil.stemSql("'queries'")},
           |                   ${graft.queries.QueryUtil.stemSql("'dogs'")},
           |                   ${graft.queries.QueryUtil.stemSql("'glass'")})
           |       GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    // the flat-corpus replay: no segments exist oracle-side, so a
    // mistake in cross-segment df/stats merging cannot cancel out
    "idx2_index_append" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('spark', 'hash') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // distinct live docs per queried term, over a corpus the deleted
    // docs never entered
    "idx5_term_stats" ->
      raw"""SELECT t AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           |FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents
           |      WHERE doc_id % 7 <> 0)
           |WHERE t IN ('stream', 'filter', 'join', 'spark', 'hash')
           |GROUP BY 1 ORDER BY term""".stripMargin,
    // replay over a corpus the deleted docs never entered: tombstones
    // don't exist oracle-side, so a masking-only implementation (stale
    // component-level replay: tf, len, full-corpus df, 6-dp idf and
    // contribution per (doc 0-9, term)
    "ex1_explain_score" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join')
           |       GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id, t AS term, tf, dl AS len, df,
           |  round(ln(1 + (n - df + 0.5) / (df + 0.5)), 6) AS idf,
           |  round(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)), 6)
           |    AS score_contrib
           |FROM tf JOIN dft USING (t), st
           |WHERE doc_id BETWEEN 0 AND 9
           |ORDER BY doc_id, term""".stripMargin,
    // survivors-only corpus replay after the term-driven tombstones
    "idx14_delete_by_query" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |live AS (SELECT * FROM s
           |         WHERE NOT list_contains(toks, 'join')),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len
           |       FROM live),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM live)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    // live-corpus Okapi for the single full term, the prefix-token
    // gate, +1.0 constant, one rounding — a stale vocabulary, an
    // unadjusted stat, or a per-expansion score would all miss
    "idx13_bool_prefix" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents
           |           WHERE doc_id % 9 <> 4),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t = 'stream' GROUP BY 1, 2),
           |dft AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf),
           |pre AS (SELECT doc_id FROM s
           |        WHERE len(list_filter(toks,
           |                t -> starts_with(t, 'fil'))) > 0)
           |SELECT tf.doc_id,
           |  round(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)) + 1.0, 6)
           |    AS score
           |FROM tf JOIN pre ON pre.doc_id = tf.doc_id, dft, st
           |ORDER BY score DESC, tf.doc_id LIMIT 15""".stripMargin,
    // n, df, or avg len) cannot match
    "idx3_index_delete" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents
           |           WHERE doc_id % 7 <> 0),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // both rankings replayed flat (BM25 CTE + brute cosine CTE), then
    // the 1/(60+rank) fusion — DuckDB's sum of the ≤2 contributions
    // is order-independent (IEEE addition commutes)
    "hy1_hybrid_rrf" -> hybridRrfSql,
    "rtv4_filtered_knn_tree" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |keep AS (SELECT doc_id FROM documents WHERE lang = 'en'),
        |q AS (SELECT list_transform(range(0, 64),
        |        i -> CAST((i*7) % 13 - 6 AS DOUBLE)/10.0) AS qv),
        |s AS (SELECT e.vec_id AS id,
        |        round(list_dot_product(e.v, q.qv) /
        |          (sqrt(list_dot_product(e.v, e.v)) *
        |           sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
        |      FROM e JOIN keep ON e.vec_id = keep.doc_id, q),
        |f AS (SELECT * FROM s ORDER BY score DESC, id LIMIT 15)
        |SELECT CAST(row_number() OVER (ORDER BY score DESC, id)
        |         AS BIGINT) AS rank, id, score
        |FROM f ORDER BY rank""".stripMargin,
    "rtv8_semantic_leg" ->
      raw"""WITH b AS (SELECT doc_id, text, $toksSql AS toks
           |           FROM documents WHERE doc_id < 200),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM b),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM b)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf *
           |           (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |           AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |lex AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY score DESC, doc_id)
           |            AS rank
           |        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id
           |              LIMIT 25)),
           |emb AS (SELECT doc_id,
           |          list_transform(range(0, 8), dd ->
           |            CAST(CAST((('0x' || substr(md5(CAST(dd AS VARCHAR)
           |                || ':' || text), 1, 8))::BIGINT % 2000)
           |              AS DOUBLE) / 1000.0 - 1.0 AS FLOAT)) AS v
           |        FROM b),
           |q AS (SELECT list_transform(range(0, 8), dd ->
           |        CAST(CAST((('0x' || substr(md5(CAST(dd AS VARCHAR)
           |            || ':stream filter merge'), 1, 8))::BIGINT % 2000)
           |          AS DOUBLE) / 1000.0 - 1.0 AS FLOAT)) AS qv),
           |sem0 AS (SELECT doc_id,
           |           round(list_dot_product(v::DOUBLE[], qv::DOUBLE[]) /
           |             (sqrt(list_dot_product(v::DOUBLE[], v::DOUBLE[])) *
           |              sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]))),
           |             6) AS cos
           |         FROM emb, q),
           |sem AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY cos DESC, doc_id)
           |            AS rank
           |        FROM (SELECT * FROM sem0 ORDER BY cos DESC, doc_id
           |              LIMIT 25)),
           |u AS (SELECT doc_id, 1.0/(60 + rank) AS c FROM lex
           |      UNION ALL SELECT doc_id, 1.0/(60 + rank) AS c FROM sem),
           |f AS (SELECT doc_id, round(sum(c), 6) AS score FROM u
           |      GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 25)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |           AS BIGINT) AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    "rag1_semantic_search" -> semanticSearchReplaySql,
    // the IDENTICAL replay: the persistent semantic index at full
    // probing must land on the ad-hoc path's exact answer — the
    // quantizer, cells, packed chunk keys and sidecar never exist
    // oracle-side, so a chunk lost to a mis-assigned cell, a stale
    // sidecar row, or a key-order tie break that disagrees with
    // (doc_id, chunk_no) cannot match
    "sx1_semantic_index_search" -> semanticSearchReplaySql,
    "sft2_multi_turn_masks" ->
      raw"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |ok AS (SELECT doc_id, len(toks) AS l FROM t
           |       WHERE len(toks) >= 4)
           |SELECT doc_id, turn, role, from_token, to_token, n_tokens
           |FROM (
           |  SELECT doc_id, CAST(0 AS BIGINT) AS turn,
           |    'user' AS role, CAST(0 AS BIGINT) AS from_token,
           |    CAST(4 AS BIGINT) AS to_token,
           |    CAST(l + 2 AS BIGINT) AS n_tokens
           |  FROM ok
           |  UNION ALL
           |  SELECT doc_id, CAST(1 AS BIGINT), 'assistant',
           |    CAST(4 AS BIGINT), CAST(l + 2 AS BIGINT),
           |    CAST(l + 2 AS BIGINT)
           |  FROM ok)
           |ORDER BY doc_id, turn""".stripMargin,
    "sft1_loss_mask" ->
      raw"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |ok AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 6),
           |p AS (SELECT doc_id,
           |        array_to_string(toks[1:4], ' ') AS prompt,
           |        array_to_string(toks[5:len(toks)], ' ') AS response,
           |        len(toks) AS l
           |      FROM ok)
           |SELECT doc_id,
           |  '<|user|> ' || prompt || '<|assistant|>: ' || response
           |    AS text,
           |  CAST(l + 1 AS BIGINT) AS n_tokens,
           |  CAST(5 AS BIGINT) AS mask_from
           |FROM p ORDER BY doc_id""".stripMargin,
    "rtv3_pinned_tree" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |org AS (SELECT doc_id, score,
           |          row_number() OVER (ORDER BY score DESC, doc_id) AS r
           |        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id
           |              LIMIT 25)),
           |orgx AS (SELECT doc_id, score, r FROM org
           |         WHERE doc_id NOT IN (42, 7)),
           |pin AS (SELECT * FROM (VALUES
           |          (42, 1000000000.0, 0), (999999, 999999999.0, 1),
           |          (7, 999999998.0, 2)) AS t(doc_id, score, ord)
           |        WHERE doc_id IN (SELECT doc_id FROM documents)),
           |u AS (SELECT doc_id, score, ord FROM pin
           |      UNION ALL SELECT doc_id, score, r + 3 FROM orgx),
           |f AS (SELECT * FROM u ORDER BY ord LIMIT 25)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY ord) AS BIGINT)
           |           AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    "rtv2_reranked_tree" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |lex AS (SELECT doc_id FROM bm ORDER BY score DESC, doc_id
           |        LIMIT 30),
           |r0 AS (SELECT d.doc_id,
           |         ('0x' || substr(md5('streaming filters:' || d.text),
           |           1, 8))::BIGINT / 4294967296.0 AS score
           |       FROM documents d JOIN lex USING (doc_id)),
           |f AS (SELECT * FROM r0 ORDER BY score DESC, doc_id LIMIT 30)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |           AS BIGINT) AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    // the rtv3 pinned replay with the rule adjudications: top-25 BM25
    // -> excluded ids (7, 3) out and survivors re-rank densely ->
    // pin 42 at the sentinel -> final rank cut
    "rtv5_rule_retriever" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |org AS (SELECT doc_id, score,
           |          row_number() OVER (ORDER BY score DESC, doc_id) AS r
           |        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id
           |              LIMIT 25)),
           |cl AS (SELECT doc_id, score,
           |         row_number() OVER (ORDER BY r) AS r2
           |       FROM org WHERE doc_id NOT IN (7, 3)),
           |orgx AS (SELECT doc_id, score, r2 FROM cl
           |         WHERE doc_id <> 42),
           |pin AS (SELECT * FROM (VALUES (42, 1000000000.0, 0))
           |          AS t(doc_id, score, ord)
           |        WHERE doc_id IN (SELECT doc_id FROM documents)),
           |u AS (SELECT doc_id, score, ord FROM pin
           |      UNION ALL SELECT doc_id, score, r2 + 1 FROM orgx),
           |f AS (SELECT * FROM u ORDER BY ord LIMIT 25)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY ord) AS BIGINT)
           |           AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    // the sparse dot product replayed term by term (weight = token
    // tf), ranked into the retriever output surface (rank, id, score)
    "rtv6_sparse_leg" ->
      raw"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |sc AS (SELECT doc_id,
           |    round(2.0 * len(list_filter(toks, x -> x = 'stream')) +
           |          1.0 * len(list_filter(toks, x -> x = 'merge')), 6)
           |      AS score
           |  FROM t
           |  WHERE len(list_filter(toks,
           |    x -> x IN ('stream', 'merge'))) > 0),
           |f AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 30)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |           AS BIGINT) AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 15 ORDER BY rank""".stripMargin,
    // the hy1 replay shape with the match-query term set, re-ranked
    // into the retriever output surface (rank, id, score)
    "rtv1_retriever_tree" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |       FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |lex AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY score DESC, doc_id) AS rank
           |        FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 30)),
           |q AS (SELECT list_transform(range(0, 64),
           |        i -> CAST((i*7) % 13 - 6 AS DOUBLE)/10.0) AS v),
           |sem0 AS (SELECT vec_id AS doc_id,
           |           round(list_dot_product(embedding::DOUBLE[], q.v) /
           |             (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
           |              sqrt(list_dot_product(q.v, q.v))), 6) AS cos
           |         FROM embeddings, q),
           |sem AS (SELECT doc_id,
           |          row_number() OVER (ORDER BY cos DESC, doc_id) AS rank
           |        FROM (SELECT * FROM sem0 ORDER BY cos DESC, doc_id LIMIT 30)),
           |u AS (SELECT doc_id, 1.0/(60 + rank) AS c FROM lex
           |      UNION ALL SELECT doc_id, 1.0/(60 + rank) AS c FROM sem),
           |f AS (SELECT doc_id, round(sum(c), 6) AS score FROM u
           |      GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 30)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |           AS BIGINT) AS rank,
           |         doc_id AS id, score FROM f)
           |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    "rtv7_rescorer_node" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join', 'merge')
           |       GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm1 AS (SELECT doc_id,
           |          round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf *
           |            (1.2 + 1) /
           |            (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |            AS score
           |        FROM tf JOIN dft USING (t), st
           |        WHERE t IN ('stream', 'filter') GROUP BY doc_id),
           |lex AS (SELECT doc_id, score,
           |          row_number() OVER (ORDER BY score DESC, doc_id)
           |            AS rank
           |        FROM (SELECT * FROM bm1 ORDER BY score DESC, doc_id
           |              LIMIT 30)),
           |bm2 AS (SELECT doc_id,
           |          round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf *
           |            (1.2 + 1) /
           |            (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |            AS rs
           |        FROM tf JOIN dft USING (t), st
           |        WHERE t IN ('join', 'merge') GROUP BY doc_id),
           |res AS (SELECT l.doc_id,
           |          CASE WHEN l.rank <= 10 THEN
           |            round(0.7 * l.score + coalesce(1.2 * b.rs, 0), 6)
           |          ELSE l.score END AS score
           |        FROM lex l LEFT JOIN bm2 b ON l.doc_id = b.doc_id)
           |SELECT rank, id, score FROM (
           |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id)
           |           AS BIGINT) AS rank,
           |         doc_id AS id, score FROM res)
           |WHERE rank <= 20 ORDER BY rank""".stripMargin,
    // every cell probed => identical to exact brute force over the raw
    // table: the quantizer, cell layout, and segment plumbing never
    // exist oracle-side, so a vector lost to a mis-assigned cell or a
    // probe that skips a directory cannot match. Query ids shifted out
    // of the corpus space (the index has no notion of query identity)
    "vx1_vector_index_search" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM e WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN e c),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // vx1's brute replay restricted to the even-id corpus — the
    // filter applies BEFORE ranking, so ranks re-number within it
    "vx4_filtered_knn" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM e WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN e c WHERE c.vec_id % 2 = 0),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // vx1's brute replay with the similarity HAVING-cut applied to
    // the rounded cosine before the rank cut
    "vx5_knn_similarity" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM e WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN e c),
        |f AS (SELECT * FROM s WHERE cos >= 0.30),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM f)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,
    // the vx1 brute-force replay verbatim: the exact ADC
    // configuration must land on the identical answer
    "vx3_vector_index_adc" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM e WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN e c),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // brute-force replay over the last-wins-minus-deleted corpus: the
    // upsert tombstones, the delete charge against the upsert
    // segment's live version, and the fresh appends all collapse to
    // plain set algebra oracle-side (DuckDB list lambdas index from 1,
    // hence i-1 — the dd8 convention)
    "vx2_vector_index_upsert" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |updated AS (
        |  SELECT vec_id, list_transform(v, (x, i) ->
        |           x + (CAST((vec_id*31 + (i-1)*7) % 5 AS DOUBLE) - 2.0)*0.001) AS v
        |  FROM base WHERE vec_id % 10 = 0),
        |fresh AS (SELECT vec_id + 500000 AS vec_id, v FROM base WHERE vec_id < 3),
        |live AS (SELECT * FROM (
        |           SELECT * FROM base WHERE vec_id % 10 <> 0
        |           UNION ALL SELECT * FROM updated
        |           UNION ALL SELECT * FROM fresh)
        |         WHERE vec_id % 7 <> 3),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM base WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN live c),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // last-arrival-wins vector corpus (every id whose successor class
    // streamed later carries the affine-jittered update); the streamed
    // tombstone/segment/compaction dance never existed oracle-side
    "st11_stream_vector_index" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |upd AS (SELECT vec_id - 1 AS vec_id,
        |          list_transform(v, x -> x*0.5 + 0.1) AS v
        |        FROM base WHERE vec_id % 3 <> 0),
        |live AS (SELECT coalesce(u.vec_id, b.vec_id) AS vec_id,
        |                coalesce(u.v, b.v) AS v
        |         FROM base b FULL OUTER JOIN upd u ON b.vec_id = u.vec_id),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM base WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN live c),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // last-wins vector corpus MINUS the CDC-deleted slices: the
    // streamed tombstone/segment/compaction dance and the op column
    // never exist oracle-side — a deleted vector surviving in its
    // re-ingest segment, a lost update, or a resurrected id all miss
    "st12_stream_cdc_vector" ->
      """WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |upd AS (SELECT vec_id - 1 AS vec_id,
        |          list_transform(v, x -> x*0.5 + 0.1) AS v
        |        FROM base WHERE vec_id % 4 <> 0),
        |last AS (SELECT coalesce(u.vec_id, b.vec_id) AS vec_id,
        |                coalesce(u.v, b.v) AS v
        |         FROM base b FULL OUTER JOIN upd u ON b.vec_id = u.vec_id),
        |live AS (SELECT * FROM last WHERE vec_id % 16 NOT IN (4, 9)),
        |q AS (SELECT vec_id + 900000 AS q_id, v FROM base WHERE vec_id < 5),
        |s AS (SELECT q.q_id, c.vec_id AS n_id,
        |        round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS cos
        |      FROM q CROSS JOIN live c),
        |r AS (SELECT q_id, n_id, cos,
        |             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // last-arrival-wins corpus: every doc whose successor exists in a
    // LATER batch class (successor doc_id % 4 != 0) carries the
    // successor's update text; the streamed tombstone/segment dance
    // never existed oracle-side
    "st9_stream_upsert_index" ->
      raw"""WITH upd AS (SELECT doc_id - 1 AS doc_id,
           |               text || ' updatedmark' AS text
           |             FROM documents WHERE doc_id % 3 <> 0),
           |corpus AS (SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
           |                  coalesce(u.text, b.text) AS text
           |           FROM documents b FULL OUTER JOIN upd u
           |             ON b.doc_id = u.doc_id),
           |s AS (SELECT doc_id, $toksSql AS toks FROM corpus),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    // last-wins corpus MINUS the CDC-deleted ids (the %16 slices drawn
    // from the base table): tombstones, segments, and the op column
    // never exist oracle-side — a deleted doc surviving, its length
    // still in avg_len, or its rows still in df all miss
    "st10_stream_cdc_index" ->
      raw"""WITH upd AS (SELECT doc_id - 1 AS doc_id,
           |               text || ' updatedmark' AS text
           |             FROM documents WHERE doc_id % 4 <> 0),
           |corpus AS (SELECT coalesce(u.doc_id, b.doc_id) AS doc_id,
           |                  coalesce(u.text, b.text) AS text
           |           FROM documents b FULL OUTER JOIN upd u
           |             ON b.doc_id = u.doc_id),
           |live AS (SELECT c.doc_id, c.text FROM corpus c
           |         WHERE NOT (c.doc_id % 16 IN (4, 9) AND EXISTS
           |           (SELECT 1 FROM documents b2
           |            WHERE b2.doc_id = c.doc_id))),
           |s AS (SELECT doc_id, $toksSql AS toks FROM live),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    // every query's BM25 replayed from the flat table against one
    // (q_id, term) values list, ranked per query with the engine's
    // tie-break (score desc, doc_id) — df/idf shared across queries
    // exactly as the batch plan computes them once per term
    "idx6_batch_search" ->
      raw"""WITH qt AS (SELECT CAST(q AS BIGINT) AS q_id, t
           |            FROM (VALUES (1, 'stream'), (1, 'filter'),
           |              (1, 'join'), (2, 'spark'), (2, 'hash'),
           |              (3, 'vector'), (3, 'spark'),
           |              (3, 'filter')) AS v(q, t)),
           |s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN (SELECT DISTINCT t FROM qt) GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |sc AS (SELECT q.q_id, f.doc_id,
           |         round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf *
           |           (1.2 + 1) /
           |           (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6)
           |           AS score
           |       FROM tf f JOIN dft USING (t) JOIN qt q USING (t), st
           |       GROUP BY 1, 2),
           |r AS (SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
           |         ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
           |         doc_id, score FROM sc)
           |SELECT q_id, rank, doc_id, score FROM r WHERE rank <= 10
           |ORDER BY q_id, rank""".stripMargin,
    // replay over the POST-update corpus: updated docs carry their new
    // text, old versions never existed oracle-side — a tombstone that
    // leaked across segments (masking the re-ingested docs) or stale
    // stats would both miss
    "idx4_index_upsert" ->
      raw"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
           |  UNION ALL
           |  SELECT doc_id, text || ' stream graftupd' AS text
           |  FROM documents WHERE doc_id % 10 = 0
           |  UNION ALL
           |  SELECT doc_id + 90000 AS doc_id,
           |         'filter stream ' || text AS text
           |  FROM documents WHERE doc_id < 5),
           |s AS (SELECT doc_id, $toksSql AS toks FROM corpus),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    // flat replay over the fixture corpus (originals + the planted
    // +10001 clones): segments never exist oracle-side
    "st6_stream_index" ->
      raw"""WITH u AS (SELECT doc_id, text FROM documents
           |           UNION ALL
           |           SELECT doc_id + 10001, text FROM documents
           |           WHERE doc_id < 100),
           |s AS (SELECT doc_id, $toksSql AS toks FROM u),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1)
           |SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |FROM tf JOIN dft USING (t), st
           |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    "sm5_shuffle" ->
      """SELECT c_custkey,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('17:' || CAST(c_custkey AS VARCHAR))) - 1
        |    AS BIGINT) AS ordinal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "voc1_vocab" ->
      raw"""WITH c AS (
           |  SELECT t AS token, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT unnest($toksSql) AS t FROM documents)
           |  GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100)
           |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1
           |         AS BIGINT) AS token_id,
           |       token, cnt
           |FROM c ORDER BY token_id""".stripMargin,
    "voc2_encode" ->
      raw"""WITH c AS (
           |  SELECT t AS token, count(*) AS cnt
           |  FROM (SELECT unnest($toksSql) AS t FROM documents)
           |  GROUP BY 1 ORDER BY cnt DESC, token LIMIT 100),
           |v AS (SELECT token,
           |        CAST(row_number() OVER (ORDER BY cnt DESC, token) - 1
           |          AS BIGINT) AS token_id
           |      FROM c),
           |tok AS (SELECT doc_id, unnest($toksSql) AS t,
           |          generate_subscripts($toksSql, 1) AS pos
           |        FROM documents WHERE doc_id < 50)
           |SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
           |       coalesce(v.token_id, -1) AS token_id
           |FROM tok LEFT JOIN v ON tok.t = v.token
           |ORDER BY doc_id, pos""".stripMargin,
    "ir1_dsir_sample" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |rg AS (SELECT doc_id, t,
           |         ('0x' || substr(md5(t), 1, 8))::BIGINT % 512 AS b
           |       FROM (SELECT doc_id, unnest(toks) AS t FROM s)),
           |tb AS (SELECT b, count(*) AS ct FROM rg
           |       WHERE doc_id % 7 = 0 GROUP BY b),
           |rb AS (SELECT b, count(*) AS cr FROM rg GROUP BY b),
           |nt AS (SELECT coalesce(sum(ct), 0) AS n FROM tb),
           |nr AS (SELECT sum(cr) AS n FROM rb),
           |lr AS (SELECT rb.b,
           |         round(ln((coalesce(tb.ct, 0) + 0.1) /
           |                  (nt.n + 0.1 * 512)) -
           |               ln((rb.cr + 0.1) / (nr.n + 0.1 * 512)),
           |               6) AS log_ratio
           |       FROM rb LEFT JOIN tb USING (b), nt, nr),
           |w AS (SELECT doc_id, round(sum(log_ratio), 6) AS logw
           |      FROM rg JOIN lr USING (b) GROUP BY doc_id),
           |k AS (SELECT doc_id, logw,
           |        round(logw + round(-ln(-ln(
           |          (('0x' || substr(md5('23:' ||
           |             CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
           |          / 4294967296.0)), 6), 6) AS skey
           |      FROM w)
           |SELECT doc_id, logw, skey FROM k
           |ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin,
    "pipe2_bpe_pack" -> {
      val k = 24
      bpeChainSql(k) +
        raw""",
             |seg AS (SELECT word, CAST(len(string_split(trim(s), '  '))
             |          AS BIGINT) AS np FROM s$k),
             |tok AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
             |b AS (SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_tokens
             |      FROM tok JOIN seg ON tok.t = seg.word GROUP BY doc_id),
             |c AS (SELECT doc_id, n_tokens,
             |        COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |          AS cum_before
             |      FROM b)
             |SELECT doc_id, n_tokens, CAST(cum_before AS BIGINT)
             |         AS cum_before,
             |       CAST(floor(cum_before / 512.0) AS BIGINT) AS bin
             |FROM c ORDER BY doc_id""".stripMargin
    },
    "km1_kmeans" -> {
      val (k, iters) = (5, 3)
      kmeansChainSql(k, iters) +
        raw""",
             |df AS (SELECT p.vec_id, c.cl,
             |    round(-2 * list_dot_product(p.v, c.c) +
             |          list_dot_product(c.c, c.c), 6) AS d
             |  FROM pts p, c$iters c)
             |SELECT vec_id, cl AS cluster FROM (
             |  SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY d, cl) AS rk FROM df) WHERE rk = 1
             |ORDER BY vec_id""".stripMargin
    },
    // km1's assignment chain + sm2's md5-ranked per-cluster cap
    "qf5_cluster_capped" -> {
      val (k, iters) = (5, 3)
      kmeansChainSql(k, iters) +
        raw""",
             |df AS (SELECT p.vec_id, c.cl,
             |    round(-2 * list_dot_product(p.v, c.c) +
             |          list_dot_product(c.c, c.c), 6) AS d
             |  FROM pts p, c$iters c),
             |asg AS (SELECT vec_id, cl FROM (
             |  SELECT vec_id, cl, row_number() OVER (PARTITION BY vec_id
             |    ORDER BY d, cl) AS rk FROM df) WHERE rk = 1),
             |capped AS (SELECT vec_id, cl FROM (
             |  SELECT vec_id, cl, row_number() OVER (PARTITION BY cl
             |    ORDER BY md5('11:' || vec_id)) AS sr FROM asg)
             |  WHERE sr <= 30)
             |SELECT vec_id, cl AS cluster FROM capped
             |ORDER BY vec_id""".stripMargin
    },
    "cd1_content_chunks" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents
           |           WHERE doc_id < 100),
           |e AS (SELECT doc_id, toks, unnest(toks) AS tok,
           |        generate_subscripts(toks, 1) - 1 AS pos FROM s),
           |b AS (SELECT doc_id, pos, tok,
           |        CASE WHEN pos >= 2 AND
           |          ('0x' || substr(md5(array_to_string(
           |             toks[greatest(pos - 1, 1) : pos + 1], ' ')),
           |             1, 8))::BIGINT % 16 = 0
           |        THEN 1 ELSE 0 END AS bf
           |      FROM e),
           |c AS (SELECT doc_id, pos, tok,
           |        coalesce(SUM(bf) OVER (PARTITION BY doc_id
           |          ORDER BY pos
           |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |          0) AS chunk_id
           |      FROM b)
           |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           |       CAST(min(pos) AS BIGINT) AS start_pos,
           |       CAST(count(*) AS BIGINT) AS n_tokens,
           |       string_agg(tok, ' ' ORDER BY pos) AS chunk_text
           |FROM c GROUP BY doc_id, chunk_id
           |ORDER BY doc_id, chunk_id""".stripMargin,
    "cu1_curriculum_shards" ->
      """WITH o AS (SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
        |    AS BIGINT) AS ordinal
        |  FROM documents)
        |SELECT doc_id, CAST(ordinal // 100 AS BIGINT) AS shard, ordinal
        |FROM o ORDER BY ordinal""".stripMargin,
    "sh1_export_shards" ->
      """WITH o AS (SELECT c_custkey,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('17:' || CAST(c_custkey AS VARCHAR))) - 1
        |    AS BIGINT) AS ordinal
        |  FROM customer)
        |SELECT c_custkey, CAST(ordinal // 100 AS BIGINT) AS shard, ordinal
        |FROM o ORDER BY ordinal""".stripMargin,
    "mv1_maxsim_rerank" -> maxSimRerankSql,
    "bpe1_train_merges" -> {
      val k = 24
      bpeChainSql(k) + ",\nmm AS (" +
        (0 until k).map(i =>
          s"SELECT CAST($i AS BIGINT) AS rank, l AS lft, r AS rgt FROM m$i")
          .mkString("\n UNION ALL ") +
        ")\nSELECT rank, lft, rgt FROM mm ORDER BY rank"
    },
    "wp1_train" -> ("WITH RECURSIVE " + wpChainSql(12) +
      "\nSELECT rank, piece FROM wpvocab ORDER BY rank"),
    "wp2_encode" -> ("WITH RECURSIVE " + wpChainSql(12) +
      wpEncodeTailSql),
    "spm1_train" -> spmChainSql(vocabSize = 60, maxPieceLen = 4,
      iters = 2, seedSize = 200, maxJ = 12, withEncode = false),
    "spm2_encode" -> spmChainSql(vocabSize = 60, maxPieceLen = 4,
      iters = 2, seedSize = 200, maxJ = 12, withEncode = true),
    // the .vocab round-trip encodes from the imported model — same
    // walk, same SQL as spm2
    "spm3_encode_spm_roundtrip" -> spmChainSql(vocabSize = 60,
      maxPieceLen = 4, iters = 2, seedSize = 200, maxJ = 12,
      withEncode = true),
    "bpe2_encode" -> bpeEncodeSql,
    // save/load round-trip encodes from the LOADED model; the merge
    // walk it must reproduce is bpe2's, replayed by the same SQL
    "bpe3_encode_loaded" -> bpeEncodeSql,
    // merges.txt round-trip encodes from the IMPORTED model — same
    // walk, same SQL
    "bpe4_encode_hf_roundtrip" -> bpeEncodeSql,
    // the scan phrase-match replay (g10's boundary-space spelling):
    // adjacency in the token stream, which is exactly what the
    // positional postings encode
    "idx7_phrase_search" ->
      raw"""SELECT doc_id FROM documents
           |WHERE instr(' ' || array_to_string($toksSql, ' ') || ' ',
           |            ' the fast ') > 0
           |ORDER BY doc_id""".stripMargin,
    "hy4_hybrid_linear" -> hybridLinearSql,
    "hy5_hybrid_index_linear" -> hybridLinearSql,
    // phrase-BM25 replay: per-doc adjacent-pair recount (1-indexed
    // generate_series, inclusive), per-term dfs, summed idf, Okapi
    // saturation, 6-dp round, id ties
    // full BM25 ranking replayed once; p1 = ranks 1-7, p2 = 8-14 —
    // rank-range equality IS the no-overlap-no-gap tiling proof
    "idx17_search_after" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |tf AS (SELECT doc_id, dl, t, CAST(count(*) AS DOUBLE) AS tf
           |       FROM (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |               unnest(toks) AS t FROM s)
           |       WHERE t IN ('stream', 'filter', 'join') GROUP BY 1, 2, 3),
           |dft AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
           |        FROM tf GROUP BY 1),
           |bm AS (SELECT doc_id,
           |  round(sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1) /
           |    (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))), 6) AS score
           |  FROM tf JOIN dft USING (t), st GROUP BY doc_id),
           |rk AS (SELECT doc_id, score, row_number() OVER (
           |    ORDER BY score DESC, doc_id) AS rn FROM bm)
           |SELECT doc_id, score,
           |  CASE WHEN rn <= 7 THEN 'p1' ELSE 'p2' END AS q
           |FROM rk WHERE rn <= 14
           |ORDER BY q, score DESC, doc_id""".stripMargin,
    // phrase leg: completed occurrences only ('the' then a fas-token),
    // idf of the full term, + the constant 1.0 prefix clause; bare
    // leg: prefix containment at 1.0, id order
    "idx16_phrase_prefix_search" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |pt AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |         CAST(len([i FOR i IN generate_series(1, len(toks) - 1)
           |                   IF toks[i] = 'the'
           |                   AND starts_with(toks[i + 1], 'fas')])
           |           AS DOUBLE) AS ptf
           |       FROM s),
           |dfs AS (SELECT
           |  CAST((SELECT count(*) FROM s WHERE list_contains(toks, 'the'))
           |    AS DOUBLE) AS df1),
           |ph AS (SELECT doc_id,
           |    round(ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
           |          * ptf * (1.2 + 1) /
           |          (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len))
           |          + 1.0, 6) AS score,
           |    'phrase' AS q
           |  FROM pt, st, dfs WHERE ptf > 0
           |  ORDER BY score DESC, doc_id LIMIT 15),
           |bare AS (SELECT doc_id, 1.0 AS score, 'bare' AS q FROM s
           |  WHERE len(list_filter(toks, t -> starts_with(t, 'mer'))) > 0
           |  ORDER BY doc_id LIMIT 15)
           |SELECT doc_id, score, q FROM ph
           |UNION ALL SELECT doc_id, score, q FROM bare
           |ORDER BY q, score DESC, doc_id""".stripMargin,
    "idx19_sloppy_phrase" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |pt AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |         -- anchored tf, Lucene match set: filter at j with
           |         -- |i - (j-1)| <= slop(2) and j <> i — transposed
           |         -- ('filter' one before 'stream') included
           |         CAST(len(list_filter(range(1, len(toks) + 1),
           |           i -> toks[i] = 'stream' AND
           |             len(list_filter(range(i - 1, i + 4),
           |               j -> j <> i AND toks[j] = 'filter')) > 0))
           |           AS DOUBLE) AS ptf
           |       FROM s),
           |dfs AS (SELECT
           |  CAST((SELECT count(*) FROM s
           |        WHERE list_contains(toks, 'stream')) AS DOUBLE) AS df1,
           |  CAST((SELECT count(*) FROM s
           |        WHERE list_contains(toks, 'filter')) AS DOUBLE) AS df2)
           |SELECT doc_id,
           |  round((ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) +
           |         ln(1 + (n - df2 + 0.5) / (df2 + 0.5)))
           |        * ptf * (1.2 + 1) /
           |        (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)), 6)
           |    AS score
           |FROM pt, st, dfs WHERE ptf > 0
           |ORDER BY score DESC, doc_id LIMIT 12""".stripMargin,
    "idx8_phrase_score" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |              avg(CAST(len(toks) AS DOUBLE)) AS avg_len FROM s),
           |pt AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           |         CAST(len([i FOR i IN generate_series(1, len(toks) - 1)
           |                   IF toks[i] = 'the' AND toks[i + 1] = 'fast'])
           |           AS DOUBLE) AS ptf
           |       FROM s),
           |dfs AS (SELECT
           |  CAST((SELECT count(*) FROM s WHERE list_contains(toks, 'the'))
           |    AS DOUBLE) AS df1,
           |  CAST((SELECT count(*) FROM s WHERE list_contains(toks, 'fast'))
           |    AS DOUBLE) AS df2)
           |SELECT doc_id,
           |  round((ln(1 + (n - df1 + 0.5) / (df1 + 0.5)) +
           |         ln(1 + (n - df2 + 0.5) / (df2 + 0.5)))
           |        * ptf * (1.2 + 1) /
           |        (ptf + 1.2 * (1 - 0.75 + 0.75 * dl / avg_len)), 6)
           |    AS score
           |FROM pt, st, dfs WHERE ptf > 0
           |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,
    "dd12_incremental_neardup" ->
      raw"""WITH s AS (SELECT doc_id, $shinglesSql AS sh FROM documents),
           |a AS (SELECT doc_id AS id, sh AS sa FROM s
           |      WHERE doc_id % 2 = 1 AND len(sh) > 0),
           |b AS (SELECT doc_id AS reg_id, sh AS sb FROM s
           |      WHERE doc_id % 2 = 0 AND len(sh) > 0),
           |j AS (SELECT a.id AS doc_id, b.reg_id,
           |        CAST(len(list_intersect(sa, sb)) AS DOUBLE) /
           |        (len(sa) + len(sb) - len(list_intersect(sa, sb))) AS jx
           |      FROM a, b)
           |SELECT doc_id, reg_id, round(jx, 6) AS jaccard
           |FROM j WHERE jx >= 0.8
           |ORDER BY doc_id, reg_id""".stripMargin,
    // sequential 4-batch replay: clean_k = batch k minus its matches
    // against clean_0..k-1; matches accumulate across batches
    "st5_stream_neardup" -> seqNearDupReplaySql,
    // identical replay: exactly-once delivery changes WHERE the match
    // rows land (committed per-batch dirs), never WHICH rows match
    "st8_stream_neardup_eo" -> seqNearDupReplaySql,
    "dd11_incremental_dedup" ->
      """WITH b2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
        |k AS (SELECT min(doc_id) AS doc_id FROM b2 GROUP BY md5(text))
        |SELECT d.doc_id FROM b2 d JOIN k USING (doc_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents b1
        |  WHERE b1.doc_id % 2 = 0 AND md5(b1.text) = md5(d.text))
        |ORDER BY doc_id""".stripMargin,
    "emb3_matryoshka_topk" ->
      """WITH base AS (SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v
        |              FROM embeddings),
        |qs AS (SELECT vec_id AS q_id, v AS qv FROM base WHERE vec_id < 5),
        |s AS (SELECT qs.q_id, b.vec_id AS n_id,
        |        round(list_dot_product(b.v, qs.qv) /
        |          (sqrt(list_dot_product(b.v, b.v)) *
        |           sqrt(list_dot_product(qs.qv, qs.qv))), 6) AS cos16
        |      FROM base b, qs WHERE b.vec_id <> qs.q_id),
        |r AS (SELECT q_id, n_id, cos16,
        |        CAST(row_number() OVER (PARTITION BY q_id
        |          ORDER BY cos16 DESC, n_id) AS BIGINT) AS rank
        |      FROM s)
        |SELECT q_id, rank, n_id, cos16 FROM r WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,
    "chunk1_token_windows" ->
      raw"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (SELECT doc_id, toks,
           |        CAST(ceil(greatest(len(toks) - 32, 0) / 16.0) AS INT) + 1
           |          AS nch
           |      FROM b),
           |e AS (SELECT doc_id, toks,
           |        unnest(generate_series(0, nch - 1)) AS i
           |      FROM c)
           |SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
           |       array_to_string(toks[i*16+1 : i*16+32], ' ') AS chunk_text,
           |       CAST(len(toks[i*16+1 : i*16+32]) AS BIGINT) AS n_tok
           |FROM e ORDER BY doc_id, chunk_no""".stripMargin,
    "pipe1_corpus_pipeline" ->
      raw"""WITH sh AS (SELECT doc_id, text, source,
           |              ${shinglesSqlN(5)} AS s FROM documents),
           |keep AS (SELECT min(doc_id) AS doc_id FROM documents
           |         GROUP BY md5(text)),
           |bg AS (SELECT DISTINCT g
           |       FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 250 = 0)),
           |dirty AS (SELECT DISTINCT doc_id
           |          FROM (SELECT doc_id, unnest(s) AS g FROM sh) c
           |          JOIN bg USING (g)),
           |base AS (
           |  SELECT d.doc_id, d.source, CAST(len($toksSql) AS BIGINT) AS n_tok
           |  FROM documents d JOIN keep USING (doc_id)
           |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dirty)
           |    AND len($toksSql) >= 5)
           |SELECT doc_id, source, n_tok FROM base
           |WHERE ('0x' || substr(md5('13:' || source), 1, 8))::BIGINT
           |        / 4294967296.0 < 0.8
           |ORDER BY doc_id""".stripMargin,
    "io4_upsert" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 1000.0
        |       ELSE c_acctbal END AS c_acctbal
        |FROM customer
        |UNION ALL
        |SELECT * FROM (VALUES (CAST(9000001 AS BIGINT), 'upsert new a', 1.5),
        |                      (9000002, 'upsert new b', 2.5)) t(k, n, b)
        |ORDER BY c_custkey""".stripMargin,
    "io7_update_by_query" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal < 0
        |       THEN 'BUILDING_RESET' ELSE c_mktsegment END
        |    AS c_mktsegment,
        |  CASE WHEN c_mktsegment = 'BUILDING' AND c_acctbal < 0
        |       THEN 0.0 ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "io2_json_roundtrip" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
        |       o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "io5_orc_roundtrip" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderstatus,
        |       o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    "st2_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "sm4_group_split" ->
      """SELECT doc_id, source,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id, source,
        |        ('0x' || substr(md5('13:' || source), 1, 8))::BIGINT
        |          / 4294967296.0 AS u
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "io3_ingest" ->
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "t7_redact" ->
      raw"""WITH p AS (
           |  SELECT doc_id,
           |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
           |      '@example.com or +1-555-' ||
           |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(text,
           |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(text,
           |    '\+1-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           |  regexp_replace(
           |    regexp_replace(text,
           |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |    '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
           |FROM p ORDER BY doc_id""".stripMargin,
    // per-strategy slice replay (DuckDB list slicing is 1-based
    // inclusive, matching Spark's slice(start, len) arithmetic here)
    "trunc1_token_budget" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks,
           |             len($toksSql) AS n
           |           FROM documents WHERE doc_id < 40)
           |SELECT doc_id, 'head' AS strategy,
           |  CASE WHEN n > 58 THEN array_to_string(toks[1:58], ' ')
           |       ELSE array_to_string(toks, ' ') END AS text,
           |  CAST(least(n, 58) AS BIGINT) AS n_tokens,
           |  n > 58 AS truncated
           |FROM s
           |UNION ALL
           |SELECT doc_id, 'tail',
           |  CASE WHEN n > 58 THEN array_to_string(toks[n - 57:n], ' ')
           |       ELSE array_to_string(toks, ' ') END,
           |  CAST(least(n, 58) AS BIGINT), n > 58
           |FROM s
           |UNION ALL
           |SELECT doc_id, 'middle_out',
           |  CASE WHEN n > 58 THEN array_to_string(
           |         list_concat(toks[1:29], toks[n - 28:n]), ' ')
           |       ELSE array_to_string(toks, ' ') END,
           |  CAST(least(n, 58) AS BIGINT), n > 58
           |FROM s
           |ORDER BY strategy, doc_id""".stripMargin,
    // per-position replay: the select draw, the 80/10/10 kind draw,
    // and the in-doc replacement index all from the same md5 strings
    "mlm1_masking" -> {
      def uu(salt: String) =
        s"(('0x' || substr(md5('7:$salt:' || CAST(doc_id AS VARCHAR) " +
          s"|| ':' || CAST(p AS VARCHAR)), 1, 8))::BIGINT)"
      val u1 = s"(${uu("mlm")} / 4294967296.0)"
      val u2 = s"(${uu("mlmk")} / 4294967296.0)"
      val ur = uu("mlmr")
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents
           |           WHERE doc_id < 50)
           |SELECT doc_id,
           |  array_to_string(list_transform(range(1, len(toks) + 1), p ->
           |    CASE WHEN $u1 >= 0.15 THEN toks[p]
           |         WHEN $u2 < 0.8 THEN '[MASK]'
           |         WHEN $u2 < 0.9
           |           THEN toks[CAST($ur % len(toks) + 1 AS INT)]
           |         ELSE toks[p] END), ' ') AS text,
           |  array_to_string(list_filter(list_transform(
           |      range(1, len(toks) + 1), p ->
           |    CASE WHEN $u1 < 0.15
           |      THEN CAST(p - 1 AS VARCHAR) || ':' || toks[p] END),
           |    x -> x IS NOT NULL), ' ') AS labels,
           |  CAST(len(list_filter(range(1, len(toks) + 1),
           |    p -> $u1 < 0.15)) AS BIGINT) AS n_masked
           |FROM s ORDER BY doc_id""".stripMargin
    },
    // per-window replay: same md5 span lengths (mod maxSpan + 1,
    // capped by the window), same slicing arithmetic, same sentinel
    // numbering and terminator
    "span1_corruption" ->
      raw"""WITH s AS (SELECT doc_id, $toksSql AS toks FROM documents
           |           WHERE doc_id < 50),
           |b AS (SELECT doc_id, toks, len(toks) AS n,
           |        CAST(ceil(len(toks) / 16.0) AS INT) AS nb FROM s),
           |bl AS (SELECT doc_id, toks, n, nb,
           |    list_transform(range(0, nb), w ->
           |      struct_pack(st := CAST(w * 16 AS INT),
           |        mk := CAST(least(
           |          ('0x' || substr(md5('7:span:' ||
           |            CAST(doc_id AS VARCHAR) || ':' ||
           |            CAST(w AS VARCHAR)), 1, 8))::BIGINT % 4 + 1,
           |          least(16, n - w * 16)) AS INT),
           |        kk := CAST(w AS INT))) AS blocks
           |  FROM b)
           |SELECT doc_id,
           |  array_to_string(flatten(list_transform(blocks, x ->
           |    list_concat(['<extra_id_' || CAST(x.kk AS VARCHAR) || '>'],
           |      toks[x.st + x.mk + 1 : x.st + least(16, n - x.st)]))),
           |    ' ') AS inputs,
           |  array_to_string(list_concat(
           |    flatten(list_transform(blocks, x ->
           |      list_concat(['<extra_id_' || CAST(x.kk AS VARCHAR) || '>'],
           |        toks[x.st + 1 : x.st + x.mk]))),
           |    ['<extra_id_' || CAST(nb AS VARCHAR) || '>']), ' ')
           |    AS targets,
           |  CAST(list_sum(list_transform(blocks, x -> x.mk)) AS BIGINT)
           |    AS n_masked
           |FROM bl ORDER BY doc_id""".stripMargin,
    // the PSM rewrite replayed: same md5 uniforms (apply draw + two
    // cuts mod len+1), same least/greatest cut ordering, same substr
    // arithmetic
    "fim1_transform" ->
      raw"""WITH p AS (SELECT doc_id, text,
           |    ('0x' || substr(md5('7:fimr:' || CAST(doc_id AS VARCHAR)),
           |      1, 8))::BIGINT / 4294967296.0 AS u,
           |    ('0x' || substr(md5('7:fim1:' || CAST(doc_id AS VARCHAR)),
           |      1, 8))::BIGINT % (length(text) + 1) AS c1,
           |    ('0x' || substr(md5('7:fim2:' || CAST(doc_id AS VARCHAR)),
           |      1, 8))::BIGINT % (length(text) + 1) AS c2
           |  FROM documents WHERE doc_id < 60)
           |SELECT doc_id,
           |  (text IS NOT NULL AND u < 0.5) AS fim_applied,
           |  CASE WHEN text IS NOT NULL AND u < 0.5 THEN
           |    '<PRE>' || substr(text, 1, CAST(least(c1, c2) AS INT)) ||
           |    '<SUF>' || substr(text, CAST(greatest(c1, c2) + 1 AS INT),
           |      CAST(length(text) - greatest(c1, c2) AS INT)) ||
           |    '<MID>' || substr(text, CAST(least(c1, c2) + 1 AS INT),
           |      CAST(greatest(c1, c2) - least(c1, c2) AS INT))
           |  ELSE text END AS text
           |FROM p ORDER BY doc_id""".stripMargin,
    // the digest join replayed: same fixture derivation, same md5
    // digests, same presence-flag CASE order, null-safe digest compare
    "vd1_snapshot_diff" ->
      raw"""WITH o AS (SELECT doc_id, md5(text) AS old_digest
           |           FROM documents),
           |n AS (SELECT doc_id,
           |        md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
           |            ELSE text END) AS new_digest
           |      FROM documents WHERE doc_id % 7 <> 0
           |      UNION ALL
           |      SELECT doc_id + 1000000, md5(text) FROM documents
           |      WHERE doc_id % 13 = 0)
           |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           |  CASE WHEN o.doc_id IS NOT NULL AND n.doc_id IS NULL
           |         THEN 'removed'
           |       WHEN o.doc_id IS NULL THEN 'added'
           |       WHEN o.old_digest IS NOT DISTINCT FROM n.new_digest
           |         THEN 'unchanged'
           |       ELSE 'changed' END AS status,
           |  o.old_digest, n.new_digest
           |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
           |ORDER BY doc_id""".stripMargin,
    // the Luhn fold replayed: dd = separator-stripped match, every
    // second digit from the right doubles 9-wrapped, %10 gates the
    // replace — list indexing over range, exactly the engine's HOF
    "t16_redact_extended" -> {
      val dd = "replace(replace(m, ' ', ''), '-', '')"
      val luhn =
        s"(list_sum(list_transform(range(1, length($dd) + 1), j -> " +
          s"CASE WHEN (length($dd) - j) % 2 = 1 THEN " +
          s"CASE WHEN CAST(substr($dd, CAST(j AS INT), 1) AS INT) * 2 > 9 " +
          s"THEN CAST(substr($dd, CAST(j AS INT), 1) AS INT) * 2 - 9 " +
          s"ELSE CAST(substr($dd, CAST(j AS INT), 1) AS INT) * 2 END " +
          s"ELSE CAST(substr($dd, CAST(j AS INT), 1) AS INT) END)) " +
          s"% 10) = 0"
      raw"""WITH p AS (
           |  SELECT doc_id, text || CASE CAST(doc_id % 4 AS INT)
           |    WHEN 0 THEN ' card 4111-1111-1111-1111 now'
           |    WHEN 1 THEN ' card 4111 1111 1111 1112 now'
           |    WHEN 2 THEN ' from 10.0.0.1 by ops@example.com'
           |    ELSE ' plain 1234567890123456' END AS text
           |  FROM documents WHERE doc_id < 40),
           |r AS (SELECT doc_id, regexp_replace(regexp_replace(
           |    regexp_replace(text,
           |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           |    '\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
           |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS t
           |  FROM p)
           |SELECT doc_id,
           |  list_reduce(list_prepend(t, list_filter(list_distinct(
           |    regexp_extract_all(t, '\b[0-9]{4}([ -]?[0-9]{4}){3}\b')),
           |    m -> $luhn)), (acc, m) -> replace(acc, m, '<CC>'))
           |    AS redacted
           |FROM r ORDER BY doc_id""".stripMargin
    },
    "t13_repetition_signals" ->
      s"""WITH ${repetitionSigSql(repetitionCorpusSql)}
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin,
    // self-trained bigram fluency (ppl1's exact CTEs) rank-cut into
    // per-source thirds; rank ties break on doc_id, the score is the
    // 6-dp round both engines share
    "qf3_perplexity_buckets" ->
      raw"""WITH b AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |tr AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2
           |       FROM b WHERE len(toks) >= 2),
           |big AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
           |        FROM tr GROUP BY 1, 2),
           |uni AS (SELECT t AS w1, CAST(count(*) AS DOUBLE) AS cu
           |        FROM (SELECT unnest(toks) AS t FROM b) GROUP BY 1),
           |v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni),
           |sc AS (SELECT tr.doc_id,
           |         round(avg(ln((coalesce(cb, 0) + 0.5) /
           |                      (coalesce(cu, 0) + 0.5 * vs))), 6)
           |           AS mean_logp
           |       FROM tr LEFT JOIN big USING (w1, w2)
           |            LEFT JOIN uni USING (w1), v
           |       GROUP BY tr.doc_id),
           |g AS (SELECT d.doc_id, d.source, sc.mean_logp,
           |        row_number() OVER (PARTITION BY d.source
           |          ORDER BY sc.mean_logp DESC, d.doc_id) AS rn,
           |        count(*) OVER (PARTITION BY d.source) AS n
           |      FROM documents d JOIN sc ON sc.doc_id = d.doc_id)
           |SELECT doc_id, source, mean_logp,
           |  CASE WHEN rn * 3 <= n THEN 'head'
           |       WHEN rn * 3 <= 2 * n THEN 'middle'
           |       ELSE 'tail' END AS bucket
           |FROM g ORDER BY doc_id""".stripMargin,
    // the composed replay: quality CTEs (q_), repetition CTEs (r_)
    // over quality survivors, keep-first dedup, then ppl1's LM chain
    // trained on the deduped survivors and rank-cut per source
    "pipe3_curation_pipeline" ->
      raw"""WITH ${qualitySigSql("SELECT doc_id, text FROM documents", "q_")},
           |qf_ids AS (SELECT doc_id FROM q_sig
           |  WHERE n_words >= 50 AND n_words <= 100000
           |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
           |    AND symbol_word_ratio <= 0.1
           |    AND bullet_start_frac <= 0.9 AND ellipsis_end_frac <= 0.3
           |    AND alpha_word_frac >= 0.8 AND stop_hits >= 1),
           |${repetitionSigSql(
               "SELECT d.doc_id, d.text FROM documents d " +
                 "JOIN qf_ids USING (doc_id)", "r_")},
           |rf_ids AS (SELECT doc_id FROM r_sig
           |  WHERE dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
           |    AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
           |    AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
           |    AND top_4gram_char_frac <= 0.16 AND dup_5gram_char_frac <= 0.15
           |    AND dup_6gram_char_frac <= 0.14 AND dup_7gram_char_frac <= 0.13
           |    AND dup_8gram_char_frac <= 0.12 AND dup_9gram_char_frac <= 0.11
           |    AND dup_10gram_char_frac <= 0.10),
           |surv AS (SELECT doc_id, source, text FROM (
           |    SELECT d.doc_id, d.source, d.text,
           |      row_number() OVER (PARTITION BY md5(d.text)
           |        ORDER BY d.doc_id) AS rn
           |    FROM documents d JOIN rf_ids USING (doc_id)) WHERE rn = 1),
           |b AS (SELECT doc_id, $toksSql AS toks FROM surv),
           |tr AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
           |              unnest(toks[2:len(toks)]) AS w2
           |       FROM b WHERE len(toks) >= 2),
           |big AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS cb
           |        FROM tr GROUP BY 1, 2),
           |uni AS (SELECT t AS w1, CAST(count(*) AS DOUBLE) AS cu
           |        FROM (SELECT unnest(toks) AS t FROM b) GROUP BY 1),
           |v AS (SELECT CAST(count(*) AS DOUBLE) AS vs FROM uni),
           |sc AS (SELECT tr.doc_id,
           |         round(avg(ln((coalesce(cb, 0) + 0.5) /
           |                      (coalesce(cu, 0) + 0.5 * vs))), 6)
           |           AS mean_logp
           |       FROM tr LEFT JOIN big USING (w1, w2)
           |            LEFT JOIN uni USING (w1), v
           |       GROUP BY tr.doc_id),
           |g AS (SELECT s2.doc_id, s2.source, sc.mean_logp,
           |        row_number() OVER (PARTITION BY s2.source
           |          ORDER BY sc.mean_logp DESC, s2.doc_id) AS rn,
           |        count(*) OVER (PARTITION BY s2.source) AS n
           |      FROM surv s2 JOIN sc ON sc.doc_id = s2.doc_id)
           |SELECT doc_id, source, bucket FROM (
           |  SELECT doc_id, source,
           |    CASE WHEN rn * 3 <= n THEN 'head'
           |         WHEN rn * 3 <= 2 * n THEN 'middle'
           |         ELSE 'tail' END AS bucket
           |  FROM g)
           |WHERE bucket <> 'tail' ORDER BY doc_id""".stripMargin,
    // both signal fragments replayed over the planted report corpus,
    // then one integer-only rollup per source
    "zipf1_zipf_fit" ->
      raw"""WITH tf AS (SELECT t, CAST(count(*) AS DOUBLE) AS f FROM (
           |        SELECT unnest($toksSql) AS t FROM documents)
           |      GROUP BY 1),
           |top AS (SELECT f, row_number() OVER (ORDER BY f DESC, t)
           |          AS rank
           |        FROM tf ORDER BY f DESC, t LIMIT 100),
           |p AS (SELECT ln(rank) AS x, ln(f) AS y FROM top),
           |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
           |        sum(x*x) AS sxx, sum(y*y) AS syy FROM p)
           |SELECT CAST(n AS BIGINT) AS n_terms,
           |  floor(((sxy - sx*sy/n) / (sxx - sx*sx/n)) * 1e6 + 0.5)
           |    / 1e6 AS slope,
           |  floor(((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx)
           |    / n) * 1e6 + 0.5) / 1e6 AS intercept,
           |  floor((pow(sxy - sx*sy/n, 2) /
           |    ((sxx - sx*sx/n) * (syy - sy*sy/n))) * 1e6 + 0.5)
           |    / 1e6 AS r2
           |FROM m""".stripMargin,
    "rep1_corpus_report" ->
      raw"""WITH rc AS (
           |  SELECT doc_id, source, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 70000, source,
           |         text || ' the be to of and that have with'
           |  FROM documents WHERE doc_id % 20 = 0
           |  UNION ALL
           |  SELECT doc_id + 60000, source, text || ' ' || text
           |  FROM documents WHERE doc_id % 40 = 0
           |  UNION ALL
           |  SELECT doc_id + 120000, source, text
           |  FROM documents WHERE doc_id % 50 = 0),
           |${qualitySigSql("SELECT doc_id, text FROM rc", "q_")},
           |${repetitionSigSql("SELECT doc_id, text FROM rc", "r_")}
           |SELECT rc.source,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(len(qb.toks)) AS BIGINT) AS n_tokens,
           |  CAST(sum(length(rc.text)) AS BIGINT) AS n_chars,
           |  CAST(sum(CASE WHEN NOT (q.n_words >= 50 AND q.n_words <= 100000
           |    AND q.mean_word_len >= 3.0 AND q.mean_word_len <= 10.0
           |    AND q.symbol_word_ratio <= 0.1
           |    AND q.bullet_start_frac <= 0.9 AND q.ellipsis_end_frac <= 0.3
           |    AND q.alpha_word_frac >= 0.8 AND q.stop_hits >= 1)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_quality,
           |  CAST(sum(CASE WHEN NOT (r.dup_line_frac <= 0.30
           |    AND r.dup_para_frac <= 0.30 AND r.dup_line_char_frac <= 0.20
           |    AND r.dup_para_char_frac <= 0.20
           |    AND r.top_2gram_char_frac <= 0.20
           |    AND r.top_3gram_char_frac <= 0.18
           |    AND r.top_4gram_char_frac <= 0.16
           |    AND r.dup_5gram_char_frac <= 0.15
           |    AND r.dup_6gram_char_frac <= 0.14
           |    AND r.dup_7gram_char_frac <= 0.13
           |    AND r.dup_8gram_char_frac <= 0.12
           |    AND r.dup_9gram_char_frac <= 0.11
           |    AND r.dup_10gram_char_frac <= 0.10)
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_repetition,
           |  CAST(count(*) - count(DISTINCT md5(rc.text)) AS BIGINT)
           |    AS n_exact_dup
           |FROM rc
           |JOIN q_b qb ON qb.doc_id = rc.doc_id
           |JOIN q_sig q ON q.doc_id = rc.doc_id
           |JOIN r_sig r ON r.doc_id = rc.doc_id
           |GROUP BY rc.source ORDER BY rc.source""".stripMargin,
    "t14_gopher_quality_signals" ->
      s"""WITH ${qualitySigSql(qualityCorpusSql)}
         |SELECT * FROM sig ORDER BY doc_id""".stripMargin,
    "qf4_gopher_quality_filter" ->
      s"""WITH ${qualitySigSql(qualityCorpusSql)}
         |SELECT doc_id FROM sig
         |WHERE n_words >= 50 AND n_words <= 100000
         |  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |  AND symbol_word_ratio <= 0.1
         |  AND bullet_start_frac <= 0.9 AND ellipsis_end_frac <= 0.3
         |  AND alpha_word_frac >= 0.8 AND stop_hits >= 2
         |ORDER BY doc_id""".stripMargin,
    // survivors: every signal at or under its published Gopher
    // threshold (drop on STRICT excess, like Repetition.gopherFilter)
    "qf2_gopher_filter" ->
      s"""WITH ${repetitionSigSql(repetitionCorpusSql)}
         |SELECT doc_id FROM sig
         |WHERE dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
         |  AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
         |  AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
         |  AND top_4gram_char_frac <= 0.16 AND dup_5gram_char_frac <= 0.15
         |  AND dup_6gram_char_frac <= 0.14 AND dup_7gram_char_frac <= 0.13
         |  AND dup_8gram_char_frac <= 0.12 AND dup_9gram_char_frac <= 0.11
         |  AND dup_10gram_char_frac <= 0.10
         |ORDER BY doc_id""".stripMargin,
    "t8_repetition" ->
      raw"""WITH b AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
           |c AS (SELECT doc_id, tok, count(*) AS cnt FROM b GROUP BY 1, 2),
           |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
           |             CAST(count(*) AS BIGINT) AS n_distinct,
           |             CAST(max(cnt) AS BIGINT) AS top_cnt
           |      FROM c GROUP BY 1)
           |SELECT doc_id, n_tokens, n_distinct,
           |  1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_ratio,
           |  CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_ratio
           |FROM a ORDER BY doc_id""".stripMargin
  )
}

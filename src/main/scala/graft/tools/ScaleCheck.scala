package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsofJoin, Decontam, Dedup, RangeJoin, Similarity}

/** Dev-only scale sanity check: replicate the sf0.1 documents Nx with
  * fresh ids (each replica's text gets a distinguishing suffix token so
  * near-dup structure is preserved rather than exploding into exact
  * duplicates) and watch how the dedup/similarity pipelines scale.
  * Linear-ish growth = the plan shape survives scale-up; superlinear =
  * a bucket or join is quadratic.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("batches")) {
      batchGrowth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("vectors")) {
      vectorGrowth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("pipeline")) {
      pipelineGrowth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("media")) {
      mediaGrowth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("search13")) {
      search13Growth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("search14")) {
      search14Growth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("aggs14")) {
      aggs14Growth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("serving")) {
      servingGrowth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("r16")) {
      r16Growth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("r17")) {
      r17Growth(spark)
      spark.stop()
      return
    }
    if (args.headOption.contains("r17b")) {
      r17bGrowth(spark)
      spark.stop()
      return
    }
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n0 = docs.count()

    val big = docs
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("rep")).as("text"))
    big.write.mode("overwrite").parquet("/tmp/scale_docs")
    val scaled = spark.read.parquet("/tmp/scale_docs")
    println(s"[scale] corpus: ${n0} -> ${scaled.count()} docs")

    def time(name: String)(f: => Long): Unit = {
      // isolate phases: a giant previous result (the range join emits
      // ~50M rows at mult=10) otherwise bleeds GC pressure into the
      // next measurement and fakes a superlinearity
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[scale] $name%-24s ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=$n")
    }
    // events replicated with FRESH keys per replica (user cardinality
    // scales with the data, the realistic shape for key-partitioned ops)
    val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
    ev.crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("event_id") * mult + col("rep")).as("event_id"),
        col("ts"), (col("user_id") * mult + col("rep")).as("user_id"),
        col("event_type"), col("value"))
      .write.mode("overwrite").parquet("/tmp/scale_events")
    val se = spark.read.parquet("/tmp/scale_events")
    println(s"[scale] events: ${se.count()} rows")

    time("exactStats") { Dedup.exactStats(scaled, "text").count() }
    time("minhashLshPairs") {
      Dedup.minhashLshPairs(scaled, "doc_id", "text", threshold = 0.5).count()
    }
    time("simhash sketches") {
      scaled.select(graft.functions.TextAnalysis.simhash64(col("text"))).count()
    }
    time("simhashNearDup") {
      // banded pigeonhole search: sketch (no shuffle), (band, chunk)
      // equi-join of narrow rows, hamming filter. NOTE on reading the
      // growth: each source doc's `mult` replicas differ by ONE suffix
      // token, i.e. they form genuine near-dup cliques, so the OUTPUT
      // grows ~mult² by construction (4x -> ~30k pairs, 10x -> ~210k);
      // the time tracks candidates/output (measured sublinear in
      // pairs), not the corpus quadratically
      Dedup.simhashNearDup(scaled, "doc_id", "text").count()
    }
    time("boilerplateLines") {
      // planted multi-line structure (the fixture is single-line):
      // explode + digest df-aggregate + broadcast anti-join + rebuild
      val multi = scaled.select(col("doc_id"),
        concat_ws("\n", col("text"), lit("shared footer line"),
          concat(lit("uniq "), col("doc_id"))).as("text"))
      Dedup.removeBoilerplateLines(multi, "doc_id", "text",
        maxDocFreq = 100).count()
    }
    time("dedupCorpus") {
      // the one-call facade: exact keep-first + LSH candidates +
      // jaccard verify + connected components + keep-the-longest.
      // NOTE on reading the growth: each source doc's `mult` replicas
      // are genuine near-dups of each other (one suffix token), so the
      // verified-pair/CC edge count grows ~mult² by construction while
      // the OUTPUT collapses every clique to ~n0 survivors; time
      // tracks the candidate/edge volume (the simhashNearDup shape),
      // not the corpus quadratically
      Dedup.dedupCorpus(scaled, "doc_id", "text",
        estThreshold = 0.2, threshold = 0.8, maxBucketSize = 100).count()
    }
    time("c4LineFilter") {
      // pure per-row array expression: time must track the corpus
      // linearly, output rows == input docs
      val multi = scaled.select(col("doc_id"),
        concat_ws("\n", col("text"), lit("A planted good sentence."),
          lit("no punct filler")).as("text"))
      Dedup.c4LineFilter(multi, "doc_id", "text").count()
    }
    time("stripHtml") {
      // pure regexp/replace chain — scan-bound like c4LineFilter
      scaled.select(graft.functions.TextAnalysis.stripHtml(
        concat(lit("<p>"), col("text"), lit("</p><script>x<1</script>")))
        .as("t")).filter(length(col("t")) > 0).count()
    }
    time("dedupLinesWithinDoc") {
      val multi = scaled.select(col("doc_id"),
        concat_ws("\n", col("text"), lit("nav link"), col("text"),
          lit("nav link")).as("text"))
      Dedup.dedupLinesWithinDoc(multi, "doc_id", "text").count()
    }
    time("repetitionSignals") {
      // one native kernel call per row (TokenRepetitionSignals) —
      // zero shuffle, scan-bound like c4LineFilter; must grow linearly
      graft.operators.Repetition.signals(scaled, "doc_id", "text")
        .filter(col("dup_5gram_char_frac") >= 0).count()
    }
    time("qualitySignals") {
      // one staged tokenizer/line pass per row — scan-bound
      graft.operators.QualityRules.signals(scaled, "doc_id", "text")
        .filter(col("n_words") >= 0).count()
    }
    time("perplexityBuckets") {
      // bigram train (two counted shuffles) + scoring join + the
      // prefix-sum rank: linear, no per-group window
      val grouped = scaled.withColumn("source",
        (col("doc_id") % 4).cast("string"))
      graft.operators.LanguageModel.perplexityBuckets(grouped, grouped,
        "doc_id", "text", "source").count()
    }
    time("klContributions") {
      // two vocab-bounded count shuffles + a vocab-sized join: output
      // is the UNION VOCABULARY (flat as the corpus grows — Zipf),
      // time tracks the explode scan
      graft.operators.LanguageModel.unigramKlContributions(
        scaled, scaled.filter(col("doc_id") % 10 === 0), "text").count()
    }
    time("tokenBudgetMix") {
      // per-source distributed prefix sum: one (source, key) range
      // shuffle + O(parts × sources) driver state; budgets fixed, so
      // OUTPUT is flat while the corpus grows — the scan is the cost
      val withTok = scaled.select(col("doc_id"),
        pmod(col("doc_id"), lit(20)).cast("string").as("src"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      graft.operators.Sampling.tokenBudgetMix(withTok, "doc_id", "src",
        "n_tok", Map("0" -> 10000L, "1" -> 0L), seed = 13,
        defaultBudget = 5000L).count()
    }
    time("packByBudget") {
      // one range shuffle + O(partitions) driver state — linear
      val withTok = scaled.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      graft.operators.Packing.packByBudget(withTok, "doc_id", "n_tok",
        budget = 2048).count()
    }
    time("packSequences") {
      // text rides the prefix-sum range shuffle as a carry column,
      // then ONE bin regroup; output rows = bins (corpus_tokens/2048)
      val withTok = scaled.select(col("doc_id"), col("text"),
        graft.functions.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      graft.operators.Packing.packSequences(withTok, "doc_id", "n_tok",
        "text", budget = 2048).count()
    }
    time("zorderBy events") {
      // one range shuffle on the interleaved key (the cost of any
      // global sort); bounds ride the plan as a 1-row broadcast
      graft.operators.Layout.zorderBy(
        se.select("event_id", "user_id", "value"),
        Seq("user_id", "event_id")).count()
    }
    time("asofJoin backward") {
      val p = se.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val c = se.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("value").as("click_value"))
        .withColumnRenamed("ts", "click_ts")
      AsofJoin.backward(p, c, "user_id", "ts", "click_ts").count()
    }
    time("rangeJoin bucketed") {
      val errors = se.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      RangeJoin.pointInInterval(
        se.select(col("event_id"), col("ts")), "ts",
        errors, "w_start", "w_end", 600).count()
    }
    // span dedup: postings grow linearly with the corpus (one 24 B row
    // per token position); the replica suffix token keeps replicas from
    // being exact dups, so cross-replica 20-gram matches are the
    // planted structure. maxPostings caps the quadratic pair blowup on
    // grams hotter than the cap — without it, a gram shared by all
    // replicas of a natural dup cluster yields (mult × cluster)²/2
    // matches; with it, cost stays ~ matches below the cap.
    time("sharedSpans 20-tok") {
      Dedup.sharedSpans(scaled, "doc_id", "text", minTokens = 20,
        maxPostings = 50).count()
    }
    time("decontam 3-gram") {
      Decontam.contaminationReport(scaled, "doc_id", "text",
        scaled.filter(col("doc_id") % 500 === 0), "text", 3).count()
    }
    time("bloomDecontam 3-gram") {
      // same answer as "decontam 3-gram"; measures the bloom-prefilter
      // plumbing (bench-gram count + filter build + codegen probe)
      Decontam.bloomContaminationReport(scaled, "doc_id", "text",
        scaled.filter(col("doc_id") % 500 === 0), "text", 3).count()
    }
    time("bm25 top-10") {
      graft.operators.Ranking.bm25TopK(scaled, "doc_id", "text",
        Seq("spark", "vector", "hash"), 10).count()
    }
    time("bigram LM score") {
      graft.operators.LanguageModel.bigramScore(scaled, scaled,
        "doc_id", "text").count()
    }
    time("vocab build + encode") {
      val v = graft.operators.Vocabulary.build(scaled, "text", 50000)
      graft.operators.Vocabulary.encodeExploded(scaled, "doc_id", "text", v)
        .count()
    }
    time("chunk 32/16") {
      graft.operators.Chunking.chunkByTokens(scaled, "doc_id", "text",
        32, 16).count()
    }
    time("inverted index build") {
      graft.operators.InvertedIndex.build(scaled, "doc_id", "text",
        "/tmp/scale_idx")
      spark.read.parquet("/tmp/scale_idx/segments/*/postings").count()
    }
    time("index search top-10") {
      graft.operators.InvertedIndex.searchTopK(spark, "/tmp/scale_idx",
        Seq("spark", "vector", "hash"), 10, idColName = "doc_id").count()
    }
    // delete cost = one lens-ledger scan (never postings); the searched
    // anti-join is a broadcast of the tombstone set
    time("index delete 10%") {
      graft.operators.InvertedIndex.deleteDocs(
        scaled.filter(col("doc_id") % 10 === 0).select("doc_id"),
        "/tmp/scale_idx")
      1L
    }
    time("index search w/ tombstones") {
      graft.operators.InvertedIndex.searchTopK(spark, "/tmp/scale_idx",
        Seq("spark", "vector", "hash"), 10, idColName = "doc_id").count()
    }
    time("index upsert 1%") {
      graft.operators.InvertedIndex.upsertDocs(
        scaled.filter(col("doc_id") % 100 === 1)
          .select(col("doc_id"), concat(col("text"), lit(" upd")).as("text")),
        "doc_id", "text", "/tmp/scale_idx")
      1L
    }
    time("index compact (applies tombstones)") {
      graft.operators.InvertedIndex.compact(spark, "/tmp/scale_idx")
      spark.read.parquet("/tmp/scale_idx/segments/*/postings").count()
    }
    // embeddings replicated with jitter (fresh near-dup structure per
    // replica, same cluster geometry) — the cell-blocked pairwise stage
    // must scale with Σ|cell|², not corpus²
    val emb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    val bigEmb = emb
      .crossJoin(spark.range(mult).select(col("id").as("rep")))
      .select((col("vec_id") * mult + col("rep")).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + (((col("rep") * 13 + i * 5) % 9).cast("double") - 4.0) * 0.002)
          .as("v"))
    bigEmb.write.mode("overwrite").parquet("/tmp/scale_emb")
    val se2 = spark.read.parquet("/tmp/scale_emb")
    println(s"[scale] embeddings: ${se2.count()} rows")
    time("semantic dedup pairs") {
      val cents = Similarity.trainIvfCentroids(se2, "v",
        nlist = 8 * mult, seed = 7)
      Dedup.semanticDedupPairs(se2, "vec_id", "v", cents, 0.95).count()
    }
    time("classifier fitIrls 8it") {
      val feats = scaled.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("double").as("tc"),
        length(col("text")).cast("double").as("cl"))
      val m = graft.operators.QualityClassifier.fitIrls(
        feats.withColumn("label", (col("tc") >= 60).cast("int")),
        Seq("tc", "cl"), "label", iters = 8)
      feats.filter(m.prob >= 0.5).count()
    }
    spark.stop()
  }

  /** `ScaleCheck batches` — the continuous-ingest growth table: hold
    * the MICRO-BATCH fixed (1000 docs) and grow the INDEX 1×/4×/10×,
    * timing each per-batch ingest path of the streaming drivers
    * (st9/st10's foreachBatch bodies and the delete face):
    *
    *  - delete-batch ≈ the lens probe + tombstone write alone (one
    *    lens-ledger semi-join + charge, no segment) — the purest view
    *    of the O(index) per-batch read the id-bucketed compacted lens
    *    keeps shuffle-free;
    *  - upsert-batch = probe + tombstone + the batch's own segment
    *    write (ingestUpsertBatch);
    *  - cdc-batch = the same with mixed upsert/delete events
    *    (ingestCdcBatch).
    *
    * Per-batch work is designed to be O(batch + a linear lens SCAN of
    * the index, no reshuffle): the table should show the batch-
    * dominated costs near-flat and the scan component growing with
    * a slope well below the 10× data growth. A superlinear column
    * means a probe degraded to an index-sized shuffle.
    *
    * The `posbuild`/`phrase` columns measure the positional-postings
    * tax: a `positions = true` build of the same corpus (the
    * collect-list-of-offsets cost — corpus-linear, the storage/ingest
    * price of phrase queries) and a phrase-BM25 query over it (reads
    * 2 bucket dirs — should stay ~flat as the index grows).
    */
  private def batchGrowth(spark: SparkSession): Unit = {
    import graft.operators.InvertedIndex
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    println("[scale] per-batch phase growth: fixed 1000-doc micro-batch, index grown 1x/4x/10x")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"build(s)"}%9s ${"posbuild(s)"}%12s " +
      f"${"phrase(s)"}%10s ${"compact(s)"}%11s " +
      f"${"upsert(s)"}%10s ${"cdc(s)"}%8s ${"delete(s)"}%10s")
    val rows = Seq(1, 4, 10).map { s =>
      val idx = s"/tmp/scale_idx_batch_$s"
      new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(idx), true)
      val corpus = base
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val nDocs = corpus.count()
      // two segments then compact: the compacted segment carries the
      // id-bucketed lens ledger every later probe reads co-located
      val tBuild = timeS {
        InvertedIndex.build(corpus.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", idx)
        InvertedIndex.append(corpus.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", idx)
      }
      // positional build: the collect_list-of-offsets cost over the
      // same corpus, plus a phrase query over the positional index —
      // the storage/ingest tax phraseSearch pays (both corpus-linear;
      // the phrase QUERY should stay ~flat: it reads 2 buckets)
      val idxP = s"${idx}_pos"
      new org.apache.hadoop.fs.Path(idxP)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(idxP), true)
      val tPosBuild = timeS {
        InvertedIndex.build(corpus, "doc_id", "text", idxP,
          positions = true)
      }
      val tPhrase = timeS {
        InvertedIndex.phraseSearchTopK(spark, idxP,
          Seq("stream", "filter"), k = 10, idColName = "doc_id").count()
        ()
      }
      val tCompact = timeS { InvertedIndex.compact(spark, idx) }
      val tUpsert = timeS {
        InvertedIndex.ingestUpsertBatch(
          corpus.filter(col("doc_id") < 1000)
            .select(col("doc_id"), concat(col("text"), lit(" u1")).as("text")),
          "doc_id", "text", idx, batchId = 9001)
      }
      val tCdc = timeS {
        InvertedIndex.ingestCdcBatch(
          corpus.filter(col("doc_id") >= 1000 && col("doc_id") < 1500)
            .select(col("doc_id"),
              concat(col("text"), lit(" u2")).as("text"),
              lit("upsert").as("op"))
            .unionByName(corpus
              .filter(col("doc_id") >= 2000 && col("doc_id") < 2500)
              .select(col("doc_id"), col("text"), lit("delete").as("op"))),
          "doc_id", "text", "op", idx, batchId = 9002)
      }
      val tDelete = timeS {
        InvertedIndex.deleteDocs(
          corpus.filter(col("doc_id") >= 3000 && col("doc_id") < 4000)
            .select("doc_id"), idx)
      }
      println(f"[scale] ${s}%-5d ${nDocs}%8d ${tBuild}%9.2f ${tPosBuild}%12.2f " +
        f"${tPhrase}%10.2f ${tCompact}%11.2f " +
        f"${tUpsert}%10.2f ${tCdc}%8.2f ${tDelete}%10.2f")
      (s, tUpsert, tCdc, tDelete)
    }
    val (s1, u1, c1, d1) = rows.head
    val (s10, u10, c10, d10) = rows.last
    println(f"[scale] growth ${s10 / s1}x data -> upsert ${u10 / u1}%.2fx, " +
      f"cdc ${c10 / c1}%.2fx, delete ${d10 / d1}%.2fx " +
      "(batch fixed; slope << data growth = probe not index-shuffle-bound)")
  }

  /** `ScaleCheck pipeline` — growth table for the tokenizer-prep /
    * selection / clustering operators: corpus grown 1×/4×/10×, timing
    *
    *  - `bpe`: trainBpe(50 merges) — ONE corpus word-count shuffle
    *    (linear) + a driver merge loop over the Zipf-bounded dict
    *    (near-constant: replicas add a handful of distinct rep-suffix
    *    words, not corpus-proportional dict growth);
    *  - `bpecnt`: bpeTokenCount — distinct-word segmentation broadcast
    *    onto the exploded corpus, linear;
    *  - `dsir`: dsirSample(n=1000, 4096 buckets) — two bucket
    *    histograms + broadcast ratio join + TakeOrdered, linear;
    *  - `kmeans`: 2 full-corpus Lloyd iterations over the embeddings,
    *    linear per iteration (assignment expression + (cluster, dim)
    *    agg);
    *  - `export`: exportShards — the two permutation shuffles plus the
    *    parquet write, linear.
    *
    * Every column should track the data growth ~linearly; a
    * superlinear column means a broadcast degraded to a shuffle or a
    * driver loop picked up corpus-proportional work.
    */
  private def pipelineGrowth(spark: SparkSession): Unit = {
    import graft.operators.{Clustering, Sampling, Selection, Vocabulary}
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val baseDocs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val baseEmb = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    println("[scale] pipeline-operator growth: corpus 1x/4x/10x")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"bpe(s)"}%8s " +
      f"${"bpecnt(s)"}%10s ${"dsir(s)"}%8s ${"kmeans(s)"}%10s " +
      f"${"export(s)"}%10s ${"curation(s)"}%12s")
    val rows = Seq(1, 4, 10).map { s =>
      val corpus = baseDocs
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val emb = baseEmb
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("vec_id") * s + col("rep")).as("vec_id"),
          transform(col("v"), (x, i) =>
            x + (((col("rep") * 13 + i * 5) % 9).cast("double") - 4.0)
              * 0.002).as("v"))
        .localCheckpoint(true)
      val nDocs = corpus.count()
      var model: Vocabulary.BpeModel = null
      val tBpe = timeS {
        model = Vocabulary.trainBpe(corpus, "text", numMerges = 50)
      }
      val tCnt = timeS {
        Vocabulary.bpeTokenCount(corpus, "doc_id", "text", model).count()
        ()
      }
      val tDsir = timeS {
        Selection.dsirSample(corpus,
          corpus.filter(col("doc_id") % 7 === 0), "doc_id", "text",
          n = 1000, buckets = 4096, seed = 23).count()
        ()
      }
      val tKm = timeS {
        Clustering.kmeansFit(emb, "vec_id", "v", k = 16, iters = 2)
        ()
      }
      val tExp = timeS {
        Sampling.exportShards(corpus, "doc_id", rowsPerShard = 5000,
          seed = 17, s"/tmp/scale_shards_$s").count()
        ()
      }
      val tCur = timeS {
        // the pipe3 chain: quality -> repetition -> exact dedup ->
        // per-source perplexity tertiles (kernel predicates + one
        // prefix-sum rank — the end-to-end curation cost per pass)
        val grouped = corpus.withColumn("source",
          (col("doc_id") % 4).cast("string"))
        val q = graft.operators.QualityRules.gopherFilter(grouped,
          "text", minStopHits = 1L)
        val r = graft.operators.Repetition.gopherFilter(q, "text")
        val dd = graft.operators.Dedup.exactKeepFirst(r, "doc_id", "text")
        graft.operators.LanguageModel.perplexityBuckets(dd, dd,
          "doc_id", "text", "source").count()
        ()
      }
      println(f"[scale] ${s}%-5d ${nDocs}%8d ${tBpe}%8.2f ${tCnt}%10.2f " +
        f"${tDsir}%8.2f ${tKm}%10.2f ${tExp}%10.2f ${tCur}%12.2f")
      (tBpe, tDsir, tKm, tExp, tCur)
    }
    val (b1, i1, k1, e1, c1) = rows.head
    val (b10, i10, k10, e10, c10) = rows.last
    println(f"[scale] growth 10x data -> bpe ${b10 / b1}%.2fx, " +
      f"dsir ${i10 / i1}%.2fx, kmeans ${k10 / k1}%.2fx, " +
      f"export ${e10 / e1}%.2fx, curation ${c10 / c1}%.2fx " +
      "(~linear = plan shapes survive scale-up)")
  }

  /** `ScaleCheck vectors` — the vector-index growth table: grow the
    * corpus 1×/4×/10× while scaling `nlist` WITH it (the √N rule kept
    * linear here: cell size stays ~constant, which is the whole IVF
    * contract), then time build (pqM = 8, so every segment carries its
    * PQ code table), a 100-query nprobe=2 search, the same workload
    * down the ADC path (stage 1 over the ~32×-smaller code rows,
    * 200-candidate exact re-rank — the measured form of the smaller-
    * read claim), a MaxSim late-interaction rerank of the IVF top-50
    * over 4 synthetic token vectors per doc/query (the measured form
    * of the candidate-bounded-rerank claim: the doc-token table is
    * corpus-sized but only broadcast-filtered, never shuffled), a
    * fixed 1000-vector upsert batch, a fixed 1000-id delete batch,
    * compact, and the post-compaction search. Search/adc/maxsim and
    * the per-batch ingest paths should stay near-flat; build and
    * compact are the corpus-linear phases and should track the data
    * growth.
    */
  private def vectorGrowth(spark: SparkSession): Unit = {
    import graft.operators.VectorIndex
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    println("[scale] vector-index growth: corpus 1x/4x/10x, nlist scaled with it, " +
      "fixed 100-query nprobe=2 search (exact + ADC + MaxSim-rerank) + fixed 1000-row batches")
    println(f"[scale] ${"size"}%-5s ${"vecs"}%8s ${"nlist"}%6s ${"build(s)"}%9s " +
      f"${"search(s)"}%10s ${"adc(s)"}%8s ${"maxsim(s)"}%10s " +
      f"${"upsert(s)"}%10s ${"delete(s)"}%10s " +
      f"${"compact(s)"}%11s ${"search2(s)"}%11s")
    val rows = Seq(1, 4, 10).map { s =>
      val idx = s"/tmp/scale_vidx_$s"
      val corpus = base
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("vec_id") * s + col("rep")).as("vec_id"),
          transform(col("v"), (x, i) =>
            x + (((col("rep") * 13 + i * 5) % 9).cast("double") - 4.0) * 0.002)
            .as("v"))
        .localCheckpoint(true)
      val n = corpus.count()
      val nlist = 16 * s
      val queries = corpus.filter(col("vec_id") % (n / 100) === 1)
        .limit(100)
        .select((col("vec_id") + 900000000L).as("q_id"), col("v").as("vec"))
        .localCheckpoint(true)
      val tBuild = timeS {
        VectorIndex.build(corpus, "vec_id", "v", idx, nlist = nlist,
          pqM = 8)
      }
      def search(): Unit = {
        VectorIndex.searchTopK(queries, idx, k = 10, nprobe = 2).count()
        ()
      }
      val tSearch = timeS(search())
      val tAdc = timeS {
        VectorIndex.searchTopKAdc(queries, idx, k = 10,
          candidates = 200, nprobe = 2).count()
        ()
      }
      // 4 deterministic token vectors per doc/query: the late-
      // interaction fixture — candidates are the IVF top-50
      val docToks = corpus
        .crossJoin(spark.range(4).select(col("id").as("tok")))
        .select(col("vec_id"),
          transform(col("v"), (x, i) =>
            x + (((col("tok") * 7 + i * 3) % 5).cast("double") - 2.0)
              * 0.003).as("v"))
      val qToks = queries
        .crossJoin(spark.range(4).select(col("id").as("qpos")))
        .select(col("q_id"), col("qpos"),
          transform(col("vec"), (x, i) =>
            x + (((col("qpos") * 11 + i * 2) % 5).cast("double") - 2.0)
              * 0.003).as("v"))
      val tMaxsim = timeS {
        val cand = VectorIndex.searchTopK(queries, idx, k = 50,
            nprobe = 2)
          .select(col("q_id"), col("id").as("vec_id"))
        graft.operators.Ranking.maxSimRerank(docToks, qToks, cand,
          "vec_id", "q_id", "qpos", "v", k = 10).count()
        ()
      }
      val tUpsert = timeS {
        VectorIndex.ingestUpsertBatch(
          corpus.filter(col("vec_id") < 1000)
            .select(col("vec_id"), transform(col("v"), x => x * 0.5).as("v")),
          "vec_id", "v", idx, batchId = 9001)
      }
      val tDelete = timeS {
        VectorIndex.deleteDocs(
          corpus.filter(col("vec_id") >= 2000 && col("vec_id") < 3000)
            .select("vec_id"), idx)
      }
      val tCompact = timeS { VectorIndex.compact(spark, idx) }
      val tSearch2 = timeS(search())
      println(f"[scale] ${s}%-5d ${n}%8d ${nlist}%6d ${tBuild}%9.2f " +
        f"${tSearch}%10.2f ${tAdc}%8.2f ${tMaxsim}%10.2f " +
        f"${tUpsert}%10.2f ${tDelete}%10.2f " +
        f"${tCompact}%11.2f ${tSearch2}%11.2f")
      (tSearch2, tAdc, tMaxsim, tUpsert, tDelete)
    }
    val (q1, a1, m1, u1, d1) = rows.head
    val (q10, a10, m10, u10, d10) = rows.last
    println(f"[scale] growth 10x data (nlist scaled) -> search ${q10 / q1}%.2fx, " +
      f"adc ${a10 / a1}%.2fx, maxsim ${m10 / m1}%.2fx, " +
      f"upsert ${u10 / u1}%.2fx, delete ${d10 / d1}%.2fx " +
      "(flat-ish = cell size, code reads, and per-batch probes scale-independent)")
  }

  /** The SERVING FACADE measured as one call (its legs are measured in
    * `batches`/`vectors`; the composition — two pruned index reads +
    * per-query fusion / rerank — is what a retrieval user actually
    * pays for). Two growth axes:
    *   A. corpus 1x/4x/10x at a FIXED 100-query frame — per-query
    *      cost must stay ~flat (both legs read only pruned
    *      bucket/cell directories; the fusion is
    *      <= 2 x |Q| x perLegK rows regardless of corpus size);
    *   B. query frame 100/400/1000 on the 1x indexes — total cost
    *      linear in |Q| (one batched read per touched bucket/cell,
    *      never one job per query).
    */
  private def servingGrowth(spark: SparkSession): Unit = {
    import graft.operators.{InvertedIndex, Serving, VectorIndex}
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val emb0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorOps.asDouble(col("embedding")).as("v"))
    val qwords = Array("stream", "filter", "join", "spark", "window",
      "batch", "hash", "sort", "merge", "scan", "table", "query")
    def termsOf(id: org.apache.spark.sql.Column) = array(
      element_at(lit(qwords), (pmod(id, lit(12L)) + 1).cast("int")),
      element_at(lit(qwords), (pmod(id / 12, lit(12L)) + 1).cast("int")),
      element_at(lit(qwords), (pmod(id / 144, lit(12L)) + 1).cast("int")))
    def mkQueries(emb: org.apache.spark.sql.DataFrame, nq: Int) = emb
      .orderBy("vec_id").limit(nq)
      .select((col("vec_id") + 900000000L).as("q_id"),
        termsOf(col("vec_id")).as("terms"), col("v").as("vec"))
      .localCheckpoint(true)
    def tokVecs(df: org.apache.spark.sql.DataFrame, idC: String,
                posName: String, seedMul: Int) = df
      .crossJoin(spark.range(4).select(col("id").as(posName)))
      .select(Seq(col(idC)) ++
        (if (posName == "qpos") Seq(col(posName)) else Nil) :+
        transform(col(if (idC == "q_id") "vec" else "v"), (x, i) =>
          x + (((col(posName) * seedMul + i * 3) % 5).cast("double") - 2.0)
            * 0.003).as("vec"): _*)

    println("[scale] serving growth A: corpus 1x/4x/10x, FIXED 100-query " +
      "frame; hybrid rrf/linear + maxsim per-query cost must stay ~flat")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"ibuild(s)"}%10s " +
      f"${"vbuild(s)"}%10s ${"rrf(s)"}%8s ${"linear(s)"}%10s ${"maxsim(s)"}%10s")
    val rows = Seq(1, 4, 10).map { s =>
      val ipath = s"/tmp/scale_srv_i$s"; val vpath = s"/tmp/scale_srv_v$s"
      val docs = docs0
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val emb = emb0
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("vec_id") * s + col("rep")).as("vec_id"),
          transform(col("v"), (x, i) =>
            x + (((col("rep") * 13 + i * 5) % 9).cast("double") - 4.0) * 0.002)
            .as("v"))
        .localCheckpoint(true)
      val nD = docs.count()
      val tBi = timeS(InvertedIndex.build(docs, "doc_id", "text", ipath))
      val tBv = timeS(VectorIndex.build(emb, "vec_id", "v", vpath,
        nlist = 16 * s))
      val queries = mkQueries(emb, 100)
      val docToks = tokVecs(emb.select(col("vec_id").as("doc_id"), col("v")),
        "doc_id", "tok", 7)
      val qToks = tokVecs(queries, "q_id", "qpos", 11)
      val tRrf = timeS { Serving.searchHybrid(queries, ipath, vpath, k = 10,
        perLegK = 30, nprobe = 2, idColName = "doc_id").count(); () }
      val tLin = timeS { Serving.searchHybrid(queries, ipath, vpath, k = 10,
        perLegK = 30, nprobe = 2, idColName = "doc_id",
        fusion = "linear").count(); () }
      val tMs = timeS { Serving.searchMaxSim(queries, ipath, docToks, qToks,
        k = 10, fetchK = 30, idColName = "doc_id").count(); () }
      println(f"[scale] ${s}%-5d ${nD}%8d ${tBi}%10.2f ${tBv}%10.2f " +
        f"${tRrf}%8.2f ${tLin}%10.2f ${tMs}%10.2f")
      (tRrf, tLin, tMs)
    }
    val (r1, l1, m1) = rows.head
    val (r10, l10, m10) = rows.last
    println(f"[scale] serving growth 10x corpus -> rrf ${r10 / r1}%.2fx, " +
      f"linear ${l10 / l1}%.2fx, maxsim ${m10 / m1}%.2fx " +
      "(flat-ish = pruned reads + bounded fusion, corpus-independent)")

    println("[scale] serving growth B: 1x corpus, query frame 100/400/1000; " +
      "total ~linear in |Q|, per-query ms ~flat")
    println(f"[scale] ${"|Q|"}%-6s ${"rrf(s)"}%8s ${"linear(s)"}%10s " +
      f"${"maxsim(s)"}%10s ${"rrf ms/q"}%9s")
    val qrows = Seq(100, 400, 1000).map { nq =>
      val queries = mkQueries(emb0, nq)
      val docToks = tokVecs(emb0.select(col("vec_id").as("doc_id"), col("v")),
        "doc_id", "tok", 7)
      val qToks = tokVecs(queries, "q_id", "qpos", 11)
      val tRrf = timeS { Serving.searchHybrid(queries, "/tmp/scale_srv_i1",
        "/tmp/scale_srv_v1", k = 10, perLegK = 30, nprobe = 2,
        idColName = "doc_id").count(); () }
      val tLin = timeS { Serving.searchHybrid(queries, "/tmp/scale_srv_i1",
        "/tmp/scale_srv_v1", k = 10, perLegK = 30, nprobe = 2,
        idColName = "doc_id", fusion = "linear").count(); () }
      val tMs = timeS { Serving.searchMaxSim(queries, "/tmp/scale_srv_i1",
        docToks, qToks, k = 10, fetchK = 30, idColName = "doc_id").count(); () }
      println(f"[scale] ${nq}%-6d ${tRrf}%8.2f ${tLin}%10.2f ${tMs}%10.2f " +
        f"${tRrf * 1000 / nq}%9.1f")
      (nq, tRrf)
    }
    val (nqA, tA) = qrows.head
    val (nqB, tB) = qrows.last
    println(f"[scale] serving growth ${nqB / nqA}x queries -> rrf " +
      f"${tB / tA}%.2fx total (${(tB / nqB) / (tA / nqA)}%.2fx per query)")
  }

  /** Growth of the perceptual-media family (r12): hash, banded
    * near-dup, audio/video fingerprints and the registry probe over
    * 5k/20k/50k synthesized items per modality. md5-textured fixtures
    * make hashes independent, so pair counts stay ~0 and any
    * superlinearity is the OPERATOR's, not the fixture's.
    */
  /** Round-13 search surfaces across a replicated corpus: index +
    * fuzzy-dictionary builds should grow ~linearly; the SERVED verbs
    * (mlt, suggest, fuzzy, cross-index) read bucket-pruned postings /
    * variant-pruned dictionary rows, so per-call cost must stay
    * ~flat-to-sublinear; the geo radius read is bounded by the points
    * near the origin (which replication grows linearly — the right
    * denominator is matching rows, not corpus).
    */
  private def search13Growth(spark: SparkSession): Unit = {
    import graft.operators.{InvertedIndex, GeoLayout}
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    // untimed warmup (the mediaGrowth lesson): the first index build
    // otherwise eats JVM/codegen init and fakes a decreasing curve
    locally {
      val w = "/tmp/scale_s13_warm"
      InvertedIndex.build(docs0.limit(200), "doc_id", "text", w)
      InvertedIndex.buildFuzzyDictionary(spark, w)
      InvertedIndex.fuzzySearchTopK(spark, w, Seq("streem"), k = 3,
        idColName = "doc_id").collect()
      ()
    }
    println("[scale] r13 search surfaces: corpus 1x/4x; builds linear, " +
      "served verbs ~flat, geo read tracks matching rows")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"build(s)"}%9s " +
      f"${"fdict(s)"}%9s ${"mlt(s)"}%7s ${"sugg(s)"}%8s ${"fuzzy(s)"}%9s " +
      f"${"multi(s)"}%9s ${"geoW(s)"}%8s ${"geoR(s)"}%8s ${"geoRows"}%8s")
    for (s <- Seq(1, 4)) {
      val docs = docs0
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val nD = docs.count()
      val path = s"/tmp/scale_s13_$s"
      val tB = timeS(InvertedIndex.build(docs, "doc_id", "text", path))
      val tFd = timeS(InvertedIndex.buildFuzzyDictionary(spark, path))
      val like = docs.orderBy("doc_id").select("text").head().getString(0)
      val tMlt = timeS(InvertedIndex.moreLikeThisTopK(spark, path, like,
        k = 10, idColName = "doc_id", excludeId = Some(0L)).collect())
      val tSg = timeS(InvertedIndex.suggestTerms(spark, path, "filtir")
        .collect())
      val tFz = timeS(InvertedIndex.fuzzySearchTopK(spark, path,
        Seq("streem", "filtir"), k = 10, idColName = "doc_id").collect())
      val pa = s"/tmp/scale_s13_a$s"; val pb = s"/tmp/scale_s13_b$s"
      InvertedIndex.build(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", pa)
      InvertedIndex.build(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", pb, buckets = 32)
      val tMu = timeS(InvertedIndex.searchTopKIndices(spark, Seq(pa, pb),
        Seq("stream", "filter", "join"), k = 10, idColName = "doc_id")
        .collect())
      val pts = docs.select(col("doc_id"), struct(
        ((col("doc_id") % 121) - 60).cast("double").as("lat"),
        (((col("doc_id") * 7) % 301) - 150).cast("double").as("lon"))
        .as("loc"))
      val gdir = s"/tmp/scale_s13_g$s"
      val tGw = timeS(GeoLayout.writeCellPartitioned(pts, "loc", gdir,
        cellDeg = 15.0))
      var geoRows = 0L
      val tGr = timeS {
        geoRows = GeoLayout.readWithinRadius(spark, gdir, 10.0, 20.0,
          2000000.0).count()
      }
      println(f"[scale] ${s + "x"}%-5s $nD%8d $tB%9.2f $tFd%9.2f " +
        f"$tMlt%7.2f $tSg%8.2f $tFz%9.2f $tMu%9.2f $tGw%8.2f " +
        f"$tGr%8.2f $geoRows%8d")
    }
  }

  /** Round-14 surfaces: the fielded index lifecycle + all three
    * multi_match modes served from it, the completion suggester's
    * range-pruned sidecar read, scan-side rescore, and the WordPiece
    * trainer/encoder. Expectation: builds linear in postings, served
    * verbs ~flat (pruned reads + window-bounded corrections),
    * WordPiece train flat-ish (dict-bounded driver loop) and encode
    * linear.
    */
  private def search14Growth(spark: SparkSession): Unit = {
    import graft.operators.{FieldedIndex, InvertedIndex, WordPiece}
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    // untimed warmup (the mediaGrowth lesson)
    locally {
      val w = "/tmp/scale_s14_warm"
      val d = docs0.limit(200).select(col("doc_id"), col("text"),
        concat_ws(" ", slice(graft.functions.TextAnalysis
          .tokens(col("text")), 1, 6)).as("title"))
      FieldedIndex.build(d, "doc_id", Seq("title", "text"), w,
        buckets = 16, positions = true)
      FieldedIndex.searchTopK(spark, w, "stream filter",
        Seq("title" -> 2.0, "text" -> 1.0), 5).collect()
      ()
    }
    println("[scale] r14 search surfaces: corpus 1x/4x; fielded build " +
      "linear, served multi_match modes ~flat, completion read " +
      "vocab-bounded, rescore window-bounded, wp train dict-bounded")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"fbuild(s)"}%10s " +
      f"${"best(s)"}%8s ${"most(s)"}%8s ${"phrase(s)"}%10s " +
      f"${"vocab(s)"}%9s ${"compl(s)"}%9s ${"resc(s)"}%8s " +
      f"${"wpTrain(s)"}%11s ${"wpEnc(s)"}%9s")
    for (s <- Seq(1, 4)) {
      val docs = docs0
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .select(col("doc_id"), col("text"),
          concat_ws(" ", slice(graft.functions.TextAnalysis
            .tokens(col("text")), 1, 6)).as("title"))
        .localCheckpoint(true)
      val nD = docs.count()
      val root = s"/tmp/scale_s14_$s"
      val tB = timeS(FieldedIndex.build(docs, "doc_id",
        Seq("title", "text"), root, buckets = 16, positions = true))
      def mm(mode: String, tie: Double): Double =
        timeS(FieldedIndex.searchTopK(spark, root, "stream filter join",
          Seq("title" -> 2.0, "text" -> 1.0), 10, mode = mode,
          tieBreaker = tie, idColName = "doc_id").collect())
      val tBest = mm("best_fields", 0.3)
      val tMost = mm("most_fields", 0.0)
      val tPh = timeS(FieldedIndex.searchTopK(spark, root, "order fast",
        Seq("title" -> 2.0, "text" -> 1.0), 10, mode = "phrase",
        tieBreaker = 0.4, idColName = "doc_id").collect())
      val flat = s"/tmp/scale_s14_flat$s"
      InvertedIndex.build(docs, "doc_id", "text", flat)
      InvertedIndex.buildVocabulary(spark, flat)
      val tV = timeS(InvertedIndex.buildVocabulary(spark, flat))
      val tC = timeS(InvertedIndex.suggestCompletions(spark, flat, "st")
        .collect())
      val tR = timeS(graft.functions.EsScoredQuery.rescoredFrame(
          docs, "doc_id", """{"match": {"text": "stream filter"}}""",
          """{"match_phrase": {"text": "order fast"}}""",
          windowSize = 15, rescoreWeight = 2.0)
        .orderBy(col("_score").desc, col("doc_id")).limit(12).collect())
      var model: WordPiece.WordPieceModel = null
      val tWt = timeS {
        model = WordPiece.train(docs, "text", numMerges = 12)
      }
      val tWe = timeS(WordPiece.wordPieceEncodeExploded(
        docs, "doc_id", "text", model).count())
      println(f"[scale] ${s + "x"}%-5s $nD%8d $tB%10.2f $tBest%8.2f " +
        f"$tMost%8.2f $tPh%10.2f $tV%9.2f $tC%9.2f $tR%8.2f " +
        f"$tWt%11.2f $tWe%9.2f")
    }
  }

  private def mediaGrowth(spark: SparkSession): Unit = {
    import graft.operators.Multimodal
    def timeS(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // untimed warmup: JVM/codegen/ImageIO init otherwise lands on the
    // first row and fakes a decreasing curve
    locally {
      val wids = spark.range(500).toDF("id")
      val wimg = Multimodal.synthesizeBmp(wids, "id", 8, 8, textured = true)
      noop(Multimodal.imageDHash(wimg))
      Dedup.imageNearDup(wimg).count()
      noop(Multimodal.audioFingerprint(
        Multimodal.synthesizeWav(wids, "id", textured = true)))
      noop(Multimodal.videoFingerprint(
        Multimodal.synthesizeAvi(wids, "id", 16, 16, 4, textured = true)))
    }
    println("[scale] perceptual-media growth (items per modality)")
    println(f"[scale] ${"n"}%7s ${"dhash(s)"}%9s ${"imgdd(s)"}%9s " +
      f"${"pairs"}%7s ${"afp(s)"}%8s ${"vfp(s)"}%8s ${"regprobe(s)"}%12s")
    Seq(5000, 20000, 50000).foreach { n =>
      val ids = spark.range(n).toDF("id")
      val imgs = Multimodal.synthesizeBmp(ids, "id", 8, 8, textured = true)
        .localCheckpoint(true)
      val wav = Multimodal.synthesizeWav(ids, "id", textured = true)
        .localCheckpoint(true)
      val avi = Multimodal.synthesizeAvi(ids, "id", w = 16, h = 16,
        nFrames = 4, textured = true).localCheckpoint(true)
      var pairs = 0L
      val tD = timeS { noop(Multimodal.imageDHash(imgs)) }
      val tN = timeS { pairs = Dedup.imageNearDup(imgs).count() }
      val tA = timeS { noop(Multimodal.audioFingerprint(wav)) }
      val tV = timeS { noop(Multimodal.videoFingerprint(avi)) }
      val reg = java.nio.file.Files
        .createTempDirectory(s"graft-scale-phash-$n").toString
      val tR = timeS {
        Dedup.perceptualDedupAgainstRegistry(
          imgs.filter(col("media_id") % 2 === 0), "media_id", reg)
        Dedup.perceptualDedupAgainstRegistry(
          imgs.filter(col("media_id") % 2 === 1), "media_id", reg)
          .count()
        ()
      }
      println(f"[scale] $n%7d $tD%9.2f $tN%9.2f $pairs%7d " +
        f"$tA%8.2f $tV%8.2f $tR%12.2f")
    }
  }

  /** r14 session-3 surfaces: pipeline aggs (bucket count FIXED as the
    * corpus grows — time must track the groupBy scan, the window over
    * buckets is free), cumulative_cardinality (one key shuffle),
    * top_hits (one group-key window), rare_terms (vocab-bounded
    * shuffle), composite paging (pushed after-key + page cut), and
    * the phrase suggester (two count scans + bounded collects).
    */
  /** r16 faces at 1x/4x: significant_text's shingle machinery (the
    * round's one corpus-heavy op), the intervals position predicate
    * (scan-bound HOF), collapse (keyed window + broadcast re-join),
    * variable_width_histogram (one sort + one keyed agg), and
    * frequent_item_sets (one cube; combination-flat output).
    */
  private def r16Growth(spark: SparkSession): Unit = {
    import graft.operators.{EsAggs, Keywords}
    def timeS(f: => Long): (Double, Long) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    locally { // untimed warmup of the text + agg machinery
      val w = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      Keywords.significantText(w, "doc_id", "text", "source").count()
      ()
    }
    println("[scale] r16 faces: 1x/4x corpus")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s ${"sigtext(s)"}%11s " +
      f"${"intervals(s)"}%13s ${"collapse(s)"}%12s ${"vwhist(s)"}%10s " +
      f"${"itemsets(s)"}%12s")
    for (s <- Seq(1, 4)) {
      val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          col("source"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val nD = docs.count()
      val orders = Tables.load(spark, "/root/testdata/sf0.1", "orders")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("o_orderkey") * s + col("rep")).as("o_orderkey"),
          col("o_custkey"), col("o_totalprice"), col("o_orderstatus"),
          col("o_orderpriority"))
        .localCheckpoint(true)
      val (tSig, _) = timeS {
        Keywords.significantText(docs, "doc_id", "text", "source").count()
      }
      val (tIv, _) = timeS {
        graft.api.GraftFrame(docs, "doc_id").esQuery(
          """{"intervals": {"text": {"match":
            |{"query": "stream filter", "max_gaps": 2,
            |"ordered": true}}}}""".stripMargin).df.count()
      }
      val (tCl, _) = timeS {
        EsAggs.collapse(orders, "o_custkey", "o_totalprice",
          "o_orderkey", size = 10, innerHits = 3,
          innerSortCol = "o_totalprice").count()
      }
      val (tVw, _) = timeS {
        EsAggs.variableWidthHistogram(
          orders.select(floor(col("o_totalprice")).cast("double")
            .as("v")), "v", 5).count()
      }
      val (tFis, _) = timeS {
        EsAggs.frequentItemSets(
          orders.withColumn("pclass",
            substring(col("o_orderpriority"), 1, 1)),
          Seq("o_orderstatus", "o_orderpriority", "pclass"),
          0.02, 1, 15).count()
      }
      println(f"[scale] ${s}%-5d ${nD}%8d ${tSig}%11.2f ${tIv}%13.2f " +
        f"${tCl}%12.2f ${tVw}%10.2f ${tFis}%12.2f")
    }
  }

  /** r17: the significant_text hot-shingle guard under a PLANTED hot
    * shingle (one 6-token boilerplate tail appended to EVERY doc — the
    * "all rights reserved" shape). Capped (cap 1000, far below the
    * occurrence count) the hot shingle routes to the broadcast
    * mask-everywhere path and never enters the ownership window;
    * effectively-uncapped it floods one window partition. The capped
    * column must stay ~linear 1x→4x; the uncapped column shows the
    * single-task skew the guard exists for.
    */
  private def r17Growth(spark: SparkSession): Unit = {
    import graft.operators.Keywords
    def timeS(f: => Long): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    locally { // untimed warmup
      val w = Tables.load(spark, "/root/testdata/sf0.01", "documents")
        .select(col("doc_id"), col("source"),
          concat(col("text"), lit(" all rights reserved contact us today"))
            .as("text"))
      Keywords.significantText(w, "doc_id", "text", "source").count()
      ()
    }
    println("[scale] r17: sigtext hot-shingle guard, planted " +
      "boilerplate tail on every doc, 1x/4x corpus")
    println(f"[scale] ${"size"}%-5s ${"docs"}%8s " +
      f"${"capped(s)"}%10s ${"uncapped(s)"}%12s")
    for (s <- Seq(1, 4)) {
      val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          col("source"),
          concat(col("text"), lit(" rep"), col("rep"),
            lit(" all rights reserved contact us today")).as("text"))
        .localCheckpoint(true)
      val nD = docs.count()
      val tCap = timeS {
        Keywords.significantText(docs, "doc_id", "text", "source",
          maxShingleOccurrences = 1000).count()
      }
      val tHot = timeS {
        Keywords.significantText(docs, "doc_id", "text", "source",
          maxShingleOccurrences = Int.MaxValue).count()
      }
      println(f"[scale] ${s}%-5d ${nD}%8d ${tCap}%10.2f ${tHot}%12.2f")
    }
  }

  /** r17's new face families at 1×/4× corpus: EQL sequence chains
    * (k−1 union+window passes — the claim is linear in events),
    * ingest pipeline (pure map stage — linear by construction,
    * measured to catch a regex blowup), synonym match scoring (the
    * claim: blending adds only a constant over the plain match).
    */
  private def r17bGrowth(spark: SparkSession): Unit = {
    import graft.operators.{Eql, IngestPipeline}
    def timeS(f: => Long): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    val pipe = IngestPipeline(
      """{"processors": [
        |  {"dissect": {"field": "o_orderpriority",
        |    "pattern": "%{pn}-%{pw}"}},
        |  {"convert": {"field": "pn", "type": "long"}},
        |  {"lowercase": {"field": "pw"}},
        |  {"gsub": {"field": "o_orderstatus", "pattern": "^O$",
        |    "replacement": "OPEN", "target_field": "sx"}},
        |  {"convert": {"field": "o_orderdate", "type": "string",
        |    "target_field": "od"}},
        |  {"date": {"field": "od",
        |    "formats": ["UNIX", "yyyy-MM-dd HH:mm:ss"]}}
        |]}""".stripMargin)
    locally { // untimed warmup at sf0.01
      val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      Eql.sequence(ev, "user_id", "ts", "event_id",
        Seq(col("event_type") === "signup",
          col("event_type") === "purchase",
          col("event_type") === "error"), 7200000L).count()
      pipe(Tables.load(spark, "/root/testdata/sf0.01", "orders"))
        .count()
      ()
    }
    println("[scale] r17b: eql sequence / ingest pipeline / synonym " +
      "match, 1x/4x corpus")
    println(f"[scale] ${"size"}%-5s ${"rows"}%9s ${"eql(s)"}%8s " +
      f"${"ingest(s)"}%10s ${"syn(s)"}%8s ${"plain(s)"}%9s")
    for (s <- Seq(1, 4)) {
      val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("event_id") * s + col("rep")).as("event_id"),
          col("ts"), (col("user_id") * s + col("rep")).as("user_id"),
          col("event_type"))
        .localCheckpoint(true)
      val nE = ev.count()
      val tEql = timeS {
        Eql.sequence(ev, "user_id", "ts", "event_id",
          Seq(col("event_type") === "signup",
            col("event_type") === "purchase",
            col("event_type") === "error"), 7200000L).count()
      }
      val ord = Tables.load(spark, "/root/testdata/sf0.1", "orders")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("o_orderkey") * s + col("rep")).as("o_orderkey"),
          col("o_orderstatus"), col("o_orderdate"),
          col("o_orderpriority"))
        .localCheckpoint(true)
      val tIg = timeS { pipe(ord).count() }
      val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          col("text"))
        .localCheckpoint(true)
      val tSyn = timeS {
        graft.functions.EsScoredQuery.scoredFrame(docs, "doc_id",
          """{"match": {"text": "merge stream"}}""",
          synonyms = Seq("join, merge")).count()
      }
      val tPlain = timeS {
        graft.functions.EsScoredQuery.scoredFrame(docs, "doc_id",
          """{"match": {"text": "merge stream"}}""").count()
      }
      println(f"[scale] ${s}%-5d ${nE}%9d ${tEql}%8.2f " +
        f"${tIg}%10.2f ${tSyn}%8.2f ${tPlain}%9.2f")
    }
  }

  private def aggs14Growth(spark: SparkSession): Unit = {
    import graft.operators.{BucketPipeline, EsAggs, PhraseSuggest}
    def timeS(f: => Long): (Double, Long) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // untimed warmup
    locally {
      val w = Tables.load(spark, "/root/testdata/sf0.01", "orders")
      BucketPipeline.derivative(
        w.groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(sum("o_totalprice").as("v")), "m", "v", "d").count()
      ()
    }
    println("[scale] r14 agg surfaces: 1x/4x corpus; bucket count " +
      "fixed => pipeline-agg time tracks the scan, suggester tracks " +
      "the two count scans")
    println(f"[scale] ${"size"}%-5s ${"orders"}%9s ${"deriv(s)"}%9s " +
      f"${"cumcard(s)"}%11s ${"topHits(s)"}%11s ${"rare(s)"}%8s " +
      f"${"page(s)"}%8s ${"suggest(s)"}%11s")
    for (s <- Seq(1, 4)) {
      val orders = Tables.load(spark, "/root/testdata/sf0.1", "orders")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("o_orderkey") * s + col("rep")).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"))
        .localCheckpoint(true)
      val nO = orders.count()
      val ev = Tables.load(spark, "/root/testdata/sf0.1", "events")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select(col("ts"),
          (col("user_id") * s + col("rep")).as("user_id"))
        .localCheckpoint(true)
      val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        .crossJoin(spark.range(s).select(col("id").as("rep")))
        .select((col("doc_id") * s + col("rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .localCheckpoint(true)
      val (tD, _) = timeS {
        val b = orders
          .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
          .agg(sum("o_totalprice").as("v"))
        BucketPipeline.movingFn(
          BucketPipeline.derivative(b, "m", "v", "d"),
          "m", "v", 3, "unweightedAvg", out = "ma").count()
      }
      val (tC, _) = timeS {
        val raw = ev.select(date_trunc("day", col("ts")).as("day"),
          col("user_id"))
        val b = raw.groupBy("day").agg(count(lit(1)).as("n"))
        BucketPipeline.cumulativeCardinality(b, raw, col("day"),
          "user_id", "day").count()
      }
      val (tT, _) = timeS {
        EsAggs.topHits(orders, Seq("o_orderpriority"), "o_totalprice",
          3, "o_orderkey").count()
      }
      val (tR, nR) = timeS {
        EsAggs.rareTerms(docs.select(explode(array_distinct(
            graft.functions.TextAnalysis.tokens(col("text"))))
            .as("term")), Seq("term"), 2).count()
      }
      val (tP, _) = timeS {
        EsAggs.compositePage(orders,
          Seq("o_orderstatus", "o_orderpriority"), 5,
          afterKey = Some(Seq("F", "3-MEDIUM"))).count()
      }
      val (tS, _) = timeS {
        PhraseSuggest.suggest(docs, "text", "hash joinn scan",
          k = 3, numCandidates = 3).count()
      }
      val label = s"${s}x"
      println(f"[scale] $label%-5s $nO%9d $tD%9.2f $tC%11.2f " +
        f"$tT%11.2f $tR%8.2f $tP%8.2f $tS%11.2f  (rare=$nR)")
    }
  }
}

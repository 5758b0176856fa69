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
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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
}

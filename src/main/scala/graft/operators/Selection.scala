package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextAnalysis, VectorOps}
import graft.plans.VectorExpressions

/** Data selection by importance resampling (the DSIR recipe, Xie et
  * al. NeurIPS'23): score every raw document by how much its hashed
  * n-gram distribution looks like a TARGET domain rather than the raw
  * corpus, then sample with probability ∝ exp(weight) via the Gumbel
  * top-n trick. The standard "select pretraining data that resembles
  * the high-quality target" primitive.
  *
  * Scale shape: both bucket histograms are one counted shuffle each,
  * REDUCED to `buckets` rows (a few thousand); the per-bucket
  * log-ratio table broadcasts back onto the exploded raw corpus
  * (map-side join, the `Decontam` discipline), per-doc sums aggregate
  * map-side-partial, and the final top-n is a TakeOrdered heap merge.
  * The corpus never shuffles except the one (doc, gram-sum) count.
  * Totals (N_target, N_raw) enter as 1-row broadcast crossJoins
  * INSIDE the lazy plan — no eager driver action (the
  * `EsScoredQuery`/`LanguageModel` in-plan-stats discipline).
  *
  * Determinism contract (DuckDB-replayable end to end): bucket =
  * md5-derived 32-bit int mod `buckets`; smoothed log ratio
  * ln((c_t+α)/(N_t+αB)) − ln((c_r+α)/(N_r+αB)) ROUNDED to 6 dp per
  * bucket (kills libm last-ulp drift); per-doc weight = rounded sum of
  * rounded ratios; the Gumbel draw derives from the portable
  * `Sampling.hashKey` draw u = (h32 + 0.5)/2^32 ∈ (0,1), g =
  * −ln(−ln(u)) rounded to 6 dp; the sampling key is
  * round(weight + g, 6) with id tie-break.
  */
object Selection {

  /** Portable hashed-token bucket in [0, buckets). */
  def tokenBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  private def explodedBuckets(docs: DataFrame, idCol: Option[String],
                              textCol: String, buckets: Int): DataFrame = {
    val toks = explode(TextAnalysis.tokens(col(textCol))).as("_t")
    val base = idCol match {
      case Some(id) => docs.select(col(id), toks)
      case None     => docs.select(toks)
    }
    base.withColumn("_b", tokenBucket(col("_t"), buckets))
  }

  /** Per-bucket smoothed log importance ratio (bucket, log_ratio),
    * rounded to 6 dp. Buckets are the RAW corpus's observed buckets
    * (a bucket no raw token hashes into cannot contribute to any raw
    * document's weight).
    */
  def importanceRatios(rawDocs: DataFrame, targetDocs: DataFrame,
                       textCol: String, buckets: Int,
                       alpha: Double = 0.1): DataFrame = {
    require(buckets > 0 && alpha > 0, "buckets and alpha must be positive")
    val rb = explodedBuckets(rawDocs, None, textCol, buckets)
      .groupBy("_b").agg(count(lit(1)).as("_cr"))
    val tb = explodedBuckets(targetDocs, None, textCol, buckets)
      .groupBy("_b").agg(count(lit(1)).as("_ct"))
    val nr = rb.agg(sum(col("_cr")).as("_nr"))
    val nt = tb.agg(coalesce(sum(col("_ct")), lit(0L)).as("_nt"))
    rb.join(tb, Seq("_b"), "left")
      .na.fill(0L, Seq("_ct"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .select(col("_b").as("bucket"),
        round(
          log((col("_ct") + alpha) / (col("_nt") + alpha * buckets)) -
          log((col("_cr") + alpha) / (col("_nr") + alpha * buckets)),
          6).as("log_ratio"))
  }

  /** Per-document importance weight: (idCol, logw) — the rounded sum
    * of its tokens' bucket log ratios. Documents with no tokens yield
    * no row.
    */
  def importanceWeights(rawDocs: DataFrame, targetDocs: DataFrame,
                        idCol: String, textCol: String, buckets: Int,
                        alpha: Double = 0.1): DataFrame = {
    val lr = importanceRatios(rawDocs, targetDocs, textCol, buckets, alpha)
    explodedBuckets(rawDocs, Some(idCol), textCol, buckets)
      .join(broadcast(lr), col("_b") === col("bucket"))
      .groupBy(idCol)
      .agg(round(sum(col("log_ratio")), 6).as("logw"))
  }

  /** Gumbel top-n importance resample: the n documents with the
    * largest round(logw + gumbel, 6) keys (ties by id) — a sample
    * without replacement with inclusion probability ∝ exp(logw),
    * deterministic given `seed` and replayable by any engine with md5.
    * Output: (idCol, logw, skey), plan shape TakeOrderedAndProject.
    */
  def dsirSample(rawDocs: DataFrame, targetDocs: DataFrame,
                 idCol: String, textCol: String, n: Int, buckets: Int,
                 seed: Long, alpha: Double = 0.1): DataFrame = {
    require(n > 0, "n must be positive")
    val w = importanceWeights(rawDocs, targetDocs, idCol, textCol,
      buckets, alpha)
    val u = (conv(substring(Sampling.hashKey(col(idCol), seed), 1, 8),
      16, 10).cast("double") + 0.5) / lit(4294967296.0)
    w.withColumn("skey",
        round(col("logw") + round(-log(-log(u)), 6), 6))
      .orderBy(col("skey").desc, col(idCol))
      .limit(n)
  }

  /** Quality-threshold selection, stated as a RANK cut: keep the top
    * `frac` of every group by score (the FineWeb-style "best X% per
    * source" filter). A rank cut — row_number over (score desc, id)
    * up to ceil(frac × group size) — is exactly reproducible across
    * engines, unlike a quantile-threshold filter, whose interpolated
    * cutoff lands on last-ulp float territory and flips boundary
    * docs. Ties at the cut resolve by id (smaller id wins),
    * deterministic. frac ≥ 1 keeps whole groups; empty groups don't
    * exist by construction.
    *
    * Scale shape: one shuffle on the group column; the group-size
    * count rides the SAME window partitioning (no second shuffle).
    * Corpus mixes have tens of sources, so per-group windows are the
    * standard layout here; for a single giant group use the
    * [[Sampling.tokenBudgetMix]] prefix-sum discipline with the score
    * as the key instead.
    */
  def topFractionPerGroup(df: DataFrame, groupCol: String,
                          scoreCol: String, frac: Double,
                          idCol: String): DataFrame = {
    require(frac > 0, "topFractionPerGroup: frac must be positive")
    import org.apache.spark.sql.expressions.Window
    val part = Window.partitionBy(col(groupCol))
    val w = part.orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("_tfr", row_number().over(w))
      .withColumn("_tfn", count(lit(1)).over(part))
      .filter(col("_tfr") <= ceil(col("_tfn") * frac))
      .drop("_tfr", "_tfn")
  }

  /** Hard-negative mining for contrastive training: for every query,
    * the k most-cosine-similar corpus items that are NOT known
    * positives — the items a bi-encoder most needs to learn to push
    * away. `positives` carries (q_id, pos_id); the query's own id is
    * always excluded (it is its own positive).
    *
    * Scale shape: `Similarity.bruteForceTopK`'s layout — queries AND
    * the positive-pair table broadcast (both are training-set-sized,
    * not corpus-sized), the corpus never shuffles, the anti-join cuts
    * positives BEFORE any cosine is computed, and the per-query top-k
    * is the shared two-phase rank. For corpus-scale serving swap the
    * scored interior for ANN candidates and rescore, as in
    * [[Ranking.maxSimRerank]].
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    positives: DataFrame, idCol: String, vecCol: String,
                    k: Int, roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    val q = queries.select(col(idCol).as("q_id"),
      VectorOps.asDouble(col(vecCol)).as("_qv"))
      .withColumn("_qn", sqrt(VectorOps.normSq(col("_qv"))))
    val c = corpus.select(col(idCol).as("n_id"),
      VectorOps.asDouble(col(vecCol)).as("_nv"))
      .withColumn("_nn", sqrt(VectorOps.normSq(col("_nv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .join(broadcast(positives.select(col("q_id"),
        col("pos_id").as("n_id"))), Seq("q_id", "n_id"), "left_anti")
      .withColumn("cos", round(
        VectorExpressions.dot(col("_qv"), col("_nv")) /
          (col("_qn") * col("_nn")), roundTo))
    Similarity.rankTopKPerQuery(scored, k, "q_id", "n_id", "cos")
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }

  /** [[hardNegatives]] served from a persistent
    * [[VectorIndex]] instead of the brute-force cross join — the
    * corpus-scale path: first-stage candidates come from
    * [[VectorIndex.searchTopK]] (`fetchK` per query, cells pruned at
    * plan time), then self-matches and known positives are cut and
    * the survivors re-rank to the final top-k. No rescore stage is
    * needed: IVF pruning decides WHICH vectors get scored, never how
    * (each candidate arrives with its exact `roundTo`-dp cosine) —
    * unlike the ADC path, whose stage-1 scores are approximations.
    *
    * `queries` carries (idCol, vecCol); `positives` carries
    * (q_id, pos_id) in the query/corpus id spaces. Output
    * (q_id, rank, n_id, cos), row-identical to [[hardNegatives]]
    * whenever `nprobe` covers every cell AND `fetchK ≥ k + (positives
    * for the query) + 1` (the self-match); at serving configurations
    * the usual IVF recall dial applies, plus headroom in `fetchK` for
    * the rows the positive filter will cut.
    *
    * Scale shape: one index search (corpus side never shuffles — the
    * query frame broadcasts onto the pruned cell scan), then the
    * filter/anti-join/re-rank all run over ≤ |queries| × fetchK
    * candidate rows. A 100 TB corpus costs O(probed cells), not
    * O(|corpus| × |queries|) cosines.
    */
  def hardNegativesServed(queries: DataFrame, positives: DataFrame,
                          indexPath: String, idCol: String, vecCol: String,
                          k: Int, fetchK: Int, nprobe: Int = 2,
                          roundTo: Int = 6): DataFrame = {
    require(k > 0, "k must be positive")
    require(fetchK >= k,
      s"fetchK ($fetchK) must be >= k ($k) — and needs headroom for " +
        "the self-match and each query's positives, which are cut " +
        "AFTER candidate retrieval")
    val cand = VectorIndex.searchTopK(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("vec")),
      indexPath, fetchK, nprobe, qIdCol = "q_id", vecCol = "vec",
      idColName = "n_id", roundTo = roundTo)
    val filtered = cand.drop("rank")
      .filter(col("n_id") =!= col("q_id"))
      .join(broadcast(positives.select(col("q_id"),
        col("pos_id").as("n_id"))), Seq("q_id", "n_id"), "left_anti")
    Similarity.rankTopKPerQuery(filtered, k, "q_id", "n_id", "cos")
      .select(col("q_id"), col("rank"), col("n_id"), col("cos"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source corpus curation report — the "data card" numbers every
  * training-mix decision starts from: volume (docs, tokens, chars),
  * how much each cleaning rule family would remove (Gopher quality,
  * Gopher repetition), and exact-duplicate mass, per source.
  *
  * Deliberately INTEGER-only: sums of longs and boolean counts.
  * Cross-engine float means/averages hash-differ on addition order;
  * a report is exactly the place an auditor re-derives numbers in a
  * different engine, so every column here replays bit-for-bit (the
  * caller divides for rates).
  *
  * Scale shape: ONE scan — the quality signals ride
  * [[QualityRules.withSignals]]'s single tokenizer pass (n_words
  * doubles as the token count, so the corpus is tokenized once, not
  * twice) and the repetition verdict is one kernel call per row —
  * then one groupBy on the source column with map-side partial
  * aggregation; the distinct-digest count rides the same shuffle.
  * Nothing is collected; output is O(sources).
  *
  * Null-text rows: counted in `n_docs`, contribute 0 tokens/chars,
  * FAIL the quality rules (exactly like [[QualityRules.gopherFilter]]
  * drops them — the report and the filter must not disagree), PASS
  * the repetition rules (zero signals, the filter's contract), and
  * are never exact-duplicates of anything (no text, no digest).
  */
object CorpusReport {

  /** (source, n_docs, n_tokens, n_chars, n_fail_quality,
    * n_fail_repetition, n_exact_dup) — `n_exact_dup` counts the rows
    * beyond the first of each identical-text group WITHIN the source.
    * `minStopHits` passes through to the quality rule (corpora whose
    * register lacks web stopwords tune it, same as
    * [[QualityRules.gopherFilter]]).
    */
  def bySource(docs: DataFrame, textCol: String, sourceCol: String,
               minStopHits: Long = QualityRules.DefaultMinStopHits)
  : DataFrame = {
    val t = col(textCol)
    val withQ = QualityRules.withSignals(
      docs.select(col(sourceCol), t), textCol)
    // the inline spelling (over withSignals' already-bound columns)
    // keeps the single-tokenize plan; the BOUNDS come from the same
    // QualityRules constants gopherPass defaults to, so the report
    // cannot silently diverge from the filter
    val qualityPass =
      col("n_words") >= QualityRules.DefaultMinWords &&
        col("n_words") <= QualityRules.DefaultMaxWords &&
        col("mean_word_len") >= QualityRules.DefaultMinMeanWordLen &&
        col("mean_word_len") <= QualityRules.DefaultMaxMeanWordLen &&
        col("symbol_word_ratio") <= QualityRules.DefaultMaxSymbolRatio &&
        col("bullet_start_frac") <= QualityRules.DefaultMaxBulletFrac &&
        col("ellipsis_end_frac") <= QualityRules.DefaultMaxEllipsisFrac &&
        col("alpha_word_frac") >= QualityRules.DefaultMinAlphaFrac &&
        col("stop_hits") >= minStopHits
    withQ
      .select(col(sourceCol),
        coalesce(col("n_words"), lit(0L)).as("_ntok"),
        coalesce(length(t).cast("long"), lit(0L)).as("_nchr"),
        coalesce(qualityPass, lit(false)).as("_qp"),
        Repetition.gopherPass(t).as("_rp"),
        md5(t).as("_dig"))
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_ntok")).cast("long").as("n_tokens"),
        sum(col("_nchr")).cast("long").as("n_chars"),
        sum(when(col("_qp"), 0L).otherwise(1L)).cast("long")
          .as("n_fail_quality"),
        sum(when(col("_rp"), 0L).otherwise(1L)).cast("long")
          .as("n_fail_repetition"),
        (sum(when(col("_dig").isNotNull, 1L).otherwise(0L)) -
          countDistinct(col("_dig"))).cast("long")
          .as("n_exact_dup"))
  }

  /** Zipf fit over the top-`k` vocabulary: one row of
    * (n_terms, slope, intercept, r2) from the OLS of ln(freq) on
    * ln(rank) — the data-card "does this corpus look like natural
    * language" signal (natural corpora slope ≈ −1; templated or
    * synthetic text flattens it, spammy repetition steepens it).
    * Rank order is total — (freq desc, term asc) — so the fit is
    * deterministic; outputs round half-up at 6 dp (ln is the one
    * transcendental, the f24 rounding discipline).
    *
    * Scale shape: ONE map-side-combined term count (the kw1 shuffle —
    * (term, partial count) pairs only), a k-bounded sort-limit
    * (TakeOrderedAndProject), then a 1-row moment aggregate over the
    * ≤ k points; the rank window runs over the already-cut frame.
    */
  def zipfFit(docs: DataFrame, textCol: String, k: Int = 100)
      : DataFrame = {
    require(k >= 3, s"zipf fit needs k >= 3 points, got $k")
    val tf = docs.select(explode(
        graft.functions.TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).cast("double").as("f"))
    val top = tf.orderBy(col("f").desc, col("t")).limit(k)
      .withColumn("_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("f").desc, col("t"))))
    val pts = top.select(log(col("_rank").cast("double")).as("x"),
      log(col("f")).as("y"))
    val r6 = (c: org.apache.spark.sql.Column) =>
      graft.queries.QueryUtil.rhu(c, 6)
    pts.agg(count(lit(1)).cast("double").as("_n"),
        sum(col("x")).as("_sx"), sum(col("y")).as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"),
        sum(col("y") * col("y")).as("_syy"))
      .select(
        col("_n").cast("long").as("n_terms"),
        r6(((col("_sxy") - col("_sx") * col("_sy") / col("_n")) /
          (col("_sxx") - col("_sx") * col("_sx") / col("_n"))))
          .as("slope"),
        r6(((col("_sy") - ((col("_sxy") - col("_sx") * col("_sy") /
          col("_n")) / (col("_sxx") - col("_sx") * col("_sx") /
          col("_n"))) * col("_sx")) / col("_n"))).as("intercept"),
        r6((pow(col("_sxy") - col("_sx") * col("_sy") / col("_n"), 2.0) /
          ((col("_sxx") - col("_sx") * col("_sx") / col("_n")) *
            (col("_syy") - col("_sy") * col("_sy") / col("_n")))))
          .as("r2"))
  }
}

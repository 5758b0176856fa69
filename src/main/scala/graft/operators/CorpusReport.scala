package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

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
  * Scale shape: one scan computes the per-row flags (the two rule
  * predicates are single bound-struct expressions — see
  * [[Repetition.gopherPass]]), then ONE groupBy on the source column
  * with map-side partial aggregation; the distinct-digest count rides
  * the same shuffle as an md5 count-distinct. Nothing is collected;
  * output is O(sources).
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
               minStopHits: Long = 2L): DataFrame = {
    val t = col(textCol)
    docs
      .select(col(sourceCol),
        TextAnalysis.tokenCount(t).as("_ntok"),
        length(t).cast("long").as("_nchr"),
        QualityRules.gopherPass(t, minStopHits = minStopHits).as("_qp"),
        Repetition.gopherPass(t).as("_rp"),
        md5(t).as("_dig"))
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("_ntok")).cast("long").as("n_tokens"),
        sum(col("_nchr")).cast("long").as("n_chars"),
        sum(when(!col("_qp"), 1L).otherwise(0L)).cast("long")
          .as("n_fail_quality"),
        sum(when(!col("_rp"), 1L).otherwise(0L)).cast("long")
          .as("n_fail_repetition"),
        (count(lit(1)) - countDistinct(col("_dig"))).cast("long")
          .as("n_exact_dup"))
  }
}

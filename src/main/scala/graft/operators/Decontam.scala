package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Benchmark-contamination sweep over a corpus: flag training
  * documents that share any token n-gram with an evaluation set (the
  * standard decontamination recipe for LLM training data — exact
  * n-gram overlap against held-out benchmarks).
  *
  * Scale shape: the benchmark n-gram set is small (benchmarks are
  * thousands of documents, not billions), so it is distinct-ed and
  * BROADCAST; the corpus side explodes its n-grams and hash-joins
  * map-side — the corpus is never shuffled to find matches. Only the
  * matched (doc, gram) pairs — a tiny fraction — flow into the
  * per-document aggregation. Order matters: join *before* distinct,
  * so the broadcast join is the filter and the dedup pass touches
  * survivors only.
  */
object Decontam {

  /** Per-document count of distinct benchmark n-grams found
    * (`n_hit_ngrams`); documents with no overlap are absent. `n` is
    * the shingle width (word n-grams, whitespace-tokenized,
    * lowercased — [[TextAnalysis.shingles]]).
    */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
                          bench: DataFrame, benchTextCol: String,
                          n: Int): DataFrame = {
    // tokens staged in their own projection on both sides (the arr1
    // rule: the shingle lambda would otherwise re-run the tokenizer
    // once per shingle position)
    val benchGrams = broadcast(
      bench.select(TextAnalysis.tokens(col(benchTextCol)).as("_toks"))
        .select(explode(TextAnalysis.shinglesFromTokens(col("_toks"), n))
          .as("_gram"))
        .distinct())
    corpus
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col(idCol),
        explode(TextAnalysis.shinglesFromTokens(col("_toks"), n)).as("_gram"))
      .join(benchGrams, Seq("_gram"))
      .groupBy(idCol)
      .agg(count_distinct(col("_gram")).cast("long").as("n_hit_ngrams"))
  }

  /** The drop-list face: ids of contaminated documents (≥ `minHits`
    * distinct shared n-grams), ready for [[Dedup]]-style removal.
    */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String,
                      n: Int, minHits: Long = 1L): DataFrame =
    contaminationReport(corpus, idCol, textCol, bench, benchTextCol, n)
      .filter(col("n_hit_ngrams") >= minHits)
      .select(idCol)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-trained bigram language-model scoring — the perplexity-style
  * quality filter (CCNet's KenLM recipe, reduced to a declarative
  * bigram model): documents whose token transitions are improbable
  * under the corpus's own statistics score low and get filtered.
  *
  * Model: add-k smoothed bigram probabilities
  * `P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V)` with V = distinct
  * unigrams; a document's score is the mean natural-log probability
  * over its transitions (higher = more fluent under the corpus).
  * Documents with fewer than 2 tokens are absent (no transitions).
  *
  * Scale shape: training is two counted shuffles (unigrams, bigrams)
  * with map-side partial aggregation — the same cost as t8's
  * repetition sweep. Scoring joins each document transition against
  * the bigram table: a plain hash equi-join on the (w1,w2) pair key,
  * the shape AQE load-balances; nothing is windowed or collected.
  * Unseen bigrams hit the smoothing floor via a LEFT join +
  * coalesce(0). The unigram join is DIFFERENT: its key `_w1` alone is
  * Zipf-skewed (the "the" partition would straggle at 100×), and for
  * natural-language corpora the unigram table is vocabulary-bounded
  * (≲ millions of rows), so it is broadcast by default — no transition
  * row ever shuffles on a single-token key. PlanQualitySpec pins this
  * shape. For corpora whose token space is adversarial (URLs, hashes,
  * raw code — distinct "tokens" scale with the data, not the
  * language), pass `broadcastUnigrams = false` to keep the size-based
  * shuffled join and let AQE's skew split carry the hot keys instead
  * of risking the broadcast limit.
  */
object LanguageModel {

  /** Per-document mean log-probability: (idCol, n_trans, mean_logp).
    * `model` docs train the bigram stats; `score` docs are scored
    * (they may be the same frame — self-scoring, the usual recipe).
    */
  def bigramScore(model: DataFrame, score: DataFrame, idCol: String,
                  textCol: String, k: Double = 0.5,
                  broadcastUnigrams: Boolean = true): DataFrame = {
    require(k > 0, "smoothing k must be positive")
    def transitions(df: DataFrame, withId: Boolean): DataFrame = {
      val staged = df.select(
        (if (withId) Seq(col(idCol)) else Seq.empty[org.apache.spark.sql.Column]) :+
          TextAnalysis.tokens(col(textCol)).as("_toks"): _*)
      staged
        .filter(size(col("_toks")) >= 2)
        .select((if (withId) Seq(col(idCol)) else Nil) :+
          posexplode(slice(col("_toks"), lit(1), size(col("_toks")) - 1))
            .as(Seq("_p", "_w1")) :+ col("_toks"): _*)
        .select((if (withId) Seq(col(idCol)) else Nil) ++ Seq(
          col("_w1"), element_at(col("_toks"), col("_p") + 2).as("_w2")): _*)
    }

    val trainTrans = transitions(model, withId = false)
    val big = trainTrans.groupBy("_w1", "_w2")
      .agg(count(lit(1)).cast("double").as("_cb"))
    val uni = model
      .select(explode(TextAnalysis.tokens(col(textCol))).as("_w1"))
      .groupBy("_w1").agg(count(lit(1)).cast("double").as("_cu"))
    val vocabSize = uni.agg(count(lit(1)).cast("double").as("_v"))

    transitions(score, withId = true)
      .join(big, Seq("_w1", "_w2"), "left")
      .join(if (broadcastUnigrams) broadcast(uni) else uni,
        Seq("_w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .withColumn("_logp",
        log((coalesce(col("_cb"), lit(0.0)) + k) /
          (coalesce(col("_cu"), lit(0.0)) + lit(k) * col("_v"))))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_trans"),
        round(avg(col("_logp")), 6).as("mean_logp"))
  }
}

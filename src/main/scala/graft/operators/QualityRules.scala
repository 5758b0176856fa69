package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** The non-repetition half of the Gopher quality rules (Rae et al.
  * 2021, Table A1 "quality filtering" — [[Repetition]] holds the
  * repetition half): word-count bounds, mean word length, symbol-to-
  * word ratio, bullet/ellipsis line shares, alphabetic-word share,
  * and the required-stopword check.
  *
  * Everything is a PER-ROW expression over one staged tokenizer /
  * line-split pass — zero shuffle, scan-bound, embarrassingly
  * parallel at 100 TB. Every emitted fraction is a single double
  * division of exactly-counted integers, so any engine replays the
  * values bit-for-bit.
  *
  * Signal definitions (tokens = lowercased whitespace words; lines =
  * `\r?\n`-split, trimmed, empties dropped):
  *  - `n_words`, `mean_word_len`
  *  - `symbol_word_ratio`: (# of `#` + # of non-overlapping `...`) /
  *    n_words
  *  - `bullet_start_frac` / `ellipsis_end_frac`: share of lines
  *    starting with a bullet (one of `•` `*` `-`) / ending with
  *    `...` or `…`
  *  - `alpha_word_frac`: share of words containing a letter
  *  - `stop_hits`: how many of Gopher's eight required stopwords
  *    (the, be, to, of, and, that, have, with) occur at least once
  */
object QualityRules {

  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val signalCols = Seq("n_words", "mean_word_len",
    "symbol_word_ratio", "bullet_start_frac", "ellipsis_end_frac",
    "alpha_word_frac", "stop_hits")

  private def ratio(num: Column, den: Column): Column =
    when(den > 0, num.cast("double") / den.cast("double"))
      .otherwise(lit(0.0))

  /** Non-overlapping occurrences of literal `lit` in `text`, counted
    * by length delta — no regex, replays as `replace()` anywhere.
    */
  private def literalCount(text: Column, s: String): Column =
    ((length(text) - length(replace(text, lit(s), lit("")))) /
      s.length).cast("long")

  /** `docs` plus the seven signal columns (original columns kept). */
  def withSignals(docs: DataFrame, textCol: String,
                  stopwords: Seq[String] = GopherStopwords): DataFrame = {
    val keep = docs.columns.map(col).toSeq
    val staged = docs
      .withColumn("_toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("_lns",
        filter(transform(split(col(textCol), "\\r?\\n"), u => trim(u)),
          u => u =!= ""))
    val n = size(col("_toks"))
    val nLines = size(col("_lns"))
    val sumTokLen =
      aggregate(col("_toks"), lit(0L), (acc, t) => acc + length(t))
    val alphaWords =
      size(filter(col("_toks"), t => t.rlike("[a-z]")))
    val bulletLines = size(filter(col("_lns"),
      l => substring(l, 1, 1).isin("•", "*", "-")))
    val ellipsisLines = size(filter(col("_lns"),
      l => l.endsWith("...") || l.endsWith("…")))
    val stopHits = stopwords
      .map(w => when(array_contains(col("_toks"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    staged.select(keep ++ Seq(
      n.cast("long").as("n_words"),
      ratio(sumTokLen, n).as("mean_word_len"),
      ratio(literalCount(col(textCol), "#") +
        literalCount(col(textCol), "..."), n).as("symbol_word_ratio"),
      ratio(bulletLines, nLines).as("bullet_start_frac"),
      ratio(ellipsisLines, nLines).as("ellipsis_end_frac"),
      ratio(alphaWords, n).as("alpha_word_frac"),
      stopHits.as("stop_hits")): _*)
  }

  /** id + the seven signals, the audit/report face. */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String] = GopherStopwords): DataFrame =
    withSignals(docs.select(idCol, textCol), textCol, stopwords)
      .select((idCol +: signalCols).map(col): _*)

  /** Survivors of the published Gopher quality rules (original
    * columns): 50 <= words <= 100000, 3 <= mean word length <= 10,
    * symbol ratio <= 0.1, bullet lines <= 90%, ellipsis lines <= 30%,
    * >= 80% alphabetic words, >= 2 required stopwords. Bounds are
    * overridable for corpora whose register differs from web text.
    */
  def gopherFilter(docs: DataFrame, textCol: String,
                   minWords: Long = 50L, maxWords: Long = 100000L,
                   minMeanWordLen: Double = 3.0,
                   maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1,
                   maxBulletFrac: Double = 0.9,
                   maxEllipsisFrac: Double = 0.3,
                   minAlphaFrac: Double = 0.8,
                   minStopHits: Long = 2L,
                   stopwords: Seq[String] = GopherStopwords): DataFrame =
    withSignals(docs, textCol, stopwords)
      .filter(col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("symbol_word_ratio") <= maxSymbolRatio &&
        col("bullet_start_frac") <= maxBulletFrac &&
        col("ellipsis_end_frac") <= maxEllipsisFrac &&
        col("alpha_word_frac") >= minAlphaFrac &&
        col("stop_hits") >= minStopHits)
      .select(docs.columns.map(col).toSeq: _*)
}

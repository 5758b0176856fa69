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
  * Everything is a PER-ROW expression over one lambda-bound
  * tokenizer / line-split evaluation ([[TextAnalysis.bindOnce]] — the
  * staging barrier that survives predicate pushdown; see
  * [[Repetition.signalsStruct]]'s note) — zero shuffle, scan-bound,
  * embarrassingly parallel at 100 TB. Every emitted fraction is a
  * single double division of exactly-counted integers, so any engine
  * replays the values bit-for-bit.
  *
  * Signal definitions (tokens = lowercased whitespace words; lines =
  * `\r?\n`-split, trimmed, empties dropped):
  *  - `n_words`, `mean_word_len`
  *  - `symbol_word_ratio`: (# of `#` + # of non-overlapping `...`) /
  *    n_words
  *  - `bullet_start_frac` / `ellipsis_end_frac`: share of lines
  *    starting with a bullet (one of `•` `*` `-`) / ending with
  *    `...` or `…`
  *  - `alpha_word_frac`: share of words containing a letter in ANY
  *    script (`\p{L}` — an ASCII-only class would zero out every
  *    non-Latin corpus and the filter would drop all of it)
  *  - `stop_hits`: how many of Gopher's eight required stopwords
  *    (the, be, to, of, and, that, have, with) occur at least once
  */
object QualityRules {

  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val signalCols = Seq("n_words", "mean_word_len",
    "symbol_word_ratio", "bullet_start_frac", "ellipsis_end_frac",
    "alpha_word_frac", "stop_hits")

  /** Non-overlapping occurrences of literal `s` in `text`, counted
    * by length delta — no regex, replays as `replace()` anywhere.
    */
  private def literalCount(text: Column, s: String): Column =
    ((length(text) - length(replace(text, lit(s), lit("")))) /
      s.length).cast("long")

  /** The seven signals as ONE struct expression over a single bound
    * (text, tokens, lines) evaluation.
    */
  private def signalsStruct(text: Column,
                            stopwords: Seq[String]): Column =
    TextAnalysis.bindOnce(struct(
      text.as("txt"),
      TextAnalysis.tokens(text).as("toks"),
      TextAnalysis.trimmedNonEmptyUnits(text, "\\r?\\n").as("lns"))) { s =>
      val txt = s.getField("txt")
      val toks = s.getField("toks")
      val lns = s.getField("lns")
      val n = size(toks)
      val sumTokLen =
        aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      val alphaWords =
        size(filter(toks, t => t.rlike("\\p{L}")))
      val bulletLines = size(filter(lns,
        l => substring(l, 1, 1).isin("•", "*", "-")))
      val ellipsisLines = size(filter(lns,
        l => l.endsWith("...") || l.endsWith("…")))
      val stopHits = stopwords
        .map(w => when(array_contains(toks, w), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      struct(
        n.cast("long").as("n_words"),
        TextAnalysis.safeRatio(sumTokLen, n).as("mean_word_len"),
        TextAnalysis.safeRatio(literalCount(txt, "#") +
          literalCount(txt, "..."), n).as("symbol_word_ratio"),
        TextAnalysis.safeRatio(bulletLines, size(lns))
          .as("bullet_start_frac"),
        TextAnalysis.safeRatio(ellipsisLines, size(lns))
          .as("ellipsis_end_frac"),
        TextAnalysis.safeRatio(alphaWords, n).as("alpha_word_frac"),
        stopHits.as("stop_hits"))
    }

  /** `docs` plus the seven signal columns (original columns kept).
    * The struct expands through the `inline` generator — one
    * evaluation per row, see [[Repetition.withSignals]]'s note.
    */
  def withSignals(docs: DataFrame, textCol: String,
                  stopwords: Seq[String] = GopherStopwords): DataFrame =
    docs.select(docs.columns.map(col).toSeq :+
      inline(array(signalsStruct(col(textCol), stopwords))): _*)

  /** id + the seven signals, the audit/report face. */
  def signals(docs: DataFrame, idCol: String, textCol: String,
              stopwords: Seq[String] = GopherStopwords): DataFrame =
    withSignals(docs.select(idCol, textCol), textCol, stopwords)
      .select((idCol +: signalCols).map(col): _*)

  // Published Gopher Table-A1 default bounds — the single source of
  // truth for [[gopherFilter]]/[[gopherPass]] defaults AND for
  // [[CorpusReport.bySource]]'s inline single-tokenize predicate (the
  // report must never disagree with the filter, so any change here
  // reaches both).
  val DefaultMinWords: Long = 50L
  val DefaultMaxWords: Long = 100000L
  val DefaultMinMeanWordLen: Double = 3.0
  val DefaultMaxMeanWordLen: Double = 10.0
  val DefaultMaxSymbolRatio: Double = 0.1
  val DefaultMaxBulletFrac: Double = 0.9
  val DefaultMaxEllipsisFrac: Double = 0.3
  val DefaultMinAlphaFrac: Double = 0.8
  val DefaultMinStopHits: Long = 2L

  /** Survivors of the published Gopher quality rules (original
    * columns): 50 <= words <= 100000, 3 <= mean word length <= 10,
    * symbol ratio <= 0.1, bullet lines <= 90%, ellipsis lines <= 30%,
    * >= 80% alphabetic words, >= 2 required stopwords. Bounds are
    * overridable for corpora whose register differs from web text
    * (minStopHits = 0 with an empty list disables that rule). The
    * whole rule set is ONE predicate over the bound signal struct —
    * see [[Repetition.gopherFilter]]'s pushdown note.
    */
  def gopherFilter(docs: DataFrame, textCol: String,
                   minWords: Long = DefaultMinWords,
                   maxWords: Long = DefaultMaxWords,
                   minMeanWordLen: Double = DefaultMinMeanWordLen,
                   maxMeanWordLen: Double = DefaultMaxMeanWordLen,
                   maxSymbolRatio: Double = DefaultMaxSymbolRatio,
                   maxBulletFrac: Double = DefaultMaxBulletFrac,
                   maxEllipsisFrac: Double = DefaultMaxEllipsisFrac,
                   minAlphaFrac: Double = DefaultMinAlphaFrac,
                   minStopHits: Long = DefaultMinStopHits,
                   stopwords: Seq[String] = GopherStopwords): DataFrame =
    docs.filter(gopherPass(col(textCol), minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletFrac,
      maxEllipsisFrac, minAlphaFrac, minStopHits, stopwords))

  /** The filter's predicate as a boolean Column — composable into
    * reports and multi-rule sweeps ([[CorpusReport]]).
    */
  def gopherPass(text: Column,
                 minWords: Long = DefaultMinWords,
                 maxWords: Long = DefaultMaxWords,
                 minMeanWordLen: Double = DefaultMinMeanWordLen,
                 maxMeanWordLen: Double = DefaultMaxMeanWordLen,
                 maxSymbolRatio: Double = DefaultMaxSymbolRatio,
                 maxBulletFrac: Double = DefaultMaxBulletFrac,
                 maxEllipsisFrac: Double = DefaultMaxEllipsisFrac,
                 minAlphaFrac: Double = DefaultMinAlphaFrac,
                 minStopHits: Long = DefaultMinStopHits,
                 stopwords: Seq[String] = GopherStopwords): Column =
    TextAnalysis.bindOnce(signalsStruct(text, stopwords)) { s =>
      s.getField("n_words") >= minWords &&
        s.getField("n_words") <= maxWords &&
        s.getField("mean_word_len") >= minMeanWordLen &&
        s.getField("mean_word_len") <= maxMeanWordLen &&
        s.getField("symbol_word_ratio") <= maxSymbolRatio &&
        s.getField("bullet_start_frac") <= maxBulletFrac &&
        s.getField("ellipsis_end_frac") <= maxEllipsisFrac &&
        s.getField("alpha_word_frac") >= minAlphaFrac &&
        s.getField("stop_hits") >= minStopHits
    }
}

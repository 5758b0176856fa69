package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Gopher-style within-document repetition signals (Rae et al. 2021,
  * "Scaling Language Models: ...", Table A1) — the standard
  * repetitious-text filters every web-crawl curation pipeline runs
  * after boilerplate removal: duplicate line / paragraph fractions and
  * top / duplicated word-n-gram character coverage.
  *
  * All thirteen signals are PER-ROW array computations — tokenize,
  * split, `array_sort`, then one pass of adjacency counting per
  * signal — so the sweep is zero-shuffle and embarrassingly parallel:
  * at 100 TB it is a single scan-shaped stage whose cost is linear in
  * corpus bytes (the sort is per-document, O(m log m) on in-memory
  * arrays). Sorted-adjacency replaces a per-document hash map:
  * duplicate occurrences are exactly the positions equal to a
  * neighbor, and run lengths give per-gram counts without ever
  * materializing a (doc, gram) pair table — the explode + groupBy
  * spelling would shuffle ~9x the corpus token count.
  *
  * Exact signal definitions (documented because published
  * implementations differ in the small print):
  *  - `dup_line_frac` / `dup_para_frac`: fraction of units that are a
  *    2nd+ occurrence of their value (trimmed, empties dropped; lines
  *    split on `\r?\n`, paragraphs on blank lines).
  *  - `dup_line_char_frac` / `dup_para_char_frac`: characters in those
  *    2nd+ occurrences over total unit characters.
  *  - `top_{2,3,4}gram_char_frac`: count x length of the most frequent
  *    word n-gram (ties broken toward larger coverage) over total text
  *    characters.
  *  - `dup_{5..10}gram_char_frac`: count x length summed over ALL
  *    occurrences of n-grams appearing more than once, over total text
  *    characters (may exceed 1 on degenerate inputs — a monotone
  *    signal, thresholded well below 1).
  *
  * Reference surface: eland has no curation ops (this is the
  * training-data-pipeline extension the brief mandates); thresholds
  * are the published Gopher values.
  */
object Repetition {

  /** (signal name, Gopher removal threshold): a document is dropped
    * when ANY signal strictly exceeds its threshold.
    */
  val GopherThresholds: Seq[(String, Double)] = Seq(
    "dup_line_frac" -> 0.30, "dup_para_frac" -> 0.30,
    "dup_line_char_frac" -> 0.20, "dup_para_char_frac" -> 0.20,
    "top_2gram_char_frac" -> 0.20, "top_3gram_char_frac" -> 0.18,
    "top_4gram_char_frac" -> 0.16, "dup_5gram_char_frac" -> 0.15,
    "dup_6gram_char_frac" -> 0.14, "dup_7gram_char_frac" -> 0.13,
    "dup_8gram_char_frac" -> 0.12, "dup_9gram_char_frac" -> 0.11,
    "dup_10gram_char_frac" -> 0.10)

  private val signalNames: Seq[String] = GopherThresholds.map(_._1)

  // The three run scans below iterate over the sorted array's ELEMENTS
  // (aggregate over `s` itself), never over positions: an index-based
  // spelling (element_at(s, i) under the lambda) re-evaluates whatever
  // expression `s` resolves to once per element — and CollapseProject
  // is free to inline the staged split/sort pipeline into those
  // references, which turns the sweep O(m^2) interpreted (observed:
  // minutes instead of seconds at 500 docs). Element iteration
  // evaluates `s` exactly once per aggregate call no matter what the
  // optimizer inlines; the lambdas touch only the element and the
  // accumulator. Same discipline as Dedup.minhashFromHashes.

  private val noStr = lit(null).cast("string")

  /** Characters in 2nd+ occurrences within a SORTED string array —
    * an element is a repeat iff it equals its predecessor.
    */
  private def repeatChars(s: Column): Column =
    aggregate(s,
      struct(noStr.as("prev"), lit(0L).as("sum")),
      (acc, x) => struct(x.as("prev"),
        (acc.getField("sum") + when(x <=> acc.getField("prev"),
          length(x).cast("long")).otherwise(lit(0L))).as("sum")),
      _.getField("sum"))

  /** Characters over ALL occurrences of duplicated values in a sorted
    * array: each run of length r >= 2 contributes r x len. Runs are
    * flushed into `sum` when they end; the finish lambda flushes the
    * final run.
    */
  private def dupAllOccChars(s: Column): Column = {
    def runChars(run: Column, prev: Column): Column =
      when(run >= 2, run * length(prev).cast("long")).otherwise(lit(0L))
    aggregate(s,
      struct(noStr.as("prev"), lit(0L).as("run"), lit(0L).as("sum")),
      (acc, x) => {
        val cont = x <=> acc.getField("prev")
        struct(x.as("prev"),
          when(cont, acc.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(cont, acc.getField("sum")).otherwise(acc.getField("sum") +
            runChars(acc.getField("run"), acc.getField("prev"))).as("sum"))
      },
      acc => acc.getField("sum") +
        runChars(acc.getField("run"), acc.getField("prev")))
  }

  /** count x length of the best run in a sorted array, "best" =
    * longest run, ties toward larger char coverage — one forward scan
    * with a (prev, current run, best) accumulator.
    */
  private def topRunChars(s: Column): Column =
    aggregate(s,
      struct(noStr.as("prev"), lit(0L).as("cur"),
        lit(0L).as("bestCnt"), lit(0L).as("bestChars")),
      (acc, x) => {
        val cur = when(x <=> acc.getField("prev"),
          acc.getField("cur") + 1L).otherwise(lit(1L))
        val chars = cur * length(x).cast("long")
        val better = (cur > acc.getField("bestCnt")) ||
          (cur === acc.getField("bestCnt") &&
            chars > acc.getField("bestChars"))
        struct(x.as("prev"), cur.as("cur"),
          when(better, cur).otherwise(acc.getField("bestCnt"))
            .as("bestCnt"),
          when(better, chars).otherwise(acc.getField("bestChars"))
            .as("bestChars"))
      },
      _.getField("bestChars"))

  private def totalChars(units: Column): Column =
    aggregate(units, lit(0L), (acc, u) => acc + length(u).cast("long"))

  /** The thirteen signals as one struct — the native compiled kernel
    * ([[graft.plans.TokenRepetitionSignals]]): one pass, hash-map
    * counts, whole-stage-codegen friendly. Bit-identical to
    * [[signalsStructHof]] (differential-tested in RepetitionSpec),
    * INCLUDING null text: the HOF's safeRatio guards fall through to
    * all-0.0 signals there (no text, nothing repeats — such rows PASS
    * the repetition rules and historically did), so the kernel's null
    * is coalesced to the same zero struct rather than letting a null
    * predicate silently drop the rows in [[gopherFilter]].
    */
  private val zeroSignals: Column =
    struct(signalNames.map(n => lit(0.0).as(n)): _*)

  private def signalsStruct(text: Column): Column =
    coalesce(graft.plans.TokenRepetitionSignals(text), zeroSignals)

  /** The interpreted higher-order-function reference the kernel is
    * pinned against: one lambda-bound (tokens, sorted lines, sorted
    * paragraphs, char length) evaluation — [[TextAnalysis.bindOnce]]
    * is the staging barrier here, NOT projection aliases: the
    * optimizer inlines aliases into filter predicates and downstream
    * lambdas, and an inlined tokenizer inside a shingle lambda
    * re-runs once per position (measured: the per-alias spelling cost
    * 100 s-class filter passes at sf0.1; this shape is seconds, the
    * kernel is milliseconds). Inside the binding every reference is
    * an O(1) read of the evaluated struct; each gram width's
    * build+sort appears exactly once.
    */
  private[graft] def signalsStructHof(text: Column): Column =
    TextAnalysis.bindOnce(struct(
      TextAnalysis.tokens(text).as("toks"),
      array_sort(TextAnalysis.trimmedNonEmptyUnits(text, "\\r?\\n"))
        .as("lns"),
      array_sort(TextAnalysis.trimmedNonEmptyUnits(text,
        "\\r?\\n\\s*\\r?\\n")).as("prs"),
      length(text).cast("long").as("tlen"))) { s =>
      val toks = s.getField("toks")
      val lns = s.getField("lns")
      val prs = s.getField("prs")
      val tlen = s.getField("tlen")
      def sorted(n: Int) =
        array_sort(TextAnalysis.shinglesFromTokens(toks, n))
      val sigs = Seq(
        TextAnalysis.safeRatio(size(lns) - size(array_distinct(lns)),
          size(lns)).as("dup_line_frac"),
        TextAnalysis.safeRatio(size(prs) - size(array_distinct(prs)),
          size(prs)).as("dup_para_frac"),
        TextAnalysis.safeRatio(repeatChars(lns), totalChars(lns))
          .as("dup_line_char_frac"),
        TextAnalysis.safeRatio(repeatChars(prs), totalChars(prs))
          .as("dup_para_char_frac")) ++
        (2 to 4).map(n => TextAnalysis.safeRatio(topRunChars(sorted(n)),
          tlen).as(s"top_${n}gram_char_frac")) ++
        (5 to 10).map(n => TextAnalysis.safeRatio(
          dupAllOccChars(sorted(n)), tlen).as(s"dup_${n}gram_char_frac"))
      // built in GopherThresholds order — that IS the contract
      struct(sigs: _*)
    }

  /** `docs` plus the thirteen signal columns (original columns kept —
    * the filter face uses [[gopherFilter]]'s single-predicate shape
    * instead of this projection). The struct expands through the
    * `inline` GENERATOR, which evaluates it once per row — thirteen
    * `getField` projections would each re-evaluate the kernel
    * (measured ~13x on the signals face).
    */
  def withSignals(docs: DataFrame, textCol: String): DataFrame = {
    val keep = docs.columns.map(col).toSeq
    docs.select(keep :+
      inline(array(signalsStruct(col(textCol)))): _*)
  }

  /** doc id + the thirteen signals, the audit/report face. */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withSignals(docs.select(idCol, textCol), textCol)
      .select((idCol +: signalNames).map(col): _*)

  /** Survivors of the Gopher repetition rules (original columns):
    * drop when any signal strictly exceeds its published threshold.
    * Pass `thresholds` to tighten/loosen individual rules.
    *
    * The whole rule set is ONE predicate expression over the single
    * bound signal struct — filtering on 13 projected signal columns
    * would let predicate pushdown inline 13 copies of the full
    * signal pipeline into the filter.
    */
  def gopherFilter(docs: DataFrame, textCol: String,
                   thresholds: Seq[(String, Double)] = GopherThresholds)
      : DataFrame =
    docs.filter(gopherPass(col(textCol), thresholds))

  /** The filter's predicate as a boolean Column — composable into
    * reports and multi-rule sweeps ([[CorpusReport]]); one signal
    * evaluation per row regardless of how many thresholds reference
    * it.
    */
  def gopherPass(text: Column,
                 thresholds: Seq[(String, Double)] = GopherThresholds)
      : Column = {
    require(thresholds.nonEmpty, "gopherPass: empty thresholds")
    TextAnalysis.bindOnce(signalsStruct(text)) { s =>
      thresholds.iterator
        .map { case (n, t) => s.getField(n) <= t }
        .reduce(_ && _)
    }
  }
}

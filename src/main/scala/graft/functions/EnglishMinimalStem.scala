package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Minimal English stemmer — Harman's S-stemmer ("How effective is
  * suffixing?", JASIS 42(1), 1991) in the exact rule order Lucene's
  * `EnglishMinimalStemFilter` ships as Elasticsearch's
  * `minimal_english` token filter. This is the analysis step the
  * reference delegates to ES's analyzed `text` fields
  * (eland/query_compiler.py:419-488 warns when `es_match` targets a
  * non-analyzed field precisely because this normalization would be
  * skipped): "filters" matches "filter", "queries" matches "query".
  *
  * Rules over a lowercased token (applied once — the stemmer is
  * idempotent, every output is a fixed point):
  *   1. length < 3 or no trailing 's'          → unchanged
  *   2. ends "us" / "ss"                       → unchanged
  *   3. ends "ies", length > 3, not preceded
  *      by 'a'/'e'                             → "ies" → "y"
  *   4. otherwise ends "ies"/"aes"/"oes"/"ees" → unchanged
  *   5. otherwise                              → drop the final 's'
  *
  * Deliberately NOT Porter: the minimal stemmer only conflates
  * plural/singular surface forms, never derivational suffixes, so it
  * is integer-exact string rewriting a DuckDB oracle replays verbatim
  * (CASE + ends_with + substr — see the g23/idx9 gates). Both
  * spellings below are code-point-exact twins (property-fuzzed in
  * StemmerSpec): the Column form for in-plan analysis, the String
  * form for driver-side query-term analysis and the TokenMatch
  * codegen core.
  */
object EnglishMinimalStem {

  /** Analyzer names the match/index surfaces accept. */
  val Analyzers: Set[String] = Set("standard", "english")

  def requireKnown(analyzer: String): Unit =
    require(Analyzers.contains(analyzer),
      s"unknown analyzer '$analyzer' — supported: standard " +
        "(lowercase whitespace tokens), english (minimal English stem)")

  /** Column spelling — pure when/endsWith/substr ops, codegen-friendly
    * and engine-replayable. Operates on one (already lowercased)
    * token.
    */
  def stem(t: Column): Column =
    when(length(t) < 3 || !t.endsWith("s"), t)
      .when(t.endsWith("us") || t.endsWith("ss"), t)
      .when(t.endsWith("ies") && length(t) > 3 &&
          !t.endsWith("aies") && !t.endsWith("eies"),
        concat(t.substr(lit(1), length(t) - 3), lit("y")))
      .when(t.endsWith("ies") || t.endsWith("aes") ||
          t.endsWith("oes") || t.endsWith("ees"), t)
      .otherwise(t.substr(lit(1), length(t) - 1))

  /** String twin of [[stem]], code-point-exact: Spark's `length`/
    * `substr` count code points, so a UTF-16 `charAt` spelling would
    * diverge on astral-plane tokens (the suffix characters themselves
    * are ASCII, but the LENGTH tests are not).
    */
  def stemString(t: String): String = {
    val n = t.codePointCount(0, t.length)
    if (n < 3 || !t.endsWith("s")) return t
    if (t.endsWith("us") || t.endsWith("ss")) return t
    if (t.endsWith("ies") && n > 3 &&
        !t.endsWith("aies") && !t.endsWith("eies"))
      return t.substring(0, t.length - 3) + "y"
    if (t.endsWith("ies") || t.endsWith("aes") ||
        t.endsWith("oes") || t.endsWith("ees")) return t
    t.substring(0, t.length - 1)
  }

  /** Apply the named analyzer to one already-lowercased term,
    * driver-side (query-term analysis in [[EsMatch]] /
    * [[graft.operators.InvertedIndex]]).
    */
  def analyzeTerm(analyzer: String, term: String): String = {
    requireKnown(analyzer)
    if (analyzer == "english") stemString(term) else term
  }

  /** Apply the named analyzer to a token-array Column (index build /
    * HOF match reference forms).
    */
  def analyzeTokens(analyzer: String, toks: Column): Column = {
    requireKnown(analyzer)
    if (analyzer == "english") transform(toks, stem(_)) else toks
  }
}

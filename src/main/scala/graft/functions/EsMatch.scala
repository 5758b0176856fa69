package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full-text match semantics over analyzed-text columns — the Spark
  * re-expression of eland's `es_match` (eland/query_compiler.py:419-488:
  * match / match_phrase / multi_match with optional fuzziness).
  *
  * The "analyzer" here is the same lowercase-whitespace tokenizer used
  * across the text stack (TextAnalysis.tokens). All variants are pure
  * codegen-friendly expressions (exists/forall/levenshtein builtins);
  * no UDFs, no index — at scale this is a scan predicate that pushes
  * nothing to parquet but parallelizes perfectly.
  */
object EsMatch {

  private def qTokens(query: String): Seq[String] =
    query.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSeq

  /** `match` with operator=or: any query token occurs in the column.
    * Served by the native codegen TokenMatch expression (single
    * tokenization pass, static query set); semantics identical to the
    * composed-builtin form (see TokenMatchSpec equivalence test).
    */
  def matchAny(text: Column, query: String): Column =
    graft.plans.TokenMatch.any(text, query)

  /** `match` with operator=and: every query token occurs. */
  def matchAll(text: Column, query: String): Column =
    graft.plans.TokenMatch.all(text, query)

  /** Composed-builtin reference forms (kept for differential tests). */
  def matchAnyHof(text: Column, query: String): Column = {
    val qs = qTokens(query)
    if (qs.isEmpty) lit(false)
    else exists(TextAnalysis.tokens(text), t => t.isin(qs: _*))
  }

  def matchAllHof(text: Column, query: String): Column = {
    val toks = TextAnalysis.tokens(text)
    qTokens(query).map(q => array_contains(toks, q))
      .foldLeft(lit(true))(_ && _)
  }

  /** `match_phrase`: query tokens appear consecutively in order. */
  def matchPhrase(text: Column, query: String): Column = {
    val phrase = qTokens(query).mkString(" ")
    if (phrase.isEmpty) lit(false)
    else instr(
      concat(lit(" "), concat_ws(" ", TextAnalysis.tokens(text)), lit(" ")),
      s" $phrase ") > 0
  }

  /** `match_phrase_prefix`: the query tokens appear consecutively in
    * order, with the LAST treated as a token prefix (ES's
    * search-as-you-type clause). Same token-joined needle as
    * [[matchPhrase]] — just without the trailing boundary space, so
    * the final needle token only has to START a column token.
    */
  def matchPhrasePrefix(text: Column, query: String): Column = {
    val qs = qTokens(query)
    if (qs.isEmpty) lit(false)
    else instr(
      concat(lit(" "), concat_ws(" ", TextAnalysis.tokens(text)), lit(" ")),
      " " + qs.mkString(" ")) > 0
  }

  /** `match` with fuzziness: some column token within `maxEdits`
    * Levenshtein distance of some query token.
    */
  def matchFuzzy(text: Column, query: String, maxEdits: Int): Column = {
    val qs = qTokens(query)
    if (qs.isEmpty) lit(false)
    else exists(TextAnalysis.tokens(text),
      t => qs.map(q => levenshtein(t, lit(q)) <= maxEdits)
        .foldLeft(lit(false))(_ || _))
  }

  /** `match` with fuzziness and operator=and: EVERY query token is
    * within `maxEdits` of some column token (the fuzzy face of
    * [[matchAll]] — operator and fuzziness compose in ES, and the
    * DSL path already folds per-term fuzzy predicates with AND, so
    * the programmatic front doors must agree).
    */
  def matchFuzzyAll(text: Column, query: String, maxEdits: Int): Column = {
    val qs = qTokens(query)
    if (qs.isEmpty) lit(false)
    else {
      val toks = TextAnalysis.tokens(text)
      qs.map(q => exists(toks, t => levenshtein(t, lit(q)) <= maxEdits))
        .reduce(_ && _)
    }
  }

  /** `multi_match`: matchAny across several columns. */
  def multiMatch(texts: Seq[Column], query: String): Column =
    texts.map(matchAny(_, query)).foldLeft(lit(false))(_ || _)
}

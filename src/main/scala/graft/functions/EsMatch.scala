package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Full-text match semantics over analyzed-text columns — the Spark
  * re-expression of eland's `es_match` (eland/query_compiler.py:419-488:
  * match / match_phrase / multi_match with optional fuzziness).
  *
  * Analyzers (both sides of every match run the SAME chain, like ES):
  *  - "standard": lowercase whitespace tokens (TextAnalysis.tokens) —
  *    the default everywhere since round 1.
  *  - "english": standard + the minimal English stemmer
  *    ([[EnglishMinimalStem]]), ES's `minimal_english` token filter —
  *    "filters" matches "filter", "queries" matches "query", closing
  *    the analyzed-`text`-field gap the reference delegates to ES.
  *
  * All variants are pure codegen-friendly expressions (the TokenMatch
  * native expression or exists/forall/levenshtein builtins); no UDFs,
  * no index — at scale this is a scan predicate that pushes nothing to
  * parquet but parallelizes perfectly.
  */
object EsMatch {

  private def qTokens(query: String, analyzer: String): Seq[String] =
    TextAnalysis.tokensOf(query)
      .map(EnglishMinimalStem.analyzeTerm(analyzer, _))

  private def docTokens(text: Column, analyzer: String): Column =
    EnglishMinimalStem.analyzeTokens(analyzer, TextAnalysis.tokens(text))

  /** `match` with operator=or: any query token occurs in the column.
    * Served by the native codegen TokenMatch expression (single
    * tokenization pass, static query set); semantics identical to the
    * composed-builtin form (see TokenMatchSpec equivalence test).
    */
  def matchAny(text: Column, query: String,
               analyzer: String = "standard"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    graft.plans.TokenMatch.any(text, query, stem = analyzer == "english")
  }

  /** `match` with operator=and: every query token occurs. */
  def matchAll(text: Column, query: String,
               analyzer: String = "standard"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    graft.plans.TokenMatch.all(text, query, stem = analyzer == "english")
  }

  /** ES `terms_set` support: how many of `terms` occur in the
    * analyzed token stream — the match count the clause compares
    * against its minimum_should_match source. Terms are matched
    * VERBATIM against the analyzed tokens (ES's terms_set is a
    * term-level query: it looks terms up in the inverted index
    * without analyzing them), so callers supply index-form terms
    * (lowercase under "standard"). Duplicates in `terms` count once,
    * like ES. One tokenization pass, bound once.
    */
  def termsSetCount(text: Column, terms: Seq[String],
                    analyzer: String = "standard"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    require(terms.nonEmpty, "terms_set needs at least one term")
    val qs = terms.distinct
    TextAnalysis.bindOnce(docTokens(text, analyzer)) { toks =>
      qs.map(q => when(array_contains(toks, q), 1).otherwise(0))
        .reduce(_ + _)
    }
  }

  /** Composed-builtin reference forms (kept for differential tests). */
  def matchAnyHof(text: Column, query: String,
                  analyzer: String = "standard"): Column = {
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(false)
    else exists(docTokens(text, analyzer), t => t.isin(qs: _*))
  }

  def matchAllHof(text: Column, query: String,
                  analyzer: String = "standard"): Column = {
    val toks = docTokens(text, analyzer)
    qTokens(query, analyzer).map(q => array_contains(toks, q))
      .foldLeft(lit(true))(_ && _)
  }

  /** `match_phrase`: query tokens appear consecutively in order (both
    * sides analyzed — a stemmed phrase matches stemmed positions).
    */
  def matchPhrase(text: Column, query: String,
                  analyzer: String = "standard"): Column = {
    val phrase = qTokens(query, analyzer).mkString(" ")
    if (phrase.isEmpty) lit(false)
    else instr(
      concat(lit(" "), concat_ws(" ", docTokens(text, analyzer)), lit(" ")),
      s" $phrase ") > 0
  }

  /** `match_phrase_prefix`: the query tokens appear consecutively in
    * order, with the LAST treated as a token prefix (ES's
    * search-as-you-type clause). Same token-joined needle as
    * [[matchPhrase]] — just without the trailing boundary space, so
    * the final needle token only has to START a column token.
    */
  def matchPhrasePrefix(text: Column, query: String,
                        analyzer: String = "standard"): Column = {
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(false)
    else instr(
      concat(lit(" "), concat_ws(" ", docTokens(text, analyzer)), lit(" ")),
      " " + qs.mkString(" ")) > 0
  }

  /** `match_bool_prefix` — ES's other search-as-you-type clause:
    * every query term except the last must occur as a full token
    * (bool/AND semantics, NOT adjacency — that is
    * [[matchPhrasePrefix]]), and the last term only has to PREFIX
    * some token. Both sides analyzed.
    */
  def matchBoolPrefix(text: Column, query: String,
                      analyzer: String = "standard"): Column = {
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(false)
    else {
      val toks = docTokens(text, analyzer)
      val full = qs.init.map(q => array_contains(toks, q))
      val pre = exists(toks, t => t.startsWith(qs.last))
      (full :+ pre).reduce(_ && _)
    }
  }

  /** A single token-prefix predicate — the text-field reading of a
    * Lucene prefix query (`quer*` from query_string): some analyzed
    * token starts with the (analyzed) prefix. The last-term leg of
    * [[matchBoolPrefix]], exposed for the query-string parsers.
    */
  def tokenPrefix(text: Column, prefix: String,
                  analyzer: String = "standard"): Column = {
    val p = EnglishMinimalStem.analyzeTerm(analyzer,
      prefix.toLowerCase(java.util.Locale.ROOT))
    if (p.isEmpty) lit(false)
    else exists(docTokens(text, analyzer), t => t.startsWith(p))
  }

  /** A token-wildcard predicate — the text-field reading of a Lucene
    * wildcard query (`qu*ry`, `te?t`): some analyzed token matches
    * the `*`/`?` pattern. The pattern is lowercased (index tokens
    * are) but NOT stemmed — stemming a pattern with holes in it is
    * undefined; this mirrors ES's analyze_wildcard=false default,
    * where the wildcard term is matched against index terms verbatim
    * modulo case.
    */
  def tokenWildcard(text: Column, pattern: String,
                    analyzer: String = "standard"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    val like = graft.api.Predicates.wildcardToLike(
      pattern.toLowerCase(java.util.Locale.ROOT))
    exists(docTokens(text, analyzer), t => t.like(like))
  }

  /** `match` with fuzziness: some column token within `maxEdits`
    * Levenshtein distance of some query token. Analysis runs FIRST,
    * then the edit distance compares analyzed forms (ES's order:
    * fuzziness applies to the analyzed term).
    */
  def matchFuzzy(text: Column, query: String, maxEdits: Int,
                 analyzer: String = "standard"): Column = {
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(false)
    else exists(docTokens(text, analyzer),
      t => qs.map(q => levenshtein(t, lit(q)) <= maxEdits)
        .foldLeft(lit(false))(_ || _))
  }

  /** `match` with fuzziness and operator=and: EVERY query token is
    * within `maxEdits` of some column token (the fuzzy face of
    * [[matchAll]] — operator and fuzziness compose in ES, and the
    * DSL path already folds per-term fuzzy predicates with AND, so
    * the programmatic front doors must agree).
    */
  def matchFuzzyAll(text: Column, query: String, maxEdits: Int,
                    analyzer: String = "standard"): Column = {
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(false)
    else {
      val toks = docTokens(text, analyzer)
      qs.map(q => exists(toks, t => levenshtein(t, lit(q)) <= maxEdits))
        .reduce(_ && _)
    }
  }

  /** `multi_match`: matchAny across several columns. */
  def multiMatch(texts: Seq[Column], query: String,
                 analyzer: String = "standard"): Column =
    texts.map(matchAny(_, query, analyzer)).foldLeft(lit(false))(_ || _)

  /** ES `highlight` at whitespace-token granularity: every token
    * whose ANALYZED form is one of the analyzed query terms wraps in
    * `preTag`/`postTag`; NULL when nothing matches (ES omits the
    * highlight entry for non-matching fields). Original token bytes
    * are preserved inside the tags (matching is case-/stem-
    * insensitive, the displayed token is not rewritten); whitespace
    * RUNS collapse to single spaces — the token-joined fragment
    * surface, not a byte-offset highlighter (ES's fragmenter is also
    * a rewrite, just a different one). Pure HOF expression,
    * engine-replayable.
    */
  def highlight(text: Column, query: String,
                analyzer: String = "standard",
                preTag: String = "<em>",
                postTag: String = "</em>"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(null).cast("string")
    else {
      def hit(t: Column): Column =
        if (analyzer == "english")
          EnglishMinimalStem.stem(lower(t)).isin(qs: _*)
        else lower(t).isin(qs: _*)
      TextAnalysis.bindOnce(
        filter(split(text, "\\s+"), t => length(t) > 0)) { toks =>
        when(exists(toks, hit(_)),
          concat_ws(" ", transform(toks, t =>
            when(hit(t), concat(lit(preTag), t, lit(postTag)))
              .otherwise(t))))
          .otherwise(lit(null).cast("string"))
      }
    }
  }

  /** ES `highlight` with fragmenting — `fragment_size` /
    * `number_of_fragments`: the document splits into fixed
    * `fragTokens`-token windows (ES fragments on characters; at the
    * token-joined fragment surface of [[highlight]] the token window
    * is the deterministic analogue), each window scores by its count
    * of matched tokens, the top `numFragments` scoring windows
    * survive (score desc, position asc — ES's best-fragment
    * selection), and the kept fragments render in DOCUMENT order (the
    * ES default; `order: "score"` is its opt-in) with [[highlight]]'s
    * per-token tags, joined by `sep`. NULL when nothing matches.
    * Pure HOF expression: one tokenization, one O(n) window-score
    * pass, sort/slice over the (n / fragTokens)-entry window list.
    */
  def highlightFragments(text: Column, query: String,
                         analyzer: String = "standard",
                         fragTokens: Int = 20, numFragments: Int = 3,
                         preTag: String = "<em>",
                         postTag: String = "</em>",
                         sep: String = " ... "): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    require(fragTokens >= 1, s"fragment size must be >= 1, got $fragTokens")
    require(numFragments >= 1,
      s"number_of_fragments must be >= 1, got $numFragments")
    val qs = qTokens(query, analyzer)
    if (qs.isEmpty) lit(null).cast("string")
    else {
      def hit(t: Column): Column =
        if (analyzer == "english")
          EnglishMinimalStem.stem(lower(t)).isin(qs: _*)
        else lower(t).isin(qs: _*)
      TextAnalysis.bindOnce(
        filter(split(text, "\\s+"), t => length(t) > 0)) { toks =>
        val n = size(toks)
        // Column `/` is double division — sequence needs integrals
        val windows = sequence(lit(0),
          floor((n - 1) / fragTokens).cast("int"))
        val scored = filter(
          transform(windows, w => struct(
            aggregate(slice(toks, w * fragTokens + 1, lit(fragTokens)),
              lit(0), (acc, t) =>
                acc + when(hit(t), 1).otherwise(0)).as("score"),
            w.as("w"))),
          s => s.getField("score") > 0)
        val top = slice(array_sort(scored, (l, r) =>
          when(l.getField("score") > r.getField("score"), -1)
            .when(l.getField("score") < r.getField("score"), 1)
            .when(l.getField("w") < r.getField("w"), -1)
            .when(l.getField("w") > r.getField("w"), 1)
            .otherwise(0)),
          1, numFragments)
        // render in DOCUMENT order: sort the kept window ids
        val kept = array_sort(transform(top, _.getField("w")))
        when(size(kept) > 0,
          concat_ws(sep, transform(kept, w =>
            concat_ws(" ", transform(
              slice(toks, w * fragTokens + 1, lit(fragTokens)), t =>
                when(hit(t), concat(lit(preTag), t, lit(postTag)))
                  .otherwise(t))))))
          .otherwise(lit(null).cast("string"))
      }
    }
  }

  /** ES `highlight` for a `match_phrase` query: every exact-adjacency
    * occurrence of the analyzed phrase wraps AS A UNIT —
    * `<em>quick brown</em>`, one tag pair per occurrence — instead of
    * [[highlight]]'s per-token tags. Overlapping / adjacent
    * occurrences merge into one tagged span (Lucene's highlighter
    * merges overlapping passages the same way): a token is covered
    * when ANY occurrence covers it, a tag opens where coverage
    * starts and closes where it ends. Same fragment surface as
    * [[highlight]] (original token bytes inside the tags, whitespace
    * runs collapse, NULL when the phrase never occurs), same analyzer
    * options, order and repeats of the phrase terms preserved. Pure
    * HOF expression over 0-based token positions — the adjacency
    * semantics [[graft.operators.InvertedIndex]]'s positional
    * postings (idx7/idx8) serve, replayed scan-side.
    */
  def highlightPhrase(text: Column, phrase: String,
                      analyzer: String = "standard",
                      preTag: String = "<em>",
                      postTag: String = "</em>"): Column = {
    EnglishMinimalStem.requireKnown(analyzer)
    val qs = qTokens(phrase, analyzer)
    if (qs.isEmpty) lit(null).cast("string")
    else {
      val len = qs.size
      def norm(t: Column): Column =
        if (analyzer == "english") EnglishMinimalStem.stem(lower(t))
        else lower(t)
      TextAnalysis.bindOnce(
        filter(split(text, "\\s+"), t => length(t) > 0)) { toks =>
        val n = size(toks)
        // n < len guard: Spark's sequence(0, negative) DESCENDS
        val starts0 = when(n >= len,
          filter(sequence(lit(0), n - len), i =>
            qs.zipWithIndex.map { case (q, j) =>
              norm(element_at(toks, (i + lit(j + 1)).cast("int"))) ===
                lit(q)
            }.reduce(_ && _)))
          .otherwise(array().cast("array<int>"))
        TextAnalysis.bindOnce(starts0) { starts =>
          // covered-positions bitmap computed ONCE per row (O(n·occ)),
          // then every boundary test is an O(1) 0-based `get` lookup
          // (out-of-range p = -1 / p = n read as uncovered) — instead
          // of exists(starts) per token ×3, which is O(n·occ·3) and
          // quadratic-ish on pathological many-occurrence rows
          TextAnalysis.bindOnce(
            transform(sequence(lit(0), size(toks) - 1), p =>
              exists(starts, s => p >= s && p < s + lit(len)))) { cov =>
            def covered(p: Column): Column =
              coalesce(get(cov, p.cast("int")), lit(false))
            when(size(starts) > 0,
              concat_ws(" ", transform(toks, (t, p) => concat(
                when(covered(p) && !covered(p - 1), lit(preTag))
                  .otherwise(lit("")),
                t,
                when(covered(p) && !covered(p + 1), lit(postTag))
                  .otherwise(lit(""))))))
              .otherwise(lit(null).cast("string"))
          }
        }
      }
    }
  }
}

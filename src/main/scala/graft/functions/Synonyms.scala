package graft.functions

/** ES synonyms, Solr rule format — the `synonym_graph` token
  * filter's SEARCH-TIME half (ES 8.10's `PUT _synonyms/<set>`
  * carries these same rule strings; the reference reaches synonyms
  * only through the ES search analyzer server-side —
  * `eland/query.py` ships the query body verbatim — so this engine
  * applies the set at query analysis, the search-time-expansion
  * configuration ES itself recommends over index-time expansion):
  *
  *  - `"quick, fast, rapid"` — an EQUIVALENT set: any member
  *    analyzes to the whole set (ES `expand: true`, the default),
  *  - `"i-pod, i pod => ipod"` — an EXPLICIT mapping: each LHS
  *    token rewrites to the RHS set; the originals are NOT kept
  *    (Solr/ES replacement semantics).
  *
  * Rule entries fold through the SAME analyzer as the corpus
  * ([[TextAnalysis.tokensOf]]) — a synonym that tokenizes
  * differently from the index would be a silent df mismatch,
  * Lucene's own requirement on filter ordering. MULTI-token entries
  * refuse: `synonym_graph` models them as graph positions (phrase
  * expansion) whose positional semantics this engine refuses rather
  * than silently approximates; the single-token rewrite is the
  * replayable subset.
  *
  * Scoring model (applied in [[EsScoredQuery]]): an expanded query
  * position becomes Lucene's `SynonymQuery` — ONE pseudo-term whose
  * per-doc tf is the SUM of the member terms' frequencies and whose
  * df is the MAX of the member document frequencies (Lucene
  * `SynonymQuery`/`BlendedTermQuery` docFreq blending), with idf and
  * Okapi saturation applied ONCE per group.
  */
object Synonyms {

  /** Parse rule strings into token → expansion set (distinct,
    * sorted — a deterministic group identity). Tokens with no rule
    * are absent (callers expand with `getOrElse(t, Seq(t))`). A
    * token may appear in only ONE rule — ES rejects ambiguous sets
    * the same way.
    */
  def parse(rules: Seq[String]): Map[String, Seq[String]] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    def tok(s: String, rule: String): String = {
      val ts = TextAnalysis.tokensOf(s.trim)
      require(ts.size == 1,
        s"synonym entry '${s.trim}' in rule '$rule' analyzes to " +
          s"${ts.size} tokens; only single-token synonyms are " +
          "supported (multi-token rules are positional graph " +
          "expansions — refused, not approximated)")
      ts.head
    }
    def bind(from: String, to: Seq[String], rule: String): Unit = {
      require(!m.contains(from),
        s"token '$from' appears on the left of two synonym rules " +
          s"(second: '$rule'); ES rejects ambiguous sets")
      m(from) = to
    }
    rules.foreach { rule =>
      require(rule.trim.nonEmpty, "empty synonym rule")
      rule.split("=>", -1) match {
        case Array(lhs, rhs) =>
          val from = lhs.split(",").map(tok(_, rule)).toSeq.distinct
          val to = rhs.split(",").map(tok(_, rule)).toSeq.distinct.sorted
          from.foreach(bind(_, to, rule))
        case Array(_) =>
          val set = rule.split(",").map(tok(_, rule)).toSeq.distinct.sorted
          require(set.size >= 2,
            s"equivalent-set rule '$rule' needs at least two entries")
          set.foreach(bind(_, set, rule))
        case _ => throw new IllegalArgumentException(
          s"rule '$rule' has more than one '=>'")
      }
    }
    m.toMap
  }
}

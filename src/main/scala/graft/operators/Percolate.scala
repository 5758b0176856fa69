package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** ES `percolate` re-expressed for batch: match every DOCUMENT
  * against a TABLE of stored queries — the reverse of search, ES's
  * percolator (the reference reaches it only as raw DSL). The
  * supported query shape is the term-set subset (per query: an array
  * of terms plus a minimum_should_match count — the `terms_set`
  * semantics of [[graft.functions.EsMatch.termsSetCount]], which is
  * also what routing/tagging rule tables in a data pipeline look
  * like); richer per-query DSL has no bounded join shape and would
  * devolve to evaluating every query against every document.
  *
  * Plan shape: the query table explodes to (query, term) rows and
  * BROADCASTS (rule tables are small by nature — loudly capped);
  * documents explode their DISTINCT analyzed tokens once; the
  * broadcast hash join emits only (doc, query, term) HITS, and the
  * per-(doc, query) count compares against the query's own
  * minimum_should_match. The corpus is never shuffled to find
  * matches — only matched pairs reach the aggregation, exactly the
  * decontamination-join discipline (dc1).
  *
  * Returns (idCol, queryIdCol, matched_terms) — one row per matching
  * (document, query) pair.
  */
object Percolate {

  def percolate(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, queryIdCol: String,
                termsCol: String, msmCol: String,
                maxQueries: Long = 1000000L): DataFrame = {
    val nq = queries.count()
    require(nq > 0, "percolate: empty query table")
    require(nq <= maxQueries,
      s"percolate: $nq stored queries exceeds the broadcast cap " +
        s"$maxQueries — raise it deliberately or shard the query table")
    // fail loudly on malformed stored queries at the TABLE entry point
    // too (not just percolateRules): msm <= 0 would silently behave as
    // msm = 1 because zero-hit (doc, query) pairs never reach the >=
    // filter, and empty term arrays can never match at all
    val badRules = queries
      .filter(col(msmCol).isNull || col(msmCol) < 1 ||
        col(termsCol).isNull || size(array_distinct(col(termsCol))) < 1 ||
        col(msmCol) > size(array_distinct(col(termsCol))))
      .select(col(queryIdCol)).limit(5)
      .collect().map(_.get(0)).toSeq
    require(badRules.isEmpty,
      s"percolate: stored queries $badRules have msm < 1, msm > " +
        "distinct-term count, or empty terms — unsatisfiable or " +
        "silently-lenient rules are refused")
    // duplicates inside one query's terms count once (terms_set)
    val qterms = queries.select(col(queryIdCol), col(msmCol),
        explode(array_distinct(col(termsCol))).as("term"))
    val dtokens = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol))))
        .as("term"))
    dtokens.join(broadcast(qterms), Seq("term"))
      .groupBy(col(idCol), col(queryIdCol), col(msmCol))
      .agg(count(lit(1)).cast("long").as("matched_terms"))
      .filter(col("matched_terms") >= col(msmCol))
      .select(col(idCol), col(queryIdCol), col("matched_terms"))
  }

  /** Percolate with PHRASE rules — stored `match_phrase` queries (the
    * other percolator shape a routing/tagging table holds). Two-stage,
    * corpus-never-shuffles discipline:
    *
    *  1. candidate join: the phrase's analyzed terms broadcast like
    *     [[percolate]]'s, and a (doc, query) pair survives only when
    *     the doc contains EVERY term of the phrase (msm = distinct
    *     term count — adjacency implies containment, so this is a
    *     lossless prefilter);
    *  2. adjacency check: the surviving pairs join back to the
    *     documents on the id (candidate pairs are few by
    *     construction; AQE picks the join side) and verify the
    *     analyzed phrase occurs CONSECUTIVELY via the same
    *     token-joined needle as [[graft.functions.EsMatch.matchPhrase]]
    *     — with the needle coming from the rule ROW, the dynamic form
    *     of the static expression.
    *
    * Returns (idCol, queryIdCol) — one row per matching pair.
    */
  def percolatePhrases(docs: DataFrame, idCol: String, textCol: String,
                       queries: DataFrame, queryIdCol: String,
                       phraseCol: String,
                       maxQueries: Long = 1000000L): DataFrame = {
    val nq = queries.count()
    require(nq > 0, "percolatePhrases: empty query table")
    require(nq <= maxQueries,
      s"percolatePhrases: $nq stored queries exceeds the broadcast " +
        s"cap $maxQueries — raise it deliberately or shard the table")
    val analyzed = queries.select(col(queryIdCol),
      TextAnalysis.tokens(col(phraseCol)).as("_pterms"))
    val badRules = analyzed
      .filter(col("_pterms").isNull || size(col("_pterms")) < 1)
      .select(col(queryIdCol)).limit(5)
      .collect().map(_.get(0)).toSeq
    require(badRules.isEmpty,
      s"percolatePhrases: stored queries $badRules analyze to no " +
        "terms — an empty phrase can never match and is refused")
    val qterms = analyzed.select(col(queryIdCol),
      size(array_distinct(col("_pterms"))).as("_msm"),
      concat_ws(" ", col("_pterms")).as("_needle"),
      explode(array_distinct(col("_pterms"))).as("term"))
    val dtokens = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol))))
        .as("term"))
    val pairs = dtokens.join(broadcast(qterms), Seq("term"))
      .groupBy(col(idCol), col(queryIdCol), col("_msm"), col("_needle"))
      .agg(count(lit(1)).cast("long").as("_hits"))
      .filter(col("_hits") >= col("_msm"))
      .select(col(idCol), col(queryIdCol), col("_needle"))
    pairs.join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .filter(concat(lit(" "),
        concat_ws(" ", TextAnalysis.tokens(col(textCol))), lit(" "))
        .contains(concat(lit(" "), col("_needle"), lit(" "))))
      .select(col(idCol), col(queryIdCol))
  }

  /** Convenience: [[percolatePhrases]] against driver-side
    * (name, phrase) rules.
    */
  def percolatePhraseRules(docs: DataFrame, idCol: String,
                           textCol: String,
                           rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "percolatePhrases: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    val spark = docs.sparkSession
    import spark.implicits._
    percolatePhrases(docs, idCol, textCol,
      rules.toDF("query_id", "phrase"), "query_id", "phrase")
  }

  /** Convenience: percolate against driver-side rules
    * (name, terms, minimum_should_match).
    */
  def percolateRules(docs: DataFrame, idCol: String, textCol: String,
                     rules: Seq[(String, Seq[String], Int)]): DataFrame = {
    require(rules.nonEmpty, "percolate: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    rules.foreach { case (n, ts, m) =>
      require(ts.nonEmpty, s"rule '$n' has no terms")
      require(m >= 1 && m <= ts.distinct.size,
        s"rule '$n': minimum_should_match $m outside [1, " +
          s"${ts.distinct.size}]")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    percolate(docs, idCol, textCol,
      rules.toDF("query_id", "terms", "msm"),
      "query_id", "terms", "msm")
  }

  /** Percolate with QUERY-STRING rules — the Kibana-search-bar-as-
    * alert face: each stored rule is a simple_query_string parsed at
    * REGISTRATION through [[graft.functions.QueryStringParser.
    * flatTermClauses]] (the index-serving flattening: must / should /
    * must_not term sets; shapes that cannot flatten — phrases,
    * prefixes, nested mixed groups — refuse there, naming the scan
    * faces). A document matches a rule when every must term is
    * present, at least one should (when the rule has any), and no
    * must_not. Purely-negative and contradictory (term both required
    * and forbidden) rules refuse at registration — they would match
    * almost everything / nothing silently.
    *
    * Output (idCol, rule_id, matched_terms) — matched_terms counts
    * the DISTINCT positive rule terms present.
    *
    * Scale shape: the pc1 discipline verbatim — rules are
    * driver-side and broadcast as a (rule, term, role) table, the
    * corpus tokenizes once and NEVER shuffles (the only aggregation
    * keys on (doc, rule) after the broadcast join), and the must_not
    * check rides the same aggregation as the positive counts instead
    * of a second pass.
    */
  def percolateQueryStrings(docs: DataFrame, idCol: String,
                            textCol: String,
                            rules: Seq[(String, String)],
                            defaultOperator: String = "or")
      : DataFrame = {
    require(rules.nonEmpty, "percolateQueryStrings: no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_._1)}")
    val parsed = rules.map { case (name, q) =>
      val (m, s, mn) = graft.functions.QueryStringParser
        .flatTermClauses(q, defaultOperator)
      val (md, sd, nd) = (m.distinct, s.distinct, mn.distinct)
      require(md.nonEmpty || sd.nonEmpty,
        s"rule '$name' ('$q') is purely negative — it would match " +
          "nearly every document; refused")
      val contra = (md ++ sd).intersect(nd)
      require(contra.isEmpty,
        s"rule '$name' ('$q') both requires and forbids " +
          s"${contra.mkString(", ")}")
      (name, md, sd, nd)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = parsed.flatMap { case (n, m, s, mn) =>
      m.map((n, _, "m")) ++ s.map((n, _, "s")) ++ mn.map((n, _, "n"))
    }.toDF("_rule", "term", "_role")
    val counts = parsed
      .map { case (n, m, s, _) => (n, m.size.toLong, s.size.toLong) }
      .toDF("_rule", "_n_must", "_n_should")
    val dtokens = docs.select(col(idCol),
      explode(array_distinct(
        graft.functions.TextAnalysis.tokens(col(textCol)))).as("term"))
    dtokens.join(broadcast(qterms), Seq("term"))
      .groupBy(col(idCol), col("_rule"))
      .agg(
        count(when(col("_role") === "m", 1)).as("_hit_must"),
        count(when(col("_role") === "s", 1)).as("_hit_should"),
        count(when(col("_role") === "n", 1)).as("_hit_not"))
      .join(broadcast(counts), Seq("_rule"))
      // ES/Lucene bool gating (the booleanSearchTopK msm rule): when a
      // rule has MUST terms, minimum_should_match defaults to 0 — the
      // shoulds become score-only and a doc matching all musts alerts
      // even with zero should hits. Only a must-less rule requires a
      // should hit. (The simple grammar's '+' is infix AND, so today's
      // parses never mix musts with shoulds — this keeps the gate
      // honest if that ever changes.)
      .filter(col("_hit_must") === col("_n_must") &&
        (col("_n_must") > 0 || col("_n_should") === 0 ||
          col("_hit_should") >= 1) &&
        col("_hit_not") === 0)
      .select(col(idCol), col("_rule").as("rule_id"),
        (col("_hit_must") + col("_hit_should")).cast("long")
          .as("matched_terms"))
  }
}

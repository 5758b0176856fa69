package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ES query-DSL JSON with QUERY-context (scoring) semantics — the
  * ranked face of [[EsQueryDsl]]. eland passes the raw query dict to
  * the backing engine, which both FILTERS and RANKS
  * (eland/filter.py:182-185 passthrough; scores stay server-side);
  * [[graft.api.GraftFrame.esQuery]] re-expresses the filter half, and
  * this compiles the same JSON into a `_score` column, routing `match`
  * clauses into the corpus-stats BM25 machinery of
  * [[graft.operators.Ranking]] (same Okapi formula, staged doubles,
  * and 6-dp final rounding — differential-pinned in the spec).
  *
  * Scoring semantics (the engine-independent subset):
  *
  *  - `match` — Okapi BM25 summed over the query's matched terms
  *    (`operator: "and"` gates on all terms matching; the SCORE is the
  *    matched-term sum either way, exactly ES). `boost` multiplies.
  *  - `multi_match` — best_fields = `dis_max` over the per-field
  *    `match` scores with `tie_breaker` (default 0, ES's default).
  *  - `bool` — `must` and `should` scores SUM; `filter` and `must_not`
  *    gate without scoring (ES's filter context); matched `should`
  *    branches add score even when not required to match;
  *    `minimum_should_match` follows the filter face's integer rules.
  *  - `dis_max` — best branch score + `tie_breaker` × (others' sum).
  *  - `constant_score` — `boost` (default 1.0) when the filter hits.
  *  - Every other translatable leaf (term/terms/range/wildcard/prefix/
  *    regexp/exists/ids/fuzzy/match_phrase/match_phrase_prefix) gates
  *    like the filter face and contributes a CONSTANT 1.0 when it
  *    matches. ES would give several of these index-statistics scores
  *    (a `term` query earns idf); those numbers are engine-dependent
  *    by definition, so the portable semantics — `constant_score` —
  *    is deliberate, documented, and stable across backends.
  *  - `fuzziness` on a scored `match` raises: ES scores fuzzy
  *    expansions per generated term with engine-internal statistics —
  *    there is no engine-independent number to agree on. (Filter
  *    context still accepts it via [[EsQueryDsl]].)
  *
  * Scale shape: ONE tokenize+explode pass per distinct text FIELD
  * referenced by any scored clause (not per clause), cut by an
  * `arrays_overlap` prefilter to docs containing at least one needed
  * term; per-(doc, clause) moments come back as a counted shuffle over
  * matching docs only and left-join onto the frame; corpus stats (N,
  * avg len) enter as a 1-row broadcast crossJoin INSIDE the lazy plan
  * (building a scored frame runs no job — spec-pinned; the index path
  * [[graft.operators.InvertedIndex.searchTopK]] uses driver literals
  * instead because its stats are one-row parquet tables, not a corpus
  * scan). Docs matching no scored clause never shuffle.
  */
object EsScoredQuery {

  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmt: Formats = DefaultFormats

  /** Per-match-clause registration: which field, which terms, and the
    * all-terms gate. Clause ids index the aggregated `_q<i>_score` /
    * `_q<i>_hits` columns.
    */
  private final case class MatchClause(id: Int, field: String,
                                       terms: Seq[String])

  private sealed trait Node
  private final case class MatchNode(clause: MatchClause, requireAll: Boolean,
                                     boost: Double) extends Node
  private final case class GatedConst(pred: Column, boost: Double) extends Node
  private final case class BoolNode(must: Seq[Node], should: Seq[Node],
                                    filters: Seq[Column], mustNot: Seq[Column],
                                    msm: Int) extends Node
  private final case class DisMaxNode(branches: Seq[Node],
                                      tie: Double) extends Node

  private final class Ctx(val idCol: String,
                          val requireText: String => Unit) {
    val clauses = scala.collection.mutable.ArrayBuffer.empty[MatchClause]
    def register(field: String, terms: Seq[String]): MatchClause = {
      val c = MatchClause(clauses.size, field, terms)
      clauses += c
      c
    }
  }

  private def lonely(obj: JValue, what: String): (String, JValue) =
    obj match {
      case JObject(List((k, v))) => (k, v)
      case other => throw new IllegalArgumentException(
        s"$what expects exactly one entry, got $other")
    }

  private def boostOf(v: JValue): Double = (v \ "boost") match {
    case JNothing    => 1.0
    case JInt(n)     => n.toDouble
    case JLong(n)    => n.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"boost: $other")
  }

  private def tieOf(v: JValue): Double = (v \ "tie_breaker") match {
    case JNothing    => 0.0
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JInt(n)     => n.toDouble
    case other => throw new IllegalArgumentException(s"tie_breaker: $other")
  }

  /** Query text → terms, the same lowercase-whitespace analysis as
    * [[TextAnalysis.tokens]] applies corpus-side — BM25's tf/df lookups
    * only make sense when both sides tokenize identically.
    */
  private def analyze(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq

  private def parse(q: JValue, ctx: Ctx): Node = {
    val (kind, body) = lonely(q, "query")
    kind match {
      case "match" =>
        val (field, v) = lonely(body, "match")
        ctx.requireText(field)
        val (text, op) = v match {
          case JString(s) => (s, "or")
          case o => ((o \ "query").extract[String],
            (o \ "operator").extractOrElse[String]("or"))
        }
        if ((v \ "fuzziness") != JNothing)
          throw new IllegalArgumentException(
            "fuzziness has no engine-independent SCORED translation " +
              "(ES scores each fuzzy expansion with index-internal " +
              "statistics); use the filter face (esQuery) instead")
        MatchNode(ctx.register(field, analyze(text)), op == "and",
          boostOf(v))
      case "multi_match" =>
        val text = (body \ "query").extract[String]
        val fields = (body \ "fields") match {
          case JArray(fs) => fs.map(_.extract[String])
          case other => throw new IllegalArgumentException(
            s"multi_match needs a fields list, got $other")
        }
        require(fields.nonEmpty, "multi_match needs at least one field")
        fields.foreach(ctx.requireText)
        if ((body \ "fuzziness") != JNothing)
          throw new IllegalArgumentException(
            "fuzziness has no engine-independent SCORED translation")
        val op = (body \ "operator").extractOrElse[String]("or")
        val boost = boostOf(body)
        // ES best_fields IS dis_max over the per-field match scores
        DisMaxNode(fields.map(f =>
          MatchNode(ctx.register(f, analyze(text)), op == "and", boost)),
          tieOf(body))
      case "constant_score" =>
        (body \ "filter") match {
          case JNothing => throw new IllegalArgumentException(
            "constant_score needs a filter clause")
          case f => GatedConst(
            EsQueryDsl.filterColumn(f, ctx.idCol, ctx.requireText),
            boostOf(body))
        }
      case "dis_max" =>
        (body \ "queries") match {
          case JArray(qs) if qs.nonEmpty =>
            DisMaxNode(qs.map(parse(_, ctx)), tieOf(body))
          case other => throw new IllegalArgumentException(
            s"dis_max needs a non-empty queries list, got $other")
        }
      case "bool" =>
        def sub(key: String): Seq[Node] = (body \ key) match {
          case JArray(items) => items.map(parse(_, ctx))
          case JNothing      => Nil
          case one           => Seq(parse(one, ctx))
        }
        def subFilter(key: String): Seq[Column] = (body \ key) match {
          case JArray(items) => items.map(
            EsQueryDsl.filterColumn(_, ctx.idCol, ctx.requireText))
          case JNothing      => Nil
          case one           => Seq(
            EsQueryDsl.filterColumn(one, ctx.idCol, ctx.requireText))
        }
        val must = sub("must")
        val should = sub("should")
        val msm = (body \ "minimum_should_match") match {
          case JNothing => if (must.isEmpty &&
            (body \ "filter") == JNothing) 1 else 0
          case JInt(n)  => n.toInt
          case JLong(n) => n.toInt
          case JString(s) if s.matches("-?\\d+") => s.toInt
          case other => throw new IllegalArgumentException(
            s"minimum_should_match '$other' has no engine-independent " +
              "translation")
        }
        BoolNode(must, should, subFilter("filter"), subFilter("must_not"),
          msm)
      case "match_all" => GatedConst(lit(true), boostOf(body))
      // every remaining translatable leaf: the filter face's predicate,
      // constant_score semantics (see the scaladoc contract)
      case _ => GatedConst(
        EsQueryDsl.filterColumn(q, ctx.idCol, ctx.requireText), 1.0)
    }
  }

  /** Node → (matched, score): `score` is already zero when unmatched,
    * so parents can sum/greatest children without re-gating.
    */
  private def compile(n: Node): (Column, Column) = n match {
    case MatchNode(c, requireAll, boost) =>
      // a query that analyzes to zero terms matches nothing (ES's
      // empty-match), not everything — hits === 0 would invert that
      if (c.terms.isEmpty) (lit(false), lit(0.0))
      else {
        val hits = coalesce(col(s"_q${c.id}_hits"), lit(0L))
        val matched =
          if (requireAll) hits === c.terms.size.toLong else hits > 0L
        (matched,
          when(matched, coalesce(col(s"_q${c.id}_score"), lit(0.0)) * boost)
            .otherwise(0.0))
      }
    case GatedConst(pred, boost) =>
      val matched = coalesce(pred, lit(false))
      (matched, when(matched, boost).otherwise(0.0))
    case BoolNode(must, should, filters, mustNot, msm) =>
      val mc = must.map(compile)
      val sc = should.map(compile)
      val shouldHits =
        if (sc.isEmpty) lit(0)
        else sc.map { case (m, _) => when(m, 1).otherwise(0) }
          .reduce(_ + _)
      val gates =
        mc.map(_._1) ++
          filters.map(f => coalesce(f, lit(false))) ++
          mustNot.map(p => !coalesce(p, lit(false))) ++
          (if (sc.nonEmpty && msm > 0) Seq(shouldHits >= msm) else Nil)
      // gates empty ⇒ no must/filter/must_not and should is either
      // absent or scoring-only (msm ≤ 0): the bool matches every doc,
      // the filter face's exact behavior (empty parts ⇒ lit(true))
      val matched =
        if (gates.isEmpty) lit(true)
        else gates.reduce(_ && _)
      val score = (mc ++ sc).map(_._2)
        .foldLeft(lit(0.0))(_ + _)
      (matched, when(matched, score).otherwise(0.0))
    case DisMaxNode(branches, tie) =>
      val bc = branches.map(compile)
      val matched = bc.map(_._1).reduce(_ || _)
      val scores = bc.map(_._2)
      val best =
        if (scores.size == 1) scores.head else greatest(scores: _*)
      val total = scores.reduce(_ + _)
      (matched,
        when(matched, best + lit(tie) * (total - best)).otherwise(0.0))
  }

  /** Compile `json` against `docs` and return the MATCHING rows with a
    * `_score` column (6-dp, ES's sort key) appended to the original
    * schema. `idCol` must uniquely key `docs` (it carries the per-doc
    * scores back from the aggregation — enforced where cheap: the
    * joined moments would otherwise fan out).
    */
  def scoredFrame(docs: DataFrame, idCol: String, json: String,
                  requireText: String => Unit = _ => (),
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(!docs.columns.contains("_score"),
      "frame already has a _score column")
    val ctx = new Ctx(idCol, requireText)
    val ast = parse(JsonMethods.parse(json), ctx)
    val byField = ctx.clauses.toSeq.groupBy(_.field)
    val withMoments = byField.foldLeft(docs) { case (acc, (field, cs)) =>
      acc.join(fieldMoments(docs, idCol, field, cs, k1, b),
        Seq(idCol), "left")
    }
    val (matched, score) = compile(ast)
    withMoments.filter(matched)
      .withColumn("_score", round(score, 6))
      .drop(ctx.clauses.toSeq.flatMap(c =>
        Seq(s"_q${c.id}_score", s"_q${c.id}_hits")): _*)
  }

  /** One tokenize pass for every clause on `field`: per-doc BM25
    * moments ((doc, clause) score sum + matched-term count), computed
    * over matching docs only. The same staged-doubles spelling as
    * [[graft.operators.Ranking.bm25TopK]] so the two faces cannot
    * drift.
    */
  private def fieldMoments(docs: DataFrame, idCol: String, field: String,
                           cs: Seq[MatchClause],
                           k1: Double, b: Double): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = cs.flatMap(_.terms).distinct
    val staged = docs
      .select(col(idCol), TextAnalysis.tokens(col(field)).as("_toks"))
      .select(col(idCol), col("_toks"),
        size(col("_toks")).cast("double").as("_len"))
    // corpus stats (N, avg len) as a 1-row broadcast crossJoin INSIDE
    // the lazy plan — never an eager driver-side job: building a
    // scored frame runs nothing (spec-pinned), and a scored query pays
    // its corpus-stats pass when (and only when) it executes. The
    // LanguageModel learned this the hard way: its eager count re-ran
    // the corpus scan and measured 2× at sf0.1. avg is null on an
    // empty corpus — coalesce to 1.0 (the result is empty anyway).
    val stats = staged.agg(count(lit(1)).cast("double").as("_n"),
      coalesce(avg(col("_len")), lit(1.0)).as("_avg"))
    val tf = staged
      .filter(arrays_overlap(col("_toks"), lit(allTerms.toArray)))
      .select(col(idCol), col("_len"), explode(col("_toks")).as("_t"))
      .filter(col("_t").isin(allTerms: _*))
      .groupBy(col(idCol), col("_len"), col("_t"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val dfreq = tf.groupBy("_t")
      .agg(count_distinct(col(idCol)).cast("double").as("_df"))
    val pairs = cs.flatMap(c => c.terms.map(t => (c.id, t)))
      .toDF("_cid", "_t")
    val perTerm = tf.join(broadcast(dfreq), Seq("_t"))
      .join(broadcast(pairs), Seq("_t"))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_s",
        col("_idf") * col("_tf") * (k1 + 1.0) /
          (col("_tf") +
            lit(k1) * (lit(1.0) - b + lit(b) * col("_len") / col("_avg"))))
    // tf rows are unique per (doc, term); the pairs join adds _cid, so
    // rows are unique per (doc, clause, term): hits = row count
    val aggs: Seq[Column] = cs.flatMap(c => Seq(
      sum(when(col("_cid") === c.id, col("_s"))).as(s"_q${c.id}_score"),
      count(when(col("_cid") === c.id, 1)).as(s"_q${c.id}_hits")))
    perTerm.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }
}

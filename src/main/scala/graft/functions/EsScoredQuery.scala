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
  *  - `match_phrase` (r9) — Lucene's PhraseQuery under BM25, which IS
  *    engine-independent arithmetic: tf = exact-adjacency occurrence
  *    count, idf = Σ of the constituent terms' idfs (Lucene's
  *    multi-term idfExplain), Okapi saturation; `slop` refuses
  *    (sloppy-frequency weighting is Lucene-internal tuning).
  *  - Every other translatable leaf (term/terms/range/wildcard/prefix/
  *    regexp/exists/ids/fuzzy/match_phrase_prefix) gates
  *    like the filter face and contributes a CONSTANT 1.0 when it
  *    matches. ES would give several of these index-statistics scores;
  *    those numbers are engine-dependent by definition, so the
  *    portable semantics — `constant_score` — is the default,
  *    deliberate, documented, and stable across backends.
  *  - `termIdf = true` opts the `term` leaf into ES's actual number
  *    for the common keyword-field case: norms are disabled on
  *    keyword fields and tf is 1, so Lucene's BM25 collapses to
  *    boost × idf = boost × ln(1 + (N − df + 0.5)/(df + 0.5)) with
  *    df = docs holding exactly that value. `terms` and `range` stay
  *    constant-score under the flag — that matches ES, which scores
  *    both as constant `boost`.
  *  - top-level `knn` — the ES 8.x vector retrieval: exact cosine
  *    against the literal `query_vector` over the (optionally
  *    `filter`-restricted) frame, top `k` kept (two-phase ranking on
  *    6-dp-rounded cosine, id ties), `_score` = boost × (1+cos)/2.
  *    `num_candidates` (ES's HNSW recall dial) is accepted and
  *    ignored — this computes the exact answer it approximates.
  *    Nested under bool/dis_max raises: a whole-frame top-k has no
  *    engine-independent per-row composition.
  *  - `sparse_vector` / `text_expansion` (8.15+, the ELSER path) —
  *    the sparse dot product Σ query_weight × doc_weight over shared
  *    tokens of an array<struct<token, weight>> column; matches on
  *    ≥ 1 shared token; negative weights refuse on both sides.
  *  - `fuzziness` on a scored `match` raises: ES scores fuzzy
  *    expansions per generated term with engine-internal statistics —
  *    there is no engine-independent number to agree on. (Filter
  *    context still accepts it via [[EsQueryDsl]].)
  *
  * Scale shape: ONE tokenize+explode pass per distinct text FIELD
  * referenced by any scored clause (not per clause — and since r18
  * the corpus-stats agg derives from the SAME pass instead of
  * re-tokenizing): matching-token occurrences shuffle as counted
  * (doc, term) rows, non-matching docs ship one ~20 B (id, len) row
  * each (the stats input), and the per-(doc, clause) moments
  * left-join onto the frame; corpus stats (N, avg len) enter as a
  * 1-row broadcast crossJoin INSIDE the lazy plan
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
                                       groups: Seq[Seq[String]]) {
    /** Flat distinct member terms — the tf/df lookup universe. */
    def terms: Seq[String] = groups.flatten.distinct
  }

  /** A `multi_match` type `cross_fields` clause: ONE set of query
    * positions (groups — synonyms compose) matched across SEVERAL
    * fields with BLENDED statistics. `_x<i>_score` / `_x<i>_hits`
    * columns are produced in scoredFrame (the stats need k1/b).
    */
  private final case class CrossClause(id: Int,
                                       fieldBoosts: Seq[(String, Double)],
                                       groups: Seq[Seq[String]])

  private sealed trait Node
  private final case class MatchNode(clause: MatchClause, requireAll: Boolean,
                                     boost: Double,
                                     msm: Option[String] = None)
      extends Node
  private final case class CrossFieldsNode(clause: CrossClause,
                                           requireAll: Boolean,
                                           boost: Double,
                                           msm: Option[String])
      extends Node
  private final case class GatedConst(pred: Column, boost: Double) extends Node
  private final case class PhraseNode(id: Int, boost: Double) extends Node
  private final case class TermIdfNode(id: Int, pred: Column,
                                       boost: Double) extends Node
  private final case class BoolNode(must: Seq[Node], should: Seq[Node],
                                    filters: Seq[Column], mustNot: Seq[Column],
                                    msm: Int) extends Node
  private final case class DisMaxNode(branches: Seq[Node],
                                      tie: Double) extends Node
  private final case class FunctionScoreNode(query: Node,
      functions: Seq[(Option[Column], Column)], scoreMode: String,
      boostMode: String, boost: Double) extends Node
  private final case class BoostingNode(positive: Node, negative: Column,
                                        negBoost: Double) extends Node
  /** A leaf whose match predicate and score are arbitrary per-row
    * expressions (rank_feature / distance_feature).
    */
  private final case class ScoredLeaf(pred: Column,
                                      score: Column) extends Node
  /** `pinned`: a per-row pinned score (null = not pinned) over an
    * organic query.
    */
  private final case class PinnedNode(pinnedScore: Column,
                                      organic: Node) extends Node

  private final class Ctx(val idCol: String,
                          val requireText: String => Unit,
                          val termIdf: Boolean = false,
                          val synonyms: Map[String, Seq[String]] =
                            Map.empty) {
    val clauses = scala.collection.mutable.ArrayBuffer.empty[MatchClause]
    def register(field: String, groups: Seq[Seq[String]]): MatchClause = {
      val c = MatchClause(clauses.size, field, groups)
      clauses += c
      c
    }
    /** Query text → per-position synonym groups: each analyzed token
      * expands to its rule set (Lucene's search-time `synonym_graph`
      * rewrite; a token with no rule stays a singleton). Groups
      * dedupe — the same discipline as the pre-synonym distinct term
      * bag, so two query tokens landing in one set score it once.
      */
    def expand(terms: Seq[String]): Seq[Seq[String]] =
      terms.map(t => synonyms.getOrElse(t, Seq(t))).distinct
    val crossClauses =
      scala.collection.mutable.ArrayBuffer.empty[CrossClause]
    def registerCross(fieldBoosts: Seq[(String, Double)],
                      groups: Seq[Seq[String]]): CrossClause = {
      val c = CrossClause(crossClauses.size, fieldBoosts, groups)
      crossClauses += c
      c
    }
    /** (field, raw value) per idf-scored `term` leaf; the index names
      * the `_t<i>_df` stat column.
      */
    val termLeaves =
      scala.collection.mutable.ArrayBuffer.empty[(String, JValue)]
    def registerTerm(field: String, v: JValue): Int = {
      termLeaves += ((field, v))
      termLeaves.size - 1
    }
    /** (field, ordered terms) per scored `match_phrase` clause —
      * order and repeats preserved, unlike `match`'s distinct bag.
      */
    val phraseClauses =
      scala.collection.mutable.ArrayBuffer.empty[(String, Seq[String])]
    def registerPhrase(field: String, terms: Seq[String]): Int = {
      phraseClauses += ((field, terms))
      phraseClauses.size - 1
    }
  }

  /** ES `minimum_should_match` simple forms against a clause count:
    * positive int N (N required; N > total matches nothing, Lucene's
    * rule), negative int −N (total − N), "P%" (floor of that percent
    * of total), "−P%" (total minus that floor). The resolved value
    * floors at 1 — a pure-optional disjunction still needs one hit to
    * MATCH (Lucene's pure-should rule). Conditional ladders
    * ("3<90%") refuse.
    */
  private def resolveMsm(spec: String, total: Int): Int = {
    val s = spec.trim
    require(!s.contains("<"),
      s"conditional minimum_should_match spec '$spec' is not " +
        "supported (use a single integer or percentage)")
    val n =
      try {
        if (s.endsWith("%")) {
          val p = s.dropRight(1).trim.toInt
          if (p >= 0) total * p / 100 else total + total * p / 100
        } else {
          val v = s.toInt
          if (v >= 0) v else total + v
        }
      } catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"minimum_should_match '$spec' is not an integer or " +
              "percentage")
      }
    math.max(n, 1)
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
    TextAnalysis.tokensOf(text).distinct

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
        if ((v \ "analyzer") != JNothing)
          throw new IllegalArgumentException(
            "per-clause analyzers are not supported in the SCORED path " +
              "(tf/df would need per-field analyzer tracking across " +
              "clauses); use the filter face (esQuery) or an index " +
              "built with InvertedIndex.build(analyzer = ...)")
        val msmSpec = (v \ "minimum_should_match") match {
          case JNothing   => None
          case JInt(n)    => Some(n.toString)
          case JString(m) => Some(m)
          case other => throw new IllegalArgumentException(
            s"minimum_should_match: $other")
        }
        // ES ignores msm under operator:and (all positions are
        // already required)
        MatchNode(ctx.register(field, ctx.expand(analyze(text))), op == "and",
          boostOf(v), msmSpec.filter(_ => op != "and"))
      case "multi_match" =>
        val text = (body \ "query").extract[String]
        val fields = (body \ "fields") match {
          case JArray(fs) => fs.map(_.extract[String])
          case other => throw new IllegalArgumentException(
            s"multi_match needs a fields list, got $other")
        }
        require(fields.nonEmpty, "multi_match needs at least one field")
        // ES's per-field boost spelling: "title^2" multiplies that
        // field's match score (composing with the clause boost)
        val fieldBoosts = fields.map { f =>
          f.split("\\^") match {
            case Array(name) if name.nonEmpty => (name, 1.0)
            case Array(name, bo) if name.nonEmpty =>
              (name, try bo.toDouble catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"malformed field boost '$f' (boost not a number)")
              })
            case _ => throw new IllegalArgumentException(
              s"malformed field boost '$f' (expected name or name^boost)")
          }
        }
        fieldBoosts.foreach(fb => ctx.requireText(fb._1))
        if ((body \ "fuzziness") != JNothing)
          throw new IllegalArgumentException(
            "fuzziness has no engine-independent SCORED translation")
        val op = (body \ "operator").extractOrElse[String]("or")
        val boost = boostOf(body)
        def matchNodes = fieldBoosts.map { case (f, fb) =>
          MatchNode(ctx.register(f, ctx.expand(analyze(text))), op == "and",
            boost * fb)
        }
        (body \ "type").extractOrElse[String]("best_fields") match {
          // ES best_fields IS dis_max over the per-field match scores
          case "best_fields" => DisMaxNode(matchNodes, tieOf(body))
          // most_fields IS a bool-should of them (sum; at least one
          // field must match — the pure-should bool's default msm)
          case "most_fields" =>
            if ((body \ "tie_breaker") != JNothing)
              throw new IllegalArgumentException(
                "tie_breaker applies to best_fields only")
            BoolNode(Nil, matchNodes, Nil, Nil, 1)
          // type: phrase IS dis_max over per-field match_phrase scores
          // (ES runs the same text as a phrase on each field); order
          // and repeats of the phrase terms preserved, operator is
          // meaningless for a phrase and refuses
          case "phrase" =>
            if ((body \ "operator") != JNothing)
              throw new IllegalArgumentException(
                "operator does not apply to multi_match type phrase")
            val terms = TextAnalysis.tokensOf(text)
            if (terms.isEmpty) GatedConst(lit(false), 0.0)
            else DisMaxNode(fieldBoosts.map { case (f, fb) =>
              PhraseNode(ctx.registerPhrase(f, terms), boost * fb)
            }, tieOf(body))
          // type: cross_fields — TERM-centric: each query position
          // matches in ANY field; per position the fields score as a
          // dis_max (tie 0) of per-field Okapi with the df BLENDED to
          // the cross-field MAX (Lucene BlendedTermQuery.docFreq);
          // operator/minimum_should_match count POSITIONS, ES's rule
          case "cross_fields" =>
            if ((body \ "tie_breaker") != JNothing)
              throw new IllegalArgumentException(
                "tie_breaker applies to best_fields only")
            val msmSpec = (body \ "minimum_should_match") match {
              case JNothing   => None
              case JInt(n)    => Some(n.toString)
              case JString(m) => Some(m)
              case other => throw new IllegalArgumentException(
                s"minimum_should_match: $other")
            }
            val groups = ctx.expand(analyze(text))
            if (groups.isEmpty) GatedConst(lit(false), 0.0)
            else CrossFieldsNode(
              ctx.registerCross(fieldBoosts, groups), op == "and",
              boost, msmSpec.filter(_ => op != "and"))
          case other => throw new IllegalArgumentException(
            s"multi_match type '$other' has no engine-independent " +
              "translation here (best_fields | most_fields | phrase " +
              "| cross_fields)")
        }
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
          // explicit non-negative ints keep their value (an explicit
          // 0 means NO minimum — ES's escape hatch); negatives and
          // percentages resolve against the should count via the
          // match-clause rules (resolveMsm floors at 1)
          case JInt(n) if n >= 0  => n.toInt
          case JLong(n) if n >= 0 => n.toInt
          case JInt(n)  => resolveMsm(n.toString, should.size)
          case JLong(n) => resolveMsm(n.toString, should.size)
          case JString(s) if s.matches("\\d+") => s.toInt
          case JString(s) => resolveMsm(s, should.size)
          case other => throw new IllegalArgumentException(
            s"minimum_should_match '$other' has no engine-independent " +
              "translation")
        }
        BoolNode(must, should, subFilter("filter"), subFilter("must_not"),
          msm)
      case "match_all" => GatedConst(lit(true), boostOf(body))
      // function_score — the engine-independent subset: a functions
      // array of weight and/or field_value_factor entries (each
      // optionally filter-gated), score_mode multiply|sum across the
      // matching functions, boost_mode multiply|sum|replace against
      // the query score, outer boost multiplies the final number.
      // random_score / script_score / decay functions are refused:
      // their numbers are engine-internal by definition.
      case "function_score" =>
        // unknown body keys (min_score, max_boost, random_score, …)
        // refuse instead of silently changing semantics
        body match {
          case JObject(fields) =>
            val known = Set("query", "functions", "score_mode",
              "boost_mode", "boost")
            val unknown = fields.map(_._1).filterNot(known)
            if (unknown.nonEmpty) throw new IllegalArgumentException(
              s"function_score keys ${unknown.mkString(", ")} are not " +
                "in the engine-independent subset " +
                s"(${known.mkString(", ")})")
          case _ => ()
        }
        val qNode = (body \ "query") match {
          case JNothing => GatedConst(lit(true), 1.0)
          case qq       => parse(qq, ctx)
        }
        val scoreMode =
          (body \ "score_mode").extractOrElse[String]("multiply")
        val boostMode =
          (body \ "boost_mode").extractOrElse[String]("multiply")
        require(Set("multiply", "sum")(scoreMode),
          s"score_mode '$scoreMode' not in the engine-independent " +
            "subset (multiply, sum)")
        require(Set("multiply", "sum", "replace")(boostMode),
          s"boost_mode '$boostMode' not in the engine-independent " +
            "subset (multiply, sum, replace)")
        val fns = (body \ "functions") match {
          case JArray(fs) if fs.nonEmpty => fs.map(parseScoreFn(_, ctx))
          case other => throw new IllegalArgumentException(
            "function_score needs a non-empty functions array " +
              s"(weight / field_value_factor entries), got $other")
        }
        FunctionScoreNode(qNode, fns, scoreMode, boostMode, boostOf(body))
      case "knn" => throw new IllegalArgumentException(
        "knn must be the TOP-LEVEL query: its score set is a whole-frame " +
          "top-k, not a per-row predicate, so composing it inside " +
          "bool/dis_max has no engine-independent translation — run the " +
          "knn retrieval separately and combine explicitly")
      // scored match_phrase — Lucene's PhraseQuery under BM25, which
      // IS engine-independent arithmetic: the phrase acts as one
      // synthetic term with tf = exact-adjacency occurrence count and
      // idf = Σ of the constituent terms' idfs (Lucene's multi-term
      // idfExplain), Okapi-saturated. `slop` refuses: sloppy-freq
      // weighting is Lucene-internal tuning with no portable number.
      case "match_phrase" =>
        val (field, v) = lonely(body, "match_phrase")
        ctx.requireText(field)
        val text = v match {
          case JString(t) => t
          case o          => (o \ "query").extract[String]
        }
        if ((v \ "analyzer") != JNothing)
          throw new IllegalArgumentException(
            "per-clause analyzers are not supported in the SCORED path " +
              "(tf/df would need per-field analyzer tracking across " +
              "clauses); use the filter face (esQuery) or an index " +
              "built with InvertedIndex.build(analyzer = ...)")
        if ((v \ "slop") != JNothing)
          throw new IllegalArgumentException(
            "match_phrase slop has no engine-independent SCORED " +
              "translation (Lucene's sloppy-frequency weighting); use " +
              "exact adjacency (no slop) or the filter face (esQuery)")
        val terms = TextAnalysis.tokensOf(text)
        if (terms.isEmpty) GatedConst(lit(false), 0.0)
        else PhraseNode(ctx.registerPhrase(field, terms), boostOf(v))
      // idf-scored `term` leaf (opt-in): ES's keyword-field number —
      // norms are off on keyword fields, tf is 1, so Lucene's BM25
      // collapses to boost × idf (the tf factor (k1+1)/(1+k1) = 1)
      case "term" if ctx.termIdf =>
        val (field, v) = lonely(body, "term")
        val raw = v \ "value" match { case JNothing => v; case x => x }
        TermIdfNode(ctx.registerTerm(field, raw),
          EsQueryDsl.filterColumn(q, ctx.idCol, ctx.requireText),
          boostOf(v))
      // `boosting` — matching is the positive leg alone; a doc that
      // ALSO matches the negative leg keeps its positive score
      // multiplied by negative_boost (ES's exact rule: the negative
      // query's own score is never used, only its match decision)
      case "boosting" =>
        val pos = (body \ "positive") match {
          case JNothing => throw new IllegalArgumentException(
            "boosting needs a positive query")
          case p => parse(p, ctx)
        }
        val neg = (body \ "negative") match {
          case JNothing => throw new IllegalArgumentException(
            "boosting needs a negative query")
          case nq => EsQueryDsl.filterColumn(nq, ctx.idCol,
            ctx.requireText)
        }
        BoostingNode(pos, neg, EsQueryDsl.negativeBoostOf(body))
      // `pinned`: promoted ids rank FIRST in their given order, then
      // the organic query's matches by score. Lucene starts at
      // Float.MAX_VALUE/2 and DECREMENTS THE BIT PATTERN per rank —
      // a float-representation trick with no cross-engine number; the
      // portable analogue steps by 1e30 (ulp(1.7e38) ≈ 2e22, so every
      // step is a distinct double, and even 10^8 pinned ids would sit
      // 10^30 above any organic score). Pinned docs match even when
      // the organic query misses them (ES's contract); an id both
      // pinned and organic keeps the pinned score.
      case "pinned" =>
        val ids = (body \ "ids") match {
          case JArray(vs) if vs.nonEmpty => vs.map(jv => jv match {
            case JInt(n)    => n.toLong: Any
            case JLong(n)   => n: Any
            case JString(s0) => s0: Any
            case other => throw new IllegalArgumentException(
              s"pinned ids must be ints or strings, got $other")
          })
          case other => throw new IllegalArgumentException(
            s"pinned needs a non-empty ids array, got $other")
        }
        require(ids.distinct.size == ids.size,
          s"duplicate pinned ids in $ids")
        val organic = (body \ "organic") match {
          case JNothing => throw new IllegalArgumentException(
            "pinned needs an organic query")
          case o => parse(o, ctx)
        }
        val pinnedBase = 1.7014117331926443e38 // Float.MAX_VALUE / 2
        val idCol = col(ctx.idCol)
        val pinnedScore = ids.zipWithIndex.foldLeft(
          lit(null).cast("double")) { case (acc, (v, i)) =>
          when(idCol === lit(v), lit(pinnedBase - i * 1e30)).otherwise(acc)
        }
        PinnedNode(pinnedScore, organic)
      // `wrapper`: decode the base64 query and recurse — the scored
      // face keeps full scoring semantics through the wrapper
      case "wrapper" =>
        val inner = (body \ "query") match {
          case JString(b64) => b64
          case other => throw new IllegalArgumentException(
            s"wrapper needs a base64 query string, got $other")
        }
        parse(JsonMethods.parse(new String(
          java.util.Base64.getDecoder.decode(inner),
          java.nio.charset.StandardCharsets.UTF_8)), ctx)
      // `rank_feature` — score a positive numeric feature through one
      // of ES's three portable curves. The no-function default derives
      // its pivot from index statistics (engine-internal) and refuses.
      // Matching = the feature exists and is positive (rank_feature
      // fields reject non-positive values at index time).
      case "rank_feature" =>
        val field = (body \ "field") match {
          case JString(f) => f
          case other => throw new IllegalArgumentException(
            s"rank_feature needs a field name, got $other")
        }
        val x = col(field).cast("double")
        val picked = Seq("saturation", "log", "sigmoid").flatMap(k =>
          (body \ k) match { case JNothing => None; case v => Some(k -> v) })
        require(picked.size <= 1,
          s"rank_feature takes at most one function, got " +
            picked.map(_._1).mkString(", "))
        val s = picked.headOption match {
          case None => throw new IllegalArgumentException(
            "rank_feature's default saturation derives its pivot from " +
              "index statistics (engine-internal) — give " +
              "saturation.pivot / log.scaling_factor / sigmoid explicitly")
          case Some(("saturation", v)) =>
            val pivot = numOf(v \ "pivot", "saturation.pivot")
            require(pivot > 0, s"saturation.pivot must be > 0, got $pivot")
            x / (x + pivot)
          case Some(("log", v)) =>
            val sf = numOf(v \ "scaling_factor", "log.scaling_factor")
            require(sf > 0, s"log.scaling_factor must be > 0, got $sf")
            log(lit(sf) + x)
          case Some(("sigmoid", v)) =>
            val pivot = numOf(v \ "pivot", "sigmoid.pivot")
            val ex = numOf(v \ "exponent", "sigmoid.exponent")
            require(pivot > 0 && ex > 0,
              s"sigmoid needs positive pivot/exponent, got $pivot/$ex")
            pow(x, ex) / (pow(x, ex) + math.pow(pivot, ex))
          case Some((other, _)) => throw new IllegalStateException(other)
        }
        ScoredLeaf(x.isNotNull && x > 0, s * boostOf(body))
      // `distance_feature` — boost by proximity to an origin:
      // score = boost × pivot/(pivot + distance). Geo when the origin
      // parses as a geo point (struct field, haversine meters), date
      // otherwise (|millis − origin| with a duration pivot) — ES
      // dispatches on the mapped field type; the origin SHAPE carries
      // the same information here.
      case "distance_feature" =>
        val field = (body \ "field") match {
          case JString(f) => f
          case other => throw new IllegalArgumentException(
            s"distance_feature needs a field name, got $other")
        }
        val originJ = (body \ "origin")
        require(originJ != JNothing, "distance_feature needs an origin")
        val pivotS = (body \ "pivot") match {
          case JString(s0) => s0
          case other => throw new IllegalArgumentException(
            s"distance_feature needs a string pivot, got $other")
        }
        val boost = boostOf(body)
        val asGeo = scala.util.Try(
          EsQueryDsl.parseGeoPoint(originJ,
            s"distance_feature($field).origin")).toOption
        val (dist, pivot) = asGeo match {
          case Some((oLat, oLon)) =>
            (Geo.distanceToMeters(col(field), oLat, oLon),
              Geo.parseDistanceMeters(pivotS))
          case None =>
            val originMs = originJ match {
              case JInt(n)  => n.toLong
              case JLong(n) => n
              case JString(d) => parseUtcMillis(d)
              case other => throw new IllegalArgumentException(
                s"distance_feature date origin must be epoch millis " +
                  s"or ISO date, got $other")
            }
            (abs(unix_millis(col(field).cast("timestamp")) - originMs)
              .cast("double"),
              parseDurationMillis(pivotS))
        }
        require(pivot > 0, s"distance_feature pivot must be > 0")
        ScoredLeaf(col(field).isNotNull,
          lit(boost) * pivot / (lit(pivot) + dist))
      // Lucene query-syntax faces, SCORED: the parsed AST maps onto
      // this node algebra — terms/phrases earn corpus-stats BM25
      // (dis_max across multiple default fields, Lucene's rewrite),
      // bool clause lists sum must+should with ES's msm defaults,
      // and the multi-term leaves (prefix/wildcard/fuzzy/range/
      // exists) gate constant-score 1.0, which IS Lucene's default
      // constant-score rewrite for them inside a scored bool.
      case "query_string" | "simple_query_string" =>
        if ((body \ "analyzer") != JNothing)
          throw new IllegalArgumentException(
            "per-clause analyzers are not supported in the SCORED " +
              "path; use the filter face (esQuery) instead")
        val (qtext, fields, op) = EsQueryDsl.queryStringArgs(kind, body)
        val ast = QueryStringParser.parseAst(qtext,
          simple = kind == "simple_query_string")
        fromQueryString(ast, fields,
          QueryStringParser.parseOp(op), ctx)
      // `sparse_vector` (ES 8.15+; accepts the deprecated
      // `text_expansion` spelling) — the ELSER/learned-sparse path:
      // the doc field holds a sparse vector as array<struct<token,
      // weight>>, the query carries a literal token → weight map, and
      // the score is the sparse dot product Σ over shared tokens of
      // query_weight × doc_weight — exactly Lucene's weighted-term
      // disjunction, which IS engine-independent arithmetic (no corpus
      // stats enter). A doc matches when it shares ≥ 1 query token.
      // The query map rides as a broadcast literal; the per-doc sum is
      // one array aggregate — the corpus never shuffles. Negative
      // weights refuse on BOTH sides (ES rejects them at query parse /
      // index time): the query side at parse, the doc side in-plan via
      // raise_error (the rateAgg discipline — a silent negative would
      // corrupt every ranking it touches). The `inference_id` form
      // (server-side text → sparse vector expansion) refuses by
      // absence: pass the expanded query_vector.
      case "sparse_vector" | "text_expansion" =>
        val (field, qvJ) = (body \ "field") match {
          // modern spelling: {field, query_vector}
          case JString(f) => (f, body \ "query_vector")
          case JNothing if kind == "text_expansion" =>
            // legacy text_expansion: {"<field>": {"model_text"...}} —
            // only the pre-expanded form is portable
            val (f, v) = lonely(body, "text_expansion")
            (f, v \ "query_vector")
          case other => throw new IllegalArgumentException(
            s"sparse_vector needs a field name, got $other")
        }
        if ((body \ "inference_id") != JNothing)
          throw new IllegalArgumentException(
            "sparse_vector inference_id calls a deployed expansion " +
              "model (engine-internal) — pass the expanded " +
              "query_vector token → weight map instead")
        val qv: Seq[(String, Double)] = qvJ match {
          case JObject(fs) if fs.nonEmpty =>
            fs.map { case (t, w) =>
              (t, numOf(w, s"sparse_vector query_vector['$t']")) }
          case other => throw new IllegalArgumentException(
            s"sparse_vector needs a non-empty query_vector object of " +
              s"token → weight, got $other")
        }
        require(qv.map(_._1).distinct.size == qv.size,
          s"duplicate tokens in sparse_vector query_vector: " +
            qv.map(_._1).mkString(", "))
        qv.foreach { case (t, w) => require(w >= 0,
          s"sparse_vector query weight for '$t' is negative ($w) — " +
            "ES rejects negative weights") }
        val boost = boostOf(body)
        val arr = col(field)
        val qmap = typedLit(qv.toMap)
        val qw = (e: Column) =>
          coalesce(element_at(qmap, e.getField("token")), lit(0.0))
        val dw = (e: Column) => {
          val w = e.getField("weight").cast("double")
          when(w < 0, raise_error(lit(
            s"sparse_vector: negative weight in '$field' — ES " +
              "rejects negative weights at index time; clean the " +
              "column first")).cast("double")).otherwise(w)
        }
        val dot = aggregate(arr, lit(0.0),
          (acc, e) => acc + qw(e) * dw(e))
        ScoredLeaf(
          arr.isNotNull &&
            exists(arr, e =>
              element_at(qmap, e.getField("token")).isNotNull),
          dot * boost)
      // every remaining translatable leaf: the filter face's predicate,
      // constant_score semantics (see the scaladoc contract)
      case _ => GatedConst(
        EsQueryDsl.filterColumn(q, ctx.idCol, ctx.requireText), 1.0)
    }
  }

  /** [[QueryStringParser]] AST → scored nodes. Gate-only leaves and
    * `-` clauses compile through the parser's own filter compiler so
    * both faces share one predicate per construct.
    */
  private def fromQueryString(ast: QueryStringParser.Node,
                              fields: Seq[String], defaultAnd: Boolean,
                              ctx: Ctx): Node = {
    import QueryStringParser.{AllN, TermN, PhraseN, NotN, AndN, OrN,
      SeqN, compileAst}
    def fieldsOf(f: Option[String]): Seq[String] = f.map(Seq(_))
      .getOrElse {
        require(fields.nonEmpty,
          "unscoped query_string clause needs default fields — pass " +
            "fields/default_field, or scope every clause (field:...)")
        fields
      }
    def pred(n: QueryStringParser.Node): Column =
      compileAst(n, fields, defaultAnd, "standard", col, ctx.requireText)
    def rec(n: QueryStringParser.Node): Node = n match {
      case AllN => GatedConst(lit(true), 1.0)
      case TermN(f, t) =>
        val fs = fieldsOf(f)
        fs.foreach(ctx.requireText)
        val nodes = fs.map(fl =>
          MatchNode(ctx.register(fl, ctx.expand(analyze(t))), requireAll = false,
            1.0): Node)
        if (nodes.size == 1) nodes.head else DisMaxNode(nodes, 0.0)
      case PhraseN(f, t) =>
        val terms = TextAnalysis.tokensOf(t)
        if (terms.isEmpty) GatedConst(lit(false), 0.0)
        else {
          val fs = fieldsOf(f)
          fs.foreach(ctx.requireText)
          val nodes = fs.map(fl =>
            PhraseNode(ctx.registerPhrase(fl, terms), 1.0): Node)
          if (nodes.size == 1) nodes.head else DisMaxNode(nodes, 0.0)
        }
      case NotN(x)    => BoolNode(Nil, Nil, Nil, Seq(pred(x)), 0)
      case AndN(l, r) => BoolNode(Seq(rec(l), rec(r)), Nil, Nil, Nil, 0)
      case OrN(l, r)  => BoolNode(Nil, Seq(rec(l), rec(r)), Nil, Nil, 1)
      case SeqN(cs) =>
        val required = cs.collect { case ('+', x) => x } ++
          (if (defaultAnd) cs.collect { case (' ', x) => x } else Nil)
        val bare =
          if (defaultAnd) Nil else cs.collect { case (' ', x) => x }
        val forbidden = cs.collect { case ('-', x) => x }
        BoolNode(required.map(rec), bare.map(rec), Nil,
          forbidden.map(pred),
          msm = if (required.isEmpty && bare.nonEmpty) 1 else 0)
      // gate-only leaves: prefix / wildcard / fuzzy / range / exists
      case other => GatedConst(pred(other), 1.0)
    }
    rec(ast)
  }

  /** ES duration string → milliseconds (d / h / m / s / ms). */
  private def parseDurationMillis(s: String): Double = {
    val m = "^(\\d+(?:\\.\\d+)?)(ms|s|m|h|d)$".r
    s.trim match {
      case m(n, unit) => n.toDouble * (unit match {
        case "ms" => 1.0
        case "s"  => 1000.0
        case "m"  => 60000.0
        case "h"  => 3600000.0
        case "d"  => 86400000.0
      })
      case other => throw new IllegalArgumentException(
        s"cannot parse duration '$other' (expected <number>(ms|s|m|h|d))")
    }
  }

  /** ISO date ("yyyy-MM-dd") or instant → epoch millis at UTC. */
  private def parseUtcMillis(s: String): Long =
    if (s.matches("\\d{4}-\\d{2}-\\d{2}"))
      java.time.LocalDate.parse(s)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    else java.time.Instant.parse(s).toEpochMilli

  private def numOf(v: JValue, what: String): Double = v match {
    case JInt(n)     => n.toDouble
    case JLong(n)    => n.toDouble
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"$what: $other")
  }

  /** One function_score entry → (optional filter gate, value column).
    * `weight` alone is a constant; `field_value_factor` follows ES:
    * value = modifier(factor × field), `missing` (default 0) replaces
    * null, `log1p`/`log2p` are COMMON (base-10) logs like ES, the
    * `ln*` spellings natural. Decay functions (`gauss`/`exp`/
    * `linear`) follow ES's numeric-field arithmetic exactly
    * (σ² = −scale²∕2·ln(decay) etc.; missing field → 1.0), restricted
    * to NUMERIC origin/scale/offset (date-duration and geo-distance
    * spellings are engine-format territory — refused), value rounded
    * to 6 dp so libm exp/ln drift cannot leak cross-engine.
    * `random_score` requires BOTH `seed` and `field` (ES's
    * deterministic spelling) and draws the portable md5 uniform of
    * [[graft.operators.Sampling.hashFrac]] — same determinism and
    * distribution contract as ES's hash, DIFFERENT hash function (ES
    * uses an engine-internal murmur; there is no portable way to
    * reproduce its exact numbers — documented delta). A seedless or
    * fieldless `random_score` still refuses: per-execution
    * randomness has no engine-independent value. `script_score`
    * stays refused (Painless is engine-internal by definition).
    */
  private def parseScoreFn(f: JValue, ctx: Ctx): (Option[Column], Column) = {
    // an entry carrying script_score (or an unknown function) refuses
    // even when weight is also present — silently substituting a
    // deterministic number for ES's scripted one would be worse than
    // failing
    f match {
      case JObject(fields) =>
        val known = Set("filter", "weight", "field_value_factor",
          "gauss", "exp", "linear", "random_score")
        val unknown = fields.map(_._1).filterNot(known)
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"function_score function keys ${unknown.mkString(", ")} are " +
            "not in the engine-independent subset " +
            s"(${known.mkString(", ")})")
      case _ => ()
    }
    val filt = (f \ "filter") match {
      case JNothing => None
      case ff => Some(EsQueryDsl.filterColumn(ff, ctx.idCol,
        ctx.requireText))
    }
    val weight = (f \ "weight") match {
      case JNothing => None
      case w        => Some(numOf(w, "weight"))
    }
    val fvf = (f \ "field_value_factor") match {
      case JNothing => None
      case o =>
        // same loud-unknown-key discipline as the function-entry and
        // body levels: a typo'd "modifeir" must not silently fall back
        // to modifier 'none' and change scores
        o match {
          case JObject(fs) =>
            val knownFvf = Set("field", "factor", "missing", "modifier")
            val bad = fs.map(_._1).filterNot(knownFvf)
            if (bad.nonEmpty) throw new IllegalArgumentException(
              s"field_value_factor keys ${bad.mkString(", ")} are not " +
                s"supported (${knownFvf.toSeq.sorted.mkString(", ")})")
          case _ => ()
        }
        val field = (o \ "field").extract[String]
        val factor = (o \ "factor") match {
          case JNothing => 1.0
          case x        => numOf(x, "factor")
        }
        val missing = (o \ "missing") match {
          case JNothing => 0.0
          case x        => numOf(x, "missing")
        }
        val base = coalesce(col(field).cast("double"), lit(missing)) *
          lit(factor)
        val v = (o \ "modifier").extractOrElse[String]("none") match {
          case "none"       => base
          case "log1p"      => log10(lit(1.0) + base)
          case "log2p"      => log10(lit(2.0) + base)
          case "ln1p"       => log(lit(1.0) + base)
          case "ln2p"       => log(lit(2.0) + base)
          case "sqrt"       => sqrt(base)
          case "square"     => base * base
          // 1/0 under Spark's non-ANSI division is a silent null that
          // would poison _score; ES (Java) returns ±Infinity with the
          // zero's sign — match both signs (negative zero stringifies
          // as "-0.0", the one portable way to see its sign bit)
          case "reciprocal" =>
            when(base === 0.0,
              when(base.cast("string").startsWith("-"),
                lit(Double.NegativeInfinity))
                .otherwise(lit(Double.PositiveInfinity)))
              .otherwise(lit(1.0) / base)
          case m => throw new IllegalArgumentException(
            s"field_value_factor modifier '$m' not supported " +
              "(none, log1p, log2p, ln1p, ln2p, sqrt, square, reciprocal)")
        }
        Some(v)
    }
    val decay = Seq("gauss", "exp", "linear")
      .flatMap(k => (f \ k) match {
        case JNothing => Seq.empty
        case o        => Seq(parseDecay(k, o))
      })
    val rnd = (f \ "random_score") match {
      case JNothing => None
      case o        => Some(parseRandomScore(o))
    }
    val fns = fvf.toSeq ++ decay ++ rnd.toSeq
    require(fns.size <= 1,
      "each function_score function carries at most ONE of " +
        "field_value_factor / gauss / exp / linear / random_score " +
        "(plus an optional weight) — ES's one-function-per-entry rule")
    val value = (weight, fns.headOption) match {
      case (Some(w), Some(v)) => v * lit(w)
      case (Some(w), None)    => lit(w): Column
      case (None, Some(v))    => v
      case (None, None) => throw new IllegalArgumentException(
        "each function_score function needs weight and/or one of " +
          "field_value_factor / gauss / exp / linear / random_score " +
          "(the engine-independent subset)")
    }
    (filt, value)
  }

  /** ES decay arithmetic over a NUMERIC field, or — when `origin` is a
    * geo point (object {lat, lon} / "lat,lon" / [lon, lat]) — over a
    * geo-point STRUCT field, where distance is [[Geo.haversineMeters]]
    * and scale/offset parse as distance strings ("2km"). The
    * date-duration spelling still refuses — duration parsing is
    * engine-format territory. Missing field / NULL point → 1.0 (ES's
    * behavior); value rounded to 6 dp (safe here because decay scores
    * are O(1) — see the [[Geo]] float-discipline note).
    */
  private def parseDecay(kind: String, o: JValue): Column = {
    val (field, params) = o match {
      case JObject(List((fname, p))) => (fname, p)
      case other => throw new IllegalArgumentException(
        s"$kind needs exactly one field object, got $other")
    }
    params match {
      case JObject(fs) =>
        val known = Set("origin", "scale", "offset", "decay")
        val bad = fs.map(_._1).filterNot(known)
        if (bad.nonEmpty) throw new IllegalArgumentException(
          s"$kind($field) keys ${bad.mkString(", ")} are not supported " +
            s"(${known.toSeq.sorted.mkString(", ")})")
      case _ => ()
    }
    val geoOrigin = (params \ "origin") match {
      case o2 @ (JObject(_) | JArray(_)) =>
        Some(EsQueryDsl.parseGeoPoint(o2, s"$kind($field).origin"))
      case JString(s) if s.contains(",") =>
        Some(EsQueryDsl.parseGeoPoint(JString(s), s"$kind($field).origin"))
      case _ => None
    }
    if (geoOrigin.isDefined)
      return parseGeoDecay(kind, field, params,
        geoOrigin.get._1, geoOrigin.get._2)
    val origin = numOf(params \ "origin", s"$kind($field).origin")
    val scale = numOf(params \ "scale", s"$kind($field).scale")
    require(scale > 0, s"$kind($field): scale must be positive")
    val offset = (params \ "offset") match {
      case JNothing => 0.0
      case x        => numOf(x, s"$kind($field).offset")
    }
    require(offset >= 0, s"$kind($field): offset must be non-negative")
    val dec = (params \ "decay") match {
      case JNothing => 0.5
      case x        => numOf(x, s"$kind($field).decay")
    }
    require(dec > 0 && dec < 1,
      s"$kind($field): decay must be in (0, 1), got $dec")
    val dist = greatest(
      abs(col(field).cast("double") - lit(origin)) - lit(offset),
      lit(0.0))
    val v = kind match {
      case "gauss" =>
        // σ² = −scale² / (2 ln decay): score(scale-away) = decay
        val sigma2 = -scale * scale / (2.0 * math.log(dec))
        exp(-(dist * dist) / lit(2.0 * sigma2))
      case "exp" =>
        exp(lit(math.log(dec) / scale) * dist)
      case "linear" =>
        val s = scale / (1.0 - dec)
        greatest((lit(s) - dist) / lit(s), lit(0.0))
    }
    round(when(col(field).isNull, lit(1.0)).otherwise(v), 6)
  }

  /** The geo leg of [[parseDecay]]: distance is haversine meters from
    * the origin point to the field's (lat, lon) struct, scale/offset
    * parse as ES distance strings, and the same σ²/λ/slope arithmetic
    * applies. One fixed expression tree, DuckDB-mirrorable like the
    * numeric leg.
    */
  private def parseGeoDecay(kind: String, field: String, params: JValue,
                            oLat: Double, oLon: Double): Column = {
    def distMeters(x: JValue, what: String): Double = x match {
      case JString(s)  => Geo.parseDistanceMeters(s)
      case JInt(n)     => n.toDouble
      case JLong(n)    => n.toDouble
      case JDouble(d)  => d
      case JDecimal(d) => d.toDouble
      case JNothing => throw new IllegalArgumentException(
        s"$what is required")
      case other => throw new IllegalArgumentException(
        s"$what: cannot parse distance $other")
    }
    val scale = distMeters(params \ "scale", s"$kind($field).scale")
    require(scale > 0, s"$kind($field): scale must be positive")
    val offset = (params \ "offset") match {
      case JNothing => 0.0
      case x        => distMeters(x, s"$kind($field).offset")
    }
    require(offset >= 0, s"$kind($field): offset must be non-negative")
    val dec = (params \ "decay") match {
      case JNothing => 0.5
      case x        => numOf(x, s"$kind($field).decay")
    }
    require(dec > 0 && dec < 1,
      s"$kind($field): decay must be in (0, 1), got $dec")
    val dist = greatest(
      Geo.distanceToMeters(col(field), oLat, oLon) - lit(offset),
      lit(0.0))
    val v = kind match {
      case "gauss" =>
        val sigma2 = -scale * scale / (2.0 * math.log(dec))
        exp(-(dist * dist) / lit(2.0 * sigma2))
      case "exp" =>
        exp(lit(math.log(dec) / scale) * dist)
      case "linear" =>
        val s = scale / (1.0 - dec)
        greatest((lit(s) - dist) / lit(s), lit(0.0))
    }
    round(when(col(field).isNull, lit(1.0)).otherwise(v), 6)
  }

  /** Deterministic random_score: seed + field REQUIRED, value = the
    * portable md5 uniform in [0, 1) (6-dp rounded). Same determinism
    * contract as ES's seeded form, different hash (documented delta).
    */
  private def parseRandomScore(o: JValue): Column = {
    o match {
      case JObject(fs) =>
        val known = Set("seed", "field")
        val bad = fs.map(_._1).filterNot(known)
        if (bad.nonEmpty) throw new IllegalArgumentException(
          s"random_score keys ${bad.mkString(", ")} are not supported " +
            "(seed, field)")
      case _ => ()
    }
    val seed = (o \ "seed") match {
      case JString(s)  => s
      case JInt(n)     => n.toString
      case JLong(n)    => n.toString
      case JNothing => throw new IllegalArgumentException(
        "random_score without a seed is per-execution randomness — no " +
          "engine-independent value exists; give seed AND field for " +
          "the deterministic form")
      case other => throw new IllegalArgumentException(
        s"random_score seed must be an int or string, got $other")
    }
    val field = (o \ "field") match {
      case JString(s) => s
      case JNothing => throw new IllegalArgumentException(
        "random_score needs an explicit field: ES's seed-only form " +
          "hashes an internal doc id no other engine can see — give " +
          "seed AND field (ES docs recommend exactly that for " +
          "reproducibility)")
      case other => throw new IllegalArgumentException(
        s"random_score field must be a string, got $other")
    }
    round(
      conv(substring(md5(concat(lit(seed), lit(":"),
          col(field).cast("string"))), 1, 8), 16, 10).cast("long") /
        lit(4294967296.0), 6)
  }

  /** Node → (matched, score): `score` is already zero when unmatched,
    * so parents can sum/greatest children without re-gating.
    */
  private def compile(n: Node): (Column, Column) = n match {
    case MatchNode(c, requireAll, boost, msmSpec) =>
      // a query that analyzes to zero terms matches nothing (ES's
      // empty-match), not everything — hits === 0 would invert that
      if (c.groups.isEmpty) (lit(false), lit(0.0))
      else {
        val hits = coalesce(col(s"_q${c.id}_hits"), lit(0L))
        val need: Int =
          if (requireAll) c.groups.size
          else msmSpec.map(resolveMsm(_, c.groups.size)).getOrElse(1)
        val matched = hits >= need.toLong
        (matched,
          when(matched, coalesce(col(s"_q${c.id}_score"), lit(0.0)) * boost)
            .otherwise(0.0))
      }
    case CrossFieldsNode(x, requireAll, boost, msmSpec) =>
      if (x.groups.isEmpty) (lit(false), lit(0.0))
      else {
        val hits = coalesce(col(s"_x${x.id}_hits"), lit(0L))
        val need: Int =
          if (requireAll) x.groups.size
          else msmSpec.map(resolveMsm(_, x.groups.size)).getOrElse(1)
        val matched = hits >= need.toLong
        (matched,
          when(matched,
            coalesce(col(s"_x${x.id}_score"), lit(0.0)) * boost)
            .otherwise(0.0))
      }
    case GatedConst(pred, boost) =>
      val matched = coalesce(pred, lit(false))
      (matched, when(matched, boost).otherwise(0.0))
    case PhraseNode(id, boost) =>
      val matched = col(s"_p${id}_ptf") > 0
      (matched,
        when(matched, col(s"_p${id}_score") * boost).otherwise(0.0))
    case TermIdfNode(id, pred, boost) =>
      val matched = coalesce(pred, lit(false))
      val df = col(s"_t${id}_df")
      (matched, when(matched,
        lit(boost) * log(lit(1.0) +
          (col("_t_n") - df + 0.5) / (df + 0.5))).otherwise(0.0))
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
    case FunctionScoreNode(query, fns, scoreMode, boostMode, boost) =>
      val (qm, qs) = compile(query)
      // a non-matching function contributes the combine-neutral
      // element (1 for multiply, 0 for sum) — only matching functions
      // apply; and when NO function matches at all, the overall
      // factor is 1 (ES keeps the query score unmodified rather than
      // zeroing it)
      val gates = fns.map { case (filt, _) =>
        filt.map(f => coalesce(f, lit(false))).getOrElse(lit(true))
      }
      val applied = fns.zip(gates).map { case ((_, v), gate) =>
        if (scoreMode == "multiply") when(gate, v).otherwise(lit(1.0))
        else when(gate, v).otherwise(lit(0.0))
      }
      val anyFn = gates.reduce(_ || _)
      val combined = when(anyFn,
        if (scoreMode == "multiply") applied.reduce(_ * _)
        else applied.reduce(_ + _)).otherwise(lit(1.0))
      val merged = boostMode match {
        case "multiply" => qs * combined
        case "sum"      => qs + combined
        case "replace"  => combined
      }
      (qm, when(qm, merged * lit(boost)).otherwise(0.0))
    case BoostingNode(pos, neg, nb) =>
      val (pm, ps) = compile(pos)
      val demoted =
        when(coalesce(neg, lit(false)), ps * nb).otherwise(ps)
      (pm, when(pm, demoted).otherwise(0.0))
    case ScoredLeaf(pred, score) =>
      val matched = coalesce(pred, lit(false))
      (matched, when(matched, score).otherwise(0.0))
    case PinnedNode(ps, organic) =>
      val (om, os) = compile(organic)
      val matched = ps.isNotNull || om
      (matched,
        when(matched, when(ps.isNotNull, ps).otherwise(os))
          .otherwise(0.0))
  }

  /** Compile `json` against `docs` and return the MATCHING rows with a
    * `_score` column (6-dp, ES's sort key) appended to the original
    * schema. `idCol` must uniquely key `docs` (it carries the per-doc
    * scores back from the aggregation — enforced where cheap: the
    * joined moments would otherwise fan out).
    */
  /** `synonyms` — Solr-format rule strings ([[Synonyms.parse]]); the
    * search-time `synonym_graph` set applied to every analyzed text
    * clause (match / multi_match / query_string match legs), scored
    * with Lucene's SynonymQuery blending (summed tf, max df, one
    * Okapi pass per query position).
    */
  def scoredFrame(docs: DataFrame, idCol: String, json: String,
                  requireText: String => Unit = _ => (),
                  k1: Double = 1.2, b: Double = 0.75,
                  termIdf: Boolean = false,
                  synonyms: Seq[String] = Nil): DataFrame = {
    require(!docs.columns.contains("_score"),
      "frame already has a _score column")
    JsonMethods.parse(json) match {
      // top-level knn clause (the ES 8.x knn-query face): handled as a
      // whole-frame retrieval, not a per-row predicate — see knnFrame
      case JObject(List(("knn", body))) =>
        return knnFrame(docs, idCol, body, requireText)
      case _ => ()
    }
    val ctx = new Ctx(idCol, requireText, termIdf,
      Synonyms.parse(synonyms))
    val ast = parse(JsonMethods.parse(json), ctx)
    val byField = ctx.clauses.toSeq.groupBy(_.field)
    val withMoments = byField.foldLeft(docs) { case (acc, (field, cs)) =>
      acc.join(fieldMoments(docs, idCol, field, cs, k1, b),
        Seq(idCol), "left")
    }
    // idf-scored term leaves: ONE 1-row aggregate over the corpus (N
    // plus one filtered count per leaf) enters as a broadcast
    // crossJoin inside the lazy plan — the fieldMoments stats rule;
    // building the frame still runs no job. N is the corpus row
    // count; ES uses the field's docCount, identical when the field
    // has no nulls (a null never equals the term value, so df agrees
    // unconditionally).
    // cross_fields clauses: per field one doc-keyed tf aggregation
    // (the fieldMoments shuffle shape), per-field length/avg stats and
    // the cross-field BLENDED group dfs as 1-row broadcasts; the
    // per-group dis_max(tie 0) of per-field Okapi with the blended
    // idf, and the clause score/hits, are computed here because the
    // arithmetic needs k1/b. Lucene's cross_fields contract: df per
    // position = MAX over fields of the member dfs, tf/length norms
    // stay per-field, per-position score = best field.
    val withCross =
      if (ctx.crossClauses.isEmpty) withMoments
      else {
        val spark2 = docs.sparkSession
        import spark2.implicits._
        ctx.crossClauses.toSeq.foldLeft(withMoments) { case (acc0, x) =>
          val groups = x.groups
          val allTerms = groups.flatten.distinct
          val pairs = groups.zipWithIndex.flatMap { case (g, gi) =>
            g.map(t => (gi, t))
          }.toDF("_gid", "_t")
          var acc = acc0
          val dfreqs = x.fieldBoosts.zipWithIndex.map {
            case ((f, _), fi) =>
              // the fieldMoments one-pass shape (r18): matching-token
              // occurrences + one null row per non-matching doc ride
              // ONE exchange; tf, dfs and the per-field stats all
              // derive from it instead of a second tokenize pass
              val emitted = docs
                .select(col(ctx.idCol),
                  TextAnalysis.tokens(col(f)).as("_toks"))
                .select(col(ctx.idCol),
                  size(col("_toks")).cast("double").as("_len"),
                  col("_toks"))
                .select(col(ctx.idCol), col("_len"),
                  explode_outer(filter(col("_toks"),
                    t => t.isin(allTerms: _*))).as("_t"))
              val occCells = emitted
                .groupBy(col(ctx.idCol), col("_len"), col("_t"))
                .agg(count(lit(1)).cast("double").as("_tf"))
              val tf = occCells.filter(col("_t").isNotNull)
              val stats = occCells.select(col(ctx.idCol), col("_len"))
                .distinct()
                .agg(count(lit(1)).cast("double").as(s"_x${x.id}_n"),
                  coalesce(avg(col("_len")), lit(1.0))
                    .as(s"_x${x.id}_f${fi}_avg"))
              val dfreq = tf.groupBy("_t")
                .agg(count_distinct(col(ctx.idCol)).cast("double")
                  .as("_df"))
              val cells = groups.indices.map(gi =>
                sum(when(col("_gid") === gi, col("_tf")))
                  .as(s"_x${x.id}_f${fi}_g${gi}_tf"))
              val perDoc = tf.join(broadcast(pairs), Seq("_t"))
                .groupBy(col(ctx.idCol))
                .agg(max(col("_len")).as(s"_x${x.id}_f${fi}_len"),
                  cells: _*)
              acc = acc.join(perDoc, Seq(ctx.idCol), "left")
              acc = acc.crossJoin(broadcast(
                if (fi == 0) stats else stats.drop(s"_x${x.id}_n")))
              dfreq
          }
          val dfAll = dfreqs.reduce(_ unionByName _)
          val dfCells = groups.indices.map(gi =>
            coalesce(max(when(col("_gid") === gi, col("_df"))),
              lit(0.0)).as(s"_x${x.id}_g${gi}_df"))
          val gdf = pairs.join(dfAll, Seq("_t"), "left")
            .agg(dfCells.head, dfCells.tail: _*)
          acc = acc.crossJoin(broadcast(gdf))
          val n = col(s"_x${x.id}_n")
          val gs = groups.indices.map { gi =>
            val dfc = col(s"_x${x.id}_g${gi}_df")
            val idf = log(lit(1.0) + (n - dfc + 0.5) / (dfc + 0.5))
            val perField = x.fieldBoosts.zipWithIndex.map {
              case ((_, fb), fi) =>
                val tfc = col(s"_x${x.id}_f${fi}_g${gi}_tf")
                val len = col(s"_x${x.id}_f${fi}_len")
                val avgL = col(s"_x${x.id}_f${fi}_avg")
                when(tfc.isNotNull,
                  lit(fb) * (idf * tfc * (k1 + 1.0) /
                    (tfc + lit(k1) *
                      (lit(1.0) - b + lit(b) * len / avgL))))
            }
            val sg =
              if (perField.size == 1) perField.head
              else greatest(perField: _*)
            (sg, when(sg.isNotNull, 1L).otherwise(0L))
          }
          acc
            .withColumn(s"_x${x.id}_score",
              gs.map(g => coalesce(g._1, lit(0.0))).reduce(_ + _))
            .withColumn(s"_x${x.id}_hits",
              gs.map(_._2).reduce(_ + _))
        }
      }
    val withTermStats =
      if (ctx.termLeaves.isEmpty) withCross
      else {
        val aggs = count(lit(1)).cast("double").as("_t_n") +:
          ctx.termLeaves.toSeq.zipWithIndex.map { case ((f, v), i) =>
            count(when(col(f) === EsQueryDsl.toLit(v), 1))
              .cast("double").as(s"_t${i}_df")
          }
        withCross.crossJoin(broadcast(docs.agg(aggs.head, aggs.tail: _*)))
      }
    // scored match_phrase clauses: per-doc phrase frequency is a PURE
    // expression over the staged token array (no shuffle; the array
    // is a projection alias so the lambda's element_at reads a
    // column, never re-tokenizes); the corpus stats — N, per-field
    // token totals, per-term dfs — reduce to ONE 1-row aggregate over
    // a token-staged projection and enter as a broadcast crossJoin
    // inside the lazy plan (the fieldMoments/termLeaves discipline:
    // building the frame still runs no job)
    val pFields = ctx.phraseClauses.toSeq.map(_._1).distinct
    val withPhrase =
      if (ctx.phraseClauses.isEmpty) withTermStats
      else {
        var acc = withTermStats
        pFields.zipWithIndex.foreach { case (f, fi) =>
          acc = acc.withColumn(s"_ptoks$fi",
            TextAnalysis.tokens(col(f)))
        }
        ctx.phraseClauses.toSeq.zipWithIndex.foreach {
          case ((f, terms), i) =>
            val tc = col(s"_ptoks${pFields.indexOf(f)}")
            // the native codegen adjacency counter (one compiled pass
            // per row) — r18: replaced the interpreted sequence+filter
            // HOF lambda that dominated the phrase gates (f26/f31 ~4 s
            // of a 4.5 s warm run); bit-identical counts, pinned by
            // the EsScoredQuerySpec differential. coalesce keeps the
            // old `otherwise(0)` arm for NULL token arrays.
            val ptf = coalesce(
              graft.plans.TokenPhraseFreq.of(tc, terms).cast("double"),
              lit(0.0))
            acc = acc
              .withColumn(s"_p${i}_ptf", ptf)
              .withColumn(s"_p${i}_len", size(tc).cast("double"))
        }
        val statSrc = docs.select(pFields.zipWithIndex.map {
          case (f, fi) => TextAnalysis.tokens(col(f)).as(s"_st$fi")
        }: _*)
        val aggs = count(lit(1)).cast("double").as("_p_n") +:
          (pFields.indices.map(fi =>
            coalesce(sum(size(col(s"_st$fi")).cast("double")), lit(0.0))
              .as(s"_pf${fi}_sumlen")) ++
           ctx.phraseClauses.toSeq.zipWithIndex.flatMap {
             case ((f, terms), i) =>
               val fi = pFields.indexOf(f)
               terms.zipWithIndex.map { case (t, j) =>
                 count(when(array_contains(col(s"_st$fi"), t), 1))
                   .cast("double").as(s"_p${i}_df$j")
               }
           })
        val withStats = acc.crossJoin(
          broadcast(statSrc.agg(aggs.head, aggs.tail: _*)))
        // the per-clause phrase-BM25 score (boost applied at compile):
        // tf = adjacency count, idf = Σ constituent-term idfs, Okapi
        // saturation — Lucene's PhraseQuery arithmetic
        ctx.phraseClauses.toSeq.zipWithIndex.foldLeft(withStats) {
          case (df, ((f, terms), i)) =>
            val fi = pFields.indexOf(f)
            val n = col("_p_n")
            val avg = col(s"_pf${fi}_sumlen") / n
            val idfSum = terms.indices.map(j =>
              log(lit(1.0) + (n - col(s"_p${i}_df$j") + 0.5) /
                (col(s"_p${i}_df$j") + 0.5))).reduce(_ + _)
            val ptf = col(s"_p${i}_ptf")
            df.withColumn(s"_p${i}_score",
              idfSum * ptf * (k1 + 1.0) /
                (ptf + lit(k1) *
                  (lit(1.0) - b + lit(b) * col(s"_p${i}_len") / avg)))
        }
      }
    val (matched, score) = compile(ast)
    val phraseCols =
      if (ctx.phraseClauses.isEmpty) Nil
      else pFields.indices.map(fi => s"_ptoks$fi") ++
        Seq("_p_n") ++ pFields.indices.map(fi => s"_pf${fi}_sumlen") ++
        ctx.phraseClauses.toSeq.zipWithIndex.flatMap { case ((_, ts), i) =>
          Seq(s"_p${i}_ptf", s"_p${i}_len", s"_p${i}_score") ++
            ts.indices.map(j => s"_p${i}_df$j")
        }
    withPhrase.filter(matched)
      .withColumn("_score", round(score, 6))
      .drop(ctx.clauses.toSeq.flatMap(c =>
        Seq(s"_q${c.id}_score", s"_q${c.id}_hits")) ++
        (if (ctx.termLeaves.isEmpty) Nil
         else "_t_n" +: ctx.termLeaves.toSeq.indices.map(i => s"_t${i}_df")) ++
        ctx.crossClauses.toSeq.flatMap { x =>
          Seq(s"_x${x.id}_n", s"_x${x.id}_score", s"_x${x.id}_hits") ++
            x.groups.indices.map(gi => s"_x${x.id}_g${gi}_df") ++
            x.fieldBoosts.indices.flatMap(fi =>
              Seq(s"_x${x.id}_f${fi}_len", s"_x${x.id}_f${fi}_avg") ++
                x.groups.indices.map(gi =>
                  s"_x${x.id}_f${fi}_g${gi}_tf"))
        } ++
        phraseCols: _*)
  }

  /** The ES 8.x `knn` query, computed EXACTLY: cosine against the
    * literal query vector over the (optionally `filter`-restricted)
    * frame, keep the top `k` by the two-phase per-query ranking of
    * [[graft.operators.Similarity.rankTopKPerQuery]] (no
    * corpus-sized single-partition sort), `_score` = ES's cosine
    * mapping boost × (1 + cos) / 2 rounded to 6 dp. `num_candidates`
    * is accepted and ignored — it is the recall dial of ES's
    * per-shard HNSW approximation, and this computes the exact
    * answer it approximates (use
    * [[graft.operators.VectorIndex.searchTopK]] when an ANN index is
    * the right cost shape). Ties break on `idCol`, ES's determinism
    * gap closed the same way the ANN operators close it.
    */
  private def knnFrame(docs: DataFrame, idCol: String, body: JValue,
                       requireText: String => Unit): DataFrame = {
    val field = (body \ "field") match {
      case JString(f) => f
      case other => throw new IllegalArgumentException(
        s"knn needs a field name, got $other")
    }
    val qv = (body \ "query_vector") match {
      case JArray(xs) if xs.nonEmpty => xs.map {
        case JDouble(d)  => d
        case JInt(n)     => n.toDouble
        case JLong(n)    => n.toDouble
        case JDecimal(d) => d.toDouble
        case other => throw new IllegalArgumentException(
          s"query_vector element: $other")
      }
      case other => throw new IllegalArgumentException(
        s"knn needs a non-empty query_vector, got $other")
    }
    val k = (body \ "k") match {
      case JNothing => 10
      case JInt(n)  => n.toInt
      case JLong(n) => n.toInt
      case other => throw new IllegalArgumentException(s"knn k: $other")
    }
    require(k >= 1, s"knn k must be positive, got $k — a zero/negative " +
      "k would silently read as 'no matches'")
    val boost = boostOf(body)
    // the caller's text-dtype guard applies to the knn filter exactly
    // as it does to every other filter context
    val base = (body \ "filter") match {
      case JNothing => docs
      case f => docs.filter(coalesce(
        EsQueryDsl.filterColumn(f, idCol, requireText), lit(false)))
    }
    require(!docs.columns.exists(Set("_knn_q", "_knn_cos", "rank")),
      "knn needs the _knn_q/_knn_cos/rank column names free — rename " +
        "the clashing column(s)")
    // cosine rounded to 6 dp BEFORE ranking — the ANN family's
    // cross-engine determinism rule (a last-ulp engine difference must
    // not flip the rank-k boundary)
    val scored = base
      .withColumn("_knn_q", lit(0))
      .withColumn("_knn_cos", round(
        graft.plans.VectorExpressions.cosine(col(field), typedLit(qv)), 6))
    graft.operators.Similarity
      .rankTopKPerQuery(scored, k, "_knn_q", idCol, "_knn_cos")
      .withColumn("_score",
        round(lit(boost) * (lit(1.0) + col("_knn_cos")) / 2.0, 6))
      .drop("_knn_q", "_knn_cos", "rank")
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
    // a clause whose query analyzed to zero terms matches nothing and
    // its stat columns are never referenced (compile's empty-match
    // arm) — drop it before generating per-group cells
    val live = cs.filter(_.groups.nonEmpty)
    if (live.isEmpty) return docs.select(col(idCol)).limit(0)
    val allTerms = live.flatMap(_.terms).distinct
    // ONE tokenize pass for the whole clause set (r18; guide §1.2
    // "don't compute twice", §2.3 "shuffle keys/metadata, not
    // payloads"): every doc emits its matching-token occurrences —
    // plus exactly one (_t = null) row when none match — through ONE
    // (id, len, term) exchange, and the tf table, the term dfs AND
    // the corpus stats all derive from that exchange (runtime
    // exchange reuse). The previous shape re-tokenized the corpus for
    // the stats agg (a second full scan per field per query); the new
    // cost is one ~20 B (id, len) shuffle row per non-matching doc,
    // cheaper than re-reading the text at any scale.
    val emitted = docs
      .select(col(idCol), TextAnalysis.tokens(col(field)).as("_toks"))
      .select(col(idCol), size(col("_toks")).cast("double").as("_len"),
        col("_toks"))
      .select(col(idCol), col("_len"),
        explode_outer(filter(col("_toks"),
          t => t.isin(allTerms: _*))).as("_t"))
    val cells = emitted
      .groupBy(col(idCol), col("_len"), col("_t"))
      .agg(count(lit(1)).cast("double").as("_tf"))
    val tf = cells.filter(col("_t").isNotNull)
    // corpus stats (N, avg len) as a 1-row broadcast crossJoin INSIDE
    // the lazy plan — never an eager driver-side job: building a
    // scored frame runs nothing (spec-pinned), and a scored query pays
    // its corpus-stats pass when (and only when) it executes. Every
    // doc appears in `cells` (matched docs via their term rows, the
    // rest via their null row), so the doc-level distinct IS the
    // corpus — same N/avg as the old full-scan agg, from the shared
    // exchange. avg is null on an empty corpus — coalesce to 1.0
    // (the result is empty anyway).
    val stats = cells.select(col(idCol), col("_len")).distinct()
      .agg(count(lit(1)).cast("double").as("_n"),
        coalesce(avg(col("_len")), lit(1.0)).as("_avg"))
    val dfreq = tf.groupBy("_t")
      .agg(count_distinct(col(idCol)).cast("double").as("_df"))
    // (clause, group, term) triples — a group is a Lucene
    // SynonymQuery pseudo-term: per-doc tf SUMS over members, df
    // blends as the MAX of member dfs (SynonymQuery.docFreq), idf and
    // Okapi saturation apply ONCE per group. Singleton groups (every
    // clause when no synonyms are configured) reproduce the plain
    // per-term arithmetic expression-for-expression.
    val pairs = live.flatMap(c => c.groups.zipWithIndex.flatMap {
      case (g, gi) => g.map(t => (c.id, gi, t))
    }).toDF("_cid", "_gid", "_t")
    // per-(doc, clause, group) tf cells ride ONE doc-keyed
    // aggregation — the clause/group structure is static, so group
    // sums are conditional cells in the same pass, never a second
    // shuffle
    val tfCells: Seq[Column] = live.flatMap(c => c.groups.indices.map(gi =>
      sum(when(col("_cid") === c.id && col("_gid") === gi, col("_tf")))
        .as(s"_g${c.id}_${gi}_tf")))
    val perDoc = tf.join(broadcast(pairs), Seq("_t"))
      .groupBy(col(idCol))
      .agg(max(col("_len")).as("_len"), tfCells: _*)
    // blended group dfs: a 1-row broadcast (term dfs joined to the
    // static triples; a member absent from the corpus carries df 0)
    val dfCells: Seq[Column] = live.flatMap(c => c.groups.indices.map(gi =>
      coalesce(max(when(col("_cid") === c.id && col("_gid") === gi,
        col("_df"))), lit(0.0)).as(s"_g${c.id}_${gi}_df")))
    val gdf = pairs.join(dfreq, Seq("_t"), "left")
      .agg(dfCells.head, dfCells.tail: _*)
    val scored = perDoc.crossJoin(broadcast(gdf))
      .crossJoin(broadcast(stats))
    // a group's tf cell is null iff NO member occurred in the doc:
    // hits counts matched GROUPS (operator=and requires every query
    // position, however it was expanded)
    val outCols: Seq[Column] = live.flatMap { c =>
      val gs = c.groups.indices.map { gi =>
        val tfc = col(s"_g${c.id}_${gi}_tf")
        val dfc = col(s"_g${c.id}_${gi}_df")
        val idf = log(lit(1.0) +
          (col("_n") - dfc + 0.5) / (dfc + 0.5))
        val score = idf * tfc * (k1 + 1.0) /
          (tfc + lit(k1) *
            (lit(1.0) - b + lit(b) * col("_len") / col("_avg")))
        (when(tfc.isNotNull, score).otherwise(lit(0.0)),
          when(tfc.isNotNull, 1L).otherwise(0L))
      }
      Seq(gs.map(_._1).reduce(_ + _).as(s"_q${c.id}_score"),
        gs.map(_._2).reduce(_ + _).as(s"_q${c.id}_hits"))
    }
    scored.select(col(idCol) +: outCols: _*)
  }

  /** ES `rescore` — re-rank the TOP of the result list with a second
    * query (the cheap-retrieval / expensive-rerank pattern;
    * elasticsearch rescoring API, reached from eland via the raw
    * body passthrough). Matching rows come back with `_score`
    * replaced by the rescored number:
    *
    *  - the window is the GLOBAL top `windowSize` hits of `queryJson`
    *    by (6-dp score, id) — ES windows PER SHARD, which is
    *    engine-dependent by definition; the global cut is the
    *    deterministic semantics it approximates (documented delta,
    *    like `num_candidates`),
    *  - windowed docs matching `rescoreJson` combine
    *    queryWeight × base with rescoreWeight × rescore under
    *    `scoreMode` (total | multiply | avg | max | min — ES's five),
    *  - windowed docs NOT matching the rescore query keep
    *    queryWeight × base (Lucene QueryRescorer's non-match arm),
    *  - docs outside the window keep their ORIGINAL score untouched.
    *
    * Both legs are 6-dp-rounded scores and the combine re-rounds —
    * the hybrid-fusion rounding discipline, so engines agree at every
    * boundary. Scale shape: the window ranking is the two-phase
    * per-query top-k (no corpus-sized single-partition sort), the
    * rescore query runs over ONLY the windowed docs (a broadcast
    * semi-join), and both correction joins broadcast windowSize-sized
    * sides.
    */
  def rescoredFrame(docs: DataFrame, idCol: String, queryJson: String,
                    rescoreJson: String, windowSize: Int,
                    queryWeight: Double = 1.0,
                    rescoreWeight: Double = 1.0,
                    scoreMode: String = "total",
                    requireText: String => Unit = _ => (),
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(windowSize >= 1, s"windowSize must be >= 1, got $windowSize")
    require(Set("total", "multiply", "avg", "max", "min")(scoreMode),
      s"score_mode must be total|multiply|avg|max|min, got '$scoreMode'")
    val clash = Set("_rq", "rank", "_base_score", "_rescore", "_in_win")
    require(!docs.columns.exists(clash),
      s"rescore needs ${clash.mkString("/")} free — rename the " +
        "clashing column(s)")
    val base = scoredFrame(docs, idCol, queryJson, requireText, k1, b)
    val winIds = graft.operators.Similarity.rankTopKPerQuery(
        base.select(col(idCol), col("_score")).withColumn("_rq", lit(0)),
        windowSize, "_rq", idCol, "_score")
      .select(col(idCol))
    // the rescore leg scores against FULL-corpus statistics (df, N,
    // avg len are index-wide in Lucene's rescorer — restricting the
    // frame first would skew them to the window), then the window
    // semi-join keeps only the docs the rescore may touch; the scored
    // plan's own prefilter bounds the per-doc work
    val re = scoredFrame(docs, idCol, rescoreJson, requireText, k1, b)
      .select(col(idCol), col("_score").as("_rescore"))
      .join(broadcast(winIds), Seq(idCol), "left_semi")
    val p = lit(queryWeight) * col("_base_score")
    val s = lit(rescoreWeight) * col("_rescore")
    val combined = scoreMode match {
      case "total"    => p + s
      case "multiply" => p * s
      case "avg"      => (p + s) / 2.0
      case "max"      => greatest(p, s)
      case "min"      => least(p, s)
    }
    base.withColumnRenamed("_score", "_base_score")
      .join(broadcast(winIds.withColumn("_in_win", lit(true))),
        Seq(idCol), "left")
      .join(broadcast(re), Seq(idCol), "left")
      .withColumn("_score", round(
        when(col("_in_win").isNull, col("_base_score"))
          .when(col("_rescore").isNull, p)
          .otherwise(combined), 6))
      .drop("_base_score", "_in_win", "_rescore")
  }
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.api.Predicates

/** ES query-DSL JSON → Spark Column predicate — the Spark re-expression
  * of eland's `es_query` escape hatch (eland/dataframe.py:736-790: the
  * raw query dict is AND-merged into the frame's filter) and its filter
  * algebra (eland/filter.py:23-200: Bool/And/Or/Not, Term/Terms/Rlike/
  * Startswith/Wildcard/Exists/IsIn/Range/IsNull/NotNull).
  *
  * Supported query kinds — the portion of the DSL whose semantics are
  * engine-independent (leaf predicates + bool composition):
  *
  *  - `bool` with `must` / `filter` (AND), `should` (OR), `must_not`
  *    (AND NOT); each accepts one clause dict or a list
  *  - `term` / `terms` — exact value(s); `{"term": {"f": {"value": v}}}`
  *    and the short `{"term": {"f": v}}` forms both parse
  *  - `range` — gt/gte/lt/lte, AND-combined
  *  - `match` / `match_phrase` — analyzed text via [[EsMatch]]
  *    (`operator: "and"` honored for `match`)
  *  - `multi_match` — `match` across a fields list, any-field-matches
  *    (best_fields as a boolean predicate); `fuzzy` — term within
  *    Levenshtein `fuzziness` edits of a column token (AUTO = the ES
  *    length ladder). Both route through [[EsMatch]] — the JSON
  *    spelling of the F12 capability
  *    (eland passes arbitrary DSL straight through,
  *    eland/filter.py:182-185, eland/query_compiler.py:490-491)
  *  - `wildcard` (`*`/`?` → LIKE), `prefix`, `regexp`
  *  - `exists` — non-null field
  *  - `ids` — value list against the given id column
  *  - `geo_distance` / `geo_bounding_box` (incl. the antimeridian
  *    wrap) / `geo_polygon` / `geo_shape` (envelope + polygon,
  *    relations intersects/within/disjoint) — over a geo-point
  *    struct column ([[Geo]]); arc distance only
  *  - `nested` — same-element bool over an array of structs via a
  *    field-resolver higher-order exists (zero explode); composes
  *    with every leaf through the `resolve` hook
  *  - the closed span algebra: `span_near` (ordered n-way, unordered
  *    pairs), `span_or`, `span_first`, `span_not` — per-row position
  *    predicates over one tokenization
  *  - `intervals` — the spans successor: `match` (max_gaps/ordered),
  *    `prefix`, `any_of`, `all_of` over fixed-width blocks, with the
  *    closed existence reading (see the dispatch-site comment)
  *  - `terms_set`, `boosting`, `wrapper` (base64 → recurse),
  *    `constant_score`, `dis_max`, `match_all` / `match_none`
  *  - `query_string` / `simple_query_string` — the Lucene grammars,
  *    parsed by [[QueryStringParser]] onto the leaves above (both
  *    the predicate face here and the BM25-scored face in
  *    [[EsScoredQuery]])
  *
  * Aggregation-side clauses, script queries, and the remaining geo
  * shapes (geohash points, `distance_type: plane`, ...) are NOT
  * translatable to engine-independent semantics and raise
  * IllegalArgumentException — mirroring how running them against a
  * different backend would silently change meaning.
  */
object EsQueryDsl {

  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmt: Formats = DefaultFormats

  /** Parse an ES query-DSL JSON string into a Column predicate.
    * `idCol` resolves the `ids` query (ES `_id`); `requireText` is
    * invoked with every match/match_phrase field name so callers with a
    * capability matrix (GraftFrame.esQuery) can enforce the same
    * non-text guard as es_match.
    */
  /** ES terms-LOOKUP resolver: (index, id, path) → the values of
    * that document's array/scalar field. ES itself performs a GET
    * for the lookup document BEFORE the search executes — the
    * driver-side resolution here is the same two-step, not a
    * shortcut. See [[frameLookup]] for the frame-backed resolver.
    */
  type TermsLookup = (String, String, String) => Seq[Any]

  /** A [[TermsLookup]] over registered frames: `frames` maps the
    * lookup "index" name to (frame, id column). The path column may
    * be an array (flattened) or a scalar; a missing document yields
    * NO values (ES: the terms query then matches nothing). The
    * resolved list is capped like ES's `index.max_terms_count`
    * (65536) — a loud refusal, never a silent truncation.
    */
  def frameLookup(frames: Map[String, (DataFrame, String)])
      : TermsLookup = { (index, id, path) =>
    val (frame, idCol) = frames.getOrElse(index,
      throw new IllegalArgumentException(
        s"terms lookup: unknown index `$index` " +
          s"(have: ${frames.keys.toSeq.sorted.mkString(", ")})"))
    val rows = frame
      .filter(col(idCol).cast("string") === id)
      .select(col(path)).collect()
    require(rows.length <= 1,
      s"terms lookup: id `$id` matches ${rows.length} docs in " +
        s"`$index` — the lookup id must be unique")
    val values = rows.headOption.map(_.get(0)).toSeq.flatMap {
      case null => Nil
      case seq: scala.collection.Seq[_] => seq.toSeq
      case one => Seq(one)
    }
    require(values.size <= 65536,
      s"terms lookup resolved ${values.size} values — above ES's " +
        "index.max_terms_count (65536); narrow the lookup document")
    values
  }

  def toColumn(json: String, idCol: String = "_id",
               requireText: String => Unit = _ => (),
               synonyms: Seq[String] = Nil,
               termsLookup: Option[TermsLookup] = None): Column = {
    val ast = JsonMethods.parse(json)
    val syn = Synonyms.parse(synonyms)
    val q = if (syn.isEmpty) ast else rewriteSynonyms(ast, syn)
    fromJValue(q, idCol, requireText, col, termsLookup)
  }

  /** Search-time synonym rewrite for the FILTER face ([[Synonyms]]
    * rule sets). Filter-context group semantics are exactly
    * expressible in the DSL itself, so expansion is a pre-parse AST
    * rewrite, not a new evaluator:
    *
    *  - `match` with `operator: or` — any member of any group
    *    matches ⇒ the match text becomes the UNION of the expanded
    *    members;
    *  - `match` with `operator: and` — every query POSITION must be
    *    present via some member ⇒ a `bool.must` of per-group
    *    or-matches;
    *  - `multi_match` — per-field rewritten matches under
    *    `bool.should` (its any-field semantics).
    *
    * Clauses a rule TOUCHES refuse when the expansion would need
    * positional graph semantics this engine does not approximate:
    * `match_phrase` / prefix variants / `intervals` (Lucene models
    * these as graph positions), `fuzziness` on an affected clause
    * (ES's own fuzzy-vs-synonym-graph incompatibility), and
    * non-standard analyzers (rules fold through the standard chain).
    * Untouched clauses pass through byte-identical; `span_term` and
    * `term`/`terms` take RAW terms in ES (no analysis) and are never
    * rewritten.
    */
  private def rewriteSynonyms(q0: JValue,
                              syn: Map[String, Seq[String]]): JValue = {
    def touched(text: String): Boolean =
      TextAnalysis.tokensOf(text).exists(syn.contains)
    def groupsOf(text: String): Seq[Seq[String]] =
      TextAnalysis.tokensOf(text).distinct
        .map(t => syn.getOrElse(t, Seq(t))).distinct
    def textOf(v: JValue): String = v match {
      case JString(s) => s
      case o          => (o \ "query").extract[String]
    }
    def requirePlain(v: JValue, what: String): Unit = {
      require((v \ "fuzziness") == JNothing,
        s"$what: fuzziness composed with a synonym-affected clause " +
          "refuses (ES's fuzzy-vs-synonym_graph incompatibility)")
      require(parseAnalyzer(v) == "standard",
        s"$what: synonym rules fold through the standard analyzer; " +
          "a synonym-affected clause with another analyzer refuses")
    }
    def matchNode(field: String, text: String, op: String): JValue =
      if (op == "or")
        JObject(List("match" -> JObject(List(field ->
          JObject(List("query" ->
            JString(groupsOf(text).flatten.distinct.mkString(" "))))))))
      else
        JObject(List("bool" -> JObject(List("must" ->
          JArray(groupsOf(text).map(g =>
            JObject(List("match" -> JObject(List(field ->
              JObject(List("query" -> JString(g.mkString(" ")),
                "operator" -> JString("or")))))))).toList)))))
    // intervals rules nest match texts under all_of/any_of — collect
    // every positional "query"/"match" text to decide the refusal
    def intervalsTexts(v: JValue): Seq[String] = v match {
      case JObject(fields) => fields.flatMap {
        case ("match", body) => (body \ "query") match {
          case JString(s) => Seq(s)
          case _          => intervalsTexts(body)
        }
        case (_, body) => intervalsTexts(body)
      }
      case JArray(xs) => xs.flatMap(intervalsTexts)
      case _ => Nil
    }
    def armAsQueries(v: JValue): JValue = v match {
      case JArray(xs) => JArray(xs.map(rw))
      case single     => rw(single)
    }
    def rw(q: JValue): JValue = q match {
      case JObject(List(("bool", JObject(body)))) =>
        JObject(List("bool" -> JObject(body.map {
          case (k, v)
              if Set("must", "should", "filter", "must_not")(k) =>
            k -> armAsQueries(v)
          case kv => kv
        })))
      case JObject(List(("dis_max", JObject(body)))) =>
        JObject(List("dis_max" -> JObject(body.map {
          case ("queries", v) => "queries" -> armAsQueries(v)
          case kv             => kv
        })))
      case JObject(List(("constant_score", JObject(body)))) =>
        JObject(List("constant_score" -> JObject(body.map {
          case ("filter", v) => "filter" -> rw(v)
          case kv            => kv
        })))
      case JObject(List(("boosting", JObject(body)))) =>
        JObject(List("boosting" -> JObject(body.map {
          case (k, v) if k == "positive" || k == "negative" => k -> rw(v)
          case kv => kv
        })))
      case JObject(List(("nested", JObject(body)))) =>
        JObject(List("nested" -> JObject(body.map {
          case ("query", v) => "query" -> rw(v)
          case kv           => kv
        })))
      case JObject(List(("match", body))) =>
        val (field, v) = lonely(body, "match")
        val text = textOf(v)
        if (!touched(text)) q
        else {
          requirePlain(v, "match")
          val op = v match {
            case JString(_) => "or"
            case o => (o \ "operator").extractOrElse[String]("or")
          }
          matchNode(field, text, op)
        }
      case JObject(List(("multi_match", body))) =>
        val text = (body \ "query").extract[String]
        if (!touched(text)) q
        else {
          requirePlain(body, "multi_match")
          val fields = (body \ "fields") match {
            case JArray(fs) => fs.map(_.extract[String])
            case other => throw new IllegalArgumentException(
              s"multi_match needs a fields list, got $other")
          }
          val op = (body \ "operator").extractOrElse[String]("or")
          JObject(List("bool" -> JObject(List("should" ->
            JArray(fields.map(matchNode(_, text, op)).toList)))))
        }
      case JObject(List((k, body))) if Set("match_phrase",
          "match_phrase_prefix", "match_bool_prefix")(k) =>
        val (_, v) = lonely(body, k)
        require(!touched(textOf(v)),
          s"$k with synonym-affected terms refuses: phrase expansion " +
            "is a positional graph this engine does not approximate")
        q
      case JObject(List(("intervals", body))) =>
        require(!intervalsTexts(body).exists(touched),
          "intervals with synonym-affected match terms refuses: " +
            "positional graph expansion is not approximated")
        q
      case JObject(List(("wrapper", body))) =>
        // a wrapper's base64 payload decodes AFTER this pre-pass —
        // rewrite the decoded tree and re-encode, so synonyms cannot
        // silently skip a wrapped match
        (body \ "query") match {
          case JString(b64) =>
            val decoded = new String(
              java.util.Base64.getDecoder.decode(b64),
              java.nio.charset.StandardCharsets.UTF_8)
            val rewritten = rw(JsonMethods.parse(decoded))
            val re = java.util.Base64.getEncoder.encodeToString(
              JsonMethods.compact(JsonMethods.render(rewritten))
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            JObject(List("wrapper" ->
              JObject(List("query" -> JString(re)))))
          case _ => q // the evaluator's own shape error fires later
        }
      case other => other
    }
    rw(q0)
  }

  /** FILTER-context compilation of an already-parsed clause — the hook
    * [[EsScoredQuery]] uses for the subtrees ES itself evaluates
    * without scores (bool.filter, must_not, constant_score.filter).
    */
  private[functions] def filterColumn(q: JValue, idCol: String,
                                      requireText: String => Unit): Column =
    fromJValue(q, idCol, requireText, col)

  /** ES 7.10+ `case_insensitive` flag on term-level queries: when
    * true, BOTH sides lowercase (the ASCII/Unicode simple fold —
    * Lucene's automaton uses Character case folding; Java
    * toLowerCase matches it for the overwhelming practical range).
    */
  private def caseFlag(v: JValue): Boolean = (v \ "case_insensitive") match {
    case JBool(b) => b
    case JNothing => false
    case other => throw new IllegalArgumentException(
      s"case_insensitive must be a boolean, got $other")
  }

  private def lonely(obj: JValue, what: String): (String, JValue) =
    obj match {
      case JObject(List((k, v))) => (k, v)
      case JObject(fields) => throw new IllegalArgumentException(
        s"$what expects exactly one entry, got ${fields.map(_._1).mkString(",")}")
      case other => throw new IllegalArgumentException(s"$what: $other")
    }

  private def jvRaw(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     => i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case other => throw new IllegalArgumentException(s"unsupported literal: $other")
  }

  private[functions] def toLit(v: JValue): Column = lit(jvRaw(v))

  /** Optional per-term edit budget from a clause body's `fuzziness`
    * key: None = exact; AUTO = the ES length ladder (0-2 chars → 0
    * edits, 3-5 → 1, longer → 2) applied per query term; an integer
    * must be ≥ 0 (ES rejects negatives — accepting one here would turn
    * a typo into a silently-empty result).
    */
  private def parseFuzz(v: JValue): Option[String => Int] = {
    // validated EAGERLY at parse time (not inside the per-term lambda):
    // a clause whose query tokenizes to zero terms must still reject a
    // negative budget, and a BigInt must not silently truncate to Int
    def fixed(n: BigInt): Option[String => Int] = {
      if (n < 0 || n > Int.MaxValue) throw new IllegalArgumentException(
        s"fuzziness must be >= 0 and <= ${Int.MaxValue}, got $n")
      val e = n.toInt
      Some(_ => e)
    }
    (v \ "fuzziness") match {
      case JNothing => None
      case JString("AUTO") => Some(t =>
        if (t.length <= 2) 0 else if (t.length <= 5) 1 else 2)
      case JInt(n)  => fixed(n)
      case JLong(n) => fixed(BigInt(n))
      case other => throw new IllegalArgumentException(
        s"fuzziness '$other' has no engine-independent translation")
    }
  }

  /** Optional `analyzer` key of a match-family clause body: the
    * [[EnglishMinimalStem]] names ("standard" default); anything else
    * refuses — silently dropping an analyzer the user asked for would
    * change the result set without a sound.
    */
  private def parseAnalyzer(v: JValue): String = (v \ "analyzer") match {
    case JNothing => "standard"
    case JString(a) => EnglishMinimalStem.requireKnown(a); a
    case other => throw new IllegalArgumentException(
      s"analyzer must be a string, got $other")
  }

  /** `boosting.negative_boost` — REQUIRED by ES, a float in [0, 1]. */
  private[functions] def negativeBoostOf(body: JValue): Double = {
    val nb = (body \ "negative_boost") match {
      case JDouble(d)  => d
      case JDecimal(d) => d.toDouble
      case JInt(n)     => n.toDouble
      case JLong(n)    => n.toDouble
      case JNothing => throw new IllegalArgumentException(
        "boosting needs negative_boost (ES requires it)")
      case other => throw new IllegalArgumentException(
        s"negative_boost must be a number, got $other")
    }
    require(nb >= 0.0 && nb <= 1.0,
      s"negative_boost must be in [0, 1], got $nb")
    nb
  }

  /** One field's `match` semantics with an optional edit budget:
    * per-term predicates (exact token containment, or Levenshtein ≤
    * budget via [[EsMatch.matchFuzzy]]) folded by the operator — AND
    * requires every term to hit, OR any. Analysis (lowercase + the
    * optional stem) runs before the edit distance, ES's order.
    */
  private def matchWithFuzz(field: Column, text: String, op: String,
                            fuzz: Option[String => Int],
                            analyzer: String): Column =
    fuzz match {
      case None =>
        if (op == "and") EsMatch.matchAll(field, text, analyzer)
        else EsMatch.matchAny(field, text, analyzer)
      case Some(edits) =>
        val terms = TextAnalysis.tokensOf(text)
          .map(EnglishMinimalStem.analyzeTerm(analyzer, _))
        val per = terms.map(t =>
          EsMatch.matchFuzzy(field, t, edits(t), analyzer))
        if (per.isEmpty) lit(false)
        else if (op == "and") per.reduce(_ && _) else per.reduce(_ || _)
    }

  /** ES geo-point literal → (lat, lon): object {lat, lon}, string
    * "lat,lon", or array [lon, lat] (GeoJSON order — ES's array form).
    * Geohash strings are an ES-internal encoding and refuse.
    */
  private[functions] def parseGeoPoint(v: JValue,
                                       what: String): (Double, Double) = {
    def num(x: JValue, k: String): Double = x match {
      case JInt(n)     => n.toDouble
      case JLong(n)    => n.toDouble
      case JDouble(d)  => d
      case JDecimal(d) => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$what: $k must be a number, got $other")
    }
    v match {
      case o @ JObject(_) =>
        (num(o \ "lat", "lat"), num(o \ "lon", "lon"))
      case JArray(List(lonJ, latJ)) => // GeoJSON order: [lon, lat]
        (num(latJ, "lat"), num(lonJ, "lon"))
      case JString(s) if s.contains(",") =>
        val parts = s.split(",").map(_.trim)
        require(parts.length == 2, s"$what: cannot parse point '$s'")
        (parts(0).toDouble, parts(1).toDouble) // "lat,lon" order
      case other => throw new IllegalArgumentException(
        s"$what: geo point '$other' has no engine-independent " +
          "translation (object {lat, lon}, \"lat,lon\", or [lon, lat])")
    }
  }

  /** Shared clause-body plumbing for `query_string` /
    * `simple_query_string` (both faces): (query text, fields,
    * default_operator). Field entries may carry ES boosts
    * ("text^3") — boosts are score-only; the scored face reapplies
    * them, the filter face drops them.
    */
  private[functions] def queryStringArgs(kind: String, body: JValue)
      : (String, Seq[String], String) = {
    val qtext = (body \ "query") match {
      case JString(t) => t
      case other => throw new IllegalArgumentException(
        s"$kind needs a query string, got $other")
    }
    def stripBoost(f: String): String = {
      val cut = f.indexOf('^')
      val name = if (cut < 0) f else f.substring(0, cut)
      require(!name.contains("*"),
        s"$kind field pattern '$f' needs schema enumeration — " +
          "list the fields explicitly")
      name
    }
    val fields: Seq[String] =
      ((body \ "fields"), (body \ "default_field")) match {
        case (JArray(fs), JNothing) => fs.map {
          case JString(f) => stripBoost(f)
          case other => throw new IllegalArgumentException(
            s"$kind fields must be strings, got $other")
        }
        case (JNothing, JString(f)) => Seq(stripBoost(f))
        case (JNothing, JNothing)   => Nil
        case _ => throw new IllegalArgumentException(
          s"$kind takes fields OR default_field, not both")
      }
    val op = (body \ "default_operator") match {
      case JNothing   => "or"
      case JString(o) => o
      case other => throw new IllegalArgumentException(
        s"default_operator must be a string, got $other")
    }
    (qtext, fields, op)
  }

  /** A width-1 span clause — `span_term`, or `span_or` over width-1
    * span clauses — flattened to (field, distinct lowercased terms).
    * These are the position-SET primitives of the span algebra: their
    * match positions are a flat set of token indices, which is what
    * gives `span_or` / `span_first` / `span_not` closed per-row
    * predicates (multi-position spans — a span_near inside a
    * span_not — would need Lucene's span iterator protocol and
    * refuse).
    */
  private def spanTermSet(c: JValue, what: String): (String, Seq[String]) = {
    val (kind, b) = lonely(c, what)
    kind match {
      case "span_term" =>
        val (field, v) = lonely(b, "span_term")
        val term = v match {
          case JString(s0) => s0
          case o => (o \ "value") match {
            case JString(s0) => s0
            case other => throw new IllegalArgumentException(
              s"span_term value must be a string, got $other")
          }
        }
        (field, Seq(term.toLowerCase(java.util.Locale.ROOT)))
      case "span_or" =>
        val inner = (b \ "clauses") match {
          case JArray(cs) if cs.nonEmpty => cs
          case other => throw new IllegalArgumentException(
            s"span_or needs a non-empty clauses array, got $other")
        }
        val parts = inner.map(spanTermSet(_, "span_or clause"))
        val field = parts.map(_._1).distinct match {
          case Seq(one) => one
          case many => throw new IllegalArgumentException(
            s"span_or clauses must share one field, got " +
              many.mkString(", "))
        }
        (field, parts.flatMap(_._2).distinct)
      case other => throw new IllegalArgumentException(
        s"$what supports span_term / span_or-of-span_term only, " +
          s"got $other (multi-position spans need Lucene's span " +
          "iterator protocol — no closed per-row predicate)")
    }
  }

  // ---- `intervals` helpers --------------------------------------

  private def ivInt(body: JValue, k: String, default: Int): Int =
    (body \ k) match {
      case JInt(n)  => n.toInt
      case JLong(n) => n.toInt
      case JNothing => default
      case other => throw new IllegalArgumentException(
        s"intervals $k must be an integer, got $other")
    }

  private def ivBool(body: JValue, k: String, default: Boolean): Boolean =
    (body \ k) match {
      case JBool(b) => b
      case JNothing => default
      case other => throw new IllegalArgumentException(
        s"intervals $k must be a boolean, got $other")
    }

  private def ivSubRules(body: JValue, what: String): Seq[JValue] =
    (body \ "intervals") match {
      case JArray(rs) if rs.nonEmpty => rs
      case other => throw new IllegalArgumentException(
        s"intervals $what needs a non-empty intervals array, got $other")
    }

  private def ivMatchTerms(body: JValue): Seq[String] =
    (body \ "query") match {
      case JString(q) =>
        val ts = TextAnalysis.tokensOf(q)
        require(ts.nonEmpty,
          "intervals match needs a non-empty query after analysis")
        ts
      case other => throw new IllegalArgumentException(
        s"intervals match needs a query string, got $other")
    }

  /** One `intervals` rule as a closed EXISTENCE predicate over the
    * bound token array (caller guarantees size > 0 — the top-level
    * dispatch guards it, so the sequence bounds below are safe).
    * Unsupported rules refuse with the reason; see the dispatch-site
    * comment for the supported algebra.
    */
  private def intervalsRule(rule: JValue, toks: Column): Column = {
    val (kind, body) = lonely(rule, "intervals rule")
    val n = size(toks)
    def posOf(t: String): Column =
      filter(sequence(lit(0), n - 1), p =>
        element_at(toks, (p + 1).cast("int")) === lit(t))
    kind match {
      case "match" =>
        val terms = ivMatchTerms(body)
        val maxGaps = ivInt(body, "max_gaps", -1)
        val ordered = ivBool(body, "ordered", default = false)
        if (terms.size == 1) array_contains(toks, terms.head)
        else if (!ordered && maxGaps < 0)
          // unordered + unbounded = plain conjunction; skip the
          // position enumeration entirely
          terms.distinct.map(array_contains(toks, _)).reduce(_ && _)
        else if (ordered) {
          val k = terms.size
          def chain(i: Int, prev: Column, first: Column): Column =
            if (i == k) {
              if (maxGaps < 0) lit(true)
              else (prev - first) <= lit(k - 1 + maxGaps)
            } else exists(posOf(terms(i)), p =>
              p > prev && chain(i + 1, p, first))
          exists(posOf(terms.head), p0 => chain(1, p0, p0))
        } else {
          require(terms.distinct.size == terms.size,
            "unordered intervals match with REPEATED terms would " +
              "need Lucene's overlap bookkeeping — use ordered, or " +
              "distinct terms")
          val k = terms.size
          def chain(i: Int, mn: Column, mx: Column): Column =
            if (i == k) (mx - mn) <= lit(k - 1 + maxGaps)
            else exists(posOf(terms(i)), p =>
              chain(i + 1, least(mn, p), greatest(mx, p)))
          exists(posOf(terms.head), p0 => chain(1, p0, p0))
        }
      case "prefix" =>
        (body \ "prefix") match {
          case JString(s) =>
            val p = s.toLowerCase(java.util.Locale.ROOT)
            exists(toks, t => t.startsWith(p))
          case other => throw new IllegalArgumentException(
            s"intervals prefix needs a string prefix, got $other")
        }
      case "any_of" =>
        ivSubRules(body, "any_of").map(intervalsRule(_, toks))
          .reduce(_ || _)
      case "all_of" =>
        val subs = ivSubRules(body, "all_of")
        val maxGaps = ivInt(body, "max_gaps", -1)
        val ordered = ivBool(body, "ordered", default = false)
        val blocks = subs.map(ivBlock(_, toks))
        if (blocks.size == 1) size(blocks.head._1) > 0
        else if (ordered) {
          val k = blocks.size
          val totalW = blocks.map(_._2).sum
          def chain(i: Int, prevEnd: Column, first: Column): Column =
            if (i == k) {
              if (maxGaps < 0) lit(true)
              else (prevEnd - first + 1 - totalW) <= lit(maxGaps)
            } else {
              val (starts, w) = blocks(i)
              exists(starts, s =>
                s > prevEnd && chain(i + 1, s + lit(w - 1), first))
            }
          val (s0, w0) = blocks.head
          exists(s0, s => chain(1, s + lit(w0 - 1), s))
        } else {
          require(blocks.size == 2,
            "unordered all_of is supported for exactly two blocks " +
              "(n-way unordered non-overlap has no closed predicate " +
              "— Lucene's matcher is a retrying heap)")
          val Seq((sa, wa), (sb, wb)) = blocks
          exists(sa, p1 => exists(sb, p2 => {
            val e1 = p1 + lit(wa - 1)
            val e2 = p2 + lit(wb - 1)
            val noOverlap = (e1 < p2) || (e2 < p1)
            val tight =
              if (maxGaps < 0) lit(true)
              else (greatest(e1, e2) - least(p1, p2) + 1 -
                lit(wa + wb)) <= lit(maxGaps)
            noOverlap && tight
          }))
        }
      case "fuzzy" | "wildcard" =>
        throw new IllegalArgumentException(
          s"intervals rule '$kind' needs Lucene's term-expansion " +
            s"iterators and has no engine-independent translation — " +
            s"use the standalone $kind query")
      case "filter" =>
        throw new IllegalArgumentException(
          "intervals 'filter' (containing / not_containing / ...) " +
            "depends on Lucene's minimal-interval iteration and has " +
            "no engine-independent translation")
      case other => throw new IllegalArgumentException(
        s"unknown intervals rule '$other'")
    }
  }

  /** A FIXED-WIDTH `all_of` block: (0-based start-position array,
    * width). Phrases (`ordered: true, max_gaps: 0` match), single
    * terms, and prefixes qualify — their extent is start + width − 1.
    * A gappy or unordered sub-match has no fixed extent (its
    * minimal-interval extents are exactly what Lucene's protocol
    * iterates) and refuses.
    */
  private def ivBlock(rule: JValue, toks: Column): (Column, Int) = {
    val (kind, body) = lonely(rule, "all_of block")
    val n = size(toks)
    def termStarts(t: String): Column =
      filter(sequence(lit(0), n - 1), p =>
        element_at(toks, (p + 1).cast("int")) === lit(t))
    kind match {
      case "match" =>
        val terms = ivMatchTerms(body)
        if (terms.size > 1)
          require(ivBool(body, "ordered", default = false) &&
            ivInt(body, "max_gaps", -1) == 0,
            "an all_of sub-match must be FIXED-WIDTH — a phrase " +
              "(ordered: true, max_gaps: 0) or a single term; gappy " +
              "sub-intervals would need Lucene's minimization protocol")
        val w = terms.size
        if (w == 1) (termStarts(terms.head), 1)
        else {
          // a doc shorter than the phrase hosts no starts — guard the
          // sequence bound (sequence(0, negative) DESCENDS)
          val starts = when(n >= w,
            filter(sequence(lit(0), n - lit(w)), p =>
              terms.zipWithIndex.map { case (t, j) =>
                element_at(toks, (p + 1 + j).cast("int")) === lit(t)
              }.reduce(_ && _)))
            .otherwise(array().cast("array<int>"))
          (starts, w)
        }
      case "prefix" =>
        (body \ "prefix") match {
          case JString(s) =>
            val p = s.toLowerCase(java.util.Locale.ROOT)
            (filter(sequence(lit(0), n - 1), i =>
              element_at(toks, (i + 1).cast("int")).startsWith(p)), 1)
          case other => throw new IllegalArgumentException(
            s"intervals prefix needs a string prefix, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"all_of block '$other' is not a fixed-width interval source " +
          "(supported: match phrases/terms, prefix)")
    }
  }

  private def clauses(v: JValue, idCol: String,
                      requireText: String => Unit,
                      resolve: String => Column,
                      lookup: Option[TermsLookup] = None): Seq[Column] =
    v match {
      case JArray(items) =>
        items.map(fromJValue(_, idCol, requireText, resolve, lookup))
      case JNothing => Nil
      case one =>
        Seq(fromJValue(one, idCol, requireText, resolve, lookup))
    }

  /** `resolve` maps a DSL field name to its Column — `col` at the top
    * level; inside a `nested` clause it rebinds `path.*` names to the
    * CURRENT array element so every clause of the inner bool matches
    * the SAME element (ES's nested semantics — a flattened AND would
    * silently over-match across elements).
    */
  private def fromJValue(q: JValue, idCol: String,
                         requireText: String => Unit,
                         resolve: String => Column,
                         lookup: Option[TermsLookup] = None): Column = {
    val (kind, body) = lonely(q, "query")
    kind match {
      case "match_all"  => lit(true)
      case "match_none" => lit(false)
      // scoring-only wrappers: on a boolean predicate engine,
      // constant_score is exactly its filter, and dis_max (best of N
      // scores) matches iff ANY branch matches
      case "constant_score" =>
        (body \ "filter") match {
          case JNothing => throw new IllegalArgumentException(
            "constant_score needs a filter clause " +
              "(the legacy {\"constant_score\": {\"query\": ...}} " +
              "spelling is not supported)")
          case f => fromJValue(f, idCol, requireText, resolve, lookup)
        }
      case "dis_max" =>
        (body \ "queries") match {
          case JArray(qs) if qs.nonEmpty =>
            qs.map(fromJValue(_, idCol, requireText, resolve, lookup)).reduce(_ || _)
          case other => throw new IllegalArgumentException(
            s"dis_max needs a non-empty queries list, got $other")
        }
      case "bool" =>
        val must    = clauses(body \ "must", idCol, requireText, resolve, lookup) ++
          clauses(body \ "filter", idCol, requireText, resolve, lookup)
        val should  = clauses(body \ "should", idCol, requireText, resolve, lookup)
        val mustNot = clauses(body \ "must_not", idCol, requireText, resolve, lookup)
        // ES minimum_should_match default: 1 when the bool has should
        // clauses and NO must/filter, else 0 — i.e. with must present,
        // bare should clauses only affect scoring, not matching.
        // Integer counts only: percentage/combination forms have no
        // engine-independent translation here and must raise, not be
        // silently replaced by the default.
        val msm = (body \ "minimum_should_match") match {
          case JNothing => if (must.isEmpty) 1 else 0
          case JInt(n)  => n.toInt
          case JLong(n) => n.toInt
          case JString(s) if s.matches("-?\\d+") => s.toInt
          case other => throw new IllegalArgumentException(
            s"minimum_should_match '$other' has no engine-independent translation")
        }
        val shouldPred: Seq[Column] =
          if (should.isEmpty || msm <= 0) Nil
          else if (msm == 1) Seq(should.reduce(_ || _))
          else Seq(should.map(c => when(c, 1).otherwise(0)).reduce(_ + _) >= msm)
        // must_not keeps docs the clause does NOT match — in ES a doc
        // with the field missing doesn't match a term query and so
        // survives must_not; three-valued NOT(null) would drop it
        val parts =
          (if (must.nonEmpty) Seq(must.reduce(_ && _)) else Nil) ++
            shouldPred ++ mustNot.map(c => !coalesce(c, lit(false)))
        if (parts.isEmpty) lit(true) else parts.reduce(_ && _)
      // `span_near` over `span_term` clauses — the Lucene span-algebra
      // subset with an engine-independent reading: positions p₁…pₙ of
      // the clause terms (one DISTINCT position each) such that
      // in_order ⇒ p₁ < p₂ < … < pₙ, and the span is tight enough:
      // (max − min + 1 − n) ≤ slop (Lucene's "positions in between").
      // Ordered supports any clause count (nested exists over the
      // per-term position arrays, one tokenization); unordered is
      // bounded at TWO distinct terms (beyond that Lucene's
      // NearSpansUnordered is a sliding heap with retry semantics no
      // closed predicate reproduces). Scoring is Lucene-internal →
      // filter face only (the scored face falls through to
      // constant_score like the other gate-only leaves).
      case "span_near" =>
        val clauses0 = (body \ "clauses") match {
          case JArray(cs) if cs.nonEmpty => cs
          case other => throw new IllegalArgumentException(
            s"span_near needs a non-empty clauses array, got $other")
        }
        val slop = (body \ "slop") match {
          case JInt(n)  => n.toInt
          case JLong(n) => n.toInt
          case JNothing => throw new IllegalArgumentException(
            "span_near needs a slop (ES requires it)")
          case other => throw new IllegalArgumentException(
            s"span_near slop must be an integer, got $other")
        }
        require(slop >= 0, s"slop must be >= 0, got $slop")
        val inOrder = (body \ "in_order") match {
          case JBool(b) => b
          case JNothing => false // ES's default
          case other => throw new IllegalArgumentException(
            s"in_order must be a boolean, got $other")
        }
        val fieldTerms = clauses0.map { c =>
          val (kind, b) = lonely(c, "span_near clause")
          require(kind == "span_term",
            s"span_near supports span_term clauses only, got $kind")
          val (field, v) = lonely(b, "span_term")
          val term = v match {
            case JString(s0) => s0
            case o => (o \ "value") match {
              case JString(s0) => s0
              case other => throw new IllegalArgumentException(
                s"span_term value must be a string, got $other")
            }
          }
          (field, term.toLowerCase(java.util.Locale.ROOT))
        }
        val field = fieldTerms.map(_._1).distinct match {
          case Seq(one) => one
          case many => throw new IllegalArgumentException(
            s"span_near clauses must share one field, got " +
              many.mkString(", "))
        }
        requireText(field)
        val terms = fieldTerms.map(_._2)
        require(inOrder || terms.size == 2,
          "unordered span_near is supported for exactly two clauses " +
            "(Lucene's unordered n-way matcher has no closed predicate)")
        require(inOrder || terms.distinct.size == 2,
          "unordered span_near needs two DISTINCT terms")
        import org.apache.spark.sql.functions._
        TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(field))) { toks =>
          val n = size(toks)
          def positionsOf(t: String): Column =
            filter(sequence(lit(0), n - 1), p =>
              element_at(toks, (p + 1).cast("int")) === lit(t))
          if (inOrder) {
            val k = terms.size
            // nested exists: p₁ from term 1's positions, each next
            // strictly after, the last within p₁ + (k − 1) + slop
            def chain(i: Int, prev: Column, first: Column): Column =
              if (i == k)
                (prev - first) <= lit(k - 1 + slop)
              else exists(positionsOf(terms(i)), p =>
                p > prev && chain(i + 1, p, first))
            n > 0 && exists(positionsOf(terms.head), p0 =>
              chain(1, p0, p0))
          } else {
            val Seq(a, b) = terms
            n > 0 && exists(positionsOf(a), pa =>
              exists(positionsOf(b), pb =>
                pa =!= pb &&
                  abs(pa - pb) <= lit(1 + slop)))
          }
        }
      case "span_containing" | "span_within" =>
        // {"span_containing"|"span_within": {"little": <span>,
        //  "big": <span>}} — a DOC matches iff some big span encloses
        // some little position. The two kinds differ only in WHICH
        // span they hand to an ENCLOSING span clause (big vs little);
        // nesting them inside other spans refuses here (the span
        // algebra's closed-subset rule), so the filter-face match set
        // is common to both and Lucene-exact.
        def sub(key: String): JValue = (body \ key) match {
          case JNothing => throw new IllegalArgumentException(
            s"$kind needs a `$key` span")
          case x => x
        }
        val (lf, littleTerms) = spanTermSet(sub("little"),
          s"$kind little")
        val (bigKind, bigBody) = lonely(sub("big"), s"$kind big")
        def littlePos(toks: Column): Column =
          filter(sequence(lit(0), size(toks) - 1), p =>
            element_at(toks, (p + 1).cast("int"))
              .isin(littleTerms: _*))
        bigKind match {
          case "span_term" | "span_or" =>
            // width-1 big: containment degenerates to position
            // identity — the token must be a little AND a big term
            val (bf, bigTerms) = spanTermSet(sub("big"), s"$kind big")
            require(bf == lf,
              s"$kind little/big must share one field, got $lf vs $bf")
            requireText(lf)
            TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(lf))) {
              toks =>
                size(toks) > 0 && exists(littlePos(toks), p =>
                  element_at(toks, (p + 1).cast("int"))
                    .isin(bigTerms: _*))
            }
          case "span_near" =>
            val clauses0 = (bigBody \ "clauses") match {
              case JArray(cs) if cs.nonEmpty => cs
              case other => throw new IllegalArgumentException(
                s"$kind big span_near needs clauses, got $other")
            }
            val slop = (bigBody \ "slop") match {
              case JInt(n)  => n.toInt
              case JLong(n) => n.toInt
              case other => throw new IllegalArgumentException(
                s"$kind big span_near needs an integer slop, got $other")
            }
            require(slop >= 0, s"slop must be >= 0, got $slop")
            val inOrder = (bigBody \ "in_order") match {
              case JBool(bb) => bb
              case JNothing  => false
              case other => throw new IllegalArgumentException(
                s"in_order must be a boolean, got $other")
            }
            val fieldTerms = clauses0.map(c =>
              spanTermSet(c, s"$kind big clause") match {
                case (f0, Seq(one)) => (f0, one)
                case (_, many) => throw new IllegalArgumentException(
                  s"$kind big span_near clauses must be single " +
                    s"span_terms, got $many")
              })
            val bf = (fieldTerms.map(_._1).distinct :+ lf).distinct match {
              case Seq(one) => one
              case many => throw new IllegalArgumentException(
                s"$kind little/big must share one field, got " +
                  many.mkString(", "))
            }
            requireText(bf)
            val terms = fieldTerms.map(_._2)
            require(inOrder || terms.size == 2,
              "unordered big span_near is supported for exactly two " +
                "clauses (the span_near rule)")
            require(inOrder || terms.distinct.size == 2,
              "unordered big span_near needs two DISTINCT terms")
            TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(bf))) {
              toks =>
                val n = size(toks)
                def positionsOf(t: String): Column =
                  filter(sequence(lit(0), n - 1), p =>
                    element_at(toks, (p + 1).cast("int")) === lit(t))
                if (inOrder) {
                  val k = terms.size
                  def chain(i: Int, prev: Column, first: Column,
                            p: Column): Column =
                    if (i == k)
                      (prev - first) <= lit(k - 1 + slop) &&
                        first <= p && prev >= p
                    else exists(positionsOf(terms(i)), q =>
                      q > prev && chain(i + 1, q, first, p))
                  n > 0 && exists(littlePos(toks), p =>
                    exists(positionsOf(terms.head), p0 =>
                      chain(1, p0, p0, p)))
                } else {
                  val Seq(a, b2) = terms
                  n > 0 && exists(littlePos(toks), p =>
                    exists(positionsOf(a), pa =>
                      exists(positionsOf(b2), pb =>
                        pa =!= pb && abs(pa - pb) <= lit(1 + slop) &&
                          least(pa, pb) <= p && greatest(pa, pb) >= p)))
                }
            }
          case other => throw new IllegalArgumentException(
            s"$kind big supports span_term / span_or / span_near of " +
              s"span_terms, got $other (deeper span nesting needs " +
              "Lucene's span iterator protocol)")
        }
      // Lucene query-syntax faces — the parsers live in
      // [[QueryStringParser]]; this is pure clause-body plumbing
      case "query_string" | "simple_query_string" =>
        val (qtext, fields, op) = queryStringArgs(kind, body)
        val an = parseAnalyzer(body)
        if (kind == "query_string")
          QueryStringParser.queryString(qtext, fields, op, an,
            resolve, requireText)
        else
          QueryStringParser.simpleQueryString(qtext, fields, op, an,
            resolve, requireText)
      // `span_or`: union of the clause span sets — over width-1 spans
      // the doc matches iff ANY of the flattened terms occurs.
      case "span_or" =>
        val (field, terms) = spanTermSet(q, "span_or")
        requireText(field)
        TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(field))) { toks =>
          terms.map(t => array_contains(toks, t)).reduce(_ || _)
        }
      // `span_first`: the inner span must END at position <= end —
      // for a width-1 span at token index p (0-based), the Lucene
      // span end is p + 1, so the predicate is p + 1 <= end ⇔
      // p < end. {"span_first": {"match": <span>, "end": n}}.
      case "span_first" =>
        val m = (body \ "match") match {
          case JNothing => throw new IllegalArgumentException(
            "span_first needs a match clause")
          case x => x
        }
        val end = (body \ "end") match {
          case JInt(n)  => n.toInt
          case JLong(n) => n.toInt
          case JNothing => throw new IllegalArgumentException(
            "span_first needs an end position (ES requires it)")
          case other => throw new IllegalArgumentException(
            s"span_first end must be an integer, got $other")
        }
        require(end >= 1, s"span_first end must be >= 1, got $end")
        val (field, terms) = spanTermSet(m, "span_first match")
        requireText(field)
        TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(field))) { toks =>
          // only the first `end` tokens can host a qualifying span —
          // slice instead of enumerating every position
          val head = slice(toks, 1, end)
          terms.map(t => array_contains(head, t)).reduce(_ || _)
        }
      // `span_not`: some include-span position pa with NO exclude
      // position pb inside [pa - pre, pa + post] (width-1 overlap
      // window; ES's `dist` sets both pre and post).
      case "span_not" =>
        val incl = (body \ "include") match {
          case JNothing => throw new IllegalArgumentException(
            "span_not needs an include clause")
          case x => x
        }
        val excl = (body \ "exclude") match {
          case JNothing => throw new IllegalArgumentException(
            "span_not needs an exclude clause")
          case x => x
        }
        def intOf(k: String, default: Int): Int = (body \ k) match {
          case JInt(n)  => n.toInt
          case JLong(n) => n.toInt
          case JNothing => default
          case other => throw new IllegalArgumentException(
            s"span_not $k must be an integer, got $other")
        }
        val dist = intOf("dist", 0)
        val pre = intOf("pre", dist)
        val post = intOf("post", dist)
        require(pre >= 0 && post >= 0,
          s"span_not pre/post must be >= 0, got pre=$pre post=$post")
        val (fi, inclTerms) = spanTermSet(incl, "span_not include")
        val (fe, exclTerms) = spanTermSet(excl, "span_not exclude")
        require(fi == fe,
          s"span_not include/exclude must share one field, got $fi, $fe")
        requireText(fi)
        TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(fi))) { toks =>
          val n = size(toks)
          def positionsOf(ts: Seq[String]): Column =
            filter(sequence(lit(0), n - 1), p =>
              ts.map(t => element_at(toks, (p + 1).cast("int")) === lit(t))
                .reduce(_ || _))
          n > 0 && exists(positionsOf(inclTerms), pa =>
            !exists(positionsOf(exclTerms), pb =>
              pb >= pa - lit(pre) && pb <= pa + lit(post)))
        }
      // ES `intervals` — the modern replacement for the span algebra
      // (the ES docs steer users from spans to intervals). Closed
      // EXISTENCE reading over ONE tokenization: the document matches
      // iff at least one qualifying interval exists; Lucene's
      // minimal-interval iteration changes which intervals are
      // REPORTED (scoring, the filter combinators) but never whether
      // one exists — shrinking an interval cannot raise its gap count
      // — so existence is the engine-independent core. Supported:
      //  - match {query, max_gaps (-1 = unbounded, ES default),
      //    ordered (false default)}: analyzed positions p₁…pₖ,
      //    ordered ⇒ strictly increasing, tightness
      //    (max − min + 1 − k) ≤ max_gaps. Ordered takes any k;
      //    unordered needs DISTINCT terms (repeats would need
      //    Lucene's overlap bookkeeping — refused).
      //  - prefix — any token with the prefix (width-1 intervals)
      //  - any_of — union: OR of the branch predicates
      //  - all_of {intervals, max_gaps, ordered} — blocks must be
      //    FIXED-WIDTH (phrase / term / prefix); ordered ⇒ each
      //    block starts after the previous ends, tightness over the
      //    containing extent; unordered ⇒ exactly two blocks,
      //    non-overlapping (the span_near pair discipline)
      //  - fuzzy / wildcard / filter — refused loudly (term
      //    expansion / minimal-interval protocol)
      case "intervals" =>
        val (field, rule) = lonely(body, "intervals")
        requireText(field)
        TextAnalysis.bindOnce(TextAnalysis.tokens(resolve(field))) {
          toks => size(toks) > 0 && intervalsRule(rule, toks)
        }
      // predicate context: `boosting` matches exactly its positive
      // leg — the negative leg only down-weights the SCORE (the
      // scored face applies negative_boost); both legs and the boost
      // are still parsed/validated so a malformed query fails loudly
      // instead of silently matching
      // `wrapper`: a base64-encoded query — decode and recurse (ES
      // uses it to smuggle JSON through systems that mangle it)
      case "wrapper" =>
        val inner = (body \ "query") match {
          case JString(b64) => b64
          case other => throw new IllegalArgumentException(
            s"wrapper needs a base64 query string, got $other")
        }
        val decoded = new String(
          java.util.Base64.getDecoder.decode(inner),
          java.nio.charset.StandardCharsets.UTF_8)
        fromJValue(org.json4s.jackson.JsonMethods.parse(decoded),
          idCol, requireText, resolve, lookup)
      case "boosting" =>
        val pos = (body \ "positive") match {
          case JNothing => throw new IllegalArgumentException(
            "boosting needs a positive query")
          case p => fromJValue(p, idCol, requireText, resolve, lookup)
        }
        (body \ "negative") match {
          case JNothing => throw new IllegalArgumentException(
            "boosting needs a negative query")
          case nq => fromJValue(nq, idCol, requireText, resolve, lookup)
        }
        negativeBoostOf(body)
        pos
      // `terms_set`: at least minimum_should_match of the given terms
      // occur in the field's analyzed tokens; the required count comes
      // from a constant (`minimum_should_match`, ES 8.10+) or a
      // numeric column (`minimum_should_match_field`) — exactly one
      case "terms_set" =>
        val (field, v) = lonely(body, "terms_set")
        requireText(field)
        val terms = (v \ "terms") match {
          case JArray(ts) if ts.nonEmpty => ts.map {
            case JString(s) => s
            case other => throw new IllegalArgumentException(
              s"terms_set terms must be strings, got $other")
          }
          case other => throw new IllegalArgumentException(
            s"terms_set needs a non-empty terms array, got $other")
        }
        val msm: Column =
          ((v \ "minimum_should_match"), (v \ "minimum_should_match_field")) match {
            case (JInt(n), JNothing)  => lit(n.toInt)
            case (JLong(n), JNothing) => lit(n.toInt)
            case (JNothing, JString(f)) => resolve(f)
            case (JNothing, JNothing) => throw new IllegalArgumentException(
              "terms_set needs minimum_should_match (constant) or " +
                "minimum_should_match_field (numeric column) — " +
                "script forms have no engine-independent translation")
            case _ => throw new IllegalArgumentException(
              "terms_set takes exactly ONE of minimum_should_match / " +
                "minimum_should_match_field")
          }
        EsMatch.termsSetCount(resolve(field), terms,
          parseAnalyzer(v)) >= msm
      case "term" =>
        val (field, v) = lonely(body, "term")
        val value = v \ "value" match { case JNothing => v; case x => x }
        if (!caseFlag(v)) resolve(field) === toLit(value)
        else value match {
          case JString(sv) =>
            lower(resolve(field)) ===
              lit(sv.toLowerCase(java.util.Locale.ROOT))
          case other => throw new IllegalArgumentException(
            s"case_insensitive term needs a string value, got $other")
        }
      case "terms" =>
        val (field, v) = lonely(body, "terms")
        v match {
          case JArray(vs) => resolve(field).isin(vs.map(jvRaw): _*)
          // ES terms LOOKUP: {"terms": {f: {"index", "id", "path"}}}
          case JObject(_) if (v \ "index") != JNothing =>
            val lk = lookup.getOrElse(throw new IllegalArgumentException(
              "terms lookup needs a resolver — pass termsLookup = " +
                "Some(EsQueryDsl.frameLookup(...)) (ES GETs the " +
                "lookup document from the cluster; the engine has no " +
                "cluster to GET from)"))
            def sv(k: String): String = (v \ k) match {
              case JString(x) => x
              case JInt(x)    => x.toString
              case JLong(x)   => x.toString
              case other => throw new IllegalArgumentException(
                s"terms lookup `$k` must be a string/int, got $other")
            }
            val values = lk(sv("index"), sv("id"), sv("path"))
            if (values.isEmpty) lit(false)
            else resolve(field).isin(values: _*)
          case other      => throw new IllegalArgumentException(s"terms: $other")
        }
      case "range" =>
        val (field, v) = lonely(body, "range")
        val bounds = v.asInstanceOf[JObject].obj.collect {
          case ("gt", b)  => resolve(field) > toLit(b)
          case ("gte", b) => resolve(field) >= toLit(b)
          case ("lt", b)  => resolve(field) < toLit(b)
          case ("lte", b) => resolve(field) <= toLit(b)
        }
        require(bounds.nonEmpty, s"range on $field needs gt/gte/lt/lte")
        bounds.reduce(_ && _)
      case "match" =>
        val (field, v) = lonely(body, "match")
        requireText(field)
        val (text, op) = v match {
          case JString(s) => (s, "or")
          case o => ((o \ "query").extract[String],
            (o \ "operator").extractOrElse[String]("or"))
        }
        // optional fuzziness (eland es_match passes it through,
        // eland/query_compiler.py:419-488) and analyzer
        matchWithFuzz(resolve(field), text, op, parseFuzz(v),
          parseAnalyzer(v))
      case "match_phrase" =>
        val (field, v) = lonely(body, "match_phrase")
        requireText(field)
        val text = v match {
          case JString(s) => s
          case o          => (o \ "query").extract[String]
        }
        EsMatch.matchPhrase(resolve(field), text, parseAnalyzer(v))
      case "match_phrase_prefix" =>
        val (field, v) = lonely(body, "match_phrase_prefix")
        requireText(field)
        val text = v match {
          case JString(s) => s
          case o          => (o \ "query").extract[String]
        }
        EsMatch.matchPhrasePrefix(resolve(field), text, parseAnalyzer(v))
      case "match_bool_prefix" =>
        val (field, v) = lonely(body, "match_bool_prefix")
        requireText(field)
        val text = v match {
          case JString(s) => s
          case o          => (o \ "query").extract[String]
        }
        EsMatch.matchBoolPrefix(resolve(field), text, parseAnalyzer(v))
      case "multi_match" =>
        // {"multi_match": {"query": q, "fields": [f1, f2], "operator"?,
        // "fuzziness"?}} — best_fields semantics on a boolean
        // predicate: the doc matches if ANY listed field matches
        // (per-field semantics = `match`, honoring operator:and and
        // fuzziness within a field — dropping a present fuzziness
        // would silently change the result set)
        val text = (body \ "query").extract[String]
        val fields = (body \ "fields") match {
          case JArray(fs) => fs.map(_.extract[String])
          case other => throw new IllegalArgumentException(
            s"multi_match needs a fields list, got $other")
        }
        require(fields.nonEmpty, "multi_match needs at least one field")
        fields.foreach(requireText)
        val op = (body \ "operator").extractOrElse[String]("or")
        val fuzz = parseFuzz(body)
        val an = parseAnalyzer(body)
        fields.map(f => matchWithFuzz(resolve(f), text, op, fuzz, an))
          .reduce(_ || _)
      case "fuzzy" =>
        // {"fuzzy": {"f": {"value": v, "fuzziness"?: n|"AUTO"}}} (short
        // form {"fuzzy": {"f": v}} parses too). AUTO follows ES's
        // length ladder: 0-2 chars → 0 edits, 3-5 → 1, longer → 2.
        val (field, v) = lonely(body, "fuzzy")
        requireText(field)
        val term = v match {
          case JString(s) => s
          case o          => (o \ "value").extract[String]
        }
        val maxEdits = parseFuzz(v)
          .getOrElse((t: String) =>
            if (t.length <= 2) 0 else if (t.length <= 5) 1 else 2)
          .apply(term)
        EsMatch.matchFuzzy(resolve(field), term, maxEdits)
      case "wildcard" =>
        val (field, v) = lonely(body, "wildcard")
        val pat = v match {
          case JString(s) => s
          case o          => (o \ "value").extract[String]
        }
        if (caseFlag(v))
          lower(resolve(field)).like(Predicates.wildcardToLike(
            pat.toLowerCase(java.util.Locale.ROOT)))
        else resolve(field).like(Predicates.wildcardToLike(pat))
      case "prefix" =>
        val (field, v) = lonely(body, "prefix")
        val pre = v match {
          case JString(s) => s
          case o          => (o \ "value").extract[String]
        }
        if (caseFlag(v))
          lower(resolve(field)).startsWith(
            pre.toLowerCase(java.util.Locale.ROOT))
        else resolve(field).startsWith(pre)
      case "regexp" =>
        val (field, v) = lonely(body, "regexp")
        val re = v match {
          case JString(s) => s
          case o          => (o \ "value").extract[String]
        }
        // ES regexp is anchored; Spark rlike is substring-matching.
        // case_insensitive rides the (?i) embedded flag — Lucene's
        // automaton fold and Java's (?i)+UNICODE_CASE agree on the
        // practical range
        if (caseFlag(v)) resolve(field).rlike(s"(?i)^(?:$re)$$")
        else resolve(field).rlike(s"^(?:$re)$$")
      case "geo_distance" =>
        // {"geo_distance": {"distance": "200km", "<field>": origin}}
        // over a geo-point STRUCT column (lat/lon subfields); origin
        // accepts the ES object {lat, lon}, "lat,lon" string, and
        // [lon, lat] array spellings. Haversine on the mean-radius
        // sphere (Geo.haversineMeters) — ES's default arc distance;
        // distance_type "plane" is a different metric and refuses.
        (body \ "distance_type") match {
          case JNothing | JString("arc") => ()
          case other => throw new IllegalArgumentException(
            s"geo_distance distance_type $other has no " +
              "engine-independent translation (only \"arc\")")
        }
        val meters = (body \ "distance") match {
          case JString(s)  => Geo.parseDistanceMeters(s)
          case JInt(n)     => n.toDouble
          case JLong(n)    => n.toDouble
          case JDouble(d)  => d
          case JDecimal(d) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"geo_distance needs a distance, got $other")
        }
        require(meters >= 0, s"geo_distance: negative radius $meters")
        val fields = body match {
          case JObject(fs) => fs.filterNot { case (k, _) =>
            k == "distance" || k == "distance_type" }
          case other => throw new IllegalArgumentException(
            s"geo_distance: $other")
        }
        val (field, originJ) = fields match {
          case List(one) => one
          case many => throw new IllegalArgumentException(
            s"geo_distance expects exactly one field entry, got " +
              many.map(_._1).mkString(","))
        }
        val (oLat, oLon) = parseGeoPoint(originJ, s"geo_distance($field)")
        Geo.distanceToMeters(resolve(field), oLat, oLon) <= meters
      case "geo_bounding_box" =>
        // {"geo_bounding_box": {"<field>": {"top_left": pt,
        // "bottom_right": pt}}} — corners in any [[parseGeoPoint]]
        // spelling, or the flat top/left/bottom/right numeric keys.
        // left > right is ES's antimeridian-crossing box and splits
        // into two ranges OR'd together below.
        val (field, boxJ) = lonely(body, "geo_bounding_box")
        def num(x: JValue, k: String): Double = x match {
          case JInt(v)     => v.toDouble
          case JLong(v)    => v.toDouble
          case JDouble(v)  => v
          case JDecimal(v) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"geo_bounding_box($field).$k: $other")
        }
        val (top, left, bottom, right) =
          ((boxJ \ "top_left"), (boxJ \ "bottom_right")) match {
            case (JNothing, JNothing) =>
              (num(boxJ \ "top", "top"), num(boxJ \ "left", "left"),
                num(boxJ \ "bottom", "bottom"),
                num(boxJ \ "right", "right"))
            case (tl, br) =>
              val (tLat, tLon) =
                parseGeoPoint(tl, s"geo_bounding_box($field).top_left")
              val (bLat, bLon) = parseGeoPoint(br,
                s"geo_bounding_box($field).bottom_right")
              (tLat, tLon, bLat, bLon)
          }
        require(bottom <= top,
          s"geo_bounding_box($field): bottom $bottom above top $top")
        val lat = resolve(field).getField("lat").cast("double")
        val lon = resolve(field).getField("lon").cast("double")
        val latIn = lat <= top && lat >= bottom
        // left > right IS ES's antimeridian-crossing box (the dateline
        // wrap): the wrap splits into two plain ranges OR'd together —
        // [left, 180] ∪ [-180, right] — which is engine-independent
        // arithmetic after all
        if (left <= right) latIn && lon >= left && lon <= right
        else latIn && (lon >= left || lon <= right)
      // {"geo_polygon": {"<field>": {"points": [...]}}} — containment
      // via Geo.pointInPolygon's PNPOLY ray cast; points accept the
      // same three spellings as every geo origin
      case "geo_polygon" =>
        val (field, v) = lonely(body, "geo_polygon")
        val pts = (v \ "points") match {
          case JArray(ps) if ps.size >= 3 =>
            ps.map(parseGeoPoint(_, s"geo_polygon($field).points"))
          case other => throw new IllegalArgumentException(
            s"geo_polygon needs a points array of >= 3 vertices, " +
              s"got $other")
        }
        Geo.pointInPolygon(
          resolve(field).getField("lat").cast("double"),
          resolve(field).getField("lon").cast("double"), pts)
      // ES `geo_shape` over a geo_point column: shape types `envelope`
      // ([[minLon, maxLat], [maxLon, minLat]] — ES's top-left /
      // bottom-right, [lon, lat] order) and `polygon` (GeoJSON outer
      // ring of [lon, lat] pairs, closed or open; holes refuse — a
      // punctured containment needs a real geometry engine). Relations
      // for a POINT doc geometry: `intersects` and `within` coincide
      // (a point is inside the shape or it is not — both reduce to
      // containment, the same bbox arithmetic / PNPOLY ray cast as
      // geo_bounding_box / geo_polygon); `disjoint` is
      // field-present AND NOT contained (ES's rule: a missing field
      // matches NO geo_shape relation, disjoint included);
      // `contains` (doc geometry ⊇ query shape) is degenerate for
      // points and refuses loudly. The envelope inherits the bbox
      // antimeridian wrap (left > right splits into two OR'd ranges).
      case "geo_shape" =>
        val (field, v) = lonely(body, "geo_shape")
        val shape = (v \ "shape") match {
          case JNothing => throw new IllegalArgumentException(
            s"geo_shape($field) needs a shape object")
          case x => x
        }
        val relation = (v \ "relation") match {
          case JNothing    => "intersects" // ES's default
          case JString(r)  => r
          case other => throw new IllegalArgumentException(
            s"geo_shape($field) relation must be a string, got $other")
        }
        val lat = resolve(field).getField("lat").cast("double")
        val lon = resolve(field).getField("lon").cast("double")
        def numOf(x: JValue, what: String): Double = x match {
          case JInt(n)     => n.toDouble
          case JLong(n)    => n.toDouble
          case JDouble(d)  => d
          case JDecimal(d) => d.toDouble
          case other => throw new IllegalArgumentException(
            s"geo_shape($field).$what must be a number, got $other")
        }
        def lonLat(x: JValue, what: String): (Double, Double) =
          x match {
            case JArray(List(lo, la)) =>
              (numOf(lo, s"$what lon"), numOf(la, s"$what lat"))
            case other => throw new IllegalArgumentException(
              s"geo_shape($field).$what must be a [lon, lat] pair, " +
                s"got $other")
          }
        val contained = (shape \ "type") match {
          case JString(t) if t.equalsIgnoreCase("envelope") =>
            val (tl, br) = (shape \ "coordinates") match {
              case JArray(List(a, b)) =>
                (lonLat(a, "envelope[0]"), lonLat(b, "envelope[1]"))
              case other => throw new IllegalArgumentException(
                s"geo_shape($field) envelope needs [[minLon, maxLat], " +
                  s"[maxLon, minLat]], got $other")
            }
            val (left, top) = tl
            val (right, bottom) = br
            require(bottom <= top,
              s"geo_shape($field) envelope: bottom $bottom above top $top")
            val latIn = lat <= top && lat >= bottom
            if (left <= right) latIn && lon >= left && lon <= right
            else latIn && (lon >= left || lon <= right) // dateline wrap
          case JString(t) if t.equalsIgnoreCase("polygon") =>
            val ring = (shape \ "coordinates") match {
              case JArray(List(JArray(outer))) if outer.size >= 3 =>
                outer.map(lonLat(_, "polygon ring"))
              case JArray(rings) if rings.size > 1 =>
                throw new IllegalArgumentException(
                  s"geo_shape($field) polygon holes (inner rings) " +
                    "have no engine-independent translation here — " +
                    "compose disjoint geo_shape clauses under bool " +
                    "must/must_not instead")
              case other => throw new IllegalArgumentException(
                s"geo_shape($field) polygon needs [[[lon, lat], ...]] " +
                  s"(one outer ring, >= 3 vertices), got $other")
            }
            // GeoJSON rings close on themselves — drop the repeat
            val open =
              if (ring.size >= 4 && ring.head == ring.last) ring.init
              else ring
            Geo.pointInPolygon(lat, lon,
              open.map { case (lo, la) => (la, lo) })
          case other => throw new IllegalArgumentException(
            s"geo_shape($field) shape type $other not supported " +
              "(envelope, polygon)")
        }
        relation.toLowerCase(java.util.Locale.ROOT) match {
          case "intersects" | "within" => contained
          case "disjoint" =>
            lat.isNotNull && lon.isNotNull && !contained
          case "contains" => throw new IllegalArgumentException(
            s"geo_shape($field) relation 'contains' over a point " +
              "column is degenerate (a point contains only itself) — " +
              "refused rather than silently matching nothing")
          case other => throw new IllegalArgumentException(
            s"geo_shape($field) relation '$other' not supported " +
              "(intersects, within, disjoint)")
        }
      // ES `nested`: every clause of the inner query must match the
      // SAME element of the array-of-structs at `path` — a flattened
      // AND silently over-matches across elements (the reference's
      // ecommerce fixture is exactly this shape,
      // tests/__init__.py:80-166 nested products.*). Compiled to a
      // higher-order exists() whose lambda rebinds `path.*` names to
      // the CURRENT element: zero shuffle, zero explode, and sibling
      // top-level fields inside the same subtree still resolve
      // normally. Nested-in-nested composes — the inner case just
      // stacks another resolver.
      case "nested" =>
        val path = (body \ "path") match {
          case JString(pth) if pth.nonEmpty => pth
          case other => throw new IllegalArgumentException(
            s"nested needs a non-empty string path, got $other")
        }
        val inner = (body \ "query") match {
          case JNothing => throw new IllegalArgumentException(
            "nested needs a query")
          case x => x
        }
        // score_mode only affects scoring, not matching — validate it
        // is a real ES value so typos fail loudly, then ignore
        (body \ "score_mode") match {
          case JNothing | JString("none") | JString("avg") |
               JString("sum") | JString("min") | JString("max") => ()
          case other => throw new IllegalArgumentException(
            s"nested score_mode $other is not an ES score_mode")
        }
        exists(resolve(path), element => {
          val nestedResolve: String => Column = {
            case f if f == path => element
            case f if f.startsWith(path + ".") =>
              f.stripPrefix(path + ".").split('.')
                .foldLeft(element)(_ getField _)
            case f => resolve(f)
          }
          fromJValue(inner, idCol, requireText, nestedResolve)
        })
      case "exists" =>
        resolve((body \ "field").extract[String]).isNotNull
      case "ids" =>
        (body \ "values") match {
          case JArray(vs) => col(idCol).isin(vs.map(jvRaw): _*)
          case other      => throw new IllegalArgumentException(s"ids: $other")
        }
      case other =>
        throw new IllegalArgumentException(
          s"es_query clause '$other' has no engine-independent translation")
    }
  }
}

package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{Tables, TestSpark}
import graft.api.GraftFrame

class EsQueryDslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders =
    GraftFrame(Tables.load(spark, TestSpark.sfDir, "orders"), "o_orderkey")
  private def docs =
    GraftFrame(Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id")

  test("match-family analyzer key: english honored on both sides, " +
      "unknown refused, scored path refuses loudly") {
    import spark.implicits._
    val f = GraftFrame(
      Seq((1L, "the filters run"), (2L, "nothing here"))
        .toDF("id", "text"), "id")
    // query "filter" matches doc-side "filters" only through the chain
    assert(f.esQuery(
      """{"match": {"text": {"query": "filter",
        |"analyzer": "english"}}}""".stripMargin).len() == 1)
    assert(f.esQuery("""{"match": {"text": {"query": "filter"}}}""")
      .len() == 0)
    assert(f.esQuery(
      """{"multi_match": {"query": "filter", "fields": ["text"],
        |"analyzer": "english"}}""".stripMargin).len() == 1)
    assert(f.esQuery(
      """{"match_phrase": {"text": {"query": "filter runs",
        |"analyzer": "english"}}}""".stripMargin).len() == 1)
    val bad = intercept[IllegalArgumentException](f.esQuery(
      """{"match": {"text": {"query": "x", "analyzer": "porter"}}}""")
      .len())
    assert(bad.getMessage.contains("unknown analyzer"))
    // silently dropping the key in the SCORED path would change
    // results — it refuses instead
    val sc = intercept[IllegalArgumentException](f.esQueryScored(
      """{"match": {"text": {"query": "filter",
        |"analyzer": "english"}}}""".stripMargin).len())
    assert(sc.getMessage.contains("SCORED"), sc.getMessage)
  }

  test("term/terms/range translate to exact predicates") {
    val t = orders.esQuery("""{"term": {"o_orderstatus": "F"}}""").len()
    assert(t == orders.where(orders("o_orderstatus") === "F").len() && t > 0)
    val ts = orders.esQuery(
      """{"terms": {"o_orderpriority": ["1-URGENT", "2-HIGH"]}}""").len()
    assert(ts == orders.where(
      orders("o_orderpriority").isin(Seq("1-URGENT", "2-HIGH"))).len())
    val r = orders.esQuery(
      """{"range": {"o_totalprice": {"gte": 100000, "lt": 200000}}}""").len()
    assert(r == orders.where(orders("o_totalprice") >= 100000.0 &&
      orders("o_totalprice") < 200000.0).len())
  }

  test("bool must/should/must_not compose; filter ANDs like must") {
    val q =
      """{"bool": {
        |  "must":     [{"range": {"o_totalprice": {"gte": 100000}}}],
        |  "filter":   [{"term": {"o_orderstatus": "O"}}],
        |  "must_not": [{"term": {"o_orderpriority": "5-LOW"}}]
        |}}""".stripMargin
    val got = orders.esQuery(q).len()
    val want = orders.where(orders("o_totalprice") >= 100000.0 &&
      orders("o_orderstatus") === "O" &&
      orders("o_orderpriority") =!= "5-LOW").len()
    assert(got == want && got > 0)
    // should alone = OR
    val s = orders.esQuery(
      """{"bool": {"should": [{"term": {"o_orderstatus": "F"}},
        |                     {"term": {"o_orderstatus": "P"}}]}}""".stripMargin).len()
    assert(s == orders.where(orders("o_orderstatus").isin(Seq("F", "P"))).len())
  }

  test("should is optional beside must unless minimum_should_match, like ES") {
    // with must present, bare should only affects scoring — not matching
    val withMust = orders.esQuery(
      """{"bool": {"must":   [{"term": {"o_orderstatus": "F"}}],
        |          "should": [{"term": {"o_orderpriority": "NOPE"}}]}}""".stripMargin).len()
    assert(withMust == orders.where(orders("o_orderstatus") === "F").len())
    // explicit minimum_should_match re-enables should as a predicate
    val msm1 = orders.esQuery(
      """{"bool": {"must": [{"term": {"o_orderstatus": "F"}}],
        |          "should": [{"term": {"o_orderpriority": "1-URGENT"}},
        |                     {"term": {"o_orderpriority": "2-HIGH"}}],
        |          "minimum_should_match": 1}}""".stripMargin).len()
    assert(msm1 == orders.where(orders("o_orderstatus") === "F" &&
      orders("o_orderpriority").isin(Seq("1-URGENT", "2-HIGH"))).len())
    // at-least-2-of semantics
    val msm2 = orders.esQuery(
      """{"bool": {"should": [{"term": {"o_orderstatus": "F"}},
        |                     {"term": {"o_orderpriority": "1-URGENT"}},
        |                     {"range": {"o_totalprice": {"gte": 0}}}],
        |          "minimum_should_match": 2}}""".stripMargin).len()
    val want2 = orders.where(
      (when(orders("o_orderstatus") === "F", 1).otherwise(0) +
        when(orders("o_orderpriority") === "1-URGENT", 1).otherwise(0) +
        when(orders("o_totalprice") >= 0.0, 1).otherwise(0)) >= 2).len()
    assert(msm2 == want2 && msm2 > 0)
  }

  test("must_not keeps rows where the field is null (ES missing-field semantics)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val f = GraftFrame(df, "id")
    val kept = f.esQuery("""{"bool": {"must_not": [{"term": {"v": "a"}}]}}""")
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L)) // the null row survives, like ES
  }

  test("match/match_phrase/wildcard/prefix/regexp/exists/ids") {
    val m = docs.esQuery("""{"match": {"text": "filter join"}}""").len()
    assert(m == docs.esMatch("filter join", Seq("text")).len())
    val ma = docs.esQuery(
      """{"match": {"text": {"query": "filter join", "operator": "and"}}}""").len()
    assert(ma == docs.esMatch("filter join", Seq("text"), operator = "and").len())
    val p = docs.esQuery("""{"match_phrase": {"text": "the fast"}}""").len()
    assert(p == docs.where(EsMatch.matchPhrase(
      org.apache.spark.sql.functions.col("text"), "the fast")).len())
    // bool_prefix: full terms under AND (no adjacency), last as prefix
    // — a superset of the adjacency-requiring phrase_prefix
    val bp = docs.esQuery(
      """{"match_bool_prefix": {"text": "the fas"}}""").len()
    val pp = docs.esQuery(
      """{"match_phrase_prefix": {"text": "the fas"}}""").len()
    assert(bp >= pp && bp > 0)
    locally {
      import spark.implicits._
      val tiny = GraftFrame(
        Seq((1L, "fast comes before the"), (2L, "the slow")) // reversed order
          .toDF("id", "text"), "id")
      // bool semantics match doc 1 (both terms present, any order);
      // phrase-prefix does not
      assert(tiny.esQuery(
        """{"match_bool_prefix": {"text": "the fas"}}""").len() == 1)
      assert(tiny.esQuery(
        """{"match_phrase_prefix": {"text": "the fas"}}""").len() == 0)
    }
    val w = orders.esQuery("""{"wildcard": {"o_orderpriority": "*URGENT"}}""").len()
    assert(w == orders.where(orders("o_orderpriority").esWildcard("*URGENT")).len())
    val pre = orders.esQuery("""{"prefix": {"o_orderpriority": "1-"}}""").len()
    assert(pre == orders.where(orders("o_orderpriority").startsWith("1-")).len())
    // ES regexp is anchored: "1-.*" matches whole value only
    val re = orders.esQuery("""{"regexp": {"o_orderpriority": "1-.*"}}""").len()
    assert(re == pre)
    val nn = orders.esQuery("""{"exists": {"field": "o_orderpriority"}}""").len()
    assert(nn == orders.where(orders("o_orderpriority").notna).len())
    val ids = orders.esQuery("""{"ids": {"values": [1, 2, 3]}}""").len()
    assert(ids == orders.where(orders("o_orderkey").isin(Seq(1L, 2L, 3L))).len())
  }

  test("match_all/match_none and untranslatable clauses") {
    assert(orders.esQuery("""{"match_all": {}}""").len() == orders.len())
    assert(orders.esQuery("""{"match_none": {}}""").len() == 0)
    // geo_distance translates since r13 (GeoSpec), geo_shape since
    // r17 — a shapeless geo_shape is malformed and refuses loudly
    val e = intercept[IllegalArgumentException](
      orders.esQuery("""{"geo_shape": {"f": {}}}""").len())
    assert(e.getMessage.contains("needs a shape"), e.getMessage)
    // a geo_distance with no field entry is a malformed clause, loud
    val eGeo = intercept[IllegalArgumentException](
      orders.esQuery("""{"geo_distance": {"distance": "1km"}}""").len())
    assert(eGeo.getMessage.contains("exactly one field"))
    // percentage minimum_should_match raises instead of silently
    // falling back to the integer default
    val e2 = intercept[IllegalArgumentException](
      orders.esQuery(
        """{"bool": {"must": [{"match_all": {}}],
          |"should": [{"term": {"o_orderstatus": "F"}}],
          |"minimum_should_match": "75%"}}""".stripMargin).len())
    assert(e2.getMessage.contains("minimum_should_match"))
  }

  test("geo_shape: envelope/polygon, intersects ≡ within for points, " +
      "disjoint needs the field, refusals") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, Some((10.0, 10.0))),    // inside both shapes
      (2L, Some((10.0, 170.0))),   // outside both
      (3L, None: Option[(Double, Double)]) // missing field
    ).toDF("id", "p")
      .select(col("id"), when(col("p").isNotNull, struct(
        col("p._1").as("lat"), col("p._2").as("lon"))).as("loc")), "id")
    def q(shape: String, rel: String): Set[Long] =
      f.esQuery(s"""{"geo_shape": {"loc": {"shape": $shape,
        "relation": "$rel"}}}""").df
        .select("id").collect().map(_.getLong(0)).toSet
    val env = """{"type": "envelope", "coordinates": [[-20, 30], [30, -20]]}"""
    // closed GeoJSON ring in [lon, lat]; a diamond around (10, 10)
    val poly = """{"type": "polygon", "coordinates":
      [[[10, -20], [40, 10], [10, 40], [-20, 10], [10, -20]]]}"""
    assert(q(env, "intersects") == Set(1L))
    assert(q(env, "within") == Set(1L))       // point: within ≡ intersects
    assert(q(env, "disjoint") == Set(2L))     // doc 3's missing field never matches
    assert(q(poly, "intersects") == Set(1L))
    assert(q(poly, "disjoint") == Set(2L))
    // envelope dateline wrap: left > right ORs the two ranges
    val wrap = """{"type": "envelope", "coordinates": [[160, 30], [-160, -20]]}"""
    assert(q(wrap, "intersects") == Set(2L))
    // refusals: contains, polygon holes, unknown type/relation
    intercept[IllegalArgumentException](q(env, "contains"))
    intercept[IllegalArgumentException](q(env, "overlaps"))
    val holes = intercept[IllegalArgumentException](
      q("""{"type": "polygon", "coordinates": [[[0,0],[1,0],[1,1],[0,0]],
        [[0,0],[1,0],[0,1],[0,0]]]}""", "intersects"))
    assert(holes.getMessage.contains("holes"), holes.getMessage)
    intercept[IllegalArgumentException](
      q("""{"type": "circle", "coordinates": [0, 0]}""", "intersects"))
  }

  test("multi_match and fuzzy route through the EsMatch modes") {
    // single-field multi_match ≡ match
    val mm = docs.esQuery(
      """{"multi_match": {"query": "filter join", "fields": ["text"]}}""").len()
    assert(mm == docs.esQuery("""{"match": {"text": "filter join"}}""").len()
      && mm > 0)
    // operator:and within each field
    val mmAnd = docs.esQuery(
      """{"multi_match": {"query": "filter join", "fields": ["text"],
        |"operator": "and"}}""".stripMargin).len()
    assert(mmAnd == docs.esQuery(
      """{"match": {"text": {"query": "filter join", "operator": "and"}}}""")
      .len() && mmAnd <= mm)
    // a second field only widens the match set
    val mm2 = docs.esQuery(
      """{"multi_match": {"query": "filter join",
        |"fields": ["text", "source"]}}""".stripMargin).len()
    assert(mm2 >= mm)
    // fields list is required
    val e = intercept[IllegalArgumentException](
      docs.esQuery("""{"multi_match": {"query": "x"}}""").len())
    assert(e.getMessage.contains("fields"))

    // fuzzy: 1 edit catches the corpus's "stream" tokens from "streem"
    val fz = docs.esQuery(
      """{"fuzzy": {"text": {"value": "streem", "fuzziness": 1}}}""").len()
    assert(fz > 0 &&
      fz == docs.df.where(graft.functions.EsMatch
        .matchFuzzy(org.apache.spark.sql.functions.col("text"), "streem", 1))
        .count())
    // fuzziness 0 ≡ exact token match
    assert(docs.esQuery(
      """{"fuzzy": {"text": {"value": "stream", "fuzziness": 0}}}""").len()
      == docs.esQuery("""{"match": {"text": "stream"}}""").len())
    // AUTO ladder: 6+ chars → 2 edits
    assert(docs.esQuery("""{"fuzzy": {"text": "streem"}}""").len()
      == docs.esQuery(
        """{"fuzzy": {"text": {"value": "streem", "fuzziness": 2}}}""").len())
    // match with fuzziness: per-term AUTO ladder, operator semantics
    val mf = docs.esQuery(
      """{"match": {"text": {"query": "streem", "fuzziness": 1}}}""").len()
    assert(mf == fz)
    assert(docs.esQuery(
      """{"match": {"text": {"query": "streem", "fuzziness": "AUTO"}}}""").len()
      == docs.esQuery(
        """{"fuzzy": {"text": {"value": "streem", "fuzziness": 2}}}""").len())
    // operator and: every term must fuzzy-match; adding an impossible
    // term empties the result
    assert(docs.esQuery(
      """{"match": {"text": {"query": "streem zzqqxx", "operator": "and",
        |"fuzziness": 1}}}""".stripMargin).len() == 0)
    // multi_match honors fuzziness (dropping it would silently change
    // the result set) and equals the single-field match translation
    assert(docs.esQuery(
      """{"multi_match": {"query": "streem", "fields": ["text"],
        |"fuzziness": 1}}""".stripMargin).len() == mf)
    // negative fuzziness is an error, not an empty result
    assert(intercept[IllegalArgumentException](docs.esQuery(
      """{"fuzzy": {"text": {"value": "stream", "fuzziness": -1}}}"""))
      .getMessage.contains(">= 0"))
    // ...even when the query tokenizes to zero terms (validation is
    // eager, not buried in the per-term lambda)
    assert(intercept[IllegalArgumentException](docs.esQuery(
      """{"match": {"text": {"query": "   ", "fuzziness": -1}}}"""))
      .getMessage.contains(">= 0"))
    // an out-of-int-range budget errors instead of truncating to 0
    assert(intercept[IllegalArgumentException](docs.esQuery(
      """{"match": {"text": {"query": "stream", "fuzziness": 4294967296}}}"""))
      .getMessage.contains("fuzziness"))
    // the non-text guard applies to both clause kinds
    val pinned = docs.withEsDtype("source", "keyword")
    assert(intercept[IllegalArgumentException](pinned.esQuery(
      """{"multi_match": {"query": "x", "fields": ["source"]}}"""))
      .getMessage.contains("non-text"))
    assert(intercept[IllegalArgumentException](pinned.esQuery(
      """{"fuzzy": {"source": "web"}}"""))
      .getMessage.contains("non-text"))
  }

  test("match_phrase_prefix: last token is a prefix, order and adjacency enforced") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "the stream column runs"),   // phrase + prefix match
      (2L, "the stream colder runs"),   // "col" prefixes "colder" too
      (3L, "the column stream runs"),   // wrong order
      (4L, "the stream runs column"),   // not adjacent
      (5L, "the stream col runs"),      // exact last token counts as prefix
      (6L, "stream")                    // phrase truncated
    ).toDF("id", "text"), "id")
    def ids(q: String) = f.esQuery(q).df.select("id")
      .as[Long].collect().sorted.toSeq
    assert(ids("""{"match_phrase_prefix": {"text": "stream col"}}""")
      == Seq(1L, 2L, 5L))
    // object spelling and single-token prefix
    assert(ids("""{"match_phrase_prefix": {"text": {"query": "colu"}}}""")
      == Seq(1L, 3L, 4L))
    // non-text fields refuse like the rest of the match family
    intercept[IllegalArgumentException](
      GraftFrame(Seq((1L, 2L)).toDF("id", "n"), "id")
        .esQuery("""{"match_phrase_prefix": {"n": "1"}}"""))
  }

  test("constant_score is its filter; dis_max matches when any branch does") {
    val cs = orders.esQuery(
      """{"constant_score": {"filter":
        |  {"term": {"o_orderstatus": "F"}}}}""".stripMargin).len()
    assert(cs == orders.where(orders("o_orderstatus") === "F").len() && cs > 0)
    val dm = orders.esQuery(
      """{"dis_max": {"queries": [
        |  {"term": {"o_orderstatus": "F"}},
        |  {"term": {"o_orderpriority": "1-URGENT"}}
        |]}}""".stripMargin).len()
    assert(dm == orders.where(orders("o_orderstatus") === "F" ||
      orders("o_orderpriority") === "1-URGENT").len())
    intercept[IllegalArgumentException](
      orders.esQuery("""{"dis_max": {"queries": []}}"""))
  }

  test("boosting matches its positive leg only; malformed legs refuse") {
    import spark.implicits._
    val f = GraftFrame(
      Seq((1L, "apple pie recipe"), (2L, "apple tree care"),
        (3L, "pear tart")).toDF("id", "text"), "id")
    val q =
      """{"boosting": {
        |  "positive": {"match": {"text": "apple"}},
        |  "negative": {"match": {"text": "tree"}},
        |  "negative_boost": 0.2}}""".stripMargin
    // predicate face: docs 1 and 2 (negative does not filter)
    assert(f.esQuery(q).len() == 2)
    intercept[IllegalArgumentException](f.esQuery(
      """{"boosting": {"positive": {"match_all": {}},
        |"negative": {"match_all": {}}}}""".stripMargin))
    intercept[IllegalArgumentException](f.esQuery(
      """{"boosting": {"positive": {"match_all": {}},
        |"negative": {"match_all": {}},
        |"negative_boost": 1.5}}""".stripMargin))
    intercept[IllegalArgumentException](f.esQuery(
      """{"boosting": {"negative": {"match_all": {}},
        |"negative_boost": 0.5}}""".stripMargin))
  }

  test("terms_set: constant and field-driven minimum_should_match") {
    import spark.implicits._
    val f = GraftFrame(
      Seq((1L, "red green blue", 2), (2L, "red yellow pink", 2),
        (3L, "red green blue", 3)).toDF("id", "text", "required"), "id")
    // constant msm: ≥2 of the three terms
    assert(f.esQuery(
      """{"terms_set": {"text": {"terms": ["red", "green", "blue"],
        |"minimum_should_match": 2}}}""".stripMargin)
      .df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // field-driven msm: doc 2 requires 2 but has only 1 match; doc 3
    // requires 3 and has 3
    assert(f.esQuery(
      """{"terms_set": {"text": {"terms": ["red", "green", "blue"],
        |"minimum_should_match_field": "required"}}}""".stripMargin)
      .df.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // duplicates count once: ["red","red"] is one matching term
    assert(f.esQuery(
      """{"terms_set": {"text": {"terms": ["red", "red"],
        |"minimum_should_match": 2}}}""".stripMargin).len() == 0)
    intercept[IllegalArgumentException](f.esQuery(
      """{"terms_set": {"text": {"terms": ["red"]}}}"""))
    intercept[IllegalArgumentException](f.esQuery(
      """{"terms_set": {"text": {"terms": ["red"],
        |"minimum_should_match": 1,
        |"minimum_should_match_field": "required"}}}""".stripMargin))
  }

  test("span_near: ordered chains, unordered pairs, slop boundaries") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "a x b y c"),   // a..b gap 1, a..c span 5 (2 in between)
      (2L, "b a c"),       // out of order for (a, b)
      (3L, "a b"),         // adjacent
      (4L, "c y x a")).toDF("id", "text"), "id")
    def q(json: String): Set[Long] =
      f.esQuery(json).df.select("id").collect().map(_.getLong(0)).toSet
    // ordered (a, b): slop 0 needs adjacency; slop 1 allows one gap
    assert(q("""{"span_near": {"clauses": [
      |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
      |"slop": 0, "in_order": true}}""".stripMargin) == Set(3L))
    assert(q("""{"span_near": {"clauses": [
      |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
      |"slop": 1, "in_order": true}}""".stripMargin) == Set(1L, 3L))
    // unordered pair: doc 2's b..a distance 1 now matches at slop 0
    assert(q("""{"span_near": {"clauses": [
      |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
      |"slop": 0, "in_order": false}}""".stripMargin) == Set(2L, 3L))
    // ordered 3-chain (a, b, c): span 5 → 2 in between → slop 2
    assert(q("""{"span_near": {"clauses": [
      |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
      |{"span_term": {"text": "c"}}],
      |"slop": 2, "in_order": true}}""".stripMargin) == Set(1L))
    assert(q("""{"span_near": {"clauses": [
      |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
      |{"span_term": {"text": "c"}}],
      |"slop": 1, "in_order": true}}""".stripMargin) == Set.empty[Long])
    // refusals: missing slop, 3-way unordered, mixed fields
    intercept[IllegalArgumentException](q(
      """{"span_near": {"clauses": [
        |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
        |"in_order": true}}""".stripMargin))
    intercept[IllegalArgumentException](q(
      """{"span_near": {"clauses": [
        |{"span_term": {"text": "a"}}, {"span_term": {"text": "b"}},
        |{"span_term": {"text": "c"}}], "slop": 1}}""".stripMargin))
  }

  test("wrapper decodes base64 and recurses on both faces") {
    import spark.implicits._
    val f = GraftFrame(Seq((1L, "alpha beta"), (2L, "gamma"))
      .toDF("id", "text"), "id")
    val inner = """{"match": {"text": "alpha"}}"""
    val b64 = java.util.Base64.getEncoder.encodeToString(
      inner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(f.esQuery(s"""{"wrapper": {"query": "$b64"}}""").len() == 1)
    // scored face keeps real scoring through the wrapper
    val sc = EsScoredQuery.scoredFrame(
      Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text"),
      "doc_id", s"""{"wrapper": {"query": "$b64"}}""")
      .select("doc_id", "_score").collect()
    assert(sc.length == 1 && sc.head.getDouble(1) > 0)
    intercept[IllegalArgumentException](
      f.esQuery("""{"wrapper": {"query": 42}}"""))
  }

  test("span_or / span_first / span_not: closed position predicates") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "alpha beta gamma"),
      (2L, "beta alpha delta"),
      (3L, "delta gamma beta alpha"),
      (4L, "epsilon zeta")
    ).toDF("id", "text"), "id")
    def ids(json: String): Set[Long] =
      f.esQuery(json).df.select("id").collect().map(_.getLong(0)).toSet
    assert(ids("""{"span_or": {"clauses": [
      |{"span_term": {"text": "alpha"}},
      |{"span_term": {"text": "zeta"}}]}}""".stripMargin)
      == Set(1L, 2L, 3L, 4L))
    // span end <= 2 ⇔ token position < 2 (0-based)
    assert(ids("""{"span_first": {"match":
      |{"span_term": {"text": "alpha"}}, "end": 2}}""".stripMargin)
      == Set(1L, 2L))
    assert(ids("""{"span_first": {"match": {"span_or": {"clauses": [
      |{"span_term": {"text": "alpha"}},
      |{"span_term": {"text": "delta"}}]}}, "end": 1}}""".stripMargin)
      == Set(1L, 3L))
    // alpha with no gamma in the ±1 window: doc1 alpha@0/gamma@2
    // (distance 2, outside) matches; doc2 has no gamma; doc3
    // alpha@3/gamma@1 (distance 2) matches
    assert(ids("""{"span_not": {
      |"include": {"span_term": {"text": "alpha"}},
      |"exclude": {"span_term": {"text": "gamma"}},
      |"pre": 1, "post": 1}}""".stripMargin) == Set(1L, 2L, 3L))
    // dist sets both pre and post
    assert(ids("""{"span_not": {
      |"include": {"span_term": {"text": "alpha"}},
      |"exclude": {"span_term": {"text": "gamma"}},
      |"dist": 2}}""".stripMargin) == Set(2L))
    // multi-position inner spans refuse
    intercept[IllegalArgumentException](ids("""{"span_not": {
      |"include": {"span_near": {"clauses": [
      |  {"span_term": {"text": "a"}}], "slop": 0}},
      |"exclude": {"span_term": {"text": "b"}}}}""".stripMargin))
    // cross-field span_not refuses
    intercept[IllegalArgumentException](ids("""{"span_not": {
      |"include": {"span_term": {"text": "a"}},
      |"exclude": {"span_term": {"other": "b"}}}}""".stripMargin))
  }

  test("nested: all clauses must hit the SAME array element") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, Seq(("laptop", 1200.0), ("mouse", 25.0))),
      (2L, Seq(("laptop", 300.0), ("keyboard", 1500.0))),
      (3L, Seq[(String, Double)]()),
      (4L, null.asInstanceOf[Seq[(String, Double)]])
    ).toDF("id", "products")
      .selectExpr("id",
        "transform(products, p -> named_struct(" +
          "'category', p._1, 'price', p._2)) AS products"), "id")
    def ids(json: String): Set[Long] =
      f.esQuery(json).df.select("id").collect().map(_.getLong(0)).toSet
    // same-element: only doc 1 has ONE product that is BOTH a laptop
    // AND > 1000; doc 2 has a cheap laptop and an expensive keyboard
    assert(ids("""{"nested": {"path": "products",
      |"query": {"bool": {"must": [
      |  {"term": {"products.category": "laptop"}},
      |  {"range": {"products.price": {"gt": 1000}}}]}}}}"""
      .stripMargin) == Set(1L))
    // the flattened cross-element reading over-matches doc 2
    assert(ids("""{"bool": {"must": [
      |{"nested": {"path": "products",
      |  "query": {"term": {"products.category": "laptop"}}}},
      |{"nested": {"path": "products",
      |  "query": {"range": {"products.price": {"gt": 1000}}}}}]}}"""
      .stripMargin) == Set(1L, 2L))
    // empty array and null array never match; must_not keeps them
    assert(ids("""{"bool": {"must_not": [{"nested": {
      |"path": "products",
      |"query": {"term": {"products.category": "laptop"}}}}]}}"""
      .stripMargin) == Set(3L, 4L))
    // score_mode typo fails loudly
    intercept[IllegalArgumentException](ids("""{"nested": {
      |"path": "products", "score_mode": "average",
      |"query": {"exists": {"field": "products.price"}}}}"""
      .stripMargin))
  }

  test("esQuery match enforces the same non-text guard as esMatch") {
    val pinned = docs.withEsDtype("source", "keyword")
    val e = intercept[IllegalArgumentException](
      pinned.esQuery("""{"match": {"source": "web"}}"""))
    assert(e.getMessage.contains("non-text"))
    // lenient escape hatch matches anyway
    assert(pinned.esQuery("""{"match": {"source": "web"}}""",
      matchOnlyTextFields = false).len() >= 0)
    // text columns pass
    assert(docs.esQuery("""{"match": {"text": "filter"}}""").len() > 0)
  }

  test("intervals: match ordered/unordered/gaps, prefix, any_of, " +
      "all_of blocks, refusals") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "a x b y c"),       // a@0 b@2 c@4
      (2L, "b a c"),           // b@0 a@1 c@2
      (3L, "a b c d"),         // adjacent run
      (4L, "pre prefixed c"),
      (5L, "a b x c d"),       // phrase a-b @0, phrase c-d @3
      (6L, "a x a")).toDF("id", "text"), "id")
    def q(json: String): Set[Long] =
      f.esQuery(json).df.select("id").collect().map(_.getLong(0)).toSet
    def iv(rule: String): Set[Long] =
      q(s"""{"intervals": {"text": $rule}}""")

    // match ordered: gap budget is (max − min + 1 − k)
    assert(iv("""{"match": {"query": "a b", "max_gaps": 0,
      "ordered": true}}""") == Set(3L, 5L))
    assert(iv("""{"match": {"query": "a b", "max_gaps": 1,
      "ordered": true}}""") == Set(1L, 3L, 5L))
    // unordered picks up doc 2's b-before-a
    assert(iv("""{"match": {"query": "a b", "max_gaps": 0}}""") ==
      Set(2L, 3L, 5L))
    // ES defaults: unordered + unbounded = plain conjunction
    assert(iv("""{"match": {"query": "a b"}}""") ==
      Set(1L, 2L, 3L, 5L))
    // ordered 3-chain gap boundaries
    assert(iv("""{"match": {"query": "a b c", "max_gaps": 2,
      "ordered": true}}""") == Set(1L, 3L, 5L))
    assert(iv("""{"match": {"query": "a b c", "max_gaps": 1,
      "ordered": true}}""") == Set(3L, 5L))
    // prefix
    assert(iv("""{"prefix": {"prefix": "pref"}}""") == Set(4L))
    // any_of = union
    assert(iv("""{"any_of": {"intervals": [
      {"prefix": {"prefix": "pref"}},
      {"match": {"query": "c d", "max_gaps": 0, "ordered": true}}
      ]}}""") == Set(3L, 4L, 5L))
    // all_of ordered over fixed-width blocks: phrase then term
    assert(iv("""{"all_of": {"ordered": true, "max_gaps": 0,
      "intervals": [
        {"match": {"query": "a b", "max_gaps": 0, "ordered": true}},
        {"match": {"query": "c"}}]}}""") == Set(3L))
    assert(iv("""{"all_of": {"ordered": true, "max_gaps": 1,
      "intervals": [
        {"match": {"query": "a b", "max_gaps": 0, "ordered": true}},
        {"match": {"query": "c"}}]}}""") == Set(3L, 5L))
    // all_of ordered enforces block order (b before a)
    assert(iv("""{"all_of": {"ordered": true, "intervals": [
      {"match": {"query": "b"}}, {"match": {"query": "a"}}
      ]}}""") == Set(2L))
    // all_of unordered pair must NOT overlap: "a" twice needs two
    // distinct positions — doc 6 only
    assert(iv("""{"all_of": {"intervals": [
      {"match": {"query": "a"}}, {"match": {"query": "a"}}
      ]}}""") == Set(6L))
    // refusals: filter/fuzzy rules, gappy all_of block, 3-way
    // unordered all_of, repeated unordered match terms
    intercept[IllegalArgumentException](iv(
      """{"filter": {"containing": {"match": {"query": "a"}}}}"""))
    intercept[IllegalArgumentException](iv(
      """{"fuzzy": {"term": "a"}}"""))
    intercept[IllegalArgumentException](iv(
      """{"all_of": {"intervals": [
        {"match": {"query": "a b", "max_gaps": 2}},
        {"match": {"query": "c"}}]}}"""))
    intercept[IllegalArgumentException](iv(
      """{"all_of": {"intervals": [
        {"match": {"query": "a"}}, {"match": {"query": "b"}},
        {"match": {"query": "c"}}]}}"""))
    intercept[IllegalArgumentException](iv(
      """{"match": {"query": "a a", "max_gaps": 3}}"""))
    // the scored face serves intervals as constant_score
    assert(f.esQueryScored("""{"intervals": {"text":
      {"match": {"query": "a b", "max_gaps": 0, "ordered": true}}}}""")
      .df.count() == 2L)
  }

  test("intervals differential: ordered max_gaps 0 == match_phrase; " +
      "pair gaps == span_near slop — on the real corpus") {
    def ids(g: GraftFrame): Set[Long] =
      g.df.select("doc_id").collect().map(_.getLong(0)).toSet
    val f = docs
    // two independent implementations must agree document-for-document
    val phrase = ids(f.esQuery(
      """{"match_phrase": {"text": "the batch"}}"""))
    val ivPhrase = ids(f.esQuery(
      """{"intervals": {"text": {"match":
        |{"query": "the batch", "max_gaps": 0,
        |"ordered": true}}}}""".stripMargin))
    assert(phrase == ivPhrase, phrase.diff(ivPhrase))
    assert(phrase.nonEmpty)
    for (slop <- Seq(0, 2)) {
      val sn = ids(f.esQuery(
        s"""{"span_near": {"clauses": [
           |  {"span_term": {"text": "stream"}},
           |  {"span_term": {"text": "filter"}}],
           |"slop": $slop, "in_order": true}}""".stripMargin))
      val iv = ids(f.esQuery(
        s"""{"intervals": {"text": {"match":
           |{"query": "stream filter", "max_gaps": $slop,
           |"ordered": true}}}}""".stripMargin))
      assert(sn == iv, s"slop $slop: ${sn.diff(iv)} / ${iv.diff(sn)}")
      val snU = ids(f.esQuery(
        s"""{"span_near": {"clauses": [
           |  {"span_term": {"text": "stream"}},
           |  {"span_term": {"text": "filter"}}],
           |"slop": $slop, "in_order": false}}""".stripMargin))
      val ivU = ids(f.esQuery(
        s"""{"intervals": {"text": {"match":
           |{"query": "stream filter",
           |"max_gaps": $slop}}}}""".stripMargin))
      assert(snU == ivU, s"unordered slop $slop")
    }
  }
  test("synonyms filter face: or-union, and-positions, multi_match, " +
      "untouched passthrough") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "fast car", "red"), (2L, "quick boat", "blue"),
      (3L, "car", "quick"), (4L, "slow day", "green")
    ).toDF("id", "text", "tag"), "id")
    def ids(g: GraftFrame): Seq[Long] =
      g.df.select("id").collect().map(_.getLong(0)).toSeq.sorted
    val rules = Seq("quick, fast")
    // or: any member of any group
    assert(ids(f.esQuery("""{"match": {"text": "quick"}}""",
      synonyms = rules)) == Seq(1L, 2L))
    // and: every query POSITION via some member
    assert(ids(f.esQuery(
      """{"match": {"text": {"query": "quick car",
        |"operator": "and"}}}""".stripMargin,
      synonyms = rules)) == Seq(1L))
    // multi_match: any-field, expansion per field
    assert(ids(f.esQuery(
      """{"multi_match": {"query": "quick", "fields":
        |["text", "tag"]}}""".stripMargin,
      synonyms = rules)) == Seq(1L, 2L, 3L))
    // untouched clause: byte-identical passthrough (term is raw)
    assert(ids(f.esQuery("""{"term": {"tag": "quick"}}""",
      synonyms = rules)) == Seq(3L))
    // composes under bool arms
    assert(ids(f.esQuery(
      """{"bool": {"must": [{"match": {"text": "quick"}}],
        |"must_not": [{"term": {"tag": "blue"}}]}}""".stripMargin,
      synonyms = rules)) == Seq(1L))
  }

  test("synonyms filter face: positional/fuzzy/analyzer refusals " +
      "fire only when a rule touches the clause") {
    import spark.implicits._
    val f = GraftFrame(
      Seq((1L, "fast car")).toDF("id", "text"), "id")
    val rules = Seq("quick, fast")
    // phrase with an affected term refuses; unaffected phrase passes
    val ph = intercept[IllegalArgumentException](f.esQuery(
      """{"match_phrase": {"text": "quick car"}}""", synonyms = rules))
    assert(ph.getMessage.contains("positional"), ph.getMessage)
    assert(f.esQuery("""{"match_phrase": {"text": "slow day"}}""",
      synonyms = rules).len() == 0)
    // fuzziness on an affected match refuses
    val fz = intercept[IllegalArgumentException](f.esQuery(
      """{"match": {"text": {"query": "quick",
        |"fuzziness": 1}}}""".stripMargin, synonyms = rules))
    assert(fz.getMessage.contains("fuzz"), fz.getMessage)
    // non-standard analyzer on an affected match refuses
    val an = intercept[IllegalArgumentException](f.esQuery(
      """{"match": {"text": {"query": "quick",
        |"analyzer": "english"}}}""".stripMargin, synonyms = rules))
    assert(an.getMessage.contains("analyzer"), an.getMessage)
    // intervals match with an affected term refuses
    val iv = intercept[IllegalArgumentException](f.esQuery(
      """{"intervals": {"text": {"match":
        |{"query": "quick car"}}}}""".stripMargin, synonyms = rules))
    assert(iv.getMessage.contains("intervals"), iv.getMessage)
  }
  test("span_containing / span_within: enclosure over the closed " +
      "span subset; width-1 big; refusals") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "a x c b y"),   // a..b span (slop>=2 ordered), x inside
      (2L, "a b x"),       // x OUTSIDE the a..b span
      (3L, "x a b"),       // x before the span
      (4L, "a x y z b"),   // span too wide for slop 2 (b-a=4 > 3)
      (5L, "b x a")        // wrong order
    ).toDF("id", "text"), "id")
    def q(kind: String) =
      s"""{"$kind": {
         |  "little": {"span_term": {"text": "x"}},
         |  "big": {"span_near": {"clauses": [
         |    {"span_term": {"text": "a"}},
         |    {"span_term": {"text": "b"}}],
         |    "slop": 2, "in_order": true}}}}""".stripMargin
    def ids(json: String): Seq[Long] =
      f.esQuery(json).df.select("id").collect()
        .map(_.getLong(0)).toSeq.sorted
    assert(ids(q("span_containing")) == Seq(1L))
    // the filter-face match set is common to both kinds
    assert(ids(q("span_within")) == Seq(1L))
    // unordered big: doc 5's b..a span encloses x
    assert(ids(
      """{"span_containing": {
        |  "little": {"span_term": {"text": "x"}},
        |  "big": {"span_near": {"clauses": [
        |    {"span_term": {"text": "a"}},
        |    {"span_term": {"text": "b"}}],
        |    "slop": 2, "in_order": false}}}}""".stripMargin) ==
      Seq(1L, 5L))
    // width-1 big (span_or): containment = position identity
    assert(ids(
      """{"span_containing": {
        |  "little": {"span_term": {"text": "x"}},
        |  "big": {"span_or": {"clauses": [
        |    {"span_term": {"text": "x"}},
        |    {"span_term": {"text": "zz"}}]}}}}""".stripMargin) ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // refusals: field mismatch, deeper span nesting in big
    intercept[IllegalArgumentException](ids(
      """{"span_containing": {
        |  "little": {"span_term": {"other": "x"}},
        |  "big": {"span_near": {"clauses": [
        |    {"span_term": {"text": "a"}},
        |    {"span_term": {"text": "b"}}], "slop": 0,
        |    "in_order": true}}}}""".stripMargin))
    intercept[IllegalArgumentException](ids(
      """{"span_containing": {
        |  "little": {"span_term": {"text": "x"}},
        |  "big": {"span_not": {"include":
        |    {"span_term": {"text": "a"}}}}}}""".stripMargin))
  }
  test("case_insensitive on term / prefix / wildcard / regexp " +
      "(ES 7.10+); default stays exact") {
    import spark.implicits._
    val f = GraftFrame(Seq(
      (1L, "Brand#12"), (2L, "brand#12"), (3L, "BRAND#34")
    ).toDF("id", "v"), "id")
    def ids(json: String): Seq[Long] =
      f.esQuery(json, matchOnlyTextFields = false).df
        .select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("""{"term": {"v": "brand#12"}}""") == Seq(2L))
    assert(ids("""{"term": {"v": {"value": "brand#12",
      |"case_insensitive": true}}}""".stripMargin) == Seq(1L, 2L))
    assert(ids("""{"prefix": {"v": {"value": "bra",
      |"case_insensitive": true}}}""".stripMargin) == Seq(1L, 2L, 3L))
    assert(ids("""{"prefix": {"v": "bra"}}""") == Seq(2L))
    assert(ids("""{"wildcard": {"v": {"value": "brand#?2",
      |"case_insensitive": true}}}""".stripMargin) == Seq(1L, 2L))
    assert(ids("""{"regexp": {"v": {"value": "brand#[0-9]+",
      |"case_insensitive": true}}}""".stripMargin) == Seq(1L, 2L, 3L))
    assert(ids("""{"regexp": {"v": "brand#[0-9]+"}}""") == Seq(2L))
    intercept[IllegalArgumentException](ids(
      """{"term": {"v": {"value": "x",
        |"case_insensitive": "yes"}}}""".stripMargin))
  }
  test("terms lookup: array/scalar paths, missing doc matches " +
      "nothing, refusals (no resolver, unknown index, dup id)") {
    import spark.implicits._
    val profiles = Seq(
      (1L, Seq(10L, 20L)), (2L, Seq.empty[Long])
    ).toDF("pid", "keys")
    val lk = EsQueryDsl.frameLookup(
      Map("profiles" -> ((profiles, "pid"))))
    val f = GraftFrame(Seq((10L, "a"), (20L, "b"), (30L, "c"))
      .toDF("k", "v"), "k")
    def ids(id: String): Seq[Long] =
      f.esQuery(s"""{"terms": {"k": {"index": "profiles",
        |"id": "$id", "path": "keys"}}}""".stripMargin,
        matchOnlyTextFields = false, termsLookup = Some(lk))
        .df.select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids("1") == Seq(10L, 20L))
    assert(ids("2") == Seq()) // empty array -> matches nothing
    assert(ids("9") == Seq()) // missing doc -> matches nothing (ES)
    // scalar path works too
    val scal = EsQueryDsl.frameLookup(
      Map("s" -> ((Seq((5L, 10L)).toDF("pid", "one"), "pid"))))
    assert(GraftFrame(Seq((10L, "a")).toDF("k", "v"), "k")
      .esQuery("""{"terms": {"k": {"index": "s", "id": "5",
        |"path": "one"}}}""".stripMargin,
        matchOnlyTextFields = false, termsLookup = Some(scal))
      .len() == 1)
    // refusals
    val none = intercept[IllegalArgumentException](
      f.esQuery("""{"terms": {"k": {"index": "profiles", "id": "1",
        |"path": "keys"}}}""".stripMargin,
        matchOnlyTextFields = false))
    assert(none.getMessage.contains("resolver"), none.getMessage)
    intercept[IllegalArgumentException](ids("1").isEmpty ||
      f.esQuery("""{"terms": {"k": {"index": "ghost", "id": "1",
        |"path": "keys"}}}""".stripMargin,
        matchOnlyTextFields = false,
        termsLookup = Some(lk)).len() >= 0)
    val dup = EsQueryDsl.frameLookup(
      Map("d" -> ((profiles.unionAll(profiles), "pid"))))
    val de = intercept[IllegalArgumentException](
      f.esQuery("""{"terms": {"k": {"index": "d", "id": "1",
        |"path": "keys"}}}""".stripMargin,
        matchOnlyTextFields = false, termsLookup = Some(dup)))
    assert(de.getMessage.contains("unique"), de.getMessage)
  }
  test("synonyms reach through a wrapper's base64 payload") {
    import spark.implicits._
    val f = GraftFrame(Seq((1L, "fast car"), (2L, "slow day"))
      .toDF("id", "text"), "id")
    val b64 = java.util.Base64.getEncoder.encodeToString(
      """{"match": {"text": "quick"}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val got = f.esQuery(s"""{"wrapper": {"query": "$b64"}}""",
      synonyms = Seq("quick, fast")).df
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}






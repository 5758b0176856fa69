package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}
import graft.api.GraftFrame

class EsQueryDslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def orders =
    GraftFrame(Tables.load(spark, TestSpark.sfDir, "orders"), "o_orderkey")
  private def docs =
    GraftFrame(Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id")

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

  test("match/match_phrase/wildcard/prefix/regexp/exists/ids") {
    val m = docs.esQuery("""{"match": {"text": "filter join"}}""").len()
    assert(m == docs.esMatch("filter join", Seq("text")).len())
    val ma = docs.esQuery(
      """{"match": {"text": {"query": "filter join", "operator": "and"}}}""").len()
    assert(ma == docs.esMatch("filter join", Seq("text"), operator = "and").len())
    val p = docs.esQuery("""{"match_phrase": {"text": "the fast"}}""").len()
    assert(p == docs.where(EsMatch.matchPhrase(
      org.apache.spark.sql.functions.col("text"), "the fast")).len())
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
    val e = intercept[IllegalArgumentException](
      orders.esQuery("""{"geo_distance": {"distance": "1km"}}""").len())
    assert(e.getMessage.contains("no engine-independent translation"))
  }
}

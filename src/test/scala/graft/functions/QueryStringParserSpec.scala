package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.api.GraftFrame

/** Fixture-driven grammar tests for [[QueryStringParser]]: each doc
  * is crafted so the expected id set pins one grammar rule —
  * precedence, negation, field scoping, phrases, prefix/wildcard,
  * fuzziness, ranges, the lenient simple-mode contract.
  */
class QueryStringParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    GraftFrame(Seq(
      (1L, "quick brown fox", "news", 100L),
      (2L, "quick red fox", "blog", 250L),
      (3L, "slow brown dog", "news", 400L),
      (4L, "the quick dog runs", "blog", 650L),
      (5L, "brown bear", null.asInstanceOf[String], 800L)
    ).toDF("id", "text", "site", "n"), "id")
  }

  private def qs(query: String, extra: String = ""): Set[Long] = {
    val json = s"""{"query_string": {"query": ${ujson(query)},
      "default_field": "text"$extra}}"""
    fixture.esQuery(json, matchOnlyTextFields = false)
      .df.select("id").collect().map(_.getLong(0)).toSet
  }
  private def sqs(query: String, extra: String = ""): Set[Long] = {
    val json = s"""{"simple_query_string": {"query": ${ujson(query)},
      "fields": ["text"]$extra}}"""
    fixture.esQuery(json, matchOnlyTextFields = false)
      .df.select("id").collect().map(_.getLong(0)).toSet
  }
  private def ujson(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    } + "\""

  test("query_string: terms, default OR, default AND") {
    assert(qs("quick fox") == Set(1L, 2L, 4L))
    assert(qs("quick fox", """, "default_operator": "and"""")
      == Set(1L, 2L))
  }

  test("query_string: AND/OR precedence, parens override") {
    // conventional precedence: AND binds tighter than OR
    assert(qs("dog OR quick AND brown") == Set(1L, 3L, 4L))
    assert(qs("(dog OR quick) AND brown") == Set(1L, 3L))
  }

  test("query_string: +must / -must_not / NOT clause modifiers") {
    // with a +required clause, bare terms are score-only (drop)
    assert(qs("dog +quick") == Set(2L, 4L) ++ Set(1L))
    assert(qs("quick -fox") == Set(4L))
    assert(qs("quick NOT fox") == Set(4L))
    assert(qs("!fox quick", """, "default_operator": "and"""")
      == Set(4L))
    // pure negative: everything except, null field survives must_not
    assert(qs("-quick") == Set(3L, 5L))
  }

  test("query_string: phrase, token prefix, wildcard, fuzzy") {
    assert(qs("\"brown fox\"") == Set(1L))
    assert(qs("qui*") == Set(1L, 2L, 4L))
    assert(qs("br?wn") == Set(1L, 3L, 5L))
    assert(qs("b*wn") == Set(1L, 3L, 5L))
    assert(qs("quik~1") == Set(1L, 2L, 4L))
    assert(qs("quik~") == Set(1L, 2L, 4L)) // bare ~ = AUTO (1 edit at len 4)
    // escaped wildcard is a literal (no token '*qui', so no match)
    assert(qs("qui\\*") == Set.empty[Long])
  }

  test("query_string: field scoping, field groups, ranges, exists") {
    assert(qs("site:news") == Set(1L, 3L))
    assert(qs("site:news quick", """, "default_operator": "and"""")
      == Set(1L))
    assert(qs("site:(news blog) AND fox") == Set(1L, 2L))
    assert(qs("n:[250 TO 650]") == Set(2L, 3L, 4L))
    assert(qs("n:{250 TO 650}") == Set(3L))
    assert(qs("n:[* TO 250]") == Set(1L, 2L))
    assert(qs("n:>=650") == Set(4L, 5L))
    assert(qs("n:<250 OR n:>650") == Set(1L, 5L))
    assert(qs("site:*") == Set(1L, 2L, 3L, 4L))
    // quick AND NOT exists(site): every quick doc has a site → empty
    assert(qs("-site:* quick") == Set.empty[Long])
    // bear AND NOT exists(site): doc 5's null site survives must_not
    assert(qs("-site:* bear") == Set(5L))
  }

  test("query_string: boosts parse and drop; strict errors") {
    assert(qs("quick^2 fox^0.5") == Set(1L, 2L, 4L))
    intercept[IllegalArgumentException](qs("(quick"))
    intercept[IllegalArgumentException](qs("quick AND"))
    intercept[IllegalArgumentException](qs("*"))
    intercept[IllegalArgumentException](qs("/qu.ck/"))
    intercept[IllegalArgumentException](qs("\"quick fox\"~2"))
    intercept[IllegalArgumentException](qs(""))
    intercept[IllegalArgumentException](
      QueryStringParser.queryString("quick", Nil))
  }

  test("simple_query_string: | OR, + AND, -not, phrase, prefix") {
    assert(sqs("quick + fox") == Set(1L, 2L))
    assert(sqs("dog | bear") == Set(3L, 4L, 5L))
    assert(sqs("quick -fox") == Set(4L))
    assert(sqs("\"brown fox\" | bear") == Set(1L, 5L))
    assert(sqs("qui* + -red") == Set(1L, 4L))
    assert(sqs("quik~1") == Set(1L, 2L, 4L))
    assert(sqs("dog | quick + brown") == Set(1L, 3L, 4L))
    assert(sqs("(dog | quick) + brown") == Set(1L, 3L))
  }

  test("highlightTerms: positive term/phrase words only, field-aware") {
    assert(QueryStringParser.highlightTerms(
      "stream | \"hash join\" -merge") == Seq("stream", "hash", "join"))
    // negated subtrees and multi-term leaves contribute nothing
    assert(QueryStringParser.highlightTerms(
      "qui* fuzz~1 -bad n:[1 TO 2] good", simple = false)
      == Seq("good"))
    // field scoping: terms scoped to OTHER fields drop
    assert(QueryStringParser.highlightTerms(
      "title:alpha beta body:gamma", simple = false,
      field = Some("title")) == Seq("alpha", "beta"))
    assert(QueryStringParser.highlightTerms(
      "title:alpha beta", simple = false) ==
      Seq("alpha", "beta")) // no field filter → everything positive
  }

  test("simple_query_string: deterministic noise sweep never throws") {
    // ES's contract: arbitrary user-typed input must parse to SOME
    // query. Deterministic pseudo-noise over the grammar's special
    // chars — each string must compile without an exception (the one
    // documented refusal, phrase slop "..."~N, is excluded by
    // construction: the alphabet omits digits after quotes)
    val chars = "ab |+-()\"*~ c(("
    val noise = (0 until 200).map { i =>
      val len = 1 + (i * 7919) % 12
      (0 until len).map(j =>
        chars((i * 31 + j * 17) % chars.length)).mkString
    }
    noise.foreach { s0 =>
      val c = QueryStringParser.simpleQueryString(s0, Seq("text"))
      assert(c != null, s"noise <$s0> produced null")
    }
  }

  test("simple_query_string: lenient — never throws on user noise") {
    // field syntax is literal text (no token 'site:news' → no match)
    assert(sqs("site:news") == Set.empty[Long])
    // stray parens / operators degrade instead of erroring
    assert(sqs("quick )") == Set(1L, 2L, 4L))
    assert(sqs("(quick") == Set(1L, 2L, 4L))
    assert(sqs("~ quick") == Set(1L, 2L, 4L))
    // empty query = match_all (ES default)
    assert(sqs("   ") == Set(1L, 2L, 3L, 4L, 5L))
    intercept[IllegalArgumentException](
      QueryStringParser.simpleQueryString("quick", Nil))
  }
}

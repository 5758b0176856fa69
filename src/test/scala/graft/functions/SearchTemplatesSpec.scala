package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class SearchTemplatesSpec extends AnyFunSuite {
  import SearchTemplates.render

  test("scalar substitution escapes JSON-string content; numbers " +
      "and booleans render plainly") {
    assert(render("""{"match": {"t": "{{q}}"}}""",
      Map("q" -> "a \"b\" \\ c")) ==
      """{"match": {"t": "a \"b\" \\ c"}}""")
    assert(render("""{"range": {"n": {"gte": {{lo}}, "x": {{on}}}}}""",
      Map("lo" -> 42, "on" -> true)) ==
      """{"range": {"n": {"gte": 42, "x": true}}}""")
    // the rendered output stays parseable JSON even with hostile text
    val out = render("""{"match": {"t": "{{q}}"}}""",
      Map("q" -> "break\" ], \"x\": \""))
    org.json4s.jackson.JsonMethods.parse(out)
  }

  test("toJson renders lists, maps, scalars as JSON values") {
    assert(render("""{"terms": {"l": {{#toJson}}v{{/toJson}}}}""",
      Map("v" -> Seq("en", "fr"))) ==
      """{"terms": {"l": ["en", "fr"]}}""")
    assert(render("""{{#toJson}}m{{/toJson}}""",
      Map("m" -> Map("a" -> 1, "b" -> Seq(2.5)))) ==
      """{"a": 1, "b": [2.5]}""")
  }

  test("refusals: missing param (NOT mustache's silent empty), " +
      "sections, structured value in a scalar slot") {
    val miss = intercept[IllegalArgumentException](
      render("""{"match": {"t": "{{gone}}"}}""", Map("q" -> "x")))
    assert(miss.getMessage.contains("silently delete"), miss.getMessage)
    val sect = intercept[IllegalArgumentException](
      render("""{{#flag}}{"match": 1}{{/flag}}""",
        Map("flag" -> true)))
    assert(sect.getMessage.contains("section"), sect.getMessage)
    intercept[IllegalArgumentException](
      render("""{"t": "{{v}}"}""", Map("v" -> Seq(1, 2))))
  }
}

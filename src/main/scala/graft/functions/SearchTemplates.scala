package graft.functions

/** ES search templates (`PUT _scripts/<id>` + `_search/template`):
  * the Mustache SUBSET with a deterministic, loud contract —
  *
  *  - `{{name}}` — scalar substitution; strings escape JSON-safely
  *    (the template text is JSON source, so a quote in a param must
  *    not break out of its string literal — the injection ES's own
  *    mustache escaping exists for), numbers/booleans render plainly;
  *  - `{{#toJson}}name{{/toJson}}` — structured substitution: the
  *    param renders as a JSON value (lists, maps, scalars) — ES's
  *    standard spelling for a terms list;
  *  - a MISSING param REFUSES. Mustache's default renders empty
  *    text, which silently deletes query clauses — the classic
  *    template foot-gun; this engine's refusal discipline makes it
  *    loud instead (documented deviation; pass an explicit empty
  *    value to mean empty);
  *  - `{{#section}}`/`{{^inverted}}` sections, partials and lambdas
  *    refuse — conditional template LOGIC is the Painless-adjacent
  *    boundary (see the scripted_metric adjudication); build the
  *    query JSON conditionally in code instead.
  *
  * The reference ships query bodies verbatim (`eland/query.py`);
  * templates are the cluster-side rendering half, executed here
  * engine-side. Rendering is driver-side string work — the output is
  * exactly the JSON the DSL faces (`esQuery` / `esQueryScored` /
  * retriever trees) already gate.
  */
object SearchTemplates {

  private val toJsonRe =
    "\\{\\{#toJson\\}\\}\\s*([A-Za-z0-9_.]+)\\s*\\{\\{/toJson\\}\\}".r
  private val varRe = "\\{\\{\\s*([A-Za-z0-9_.]+)\\s*\\}\\}".r
  private val sectionRe = "\\{\\{\\s*[#^/].*?\\}\\}".r

  def render(template: String, params: Map[String, Any]): String = {
    def param(name: String): Any = params.getOrElse(name,
      throw new IllegalArgumentException(
        s"search template references {{$name}} but params has no " +
          s"`$name` (have: ${params.keys.toSeq.sorted.mkString(", ")})" +
          " — mustache would render empty text and silently delete " +
          "the clause; pass the param explicitly"))
    val withJson = toJsonRe.replaceAllIn(template, m =>
      java.util.regex.Matcher.quoteReplacement(
        jsonValue(param(m.group(1)))))
    val leftover = sectionRe.findFirstIn(withJson)
    require(leftover.isEmpty,
      s"search template section '${leftover.get}' is not supported " +
        "(conditional template logic — build the query JSON in code; " +
        "only {{var}} and {{#toJson}}var{{/toJson}} render)")
    varRe.replaceAllIn(withJson, m =>
      java.util.regex.Matcher.quoteReplacement(
        scalarText(param(m.group(1)))))
  }

  /** Scalar rendering for `{{var}}` — the value lands INSIDE the
    * template's JSON source, so strings escape as string-literal
    * CONTENT (no surrounding quotes — the template supplies them,
    * ES's convention: `"query": "{{q}}"`).
    */
  private def scalarText(v: Any): String = v match {
    case s: String => s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    }
    case n: Int     => n.toString
    case n: Long    => n.toString
    case n: Double  => n.toString
    case b: Boolean => b.toString
    case other => throw new IllegalArgumentException(
      s"{{var}} substitution needs a scalar, got $other — use " +
        "{{#toJson}}var{{/toJson}} for structured params")
  }

  private def jsonValue(v: Any): String = v match {
    case s: String  => "\"" + scalarText(s) + "\""
    case n: Int     => n.toString
    case n: Long    => n.toString
    case n: Double  => n.toString
    case b: Boolean => b.toString
    case seq: Seq[_] => seq.map(jsonValue).mkString("[", ", ", "]")
    case m: Map[_, _] => m.map { case (k, value) =>
      "\"" + scalarText(k.toString) + "\": " + jsonValue(value)
    }.mkString("{", ", ", "}")
    case null => "null"
    case other => throw new IllegalArgumentException(
      s"toJson cannot render $other (${other.getClass.getName})")
  }
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native analyzed-text match predicate — the codegen form of eland's
  * `es_match` (eland/query_compiler.py:419-488), SURVEY §7.4's "one
  * genuinely new operator".
  *
  * The composed-builtin form (split + exists over a lambda) is
  * interpreted and re-tokenizes per predicate. This expression
  * tokenizes the column once per row in generated Java (lowercase,
  * whitespace runs, empties dropped — identical to
  * TextAnalysis.tokens) and probes a static HashSet of query tokens
  * shipped via the codegen reference mechanism:
  *  - mode ANY: some text token is in the query set (match, or)
  *  - mode ALL: every query token occurs in the text (match, and)
  */
case class TokenMatch(child: Expression, queryTokens: Seq[String],
                      matchAll: Boolean, stem: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  @transient private lazy val querySet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    queryTokens.foreach(t => s.add(t))
    s
  }

  /** Shared evaluation core, also used verbatim by the generated code
    * (static method call keeps the generated method small).
    */
  override def nullSafeEval(input: Any): Any =
    TokenMatch.matches(input.asInstanceOf[UTF8String].toString,
      querySet, matchAll, stem)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("querySet", querySet,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.TokenMatch.matches(
         |  $c.toString(), $setRef, $matchAll, $stem);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenMatch {

  /** Tokenize-and-probe core: single pass over the string, no token
    * array materialized. ANY short-circuits on first hit; ALL counts
    * distinct query-token hits until all are seen.
    */
  // exactly java-regex \s (space, tab, LF, VT, FF, CR) — NOT
  // Character.isWhitespace, which adds unicode spaces and would
  // diverge from the split-based tokenizer
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def matches(text: String, querySet: java.util.HashSet[String],
              matchAll: Boolean, stem: Boolean): Boolean = {
    if (querySet.isEmpty) return matchAll // ALL of nothing is vacuously true
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val seen = if (matchAll) new java.util.HashSet[String]() else null
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        val raw = lower.substring(start, i)
        val tok =
          if (stem) graft.functions.EnglishMinimalStem.stemString(raw)
          else raw
        if (querySet.contains(tok)) {
          if (!matchAll) return true
          seen.add(tok)
          if (seen.size == querySet.size) return true
        }
      }
    }
    if (matchAll) seen != null && seen.size == querySet.size else false
  }

  private def qTokens(query: String, stem: Boolean): Seq[String] = {
    val ts = graft.functions.TextAnalysis.tokensOf(query)
    // query terms run the SAME analysis chain as the text tokens (ES
    // analyzes both sides with the field's analyzer)
    if (stem) ts.map(graft.functions.EnglishMinimalStem.stemString) else ts
  }

  def any(text: Column, query: String, stem: Boolean = false): Column =
    ColumnBridge.column(TokenMatch(
      ColumnBridge.expression(text), qTokens(query, stem),
      matchAll = false, stem = stem))

  def all(text: Column, query: String, stem: Boolean = false): Column =
    ColumnBridge.column(TokenMatch(
      ColumnBridge.expression(text), qTokens(query, stem),
      matchAll = true, stem = stem))
}

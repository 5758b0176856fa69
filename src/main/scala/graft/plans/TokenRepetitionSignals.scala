package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All thirteen Gopher repetition signals
  * ([[graft.operators.Repetition]]) in ONE compiled pass — the native
  * kernel behind `Repetition.signalsStruct`, bit-identical to the HOF
  * reference (`Repetition.signalsStructHof`, differential-tested):
  * same tokenizer (UTF8String.toLowerCase — the exact lower() the
  * engine runs — then `\s` runs, empties dropped), same CRLF-safe
  * line/paragraph splits, same
  * space-only trim (`UTF8String.trim` semantics), same code-point
  * character counts (`length()` = numChars), and the same single
  * double division per fraction so every bit matches.
  *
  * Why it exists: the HOF formulation is interpreted and measured
  * ~2.7 ms/row at sf0.1 (tokenize + 9 shingle builds + 9 sorts +
  * per-element lambda dispatch); this pass replaces the sorts with
  * hash-map counts — duplicate math needs per-value counts, never an
  * order — and runs inside whole-stage codegen. Same trade
  * [[TokenMinHashPortable]] made (11.2 s → 2.2 s).
  */
case class TokenRepetitionSignals(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"TokenRepetitionSignals requires a STRING child, got ${child.dataType}")

  override def dataType: DataType = TokenRepetitionSignals.schema
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TokenRepetitionSignals.signals(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenRepetitionSignals.signals($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenRepetitionSignals {

  /** Output field order — the [[graft.operators.Repetition]] contract. */
  val SignalNames: Seq[String] = Seq(
    "dup_line_frac", "dup_para_frac",
    "dup_line_char_frac", "dup_para_char_frac",
    "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
    "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
    "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")

  val schema: StructType =
    StructType(SignalNames.map(StructField(_, DoubleType, nullable = false)))

  private val lineRe = Pattern.compile("\\r?\\n")
  private val paraRe = Pattern.compile("\\r?\\n\\s*\\r?\\n")

  // \s of the HOF tokenizer: [ \t\n\f\r]
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Space-only trim — `trim()` / `UTF8String.trim` semantics (Java's
    * String.trim would also eat tabs/newlines and diverge).
    */
  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** (count, 2nd+ count, total cp chars, 2nd+ cp chars) over units. */
  private def unitStats(units: Array[String]): (Long, Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Long]()
    var m = 0L
    var totc = 0L
    var i = 0
    while (i < units.length) {
      val u = units(i)
      m += 1
      totc += cpLen(u)
      counts.merge(u, 1L, (a, b) => a + b)
      i += 1
    }
    var dups = 0L
    var dupc = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cnt = e.getValue
      if (cnt >= 2) {
        val l = cpLen(e.getKey)
        dups += cnt - 1
        dupc += (cnt - 1) * l
      }
    }
    (m, dups, totc, dupc)
  }

  private def ratio(num: Long, den: Long): Double =
    if (den > 0) num.toDouble / den.toDouble else 0.0

  def signals(text: String): InternalRow = {
    val out = new Array[Any](13)

    // lines / paragraphs: split raw text, space-trim, drop empties
    def units(p: Pattern): Array[String] = {
      val parts = p.split(text, -1)
      val buf = new scala.collection.mutable.ArrayBuffer[String](parts.length)
      var i = 0
      while (i < parts.length) {
        val t = spaceTrim(parts(i))
        if (t.nonEmpty) buf += t
        i += 1
      }
      buf.toArray
    }
    val (lm, ldups, ltotc, ldupc) = unitStats(units(lineRe))
    val (pm, pdups, ptotc, pdupc) = unitStats(units(paraRe))
    out(0) = ratio(ldups, lm)
    out(1) = ratio(pdups, pm)
    out(2) = ratio(ldupc, ltotc)
    out(3) = ratio(pdupc, ptotc)

    // tokens: lowercase EXACTLY as the engine's lower() does
    // (UTF8String.toLowerCase — ASCII fast path, else the JVM default-
    // locale slow path; pinning Locale.ROOT here instead would diverge
    // from the HOF reference and the oracle on tr/az-locale JVMs),
    // then the TokenSimHash \s-run walk
    val lower = UTF8String.fromString(text).toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) toks += lower.substring(start, i)
    }
    val m = toks.length
    val lens = new Array[Long](m)
    var j = 0
    while (j < m) { lens(j) = cpLen(toks(j)); j += 1 }
    val tlen = cpLen(text)

    // per gram width: hash-map counts; gram char length = token code
    // points + (width-1) separators, never rebuilt from the string
    var g = 2
    while (g <= 10) {
      var topCnt = 0L
      var topChars = 0L
      var dupChars = 0L
      if (m >= g) {
        val counts = new java.util.HashMap[String, Long]()
        val glens = new java.util.HashMap[String, Long]()
        val sb = new java.lang.StringBuilder()
        var p = 0
        while (p + g <= m) {
          sb.setLength(0)
          var k = 0
          var gl = (g - 1).toLong
          while (k < g) {
            if (k > 0) sb.append(' ')
            sb.append(toks(p + k))
            gl += lens(p + k)
            k += 1
          }
          val gram = sb.toString
          counts.merge(gram, 1L, (a, b) => a + b)
          glens.putIfAbsent(gram, gl)
          p += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val cnt = e.getValue
          val chars = cnt * glens.get(e.getKey)
          // best by (count, char coverage) — the HOF run-scan's order
          if (cnt > topCnt || (cnt == topCnt && chars > topChars)) {
            topCnt = cnt
            topChars = chars
          }
          if (cnt >= 2) dupChars += chars
        }
      }
      if (g <= 4) out(2 + g) = ratio(topChars, tlen) // fields 4..6
      else out(2 + g) = ratio(dupChars, tlen)        // fields 7..12
      g += 1
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  def apply(text: Column): Column =
    ColumnBridge.column(TokenRepetitionSignals(ColumnBridge.expression(text)))
}

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
    TokenRepetitionSignals.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenRepetitionSignals.signals($c);")

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

  /** String entry point (tests, callers outside the expression). */
  def signals(text: String): InternalRow =
    signals(UTF8String.fromString(text))

  def signals(u: UTF8String): InternalRow = {
    val text = u.toString
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
    // then the TokenSimHash \s-run walk. The incoming UTF8String is
    // lowercased directly — no fromString round trip per row.
    val lower = u.toLowerCase.toString
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
    val tlen = cpLen(text)

    // Intern each DISTINCT token to a per-doc char id: two token
    // sequences are equal iff their id sequences are, so gram keys
    // become g-char strings instead of ~6g-char joins — ~6× less
    // hashing/equals work per gram, no separators, no StringBuilder.
    // Per-doc distinct tokens ≥ 65536 would overflow a char; such a
    // doc (≥64k distinct words) falls back to full-text keys below.
    val idOf = new java.util.HashMap[String, Character]()
    val ids = new Array[Char](m)
    // code-point length prefix sums: gram char length is
    // pref(p+g) − pref(p) + (g−1) separators, O(1) per gram
    val pref = new Array[Long](m + 1)
    var j = 0
    var nid = 0
    while (j < m && nid < 65536) {
      val t = toks(j)
      var c = idOf.get(t)
      if (c == null) {
        c = Character.valueOf(nid.toChar); idOf.put(t, c); nid += 1
      }
      ids(j) = c.charValue()
      pref(j + 1) = pref(j) + cpLen(t)
      j += 1
    }
    val interned = j == m
    if (!interned) {
      // finish the prefix sums for the fallback path
      while (j < m) { pref(j + 1) = pref(j) + cpLen(toks(j)); j += 1 }
    }

    // per gram width: ONE hash map whose value packs the gram's char
    // length (high 32 bits) and occurrence count (low 32) — merge
    // increments only the count bits
    var g = 2
    while (g <= 10) {
      var topCnt = 0L
      var topChars = 0L
      var dupChars = 0L
      if (m >= g) {
        val packed = new java.util.HashMap[String, java.lang.Long]()
        val inc: java.util.function.BiFunction[
          java.lang.Long, java.lang.Long, java.lang.Long] =
          (a, _) => a + 1L
        var p = 0
        if (interned) {
          while (p + g <= m) {
            val gram = new String(ids, p, g)
            val gl = pref(p + g) - pref(p) + (g - 1)
            packed.merge(gram, (gl << 32) | 1L, inc)
            p += 1
          }
        } else {
          val sb = new java.lang.StringBuilder()
          while (p + g <= m) {
            sb.setLength(0)
            var k = 0
            while (k < g) {
              if (k > 0) sb.append(' ')
              sb.append(toks(p + k))
              k += 1
            }
            val gl = pref(p + g) - pref(p) + (g - 1)
            packed.merge(sb.toString, (gl << 32) | 1L, inc)
            p += 1
          }
        }
        val it = packed.values().iterator()
        while (it.hasNext) {
          val v = it.next().longValue()
          val cnt = v & 0xFFFFFFFFL
          val chars = cnt * (v >>> 32)
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

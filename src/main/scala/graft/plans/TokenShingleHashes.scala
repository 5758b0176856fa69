package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted-distinct shingle-hash set — the codegen form of
  * `array_sort(array_distinct(transform(array_distinct(shingles(text,
  * n)), s => xxhash64(s))))` used by `Dedup.ngramJaccard`. Same
  * tokenizer as [[TokenSimHash]]/[[TokenMinHash]], same shingle string
  * (tokens joined with a single space, exactly `concat_ws(" ",
  * slice(toks, i, n))`), same per-shingle hash (builtin xxhash64 on the
  * string, seed 42), deduped and ascending-sorted — the layout
  * [[VectorExpressions.sortedIntersectCount]] consumes with a linear
  * merge.
  *
  * One compiled pass instead of four interpreted HOF arrays per row
  * (token array → shingle strings → distinct → hash → distinct →
  * sort). Documents with fewer than `shingleN` tokens yield an empty
  * array (same as the HOF form's `otherwise(array())`).
  */
case class TokenShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, "shingleN must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenShingleHashes.sortedDistinctHashes(
      input.asInstanceOf[UTF8String].toString, shingleN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.plans.TokenShingleHashes.sortedDistinctHashes(
          $c.toString(), $shingleN));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenShingleHashes {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** Positional xxhash64 values of the n-token shingle strings: one
    * hash per window start, IN TOKEN ORDER, duplicates kept — the
    * layout span detection needs (a shared ≥n-token span is a run of
    * consecutive equal window hashes at a constant offset).
    */
  def positionalHashes(text: String, shingleN: Int): Array[Long] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    // collect token boundaries
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val s = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > s) { starts.add(s); ends.add(i) }
    }
    val t = starts.size()
    if (t < shingleN) return Array.emptyLongArray
    val hashes = new Array[Long](t - shingleN + 1)
    val sb = new java.lang.StringBuilder
    var w = 0
    while (w <= t - shingleN) {
      sb.setLength(0)
      var o = 0
      while (o < shingleN) {
        if (o > 0) sb.append(' ')
        sb.append(lower, starts.get(w + o), ends.get(w + o))
        o += 1
      }
      // same value as the xxhash64() builtin on the shingle string
      hashes(w) = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      w += 1
    }
    hashes
  }

  /** Sorted distinct xxhash64 values of the n-token shingle strings. */
  def sortedDistinctHashes(text: String, shingleN: Int): Array[Long] = {
    val hashes = positionalHashes(text, shingleN)
    if (hashes.isEmpty) return hashes
    java.util.Arrays.sort(hashes)
    // in-place dedupe of the sorted run
    var out = 0
    var r = 0
    while (r < hashes.length) {
      if (out == 0 || hashes(r) != hashes(out - 1)) {
        hashes(out) = hashes(r); out += 1
      }
      r += 1
    }
    if (out == hashes.length) hashes else java.util.Arrays.copyOf(hashes, out)
  }

  def apply(text: Column, shingleN: Int): Column =
    ColumnBridge.column(
      TokenShingleHashes(ColumnBridge.expression(text), shingleN))
}

/** Positional (order-preserving, duplicates kept) variant of
  * [[TokenShingleHashes]]: element w is the xxhash64 of the n-token
  * window starting at token position w. Same tokenizer, same shingle
  * string, same hash — only the sort/dedupe differs, because span
  * detection ([[graft.operators.Dedup.sharedSpans]]) needs POSITIONS:
  * a shared span of L ≥ n tokens appears as L−n+1 consecutive equal
  * window hashes at a constant position offset. Documents with fewer
  * than n tokens yield an empty array.
  */
case class TokenPositionalShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {

  require(shingleN >= 1, "shingleN must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TokenShingleHashes.positionalHashes(
      input.asInstanceOf[UTF8String].toString, shingleN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        graft.plans.TokenShingleHashes.positionalHashes(
          $c.toString(), $shingleN));
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenPositionalShingleHashes {
  def apply(text: Column, shingleN: Int): Column =
    ColumnBridge.column(
      TokenPositionalShingleHashes(ColumnBridge.expression(text), shingleN))
}

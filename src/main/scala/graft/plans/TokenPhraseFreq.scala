package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native exact-adjacency phrase frequency over a token array — the
  * codegen form of the HOF spelling the scored `match_phrase` path
  * used before r18:
  *
  * {{{ size(filter(sequence(0, size(toks) - n), p =>
  *       AND_j element_at(toks, p + j + 1) === term_j)) }}}
  *
  * i.e. the count of 0-based window starts where `terms` occur
  * contiguously and in order. The HOF form materializes an int
  * sequence per row and evaluates an interpreted lambda probing the
  * array per (position, term) — measured as the dominant cost of the
  * phrase-scored gates (f26/f31: ~4 s of a 4.5 s warm run at sf0.1).
  * This is one compiled pass over the array per row (guide §"per-task
  * work": prefer codegen expressions in hot paths), bit-identical
  * counts — differential-pinned against the HOF spelling in
  * EsScoredQuerySpec. Arrays shorter than the phrase count 0; NULL
  * input is NULL (callers that need the old `otherwise(0)` arm
  * coalesce at the use site, as EsScoredQuery does).
  */
case class TokenPhraseFreq(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "phrase terms must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    TokenPhraseFreq.count(input.asInstanceOf[ArrayData], termArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseTerms", termArr,
      classOf[Array[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenPhraseFreq.count($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenPhraseFreq {

  /** Window-start count: for each p in [0, n − k], all k terms match
    * contiguously. Null elements never match (the tokenizer emits
    * none; the HOF's `element_at === lit` was null there too, and a
    * null conjunct never passed its filter).
    */
  def count(toks: ArrayData, terms: Array[UTF8String]): Int = {
    val n = toks.numElements()
    val k = terms.length
    var c = 0
    var p = 0
    while (p <= n - k) {
      var j = 0
      var ok = true
      while (ok && j < k) {
        ok = !toks.isNullAt(p + j) &&
          toks.getUTF8String(p + j).equals(terms(j))
        j += 1
      }
      if (ok) c += 1
      p += 1
    }
    c
  }

  def of(toks: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TokenPhraseFreq(ColumnBridge.expression(toks), terms))
}

package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainString(child)` as a codegen predicate over a
  * BROADCAST Bloom filter — the membership prefilter for set-contains
  * pipelines whose exact key set is too large to broadcast as strings.
  *
  * The filter rides a `Broadcast` handle, NOT an embedded byte array:
  * the expression (and thus every serialized task) carries only the
  * broadcast stub, and each executor fetches the filter once via
  * torrent. At ~9.6 bits/element (1% fpp) a billion-element key set is
  * a ~1.2 GB filter — broadcastable where the exact UTF-8 key strings
  * (tens of GB plus hash-set overhead) are not. No false negatives, so
  * `filter(BloomMightContain(...))` is a sound prefilter; false
  * positives only cost a row in whatever exact confirm step follows.
  *
  * Keys are matched by `BloomFilter.putString`/`mightContainString`
  * (UTF-8 bytes) — build the filter with the same `putString` calls
  * ([[graft.operators.Decontam.buildStringBloom]]) or membership is
  * undefined.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  // fail at ANALYSIS on a non-string child, not with a codegen
  // compile error / executor ClassCastException mid-job
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"BloomMightContain requires a STRING child " +
          s"(BloomFilter.putString semantics), got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainString(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // resolve the broadcast ONCE per operator instance, not per row
    val bfName = ctx.addMutableState(classOf[BloomFilter].getName,
      "graftBloom",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $bfName.mightContainString($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bloom))
}

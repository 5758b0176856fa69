package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over whitespace tokens — codegen form of
  * TextAnalysis.simhash64, bit-identical by construction: same
  * tokenizer (regex-\s runs, lowercase, empties dropped) and the same
  * per-token hash (Spark's XxHash64 with the default seed 42, which is
  * exactly what the `xxhash64()` builtin computes), folded into the
  * same sign-of-sum sketch.
  *
  * One pass, no intermediate arrays: the HOF formulation materializes
  * a token array, a 64-long hash array and a 64-int counter array per
  * row in interpreted evaluation.
  */
case class TokenSimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TokenSimHash.simhash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenSimHash.simhash($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenSimHash {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  def simhash(text: String): Long = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val counts = new Array[Int](64)
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        // same value as the xxhash64() builtin on this token
        val h = XxHash64Function.hash(
          UTF8String.fromString(lower.substring(start, i)), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(text: Column): Column =
    ColumnBridge.column(TokenSimHash(ColumnBridge.expression(text)))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expressions for the embedding hot path.
  *
  * The HOF-composed vector math in `functions/VectorOps` is correct
  * but interpreted (higher-order functions don't participate in
  * whole-stage codegen and box per element). These expressions
  * implement the same math as tight primitive loops with `doGenCode`,
  * so an ANN scan over billions of vectors stays inside Tungsten.
  * This is decision (b) of SURVEY.md §7.4's custom-vs-built-in table:
  * a scalar `Expression` for the one genuinely hot kernel.
  *
  * Semantics match VectorOps bit-for-bit: elements cast to double,
  * left-to-right sequential accumulation.
  */
object VectorExpressions {

  private def elemToDouble(dt: DataType, v: String): String = dt match {
    case FloatType  => s"(double) $v"
    case DoubleType => v
    case _          => throw new IllegalArgumentException(s"bad elem type $dt")
  }

  abstract class VectorFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    protected def leftElem: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    protected def rightElem: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType

    protected def getD(a: ArrayData, i: Int, dt: DataType): Double = dt match {
      case FloatType => a.getFloat(i).toDouble
      case _         => a.getDouble(i)
    }
  }

  /** Sequential dot product of two numeric arrays (null if lengths
    * differ, mirroring zip_with's strictness would pad — we reject
    * instead: length mismatch is a data bug worth surfacing).
    */
  case class DotProduct(left: Expression, right: Expression) extends VectorFold {

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) { acc += getD(a, i, leftElem) * getD(b, i, rightElem); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val la = elemToDouble(leftElem, s"$a.get${if (leftElem == FloatType) "Float" else "Double"}($i)")
        val rb = elemToDouble(rightElem, s"$b.get${if (rightElem == FloatType) "Float" else "Double"}($i)")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $acc += $la * $rb; }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity = dot/(|a||b|); null on length mismatch or a
    * zero-norm side.
    */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        val x = getD(a, i, leftElem); val y = getD(b, i, rightElem)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val la = elemToDouble(leftElem, s"$a.get${if (leftElem == FloatType) "Float" else "Double"}($i)")
        val rb = elemToDouble(rightElem, s"$b.get${if (rightElem == FloatType) "Float" else "Double"}($i)")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $la; double $y = $rb;
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  if ($na == 0.0 || $nb == 0.0) {
           |    ${ev.isNull} = true;
           |  } else {
           |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Count of common elements between two SORTED long arrays (distinct
    * elements assumed, as array_sort(array_distinct(...)) produces) —
    * linear merge in generated code. The builtin array_intersect
    * builds a hash set per invocation in interpreted evaluation, which
    * dominates pairwise Jaccard verification at scale.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val n = a.numElements(); val m = b.numElements()
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c"); val n = ctx.freshName("n")
        val m = ctx.freshName("m"); val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $n = $a.numElements(), $m = $b.numElements();
           |while ($i < $n && $j < $m) {
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { $c++; $i++; $j++; }
           |  else if ($x < $y) $i++; else $j++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // Column-level API (Spark 4: Column <-> Expression via the bridge)
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** One-pass `idxmax`/`idxmin` aggregate with a DETERMINISTIC tiebreak:
  * returns the id of the extreme-valued row, and on value ties the
  * smallest id — eland's semantics, where idxmax reports the first
  * matching document in `_id` order (eland/operations.py:207-254).
  *
  * Spark's builtin `max_by` picks an arbitrary row among ties, and the
  * `struct(value, -id)` workaround breaks for non-numeric ids (a string
  * key from csvToFrame index_col) and under ANSI negation. This is a
  * DeclarativeAggregate — pure expression algebra, so it gets partial
  * (map-side) aggregation and whole-stage codegen, and works for any
  * orderable value/id types: one scan, no shuffle beyond the final
  * 2-field buffer per partition.
  */
case class ExtremumBy(valueExpr: Expression, idExpr: Expression, findMax: Boolean)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = valueExpr
  override def right: Expression = idExpr
  override def nullable: Boolean = true
  override def dataType: DataType = idExpr.dataType
  override def prettyName: String = if (findMax) "graft_idxmax" else "graft_idxmin"

  private lazy val bufV = AttributeReference("extremum_v", valueExpr.dataType, nullable = true)()
  private lazy val bufId = AttributeReference("extremum_id", idExpr.dataType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bufV, bufId)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, valueExpr.dataType),
    Literal.create(null, idExpr.dataType))

  /** newer (v,id) wins over current buffer (cv,cid) iff newer value is
    * non-null (and non-NaN for float/double — pandas idxmax/idxmin
    * skipna=True skips NaN, while Spark's ordering treats NaN as
    * largest) and (buffer empty, value strictly better, or equal value
    * with smaller id).
    */
  private def valid(v: Expression): Expression = valueExpr.dataType match {
    case DoubleType | FloatType => And(IsNotNull(v), Not(IsNaN(v)))
    case _                      => IsNotNull(v)
  }

  private def wins(v: Expression, id: Expression, cv: Expression, cid: Expression): Expression = {
    val better = if (findMax) GreaterThan(v, cv) else LessThan(v, cv)
    And(valid(v),
      Or(IsNull(cv),
        Or(better, And(EqualTo(v, cv), LessThan(id, cid)))))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val take = wins(valueExpr, idExpr, bufV, bufId)
    Seq(If(take, valueExpr, bufV), If(take, idExpr, bufId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val take = wins(bufV.right, bufId.right, bufV.left, bufId.left)
    Seq(If(take, bufV.right, bufV.left), If(take, bufId.right, bufId.left))
  }

  override lazy val evaluateExpression: Expression = bufId

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExtremumBy =
    copy(valueExpr = newLeft, idExpr = newRight)
}

object ExtremumBy {
  /** Column API: id of the max-valued row (ties → smallest id). */
  def idxmax(value: Column, id: Column): Column =
    ColumnBridge.column(
      ExtremumBy(ColumnBridge.expression(value), ColumnBridge.expression(id),
        findMax = true).toAggregateExpression())

  /** Column API: id of the min-valued row (ties → smallest id). */
  def idxmin(value: Column, id: Column): Column =
    ColumnBridge.column(
      ExtremumBy(ColumnBridge.expression(value), ColumnBridge.expression(id),
        findMax = false).toAggregateExpression())
}

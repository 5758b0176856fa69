package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the private[sql] Column <-> Expression conversions that
  * Spark 4 hid behind the classic/connect split. Lives in the
  * org.apache.spark.sql namespace solely to satisfy the access
  * qualifier — the standard pattern for Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

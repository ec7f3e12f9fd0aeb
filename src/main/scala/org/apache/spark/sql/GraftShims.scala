package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported pattern for third-party Catalyst expression libraries
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * conversion point and is sql-private). */
object GraftShims {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

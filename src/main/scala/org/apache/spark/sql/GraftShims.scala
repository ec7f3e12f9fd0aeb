package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported pattern for third-party Catalyst expression libraries
  * (Spark 4 moved Column onto ColumnNode; classic.ExpressionUtils is the
  * conversion point and is sql-private). */
object GraftShims {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Session-aware Column → catalyst Expression conversion. Unlike
    * [[expressionOf]] (a lazy ColumnNodeExpression wrapper that only the
    * builtin operators' construction paths unwrap), this runs the classic
    * converter eagerly — required when the expression is stored inside a
    * CUSTOM logical node, where nothing later unwraps the wrapper and it
    * would reach execution unresolved (and unserializable). */
  def catalystExpressionOf(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** Wrap a hand-built logical plan (e.g. graft.plans.TopKPerGroup) as a
    * DataFrame — Dataset.ofRows is the sql-private constructor custom
    * operators need. */
  def dataFrameOf(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}

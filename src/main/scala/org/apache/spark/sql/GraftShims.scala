package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4.x made `Column` a thin wrapper over `ColumnNode` and moved the
  * Expression<->Column conversions behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Extension libraries
  * conventionally access them from the `org.apache.spark.sql` package.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

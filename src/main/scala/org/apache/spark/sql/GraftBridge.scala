package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's private[sql] Column ↔ Expression
  * converters, so graft's native Catalyst expressions can be exposed
  * as user-facing Columns. Same technique used by most Spark extension
  * libraries; no Spark internals are modified.
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

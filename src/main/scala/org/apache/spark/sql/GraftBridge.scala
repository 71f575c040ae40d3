package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column↔Expression converters (the
  * Spark 4 replacement for the removed `new Column(expr)` constructor).
  * Lives in the org.apache.spark.sql package solely to cross the
  * `private[sql]` boundary; keep it to these two calls.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

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

  /** Register a SQL function on a LIVE session (the builder-time path is
    * `SparkSessionExtensions.injectFunction`; an already-built session can
    * only reach the registry through the `private[sql]` sessionState). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}

package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters,
  * needed to expose custom Catalyst expressions as user-facing
  * `Column`s (the pre-4.0 `new Column(expr)` constructor is gone).
  */
object GraftBridge {
  def column(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    classic.ColumnConversions.expression(c)
}

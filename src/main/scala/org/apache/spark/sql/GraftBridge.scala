package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark 4's `private[sql]` Column↔Expression converters,
  * needed to expose custom Catalyst expressions as user-facing
  * `Column`s (the pre-4.0 `new Column(expr)` constructor is gone), and
  * the Dataset↔LogicalPlan converters custom logical operators need.
  */
object GraftBridge {
  def column(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))

  def expression(c: Column): Expression =
    classic.ColumnConversions.expression(c)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzedPlan(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until the listener bus has delivered all queued events —
    * required before reading listener-accumulated metrics (the bus is
    * async; `private[spark]`, hence bridged here). */
  def drainListenerBus(sc: org.apache.spark.SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}

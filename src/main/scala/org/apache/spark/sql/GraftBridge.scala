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

  /** Max broadcast build-side (rows, bytes) over every broadcast
    * exchange in an EXECUTED physical plan, descending into AQE query
    * stages and reused exchanges. The bench harness records this per
    * query so the scale gate can fail any plan whose broadcast build
    * side GROWS with the corpus — the q_doc_assembly class of bug
    * (AQE broadcasting a fact-sized aggregate: invisible at test SF,
    * a guaranteed driver OOM at 100 TB). Plan-string audits can't see
    * this; only the post-AQE executed plan knows what was broadcast. */
  def maxBroadcastBuild(plan: org.apache.spark.sql.execution.SparkPlan): (Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec}
    var rows = 0L
    var bytes = 0L
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: QueryStageExec => walk(s.plan)
      case r: ReusedExchangeExec => walk(r.child)
      case b: BroadcastExchangeLike =>
        rows = math.max(rows, b.metrics.get("numOutputRows").map(_.value).getOrElse(0L))
        bytes = math.max(bytes, b.metrics.get("dataSize").map(_.value).getOrElse(0L))
        b.children.foreach(walk)
      case other => other.children.foreach(walk)
    }
    walk(plan)
    (rows, bytes)
  }

}

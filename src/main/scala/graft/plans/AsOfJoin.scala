package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension: a native backward as-of join
  * (LOCF — for each left row, the most recent right row with the same
  * key at or before the left time), expressed as a custom LogicalPlan
  * planned by a custom SparkStrategy into a custom SparkPlan.
  *
  * This is the deepest rung of the extension ladder (expression →
  * aggregator → optimizer rule → physical operator). The window-based
  * [[graft.operators.AsOf.backward]] stays the declarative/oracle
  * surface; this operator exists for the plan shape a native engine
  * would pick: each side shuffles ONCE on its key and sorts by
  * (key, time), then a streaming per-partition merge emits each left
  * row with the last-seen matching right row — no union, no window
  * buffering of left payloads through the right side's columns, and
  * the merge is O(|L| + |R|) per partition with O(1) state (one
  * buffered right row). At 100 TB both children's exchanges are plain
  * hash shuffles that AQE can coalesce/skew-split, and the merge never
  * materializes a candidate set (same posture as the reference's
  * closest-observation association, experiment_bw_age_calculator.py:291,
  * minus its per-row Python candidate scan).
  *
  * Semantics: keys are null-rejecting equi-join keys (SQL semantics —
  * a NULL key matches nothing); time columns must be LongType (the
  * API casts); a NULL time on the left matches nothing, NULL-time
  * right rows are never candidates; `tolerance >= 0` bounds
  * `leftTime - rightTime` in the same units as the time columns; among
  * equal-time right rows the last in sort order wins (make (key, time)
  * unique upstream for full determinism, as with any ASOF JOIN).
  */
object AsOfJoin {

  /** Backward as-of join of `left` to `right`; output = all left
    * columns + all right columns (null when no match), one row per
    * left row. Time columns are cast to long; `tolerance < 0` = none.
    */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               tolerance: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    // cast the time columns to long up front so the physical operator
    // only ever sees LongType ordering columns
    val l = left.withColumn(leftTime, col(leftTime).cast(LongType))
    val r = right.withColumn(rightTime, col(rightTime).cast(LongType))
    val lPlan = GraftBridge.analyzedPlan(l)
    val rPlan = GraftBridge.analyzedPlan(r)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a => spark.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    val lk = resolve(lPlan, leftKey)
    val rk = resolve(rPlan, rightKey)
    // the node is built already-resolved, so the analyzer never inserts
    // key casts: mismatched key types would hash-partition and compare
    // raw bytes differently per side and silently match nothing
    require(lk.dataType == rk.dataType,
      s"as-of join key types must match exactly: $leftKey is ${lk.dataType}, " +
        s"$rightKey is ${rk.dataType} — cast one side before joining")
    val node = AsOfJoinPlan(lPlan, rPlan, Seq(lk), Seq(rk),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime), tolerance)
    GraftBridge.ofRows(spark, node)
  }
}

/** Logical node: resolved on construction (children analyzed, keys and
  * times resolved attributes), so the analyzer passes it through and
  * the planner hands it to [[AsOfJoinStrategy]]. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    tolerance: Long) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec (children planned
  * later; EnsureRequirements inserts the key exchanges + sorts). */
case class AsOfJoinStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join. Children are hash-clustered on the
  * keys and sorted by (key, time); each partition pair is merged in
  * one streaming pass with a single buffered right row as state. */
case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression, tolerance: Long,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  // left rows pass through in order, one output row each
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val tol = tolerance
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    val lOut = left.output
    val rOut = right.output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val ltBound = BindReferences.bindReference(ltExpr, lOut)
      val rtBound = BindReferences.bindReference(rtExpr, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      // bind against nullability-RELAXED right attrs: the projection must
      // null-check right fields (they are null-extended on no-match)
      val resultProj = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // O(1) merge state: the latest matching right row seen so far
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      var lastT = 0L
      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        val ltv = ltBound.eval(lRow)
        if (lk.anyNull || ltv == null) {
          numOutputRows += 1
          resultProj(joiner(lRow, nullRight))
        } else {
          val lt = ltv.asInstanceOf[Long]
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            if (rk.anyNull) { rBuf.next() } // NULL key: never a candidate
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next(); lastMatch = null; lastKey = null }
              else if (c == 0) {
                val rtv = rtBound.eval(r)
                if (rtv == null) { rBuf.next() } // NULL time: skip
                else if (rtv.asInstanceOf[Long] <= lt) {
                  lastMatch = r.copy(); lastKey = rk.copy()
                  lastT = rtv.asInstanceOf[Long]
                  rBuf.next()
                } else advance = false
              } else advance = false
            }
          }
          val ok = lastMatch != null && keyOrd.compare(lastKey, lk) == 0 &&
            (tol < 0 || lt - lastT <= tol)
          numOutputRows += 1
          resultProj(if (ok) joiner(lRow, lastMatch) else joiner(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

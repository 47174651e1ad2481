package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, expr, last, lit, max, struct, when}
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
               tolerance: Long = -1L): DataFrame =
    backwardKeys(left, right, Seq(leftKey), Seq(rightKey),
      leftTime, rightTime, tolerance)

  /** [[backward]] with a COMPOSITE equi-key. The physical operator is
    * multi-key already — ClusteredDistribution, the merge ordering and
    * the key comparator all take key sequences; only the string API
    * was single-key. The extra key slots are what
    * [[backwardRangeSplit]] uses to shard a hot key by time bucket. */
  def backwardKeys(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[String], rightKeys: Seq[String],
                   leftTime: String, rightTime: String,
                   tolerance: Long = -1L): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
      s"key lists must be non-empty and equal-length; got $leftKeys vs $rightKeys")
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
    val lks = leftKeys.map(resolve(lPlan, _))
    val rks = rightKeys.map(resolve(rPlan, _))
    // the node is built already-resolved, so the analyzer never inserts
    // key casts: mismatched key types would hash-partition and compare
    // raw bytes differently per side and silently match nothing
    lks.zip(rks).foreach { case (lk, rk) =>
      require(lk.dataType == rk.dataType,
        s"as-of join key types must match exactly: ${lk.name} is ${lk.dataType}, " +
          s"${rk.name} is ${rk.dataType} — cast one side before joining")
    }
    val node = AsOfJoinPlan(lPlan, rPlan, lks, rks,
      resolve(lPlan, leftTime), resolve(rPlan, rightTime), tolerance)
    GraftBridge.ofRows(spark, node)
  }

  /** Hot-key-safe backward as-of: SAME results as [[backward]] (spec-
    * proven on fuzz corpora), but the shuffle key is (key, time-bucket)
    * instead of key alone, so a user holding 30% of the corpus splits
    * across timeRange/bucketWidth tasks instead of landing whole on
    * one. This is the "range-split by time upstream" mitigation SURVEY
    * documents for the ordered-scan as-of's hot-key limit — AQE's skew
    * split only rewrites SortMergeJoin, so the custom exec needs its
    * own.
    *
    * Correctness decomposes per left row: the answer is either in the
    * row's own bucket (the composite-key as-of finds it) or it is the
    * globally latest reference in a STRICTLY earlier bucket (the
    * carry-in). Carry-ins are computed on a per-(key, bucket) rollup —
    * one row per key per occupied bucket, NOT per reference row — so
    * the LOCF window that chains them scans O(occupied buckets) rows
    * per key however hot the key is; that rollup is the only state
    * crossing buckets. Among equal-time references the carry
    * arbitrates by payload struct comparison (the base operator's
    * equal-time winner is sort-order-dependent; make (key, time)
    * unique upstream for determinism either way, as with any ASOF
    * JOIN).
    *
    * Sides must not share column names (rename upstream — the output
    * concatenates both sides, as in [[backward]]). Choose bucketWidth
    * ~ timeRange / desired-parallelism for the hottest key; a width
    * covering the whole range degenerates to [[backward]]'s
    * distribution (one bucket, empty carry).
    *
    * DECISION RULE (measured, SCALE_r10 asof_range_split_crossover):
    * stay on [[backward]] until the hottest key's row count exceeds a
    * few times the job's average rows-per-task; below that the split
    * LOSES by a near-constant ~1 s (a <=2M-row hot key's serial
    * ordered scan costs under a second at ~0.8 us/row — less than the
    * composite shuffle + carry rollup the split adds; measured losing
    * at 0.3/0.6/0.9/1.9M hot rows, 30-90% hot share). Past that the
    * plain form's wall-time IS the straggler — one task scans the hot
    * key while the rest of the cluster idles — and the split wins:
    * measured 2.1x (32.7 -> 15.7 s) with 4x lower peak task memory
    * (1.19 GB -> 0.45 GB) at a 90M-row/90%-hot corpus (18M hot rows
    * after filtering) on 32 cores. Hot-key share alone does NOT
    * decide — absolute hot rows vs rows-per-task does. */
  def backwardRangeSplit(left: DataFrame, right: DataFrame,
                         leftKey: String, rightKey: String,
                         leftTime: String, rightTime: String,
                         bucketWidth: Long, tolerance: Long = -1L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive; got $bucketWidth")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"sides must not share column names; both have $dup")
    // exact floor division for LongType: x/w runs as double division
    // (loses exactness past 2^53) and `div` alone truncates toward
    // zero for negatives — subtracting pmod first makes `div` exact
    def bucketOf(timeCol: String): Column =
      expr(s"(cast(`$timeCol` as bigint) - pmod(cast(`$timeCol` as bigint), " +
        s"${bucketWidth}L)) div ${bucketWidth}L")
    val l = left.withColumn(leftTime, col(leftTime).cast(LongType))
      .withColumn("__lb", bucketOf(leftTime))
    val r = right.withColumn(rightTime, col(rightTime).cast(LongType))
      .withColumn("__rb", bucketOf(rightTime))
    val rCols = right.columns.toSeq

    // per-(key, bucket) latest reference, payload carried as a struct:
    // one row per key per occupied bucket — the bounded cross-bucket state
    val rRoll = r.filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .groupBy(col(rightKey).as("__ck"), col("__rb").as("__cb"))
      .agg(max(struct(col(rightTime).as("__t"),
        struct(rCols.map(col): _*).as("__p"))).as("__best"))
    val bestType = rRoll.schema("__best").dataType
    // LOCF chain: probes see the latest rollup from STRICTLY earlier
    // buckets — (bucket, isref) ordering puts same-bucket refs AFTER
    // the probe, so in-bucket references never leak into the carry
    val probes = l.filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .select(col(leftKey).as("__ck"), col("__lb").as("__cb")).distinct()
    val uni = rRoll
      .select(col("__ck"), col("__cb"), lit(1).as("__isref"), col("__best"))
      .unionByName(probes.select(col("__ck"), col("__cb"), lit(0).as("__isref"),
        lit(null).cast(bestType).as("__best")))
    val w = Window.partitionBy(col("__ck"))
      .orderBy(col("__cb"), col("__isref"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = uni
      .withColumn("__carry", last(col("__best"), ignoreNulls = true).over(w))
      .filter(col("__isref") === 0)
      .select(col("__ck"), col("__cb"), col("__carry"))

    val lAug = l.join(carry,
        l(leftKey) === carry("__ck") && col("__lb") === carry("__cb"), "left")
      .drop("__ck", "__cb")
    // in-bucket pass: the same physical operator, composite key
    val joined = backwardKeys(lAug, r, Seq(leftKey, "__lb"), Seq(rightKey, "__rb"),
      leftTime, rightTime, tolerance)
    // fix-up: an in-bucket match always beats the carry (it is at
    // least as recent); otherwise the carry stands if within
    // tolerance. A matched row's right time is non-null by
    // construction, so it is the match indicator.
    val matched = col(rightTime).isNotNull
    val carryOk = col("__carry").isNotNull &&
      (if (tolerance < 0) lit(true)
       else col(leftTime) - col("__carry").getField("__t") <= lit(tolerance))
    val outCols =
      left.columns.toSeq.map(col) ++
        rCols.map { c =>
          when(matched, col(c))
            .otherwise(when(carryOk, col("__carry").getField("__p").getField(c)))
            .as(c)
        }
    joined.select(outCols: _*)
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

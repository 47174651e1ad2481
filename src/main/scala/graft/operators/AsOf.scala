package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest-within-tolerance join.
  *
  * Re-expresses the reference's closest-body-weight association
  * (jobs/transform/experiment_bw_age_calculator.py:291
  * `_get_closest_weight`: for each experiment pick the BW observation
  * with the smallest date distance, within a tolerance window). The
  * reference does this driver-style inside a Python UDF over
  * collect_set'd structs — O(candidates) per row and not scalable.
  *
  * Spark-first design: tag-and-union both sides, ONE shuffle by key +
  * ONE sort by (key, time), then a last-non-null window scan backward
  * and a first-non-null window scan forward; each left row picks the
  * nearer of the two candidates within tolerance. No per-key row
  * explosion, no cross product; cost is a single sort-based window
  * over |L|+|R| rows, which survives arbitrary fan-in per key at
  * 100 TB (skewed keys aside — an as-of needs the full ordered stream
  * per key, so hot keys should be range-split upstream by time).
  */
object AsOf {

  /** Classic backward as-of (LOCF): for each left row, the most recent
    * right row at or before the left time — the database ASOF JOIN
    * (DuckDB `l.t >= r.t`), so queries on this operator oracle-check
    * against a native ASOF JOIN directly. `toleranceSec < 0` = none.
    * Right side should be unique per (key, time); break ties upstream.
    *
    * Same scale shape as [[nearest]]: tag-union, ONE shuffle + sort by
    * (key, time), a single backward scan. */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               valueCols: Seq[String],
               toleranceSec: Long = -1L): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(valueCols.map(col): _*)
    val lhs = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.select(payload).schema.head.dataType))
      .select(("__k" +: "__t" +: "__side" +: "__p" +: leftCols).map(col): _*)
    val rhs = right
      .filter(col(rightKey).isNotNull)
      .withColumn("__k", col(rightKey))
      .withColumn("__t", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("__side", lit(0))
      .withColumn("__p", payload)
      .select(("__k" +: "__t" +: "__side" +: "__p" +: Nil).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right rows sort before left at equal time => "at or before" holds
    val back = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val tolUs = toleranceSec * 1000000L
    val withCand = lhs.unionByName(rhs)
      .withColumn("__bp", last(col("__p"), ignoreNulls = true).over(back))
      .withColumn("__bt", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(back))
      .filter(col("__side") === 1)
    val ok = col("__bt").isNotNull &&
      (if (toleranceSec < 0) lit(true) else col("__t") - col("__bt") <= tolUs)
    withCand
      .withColumn("__c", when(ok, col("__bp")))
      .withColumn("asof_lag_sec",
        when(ok, (col("__t") - col("__bt")) / 1000000L).cast("double"))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__c.$c").as(c)) :+ col("asof_lag_sec"): _*)
  }

  /** Join `left` to the nearest row of `right` (by absolute time
    * distance, within `toleranceSec`).
    *
    * @param valueCols  right columns carried to the output
    * @param rightTieBreak right column ordering the scan within equal
    *   timestamps (deterministic pick among exact-tie candidates)
    * @return left rows + value cols (null when no candidate within
    *   tolerance) + `asof_diff_sec`.
    */
  def nearest(left: DataFrame, right: DataFrame,
              leftKey: String, rightKey: String,
              leftTime: String, rightTime: String,
              valueCols: Seq[String],
              toleranceSec: Long,
              rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = if (valueCols.contains(rightTieBreak)) valueCols
                      else valueCols :+ rightTieBreak
    val payload = struct(payloadCols.map(col): _*)

    val lhs = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(right.select(payload).schema.head.dataType))

    val rhs = right
      .filter(col(rightKey).isNotNull)
      .withColumn("__k", col(rightKey))
      .withColumn("__t", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("__side", lit(0))
      .withColumn("__p", payload)
      .select(("__k" +: "__t" +: "__side" +: "__p" +: Nil).map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val unioned = lhs.select(("__k" +: "__t" +: "__side" +: "__p" +: leftCols).map(col): _*)
      .unionByName(rhs)

    // Right rows sort before left rows at equal time (__side 0 < 1) so a
    // same-instant observation is visible to the backward scan. Tie-break
    // among equal-timestamp right rows is the MINIMUM rightTieBreak in
    // both directions: the backward scan takes the LAST row of its frame
    // (so ties order DESC), the forward scan takes the FIRST (ties ASC).
    val backOrd = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col(s"__p.$rightTieBreak").desc)
    val fwdOrd = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col(s"__p.$rightTieBreak"))
    val back = backOrd.rowsBetween(Window.unboundedPreceding, 0)
    val fwd  = fwdOrd.rowsBetween(0, Window.unboundedFollowing)

    val withCand = unioned
      .withColumn("__bp", last(col("__p"), ignoreNulls = true).over(back))
      .withColumn("__bt", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(back))
      .withColumn("__fp", first(col("__p"), ignoreNulls = true).over(fwd))
      .withColumn("__ft", first(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)

    val tolUs = toleranceSec * 1000000L
    val bd = col("__t") - col("__bt")
    val fd = col("__ft") - col("__t")
    val backOk = col("__bt").isNotNull && bd <= tolUs
    val fwdOk  = col("__ft").isNotNull && fd <= tolUs
    // Ties (equal distance both directions) resolve backward (earlier ts).
    val useBack = backOk && (!fwdOk || bd <= fd)
    val chosen  = when(useBack, col("__bp")).when(fwdOk, col("__fp"))
    val diff    = when(useBack, bd).when(fwdOk, fd)

    withCand
      .withColumn("__c", chosen)
      .withColumn("asof_diff_sec", (diff / 1000000L).cast("double"))
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__c.$c").as(c)) :+ col("asof_diff_sec"): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed range join: ALL right rows within ± `toleranceSec` of each
  * left row (the as-of join's sibling — every match, not the nearest).
  *
  * A naive `a.join(b, key && abs(ta - tb) <= tol)` degenerates to a
  * broadcast-nested-loop or cartesian per key group. This formulation
  * buckets time into tolerance-sized cells and replicates only the
  * LEFT side into its 3 adjacent cells: the join becomes a pure
  * equi-join on (key, cell) — hash-shuffled, AQE-skew-handled — with
  * an exact residual filter. Replication factor is a constant 3,
  * independent of data volume, and each (left, right) pair can meet
  * in exactly one cell (the right row's own), so no dedup is needed.
  */
object RangeJoin {

  def timeRangeJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    leftTime: String, rightTime: String,
                    toleranceSec: Long): DataFrame = {
    val tolUs = toleranceSec * 1000000L
    // integer `div`: a double division of epoch-micros (~1.7e18 > 2^53)
    // would mis-floor cells at the boundaries
    val l = left
      .withColumn("__lt", unix_micros(col(leftTime).cast("timestamp")))
      .withColumn("__lcell", expr(s"__lt div ${tolUs}L"))
      .withColumn("__cell", explode(array(
        col("__lcell") - 1, col("__lcell"), col("__lcell") + 1)))
      .drop("__lcell")
    val r = right
      .withColumn("__rt", unix_micros(col(rightTime).cast("timestamp")))
      .withColumn("__rcell", expr(s"__rt div ${tolUs}L"))

    l.join(r, l("__cell") === r("__rcell") && l(leftKey) === r(rightKey) &&
        abs(col("__rt") - col("__lt")) <= tolUs)
      .withColumn("range_diff_sec", ((col("__rt") - col("__lt")) / 1000000L).cast("double"))
      .drop("__lt", "__rt", "__cell", "__rcell")
  }
}

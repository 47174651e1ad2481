package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap since
  * the previous event of the same key exceeds `gapSec`.
  *
  * One shuffle by key + one sort by (key, time); session id is a
  * running sum over the new-session flag — the classic scalable
  * formulation (no state explosion; the streaming twin lives in
  * graft.streaming.EventStream via session_window).
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) and `session_id`. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val prevT = lag(col(tsCol), 1).over(w)
    val isNew = when(prevT.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prevT)) > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("session_id",
        concat_ws("-", col(keyCol).cast("string"), col("session_seq").cast("string")))
      .drop("__new")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                   gapSec: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gapSec)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("value_sum"))
}

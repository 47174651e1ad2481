package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history builder.
  *
  * The reference re-extracts full snapshots each data release and
  * diffs them (impc_etl dr_diff / snapshot comparison); SCD2 is the
  * generalization a production warehouse needs: collapse a stream of
  * per-key snapshots into attribute *runs* with validity intervals.
  *
  * Scale: one shuffle on the key (both windows share the same
  * partitioning, so Catalyst plans a single Exchange + sort), then a
  * groupBy that partial-aggregates map-side. No self-join of the
  * snapshot table, which is the naive O(n²-prone) formulation.
  */
object Scd2 {

  /** Collapse (key, attrs, ts) snapshots into versioned runs:
    * one row per maximal run of unchanged `attrs`, with
    * `version` (1-based per key), `valid_from_us` / `valid_to_us`
    * (epoch micros; valid_to null = current), and `n_snapshots`.
    *
    * `tieBreak` orders snapshots with identical timestamps
    * deterministically (e.g. an event id).
    */
  def history(snapshots: DataFrame, keyCols: Seq[String], tsCol: String,
              attrCols: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val ord: Seq[Column] = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    // a snapshot opens a new version when ANY attribute null-safe
    // differs from the previous snapshot (lag) — first row always opens
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val marked = snapshots
      .withColumn("__chg", when(row_number().over(w) === 1 || changed, 1).otherwise(0))
      .withColumn("version", sum(col("__chg")).over(w))
    val runs = marked
      .groupBy((keyCols ++ Seq("version") ++ attrCols).map(col): _*)
      .agg(min(unix_micros(col(tsCol))).as("valid_from_us"),
        count(lit(1)).as("n_snapshots"))
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(col("version"))
    runs.withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w2))
  }
}

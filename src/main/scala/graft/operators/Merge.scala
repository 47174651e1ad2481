package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert without a transactional table format.
  *
  * The reference reprocesses whole releases; an incremental 100 TB
  * pipeline instead merges a (small) change set into a (huge) target
  * snapshot. Formulated as anti-join + union — ONE shuffle of each
  * side on the key — rather than the full-outer-join-with-per-column
  * coalesce formulation, which shuffles the same data but then drags
  * every column through null-merge expressions.
  *
  * At scale the target side should be bucketed on the key so the
  * anti-join co-locates and only the change set shuffles.
  */
object Merge {

  /** Upsert: rows of `updates` replace same-key rows of `target`;
    * new keys are appended. Schemas must match by name; `updates`
    * must be unique per key (duplicate change rows would all land —
    * dedupe the change set first, e.g. keep-latest by a ts column). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Change-data-capture apply: `changes` carries `opCol` with
    * 'upsert' or 'delete'. Deletes remove the key from the target;
    * everything else (including a malformed NULL op) is treated as an
    * upsert — the null-SAFE comparison matters: a plain `=!= "delete"`
    * filter is NULL for NULL ops, which would drop the row from the
    * upsert set while its key still anti-joins the target row away,
    * silently deleting it. */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String = "_op"): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    val ups = changes.filter(!(col(opCol) <=> "delete")).drop(opCol)
    target.join(touched, keys, "left_anti").unionByName(ups)
  }
}

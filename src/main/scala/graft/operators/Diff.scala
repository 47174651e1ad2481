package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset diff: classify keys of two snapshots as added / removed /
  * changed / unchanged.
  *
  * Reference provenance: jobs/compare/dr_diff.py — the reference
  * compares two data releases by experiment id and reports
  * added/removed/changed documents. Re-expressed as one full outer
  * join on the key plus a content hash per side (hash computed before
  * the join so only (key, hash) shuffles, not the payload).
  */
object Diff {

  /** @param valueCols columns whose concatenated md5 defines "changed" */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
                   valueCols: Seq[String]): DataFrame = {
    def hashed(df: DataFrame, side: String) =
      df.select(col(keyCol).as(s"${side}_key"),
        md5(concat_ws("|", valueCols.map(c =>
          coalesce(col(c).cast("string"), lit(""))): _*)).as(s"${side}_hash"))

    hashed(oldDf, "old")
      .join(hashed(newDf, "new"), col("old_key") === col("new_key"), "full_outer")
      .select(
        coalesce(col("old_key"), col("new_key")).as(keyCol),
        when(col("old_key").isNull, "added")
          .when(col("new_key").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged").as("diff_status"))
  }
}

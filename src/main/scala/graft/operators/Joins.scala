package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join patterns beyond plain equi-joins.
  *
  * Reference provenance: jobs/transform/specimen_cross_ref.py:130 and
  * cross_ref_helper.py — entities are matched on a primary key and the
  * unmatched remainder is retried against secondary keys (production
  * centre falls back to phenotyping centre, then to the colony's).
  */
object Joins {

  /** Fallback-key (coalesce-key) left enrichment: join `left` to
    * `primary` on `primaryKeys` (leftCol -> rightCol); rows that miss
    * retry against `secondary` on `secondaryKeys`. Adds `match_source`
    * ('primary' | 'secondary' | 'none').
    *
    * `primary` and `secondary` must carry identically-named payload
    * columns (the two branches are unioned) and be unique per key, and
    * key column names must not collide with `left`'s.
    *
    * Scale: two shuffles, the second only over the shrinking unmatched
    * remainder — never a second full pass over the matched rows.
    */
  def fallbackJoin(left: DataFrame,
                   primary: DataFrame, primaryKeys: (String, String),
                   secondary: DataFrame, secondaryKeys: (String, String)): DataFrame = {
    val (lpk, rpk) = primaryKeys
    val (lsk, rsk) = secondaryKeys
    val j1 = left.join(primary, col(lpk) === col(rpk), "left")
    val hit = j1.filter(col(rpk).isNotNull)
      .withColumn("match_source", lit("primary"))
      .drop(rpk)
    val miss = j1.filter(col(rpk).isNull).select(left.columns.map(col): _*)
    val retried = miss.join(secondary, col(lsk) === col(rsk), "left")
      .withColumn("match_source",
        when(col(rsk).isNotNull, lit("secondary")).otherwise(lit("none")))
      .drop(rsk)
    hit.unionByName(retried)
  }
}

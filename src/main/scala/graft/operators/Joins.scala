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
    * columns (coalesced per column, primary wins) and be unique per
    * key, and key column names must not collide with `left`'s.
    *
    * Scale: a SINGLE pass over `left` — two chained left joins, the
    * secondary's condition gated on the primary miss — rather than
    * filter-and-union of the first join's output, which would
    * materialize that join twice (ReuseExchange dedups shuffles, not
    * the join work above them).
    */
  def fallbackJoin(left: DataFrame,
                   primary: DataFrame, primaryKeys: (String, String),
                   secondary: DataFrame, secondaryKeys: (String, String)): DataFrame = {
    val (lpk, rpk) = primaryKeys
    val (lsk, rsk) = secondaryKeys
    val payload = primary.columns.filterNot(_ == rpk).toSeq
    require(secondary.columns.filterNot(_ == rsk).toSet == payload.toSet,
      "primary and secondary must carry identically-named payload columns")
    val p = payload.foldLeft(primary)((df, c) => df.withColumnRenamed(c, s"__p_$c"))
    val s = payload.foldLeft(secondary)((df, c) => df.withColumnRenamed(c, s"__s_$c"))
    left
      .join(p, col(lpk) === col(rpk), "left")
      .join(s, col(rpk).isNull && col(lsk) === col(rsk), "left")
      .withColumn("match_source",
        when(col(rpk).isNotNull, lit("primary"))
          .when(col(rsk).isNotNull, lit("secondary"))
          .otherwise(lit("none")))
      .select(left.columns.map(col) ++
        payload.map(c => coalesce(col(s"__p_$c"), col(s"__s_$c")).as(c)) :+
        col("match_source"): _*)
  }
}

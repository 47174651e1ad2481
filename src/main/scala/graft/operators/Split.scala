package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-free dataset splitting: train/val/test assignment that is a
  * pure function of the near-dup CLUSTER a document belongs to, so two
  * near-duplicates can never land on opposite sides of a split (the
  * train-on-val contamination every eval pipeline must rule out; the
  * reference rules out the analogous control/mutant leakage by keying
  * its splits on colony, impc_etl/jobs/transform cross-ref rules).
  */
object Split {

  val HashSpace: Long = 16777216L // 16^6: first 6 md5 hex digits

  /** Integer split thresholds for (trainPct, valPct) of [[HashSpace]],
    * exact integer arithmetic so any engine replays them. */
  def thresholds(valPct: Int, testPct: Int): (Long, Long) = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"val+test must leave room for train: $valPct+$testPct")
    (HashSpace * (100 - valPct - testPct) / 100,
     HashSpace * (100 - testPct) / 100)
  }

  /** Assign every row of `docs` to train/val/test by hashing the
    * representative of its connected component in `edges` (near-dup
    * pairs, id_a/id_b). Documents with no near-dup edge form singleton
    * components keyed by their own id. Returns (idCol, component,
    * split), one row per input row.
    *
    * The assignment is an md5-threshold draw on the COMPONENT id — the
    * [[Mix]]/q_sample_stratified hash-uniform pattern: deterministic
    * under repartitioning, replayable by any engine, and monotone in
    * the percentages (growing valPct only moves docs train->val, never
    * reshuffles survivors). Scale: the components operator is the
    * star-contraction O(log^2) loop ([[Components]]); the final join
    * is docs ⟕ components on the id — components only carries nodes
    * WITH edges (<= docs rows), an AQE-sized shuffle or broadcast.
    */
  def leakFree(docs: DataFrame, idCol: String, edges: DataFrame,
               tag: String = "spl", valPct: Int = 10, testPct: Int = 10): DataFrame = {
    val (trainMax, valMax) = thresholds(valPct, testPct)
    val comp = Components.connectedComponents(edges)
      .withColumnRenamed("node", idCol)
    val u = conv(substring(md5(concat(lit(tag),
      col("component").cast("string"))), 1, 6), 16, 10).cast("long")
    docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(u < trainMax, "train").when(u < valMax, "val").otherwise("test"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salted join for hot join keys.
  *
  * AQE's skew split re-plans a skewed sort-merge join at runtime
  * (spec-verified in ScaleTechniquesSpec) and is the first tool to
  * reach for. Explicit salting remains necessary when the partitioning
  * must stay STABLE — a downstream bucketed/partitioned write keyed on
  * the join key, an iterative loop reusing the exchange — or when the
  * hot key hides below AQE's per-partition thresholds. The reference
  * hits the same wall on its specimen⋈experiment joins (one mouse line
  * dominating a procedure); its fix is cluster-level repartitioning,
  * re-expressed here as a declarative transform.
  */
object SkewJoin {

  /** Inner equi-join with the probe side salted into `salts` slices
    * and the build side replicated `salts` times; the shuffle key
    * becomes (key, salt) so one hot key spreads over `salts`
    * partitions. Row set is identical to the unsalted join. `saltBy`
    * must be a deterministic probe-side column (NOT rand(): replays
    * and retries must salt identically) with cardinality well above
    * `salts` — a line number, a sub-id, a hash of the payload. */
  def salted(probe: DataFrame, build: DataFrame,
             probeKey: String, buildKey: String,
             salts: Int, saltBy: Column): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val p = probe.withColumn("__gsalt", pmod(hash(saltBy), lit(salts)))
    val b = build.withColumn("__gsalt", explode(array((0 until salts).map(lit): _*)))
    p.join(b, p.col(probeKey) === b.col(buildKey) && p.col("__gsalt") === b.col("__gsalt"))
      .drop("__gsalt")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Hot-key stress corpus: copies a (possibly ScaleGen-derived) events
  * table remapping a deterministic fraction of rows onto ONE user —
  * the skew shape that breaks hash-partitioned per-key operators. The
  * as-of family is the stated target: AsOfJoinExec requires
  * HashClusteredDistribution on the user key, so a hot user lands
  * whole on one task and AQE's skew-join splitting (which only
  * rewrites SortMergeJoin) cannot help — SURVEY documents "range-split
  * by time upstream" as the mitigation; tools/run_scale.sh runs
  * q_asof_plan/q_asof_backward on this corpus vs the uniform one to
  * MEASURE that limit instead of asserting it.
  *
  * Usage: runMain graft.SkewGen <srcDir> <outDir> [hotPct=30]
  * Only events.parquet is written (the as-of queries read nothing
  * else); row count and all non-key columns are unchanged, so the
  * uniform run on srcDir is the exact control.
  */
object SkewGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: SkewGen <srcDir> <outDir> [hotPct]")
    val (srcDir, outDir) = (args(0), args(1))
    val hotPct = if (args.length > 2) args(2).toInt else 30
    require(hotPct >= 1 && hotPct <= 99, s"hotPct in [1,99]; got $hotPct")
    val spark = GraftSession.local()
    val ev = graft.sources.Tables(spark, srcDir).events
    // deterministic selection by event_id residue — replayable, and
    // uniform across time so the hot user is hot in EVERY time range
    ev.withColumn("user_id",
        when(pmod(col("event_id"), lit(100)) < hotPct, lit(1L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val hot = spark.read.parquet(s"$outDir/events.parquet")
      .filter(col("user_id") === 1L).count()
    val total = ev.count()
    System.err.println(f"[skewgen] $outDir: $total rows, hot user holds $hot " +
      f"(${100.0 * hot / total}%.1f%%)")
    spark.stop()
  }
}

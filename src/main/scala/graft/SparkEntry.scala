package graft

import graft.queries.{QueriesCore, QueriesDepth, QueriesExtra, QueriesPipeline, QueriesStats, QueriesText}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory behind each query and §7 for the build plan. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. q_pipeline_e2e is the reference's whole dataflow shape —
    * clean → cross-ref → as-of → derive → observations → wide doc —
    * in one oracle-checked plan. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesText.queries ++ QueriesExtra.queries ++
      QueriesDepth.queries ++ QueriesPipeline.queries ++ QueriesStats.queries

  /** DuckDB-runnable ANSI SQL oracle per query; omitted for
    * non-SQL-expressible ops (driver falls back to rows-only). */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesText.oracles ++ QueriesExtra.oracles ++
      QueriesDepth.oracles ++ QueriesPipeline.oracles ++ QueriesStats.oracles
}

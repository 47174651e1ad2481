package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan linter over the ENTIRE query surface: every SparkEntry query
  * is planned (not executed) and checked for plan-shape red flags.
  * This is the automated version of the per-query `graft.Explain`
  * audits — a regression gate so a future edit can't silently
  * introduce a scale-killer plan.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // these runners EXECUTE on construction (streaming memory-sink round
  // trips, and iterative operators whose localCheckpoints materialize
  // during build, leaving only a scan of the checkpointed RDD to
  // audit) — their internal plans are covered by operator-level specs
  // and the differential fuzz instead
  private val executesOnBuild = Set(
    "q_stream_window", "q_stream_sessions", "q_stream_interval", "q_stream_dedup",
    "q_stream_asof",
    "q_media_pipeline",
    "q_dedup_clusters", "q_shingle_clusters", "q_hierarchy", "q_ancestor_arrays",
    "q_curate_e2e", // full curation chain: measured counts + checkpoints at build
    "q_ingest_night", // Targets DAG: materializes parquet targets at build
    "q_stream_cdc", // streaming foreachBatch fold runs to completion at build
    "q_graph_bfs", "q_hits", // iterative: edge counts + eager checkpoints at build
    "q_bitext_mine") // k-means training + eager checkpoint at build

  /** Plan every query with AQE off: the non-adaptive physical plan
    * materializes WholeStageCodegen spans at plan time (under AQE the
    * pre-execution string is just AdaptiveSparkPlan isFinalPlan=false). */
  private lazy val plans: Map[String, String] = {
    val conf = spark.conf
    val saved = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => executesOnBuild.contains(n) }
      .map { case (name, fn) =>
        name -> fn(spark, SparkTestSession.sfDir).queryExecution.executedPlan.toString
      }.toMap
    finally conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("no query plans a raw cartesian product") {
    // BroadcastNestedLoopJoin over a broadcast query set (ANN
    // brute-force) is deliberate and bounded; a raw CartesianProduct
    // (both sides unbounded) is always a bug at scale.
    val offenders = plans.collect {
      case (name, plan) if plan.contains("CartesianProduct") => name
    }
    assert(offenders.isEmpty, s"raw cartesian products in: $offenders")
  }

  test("no query re-derives a lambda chain inside a Filter") {
    // the InferFiltersFromGenerate + PushDownPredicates interaction
    // (excluded in GraftSession/SparkTestSession) inlines a derived
    // array's whole tokenize/HOF chain into an interpreted
    // below-Generate filter; this gate catches the pattern coming back
    // through any other rule or a future Spark upgrade
    val offenders = plans.collect {
      case (name, plan) if plan.linesIterator.exists(l =>
        l.contains("Filter ") && l.contains("lambdafunction")) => name
    }
    assert(offenders.isEmpty, s"lambda chain re-derived in a Filter in: $offenders")
  }

  test("every query keeps whole-stage codegen in its plan") {
    // a query whose plan has NO codegen span (the `*(n)` stage marker
    // in toString) runs fully interpreted — a smell that a non-codegen
    // expression crept into the hot path
    val offenders = plans.collect {
      case (name, plan) if !plan.contains("*(") => name
    }
    assert(offenders.isEmpty, s"no codegen span in: $offenders")
  }

  test("q_bloom_join prunes the fact scan with might_contain") {
    // the filter must reach the lineitem side BEFORE the join — if a
    // rewrite ever drops it, the query silently degrades to the plain
    // join (correct, but the whole point of the operator gone)
    val plan = plans("q_bloom_join")
    assert(plan.contains("might_contain"), "bloom predicate missing")
    assert(plan.contains("bloom_filter_agg") || plan.contains("Subquery"),
      "bloom must be built in-plan")
  }

  test("q_batch_query broadcasts the dim and partial-aggregates every rollup") {
    val plan = plans("q_batch_query")
    // the customer projection is dim-sized — it must ride a broadcast
    // join, not shuffle the rolled-up fact side
    assert(plan.contains("BroadcastHashJoin"), "dim join did not broadcast")
    // the collect_set rollups must map-side combine (partial_ before
    // the exchange) so the shuffle carries reduced sets, not raw rows
    assert(plan.contains("partial_collect_set"), "rollup not partial-aggregated")
  }

  test("q_mannwhitney runs on a single fact-scale hash exchange") {
    // rank window + tie window + the U aggregation all cluster by
    // event_type: Catalyst must reuse ONE hashpartitioning exchange
    // (the only other exchange is the display orderBy's range one)
    val hashExchanges = plans("q_mannwhitney").linesIterator
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges")
  }
}

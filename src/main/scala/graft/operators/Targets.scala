package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-target orchestration — how the reference pipeline is actually
  * OPERATED (impc_etl/workflow/: every job is a Luigi `SparkSubmitTask`
  * whose `output()` is a parquet target under the ImpcConfig output
  * prefix; `luigi.build` walks `requires()` edges, skips any task whose
  * target already exists, and a deleted target re-runs exactly that
  * task plus its downstream cone — parquet targets double as
  * checkpoints between jobs).
  *
  * Spark-first reformulation: a [[Stage]] is a named DataFrame producer
  * over its upstream targets; [[run]] materializes stages in dependency
  * order, skipping any whose parquet target is already COMPLETE
  * (`_SUCCESS` marker — the same completeness contract the versioned
  * streaming store uses, EventStream.latestDocs), and re-running the
  * downstream cone of anything that did run. Because each stage reads
  * its inputs back from parquet targets rather than chaining lineage,
  * a 20-stage DAG never accretes a 20-stage logical plan, each stage is
  * independently restartable, and a crash mid-write leaves a target
  * without `_SUCCESS` that the next run redoes — Luigi's idempotent
  * re-run semantics without an orchestrator process.
  *
  * Deliberately NOT a scheduler: no workers, no cron, no RPC — at
  * 100 TB the cluster manager owns execution; what survives from the
  * Luigi layer is the TARGET discipline (completeness markers +
  * skip-if-done + cone invalidation), which is this.
  */
object Targets {

  /** A named pipeline stage: `build` receives the materialized
    * upstream targets keyed by stage name. */
  final case class Stage(name: String, deps: Seq[String],
                         build: (SparkSession, Map[String, DataFrame]) => DataFrame)

  /** What a [[run]] did: stages that executed vs were target-skipped,
    * in execution order. */
  final case class RunReport(ran: Seq[String], skipped: Seq[String])

  def targetPath(rootDir: String, stage: String): String =
    s"$rootDir/$stage.parquet"

  private def isComplete(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(new Path(p, "_SUCCESS"))
  }

  /** Deterministic topological order (stable within a dependency rank:
    * declaration order breaks ties). Cycles and unknown deps are
    * config errors — fail fast, not at materialization time. */
  private[graft] def topoSort(stages: Seq[Stage]): Seq[Stage] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size, "duplicate stage names")
    stages.flatMap(_.deps).foreach(d =>
      require(byName.contains(d), s"unknown dependency '$d'"))
    val done = scala.collection.mutable.LinkedHashMap.empty[String, Stage]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(s: Stage): Unit = if (!done.contains(s.name)) {
      require(visiting.add(s.name), s"dependency cycle through '${s.name}'")
      s.deps.foreach(d => visit(byName(d)))
      visiting.remove(s.name)
      done(s.name) = s
    }
    stages.foreach(visit)
    done.values.toSeq
  }

  /** Run the DAG against `rootDir`, skipping complete targets. A stage
    * runs iff its target is incomplete, it is listed in `force`, or
    * any of its dependencies ran in THIS invocation (cone
    * invalidation — matching Luigi, where deleting an upstream target
    * cascades because downstream outputs are stale by definition). */
  def run(spark: SparkSession, rootDir: String, stages: Seq[Stage],
          force: Set[String] = Set.empty): RunReport = {
    val ran = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    val ranSet = scala.collection.mutable.Set.empty[String]
    topoSort(stages).foreach { s =>
      val target = targetPath(rootDir, s.name)
      val dirty = force.contains(s.name) || s.deps.exists(ranSet) ||
        !isComplete(spark, target)
      if (dirty) {
        val ups = s.deps.map(d =>
          d -> spark.read.parquet(targetPath(rootDir, d))).toMap
        s.build(spark, ups).write.mode("overwrite").parquet(target)
        ranSet += s.name
        ran += s.name
      } else skipped += s.name
    }
    RunReport(ran.result(), skipped.result())
  }

  /** Read a (complete) stage target back — the downstream consumer
    * surface, and the checkpoint-reuse path between pipeline runs. */
  def read(spark: SparkSession, rootDir: String, stage: String): DataFrame = {
    val target = targetPath(rootDir, stage)
    require(isComplete(spark, target), s"target '$stage' is not complete")
    spark.read.parquet(target)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Canonical session builder for the engine's entry points: AQE on,
  * shuffle partitions sized to the executor core count (2-3x total
  * cores on a real cluster — AQE coalesces either way), UTC, and the
  * legacy nanos-as-long parquet flag the events table needs (set here
  * ONCE instead of mutating conf inside table getters).
  */
object GraftSession {

  /** Cores to use locally: SPARK_GRAFT_CPUS, else min(32, available). */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(32, Runtime.getRuntime.availableProcessors).toString)

  def builder(cores: String = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def local(cores: String = cpus): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Fail FAST on bench-only env knobs: q_curate_e2e reads these from
    // the shared queries map, and a stray exported var would make the
    // DuckDB oracle check a non-default chain (the pruned strategy can
    // diverge spuriously at the recall margin on non-test corpora; a
    // scaled budget changes the manifest outright). The invocation
    // convention ("Verify never sets them") is now enforced, not
    // assumed.
    val benchOnly = Seq("SPARK_GRAFT_NEARDUP", "SPARK_GRAFT_CURATE_BUDGET",
        "SPARK_GRAFT_CURATE_KEEPPPM")
      .filter(sys.env.contains)
    require(benchOnly.isEmpty,
      s"bench-only env knob(s) ${benchOnly.mkString(", ")} set — Verify " +
        "must check the default config; unset them (the oracle SQL " +
        "replays the default lossless chain at the default budget)")
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration
    // on a subset; the driver always runs the full surface)
    val only: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // first line of the message is the diagnosable cause; the full
        // stack is already on stderr. Recording failures in an artifact
        // (not just a log) is what makes the next environment drift a
        // 5-minute fix instead of 32 silently-absent queries (VERDICT r7
        // finding 3).
        failed(name) = s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/_failed.json"),
      failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted plans for the named queries (all
  * when none named) — used to check pushdown/broadcast/codegen. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, d).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}

package graft

import graft.functions.HashFunctions.minhashSig
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics (not part of the driver contract). */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables(spark, d).documents

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    println("[diag] docs = " + docs.count())
    val sh = docs.select(col("doc_id"), tokens(col("text")).as("__toks"))
      .select(col("doc_id"), array_distinct(shinglesOfTokens(col("__toks"), 3)).as("__sh"))
    time("shingles only")(sh.select(sum(size(col("__sh")))).collect())
    val sig = sh.withColumn("minhash", minhashSig(col("__sh"), 32))
    time("shingles+minhash")(sig.select(sum(size(col("minhash")))).collect())

    val rows = 4
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("minhash"), b * rows + 1, rows)).as("bh"))): _*)).as("lsh"))
      .select(col("doc_id"), col("lsh.band"), col("lsh.bh"))
    val buckets = banded.groupBy("band", "bh").agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    time("bucket stats") {
      buckets.select(count(lit(1)).as("n_buckets"), max(size(col("ids"))).as("max_sz"),
        sum(size(col("ids")) * (size(col("ids")) - 1) / 2).as("n_pairs")).show()
    }
    // ngram gating stats
    val gated = sh.select(col("doc_id"),
      (size(col("__sh")) / 10).cast("int").as("lenb"),
      array_min(transform(col("__sh"), s => xxhash64(s))).as("pref"))
    val gb = gated.groupBy("lenb", "pref").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    time("ngram bucket stats") {
      gb.select(count(lit(1)), max(col("n")), sum(col("n") * (col("n") - 1) / 2)).show()
    }
    spark.stop()
  }
}

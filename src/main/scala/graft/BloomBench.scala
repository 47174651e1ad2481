package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures BloomPrune's reason to exist: the TOTAL-query shuffle-bytes
  * reduction of the bloom-pruned join vs the plain join (all stages —
  * the shared aggregation shuffle is counted on both sides, so the
  * isolated fact-side reduction is stronger than the reported ratio),
  * across dim
  * selectivities, with broadcast DISABLED — the operator's premise is
  * a dim too big to broadcast (at test SF the filtered dim is tiny and
  * AQE would broadcast it, making both variants shuffle-free and the
  * comparison vacuous; at 100 TB the dim outgrows the threshold and
  * the fact pays a full shuffle unless pruned — this harness models
  * that regime directly).
  *
  * Emits target/bloom_<tag>.json: per selectivity, {sec,
  * shuffle_write} for plain vs bloom plus the reduction ratio and a
  * result-parity row count check. tools/run_scale.sh invokes it on
  * the x32 corpus; scale_report.py folds the file into SCALE_r{N}.
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tag = sys.env.getOrElse("SPARK_GRAFT_BLOOM_TAG", "x1")
    val spark = GraftSession.local()
    // the 100 TB regime under test: dim NOT broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // Spark's own runtime bloom injection would blur the A/B
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    val listener = new BenchListener
    spark.sparkContext.addSparkListener(listener)
    val t = graft.sources.Tables(spark, sfDir)

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy("p_brand")
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("brand_revenue"),
          count(lit(1)).as("n_items"))

    def run(df: DataFrame): (Double, Long, Long) = {
      listener.reset()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext, 10000)
      (sec, listener.shuffleWrite.get, listener.input.get)
    }

    val out = Seq(5, 20, 50).map { sel =>
      val dim = t.part.filter(col("p_size") <= sel)
      val plainJoin = t.lineitem.join(dim, col("l_partkey") === col("p_partkey"))
      val bloomJoin = graft.operators.BloomPrune.join(t.lineitem, dim,
        "l_partkey", "p_partkey", expectedItems = 200000L, numBits = 1L << 22)
      // result parity first (cheap count; the oracle covers values)
      val nPlain = agg(plainJoin).count()
      val nBloom = agg(bloomJoin).count()
      require(nPlain == nBloom, s"sel=$sel: bloom changed the result ($nPlain vs $nBloom)")
      // warm once each, then measure (min of 2)
      val plain = Seq(run(agg(plainJoin)), run(agg(plainJoin))).minBy(_._1)
      val bloom = Seq(run(agg(bloomJoin)), run(agg(bloomJoin))).minBy(_._1)
      val ratio = bloom._2.toDouble / math.max(1L, plain._2)
      System.err.println(f"[bloom] p_size<=$sel%-3d plain ${plain._1}%6.2fs " +
        f"shW=${plain._2 / 1048576.0}%8.1fMB | bloom ${bloom._1}%6.2fs " +
        f"shW=${bloom._2 / 1048576.0}%8.1fMB | total shuffle-write ratio $ratio%.3f")
      s""""p_size_le_$sel":{"plain_sec":${plain._1},"plain_shuffle_write":${plain._2},""" +
        s""""bloom_sec":${bloom._1},"bloom_shuffle_write":${bloom._2},""" +
        s""""shuffle_ratio":$ratio,"groups":$nPlain}"""
    }
    val json = s"""{"note":"broadcast disabled (the dim-too-big-to-broadcast regime BloomPrune targets); Spark runtime bloom injection off; min of 2 runs; shuffle_ratio = bloom/plain TOTAL query shuffle-write bytes (all stages: fact + dim + agg shuffles - the common agg shuffle is in both sides, so the isolated fact-side reduction is STRONGER than this ratio shows)","sf":"$sfDir","selectivities":{${out.mkString(",")}}}"""
    val p = java.nio.file.Paths.get(s"target/bloom_$tag.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

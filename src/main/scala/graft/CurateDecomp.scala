package graft

/** Decomposes q_curate_e2e's shuffle volume BY STAGE at a given corpus
  * (VERDICT r11 "what's wrong" #1: which stage dominates the ×32
  * shuffle — the prefix-filter bucket shuffle or the shingle-edge
  * split stage?). Method: cumulative-prefix runs — the chain is built
  * from scratch and materialized through each named cut point
  * (`pairs` → `sel` → `spl` → `manifest`) under a fresh
  * BenchListener; successive diffs attribute shuffle-write/wall to
  * the stage segment between cuts. Each prefix re-executes its
  * upstream (fresh localCheckpoints), so diffs are clean attributions,
  * not cache artifacts.
  *
  * Also runs the full manifest under `nearDupStrategy = "pruned"` —
  * the minhash-pruned A/B twin the ×32 SCALE row captures — so the
  * stage attribution and the strategy delta land in one artifact.
  *
  * Emits target/curate_decomp_<tag>.json; scale_report.py folds it
  * into SCALE_r{N} when present.
  */
object CurateDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_DECOMP_TAG", "x32")
    val spark = GraftSession.local()
    val listener = new BenchListener
    spark.sparkContext.addSparkListener(listener)
    val docs = graft.sources.Tables(spark, sfDir).documents

    def run(label: String, strategy: String, through: String): (Double, Long) = {
      spark.catalog.clearCache()
      listener.reset()
      val t0 = System.nanoTime()
      graft.queries.QueriesPipeline.curateThrough(docs, strategy, through)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext, 10000)
      val shw = listener.shuffleWrite.get
      System.err.println(f"[decomp] $label%-28s sec=$sec%7.2f shW=${shw / 1048576.0}%9.2fMB")
      (sec, shw)
    }

    val cuts = Seq("pairs", "sel", "spl", "manifest")
    val cum = cuts.map(c => c -> run(s"lossless through $c", "lossless", c)).toMap
    val pruned = run("pruned manifest (A/B)", "pruned", "manifest")
    val prunedPairs = run("pruned through pairs", "pruned", "pairs")

    // stage segments: diff of successive cumulative prefixes
    val segs = cuts.zip("" +: cuts).map { case (c, prev) =>
      val (s, w) = cum(c)
      val (ps, pw) = if (prev.isEmpty) (0.0, 0L) else cum(prev)
      (s"${if (prev.isEmpty) "start" else prev}->$c", s - ps, w - pw)
    }
    segs.foreach { case (n, s, w) =>
      System.err.println(f"[decomp] segment $n%-20s sec=$s%7.2f shW=${w / 1048576.0}%9.2fMB")
    }
    val segJson = segs.map { case (n, s, w) =>
      s""""$n":{"sec":$s,"shuffle_write":$w}""" }.mkString(",")
    val cumJson = cuts.map { c =>
      s""""$c":{"sec":${cum(c)._1},"shuffle_write":${cum(c)._2}}""" }.mkString(",")
    val json =
      s"""{"note":"q_curate_e2e shuffle attribution at $tag via cumulative-prefix diffs (each prefix re-executes upstream from scratch; diff = that segment's own cost). pruned_* rows are the minhash-pruned nearDupStrategy A/B (same manifest, CurateStrategySpec-proven).","corpus":"$sfDir","cumulative":{$cumJson},"segments":{$segJson},"pruned_manifest":{"sec":${pruned._1},"shuffle_write":${pruned._2}},"pruned_pairs":{"sec":${prunedPairs._1},"shuffle_write":${prunedPairs._2}},"lossless_manifest":{"sec":${cum("manifest")._1},"shuffle_write":${cum("manifest")._2}}}"""
    val p = java.nio.file.Paths.get(s"target/curate_decomp_$tag.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

package graft

/** Decomposes q_curate_e2e's shuffle volume BY STAGE at a given corpus
  * (VERDICT r11 "what's wrong" #1: which stage dominates the ×32
  * shuffle — the prefix-filter bucket shuffle or the shingle-edge
  * split stage?). Method: cumulative-prefix runs — the chain is built
  * from scratch and materialized through each named cut point
  * (`pairs` → `sel` → `spl` → `manifest`) under a fresh
  * BenchListener; successive diffs attribute shuffle-write/wall to
  * the stage segment between cuts. Each prefix re-executes its
  * upstream (fresh localCheckpoints), so shuffle-byte diffs are clean
  * attributions, not cache artifacts. ONLY the shuffle_write diffs
  * are deterministic: wall-clock diffs sit inside the ~1.4×
  * small-query timing band, and SPILL diffs are execution-memory-
  * pressure dependent (whether a hash aggregate spills varies with
  * task interleaving — the r13 x32 run measured a −198 MB sel→spl
  * spill diff), so both can go negative on small segments. The
  * emitted JSON flags negative sec segments and carries the caveat;
  * read spill totals per PREFIX row (cumulative), not per segment.
  *
  * Also runs the full manifest under `nearDupStrategy = "pruned"` —
  * the minhash-pruned A/B twin the ×32 SCALE row captures — so the
  * stage attribution and the strategy delta land in one artifact.
  * SPILL bytes ride every row (VERDICT r12 "what's wrong" #5: the
  * lossless ×32 chain spills ~25 GB in the stage-3 pair generation —
  * the artifact must state it next to the shuffle bytes).
  *
  * SPARK_GRAFT_CURATE_BUDGET scales the stage-5 token budget with the
  * corpus factor (same knob as the bench ladder) so the config-bounded
  * tail stages stay non-degenerate at every tier.
  *
  * Emits target/curate_decomp_<tag>.json; scale_report.py folds it
  * into SCALE_r{N} when present.
  */
object CurateDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_DECOMP_TAG", "x32")
    val budget = sys.env.get("SPARK_GRAFT_CURATE_BUDGET")
      .map(_.toLong).getOrElse(12000L)
    val keepPpm = sys.env.get("SPARK_GRAFT_CURATE_KEEPPPM")
      .map(_.toLong).getOrElse(35000000L)
    val spark = GraftSession.local()
    val listener = new BenchListener
    spark.sparkContext.addSparkListener(listener)
    val docs = graft.sources.Tables(spark, sfDir).documents

    def run(label: String, strategy: String, through: String): (Double, Long, Long) = {
      spark.catalog.clearCache()
      listener.reset()
      val t0 = System.nanoTime()
      graft.queries.QueriesPipeline.curateThrough(docs, strategy, through,
          budget, keepPpm)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext, 10000)
      val shw = listener.shuffleWrite.get
      val spl = listener.spill.get
      System.err.println(f"[decomp] $label%-28s sec=$sec%7.2f " +
        f"shW=${shw / 1048576.0}%9.2fMB spill=${spl / 1048576.0}%9.2fMB")
      (sec, shw, spl)
    }

    val cuts = Seq("pairs", "sel", "spl", "manifest")
    val cum = cuts.map(c => c -> run(s"lossless through $c", "lossless", c)).toMap
    val pruned = run("pruned manifest (A/B)", "pruned", "manifest")
    val prunedPairs = run("pruned through pairs", "pruned", "pairs")

    // stage segments: diff of successive cumulative prefixes. Only
    // shuffle diffs are deterministic; sec (timing noise) and spill
    // (memory-pressure dependent) can go negative and are kept raw,
    // not clamped — a clamp would hide what the flag exists to
    // surface.
    val segs = cuts.zip("" +: cuts).map { case (c, prev) =>
      val (s, w, p) = cum(c)
      val (ps, pw, pp) = if (prev.isEmpty) (0.0, 0L, 0L) else cum(prev)
      (s"${if (prev.isEmpty) "start" else prev}->$c", s - ps, w - pw, p - pp)
    }
    segs.foreach { case (n, s, w, p) =>
      val flag = if (s < 0) "  [sec NEGATIVE: timing noise]" else ""
      System.err.println(f"[decomp] segment $n%-20s sec=$s%7.2f " +
        f"shW=${w / 1048576.0}%9.2fMB spill=${p / 1048576.0}%9.2fMB$flag")
    }
    val segJson = segs.map { case (n, s, w, p) =>
      s""""$n":{"sec":$s,"sec_noisy":${s < 0},"shuffle_write":$w,"spill":$p}""" }.mkString(",")
    def rowJson(r: (Double, Long, Long)): String =
      s"""{"sec":${r._1},"shuffle_write":${r._2},"spill":${r._3}}"""
    val cumJson = cuts.map(c => s""""$c":${rowJson(cum(c))}""").mkString(",")
    val json =
      s"""{"note":"q_curate_e2e stage attribution at $tag (budget=$budget) via cumulative-prefix diffs (each prefix re-executes upstream from scratch). ONLY shuffle_write diffs are noise-free attributions; segment sec diffs sit inside the ~1.4x small-query timing band and segment SPILL diffs are execution-memory-pressure dependent - both can go negative on small segments (sec flagged via sec_noisy, raw values kept; read spill from the cumulative prefix rows). pruned_* rows are the minhash-pruned nearDupStrategy A/B (same manifest, CurateStrategySpec-proven).","corpus":"$sfDir","budget":$budget,"cumulative":{$cumJson},"segments":{$segJson},"pruned_manifest":${rowJson(pruned)},"pruned_pairs":${rowJson(prunedPairs)},"lossless_manifest":${rowJson(cum("manifest"))}}"""
    val p = java.nio.file.Paths.get(s"target/curate_decomp_$tag.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

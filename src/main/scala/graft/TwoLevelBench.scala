package graft

import org.apache.spark.sql.functions._

/** Certifies the two-level k-means path AT a corpus size the flat
  * path refuses: reads an embeddings table whose row count exceeds
  * Cluster.kForCorpus's flat ceiling (maxK × targetCellSize ≈ 262k
  * vectors at the defaults — tools/run_scale.sh derives one with
  * `ScaleGen <sf> target/scale/x200emb 200 embeddings`, 400k vectors),
  * runs the SAME assignCells entry point q_dedup_semantic uses (which
  * must auto-escalate to kmeansTwoLevel here), and then the full
  * semantic-dedup composition on the resulting cells.
  *
  * Emits target/twolevel_<tag>.json: assignment wall-time, cell-size
  * distribution (the "bounded cells" claim, measured: cells must stay
  * near copies × points-per-cell, not grow with the corpus), and the
  * end-to-end dedup outcome — including, loudly, a tripped
  * embedCosine drop gate if the derived corpus's duplicate structure
  * overflows maxBlock (either outcome is the measurement).
  * scale_report.py folds the file into SCALE_r{N}.
  */
object TwoLevelBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x200emb")
    val tag = sys.env.getOrElse("SPARK_GRAFT_TWOLEVEL_TAG", "x200")
    val spark = GraftSession.local()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val flatCeiling = 4096L * 64
    require(n > flatCeiling,
      s"this harness certifies the PAST-THE-CEILING path; corpus has n=$n <= $flatCeiling")

    // the exact entry point q_dedup_semantic calls — escalation must
    // be automatic, not a special harness code path
    val t0 = System.nanoTime()
    val cells = graft.operators.Cluster.assignCells(
      emb, "vec_id", "embedding", targetCellSize = 64, iters = 2,
      nKnown = Some(n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assignedRows = cells.count()
    val secAssign = (System.nanoTime() - t0) / 1e9
    require(assignedRows == n, s"every vector assigned exactly once ($assignedRows vs $n)")

    val stats = cells.groupBy("cluster").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_cells"), avg(col("sz")).as("avg"),
        max(col("sz")).as("max"), expr("percentile_approx(sz, 0.99)").as("p99"))
      .head()
    val (nCells, avgCell, maxCell, p99Cell) =
      (stats.getLong(0), stats.getDouble(1), stats.getLong(2), stats.getLong(3))
    System.err.println(f"[twolevel] n=$n assign=${secAssign}%.1fs cells=$nCells " +
      f"avg=$avgCell%.1f p99=$p99Cell max=$maxCell")

    // the full q_dedup_semantic tail on the two-level cells: capped
    // cell-local pair generation + exact cosine, drop gate armed
    val t1 = System.nanoTime()
    val dedup: Either[String, Long] =
      try Right(graft.operators.Dedup.embedCosine(
          emb.join(cells.hint("merge"), "vec_id"), "vec_id", "embedding",
          blockCol = "cluster", threshold = 0.42, maxBlock = 1000).count())
      catch { case e: IllegalStateException =>
        Left(Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" ")) }
    val secDedup = (System.nanoTime() - t1) / 1e9
    val dedupJson = dedup match {
      case Right(pairs) =>
        System.err.println(f"[twolevel] dedup=${secDedup}%.1fs pairs=$pairs")
        s""""dedup_sec":$secDedup,"dedup_pairs":$pairs"""
      case Left(msg) =>
        System.err.println(s"[twolevel] dedup DROP GATE: $msg")
        s""""dedup_sec":$secDedup,"dedup_drop_gate":"${msg.replace("\"", "'")}""""
    }
    // determinism AT the certified sampled config (the xxhash64 coarse
    // sample gate is active here — coarseK x 32 << 400k): the same
    // assignment from a different physical layout must be row-for-row
    // identical. ClusterSpec proves this at spec scale with sampling
    // forced; this measures it at the certification scale itself.
    val t2 = System.nanoTime()
    val again = graft.operators.Cluster.assignCells(
      emb.repartition(97), "vec_id", "embedding", targetCellSize = 64,
      iters = 2, nKnown = Some(n))
    val diverged = cells.join(again.withColumnRenamed("cluster", "c2"), "vec_id")
      .filter(col("cluster") =!= col("c2")).count()
    val secDet = (System.nanoTime() - t2) / 1e9
    System.err.println(f"[twolevel] determinism re-run=${secDet}%.1fs diverged=$diverged")

    val json = s"""{"note":"assignCells on a corpus past the flat ceiling (n > 4096*64): must auto-escalate to kmeansTwoLevel. Single-shot wall-times (capability certification, not a regression series). Cell sizes on the ScaleGen-derived corpus are copies x points-per-cell by construction (vectors replicate verbatim), so bounded cells here = the per-shard fineK derivation holding, not an accident of the data. determinism_diverged_rows re-runs the SAME sampled config (xxhash64 coarse gate active at this n) from a repartitioned layout - 0 means the certification config is layout-independent at certification scale.","sf":"$sfDir","n":$n,"assign_sec":$secAssign,"n_cells":$nCells,"avg_cell":$avgCell,"max_cell":$maxCell,"p99_cell":$p99Cell,"determinism_rerun_sec":$secDet,"determinism_diverged_rows":$diverged,$dedupJson}"""
    val p = java.nio.file.Paths.get(s"target/twolevel_$tag.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

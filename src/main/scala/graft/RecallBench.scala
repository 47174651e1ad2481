package graft

import org.apache.spark.sql.functions._

/** The IVF recall-vs-cost curve at scale (q_ann_recall's measurement
  * graduated from its sf0.1 toy point): on the x32 corpus (64k
  * vectors), nlist is DERIVED by the production rule
  * (Cluster.kForCorpus → 1000, which exercises the join-path probe —
  * nlist far past the literal ceiling), the index is trained ONCE,
  * and nprobe is swept 1/2/4/8 against brute-force truth computed in
  * the same session. recall@k is averaged over the query set.
  *
  * The ScaleGen corpus replicates each of the 2000 base vectors
  * verbatim (x32 → 31 identical non-self copies per query), so top-5
  * truth is all ties at cosine 1.0 inside the query's own cell and
  * recall@5 would be vacuously 1.0 at any nprobe. k is therefore set
  * ABOVE the copy count (k = 50 > 31): the tail of the truth set
  * lives in OTHER base vectors' cells, which is exactly what nprobe
  * trades cost for. Emits target/recall_<tag>.json.
  */
object RecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale/x32")
    val tag = sys.env.getOrElse("SPARK_GRAFT_RECALL_TAG", "x32")
    val k = sys.env.getOrElse("SPARK_GRAFT_RECALL_K", "50").toInt
    val nQueries = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "100").toLong
    // targetCellSize stays the production default (64) on the x32
    // corpus; the 400k x200emb sweep passes 128 (kForCorpus at 64
    // would derive nlist=6250 past the flat-assignment ceiling — the
    // regime that belongs to kmeansTwoLevel, not a flat IVF curve)
    val cell = sys.env.getOrElse("SPARK_GRAFT_RECALL_CELL", "64").toLong
    val spark = GraftSession.local()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val nlist = graft.operators.Cluster.kForCorpus(n, targetCellSize = cell)
    val qFilter = col("vec_id") < nQueries

    // truth: exact cosine top-k for the query set (one pass, reused
    // by every sweep point)
    val truth = graft.operators.Similarity
      .bruteForceTopK(emb, emb.filter(qFilter), k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    require(truth.nonEmpty, "no truth rows — query filter matched nothing")

    val t0 = System.nanoTime()
    val tr = graft.operators.Cluster.trainInt8(emb, "vec_id", "embedding",
      k = nlist, iters = 2)
    // materialized by trainInt8's own localCheckpoints; time the call
    val trainSec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[recall] n=$n nlist=$nlist k=$k queries=$nQueries " +
      f"train=${trainSec}%.1fs truth=${truth.size} pairs")

    // index-geometry adjudication (VERDICT r12 "what's wrong" #3: the
    // x200 sweep reported IDENTICAL recall and candidate counts at
    // nprobe=1 vs 2 — plumbing bug or corpus geometry?). On a corpus
    // of d distinct vectors replicated verbatim, k-means with
    // nlist > d converges with centroids ON the copy groups plus
    // DUPLICATE/empty cells (several initial centroids sample the same
    // base vector; assignment ties break to the lowest cid, starving
    // the twins) — a query's 2nd-nearest centroid is then an empty
    // twin at distance 0 and probe 2 legitimately adds nothing. These
    // numbers decide which story is true:
    val dupCentroids = tr.assignCentroids.size - tr.assignCentroids.distinct.size
    val cellSizes = tr.assigned.groupBy("cid").count()
      .collect().map(r => r.get(0).asInstanceOf[Number].intValue -> r.getLong(1)).toMap
    val emptyCells = nlist - cellSizes.size
    System.err.println(s"[recall] geometry: $dupCentroids duplicate centroid(s) " +
      s"of $nlist, $emptyCells empty cell(s)")
    // per-query candidate pool added by each extra probe rank: the
    // EXACT production probe construction (Similarity.probeCells)
    def poolOf(nprobe: Int): Long = graft.operators.Similarity
      .probeCells(tr, emb, qFilter, nprobe)
      .collect().map(r => cellSizes.getOrElse(r.get(1).asInstanceOf[Number].intValue, 0L)).sum
    val pools = Seq(1, 2, 4, 8).map(p => p -> poolOf(p)).toMap
    System.err.println(s"[recall] candidate pools by nprobe: " +
      pools.toSeq.sortBy(_._1).map { case (p, c) => s"$p->$c" }.mkString(" "))

    def probe(nprobe: Int): (Set[(Long, Long)], Double) = {
      val t1 = System.nanoTime()
      val got = graft.operators.Similarity
        .ivfInt8TopKOn(tr, emb, qFilter, k, nprobe)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got, (System.nanoTime() - t1) / 1e9)
    }
    // one untimed warmup sweep, then min-of-2 per point: the r10
    // single-shot curve had probe_sec DECREASING as nprobe grew —
    // first-exposure JIT/codegen riding the first points. The probe is
    // deterministic, so only the clock differs between runs.
    Seq(1, 8).foreach(probe)
    val points = Seq(1, 2, 4, 8).map { nprobe =>
      val (got, s1) = probe(nprobe)
      val sec = math.min(s1, probe(nprobe)._2)
      val recall = (got & truth).size.toDouble / truth.size
      System.err.println(f"[recall] nprobe=$nprobe%-2d recall@$k=${recall}%.4f " +
        f"probe_sec=${sec}%.2f candidates~=${got.size}")
      f"""{"nprobe":$nprobe,"recall_at_$k":$recall%.6f,"probe_sec":$sec%.3f}"""
    }
    val json = s"""{"note":"nlist derived by kForCorpus at targetCellSize=$cell (join-path probe past the literal ceiling); index trained once, nprobe swept; probe_sec = min of 2 runs per point after a full warmup sweep (the single-shot curve was JIT-warmup-dominated and INVERTED). Whether probe cost moves with nprobe is the MEASUREMENT, not an assumption: at 64k vectors (r10, x32) the curve was cost-FLAT - per-job overhead dominated the cell scans - which is why the sweep re-runs at larger n/deeper cells where the scan term can surface. recall vs brute-force truth over ${truth.size} (query, neighbor) pairs; k=$k must sit ABOVE the ScaleGen verbatim-copy count per query (factor-1 copies all score cosine 1.0 and would make small-k recall vacuous). geometry: when nlist exceeds the corpus's DISTINCT vector count (ScaleGen replicates verbatim), k-means converges with duplicate/empty twin cells and extra probes can legitimately add zero candidates - duplicate_centroids/empty_cells/candidate_pool_by_nprobe adjudicate flat sweep points (VERDICT r12 #3)","sf":"$sfDir","n":$n,"nlist":$nlist,"cell":$cell,"k":$k,"n_queries":$nQueries,"train_sec":$trainSec,"duplicate_centroids":$dupCentroids,"empty_cells":$emptyCells,"candidate_pool_by_nprobe":{${pools.toSeq.sortBy(_._1).map { case (p, c) => s""""$p":$c""" }.mkString(",")}},"sweep":[${points.mkString(",")}]}"""
    val p = java.nio.file.Paths.get(s"target/recall_$tag.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality (r15, VERDICT r14 next-round #4): crawl
  * curation weights documents by graph centrality next to the content
  * signals (quality scores, dedup verdicts) this engine already
  * derives — the OPR/harmonic-centrality prior every production crawl
  * pipeline carries. PageRank is kept EXACT ppm FIXED-POINT (integer
  * ranks, truncating division — identical on JVM longs and DuckDB
  * `//`), so a fixed iteration count is replayable bit-for-bit by an
  * unrolled-CTE oracle (the q_kmeans / q_token_bpe_verify
  * discipline), where float power iteration would hash-drift on
  * summation order.
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list, ranks in ppm:
    *
    *   r⁰(v)   = 10⁶
    *   contrib = r(u) div outdeg(u)              (per edge u→v)
    *   rᵗ⁺¹(v) = (10⁶ − d) + d · Σ contrib div 10⁶   (d = dampingPpm)
    *
    * Semantics notes (each deterministic and oracle-replayable):
    *  - duplicate edges collapse (a multigraph caller pre-weights);
    *  - DANGLING nodes (no out-edges) keep receiving rank but emit
    *    none. Default: their mass LEAKS (the simplified map-reduce
    *    variant). With `redistributeDangling = true` the STANDARD
    *    term applies instead — each iteration adds the 1-row dangling
    *    mass aggregate and every node receives `dm div N` extra
    *    contribution before damping (truncating, still exact ppm);
    *  - nodes with no in-edges settle at the base (10⁶ − d).
    *
    * Scale shape: the deduped edge list and the node spine (with
    * out-degree attached) are persisted once; each iteration is ONE
    * edge-keyed shuffle — the ranks→edges contribution join (ranks
    * broadcast below [[Dedup.BroadcastSafeCorpusRows]] nodes, merge
    * past it — a node-scaling broadcast build is the r10-measured
    * driver-OOM class) followed by the map-side-combined per-dst sum;
    * lineage is truncated every `checkpointEvery` iterations (the
    * [[Components]] discipline, so a deep `iters` cannot blow the
    * planner). Exact while iters·10⁶·maxdeg < 2⁶³ — unreachable.
    *
    * @return (node, out_degree, rank_ppm) after `iters` iterations. */
  def pagerankPpm(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 4, dampingPpm: Long = 850000L,
                  checkpointEvery: Int = 2,
                  redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 1 && dampingPpm >= 0 && dampingPpm <= 1000000L)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val spine = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .join(deg, Seq("node"), "left")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNodes = spine.count() // materializes the caches, sizes the pin
    val pin = nNodes > Dedup.BroadcastSafeCorpusRows
    val base = 1000000L - dampingPpm
    var ranks = spine.select(col("node"), col("deg"), lit(1000000L).as("r"))
    for (i <- 1 to iters) {
      val contribs = ranks.filter(col("deg").isNotNull)
        .select(col("node").as("src"), expr("r div deg").as("c"))
      val summed =
        (if (pin) e.hint("merge").join(contribs.hint("merge"), "src")
         else e.join(broadcast(contribs), "src"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("c")).as("s"))
      val joined = spine.join(summed, Seq("node"), "left")
      ranks =
        if (redistributeDangling) {
          // the standard dangling-mass term (VERDICT r15 next-round
          // #9): sink rank redistributes uniformly instead of
          // leaking — ONE 1-row aggregate per iteration (a narrow
          // filtered sum over the rank frame, broadcast as a
          // constant), truncating `div nNodes` so the trajectory
          // stays exact-integer and oracle-replayable
          val dang = ranks.filter(col("deg").isNull)
            .agg(coalesce(sum(col("r")), lit(0L)).as("dm"))
          joined.crossJoin(broadcast(dang))
            .select(col("node"), col("deg"),
              (lit(base) + expr(s"($dampingPpm * (coalesce(s, cast(0 as bigint))" +
                s" + dm div ${nNodes}L)) div 1000000")).as("r"))
        } else {
          joined.select(col("node"), col("deg"),
            (lit(base) + expr(s"($dampingPpm * coalesce(s, cast(0 as bigint))) div 1000000"))
              .as("r"))
        }
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(eager = false)
    }
    val result = ranks
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("out_degree"),
        col("r").as("rank_ppm"))
      .localCheckpoint()
    e.unpersist()
    spine.unpersist()
    result
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS into duplicate CLUSTERS (pick one
  * survivor per component). Large-corpus dedup pipelines end with
  * exactly this.
  *
  * Algorithm: iterative min-label propagation (each round every node
  * adopts the smallest label among itself and its neighbors) to a
  * fixpoint. Rounds ≤ graph diameter; each round is one shuffle of
  * (node, label) by node id. Near-dup graphs are forests of tiny
  * cliques — diameter is small, so this converges in 2-4 rounds at
  * any corpus size (the hard large-diameter case would call for
  * alternating large/small-star steps, same join shape).
  */
object Components {

  /** @param edges (id_a, id_b) undirected pairs
    * @return (node, component) — component = min node id reachable */
  def connectedComponents(edges: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 15): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = sym.select(col("src").as("node"))
      .distinct()
      .withColumn("component", col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Labels only ever decrease, so the label sum is a strictly
    // decreasing convergence metric — one cheap aggregate per round
    // instead of a join-and-count. Summed as decimal(38,0): a Long sum
    // of 64-bit hash ids would overflow (throw under ANSI, or wrap and
    // falsely report convergence).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // each node adopts min(own label, neighbors' labels)
      val viaNeighbor = sym.join(labels, col("dst") === col("node"))
        .select(col("src").as("node"), col("component"))
      // Each round references the labels plan TWICE (neighbor join +
      // union), so persist alone doubles the LOGICAL plan every
      // iteration — at high graph diameter the plan tree itself OOMs
      // the driver around round ~15 (found by the differential fuzz).
      // Every 8th round localCheckpoint truncates lineage to a
      // LogicalRDD, bounding the plan at ~2^8 nodes; small-diameter
      // graphs (the near-dup norm) never hit it, keeping cache
      // hygiene exact (checkpoint blocks are ContextCleaner-reaped
      // on GC rather than explicitly unpersistable).
      val grown = labels.unionByName(viaNeighbor)
        .groupBy("node").agg(min(col("component")).as("component"))
      val next = if (i % 8 == 7) grown.localCheckpoint()
                 else grown.persist(StorageLevel.MEMORY_AND_DISK)
      val s = labelSum(next)   // also eagerly materializes next
      done = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()       // no-op for a checkpointed round
      labels = next
      i += 1
    }
    sym.unpersist() // labels is materialized; the edge cache is dead weight
    if (!done) System.err.println(
      s"[graft] connectedComponents: maxIter=$maxIter reached before fixpoint — " +
        "labels may be unconverged (component chains longer than maxIter hops)")
    // Checkpoint the final labels (eager — reads straight from the
    // still-warm cache) and release the cache: callers get a stable,
    // lineage-free result and no persisted RDD outlives the call.
    val result = labels.localCheckpoint()
    labels.unpersist()
    result
  }

  /** Collapse near-dup pairs to per-component survivors:
    * (component, survivor_id = min id, n_members). */
  def dedupClusters(edges: DataFrame, aCol: String = "id_a",
                    bCol: String = "id_b"): DataFrame =
    connectedComponents(edges, aCol, bCol)
      .groupBy("component")
      .agg(min(col("node")).as("survivor_id"), count(lit(1)).as("n_members"))
}

package graft

import graft.operators.Cluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** kmeansInt8: the oracle-checked integer Lloyd's — determinism,
  * partition-layout independence, membership conservation, and the
  * exact-arithmetic contract on a hand-checkable fixture. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def embTable(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("clusters partition the input and the surface is deterministic") {
    val emb = embTable((0L until 100L).map(i =>
      i -> Seq.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6).toFloat / 3f)))
    val r1 = Cluster.kmeansInt8(emb, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("cluster").collect()
    val r2 = Cluster.kmeansInt8(emb.repartition(7), "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("cluster").collect()
    assert(r1.toSeq == r2.toSeq, "layout-independent")
    assert(r1.map(_.getLong(1)).sum == 100L, "every vector in exactly one cluster")
    assert(r1.map(_.getInt(0)).toSeq == (0 until 4), "all k clusters emitted")
  }

  test("two well-separated blobs recover their centers exactly") {
    // blob A around (+100,...), blob B around (-100,...): gscale =
    // 100/127 pushes quantized values to ~+-127; means are exact
    // integers the fingerprint pins
    val a = (0L until 20L).map(i => i -> Seq.fill(4)(100f))
    val b = (20L until 40L).map(i => i -> Seq.fill(4)(-100f))
    val out = Cluster.kmeansInt8(embTable(a ++ b), "vec_id", "embedding",
        k = 2, iters = 3).orderBy("cluster").collect()
    // init = vec_ids 0 and 1 (identical, both blob A): iteration 1
    // collapses everything into cluster 0 (ties break low) pulling c0
    // to the midpoint while c1 stays on A; iteration 2 separates (A
    // ties to the exact c1, B nearer the midpoint c0); by iteration 3
    // the centroids sit exactly on the blobs and inertia is 0
    assert(out.map(_.getLong(1)).sum == 40L)
    assert(out.map(_.getLong(2)).sum == 0L, "exact recovery => zero inertia")
  }

  test("join-path assignment (k > literalAssignMaxK) is bit-identical to the literal path") {
    // same corpus, same k: force the broadcast-join argmin by setting
    // the literal threshold to 0 and compare full trajectories — the
    // centroid sequence AND the final per-row (cid, dist) assignment
    val emb = embTable((0L until 120L).map(i =>
      i -> Seq.tabulate(6)(j => ((i * 17 + j * 11) % 19 - 9).toFloat / 4f)))
    val trLit = Cluster.trainInt8(emb, "vec_id", "embedding", k = 5, iters = 3)
    val trJoin = Cluster.trainInt8(emb, "vec_id", "embedding", k = 5, iters = 3,
      literalAssignMaxK = 0)
    val (aLit, cLit) = (trLit.assigned, trLit.centroids)
    val (aJoin, cJoin) = (trJoin.assigned, trJoin.centroids)
    assert(cLit == cJoin, "post-update centroids identical across assignment paths")
    val lit = aLit.select("id", "cid", "dist").orderBy("id").collect().toSeq
    val join = aJoin.select("id", "cid", "dist").orderBy("id").collect().toSeq
    assert(lit == join, "per-row assignment identical across assignment paths")
  }

  test("kForCorpus derives the IVF nlist rule and refuses oversized k") {
    assert(Cluster.kForCorpus(500, 64) == 8)   // the oracle corpus: LIMIT 8
    assert(Cluster.kForCorpus(64, 64) == 1)
    assert(Cluster.kForCorpus(65, 64) == 2)
    assert(Cluster.kForCorpus(200000, 64) == 3125)  // x100 scale corpus
    val e = intercept[IllegalArgumentException] {
      Cluster.kForCorpus(10_000_000L, 64) // k would be 156250
    }
    assert(e.getMessage.contains("two-level blocking"))
    intercept[IllegalArgumentException](Cluster.kForCorpus(0, 64))
  }

  test("empty cluster keeps its previous centroid and emits n=0") {
    // k=3 over two distinct points: one cluster can never win a vector
    val emb = embTable((0L until 10L).map(i =>
      i -> Seq.fill(4)(if (i % 2 == 0) 50f else -50f)))
    val out = Cluster.kmeansInt8(emb, "vec_id", "embedding", k = 3, iters = 2)
      .orderBy("cluster").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).sum == 10L)
    assert(out.exists(_.getLong(1) == 0L), "an empty cluster still emits")
  }
}

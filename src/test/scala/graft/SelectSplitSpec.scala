package graft

import graft.operators.{Components, Dedup, Select, Split}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SelectSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: (id, weight, bucketed score)
  private def corpus(n: Int, scoreDomain: Int, seed: Int = 42) = {
    val rnd = new Random(seed)
    (0 until n).map(i =>
      (i.toLong, 1 + rnd.nextInt(50), rnd.nextInt(scoreDomain).toLong))
      .toDF("id", "w", "score")
  }

  // the semantics tokenBudget must reproduce: ONE global window over
  // (score desc, id) — fine at test size, the exact plan the operator
  // exists to avoid at corpus size
  private def reference(df: org.apache.spark.sql.DataFrame, budget: Long) = {
    val w = Window.orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col("w").cast("long")).over(w))
      .filter(col("cum_tokens") <= budget)
      .select("id", "score", "w", "cum_tokens")
  }

  test("tokenBudget equals the global-window reference on random data") {
    for ((n, dom, budget) <- Seq((500, 20, 3000L), (1000, 7, 9000L), (300, 300, 2500L))) {
      val df = corpus(n, dom, seed = n + dom)
      val got = Select.tokenBudget(df, "id", "w", "score", budget)
        .orderBy("id").collect().toSeq
      val exp = reference(df, budget).orderBy("id").collect().toSeq
      assert(got == exp, s"mismatch at n=$n dom=$dom budget=$budget")
    }
  }

  test("tokenBudget edge cases: zero, exact-boundary, and unbounded budgets") {
    val df = Seq((1L, 10, 5L), (2L, 10, 5L), (3L, 10, 3L)).toDF("id", "w", "score")
    assert(Select.tokenBudget(df, "id", "w", "score", 0L).count() == 0)
    // budget exactly at a row's cumulative total keeps that row
    val boundary = Select.tokenBudget(df, "id", "w", "score", 20L)
      .select("id").as[Long].collect().toSet
    assert(boundary == Set(1L, 2L))
    val all = Select.tokenBudget(df, "id", "w", "score", 1000L)
    assert(all.count() == 3)
    // ...and the running totals are the true global ones
    assert(all.orderBy("id").select("cum_tokens").as[Long].collect().toSeq
      == Seq(10L, 20L, 30L))
  }

  test("tokenBudget merge-pinned bucket join path matches the broadcast path") {
    val df = corpus(2000, 500, seed = 7)
    val viaBroadcast = Select.tokenBudget(df, "id", "w", "score", 10000L)
      .orderBy("id").collect().toSeq
    val viaMerge = Select.tokenBudget(df, "id", "w", "score", 10000L,
        broadcastSafeBuckets = 0L)
      .orderBy("id").collect().toSeq
    assert(viaBroadcast == viaMerge)
  }

  test("leakFree never separates a connected pair and covers every doc") {
    val docs = (0L until 200L).toDF("doc_id")
    // chain components {0..4}, {10,11}, plus singletons
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val out = Split.leakFree(docs, "doc_id", edges)
    assert(out.count() == 200)
    assert(out.select("doc_id").distinct().count() == 200)
    // every member of a component shares its split
    val splitsPerComp = out.groupBy("component")
      .agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count()
    assert(splitsPerComp == 0)
    // the two known components got exactly one split each
    val chain = out.filter(col("doc_id") <= 4)
      .select("split").distinct().as[String].collect().toSeq
    assert(chain.size == 1)
    // singletons key on their own id
    val singleton = out.filter(col("doc_id") === 100L).collect().head
    assert(singleton.getAs[Long]("component") == 100L)
  }

  test("leakFree fractions are hash-plausible and assignment is deterministic") {
    val docs = (0L until 2000L).toDF("doc_id")
    val edges = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq.empty[(Long, Long)]).toDF("id_a", "id_b")
    val out = Split.leakFree(docs, "doc_id", edges).cache()
    val byCnt = out.groupBy("split").count().as[(String, Long)].collect().toMap
    // 80/10/10 within generous hash tolerance on 2000 singleton draws
    assert(byCnt("train") > 1400 && byCnt("train") < 1800, byCnt.toString)
    assert(byCnt.getOrElse("val", 0L) > 100 && byCnt.getOrElse("test", 0L) > 100)
    val again = Split.leakFree(docs, "doc_id", edges)
    assert(out.orderBy("doc_id").collect().toSeq
      == again.orderBy("doc_id").collect().toSeq)
    out.unpersist()
  }

  test("diversity sample (q_sample_diverse) takes exact per-cell quotas deterministically") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.QueriesText.queries("q_sample_diverse")(spark, d)
      .selectExpr("cast(vec_id as long)", "cast(cluster as long)", "cast(rk as int)")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out.nonEmpty)
    // quota respected per cell, ranks dense from 1
    val byCell = out.groupBy(_._2)
    for ((_, xs) <- byCell) {
      assert(xs.size <= 10)
      assert(xs.map(_._3).sorted == (1 to xs.size).toSeq)
    }
    // no vector sampled twice across cells
    assert(out.map(_._1).distinct.size == out.size)
    val again = graft.queries.QueriesText.queries("q_sample_diverse")(spark, d)
      .selectExpr("cast(vec_id as long)", "cast(cluster as long)", "cast(rk as int)")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out == again)
  }

  test("assignIncremental covers exactly the batch and lands dupes in their history cell") {
    // two well-separated history blobs + a batch that duplicates one
    // history vector per blob and adds one nearby vector
    def vec(base: Float): Seq[Float] = Seq.tabulate(8)(i => base + i * 0.01f)
    val hist = (0L until 20L).map(i =>
      (i, vec(if (i % 2 == 0) 1.0f else 100.0f)))
    val batch = Seq((100L, vec(1.0f)), (101L, vec(100.0f)), (102L, vec(99.0f)))
    val emb = (hist ++ batch).toDF("vec_id", "embedding")
    val out = graft.operators.Cluster.assignIncremental(
        emb, "vec_id", "embedding", col("vec_id") < 100, k = 2, iters = 2)
      .selectExpr("vec_id", "cast(cluster as int)", "cast(dist as long)")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(100L, 101L, 102L)) // batch only, once each
    // the history side of the same universe, assigned by the full trainer
    val histAssign = graft.operators.Cluster.kmeansAssignInt8(
        emb.filter(col("vec_id") < 100), "vec_id", "embedding", k = 2, iters = 2)
      .selectExpr("vec_id", "cast(cluster as int)").as[(Long, Int)].collect().toMap
    // a batch duplicate of a history vector joins that vector's cell
    assert(out(0)._2 == histAssign(0L))
    assert(out(1)._2 == histAssign(1L))
    assert(out(2)._2 == histAssign(1L)) // 99.0 ~ the 100.0 blob
    // exact duplicates of centroid-space vectors: dist equals the dupe's
    // history-side dist model (same grid, same centroids) and the two
    // blobs land in different cells
    assert(out(0)._2 != out(1)._2)
    val again = graft.operators.Cluster.assignIncremental(
        emb, "vec_id", "embedding", col("vec_id") < 100, k = 2, iters = 2)
      .selectExpr("vec_id", "cast(cluster as int)", "cast(dist as long)")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }

  test("embed gram matrix equals a plain-Scala fold over the quantized vectors") {
    val d = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    val q = graft.operators.Cluster.quantize(emb, "vec_id", "embedding")
      .select("q").as[Seq[Long]].collect()
    val dim = q.head.size
    val ref = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (v <- q; i <- 0 until dim; j <- i until dim)
      ref((i + 1, j + 1)) = ref.getOrElse((i + 1, j + 1), 0L) + v(i) * v(j)
    val got = graft.queries.QueriesText.queries("q_embed_gram")(spark, d)
      .as[(Int, Int, Long)].collect()
    assert(got.length == dim * (dim + 1) / 2)
    for ((i, j, g) <- got) assert(g == ref((i, j)), s"cell ($i,$j)")
    // diagonal of a gram matrix is a sum of squares: never negative
    assert(got.filter(r => r._1 == r._2).forall(_._3 >= 0))
  }

  test("leakFree component representative matches Components on the edge graph") {
    val docs = (0L until 50L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val out = Split.leakFree(docs, "doc_id", edges)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    for ((node, c) <- comp) assert(out(node) == c)
  }
}

package graft

import graft.plans.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics + plan shape of the custom physical as-of join
  * (plans/AsOfJoin.scala: LogicalPlan + Strategy + SparkPlan). */
class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def quotes = Seq(
    // (key, time, price)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 15L, 3.0))
    .toDF("qk", "qt", "price")

  test("backward as-of: at-or-before inclusive, LOCF, no-match nulls") {
    val trades = Seq(("A", 5L), ("A", 10L), ("A", 25L), ("B", 14L), ("C", 9L))
      .toDF("tk", "tt")
    val out = AsOfJoin.backward(trades, quotes, "tk", "qk", "tt", "qt")
      .select("tk", "tt", "qt", "price")
      .as[(String, Long, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      ("A", 5L, None, None),            // before first quote
      ("A", 10L, Some(10L), Some(1.0)), // equal time matches (inclusive)
      ("A", 25L, Some(20L), Some(2.5)), // LOCF; equal-time ties: last in sort order
      ("B", 14L, None, None),           // B's quote is later
      ("C", 9L, None, None)))           // key with no quotes at all
  }

  test("tolerance bounds the lookback; null keys and times never match") {
    val trades = Seq(
      (Some("A"), Some(100L)), (Some("A"), Some(12L)), (None, Some(10L)),
      (Some("A"), Option.empty[Long]))
      .toDF("tk", "tt")
    val q = Seq((Some("A"), Some(20L), 9.0), (Some("A"), Option.empty[Long], 8.0),
      (Option.empty[String], Some(5L), 7.0))
      .toDF("qk", "qt", "price")
    val out = AsOfJoin.backward(trades, q, "tk", "qk", "tt", "qt", tolerance = 100L)
      .select("tk", "tt", "price")
      .as[(Option[String], Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (Some("A"), Some(100L), Some(9.0)),  // lag 80 ticks, within 100
      (Some("A"), Some(12L), None),        // quote at 20 is in the future
      (None, Some(10L), None),             // null left key: no match
      (Some("A"), None, None)))            // null left time: no match
    // beyond tolerance: same join with a tight bound drops the match
    val tight = AsOfJoin.backward(trades, q, "tk", "qk", "tt", "qt", tolerance = 10L)
      .filter(col("tt") === 100L).select("price").as[Option[Double]].head()
    assert(tight.isEmpty)
  }

  test("mismatched key types are rejected (no analyzer coercion on a resolved node)") {
    val l = Seq((1, 10L)).toDF("tk", "tt")   // int key
    val r = Seq((1L, 5L, 1.0)).toDF("qk", "qt", "price") // long key
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "tk", "qk", "tt", "qt")
    }
    assert(e.getMessage.contains("key types must match"))
  }

  test("physical plan: AsOfJoinExec with one exchange per side, no window/union") {
    val (s, d) = (spark, SparkTestSession.sfDir)
    val df = SparkEntry.queries("q_asof_plan")(s, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept in:\n$plan")
    assert(!plan.contains("Union"), s"union crept in:\n$plan")
  }

  test("q_asof_plan matches the window-based q_asof_backward exactly") {
    val (s, d) = (spark, SparkTestSession.sfDir)
    val a = SparkEntry.queries("q_asof_plan")(s, d).collect().toSeq
    val b = SparkEntry.queries("q_asof_backward")(s, d).collect().toSeq
    assert(a == b)
  }

  test("range-split as-of equals the plain operator on hot-key fuzz corpora") {
    // a 40%-hot key plus uniform keys, unique (key, time) on the right
    // (the determinism contract both forms share)
    val rnd = new scala.util.Random(7)
    val trades = (1 to 400).map { i =>
      val k = if (rnd.nextInt(10) < 4) "hot" else s"k${rnd.nextInt(8)}"
      (k, rnd.nextInt(5000).toLong, i)
    }.toDF("tk", "tt", "trade_id")
    val quotes = rnd.shuffle((1 to 300).map { i =>
      (if (i % 3 == 0) "hot" else s"k${i % 8}", (i * 17 % 5003).toLong, i.toDouble)
    }.toList).distinctBy(q => (q._1, q._2)).toDF("qk", "qt", "price")
    for (width <- Seq(1L, 7L, 250L, 100000L); tol <- Seq(-1L, 300L)) {
      val base = AsOfJoin.backward(trades, quotes, "tk", "qk", "tt", "qt", tol)
        .select("trade_id", "qt", "price")
        .as[(Int, Option[Long], Option[Double])].collect().toSet
      val split = AsOfJoin.backwardRangeSplit(trades, quotes, "tk", "qk", "tt", "qt",
          bucketWidth = width, tolerance = tol)
        .select("trade_id", "qt", "price")
        .as[(Int, Option[Long], Option[Double])].collect().toSet
      assert(split == base, s"width=$width tol=$tol diverged: " +
        s"missing=${(base -- split).take(3)} extra=${(split -- base).take(3)}")
    }
  }

  test("range-split as-of: nulls, carry across empty buckets, tolerance on the carry") {
    val trades = Seq(
      (Some("A"), Some(1000L), 1), // carry from bucket 0 across 99 empty buckets
      (Some("A"), Some(1005L), 2), // in-bucket quote beats the carry
      (Some("A"), Option.empty[Long], 3),
      (Option.empty[String], Some(1000L), 4))
      .toDF("tk", "tt", "trade_id")
    val quotes = Seq(("A", 3L, 1.0), ("A", 1002L, 2.0), ("B", 900L, 9.0))
      .toDF("qk", "qt", "price")
    val out = AsOfJoin.backwardRangeSplit(trades, quotes, "tk", "qk", "tt", "qt",
        bucketWidth = 10L)
      .select("trade_id", "qt", "price")
      .as[(Int, Option[Long], Option[Double])].collect().toSet
    assert(out == Set(
      (1, Some(3L), Some(1.0)),    // quote 99 buckets back still carries
      (2, Some(1002L), Some(2.0)), // same-bucket quote wins over the carry
      (3, None, None), (4, None, None)))
    // tolerance must also bound the carried match, not just in-bucket ones
    val tight = AsOfJoin.backwardRangeSplit(trades, quotes, "tk", "qk", "tt", "qt",
        bucketWidth = 10L, tolerance = 50L)
      .filter(col("trade_id") === 1).select("price").as[Option[Double]].head()
    assert(tight.isEmpty, "carry at lag 997 must be dropped by tolerance 50")
  }

  test("range-split plan: composite-key exchange splits the hot key by bucket") {
    val trades = Seq(("A", 10L, 1), ("A", 110L, 2)).toDF("tk", "tt", "trade_id")
    val quotes = Seq(("A", 5L, 1.0)).toDF("qk", "qt", "price")
    val df = AsOfJoin.backwardRangeSplit(trades, quotes, "tk", "qk", "tt", "qt", 100L)
    df.collect() // force AQE to finalize
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    // both as-of exchanges hash on (key, bucket), not key alone
    assert(plan.contains("__lb") && plan.contains("__rb"),
      s"bucket column missing from the executed plan:\n$plan")
  }
}

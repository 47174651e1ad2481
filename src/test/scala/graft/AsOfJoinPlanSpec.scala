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
}

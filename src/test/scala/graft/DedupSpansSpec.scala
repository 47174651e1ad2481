package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** C4-style span dedup invariants: corpus-wide ban of repeated
  * windows, within-document repetition, trailing partial windows,
  * all-boilerplate documents, and no-op behavior on a unique corpus.
  */
class DedupSpansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 3, maxOccur: Long = 1) =
    Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        spanTokens = k, maxOccur = maxOccur)
      .select("doc_id", "n_spans", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap

  test("a span repeated across documents is removed from both; unique spans survive") {
    val r = run(Seq(
      1L -> "aa bb cc xx yy zz",
      2L -> "aa bb cc qq rr ss",
      3L -> "uu vv ww pp oo nn"))
    assert(r(1L) == ((1L, 2L, 1L, "xx yy zz")))
    assert(r(2L) == ((2L, 2L, 1L, "qq rr ss")))
    assert(r(3L) == ((3L, 2L, 0L, "uu vv ww pp oo nn")))
  }

  test("within-document repetition alone triggers the ban") {
    val r = run(Seq(1L -> "aa bb cc aa bb cc dd ee ff"))
    assert(r(1L) == ((1L, 3L, 2L, "dd ee ff")))
  }

  test("trailing partial window participates like any span") {
    // both docs end with the same 2-token tail; span size 3
    val r = run(Seq(1L -> "aa bb cc tail end", 2L -> "dd ee ff tail end"))
    assert(r(1L) == ((1L, 2L, 1L, "aa bb cc")))
    assert(r(2L) == ((2L, 2L, 1L, "dd ee ff")))
  }

  test("an all-boilerplate document survives as an empty string, not a dropped row") {
    val r = run(Seq(1L -> "aa bb cc", 2L -> "aa bb cc", 3L -> "xx yy zz"))
    assert(r(1L) == ((1L, 1L, 1L, "")))
    assert(r(2L) == ((2L, 1L, 1L, "")))
    assert(r(3L) == ((3L, 1L, 0L, "xx yy zz")))
  }

  test("maxOccur relaxes the ban threshold") {
    val docs = Seq(1L -> "aa bb cc", 2L -> "aa bb cc", 3L -> "aa bb cc")
    assert(run(docs, maxOccur = 3).values.forall(_._4 == "aa bb cc"))
    assert(run(docs, maxOccur = 2).values.forall(_._4 == ""))
  }

  test("exactSurvivors keeps the best-quality doc, ties to smallest id, maps every doc") {
    val df = Seq(
      (1L, "dup text", 5.0), (2L, "dup text", 9.0), (3L, "dup text", 9.0),
      (4L, "lonely doc", 1.0))
      .toDF("doc_id", "text", "q")
    val got = Dedup.exactSurvivors(df, "doc_id", "text", "q")
      .select("doc_id", "keep_id", "n_dups", "is_kept")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))        // every doc mapped
    assert(Seq(1L, 2L, 3L).forall(got(_)._2 == 2L))  // q=9 wins, tie -> min id
    assert(got(2L)._4 && !got(1L)._4 && !got(3L)._4)
    assert(got(1L)._3 == 3L && got(4L)._3 == 1L && got(4L)._4 && got(4L)._2 == 4L)
  }

  test("unique corpus round-trips through normalization unchanged") {
    val docs = (1L to 40L).map(i => i -> s"tok${i}a tok${i}b tok${i}c tok${i}d")
    val r = run(docs, k = 3)
    docs.foreach { case (id, text) =>
      assert(r(id)._3 == 0L && r(id)._4 == text.toLowerCase)
    }
  }
}

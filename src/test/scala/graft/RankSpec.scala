package graft

import graft.operators.Rank
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the exact-integer BM25 ranker; corpus-level
  * parity is the q_bm25 oracle's job. */
class RankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the operator's formulas re-derived on plain longs (JVM / is the
  // same truncating division the plan's `div` runs)
  private def idf(nd: Long, df: Long): Long =
    (2 * nd - 2 * df + 1) * 1000000L / (2 * df + 1)
  private def tfn(tf: Long, dl: Long, a: Long, nd: Long): Long =
    22 * tf * a * 1000000L / (10 * a * tf + 3 * a + 9 * dl * nd)

  test("bm25 matches the hand formula; docs with no query term are absent") {
    val docs = Seq(
      (1L, "x x y"),        // dl 3, tf x=2 y=1
      (2L, "x z z z"),      // dl 4, tf x=1
      (3L, "w w w w w"))    // dl 5, no query terms
      .toDF("doc_id", "text")
    val got = Rank.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .select("doc_id", "n_terms", "score_ppm")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (a, nd) = (12L, 3L)
    val exp1 = idf(nd, 2) * tfn(2, 3, a, nd) / 1000000L +
      idf(nd, 1) * tfn(1, 3, a, nd) / 1000000L
    val exp2 = idf(nd, 2) * tfn(1, 4, a, nd) / 1000000L
    assert(got == Map(1L -> (2L, exp1), 2L -> (1L, exp2)),
      s"got $got, expected doc1=$exp1 doc2=$exp2")
  }

  test("bm25 properties: rarer terms score higher, tf saturates, length penalizes") {
    // same tf, same dl: the rarer term must contribute more
    val docs = Seq(
      (1L, "rare common filler one"),
      (2L, "common filler two three"),
      (3L, "common filler four five")).toDF("doc_id", "text")
    val s = Rank.bm25(docs, "doc_id", "text", Seq("rare", "common"))
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(s(1L) > s(2L), "doc with the rare term outranks common-only docs")
    // saturation: doubling tf must not double the score contribution
    val sat = Seq((1L, "t a b c"), (2L, "t t a b")).toDF("doc_id", "text")
    val ss = Rank.bm25(sat, "doc_id", "text", Seq("t"))
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(ss(2L) > ss(1L) && ss(2L) < 2 * ss(1L), s"saturating: $ss")
    // length normalization: same tf, longer doc scores lower
    val len = Seq((1L, "t a"), (2L, "t a b c d e f g")).toDF("doc_id", "text")
    val ls = Rank.bm25(len, "doc_id", "text", Seq("t"))
      .select("doc_id", "score_ppm").as[(Long, Long)].collect().toMap
    assert(ls(1L) > ls(2L), s"length-normalized: $ls")
  }

  test("bm25 requires a non-empty term set") {
    intercept[IllegalArgumentException] {
      Rank.bm25(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", Nil)
    }
  }

  test("bm25Table equals per-query bm25 runs, ranked and capped at k") {
    val docs = Seq(
      (1L, "x x y m"), (2L, "x z z z"), (3L, "w w m w w"),
      (4L, "y y m z"), (5L, "m m x y z w")).toDF("doc_id", "text")
    val queries = Seq(
      ("qa", "x"), ("qa", "y"), ("qb", "m"), ("qc", "x"), ("qc", "w"))
      .toDF("query_id", "term")
    val got = Rank.bm25Table(docs, "doc_id", "text", queries, k = 3)
      .select("query_id", "doc_id", "n_terms", "score_ppm", "rank")
      .as[(String, Long, Long, Long, Int)].collect().toSet
    // reference: one bm25 run per query over the SAME corpus facts
    // (df in bm25 is computed from its own term set, but per-term df
    // depends only on the corpus, so the values agree), then rank
    val want = Seq(
      "qa" -> Seq("x", "y"), "qb" -> Seq("m"), "qc" -> Seq("x", "w"))
      .flatMap { case (q, ts) =>
        Rank.bm25(docs, "doc_id", "text", ts)
          .select("doc_id", "n_terms", "score_ppm")
          .as[(Long, Long, Long)].collect()
          .sortBy { case (id, _, sc) => (-sc, id) }.take(3).zipWithIndex
          .map { case ((id, nt, sc), i) => (q, id, nt, sc, i + 1) }
      }.toSet
    assert(got == want, s"table-vs-single divergence: got $got want $want")
  }

}

package graft

import graft.operators.CoOccur
import org.scalatest.funsuite.AnyFunSuite

/** Co-occurrence PMI invariants: hand-computed lift on a tiny corpus,
  * presence (not count) semantics, vocabulary bounding, and the
  * integer-division convention.
  */
class CoOccurSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("lift matches the hand computation; repeated tokens count once per doc") {
    // 4 docs; "alpha"+"beta" co-occur in 2 of them, each appears in 3
    val docs = Seq(
      (1L, "alpha beta beta alpha"),  // repeats collapse to presence
      (2L, "alpha beta gamma"),
      (3L, "alpha gamma"),
      (4L, "beta delta")).toDF("doc_id", "text")
    val got = CoOccur.pmi(docs, "doc_id", "text", topV = 10, minPairCount = 1L)
      .select("tok_a", "tok_b", "c_xy", "c_x", "c_y", "n_docs", "lift_ppm")
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val ab = got(("alpha", "beta"))
    assert(ab._3 == 2 && ab._4 == 3 && ab._5 == 3 && ab._6 == 4)
    // ((2*1e6) div 3) * 4 div 3 = 666666 * 4 div 3 = 888888
    assert(ab._7 == 888888L)
    val ag = got(("alpha", "gamma"))
    // ((2*1e6) div 3) * 4 div 2 = 1333332 — above-chance collocation
    assert(ag._3 == 2 && ag._7 == 1333332L)
    assert(ag._7 > 1000000L && ab._7 < 1000000L)
  }

  test("vocabulary cap keeps only the top-V document-frequency tokens") {
    // "rare" appears in 1 doc; with topV = 2 only alpha/beta survive
    val docs = Seq(
      (1L, "alpha beta rare"),
      (2L, "alpha beta"),
      (3L, "alpha beta")).toDF("doc_id", "text")
    val got = CoOccur.pmi(docs, "doc_id", "text", topV = 2, minPairCount = 1L)
      .select("tok_a", "tok_b").as[(String, String)].collect()
    assert(got.toSet == Set(("alpha", "beta")))
  }

  test("pair threshold filters singleton co-occurrences") {
    val docs = Seq((1L, "x y"), (2L, "x z"), (3L, "x y")).toDF("doc_id", "text")
    val got = CoOccur.pmi(docs, "doc_id", "text", topV = 5, minPairCount = 2L)
      .select("tok_a", "tok_b").as[(String, String)].collect()
    assert(got.toSet == Set(("x", "y")))
  }
}

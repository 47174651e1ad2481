package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bigramSurprisal matches the hand-computed add-one costs on a fixture") {
    // corpus bigram counts: (a,b):3 (b,a):2 (x,y):1; prefix counts
    // a:3 b:2 x:1; successor vocab V = |{b, a, y}| = 3
    // costs: (a,b) -> (3+3) div (3+1) = 1; (b,a) -> (2+3) div (2+1) = 1
    //        (x,y) -> (1+3) div (1+1) = 2
    val docs = Seq((1L, "a b a b a b"), (2L, "x y")).toDF("doc_id", "text")
    val out = LangModel.bigramSurprisal(docs, "doc_id", "text", keepPpm = 1500000L)
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "total_cost", "mean_cost_ppm", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 5L, 1000000L, true), // 5 bigrams, cost 1 each
      (2L, 1L, 2L, 2000000L, false)))
  }

  test("bigramSurprisal drops docs with fewer than two tokens") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "two tokens")).toDF("doc_id", "text")
    val ids = LangModel.bigramSurprisal(docs, "doc_id", "text", keepPpm = 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("dsirWeight matches an independent reference computation") {
    val rows = Seq(
      (1L, "tt tt ss", true),  // target-marker heavy
      (2L, "tt ss ss", true),
      (3L, "rr rr ss", false), // raw-only-marker heavy
      (4L, "rr ss tt", false),
      (5L, "qq qq qq", false)) // token unseen in target
    val docs = rows.toDF("doc_id", "text", "is_tgt")

    // reference: same formula, computed with plain Scala maps
    val toks = rows.flatMap { case (id, t, tgt) => t.split(" ").map(w => (id, w, tgt)) }
    val cr = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val ct = toks.filter(_._3).groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
      .withDefaultValue(0L)
    val nr = cr.values.sum
    val nt = toks.count(_._3).toLong
    val lift = cr.keys.map { w =>
      w -> ((ct(w) + 1) * 1000000L / (cr(w) + 1)) * nr / (nt + 1)
    }.toMap
    val expected = rows.map { case (id, t, _) =>
      val ws = t.split(" ")
      val mean = ws.map(lift).sum / ws.length
      (id, ws.length.toLong, mean, mean >= 1000000L)
    }

    val got = LangModel.dsirWeight(docs, "doc_id", "text",
        targetFilter = col("is_tgt"), keepPpm = 1000000L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected)
    // and the fixture separates as DSIR should: marker-heavy docs on
    // each side land on that side of the baseline, unseen-in-target
    // drops (doc 4 mixes markers and can land either way — the
    // reference equality above already pins it exactly)
    assert(got.head._4 && !got(2)._4 && !got(4)._4)
  }

  test("dsirWeight smoothing prices target-unseen tokens below baseline") {
    val docs = Seq((1L, "aa aa", true), (2L, "zz zz", false)).toDF("doc_id", "text", "t")
    val out = LangModel.dsirWeight(docs, "doc_id", "text", col("t"), 1000000L)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    assert(out(0)._3 > 1000000L && out(0)._4)
    assert(out(1)._3 < 1000000L && !out(1)._4)
  }
}

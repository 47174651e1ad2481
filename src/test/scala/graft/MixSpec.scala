package graft

import graft.operators.Mix
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Weighted source mixing invariants: copy counts per weight regime,
  * hash-determinism across partition layouts, achieved-rate report.
  */
class MixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = (1L to 400L).map { i =>
    (i, s"src${(i % 4)}", s"doc $i")
  }.toDF("doc_id", "source", "text")

  test("fracThresholdHex compiles fractional weights to hex literals") {
    assert(Mix.fracThresholdHex(1.0) == "00000000")
    assert(Mix.fracThresholdHex(2.25) == "40000000")
    assert(Mix.fracThresholdHex(1.5) == "80000000")
    assert(Mix.fracThresholdHex(0.4) == "66666666")
    assert(Mix.fracThresholdHex(0.6) == "99999999")
  }

  test("copy counts respect the weight regimes; unlisted sources drop") {
    val mixed = Mix.weightedSources(corpus, "doc_id", "source",
      Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.5)).cache()
    val bySrc = mixed.groupBy("source")
      .agg(countDistinct("doc_id").as("nd"), count(lit(1)).as("n"),
        max("copy_idx").as("maxc"))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap

    // src3 unlisted -> fully dropped
    assert(!bySrc.contains("src3"))
    // weight 1.0: every doc exactly once, copy_idx always 0
    assert(bySrc("src1") == ("src1", 100L, 100L, 0L))
    // weight 2.5: every doc present, 2 or 3 copies each, some of both
    assert(bySrc("src0")._2 == 100L)
    val copies = mixed.filter($"source" === "src0").groupBy("doc_id")
      .agg(count(lit(1)).as("c")).select("c").as[Long].collect()
    assert(copies.forall(c => c == 2L || c == 3L))
    assert(copies.exists(_ == 2L) && copies.exists(_ == 3L))
    // weight 0.5: a strict, non-empty subset, one copy each
    val (_, nd2, n2, maxc2) = bySrc("src2")
    assert(nd2 == n2 && maxc2 == 0L && nd2 > 0 && nd2 < 100)
    // copy_idx is dense 0..c-1 per doc
    val dense = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("c"), max("copy_idx").as("m"), min("copy_idx").as("lo"))
      .filter($"m" =!= $"c" - 1 || $"lo" =!= 0)
    assert(dense.isEmpty)
    mixed.unpersist()
  }

  test("mixing is a pure function of the data, not the partition layout") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mix.weightedSources(df, "doc_id", "source",
          Map("src0" -> 1.75, "src1" -> 0.3))
        .select("doc_id", "source", "copy_idx")
        .orderBy("doc_id", "copy_idx").collect().toSeq
    assert(run(corpus) == run(corpus.repartition(13)))
    assert(run(corpus) == run(corpus.coalesce(1)))
  }

  test("achieved rate converges on the target (exact-integer report)") {
    val weights = Map("src0" -> 2.0, "src1" -> 0.5)
    val mixed = Mix.weightedSources(corpus, "doc_id", "source", weights)
    val rep = Mix.mixReport(corpus, mixed, "source")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // integer weight: exact
    assert(rep("src0") == ("src0", 100L, 200L, 2000000L))
    // fractional weight: binomial-ish around 500000 ppm, 100 trials
    val ppm = rep("src1")._4
    assert(ppm > 300000L && ppm < 700000L, s"achieved $ppm ppm for target 0.5")
    // dropped source reports 0 out
    assert(rep("src2")._3 == 0L && rep("src2")._4 == 0L)
  }

  // skewed corpus for temperature sampling: 160/30/10 docs per source
  private def skewed = ((1L to 160L).map((_, "big")) ++
      (161L to 190L).map((_, "mid")) ++ (191L to 200L).map((_, "small")))
    .map { case (i, s) => (i, s, s"doc $i") }.toDF("doc_id", "source", "text")

  test("temperature alpha=1 is the identity mix: every doc once") {
    val m = Mix.temperature(skewed, "doc_id", "source", alpha = 1.0)
    assert(m.count() == 200L)
    assert(m.agg(max("copy_idx"), min("weight_ppm"), max("weight_ppm"))
      .head() == org.apache.spark.sql.Row(0L, 1000000L, 1000000L))
  }

  test("temperature alpha=0.5 upsamples small sources, downsamples big ones") {
    val m = Mix.temperature(skewed, "doc_id", "source", alpha = 0.5).cache()
    val ppm = m.groupBy("source").agg(max("weight_ppm").as("p"))
      .as[(String, Long)].collect().toMap
    // w_s = sqrt(n_s)·N/(n_s·Σsqrt) monotonically favors rare sources
    assert(ppm("small") > ppm("mid") && ppm("mid") > ppm("big"))
    assert(ppm("big") < 1000000L && ppm("small") > 1000000L)
    // total stays ≈ N in expectation: Σ n_s·w_s = N exactly, realized
    // count is hash-binomial around it
    val n = m.count()
    assert(n > 150 && n < 250, s"mixed corpus size $n")
    // every emitted weight matches the closed form to the ppm
    val sp = math.sqrt(160) + math.sqrt(30) + math.sqrt(10)
    for ((s, cnt) <- Seq(("big", 160), ("mid", 30), ("small", 10))) {
      val w = BigDecimal(math.sqrt(cnt) * 200 / (cnt * sp))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ppm(s) == math.round(w * 1e6), s"weight for $s")
    }
    m.unpersist()
  }

  test("temperature mixing is partition-layout independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Mix.temperature(df, "doc_id", "source", alpha = 0.5)
        .select("doc_id", "source", "copy_idx")
        .orderBy("doc_id", "copy_idx").collect().toSeq
    assert(run(skewed) == run(skewed.repartition(17)))
  }
}

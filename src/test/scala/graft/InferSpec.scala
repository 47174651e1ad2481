package graft

import graft.operators.Infer
import org.scalatest.funsuite.AnyFunSuite

/** Hashed-feature linear inference: score parity with a naive JDK-md5
  * reference (independent of Spark's expression stack), bias-only
  * empty docs, and the bucket-range contract.
  */
class InferSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5Bucket(salt: String, tok: String, b: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((salt + tok).getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    Integer.parseInt(hex.take(3), 16) % b
  }

  private def naiveScore(text: String, weights: Seq[Long], bias: Long): (Long, Long) = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    (toks.length.toLong, bias + toks.map(t => weights(md5Bucket("fh", t, weights.size))).sum)
  }

  test("linearScore matches the naive md5 reference, keeps empty docs at bias") {
    val weights = Seq.tabulate(256)(i => (i.toLong * 37) % 101 - 50)
    val docs = Seq(
      (1L, "The quick brown fox, jumps! Over 42 lazy dogs."),
      (2L, "spark spark spark"),
      (3L, ""),
      (4L, "!!! ... ---")).toDF("doc_id", "text")
    val got = Infer.linearScore(docs, "doc_id", "text", weights, bias = 5L)
      .select("doc_id", "n_tokens", "score", "keep")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == 4, "every doc appears exactly once")
    for ((id, text) <- Seq(1L -> "The quick brown fox, jumps! Over 42 lazy dogs.",
        2L -> "spark spark spark")) {
      val (n, s) = naiveScore(text, weights, 5L)
      assert(got(id)._2 == n && got(id)._3 == s, s"doc $id")
      assert(got(id)._4 == (s > 0))
    }
    // token-free docs: zero features, bias-only score, still present
    assert(got(3L) == ((3L, 0L, 5L, true)))
    assert(got(4L) == ((4L, 0L, 5L, true)))
  }

  test("repeated tokens accumulate their weight linearly") {
    val weights = Seq.tabulate(16)(_.toLong)
    val w = weights(md5Bucket("fh", "spark", 16))
    val docs = Seq((1L, "spark"), (2L, "spark spark spark")).toDF("doc_id", "text")
    val got = Infer.linearScore(docs, "doc_id", "text", weights)
      .select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(got(2L) == 3 * got(1L))
    assert(got(1L) == w)
  }

  test("weights size must divide the 3-hex-digit range") {
    intercept[IllegalArgumentException] {
      Infer.linearScore(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Seq.fill(100)(1L))
    }
  }
}

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

/** Arbitrary-length exact-substring dedup (VERDICT r15 next-round #4,
  * the Lee-et-al suffix-array family): variable-length maximal-extent
  * removal via stride-1 gram coverage, pinned on hand fixtures AND a
  * seeded fuzz corpus against an independent O(n²) brute force.
  */
class DedupSubstringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], l: Int = 4, maxOccur: Long = 1) =
    Dedup.dedupSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text",
        minTokens = l, maxOccur = maxOccur)
      .select("doc_id", "n_tokens", "n_removed", "n_extents", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap

  /** Independent brute force: token removed iff covered by a stride-1
    * L-gram whose corpus count exceeds maxOccur. */
  private def brute(docs: Seq[(Long, String)], l: Int, maxOccur: Long)
      : Map[Long, (Long, Long, Long, String)] = {
    def toks(t: String): Vector[String] =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ", -1).toVector
    val tokd = docs.map { case (id, t) => id -> toks(t) }
    val counts = scala.collection.mutable.Map[Seq[String], Long]()
    tokd.foreach { case (_, ts) =>
      if (ts.size >= l) ts.sliding(l).foreach(g => counts(g) = counts.getOrElse(g, 0L) + 1) }
    tokd.map { case (id, ts) =>
      val rm = Array.fill(ts.size)(false)
      if (ts.size >= l)
        ts.sliding(l).zipWithIndex.foreach { case (g, s) =>
          if (counts(g) > maxOccur) (s until s + l).foreach(rm(_) = true) }
      val extents = rm.zipWithIndex.count { case (r, i) => r && (i == 0 || !rm(i - 1)) }
      (id, (ts.size.toLong, rm.count(identity).toLong, extents.toLong,
        ts.zipWithIndex.filterNot(p => rm(p._2)).map(_._1).mkString(" ")))
    }.toMap
  }

  test("a long repeated run is removed IN FULL from every occurrence, " +
    "at any length >= minTokens") {
    // a 7-token quote inside two otherwise-unique docs, L=4: dedupSpans
    // at fixed windows would clip it; the substring form kills all 7
    val quote = "q1 q2 q3 q4 q5 q6 q7"
    val r = run(Seq(
      1L -> s"u1 u2 $quote u3 u4",
      2L -> s"v1 $quote v2 v3 v4"))
    assert(r(1L) == ((1L, 11L, 7L, 1L, "u1 u2 u3 u4")))
    assert(r(2L) == ((2L, 11L, 7L, 1L, "v1 v2 v3 v4")))
  }

  test("two disjoint repeats yield two extents; adjacent repeats merge into one") {
    val a = "a1 a2 a3 a4"; val b = "b1 b2 b3 b4"
    val r = run(Seq(
      1L -> s"$a mid1 mid2 $b",
      2L -> s"$a x1 x2 x3 x4",
      3L -> s"y1 y2 y3 y4 $b"))
    assert(r(1L)._4 == 2L && r(1L)._5 == "mid1 mid2")
    // doc 4/5: the two 4-gram repeats sit back-to-back -> ONE extent
    val r2 = run(Seq(4L -> s"$a $b tail1 tail2", 5L -> s"$a $b other1 other2"))
    assert(r2(4L)._3 == 8L && r2(4L)._4 == 1L && r2(4L)._5 == "tail1 tail2")
  }

  test("within-document self-repeat is banned; unique corpus untouched") {
    val r = run(Seq(1L -> "s1 s2 s3 s4 mid s1 s2 s3 s4"))
    assert(r(1L) == ((1L, 9L, 8L, 2L, "mid")))
    val u = run(Seq(1L -> "w1 w2 w3 w4 w5", 2L -> "z1 z2 z3 z4 z5"))
    assert(u(1L)._3 == 0L && u(1L)._5 == "w1 w2 w3 w4 w5")
  }

  test("docs shorter than minTokens contribute no grams and lose nothing") {
    val r = run(Seq(1L -> "short doc", 2L -> "short doc", 3L -> "short doc"))
    assert(r(1L) == ((1L, 2L, 0L, 0L, "short doc")))
  }

  test("seeded fuzz corpus matches the O(n²) brute force exactly") {
    val rnd = new scala.util.Random(416L)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val boiler = "k1 k2 k3 k4 k5"
    val docs = (1L to 40L).map { id =>
      val n = rnd.nextInt(18)
      val body = (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).toVector
      val withBoiler =
        if (rnd.nextInt(3) == 0) {
          // splice the boilerplate run CONTIGUOUSLY at a random point
          val at = rnd.nextInt(body.size + 1)
          (body.take(at) ++ boiler.split(" ") ++ body.drop(at)).mkString(" ")
        } else body.mkString(" ")
      id -> (if (withBoiler.isEmpty) "solo" else withBoiler)
    }
    for (l <- Seq(3, 4); mo <- Seq(1L, 2L)) {
      val got = run(docs, l, mo)
      val want = brute(docs, l, mo)
      docs.foreach { case (id, _) =>
        assert(got(id) == ((id, want(id)._1, want(id)._2, want(id)._3, want(id)._4)),
          s"L=$l maxOccur=$mo doc $id: got ${got(id)}, want ${want(id)}")
      }
    }
  }
}

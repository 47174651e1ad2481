package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded randomized differential tests: operators vs naive in-memory
  * reference implementations on adversarial small data (null keys and
  * times, duplicate timestamps, hot keys, empty sides). Deterministic
  * seeds — failures reproduce exactly.
  */
class DifferentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AsOfJoinExec matches a naive nested-loop as-of on random data") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      def key() = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(6).toLong)
      def time() = if (rnd.nextInt(12) == 0) None else Some(rnd.nextInt(50).toLong)
      val left = (0 until 120).map(i => (i.toLong, key(), time()))
      // unique (key, time) on the right, as the operator contract asks
      val right = rnd.shuffle(
        (for (k <- 0L until 6L; t <- 0L until 50L) yield (k, t)).toVector)
        .take(80).zipWithIndex
        .map { case ((k, t), i) => (1000L + i, Some(k), Some(t), rnd.nextDouble()) }
      val tol = 13L
      val lDf = left.toDF("lid", "k", "t")
      val rDf = right.toDF("rid", "rk", "rt", "v")
      val got = graft.plans.AsOfJoin.backward(lDf, rDf, "k", "rk", "t", "rt", tol)
        .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
      // naive reference: scan all right rows per left row
      val expected = left.map { case (lid, k, t) =>
        val m = for {
          kk <- k; tt <- t
        } yield right.filter(r => r._2.contains(kk) && r._3.exists(rt => rt <= tt && tt - rt <= tol))
          .sortBy(_._3.get).lastOption.map(_._1)
        lid -> m.flatten
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("salted join matches plain join on random skewed data") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      val probe = (0 until 300).map { i =>
        (if (rnd.nextInt(4) == 0) rnd.nextInt(8).toLong else 0L, i) // hot key 0
      }.toDF("k", "line")
      val build = (0 until 30).map(i => (rnd.nextInt(10).toLong, s"d$i")).toDF("bk", "name")
      val salted = graft.operators.SkewJoin
        .salted(probe, build, "k", "bk", salts = 4, saltBy = col("line"))
        .collect().map(_.toSeq).toList.sortBy(_.toString)
      val plain = probe.join(build, col("k") === col("bk"))
        .collect().map(_.toSeq).toList.sortBy(_.toString)
      assert(salted == plain, s"seed=$seed")
    }
  }

  test("exact dedup keeps exactly one survivor per content group (random dupes)") {
    val rnd = new scala.util.Random(19)
    val texts = Vector("alpha beta", "gamma", "delta epsilon zeta", "eta", "theta iota")
    val docs = (0 until 200).map(i => (i.toLong, texts(rnd.nextInt(texts.size))))
      .toDF("doc_id", "text")
    val survivors = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    // reference: min doc_id per distinct normalized content
    val rows = docs.as[(Long, String)].collect()
    val expectedSet = rows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet
    assert(survivors == expectedSet)
  }
}

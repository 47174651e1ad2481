package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The driver-side eigen step (r14, VERDICT r13 #2): Stats.jacobiEigen
  * on closed-form fixtures, the quantized eigenbasis on a corpus with
  * a PLANTED dominant direction, and the q_embed_eigen certification
  * booleans end-to-end (whose in-plan projection-energy ==
  * driver-quadform identity is what the oracle hash pins).
  */
class EmbedEigenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jacobiEigen: closed-form 2x2 and 3x3 fixtures") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (v2, u2) = Stats.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(u2(0)(0)) - r) < 1e-12 &&
      math.abs(u2(0)(0) - u2(0)(1)) < 1e-12) // (1,1) direction
    assert(math.abs(u2(1)(0) + u2(1)(1)) < 1e-12) // (1,-1) direction
    // diagonal matrix: eigenvalues sorted desc, vectors are unit axes
    val (v3, u3) = Stats.jacobiEigen(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, 9.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(v3.toSeq == Seq(9.0, 7.0, 5.0))
    assert(u3(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(u3(1).toSeq == Seq(0.0, 0.0, 1.0))
    assert(u3(2).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("jacobiEigen: reconstruction, orthonormality, determinism on a dense matrix") {
    // deterministic pseudo-random symmetric 8x8 (no RNG: hash-ish fill)
    val n = 8
    def cell(i: Int, j: Int): Double = ((i * 31 + j * 17) % 13) - 6.0
    val m = Array.tabulate(n, n)((i, j) =>
      if (i <= j) cell(i, j) else cell(j, i))
    val (vals, vecs) = Stats.jacobiEigen(m)
    // orthonormality
    for (a <- 0 until n; b <- 0 until n) {
      val dot = (0 until n).map(k => vecs(a)(k) * vecs(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"u$a . u$b = $dot")
    }
    // reconstruction: sum_c lambda_c u_c u_c^T == M
    for (i <- 0 until n; j <- 0 until n) {
      val rec = (0 until n).map(c => vals(c) * vecs(c)(i) * vecs(c)(j)).sum
      assert(math.abs(rec - m(i)(j)) < 1e-8, s"M[$i][$j]: $rec vs ${m(i)(j)}")
    }
    // eigen equation per pair
    for (c <- 0 until n; i <- 0 until n) {
      val mv = (0 until n).map(k => m(i)(k) * vecs(c)(k)).sum
      assert(math.abs(mv - vals(c) * vecs(c)(i)) < 1e-8)
    }
    // ordering + bit determinism across calls
    assert(vals.toSeq == vals.toSeq.sortBy(-(_: Double)))
    val (vals2, vecs2) = Stats.jacobiEigen(m)
    assert(vals.toSeq == vals2.toSeq && vecs.map(_.toSeq).toSeq == vecs2.map(_.toSeq).toSeq)
  }

  test("eigenBasis on a planted-direction corpus: ordering and alignment") {
    // 64-dim int vectors: strong energy along axis 3, weaker along
    // axis 10, tiny elsewhere — the derived basis must rank axis 3's
    // direction first and axis 10's second, and projected variance
    // ordering must match the gram's eigenvalue ordering.
    val dim = 64
    val rows = (0 until 200).map { r =>
      val v = Array.ofDim[Long](dim)
      v(3) = (if (r % 2 == 0) 1 else -1) * (50L + (r % 7))
      v(10) = (if (r % 3 == 0) 1 else -1) * (20L + (r % 5))
      v(17) = (r % 3) - 1L
      (r.toLong, v.toSeq)
    }
    val df = rows.toDF("id", "q")
    val gram = Stats.collectGram(Stats.gramMatrix(df.select("q"), "q"), dim)
    val (basis, quad) = Stats.eigenBasis(gram, topD = 4)
    // top eigenvector hugs axis 3 (scale 32768): |u[3]| ~ scale
    assert(math.abs(basis(0)(3)) > 32000, s"basis0 = ${basis(0).take(20)}")
    assert(math.abs(basis(1)(10)) > 32000, s"basis1 = ${basis(1).take(20)}")
    // quadratic forms (the certified energies) strictly ordered
    assert(quad(0) > quad(1) && quad(1) > quad(2),
      s"quad = $quad")
    // the exact identity the query certifies: in-plan energy == u'Gu
    import graft.functions.VectorFunctions.vecDotLong
    (0 until 4).foreach { c =>
      val p = vecDotLong(col("q"), typedlit(basis(c)))
      val e = df.agg(sum((p * p).cast(
        org.apache.spark.sql.types.DecimalType(38, 0)))).head().getDecimal(0)
      assert(BigInt(e.toBigInteger) == quad(c), s"component $c")
    }
  }

  test("q_embed_eigen: every certification boolean true end-to-end") {
    Seq("/root/testdata/sf0.001", SparkTestSession.sfDir).distinct.foreach { sf =>
      val out = SparkEntry.queries("q_embed_eigen")(spark, sf).collect()
      assert(out.length == 8)
      assert(out.map(_.getInt(0)).toSeq == (0 until 8))
      assert(out.forall(_.getBoolean(1)), s"$sf: quadform mismatch")
      assert(out.forall(_.getBoolean(2)), s"$sf: energy ordering violated")
    }
  }
}

package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stats invariants: Welch t against a naive double-precision
  * reference, OLS against an exact line and a naive reference,
  * undefined-variance surfacing.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveWelch(a: Seq[Double], b: Seq[Double]): (Double, Double) = {
    def mv(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (na, ma, va) = mv(a); val (nb, mb, vb) = mv(b)
    val (sea, seb) = (va / na, vb / nb)
    ((ma - mb) / math.sqrt(sea + seb),
     (sea + seb) * (sea + seb) / (sea * sea / (na - 1) + seb * seb / (nb - 1)))
  }

  test("welchT matches a naive reference on a fixed cohort pair") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)
    val df = (a.map(("p1", "ctl", _)) ++ b.map(("p1", "mut", _)))
      .toDF("param", "cohort", "v")
    val r = Stats.welchT(df, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("n_a", "n_b", "mean_a", "mean_b", "var_a", "var_b", "t_stat", "df_welch")
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)].head()
    val (t, dfw) = naiveWelch(a, b)
    assert(r._1 == 4L && r._2 == 5L)
    assert(math.abs(r._3 - 2.5) < 1e-9 && math.abs(r._4 - 6.0) < 1e-9)
    assert(math.abs(r._5 - 5.0 / 3) < 1e-9 && math.abs(r._6 - 10.0) < 1e-9)
    assert(math.abs(r._7 - t) < 1e-9)
    assert(math.abs(r._8 - dfw) < 1e-9)
  }

  test("welchT surfaces null t when a cohort has n < 2") {
    val df = Seq(("p1", "ctl", 1.0), ("p1", "mut", 2.0), ("p1", "mut", 3.0))
      .toDF("param", "cohort", "v")
    val r = Stats.welchT(df, Seq("param"), "v", "cohort", "ctl", "mut")
    assert(r.count() == 1)
    val row = r.select("n_a", "t_stat", "df_welch").head()
    assert(row.getLong(0) == 1L && row.isNullAt(1) && row.isNullAt(2))
  }

  test("chiSquare matches the hand-computed contingency statistic") {
    val rows = Seq.fill(10)(("k", "x", "p")) ++ Seq.fill(20)(("k", "x", "q")) ++
      Seq.fill(30)(("k", "y", "p")) ++ Seq.fill(40)(("k", "y", "q"))
    val df = rows.toDF("key", "a", "b")
    val r = Stats.chiSquare(df, Seq("key"), "a", "b")
      .select("chi2", "dof", "n").as[(Double, Long, Long)].head()
    // E = margin products / N: 12, 18, 28, 42
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    assert(math.abs(r._1 - expected) < 1e-9)
    assert(r._2 == 1L && r._3 == 100L)
  }

  test("chiSquare is ~0 for an exactly independent table") {
    val rows = for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 25 }
      yield ("k", a, b)
    val r = Stats.chiSquare(rows.toDF("key", "a", "b"), Seq("key"), "a", "b")
      .select("chi2", "p_value").as[(Double, Double)].head()
    assert(math.abs(r._1) < 1e-12)
    assert(math.abs(r._2 - 1.0) < 1e-9) // chi2 ≈ 0 ⇒ p ≈ 1
  }

  test("Misra-Gries: no overcount, bounded undercount, heavy items present") {
    import graft.functions.HeavyHitters.misraGries
    // known stream: a=60, b=35, c=20, plus 85 singletons; n = 200
    val items = Seq.fill(60)("a") ++ Seq.fill(35)("b") ++ Seq.fill(20)("c") ++
      (0 until 85).map(i => s"x$i")
    val n = items.size
    val k = 5
    // repartition(8): the guarantees must hold ACROSS partial buffers
    // and merge order, not just for one stream
    val out = items.toDF("tok").repartition(8)
      .agg(misraGries(col("tok"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est_count"))
      .as[(String, Long)].collect().toMap
    assert(out.size <= k)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // est <= true (never overcounts), true - est <= n/(k+1)
    out.foreach { case (item, est) =>
      assert(est <= truth(item), s"overcount for $item")
      assert(truth(item) - est <= n / (k + 1), s"undercount bound broken for $item")
    }
    // any item with true freq > n/(k+1) = 33 must be present
    assert(out.contains("a") && out.contains("b"))
    // SQL registration round-trip
    items.toDF("tok").createOrReplaceTempView("t_hh")
    val viaSql = spark.sql(s"SELECT misra_gries(tok, $k) FROM t_hh").head().getSeq[Any](0)
    assert(viaSql.nonEmpty)
    // document-length items survive buffer serialization (writeUTF
    // would cap at 64KB and crash the partial-agg shuffle)
    val big = "x" * 100000
    val bigOut = (Seq.fill(3)(big) ++ Seq("small")).toDF("tok").repartition(2)
      .agg(misraGries(col("tok"), 2).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est_count")).as[(String, Long)].collect()
    assert(bigOut.exists { case (item, c) => item == big && c >= 2 })
  }

  test("p-value special functions match published quantile fixtures") {
    import graft.functions.StatMath._
    // χ² upper-tail: the textbook 0.05/0.01 critical values
    assert(math.abs(chi2PValue(3.841458820694124, 1) - 0.05) < 1e-9)
    assert(math.abs(chi2PValue(5.991464547107979, 2) - 0.05) < 1e-9)
    assert(math.abs(chi2PValue(6.634896601021213, 1) - 0.01) < 1e-9)
    assert(chi2PValue(0.0, 3) == 1.0)
    // two-sided t: 0.05 critical values at df 1 / 10 / 30
    assert(math.abs(tPValueTwoSided(12.706204736432095, 1) - 0.05) < 1e-9)
    assert(math.abs(tPValueTwoSided(2.2281388519649385, 10) - 0.05) < 1e-9)
    assert(math.abs(tPValueTwoSided(2.0422724563012373, 30) - 0.05) < 1e-9)
    assert(tPValueTwoSided(0.0, 10) == 1.0)
    // large-df t converges to the normal 1.96 two-sided 5%
    assert(math.abs(tPValueTwoSided(1.9599639845400545, 1e7) - 0.05) < 1e-4)
    // lnGamma anchor points: Γ(1)=Γ(2)=1, Γ(0.5)=√π
    assert(math.abs(lnGamma(1.0)) < 1e-12 && math.abs(lnGamma(2.0)) < 1e-12)
    assert(math.abs(lnGamma(0.5) - 0.5 * math.log(math.Pi)) < 1e-12)
  }

  test("p_value columns ride the operators through codegen") {
    // welchT: symmetric cohorts with a known-ish separation — the
    // in-plan expression must equal the direct StatMath call on the
    // exact t/df the operator produced
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(2.0, 4.0, 6.0, 8.0, 10.0)
    val df = (a.map(("p1", "ctl", _)) ++ b.map(("p1", "mut", _)))
      .toDF("param", "cohort", "v")
    val r = Stats.welchT(df, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("t_stat", "df_welch", "p_value")
      .as[(Double, Double, Double)].head()
    assert(math.abs(r._3 - graft.functions.StatMath.tPValueTwoSided(r._1, r._2)) < 1e-15)
    assert(r._3 > 0.0 && r._3 < 1.0)
    // chiSquare: p matches the direct call; n<2 cohort yields null p
    val rows = Seq.fill(10)(("k", "x", "p")) ++ Seq.fill(20)(("k", "x", "q")) ++
      Seq.fill(30)(("k", "y", "p")) ++ Seq.fill(40)(("k", "y", "q"))
    val c = Stats.chiSquare(rows.toDF("key", "a", "b"), Seq("key"), "a", "b")
      .select("chi2", "dof", "p_value").as[(Double, Long, Double)].head()
    assert(math.abs(c._3 - graft.functions.StatMath.chi2PValue(c._1, c._2.toDouble)) < 1e-15)
    val degenerate = Seq(("p1", "ctl", 1.0), ("p1", "mut", 2.0), ("p1", "mut", 3.0))
      .toDF("param", "cohort", "v")
    val d = Stats.welchT(degenerate, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("p_value").head()
    assert(d.isNullAt(0))
  }

  test("zOutliers flags exactly the deviant rows and skips zero-variance keys") {
    val df = (Seq.fill(4)(("g1", 0.0)) :+ ("g1", 100.0))
      .++(Seq.fill(5)(("flat", 7.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val out = Stats.zOutliers(df, Seq("g"), "v", threshold = 1.5)
      .select("id", "g", "z").as[(Long, String, Double)].collect()
    // g1: mean 20, sample sd sqrt(2000) => z(100) = 80/44.72 = 1.789
    assert(out.length == 1)
    assert(out.head._2 == "g1" && out.head._1 == 4L)
    assert(math.abs(out.head._3 - 80.0 / math.sqrt(2000.0)) < 1e-9)
  }

  test("welchT ignores null values entirely (n, mean, var range over the same rows)") {
    val df = (Seq(Some(1.0), Some(2.0), Some(3.0), None).map(("p", "ctl", _)) ++
        Seq(Some(4.0), Some(6.0), None, None).map(("p", "mut", _)))
      .toDF("param", "cohort", "v")
    val r = Stats.welchT(df, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("n_a", "n_b", "mean_a", "mean_b").head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 2.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 5.0) < 1e-9)
  }

  test("timeWeightedMean holds values across gaps; nulls bridged, singletons dropped") {
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val df = Seq(
      (1L, at(0), Some(10.0), 1L),   // holds 30s (null at 10s bridged)
      (1L, at(10), None, 2L),
      (1L, at(30), Some(40.0), 3L),  // holds 10s
      (1L, at(40), Some(99.0), 4L),  // last: no weight
      (2L, at(0), Some(5.0), 5L))    // singleton: no interval at all
      .toDF("user_id", "ts", "v", "event_id")
    val got = Stats.timeWeightedMean(df, Seq("user_id"), "ts", "v", "event_id")
      .select("user_id", "n_intervals", "total_us", "twap")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(2L))
    val (_, n, tot, twap) = got(1L)
    assert(n == 2L && tot == 40L * 1000000L)
    assert(math.abs(twap - (10.0 * 30 + 40.0 * 10) / 40) < 1e-9)
  }

  test("q_hll_union exact twins match independents and bounds hold") {
    // r13: the query emits (event_type, exact_users, within_bounds) —
    // the sketch estimate became an in-plan bound check the driver
    // hash-compares; this spec re-derives the exacts independently
    val d = SparkTestSession.sfDir
    val got = SparkEntry.queries("q_hll_union")(spark, d)
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ev = graft.sources.Tables(spark, d).events
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("nd"))
      .as[(String, Long)].collect().toMap
    val exactTotal = ev.select(countDistinct("user_id")).as[Long].head()
    exact.foreach { case (t, nd) =>
      val (e, w) = got(t)
      assert(e == nd && w, s"$t: exact $e vs $nd, within=$w")
    }
    val (te, tw) = got("__total__")
    assert(te == exactTotal && tw)
    // the union row covers every per-type population
    assert(te >= exact.values.max)
    // union-dominance of the SKETCH estimates themselves (ADVICE r13;
    // slack per ADVICE r14): the union takes register-wise max, but
    // the ESTIMATORS differ — single sketches read the HIP estimator
    // while post-union sketches fall back to the composite estimator,
    // so the union estimate can land slightly BELOW a dominant input's
    // estimate. Assert dominance up to the 4σ relative width at the
    // default lgK=12 (rsd ≈ 1.04/√4096 ≈ 1.63%; the gate's own bound
    // convention, QueriesStats.scala)
    val perSketch = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[(String, Long)].collect().toMap
    val unionEst = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .as[Long].head()
    assert(perSketch.nonEmpty)
    val slack = 4.0 * 1.04 / math.sqrt(4096.0) // 4σ at lgK=12
    perSketch.foreach { case (t, e) =>
      assert(unionEst >= e * (1.0 - slack),
        s"union estimate $unionEst < per-type $t estimate $e beyond 4σ slack")
    }
  }

  test("degenerate groups surface null, never NaN/Inf") {
    // welch: both cohorts constant -> zero standard error
    val wd = (Seq.fill(3)(("p", "ctl", 5.0)) ++ Seq.fill(3)(("p", "mut", 7.0)))
      .toDF("param", "cohort", "v")
    val wr = Stats.welchT(wd, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("t_stat", "df_welch").head()
    assert(wr.isNullAt(0) && wr.isNullAt(1))
    // linreg: constant x -> null slope/intercept/r2; constant y -> r2 null, slope 0
    val ld = Seq(("cx", 2.0, 1.0), ("cx", 2.0, 5.0), ("cx", 2.0, 9.0),
        ("cy", 1.0, 4.0), ("cy", 2.0, 4.0), ("cy", 3.0, 4.0))
      .toDF("g", "x", "y")
    val lr = Stats.linreg(ld, Seq("g"), "y", "x")
      .select("g", "slope", "intercept", "r2")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(lr("cx").isNullAt(1) && lr("cx").isNullAt(2) && lr("cx").isNullAt(3))
    assert(lr("cy").getDouble(1) == 0.0 && lr("cy").isNullAt(3))
  }

  test("linreg recovers an exact line with r2 = 1") {
    val df = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 1.0)).toDF("g", "x", "y")
    val r = Stats.linreg(df, Seq("g"), "y", "x")
      .select("n", "slope", "intercept", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 20L)
    assert(math.abs(r._2 - 2.0) < 1e-9)
    assert(math.abs(r._3 - 1.0) < 1e-9)
    assert(math.abs(r._4 - 1.0) < 1e-9)
  }

  test("linreg matches a naive closed form on noisy groups") {
    val rnd = new scala.util.Random(7)
    val pts = for (g <- Seq("a", "b"); i <- 1 to 50)
      yield (g, i.toDouble, 3.0 * i + (if (g == "a") 5 else -2) +
        math.floor(rnd.nextGaussian() * 100) / 100)
    val df = pts.toDF("g", "x", "y")
    val got = Stats.linreg(df, Seq("g"), "y", "x")
      .select("g", "slope", "intercept")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (g <- Seq("a", "b")) {
      val xs = pts.filter(_._1 == g).map(_._2); val ys = pts.filter(_._1 == g).map(_._3)
      val n = xs.size
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val icept = (sy - slope * sx) / n
      assert(math.abs(got(g)._1 - slope) < 1e-6, s"slope $g")
      assert(math.abs(got(g)._2 - icept) < 1e-6, s"intercept $g")
    }
  }

  test("linreg ignores rows where either side is null") {
    val df = Seq(("g", Some(1.0), Some(3.0)), ("g", Some(2.0), Some(5.0)),
        ("g", Some(3.0), Some(7.0)), ("g", None, Some(9.0)), ("g", Some(4.0), None))
      .toDF("g", "x", "y")
    val r = Stats.linreg(df, Seq("g"), "y", "x")
      .select("n", "slope", "intercept").as[(Long, Double, Double)].head()
    assert(r._1 == 3L)
    assert(math.abs(r._2 - 2.0) < 1e-9 && math.abs(r._3 - 1.0) < 1e-9)
  }

  /** Naive midrank Mann–Whitney reference: sort, average tied ranks,
    * tie-corrected normal variance. */
  private def naiveMwu(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) = {
    val all = (a.map((_, "a")) ++ b.map((_, "b"))).sortBy(_._1)
    val rank = all.zipWithIndex.groupBy(_._1._1).flatMap { case (_, g) =>
      val mid = g.map(_._2 + 1.0).sum / g.size
      g.map { case ((_, c), i) => (i, c, mid) }
    }.toSeq
    val ra = rank.filter(_._2 == "a").map(_._3).sum
    val na = a.size.toDouble; val nb = b.size.toDouble; val n = na + nb
    val ua = ra - na * (na + 1) / 2
    val tie3 = all.groupBy(_._1).values.map(g => math.pow(g.size, 3) - g.size).sum
    val varU = na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    (ua, na * nb - ua, (ua - na * nb / 2) / math.sqrt(varU))
  }

  test("mannWhitneyU matches a naive midrank reference with ties") {
    val a = Seq(1.0, 2.0, 3.0)
    val b = Seq(2.0, 3.0, 4.0, 5.0)
    val df = (a.map(("p1", "ctl", _)) ++ b.map(("p1", "mut", _)))
      .toDF("param", "cohort", "v")
    val r = Stats.mannWhitneyU(df, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("n_a", "n_b", "u_a", "u_b", "z", "p_value")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val (ua, ub, z) = naiveMwu(a, b)
    assert(r._1 == 3L && r._2 == 4L)
    assert(math.abs(r._3 - ua) < 1e-9 && math.abs(r._4 - ub) < 1e-9)
    assert(math.abs(r._5 - z) < 1e-9)
    // hand check of the worked example: U_a = 8 − 6 = 2
    assert(math.abs(r._3 - 2.0) < 1e-12)
    assert(r._6 > 0 && r._6 < 1)
  }

  test("mannWhitneyU: all-tied key surfaces null z, equal halves get z = 0") {
    val df = (Seq.fill(3)(("t", "ctl", 5.0)) ++ Seq.fill(4)(("t", "mut", 5.0)) ++
        Seq(("s", "ctl", 1.0), ("s", "mut", 2.0), ("s", "ctl", 2.0), ("s", "mut", 1.0)))
      .toDF("param", "cohort", "v")
    val rows = Stats.mannWhitneyU(df, Seq("param"), "v", "cohort", "ctl", "mut")
      .select("param", "z").collect().map(r => r.getString(0) -> r).toMap
    assert(rows("t").isNullAt(1), "zero-variance key must yield null z")
    assert(math.abs(rows("s").getDouble(1)) < 1e-12, "symmetric key z = 0")
  }

  test("mannWhitneyU p-value matches the normal two-sided tail") {
    // P[|Z| >= 1.959964] = 0.05 (published normal quantile)
    assert(math.abs(graft.functions.StatMath.normalPTwoSided(1.959964) - 0.05) < 1e-5)
    assert(math.abs(graft.functions.StatMath.normalPTwoSided(2.575829) - 0.01) < 1e-5)
    assert(math.abs(graft.functions.StatMath.normalPTwoSided(0.0) - 1.0) < 1e-12)
  }

  test("fisherExact p matches exact rational fixtures (incl. R's tea-tasting table)") {
    import graft.functions.StatMath.fisherExactP
    // truths computed with exact Fraction arithmetic over the full
    // hypergeometric support (R fisher.test agrees to print precision)
    val fixtures = Seq(
      ((3L, 1L, 1L, 3L), 0.4857142857142857),
      ((1L, 9L, 11L, 3L), 0.0027594561852200836),
      ((10L, 20L, 30L, 5L), 2.5950857028014678e-05),
      ((0L, 5L, 8L, 2L), 0.006993006993006993),
      ((2L, 0L, 0L, 3L), 0.1),
      ((12L, 5L, 29L, 2L), 0.08026855207410465),
      ((100L, 50L, 30L, 80L), 4.487226130108583e-10))
    for (((a, b, c, d), want) <- fixtures) {
      val got = fisherExactP(a, b, c, d)
      assert(math.abs(got - want) <= 1e-9 * want + 1e-12,
        s"($a,$b,$c,$d): got $got want $want")
    }
    // degenerate margins: the observed table is the only table
    assert(fisherExactP(0L, 0L, 3L, 4L) == 1.0)
    assert(fisherExactP(5L, 3L, 0L, 0L) == 1.0)
  }

  test("fisherExact operator assembles the 2x2 and rides codegen") {
    val df = Seq(("p1", true, true), ("p1", true, true), ("p1", true, true),
        ("p1", true, false), ("p1", false, true),
        ("p1", false, false), ("p1", false, false), ("p1", false, false))
      .toDF("param", "fa", "fb")
    val r = Stats.fisherExact(df, Seq("param"), col("fa"), col("fb"))
      .select("n11", "n10", "n01", "n00", "odds_ratio", "p_value")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert((r._1, r._2, r._3, r._4) == ((3L, 1L, 1L, 3L)))
    assert(math.abs(r._5 - 9.0) < 1e-12)
    assert(math.abs(r._6 - 0.4857142857142857) < 1e-9)
  }

  test("robustProfile: exact nearest-rank percentiles and Tukey counts vs a naive reference") {
    // dim 0: values quantize (scale = 100/127... actually gmax = 100 →
    // scale = 100/127) — check against a naive quantize+sort reference
    val vecs = Seq(
      Array(10f, -5f), Array(20f, -5f), Array(30f, 0f), Array(40f, 5f),
      Array(50f, 5f), Array(60f, 0f), Array(70f, -5f), Array(100f, 0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val got = graft.operators.Stats.robustProfile(df, "embedding")
      .orderBy("dim")
      .select("dim", "n", "p25", "median", "p75", "iqr", "n_outliers")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val gscale = 100.0 / 127.0
    def naive(dimVals: Seq[Float]): (Long, Long, Long, Long) = {
      val qs = dimVals.map(x => math.floor(x / gscale + 0.5).toLong).sorted
      def nr(p: Double) = qs(math.ceil(p * qs.size).toInt - 1)
      val (a, m, b) = (nr(0.25), nr(0.50), nr(0.75))
      val iqr = b - a
      val out = qs.count(q => q * 2 < a * 2 - iqr * 3 || q * 2 > b * 2 + iqr * 3)
      (a, m, b, out.toLong)
    }
    for (d <- 0 to 1) {
      val (a, m, b, out) = naive(vecs.map(_(d)))
      val r = got(d)
      assert(r._2 == 8L)
      assert((r._3, r._4, r._5) == ((a, m, b)), s"dim $d percentiles")
      assert(r._6 == b - a && r._7 == out, s"dim $d iqr/outliers")
    }
  }

  test("corrPairs: perfect/anti/zero correlation and constant-dim null, vs naive Pearson") {
    // dim0 = t, dim1 = 2t (r=1), dim2 = -t (r=-1), dim3 = constant
    // (null), dim4 = symmetric pattern uncorrelated with t (r=0)
    val ts = Seq(-2f, -1f, 0f, 1f, 2f)
    val sym = Seq(1f, -1f, 0f, -1f, 1f) // orthogonal to t
    val df = ts.zip(sym).zipWithIndex.map { case ((t, s), i) =>
      (i.toLong, Array(t, 2 * t, -t, 3f, s))
    }.toDF("vec_id", "embedding")
    val got = graft.operators.Stats.corrPairs(df, "embedding", dims = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.size == 10)
    assert(got((0L, 1L)).get == 1.0)
    assert(got((0L, 2L)).get == -1.0)
    assert(got((0L, 3L)).isEmpty, "constant dim must be null")
    assert(got((0L, 4L)).get == 0.0)
    // a non-trivial pair against naive Pearson: dims 2 and 4
    def pearson(a: Seq[Float], b: Seq[Float]): Double = {
      val n = a.size
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum, b.map(y => (y - mb) * (y - mb)).sum)
      cov / math.sqrt(va * vb)
    }
    val want = math.rint(pearson(ts.map(-_), sym) * 1e6) / 1e6
    assert(math.abs(got((2L, 4L)).get - want) < 1e-9)
  }

  test("corrPairs excludes short vectors and bounds dims") {
    val df = Seq((1L, Array(1f, 2f, 3f)), (2L, Array(4f, 5f, 6f)),
      (3L, Array(7f, 8f))).toDF("vec_id", "embedding")
    val r = graft.operators.Stats.corrPairs(df, "embedding", dims = 3)
    assert(r.select("n").as[Long].head() == 2L, "short vector excluded")
    intercept[IllegalArgumentException] {
      graft.operators.Stats.corrPairs(df, "embedding", dims = 17)
    }
  }

  test("robustProfile: all-zero corpus degrades to scale 1, zero iqr, zero outliers") {
    val df = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f))).toDF("vec_id", "embedding")
    val r = graft.operators.Stats.robustProfile(df, "embedding")
      .select("p25", "median", "p75", "iqr", "n_outliers")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.forall(_ == ((0L, 0L, 0L, 0L, 0L))))
  }

  test("bhAdjust reproduces the hand-worked step-up, caps at 1, tie-invariant") {
    // classic fixture: sorted p (.005,.01,.03,.04), m=4 →
    // raw (.02,.02,.04,.04); running min keeps (.02,.02,.04,.04)
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005))
      .toDF("test_id", "p")
    val got = Stats.bhAdjust(df, "p")
      .select("test_id", "p_adjusted").as[(String, Double)].collect().toMap
    assert(math.abs(got("d") - 0.02) < 1e-12)
    assert(math.abs(got("a") - 0.02) < 1e-12)
    assert(math.abs(got("c") - 0.04) < 1e-12)
    assert(math.abs(got("b") - 0.04) < 1e-12)
    // a flat tail adjusts to exactly its own p (the rank-m raw value
    // is p·m/m = p, and the suffix min includes it — which is also
    // why the least(1,·) cap can only ever bind on score inputs > 1)
    val flat = Seq.tabulate(5)(i => (s"t$i", 0.9)).toDF("test_id", "p")
    val capped = Stats.bhAdjust(flat, "p")
      .select("p_adjusted").as[Double].collect()
    assert(capped.forall(v => math.abs(v - 0.9) < 1e-12))
    // ties: every tied p receives the identical adjusted value no
    // matter which row_number order the sort happened to pick
    val tied = Seq(("x", 0.02), ("y", 0.02), ("z", 0.5)).toDF("test_id", "p")
    val t = Stats.bhAdjust(tied, "p")
      .select("test_id", "p_adjusted").as[(String, Double)].collect().toMap
    assert(t("x") == t("y"))
    assert(math.abs(t("x") - 0.03) < 1e-12)
  }
}

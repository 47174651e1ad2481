package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Special-function math for p-values, as deterministic double
  * algorithms the significance layer can call from codegen'd
  * expressions. The algorithms are the classical public formulations:
  * Lanczos ln-gamma, the series/continued-fraction split for the
  * regularized incomplete gamma, and the Lentz continued fraction for
  * the regularized incomplete beta (Abramowitz & Stegun §6.5/§26.5;
  * the same functions every stats library exposes). All iteration
  * counts and epsilons are fixed constants → bit-deterministic across
  * partitions, retries, and engines running the same IEEE doubles.
  *
  * These back the DOCUMENTED-APPROXIMATION p-value columns next to
  * the exact statistics in [[graft.operators.Stats]] — the exact
  * t/χ²/df columns stay the oracle-checked surface (DuckDB has no
  * incomplete gamma/beta to compare against), while the p-values are
  * spec-checked against published quantile fixtures.
  */
object StatMath {
  private val MaxIter = 300
  private val Eps = 3e-14
  private val Tiny = 1e-300

  /** Lanczos approximation (g=7, 9 coefficients), |err| < 1e-13. */
  def lnGamma(x: Double): Double = {
    if (x < 0.5) {
      // reflection for the left half-plane
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = 0.99999999999980993
      val c = StatMath.lanczos
      var i = 0
      while (i < c.length) { a += c(i) / (z + i + 1); i += 1 }
      val t = z + 7.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }
  private val lanczos = Array(
    676.5203681218851, -1259.1392167224028, 771.32342877765313,
    -176.61502916214059, 12.507343278686905, -0.13857109526572012,
    9.9843695780195716e-6, 1.5056327351493116e-7)

  /** Regularized lower incomplete gamma P(a,x) by its power series
    * (converges fast for x < a+1). */
  private def gammaPSeries(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < MaxIter && math.abs(del) >= math.abs(sum) * Eps) {
      ap += 1.0; del *= x / ap; sum += del; i += 1
    }
    sum * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  /** Regularized upper incomplete gamma Q(a,x) by modified Lentz
    * continued fraction (converges fast for x >= a+1). */
  private def gammaQCf(a: Double, x: Double): Double = {
    var b = x + 1.0 - a
    var c = 1.0 / Tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    var done = false
    while (i <= MaxIter && !done) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < Tiny) d = Tiny
      c = b + an / c; if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      i += 1
    }
    math.exp(-x + a * math.log(x) - lnGamma(a)) * h
  }

  /** Upper-tail regularized incomplete gamma Q(a,x). */
  def gammaQ(a: Double, x: Double): Double =
    if (x < 0.0 || a <= 0.0) Double.NaN
    else if (x == 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gammaPSeries(a, x)
    else gammaQCf(a, x)

  /** χ² upper-tail p-value: P[X ≥ chi2] for X ~ χ²(k). */
  def chi2PValue(chi2: Double, k: Double): Double =
    if (k < 1.0 || chi2.isNaN) Double.NaN
    else if (chi2 <= 0.0) 1.0
    else gammaQ(k / 2.0, chi2 / 2.0)

  /** Lentz continued fraction for the incomplete beta (the `betacf`
    * companion of I_x(a,b)). */
  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < Tiny) d = Tiny
    d = 1.0 / d
    var h = d
    var m = 1
    var done = false
    while (m <= MaxIter && !done) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < Tiny) d = Tiny
      c = 1.0 + aa / c; if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < Tiny) d = Tiny
      c = 1.0 + aa / c; if (math.abs(c) < Tiny) c = Tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < Eps) done = true
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a,b). */
  def incBeta(x: Double, a: Double, b: Double): Double = {
    if (x.isNaN || x < 0.0 || x > 1.0 || a <= 0.0 || b <= 0.0) Double.NaN
    else if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val front = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b)
        + a * math.log(x) + b * math.log(1.0 - x))
      // symmetry split keeps the continued fraction in its fast region
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
      else 1.0 - front * betaCf(b, a, 1.0 - x) / b
    }
  }

  /** Two-sided p-value for Student's t with `df` degrees of freedom:
    * P[|T| ≥ t] = I_{df/(df+t²)}(df/2, 1/2). Welch's test plugs in
    * the Welch–Satterthwaite df (fractional df is exactly what the
    * incomplete beta supports). */
  def tPValueTwoSided(t: Double, df: Double): Double =
    if (t.isNaN || df <= 0.0) Double.NaN
    else incBeta(df / (df + t * t), df / 2.0, 0.5)

  /** Two-sided standard-normal p-value P[|Z| ≥ z] = erfc(|z|/√2),
    * computed as the χ²(1) upper tail of z² (the same identity every
    * stats text uses; reuses the deterministic incomplete gamma). */
  def normalPTwoSided(z: Double): Double =
    if (z.isNaN) Double.NaN else chi2PValue(z * z, 1.0)

  /** ln C(n, k) via ln-gamma (exact enough for hypergeometric sums;
    * |err| ~ 1e-12 relative for the count magnitudes a 2×2 table of
    * row counts can hold). */
  private def lnChoose(n: Long, k: Long): Double =
    lnGamma(n + 1.0) - lnGamma(k + 1.0) - lnGamma(n - k + 1.0)

  /** Two-sided Fisher exact p for the 2×2 table [[a,b],[c,d]]:
    * the sum of every hypergeometric table probability no larger than
    * the observed one (R's `fisher.test` convention, including its
    * 1+1e-7 relative slack so ties caused by float rounding count as
    * "as extreme"). The support is at most min(r1,c1)+1 terms — a
    * bounded driver-free loop inside codegen, deterministic across
    * partitions/retries. Degenerate margins (an empty row or column)
    * mean the observed table is the only table: p = 1. */
  def fisherExactP(a: Long, b: Long, c: Long, d: Long): Double = {
    if (a < 0 || b < 0 || c < 0 || d < 0) return Double.NaN
    val r1 = a + b; val r2 = c + d; val c1 = a + c; val n = r1 + r2
    if (r1 == 0 || r2 == 0 || c1 == 0 || n - c1 == 0) return 1.0
    val lnDenom = lnChoose(n, c1)
    def lnPmf(k: Long): Double =
      lnChoose(r1, k) + lnChoose(r2, c1 - k) - lnDenom
    val lo = math.max(0L, c1 - r2)
    val hi = math.min(c1, r1)
    val lnPObs = lnPmf(a)
    // compare in log space: ln p(k) ≤ ln p(obs) + ln(1+1e-7)
    val thresh = lnPObs + 1e-7
    var k = lo
    var p = 0.0
    while (k <= hi) {
      val lp = lnPmf(k)
      if (lp <= thresh) p += math.exp(lp)
      k += 1
    }
    if (p > 1.0) 1.0 else p
  }
}

/** Two-sided Student/Welch t p-value expression: (t_stat, df) →
  * p-value. Codegen'd via a static call like [[MinHashSig]]; null if
  * either input is null. */
case class TPValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"TPValue requires (double, double), got $t")
    }

  override def nullSafeEval(t: Any, df: Any): Any =
    StatMath.tPValueTwoSided(t.asInstanceOf[Double], df.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, df) =>
      s"${ev.value} = graft.functions.StatMath.tPValueTwoSided($t, $df);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** χ² upper-tail p-value expression: (chi2, dof) → p-value.
  * Codegen'd; null if either input is null. */
case class Chi2PValue(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"Chi2PValue requires (double, double), got $t")
    }

  override def nullSafeEval(x: Any, k: Any): Any =
    StatMath.chi2PValue(x.asInstanceOf[Double], k.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, k) =>
      s"${ev.value} = graft.functions.StatMath.chi2PValue($x, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Two-sided standard-normal p-value expression: z → P[|Z| ≥ z].
  * Backs the rank-sum test's normal approximation. Codegen'd; null in,
  * null out. */
case class NormalPValue(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"NormalPValue requires double, got $t")
    }

  override def nullSafeEval(z: Any): Any =
    StatMath.normalPTwoSided(z.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, z =>
      s"${ev.value} = graft.functions.StatMath.normalPTwoSided($z);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fisher exact two-sided p-value expression over the 2×2 cell counts
  * (n11, n10, n01, n00). Codegen'd — the hypergeometric sum runs as a
  * bounded loop inside the generated code, no UDF boundary. Null if
  * any count is null. */
case class FisherPValue(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    Seq(first, second, third, fourth).map(_.dataType) match {
      case ts if ts.forall(_ == LongType) => TypeCheckResult.TypeCheckSuccess
      case ts => TypeCheckResult.TypeCheckFailure(s"FisherPValue requires 4 bigint counts, got $ts")
    }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    StatMath.fisherExactP(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], d.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.StatMath.fisherExactP($a, $b, $c, $d);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

object StatFunctions {
  def tPValue(t: Column, df: Column): Column =
    GraftBridge.column(TPValue(
      GraftBridge.expression(t.cast("double")), GraftBridge.expression(df.cast("double"))))

  def chi2PValue(x: Column, k: Column): Column =
    GraftBridge.column(Chi2PValue(
      GraftBridge.expression(x.cast("double")), GraftBridge.expression(k.cast("double"))))

  def normalPValue(z: Column): Column =
    GraftBridge.column(NormalPValue(GraftBridge.expression(z.cast("double"))))

  def fisherPValue(n11: Column, n10: Column, n01: Column, n00: Column): Column =
    GraftBridge.column(FisherPValue(
      GraftBridge.expression(n11.cast("long")), GraftBridge.expression(n10.cast("long")),
      GraftBridge.expression(n01.cast("long")), GraftBridge.expression(n00.cast("long"))))
}

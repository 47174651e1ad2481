package graft.plans

import graft.functions.{FloatVecDot, LongVecDot}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Catalyst optimizer rule: rewrite the higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, (acc, v) => acc + v) }}}
  * over `array<float>` columns into the native codegen'd
  * [[FloatVecDot]] — the declarative (oracle-parity, ANSI-expressible)
  * form stays in user code, the optimizer swaps in the primitive-loop
  * implementation (no per-element lambda frames, JIT-vectorizable).
  *
  * Semantics note: both forms fold pairwise products left-to-right
  * into a 0.0 accumulator, so results are bit-identical for
  * equal-length vectors; null ELEMENTS yield null in both (FloatVecDot
  * null-checks elements precisely so this substitution is safe). For
  * RAGGED pairs the HOF form yields null (zip_with pads with null)
  * while the native form dots the common prefix — a dot product of
  * unequal dims is undefined, and the rule takes the pragmatic
  * reading. Registered via GraftExtensions (injectOptimizerRule).
  */
case class VecDotRewrite(session: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  /** (x, y) => x * y over long vars, no casts — the exact-integer
    * product of a cents/quantized fold. Returns the arithmetic eval
    * mode (None = shape mismatch); TRY mode (null-on-overflow) has no
    * native equivalent and is deliberately not matched. */
  private def plainProductMode(f: Expression): Option[EvalMode.Value] = f match {
    case LambdaFunction(m: Multiply,
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)
        if isVar(m.left, x) && isVar(m.right, y) && m.evalMode != EvalMode.TRY =>
      Some(m.evalMode)
    case _ => None
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _                      => false
  }

  /** (x, y) => cast(x as double) * cast(y as double), vars in order. */
  private def isCastProduct(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply,
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (m.left, m.right) match {
        case (cl: Cast, cr: Cast) =>
          cl.dataType == DoubleType && cr.dataType == DoubleType &&
            isVar(cl.child, x) && isVar(cr.child, y)
        case _ => false
      }
    case _ => false
  }

  /** (acc, v) => acc + v. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add,
        Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      isVar(a.left, acc) && isVar(a.right, v)
    case _ => false
  }

  /** acc => acc (the default finish lambda of a 3-arg aggregate). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(out: NamedLambdaVariable, Seq(in: NamedLambdaVariable), _) =>
      out.exprId == in.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, prod), Literal(0.0, DoubleType), merge, finish)
        if isFloatArray(l) && isFloatArray(r) &&
          isCastProduct(prod) && isSumMerge(merge) && isIdentityFinish(finish) =>
      FloatVecDot(l, r)
    // exact-integer flavor: aggregate(zip_with(a, b, (x,y) => x*y), 0L, +)
    // over array<bigint>. The matched Multiply's eval mode carries into
    // the native expression: ANSI folds throw on overflow, legacy folds
    // wrap — either way the substitution is semantics-preserving.
    case ArrayAggregate(ZipWith(l, r, prod), Literal(0L, LongType), merge, finish)
        if isLongArray(l) && isLongArray(r) &&
          plainProductMode(prod).isDefined && isSumMerge(merge) && isIdentityFinish(finish) =>
      LongVecDot(l, r, failOnOverflow = plainProductMode(prod).contains(EvalMode.ANSI))
  }
}

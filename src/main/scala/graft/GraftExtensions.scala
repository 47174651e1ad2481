package graft

import graft.functions.{FloatVecDot, MinHashSig, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("... vec_dot(a, b) ...")`
  * works cluster-wide.
  *
  * Usage:
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Constant-int SQL argument: accepts any non-null foldable exact
    * integral; rejects NULL, strings, and fractional values with the
    * function's own error instead of an analyzer-deep NPE/CCE. */
  private def constInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other if other.foldable =>
      other.eval() match {
        case null => throw new IllegalArgumentException(s"$fn: $arg must not be NULL")
        case n: java.lang.Integer => n.intValue()
        case n: java.lang.Long if n.longValue().isValidInt => n.intValue()
        case n: java.lang.Short => n.intValue()
        case n: java.lang.Byte => n.intValue()
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be a constant integer, got $other")
      }
    case _ => throw new IllegalArgumentException(
      s"$fn: $arg must be a constant integer, not a column")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: HOF dot-product pattern → native FloatVecDot
    // (plans/VecDotRewrite.scala)
    ext.injectOptimizerRule(graft.plans.VecDotRewrite)

    // planner strategy: AsOfJoinPlan logical node → AsOfJoinExec
    // physical backward as-of join (plans/AsOfJoin.scala)
    ext.injectPlannerStrategy(graft.plans.AsOfJoinStrategy)

    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))

    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new IllegalArgumentException(
          s"minhash_sig requires exactly 2 arguments (array<string>, numHashes), got ${children.size}")
        MinHashSig(children.head, constInt(children(1), "minhash_sig", "numHashes"))
      }))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))

    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGries].getName, "misra_gries"),
      (children: Seq[Expression]) => {
        if (children.size != 2) throw new IllegalArgumentException(
          s"misra_gries requires exactly 2 arguments (string col, k), got ${children.size}")
        graft.functions.MisraGries(children.head,
          constInt(children(1), "misra_gries", "k")).toAggregateExpression()
      }))
  }
}

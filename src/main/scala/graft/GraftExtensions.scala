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
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other if other.foldable => other.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "minhash_sig: numHashes must be a constant integer, not a column")
        }
        MinHashSig(children.head, n)
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
        val k = children(1) match {
          case Literal(v: Int, _) => v
          case other if other.foldable => other.eval().asInstanceOf[Number].intValue()
          case _ => throw new IllegalArgumentException(
            "misra_gries: k must be a constant integer, not a column")
        }
        graft.functions.MisraGries(children.head, k).toAggregateExpression()
      }))
  }
}

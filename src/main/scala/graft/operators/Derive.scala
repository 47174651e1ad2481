package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Runtime formula derivation.
  *
  * Reference provenance: jobs/transform/experiment_parameter_derivator.py
  * — the reference evaluates IMPReSS-supplied derivation formulas
  * (strings like `div('P1', 'P2')`) against parameter columns at
  * runtime via an external derivator. Re-expressed Spark-first: the
  * formula is Spark SQL, parsed by Catalyst into the SAME codegen'd
  * plan as hand-written columns — no interpreter in the row loop.
  */
object Derive {

  /** Add derived columns from (name → SQL formula) pairs; formulas may
    * reference input columns and earlier derived columns (applied in
    * order). */
  def applyFormulas(df: DataFrame, formulas: Seq[(String, String)]): DataFrame =
    formulas.foldLeft(df) { case (acc, (name, formula)) =>
      acc.withColumn(name, expr(formula))
    }
}

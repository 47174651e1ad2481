package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality constraint report.
  *
  * The reference enforces quality imperatively — drop-if-null required
  * columns (experiment_cleaner.py:333), skip-lists, vocabulary
  * constraints — each as its own pass. At 100 TB a quality gate must
  * instead measure EVERYTHING in one scan: all row-level constraints
  * fold into one aggregation (conditional sums + one distinct count
  * for the uniqueness check), then pivot to a per-constraint report
  * row. Enforcement stays separate (filter on the same predicates);
  * this operator is the audit.
  */
object DataQuality {

  /** A named row-level constraint: `holds` must be true for a clean row.
    * NULL evaluates as a violation (SQL three-valued logic would
    * otherwise let nulls sneak through a range check). */
  case class Constraint(name: String, holds: Column)

  /** One report row per constraint (+ one `unique(...)` row when
    * `uniqueKey` is set): name, n_rows, n_violations, pass. Exactly
    * one scan of `df`. */
  def report(df: DataFrame, constraints: Seq[Constraint],
             uniqueKey: Seq[String] = Nil): DataFrame = {
    require(constraints.nonEmpty || uniqueKey.nonEmpty, "nothing to check")
    val violAggs = constraints.map { c =>
      sum(when(coalesce(c.holds, lit(false)), 0L).otherwise(1L)).as(s"__v_${c.name}")
    }
    val uniqueAggs = if (uniqueKey.nonEmpty)
      Seq(countDistinct(struct(uniqueKey.map(col): _*)).as("__distinct")) else Nil
    val agg = df.agg(count(lit(1)).as("__n"), violAggs ++ uniqueAggs: _*)
    val rows = constraints.map { c =>
      struct(lit(c.name).as("constraint"), col("__n").as("n_rows"),
        col(s"__v_${c.name}").as("n_violations"))
    } ++ (if (uniqueKey.nonEmpty)
      Seq(struct(lit(s"unique(${uniqueKey.mkString(",")})").as("constraint"),
        col("__n").as("n_rows"),
        (col("__n") - col("__distinct")).as("n_violations")))
    else Nil)
    agg.select(explode(array(rows: _*)).as("r"))
      .select(col("r.constraint"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }
}

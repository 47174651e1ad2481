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
    // positional internal names: constraint DISPLAY names may contain
    // dots/backticks (which would break column re-resolution) or
    // duplicates (ambiguous refs); coalesce keeps an EMPTY input
    // reporting 0 violations / pass=true instead of NULLs invisible
    // to pass/fail filters
    val violAggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(sum(when(coalesce(c.holds, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$i")
    }
    val uniqueAggs = if (uniqueKey.nonEmpty)
      Seq(countDistinct(struct(uniqueKey.map(col): _*)).as("__distinct")) else Nil
    val agg = df.agg(count(lit(1)).as("__n"), violAggs ++ uniqueAggs: _*)
    val rows = constraints.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), col("__n").as("n_rows"),
        col(s"__v_$i").as("n_violations"))
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

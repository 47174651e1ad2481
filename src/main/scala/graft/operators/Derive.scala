package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

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

  /** Spec-TABLE-driven standardization: the column mapping arrives as
    * DATA, not code — the reference drives large parts of its
    * transforms from constant spec tables (config/constants.py:1-952,
    * consumed by e.g. jobs/load/solr/stats_results_mapping_helper.py):
    * renames, type coercions, and vocabulary maps maintained as rows.
    *
    * `spec` rows: (src_col, dst_col, cast_to) — project src as dst,
    * casting when cast_to is non-null. `vocab` rows:
    * (dst_col, from_value, to_value) — the named output column's
    * values mapped through the vocabulary, unmapped values passing
    * through. Vocab application happens AFTER the cast.
    *
    * Scale: spec tables are config-sized by definition — both are
    * collected once on the driver and compiled into ONE narrow
    * codegen'd projection (literal map lookup per vocab'd column);
    * zero shuffle, zero UDF, and Catalyst sees plain column
    * references, so pushdown/pruning through the mapping still works.
    * For vocabularies too large to inline (>~10^4 entries), use a
    * broadcast join instead. */
  def applyMappingSpec(df: DataFrame, spec: DataFrame,
                       vocab: Option[DataFrame] = None): DataFrame = {
    val rules: Seq[(String, String, Option[String])] =
      spec.select(col("src_col").cast("string"), col("dst_col").cast("string"),
          col("cast_to").cast("string"))
        .collect().toSeq
        .map((r: Row) => (r.getString(0), r.getString(1), Option(r.getString(2))))
    val vocabByCol: Map[String, Seq[(String, String)]] = vocab match {
      case None => Map.empty
      case Some(v) =>
        v.select(col("dst_col").cast("string"), col("from_value").cast("string"),
            col("to_value").cast("string"))
          .collect().toSeq
          .map((r: Row) => (r.getString(0), (r.getString(1), r.getString(2))))
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    }
    val projection = rules.map { case (src, dst, castTo) =>
      val base = castTo.fold(col(src))(t => col(src).cast(t))
      val mapped = vocabByCol.get(dst) match {
        case None => base
        case Some(entries) =>
          // literal map lookup (one codegen'd expression), unmapped
          // values pass through — same posture as Cleaning.mapValues.
          // The lookup works in string space, but the result is cast
          // BACK to the spec's declared dtype so a vocab entry never
          // silently demotes a cast_to column to string
          val m = map(entries.flatMap { case (f, t) => Seq(lit(f), lit(t)) }: _*)
          val looked = coalesce(element_at(m, base.cast("string")), base.cast("string"))
          castTo.fold(looked)(t => looked.cast(t))
      }
      mapped.as(dst)
    }
    df.select(projection: _*)
  }
}

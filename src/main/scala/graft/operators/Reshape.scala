package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reshaping operators: unpivot (wide→long), pivot (long→wide),
  * recursive struct flattening, grouped distinct-collect.
  *
  * Reference provenance: jobs/load/observation_mapper.py (explodes
  * nested parameter arrays into the long observations table),
  * jobs/load/solr/stats_results_mapper.py (pivots + collect_set),
  * shared/utils.py:49 (flatten_struct).
  */
object Reshape {

  /** Wide→long unpivot of `valueCols` keeping `idCols`, producing
    * (idCols..., `keyName`, `valueName`). Narrow op — no shuffle:
    * each input row yields |valueCols| output rows via a single
    * generate (stack).
    *
    * @param castTo unify mixed-typed measures by casting each to this
    *   type; None leaves values as-is (the columns must then share a
    *   type, e.g. categorical string parameters — forcing a double
    *   cast there would throw under ANSI mode). */
  def unpivot(idCols: Seq[String], valueCols: Seq[String],
              keyName: String = "key", valueName: String = "value",
              castTo: Option[String] = Some("double"))
             (df: DataFrame): DataFrame = {
    val stackArgs = valueCols.map { c =>
      val v = castTo.map(t => s"cast(`$c` as $t)").getOrElse(s"`$c`")
      s"'$c', $v"
    }.mkString(", ")
    df.selectExpr(
      (idCols :+ s"stack(${valueCols.size}, $stackArgs) as (`$keyName`, `$valueName`)"): _*)
  }

  /** Long→wide pivot with explicit pivot values (explicit values avoid
    * the extra distinct-collection job AND make the output schema
    * stable — both matter at scale). */
  def pivot(groupCols: Seq[String], pivotCol: String, pivotValues: Seq[String],
            agg: Column)(df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*).pivot(pivotCol, pivotValues).agg(agg)

  /** Recursively flatten nested structs to top-level columns, as the
    * reference's flatten_struct (shared/utils.py:49) but preserving
    * the full dotted path in the name to avoid collisions. */
  def flattenStruct(df: DataFrame, sep: String = "_"): DataFrame = {
    def cols(schema: StructType, prefix: String, path: String): Seq[Column] =
      schema.fields.toSeq.flatMap { f =>
        val p = if (path.isEmpty) f.name else s"$path.${f.name}"
        val n = if (prefix.isEmpty) f.name else s"$prefix$sep${f.name}"
        f.dataType match {
          case s: StructType => cols(s, n, p)
          case _             => Seq(col(p).as(n))
        }
      }
    df.select(cols(df.schema, "", ""): _*)
  }

  /** Grouped distinct-collect to a deterministically sorted array
    * (the reference leans on collect_set heavily; sets are unordered,
    * so sort for reproducibility). */
  def collectSortedSet(groupCols: Seq[String], valueCol: String, outCol: String)
                      (df: DataFrame): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_set(col(valueCol))).as(outCol))
}

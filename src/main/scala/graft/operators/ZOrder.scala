package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of several
  * quantized dimensions into one sort key so that sorting by it keeps
  * EVERY dimension locally clustered at once — the multi-dimensional
  * data-layout trick behind parquet row-group / file skipping on more
  * than one predicate column (Delta/Iceberg OPTIMIZE ZORDER do the
  * same thing; the math is public Morton-code folklore).
  *
  * Why it matters at 100 TB: min/max pruning only skips files whose
  * stat ranges are tight. A single-column sort gives tight ranges on
  * that column and useless full-span ranges on every other; Z-order
  * bounds the per-file span of ALL interleaved dimensions to the
  * bucket's bounding box (≤ 2^(bits−k) per dim after 2^(d·k)
  * buckets), so predicates on any of them prune.
  *
  * The z-value is a pure bit-shuffle expression tree (shift/and/or —
  * whole-stage-codegen'd, exactly replicable in any engine's integer
  * SQL, hence oracle-checkable), and the layout op itself is ONE
  * range-partition exchange + partition-local sort: exactly the
  * shuffle a layout rewrite must pay, nothing more.
  */
object ZOrder {

  /** Morton z-value of already-quantized dimension columns: each dim
    * contributes its low `bits` bits, interleaved round-robin (dim j's
    * bit i lands at position i·d + j). Callers quantize first (e.g.
    * `% 256`, a width_bucket, or a clamped histogram bin); values are
    * masked into range so out-of-range inputs cannot collide across
    * dims. d·bits must fit a signed long. */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(bits >= 1 && dims.size * bits <= 63,
      s"d*bits = ${dims.size * bits} must be <= 63")
    val d = dims.size
    val terms =
      for { (c, j) <- dims.zipWithIndex; i <- 0 until bits }
        yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
          i * d + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The layout op: range-partition by z-value and sort within
    * partitions, so downstream file writes carry tight min/max stats
    * on every interleaved dimension. Adds nothing but the one
    * exchange a clustering rewrite requires. The z column is kept
    * (callers usually also bucket on it); drop it after write if
    * unwanted. */
  def cluster(df: DataFrame, dims: Seq[Column], bits: Int,
              numPartitions: Int, zCol: String = "z_value"): DataFrame =
    df.withColumn(zCol, zValue(dims, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
}

package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order invariants: bit-exact Morton encoding vs a naive reference,
  * and the layout property the operator exists for — every partition's
  * bounding box is tight in ALL interleaved dims, where a plain sort
  * leaves the second dim spanning its full range.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveMorton(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- vals.indices; i <- 0 until bits)
      z |= (((vals(j) >> i) & 1L) << (i * vals.size + j))
    z
  }

  test("zValue is bit-exact against a naive Morton reference, 2 and 3 dims") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 7L), (255L, 255L, 255L),
      (170L, 85L, 129L), (3L, 200L, 54L), (999L, 1000L, 1001L))
    val df = rows.toDF("x", "y", "w")
    val got2 = df.select(ZOrder.zValue(Seq(col("x"), col("y")), 8)).as[Long].collect()
    val got3 = df.select(ZOrder.zValue(Seq(col("x"), col("y"), col("w")), 8)).as[Long].collect()
    rows.zipWithIndex.foreach { case ((x, y, w), k) =>
      // reference masks the same low 8 bits the expression keeps
      assert(got2(k) == naiveMorton(Seq(x & 255, y & 255), 8), s"2d @$k")
      assert(got3(k) == naiveMorton(Seq(x & 255, y & 255, w & 255), 8), s"3d @$k")
    }
    // interleave round-trip sanity: x=all-ones, y=0 → even bit positions
    assert(naiveMorton(Seq(255L, 0L), 8) == 0x5555L)
  }

  test("cluster yields tight per-partition bounding boxes in BOTH dims; plain sort does not") {
    // uniform 64x64 grid, 4096 points
    val df = spark.range(0, 4096)
      .select((col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    def spans(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      d.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
        .select("xs", "ys").as[(Long, Long)].collect().toSeq
    val zed = spans(ZOrder.cluster(df, Seq(col("x"), col("y")), bits = 6,
      numPartitions = 16))
    // 4096 points into 16 z-partitions → each is a 16x16-ish box: both
    // dims bounded far below the 63 full span
    assert(zed.nonEmpty)
    zed.foreach { case (xs, ys) =>
      assert(xs <= 31 && ys <= 31, s"loose box ($xs, $ys)")
    }
    // plain sort on x: x is tight but y spans the whole range
    val plain = spans(df.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    assert(plain.exists { case (_, ys) => ys >= 63 })
  }

  test("zValue rejects overflowing configurations") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("a"), col("b")), 32)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq.empty, 8)
    }
  }
}

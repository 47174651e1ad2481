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

  test("z-clustered parquet SKIPS row groups on a second-dim predicate; x-sorted parquet cannot") {
    // The payoff measurement (not just the bounding-box proxy): write
    // both layouts as real parquet — one file per partition, one row
    // group per file at this size, so row-group pruning == file
    // skipping — then scan with a predicate on the NON-sort dim and
    // read the scan's own metrics. Stats-based pruning is driven by
    // each row group's min/max: tight y-boxes (z-order) let the reader
    // skip; full-span y (x-sort) forces it to read everything.
    val n = 1 << 16 // 256x256 grid, 16 files of 4096 rows
    val grid = spark.range(0, n)
      .select((col("id") / 256).cast("long").as("x"), (col("id") % 256).as("y"),
        col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("graft_zorder_skip")
    base.toFile.deleteOnExit()
    val zDir = s"$base/zed"
    val sDir = s"$base/sorted"
    ZOrder.cluster(grid, Seq(col("x"), col("y")), bits = 8, numPartitions = 16)
      .drop("z_value").write.mode("overwrite").parquet(zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    // rows the READER delivered = rows of the row groups it could not
    // prune (scan numOutputRows, before the post-scan Filter)
    def scanRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir)
        .filter(col("y") >= 16 && col("y") < 32) // second-dim predicate, 1/16 of rows
        .agg(count(lit(1)))
      q.collect()
      import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      var out = -1L; var files = -1L
      def walk(p: SparkPlan): Unit = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: QueryStageExec        => walk(s.plan)
        case f: FileSourceScanExec =>
          out = f.metrics("numOutputRows").value
          files = f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
        case other => other.children.foreach(walk)
      }
      walk(q.queryExecution.executedPlan)
      assert(out >= 0, s"no FileSourceScan found for $dir")
      (out, files)
    }
    val (zRows, _) = scanRows(zDir)
    val (sRows, _) = scanRows(sDir)
    // x-sorted: every file spans y=0..255 → nothing prunable, the scan
    // reads the full corpus. z-ordered: only files whose y-box meets
    // [16,32) survive — at 16 z-files (4x4 boxes of 64) that's the 4
    // files of one y-band = 1/4 of the corpus, far under full.
    assert(sRows == n.toLong, s"x-sorted scan should read everything, read $sRows")
    assert(zRows <= n / 2, s"z-ordered scan should skip most row groups, read $zRows")
    assert(zRows < sRows)
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

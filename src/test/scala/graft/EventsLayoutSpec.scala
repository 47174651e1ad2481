package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events table has shipped in multiple on-disk `ts` layouts across
  * testdata generations (TIMESTAMP(NANOS) read as long under the legacy
  * conf; TIMESTAMP(MICROS) read as TIMESTAMP_NTZ). Round 7 went red
  * because the reader hard-coded one layout; these specs pin the
  * schema-adaptive contract so the regression cannot recur silently.
  */
class EventsLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("normalizeEventTs: long-nanos, NTZ, and LTZ layouts all normalize to the same TimestampType values") {
    import spark.implicits._
    // 2024-03-01 12:00:00.123456 UTC in micros
    val us = 1709294400123456L
    val asLongNanos = Seq((1L, us * 1000L)).toDF("event_id", "ts")
    val asNtz = spark.sql(
      s"SELECT 1L AS event_id, cast(timestamp_micros(${us}L) AS timestamp_ntz) AS ts")
    val asLtz = spark.sql(s"SELECT 1L AS event_id, timestamp_micros(${us}L) AS ts")

    val outs = Seq(asLongNanos, asNtz, asLtz).map(graft.sources.Tables.normalizeEventTs(_))
    outs.foreach { df =>
      assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    }
    val values = outs.map(_.select(unix_micros(col("ts"))).head.getLong(0))
    assert(values.forall(_ == us), s"values drifted across layouts: $values")
  }

  test("normalizeEventTs rejects an unreadable ts dtype loudly") {
    import spark.implicits._
    val bad = Seq((1L, "2024-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](graft.sources.Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("events.ts"))
  }

  test("Tables.events end-to-end on BOTH parquet layouts gives identical query output") {
    // Layout A: ts stored as plain long (what nanos-as-long reading of a
    // TIMESTAMP(NANOS) file produces — Spark itself cannot write nanos
    // parquet, so the long column IS the read-side dtype under test).
    // Layout B: ts stored as TIMESTAMP_NTZ micros (the current
    // driver-generated testdata layout).
    val src = graft.sources.Tables(spark, SparkTestSession.sfDir).events
      .limit(500).cache()
    try {
      val dirA = tmp("events_long")
      src.withColumn("ts", expr("unix_micros(ts) * 1000"))
        .write.mode("overwrite").parquet(s"$dirA/events.parquet")
      val dirB = tmp("events_ntz")
      src.withColumn("ts", col("ts").cast("timestamp_ntz"))
        .write.mode("overwrite").parquet(s"$dirB/events.parquet")

      def agg(dir: String) = graft.sources.Tables(spark, dir).events
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(unix_micros(col("ts"))).as("ts_sum"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq

      val (a, b) = (agg(dirA), agg(dirB))
      assert(a.nonEmpty && a == b, s"layouts disagree:\nA=$a\nB=$b")
    } finally src.unpersist()
  }

  test("eventsSource streams the ScaleGen DIRECTORY layout with nonzero rows") {
    // r6 finding: the glob-at-sfDir source read ZERO files when
    // events.parquet is a directory of part files. Pin the fix.
    val dir = tmp("events_dirlayout")
    graft.sources.Tables(spark, SparkTestSession.sfDir).events
      .limit(300).repartition(3)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.streaming.EventStream.runBatchEquivalent(
      spark, dir, queryName = "graft_stream_dirlayout")
    assert(out.count() > 0, "directory-layout stream produced zero rows")
  }

  test("eventsSource streams the single-FILE layout (driver testdata) with nonzero rows") {
    val out = graft.streaming.EventStream.runBatchEquivalent(
      spark, SparkTestSession.sfDir, queryName = "graft_stream_filelayout")
    assert(out.count() > 0)
  }
}

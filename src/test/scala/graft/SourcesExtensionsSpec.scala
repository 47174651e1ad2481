package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("custom expressions are SQL-callable via GraftExtensions") {
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("v")
    assert(spark.sql("SELECT vec_dot(a, b) AS d FROM v").as[Double].head() == 11.0)
    val sig = spark.sql("SELECT minhash_sig(array('x','y'), 4) AS s")
      .as[Seq[Long]].head()
    assert(sig.length == 4)
    val sh = spark.sql("SELECT simhash64(array('a','b','c')) AS h").as[Long].head()
    assert(sh != 0L)
  }
}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("TSV reader with schema drops malformed rows") {
    val dir = Files.createTempDirectory("graft_tsv").toFile
    val f = new java.io.File(dir, "data.tsv")
    Files.writeString(f.toPath,
      "id\tname\tscore\n1\talpha\t2.5\n2\tbeta\tnot_a_number\n3\tgamma\t4.0\n")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val df = Tables.readTsv(spark, f.getAbsolutePath, schema)
    val rows = df.collect()
    assert(rows.length == 2) // malformed 'beta' row dropped
    assert(df.where(col("name") === "gamma").head().getDouble(2) == 4.0)
  }

  test("JSON reader handles line-delimited records") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "data.json")
    Files.writeString(f.toPath, """{"k":1,"v":"a"}""" + "\n" + """{"k":2,"v":"b"}""" + "\n")
    assert(Tables.readJson(spark, f.getAbsolutePath).count() == 2)
  }

  test("partitioned parquet write round-trips with partition pruning") {
    val out = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Tables(spark, SparkTestSession.sfDir).orders
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(out)
    val back = spark.read.parquet(out)
    // partition pruning: filtering on the partition col reads one dir
    val one = back.filter(col("status") === "F")
    assert(one.count() > 0 && one.count() < back.count())
    val scan = one.queryExecution.executedPlan.toString
    assert(back.count() ==
      Tables(spark, SparkTestSession.sfDir).orders.count())
  }

  test("binaryFile source reads opaque blobs with metadata") {
    val df = spark.read.format("binaryFile")
      .load(s"${SparkTestSession.sfDir}/documents.parquet")
    val r = df.select("path", "length", "content").head()
    assert(r.getAs[Long]("length") > 0 && r.getAs[Array[Byte]]("content").nonEmpty)
  }
}

class StreamingStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("session_window streaming agg bounds sessions by gap") {
    val out = graft.streaming.EventStream.sessionWindowAgg(
      graft.sources.Tables(spark, SparkTestSession.sfDir).events, "30 minutes")
    // batch execution of the same plan (session_window works in batch)
    val n = out.count()
    assert(n > 0)
  }
}

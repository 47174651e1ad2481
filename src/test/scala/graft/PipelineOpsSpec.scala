package graft

import graft.operators.{Derive, Ids}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the composition-batch operators: the spec-table-driven
  * mapping engine, reproducible surrogate ids, and the shuffle budget
  * of the composed q_pipeline_e2e plan.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("applyMappingSpec drives renames, casts, and vocab maps from data") {
    val df = Seq((1L, "O", "x"), (2L, "F", "y"), (3L, "Z", "z"))
      .toDF("id", "status", "junk")
    val spec = Seq(
      ("id", "entity_id", "string"),
      ("status", "status_code", null.asInstanceOf[String]))
      .toDF("src_col", "dst_col", "cast_to")
    val vocab = Seq(("status_code", "O", "OPEN"), ("status_code", "F", "FILLED"))
      .toDF("dst_col", "from_value", "to_value")
    val out = Derive.applyMappingSpec(df, spec, Some(vocab))
    assert(out.columns.toSeq == Seq("entity_id", "status_code")) // junk dropped
    assert(out.schema("entity_id").dataType.typeName == "string") // cast applied
    val rows = out.orderBy("entity_id").as[(String, String)].collect().toSeq
    // mapped values translated, unmapped ('Z') passes through
    assert(rows == Seq(("1", "OPEN"), ("2", "FILLED"), ("3", "Z")))
  }

  test("applyMappingSpec is null-safe through vocab lookup") {
    val df = Seq(Some("O"), None).toDF("status")
    val spec = Seq(("status", "code", null.asInstanceOf[String]))
      .toDF("src_col", "dst_col", "cast_to")
    val vocab = Seq(("code", "O", "OPEN")).toDF("dst_col", "from_value", "to_value")
    val out = Derive.applyMappingSpec(df, spec, Some(vocab))
      .as[Option[String]].collect().toSet
    assert(out == Set(Some("OPEN"), None))
  }

  test("applyMappingSpec keeps the spec dtype on vocab-mapped columns") {
    val df = Seq(Tuple1("1"), Tuple1("7")).toDF("code")
    val spec = Seq(("code", "code_num", "int")).toDF("src_col", "dst_col", "cast_to")
    val vocab = Seq(("code_num", "7", "700")).toDF("dst_col", "from_value", "to_value")
    val out = Derive.applyMappingSpec(df, spec, Some(vocab))
    assert(out.schema("code_num").dataType.typeName == "integer")
    assert(out.as[Int].collect().toSet == Set(1, 700))
  }

  test("imputeByGroup repairs null-key groups with their OWN mean (null-safe join)") {
    val df = Seq((Some("a"), Some(99.0)), (None, Some(10.0)), (None, None))
      .toDF("g", "v")
    val got = graft.operators.Cleaning.imputeByGroup(df, Seq("g"), "v")
      .select("g", "v_filled", "was_imputed")
      .as[(Option[String], Double, Boolean)].collect()
    val nullKeyImputed = got.filter(r => r._1.isEmpty && r._3)
    assert(nullKeyImputed.length == 1)
    // group mean of the null-key group is 10.0, NOT the global 54.5
    assert(math.abs(nullKeyImputed.head._2 - 10.0) < 1e-9)
  }

  test("surrogate ids are dense 1..N, unique, and key-determined") {
    val df = (1L to 97L).map(i => (i * 13 % 101, s"payload$i")).toDF("key", "payload")
    val out = Ids.surrogate(df, Seq("key")).select("key", "surrogate_id")
      .as[(Long, Long)].collect().toMap
    assert(out.values.toSeq.sorted == (1L to 97L).toSeq) // dense, unique
    // reproducible: a different input partition layout yields THE SAME ids
    val out2 = Ids.surrogate(df.repartition(7), Seq("key"))
      .select("key", "surrogate_id").as[(Long, Long)].collect().toMap
    assert(out == out2)
    // and the order is the md5 order of the key, not input order
    val byMd5 = out.keys.toSeq.sortBy(k =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(byMd5.map(out) == (1L to 97L).toSeq)
  }

  test("q_pipeline_e2e composed plan stays within its shuffle budget") {
    // clean → cross-ref → as-of → derive → unpivot → wide-doc as ONE
    // plan: the dims broadcast, each as-of side shuffles once on
    // user_id, and the final per-user aggregation REUSES the as-of's
    // user_id clustering (HashPartitioning(user_id) satisfies the
    // grouping's ClusteredDistribution because user_id is a subset of
    // the grouping keys) — so the whole chain is exactly 2 hash
    // shuffles end-to-end. A third would mean the composition broke
    // partitioning propagation.
    val conf = spark.conf
    val saved = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_pipeline_e2e")(spark, SparkTestSession.sfDir)
        .queryExecution.executedPlan.toString
      val hashShuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashShuffles <= 2, s"expected <=2 hash shuffles, got $hashShuffles:\n$plan")
      assert(!plan.contains("CartesianProduct"))
    } finally conf.set("spark.sql.adaptive.enabled", saved)
  }

  test("streaming incremental pipeline converges to the batch wide docs") {
    // the composed chain run as a stream: events arrive in 4 micro-
    // batches; each batch recomputes ONLY its dirty users against the
    // accumulated history and merge-upserts their docs. The final
    // store must equal the one-shot batch run row-for-row — the
    // incrementalizability proof for the whole composition.
    val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pinc").toString
    val (src, ev, docs) = (s"$tmp/src", s"$tmp/events", s"$tmp/docs")
    t.events.repartition(4).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val q = graft.streaming.EventStream
      .pipelineIncremental(spark, stream, t.customer, ev, docs)(
        graft.queries.QueriesPipeline.wideDocs)
      .start()
    q.awaitTermination(180000)
    if (q.isActive) q.stop()
    val streamed = graft.streaming.EventStream.latestDocs(spark, docs)
      .orderBy("user_id", "match_source")
      .collect().map(_.toString).toSeq
    val batch = graft.queries.QueriesPipeline.wideDocs(t.events, t.customer)
      .orderBy("user_id", "match_source").collect().map(_.toString).toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // crash-safety surface of the versioned store: a half-written next
    // snapshot (no _SUCCESS) must be invisible to readers
    val fs = new org.apache.hadoop.fs.Path(docs)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$docs/v_999"))
    val afterPartial = graft.streaming.EventStream.latestDocs(spark, docs)
      .orderBy("user_id", "match_source").collect().map(_.toString).toSeq
    assert(afterPartial == batch)
  }
}

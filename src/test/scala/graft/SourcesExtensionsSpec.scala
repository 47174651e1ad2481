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

  test("VecDotRewrite replaces the HOF dot product with native FloatVecDot") {
    import graft.functions.VectorFunctions
    // parquet-backed input: literal rows get constant-folded into a
    // LocalRelation before the plan can be inspected
    val emb = graft.sources.Tables(spark, SparkTestSession.sfDir).embeddings
    val df = emb.select(col("vec_id"),
      VectorFunctions.dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("floatvecdot"),
      s"rule did not fire:\n$optimized")
    assert(!optimized.contains("aggregate(zip_with"),
      s"HOF form survived optimization:\n$optimized")
    // same values as the explicitly-native path (exact: same fold order)
    val native = emb.select(col("vec_id"),
      VectorFunctions.vecDot(col("embedding"), col("embedding")).as("d"))
    assert(df.orderBy("vec_id").as[(Long, Double)].collect().toSeq ==
      native.orderBy("vec_id").as[(Long, Double)].collect().toSeq)
  }

  test("VecDotRewrite long flavor: exact-integer HOF fold becomes LongVecDot") {
    import graft.functions.VectorFunctions
    val docs = graft.sources.Tables(spark, SparkTestSession.sfDir).documents
    // parquet-backed long arrays (literals would constant-fold away)
    val arr = docs.select(col("doc_id"),
      array(col("n_chars").cast("long"), lit(2L), col("doc_id")).as("a"))
    val hof = arr.select(col("doc_id"),
      aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("d"))
    val optimized = hof.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("longvecdot"),
      s"long rule did not fire:\n$optimized")
    val native = arr.select(col("doc_id"),
      VectorFunctions.vecDotLong(col("a"), col("a")).as("d"))
    assert(hof.orderBy("doc_id").as[(Long, Long)].collect().toSeq ==
      native.orderBy("doc_id").as[(Long, Long)].collect().toSeq)
  }

  test("LongVecDot preserves the fold's overflow semantics per eval mode") {
    import graft.functions.VectorFunctions
    val big = Long.MaxValue / 2 + 1
    val df = Seq((1L, Seq(big, big))).toDF("id", "a")
      .select(col("id"), col("a").cast("array<bigint>").as("a"))
    val hof = df.select(aggregate(zip_with(col("a"), col("a"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v).as("d"))
    if (spark.conf.get("spark.sql.ansi.enabled", "true").toBoolean) {
      // the rewrite must NOT trade ANSI's overflow error for a wrap
      val thrown = intercept[Throwable] { hof.collect() }
      val chain = Iterator.iterate(thrown)(_.getCause).takeWhile(_ != null)
        .map(t => t.getClass.getName + " " + Option(t.getMessage).getOrElse(""))
        .mkString("; ")
      assert(chain.toLowerCase.contains("arithmetic") || chain.toLowerCase.contains("overflow"),
        s"expected an overflow error, got: $chain")
    }
    // the explicitly-native path is the documented wrapping (legacy) fold
    val wrapped = df.select(VectorFunctions.vecDotLong(col("a"), col("a")).as("d"))
      .as[Long].head()
    assert(wrapped == big * big + big * big) // Scala Long wraps identically
  }

  test("LongVecDot: exact values, null element yields null (HOF parity)") {
    val df = Seq((1L, Seq(Some(3L), None), Seq(Some(2L), Some(2L))),
      (2L, Seq(Some(100000000000L), Some(3L)), Seq(Some(100000L), Some(4L))))
      .toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<bigint>"), col("b").cast("array<bigint>"))
    val out = df.select(col("id"),
      graft.functions.VectorFunctions.vecDotLong(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof"))
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(out(0)._2.isEmpty && out(0)._3.isEmpty)
    assert(out(1)._2.contains(10000000000000012L) && out(1)._3.contains(10000000000000012L))
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

  test("repartition/coalesce control output file counts") {
    // output-file sizing — the knob the reference turns constantly
    // (23 repartition / 14 coalesce call sites): at 100 TB, file count
    // = write parallelism and downstream scan granularity
    val base = Files.createTempDirectory("graft_files").toFile.getAbsolutePath
    val df = Tables(spark, SparkTestSession.sfDir).orders.limit(1000)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    df.repartition(4).write.mode("overwrite").parquet(s"$base/r4")
    df.coalesce(1).write.mode("overwrite").parquet(s"$base/c1")
    assert(parts(s"$base/r4") == 4)
    assert(parts(s"$base/c1") == 1)
  }

  test("ORC round-trips with predicate pushdown to the scan") {
    val out = Files.createTempDirectory("graft_orc").toFile.getAbsolutePath
    val orders = Tables(spark, SparkTestSession.sfDir).orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == orders.count())
    val filtered = back.filter(col("o_orderkey") === 42L)
    // the filter must reach the ORC scan, not sit in a post-scan Filter only
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)"),
      s"no pushed filter in ORC scan:\n$scan")
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

  test("transformWithState running totals match the batch aggregate") {
    import org.apache.spark.sql.streaming.Trigger
    val conf = spark.conf
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(providerKey)
    try {
      // transformWithState requires the RocksDB state store
      conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val sfDir = SparkTestSession.sfDir
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .transform(graft.sources.Tables.normalizeEventTs(_))
      val q = graft.streaming.EventStream.runningTotals(spark, stream)
        .toDF("user_id", "n_events", "value_sum")
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      if (q.isActive) q.stop()
      // AvailableNow + one file = one batch: the emitted rows ARE the totals
      val got = spark.table("graft_tws").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val exp = graft.sources.Tables(spark, sfDir).events
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.keySet == exp.keySet)
      exp.foreach { case (u, (n, s)) =>
        val (gn, gs) = got(u)
        assert(gn == n, s"user $u count")
        // double sums fold in arrival order; compare with tolerance
        assert(math.abs(gs - s) <= math.abs(s) * 1e-9 + 1e-9, s"user $u sum")
      }
    } finally saved match {
      case Some(v) => conf.set(providerKey, v)
      case None    => conf.unset(providerKey)
    }
  }

  test("stream-stream interval join matches the batch self-join exactly") {
    val sfDir = SparkTestSession.sfDir
    val got = graft.streaming.EventStream.runIntervalEquivalent(spark, sfDir,
        "graft_interval_spec")
      .collect().map(_.toSeq).toSet
    val ev = graft.sources.Tables(spark, sfDir).events
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    val exp = c.join(p,
        col("c_user") === col("p_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 2 hours"))
      .select(col("purchase_id"), col("click_id"), col("c_user").as("user_id"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        round(col("value"), 4).as("purchase_value"))
      .collect().map(_.toSeq).toSet
    assert(exp.nonEmpty, "batch reference produced no interval matches")
    assert(got == exp)
  }

  test("streaming LOCF as-of enrich matches the batch as-of exactly") {
    import org.apache.spark.sql.streaming.Trigger
    val sfDir = SparkTestSession.sfDir
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .transform(graft.sources.Tables.normalizeEventTs(_))
    val q = graft.streaming.EventStream.asOfEnrich(spark, stream)
      .toDF("event_id", "user_id", "purchase_id", "p_value")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_asof_stream").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    if (q.isActive) q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), Option(r.get(2)), Option(r.get(3)))
    val streamed = spark.table("graft_asof_stream").collect().map(key).toSet
    // the same association the window-based batch operator (and through
    // it the AsOfJoinExec physical operator, see AsOfJoinPlanSpec) makes
    val batch = SparkEntry.queries("q_asof_backward")(spark, sfDir)
      .select("event_id", "user_id", "purchase_id", "p_value")
      .collect().map(key).toSet
    assert(streamed == batch)
  }
}

class DiffStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val nw  = Seq((2L, "b"), (3L, "CHANGED"), (4L, "d")).toDF("k", "v")
    val m = graft.operators.Diff.snapshotDiff(old, nw, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("flatMapGroupsWithState threshold alerts fire at multiples") {
    val events = Seq(
      (1L, 10L, 600.0), (1L, 11L, 600.0),   // crosses 1000 at event 11
      (1L, 12L, 900.0),                      // crosses 2000 at event 12
      (2L, 20L, 100.0))                      // never crosses
      .toDF("user_id", "event_id", "value")
    val out = graft.streaming.EventStream.thresholdAlerts(spark, events, 1000.0)
      .collect().toSet
    assert(out.map(t => (t._1, t._2)) == Set((1L, 11L), (1L, 12L)))
  }

  test("Hierarchy.ancestors walks a chain to the root") {
    val edges = Seq((4L, 3L), (3L, 2L), (2L, 1L)).toDF("child", "parent")
    val anc = graft.operators.Hierarchy.ancestors(edges, "child", "parent")
      .as[(Long, Long, Int)].collect().toSet
    assert(anc == Set((4L, 3L, 1), (4L, 2L, 2), (4L, 1L, 3),
      (3L, 2L, 1), (3L, 1L, 2), (2L, 1L, 1)))
  }
}

class DeriveMediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Derive.applyFormulas evaluates SQL formulas in order") {
    val df = Seq((10.0, 4.0)).toDF("a", "b")
    val out = graft.operators.Derive.applyFormulas(df,
      Seq("sum_ab" -> "a + b", "ratio" -> "sum_ab / b"))
    val r = out.head()
    assert(r.getDouble(2) == 14.0 && r.getDouble(3) == 3.5)
  }

  test("media frame sampling decodes real GIF frames deterministically") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val media = graft.multimodal.Media.asMediaTable(docs)
    val frames = graft.multimodal.Media.sampleFrames(spark, media, stride = 2)
    val f = frames.collect()
    assert(f.nonEmpty && f.forall(_.frame_idx % 2 == 0))
    // media_id 2: 10x16 GIF — frame 2's decoded pixel sum matches the
    // synthesis formula (x+y+id+f*7)%256, proving per-frame seek+decode
    val fr2 = f.find(s => s.media_id == 2L && s.frame_idx == 2).get
    assert(fr2.frame_px_sum ==
      (for (x <- 0 until 10; y <- 0 until 16) yield (x + y + 2 + 14) % 256).sum)
    val again = graft.multimodal.Media.sampleFrames(spark, media, stride = 2).collect()
    assert(f.toSet == again.toSet)
  }

  test("resizeMeta preserves aspect ratio within bounds") {
    val feats = Seq((1L, 1920, 1080), (2L, 100, 50)).toDF("media_id", "width", "height")
    val out = graft.multimodal.Media.resizeMeta(feats, 256, 256)
      .select("media_id", "resized_w", "resized_h")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(out(1L)._1 <= 256 && out(1L)._2 <= 256)
    assert(out(2L) == ((100, 50))) // already inside the box: untouched
  }
}

class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle exchange") {
    val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the in-memory catalog forgets tables between JVMs but the files
    // remain — clear the stale managed locations
    Seq("b_orders", "b_lineitem").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft_warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    t.orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    t.lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // force the sort-merge path (tiny test tables would broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      finally {}
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // co-located bucketed join: no Exchange below the join
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected SortMergeJoin in:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange hashpartitioning(l_orderkey"),
      "bucketed join should not reshuffle on the join key")
    assert(joined.count() > 0)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
    val dir = "/tmp/graft_dpp_events"
    t.events.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filtered on a NON-join column, so the surviving partition
    // values are only known at runtime — the fact scan must prune via
    // a dynamicpruning subquery (the 100 TB date-dim pattern); a
    // same-column literal filter would be propagated statically instead
    import spark.implicits._
    // dim must be file-backed: a local relation would constant-fold the
    // filter away and DPP needs a real selective Filter over a scan
    val dimDir = "/tmp/graft_dpp_dim"
    Seq(("purchase", "revenue"), ("click", "engagement"),
      ("view", "engagement")).toDF("et", "cat")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("cat") === "revenue")
    val joined = fact.join(dim, col("event_type") === col("et"))
      .groupBy("event_type").count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter in:\n$plan")
    assert(joined.collect().map(_.getString(0)).toSeq == Seq("purchase"))
  }

  test("runtime bloom filter injected on the probe side of a selective join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // thresholds sized for test data; production defaults (10MB/10GB)
      // target exactly the 100 TB shuffle-join regime
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
      val dim = t.orders.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val joined = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        s"expected an injected bloom filter in:\n$optimized")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("top-k window filter plans the WindowGroupLimit fast path") {
    // rank()<=k must become a per-partition group limit BEFORE the
    // shuffle (partial WindowGroupLimit), not a full sort + filter —
    // at 100 TB this is the difference between shuffling k rows per
    // group and shuffling everything
    val plan = graft.SparkEntry.queries("q_topk_per_group")(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "30KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // one hot key carrying ~99% of the left side
      val left = (0 until 60000).map(i => (if (i % 100 == 0) (i % 7).toLong + 1 else 0L, i))
        .toDF("k", "payload")
      val right = (0L until 8L).map(k => (k, s"dim_$k")).toDF("rk", "name")
      val joined = left.join(right, col("k") === col("rk"))
      // collect() drives THIS QueryExecution so the adaptive final plan
      // is inspectable (count() would plan a separate execution)
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (plan:\n${plan.take(2000)})")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("observe() collects data-quality metrics in the work's own pass") {
    // production DQ counters without a second scan: at 100 TB a
    // separate count()/agg validation query doubles the read
    import org.apache.spark.sql.functions._
    val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
    val df = t.orders.observe("dq",
      count(lit(1)).as("n_rows"),
      count(when(col("o_totalprice") <= 0, 1)).as("n_nonpositive"))
      .filter(col("o_orderstatus") === "F")
    val kept = df.collect().length
    val m = df.queryExecution.observedMetrics("dq")
    assert(m.getAs[Long]("n_rows") == t.orders.count()) // observed pre-filter
    assert(m.getAs[Long]("n_nonpositive") == 0L)
    assert(kept > 0 && kept < m.getAs[Long]("n_rows"))
  }

  test("mergeSchema reads across evolved parquet schemas") {
    // the reference's data releases add columns over time; readers must
    // span old+new files in one scan
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_evolve").toFile.getAbsolutePath
    spark.range(3).selectExpr("id", "id * 2 AS a").write.parquet(s"$dir/p=1")
    spark.range(3).selectExpr("id", "id * 2 AS a", "'x' AS b").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "p"))
    // rows from the old schema surface the new column as null
    assert(merged.filter(col("p") === 1 && col("b").isNull).count() == 3)
    assert(merged.filter(col("p") === 2 && col("b") === "x").count() == 3)
  }

  test("driver-side sketches: bloom filter and count-min over a column") {
    val t = graft.sources.Tables(spark, SparkTestSession.sfDir)
    val bloom = t.orders.stat.bloomFilter("o_custkey", 1000, 0.03)
    assert(bloom.mightContain(t.orders.select("o_custkey").head().getLong(0)))
    assert(!bloom.mightContain(-999999L))
    val cms = t.orders.stat.countMinSketch("o_orderstatus", 0.01, 0.95, 42)
    assert(cms.estimateCount("O") > 0)
  }
}

class XmlExtractionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("XML experiment extraction -> explode parameters (reference extract path)") {
    val dir = Files.createTempDirectory("graft_xml").toFile
    val f = new java.io.File(dir, "experiments.xml")
    Files.writeString(f.toPath,
      """<centreProcedureSet>
        |  <experiment experimentID="E1" dateOfExperiment="2020-01-02">
        |    <specimenID>S1</specimenID>
        |    <procedure procedureID="IMPC_CBC_001">
        |      <simpleParameter parameterID="IMPC_CBC_003_001"><value>12.5</value></simpleParameter>
        |      <simpleParameter parameterID="IMPC_CBC_004_001"><value>7.2</value></simpleParameter>
        |    </procedure>
        |  </experiment>
        |  <experiment experimentID="E2" dateOfExperiment="2020-02-03">
        |    <specimenID>S2</specimenID>
        |    <procedure procedureID="IMPC_GRS_001">
        |      <simpleParameter parameterID="IMPC_GRS_008_001"><value>30.1</value></simpleParameter>
        |    </procedure>
        |  </experiment>
        |</centreProcedureSet>""".stripMargin)

    val xml = spark.read.format("xml")
      .option("rowTag", "experiment")
      .load(f.getAbsolutePath)

    // experiment attrs + nested procedure struct -> long observation rows
    val obs = xml.select(
        col("_experimentID").as("experiment_id"),
        col("specimenID").as("specimen_id"),
        col("procedure._procedureID").as("procedure_id"),
        explode(col("procedure.simpleParameter")).as("p"))
      .select(col("experiment_id"), col("specimen_id"), col("procedure_id"),
        col("p._parameterID").as("parameter_id"),
        col("p.value").cast("double").as("data_point"))

    val rows = obs.orderBy("experiment_id", "parameter_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("experiment_id") == "E1")
    assert(rows(0).getAs[Double]("data_point") == 12.5)
    assert(rows(2).getAs[String]("procedure_id") == "IMPC_GRS_001")
  }
}

class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stream-stream join: clicks enriched with purchases inside the time bound") {
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet").schema
    def stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(SparkTestSession.sfDir)
      .transform(graft.sources.Tables.normalizeEventTs(_))
    val clicks = stream.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = stream.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ss_join").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(300000)
    if (q.isActive) q.stop()
    val n = spark.table("ss_join").count()
    assert(n > 0) // sf0.001 events contain click->purchase sequences within the hour
  }
}

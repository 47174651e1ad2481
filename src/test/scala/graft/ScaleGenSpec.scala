package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-corpus generator's text bijections (ScaleGen.charPerms):
  * every per-copy character map must be a true permutation of the
  * 36-char alphabet (a non-bijective map would merge tokens WITHIN a
  * copy and silently change dup-group/Jaccard structure), all k maps
  * must be pairwise distinct (cross-copy vocabulary disjointness is
  * what keeps near-dup pair counts linear in k), and the first 36 must
  * equal the round-5 rotations so pre-existing x10/x32 growth curves
  * stay comparable.
  */
class ScaleGenSpec extends AnyFunSuite {
  private val Alpha = ScaleGen.Alpha

  test("all 432 affine maps are distinct permutations of the alphabet") {
    val all = ScaleGen.charPerms(432)
    assert(all.size == 432)
    assert(all.toSet.size == 432, "maps must be pairwise distinct")
    all.foreach(p => assert(p.sorted == Alpha.sorted, s"not a bijection: $p"))
    assertThrows[IllegalArgumentException](ScaleGen.charPerms(433))
  }

  test("the first 36 maps are the round-5 rotations (series continuity)") {
    val rotations = (0 until 36).map(r => Alpha.drop(r) + Alpha.take(r))
    assert(ScaleGen.charPerms(36) == rotations)
  }

  test("embeddings labels SHIFT per copy: block sizes preserved, block count xK") {
    // the r6/r7 q_dedup_embed anomaly: labels copied verbatim made
    // block sizes grow xK and cross embedCosine's maxBlock cap, so the
    // scaled run did near-zero work (ratio 0.02). The replication
    // contract is the opposite — per-key cardinality constant, key
    // count xK — and this pins it for the blocking column.
    val spark = SparkTestSession.spark
    val out = java.nio.file.Files.createTempDirectory("graft_scalegen").toString
    ScaleGen.generate(spark, SparkTestSession.sfDir, out, 3,
      only = Some(Set("embeddings")))
    import org.apache.spark.sql.functions._
    def blocks(path: String) = spark.read.parquet(path)
      .groupBy("label").count().collect()
      .map(r => r.getAs[Number]("label").longValue -> r.getLong(1)).toMap
    val base = blocks(s"${SparkTestSession.sfDir}/embeddings.parquet")
    val x3 = blocks(s"$out/embeddings.parquet")
    assert(x3.size == base.size * 3, s"block count ${x3.size} != 3x${base.size}")
    assert(x3.values.max == base.values.max,
      "per-block cardinality must be preserved, not grown")
    // dtype preserved (int), and vec_ids still unique
    val df = spark.read.parquet(s"$out/embeddings.parquet")
    assert(df.schema("label").dataType == org.apache.spark.sql.types.IntegerType)
    assert(df.select("vec_id").distinct().count() == df.count())
  }

  test("a table-filtered run past the charPerms ceiling skips unrequested prep") {
    // measured r10: "ScaleGen <sf> <out> 1000 events" wrote events,
    // then died building the DOCUMENT rotations nobody asked for
    // (charPerms refuses past its 432 distinct bijections). Per-table
    // prep must be guarded by the filter: an events-only factor-500
    // run succeeds and writes ONLY events.
    val spark = SparkTestSession.spark
    val out = java.nio.file.Files.createTempDirectory("graft_scalegen_ev").toString
    ScaleGen.generate(spark, SparkTestSession.sfDir, out, 500,
      only = Some(Set("events")))
    val base = spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet").count()
    assert(spark.read.parquet(s"$out/events.parquet").count() == base * 500)
    assert(!new java.io.File(s"$out/documents.parquet").exists(),
      "documents must not be written on an events-only run")
    assert(!new java.io.File(s"$out/embeddings.parquet").exists(),
      "embeddings must not be written (or its labelD computed) on an events-only run")
  }
}

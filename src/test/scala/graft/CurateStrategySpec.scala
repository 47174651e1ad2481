package graft

import graft.operators.Dedup
import graft.queries.QueriesPipeline
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB curation config as CODE, not prose (VERDICT r11 #3):
  * `curateManifest(nearDupStrategy = "pruned")` swaps the lossless
  * prefix-filter pair generator for MinHash/LSH-pruned candidates
  * with an exact Jaccard re-score. This spec is the interchange
  * contract — on the test corpus the two strategies must produce
  * the IDENTICAL pair set and the IDENTICAL end-to-end manifest
  * (at the 32-hash/16-band config, per-pair recall at J = 0.5 is
  * ≥ 0.99 and the minhash signature is deterministic, so equality
  * here is a reproducible assertion, not a flaky sample).
  */
class CurateStrategySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private lazy val docs =
    Tables(spark, SparkTestSession.sfDir).documents

  test("pruned pair generator reproduces the lossless pair set exactly") {
    val lossless = Dedup.prefixFilterJaccard(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    val pruned = Dedup.minhashPrunedJaccard(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5, numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(lossless.nonEmpty, "test corpus produced no near-dup pairs — " +
      "the equality assertion would be vacuous")
    assert(pruned.toSeq === lossless.toSeq,
      s"pair sets differ: lossless=${lossless.length} pruned=${pruned.length}")
  }

  test("pruned strategy yields the identical curation manifest") {
    def manifest(strategy: String): Seq[Seq[Any]] =
      QueriesPipeline.curateManifest(docs, strategy)
        .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val lossless = manifest("lossless")
    val pruned = manifest("pruned")
    assert(lossless.nonEmpty)
    assert(pruned === lossless,
      s"manifests differ: lossless=${lossless.length} rows, pruned=${pruned.length}")
  }

  test("auto strategy: both sides of the measured threshold (r14)") {
    // the pure rule, pinned at and around the boundary
    assert(QueriesPipeline.resolveNearDupStrategy("auto",
      QueriesPipeline.AutoPrunedMinDocs) == "lossless")
    assert(QueriesPipeline.resolveNearDupStrategy("auto",
      QueriesPipeline.AutoPrunedMinDocs + 1) == "pruned")
    // a custom threshold exercises the pruned side without a 100k corpus
    assert(QueriesPipeline.resolveNearDupStrategy("auto", 10L, autoMinDocs = 1L)
      == "pruned")
    // explicit strategies pass through untouched regardless of size
    assert(QueriesPipeline.resolveNearDupStrategy("lossless", 1000000L) == "lossless")
    assert(QueriesPipeline.resolveNearDupStrategy("pruned", 1L) == "pruned")
    // the lazy count is NOT evaluated for explicit strategies (the
    // auto rule must not charge a count() to callers who chose)
    var counted = false
    QueriesPipeline.resolveNearDupStrategy("lossless", { counted = true; 0L })
    assert(!counted)
  }

  test("auto strategy end-to-end equals the lossless manifest at test scale") {
    val auto = QueriesPipeline.curateManifest(docs, "auto")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val lossless = QueriesPipeline.curateManifest(docs, "lossless")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(auto.nonEmpty && auto == lossless)
  }

  test("corpus-size hint resolves the auto strategy without the measuring " +
    "count and never changes the manifest (r15)") {
    // a BIG hint must route auto to the pruned generator, a SMALL one
    // to lossless — both land on the identical manifest (the r13 A/B
    // equivalence this spec already pins), so the hint is purely a
    // plan-selection shortcut
    val autoDefault = QueriesPipeline.curateManifest(docs, "auto")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val hintedSmall = QueriesPipeline.curateManifest(docs, "auto",
        corpusSizeHint = Some(1L))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val hintedBig = QueriesPipeline.curateManifest(docs, "auto",
        corpusSizeHint = Some(QueriesPipeline.AutoPrunedMinDocs + 1))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(autoDefault.nonEmpty)
    assert(hintedSmall == autoDefault)
    assert(hintedBig == autoDefault)
    // the hint short-circuits the by-name measured count (Option
    // .getOrElse never evaluates its default when the hint is present)
    var counted = false
    QueriesPipeline.resolveNearDupStrategy("auto",
      Some(5L).getOrElse[Long] { counted = true; 0L })
    assert(!counted)
  }

  test("unknown strategy is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      QueriesPipeline.curateManifest(docs, "typo")
    }
    assert(e.getMessage.contains("nearDupStrategy"))
  }
}

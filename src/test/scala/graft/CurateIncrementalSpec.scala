package graft

import graft.queries.QueriesPipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental curation DAG (q_curate_incremental, r15) as an
  * EQUALITY contract:
  *
  *  1. the frozen-model APPLY functions reproduce the train-and-score
  *     operators exactly when the model corpus IS the scored corpus —
  *     curatePinnedBatch(histPred = everything) equals the lossless
  *     curateManifest bit-for-bit, locking surprisalApplyCounts /
  *     dsirApplyCounts to the oracle-verified bigramSurprisal /
  *     dsirWeight formulas;
  *  2. the Targets DAG — persisted parquet models + indexes, nightly
  *     O(batch) verdict stages, cumulative manifest re-cut — equals
  *     the pinned-model batch RECOMPUTE on history ∪ batch (the
  *     deployment claim: a nightly ingest lands on exactly what
  *     re-running the whole corpus through the frozen models would).
  *
  * The remaining divergence class (a batch doc BRIDGING two history
  * components) is documented at Dedup.incrementalNearDupIndexed; the
  * corpus's dup families are cliques, so the equality here is exact.
  */
class CurateIncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def sf = SparkTestSession.sfDir

  test("pinned-model batch chain with model = full corpus equals the " +
    "lossless curateManifest (apply == train-and-score)") {
    val docs = Tables(spark, sf).documents
    val pinnedAll = QueriesPipeline.curatePinnedBatch(docs, lit(true))
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val lossless = QueriesPipeline.curateManifest(docs, "lossless")
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(pinnedAll.nonEmpty && pinnedAll == lossless)
  }

  test("the incremental DAG's cumulative manifest equals the pinned-model " +
    "batch recompute on history ∪ batch") {
    val docs = Tables(spark, sf).documents
    val thresh = docs.agg(max(col("doc_id"))).head.getLong(0) * 7 / 10
    val incremental = SparkEntry.queries("q_curate_incremental")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    val recompute = QueriesPipeline
      .curatePinnedBatch(docs, col("doc_id") <= thresh)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(incremental.nonEmpty && incremental == recompute)
    // both splits actually contribute (the equality is not vacuous)
    val ids = incremental.map(_.head.asInstanceOf[Long])
    assert(ids.exists(_ <= thresh) && ids.exists(_ > thresh))
  }

  test("night verdicts partition the batch and rewrite to sane canonicals") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("lang"))
    val thresh = docs.agg(max(col("doc_id"))).head.getLong(0) * 7 / 10
    val hist = docs.filter(col("doc_id") <= thresh)
    val batch = docs.filter(col("doc_id") > thresh)
    val lm = graft.operators.LangModel.bigramCounts(hist, "text")
    val kept = hist.join(
      graft.operators.LangModel.surprisalApplyCounts(lm, hist, "doc_id", "text",
        35000000L).filter(col("keep")).select("doc_id"), "doc_id")
    val exIdx = graft.operators.Dedup.exactIndex(kept, "doc_id", "text")
    val canon = hist.join(
      exIdx.select(col("hist_id").as("doc_id")).distinct(), "doc_id")
    val ndIdx = graft.operators.Dedup.minhashIndex(canon, "doc_id", "text")
    val v = QueriesPipeline.nightVerdicts(lm, exIdx, ndIdx, batch).collect()
    assert(v.length == batch.count(), "one verdict per batch doc")
    val statuses = v.map(_.getString(1)).toSet
    assert(statuses.subsetOf(Set("lm_drop", "dup_exact_history",
      "dup_exact_batch", "dup_near_history", "dup_near_batch", "new")))
    assert(statuses.contains("new"), "a nightly batch must yield new docs")
    v.foreach { r =>
      val (id, st, canonical) = (r.getLong(0), r.getString(1), r.getLong(2))
      st match {
        case "new" | "lm_drop" => assert(canonical == id)
        case "dup_exact_history" | "dup_near_history" =>
          assert(canonical <= thresh, s"$st canonical must be a history doc")
        case _ => assert(canonical > thresh && canonical < id,
          s"$st canonical must be an earlier batch doc")
      }
    }
  }
}

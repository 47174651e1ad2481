package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance ranking for corpus mining — the IR half of data
  * selection: given a literal query-term set, score every document and
  * surface the top-k (the "find the in-domain docs" primitive next to
  * DSIR's importance weights, LangModel.dsirApplyCounts).
  */
object Rank {

  /** BM25 scores in EXACT INTEGER fixed-point (the q_tfidf_terms
    * log-free discipline — libm log() would make rankings
    * 1-ulp-fragile across engines):
    *
    *  - idf: the Robertson ratio (N − df + ½)/(df + ½) cleared of
    *    halves (×2): idf_ppm = (2N − 2df + 1)·10⁶ div (2df + 1) —
    *    linear rarity instead of its log, monotone in df, exact;
    *  - tf saturation at k1 = 1.2, b = 0.75, cleared of fractions by
    *    ×10·A (A = Σ dl, so dl/avgdl = dl·N/A stays integral):
    *    tfn_ppm = 22·tf·A·10⁶ div (10·A·tf + 3·A + 9·dl·N);
    *  - per-term contribution idf_ppm · tfn_ppm div 10⁶, summed.
    *
    * Scale: one token shuffle for dl; the tf shuffle only carries
    * term-matching tokens (the literal IN prunes the explode); df and
    * the (A, N) totals broadcast (|terms|- and 1-row-sized). Docs
    * matching no term are absent (score 0 by definition).
    * Long-overflow bound: 22·tf·A·10⁶ requires tf·A < 4·10¹¹ — holds
    * through every test tier; at extreme corpus sizes run the same
    * ratio at reduced ppm scale.
    *
    * Returns (idCol, n_terms, score_ppm). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__term"))
      .filter(length(col("__term")) > 0)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val tot = dl.agg(sum(col("dl")).as("a"), count(lit(1)).as("nd"))
    val tf = toks.filter(col("__term").isin(terms: _*))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "__term").join(dl, idCol)
      .crossJoin(broadcast(tot))
      // LOUD overflow gate (ADVICE r15): the exact-ppm product
      // 22·tf·A·10⁶ wraps silently past tf·A ≈ 4·10¹¹ — fail the job
      // instead of emitting wrong scores (the containmentPairs
      // discipline). Division form so the GUARD itself can't wrap;
      // assert_true returns null on pass, so `+ coalesce(…, 0)` keeps
      // the check alive in the plan without touching the score.
      .withColumn("__contrib",
        expr("((2 * nd - 2 * df + 1) * 1000000 div (2 * df + 1)) * " +
          "(22 * tf * a * 1000000 div (10 * a * tf + 3 * a + 9 * dl * nd)) div 1000000" +
          " + coalesce(assert_true(a <= 400000000000 div tf, " +
          "'bm25 exact-ppm overflow: tf*A exceeds 4e11 — rerun at reduced ppm scale'), 0)"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms"), sum(col("__contrib")).as("score_ppm"))
  }
}

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

  /** BM25 against a query TABLE (VERDICT r15 next-round #8): many
    * queries scored in ONE pass over the corpus. `queries` is a dim
    * frame (query_id string, term string); corpus facts (dl, the
    * (A, N) totals, per-term df, per-(doc, term) tf) are computed
    * once and shared by every query — the multi-query mining shape,
    * where re-running [[bm25]] per query would re-tokenize the corpus
    * |queries| times.
    *
    * Same exact-integer fixed point as [[bm25]] (identical idf/tf
    * expressions including the loud overflow gate). Scale: one token
    * shuffle for dl; tf prunes the token stream with a broadcast
    * semi-join on the DISTINCT query terms (the dim is query-sized);
    * the per-query fan-out joins tf's (doc, term) rows against the
    * broadcast dim — output rows = Σ_q |matching docs|, never a
    * corpus×queries product; top-k per query is one window over the
    * (query_id)-partitioned score frame, sort bounded per query by
    * its match count, no global sort.
    *
    * Returns (query_id, idCol, n_terms, score_ppm, rank) with
    * rank ≤ k, ties broken by id. */
  def bm25Table(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("__term"))
      .filter(length(col("__term")) > 0)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val tot = dl.agg(sum(col("dl")).as("a"), count(lit(1)).as("nd"))
    val dim = queries.select(col("query_id").cast("string").as("query_id"),
      col("term").cast("string").as("__term"))
    val tf = toks
      .join(broadcast(dim.select("__term").distinct()), Seq("__term"), "left_semi")
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("__term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(dfreq), "__term").join(dl, idCol)
      .crossJoin(broadcast(tot))
      .withColumn("__contrib",
        expr("((2 * nd - 2 * df + 1) * 1000000 div (2 * df + 1)) * " +
          "(22 * tf * a * 1000000 div (10 * a * tf + 3 * a + 9 * dl * nd)) div 1000000" +
          " + coalesce(assert_true(a <= 400000000000 div tf, " +
          "'bm25 exact-ppm overflow: tf*A exceeds 4e11 — rerun at reduced ppm scale'), 0)"))
    val perQuery = contrib.join(broadcast(dim), Seq("__term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_terms"), sum(col("__contrib")).as("score_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_ppm").desc, col(idCol))
    perQuery.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

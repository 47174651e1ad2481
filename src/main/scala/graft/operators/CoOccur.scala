package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary-bounded token co-occurrence with an integer-exact PMI
  * ratio — the collocation statistic (which terms appear in the same
  * documents far more than chance) a corpus diagnostics pass computes
  * before phrase mining or embedding sanity checks.
  *
  * The naive pairs table is quadratic in document vocabulary, so the
  * operator is bounded BY CONSTRUCTION: only the global top-`topV`
  * tokens (by document frequency, ties broken by token — fully
  * deterministic) enter the pair join, capping per-document fan-out at
  * topV·(topV−1)/2 and the result at a vocab-squared dimension table.
  * The vocab is broadcast; the only fact-scale shuffles are the
  * distinct doc-token projection and the pair count, both map-side
  * combined.
  *
  * Portability: raw PMI is a log (engine-ulp territory); instead the
  * lift ratio p(x,y)/(p(x)p(y)) = c_xy·N/(c_x·c_y) is emitted in ppm
  * via TWO chained floor divisions — (c_xy·10⁶ div c_x)·N div c_y —
  * each intermediate provably ≤ 10⁶·N (c_xy ≤ c_x, so step one is at
  * most 10⁶), overflow-safe at any corpus size and replayed exactly
  * by any engine's integer division. pmi > 0 ⇔ ppm > 10⁶.
  */
object CoOccur {

  def pmi(docs: DataFrame, idCol: String, textCol: String,
          topV: Int = 50, minPairCount: Long = 2L): DataFrame = {
    require(topV >= 2 && topV <= 256,
      s"pair table is vocab-squared; topV bounded at 256, got $topV")
    // presence semantics: one (doc, token) row however often it occurs
    val toks = docs
      .select(col(idCol).as("__doc"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__cx"))
      .orderBy(col("__cx").desc, col("tok")).limit(topV)
    val nDocs = toks.agg(countDistinct(col("__doc")).as("__ndocs"))
    val kept = toks.join(broadcast(vocab), "tok")
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.__doc") === col("b.__doc") && col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("tok_a"), col("b.tok").as("tok_b"))
      .agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minPairCount)
    pairs
      .join(broadcast(vocab.select(col("tok").as("tok_a"), col("__cx").as("c_x"))), "tok_a")
      .join(broadcast(vocab.select(col("tok").as("tok_b"), col("__cx").as("c_y"))), "tok_b")
      .crossJoin(broadcast(nDocs))
      .select(col("tok_a"), col("tok_b"), col("c_xy"), col("c_x"), col("c_y"),
        col("__ndocs").as("n_docs"),
        expr("((c_xy * 1000000) div c_x) * __ndocs div c_y").as("lift_ppm"))
  }
}

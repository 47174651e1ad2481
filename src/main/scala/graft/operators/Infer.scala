package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-feature linear model inference — the fastText /
  * Vowpal-Wabbit hashing trick as a Spark plan: score(doc) =
  * bias + Σ_tokens w[h(token) mod B]. This is how corpus-scale
  * quality/toxicity/language classifiers actually run over training
  * data (a linear model over hashed unigrams), and the plan is the
  * point: the MODEL RIDES THE PLAN as a literal array (B weights ship
  * with the task binary — no join, no broadcast table, no UDF), the
  * feature map is a narrow codegen'd explode, and the only shuffle is
  * the per-doc score aggregation, map-side-combined down to one row
  * per document.
  *
  * Portability: the feature hash is the library's md5 convention
  * (first 3 hex digits → 0..4095, [[Shard.md5Shard]]'s ladder), NOT
  * Spark's internal Murmur3 — so any engine (and the DuckDB oracle)
  * reproduces bucket assignment, and integer weights make the score
  * an exact sum. Docs with no tokens keep the bias score (left join
  * back onto the doc spine; same-key exchange reuse).
  */
object Infer {

  /** @param weights the model: weight per hash bucket; size must
    *                divide 4096 (the 3-hex-digit hash range) so
    *                bucket = hex3 mod B stays uniform.
    * @param salt    feature-hash salt — distinct models decorrelate. */
  def linearScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: Seq[Long], bias: Long = 0L,
                  salt: String = "fh"): DataFrame = {
    val b = weights.length
    require(b > 0 && 4096 % b == 0,
      s"weights size must divide 4096 (3 hex digits); got $b")
    val bucket =
      conv(substring(md5(concat(lit(salt), col("__tok"))), 1, 3), 16, 10)
        .cast("long") % b
    val scores = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .withColumn("__w", element_at(lit(weights.toArray), (bucket + 1).cast("int")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("__w").as("__sw"))
    docs.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("__sw"), lit(0L)) + bias).as("score"))
      .withColumn("keep", col("score") > 0)
  }
}

package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  *  - brute-force: exact cosine top-k against a SMALL broadcast query
  *    set (queries × corpus narrow map — no shuffle until top-k)
  *  - LSH (random hyperplanes): the scale path — corpus shuffles once
  *    by bucket id; queries probe only their own bucket.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. `queries`
    * must be small (it is broadcast). Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     useNative: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val cos =
      if (useNative) VectorFunctions.cosine(col("__qv"), col(vecCol))
      else {
        val d  = VectorFunctions.dotHof(col("__qv"), col(vecCol))
        val nq = VectorFunctions.normHof(col("__qv"))
        val nc = VectorFunctions.normHof(col(vecCol))
        when(nq === 0 || nc === 0, lit(0.0)).otherwise(d / (nq * nc))
      }
    val scored = corpus.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cosine", cos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }

  /** Random-hyperplane LSH bucket id: `planes` sign bits packed into a
    * long. Hyperplane components are deterministic pseudo-randoms
    * derived from xxhash64(plane, dim) mapped to [-1, 1]. */
  def withLshBucket(df: DataFrame, vecCol: String, planes: Int, dim: Int,
                    outCol: String = "lsh_bucket"): DataFrame = {
    val bucket = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(col(vecCol), sequence(lit(0), lit(dim - 1)), (x, i) => {
          val h = xxhash64(lit(p), i)
          val r = (pmod(h, lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
          x.cast("double") * r
        }),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn(outCol, bucket)
  }

  /** LSH-bucketed ANN: queries probe only their bucket. Returns top-k
    * per query found within the bucket (approximate — recall measured
    * against bruteForceTopK in the spec). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              planes: Int = 8, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = withLshBucket(corpus, vecCol, planes, dim)
    val qb = withLshBucket(queries, vecCol, planes, dim)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"), col("lsh_bucket"))
    val scored = cb.join(broadcast(qb), Seq("lsh_bucket"))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cosine", VectorFunctions.cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }
}

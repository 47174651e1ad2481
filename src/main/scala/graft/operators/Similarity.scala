package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sign bit of the vector against deterministic pseudo-random
    * hyperplane `p` (components derived from xxhash64(p, dim index)
    * mapped to [-1, 1]). */
  private def planeBit(vecCol: String, p: Int, dim: Int): Column = {
    val dot = aggregate(
      zip_with(col(vecCol), sequence(lit(0), lit(dim - 1)), (x, i) => {
        val h = xxhash64(lit(p), i)
        val r = (pmod(h, lit(2000001L)).cast("double") - 1000000.0) / 1000000.0
        x.cast("double") * r
      }),
      lit(0.0), (acc, v) => acc + v)
    when(dot > 0, lit(1L)).otherwise(lit(0L))
  }

  /** Multi-table random-hyperplane LSH: `tables` independent bucket
    * ids, each from `planes` sign bits. Output rows are exploded per
    * table — (table, bucket) is the shuffle key at scale. */
  def withLshBuckets(df: DataFrame, vecCol: String, tables: Int, planes: Int,
                     dim: Int): DataFrame = {
    val bucketForTable = (t: Int) =>
      (0 until planes).map(b => planeBit(vecCol, t * planes + b, dim) * (1L << b))
        .reduce(_ + _)
    df.withColumn("lsh", explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"), bucketForTable(t).as("bucket"))): _*)))
      .select(df.columns.map(col) :+ col("lsh.tbl") :+ col("lsh.bucket"): _*)
  }

  /** Multi-table LSH ANN: a query's candidates are the union of its
    * buckets across all tables (dedup'd), then exact cosine top-k on
    * the candidates. More tables → higher recall; more planes →
    * smaller buckets. At corpus scale the join shuffles by
    * (table, bucket) — never all-pairs. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, planes: Int = 4, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = withLshBuckets(corpus.select(col(idCol), col(vecCol)), vecCol, tables, planes, dim)
    val qb = withLshBuckets(queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv")),
      "__qv", tables, planes, dim)
    val cand = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col(idCol))
      .dropDuplicates("query_id", idCol)
      .withColumn("cosine", VectorFunctions.cosine(col("__qv"), col(vecCol)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rk"))
  }
}

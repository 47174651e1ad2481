package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for corpus-scale pipelines.
  *
  * Every variant is designed to avoid the O(n²) trap at 100 TB:
  *  - exact:    hash groupBy (one shuffle on the content hash)
  *  - minhash:  LSH banding — pairs only form inside a band bucket
  *  - simhash:  block-permutation buckets (pigeonhole on 16-bit blocks)
  *  - ngram:    candidate gating by (length bucket, rare-prefix) before
  *              any pairwise Jaccard
  */
object Dedup {

  /** Exact dedup on normalized content: keep the smallest id per
    * fingerprint. One shuffle; survivor choice is a min aggregation,
    * not a window, so it partial-aggregates map-side. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.withColumn("fp", fingerprint(col(textCol)))
    val keep = fp.groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
    keep
  }

  /** MinHash signatures: `numHashes` permutations approximated by
    * seeded xxhash64 over the shingle set. */
  def withMinHash(df: DataFrame, textCol: String, shingleN: Int, numHashes: Int): DataFrame =
    df.withColumn("__sh", array_distinct(shingles(col(textCol), shingleN)))
      .withColumn("minhash", array((0 until numHashes).map(i =>
        array_min(transform(col("__sh"), s => xxhash64(lit(i), s)))): _*))

  /** MinHash + LSH banding near-dup candidate pairs, verified with
    * exact Jaccard over the shingle sets. Returns (id_a, id_b,
    * jaccard) with id_a < id_b, jaccard >= threshold.
    *
    * Scale path: bucket key is (band index, band hash) — the join
    * explodes only within buckets; at corpus scale bucket sizes stay
    * tiny for honest thresholds, and a size cap guards pathological
    * buckets (all-identical spam) from quadratic blowup.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.7, maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val sig = withMinHash(df, textCol, shingleN, numHashes)
      .select(col(idCol), col("__sh"), col("minhash"))

    val banded = sig.select(col(idCol), col("__sh"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            xxhash64(slice(col("minhash"), b * rows + 1, rows)).as("bh"))): _*)).as("lsh"))
      .select(col(idCol), col("__sh"), col("lsh.band"), col("lsh.bh"))

    // Pairs within a bucket: sorted-collect then per-bucket pair
    // generation keeps the shuffle to one groupBy (vs a self-join that
    // shuffles the shingle payload twice).
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("__sh").as("sh")))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))

    val pairs = buckets.select(explode(flatten(
        transform(sequence(lit(0), size(col("docs")) - 2), i =>
          transform(sequence(i + 1, size(col("docs")) - 1), j =>
            struct(element_at(col("docs"), i + 1).as("a"),
                   element_at(col("docs"), j + 1).as("b")))))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        col("p.a.sh").as("sh_a"), col("p.b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")

    pairs
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over token hashes (builtin HOFs only; SQL-expr form
    * because the Scala DSL shift functions take literal Int bit counts
    * while the SQL functions accept expressions). */
  def withSimHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__toks", tokens(col(textCol)))
      // acc(i) += (bit i of xxhash64(token)) ? 1 : -1; sign bits → long
      .withColumn("simhash", expr(
        """aggregate(
          |  zip_with(
          |    transform(
          |      aggregate(__toks, array_repeat(0, 64),
          |        (acc, t) -> zip_with(acc,
          |          transform(sequence(0, 63),
          |            i -> CASE WHEN (shiftright(xxhash64(t), i) & 1L) = 1L THEN 1 ELSE -1 END),
          |          (a, b) -> a + b)),
          |      c -> CASE WHEN c > 0 THEN 1L ELSE 0L END),
          |    sequence(0, 63), (b, i) -> shiftleft(b, i)),
          |  0L, (acc, v) -> acc | v)""".stripMargin))
      .drop("__toks")

  /** SimHash near-dup pairs with hamming distance <= maxHamming (< 4
    * guaranteed found by pigeonhole over four 16-bit blocks). */
  def simHashDups(df: DataFrame, idCol: String, textCol: String,
                  maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sig = withSimHash(df, textCol).select(col(idCol), col("simhash"))
    val blocked = sig.select(col(idCol), col("simhash"),
        explode(array((0 until 4).map(b => struct(lit(b).as("blk"),
          shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL).as("bh"))): _*)).as("l"))
      .select(col(idCol), col("simhash"), col("l.blk"), col("l.bh"))

    val buckets = blocked.groupBy(col("blk"), col("bh"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("simhash").as("h")))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))

    buckets.select(explode(flatten(
        transform(sequence(lit(0), size(col("docs")) - 2), i =>
          transform(sequence(i + 1, size(col("docs")) - 1), j =>
            struct(element_at(col("docs"), i + 1).as("a"),
                   element_at(col("docs"), j + 1).as("b")))))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        bit_count(col("p.a.h").bitwiseXOR(col("p.b.h"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard near-dup with candidate gating: only documents in
    * the same (token-count bucket, first-shingle-hash band) are
    * compared — a cheap literal analog of prefix filtering. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5,
                   maxBucket: Int = 1000): DataFrame = {
    val sh = df.withColumn("__sh", array_distinct(shingles(col(textCol), shingleN)))
      .withColumn("__lenb", (size(col("__sh")) / 10).cast("int"))
      .withColumn("__pref", pmod(xxhash64(array_min(col("__sh"))), lit(64)))
    val buckets = sh.groupBy(col("__lenb"), col("__pref"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("__sh").as("sh")))).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    buckets.select(explode(flatten(
        transform(sequence(lit(0), size(col("docs")) - 2), i =>
          transform(sequence(i + 1, size(col("docs")) - 1), j =>
            struct(element_at(col("docs"), i + 1).as("a"),
                   element_at(col("docs"), j + 1).as("b")))))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        (size(array_intersect(col("p.a.sh"), col("p.b.sh"))).cast("double") /
          size(array_union(col("p.a.sh"), col("p.b.sh"))).cast("double")).as("jaccard"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("jaccard") >= threshold)
      .withColumn("jaccard", round(col("jaccard"), 6))
  }
}

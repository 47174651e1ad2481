package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived scale-corpus generator: replicate an sf directory ×K with
  * perturbed keys and text so the scale-critical operator family can
  * be MEASURED at 10×/32× instead of argued from plan shapes
  * (`SCALE_r5.json`). Writes to a caller-chosen output dir (e.g.
  * target/scale/x10) — never touches the read-only testdata.
  *
  * Replication preserves workload SHAPE, not just row count:
  *  - fact keys (doc/event/user/order/customer ids) shift by
  *    copy × (max+1), so per-key cardinalities — as-of state sizes,
  *    session lengths, dup-group sizes — stay what they were, and the
  *    key count grows ×K the way a real bigger corpus grows;
  *  - document TEXT goes through a per-copy bijective character
  *    rotation over [a-z0-9] (copy 0 = identity; 36 alphabet chars ≥
  *    32 copies ⇒ all rotations distinct). A bijection on characters
  *    preserves every within-copy relation the text operators consume
  *    — token boundaries, token equality, shingle-set Jaccard,
  *    duplicate spans, exact-dup groups — while making cross-copy
  *    vocabularies disjoint, so near-dup pair counts and ban sets
  *    grow ×K (linear), not ×K² (every doc colliding with its own
  *    replicas, which no real corpus does);
  *  - dimension tables (region/nation/supplier/part) are copied
  *    verbatim: scaling facts against fixed dims is how a real
  *    deployment grows.
  */
object ScaleGen {

  private val Alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args
    val k = kStr.toInt
    val spark = GraftSession.local()
    try generate(spark, src, out, k)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scalegen] $t x$k written")
    }

    // k copies via a broadcast range — the fact side stays un-shuffled
    val copies = broadcast(spark.range(k).toDF("__copy"))
    def replicate(df: DataFrame): DataFrame = df.crossJoin(copies)

    /** Shift each key column by copy × (max+1). */
    def shiftKeys(df: DataFrame, keys: Seq[String]): DataFrame =
      keys.foldLeft(df) { (cur, kc) =>
        val m = cur.agg(max(col(kc))).head().getLong(0) + 1
        cur.withColumn(kc, col(kc) + col("__copy") * m)
      }

    // verbatim dims
    Seq("region", "nation", "supplier", "part").foreach(t => write(read(t), t))

    // facts: shift keys
    write(shiftKeys(replicate(read("customer")), Seq("c_custkey")).drop("__copy"), "customer")
    write(shiftKeys(replicate(read("orders")), Seq("o_orderkey", "o_custkey")).drop("__copy"), "orders")
    write(shiftKeys(replicate(read("lineitem")), Seq("l_orderkey")).drop("__copy"), "lineitem")
    write(shiftKeys(replicate(read("events")), Seq("event_id", "user_id")).drop("__copy"), "events")
    write(shiftKeys(replicate(read("embeddings")), Seq("vec_id")).drop("__copy"), "embeddings")

    // documents: shift ids + rotate text per copy. translate() is a
    // codegen'd narrow map; the 36 rotations are prebuilt literals
    // dispatched by a chained when (k <= 36 enforced).
    require(k <= Alpha.length, s"at most ${Alpha.length} distinct rotations")
    val rotations = (0 until k).map { r =>
      val rot = Alpha.drop(r) + Alpha.take(r)
      translate(lower(col("text")), Alpha, rot)
    }
    val rotated = rotations.zipWithIndex.tail.foldLeft(when(col("__copy") === 0, rotations.head)) {
      case (acc, (expr, i)) => acc.when(col("__copy") === i, expr)
    }
    val docs = shiftKeys(replicate(read("documents")), Seq("doc_id"))
      .withColumn("text", rotated)
      .drop("__copy")
    write(docs, "documents")
  }
}

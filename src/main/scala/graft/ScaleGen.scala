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
  *  - keys shift by copy × (domain max + 1), where the shift constant
  *    is computed once per key DOMAIN (the owning table's key range)
  *    and reused for every referencing column — c_custkey and
  *    o_custkey shift by the same constant, l_orderkey by
  *    o_orderkey's, events.user_id by the customer domain it joins —
  *    so every equi-join lands on the SAME copy's replica and
  *    per-key cardinalities (as-of state sizes, session lengths,
  *    dup-group sizes, registry match profiles) stay exactly what
  *    they were while key counts grow ×K. (Modulo-DERIVED keys —
  *    q_pipeline_e2e's legacy_key = user_id % 500, q_hierarchy's
  *    parent = key div 10 — inherently reference the base range and
  *    cannot be shift-preserved; SCALE_r5.json notes those models.)
  *  - document TEXT goes through a per-copy bijective character
  *    rotation over [a-z0-9] after lowercasing (lowercasing is what
  *    CONFINES the alphabet so the rotation is a bijection on the
  *    corpus — an unmapped uppercase letter would survive identical
  *    across copies and leak shared tokens; normText lowers anyway,
  *    so every token-level operator sees copy 0 as identity). A
  *    bijection preserves every within-copy relation the text
  *    operators consume — token boundaries, token equality,
  *    shingle-set Jaccard, duplicate spans, exact-dup groups — while
  *    making cross-copy vocabularies disjoint, so near-dup pair
  *    counts and ban sets grow ×K (linear), not ×K².
  *  - dimension tables (region/nation/supplier/part) are copied
  *    verbatim: scaling facts against fixed dims is how a real
  *    deployment grows.
  */
object ScaleGen {

  private[graft] val Alpha = "abcdefghijklmnopqrstuvwxyz0123456789"

  /** The per-copy alphabet bijections: affine maps i → (a·i + b) mod 36
    * with gcd(a,36)=1 — 12 units × 36 shifts = 432 distinct
    * permutations; copy r<36 is the plain rotation by r (the round-5
    * series, so earlier growth curves stay comparable). Exposed for
    * the spec: bijectivity and pairwise distinctness are what keep
    * within-copy token structure intact and cross-copy vocabularies
    * disjoint (near-dup pairs grow ×k, not ×k²). */
  private[graft] def charPerms(k: Int): Seq[String] = {
    val units = (1 until Alpha.length).filter(a => BigInt(a).gcd(Alpha.length) == 1)
    require(k <= units.length * Alpha.length,
      s"at most ${units.length * Alpha.length} distinct affine bijections")
    (0 until k).map { r =>
      val (a, b) = (units(r / Alpha.length), r % Alpha.length)
      Alpha.indices.map(i => Alpha((a * i + b) % Alpha.length)).mkString
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    // optional 4th arg: comma-separated table subset (regenerate just
    // those tables inside an existing derived corpus — e.g. after a
    // replication-model fix to one table)
    val only = args.lift(3).map(_.split(",").toSet)
    val spark = GraftSession.local()
    try generate(spark, src, out, k, only)
    finally spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, k: Int,
               only: Option[Set[String]] = None): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit = if (only.forall(_.contains(t))) {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scalegen] $t x$k written")
    }

    // one shift constant per key DOMAIN, computed on the SOURCE table
    // (cheap single-scan aggs, before any replication)
    def domainMax(t: String, c: String): Long =
      read(t).agg(max(col(c).cast("long"))).head().getLong(0) + 1
    val custD = domainMax("customer", "c_custkey")
    val orderD = domainMax("orders", "o_orderkey")
    val eventD = domainMax("events", "event_id")
    val userD = custD // events.user_id equi-joins c_custkey (q_pipeline_e2e)
    val docD = domainMax("documents", "doc_id")
    val vecD = domainMax("embeddings", "vec_id")

    // k copies via a broadcast range — the fact side stays un-shuffled
    val copies = broadcast(spark.range(k).toDF("__copy"))
    def replicate(df: DataFrame): DataFrame = df.crossJoin(copies)

    /** Shift each (column → domain constant) by copy × constant. */
    def shifted(df: DataFrame, keys: (String, Long)*): DataFrame =
      keys.foldLeft(replicate(df)) { case (cur, (kc, d)) =>
        cur.withColumn(kc, col(kc) + col("__copy") * d)
      }.drop("__copy")

    // verbatim dims
    Seq("region", "nation", "supplier", "part").foreach(t => write(read(t), t))

    write(shifted(read("customer"), "c_custkey" -> custD), "customer")
    write(shifted(read("orders"), "o_orderkey" -> orderD, "o_custkey" -> custD), "orders")
    write(shifted(read("lineitem"), "l_orderkey" -> orderD), "lineitem")
    write(shifted(read("events"), "event_id" -> eventD, "user_id" -> userD), "events")
    // label is the dedup/stratification BLOCKING key: shift it like
    // every other key domain so per-block cardinality stays what it
    // was while block count grows ×K. Leaving it verbatim made block
    // size grow ×K instead, which crossed embedCosine's maxBlock cap
    // between ×1 and ×10 and collapsed q_dedup_embed's scaled work to
    // near-zero (the SCALE_r6 0.021-ratio anomaly — the cap doing its
    // documented job under the WRONG corpus model, not a plan flip).
    if (only.forall(_.contains("embeddings"))) {
      val labelD = domainMax("embeddings", "label")
      write(shifted(read("embeddings"), "vec_id" -> vecD, "label" -> labelD)
        .withColumn("label", col("label").cast("int")), "embeddings")
    }

    // documents: shift ids + apply a per-copy bijective character map
    // ([[charPerms]]). translate() is a codegen'd narrow map; the k
    // permutations are prebuilt literals dispatched by a chained when.
    // Prep is guarded by the table filter: charPerms refuses past its
    // 432 distinct bijections, and a factor-1000 run of OTHER tables
    // (e.g. the x1000 events-only as-of skew corpus) must not die on a
    // ceiling belonging to a table it was asked to skip — measured
    // r10: "ScaleGen ... 1000 events" wrote events, then the runner
    // exited 1 building document rotations nobody requested.
    if (only.forall(_.contains("documents"))) {
      val rotations = charPerms(k).map(perm =>
        translate(lower(col("text")), Alpha, perm))
      val rotated = rotations.zipWithIndex.tail.foldLeft(when(col("__copy") === 0, rotations.head)) {
        case (acc, (expr, i)) => acc.when(col("__copy") === i, expr)
      }
      val docs = replicate(read("documents"))
        .withColumn("doc_id", col("doc_id") + col("__copy") * docD)
        .withColumn("text", rotated)
        .drop("__copy")
      write(docs, "documents")
    }
  }
}

package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) on a global int8 integer grid —
  * an ORACLE-CHECKABLE iterative clustering operator.
  *
  * Everything after quantization is exact integer arithmetic:
  *  - one corpus-wide symmetric scale (global max |x| / 127) maps all
  *    vectors onto a common integer grid (per-vector scales would put
  *    vectors in incomparable spaces — fine for storage, wrong for
  *    clustering);
  *  - assignment: argmin of the exact integer squared L2 distance,
  *    ties to the smallest cluster id;
  *  - update: per-dimension floor(sum / count) — floor-of-double
  *    division, exact below 2^52 and identical in every engine
  *    (unlike `div`, whose negative-operand truncation direction
  *    differs between Spark and DuckDB);
  *  - empty clusters keep their previous centroid.
  * So the full trajectory (assignments, centroids, inertia) is a pure
  * function of the data and DuckDB can replay the unrolled iterations
  * bit-for-bit — the same portability discipline as the md5 shard /
  * rolling-fingerprint / simhash families.
  *
  * Scale posture (the 100 TB k-means shape): centroids are k x dim
  * longs — a CONFIG-SIZED driver collect per iteration (k = 8: 512
  * values, the capped merges-table class), shipped back as literals.
  * Assignment is then a NARROW codegen'd map: k scored structs,
  * array_sort, take the head — the IVF probe pattern; no crossJoin,
  * no shuffle, no window. Each update is ONE map-side-combined
  * (cluster, pos) shuffle whose reduced volume is k x dim x
  * partitions, independent of row count. Total: `iters` shuffles of
  * bounded reduced size + one final bounded aggregation.
  *
  * Reference analog: the stats pipeline's grouping of result packets
  * into phenotype clusters is config-driven; this supplies the
  * data-driven variant an embedding-bearing corpus needs (cell
  * training for IVF ANN, mixture balancing, near-dup cluster seeding).
  */
object Cluster {

  /** A finished Lloyd's run. `assigned` is the FINAL per-row
    * assignment, made against `assignCentroids` (the last
    * pre-update centroid set — the set that DEFINES the cells);
    * `centroids` is the post-update set (what the next iteration
    * would assign against, and what [[kmeansInt8]] fingerprints).
    * IVF probing must rank `assignCentroids`, not `centroids`:
    * probing a different centroid set than the one that assigned the
    * cells silently skips the right cells near cell boundaries. */
  private[graft] final case class Trained(
      assigned: DataFrame,
      assignCentroids: IndexedSeq[Seq[Long]],
      centroids: IndexedSeq[Seq[Long]])

  /** Above this k the assignment switches from centroid LITERALS (zero
    * shuffle, one codegen'd argmin projection — but the expression tree
    * grows k × dim nodes, a codegen bomb past a few dozen centroids)
    * to a broadcast equi-join (explode k cids per row → broadcast-hash
    * join the k-row centroid table → map-side-combined min_by per id).
    * Both paths are exact integer arithmetic with the same (dist, cid)
    * tie-break, so the trajectory is bit-identical either way
    * (ClusterSpec proves it). */
  private[graft] val LiteralAssignMaxK = 64

  /** The IVF nlist sizing rule as a CODE PATH, not a comment:
    * k = ceil(n / targetCellSize), so expected cell population stays
    * ~targetCellSize no matter the corpus. A FIXED k is the silent
    * 100 TB failure mode for k-means blocking: cells grow with the
    * data until the pair generator's maxBlock cap drops them all and
    * dedup quietly finds nothing (the embedCosine drop gate turns
    * that loud; this derivation prevents it). maxK bounds the
    * flat-assignment regime — each row scores all k centroids,
    * O(k × dim) per row, FAISS's own flat-nlist territory; past it,
    * shard first (hash-shard, then cluster within shards) or raise
    * targetCellSize, which the failure message states. */
  def kForCorpus(n: Long, targetCellSize: Long = 64, maxK: Int = 4096): Int = {
    require(n > 0, s"empty corpus (n=$n)")
    require(targetCellSize > 0, s"targetCellSize must be positive; got $targetCellSize")
    val k = (n + targetCellSize - 1) / targetCellSize
    require(k <= maxK,
      s"kForCorpus($n, $targetCellSize) derives k=$k > maxK=$maxK: flat centroid " +
        "scoring is O(k x dim) per row and past this k you want two-level blocking " +
        "(hash-shard the corpus, cluster within shards) or a larger targetCellSize")
    k.toInt
  }

  /** Final per-vector cluster assignment (id, cluster) from the same
    * bit-deterministic Lloyd's run as [[kmeansInt8]] — the blocking
    * surface for label-free semantic dedup and IVF cell routing.
    * Size k with [[kForCorpus]] so cells track the corpus. */
  def kmeansAssignInt8(emb: DataFrame, idCol: String, vecCol: String,
                       k: Int, iters: Int): DataFrame =
    trainInt8(emb, idCol, vecCol, k, iters).assigned
      .select(col("id").as(idCol), col("cid").as("cluster"))

  /** @return one row per cluster: (cluster, n_members, inertia,
    *         centroid_fp) — counts/inertia from the final assignment
    *         against the pre-update centroids, fingerprint of the
    *         post-update centroid (md5 of the comma-joined longs). */
  def kmeansInt8(emb: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int): DataFrame = {
    val tr = trainInt8(emb, idCol, vecCol, k, iters)
    val (assigned, centroids) = (tr.assigned, tr.centroids)
    val spark = emb.sparkSession
    // final surface: membership + inertia from the last assignment,
    // fingerprint of the post-update centroid (hashed by Spark's own
    // md5 — same MD5-of-UTF-8 the oracle's md5() computes)
    import spark.implicits._
    val fpDf = centroids.zipWithIndex
      .map { case (cent, c) => (c, cent.mkString(",")) }
      .toDF("cluster", "__cs")
      .select(col("cluster"), md5(col("__cs")).as("centroid_fp"))
    assigned.groupBy(col("cid").as("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("dist")).as("inertia"))
      .join(fpDf, Seq("cluster"), "right") // empty clusters still emit
      .select(col("cluster"),
        coalesce(col("n_members"), lit(0L)).as("n_members"),
        coalesce(col("inertia"), lit(0L)).as("inertia"),
        col("centroid_fp"))
  }

  /** The training loop shared by the summary and assignment surfaces:
    * final (id, q, cid, dist) assignment + post-update centroids.
    * `literalAssignMaxK` is a test seam (ClusterSpec forces the join
    * path at small k to prove path parity); production callers leave
    * the default. */
  private[graft] def trainInt8(emb: DataFrame, idCol: String, vecCol: String,
                               k: Int, iters: Int,
                               literalAssignMaxK: Int = LiteralAssignMaxK)
      : Trained = {
    require(k > 0 && k <= 4096,
      s"k bounded at 4096 (flat assignment scores all k centroids per row — " +
        s"O(k x dim); shard first beyond this, see kForCorpus); got $k")
    require(iters >= 1 && iters <= 8, s"iters bounded (each is a pass); got $iters")
    val spark = emb.sparkSession

    // global symmetric grid: scale = max |x| / 127 over the corpus
    val gmaxRow = emb.agg(
      max(array_max(transform(col(vecCol), x => abs(x.cast("double"))))).as("m"))
      .head()
    val gmax = if (gmaxRow.isNullAt(0)) 0.0 else gmaxRow.getDouble(0)
    val gscale = if (gmax == 0.0) 1.0 else gmax / 127.0
    // lazily lineage-truncated: q feeds every assignment pass and the
    // final aggregation — without the checkpoint each pass re-runs the
    // scan + quantization chain (same discipline as q_corpus_e2e's
    // Mix-stage boundary)
    val qNarrow = emb.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol),
        x => floor(x.cast("double") / lit(gscale) + lit(0.5)).cast("long")).as("q"))
    // join-path assignment fans each row out k ways, so its work is
    // n x k however few input splits the (small-on-disk, float-packed)
    // embedding parquet arrived in — ONE extra n-row shuffle here
    // spreads the fan-out across the cluster (measured 16x on a
    // single-split x32 corpus). The literal path stays zero-shuffle.
    val q = (if (k > literalAssignMaxK)
               qNarrow.repartition(spark.sparkContext.defaultParallelism)
             else qNarrow)
      .localCheckpoint(false)

    // deterministic init: the k smallest ids' vectors, cluster id by
    // that order (a bounded k-row collect — NOT a sort of the corpus:
    // TakeOrderedAndProject)
    var centroids: IndexedSeq[Seq[Long]] = q.orderBy("id").limit(k)
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toIndexedSeq: Seq[Long]).toIndexedSeq
    require(centroids.nonEmpty, "empty input")

    // narrow argmin map against the centroid literals: k scored
    // structs, sorted; struct order (dist, cid) breaks ties low.
    // Codegen-tight and zero-shuffle, but the expression tree is
    // k x dim nodes — only used while k <= literalAssignMaxK.
    def assignLiteral(cents: IndexedSeq[Seq[Long]]): DataFrame = {
      val scored = array(cents.indices.map { c =>
        struct(
          aggregate(
            zip_with(col("q"), typedlit(cents(c)), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("dist"),
          lit(c).as("cid"))
      }: _*)
      q.withColumn("best", element_at(array_sort(scored), 1))
        .select(col("id"), col("q"),
          col("best.cid").as("cid"), col("best.dist").as("dist"))
    }

    // large-k argmin: explode the k cluster ids per row, broadcast-
    // hash-join the k-row centroid table, take the min per id. Two
    // deliberate scale moves, both measured (an HOF + struct-min
    // draft ran 100x slower at k=1000):
    //  - distance via the NATIVE codegen'd LongVecDot (dist =
    //    aa - 2ab + bb with aa/bb precomputed per row/centroid) —
    //    zip_with/aggregate lambdas are interpreted-eval expressions,
    //    catastrophic at n x k pair counts;
    //  - (dist, cid) PACKED into one long (dist * k + cid, dist >= 0,
    //    cid < k): min(packed) is a primitive hash-aggregate with
    //    map-side combine, where min(struct) falls back to a
    //    SortAggregate that sorts all n x k rows. Packing preserves
    //    the (dist, cid) tie-break exactly; overflow needs
    //    dist * k < 2^63 — int8-grid dist <= dim x 254^2, fine for
    //    any real dim at k <= 4096.
    // Shuffle volume is n rows regardless of k (partial min per
    // partition first). Bit-identical to assignLiteral (spec-proven).
    def assignJoin(cents: IndexedSeq[Seq[Long]]): DataFrame = {
      import spark.implicits._
      import graft.functions.VectorFunctions.vecDotLong
      val kk = cents.size.toLong
      val cdf = broadcast(
        cents.zipWithIndex
          .map { case (cq, c) =>
            (c, cq, graft.functions.LongVecDot.dot(cq.toArray, cq.toArray)) }
          .toDF("cid", "cq", "bb"))
      val best = q
        .withColumn("aa", vecDotLong(col("q"), col("q")))
        .withColumn("cid", explode(sequence(lit(0), lit(cents.size - 1))))
        .join(cdf, "cid")
        .select(col("id"),
          ((col("aa") - lit(2L) * vecDotLong(col("q"), col("cq")) + col("bb"))
            * lit(kk) + col("cid")).as("packed"))
        .groupBy("id").agg(min(col("packed")).as("packed"))
      q.join(best, "id")
        .select(col("id"), col("q"),
          (col("packed") % kk).cast("int").as("cid"),
          // integer `div`, not `/` (which is double division — lossy
          // past 2^53; packed stays exact as a long throughout)
          expr(s"packed div ${kk}L").as("dist"))
    }

    def assign(cents: IndexedSeq[Seq[Long]]): DataFrame =
      if (cents.size <= literalAssignMaxK) assignLiteral(cents) else assignJoin(cents)

    var assigned: DataFrame = null
    var assignCentroids: IndexedSeq[Seq[Long]] = centroids
    for (_ <- 1 to iters) {
      assignCentroids = centroids
      // lazily checkpointed: the update's collect below materializes
      // the assignment, and the final membership/inertia aggregation
      // reuses the checkpointed RDD instead of re-running the argmin
      // map — which also keeps Catalyst from pushing the argmin
      // lambda chain into an inferred isnotnull Filter under the
      // output join (the interpreted re-derivation PlanAuditSpec
      // gates against)
      assigned = assign(centroids).localCheckpoint(false)
      // ONE shuffle: (cid, pos) partial-agg; k x dim reduced rows
      val sums = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byC = sums.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byC.get(c) match {
          case Some(rows) =>
            val dim = centroids(c).length
            val arr = new Array[Long](dim)
            rows.foreach { r =>
              arr(r.getInt(1)) =
                math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
            }
            arr.toSeq
          case None => centroids(c) // empty cluster: keep previous
        }
      }
    }

    Trained(assigned, assignCentroids, centroids)
  }
}

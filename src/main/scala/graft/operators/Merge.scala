package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE / upsert without a transactional table format.
  *
  * The reference reprocesses whole releases; an incremental 100 TB
  * pipeline instead merges a (small) change set into a (huge) target
  * snapshot. Formulated as anti-join + union — ONE shuffle of each
  * side on the key — rather than the full-outer-join-with-per-column
  * coalesce formulation, which shuffles the same data but then drags
  * every column through null-merge expressions.
  *
  * At scale the target side should be bucketed on the key so the
  * anti-join co-locates and only the change set shuffles.
  */
object Merge {

  /** Upsert: rows of `updates` replace same-key rows of `target`;
    * new keys are appended. Schemas must match by name; `updates`
    * must be unique per key (duplicate change rows would all land —
    * dedupe the change set first, e.g. keep-latest by a ts column). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    target.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Change-data-capture apply: `changes` carries `opCol` with
    * 'upsert' or 'delete'. Deletes remove the key from the target;
    * everything else (including a malformed NULL op) is treated as an
    * upsert — the null-SAFE comparison matters: a plain `=!= "delete"`
    * filter is NULL for NULL ops, which would drop the row from the
    * upsert set while its key still anti-joins the target row away,
    * silently deleting it. */
  def applyChanges(target: DataFrame, changes: DataFrame, keys: Seq[String],
                   opCol: String = "_op"): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    val ups = changes.filter(!(col(opCol) <=> "delete")).drop(opCol)
    target.join(touched, keys, "left_anti").unionByName(ups)
  }

  /** Compact an ORDERED changelog to last-writer-wins per key — the
    * step between [[applyChanges]] (which requires a pre-deduped
    * change set) and a raw CDC stream, where one batch can carry many
    * ops for the same key (insert → update → … → delete) and only the
    * LAST one may decide. `orderCols` must totally order events within
    * a key (e.g. ts + a unique event id as the tie-break) or the
    * "last" row is nondeterministic — the same requirement a log
    * replayer has. One key-partitioned streaming row_number — a single
    * key-keyed shuffle, no buffering beyond the sort.
    *
    * The `orderCols` are DROPPED from the output (they are log
    * bookkeeping, not payload — [[applyChanges]] upserts the survivors
    * into a target that does not carry them). A caller whose payload
    * column doubles as an order column, or who wants the winning
    * version for audit, should use [[mergeVersioned]], which retains
    * its versionCols. */
  def compactLog(log: DataFrame, keys: Seq[String],
                 orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must totally order a key's events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop((orderCols :+ "__rn"): _*)
  }

  /** CDC apply at a batch boundary: compact the ordered log
    * ([[compactLog]]), then merge the survivors into the snapshot
    * ([[applyChanges]]) — a key whose last op is 'delete' vanishes,
    * any other last op upserts its row. The whole thing is two
    * key-keyed shuffles of the (small) log plus one of the target —
    * at scale the target side should be bucketed on the key so only
    * the log moves. */
  def applyCdcLog(target: DataFrame, log: DataFrame, keys: Seq[String],
                  orderCols: Seq[String], opCol: String = "_op"): DataFrame =
    applyChanges(target, compactLog(log, keys, orderCols), keys, opCol)

  /** Version-aware merge for OUT-OF-ORDER CDC (the micro-batch form:
    * a stream delivers change batches in arrival order, which is not
    * version order). State and batch share one schema (keys, payload,
    * `opCol`, `versionCols`); the merge keeps, per key, the row with
    * the highest version — INCLUDING tombstones, which must be
    * RETAINED in state (reads go through [[readView]]): dropping a
    * tombstone row would let a late-arriving OLDER update resurrect
    * the deleted key. Because max-by-version is associative and
    * commutative (versionCols must totally order a key's changes),
    * ANY batching of the same log folds to the same state — the
    * property that makes the streaming apply idempotent and
    * replay-safe. One key-keyed shuffle per merge; at scale state is
    * bucketed on the key and tombstones age out by a version floor. */
  def mergeVersioned(state: DataFrame, batch: DataFrame, keys: Seq[String],
                     versionCols: Seq[String]): DataFrame = {
    require(versionCols.nonEmpty, "versionCols must totally order a key's changes")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(versionCols.map(c => col(c).desc): _*)
    state.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The live-rows view over a [[mergeVersioned]] state: tombstones
    * filtered, bookkeeping columns dropped. */
  def readView(state: DataFrame, versionCols: Seq[String],
               opCol: String = "_op"): DataFrame =
    state.filter(!(col(opCol) <=> "delete")).drop((opCol +: versionCols): _*)

  /** Tombstone TTL for a [[mergeVersioned]] state (VERDICT r16 #5):
    * without compaction an infinite CDC stream grows state without
    * bound — every deleted key keeps its tombstone row forever. This
    * drops tombstones whose version is STRICTLY BELOW `versionFloor`;
    * live rows are always retained regardless of version.
    *
    * Correctness contract: the floor must be a WATERMARK — a version
    * the source guarantees no future change will precede (e.g. the
    * CDC reader's low-watermark offset, or now − max allowed
    * lateness). Above the floor nothing changes: a retained tombstone
    * still beats any older late update ([[mergeVersioned]]'s
    * max-by-version keeps the tombstone, non-resurrection holds).
    * Below it the tombstone is gone, so a late update OLDER than an
    * expired tombstone WOULD resurrect the key — which is exactly the
    * event the watermark promises cannot arrive. Expiring at an
    * un-promised floor is data loss, the same trade every watermarked
    * streaming state store makes.
    *
    * `versionExpr` is compared as a single orderable expression —
    * for multi-column versions pass the dominant column (a monotone
    * ts) or a struct(...) of the full version. Pure narrow filter: no
    * shuffle, composes with the bucketed-state layout at any scale. */
  def expireTombstones(state: DataFrame, versionExpr: org.apache.spark.sql.Column,
                       versionFloor: org.apache.spark.sql.Column,
                       opCol: String = "_op"): DataFrame =
    state.filter(!(col(opCol) <=> "delete") || versionExpr >= versionFloor)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Sequence packing: assemble documents into fixed token-budget
  * training rows (context-window assembly) — the natural consumer of
  * exact BPE token counts ([[Tokenize.bpeCounts]]). Greedy first-fit
  * over a deterministic document order.
  *
  * Scale posture: documents shard on an md5-DERIVED VALUE
  * ([[Shard.md5Shard]]) into a FIXED number of shards (not the
  * session's parallelism — the output must not depend on cluster
  * size), sort within each shard by md5 order, and pack per-shard with
  * zero cross-shard coordination — embarrassingly parallel, one
  * shuffle total. Per-shard state is the open-bin list, capped at
  * `maxOpenBins` (first-fit over an unbounded list is quadratic; when
  * the cap is hit the FULLEST bin is retired, which is also the bin
  * least likely to fit anything again). Only (id, token count) ride
  * the shuffle — never the text.
  *
  * Determinism: output is a pure function of (data, maxTokens,
  * numShards, maxOpenBins) — the shard id in `bin_id` is the md5
  * value itself, NOT the physical partition id, so the result is
  * identical under any partitioner, engine hash function, or cluster
  * size (several md5 shards may co-reside in one task; the fold
  * resets per shard). Oversize docs (n > maxTokens) pack alone into
  * their own flagged bin rather than being silently dropped or
  * truncated — the caller decides the truncation policy.
  */
object Pack {

  /** @param docs      input with a unique id column and a token count column
    * @param maxTokens bin budget (e.g. a context window)
    * @param numShards fixed shard count (output-stable, NOT cluster-derived)
    * @return one row per bin: (bin_id, n_docs, total_tokens, fill_ratio,
    *         oversize, doc_ids) — doc_ids comma-joined in pack order */
  def sequences(docs: DataFrame, idCol: String, tokenCol: String,
                maxTokens: Int, numShards: Int = 16,
                maxOpenBins: Int = 256): DataFrame = {
    require(maxTokens > 0 && numShards > 0 && maxOpenBins > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val prepared = docs
      .select(col(idCol).cast("long").as("id"),
        col(tokenCol).cast("int").as("n_tok"),
        md5(col(idCol).cast("string")).as("__ord"),
        Shard.md5Shard(col(idCol).cast("string"), numShards).as("__shard"))
      .repartition(numShards, col("__shard"))
      .sortWithinPartitions("__shard", "__ord")
      .as[(Long, Int, String, Int)]

    prepared.mapPartitions { it =>
      // per-md5-shard greedy fold; state resets at each shard boundary
      // (a physical partition may carry several md5 shards)
      var shard = -1L
      final class Bin(val seq: Long) {
        var used = 0
        val ids = new mutable.ArrayBuffer[Long]()
        def row(over: Boolean): (Long, Int, Int, Double, Boolean, String) =
          ((shard << 32) | seq, ids.length, used,
            used.toDouble / maxTokens, over, ids.mkString(","))
      }
      val open = new mutable.ArrayBuffer[Bin]()
      val done = new mutable.ArrayBuffer[(Long, Int, Int, Double, Boolean, String)]()
      var nextSeq = 0L
      def newBin(): Bin = { val b = new Bin(nextSeq); nextSeq += 1; open += b; b }
      def flush(): Unit = { open.foreach(b => done += b.row(over = false)); open.clear() }
      it.foreach { case (id, nTokRaw, _, sh) =>
        if (sh.toLong != shard) { flush(); shard = sh.toLong; nextSeq = 0L }
        val n = math.max(nTokRaw, 0)
        if (n > maxTokens) {
          // oversize: its own flagged bin, never mixed
          val b = new Bin(nextSeq); nextSeq += 1
          b.used = n; b.ids += id
          done += b.row(over = true)
        } else {
          var placed = false
          var i = 0
          while (!placed && i < open.length) {
            val b = open(i)
            if (b.used + n <= maxTokens) { b.used += n; b.ids += id; placed = true }
            i += 1
          }
          if (!placed) {
            if (open.length >= maxOpenBins) {
              val fullest = open.maxBy(_.used)
              done += fullest.row(over = false)
              open -= fullest
            }
            val b = newBin(); b.used = n; b.ids += id
          }
        }
      }
      flush()
      done.iterator
    }.toDF("bin_id", "n_docs", "total_tokens", "fill_ratio", "oversize", "doc_ids")
  }

  /** Materialize the packed TRAINING ROWS: join each bin's members
    * back to their token arrays and flatten in pack order — the
    * concatenated context-window content a trainer consumes.
    *
    * Scale: bins carry only ids; the wide token payload joins in by id
    * (one shuffle) and the order-preserving reassembly is
    * sort_array(collect_list(struct(pos, tokens))) + flatten — the
    * same sorted-collect discipline as the wide-doc assembly queries.
    *
    * @param tokens (idCol, tokCol array) — e.g. [[Tokenize.bpeEncode]] output
    * @return (bin_id, n_docs, total_tokens, input_tokens) */
  def withTokens(bins: DataFrame, tokens: DataFrame,
                 idCol: String, tokCol: String): DataFrame = {
    val members = bins.select(col("bin_id"), col("n_docs"), col("total_tokens"),
        posexplode(split(col("doc_ids"), ","))).toDF(
        "bin_id", "n_docs", "total_tokens", "pos", "doc_id_str")
      .select(col("bin_id"), col("n_docs"), col("total_tokens"), col("pos"),
        col("doc_id_str").cast("long").as("__id"))
    // merge hint: the token-array side scales with the corpus, but its
    // column-pruned size ESTIMATE looks broadcastable to the static
    // planner (measured: a growing multi-hundred-MB broadcast at x10 —
    // a deferred driver OOM). Pin the sort-merge join the scaladoc
    // promises; both sides shuffle on __id and stay spillable.
    members
      .join(tokens.select(col(idCol).cast("long").as("__id"), col(tokCol).as("__toks"))
        .hint("merge"), "__id")
      .groupBy("bin_id", "n_docs", "total_tokens")
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("pos"), col("__toks")))),
        s => s.getField("__toks"))).as("input_tokens"))
  }

  /** Corpus-level packing efficiency: bins, docs, mean fill, waste. */
  def fillStats(bins: DataFrame, maxTokens: Int): DataFrame =
    bins.agg(
      count(lit(1)).as("n_bins"),
      sum(col("n_docs").cast("long")).as("n_docs"),
      sum(col("total_tokens").cast("long")).as("total_tokens"),
      round(avg(when(!col("oversize"), col("fill_ratio"))), 6).as("mean_fill"),
      sum(when(!col("oversize"), lit(maxTokens) - col("total_tokens"))
        .otherwise(lit(0)).cast("long")).as("wasted_tokens"))
}

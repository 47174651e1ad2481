package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Output sharding for very large writes: assign each row a
  * deterministic, engine-portable shard id, then co-locate rows per
  * shard. The reference partitions its loader outputs by job-fixed
  * keys (Luigi target paths); a 100 TB training-data write instead
  * wants content-addressed shards that any downstream engine can
  * recompute — hence md5 (portable) rather than Spark's internal
  * Murmur3 (`hash()`), which other engines can't reproduce.
  */
object Shard {

  /** Deterministic shard id in [0, n): first md5 byte of the key's
    * string form, mod n. One byte bounds n at 256; wider fan-outs
    * should shard hierarchically (byte1/byte2 directory levels) so
    * file listings stay bounded at every level. NULL keys fold to the
    * empty string — every row gets a real shard (a NULL shard would
    * land under the default partition and corrupt the layout). */
  def md5Shard(key: Column, n: Int): Column = {
    require(n > 0 && n <= 256, s"md5Shard uses one hash byte; n must be in 1..256, got $n")
    (conv(substring(md5(coalesce(key.cast("string"), lit(""))), 1, 2), 16, 10).cast("int") % n)
  }

  /** Co-locate rows of one shard into one task (and so one output file
    * per shard under a plain write): the write-planning step. */
  def repartitionByShard(df: DataFrame, key: Column, n: Int): DataFrame =
    df.withColumn("shard", md5Shard(key, n)).repartition(n, col("shard"))
}

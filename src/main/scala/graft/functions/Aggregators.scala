package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed custom aggregators (org.apache.spark.sql.expressions.Aggregator):
  * the Spark-native way to add an aggregate the built-ins lack — the
  * reduce/merge split makes them partial-aggregation friendly, so the
  * map side combines before the shuffle exactly like built-in aggs
  * (unlike a collect-then-fold, which ships every row).
  */
object Aggregators {

  /** Exact weighted mean over (value_cents, weight_cents) pairs.
    *
    * State is a pair of long sums (Σ v·w, Σ w) — integer arithmetic, so
    * the result is bit-identical under any partitioning / merge order
    * (a double-state weighted mean is not). Magnitude: cents × cents
    * products stay far inside Long for realistic money×quantity ranges;
    * the final division is the only floating-point step.
    */
  object WeightedMeanCents extends Aggregator[(Long, Long), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Long, Long)): Double =
      if (r._2 == 0L) Double.NaN
      else r._1.toDouble / r._2.toDouble / 100.0 // cents² / cents → dollars
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

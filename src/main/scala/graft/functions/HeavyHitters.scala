package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a NATIVE Catalyst aggregate
  * (`TypedImperativeAggregate`): at most `k` counters of fixed size
  * ride the partial-aggregation path, so corpus-wide frequent-item
  * detection costs ONE map-side pass plus a k-sized merge per
  * partition — the scale alternative to q_vocab_stats' exact
  * word-count shuffle when only the head matters (stopword/
  * boilerplate screens, skew-key discovery before a join).
  *
  * Guarantees (the classical ones, spec-checked in StatsSpec):
  *  - estimates NEVER overcount: est(x) <= true(x);
  *  - undercount is bounded: true(x) - est(x) <= n/(k+1) where n is
  *    the total weight seen — so every item with true frequency
  *    > n/(k+1) is guaranteed present in the summary;
  *  - summaries MERGE with the same bound (Agarwal et al.,
  *    "Mergeable Summaries": add counters, then subtract the
  *    (k+1)-largest count and drop non-positives).
  *
  * Exact counts for the surviving candidates are one cheap
  * `isin`-filtered pass if needed — the sketch finds the head, the
  * follow-up pass makes it exact (q_heavy_hitters composes both).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, "MisraGries requires k >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"misra_gries requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est_count", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Stream update: +1 for the item; when the buffer is full and the
    * item is new, decrement every counter instead (the Misra–Gries
    * step) and drop zeros. */
  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k => buf.update(item, 1L)
        case None =>
          val dead = mutable.ArrayBuffer[String]()
          buf.foreach { case (key, c) =>
            if (c == 1) dead += key else buf.update(key, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  /** Mergeable-summaries merge: add counters, then compress back to
    * k by subtracting the (k+1)-th largest count from all. */
  override def merge(b1: mutable.HashMap[String, Long],
                     b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer[String]()
      b1.foreach { case (key, c) =>
        if (c - cut <= 0) dead += key else b1.update(key, c - cut)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  /** Output ordered by (est_count desc, item) — deterministic for a
    * GIVEN summary (the summary itself, like any Misra–Gries sketch,
    * depends on merge order at the margins). */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, c) => (-c, item) }
    new GenericArrayData(sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    })
  }

  // length-prefixed raw UTF-8, NOT writeUTF: modified-UTF-8 caps a
  // string at 65535 encoded bytes and would crash the partial-buffer
  // shuffle on the first document-length item
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object HeavyHitters {
  /** Column API: `misraGries(col, k)` aggregates to
    * array<struct<item, est_count>>. */
  def misraGries(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(c), k).toAggregateExpression())
}

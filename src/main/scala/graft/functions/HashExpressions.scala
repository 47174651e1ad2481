package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** One-pass sketch expressions over token/shingle arrays.
  *
  * The builtin-HOF formulations (nested transform/aggregate/zip_with)
  * allocate a lambda frame per element per hash — for a 32-hash
  * MinHash over ~100 shingles that is ~3200 boxed evaluations per
  * row. These expressions do the same math in one primitive loop.
  * (Catalyst Expression > UDF: no Row conversion, operates on
  * UTF8String bytes directly.)
  */
object SketchHash {
  /** xxh64-style avalanche over a murmur3 base hash + seed — cheap,
    * well-mixed, deterministic across runs/JVMs. */
  @inline def seededHash(s: UTF8String, seed: Int): Long = {
    val base = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42 + seed)
    var h = base.toLong * 0x9E3779B97F4A7C15L + (seed.toLong << 32)
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^ (h >>> 33)
  }
}

/** MinHash signature: for each of `numHashes` seeded hash functions,
  * the minimum over the input array<string> of shingles. Output
  * array<long> of length numHashes; null input → null.
  *
  * Codegen'd (not CodegenFallback): the generated code calls the
  * static one-pass loop, so the sketch participates in whole-stage
  * codegen — no interpreted expression-tree walk per row. The output
  * is never null for a non-null input, so the inherited nullability
  * is correct and the generated isNull slot is never assigned (the
  * FloatVecDot lesson). */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"MinHashSig requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $numHashes);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  /** One primitive pass: numHashes seeded mins over the shingle set.
    * Static and Java-callable so generated code can invoke it. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = SketchHash.seededHash(s, k)
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash over an array<string> of tokens: counter per bit,
  * +1/-1 by the bit of the token hash, sign → bit. Codegen'd via a
  * static-call body, like [[MinHashSig]]. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"SimHash64 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  /** One primitive pass; returns the packed 64-bit signature. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SketchHash.seededHash(arr.getUTF8String(i), 0)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** 60-bit ENGINE-PORTABLE SimHash over an array<string> of tokens:
  * per-token hash = first 15 hex chars of md5 (exactly Spark's
  * `conv(substring(md5(t),1,15),16,10)` and DuckDB's md5 hex-parse —
  * the cross-engine contract q_dedup_simhash_verify's oracle
  * replays), votes packed the same way as [[SimHash64]]. One-pass
  * codegen'd static loop — replaces a 60× row fan-out + (id,bit)
  * shuffle formulation that measured ~16 s at sf0.1 with a narrow
  * map. */
case class Md5SimHash60(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"Md5SimHash60 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(Md5SimHash60.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5SimHash60.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5SimHash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex nibbles of md5(utf8 bytes) as a 60-bit long —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`. */
  def hash60(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 52) | ((b(1) & 0xFFL) << 44) | ((b(2) & 0xFFL) << 36) |
      ((b(3) & 0xFFL) << 28) | ((b(4) & 0xFFL) << 20) | ((b(5) & 0xFFL) << 12) |
      ((b(6) & 0xFFL) << 4) | ((b(7) & 0xF0L) >>> 4)
  }

  /** One primitive pass; duplicates vote once each (standard simhash
    * weighting), same convention as [[SimHash64]]. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash60(arr.getUTF8String(i))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

object HashFunctions {
  def minhashSig(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(c), numHashes))

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  def md5simhash60(c: Column): Column =
    GraftBridge.column(Md5SimHash60(GraftBridge.expression(c)))
}

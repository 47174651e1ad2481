package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native replacements for the hot per-row chains in
  * [[graft.operators.Cleaning]] (VERDICT r15 next-round #2/#3):
  *
  *  - [[DecodeEntitiesExpr]] replaces the 196-step sequential literal
  *    `replace` chain (5 base entities + 188 ASCII NCR forms + 3
  *    `&`-producers). The chain costs up to 196 full-string scans and
  *    intermediate allocations PER ROW — measured 1.46-of-linear at
  *    ×32 on q_main_content (GC pressure, the slowest row in the r15
  *    scale matrix). The scanner below does the same decode in one
  *    pass over the bytes with two allocations.
  *  - [[MainContentBlocksExpr]] replaces the per-block regex scoring
  *    of extractMainContent (block split + 5 regex scans per block +
  *    a struct-array HOF chain) with two scans per block.
  *
  * Both are EXACT re-implementations: the DuckDB oracle keeps
  * replaying the generated replace chain / regex formulation, and
  * CleaningExprSpec asserts equality against the original
  * Column-chain implementations on adversarial fixtures and fuzz
  * corpora (the MinHashSig graduation pattern).
  */
object EntityDecode {

  /** Named entities decoded first (`&#39;` kept here for the historic
    * chain order — its duplicate in [[NcrDecodes]] is then a no-op). */
  val BaseEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ")

  /** ASCII-printable numeric character references (32..126, decimal
    * and lowercase-hex forms), DESCENDING code point, `&`-producers
    * (38/x26) deferred to [[AmpEntities]]. Sequential replace is not
    * a one-pass scanner: a decode can in principle forge a later
    * pattern (e.g. `&&#35;60;` → `&#60;` AFTER the 60 step has
    * passed — the forged ref stays literal, which matches one-pass
    * semantics; the ascending order would double-decode it). Out-of-
    * range refs (`&#9999;`) pass through. */
  val NcrDecodes: Seq[(String, String)] =
    (126 to 32 by -1).filter(_ != 38).flatMap { cp =>
      val ch = cp.toChar.toString
      Seq(s"&#$cp;" -> ch, f"&#x$cp%x;" -> ch)
    }

  /** `&`-producing decodes, LAST so no earlier step can see a decoded
    * `&` as the start of a fresh entity (single-pass order). */
  val AmpEntities: Seq[(String, String)] = Seq(
    "&amp;" -> "&", "&#38;" -> "&", "&#x26;" -> "&")

  /** The full ordered chain: Base(0..4), NCR(5..192), Amp(193..195).
    * The `instr(_, "&#")` gate the Column chain wraps around the NCR
    * segment is a pure cost gate — the NCR chain is the identity on a
    * string without `&#`, so the ungated chain is semantically
    * identical. */
  val Chain: IndexedSeq[(String, String)] =
    (BaseEntities ++ NcrDecodes ++ AmpEntities).toIndexedSeq

  private val patBytes: Array[Array[Byte]] =
    Chain.map(_._1.getBytes("US-ASCII")).toArray
  private val outByte: Array[Byte] =
    Chain.map(_._2.head.toByte).toArray

  /** Chain index of the NCR pair for code point `cp` (dec or hex
    * form). NCR order: cp descending 126→32 skipping 38, dec then
    * hex. */
  private def ncrIdx(cp: Int, hex: Boolean): Int = {
    val skipped = if (cp < 38) 1 else 0
    5 + 2 * ((126 - cp) - skipped) + (if (hex) 1 else 0)
  }

  // match packing: bits 0-7 output byte, 8-15 match length,
  // 16-31 primary chain index, 32-47 alt chain index + 1 (0 = none;
  // only `&#39;` has two chain entries: Base idx 3 and its NCR dup)
  @inline private def pack(len: Int, out: Int, idx: Int, alt: Int): Long =
    (out & 0xFFL) | (len.toLong << 8) | (idx.toLong << 16) | (alt.toLong << 32)

  @inline private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else -1

  @inline private def startsWith(b: Array[Byte], n: Int, i: Int, s: String): Boolean = {
    val m = s.length
    if (i + m > n) return false
    var k = 0
    while (k < m) { if (b(i + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  /** Structural pattern match at position `i` (caller guarantees
    * `b(i) == '&'`). Returns -1 or the packed match. At any position
    * at most one chain pattern matches (no chain pattern is a string
    * prefix of another; the `&#39;` Base/NCR duplicate shares one
    * pattern string), so chain priority never arbitrates a position. */
  private def matchAt(b: Array[Byte], n: Int, i: Int): Long = {
    if (i + 1 >= n) return -1L
    if (b(i + 1) == '#') {
      if (i + 2 >= n) return -1L
      if (b(i + 2) == 'x') {
        // lowercase 2-digit hex only — the exact generated forms
        if (i + 5 >= n || b(i + 5) != ';') return -1L
        val h1 = hexVal(b(i + 3)); val h2 = hexVal(b(i + 4))
        if (h1 < 0 || h2 < 0) return -1L
        val cp = h1 * 16 + h2
        if (cp < 32 || cp > 126) -1L
        else pack(6, cp, if (cp == 38) 195 else ncrIdx(cp, hex = true), 0)
      } else {
        // canonical decimal: 2-3 digits, no leading zero
        if (b(i + 2) < '1' || b(i + 2) > '9') return -1L
        var j = i + 2; var cp = 0; var nd = 0
        while (j < n && nd < 4 && b(j) >= '0' && b(j) <= '9') {
          cp = cp * 10 + (b(j) - '0'); nd += 1; j += 1
        }
        if (nd > 3 || j >= n || b(j) != ';' || cp < 32 || cp > 126) -1L
        else {
          val len = nd + 3
          if (cp == 39) pack(len, cp, 3, ncrIdx(39, hex = false) + 1)
          else pack(len, cp, if (cp == 38) 194 else ncrIdx(cp, hex = false), 0)
        }
      }
    } else {
      if (startsWith(b, n, i + 1, "lt;")) pack(4, '<', 0, 0)
      else if (startsWith(b, n, i + 1, "gt;")) pack(4, '>', 1, 0)
      else if (startsWith(b, n, i + 1, "quot;")) pack(6, '"', 2, 0)
      else if (startsWith(b, n, i + 1, "nbsp;")) pack(6, ' ', 4, 0)
      else if (startsWith(b, n, i + 1, "amp;")) pack(5, '&', 193, 0)
      else -1L
    }
  }

  /** Decode = the exact sequential chain. Fast path: one left-to-right
    * scan replacing every structural match (all matches are disjoint —
    * patterns contain `&` only at position 0 and none is a prefix of
    * another), then a verify scan over the output. If the output
    * carries NO residual pattern, the fast result equals the chain
    * result: the chain replaces exactly the original occurrences plus
    * any boundary-forged ones, and a forged pattern (either chain
    * direction) survives into the fast output and trips the verify
    * scan. On residue (forged refs — adversarial, never organic) fall
    * back to the exact sequential chain with a skip-scan that only
    * prices patterns actually present. Java-callable so generated
    * code can invoke it. */
  def decode(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val b = s.getBytes
    var i = 0
    while (i < n && b(i) != '&') i += 1
    if (i >= n) return s
    val out = new Array[Byte](n)
    if (i > 0) System.arraycopy(b, 0, out, 0, i)
    var o = i
    var replaced = false
    while (i < n) {
      val c = b(i)
      if (c == '&') {
        val m = matchAt(b, n, i)
        if (m >= 0L) {
          out(o) = (m & 0xFF).toByte; o += 1
          i += ((m >> 8) & 0xFF).toInt
          replaced = true
        } else { out(o) = c; o += 1; i += 1 }
      } else { out(o) = c; o += 1; i += 1 }
    }
    if (!replaced) return s
    // verify scan: any residual structural match means a ref was
    // forged across a replacement boundary — replay the exact chain
    var j = 0
    while (j < o) {
      if (out(j) == '&' && matchAt(out, o, j) >= 0L)
        return UTF8String.fromBytes(slowChain(b, n))
      j += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** The exact sequential 196-pair chain, pricing only pairs present:
    * one structural scan finds the smallest chain index ≥ `from`
    * present in the string, that single pattern is replaced
    * everywhere (leftmost, non-overlapping — the replace() semantics
    * both engines share), and the scan resumes after it. Skipped
    * pairs are absent so their replace would be the identity; forged
    * refs surface in the rescan with the correct remaining-chain
    * visibility. */
  private def slowChain(b0: Array[Byte], n0: Int): Array[Byte] = {
    var cur = java.util.Arrays.copyOf(b0, n0)
    var from = 0
    while (from < Chain.length) {
      // find min present chain index >= from
      var best = Int.MaxValue
      var i = 0
      val n = cur.length
      while (i < n) {
        if (cur(i) == '&') {
          val m = matchAt(cur, n, i)
          if (m >= 0L) {
            val p = ((m >> 16) & 0xFFFF).toInt
            val a = ((m >> 32) & 0xFFFF).toInt - 1
            if (p >= from && p < best) best = p
            if (a >= 0 && a >= from && a < best) best = a
          }
        }
        i += 1
      }
      if (best == Int.MaxValue) return cur
      cur = replaceAll(cur, patBytes(best), outByte(best))
      from = best + 1
    }
    cur
  }

  /** Leftmost non-overlapping replace of one literal pattern by one
    * byte (all chain outputs are single ASCII bytes). */
  private def replaceAll(b: Array[Byte], pat: Array[Byte], out: Byte): Array[Byte] = {
    val n = b.length; val m = pat.length
    val res = new Array[Byte](n)
    var i = 0; var o = 0
    while (i < n) {
      if (b(i) == pat(0) && i + m <= n && {
            var k = 1; var ok = true
            while (ok && k < m) { ok = b(i + k) == pat(k); k += 1 }
            ok
          }) { res(o) = out; o += 1; i += m }
      else { res(o) = b(i); o += 1; i += 1 }
    }
    java.util.Arrays.copyOf(res, o)
  }
}

/** Codegen'd one-pass entity/NCR decode (see [[EntityDecode.decode]]).
  * string → string; null → null; output never null for non-null
  * input, so the inherited nullSafeCodeGen nullability is correct. */
case class DecodeEntitiesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"DecodeEntitiesExpr requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    EntityDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.EntityDecode.decode($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** jusText-class block scoring in two native scans per block (the
  * regex formulation in [[graft.operators.Cleaning.extractMainContent]]
  * steps 2–5, which it reproduces byte-for-byte — CleaningExprSpec):
  *
  *  - the input (script/style/comment-stripped HTML) splits into
  *    blocks on block-level tags, Java-split semantics (limit -1:
  *    leading/interior/trailing empty segments all kept, `""` is one
  *    segment);
  *  - per block, scan 1 builds the clean text (`<[^>]*>` → space —
  *    an unterminated `<` stays literal — then the explicit
  *    whitespace class collapses to single spaces, trimmed) and its
  *    char count; scan 2 counts the clean chars that survive when
  *    `(?is)<a\b[^>]*>.*?</a>` spans are dropped first;
  *  - a block is kept iff clean chars ≥ minTextChars and anchor chars
  *    (the count difference) ≤ maxLinkPct% of them, integer
  *    cross-multiplied;
  *  - kept clean texts join with single spaces.
  *
  * Returns struct(main_join string, n_blocks int, n_kept int),
  * non-null for non-null input (the caller flattens the struct, so
  * null-struct vs struct-of-nulls is indistinguishable downstream).
  */
case class MainContentBlocksExpr(child: Expression, minTextChars: Int,
                                 maxLinkPct: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("main_join", StringType, nullable = false),
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"MainContentBlocksExpr requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    MainContentBlocks.compute(input.asInstanceOf[UTF8String], minTextChars, maxLinkPct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MainContentBlocks.compute($c, $minTextChars, $maxLinkPct);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MainContentBlocks {

  // the BlockTagSplit tag set, grouped by length for allocation-free
  // membership tests (ASCII, already lowercased by the caller)
  private val tagsByLen: Map[Int, Array[Array[Byte]]] =
    Seq("p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
      "br", "hr", "td", "th", "tr", "table", "thead", "tbody", "section",
      "article", "aside", "header", "footer", "nav", "main", "blockquote",
      "pre", "form")
      .groupBy(_.length)
      .map { case (l, ts) => l -> ts.map(_.getBytes("US-ASCII")).toArray }

  private val maxTagLen = 10 // blockquote

  @inline private def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  @inline private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  /** The explicit Java∩RE2 whitespace class `[ \t\n\f\r\x0B]`. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\f' || b == '\r' || b == 0x0B

  /** Length of the block-tag match starting at `i` (`b(i)=='<'`), or
    * 0. Mirrors `(?i)</?(?:p|div|…)\b[^>]*>`: optional `/`, a tag
    * token whose char after is a non-word byte (token maximality ≡
    * `\b`), then everything to the first `>`. */
  private def blockTagLen(b: Array[Byte], n: Int, i: Int): Int = {
    var k = i + 1
    if (k < n && b(k) == '/') k += 1
    val ts = k
    while (k < n && isWordByte(b(k)) && k - ts <= maxTagLen) k += 1
    val len = k - ts
    if (len == 0 || len > maxTagLen) return 0
    val cands = tagsByLen.getOrElse(len, null)
    if (cands == null) return 0
    var matched = false
    var c = 0
    while (!matched && c < cands.length) {
      val t = cands(c)
      var j = 0; var ok = true
      while (ok && j < len) { ok = lower(b(ts + j)) == t(j); j += 1 }
      matched = ok
      c += 1
    }
    if (!matched) return 0
    // [^>]*> — scan to the first '>'
    var g = k
    while (g < n && b(g) != '>') g += 1
    if (g >= n) 0 else g - i + 1
  }

  /** Scan 1 over a block [from,to): emit the clean text (tags→space,
    * ws collapsed, trimmed) into `sb` if non-null; return the clean
    * CHAR count (non-continuation bytes, = UTF8String.numChars). */
  private def cleanScan(b: Array[Byte], from: Int, to: Int,
                        sb: java.io.ByteArrayOutputStream): Int = {
    var i = from
    var pending = false
    var started = false
    var count = 0
    while (i < to) {
      val c = b(i)
      if (c == '<') {
        var g = i + 1
        while (g < to && b(g) != '>') g += 1
        if (g < to) { pending = true; i = g + 1 }
        else {
          // unterminated tag: '<' and the rest are literal
          if (started && pending) { if (sb != null) sb.write(' '); count += 1 }
          pending = false; started = true
          if (sb != null) sb.write(c); count += 1
          i += 1
        }
      } else if (isWs(c)) { pending = true; i += 1 }
      else {
        if (started && pending) { if (sb != null) sb.write(' '); count += 1 }
        pending = false; started = true
        if (sb != null) sb.write(c)
        if ((c & 0xC0) != 0x80) count += 1
        i += 1
      }
    }
    count
  }

  /** The anchor-removal pass `(?is)<a\b[^>]*>.*?</a>` → one space,
    * materialized into `scratch` (returns its length). Runs BEFORE
    * generic tag stripping, exactly like the regex pipeline — the
    * order matters: an earlier unterminated `<` must not swallow an
    * anchor's open tag, and an anchor collapsing to a space can
    * complete a surrounding `<…>` span for the next pass. Unmatched
    * `<a` opens are copied through (the regex fails and retries at
    * the next position). */
  private def stripAnchors(b: Array[Byte], from: Int, to: Int,
                           scratch: Array[Byte]): Int = {
    var i = from
    var o = 0
    while (i < to) {
      var consumed = false
      if (b(i) == '<' && i + 1 < to && (b(i + 1) == 'a' || b(i + 1) == 'A') &&
          (i + 2 >= to || !isWordByte(b(i + 2)))) {
        var g = i + 2
        while (g < to && b(g) != '>') g += 1
        if (g < to) {
          // .*?</a> — first case-insensitive close after the open
          var e = g + 1
          var close = -1
          while (close < 0 && e + 3 < to) {
            if (b(e) == '<' && b(e + 1) == '/' &&
                (b(e + 2) == 'a' || b(e + 2) == 'A') && b(e + 3) == '>') close = e
            else e += 1
          }
          if (close >= 0) { scratch(o) = ' '; o += 1; i = close + 4; consumed = true }
        }
      }
      if (!consumed) { scratch(o) = b(i); o += 1; i += 1 }
    }
    o
  }

  /** Split on block tags, score each block, join the keepers — the
    * whole HOF chain in one walk. Java-callable for generated code. */
  def compute(s: UTF8String, minTextChars: Int, maxLinkPct: Int): InternalRow = {
    val b = s.getBytes
    val n = b.length
    val joined = new java.io.ByteArrayOutputStream(math.min(n, 256))
    val block = new java.io.ByteArrayOutputStream(256)
    // anchor-removal scratch, shared across blocks (output ≤ input)
    val scratch = new Array[Byte](n)
    var nBlocks = 0
    var nKept = 0
    var segStart = 0
    var i = 0
    var done = false
    while (!done) {
      // find next block tag at or after i
      var tagAt = -1; var tagLen = 0
      var j = i
      while (tagAt < 0 && j < n) {
        if (b(j) == '<') {
          val l = blockTagLen(b, n, j)
          if (l > 0) { tagAt = j; tagLen = l }
        }
        j += 1
      }
      val segEnd = if (tagAt >= 0) tagAt else n
      block.reset()
      val cleanLen = cleanScan(b, segStart, segEnd, block)
      nBlocks += 1
      if (cleanLen >= minTextChars) {
        val m = stripAnchors(b, segStart, segEnd, scratch)
        val linkChars = cleanLen - cleanScan(scratch, 0, m, null)
        if (linkChars * 100L <= cleanLen.toLong * maxLinkPct) {
          if (nKept > 0) joined.write(' ')
          block.writeTo(joined)
          nKept += 1
        }
      }
      if (tagAt < 0) done = true
      else { segStart = tagAt + tagLen; i = segStart }
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(joined.toByteArray), nBlocks, nKept))
  }
}

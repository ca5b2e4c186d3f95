package graft.functions

import org.apache.spark.sql.{Column, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined anchor scan for exact-substring dedup
  * ([[graft.dedup.Dedup.substringDedup]]): ONE pass over a document
  * emits the ~len/16 window-anchor positions as ARRAY<INT>, replacing
  * the explode-a-row-per-character pipeline (len rows, a len-sized
  * `sequence` array per document, one UTF8String slice + hex-string
  * md5 + substring compare per position) with a tight byte-array loop
  * — the codegen'd scan the substringDedup docstring promises.
  *
  * Two anchor predicates, same selection density (1/16):
  *  - `md5` — md5(gram)'s low nibble == 0: EXACTLY the predicate the
  *    DuckDB oracle computes (`substring(md5(substring(text,oi,g)),32,1)
  *    = '0'`), which is what keeps the operator oracle-checkable; the
  *    per-position digest remains, but over raw bytes with a reused
  *    thread-local MessageDigest and no row or string materialization.
  *  - `poly` — a Karp–Rabin ROLLING polynomial over the gram's bytes
  *    (O(1) per position: subtract the outgoing byte's term, multiply,
  *    add the incoming byte) finished with murmur's fmix64 before the
  *    density test, so low-entropy grams still select uniformly. The
  *    100 TB production path: ~30 ns/position of pure arithmetic vs a
  *    digest call, same alignment-invariance property (anchors are a
  *    pure function of local content), different anchor SET — so it is
  *    deliberately NOT the gate predicate.
  *
  * Positions are 1-based CHARACTER indices in [1, len−winLen+1], the
  * contract of SQL `substring` on both engines; non-ASCII text walks
  * code-point starts so char and byte offsets stay aligned. */
case class ContentAnchors(child: Expression, gram: Int, winLen: Int,
                          mode: String)
    extends UnaryExpression {
  require(gram > 0 && winLen >= gram, "need winLen >= gram > 0")
  require(mode == "md5" || mode == "poly", s"unknown anchor mode $mode")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"content_anchors needs STRING input, got ${child.dataType}")

  private val poly = mode == "poly"

  override def nullSafeEval(t: Any): Any =
    AnchorScan.scan(t.asInstanceOf[UTF8String], gram, winLen, poly)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call keeps the stage inside whole-stage codegen while
    // the digest loop lives in compiled Scala (inlining a MessageDigest
    // loop into generated Java buys nothing — the digest dominates)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AnchorScan.scan($c, $gram, $winLen, $poly);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AnchorScan {
  private val localMd5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** murmur3 fmix64 — full-avalanche finisher over the rolling hash. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private val P = 1000000007L

  /** One-pass anchor scan (see [[ContentAnchors]]); public + static so
    * generated code calls it directly. */
  def scan(t: UTF8String, gram: Int, winLen: Int, poly: Boolean): GenericArrayData = {
    val nChars = t.numChars()
    if (nChars < winLen) return new GenericArrayData(Array.emptyIntArray)
    val bytes = t.getBytes
    // char k starts at offs(k); ASCII skips the table (identity)
    val offs: Array[Int] =
      if (bytes.length == nChars) null
      else {
        val o = new Array[Int](nChars + 1)
        var b = 0
        var k = 0
        while (k < nChars) {
          o(k) = b
          b += UTF8String.numBytesForFirstByte(bytes(b))
          k += 1
        }
        o(nChars) = bytes.length
        o
      }
    @inline def off(k: Int): Int = if (offs == null) k else offs(k)
    val last = nChars - winLen // inclusive 0-based last anchor start
    val acc = new scala.collection.mutable.ArrayBuilder.ofInt
    acc.sizeHint(nChars / 12)
    if (poly) {
      // p^(gram_bytes-1) must track the BYTE width of the gram, which
      // varies on non-ASCII text — recompute per position only when the
      // width changes; ASCII keeps the hot O(1) roll.
      var h = 0L
      var width = -1
      var pTop = 0L
      var i = 0
      while (i <= last) {
        val lo = off(i)
        val hi = off(i + gram)
        val w = hi - lo
        if (w != width) { // first position or width change: full recompute
          width = w
          pTop = 1L
          var j = 1
          while (j < w) { pTop *= P; j += 1 }
          h = 0L
          var b = lo
          while (b < hi) { h = h * P + (bytes(b) & 0xffL); b += 1 }
        }
        if ((fmix64(h) >>> 60) == 0L) acc += (i + 1)
        // roll to the next position (skipped when the width changes
        // next round anyway — the recompute branch rebuilds h)
        if (i < last) {
          val nLo = off(i + 1)
          val nHi = off(i + 1 + gram)
          if (nHi - nLo == w) {
            h = (h - (bytes(lo) & 0xffL) * pTop) * P + (bytes(nHi - 1) & 0xffL)
            // multi-byte boundary chars shift lo by >1 byte: only the
            // 1-byte-step roll is valid; otherwise recompute
            if (nLo != lo + 1 || nHi != hi + 1) width = -1
          } else width = -1
        }
        i += 1
      }
    } else {
      val md = localMd5.get()
      var i = 0
      while (i <= last) {
        md.update(bytes, off(i), off(i + gram) - off(i))
        val d = md.digest() // digest() resets for the next position
        if ((d(15) & 0x0f) == 0) acc += (i + 1)
        i += 1
      }
    }
    new GenericArrayData(acc.result())
  }
}

object AnchorExprs {
  /** Column API: 1-based anchor positions of `winLen`-char windows
    * whose leading `gram`-char gram passes the md5 low-nibble test —
    * the oracle-shared predicate of [[graft.dedup.Dedup.substringDedup]]. */
  def md5Anchors(text: Column, gram: Int, winLen: Int): Column =
    GraftInternal.column(
      ContentAnchors(GraftInternal.expression(text), gram, winLen, "md5"))

  /** Column API: the Karp–Rabin rolling-hash anchor set (production
    * predicate — NOT oracle-shared; see [[ContentAnchors]]). */
  def polyAnchors(text: Column, gram: Int, winLen: Int): Column =
    GraftInternal.column(
      ContentAnchors(GraftInternal.expression(text), gram, winLen, "poly"))

  /** Make `content_anchors(text, gram, winLen, mode)` callable from SQL. */
  def register(spark: SparkSession): Unit =
    GraftInternal.registerFunction(spark, "content_anchors", exprs =>
      ContentAnchors(exprs.head,
        exprs(1).eval().asInstanceOf[Int],
        exprs(2).eval().asInstanceOf[Int],
        exprs(3).eval().toString))

  /** Column API: winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003) — the distinct trailing-window minima of the
    * per-position gram hashes, as a sorted ARRAY<BIGINT>. One pass,
    * no per-position rows, no shuffle; see [[WinnowFingerprints]]. */
  def winnow(text: Column, gram: Int, window: Int): Column =
    GraftInternal.column(
      WinnowFingerprints(GraftInternal.expression(text), gram, window))

  /** The winnowing gram hash as SQL TEXT the DuckDB oracle runs
    * verbatim: Σ_j codepoint(char_{i+j}) · (31^j mod 2³¹), all mod
    * 2³¹ — generated from the SAME constants [[WinnowScan]] uses, so
    * the engines cannot drift. `i` is the 1-based position column
    * name; `t` the text column name. */
  def winnowHashSql(t: String, i: String, gram: Int): String = {
    val terms = (0 until gram).map { j =>
      s"CAST(ascii(substring($t, $i + $j, 1)) AS BIGINT) * ${WinnowScan.powMod(j)}"
    }
    s"((${terms.mkString(" + ")}) % ${WinnowScan.M})"
  }
}

/** Winnowing document fingerprints in one codegen-compatible pass:
  * for every gram start position the polynomial codepoint hash (base
  * 31 mod 2³¹ — 16 integer mults, portable to a 16-term SQL sum the
  * oracle runs verbatim), then the minimum over each trailing window
  * of `window` consecutive hashes, deduplicated and sorted. The
  * fingerprint-set property (Schleimer et al. 2003): any shared
  * substring of length ≥ gram+window−1 contributes at least one
  * SHARED fingerprint, so fingerprint overlap lower-bounds substring
  * sharing — the MOSS plagiarism/near-dup primitive. Short docs
  * (< gram chars) fingerprint to the empty array. The expression
  * replaces an explode-per-position + partitioned-window pipeline
  * (O(len) rows through a per-doc shuffle) with a per-row scan whose
  * output is ~len/window values. */
case class WinnowFingerprints(child: Expression, gram: Int, window: Int)
    extends UnaryExpression {
  require(gram > 0 && window > 0, "need gram > 0 and window > 0")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow needs STRING input, got ${child.dataType}")

  override def nullSafeEval(t: Any): Any =
    WinnowScan.scan(t.asInstanceOf[UTF8String], gram, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowScan.scan($c, $gram, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowScan {
  val B = 31L
  val M: Long = 1L << 31

  /** 31^j mod 2³¹ — shared by the Scala scan and the generated oracle
    * SQL ([[AnchorExprs.winnowHashSql]]). */
  def powMod(j: Int): Long = {
    var r = 1L
    var i = 0
    while (i < j) { r = r * B % M; i += 1 }
    r
  }

  /** Modular inverse of B mod 2³¹ (B = 31 is odd, so it exists):
    * makes the gram hash ROLL in O(1) — h_{i+1} = (h_i − cp_i)·B⁻¹ +
    * cp_{i+gram}·B^{gram−1}, all mod 2³¹, which is EXACTLY the
    * per-position polynomial sum (modular identity, not an
    * approximation), so the DuckDB oracle's verbatim 16-term sum
    * still matches hash-for-hash. */
  private val InvB: Long = {
    // Newton–Hensel: x ← x(2 − B·x) doubles the correct low bits per
    // step; x₀ = 1 is correct mod 2 (B odd), 5 steps ⇒ correct mod 2³¹
    val mask = M - 1
    var x = 1L
    var i = 0
    while (i < 5) {
      val t = (2 - B * x) & mask
      x = (x * t) & mask
      i += 1
    }
    require((x * B & mask) == 1L, "InvB: not an inverse")
    x
  }

  /** One-pass winnow (see [[WinnowFingerprints]]); public + static so
    * generated code calls it directly. Codepoint-indexed to match SQL
    * substring/ascii semantics on both engines. r17 constant-factor
    * pass (the sf1 suite leader at 25.9 s): the per-position gram
    * hash ROLLS (2 mults instead of `gram` mults — exact mod-2³¹
    * identity via [[InvB]], oracle-verbatim values unchanged), the
    * trailing-window minimum is a MONOTONIC DEQUE (amortized O(1)
    * instead of rescanning `window` slots), and the distinct set is a
    * HashSet guarded by a same-as-last check, sorted once at the end
    * (winnowing picks the same minimum for runs of positions, so the
    * guard removes most set operations) — output identical. */
  def scan(t: UTF8String, gram: Int, window: Int): GenericArrayData = {
    val cp = t.toString.codePoints().toArray
    val n = cp.length
    if (n < gram) return new GenericArrayData(Array.emptyLongArray)
    val mask = M - 1
    val powTop = powMod(gram - 1)
    val np = n - gram + 1
    // monotonic deque over (hash, position), circular at capacity
    // window+1 (it never holds more than `window` in-window entries):
    // head = the trailing-window minimum
    val cap = window + 1
    val dqV = new Array[Long](cap)
    val dqI = new Array[Int](cap)
    var head = 0
    var tail = 0 // exclusive, both monotone; slot = idx % cap
    val seen = new java.util.HashSet[java.lang.Long]()
    var lastMin = -1L
    var nOut = 0
    var h = 0L
    var k = 0
    while (k < gram) { h = (h + cp(k) * powMod(k)) & mask; k += 1 }
    var i = 0
    while (i < np) {
      // drop entries outside the trailing window [i-window+1, i]
      while (head < tail && dqI(head % cap) <= i - window) head += 1
      // maintain increasing values from head to tail
      while (tail > head && dqV((tail - 1) % cap) >= h) tail -= 1
      dqV(tail % cap) = h; dqI(tail % cap) = i; tail += 1
      val mn = dqV(head % cap)
      if (mn != lastMin) {
        lastMin = mn
        if (seen.add(mn)) nOut += 1
      }
      if (i + 1 < np)
        h = (((h - cp(i)) & mask) * InvB & mask) + cp(i + gram) * powTop & mask
      i += 1
    }
    val out = new Array[Long](nOut)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}

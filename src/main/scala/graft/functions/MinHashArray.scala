package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row MinHash signature: k-wise minimum of seeded md5 hex hashes
  * over an ARRAY<STRING> of shingles, one pass. Value-identical to
  * `array(array_min(transform(g, s -> md5('0:'||s))), …)` — the same
  * seed scheme as [[MinHashAgg]] (its group-level sibling) and the
  * DuckDB oracle — but without materializing k intermediate hash
  * arrays per row.
  */
case class MinHashArray(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Seed prefixes ("<j>:") as UTF-8 bytes, built once per (task-local)
  // expression instance — the digest input `<j>:<gram>` is unchanged.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(j => (j.toString + ":").getBytes("UTF-8"))

  override def nullSafeEval(v: Any): Any = {
    val grams = v.asInstanceOf[ArrayData]
    val n = grams.numElements()
    // Track minima as RAW 16-byte digests (r18): lowercase-hex md5
    // strings order exactly like their digest bytes compared unsigned
    // ('0'<'1'<…<'9'<'a'<…<'f' is monotone in the nibble value), so
    // the min is bit-identical to the former md5Hex/compareTo loop —
    // without the per-gram `"$j:$s"` concat, String→bytes re-encode,
    // hex render, and a fresh MessageDigest per call (k hex renders
    // happen once per ROW at the end, and the gram's UTF-8 bytes come
    // straight off the UTF8String).
    val md = MinHashArray.localMd5.get()
    val mins = new Array[Array[Byte]](k)
    var i = 0
    while (i < n) {
      val sb = grams.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        md.reset()
        md.update(prefixes(j))
        md.update(sb)
        val d = md.digest()
        if (mins(j) == null || MinHashArray.unsignedLess(d, mins(j))) mins(j) = d
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(d =>
      UTF8String.fromString(if (d == null) "" else MinHashArray.hex(d))).asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashArray {
  /** k-seed minhash signature of an ARRAY<STRING> of shingles. */
  def minhashArray(grams: Column, k: Int): Column =
    GraftInternal.column(MinHashArray(GraftInternal.expression(grams), k))

  private[functions] val localMd5 =
    ThreadLocal.withInitial[java.security.MessageDigest](
      () => java.security.MessageDigest.getInstance("MD5"))

  private val HEX = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest — byte-equal to DigestUtils.md5Hex. */
  private[functions] def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic byte compare — for equal-length md5
    * digests this equals comparing their lowercase-hex strings. */
  private[functions] def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }
}

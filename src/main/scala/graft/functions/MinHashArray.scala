package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.commons.codec.digest.DigestUtils

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

  override def nullSafeEval(v: Any): Any = {
    val grams = v.asInstanceOf[ArrayData]
    val n = grams.numElements()
    val mins = new Array[String](k)
    var i = 0
    while (i < n) {
      val s = grams.getUTF8String(i).toString
      var j = 0
      while (j < k) {
        val h = DigestUtils.md5Hex(s"$j:$s")
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(h =>
      UTF8String.fromString(if (h == null) "" else h)).asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashArray {
  /** k-seed minhash signature of an ARRAY<STRING> of shingles. */
  def minhashArray(grams: Column, k: Int): Column =
    GraftInternal.column(MinHashArray(GraftInternal.expression(grams), k))
}

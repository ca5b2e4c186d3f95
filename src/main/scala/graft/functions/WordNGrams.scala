package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles in one native pass — replaces the
  * interpreted `array_distinct(transform(sequence(...), i ->
  * concat_ws(' ', w[i], w[i+1], w[i+2])))` higher-order chain that
  * dominates the shingle-based dedup operators. Set-equal to that
  * chain (same windows incl. the concat_ws null-skip tail behavior,
  * first-occurrence order), so every downstream aggregate —
  * minhash mins, Jaccard counts, band keys — is unchanged.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val len = words.numElements()
    val windows = math.max(len - (n - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < windows) {
      // concat_ws semantics: skip elements beyond the end (nulls)
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = 0
      while (j < n && i + j < len) {
        parts.add(words.getUTF8String(i + j))
        j += 1
      }
      seen.add(UTF8String.concatWs(space, parts.toArray(new Array[UTF8String](parts.size())): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNGrams {
  /** Distinct n-gram shingles of an ARRAY<STRING> of words. */
  def wordNGrams(words: Column, n: Int): Column =
    GraftInternal.column(WordNGrams(GraftInternal.expression(words), n))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * ARRAY<DOUBLE> columns: one fused loop (dot + both norms) inside
  * whole-stage codegen, replacing three interpreted higher-order
  * `aggregate(zip_with(...))` folds. Bit-identical to the HOF form
  * (same left-to-right accumulation order), so the DuckDB oracle math
  * is unchanged — this is purely the hot-path implementation.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(DoubleType, false) || left.dataType == ArrayType(DoubleType, true)) {
      if (right.dataType == ArrayType(DoubleType, false) || right.dataType == ArrayType(DoubleType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right must be array<double>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"left must be array<double>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression packing the SIGNS of the first 64
  * elements of an ARRAY<DOUBLE> into one LONG (bit i set iff
  * element i > 0) — the 1-bit quantization primitive behind the
  * Hamming ANN operators. One tight 64-iteration codegen loop
  * replaces the interpreted `aggregate(zip_with(..., sequence(0,63)))`
  * fold (which materializes two intermediate 64-element arrays per
  * row). Bit-identical to the HOF form: Java's `1L << 63` IS
  * Long.MinValue, the same place value the SQL form adds as a
  * literal, and addition of distinct powers of two is order-free —
  * so the DuckDB oracle math is unchanged; this is purely the
  * hot-path implementation (the CosineSim pattern).
  */
case class PackSignBits(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == ArrayType(DoubleType, false) || child.dataType == ArrayType(DoubleType, true))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"child must be array<double>, got ${child.dataType}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(64, x.numElements())
    var bits = 0L
    var i = 0
    while (i < n) {
      if (x.getDouble(i) > 0) bits |= 1L << i
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      s"""
         |int $n = java.lang.Math.min(64, $a.numElements());
         |long $bits = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getDouble($i) > 0) $bits |= 1L << $i;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  /** Column-facing API: cosine similarity of two ARRAY<DOUBLE>. */
  def cosineSim(a: Column, b: Column): Column =
    GraftInternal.column(CosineSim(
      GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Column-facing API: sign-bit packing of ARRAY<DOUBLE> → LONG. */
  def packSignBits(a: Column): Column =
    GraftInternal.column(PackSignBits(GraftInternal.expression(a)))

  /** Make `cosine_sim(a, b)` callable from SQL on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftInternal.registerFunction(spark, "cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)))
}

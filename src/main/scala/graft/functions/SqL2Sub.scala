package graft.functions

import org.apache.spark.sql.{Column, GraftInternal}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native squared-L2 distance over a 1-based subvector window of two
  * ARRAY<DOUBLE> columns — the product-quantization inner loop (per
  * subspace distance of corpus/query vectors against codebook
  * entries). One fused loop inside whole-stage codegen, replacing the
  * interpreted `aggregate(zip_with(slice, slice, ...))` HOF chain the
  * PQ paths previously evaluated per row-pair. Bit-identical to the
  * HOF form: ascending index order, 0.0 seed, (x−y)·(x−y) per
  * element — so the DuckDB oracle math is unchanged.
  *
  * `len < 0` means "to the end of the shorter array" (the full-vector
  * distance used for IVF cell assignment).
  */
case class SqL2Sub(left: Expression, right: Expression, lo: Int, len: Int)
    extends BinaryExpression {
  require(lo >= 1, "lo is 1-based")

  override def dataType: DataType = DoubleType

  // NULL element semantics match the HOF chain this replaces
  // (aggregate(zip_with(...)): any null element nulls the whole fold)
  // and the DuckDB oracle — so a null element in the window yields a
  // NULL distance, never a silent read-as-zero.
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) =
      dt == ArrayType(DoubleType, false) || dt == ArrayType(DoubleType, true)
    if (!ok(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"left must be array<double>, got ${left.dataType}")
    else if (!ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right must be array<double>, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var end = math.min(x.numElements(), y.numElements())
    if (len >= 0) end = math.min(end, lo - 1 + len)
    var acc = 0.0
    var i = lo - 1
    while (i < end) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val end = ctx.freshName("end")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val clamp =
        if (len >= 0) s"$end = java.lang.Math.min($end, ${lo - 1 + len});" else ""
      // the per-element null branch is emitted only when the array
      // TYPE admits null elements — containsNull=false arrays keep the
      // branch-free hot loop (and `ev.isNull` is a variable exactly
      // when a check is emitted, since nullable covers elemNullable)
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $end = java.lang.Math.min($a.numElements(), $b.numElements());
         |$clamp
         |double $acc = 0.0;
         |for (int $i = ${lo - 1}; $i < $end; $i++) {
         |  $nullCheck
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer sibling of [[SqL2Sub]] over ARRAY<BIGINT>: exact long
  * squared-L2 for the micro-unit k-means loop (quantized vectors).
  * Integer adds are associative, so this is exactly the HOF fold. */
case class SqL2Long(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  // same NULL-element contract as SqL2Sub: null element ⇒ NULL result
  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (!ok(left.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"left must be array<bigint>, got ${left.dataType}")
    else if (!ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"right must be array<bigint>, got ${right.dataType}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SqL2Sub {
  /** Column API: exact long squared-L2 over two ARRAY<BIGINT>. */
  def sqL2Long(a: Column, b: Column): Column =
    GraftInternal.column(SqL2Long(
      GraftInternal.expression(a), GraftInternal.expression(b)))

  /** Column API: squared L2 over the window [lo, lo+len-1] (1-based). */
  def sqL2(a: Column, b: Column, lo: Int, len: Int): Column =
    GraftInternal.column(SqL2Sub(
      GraftInternal.expression(a), GraftInternal.expression(b), lo, len))

  /** Full-vector squared L2 (to the end of the shorter array). */
  def sqL2Full(a: Column, b: Column): Column =
    GraftInternal.column(SqL2Sub(
      GraftInternal.expression(a), GraftInternal.expression(b), 1, -1))
}

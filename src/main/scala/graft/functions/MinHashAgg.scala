package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a distributed aggregate: the k-wise minimum
  * of seeded md5 hashes over a GROUP of rows, in one buffer pass with
  * map-side partial aggregation (Broder 1997 resemblance sketch,
  * lifted from per-document arrays to corpus/group level).
  *
  * Semantics are exactly `array(min(md5('0:'||x)), …, min(md5('k-1:'
  * ||x)))` — the single-buffer form exists so a 100 TB corpus sketch
  * costs one shuffle of k hashes per group, not k separate aggregate
  * plans over the same scan.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): Array[String] = Array.fill[String](k)(null)

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var j = 0
      while (j < k) {
        val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$j:$s")
        if (buf(j) == null || h.compareTo(buf(j)) < 0) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var j = 0
    while (j < k) {
      if (a(j) == null || (b(j) != null && b(j).compareTo(a(j)) < 0)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(h => UTF8String.fromString(if (h == null) "" else h)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { h => out.writeBoolean(h != null); if (h != null) out.writeUTF(h) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(if (in.readBoolean()) in.readUTF() else null)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashAgg {
  /** Column-facing aggregate: k-seed minhash signature of a group. */
  def minhashSig(c: Column, k: Int): Column =
    GraftInternal.column(MinHashAgg(GraftInternal.expression(c), k).toAggregateExpression())
}

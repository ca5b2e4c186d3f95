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
  extends TypedImperativeAggregate[Array[Array[Byte]]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Seed prefixes ("<j>:") as UTF-8 bytes; buffer minima are RAW
  // 16-byte digests (r18) — unsigned byte order equals lowercase-hex
  // order, so update/merge pick the same minima as the former
  // md5Hex/compareTo loop and the hex renders once at eval. See
  // [[MinHashArray]] (the per-row sibling) for the equivalence note.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(k)(j => (j.toString + ":").getBytes("UTF-8"))

  override def createAggregationBuffer(): Array[Array[Byte]] =
    Array.fill[Array[Byte]](k)(null)

  override def update(buf: Array[Array[Byte]], input: InternalRow): Array[Array[Byte]] = {
    val v = child.eval(input)
    if (v != null) {
      val sb = v match {
        case u: UTF8String => u.getBytes
        case other => other.toString.getBytes("UTF-8")
      }
      val md = MinHashArray.localMd5.get()
      var j = 0
      while (j < k) {
        md.reset()
        md.update(prefixes(j))
        md.update(sb)
        val d = md.digest()
        if (buf(j) == null || MinHashArray.unsignedLess(d, buf(j))) buf(j) = d
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Array[Byte]], b: Array[Array[Byte]]): Array[Array[Byte]] = {
    var j = 0
    while (j < k) {
      if (a(j) == null || (b(j) != null && MinHashArray.unsignedLess(b(j), a(j)))) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Array[Byte]]): Any =
    new GenericArrayData(buf.map(d =>
      UTF8String.fromString(if (d == null) "" else MinHashArray.hex(d))))

  override def serialize(buf: Array[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { d =>
      out.writeBoolean(d != null)
      if (d != null) { out.writeInt(d.length); out.write(d) }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n) {
      if (in.readBoolean()) {
        val len = in.readInt()
        val d = new Array[Byte](len)
        in.readFully(d)
        d
      } else null
    }
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

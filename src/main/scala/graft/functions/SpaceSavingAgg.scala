package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a distributed aggregate
  * (Misra/Gries 1982; distributed merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 §3): at most `cap` counters per
  * buffer, so a 100 TB key stream costs one shuffle of `cap` entries
  * per group — the constant-memory answer to "which keys are hot"
  * that the exact groupBy (shuffling every distinct key) cannot give
  * at stream scale. This is the sketch behind skew detection
  * (saltedJoin's hot-key pre-pass at unbounded cardinality),
  * trending-keys dashboards, and frequency-capped sampling.
  *
  * Update: present key +1; room left → insert at 1; full → decrement
  * ALL counters, dropping zeros (the MG step — O(cap) only on
  * eviction). Merge: pointwise sum, then subtract the (cap+1)-largest
  * count and drop ≤0 (the mergeable-summaries reduction). GUARANTEE
  * (order- and partitioning-independent, the part the oracle gate
  * checks): any key with true frequency > N/(cap+1) of an N-item
  * stream is ALWAYS in the final summary; a surviving counter
  * undercounts its true frequency by at most N/(cap+1). The surviving
  * set near the threshold — and each counter's value — may vary with
  * arrival order, so only the guarantee (membership of provably-heavy
  * keys) crosses the oracle boundary.
  */
case class SpaceSavingAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) SpaceSavingAgg.step(buf, v.toString, cap)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > cap) {
      // subtract the (cap+1)-th largest count from all, drop <= 0 —
      // keeps exactly <= cap survivors and preserves the MG bound
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - cap - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val c = a(k) - cut
        if (c <= 0) dead += k else a.update(k, c)
      }
      dead.foreach(a.remove)
    }
    a
  }

  /** Keys only, sorted — the deterministic part is MEMBERSHIP of
    * provably-heavy keys; counts stay inside the buffer (see class
    * doc for why they must not cross the oracle boundary). */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    (0 until n).foreach(_ => m.update(in.readUTF(), in.readLong()))
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object SpaceSavingAgg {
  /** Column-facing aggregate: the ≤`cap`-key MG summary of a group,
    * evaluated to its sorted key set. */
  def heavyKeys(c: Column, cap: Int): Column =
    GraftInternal.column(SpaceSavingAgg(GraftInternal.expression(c), cap).toAggregateExpression())

  /** The ONE MG update step both the aggregate and the local fold
    * run: present key +1; room left → insert at 1; full → decrement
    * all, dropping zeros. */
  private[functions] def step(buf: mutable.HashMap[String, Long],
                              s: String, cap: Int): Unit =
    buf.get(s) match {
      case Some(c) => buf.update(s, c + 1)
      case None if buf.size < cap => buf.update(s, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { k =>
          val c = buf(k) - 1
          if (c <= 0) dead += k else buf.update(k, c)
        }
        dead.foreach(buf.remove)
    }

  /** Test-facing: full (key → residual count) summary via a local
    * fold, for the error-bound property checks. */
  def localSummary(items: Iterator[String], cap: Int): Map[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    items.foreach(step(buf, _, cap))
    buf.toMap
  }
}

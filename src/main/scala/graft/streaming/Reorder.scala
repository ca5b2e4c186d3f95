package graft.streaming

import scala.collection.mutable

/** The ONE bounded-reorder implementation shared by every stateful
  * streaming operator that must restore (approximate) order inside a
  * trigger slice ([[Streams.lateAuditStreaming]],
  * [[Streams.funnelStagesStreaming]], [[Streams.sessionizeStreaming]]),
  * plus the engine-sorted run folder their batch REPLAY forms use.
  * One implementation, one overflow semantic, one spec — instead of
  * three hand-rolled heaps drifting apart.
  *
  * Two regimes, two tools:
  *  - TRUE STREAMING (state-store iterator, unbounded keys): memory
  *    must be O(capacity), so order is restored by [[bounded]] — a
  *    lazy min-heap that is exact only under a displacement bound and
  *    LOUDLY surfaces every violation.
  *  - BATCH REPLAY (the driver-visible oracle-checked form): order
  *    comes from the ENGINE — `repartition(key)` +
  *    `sortWithinPartitions(key, ord…)` (external sort, spills, exact
  *    at ANY disorder) and [[foldRuns]] walks the contiguous per-key
  *    runs with O(1) heap per key. A bounded heap has no business in
  *    a batch replay: the per-group iterator of a batch
  *    flatMapGroupsWithState is concatenated shuffle runs, so an
  *    event's displacement can approach the whole per-key slice and
  *    NO fixed capacity is safe (the r10 funnel defect).
  */
object Reorder {

  /** Bounded streaming reorder: pulls lazily from `in`, holds at most
    * `capacity` elements in a min-heap on `ord`, emits the running
    * minimum. Per-key memory is O(capacity) regardless of slice size.
    *
    * Exactness contract (precise, fence-post included): an element is
    * emitted in order iff FEWER THAN `capacity` later-sorted elements
    * arrive before it — i.e. arrival displacement ≤ capacity − 1.
    * An element popped BELOW an already-emitted element was displaced
    * beyond that bound; it is emitted with `outOfOrder = true`
    * (never dropped, never silently absorbed), or — when `strict` —
    * the pop throws, turning a violated displacement bound into a
    * query failure instead of quietly wrong state downstream. Strict
    * is the right mode when capacity is tied to a watermark contract
    * ("disorder beyond X is impossible upstream"); lenient is the
    * right mode for audit operators that must keep flowing and count.
    */
  def bounded[T](in: Iterator[T], capacity: Int, strict: Boolean = false)
                (implicit ord: Ordering[T]): Iterator[(T, Boolean)] = {
    require(capacity > 0, "reorder capacity must be positive")
    val heap = mutable.PriorityQueue.empty[T](ord.reverse)
    new Iterator[(T, Boolean)] {
      private var hasLast = false
      private var last: T = _
      def hasNext: Boolean = in.hasNext || heap.nonEmpty
      def next(): (T, Boolean) = {
        while (in.hasNext && heap.size < capacity) heap.enqueue(in.next())
        val e = heap.dequeue()
        val ooo = hasLast && ord.lt(e, last)
        if (ooo && strict)
          throw new IllegalStateException(
            s"reorder displacement exceeded capacity $capacity under a strict " +
              "displacement contract: element popped below an already-emitted one")
        if (!ooo) { last = e; hasLast = true }
        (e, ooo)
      }
    }
  }

  /** Fold a partition iterator that the ENGINE already sorted by
    * (key, secondary order) as contiguous per-key runs: `init` state
    * at each key change, `step` per element (emitting ≤ 1 output
    * row), `flush` once when a run ends. Fully lazy — O(1) beyond the
    * caller's state, exact at any disorder because exactness was the
    * sort's job. Intended consumer: `ds.repartition(key)
    * .sortWithinPartitions(key, ord…).mapPartitions(foldRuns(…))`. */
  def foldRuns[T, K, S, O](in: Iterator[T], keyOf: T => K, init: K => S)
                          (step: (K, S, T) => (S, Option[O]))
                          (flush: (K, S) => Option[O]): Iterator[O] =
    new Iterator[O] {
      private val buf = in.buffered
      private var pending: Option[O] = None
      private var open = false
      private var key: K = _
      private var st: S = _
      private def pump(): Unit = {
        while (pending.isEmpty && (buf.hasNext || open)) {
          if (buf.hasNext && (!open || key == keyOf(buf.head))) {
            if (!open) { key = keyOf(buf.head); st = init(key); open = true }
            val e = buf.next()
            val (s2, out) = step(key, st, e)
            st = s2
            pending = out
          } else { // run ended: next key differs, or input exhausted
            pending = flush(key, st)
            open = false
          }
        }
      }
      def hasNext: Boolean = { pump(); pending.isDefined }
      def next(): O = {
        pump()
        val r = pending.getOrElse(throw new NoSuchElementException("foldRuns exhausted"))
        pending = None
        r
      }
    }
}

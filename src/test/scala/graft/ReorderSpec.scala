package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Reorder

/** The shared bounded-reorder/run-fold contract — ONE spec for the
  * helper all three stateful streaming sites consume, pinning the
  * displacement fence-post exactly (capacity − 1 exact, capacity
  * flagged) so the three machines can't drift apart again. */
class ReorderSpec extends AnyFunSuite {

  private def run(in: Seq[Int], cap: Int, strict: Boolean = false) =
    Reorder.bounded(in.iterator, cap, strict)(Ordering.Int).toSeq

  test("in-order input passes through exactly, nothing flagged") {
    val out = run(0 until 100, 4)
    assert(out.map(_._1) == (0 until 100))
    assert(out.forall(!_._2))
  }

  test("displacement == capacity - 1 restores exact order (fence-post)") {
    // element 0 arrives after cap-1 later-sorted elements: with the
    // heap holding cap, 0 is enqueued before the first pop — exact
    val cap = 8
    val in = (1 until cap) ++ Seq(0) ++ (cap until 20)
    val out = run(in, cap)
    assert(out.map(_._1) == (0 until 20), s"got ${out.map(_._1)}")
    assert(out.forall(!_._2))
  }

  test("displacement == capacity is flagged, emitted, and never dropped") {
    // element 0 arrives after cap later-sorted elements: the heap pops
    // 1 before 0 is ever enqueued — 0 must surface flagged, not vanish
    val cap = 8
    val in = (1 to cap) ++ Seq(0) ++ (cap + 1 until 20)
    val out = run(in, cap)
    assert(out.map(_._1).sorted == (0 until 20), "overflow must not drop elements")
    assert(out.filter(_._2).map(_._1) == Seq(0), s"exactly the displaced element flags: $out")
  }

  test("strict mode turns a beyond-bound pop into a failure") {
    val cap = 8
    val in = (1 to cap) ++ Seq(0) ++ (cap + 1 until 20)
    assertThrows[IllegalStateException] { run(in, cap, strict = true) }
    // and the exact case stays silent under strict
    val ok = run((1 until cap) ++ Seq(0) ++ (cap until 20), cap, strict = true)
    assert(ok.map(_._1) == (0 until 20))
  }

  test("heap never holds more than capacity (lazy pull)") {
    // a counting iterator proves boundedness: after k pops, at most
    // capacity + k elements may have been pulled from the source
    val n = 10000
    var pulled = 0
    val src = new Iterator[Int] {
      def hasNext: Boolean = pulled < n
      def next(): Int = { pulled += 1; pulled - 1 }
    }
    val out = Reorder.bounded(src, 16)(Ordering.Int)
    out.next()
    assert(pulled <= 17, s"pulled $pulled for one pop — not lazy")
    (1 until 100).foreach(_ => out.next())
    assert(pulled <= 116, s"pulled $pulled after 100 pops")
  }

  test("foldRuns walks contiguous sorted runs with per-key init and flush") {
    // keys pre-sorted (the engine's job); values sorted within key
    val in = Seq((1L, 10), (1L, 11), (2L, 5), (3L, 7), (3L, 8), (3L, 9))
    // step emits a row per value carrying the running count; flush
    // emits a (-key) sentinel proving exactly one flush per run
    val out = Reorder.foldRuns[(Long, Int), Long, Int, (Long, Int)](
      in.iterator, _._1, _ => 0) { (k, n, e) =>
      (n + 1, Some((k, n + 1)))
    } { (k, n) => Some((-k, n)) }.toSeq
    assert(out == Seq((1L, 1), (1L, 2), (-1L, 2), (2L, 1), (-2L, 1),
      (3L, 1), (3L, 2), (3L, 3), (-3L, 3)), s"got $out")
  }

  test("foldRuns step may emit nothing and flush may be empty") {
    val in = Seq((1L, 1), (1L, 2), (2L, 3))
    val out = Reorder.foldRuns[(Long, Int), Long, Int, Int](
      in.iterator, _._1, _ => 0) { (_, s, e) =>
      (s + e._2, None)
    } { (_, _) => None }.toSeq
    assert(out.isEmpty)
    val sums = Reorder.foldRuns[(Long, Int), Long, Int, (Long, Int)](
      in.iterator, _._1, _ => 0) { (_, s, e) =>
      (s + e._2, None)
    } { (k, s) => Some((k, s)) }.toSeq
    assert(sums == Seq((1L, 3), (2L, 3)))
  }

  test("foldRuns on empty input emits nothing") {
    val out = Reorder.foldRuns[Int, Int, Int, Int](
      Iterator.empty, identity, _ => 0) { (_, s, _) => (s, None) } {
      (_, _) => Some(1)
    }
    assert(out.isEmpty)
  }
}

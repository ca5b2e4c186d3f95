package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.text.TextOps
import graft.sim.Ann

/** Round-12 batch-3 operators: ABC classification, duplicate-order
  * screen, generalization ladder, charset profile, assignment margin.
  */
class Widening12bSpec extends AnyFunSuite {
  import SparkTestSession._

  test("abc classes partition the parts and respect the mass cuts") {
    val rows = Analytics.qAbcClass(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val nParts = Tables.lineitem(spark, sf).select("l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum == nParts, "classes must partition the parts")
    val shareSum = rows.values.map(_._3).sum
    assert(shareSum <= 10000 && shareSum >= 10000 - 3 * 2,
      "floored class shares must cover the revenue")
    // the A prefix stops at 80% of mass, B at 95% (within flooring slack)
    rows.get("A").foreach { case (_, _, s) => assert(s <= 8000 + 1) }
    for (a <- rows.get("A"); b <- rows.get("B"))
      assert(a._3 + b._3 <= 9500 + 2, "A+B must stop at the 95% cut")
    Caches.clearAll()
  }

  test("duplicate-order histogram: n_orders = size * groups, covers all orders") {
    val rows = Analytics.qDuplicateOrders(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
      "per size, orders = size * groups"))
    assert(rows.map(_.getLong(2)).sum == Tables.orders(spark, sf).count(),
      "histogram must cover every order")
    Caches.clearAll()
  }

  test("generalization ladder: coarser rungs have fewer groups and larger min-k") {
    val lvl = DlpQueries.dlpGeneralizationLadder(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(lvl.keySet == Set(0L, 1L, 2L))
    assert(lvl(0)._1 >= lvl(1)._1 && lvl(1)._1 >= lvl(2)._1,
      "group count cannot grow as the QI coarsens")
    assert(lvl(0)._2 <= lvl(1)._2 && lvl(1)._2 <= lvl(2)._2,
      "min k cannot shrink as the QI coarsens")
    assert(lvl(0)._3 >= lvl(1)._3 && lvl(1)._3 >= lvl(2)._3,
      "suppression cannot grow as the QI coarsens")
    val nSeg = Tables.customer(spark, sf).select("c_mktsegment").distinct().count()
    assert(lvl(2)._1 == nSeg, "fully generalized rung = one group per segment")
    Caches.clearAll()
  }

  test("charset profile: shares floor-sum to total, chars recount exactly") {
    val rows = TextOps.charsetProfile(spark, sf).collect()
    val chars = Tables.documents(spark, sf)
      .groupBy("source").agg(sum(length(col("text"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == chars(r.getString(0)), s"${r.getString(0)} char count")
      val s = r.getLong(3) + r.getLong(4) + r.getLong(5) + r.getLong(6)
      assert(s <= 10000 && s >= 10000 - 4, "four floored shares cover all chars")
    }
    assert(rows.map(_.getString(0)).toSet == chars.keySet)
    Caches.clearAll()
  }

  test("assignment margin histogram conserves the corpus with valid buckets") {
    val rows = Ann.assignMargin(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 10000)
    }
    val shareSum = rows.map(_.getLong(2)).sum
    assert(shareSum <= 10000 && shareSum > 10000 - rows.length)
    Caches.clearAll()
  }

  test("dup ratio: keys bounded by events, identity holds, covers the stream") {
    val rows = graft.streaming.Streams.dupRatioBatch(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.events(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "distinct keys bounded by events")
      assert(r.getLong(3) == (r.getLong(1) - r.getLong(2)) * 10000 / r.getLong(1))
    }
    Caches.clearAll()
  }
}

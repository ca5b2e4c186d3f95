package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.streaming.Streams

/** Round-12 batch-20: shadow-deployment sessionizer diff and A/B
  * experiment power planning.
  */
class Widening12qSpec extends AnyFunSuite {
  import SparkTestSession._

  test("shadow diff: deltas re-derive; the canary only ever splits sessions") {
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sessions(gapUs: Long): Map[Long, Long] =
      evs.groupBy(_._1).map { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
        u -> (1L + sorted.zip(sorted.tail).count { case (a, b) => b - a > gapUs })
      }
    val prod = sessions(Streams.SessionGapUs)
    val canary = sessions(Streams.SessionGapUs / 2)
    val expect = prod.keys.toSeq.map(u => canary(u) - prod(u))
      .groupBy(identity).map { case (d, us) => d -> us.size.toLong }
    val got = Streams.shadowDiff(spark, sf).collect()
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect,
      "delta histogram re-derives")
    got.foreach { r =>
      assert(r.getLong(0) >= 0L, "shrinking the gap can only split sessions")
      assert(r.getLong(3) >= r.getLong(2), "canary session total dominates prod")
    }
    assert(got.map(_.getLong(2)).sum == prod.values.sum)
    assert(got.map(_.getLong(3)).sum == canary.values.sum)
    Caches.clearAll()
  }

  test("ab power plan: sizes re-derive and scale inversely with the target lift") {
    val got = Analytics.qAbPowerPlan(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 4)
    val p = got.head.getLong(1)
    assert(p > 0L && p < 10000L, "baseline conversion is a real rate")
    got.foreach { r =>
      val (lift, delta, n) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(delta == (p * lift) / 10000L)
      assert(n == (1568L * p * (10000L - p)) / (100L * delta * delta),
        s"lift $lift sizes by the exact 15.68 constant")
      assert(r.getLong(4) >= 1L, "at least one day")
    }
    // a bigger detectable lift needs fewer samples — strictly monotone
    val ns = got.sortBy(_.getLong(0)).map(_.getLong(3))
    ns.zip(ns.tail).foreach { case (a, b) => assert(a > b, "n falls as lift grows") }
    Caches.clearAll()
  }

  test("sample stats: exact side re-derives and the sample is the keyed 1/101 slice") {
    val rows = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def expectFor(vals: Seq[String]) = {
      val byV = vals.groupBy(identity).view.mapValues(_.length.toLong).toMap
      (vals.length.toLong, byV.size.toLong,
        byV.toSeq.map { case (v, n) => (-n, v) }.sorted.head._2)
    }
    val got = graft.operators.SourceQueries.sampleStatsAccuracy(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("o_orderstatus", "o_orderpriority"))
    Seq(("o_orderstatus", rows.map(_._2).toSeq, rows.filter(_._1 % 101 == 0).map(_._2).toSeq),
      ("o_orderpriority", rows.map(_._3).toSeq, rows.filter(_._1 % 101 == 0).map(_._3).toSeq))
      .foreach { case (cn, all, sampled) =>
        val (n, ndv, top) = expectFor(all)
        val (ns2, ndvS, topS) = expectFor(sampled)
        val r = got(cn)
        assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((n, ndv, top)), s"$cn exact")
        assert((r.getLong(4), r.getLong(5), r.getString(6)) == ((ns2, ndvS, topS)), s"$cn sample")
        assert(r.getLong(7) == ns2 * 101, "scaled estimate")
        assert(r.getLong(8) == math.abs(ns2 * 101 - n) * 10000L / n, "error bp")
        assert(r.getLong(9) == (if (top == topS) 1L else 0L))
      }
    Caches.clearAll()
  }

  test("idf jaccard: weighted score re-derives and rare content outranks boilerplate") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def grams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val gsets = docs.map { case (id, t) => id -> grams(t) }
    val df = gsets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toLong
    def w(g: String): Long = (n * 100L) / df(g)
    val got = graft.dedup.Dedup.idfJaccard(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val shared = gsets(a) & gsets(b)
      val wShared = shared.toSeq.map(w).sum
      val wUnion = gsets(a).toSeq.map(w).sum + gsets(b).toSeq.map(w).sum - wShared
      assert(r.getLong(2) == shared.size.toLong, s"($a,$b) shared grams")
      assert(r.getLong(3) == wShared, s"($a,$b) shared weight")
      assert(r.getLong(4) == wUnion && r.getLong(5) == (wShared * 10000L) / wUnion,
        s"($a,$b) weighted jaccard re-derives")
      // weighting never manufactures similarity out of nothing
      assert(r.getLong(5) <= 10000L && r.getLong(3) <= r.getLong(4))
    }
    Caches.clearAll()
  }
}

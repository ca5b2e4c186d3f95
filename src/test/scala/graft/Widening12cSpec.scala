package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.dedup.Dedup
import graft.sim.Ann
import graft.multimodal.Multimodal
import graft.streaming.Streams

/** Round-12 batch-4 operators: lifespan survival, sampling risk,
  * shingle sweep, phash near-dup, outage minutes, LSH bucket profile.
  */
class Widening12cSpec extends AnyFunSuite {
  import SparkTestSession._

  test("lifespan survival: suffix-cumulative identity, covers ordering customers") {
    val rows = Analytics.qCustomerLifespan(spark, sf).collect()
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust)
    // n_surviving at row i = sum of n_customers for lifespans >= this one
    val sorted = rows.sortBy(_.getLong(0))
    sorted.zipWithIndex.foreach { case (r, i) =>
      val expect = sorted.drop(i).map(_.getLong(1)).sum
      assert(r.getLong(2) == expect, s"lifespan ${r.getLong(0)} suffix sum")
      assert(r.getLong(3) == expect * 10000 / nCust)
    }
    Caches.clearAll()
  }

  test("sampling risk: sample census recomputes exactly, classes only shrink") {
    val rows = DlpQueries.dlpSamplingRisk(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("a_full", "b_sample25"))
    assert(rows("b_sample25")._1 <= rows("a_full")._1,
      "sampling cannot create QI classes")
    // driver-side exact mirror of the deterministic 25% hash sample
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_mktsegment", "CAST(c_nationkey AS BIGINT) AS nk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val sampled = cust.filter(c => "0123456789abcdef".indexOf(md5hex(c._1.toString).head) < 4)
    val ks = sampled.groupBy(c => (c._2, c._3)).map(_._2.size.toLong)
    val expect = (ks.size.toLong, ks.min, ks.count(_ < 5).toLong)
    assert((rows("b_sample25")._1, rows("b_sample25")._2, rows("b_sample25")._3) == expect,
      s"sample census mismatch: got ${rows("b_sample25")}, want $expect")
    Caches.clearAll()
  }

  test("shingle sweep: one row per width over the SAME pair list; w=3 all clear 0.5") {
    val rows = Dedup.shingleSweep(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set(2L, 3L, 5L))
    assert(rows.values.map(_._1).toSet.size == 1,
      "all widths score the same verified pair list")
    // the pair list IS the w=3 jacc >= 0.5 set, so at w=3 every pair clears
    assert(rows(3L)._2 == rows(3L)._1, "every verified pair must clear 0.5 at w=3")
    rows.values.foreach { case (_, nGe, mean) =>
      assert(mean >= 0 && mean <= 10000 && nGe >= 0)
    }
    Caches.clearAll()
  }

  test("phash near-dup: identical payloads always pair (hamming 0 through the bands)") {
    val rows = Multimodal.phashNearDup(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == Tables.documents(spark, sf).count())
    // exact-dup groups share bytes => identical ph => both bands match
    // => every member sees at least the rest of its group
    val groups = Tables.documents(spark, sf)
      .selectExpr("doc_id", "md5(text) AS h").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.filter(_.length > 1)
    groups.foreach { g =>
      g.foreach { case (id, _) =>
        assert(rows(id)._2 >= g.length - 1,
          s"doc $id must pair with its ${g.length - 1} exact copies")
      }
      assert(g.map(x => rows(x._1)._1).toSet.size == 1, "identical payloads share ph")
    }
    Caches.clearAll()
  }

  test("outage minutes: a driver fold over the minute series reproduces the table") {
    val mins = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_seconds(ts) DIV 60 AS mn").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Streams.outageMinutesBatch(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == mins.keySet)
    got.foreach { r =>
      val ms = mins(r.getString(0))
      val gaps = ms.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      assert(r.getLong(1) == ms.length)
      assert(r.getLong(2) == gaps.count(_ > 5))
      assert(r.getLong(3) == (if (gaps.isEmpty) 0L else gaps.max))
      assert(r.getLong(4) == ms.length * 10000 / (ms.max - ms.min + 1))
    }
    Caches.clearAll()
  }

  test("backlog aging covers exactly the open orders, value shares floor-sum") {
    val rows = Analytics.qBacklogAging(spark, sf).collect()
    val open = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count()
    assert(rows.map(_.getLong(1)).sum == open, "bands must cover the open orders")
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 8))
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum <= 10000 && shareSum > 10000 - rows.length)
    Caches.clearAll()
  }

  test("quality matrix: independent rule counts bound the gate's first-fail counts") {
    import graft.text.TextOps
    val m = TextOps.qualityMatrix(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(m.map(_.getLong(1)).sum == nDocs)
    // the gate's per-doc FIRST failing rule: its failure total equals
    // the matrix's any-fail total (same three predicates), and each
    // independent rule count is >= the gate's attribution to that rule
    val gate = TextOps.qualityGate(spark, sf).groupBy("gate").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val anyFail = m.map(_.getLong(5)).sum
    assert(anyFail == gate.filterNot(_._1 == "ok").values.sum,
      "any-fail must equal the gate's non-ok docs")
    assert(m.map(_.getLong(2)).sum >= gate.getOrElse("too_short", 0L))
    assert(m.map(_.getLong(3)).sum >= gate.getOrElse("unknown_language", 0L))
    assert(m.map(_.getLong(4)).sum >= gate.getOrElse("repetitive", 0L))
    m.foreach(r => assert(r.getLong(6) == (r.getLong(1) - r.getLong(5)) * 10000 / r.getLong(1)))
    Caches.clearAll()
  }

  test("trade balance: flows conserve (global exports == imports), balances net to 0") {
    val rows = Analytics.qTradeBalance(spark, sf).collect()
    val ex = rows.map(_.getLong(1)).sum
    val im = rows.map(_.getLong(2)).sum
    assert(ex == im, "every export is someone's import")
    assert(rows.map(_.getLong(4)).sum == 0L, "balances must net to zero")
    rows.foreach(r => assert(r.getLong(4) == r.getLong(1) - r.getLong(2)))
    val nations = Tables.nation(spark, sf).count()
    assert(rows.length <= nations)
    Caches.clearAll()
  }

  test("weekly volatility matches a driver-side median/MAD recompute") {
    val got = Analytics.qWeeklyVolatility(spark, sf).collect()
    assert(got.length == 1)
    val wk = Tables.orders(spark, sf)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000000 AS wn",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) DIV 100 AS d")
      .groupBy("wn").agg(sum(col("d")).as("rev_d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def medBy(xs: Seq[(Long, Long)]): Long = {
      val sorted = xs.sortBy(t => (t._2, t._1))
      sorted(((sorted.length + 1) / 2 - 1).max(0))._2
    }
    val m = medBy(wk.toSeq)
    val mad = medBy(wk.toSeq.map { case (wn, r) => (wn, math.abs(r - m)) })
    val r = got.head
    assert(r.getLong(0) == wk.length && r.getLong(1) == m && r.getLong(2) == mad)
    assert(r.getLong(3) == mad * 10000 / math.max(m, 1L))
    Caches.clearAll()
  }

  test("distinctness profile: c_custkey is the only PK candidate, counts recount") {
    import graft.operators.SourceQueries
    val rows = SourceQueries.ingestDistinctnessProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    val n = Tables.customer(spark, sf).count()
    assert(rows.keySet == Set("c_custkey", "c_name", "c_mktsegment", "c_nationkey"))
    rows.values.foreach { case (rows_, _, _) => assert(rows_ == n) }
    assert(rows("c_custkey")._3 == 1L, "the key column must flag as PK candidate")
    assert(rows("c_mktsegment")._3 == 0L && rows("c_nationkey")._3 == 0L)
    assert(rows("c_mktsegment")._2 ==
      Tables.customer(spark, sf).select("c_mktsegment").distinct().count())
    Caches.clearAll()
  }

  test("mix drift: window shares vs baseline, TV identity per window") {
    val rows = Streams.mixDriftBatch(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.events(spark, sf).count())
    rows.groupBy(_.get(0)).values.foreach { w =>
      val tv = w.map(r => math.abs(r.getLong(5))).sum / 2
      w.foreach { r =>
        assert(r.getLong(6) == tv, "per-window TV must fold the same on every row")
        assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
      }
      val shareSum = w.map(_.getLong(3)).sum
      assert(shareSum <= 10000 && shareSum > 10000 - w.length)
    }
    Caches.clearAll()
  }

  test("lsh bucket profile: conserves the corpus, pair-work identity holds") {
    val rows = Ann.lshBucketProfile(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val (size, nb) = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) == size * nb)
      assert(r.getLong(3) == size * (size - 1) / 2 * nb)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
    }
    Caches.clearAll()
  }
}

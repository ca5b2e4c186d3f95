package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.sim.Ann
import graft.streaming.Streams

/** Round-12 batch-18: per-partition watermark skew, session depth →
  * conversion value, shipment-spread histogram, LSH blocking recall.
  */
class Widening12oSpec extends AnyFunSuite {
  import SparkTestSession._

  test("watermark skew: leads re-derive and exactly one partition holds the watermark") {
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id % 8 AS p", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val per = evs.groupBy(_._1).map { case (p, es) =>
      p -> (es.length.toLong, es.map(_._2).max)
    }
    val wm = per.values.map(_._2).min
    val got = Streams.watermarkSkew(spark, sf).collect()
    assert(got.length == per.size)
    got.foreach { r =>
      val (n, last) = per(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, last, wm, last - wm)), s"partition ${r.getLong(0)} re-derives")
      assert(r.getLong(4) >= 0L, "no partition trails the watermark")
    }
    assert(got.count(_.getLong(4) == 0L) >= 1, "the slowest partition defines it")
    Caches.clearAll()
  }

  test("session value: depth ledger re-derives and conserves purchase revenue") {
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type",
        "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val T = Streams.SessionGapUs
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val acc = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(String, Long)]]
      var lastUs = Long.MinValue
      sorted.foreach { e =>
        if (acc.isEmpty || e._3 - lastUs > T)
          acc += scala.collection.mutable.ArrayBuffer.empty
        acc.last += ((e._4, e._5)); lastUs = e._3
      }
      acc.map { s =>
        val buys = s.filter(_._1 == "purchase")
        (s.length.toLong, buys.map(_._2).sum, if (buys.nonEmpty) 1L else 0L)
      }
    }
    val expect = sessions.groupBy(_._1).map { case (d, ss) =>
      d -> (ss.length.toLong, ss.map(_._3).sum, ss.map(_._2).sum)
    }
    val got = Streams.sessionValue(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    var totBuy = 0L
    got.foreach { r =>
      val (n, conv, buy) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((n, conv, buy)),
        s"depth ${r.getLong(0)} re-derives")
      assert(r.getLong(3) == (conv * 10000L) / n)
      assert(r.getLong(5) == (if (conv == 0) 0L else buy / conv))
      totBuy += r.getLong(4)
    }
    assert(totBuy == evs.filter(_._4 == "purchase").map(_._5).sum,
      "purchase revenue conserved across depth bands")
    Caches.clearAll()
  }

  test("ship spread: spans re-derive and shares sum inside each priority") {
    val spans = Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey",
        "unix_micros(CAST(l_shipdate AS TIMESTAMP)) DIV 86400000000 AS dn")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, ds) =>
        k -> (ds.map(_._2).max - ds.map(_._2).min, ds.length.toLong)
      }
    val prio = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = spans.toSeq.map { case (k, (span, nl)) =>
      (prio(k), span / 7, nl)
    }.groupBy(t => (t._1, t._2)).map { case (key, ts) =>
      key -> (ts.length.toLong, ts.map(_._3).sum)
    }
    val got = Analytics.qShipSpread(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, nl) = expect((r.getString(0), r.getLong(1)))
      assert((r.getLong(2), r.getLong(3)) == ((n, nl)),
        s"(${r.getString(0)}, ${r.getLong(1)}) re-derives")
    }
    // share bp within a priority floors to ≤ 10000 and the buckets of
    // one priority cover all its orders
    got.groupBy(_.getString(0)).foreach { case (p, rows) =>
      val tot = rows.map(_.getLong(2)).sum
      rows.foreach(r => assert(r.getLong(4) == r.getLong(2) * 10000L / tot, s"$p share"))
    }
    Caches.clearAll()
  }

  test("bucket recall: same-bucket hits re-derive against exact top-5") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def bucket(e: Array[Double]): String =
      (0 until 8).map(i => if (e(i) >= 0) '1' else '0').mkString
    val byId = vecs.toMap
    val expect = vecs.map(_._1).filter(id => id >= 8 && id < 18).map { q =>
      val top5 = vecs.filter(_._1 != q)
        .map { case (id, e) => (-cos(byId(q), e), id) }
        .sortBy(identity).take(5).map(_._2)
      q -> top5.count(n => bucket(byId(n)) == bucket(byId(q))).toLong
    }.toMap
    val got = Ann.bucketRecall(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val hits = expect(r.getLong(0))
      assert(r.getLong(1) == 5L)
      assert(r.getLong(2) == hits, s"query ${r.getLong(0)} same-bucket hits")
      assert(r.getLong(3) == hits * 2000L)
    }
    Caches.clearAll()
  }
}

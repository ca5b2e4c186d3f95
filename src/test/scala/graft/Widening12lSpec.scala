package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.sim.Ann
import graft.streaming.Streams

/** Round-12 batch-15 operators: Gini–Simpson brand diversity,
  * price-volume-mix bridge, new-vs-repeat revenue split, 1-bit
  * Hamming top-k, absence/abandonment timeout (batch + streaming
  * machine), truncated-surrogate collision audit.
  */
class Widening12lSpec extends AnyFunSuite {
  import SparkTestSession._

  test("simpson diversity: re-derives from the raw brand mix and bounds hold") {
    val mix = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("long"), col("p_brand"))
      .agg(count(lit(1)))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = mix.groupBy(_._1).map { case (nation, rows) =>
      val n = rows.map(_._3).sum
      val sq = rows.map(r => r._3 * r._3).sum
      nation -> (n, rows.length.toLong,
        10000L - (10000L * sq) / (n * n), (100L * n * n) / sq)
    }
    val got = Analytics.qSimpsonDiversity(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (n, brands, div, eff) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, brands, div, eff)), s"nation ${r.getLong(0)} re-derives")
      // Gini–Simpson lives in [0, 10000); inverse-Simpson effective
      // count never exceeds the observed brand count
      assert(r.getLong(3) >= 0L && r.getLong(3) < 10000L)
      assert(r.getLong(4) >= 100L && r.getLong(4) <= r.getLong(2) * 100L,
        "1 <= effective brands <= observed brands")
    }
    Caches.clearAll()
  }

  test("price-volume-mix: bridge reconciles exactly and re-derives per brand") {
    val byYear = Tables.lineitem(spark, sf)
      .filter(expr("year(l_shipdate) IN (1996, 1997)"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), expr("CAST(year(l_shipdate) AS BIGINT)").as("yr"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    val got = Analytics.qPriceVolumeMix(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val brand = r.getString(0)
      val (rev0, qty0) = byYear((brand, 1996L))
      val (rev1, qty1) = byYear((brand, 1997L))
      val (p0, p1) = (rev0 / qty0, rev1 / qty1)
      val (price, vol, cross) =
        (qty0 * (p1 - p0), p0 * (qty1 - qty0), (p1 - p0) * (qty1 - qty0))
      assert(r.getLong(1) == rev1 - rev0, s"$brand delta")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((price, vol, cross)),
        s"$brand effects re-derive")
      // the contract that makes the residual column honest: the four
      // components sum EXACTLY to the revenue delta, floors included
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) == r.getLong(1),
        s"$brand bridge reconciles")
    }
    Caches.clearAll()
  }

  test("new-vs-repeat: first-order resolution is deterministic and months re-derive") {
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS dn",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rev_c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val firstKey = orders.groupBy(_._2).map { case (c, os) =>
      c -> os.minBy(o => (o._3, o._1))._1
    }
    val expect = orders.groupBy(o => (o._3 / 30) * 30).map { case (mo, os) =>
      val newRev = os.filter(o => firstKey(o._2) == o._1).map(_._4).sum
      val repRev = os.filter(o => firstKey(o._2) != o._1).map(_._4).sum
      mo -> (os.length.toLong, newRev, repRev,
        (repRev * 10000L) / (newRev + repRev))
    }
    val got = Analytics.qNewVsRepeat(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    var totNew, totRep = 0L
    got.foreach { r =>
      val (n, nw, rp, bp) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, nw, rp, bp)), s"month ${r.getLong(0)} re-derives")
      totNew += r.getLong(2); totRep += r.getLong(3)
    }
    // conservation: the split covers ALL order revenue exactly
    assert(totNew + totRep == orders.map(_._4).sum, "revenue conserved")
    Caches.clearAll()
  }

  test("hamming topk: bit packing matches signs and top-10 matches a popcount scan") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def pack(e: Array[Double]): Long =
      e.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v > 0) acc + (if (i == 63) Long.MinValue else 1L << i) else acc
      }
    val packed = vecs.map { case (id, e) => id -> pack(e) }.toMap
    // independent re-pack sanity: bit i reflects the sign of dim i+1
    vecs.take(3).foreach { case (id, e) =>
      (0 until 64).foreach { i =>
        val bit = (packed(id) >>> i) & 1L
        assert((bit == 1L) == (e(i) > 0), s"vec $id bit $i mirrors sign")
      }
    }
    val expect = packed.keys.filter(_ < 10).map { q =>
      val top = packed.toSeq.filter(_._1 != q)
        .map { case (id, b) => (java.lang.Long.bitCount(b ^ packed(q)).toLong, id) }
        .sorted.take(10)
      q -> top.zipWithIndex.map { case ((d, id), i) => (i + 1L, id, d) }
    }.toMap
    val got = Ann.hammingTopk(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == expect.keySet)
    got.foreach { case (q, rows) =>
      val want = expect(q)
      assert(rows.sortBy(_.getLong(1)).map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq == want,
        s"query $q top-10 matches the popcount scan")
    }
    Caches.clearAll()
  }

  test("absence timeout batch: per-user stats re-derive from raw events") {
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val T = Streams.SessionGapUs
    val expect = evs.groupBy(_._1).flatMap { case (u, es) =>
      val views = es.filter(_._3 == "view")
      if (views.isEmpty) None
      else {
        val buys = es.filter(_._3 == "purchase").map(_._4)
        val conv = views.count(v => buys.exists(p => p > v._4 && p <= v._4 + T))
        Some(u -> (views.length.toLong, conv.toLong))
      }
    }
    val got = Streams.absenceTimeout(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (nv, nc) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nv, nc, nv - nc, ((nv - nc) * 10000L) / nv)),
        s"user ${r.getLong(0)} re-derives")
    }
    Caches.clearAll()
  }

  test("absence timeout streaming machine: equivalent to batch after watermark flush") {
    import spark.implicits._
    val raw = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us", "event_type")
      .as[Streams.FunnelEv].collect()
    // per-user far-future flush: exactly what a final watermark past
    // every deadline does — views still open become decidable
    val flushes = raw.groupBy(_.user_id).map { case (u, es) =>
      Streams.FunnelEv(u, Long.MaxValue, es.map(_.us).max + Streams.SessionGapUs + 1, "flush")
    }
    val out = Streams.absenceTimeoutStreaming(
      spark.createDataset((raw ++ flushes).toSeq)).collect()
    // every view resolved exactly once
    val viewIds = raw.filter(_.event_type == "view").map(_.event_id).toSet
    assert(out.map(_.view_event_id).toSet == viewIds, "all views resolved")
    assert(out.map(_.view_event_id).distinct.length == out.length, "each exactly once")
    val perUser = out.groupBy(_.user_id).map { case (u, os) =>
      u -> (os.length.toLong, os.map(_.converted).sum)
    }
    Streams.absenceTimeout(spark, sf).collect().foreach { r =>
      val (nv, nc) = perUser(r.getLong(0))
      assert((nv, nc) == ((r.getLong(1), r.getLong(2))),
        s"user ${r.getLong(0)} streaming == batch")
    }
    Caches.clearAll()
  }

  test("absence timeout streaming: conversion confirms early, absence waits for event time") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streams.FunnelEv]
    val q = Streams.absenceTimeoutStreaming(src.toDS(), timeoutUs = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName("absence_out").start()
    try {
      // trigger 1: two views — nothing can be emitted yet (neither a
      // purchase nor the passage of event time has resolved them)
      src.addData(Streams.FunnelEv(1L, 10L, 1000L, "view"),
        Streams.FunnelEv(1L, 11L, 1050L, "view"))
      q.processAllAvailable()
      assert(spark.table("absence_out").count() == 0, "open views stay open")
      // trigger 2: a purchase at 1080 resolves BOTH open views (each
      // within its window) — cross-trigger state did its job
      src.addData(Streams.FunnelEv(1L, 12L, 1080L, "purchase"))
      q.processAllAvailable()
      val afterBuy = spark.table("absence_out").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(afterBuy == Set((10L, 1L), (11L, 1L)), s"both converted: $afterBuy")
      // trigger 3: a view at 2000, then an unrelated late event at
      // 2200 — past the 100-us deadline, so the view expires ABANDONED
      // (absence confirmed by event time alone, no purchase needed)
      src.addData(Streams.FunnelEv(1L, 13L, 2000L, "view"),
        Streams.FunnelEv(1L, 14L, 2200L, "click"))
      q.processAllAvailable()
      val finalSet = spark.table("absence_out").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(finalSet == afterBuy + ((13L, 0L)), s"view 13 expired: $finalSet")
    } finally q.stop()
  }

  test("hash collision audit: counts re-derive and expected follows the birthday bound") {
    val hashes = Tables.customer(spark, sf)
      .selectExpr("md5(c_name) AS h").collect().map(_.getString(0))
    val got = DlpQueries.dlpHashCollisionAudit(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(4L, 6L, 8L))
    got.foreach { r =>
      val l = r.getLong(0).toInt
      val nPlain = hashes.distinct.length.toLong
      val nTok = hashes.map(_.take(l)).distinct.length.toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((nPlain, nTok, nPlain - nTok)), s"L=$l re-derives")
      assert(r.getLong(4) == ((nPlain - nTok) * 10000L) / nPlain)
      assert(r.getLong(5) == (nPlain * (nPlain - 1) * 100L) / (2L * (1L << (4 * l))))
    }
    // monotone: longer prefixes never collide MORE
    val colls = got.map(_.getLong(3))
    assert(colls.zip(colls.tail).forall { case (a, b) => a >= b },
      "collisions non-increasing in prefix length")
    Caches.clearAll()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.dedup.Dedup
import graft.streaming.Streams
import graft.text.TextOps

/** Round-12 batch-9 operators: max drawdown, hapax/lexical richness,
  * post-deid residual scan, cluster medoid election, state-store
  * sizing.
  */
class Widening12fSpec extends AnyFunSuite {
  import SparkTestSession._

  test("max drawdown: peak/trough/day match a driver-side fold") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("dn"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("c"))
      .groupBy("p", "dn").agg(sum("c").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (p, rows) =>
      var peak = Long.MinValue
      var best = (Long.MinValue, Long.MaxValue) // (dd_bp, first day)
      rows.sortBy(_._2).foreach { case (_, dn, rev) =>
        peak = math.max(peak, rev)
        val dd = (peak - rev) * 10000 / peak
        if (dd > best._1) best = (dd, dn)
      }
      p -> (rows.length.toLong, peak, best._1, best._2)
    }
    val got = Analytics.qMaxDrawdown(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect, "drawdown table diverges from the driver fold")
    Caches.clearAll()
  }

  test("hapax ratio: richness stats match a driver-side term census") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val expect = docs.groupBy(_._1).map { case (s, ds) =>
      val tf = ds.flatMap(_._2.split(" ", -1)).groupBy(identity).map(_._2.length)
      val types = tf.size.toLong
      val tokens = tf.sum.toLong
      val hapax = tf.count(_ == 1).toLong
      s -> (tokens, types, hapax, hapax * 10000 / types, types * 10000 / tokens)
    }
    val got = TextOps.hapaxRatio(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == expect, "hapax census diverges from the driver recompute")
    Caches.clearAll()
  }

  test("residual scan: the release gate holds — zero findings after redaction") {
    val rows = DlpQueries.dlpResidualScan(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.customer(spark, sf).count(),
      "every record must be scanned")
    rows.foreach { r =>
      assert(r.getLong(2) == 0L,
        s"segment ${r.getString(0)} still carries findings after redaction")
      // contact shrinks: every record loses an email and a phone to
      // two fixed 10-char tags, so the delta must be strictly positive
      assert(r.getLong(3) > r.getLong(4) && r.getLong(5) > 0)
      assert(r.getLong(5) == (r.getLong(3) - r.getLong(4)) * 10000 / r.getLong(3))
    }
    Caches.clearAll()
  }

  test("medoid: highest within-cluster similarity mass, from the pair list") {
    val pairs = Dedup.minhashPairs(spark, sf)
      .selectExpr("doc_a", "doc_b", "CAST(ROUND(jacc * 10000) AS BIGINT) AS j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val comp = Dedup.components(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val score = collection.mutable.Map.empty[Long, (Long, Long)] // doc -> (score, deg)
    pairs.foreach { case (a, b, j) =>
      score(a) = (score.getOrElse(a, (0L, 0L))._1 + j, score.getOrElse(a, (0L, 0L))._2 + 1)
      score(b) = (score.getOrElse(b, (0L, 0L))._1 + j, score.getOrElse(b, (0L, 0L))._2 + 1)
    }
    val expect = score.toSeq.groupBy { case (doc, _) => comp(doc) }
      .map { case (c, members) =>
        val (doc, (s, d)) = members.minBy { case (doc, (s, _)) => (-s, doc) }
        c -> (doc, d, s)
      }
    val got = Dedup.clusterMedoid(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect, "medoid election diverges from the driver recompute")
    // every medoid's component has >= 2 members and contains the medoid
    Dedup.clusterMedoid(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= 2 && comp(r.getLong(2)) == r.getLong(0))
    }
    Caches.clearAll()
  }

  test("state size: live states match the trailing-half-hour rule") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_seconds(ts) AS sec").collect()
      .map(r => (if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
        r.getLong(1)))
    val byHour = evs.map { case (u, sec) =>
      ((sec / 3600 + 1) * 3600, u, if (sec % 3600 >= 1800) 1L else 0L)
    }.groupBy(t => (t._1, t._2)).map { case ((hb, u), ts) => (hb, u, ts.map(_._3).max) }
    val expect = byHour.groupBy(_._1).map { case (hb, us) =>
      hb -> (us.size.toLong, us.map(_._3).sum)
    }
    val got = Streams.stateSizeBatch(spark, sf).collect().map { r =>
      r.getAs[java.time.LocalDateTime](0).toEpochSecond(java.time.ZoneOffset.UTC) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))
    }.toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (hb, (nU, nL, bp)) =>
      assert((nU, nL) == expect(hb), s"hour $hb diverges from the driver rule")
      assert(nL <= nU && bp == nL * 10000 / nU)
    }
    Caches.clearAll()
  }
}

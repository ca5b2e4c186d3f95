package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.sim.Ann

/** Round-12 batch-13 operators: seasonal index, MAD outliers, degree
  * distribution, noise-injected release counts, label concentration.
  */
class Widening12jSpec extends AnyFunSuite {
  import SparkTestSession._

  test("seasonal index: months partition revenue and par is 10000") {
    val rows = Analytics.qSeasonalIndex(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 12L),
      "all twelve months present exactly once")
    val tot = rows.map(_.getLong(2)).sum
    val orders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == orders, "order counts conserve")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 10000 / tot, "share re-derives")
      assert(r.getLong(4) == r.getLong(2) * 120000 / tot, "index re-derives")
    }
    // Σ index ≈ 12 × par, off only by the 12 floor losses
    val sumIdx = rows.map(_.getLong(4)).sum
    assert(sumIdx > 120000L - 12 && sumIdx <= 120000L)
    Caches.clearAll()
  }

  test("MAD outliers: medians and the worst day match a driver fold") {
    val daily = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS dn",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .groupBy("o_orderpriority", "dn").agg(sum("c").as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def lowerMedian(vs: Seq[(Long, Long)]): Long = { // (value, tiebreak dn)
      val sorted = vs.sortBy(identity)
      sorted(math.max((sorted.length + 1) / 2, 1) - 1)._1
    }
    val expect = daily.groupBy(_._1).map { case (p, ds) =>
      val med = lowerMedian(ds.map(d => (d._3, d._2)).toSeq)
      val devs = ds.map(d => (d._2, math.abs(d._3 - med)))
      val mad = lowerMedian(devs.map(d => (d._2, d._1)).toSeq)
      val worstDev = devs.map(_._2).max
      val worstDn = devs.filter(_._2 == worstDev).map(_._1).min
      p -> (ds.length.toLong, med, mad,
        devs.count(_._2 > 3 * mad).toLong, worstDn, worstDev)
    }
    val got = Analytics.qMadOutliers(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) == expect(r.getString(0)),
        s"priority ${r.getString(0)}: MAD profile diverges")
    }
    Caches.clearAll()
  }

  test("degree distribution: shares close and node totals re-derive") {
    val edges = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Analytics.qDegreeDist(spark, sf).collect()
    val parts = got.filter(_.getString(0) == "part")
    val sups = got.filter(_.getString(0) == "supplier")
    assert(parts.map(_.getLong(2)).sum == edges.map(_._1).distinct.length.toLong)
    assert(sups.map(_.getLong(2)).sum == edges.map(_._2).distinct.length.toLong)
    // edge conservation: Σ degree·n_nodes equals the edge count on BOTH sides
    assert(parts.map(r => r.getLong(1) * r.getLong(2)).sum == edges.length.toLong)
    assert(sups.map(r => r.getLong(1) * r.getLong(2)).sum == edges.length.toLong)
    val pExpect = edges.groupBy(_._1).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    parts.foreach(r => assert(pExpect(r.getLong(1)) == r.getLong(2)))
    Caches.clearAll()
  }

  test("noise counts: keyed noise is deterministic, bounded, floored") {
    val got = DlpQueries.dlpNoiseCounts(spark, sf).collect()
    val truth = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"), col("c_nationkey").cast("long"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.length == truth.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) == truth(key), "true counts re-derive")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"noise-v1:${key._1}:${key._2}".getBytes("UTF-8"))
      val hex = md5.map("%02x".format(_)).mkString
      val noise = ("0123456789abcdef".indexOf(hex(0)) * 16 +
        "0123456789abcdef".indexOf(hex(1))) % 21 - 10
      assert(r.getLong(3) == noise.toLong, s"$key: keyed noise re-derives")
      assert(r.getLong(3) >= -10 && r.getLong(3) <= 10, "noise bounded")
      assert(r.getLong(4) == math.max(r.getLong(2) + r.getLong(3), 0L), "floor at 0")
      assert(r.getLong(5) == math.abs(r.getLong(4) - r.getLong(2)))
    }
    Caches.clearAll()
  }

  test("spherical variance: concentration re-derives from quantized sums") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("CAST(label AS BIGINT) AS l", "CAST(embedding AS ARRAY<DOUBLE>) AS e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val expect = vecs.groupBy(_._1).map { case (l, vs) =>
      val q = vs.map(_._2.map(x =>
        BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP)
          .*(1000).toLongExact))
      val dims = q.head.length
      val r2 = (0 until dims).map { d =>
        val s = q.map(_(d)).sum; s * s
      }.sum
      val norm2 = q.map(_.map(m => m * m).sum).sum
      l -> (q.length.toLong, r2, norm2, r2 * 10000 / (q.length * norm2))
    }
    val got = Ann.sphericalVariance(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        expect(r.getLong(0)), s"label ${r.getLong(0)}: concentration diverges")
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 10000)
    }
    Caches.clearAll()
  }
}

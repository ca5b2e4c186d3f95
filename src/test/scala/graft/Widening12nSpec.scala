package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.sim.Ann

/** Round-12 batch-17: winsorized mean (two-level rank bounds),
  * recursive (c,ℓ)-diversity, kNN-distance density outliers, and the
  * codegen'd PackSignBits expression behind the Hamming operators.
  */
class Widening12nSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pack sign bits: codegen expression equals the HOF reference fold") {
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
    val both = e.select(col("vec_id"),
        graft.functions.VectorExprs.packSignBits(col("emb")).as("native"))
      .join(e.selectExpr("vec_id", s"${Ann.PackBitsSql} AS hof"), "vec_id")
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "native pack == HOF pack on the whole corpus")
    assert(both.count() > 0)
    // edges: short array (only low bits reachable), empty, null
    val edge = spark.sql(
      "SELECT CAST(ARRAY(1.0D, -1.0D, 0.0D, 2.0D) AS ARRAY<DOUBLE>) AS emb")
    val v = edge.select(graft.functions.VectorExprs.packSignBits(col("emb")))
      .head().getLong(0)
    assert(v == ((1L << 0) | (1L << 3)), "bit i set iff dim i+1 > 0, zeros clear")
    val nulls = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS emb")
      .select(graft.functions.VectorExprs.packSignBits(col("emb")))
    assert(nulls.head().isNullAt(0), "null in, null out")
    // wider-than-64 arrays: both forms ignore elements past 64 (the
    // HOF reference slices first — unsliced zip_with would NULL the
    // whole fold on a positive 65th element)
    val wide = spark.sql(
      "SELECT CAST(transform(sequence(1, 70), i -> CAST(1 AS DOUBLE)) AS ARRAY<DOUBLE>) AS emb")
    val nat = wide.select(graft.functions.VectorExprs.packSignBits(col("emb"))).head().getLong(0)
    val hof = wide.selectExpr(s"${Ann.PackBitsSql} AS b").head().getLong(0)
    assert(nat == hof && nat == -1L, "all-64-bits set == -1, both forms agree past width 64")
    Caches.clearAll()
  }

  test("winsorized mean: two-level rank bounds equal a naive global re-derivation") {
    val rows = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority", "o_orderkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (prio, os) =>
      val sorted = os.sortBy(o => (o._3, o._2)).map(_._3)
      val n = sorted.length.toLong
      val lo = sorted((math.max((5 * (n + 1)) / 100, 1L) - 1).toInt)
      val hi = sorted((math.min((95 * (n + 1)) / 100, n) - 1).toInt)
      val wsum = sorted.map(c => math.min(math.max(c, lo), hi)).sum
      prio -> (n, lo, hi, wsum / n, sorted.sum / n)
    }
    val got = Analytics.qWinsorizedMean(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, lo, hi, wm, rm) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((n, lo, hi, wm, rm)), s"${r.getString(0)} re-derives")
      // clamping can only pull the mean INTO [lo, hi]
      assert(r.getLong(4) >= lo && r.getLong(4) <= hi, "winsorized mean inside bounds")
    }
    Caches.clearAll()
  }

  test("cl diversity: the (3,2) gate re-derives from raw band frequencies") {
    val freqs = Tables.customer(spark, sf)
      .selectExpr("CAST(c_nationkey AS BIGINT) AS nation", "c_mktsegment",
        "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 100000) DIV 200000 AS band")
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val expect = freqs.groupBy(_._1).map { case (k, bs) =>
      val byBand = bs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val n = bs.length.toLong
      val top = byBand.values.max
      k -> (n, byBand.size.toLong, top, n - top,
        if (byBand.size >= 2 && top < 3 * (n - top)) 1L else 0L)
    }
    val got = DlpQueries.dlpClDiversity(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (n, nb, top, tail, ok) = expect((r.getLong(0), r.getString(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)) ==
        ((n, nb, top, tail, ok)),
        s"group (${r.getLong(0)}, ${r.getString(1)}) re-derives")
    }
    // the audit must be strictly harder than distinct-l=2: every
    // group that fails distinct-2 (single band) must fail (3,2)
    got.filter(_.getLong(3) == 1L).foreach(r => assert(r.getLong(6) == 0L))
    Caches.clearAll()
  }

  test("knn dist: banded 3rd-NN histogram re-derives under bucket blocking") {
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def bucket(e: Array[Double]): String =
      (0 until 8).map(i => if (e(i) >= 0) '1' else '0').mkString
    val byBucket = vecs.groupBy(v => bucket(v._2))
    val bands = vecs.map { case (id, emb) =>
      val peers = byBucket(bucket(emb)).filter(_._1 != id)
      if (peers.length < 3) -1L
      else {
        val third = peers
          .map { case (nid, ne) => (-math.round(cos(emb, ne) * 10000), nid) }
          .sorted.apply(2)
        (-third._1 + 10000L) / 500L
      }
    }
    val expect = bands.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Ann.knnDist(spark, sf).collect()
    assert(got.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect,
      "histogram re-derives")
    assert(got.map(_.getLong(1)).sum == vecs.length.toLong, "corpus conserved")
    Caches.clearAll()
  }
}

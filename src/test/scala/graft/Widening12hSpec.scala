package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, SourceQueries}
import graft.dedup.Dedup
import graft.sim.Ann

/** Round-12 batch-11 operators: dynamic partition overwrite,
  * constraint gate, order fan-out distribution, pair-similarity
  * histogram, PQ distortion audit.
  */
class Widening12hSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dynamic overwrite: only the restated partition changes") {
    val src = Tables.orders(spark, sf)
      .selectExpr("o_orderstatus AS st",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .groupBy("st").agg(count(lit(1)).as("n"), sum("c").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SourceQueries.loadDynamicOverwrite(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == src.keySet, "no partition may vanish or appear")
    got.foreach { case (st, (n, t)) =>
      assert(n == src(st)._1, s"partition $st row count must be preserved")
      val expect = if (st == "F") src(st)._2 * 2 else src(st)._2
      assert(t == expect,
        s"partition $st: ${if (st == "F") "the restatement must land" else "an untouched partition changed"}")
    }
    Caches.clearAll()
  }

  test("constraint gate: clean corpus passes; forged violations count exactly") {
    val clean = SourceQueries.loadConstraintCheck(spark, sf).collect()
    assert(clean.length == 6)
    clean.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 1L,
        s"rule ${r.getString(0)} must pass on the clean corpus")
    }
    // forge a poisoned batch: 2 null keys, 3 non-positive totals,
    // 1 bad status (whose date is also out of range) — each lands in
    // exactly its own rule's count, no first-fail masking
    import spark.implicits._
    val bad = Seq(
      (null.asInstanceOf[java.lang.Long], 1L, "F", 10.0, "1995-06-01", "1-URGENT"),
      (null.asInstanceOf[java.lang.Long], 2L, "O", 10.0, "1995-06-01", "2-HIGH"),
      (java.lang.Long.valueOf(1L), 3L, "F", 0.0, "1995-06-01", "3-MEDIUM"),
      (java.lang.Long.valueOf(2L), 4L, "O", -5.0, "1995-06-01", "4-NOT SPECIFIED"),
      (java.lang.Long.valueOf(3L), 5L, "P", -1.0, "1995-06-01", "5-LOW"),
      (java.lang.Long.valueOf(4L), 6L, "X", 10.0, "2010-01-01", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "d", "o_orderpriority")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    val gate = SourceQueries.constraintCheckOf(bad).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gate("o_orderkey_not_null") == ((6L, 2L, 0L)))
    assert(gate("o_totalprice_positive") == ((6L, 3L, 0L)))
    assert(gate("o_orderstatus_domain") == ((6L, 1L, 0L)))
    assert(gate("o_orderpriority_domain") == ((6L, 0L, 1L)))
    assert(gate("o_custkey_not_null") == ((6L, 0L, 1L)))
    assert(gate("o_orderdate_in_range") == ((6L, 1L, 0L)))
    Caches.clearAll()
  }

  test("fan-out distribution: both shares re-derive from the per-order counts") {
    val counts = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    val hist = counts.groupBy(identity).map { case (n, os) => n -> os.length.toLong }
    val totO = hist.values.sum
    val totL = hist.map { case (n, o) => n * o }.sum
    val got = Analytics.qOrderLinecountDist(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == hist.keySet)
    got.foreach { case (n, (o, obp, lbp)) =>
      assert(o == hist(n))
      assert(obp == o * 10000 / totO && lbp == o * n * 10000 / totL)
    }
    Caches.clearAll()
  }

  test("pair-sim histogram: covers the verified pair list, bands hold their bounds") {
    val jbps = Dedup.minhashPairs(spark, sf)
      .selectExpr("CAST(ROUND(jacc * 10000) AS BIGINT) AS j").collect().map(_.getLong(0))
    val rows = Dedup.pairSimHistogram(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == jbps.length.toLong,
      "every verified pair must land in exactly one band")
    rows.foreach { r =>
      val (band, lo, n, _, mn, mx) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo == band * 500 && n > 0)
      assert(mn >= lo || band == 20, s"band $band min below its floor")
      if (band < 20) assert(mx < lo + 500, s"band $band max above its ceiling")
      val inBand = jbps.count(j => math.min(j / 500, 20) == band).toLong
      assert(n == inBand, s"band $band count diverges from the raw pair list")
    }
    Caches.clearAll()
  }

  test("pq distortion: subspace sums match a driver-side exact recompute") {
    val embs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val cents = embs.filter(_._1 < 8).map(_._2)
    def sqL2(a: Array[Double], b: Array[Double], lo: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < 16) { val d = a(lo + i) - b(lo + i); acc += d * d; i += 1 }
      acc
    }
    val expect = (0 until 4).map { m =>
      val errs = embs.map { case (_, e) =>
        math.floor(cents.map(c => sqL2(e, c, m * 16)).min * 1000000).toLong
      }
      m.toLong -> (embs.length.toLong, errs.sum, errs.max)
    }.toMap
    val got = Ann.pqDistortion(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(got == expect, "distortion sums diverge from the exact recompute")
    Ann.pqDistortion(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1))
    }
    Caches.clearAll()
  }
}

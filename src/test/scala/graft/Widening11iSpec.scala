package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}

/** Round-11 batch-14 operators: t-closeness vs a brute-force EMD
  * recompute, ship-latency percentiles vs a naive per-priority sort.
  */
class Widening11iSpec extends AnyFunSuite {
  import SparkTestSession._

  test("t-closeness matches a brute-force EMD recompute on every class") {
    val got = DlpQueries.dlpTCloseness(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val rows = Tables.customer(spark, sf)
      .selectExpr("c_mktsegment", "c_nationkey",
        "CAST(FLOOR(c_acctbal / 2000) AS LONG) AS sb")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val nTotal = rows.length.toLong
    val buckets = rows.map(_._3).distinct.sorted
    val gBp = buckets.map(b =>
      b -> rows.count(_._3 == b).toLong * 10000 / nTotal).toMap
    val byClass = rows.groupBy(r => (r._1, r._2))
    assert(got.keySet == byClass.keySet, "one row per QI class")
    byClass.foreach { case (k, members) =>
      val sz = members.length.toLong
      var cum = 0L
      var s = 0L
      buckets.foreach { b =>
        val cBp = members.count(_._3 == b).toLong * 10000 / sz
        cum += cBp - gBp(b)
        s += math.abs(cum)
      }
      val expected = s / math.max(buckets.length - 1, 1)
      assert(got(k) == ((sz, expected)), s"class $k")
    }
  }

  test("ship latency percentiles match a naive per-priority sort") {
    val got = Analytics.qShipLatency(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val d = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      .selectExpr("o_orderpriority", "CAST(datediff(l_shipdate, o_orderdate) AS LONG) AS days")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet == d.keySet)
    d.foreach { case (prio, days) =>
      val n = days.length.toLong
      val p50 = days((math.max((n + 1) / 2, 1) - 1).toInt)
      val p90 = days((math.max(9 * (n + 1) / 10, 1) - 1).toInt)
      assert(got(prio) == ((n, p50, p90, days.max)), s"priority $prio")
      assert(p50 <= p90 && p90 <= days.max)
    }
  }
}

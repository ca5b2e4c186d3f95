package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, SourceQueries}

/** Round-11 batch-18 operators: cross-shop conservation, row-width
  * schema pinning.
  */
class Widening11mSpec extends AnyFunSuite {
  import SparkTestSession._

  test("supplier spread partitions the ordering customers") {
    val rows = Analytics.qSupplierSpread(spark, sf).collect()
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "histogram must cover every customer with orders")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 10000 / r.getLong(1))
      // a single-supplier customer cannot span two nations
      if (r.getLong(0) == 1L) assert(r.getLong(2) == 0L)
    }
  }

  test("row width pins the fixed-schema tables exactly") {
    val rows = SourceQueries.rowWidth(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Tables.all.toSet, "one profile row per catalog table")
    Tables.all.foreach { t =>
      val actual = Tables.load(spark, sf, t).count()
      assert(rows(t)._1 == actual, s"$t row count")
      assert(rows(t)._3 > 0 && rows(t)._4 >= 1)
    }
    // embeddings: 2 fixed longs (16) + a 64-float vector (256) — exact
    assert(rows("embeddings")._3 == 272L, "embedding row width must be exact")
    // lineitem: 9 fixed-width cols (72) + two 1-char flags
    assert(rows("lineitem")._3 == 74L, "lineitem row width must be exact")
  }
}

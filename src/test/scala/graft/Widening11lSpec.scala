package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

/** Round-11 batch-17 operators: backtest vs a brute-force rolling
  * mean, return rate vs a brute-force horizon scan.
  */
class Widening11lSpec extends AnyFunSuite {
  import SparkTestSession._

  test("forecast backtest matches a brute-force rolling 4-week mean") {
    val got = Analytics.qForecastBacktest(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val weekly = Tables.orders(spark, sf)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 604800000000 AS week",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .groupBy("week").agg(org.apache.spark.sql.functions.sum("c").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val weeks = weekly.map(_._1)
    // contract: a week appears iff EXACTLY 4 of the 4 preceding frame
    // rows exist (ROWS frame over present weeks, not calendar weeks)
    assert(got.keySet == weeks.drop(4).toSet)
    weekly.zipWithIndex.drop(4).foreach { case ((w, rev), i) =>
      val pred = weekly.slice(i - 4, i).map(_._2).sum / 4
      val err = math.abs(rev - pred)
      assert(got(w) == ((rev, pred, err, err * 10000 / rev)), s"week $w")
    }
  }

  test("return rate matches a brute-force 7-day horizon scan") {
    val got = Analytics.qReturnRate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val ud = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS day")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = ud.map(_._2).distinct.sorted
    assert(got.keySet == days.toSet)
    days.foreach { d =>
      val actives = ud.filter(_._2 == d).map(_._1).distinct
      val returned = actives.count(u => byUser(u).exists(x => x > d && x <= d + 7)).toLong
      val n = actives.length.toLong
      assert(got(d) == ((n, returned, returned * 10000 / n)), s"day $d")
      assert(returned <= n)
    }
  }
}

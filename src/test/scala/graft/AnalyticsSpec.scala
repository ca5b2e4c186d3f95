package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries key runs and every oracleSql key exists in queries") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracleSql key $k missing from queries")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute
    }
  }

  test("q1 aggregates are exact decimals") {
    val q1 = operators.Analytics.q1PricingSummary(spark, sf)
    val sch = q1.schema("sum_qty").dataType.typeName
    assert(sch.startsWith("decimal"), s"sum_qty must be decimal, got $sch")
  }

  test("q6 filter is pushed to the parquet scan") {
    val plan = operators.Analytics.q6ForecastRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "expected pushdown of l_shipdate filter into scan")
  }

  test("approx distinct within 5% of exact") {
    val rows = operators.Analytics.qApproxDistinct(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_parts")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_parts")).toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"HLL off: $approx vs $exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Scale-machinery specs: salting correctness, bucketed shuffle-free
  * joins. */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .toDF("l_orderkey", "o_totalprice")
    val plain = li.join(ord, "l_orderkey")
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val a = plain.orderBy(plain.columns.map(col): _*).collect().toSeq
    val b = salted.orderBy(salted.columns.map(col): _*).collect().toSeq
    assert(a == b)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val li = Tables.lineitem(s2, sf)
    val ord = Tables.orders(s2, sf)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")
    val joined = s2.table("li_b").join(s2.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join should be shuffle-free, got:\n${plan.take(1500)}")
    assert(joined.count() == Tables.lineitem(s2, sf).count())
  }
}

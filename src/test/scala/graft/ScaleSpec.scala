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

  test("ngramJaccard: df cap bounds index fan-out without changing scores") {
    import spark.implicits._
    // two true near-dups sharing rare grams, plus many docs sharing
    // one stop-phrase ("x y z" gram) that would otherwise fan out k²
    val nearDupA = "alpha beta gamma delta epsilon zeta"
    val nearDupB = "alpha beta gamma delta epsilon eta!"
    val boiler = (0 until 20).map(i => s"x y z filler$i%02d pad words here".take(34))
    val docs = (Seq(nearDupA, nearDupB) ++ boiler).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "synthetic", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-cap").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // cap 4 drops the shared stop-gram "x y z" (df=20) from the index;
    // the true pair must still be found with its exact score
    val capped = graft.dedup.Dedup.ngramJaccard(spark, dir, maxGramDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(capped == Seq((0L, 1L)), s"expected only the true near-dup pair, got $capped")
    // uncapped finds the same pairs here (boilerplate shares 1 gram of
    // ~5 → jacc « 0.5), proving the cap only pruned the index
    val uncapped = graft.dedup.Dedup.ngramJaccard(spark, dir, maxGramDf = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(uncapped == capped)
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

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.dedup.Dedup
import graft.text.TextOps

/** Round-11 batch-11 operators: pagerank floor/ordering, Gini vs a
  * brute-force single-partition recompute, Benford share conservation,
  * HHI bounds, sorted-neighborhood ⊆ gram-index recall, mutual-kNN
  * handshake parity, temporal-split conservation.
  */
class Widening11fSpec extends AnyFunSuite {
  import SparkTestSession._

  test("pagerank: teleport floor, descending order, type from id space") {
    val rows = Analytics.qPagerank(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 150000L, "rank can never drop below the teleport mass")
      // r12 parity encoding: customers even (key*2), suppliers odd
      assert(r.getString(1) == (if (r.getLong(0) % 2 == 1) "supplier" else "customer"))
    }
    assert(rows.map(_.getLong(3)).toSeq == rows.map(_.getLong(3)).sortBy(-_).toSeq)
    // a top-20 node with zero degree is impossible: it would sit at the
    // floor while every traded node collects in-flow
    assert(rows.head.getLong(2) > 0)
  }

  test("gini matches a brute-force recompute of the rank-sum identity") {
    val got = Analytics.qGini(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val spends = Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) AS c")
      .groupBy("o_custkey").agg(sum("c").as("spend"))
      .join(Tables.customer(spark, sf).selectExpr("c_custkey", "c_mktsegment AS seg"),
        col("o_custkey") === col("c_custkey"))
      .select("seg", "spend").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    spends.foreach { case (seg, xs) =>
      val n = xs.length.toLong
      val s = xs.sum
      // r12: the rank-weighted sum runs over dollars (spend DIV 100) —
      // mirror that scale exactly (ScaleSpec holds the BigInt form)
      val sd = xs.map(_ / 100).sum
      val t = xs.zipWithIndex.map { case (x, i) => (i + 1) * (x / 100) }.sum
      val expected = (2 * t - (n + 1) * sd) / math.max(n * sd / 10000, 1L)
      val (gn, gs, gb) = got(seg)
      assert(gn == n && gs == s && gb == expected, s"segment $seg")
      assert(gb >= 0 && gb < 10000)
    }
  }

  test("benford: digit shares conserve and cover all orders >= 1") {
    val rows = Analytics.qBenford(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L))
    val nOrders = Tables.orders(spark, sf).filter(col("o_totalprice") >= 1).count()
    assert(rows.map(_.getLong(1)).sum == nOrders)
    val obsSum = rows.map(_.getLong(2)).sum
    assert(obsSum >= 10000 - 9 && obsSum <= 10000, "floored shares lose at most 1bp each")
    rows.foreach(r => assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3))))
  }

  test("hhi sits between the uniform floor and monopoly, top share consistent") {
    Analytics.qHhi(spark, sf).collect().foreach { r =>
      val (n, hhi, top) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hhi <= 10000, "monopoly is the ceiling")
      // uniform shares minimize HHI at 10000/n; integer truncation of
      // each share_bp can shave at most ~2n bp off the exact sum
      assert(hhi >= 10000 / n - 2, s"HHI $hhi below uniform floor for n=$n")
      assert(top.toDouble * top <= (hhi + 1).toDouble * 10000,
        "top share alone cannot exceed the concentration it contributes")
    }
  }

  test("sorted-neighborhood pairs at >=0.5 jaccard are gram-index pairs too") {
    val snm = Dedup.sortedNeighborhood(spark, sf)
    snm.collect().foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3, "window distance bound")
      assert(r.getDouble(3) >= 0.3)
    }
    val strong = snm.filter(col("jacc") >= 0.5)
      .select(least(col("doc_a"), col("doc_b")).as("a"),
        greatest(col("doc_a"), col("doc_b")).as("b"))
    val idx = Dedup.ngramJaccard(spark, sf)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // the gram index blocks on 32-char LENGTH buckets, SNM on text
    // prefix — their recall gaps must be complementary, not nested: an
    // SNM pair the index misses is only legitimate if it straddles a
    // length-bucket boundary (the index's documented blind spot)
    val lb = Tables.documents(spark, sf).selectExpr("doc_id", "n_chars DIV 32 AS lb")
    val missed = strong.join(idx, Seq("a", "b"), "left_anti")
      .join(lb.selectExpr("doc_id AS a", "lb AS la"), "a")
      .join(lb.selectExpr("doc_id AS b", "lb AS lbb"), "b")
    assert(missed.filter(col("la") === col("lbb")).count() == 0,
      "an SNM pair the gram index misses must straddle a length bucket")
  }

  test("mutual-knn: handshake parity and full coverage of the vector base") {
    val rows = Dedup.mutualKnn(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nVecs, "histogram must cover every vector")
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 3,
      "mutual degree is capped by k"))
    val degreeMass = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(degreeMass % 2 == 0, "every mutual edge contributes exactly two endpoints")
  }

  test("temporal split conserves events and bounds the leakage") {
    val rows = TextOps.splitTemporal(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "eval"))
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    val shareSum = rows.map(_.getLong(3)).sum
    assert(shareSum >= 9998 && shareSum <= 10000)
    val span = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == span), "span count is a corpus-level fact")
    assert(span <= rows.map(_.getLong(2)).min,
      "users on both sides cannot exceed either side's user count")
  }
}

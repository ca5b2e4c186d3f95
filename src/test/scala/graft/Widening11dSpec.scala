package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, SourceQueries}
import graft.text.TextOps
import graft.dedup.Dedup
import graft.functions.WinnowScan
import org.apache.spark.unsafe.types.UTF8String

/** Round-11 batch-9 operators: the winnowing guarantee, silhouette
  * bounds, an independent triangle recount, and coverage-grid
  * conservation — the invariants the oracle hash can't see.
  */
class Widening11dSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fps(s: String): Set[Long] =
    WinnowScan.scan(UTF8String.fromString(s), 16, 8).toLongArray().toSet

  test("winnowing guarantee: a shared run of >= gram+window-1 chars shares a fingerprint") {
    // Schleimer et al. 2003, property 1: any match of length
    // >= w + k - 1 (= 23 here) is caught by at least one shared
    // window minimum, at ANY alignment in either document.
    val run = "the quick brown fox jumps!" // 26 chars > 23
    val a = s"left padding text $run and a tail here"
    val b = s"completely different prefix material $run other suffix"
    assert((fps(a) & fps(b)).nonEmpty, "shared run produced no shared fingerprint")
    // and disjoint texts share nothing
    val c = "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"
    assert((fps(a) & fps(c)).isEmpty)
  }

  test("winnowing scan: sorted distinct, under 2^31, empty below gram length") {
    val arr = WinnowScan.scan(
      UTF8String.fromString("a bench of winnowing text long enough to fingerprint"),
      16, 8).toLongArray()
    assert(arr.nonEmpty && arr.toSeq == arr.toSeq.sorted && arr.toSet.size == arr.length)
    assert(arr.forall(h => h >= 0 && h < (1L << 31)))
    assert(WinnowScan.scan(UTF8String.fromString("short text"), 16, 8)
      .toLongArray().isEmpty)
  }

  test("winnowing pairs: identical texts overlap fully when uncapped") {
    // two literal copies fingerprint identically; the df cap trims the
    // JOIN only, so a pair surviving it with n_shared == na == nb is
    // exactly the full-containment read
    val rows = TextOps.winnowingPairs(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        "shared fingerprints exceed a side's fingerprint count")
      assert(r.getLong(5) >= 2500 && r.getLong(5) <= 10000)
    }
  }

  test("silhouette: labels partition the corpus, score bounded, neg <= n") {
    val rows = graft.sim.Ann.silhouette(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(2) >= -10000 && r.getLong(2) <= 10000,
        s"mean silhouette ${r.getLong(2)} outside [-1,1] in bp")
      assert(r.getLong(3) <= r.getLong(1))
    }
  }

  test("triangle census agrees with a brute-force recount of the pair graph") {
    val row = Dedup.triangleCount(spark, sf).collect().head
    val edges = Dedup.embeddingCosine(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(row.getLong(0) == edges.size, "edge count mismatch")
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val deg = nodes.groupBy(identity).map { case (v, vs) =>
      v -> edges.count(e => e._1 == v || e._2 == v) }
    assert(row.getLong(1) == deg.values.map(d => d.toLong * (d - 1) / 2).sum)
    val tri = (for {
      (a, b) <- edges.toSeq
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield 1).size
    assert(row.getLong(2) == tri, s"triangle recount $tri != ${row.getLong(2)}")
    if (row.getLong(1) > 0)
      assert(row.getLong(3) == 3 * row.getLong(2) * 10000 / row.getLong(1))
  }

  test("top paths: top-1 agrees with a direct recompute, counts descend") {
    val rows = Analytics.qTopPaths(spark, sf).collect()
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse), "not ranked by count")
    rows.foreach(r => assert(r.getString(0).split(">").length <= 3))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
    // direct recompute of the winning path
    val top = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("user_id")
      .agg(min(when(col("rn") === 1, col("event_type"))).as("t1"),
        min(when(col("rn") === 2, col("event_type"))).as("t2"),
        min(when(col("rn") === 3, col("event_type"))).as("t3"))
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
      .groupBy("path").count().orderBy(col("count").desc, col("path"))
      .collect().head
    assert(rows.head.getString(0) == top.getString(0) &&
      rows.head.getLong(1) == top.getLong(1))
  }

  test("backfill plan: ranges are disjoint, in-bounds, and truly empty") {
    val plan = SourceQueries.ingestBackfillPlan(spark, sf).collect()
    val e = Tables.events(spark, sf)
      .select(col("event_type"), expr("unix_micros(ts) DIV 3600000000").as("hr"))
    val Array(h0, h1) = e.agg(min("hr"), max("hr")).collect()
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val present = e.distinct().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    plan.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getLong(2) < y.getLong(1), "overlapping ranges")
        case _ =>
      }
    }
    plan.foreach { r =>
      val (t, s, en, n) = (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(s >= h0 && en <= h1 && n == en - s + 1)
      (s to en).foreach(hr => assert(!present((t, hr)),
        s"backfill range covers an hour that has events: $t@$hr"))
    }
  }
}

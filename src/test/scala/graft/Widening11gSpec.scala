package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.sim.Ann

/** Round-11 batch-12 operators: basket-pair arithmetic consistency,
  * beam-search rank sanity + score monotonicity, class-balance
  * determinism, top-coding vs a naive single-partition recompute.
  */
class Widening11gSpec extends AnyFunSuite {
  import SparkTestSession._

  test("basket pairs: support bounded by part frequencies, rates re-derive") {
    val rows = Analytics.qBasketPairs(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab >= 1 && nab <= math.min(na, nb),
        "pair support cannot exceed either part's order frequency")
      assert(r.getLong(5) == nab * 10000 / na)
    }
    // support is the primary rank key
    val s = rows.map(_.getLong(2)).toSeq
    assert(s == s.sortBy(-_), "pairs must rank by support first")
  }

  test("graph search: full beams, no self-hits, scores non-increasing by rank") {
    val res = Ann.graphSearch(spark, sf)
    val rows = res.collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 10, "every query must return a beam")
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length),
        s"query $q ranks must be dense from 1")
      assert(!rs.exists(_.getLong(1) == q), "a query must not retrieve itself")
      assert(rs.map(_.getLong(1)).distinct.length == rs.length)
    }
    // recomputed cosines must be non-increasing along each beam's ranks
    val e = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS emb")
    val scored = res
      .join(e.selectExpr("vec_id AS query_id", "emb AS qe"), "query_id")
      .join(e.selectExpr("vec_id AS neighbor_id", "emb AS ne"), "neighbor_id")
      .withColumn("cos", round(graft.functions.VectorExprs.cosineSim(col("qe"), col("ne")), 4))
      .select("query_id", "rank", "cos").collect()
      .groupBy(_.getLong(0))
    scored.foreach { case (q, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      assert(byRank == byRank.sortBy(-_), s"query $q beam not score-ordered")
    }
  }

  test("class balance: every label downsamples to the same floor, deterministically") {
    val r1 = Ann.classBalance(spark, sf).collect()
    val floor = r1.map(_.getLong(2)).min
    r1.foreach { r =>
      assert(r.getLong(2) == floor, "every label must keep exactly n_min")
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == (r.getLong(1) - r.getLong(2)) * 10000 / r.getLong(1))
    }
    assert(r1.map(_.getLong(1)).min == floor, "the floor is the minority class size")
    // hash-rank selection is a pure function of the keys: a second run
    // must keep the IDENTICAL membership, not just identical counts
    val r2 = Ann.classBalance(spark, sf).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(4))).toMap ==
      r2.map(r => (r.getLong(0), r.getLong(4))).toMap)
  }

  test("top coding matches a naive single-partition recompute") {
    val got = DlpQueries.dlpTopCoding(spark, sf).collect().head
    val vs = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS LONG) AS v")
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted
    val n = vs.length
    val k = math.max((19 * (n + 1)) / 20, 1)
    val p95 = vs(k - 1)._1
    assert(got.getLong(0) == n && got.getLong(1) == p95)
    assert(got.getLong(2) == vs.count(_._1 > p95))
    assert(got.getLong(3) == vs.filter(_._1 > p95).map(_._1 - p95).sum)
    assert(got.getLong(4) == vs.map(v => math.min(v._1, p95)).sum)
  }
}

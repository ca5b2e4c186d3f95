package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries, SourceQueries}
import graft.text.TextOps
import graft.dedup.Dedup

/** Round-11 batch-8 operators: invariants beyond the oracle hash —
  * conservation laws and dominance relations the oracle compare can't
  * see (it only proves Spark ≡ DuckDB on the same definition; these
  * prove the definition itself is coherent).
  */
class Widening11cSpec extends AnyFunSuite {
  import SparkTestSession._

  test("transition matrix conserves events: Σn = events − active users") {
    val m = Analytics.qTransitionMatrix(spark, sf)
    val sumN = m.agg(sum("n")).collect().head.getLong(0)
    val e = Tables.events(spark, sf).filter(col("user_id").isNotNull)
    val nEvents = e.count()
    val nUsers = e.select("user_id").distinct().count()
    // each user with k events contributes exactly k-1 transitions
    assert(sumN == nEvents - nUsers,
      s"transition mass $sumN != $nEvents - $nUsers")
    // row shares: bp re-derives from n and the from-type total
    val bad = m.groupBy("from_type")
      .agg(sum("n").as("tot"), collect_list(struct(col("n"), col("bp"))).as("rows"))
      .selectExpr("from_type", "exists(rows, r -> r.bp != r.n * 10000 DIV tot) AS broken")
      .filter(col("broken")).count()
    assert(bad == 0, "bp does not re-derive from n / from-type total")
  }

  test("windowed funnel never outruns the unbounded funnel") {
    val w = Analytics.qFunnelWindowed(spark, sf)
      .select(col("user_id"), col("stage").as("stage_w"))
    val u = Analytics.qSequenceMatch(spark, sf)
      .select(col("user_id"), col("stage").as("stage_u"))
    // a deadline can only REMOVE qualifying advances, never add one
    val violated = w.join(u, "user_id")
      .filter(col("stage_w") > col("stage_u")).count()
    assert(violated == 0, "time-bounded funnel advanced past the unbounded one")
    // and the bound must actually bite at this sf (weaker somewhere)
    val wTot = w.agg(sum("stage_w")).collect().head.getLong(0)
    val uTot = u.agg(sum("stage_u")).collect().head.getLong(0)
    assert(wTot <= uTot)
  }

  test("RFM segments: partition of the customer base, valid digit coding") {
    val seg = Analytics.qRfmSegments(spark, sf).collect()
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(seg.map(_.getLong(1)).sum == nCust,
      "segments must partition the ordering customers exactly")
    seg.foreach { r =>
      val s = r.getLong(0)
      val (d1, d2, d3) = (s / 100, (s / 10) % 10, s % 10)
      assert(d1 >= 1 && d1 <= 4 && d2 >= 1 && d2 <= 4 && d3 >= 1 && d3 <= 4,
        s"segment $s has an out-of-range quartile digit")
    }
  }

  test("degree histogram conserves vectors and pair endpoints") {
    val h = Dedup.degreeHubs(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(h.map(_.getLong(1)).sum == nVecs, "histogram must cover every vector")
    val nPairs = Dedup.embeddingCosine(spark, sf).count()
    val mass = h.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(mass == 2 * nPairs, s"degree mass $mass != 2 × $nPairs pairs")
  }

  test("k-fold split partitions the corpus; leaked docs really span folds") {
    val f = TextOps.splitKfold(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(f.map(_.getLong(1)).sum == nDocs, "folds must partition the corpus")
    assert(f.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    f.foreach(r => assert(r.getLong(3) <= r.getLong(1), "n_leaked > n_docs"))
    // cross-check the leak count against a direct re-derivation
    val direct = Tables.documents(spark, sf)
      .selectExpr("doc_id", "md5(text) AS th",
        s"${TextOps.HashBucketSql} % 5 AS fold")
      .groupBy("th").agg(countDistinct("fold").as("nf"), count(lit(1)).as("nd"))
      .filter(col("nf") >= 2)
      .agg(coalesce(sum("nd"), lit(0L))).collect().head.getLong(0)
    assert(f.map(_.getLong(3)).sum == direct, "per-fold leak counts disagree with direct count")
  }

  test("column profile detects the planted sensitivity layout") {
    val p = DlpQueries.dlpColumnProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val nRows = Tables.customer(spark, sf).count()
    // contact embeds one email + one phone per row by construction
    assert(p("contact").getLong(2) == nRows && p("contact").getLong(3) == nRows)
    assert(p("contact").getString(5) == "EMAIL_ADDRESS")
    assert(p("c_acctbal").getString(5) == "NUMBER")
    assert(p("c_name").getString(5) == "NONE")
    assert(p("c_mktsegment").getString(5) == "NONE")
  }

  test("freshness: the watermark type is never stale, shares bounded") {
    val rows = SourceQueries.ingestFreshnessLag(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types, "one row per event type")
    val freshest = rows.minBy(_.getLong(3))
    assert(freshest.getLong(3) == 0 && freshest.getLong(5) == 0,
      "the type holding the high-water mark must have zero lag")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "n_last_day cannot exceed n_events")
      // stale ⇔ diff > 60 min exactly; lag_min is the floor of diff,
      // so the flag brackets it (strict at 61, clear below 60)
      if (r.getLong(3) > 60) assert(r.getLong(5) == 1L, "lag > SLA but not stale")
      if (r.getLong(3) < 60) assert(r.getLong(5) == 0L, "lag under SLA marked stale")
    }
  }
}

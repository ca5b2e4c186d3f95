package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.dedup.Dedup
import graft.streaming.Streams

/** Round-11 batch-10 operators: b-bit estimator bounds, A/B arm
  * conservation, cohort-funnel conservation, and the transition state
  * machine's cross-trigger stream ≡ replay equivalence.
  */
class Widening11eSpec extends AnyFunSuite {
  import SparkTestSession._

  test("b-bit estimates stay in range and the gap is what it says") {
    val rows = Dedup.bbitMinhash(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, bbit, gap) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(est >= 0 && est <= 10000 && bbit >= 0 && bbit <= 10000)
      assert(gap == math.abs(bbit - est))
      // 1-bit slots can only LOSE information: on this >=0.5-Jaccard
      // pair list a full-slot match forces a bit match, so the clipped
      // b=1 estimator never reads below a full estimate of 10000 pairs
      if (est == 10000) assert(bbit == 10000,
        "identical signatures must read identical under 1-bit storage")
    }
  }

  test("A/B arms partition the user base and rates re-derive") {
    val r = Analytics.qAbLift(spark, sf).collect().head
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == users, "arms must partition the users")
    assert(ca <= na && cb <= nb)
    assert(r.getLong(4) == ca * 10000 / na && r.getLong(5) == cb * 10000 / nb)
  }

  test("cohort funnel conserves the funnel population") {
    val cf = Analytics.qCohortFunnel(spark, sf).collect()
    val seq = Analytics.qSequenceMatch(spark, sf)
      .filter(col("signup_us").isNotNull)
    assert(cf.map(_.getLong(1)).sum == seq.count(),
      "cohorts must partition the signed-up users")
    val purchased = seq.filter(col("stage") === 3).count()
    assert(cf.map(_.getLong(3)).sum == purchased)
    cf.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        "stage counts must nest: purchased <= clicked <= signup")
    }
  }

  test("transition machine: cross-trigger state matches the replay") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streams.FunnelEv]
    val q = Streams.transitionStreaming(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("trans_out").start()
    try {
      // trigger 1: user 1 view->click; trigger boundary must NOT lose
      // the click as the from-state of trigger 2's purchase
      src.addData(Streams.FunnelEv(1L, 10L, 10L, "view"),
        Streams.FunnelEv(1L, 11L, 20L, "click"))
      q.processAllAvailable()
      src.addData(Streams.FunnelEv(1L, 12L, 30L, "purchase"),
        Streams.FunnelEv(2L, 20L, 5L, "signup"))
      q.processAllAvailable()
      // disorder within a trigger: event_id 14 at us=35 arrives after
      // 15 at us=45 in the batch; the bounded reorder restores time order
      src.addData(Streams.FunnelEv(2L, 15L, 45L, "error"),
        Streams.FunnelEv(2L, 14L, 35L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("trans_out").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map(("view", "click") -> 1, ("click", "purchase") -> 1,
      ("signup", "view") -> 1, ("view", "error") -> 1),
      s"stream transitions wrong: $got")
  }

  test("transition replay equals the lag-window form at gate data") {
    val replay = Streams.transitionReplay(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val window = Analytics.qTransitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(replay == window,
      "state-machine replay diverges from the window semantics")
  }
}

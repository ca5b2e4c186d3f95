package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams
import graft.text.TextOps

/** Round-11 batch-16 operators: rate-limit brute-force recount +
  * streaming equivalence across triggers, RAKE structural invariants.
  */
class Widening11kSpec extends AnyFunSuite {
  import SparkTestSession._

  test("rate limit matches a brute-force per-window recount") {
    val got = Streams.rateLimit(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("user_id").isNotNull)
      .selectExpr("user_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1) / 60000000L))
    val byUser = ev.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { case (uid, (n, thr, peak, nw)) =>
      val wins = byUser(uid).groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(n == byUser(uid).length.toLong)
      assert(thr == wins.values.map(c => math.max(c - 5, 0L)).sum, s"user $uid throttle count")
      assert(peak == wins.values.max && nw == wins.size.toLong)
    }
  }

  test("rate limiter: streaming decisions match the batch rule across triggers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val q = Streams.rateLimitStreaming(src.toDS(), limit = 2L)
      .writeStream.outputMode("append").format("memory")
      .queryName("rate_out").start()
    try {
      // trigger 1: three events in one window for user 1 — the third
      // must throttle; user 2 stays under
      src.addData(Streams.Ev(1L, 10L, 1000L), Streams.Ev(1L, 11L, 2000L),
        Streams.Ev(1L, 12L, 3000L), Streams.Ev(2L, 20L, 1000L))
      q.processAllAvailable()
      // trigger 2: the SAME window continues for user 1 — state must
      // carry the count across the trigger boundary (4th event
      // throttles too); then a new window resets the count
      src.addData(Streams.Ev(1L, 13L, 4000L),
        Streams.Ev(1L, 14L, 60000000L + 1000L))
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.table("rate_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((1L, 12L), (1L, 13L)),
      s"exactly the over-limit events must throttle, got $hits")
  }

  test("RAKE keywords: structural invariants and stopword-free phrases") {
    val rows = TextOps.keywords(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val words = r.getString(0).split(" ")
      assert(words.length == r.getLong(1), "n_words must equal the phrase length")
      assert(!words.exists(TextOps.RakeStop.contains), "phrases never contain stopwords")
      assert(r.getLong(2) >= 1 && r.getLong(3) > 0)
    }
    val s = rows.map(_.getLong(3)).toSeq
    assert(s == s.sortBy(-_), "phrases rank by score")
  }
}

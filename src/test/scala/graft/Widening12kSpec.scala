package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.streaming.Streams
import graft.text.TextOps

/** Round-12 batch-14 operators: Spearman rank correlation, Bowley
  * quartile skewness, priority-mix TVD drift, infotype co-occurrence,
  * intra-doc duplicate bigrams, session concurrency curve.
  */
class Widening12kSpec extends AnyFunSuite {
  import SparkTestSession._

  // sf0.001 has 10 suppliers over 25 nations — every nation has < 2,
  // so ρ is undefined everywhere (documented degenerate); the real
  // assertions run at sf0.01 (4 suppliers/nation).
  val sf01 = "/root/testdata/sf0.01"

  test("spearman: rho re-derives from independently ranked collections") {
    assert(Analytics.qSpearmanRho(spark, sf).count() == 0,
      "sf0.001: all nations below the 2-supplier floor")
    val perSupp = Tables.lineitem(spark, sf01)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")).as("rev_c"),
        count(lit(1)).as("vol"))
      .join(Tables.supplier(spark, sf01).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"), col("l_suppkey"), col("rev_c"), col("vol"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = perSupp.groupBy(_._1).filter(_._2.length >= 2).map { case (nation, ss) =>
      val byRev = ss.sortBy(s => (-s._3, s._2)).zipWithIndex.map { case (s, i) => s._2 -> (i + 1L) }.toMap
      val byVol = ss.sortBy(s => (-s._4, s._2)).zipWithIndex.map { case (s, i) => s._2 -> (i + 1L) }.toMap
      val d2 = ss.map(s => { val d = byRev(s._2) - byVol(s._2); d * d }).sum
      val n = ss.length.toLong
      nation -> (n, d2, 10000L - (60000L * d2) / (n * (n * n - 1)))
    }
    val got = Analytics.qSpearmanRho(spark, sf01).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, d2, rho) = expect(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == d2 && r.getLong(3) == rho,
        s"nation ${r.getLong(0)} spearman re-derives")
      assert(r.getLong(3) <= 10000L, "rho never exceeds +1")
    }
    Caches.clearAll()
  }

  test("bowley: quartiles rank-select and skew is sign-safe") {
    val daily = Tables.orders(spark, sf)
      .selectExpr("o_orderpriority",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS dn",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS sp")
      .groupBy(col("o_orderpriority"), col("dn"))
      .agg(sum(col("sp")).as("rev_c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (prio, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = sorted.length.toLong
      def at(rank: Long) = sorted((rank - 1).toInt)
      val (q1, q2, q3) = (at((n + 3) / 4), at((n + 1) / 2), at((3 * n + 3) / 4))
      val num = q3 + q1 - 2 * q2
      val skew =
        if (q3 == q1) 0L
        else if (num < 0) -(((-num) * 10000) / (q3 - q1))
        else (num * 10000) / (q3 - q1)
      prio -> (n, q1, q2, q3, skew)
    }
    val got = Analytics.qBowleySkew(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, q1, q2, q3, skew) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((n, q1, q2, q3, skew)), s"${r.getString(0)} bowley re-derives")
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4),
        "quartiles ordered")
    }
    Caches.clearAll()
  }

  test("mix shift: TVD re-derives from year-priority shares") {
    val mix = Tables.orders(spark, sf)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val years = mix.map(_._1).distinct.sorted
    val nYear = mix.groupBy(_._1).map { case (y, g) => y -> g.map(_._3).sum }
    val share = mix.map { case (y, p, n) => (y, p) -> n * 10000L / nYear(y) }.toMap
    val expect = years.tail.map { y =>
      val prev = years(years.indexOf(y) - 1)
      val prios = mix.filter(_._1 == y).map(_._2).filter(p => share.contains((prev, p)))
      y -> (nYear(y), prios.length.toLong,
        prios.map(p => math.abs(share((y, p)) - share((prev, p)))).sum / 2)
    }.toMap
    val got = Analytics.qMixShift(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, np, tvd) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, np, tvd)),
        s"year ${r.getLong(0)} TVD re-derives")
      assert(r.getLong(3) <= 10000L, "TVD is a share")
    }
    Caches.clearAll()
  }

  test("infotype co-occurrence: flags come from re-inspection and lift re-derives") {
    val custkeys = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val emailRe = graft.etl.Dlp.EmailRe.r
    val phoneRe = graft.etl.Dlp.PhoneRe.r
    val ipRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
    val flags = custkeys.map { k =>
      val v = (if (k % 3 > 0) s"user$k@example.com " else "") +
        (if (k % 2 > 0) f"call 555-867-${k % 10000}%04d " else "") +
        (if (k % 5 == 0) s"from 10.0.${k % 256}.${k % 97}" else "")
      (emailRe.findFirstIn(v).isDefined, phoneRe.findFirstIn(v).isDefined,
        ipRe.findFirstIn(v).isDefined)
    }
    val nRec = flags.length.toLong
    def n(f: ((Boolean, Boolean, Boolean)) => Boolean) = flags.count(f).toLong
    val expect = Map(
      ("EMAIL_ADDRESS", "PHONE_NUMBER") -> (n(_._1), n(_._2), n(t => t._1 && t._2)),
      ("EMAIL_ADDRESS", "IP_ADDRESS") -> (n(_._1), n(_._3), n(t => t._1 && t._3)),
      ("PHONE_NUMBER", "IP_ADDRESS") -> (n(_._2), n(_._3), n(t => t._2 && t._3)))
    val got = DlpQueries.dlpInfotypeCooccurrence(spark, sf).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (na, nb, nBoth) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == nRec && r.getLong(3) == na && r.getLong(4) == nb &&
        r.getLong(5) == nBoth, s"${r.getString(0)}x${r.getString(1)} marginals re-derive")
      assert(r.getLong(6) == nBoth * 10000 / nRec, "joint share re-derives")
      assert(r.getLong(7) ==
        (if (na * nb == 0) 0L else nBoth * nRec * 10000 / (na * nb)),
        "lift re-derives")
    }
    Caches.clearAll()
  }

  test("dup ngrams: source rollup matches a driver bigram census") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (_, src, text) =>
      val ws = text.split(" ", -1)
      val grams = ws.sliding(2).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).map(_._2.length.toLong)
      (src, counts.sum, counts.filter(_ >= 2).sum)
    }
    val expect = perDoc.groupBy(_._1).map { case (src, ds) =>
      val (nG, dup) = (ds.map(_._2).sum, ds.map(_._3).sum)
      src -> (ds.length.toLong, nG, dup, dup * 10000L / nG,
        ds.count(d => d._3 * 10000 > d._2 * 2000) * 10000L / ds.length)
    }
    val got = TextOps.dupNgrams(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nDocs, nG, dup, dupBp, flagBp) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((nDocs, nG, dup, dupBp, flagBp)), s"${r.getString(0)} bigram census matches")
    }
    Caches.clearAll()
  }

  test("concurrency curve: hourly depth matches a driver sweep") {
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sessions: 30-min-gap islands per user (the sessionizeBatch rule)
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).map(_._3)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (start, last) = (sorted.head, sorted.head)
      sorted.tail.foreach { us =>
        if (us - last > Streams.SessionGapUs) { out += ((start, last)); start = us }
        last = us
      }
      out += ((start, last))
      out.map { case (s, e) => (s / 60000000L, e / 60000000L + 1) }
    }
    val deltas = (sessions.map(s => s._1 -> 1L) ++ sessions.map(s => s._2 -> -1L))
      .groupBy(_._1).map { case (m, ds) => m -> ds.map(_._2).sum }
    val starts = sessions.groupBy(_._1).map { case (m, ss) => m -> ss.length.toLong }
    val (lo, hi) = (sessions.map(_._1).min, sessions.map(_._2).max)
    var depth = 0L
    val perMin = (lo to hi).map { m =>
      depth += deltas.getOrElse(m, 0L); (m, depth, starts.getOrElse(m, 0L))
    }
    assert(depth == 0L, "sweep conserves: final depth zero")
    val expect = perMin.groupBy(_._1 / 60).map { case (hr, ms) =>
      hr * 3600L -> (ms.length.toLong, ms.map(_._2).max,
        ms.map(_._2).sum / ms.length, ms.map(_._3).sum)
    }
    val got = Streams.concurrencyCurveBatch(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nMin, peak, mean, nSt) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nMin, peak, mean, nSt)), s"hour ${r.getLong(0)} depth profile matches")
    }
    assert(got.map(_.getLong(4)).sum == sessions.length.toLong,
      "session starts conserve across hours")
    Caches.clearAll()
  }
}

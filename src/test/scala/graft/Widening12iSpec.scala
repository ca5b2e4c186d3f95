package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.text.TextOps

/** Round-12 batch-12 operators: rank-ratio windows, activity streaks,
  * weighted median, chi-square audit, rolling median, readability.
  */
class Widening12iSpec extends AnyFunSuite {
  import SparkTestSession._

  test("percent rank: ratios re-derive from ranked supplier revenues") {
    val revs = Tables.lineitem(spark, sf)
      .selectExpr("l_suppkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p")
      .groupBy("l_suppkey").agg(sum("p").as("rev"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sups = Tables.supplier(spark, sf)
      .selectExpr("s_suppkey", "CAST(s_nationkey AS BIGINT) AS n")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byNation = sups.groupBy(_._2).map { case (n, ss) =>
      n -> ss.map(s => (s._1, revs.getOrElse(s._1, 0L))).sortBy(t => (t._2, t._1))
    }
    val got = Analytics.qPercentRank(spark, sf).collect()
    assert(got.nonEmpty, "top-decile cut must be non-empty at sf0.001")
    got.foreach { r =>
      val (nation, sk, rev) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val grp = byNation(nation)
      val n = grp.length.toLong
      val rank = grp.count(_._2 < rev).toLong + 1 // rank of first tie
      val nLe = grp.count(_._2 <= rev).toLong
      val prBp = if (n == 1) 0L
        else math.round((rank - 1).toDouble / (n - 1).toDouble * 10000.0)
      val cdBp = math.round(nLe.toDouble / n.toDouble * 10000.0)
      assert(r.getLong(3) == prBp && r.getLong(4) == cdBp,
        s"nation $nation supplier $sk: ratio mismatch")
      assert(cdBp >= 9000, "every emitted row is in the cume_dist top decile")
    }
    Caches.clearAll()
  }

  test("streaks: histogram matches a driver gaps-and-islands fold") {
    val days = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) DIV 86400000000 AS dn")
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val perUser = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      // island lengths: split where the day gap exceeds 1
      val lens = sorted.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, d)                         => List((d, 1L))
        case ((last, len) :: t, d) if d == last + 1 => (d, len + 1) :: t
        case (acc, d)                         => (d, 1L) :: acc
      }.map(_._2)
      u -> (lens.max, sorted.length.toLong)
    }
    val expect = perUser.values.groupBy(_._1).map { case (len, us) =>
      len -> (us.size.toLong, us.map(_._2).sum)
    }
    val got = Analytics.qStreaks(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nUsers, userDays) = expect(r.getLong(0))
      assert(r.getLong(1) == nUsers && r.getLong(2) == userDays,
        s"streak ${r.getLong(0)}: histogram diverges from the driver fold")
    }
    Caches.clearAll()
  }

  test("weighted median: two-level crossing equals a single-pass fold") {
    val lines = Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = lines.groupBy(_._1).map { case (f, ls) =>
      val byPrice = ls.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      val tot = byPrice.map(_._2).sum
      var cum = 0L
      val med = byPrice.collectFirst {
        case (p, w) if { cum += w; cum * 2 >= tot } => p
      }.get
      f -> (tot, med)
    }
    val got = Analytics.qWeightedMedian(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (tot, med) = expect(r.getString(0))
      assert(r.getLong(1) == tot && r.getLong(2) == med,
        s"flag ${r.getString(0)}: weighted median diverges")
    }
    Caches.clearAll()
  }

  test("chi-square: cells conserve totals and contributions re-derive") {
    val rows = Analytics.qChiSquare(spark, sf).collect()
    val orders = Tables.orders(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == orders, "Σobs must equal the order count")
    val rs = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val cs = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val chi2 = rows.map(_.getLong(4)).sum
    rows.foreach { r =>
      val expF = rs(r.getString(0)) * cs(r.getString(1)) / orders
      val d = r.getLong(2) - expF
      assert(r.getLong(3) == expF, "floored expectation re-derives from marginals")
      assert(r.getLong(4) == d * d * 1000000L / math.max(expF, 1L))
      assert(r.getLong(5) == chi2, "every row carries the same folded statistic")
    }
    Caches.clearAll()
  }

  test("moving median: frame fence-posts and an exact sliding recompute") {
    val got = Analytics.qMovingMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byPrio = got.groupBy(_._1)
    byPrio.foreach { case (prio, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, _, _, nIn, med2), i) =>
        assert(nIn == math.min(i + 1, 7).toLong, s"$prio row $i: frame size")
        val frame = sorted.slice(math.max(0, i - 6), i + 1).map(_._3 * 2).sorted
        val n = frame.length
        val exact =
          if (n % 2 == 1) frame(n / 2)
          else (frame(n / 2 - 1) + frame(n / 2)) / 2
        assert(med2 == exact, s"$prio day ${sorted(i)._2}: median diverges")
      }
    }
    Caches.clearAll()
  }

  test("readability: counts and the milli-score re-derive via Java regex") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val scores = ds.map { case (_, t) =>
        val w = math.max("""\S+""".r.findAllIn(t).length, 1).toLong
        val s = math.max("""[.!?]+""".r.findAllIn(t).length, 1).toLong
        val v = math.max("""[aeiou]+""".r.findAllIn(t.toLowerCase).length, 1).toLong
        (w, 206835L - (1015L * w) / s - (84600L * v) / w)
      }
      val sum = scores.map(_._2).sum
      val mean = if (sum >= 0) sum / scores.length else -((-sum) / scores.length)
      src -> (scores.length.toLong, scores.map(_._1).sum, mean,
        scores.count(_._2 >= 60000L).toLong * 10000 / scores.length,
        scores.count(_._2 < 30000L).toLong * 10000 / scores.length)
    }
    val got = TextOps.readability(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, words, mean, easyBp, hardBp) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((n, words, mean, easyBp, hardBp)),
        s"source ${r.getString(0)}: readability rollup diverges")
    }
    Caches.clearAll()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries}
import graft.sim.Ann
import graft.streaming.Streams
import graft.text.TextOps

/** Round-12 batch-8 operators: left-outer attribution join,
  * boilerplate screen, clustering-depth audit, vault key rotation,
  * hard-negative mining.
  */
class Widening12eSpec extends AnyFunSuite {
  import SparkTestSession._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("outer event join: every click survives, matched rows equal the inner join") {
    val outer = Streams.eventJoinOuterBatch(spark, sf).collect()
    val inner = Streams.eventJoinBatch(spark, sf).collect()
    val nClicks = Tables.events(spark, sf)
      .filter(col("event_type") === "click").count()
    // every click appears at least once — the whole point of the outer form
    assert(outer.map(_.getLong(1)).distinct.length.toLong == nClicks,
      "outer join must preserve every click")
    // the matched subset IS the inner join, value for value
    val matched = outer.filter(_.getLong(4) == 1L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val innerT = inner
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    assert(matched.toSeq == innerT.toSeq,
      "matched outer rows must reproduce the inner join exactly")
    // unmatched rows are single null-purchase rows per click
    outer.filter(_.getLong(4) == 0L).foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3),
        "an unmatched click must carry null purchase_id and lag_us")
    }
    Caches.clearAll()
  }

  test("boilerplate: per-doc counts match a full driver-side recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // recompute the whole operator in plain Scala: 8-word segments
    // capped at 16, md5 keys, boilerplate = hash in >= 3 distinct docs
    val segs = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      val nSeg = math.min(ws.length / 8, 16)
      (0 until nSeg).map(i => id -> md5hex(ws.slice(i * 8, i * 8 + 8).mkString(" ")))
    }
    val boiler = segs.groupBy(_._2).collect {
      case (h, occ) if occ.map(_._1).distinct.length >= 3 => h
    }.toSet
    val expect = segs.groupBy(_._1).map { case (id, ss) =>
      val nb = ss.count(s => boiler(s._2))
      id -> (ss.length.toLong, nb.toLong, nb.toLong * 10000 / ss.length)
    }.filter(_._2._2 > 0)
    val got = TextOps.boilerplate(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect,
      s"boilerplate table diverges from the driver recompute (${got.size} vs ${expect.size} docs)")
    assert(got.nonEmpty, "the sf0.001 corpus must contain repeated segments")
    Caches.clearAll()
  }

  test("cluster depth: histogram matches a driver-side interval sweep") {
    val files = Tables.lineitem(spark, sf)
      .groupBy((year(col("l_shipdate")) * 10000 + month(col("l_shipdate")) * 100 +
        dayofmonth(col("l_shipdate"))).cast("long").as("fk"))
      .agg(min(col("l_orderkey")).as("rmin"), max(col("l_orderkey")).as("rmax"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // classic sweep in plain Scala over the file stats
    val deltas = files.flatMap { case (lo, hi) => Seq(lo -> 1L, (hi + 1) -> -1L) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var depth = 0L
    val segsB = Seq.newBuilder[(Long, Long)]
    deltas.sliding(2).foreach {
      case Seq((p, d), (np, _)) =>
        depth += d
        if (depth > 0) segsB += depth -> (np - p)
      case _ =>
    }
    val segs = segsB.result()
    val covered = segs.map(_._2).sum
    val expect = segs.groupBy(_._1).map { case (d, ss) =>
      d -> (ss.length.toLong, ss.map(_._2).sum, ss.map(_._2).sum * 10000 / covered)
    }
    val got = Analytics.layoutClusterDepth(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect, "depth histogram diverges from the driver sweep")
    // ingest-ordered files over a correlated key must still overlap
    // somewhere (depth > 1 exists) or the audit would be vacuous
    assert(got.keys.max >= 1 && got.keys.max <= files.length.toLong)
    Caches.clearAll()
  }

  test("vault rotation: bijective re-keying, every fact row accounted for") {
    val rows = DlpQueries.dlpVaultRotation(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val nCust = Tables.customer(spark, sf).count()
    val nNames = Tables.customer(spark, sf).select(col("c_name")).distinct().count()
    assert(rows.map(_._3).sum == nCust, "every tokenized fact row must be re-keyed")
    assert(rows.length.toLong == nNames, "one audit row per distinct plaintext")
    assert(rows.forall(_._4 == 0L), "deterministic re-keying must never collide")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.map(_._2).distinct.length == rows.length,
      "old -> new must be a bijection")
    assert(rows.forall(r => r._1 != r._2 && r._2.startsWith("TOK_")),
      "v2 tokens must actually change")
    Caches.clearAll()
  }

  test("hard negatives: labels differ, flags re-derive from the margin") {
    val labels = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Ann.hardNegatives(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq,
        s"query $q ranks must be contiguous from 1")
      rs.foreach { r =>
        assert(labels(r.getLong(1)) != labels(q),
          s"negative ${r.getLong(1)} shares query $q's label")
        if (r.isNullAt(4)) // no positive in the cell: trivially hard
          assert(r.getLong(3) == 1L)
        else
          assert(r.getLong(3) == (if (r.getLong(4) >= 0L) 1L else 0L),
            "is_hard must re-derive from the micro-margin sign")
      }
    }
    Caches.clearAll()
  }
}

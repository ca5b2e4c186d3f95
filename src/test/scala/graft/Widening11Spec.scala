package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics
import graft.multimodal.Multimodal

/** Round-11 widening operators: cross-operator invariants the oracle
  * hash can't see (pruning actually pruned, curves actually monotone,
  * two independent operators agree on the same underlying quantity).
  */
class Widening11Spec extends AnyFunSuite {
  import SparkTestSession._

  test("bloom prefilter: no false negatives, and the gate actually prunes") {
    val batch = Tables.documents(spark, sf).filter(col("doc_id") % 2 === 1)
    val nBatch = batch.count()
    val cand = graft.dedup.Dedup.bloomCandidates(spark, sf)
    val nCand = cand.count()
    // every true dup must survive the gate (bloom contract)
    val verified = graft.dedup.Dedup.bloomPrefilter(spark, sf)
    assert(verified.count() == nBatch, "one verdict row per batch doc")
    val nDup = verified.filter(col("is_dup") === 1).count()
    assert(nCand >= nDup, "gate dropped a true duplicate (false negative)")
    // and the gate must be a gate: with 1M-slot sizing over a ≤5500-doc
    // corpus the false-positive rate is ~0, so candidates ≈ dups
    assert(nCand < nBatch, s"bloom gate passed everything ($nCand of $nBatch)")
    assert(nCand <= nDup + (nBatch / 10).max(4),
      s"false-positive residue too fat: $nCand candidates for $nDup dups")
  }

  test("13-gram contamination: only non-train docs, each with a train source") {
    val rows = graft.dedup.Dedup.ngram13Contamination(spark, sf).collect()
    val split = Tables.documents(spark, sf)
      .selectExpr("doc_id", s"${graft.text.TextOps.SplitCaseSql} AS split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(split(r.getLong(0)) != "train", "a train doc flagged itself")
      assert(r.getString(1) == split(r.getLong(0)))
      assert(r.getLong(2) >= 1, "flagged with zero shared grams")
      assert(split(r.getLong(3)) == "train", "canonical source not in train")
    }
  }

  test("int8 recall: 5-exact denominator, sane bp, quantization stays useful") {
    val rows = graft.sim.Ann.int8Recall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) == 5)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
      assert(r.getLong(3) == r.getLong(2) * 10000 / 5)
    }
    // 254-level scalar quantization barely perturbs cosine order —
    // if mean recall drops below half, the quantizer is broken
    assert(rows.map(_.getLong(3)).sum / rows.length >= 5000,
      "mean int8 recall collapsed")
  }

  test("threshold curve: monotone, and the .35 point equals dedup_embedding_cos") {
    val curve = graft.sim.Ann.thresholdCurve(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(curve.keySet == Set(2000L, 3500L, 5000L, 7000L, 9000L))
    val sorted = curve.toSeq.sortBy(_._1).map(_._2)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      s"pair volume must not grow with the cutoff: $curve")
    // the 0.35 cutoff IS dedup_embedding_cos's threshold over the same
    // candidate buckets — two independent codepaths, one quantity
    val prod = graft.dedup.Dedup.embeddingCosine(spark, sf).count()
    assert(curve(3500L) == prod,
      s"curve point ${curve(3500L)} != production pair count $prod")
  }

  test("zipf fit: dense ranks, non-increasing frequency, product consistency") {
    val rows = graft.text.TextOps.zipfFit(spark, sf).collect()
    assert(rows.length <= 50 && rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1, "ranks must be dense from 1")
      assert(r.getLong(3) == r.getLong(0) * r.getLong(2))
    }
    val freqs = rows.map(_.getLong(2))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("risk delta: generalization never increases exposure, exposure grows with k") {
    val rows = graft.operators.DlpQueries.dlpRiskDelta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(2L, 5L, 10L, 25L))
    rows.foreach { case (k, raw, gen) =>
      assert(gen <= raw, s"k=$k: generalized exposure $gen > raw $raw")
    }
    // exposed-below-k is monotone in k on both sides
    assert(rows.map(_._2).zip(rows.map(_._2).tail).forall { case (a, b) => a <= b })
    assert(rows.map(_._3).zip(rows.map(_._3).tail).forall { case (a, b) => a <= b })
  }

  test("token consistency: every FK cardinality survives tokenization") {
    val rows = graft.operators.DlpQueries.dlpTokenConsistency(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == 1,
        s"token ${r.getString(0)}: via-token ${r.getLong(1)} != via-raw ${r.getLong(2)}")
    }
  }

  test("session overlap equals the brute-force sweep for the smallest users") {
    val got = Analytics.qSessionOverlap(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val evs = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .selectExpr("user_id", "unix_seconds(ts) AS s").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    evs.toSeq.sortBy(_._2.length).take(3).foreach { case (u, starts) =>
      val brute = starts.map(s => starts.count(t => t <= s && s < t + 300)).max
      assert(got(u)._1 == brute, s"user $u: sweep ${got(u)._1} != brute $brute")
      assert(got(u)._2 == starts.length)
    }
    // endpoint ordering: depth never exceeds the interval count
    got.foreach { case (u, (mx, n)) => assert(mx >= 1 && mx <= n) }
  }

  test("skipping eval: zone maps prune the far-future predicate, never over-scan") {
    val total = Tables.lineitem(spark, sf).count()
    val rows = Analytics.layoutSkippingEval(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    rows.foreach { case (p, (nb, sk, scanned)) =>
      assert(sk <= nb, s"pred $p skipped more buckets than exist")
      assert(scanned <= total)
    }
    // date-bucketed zone maps are tight: the 1998-09+ predicate covers
    // <5% of the 1992-1998 span, so most buckets must prune
    assert(rows(4L)._2 >= rows(4L)._1 / 2,
      s"pred 4 skipped only ${rows(4L)._2} of ${rows(4L)._1} buckets")
  }

  test("partition plan: ceil-division invariants hold per month") {
    graft.operators.SourceQueries.loadPartitionPlan(spark, sf).collect().foreach { r =>
      val (rows_, bytes, nf, rpf) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nf == (bytes + 65535) / 65536)
      assert(rpf * nf >= rows_, "files under-cover the rows")
      assert((rpf - 1) * nf < rows_, "a file tier is empty")
    }
  }

  test("heartbeat alarms equal session splits (30-min contract shared with sessionize)") {
    // a >30-min silence is EXACTLY what closes a session: per user,
    // n_alarms must equal n_sessions - 1 — two independent operators,
    // one threshold
    val alarms = graft.streaming.Streams.heartbeatGap(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val sessions = graft.streaming.Streams.sessionizeBatch(spark, sf)
      .filter(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alarms.keySet == sessions.keySet)
    alarms.foreach { case (u, a) =>
      assert(a == sessions(u) - 1,
        s"user $u: $a alarms but ${sessions(u)} sessions")
    }
  }

  test("streaming heartbeat alarms match the batch audit per user") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[graft.streaming.Streams.Ev]
    val streamed = graft.streaming.Streams.heartbeatGapStreaming(evs).collect()
    val perUser = streamed.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
    val batch = graft.streaming.Streams.heartbeatGap(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    batch.foreach { case (u, (maxGap, nAlarms)) =>
      assert(perUser.getOrElse(u, 0L) == nAlarms,
        s"user $u: streaming fired ${perUser.getOrElse(u, 0L)}, batch says $nAlarms")
    }
    // every emitted alarm is a real over-threshold gap, and the widest
    // emitted gap equals the batch max where any alarm fired
    streamed.foreach(a => assert(a.gap_us > graft.streaming.Streams.SessionGapUs))
    streamed.groupBy(_.user_id).foreach { case (u, as) =>
      assert(as.map(_.gap_us).max == batch(u)._1,
        s"user $u: widest alarm ≠ batch max gap")
    }
  }

  test("heartbeat alarms fire across trigger boundaries from state, exactly once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.streaming.Streams.Ev]
    val q = graft.streaming.Streams.heartbeatGapStreaming(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("hb_out").start()
    val M = 60L * 1000000 // a minute in micros
    // trigger 1: user 1 at t=0 and t=10min (no alarm); user 2 at t=0
    src.addData(graft.streaming.Streams.Ev(1L, 1L, 0L),
      graft.streaming.Streams.Ev(1L, 2L, 10 * M),
      graft.streaming.Streams.Ev(2L, 3L, 0L))
    q.processAllAvailable()
    // trigger 2: user 1 returns 40min later -> the cross-trigger gap
    // must fire from STATE; user 2 returns within threshold -> silent
    src.addData(graft.streaming.Streams.Ev(1L, 4L, 50 * M),
      graft.streaming.Streams.Ev(2L, 5L, 20 * M))
    q.processAllAvailable()
    q.stop()
    val alarms = spark.table("hb_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(alarms.toSeq == Seq((1L, 40 * M, 50 * M)),
      s"expected exactly user 1's 40-min cross-trigger alarm, got ${alarms.toSeq}")
  }

  test("embedding align: corpus conserved, coverage bounded, majority sane") {
    val rows = Multimodal.embeddingAlign(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "modalities must partition the corpus")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "paired more than exist")
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
      if (r.getLong(2) > 0) assert(r.getLong(3) >= 1)
    }
  }

  test("fk discovery: declared FKs fully contained, negative control rejected") {
    val rows = graft.operators.SourceQueries.fkDiscovery(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(4))).toMap
    assert(rows.size == graft.operators.SourceQueries.FkCandidates.size)
    val negative = "orders.o_orderkey->customer.c_custkey"
    rows.foreach { case (name, (bp, isFk)) =>
      if (name == negative)
        assert(isFk == 0 && bp < 10000, s"negative control accepted: $bp bp")
      else
        assert(isFk == 1 && bp == 10000, s"$name: true FK rejected at $bp bp")
    }
  }

  test("surrogate annotate: no raw PII survives, both annotations present") {
    graft.operators.DlpQueries.dlpSurrogateAnnotate(spark, sf).collect().foreach { r =>
      val s = r.getString(1)
      assert(s.contains("EMAIL_ADDRESS(16):") && s.contains("PHONE_NUMBER(16):"))
      assert(!s.contains("@example.com"), s"raw email leaked: $s")
      assert(!s.matches(".*[0-9]{3}-[0-9]{3}-[0-9]{4}.*"), s"raw phone leaked: $s")
    }
  }

  test("shift consistency: every entity shifts coherently by key % 61 - 30") {
    graft.operators.DlpQueries.dlpShiftConsistency(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) == 1, s"custkey ${r.getLong(0)} shifted incoherently")
      assert(r.getLong(2) == r.getLong(0) % 61 - 30,
        s"custkey ${r.getLong(0)}: shift ${r.getLong(2)}")
    }
  }

  test("schema evolve: the two versions partition every status group") {
    graft.operators.SourceQueries.loadSchemaEvolve(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1),
        s"status ${r.getString(0)}: presence counts don't partition the rows")
    }
  }

  test("running distinct: cumulative curve ends at the true distinct count") {
    val rows = Analytics.qRunningDistinct(spark, sf).collect()
    val finalCum = rows.groupBy(_.getString(0))
      .view.mapValues(_.maxBy(_.getLong(1)).getLong(3)).toMap
    val truth = Tables.events(spark, sf).filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finalCum == truth, s"curve endpoints $finalCum != truth $truth")
    // per type: monotone, and increments equal the new_users column
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      sorted.foldLeft(0L) { (prev, r) =>
        assert(r.getLong(3) == prev + r.getLong(2)); r.getLong(3)
      }
    }
  }

  test("norm outliers: corpus conserved per label, outliers bounded") {
    val rows = graft.sim.Ann.normOutliers(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1))
      assert(r.getLong(5) >= 0 && r.getLong(5) <= 10000)
      assert(r.getLong(2) >= 0 && r.getLong(3) >= 0)
    }
  }

  test("lang confusion: cells conserve the corpus and shares stay in range") {
    val rows = graft.text.TextOps.langConfusion(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    rows.groupBy(_.getString(0)).values.foreach { cells =>
      val shares = cells.map(_.getLong(3))
      assert(shares.forall(s => s >= 0 && s <= 10000))
      // integer DIV truncation: shares sum to ≤ 10000 per declared lang
      assert(shares.sum <= 10000)
    }
  }

  test("MG sketch: error bound and heavy-key membership on a local skewed stream") {
    import graft.functions.SpaceSavingAgg
    // 1000×a, 500×b, 200×c, 50 distinct tail keys × 6 — N = 2000
    val stream = Seq.fill(1000)("a") ++ Seq.fill(500)("b") ++
      Seq.fill(200)("c") ++ (0 until 50).flatMap(i => Seq.fill(6)(s"t$i"))
    val n = stream.length
    val truth = stream.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val shuffled = new scala.util.Random(42).shuffle(stream)
    for (cap <- Seq(2, 8, 16); order <- Seq(stream, shuffled)) {
      val sum = SpaceSavingAgg.localSummary(order.iterator, cap)
      assert(sum.size <= cap)
      // guarantee: every key with freq > N/(cap+1) is present
      truth.filter(_._2 * (cap + 1) > n).keys.foreach(k =>
        assert(sum.contains(k), s"cap=$cap dropped guaranteed key $k"))
      // residual counters undercount by at most N/(cap+1), never over
      sum.foreach { case (k, c) =>
        assert(c <= truth(k), s"cap=$cap overcounted $k")
        assert(truth(k) - c <= n / (cap + 1), s"cap=$cap error bound broken for $k")
      }
    }
  }

  test("heavy hitters: guaranteed set is partitioning-invariant and eviction is real") {
    val base = Analytics.qHeavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(base.nonEmpty)
    // same query over a deliberately different physical partitioning:
    // the guaranteed membership must not move (merge-path coverage)
    val o = Tables.orders(spark, sf)
    Seq(1, 13).foreach { p =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-hh-$p").toString
      try {
        o.repartition(p).write.mode("overwrite").parquet(s"$dir/orders.parquet")
        // reuse every other table from sf via the operator's own reads
        val re = Analytics.qHeavyHitters(spark, dir.replace("file:", ""))
        // qHeavyHitters only reads orders, so pointing it at the tmp
        // dir (with only orders present) is the full input
        val got = re.collect().map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got == base, s"heavy set moved under $p partitions")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
    // eviction pressure is real: 3 statuses through cap-2 buffers
    val perMonth = base.groupBy(_._1).view.mapValues(_.size)
    assert(perMonth.values.forall(_ <= 2))
  }

  test("replay dedup: unique survivors equal the original stream exactly") {
    val rows = graft.streaming.Streams.replayDedup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orig = Tables.events(spark, sf).groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val replayed = Tables.events(spark, sf).filter(col("event_id") % 10 === 0)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == orig.keySet)
    rows.foreach { case (t, (delivered, unique, dropped)) =>
      assert(unique == orig(t), s"$t: dedup lost or invented events")
      assert(dropped == replayed.getOrElse(t, 0L), s"$t: absorbed ≠ redelivered")
      assert(delivered == unique + dropped)
    }
  }
}

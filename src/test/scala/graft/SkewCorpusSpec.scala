package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.streaming.Streams

/** Measured scale evidence on ONE shared skewed corpus (the
  * [[SkewCorpus]] generator, 10× multipliers + hot doc + hot user):
  * each family — dedup, ANN, funnel, sessionize — runs its production
  * operator against the corpus dir, asserts the scale-critical
  * property, logs its wall-time (the round-over-round record the
  * driver's bench can't see for synthetic skew), and proves it leaves
  * ZERO storage blocks behind. The events table is deterministically
  * scrambled on disk, so the hot user's 30k-event slice arrives with
  * displacement far beyond any bounded reorder buffer — the corpus
  * that catches buffer-order bugs batch gates at sf0.1 cannot. */
class SkewCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  // one corpus build serves every family: 500-doc base → 5000 spread
  // docs + 500 exact hot copies; 5000 embeddings; 10k spread events +
  // one 30k-event hot user
  private lazy val corpusDir: String = {
    val t0 = System.nanoTime()
    val d = SkewCorpus.write(spark, sf, docMult = 10, hotDocCopies = 500,
      embMult = 10, eventMult = 10, hotUserEvents = 30000)
    info(f"corpus build: ${(System.nanoTime() - t0) / 1e9}%.1f s → $d")
    d
  }

  private def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    info(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  private def assertNoStorage(family: String): Unit = {
    Caches.clearAll()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getRDDStorageInfo.isEmpty,
      s"$family left storage blocks behind")
  }

  test("dedup family: hot band bucket stays an equi-join, one component, batch-vs-corpus incremental") {
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "text")
    val bands = Dedup.bandKeys(corpus)
    // the minhashPairs band-join shape: equality join on (band_id, bk)
    // — never a cartesian, AQE handling the hot bucket's skew at runtime
    val cand = timed("dedup band self-join (5500 docs, 500-copy hot bucket)") {
      val c = bands.as("a").join(bands.as("b"),
          col("a.band_id") === col("b.band_id") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      c.count() // materialize so the executed plan is final
      c
    }
    val exec = cand.queryExecution.executedPlan.toString
    assert(exec.contains("AdaptiveSparkPlan"),
      "band self-join must run under AQE (runtime skew handling)")
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoop"),
      "band join degenerated to a cross product")
    // 500 hot copies + their base doc agree on every band: the
    // component loop must collapse the whole bucket to ONE cluster
    val hotBase = SkewCorpus.hotDocBase(500, 10)
    val comp = timed("dedup connected components") {
      Dedup.componentsFromPairs(corpus.select("doc_id"), cand)
    }
    val hotComp = comp.filter(col("doc_id") >= hotBase).select("comp").distinct().collect()
    assert(hotComp.length == 1, s"hot cluster split: ${hotComp.toSeq}")
    // incremental shape: a NEW batch of 100 hot-text docs against the
    // corpus index joins batch-vs-corpus only (candidate work is
    // O(batch × collisions), never corpus²)
    val hotText = Tables.documents(spark, sf).orderBy("doc_id")
      .select("text").head().getString(0)
    import spark.implicits._
    val batchDir = java.nio.file.Files.createTempDirectory("graft-skew-batch").toString
    (0 until 100).map(i => (20000L + i, hotText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(batchDir)
    val batch = spark.read.parquet(batchDir)
    val perDoc = timed("dedup incremental batch-vs-index join") {
      Dedup.bandKeys(batch).as("n")
        .join(bands.as("c"), col("n.band_id") === col("c.band_id") &&
          col("n.bk") === col("c.bk"))
        .select(col("n.doc_id").as("new_doc"), col("c.doc_id").as("corpus_doc"))
        .distinct()
        .groupBy("new_doc").count().collect()
    }
    assert(perDoc.length == 100, "every hot batch doc must hit the corpus index")
    assert(perDoc.forall(_.getLong(1) >= 500), "hot batch docs must see the full hot bucket")
    assertNoStorage("dedup")
  }

  test("ann family: brute-force and IVF top-k hold on the 10x embedding space") {
    val bf = timed("ann_topk_bruteforce (5000 vectors)") {
      SparkEntry.queries("ann_topk_bruteforce")(spark, corpusDir).collect()
    }
    assert(bf.nonEmpty, "brute-force top-k empty on skew corpus")
    val ivf = timed("ann_ivf_topk (5000 vectors)") {
      SparkEntry.queries("ann_ivf_topk")(spark, corpusDir).collect()
    }
    assert(ivf.nonEmpty, "IVF top-k empty on skew corpus")
    // base query vectors survive the corpus scale-up verbatim, so each
    // query id still resolves and ranks fully
    val byQ = bf.groupBy(_.getLong(0))
    byQ.values.foreach(rs => assert(rs.map(_.getLong(2)).min == 1L, "missing rank 1"))
    assertNoStorage("ann")
  }

  test("funnel family: corpus displacement exceeds the bounded buffer, engine-sorted replay stays exact") {
    import spark.implicits._
    val evs = Tables.events(spark, corpusDir)
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("signup", "click", "purchase"))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .as[Streams.FunnelEv]
    // premise first: the scrambled 30k-event hot slice REALLY exceeds
    // a 4096-slot reorder heap in batch execution — the bounded
    // streaming machine must surface overflow (flagged advances or
    // marker rows), proving this corpus exercises the beyond-buffer
    // regime the r10 heap replay silently got wrong
    val overflow = timed("funnel bounded-heap machine (overflow premise)") {
      Streams.funnelStagesStreaming(evs, 4096)
        .filter(col("user_id") === SkewCorpus.HotUserId)
        .agg(sum(col("reorder_overflow"))).head().getLong(0)
    }
    assert(overflow > 0L,
      "corpus no longer exceeds the bounded buffer — the scale premise is gone")
    // the production replay takes order from the engine: exact at this
    // (and any) disorder, proven against the independent window form
    val sm = timed("funnelStagesReplay (engine-sorted, 40k events)") {
      Streams.funnelStagesReplay(spark, corpusDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val win = timed("qSequenceMatch window form (oracle)") {
      graft.operators.Analytics.qSequenceMatch(spark, corpusDir).collect()
        .flatMap { r =>
          Seq(1 -> Option(r.get(1)), 2 -> Option(r.get(2)), 3 -> Option(r.get(3)))
            .collect { case (st, Some(us)) => (r.getLong(0), st.toLong, us.asInstanceOf[Long]) }
        }.toSet
    }
    assert(sm == win, s"state machine diverged from window form: " +
      s"only-sm=${(sm -- win).take(3)}, only-win=${(win -- sm).take(3)}")
    // the hot user's funnel lands at the fixed cycle offsets: signup
    // at i=2, first later click at i=4, first later purchase at i=8
    assert(sm((SkewCorpus.HotUserId, 1L, 2000L)) &&
      sm((SkewCorpus.HotUserId, 2L, 4000L)) &&
      sm((SkewCorpus.HotUserId, 3L, 8000L)),
      s"hot user stages wrong: ${sm.filter(_._1 == SkewCorpus.HotUserId)}")
    assertNoStorage("funnel")
  }

  test("sessionize family: engine-sorted replay equals islands-minus-open-sessions on the skewed stream") {
    val replay = timed("sessionizeReplay (engine-sorted, 41k events)") {
      Streams.sessionizeReplay(spark, corpusDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    val islands = timed("islands oracle (batch window form)") {
      val all = Streams.sessionizeBatch(spark, corpusDir)
        .selectExpr("user_id", "session_id", "n_events",
          "unix_micros(CAST(session_start AS TIMESTAMP)) AS s",
          "unix_micros(CAST(session_end AS TIMESTAMP)) AS e")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      val lastPerUser = all.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
      all.filter(s => s._2 < lastPerUser(s._1)).toSet
    }
    assert(replay == islands, s"replay diverged: only-replay=${(replay -- islands).take(3)}, " +
      s"only-islands=${(islands -- replay).take(3)}")
    // the hot user's 30k events sit 1 ms apart — ONE open session, so
    // the replay must emit nothing for it (open ≠ closed), while its
    // events still flowed through the engine sort without buffering
    assert(!replay.exists(_._1 == SkewCorpus.HotUserId),
      "hot user's single open session must not be emitted as closed")
    assertNoStorage("sessionize")
  }

  test("round-11 operators hold on the skew corpus: bloom gate, sweep-line, heartbeat, staged distinct") {
    // bloom prefilter: 500 exact hot copies straddle the odd/even
    // parity split, so the batch half carries ~250 true dups — the
    // sketch must pass every one (oracle-law: no false negatives) and
    // the verdict join must stay an equi-join
    val dup = timed("bloomPrefilter (5500 docs, 500-copy hot text)") {
      val d = Dedup.bloomPrefilter(spark, corpusDir)
      d.count(); d
    }
    val exec = dup.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct") && !exec.contains("BroadcastNestedLoop"))
    val nDup = dup.filter(col("is_dup") === 1).count()
    assert(nDup >= 200, s"hot-copy dups missing from the bloom-gated verify: $nDup")
    assertNoStorage("bloom")
    // sweep-line overlap: the hot user's 30k 1-ms-apart intervals all
    // overlap inside one 300 s window — peak concurrency must be
    // EXACTLY the event count, through one per-user window (no
    // quadratic interval-vs-interval work)
    val hot = timed("qSessionOverlap (41k events, one 30k-interval user)") {
      graft.operators.Analytics.qSessionOverlap(spark, corpusDir)
        .filter(col("user_id") === SkewCorpus.HotUserId).collect()
    }
    assert(hot.length == 1 && hot.head.getLong(1) == 30000L &&
      hot.head.getLong(2) == 30000L,
      s"hot user sweep wrong: ${hot.toSeq}")
    // heartbeat: 1 ms cadence = zero alarms for the hot user in the
    // exact batch audit, even with its slice scrambled on disk
    val hb = timed("heartbeatGap (hot slice scrambled on disk)") {
      Streams.heartbeatGap(spark, corpusDir)
        .filter(col("user_id") === SkewCorpus.HotUserId).collect()
    }
    assert(hb.length == 1 && hb.head.getLong(3) == 0L &&
      hb.head.getLong(2) == 1000L,
      s"hot user heartbeat wrong: ${hb.toSeq}")
    // staged cumulative distinct: the hot user collapses to ONE
    // first-seen row per type map-side — curve endpoints must equal
    // the true distinct count per type at any skew
    val finalCum = timed("qRunningDistinct (staged first-seen)") {
      graft.operators.Analytics.qRunningDistinct(spark, corpusDir).collect()
        .groupBy(_.getString(0)).view.mapValues(_.maxBy(_.getLong(1)).getLong(3)).toMap
    }
    val truth = Tables.events(spark, corpusDir).filter(col("user_id").isNotNull)
      .groupBy("event_type").agg(countDistinct(col("user_id"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(finalCum == truth, s"curve endpoints $finalCum != $truth")
    assertNoStorage("round-11")
  }

  test("round-11 batch-3/4 operators hold on the skew corpus: attribution, gap fill, decay, packing, novelty") {
    // attribution: the 30k-event hot user flows through one per-user
    // window partition; channel totals must conserve the purchase count
    val attr = timed("qAttribution (41k events, 30k-event hot user)") {
      graft.operators.Analytics.qAttribution(spark, corpusDir).collect()
    }
    val nPurch = Tables.events(spark, corpusDir)
      .filter(col("event_type") === "purchase").count()
    assert(attr.map(_.getLong(1)).sum == nPurch, "purchases lost under skew")
    // gap fill: hot user's 30s burst collapses to one observed day
    val gf = timed("qGapFill") {
      graft.operators.Analytics.qGapFill(spark, corpusDir)
        .filter(col("user_id") === SkewCorpus.HotUserId).collect()
    }
    assert(gf.length == 1 && gf.head.getLong(3) == 1L,
      s"hot user gap fill wrong: ${gf.toSeq}")
    // decayed sum: every hot event counted, zero-value slice scores 0
    val ds = timed("qDecayedSum") {
      graft.operators.Analytics.qDecayedSum(spark, corpusDir)
        .filter(col("user_id") === SkewCorpus.HotUserId).collect()
    }
    assert(ds.length == 1 && ds.head.getLong(2) == 30000L &&
      ds.head.getLong(1) == 0L, s"hot user decay wrong: ${ds.toSeq}")
    // sequence packing: the 500-copy hot source packs to an exact
    // token conservation (packing is per source — the hot source
    // cannot spill work into any other source's packs)
    val packs = timed("packSequences (5500 docs, 500-copy hot source)") {
      graft.text.TextOps.packSequences(spark, corpusDir)
        .filter(col("source") === "hotdup").collect()
    }
    val hotText = Tables.documents(spark, sf).orderBy("doc_id")
      .select("text").head().getString(0)
    // r15: packing bills in tokenizer tokens — fold the hot corpus's
    // OWN iterated ledger over the hot doc's words (alpha words
    // tokenized, non-alpha 1 each), exactly the engine's billing rule
    val ledger = graft.text.TextOps.bpeLedger(spark, corpusDir, 10)
    val hotTok = hotText.split(" ", -1).map { w =>
      if (w.matches("^[a-z]+$")) {
        var s = " " + w.map(_.toString).mkString(" ") + " "
        ledger.foreach { case (_, p, m, _, _) =>
          s = s.replace(s" $p ", s" $m "); s = s.replace(s" $p ", s" $m ")
        }
        (s.count(_ == ' ') - 1).toLong
      } else 1L
    }.sum
    assert(packs.map(_.getLong(2)).sum == 500L, "hot source docs lost")
    assert(packs.map(_.getLong(3)).sum == 500L * hotTok, "hot source tokens lost")
    // source novelty: exact copies contribute ZERO novel grams — the
    // hot source's marginal value is exactly nothing, at any copy count
    val nov = timed("sourceNovelty (hot source = 500 exact copies)") {
      graft.dedup.Dedup.sourceNovelty(spark, corpusDir)
        .filter(col("source") === "hotdup").collect()
    }
    assert(nov.length == 1 && nov.head.getLong(2) == 0L &&
      nov.head.getLong(3) == 0L,
      s"exact-copy source claimed novelty: ${nov.toSeq}")
    assertNoStorage("round-11-batch34")
  }

  test("round-11 batch-5/7 operators hold on the skew corpus: bitmap overlap, chunk dedup") {
    // bitmap set algebra: the hot user is in EVERY pairwise overlap
    // (its 30k events cover all five types), and popcounts must equal
    // exact distinct set algebra on the 10x corpus
    val rows = timed("qBitmapSetops (41k events, 10x key space)") {
      graft.operators.Analytics.qBitmapSetops(spark, corpusDir).collect()
    }
    val sets = Tables.events(spark, corpusDir).select("event_type", "user_id")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      val (a, b) = (sets(r.getString(0)), sets(r.getString(1)))
      assert(r.getLong(4) == (a intersect b).size.toLong,
        s"${r.getString(0)}∩${r.getString(1)} wrong at 10x")
    }
    // chunk-store dedup: 500 exact copies chunk identically, so the
    // hot source's distinct bytes are ~1/500th of its stored bytes
    val cd = timed("chunkDedup (500-copy hot source)") {
      graft.multimodal.Multimodal.chunkDedup(spark, corpusDir)
        .filter(col("source") === "hotdup").collect()
    }
    assert(cd.length == 1)
    val r = cd.head
    val hotLen = Tables.documents(spark, sf).orderBy("doc_id")
      .select(length(col("text"))).head().getInt(0).toLong
    assert(r.getLong(2) == 500L * hotLen,
      s"hot source stored ${r.getLong(2)} != 500 × $hotLen")
    // distinct chunks cover AT MOST one copy's bytes (within-doc
    // repeats shrink it further) ⇒ reclaim ≥ 499/500
    assert(r.getLong(4) <= hotLen)
    assert(r.getLong(5) >= 9900L, s"reclaim_bp ${r.getLong(5)} < 9900 on 500 copies")
    assertNoStorage("round-11-batch57")
  }

  test("round-11 batch-8/9/10 operators hold on the skew corpus: transitions, winnowing cap, paths") {
    // transition machine: the scrambled 30k-event hot slice folds
    // through engine-sorted runs — exact at any disorder — and must
    // equal the independent lag-window form on the whole corpus
    val replay = timed("transitionReplay (41k events, 30k on one key)") {
      Streams.transitionReplay(spark, corpusDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }
    val window = timed("qTransitionMatrix window form (oracle)") {
      graft.operators.Analytics.qTransitionMatrix(spark, corpusDir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }
    assert(replay == window, "transition machine diverged from window form at 10x")
    // winnowing df-cap: the hot text lives in 500 exact copies + the
    // base doc + its 9 salted replicas (~510 sharers), so every
    // hot-text fingerprint is df-capped OUT of the index — the
    // mega-cluster indexes nothing (bounded fan-out, the gram-index
    // rule) — while ordinary 10-member base∪replica families stay
    // under the cap and MUST pair with high containment
    val hotBase = SkewCorpus.hotDocBase(500L, 10)
    val pairs = timed("winnowingPairs (5500 docs, 500-copy hot band)") {
      graft.text.TextOps.winnowingPairs(spark, corpusDir)
    }
    assert(pairs.filter(col("doc_a") >= hotBase || col("doc_b") >= hotBase).count() == 0,
      "df cap failed: the 500-copy hot band leaked into the pair list")
    val fam = pairs.filter(col("doc_a") === 1L && col("doc_b") === 501L).collect()
    assert(fam.length == 1 && fam.head.getLong(5) >= 2500,
      s"base->replica family pair missing or weak: ${fam.toSeq}")
    // path analysis on the skewed stream: the hot user's first three
    // events are view@0, click@1000, signup@2000 by construction
    val paths = timed("qTopPaths (41k events)") {
      graft.operators.Analytics.qTopPaths(spark, corpusDir).collect()
    }
    assert(paths.nonEmpty && paths.head.getLong(1) >= paths.last.getLong(1))
    assertNoStorage("round-11-batch8910")
  }

  test("round-11 batch-11 operators hold on the skew corpus: SNM linear hot block, capped mutual degree, split conservation") {
    // sorted-neighborhood: the 500 identical hot copies all land in ONE
    // (lang, prefix) block — the shape that makes a bucket self-join
    // quadratic (B(B-1)/2 ≈ 125k pairs). The rank window emits only
    // wdist ≤ 3 neighbors, so the hot block must stay LINEAR: ≤ 3B
    // pairs, every one at jaccard 1.0. This is the SNM scale contract
    // the gram index can't offer on identical-text floods.
    val hotBase = SkewCorpus.hotDocBase(500L, 10)
    val snm = timed("sortedNeighborhood (5500 docs, 500-copy hot block)") {
      Dedup.sortedNeighborhood(spark, corpusDir)
    }
    val hotPairs = snm.filter(col("doc_a") >= hotBase && col("doc_b") >= hotBase)
    val nHot = hotPairs.count()
    assert(nHot >= 500 && nHot <= 3 * 510,
      s"hot block pair count $nHot not linear in block size")
    assert(hotPairs.filter(col("jacc") < 1.0).count() == 0,
      "identical hot copies must pair at jaccard 1.0")
    // mutual-kNN: the 10x replica space is one giant near-dup family
    // (dim-0 perturbation only), i.e. maximal hubness — yet mutuality
    // caps every node's surviving degree at k=3 by construction
    val knn = timed("mutualKnn (5000 vecs, replica mega-family)") {
      Dedup.mutualKnn(spark, corpusDir).collect()
    }
    val nVecs = spark.read.parquet(s"$corpusDir/embeddings.parquet").count()
    assert(knn.map(_.getLong(1)).sum == nVecs, "census must cover the 10x space")
    assert(knn.forall(_.getLong(0) <= 3), "mutual degree leaked past k")
    // label precision on the replica mega-family: bands must still
    // partition the (10x-hot) in-bucket pair volume exactly
    val prec = timed("labelPrecision (5000 vecs, 10x-hot buckets)") {
      graft.sim.Ann.labelPrecision(spark, corpusDir).collect()
    }
    prec.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    assert(prec.map(_.getLong(1)).sum > 0)
    // temporal split: conservation must survive the scrambled 41k-event
    // stream with 30k events on one key (the split is a projection +
    // one user-grain aggregate — skew lands on the hot user's single
    // aggregation key, never a sort buffer)
    val rows = timed("splitTemporal (41k events, 30k on one key)") {
      graft.text.TextOps.splitTemporal(spark, corpusDir).collect()
    }
    val nEv = spark.read.parquet(s"$corpusDir/events.parquet").count()
    assert(rows.map(_.getLong(1)).sum == nEv, "split lost events at 10x")
    assert(rows.map(_.getLong(3)).sum >= 9998, "event shares must cover the stream")
    assertNoStorage("round-11-batch11")
  }

  test("round-11 batch-12 operators hold on the skew corpus: navigable beams, balance floor") {
    // graph search on the replica mega-family: replicas perturb only
    // dim 0, so sign buckets concentrate 10x — the bucket self-join
    // fans out ~100x per bucket but stays Σ bucket², and the beam
    // contract (full dense ranks, no self-hits) must survive it
    val beams = timed("graphSearch (5000 vecs, 10x-hot LSH buckets)") {
      graft.sim.Ann.graphSearch(spark, corpusDir).collect()
    }
    val perQ = beams.groupBy(_.getLong(0))
    assert(perQ.size == 10, "every query must come back with a beam at 10x")
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length), s"query $q ranks")
      assert(!rs.exists(_.getLong(1) == q))
    }
    // class balance: replicas multiply every label 10x uniformly, so
    // the minority floor scales with them and every label hits it
    val bal = timed("classBalance (5000 vecs, 10 labels)") {
      graft.sim.Ann.classBalance(spark, corpusDir).collect()
    }
    val nVecs = spark.read.parquet(s"$corpusDir/embeddings.parquet").count()
    assert(bal.map(_.getLong(1)).sum == nVecs, "balance must account for the 10x space")
    val floor = bal.map(_.getLong(1)).min
    assert(bal.forall(_.getLong(2) == floor), "every label must keep exactly the floor")
    assertNoStorage("round-11-batch12")
  }

  test("round-11 batch-13/15 operators hold on the skew corpus: growth flow, sketch bias, engagement") {
    // growth accounting: the hot user's 30k events collapse to ONE
    // user-week row per active week before any window touches them —
    // the flow identities must survive the 10x multiplied user base
    val ga = timed("qGrowthAccounting (41k events, 30k on one key)") {
      graft.operators.Analytics.qGrowthAccounting(spark, corpusDir).collect()
    }
    ga.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4),
        s"week ${r.getLong(0)}: kinds must partition actives at 10x")
    }
    // count-min: the hot user IS the heavy hitter the sketch exists
    // for — it must surface in the audit's top-10 with a one-sided
    // estimate despite 10x collision pressure
    val cm = timed("qCountminAudit (41k events)") {
      graft.operators.Analytics.qCountminAudit(spark, corpusDir).collect()
    }
    assert(cm.head.getLong(0) == SkewCorpus.HotUserId,
      "the 30k-event hot user must top the count-min audit")
    cm.foreach(r => assert(r.getLong(2) >= r.getLong(1), "CMS undercounted at 10x"))
    // DAU/MAU: conservation under the scrambled hot stream — the hot
    // user contributes exactly 1 to every day it touches
    val dm = timed("qDauMau (41k events)") {
      graft.operators.Analytics.qDauMau(spark, corpusDir).collect()
    }
    dm.foreach(r => assert(r.getLong(1) <= r.getLong(2), "DAU must bound below MAU"))
    // rate limiter: the hot user's 30k events land in ONE minute
    // window (i·1000 µs timestamps), so the limiter must throttle
    // exactly 30000 − 5 of them and report peak_rate = 30000 — the
    // abuse profile this operator exists to surface, while its
    // streaming state stays one (window, count) pair
    val rl = timed("rateLimit (41k events, 30k in one window)") {
      Streams.rateLimit(spark, corpusDir).collect()
    }
    val hot = rl.find(_.getLong(0) == SkewCorpus.HotUserId)
    assert(hot.isDefined, "the hot user must top the rate-limit profile")
    assert(hot.get.getLong(1) == 30000L && hot.get.getLong(2) == 29995L &&
      hot.get.getLong(3) == 30000L && hot.get.getLong(4) == 1L,
      s"hot-user throttle profile off: ${hot.get}")
    assertNoStorage("round-11-batch1316")
  }
}

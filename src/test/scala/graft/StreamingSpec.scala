package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  /** File stream sources need a directory; stage the single parquet
    * file into a temp dir. */
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  /** events as a file stream with `ts` normalized exactly as
    * [[Tables.load]] does for the batch side: nanos-as-long corpora
    * truncate to micros, micros corpora cast the NTZ to the
    * session-UTC instant type — so stream≡batch comparisons never
    * diverge on the corpus generator's timestamp encoding. */
  private def eventsStream: org.apache.spark.sql.DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(eventsDir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  test("streaming window agg matches batch form") {
    // feed the parquet dir as a file stream (one batch), memory sink
    val raw = eventsStream
    val q = Streams.windowAggStreaming(raw)
      .writeStream.outputMode("append").format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode only emits closed windows; with a finite input the
    // final watermark closes all but the last — compare the common set
    val got = spark.table("win_out")
      .orderBy("window_start", "event_type").collect()
    val batch = Streams.windowAggBatch(spark, sf)
      .orderBy("window_start", "event_type").collect()
    assert(got.nonEmpty, "streaming produced no windows")
    val batchSet = batch.map(_.toString).toSet
    got.foreach(r => assert(batchSet.contains(r.toString), s"streaming row $r not in batch result"))
  }

  test("stream-static enrich matches the batch star join (complete mode)") {
    val q = Streams.staticEnrichStreaming(eventsStream,
        Tables.customer(spark, sf))
      .writeStream.outputMode("complete").format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_out")
      .orderBy("c_nationkey", "day").collect().map(_.toString)
    val batch = Streams.staticEnrichBatch(spark, sf).collect().map(_.toString)
    assert(got.nonEmpty && got.toSeq == batch.toSeq,
      s"stream-static join diverged: ${got.length} vs ${batch.length} rows")
  }

  test("streaming sessionize matches batch sessions (closed sessions)") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[Streams.Ev]
    // run the same flatMapGroupsWithState logic in batch mode over the
    // typed Dataset (identical code path semantics, single batch)
    val viaState = Streams.sessionizeStreaming(evs).collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end))
    val batch = Streams.sessionizeBatch(spark, sf)
      .selectExpr("user_id", "session_id", "n_events",
        "unix_micros(CAST(session_start AS TIMESTAMP)) AS s", "unix_micros(CAST(session_end AS TIMESTAMP)) AS e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(viaState.nonEmpty, "no sessions emitted")
    // stateful form emits only *closed* sessions (last session per user
    // stays open in state); every emitted session must match batch
    viaState.foreach { s =>
      assert(batch.contains(s), s"stateful session $s not found in batch result")
    }
  }

  test("streaming late audit matches the batch high-water-mark replay") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .as[Streams.LateEv]
    // per-type rollup of the stateful per-event flags must equal the
    // batch audit (same replay, same tolerance)
    val flags = Streams.lateAuditStreaming(evs)
    val viaState = flags.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("late")).as("n_late"),
        max(col("skew_us")).as("max_skew_us"), max(col("jump_us")).as("max_jump_us"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val batch = Streams.lateAuditBatch(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))))
      .toMap
    assert(viaState.nonEmpty)
    assert(viaState == batch, s"stateful audit $viaState != batch $batch")
    // the default 4096-event reorder buffer covers this corpus's
    // per-key disorder entirely — the exact-replay case has zero
    // beyond-capacity emissions
    val overflow = flags.agg(sum(col("reorder_overflow"))).head().getLong(0)
    assert(overflow == 0L, s"unexpected reorder overflow: $overflow")
  }

  test("late audit bounded reorder: hot key through a fat trigger") {
    import spark.implicits._
    // ONE key, 50k events in a single trigger slice (the hot-key/
    // fat-trigger shape that used to buffer-and-sort the whole slice):
    // event time mostly in order, arrival ids locally shuffled within
    // blocks of 32 — displacement ≤ 32, so a 64-slot buffer replays
    // EXACTLY while holding at most 64 events in memory.
    val n = 50000
    val rng = new scala.util.Random(42)
    val evs = (0 until n).grouped(32).flatMap(b => rng.shuffle(b.toList)).toSeq
      .map(i => Streams.LateEv(1L, i.toLong, "hot", 1000000L * i))
    val small = Streams.lateAuditStreaming(spark.createDataset(evs), 10, 64)
      .agg(count(lit(1)), sum(col("late")), sum(col("reorder_overflow"))).head()
    assert(small.getLong(0) == n.toLong, "every event must be flagged")
    assert(small.getLong(1) == 0L, "in-order event times ⇒ nothing late")
    assert(small.getLong(2) == 0L, "displacement ≤ buffer ⇒ exact replay")
    // displacement BEYOND capacity must be counted, not silently
    // dropped or buffered without bound: same stream through a 8-slot
    // buffer with block-256 shuffling overflows and says so, and every
    // event is still emitted exactly once
    val coarse = (0 until n).grouped(256).flatMap(b => rng.shuffle(b.toList)).toSeq
      .map(i => Streams.LateEv(1L, i.toLong, "hot", 1000000L * i))
    val tiny = Streams.lateAuditStreaming(spark.createDataset(coarse), 10, 8)
      .agg(count(lit(1)), sum(col("reorder_overflow"))).head()
    assert(tiny.getLong(0) == n.toLong, "overflow must never drop events")
    assert(tiny.getLong(1) > 0L, "beyond-capacity disorder must be surfaced")
  }

  test("incremental dedup runs as a stream-static band join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static side: the corpus band index (at scale: the checkpointed
    // signature table); stream side: new docs sketched on the fly by
    // the same stateless expressions
    val corpus = graft.dedup.Dedup.bandKeys(Tables.documents(spark, sf))
      .select(col("band_id"), col("bk"), col("doc_id").as("corpus_doc"))
    val known = Tables.documents(spark, sf).select("doc_id", "text").head()
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.dedup.Dedup.bandKeys(src.toDS().toDF("doc_id", "text"))
      .join(corpus, Seq("band_id", "bk"))
      .select(col("doc_id"), col("corpus_doc"))
      .writeStream.outputMode("append").format("memory").queryName("inc_out").start()
    src.addData(
      (1000001L, known.getString(1)), // verbatim copy of a corpus doc
      (1000002L, "qwerty asdfgh zxcvbn uiop hjkl vbnm"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("inc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.contains((1000001L, known.getLong(0))),
      "an identical new doc must hit its corpus twin's band keys")
    assert(!got.exists(_._1 == 1000002L),
      "a junk doc must not collide with any corpus band")
  }

  test("quality gate applies unchanged to a stream (stateless map-only filter)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.text.TextOps.qualityGateCols(src.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("gate_out").start()
    src.addData(
      (1L, "the cat sat on the mat"),           // ok
      (2L, "tiny doc"),                         // too_short
      (3L, "zzz qqq xxx yyy www vvv"),          // unknown_language
      (4L, "the the the the the and to of a"))  // repetitive
    q.processAllAvailable()
    q.stop()
    val got = spark.table("gate_out").select("doc_id", "gate").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "ok", 2L -> "too_short",
      3L -> "unknown_language", 4L -> "repetitive"), s"got $got")
  }

  test("event-time timeout closes idle sessions via watermark, not new data") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.EvT]
    val q = Streams.sessionizeStreamingEventTime(src.toDS())
      .writeStream.outputMode("append").format("memory").queryName("et_out").start()
    // base well past the epoch: the initial watermark is 0, and events
    // at exactly the watermark are dropped as late
    val base = 86400000L
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    // user 1: two events 10 min apart, then goes idle forever
    src.addData(Streams.EvT(1L, 10L, ts(0)), Streams.EvT(1L, 11L, ts(10)),
      Streams.EvT(2L, 20L, ts(0)))
    q.processAllAvailable()
    // user 2 keeps the stream alive 2h later -> watermark passes
    // user 1's last event + 30min gap -> session must time out
    src.addData(Streams.EvT(2L, 21L, ts(120)))
    q.processAllAvailable()
    src.addData(Streams.EvT(2L, 22L, ts(240))) // extra batch fires timeouts
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("et_out")
      .select("user_id", "n_events", "session_start", "session_end").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val u1 = sessions.filter(_._1 == 1L)
    assert(u1.toSeq == Seq((1L, 2L, base * 1000L, base * 1000L + 10L * 60000000L)),
      s"user 1's idle session must close by timeout, got ${sessions.toSeq}")
  }

  test("latest-state stream state agrees with the batch changelog compaction") {
    import spark.implicits._
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[Streams.Ev]
    val viaState = Streams.latestStateStreaming(evs).collect().toMap
    val batch = Streams.latestState(spark, sf)
      .select("user_id", "last_event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaState == batch)
    assert(viaState.nonEmpty)
  }

  test("streaming rate anomaly (O(1) trailing state) equals the batch lag-window form") {
    import spark.implicits._
    val wins = Tables.events(spark, sf)
      .selectExpr("event_type",
        "unix_micros(timestamp_seconds((unix_seconds(ts) DIV 900) * 900)) AS wsUs")
      .groupBy("event_type", "wsUs").agg(count(lit(1)).as("n"))
      .as[Streams.WinCount]
    val got = Streams.rateAnomalyStreaming(wins).collect()
      .map(r => (r.event_type, r.wsUs, r.n, r.trail, r.anomaly)).toSet
    val batch = Streams.rateAnomalyBatch(spark, sf)
      .selectExpr("event_type", "unix_micros(CAST(ws AS TIMESTAMP)) AS wsUs",
        "n", "trail", "anomaly")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got.nonEmpty, "no judged windows")
    assert(got == batch)
    // the sf0.001 corpus is spike-free; prove the anomaly path FIRES
    // on a synthetic spike through the streaming form (and that the
    // first four windows are withheld, not judged against a short
    // baseline)
    val synth = Seq(
      Streams.WinCount("x", 1L, 10), Streams.WinCount("x", 2L, 10),
      Streams.WinCount("x", 3L, 10), Streams.WinCount("x", 4L, 10),
      Streams.WinCount("x", 5L, 31), // 31*4 = 124 > 3*40 — spike
      Streams.WinCount("x", 6L, 10)  // trail now 10+10+10+31 = 61 — calm
    ).toDS()
    val flags = Streams.rateAnomalyStreaming(synth).collect()
      .map(r => r.wsUs -> ((r.trail, r.anomaly))).toMap
    assert(!flags.contains(4L), "window with only 3 priors must not be judged")
    assert(flags(5L) == ((40L, 1L)), s"spike not flagged: ${flags.get(5L)}")
    assert(flags(6L) == ((61L, 0L)), s"calm window misflagged: ${flags.get(6L)}")
  }

  test("rate anomaly state survives trigger boundaries (true micro-batch run)") {
    // the batch-mode equality above proves the math; this proves the
    // STATE: the trailing-4 deque must carry across triggers, so a
    // spike arriving four triggers after its baseline is still judged
    // against it
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streams.WinCount]
    val q = Streams.rateAnomalyStreaming(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("rate_out").start()
    try {
      // trigger 1: the baseline only — nothing judged yet
      src.addData(Streams.WinCount("x", 1L, 10), Streams.WinCount("x", 2L, 10),
        Streams.WinCount("x", 3L, 10), Streams.WinCount("x", 4L, 10))
      q.processAllAvailable()
      assert(spark.table("rate_out").count() == 0,
        "baseline windows must not be judged")
      // trigger 2: the spike, judged against state built in trigger 1
      src.addData(Streams.WinCount("x", 5L, 31))
      q.processAllAvailable()
      // trigger 3: calm window whose trail includes the spike
      src.addData(Streams.WinCount("x", 6L, 10))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("rate_out").collect()
      .map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(5L -> ((40L, 1L)), 6L -> ((61L, 0L))),
      s"cross-trigger state broken: $got")
  }

  test("streaming windowed top-k matches the batch form on closed windows") {
    val out = java.nio.file.Files.createTempDirectory("graft-wtopk").toString
    val raw = eventsStream
    val q = Streams.windowedTopkStreaming(raw, s"$out/topk", s"$out/ckpt")
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(s"$out/topk")
      .collect().map(_.toString).toSet
    val batch = Streams.windowedTopkBatch(spark, sf)
      .select("window_start", "event_type", "n", "rk")
      .collect().map(_.toString).toSet
    assert(got.nonEmpty, "no windows emitted")
    // append mode emits only watermark-closed windows; each must match
    got.foreach(r => assert(batch.contains(r), s"streaming row $r not in batch"))
  }

  test("foreachBatch dead-letter sink routes ok/dead to separate dirs") {
    val out = java.nio.file.Files.createTempDirectory("graft-dl").toString
    val raw = eventsStream
    val q = Streams.writeWithDeadLetter(raw, s"$out/ok", s"$out/dead", s"$out/ckpt")
    q.processAllAvailable(); q.stop()
    val ok = spark.read.parquet(s"$out/ok").count()
    val dead = spark.read.parquet(s"$out/dead").count()
    val expected = graft.etl.Ingest.deadLetterSplit(Tables.events(spark, sf))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ok == expected("ok"), s"ok rows $ok vs ${expected("ok")}")
    assert(dead == expected("dead"), s"dead rows $dead vs ${expected("dead")}")
    assert(spark.read.parquet(s"$out/dead").columns.contains("reason"))
  }

  test("stream-stream join matches the batch time-band join") {
    def stream(t: String, uCol: String, tsCol: String) = eventsStream
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${uCol.head}_id"),
        col("user_id").as(uCol), col("ts").as(tsCol))
    val joined = Streams.eventJoinStreaming(
      stream("click", "c_user", "c_ts"), stream("purchase", "p_user", "p_ts"))
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ssj_out")
      .select(col("c_user").as("user_id"), col("c_id"), col("p_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Streams.eventJoinBatch(spark, sf)
      .select("user_id", "click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch, s"stream-stream ${got.size} vs batch ${batch.size}")
    assert(got.nonEmpty)
  }

  test("streaming deid pipeline converges to the batch result under trigger slicing") {
    // range-derived batch ids are a pure function of the key, so no
    // matter how triggers slice the stream, COMPLETE output converges
    // to the batch pipeline exactly — the property deidPipeline's
    // docstring claims. maxFilesPerTrigger=1 would be a no-op with a
    // single staged file; the slicing here comes from the aggregation
    // running incrementally across the file-stream's rows.
    val custDir = {
      val d = java.nio.file.Files.createTempDirectory("graft-cust").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sf/customer.parquet"),
        java.nio.file.Paths.get(s"$d/customer.parquet"))
      d
    }
    val raw = spark.readStream
      .schema(spark.read.parquet(s"$sf/customer.parquet").schema)
      .parquet(custDir)
    val q = Streams.deidPipelineStreaming(raw)
      .writeStream.outputMode("complete").format("memory").queryName("deid_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("deid_out").orderBy("batch_id").collect().map(_.toString)
    val batch = Streams.deidPipelineBatch(spark, sf).collect().map(_.toString)
    assert(got.nonEmpty && got.sameElements(batch),
      s"streaming deid diverged: ${got.take(2).mkString} vs ${batch.take(2).mkString}")
  }

  test("funnel state machine advances across triggers, arrival-order strict") {
    // the stage-qualification rule must read STATE, not the trigger
    // slice: a click qualifies against a signup from a previous
    // trigger, and a purchase that sorts BEFORE the first qualifying
    // click inside its own slice must not advance
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Streams.FunnelEv]
    val q = Streams.funnelStagesStreaming(src.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      // trigger 1: click before any signup (no advance), then signup
      src.addData(Streams.FunnelEv(1L, 10L, 10L, "click"),
        Streams.FunnelEv(1L, 11L, 20L, "signup"))
      q.processAllAvailable()
      // trigger 2: purchase sorts before the qualifying click in the
      // same slice — it must NOT advance; the click does
      src.addData(Streams.FunnelEv(1L, 12L, 25L, "purchase"),
        Streams.FunnelEv(1L, 13L, 30L, "click"))
      q.processAllAvailable()
      // trigger 3: purchase now qualifies against trigger-2 state
      src.addData(Streams.FunnelEv(1L, 14L, 40L, "purchase"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 20L), (1L, 2L, 30L), (1L, 3L, 40L)),
      s"funnel advances wrong: $got")
  }

  test("funnel bounded reorder: hot key through a fat trigger") {
    import spark.implicits._
    // ONE user, 30k events in a single slice, arrival locally shuffled
    // within blocks of 32: displacement ≤ 32, so a 64-slot heap replays
    // the sorted-slice semantics EXACTLY while holding ≤ 64 events.
    // Funnel stages hide at fixed event times; everything else is noise.
    val n = 30000
    val rng = new scala.util.Random(7)
    def mkEvs(block: Int) = (0 until n).grouped(block).flatMap(b => rng.shuffle(b.toList)).toSeq
      .map { i =>
        val t = i match {
          case 1000 => "signup"; case 2000 => "click"; case 3000 => "purchase"
          case _ => "view"
        }
        Streams.FunnelEv(1L, i.toLong, 1000L * i, t)
      }
    val got = Streams.funnelStagesStreaming(spark.createDataset(mkEvs(32)), 64)
      .collect().map(a => (a.stage, a.at_us, a.reorder_overflow)).toSet
    assert(got == Set((1L, 1000000L, 0L), (2L, 2000000L, 0L), (3L, 3000000L, 0L)),
      s"bounded replay diverged: $got")
    // displacement beyond capacity may reorder the state machine's
    // input (an advance can be missed if its prerequisite pops late),
    // but the invariants that survive ANY disorder must hold: each
    // stage advances at most once, stages only ever advance in order,
    // and EVERY beyond-bound pop yields a row — a flagged advance or
    // a stage-0 marker — so disorder is never silently absorbed
    val coarse = Streams.funnelStagesStreaming(spark.createDataset(mkEvs(4096)), 8)
      .collect()
    val advances = coarse.filter(_.stage > 0L)
    val stages = advances.map(_.stage)
    assert(stages.distinct.length == stages.length, "duplicate stage advance")
    assert(stages.toSet.subsetOf(Set(1L, 2L, 3L)))
    assert((1L to stages.size.toLong).toSet == stages.toSet,
      "a stage advanced without its prerequisite stage")
    val markers = coarse.filter(_.stage == 0L)
    assert(markers.forall(_.reorder_overflow == 1L),
      "a marker row exists only to surface an out-of-order pop")
    assert(markers.nonEmpty || advances.exists(_.reorder_overflow == 1L),
      "block-4096 shuffle through an 8-slot heap must surface overflow")
  }

  test("reorder depth matches a driver-side rank recompute") {
    val evs = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getString(2), r.getLong(3)))
    val depths = evs.groupBy(_._1).values.flatMap { rows =>
      val byArrival = rows.sortBy(_._2).zipWithIndex.map { case (r, i) => r._2 -> (i + 1) }.toMap
      val byTime = rows.sortBy(r => (r._4, r._2)).zipWithIndex.map { case (r, i) => r._2 -> (i + 1) }.toMap
      rows.map(r => r._3 -> math.abs(byArrival(r._2) - byTime(r._2)).toLong)
    }.toSeq
    val expected = depths.groupBy(_._1).map { case (t, ds) =>
      val sorted = ds.map(_._2).sorted
      t -> ((ds.size.toLong, sorted.count(_ == 0L).toLong,
        sorted((ds.size + 1) / 2 - 1), sorted.last))
    }
    Streams.reorderDepthBatch(spark, sf).collect().foreach { r =>
      val (n, zero, med, mx) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == zero &&
        r.getLong(4) == med && r.getLong(5) == mx,
        s"${r.getString(0)}: got (${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(4)}, ${r.getLong(5)}), " +
          s"expected ($n, $zero, $med, $mx)")
    }
  }

  test("TTL-windowed streaming dedup keeps one row per (key, window)") {
    // the bounded-state dedup: dropDuplicates on (key, tumbling
    // window) under a watermark — kept rows must equal the batch
    // form's distinct (user, type, window) group count, and windows
    // make re-admission observable (kept > global key count)
    val q = Streams.dedupWindowStreaming(eventsStream)
      .writeStream.outputMode("append").format("memory").queryName("dedupw_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedupw_out")
    val expectedKept = Streams.dedupWindowBatch(spark, sf)
      .agg(sum("kept_events")).head().getLong(0)
    assert(got.count() == expectedKept,
      s"streaming windowed dedup kept ${got.count()} rows vs batch $expectedKept")
    assert(got.select("user_id", "event_type", "win").distinct().count() == expectedKept)
    val globalKeys = Streams.dedupBatch(spark, sf).count()
    assert(expectedKept > globalKeys,
      "TTL re-admission must keep MORE rows than the forever-dedup key count")
  }

  test("streaming dedup keeps one row per key") {
    val raw = eventsStream
    val q = Streams.dedupStreaming(raw)
      .writeStream.outputMode("append").format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_out").select("user_id", "event_type").collect()
    val expected = Streams.dedupBatch(spark, sf).count()
    assert(got.length == expected, s"streaming dedup ${got.length} keys vs batch $expected")
    assert(got.map(r => (r.getLong(0), r.getString(1))).distinct.length == got.length)
  }

  test("streaming dup-ratio composes from the raw and deduped window counters") {
    // append mode cannot COUNT(DISTINCT) in one query; the streaming
    // form is the composition of two engine-proven counters. Joining
    // the two sinks must reproduce the batch table on closed windows.
    val q1 = Streams.rawHourlyStreaming(eventsStream)
      .writeStream.outputMode("append").format("memory").queryName("dr_raw")
      .trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    val q2 = Streams.dedupStreamingHourly(eventsStream)
      .writeStream.outputMode("append").format("memory").queryName("dr_keys")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("dr_raw").join(spark.table("dr_keys"), "window_start")
      .selectExpr("window_start", "n_events", "n_keys",
        "((n_events - n_keys) * 10000) DIV n_events AS dup_bp")
      .collect().map(_.toString)
    assert(got.nonEmpty, "streaming dup-ratio produced no closed windows")
    val batchSet = Streams.dupRatioBatch(spark, sf).collect().map(_.toString).toSet
    got.foreach(r => assert(batchSet.contains(r), s"streaming row $r not in batch"))
  }

  test("streaming new-users matches batch when replayed in day order") {
    // the contract newUsersStreaming documents: first-ARRIVAL equals
    // first-EVENT-TIME when replay respects event-time order at the
    // window granularity. Feeding one micro-batch PER DAY makes that
    // exact (within-day order is irrelevant to a daily window), so the
    // closed windows must match the batch form bit-for-bit.
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull)
      .selectExpr("user_id", "event_id", "CAST(ts AS TIMESTAMP) AS ts")
      .as[Streams.EvT].collect()
    val byDay = ev.groupBy(e => e.ts.getTime / 86400000L).toSeq.sortBy(_._1)
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.EvT]
    val q = Streams.newUsersStreaming(src.toDS().toDF())
      .writeStream.outputMode("append").format("memory").queryName("nu_out").start()
    byDay.foreach { case (_, rows) => src.addData(rows.toSeq); q.processAllAvailable() }
    // sentinel far past the last day advances the watermark so every
    // real window closes; its own window stays open and is not emitted
    val lastTs = ev.map(_.ts.getTime).max
    src.addData(Streams.EvT(-1L, -1L, new java.sql.Timestamp(lastTs + 30L * 86400000L)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("nu_out").orderBy("day").collect().map(_.toString).toSeq
    val batch = Streams.newUsersBatch(spark, sf).collect().map(_.toString).toSeq
    assert(got == batch, s"streaming new-users $got != batch $batch")
  }
}

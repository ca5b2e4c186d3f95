package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage, streaming}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 sink+source with a REAL two-phase task-commit
  * protocol and (r13) a VERSION-CHAINED commit log — the exactly-once
  * batch-write contract every production sink implements, now safe
  * under CONCURRENT committers (the Delta/Iceberg transaction-log
  * pattern, scoped to this sink's trivial format):
  *
  *   - each task writer streams rows to `.part-….tmp`;
  *   - task COMMIT atomically renames it to
  *     `part-<partition>-<task>-<query8>.dat` (the query-id salt means
  *     a second application appending to the same path can never
  *     collide with a prior run's task names) and reports the name
  *     upward as its [[WriterCommitMessage]];
  *   - task ABORT deletes the temp — a failed/speculative task leaves
  *     NOTHING visible;
  *   - job COMMIT appends a NEW manifest version `_manifest.v<N>`
  *     (N = latest + 1). The publish is a compare-and-swap: the
  *     content is written to a temp and HARD-LINKED to the version
  *     name — link creation is atomic create-if-absent, so of two
  *     concurrent committers exactly one wins version N and the loser
  *     RE-READS the new latest state, re-merges its files, and
  *     retries at N+1. No committer can erase another's files (the
  *     r12 last-writer-wins hole, closed);
  *   - (r14) manifests are DELTAS — each version lists only ITS new
  *     files and batch id — except every [[KvSource.CheckpointInterval]]-th
  *     version, which is a CHECKPOINT carrying the full accumulated
  *     state (`#checkpoint` header). Readers resolve a snapshot from
  *     the nearest checkpoint at or below the target plus the delta
  *     tail — at most CheckpointInterval manifest reads at ANY chain
  *     length — and a commit writes O(its own files), not O(all files
  *     ever): the Delta-log checkpoint pattern, which is what keeps a
  *     foreachBatch-cadence table from going quadratic. (The r13
  *     full-manifest format folds identically — the chain is
  *     append-only, so unioning full lists equals the latest list —
  *     old chains read without migration.) [[KvSource.vacuum]] is the
  *     retention half: it drops manifests below the fold base of the
  *     retention horizon and deletes stray data files no retained
  *     version references;
  *   - the READ path lists files FROM the latest manifest version
  *     (or a pinned `versionAsOf` — time travel), never the
  *     directory — stray/partial/aborted files are invisible by
  *     construction, which is the property that makes task retries
  *     and speculative execution safe;
  *   - a commit may carry a replay key (Structured Streaming
  *     foreachBatch batchId / streaming epoch): applied keys are
  *     recorded in the manifest chain (`#txn:<appId>:<batchId>`
  *     header lines — the Delta transaction-identifier shape, scoped
  *     per writer so two queries' batch counters never collide; the
  *     r13 `#batch:<n>` form parses as the legacy empty-app
  *     namespace), and a commit whose key is already applied is a
  *     NO-OP that deletes its duplicate task files — a replayed
  *     micro-batch adds zero rows, the streaming half of
  *     exactly-once.
  *
  * Format is deliberately trivial (`key,val` lines over a fixed
  * (key BIGINT, val STRING) schema) — the protocol, not the encoding,
  * is the point. Because the format is line-oriented, `val` MUST be
  * non-null and newline-free: the writer validates and fails fast
  * with a clear error (r12 advice: was an NPE / silent corruption).
  * The reader STREAMS lines (no whole-file buffering — the one
  * unbounded per-partition buffer in r12, removed). One read
  * InputPartition per committed file, so read parallelism follows
  * write parallelism. Reference: the same rename-into-manifest
  * choreography Spark's own FileBatchWrite /
  * HadoopMapReduceCommitProtocol runs (public API surface only),
  * plus the version-chain/CAS shape of open lakehouse commit logs.
  */
class KvSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "KvSource requires option 'path'")
    new KvTable(path)
  }
}

object KvSource {
  val schema: StructType = new StructType()
    .add("key", LongType).add("val", StringType)

  /** Every N-th manifest version is a full-state checkpoint; the N-1
    * between are deltas. Reads fold at most N manifests; commits write
    * O(own files) except the one-in-N checkpoint. */
  private[graft] val CheckpointInterval = 10L

  private val VersionRe = "_manifest\\.v(\\d+)".r

  /** All committed manifest versions at this path, ascending. */
  private[graft] def versions(path: String): Seq[Long] = {
    val d = new java.io.File(path)
    if (!d.isDirectory) Seq.empty
    // d.list() is null on I/O error or if the dir vanished after the
    // isDirectory check — surface the path, not an NPE (this sits on
    // the read path AND inside the commit CAS retry loop)
    else Option(d.list()) match {
      case None => throw new java.io.IOException(
        s"KvSource: cannot list directory $path")
      case Some(names) => names.toSeq.collect { case VersionRe(n) => n.toLong }.sorted
    }
  }

  private[graft] def latestVersion(path: String): Option[Long] =
    versions(path).lastOption

  private def manifestFile(path: String, v: Long): java.io.File =
    new java.io.File(path, s"_manifest.v$v")

  /** (added files, applied replay keys, removed files) a single
    * manifest version declares — NEW state only for a delta, full
    * state for a checkpoint. `#`-prefixed lines are headers;
    * everything else is a file name. Replay keys are
    * `<appId>:<batchId>` strings (`#txn:` header — the Delta
    * transaction-identifier shape), so two writers' batch/epoch
    * counters can never collide in the ledger; legacy r13 `#batch:<n>`
    * headers parse as the empty-app key `:<n>`. `#remove:<file>`
    * lines (r14 OPTIMIZE support) drop a file from the folded state —
    * how a compaction replaces many small files with one rewrite in a
    * SINGLE atomic version. */
  private[graft] def readManifest(path: String,
                                    v: Long): (Seq[String], Set[String], Seq[String]) = {
    val src = scala.io.Source.fromFile(manifestFile(path, v), "UTF-8")
    try {
      val lines = src.getLines().filter(_.nonEmpty).toList
      val (hdr, files) = lines.partition(_.startsWith("#"))
      val batches = hdr.collect {
        case s if s.startsWith("#txn:") => s.stripPrefix("#txn:")
        case s if s.startsWith("#batch:") => ":" + s.stripPrefix("#batch:")
      }.toSet
      val removes = hdr.collect {
        case s if s.startsWith("#remove:") => s.stripPrefix("#remove:")
      }
      (files, batches, removes)
    } finally src.close()
  }

  /** First version a state fold for `v` must read: the nearest
    * checkpoint multiple at or below it (or 1 — short chains fold from
    * the base). */
  private[graft] def foldBase(v: Long): Long =
    math.max((v / CheckpointInterval) * CheckpointInterval, 1L)

  /** Full (files, applied batch ids) state at `v`: the nearest
    * checkpoint at or below plus the delta tail — at most
    * [[CheckpointInterval]] manifest reads regardless of chain length.
    * Also correct over r13-era chains whose every manifest was full:
    * the chain is append-only, so a union-fold of full lists equals
    * the latest full list. */
  private[graft] def stateAt(path: String, v: Long): (Seq[String], Set[String]) = {
    val base = foldBase(v)
    if (!manifestFile(path, base).exists())
      throw new IllegalArgumentException(
        s"KvSource: version $v needs manifest v$base which no longer exists " +
          s"at $path (vacuumed beyond the requested horizon? " +
          s"have: ${versions(path).mkString(",")})")
    var files = scala.collection.immutable.ListSet.empty[String]
    var batches = Set.empty[String]
    (base to v).foreach { i =>
      val (f, b, removes) = readManifest(path, i)
      files = files -- removes ++ f
      batches = batches ++ b
    }
    (files.toSeq, batches)
  }

  /** Files a reader may see at `version` (default: latest committed).
    * No committed version = no successful job = empty table. */
  private[graft] def committedFiles(path: String,
                                      version: Option[Long] = None): Seq[String] = {
    val v = version.orElse(latestVersion(path))
    v match {
      case None =>
        version.foreach(n => throw new IllegalArgumentException(
          s"KvSource: versionAsOf=$n requested but no version exists at $path"))
        Seq.empty
      case Some(n) =>
        if (!manifestFile(path, n).exists())
          throw new IllegalArgumentException(
            s"KvSource: versionAsOf=$n does not exist at $path " +
              s"(have: ${versions(path).mkString(",")})")
        stateAt(path, n)._1
    }
  }

  /** Retention sweep (the Delta VACUUM analog): keep the last
    * `retainLast` versions readable, delete every manifest below their
    * fold base, and delete stray `part-*.dat` files that the retained
    * state does not reference (crash leftovers — a completed no-op
    * replay already deletes its own duplicates). A stray is only
    * eligible once it is OLDER than `strayMinAgeMs` (Delta's
    * retention-hours guard): a task-committed file whose job commit
    * hasn't published its manifest yet is unreferenced but IN FLIGHT,
    * and deleting it would corrupt the version that is about to land —
    * the age floor keeps vacuum safe under concurrent writers. Returns
    * (manifests deleted, strays deleted, oldest readable version).
    * Time travel below the horizon fails with a clear error
    * afterwards — that is the retention contract, not a bug. */
  private[graft] def vacuum(path: String, retainLast: Int,
                              strayMinAgeMs: Long = 15L * 60 * 1000): (Long, Long, Long) = {
    val vs = versions(path)
    if (vs.isEmpty) return (0L, 0L, 0L)
    val latest = vs.last
    val horizon = math.max(latest - retainLast + 1, 1L)
    val keepFrom = foldBase(horizon)
    val dropped = vs.filter(_ < keepFrom)
    dropped.foreach(v => manifestFile(path, v).delete())
    // referenced = union over ALL retained versions, not just latest:
    // an OPTIMIZE inside the horizon removed files from the latest
    // state that older retained snapshots still read (r14)
    val referenced = vs.filter(_ >= keepFrom)
      .flatMap(v => stateAt(path, v)._1).toSet
    val cutoff = System.currentTimeMillis() - strayMinAgeMs
    val strays = Option(new java.io.File(path).list()).getOrElse(Array.empty)
      .filter(n => n.startsWith("part-") && n.endsWith(".dat") && !referenced(n))
      .filter(n => new java.io.File(path, n).lastModified() < cutoff)
    strays.foreach(n => new java.io.File(path, n).delete())
    (dropped.size.toLong, strays.length.toLong, keepFrom)
  }

  /** Publish a new manifest version via compare-and-swap, merging
    * `newFiles` into the latest committed state. Returns the version
    * that made this commit's rows visible. Loser of a concurrent race
    * RE-READS and RETRIES — never overwrites. A `batchId` already
    * recorded in the chain makes the commit an idempotent no-op
    * (replayed micro-batch): the duplicate task files are deleted.
    */
  /** Spec/back-compat entry: a bare batch id lives in the legacy
    * empty-app namespace (single-writer semantics, as r13 shipped). */
  private[graft] def commitVersion(path: String, newFiles: Seq[String],
                                     batchId: Option[Long]): Long =
    commitVersionKeyed(path, newFiles, batchId.map(b => s":$b"))

  private[graft] def commitVersionKeyed(path: String, newFiles: Seq[String],
                                          replayKey: Option[String],
                                          removeFiles: Seq[String] = Seq.empty): Long = {
    new java.io.File(path).mkdirs()
    var attempt = 0
    while (attempt < 1000) {
      val latest = latestVersion(path)
      val (priorFiles, priorBatches) = latest match {
        case Some(v) => stateAt(path, v)
        case None    => (Seq.empty[String], Set.empty[String])
      }
      if (replayKey.exists(priorBatches.contains)) {
        // replay of an already-applied micro-batch/epoch FROM THE SAME
        // WRITER (key = appId:batchId — a different writer's batch 0
        // is a different key, never falsely absorbed): its rows are
        // already visible under another file set — absorb silently
        newFiles.foreach(f => new java.io.File(path, f).delete())
        return latest.get
      }
      // a replacement (OPTIMIZE) must remove files that are still part
      // of the current state — a concurrent compaction that already
      // replaced them is a CONFLICT, not a silent no-op (the Delta
      // concurrent-OPTIMIZE rule)
      val missing = removeFiles.filterNot(priorFiles.toSet)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"KvSource: commit removes files not in the current state at $path " +
            s"(concurrent rewrite?): ${missing.take(5).mkString(",")}")
      val v = latest.getOrElse(0L) + 1
      // every CheckpointInterval-th version is a full-state checkpoint;
      // the rest are deltas carrying ONLY this commit's files/batch/
      // removes — commit cost stays O(own files), amortized O(total/N)
      val body =
        if (v % CheckpointInterval == 0) {
          // removes are already folded OUT of the listed state; the
          // #remove: headers are kept anyway so the STREAMING source
          // can tell a rewrite-at-checkpoint from an append (it must
          // skip rewrites or double-deliver their rows)
          val header = "#checkpoint" +:
            ((priorBatches ++ replayKey).toSeq.sorted.map(b => s"#txn:$b") ++
              removeFiles.distinct.map(f => s"#remove:$f"))
          val state = priorFiles.filterNot(removeFiles.toSet) ++ newFiles
          (header ++ state.distinct).mkString("\n")
        } else {
          (replayKey.toSeq.map(b => s"#txn:$b") ++
            removeFiles.distinct.map(f => s"#remove:$f") ++
            newFiles.distinct).mkString("\n")
        }
      if (publishCas(path, v, body)) return v
      attempt += 1 // lost the race — merge against the new state
    }
    throw new IllegalStateException(
      s"KvSource: commit CAS did not converge after 1000 attempts at $path")
  }

  /** OPTIMIZE (atomic small-file compaction — the last piece of the
    * lakehouse maintenance lifecycle after checkpointing and
    * [[vacuum]]): rewrite the CURRENT committed row set into one
    * file and publish a SINGLE version that adds it and removes every
    * input file. Readers at any moment see either the old files or
    * the one new file — never both (no transient double-count) and
    * never neither; historical versions still reference the old files
    * (vacuum reclaims them past the retention age, after which
    * pre-compaction time travel fails with the retention error, by
    * design). The rewrite itself is one executor task streaming the
    * merged rows (local-mode note: like the binary staging in
    * [[graft.multimodal.Multimodal]], executor and driver share a
    * filesystem here; on a cluster the rewrite is the same one-task
    * job against DFS). Returns (files before, version published). */
  private[graft] def optimizeCompact(spark: org.apache.spark.sql.SparkSession,
                                       path: String): (Long, Long) = {
    // pin ONE version for both the file list and the row scan: a
    // commit landing between the two would otherwise put rows in the
    // compacted file that the remove list doesn't cover (double count)
    val v0 = latestVersion(path).getOrElse(
      throw new IllegalArgumentException(s"KvSource: nothing to compact at $path"))
    val old = committedFiles(path, Some(v0))
    require(old.nonEmpty, s"KvSource: nothing to compact at $path")
    val name = s"part-compact-${java.util.UUID.randomUUID().toString.take(8)}.dat"
    spark.read.format(classOf[KvSource].getName).option("path", path)
      .option("versionAsOf", v0.toString).load()
      .repartition(1)
      .foreachPartition { rows: java.util.Iterator[org.apache.spark.sql.Row] =>
        val tmp = java.nio.file.Paths.get(path, s".$name.tmp")
        val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
          java.nio.file.Files.newOutputStream(tmp), "UTF-8"))
        try rows.forEachRemaining { r =>
          out.write(r.getLong(0).toString); out.write(','); out.write(r.getString(1)); out.write('\n')
        } finally out.close()
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path, name),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    val v = commitVersionKeyed(path, Seq(name), None, removeFiles = old)
    (old.size.toLong, v)
  }

  /** The one non-portable seam of the commit log: atomically publish
    * `body` as `_manifest.v<v>` IF AND ONLY IF that name does not
    * exist yet, returning whether this committer won. Local POSIX
    * implementation: write a temp, then hard-link it to the version
    * name — link creation is atomic create-if-absent WITH full
    * content (rename would silently replace an existing winner). On
    * an object store this method is the thing to swap: S3
    * `If-None-Match: *` conditional PUT, GCS `ifGenerationMatch=0`,
    * ABFS/HDFS atomic create-no-overwrite — same contract, different
    * primitive. Filesystems without hard links (FAT, some network
    * mounts) fail here with a clear requirement message, never an
    * opaque UnsupportedOperationException, and never leak the temp. */
  private[graft] def publishCas(path: String, v: Long, body: String): Boolean = {
    import java.nio.file.{Files, Paths, FileAlreadyExistsException}
    val tmp = Paths.get(path, s"._manifest.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes("UTF-8"))
    try {
      Files.createLink(Paths.get(path, s"_manifest.v$v"), tmp)
      true
    } catch {
      case _: FileAlreadyExistsException => false
      case e: UnsupportedOperationException =>
        throw new UnsupportedOperationException(
          s"KvSource: commit log at $path needs a hard-link-capable " +
            "filesystem for its create-if-absent CAS (object stores: " +
            "swap publishCas for a conditional PUT)", e)
    } finally Files.deleteIfExists(tmp)
  }
}

class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kv($path)"
  override def schema(): StructType = KvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val asOf = Option(options.get("versionAsOf")).map(_.toLong)
    new ScanBuilder { override def build(): Scan = new KvScan(path, asOf) }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val batchId = Option(info.options.get("batchId")).map(_.toLong)
    // replay-ledger namespace (the Delta `txn` appId): a batch writer
    // may scope its batch ids with option("txnAppId", ...); without it
    // they live in the legacy empty-app namespace (single-writer
    // semantics). Streaming epochs are ALWAYS scoped by the streaming
    // query's stable id, so two queries' epoch counters — or a query
    // restarted with a fresh checkpoint — can never falsely absorb.
    val txnAppId = Option(info.options.get("txnAppId")).getOrElse("")
    val replayKey = batchId.map(b => s"$txnAppId:$b")
    // per-query salt for task file names: a second application
    // appending to the same path restarts partition/task ids, so the
    // name needs a component unique to this write query
    val qid = info.queryId().replaceAll("[^0-9a-zA-Z]", "").take(8)
    val fullQueryId = info.queryId()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path, replayKey, qid)
        override def toStreaming: streaming.StreamingWrite =
          new KvStreamingWrite(path, qid, fullQueryId)
      }
    }
  }
}

// ---- read side: manifest-gated, version-pinned ----

case class KvFilePartition(file: String) extends InputPartition

class KvScan(path: String, asOf: Option[Long]) extends Scan with Batch {
  // pin the version at planning time so every partition of this scan
  // reads one consistent snapshot even if a writer commits mid-query
  private val version: Option[Long] =
    asOf.orElse(KvSource.latestVersion(path))
  override def readSchema(): StructType = KvSource.schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new KvMicroBatchStream(path)
  override def description(): String =
    s"KvScan path=$path version=${version.getOrElse(-1L)} (manifest-gated)"
  override def planInputPartitions(): Array[InputPartition] =
    KvSource.committedFiles(path, version)
      .map(f => KvFilePartition(new java.io.File(path, f).getPath): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory
}

/** Shared by the batch scan and the micro-batch stream: STREAM the
  * file — one line in flight per reader, never a whole-file buffer
  * (bounded memory at any file size). */
class KvReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val src = scala.io.Source.fromFile(
      p.asInstanceOf[KvFilePartition].file, "UTF-8")
    val it = src.getLines()
    new PartitionReader[InternalRow] {
      private var line: String = _
      override def next(): Boolean = {
        if (it.hasNext) { line = it.next(); true } else false
      }
      override def get(): InternalRow = {
        val cut = line.indexOf(',')
        InternalRow(line.substring(0, cut).toLong,
          UTF8String.fromString(line.substring(cut + 1)))
      }
      override def close(): Unit = src.close()
    }
  }
}

/** Streaming SOURCE over the commit log (completing KvSource as a
  * full streaming TABLE — the Delta streaming-source shape): offsets
  * ARE manifest versions, each micro-batch reads the files ADDED by
  * versions (start, end], and a REWRITE version (one that carries
  * `#remove:` lines — an OPTIMIZE) is skipped entirely: its adds are
  * old rows in new clothes, and emitting them would double-deliver
  * (Delta's streaming source refuses such commits unless
  * ignoreChanges; this log can tell rewrites from appends
  * structurally, so it skips them exactly). Version pinning makes
  * offsets replayable: the same (start, end] range always yields the
  * same files, so checkpoint recovery re-reads identical data. */
class KvMicroBatchStream(path: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private case class KvOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = KvOffset(0L)
  override def latestOffset(): Offset =
    KvOffset(KvSource.latestVersion(path).getOrElse(0L))
  override def deserializeOffset(json: String): Offset = KvOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[KvOffset].v
    val hi = end.asInstanceOf[KvOffset].v
    ((lo + 1) to hi).flatMap { v =>
      val (adds, _, removes) = KvSource.readManifest(path, v)
      // a checkpoint version re-lists the full state: only its OWN
      // adds are new data. Deltas list only their adds, so the diff
      // against the previous version's state isolates them uniformly.
      val newFiles =
        if (v % KvSource.CheckpointInterval == 0 || removes.nonEmpty) {
          val prev = if (v == 1) Set.empty[String]
                     else KvSource.stateAt(path, v - 1)._1.toSet
          if (removes.nonEmpty) Seq.empty // rewrite (OPTIMIZE): no new rows
          else adds.filterNot(prev)
        } else adds
      newFiles.map(f =>
        KvFilePartition(new java.io.File(path, f).getPath): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new KvReaderFactory
}

// ---- write side: staged task commit, version-chained job commit ----

case class KvCommitMessage(file: String) extends WriterCommitMessage

class KvBatchWrite(path: String, replayKey: Option[String], queryId: String)
    extends BatchWrite {
  // spec/back-compat constructor: plain batch write, no replay key
  def this(path: String) = this(path, None, "local")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path, queryId)

  /** Job commit: APPEND semantics through the version chain — the new
    * task files MERGE with the latest committed state and publish as
    * `_manifest.v<latest+1>` under the CAS in
    * [[KvSource.commitVersionKeyed]]. A reader either sees a complete
    * committed version or the previous one — never a half state, and
    * never a state missing a concurrent winner's files. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.map(_.asInstanceOf[KvCommitMessage].file).toSeq
    KvSource.commitVersionKeyed(path, newFiles, replayKey)
  }

  /** Job abort: whatever tasks already committed is garbage now —
    * remove it so a retry starts clean. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(f) => new java.io.File(path, f).delete()
      case _ => ()
    }
}

class KvWriterFactory(path: String, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, partitionId, taskId, queryId)
}

/** TRUE Structured Streaming sink (TableCapability.STREAMING_WRITE):
  * `df.writeStream.format(kv)` commits each epoch through the SAME
  * version-chained CAS as the batch path — the epoch id plays the
  * `#batch:` role, so a replayed epoch (driver restart re-running a
  * micro-batch whose sink commit already landed) is absorbed as a
  * no-op whose duplicate task files never reach a manifest. This is
  * the exactly-once story end-to-end on Spark's own streaming write
  * protocol, not a foreachBatch shim: task writers salt their file
  * names with the epoch (same writer restarted at epoch N+1 must not
  * collide with its epoch-N files), and
  * [[KvSource.commitVersion]] makes the epoch commit atomic,
  * concurrent-safe, and idempotent. */
class KvStreamingWrite(path: String, queryId: String, fullQueryId: String)
    extends streaming.StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new KvStreamingWriterFactory(path, queryId)

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.map(_.asInstanceOf[KvCommitMessage].file).toSeq
    // epoch keyed by the STREAMING QUERY's stable id: a replayed
    // micro-batch of THIS query absorbs; another query's epoch 0 (or a
    // fresh-checkpoint restart, which mints a new query id) appends
    KvSource.commitVersionKeyed(path, newFiles, Some(s"$fullQueryId:$epochId"))
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(f) => new java.io.File(path, f).delete()
      case _ => ()
    }
}

/** Named (and thus cleanly serializable) factory shipped to executors
  * for streaming epochs: task files salt their names with the epoch,
  * so a restarted writer at epoch N+1 can never collide with its own
  * epoch-N files. */
class KvStreamingWriterFactory(path: String, queryId: String)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, partitionId, taskId, s"$queryId-e$epochId")
}

/** Task writer: stream to a temp, rename on commit, delete on abort.
  * The rename is the task's atomic "publish" — until it happens the
  * file is invisible to every reader (the manifest lists only
  * committed names, and even a directory listing sees a dot-temp).
  * The line format demands non-null, newline-free `val`: violations
  * fail the TASK fast (clear error → task abort → nothing visible),
  * never corrupt a committed file. */
class KvDataWriter(path: String, partitionId: Int, taskId: Long, queryId: String)
    extends DataWriter[InternalRow] {
  // spec/back-compat constructor
  def this(path: String, partitionId: Int, taskId: Long) =
    this(path, partitionId, taskId, "local")

  private val finalName = s"part-$partitionId-$taskId-$queryId.dat"
  private val tmpFile = new java.io.File(path, s".$finalName.tmp")
  new java.io.File(path).mkdirs()
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmpFile), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(0) || row.isNullAt(1))
      throw new IllegalArgumentException(
        "KvSource: key and val must be non-null (line format has no null encoding)")
    val v = row.getUTF8String(1).toString
    if (v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0)
      throw new IllegalArgumentException(
        "KvSource: val must not contain newlines (line-oriented format)")
    out.write(row.getLong(0).toString)
    out.write(',')
    out.write(v)
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.move(tmpFile.toPath, Paths.get(path, finalName),
      StandardCopyOption.ATOMIC_MOVE)
    KvCommitMessage(finalName)
  }

  override def abort(): Unit = { out.close(); tmpFile.delete() }
  override def close(): Unit = ()
}

package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
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
  *     (N = latest + 1) listing the full committed file set. The
  *     publish is a compare-and-swap: the content is written to a
  *     temp and HARD-LINKED to the version name — link creation is
  *     atomic create-if-absent, so of two concurrent committers
  *     exactly one wins version N and the loser RE-READS the new
  *     latest state, re-merges its files, and retries at N+1. No
  *     committer can erase another's files (the r12 last-writer-wins
  *     hole, closed);
  *   - the READ path lists files FROM the latest manifest version
  *     (or a pinned `versionAsOf` — time travel), never the
  *     directory — stray/partial/aborted files are invisible by
  *     construction, which is the property that makes task retries
  *     and speculative execution safe;
  *   - a commit may carry a `batchId` (Structured Streaming
  *     foreachBatch replay protection): applied batch ids are
  *     recorded in the manifest chain (`#batch:` header lines), and a
  *     commit whose batchId is already applied is a NO-OP that
  *     deletes its duplicate task files — a replayed micro-batch
  *     adds zero rows, the streaming half of exactly-once.
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

  private val VersionRe = "_manifest\\.v(\\d+)".r

  /** All committed manifest versions at this path, ascending. */
  private[graft] def versions(path: String): Seq[Long] = {
    val d = new java.io.File(path)
    if (!d.isDirectory) Seq.empty
    else d.list().toSeq.collect { case VersionRe(n) => n.toLong }.sorted
  }

  private[graft] def latestVersion(path: String): Option[Long] =
    versions(path).lastOption

  private def manifestFile(path: String, v: Long): java.io.File =
    new java.io.File(path, s"_manifest.v$v")

  /** (files, applied stream batch ids) a manifest version declares.
    * `#`-prefixed lines are headers; everything else is a file name. */
  private[graft] def readManifest(path: String, v: Long): (Seq[String], Set[Long]) = {
    val src = scala.io.Source.fromFile(manifestFile(path, v), "UTF-8")
    try {
      val lines = src.getLines().filter(_.nonEmpty).toList
      val (hdr, files) = lines.partition(_.startsWith("#"))
      val batches = hdr.collect { case s if s.startsWith("#batch:") =>
        s.stripPrefix("#batch:").toLong
      }.toSet
      (files, batches)
    } finally src.close()
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
        readManifest(path, n)._1
    }
  }

  /** Publish a new manifest version via compare-and-swap, merging
    * `newFiles` into the latest committed state. Returns the version
    * that made this commit's rows visible. Loser of a concurrent race
    * RE-READS and RETRIES — never overwrites. A `batchId` already
    * recorded in the chain makes the commit an idempotent no-op
    * (replayed micro-batch): the duplicate task files are deleted.
    */
  private[graft] def commitVersion(path: String, newFiles: Seq[String],
                                     batchId: Option[Long]): Long = {
    import java.nio.file.{Files, Paths, FileAlreadyExistsException}
    new java.io.File(path).mkdirs()
    var attempt = 0
    while (attempt < 1000) {
      val latest = latestVersion(path)
      val (priorFiles, priorBatches) = latest match {
        case Some(v) => readManifest(path, v)
        case None    => (Seq.empty[String], Set.empty[Long])
      }
      if (batchId.exists(priorBatches.contains)) {
        // replay of an already-applied micro-batch: its rows are
        // already visible under another file set — absorb silently
        newFiles.foreach(f => new java.io.File(path, f).delete())
        return latest.get
      }
      val v = latest.getOrElse(0L) + 1
      val header = (priorBatches ++ batchId).toSeq.sorted.map(b => s"#batch:$b")
      val body = (header ++ (priorFiles ++ newFiles).distinct).mkString("\n")
      val tmp = Paths.get(path, s"._manifest.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, body.getBytes("UTF-8"))
      try {
        // hard-link = atomic create-if-absent WITH full content: the
        // CAS. rename() would silently replace an existing winner.
        Files.createLink(Paths.get(path, s"_manifest.v$v"), tmp)
        Files.delete(tmp)
        return v
      } catch {
        case _: FileAlreadyExistsException =>
          Files.delete(tmp)
          attempt += 1 // lost the race — merge against the new state
      }
    }
    throw new IllegalStateException(
      s"KvSource: commit CAS did not converge after 1000 attempts at $path")
  }
}

class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kv($path)"
  override def schema(): StructType = KvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val asOf = Option(options.get("versionAsOf")).map(_.toLong)
    new ScanBuilder { override def build(): Scan = new KvScan(path, asOf) }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val batchId = Option(info.options.get("batchId")).map(_.toLong)
    // per-query salt for task file names: a second application
    // appending to the same path restarts partition/task ids, so the
    // name needs a component unique to this write query
    val qid = info.queryId().replaceAll("[^0-9a-zA-Z]", "").take(8)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path, batchId, qid)
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
  override def description(): String =
    s"KvScan path=$path version=${version.getOrElse(-1L)} (manifest-gated)"
  override def planInputPartitions(): Array[InputPartition] =
    KvSource.committedFiles(path, version)
      .map(f => KvFilePartition(new java.io.File(path, f).getPath): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        // STREAM the file: one line in flight per reader, never a
        // whole-file buffer (bounded memory at any file size)
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
}

// ---- write side: staged task commit, version-chained job commit ----

case class KvCommitMessage(file: String) extends WriterCommitMessage

class KvBatchWrite(path: String, batchId: Option[Long], queryId: String)
    extends BatchWrite {
  // spec/back-compat constructor: plain batch write, no replay key
  def this(path: String) = this(path, None, "local")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path, queryId)

  /** Job commit: APPEND semantics through the version chain — the new
    * task files MERGE with the latest committed state and publish as
    * `_manifest.v<latest+1>` under the CAS in
    * [[KvSource.commitVersion]]. A reader either sees a complete
    * committed version or the previous one — never a half state, and
    * never a state missing a concurrent winner's files. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val newFiles = messages.map(_.asInstanceOf[KvCommitMessage].file).toSeq
    KvSource.commitVersion(path, newFiles, batchId)
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

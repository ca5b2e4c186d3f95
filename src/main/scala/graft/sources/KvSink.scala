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
  * protocol — the exactly-once batch-write contract every production
  * sink implements (and the piece [[SeqSource]]'s read-only connector
  * doesn't exercise):
  *
  *   - each task writer streams rows to `part-<partition>-<task>.tmp`;
  *   - task COMMIT atomically renames it to `part-….dat` and reports
  *     the name upward as its [[WriterCommitMessage]];
  *   - task ABORT deletes the temp — a failed/speculative task leaves
  *     NOTHING visible;
  *   - job COMMIT writes a `_manifest` (atomic tmp+move) listing
  *     exactly the committed files;
  *   - the READ path lists files FROM THE MANIFEST, never the
  *     directory — stray/partial/aborted files are invisible by
  *     construction, which is the property that makes task retries and
  *     speculative execution safe.
  *
  * Format is deliberately trivial (`key,val` lines over a fixed
  * (key BIGINT, val STRING) schema) — the protocol, not the encoding,
  * is the point. One read InputPartition per committed file, so read
  * parallelism follows write parallelism. Reference: the same
  * rename-into-manifest choreography Spark's own FileBatchWrite /
  * HadoopMapReduceCommitProtocol runs (public API surface only).
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

  private[sources] def manifest(path: String): java.io.File =
    new java.io.File(path, "_manifest")

  /** Files the manifest declares committed — the ONLY files a reader
    * may see. Missing manifest = no successful job = empty table. */
  private[sources] def committedFiles(path: String): Seq[String] = {
    val m = manifest(path)
    if (!m.exists()) Seq.empty
    else {
      val src = scala.io.Source.fromFile(m, "UTF-8")
      try src.getLines().filter(_.nonEmpty).toList finally src.close()
    }
  }
}

class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"kv($path)"
  override def schema(): StructType = KvSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder { override def build(): Scan = new KvScan(path) }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvBatchWrite(path)
      }
    }
}

// ---- read side: manifest-gated ----

case class KvFilePartition(file: String) extends InputPartition

class KvScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = KvSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"KvScan path=$path files=${KvSource.committedFiles(path).size} (manifest-gated)"
  override def planInputPartitions(): Array[InputPartition] =
    KvSource.committedFiles(path)
      .map(f => KvFilePartition(new java.io.File(path, f).getPath): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val lines = {
          val src = scala.io.Source.fromFile(
            p.asInstanceOf[KvFilePartition].file, "UTF-8")
          try src.getLines().toArray finally src.close()
        }
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < lines.length }
          override def get(): InternalRow = {
            val line = lines(i)
            val cut = line.indexOf(',')
            InternalRow(line.substring(0, cut).toLong,
              UTF8String.fromString(line.substring(cut + 1)))
          }
          override def close(): Unit = ()
        }
      }
    }
}

// ---- write side: staged task commit, manifest job commit ----

case class KvCommitMessage(file: String) extends WriterCommitMessage

class KvBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new KvWriterFactory(path)

  /** Job commit: APPEND semantics — the new task files are MERGED
    * with whatever a previous successful job committed (a second
    * Append to the same path must add rows, never silently retract
    * the first job's), and the merged manifest is written ATOMICALLY
    * (tmp + move), so a reader either sees the complete new file list
    * or the previous state — never a half-written manifest. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    new java.io.File(path).mkdirs()
    val prior = KvSource.committedFiles(path)
    val names = (prior ++ messages.map(_.asInstanceOf[KvCommitMessage].file)).distinct
    val tmp = Paths.get(path, s"._manifest.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, names.mkString("\n").getBytes("UTF-8"))
    Files.move(tmp, KvSource.manifest(path).toPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Job abort: whatever tasks already committed is garbage now —
    * remove it so a retry starts clean. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case KvCommitMessage(f) => new java.io.File(path, f).delete()
      case _ => ()
    }
}

class KvWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, partitionId, taskId)
}

/** Task writer: stream to a temp, rename on commit, delete on abort.
  * The rename is the task's atomic "publish" — until it happens the
  * file is invisible to every reader (the manifest lists only
  * committed names, and even a directory listing sees a dot-temp). */
class KvDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val finalName = s"part-$partitionId-$taskId.dat"
  private val tmpFile = new java.io.File(path, s".$finalName.tmp")
  new java.io.File(path).mkdirs()
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmpFile), "UTF-8"))

  override def write(row: InternalRow): Unit = {
    out.write(row.getLong(0).toString)
    out.write(',')
    out.write(row.getUTF8String(1).toString)
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

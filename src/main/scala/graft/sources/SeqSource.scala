package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 table — the extension surface a Spark-native
  * engine uses to ingest systems Spark has no built-in reader for
  * (the reference's JDBC paging loop is the moral equivalent;
  * [[graft.sources.Jdbc]] covers that path with Spark's own JDBC
  * source, THIS source demonstrates the connector API itself). It
  * serves a deterministic keyed sequence (id, bucket = id % 97,
  * h = md5(id)) of `rows` rows in `slices` range partitions, and
  * implements BOTH pushdown surfaces:
  *
  *  - `SupportsPushDownFilters`: range predicates on `id` are
  *    accepted at planning time and PRUNE WHOLE PARTITIONS — the scan
  *    materializes only slices overlapping [lo, hi); a 1000-partition
  *    source behind a narrow filter reads a handful. Accepted filters
  *    are also applied row-level inside the reader (exact residual),
  *    and returned as pushed so Spark drops its own copy.
  *  - `SupportsPushDownRequiredColumns`: the reader emits only the
  *    pruned columns — `h` (the expensive one, an md5 per row) is
  *    never computed when the query doesn't ask for it.
  *
  * The gate query's oracle recomputes the same rows from DuckDB's
  * range() — a pushdown bug that drops or duplicates a boundary row
  * fails the hash; the spec additionally asserts the partition count
  * the filter leaves behind. */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SeqTable(
      properties.getOrDefault("rows", "65536").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object SeqSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("h", StringType, nullable = false)))

  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }
}

class SeqTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"seq($rows)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SeqScanBuilder(rows, slices)
}

class SeqScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // literal may surface as Int or Long depending on how the
    // predicate was written; both are exact in a Long range
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("id", _: Number) | GreaterThan("id", _: Number) |
           LessThan("id", _: Number) | LessThanOrEqual("id", _: Number) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("id", v: Number) => lo = math.max(lo, v.longValue())
      case GreaterThan("id", v: Number)        => lo = math.max(lo, v.longValue() + 1)
      case LessThan("id", v: Number)           => hi = math.min(hi, v.longValue())
      case LessThanOrEqual("id", v: Number)    => hi = math.min(hi, v.longValue() + 1)
      case _ =>
    }
    pushed = accepted
    rejected // Spark keeps evaluating only these
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SeqScan(rows, slices, lo, hi, required)
}

case class SeqSlice(start: Long, end: Long) extends InputPartition

class SeqScan(rows: Long, slices: Int, lo: Long, hi: Long,
              required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SeqScan rows=$rows slices=$slices pushed=[$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    // uniform slices of [0, rows); a slice is PLANNED only if it
    // overlaps the pushed range — whole-partition pruning, the DSv2
    // analog of parquet row-group skipping
    val width = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => SeqSlice(i * width, math.min(rows, (i + 1) * width)))
      .filter(s => s.end > lo && s.start < hi)
      .map(s => SeqSlice(math.max(s.start, lo), math.min(s.end, hi)))
      .filter(s => s.end > s.start)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqReaderFactory(required)
}

class SeqReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val s = p.asInstanceOf[SeqSlice]
    new PartitionReader[InternalRow] {
      private var cur = s.start - 1
      private val fields = required.fieldNames
      override def next(): Boolean = { cur += 1; cur < s.end }
      override def get(): InternalRow = {
        val vals = fields.map {
          case "id"     => java.lang.Long.valueOf(cur)
          case "bucket" => java.lang.Long.valueOf(cur % 97)
          // computed ONLY when the projection kept the column
          case "h"      => UTF8String.fromString(SeqSource.md5Hex(cur.toString))
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}

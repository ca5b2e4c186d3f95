package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.etl.SchemaMapper

/** Source/sink surface. The reference reads relational tables over
  * JDBC (hand-rolled offset pagination, TableToDbRowFn.java:62-137)
  * and writes BigQuery with CREATE_IF_NEEDED/WRITE_APPEND streaming
  * inserts (DBImportPipeline.java:116-131). Spark-native equivalents:
  * partitioned spark.read.jdbc, and SaveMode-disciplined columnar
  * writes with the same schema sanitization the reference applies.
  */
object Sources {

  /** Partitioned JDBC read — replaces the reference's Splittable DoFn:
    * numPartitions concurrent range queries on the primary key, with
    * predicate pushdown into the database. */
  def readJdbc(spark: SparkSession, url: String, table: String, pk: String,
               lower: Long, upper: Long, numPartitions: Int,
               props: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read
      .option("fetchsize", "10000")
      .jdbc(url, table, pk, lower, upper, numPartitions, props)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Warehouse write disposition mapping (reference
    * WriteDisposition/CreateDisposition): WRITE_APPEND→Append,
    * WRITE_TRUNCATE→Overwrite, WRITE_EMPTY→ErrorIfExists; the target
    * is created if needed in every mode (CREATE_IF_NEEDED). */
  def writeDisposition(mode: String): SaveMode = mode match {
    case "WRITE_APPEND" => SaveMode.Append
    case "WRITE_TRUNCATE" => SaveMode.Overwrite
    case "WRITE_EMPTY" => SaveMode.ErrorIfExists
    case other => throw new IllegalArgumentException(s"unknown write disposition $other")
  }

  /** Warehouse-style sink: sanitize column names to valid identifiers
    * (ServerUtil.checkHeaderName), partition by the given columns, and
    * write columnar parquet under the dataset/table dir layout the
    * reference would create in BigQuery. */
  def writeWarehouse(df: DataFrame, baseDir: String, dataset: String, table: String,
                     disposition: String = "WRITE_APPEND",
                     partitionBy: Seq[String] = Nil): Unit = {
    val sanitized = df.columns.foldLeft(df) { (d, c) =>
      val s = SchemaMapper.sanitizeName(c)
      if (s == c) d else d.withColumnRenamed(c, s)
    }
    val w = sanitized.write.mode(writeDisposition(disposition))
    val w2 = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    w2.parquet(s"$baseDir/$dataset/$table")
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** ORC: the columnar interchange format warehouses that are not
    * parquet-native speak; Spark's reader/writer are built in. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}

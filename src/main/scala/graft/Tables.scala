package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog over the driver-generated parquet tables.
  *
  * Spark-native analog of the reference's schema discovery
  * (ServerUtil.java:104-137 enumerates INFORMATION_SCHEMA.TABLES): here
  * the "database" is a directory of parquet tables; reads are plain
  * `spark.read.parquet` so Catalyst gets full column pruning +
  * predicate pushdown on every query. On a real cluster the same API
  * fronts `spark.read.jdbc` (see [[graft.etl.Ingest]]).
  */
object Tables {
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), org.apache.spark.sql.types.StructType]

  /** Cached schema lookup — catalog queries touch all 10 tables and
    * parquet footer reads are the dominant cost there. */
  def schema(spark: SparkSession, sfDir: String, name: String): org.apache.spark.sql.types.StructType =
    schemaCache.getOrElseUpdate((sfDir, name), load(spark, sfDir, name).schema)

  /** All tables the test corpus ships; mirrors the reference's
    * INFORMATION_SCHEMA.TABLES result set. */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts encoding varies by generator version: either parquet
      // TIMESTAMP(NANOS) — which Spark's vectorized reader rejects, so
      // it's read as raw nanos and truncated to micros (exactly what
      // DuckDB's TIMESTAMP_NS → TIMESTAMP cast does) — or plain
      // TIMESTAMP(MICROS), which arrives as TIMESTAMP_NTZ and is cast
      // to the session-UTC instant type the operators were written
      // against. Dispatch on the resolved type so both corpora load to
      // an identical `ts: timestamp` column.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

package graft.sources

import org.apache.spark.sql.DataFrame

/** Pluggable sink surface — the seam where the environment-bound
  * external clients plug in.
  *
  * The reference terminates its pipelines in two managed services:
  * streaming inserts into BigQuery with a transient-retry policy
  * (DBImportPipeline.java:100-133) and JSON publishes to a Pub/Sub
  * topic (BQReidentificationPipeline.java:240-265). Neither service is
  * reachable from a self-contained library, so every operator here
  * writes through these traits instead: the shipped implementations
  * land the same rows/payloads in the local warehouse layout
  * (parquet) and a local topic directory (JSON lines), and a real
  * BigQuery/Pub/Sub adapter is a drop-in class — implement the one
  * method with the service client and pass it where a sink is
  * accepted (e.g. [[graft.etl.Migration.runImport]]). Everything
  * upstream of the sink — dispositions, retry-then-dead-letter,
  * batch shaping, payload format — is engine code and stays
  * unchanged.
  */
trait WarehouseSink {

  /** Write one table of one dataset under a write disposition
    * (WRITE_APPEND / WRITE_TRUNCATE / WRITE_EMPTY — the reference's
    * BigQuery dispositions; targets are created if needed). */
  def write(df: DataFrame, dataset: String, table: String,
            disposition: String = "WRITE_APPEND",
            partitionBy: Seq[String] = Nil): Unit
}

/** Message-topic sink (the Pub/Sub seam): publishes a DataFrame of
  * pre-formatted payloads to a named topic. */
trait MessageSink {

  /** Publish `messages` — expected to carry a `message` string column
    * (other columns ride along as attributes) — to `topic`. */
  def publish(messages: DataFrame, topic: String): Unit
}

/** Default warehouse: columnar parquet under `baseDir/dataset/table`,
  * with the reference's name sanitization and disposition mapping —
  * the layout every oracle-checked query reads back. */
final class ParquetWarehouseSink(baseDir: String) extends WarehouseSink {
  override def write(df: DataFrame, dataset: String, table: String,
                     disposition: String = "WRITE_APPEND",
                     partitionBy: Seq[String] = Nil): Unit =
    Sources.writeWarehouse(df, baseDir, dataset, table, disposition, partitionBy)
}

/** Default topic: JSON-lines files under `baseDir/topic` — append-only
  * like a publish, re-readable for verification. */
final class FileMessageSink(baseDir: String) extends MessageSink {
  override def publish(messages: DataFrame, topic: String): Unit =
    messages.write.mode("append").json(s"$baseDir/$topic")
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Warehouse-load fault isolation — the reference's insert policy
  * (DBImportPipeline.java:130-132: `InsertRetryPolicy
  * .retryTransientErrors()` + failed-insert dead-letter tag). Spark
  * task retry already covers executor faults; this models the SINK
  * side: transient insert errors are retried, permanent (poison) rows
  * go to the dead letter without stalling the load.
  *
  * Two forms:
  *  - [[dispositions]]: the batch/oracle form — per-row final
  *    disposition under a deterministic transient-failure model
  *    (pure Catalyst expressions, engine-checkable);
  *  - [[writeWithRetry]]: the real machinery — a foreachBatch-shaped
  *    writer that pre-routes poison rows, retries the write with
  *    backoff, and dead-letters the batch only when retries exhaust.
  */
object LoadRetry {

  /** Deterministic transient-failure model: a row "fails its first
    * insert attempt" iff md5(event_id) starts with 0..3 (≈ 1/4 of
    * rows) — stand-in for the warehouse's transient 5xx, reproducible
    * on any engine. */
  def transientFlag(eventId: Column): Column =
    substring(md5(eventId.cast("string")), 1, 1).isin("0", "1", "2", "3")

  /** Per-row final disposition after validate → insert → retry:
    * poison rows (malformed/out-of-range, the reference's failed
    * table-map tag) dead-letter on attempt 1; transient rows load on
    * attempt 2; the rest load first try. */
  def dispositions(events: DataFrame): DataFrame =
    Ingest.deadLetterRoute(events)
      .select(col("event_id"), col("status"), col("reason"),
        transientFlag(col("event_id")).as("flaky"))
      .select(col("event_id"),
        when(col("status") === "dead", lit(1L))
          .when(col("flaky"), lit(2L)).otherwise(lit(1L)).as("attempts"),
        when(col("status") === "dead", concat(lit("dead_letter:"), col("reason")))
          .when(col("flaky"), lit("loaded_retry")).otherwise(lit("loaded"))
          .as("disposition"))
      .orderBy("event_id")

  /** Retrying batch writer: pre-route poison rows to the dead letter,
    * then attempt `write` on the valid rows up to `maxAttempts` times;
    * if every attempt throws, the batch's rows are dead-lettered with
    * reason `retry_exhausted` instead of failing the stream (the
    * reference's failed-insert tag). Use from foreachBatch so a poison
    * micro-batch never wedges a streaming load. */
  def writeWithRetry(batch: DataFrame, deadDir: String, maxAttempts: Int)
                    (write: DataFrame => Unit): Unit = {
    val routed = Ingest.deadLetterRoute(batch).persist()
    try {
      routed.filter(col("status") === "dead").drop("status")
        .write.mode("append").parquet(deadDir)
      val ok = batch.join(
        routed.filter(col("status") === "ok").select("event_id"), "event_id")
      var attempt = 0
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt < maxAttempts) {
        attempt += 1
        try { write(ok); done = true }
        catch {
          case e: Exception =>
            lastErr = e
            // linear backoff: don't hammer a struggling warehouse
            if (attempt < maxAttempts) Thread.sleep(100L * attempt)
        }
      }
      if (!done) {
        // carry the terminal cause into the dead letter — the only
        // place it can still be diagnosed from
        routed.filter(col("status") === "ok")
          .withColumn("reason",
            lit(s"retry_exhausted:${lastErr.getClass.getSimpleName}:${lastErr.getMessage}"))
          .drop("status")
          .write.mode("append").parquet(deadDir)
        ()
      }
    } finally { routed.unpersist(); () }
  }

  /** Sink-shaped form: retry-load a batch into a
    * [[graft.sources.WarehouseSink]] table — the exact composition the
    * reference runs against BigQuery (insert with
    * retryTransientErrors, failures tagged to the dead letter). Swap
    * the sink for a BigQuery adapter and this IS the reference's load
    * path; the retry/dead-letter machinery doesn't change. */
  def writeWithRetry(batch: DataFrame, sink: graft.sources.WarehouseSink,
                     dataset: String, table: String, deadDir: String,
                     maxAttempts: Int): Unit =
    writeWithRetry(batch, deadDir, maxAttempts)(
      sink.write(_, dataset, table, "WRITE_APPEND"))
}

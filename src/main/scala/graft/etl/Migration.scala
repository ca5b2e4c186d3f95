package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Sources

/** The reference's whole program as one composed operation
  * (DBImportPipeline.java:69-165): enumerate tables, apply the
  * per-table DLP config, route invalid rows to a dead-letter sink,
  * write the de-identified tables to the warehouse layout, and return
  * the import manifest. Everything between the scan and the sink is
  * Catalyst expressions; each table is an independent job (the
  * natural unit of retry/parallelism on a cluster).
  */
object Migration {

  /** Run a full import pass. Returns the manifest:
    * (table_name, n_rows, deid_applied, n_dead). */
  def runImport(spark: SparkSession, dir: String, configJson: String,
                outBase: String, dataset: String = "imported"): DataFrame = {
    import spark.implicits._
    val cfgs = DlpConfig.parse(configJson).map(c => c.tableName -> c).toMap
    val rows = Tables.all.map { t =>
      val raw = Tables.load(spark, dir, t)
      val cfg = cfgs.get(t)
      // dead-letter validation applies to the event stream (the only
      // table with a validity rule — mirrors the reference routing
      // failed rows rather than failing the import)
      val (ok, nDead) =
        if (t == "events") {
          val routed = Ingest.deadLetterRoute(raw)
          val dead = routed.filter(col("status") === "dead")
          Sources.writeWarehouse(dead.drop("status"), outBase, dataset, s"${t}_dead_letter", "WRITE_TRUNCATE")
          val okIds = routed.filter(col("status") === "ok").select("event_id")
          (raw.join(okIds, "event_id"), routed.filter(col("status") === "dead").count())
        } else (raw, 0L)
      val deid = DlpConfig.applyTable(ok, cfg)
      Sources.writeWarehouse(deid, outBase, dataset, t, "WRITE_TRUNCATE")
      (t, deid.count(), if (cfg.isDefined) 1L else 0L, nDead)
    }
    rows.toDF("table_name", "n_rows", "deid_applied", "n_dead")
      .orderBy("table_name")
  }

  /** Queries-facing form: run the import into a fresh temp dir and
    * return the manifest (the driver checks it against per-table
    * count/validation oracles). */
  def manifest(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-import").toString
    runImport(spark, dir, DlpConfig.ExampleConfig, out)
  }
}

package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.Tables

/** Config-driven de-identification — the reference's per-table DLP
  * config surface (ServerUtil.parseDLPconfig, ServerUtil.java:252-272
  * loads `[{tableName, batchSize, deidTemplate, inspTemplate}]` from
  * GCS; CreateTableMapDoFn attaches it to each table). Here the
  * "template" is an explicit list of column transforms, so the whole
  * config is data and the transform plan is still pure Catalyst
  * expressions.
  */
object DlpConfig {

  sealed trait Transform { def column: String }
  case class MaskChars(column: String, keep: Int) extends Transform
  case class Redact(column: String) extends Transform
  case class ReplaceInfoType(column: String) extends Transform
  case class CryptoHash(column: String, key: String) extends Transform
  case class DeterministicToken(column: String, key: String) extends Transform
  case class Bucketize(column: String, width: Int) extends Transform
  case class DateShift(column: String, contextKey: String, maxDays: Int) extends Transform
  case class FpeDigits(column: String, key: String) extends Transform

  case class TableConfig(tableName: String, batchSize: Int, transforms: Seq[Transform])

  /** Parse the JSON config (same shape as the reference's, with
    * transforms inlined in place of DLP template ids). */
  def parse(json: String): Seq[TableConfig] = {
    implicit val fmts: Formats = DefaultFormats
    val arr = JsonMethods.parse(json).asInstanceOf[JArray]
    arr.arr.map { t =>
      val table = (t \ "tableName").extract[String]
      val batch = (t \ "batchSize").extractOrElse[Int](500)
      val txs = (t \ "transforms").asInstanceOf[JArray].arr.map { tx =>
        val col = (tx \ "column").extract[String]
        (tx \ "kind").extract[String] match {
          case "mask_chars" => MaskChars(col, (tx \ "keep").extractOrElse[Int](4))
          case "redact" => Redact(col)
          case "replace_infotype" => ReplaceInfoType(col)
          case "crypto_hash" => CryptoHash(col, (tx \ "key").extract[String])
          case "deterministic_token" => DeterministicToken(col, (tx \ "key").extract[String])
          case "bucketize" => Bucketize(col, (tx \ "width").extract[Int])
          case "date_shift" => DateShift(col, (tx \ "contextKey").extract[String],
            (tx \ "maxDays").extractOrElse[Int](30))
          case "fpe_digits" => FpeDigits(col, (tx \ "key").extract[String])
          case other => throw new IllegalArgumentException(s"unknown transform kind $other")
        }
      }
      TableConfig(table, batch, txs)
    }
  }

  private[graft] def toColumn(t: Transform, df: DataFrame): Column = t match {
    case MaskChars(c, keep) => Dlp.maskChars(col(c), keep)
    case Redact(c) => Dlp.redact(col(c))
    case ReplaceInfoType(c) => Dlp.replaceWithInfoType(col(c))
    case CryptoHash(c, key) => Dlp.cryptoHash(col(c), key)
    case DeterministicToken(c, key) => Dlp.deterministicToken(col(c), key)
    case Bucketize(c, w) => Dlp.bucketize(col(c), w)
    case DateShift(c, ctx, d) => Dlp.dateShift(col(c), col(ctx), d)
    case FpeDigits(c, key) => Dlp.fpeDigits(c, key)
  }

  /** Apply one table's configured transforms in place (columns keep
    * their names, like DLP returning the de-identified table with the
    * same headers — DLPTokenizationDoFn.java:100-160). Tables without
    * a config pass through untouched. */
  def applyTable(df: DataFrame, cfg: Option[TableConfig]): DataFrame =
    cfg.fold(df) { c =>
      c.transforms.foldLeft(df) { (d, t) =>
        d.withColumn(t.column, toColumn(t, d))
      }
    }

  /** Apply a full config to a directory of tables, returning the
    * de-identified frame per table (the reference's whole-DB import
    * pass, minus the service round-trips). */
  def applyAll(spark: SparkSession, dir: String, json: String,
               tables: Seq[String] = Tables.all): Map[String, DataFrame] = {
    val cfgs = parse(json).map(c => c.tableName -> c).toMap
    tables.map(t => t -> applyTable(Tables.load(spark, dir, t), cfgs.get(t))).toMap
  }

  /** The example config used by the `dlp_config_apply` query — the
    * analog of the reference README's sample dlpconfigs.json. */
  val ExampleConfig: String =
    """[{"tableName": "customer", "batchSize": 500, "transforms": [
      |  {"column": "c_name", "kind": "deterministic_token", "key": "det-key"},
      |  {"column": "c_acctbal", "kind": "bucketize", "width": 500}]},
      | {"tableName": "orders", "batchSize": 1000, "transforms": [
      |  {"column": "o_orderdate", "kind": "date_shift", "contextKey": "o_custkey", "maxDays": 30}]}
      |]""".stripMargin
}

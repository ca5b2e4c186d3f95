package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively.
  * Implemented by the scalable union+ordered-window composition: tag
  * both streams, union, and carry the last build-side row forward with
  * `last(_, ignoreNulls)` over a per-key ordered window. One shuffle
  * on the key, no range join, no per-row probe — the distributed
  * form of DuckDB's ASOF JOIN (which the oracle uses directly,
  * making this a cross-engine semantic check of the composition).
  */
object AsOf {

  /** Each purchase matched to the same user's most recent click at or
    * before it (inclusive, ASOF semantics). Clicks are deduped to one
    * per (user, timestamp) — max event_id — so ties are well-defined
    * in both engines. */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("us"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("us"), col("click_id"),
        lit(null).cast("long").as("purchase_id"), lit(0).as("tag"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), lit(null).cast("long").as("click_id"),
        col("event_id").as("purchase_id"), lit(1).as("tag"))
    // tag 0 < 1 ⇒ a click at exactly the purchase timestamp is visible
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(purchases)
      .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_us",
        last(when(col("tag") === 0, col("us")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("last_click_id").isNotNull)
      .select(col("purchase_id"), col("user_id"), col("last_click_id"),
        (col("us") - col("last_click_us")).cast("long").as("gap_us"))
      .orderBy("purchase_id")
  }
}

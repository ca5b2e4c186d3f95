package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftInternal
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.types.BinaryType
import graft.Tables

/** Bloom-filter pre-filtered join — the pattern behind Spark's own
  * runtime row-group filtering (InjectRuntimeFilter), exposed as an
  * operator: sketch the build side's key set into a bloom filter,
  * drop probe rows that cannot match BEFORE the join shuffle, then
  * run the exact join on the survivors. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling
  * only the ~matching slice; false positives cost nothing but a
  * wasted shuffle row (the exact join removes them).
  */
object BloomJoin {

  /** Aggregate a column's values into a bloom-filter sketch (binary).
    * Same expression Spark's runtime filters use (XxHash64 → bloom). */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    GraftInternal.column(new BloomFilterAggregate(
      new XxHash64(Seq(GraftInternal.expression(c))),
      expectedItems).toAggregateExpression())

  /** Probe-side membership test against a materialized sketch. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftInternal.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftInternal.expression(c)))))

  /** Build side: the high-value order keys the bloom sketches. */
  private def buildSide(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"))

  /** The bloom pre-filter alone (no exact join) — also used by the
    * spec to measure selectivity and prove zero false negatives. The
    * sketch is a bounded artifact (like Spark's own runtime-filter
    * broadcast): collecting it to the driver is the build-side
    * exchange, not a data collect. */
  def preFiltered(spark: SparkSession, dir: String): DataFrame = {
    val bloom = buildSide(spark, dir)
      .agg(bloomAgg(col("o_orderkey"), 1000000L).as("bf"))
      .head().getAs[Array[Byte]](0)
    Tables.lineitem(spark, dir).filter(mightContain(bloom, col("l_orderkey")))
  }

  /** Lineitem rows whose order is high-value, via bloom pre-filter +
    * exact semi join; aggregated per return flag. */
  def qBloomJoin(spark: SparkSession, dir: String): DataFrame =
    preFiltered(spark, dir)
      .join(buildSide(spark, dir),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum((col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("sum_qty"))
      .orderBy("l_returnflag")
}

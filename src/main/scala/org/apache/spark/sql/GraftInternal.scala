package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column↔Expression conversions so
  * graft can expose native Catalyst expressions as Columns — the same
  * pattern Spark extension libraries use. Nothing else from the
  * private API is touched.
  */
object GraftInternal {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a custom LogicalPlan (Dataset.ofRows is
    * private[sql]). */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Register a native expression as a temp SQL function on an
    * existing session (the extensions path only applies to sessions
    * built with .withExtensions). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Spill-capable sort of a task's rows through Spark's
    * ExternalSorter (the machinery behind sortByKey): rows are
    * buffered in execution memory and spilled to disk under pressure,
    * so the caller never pins an unbounded partition on the heap.
    * Rows must already be defensive copies. The sorter's buffers are
    * released on task completion. */
  def externalSortRows(
      iter: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      ord: Ordering[org.apache.spark.sql.catalyst.InternalRow])
      : Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val context = org.apache.spark.TaskContext.get()
    val sorter = new org.apache.spark.util.collection.ExternalSorter[
      org.apache.spark.sql.catalyst.InternalRow, Null, Null](
      context, None, None, Some(ord))
    sorter.insertAll(iter.map(r => (r, null)))
    context.addTaskCompletionListener[Unit](_ => sorter.stop())
    sorter.iterator.map(_._1)
  }
}

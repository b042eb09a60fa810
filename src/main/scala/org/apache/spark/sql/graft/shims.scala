package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 moved classic Columns behind ColumnNode). The standard pattern
  * for libraries shipping custom Catalyst expressions. */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom [[LogicalPlan]] (e.g. [[graft.plans.GroupRunningAgg]])
    * back into the Dataset API — the standard library pattern for custom
    * operators built from pre-resolved plans. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Block until the listener bus has delivered every queued event (or
    * the timeout passes) — task-metric accounting ([[graft.BenchCpu]])
    * reads listener state right after an action returns, and the bus
    * posts asynchronously. */
  def waitListenerBus(spark: SparkSession, timeoutMs: Long): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Throwable => () }

  /** The query's output as an RDD of (buffer-reused) InternalRows —
    * bounded sampling passes ([[graft.ops.Ranks.sampleBoundaries]]) use
    * this to skip the external Row conversion; callers must copy any
    * retained values. */
  def toInternalRdd(df: DataFrame): org.apache.spark.rdd.RDD[
    org.apache.spark.sql.catalyst.InternalRow] =
    df.queryExecution.toRdd
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ⇄ Column bridge. Spark 4 made these converters
  * `private[sql]`; graft's native expressions ([[graft.functions
  * .NativeExpressions]]) need exactly the two calls below, so this
  * lives inside the org.apache.spark.sql namespace on purpose. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly CONVERT a Column into a catalyst expression (the lazy
    * `expression` wrapper keeps a non-serializable ColumnNode inside;
    * fine inside standard nodes, fatal when embedded in a custom
    * operator that ships to executors). */
  def convertedExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)

  /** DataFrame from a raw logical plan (for graft's custom operators). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** The materialized RDD behind a (locally) checkpointed Dataset —
    * `Dataset.unpersist` cannot release checkpoint storage, so callers
    * that checkpoint per-iteration ([[graft.ops.ConnectedComponents]])
    * unpersist this RDD directly. Tracking the exact RDD (instead of
    * diffing the SparkContext-global persistent-RDD registry) keeps
    * concurrent jobs from releasing each other's blocks. */
  def checkpointedRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Some(lr.rdd)
      case _ => None
    }

  /** Register a function on a LIVE session (sessionState is
    * private[sql]; the extensions path only applies at construction). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)

  /** Drain the listener bus (private[spark]) — [[graft.BenchOne]] waits
    * for task-metric events to settle between timed passes so its
    * per-pass listener counters cannot bleed across passes. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the Column constructor private
  * (Columns wrap connect-compatible nodes); the supported conversion lives in
  * `classic.ExpressionUtils`, which is `private[sql]` — so this one-file
  * bridge sits in an org.apache.spark.sql subpackage to reach it. No Spark
  * internals are copied or modified.
  */
object CatalystBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the supported internal
    * constructor (classic.Dataset.ofRows) is private[sql]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def planOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Unload every loaded state-store provider in this JVM (`StateStore
    * .unloadAll` is `private[sql]`). Local-mode replay harnesses call this
    * after stopping a query: a stopped query's providers otherwise stay
    * registered — in-memory version maps included — until the 60 s
    * maintenance tick notices the query is inactive, and back-to-back
    * harness runs in one JVM accumulate them. An ACTIVE query that loses a
    * provider merely reloads it from its checkpoint on the next batch, so
    * the call is always safe, just not free. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Register a builder as a SQL-callable function on a live session (the
    * runtime counterpart of SparkSessionExtensions.injectFunction, for
    * sessions that already exist). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}

package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and LogicalPlan → DataFrame bridges.
  * `ExpressionUtils` and `Dataset.ofRows` are `private[sql]`, so these
  * accessors live inside the `org.apache.spark.sql` package — the
  * standard pattern for Spark-native extension libraries that construct
  * custom Catalyst expressions and logical operators from the public API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved or resolvable) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Spark's own ANSI divide-by-zero error (`QueryExecutionErrors` is
    * `private[sql]`) — for native expressions replicating the ANSI `/`
    * a composed chain they replace would have evaluated.
    */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(
      org.apache.spark.sql.catalyst.trees.Origin().context)
}

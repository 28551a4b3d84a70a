package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression converters
  * (Spark 4 moved Column to a node-based API; the classic converters are the
  * supported internal path — org.apache.spark.sql.classic.ExpressionUtils).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** FULL Column→Expression lowering (functions-API DSL nodes included).
    * `expression` above only wraps the node; a wrapped tree inside a
    * function-registry builder survives to execution and fails as
    * Unevaluable — this converter recursively rewrites every ColumnNode
    * into real (possibly unresolved) Catalyst expressions the analyzer can
    * then resolve.
    */
  def toExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** DataFrame from a LogicalPlan (private[sql] Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame): catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column⇄Expression converters so the
  * engine's native Catalyst expressions (graft.functions) can surface as
  * public `Column`s. Lives under org.apache.spark.sql to satisfy the
  * qualified-private access — the ONLY package-private Spark API this
  * project touches.
  */
object ExprBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; alias it here so
    * graft expressions can declare `inputTypes` (ImplicitCastInputTypes)
    * for analysis-time coercion of e.g. array<double> → array<float>.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — used to surface graft.plans.AsOfJoinPlan.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

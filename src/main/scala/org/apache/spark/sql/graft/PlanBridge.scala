package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The one private[sql] doorway the library needs: turning a custom
  * LogicalPlan node into a DataFrame. Spark exposes no public constructor
  * for this, so — like every plan-extending Spark library — this object
  * lives under `org.apache.spark.sql` solely to reach `Dataset.ofRows`.
  * Nothing else in the library uses package-private Spark API.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ Expression for expressions whose arguments cannot travel
    * through the SQL function registry (e.g. a literal matrix parameter).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}

package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface of Spark 4's classic API:
  * Expression <-> Column conversion (`org.apache.spark.sql.classic.
  * ExpressionUtils`, spark-sql jar). This is the standard extension-library
  * technique — one object in the sql package tree, nothing else.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (resolved) LogicalPlan — `Dataset.ofRows` is
    * `private[sql]`; needed to hand a custom logical node (AsOfJoinPlan)
    * to the planner. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

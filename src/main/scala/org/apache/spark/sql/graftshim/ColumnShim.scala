package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made `Column` a ColumnNode wrapper (Spark Connect split) and the
  * Expression<->Column converters `private[sql]`; extensions that define
  * native codegen Expressions (graft.functions.VecDot etc.) conventionally
  * access them via a same-package shim like this one.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — Dataset.ofRows is
    * private[sql]; custom operators (graft.plans.AsOfJoinPlan) need it to
    * hand their plan to the session's planner. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

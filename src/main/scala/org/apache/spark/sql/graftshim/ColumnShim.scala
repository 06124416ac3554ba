package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
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
}

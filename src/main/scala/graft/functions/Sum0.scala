package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Coalesce, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** SUM0: sum that returns 0 (not NULL) on empty/all-null input — the
  * reference ships it as a distinct agg function (Sum0AggFunction in the
  * planner's aggfunctions/, used by COUNT-rewrites and retract paths).
  *
  * Implemented as a `DeclarativeAggregate`: the aggregate is pure
  * expressions (init/update/merge/evaluate), so it participates in
  * whole-stage codegen and partial aggregation like a built-in — the
  * third custom-function tier next to codegen scalar Expressions
  * (VecDot) and typed Aggregators (SingleValueAgg). */
case class Sum0(child: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sum0 expects numeric, got $t")
  }

  private lazy val sum = AttributeReference("sum", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = sum :: Nil
  override lazy val initialValues: Seq[Expression] = Literal(0.0) :: Nil
  override lazy val updateExpressions: Seq[Expression] =
    (sum + Coalesce(Seq(child.cast(DoubleType), Literal(0.0)))) :: Nil
  override lazy val mergeExpressions: Seq[Expression] = (sum.left + sum.right) :: Nil
  override lazy val evaluateExpression: Expression = sum

  override def prettyName: String = "sum0"
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Sum0 =
    copy(child = c.head)
}

object Sum0 {
  def sum0(c: Column): Column =
    ColumnShim.column(Sum0(ColumnShim.expression(c)).toAggregateExpression())
}

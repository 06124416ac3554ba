package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference scalar functions with no direct Spark built-in (SURVEY.md §2.8
  * tail): SPLIT_INDEX and TEMPORAL_OVERLAPS.
  *
  * Both are native codegen expressions — a static helper call / inline
  * comparisons — so projections using them stay inside one
  * WholeStageCodegen span (same pattern as [[StringClassify]]).
  *
  * Semantics pinned to the reference:
  *  - SPLIT_INDEX(str, sep, idx): 0-based index, whole-separator split
  *    PRESERVING empty tokens, NULL (not error) when idx < 0 or beyond the
  *    last token (ref flink-table-runtime-blink/.../functions/
  *    SqlFunctionUtils.java:316 splitIndex).
  *  - TEMPORAL_OVERLAPS(s1, e1, s2, e2): each period is normalized so
  *    start <= end, then overlap = (e0 >= s1) AND (e1 >= s0) — endpoints
  *    INCLUSIVE (ref flink-table-planner-blink/.../converter/
  *    CustomizedConvertRule.java:169 convertTemporalOverlaps, the standard
  *    Calcite OVERLAPS expansion).
  */
object FlinkScalarsUtil {
  /** Whole-separator split preserving empty tokens; null-on-out-of-range
    * handled by the caller via index check against the token count. */
  def splitIndex(str: UTF8String, sep: UTF8String, idx: Int): UTF8String = {
    if (idx < 0) return null
    val s = str.toString
    val d = sep.toString
    if (d.isEmpty) return if (idx == 0) str else null
    // count tokens while walking; return the idx-th without materializing all
    var tokStart = 0
    var tok = 0
    var at = s.indexOf(d, tokStart)
    while (at >= 0) {
      if (tok == idx) return UTF8String.fromString(s.substring(tokStart, at))
      tok += 1
      tokStart = at + d.length
      at = s.indexOf(d, tokStart)
    }
    if (tok == idx) UTF8String.fromString(s.substring(tokStart)) else null
  }
}

case class SplitIndexExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == StringType &&
        third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("split_index expects (string, string, int)")
  override def nullSafeEval(str: Any, sep: Any, idx: Any): Any =
    FlinkScalarsUtil.splitIndex(str.asInstanceOf[UTF8String],
      sep.asInstanceOf[UTF8String], idx.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, d, i) => {
      s"""
         |${ev.value} = graft.functions.FlinkScalarsUtil.splitIndex($s, $d, $i);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  override def prettyName: String = "split_index"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SplitIndexExpr =
    copy(first = f, second = s, third = t)
}

case class TemporalOverlapsExpr(
    first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  // TIMESTAMP and TIMESTAMP_NTZ are both epoch-micros longs internally; the
  // comparison is zone-free, so either works — but mixing the two in one
  // call would compare micros with different zone anchors, so all four must
  // agree (the testdata's events/orders drift between the two encodings).
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(c => c.dataType == TimestampType || c.dataType == TimestampNTZType)
        && children.map(_.dataType).distinct.size == 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "temporal_overlaps expects 4 timestamps of the same type")
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any = {
    val (t1, u1, t2, u2) =
      (a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long], d.asInstanceOf[Long])
    val s0 = math.min(t1, u1); val e0 = math.max(t1, u1)
    val s1 = math.min(t2, u2); val e1 = math.max(t2, u2)
    e0 >= s1 && e1 >= s0
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"""
         |${ev.value} = Math.max($a, $b) >= Math.min($c, $d)
         |  && Math.max($c, $d) >= Math.min($a, $b);
       """.stripMargin)
  override def prettyName: String = "temporal_overlaps"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): TemporalOverlapsExpr =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object FlinkScalars {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, clazz: Class[_], f: Seq[Expression] => Expression): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), f)
    add("split_index", classOf[SplitIndexExpr],
      es => SplitIndexExpr(es(0), es(1), es(2)))
    add("temporal_overlaps", classOf[TemporalOverlapsExpr],
      es => TemporalOverlapsExpr(es(0), es(1), es(2), es(3)))
  }
}

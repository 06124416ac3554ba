package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `bloom_contains(pos)` — probe an executor-resident Bloom bitmap: true iff
  * EVERY position in the input array hits a set bit.
  *
  * This is the size-guarded twin of the plan-literal probe in
  * `graft.operators.Dedup.bloomVerdict`: a fixture-scale bitmap (4096 words)
  * rides the plan as a `typedLit` array and stays inside the built-in
  * `forall` codegen, but the docstring's own production sizing (~2^33 bits =
  * 1 GiB for a trillion-doc lake) would put a 134M-element Literal into the
  * plan — blowing up plan serialization and codegen constant pools long
  * before the data does. Above `Dedup.BloomLiteralMaxWords` the bitmap ships
  * once per executor as a `SparkContext.broadcast` and this expression reads
  * it through a reference object: same zero-shuffle, fully codegen'd probe
  * (a primitive loop over the `ArrayData` of positions — same discipline as
  * [[VecDot]]), with the bitmap cost moved off the plan.
  *
  * Reference anchor: the reference distributes exactly such shared
  * lookup structures as broadcast state to its operators
  * (flink-runtime BroadcastVariableMaterialization); Spark's equivalent for
  * executor-shared read-only data is the TorrentBroadcast consumed here.
  */
case class BloomContains(child: Expression, bitmap: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects array<bigint> probe positions, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val pos = input.asInstanceOf[ArrayData]
    val bm = bitmap.value
    var i = 0
    var all = true
    val n = pos.numElements()
    while (all && i < n) {
      val p = pos.getLong(i)
      if ((bm((p >>> 6).toInt) & (1L << (p & 63L).toInt)) == 0L) all = false
      i += 1
    }
    all
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bitmap,
      classOf[Broadcast[_]].getName)
    // unpack the broadcast once per codegen instance, not once per row
    val bmVar = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, pos => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val all = ctx.freshName("all")
      s"""
         |boolean $all = true;
         |int $n = $pos.numElements();
         |for (int $i = 0; $all && $i < $n; $i++) {
         |  long $p = $pos.getLong($i);
         |  if (($bmVar[(int) ($p >>> 6)] & (1L << (int) ($p & 63L))) == 0L) {
         |    $all = false;
         |  }
         |}
         |${ev.value} = $all;
       """.stripMargin
    })
  }

  override def prettyName: String = "bloom_contains"
  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** SQL-pattern recognition for the event-time AS-OF join (SURVEY.md §2.11;
  * ref flink-table-planner-blink
  * LogicalCorrelateToJoinFromTemporalTableRule.scala — the reference
  * likewise rewrites a declarative "latest version at-or-before" shape
  * onto its temporal-join operator).
  *
  * Recognized shape (what users write in plain SQL, since Spark has no
  * `FOR SYSTEM_TIME AS OF`):
  *
  * {{{
  * SELECT ... FROM (
  *   SELECT p.*, b.*, row_number() OVER (
  *     PARTITION BY <probe row id> ORDER BY b.vt DESC) AS rn
  *   FROM probe p JOIN build b ON p.k = b.k AND b.vt <= p.pt
  * ) WHERE rn = 1
  * }}}
  *
  * i.e. `Filter(rn = 1, Window(row_number, probe cols, build-time DESC,
  * Join(probe, build, Inner, p.k = b.k AND b.vt <= p.pt)))` — rewritten to
  * `Project(Filter(IsNotNull(buildKey), AsOfJoinPlan(...)))`, which
  * AsOfStrategy plans as the single-pass merge (or broadcast) exec instead
  * of materializing every historical version per probe row and ranking it.
  *
  * Contract (same assumption as the reference's temporal-table rewrite):
  * the PARTITION BY columns must identify probe rows uniquely (a row id /
  * primary key). The rule only fires on the exact shape above — single
  * row_number, single DESC build-time order key, probe-side-only partition
  * keys, one equi-key + one `build.time <= probe.time` conjunct, all
  * long-backed (BIGINT/TIMESTAMP) — and leaves anything else untouched
  * (plain single-table dedup/Top-N stays on Spark's native
  * WindowGroupLimit path). Install via
  * `spark.experimental.extraOptimizations` or `GraftExtensions`.
  */
object AsOfPatternRule extends Rule[LogicalPlan] {

  private def longBacked(e: Expression): Boolean = e.dataType match {
    case LongType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** rn = 1 / 1 = rn on the given window-expression attribute. */
  private def isRnEqOne(cond: Expression, rn: ExprId): Boolean = cond match {
    case EqualTo(a: AttributeReference, Literal(1, _)) => a.exprId == rn
    case EqualTo(Literal(1, _), a: AttributeReference) => a.exprId == rn
    case _ => false
  }

  /** See through the native WindowGroupLimit the optimizer has already
    * inserted and through one (possibly aliasing) column-pruning Project,
    * down to the join. The Project is returned so the rewrite can replay
    * its aliases above the as-of node. */
  private def stripToJoin(p: LogicalPlan): Option[(Join, Option[Project])] = p match {
    case j: Join => Some((j, None))
    case pr @ Project(_, child) =>
      stripToJoin(child).flatMap {
        case (j, None) if pr.references.subsetOf(j.outputSet) => Some((j, Some(pr)))
        case _ => None // stacked projects: bail rather than mis-compose
      }
    case w: WindowGroupLimit => stripToJoin(w.child)
    case _ => None
  }

  /** jc must be exactly `lk = rk AND rt <= lt` (any conjunct/operand
    * order) with rt the window's DESC order key. */
  private def matchJoinCond(jc: Expression, l: LogicalPlan, r: LogicalPlan,
                            rt: Attribute): Option[(Attribute, Attribute, Attribute)] = {
    val conjuncts = jc match {
      case And(a, b) => Seq(a, b)
      case _ => return None
    }
    var key: Option[(Attribute, Attribute)] = None
    var time: Option[Attribute] = None
    conjuncts.foreach {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (l.outputSet.contains(a) && r.outputSet.contains(b)) key = Some((a, b))
        else if (l.outputSet.contains(b) && r.outputSet.contains(a)) key = Some((b, a))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if a.exprId == rt.exprId && l.outputSet.contains(b) => time = Some(b)
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if b.exprId == rt.exprId && l.outputSet.contains(a) => time = Some(a)
      case _ => ()
    }
    for ((lk, rk) <- key; lt <- time) yield (lk, rk, lt)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          partSpec, Seq(SortOrder(rtx: AttributeReference, Descending, _, _)), wchild, _))
        if isRnEqOne(cond, alias.exprId) =>
      (for {
        (j, interProj) <- stripToJoin(wchild)
        if j.joinType == Inner && j.condition.isDefined
        l = j.left; r = j.right
        if r.outputSet.contains(rtx)
        if partSpec.nonEmpty && partSpec.forall {
          case a: AttributeReference => l.outputSet.contains(a)
          case _ => false
        }
        (lk, rk, lt) <- matchJoinCond(j.condition.get, l, r, rtx)
        if Seq(lk, rk, lt, rtx).forall(longBacked)
      } yield {
        val asof = AsOfJoinPlan(l, r, lk, rk, lt, rtx)
        // inner-join semantics of the original shape: probe rows with no
        // at-or-before version were absent from the join, so drop the
        // null-padded rows the LEFT OUTER as-of emits for them
        val rkOut = asof.output.find(_.exprId == rk.exprId).get
        val filtered = Filter(IsNotNull(rkOut), asof)
        // replay the pruning/aliasing Project the optimizer had pushed
        // between window and join, then restore the Window node's output
        // attribute ids (rn collapses to literal 1)
        val mid: LogicalPlan = interProj
          .map(pr => Project(pr.projectList, filtered): LogicalPlan)
          .getOrElse(filtered)
        val midOut = mid.output.map(a => a.exprId -> a).toMap
        val projList: Seq[NamedExpression] = w.output.map { a =>
          if (a.exprId == alias.exprId)
            Alias(Literal(1), alias.name)(exprId = alias.exprId)
          else midOut.getOrElse(a.exprId, a)
        }
        Project(projList, mid): LogicalPlan
      }).getOrElse(f)
  }
}

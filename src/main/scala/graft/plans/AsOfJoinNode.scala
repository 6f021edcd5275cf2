package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Logical AS-OF join: for each left row, the right row with the greatest
  * `rightTime <= leftTime` (or, `forward`, the smallest
  * `rightTime >= leftTime`) sharing the equi-key. The whole-operator
  * Catalyst extension path — Spark has no native as-of join (the
  * reference point for these semantics is DuckDB/kdb `ASOF JOIN`;
  * compositional forms live in `ops/JoinOps`). [[AsOfJoinStrategy]] plans
  * this node into [[AsOfJoinExec]]; both register through
  * `GraftExtensions`.
  *
  * `matchedOut` carries the operator's produced attributes (the matched
  * right timestamp + value columns, all nullable — left rows without a
  * match emit nulls). They are constructor state, not recomputed per
  * copy, so expression IDs stay stable across optimizer transforms.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTime: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    matchedOut: Seq[Attribute],
    forward: Boolean)
    extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ matchedOut

  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown through [[AsOfJoinNode]]. Catalyst cannot push a
  * Filter through a node it does not know, so an unknown operator
  * silently fences off one of the optimizer's most valuable rewrites —
  * the rule restores it. An as-of join decides each left row
  * independently, so any conjunct referencing only left-side columns
  * commutes with the join and moves below it (and from there Catalyst's
  * own rules carry it down to the scan). Conjuncts touching matched
  * columns stay above. Runs inside the operator-optimization fixed-point
  * batch; terminates because each application strictly shrinks the
  * predicate above the node.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoinNode) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

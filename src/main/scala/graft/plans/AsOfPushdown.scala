package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, Expression, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule restoring predicate pushdown THROUGH the custom
  * as-of operator ([[AsOfJoinPlan]]) — the §4 `Rule[LogicalPlan]`
  * extension route.
  *
  * A custom LogicalPlan is opaque to Catalyst's PushDownPredicate: a
  * `AsOf.join(...).filter(...)` keeps the filter ABOVE the join, so
  * both full tables shuffle and sort before any row is dropped — at
  * 100 TB that is the difference between scanning a key range and
  * scanning everything. The as-of semantics license three safe moves
  * for a deterministic conjunct:
  *
  *  1. references ⊆ left output → push to the LEFT child (output rows
  *     are 1:1 with left rows; left columns pass through unchanged);
  *  2. references = {leftKey} → ALSO mirror to the right child with
  *     the key attribute rewritten (a left row with key k only ever
  *     matches right rows with key k);
  *  3. an upper TIME bound `leftTime <[=] lit` → also bounds the right
  *     child (`rightTime <= lit`): matches satisfy
  *     rightTime ≤ leftTime, so right rows past the bound can never
  *     match a surviving left row. (Upper bounds only — a LOWER left
  *     bound must keep older right rows as as-of candidates.)
  *
  * Conjuncts referencing right-side (nullable) outputs stay above the
  * join. The rule runs in the user-provided optimizer batch; pushed
  * filters land directly on the children's Project/Filter stacks,
  * which FileSourceStrategy's PhysicalOperation collapses into
  * parquet PushedFilters at planning time.
  */
object AsOfFilterPushdown extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def onlyRefIs(c: Expression, a: Attribute): Boolean =
    c.references.size == 1 && c.references.head.exprId == a.exprId

  private def remap(c: Expression, from: Attribute, to: Attribute): Expression =
    c.transform { case at: Attribute if at.exprId == from.exprId => to }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case Filter(cond, j: AsOfJoinPlan) =>
      val cs = conjuncts(cond)
      val leftSet = j.left.outputSet
      val (leftLocal, rest) =
        cs.partition(c => c.deterministic && c.references.subsetOf(leftSet))
      val rightMirror: Seq[Expression] = (j.leftKey, j.rightKey, j.leftTime, j.rightTime) match {
        case (lk: Attribute, rk: Attribute, lt: Attribute, rt: Attribute) =>
          leftLocal.flatMap {
            case c if onlyRefIs(c, lk) => Some(remap(c, lk, rk))
            case LessThan(a: Attribute, lit) if a.exprId == lt.exprId &&
              lit.references.isEmpty => Some(LessThanOrEqual(rt, lit))
            case LessThanOrEqual(a: Attribute, lit) if a.exprId == lt.exprId &&
              lit.references.isEmpty => Some(LessThanOrEqual(rt, lit))
            case _ => None
          }
        case _ => Nil
      }
      val newLeft =
        if (leftLocal.nonEmpty) Filter(leftLocal.reduce(And), j.left) else j.left
      val newRight =
        if (rightMirror.nonEmpty) Filter(rightMirror.reduce(And), j.right) else j.right
      if (leftLocal.isEmpty) Filter(cond, j) // nothing movable: unchanged
      else {
        val pushed = j.copy(left = newLeft, right = newRight)
        if (rest.nonEmpty) Filter(rest.reduce(And), pushed) else pushed
      }
  }
}

/** Column pruning through [[AsOfJoinPlan]] — the other half of what a
  * custom node hides from Catalyst: a narrow `select` above the as-of
  * join otherwise shuffles and sorts EVERY column of both tables. The
  * children are projected to the attributes the projection references
  * plus the operator's own key/time/tiebreak attributes (the exec
  * resolves them by exprId, so output order is free to change). */
object AsOfColumnPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case p @ Project(projList, j: AsOfJoinPlan) =>
      val required = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet((Seq(j.leftKey, j.leftTime, j.rightKey, j.rightTime) ++
          j.rightTiebreak).flatMap(_.references))
      val neededL = j.left.output.filter(required.contains)
      val neededR = j.right.output.filter(required.contains)
      if (neededL.size == j.left.output.size && neededR.size == j.right.output.size) p
      else Project(projList, j.copy(
        left = if (neededL.size == j.left.output.size) j.left
          else Project(neededL, j.left),
        right = if (neededR.size == j.right.output.size) j.right
          else Project(neededR, j.right)))
  }
}

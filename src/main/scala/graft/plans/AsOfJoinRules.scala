package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rules for [[AsOfJoinNode]] — the `Rule[LogicalPlan]` leg of
  * the custom-planner trio (expression / strategy / rule). Catalyst's
  * built-in pushdown and pruning stop at plan nodes they don't know, so
  * without these rules a filter or projection written ABOVE the as-of
  * node would force full scans and full-width shuffles of both sides —
  * at the 100 TB design point that is the entire cost of the query.
  *
  * [[AsOfJoinPushdown]] restores filter pushdown; [[AsOfJoinPruning]]
  * restores column pruning. Both are registered by `GraftExtensions`
  * (`spark.sql.extensions` config path, operator-optimization batch) and
  * by `GraftExtensions.registerAll` (live session, via
  * `spark.experimental.extraOptimizations` — a later batch, but scans
  * still collapse adjacent Project/Filter at physical planning, so
  * pushed predicates reach `PushedFilters` either way).
  */

/** Pushes deterministic predicates that reference only left-side columns
  * through the as-of join into the left child. Safe because each left row
  * is joined independently — dropping a left row never changes the
  * payload any other left row receives, and the right side is untouched.
  * (Right-only or mixed predicates reference `asof_*` output attributes
  * minted by the node, so they are inherently join-dependent and stay.)
  *
  * Bonus inference, mirroring `InferFiltersFromConstraints` for a node
  * Catalyst can't reason about: a literal equality / IN-list on the left
  * KEY is copied to the right key too — right rows of other keys can only
  * ever match left rows the pushed filter just removed, so they can be
  * pruned before the right-side shuffle.
  */
object AsOfJoinPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val mirrored: Seq[Expression] = push.flatMap {
          case EqualTo(a: Attribute, l: Literal) if a.semanticEquals(j.leftKey) =>
            Some(EqualTo(j.rightKey, l))
          case EqualTo(l: Literal, a: Attribute) if a.semanticEquals(j.leftKey) =>
            Some(EqualTo(j.rightKey, l))
          case In(a: Attribute, list)
              if a.semanticEquals(j.leftKey) && list.forall(_.isInstanceOf[Literal]) =>
            Some(In(j.rightKey, list))
          case _ => None
        }
        val newLeft = Filter(push.reduce(And), j.left)
        val newRight = mirrored.reduceOption(And)
          .map(Filter(_, j.right)).getOrElse(j.right)
        val pushed = j.copy(left = newLeft, right = newRight)
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning around the as-of join.
  *
  *   - Right side: the node only ever reads (key, ts, payload) from the
  *     right child; any other right column is dead weight in the right
  *     shuffle. Prune it unconditionally.
  *   - Left side: the node's output carries `left.output` wholesale, so a
  *     `select` above it can make left columns dead. When an enclosing
  *     Project uses only a subset, narrow the left child to that subset
  *     (plus the join key/ts the merge itself evaluates) so the scan's
  *     ReadSchema shrinks.
  *
  * Both arms are guarded to fire only when they remove at least one
  * column, so the rule is idempotent under fixed-point batches.
  */
/** WHOLE-JOIN elimination — the custom-node analogue of what Catalyst
  * does to the composed union+window as-of on its own: under `count()`
  * (or any consumer ignoring the `asof_*` columns) the built-in pruning
  * folds the window form's `filter(_is_left = 1)` back to just the left
  * branch and drops the Window outright, so the query never joins at
  * all. The as-of node emits EXACTLY one output row per left row (no
  * multiplication, no filtering — pinned in AsofNativeSpec), so when an
  * enclosing Project or Aggregate consumes none of the minted payload
  * attributes the node is, cardinality- and column-wise, its left
  * child. Without this rule the opaque node pays both shuffles and the
  * merge for a result the plan then throws away — the kind of asymmetry
  * that made the j05-vs-j08 bench comparison meaningless (the union
  * form's `.count()` measured a pruned scan, the native form the full
  * join). */
object AsOfJoinElimination extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinNode)
        if AttributeSet(projList.flatMap(_.references))
          .intersect(AttributeSet(j.payloadOut)).isEmpty =>
      p.copy(child = j.left)
    case a: Aggregate if a.child.isInstanceOf[AsOfJoinNode] &&
        a.references.intersect(
          AttributeSet(a.child.asInstanceOf[AsOfJoinNode].payloadOut)).isEmpty =>
      a.withNewChildren(Seq(a.child.asInstanceOf[AsOfJoinNode].left))
  }
}

object AsOfJoinPruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, j: AsOfJoinNode)
        if {
          val used = AttributeSet(projList.flatMap(_.references)) ++
            AttributeSet(Seq(j.leftKey, j.leftTs))
          (j.left.outputSet -- used).nonEmpty
        } =>
      val used = AttributeSet(projList.flatMap(_.references)) ++
        AttributeSet(Seq(j.leftKey, j.leftTs))
      val narrowed = j.left.output.filter(used.contains)
      p.copy(child = j.copy(left = Project(narrowed, j.left)))

    case j: AsOfJoinNode
        if {
          val needed = AttributeSet(Seq(j.rightKey, j.rightTs) ++ j.payload)
          (j.right.outputSet -- needed).nonEmpty
        } =>
      val needed = AttributeSet(Seq(j.rightKey, j.rightTs) ++ j.payload)
      j.copy(right = Project(j.right.output.filter(needed.contains), j.right))
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.functions.TopKByScore

/** Rewrites the rank-window top-k idiom into the single-pass heap
  * aggregate, when (and only when) that is provably the same relation:
  *
  * {{{
  *   Filter(rank <= k,
  *     Window([row_number() OVER (PARTITION BY p ORDER BY s DESC, id ASC)
  *             AS rank], child))
  * }}}
  *
  * becomes `Aggregate(p, topk_by_score(s, id, k))` + posexplode + a
  * projection that restores the original output attributes (same
  * exprIds, so everything above the Filter is untouched). The window
  * form shuffles and sorts EVERY row of every group; the aggregate form
  * combines k-element heaps map-side and ships k rows per group — the
  * optimizer applying the s07-vs-s01 transformation mechanically.
  *
  * Safety guards (all required, otherwise the plan is left alone):
  *   - single row_number window expression; partition key is a bare
  *     attribute; order is exactly (s: double DESC, id: bigint ASC);
  *   - s and id are NON-NULLABLE — the heap skips null scores while
  *     row_number ranks them (nulls-last), so nullable inputs are not
  *     provably equivalent and never rewritten;
  *   - the window child's output is exactly {p, s, id}: the heap carries
  *     no further payload, so extra columns would be lost;
  *   - the filter is a bare `rank <= lit` / `rank < lit` with k ≥ 1.
  *
  * Duplicate rows are preserved: the heap admits equal (s, id) entries
  * up to capacity and, at capacity, rejects an entry equal to the
  * current worst — exactly one of the duplicates survives, matching
  * row_number's arbitrary-but-single rank-k assignment. Injected by
  * `GraftExtensions` alongside the as-of rules. */
object TopKRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(rankAlias @ Alias(WindowExpression(RowNumber(), _), _)),
          Seq(p: AttributeReference),
          Seq(SortOrder(s: AttributeReference, Descending, _, _),
              SortOrder(id: AttributeReference, Ascending, _, _)),
          child, _)) =>
      limitOf(cond, rankAlias.exprId) match {
        case Some(k) if eligible(p, s, id, child) =>
          rewrite(f, rankAlias, p, s, id, child, k)
        case _ => f
      }
  }

  private def limitOf(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(r: AttributeReference, Literal(k: Int, IntegerType))
      if r.exprId == rankId && k >= 1 => Some(k)
    case LessThan(r: AttributeReference, Literal(k: Int, IntegerType))
      if r.exprId == rankId && k >= 2 => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), r: AttributeReference)
      if r.exprId == rankId && k >= 1 => Some(k)
    case _ => None
  }

  private def eligible(p: AttributeReference, s: AttributeReference,
                       id: AttributeReference, child: LogicalPlan): Boolean =
    s.dataType == DoubleType && !s.nullable &&
      id.dataType == LongType && !id.nullable &&
      Seq(p, s, id).map(_.exprId).distinct.size == 3 &&
      child.output.map(_.exprId).toSet == Set(p, s, id).map(_.exprId)

  private def rewrite(f: Filter, rankAlias: Alias, p: AttributeReference,
                      s: AttributeReference, id: AttributeReference,
                      child: LogicalPlan, k: Int): LogicalPlan = {
    val topkAlias = Alias(TopKByScore(s, id, k).toAggregateExpression(), "_graft_topk")()
    val agg = Aggregate(Seq(p), Seq(p, topkAlias), child)
    val elemType = topkAlias.dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType
    val posAttr = AttributeReference("_graft_pos", IntegerType, nullable = false)()
    val elemAttr = AttributeReference("_graft_elem", elemType, nullable = false)()
    val gen = Generate(PosExplode(topkAlias.toAttribute),
      unrequiredChildIndex = Seq(1), outer = false, qualifier = None,
      generatorOutput = Seq(posAttr, elemAttr), agg)
    // restore the ORIGINAL output attributes (names AND exprIds) in the
    // original order, so consumers above the rewritten Filter re-resolve
    val restored: Map[ExprId, NamedExpression] = Map(
      p.exprId -> p,
      s.exprId -> Alias(GetStructField(elemAttr, 0, Some("score")), s.name)(exprId = s.exprId),
      id.exprId -> Alias(GetStructField(elemAttr, 1, Some("id")), id.name)(exprId = id.exprId),
      rankAlias.exprId ->
        Alias(Add(posAttr, Literal(1)), rankAlias.name)(exprId = rankAlias.exprId))
    Project(f.output.map(a => restored(a.exprId)), gen)
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator custom-planner path (preference (c) of the
  * custom-operator ladder): as-of join as a first-class plan node —
  * logical [[AsOfJoinNode]], planned by [[AsOfJoinStrategy]] into
  * [[AsOfJoinExec]], registered through `SparkSessionExtensions`
  * (config path) or `spark.experimental.extraStrategies` (live
  * session). Semantics are identical to the composed union+window form
  * in `graft.operators.AsofJoin.asof` (each left row gains the payload
  * of the latest right row with `right.ts <= left.ts` on the same key;
  * ties on (key, ts) resolve to the greatest payload tuple), and the
  * equivalence is both ScalaTest-pinned and DuckDB-oracle-checked
  * (`j08_asof_native` shares j05's native ASOF JOIN oracle).
  *
  * Why a physical operator when the window form already scales: the
  * union form shuffles BOTH sides into one sort and carries every left
  * row through window-state; this node keeps the sides separate (each
  * shuffled only on its own key and sorted within partitions), then
  * streams a per-partition two-pointer merge — no window buffer, no
  * per-row null-payload columns on the left, and the right side can be
  * orders of magnitude smaller than the union. Exactly the plan shape
  * a purpose-built ASOF engine (QuestDB/kdb-style) executes, expressed
  * through Catalyst so Exchange reuse, AQE, and codegen'd children all
  * still apply.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut attributes are minted by this node, not read from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: children hash-clustered on their key and sorted
  * within partitions by (key, ts[, payload...]); a buffered two-pointer
  * merge then emits each left row joined to the last qualifying right
  * payload. One shuffle per side (co-partitioned by EnsureRequirements),
  * O(|L| + |R|) merge work per partition, O(1) state beyond the current
  * payload — spill-safe because the sort is the children's, not ours. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // payload columns as trailing right-side sort keys: when several right
  // rows share (key, ts), the LAST consumed (= greatest payload tuple)
  // wins deterministically — same tie-break the window form pins. Cost:
  // every payload column participates in the right-side sort comparator
  // even when (key, ts) ties are impossible, and each must be an
  // ORDERABLE type — both validated/documented at the NativeAsof API.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTs, Ascending) +:
      payload.map(p => SortOrder(p, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    // Null-guarded, nulls-FIRST comparisons — the children are sorted
    // Ascending (= NULLS FIRST), and the interpreted ordering itself NPEs
    // on null operands. Null keys therefore form the first group and
    // match each other, and a null ts orders before every real ts (acts
    // as -infinity) — exactly what the union+window form gives dirty
    // data, keeping the documented equivalence (pinned in AsofNativeSpec).
    val keyOrd = nullsFirst(TypeUtils.getInterpretedOrdering(leftKey.dataType))
    val tsOrd = nullsFirst(TypeUtils.getInterpretedOrdering(leftTs.dataType))
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val nPayload = payload.length
    val payloadExprs = payload.map(_.asInstanceOf[Expression])
    val lKey = leftKey; val lTs = leftTs; val rKey = rightKey; val rTs = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyBound = BindReferences.bindReference(lKey: Expression, lOut)
      val lTsBound = BindReferences.bindReference(lTs: Expression, lOut)
      val rKeyBound = BindReferences.bindReference(rKey: Expression, rOut)
      val rTsBound = BindReferences.bindReference(rTs: Expression, rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val resultProj = UnsafeProjection.create(
        outAttrs.map(_.asInstanceOf[Expression]), lOut ++ payloadOut)
      val joined = new JoinedRow
      val nullPayload: InternalRow = InternalRow.fromSeq(Seq.fill(nPayload)(null))
      val rBuf = rIter.buffered
      // lastKey/lastPayload are COPIES: upstream sort iterators reuse row
      // buffers, so anything retained across next() must be detached.
      var lastKey: Any = null
      var haveMatch = false
      var lastPayload: InternalRow = nullPayload
      lIter.map { lrow =>
        val lk = lKeyBound.eval(lrow)
        val lt = lTsBound.eval(lrow)
        while (rBuf.hasNext && keyOrd.compare(rKeyBound.eval(rBuf.head), lk) < 0)
          rBuf.next()
        while (rBuf.hasNext && keyOrd.compare(rKeyBound.eval(rBuf.head), lk) == 0 &&
            tsOrd.compare(rTsBound.eval(rBuf.head), lt) <= 0) {
          val r = rBuf.next()
          lastPayload = payloadProj(r).copy()
          lastKey = InternalRow.copyValue(lk)
          haveMatch = true
        }
        val p = if (haveMatch && keyOrd.compare(lastKey, lk) == 0) lastPayload
                else nullPayload
        resultProj(joined(lrow, p))
      }
    }
  }

  private def nullsFirst(ord: Ordering[Any]): Ordering[Any] = new Ordering[Any] {
    override def compare(a: Any, b: Any): Int =
      if (a == null) { if (b == null) 0 else -1 }
      else if (b == null) 1
      else ord.compare(a, b)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Inject via
  * `GraftExtensions` (`spark.sql.extensions`) or append to
  * `spark.experimental.extraStrategies` on a live session. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, p, pOut) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, p, pOut) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level builder over [[AsOfJoinNode]] — the same signature
  * and output contract as `graft.operators.AsofJoin.asof` (left columns
  * plus `asof_<payload>` columns), so callers can swap implementations
  * per workload shape.
  *
  * Payload columns double as the right-side (key, ts) tie-break sort
  * keys, so they must be ORDERABLE types (no map / nested non-orderable
  * fields — validated here with a clear error), and wide payloads add
  * sort-comparator cost even when ties are impossible; project the
  * payload down, or use the union+window form, when that matters. */
object NativeAsof {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.catalyst.plans.logical.Project

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payloadCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    // idempotent: functions into the registry, AsOfJoinStrategy into
    // experimental.extraStrategies so the planner can place the node
    graft.functions.GraftExtensions.registerAll(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    // fresh exprIds on the right so self-as-of (both sides from one
    // table, as in blocked-vs-allowed) can never alias-collide
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def find(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"$side side has no column '$n' (has: ${out.map(_.name).mkString(", ")})"))
    val payload = payloadCols.map(find(rPlan.output, _, "right"))
    payload.find(p => !RowOrdering.isOrderable(p.dataType)).foreach { p =>
      throw new IllegalArgumentException(
        s"payload column '${p.name}' has non-orderable type " +
          s"${p.dataType.catalogString}: the native as-of sorts payload columns " +
          "for the (key, ts) tie-break — project it to an orderable type or " +
          "use the union+window form (graft.operators.AsofJoin.asof)")
    }
    val payloadOut = payload.map(p =>
      AttributeReference(s"asof_${p.name}", p.dataType, nullable = true)())
    val node = AsOfJoinNode(lPlan, rPlan,
      find(lPlan.output, keyCol, "left"), find(lPlan.output, tsCol, "left"),
      find(rPlan.output, keyCol, "right"), find(rPlan.output, tsCol, "right"),
      payload, payloadOut)
    org.apache.spark.sql.GraftPlanBridge.ofRows(spark, node)
  }
}

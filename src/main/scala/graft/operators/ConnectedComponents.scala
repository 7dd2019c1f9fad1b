package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the cluster-
  * resolution step of a dedup pipeline: candidate/verified duplicate
  * PAIRS must become duplicate GROUPS (keep one canonical doc per
  * component) before any row can be dropped, and pair-at-a-time dedup
  * gets transitive chains (a~b, b~c) wrong.
  *
  * Algorithm: min-label propagation as pure DataFrame iterations — every
  * node starts labeled with itself; each round, each node takes the min
  * of its own and its neighbors' labels; fixpoint = per-component min id.
  * Exact integer mins, so the result is deterministic and engine-
  * portable (the DuckDB oracle computes the same fixpoint via a
  * recursive CTE).
  *
  * Scale design:
  *   - one round = one shuffle join (edges ⋈ labels on src) + one
  *     groupBy(node) min — both hash-partition on the node id, so AQE
  *     coalesces and the pattern holds at any |V|, |E|;
  *   - rounds needed = component diameter. Near-dup clusters are
  *     near-cliques (diameter ≲ 3), so propagation converges in a
  *     handful of rounds; for adversarial long-chain graphs the
  *     production accelerant is small-star/large-star (O(log n) rounds),
  *     which keeps the same per-round plan shape;
  *   - convergence is detected with a 1-row sum-of-labels action (labels
  *     only ever decrease, so the sum strictly decreases until the
  *     fixpoint) — no collect of the label table;
  *   - each round's labels are persisted and the previous round's are
  *     released, so lineage stays flat (no exponential recompute).
  */
object ConnectedComponents {

  /** Label every node in `nodes(node)` with the minimum node id reachable
    * through `pairs(i, j)` (undirected). Isolated nodes keep their own
    * id. Returns (node, label), cached via `cache` (callers that manage
    * cache lifetimes pass their own registration hook). */
  def minLabel(nodes: DataFrame, pairs: DataFrame, maxIter: Int = 20,
               cache: DataFrame => DataFrame = _.persist(StorageLevel.MEMORY_AND_DISK))
      : DataFrame = {
    val edges = pairs.select(col("i").as("src"), col("j").as("dst"))
      .union(pairs.select(col("j").as("src"), col("i").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cache(nodes.select(col("node"), col("node").as("label")))
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum("label")).head.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val propagated = edges
        .join(labels.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), col("label"))
      val next = cache(labels.union(propagated)
        .groupBy("node").agg(min("label").as("label")))
      val s = labelSum(next)
      labels.unpersist(blocking = false)
      labels = next
      converged = s == prevSum
      prevSum = s
      iter += 1
    }
    edges.unpersist(blocking = false)
    // partially-propagated labels are a WRONG keep-list that looks
    // plausible — refuse to return one. Components deeper than maxIter
    // mean the input is not near-dup-cluster-shaped; the caller should
    // raise maxIter (or switch to small-star/large-star, O(log n)).
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge within $maxIter rounds — " +
          s"component diameter exceeds maxIter; raise it for chain-shaped graphs")
    labels
  }
}

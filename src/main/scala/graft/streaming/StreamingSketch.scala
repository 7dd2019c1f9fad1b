package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming × sketches: the mergeable daily cardinality rollup
  * (`a11_hll_daily_rollup`) maintained INCREMENTALLY.
  *
  * The batch form rescans the window to rebuild each day's HLL; this
  * form keeps one constant-size Datasketches HLL per OPEN day-window in
  * the state store (never the distinct set itself), folds each
  * micro-batch into it, and evicts the sketch when the watermark closes
  * the day. Emitted rows carry both the estimate and the BINARY sketch,
  * so any date range re-merges downstream with `hll_union_agg` without
  * touching the event stream again — at 100 TB the live state is
  * O(open days × sketch bytes) regardless of domain cardinality, and
  * the persisted rollup is the same relation the batch path builds. */
object StreamingSketch {

  /** Watermarked per-day domain-cardinality sketch over a (streaming or
    * batch) preprocessed frame with (ts, domain). Append mode: a day
    * emits once, when the watermark passes its end. */
  def dailyDomainSketch(prep: DataFrame): DataFrame =
    prep.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(hll_sketch_agg(col("domain")).as("domain_sketch"))
      .select(col("w.start").as("day"), col("domain_sketch"),
        hll_sketch_estimate(col("domain_sketch")).as("approx_domains"))

  /** Range re-merge over the emitted rollup — union the per-day sketches
    * back into one estimate (exactly the batch a11 second stage). */
  def mergeRange(rollup: DataFrame): DataFrame =
    rollup.agg(
      count(lit(1)).as("n_days"),
      hll_sketch_estimate(hll_union_agg(col("domain_sketch")))
        .as("est_distinct_domains"))

  /** The FREQUENCY twin of [[dailyDomainSketch]]: one count-min sketch
    * per closed day, maintained incrementally under the same watermark.
    * CMS partials are counter matrices — commutative, mergeable, fixed
    * size — so the streaming state per open day is constant no matter
    * the domain cardinality, exactly like the HLL path but answering
    * "how often" instead of "how many distinct". The emitted binary
    * sketch re-merges downstream ([[probeCounts]]) for any date range
    * without touching the stream again. Seed pinned (42) so batch and
    * streaming sketches are bit-comparable. */
  def dailyDomainCms(prep: DataFrame): DataFrame =
    prep.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(expr("count_min_sketch(domain, 0.001d, 0.99d, 42)").as("cms"))
      .select(col("w.start").as("day"), col("cms"))

  /** Merge a CMS rollup's days on the driver and probe the given keys —
    * the serving-side read of the incremental rollup (estimates are
    * upper bounds: ≥ true count, ≤ true + ε·N w.h.p.). */
  def probeCounts(rollup: DataFrame, keys: Seq[String]): Seq[(String, Long)] = {
    val sketches = rollup.select("cms").collect().map(_.getAs[Array[Byte]](0))
      .map(b => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)))
    sketches.reduceOption { (a, b) => a.mergeInPlace(b); a } match {
      case Some(m) => keys.map(k => k -> m.estimateCount(k))
      case None => keys.map(_ -> 0L)
    }
  }
}

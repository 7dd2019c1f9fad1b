package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. Random sampling
  * (`df.sample`) is non-reproducible across runs/engines and useless for
  * A/B-stable corpus construction; these operators sample by CONTENT HASH,
  * so the same document lands in the same split on every engine, at every
  * scale, regardless of partitioning or row order.
  *
  * Scale design:
  *   - the predicate is a pure projection (md5 + substr compare) — fully
  *     codegen'd, map-side only, no shuffle, no driver state; at 100 TB it
  *     rides the scan and costs one hash per row;
  *   - rate control is hex-prefix range: the first 2 hex chars partition
  *     the hash space into 256 uniform buckets, so rate = buckets/256 —
  *     deterministic, composable (a 1/4 sample CONTAINS the 1/8 sample:
  *     prefix < '20' ⊂ prefix < '40'), and engine-portable (md5 is
  *     bit-identical everywhere, unlike xxhash/rand seeds);
  *   - stratification is the same predicate grouped by stratum — no
  *     per-group reservoir state, so it distributes trivially (compare:
  *     reservoir sampling needs a single-pass sequential scan per group).
  */
object Sampling {

  /** Hash-bucket membership: true iff the doc's md5 bucket (first 2 hex
    * chars = 256 buckets) falls below `buckets`. Keyed on doc_id, not
    * text, so exact-duplicate texts can still land in different splits
    * (dedup is its own operator, not a sampling side effect). */
  def hashBucketPred(keyCol: Column, buckets: Int): Column = {
    require(buckets >= 1 && buckets <= 256, s"buckets must be 1..256, got $buckets")
    // 256 = keep-everything; the general formula would render a 3-char
    // bound "100" that lexicographically sorts BELOW most 2-char hex
    // prefixes and silently inverted the predicate
    if (buckets == 256) lit(true)
    else substring(md5(keyCol.cast("string")), 1, 2) < lit(f"$buckets%02x")
  }

  /** P6: deterministic uniform sample — keep docs whose md5(doc_id)
    * prefix falls in the first `buckets`/256 of the hash space
    * (buckets=64 → 25% expected rate). Returns the sampled rows. */
  def hashSample(docs: DataFrame, buckets: Int = 64): DataFrame =
    docs.filter(hashBucketPred(col("doc_id"), buckets))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")

  /** P7: stratified sampling ACCOUNTING — per-stratum totals, sampled
    * counts, and realized rates for the same hash predicate. One scan,
    * one tiny aggregate; the conditional count is map-side combined. */
  def stratifiedSummary(docs: DataFrame, buckets: Int = 64): DataFrame =
    docs.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("total"),
        count(when(hashBucketPred(col("doc_id"), buckets), 1)).as("sampled"))
      .withColumn("rate",
        round(col("sampled").cast("double") / col("total"), 6))
      .orderBy("lang")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the cases AQE's runtime skew-join split
  * cannot fix on its own (a single hot key inside one shuffle partition
  * of a non-sort-merge join, or a skewed aggregate whose partial state is
  * itself large — collect_set/countDistinct-style).
  *
  * The salting transform: replicate the SMALL side `factor`× (one copy
  * per salt value) and give each big-side row a deterministic salt, so
  * the hot key's rows spread over `factor` shuffle partitions. The salt
  * must be DETERMINISTIC (derived from row content, not rand()) or
  * retries/speculative tasks produce different results.
  */
object Skew {

  /** Deterministic per-row salt in [0, factor): hash of the given columns
    * (fall back to all columns of the join key plus a payload column for
    * uniqueness — any stable per-row mix works; uniformity is what
    * matters, not secrecy). */
  def salt(factor: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(factor))

  /** Inner equi-join `big ⋈ small` on `key`, salted `factor` ways.
    * `saltSource` picks big-side columns whose hash spreads the hot key's
    * rows (e.g. a timestamp or id column — NOT the join key, which is
    * constant within the hot key).
    *
    * Plan shape: small is exploded `factor`× (tiny) and both sides join
    * on (key, salt) — the shuffle key gains entropy exactly where the
    * data is hot; everything else pays one extra int column. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int, saltSource: Seq[String]): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      salt(factor, saltSource.map(col): _*))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(explodedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for skewed heavy-state aggregates: stage 1
    * aggregates per (key, salt) — spreading one hot key's state over
    * `factor` tasks — stage 2 merges the per-salt partials. Provided for
    * algebraic aggregates expressed as (partial, merge) column pairs.
    *
    * For plain count/sum Spark's map-side partial aggregation already
    * neutralizes skew; use this when the partial state is the problem
    * (e.g. approximate distinct over a hot key: partial HLLs per salt,
    * merged in stage 2 — constant driver-side state per key). */
  def saltedCount(df: DataFrame, key: String, factor: Int,
                  saltSource: Seq[String]): DataFrame =
    df.withColumn("_salt", salt(factor, saltSource.map(col): _*))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum("_partial").as("cnt"))
}

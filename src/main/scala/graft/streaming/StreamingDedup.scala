package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming forms of the pipeline's dedup/enrichment stages.
  *
  * - [[dedupByKey]]: exact dedup on a stream — engine-managed seen-key
  *   state; the watermark bounds it (keys older than the horizon are
  *   evicted, so state is O(keys within watermark), not O(all keys
  *   ever)). This is the streaming analog of `d01` exact dedup.
  * - [[enrich]]: stream-static join — each micro-batch hash-joins
  *   against the (broadcastable) static dimension; no state at all. The
  *   standard shape for attaching user/dimension attributes to an event
  *   stream at ingest.
  */
object StreamingDedup {

  /** Drop duplicate events BY KEY within the watermark horizon — a retry
    * that re-stamps the event time still dedups (dropDuplicates on
    * (key, ts) would let it through). `df` must carry the event-time
    * column `ts`. */
  def dedupByKey(df: DataFrame, keyCols: Seq[String], watermark: String = "2 hours"): DataFrame =
    df.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-static enrichment join on `key` (inner). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key))
}

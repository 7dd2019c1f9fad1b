package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — both inputs unbounded, state on BOTH sides.
  *
  * The interval join below is the streaming analog of the batch as-of
  * family (`j05`): correlate each Blocked event with the same client's
  * Allowed events in a trailing time window. Unlike the stream-static
  * enrichment join (no state) or a watermarked aggregation (one-sided
  * state), a stream-stream join buffers BOTH sides; the watermark plus
  * the interval bound is what makes that state finite:
  *
  *   - an Allowed row can only match Blocked rows with
  *     b_ts ∈ [a_ts, a_ts + lookback], so once the blocked-side
  *     watermark passes a_ts + lookback the row is evicted;
  *   - a Blocked row matches Allowed rows no older than
  *     b_ts − lookback, bounding the allowed-side buffer the same way.
  *
  * Without BOTH the time-range predicate and watermarks on both inputs,
  * Spark (correctly) refuses to run the join in append mode — unbounded
  * state. At 100 TB/day the state is O(events within lookback+watermark
  * horizon), independent of stream length.
  */
object StreamingJoins {

  /** Inner interval join: (blocked event, same-client allowed events in
    * the trailing `lookbackSeconds`). `prepStream` must carry
    * (id, ts, client, status_type) with event-time `ts`. */
  def blockedWithRecentAllowed(prepStream: DataFrame,
                               lookbackSeconds: Long = 600,
                               watermark: String = "30 minutes"): DataFrame = {
    val blocked = prepStream.filter(col("status_type") === "Blocked")
      .select(col("id").as("b_id"), col("ts").as("b_ts"), col("client").as("b_client"))
      .withWatermark("b_ts", watermark)
    val allowed = prepStream.filter(col("status_type") === "Allowed")
      .select(col("id").as("a_id"), col("ts").as("a_ts"), col("client").as("a_client"))
      .withWatermark("a_ts", watermark)
    blocked.join(allowed,
      col("b_client") === col("a_client") &&
        col("a_ts") <= col("b_ts") &&
        col("a_ts") >= col("b_ts") - expr(s"INTERVAL $lookbackSeconds SECONDS"))
      .select("b_client", "b_id", "b_ts", "a_id", "a_ts")
  }

  /** The batch-equivalent join (same predicate on a static frame) — the
    * stream≡batch contract the spec asserts. */
  def blockedWithRecentAllowedBatch(prep: DataFrame,
                                    lookbackSeconds: Long = 600): DataFrame = {
    val blocked = prep.filter(col("status_type") === "Blocked")
      .select(col("id").as("b_id"), col("ts").as("b_ts"), col("client").as("b_client"))
    val allowed = prep.filter(col("status_type") === "Allowed")
      .select(col("id").as("a_id"), col("ts").as("a_ts"), col("client").as("a_client"))
    blocked.join(allowed,
      col("b_client") === col("a_client") &&
        col("a_ts") <= col("b_ts") &&
        col("a_ts") >= col("b_ts") - expr(s"INTERVAL $lookbackSeconds SECONDS"))
      .select("b_client", "b_id", "b_ts", "a_id", "a_ts")
  }
}

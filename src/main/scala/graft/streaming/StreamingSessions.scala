package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session analytics in streaming form.
  *
  * Two mechanisms, each the idiomatic choice for its job:
  *   - [[sessionWindowCounts]]: Spark's native `session_window` gap
  *     aggregation — works identically over batch and streaming frames
  *     (compose-existing-ops wins over custom state when semantics
  *     allow); with a watermark the engine evicts closed sessions.
  *   - [[runningClientTotals]]: `mapGroupsWithState` custom state — the
  *     escape hatch for state machines `session_window` can't express
  *     (here a running per-client profile, updated per micro-batch).
  *     State is per client, O(|clients|), and lives in the state store —
  *     checkpointed, recoverable, partitioned by the grouping key.
  */
object StreamingSessions {

  /** Gap-based session counts per client. `df` may be a batch or
    * streaming frame with (client, ts); in streaming callers add
    * `withWatermark("ts", ...)` upstream so state for closed sessions is
    * dropped. Semantics vs the window-function sessionizer
    * ([[graft.operators.Streaks.sessionize]]): identical except at an
    * exact-boundary gap (== gapSeconds), which is measure-zero on real
    * timestamps. */
  def sessionWindowCounts(df: DataFrame, gapSeconds: Long): DataFrame =
    df.groupBy(
      session_window(col("ts"), s"$gapSeconds seconds").as("sw"),
      col("client"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("client"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  case class ClientState(nEvents: Long, lastSeenMicros: Long)
  case class ClientTotal(client: String, nEvents: Long, lastSeenMicros: Long)

  /** Running per-client totals via explicit state — emitted once per
    * group per micro-batch (update mode). */
  def runningClientTotals(events: Dataset[(String, Long)]): Dataset[ClientTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (client: String, batch: Iterator[(String, Long)], state: GroupState[ClientState]) =>
          val prev = state.getOption.getOrElse(ClientState(0L, Long.MinValue))
          var n = prev.nEvents
          var last = prev.lastSeenMicros
          batch.foreach { case (_, ts) => n += 1; if (ts > last) last = ts }
          val next = ClientState(n, last)
          state.update(next)
          ClientTotal(client, next.nEvents, next.lastSeenMicros)
      }
  }

  case class SessionState(start: Long, last: Long, nEvents: Long)
  case class ClosedSession(client: String, sessionStartMicros: Long,
                           sessionEndMicros: Long, nEvents: Long)

  /** Closed-session emission via `flatMapGroupsWithState` — the state
    * machine `session_window` can't express when the OUTPUT is the
    * decision point: emit a record ONLY when a session closes (zero
    * rows for quiet micro-batches, several when a burst closes several),
    * which is why this is flatMap-with-state rather than map-with-state
    * (exactly one row per group per batch). A session closes when a new
    * event arrives more than `gapSeconds` after the last, or when the
    * event-time timeout fires with no successor (timed-out groups get a
    * final callback with an empty batch). State is one (start, last, n)
    * triple per live client — O(|live clients|), checkpointed,
    * partitioned by the grouping key. Event-time timeout + watermark
    * bound state exactly like `session_window`'s eviction. */
  def closedSessions(events: DataFrame,
                     gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L
    // expects (client, ts TIMESTAMP); in streaming the caller watermarks
    // `ts` BEFORE this call (EventTimeTimeout requires it). Rows at or
    // behind the watermark ARE dropped by the exec node before this
    // function runs (StreamingSpec pins an at-watermark event being
    // filtered), so the function body normally only sees fresh rows; the
    // timeout clamp below is defense-in-depth, not the primary late-data
    // policy. The watermarked ts column must SURVIVE into the grouped
    // input — watermark tracking is column metadata, and projecting the
    // column away makes the checker reject the query.
    events
      .select(col("client").cast("string").as("client"), col("ts"),
        unix_micros(col("ts")).as("micros"))
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (client: String, batch: Iterator[(String, java.sql.Timestamp, Long)],
         state: GroupState[SessionState]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap with no successor: the session is closed
            state.getOption.foreach(s =>
              closed += ClosedSession(client, s.start, s.last, s.nEvents))
            state.remove()
          } else {
            var cur = state.getOption.orNull
            batch.toSeq.sortBy(_._3).foreach { case (_, _, ts) =>
              cur match {
                case null => cur = SessionState(ts, ts, 1L)
                case s if ts - s.last > gapMicros =>
                  closed += ClosedSession(client, s.start, s.last, s.nEvents)
                  cur = SessionState(ts, ts, 1L)
                case s =>
                  cur = SessionState(s.start, math.max(s.last, ts), s.nEvents + 1)
              }
            }
            if (cur != null) {
              state.update(cur)
              // A timeout at or behind the current watermark throws
              // IllegalArgumentException and fails the whole query; if a
              // session's last+gap has already been passed by the
              // watermark (possible only if a late row slipped through),
              // clamp forward so it times out on the next batch instead.
              // getCurrentWatermarkMs throws when no watermark is set
              // (batch execution) — there timeouts never fire anyway.
              val wmMs = try state.getCurrentWatermarkMs()
                         catch { case _: UnsupportedOperationException => Long.MinValue }
              state.setTimeoutTimestamp(
                math.max(wmMs + 1L, (cur.last + gapMicros) / 1000L + 1L))
            }
          }
          closed.iterator
      }
  }

  /** Streaming sessionized counts over the events directory: watermark →
    * session_window, append mode (sessions emit once closed). */
  def streamSessionCounts(prepStream: DataFrame, gapSeconds: Long): DataFrame =
    sessionWindowCounts(prepStream.withWatermark("ts", "2 hours"), gapSeconds)

  /** Drain a streaming session count into a memory sink. */
  def toMemorySink(df: DataFrame, name: String, checkpoint: String, outputMode: String) =
    df.writeStream.queryName(name).outputMode(outputMode)
      .format("memory").option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
}

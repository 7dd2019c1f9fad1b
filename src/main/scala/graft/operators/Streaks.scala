package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Order-dependent operators — streaks (gaps-and-islands) and idle gaps
  * (reference: stats.py:500-528 builds the sorted flags/groups,
  * stats.py:323-365 streak aggregation, stats.py:369-415 idle gaps).
  *
  * The reference relies on one global pandas sort; in Spark these are the
  * only operators that need a total order. [[streakRuns]] keeps the
  * unpartitioned-`Window` form as the executable SEMANTIC SPEC (its plan
  * coalesces to a single task — the documented limit, SURVEY.md §7.3-3);
  * every flagship query (W2/W3/W4) routes through the PARALLEL two-pass
  * machinery instead:
  *
  *   pass 1 — per-partition boundary stats (first/last flag, change
  *     count) via `mapPartitionsWithIndex`: O(rows) work fully parallel,
  *     O(partitions) bytes to the driver (the classic parallel-prefix
  *     shape; at 10k partitions that is a 10k-element array);
  *   driver — a fold over those stats assigns each partition its global
  *     starting run id and a "continues previous run" bit;
  *   pass 2 — re-reads the same shuffled RDD (Spark reuses the shuffle
  *     files across jobs on one lineage) and run-length-encodes each
  *     partition with globally-correct run ids; a run spanning partitions
  *     emits one fragment per partition under ONE id and merges in an
  *     ordinary parallel `groupBy(grp)` — no single-task stage anywhere.
  *
  * W2 (longest streak) and W3 (longest idle) therefore contain NO Window
  * operator at all (pinned in PlanSpec): W2 is a TakeOrdered over the run
  * relation; W3 reduces per-partition maxima plus the O(partitions)
  * boundary gaps.
  */
object Streaks {

  /** Range-shuffle width for the parallel streak passes. `requested > 0`
    * is honored verbatim (tests pin partition-count invariance by passing
    * explicit values); the 0 default tracks the INPUT's partition count so
    * a 100 TB scan keeps its parallelism through the streak passes instead
    * of collapsing to a fixed 32 — floored at 32 so tiny local inputs
    * still exercise the multi-partition merge paths.
    *
    * Reads the physical partition count via `queryExecution.toRdd` —
    * `Dataset.rdd` would wrap the conversion in a new SQL execution
    * (an extra tracked driver action per streak call; the computeStats
    * job budget in EngineSpec pins this), while the raw physical RDD is
    * just plan inspection: no job, no execution event. */
  private def autoPartitions(prep: DataFrame, requested: Int): Int =
    if (requested > 0) requested
    else math.max(32, prep.queryExecution.toRdd.getNumPartitions)

  /** Type-robust `ts` read for the RDD scan passes. Source normalization
    * ([[graft.Tables.normalizeTs]]) guarantees TimestampType, but the raw
    * row value still varies by conf: java.sql.Timestamp normally,
    * java.time.Instant under datetime.java8API, java.time.LocalDateTime
    * if an un-normalized NTZ frame ever reaches here. Accept all three so
    * a source-encoding shift degrades to correct-but-unnormalized instead
    * of a ClassCastException mid-scan. */
  private def tsAt(r: Row): java.sql.Timestamp = r.get(0) match {
    case t: java.sql.Timestamp       => t
    case i: java.time.Instant        => java.sql.Timestamp.from(i)
    case l: java.time.LocalDateTime  => java.sql.Timestamp.from(l.toInstant(java.time.ZoneOffset.UTC))
    case other => throw new IllegalArgumentException(
      s"unsupported ts value ${other.getClass.getName}; expected a timestamp")
  }

  /** W1+A21: per-run relation for one class flag. Group id = running count
    * of flag flips over the time order (pandas: cumsum of
    * `flag != flag.shift()`, stats.py:507-514); keep only the runs where
    * the flag holds and aggregate run length + first timestamp
    * (stats.py:328-335; first-on-sorted = min(ts)). */
  def streakRuns(prep: DataFrame, statusType: String): DataFrame = {
    val w = Window.orderBy("ts", "id")
    val run = Window.orderBy("ts", "id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flag = (col("status_type") === statusType).as("flag")
    prep.select(col("ts"), col("id"), flag)
      .withColumn("chg",
        when(lag(col("flag"), 1).over(w).isNull || lag(col("flag"), 1).over(w) =!= col("flag"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("chg")).over(run))
      .filter(col("flag"))
      .groupBy("grp")
      .agg(count(lit(1)).as("streak_len"), min(col("ts")).as("start_ts"))
      .select("grp", "streak_len", "start_ts")
  }

  /** W2: longest streak of a class — argmax run by length, earliest start
    * on ties (pandas idxmax returns the first = earliest group,
    * stats.py:337-344). Routed through the parallel run relation: the
    * argmax is a TakeOrdered over runs — the plan carries no Window
    * operator and no single-task stage. */
  def longestStreak(prep: DataFrame, statusType: String): DataFrame =
    topRunOfClass(parallelRunsBy(prep, col("status_type"), StringType), statusType)

  private def topRunOfClass(runs: DataFrame, statusType: String): DataFrame =
    runs.filter(col("key") === statusType)
      .orderBy(desc("streak_len"), asc("start_ts")).limit(1)
      .select(lit(statusType).as("status_type"), col("streak_len"), col("start_ts"))

  /** W2 both classes in one result (reference computes blocked + allowed,
    * stats.py:336-359). ONE scan for both classes: runs are computed on
    * the status VALUE (a maximal Allowed stretch is the same row set
    * whether bounded by "≠ Allowed" or by a value change), so the two
    * argmax branches share the run relation — and its shuffle — instead
    * of scanning the events twice. */
  def longestStreaks(prep: DataFrame): DataFrame = {
    val runs = parallelRunsBy(prep, col("status_type"), StringType)
    topRunOfClass(runs, "Allowed").unionByName(topRunOfClass(runs, "Blocked"))
      .orderBy("status_type")
  }

  /** Flag-run form: `grp` ids identical to [[streakRuns]]' window cumsum
    * (first run = 1, sequential over BOTH flag values). */
  private[graft] def parallelRuns(prep: DataFrame, statusType: String,
                                  numPartitions: Int = 0): DataFrame =
    parallelRunsBy(prep, col("status_type") === statusType, BooleanType, numPartitions)
      .withColumnRenamed("key", "flag")

  /** The parallel run relation: (grp, key, streak_len, start_ts) for ALL
    * maximal stretches of equal `key` values in (ts, id) order, with
    * `grp` ids equal to the window form's running change count.
    *
    * Two passes over one range-shuffled sort (see the object doc):
    * pass 1 collects O(partitions) boundary stats, a driver fold turns
    * them into per-partition (starting run id, continues-previous) pairs,
    * and pass 2 emits per-partition RLE fragments with globally correct
    * ids. Fragments of a partition-spanning run share a `grp` and merge
    * in the final parallel groupBy — `sum(run_len)`, `min(start_ts)`.
    *
    * The degenerate worst case (alternating keys, runs ≈ rows) keeps
    * the same shape: the groupBy then shuffles ~|rows| run fragments,
    * which is still a parallel aggregation, not a single-task window. */
  private[graft] def parallelRunsBy(prep: DataFrame, key: Column,
                                    keyType: DataType,
                                    numPartitions: Int = 0): DataFrame = {
    val spark = prep.sparkSession
    val nParts = autoPartitions(prep, numPartitions)
    val runSchema = StructType(Seq(
      StructField("grp", LongType, nullable = false),
      StructField("key", keyType, nullable = true),
      StructField("run_len", LongType, nullable = false),
      StructField("start_ts", TimestampType, nullable = false)))
    val rdd = prep
      .select(col("ts"), col("id"), key.as("key"))
      .repartitionByRange(nParts, col("ts"), col("id"))
      .sortWithinPartitions("ts", "id")
      .rdd
    // pass 1: (pid, firstKey, lastKey, internal changes) per non-empty
    // partition — constant bytes per partition, like the k-means
    // centroid collect: O(partitions) driver data by construction
    val stats = rdd.mapPartitionsWithIndex { (pid, rows) =>
      var n = 0L; var flips = 0L
      var first: Any = null; var last: Any = null
      rows.foreach { r =>
        val f = r.get(2)
        if (n == 0L) first = f else if (f != last) flips += 1
        last = f; n += 1
      }
      if (n == 0L) Iterator.empty else Iterator.single((pid, first, last, flips))
    }.collect().sortBy(_._1)
    // driver fold: partition p's first run id and whether its first row
    // continues the previous partition's last run (same key)
    val bases = Map.newBuilder[Int, (Long, Boolean)]
    var runsSoFar = 0L
    var prevLast: Option[Any] = None
    stats.foreach { case (pid, first, last, flips) =>
      val continues = prevLast.contains(first)
      bases += pid -> (runsSoFar, continues)
      runsSoFar += (if (continues) 0L else 1L) + flips
      prevLast = Some(last)
    }
    val bc = spark.sparkContext.broadcast(bases.result())
    // pass 2: per-partition RLE with global run ids; reuses pass 1's
    // shuffle files (same RDD lineage), so the events scan+exchange run
    // once across the two jobs
    val runsRdd = rdd.mapPartitionsWithIndex { (pid, rows) =>
      bc.value.get(pid) match {
        case None => Iterator.empty[Row]
        case Some((base, continues)) =>
          val out = ArrayBuffer.empty[Row]
          var grp = base; var started = false
          var cur: Any = null; var len = 0L; var start: java.sql.Timestamp = null
          rows.foreach { r =>
            val f = r.get(2)
            if (!started) {
              grp = if (continues) base else base + 1
              started = true; cur = f; len = 0L; start = tsAt(r)
            } else if (f != cur) {
              out += Row(grp, cur, len, start)
              grp += 1; cur = f; len = 0L; start = tsAt(r)
            }
            len += 1
          }
          if (started) out += Row(grp, cur, len, start)
          out.iterator
      }
    }
    spark.createDataFrame(runsRdd, runSchema)
      .groupBy("grp")
      .agg(min(col("key")).as("key"), sum(col("run_len")).as("streak_len"),
        min(col("start_ts")).as("start_ts"))
  }

  /** The SCALE-PATH streak relation (SURVEY.md §7.3-3): identical output
    * to [[streakRuns]] but renumbered by start time (`run_no`) so it is
    * deterministic and engine-comparable. All O(rows) work happens in
    * [[parallelRuns]]; the one remaining Window is the final
    * `row_number` renumber over the RUN relation (runs ≪ rows for DNS
    * logs — and the renumber is presentation, not computation). */
  def streakRunsScalable(prep: DataFrame, statusType: String,
                         numPartitions: Int = 0): DataFrame =
    parallelRuns(prep, statusType, numPartitions).filter(col("flag"))
      .select(
        row_number().over(Window.orderBy("start_ts")).as("run_no"),
        col("streak_len"), col("start_ts"))

  /** Sessionization per client: a new session starts when the gap to the
    * previous event of the SAME client exceeds `gapSeconds` — the
    * per-natural-partition order-dependent pattern from SURVEY.md §7.3-3:
    * the window is partitioned by client, so unlike W1-W4 it parallelizes
    * across the cluster with no global order. Returns per-session rows
    * (client, session_no, n_events, start/end). */
  def sessionize(prep: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val w = Window.partitionBy("client").orderBy("ts", "id")
    val acc = Window.partitionBy("client").orderBy("ts", "id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prep.select(col("client"), col("ts"), col("id"))
      .withColumn("gap_s",
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)) / lit(1e6))
      .withColumn("new_sess",
        when(col("gap_s").isNull || col("gap_s") > gapSeconds, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_sess")).over(acc))
      .groupBy("client", "session_no")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .orderBy("client", "session_no")
  }

  /** Per-client session summary — sessions per client + mean session
    * length, the aggregate a dashboard would show. */
  def sessionSummary(prep: DataFrame, gapSeconds: Long = 1800): DataFrame =
    sessionize(prep, gapSeconds)
      .groupBy("client")
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("n_events")), 4).as("avg_session_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy("client")

  /** F13: the display-formatted longest-streak block — the reference
    * renders start date as "%d %B %Y" and hour as "%H:%M"
    * (stats.py:342-355); Java patterns "dd MMMM yyyy" / "HH:mm" under the
    * UTC session zone. Kept as a separate query so the unformatted W2
    * result stays the canonical comparison surface. */
  def longestStreaksFormatted(prep: DataFrame): DataFrame =
    longestStreaks(prep).select(
      col("status_type"), col("streak_len"),
      date_format(col("start_ts"), "dd MMMM yyyy").as("streak_date"),
      date_format(col("start_ts"), "HH:mm").as("streak_hour"))

  /** W3+W4: the largest inter-arrival gap over the full ordered relation,
    * with the timestamps bounding it (reference: idle_gap stats.py:515,
    * argmax + before/after stats.py:369-402). Ties broken by earliest
    * occurrence (pandas idxmax → first). Gap reported in seconds — the
    * reference's `max_idle_ms` key actually holds seconds (SURVEY.md
    * §7.3-4); we use an honest column name. */
  /** W7: trailing-hour load per event — count of the same client's events
    * in (ts − window, ts], as a RANGE frame over epoch micros. A RANGE
    * frame (value-based bounds) is the deterministic choice here: rows
    * sharing a timestamp are all peers of each other's frame, so the
    * count does not depend on shuffle order the way a ROWS frame would.
    * Scale: partitioned by client — the window shuffles once on client
    * and sorts within partitions; no global ordering anywhere. */
  def slidingWindowCounts(prep: DataFrame, windowSeconds: Long = 3600): DataFrame = {
    val w = Window.partitionBy("client").orderBy(col("ts_us"))
      .rangeBetween(-(windowSeconds * 1000000L - 1), Window.currentRow)
    prep.select(col("client"), col("id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
  }

  /** W7 summary: each client's peak trailing-hour load and the first
    * timestamp at which it was reached. */
  def peakHourlyLoad(prep: DataFrame, windowSeconds: Long = 3600): DataFrame = {
    // the peak is a second window over the SAME client partitioning, so
    // it rides the sliding count's shuffle (one exchange total); a
    // groupBy-max + self-join would recompute the sliding counts twice
    val sw = slidingWindowCounts(prep, windowSeconds)
    val wc = Window.partitionBy("client")
    sw.withColumn("peak", max("n_last_hour").over(wc))
      .filter(col("n_last_hour") === col("peak"))
      .groupBy("client", "peak").agg(min("ts").as("first_peak_ts"))
      .orderBy("client")
  }

  /** Exact epoch micros without the per-call `Instant` allocation —
    * this runs once per ROW in the fused pass-1 hot loop.
    * `getTime` already includes the millisecond part of the nanos field,
    * so floor to seconds first and add the full nano fraction back. */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** W2 + W3 fused behind ONE range shuffle. [[longestStreaks]] and
    * [[longestIdle]] each need the same `(ts, id)`-sorted relation; run
    * separately they range-shuffle and sort the input twice — measured as
    * the dominant slice of the facade's stats stage at 100 M rows. The
    * fused pass 1 collects BOTH boundary-stat families per partition
    * (run stats: first/last key + internal flips; idle stats: first/last
    * ts + best internal gap) in one sorted scan, the driver folds both,
    * and only the streak side needs a pass 2 (which reuses the same
    * shuffle files — one exchange total across all three jobs). Outputs
    * are bit-identical to the standalone operators (pinned in
    * `StreaksSpec`); the standalone forms remain the oracle-checked
    * public query surface. */
  def longestStreaksWithIdle(prep: DataFrame): (DataFrame, DataFrame) = {
    val spark = prep.sparkSession
    val nParts = autoPartitions(prep, 0)
    val runSchema = StructType(Seq(
      StructField("grp", LongType, nullable = false),
      StructField("key", StringType, nullable = true),
      StructField("run_len", LongType, nullable = false),
      StructField("start_ts", TimestampType, nullable = false)))
    val rdd = prep
      .select(col("ts"), col("id"), col("status_type").as("key"))
      .repartitionByRange(nParts, col("ts"), col("id"))
      .sortWithinPartitions("ts", "id")
      .rdd
    // pass 1: run-boundary AND idle-gap stats from the same sorted scan —
    // still O(partitions) bytes to the driver
    val stats = rdd.mapPartitionsWithIndex { (pid, rows) =>
      var n = 0L; var flips = 0L
      var firstKey: Any = null; var lastKey: Any = null
      var firstTs: java.sql.Timestamp = null; var prevTs: java.sql.Timestamp = null
      var bestGap = -1L
      var bestBefore: java.sql.Timestamp = null
      var bestAfter: java.sql.Timestamp = null
      rows.foreach { r =>
        val f = r.get(2); val t = tsAt(r)
        if (n == 0L) { firstKey = f; firstTs = t }
        else {
          if (f != lastKey) flips += 1
          val g = micros(t) - micros(prevTs)
          if (g > bestGap) { bestGap = g; bestBefore = prevTs; bestAfter = t }
        }
        lastKey = f; prevTs = t; n += 1
      }
      if (n == 0L) Iterator.empty
      else Iterator.single((pid, firstKey, lastKey, flips, firstTs, prevTs,
        bestGap, bestBefore, bestAfter))
    }.collect().sortBy(_._1)
    // driver fold 1 — streak bases, exactly parallelRunsBy's
    val bases = Map.newBuilder[Int, (Long, Boolean)]
    var runsSoFar = 0L
    var prevLastKey: Option[Any] = None
    stats.foreach { case (pid, first, last, flips, _, _, _, _, _) =>
      val continues = prevLastKey.contains(first)
      bases += pid -> (runsSoFar, continues)
      runsSoFar += (if (continues) 0L else 1L) + flips
      prevLastKey = Some(last)
    }
    // driver fold 2 — idle candidates, exactly longestIdle's
    val cands = ArrayBuffer.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    stats.foreach { case (_, _, _, _, _, _, g, b, a) => if (g >= 0L) cands += ((g, b, a)) }
    stats.iterator.sliding(2).withPartial(false).foreach { case Seq(p, q) =>
      cands += ((micros(q._5) - micros(p._6), p._6, q._5))
    }
    val bc = spark.sparkContext.broadcast(bases.result())
    val runsRdd = rdd.mapPartitionsWithIndex { (pid, rows) =>
      bc.value.get(pid) match {
        case None => Iterator.empty[Row]
        case Some((base, continues)) =>
          val out = ArrayBuffer.empty[Row]
          var grp = base; var started = false
          var cur: Any = null; var len = 0L; var start: java.sql.Timestamp = null
          rows.foreach { r =>
            val f = r.get(2)
            if (!started) {
              grp = if (continues) base else base + 1
              started = true; cur = f; len = 0L; start = tsAt(r)
            } else if (f != cur) {
              out += Row(grp, cur, len, start)
              grp += 1; cur = f; len = 0L; start = tsAt(r)
            }
            len += 1
          }
          if (started) out += Row(grp, cur, len, start)
          out.iterator
      }
    }
    val runs = spark.createDataFrame(runsRdd, runSchema)
      .groupBy("grp")
      .agg(min(col("key")).as("key"), sum(col("run_len")).as("streak_len"),
        min(col("start_ts")).as("start_ts"))
    val streaks = topRunOfClass(runs, "Allowed")
      .unionByName(topRunOfClass(runs, "Blocked")).orderBy("status_type")
    val outSchema = StructType(Seq(
      StructField("before_gap", TimestampType, nullable = false),
      StructField("after_gap", TimestampType, nullable = false)))
    val winner = cands.sortBy { case (g, _, a) => (-g, micros(a)) }.headOption
    val idle = spark.createDataFrame(
      spark.sparkContext.parallelize(winner.map(w => Row(w._2, w._3)).toSeq, 1),
      outSchema)
      .select(
        round((unix_micros(col("after_gap")) - unix_micros(col("before_gap"))) / lit(1e6), 6)
          .as("gap_s"),
        col("before_gap"), col("after_gap"))
    (streaks, idle)
  }

  def longestIdle(prep: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = prep.sparkSession
    val nParts = autoPartitions(prep, numPartitions)
    // one parallel pass: each partition reduces to its max internal gap
    // (strict > keeps the EARLIEST after-ts on ties, matching the window
    // form's `ORDER BY gap DESC, ts`) plus its first/last timestamps for
    // the O(partitions) boundary gaps
    val parts = prep.select(col("ts"), col("id"))
      .repartitionByRange(nParts, col("ts"), col("id"))
      .sortWithinPartitions("ts", "id")
      .rdd.mapPartitionsWithIndex { (pid, rows) =>
        var first: java.sql.Timestamp = null
        var prev: java.sql.Timestamp = null
        var bestGap = -1L
        var bestBefore: java.sql.Timestamp = null
        var bestAfter: java.sql.Timestamp = null
        rows.foreach { r =>
          val t = tsAt(r)
          if (first == null) first = t
          else {
            val g = micros(t) - micros(prev)
            if (g > bestGap) { bestGap = g; bestBefore = prev; bestAfter = t }
          }
          prev = t
        }
        if (first == null) Iterator.empty
        else Iterator.single((pid, first, prev, bestGap, bestBefore, bestAfter))
      }.collect().sortBy(_._1)
    // driver: candidates = per-partition maxima + gaps across consecutive
    // NON-EMPTY partitions (range partitioning can leave holes); winner by
    // (gap desc, after-ts asc) — exact long-micros comparison, no float
    val cands = ArrayBuffer.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
    parts.foreach { case (_, _, _, g, b, a) => if (g >= 0L) cands += ((g, b, a)) }
    parts.iterator.sliding(2).withPartial(false).foreach { case Seq(p, q) =>
      cands += ((micros(q._2) - micros(p._3), p._3, q._2))
    }
    val outSchema = StructType(Seq(
      StructField("before_gap", TimestampType, nullable = false),
      StructField("after_gap", TimestampType, nullable = false)))
    val winner = cands.sortBy { case (g, _, a) => (-g, micros(a)) }.headOption
    val bounds = spark.createDataFrame(
      spark.sparkContext.parallelize(winner.map(w => Row(w._2, w._3)).toSeq, 1),
      outSchema)
    // the gap value is computed by the ENGINE's own expressions (same
    // unix_micros arithmetic + round as the window form), so rounding
    // semantics stay oracle-identical
    bounds.select(
      round((unix_micros(col("after_gap")) - unix_micros(col("before_gap"))) / lit(1e6), 6)
        .as("gap_s"),
      col("before_gap"), col("after_gap"))
  }
}

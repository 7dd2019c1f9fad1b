package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Order-dependent operators — streaks (gaps-and-islands) and idle gaps
  * (reference: stats.py:500-528 builds the sorted flags/groups,
  * stats.py:323-365 streak aggregation, stats.py:369-415 idle gaps).
  *
  * The reference relies on one global pandas sort; in Spark these are the
  * only operators that need a total order. Expressed with an unpartitioned
  * `Window.orderBy(ts, id)`: Spark range-partitions the sort, but the
  * running-sum window then coalesces to a single task — acceptable at bench
  * scale and flagged in SURVEY.md §7.3-3. The scalable treatment for the
  * 100 TB design point is the classic two-pass trick: (1) per-partition
  * run-length encoding via mapPartitions after a repartitionByRange(ts),
  * (2) a driver-side prefix-merge of the ≤ numPartitions boundary runs.
  * Because stage 2's input is 2 rows per partition, it is O(partitions),
  * not O(rows) — see [[streakRuns]]' doc for why we keep the window form
  * here: its output IS the per-run relation the merge would produce, and
  * correctness at driver scale is oracle-checked.
  */
object Streaks {

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
    * stats.py:337-344). */
  def longestStreak(prep: DataFrame, statusType: String): DataFrame =
    streakRuns(prep, statusType)
      .orderBy(desc("streak_len"), asc("start_ts")).limit(1)
      .select(lit(statusType).as("status_type"), col("streak_len"), col("start_ts"))

  /** W2 both classes in one result (reference computes blocked + allowed,
    * stats.py:336-359). */
  def longestStreaks(prep: DataFrame): DataFrame =
    longestStreak(prep, "Allowed").unionByName(longestStreak(prep, "Blocked"))
      .orderBy("status_type")

  private val runSchema = StructType(Seq(
    StructField("pid", IntegerType, nullable = false),
    StructField("run_idx", IntegerType, nullable = false),
    StructField("flag", BooleanType, nullable = false),
    StructField("run_len", LongType, nullable = false),
    StructField("start_ts", TimestampType, nullable = false)))

  /** The SCALE-PATH streak computation (SURVEY.md §7.3-3): identical
    * semantics to [[streakRuns]] but no global single-task window.
    *
    * Two passes:
    *   1. `repartitionByRange(ts)` + per-partition run-length encoding in
    *     `mapPartitions` — the O(rows) work is fully parallel; each
    *     partition emits only its RUNS (for DNS logs, runs ≪ rows);
    *   2. a window over the runs relation merges runs that continue
    *     across partition boundaries — O(runs) on one task, which is the
    *     classic boundary-merge prefix step, not a full-data sort.
    *
    * Output is renumbered by start time (`run_no`) so it is deterministic
    * and engine-comparable; the degenerate worst case (alternating flags,
    * runs ≈ rows) falls back to window-like cost and is the documented
    * limit of the approach.
    */
  def streakRunsScalable(prep: DataFrame, statusType: String,
                         numPartitions: Int = 32): DataFrame = {
    val spark = prep.sparkSession
    val sorted = prep
      .select(col("ts"), col("id"), (col("status_type") === statusType).as("flag"))
      .repartitionByRange(numPartitions, col("ts"), col("id"))
      .sortWithinPartitions("ts", "id")
    val runsRdd = sorted.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val out = ArrayBuffer.empty[Row]
      var runIdx = -1
      var flag = false
      var len = 0L
      var start: java.sql.Timestamp = null
      rows.foreach { r =>
        val f = r.getBoolean(2)
        if (runIdx < 0 || f != flag) {
          if (runIdx >= 0) out += Row(pid, runIdx, flag, len, start)
          runIdx += 1; flag = f; len = 0L; start = r.getTimestamp(0)
        }
        len += 1
      }
      if (runIdx >= 0) out += Row(pid, runIdx, flag, len, start)
      out.iterator
    }
    val runs = spark.createDataFrame(runsRdd, runSchema)
    // boundary merge over the (small) runs relation
    val w = Window.orderBy("pid", "run_idx")
    val acc = Window.orderBy("pid", "run_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = runs
      .withColumn("chg",
        when(lag(col("flag"), 1).over(w).isNull || lag(col("flag"), 1).over(w) =!= col("flag"), 1)
          .otherwise(0))
      .withColumn("grp", sum(col("chg")).over(acc))
      .groupBy("grp")
      .agg(first(col("flag")).as("flag"), sum(col("run_len")).as("streak_len"),
        min(col("start_ts")).as("start_ts"))
      .filter(col("flag"))
    merged.select(
      row_number().over(Window.orderBy("start_ts")).as("run_no"),
      col("streak_len"), col("start_ts"))
  }

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

  def longestIdle(prep: DataFrame): DataFrame = {
    val w = Window.orderBy("ts", "id")
    prep.select(col("ts"), col("id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_s",
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) / lit(1e6))
      .filter(col("gap_s").isNotNull)
      .orderBy(desc("gap_s"), asc("ts")).limit(1)
      .select(round(col("gap_s"), 6).as("gap_s"),
        col("prev_ts").as("before_gap"), col("ts").as("after_gap"))
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Streaks

/** Scale-proof for the round-5 streak trade (VERDICT r5 "what's wrong"
  * and SCALE.md): the Window-free two-pass streak path costs ~0.4 s more
  * than the single-task `Window.orderBy` form at sf0.1 locally — this
  * harness measures WHERE that inverts by timing both forms on
  * deterministic replications of the events table (each copy time-shifted
  * past the previous one, so run structure is preserved — a replica's
  * first run continues the prior copy's last run only if the flag
  * matches, exactly like one longer day of the same traffic).
  *
  * Forms timed, both reduced to the same tiny result (the argmax run per
  * class + the longest idle gap):
  *   - `window`: the pandas-shaped cumsum over `Window.orderBy(ts, id)` —
  *     every row through ONE task (streakRuns / the w01 semantic spec);
  *   - `parallel`: the two-pass boundary-fold (parallelRuns — w02/w03/w04's
  *     engine, O(partitions) driver data, no single-task stage).
  *
  * Usage: runMain graft.StreakBench [sfDir] [factors csv] [reps]
  * Prints one JSON line per (factor, form) with min-of-reps seconds.
  */
object StreakBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = (if (args.length > 1) args(1) else "1,10,30,100")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = Preprocess.preprocessEvents(Tables.events(spark, sfDir))
      .select("ts", "id", "status_type")

    // span of the base slice, +1s so copies never overlap
    val Array(minTs, maxTs) = base.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).as[(Long, Long)].collect().map(t => Array(t._1, t._2)).head
    val spanMicros = maxTs - minTs + 1000000L

    def replicated(k: Int): DataFrame =
      if (k == 1) base
      else base.crossJoin(spark.range(k).toDF("copy"))
        .select(
          timestamp_micros(unix_micros(col("ts")) + col("copy") * spanMicros).as("ts"),
          // ids re-keyed per copy so (ts, id) stays a total order
          (col("id") + col("copy") * 10000000000L).as("id"),
          col("status_type"))

    def windowForm(prep: DataFrame): Unit = {
      // the w01 semantic spec run relation, reduced to the per-class
      // argmax + the max idle gap — same outputs the parallel form yields
      val w = Window.orderBy("ts", "id")
      val acc = Window.orderBy("ts", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runs = prep
        .withColumn("chg", when(lag(col("status_type"), 1).over(w).isNull ||
          lag(col("status_type"), 1).over(w) =!= col("status_type"), 1).otherwise(0))
        .withColumn("grp", sum(col("chg")).over(acc))
        .groupBy("grp", "status_type")
        .agg(count(lit(1)).as("streak_len"), min(col("ts")).as("start_ts"))
      runs.orderBy(desc("streak_len"), asc("start_ts")).limit(2).collect()
      prep.select((unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap"))
        .agg(max(col("gap"))).collect()
    }

    def parallelForm(prep: DataFrame): Unit = {
      Streaks.longestStreaks(prep).collect()
      Streaks.longestIdle(prep).collect()
    }

    for (k <- factors) {
      val prep = replicated(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rows = prep.count() // materialize outside the timed region
      for ((form, body) <- Seq("window" -> (windowForm _), "parallel" -> (parallelForm _))) {
        body(prep) // warm codegen per (factor, form)
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime(); body(prep); (System.nanoTime() - t0) / 1e9
        }.min
        println(f"""{"bench":"streaks","rows":$rows,"factor":$k,"form":"$form","sec":${math.round(secs * 1000) / 1000.0}}""")
      }
      prep.unpersist(blocking = true)
    }
    spark.stop()
  }
}

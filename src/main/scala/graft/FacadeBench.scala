package graft

import org.apache.spark.sql.SparkSession

/** The engine half of the reference head-to-head (tools/ref_bench.py is
  * the pandas half): times the full user-facing facade — preprocess +
  * computeStats + plotData materialization + the hourly interactive
  * cache — over the same events rows. Usage:
  *   runMain graft.FacadeBench [sfDir] [reps]
  * Prints one JSON line with the best rep's stage timings (post-warmup,
  * so the comparison measures data-scale work, not JVM/codegen start —
  * the deployment shape of both sides is a warm long-running process).
  */
object FacadeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the facade's serving-tier collects (plot tables, hourly cache)
      // scale with the replicated time span; at 100M rows they pass the
      // 1g default cap. Unlimited here mirrors the pandas side, which
      // holds the same tables in-process with no cap at all.
      .config("spark.driver.maxResultSize", "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stage[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // Diagnostic stage filter (SPARK_GRAFT_FACADE_STAGES=stats,hourly_agg):
    // at 100 M rows the plot/hourly stages collect tens of millions of
    // serving rows into the driver heap, and the garbage they leave
    // stretches NEIGHBORING stages with GC pauses — running one stage in
    // isolation separates a stage's own cost from cross-stage GC fallout.
    val only = sys.env.get("SPARK_GRAFT_FACADE_STAGES")
      .map(_.split(",").map(_.trim).toSet)
    def want(name: String): Boolean = only.forall(_.contains(name))
    def runOnce(): Map[String, Double] = {
      var prep: org.apache.spark.sql.DataFrame = null
      val tPrep = stage {
        prep = Preprocess.preprocessEvents(Tables.events(spark, sfDir))
        prep.count() // materialize the scan+derive pass, like preprocess_df
      }
      val tStats = if (!want("stats")) 0.0 else stage(Engine.computeStats(prep))
      val tPlot = if (!want("plot_data")) 0.0
        else stage(Engine.plotData(prep).values.foreach(_.collect()))
      // The interactive-cache stage IS the serving tier since round 10:
      // materialize the persisted hourly rollup + top-client list
      // (ServingCache's constructor work) and render both default
      // figures through the BOUNDED capSeries path — collects are
      // O(~2k points × series), not O(span) (VERDICT r9 item 2; the
      // old full-view collect measured 130.6 s of the 337 s total at
      // 100 M rows — BASELINE.md keeps that row for comparison).
      val tHourly = if (!want("hourly_agg")) 0.0 else stage {
        val cache = new graft.serve.ServingCache(prep)
        try {
          cache.queriesFigure(None)
          cache.activityFigure(None)
        } finally cache.close()
      }
      Map("preprocess" -> tPrep, "stats" -> tStats, "plot_data" -> tPlot,
        "hourly_agg" -> tHourly,
        "total" -> (tPrep + tStats + tPlot + tHourly))
    }
    runOnce() // warmup: codegen + JIT
    val best = (0 until reps).map(_ => runOnce()).minBy(_("total"))
    val rows = Tables.events(spark, sfDir).count()
    val qs = Seq("preprocess", "stats", "plot_data", "hourly_agg", "total")
      .map(k => s""""$k":${math.round(best(k) * 1000) / 1000.0}""").mkString(",")
    println(s"""{"impl":"graft-spark","sf":"$sfDir","rows":$rows,"reps":$reps,"best":{$qs}}""")
    spark.stop()
  }
}

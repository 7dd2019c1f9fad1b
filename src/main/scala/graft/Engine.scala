package graft

import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{PlotData, Stats, Streaks}

/** The user-facing facade: everything a user of the reference dashboard
  * calls, re-expressed over Spark. `computeStats` assembles the
  * reference's scalar dictionary (stats.py:474-528, ~75 keys, same names,
  * same sentinels, same display formats, same quirks); `plotData` the
  * chart-table dictionary (plot.py:12-162).
  *
  * Execution model: `computeStats` persists `prep` for its own duration
  * (the 100 TB pattern — materialize the fact table once, let every
  * aggregate share it) and fuses the ~25 small collects into ≤ 12 Spark
  * jobs by UNIONING result frames that share a collect: the per-operator
  * plans are unchanged (each union branch is the same oracle-checked
  * operator), only the number of driver round-trips shrinks. Every job
  * returns 1..k rows; the fact table never reaches the driver.
  */
object Engine {

  /** Load + filter + derive: the reference's startup pipeline
    * (app.py:144-178) for parquet-exported FTL data. */
  def load(spark: SparkSession, paths: Seq[String], fromEpoch: Long, toEpoch: Long,
           ignoreDomains: Seq[String] = Nil): DataFrame = {
    val raw = sources.FtlIngest.readParquet(spark, paths, fromEpoch, toEpoch)
    Preprocess.regexAntiFilter(Preprocess.preprocessFtl(raw), "domain", ignoreDomains)
  }

  /** [[load]] straight from FTL SQLite `.db` files — the reference's
    * actual invocation shape (its CLI points at pihole-FTL.db,
    * db.py:16-30): native page-parallel read, then the same
    * preprocess + ignore-list pipeline. */
  def loadSqlite(spark: SparkSession, dbPaths: Seq[String], fromEpoch: Long, toEpoch: Long,
                 ignoreDomains: Seq[String] = Nil): DataFrame = {
    val raw = sources.FtlIngest.readSqlite(spark, dbPaths, fromEpoch, toEpoch)
    Preprocess.regexAntiFilter(Preprocess.preprocessFtl(raw), "domain", ignoreDomains)
  }

  /** The training-data side of the user-facing API: curate a document
    * corpus (exact dedup → verified near-dup clusters → quality floor →
    * deterministic sample) — see [[operators.Pipeline.curate]] for the
    * keep rules; the composed plan is oracle-checked end-to-end as
    * `p09_curated_corpus`. */
  def curateCorpus(docs: DataFrame, jaccardThreshold: Double = 0.8,
                   minQuality: Double = 0.3, sampleBuckets: Int = 256): DataFrame =
    operators.Pipeline.curate(docs, jaccardThreshold, minQuality, sampleBuckets)

  private val MinMaxFmt = DateTimeFormatter.ofPattern("d-M-yyyy (HH:mm)", Locale.ENGLISH)
  private val DayFmt = DateTimeFormatter.ofPattern("dd MMMM yyyy", Locale.ENGLISH)
  private val HourFmt = DateTimeFormatter.ofPattern("HH:mm", Locale.ENGLISH)
  private val GapSecFmt = DateTimeFormatter.ofPattern("dd-MMM yyyy HH:mm:ss", Locale.ENGLISH)

  private def utc(ts: java.sql.Timestamp) =
    ts.toInstant.atZone(java.time.ZoneId.of("UTC"))

  /** "%d-%b %Y %H:%M:%S.%f" truncated to 2 fraction digits
    * (stats.py:390-402: `[:-4]` on a 6-digit microsecond suffix). */
  private def gapFmt(ts: java.sql.Timestamp): String = {
    val z = utc(ts)
    f"${z.format(GapSecFmt)}.${z.getNano / 10000000}%02d"
  }

  /** The reference's full stats dictionary. Keys, sentinel values ("N/A",
    * 0, 0.0), tie-breaks (pandas idxmax = first in key order) and quirks
    * (max_idle_ms holding SECONDS, stats.py:404; slowest_avg_reply_time
    * unscaled, stats.py:465) are preserved exactly.
    *
    * `prep` is persisted for the duration of the call and released on
    * exit; job count is pinned ≤ 12 in EngineSpec. */
  /** The stats dict re-scans the source for each fused job rather than
    * persisting `prep`: measured head-to-head at 30 M rows, the cache
    * build + columnar-cache reads cost MORE than the ~11 parallel
    * pushdown parquet scans they replace (stats stage 63.4 s persisted vs
    * 54.1 s re-scanning; whole facade 112 s vs 90 s — the cache's memory
    * pressure also bled into the later plot/hourly stages). At cluster
    * scale the choice is forced: a full-prep persist of a 100 TB relation
    * is write-amplified spill, while re-scanning columnar storage with
    * pushdown is the shape every warehouse engine runs. Set
    * SPARK_GRAFT_STATS_PERSIST=1 to opt back in for small interactive
    * corpora where the source is remote/expensive rather than local
    * parquet. */
  def computeStats(prep: DataFrame): Map[String, Any] = {
    if (sys.env.getOrElse("SPARK_GRAFT_STATS_PERSIST", "0") == "1") {
      val cached = prep.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try computeStatsImpl(cached)
      finally cached.unpersist(blocking = false)
    } else computeStatsImpl(prep)
  }

  /** Null columns for the tall-union frames, typed so unionByName lines
    * up: s* string, cnt long, dval double. */
  private val nulls = (lit(null).cast("string"), lit(null).cast("bigint"), lit(null).cast("double"))

  private def computeStatsImpl(prep: DataFrame): Map[String, Any] = {
    val m = scala.collection.mutable.Map.empty[String, Any]
    val (nullS, nullL, nullD) = nulls

    // ---- one-pass global summary: totals + range + uniques + reply
    // (stats.py:10-52, 420-423, 446-455 — four reference scans, one job;
    // also the job that materializes the persisted prep) ----
    val g = Stats.globalSummary(prep).head()
    val total = g.getAs[Long]("total")
    m("n_data_points") = total
    m("total_queries") = total
    m("blocked_count") = g.getAs[Long]("blocked_cnt")
    m("allowed_count") = g.getAs[Long]("allowed_cnt")
    m("blocked_pct") = if (total > 0) g.getAs[Long]("blocked_cnt").toDouble / total * 100 else 0.0
    m("allowed_pct") = if (total > 0) g.getAs[Long]("allowed_cnt").toDouble / total * 100 else 0.0
    if (g.getAs[java.sql.Timestamp]("min_ts") != null) {
      m("min_date") = utc(g.getAs[java.sql.Timestamp]("min_ts")).format(MinMaxFmt)
      m("max_date") = utc(g.getAs[java.sql.Timestamp]("max_ts")).format(MinMaxFmt)
      m("oldest_data_point") = m("min_date")
      m("latest_data_point") = m("max_date")
      m("data_span_days") = g.getAs[Long]("span_days")
      m("data_span_str") =
        s"${g.getAs[Long]("span_days")}d,${g.getAs[Long]("span_hours")}h and ${g.getAs[Long]("span_minutes")}min"
    } else {
      Seq("min_date", "max_date", "oldest_data_point", "latest_data_point")
        .foreach(m(_) = "N/A")
      m("data_span_days") = 0L
      m("data_span_str") = "0d,0h and 0min"
    }

    // ---- ONE fused job for every small "argmax + misc" collect: top
    // clients (stats.py:56-72), persistent client (stats.py:119-139),
    // most diverse client (stats.py:425-440), slowest domain
    // (stats.py:457-467), inter-arrival gaps (stats.py:409-415). Each
    // union branch is the unchanged oracle-checked operator — fusing
    // changes the number of driver round-trips, not any value. ----
    val misc = Stats.topClient(prep)
      .select(lit("top_client").as("src"), col("client").as("s1"), nullS.as("s2"),
        nullL.as("cnt"), nullD.as("dval"))
      .unionByName(Stats.topClientByClass(prep)
        .select(concat(lit("top_client_"), col("status_type")).as("src"),
          col("client").as("s1"), nullS.as("s2"), nullL.as("cnt"), nullD.as("dval")))
      .unionByName(Stats.persistentClient(prep)
        .select(lit("persistent").as("src"), col("client").as("s1"),
          col("domain").as("s2"), col("cnt"), nullD.as("dval")))
      .unionByName(Stats.diverseClient(prep)
        .select(lit("diverse").as("src"), col("client").as("s1"), nullS.as("s2"),
          col("n_domains").as("cnt"), nullD.as("dval")))
      .unionByName(Stats.slowestDomainRaw(prep)
        .select(lit("slowest").as("src"), col("domain").as("s1"), nullS.as("s2"),
          nullL.as("cnt"), col("avg_reply").as("dval")))
      .unionByName(Stats.interArrivalRaw(prep)
        .select(concat(lit("gap_"), col("status_type")).as("src"), nullS.as("s1"),
          nullS.as("s2"), nullL.as("cnt"), col("mean_gap_s").as("dval")))
      .collect().groupBy(_.getString(0))
    def miscRow(src: String): Option[Row] = misc.get(src).map(_.head)

    m("top_client") = miscRow("top_client").map(_.getString(1)).getOrElse("N/A")
    m("top_allowed_client") = miscRow("top_client_Allowed").map(_.getString(1)).getOrElse("N/A")
    m("top_blocked_client") = miscRow("top_client_Blocked").map(_.getString(1)).getOrElse("N/A")

    // ---- top domains + quirky counts (stats.py:74-115): both classes in
    // one fused collect ----
    val domains = Stats.topDomainOfClass(prep, "Allowed")
      .select(lit("top_allowed").as("prefix"), col("domain"), col("all_cnt"), col("client"))
      .unionByName(Stats.topDomainOfClass(prep, "Blocked")
        .select(lit("top_blocked").as("prefix"), col("domain"), col("all_cnt"), col("client")))
      .collect().groupBy(_.getString(0))
    for (prefix <- Seq("top_allowed", "top_blocked"))
      domains.get(prefix).map(_.head) match {
        case Some(r) =>
          m(s"${prefix}_domain") = r.getString(1)
          m(s"${prefix}_domain_count") = r.getLong(2) // ALL statuses — quirk
          m(s"${prefix}_domain_client") = r.getString(3)
        case None =>
          m(s"${prefix}_domain") = "N/A"
          m(s"${prefix}_domain_count") = 0L
          m(s"${prefix}_domain_client") = "N/A"
      }

    // ---- most persistent client (stats.py:119-139; from the misc job) ----
    miscRow("persistent") match {
      case Some(r) =>
        m("most_persistent_client") = r.getString(1)
        m("blocked_domain") = r.getString(2)
        m("repeat_attempts") = r.getLong(3)
      case None =>
        m("most_persistent_client") = "N/A"; m("blocked_domain") = "N/A"
        m("repeat_attempts") = 0L
    }

    // ---- activity by date / hour / weekday (stats.py:148-205): one
    // fused job; daily rows carry ISO date strings, which sort
    // chronologically ----
    val cal = Stats.dailyCounts(prep)
      .select(lit("d").as("src"), col("date").cast("string").as("key"),
        col("cnt").as("c1"), col("blocked_cnt").as("c2"), col("allowed_cnt").as("c3"),
        nullD.as("avg"))
      .unionByName(Stats.hourlyCounts(prep)
        .select(lit("h").as("src"), col("hour").cast("string").as("key"),
          col("cnt").as("c1"), lit(0L).as("c2"), lit(0L).as("c3"), nullD.as("avg")))
      .unionByName(Stats.weekdayAvgRaw(prep)
        .select(lit("w").as("src"), col("day_name").as("key"),
          nullL.as("c1"), nullL.as("c2"), nullL.as("c3"), col("avg_cnt").as("avg")))
      .collect().groupBy(_.getString(0))
    val daily = cal.getOrElse("d", Array.empty[Row]).sortBy(_.getString(1))
    // pandas idxmax/idxmin take the FIRST max/min in date order; the
    // blocked/allowed groupbys only contain dates with >0 such rows
    def argDateNonZero(measure: Row => Long, most: Boolean): String = {
      val rows = daily.filter(measure(_) > 0)
      if (rows.isEmpty) "N/A"
      else {
        val vals = rows.map(measure)
        val target = if (most) vals.max else vals.min
        java.time.LocalDate.parse(rows(vals.indexOf(target)).getString(1)).format(DayFmt)
      }
    }
    m("date_most_queries") = argDateNonZero(_.getLong(2), most = true)
    m("date_least_queries") = argDateNonZero(_.getLong(2), most = false)
    m("date_most_blocked") = argDateNonZero(_.getLong(3), most = true)
    m("date_least_blocked") = argDateNonZero(_.getLong(3), most = false)
    m("date_most_allowed") = argDateNonZero(_.getLong(4), most = true)
    m("date_least_allowed") = argDateNonZero(_.getLong(4), most = false)

    val hourly = cal.getOrElse("h", Array.empty[Row]).sortBy(_.getString(1).toInt)
    if (hourly.nonEmpty) {
      val vals = hourly.map(_.getLong(2))
      m("most_active_hour") = hourly(vals.indexOf(vals.max)).getString(1).toInt
      m("least_active_hour") = hourly(vals.indexOf(vals.min)).getString(1).toInt
      m("avg_queries_most") = vals.max
      m("avg_queries_least") = vals.min
    } else {
      m("most_active_hour") = 0; m("least_active_hour") = 0
      m("avg_queries_most") = 0L; m("avg_queries_least") = 0L
    }

    // RAW means — the reference argmaxes and int()-truncates unrounded
    // values (stats.py:203-205); rounding first could flip both
    val weekly = cal.getOrElse("w", Array.empty[Row])
      .sortBy(_.getString(1)) // day_name-ascending (pandas index order)
    if (weekly.nonEmpty) {
      val vals = weekly.map(_.getDouble(5))
      m("most_active_day") = weekly(vals.indexOf(vals.max)).getString(1)
      m("most_active_avg") = vals.max.toLong
      m("least_active_day") = weekly(vals.indexOf(vals.min)).getString(1)
      m("least_active_avg") = vals.min.toLong
    } else {
      m("most_active_day") = "N/A"; m("least_active_day") = "N/A"
      m("most_active_avg") = 0L; m("least_active_avg") = 0L
    }

    // ---- day/night block (stats.py:211-321): two fused jobs — one for
    // the client-side tables (totals + top client + per-class top
    // client), one for both classes' domain blocks ----
    val dnClients = Stats.dayNightTotals(prep)
      .select(lit("tot").as("src"), col("day_period").as("period"),
        nullS.as("cls"), nullS.as("client"), col("cnt"))
      .unionByName(Stats.dayNightTopClient(prep)
        .select(lit("top").as("src"), col("day_period").as("period"),
          nullS.as("cls"), col("client"), nullL.as("cnt")))
      .unionByName(dayNightTopClientByClass(prep)
        .select(lit("bycls").as("src"), col("day_period").as("period"),
          col("status_type").as("cls"), col("client"), nullL.as("cnt")))
      .collect().groupBy(_.getString(0))
    val dnTotals = dnClients.getOrElse("tot", Array.empty[Row])
      .map(r => r.getString(1) -> r.getLong(4)).toMap
    val dnClient = dnClients.getOrElse("top", Array.empty[Row])
      .map(r => r.getString(1) -> r.getString(3)).toMap
    val dnClassClient = dnClients.getOrElse("bycls", Array.empty[Row])
      .map(r => (r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    val dnDomains = dayNightDomainBlock(prep, "Allowed")
      .select(lit("Allowed").as("cls"), col("day_period"), col("domain"),
        col("all_cnt"), col("client"))
      .unionByName(dayNightDomainBlock(prep, "Blocked")
        .select(lit("Blocked").as("cls"), col("day_period"), col("domain"),
          col("all_cnt"), col("client")))
      .collect().groupBy(_.getString(0))
    def dnDomain(statusType: String) = dnDomains.getOrElse(statusType, Array.empty[Row])
      .map(r => r.getString(1) -> ((r.getString(2), r.getLong(3), r.getString(4)))).toMap
    val dnAllowedDom = dnDomain("Allowed")
    val dnBlockedDom = dnDomain("Blocked")
    for ((period, prefix) <- Seq("Day" -> "day", "Night" -> "night")) {
      m(s"${prefix}_total_queries") = dnTotals.getOrElse(period, 0L)
      m(s"${prefix}_top_client") = dnClient.getOrElse(period, "N/A")
      m(s"${prefix}_top_allowed_client") = dnClassClient.getOrElse((period, "Allowed"), "N/A")
      m(s"${prefix}_top_blocked_client") = dnClassClient.getOrElse((period, "Blocked"), "N/A")
      for ((cls, cname) <- Seq("Allowed" -> "allowed", "Blocked" -> "blocked")) {
        val dom = (if (cls == "Allowed") dnAllowedDom else dnBlockedDom).get(period)
        m(s"${prefix}_top_${cname}_domain") = dom.map(_._1).getOrElse("N/A")
        m(s"${prefix}_top_${cname}_domain_count") = dom.map(_._2).getOrElse(0L)
        m(s"${prefix}_top_${cname}_domain_client") = dom.map(_._3).getOrElse("N/A")
      }
    }

    // ---- uniques (stats.py:420-440; counts from the one-pass summary,
    // diverse client from the misc job) ----
    m("unique_domains") = g.getAs[Long]("n_domains")
    m("unique_clients") = g.getAs[Long]("n_clients")
    miscRow("diverse") match {
      case Some(r) =>
        m("most_diverse_client") = r.getString(1)
        m("unique_domains_count") = r.getLong(3)
      case None =>
        m("most_diverse_client") = "N/A"; m("unique_domains_count") = 0L
    }

    // ---- reply times (stats.py:444-467; ms stats from the summary,
    // slowest domain from the misc job) ----
    m("avg_reply_time") = g.getAs[Double]("avg_reply_ms")
    m("max_reply_time") = g.getAs[Double]("max_reply_ms")
    m("min_reply_time") = g.getAs[Double]("min_reply_ms")
    // slowest_avg_reply_time is UNSCALED seconds in the reference — quirk
    miscRow("slowest") match {
      case Some(r) =>
        m("slowest_domain") = r.getString(1)
        m("slowest_avg_reply_time") = r.getDouble(4)
      case None =>
        m("slowest_domain") = "N/A"; m("slowest_avg_reply_time") = 0.0
    }

    // ---- streaks + idle gaps (stats.py:323-365, 369-415) — the fused
    // form: one range shuffle feeds both order-dependent stats, instead
    // of each operator sorting the full relation separately (the two
    // standalone sorts were the largest slice of this method at 100 M
    // rows) ----
    val (streaksDf, idleDf) = Streaks.longestStreaksWithIdle(prep)
    val streaks = streaksDf.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getTimestamp(2)))).toMap
    for ((cls, cname) <- Seq("Allowed" -> "allowed", "Blocked" -> "blocked"))
      streaks.get(cls) match {
        case Some((len, start)) =>
          m(s"longest_streak_length_$cname") = len
          m(s"streak_date_$cname") = utc(start).format(DayFmt)
          m(s"streak_hour_$cname") = utc(start).format(HourFmt)
        case None =>
          m(s"longest_streak_length_$cname") = 0L
          m(s"streak_date_$cname") = "N/A"
          m(s"streak_hour_$cname") = "N/A"
      }
    idleDf.collect().headOption match {
      case Some(r) =>
        m("max_idle_ms") = r.getDouble(0) // seconds, reference-faithful misnomer
        m("before_gap") = gapFmt(r.getTimestamp(1))
        m("after_gap") = gapFmt(r.getTimestamp(2))
      case None =>
        m("max_idle_ms") = null; m("before_gap") = null; m("after_gap") = null
    }
    m("avg_time_between_allowed") =
      miscRow("gap_Allowed").map(_.getDouble(4): Any).orNull
    m("avg_time_between_blocked") =
      miscRow("gap_Blocked").map(_.getDouble(4): Any).orNull

    m.toMap
  }

  /** Per-period per-class top client — one window pass
    * (reference: stats.py:222-233, 270-281 does 4 filtered re-scans). */
  private def dayNightTopClientByClass(prep: DataFrame): DataFrame = {
    val w = Window.partitionBy("day_period", "status_type").orderBy(desc("cnt"), asc("client"))
    prep.filter(col("status_type").isin("Allowed", "Blocked"))
      .groupBy("day_period", "status_type", "client").agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("day_period", "status_type", "client")
  }

  /** Per-period top domain of a class with the quirky all-status count
    * AND its top in-class client (stats.py:236-265 semantics). */
  private def dayNightDomainBlock(prep: DataFrame, statusType: String): DataFrame = {
    val top = Stats.dayNightTopDomain(prep, statusType) // day_period, domain, class_cnt, all_cnt
      .select("day_period", "domain", "all_cnt")
    val w = Window.partitionBy("day_period").orderBy(desc("ccnt"), asc("client"))
    val topClient = prep.filter(col("status_type") === statusType)
      .join(broadcast(top.select("day_period", "domain")), Seq("day_period", "domain"))
      .groupBy("day_period", "domain", "client").agg(count(lit(1)).as("ccnt"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("day_period", "domain", "client")
    top.join(topClient, Seq("day_period", "domain"))
      .select("day_period", "domain", "all_cnt", "client")
  }

  /** The reference's plot-data dictionary (plot.py:12-162): named small
    * aggregate tables, all lazy DataFrames. */
  def plotData(prep: DataFrame, nClients: Int = 10, nDomains: Int = 10): Map[String, DataFrame] = {
    val nScatter = math.min(nClients, nDomains)
    Map(
      "top_clients_stacked" -> PlotData.stackedClientBar(prep, nClients),
      "blocked_df" -> PlotData.topDomainsOfClass(prep, "Blocked", nDomains),
      "allowed_df" -> PlotData.topDomainsOfClass(prep, "Allowed", nDomains),
      "reply_time_df" -> Stats.replyByDate(prep),
      "client_domain_scatter_df" -> PlotData.clientDomainScatter(prep, nScatter, nScatter),
      "day_hour_heatmap" -> PlotData.dayHourHeatmapWeekdays(prep, None),
      "blocked_day_hour_heatmap" -> PlotData.dayHourHeatmapWeekdays(prep, Some("Blocked")),
      "allowed_day_hour_heatmap" -> PlotData.dayHourHeatmapWeekdays(prep, Some("Allowed")))
  }

  /** plot.py:85 client_list — distinct clients. */
  def clientList(prep: DataFrame): Seq[String] =
    prep.select("client").distinct().orderBy("client").collect().map(_.getString(0)).toSeq

  /** The interactive cache (process.py:86-113): hourly view + top-client
    * list; callers cache/materialize and re-slice (app.py:1107-1136). */
  def hourlyAggregatedData(prep: DataFrame, nClients: Int = 10): (DataFrame, DataFrame) =
    (PlotData.hourlyView(prep), PlotData.topClients(prep, nClients))
}

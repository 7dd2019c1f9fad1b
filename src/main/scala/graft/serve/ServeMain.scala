package graft.serve

import org.apache.spark.sql.SparkSession

/** CLI entry for the serving loop — flag-for-flag the reference's
  * entrypoint (app.py:40-91: `--days --db_path --port --n_clients
  * --n_domains --timezone --ignore_domains`, each with a
  * `PIHOLE_LT_STATS_*` env fallback). Point it at an FTL SQLite `.db`
  * (read natively, WAL replayed; comma-separate multiple files for the
  * reference's multi-DB union) or a testdata dir (parquet `events/`),
  * and it computes the hourly rollup once, then serves the interactive
  * dashboard from the cache. `POST /reload` re-reads the source (the
  * reference's reload button); `GET /dashboard` renders the full static
  * chart set.
  *
  * Back-compat positional form: `ServeMain <source> [port]`.
  */
object ServeMain {

  final case class Opts(source: String, port: Int, days: Int,
                        nClients: Int, nDomains: Int, timezone: String,
                        ignoreDomains: Seq[String])

  /** argparse-shaped: `--flag value` pairs with env-var defaults
    * (app.py:43-91); bare positionals keep the old `<source> [port]`
    * form working. */
  private[serve] def parseOpts(args: Array[String],
                               env: Map[String, String]): Opts = {
    def envOr(key: String, dflt: String) = env.getOrElse("PIHOLE_LT_STATS_" + key, dflt)
    var opts = Map.empty[String, String]
    var positional = Vector.empty[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        require(i + 1 < args.length, s"missing value for $a")
        opts += (a.drop(2).replace('-', '_') -> args(i + 1)); i += 2
      } else { positional :+= a; i += 1 }
    }
    val source = opts.getOrElse("db_path",
      positional.headOption.getOrElse(envOr("DB_PATH", "pihole-FTL.db")))
    val port = opts.get("port").orElse(positional.lift(1))
      .getOrElse(envOr("PORT", "9292")).toInt
    Opts(
      source = source,
      port = port,
      days = opts.getOrElse("days", envOr("DAYS", "31")).toInt,
      nClients = opts.getOrElse("n_clients", envOr("NCLIENTS", "10")).toInt,
      nDomains = opts.getOrElse("n_domains", envOr("NDOMAINS", "10")).toInt,
      timezone = opts.getOrElse("timezone", envOr("TIMEZONE", "UTC")),
      ignoreDomains = opts.getOrElse("ignore_domains", envOr("IGNORE_DOMAINS", ""))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
  }

  def main(args: Array[String]): Unit = {
    val o = parseOpts(args, sys.env)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // rebuilt per reload: a fresh read re-lists the source files, so the
    // reload button picks up rows written since the last build
    def mkPrep() =
      if (o.source.endsWith(".db")) {
        // the reference's window: last `days` display-TZ midnights
        // (db.py:84-102 via timeRangeEpochs), end-exclusive
        val (from, to) = graft.sources.FtlIngest.timeRangeEpochs(
          None, None, o.days, o.timezone, java.time.Instant.now())
        graft.Engine.loadSqlite(spark, o.source.split(",").map(_.trim).toSeq,
          from, to, o.ignoreDomains)
      } else {
        // demo/testdata parquet: full range unless --days was explicit
        // (the fixture's 2024 timestamps sit outside any recent window)
        graft.Preprocess.preprocessEvents(graft.Tables.events(spark, o.source))
      }
    val prep = mkPrep()
    val cache = new ServingCache(prep, o.nClients)
    val server = new StatsServer(cache, o.port,
      rebuild = () => new ServingCache(mkPrep(), o.nClients),
      dashboardHtml = () => graft.figures.Figures.dashboard(prep, o.nClients, o.nDomains))
    println(s"serving on http://127.0.0.1:${server.boundPort}/ " +
      s"(${cache.topClients.size} top clients cached; Ctrl-C to stop)")
    Thread.currentThread().join() // serve until killed
  }
}

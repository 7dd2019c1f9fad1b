package graft.serve

import org.apache.spark.sql.SparkSession

/** CLI entry for the serving loop: point it at an events source and it
  * computes the hourly rollup once, then serves the interactive dashboard
  * from the cache (the reference's `phlts --db-path ... --port ...` shape,
  * app.py `run()`).
  *
  * Usage: `runMain graft.serve.ServeMain <source> [port]`
  *   - `<source>` a testdata dir (parquet `events/`) or an FTL SQLite
  *     `.db` file (read natively, WAL replayed);
  *   - `[port]` default 8650; 0 = ephemeral.
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ServeMain <sfDir|ftl.db> [port]")
    val port = if (args.length > 1) args(1).toInt else 8650
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
      if (args(0).endsWith(".db"))
        graft.Engine.loadSqlite(spark, Seq(args(0)), 0L, Long.MaxValue)
      else
        graft.Preprocess.preprocessEvents(graft.Tables.events(spark, args(0)))
    val cache = new ServingCache(mkPrep())
    val server = new StatsServer(cache, port, rebuild = () => new ServingCache(mkPrep()))
    println(s"serving on http://127.0.0.1:${server.boundPort}/ " +
      s"(${cache.topClients.size} top clients cached; Ctrl-C to stop)")
    Thread.currentThread().join() // serve until killed
  }
}

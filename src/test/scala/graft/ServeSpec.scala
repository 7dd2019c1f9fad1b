package graft

import java.net.{HttpURLConnection, URI}

import scala.io.Source

import org.apache.spark.sql.functions._

import graft.serve.{ServingCache, StatsServer}

/** The interactive serving loop: the hourly rollup is computed once, and
  * every client-filter interaction re-slices the CACHE — never the source
  * (reference callback semantics, app.py:1107-1136). The load-bearing
  * assertion is the plan shape: a re-slice must scan the in-memory
  * relation and must NOT contain a file scan. */
class ServeSpec extends SparkSpec {

  private lazy val prep =
    Preprocess.preprocessEvents(Tables.events(spark, "/root/testdata/sf0.001"))

  private def fetch(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    try {
      val code = conn.getResponseCode
      val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      (code, body)
    } finally conn.disconnect()
  }

  test("a client-filter re-slice reads the cache, not the source") {
    val cache = new ServingCache(prep)
    try {
      val someClient = cache.topClients.head
      for (slice <- Seq(cache.queriesOverTime(None),
        cache.queriesOverTime(Some(someClient)),
        cache.clientActivity(None),
        cache.clientActivity(Some(someClient)))) {
        // typed leaf check, not string matching: InMemoryRelation.toString
        // embeds the plan that BUILT the cache (which mentions the file
        // scan), so "no FileScan substring" would be vacuously wrong —
        // what matters is that every leaf the slice actually reads is the
        // cached relation, and none is a file source
        val leaves = slice.queryExecution.optimizedPlan.collectLeaves()
        assert(leaves.nonEmpty && leaves.forall(
          _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
          s"every slice leaf must be the cached rollup, got: " +
            leaves.map(_.getClass.getSimpleName).mkString(", "))
      }
    } finally cache.close()
  }

  test("re-slices agree with direct computation from the full relation") {
    val cache = new ServingCache(prep)
    try {
      val c = cache.topClients.head
      val fromCache = rowsOf(cache.queriesOverTime(Some(c)))
      val direct = rowsOf(prep.filter(col("client") === c)
        .groupBy(date_trunc("HOUR", col("ts")).as("ts_hour"), col("status_type"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("ts_hour", "status_type"))
      assert(fromCache == direct)
      // all-clients branch = the oracle-checked viewByStatus relation
      assert(rowsOf(cache.queriesOverTime(None)) ==
        rowsOf(operators.PlotData.viewByStatus(prep)))
    } finally cache.close()
  }

  test("serving collects are bounded: a 10-year span rolls up to <= maxPoints+1 per series") {
    // one event per hour for 10 years — the span-proportional regime
    // VERDICT r9 item 2 flagged (87,600 hourly buckets; the old slice
    // collected every one). capSeries must roll the bucket up (here:
    // weeks, 523) so the figure collect is O(pixels), not O(span).
    val n = 10 * 365 * 24
    val syn = spark.range(n).select(
      timestamp_seconds(lit(1300000000L) + col("id") * 3600).as("ts"),
      lit("Allowed").as("status_type"), lit("10.0.0.1").as("client"))
    val cache = new ServingCache(syn)
    try {
      val q = cache.queriesOverTime(None).collect()
      assert(q.length <= 2049, s"queries slice must be bounded, got ${q.length}")
      assert(q.length > 100, "rollup should keep real resolution, not collapse")
      // the downsample is volume-faithful: bucket sums conserve the total
      assert(q.map(_.getLong(2)).sum == n)
      val a = cache.clientActivity(None).collect()
      assert(a.length <= 2049, s"activity slice must be bounded, got ${a.length}")
      assert(a.map(_.getLong(2)).sum == n)
      // the anomaly figure's two collect legs are bounded too: volume
      // series through capSeries (3,650 daily points -> weekly), rings
      // only from flagged rows (none in this flat series)
      val (series, rings) = graft.figures.Figures.boundedAnomalySeries(
        cache.dailyAnomalies(None))
      series.foreach { case (st, pts) =>
        assert(pts.size <= 2049, s"series $st must be bounded, got ${pts.size}")
      }
      assert(series.map(_._2.map(_._2).sum).sum == n.toDouble)
      assert(rings.isEmpty, "flat series must flag nothing")
      // below the threshold nothing changes — the sf0.001 cache slices
      // stay hourly (pinned by the "re-slices agree" test above, whose
      // direct side computes the raw hourly groupBy)
    } finally cache.close()
  }

  test("anomaly slice: cache-only leaves, equal to the oracle-checked w09 relation") {
    val cache = new ServingCache(prep)
    try {
      val slice = cache.dailyAnomalies(None)
      val leaves = slice.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]),
        "anomaly slice must read only the cached rollup")
      // re-summing the hourly rollup to days = direct daily counts, so
      // the cache-side scoring must reproduce w09 exactly
      assert(rowsOf(slice) == rowsOf(operators.Stats.dailyAnomalies(prep)))
      // the figure endpoint renders from the same slice
      val svg = cache.anomaliesFigure(None)
      assert(svg.contains("<svg") && svg.contains("Daily volume"))
    } finally cache.close()
  }

  test("HTTP loop serves the dashboard and re-renders on a client filter") {
    val cache = new ServingCache(prep)
    val server = new StatsServer(cache, port = 0)
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"

      val (cCode, clientsJson) = fetch(s"$base/clients")
      assert(cCode == 200 && clientsJson.startsWith("[\""))
      val client = cache.topClients.head

      val (qCode, allSvg) = fetch(s"$base/queries")
      assert(qCode == 200 && allSvg.contains("<svg"))
      assert(allSvg.contains("DNS Queries Over Time for All Clients"))

      val enc = java.net.URLEncoder.encode(client, "UTF-8")
      val (fCode, oneSvg) = fetch(s"$base/queries?client=$enc")
      assert(fCode == 200 && oneSvg.contains(s"DNS Queries Over Time for $client"))
      assert(oneSvg != allSvg, "the filter must change the figure")

      val (aCode, actSvg) = fetch(s"$base/activity?client=$enc")
      assert(aCode == 200 && actSvg.contains(s"Activity for $client"))

      val (pCode, page) = fetch(s"$base/?client=$enc")
      assert(pCode == 200 && page.startsWith("<!DOCTYPE html>"))
      assert(page.contains("<select") && page.contains("<svg"))
    } finally { server.close(); cache.close() }
  }

  test("/dashboard serves the full static chart page when a renderer is wired") {
    val cache = new ServingCache(prep)
    val server = new StatsServer(cache, port = 0,
      dashboardHtml = c => figures.Figures.dashboard(c.prep, 5, 5))
    try {
      val (code, html) = fetch(s"http://127.0.0.1:${server.boundPort}/dashboard")
      assert(code == 200 && html.startsWith("<!DOCTYPE html>"))
      assert(html.contains("Client activity over time (top 5 clients, hourly)"))
      assert(html.contains("Activity heatmap — all queries"))
    } finally { server.close(); cache.close() }
  }

  test("reload rebuilds the cache through the factory (reference reload button)") {
    // the rebuild factory narrows the relation, so a successful reload is
    // observable: the top-client list shrinks to the filtered population
    val first = new ServingCache(prep)
    val dropped = first.topClients.head
    var fresh: ServingCache = null
    val server = new StatsServer(first, port = 0,
      rebuild = (_, _) => {
        fresh = new ServingCache(prep.filter(col("client") =!= dropped)); fresh
      })
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val before = fetch(s"$base/clients")._2

      val conn = URI.create(s"$base/reload").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      assert(conn.getResponseCode == 200)
      conn.disconnect()

      val after = fetch(s"$base/clients")._2
      assert(before.contains("\"" + dropped + "\""))
      assert(!after.contains("\"" + dropped + "\""), "reload must swap the cache")
    } finally { server.close(); if (fresh != null) fresh.close() }
  }

  test("date-range reload re-slices the cache to the picker window, end-exclusive +1 day") {
    // the reference's date-picker reload (app.py:1091-1102 → db.py:84-102):
    // the factory receives the parsed display-TZ dates and rebuilds the
    // cache for [start 00:00, end+1day 00:00)
    val first = new ServingCache(prep)
    var fresh: ServingCache = null
    val server = new StatsServer(first, port = 0,
      rebuild = (s, e) => {
        val (from, to) = sources.FtlIngest.timeRangeEpochs(
          s, e, 31, "UTC", java.time.Instant.now())
        fresh = new ServingCache(prep.filter(
          col("ts") >= timestamp_seconds(lit(from)) &&
          col("ts") < timestamp_seconds(lit(to))))
        fresh
      })
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val conn = URI.create(s"$base/reload?start=2024-01-10&end=2024-01-12").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      // row bounds of the new cache sit inside [Jan 10 00:00, Jan 13 00:00)
      val b = fresh.hourly.agg(min("ts_hour"), max("ts_hour")).head
      assert(!b.getTimestamp(0).before(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")), b)
      assert(b.getTimestamp(1).before(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")), b)
      // end date itself is INCLUDED (the +1-day end-exclusive semantics)
      assert(fresh.hourly.filter(
        col("ts_hour") >= lit(java.sql.Timestamp.valueOf("2024-01-12 00:00:00"))).count() > 0)
      // and interactions on the reloaded cache are still cache-only
      val leaves = fresh.queriesOverTime(None).queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(
        _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryRelation]))
    } finally { server.close(); if (fresh != null) fresh.close() }
  }

  test("the served page renders the date picker and its form drives /reload") {
    // UI parity with the reference's date-picker (app.py:987-1000): the
    // index page carries two date inputs + a reload button whose script
    // submits to /reload?start=&end= — the spec drives the reload through
    // the endpoint the HTML encodes and asserts the cache swapped to the
    // narrowed window
    val first = new ServingCache(prep)
    var fresh: ServingCache = null
    val server = new StatsServer(first, port = 0,
      rebuild = (s, e) => {
        val (from, to) = sources.FtlIngest.timeRangeEpochs(
          s, e, 31, "UTC", java.time.Instant.now())
        fresh = new ServingCache(prep.filter(
          col("ts") >= timestamp_seconds(lit(from)) &&
          col("ts") < timestamp_seconds(lit(to))))
        fresh
      })
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val html = fetch(s"$base/")._2
      // the picker elements are rendered...
      assert(html.contains("""<input type="date" name="start">"""), "start date input missing")
      assert(html.contains("""<input type="date" name="end">"""), "end date input missing")
      assert(html.contains("Reload range"), "reload button missing")
      // ...and the endpoint the form script encodes is extractable
      val m = """fetch\('(/reload\?start=)'""".r.findFirstMatchIn(html)
      assert(m.isDefined, "form script must submit to /reload?start=...")
      val url = s"$base${m.get.group(1)}2024-01-10&end=2024-01-12"
      val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      val b = fresh.hourly.agg(min("ts_hour"), max("ts_hour")).head
      assert(!b.getTimestamp(0).before(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")), b)
      assert(b.getTimestamp(1).before(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")), b)
    } finally { server.close(); if (fresh != null) fresh.close() }
  }

  test("no rebuild factory -> no date picker rendered (reload would 409)") {
    val cache = new ServingCache(prep)
    val server = new StatsServer(cache, port = 0)
    try {
      val html = fetch(s"http://127.0.0.1:${server.boundPort}/")._2
      assert(!html.contains("""type="date""""), "picker must not render without a factory")
    } finally server.close()
  }

  test("a half-open or malformed date range is refused with 400; cache keeps serving") {
    val cache = new ServingCache(prep)
    val server = new StatsServer(cache, port = 0, rebuild = (_, _) => fail("must not rebuild"))
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      for (q <- Seq("?start=2024-01-10", "?end=2024-01-12", "?start=bogus&end=2024-01-12")) {
        val conn = URI.create(s"$base/reload$q").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod("POST")
        assert(conn.getResponseCode == 400, q)
        conn.disconnect()
      }
      assert(fetch(s"$base/clients")._1 == 200)
    } finally { server.close(); cache.close() }
  }

  test("/dashboard reflects a reload: the static page renders the CURRENT cache's relation") {
    val first = new ServingCache(prep)
    var fresh: ServingCache = null
    val server = new StatsServer(first, port = 0,
      rebuild = (s, e) => {
        val (from, to) = sources.FtlIngest.timeRangeEpochs(
          s, e, 31, "UTC", java.time.Instant.now())
        fresh = new ServingCache(prep.filter(
          col("ts") >= timestamp_seconds(lit(from)) &&
          col("ts") < timestamp_seconds(lit(to))))
        fresh
      },
      dashboardHtml = c => figures.Figures.dashboard(c.prep, 5, 5))
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val before = fetch(s"$base/dashboard")._2
      val conn = URI.create(s"$base/reload?start=2024-01-10&end=2024-01-12").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      assert(conn.getResponseCode == 200)
      conn.disconnect()
      val after = fetch(s"$base/dashboard")._2
      assert(before != after, "dashboard must re-render from the reloaded cache")
    } finally { server.close(); if (fresh != null) fresh.close() }
  }

  test("reload without a factory is refused, cache keeps serving") {
    val cache = new ServingCache(prep)
    val server = new StatsServer(cache, port = 0)
    try {
      val base = s"http://127.0.0.1:${server.boundPort}"
      val conn = URI.create(s"$base/reload").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      assert(conn.getResponseCode == 409)
      conn.disconnect()
      assert(fetch(s"$base/clients")._1 == 200)
    } finally { server.close(); cache.close() }
  }
}

package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.figures.Figures

/** The reference's interactive serving loop, Spark-side: the hourly
  * rollup + top-client list are computed ONCE per load and cached; every
  * client-filter interaction re-slices the CACHED relation — the source
  * files are never touched again (reference: `PHLTS_CALLBACK_DATA` built
  * once in process.py:86-113, re-sliced per callback in app.py:1107-1136
  * and plot.py:175-187, 282-294).
  *
  * At 100 TB the same split holds: the expensive part (scan + hourly
  * groupBy) is one batch job whose OUTPUT is small — |hours| × |status|
  * × |clients| rows — so the interactive tier caches that rollup (here:
  * Spark `persist`; in production: write it to a serving store) and
  * every dashboard interaction costs milliseconds over the rollup, not a
  * rescan of the corpus.
  */
final class ServingCache(val prep: DataFrame, nClients: Int = 10) extends AutoCloseable {

  /** The cached hourly rollup (ts_hour, status_type, client, cnt) —
    * materialized eagerly so the first interaction doesn't pay the scan. */
  val hourly: DataFrame = {
    val h = graft.operators.PlotData.hourlyView(prep)
      .persist(StorageLevel.MEMORY_AND_DISK)
    h.count() // materialize NOW: after this, the source is never re-read
    h
  }

  /** Top clients by total queries (process.py:107-108) — collected once;
    * |nClients| strings of driver data. */
  val topClients: Seq[String] =
    graft.operators.PlotData.topClients(prep, nClients)
      .collect().map(_.getString(0)).toSeq

  /** Queries-over-time slice (plot.py:175-187): per-client when a filter
    * is set, summed over all clients otherwise. Both branches read ONLY
    * [[hourly]] (pinned in ServeSpec: the plan scans the in-memory
    * relation, no file source). Since round 10 the slice is BOUNDED:
    * [[graft.operators.PlotData.capSeries]] rolls the time bucket up
    * to whatever calendar unit keeps each series ≤ ~2k points, so the
    * figure collect is O(pixels), not O(span) — below the threshold
    * the hourly buckets pass through unchanged (ServeSpec pins both
    * the bound at a 10-year span and hour-equality below it). */
  def queriesOverTime(client: Option[String]): DataFrame = {
    val base = client.fold(hourly)(c => hourly.filter(col("client") === c))
    graft.operators.PlotData.capSeries(
      base.groupBy("ts_hour", "status_type").agg(sum("cnt").as("cnt")),
      "ts_hour", Seq("status_type"))
  }

  /** Client-activity slice (plot.py:282-294): the filtered client, or the
    * cached top-`nClients` list when no filter is set. Bounded like
    * [[queriesOverTime]]. */
  def clientActivity(client: Option[String]): DataFrame = {
    val base = client.fold(hourly.filter(col("client").isin(topClients: _*)))(
      c => hourly.filter(col("client") === c))
    graft.operators.PlotData.capSeries(
      base.groupBy("ts_hour", "client").agg(sum("cnt").as("cnt")),
      "ts_hour", Seq("client"))
  }

  /** SVG figure for the queries-over-time callback (app.py:1107-1117). */
  def queriesFigure(client: Option[String]): String = {
    val rows = queriesOverTime(client).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getLong(2).toDouble))
    val title = client.fold("DNS Queries Over Time for All Clients")(c =>
      s"DNS Queries Over Time for $c")
    Figures.lineChart(title, rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (st, rs) => st -> rs.map(r => (r._2, r._3)).toSeq })
  }

  /** SVG figure for the client-activity callback (app.py:1120-1136). */
  def activityFigure(client: Option[String]): String = {
    val rows = clientActivity(client).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).getTime, r.getLong(2).toDouble))
    val title = client.fold(s"Activity for top ${topClients.size} clients")(c =>
      s"Activity for $c")
    Figures.lineChart(title, rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cl, rs) => cl -> rs.map(r => (r._2, r._3)).toSeq })
  }

  /** Daily anomaly slice computed FROM THE CACHE: the hourly rollup
    * re-summed to days (equal to direct daily counts by construction),
    * then the w09 trailing z-score — the fact source is never re-read,
    * same invariant as every other slice. */
  def dailyAnomalies(client: Option[String]): DataFrame = {
    val base = client.fold(hourly)(c => hourly.filter(col("client") === c))
    val daily = base
      .groupBy(col("status_type"), to_date(col("ts_hour")).as("date"))
      .agg(sum("cnt").cast("double").as("cnt"))
    graft.operators.Stats.dailyAnomaliesFrom(daily)
  }

  /** SVG figure: daily volume with anomaly rings (the w09 chart, per
    * client filter). */
  def anomaliesFigure(client: Option[String]): String = {
    val (series, rings) = Figures.boundedAnomalySeries(dailyAnomalies(client))
    val title = client.fold("Daily volume with anomaly flags")(c =>
      s"Daily volume with anomaly flags for $c")
    Figures.lineChart(title, series, markers = rings)
  }

  override def close(): Unit = hourly.unpersist(blocking = false)
}

/** Minimal HTTP server over a [[ServingCache]] — the Dash app's callback
  * loop without the Dash dependency (JDK built-in `com.sun.net.httpserver`;
  * zero added libraries). Endpoints:
  *
  *   - `GET /`                      the interactive page: client dropdown
  *                                  + both figures (inline SVG)
  *   - `GET /queries?client=<c>`    queries-over-time figure (SVG)
  *   - `GET /activity?client=<c>`   client-activity figure (SVG)
  *   - `GET /anomalies?client=<c>`  daily volume + anomaly rings (SVG)
  *   - `GET /clients`               the cached top-client list (JSON)
  *   - `POST /reload[?start=YYYY-MM-DD&end=YYYY-MM-DD]`
  *                                  rebuild the cache from source (the
  *                                  reference's reload button — the one
  *                                  interaction that IS a full re-read,
  *                                  app.py:1056-1104); with `start`/`end`
  *                                  it is the date-picker reload
  *                                  (app.py:1091-1102 → db.py:84-102):
  *                                  both dates are display-TZ midnights,
  *                                  end-EXCLUSIVE +1 day — the factory
  *                                  receives the parsed LocalDates and
  *                                  re-scans that window. Requires a
  *                                  `rebuild` factory, else 409; a
  *                                  malformed or half-open range is 400.
  *
  * Omitting `client` = the all-clients / top-N view, exactly the
  * reference's `client=None` branch. Each request re-slices the cache;
  * only an explicit reload re-reads the source. `/dashboard` renders
  * from the CURRENT cache's relation, so a reload updates the static
  * page and the interactive figures consistently.
  */
final class StatsServer(initial: ServingCache, port: Int = 0,
                        rebuild: (Option[java.time.LocalDate], Option[java.time.LocalDate]) => ServingCache = null,
                        dashboardHtml: ServingCache => String = null) extends AutoCloseable {

  @volatile private var cache: ServingCache = initial

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** The port actually bound (pass 0 to pick an ephemeral one). */
  def boundPort: Int = server.getAddress.getPort

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap(_.split('&').collectFirst {
      case kv if kv.startsWith(name + "=") =>
        java.net.URLDecoder.decode(kv.drop(name.length + 1), "UTF-8")
    }).filter(_.nonEmpty)

  private def clientOf(ex: HttpExchange): Option[String] = param(ex, "client")

  private def respond(ex: HttpExchange, contentType: String, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType + "; charset=utf-8")
    ex.sendResponseHeaders(200, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.close()
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  server.createContext("/reload", (ex: HttpExchange) => {
    def fail(code: Int, msg: String): Unit = {
      val bytes = msg.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, bytes.length)
      try ex.getResponseBody.write(bytes) finally ex.close()
    }
    if (rebuild == null) fail(409, "no rebuild factory configured")
    else {
      // the date-picker range (app.py:1091-1102): both-or-neither, each a
      // display-TZ calendar date; the factory owns the end-exclusive +1 day
      // (FtlIngest.timeRangeEpochs, mirroring db.py:84-102)
      val parsed = try {
        val s = param(ex, "start").map(java.time.LocalDate.parse)
        val e = param(ex, "end").map(java.time.LocalDate.parse)
        if (s.isDefined != e.isDefined)
          Left("start and end must be given together")
        else Right((s, e))
      } catch {
        case _: java.time.format.DateTimeParseException =>
          Left("dates must be YYYY-MM-DD")
      }
      parsed match {
        case Left(err) => fail(400, err)
        case Right((start, end)) =>
          // build the fresh cache BEFORE swapping: in-flight requests keep
          // reading the old one, and a failed rebuild leaves it serving
          val fresh = rebuild(start, end)
          val old = cache
          cache = fresh
          old.close()
          respond(ex, "application/json",
            s"""{"reloaded":true,"top_clients":${fresh.topClients.size}}""")
      }
    }
  })
  if (dashboardHtml != null)
    server.createContext("/dashboard", (ex: HttpExchange) =>
      // the full static chart set, rendered from the CURRENT cache's
      // relation — a reload (incl. a date-range reload) changes this page
      // and the interactive figures together
      respond(ex, "text/html", dashboardHtml(cache)))
  server.createContext("/queries", (ex: HttpExchange) =>
    respond(ex, "image/svg+xml", cache.queriesFigure(clientOf(ex))))
  server.createContext("/activity", (ex: HttpExchange) =>
    respond(ex, "image/svg+xml", cache.activityFigure(clientOf(ex))))
  server.createContext("/anomalies", (ex: HttpExchange) =>
    respond(ex, "image/svg+xml", cache.anomaliesFigure(clientOf(ex))))
  server.createContext("/clients", (ex: HttpExchange) =>
    respond(ex, "application/json",
      cache.topClients.map(c => "\"" + esc(c) + "\"").mkString("[", ",", "]")))
  server.createContext("/", (ex: HttpExchange) => {
    val client = clientOf(ex)
    val options = ("" +: cache.topClients).map { c =>
      val sel = if (client.contains(c) || (c.isEmpty && client.isEmpty)) " selected" else ""
      val label = if (c.isEmpty) "All clients" else c
      s"""<option value="${esc(c)}"$sel>${esc(label)}</option>"""
    }.mkString
    // the date-picker (reference app.py:987-1000, wired app.py:1091-1102):
    // two calendar dates submitted to the existing /reload endpoint —
    // both-or-neither validation and the end-exclusive +1 day live
    // server-side, shared with programmatic reloads
    val datePicker =
      if (rebuild == null) ""
      else
        """<form id="range" onsubmit="reloadRange(event)">
          |  <label>From <input type="date" name="start"></label>
          |  <label>To <input type="date" name="end"></label>
          |  <button type="submit">Reload range</button>
          |</form>
          |<script>
          |function reloadRange(e){e.preventDefault();
          |  var f=document.getElementById('range');
          |  fetch('/reload?start='+f.start.value+'&end='+f.end.value)
          |    .then(function(r){if(r.ok)location.reload();
          |      else r.text().then(function(m){alert(m);});});}
          |</script>""".stripMargin
    val page =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<title>Pi-hole long-term stats</title></head><body>
         |<h1>Pi-hole long-term stats</h1>
         |<form method="get" action="/">
         |  <label>Client filter: <select name="client" onchange="this.form.submit()">
         |  $options</select></label>
         |</form>
         |$datePicker
         |${cache.queriesFigure(client)}
         |${cache.activityFigure(client)}
         |${cache.anomaliesFigure(client)}
         |</body></html>""".stripMargin
    respond(ex, "text/html", page)
  })

  server.setExecutor(null) // serve on the caller's accept thread pool
  server.start()

  override def close(): Unit = server.stop(0)
}

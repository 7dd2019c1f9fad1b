package graft

/** DuckDB oracle SQL — one entry per key in [[SparkEntry.queries]] that is
  * SQL-expressible. The driver runs these over the same parquet tables and
  * hash-compares against the Spark result (column names sorted first), so:
  *   - every column is aliased identically on both sides;
  *   - every query carries a total-order ORDER BY (tie-broken on keys);
  *   - small-int derivations are CAST to match Spark's types
  *     (hour → INTEGER, date → DATE);
  *   - floating aggregates are rounded identically on both sides.
  */
object Oracles {

  /** The §1.3 preprocessed relation as a DuckDB CTE over `events` —
    * mirrors [[Preprocess.preprocessEvents]] exactly. */
  val Prep: String =
    """WITH prep AS (
      |  SELECT event_id AS id,
      |         make_timestamp(epoch_ns(ts)//1000) AS ts,
      |         CAST(user_id AS VARCHAR) AS client,
      |         props AS domain, value AS reply_time, event_type,
      |         CASE WHEN event_type IN ('click','view','purchase') THEN 'Allowed'
      |              WHEN event_type = 'error' THEN 'Blocked'
      |              ELSE 'Other' END AS status_type,
      |         CAST(ts AS DATE) AS date,
      |         CAST(hour(ts) AS INTEGER) AS hour,
      |         CASE WHEN hour(ts) >= 6 THEN 'Day' ELSE 'Night' END AS day_period,
      |         dayname(ts) AS day_name
      |  FROM events
      |)""".stripMargin

  private def p(body: String): String = Prep + "\n" + body

  val stats: Map[String, String] = Map(
    "a01_totals" -> p(
      """SELECT count(*) AS total,
        |  count(*) FILTER (WHERE status_type='Blocked') AS blocked_cnt,
        |  count(*) FILTER (WHERE status_type='Allowed') AS allowed_cnt,
        |  CASE WHEN count(*)=0 THEN 0.0 ELSE round(100.0*(count(*) FILTER (WHERE status_type='Blocked'))/count(*),4) END AS blocked_pct,
        |  CASE WHEN count(*)=0 THEN 0.0 ELSE round(100.0*(count(*) FILTER (WHERE status_type='Allowed'))/count(*),4) END AS allowed_pct
        |FROM prep""".stripMargin),

    "a03_time_range" -> p(
      """SELECT min_ts, max_ts,
        |  span_us // 86400000000 AS span_days,
        |  (span_us % 86400000000) // 3600000000 AS span_hours,
        |  (span_us % 3600000000) // 60000000 AS span_minutes
        |FROM (SELECT min(ts) AS min_ts, max(ts) AS max_ts,
        |             epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us FROM prep)""".stripMargin),

    "a04_top_client" -> p(
      "SELECT client, count(*) AS cnt FROM prep GROUP BY client ORDER BY cnt DESC, client LIMIT 1"),

    "a04_top_client_by_class" -> p(
      """SELECT status_type, client, cnt FROM (
        |  SELECT status_type, client, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY status_type ORDER BY count(*) DESC, client) AS rn
        |  FROM prep GROUP BY status_type, client)
        |WHERE rn = 1 ORDER BY status_type""".stripMargin),

    "a05_top_domain_allowed" -> topDomainSql("Allowed"),
    "a05_top_domain_blocked" -> topDomainSql("Blocked"),

    "a06_persistent_client" -> p(
      """SELECT client, domain, count(*) AS cnt FROM prep WHERE status_type='Blocked'
        |GROUP BY client, domain ORDER BY cnt DESC, client, domain LIMIT 1""".stripMargin),

    "a07_daily_counts" -> p(
      """SELECT date, count(*) AS cnt,
        |  count(*) FILTER (WHERE status_type='Blocked') AS blocked_cnt,
        |  count(*) FILTER (WHERE status_type='Allowed') AS allowed_cnt
        |FROM prep GROUP BY date ORDER BY date""".stripMargin),

    "a08_hourly_counts" -> p(
      "SELECT hour, count(*) AS cnt FROM prep GROUP BY hour ORDER BY hour"),

    "a09_weekday_avg" -> p(
      """SELECT day_name, round(avg(cnt), 4) AS avg_cnt FROM (
        |  SELECT date, day_name, count(*) AS cnt FROM prep GROUP BY date, day_name)
        |GROUP BY day_name ORDER BY day_name""".stripMargin),

    "a10_day_night_totals" -> p(
      """SELECT day_period, count(*) AS cnt,
        |  count(*) FILTER (WHERE status_type='Blocked') AS blocked_cnt,
        |  count(*) FILTER (WHERE status_type='Allowed') AS allowed_cnt
        |FROM prep GROUP BY day_period ORDER BY day_period""".stripMargin),

    "a10_day_night_top_client" -> p(
      """SELECT day_period, client, cnt FROM (
        |  SELECT day_period, client, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY day_period ORDER BY count(*) DESC, client) AS rn
        |  FROM prep GROUP BY day_period, client)
        |WHERE rn = 1 ORDER BY day_period""".stripMargin),

    "a11_distinct_counts" -> p(
      "SELECT count(DISTINCT domain) AS n_domains, count(DISTINCT client) AS n_clients FROM prep"),

    "a12_diverse_client" -> p(
      """SELECT client, count(DISTINCT domain) AS n_domains FROM prep
        |GROUP BY client ORDER BY n_domains DESC, client LIMIT 1""".stripMargin),

    "a13_reply_stats" -> p(
      """SELECT coalesce(round(avg(abs(reply_time))*1000, 3), 0.0) AS avg_reply_ms,
        |       coalesce(round(max(abs(reply_time))*1000, 3), 0.0) AS max_reply_ms,
        |       coalesce(round(min(abs(reply_time))*1000, 3), 0.0) AS min_reply_ms
        |FROM prep""".stripMargin),

    "a14_slowest_domain" -> p(
      """SELECT domain, round(avg_reply*1000, 3) AS avg_reply_ms FROM (
        |  SELECT domain, avg(reply_time) AS avg_reply FROM prep
        |  WHERE reply_time IS NOT NULL GROUP BY domain
        |  ORDER BY avg_reply DESC, domain LIMIT 1)""".stripMargin),

    "a15_reply_by_date" -> p(
      """SELECT date, round(avg(reply_time)*1000, 3) AS avg_reply_ms
        |FROM prep GROUP BY date ORDER BY date""".stripMargin),

    "a22_inter_arrival" -> p(
      """SELECT status_type, round(avg(gap_us)/1e6, 4) AS mean_gap_s FROM (
        |  SELECT status_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY status_type ORDER BY ts, id) AS gap_us
        |  FROM prep WHERE status_type IN ('Allowed','Blocked'))
        |WHERE gap_us IS NOT NULL GROUP BY status_type ORDER BY status_type""".stripMargin)
  )

  private def topDomainSql(statusType: String): String = Prep + s""",
topd AS (SELECT domain, count(*) AS class_cnt FROM prep WHERE status_type='$statusType'
         GROUP BY domain ORDER BY class_cnt DESC, domain LIMIT 1),
allc AS (SELECT p.domain, t.class_cnt, count(*) AS all_cnt
         FROM prep p JOIN topd t USING(domain) GROUP BY p.domain, t.class_cnt),
topc AS (SELECT p.domain, p.client, count(*) AS client_cnt
         FROM prep p JOIN topd USING(domain) WHERE p.status_type='$statusType'
         GROUP BY p.domain, p.client ORDER BY client_cnt DESC, p.client LIMIT 1)
SELECT a.domain, a.class_cnt, a.all_cnt, c.client, c.client_cnt
FROM allc a JOIN topc c USING(domain)"""

  /** Assembled in [[SparkEntry.oracleSql]]; sections appended per module. */
  def all: Map[String, String] = stats
}

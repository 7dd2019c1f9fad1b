package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column derivations that widen the raw event relation into the canonical
  * analytic input — the Spark re-expression of the reference's
  * `preprocess_df` (reference: piholelongtermstats/process.py:47-83).
  *
  * Two source shapes are supported:
  *   - the real Pi-hole FTL schema (id, timestamp unix-s, type, status,
  *     domain, client, reply_time) — see [[preprocessFtl]];
  *   - the driver testdata `events` table, where `user_id` plays client,
  *     `event_type` carries the allowed/blocked class, `props` plays the
  *     domain string and `value` plays reply_time (FIXTURES.md §4).
  *
  * Everything is a pure `Column` expression — no UDFs — so the whole chain
  * stays inside whole-stage codegen and Catalyst can push the parent
  * query's filters *through* these projections down to the parquet scan.
  * The reference sorts globally here (process.py:59); we do NOT — a global
  * sort at 100 TB is a full-range shuffle, and only the order-dependent
  * operators (Streaks) need order, which they establish themselves.
  */
object Preprocess {

  /** FTL status → class (reference: process.py:71-77). */
  val AllowedStatuses: Seq[Int] = Seq(2, 3, 12, 13, 14, 17)
  val BlockedStatuses: Seq[Int] = Seq(1, 4, 5, 6, 7, 8, 9, 10, 11, 15, 16, 18)

  /** events.event_type → class (adapter; FIXTURES.md §4 column mapping). */
  val AllowedEventTypes: Seq[String] = Seq("click", "view", "purchase")
  val BlockedEventTypes: Seq[String] = Seq("error")

  /** Day iff 6 <= hour < 24, else Night (reference: process.py:64). */
  def dayPeriod(hourCol: Column): Column =
    when(hourCol >= 6, "Day").otherwise("Night")

  private def derived(ts: Column): Seq[(String, Column)] = Seq(
    "date"       -> to_date(ts),                    // process.py:62 (dt.normalize)
    "hour"       -> hour(ts),                       // process.py:63
    "day_period" -> dayPeriod(hour(ts)),            // process.py:64
    "day_name"   -> date_format(ts, "EEEE")         // process.py:79, English weekday
  )

  /** Canonical relation from the real FTL schema. `timestamp` is unix
    * seconds (reference: db.py:130-134, process.py:60-61). The display-TZ
    * conversion is intentionally NOT baked in — pass tz explicitly via
    * [[FtlIngest.withDisplayTz]]; the analytic columns below are computed
    * in the session TZ (UTC for the driver harness).
    */
  def preprocessFtl(raw: DataFrame): DataFrame = {
    val ts = timestamp_seconds(col("timestamp"))
    val statusType = when(col("status").isin(AllowedStatuses: _*), "Allowed")
      .when(col("status").isin(BlockedStatuses: _*), "Blocked")
      .otherwise("Other") // process.py:71-77
    val base = raw.select(
      col("id").cast("int").as("id"),            // app.py:173 downcast
      ts.as("ts"),
      col("type").cast("tinyint").as("type"),    // app.py:174
      col("status").cast("tinyint").as("status"),// app.py:175
      col("domain"),
      col("client"),
      expr("try_cast(reply_time as double)").as("reply_time") // process.py:80
    ).withColumn("status_type", statusType)
    derived(col("ts")).foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
  }

  /** Canonical relation from the driver `events` table: same derived
    * columns, adapter column mapping (ts↔timestamp, user_id↔client,
    * event_type↔status class, props↔domain, value↔reply_time).
    */
  def preprocessEvents(events: DataFrame): DataFrame = {
    val statusType = when(col("event_type").isin(AllowedEventTypes: _*), "Allowed")
      .when(col("event_type").isin(BlockedEventTypes: _*), "Blocked")
      .otherwise("Other")
    val base = events.select(
      col("event_id").as("id"),
      col("ts"),
      col("user_id").cast("string").as("client"),
      col("props").as("domain"),
      col("value").as("reply_time"),
      col("event_type")
    ).withColumn("status_type", statusType)
    derived(col("ts")).foldLeft(base) { case (df, (n, c)) => df.withColumn(n, c) }
  }

  /** True iff `pattern` compiles as a Java regex (reference validates with
    * Python `re.compile`, process.py:11-24). */
  def isValidRegex(pattern: String): Boolean =
    try { java.util.regex.Pattern.compile(pattern); true }
    catch { case _: java.util.regex.PatternSyntaxException => false }

  /** Drop rows whose `column` matches any of `patterns` — the reference's
    * sequential anti-filter loop (process.py:27-44, applied app.py:165-170):
    * AND of negated unanchored matches; an invalid pattern is a no-op (with
    * a warning in the reference). NULL values never match and are KEPT —
    * the reference's `str.contains(..., na=False)` semantics; a bare
    * `!rlike` would evaluate NULL and silently drop them. Pure
    * expression → pushed to the scan. */
  def regexAntiFilter(df: DataFrame, column: String, patterns: Seq[String]): DataFrame =
    patterns.filter(isValidRegex).foldLeft(df)((d, p) =>
      d.filter(col(column).isNull || !col(column).rlike(p)))

  /** P8: semi-structured extraction — pull the integer `k` field out of
    * the raw events' JSON `props` column and roll up per decade bucket.
    * `get_json_object` is a codegen'd path evaluation, so the parse rides
    * the scan (one pass, no UDF); malformed/missing JSON yields NULL and
    * lands in a NULL bucket rather than failing the job — the tolerant
    * semantics a 100 TB log pipeline needs. */
  def jsonPropsRollup(rawEvents: DataFrame): DataFrame = {
    // try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    // THROWS on a non-integer k string; try_cast yields NULL, matching the
    // oracle's TRY_CAST and the documented tolerant semantics.
    val k = expr("try_cast(get_json_object(props, '$.k') as int)")
    rawEvents
      .select((k - pmod(k, lit(10))).as("k_decade"), col("value"))
      .groupBy("k_decade")
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"),
        round(avg("value"), 6).as("avg_value"))
      .orderBy("k_decade")
  }

  /** NOT IN's three-valued-logic corner, exercised deliberately: against
    * an EMPTY subquery every row passes; against a set CONTAINING NULL
    * no row ever passes (x NOT IN (..., NULL) is never true). Spark
    * plans the nullable case as a null-aware anti join — a different
    * physical path from h16's broadcast anti (which requires provably
    * non-null keys) — and getting this wrong silently corrupts any
    * exclusion-list filter fed by a column with NULLs. Expressed in SQL
    * because only the NOT IN form triggers the null-aware plan. */
  def notInNullSemantics(prep: DataFrame): DataFrame = {
    val spark = prep.sparkSession
    val view = "graft_naa_prep"
    prep.createOrReplaceTempView(view)
    spark.sql(
      s"""SELECT
         |  (SELECT count(*) FROM $view
         |   WHERE domain NOT IN (SELECT domain FROM $view WHERE status_type = 'NoSuchClass'))
         |    AS cnt_vs_empty_set,
         |  (SELECT count(*) FROM $view
         |   WHERE domain NOT IN (SELECT CAST(NULL AS STRING)))
         |    AS cnt_vs_null_set""".stripMargin)
  }

  /** P8's typed sibling: SCHEMA-projected JSON parse via `from_json`
    * into a struct, instead of per-path string extraction. One parse
    * materializes every needed field (get_json_object re-parses the
    * document per path — fine for one field, wasteful for many), the
    * struct fields are real typed columns from there on, and `mode
    * PERMISSIVE` maps malformed documents to a NULL struct rather than
    * failing — the schema-on-read contract for a 100 TB semi-structured
    * column. Rollup: per event_type, the typed k field's spread plus a
    * parse-health count.
    *
    * Engine-equivalence caveat (pinned in PreprocessSpec): `from_json`
    * with `struct<k:int>` nulls the WHOLE struct for a quoted number
    * (`{"k":"5"}`), while the DuckDB oracle's
    * TRY_CAST(json_extract_string(..)) parses it to 5. The generated
    * `props` data is all clean integer JSON, so the oracle comparison
    * holds; on dirty data the two would intentionally diverge — the
    * strict struct-level parse IS the documented Spark semantics. */
  def jsonPropsTyped(rawEvents: DataFrame): DataFrame =
    rawEvents
      .select(col("event_type"),
        from_json(col("props"), lit("struct<k:int>")).as("p"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("p.k")).as("n_parsed"),
        min(col("p.k")).as("min_k"),
        max(col("p.k")).as("max_k"),
        round(avg(col("p.k")), 6).as("avg_k"))
      .orderBy("event_type")
}

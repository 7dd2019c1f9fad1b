package graft.sources

import java.time.{Instant, LocalDate, ZoneId}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion of the Pi-hole FTL `queries` relation — the Spark
  * re-expression of the reference's scan layer (reference: db.py:16-152,
  * app.py:144-154).
  *
  * Source shapes:
  *   - **Parquet** (production path): FTL tables exported to parquet; the
  *     scan gets projection + timestamp-range pushdown from Catalyst
  *     (PushedFilters), partition-parallel for free. The reference's
  *     memory-adaptive chunking (db.py:39-52) is superseded entirely by
  *     Spark's split planning (`maxPartitionBytes`).
  *   - **SQLite `.db`** (the reference's primary format): read natively
  *     by [[SqliteRead]] — page-parallel leaf scans replace the
  *     reference's chunked generator (db.py:137-152). Exercised
  *     end-to-end in FtlIngestSpec against fixture databases built with
  *     the reference DDL.
  *   - **JDBC**: kept for deployments with an `org.sqlite.JDBC` driver
  *     jar (absent here); fails with a clear message otherwise.
  *
  * Multi-database behavior matches the reference: UNION ALL with
  * duplicates KEPT (README.md:56), via `unionByName`.
  */
object FtlIngest {

  /** The 7-of-13 projection the engine reads (reference: db.py:130-134). */
  val SourceColumns: Seq[String] =
    Seq("id", "timestamp", "type", "status", "domain", "client", "reply_time")

  /** Timezone with invalid → UTC fallback (reference: db.py:70-74 warns
    * and falls back rather than failing). */
  def zoneOrUtc(tz: String): ZoneId =
    try ZoneId.of(tz) catch { case _: Exception => ZoneId.of("UTC") }

  /** Scan-range epochs [from, to) in seconds — the reference's date-range
    * contract (db.py:69-108): explicit dates are interpreted at midnight
    * in the DISPLAY timezone, the end date is made exclusive by +1 day
    * (db.py:85); with no dates, the window is [now - days, now]
    * (db.py:89-95). */
  def timeRangeEpochs(
      startDate: Option[LocalDate], endDate: Option[LocalDate],
      days: Int, tz: String, nowUtc: Instant): (Long, Long) = {
    val zone = zoneOrUtc(tz)
    (startDate, endDate) match {
      case (Some(s), Some(e)) =>
        (s.atStartOfDay(zone).toEpochSecond,
          e.plusDays(1).atStartOfDay(zone).toEpochSecond)
      case _ =>
        (nowUtc.minusSeconds(days.toLong * 86400).getEpochSecond,
          nowUtc.getEpochSecond)
    }
  }

  /** S1+S3: multi-file parquet scan, projected to the 7 engine columns,
    * with the half-open timestamp range filter pushed to the scan. */
  def readParquet(spark: SparkSession, paths: Seq[String],
                  fromEpoch: Long, toEpoch: Long): DataFrame =
    paths.map(p => spark.read.parquet(p).select(SourceColumns.map(col): _*))
      .reduce(_ unionByName _)
      .filter(col("timestamp") >= fromEpoch && col("timestamp") < toEpoch)

  /** The engine's typed source schema — what CSV/JSON exports of the FTL
    * table must parse into. */
  val SourceSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "id INT, timestamp BIGINT, type TINYINT, status TINYINT, " +
        "domain STRING, client STRING, reply_time DOUBLE")

  /** S1/S3 over CSV exports (the common "sqlite3 -csv" escape hatch),
    * with TOLERANT parsing: PERMISSIVE mode nulls unparseable fields and
    * routes the raw line into `_corrupt` instead of failing the job —
    * at 100 TB a handful of mangled lines must never kill the scan.
    * Callers decide the quarantine policy (count, dump, or drop); the
    * range filter still prunes row groups via the typed column.
    *
    * CAVEAT (Spark's documented corrupt-record semantics under CSV
    * column pruning): `_corrupt` is populated per-query based on which
    * columns that query references, so a downstream query must either
    * reference a full row (e.g. `cache()` this frame first, as the spec
    * does) or use [[readCsvSplit]], which materializes the parse once
    * and returns stable clean/quarantine halves. In particular a query
    * selecting or filtering ONLY `_corrupt` is rejected by Spark
    * outright ("queries from raw CSV files are disallowed when the
    * referenced columns only include the internal corrupt record
    * column"). */
  def readCsv(spark: SparkSession, paths: Seq[String],
              fromEpoch: Long, toEpoch: Long): DataFrame = {
    val withCorrupt = SourceSchema.add("_corrupt", "string")
    paths.map { p =>
      spark.read
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(withCorrupt)
        .csv(p)
    }.reduce(_ unionByName _)
      .filter(col("_corrupt").isNotNull ||
        (col("timestamp") >= fromEpoch && col("timestamp") < toEpoch))
  }

  /** The two halves of a tolerant CSV parse plus the cache handle that
    * backs them. `release()` frees the one MEMORY_AND_DISK cache — note
    * that unpersisting `clean` or `quarantine` would be a silent no-op
    * (`Dataset.unpersist` only uncaches plans that `sameResult` its own
    * plan, and the derived frames' plans differ from the persisted raw
    * one), which is why the handle is part of the result. */
  final case class CsvSplit(clean: DataFrame, quarantine: DataFrame, raw: DataFrame) {
    def release(): Unit = { raw.unpersist(); () }
  }

  /** [[readCsv]] eagerly split into clean/quarantine halves. The parsed
    * frame is persisted BEFORE the split so `_corrupt` is decided once
    * over full rows — immune to the per-query column-pruning caveat
    * above — and both halves stay consistent. Clean rows are typed and
    * range-filtered with `_corrupt` dropped; quarantine rows carry the
    * raw offending line. Call `release()` on the result once the
    * quarantine is drained, or the cache lives for the session. */
  def readCsvSplit(spark: SparkSession, paths: Seq[String],
                   fromEpoch: Long, toEpoch: Long): CsvSplit = {
    val raw = readCsv(spark, paths, fromEpoch, toEpoch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clean = raw.filter(col("_corrupt").isNull).drop("_corrupt")
    val quarantine = raw.filter(col("_corrupt").isNotNull)
      .select(col("_corrupt").as("raw_line"))
    CsvSplit(clean, quarantine, raw)
  }

  /** S1/S2/S3 straight from SQLite `.db` files — the reference's PRIMARY
    * source format (db.py:16-30,130-135), read natively via
    * [[SqliteRead]] (driver walks the interior B-tree, executors parse
    * leaf pages in parallel; overflow chains, rowid-alias `id`, lossy
    * UTF-8 all handled). Multi-database = UNION ALL with duplicates
    * kept, same as [[readParquet]]. The timestamp range filter applies
    * after the scan (the 7-column projection happens in the page
    * parser); [[probeRange]] works unchanged on the result. */
  def readSqlite(spark: SparkSession, dbPaths: Seq[String],
                 fromEpoch: Long, toEpoch: Long, numPartitions: Int = 8): DataFrame =
    dbPaths.map(p => SqliteRead.readTable(spark, p, "queries", SourceSchema, numPartitions))
      .reduce(_ unionByName _)
      .filter(col("timestamp") >= fromEpoch && col("timestamp") < toEpoch)

  /** S1/S2 over JDBC: one partitioned range-scan per database file.
    * Requires an org.sqlite.JDBC driver jar on the classpath (absent in
    * this build — [[readSqlite]] is the first-class direct-.db path;
    * this stays for deployments that prefer the JDBC connector). */
  def readJdbc(spark: SparkSession, dbPaths: Seq[String],
               fromEpoch: Long, toEpoch: Long, numPartitions: Int = 8): DataFrame = {
    try Class.forName("org.sqlite.JDBC")
    catch {
      case _: ClassNotFoundException =>
        throw new IllegalStateException(
          "SQLite JDBC driver (org.sqlite.JDBC) not on classpath; " +
            "export the FTL database to parquet and use readParquet instead")
    }
    dbPaths.map { p =>
      spark.read.format("jdbc")
        .option("url", s"jdbc:sqlite:$p")
        .option("dbtable",
          s"(SELECT ${SourceColumns.mkString(",")} FROM queries " +
            s"WHERE timestamp >= $fromEpoch AND timestamp < $toEpoch)")
        .option("partitionColumn", "timestamp")
        .option("lowerBound", fromEpoch.toString)
        .option("upperBound", toEpoch.toString)
        .option("numPartitions", numPartitions.toString)
        .load()
    }.reduce(_ unionByName _)
  }

  /** S5: global min/max timestamp probe — answered from parquet footer
    * statistics (or pushed-down MIN/MAX over JDBC), not a full scan. */
  def probeRange(df: DataFrame): DataFrame =
    df.agg(min(col("timestamp")).as("min_ts"), max(col("timestamp")).as("max_ts"))

  /** F2: display-timezone conversion as a pure column transform — the
    * reference converts the whole frame to the display TZ up front
    * (process.py:52-61, invalid TZ → UTC). We keep analytics in the
    * session TZ (UTC under the driver harness) and shift only for
    * display, so the conversion is a projection, never session state. */
  def withDisplayTz(df: DataFrame, tsCol: String, tz: String): DataFrame =
    df.withColumn(tsCol, from_utc_timestamp(col(tsCol), zoneOrUtc(tz).getId))
}

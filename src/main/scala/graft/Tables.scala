package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata star schema + events /
  * documents / embeddings (see TESTDATA.md, FIXTURES.md §4).
  *
  * Scale note: each loader is a plain parquet scan — Catalyst pushes
  * filters and prunes columns into the scan, so callers compose
  * `select`/`filter` freely without materializing. At cluster scale the
  * same paths would be partitioned directories (e.g. events by date);
  * nothing here assumes a single file.
  */
object Tables {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Raw events frame — `ts` still a nanosecond long if the file uses
    * TIMESTAMP(NANOS). Streaming reads need this shape for their schema.
    *
    * The testdata writes events.ts as parquet TIMESTAMP(NANOS), which
    * Spark 4 rejects outright; the legacy conf reads nanos as long and
    * [[normalizeTs]] truncates to micros (the DuckDB oracle mirrors with
    * make_timestamp(epoch_ns(ts)//1000)). There is no per-read option for
    * this flag (schema inference consults only the session conf —
    * verified empirically), so it is set around the EAGER schema-inference
    * step and restored immediately after: later reads in the caller's
    * session see their original setting, and execution of the returned
    * frame does not re-require the flag (the inferred LongType schema is
    * what the scan runs with — also verified). Concurrent reads in the
    * same session during this narrow window would see the flag; callers
    * doing multi-threaded nanos-sensitive reads should serialize here. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = synchronized {
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try t(spark, dir, "events")
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Canonicalize `ts` to session-TZ TimestampType, whatever the parquet
    * encoding: INT64 nanos (legacy flag reads it as long → truncate to
    * micros), TIMESTAMP(µs, no tz) (Spark reads TIMESTAMP_NTZ → cast;
    * lossless because the session TZ is pinned UTC), or TIMESTAMP(µs, tz)
    * (already TimestampType → no-op). Shared by the batch, streaming and
    * serve readers so every downstream operator sees exactly one type —
    * `unix_micros`, watermarks and Row.getTimestamp all require it. */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(eventsRaw(spark, dir))
  def documents(spark: SparkSession, dir: String): DataFrame  = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = t(spark, dir, "region")
}

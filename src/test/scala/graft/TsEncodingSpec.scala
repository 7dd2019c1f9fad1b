package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.operators.{Stats, Streaks}
import graft.streaming.StreamingHourly

/** Timestamp-encoding CONTRACT: the engine must accept the events table in
  * every parquet timestamp encoding the harness has shipped — INT64
  * TIMESTAMP(NANOS) (rounds 1-6), TIMESTAMP(µs, no tz) = Spark
  * TIMESTAMP_NTZ (round 7's silent regeneration, which broke 12 queries),
  * and TIMESTAMP(µs, tz) — and produce IDENTICAL results through the
  * timestamp-sensitive paths: `unix_micros` consumers (a03/a22/w05/j05…),
  * the RDD streak scans (w02/w03/w04), and a streaming watermark.
  *
  * If the harness shifts encoding again, this suite fails NAMING the
  * encoding, instead of 12 correctness rows silently vanishing. */
class TsEncodingSpec extends SparkSpec {

  // 12 events, 2 clients, fixed epochs: a 3-long blocked streak
  // (rows 4-6), a 3600 s idle gap (rows 8→9), sessions on both clients
  private val base = 1704067200L // 2024-01-01T00:00:00Z
  private val rows: Seq[(Long, Long, Long, String, Double, String)] = Seq(
    (1L, base + 0L,    1L, "click", 1.0, """{"k":1}"""),
    (2L, base + 60L,   2L, "view",  2.0, """{"k":2}"""),
    (3L, base + 120L,  1L, "click", 3.0, """{"k":3}"""),
    (4L, base + 180L,  2L, "error", 4.0, """{"k":4}"""),
    (5L, base + 240L,  1L, "error", 5.0, """{"k":5}"""),
    (6L, base + 300L,  2L, "error", 6.0, """{"k":6}"""),
    (7L, base + 360L,  1L, "view",  7.0, """{"k":7}"""),
    (8L, base + 420L,  2L, "click", 8.0, """{"k":8}"""),
    (9L, base + 4020L, 1L, "click", 9.0, """{"k":9}"""),
    (10L, base + 4080L, 2L, "view", 10.0, """{"k":10}"""),
    (11L, base + 4140L, 1L, "error", 11.0, """{"k":11}"""),
    (12L, base + 4200L, 2L, "click", 12.0, """{"k":12}"""))

  private def sparkEvents: DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "epoch_s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_seconds(col("epoch_s")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }

  /** Write `df` as ONE parquet file named dir/events.parquet (the
    * harness's file-per-table layout; the streaming source's
    * pathGlobFilter matches the file name). */
  private def writeSingleFile(df: DataFrame, dir: java.nio.file.Path): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_enc_tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(part, dir.resolve("events.parquet"))
  }

  private lazy val microsTzDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_enc_us_tz")
    writeSingleFile(sparkEvents, d) // TimestampType → TIMESTAMP(µs, adjustedToUTC)
    d.toString
  }

  private lazy val microsNtzDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_enc_us_ntz")
    writeSingleFile(sparkEvents.withColumn("ts", col("ts").cast("timestamp_ntz")), d)
    d.toString
  }

  /** Spark cannot WRITE TIMESTAMP(NANOS); build the fixture with the
    * bundled parquet-hadoop example writer, exactly the encoding the
    * round-1..6 harness data used (INT64 ts annotated NANOS). */
  private lazy val nanosDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_enc_ns")
    val schema: MessageType = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(new Path(s"$d/events.parquet"))
      .withConf(conf).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, epochS, uid, et, v, props) =>
      val g = f.newGroup()
      g.add("event_id", id); g.add("ts", epochS * 1000000000L); g.add("user_id", uid)
      g.add("event_type", et); g.add("value", v); g.add("props", props)
      w.write(g)
    } finally w.close()
    d.toString
  }

  private val encodings: Seq[(String, () => String)] = Seq(
    "int64-nanos" -> (() => nanosDir),
    "micros-ntz"  -> (() => microsNtzDir),
    "micros-tz"   -> (() => microsTzDir))

  private def prepOf(dir: String): DataFrame =
    Preprocess.preprocessEvents(Tables.events(spark, dir))

  test("every encoding normalizes to session-TZ TimestampType") {
    for ((name, dir) <- encodings) {
      val ev = Tables.events(spark, dir())
      assert(ev.schema("ts").dataType == TimestampType,
        s"encoding $name: ts read as ${ev.schema("ts").dataType}, expected TimestampType")
    }
  }

  test("unix_micros consumers (a03 time range) agree across encodings") {
    for ((name, dir) <- encodings) {
      val r = Stats.timeRange(prepOf(dir())).collect()
      assert(r.length == 1, s"encoding $name")
      assert(r.head.getAs[java.sql.Timestamp]("min_ts").toInstant.getEpochSecond == base,
        s"encoding $name: wrong min_ts")
      assert(r.head.getAs[java.sql.Timestamp]("max_ts").toInstant.getEpochSecond == base + 4200,
        s"encoding $name: wrong max_ts")
    }
  }

  test("RDD streak scans (w02/w03) agree across encodings") {
    val expectStreaks = rowsOf(Streaks.longestStreaks(prepOf(microsTzDir)))
    val expectIdle = rowsOf(Streaks.longestIdle(prepOf(microsTzDir)))
    assert(expectStreaks.exists(r => r(0) == "Blocked" && r(1) == 3L)) // rows 4-6
    assert(expectIdle.head.head == 3600.0) // rows 8→9 gap
    for ((name, dir) <- encodings) {
      assert(rowsOf(Streaks.longestStreaks(prepOf(dir()))) == expectStreaks,
        s"encoding $name: longestStreaks diverged")
      assert(rowsOf(Streaks.longestIdle(prepOf(dir()))) == expectIdle,
        s"encoding $name: longestIdle diverged")
    }
  }

  test("sessionize (unix_micros window path) agrees across encodings") {
    val expect = rowsOf(Streaks.sessionize(prepOf(microsTzDir), gapSeconds = 1800))
    assert(expect.nonEmpty)
    for ((name, dir) <- encodings)
      assert(rowsOf(Streaks.sessionize(prepOf(dir()), gapSeconds = 1800)) == expect,
        s"encoding $name: sessionize diverged")
  }

  test("streaming watermark accepts every encoding and drains to batch rows") {
    for ((name, dir) <- encodings) {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft_enc_ckpt").toString
      val qn = s"enc_${name.replace('-', '_')}"
      val agg = StreamingHourly.hourlyCounts(StreamingHourly.eventsStream(spark, dir()))
      val q = StreamingHourly.availableNowToMemory(agg, qn, ckpt).start()
      q.awaitTermination()
      val streamed = spark.table(qn).collect().toSet
      val batch = graft.operators.PlotData.hourlyView(prepOf(dir())).collect().toSet
      assert(streamed == batch, s"encoding $name: stream drain != batch hourly view")
    }
  }
}

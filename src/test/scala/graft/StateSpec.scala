package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingState

/** `transformWithState` (Spark 4 StatefulProcessor): per-client activity
  * tracking with two independent state variables and explicit horizon
  * eviction, on the RocksDB state store provider the API requires. */
class StateSpec extends SparkSpec {

  test("transformWithState client activity: totals accumulate, horizon evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[(String, Long)]
    val stream = input.toDS().toDF("client", "micros")
      .withColumn("ts", timestamp_micros(col("micros")))
    val q = StreamingState.clientActivity(stream, bucketSeconds = 60, keepBuckets = 10)
      .writeStream.queryName("client_activity").outputMode(OutputMode.Update())
      .format("memory").start()
    def minute(m: Long, off: Long = 0) = m * 60000000L + off
    try {
      // batch 1: c1 bursts in minute 100, c2 sends one event
      input.addData(("c1", minute(100)), ("c1", minute(100, 1)),
        ("c1", minute(100, 2)), ("c2", minute(100)))
      q.processAllAvailable()
      val snap1 = spark.table("client_activity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(snap1.contains(("c1", 3L, 3L, 1)), snap1.mkString(", "))
      assert(snap1.contains(("c2", 1L, 1L, 1)), snap1.mkString(", "))
      // batch 2: c1 in minute 105 — old bucket stays on the 10-bucket horizon,
      // so the peak is still the minute-100 burst
      input.addData(("c1", minute(105)), ("c1", minute(105, 1)))
      q.processAllAvailable()
      val snap2 = spark.table("client_activity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(snap2.contains(("c1", 5L, 3L, 2)), snap2.mkString(", "))
      // batch 3: c1 jumps to minute 200 — buckets 100/105 fall off the
      // horizon (cutoff 191), leaving one live bucket and a peak of 1
      input.addData(("c1", minute(200)))
      q.processAllAvailable()
      val snap3 = spark.table("client_activity")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      assert(snap3.contains(("c1", 6L, 1L, 1)), snap3.mkString(", "))
      // c2 untouched since batch 1: update mode must not have re-emitted it
      assert(snap3.count(_._1 == "c2") == 1, snap3.mkString(", "))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}

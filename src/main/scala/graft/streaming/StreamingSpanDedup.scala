package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.TextAnalysis

/** Streaming span dedup — the continuous-ingest form of
  * [[TextAnalysis.spanDedup]] (t11): documents arrive on a stream, each
  * micro-batch scrubs every span that has EVER been seen before (in
  * this batch with a smaller (doc_id, pos), or in any earlier batch via
  * the stored span table), emits per-doc verdicts, and appends its
  * newly-seen spans to the table.
  *
  * Keep-first across the stream needs no keeper metadata in storage:
  * PRESENCE in the span table is the verdict (the keeper occurrence
  * lives in whichever batch saw the span first), and within a batch the
  * local (doc_id, pos) argmin resolves keepers exactly as the batch
  * operator does. Stream ≡ batch therefore holds whenever ingest order
  * agrees with doc_id order (append-style ingest — the same
  * later-arrival-discovers-the-overlap convention the near-dup ingest
  * pins); `StreamingSpec` asserts the drained 2-batch stream equals the
  * from-scratch batch operator, including a cross-batch duplicate.
  *
  * Per-batch cost: segmentation + keeper aggregate are O(batch); the
  * seen-probe joins the batch's spans against the stored table — at
  * 100 TB that table is bucketed on the span (or its hash) so the probe
  * co-locates without reshuffling history; here it is a plain parquet
  * relation. At-least-once: both writes are batchId-keyed overwrite
  * directories (the idempotent-sink recipe), so a crash-replay rewrites
  * the same subdirectories; the span table tolerates a replayed batch's
  * spans appearing twice (presence is idempotent, and the probe
  * `distinct`s).
  */
object StreamingSpanDedup {

  private val segSchema = StructType(Seq(StructField("seg", StringType)))

  /** Start from nothing-seen: an empty span shard under `batch_id=-1`
    * keeps the directory one partition-discovered parquet table. To
    * start from an existing corpus instead, write its distinct spans
    * here first (`TextAnalysis.spanRel(corpus, window).select("seg")`). */
  def seed(spark: SparkSession, spansDir: String): Unit =
    spark.createDataFrame(new java.util.ArrayList[Row](), segSchema)
      .write.mode("overwrite").parquet(s"$spansDir/batch_id=-1")

  /** Process ONE micro-batch (or any static frame): scrub against the
    * stored spans + batch-local keepers, append verdicts and new spans. */
  def ingestBatch(batch: DataFrame, batchId: Long, spansDir: String,
                  outDir: String, window: Int = 8): Unit = {
    val spark = batch.sparkSession
    spark.catalog.refreshByPath(spansDir) // see StreamingNearDup's cache note
    val segs = TextAnalysis.spanRel(batch, window)
    // STRICTLY-earlier shards only (batch_id surfaces as a partition
    // column → planning-time pruning): an at-least-once REPLAY would
    // otherwise find the batch's own previously-written spans in the
    // table and scrub everything, flipping verdicts between attempts
    val seen = spark.read.parquet(spansDir)
      .filter(col("batch_id") < batchId)
      .select("seg").distinct()
      .withColumn("_seen", lit(true))
    val keeper = segs.groupBy("seg")
      .agg(org.apache.spark.sql.functions.min("occ_key").as("keep_key"))
    val marked = segs.join(keeper, Seq("seg"))
      .join(seen, Seq("seg"), "left")
      .withColumn("keep", col("_seen").isNull && col("occ_key") === col("keep_key"))
    TextAnalysis.assembleSpans(marked)
      .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    segs.select("seg").distinct()
      .write.mode("overwrite").parquet(s"$spansDir/batch_id=$batchId")
    spark.catalog.refreshByPath(spansDir)
    spark.catalog.refreshByPath(outDir)
  }

  /** Run the stream over a document source; drain with
    * `Trigger.AvailableNow()` for a catch-up run. */
  def start(docs: DataFrame, spansDir: String, outDir: String,
            checkpointDir: String, window: Int = 8,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, spansDir, outDir, window)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The accumulated per-doc verdicts (batch_id partition dropped). */
  def cleanedTable(spark: SparkSession, outDir: String): DataFrame = {
    spark.catalog.refreshByPath(outDir)
    spark.read.parquet(outDir)
      .select("doc_id", "n_segs", "n_kept", "clean_hash")
  }
}

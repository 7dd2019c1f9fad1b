package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Multimodal

/** Streaming MULTIMODAL dedup — the "have I seen this content before"
  * ingest gate over m13's content-addressable fingerprints
  * ([[Multimodal.mediaFingerprints]]): a stored fingerprint index plays
  * the role the banded-signature index plays for near-dup text
  * ([[StreamingNearDup]]), and each arriving batch of media documents
  * is decoded, canonicalized and hashed (map-only, O(batch)), then
  * verdict-ed against the index — a re-encode of an already-ingested
  * picture (different container bytes, same decoded content) is caught
  * exactly, which byte-level dedup cannot do.
  *
  * Verdict semantics: keep-FIRST-ARRIVAL. A doc is a duplicate iff its
  * (kind, fingerprint) already exists in a strictly-EARLIER index shard
  * (`batch_id < batchId` — the [[StreamingSpanDedup]] treatment, so an
  * at-least-once replay does not see its own appended fingerprints and
  * flip verdicts) or a lower-doc_id member of its own batch carries it.
  * Only KEPT docs' fingerprints are appended, so the index stays one
  * row per distinct content ever seen. When arrival order is doc_id
  * order, the drained verdicts equal the batch form `keep = doc_id is
  * the min of its (kind, fingerprint) group` (StreamingSpec pins it,
  * including a cross-batch re-encoded duplicate).
  *
  * All writes are batchId-keyed overwrites (idempotent replay, the
  * package's shared recipe); per-batch cost is O(batch + index probe)
  * regardless of how much content the index has accumulated — the
  * probe is a broadcast-able join against a relation of one md5 per
  * distinct content. */
object StreamingMediaDedup {

  /** Seed the fingerprint index from the initial corpus (batch_id=-1). */
  def seed(docs: DataFrame, indexDir: String): Unit =
    Multimodal.mediaFingerprints(docs)
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")

  /** Verdict one micro-batch (or any static frame) against the stored
    * index shards strictly earlier than `batchId`, append the kept
    * docs' fingerprints, and return the verdicts
    * (doc_id, kind, format, fingerprint, is_dup). */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String,
                  outDir: String): Unit = {
    val spark = batch.sparkSession
    spark.catalog.refreshByPath(indexDir)
    val stored = spark.read.parquet(indexDir)
      .filter(col("batch_id") < batchId)
      .select(col("kind"), col("fingerprint")).distinct()
      .withColumn("_seen", lit(1))
    val fps = Multimodal.mediaFingerprints(batch)
    // batch-local keep-first: min doc_id per (kind, fingerprint)
    val w = Window.partitionBy("kind", "fingerprint")
    val verdicts = fps
      .withColumn("_min_id", min(col("doc_id")).over(w))
      .join(broadcast(stored), Seq("kind", "fingerprint"), "left")
      .select(col("doc_id"), col("kind"), col("format"), col("fingerprint"),
        (col("_seen").isNotNull || col("doc_id") =!= col("_min_id")).as("is_dup"))
    verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    spark.catalog.refreshByPath(outDir)
    spark.read.parquet(s"$outDir/batch_id=$batchId")
      .filter(!col("is_dup"))
      .select("doc_id", "kind", "format", "fingerprint")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    spark.catalog.refreshByPath(indexDir)
  }

  /** Run the stream: verdicts land in batchId-keyed parquet under
    * `outDir`; the fingerprint index grows by each batch's kept docs. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexDir, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}

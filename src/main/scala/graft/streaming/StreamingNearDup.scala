package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming near-dup ingest — the continuous form of the d11 daily
  * append: new documents arrive on a stream, and each micro-batch
  * extends BOTH production tables — the corpus and the verified-pairs
  * table — by exactly the pairs that touch the batch's documents.
  *
  * Shape: the batch body IS [[Dedup.incrementalVerifiedPairs]] (the d11
  * operator), made safe by its pinned invariant
  * `pairs(old ∪ new) = pairs(old) ∪ incremental(new)`: band keys are
  * per-doc, so old×old candidates are untouched by new arrivals, and a
  * cross-batch pair (i from batch 1, j from batch 2) is discovered by
  * exactly one batch — the one that ingested the LATER doc. The batches
  * therefore append DISJOINT pair sets whose union equals the
  * from-scratch [[Dedup.writeVerifiedPairs]] over the full corpus
  * (`StreamingSpec` pins this across a 2-batch split).
  *
  * At-least-once: `foreachBatch` may replay a batch after a crash
  * between sink write and checkpoint commit, so BOTH writes are
  * batchId-keyed overwrites (the idempotent-file-sink recipe the
  * Structured Streaming guide prescribes); a replay rewrites the same
  * subdirectories and the tables are unchanged.
  *
  * Scale: per batch the fresh work is |batch| × bands band-join probes
  * against the corpus's banded signatures plus a candidates-only
  * verify — never a re-verification of the corpus square. The corpus
  * chain relations are memoized per file snapshot (Dedup.chainOf), so
  * within a session consecutive batches rebuild only what the new files
  * invalidate.
  */
object StreamingNearDup {

  /** Pre-seed the corpus + pairs tables from the initial corpus — the
    * "yesterday's tables" a continuous ingest starts from. Seed rows
    * live under `batch_id=-1` so the whole directory stays one
    * partition-discovered parquet table. */
  def seed(docs: DataFrame, corpusDir: String, pairsDir: String,
           threshold: Double, k: Int = 16, bands: Int = 4): Unit = {
    docs.write.mode("overwrite").parquet(s"$corpusDir/batch_id=-1")
    Dedup.writeVerifiedPairs(docs, s"$pairsDir/batch_id=-1", threshold, k, bands)
  }

  /** Ingest ONE micro-batch (or any static frame): append its docs to
    * the corpus table, then append the verified pairs touching them.
    * Reads the corpus back from storage so the band probe sees
    * seed ∪ all prior batches ∪ this batch. */
  def ingestBatch(batch: DataFrame, batchId: Long, corpusDir: String,
                  pairsDir: String, threshold: Double,
                  k: Int = 16, bands: Int = 4): Unit = {
    val spark = batch.sparkSession
    val cols = batch.columns.toSeq
    batch.write.mode("overwrite").parquet(s"$corpusDir/batch_id=$batchId")
    // the session-wide FileStatusCache serves STALE listings for a path
    // read before (metadataCacheTTL defaults to forever), so without this
    // refresh the corpus read would miss the partition directory the line
    // above just created and the band probe would find no signatures for
    // the batch's docs
    spark.catalog.refreshByPath(corpusDir)
    val all = spark.read.parquet(corpusDir).select(cols.map(col): _*)
    Dedup.incrementalVerifiedPairs(all, batch.select("doc_id"), threshold, k, bands)
      .select("i", "j")
      .write.mode("overwrite").parquet(s"$pairsDir/batch_id=$batchId")
    spark.catalog.refreshByPath(pairsDir)
  }

  /** Run the stream over a document source. Drain with
    * `Trigger.AvailableNow()` for a catch-up run; leave the default
    * micro-batch trigger for continuous ingest. */
  def start(docs: DataFrame, corpusDir: String, pairsDir: String,
            checkpointDir: String, threshold: Double,
            k: Int = 16, bands: Int = 4,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, corpusDir, pairsDir, threshold, k, bands)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The accumulated verified-pairs table (batch_id surfaces as a
    * partition column and is dropped — downstream consumers read the
    * same (i, j) relation [[Dedup.readVerifiedPairs]] serves). */
  def pairsTable(spark: SparkSession, pairsDir: String): DataFrame = {
    spark.catalog.refreshByPath(pairsDir) // see ingestBatch's cache note
    spark.read.parquet(pairsDir).select("i", "j")
  }
}

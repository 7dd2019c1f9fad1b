package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming decontamination — the continuous-ingest form of `d12`: new
  * documents arrive on a stream and are checked against a STATIC
  * benchmark shingle set before they may enter the training corpus.
  *
  * Shape: a document's decontamination verdict depends only on its own
  * text and the (static) eval set, so no cross-batch state exists and
  * the right streaming vehicle is `foreachBatch` — each micro-batch runs
  * the exact batch operator ([[Dedup.decontaminateAgainst]]: corpus
  * shingles stream through the broadcast eval set, one per-doc
  * aggregate) and appends its flagged rows. A stateful streaming
  * aggregation would buy nothing and cost doc_id-keyed state the
  * engine would have to watermark-evict; `StreamingSpec` pins
  * stream ≡ batch regardless of how documents split across batches.
  *
  * The eval shingle set should be built once ([[Dedup.evalShingleSet]])
  * and persisted by the caller — otherwise every micro-batch re-scans
  * the benchmark corpus to rebuild the broadcast.
  */
object StreamingDecontam {

  /** Flag one micro-batch (or any static frame) against the prebuilt
    * eval shingle set. Trusts the set's distinctness
    * ([[Dedup.evalShingleSet]] guarantees it), so no per-batch distinct
    * exchange rides every micro-batch. */
  def flagBatch(batch: DataFrame, evalShingles: DataFrame,
                minOverlap: Long = 2): DataFrame =
    Dedup.decontaminateAgainstPrepared(batch, evalShingles, minOverlap)

  /** Run the stream: write each batch's contaminated (doc_id,
    * n_shingles, n_overlap, overlap_frac) rows into a batchId-keyed
    * subdirectory of the parquet quarantine. foreachBatch is only
    * at-least-once (a crash between the sink write and the checkpoint
    * commit replays the batch), so the write must be IDEMPOTENT:
    * overwriting `batch_id=<id>` makes the replay a no-op instead of a
    * duplicate append — that plus the checkpoint is the exactly-once
    * recipe the Structured Streaming guide prescribes for file sinks
    * driven from foreachBatch. Read the quarantine with
    * `spark.read.parquet(outDir)` (batch_id surfaces as a partition
    * column). */
  def start(docs: DataFrame, evalShingles: DataFrame, outDir: String,
            checkpointDir: String, minOverlap: Long = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        flagBatch(batch, evalShingles, minOverlap)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming FUZZY decontamination — the continuous-ingest form of
  * `d14`, closing the family: d12's exact form already streams
  * ([[StreamingDecontam]]) and the near-dup index streams
  * ([[StreamingNearDup]]); this is the probe-stored-index pattern
  * applied to the cross-corpus banded join.
  *
  * Shape: the eval side is STATIC and benchmark-sized — its banded
  * MinHash index and shingle relation are built once
  * ([[Dedup.evalFuzzyIndex]]) and persisted by the caller; each arriving
  * train micro-batch then runs [[Dedup.fuzzyDecontaminateAgainst]]:
  * signatures over the BATCH only (O(batch)), band-key join with the
  * broadcast eval bands, exact Jaccard verify on the candidate sliver.
  * A train doc's verdict depends only on its own shingles and the
  * static eval side, so no cross-batch state exists, `foreachBatch` is
  * the right vehicle, and stream ≡ batch however documents split
  * across micro-batches (StreamingSpec pins it against
  * [[Dedup.fuzzyDecontaminate]]).
  *
  * At-least-once: the sink write is a batchId-keyed OVERWRITE, so a
  * replay after a crash between the write and the checkpoint commit
  * rewrites the same subdirectory — the idempotent-file-sink recipe
  * shared by every foreachBatch stream in this package.
  */
object StreamingFuzzyDecontam {

  /** Score one micro-batch (or any static frame) against the prebuilt
    * eval index: (doc_id, eval_id, common, n_train, n_eval, jac) for
    * every train×eval near-duplicate pair at `threshold`. */
  def flagBatch(batch: DataFrame, evalBands: DataFrame,
                evalShingles: DataFrame, threshold: Double = 0.5,
                k: Int = 16, bands: Int = 4): DataFrame =
    Dedup.fuzzyDecontaminateAgainst(batch, evalBands, evalShingles,
      threshold, k, bands)

  /** Run the stream: each batch's flagged pairs land in a batchId-keyed
    * parquet subdirectory of the quarantine (read the whole of it with
    * `spark.read.parquet(outDir)`; batch_id surfaces as a partition
    * column). */
  def start(docs: DataFrame, evalBands: DataFrame, evalShingles: DataFrame,
            outDir: String, checkpointDir: String, threshold: Double = 0.5,
            k: Int = 16, bands: Int = 4,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        flagBatch(batch, evalBands, evalShingles, threshold, k, bands)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}

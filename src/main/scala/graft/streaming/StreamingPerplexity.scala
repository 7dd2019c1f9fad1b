package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Sampling

/** Streaming LM-perplexity scoring — the continuous form of the p24
  * quality filter, with the same frozen-model contract as
  * [[StreamingDsir]]: the interpolated hashed-bigram model is estimated
  * ONCE from the seed corpus and persisted (≤ 8192 rows,
  * [[Sampling.lmModel]]); each arriving micro-batch is scored against
  * that frozen model and appended to a scores table. Re-estimating per
  * batch would make earlier documents' perplexities refer to a
  * different model than later ones — a threshold or tercile cut over
  * the accumulated table would then compare incomparable numbers.
  * Per-batch cost is O(batch token pairs) + a broadcast of the model —
  * independent of accumulated corpus size — and the drained scores
  * table equals the from-scratch [[Sampling.lmScoreAgainst]] run
  * whenever the seed IS the eventual corpus (`StreamingSpec` pins this
  * across a 2-batch split). The tercile VERDICT (head/middle/tail) is
  * deliberately absent here: it is a decision over the accumulated
  * table ([[Sampling.lmPerplexity]] applies it batch-side).
  *
  * At-least-once: `foreachBatch` may replay a batch after a crash, so
  * the scores write is a batchId-keyed overwrite (the idempotent
  * file-sink recipe every streaming module in this package uses). */
object StreamingPerplexity {

  /** Estimate and persist the (kind, bucket, c) model from the seed. */
  def seed(docs: DataFrame, modelDir: String,
           refPred: org.apache.spark.sql.Column): Unit =
    Sampling.lmModel(docs, refPred)
      .write.mode("overwrite").parquet(modelDir)

  /** Score ONE micro-batch (or any static frame) against the stored
    * model and append it batchId-keyed. */
  def ingestBatch(batch: DataFrame, batchId: Long, modelDir: String,
                  scoresDir: String): Unit = {
    val spark = batch.sparkSession
    // stale-listing guard: see StreamingNearDup.ingestBatch
    spark.catalog.refreshByPath(modelDir)
    val model = spark.read.parquet(modelDir)
    Sampling.lmScoreAgainst(batch, model)
      .write.mode("overwrite").parquet(s"$scoresDir/batch_id=$batchId")
    spark.catalog.refreshByPath(scoresDir)
  }

  /** Run the stream over a document source. Drain with
    * `Trigger.AvailableNow()` for a catch-up run. */
  def start(docs: DataFrame, modelDir: String, scoresDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, modelDir, scoresDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The accumulated (doc_id, n_pairs, nll, ppl) table. */
  def scoresTable(spark: SparkSession, scoresDir: String): DataFrame = {
    spark.catalog.refreshByPath(scoresDir)
    spark.read.parquet(scoresDir).select("doc_id", "n_pairs", "nll", "ppl")
  }
}

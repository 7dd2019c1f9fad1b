package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Sampling

/** Streaming DSIR scoring — the continuous form of the p22 importance
  * pipeline: the hashed-n-gram language-model side is estimated ONCE
  * from the seed corpus and persisted (≤ 4096 rows,
  * [[Sampling.dsirDistribution]]); each arriving micro-batch is then
  * scored against that frozen model and appended to a scores table.
  *
  * Freezing is the point, not a shortcut (the ANN layer's
  * append-without-retrain story applied to data selection): if every
  * batch re-estimated p̂_raw/p̂_tgt from the accumulated corpus, the
  * scores of earlier documents would silently refer to a DIFFERENT
  * model than later ones, and a top-fraction cut across the table
  * would compare incomparable numbers. With the model frozen, per-batch
  * cost is O(batch tokens) + a broadcast of the 4096-row table —
  * independent of how much corpus has accumulated — and the drained
  * scores table equals the from-scratch [[Sampling.dsirScores]] run
  * whenever the seed IS the eventual corpus (`StreamingSpec` pins this
  * across a 2-batch split). Re-estimation, when wanted, is an explicit
  * [[seed]] re-run followed by re-scoring — a deliberate model bump,
  * not an ingest side effect.
  *
  * At-least-once: `foreachBatch` may replay a batch after a crash, so
  * the scores write is a batchId-keyed overwrite (the idempotent
  * file-sink recipe every streaming module in this package uses).
  */
object StreamingDsir {

  /** Estimate and persist the distribution table from the seed corpus. */
  def seed(docs: DataFrame, distDir: String,
           targetPred: org.apache.spark.sql.Column): Unit =
    Sampling.dsirDistribution(docs, targetPred)
      .write.mode("overwrite").parquet(distDir)

  /** Score ONE micro-batch (or any static frame) against the stored
    * model and append it batchId-keyed. */
  def ingestBatch(batch: DataFrame, batchId: Long, distDir: String,
                  scoresDir: String): Unit = {
    val spark = batch.sparkSession
    // stale-listing guard: see StreamingNearDup.ingestBatch
    spark.catalog.refreshByPath(distDir)
    val dist = spark.read.parquet(distDir)
    Sampling.dsirScoreAgainst(batch, dist)
      .write.mode("overwrite").parquet(s"$scoresDir/batch_id=$batchId")
    spark.catalog.refreshByPath(scoresDir)
  }

  /** Run the stream over a document source. Drain with
    * `Trigger.AvailableNow()` for a catch-up run. */
  def start(docs: DataFrame, distDir: String, scoresDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, distDir, scoresDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The accumulated (doc_id, n_feats, score) table. */
  def scoresTable(spark: SparkSession, scoresDir: String): DataFrame = {
    spark.catalog.refreshByPath(scoresDir)
    spark.read.parquet(scoresDir).select("doc_id", "n_feats", "score")
  }
}

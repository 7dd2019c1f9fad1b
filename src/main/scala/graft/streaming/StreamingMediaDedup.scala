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
  * Verdict semantics: keep-FIRST-ARRIVAL — these are INGEST-ORDER
  * semantics, not min-doc_id semantics. A doc is a duplicate iff its
  * (kind, fingerprint) already exists in a strictly-EARLIER index shard
  * (`batch_id < batchId` — the [[StreamingSpanDedup]] treatment, so an
  * at-least-once replay does not see its own appended fingerprints and
  * flip verdicts) or a lower-doc_id member of its own batch carries it.
  * Only KEPT docs' fingerprints are appended, so the index stays one
  * row per distinct content ever seen. The StreamingSpec stream≡batch
  * equivalence (drained verdicts = the batch form `keep = doc_id is the
  * min of its (kind, fingerprint) group`) therefore holds ONLY when
  * doc_ids arrive in non-decreasing order across batches — if a later
  * batch carried a SMALLER doc_id for already-stored content, the
  * stream would flag the smaller id as the dup (first arrival wins)
  * where the batch keep-min reference keeps it. That conditionality is
  * deliberate: an ingest gate's job is to admit the copy it saw first.
  *
  * All writes are batchId-keyed overwrites (idempotent replay, the
  * package's shared recipe); per-batch cost is O(batch + index probe)
  * regardless of how much content the index has accumulated. The index
  * probe is SIZE-GATED like [[graft.operators.ConnectedComponents]]'s
  * driver fold: while the stored index (one md5 per distinct content
  * ever ingested) is small it is broadcast — a map-side hash probe,
  * no shuffle of the batch — but past `broadcastMaxRows` the hint is
  * withheld and the join degrades to a shuffled exchange instead of
  * pinning an unboundedly-growing relation into executor memory (at
  * 100 TB of distinct content the index is GBs; a forced broadcast
  * there is an OOM, not a speedup). The gate's input is a running
  * kept-count sidecar (`_counts/<batchId>.count`, maintained by
  * [[seed]]/[[ingestBatch]]) read driver-side in O(#batches) — NOT a
  * per-batch `count()` of the index, which at scale would be a full
  * parquet-footer sweep per micro-batch on top of the join's own
  * scan. */
object StreamingMediaDedup {

  /** Past this many distinct stored fingerprints, stop broadcasting
    * the index side of the probe join. 1M rows ≈ tens of MB of
    * (kind, md5) pairs — comfortably under the executor-memory bar;
    * 10× that is not. */
  val DefaultBroadcastMaxRows: Long = 1000000L

  /** Write the running-count sidecar for one index shard:
    * `indexDir/_counts/<batchId>.count` holds the shard's row count as
    * text. Underscore-prefixed, so Spark's file index never treats it
    * as data. Overwrite (idempotent replay, like the shard itself). */
  private def writeShardCount(spark: SparkSession, indexDir: String,
                              batchId: Long, n: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/_counts/$batchId.count")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Sum the sidecar counts of index shards strictly earlier than
    * `batchId` — the O(#batches) DRIVER-side gate input that replaced
    * the per-batch `stored.count()` Spark job (round-13 verdict: at
    * 100 TB-class index sizes that count was a full parquet-footer
    * sweep per micro-batch, and `stored` was computed twice). Rows per
    * shard, not distinct contents — an upper bound, so the gate only
    * ever degrades to the SAFE side (shuffle instead of broadcast).
    * None when the sidecar is absent or unreadable (pre-sidecar index
    * dirs) — the caller falls back to counting once. */
  private def sidecarCountBefore(spark: SparkSession, indexDir: String,
                                 batchId: Long): Option[Long] =
    scala.util.Try {
      val dir = new org.apache.hadoop.fs.Path(s"$indexDir/_counts")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(dir).iterator.map { st =>
        val name = st.getPath.getName
        require(name.endsWith(".count"))
        val id = name.stripSuffix(".count").toLong
        if (id >= batchId) 0L
        else {
          val in = fs.open(st.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
          finally in.close()
        }
      }.sum
    }.toOption

  /** The two corpus shapes the gate ingests, as fingerprint plans:
    * [[Multimodal.mediaFingerprints]] for (doc_id, …) relations whose
    * payloads the engine synthesizes in-body (the test/bench shape),
    * [[Multimodal.fingerprintsFromBinary]] for relations carrying the
    * m00 stored-media schema (doc_id, kind, format, media BINARY) —
    * the production shape, where each micro-batch's bytes arrive in a
    * binary column and are decoded map-only. Both are
    * (kind, fingerprint)-keyed, so the index and verdict semantics are
    * identical; StreamingSpec pins the two paths verdict-equal. */
  type FingerprintFn = DataFrame => DataFrame

  /** Seed the fingerprint index from the initial corpus (batch_id=-1). */
  def seed(docs: DataFrame, indexDir: String,
           fingerprints: FingerprintFn = Multimodal.mediaFingerprints): Unit = {
    val spark = docs.sparkSession
    fingerprints(docs)
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=-1")
    // count the WRITTEN shard (parquet metadata count), not the decode
    // plan — the one-time seed cost, O(seed corpus footers)
    val n = spark.read.parquet(s"$indexDir/batch_id=-1").count()
    writeShardCount(spark, indexDir, -1L, n)
  }

  /** The verdict plan for one batch against the stored index shards
    * strictly earlier than `batchId` — exposed (package-private) so the
    * spec can assert the gate's plan shape (broadcast vs shuffled)
    * without going through the sink. */
  private[graft] def verdictBatch(batch: DataFrame, batchId: Long,
                                  indexDir: String,
                                  broadcastMaxRows: Long,
                                  fingerprints: FingerprintFn =
                                    Multimodal.mediaFingerprints): DataFrame = {
    val spark = batch.sparkSession
    spark.catalog.refreshByPath(indexDir)
    val stored = spark.read.parquet(indexDir)
      .filter(col("batch_id") < batchId)
      .select(col("kind"), col("fingerprint")).distinct()
      .withColumn("_seen", lit(1))
    // size gate from the running-count sidecar: O(#batches) driver-side
    // file reads, NO Spark job, and `stored` is scanned exactly once
    // (in the join). Pre-sidecar index dirs fall back to counting once.
    val storedRows = sidecarCountBefore(spark, indexDir, batchId)
      .getOrElse(stored.count())
    val probe =
      if (storedRows <= broadcastMaxRows) broadcast(stored) else stored
    val fps = fingerprints(batch)
    // batch-local keep-first: min doc_id per (kind, fingerprint)
    val w = Window.partitionBy("kind", "fingerprint")
    fps
      .withColumn("_min_id", min(col("doc_id")).over(w))
      .join(probe, Seq("kind", "fingerprint"), "left")
      .select(col("doc_id"), col("kind"), col("format"), col("fingerprint"),
        (col("_seen").isNotNull || col("doc_id") =!= col("_min_id")).as("is_dup"))
  }

  /** Verdict one micro-batch (or any static frame) against the stored
    * index shards strictly earlier than `batchId`, append the kept
    * docs' fingerprints, and return the verdicts
    * (doc_id, kind, format, fingerprint, is_dup). */
  def ingestBatch(batch: DataFrame, batchId: Long, indexDir: String,
                  outDir: String,
                  broadcastMaxRows: Long = DefaultBroadcastMaxRows,
                  fingerprints: FingerprintFn = Multimodal.mediaFingerprints): Unit = {
    val spark = batch.sparkSession
    val verdicts = verdictBatch(batch, batchId, indexDir, broadcastMaxRows,
      fingerprints)
    verdicts.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
    spark.catalog.refreshByPath(outDir)
    spark.read.parquet(s"$outDir/batch_id=$batchId")
      .filter(!col("is_dup"))
      .select("doc_id", "kind", "format", "fingerprint")
      .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
    spark.catalog.refreshByPath(indexDir)
    // maintain the gate's running count: O(this batch's shard footers)
    val kept = spark.read.parquet(s"$indexDir/batch_id=$batchId").count()
    writeShardCount(spark, indexDir, batchId, kept)
  }

  /** Run the stream: verdicts land in batchId-keyed parquet under
    * `outDir`; the fingerprint index grows by each batch's kept docs. */
  def start(docs: DataFrame, indexDir: String, outDir: String,
            checkpointDir: String,
            trigger: Trigger = Trigger.AvailableNow(),
            broadcastMaxRows: Long = DefaultBroadcastMaxRows,
            fingerprints: FingerprintFn = Multimodal.mediaFingerprints): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, indexDir, outDir, broadcastMaxRows,
          fingerprints)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}

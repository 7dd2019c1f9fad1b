package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Incremental-dedup cost probe: chain-rebuild vs indexed incremental on
  * the same (corpus, batch) split — the measurement behind SCALE.md's
  * "per-batch cost O(batch + candidates)" claim. Both forms compute the
  * SAME pair increment (DedupSpec pins equality); what differs is what
  * they touch: the chain form re-shingles/re-signs the whole corpus
  * before its probe, the indexed form reads a stored banded-signature
  * table and touches old docs only where candidates demand.
  *
  * Usage: runMain graft.IncrementalProbe [docsDir] [batchSize] [reps]
  * (docsDir holds documents.parquet — use tools/make_scaled.py
  * documents-mutated N for honest LSH replicas.)
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val docsDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = if (args.length > 1) args(1).toInt else 500
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val all = Tables.documents(spark, docsDir)
    val nAll = all.count()
    val cut = all.agg(max("doc_id")).head.getLong(0) - batchSize
    val batch = all.filter(col("doc_id") > cut)
    val newIds = batch.select("doc_id")
    val seedDocs = all.filter(col("doc_id") <= cut)
    // the stored tables a continuous ingest would already have
    val work = java.nio.file.Files.createTempDirectory("graft_incrprobe").toString
    Dedup.writeBandedSignatures(seedDocs, s"$work/index")
    val nBatch = batch.count()

    def time(label: String)(body: => Long): Unit = {
      val secs = (1 to reps).map { _ =>
        Dedup.releaseCaches()
        val t0 = System.nanoTime(); val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val best = secs.minBy(_._1)
      println(f"""{"probe":"incremental","form":"$label","corpus_rows":$nAll,"batch_rows":$nBatch,"pairs":${best._2},"sec":${math.round(best._1 * 1000) / 1000.0},"docs":"$docsDir"}""")
    }
    time("chain_rebuild") {
      Dedup.incrementalVerifiedPairs(all, newIds, 0.5).count()
    }
    time("indexed") {
      val index = Dedup.readBandedSignatures(spark, s"$work/index")
      Dedup.incrementalVerifiedPairsIndexed(all, index, batch, 0.5).count()
    }
    spark.stop()
  }
}

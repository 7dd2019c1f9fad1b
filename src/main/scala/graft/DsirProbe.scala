package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Measures DSIR scoring cost as the corpus scales — the evidence row
  * SCALE.md cites for the importance-resampling family. The claim under
  * test: per-corpus cost is LINEAR (one explode + one doc-keyed
  * aggregate + a broadcast of the fixed 4096-row model), and the
  * frozen-model streaming form ([[Sampling.dsirScoreAgainst]]) scores a
  * constant-size batch in CONSTANT time regardless of how large the
  * corpus that estimated the model was.
  *
  * Replicas are deterministic mutations: replica r re-ids docs into a
  * disjoint range and swaps a hash-chosen token for a replica-specific
  * one, so replica grams spread over hash buckets the way fresh corpus
  * text would. Prints one JSON line per scale; runMain graft.DsirProbe
  * [sfDir] [maxScale].
  */
object DsirProbe {

  def replicate(docs: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { r =>
      if (r == 0) docs.select(col("doc_id"), col("text"), col("lang"))
      else docs.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        concat(col("text"), lit(s" replicatoken$r")).as("text"),
        col("lang"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxScale = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.documents(spark, sfDir)
    val isEn = col("lang") === "en"
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // fixed-size batch for the frozen-model leg: the ×1 corpus
    val batch = replicate(base, 1)
    var scale = 1
    while (scale <= maxScale) {
      val corpus = replicate(base, scale)
      val n = corpus.count()
      // warm + measure: full self-scored pipeline (estimate + score)
      val tSelf = (0 until 2).map(_ =>
        timed(Sampling.dsirScores(corpus, isEn).foreach(_ => ()))).min
      // frozen-model leg: model from the ×scale corpus, batch constant
      val dist = Sampling.dsirDistribution(corpus, isEn)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      dist.count()
      val tBatch = (0 until 2).map(_ =>
        timed(Sampling.dsirScoreAgainst(batch, dist).foreach(_ => ()))).min
      dist.unpersist(blocking = false)
      println(f"""{"scale":$scale,"docs":$n,"self_score_sec":$tSelf%.3f,"frozen_batch_sec":$tBatch%.3f}""")
      scale *= 4
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** LSH dedup accuracy probe: banding recall of the MinHash candidate
  * stage against EXACT ground truth, per Jaccard threshold — the dedup
  * sibling of [[RecallProbe]], so the (k, bands) parameter trade the
  * code comments claim is on the record.
  *
  * Ground truth = every doc pair sharing at least one trigram shingle,
  * exact-Jaccard'd and thresholded (no banding anywhere: the inverted
  * shingle join finds EVERY pair with J > 0). The engine side is the
  * production [[Dedup.verifiedPairs]] chain (16-min signature, 4-band
  * self-join, exact verify) — its verify stage makes precision 1.0 by
  * construction, so the number that can be lost is RECALL: true pairs
  * whose signatures never collided in any band.
  *
  * Usage: runMain graft.DedupProbe [sfDir] [thresholds csv]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val thresholds = (if (args.length > 1) args(1) else "0.5,0.7,0.8,0.9")
      .split(",").map(_.trim.toDouble).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    // exact ground truth: inverted-index join on shingles → common
    // counts for every J>0 pair, sizes joined back → exact Jaccard
    val sh = Dedup.wordShingles(docs).persist()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.select(col("doc_id").as("i"), col("s"))
      .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("common"))
    val truthAll = common
      .join(sizes.select(col("doc_id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("doc_id").as("j"), col("n").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("common").cast("double") / (col("ni") + col("nj") - col("common"))).as("jaccard"))
      .persist()
    truthAll.count()

    for (t <- thresholds) {
      val truth = truthAll.filter(col("jaccard") >= t)
        .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Dedup.releaseCaches()
      val got = Dedup.verifiedPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hit = got.intersect(truth).size
      val recall = if (truth.isEmpty) 1.0 else hit.toDouble / truth.size
      val spurious = got.diff(truth).size // must be 0: verify is exact
      println(f"""{"probe":"dedup_recall","threshold":$t,"truth_pairs":${truth.size},"found_pairs":${got.size},"recall":${math.round(recall * 10000) / 10000.0},"spurious":$spurious,"sf":"$sfDir"}""")
    }
    sh.unpersist(); truthAll.unpersist()
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for the decontamination pipeline: times
  * each stage of d12 in isolation so optimization targets the measured
  * bottleneck (like [[Profile]], not part of the driver contract). */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/docs_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= "src0")
    println(s"[probe] scan partitions = " +
      corpus.select("text").rdd.getNumPartitions)
    time("scan+split only") {
      corpus.select(explode(split(col("text"), " ")).as("t")).count()
    }
    time("shingles (no distinct)") {
      corpus.select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("w")) - 3),
            i => concat_ws(" ", element_at(col("w"), i + 1),
              element_at(col("w"), i + 2), element_at(col("w"), i + 3)))).as("s"))
        .count()
    }
    time("wordShingles (distinct)") {
      graft.operators.Dedup.wordShingles(corpus).count()
    }
    val evalSh = graft.operators.Dedup.evalShingleSet(
      docs.filter(col("source") === "src0"))
    time("full decontaminate") {
      graft.operators.Dedup.decontaminateAgainst(corpus, evalSh).count()
    }
    // 8-byte hashed join keys vs exact strings: the candidate production
    // twin (64-bit collisions are ~1e-9 at benchmark-set scale)
    time("decontaminate (hashed keys)") {
      val ev = evalSh.select(xxhash64(col("s")).as("h")).distinct()
        .withColumn("_hit", lit(1))
      graft.operators.Dedup.wordShingles(corpus)
        .select(col("doc_id"), xxhash64(col("s")).as("h"))
        .join(broadcast(ev), Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"), count(col("_hit")).as("n_overlap"))
        .filter(col("n_overlap") >= 2)
        .count()
    }
    // Bloom probe twin (d13's engine path): map-only per-doc array probe
    // against the broadcast filter — no explode-to-join, no aggregate
    // exchange. Build time reported separately (amortized once per
    // benchmark set in production).
    val tB0 = System.nanoTime()
    val bf = graft.operators.Dedup.evalShingleBloom(
      docs.filter(col("source") === "src0"))
    println(f"[probe] bloom build (once/eval set) ${(System.nanoTime() - tB0) / 1e9}%8.3f s  bits=${bf.bitSize()}")
    time("decontaminate (bloom probe)") {
      graft.operators.Dedup.decontaminateBloom(corpus, bf).count()
    }
    // span-dedup pair (t11): exact string-keyed keeper join vs the
    // xxhash64-keyed production twin — the 8-byte-key trade measured on
    // the same corpus
    time("spanDedup (exact)") {
      graft.operators.TextAnalysis.spanDedup(docs).count()
    }
    time("spanDedup (hashed keys)") {
      graft.operators.TextAnalysis.spanDedupHashed(docs).count()
    }
    // embedding-side twin: interpreted transform(cast) vs direct mixed-
    // width dot_product through the bucket stage (pass an embeddings dir
    // as a second arg to run it)
    args.drop(1).headOption.foreach { embDir =>
      val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      val planes = 8
      def buckets(v: org.apache.spark.sql.Column) =
        graft.operators.Similarity.bucketId(v, planes, 64)
      time("bucketId over cast-double") {
        emb.select(transform(col("embedding"), x => x.cast("double")).as("dv"))
          .select(buckets(col("dv")).as("b"))
          .groupBy("b").count().count()
      }
      time("bucketId over raw float") {
        emb.select(buckets(col("embedding")).as("b"))
          .groupBy("b").count().count()
      }
    }
    spark.stop()
  }
}

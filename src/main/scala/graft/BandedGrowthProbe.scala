package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures CANDIDATE-PAIR growth of the two embedding near-dup
  * blockings as the corpus scales — the evidence row SCALE.md cites for
  * the round-10 banded rework. The quadratic hazard lives in the pair
  * GENERATION stage (candidates fed to the cosine verify), so that is
  * what this probe counts, on mutated corpus replicas at ×1/×2/×4/×8:
  *
  *   - single-table planes=4 (round 9's s09 blocking): 16 buckets
  *     FOREVER, so candidates = Σ_b c_b·(c_b−1)/2 ≈ n²/32 — counted by
  *     that closed form (generating them at ×8 is exactly the blow-up
  *     being demonstrated);
  *   - banded tables=4 with planes ≈ log₂ n (the production rule: bucket
  *     count scales WITH the corpus, per-bucket occupancy stays O(1)):
  *     candidates = |distinct same-bucket-in-any-table pairs|, counted
  *     from the materialized distinct union — the actual work the
  *     production operator does.
  *
  * Replicas are deterministic mutations (xxhash64-derived per-element
  * jitter), not exact copies, so replica vectors spread over buckets the
  * way fresh corpus data would instead of stacking onto their source's
  * exact signature. Prints one JSON line per scale; runMain
  * graft.BandedGrowthProbe [sfDir] [maxScale].
  */
object BandedGrowthProbe {

  /** ×`factor` corpus: replica r re-ids vectors into a disjoint range and
    * jitters each element by a deterministic ±4.5% hash ramp. */
  def replicate(emb: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { r =>
      if (r == 0) emb.select(col("vec_id"), col("embedding"))
      else emb.select(
        (col("vec_id") + lit(r * 10000000L)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0f) + lit(0.01f) *
            (pmod(xxhash64(col("vec_id") * lit(31) + i + lit(r)), lit(9)) - lit(4))
              .cast("float"))).as("embedding"))
    }.reduce(_ unionByName _)

  /** Single-table candidate count via the per-bucket closed form —
    * Σ c·(c−1)/2 without generating the pairs. */
  def singleTableCandidates(emb: DataFrame, planes: Int): Long = {
    val dim = graft.operators.Similarity.embeddingDim(emb)
    emb.select(graft.operators.Similarity.bucketId(col("embedding"), planes, dim).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("pairs"))
      .head.getLong(0)
  }

  /** Banded candidate count: the distinct union the production operator
    * verifies — same signature relation as Similarity.nearDupPairsLsh. */
  def bandedCandidates(emb: DataFrame, planes: Int, tables: Int): Long = {
    val dim = graft.operators.Similarity.embeddingDim(emb)
    val sigs = emb.select(col("vec_id"), explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          graft.operators.Similarity.bucketId(col("embedding"), planes, dim, t * planes)
            .as("bucket"))): _*)).as("s"))
      .select(col("vec_id"), col("s.tbl").as("tbl"), col("s.bucket").as("bucket"))
    sigs.as("l").join(sigs.as("r"),
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("i"), col("r.vec_id").as("j"))
      .distinct().count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxScale = if (args.length > 1) args(1).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    var scale = 1
    while (scale <= maxScale) {
      val corpus = replicate(base, scale).cache()
      val n = corpus.count()
      // production plane rule: per-table bucket count tracks corpus size
      val bandPlanes = math.max(4, math.ceil(math.log(n.toDouble) / math.log(2)).toInt - 7)
      val singles = singleTableCandidates(corpus, 4)
      val banded = bandedCandidates(corpus, bandPlanes, 4)
      println(s"""{"probe":"banded_growth","sf":"$sfDir","scale":$scale,"n":$n,""" +
        s""""single_table_cands":$singles,"single_per_vec":${singles.toDouble / n},""" +
        s""""banded_planes":$bandPlanes,"banded_cands":$banded,"banded_per_vec":${banded.toDouble / n}}""")
      corpus.unpersist()
      scale *= 2
    }
    spark.stop()
  }
}

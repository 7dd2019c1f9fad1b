package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline — the composition a training-
  * data deployment actually runs, as ONE lazy plan + the dedup cluster
  * stage: exact dedup → near-dup cluster resolution → quality filter →
  * deterministic sample. Every stage is an operator this library already
  * verifies in isolation; this wires them with keep-semantics that are
  * themselves oracle-checked end-to-end (`p09_curated_corpus`).
  *
  * Keep rules, in order:
  *   1. exact: keep the min doc_id per md5(text) group (tiny docs that
  *      produce no shingles are still exact-deduped here);
  *   2. near: drop docs that sit in a verified Jaccard cluster and are
  *      not its canonical (min-id) member — transitive chains collapse
  *      to one survivor, never pairwise-kept both ends;
  *   3. quality: drop docs scoring under `minQuality` (t02's formula);
  *   4. sample: md5-bucket membership on doc_id (reproducible subsets).
  *
  * Scale: stages 1, 3, 4 are map-side predicates / one window each; the
  * near-dup stage is the LSH+verify+components pipeline whose cost lives
  * on candidates, not the corpus square. The final relation is a single
  * plan — Catalyst pushes the cheap predicates below the expensive join
  * where legal. */
object Pipeline {

  /** @param ccMaxIter label-propagation round cap for the near-dup
    *   cluster stage. Bounds component DIAMETER, so the default 20 covers
    *   any plausibly-near-duplicate cluster; raise it if a chain-shaped
    *   candidate graph (long a~b~c~... runs) makes minLabel throw rather
    *   than return partially-merged clusters. */
  def curate(docs: DataFrame, jaccardThreshold: Double = 0.8,
             minQuality: Double = 0.3, sampleBuckets: Int = 256,
             ccMaxIter: Int = 20): DataFrame =
    curateRel(docs, jaccardThreshold, minQuality, sampleBuckets, ccMaxIter)
      .orderBy("doc_id")

  /** Stages 1–3 (exact → near → quality), text still attached — the
    * relation the sample stage and the p25 perplexity gate both
    * consume. */
  private def qualitySurvivors(docs: DataFrame, jaccardThreshold: Double,
                               minQuality: Double, ccMaxIter: Int): DataFrame = {
    // stage 1: exact-duplicate canonical (no shuffle beyond the window)
    val wExact = Window.partitionBy(md5(col("text")))
    val exactKept = docs
      .withColumn("_min_id", min(col("doc_id")).over(wExact))
      .filter(col("doc_id") === col("_min_id")).drop("_min_id")
    // stage 2: near-dup clusters over the FULL corpus (so a kept doc
    // can still be dropped for near-duplicating a doc removed in stage 1)
    val dropNear = Dedup.verifiedClusters(docs, jaccardThreshold, maxIter = ccMaxIter)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("_drop_id"))
    // stage 3: quality floor. quality_score is a pure per-row function
    // of text, so it is scored IN PLACE (qualityScoreExpr) — joining
    // back to a second scan of the corpus would add a full doc_id
    // shuffle and a redundant read for a value the surviving rows
    // already carry the input to.
    exactKept
      .join(dropNear, col("doc_id") === col("_drop_id"), "left_anti")
      .withColumn("quality_score", TextAnalysis.qualityScoreExpr(col("text")))
      .filter(col("quality_score") >= minQuality)
  }

  private def curateRel(docs: DataFrame, jaccardThreshold: Double,
                        minQuality: Double, sampleBuckets: Int,
                        ccMaxIter: Int): DataFrame =
    // stage 4: deterministic sample membership
    qualitySurvivors(docs, jaccardThreshold, minQuality, ccMaxIter)
      .filter(Sampling.hashBucketPred(col("doc_id"), sampleBuckets))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality_score"))

  /** The corpus → training-chunks handoff (p16): the curated keep set,
    * texts re-attached by a doc_id semi-join, then the p14 chunker over
    * the survivors — curation, near-dup clustering, quality, sampling
    * and chunking in ONE lazy plan. At scale the keep set is the small
    * side of the semi-join (curation is subtractive), and the chunker
    * rides the survivor scan map-only; Catalyst orders the cheap
    * predicates below the expensive verify join exactly as in
    * [[curate]]. */
  def curatedChunks(docs: DataFrame, jaccardThreshold: Double = 0.8,
                    minQuality: Double = 0.3, sampleBuckets: Int = 256,
                    window: Int = 64, stride: Int = 48,
                    ccMaxIter: Int = 20): DataFrame = {
    val kept = curateRel(docs, jaccardThreshold, minQuality, sampleBuckets,
      ccMaxIter).select("doc_id")
    Packing.chunkDocs(docs.join(kept, Seq("doc_id"), "left_semi"), window, stride)
  }

  /** p25: the curation pipeline with the LM-PERPLEXITY gate composed in
    * — exact → near → quality → perplexity → sample → chunk. The
    * perplexity stage is [[Sampling.lmPerplexity]] run over the
    * QUALITY SURVIVORS (model estimated on their `refPred` slice,
    * CCNet terciles over their scored pool): the filter's passes ride
    * the survivor relation, never the raw corpus — no extra corpus
    * pass beyond the scorer's own. Docs with < 2 tokens carry no LM
    * evidence and pass through unjudged (left-anti against the TAIL
    * tercile, the same contract the span/gram operators use for
    * too-short docs).
    *
    * The survivor relation is localCheckpoint'ed before scoring:
    * [[Sampling.lmPerplexity]] executes model-estimation and rank jobs
    * eagerly, and each would otherwise re-run the LSH + verify +
    * components curation plan (5× the most expensive stage). One
    * materialization of the SUBTRACTIVE survivor set is the composed
    * pipeline's cost model — at deployment scale that table persists
    * to storage between the curation and scoring phases anyway. */
  def curatedChunksLm(docs: DataFrame, refPred: org.apache.spark.sql.Column,
                      jaccardThreshold: Double = 0.8, minQuality: Double = 0.3,
                      sampleBuckets: Int = 256, window: Int = 64,
                      stride: Int = 48, lambda: Double = 0.7,
                      ccMaxIter: Int = 20): DataFrame = {
    val surv = qualitySurvivors(docs, jaccardThreshold, minQuality, ccMaxIter)
      .select("doc_id", "text", "lang").localCheckpoint()
    val tail = Sampling.lmPerplexity(surv, refPred, lambda)
      .filter(col("ppl_bucket") === "tail").select("doc_id")
    // chunk straight off the checkpointed survivors — they already carry
    // (doc_id, text, lang), so no second corpus scan + semi-join to
    // re-attach text (p16 rejoins because ITS curated relation dropped
    // text; that precondition doesn't hold here)
    Packing.chunkDocs(
      surv.join(tail, Seq("doc_id"), "left_anti")
        .filter(Sampling.hashBucketPred(col("doc_id"), sampleBuckets)),
      window, stride)
  }
}

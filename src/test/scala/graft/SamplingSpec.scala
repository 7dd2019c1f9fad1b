package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

class SamplingSpec extends SparkSpec {

  private def docs(n: Int) = df(
    "doc_id BIGINT, text STRING, lang STRING, n_chars BIGINT",
    (0 until n).map(i =>
      Row(i.toLong, s"word$i common filler", if (i % 2 == 0) "en" else "de", 18L)))

  test("hash sample is deterministic and nested: 1/8 sample is a subset of 1/4") {
    val d = docs(400)
    val quarter = Sampling.hashSample(d, buckets = 64).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val eighth = Sampling.hashSample(d, buckets = 32).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(eighth.subsetOf(quarter), "smaller rate must be contained in larger")
    // deterministic: same input → identical membership on re-evaluation
    val again = Sampling.hashSample(d, buckets = 64).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == quarter)
    // rate lands near buckets/256 (md5 is uniform; 400 draws at p=0.25)
    assert(quarter.size > 400 * 0.25 * 0.5 && quarter.size < 400 * 0.25 * 2.0)
  }

  test("stratified summary accounts every stratum exactly") {
    val d = docs(200)
    val sum = Sampling.stratifiedSummary(d, buckets = 64).collect()
    assert(sum.map(_.getAs[String]("lang")).toSeq == Seq("de", "en"))
    assert(sum.map(_.getAs[Long]("total")).sum == 200L)
    val direct = Sampling.hashSample(d, buckets = 64).count()
    assert(sum.map(_.getAs[Long]("sampled")).sum == direct,
      "per-stratum sampled counts must sum to the flat sample size")
  }

  test("tfidf ranks rarer terms above ubiquitous ones at equal tf") {
    // 4 docs all share 'common'; each has a unique term with the same tf
    val d = df(
      "doc_id BIGINT, text STRING",
      (0 until 4).map(i => Row(i.toLong, s"common unique$i")))
    val out = TextAnalysis.tfidfTopTerms(d, maxDocId = 4, topK = 2).collect()
    // rank 1 is always the unique term (df=1); 'common' has idf=ln(1)=0
    val rank1 = out.filter(_.getAs[Int]("rank") == 1)
    assert(rank1.length == 4 && rank1.forall(_.getAs[String]("term").startsWith("unique")))
    assert(out.filter(_.getAs[String]("term") == "common")
      .forall(r => r.getAs[Double]("tfidf") == 0.0))
    // df is corpus-wide even when output is doc-restricted
    val restricted = TextAnalysis.tfidfTopTerms(d, maxDocId = 1, topK = 2).collect()
    assert(restricted.filter(_.getAs[String]("term") == "common")
      .forall(_.getAs[Long]("df") == 4L))
  }
}

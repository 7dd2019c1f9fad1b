package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Sketch scale-paths: accuracy bounds that make them usable stand-ins
  * for the exact operators at 100 TB. */
class SketchSpec extends SparkSpec {

  private lazy val prep = FtlFixture.prep(spark, 9, 3000)

  test("HLL daily rollup estimate is within 5% of the exact distinct count") {
    val exact = prep.select(countDistinct("domain")).head.getLong(0)
    val est = Stats.hllDailyDomains(prep).head.getLong(1)
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("approx_count_distinct is within its documented error bound") {
    val exact = prep.select(countDistinct("client")).head.getLong(0)
    val approx = Stats.approxDistinct(prep).head.getLong(1)
    assert(math.abs(approx - exact).toDouble / math.max(exact, 1) < 0.1)
  }

  test("count-min sketch frequency estimates are upper bounds that are tight for heavy hitters") {
    val cmsRow = prep.agg(
      count_min_sketch(col("domain"), lit(0.01), lit(0.99), lit(42)).as("cms")).head
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(cmsRow.getAs[Array[Byte]](0)))
    val trueCounts = prep.groupBy("domain").count()
      .orderBy(desc("count"), asc("domain")).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    trueCounts.foreach { case (d, c) =>
      val est = cms.estimateCount(d)
      assert(est >= c, s"CMS must never under-count: $d $est < $c")
      assert(est <= c + (0.01 * 3000).toLong, s"CMS too loose for heavy hitter $d")
    }
  }

  test("CMS daily rollup: merged per-day sketches bound the top-N exact counts") {
    val out = Stats.cmsDomainEstimates(prep).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_cnt"), r.getAs[Long]("cms_est"))
      assert(est >= exact, s"merged CMS under-counted ${r.getString(0)}: $est < $exact")
      // ε=0.001 at 3000 rows → ±3; deterministic given the fixed seed
      assert(est <= exact + 3, s"merged CMS too loose for ${r.getString(0)}")
    }
    val again = Stats.cmsDomainEstimates(prep).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "must be deterministic")
  }

  test("percentile_approx stays within its rank-error guarantee vs the exact percentile") {
    // approx_percentile(acc) guarantees a result whose RANK is within
    // n/acc of the target rank — the scale swap a23 documents. Verify by
    // rank, not value: find the exact ranks of the approx answers.
    import org.apache.spark.sql.functions._
    val prep = FtlFixture.prep(spark, 3, 4000).filter(col("reply_time").isNotNull)
    val acc = 100
    val n = prep.count()
    val sorted = prep.select("reply_time").collect().map(_.getDouble(0)).sorted
    for (p <- Seq(0.5, 0.9, 0.99)) {
      val approx = prep.agg(
        expr(s"approx_percentile(reply_time, $p, $acc)")).head.getDouble(0)
      // rank of the approx answer in the exact ordered data
      val rank = sorted.count(_ <= approx)
      val target = p * n
      assert(math.abs(rank - target) <= n.toDouble / acc + 1,
        s"p=$p approx=$approx rank=$rank target=$target n=$n")
    }
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  // skewed fact: one hot key (90% of rows) + long tail
  private lazy val big = {
    val rows = (1 to 2000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"key${i % 37}"
      Row(k, i.toLong, i * 1.5)
    }
    df("k STRING, id BIGINT, v DOUBLE", rows)
  }
  private lazy val dim = df("k STRING, label STRING",
    ("hot" +: (0 until 37).map(i => s"key$i")).distinct.map(k => Row(k, s"L-$k")))

  test("salted join equals the plain join") {
    val plain = big.join(dim, Seq("k")).select("k", "id", "label")
    val salted = Skew.saltedJoin(big, dim, "k", factor = 8, saltSource = Seq("id"))
      .select("k", "id", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted two-phase count equals plain groupBy count") {
    val plain = big.groupBy("k").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(big, "k", factor = 8, saltSource = Seq("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salt is deterministic and spreads the hot key") {
    val salts = big.filter(col("k") === "hot")
      .select(Skew.salt(8, col("id")).as("s"))
    val distinctSalts = salts.distinct().count()
    assert(distinctSalts == 8) // hot key spread over all buckets
    // determinism: same input → same salts on recompute
    assert(salts.exceptAll(salts).count() == 0)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // the built-in alternative to manual salting: shrink the skew
    // thresholds so the 'hot' partition qualifies, force SMJ (no
    // broadcast), and check the executed plan flagged the skew split
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val bigDim = dim.crossJoin(spark.range(40)).select(col("k"),
        concat(col("label"), lit("-"), col("id")).as("label"))
      val joined = big.join(bigDim, Seq("k")).select("k", "id", "label")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("skew=true"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

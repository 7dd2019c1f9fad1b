package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions

class ExtensionsSpec extends SparkSpec {

  test("native expressions are SQL-callable after registration") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "rolling_hash('abc') AS rh").head
    assert(r.getDouble(0) == 11.0)
    // same value as the Column-API path — one implementation, two surfaces
    val viaColumn = spark.range(1)
      .select(graft.functions.rolling_hash(lit("abc")).as("rh")).head.getLong(0)
    assert(r.getLong(1) == viaColumn)
    // analysis-time type checking still fires through the SQL surface
    val err = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0D), array(1))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot_product"))
    // the aggregate registers too — grouped top-k straight from SQL
    val tk = spark.sql(
      "SELECT g, topk_by_score(s, id, 2) AS top FROM VALUES " +
        "('a', 0.5D, 1L), ('a', 0.9D, 2L), ('a', 0.7D, 3L), ('b', 0.1D, 4L) " +
        "t(g, s, id) GROUP BY g ORDER BY g").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(p => (p.getDouble(0), p.getLong(1))))
    assert(tk.toSeq == Seq(
      "a" -> Seq((0.9, 2L), (0.7, 3L)), "b" -> Seq((0.1, 4L))))
    // mixed float×double dot is exact widening — same value as all-double
    val mixed = spark.sql(
      "SELECT dot_product(array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT)), " +
        "array(3.0D, 4.0D)) AS d").head.getDouble(0)
    assert(mixed == 1.5 * 3.0 + 2.5 * 4.0)
    // the n-gram pair: distinct (set) vs word_ngrams (multiset, ordered)
    val ng = spark.sql(
      "SELECT distinct_shingles(split('a b a b c', ' '), 2) AS ds, " +
        "word_ngrams(split('a b a b c', ' '), 2) AS wn").head
    assert(ng.getSeq[String](0) == Seq("a b", "b a", "b c"))
    assert(ng.getSeq[String](1) == Seq("a b", "b a", "a b", "b c"))
    // null array elements follow concat_ws semantics (skipped, no NPE) —
    // split() never produces them, but the SQL surface accepts any array
    val withNull = spark.sql(
      "SELECT distinct_shingles(array('a', CAST(NULL AS STRING), 'b', 'c'), 3) AS s")
      .head.getSeq[String](0)
    assert(withNull == Seq("a b", "b c"))
    // wrong-typed input rejected at ANALYSIS, not misread at runtime
    val badType = intercept[Exception] {
      spark.sql("SELECT distinct_shingles(array(1, 2, 3), 3)").collect()
    }
    assert(badType.getMessage.toLowerCase.contains("distinct_shingles"))
    // the struct sibling: gram agrees with word_ngrams(n=2), and each
    // struct's prev/cur ARE the gram's members (no re-split needed)
    val bs = spark.sql(
      "SELECT word_bigram_structs(split('a b a b c', ' ')) AS s").head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(bs == Seq(("a b", "a", "b"), ("b a", "b", "a"),
      ("a b", "a", "b"), ("b c", "b", "c")))
    // 0- and 1-token arrays yield empty (no pair exists)
    assert(spark.sql("SELECT word_bigram_structs(array('x')) AS s").head
      .getSeq[Any](0).isEmpty)
    val badBs = intercept[Exception] {
      spark.sql("SELECT word_bigram_structs(array(1, 2))").collect()
    }
    assert(badBs.getMessage.toLowerCase.contains("word_bigram_structs"))
  }

  test("extension injector: GraftExtensions.apply wires builders a registry can resolve") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry, SimpleFunctionRegistry}
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    // The cluster-deployment path is spark.sql.extensions=
    // graft.functions.GraftExtensions, which Spark honors only for the
    // FIRST session of a SparkContext — unreachable from a shared-session
    // spec. Exercise the exact same code instead: apply the injector to a
    // real SparkSessionExtensions and drain it into a registry.
    // (registerFunctions is private[sql] in source, public in bytecode.)
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(exts)
    val reg = new SimpleFunctionRegistry
    exts.getClass
      .getMethod("registerFunctions", classOf[FunctionRegistry])
      .invoke(exts, reg)
    for (name <- Seq("dot_product", "rolling_hash", "topk_by_score"))
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")
    // the injected builder must produce a working expression, not just a name
    val rh = reg.lookupFunction(FunctionIdentifier("rolling_hash"),
      Seq(Literal.create("abc"): Expression))
    val viaColumn = spark.range(1)
      .select(graft.functions.rolling_hash(lit("abc")).as("rh")).head.getLong(0)
    assert(rh.eval(null) == viaColumn)
  }

  test("dynamic partition pruning: dim filter reaches the partitioned fact scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val d = "/root/testdata/sf0.001"
    // partition the fact by a join-key-derived column, then join against
    // a FILTERED dim — at 100 TB the scan must prune partitions from the
    // dim filter at RUNTIME (the predicate is not known statically)
    Tables.orders(spark, d)
      .withColumn("o_bucket", (col("o_custkey") % 10).cast("int"))
      .write.partitionBy("o_bucket").parquet(s"$dir/orders")
    val fact = spark.read.parquet(s"$dir/orders")
    val dim = Tables.customer(spark, d)
      .withColumn("c_bucket", (col("c_custkey") % 10).cast("int"))
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_bucket").distinct()
    val conf = spark.conf
    val saved = Seq("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val joined = fact.join(dim, col("o_bucket") === col("c_bucket"))
        .groupBy("o_bucket").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), plan.take(600))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

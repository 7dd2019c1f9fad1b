package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape regression tests: the performance claims in SCALE.md are
  * properties of the compiled plans — pin them so a refactor that
  * silently loses a pushdown, a broadcast, or column pruning fails CI,
  * not the next 100 TB run. */
class PlanSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val dir = "/root/testdata/sf0.001"

  private def executed(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def leafScans(df: DataFrame): Seq[String] =
    collectLeaves(executed(df)).map(_.toString)

  test("a01_totals compiles to a single-column scan (column pruning through preprocess)") {
    val scans = leafScans(SparkEntry.queries("a01_totals")(spark, dir))
    assert(scans.size == 1)
    assert(scans.head.contains("ReadSchema: struct<event_type:string>"), scans.head)
  }

  test("p02 regex filter reaches the scan layer, two-column read") {
    val scan = leafScans(SparkEntry.queries("p02_regex_filter")(spark, dir)).head
    assert(scan.contains("event_type:string") && scan.contains("props:string"))
    assert(!scan.contains("value:double"), "unused columns must be pruned")
  }

  test("h05 join chain: date range pushed into the orders scan, dims broadcast") {
    val df = SparkEntry.queries("h05_region_revenue")(spark, dir)
    val scans = leafScans(df)
    val ordersScan = scans.find(_.contains("orders.parquet")).get
    assert(ordersScan.contains("GreaterThanOrEqual(o_orderdate") &&
      ordersScan.contains("LessThan(o_orderdate"), ordersScan)
    val plan = executed(df).toString
    assert(plan.contains("BroadcastHashJoin"), "dimension joins must broadcast")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = executed(SparkEntry.queries("a04_top_client")(spark, dir)).toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("semi-join against top-k is a broadcast left-semi") {
    val plan = executed(SparkEntry.queries("a17_client_activity")(spark, dir)).toString
    assert(plan.contains("LeftSemi") && plan.contains("Broadcast"), plan)
  }

  test("partitioned-window operators shuffle by the partition key, not globally") {
    // sessionize: exactly one shuffle of the fact table, keyed by client
    val df = graft.operators.Streaks.sessionize(
      Preprocess.preprocessEvents(Tables.events(spark, dir)), 1800)
    val shuffles = collect(executed(df)) { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty &&
      shuffles.exists(_.outputPartitioning.toString.contains("client")),
      shuffles.map(_.outputPartitioning).mkString(";"))
  }

  test("w02/w03 flagship plans carry no Window operator at all") {
    // longest streak / longest idle route through the parallel two-pass
    // machinery: the plan is a TakeOrdered (w02) or a LocalRelation-fed
    // projection (w03) over the run relation — an unpartitioned Window
    // here would mean the single-task scale hazard is back
    val w02 = SparkEntry.queries("w02_longest_streaks")(spark, dir)
    assert(!executed(w02).toString.contains("Window"),
      "w02 must not contain any Window operator")
    val w03 = SparkEntry.queries("w03_longest_idle")(spark, dir)
    assert(!executed(w03).toString.contains("Window"),
      "w03 must not contain any Window operator")
  }

  test("d10 hints exactly one broadcast (candidates side only)") {
    // the round-4 shape double-broadcast the joined candidates×signature
    // relation — a driver OOM at scale; the second join's strategy is
    // left to AQE. Pinned on the ANALYZED plan (hint count is a property
    // of the code, where physical broadcast counts at sf0.001 are a
    // property of tiny statistics).
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("d10_simhash_verified")(spark, dir)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.size == 1, s"expected 1 broadcast hint, got ${hints.size}")
  }

  test("t06 tfidf: df is an aggregate, not a term-partitioned window; " +
    "the second tokenize rides a doc_id-pruned scan") {
    val df = SparkEntry.queries("t06_tfidf_top_terms")(spark, dir)
    val plan = executed(df)
    // the corpus-scale WindowExec over the tf relation is gone: every
    // remaining window is the per-doc rank (partitioned by doc_id, never
    // by term — a stopword's term partition is ~|docs| rows in one task)
    val windows = collect(plan) { case w if w.nodeName.contains("Window") => w }
    assert(windows.nonEmpty, "expected the per-doc rank window")
    assert(windows.forall(w => !w.toString.contains("partitioning: [term")
      && w.toString.contains("doc_id")),
      windows.map(_.nodeName).mkString(";"))
    // the diamond resolves as full-corpus df branch + PRUNED tf branch:
    // exactly one of the two tokenizing scans carries the doc_id filter
    val scans = leafScans(df)
    assert(scans.count(_.contains("LessThan(doc_id")) >= 1,
      s"tf branch must push doc_id below its tokenize: $scans")
  }

  test("w07 sliding window shuffles by client, never globally") {
    val df = SparkEntry.queries("w07_peak_hourly_load")(spark, dir)
    val shuffles = collect(executed(df)) { case s: ShuffleExchangeExec => s }
    assert(shuffles.forall(s =>
      !s.outputPartitioning.toString.contains("SinglePartition") ||
        s.child.toString.contains("Sort")), // the final tiny orderBy only
      shuffles.map(_.outputPartitioning).mkString(";"))
    assert(shuffles.exists(_.outputPartitioning.toString.contains("client")))
  }

  test("h13 aggregates partially before its exchanges (map-side combine)") {
    val df = SparkEntry.queries("h13_custdist")(spark, dir)
    df.collect()
    val plan = executed(df).toString
    // both stacked aggregates appear as partial+final HashAggregate pairs
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // at 100 TB a selective dimension filter should reach the fact scan
    // as a bloom membership test BEFORE the shuffle — Spark injects it
    // when the creation side is small and the application side is big;
    // pin that the machinery engages on our join shape
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      val ord = Tables.orders(spark, "/root/testdata/sf0.01")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      val j = li.join(ord,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") && optimized.contains("might_contain"),
        optimized.take(800))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("no query plans a CartesianProduct (broadcast-with-condition everywhere)") {
    // the centroid/query cross joins must compile to BroadcastNestedLoop
    // (small side pinned broadcast), never CartesianProductExec — a
    // refactor that loses a broadcast hint turns O(n) into O(n·m) shuffle
    val offenders = SparkEntry.queries.keys.toSeq.sorted.filter { n =>
      val plan = executed(SparkEntry.queries(n)(spark, dir)).toString
      plan.contains("CartesianProduct")
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("whole-stage codegen covers the preprocess-and-aggregate path") {
    val df = SparkEntry.queries("a07_daily_counts")(spark, dir)
    df.collect() // AQE finalizes (and codegen-compiles) only on execution
    val plan = executed(df).toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact format
    assert(plan.contains("*(1)") && plan.contains("*(2)"), plan)
  }

  test("h19 disjunctive join: equi key extracted into a broadcast join, OR as residual") {
    // the OR-of-conjunctions must NOT demote the join to nested-loop —
    // Catalyst extracts l_partkey = p_partkey as the hash key and keeps
    // the disjunction as the join condition residual
    val df = SparkEntry.queries("h19_disjunctive_revenue")(spark, dir)
    val plan = executed(df)
    val bhj = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, plan.toString.take(600))
    assert(bhj.head.condition.isDefined &&
      bhj.head.condition.get.toString.contains(" OR "),
      "disjunction must survive as the hash-join residual")
    assert(!plan.toString.contains("NestedLoop"), "must not fall back to nested loop")
  }

  test("h21 sole-returner: one lineitem scan, per-order counts, no semi/anti sort-merge legs") {
    // round 15: the EXISTS/NOT-EXISTS semi+anti form scanned lineitem
    // three times (probe + both build sides — the pushed returnflag
    // filter made the subtrees non-identical, so exchange reuse never
    // fired) and paid two SortMergeJoins; the per-order-counts aggregate
    // is oracle-hash-identical with one scan and no sorts
    val plan = executed(
      SparkEntry.queries("h21_sole_returned_supplier")(spark, dir)).toString
    assert(!plan.contains("LeftSemi"), plan.take(800))
    assert(!plan.contains("LeftAnti"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).size
    assert(lineitemScans == 1,
      s"h21 must scan lineitem exactly once, found $lineitemScans")
  }

  test("h17 correlated-avg: brand keys prune lineitem before the per-part aggregate") {
    // the broadcast semi-ish inner join on the brand's part keys must sit
    // BELOW the groupBy(l_partkey) aggregate — the correlated average is
    // computed over the brand's lines only, never the full table
    val df = SparkEntry.queries("h17_small_qty_revenue")(spark, dir)
    df.collect()
    val plan = executed(df)
    val aggs = collect(plan) {
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.groupingExpressions.exists(_.toString.contains("l_partkey")) => a
    }
    assert(aggs.nonEmpty, plan.toString.take(800))
    assert(aggs.forall(a => collect(a.child) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty), "per-part aggregate must consume the brand-pruned join")
  }

  test("h07 two-nation implication prunes lineitem before the orderkey join") {
    // the pair-disjunction's implication (each side's nation ∈ {A,B})
    // must reach both fact sides BELOW the big l_orderkey join: the
    // lineitem branch passes through the broadcast supplier-nation join
    // (map-side prune) before any orderkey join, so the shuffle moves
    // the two-nation sliver, never the raw fact table
    val df = SparkEntry.queries("h07_nation_volume")(spark, dir)
    df.collect()
    val plan = executed(df)
    val okJoins = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
        if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("l_orderkey")) => j
    }
    assert(okJoins.nonEmpty, plan.toString.take(800))
    val lineitemSide = okJoins.flatMap(j => Seq(j.left, j.right))
      .filter(_.toString.contains("lineitem.parquet"))
    assert(lineitemSide.nonEmpty, "no join input traces back to the lineitem scan")
    assert(lineitemSide.forall(side => collect(side) {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if (b.leftKeys ++ b.rightKeys).exists(_.toString.contains("l_suppkey")) => b
    }.nonEmpty), "lineitem must be supplier-nation-pruned below the orderkey join")
  }

  test("h02 correlated min: lineitem scanned once, 3 columns, both prunes broadcast") {
    val df = SparkEntry.queries("h02_min_cost_supplier")(spark, dir)
    val liScans = leafScans(df).filter(_.contains("lineitem.parquet"))
    assert(liScans.size == 1, s"fact table must be scanned once, got ${liScans.size}")
    assert(liScans.head.contains(
      "ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint,l_extendedprice:double>"),
      liScans.head)
    // the per-part regional min is a Window over the (part, supp)
    // aggregate — never a self-join of the fact table
    val plan = executed(df).toString
    assert(plan.contains("Window"), plan.take(500))
  }

  test("h16 NOT-IN supplier exclusion compiles to a broadcast anti join") {
    val df = SparkEntry.queries("h16_parts_suppliers")(spark, dir)
    val plan = executed(df).toString
    assert(plan.contains("LeftAnti") && plan.contains("Broadcast"), plan.take(800))
  }

  test("p22 DSIR scoring: model lookup is in-row (no join at all), no Window") {
    // the language-model side (<= 4096-row distribution) enters the
    // scoring plan as a dense array LITERAL indexed with element_at —
    // round 14 removed the broadcast hash join the sparse form needed;
    // a Window here would mean the global rank leaked into the scoring
    // plan (the rank lives in the two-pass zipWithIndex, outside this
    // plan), and ANY join would mean the model stopped being a literal
    val scored = graft.operators.Sampling.dsirScores(
      Tables.documents(spark, dir),
      org.apache.spark.sql.functions.col("lang") === "en")
    val plan = executed(scored).toString
    assert(plan.contains("element_at"), plan.take(800))
    assert(!plan.contains("Join"), "the model lookup must be in-row, not a join")
    assert(!plan.contains("Window"), "dsirScores must not plan a Window")
  }

  test("p24 perplexity scoring: model lookups in-row (no joins), no Window") {
    // the unigram counts are consulted twice (prev + cur context) and
    // the bigram counts once — all three as element_at over dense
    // 4096-long array literals; round 14 removed the three broadcast
    // hash joins the sparse form probed per exploded pair. The tercile
    // rank lives in the two-pass zipWithIndex outside this plan.
    val docs = Tables.documents(spark, dir)
    val scored = graft.operators.Sampling.lmScoreAgainst(docs,
      graft.operators.Sampling.lmModel(docs,
        org.apache.spark.sql.functions.col("lang") === "en"))
    val plan = executed(scored).toString
    assert(plan.split("element_at").length >= 4,
      s"expected 3 in-row model lookups:\n${plan.take(800)}")
    assert(!plan.contains("Join"), "model lookups must be in-row, not joins")
    assert(!plan.contains("Window"), "no Window in the scoring plan")
  }

  test("IVF cell assignment is in-row: no window, no join, no fan-out") {
    // round 14: assignment used to crossJoin the broadcast centroids
    // (k× fan-out with the embedding payload attached) and resolve the
    // argmin through a row_number window — two exchanges of k× the
    // corpus bytes for a verdict that is a per-row function of the
    // vector and k driver-known constants
    val emb = Tables.embeddings(spark, dir)
    val cents = graft.operators.Similarity.kmeansCentroids(emb, 4, 1)
    val plan = executed(graft.operators.Similarity.assignCells(emb, cents)).toString
    assert(!plan.contains("Window"), "assignment must not window")
    assert(!plan.contains("Join"), "assignment must not join")
    assert(!plan.contains("Exchange"), "assignment must ride the scan")
  }

  test("kmeans Lloyd assignment is in-row: no window, no join, no exchange") {
    // round 15: each Lloyd ITERATION used to crossJoin the broadcast
    // centroids (k× fan-out with the 64-dim payload) and resolve the
    // argmin through a row_number window — two exchanges of k× the
    // corpus bytes per iteration, inside every cold-pass training. The
    // assignment is now the same in-row argmin as assignCells.
    import org.apache.spark.sql.functions.{col, transform}
    val emb = Tables.embeddings(spark, dir)
    val vecs = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    import spark.implicits._
    val centRows = vecs.filter(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("centv"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val plan = executed(
      graft.operators.Similarity.lloydAssignIvf(vecs, centRows)).toString
    assert(!plan.contains("Window"), "Lloyd assignment must not window")
    assert(!plan.contains("Join"), "Lloyd assignment must not join")
    assert(!plan.contains("Exchange"), "Lloyd assignment must ride the scan")
  }

  test("PQ encoding is in-row: no window, no join, no subspace fan-out") {
    val emb = Tables.embeddings(spark, dir)
    val books = graft.operators.Similarity.pqCodebooks(emb, 4, 4, 1)
    val plan = executed(graft.operators.Similarity.pqEncode(emb, books, 4)).toString
    assert(!plan.contains("Window"), "encoding must not window")
    assert(!plan.contains("Join"), "encoding must not join")
    assert(!plan.contains("Exchange"), "encoding must ride the scan")
  }

  test("d14 fuzzy decontamination: eval side broadcast, train side never " +
      "shuffled on shingle strings before its aggregate") {
    val out = graft.operators.Dedup.fuzzyDecontaminate(
      Tables.documents(spark, dir))
    val plan = executed(out).toString
    // the eval corpus (benchmark-sized) broadcasts into the band join
    // and the semi-filters; a SortMergeJoin on band_key would mean the
    // 100 TB side got shuffled against the eval side
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    val smjKeys = "SortMergeJoin.*band_key".r.findAllIn(plan)
    assert(smjKeys.isEmpty, "the band join must broadcast the eval side")
  }

  test("t12 dup-span extents: one doc-keyed exchange feeds both windows AND the span aggregates") {
    val out = graft.operators.TextAnalysis.dupSpanExtents(
      Tables.documents(spark, dir))
    val plan = executed(out)
    val s = plan.toString
    // the break-flag and run-id windows are both doc-partitioned: they
    // must stack on ONE sort with no exchange between them, and the
    // run/doc aggregates downstream reuse that same partitioning — so
    // the only doc_id-keyed exchange in the whole plan is the one
    // under the windows (plus the final presentation orderBy's range
    // exchange). A refactor that re-keys any stage would add one.
    val docHashExchanges = collect(plan) {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.toString.contains("hashpartitioning") &&
           e.outputPartitioning.toString.contains("doc_id") => e
    }
    assert(docHashExchanges.size == 1,
      s"expected exactly one doc_id hash exchange:\n${s.take(1200)}")
    assert(s.contains("Window"), "island merge is the per-doc window pair")
    // the corpus-wide shingle count is aggregate-shaped (map-side
    // combined partial + final), never a per-shingle window
    assert(!"Window.*seg".r.findAllIn(s).hasNext,
      "no window partitioned by shingle")
  }
}

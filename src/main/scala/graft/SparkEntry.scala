package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (one entry per SURVEY.md §2
  * operator); `oracleSql` the DuckDB-equivalent SQL for the hash compare.
  * Query functions are lazy plans end-to-end: no collect, and the driver
  * decides the action (parquet dump in Verify, count in Bench). The one
  * exception to "no caching": diamond-shaped dedup DAGs persist their
  * small shared signature relations (see Dedup.shared) — Catalyst does
  * not reuse those subtrees on its own.
  */
object SparkEntry {

  /** Preprocessed canonical relation over the `events` table. */
  private def prep(s: SparkSession, dir: String): DataFrame =
    Preprocess.preprocessEvents(Tables.events(s, dir))

  /** Flagship query on /root/testdata/sf0.001: hourly query volume per
    * status class — the reference's headline "queries over time" chart
    * (reference: process.py:100-104, plot.py:182-187). */
  def entry(spark: SparkSession): DataFrame =
    prep(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("HOUR", col("ts")).as("ts_hour"), col("status_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("ts_hour", "status_type")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_totals"              -> ((s, d) => Stats.totals(prep(s, d))),
    "a03_time_range"          -> ((s, d) => Stats.timeRange(prep(s, d))),
    "a04_top_client"          -> ((s, d) => Stats.topClient(prep(s, d))),
    "a04_top_client_by_class" -> ((s, d) => Stats.topClientByClass(prep(s, d))),
    "a05_top_domain_allowed"  -> ((s, d) => Stats.topDomainOfClass(prep(s, d), "Allowed")),
    "a05_top_domain_blocked"  -> ((s, d) => Stats.topDomainOfClass(prep(s, d), "Blocked")),
    "a06_persistent_client"   -> ((s, d) => Stats.persistentClient(prep(s, d))),
    "a07_daily_counts"        -> ((s, d) => Stats.dailyCounts(prep(s, d))),
    "a07_unpivot_daily"       -> ((s, d) => Stats.unpivotDaily(prep(s, d))),
    "a08_hourly_counts"       -> ((s, d) => Stats.hourlyCounts(prep(s, d))),
    "a09_weekday_avg"         -> ((s, d) => Stats.weekdayAvg(prep(s, d))),
    "a10_day_night_totals"    -> ((s, d) => Stats.dayNightTotals(prep(s, d))),
    "a10_day_night_top_client" -> ((s, d) => Stats.dayNightTopClient(prep(s, d))),
    "a10_day_night_top_domain" -> ((s, d) => Stats.dayNightTopDomain(prep(s, d), "Blocked")),
    "a11_distinct_counts"     -> ((s, d) => Stats.distinctCounts(prep(s, d))),
    "a11_approx_distinct"     -> ((s, d) => Stats.approxDistinctChecked(prep(s, d))),
    "a11_hll_daily_rollup"    -> ((s, d) => Stats.hllDailyDomainsChecked(prep(s, d))),
    "a11_cms_domain_counts"   -> ((s, d) => Stats.cmsDomainEstimates(prep(s, d))),
    "a34_approx_quantile_bounds" -> ((s, d) => Stats.approxQuantileBounds(prep(s, d))),
    "a12_diverse_client"      -> ((s, d) => Stats.diverseClient(prep(s, d))),
    "u02_day_only_clients"    -> ((s, d) => Stats.dayOnlyClients(prep(s, d))),
    "a26_reply_dispersion"    -> ((s, d) => Stats.replyDispersion(prep(s, d))),
    "a28_reply_histogram"     -> ((s, d) => Stats.replyHistogram(prep(s, d))),
    "a27_client_quartiles"    -> ((s, d) => Stats.clientQuartiles(prep(s, d))),
    "u03_both_period_clients" -> ((s, d) => Stats.bothPeriodClients(prep(s, d))),
    "u04_day_minus_night_bag" -> ((s, d) => Stats.dayMinusNightBag(prep(s, d))),
    // S3/U1 oracle-checked end-to-end: multi-source UNION ALL keeps
    // duplicates (two reads of the same source double every count)
    "u05_union_all_dupes" -> ((s, d) => {
      val p = prep(s, d)
      p.unionByName(p).groupBy("status_type")
        .agg(count(lit(1)).as("cnt")).orderBy("status_type")
    }),
    // salted two-phase aggregate ≡ plain groupBy (the skew treatment
    // must be result-invisible; spread itself is pinned in SkewSpec)
    "u06_salted_count" -> ((s, d) =>
      Skew.saltedCount(prep(s, d), "client", 8, Seq("id")).orderBy("client")),
    // salted equi-join ≡ plain join: big side = prep, small side = the
    // per-status totals dim; per-status joined-row count must equal the
    // dim's own total (self-consistency the oracle re-derives)
    "u07_salted_join" -> ((s, d) => {
      val p = prep(s, d)
      val dim = p.groupBy("status_type").agg(count(lit(1)).as("status_total"))
      Skew.saltedJoin(p, dim, "status_type", 8, Seq("id"))
        .groupBy("status_type", "status_total")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("status_type")
    }),
    "a32_argmax_single_pass"  -> ((s, d) => Stats.argmaxDomainSinglePass(prep(s, d))),
    "a13_reply_stats"         -> ((s, d) => Stats.replyStats(prep(s, d))),
    "a14_slowest_domain"      -> ((s, d) => Stats.slowestDomain(prep(s, d))),
    "a15_reply_by_date"       -> ((s, d) => Stats.replyByDate(prep(s, d))),
    "a22_inter_arrival"       -> ((s, d) => Stats.interArrival(prep(s, d))),
    // plot-data layer (SURVEY.md §2.4 A16-A20, §2.3 J3, §2.2 P2/P5, §2.8 F10)
    "a16_hourly_view"         -> ((s, d) => PlotData.hourlyView(prep(s, d))),
    "a17_view_by_status"      -> ((s, d) => PlotData.viewByStatus(prep(s, d))),
    "a33_sliding_hourly"      -> ((s, d) => PlotData.slidingHourlyLoad(prep(s, d))),
    "a17_client_activity"     -> ((s, d) => PlotData.clientActivity(prep(s, d), 10)),
    // serving-tier bound (VERDICT r9 item 2): the per-series point cap —
    // maxPoints=48 forces the calendar rollup at every test SF (sf0.001
    // spans ~3 months of hours → DAY buckets; sf0.01 ~13 months → MONTH),
    // so the oracle checks the unit-selection CASE itself, not just a
    // pass-through
    "a35_capped_series"       -> ((s, d) =>
      PlotData.capSeries(PlotData.viewByStatus(prep(s, d)), "ts_hour",
        Seq("status_type"), maxPoints = 48)),
    // the VALUE-series cap: daily reply-time line downsampled with its
    // min/max envelope kept (a mean-only rollup hides the spikes);
    // maxPoints=10 forces the WEEK rollup at every test SF
    "a36_capped_envelope"     -> ((s, d) => {
      val daily = prep(s, d)
        .groupBy(col("date").cast("timestamp").as("ts_day"), col("status_type"))
        .agg(round(avg(col("reply_time")) * 1000, 3).as("reply_ms"))
      PlotData.capSeriesEnvelope(daily, "ts_day", Seq("status_type"),
        "reply_ms", maxPoints = 10)
    }),
    "j03_gap_filled"          -> ((s, d) => PlotData.gapFilledByStatus(prep(s, d))),
    "j04_gap_filled_client"   -> ((s, d) => PlotData.gapFilledByClient(prep(s, d), 10)),
    "j06_interpolated_hourly" -> ((s, d) => PlotData.interpolatedHourly(prep(s, d))),
    "j07_interpolated_client" -> ((s, d) => PlotData.interpolatedByClient(prep(s, d), 5)),
    "a18_stacked_client_bar"  -> ((s, d) => PlotData.stackedClientBar(prep(s, d), 10)),
    "a19_client_domain_scatter" -> ((s, d) => PlotData.clientDomainScatter(prep(s, d), 10, 10, maxLen = 8, keep = 3)),
    "p05_top_domains_blocked" -> ((s, d) => PlotData.topDomainsOfClass(prep(s, d), "Blocked", 10, maxLen = 8, keep = 3)),
    "a20_heatmap_all"         -> ((s, d) => PlotData.dayHourHeatmap(prep(s, d), None)),
    "a20_heatmap_blocked"     -> ((s, d) => PlotData.dayHourHeatmap(prep(s, d), Some("Blocked"))),
    "p02_regex_filter"        -> ((s, d) =>
      Preprocess.regexAntiFilter(prep(s, d), "domain", Seq("""\d{2}\}$""", "["))
        .groupBy("status_type").agg(count(lit(1)).as("cnt")).orderBy("status_type")),
    // F2 end-to-end: display-timezone conversion (reference db.py:70-74,
    // process.py:52-61) — hourly histogram in a +05:30 display zone. The
    // fb_ts leg routes an INVALID zone through the same API, exercising
    // the warn-and-fallback-to-UTC path (fb hour = UTC hour); a fixed
    // offset keeps the DuckDB oracle a plain interval shift (no ICU).
    "f02_display_tz_hourly"   -> ((s, d) => {
      val base = prep(s, d).select(col("ts"), col("ts").as("fb_ts"))
      val shifted = graft.sources.FtlIngest.withDisplayTz(
        graft.sources.FtlIngest.withDisplayTz(base, "ts", "+05:30"),
        "fb_ts", "No/Such_Zone")
      shifted.groupBy(hour(col("ts")).as("local_hour"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(hour(col("fb_ts"))).as("n_utc_hours"))
        .orderBy("local_hour")
    }),
    // order-dependent layer (SURVEY.md §2.5 W1-W4)
    "w01_streak_runs_blocked" -> ((s, d) => Streaks.streakRuns(prep(s, d), "Blocked")),
    "w02_longest_streaks"     -> ((s, d) => Streaks.longestStreaks(prep(s, d))),
    "w02_longest_streaks_fmt" -> ((s, d) => Streaks.longestStreaksFormatted(prep(s, d))),
    "w03_longest_idle"        -> ((s, d) => Streaks.longestIdle(prep(s, d))),
    "w04_streak_runs_scalable" -> ((s, d) => Streaks.streakRunsScalable(prep(s, d), "Blocked")),
    "w05_sessionize"          -> ((s, d) => Streaks.sessionize(prep(s, d), 1800)),
    "w05_session_summary"     -> ((s, d) => Streaks.sessionSummary(prep(s, d), 1800)),
    "w07_peak_hourly_load"    -> ((s, d) => Streaks.peakHourlyLoad(prep(s, d))),
    "a23_reply_percentiles"   -> ((s, d) => Stats.replyPercentiles(prep(s, d))),
    "a24_rollup_daily"        -> ((s, d) => Stats.rollupDaily(prep(s, d))),
    "a25_cube_period_status"  -> ((s, d) => Stats.cubePeriodStatus(prep(s, d))),
    "a29_client_rank_dist"    -> ((s, d) => Stats.clientRankDist(prep(s, d))),
    "a30_grouping_sets"       -> ((s, d) => Stats.groupingSetsDailyStatus(prep(s, d))),
    "a31_client_rank_ties"    -> ((s, d) => Stats.clientRankTies(prep(s, d))),
    "w08_transition_matrix"   -> ((s, d) => Stats.transitionMatrix(prep(s, d))),
    "p11_notin_null"          -> ((s, d) => Preprocess.notInNullSemantics(prep(s, d))),
    "w09_daily_anomalies"     -> ((s, d) => Stats.dailyAnomalies(prep(s, d))),
    "j10_ewma_daily"          -> ((s, d) => Stats.ewmaDaily(prep(s, d))),
    "j11_asof_forward"        -> ((s, d) => AsofJoin.allowedBeforeBlocked(prep(s, d))),
    "j05_asof_blocked_allowed" -> ((s, d) => AsofJoin.blockedAfterAllowed(prep(s, d))),
    "j08_asof_blocked_allowed_native" -> ((s, d) => AsofJoin.blockedAfterAllowedNative(prep(s, d))),
    "j12_asof_gap_stats"        -> ((s, d) => AsofJoin.asofGapStatsUnion(prep(s, d))),
    "j13_asof_gap_stats_native" -> ((s, d) => AsofJoin.asofGapStatsNative(prep(s, d))),
    "j14_asof_gap_stats_tol"  -> ((s, d) => AsofJoin.asofGapStatsWithin(prep(s, d))),
    // the bin-bucketed range join graduated to an oracle query: every
    // Blocked event located in its containing session interval — an
    // equi-join on (client, time-bin) + exact containment re-check,
    // never a range-predicate nested loop
    "j15_range_join_sessions" -> ((s, d) => {
      val p = prep(s, d)
      // unordered session relation: the range join consumes it as a
      // bag, so the public surface's global sort (range exchange +
      // sampling pass) would be pure waste here
      val sessions = Streaks.sessionizeCore(p, 1800)
        .select(col("client"), col("session_no"),
          col("session_start"), col("session_end"))
      val blocked = p.filter(col("status_type") === "Blocked")
        .select("client", "ts", "id")
      RangeJoin.binned(blocked, sessions, "client", "ts",
          "session_start", "session_end", binSeconds = 3600)
        .select(col("client"), col("id"), col("ts"), col("session_no"))
        .orderBy("client", "id")
    }),
    "j09_asof_hourly_bcast" -> ((s, d) => AsofJoin.blockedVsHourlyAllowed(prep(s, d))),
    // star-schema equi-joins (SURVEY.md §2.3 engine-build layer)
    "h01_pricing_summary"     -> ((s, d) => Joins.pricingSummary(s, d)),
    "h03_shipping_priority"   -> ((s, d) => Joins.shippingPriority(s, d)),
    "h05_region_revenue"      -> ((s, d) => Joins.regionRevenue(s, d)),
    "h10_returned_revenue"    -> ((s, d) => Joins.returnedRevenue(s, d)),
    "h_semi_urgent_customers" -> ((s, d) => Joins.urgentCustomers(s, d)),
    "h_anti_no_open_orders"   -> ((s, d) => Joins.noOpenOrderCustomers(s, d)),
    "h12_shipmode_priority"   -> ((s, d) => Joins.shipmodePriority(s, d)),
    "h18_large_orders"        -> ((s, d) => Joins.largeOrders(s, d)),
    "h_full_outer_calendar"   -> ((s, d) => Joins.orderVsShipCalendar(s, d)),
    "h_topn_per_customer"     -> ((s, d) => Joins.topOrdersPerCustomer(s, d)),
    "h13_custdist"            -> ((s, d) => Joins.customerOrderDistribution(s, d)),
    "h14_promo_revenue"       -> ((s, d) => Joins.promoRevenue(s, d)),
    "h15_top_supplier"        -> ((s, d) => Joins.topSupplier(s, d)),
    "h04_priority_returns"    -> ((s, d) => Joins.priorityReturns(s, d)),
    "h07_nation_volume"       -> ((s, d) => Joins.nationVolume(s, d)),
    "h17_small_qty_revenue"   -> ((s, d) => Joins.smallQtyRevenue(s, d)),
    "h19_disjunctive_revenue" -> ((s, d) => Joins.disjunctiveRevenue(s, d)),
    "h21_sole_returned_supplier" -> ((s, d) => Joins.soleReturnedSupplier(s, d)),
    "h22_idle_rich_customers" -> ((s, d) => Joins.idleRichCustomers(s, d)),
    "h02_min_cost_supplier"   -> ((s, d) => Joins.minCostSupplier(s, d)),
    "h06_forecast_revenue"    -> ((s, d) => Joins.forecastRevenue(s, d)),
    "h08_market_share"        -> ((s, d) => Joins.marketShare(s, d)),
    "h09_product_profit"      -> ((s, d) => Joins.productProfit(s, d)),
    "h11_important_parts"     -> ((s, d) => Joins.importantParts(s, d)),
    "h16_parts_suppliers"     -> ((s, d) => Joins.partsSupplierBreadth(s, d)),
    "h20_promo_stock_suppliers" -> ((s, d) => Joins.promoStockSuppliers(s, d)),
    // training-data pipeline: dedup over documents
    "d01_exact_summary"       -> ((s, d) => Dedup.exactSummary(Tables.documents(s, d))),
    "d01_exact_groups"        -> ((s, d) => Dedup.exactGroups(Tables.documents(s, d))),
    "d02_minhash_cands"       -> ((s, d) => Dedup.lshCandidates(Tables.documents(s, d))),
    "d03_jaccard_dups"        -> ((s, d) => Dedup.jaccardVerified(Tables.documents(s, d), 0.8)),
    "d04_simhash"             -> ((s, d) => Dedup.simhash(Tables.documents(s, d))),
    "d05_simhash_cands"       -> ((s, d) => Dedup.simhashCandidates(Tables.documents(s, d))),
    "d06_dup_clusters"        -> ((s, d) => Dedup.dupClusters(Tables.documents(s, d))),
    "d08_edit_verified"       -> ((s, d) => Dedup.editVerified(Tables.documents(s, d))),
    "d09_minhash_cands_fast"  -> ((s, d) => Dedup.lshCandidatesFast(Tables.documents(s, d))),
    "d10_simhash_verified"    -> ((s, d) => Dedup.simhashVerified(Tables.documents(s, d))),
    "d07_verified_clusters"   -> ((s, d) => Dedup.verifiedClusters(Tables.documents(s, d), 0.8)),
    // incremental ingest shape: docs in bucket doc_id%10==7 play "today's
    // arrivals"; the result must equal the full chain filtered to pairs
    // touching them (the oracle IS that filtered full chain)
    "d11_incremental_pairs"   -> ((s, d) => {
      val docsDf = Tables.documents(s, d)
      Dedup.incrementalVerifiedPairs(docsDf,
        docsDf.filter(org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(10)) === 7).select("doc_id"), 0.8)
    }),
    // training-data pipeline: similarity search over embeddings
    "s01_knn_brute"           -> ((s, d) => Similarity.knnBrute(Tables.embeddings(s, d), 5, 10)),
    "s02_knn_lsh"             -> ((s, d) => Similarity.knnLsh(Tables.embeddings(s, d), 5, 10, planes = 4)),
    "s06_knn_lsh_multiprobe"  -> ((s, d) => Similarity.knnLshMultiprobe(Tables.embeddings(s, d), 5, 10, planes = 4)),
    "s04_knn_ivf"             -> ((s, d) => Similarity.knnIvf(Tables.embeddings(s, d), 5, 10)),
    "s05_knn_ivf_trained"     -> ((s, d) => Similarity.knnIvfTrained(Tables.embeddings(s, d), 5, 10)),
    "s03_embedding_near_dups" -> ((s, d) => Similarity.nearDupPairs(Tables.embeddings(s, d), 0.4)),
    "s09_near_dups_lsh"       -> ((s, d) => Similarity.nearDupPairsLsh(Tables.embeddings(s, d), 0.4)),
    "s10_semantic_clusters"   -> ((s, d) => Similarity.semanticClusters(Tables.embeddings(s, d), 0.4)),
    "s07_knn_topk_agg"        -> ((s, d) => Similarity.knnBruteAgg(Tables.embeddings(s, d), 5, 10)),
    "s08_knn_pq"              -> ((s, d) => Similarity.knnPq(Tables.embeddings(s, d), 5, 10)),
    // training-data pipeline: text analysis over documents
    "t01_lang_id"             -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "t10_lang_dist"           -> ((s, d) => TextAnalysis.langDistribution(Tables.documents(s, d))),
    "t02_quality_score"       -> ((s, d) => TextAnalysis.qualityScore(Tables.documents(s, d))),
    "t03_token_counts"        -> ((s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))),
    "t03_corpus_totals"       -> ((s, d) => TextAnalysis.corpusTokenTotals(Tables.documents(s, d))),
    "t04_fingerprint_groups"  -> ((s, d) => TextAnalysis.fingerprintGroups(Tables.documents(s, d))),
    "t05_rolling_fp"          -> ((s, d) => TextAnalysis.rollingFingerprint(Tables.documents(s, d))),
    "t06_tfidf_top_terms"     -> ((s, d) => TextAnalysis.tfidfTopTerms(Tables.documents(s, d))),
    "t07_normalized_dups"     -> ((s, d) => TextAnalysis.normalizedDupGroups(Tables.documents(s, d))),
    "t08_repetition_rules"    -> ((s, d) => TextAnalysis.repetitionRules(Tables.documents(s, d))),
    "t09_pii_scrub"           -> ((s, d) => TextAnalysis.piiScrub(Tables.documents(s, d))),
    "t11_span_dedup"          -> ((s, d) => TextAnalysis.spanDedup(Tables.documents(s, d))),
    // duplicate-substring extents: sliding shingles, any alignment,
    // maximal per-doc spans (the exact-substring duplication report)
    "t12_dup_span_extents"    -> ((s, d) => TextAnalysis.dupSpanExtents(Tables.documents(s, d))),
    // training-data pipeline: deterministic hash sampling over documents
    "p06_hash_sample"         -> ((s, d) => Sampling.hashSample(Tables.documents(s, d))),
    "p07_stratified_summary"  -> ((s, d) => Sampling.stratifiedSummary(Tables.documents(s, d))),
    "p17_balanced_sources"    -> ((s, d) => Sampling.capPerSource(Tables.documents(s, d))),
    "p18_shuffled_order"      -> ((s, d) => Sampling.shuffledOrder(Tables.documents(s, d))),
    "p20_leakage_safe_split"  -> ((s, d) => Sampling.leakageSafeSplit(Tables.documents(s, d))),
    "p21_leakage_safe_split_spans" -> ((s, d) => Sampling.leakageSafeSplitSpans(Tables.documents(s, d))),
    // DSIR importance resampling toward the English subset as the target
    // distribution (hashed 1/2-gram LLR scores, Gumbel-top-25%)
    "p22_dsir_selected" -> ((s, d) =>
      Sampling.dsirResample(Tables.documents(s, d), col("lang") === "en")),
    // temperature rebalancing (XLM-R-style alpha-sampling) by language
    "p23_temperature_sample" -> ((s, d) =>
      Sampling.temperatureSummary(Tables.documents(s, d), "lang", 0.3)),
    // semi-structured extraction from the raw events' JSON props
    "p08_json_props"          -> ((s, d) => Preprocess.jsonPropsRollup(Tables.eventsRaw(s, d))),
    "p10_json_typed"          -> ((s, d) => Preprocess.jsonPropsTyped(Tables.eventsRaw(s, d))),
    // the composed curation pipeline (exact dedup -> near-dup clusters ->
    // quality floor -> deterministic 3/4 sample), oracle-checked end-to-end
    "p09_curated_corpus"      -> ((s, d) => Pipeline.curate(Tables.documents(s, d), sampleBuckets = 192)),
    "p16_curated_chunks"      -> ((s, d) => Pipeline.curatedChunks(Tables.documents(s, d), sampleBuckets = 192)),
    // p25: curation with the LM-perplexity gate composed in
    // (exact -> near -> quality -> perplexity -> sample -> chunk)
    "p25_curated_chunks_lm"   -> ((s, d) =>
      Pipeline.curatedChunksLm(Tables.documents(s, d), col("lang") === "en", sampleBuckets = 192)),
    "p12_packed_sequences"    -> ((s, d) => Packing.packSequences(Tables.documents(s, d))),
    "p13_bin_manifest"        -> ((s, d) => Packing.binManifest(Tables.documents(s, d))),
    "p14_chunked_docs"        -> ((s, d) => Packing.chunkDocs(Tables.documents(s, d))),
    "p15_chunk_stats"         -> ((s, d) => Packing.chunkStats(Tables.documents(s, d))),
    // LM quality filter: interpolated hashed-bigram perplexity against
    // the English slice as the reference model
    "p24_lm_perplexity" -> ((s, d) =>
      Sampling.lmPerplexity(Tables.documents(s, d), col("lang") === "en")),
    // eval-set decontamination: src0 docs play the held-out benchmark
    "d12_decontaminated"      -> ((s, d) => Dedup.decontaminate(Tables.documents(s, d))),
    "d13_decontam_bloom"      -> ((s, d) => Dedup.decontaminateBloomChecked(Tables.documents(s, d))),
    // fuzzy decontamination: banded MinHash join ACROSS corpora, Jaccard
    // verify on the candidate sliver
    "d14_fuzzy_decontam"      -> ((s, d) => Dedup.fuzzyDecontaminate(Tables.documents(s, d))),
    // training-data pipeline: multimodal binary-column plumbing
    "m01_media_meta"          -> ((s, d) => Multimodal.mediaMeta(Tables.documents(s, d))),
    "m02_media_features"      -> ((s, d) => Multimodal.extractFeatures(Tables.documents(s, d))),
    "m03_sampled_frames"      -> ((s, d) => Multimodal.sampledFrames(Tables.documents(s, d))),
    "m04_resized_media"       -> ((s, d) => Multimodal.resizeMedia(Tables.documents(s, d))),
    "m05_decoded_headers"     -> ((s, d) => Multimodal.decodeHeaders(Tables.documents(s, d))),
    "m06_bmp_pixel_stats"     -> ((s, d) => Multimodal.bmpPixelStats(Tables.documents(s, d))),
    "m07_png_pixel_stats"     -> ((s, d) => Multimodal.pngPixelStats(Tables.documents(s, d))),
    "m08_jpeg_pixel_stats"    -> ((s, d) => Multimodal.jpegPixelStats(Tables.documents(s, d))),
    "m09_wav_pcm_stats"       -> ((s, d) => Multimodal.wavPcmStats(Tables.documents(s, d))),
    "m10_avi_frame_stats"     -> ((s, d) => Multimodal.aviFrameStats(Tables.documents(s, d))),
    "m11_bmp_resized"         -> ((s, d) => Multimodal.bmpResized(Tables.documents(s, d))),
    // widened JPEG scope: 4:2:0 chroma subsampling + restart intervals
    "m12_jpeg420_pixel_stats" -> ((s, d) => Multimodal.jpegPixelStats420(Tables.documents(s, d))),
    // progressive (SOF2) scope: multi-scan spectral selection +
    // successive approximation, decoded through the same general path
    "m16_jpeg_progressive_stats" -> ((s, d) => Multimodal.jpegProgressiveStats(Tables.documents(s, d))),
    // widened PNG scope: Adam7 interlacing + 4-bit palette expansion
    "m17_png_palette_adam7_stats" -> ((s, d) => Multimodal.pngPaletteStats(Tables.documents(s, d))),
    // the grayscale arm: Adam7 color type 0 at depth 2, raw samples
    "m18_png_gray_stats" -> ((s, d) => Multimodal.pngGrayStats(Tables.documents(s, d))),
    // content-addressable dedup keys over decoded, canonicalized media
    "m13_media_fingerprints"  -> ((s, d) => Multimodal.mediaFingerprints(Tables.documents(s, d))),
    // the STORED-binary path: payloads sunk once to a parquet BINARY
    // column (the m00 media table), then decoded from the SCANNED bytes
    // — the plan shape that dominates a 100 TB multimodal corpus
    "m14_stored_media_features" -> ((s, d) =>
      Multimodal.extractFeaturesFromBinary(
        Multimodal.storedMedia(Tables.documents(s, d), d))),
    "m15_stored_fingerprints" -> ((s, d) =>
      Multimodal.fingerprintsFromBinary(
        Multimodal.storedMedia(Tables.documents(s, d), d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (sketches, hash-dependent signatures) → driver records a weaker
    * rows-only check. */
  def oracleSql: Map[String, String] = Oracles.all

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `oracle_sql.json` body for the named queries (names without an
    * oracle are skipped) — ONE escaper shared by Verify (full inventory)
    * and Dump (partial), so the two dumps cannot diverge. */
  def oracleJson(names: Iterable[String]): String =
    names.flatMap(n => oracleSql.get(n).map(sql => s"${q(n)}: ${q(sql)}"))
      .mkString("{", ",", "}")
}

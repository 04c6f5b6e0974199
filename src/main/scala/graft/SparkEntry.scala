package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._
import graft.profile.ProfileQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY §2's inventory (and the LLM-pipeline extensions
  * mandated by BASELINE.json) appears here as a named query with a DuckDB
  * oracle twin in [[oracleSql]]. Column names/types are kept in lockstep
  * between the Spark plan and the oracle SQL; float aggregates route through
  * DECIMAL so both engines produce bit-identical doubles.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.revenueByRegion(spark, "/root/testdata/sf0.001")

  type Q = (SparkSession, String) => DataFrame

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.4 extensions). */
  def queries: Map[String, Q] = {
    val profileStats: Map[String, Q] =
      Fixtures.allTables.map { t =>
        s"profile_stats_$t" -> ((s: SparkSession, dir: String) => ProfileQueries.stats(s, dir, t))
      }.toMap
    profileStats ++ Map[String, Q](
      // profiling semantics (SURVEY §2.1 S5-S7, §2.4 A2-A6, §7.4 depth)
      "profile_rowcounts" -> (ProfileQueries.rowCounts(_, _)),
      "profile_bool_histogram" -> (ProfileQueries.boolHistogram(_, _)),
      "profile_ndv_lineitem" -> ((s, d) => ProfileQueries.ndv(s, d, "lineitem")),
      "profile_ndv_orders" -> ((s, d) => ProfileQueries.ndv(s, d, "orders")),
      "profile_topk_values" -> (ProfileQueries.topkValues(_, _)),
      // joinability / FK-discovery (round 9): exact distinct-set overlap +
      // the mergeable-HLL (hll_sketch_agg/hll_union) twin that replaces the
      // distinct-join at 100 TB, tolerance-gated in-query
      "profile_key_overlap" -> (ProfileQueries.keyOverlap(_, _)),
      // ERD classification (round 11): relationship class + exact fanout
      // per candidate key pair, one step past the overlap stats
      "profile_erd_classes" -> ((s, d) => ProfileQueries.erdClasses(s, d)),
      "profile_key_overlap_sketch" -> (ProfileQueries.keyOverlapSketch(_, _)),
      // whole-catalog long-format profile (round 9): every table's numeric
      // columns in ONE job — the nightly profile-the-lake shape
      "profile_catalog_long" -> (ProfileQueries.catalogProfile(_, _)),
      // sketch-algebra IND/FK discovery (round 9): candidate list is
      // rows-only (estimates); the known-pair detection gate is oracled
      "profile_fk_discovery" -> ((s, d) => ProfileQueries.fkDiscovery(s, d)),
      "profile_fk_discovery_gate" -> ((s, d) => ProfileQueries.fkDiscoveryGate(s, d)),
      // frequent items (round 9): mergeable Misra-Gries summary (rows-only —
      // estimates aren't SQL-expressible) + its order-invariant guarantee
      // gate under the DuckDB oracle
      "profile_heavy_values" -> ((s, d) => ProfileQueries.heavyValuesRows(s, d)),
      "profile_heavy_values_gate" -> ((s, d) => ProfileQueries.heavyValuesGate(s, d)),
      "profile_summary_lineitem" -> ((s, d) => ProfileQueries.fullProfile(s, d, "lineitem")),
      "profile_summary_orders" -> ((s, d) => ProfileQueries.fullProfile(s, d, "orders")),
      "profile_summary_documents" -> ((s, d) => ProfileQueries.fullProfile(s, d, "documents")),
      "profile_summary_events" -> ((s, d) => ProfileQueries.fullProfile(s, d, "events")),
      // the 100 TB profile path, SPLIT from its gate (VERDICT r8 #3): the
      // bench-measured `profile_sketch_*` line is the operator alone (one
      // scan, mergeable sketches, no exact references — estimates aren't
      // SQL-expressible, so the driver records the weaker rows-only check;
      // the estimates are tolerance-gated in SketchProfileSpec), while
      // `profile_sketch_gate_*` keeps the full in-query exact-reference
      // validation under the DuckDB hash oracle
      "profile_sketch_lineitem" -> ((s, d) => ProfileQueries.sketchProfile(s, d, "lineitem")),
      "profile_sketch_events" -> ((s, d) => ProfileQueries.sketchProfile(s, d, "events")),
      "profile_sketch_gate_lineitem" -> ((s, d) => ProfileQueries.sketchProfileGate(s, d, "lineitem")),
      "profile_sketch_gate_events" -> ((s, d) => ProfileQueries.sketchProfileGate(s, d, "events")),
      "profile_histogram_quantity" -> (ProfileQueries.quantityHistogram(_, _)),
      "profile_histogram_depth" -> (ProfileQueries.quantityDepthHistogram(_, _)),
      "profile_corr_lineitem" -> (ProfileQueries.quantityPriceCorr(_, _)),
      // full pairwise correlation matrix in one scan (round 9)
      "profile_corr_matrix" -> (ProfileQueries.corrMatrix(_, _)),
      // concentration + leading-digit distribution profiles (round 9):
      // exact Gini via grouped-value prefix sums (no global row sort);
      // Benford digits in integer math
      "profile_gini_lineitem" -> ((s, d) => ProfileQueries.giniProfile(s, d)),
      "profile_gini_user_activity" -> (ProfileQueries.giniUserActivity(_, _)),
      // Spearman rho over exact midranks (Kendall's sibling)
      "profile_spearman_rho" -> (ProfileQueries.spearmanRho(_, _)),
      // exact Kendall tau-a from the domain-bounded 2-D grid
      "profile_kendall_tau" -> (ProfileQueries.kendallTau(_, _)),
      // joint (quantity x discount) histogram + source Lorenz curve
      "profile_histogram_2d" -> (ProfileQueries.histogram2d(_, _)),
      "profile_lorenz_sources" -> (ProfileQueries.lorenzSources(_, _)),
      // one-number ANOVA: variance of length explained by language (ppm)
      "profile_eta2_lang" -> ((s, d) => ProfileQueries.etaSquared(s, d)),
      "profile_benford_totalprice" -> ((s, d) => ProfileQueries.benfordProfile(s, d)),
      // robust (median/MAD) outlier twin of events_hourly_anomalies
      "events_robust_anomalies" -> (EventOps.robustAnomalies(_, _)),
      // sweep-line peak concurrency + daily growth curve (round 9)
      "events_max_concurrency" -> (EventOps.maxConcurrency(_, _)),
      "events_user_growth" -> (EventOps.userGrowth(_, _)),
      // interval-interval overlap: busy hour-runs x sessions via bucket join
      "events_busy_window_sessions" -> (EventOps.busyWindowSessions(_, _)),
      // exact rolling 7-day distinct users via bounded interval decomposition
      "events_rolling_wau" -> (EventOps.rollingActiveUsers(_, _)),
      // the sketch form: 7 HLL unions per day, tolerance-gated vs exact
      "events_rolling_wau_sketch" -> ((s, d) => EventOps.rollingWauSketchGate(s, d)),
      // funnel-integrity conformance: purchase requires a same-session click
      "events_conformance" -> (EventOps.purchaseConformance(_, _)),
      // robust trend (median of pairwise slopes) + seasonal spike report
      "events_theil_sen" -> (EventOps.theilSenSlopes(_, _)),
      "events_seasonal_spikes" -> ((s, d) => EventOps.seasonalSpikes(s, d)),
      // offline join-skew advisory + log2-bucketed length histogram
      "profile_join_skew" -> ((s, d) => ProfileQueries.joinSkewProfile(s, d)),
      "profile_log2_histogram" -> ((s, d) => ProfileQueries.log2Histogram(s, d)),
      // per-dimension embedding hygiene (dead/collapsed dims)
      "embedding_dim_stats" -> (Similarity.dimStats(_, _)),
      // centroid drift between corpus versions, exact micro^2 (round 11)
      "embedding_version_drift" -> (Similarity.versionDrift(_, _)),
      // SQL-text entry path over registered views
      "q_sql_text_revenue" -> (RelationalExt.sqlTextRevenue(_, _)),
      // exact Mann-Whitney U: weekend vs weekday hourly activity
      "events_weekend_ranktest" -> (EventOps.weekendRankTest(_, _)),
      // churn-risk dormancy buckets + revenue decile concentration
      "events_dormancy" -> (EventOps.dormancyBuckets(_, _)),
      "q_revenue_deciles" -> (RelationalExt.revenueDeciles(_, _)),
      // session count at each candidate gap threshold, one pass
      "events_session_gap_sweep" -> (EventOps.sessionGapSweep(_, _)),
      // inter-arrival burstiness (CV^2) per type, exact ppm ratio
      "events_burstiness" -> (EventOps.burstiness(_, _)),
      // cohort LTV curves (retention's revenue twin) + order aging
      "events_cohort_ltv" -> (EventOps.cohortLtv(_, _)),
      "q_order_aging" -> (RelationalExt.orderAging(_, _)),
      // abs-spelled nearest-neighbour range join through the rule
      "events_range_join_abs" -> (EventOps.absRangeJoinAuto(_, _)),
      // multi-scale Haar detail energy of hourly series (no libm)
      "events_wavelet_energy" -> ((s, d) => EventOps.waveletEnergy(s, d)),
      // out-of-orderness histogram: the watermark-picking measurement
      "events_lateness_profile" -> (EventOps.latenessProfile(_, _)),
      // the watermark knob (round 11): events dropped per candidate
      // withWatermark delay, exact ppm — the completeness/latency table
      "events_watermark_sweep" -> (EventOps.watermarkSweep(_, _)),
      // Heaps-law vocabulary growth at power-of-two checkpoints
      "text_vocab_growth" -> (TextAnalysis.vocabGrowth(_, _)),
      "text_zipf_profile" -> (TextAnalysis.zipfProfile(_, _)),
      "text_lexical_diversity" -> (TextAnalysis.lexicalDiversity(_, _)),
      // CUSUM sustained-drift alarms over hourly series (integer-exact)
      "events_cusum_alarms" -> ((s, d) => EventOps.cusumAlarms(s, d)),
      // nearest-either-side as-of join via 3-band equi-join
      "events_asof_nearest" -> ((s, d) => EventOps.asofNearestClick(s, d)),
      // lagged Pearson cross-correlation between type series
      "events_cross_correlation" -> ((s, d) => EventOps.crossCorrelation(s, d)),
      // k-anonymity / l-diversity release audit over customer
      "profile_k_anonymity" -> ((s, d) => ProfileQueries.kAnonymity(s, d)),
      "profile_anonymization_ladder" -> ((s, d) => ProfileQueries.anonymizationLadder(s, d)),
      // string-column companion of the whole-catalog numeric profile
      "profile_catalog_strings" -> (ProfileQueries.catalogStringProfile(_, _)),
      // small-file FFD compaction plan over the file listing (rows-only:
      // sequential bin packing isn't SQL; packFFD is spec'd exactly)
      "profile_compaction_plan" -> ((s, d) => graft.profile.CompactionPlan.plan(s, d)),
      // FFD invariants (bytes/files conserved, no overfull bin, 11/9·OPT+1
      // bound, dense ids) as literal-TRUE booleans under the oracle
      "profile_compaction_plan_gate" -> ((s, d) => graft.profile.CompactionPlan.planGate(s, d)),
      // burst suppression: per-type admission under a 60s same-key holdoff
      "events_debounce" -> ((s, d) => EventOps.debounceSummary(s, d)),
      // k-core of the near-dup pair graph: iterative peel (rows-only) +
      // in-query property gate under the oracle
      "dedup_kcore" -> (Dedup.kCoreSummary(_, _)),
      // cluster-size log2 histogram over the CC labels (rows-only)
      "dedup_cluster_sizes" -> (Dedup.clusterSizeHistogram(_, _)),
      "dedup_kcore_gate" -> ((s, d) => Dedup.kCoreGate(s, d)),
      // CC fixpoint invariants (edge-closure, min-label, partition mass)
      // as literal-TRUE booleans under the oracle
      "dedup_cluster_sizes_gate" -> (Dedup.clusterSizesGate(_, _)),
      // round-10 depth: ANN recall eval harness, exact hourly-series
      // autocorrelation (seasonality), Cramér's V categorical association,
      // Flesch-Kincaid readability, and the bucketed co-located join
      "ann_recall_eval" -> ((s, d) => Similarity.recallEval(s, d)),
      "embedding_knn_mutual" -> ((s, d) => Similarity.knnGraphMutual(s, d)),
      "ann_nprobe_sweep" -> ((s, d) => Similarity.nprobeSweep(s, d)),
      // the byte-budget knob (round 11): recall@10 per bytes/vector down
      // the flat/SQ8/PQ/IVFPQ compression ladder
      "ann_compression_sweep" -> ((s, d) => Similarity.compressionSweep(s, d)),
      "events_autocorrelation" -> ((s, d) => EventOps.autocorrelation(s, d)),
      "events_changepoint" -> (EventOps.changepoint(_, _)),
      "profile_cramers_v" -> ((s, d) => ProfileQueries.cramersV(s, d)),
      "profile_gk_lambda" -> ((s, d) => ProfileQueries.gkLambda(s, d)),
      "text_readability" -> (TextAnalysis.readability(_, _)),
      "q_bucketed_join" -> (RelationalExt.bucketedJoin(_, _)),
      "q_partition_pruned" -> (PartitionedTables.partitionPruned(_, _)),
      "q_dynamic_partition_pruning" -> (PartitionedTables.dppJoin(_, _)),
      "dedup_banding_curve" -> ((s, d) => Dedup.bandingCurve(s, d)),
      "dedup_banding_pick" -> ((s, d) => Dedup.bandingPick(s, d)),
      "dedup_banding_deployed" -> ((s, d) => Dedup.bandingDeployed(s, d)),
      // web front-door normalizers (round 10): URL canonicalization (the
      // per-row projection that keys crawl exact-dedup), dedup groups over
      // the canonical key, and HTML boilerplate strip + tag-density profile
      "text_url_canonicalize" -> (WebNormalize.urlCanonicalize(_, _)),
      "dedup_url_groups" -> (WebNormalize.urlDedupGroups(_, _)),
      "docs_html_strip" -> (WebNormalize.htmlStripProfile(_, _)),
      // lexical fingerprint: pairwise TV distance between source vocabularies
      "text_source_tv_distance" -> (TextAnalysis.sourceTvDistance(_, _)),
      // rank-matched quantile normalization of lengths across sources
      "docs_quantile_normalize" -> ((s, d) => TextAnalysis.quantileNormalize(s, d)),
      // PMI collocations ranked by an exact integer ratio (no libm)
      "text_collocations" -> ((s, d) => TextAnalysis.collocations(s, d)),
      // Herfindahl concentration of language shares per source
      "profile_hhi_lang_by_source" -> ((s, d) => ProfileQueries.hhiProfile(s, d)),
      // Count-Min sketch build + native probe, guarantee-gated in-query
      "profile_cms_gate" -> ((s, d) => ProfileQueries.cmsGate(s, d)),
      // exact FD mining (A -> B) over orders; branches fused into one DAG
      "profile_fd_discovery_exact" -> ((s, d) => ProfileQueries.fdDiscovery(s, d)),
      // the 100 TB path: one fused HLL sketch scan screens all pairs,
      // exact branches run only for survivors (oracle = exact truth for
      // ALL pairs, so a screen false-negative is a hash mismatch)
      "profile_fd_discovery_screened" -> ((s, d) => ProfileQueries.fdDiscoveryScreened(s, d)),
      // screen economics: pruned-something + key-FDs-survive, literal-gated
      "profile_fd_screen_gate" -> ((s, d) => ProfileQueries.fdScreenGate(s, d)),
      // co-missingness: rows grouped by their full null bitmask
      "profile_null_patterns" -> ((s, d) => ProfileQueries.nullPatterns(s, d)),
      // PQ codebook quality: exact quantization error per subspace
      "ann_pq_distortion" -> ((s, d) => Similarity.pqDistortion(s, d)),
      // IVF quantizer health: per-cell population + imbalance ratio
      "ann_ivf_cell_balance" -> ((s, d) => Similarity.ivfCellBalance(s, d)),
      // MRL truncation probe: full-dim vs half-dim top-k overlap
      "ann_matryoshka_overlap" -> ((s, d) => Similarity.matryoshkaOverlap(s, d)),
      // filtered vector search (round 11): pre-filter exact top-k under a
      // label predicate, with the eligible-pool size per query
      "ann_filtered_topk" -> ((s, d) => Similarity.filteredTopK(s, d)),
      // the post-filter strategy on the unfiltered IVF index, each hit
      // flagged against the exact filtered answer (filtered recall)
      "ann_filtered_ivf" -> ((s, d) => Similarity.filteredIvfTopK(s, d)),
      // the filtered-search knob table: survivors/hits/recall per nprobe
      // (returned < gt_n at low nprobe is the starvation signal)
      "ann_filtered_sweep" -> ((s, d) => Similarity.filteredNprobeSweep(s, d)),
      // MMR diversity re-rank of the exact top-k (unrolled greedy rounds)
      "ann_mmr_diversify" -> ((s, d) => Similarity.mmrDiversify(s, d)),
      // 2-D skyline via per-size min + suffix-min over the size domain
      "q_pareto_frontier" -> (RelationalExt.paretoFrontier(_, _)),
      // exact weighted percentiles via grouped-value two-level prefix sums
      "profile_weighted_percentiles" -> ((s, d) => ProfileQueries.weightedPercentiles(s, d)),
      // sequential Poisson PPS sampling (Ohlsson 1998) over documents
      "docs_pps_sample" -> ((s, d) => TextAnalysis.ppsSample(s, d)),
      "docs_pps_stratified" -> ((s, d) => TextAnalysis.ppsStratified(s, d)),
      "docs_pps_ht_gate" -> ((s, d) => TextAnalysis.ppsHtGate(s, d)),
      "events_seasonal_backtest" -> (EventOps.seasonalBacktest(_, _)),
      "events_user_intensity" -> (EventOps.userIntensity(_, _)),
      "events_bot_regularity" -> ((s, d) => EventOps.botRegularity(s, d)),
      "events_attribution" -> ((s, d) => EventOps.attribution(s, d)),
      "events_conversion_lag" -> (EventOps.conversionLag(_, _)),
      // experiment readout: 2x2 spend cells + DiD estimate, hash-split arms
      "events_diff_in_diff" -> ((s, d) => EventOps.diffInDiff(s, d)),
      // dyadic-weight EWMA level forecast backtest (exact integer weights)
      "events_forecast_ewma" -> ((s, d) => EventOps.ewmaBacktest(s, d)),
      "profile_pk_discovery" -> (ProfileQueries.pkDiscovery(_, _)),
      // posting-list build: term -> df + capped sorted doc list
      "text_inverted_index" -> ((s, d) => TextAnalysis.invertedIndexDigest(s, d)),
      // native Aho-Corasick multi-literal containment screen
      "text_phrase_screen" -> (TextAnalysis.phraseScreen(_, _)),
      // Markov transition matrix + RFM quintile segmentation over events
      "events_transition_matrix" -> (EventOps.transitionMatrix(_, _)),
      // stationary mix of the journey chain: integer ppm power iteration
      "events_markov_stationary" -> (EventOps.markovStationary(_, _)),
      "events_rfm_scores" -> (EventOps.rfmScores(_, _)),
      // sequence-coverage audit: per-bucket missing/duplicate id counts
      "events_id_coverage" -> ((s, d) => EventOps.idCoverage(s, d)),
      // session path mining + exact OLS activity trends
      "events_session_paths" -> ((s, d) => EventOps.sessionPaths(s, d)),
      "events_trend_slopes" -> (EventOps.trendSlopes(_, _)),
      // robust location between mean and median; audience overlap matrix
      "events_trimmed_means" -> ((s, d) => EventOps.trimmedMeans(s, d)),
      "events_type_user_overlap" -> (EventOps.typeUserOverlap(_, _)),
      // hourly OHLC bars: first/last via lexicographic struct aggregates
      "events_ohlc_hourly" -> (EventOps.ohlcBars(_, _)),
      "q_snapshot_diff" -> (RelationalExt.snapshotDiff(_, _)),
      // right-to-be-forgotten down the FK chain (round 11): purge list ->
      // orders -> lineitems, plus monthly partitions needing rewrite
      "q_deletion_cascade" -> (RelationalExt.deletionCascade(_, _)),
      "profile_percentiles_quantity" -> (ProfileQueries.quantityPercentiles(_, _)),
      "profile_outliers_value" -> (ProfileQueries.valueOutliers(_, _)),
      // relational coverage (SURVEY §2.2-§2.5)
      "q1_pricing_summary" -> (Relational.q1PricingSummary(_, _)),
      "q3_shipping_priority" -> (Relational.q3ShippingPriority(_, _)),
      "q10_returned_items" -> (Relational.q10ReturnedItems(_, _)),
      "q18_large_volume" -> (Relational.q18LargeVolume(_, _)),
      // TPC-H battery #2 (round 9): every remaining classic expressible on
      // the fixture schema — q4/q17/q19/q21/q22 adapted to the columns that
      // exist, canonical plan shapes preserved (see TpchBattery scaladoc)
      "q4_late_orders" -> (TpchBattery.q4LateOrders(_, _)),
      "q5_local_supplier_volume" -> (TpchBattery.q5LocalSupplierVolume(_, _)),
      "q6_forecast_revenue" -> (TpchBattery.q6ForecastRevenue(_, _)),
      "q7_volume_shipping" -> (TpchBattery.q7VolumeShipping(_, _)),
      "q8_market_share" -> (TpchBattery.q8MarketShare(_, _)),
      "q13_customer_distribution" -> (TpchBattery.q13CustomerDistribution(_, _)),
      "q14_promo_effect" -> (TpchBattery.q14PromoEffect(_, _)),
      "q15_top_supplier" -> (TpchBattery.q15TopSupplier(_, _)),
      "q17_small_qty_revenue" -> (TpchBattery.q17SmallQuantityRevenue(_, _)),
      "q19_disjunctive_revenue" -> (TpchBattery.q19DisjunctiveRevenue(_, _)),
      "q21_waiting_suppliers" -> (TpchBattery.q21WaitingSuppliers(_, _)),
      "q22_idle_customers" -> (TpchBattery.q22IdleCustomers(_, _)),
      "embedding_norm_extremes" -> (Similarity.normExtremes(_, _)),
      "q_revenue_by_region" -> (Relational.revenueByRegion(_, _)),
      "q_customer_order_counts" -> (Relational.customerOrderCounts(_, _)),
      "q_semi_join" -> (Relational.customersWithOrders(_, _)),
      "q_anti_join" -> (Relational.customersWithoutOrders(_, _)),
      "q_window_top_orders" -> (Relational.topOrdersPerCustomer(_, _)),
      "q_top10_orders" -> (Relational.topOrdersGlobal(_, _)),
      "q_except_nations" -> (Relational.customerOnlyNations(_, _)),
      "q_intersect_nations" -> (Relational.sharedNations(_, _)),
      "q_intersect_all" -> (RelationalExt.sharedNationsAll(_, _)),
      "q_except_all" -> (RelationalExt.customerNationsExceptAll(_, _)),
      "q_salted_skew_join" -> (Relational.saltedSupplierRevenue(_, _)),
      "q_rollup_pricing" -> (Relational.pricingRollup(_, _)),
      "q_rollup_flags" -> (RelationalExt.pricingRollupFlags(_, _)),
      "events_hourly_deltas" -> (EventOps.hourlyDeltas(_, _)),
      "q_cube_pricing" -> (Relational.pricingCube(_, _)),
      "q_scalar_subquery" -> (Relational.aboveAverageCustomers(_, _)),
      "profile_strlen_documents" -> (ProfileQueries.docStringStats(_, _)),
      "q_asof_click_error" -> (Relational.asOfClickError(_, _)),
      // relational coverage battery #2 (round 2)
      "q_full_outer_nations" -> (RelationalExt.nationAccountFullOuter(_, _)),
      "q_right_outer" -> (RelationalExt.ordersRightJoinCustomers(_, _)),
      "q_grouping_sets" -> (RelationalExt.pricingGroupingSets(_, _)),
      "q_correlated_subquery" -> (RelationalExt.aboveCustomerAverageOrders(_, _)),
      "q_in_subquery" -> (RelationalExt.partsWithReturns(_, _)),
      "q_lateral_tokens" -> (RelationalExt.docLeadingTokens(_, _)),
      "q_lateral_topk" -> (RelationalExt.lateralRecentOrders(_, _)),
      "q_hof_funcs" -> (RelationalExt.docHofFuncs(_, _)),
      "q_exists_counts" -> (RelationalExt.nationOrderPresence(_, _)),
      "q_try_funcs" -> (RelationalExt.partTryFuncs(_, _)),
      "q_bitwise_funcs" -> (RelationalExt.partBitwiseFuncs(_, _)),
      "q_struct_funcs" -> (RelationalExt.orderStructFuncs(_, _)),
      "q_window_battery" -> (RelationalExt.orderWindowBattery(_, _)),
      "q_window_battery2" -> (RelationalExt.orderWindowBattery2(_, _)),
      "q_regex_funcs" -> (RelationalExt.partRegexFuncs(_, _)),
      "q_shuffle_hash_join" -> (RelationalExt.shuffleHashSpend(_, _)),
      "q_sort_merge_join" -> (RelationalExt.sortMergeSpend(_, _)),
      // association rules: brand pairs by exact integer lift over baskets
      "q_market_basket" -> ((s, d) => RelationalExt.marketBasket(s, d)),
      "q_map_funcs" -> (RelationalExt.partTagMaps(_, _)),
      "q_string_funcs" -> (RelationalExt.partStringFuncs(_, _)),
      "q_date_funcs" -> (RelationalExt.orderDateFuncs(_, _)),
      "q_distinct_aggs" -> (RelationalExt.lineitemDistinctAggs(_, _)),
      "q_conditional_aggs" -> (RelationalExt.priorityConditionalAggs(_, _)),
      "q_self_join_nations" -> (RelationalExt.nationPairsSameRegion(_, _)),
      "q_union_by_name" -> (RelationalExt.accountHoldersUnionByName(_, _)),
      "q_unpivot" -> (RelationalExt.lineitemUnpivot(_, _)),
      "q_array_funcs" -> (RelationalExt.docArrayFuncs(_, _)),
      "q_having" -> (RelationalExt.frequentCustomers(_, _)),
      "q_merge_upsert" -> (RelationalExt.mergeUpsert(_, _)),
      "q_limit_offset" -> (RelationalExt.ordersPage(_, _)),
      "events_json_typed" -> (EventOps.jsonTyped(_, _)),
      "events_json_variant" -> (EventOps.jsonVariant(_, _)),
      "text_tfidf" -> (TextAnalysis.tfidf(_, _)),
      // text analysis (BASELINE.json LLM-pipeline operators)
      "text_token_counts" -> (TextAnalysis.tokenCounts(_, _)),
      "text_quality" -> (TextAnalysis.qualityScores(_, _)),
      // code-vs-prose composition per source (round 11): planted
      // code-rendered docs, symbol-density detector, exact ppm rollup
      "text_code_detect" -> (TextAnalysis.codeDetect(_, _)),
      // tokenizer fertility (round 11): chars-per-token / tokens-per-doc
      // milli ratios per (lang, source) — the byte→token budget converter
      "text_fertility" -> (TextAnalysis.fertility(_, _)),
      "text_tokenize_bpe" -> (TextAnalysis.tokenizeBpe(_, _)),
      "text_bpe_train" -> (TextAnalysis.bpeTrain(_, _)),
      // train-then-tokenize (round 13): corpus → learned vocab → fertility
      // ON the trained vocab, one gated run (train AND apply both replayed)
      "text_tokenize_trained" -> ((s, d) => TextAnalysis.tokenizeTrained(s, d)),
      // template-header screen (round 11): most common 5-word doc prefix
      // per source + exact coverage permille (planted banner surfaces)
      "text_boilerplate_prefix" -> (TextAnalysis.boilerplatePrefix(_, _)),
      "text_langid" -> (TextAnalysis.languageId(_, _)),
      "text_lang_confusion" -> (TextAnalysis.langConfusion(_, _)),
      "text_fingerprints" -> (TextAnalysis.fingerprints(_, _)),
      "text_doc_freq" -> (TextAnalysis.docFrequency(_, _)),
      "text_clean_pipeline" -> (TextAnalysis.cleanPipeline(_, _)),
      "text_pii_mask" -> (TextAnalysis.piiMask(_, _)),
      // PII density per source (round 11): planted email/phone rates,
      // the compliance rollup above the per-doc redaction
      "text_pii_rates" -> (TextAnalysis.piiRates(_, _)),
      "docs_stratified_sample" -> (TextAnalysis.stratifiedSample(_, _)),
      "text_decontaminate" -> (TextAnalysis.decontaminate(_, _)),
      // the eval owner's view of the same overlap (round 11): per
      // benchmark item, how many training docs/grams/sources burn it
      "text_eval_burn" -> (TextAnalysis.evalBurn(_, _)),
      // verbatim character-window screen (round 11): the second
      // decontamination pass, catching leaks 5-gram word overlap can miss
      "text_substring_contamination" -> (TextAnalysis.substringContamination(_, _)),
      "text_repetition" -> (TextAnalysis.repetitionRatio(_, _)),
      "text_pack_sequences" -> (TextAnalysis.packSequences(_, _)),
      "text_pack_sequences_bpe" -> (TextAnalysis.packSequencesBpe(_, _)),
      // the max-seq-len knob table (round 11): windows / tail pad /
      // boundary-straddling docs+tokens per candidate window length
      "text_packing_sweep" -> (TextAnalysis.packingSweep(_, _)),
      "text_build_spans" -> (TextAnalysis.buildSpanStage(_, _)),
      "text_dup_spans" -> (TextAnalysis.dupSpans(_, _)),
      "text_span_mask" -> (TextAnalysis.spanMask(_, _)),
      "text_paragraph_dedup" -> (TextAnalysis.paragraphDedup(_, _)),
      "text_novelty" -> (TextAnalysis.ngramNovelty(_, _)),
      "docs_shuffle_shards" -> (TextAnalysis.shuffleShards(_, _)),
      "docs_mixture_budget" -> (TextAnalysis.mixtureBudget(_, _)),
      "docs_mixture_expand" -> (TextAnalysis.mixtureExpand(_, _)),
      "docs_quality_prune" -> (TextAnalysis.qualityPrune(_, _)),
      "docs_ccnet_buckets" -> (TextAnalysis.unigramSurprisal(_, _)),
      "docs_bigram_buckets" -> (TextAnalysis.bigramSurprisal(_, _)),
      "docs_lm_order_agreement" -> (TextAnalysis.lmOrderAgreement(_, _)),
      "docs_ccnet_deployed" -> (TextAnalysis.ccnetDeployed(_, _)),
      "docs_bigram_deployed" -> (TextAnalysis.bigramDeployed(_, _)),
      "docs_trigram_buckets" -> (TextAnalysis.trigramSurprisal(_, _)),
      "docs_trigram_deployed" -> (TextAnalysis.trigramDeployed(_, _)),
      "docs_trigram_backoff" -> (TextAnalysis.trigramBackoff(_, _)),
      "docs_lm_order_agreement3" -> (TextAnalysis.lmOrderAgreement3(_, _)),
      "docs_dsir_importance" -> (DataSelection.dsirImportance(_, _)),
      "docs_dsir_select" -> (DataSelection.dsirSelect(_, _)),
      "docs_dsir_deployed" -> (DataSelection.dsirDeployed(_, _)),
      "docs_target_affinity" -> (TextAnalysis.targetAffinity(_, _)),
      "docs_train_split" -> (TextAnalysis.trainSplit(_, _)),
      "docs_split_leakage" -> (TextAnalysis.splitLeakage(_, _)),
      "docs_cluster_safe_split" -> (TextAnalysis.clusterSafeSplit(_, _)),
      "docs_gopher_rules" -> (TextAnalysis.gopherRules(_, _)),
      // filter-redundancy read (round 11): pairwise 2x2 confusion +
      // Cohen's kappa across the four keep decisions, one corpus pass
      "docs_filter_agreement" -> (TextAnalysis.filterAgreement(_, _)),
      "docs_curriculum_order" -> (TextAnalysis.curriculumOrder(_, _)),
      "docs_corpus_report" -> (TextAnalysis.corpusReport(_, _)),
      // overlapping token-window chunk plan (the RAG embedding front door)
      "docs_rag_chunks" -> ((s, d) => TextAnalysis.ragChunks(s, d)),
      // hash-deterministic Poisson-bootstrap CI for per-source mean length
      "docs_bootstrap_ci" -> ((s, d) => TextAnalysis.bootstrapCi(s, d)),
      // dedup family
      "dedup_build_pipeline" -> (Dedup.buildPipeline(_, _)),
      "dedup_exact_groups" -> (Dedup.exactDupGroups(_, _)),
      "dedup_exact_keep_first" -> (Dedup.exactDedupKeepFirst(_, _)),
      "dedup_minhash_pairs" -> (Dedup.minhashCandidatePairs(_, _)),
      "dedup_simhash" -> (Dedup.simhashSignatures(_, _)),
      "dedup_simhash64" -> (Dedup.simhash64Signatures(_, _)),
      "dedup_simhash_pairs" -> (Dedup.simhashHammingPairs(_, _)),
      "dedup_simhash64_pairs" -> (Dedup.simhash64HammingPairs(_, _)),
      "dedup_ngram_jaccard" -> (Dedup.ngramJaccardPairs(_, _)),
      // EXACT Jaccard-threshold join via prefix filtering (AllPairs/PPJoin)
      // — recall-1.0 by construction; the oracle is the brute-force join
      "dedup_prefix_join" -> ((s, d) => Dedup.prefixFilterJoinPairs(s, d)),
      // asymmetric twin: exact containment join (A mostly inside B)
      "dedup_containment_join" -> ((s, d) => Dedup.containmentJoinPairs(s, d)),
      "dedup_minhash_est" -> (Dedup.minhashJaccardEstimate(_, _)),
      "dedup_fuzzy_names" -> (Dedup.fuzzyNamePairs(_, _)),
      "dedup_graph_triangles" -> (Dedup.nearDupTriangles(_, _)),
      "profile_percentiles_by_flag" -> (ProfileQueries.quantityPercentilesByFlag(_, _)),
      "dedup_group_signatures" -> (Dedup.groupSignatures(_, _)),
      "dedup_clusters" -> (Dedup.dedupClusters(_, _)),
      "dedup_clusters_star" -> (Dedup.dedupClustersStar(_, _)),
      "dedup_reach_recursive" -> (Dedup.reachRecursive(_, _)),
      "dedup_incremental" -> (Dedup.dedupIncremental(_, _)),
      "dedup_bloom_prefilter" -> (Dedup.bloomPrefilter(_, _)),
      "docs_takedown_manifest" -> (Dedup.takedownManifest(_, _)),
      "dedup_pagerank_hubs" -> (Dedup.pagerankHubs(_, _)),
      "dedup_degree_hist" -> (Dedup.degreeHistogram(_, _)),
      "dedup_funnel" -> (Dedup.dedupFunnel(_, _)),
      "dedup_source_overlap" -> (Dedup.sourceOverlap(_, _)),
      "dedup_keep_list" -> (Dedup.dedupKeepList(_, _)),
      "dedup_impact_by_source" -> (Dedup.dedupImpactBySource(_, _)),
      "dedup_quality_bias" -> (Dedup.dedupQualityBias(_, _)),
      "dedup_weights" -> (Dedup.dedupWeights(_, _)),
      "dedup_cdc_chunks" -> (Dedup.cdcChunks(_, _)),
      "dedup_cluster_lang_purity" -> (Dedup.clusterLangPurity(_, _)),
      "dedup_keep_best" -> (Dedup.dedupKeepBest(_, _)),
      "dedup_ensemble" -> (Dedup.dedupEnsemble(_, _)),
      "text_oov_rate" -> (TextAnalysis.oovRate(_, _)),
      "docs_training_manifest" -> (TextAnalysis.trainingManifest(_, _)),
      "docs_manifest_rollup" -> (TextAnalysis.manifestRollup(_, _)),
      "docs_shard_write" -> (TextAnalysis.shardWriteGate(_, _)),
      // per-shard manifest sidecar written WITH the artifact (round 11):
      // the summary a loader reads instead of scanning shards, gated by
      // recomputing every column from the raw tables
      "docs_shard_manifest" -> ((s, d) => TextAnalysis.shardManifest(s, d)),
      // straggler predictor off the manifest sidecar (round 11):
      // max-shard/total permille ratios for tokens and packed windows
      "docs_shard_balance" -> ((s, d) => TextAnalysis.shardBalance(s, d)),
      // the actionable follow-on (round 11): per-shard split/merge/ok
      // plan at exact-integer 1.2x/0.8x token thresholds
      "docs_shard_rebalance" -> ((s, d) => TextAnalysis.shardRebalance(s, d)),
      // the pre-ship sign-off table (round 11): keep accounting + the
      // three release audits (contamination, takedown, split leakage)
      // over the SAME kept set, in one long exact-integer report
      "docs_release_report" -> (TextAnalysis.releaseReport(_, _)),
      "pipeline_release_e2e" -> (TextAnalysis.pipelineReleaseE2e(_, _)),
      // the release gate run TWICE across a corpus delta (round 13): both
      // releases written + read back, the churn table from the artifacts
      "pipeline_release_diff_e2e" -> (TextAnalysis.pipelineReleaseDiffE2e(_, _)),
      // release A -> B churn per source (round 11): bucket rule relaxed
      // + takedown purge applied, docs/tokens added/removed in one pass
      "docs_release_diff" -> (TextAnalysis.releaseDiff(_, _)),
      // which keep-rule cut what, and what relaxing each would buy
      // (round 11): sole-blocker attribution over the shared manifest
      "docs_keep_ablation" -> (TextAnalysis.keepAblation(_, _)),
      // verification-threshold tuning table over the one pair graph
      // (round 11): pair volume / docs touched / max degree per J cut
      "dedup_threshold_sweep" -> (Dedup.thresholdSweep(_, _)),
      // the eyeball set (round 11): k pairs nearest the J=0.5 decision
      // boundary, with content md5s for the reviewer
      "dedup_audit_sample" -> ((s, d) => Dedup.auditSample(s, d)),
      // similarity search
      "ann_cosine_topk" -> (Similarity.cosineTopK(_, _)),
      // hybrid retrieval (round 9): keyword leg + vector leg fused with
      // integer-exact reciprocal-rank fusion
      "ann_hybrid_rrf" -> (Similarity.hybridRrf(_, _)),
      "ann_hybrid_rrf_ivf" -> (Similarity.hybridRrfIvf(_, _)),
      "ann_signlsh_topk" -> (Similarity.SignLsh.topK(_, _)),
      "ann_ivf_topk" -> (Similarity.ivfTopK(_, _)),
      "ann_ivf_refined_topk" -> (Similarity.ivfRefinedTopK(_, _)),
      "ann_pq_topk" -> (Similarity.pqTopK(_, _)),
      "ann_ivfpq_topk" -> (Similarity.ivfPqTopK(_, _)),
      // int8 scalar-quantized screen + exact float rerank
      "ann_sq8_topk" -> (Similarity.sq8TopK(_, _)),
      // frozen-centroid batch assignment + growth/drift maintenance report
      "ann_ivf_incremental" -> (Similarity.ivfIncremental(_, _)),
      // pairwise dimension correlations (PCA/whitening/PQ-split input)
      "embedding_corr_dims" -> (Similarity.dimCorrMatrix(_, _)),
      // top PC: distributed covariance, d-bounded integer power iteration
      "embedding_top_pc" -> (Similarity.topPrincipalComponent(_, _)),
      // contrastive hard-negative mining with triplet-violation flags
      "embedding_hard_negatives" -> (Similarity.hardNegatives(_, _)),
      "semdedup" -> (Similarity.semDedup(_, _)),
      "embedding_near_dups" -> (Similarity.embeddingNearDups(_, _)),
      // storage-level exact duplicate vectors (round 11): planted
      // re-ingest, 16 B hash keys only across the shuffle
      "embedding_exact_dups" -> (Similarity.exactVectorDups(_, _)),
      "embedding_centroids" -> (Similarity.labelCentroids(_, _)),
      "embedding_label_outliers" -> (Similarity.labelOutliers(_, _)),
      // embedding-space label eval: (true x nearest-centroid) cross-tab
      "embedding_centroid_confusion" -> (Similarity.centroidConfusion(_, _)),
      "embedding_quantize_int8" -> (Similarity.quantizeInt8(_, _)),
      // events / JSON / windows / sessions
      "events_json_profile" -> (EventOps.jsonProfile(_, _)),
      // JSON schema discovery: every key x lexically-inferred scalar type
      "events_json_schema" -> (EventOps.jsonSchemaProfile(_, _)),
      "events_hourly" -> (EventOps.hourlyRollup(_, _)),
      "events_sliding" -> (EventOps.slidingRollup(_, _)),
      "events_gapfill" -> (EventOps.hourlyGapFill(_, _)),
      // right-to-be-forgotten impact over the event log (round 11):
      // purge volume + hourly partitions needing rewrite, long format
      "events_deletion_impact" -> (EventOps.deletionImpact(_, _)),
      "events_funnel" -> (EventOps.signupFunnel(_, _)),
      // time-bounded funnel (round 11): conversion windows per stage plus
      // the per-stage lag columns the windows are tuned from
      "events_funnel_bounded" -> (EventOps.signupFunnelBounded(_, _)),
      // signup-week cohort conversion matrix over the bounded funnel
      "events_funnel_cohorts" -> (EventOps.funnelCohorts(_, _)),
      // experiment hygiene (round 11): deterministic 50/50 assignment,
      // per-variant volumes, exact chi-square SRM gate at the 95% critical
      "events_ab_srm" -> (EventOps.abSrm(_, _)),
      // pre-launch sizing (round 11): pooled variance of the per-user
      // purchase metric + the two-sample MDE at alpha=5%/power 80%
      "events_power_mde" -> (EventOps.powerMde(_, _)),
      // CUPED (round 11): pre/post covariance adjustment theta + exact
      // permille variance reduction from pre-period data
      "events_cuped" -> (EventOps.cuped(_, _)),
      // the A/B readout (round 11): per-variant rates/means + observed
      // lift judged against the MDE (can this experiment claim anything?)
      "events_experiment_lift" -> (EventOps.experimentLift(_, _)),
      "events_cohorts" -> (EventOps.cohortRetention(_, _)),
      "events_scd2" -> (EventOps.scd2(_, _)),
      // point-in-time join: facts to the SCD2 version valid at event time
      "events_pit_join" -> (EventOps.pitJoin(_, _)),
      "events_hourly_anomalies" -> (EventOps.hourlyAnomalies(_, _)),
      "q_arg_max" -> (RelationalExt.nationArgMaxCustomers(_, _)),
      "events_dow_heatmap" -> (EventOps.weekdayHourHeatmap(_, _)),
      "q_null_handling" -> (RelationalExt.nullHandling(_, _)),
      "q_math_funcs" -> (RelationalExt.mathFuncs(_, _)),
      "q_string_agg" -> (RelationalExt.nationListPerRegion(_, _)),
      "events_sessions" -> (EventOps.sessionize(_, _)),
      "events_session_windows" -> (EventOps.sessionWindows(_, _)),
      "text_char_bigrams" -> (TextAnalysis.charBigrams(_, _)),
      "events_type_pivot" -> (EventOps.eventTypePivot(_, _)),
      "events_range_join" -> (EventOps.purchaseClickAttribution(_, _)),
      "events_range_join_auto" -> (EventOps.naiveRangeJoinAuto(_, _)),
      "events_range_join_global" -> (EventOps.rangeJoinGlobal(_, _)),
      "events_range_join_left" -> (EventOps.rangeJoinLeft(_, _)),
      "events_zorder_layout" -> (EventOps.zorderLayout(_, _)),
      "events_drift_chisq" -> (EventOps.driftChisq(_, _)),
      "events_drift_ks" -> (EventOps.driftKs(_, _)),
      // multimodal manifest / resize plan / frame sampling
      "multimodal_manifest" -> (Multimodal.mediaManifest(_, _)),
      "multimodal_resize" -> (Multimodal.resizePlan(_, _)),
      "multimodal_frames" -> (Multimodal.frameSamples(_, _)),
      "multimodal_tiles" -> (Multimodal.tilePlan(_, _)),
      "multimodal_audio_profile" -> (Multimodal.audioProfile(_, _)),
      // frame-energy VAD over the same decode seam (round 11): voiced
      // frames, longest voiced run, exact speech permille per clip
      "multimodal_audio_vad" -> (Multimodal.audioVad(_, _)),
      // luminance histogram + exposure screens through the real ImageIO
      // decode (round 11): planted dark/bright frames must flag
      "multimodal_image_histogram" -> (Multimodal.imageHistogramProfile(_, _)),
      // shot-boundary detection over an 8-frame clip (round 11): exact
      // TV gate on consecutive histograms; the planted cut must surface
      "multimodal_shot_cuts" -> (Multimodal.shotCutProfile(_, _)),
      "multimodal_image_dhash" -> (Multimodal.imageDHashProfile(_, _)),
      "dedup_image_groups" -> (Multimodal.imageDupGroups(_, _)),
      // data-quality validation rules (the north-star surface)
      "quality_checks" -> (graft.quality.QualitySuite.run(_, _)),
      "quality_classifier_train" -> (QualityClassifier.classifierTrain(_, _)),
      "quality_classifier_confusion" -> (QualityClassifier.classifierConfusion(_, _)),
      "quality_classifier_drift" -> (QualityClassifier.classifierDrift(_, _)),
      "docs_classifier_auc" -> (QualityClassifier.classifierAuc(_, _)),
      // held-out generalization: fit on the 80% hash-split train bucket,
      // AUC on the never-seen 10% test bucket (VERDICT r15 #2)
      "docs_classifier_auc_heldout" -> (QualityClassifier.classifierAucHeldout(_, _)),
      // fixed-bin deployed twin of the AUC rank window (VERDICT r15 #5)
      "docs_classifier_auc_binned" -> (QualityClassifier.classifierAucBinned(_, _)),
      "docs_classifier_calibration" -> (QualityClassifier.classifierCalibration(_, _)))
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = {
    val profileStats = Fixtures.allTables
      .map(t => s"profile_stats_$t" -> ProfileQueries.statsOracle(t)).toMap
    profileStats ++ Map(
      "profile_rowcounts" -> ProfileQueries.rowCountsOracle,
      "profile_bool_histogram" -> ProfileQueries.boolHistogramOracle,
      "profile_ndv_lineitem" -> ProfileQueries.ndvOracle("lineitem"),
      "profile_ndv_orders" -> ProfileQueries.ndvOracle("orders"),
      "profile_topk_values" -> ProfileQueries.topkValuesOracle,
      "profile_key_overlap" -> ProfileQueries.keyOverlapOracle,
      "profile_erd_classes" -> ProfileQueries.erdClassesOracle,
      "profile_key_overlap_sketch" -> ProfileQueries.keyOverlapSketchOracle,
      "profile_catalog_long" -> ProfileQueries.catalogProfileOracle,
      // profile_fk_discovery intentionally has NO oracle entry (HLL
      // estimates); the detection guarantee is gated by
      "profile_fk_discovery_gate" -> ProfileQueries.fkDiscoveryGateOracle,
      // profile_heavy_values intentionally has NO oracle entry (summary map
      // is merge-order-dependent at the borderline); the guarantee gate is
      "profile_heavy_values_gate" -> ProfileQueries.heavyValuesGateOracle(),
      "profile_summary_lineitem" -> ProfileQueries.fullProfileOracle("lineitem"),
      "profile_summary_orders" -> ProfileQueries.fullProfileOracle("orders"),
      "profile_summary_documents" -> ProfileQueries.fullProfileOracle("documents"),
      "profile_summary_events" -> ProfileQueries.fullProfileOracle("events"),
      // profile_sketch_lineitem / profile_sketch_events intentionally have
      // NO oracle entry: their output is sketch estimates (engine-specific),
      // so the driver applies its rows-only check; the oracle-gated form
      // lives under profile_sketch_gate_*
      "profile_sketch_gate_lineitem" -> ProfileQueries.sketchProfileGateOracle("lineitem"),
      "profile_sketch_gate_events" -> ProfileQueries.sketchProfileGateOracle("events"),
      "profile_histogram_quantity" -> ProfileQueries.quantityHistogramOracle,
      "profile_histogram_depth" -> ProfileQueries.quantityDepthHistogramOracle,
      "profile_corr_lineitem" -> ProfileQueries.quantityPriceCorrOracle,
      "profile_corr_matrix" -> ProfileQueries.corrMatrixOracle,
      "profile_gini_lineitem" -> ProfileQueries.giniProfileOracle(),
      "profile_gini_user_activity" -> ProfileQueries.giniUserActivityOracle,
      "profile_eta2_lang" -> ProfileQueries.etaSquaredOracle(),
      "profile_spearman_rho" -> ProfileQueries.spearmanRhoOracle,
      "profile_kendall_tau" -> ProfileQueries.kendallTauOracle,
      "profile_histogram_2d" -> ProfileQueries.histogram2dOracle,
      "profile_lorenz_sources" -> ProfileQueries.lorenzSourcesOracle,
      "profile_benford_totalprice" -> ProfileQueries.benfordProfileOracle(),
      "events_robust_anomalies" -> EventOps.robustAnomaliesOracle,
      "events_max_concurrency" -> EventOps.maxConcurrencyOracle,
      "events_user_growth" -> EventOps.userGrowthOracle,
      "events_busy_window_sessions" -> EventOps.busyWindowSessionsOracle,
      "events_rolling_wau" -> EventOps.rollingActiveUsersOracle,
      "events_rolling_wau_sketch" -> EventOps.rollingWauSketchGateOracle,
      "events_conformance" -> EventOps.purchaseConformanceOracle,
      "events_theil_sen" -> EventOps.theilSenSlopesOracle,
      "events_seasonal_spikes" -> EventOps.seasonalSpikesOracle(),
      "profile_join_skew" -> ProfileQueries.joinSkewProfileOracle(),
      "profile_log2_histogram" -> ProfileQueries.log2HistogramOracle(),
      "embedding_dim_stats" -> Similarity.dimStatsOracle,
      "embedding_version_drift" -> Similarity.versionDriftOracle,
      "q_sql_text_revenue" -> RelationalExt.sqlTextRevenueOracle,
      "events_weekend_ranktest" -> EventOps.weekendRankTestOracle,
      "events_dormancy" -> EventOps.dormancyBucketsOracle,
      "q_revenue_deciles" -> RelationalExt.revenueDecilesOracle,
      "events_session_gap_sweep" -> EventOps.sessionGapSweepOracle,
      "events_burstiness" -> EventOps.burstinessOracle,
      "events_cohort_ltv" -> EventOps.cohortLtvOracle,
      "q_order_aging" -> RelationalExt.orderAgingOracle,
      "events_range_join_abs" -> EventOps.absRangeJoinAutoOracle,
      "events_wavelet_energy" -> EventOps.waveletEnergyOracle(),
      "events_lateness_profile" -> EventOps.latenessProfileOracle,
      "events_watermark_sweep" -> EventOps.watermarkSweepOracle,
      "text_vocab_growth" -> TextAnalysis.vocabGrowthOracle,
      "text_zipf_profile" -> TextAnalysis.zipfProfileOracle,
      "text_lexical_diversity" -> TextAnalysis.lexicalDiversityOracle,
      "events_cusum_alarms" -> EventOps.cusumAlarmsOracle(),
      "events_asof_nearest" -> EventOps.asofNearestClickOracle(),
      "events_cross_correlation" -> EventOps.crossCorrelationOracle(),
      "profile_k_anonymity" -> ProfileQueries.kAnonymityOracle(),
      "profile_anonymization_ladder" -> ProfileQueries.anonymizationLadderOracle(),
      "profile_catalog_strings" -> ProfileQueries.catalogStringProfileOracle,
      "events_debounce" -> EventOps.debounceSummaryOracle(),
      "dedup_kcore_gate" -> Dedup.kCoreGateOracle,
      "dedup_cluster_sizes_gate" -> Dedup.clusterSizesGateOracle,
      "ann_recall_eval" -> Similarity.recallEvalOracle(),
      "embedding_knn_mutual" -> Similarity.knnGraphMutualOracle(),
      "ann_nprobe_sweep" -> Similarity.nprobeSweepOracle(),
      "ann_compression_sweep" -> Similarity.compressionSweepOracle(),
      "events_autocorrelation" -> EventOps.autocorrelationOracle(),
      "events_changepoint" -> EventOps.changepointOracle,
      "profile_cramers_v" -> ProfileQueries.cramersVOracle(),
      "profile_gk_lambda" -> ProfileQueries.gkLambdaOracle(),
      "text_readability" -> TextAnalysis.readabilityOracle,
      "q_bucketed_join" -> RelationalExt.bucketedJoinOracle,
      "q_partition_pruned" -> PartitionedTables.partitionPrunedOracle,
      "q_dynamic_partition_pruning" -> PartitionedTables.dppJoinOracle,
      "dedup_banding_curve" -> Dedup.bandingCurveOracle(),
      "dedup_banding_pick" -> Dedup.bandingPickOracle(),
      "dedup_banding_deployed" -> Dedup.bandingDeployedOracle(),
      "text_url_canonicalize" -> WebNormalize.urlCanonicalizeOracle,
      "dedup_url_groups" -> WebNormalize.urlDedupGroupsOracle,
      "docs_html_strip" -> WebNormalize.htmlStripProfileOracle,
      "profile_compaction_plan_gate" -> graft.profile.CompactionPlan.planGateOracle,
      "text_source_tv_distance" -> TextAnalysis.sourceTvDistanceOracle,
      "docs_quantile_normalize" -> TextAnalysis.quantileNormalizeOracle,
      "text_collocations" -> TextAnalysis.collocationsOracle(),
      "profile_hhi_lang_by_source" -> ProfileQueries.hhiProfileOracle(),
      "profile_cms_gate" -> ProfileQueries.cmsGateOracle,
      "profile_fd_discovery_exact" -> ProfileQueries.fdDiscoveryOracle("orders",
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      "profile_fd_discovery_screened" -> ProfileQueries.fdDiscoveryScreenedOracle("orders",
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      "profile_fd_screen_gate" -> ProfileQueries.fdScreenGateOracle(6),
      "profile_null_patterns" -> ProfileQueries.nullPatternsOracle,
      "ann_pq_distortion" -> Similarity.pqDistortionOracle(),
      "ann_ivf_cell_balance" -> Similarity.ivfCellBalanceOracle(),
      "ann_matryoshka_overlap" -> Similarity.matryoshkaOverlapOracle(),
      "ann_filtered_topk" -> Similarity.filteredTopKOracle(),
      "ann_filtered_ivf" -> Similarity.filteredIvfTopKOracle(),
      "ann_filtered_sweep" -> Similarity.filteredNprobeSweepOracle(),
      "ann_mmr_diversify" -> Similarity.mmrDiversifyOracle(),
      "q_pareto_frontier" -> RelationalExt.paretoFrontierOracle,
      "profile_weighted_percentiles" -> ProfileQueries.weightedPercentilesOracle(),
      "docs_pps_sample" -> TextAnalysis.ppsSampleOracle(),
      "docs_pps_stratified" -> TextAnalysis.ppsStratifiedOracle(),
      "docs_pps_ht_gate" -> TextAnalysis.ppsHtGateOracle(),
      "events_seasonal_backtest" -> EventOps.seasonalBacktestOracle,
      "events_user_intensity" -> EventOps.userIntensityOracle,
      "events_bot_regularity" -> EventOps.botRegularityOracle(),
      "events_attribution" -> EventOps.attributionOracle(),
      "events_conversion_lag" -> EventOps.conversionLagOracle,
      "events_diff_in_diff" -> EventOps.diffInDiffOracle(),
      "events_forecast_ewma" -> EventOps.ewmaBacktestOracle(),
      "profile_pk_discovery" -> ProfileQueries.pkDiscoveryOracle,
      "text_inverted_index" -> TextAnalysis.invertedIndexDigestOracle(),
      "text_phrase_screen" -> TextAnalysis.phraseScreenOracle,
      "events_transition_matrix" -> EventOps.transitionMatrixOracle,
      "events_markov_stationary" -> EventOps.markovStationaryOracle(),
      "events_rfm_scores" -> EventOps.rfmScoresOracle,
      "events_id_coverage" -> EventOps.idCoverageOracle(),
      "events_session_paths" -> EventOps.sessionPathsOracle(),
      "events_trend_slopes" -> EventOps.trendSlopesOracle,
      "events_trimmed_means" -> EventOps.trimmedMeansOracle(),
      "events_type_user_overlap" -> EventOps.typeUserOverlapOracle,
      "events_ohlc_hourly" -> EventOps.ohlcBarsOracle,
      "q_snapshot_diff" -> RelationalExt.snapshotDiffOracle,
      "q_deletion_cascade" -> RelationalExt.deletionCascadeOracle,
      "q_salted_skew_join" -> Relational.saltedSupplierRevenueOracle,
      "q_rollup_pricing" -> Relational.pricingRollupOracle,
      "q_rollup_flags" -> RelationalExt.pricingRollupFlagsOracle,
      "events_hourly_deltas" -> EventOps.hourlyDeltasOracle,
      "q_cube_pricing" -> Relational.pricingCubeOracle,
      "q_scalar_subquery" -> Relational.aboveAverageCustomersOracle,
      "profile_strlen_documents" -> ProfileQueries.docStringStatsOracle,
      "q_asof_click_error" -> Relational.asOfClickErrorOracle,
      "q_full_outer_nations" -> RelationalExt.nationAccountFullOuterOracle,
      "q_right_outer" -> RelationalExt.ordersRightJoinCustomersOracle,
      "q_grouping_sets" -> RelationalExt.pricingGroupingSetsOracle,
      "q_correlated_subquery" -> RelationalExt.aboveCustomerAverageOrdersOracle,
      "q_in_subquery" -> RelationalExt.partsWithReturnsOracle,
      "q_lateral_tokens" -> RelationalExt.docLeadingTokensOracle,
      "q_lateral_topk" -> RelationalExt.lateralRecentOrdersOracle,
      "q_hof_funcs" -> RelationalExt.docHofFuncsOracle,
      "q_exists_counts" -> RelationalExt.nationOrderPresenceOracle,
      "q_try_funcs" -> RelationalExt.partTryFuncsOracle,
      "q_bitwise_funcs" -> RelationalExt.partBitwiseFuncsOracle,
      "q_struct_funcs" -> RelationalExt.orderStructFuncsOracle,
      "q_window_battery" -> RelationalExt.orderWindowBatteryOracle,
      "q_window_battery2" -> RelationalExt.orderWindowBattery2Oracle,
      "q_regex_funcs" -> RelationalExt.partRegexFuncsOracle,
      "q_shuffle_hash_join" -> RelationalExt.shuffleHashSpendOracle,
      "q_sort_merge_join" -> RelationalExt.sortMergeSpendOracle,
      "q_market_basket" -> RelationalExt.marketBasketOracle(),
      "q_map_funcs" -> RelationalExt.partTagMapsOracle,
      "q_string_funcs" -> RelationalExt.partStringFuncsOracle,
      "q_date_funcs" -> RelationalExt.orderDateFuncsOracle,
      "q_distinct_aggs" -> RelationalExt.lineitemDistinctAggsOracle,
      "q_conditional_aggs" -> RelationalExt.priorityConditionalAggsOracle,
      "q_self_join_nations" -> RelationalExt.nationPairsSameRegionOracle,
      "q_union_by_name" -> RelationalExt.accountHoldersUnionByNameOracle,
      "q_unpivot" -> RelationalExt.lineitemUnpivotOracle,
      "q_array_funcs" -> RelationalExt.docArrayFuncsOracle,
      "q_having" -> RelationalExt.frequentCustomersOracle,
      "q_merge_upsert" -> RelationalExt.mergeUpsertOracle,
      "q_limit_offset" -> RelationalExt.ordersPageOracle,
      "events_json_typed" -> EventOps.jsonTypedOracle,
      "events_json_variant" -> EventOps.jsonVariantOracle,
      "text_tfidf" -> TextAnalysis.tfidfOracle,
      "dedup_simhash_pairs" -> Dedup.simhashHammingPairsOracle,
      "dedup_simhash64_pairs" -> Dedup.simhash64HammingPairsOracle,
      "events_sessions" -> EventOps.sessionizeOracle,
      "events_session_windows" -> EventOps.sessionWindowsOracle,
      "text_char_bigrams" -> TextAnalysis.charBigramsOracle,
      "events_type_pivot" -> EventOps.eventTypePivotOracle,
      "events_range_join" -> EventOps.purchaseClickAttributionOracle,
      "events_range_join_auto" -> EventOps.naiveRangeJoinAutoOracle,
      "events_range_join_global" -> EventOps.rangeJoinGlobalOracle,
      "events_range_join_left" -> EventOps.rangeJoinLeftOracle,
      "events_zorder_layout" -> EventOps.zorderLayoutOracle,
      "events_drift_chisq" -> EventOps.driftChisqOracle,
      "events_drift_ks" -> EventOps.driftKsOracle,
      "profile_percentiles_quantity" -> ProfileQueries.quantityPercentilesOracle,
      "profile_outliers_value" -> ProfileQueries.valueOutliersOracle,
      "q1_pricing_summary" -> Relational.q1Oracle,
      "q3_shipping_priority" -> Relational.q3Oracle(),
      "q10_returned_items" -> Relational.q10Oracle(),
      "q18_large_volume" -> Relational.q18Oracle(),
      "q4_late_orders" -> TpchBattery.q4Oracle(),
      "q5_local_supplier_volume" -> TpchBattery.q5Oracle(),
      "q6_forecast_revenue" -> TpchBattery.q6Oracle(),
      "q7_volume_shipping" -> TpchBattery.q7Oracle(),
      "q8_market_share" -> TpchBattery.q8Oracle(),
      "q13_customer_distribution" -> TpchBattery.q13Oracle,
      "q14_promo_effect" -> TpchBattery.q14Oracle(),
      "q15_top_supplier" -> TpchBattery.q15Oracle(),
      "q17_small_qty_revenue" -> TpchBattery.q17Oracle(),
      "q19_disjunctive_revenue" -> TpchBattery.q19Oracle,
      "q21_waiting_suppliers" -> TpchBattery.q21Oracle(),
      "q22_idle_customers" -> TpchBattery.q22Oracle(),
      "embedding_norm_extremes" -> Similarity.normExtremesOracle(),
      "q_revenue_by_region" -> Relational.revenueByRegionOracle,
      "q_customer_order_counts" -> Relational.customerOrderCountsOracle,
      "q_semi_join" -> Relational.customersWithOrdersOracle,
      "q_anti_join" -> Relational.customersWithoutOrdersOracle,
      "q_window_top_orders" -> Relational.topOrdersPerCustomerOracle,
      "q_top10_orders" -> Relational.topOrdersGlobalOracle,
      "q_except_nations" -> Relational.customerOnlyNationsOracle,
      "q_intersect_nations" -> Relational.sharedNationsOracle,
      "q_intersect_all" -> RelationalExt.sharedNationsAllOracle,
      "q_except_all" -> RelationalExt.customerNationsExceptAllOracle,
      "text_token_counts" -> TextAnalysis.tokenCountsOracle,
      "text_quality" -> TextAnalysis.qualityScoresOracle,
      "text_code_detect" -> TextAnalysis.codeDetectOracle,
      "text_fertility" -> TextAnalysis.fertilityOracle,
      "text_tokenize_bpe" -> TextAnalysis.tokenizeBpeOracle,
      "text_bpe_train" -> TextAnalysis.bpeTrainOracle(),
      "text_tokenize_trained" -> TextAnalysis.tokenizeTrainedOracle(),
      "text_boilerplate_prefix" -> TextAnalysis.boilerplatePrefixOracle,
      "text_langid" -> TextAnalysis.languageIdOracle,
      "text_lang_confusion" -> TextAnalysis.langConfusionOracle,
      "text_fingerprints" -> TextAnalysis.fingerprintsOracle,
      "text_doc_freq" -> TextAnalysis.docFrequencyOracle,
      "text_clean_pipeline" -> TextAnalysis.cleanPipelineOracle,
      "text_pii_mask" -> TextAnalysis.piiMaskOracle,
      "text_pii_rates" -> TextAnalysis.piiRatesOracle,
      "docs_stratified_sample" -> TextAnalysis.stratifiedSampleOracle,
      "text_decontaminate" -> TextAnalysis.decontaminateOracle,
      "text_eval_burn" -> TextAnalysis.evalBurnOracle,
      "text_substring_contamination" -> TextAnalysis.substringContaminationOracle,
      "text_repetition" -> TextAnalysis.repetitionRatioOracle,
      "text_pack_sequences" -> TextAnalysis.packSequencesOracle,
      "text_pack_sequences_bpe" -> TextAnalysis.packSequencesBpeOracle,
      "text_packing_sweep" -> TextAnalysis.packingSweepOracle,
      "text_build_spans" -> TextAnalysis.buildSpanStageOracle,
      "text_dup_spans" -> TextAnalysis.dupSpansOracle,
      "text_span_mask" -> TextAnalysis.spanMaskOracle,
      "text_paragraph_dedup" -> TextAnalysis.paragraphDedupOracle,
      "text_novelty" -> TextAnalysis.ngramNoveltyOracle,
      "docs_shuffle_shards" -> TextAnalysis.shuffleShardsOracle(),
      "docs_mixture_budget" -> TextAnalysis.mixtureBudgetOracle,
      "docs_mixture_expand" -> TextAnalysis.mixtureExpandOracle,
      "docs_quality_prune" -> TextAnalysis.qualityPruneOracle(),
      "docs_ccnet_buckets" -> TextAnalysis.unigramSurprisalOracle,
      "docs_bigram_buckets" -> TextAnalysis.bigramSurprisalOracle,
      "docs_lm_order_agreement" -> TextAnalysis.lmOrderAgreementOracle,
      "docs_ccnet_deployed" -> TextAnalysis.ccnetDeployedOracle,
      "docs_bigram_deployed" -> TextAnalysis.bigramDeployedOracle,
      "docs_trigram_buckets" -> TextAnalysis.trigramSurprisalOracle,
      "docs_trigram_deployed" -> TextAnalysis.trigramDeployedOracle,
      "docs_trigram_backoff" -> TextAnalysis.trigramBackoffOracle,
      "docs_lm_order_agreement3" -> TextAnalysis.lmOrderAgreement3Oracle,
      "docs_dsir_importance" -> DataSelection.dsirImportanceOracle,
      "docs_dsir_select" -> DataSelection.dsirSelectOracle,
      "docs_dsir_deployed" -> DataSelection.dsirDeployedOracle,
      "docs_target_affinity" -> TextAnalysis.targetAffinityOracle,
      "docs_train_split" -> TextAnalysis.trainSplitOracle,
      "docs_split_leakage" -> TextAnalysis.splitLeakageOracle,
      "docs_cluster_safe_split" -> TextAnalysis.clusterSafeSplitOracle,
      "docs_gopher_rules" -> TextAnalysis.gopherRulesOracle,
      "docs_filter_agreement" -> TextAnalysis.filterAgreementOracle,
      "docs_curriculum_order" -> TextAnalysis.curriculumOrderOracle(),
      "docs_corpus_report" -> TextAnalysis.corpusReportOracle,
      "docs_rag_chunks" -> TextAnalysis.ragChunksOracle(),
      "docs_bootstrap_ci" -> TextAnalysis.bootstrapCiOracle(),
      "dedup_build_pipeline" -> Dedup.buildPipelineOracle,
      "dedup_exact_groups" -> Dedup.exactDupGroupsOracle,
      "dedup_exact_keep_first" -> Dedup.exactDedupKeepFirstOracle,
      "dedup_minhash_pairs" -> Dedup.minhashCandidatePairsOracle,
      "dedup_simhash" -> Dedup.simhashSignaturesOracle,
      "dedup_simhash64" -> Dedup.simhash64SignaturesOracle,
      "dedup_ngram_jaccard" -> Dedup.ngramJaccardPairsOracle,
      "dedup_prefix_join" -> Dedup.prefixFilterJoinPairsOracle(),
      "dedup_containment_join" -> Dedup.containmentJoinPairsOracle(),
      "dedup_minhash_est" -> Dedup.minhashJaccardEstimateOracle,
      "dedup_fuzzy_names" -> Dedup.fuzzyNamePairsOracle,
      "dedup_graph_triangles" -> Dedup.nearDupTrianglesOracle,
      "profile_percentiles_by_flag" -> ProfileQueries.quantityPercentilesByFlagOracle,
      "dedup_group_signatures" -> Dedup.groupSignaturesOracle,
      "dedup_clusters" -> Dedup.dedupClustersOracle,
      "dedup_clusters_star" -> Dedup.dedupClustersOracle,
      "dedup_reach_recursive" -> Dedup.reachRecursiveOracle,
      "dedup_incremental" -> Dedup.dedupIncrementalOracle,
      "dedup_bloom_prefilter" -> Dedup.bloomPrefilterOracle,
      "docs_takedown_manifest" -> Dedup.takedownManifestOracle,
      "dedup_pagerank_hubs" -> Dedup.pagerankHubsOracle(),
      "dedup_degree_hist" -> Dedup.degreeHistogramOracle,
      "dedup_funnel" -> Dedup.dedupFunnelOracle,
      "dedup_source_overlap" -> Dedup.sourceOverlapOracle,
      "dedup_keep_list" -> Dedup.dedupKeepListOracle,
      "dedup_impact_by_source" -> Dedup.dedupImpactBySourceOracle,
      "dedup_quality_bias" -> Dedup.dedupQualityBiasOracle,
      "dedup_weights" -> Dedup.dedupWeightsOracle,
      "dedup_cdc_chunks" -> Dedup.cdcChunksOracle,
      "dedup_cluster_lang_purity" -> Dedup.clusterLangPurityOracle,
      "dedup_keep_best" -> Dedup.dedupKeepBestOracle,
      "dedup_ensemble" -> Dedup.dedupEnsembleOracle,
      "text_oov_rate" -> TextAnalysis.oovRateOracle(),
      "docs_training_manifest" -> TextAnalysis.trainingManifestOracle,
      "docs_manifest_rollup" -> TextAnalysis.manifestRollupOracle,
      "docs_shard_write" -> TextAnalysis.shardWriteOracle(),
      "docs_shard_manifest" -> TextAnalysis.shardManifestOracle(),
      "docs_shard_balance" -> TextAnalysis.shardBalanceOracle(),
      "docs_shard_rebalance" -> TextAnalysis.shardRebalanceOracle(),
      "docs_release_report" -> TextAnalysis.releaseReportOracle,
      "pipeline_release_e2e" -> TextAnalysis.pipelineReleaseE2eOracle(),
      "pipeline_release_diff_e2e" -> TextAnalysis.pipelineReleaseDiffE2eOracle(),
      "docs_release_diff" -> TextAnalysis.releaseDiffOracle,
      "docs_keep_ablation" -> TextAnalysis.keepAblationOracle,
      "dedup_threshold_sweep" -> Dedup.thresholdSweepOracle,
      "dedup_audit_sample" -> Dedup.auditSampleOracle,
      "ann_cosine_topk" -> Similarity.cosineTopKOracle(),
      "ann_hybrid_rrf" -> Similarity.hybridRrfOracle(),
      "ann_hybrid_rrf_ivf" -> Similarity.hybridRrfIvfOracle(),
      "ann_signlsh_topk" -> Similarity.SignLsh.topKOracle(),
      "ann_ivf_topk" -> Similarity.ivfTopKOracle(),
      "ann_ivf_refined_topk" -> Similarity.ivfRefinedTopKOracle(),
      "ann_pq_topk" -> Similarity.pqTopKOracle(),
      "ann_ivfpq_topk" -> Similarity.ivfPqTopKOracle(),
      "ann_sq8_topk" -> Similarity.sq8TopKOracle(),
      "ann_ivf_incremental" -> Similarity.ivfIncrementalOracle(),
      "embedding_corr_dims" -> Similarity.dimCorrMatrixOracle,
      "embedding_top_pc" -> Similarity.topPrincipalComponentOracle(),
      "embedding_hard_negatives" -> Similarity.hardNegativesOracle(),
      "semdedup" -> Similarity.semDedupOracle(),
      "embedding_near_dups" -> Similarity.embeddingNearDupsOracle(),
      "embedding_exact_dups" -> Similarity.exactVectorDupsOracle,
      "embedding_centroids" -> Similarity.labelCentroidsOracle,
      "embedding_label_outliers" -> Similarity.labelOutliersOracle(),
      "embedding_centroid_confusion" -> Similarity.centroidConfusionOracle,
      "embedding_quantize_int8" -> Similarity.quantizeInt8Oracle,
      "events_json_profile" -> EventOps.jsonProfileOracle,
      "events_json_schema" -> EventOps.jsonSchemaProfileOracle,
      "events_hourly" -> EventOps.hourlyRollupOracle,
      "events_sliding" -> EventOps.slidingRollupOracle,
      "events_gapfill" -> EventOps.hourlyGapFillOracle,
      "events_deletion_impact" -> EventOps.deletionImpactOracle,
      "events_funnel" -> EventOps.signupFunnelOracle,
      "events_funnel_bounded" -> EventOps.signupFunnelBoundedOracle(),
      "events_funnel_cohorts" -> EventOps.funnelCohortsOracle,
      "events_ab_srm" -> EventOps.abSrmOracle,
      "events_power_mde" -> EventOps.powerMdeOracle,
      "events_cuped" -> EventOps.cupedOracle,
      "events_experiment_lift" -> EventOps.experimentLiftOracle,
      "events_cohorts" -> EventOps.cohortRetentionOracle,
      "events_scd2" -> EventOps.scd2Oracle,
      "events_pit_join" -> EventOps.pitJoinOracle,
      "events_hourly_anomalies" -> EventOps.hourlyAnomaliesOracle,
      "q_arg_max" -> RelationalExt.nationArgMaxCustomersOracle,
      "events_dow_heatmap" -> EventOps.weekdayHourHeatmapOracle,
      "q_null_handling" -> RelationalExt.nullHandlingOracle,
      "q_math_funcs" -> RelationalExt.mathFuncsOracle,
      "q_string_agg" -> RelationalExt.nationListPerRegionOracle,
      "multimodal_manifest" -> Multimodal.mediaManifestOracle,
      "multimodal_resize" -> Multimodal.resizePlanOracle,
      "multimodal_frames" -> Multimodal.frameSamplesOracle,
      "multimodal_tiles" -> Multimodal.tilePlanOracle(),
      "multimodal_audio_profile" -> Multimodal.audioProfileOracle,
      "multimodal_audio_vad" -> Multimodal.audioVadOracle,
      "multimodal_image_histogram" -> Multimodal.imageHistogramProfileOracle,
      "multimodal_shot_cuts" -> Multimodal.shotCutProfileOracle,
      "multimodal_image_dhash" -> Multimodal.imageDHashProfileOracle,
      "dedup_image_groups" -> Multimodal.imageDupGroupsOracle,
      "quality_checks" -> graft.quality.QualitySuite.oracle,
      "quality_classifier_train" -> QualityClassifier.classifierTrainOracle,
      "quality_classifier_confusion" -> QualityClassifier.classifierConfusionOracle,
      "quality_classifier_drift" -> QualityClassifier.classifierDriftOracle(),
      "docs_classifier_auc" -> QualityClassifier.classifierAucOracle,
      "docs_classifier_auc_heldout" -> QualityClassifier.classifierAucHeldoutOracle,
      "docs_classifier_auc_binned" -> QualityClassifier.classifierAucBinnedOracle,
      "docs_classifier_calibration" -> QualityClassifier.classifierCalibrationOracle)
  }
}

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
      "profile_summary_lineitem" -> ((s, d) => ProfileQueries.fullProfile(s, d, "lineitem")),
      "profile_summary_orders" -> ((s, d) => ProfileQueries.fullProfile(s, d, "orders")),
      "profile_summary_documents" -> ((s, d) => ProfileQueries.fullProfile(s, d, "documents")),
      "profile_summary_events" -> ((s, d) => ProfileQueries.fullProfile(s, d, "events")),
      "profile_histogram_quantity" -> (ProfileQueries.quantityHistogram(_, _)),
      "profile_histogram_depth" -> (ProfileQueries.quantityDepthHistogram(_, _)),
      "profile_corr_lineitem" -> (ProfileQueries.quantityPriceCorr(_, _)),
      "q_snapshot_diff" -> (RelationalExt.snapshotDiff(_, _)),
      "profile_percentiles_quantity" -> (ProfileQueries.quantityPercentiles(_, _)),
      // relational coverage (SURVEY §2.2-§2.5)
      "q1_pricing_summary" -> (Relational.q1PricingSummary(_, _)),
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
      "q_window_battery" -> (RelationalExt.orderWindowBattery(_, _)),
      "q_window_battery2" -> (RelationalExt.orderWindowBattery2(_, _)),
      "q_regex_funcs" -> (RelationalExt.partRegexFuncs(_, _)),
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
      "text_tfidf" -> (TextAnalysis.tfidf(_, _)),
      // text analysis (BASELINE.json LLM-pipeline operators)
      "text_token_counts" -> (TextAnalysis.tokenCounts(_, _)),
      "text_quality" -> (TextAnalysis.qualityScores(_, _)),
      "text_langid" -> (TextAnalysis.languageId(_, _)),
      "text_fingerprints" -> (TextAnalysis.fingerprints(_, _)),
      "text_doc_freq" -> (TextAnalysis.docFrequency(_, _)),
      "text_clean_pipeline" -> (TextAnalysis.cleanPipeline(_, _)),
      "text_pii_mask" -> (TextAnalysis.piiMask(_, _)),
      "docs_stratified_sample" -> (TextAnalysis.stratifiedSample(_, _)),
      // dedup family
      "dedup_exact_groups" -> (Dedup.exactDupGroups(_, _)),
      "dedup_exact_keep_first" -> (Dedup.exactDedupKeepFirst(_, _)),
      "dedup_minhash_pairs" -> (Dedup.minhashCandidatePairs(_, _)),
      "dedup_simhash" -> (Dedup.simhashSignatures(_, _)),
      "dedup_simhash64" -> (Dedup.simhash64Signatures(_, _)),
      "dedup_simhash_pairs" -> (Dedup.simhashHammingPairs(_, _)),
      "dedup_simhash64_pairs" -> (Dedup.simhash64HammingPairs(_, _)),
      "dedup_ngram_jaccard" -> (Dedup.ngramJaccardPairs(_, _)),
      "dedup_fuzzy_names" -> (Dedup.fuzzyNamePairs(_, _)),
      "dedup_graph_triangles" -> (Dedup.nearDupTriangles(_, _)),
      "profile_percentiles_by_flag" -> (ProfileQueries.quantityPercentilesByFlag(_, _)),
      "dedup_group_signatures" -> (Dedup.groupSignatures(_, _)),
      "dedup_clusters" -> (Dedup.dedupClusters(_, _)),
      "dedup_clusters_star" -> (Dedup.dedupClustersStar(_, _)),
      // similarity search
      "ann_cosine_topk" -> (Similarity.cosineTopK(_, _)),
      "ann_signlsh_topk" -> (Similarity.SignLsh.topK(_, _)),
      "ann_ivf_topk" -> (Similarity.ivfTopK(_, _)),
      "embedding_near_dups" -> (Similarity.embeddingNearDups(_, _)),
      "embedding_centroids" -> (Similarity.labelCentroids(_, _)),
      "embedding_quantize_int8" -> (Similarity.quantizeInt8(_, _)),
      // events / JSON / windows / sessions
      "events_json_profile" -> (EventOps.jsonProfile(_, _)),
      "events_hourly" -> (EventOps.hourlyRollup(_, _)),
      "events_sliding" -> (EventOps.slidingRollup(_, _)),
      "events_gapfill" -> (EventOps.hourlyGapFill(_, _)),
      "events_funnel" -> (EventOps.signupFunnel(_, _)),
      "events_cohorts" -> (EventOps.cohortRetention(_, _)),
      "events_scd2" -> (EventOps.scd2(_, _)),
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
      // multimodal manifest / resize plan / frame sampling
      "multimodal_manifest" -> (Multimodal.mediaManifest(_, _)),
      "multimodal_resize" -> (Multimodal.resizePlan(_, _)),
      "multimodal_frames" -> (Multimodal.frameSamples(_, _)),
      // data-quality validation rules (the north-star surface)
      "quality_checks" -> (graft.quality.QualitySuite.run(_, _)))
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
      "profile_summary_lineitem" -> ProfileQueries.fullProfileOracle("lineitem"),
      "profile_summary_orders" -> ProfileQueries.fullProfileOracle("orders"),
      "profile_summary_documents" -> ProfileQueries.fullProfileOracle("documents"),
      "profile_summary_events" -> ProfileQueries.fullProfileOracle("events"),
      "profile_histogram_quantity" -> ProfileQueries.quantityHistogramOracle,
      "profile_histogram_depth" -> ProfileQueries.quantityDepthHistogramOracle,
      "profile_corr_lineitem" -> ProfileQueries.quantityPriceCorrOracle,
      "q_snapshot_diff" -> RelationalExt.snapshotDiffOracle,
      "q_salted_skew_join" -> Relational.saltedSupplierRevenueOracle,
      "q_rollup_pricing" -> Relational.pricingRollupOracle,
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
      "q_window_battery" -> RelationalExt.orderWindowBatteryOracle,
      "q_window_battery2" -> RelationalExt.orderWindowBattery2Oracle,
      "q_regex_funcs" -> RelationalExt.partRegexFuncsOracle,
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
      "profile_percentiles_quantity" -> ProfileQueries.quantityPercentilesOracle,
      "q1_pricing_summary" -> Relational.q1Oracle,
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
      "text_langid" -> TextAnalysis.languageIdOracle,
      "text_fingerprints" -> TextAnalysis.fingerprintsOracle,
      "text_doc_freq" -> TextAnalysis.docFrequencyOracle,
      "text_clean_pipeline" -> TextAnalysis.cleanPipelineOracle,
      "text_pii_mask" -> TextAnalysis.piiMaskOracle,
      "docs_stratified_sample" -> TextAnalysis.stratifiedSampleOracle,
      "dedup_exact_groups" -> Dedup.exactDupGroupsOracle,
      "dedup_exact_keep_first" -> Dedup.exactDedupKeepFirstOracle,
      "dedup_minhash_pairs" -> Dedup.minhashCandidatePairsOracle,
      "dedup_simhash" -> Dedup.simhashSignaturesOracle,
      "dedup_simhash64" -> Dedup.simhash64SignaturesOracle,
      "dedup_ngram_jaccard" -> Dedup.ngramJaccardPairsOracle,
      "dedup_fuzzy_names" -> Dedup.fuzzyNamePairsOracle,
      "dedup_graph_triangles" -> Dedup.nearDupTrianglesOracle,
      "profile_percentiles_by_flag" -> ProfileQueries.quantityPercentilesByFlagOracle,
      "dedup_group_signatures" -> Dedup.groupSignaturesOracle,
      "dedup_clusters" -> Dedup.dedupClustersOracle,
      "dedup_clusters_star" -> Dedup.dedupClustersOracle,
      "ann_cosine_topk" -> Similarity.cosineTopKOracle(),
      "ann_signlsh_topk" -> Similarity.SignLsh.topKOracle(),
      "ann_ivf_topk" -> Similarity.ivfTopKOracle(),
      "embedding_near_dups" -> Similarity.embeddingNearDupsOracle(),
      "embedding_centroids" -> Similarity.labelCentroidsOracle,
      "embedding_quantize_int8" -> Similarity.quantizeInt8Oracle,
      "events_json_profile" -> EventOps.jsonProfileOracle,
      "events_hourly" -> EventOps.hourlyRollupOracle,
      "events_sliding" -> EventOps.slidingRollupOracle,
      "events_gapfill" -> EventOps.hourlyGapFillOracle,
      "events_funnel" -> EventOps.signupFunnelOracle,
      "events_cohorts" -> EventOps.cohortRetentionOracle,
      "events_scd2" -> EventOps.scd2Oracle,
      "events_dow_heatmap" -> EventOps.weekdayHourHeatmapOracle,
      "q_null_handling" -> RelationalExt.nullHandlingOracle,
      "q_math_funcs" -> RelationalExt.mathFuncsOracle,
      "q_string_agg" -> RelationalExt.nationListPerRegionOracle,
      "multimodal_manifest" -> Multimodal.mediaManifestOracle,
      "multimodal_resize" -> Multimodal.resizePlanOracle,
      "multimodal_frames" -> Multimodal.frameSamplesOracle,
      "quality_checks" -> graft.quality.QualitySuite.oracle)
  }
}

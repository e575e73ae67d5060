package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry returns a DataFrame whose column NAMES and VALUES match
  * its `oracleSql` (DuckDB) twin exactly. Determinism rules applied
  * throughout (SURVEY.md §7.3): money as BIGINT cents (one IEEE
  * multiply + floor per row — double→decimal casts round differently
  * per engine), integer basis-point ratios (one IEEE divide + floor),
  * string-formatted timestamps, sorted distinct-concats, id
  * tie-breaks on every rank.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.sessionAggr(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.pricingSummary _),
    "q02_sessionize" -> (Queries.sessionAggr _),
    "q03_session_stats" -> (Queries.sessionStats _),
    "q04_session_filter" -> (Queries.sessionFilter _),
    "q05_top_categories" -> (Queries.topCategories _),
    "q06_top_sessions_per_category" -> (Queries.topSessionsPerCategory _),
    "q07_page_funnel" -> (Queries.pageFunnel _),
    "q08_area_top3_products" -> (Queries.areaTop3Products _),
    "q09_order_priority_semi" -> (Queries.orderPrioritySemi _),
    "q10_customer_anti" -> (Queries.customerAnti _),
    "q11_period_delta" -> (Queries.periodDelta _),
    "q12_stratified_sample" -> (Queries.stratifiedSample _),
    "q13_ad_blacklist" -> (Queries.adBlacklist _),
    "q14_ad_stats" -> (Queries.adStats _),
    "q15_province_top3_ads" -> (Queries.provinceTop3Ads _),
    "q16_click_trend" -> (Queries.clickTrend _),
    "q17_token_stats" -> (Queries.tokenStats _),
    "q18_text_quality" -> (Queries.textQuality _),
    "q19_lang_id" -> (Queries.langId _),
    "q20_doc_fingerprint" -> (Queries.docFingerprint _),
    "q21_exact_dedup" -> (Queries.exactDedup _),
    "q22_minhash_dedup_pairs" -> (Queries.minhashDedupPairs _),
    "q23_ngram_dedup_kept" -> (Queries.ngramDedupKept _),
    "q24_simhash" -> (Queries.simhash _),
    "q25_knn_bruteforce" -> (Queries.knnBruteforce _),
    "q26_ann_lsh" -> (Queries.annLsh _),
    "q27_embedding_neardup" -> (Queries.embeddingNearDup _),
    "q28_media_metadata" -> (Queries.mediaMetadata _),
    "q29_frame_sample" -> (Queries.frameSample _),
    "q30_media_features" -> (Queries.mediaFeatures _),
    "q31_simhash_pairs" -> (Queries.simhashPairs _),
    "q32_ivf_ann" -> (Queries.ivfAnn _),
    "q33_bpe_tokens" -> (Queries.bpeTokens _),
    "q34_winnow_fingerprints" -> (Queries.winnowFingerprints _),
    "q35_median_quantity" -> (Queries.medianQuantity _),
    "q36_rollup_totals" -> (Queries.rollupTotals _),
    // sketch estimates are engine-specific, so these emit the EXACT
    // twin + a sketch-within-bound verdict (Percentiles
    // .approxDistinctChecked/approxMedianChecked) — fully
    // hash-checkable: a drifting sketch flips sketch_ok and the row
    // mismatches. ApproxSpec still pins the raw sketch ops directly.
    "q37_approx_distinct" -> (Queries.approxDistinct _),
    "q38_approx_median" -> (Queries.approxMedian _),
    "q39_user_activity" -> (Queries.userActivity _),
    "q40_user_visit_action" -> (Queries.userVisitAction _),
    "q41_category_action_counts" -> (Queries.categoryActionCounts _),
    "q42_neardup_clusters" -> (Queries.nearDupClusters _),
    "q43_asof_last_purchase" -> (Queries.asofLastPurchase _),
    "q44_asof_recent_purchase" -> (Queries.asofRecentPurchase _),
    "q45_line_dedup" -> (Queries.lineDedup _),
    "q46_pii_scrub" -> (Queries.piiScrub _),
    "q47_corpus_select" -> (Queries.corpusSelect _),
    "q48_vocab_top" -> (Queries.vocabTop _),
    "q49_repetition_metrics" -> (Queries.repetitionMetrics _),
    "q50_incremental_dedup" -> (Queries.incrementalDedup _),
    "q51_purchases_window" -> (Queries.purchasesWindow _),
    "q52_kmeans" -> (Queries.kmeans _),
    "q53_semdedup_kept" -> (Queries.semDedup _),
    "q54_heavy_hitters" -> (Queries.heavyHitters _),
    "q55_decontaminate" -> (Queries.decontaminate _),
    "q56_pack_sequences" -> (Queries.packSequences _),
    "q57_context_chunks" -> (Queries.contextChunks _),
    "q58_epoch_mix" -> (Queries.epochMix _),
    "q59_quantize_int8" -> (Queries.quantizeInt8 _),
    "q60_distinctive_terms" -> (Queries.distinctiveTerms _),
    "q61_pq_ann" -> (Queries.pqAnn _),
    "q62_ivf_pq" -> (Queries.ivfPq _),
    "q63_corpus_split" -> (Queries.corpusSplit _),
    "q64_training_manifest" -> (Queries.trainingManifest _),
    "q65_substring_dup" -> (Queries.substringDup _),
    "q66_bm25" -> (Queries.bm25 _),
    "q67_cube_totals" -> (Queries.cubeTotals _),
    "q68_curriculum_buckets" -> (Queries.curriculumBuckets _),
    "q69_quality_classifier" -> (Queries.qualityClassifier _),
    "q70_bpe_merges" -> (Queries.bpeMerges _),
    "q71_mixture_plan" -> (Queries.mixturePlan _),
    "q72_hard_negatives" -> (Queries.hardNegatives _),
    "q73_profile" -> (Queries.profileDocs _),
    "q74_bpe_segment" -> (Queries.bpeSegment _),
    "q75_retention" -> (Queries.retention _),
    "q76_active_users" -> (Queries.activeUsers _),
    "q77_p95_quantity" -> (Queries.p95Quantity _),
    "q78_substring_scrub" -> (Queries.substringScrub _),
    "q79_eval_sample" -> (Queries.evalSample _),
    "q80_source_cap" -> (Queries.sourceCap _),
    "q81_source_cap_rate" -> (Queries.sourceCapRate _),
    "q82_canonical_by_source" -> (Queries.canonicalBySource _),
    "q83_strip_markup" -> (Queries.stripMarkup _),
    "q84_snapshot_diff" -> (Queries.snapshotDiff _),
    "q85_oov_rate" -> (Queries.oovRate _),
    "q86_cooccur_top" -> (Queries.cooccurTop _),
    "q87_label_outliers" -> (Queries.labelOutliers _),
    "q88_volume_anomaly" -> (Queries.volumeAnomaly _),
    "q89_source_concentration" -> (Queries.sourceConcentration _),
    "q90_covisitation" -> (Queries.coVisitation _),
    "q91_transitions" -> (Queries.transitions _),
    "q92_source_overlap" -> (Queries.sourceOverlap _),
    "q93_pagerank" -> (Queries.pageRank _),
    "q94_rfm" -> (Queries.rfm _),
    "q95_ordered_funnel" -> (Queries.orderedFunnel _),
    "q96_containment" -> (Queries.containment _),
    "q97_source_diversity" -> (Queries.sourceDiversity _),
    "q98_pps_sample" -> (Queries.ppsSample _),
    "q99_next_item_pairs" -> (Queries.nextItemPairs _),
    "q100_ann_recall" -> (Queries.annRecall _),
    "q101_fuzzy_decontaminate" -> (Queries.fuzzyDecontaminate _),
    "q102_dedup_impact" -> (Queries.dedupImpact _),
    "q103_pii_prevalence" -> (Queries.piiPrevalence _),
    "q104_lang_temperature" -> (Queries.languageMix _),
    "q105_incremental_savings" -> (Queries.incrementalSavings _),
    "q106_split_leakage" -> (Queries.splitLeakage _),
    "q107_shard_shuffle" -> (Queries.shardShuffle _),
    "q108_tokenizer_fertility" -> (Queries.tokenizerFertility _),
    "q109_value_drift" -> (Queries.valueDrift _),
    "q110_length_histogram" -> (Queries.lengthHistogram _),
    "q111_rerank_topk" -> (Queries.rerankTopK _),
    "q112_bot_sessions" -> (Queries.botSessions _),
    "q113_dwell_time" -> (Queries.dwellTime _),
    "q114_dsir_score" -> (Queries.dsirScore _),
    "q115_budget_select" -> (Queries.budgetSelect _),
    "q116_windowed_funnel" -> (Queries.windowedFunnel _),
    "q117_eval_contamination" -> (Queries.evalContamination _),
    "q118_shard_mixing" -> (Queries.shardMixing _),
    "q119_threshold_sweep" -> (Queries.thresholdSweep _),
    "q120_signal_agreement" -> (Queries.signalAgreement _),
    "q121_ivf_balance" -> (Queries.ivfBalance _),
    "q122_script_mix" -> (Queries.scriptMix _),
    "q123_boilerplate_lines" -> (Queries.boilerplateLines _),
    "q124_attribution" -> (Queries.attribution _),
    "q125_doc_novelty" -> (Queries.docNovelty _),
    "q126_surprisal" -> (Queries.surprisal _),
    "q127_session_paths" -> (Queries.sessionPaths _),
    "q128_erasure_audit" -> (Queries.erasureAudit _),
    "q129_cluster_sizes" -> (Queries.clusterSizeHistogram _),
    "q130_compaction_plan" -> (Queries.compactionPlan _),
    "q131_recency_sample" -> (Queries.recencySample _),
    "q132_contributor_cap" -> (Queries.contributorCap _),
    "q133_preference_pairs" -> (Queries.preferencePairs _),
    "q134_ltv_curve" -> (Queries.ltvCurve _),
    "q135_boilerplate_scrub" -> (Queries.boilerplateScrub _),
    "q136_local_supplier_revenue" -> (Queries.localSupplierRevenue _),
    "q137_key_skew" -> (Queries.keySkew _),
    "q138_props_schema" -> (Queries.propsSchema _),
    "q139_quantile_table" -> (Queries.quantileTable _),
    "q140_embedding_health" -> (Queries.embeddingHealth _),
    "q141_modality_coverage" -> (Queries.modalityCoverage _),
    "q142_daily_pivot" -> (Queries.dailyActivityPivot _),
    "q143_centroid_drift" -> (Queries.centroidDrift _),
    "q144_return_times" -> (Queries.returnTimes _),
    "q145_hourly_profile" -> (Queries.hourlyProfile _),
    "q146_verdict_fusion" -> (Queries.verdictFusion _),
    "q147_srm_check" -> (Queries.srmCheck _),
    "q148_ab_lift" -> (Queries.abLift _),
    "q149_packing_efficiency" -> (Queries.packingEfficiency _),
    "q150_props_schema_approx" -> (Queries.propsSchemaApprox _),
    "q151_cuped_lift" -> (Queries.cupedLift _),
    "q152_winsorized_lift" -> (Queries.winsorizedLift _),
    "q153_ref_integrity" -> (Queries.refIntegrity _),
    "q154_time_to_convert" -> (Queries.timeToConvert _),
    "q155_join_fanout" -> (Queries.joinFanout _),
    "q156_profile_drift" -> (Queries.profileDrift _),
    "q157_triangles" -> (Queries.triangleStats _),
    "q158_ann_mrr" -> (Queries.annMrr _),
    "q159_decayed_popularity" -> (Queries.decayedPopularity _),
    "q160_key_balance" -> (Queries.keyBalance _),
    "q161_shipping_priority" -> (Queries.shippingPriority _),
    "q162_entry_exit" -> (Queries.entryExit _),
    "q163_order_reconciliation" -> (Queries.orderReconciliation _),
    "q164_association_rules" -> (Queries.associationRules _),
    "q165_length_quantiles" -> (Queries.lengthQuantiles _),
    "q166_classifier_calibration" -> (Queries.classifierCalibration _),
    "q167_key_churn" -> (Queries.keyChurn _),
    "q168_funnel_by_arm" -> (Queries.funnelByArm _),
    "q169_sequential_rules" -> (Queries.sequentialRules _),
    "q170_returned_revenue" -> (Queries.returnedRevenue _),
    "q171_part_concentration" -> (Queries.partConcentration _),
    "q172_promo_revenue" -> (Queries.promoRevenue _),
    "q173_market_share" -> (Queries.marketShare _),
    "q174_bracket_revenue" -> (Queries.bracketRevenue _),
    "q175_idle_customers" -> (Queries.idleCustomers _),
    "q176_engagement_gini" -> (Queries.engagementGini _),
    "q177_next_item_backtest" -> (Queries.nextItemBacktest _),
    "q178_dedup_threshold_curve" -> (Queries.dedupThresholdCurve _),
    "q179_top_supplier" -> (Queries.topSupplier _),
    "q180_small_qty_revenue" -> (Queries.smallQuantityRevenue _),
    "q181_large_orders" -> (Queries.largeOrders _),
    "q182_cluster_quality" -> (Queries.clusterQualityProfile _),
    "q183_revenue_seasonality" -> (Queries.revenueSeasonality _),
    "q184_order_gap_quantiles" -> (Queries.orderGapQuantiles _),
    "q185_pareto_coverage" -> (Queries.paretoCoverage _),
    "q186_yoy_growth" -> (Queries.yoyMonthlyGrowth _),
    "q187_priority_mix" -> (Queries.priorityMixShift _),
    "q188_nation_movers" -> (Queries.nationRankMovers _),
    "q189_discount_bands" -> (Queries.discountBands _),
    "q190_late_priority" -> (Queries.latePriorityCounts _),
    "q191_revenue_forecast" -> (Queries.revenueForecast _),
    "q192_nation_volume" -> (Queries.nationVolume _),
    "q193_priority_line_counts" -> (Queries.priorityLineCounts _),
    "q194_customer_order_dist" -> (Queries.customerOrderDistribution _),
    "q195_waiting_suppliers" -> (Queries.waitingSuppliers _),
    "q196_bfs_reach" -> (Queries.bfsReach _),
    "q197_seasonal_deviation" -> (Queries.seasonalDeviation _),
    "q198_source_datacard" -> (Queries.sourceDatacard _),
    "q199_anomaly_sessions" -> (Queries.anomalySessions _),
    "q200_zorder_cells" -> (Queries.zorderLayout _),
    "q201_covis_components" -> (Queries.coVisComponents _),
    "q202_triple_itemsets" -> (Queries.tripleItemsets _),
    "q203_equidepth_bins" -> (Queries.equiDepthHistogram _),
    "q204_neyman_allocation" -> (Queries.neymanAllocation _),
    "q205_churn_features" -> (Queries.churnFeatures _),
    "q206_gains_table" -> (Queries.gainsTable _),
    "q207_theilsen_trend" -> (Queries.theilSenTrend _),
    "q208_robust_anomaly" -> (Queries.robustVolumeAnomaly _),
    "q209_fulfillment_latency" -> (Queries.fulfillmentLatency _),
    "q210_growth_accounting" -> (Queries.growthAccounting _),
    "q211_revenue_acf" -> (Queries.revenueAcf _),
    "q212_cusum_revenue" -> (Queries.cusumRevenue _),
    "q213_benford_audit" -> (Queries.benfordAudit _),
    "q214_k_anonymity" -> (Queries.kAnonymity _),
    "q215_l_diversity" -> (Queries.lDiversity _),
    "q216_seasonal_backtest" -> (Queries.seasonalBacktest _),
    "q217_discount_elasticity" -> (Queries.discountElasticity _),
    "q218_dow_type_lift" -> (Queries.dowTypeLift _),
    "q219_kendall_daily" -> (Queries.kendallDaily _),
    "q220_lifecycle_census" -> (Queries.lifecycleCensus _),
    "q221_skipgram_pairs" -> (Queries.skipGramPairs _),
    "q222_replenishment_cycle" -> (Queries.replenishmentCycle _),
    "q223_recsys_coverage" -> (Queries.recsysCoverage _),
    "q224_growth_decomposition" -> (Queries.growthDecomposition _),
    "q225_order_composition" -> (Queries.orderComposition _),
    "q226_pagerank_weighted" -> (Queries.pageRankWeighted _),
    "q227_personalized_pagerank" -> (Queries.personalizedPageRank _),
    "q228_degree_assortativity" -> (Queries.degreeAssortativity _),
    "q229_bm25_known_item" -> (Queries.bm25KnownItem _),
    "q230_token_spectrum" -> (Queries.tokenSpectrum _),
    "q231_absorption_prob" -> (Queries.absorptionProbability _),
    "q232_conversion_hazard" -> (Queries.conversionHazard _),
    "q233_audience_overlap" -> (Queries.audienceOverlap _),
    "q234_minhash_calibration" -> (Queries.minhashCalibration _),
    "q235_min_cost_supplier" -> (Queries.minCostSupplier _),
    "q236_product_profit" -> (Queries.productProfit _),
    "q237_important_parts" -> (Queries.importantParts _),
    "q238_part_supplier_counts" -> (Queries.partSupplierCounts _),
    "q239_excess_suppliers" -> (Queries.excessSuppliers _),
    "q240_pruning_audit" -> (Queries.pruningAudit _),
    "q241_lsh_planner" -> (Queries.lshPlanner _),
    "q242_pq_distortion" -> (Queries.pqDistortion _),
    "q243_ivf_probe_curve" -> (Queries.ivfProbeCurve _),
    "q244_order_backlog" -> (Queries.orderBacklog _),
    "q245_doc_keywords" -> (Queries.docKeywords _),
    "q246_clustering_coeff" -> (Queries.clusteringCoefficient _),
    "q247_t_closeness" -> (Queries.tCloseness _),
    "q248_grouping_sets" -> (Queries.groupingSetsTotals _),
    "q249_vocab_growth" -> (Queries.vocabGrowth _),
    "q250_revenue_bridge" -> (Queries.revenueBridge _),
    "q251_duplicate_orders" -> (Queries.duplicateOrders _),
    "q252_price_dispersion" -> (Queries.priceDispersion _),
    "q253_linenumber_audit" -> (Queries.linenumberAudit _),
    "q254_zero_sales_days" -> (Queries.zeroSalesDays _),
    "q255_cross_source_dups" -> (Queries.crossSourceDups _),
    "q256_weighted_price_quantiles" -> (Queries.weightedPriceQuantiles _),
    "q257_trailing_revenue" -> (Queries.trailingRevenue _),
    "q258_active_users_sketch" -> (Queries.activeUsersChecked _),
    "q259_datacard_sketch" -> (Queries.sourceDatacardChecked _),
    "q260_mann_whitney" -> (Queries.mannWhitney _),
    "q261_trailing_median" -> (Queries.trailingMedianRevenue _),
    "q262_zipf_decay" -> (Queries.zipfDecay _),
    "q263_link_prediction" -> (Queries.linkPrediction _),
    "q264_event_burst_dedup" -> (Queries.eventBurstDedup _),
    "q265_layout_compare" -> (Queries.layoutCompare _),
    "q266_bm25_ndcg" -> (Queries.bm25Ndcg _),
    "q267_markov_eval" -> (Queries.markovEval _),
    "q268_revenue_pareto" -> (Queries.revenuePareto _),
    "q269_engagement_auc" -> (Queries.engagementAuc _),
    "q270_quarterly_pivot" -> (Queries.quarterlyPivot _),
    "q271_quarterly_unpivot" -> (Queries.quarterlyLong _),
    "q272_ewma_revenue" -> (Queries.ewmaRevenue _),
    "q273_signal_kappa" -> (Queries.signalKappa _),
    "q274_chi_square_lift" -> (Queries.chiSquareLift _),
    "q275_quantile_normalize" -> (Queries.quantileNormalize _),
    "q276_rrf_fusion" -> (Queries.rrfFusion _),
    "q277_kcore" -> (Queries.kcore _),
    "q278_burstiness" -> (Queries.burstiness _),
    "q279_bloom_pruning" -> (Queries.bloomPruningAudit _),
    "q280_covis_backtest" -> (Queries.covisBacktest _),
    "q281_rolling_wau_sketch" -> (Queries.rollingUsersSketch _),
    "q282_diff_in_diff" -> (Queries.diffInDiff _),
    "q283_timeout_sweep" -> (Queries.timeoutSweep _),
    "q284_readability" -> (Queries.readability _),
    "q285_bigram_perplexity" -> (Queries.bigramPerplexity _),
    "q286_anisotropy" -> (Queries.anisotropy _),
    "q287_brown_forecast" -> (Queries.brownForecast _),
    "q288_negative_sampling" -> (Queries.negativeSampling _),
    "q289_bootstrap_ci" -> (Queries.bootstrapCi _),
    "q290_supplier_skyline" -> (Queries.supplierSkyline _),
    "q291_quantile_forecast" -> (Queries.quantileForecast _),
    "q292_markov_attribution" -> (Queries.markovAttribution _),
    "q293_seasonal_brown" -> (Queries.seasonalBrownBacktest _),
    "q294_position_attribution" -> (Queries.positionAttribution _),
    "q295_ks_test" -> (Queries.ksTest _),
    "q296_cms_check" -> (Queries.cmsCheck _),
    "q297_scd2_history" -> (Queries.scd2History _),
    "q298_scd2_revenue" -> (Queries.scd2Revenue _),
    "q299_transition_entropy" -> (Queries.transitionEntropy _),
    "q300_label_prop" -> (Queries.labelProp _),
    "q301_autocorrelation" -> (Queries.autocorrelation _),
    "q302_power_iteration" -> (Queries.powerIteration _),
    "q303_sketch_quantiles" -> (Queries.sketchQuantiles _),
    "q304_path_trigrams" -> (Queries.pathTrigrams _),
    "q305_scd2_census" -> (Queries.scd2Census _),
    "q306_join_cardinality" -> (Queries.joinCardinality _),
    "q307_runs_test" -> (Queries.runsTest _),
    "q308_knn_label_acc" -> (Queries.knnLabelAccuracy _),
    "q309_tier_migration" -> (Queries.spendTierMigration _),
    "q310_price_index" -> (Queries.priceIndex _),
    "q311_variance_decomp" -> (Queries.varianceDecomposition _),
    "q312_bloom_semi" -> (Queries.bloomSemiAudit _),
    "q313_cross_correlation" -> (Queries.crossCorrelation _),
    "q314_shapley_attribution" -> (Queries.shapleyAttribution _),
    "q315_association_screen" -> (Queries.associationScreen _),
    "q316_fuzzy_name_match" -> (Queries.fuzzyNameMatch _),
    "q317_haar_energy" -> (Queries.haarEnergy _),
    "q318_croston_demand" -> (Queries.crostonDemand _),
    "q319_fd_audit" -> (Queries.fdAudit _),
    "q320_revenue_retention" -> (Queries.revenueRetention _),
    "q321_deseasonalized_cusum" -> (Queries.deseasonalizedCusum _),
    "q322_hub_knockout" -> (Queries.hubKnockout _),
    "q323_newsvendor_stock" -> (Queries.newsvendorStock _),
    "q324_join_order_audit" -> (Queries.joinOrderAudit _),
    "q325_latency_sla_trend" -> (Queries.latencySlaTrend _),
    "q326_separability_auc" -> (Queries.separabilityAuc _),
    "q327_post_stratified_lift" -> (Queries.postStratifiedLift _),
    "q328_did_event_study" -> (Queries.didEventStudy _),
    "q329_abc_xyz" -> (Queries.abcXyz _),
    "q330_source_transfer" -> (Queries.sourceTransferMatrix _),
    "q331_silhouette" -> (Queries.silhouette _),
    "q332_props_key_drift" -> (Queries.propsKeyDrift _),
    "q333_revenue_cohort_triangle" -> (Queries.revenueCohortTriangle _),
    "q334_changepoint" -> (Queries.changepoint _),
    "q335_permutation_test" -> (Queries.permutationTest _),
    "q336_mde_power" -> (Queries.mdePower _),
    "q337_ratio_delta" -> (Queries.ratioDelta _),
    "q338_ktruss" -> (Queries.ktruss _),
    "q339_source_value_knn" -> (Queries.sourceValueKnn _),
    "q340_gap_islands" -> (Queries.gapIslands _),
    "q341_hubness" -> (Queries.hubness _),
    "q342_spearman_daily" -> (Queries.spearmanDaily _),
    "q343_wilson_ci" -> (Queries.wilsonCi _),
    "q344_smd_balance" -> (Queries.smdBalance _),
    "q345_gini_trend" -> (Queries.giniTrend _),
    "q346_price_endings" -> (Queries.priceEndings _),
    "q347_entity_rollup" -> (Queries.entityRollup _),
    "q348_channel_retention" -> (Queries.channelRetention _),
    "q349_abc_migration" -> (Queries.abcMigration _),
    "q350_stationary_mix" -> (Queries.stationaryMix _),
    "q351_dsir_ess" -> (Queries.dsirEss _),
    "q352_psi_drift" -> (Queries.psiDrift _),
    "q353_semantic_decontamination" -> (Queries.semanticDecontamination _),
    "q354_james_stein" -> (Queries.jamesSteinMeans _),
    "q355_revenue_drawdown" -> (Queries.revenueDrawdown _),
    "q356_kaplan_meier" -> (Queries.kaplanMeier _),
    "q357_audience_union_sketch" -> (Queries.audienceUnionChecked _),
    "q358_priority_sample" -> (Queries.prioritySample _),
    "q359_good_turing" -> (Queries.goodTuring _),
    "q360_quantile_treatment" -> (Queries.quantileTreatment _),
    "q361_fdr_screen" -> (Queries.fdrScreen _),
    "q362_span_corruption" -> (Queries.spanCorruption _),
    "q363_mann_kendall" -> (Queries.mannKendall _)
  )

  def oracleSql: Map[String, String] = Oracles.sql
}

/** The query implementations (Spark side). Kept separate from the
  * contract object so tests can target them directly. */
object Queries {

  /** A4/A2-style grouped conditional aggregation on lineitem (TPC-H
    * Q1 shape). Decimal casts make the sums bit-exact vs the oracle. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // House money convention (SURVEY.md §7.3): per-row IEEE
        // multiply + floor to integer cents/bp, summed as BIGINT.
        // double→decimal rounding is engine/version-sensitive (Spark
        // rounds the shortest decimal repr, DuckDB the exact binary
        // value); floor(x*100) on the same parquet doubles is
        // bit-identical in any engine.
        sum(floor(col("l_quantity") * lit(100.0))).as("sum_qty_cents"),
        sum(floor(col("l_extendedprice") * lit(100.0))).as("sum_base_price_cents"),
        sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(10000.0))).as("sum_disc_price_bp"),
        count(lit(1)).as("count_order"))

  /** A1: gap-sessionized events → session-grain aggregates. */
  def sessionAggr(spark: SparkSession, dir: String): DataFrame =
    Sessionize(Tables(spark, dir, "events"))

  /** A2: one-row visit/step-length histogram with bp ratios. */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    SessionStats(sessionAggr(spark, dir))

  /** P2 + J2: optional-predicate filter over sessions ⋈ user dim. */
  val filterParams: SessionFilter.Params = SessionFilter.Params(
    minAcctbal = Some(0.0),
    segments = Some(Seq("BUILDING", "AUTOMOBILE", "MACHINERY")),
    eventTypes = Some(Seq("purchase", "signup")))

  def sessionFilter(spark: SparkSession, dir: String): DataFrame =
    SessionFilter(sessionAggr(spark, dir), Tables(spark, dir, "customer"), filterParams)
      .select(
        col("session_id"), col("user_id"), col("c_mktsegment"),
        col("step_length"), col("visit_length_s"), col("event_types"))

  /** W3 + A4: top-10 categories by (click, purchase, view) counts. */
  def topCategories(spark: SparkSession, dir: String): DataFrame =
    TopK.topCategories(Tables(spark, dir, "events"))

  /** A9 + J6 + W4: top sessions per top category. */
  def topSessionsPerCategory(spark: SparkSession, dir: String): DataFrame =
    TopK.topSessionsPerCategory(
      Sessionize.assignSessions(Tables(spark, dir, "events")))

  val funnelFlow: Seq[String] = Seq("view", "click", "purchase")

  /** W5: page single-jump conversion funnel. */
  def pageFunnel(spark: SparkSession, dir: String): DataFrame =
    PageFunnel(spark,
      Sessionize.assignSessions(Tables(spark, dir, "events")), funnelFlow)

  /** W1 + A6/A7 + J7/J8 + F5: area top-3 hot products. */
  def areaTop3Products(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts(
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region"), Tables(spark, dir, "part"))

  /** J6: orders with a 1996 shipment, counted per priority. */
  def orderPrioritySemi(spark: SparkSession, dir: String): DataFrame = {
    val shipped96 = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey").as("o_orderkey"))
    Joins.semi(Tables(spark, dir, "orders"), shipped96, Seq("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** J9 (batch shape): customers with no URGENT order, per segment. */
  def customerAnti(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    Joins.anti(Tables(spark, dir, "customer"), urgent, Seq("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("customer_count"))
  }

  /** U1: first-half vs second-half January purchase delta per user. */
  def periodDelta(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase")
    val mid = lit("2024-01-16").cast("timestamp")
    PeriodDelta(purchases, "user_id", "value",
      col("ts") < mid, col("ts") >= mid)
  }

  /** R1: deterministic time-proportional stratified extraction.
    * Target 1000 = the reference README's figure (§六.3); the code's
    * 100 yields all-zero hour quotas on a 30-day x 24-hour grid. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    StratifiedExtract(sessionAggr(spark, dir), target = StratifiedTarget)

  private def adClicks(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.eventsAsAdClicks(
      Tables(spark, dir, "events"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"))

  /** T4: dynamic blacklist — users with >=2 clicks on one ad in a day. */
  def adBlacklist(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.blacklist(adClicks(spark, dir), threshold = BlacklistThreshold)

  /** T5: click totals per (day, province, city, ad). */
  def adStats(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.adStats(adClicks(spark, dir))

  /** T6/W2: per (day, province) top-3 ads — reference intent (<=3). */
  def provinceTop3Ads(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.provinceTopAds(adClicks(spark, dir))

  /** T7: per-minute counts over the trailing hour of the data. */
  def clickTrend(spark: SparkSession, dir: String): DataFrame =
    AdAnalytics.clickTrend(adClicks(spark, dir))

  // ---- training-data pipeline: text analysis ----

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(Tables(spark, dir, "documents"))

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.textQuality(Tables(spark, dir, "documents"))

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables(spark, dir, "documents"))

  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables(spark, dir, "documents"))

  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTokenStats(Tables(spark, dir, "documents"))

  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(Tables(spark, dir, "documents"))

  /** Token-window size for the q45 line analog: 2 keeps the filter
    * active on the synthetic corpus (longer windows never repeat). */
  val LineTokens = 2

  def lineDedup(spark: SparkSession, dir: String): DataFrame =
    TextClean.dedupLines(Tables(spark, dir, "documents"), LineTokens)

  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    TextClean.piiScrub(Tables(spark, dir, "documents"))

  val MaxPiiHits = 2L
  val VocabTopK = 20

  /** Corpus vocabulary head: top-k tokens by (term_freq, token). */
  def vocabTop(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabTop(Tables(spark, dir, "documents"), VocabTopK)

  /** Gopher repetition signals at the q45 line grain. */
  def repetitionMetrics(spark: SparkSession, dir: String): DataFrame =
    TextClean.repetitionMetrics(Tables(spark, dir, "documents"), LineTokens)

  val RangeWindowSecs = 3600L
  val KmeansK = 8
  val KmeansIters = 2
  // synthetic embeddings are near-orthogonal (max within-cluster cos
  // ≈ 5100 bp at sf0.01); 3000 keeps the filter meaningfully active
  val SemDedupBp = 3000L

  /** Deterministic integer k-means assignment after 2 Lloyd rounds. */
  def kmeans(spark: SparkSession, dir: String): DataFrame =
    KMeans.fit(Tables(spark, dir, "embeddings"), KmeansK, KmeansIters)

  /** SemDeDup: within-kmeans-cluster greedy cosine dedup. */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    KMeans.semDedupKept(Tables(spark, dir, "embeddings"),
      KmeansK, KmeansIters, SemDedupBp)

  /** Misra-Gries heavy hitters with exact candidate recount. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitters(Tables(spark, dir, "documents"), VocabTopK)

  /** Keyless trailing-window range join: site-wide purchases in the
    * hour before each click. */
  def purchasesWindow(spark: SparkSession, dir: String): DataFrame =
    RangeJoin.purchasesBeforeClicks(Tables(spark, dir, "events"), RangeWindowSecs)

  /** Incremental dedup demo split: odd doc_ids are the incoming
    * batch, even doc_ids the existing corpus. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.incrementalDedupKept(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0))
  }

  /** q50's verdicts as the per-source savings accounting table (the
    * streaming twin merges the same report per micro-batch). */
  def incrementalSavings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Dedup.incrementalSavingsReport(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0))
  }

  /** End-to-end corpus materialization: quality ∧ dedup-kept ∧ low-PII
    * → per-(lang, source) doc/token totals. */
  def corpusSelect(spark: SparkSession, dir: String): DataFrame =
    CorpusPipeline.corpusSelect(Tables(spark, dir, "documents"),
      maxPiiHits = MaxPiiHits)

  // ---- training-prep extensions (decontaminate / pack / chunk / mix) ----

  val ContamN = 8
  val ContamEvalMod = 5

  /** Benchmark decontamination: training docs sharing ≥1 word 8-gram
    * with the benchmark split (doc_id % 5 == 0 as the eval-set
    * fixture — a small held-out slice, like a real benchmark). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Contamination.flagged(
      docs.filter(col("doc_id") % ContamEvalMod =!= 0),
      docs.filter(col("doc_id") % ContamEvalMod === 0), ContamN)
  }

  val PackShards = 8
  val PackSeqLen = 2048L

  /** Contiguous sequence packing into 2048-token training sequences
    * across 8 shards. */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.packSequences(Tables(spark, dir, "documents"),
      PackShards, PackSeqLen)

  val ChunkTokens = 64
  val ChunkStride = 48

  /** Overlapping 64-token context chunks advancing by 48 tokens. */
  def contextChunks(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.chunk(Tables(spark, dir, "documents"), ChunkTokens, ChunkStride)

  /** Mixture weights for the epoch-replication fixture: upsample,
    * downsample-to-zero, and the default-1 path all exercised. */
  val EpochWeights = Map("src0" -> 3, "src1" -> 2, "src2" -> 0)

  def epochMix(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.epochMix(Tables(spark, dir, "documents"), EpochWeights)
      .select(col("doc_id"), col("source"), col("epoch"))

  /** Int8 max-abs quantization of the embeddings table, exploded so
    * the oracle pins every code. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    Similarity.quantizeInt8(Tables(spark, dir, "embeddings"))

  val DistinctiveK = 5
  val DistinctiveMaxDfBp = 7500L

  /** Per-language distinctive vocabulary (df-gated top-k keywords). */
  def distinctiveTerms(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.distinctiveTerms(Tables(spark, dir, "documents"),
      DistinctiveK, DistinctiveMaxDfBp)

  val PqM = 8
  val PqK = 16

  /** The PQ family's shared model artifacts (ops.Shared contract —
    * an ANN service builds its codebook and encoded corpus once, then
    * serves every query batch from them): seed book + seed-encoded
    * codes feed q61 and q111's shortlist stage; the trained book +
    * label-carrying codes feed q62. Books are m×k rows; codes are
    * doc-grain (id + m codes), never the float vectors. */
  private def sharedSeedBook(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"pq_seed_book:$dir")(
      ProductQuant.seedCodebook(Tables(spark, dir, "embeddings"), PqM, PqK))

  private def sharedSeedCodes(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"pq_seed_codes:$dir")(
      ProductQuant.encode(Tables(spark, dir, "embeddings"),
        sharedSeedBook(spark, dir), PqM))

  private def sharedTrainedBook(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"pq_trained_book:$dir")(
      ProductQuant.trainedCodebook(Tables(spark, dir, "embeddings"),
        PqM, PqK, iters = 1))

  private def sharedTrainedCodes(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"pq_trained_codes:$dir")(
      ProductQuant.encode(Tables(spark, dir, "embeddings"),
        sharedTrainedBook(spark, dir), PqM, carry = Seq("label")))

  /** The ANN family's shared index artifacts (ops.Shared contract —
    * the sign-LSH/IVF twin of the PQ book+codes above): the quantized
    * corpus (LSH bucket + integer codes + exact norms, doc-grain
    * integer rows — never the float vectors) and the IVF coarse
    * centroids (label-grain). Built once per session;
    * q25/q26/q27/q32/q72/q87/q100/q121/q143/q158/q243 all serve from
    * them instead of each re-quantizing the corpus. */
  private def sharedAnnIndex(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"ann_index:$dir")(
      Similarity.quantizedCorpus(Tables(spark, dir, "embeddings")))

  private def sharedIvfCentroids(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"ivf_centroids:$dir")(
      Similarity.ivfCentroidsFromQuantized(sharedAnnIndex(spark, dir)))

  /** PQ/ADC top-10 with the oracle-able seed codebook. */
  def pqAnn(spark: SparkSession, dir: String): DataFrame =
    ProductQuant.adcTopK(Tables(spark, dir, "embeddings"), knnQueryPred,
      PqM, PqK, book0 = Some(sharedSeedBook(spark, dir)),
      codes0 = Some(sharedSeedCodes(spark, dir)))

  /** PQ distortion audit: per-subspace quantization error vs signal
    * energy under the q61 seed codebook. */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame =
    ProductQuant.distortion(Tables(spark, dir, "embeddings"), PqM, PqK,
      book0 = Some(sharedSeedBook(spark, dir)))

  /** IVF-PQ on the TRAINED codebook: one symbolically-unrolled
    * integer-Lloyd refinement of the seed book (q61 keeps the seed
    * variant, so both codebook paths stay oracle-covered); nProbe=1
    * keeps routing deterministic. */
  def ivfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    ProductQuant.ivfPqTopK(emb, knnQueryPred, PqM, PqK,
      book0 = Some(sharedTrainedBook(spark, dir)),
      codes0 = Some(sharedTrainedCodes(spark, dir)))
  }

  val SplitTrainBp = 9000L
  val SplitValBp = 500L

  /** Deterministic 90/5/5 corpus split, reported per stratum. */
  def corpusSplit(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.split(Tables(spark, dir, "documents"), SplitTrainBp, SplitValBp)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))

  /** Near-dup pairs vs the q63 split: the memorization-leakage audit. */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.splitLeakage(Tables(spark, dir, "documents"),
      SplitTrainBp, SplitValBp)

  /** The whole pipeline as ONE declarative plan — what actually ships
    * to a training run: quality ∧ dedup-kept ∧ decontaminated docs
    * (benchmark split excluded), split train/val/test, totalled per
    * (split, lang). Every stage is an operator this engine already
    * answers alone (q23/q47/q55/q63); Catalyst fuses the composition —
    * gates inline into the scans, the dedup and contamination joins
    * share the corpus pass, no materialization between stages. */
  def trainingManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val selected = Dedup.ngramDedupKept(docs)
      .join(CorpusPipeline.gated(docs, maxPiiHits = MaxPiiHits)
        .select(col("doc_id"), col("token_count")), "doc_id")
    val flagged = Contamination.flagged(
      docs.filter(col("doc_id") % ContamEvalMod =!= 0),
      docs.filter(col("doc_id") % ContamEvalMod === 0), ContamN)
    val clean = selected
      .filter(col("doc_id") % ContamEvalMod =!= 0)
      .join(flagged.select(col("doc_id")), Seq("doc_id"), "left_anti")
    TrainingPrep.split(clean, SplitTrainBp, SplitValBp)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_count")).as("total_tokens"))
  }

  // ---- retrieval / substring dedup / curriculum (round 3) ----

  /** Substring-grain duplicate spans (Lee et al. style k-gram pass). */
  def substringDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringDupSpans(Tables(spark, dir, "documents"))

  /** The remove half: duplicated spans dropped from the text. */
  def substringScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringScrub(Tables(spark, dir, "documents"))

  val Bm25TopK = 5

  /** BM25 lexical top-5 per demo query (rational idf, fixed-point). */
  def bm25(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(Tables(spark, dir, "documents"),
      Retrieval.demoQueries(spark), Bm25TopK)

  val CurriculumBuckets = 4

  /** Corpus-wide curriculum quartiles by type-token ratio. */
  def curriculumBuckets(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.curriculumBuckets(Tables(spark, dir, "documents"),
      CurriculumBuckets)

  /** Hashed-feature linear quality classifier (zero-shuffle map). */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityClassifier(Tables(spark, dir, "documents"))

  val BpeRounds = 3

  /** Distributed BPE merge learning, 3 rounds unrolled. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    Bpe.learn(Tables(spark, dir, "documents"), BpeRounds)

  // src0 upweighted past its availability so the cap + deficit
  // columns are exercised on the fixture
  val MixWeights = Map("src0" -> 10L, "src1" -> 5L)
  val MixBudget = 30000L

  /** Per-source sampling-rate allocation for a 30k-token budget. */
  def mixturePlan(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.mixturePlan(Tables(spark, dir, "documents"),
      MixWeights, MixBudget)

  // ---- aggregation extensions (median / rollup / approx-distinct) ----

  def cubeTotals(spark: SparkSession, dir: String): DataFrame =
    Percentiles.cubeTotals(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_linestatus", "l_extendedprice")

  def medianQuantity(spark: SparkSession, dir: String): DataFrame =
    Percentiles.medianCents(Tables(spark, dir, "lineitem"), "l_returnflag", "l_quantity")

  def rollupTotals(spark: SparkSession, dir: String): DataFrame =
    Percentiles.rollupTotals(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_linestatus", "l_extendedprice")

  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Percentiles.approxDistinctChecked(Tables(spark, dir, "orders"),
      "o_orderpriority", "o_custkey")

  def approxMedian(spark: SparkSession, dir: String): DataFrame =
    Percentiles.approxMedianChecked(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_quantity")

  /** A10/W6: the reference's Spark-2 Dataset demo surface
    * (UserActiveDegreeAnalyze.scala:56-82,96-133) — per-user activity
    * ranking: action count + integer-cents purchase total, top-10 by
    * count with id tie-break. One shuffle (user aggregate), then
    * TakeOrderedAndProject. */
  def userActivity(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("action_count"),
        // house money convention: per-row floor(x*100) cents, BIGINT sum
        sum(when(col("event_type") === "purchase",
          floor(col("value") * lit(100.0))).otherwise(lit(0L)))
          .as("purchase_cents"))
      .orderBy(col("action_count").desc, col("user_id").asc)
      .limit(10)

  /** Ingest adapter: events analog → the reference's 13-column
    * user_visit_action schema (MockData.java:87-100), row grain. */
  def userVisitAction(spark: SparkSession, dir: String): DataFrame =
    graft.ingest.UserVisitAction.fromEvents(Tables(spark, dir, "events"))

  /** P4 on the real schema: mixed click+order+pay comma-list explode
    * → reference top10_category ordering. */
  def categoryActionCounts(spark: SparkSession, dir: String): DataFrame =
    graft.ingest.UserVisitAction.topCategories(userVisitAction(spark, dir))

  // ---- training-data pipeline: deduplication ----

  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables(spark, dir, "documents"))

  def minhashDedupPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedupPairs(Tables(spark, dir, "documents"))

  def ngramDedupKept(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramDedupKept(Tables(spark, dir, "documents"))

  def simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables(spark, dir, "documents"))

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables(spark, dir, "documents"))

  /** The q42/q102/q129/q182 family's shared cluster-assignment
    * artifact (ops.Shared contract): LSH pairs + CC built once per
    * session, every report a pure aggregate of the checkpointed
    * doc-grain frame. Standalone Clustering entry points stay for
    * direct library use; ClusteringSpec pins From-over-shared ≡
    * standalone. */
  private def sharedAssignments(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"cc_assignments:$dir")(
      Clustering.assignments(Tables(spark, dir, "documents")))

  /** Transitive closure of q22's near-dup pairs: per-doc cluster id +
    * canonical representative (large-star/small-star CC). */
  def nearDupClusters(spark: SparkSession, dir: String): DataFrame =
    Clustering.clustersFrom(sharedAssignments(spark, dir))

  val AsofToleranceSecs = 3600L

  /** As-of join (left): each click ← the user's latest prior purchase. */
  def asofLastPurchase(spark: SparkSession, dir: String): DataFrame =
    AsOfJoin.clickLastPurchase(Tables(spark, dir, "events"))

  /** As-of join with tolerance: prior purchase within the last hour. */
  def asofRecentPurchase(spark: SparkSession, dir: String): DataFrame =
    AsOfJoin.clickRecentPurchase(Tables(spark, dir, "events"), AsofToleranceSecs)

  // ---- training-data pipeline: similarity search ----

  // Shared query parameters — interpolated into the oracle SQL so the
  // two sides cannot drift.
  val KnnQueryMod = 50L
  val BlacklistThreshold = 2L
  val StratifiedTarget = 1000L

  /** Query set for the ANN/kNN demos: every KnnQueryMod-th vector. */
  val knnQueryPred: Column = col("vec_id") % KnnQueryMod === 0

  def knnBruteforce(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnBruteForce(Tables(spark, dir, "embeddings"), knnQueryPred,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  /** Contrastive hard negatives: most-similar different-label top-3. */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(Tables(spark, dir, "embeddings"), knnQueryPred,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  /** Leave-one-out kNN label accuracy per class (embedding-quality
    * probe over the q25 probe set, majority of top-10 neighbors). */
  def knnLabelAccuracy(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnLabelAccuracy(Tables(spark, dir, "embeddings"),
      knnQueryPred, quant0 = Some(sharedAnnIndex(spark, dir)))

  val MigrationBins = 4

  /** Month-over-month spend-quartile migration matrix (to_tier 0 =
    * churned next month). */
  def spendTierMigration(spark: SparkSession, dir: String): DataFrame =
    Retention.spendTierMigration(Tables(spark, dir, "orders"),
      MigrationBins)

  /** Monthly Laspeyres/Paasche/Fisher price indices over the matched
    * part basket (mix-shift-free price movement). */
  def priceIndex(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.priceIndex(Tables(spark, dir, "lineitem"))


  /** STL-lite variance decomposition of daily revenue: trend (dyadic
    * EWMA) / day-of-week / remainder shares in bp. */
  def varianceDecomposition(spark: SparkSession, dir: String): DataFrame =
    Retention.varianceDecomposition(Tables(spark, dir, "orders"),
      EwmaWindowDays)

  /** Bloom runtime-filter audit: lineitem rows passed by a broadcast
    * bitmap bloom of URGENT order keys vs the exact semi-join. */
  def bloomSemiAudit(spark: SparkSession, dir: String): DataFrame =
    Joins.bloomSemiAudit(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
      "l_orderkey", "o_orderkey")

  val XcorrLags = Seq(-7, -1, 0, 1, 7)

  /** Daily order-volume vs avg-basket cross-correlation at lead-lag
    * offsets (the q301 machinery across two series). */
  def crossCorrelation(spark: SparkSession, dir: String): DataFrame =
    Retention.crossCorrelation(Tables(spark, dir, "orders"), XcorrLags)

  /** Exact Shapley-value attribution over the q292 channel domain:
    * coalition game on pre-conversion touch sets, credits ×|Ch|!
    * exact, direct conversions outside the game. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame =
    Market.shapleyAttribution(Tables(spark, dir, "events"),
      AttributionChannels, AbsorbTarget)

  /** Cramér's-V association screen over the declared categorical
    * pairs — one R×C contingency read per table, ranked by V. The
    * event pair uses day-of-week; its NUMBERING differs per engine
    * (Spark 1=Sun..7, DuckDB 0=Sun..6) but χ²/V are label-invariant,
    * so the twin is exact anyway. */
  def associationScreen(spark: SparkSession, dir: String): DataFrame =
    // all 5 contingency reads through ONE shared ladder (per-pair
    // subtrees spent ~6 AQE stage materializations each on
    // contingency-grain metadata; the scans stay per-table)
    Profile.cramersVMany(Seq(
      (Tables(spark, dir, "customer"),
        col("c_mktsegment"), col("c_nationkey"),
        "c_mktsegment", "c_nationkey"),
      (Tables(spark, dir, "events").filter(col("ts").isNotNull),
        col("event_type"), dayofweek(col("ts")).cast("long"),
        "event_type", "event_dow"),
      (Tables(spark, dir, "lineitem"),
        col("l_returnflag"), col("l_linestatus"),
        "l_returnflag", "l_linestatus"),
      (Tables(spark, dir, "orders"),
        col("o_orderpriority"), col("o_orderstatus"),
        "o_orderpriority", "o_orderstatus"),
      (Tables(spark, dir, "part"),
        col("p_brand"), col("p_type"), "p_brand", "p_type")))
      .orderBy(col("feature_a").asc)

  val FuzzyMaxDist = 3
  val FuzzyTopK = 50

  /** Blocked-Levenshtein fuzzy duplicate detection over part names:
    * shared-token blocking at name-domain grain, dist ≤ 3 head. */
  def fuzzyNameMatch(spark: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyNameMatch(Tables(spark, dir, "part"), "p_name",
      "p_partkey", FuzzyMaxDist, k = FuzzyTopK)

  val HaarLevels = 6

  /** Haar wavelet energy spectrum of daily revenue: which dyadic
    * time scale (2..64 days) carries the variance. */
  def haarEnergy(spark: SparkSession, dir: String): DataFrame =
    Retention.haarEnergy(Tables(spark, dir, "orders"), HaarLevels)

  val CrostonWindowPow = 8
  val CrostonMinDemands = 4

  /** Croston intermittent-demand forecast per slow-moving part:
    * size/interval dyadic smoothing over demand occurrences. */
  def crostonDemand(spark: SparkSession, dir: String): DataFrame =
    Market.crostonDemand(Tables(spark, dir, "lineitem"),
      CrostonWindowPow, CrostonMinDemands)

  /** Declared FD candidates: (table, lhs, rhs) — a mix of FDs the
    * star schema guarantees (canaries that must read holds=1) and
    * plausible-but-false dependencies the audit must refute. */
  val FdCandidates: Seq[(String, String, String)] = Seq(
    ("customer", "c_custkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("part", "p_name", "p_brand"))

  /** Monthly NDR/GRR dollar-retention panel with the
    * expansion/contraction/churn/new decomposition. */
  def revenueRetention(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueRetention(Tables(spark, dir, "orders"))

  /** CUSUM on the q311 seasonally-adjusted remainder: level-shift
    * detection with trend and weekly rhythm removed. */
  def deseasonalizedCusum(spark: SparkSession, dir: String): DataFrame =
    Retention.deseasonalizedCusum(Tables(spark, dir, "orders"),
      EwmaWindowDays, CusumSlackBp, CusumHMeanDays)

  /** g3-error functional-dependency audit over the declared
    * candidate list. */
  def fdAudit(spark: SparkSession, dir: String): DataFrame =
    FdCandidates.map { case (t, l, r) =>
      Profile.fdAudit(Tables(spark, dir, t), l, r, t)
    }.reduce(_ unionByName _)
      .orderBy(col("tbl").asc, col("lhs").asc, col("rhs").asc)

  /** BPE inference (the q70 merges applied): vocabulary re-segmented
    * by the learned rules. The merge list is collected driver-side —
    * it is `BpeRounds` rows by construction (a model artifact, like
    * kmeans centroids), not data-sized. */
  def bpeSegment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val merges = Bpe.learn(docs, BpeRounds)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    Bpe.segment(Bpe.vocab(docs), merges)
      .select(col("word"), col("freq"),
        array_join(col("syms"), "|").as("pieces"))
  }

  val EvalSampleK = 3

  /** Deterministic per-language human-eval holdout (md5 draw). */
  def evalSample(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.evalSample(Tables(spark, dir, "documents"), EvalSampleK)

  val SourceCapK = 10
  val SourceCapRateN = 20L
  /** Provenance ranks for q82 (higher wins; absent sources rank 1). */
  val SourcePriority: Map[String, Long] = Map("src1" -> 3L, "src4" -> 2L)

  /** Provenance-aware exact dedup (curated beats crawl). */
  def canonicalBySource(spark: SparkSession, dir: String): DataFrame =
    Dedup.canonicalBySource(Tables(spark, dir, "documents"),
      SourcePriority, defaultPriority = 1L)

  /** Markup/boilerplate strip (ingest-side web-dump cleanup). */
  def stripMarkup(spark: SparkSession, dir: String): DataFrame =
    TextClean.stripMarkup(Tables(spark, dir, "documents"))

  /** Snapshot versioning diff. The two snapshots are derived
    * deterministically from the one fixture table: old drops
    * doc_id % 5 == 0, new drops % 7 == 0 and rewrites % 11 == 0 —
    * covering added/removed/changed/unchanged in every source. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables(spark, dir, "documents")
    val oldSnap = d.filter(col("doc_id") % 5 =!= 0)
    val newSnap = d.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text", when(col("doc_id") % 11 === 0,
        concat(coalesce(col("text"), lit("")), lit(" v2")))
        .otherwise(col("text")))
    CorpusPipeline.snapshotDiff(oldSnap, newSnap)
  }

  /** Per-source doc cap, exact variant (domain balancing). */
  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.sourceCapExact(Tables(spark, dir, "documents"), SourceCapK)

  /** Per-source doc cap, zero-skew hash-rate variant. */
  def sourceCapRate(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.sourceCapRate(Tables(spark, dir, "documents"), SourceCapRateN)

  // OovVocabSize deliberately cuts the fixture vocabulary (31 distinct
  // tokens at sf0.01) roughly in half so the rate is exercised, not
  // degenerate; CooccurMinCount keeps ~30+ pairs above the support bar.
  val OovVocabSize = 16
  val CooccurMinCount = 5L
  val CooccurTopK = 30
  val OutlierTopK = 5

  /** Tokenizer-vocab coverage: per-doc OOV rate vs the top-16 head. */
  def oovRate(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.oovRate(Tables(spark, dir, "documents"), OovVocabSize)

  /** Collocation mining: top bigram pairs by fixed-point PMI rank. */
  def cooccurTop(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.cooccurrence(Tables(spark, dir, "documents"),
      CooccurMinCount, CooccurTopK)

  /** Per-label embedding outliers vs the label's floor-mean centroid. */
  def labelOutliers(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelOutliers(Tables(spark, dir, "embeddings"), OutlierTopK,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  val AnomalyWindowDays = 7
  val AnomalyK2 = 4L // z² threshold: flag when z² > 4 (|z| > 2σ)
  val AnomalyMinObs = 4L

  /** Daily event-volume anomaly flags vs the trailing-week baseline. */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame =
    Retention.volumeAnomaly(Tables(spark, dir, "events"),
      AnomalyWindowDays, AnomalyK2, AnomalyMinObs)

  /** One-row corpus balance report: token Gini + top-source share. */
  def sourceConcentration(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.sourceConcentration(Tables(spark, dir, "documents"))

  val CoVisitTopK = 50
  val CoVisitMaxItems = 64

  /** Session-basket co-visitation pairs (top-50 by shared sessions). */
  def coVisitation(spark: SparkSession, dir: String): DataFrame =
    Market.coVisitation(Tables(spark, dir, "events"),
      CoVisitTopK, CoVisitMaxItems)

  /** Within-session event-type transition matrix. */
  def transitions(spark: SparkSession, dir: String): DataFrame =
    Market.transitions(Tables(spark, dir, "events"))

  /** Cross-source n-gram overlap / containment matrix. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    Dedup.sourceOverlap(Tables(spark, dir, "documents"))

  val PageRankIters = 3
  val PageRankK = 20
  val PageRankMinSupport = 2L

  /** The graph family's (q93/q157/q196) shared co-visitation pair
    * set (ops.Shared contract): the sessionize → basket → pair
    * pipeline runs once per session; each graph query is a traversal
    * of the checkpointed pair frame — (item_a, item_b, weight) rows,
    * item-catalog-bounded, never corpus-sized. Every consumer is
    * independently oracle-checked, so the memo can't drift. */
  private def sharedCoVisPairs(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"covis_pairs:$dir")(
      Market.coVisitPairs(Tables(spark, dir, "events")))

  /** Item PageRank over the symmetrized co-visitation graph
    * (symmetric ⇒ no dangling nodes ⇒ the 2-stages-per-round dangle
    * machinery is skipped; identical results, GraphSpec-pinned). */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRankTopK(
      Graph.symmetric(sharedCoVisPairs(spark, dir), PageRankMinSupport),
      PageRankIters, PageRankK, assumeNoDangling = true)

  /** The fixture's events end Jan 2024; the RFM anchor sits just
    * past them (an explicit parameter — wall-clock "today" would be
    * unreproducible across engines and reruns). */
  val RfmAnchor = "2024-02-01"
  val RfmBuckets = 4

  /** RFM user segmentation over purchase events. */
  def rfm(spark: SparkSession, dir: String): DataFrame =
    Retention.rfm(Tables(spark, dir, "events"), RfmAnchor, RfmBuckets)

  val orderedFlow: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Ordered-subsequence funnel depth over sessions. */
  def orderedFunnel(spark: SparkSession, dir: String): DataFrame =
    PageFunnel.orderedFunnel(spark,
      Sessionize.assignSessions(Tables(spark, dir, "events")), orderedFlow)

  /** Directional shingle-containment pairs over LSH candidates. */
  def containment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables(spark, dir, "documents"))

  /** Per-source lexical diversity (TTR / hapax / bigram) report. */
  def sourceDiversity(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceDiversity(Tables(spark, dir, "documents"))

  val PpsStride = 512L
  val PpsShards = 8

  /** Systematic PPS token-proportional corpus sample. */
  def ppsSample(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.ppsSample(Tables(spark, dir, "documents"), PpsStride, PpsShards)

  val NextItemContext = 3

  /** Next-item (context, label) training pairs from sessions. The
    * library op returns a typed array; the driver-compared projection
    * joins it to a string — arrow ARRAY nullability annotations
    * differ across engines (Spark collect_list elements are
    * non-null; DuckDB list elements nullable) and would trip the
    * schema gate on otherwise identical values. */
  def nextItemPairs(spark: SparkSession, dir: String): DataFrame =
    Market.nextItemPairs(Tables(spark, dir, "events"), NextItemContext)
      .withColumn("context", concat_ws(",", col("context")))

  val RetentionMaxOffset = 14
  /** Analysis window covering the whole fixture (events span Jan
    * 2024) — the REQUIRED bound cohortRetention's scale contract
    * demands; both engines apply the identical predicate. */
  val RetentionWindow: (String, String) = ("2024-01-01", "2024-01-31")
  val ActiveWindowDays = 7
  val P95Bp = 9500L

  /** Cohort retention triangle over the events stream. */
  def retention(spark: SparkSession, dir: String): DataFrame =
    Retention.cohortRetention(Tables(spark, dir, "events"),
      RetentionWindow, RetentionMaxOffset)

  /** DAU / trailing-7-day WAU / stickiness per day. */
  def activeUsers(spark: SparkSession, dir: String): DataFrame =
    Retention.activeUsers(Tables(spark, dir, "events"), ActiveWindowDays)

  /** Exact p95 of lineitem quantity per returnflag (histogram plan). */
  def p95Quantity(spark: SparkSession, dir: String): DataFrame =
    Percentiles.quantileCents(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_quantity", P95Bp)

  val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** One-pass per-column data-quality report over documents. */
  def profileDocs(spark: SparkSession, dir: String): DataFrame =
    Profile.profile(Tables(spark, dir, "documents"), ProfileCols)

  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.annLsh(Tables(spark, dir, "embeddings"), knnQueryPred,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(Tables(spark, dir, "embeddings"),
      quant0 = Some(sharedAnnIndex(spark, dir)))

  def ivfAnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfAnn(Tables(spark, dir, "embeddings"), knnQueryPred,
      quant0 = Some(sharedAnnIndex(spark, dir)),
      cents0 = Some(sharedIvfCentroids(spark, dir)))

  val IvfProbeDepths = Seq(1, 2, 4, 8)

  /** IVF recall-vs-cost curve over probe depths 1/2/4/8. */
  def ivfProbeCurve(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfProbeCurve(Tables(spark, dir, "embeddings"), knnQueryPred,
      AnnRecallK, IvfProbeDepths,
      quant0 = Some(sharedAnnIndex(spark, dir)),
      cents0 = Some(sharedIvfCentroids(spark, dir)))

  // ---- training-data pipeline: multimodal columns ----

  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaMetadata(Multimodal.packMedia(Tables(spark, dir, "documents")))

  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.packMedia(Tables(spark, dir, "documents")))

  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFeatures(Multimodal.packMedia(Tables(spark, dir, "documents")))

  val AnnRecallK = 3

  /** Recall@k of the LSH ANN (q26) vs brute-force truth (q25). */
  def annRecall(spark: SparkSession, dir: String): DataFrame =
    Similarity.annRecall(Tables(spark, dir, "embeddings"), knnQueryPred,
      AnnRecallK, quant0 = Some(sharedAnnIndex(spark, dir)))

  /** Every FuzzyEvalMod-th doc plays the benchmark set; the rest are
    * the training corpus. Plain `%` on BOTH engines (sign-of-dividend
    * in Spark and DuckDB alike — pmod would diverge on negative ids,
    * the q63 lesson). */
  val FuzzyEvalMod = 10L
  val FuzzyEvalRem = 7L
  val FuzzyThresholdBp = 8000L

  /** Fuzzy (MinHash-LSH) decontamination: train docs containing an
    * eval doc's shingle set at ≥ FuzzyThresholdBp containment. */
  def fuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Contamination.fuzzyFlagged(
      docs.filter(col("doc_id") % FuzzyEvalMod =!= FuzzyEvalRem),
      docs.filter(col("doc_id") % FuzzyEvalMod === FuzzyEvalRem),
      FuzzyThresholdBp)
  }

  /** Per-source dedup savings report over q42's cluster assignment. */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame =
    Clustering.dedupImpactFrom(sharedAssignments(spark, dir))

  /** Per-source PII prevalence triage report (q46's patterns). */
  def piiPrevalence(spark: SparkSession, dir: String): DataFrame =
    TextClean.piiPrevalence(Tables(spark, dir, "documents"))

  val LangMixBudget = 1000000L

  /** Temperature-smoothed (α=1/2) per-language sampling plan. */
  def languageMix(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.languageMix(Tables(spark, dir, "documents"), LangMixBudget)

  val ShuffleShards = 8

  /** Deterministic global training-order shuffle (shard, pos). */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.shardShuffle(Tables(spark, dir, "documents"), ShuffleShards)

  /** Per-language tokenizer fertility diagnostic. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenizerFertility(Tables(spark, dir, "documents"))

  // Mid-range split of the fixture's 2024-01 span; 25-wide buckets
  // cover the observed 0..~500 value range in 20 bins.
  val DriftSplitDate = "2024-01-16"
  val DriftBucketWidth = 25.0
  val DriftBuckets = 20

  /** Value-distribution drift (TVD) per event type across the split. */
  def valueDrift(spark: SparkSession, dir: String): DataFrame =
    Retention.valueDrift(Tables(spark, dir, "events"), DriftSplitDate,
      DriftBucketWidth, DriftBuckets)

  /** Per-source log₂ token-length histogram (length-gate planning). */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.lengthHistogram(Tables(spark, dir, "documents"))

  val RerankShortlist = 30

  /** Two-stage ANN: ADC shortlist → exact cosine re-rank (shortlist
    * stage rides the shared seed book + codes, q61's artifacts). */
  def rerankTopK(spark: SparkSession, dir: String): DataFrame =
    ProductQuant.rerankTopK(Tables(spark, dir, "embeddings"), knnQueryPred,
      PqM, PqK, RerankShortlist,
      book0 = Some(sharedSeedBook(spark, dir)),
      codes0 = Some(sharedSeedCodes(spark, dir)))

  // Fixture-scale bot thresholds: the driver's events table tops out
  // at 3-event sessions (sf0.01), so the production defaults (5
  // events, 2 s mean) never fire there. These values exercise both
  // verdict paths on the fixture; production tunes per property.
  val BotMinEvents = 3L
  val BotFastGapUs = 300000000L // 300 s mean gap
  val BotJitterUs = 60000000L   // 60 s spread

  /** Session-grain bot/automation verdicts (rate + regularity). */
  def botSessions(spark: SparkSession, dir: String): DataFrame =
    Sessionize.botSessions(Tables(spark, dir, "events"),
      minEvents = BotMinEvents, fastGapUs = BotFastGapUs,
      jitterUs = BotJitterUs)

  /** Per-event-type dwell-time report (time-on-step analytics). */
  def dwellTime(spark: SparkSession, dir: String): DataFrame =
    Sessionize.dwellTime(Tables(spark, dir, "events"))

  /** DSIR target seed: one fixture source stands in for the curated
    * corpus (Wikipedia/books in the paper) the raw crawl is scored
    * against. */
  val DsirTargetSource = "src0"

  /** The q114 doc-grain score frame as a session artifact (Shared
    * contract): the hashed-ngram feature build is the expensive 90%
    * of both q114 and q351 — build once, serve both. */
  private def sharedDsirScores(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"dsir_scores:$dir") {
      val docs = Tables(spark, dir, "documents")
      TrainingPrep.dsirScore(docs,
        docs.filter(col("source") === DsirTargetSource))
    }

  /** DSIR importance score of every document vs the target seed. */
  def dsirScore(spark: SparkSession, dir: String): DataFrame =
    sharedDsirScores(spark, dir)

  // ≈ half the sf0.01 corpus tokens — the boundary class is exercised
  // there; smaller fixtures select everything (reason = full only).
  val SelectBudgetTokens = 20000L

  /** Budget-constrained selection over the q69 classifier scores. */
  def budgetSelect(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.budgetSelect(
      TextAnalysis.qualityClassifier(Tables(spark, dir, "documents")),
      SelectBudgetTokens)

  // 10-minute conversion window: binding on the fixture (median
  // within-session gap ≈ 15 min), so q116's reach counts genuinely
  // diverge from q95's unbounded ones.
  val FunnelWindowSeconds = 600L

  /** Time-boxed ordered funnel (per-step conversion window). */
  def windowedFunnel(spark: SparkSession, dir: String): DataFrame =
    PageFunnel.windowedFunnel(spark,
      Sessionize.assignSessions(Tables(spark, dir, "events")),
      orderedFlow, FunnelWindowSeconds)

  /** Per-eval-item contamination triage (q55's split, reversed). */
  def evalContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    Contamination.evalContamination(
      docs.filter(col("doc_id") % ContamEvalMod =!= 0),
      docs.filter(col("doc_id") % ContamEvalMod === 0), ContamN)
  }

  /** Shard-mixing audit over q107's shuffle (per-shard source TVD). */
  def shardMixing(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.shardMixing(Tables(spark, dir, "documents"), ShuffleShards)

  // Dyadic width keeps floor(score/width) an exact binary scaling;
  // 1024 yields ~tens of buckets over the fixture's score range.
  val SweepBucketWidth = 1024L

  /** Quality-threshold sweep over the q69 classifier scores. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.thresholdSweep(
      TextAnalysis.qualityClassifier(Tables(spark, dir, "documents")),
      SweepBucketWidth)

  /** q18 heuristic × q69 classifier agreement matrix. */
  def signalAgreement(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.signalAgreement(Tables(spark, dir, "documents"))

  /** IVF list balance / coherence report (index-health gate). */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfBalance(Tables(spark, dir, "embeddings"),
      quant0 = Some(sharedAnnIndex(spark, dir)),
      cents0 = Some(sharedIvfCentroids(spark, dir)))

  /** Per-source character-class / script mixture panel. */
  def scriptMix(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.scriptMix(Tables(spark, dir, "documents"))

  // Same token-window line analog as q45; 2 docs is the floor that
  // makes a window "shared" at fixture scale.
  val BoilerplateMinDocs = 2L
  val BoilerplateTopK = 5

  /** Top cross-document boilerplate lines per source. */
  def boilerplateLines(spark: SparkSession, dir: String): DataFrame =
    TextClean.boilerplateLines(Tables(spark, dir, "documents"),
      LineTokens, BoilerplateMinDocs, BoilerplateTopK)

  /** First/last-touch conversion attribution over sessions. */
  def attribution(spark: SparkSession, dir: String): DataFrame =
    Sessionize.attribution(Tables(spark, dir, "events"))

  // Same token-window gram size as the q65 substring family; the
  // fixture corpus has planted duplicates, so novelty < 10000 exists.
  val NoveltyGram = 8

  /** Per-doc corpus-novelty share at 8-gram grain. */
  def docNovelty(spark: SparkSession, dir: String): DataFrame =
    Dedup.docNovelty(Tables(spark, dir, "documents"), NoveltyGram)

  // Head size covering most of the synthetic corpus' Zipf mass while
  // leaving a real OOV tail at sf0.01 (vocab there is ~1k types).
  val SurprisalHeadK = 500

  /** Unigram head-vocab surprisal (perplexity-filter proxy). */
  def surprisal(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.surprisal(Tables(spark, dir, "documents"), SurprisalHeadK)

  val SessionPathSteps = 5
  val SessionPathK = 20

  /** Top session paths (first-5-steps journeys + conversion share). */
  def sessionPaths(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionPaths(Tables(spark, dir, "events"),
      maxSteps = SessionPathSteps, k = SessionPathK)

  // ~2% of customers — a plausible erasure batch (and non-trivial on
  // every fixture size).
  val ErasureDenyMod = 53L

  /** GDPR erasure cascade audit over the deny list. */
  def erasureAudit(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables(spark, dir, "customer")
    Erasure.erasureAudit(
      customer.filter(col("c_custkey") % ErasureDenyMod === 0)
        .select(col("c_custkey").as("user_id")),
      customer, Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "events"))
  }

  /** Near-dup cluster-size ⌊log₂⌋ histogram (q42's shape report). */
  def clusterSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    Clustering.clusterSizeHistogramFrom(sharedAssignments(spark, dir))

  // Fixture-scale target (production: 128 MB): small enough that
  // multi-file sources exist at sf0.01.
  val CompactionTargetBytes = 2048L

  /** Output-file compaction plan per source. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.compactionPlan(Tables(spark, dir, "documents"),
      CompactionTargetBytes)

  // Inside the fixture's 2024-01 span: ages 0..~27 days exercise
  // several half-lives AND the future-event filter.
  val RecencyAsOf = "2024-01-28"

  /** Recency-weighted (half-life) event sampling. */
  def recencySample(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.recencySample(Tables(spark, dir, "events"), RecencyAsOf)

  // Below the fixture's ~6-7 events/user so the cap actually cuts.
  val ContributorCapK = 4

  /** Per-user contributor cap (whale damping / data minimization). */
  def contributorCap(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.contributorCap(Tables(spark, dir, "events"), ContributorCapK)

  val PreferenceK = 3

  /** DPO preference pairs: per-source best-vs-worst by q69 score. */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.preferencePairs(Tables(spark, dir, "documents"), PreferenceK)

  /** Cohort LTV curve (cumulative cents by account age). */
  def ltvCurve(spark: SparkSession, dir: String): DataFrame =
    Retention.ltvCurve(Tables(spark, dir, "events"),
      RetentionWindow, RetentionMaxOffset)

  /** Cross-doc boilerplate REMOVAL (q123's actionable half). */
  def boilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    TextClean.boilerplateScrub(Tables(spark, dir, "documents"),
      LineTokens, BoilerplateMinDocs)

  val Q5Region = "ASIA"
  val Q5YearFrom = "1996-01-01"
  val Q5YearUntil = "1997-01-01"

  /** TPC-H Q5 shape: local-supplier revenue per nation. */
  def localSupplierRevenue(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.localSupplierRevenue(
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "supplier"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"),
      Q5Region, Q5YearFrom, Q5YearUntil)

  val SkewTopK = 10

  /** Join-key skew report over the events user_id (pre-join triage). */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    Profile.keySkew(Tables(spark, dir, "events"), "user_id", SkewTopK)

  /** Semi-structured props schema profile. */
  def propsSchema(spark: SparkSession, dir: String): DataFrame =
    Profile.propsSchema(Tables(spark, dir, "events"))

  val QuantileRanks = Seq(5000L, 9000L, 9900L)

  /** p50/p90/p99 value table per event type, one histogram pass. */
  def quantileTable(spark: SparkSession, dir: String): DataFrame =
    Percentiles.quantileTable(Tables(spark, dir, "events"),
      "event_type", "value", QuantileRanks)

  /** Embedding-health audit (pre-index data-quality gate). */
  def embeddingHealth(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingHealth(Tables(spark, dir, "embeddings"))

  /** Text↔embedding modality coverage report. */
  def modalityCoverage(spark: SparkSession, dir: String): DataFrame =
    Profile.modalityCoverage(Tables(spark, dir, "documents"),
      Tables(spark, dir, "embeddings"))

  // the fixture's closed event domain, declared (pivot without
  // declared values = an extra driver-side distinct scan)
  val PivotTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Daily activity pivot (days × event types + residual + total). */
  def dailyActivityPivot(spark: SparkSession, dir: String): DataFrame =
    Retention.dailyActivityPivot(Tables(spark, dir, "events"), PivotTypes)

  // "index built before the last third of the corpus arrived"
  val DriftBuiltMod = 3L

  /** IVF centroid drift vs index-build time (staleness report). */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame =
    Similarity.centroidDrift(Tables(spark, dir, "embeddings"),
      col("vec_id") % DriftBuiltMod =!= 0,
      quant0 = Some(sharedAnnIndex(spark, dir)),
      cents0 = Some(sharedIvfCentroids(spark, dir)))

  /** Between-session return-time ⌊log₂ hours⌋ histogram. */
  def returnTimes(spark: SparkSession, dir: String): DataFrame =
    Retention.returnTimes(Tables(spark, dir, "events"))

  /** Hour-of-day activity profile per event type (+ peak flag). */
  def hourlyProfile(spark: SparkSession, dir: String): DataFrame =
    Retention.hourlyProfile(Tables(spark, dir, "events"))

  /** Exact × MinHash × SimHash dedup verdict fusion matrix. */
  def verdictFusion(spark: SparkSession, dir: String): DataFrame =
    Dedup.verdictFusion(Tables(spark, dir, "documents"))

  /** Sample-ratio-mismatch check for the md5 50/50 split. */
  def srmCheck(spark: SparkSession, dir: String): DataFrame =
    Experiment.srmCheck(Tables(spark, dir, "events"))

  /** Per-arm conversion lift under the same split. */
  def abLift(spark: SparkSession, dir: String): DataFrame =
    Experiment.abLift(Tables(spark, dir, "events"))

  /** Packing-efficiency report for the q56 stream cut (same
    * PackShards/PackSeqLen as the q56 registration). */
  def packingEfficiency(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.packingEfficiency(Tables(spark, dir, "documents"),
      PackShards, PackSeqLen)

  /** q138's sketch twin: exact schema profile + HLL-within-bound
    * verdict (the q37 checked pattern). */
  def propsSchemaApprox(spark: SparkSession, dir: String): DataFrame =
    Profile.propsSchemaApproxChecked(Tables(spark, dir, "events"))

  // mid-fixture experiment start: pre-period = before, post = after
  val CupedSplitDate = "2024-01-16"

  /** CUPED variance-reduced per-arm spend means. */
  def cupedLift(spark: SparkSession, dir: String): DataFrame =
    Experiment.cupedLift(Tables(spark, dir, "events"), CupedSplitDate)

  // p90 so the cap binds at fixture scale (p99 of a small user count
  // degenerates to the max and the capped branch never executes)
  val WinsorBp = 9000L

  /** Winsorized per-arm spend means (pooled p90 cap). */
  def winsorizedLift(spark: SparkSession, dir: String): DataFrame =
    Experiment.winsorizedLift(Tables(spark, dir, "events"), WinsorBp)

  /** FK orphan audit over the star schema + the behavioral edge
    * (events.user_id→customer exercises the nonzero-orphan branch;
    * the TPC-H edges pin the zero case). */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame =
    Integrity.refIntegrity(Seq(
      Integrity.Edge("lineitem_orders",
        Tables(spark, dir, "lineitem"), "l_orderkey",
        Tables(spark, dir, "orders"), "o_orderkey"),
      Integrity.Edge("orders_customer",
        Tables(spark, dir, "orders"), "o_custkey",
        Tables(spark, dir, "customer"), "c_custkey"),
      Integrity.Edge("events_customer",
        Tables(spark, dir, "events"), "user_id",
        Tables(spark, dir, "customer"), "c_custkey")))

  /** click→purchase conversion-delay quantile panel. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame =
    Integrity.timeToConvert(Tables(spark, dir, "events"),
      ranksBp = QuantileRanks)

  /** Fan-out forecast for the many-to-many behavioral join
    * (events.user_id × orders.o_custkey). */
  def joinFanout(spark: SparkSession, dir: String): DataFrame =
    Integrity.joinFanout(Tables(spark, dir, "events"), "user_id",
      Tables(spark, dir, "orders"), "o_custkey")

  val DriftCols = Seq("event_type", "props", "value", "user_id")

  /** Column-level null/cardinality drift across the q109 split. */
  def profileDrift(spark: SparkSession, dir: String): DataFrame =
    Profile.profileDrift(Tables(spark, dir, "events"), "ts",
      DriftSplitDate, DriftCols)

  /** Triangle census over the q93 co-visit graph (same min support —
    * the clustering-coefficient health check beside PageRank). */
  def triangleStats(spark: SparkSession, dir: String): DataFrame =
    Graph.triangleStats(sharedCoVisPairs(spark, dir), PageRankMinSupport)

  /** MRR@k of the q25 LSH ANN vs the exact top-1 (q100's rank twin). */
  def annMrr(spark: SparkSession, dir: String): DataFrame =
    Similarity.annMrr(Tables(spark, dir, "embeddings"), knnQueryPred,
      AnnRecallK, quant0 = Some(sharedAnnIndex(spark, dir)))

  val DecayHalfLifeDays = 7
  val DecayTopK = 20

  /** Dyadic-half-life trending items, anchored at the RFM date. */
  def decayedPopularity(spark: SparkSession, dir: String): DataFrame =
    Market.decayedPopularity(Tables(spark, dir, "events"), RfmAnchor,
      DecayHalfLifeDays, DecayTopK)

  /** Inverse-Simpson shuffle-balance scores for the workload's three
    * big join keys (q155's parallelism complement). */
  def keyBalance(spark: SparkSession, dir: String): DataFrame =
    Integrity.keyBalance(Seq(
      ("events_user_id", Tables(spark, dir, "events"), "user_id"),
      ("orders_custkey", Tables(spark, dir, "orders"), "o_custkey"),
      ("lineitem_orderkey", Tables(spark, dir, "lineitem"), "l_orderkey")))

  val Q3Segment = "BUILDING"
  val Q3Cutoff = "1998-01-01"
  val Q3TopK = 10

  /** TPC-H Q3 shape: top unshipped revenue for one market segment. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.shippingPriority(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Q3Segment, Q3Cutoff, Q3TopK)

  /** Session entry/exit/bounce rates by event type. */
  def entryExit(spark: SparkSession, dir: String): DataFrame =
    Sessionize.entryExit(Tables(spark, dir, "events"))

  val ReconToleranceBp = 100L

  /** Header-vs-lines money reconciliation (1% tolerance). */
  def orderReconciliation(spark: SparkSession, dir: String): DataFrame =
    Integrity.orderReconciliation(Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"), ReconToleranceBp)

  val LiftTopK = 20
  // support floor 2 at the test SF (the sf0.01 pair histogram is
  // 421/21/1 at support 1/2/3 — floor 3 leaves a 1-row report);
  // production would raise it with the session volume
  val LiftMinPair = 2L

  /** Basket association rules ranked by lift (support floor 2). */
  def associationRules(spark: SparkSession, dir: String): DataFrame =
    Market.associationRules(Tables(spark, dir, "events"), LiftTopK,
      LiftMinPair, CoVisitMaxItems)

  /** Token-length quantile panel per source (q139's table over doc
    * lengths; value_cents = token count × 100 fixed point). */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Percentiles.quantileTable(
      Tables(spark, dir, "documents").filter(col("text").isNotNull)
        .select(col("source"),
          size(expr(TextAnalysis.TokensExpr)).cast("long").as("tok_len")),
      "source", "tok_len", QuantileRanks)

  /** q69-score vs q18-heuristic reliability table. */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.classifierCalibration(Tables(spark, dir, "documents"))

  /** user_id identity churn across the q109/q156 snapshot split. */
  def keyChurn(spark: SparkSession, dir: String): DataFrame =
    Profile.keyChurn(Tables(spark, dir, "events"), "user_id", "ts",
      DriftSplitDate)

  /** q116's windowed funnel split by the q147 A/B arms. */
  def funnelByArm(spark: SparkSession, dir: String): DataFrame =
    PageFunnel.windowedFunnelByArm(spark,
      Sessionize.assignSessions(Tables(spark, dir, "events")),
      orderedFlow, FunnelWindowSeconds)

  /** Ordered (a THEN b) 2-sequences over session baskets. */
  def sequentialRules(spark: SparkSession, dir: String): DataFrame =
    Market.sequentialRules(Tables(spark, dir, "events"), LiftTopK,
      CoVisitMaxItems)

  /** TPC-H Q10 shape: top returned-revenue customers, 1996. */
  def returnedRevenue(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.returnedRevenue(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Q5YearFrom, Q5YearUntil)

  val HhiMinRows = 8L
  val HhiTopK = 20

  /** Per-part supplier-concentration HHI (top-k most concentrated). */
  def partConcentration(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.partConcentration(Tables(spark, dir, "lineitem"),
      HhiMinRows, HhiTopK)

  val PromoType = "PROMO"

  /** TPC-H Q14 shape: promo revenue share per ship month. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.promoRevenue(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), PromoType)

  /** TPC-H Q8 shape: supplier-nation share of ASIA's demand by year. */
  def marketShare(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.marketShare(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region"), Q5Region)

  // (brand, sizeLo, sizeHi, qtyLo, qtyHi), bounds inclusive
  val Q19Brackets: Seq[(String, Int, Int, Int, Int)] = Seq(
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 10, 30, 10, 35),
    ("Brand#3", 20, 50, 20, 50))

  /** TPC-H Q19 shape: disjunctive bracket revenue. */
  def bracketRevenue(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.disjunctiveRevenue(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), Q19Brackets)

  val IdleSince = "2000-01-01"

  /** TPC-H Q22 shape: rich customers with no recent orders, by nation. */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.idleCustomers(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "nation"), IdleSince)

  /** Exact Gini + top-decile share of events per user. */
  def engagementGini(spark: SparkSession, dir: String): DataFrame =
    Profile.engagementInequality(Tables(spark, dir, "events"), "user_id")

  /** Time-split backtest of the majority next-item predictor. */
  def nextItemBacktest(spark: SparkSession, dir: String): DataFrame =
    Market.nextItemBacktest(Tables(spark, dir, "events"), DriftSplitDate)

  val DedupSweepBp: Seq[Long] = Seq(5000L, 6000L, 7000L, 8000L, 9000L, 10000L)

  /** Dedup threshold sensitivity curve over the q22 pair machinery. */
  def dedupThresholdCurve(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupThresholdCurve(Tables(spark, dir, "documents"), DedupSweepBp)

  val Q15From = "1996-01-01"
  val Q15Until = "1996-04-01"

  /** TPC-H Q15 shape: the quarter's top supplier(s), ties kept. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.topSupplier(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "supplier"), Q15From, Q15Until)

  /** TPC-H Q17 shape: revenue from below-1/5-of-part-average orders. */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.smallQuantityRevenue(Tables(spark, dir, "lineitem"))

  val Q18MinQty = 150L
  val Q18TopK = 20

  /** TPC-H Q18 shape: top bulk orders by total quantity. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.largeOrders(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Q18MinQty, Q18TopK)

  /** Dedup-cluster-size × q18-quality interaction profile. */
  def clusterQualityProfile(spark: SparkSession, dir: String): DataFrame =
    Clustering.clusterQualityProfileFrom(sharedAssignments(spark, dir),
      TextAnalysis.textQuality(Tables(spark, dir, "documents")))

  /** Calendar-month revenue seasonality index. */
  def revenueSeasonality(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueSeasonality(Tables(spark, dir, "orders"))

  /** Inter-purchase interval quantile panel per market segment. */
  def orderGapQuantiles(spark: SparkSession, dir: String): DataFrame =
    Retention.orderGapQuantiles(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), QuantileRanks)

  val ParetoTargetBp = 8000L

  /** Minimal customers covering 80% of revenue (exact Pareto point). */
  def paretoCoverage(spark: SparkSession, dir: String): DataFrame =
    Profile.paretoCoverage(Tables(spark, dir, "orders"), ParetoTargetBp)

  /** Year-over-year monthly revenue growth (strict year−1 pairing). */
  def yoyMonthlyGrowth(spark: SparkSession, dir: String): DataFrame =
    Retention.yoyMonthlyGrowth(Tables(spark, dir, "orders"))

  /** Order-priority mix by year with the YoY share movement. */
  def priorityMixShift(spark: SparkSession, dir: String): DataFrame =
    Retention.priorityMixShift(Tables(spark, dir, "orders"))

  /** Nation revenue league table with YoY rank movement. */
  def nationRankMovers(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.nationRankMovers(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"))

  /** Discount-band effectiveness curve. */
  def discountBands(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.discountBands(Tables(spark, dir, "lineitem"))

  val Q4From = "1996-07-01"
  val Q4Until = "1996-10-01"
  val Q4GraceDays = 60

  /** TPC-H Q4 shape: priority counts of quarter orders with a line
    * shipped >60 days after ordering (EXISTS semi-join). */
  def latePriorityCounts(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.latePriorityCounts(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Q4From, Q4Until, Q4GraceDays)

  val Q6From = "1996-01-01"
  val Q6Until = "1997-01-01"

  /** TPC-H Q6 shape: one-row discount-revenue forecast. */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.revenueForecast(Tables(spark, dir, "lineitem"),
      Q6From, Q6Until)

  val Q7NationA = "NATION_1"
  val Q7NationB = "NATION_2"
  val Q7From = "1996-01-01"
  val Q7Until = "1998-01-01"

  /** TPC-H Q7 shape: bilateral nation trade volume by ship year. */
  def nationVolume(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.nationVolume(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Q7NationA, Q7NationB, Q7From, Q7Until)

  /** TPC-H Q12 shape: high/low priority line counts per return flag. */
  def priorityLineCounts(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.priorityLineCounts(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Q6From, Q6Until)

  /** TPC-H Q13 shape: order-count distribution incl. zero-order
    * customers. */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.customerOrderDistribution(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"))

  val Q21GraceDays = 45
  val Q21TopK = 25

  /** TPC-H Q21 shape: suppliers who alone kept multi-supplier orders
    * waiting. */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.waitingSuppliers(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "supplier"),
      Q21GraceDays, Q21TopK)

  val Q2Region = "ASIA"
  val Q2Sizes = Seq(5, 11, 23, 37, 44)
  val Q2Type = "STANDARD"
  val Q2TopK = 100

  /** TPC-H Q2 shape: min-unit-price supplier per filtered part in one
    * region (correlated MIN rewritten as a part-grain window min). */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.minCostSupplier(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), Tables(spark, dir, "supplier"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "region"),
      Q2Region, Q2Sizes, Q2Type, Q2TopK)

  val Q9NameToken = "red"

  /** TPC-H Q9 shape: nation×year profit with the dyadic
    * retailprice·qty/2 supply-cost proxy. */
  def productProfit(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.productProfit(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "part"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Q9NameToken)

  val Q11Nation = "NATION_3"

  /** TPC-H Q11 shape: parts above a dyadic 1/1024 share of one
    * nation's shipped value (pure-BIGINT threshold compare). */
  def importantParts(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.importantParts(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Q11Nation)

  val Q16ExcludeBrand = "Brand#13"
  val Q16ExcludeType = "PROMO"
  val Q16Sizes = Seq(2, 7, 14, 21, 28, 35, 42, 49)

  /** TPC-H Q16 shape: distinct-supplier counts per part profile with
    * brand/type/flagged-supplier exclusions. */
  def partSupplierCounts(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.partSupplierCounts(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"), Tables(spark, dir, "supplier"),
      Q16ExcludeBrand, Q16ExcludeType, Q16Sizes)

  val Q20Nation = "NATION_5"

  /** TPC-H Q20 shape: one nation's suppliers holding >half of a
    * part-year's shipped quantity. */
  def excessSuppliers(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.excessSuppliers(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "supplier"), Tables(spark, dir, "nation"),
      Q20Nation)

  val BfsMaxHops = 3

  /** Bounded BFS from the co-visit hub over the q93 graph: min-hop
    * reach within 3 hops of the highest-degree item. */
  def bfsReach(spark: SparkSession, dir: String): DataFrame =
    Graph.bfsReach(
      Graph.symmetric(sharedCoVisPairs(spark, dir), PageRankMinSupport),
      BfsMaxHops)

  /** Per-(year, month) revenue indexed against the same calendar
    * month's cross-year mean. */
  def seasonalDeviation(spark: SparkSession, dir: String): DataFrame =
    Retention.seasonalDeviation(Tables(spark, dir, "orders"))

  /** Per-source data card: volume, hygiene, breadth in one frame. */
  def sourceDatacard(spark: SparkSession, dir: String): DataFrame =
    Profile.sourceDatacard(Tables(spark, dir, "documents"))

  /** Interval-overlap join: sessions live during q88's anomalous
    * days (broadcast theta-join — the day dim is calendar-bounded). */
  def anomalySessions(spark: SparkSession, dir: String): DataFrame =
    Retention.anomalySessionOverlap(Tables(spark, dir, "events"),
      AnomalyWindowDays, AnomalyK2, AnomalyMinObs)

  val ZorderGridBits = 16
  val ZorderCellBits = 6

  /** The q200 cell table as a shared model artifact (the layout's
    * index metadata — q200 publishes it, q240 prunes against it). */
  private def sharedZorderCells(spark: SparkSession, dir: String): DataFrame =
    Shared.memo(spark, s"zorder_cells:$dir")(
      Layout.zorderCells(Tables(spark, dir, "lineitem"),
        "l_partkey", "l_suppkey", ZorderGridBits, ZorderCellBits))

  /** Z-order layout audit of lineitem on (l_partkey, l_suppkey). */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame =
    sharedZorderCells(spark, dir)

  val PruneProbes = 16

  /** Zone-map pruning audit over the q200 layout: per equal-width
    * range probe, cells a min/max reader must scan vs rows actually
    * selected (shared cell table — one build serves both queries). */
  def pruningAudit(spark: SparkSession, dir: String): DataFrame =
    Layout.pruningAudit(Tables(spark, dir, "lineitem"),
      "l_partkey", "l_suppkey", ZorderGridBits, ZorderCellBits, PruneProbes,
      cells0 = Some(sharedZorderCells(spark, dir)))

  /** Component-size census of the q93 co-visit graph (shared pairs;
    * the same CC machinery as the near-dup clusters). */
  def coVisComponents(spark: SparkSession, dir: String): DataFrame =
    Graph.componentSizes(sharedCoVisPairs(spark, dir), PageRankMinSupport)

  val KnockoutKs = Seq(0, 1, 2, 5, 10)

  /** Hub-knockout robustness: giant-component census after removing
    * the top-k degree hubs from the shared co-vis graph. */
  def hubKnockout(spark: SparkSession, dir: String): DataFrame =
    Graph.hubKnockout(sharedCoVisPairs(spark, dir), KnockoutKs,
      PageRankMinSupport)

  val NewsvendorServiceBp = 9500L

  /** Newsvendor service-level weekly stock per part: implicit-zero
    * nearest-rank quantile (no part×week spine) + safety margin. */
  def newsvendorStock(spark: SparkSession, dir: String): DataFrame =
    Market.newsvendorStock(Tables(spark, dir, "lineitem"),
      NewsvendorServiceBp)

  /** Declared filters for the join-order audit: a selective order
    * priority against a selective size band — the regime where the
    * first-join choice actually matters. */
  val JoinOrderOrdersPred = "o_orderpriority = '1-URGENT'"
  val JoinOrderPartPred = "p_size <= 10"

  /** Join-order planner audit: System-R intermediate estimates vs
    * true key-grain sizes, and whether the estimate picks the truly
    * smaller first join. */
  def joinOrderAudit(spark: SparkSession, dir: String): DataFrame =
    Profile.joinOrderAudit(
      Tables(spark, dir, "orders").filter(expr(JoinOrderOrdersPred)),
      Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part").filter(expr(JoinOrderPartPred)))

  /** Monthly p50/p90 fulfillment-latency panel + Theil–Sen trend of
    * the monthly p90 (milli-days/month). */
  def latencySlaTrend(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.latencySlaTrend(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"))

  val SepSampleMod = 5L

  /** Threshold-free embedding separability: exact midrank AUC of
    * pairwise cosine as a same-label classifier (capped sample). */
  def separabilityAuc(spark: SparkSession, dir: String): DataFrame =
    Similarity.separabilityAuc(Tables(spark, dir, "embeddings"),
      SepSampleMod, quant0 = Some(sharedAnnIndex(spark, dir)))

  val PostStrata = 4

  /** Post-stratified A/B lift on user spend, stratified by activity
    * quartile — the stratification sibling of q151's CUPED. */
  def postStratifiedLift(spark: SparkSession, dir: String): DataFrame =
    Experiment.postStratifiedLift(Tables(spark, dir, "events"),
      nStrata = PostStrata)

  val DidWindowMonths = 6

  /** ABC–XYZ census: revenue-Pareto class × weekly-demand
    * variability class over the part catalog. */
  def abcXyz(spark: SparkSession, dir: String): DataFrame =
    Market.abcXyz(Tables(spark, dir, "lineitem"))

  /** Cross-source bigram-LM transfer matrix: eval bits/token under
    * each train source's model — the domain-mixture read. */
  def sourceTransferMatrix(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceTransferMatrix(Tables(spark, dir, "documents"))

  /** Simplified (centroid) silhouette of the q52 k-means fit:
    * per-cluster cohesion/separation + misassignment count. */
  def silhouette(spark: SparkSession, dir: String): DataFrame =
    KMeans.silhouette(Tables(spark, dir, "embeddings"),
      KmeansK, KmeansIters)

  /** Props key drift across the q109 split date: presence-rate
    * before/after per key + new/dropped verdicts. */
  def propsKeyDrift(spark: SparkSession, dir: String): DataFrame =
    Profile.propsKeyDrift(Tables(spark, dir, "events"), DriftSplitDate)

  val TriangleMaxAge = 6

  /** Revenue cohort triangle: per-capita revenue by first-order
    * cohort × months-of-age, benchmarked to each cohort's age 0. */
  def revenueCohortTriangle(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueCohortTriangle(Tables(spark, dir, "orders"),
      TriangleMaxAge)

  /** Event-study DiD: per-month treated−control gaps around the q282
    * rollout, normalized to rel −1 (pre rows = parallel-trends
    * diagnostic). */
  def didEventStudy(spark: SparkSession, dir: String): DataFrame =
    Experiment.didEventStudy(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region"), maxWindow = DidWindowMonths)

  val TripleMaxItems = 16
  val TripleMinSupport = 5L
  val TripleTopK = 20

  /** Frequent item triples over capped user-lifetime baskets. */
  def tripleItemsets(spark: SparkSession, dir: String): DataFrame =
    Market.tripleItemsets(Tables(spark, dir, "events"),
      TripleTopK, TripleMinSupport, TripleMaxItems)

  val EquiDepthBins = 10

  /** Exact equi-depth histogram of lineitem price cents. */
  def equiDepthHistogram(spark: SparkSession, dir: String): DataFrame =
    Percentiles.equiDepthBins(
      Tables(spark, dir, "lineitem").select(
        floor(col("l_extendedprice") * lit(100.0)).cast("long").as("cents")),
      "cents", EquiDepthBins)

  val NeymanBudget = 1000L

  /** Neyman-optimal sample allocation across order priorities. */
  def neymanAllocation(spark: SparkSession, dir: String): DataFrame =
    StratifiedExtract.neymanAllocation(
      Tables(spark, dir, "orders").select(col("o_orderpriority"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents")),
      "o_orderpriority", "cents", NeymanBudget)

  /** The fixture's events end Jan 30; split at Jan 20 leaves a
    * ~10-day label horizon (explicit anchors, the RfmAnchor rule). */
  val ChurnSplitDate = "2024-01-20"
  val ChurnHorizonDays = 11

  /** User-grain churn feature/label table (time-split, no leakage). */
  def churnFeatures(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.churnFeatures(Tables(spark, dir, "events"),
      ChurnSplitDate, ChurnHorizonDays)

  val GainsBins = 10

  /** Cumulative gains table: pre-split activity as the score,
    * return-in-horizon as the converter label. */
  def gainsTable(spark: SparkSession, dir: String): DataFrame =
    Experiment.gainsTable(churnFeatures(spark, dir),
      "n_events", "label", GainsBins)

  val TheilSenLastDays = 365

  /** Theil–Sen robust trailing-year revenue trend (one-row report). */
  def theilSenTrend(spark: SparkSession, dir: String): DataFrame =
    Retention.theilSenTrend(Tables(spark, dir, "orders"), TheilSenLastDays)

  val RobustAnomalyK = 5L

  /** Median/MAD robust volume anomaly (q88's modified-z twin). */
  def robustVolumeAnomaly(spark: SparkSession, dir: String): DataFrame =
    Retention.robustVolumeAnomaly(Tables(spark, dir, "events"),
      AnomalyWindowDays, RobustAnomalyK, AnomalyMinObs)

  /** Order→ship latency quantile panel per priority (SLA readout). */
  def fulfillmentLatency(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.fulfillmentLatency(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"), QuantileRanks)

  /** Daily new-vs-returning user growth accounting panel. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame =
    Retention.growthAccounting(Tables(spark, dir, "events"))

  val AcfMaxLag = 14

  /** Lag-1..14 autocorrelation of daily revenue (seasonality scan). */
  def revenueAcf(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueAcf(Tables(spark, dir, "orders"), AcfMaxLag)

  val CusumSlackBp = 2000L
  val CusumHMeanDays = 3L

  /** CUSUM sequential change-point monitor over daily revenue. */
  def cusumRevenue(spark: SparkSession, dir: String): DataFrame =
    Retention.cusumRevenue(Tables(spark, dir, "orders"),
      CusumSlackBp, CusumHMeanDays)

  /** Benford first-digit audit of order amounts (in cents). */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame =
    Profile.benfordAudit(
      Tables(spark, dir, "orders").select(
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents")),
      "cents")

  val AnonK = 5L
  val DiversityL = 3L

  /** Customer quasi-identifier frame: nation, segment, balance band —
    * the columns a "scrubbed" export would plausibly keep. */
  private def customerQi(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(
      col("c_nationkey").as("nation"), col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / lit(1000.0)).cast("long").as("balance_band"))

  /** K-anonymity risk histogram over the customer QI frame. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Profile.kAnonymityProfile(customerQi(spark, dir),
      Seq("nation", "segment", "balance_band"), AnonK)

  /** L-diversity risk histogram: segment as the sensitive attribute
    * inside (nation, balance_band) groups. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    Profile.lDiversityProfile(customerQi(spark, dir),
      Seq("nation", "balance_band"), "segment", DiversityL)

  /** Seasonal-naive forecast backtest (MAE + weighted MAPE). */
  def seasonalBacktest(spark: SparkSession, dir: String): DataFrame =
    Retention.seasonalBacktest(Tables(spark, dir, "orders"))

  /** OLS quantity-on-discount slope (classical elasticity read). */
  def discountElasticity(spark: SparkSession, dir: String): DataFrame =
    AreaTopProducts.discountElasticity(Tables(spark, dir, "lineitem"))

  /** Day-of-week × event-type independence lift heatmap. */
  def dowTypeLift(spark: SparkSession, dir: String): DataFrame =
    Retention.dowTypeLift(Tables(spark, dir, "events"))

  /** Kendall τ-a between daily order count and daily revenue. */
  def kendallDaily(spark: SparkSession, dir: String): DataFrame =
    Retention.kendallDaily(Tables(spark, dir, "orders"))

  val LifecycleNewDays = 7
  val LifecycleActiveDays = 7
  val LifecycleChurnDays = 14

  /** Mid-fixture anchor (events span January): a stage census at the
    * period END degenerates to one bucket; the operational read is
    * taken DURING the period. */
  val LifecycleAnchor = "2024-01-25"

  /** User lifecycle census at the mid-January anchor. */
  def lifecycleCensus(spark: SparkSession, dir: String): DataFrame =
    Retention.lifecycleCensus(Tables(spark, dir, "events"), LifecycleAnchor,
      LifecycleNewDays, LifecycleActiveDays, LifecycleChurnDays)

  val SkipGramWindow = 2
  val SkipGramTopK = 50
  val SkipGramMinCount = 2L

  /** Skip-gram item co-occurrence pairs (embedding-training input). */
  def skipGramPairs(spark: SparkSession, dir: String): DataFrame =
    Market.skipGramPairs(Tables(spark, dir, "events"), SkipGramWindow,
      SkipGramTopK, SkipGramMinCount)

  val ReplenishMinIntervals = 3L

  /** Per-item replenishment cadence (median repurchase gap). */
  def replenishmentCycle(spark: SparkSession, dir: String): DataFrame =
    Market.replenishmentCycle(Tables(spark, dir, "events"),
      ReplenishMinIntervals)

  /** Co-vis recommender coverage over the shared pair frame. */
  def recsysCoverage(spark: SparkSession, dir: String): DataFrame =
    Market.recsysCoverage(Tables(spark, dir, "events"),
      sharedCoVisPairs(spark, dir), PageRankMinSupport)

  /** Yearly revenue growth decomposed into volume × AOV effects. */
  def growthDecomposition(spark: SparkSession, dir: String): DataFrame =
    Retention.growthDecomposition(Tables(spark, dir, "orders"))

  /** Lines-per-order histogram with order and revenue shares. */
  def orderComposition(spark: SparkSession, dir: String): DataFrame =
    Retention.orderComposition(Tables(spark, dir, "lineitem"))

  /** Symmetric WEIGHTED co-vis edges (pair_sessions as strength). */
  private def weightedCoVisEdges(spark: SparkSession, dir: String): DataFrame = {
    val p = sharedCoVisPairs(spark, dir)
      .filter(col("pair_sessions") >= PageRankMinSupport)
    p.select(col("item_a").as("src"), col("item_b").as("dst"),
        col("pair_sessions").as("w"))
      .union(p.select(col("item_b").as("src"), col("item_a").as("dst"),
        col("pair_sessions").as("w")))
  }

  /** Weighted PageRank top-20 over the co-vis graph. */
  def pageRankWeighted(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRankWeighted(weightedCoVisEdges(spark, dir), PageRankIters)
      .orderBy(col("rank").desc, col("item").asc).limit(PageRankK)

  /** Personalized PageRank (similar-to-hub scores), top-20. */
  def personalizedPageRank(spark: SparkSession, dir: String): DataFrame =
    Graph.personalizedPageRank(
        Graph.symmetric(sharedCoVisPairs(spark, dir), PageRankMinSupport),
        PageRankIters)
      .orderBy(col("rank").desc, col("item").asc).limit(PageRankK)

  /** Degree assortativity of the co-vis graph (one row). */
  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame =
    Graph.degreeAssortativity(sharedCoVisPairs(spark, dir),
      PageRankMinSupport)

  val KnownItemMod = 10L
  val KnownItemTokens = 3
  val KnownItemK = 10
  val KnownItemMaxQueries = 200

  /** The known-item eval's shared outcome frame (ops.Shared
    * contract): the expensive BM25 ranking pass runs once; q229's
    * found/MRR summary and q266's nDCG are both rollups of this
    * probe-set-grain (query_id, rank-or-null) artifact. */
  private def sharedKnownItemOutcomes(spark: SparkSession,
      dir: String): DataFrame =
    Shared.memo(spark, s"bm25_outcomes:$dir")(
      Retrieval.bm25KnownItemOutcomes(Tables(spark, dir, "documents"),
        KnownItemMod, KnownItemTokens, KnownItemK, KnownItemMaxQueries))

  /** BM25 known-item retrieval eval (found@k + MRR@k). */
  def bm25KnownItem(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25KnownItem(Tables(spark, dir, "documents"),
      KnownItemMod, KnownItemTokens, KnownItemK, KnownItemMaxQueries,
      outcomes0 = Some(sharedKnownItemOutcomes(spark, dir)))

  /** nDCG@k over the same known-item outcomes (shared artifact). */
  def bm25Ndcg(spark: SparkSession, dir: String): DataFrame =
    Retrieval.bm25Ndcg(Tables(spark, dir, "documents"),
      KnownItemMod, KnownItemTokens, KnownItemK, KnownItemMaxQueries,
      outcomes0 = Some(sharedKnownItemOutcomes(spark, dir)))

  val MarkovSplitDate = "2024-01-16"

  /** Time-split top-1 next-event prediction accuracy of the q91
    * transition matrix. */
  def markovEval(spark: SparkSession, dir: String): DataFrame =
    Market.markovEval(Tables(spark, dir, "events"), MarkovSplitDate)

  val ParetoTiers = 10

  /** Customer revenue concentration: Lorenz tiers + exact Gini. */
  def revenuePareto(spark: SparkSession, dir: String): DataFrame =
    Retention.revenuePareto(Tables(spark, dir, "orders"), ParetoTiers)

  /** Exact rank-formula ROC-AUC: does activity predict conversion. */
  def engagementAuc(spark: SparkSession, dir: String): DataFrame =
    Experiment.engagementAuc(Tables(spark, dir, "events"))

  val PivotYear = 1997

  /** Quarterly revenue pivot by nation (declared-domain pivot). */
  def quarterlyPivot(spark: SparkSession, dir: String): DataFrame =
    Retention.quarterlyPivot(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      PivotYear)

  /** The pivot melted back to long via Dataset.unpivot. */
  def quarterlyLong(spark: SparkSession, dir: String): DataFrame =
    Retention.quarterlyLong(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      PivotYear)

  val EwmaWindowDays = 16

  /** Dyadic-decay EWMA revenue panel + spike score. */
  def ewmaRevenue(spark: SparkSession, dir: String): DataFrame =
    Retention.ewmaRevenue(Tables(spark, dir, "orders"), EwmaWindowDays)

  /** Cohen's κ between the heuristic and classifier quality gates. */
  def signalKappa(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.signalKappa(Tables(spark, dir, "documents"))

  /** Pearson χ² independence test on the arm × converted table. */
  def chiSquareLift(spark: SparkSession, dir: String): DataFrame =
    Experiment.chiSquareLift(Tables(spark, dir, "events"))

  /** Per-type quantile-normalization mapping for event value. */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.quantileNormalize(Tables(spark, dir, "events"))

  /** RRF ensemble of the LSH + IVF indexes, graded vs exact truth. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    Similarity.rrfFusion(Tables(spark, dir, "embeddings"), knnQueryPred,
      AnnRecallK, quant0 = Some(sharedAnnIndex(spark, dir)),
      cents0 = Some(sharedIvfCentroids(spark, dir)))

  val KcoreK = 3
  val KcoreIters = 4

  /** k-core of the co-visitation graph by bounded peeling. */
  def kcore(spark: SparkSession, dir: String): DataFrame =
    Graph.kcore(sharedCoVisPairs(spark, dir), KcoreK, KcoreIters,
      PageRankMinSupport)

  /** Variance-to-mean dispersion of daily counts per event type. */
  def burstiness(spark: SparkSession, dir: String): DataFrame =
    Retention.burstiness(Tables(spark, dir, "events"))

  val BloomCellBits = 6
  val BloomMBits = 131072L
  val BloomProbes = 16

  /** Bloom-vs-zone-map point-lookup pruning audit on lineitem laid
    * out by partkey, probed on orderkey. */
  def bloomPruningAudit(spark: SparkSession, dir: String): DataFrame =
    Layout.bloomPruningAudit(Tables(spark, dir, "lineitem"),
      "l_partkey", "l_orderkey", BloomCellBits, BloomMBits, BloomProbes)

  val CovisBacktestK = 5

  /** Hit-rate@k backtest of the co-visitation recommender shelf. */
  def covisBacktest(spark: SparkSession, dir: String): DataFrame =
    Market.covisBacktest(Tables(spark, dir, "events"), DriftSplitDate,
      CovisBacktestK, CoVisitMaxItems)

  /** Token frequency spectrum (the sort-free Zipf read). */
  def tokenSpectrum(spark: SparkSession, dir: String): DataFrame =
    Retrieval.tokenSpectrum(Tables(spark, dir, "documents"))

  val AbsorbTarget = "purchase"
  val AbsorbSteps = 5

  /** 5-step purchase-absorption probability per start type. */
  def absorptionProbability(spark: SparkSession, dir: String): DataFrame =
    Market.absorptionProbability(Tables(spark, dir, "events"),
      AbsorbTarget, AbsorbSteps)

  val HazardMaxOffset = 14

  /** Signup→purchase discrete hazard table with right-censoring. */
  def conversionHazard(spark: SparkSession, dir: String): DataFrame =
    Retention.conversionHazard(Tables(spark, dir, "events"),
      "signup", "purchase", HazardMaxOffset)

  val AudienceTopK = 10

  /** Audience-overlap Jaccard matrix for the top items. */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame =
    Market.audienceOverlap(Tables(spark, dir, "events"), AudienceTopK)

  /** MinHash signature calibration vs exact Jaccard. */
  def minhashCalibration(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCalibration(Tables(spark, dir, "documents"))

  /** Open-order backlog: interval counting on ± deltas at order
    * grain. */
  def orderBacklog(spark: SparkSession, dir: String): DataFrame =
    Retention.orderBacklog(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"))

  val DocKeywordsK = 3

  /** Per-document top-k keywords by tf · ⌊log₂(N/df)⌋. */
  def docKeywords(spark: SparkSession, dir: String): DataFrame =
    Retrieval.docKeywords(Tables(spark, dir, "documents"), DocKeywordsK)

  /** Degree-banded local clustering coefficients of the co-visit
    * graph (shared pair frame, q93's support threshold). */
  def clusteringCoefficient(spark: SparkSession, dir: String): DataFrame =
    Graph.clusteringCoefficient(sharedCoVisPairs(spark, dir),
      PageRankMinSupport)

  /** Grouping-sets margins over orders: both 1-D margins + grand
    * total without the cross product. */
  def groupingSetsTotals(spark: SparkSession, dir: String): DataFrame =
    Percentiles.groupingSetsTotals(Tables(spark, dir, "orders"),
      "o_orderpriority", "o_orderstatus", "o_totalprice")

  val BridgeYear = 1997

  /** YoY revenue bridge by nation, one conditional-sum fact pass. */
  def revenueBridge(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueBridge(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      BridgeYear)

  /** Duplicate-order (double-payment) audit at multiplicity grain. */
  def duplicateOrders(spark: SparkSession, dir: String): DataFrame =
    Integrity.duplicateOrders(Tables(spark, dir, "orders"))

  val DispersionMinLines = 3L
  val DispersionTopK = 20

  /** Unit-price dispersion: top spread_bp parts. */
  def priceDispersion(spark: SparkSession, dir: String): DataFrame =
    Integrity.priceDispersion(Tables(spark, dir, "lineitem"),
      DispersionMinLines, DispersionTopK)

  /** Line-number contiguity audit (one summary row). */
  def linenumberAudit(spark: SparkSession, dir: String): DataFrame =
    Integrity.linenumberAudit(Tables(spark, dir, "lineitem"))

  val ZeroSalesMinSpan = 30L
  val ZeroSalesTopK = 20

  /** Per-part zero-sales-day share within its own active span. */
  def zeroSalesDays(spark: SparkSession, dir: String): DataFrame =
    Integrity.zeroSalesDays(Tables(spark, dir, "lineitem"),
      ZeroSalesMinSpan, ZeroSalesTopK)

  /** Exact-duplicate text matrix between sources. */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame =
    Integrity.crossSourceDups(Tables(spark, dir, "documents"))

  val TrailingWindowDays = 7

  /** Rolling 7-day revenue via a RANGE frame over day numbers. */
  def trailingRevenue(spark: SparkSession, dir: String): DataFrame =
    Retention.trailingRevenue(Tables(spark, dir, "orders"),
      TrailingWindowDays)

  val WeightedRanksBp = Seq(5000L, 9000L, 9900L)

  /** Quantity-weighted price quantiles per return flag. */
  def weightedPriceQuantiles(spark: SparkSession, dir: String): DataFrame =
    Percentiles.weightedQuantileTable(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice", "l_quantity", WeightedRanksBp)

  /** q76's sketch gate (q37 machinery): exact DAU/WAU + HLL-within-
    * bound verdict on the `activeUsers(exact = false)` path. */
  def activeUsersChecked(spark: SparkSession, dir: String): DataFrame =
    Retention.activeUsersChecked(Tables(spark, dir, "events"),
      ActiveWindowDays)

  /** q198's sketch gate: exact distinct texts/langs per source + HLL
    * verdicts on the `sourceDatacard(exact = false)` path. */
  def sourceDatacardChecked(spark: SparkSession, dir: String): DataFrame =
    Profile.sourceDatacardChecked(Tables(spark, dir, "documents"))

  val RollingWindows = Seq(7, 14, 28)

  /** Rolling 7/14/28-day active users from one set of mergeable
    * per-day HLL sketches (exact twins + verdicts keep it in the
    * oracle). */
  def rollingUsersSketch(spark: SparkSession, dir: String): DataFrame =
    Retention.rollingUsersSketch(Tables(spark, dir, "events"), RollingWindows)

  /** Region-rollout difference-in-differences on mean order value
    * (TREAT = ASIA, CTRL = AMERICA, cutoff 1998-01-01). */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame =
    Experiment.diffInDiff(Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "nation"),
      Tables(spark, dir, "region"))

  val SweepTimeouts = Seq(300L, 600L, 1800L, 3600L, 7200L)

  /** Session-timeout sensitivity sweep: sessions(T) for 5 candidate
    * gaps from ONE lag pass (sessions = users + gaps>T). */
  def timeoutSweep(spark: SparkSession, dir: String): DataFrame =
    Sessionize.timeoutSweep(Tables(spark, dir, "events"), SweepTimeouts)

  /** Per-source Flesch-proxy readability panel (integer milli-units,
    * vowel-run syllables). */
  def readability(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(Tables(spark, dir, "documents"))

  /** Add-one bigram-LM self-perplexity gate (CCNet-style), per
    * source; flags docs over 125% of the corpus mean bits/token. */
  def bigramPerplexity(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramPerplexity(Tables(spark, dir, "documents"))

  val AnisotropyDim = 64

  /** Embedding anisotropy: integer-exact variance share along the
    * mean direction vs the 1/d isotropy baseline. */
  def anisotropy(spark: SparkSession, dir: String): DataFrame =
    Similarity.anisotropy(Tables(spark, dir, "embeddings"), AnisotropyDim)

  /** Brown double-smoothing one-day-ahead revenue forecast backtest
    * (dyadic kernel, dense calendar spine, q272's window W). */
  def brownForecast(spark: SparkSession, dir: String): DataFrame =
    Retention.brownForecast(Tables(spark, dir, "orders"), EwmaWindowDays)

  val NegSampleK = 16

  /** Word2vec unigram^¾ negative-sampling table (top-16 + <REST>
    * rollup, exact nested-isqrt weights, inverse-CDF ppm columns). */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.negativeSampling(Tables(spark, dir, "documents"),
      NegSampleK)

  /** Poisson-bootstrap CI for the A/B conversion lift: 32 replicate
    * weights per user from one md5 map pass, empirical 2/32-31/32
    * interval + covers-zero verdict. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame =
    Experiment.bootstrapCi(Tables(spark, dir, "events"))

  /** Supplier Pareto frontier on mean unit cost vs mean ship delay
    * (sort-scan skyline over the supplier dimension). */
  def supplierSkyline(spark: SparkSession, dir: String): DataFrame =
    Market.supplierSkyline(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"))

  val QfWindowDays = 28
  val QfLevelsBp = Seq(5000L, 9000L)

  /** Trailing-quantile revenue forecast (p50/p90 over the preceding
    * 28 dense-spine days) + pinball-loss calibration backtest. */
  def quantileForecast(spark: SparkSession, dir: String): DataFrame =
    Retention.quantileForecast(Tables(spark, dir, "orders"),
      QfWindowDays, QfLevelsBp)

  /** Declared channel domain for Markov attribution (the q142
    * convention): the pivot types minus the conversion target. */
  val AttributionChannels: Seq[String] =
    PivotTypes.filterNot(_ == AbsorbTarget)

  /** Markov removal-effect attribution over the q231 absorption
    * walk: removal(c) = 1 - p_without_c / p, credits normalized. */
  def markovAttribution(spark: SparkSession, dir: String): DataFrame =
    Market.markovAttribution(Tables(spark, dir, "events"),
      AttributionChannels, AbsorbTarget, AbsorbSteps)

  /** Forecaster bake-off: Brown vs Brown × train-half dow index,
    * MAE/wMAPE on the eval half. */
  def seasonalBrownBacktest(spark: SparkSession, dir: String): DataFrame =
    Retention.seasonalBrownBacktest(Tables(spark, dir, "orders"),
      EwmaWindowDays)

  /** Position-based (U-shaped 40/20/40) attribution over the q124
    * sessions: per-touch bp credit by path position, channel grain. */
  def positionAttribution(spark: SparkSession, dir: String): DataFrame =
    Sessionize.positionAttribution(Tables(spark, dir, "events"))

  /** Mann-Whitney rank-sum test between the q147 arms on per-user
    * event counts (exact doubled-unit midranks; CLES effect size). */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame =
    Experiment.mannWhitney(Tables(spark, dir, "events"))

  /** Kolmogorov-Smirnov two-sample test between the q147 arms on
    * per-user event counts (cross-multiplied exact D, squared-bound
    * alpha=0.05 verdict). */
  def ksTest(spark: SparkSession, dir: String): DataFrame =
    Experiment.ksTest(Tables(spark, dir, "events"))

  /** Count-min sketch (4x256, md5-nibble rows) over corpus tokens:
    * exact top-20 tokens vs their CMS estimates + e*N/w bound. */
  def cmsCheck(spark: SparkSession, dir: String): DataFrame =
    CountMin.heavyHitterCheck(Tables(spark, dir, "documents"))

  /** SCD type-2 loyalty-tier history (thresholds 3/10/30 cumulative
    * purchases): one effective-dated version row per tier change. */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    Scd.tierHistory(Tables(spark, dir, "events"))

  /** Point-in-time revenue by loyalty tier: purchases as-of-joined to
    * the q297 version in force at their timestamp. */
  def scd2Revenue(spark: SparkSession, dir: String): DataFrame =
    Scd.revenueByTier(Tables(spark, dir, "events"))

  /** Conditional next-step entropy per current event type (floor-log2
    * surprisal bits over the q91 transition matrix). */
  def transitionEntropy(spark: SparkSession, dir: String): DataFrame =
    Market.transitionEntropy(Tables(spark, dir, "events"))

  val LpRounds = 4

  /** Weighted label-propagation community census over the shared
    * co-visitation graph (4 synchronous rounds, min-label ties). */
  def labelProp(spark: SparkSession, dir: String): DataFrame =
    Graph.labelProp(sharedCoVisPairs(spark, dir), LpRounds,
      PageRankMinSupport)

  val AutocorrLags = Seq(1, 7, 14, 28)

  /** Daily-revenue autocorrelation at the candidate seasonal lags
    * (dense spine, decimal cross-products, truncated integer ratio). */
  def autocorrelation(spark: SparkSession, dir: String): DataFrame =
    Retention.autocorrelation(Tables(spark, dir, "orders"), AutocorrLags)

  val PowerIters = 3

  /** Matrix-free power iteration: top principal direction's variance
    * share of the centered moment matrix (the q286 spectral upgrade). */
  def powerIteration(spark: SparkSession, dir: String): DataFrame =
    Similarity.powerIteration(Tables(spark, dir, "embeddings"),
      AnisotropyDim, PowerIters)

  /** Log-band quantile sketch vs the exact nearest-rank answer on
    * lineitem prices by returnflag (the mergeable-percentile swap). */
  def sketchQuantiles(spark: SparkSession, dir: String): DataFrame =
    Percentiles.sketchQuantileTable(Tables(spark, dir, "lineitem"),
      "l_returnflag", "l_extendedprice")

  val TrigramTopK = 20

  /** Top contiguous 3-step session paths with share of all 3-windows
    * (funnel discovery at event-type-cubed grain). */
  def pathTrigrams(spark: SparkSession, dir: String): DataFrame =
    Market.pathTrigrams(Tables(spark, dir, "events"), TrigramTopK)

  /** Month-end tier census: users per loyalty tier at every month-end
    * instant, read from the q297 type-2 history. */
  def scd2Census(spark: SparkSession, dir: String): DataFrame =
    Scd.monthEndCensus(Tables(spark, dir, "events"))

  /** System-R join-size estimate vs the true events⋈orders-on-user
    * cardinality, scored as q-error (the optimizer-stats audit). */
  def joinCardinality(spark: SparkSession, dir: String): DataFrame =
    Profile.joinCardinalityAudit(Tables(spark, dir, "events"),
      Tables(spark, dir, "orders"), "user_id", "o_custkey")

  /** Wald-Wolfowitz runs test on daily revenue moves (trend vs
    * oscillation vs random, exact squared-bound verdict). */
  def runsTest(spark: SparkSession, dir: String): DataFrame =
    Retention.runsTest(Tables(spark, dir, "orders"))

  /** Trailing 7-day MEDIAN of daily revenue (q257's robust twin). */
  def trailingMedianRevenue(spark: SparkSession, dir: String): DataFrame =
    Retention.trailingMedianRevenue(Tables(spark, dir, "orders"),
      TrailingWindowDays)

  val ZipfMaxRank = 64

  /** Zipf per-octave decay table over the corpus vocabulary. */
  def zipfDecay(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipfDecay(Tables(spark, dir, "documents"), ZipfMaxRank)

  val LinkPredK = 20

  /** Link-prediction scores (common-neighbor + Jaccard) for 2-hop
    * non-edges of the co-visit graph (shared pairs artifact). */
  def linkPrediction(spark: SparkSession, dir: String): DataFrame =
    Graph.linkPrediction(sharedCoVisPairs(spark, dir),
      PageRankMinSupport, LinkPredK)

  val BurstToleranceSec = 10L

  /** Tolerance-window event dedup report per event type. */
  def eventBurstDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.eventBurstDedup(Tables(spark, dir, "events"), BurstToleranceSec)

  /** Z-order vs single-column-sort pruning showdown on the q200
    * layout columns (shared Z cell artifact). */
  def layoutCompare(spark: SparkSession, dir: String): DataFrame =
    Layout.layoutCompare(Tables(spark, dir, "lineitem"),
      "l_partkey", "l_suppkey", ZorderGridBits, ZorderCellBits,
      PruneProbes, zcells0 = Some(sharedZorderCells(spark, dir)))

  val VocabCheckpoints = 4

  /** Heaps'-law vocabulary growth at doc-id quarter checkpoints. */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame =
    Retrieval.vocabGrowth(Tables(spark, dir, "documents"), VocabCheckpoints)

  val TClosenessBandBp = 1000L

  /** T-closeness risk histogram over the q214 QI classes with
    * segment as the sensitive attribute. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame =
    Profile.tClosenessProfile(customerQi(spark, dir),
      Seq("nation", "balance_band"), "segment", TClosenessBandBp)

  val LshPlannerTauBp = 8000L

  /** LSH banding planner: S-curve expected recall / false-collision
    * mass per (rows, bands) factorization on the observed pair
    * sample. */
  def lshPlanner(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshPlanner(Tables(spark, dir, "documents"), LshPlannerTauBp)

  /** Binary-segmentation single change point on daily revenue over
    * the dense day spine (exact integer between-segment SS argmax). */
  def changepoint(spark: SparkSession, dir: String): DataFrame =
    Retention.changepoint(Tables(spark, dir, "orders"))

  /** Calendar gap islands: each missing-day run in the order log
    * with bounds, length, and the revenue of the day before. */
  def gapIslands(spark: SparkSession, dir: String): DataFrame =
    Retention.gapIslands(Tables(spark, dir, "orders"))

  val PermutationReps = 200

  /** Deterministic md5-keyed re-randomization test on the arm mean
    * difference of per-user event counts (add-one p-value). */
  def permutationTest(spark: SparkSession, dir: String): DataFrame =
    Experiment.permutationTest(Tables(spark, dir, "events"),
      reps = PermutationReps)

  /** MDE/power calculator: smallest detectable mean shift at
    * α=0.05 / 80% power from exact per-arm moments. */
  def mdePower(spark: SparkSession, dir: String): DataFrame =
    Experiment.mdePower(Tables(spark, dir, "events"))

  /** Delta-method CI for the revenue-per-event ratio metric per
    * arm (Deng et al. ratio-metric variance, exact cross-moments). */
  def ratioDelta(spark: SparkSession, dir: String): DataFrame =
    Experiment.ratioDelta(Tables(spark, dir, "events"))

  val KtrussK = 4
  val KtrussIters = 3

  /** k-truss peel trajectory over the shared co-vis pair artifact
    * (bounded sweep budget, the q277 convention). minWeight 1 — the
    * truss demands triangle support, so the weight pre-filter the
    * vertex ops need would leave nothing to peel. */
  def ktruss(spark: SparkSession, dir: String): DataFrame =
    Graph.ktruss(sharedCoVisPairs(spark, dir), KtrussK, KtrussIters,
      minWeight = 1L)

  val SourceValueK = 10
  // mod 10, not the sample family's 5: every probe is scored against
  // the WHOLE corpus here (the q229 capped-probe rule — the panel
  // accuracy needs ~500 probes, not 1000, and scoring is the cost)
  val SourceValueProbeMod = 10L

  /** Leave-one-source-out kNN valuation over the shared ANN corpus:
    * accuracy cost of removing each source from the neighbor pool. */
  def sourceValueKnn(spark: SparkSession, dir: String): DataFrame =
    Similarity.sourceValueKnn(Tables(spark, dir, "embeddings"),
      Tables(spark, dir, "documents"), SourceValueK, SourceValueProbeMod,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  val HubnessK = 10
  val HubnessSampleMod = 5L

  /** k-occurrence hubness census over the shared ANN corpus sample:
    * max/antihub/hub counts + exact-ladder skewness. */
  def hubness(spark: SparkSession, dir: String): DataFrame =
    Similarity.hubness(Tables(spark, dir, "embeddings"), HubnessK,
      HubnessSampleMod, quant0 = Some(sharedAnnIndex(spark, dir)))

  /** Spearman midrank correlation between daily order count and
    * daily revenue (the q219 Kendall's rank-linear companion). */
  def spearmanDaily(spark: SparkSession, dir: String): DataFrame =
    Retention.spearmanDaily(Tables(spark, dir, "orders"))

  /** Wilson score interval for per-arm conversion (micro units,
    * exact shared floors). */
  def wilsonCi(spark: SparkSession, dir: String): DataFrame =
    Experiment.wilsonCi(Tables(spark, dir, "events"))

  /** Split covariate-balance SMD table over the q63 Lehmer splits
    * (n_chars + token count, |SMD|<0.1 pass flag). */
  def smdBalance(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.smdBalance(Tables(spark, dir, "documents"),
      SplitTrainBp, SplitValBp)

  /** Monthly customer-revenue Gini + top-decile share (q176's
    * inequality read unrolled over calendar months). */
  def giniTrend(spark: SparkSession, dir: String): DataFrame =
    Profile.giniTrend(Tables(spark, dir, "orders"))

  /** Cent-ending census of line prices (top-8 + rest rollup,
    * uniform-expectation excess). */
  def priceEndings(spark: SparkSession, dir: String): DataFrame =
    Integrity.priceEndings(Tables(spark, dir, "lineitem"))

  /** Fuzzy-pair entity resolution closed into entities + the
    * revenue rollup per merged entity (top-20). */
  def entityRollup(spark: SparkSession, dir: String): DataFrame =
    Dedup.entityRollup(Tables(spark, dir, "part"),
      Tables(spark, dir, "lineitem"), FuzzyMaxDist)

  /** Retention at 7/14 days by acquisition channel (type of each
    * user's first event). */
  def channelRetention(spark: SparkSession, dir: String): DataFrame =
    Retention.channelRetention(Tables(spark, dir, "events"))

  /** ABC class transition matrix between ship-date halves (entries
    * and exits as 'absent'). */
  def abcMigration(spark: SparkSession, dir: String): DataFrame =
    Market.abcMigration(Tables(spark, dir, "lineitem"))

  val StationaryIters = 20

  /** Stationary event mix of the q91 transition chain (bounded
    * power iteration in exact ppm) vs the empirical mix. */
  def stationaryMix(spark: SparkSession, dir: String): DataFrame =
    Market.stationaryMix(Tables(spark, dir, "events"), StationaryIters)

  val EssClampBits = 30

  /** Kish effective sample size of the q114 DSIR weights, per
    * source + ALL rollup (clamped 2^(s−smax) integer weights). */
  def dsirEss(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    TrainingPrep.dsirEss(docs,
      docs.filter(col("source") === DsirTargetSource), EssClampBits,
      scores0 = Some(sharedDsirScores(spark, dir)))
  }

  /** PSI of order value between date halves over reference-decile
    * bins (per-bin micro terms; q109's TVD sibling). */
  def psiDrift(spark: SparkSession, dir: String): DataFrame =
    Profile.psiDrift(Tables(spark, dir, "orders"))

  val SemDecontEvalMod = 10L
  val SemDecontTauBp = 9000L

  /** Embedding-space decontamination per source (the semantic tier
    * above q55 exact / q101 MinHash), on the shared ANN artifact. */
  def semanticDecontamination(spark: SparkSession, dir: String): DataFrame =
    Contamination.semanticDecontamination(
      Tables(spark, dir, "embeddings"), Tables(spark, dir, "documents"),
      SemDecontEvalMod, SemDecontTauBp,
      quant0 = Some(sharedAnnIndex(spark, dir)))

  /** James–Stein shrunk per-source mean doc length + league-table
    * movement (the winner's-curse correction). */
  def jamesSteinMeans(spark: SparkSession, dir: String): DataFrame =
    Profile.jamesSteinMeans(Tables(spark, dir, "documents"))

  /** Max drawdown of the detrended cumulative revenue walk (peak /
    * trough days, depth in cents, recovery flag). */
  def revenueDrawdown(spark: SparkSession, dir: String): DataFrame =
    Retention.revenueDrawdown(Tables(spark, dir, "orders"))

  /** Kaplan–Meier survival of user lifetime, right-censored at the
    * corpus' final observed day (driver product ladder). */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame =
    Retention.kaplanMeier(Tables(spark, dir, "events"))

  /** Exact audience set algebra per event-type pair + HLL union
    * bound verdict (the q37 gate machinery). */
  def audienceUnionChecked(spark: SparkSession, dir: String): DataFrame =
    Market.audienceUnionChecked(Tables(spark, dir, "events"))

  val PrioritySampleK = 100

  /** Duffield–Lund–Thorup priority sample of documents weighted by
    * n_chars, with Horvitz–Thompson weights. */
  def prioritySample(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.prioritySample(Tables(spark, dir, "documents"),
      PrioritySampleK)

  val GoodTuringHeadR = 10

  /** Good–Turing frequency-of-frequencies + unseen-mass estimate
    * over the documents token stream. */
  def goodTuring(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.goodTuring(Tables(spark, dir, "documents"),
      GoodTuringHeadR)

  val SpanStartBp = 500L
  val SpanMax = 5

  /** T5 span-corruption length accounting per document. */
  def spanCorruption(spark: SparkSession, dir: String): DataFrame =
    TrainingPrep.spanCorruption(Tables(spark, dir, "documents"),
      SpanStartBp, SpanMax)

  /** Mann–Kendall monotone-trend test over the dense daily revenue
    * spine (tie-corrected, continuity-corrected, exact-integer). */
  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    Retention.mannKendall(Tables(spark, dir, "orders"))

  val QteLevelsBp = Seq(2500L, 5000L, 7500L, 9000L)

  /** Per-arm nearest-rank quantiles of the per-user event count +
    * quantile treatment effects. */
  def quantileTreatment(spark: SparkSession, dir: String): DataFrame =
    Experiment.quantileTreatment(Tables(spark, dir, "events"),
      levelsBp = QteLevelsBp)

  val FdrReps = 100

  /** Benjamini–Hochberg step-up over per-event-type permutation
    * tests (shared md5(user:rep) pseudo-assignments). */
  def fdrScreen(spark: SparkSession, dir: String): DataFrame =
    Experiment.fdrScreen(Tables(spark, dir, "events"), reps = FdrReps)
}

/** DuckDB oracle SQL, one per SQL-expressible query. Shares bucket
  * definitions with the Spark side via SessionStats.bucketSqlExprs. */
object Oracles {

  /** Gap sessionization as a reusable CTE body (DuckDB dialect).
    * `sz` = row-level events with session_id; `sess` = session grain. */
  val sessionCte: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value, props, ts, epoch_us(ts) AS ts_us,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
      |  FROM events
      |), sz0 AS (
      |  SELECT *, SUM(CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      |         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM e
      |), sz AS (
      |  SELECT *, CAST(user_id AS VARCHAR) || '_' || CAST(session_seq AS VARCHAR) AS session_id
      |  FROM sz0
      |), sess AS (
      |  SELECT session_id,
      |         user_id,
      |         COUNT(*) AS step_length,
      |         (MAX(ts_us) - MIN(ts_us)) // 1000000 AS visit_length_s,
      |         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS start_time,
      |         string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
      |         CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT) AS total_value_cents
      |  FROM sz GROUP BY 1, 2
      |)""".stripMargin

  /** Events-as-ad-clicks (the q13-q16 input shape): click events with
    * ad_id from props, province/city from the geo dimension chain. */
  val adClickCte: String =
    """SELECT e.ts, r.r_name AS province, n.n_name AS city, e.user_id,
      |       CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS ad_id
      |FROM events e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE e.event_type = 'click'
      |  AND json_extract_string(e.props, '$.k') IS NOT NULL""".stripMargin

  /** Z-order cell table of lineitem on (l_partkey, l_suppkey) as CTE
    * text (twin of Layout.zorderCells): defines `rows_in` (a, b),
    * `bounds`, `m` (row → cell), and `c` (cell, n_rows, min/max per
    * dim). The dilation chain mirrors the codegen'd MortonCode
    * expression bit for bit. Shared by the q200 layout audit and the
    * q240 pruning audit. */
  val zorderCellCtes: String = {
    val gb = Queries.ZorderGridBits
    val gmax = (1L << gb) - 1L
    val shift = 2 * gb - Queries.ZorderCellBits
    // one CTE per dilation step, both coordinates in lockstep
    val steps = Seq(
      (16, "281470681808895"), (8, "71777214294589695"),
      (4, "1085102592571150095"), (2, "3689348814741910323"),
      (1, "6148914691236517205")).zipWithIndex.map {
      case ((sh, mask), i) =>
        s"""m${i + 1} AS (
           |  SELECT a, b, (ya | (ya << $sh)) & $mask AS ya,
           |         (yb | (yb << $sh)) & $mask AS yb FROM m$i)""".stripMargin
    }.mkString(",\n")
    s"""rows_in AS (
       |  SELECT CAST(l_partkey AS BIGINT) AS a, CAST(l_suppkey AS BIGINT) AS b
       |  FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
       |bounds AS (
       |  SELECT MIN(a) AS lo_a, MAX(a) AS hi_a,
       |         MIN(b) AS lo_b, MAX(b) AS hi_b FROM rows_in),
       |m0 AS (
       |  SELECT r.a, r.b,
       |         ((r.a - bo.lo_a) * $gmax
       |           // GREATEST(bo.hi_a - bo.lo_a, 1)) & 2147483647 AS ya,
       |         ((r.b - bo.lo_b) * $gmax
       |           // GREATEST(bo.hi_b - bo.lo_b, 1)) & 2147483647 AS yb
       |  FROM rows_in r, bounds bo),
       |$steps,
       |m AS (SELECT a, b, (ya | (yb << 1)) >> $shift AS cell FROM m5),
       |c AS (
       |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_rows,
       |         MIN(a) AS min_a, MAX(a) AS max_a,
       |         MIN(b) AS min_b, MAX(b) AS max_b
       |  FROM m GROUP BY 1)""".stripMargin
  }

  /** Symmetrized co-visitation edge list (twin of Graph.symmetric ∘
    * Market.coVisitPairs) as CTE text: expects `sz` from
    * [[sessionCte]] in scope; defines `edg` (src, dst) and `deg`
    * (src, deg). Shared by the q93 PageRank and q196 BFS oracles. */
  def coVisEdgesCte(cap: Int, minSupport: Long): String =
    s"""it0 AS (
       |  SELECT user_id, session_seq,
       |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
       |  FROM sz
       |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
       |  GROUP BY 1, 2, 3),
       |capped AS (
       |  SELECT user_id, session_seq, item FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
       |      ORDER BY item) AS rn
       |    FROM it0)
       |  WHERE rn <= $cap),
       |pairs AS (
       |  SELECT a.item AS item_a, b.item AS item_b,
       |         CAST(COUNT(*) AS BIGINT) AS w
       |  FROM capped a
       |  JOIN capped b ON a.user_id = b.user_id
       |    AND a.session_seq = b.session_seq AND a.item < b.item
       |  GROUP BY 1, 2),
       |edg AS (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT item_a AS src, item_b AS dst FROM pairs WHERE w >= $minSupport
       |    UNION ALL
       |    SELECT item_b, item_a FROM pairs WHERE w >= $minSupport)),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edg GROUP BY 1)""".stripMargin

  /** BM25 known-item eval chain (twin of
    * Retrieval.bm25KnownItemOutcomes): defines `q` (query_id, token)
    * and `hits` (query_id, rank ≤ k where the query's own doc
    * surfaced). Shared by the q229 found/MRR and q266 nDCG rollups. */
  val knownItemCtes: String = {
    val qm = Queries.KnownItemMod
    val qt = Queries.KnownItemTokens
    val k = Queries.KnownItemK
    s"""toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t
       |  FROM documents WHERE text IS NOT NULL),
       |qd AS (
       |  SELECT doc_id FROM toks WHERE doc_id % $qm = 0
       |  ORDER BY doc_id LIMIT ${Queries.KnownItemMaxQueries}),
       |q AS (
       |  SELECT DISTINCT toks.doc_id AS query_id,
       |         unnest(list_distinct(t[1 : $qt])) AS token
       |  FROM toks JOIN qd ON toks.doc_id = qd.doc_id),
       |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
       |st AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE)
       |           / CAST(COUNT(*) AS BIGINT) AS avgdl
       |  FROM dl),
       |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
       |tf AS (
       |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM tok JOIN (SELECT DISTINCT token FROM q) qt USING (token)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
       |          FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT q.query_id, tf.doc_id,
       |         CAST(FLOOR(1000000.0
       |           * ((2.0 * (st.n_docs - dfreq.df) + 1.0)
       |             / (2.0 * dfreq.df + 1.0))
       |           * ((tf.tf * 2.5)
       |             / (tf.tf + 1.5
       |               * (0.25 + 0.75 * (dl.dl / st.avgdl))))) AS BIGINT) AS c
       |  FROM tf
       |  JOIN dfreq USING (token)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  JOIN q ON q.token = tf.token, st),
       |s AS (
       |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp
       |  FROM contrib GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank
       |  FROM s),
       |hits AS (
       |  SELECT query_id, rank FROM r
       |  WHERE rank <= $k AND doc_id = query_id)""".stripMargin
  }

  /** Distinct 3-word shingles per document (twin of Dedup.withShingles). */
  val shingleCte: String =
    """sh AS (
      |  SELECT doc_id, lang, source,
      |         CASE WHEN len(string_split(text, ' ')) >= 3 THEN
      |           list_distinct(list_transform(
      |             range(1, len(string_split(text, ' ')) - 1),
      |             i -> string_split(text, ' ')[i] || ' ' ||
      |                  string_split(text, ' ')[i + 1] || ' ' ||
      |                  string_split(text, ' ')[i + 2]))
      |         ELSE [] END AS shingles
      |  FROM documents)""".stripMargin

  /** SimHash signature chain (twin of graft.expressions.SimHash):
    * `sig` = (doc_id, simhash). */
  val simhashSigCte: String = {
    import graft.ops.Dedup.SimhashBits
    val votes = (0 until SimhashBits).map { j =>
      val nib = j / 4 + 1
      val p = 1 << (j % 4)
      s"SUM(2 * (CAST(FLOOR(nibs[$nib] / $p) AS BIGINT) % 2) - 1) AS v$j"
    }.mkString(",\n       ")
    val packed = (0 until SimhashBits)
      .map(j => s"CASE WHEN v$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
       |  FROM documents),
       |nib AS (
       |  SELECT doc_id,
       |         list_transform(range(1, 9),
       |           i -> CAST(instr('0123456789abcdef', substr(md5(tok), i, 1)) - 1 AS BIGINT)) AS nibs
       |  FROM tok),
       |votes AS (
       |  SELECT doc_id,
       |       $votes
       |  FROM nib GROUP BY 1),
       |sig AS (
       |  SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  /** Integer-quantized embeddings + exact squared norm (twin of
    * Similarity.quantized). */
  val embQuantCte: String =
    """qv AS (
      |  SELECT vec_id, embedding,
      |         list_transform(embedding,
      |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
      |  FROM embeddings),
      |n AS (
      |  SELECT vec_id, embedding, q,
      |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
      |  FROM qv)""".stripMargin

  /** Sign-pattern LSH bucket (twin of Similarity.withSignBucket). */
  val signBucketExpr: String =
    s"""CAST(list_sum(list_transform(range(1, ${graft.ops.Similarity.SignBits + 1}),
       |  i -> CASE WHEN embedding[i] >= 0 THEN CAST(pow(2, i - 1) AS BIGINT)
       |            ELSE 0 END)) AS BIGINT)""".stripMargin

  /** MinHash+LSH near-dup pair CTE chain (twin of
    * Dedup.minhashDedupPairs; shared by q22 and q42): `p` = verified
    * pairs (doc_a, doc_b, inter, uni, jaccard_bp) at the 8000 bp
    * threshold. Sig hashes twin graft.expressions.MinHashSig — one
    * 28-bit md5-derived base hash per shingle, k-mixed mod the prime. */
  /** shingles → minhash signature → bands → distinct candidate pairs
    * (`cand`): the blocking prefix shared by the q22 Jaccard and q96
    * containment oracles. */
  /** sh → sig → bands chain only (no pairing rule) — the shared prefix
    * of the intra-corpus `cand` below and q101's cross-split candidate
    * join. */
  val minhashBandCtes: String = {
    import graft.ops.Dedup.{NumBands, NumHashes}
    val rows = NumHashes / NumBands
    val sigCols = (0 until NumHashes).map(k =>
      f"list_min(list_transform(shingles, s -> (${2 * k + 1} * CAST(concat('0x', substr(md5(s), 1, 7)) AS BIGINT) + $k) %% 1073741789)) AS mh$k%02d")
      .mkString(",\n         ")
    val bandSelects = (0 until NumBands).map { b =>
      val cat = (0 until rows).map(r => f"mh${b * rows + r}%02d").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""$shingleCte,
       |sig AS (
       |  SELECT doc_id,
       |         $sigCols
       |  FROM sh),
       |bands AS (
       |  $bandSelects)""".stripMargin
  }

  val minhashCandCtes: String =
    s"""$minhashBandCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)""".stripMargin

  val minhashPairCtes: String = {
    s"""$minhashCandCtes,
       |v AS (
       |  SELECT doc_a, doc_b,
       |         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
       |         CAST(len(sa.shingles) + len(sb.shingles)
       |              - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS uni
       |  FROM cand
       |  JOIN sh sa ON cand.doc_a = sa.doc_id
       |  JOIN sh sb ON cand.doc_b = sb.doc_id),
       |p AS (
       |  SELECT doc_a, doc_b, inter, uni,
       |         CASE WHEN uni = 0 THEN 0
       |              ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT) END AS jaccard_bp
       |  FROM v
       |  WHERE CASE WHEN uni = 0 THEN 0
       |             ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT) END >= 8000)""".stripMargin
  }

  /** As-of oracle (twin of AsOfJoin.clickLastPurchase /
    * clickRecentPurchase): left ASOF without tolerance, inner + gap
    * filter with one. */
  private def asofSql(innerToleranceSecs: Option[Long]): String = {
    val base =
      """WITH c AS (
        |  SELECT user_id, event_id AS click_event_id, ts
        |  FROM events WHERE event_type = 'click'),
        |p0 AS (
        |  SELECT user_id, ts, event_id, value
        |  FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT user_id, ts, event_id, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |                                 ORDER BY event_id DESC) AS rn
        |    FROM p0) WHERE rn = 1)
        |SELECT c.user_id, c.click_event_id,
        |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
        |       p.event_id AS purchase_event_id,
        |       CAST(FLOOR(p.value * 100.0) AS BIGINT) AS purchase_cents,
        |       (epoch_us(c.ts) - epoch_us(p.ts)) // 1000000 AS secs_since_purchase
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin
    innerToleranceSecs match {
      case None => base
      case Some(tol) =>
        s"""SELECT * FROM ($base)
           |WHERE secs_since_purchase IS NOT NULL
           |  AND secs_since_purchase <= $tol""".stripMargin
    }
  }

  /** Unrolled integer-Lloyd CTE chain (twin of KMeans.fit at
    * KmeansK/KmeansIters): `a2` = final (vec_id, q, n2, cluster,
    * dist). Shared by q52 and q53. */
  private lazy val kmeansCtes: String = {
    def round(i: Int, from: String): String =
      s"""c${i}dim AS (
         |  SELECT cluster, i AS pos,
         |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM $from, unnest(range(1, len(q) + 1)) t(i)
         |  GROUP BY 1, 2),
         |c$i AS (SELECT cluster, list(c ORDER BY pos) AS centroid FROM c${i}dim GROUP BY 1),
         |c${i}n AS (
         |  SELECT cluster, centroid,
         |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
         |  FROM c$i),
         |s$i AS (
         |  SELECT n.vec_id, n.q, n.n2, c.cluster,
         |         n.n2 + c.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(n.q) + 1), i -> n.q[i] * c.centroid[i])) AS BIGINT) AS dist
         |  FROM n, c${i}n c),
         |a$i AS (
         |  SELECT vec_id, q, n2, cluster, dist FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                 ORDER BY dist, cluster) AS rn
         |    FROM s$i) WHERE rn = 1)""".stripMargin
    s"""$embQuantCte,
       |a0 AS (SELECT vec_id, q, n2, vec_id % ${Queries.KmeansK} AS cluster FROM n),
       |${round(1, "a0")},
       |${round(2, "a1")}""".stripMargin
  }

  private val sessionStatsSql: String = {
    val buckets = graft.ops.SessionStats.bucketSqlExprs.mkString(",\n       ")
    val bp = graft.ops.SessionStats.bucketNames
      .map(n => s"CAST(FLOOR(10000.0 * $n / session_count) AS BIGINT) AS ${n}_bp")
      .mkString(",\n       ")
    s"""$sessionCte, h AS (
       |SELECT COUNT(*) AS session_count,
       |       $buckets
       |FROM sess)
       |SELECT session_count, ${graft.ops.SessionStats.bucketNames.mkString(", ")},
       |       $bp
       |FROM h""".stripMargin
  }

  /** BPE oracle CTE chain (shared by q70/q74): `w0` vocab, then per
    * round the pair-count+argmax (`b_r`) and — for r < rounds, or
    * for every round when `applyLast` — the greedy merge application
    * (`w_r`) via candidate-run island parity. */
  private def bpeChain(rounds: Int, applyLast: Boolean): String = {
    def roundCtes(r: Int): String =
      s"""p$r AS (
         |  SELECT syms[i] AS merge_left, syms[i+1] AS merge_right,
         |         CAST(SUM(freq) AS BIGINT) AS pair_count
         |  FROM w${r - 1}, unnest(range(1, len(syms))) AS u$r(i)
         |  WHERE len(syms) >= 2
         |  GROUP BY 1, 2),
         |b$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, merge_left, merge_right, pair_count
         |  FROM p$r ORDER BY pair_count DESC, merge_left, merge_right LIMIT 1)""".stripMargin
    // LEFT JOIN ON TRUE, not CROSS JOIN: on a degenerate corpus a
    // round's pair set can be EMPTY, and a cross join with empty b$r
    // would annihilate the vocabulary (0 rows out) where the Spark
    // side (learn collects fewer merges, segment folds over them)
    // keeps it — with the left join an empty b$r makes every cand
    // FALSE and w$r = w$(r-1), a no-op round, matching the engine.
    def applyCtes(r: Int): String =
      s"""s$r AS (
         |  SELECT w.word, w.freq, i, w.syms[i] AS sym,
         |         COALESCE(w.syms[i] = b.merge_left
         |                  AND w.syms[i+1] = b.merge_right, FALSE) AS cand
         |  FROM w${r - 1} w LEFT JOIN b$r b ON TRUE,
         |       unnest(range(1, len(w.syms) + 1)) AS uu$r(i)),
         |c$r AS (
         |  SELECT word, i, i - ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS isl
         |  FROM s$r WHERE cand),
         |k$r AS (
         |  SELECT word, i FROM (
         |    SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY i) AS rn
         |    FROM c$r) WHERE rn % 2 = 1),
         |m$r AS (
         |  SELECT s.word, s.freq, s.i,
         |         CASE WHEN kk.i IS NOT NULL THEN s.sym || b.merge_right
         |              ELSE s.sym END AS sym
         |  FROM s$r s
         |  LEFT JOIN b$r b ON TRUE
         |  LEFT JOIN k$r kk ON s.word = kk.word AND s.i = kk.i
         |  LEFT JOIN k$r kp ON s.word = kp.word AND s.i = kp.i + 1
         |  WHERE kp.i IS NULL),
         |w$r AS (
         |  SELECT word, freq, list(sym ORDER BY i) AS syms
         |  FROM m$r GROUP BY word, freq)""".stripMargin
    val ctes = (1 to rounds).map { r =>
      if (r < rounds || applyLast) roundCtes(r) + ",\n" + applyCtes(r)
      else roundCtes(r)
    }.mkString(",\n")
    s"""w0 AS (
       |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
       |         string_split(word, '') AS syms
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word
       |        FROM documents WHERE text IS NOT NULL)
       |  GROUP BY word),
       |$ctes""".stripMargin
  }

  val sql: Map[String, String] = baseSql + ("q47_corpus_select" -> {
    corpusSelectSql
  }) + ("q199_anomaly_sessions" -> {
    // session intervals (µs, the q02 sz grain) theta-joined to the
    // q88 anomaly days (embedded whole, the q64 composition pattern)
    s"""$sessionCte,
       |si AS (
       |  SELECT user_id, session_seq, MIN(ts_us) AS a_us, MAX(ts_us) AS b_us
       |  FROM sz GROUP BY 1, 2),
       |anom AS (
       |  SELECT DISTINCT day FROM (${baseSql("q88_volume_anomaly")}) q88
       |  WHERE is_anomaly = 1),
       |ad AS (
       |  SELECT day, epoch_us(CAST(day AS TIMESTAMP)) AS d0_us,
       |         epoch_us(CAST(day AS TIMESTAMP)) + 86400000000 AS d1_us
       |  FROM anom)
       |SELECT ad.day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |       CAST(COUNT(DISTINCT si.user_id) AS BIGINT) AS n_users,
       |       CAST(SUM((LEAST(si.b_us, ad.d1_us) - GREATEST(si.a_us, ad.d0_us))
       |         // 1000000) AS BIGINT) AS overlap_seconds
       |FROM si JOIN ad ON si.a_us < ad.d1_us AND si.b_us >= ad.d0_us
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }) + ("q206_gains_table" -> {
    // the q205 feature table re-read as (score, label), cut into
    // equal-depth tiers over score DESC (q203's last-rank bin rule)
    val nb = Queries.GainsBins
    s"""WITH f AS (
       |  SELECT n_events AS score, label
       |  FROM (${baseSql("q205_churn_features")}) q205),
       |h AS (SELECT score, COUNT(*) AS cnt, SUM(label) AS conv
       |      FROM f GROUP BY 1),
       |c AS (SELECT *, SUM(cnt) OVER (ORDER BY score DESC) AS cum,
       |             SUM(cnt) OVER () AS n
       |      FROM h),
       |b AS (SELECT (cum - 1) * $nb // n + 1 AS tier, cnt, conv FROM c),
       |g AS (SELECT tier, CAST(SUM(cnt) AS BIGINT) AS n_rows,
       |             CAST(SUM(conv) AS BIGINT) AS n_converters
       |      FROM b GROUP BY 1)
       |SELECT CAST(tier AS BIGINT) AS tier, n_rows, n_converters,
       |       CAST(FLOOR(10000.0 * n_converters / n_rows) AS BIGINT)
       |         AS conv_bp,
       |       CASE WHEN SUM(n_converters) OVER () = 0 THEN 0
       |            ELSE CAST(FLOOR(10000.0 * SUM(n_converters)
       |              OVER (ORDER BY tier) / SUM(n_converters) OVER ())
       |              AS BIGINT) END AS cum_gain_bp
       |FROM g ORDER BY tier""".stripMargin
  }) + ("q64_training_manifest" -> {
    // the q47 composition extended with the q55 contamination CTE and
    // the q63 split arithmetic — the full-manifest oracle
    val sw = "len(string_split(text, ' '))"
    val t = Queries.SplitTrainBp; val v = Queries.SplitValBp
    s"""WITH k AS (${baseSql("q23_ngram_dedup_kept")}),
       |g AS (
       |  SELECT doc_id, CAST($sw AS BIGINT) AS token_count
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND $sw >= 20
       |    AND CAST(FLOOR(10000.0 * len(list_filter(string_split(text, ' '),
       |          x -> length(x) <= 2)) / $sw) AS BIGINT) <= 4000
       |    AND len(regexp_extract_all(text, '${graft.ops.TextClean.PiiPattern}'))
       |          <= ${Queries.MaxPiiHits}),
       |hits AS (SELECT doc_id FROM (${baseSql("q55_decontaminate")})),
       |base AS (
       |  SELECT k.doc_id, k.lang, g.token_count
       |  FROM k JOIN g USING (doc_id)
       |  WHERE k.doc_id % ${Queries.ContamEvalMod} <> 0
       |    AND k.doc_id NOT IN (SELECT doc_id FROM hits)),
       |s AS (
       |  SELECT lang, token_count,
       |         (((doc_id % 1000003 + 1000003) % 1000003)
       |           * 48271 + 12345) % 10000 AS bp
       |  FROM base)
       |SELECT CASE WHEN bp < $t THEN 'train'
       |            WHEN bp < ${t + v} THEN 'val'
       |            ELSE 'test' END AS split,
       |       lang, COUNT(*) AS n_docs,
       |       CAST(SUM(token_count) AS BIGINT) AS total_tokens
       |FROM s GROUP BY 1, 2""".stripMargin
  }) + ("q115_budget_select" -> {
    // budget selection over the q69 score table: value-grain class
    // cumsum → threshold, md5-draw fill of the one boundary class
    val b = Queries.SelectBudgetTokens
    s"""WITH s AS (
       |  SELECT doc_id, token_count, score
       |  FROM (${baseSql("q69_quality_classifier")})),
       |c AS (
       |  SELECT score, CAST(SUM(token_count) AS BIGINT) AS cls_tokens
       |  FROM s GROUP BY 1),
       |cc AS (
       |  SELECT *, CAST(COALESCE(SUM(cls_tokens) OVER (ORDER BY score DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS cum_before
       |  FROM c),
       |full_cls AS (
       |  SELECT score FROM cc WHERE cum_before + cls_tokens <= $b),
       |bnd AS (
       |  SELECT score, $b - cum_before AS remaining FROM cc
       |  WHERE cum_before < $b AND cum_before + cls_tokens > $b),
       |bsel AS (
       |  SELECT doc_id, score, token_count, 'boundary' AS reason
       |  FROM (
       |    SELECT s.doc_id, s.score, s.token_count, bnd.remaining,
       |           CAST(SUM(s.token_count) OVER (PARTITION BY s.score
       |             ORDER BY md5(CAST(s.doc_id AS VARCHAR)), s.doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |             AS BIGINT) AS cum
       |    FROM s JOIN bnd ON s.score = bnd.score)
       |  WHERE cum <= remaining)
       |SELECT s.doc_id, s.score, s.token_count, 'full' AS reason
       |FROM s JOIN full_cls USING (score)
       |UNION ALL SELECT * FROM bsel""".stripMargin
  })

  private lazy val corpusSelectSql: String = {
    // end-to-end pipeline oracle, composed from the q23 dedup oracle
    // (nested WITH is legal in a CTE body) + the one-pass gate twin of
    // CorpusPipeline.corpusSelect
    val sw = "len(string_split(text, ' '))"
    s"""WITH k AS (${baseSql("q23_ngram_dedup_kept")}),
       |g AS (
       |  SELECT doc_id, CAST($sw AS BIGINT) AS token_count
       |  FROM documents
       |  WHERE text IS NOT NULL
       |    AND $sw >= 20
       |    AND CAST(FLOOR(10000.0 * len(list_filter(string_split(text, ' '),
       |          x -> length(x) <= 2)) / $sw) AS BIGINT) <= 4000
       |    AND len(regexp_extract_all(text, '${graft.ops.TextClean.PiiPattern}'))
       |          <= ${Queries.MaxPiiHits})
       |SELECT k.lang, k.source, COUNT(*) AS n_docs,
       |       CAST(SUM(g.token_count) AS BIGINT) AS total_tokens
       |FROM k JOIN g USING (doc_id)
       |GROUP BY 1, 2""".stripMargin
  }

  private lazy val baseSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_disc_price_bp,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_sessionize" -> s"$sessionCte SELECT * FROM sess",

    "q03_session_stats" -> sessionStatsSql,

    "q04_session_filter" ->
      s"""$sessionCte
         |SELECT s.session_id, s.user_id, c.c_mktsegment,
         |       s.step_length, s.visit_length_s, s.event_types
         |FROM sess s JOIN customer c ON s.user_id = c.c_custkey
         |WHERE c.c_acctbal >= 0.0
         |  AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
         |  AND list_has_any(string_split(s.event_types, ','), ['purchase', 'signup'])""".stripMargin,

    "q05_top_categories" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS category_id,
        |       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
        |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
        |       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_count
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |GROUP BY 1
        |ORDER BY click_count DESC, purchase_count DESC, view_count DESC, category_id ASC
        |LIMIT 10""".stripMargin,

    "q06_top_sessions_per_category" ->
      s"""$sessionCte, cat AS (
         |  SELECT *, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS category_id
         |  FROM sz WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |), top AS (
         |  SELECT category_id FROM cat GROUP BY 1
         |  ORDER BY CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) DESC,
         |           category_id ASC
         |  LIMIT 10
         |), ps AS (
         |  SELECT category_id, session_id, COUNT(*) AS click_count
         |  FROM cat WHERE event_type = 'click' GROUP BY 1, 2
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY category_id
         |                               ORDER BY click_count DESC, session_id ASC) AS rank
         |  FROM ps WHERE category_id IN (SELECT category_id FROM top)
         |)
         |SELECT category_id, session_id, click_count, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin,

    "q07_page_funnel" -> {
      val flow = Queries.funnelFlow
      val splits = flow.sliding(2).map(p => s"${p(0)}_${p(1)}").toVector
      val values = splits.zipWithIndex
        .map { case (s, i) => s"('$s', CAST($i AS BIGINT))" }.mkString(", ")
      val inList = splits.map(s => s"'$s'").mkString(", ")
      s"""$sessionCte, pr AS (
         |  SELECT session_id, event_type,
         |         lag(event_type) OVER (PARTITION BY session_id ORDER BY epoch_us(ts), event_id) AS prev_type
         |  FROM sz
         |), pairs AS (
         |  SELECT prev_type || '_' || event_type AS split, COUNT(*) AS c
         |  FROM pr WHERE prev_type || '_' || event_type IN ($inList)
         |  GROUP BY 1
         |), steps AS (
         |  SELECT * FROM (VALUES $values) t(split, step_idx)
         |), j AS (
         |  SELECT s.step_idx, s.split, CAST(COALESCE(p.c, 0) AS BIGINT) AS split_count
         |  FROM steps s LEFT JOIN pairs p ON s.split = p.split
         |), f AS (
         |  SELECT j.*, COALESCE(lag(split_count) OVER (ORDER BY step_idx),
         |                       (SELECT COUNT(*) FROM sz WHERE event_type = '${flow.head}')) AS prev_count
         |  FROM j
         |)
         |SELECT step_idx, split, split_count, prev_count,
         |       CASE WHEN prev_count = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * split_count / prev_count) AS BIGINT) END AS convert_rate_bp
         |FROM f""".stripMargin
    },

    "q08_area_top3_products" ->
      """WITH geo AS (
        |  SELECT o.o_orderkey, n.n_nationkey, n.n_name, r.r_name AS area
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |), clicks AS (
        |  SELECT g.area, g.n_nationkey, g.n_name, l.l_partkey AS product_id
        |  FROM lineitem l JOIN geo g ON l.l_orderkey = g.o_orderkey
        |), counted AS (
        |  SELECT area, product_id, COUNT(*) AS click_count,
        |         string_agg(DISTINCT CAST(n_nationkey AS VARCHAR) || ':' || n_name, ','
        |                    ORDER BY CAST(n_nationkey AS VARCHAR) || ':' || n_name) AS city_infos
        |  FROM clicks GROUP BY 1, 2
        |), wp AS (
        |  SELECT counted.*, p.p_name AS product_name,
        |         CASE WHEN p.p_size % 2 = 0 THEN 'Self' ELSE 'Third Party' END AS product_status
        |  FROM counted JOIN part p ON counted.product_id = p.p_partkey
        |), ranked AS (
        |  SELECT wp.*,
        |         CASE WHEN area IN ('ASIA', 'AMERICA') THEN 'A Level'
        |              WHEN area = 'EUROPE' THEN 'B Level'
        |              WHEN area = 'MIDDLE EAST' THEN 'C Level'
        |              ELSE 'D Level' END AS area_level,
        |         row_number() OVER (PARTITION BY area ORDER BY click_count DESC, product_id ASC) AS rank
        |  FROM wp
        |)
        |SELECT area, area_level, product_id, click_count, city_infos,
        |       product_name, product_status, CAST(rank AS INTEGER) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,

    "q09_order_priority_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |                AND l.l_shipdate < TIMESTAMP '1997-01-01')
        |GROUP BY 1""".stripMargin,

    "q10_customer_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS customer_count
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q11_period_delta" ->
      """WITH u AS (
        |  SELECT user_id, CAST(FLOOR(value * 100.0) AS BIGINT) AS cents, CAST(1 AS BIGINT) AS sign
        |  FROM events WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
        |  UNION ALL
        |  SELECT user_id, CAST(FLOOR(value * 100.0) AS BIGINT), CAST(-1 AS BIGINT)
        |  FROM events WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16'
        |)
        |SELECT user_id, CAST(SUM(sign * cents) AS BIGINT) AS value_delta_cents,
        |       CAST(SUM(sign) AS BIGINT) AS count_delta
        |FROM u GROUP BY 1""".stripMargin,

    "q12_stratified_sample" ->
      s"""$sessionCte, k AS (
         |  SELECT session_id, start_time, event_types,
         |         substr(start_time, 1, 10) AS dt,
         |         substr(start_time, 1, 10) || '_' || substr(start_time, 12, 2) AS date_hour
         |  FROM sess
         |), nd AS (SELECT COUNT(DISTINCT dt) AS n_days FROM k
         |), r AS (
         |  SELECT k.*,
         |         COUNT(*) OVER (PARTITION BY date_hour) AS hour_count,
         |         COUNT(*) OVER (PARTITION BY dt) AS day_count,
         |         row_number() OVER (PARTITION BY date_hour
         |                            ORDER BY md5(session_id), session_id) AS pick
         |  FROM k
         |)
         |SELECT date_hour, session_id, start_time, event_types
         |FROM r, nd
         |WHERE pick <= (hour_count * (${Queries.StratifiedTarget} // n_days)) // day_count""".stripMargin,

    "q13_ad_blacklist" ->
      s"""WITH ac AS ($adClickCte)
         |, counts AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS dt, user_id, ad_id, COUNT(*) AS click_count
         |  FROM ac GROUP BY 1, 2, 3
         |)
         |SELECT DISTINCT user_id FROM counts WHERE click_count >= ${Queries.BlacklistThreshold}""".stripMargin,

    "q14_ad_stats" ->
      s"""WITH ac AS ($adClickCte)
         |SELECT strftime(ts, '%Y-%m-%d') AS dt, province, city, ad_id,
         |       COUNT(*) AS click_count
         |FROM ac GROUP BY 1, 2, 3, 4""".stripMargin,

    "q15_province_top3_ads" ->
      s"""WITH ac AS ($adClickCte)
         |, per AS (
         |  SELECT strftime(ts, '%Y-%m-%d') AS dt, province, ad_id, COUNT(*) AS click_count
         |  FROM ac GROUP BY 1, 2, 3
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY dt, province
         |                               ORDER BY click_count DESC, ad_id ASC) AS rank
         |  FROM per
         |)
         |SELECT dt, province, ad_id, click_count, CAST(rank AS INTEGER) AS rank
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q16_click_trend" ->
      s"""WITH ac AS ($adClickCte)
         |, m AS (SELECT max(ts) AS mx FROM ac)
         |SELECT strftime(ts, '%Y%m%d%H%M') AS minute_key, ad_id, COUNT(*) AS click_count
         |FROM ac, m
         |WHERE ts >= mx - INTERVAL 60 MINUTE
         |GROUP BY 1, 2""".stripMargin,

    "q17_token_stats" ->
      """WITH t AS (SELECT *, string_split(text, ' ') AS tokens FROM documents),
        |s AS (
        |  SELECT doc_id, lang, source,
        |         CAST(len(tokens) AS BIGINT) AS token_count,
        |         CAST(len(list_distinct(tokens)) AS BIGINT) AS distinct_tokens,
        |         CAST(length(text) AS BIGINT) AS total_chars,
        |         CAST(list_sum(list_transform(tokens, x -> length(x))) AS BIGINT) AS token_chars
        |  FROM t)
        |SELECT *, CAST(FLOOR(10000.0 * token_chars / token_count) AS BIGINT) AS avg_token_len_bp
        |FROM s""".stripMargin,

    "q18_text_quality" -> {
      val sw = graft.ops.TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT *, string_split(text, ' ') AS tokens FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         CAST(len(tokens) AS BIGINT) AS token_count,
         |         CAST(len(list_filter(tokens, x -> x IN ($sw))) AS BIGINT) AS stopword_count,
         |         CAST(len(list_filter(tokens, x -> length(x) <= 2)) AS BIGINT) AS short_count,
         |         CAST(len(list_distinct(tokens)) AS BIGINT) AS distinct_tokens
         |  FROM t),
         |b AS (
         |  SELECT *,
         |         CAST(FLOOR(10000.0 * stopword_count / token_count) AS BIGINT) AS stopword_bp,
         |         CAST(FLOOR(10000.0 * short_count / token_count) AS BIGINT) AS short_bp,
         |         CAST(FLOOR(10000.0 * distinct_tokens / token_count) AS BIGINT) AS ttr_bp
         |  FROM s)
         |SELECT *, CAST((token_count >= 20 AND short_bp <= 4000) AS INT) AS quality_ok
         |FROM b""".stripMargin
    },

    "q19_lang_id" -> {
      val dicts = graft.ops.TextAnalysis.LangDicts
      val scoreCols = dicts.map { case (l, d) =>
        val in = d.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(tokens, x -> x IN ($in))) AS BIGINT) AS score_$l"
      }.mkString(",\n         ")
      val gm = dicts.map(x => s"score_${x._1}").mkString("greatest(", ", ", ")")
      val caseChain = dicts.map(_._1).sorted
        .map(l => s"WHEN score_$l >= $gm THEN '$l'").mkString("CASE ", " ", " END")
      s"""WITH t AS (SELECT *, string_split(text, ' ') AS tokens FROM documents),
         |s AS (
         |  SELECT doc_id, lang,
         |         $scoreCols
         |  FROM t),
         |p AS (SELECT *, $caseChain AS predicted_lang FROM s)
         |SELECT *, CAST((predicted_lang = lang) AS INT) AS label_match FROM p""".stripMargin
    },

    "q20_doc_fingerprint" ->
      s"""WITH $shingleCte
         |SELECT doc_id,
         |       CAST(len(shingles) AS BIGINT) AS shingle_count,
         |       substr(list_min(list_transform(shingles, s -> md5(s))), 1, 16) AS fp_min,
         |       substr(list_max(list_transform(shingles, s -> md5(s))), 1, 16) AS fp_max
         |FROM sh""".stripMargin,

    "q21_exact_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc_id,
        |       COUNT(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,

    "q22_minhash_dedup_pairs" ->
      s"""WITH $minhashPairCtes
         |SELECT doc_a, doc_b, inter, uni, jaccard_bp FROM p""".stripMargin,

    // Directional containment over the same band candidates; the
    // oracle is the direct pairwise form (the Spark side's
    // distinct-text-grain optimization is row-identical, q22's
    // equivalence argument).
    "q96_containment" ->
      s"""WITH $minhashCandCtes,
         |cv AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) AS BIGINT) AS size_a,
         |         CAST(len(sb.shingles) AS BIGINT) AS size_b
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |cc AS (
         |  SELECT doc_a, doc_b, inter, size_a, size_b,
         |         CASE WHEN size_a = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / size_a) AS BIGINT)
         |         END AS cont_ab_bp,
         |         CASE WHEN size_b = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / size_b) AS BIGINT)
         |         END AS cont_ba_bp
         |  FROM cv)
         |SELECT * FROM cc
         |WHERE GREATEST(cont_ab_bp, cont_ba_bp) >= 8000""".stripMargin,

    // Connected components over q22's pair set (min-label transitive
    // closure; twin of Clustering.nearDupClusters). `reach` carries
    // every (node, reachable-label) pair — fine at oracle scale; the
    // Spark side is the O(log n)-round star-contraction instead.
    "q42_neardup_clusters" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM p),
         |reach(node, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
         |comp AS (
         |  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY 1)
         |SELECT d.doc_id, c.component,
         |       COUNT(*) OVER (PARTITION BY c.component) AS cluster_size,
         |       first_value(d.doc_id) OVER (
         |         PARTITION BY c.component
         |         ORDER BY coalesce(length(d.text), -1) DESC, d.doc_id ASC)
         |         AS canonical_doc_id
         |FROM documents d JOIN comp c ON d.doc_id = c.doc_id""".stripMargin,

    "q23_ngram_dedup_kept" ->
      s"""WITH $shingleCte,
         |fp AS (
         |  SELECT doc_id,
         |         substr(list_min(list_transform(shingles, s -> md5(s))), 1, 16) AS fp_min
         |  FROM sh),
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM fp a JOIN fp b ON a.fp_min = b.fp_min AND a.doc_id < b.doc_id),
         |v AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) + len(sb.shingles)
         |              - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |losers AS (
         |  SELECT DISTINCT doc_b FROM v
         |  WHERE uni > 0 AND CAST(FLOOR(10000.0 * inter / uni) AS BIGINT) >= 5000)
         |SELECT doc_id, lang, source FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_b = d.doc_id)""".stripMargin,

    "q24_simhash" -> s"WITH $simhashSigCte SELECT doc_id, simhash FROM sig",

    "q31_simhash_pairs" -> {
      val half = 1L << (graft.ops.Dedup.SimhashBits / 2)
      s"""WITH $simhashSigCte,
         |blk AS (
         |  SELECT doc_id, simhash,
         |         CAST(FLOOR(simhash / $half.0) AS BIGINT) AS blk
         |  FROM sig)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
    },

    "q25_knn_bruteforce" ->
      s"""WITH $embQuantCte,
         |queries AS (SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |scored AS (
         |  SELECT n.vec_id AS neighbor_id, queries.query_id,
         |         CAST(list_sum(list_transform(range(1, len(n.q) + 1),
         |              i -> n.q[i] * queries.q_q[i])) AS BIGINT) AS dot,
         |         n.n2, queries.q_n2
         |  FROM n, queries WHERE n.vec_id != queries.query_id),
         |c AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM scored),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM c)
         |SELECT query_id, neighbor_id, cos_bp, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin,

    // q25 with the label-inequality filter: negatives = most-similar
    // DIFFERENT-label vectors (label joined from the base table; the
    // shared quant CTE stays untouched).
    "q72_hard_negatives" ->
      s"""WITH $embQuantCte,
         |lab AS (
         |  SELECT n.vec_id, e.label, n.q, n.n2
         |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id),
         |queries AS (
         |  SELECT vec_id AS query_id, label AS q_label, q AS q_q, n2 AS q_n2
         |  FROM lab WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |scored AS (
         |  SELECT lab.vec_id AS neighbor_id, lab.label, queries.query_id,
         |         CAST(list_sum(list_transform(range(1, len(lab.q) + 1),
         |              i -> lab.q[i] * queries.q_q[i])) AS BIGINT) AS dot,
         |         lab.n2, queries.q_n2
         |  FROM lab, queries WHERE lab.label != queries.q_label),
         |c AS (
         |  SELECT query_id, neighbor_id, label,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM scored),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM c)
         |SELECT query_id, neighbor_id, label, cos_bp, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q26_ann_lsh" ->
      s"""WITH $embQuantCte,
         |bkt AS (SELECT *, $signBucketExpr AS bucket FROM n),
         |queries AS (SELECT vec_id AS query_id, bucket, q AS q_q, n2 AS q_n2
         |            FROM bkt WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |scored AS (
         |  SELECT bkt.vec_id AS neighbor_id, queries.query_id,
         |         CAST(list_sum(list_transform(range(1, len(bkt.q) + 1),
         |              i -> bkt.q[i] * queries.q_q[i])) AS BIGINT) AS dot,
         |         bkt.n2, queries.q_n2
         |  FROM bkt JOIN queries ON bkt.bucket = queries.bucket
         |  WHERE bkt.vec_id != queries.query_id),
         |c AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM scored),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |                               ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM c)
         |SELECT query_id, neighbor_id, cos_bp, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 3""".stripMargin,

    "q27_embedding_neardup" ->
      s"""WITH $embQuantCte,
         |bkt AS (SELECT *, $signBucketExpr AS bucket FROM n),
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         CAST(list_sum(list_transform(range(1, len(a.q) + 1),
         |              i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
         |         a.n2 AS n2a, b.n2 AS n2b
         |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |c AS (
         |  SELECT vec_a, vec_b,
         |         CASE WHEN n2a = 0 OR n2b = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM pairs)
         |SELECT * FROM c WHERE cos_bp >= 2000""".stripMargin,

    "q33_bpe_tokens" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang,
         |         regexp_extract_all(text, '${graft.ops.TextAnalysis.BpePattern}') AS btoks
         |  FROM documents)
         |SELECT doc_id, lang,
         |       CAST(len(btoks) AS BIGINT) AS bpe_token_count,
         |       CAST(len(list_distinct(btoks)) AS BIGINT) AS bpe_distinct_count,
         |       CAST(list_sum(list_transform(btoks, x -> length(x))) AS BIGINT) AS bpe_token_chars
         |FROM b""".stripMargin,

    "q35_median_quantity" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT l_returnflag,
        |       CAST(FLOOR(AVG(l_quantity) * 100) AS BIGINT) AS median_cents,
        |       CAST(MIN(n) AS BIGINT) AS n_rows
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY 1""".stripMargin,

    // q37/q38: the sketch estimate itself is engine-specific, so the
    // Spark side emits (exact twin, sketch-within-bound verdict) and
    // the oracle's verdict column is literal 1 — a sketch out of bound
    // flips sketch_ok to 0 on the Spark side and fails the hash match.
    "q37_approx_distinct" ->
      """SELECT o_orderpriority,
        |       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
        |       CAST(1 AS INT) AS sketch_ok
        |FROM orders GROUP BY 1""".stripMargin,

    "q38_approx_median" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |         count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL)
        |SELECT l_returnflag,
        |       CAST(FLOOR(AVG(l_quantity) * 100) AS BIGINT) AS median_cents,
        |       CAST(MIN(n) AS BIGINT) AS n_rows,
        |       CAST(1 AS INT) AS sketch_ok
        |FROM r
        |WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
        |GROUP BY 1""".stripMargin,

    "q36_rollup_totals" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q39_user_activity" ->
      """SELECT user_id, COUNT(*) AS action_count,
        |       CAST(SUM(CASE WHEN event_type = 'purchase'
        |                     THEN CAST(FLOOR(value * 100.0) AS BIGINT)
        |                     ELSE 0 END) AS BIGINT) AS purchase_cents
        |FROM events
        |GROUP BY 1
        |ORDER BY action_count DESC, user_id ASC
        |LIMIT 10""".stripMargin,

    "q40_user_visit_action" ->
      s"""$sessionCte
         |SELECT strftime(ts, '%Y-%m-%d') AS date,
         |       user_id, session_id,
         |       event_id % 100 AS page_id,
         |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS action_time,
         |       CASE WHEN event_type = 'view' THEN 'kw_' || CAST(k AS VARCHAR) END AS search_keyword,
         |       CASE WHEN event_type = 'click' THEN k END AS click_category_id,
         |       CASE WHEN event_type = 'click' THEN (k * 131) % 1000 END AS click_product_id,
         |       CASE WHEN event_type = 'purchase'
         |            THEN concat_ws(',', k, (k * 7 + 11) % 100, (k * 13 + 17) % 100) END AS order_category_ids,
         |       CASE WHEN event_type = 'purchase'
         |            THEN concat_ws(',', (k * 131) % 1000, (k * 37 + 41) % 1000) END AS order_product_ids,
         |       CASE WHEN event_type = 'signup'
         |            THEN concat_ws(',', k, (k * 3 + 5) % 100) END AS pay_category_ids,
         |       CASE WHEN event_type = 'signup'
         |            THEN concat_ws(',', (k * 131) % 1000) END AS pay_product_ids,
         |       user_id % 10 AS city_id
         |FROM (SELECT sz.*, CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k FROM sz) t""".stripMargin,

    "q41_category_action_counts" ->
      """WITH e AS (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |u AS (
        |  SELECT k AS category_id, 'click' AS kind FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT CAST(unnest(string_split(
        |           concat_ws(',', k, (k * 7 + 11) % 100, (k * 13 + 17) % 100), ',')) AS BIGINT),
        |         'order' FROM e WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT CAST(unnest(string_split(
        |           concat_ws(',', k, (k * 3 + 5) % 100), ',')) AS BIGINT),
        |         'pay' FROM e WHERE event_type = 'signup')
        |SELECT category_id,
        |       CAST(SUM(CASE WHEN kind = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
        |       CAST(SUM(CASE WHEN kind = 'order' THEN 1 ELSE 0 END) AS BIGINT) AS order_count,
        |       CAST(SUM(CASE WHEN kind = 'pay' THEN 1 ELSE 0 END) AS BIGINT) AS pay_count
        |FROM u GROUP BY 1
        |ORDER BY click_count DESC, order_count DESC, pay_count DESC, category_id ASC
        |LIMIT 10""".stripMargin,

    // ASOF JOIN tie rule: DuckDB picks the max build ts <= probe ts
    // but has no tie-break WITHIN an equal (user_id, ts) — pre-dedup
    // to max event_id, which is exactly the Spark side's
    // (ts, event_id)-ascending last-wins ordering.
    "q43_asof_last_purchase" -> asofSql(innerToleranceSecs = None),

    "q44_asof_recent_purchase" ->
      asofSql(innerToleranceSecs = Some(Queries.AsofToleranceSecs)),

    // Twin of TextClean.dedupLines at LineTokens: 1-based DuckDB list
    // lambdas vs 0-based Spark — the first-occurrence predicate is
    // list_position = i here, array_position = i + 1 there.
    // Twin of KMeans.fit: the same integer Lloyd algebra unrolled
    // symbolically — floor-mean centroids, exact integer squared
    // distances (n2 + c_n2 - 2·dot), cluster-asc tie-break.
    "q52_kmeans" ->
      s"""WITH $kmeansCtes
         |SELECT vec_id, cluster, dist FROM a2""".stripMargin,

    // Twin of KMeans.semDedupKept: within-cluster greedy cosine dedup
    // over the q52 assignment (SemDeDup).
    "q53_semdedup_kept" ->
      s"""WITH $kmeansCtes,
         |prs AS (
         |  SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |         CASE WHEN x.n2 = 0 OR y.n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                     CAST(list_sum(list_transform(range(1, len(x.q) + 1),
         |                          i -> x.q[i] * y.q[i])) AS BIGINT)
         |                     / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))))
         |                   AS BIGINT)
         |         END AS cos_bp
         |  FROM a2 x JOIN a2 y
         |    ON x.cluster = y.cluster AND x.vec_id < y.vec_id),
         |losers AS (
         |  SELECT DISTINCT vec_b FROM prs WHERE cos_bp >= ${Queries.SemDedupBp})
         |SELECT vec_id, cluster FROM a2
         |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.vec_b = a2.vec_id)""".stripMargin,

    // Twin of RangeJoin.purchasesBeforeClicks (DuckDB plans the range
    // predicate as an IEJoin — no bucketing needed oracle-side).
    "q51_purchases_window" ->
      s"""WITH c AS (
         |  SELECT event_id AS click_event_id, epoch_us(ts) AS us
         |  FROM events WHERE event_type = 'click'),
         |p AS (
         |  SELECT epoch_us(ts) AS us, CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase')
         |SELECT c.click_event_id,
         |       COUNT(p.us) AS n_purchases,
         |       CAST(COALESCE(SUM(p.cents), 0) AS BIGINT) AS purchase_cents
         |FROM c LEFT JOIN p
         |  ON p.us >= c.us - ${Queries.RangeWindowSecs * 1000000L} AND p.us < c.us
         |GROUP BY 1""".stripMargin,

    // Twin of Dedup.incrementalDedupKept on the odd/even split. The
    // odd-even near-dup pairs are exactly the cross-parity subset of
    // the all-pairs CTE `p` (same bands, same threshold), so the
    // oracle reuses it; exact replays are the md5 match.
    "q50_incremental_dedup" ->
      s"""WITH $minhashPairCtes,
         |matched AS (
         |  SELECT doc_a AS id FROM p WHERE doc_a % 2 = 1 AND doc_b % 2 = 0
         |  UNION
         |  SELECT doc_b FROM p WHERE doc_b % 2 = 1 AND doc_a % 2 = 0),
         |exact AS (
         |  SELECT DISTINCT o.doc_id FROM documents o
         |  JOIN documents e ON e.doc_id % 2 = 0 AND md5(o.text) = md5(e.text)
         |  WHERE o.doc_id % 2 = 1)
         |SELECT doc_id, lang, source FROM documents d
         |WHERE doc_id % 2 = 1
         |  AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.id = d.doc_id)
         |  AND NOT EXISTS (SELECT 1 FROM exact x WHERE x.doc_id = d.doc_id)""".stripMargin,

    // q50's drop verdicts (matched ∪ exact, negated kept-predicate)
    // aggregated to the per-source savings accounting table.
    "q105_incremental_savings" ->
      s"""WITH $minhashPairCtes,
         |matched AS (
         |  SELECT doc_a AS id FROM p WHERE doc_a % 2 = 1 AND doc_b % 2 = 0
         |  UNION
         |  SELECT doc_b FROM p WHERE doc_b % 2 = 1 AND doc_a % 2 = 0),
         |exact AS (
         |  SELECT DISTINCT o.doc_id FROM documents o
         |  JOIN documents e ON e.doc_id % 2 = 0 AND md5(o.text) = md5(e.text)
         |  WHERE o.doc_id % 2 = 1),
         |b AS (
         |  SELECT d.doc_id, d.source,
         |         CASE WHEN d.text IS NULL THEN 0
         |              ELSE CAST(len(string_split(d.text, ' ')) AS BIGINT)
         |         END AS n_tokens,
         |         CASE WHEN EXISTS (SELECT 1 FROM matched m WHERE m.id = d.doc_id)
         |                OR EXISTS (SELECT 1 FROM exact x WHERE x.doc_id = d.doc_id)
         |              THEN 1 ELSE 0 END AS dropped
         |  FROM documents d WHERE d.doc_id % 2 = 1),
         |g AS (
         |  SELECT source,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(dropped) AS BIGINT) AS n_dropped,
         |         CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
         |         CAST(SUM(CASE WHEN dropped = 1 THEN n_tokens ELSE 0 END)
         |              AS BIGINT) AS tokens_dropped
         |  FROM b GROUP BY 1)
         |SELECT source, n_docs, n_dropped, tokens_total, tokens_dropped,
         |       CASE WHEN tokens_total = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * tokens_dropped / tokens_total) AS BIGINT)
         |       END AS savings_bp
         |FROM g""".stripMargin,

    // Twin of TextClean.repetitionMetrics at LineTokens. DuckDB
    // list_max/list_min of [] are NULL, matching Spark's
    // array_max/array_min — single-token docs get null bigram columns
    // on both sides by the same path.
    "q49_repetition_metrics" -> {
      val L = Queries.LineTokens
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents),
         |c AS (
         |  SELECT doc_id, text, tokens,
         |         CAST(ceil(len(tokens) / $L.0) AS BIGINT) AS n_lines,
         |         list_transform(range(0, CAST(ceil(len(tokens) / $L.0) AS BIGINT)),
         |           i -> array_to_string(tokens[i * $L + 1 : i * $L + $L], ' ')) AS lines,
         |         CASE WHEN len(tokens) >= 2 THEN
         |           list_transform(range(1, len(tokens)),
         |             i -> tokens[i] || ' ' || tokens[i + 1])
         |         ELSE [] END AS bigrams
         |  FROM t),
         |m AS (
         |  SELECT *, list_distinct(lines) AS dlines,
         |         list_max(list_transform(list_distinct(bigrams),
         |           b -> len(list_filter(bigrams, x -> x = b)))) AS maxc
         |  FROM c),
         |tp AS (
         |  SELECT *, list_min(list_filter(list_distinct(bigrams),
         |           b -> len(list_filter(bigrams, x -> x = b)) = maxc)) AS top
         |  FROM m)
         |SELECT doc_id, n_lines,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (n_lines - len(dlines)) / n_lines) AS BIGINT)
         |       END AS dup_line_bp,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |                   (list_sum(list_transform(lines, x -> length(x))) -
         |                    list_sum(list_transform(dlines, x -> length(x))))
         |                   / length(text)) AS BIGINT)
         |       END AS dup_line_char_bp,
         |       top AS top_bigram,
         |       CASE WHEN text IS NULL OR maxc IS NULL THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * maxc * length(top) / length(text)) AS BIGINT)
         |       END AS top_bigram_bp
         |FROM tp""".stripMargin
    },

    "q48_vocab_top" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         |SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
         |FROM t GROUP BY 1
         |ORDER BY term_freq DESC, token ASC
         |LIMIT ${Queries.VocabTopK}""".stripMargin,

    // the exact term-frequency head: heavyHitters' Misra-Gries
    // candidate pass is a superset of every token above n/(m+1), and
    // the recount is exact — so the ranking must equal the q48 head
    // (minus doc_freq). The shared oracle PINS that guarantee.
    "q54_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         |SELECT token, COUNT(*) AS term_freq
         |FROM t GROUP BY 1
         |ORDER BY term_freq DESC, token ASC
         |LIMIT ${Queries.VocabTopK}""".stripMargin,

    // Decontamination joins the raw gram STRINGS here; the Spark side
    // joins 64-bit gram hashes internally (the key never reaches the
    // output, so the engines agree on the flagged set).
    "q55_decontaminate" -> {
      val n = Queries.ContamN; val m = Queries.ContamEvalMod
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${n - 2}),
         |           i -> array_to_string(t[i : i + ${n - 1}], ' '))) AS gram
         |  FROM toks WHERE len(t) >= $n),
         |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % $m = 0)
         |SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hits
         |FROM grams g JOIN bench USING (gram)
         |WHERE g.doc_id % $m <> 0
         |GROUP BY 1""".stripMargin
    },

    "q56_pack_sequences" -> {
      val s = Queries.PackShards; val l = Queries.PackSeqLen
      s"""WITH t AS (
         |  SELECT doc_id, doc_id % $s AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (
         |  SELECT doc_id, shard, token_count,
         |         CAST(COALESCE(SUM(token_count) OVER (
         |           PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS start_offset
         |  FROM t)
         |SELECT doc_id, shard, token_count, start_offset,
         |       CAST(FLOOR(start_offset / $l.0) AS BIGINT) AS seq_id
         |FROM c""".stripMargin
    },

    "q57_context_chunks" -> {
      val c = Queries.ChunkTokens; val s = Queries.ChunkStride
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tok
         |  FROM documents WHERE text IS NOT NULL),
         |b AS (
         |  SELECT doc_id, tok,
         |         GREATEST(CAST(FLOOR((len(tok) - $c + ${s - 1}) / $s.0)
         |           AS BIGINT), 0) AS last_idx
         |  FROM t)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |       array_to_string(tok[CAST(i * $s + 1 AS BIGINT)
         |         : CAST(i * $s + $c AS BIGINT)], ' ') AS chunk_text
         |FROM b, unnest(range(0, last_idx + 1)) AS u(i)""".stripMargin
    },

    "q58_epoch_mix" -> {
      val cases = Queries.EpochWeights.toSeq.sortBy(_._1).map { case (src, w) =>
        s"WHEN source = '$src' THEN ${w + 1}"
      }.mkString(" ")
      s"""SELECT doc_id, source, CAST(e AS BIGINT) AS epoch
         |FROM documents,
         |     unnest(range(1, CASE $cases ELSE 2 END)) AS u(e)""".stripMargin
    },

    // float32→double promotion is exact, and both sides compute
    // (x*127)/scale with identical associativity, so the codes are
    // bit-identical (same reasoning as the money convention).
    "q59_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_max(list_transform(embedding, x -> abs(x)))
        |           AS DOUBLE) AS scale
        |  FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT vec_id,
        |       CAST(FLOOR(scale * 1000000.0) AS BIGINT) AS scale_ppm,
        |       CAST(i - 1 AS BIGINT) AS dim_idx,
        |       CAST(CASE WHEN scale = 0 THEN 0
        |            ELSE FLOOR(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |                       * 127.0 / scale) END AS BIGINT) AS code
        |FROM s, unnest(range(1, len(embedding) + 1)) AS u(i)""".stripMargin,

    "q61_pq_ann" -> {
      val m = Queries.PqM; val k = Queries.PqK
      s"""WITH $embQuantCte,
         |subs AS (
         |  SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         q[CAST(s * (len(q) // $m) + 1 AS BIGINT)
         |           : CAST((s + 1) * (len(q) // $m) AS BIGINT)] AS qs
         |  FROM n, unnest(range(0, $m)) AS u(s)),
         |sv AS (
         |  SELECT vec_id, sub, qs,
         |         CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS n2s
         |  FROM subs),
         |book AS (SELECT sub, vec_id AS code, qs AS centroid, n2s AS c_n2
         |         FROM sv WHERE vec_id < $k),
         |dists AS (
         |  SELECT v.vec_id, v.sub, b.code,
         |         v.n2s + b.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(v.qs) + 1),
         |           i -> v.qs[i] * b.centroid[i])) AS BIGINT) AS dist
         |  FROM sv v JOIN book b USING (sub)),
         |enc AS (
         |  SELECT vec_id, sub, CAST(MIN(dist * 256 + code) % 256 AS BIGINT) AS code
         |  FROM dists GROUP BY 1, 2),
         |pair AS (
         |  SELECT d.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         CAST(SUM(d.dist) AS BIGINT) AS adc_dist
         |  FROM enc e JOIN dists d ON e.sub = d.sub AND e.code = d.code
         |  WHERE d.vec_id % ${Queries.KnnQueryMod} = 0 AND e.vec_id != d.vec_id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
         |  FROM pair)
         |SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin
    },

    // IVF-PQ = q32's routing CTEs + q61's PQ CTEs, label carried
    // through encoding; nProbe=1 (pr = 1) keeps routing deterministic.
    // Unlike q61 (seed book), this runs the TRAINED codebook path:
    // one integer-Lloyd refinement of the seed book, symbolically
    // unrolled (the q52 kmeans pattern) — ref/book2/dists2/enc2
    // reproduce ProductQuant.refineCodebook's floor-mean update and
    // re-encode exactly (floor of an exact-int double division and
    // min-packed argmin are both bit-stable cross-engine).
    "q62_ivf_pq" -> {
      val m = Queries.PqM; val k = Queries.PqK
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, label, q,
         |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
         |  FROM e),
         |subs AS (
         |  SELECT vec_id, label, CAST(s AS BIGINT) AS sub,
         |         q[CAST(s * (len(q) // $m) + 1 AS BIGINT)
         |           : CAST((s + 1) * (len(q) // $m) AS BIGINT)] AS qs
         |  FROM n, unnest(range(0, $m)) AS u(s)),
         |sv AS (
         |  SELECT vec_id, label, sub, qs,
         |         CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS n2s
         |  FROM subs),
         |book AS (SELECT sub, vec_id AS code, qs AS centroid, n2s AS c_n2
         |         FROM sv WHERE vec_id < $k),
         |dists AS (
         |  SELECT v.vec_id, v.label, v.sub, b.code,
         |         v.n2s + b.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(v.qs) + 1),
         |           i -> v.qs[i] * b.centroid[i])) AS BIGINT) AS dist
         |  FROM sv v JOIN book b USING (sub)),
         |enc AS (
         |  SELECT vec_id, label, sub,
         |         CAST(MIN(dist * 256 + code) % 256 AS BIGINT) AS code
         |  FROM dists GROUP BY 1, 2, 3),
         |ref AS (
         |  SELECT en.sub, en.code, i AS pos,
         |         CAST(FLOOR(CAST(SUM(v.qs[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM enc en JOIN sv v ON v.vec_id = en.vec_id AND v.sub = en.sub,
         |       unnest(range(1, len(v.qs) + 1)) rr(i)
         |  GROUP BY 1, 2, 3),
         |book2 AS (
         |  SELECT sub, code, centroid,
         |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
         |  FROM (SELECT sub, code, list(c ORDER BY pos) AS centroid
         |        FROM ref GROUP BY sub, code)),
         |dists2 AS (
         |  SELECT v.vec_id, v.label, v.sub, b.code,
         |         v.n2s + b.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(v.qs) + 1),
         |           i -> v.qs[i] * b.centroid[i])) AS BIGINT) AS dist
         |  FROM sv v JOIN book2 b USING (sub)),
         |enc2 AS (
         |  SELECT vec_id, label, sub,
         |         CAST(MIN(dist * 256 + code) % 256 AS BIGINT) AS code
         |  FROM dists2 GROUP BY 1, 2, 3),
         |centdim AS (
         |  SELECT label, i AS pos,
         |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM n, unnest(range(1, len(q) + 1)) t(i)
         |  GROUP BY label, i),
         |cent AS (
         |  SELECT label, list(c ORDER BY pos) AS centroid FROM centdim GROUP BY label),
         |c2 AS (
         |  SELECT label, centroid,
         |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
         |  FROM cent),
         |queries AS (
         |  SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n
         |  WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |probe AS (
         |  SELECT query_id, c2.label,
         |         CASE WHEN q_n2 = 0 OR c_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                     CAST(list_sum(list_transform(range(1, len(q_q) + 1),
         |                          i -> q_q[i] * centroid[i])) AS BIGINT)
         |                     / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS c_cos
         |  FROM queries, c2),
         |assigned AS (
         |  SELECT query_id, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY c_cos DESC, label ASC) AS pr
         |    FROM probe) WHERE pr = 1),
         |pair AS (
         |  SELECT a.query_id, a.label, en.vec_id AS neighbor_id,
         |         CAST(SUM(d.dist) AS BIGINT) AS adc_dist
         |  FROM assigned a
         |  JOIN enc2 en ON en.label = a.label AND en.vec_id != a.query_id
         |  JOIN dists2 d ON d.vec_id = a.query_id AND d.sub = en.sub
         |              AND d.code = en.code
         |  GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
         |  FROM pair)
         |SELECT query_id, label, neighbor_id, adc_dist, CAST(rank AS INT) AS rank
         |FROM ranked WHERE rank <= 10""".stripMargin
    },

    "q63_corpus_split" -> {
      val t = Queries.SplitTrainBp; val v = Queries.SplitValBp
      // INNER mod must be pmod-wrapped to match Spark for negative
      // doc_id (hash-minted ids are ~half negative): DuckDB % keeps
      // the dividend's sign and 1000003*48271 % 10000 = 4813 ≠ 0, so
      // the sign leaks through the multiply — wrapping only the outer
      // mod would NOT be equivalent. After the wrap the operand is
      // non-negative and the outer % matches pmod exactly.
      s"""WITH s AS (
         |  SELECT lang,
         |         (((doc_id % 1000003 + 1000003) % 1000003)
         |           * 48271 + 12345) % 10000 AS split_bp
         |  FROM documents)
         |SELECT lang,
         |       CASE WHEN split_bp < $t THEN 'train'
         |            WHEN split_bp < ${t + v} THEN 'val'
         |            ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs
         |FROM s GROUP BY 1, 2""".stripMargin
    },

    // q22's pair CTEs + the q63 split expression applied to BOTH pair
    // sides as a pure function of the ids (no corpus re-join — same
    // shape as the Spark side). least/greatest collapse the unordered
    // split pair; is_cross is functionally determined by the keys.
    "q106_split_leakage" -> {
      val t = Queries.SplitTrainBp; val v = Queries.SplitValBp
      def sp(c: String) = {
        val bp = s"((($c % 1000003 + 1000003) % 1000003) * 48271 + 12345) % 10000"
        s"""CASE WHEN $bp < $t THEN 'train'
           |     WHEN $bp < ${t + v} THEN 'val'
           |     ELSE 'test' END""".stripMargin
      }
      s"""WITH $minhashPairCtes,
         |sp AS (
         |  SELECT least(${sp("doc_a")}, ${sp("doc_b")}) AS split_lo,
         |         greatest(${sp("doc_a")}, ${sp("doc_b")}) AS split_hi,
         |         jaccard_bp
         |  FROM p)
         |SELECT split_lo, split_hi,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(MAX(jaccard_bp) AS BIGINT) AS max_jaccard_bp,
         |       CAST(CASE WHEN split_lo <> split_hi THEN 1 ELSE 0 END
         |            AS BIGINT) AS is_cross
         |FROM sp GROUP BY 1, 2""".stripMargin
    },

    // q65's gram/dup/hits chain + per-doc drop list applied by a
    // 1-based indexed lambda (Spark's filter index is 0-based; the
    // engine compares i+1).
    "q78_substring_scrub" -> {
      val n = graft.ops.Dedup.SpanGram
      s"""WITH toks AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS p,
         |         array_to_string(t[i : i + ${n - 1}], ' ') AS g
         |  FROM toks, unnest(range(1, len(t) - ${n - 2})) AS u(i)
         |  WHERE len(t) >= $n),
         |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         |hits AS (
         |  SELECT DISTINCT doc_id, p + o AS pos
         |  FROM grams JOIN dup USING (g), unnest(range(0, $n)) AS v(o)),
         |drops AS (SELECT doc_id, list(pos) AS drops FROM hits GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       CAST(len(t.t) - COALESCE(len(d.drops), 0) AS BIGINT) AS kept_tokens,
         |       CASE WHEN d.drops IS NULL THEN t.text
         |            -- array_to_string([]) is NULL in DuckDB but
         |            -- array_join([]) is '' in Spark — coalesce
         |            ELSE COALESCE(array_to_string(list_filter(t.t, (x, i) ->
         |              NOT list_contains(d.drops, CAST(i AS BIGINT))), ' '), '')
         |       END AS clean_text
         |FROM toks t LEFT JOIN drops d USING (doc_id)""".stripMargin
    },

    // Like q55: the oracle joins raw gram STRINGS where the Spark
    // side joins xxhash64 of the gram internally (the key never
    // reaches the output).
    "q65_substring_dup" -> {
      val n = graft.ops.Dedup.SpanGram
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS p,
         |         array_to_string(t[i : i + ${n - 1}], ' ') AS g
         |  FROM toks, unnest(range(1, len(t) - ${n - 2})) AS u(i)
         |  WHERE len(t) >= $n),
         |dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         |hits AS (
         |  SELECT DISTINCT doc_id, p + o AS pos
         |  FROM grams JOIN dup USING (g), unnest(range(0, $n)) AS v(o)),
         |agg AS (SELECT doc_id, COUNT(*) AS dup_tokens FROM hits GROUP BY 1)
         |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
         |       COALESCE(a.dup_tokens, 0) AS dup_tokens,
         |       CAST(FLOOR(10000.0 * COALESCE(a.dup_tokens, 0) / len(t.t))
         |         AS BIGINT) AS dup_bp
         |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin
    },

    // Every arithmetic step is an IEEE double op on exact-integer
    // operands in the same textual order as the Spark expression
    // (rational idf, dyadic k1/b — no cross-engine ln), and each
    // term's contribution floors to BIGINT before the sum, so the
    // per-doc score is an order-free integer sum. See ops/Retrieval.
    "q66_bm25" -> {
      val vals = graft.ops.Retrieval.DemoQueries
        .map { case (id, tok) => s"($id, '$tok')" }.mkString(", ")
      s"""WITH q AS (
         |  SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, token
         |  FROM (VALUES $vals) v(query_id, token)),
         |toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
         |st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(CAST(SUM(dl) AS BIGINT) AS DOUBLE)
         |           / CAST(COUNT(*) AS BIGINT) AS avgdl
         |  FROM dl),
         |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
         |tf AS (
         |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM tok JOIN (SELECT DISTINCT token FROM q) qt USING (token)
         |  GROUP BY 1, 2),
         |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |contrib AS (
         |  SELECT q.query_id, tf.doc_id,
         |         CAST(FLOOR(1000000.0
         |           * ((2.0 * (st.n_docs - dfreq.df) + 1.0)
         |             / (2.0 * dfreq.df + 1.0))
         |           * ((tf.tf * 2.5)
         |             / (tf.tf + 1.5
         |               * (0.25 + 0.75 * (dl.dl / st.avgdl))))) AS BIGINT) AS c
         |  FROM tf
         |  JOIN dfreq USING (token)
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  JOIN q ON q.token = tf.token, st),
         |s AS (
         |  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS score_fp
         |  FROM contrib GROUP BY 1, 2),
         |r AS (
         |  SELECT query_id, doc_id, score_fp,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY score_fp DESC, doc_id) AS BIGINT) AS rank
         |  FROM s)
         |SELECT query_id, rank, doc_id, score_fp
         |FROM r WHERE rank <= ${Queries.Bm25TopK}""".stripMargin
    },

    "q67_cube_totals" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    // The bucket is md5 hex chars 5-8 parsed as 16 bits — the
    // engine's portable-hash convention (same instr-nibble parse as
    // the simhash twin); weights are the disclosed stand-in
    // (bucket % 1001) - 500, so scores are integer-exact.
    "q69_quality_classifier" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
         |  WHERE text IS NOT NULL)
         |SELECT doc_id, CAST(len(tok) AS BIGINT) AS token_count,
         |       CAST(list_sum(list_transform(tok,
         |         x -> ($bucket % 1001) - 500)) AS BIGINT) AS score,
         |       CAST(CAST(list_sum(list_transform(tok,
         |         x -> ($bucket % 1001) - 500)) AS BIGINT) >= 0 AS INT) AS keep
         |FROM t""".stripMargin
    },

    "q75_retention" -> {
      val m = Queries.RetentionMaxOffset
      val (wFrom, wTo) = Queries.RetentionWindow
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
         |  WHERE CAST(ts AS DATE) BETWEEN DATE '$wFrom' AND DATE '$wTo'),
         |c AS (SELECT user_id, MIN(d) AS cohort_d FROM ud GROUP BY 1)
         |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_date,
         |       CAST(d - cohort_d AS BIGINT) AS offset_days,
         |       CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM ud JOIN c USING (user_id)
         |WHERE d - cohort_d <= $m
         |GROUP BY 1, 2""".stripMargin
    },

    "q79_eval_sample" -> {
      val k = Queries.EvalSampleK
      s"""WITH d AS (
         |  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS draw
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY draw, doc_id) AS BIGINT) AS rk
         |  FROM d)
         |SELECT lang, rk, doc_id FROM r WHERE rk <= $k""".stripMargin
    },

    "q80_source_cap" -> {
      val k = Queries.SourceCapK
      s"""WITH d AS (
         |  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS draw
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY draw, doc_id) AS BIGINT) AS rk
         |  FROM d)
         |SELECT source, rk, doc_id FROM r WHERE rk <= $k""".stripMargin
    },

    // the Spark side's packed-struct argmax ≡ row_number() = 1 over
    // (priority desc, doc_id asc) — the window formulation is the
    // oracle twin of the partial-aggregable min(struct) plan.
    "q82_canonical_by_source" -> {
      val cases = Queries.SourcePriority.toSeq.sortBy(_._1)
        .map { case (s, p) => s"WHEN source = '$s' THEN $p" }.mkString(" ")
      s"""WITH d AS (
         |  SELECT doc_id, md5(text) AS text_hash,
         |         CAST(CASE $cases ELSE 1 END AS BIGINT) AS prio
         |  FROM documents WHERE text IS NOT NULL),
         |r AS (
         |  SELECT text_hash, doc_id, prio,
         |         ROW_NUMBER() OVER (PARTITION BY text_hash
         |           ORDER BY prio DESC, doc_id ASC) AS rn,
         |         COUNT(*) OVER (PARTITION BY text_hash) AS dup_count
         |  FROM d)
         |SELECT text_hash, doc_id AS canonical_doc_id,
         |       prio AS canonical_priority,
         |       CAST(dup_count AS BIGINT) AS dup_count
         |FROM r WHERE rn = 1""".stripMargin
    },

    // first 32 bits of the md5 draw via the house instr-nibble parse
    // (Spark's conv(hex,16,10) has no DuckDB twin); threshold =
    // floor(2^32 * cap / n_src), one exact-int double divide (§7.3).
    "q81_source_cap_rate" -> {
      val n = Queries.SourceCapRateN
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH c AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src
         |  FROM documents GROUP BY 1),
         |d AS (
         |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, source, CAST($draw32 AS BIGINT) AS draw32
         |  FROM d)
         |SELECT p.doc_id, p.source, c.n_src,
         |       CAST(p.draw32 <
         |         CAST(FLOOR(4294967296.0 * $n / c.n_src) AS BIGINT) AS INT) AS keep
         |FROM p JOIN c ON p.source = c.source""".stripMargin
    },

    "q76_active_users" -> {
      val w = Queries.ActiveWindowDays
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |days AS (SELECT DISTINCT d AS report_d FROM ud),
         |wau AS (
         |  SELECT days.report_d, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
         |  FROM days JOIN ud
         |    ON ud.d <= days.report_d AND ud.d > days.report_d - $w
         |  GROUP BY 1),
         |dau AS (
         |  SELECT d AS report_d, CAST(COUNT(*) AS BIGINT) AS dau
         |  FROM ud GROUP BY 1)
         |SELECT strftime(dau.report_d, '%Y-%m-%d') AS report_date, dau, wau,
         |       CAST(FLOOR(10000.0 * dau / wau) AS BIGINT) AS stickiness_bp
         |FROM dau JOIN wau USING (report_d)""".stripMargin
    },

    "q77_p95_quantity" -> {
      val p = Queries.P95Bp
      s"""WITH h AS (
         |  SELECT l_returnflag, l_quantity AS v, COUNT(*) AS cnt
         |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
         |  FROM h)
         |SELECT l_returnflag,
         |       CAST(FLOOR(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
         |         THEN v END) * 100) AS BIGINT) AS quantile_cents,
         |       CAST(MIN(n) AS BIGINT) AS n_rows
         |FROM c GROUP BY 1""".stripMargin
    },

    "q73_profile" -> {
      val rows = Queries.ProfileCols.map { c =>
        s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |       CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |       CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(MIN($c) AS VARCHAR) AS min_value,
           |       CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM documents""".stripMargin
      }
      rows.mkString("\nUNION ALL\n")
    },

    "q71_mixture_plan" -> {
      val cases = Queries.MixWeights.toSeq.sortBy(_._1).map { case (s, w) =>
        s"WHEN source = '$s' THEN $w"
      }.mkString(" ")
      val b = Queries.MixBudget
      s"""WITH a AS (
         |  SELECT source,
         |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS available_tokens,
         |         CAST(CASE $cases ELSE 1 END AS BIGINT) AS w
         |  FROM documents WHERE text IS NOT NULL
         |  GROUP BY source),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS total_w FROM a),
         |c AS (
         |  SELECT source, available_tokens,
         |         CAST(FLOOR(10000.0 * w / total_w) AS BIGINT) AS target_bp
         |  FROM a, t),
         |d AS (
         |  SELECT *, CAST(FLOOR($b.0 * target_bp / 10000.0) AS BIGINT) AS desired_tokens
         |  FROM c),
         |e AS (
         |  SELECT *, LEAST(10000, CAST(FLOOR(10000.0 * desired_tokens / available_tokens)
         |    AS BIGINT)) AS keep_bp
         |  FROM d),
         |f AS (
         |  SELECT *, CAST(FLOOR(available_tokens * keep_bp / 10000.0) AS BIGINT)
         |    AS planned_tokens
         |  FROM e)
         |SELECT source, available_tokens, target_bp, desired_tokens, keep_bp,
         |       planned_tokens,
         |       GREATEST(0, desired_tokens - planned_tokens) AS deficit
         |FROM f""".stripMargin
    },

    // BPE rounds unrolled symbolically (the q52 kmeans pattern): each
    // round = pair count + argmax (b_r), then greedy left-to-right
    // application — candidate starts, consecutive-run islands, keep
    // odd ranks (parity ≡ the Spark side's fold semantics, e.g.
    // "aaa" + (a,a) → [aa, a]), drop consumed positions, regroup.
    "q70_bpe_merges" -> {
      val R = Queries.BpeRounds
      val unions = (1 to R)
        .map(r => s"SELECT round, merge_left, merge_right, pair_count FROM b$r")
        .mkString("\nUNION ALL ")
      s"""WITH ${bpeChain(R, applyLast = false)}
         |$unions""".stripMargin
    },

    // q70's chain extended with the final apply: the re-segmented
    // vocabulary (the inference half, Bpe.segment).
    "q74_bpe_segment" -> {
      val R = Queries.BpeRounds
      s"""WITH ${bpeChain(R, applyLast = true)}
         |SELECT word, freq, array_to_string(syms, '|') AS pieces
         |FROM w$R""".stripMargin
    },

    // rank_before = RANK()-1 = count of docs with strictly greater
    // ttr_bp — the value-grain prefix the Spark side computes over
    // the ≤10001-row score-domain table (see TrainingPrep
    // .curriculumBuckets: value-deterministic, unlike ntile).
    "q68_curriculum_buckets" -> {
      val b = Queries.CurriculumBuckets
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tokens
         |           FROM documents WHERE text IS NOT NULL),
         |s AS (
         |  SELECT doc_id,
         |         CAST(FLOOR(10000.0 * len(list_distinct(tokens)) / len(tokens))
         |           AS BIGINT) AS ttr_bp
         |  FROM t),
         |r AS (
         |  SELECT doc_id, ttr_bp,
         |         RANK() OVER (ORDER BY ttr_bp DESC) - 1 AS rank_before,
         |         COUNT(*) OVER () AS n
         |  FROM s)
         |SELECT doc_id, ttr_bp,
         |       CAST(FLOOR($b.0 * rank_before / n) AS BIGINT) AS bucket
         |FROM r""".stripMargin
    },

    "q60_distinctive_terms" -> {
      val k = Queries.DistinctiveK; val bp = Queries.DistinctiveMaxDfBp
      s"""WITH live AS (
         |  SELECT lang, doc_id, text FROM documents WHERE text IS NOT NULL),
         |stats AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS token, doc_id
         |  FROM live),
         |agg AS (
         |  SELECT lang, token, COUNT(*) AS term_freq,
         |         COUNT(DISTINCT doc_id) AS doc_freq
         |  FROM stats GROUP BY 1, 2),
         |nd AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_docs FROM live GROUP BY 1),
         |ranked AS (
         |  SELECT agg.lang, token, term_freq, doc_freq,
         |         ROW_NUMBER() OVER (PARTITION BY agg.lang
         |           ORDER BY term_freq DESC, token ASC) AS rank
         |  FROM agg JOIN nd ON agg.lang = nd.lang
         |  WHERE doc_freq * 10000 <= $bp * n_docs)
         |SELECT lang, token, term_freq, doc_freq, CAST(rank AS BIGINT) AS rank
         |FROM ranked WHERE rank <= $k""".stripMargin
    },

    "q45_line_dedup" -> {
      val L = Queries.LineTokens
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS tokens FROM documents),
         |c AS (
         |  SELECT doc_id, text,
         |         CAST(ceil(len(tokens) / $L.0) AS BIGINT) AS n_lines,
         |         list_transform(range(0, CAST(ceil(len(tokens) / $L.0) AS BIGINT)),
         |           i -> array_to_string(tokens[i * $L + 1 : i * $L + $L], ' ')) AS chunks
         |  FROM t),
         |k AS (
         |  SELECT doc_id, text, n_lines,
         |         list_filter(chunks, (x, i) -> list_position(chunks, x) = i) AS kept
         |  FROM c)
         |SELECT doc_id,
         |       CASE WHEN text IS NULL THEN NULL ELSE n_lines END AS n_lines,
         |       CAST(len(kept) AS BIGINT) AS n_kept,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (n_lines - len(kept)) / n_lines) AS BIGINT)
         |       END AS removed_bp,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE array_to_string(kept, ' ') END AS cleaned
         |FROM k""".stripMargin
    },

    // identical chain order as TextClean.stripMarkup: tags → space,
    // entities decoded with &amp; LAST, whitespace collapsed, trim.
    // replace() is exact (non-regex) in both engines; the tag/space
    // patterns stay in the portable regex subset.
    "q83_strip_markup" -> {
      val tag = graft.ops.TextClean.TagPattern
      val decoded = graft.ops.TextClean.Entities.foldLeft(
        s"regexp_replace(text, '$tag', ' ', 'g')") { case (acc, (e, r)) =>
        s"replace($acc, '$e', '${r.replace("'", "''")}')"
      }
      val ws = graft.ops.TextClean.WsPattern
      s"""SELECT doc_id,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE CAST(len(regexp_extract_all(text, '$tag')) AS BIGINT)
         |       END AS tag_count,
         |       trim(regexp_replace($decoded, '$ws', ' ', 'g')) AS clean_text
         |FROM documents""".stripMargin
    },

    // IS NOT DISTINCT FROM ≡ Spark's <=> (a doc with NULL text in
    // both snapshots is unchanged); removed docs report their OLD
    // source, added/changed the NEW.
    "q84_snapshot_diff" ->
      """WITH old AS (
        |  SELECT doc_id, md5(text) AS h, source
        |  FROM documents WHERE doc_id % 5 <> 0),
        |nw AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0
        |                  THEN COALESCE(text, '') || ' v2'
        |                  ELSE text END) AS h,
        |         source
        |  FROM documents WHERE doc_id % 7 <> 0),
        |j AS (
        |  SELECT COALESCE(n.source, o.source) AS source,
        |         CASE WHEN o.doc_id IS NULL THEN 'added'
        |              WHEN n.doc_id IS NULL THEN 'removed'
        |              WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
        |              ELSE 'changed' END AS status
        |  FROM old o FULL OUTER JOIN nw n ON o.doc_id = n.doc_id)
        |SELECT source,
        |       CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |       CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |       CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |       CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM j GROUP BY 1""".stripMargin,

    // Twin of TextAnalysis.oovRate: same (term_freq desc, token asc)
    // vocab boundary, same single-IEEE-divide bp rate.
    "q85_oov_rate" ->
      s"""WITH live AS (SELECT * FROM documents WHERE text IS NOT NULL),
         |tok AS (
         |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
         |  FROM live),
         |tf AS (SELECT token, COUNT(*) AS term_freq FROM tok GROUP BY 1),
         |vocab AS (
         |  SELECT token FROM tf
         |  ORDER BY term_freq DESC, token ASC LIMIT ${Queries.OovVocabSize})
         |SELECT t.doc_id, t.lang,
         |       CAST(COUNT(*) AS BIGINT) AS token_count,
         |       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS oov_count,
         |       CAST(FLOOR(10000.0 * SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
         |            / COUNT(*)) AS BIGINT) AS oov_bp
         |FROM tok t LEFT JOIN vocab v USING (token)
         |GROUP BY 1, 2""".stripMargin,

    // Twin of TextAnalysis.cooccurrence. Bigrams via positional
    // self-join (parallel unnests zip in DuckDB) ≡ Spark's zip_with
    // of the token array against its own tail; the score expression
    // is the same IEEE double tree text as the Spark side.
    "q86_cooccur_top" ->
      s"""WITH live AS (SELECT * FROM documents WHERE text IS NOT NULL),
         |tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
         |  FROM live),
         |uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
         |pairs AS (
         |  SELECT a.token AS tok_a, b.token AS tok_b,
         |         CAST(COUNT(*) AS BIGINT) AS pair_count
         |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(pair_count) AS BIGINT) AS total FROM pairs),
         |scored AS (
         |  SELECT p.tok_a, p.tok_b, p.pair_count, ua.cnt AS cnt_a, ub.cnt AS cnt_b,
         |         CAST(FLOOR((10000.0 * CAST(p.pair_count AS DOUBLE) * CAST(t.total AS DOUBLE))
         |              / (CAST(ua.cnt AS DOUBLE) * CAST(ub.cnt AS DOUBLE))) AS BIGINT)
         |           AS score_bp
         |  FROM pairs p, tot t, uni ua, uni ub
         |  WHERE ua.token = p.tok_a AND ub.token = p.tok_b
         |    AND p.pair_count >= ${Queries.CooccurMinCount})
         |SELECT tok_a, tok_b, pair_count, cnt_a, cnt_b, score_bp
         |FROM scored
         |ORDER BY score_bp DESC, tok_a ASC, tok_b ASC
         |LIMIT ${Queries.CooccurTopK}""".stripMargin,

    // Twin of Similarity.labelOutliers: global fixed-point quantize,
    // floor(sum/count) centroid components, exact integer squared
    // distance, (dist desc, vec_id asc) rank per label. The
    // null-element gate mirrors the Spark forall filter (Spark's
    // aggregate would NULL the dist, DuckDB's SUM would skip the dim
    // — exclude such vectors on both sides instead).
    "q87_label_outliers" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND label IS NOT NULL
         |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
         |pos AS (
         |  SELECT label, unnest(q) AS v, unnest(range(1, len(q) + 1)) AS i FROM e),
         |cs AS (
         |  SELECT label, i, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
         |  FROM pos GROUP BY 1, 2),
         |cent AS (
         |  SELECT label, i, CAST(FLOOR(CAST(s AS DOUBLE) / n) AS BIGINT) AS c FROM cs),
         |d AS (
         |  SELECT e.vec_id, e.label,
         |         CAST(SUM((e.q[c.i] - c.c) * (e.q[c.i] - c.c)) AS BIGINT) AS dist
         |  FROM e, cent c WHERE c.label = e.label GROUP BY 1, 2),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY label
         |            ORDER BY dist DESC, vec_id ASC) AS rk
         |  FROM d)
         |SELECT label, vec_id, dist, CAST(rk AS INT) AS rank
         |FROM r WHERE rk <= ${Queries.OutlierTopK}""".stripMargin,

    // Twin of Retention.volumeAnomaly: same ROWS trailing frame, same
    // cross-multiplied z² test — the double expression tree is the
    // SAME TEXT as the Spark side (IEEE multiply is deterministic, so
    // past-2^53 operands round identically on both engines).
    "q88_volume_anomaly" -> {
      val wd = Queries.AnomalyWindowDays
      val k2 = Queries.AnomalyK2
      val mo = Queries.AnomalyMinObs
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS d,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |  GROUP BY 1, 2),
         |w AS (
         |  SELECT event_type, d, cnt,
         |         CAST(COUNT(cnt) OVER win AS BIGINT) AS trail_n,
         |         CAST(COALESCE(SUM(cnt) OVER win, 0) AS BIGINT) AS trail_sum,
         |         CAST(COALESCE(SUM(cnt * cnt) OVER win, 0) AS BIGINT) AS trail_sumsq
         |  FROM daily
         |  WINDOW win AS (PARTITION BY event_type ORDER BY d ASC
         |                 ROWS BETWEEN $wd PRECEDING AND 1 PRECEDING))
         |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, cnt, trail_n, trail_sum,
         |       CAST(CASE WHEN trail_n >= $mo AND
         |         (CAST(trail_n AS DOUBLE) * CAST(cnt AS DOUBLE) - CAST(trail_sum AS DOUBLE))
         |         * (CAST(trail_n AS DOUBLE) * CAST(cnt AS DOUBLE) - CAST(trail_sum AS DOUBLE))
         |         > $k2.0 * (CAST(trail_n AS DOUBLE) * CAST(trail_sumsq AS DOUBLE)
         |                    - CAST(trail_sum AS DOUBLE) * CAST(trail_sum AS DOUBLE))
         |         THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM w""".stripMargin
    },

    // Twin of TrainingPrep.sourceConcentration: same asc rank order,
    // same sorted-rank Gini identity, mirrored divide trees. DuckDB
    // sums in HUGEINT and Spark in BIGINT — identical values while
    // inside the documented n·total_tokens overflow bound.
    "q89_source_concentration" ->
      """WITH s AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT source, tokens,
        |         CAST(ROW_NUMBER() OVER (ORDER BY tokens ASC, source ASC)
        |           AS BIGINT) AS i
        |  FROM s)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
        |       CAST(SUM(tokens) AS BIGINT) AS total_tokens,
        |       CAST(FLOOR((10000.0 * CAST(2 * SUM(i * tokens) - (COUNT(*) + 1) * SUM(tokens) AS DOUBLE))
        |            / CAST(COUNT(*) * SUM(tokens) AS DOUBLE)) AS BIGINT) AS gini_bp,
        |       CAST(FLOOR((10000.0 * CAST(MAX(tokens) AS DOUBLE))
        |            / CAST(SUM(tokens) AS DOUBLE)) AS BIGINT) AS top_share_bp
        |FROM r""".stripMargin,

    // Co-visitation: capped (cap smallest item ids) session baskets,
    // pairwise session counts, integer-bp confidences. The cap rank
    // and the a<b self-join mirror Market.coVisitation's array comb.
    "q90_covisitation" -> {
      val cap = Queries.CoVisitMaxItems
      s"""$sessionCte,
         |it0 AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM sz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS pair_sessions
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.item < b.item
         |  GROUP BY 1, 2),
         |n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM capped GROUP BY 1)
         |SELECT item_a, item_b, pair_sessions,
         |       na.n AS sessions_a, nb.n AS sessions_b,
         |       CAST(pair_sessions * 10000 // na.n AS BIGINT) AS conf_ab_bp,
         |       CAST(pair_sessions * 10000 // nb.n AS BIGINT) AS conf_ba_bp
         |FROM pairs
         |JOIN n na ON na.item = pairs.item_a
         |JOIN n nb ON nb.item = pairs.item_b
         |ORDER BY pair_sessions DESC, item_a, item_b
         |LIMIT ${Queries.CoVisitTopK}""".stripMargin
    },

    // Transition matrix: the lag sits on the session key; prob_bp is
    // the house single integer divide per row.
    "q91_transitions" ->
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |tr AS (
         |  SELECT prev_type, event_type AS next_type,
         |         CAST(COUNT(*) AS BIGINT) AS transitions
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (
         |  SELECT prev_type, CAST(SUM(transitions) AS BIGINT) AS from_total
         |  FROM tr GROUP BY 1)
         |SELECT tr.prev_type, tr.next_type, tr.transitions,
         |       CAST(tr.transitions * 10000 // tot.from_total AS BIGINT) AS prob_bp
         |FROM tr JOIN tot USING (prev_type)""".stripMargin,

    // Next-item pairs: item events sessionized standalone (the
    // contract — gap rule over item events), context as a framed
    // window list. SUM window → HUGEINT, so session_seq is cast.
    "q99_next_item_pairs" -> {
      val cl = Queries.NextItemContext
      s"""WITH iev AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
         |s0 AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS prev_us
         |  FROM iev),
         |s1 AS (
         |  SELECT user_id, event_id, ts_us, item,
         |         CAST(SUM(CASE WHEN prev_us IS NULL
         |                        OR ts_us - prev_us > 1800000000
         |                   THEN 1 ELSE 0 END) OVER (
         |           PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM s0),
         |c AS (
         |  SELECT user_id, session_seq, event_id, item,
         |         list(item) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id
         |           ROWS BETWEEN $cl PRECEDING AND 1 PRECEDING) AS context
         |  FROM s1)
         |SELECT user_id, session_seq, event_id,
         |       array_to_string(context, ',') AS context, item AS label
         |FROM c WHERE len(context) >= 1""".stripMargin
    },

    // q25 (k=AnnRecallK) and q26 re-derived under disjoint CTE names,
    // full-outer-merged at (query_id, neighbor_id) pair grain —
    // recall@k of the LSH index vs exact truth.
    "q100_ann_recall" -> {
      val k = Queries.AnnRecallK
      val hits = "SUM(CASE WHEN in_truth IS NOT NULL AND in_ann IS NOT NULL THEN 1 ELSE 0 END)"
      s"""WITH $embQuantCte,
         |tq AS (SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n
         |       WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |ts AS (
         |  SELECT n.vec_id AS neighbor_id, tq.query_id,
         |         CAST(list_sum(list_transform(range(1, len(n.q) + 1),
         |              i -> n.q[i] * tq.q_q[i])) AS BIGINT) AS dot,
         |         n.n2, tq.q_n2
         |  FROM n, tq WHERE n.vec_id != tq.query_id),
         |tc AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM ts),
         |truth AS (
         |  SELECT query_id, neighbor_id, 1 AS in_truth FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM tc) WHERE rank <= $k),
         |bkt AS (SELECT *, $signBucketExpr AS bucket FROM n),
         |aq AS (SELECT vec_id AS query_id, bucket, q AS q_q, n2 AS q_n2
         |       FROM bkt WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |asc0 AS (
         |  SELECT bkt.vec_id AS neighbor_id, aq.query_id,
         |         CAST(list_sum(list_transform(range(1, len(bkt.q) + 1),
         |              i -> bkt.q[i] * aq.q_q[i])) AS BIGINT) AS dot,
         |         bkt.n2, aq.q_n2
         |  FROM bkt JOIN aq ON bkt.bucket = aq.bucket
         |  WHERE bkt.vec_id != aq.query_id),
         |ac AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM asc0),
         |ann AS (
         |  SELECT query_id, neighbor_id, 1 AS in_ann FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM ac) WHERE rank <= $k),
         |m AS (
         |  SELECT COALESCE(t.query_id, a.query_id) AS query_id, t.in_truth, a.in_ann
         |  FROM truth t FULL JOIN ann a
         |    ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id)
         |SELECT query_id,
         |       CAST(SUM(COALESCE(in_truth, 0)) AS BIGINT) AS n_truth,
         |       CAST(SUM(COALESCE(in_ann, 0)) AS BIGINT) AS n_ann,
         |       CAST($hits AS BIGINT) AS n_hits,
         |       CASE WHEN SUM(COALESCE(in_truth, 0)) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * $hits / SUM(COALESCE(in_truth, 0))) AS BIGINT)
         |       END AS recall_bp
         |FROM m GROUP BY 1""".stripMargin
    },

    // Cross-split LSH candidates (train side % != rem, eval side
    // % = rem over the shared band CTEs), verified by directional
    // containment of the EVAL shingle set.
    "q101_fuzzy_decontaminate" -> {
      val m = Queries.FuzzyEvalMod; val r = Queries.FuzzyEvalRem
      val bp = Queries.FuzzyThresholdBp
      s"""WITH $minhashBandCtes,
         |cand AS (
         |  SELECT DISTINCT t.doc_id AS doc_id, e.doc_id AS eval_doc_id
         |  FROM bands t JOIN bands e
         |    ON t.band = e.band AND t.band_hash = e.band_hash
         |  WHERE t.doc_id % $m != $r AND e.doc_id % $m = $r),
         |v AS (
         |  SELECT cand.doc_id, cand.eval_doc_id,
         |         CAST(len(list_intersect(st.shingles, se.shingles)) AS BIGINT) AS inter,
         |         CAST(len(se.shingles) AS BIGINT) AS size_eval
         |  FROM cand
         |  JOIN sh st ON cand.doc_id = st.doc_id
         |  JOIN sh se ON cand.eval_doc_id = se.doc_id),
         |f AS (
         |  SELECT doc_id, eval_doc_id, inter, size_eval,
         |         CASE WHEN size_eval = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / size_eval) AS BIGINT)
         |         END AS cont_bp
         |  FROM v)
         |SELECT * FROM f WHERE cont_bp >= $bp""".stripMargin
    },

    // q42's recursive cluster assignment folded to a per-source
    // savings report (canonical-kept accounting; null text = 0 tokens).
    "q102_dedup_impact" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM p),
         |reach(node, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
         |comp AS (
         |  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY 1),
         |assign AS (
         |  SELECT d.doc_id, d.source,
         |         CASE WHEN d.text IS NULL THEN 0
         |              ELSE len(string_split(d.text, ' ')) END AS n_tokens,
         |         first_value(d.doc_id) OVER (
         |           PARTITION BY c.component
         |           ORDER BY coalesce(length(d.text), -1) DESC, d.doc_id ASC)
         |           AS canonical_doc_id
         |  FROM documents d JOIN comp c ON d.doc_id = c.doc_id),
         |g AS (
         |  SELECT source,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(CASE WHEN doc_id = canonical_doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |         CAST(SUM(n_tokens) AS BIGINT) AS tokens_total,
         |         CAST(SUM(CASE WHEN doc_id = canonical_doc_id THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
         |  FROM assign GROUP BY 1)
         |SELECT source, n_docs, n_kept, tokens_total, tokens_kept,
         |       CASE WHEN tokens_total = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * (tokens_total - tokens_kept) / tokens_total) AS BIGINT)
         |       END AS savings_bp
         |FROM g""".stripMargin,

    // Systematic PPS: the packSequences shard-cumsum shape + the
    // shifted floor-div pick count (operands kept non-negative so
    // `div`/`//` truncation equals floor in both engines).
    "q98_pps_sample" -> {
      val s = Queries.PpsStride; val sh = Queries.PpsShards
      val r = s"((shard * 48271 + 12345) % $s)"
      s"""WITH base AS (
         |  SELECT doc_id, ((doc_id % $sh + $sh) % $sh) AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
         |  FROM documents WHERE text IS NOT NULL),
         |o AS (
         |  SELECT doc_id, shard, token_count,
         |         CAST(COALESCE(SUM(token_count) OVER (
         |           PARTITION BY shard ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS start_offset
         |  FROM base),
         |p AS (
         |  SELECT doc_id, shard, token_count, start_offset,
         |         CAST((start_offset + token_count - 1 - $r + $s) // $s
         |            - (start_offset - 1 - $r + $s) // $s AS BIGINT) AS picks
         |  FROM o)
         |SELECT doc_id, shard, token_count, start_offset, picks
         |FROM p WHERE picks > 0""".stripMargin
    },

    // Diversity report: raw-string bigram grain twins the
    // TokenGramHash hash grain (q65/q92 convention).
    "q97_source_diversity" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t
        |  FROM documents WHERE text IS NOT NULL),
        |uc AS (
        |  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |u AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS types,
        |         CAST(SUM(c) AS BIGINT) AS tokens,
        |         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM uc GROUP BY 1),
        |bg AS (
        |  SELECT source, array_to_string(t[i : i + 1], ' ') AS g
        |  FROM (SELECT source, string_split(text, ' ') AS t
        |        FROM documents WHERE text IS NOT NULL),
        |       unnest(range(1, len(t))) AS uu(i)
        |  WHERE len(t) >= 2),
        |bc AS (
        |  SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2),
        |b AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS bigram_types,
        |         CAST(SUM(c) AS BIGINT) AS bigrams
        |  FROM bc GROUP BY 1)
        |SELECT u.source, u.tokens, u.types, u.hapax,
        |       COALESCE(b.bigrams, 0) AS bigrams,
        |       COALESCE(b.bigram_types, 0) AS bigram_types,
        |       CASE WHEN u.tokens = 0 THEN 0
        |            ELSE CAST(FLOOR(10000.0 * u.types / u.tokens) AS BIGINT)
        |       END AS ttr_bp,
        |       CASE WHEN u.types = 0 THEN 0
        |            ELSE CAST(FLOOR(10000.0 * u.hapax / u.types) AS BIGINT)
        |       END AS hapax_bp,
        |       CASE WHEN COALESCE(b.bigrams, 0) = 0 THEN 0
        |            ELSE CAST(FLOOR(10000.0 * b.bigram_types / b.bigrams) AS BIGINT)
        |       END AS bigram_ttr_bp
        |FROM u LEFT JOIN b USING (source)""".stripMargin,

    // Ordered funnel: step k's sessions = sessions with a MIN event
    // position for flow[k] strictly after step k−1's — unrolled
    // min-joins, exactly the greedy-earliest fold (see
    // PageFunnel.orderedFunnel's equivalence note).
    "q95_ordered_funnel" -> {
      val flow = Queries.orderedFlow
      val stepCtes = flow.zipWithIndex.map { case (s, i) =>
        val r = i + 1
        if (r == 1)
          s"""fp1 AS (
             |  SELECT user_id, session_seq, MIN(seq) AS s
             |  FROM frows WHERE event_type = '$s' GROUP BY 1, 2)""".stripMargin
        else
          s"""fp$r AS (
             |  SELECT r.user_id, r.session_seq, MIN(r.seq) AS s
             |  FROM frows r JOIN fp${r - 1} p
             |    ON r.user_id = p.user_id AND r.session_seq = p.session_seq
             |  WHERE r.event_type = '$s' AND r.seq > p.s
             |  GROUP BY 1, 2)""".stripMargin
      }.mkString(",\n")
      val reachedRows = flow.indices.map { i =>
        s"SELECT ${i + 1} AS step_idx, CAST(COUNT(*) AS BIGINT) AS sessions_reached FROM fp${i + 1}"
      }.mkString("\n  UNION ALL ")
      val stepRows = flow.zipWithIndex
        .map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
      s"""$sessionCte,
         |frows AS (
         |  SELECT user_id, session_seq, event_type,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS seq
         |  FROM sz),
         |fsess AS (SELECT DISTINCT user_id, session_seq FROM frows),
         |$stepCtes,
         |steps(step_idx, step) AS (VALUES $stepRows),
         |rk AS ($reachedRows),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_sessions FROM fsess),
         |fin AS (
         |  SELECT CAST(s.step_idx AS BIGINT) AS step_idx, s.step,
         |         rk.sessions_reached,
         |         COALESCE(LAG(rk.sessions_reached) OVER (ORDER BY s.step_idx),
         |           tot.total_sessions) AS prev_reached,
         |         tot.total_sessions
         |  FROM steps s JOIN rk ON rk.step_idx = s.step_idx, tot)
         |SELECT step_idx, step, sessions_reached, prev_reached,
         |       CASE WHEN prev_reached = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / prev_reached)
         |              AS BIGINT) END AS conv_from_prev_bp,
         |       CASE WHEN total_sessions = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / total_sessions)
         |              AS BIGINT) END AS conv_from_start_bp
         |FROM fin""".stripMargin
    },

    // RFM tiers: RANK()−1 at user grain ≡ the Spark side's
    // value-grain strictly-better prefix (ties share a rank), the
    // q68 twin convention, applied per metric.
    "q94_rfm" -> {
      val b = Queries.RfmBuckets
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(date_diff('day', MAX(CAST(ts AS DATE)),
         |           DATE '${Queries.RfmAnchor}') AS BIGINT) AS recency_days,
         |         CAST(COUNT(*) AS BIGINT) AS frequency,
         |         CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
         |           AS monetary_cents
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type = 'purchase'
         |  GROUP BY 1),
         |r AS (
         |  SELECT user_id, recency_days, frequency, monetary_cents,
         |         RANK() OVER (ORDER BY recency_days ASC) - 1 AS rb_r,
         |         RANK() OVER (ORDER BY frequency DESC) - 1 AS rb_f,
         |         RANK() OVER (ORDER BY monetary_cents DESC) - 1 AS rb_m,
         |         COUNT(*) OVER () AS n
         |  FROM u),
         |t AS (
         |  SELECT user_id, recency_days, frequency, monetary_cents,
         |         CAST(FLOOR($b.0 * rb_r / n) AS BIGINT) AS r_tier,
         |         CAST(FLOOR($b.0 * rb_f / n) AS BIGINT) AS f_tier,
         |         CAST(FLOOR($b.0 * rb_m / n) AS BIGINT) AS m_tier
         |  FROM r)
         |SELECT *, 'R' || r_tier || 'F' || f_tier || 'M' || m_tier AS segment
         |FROM t""".stripMargin
    },

    // PageRank over the symmetrized co-visit graph: q90's capped
    // basket CTEs feed the edge list, then each power-iteration round
    // is unrolled as (share, contrib, dangling, rank) CTEs — the
    // q52/q70 symbolic-unroll convention. All arithmetic is BIGINT
    // floor div in the same order as Graph.pageRank.
    "q93_pagerank" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val damp = graft.ops.Graph.DampBp
      val scale = graft.ops.Graph.Scale
      def round(r: Int): String =
        s"""s$r AS (
           |  SELECT r.item AS src, $damp * r.rank // (10000 * d.deg) AS share
           |  FROM r${r - 1} r JOIN deg d ON d.src = r.item),
           |c$r AS (
           |  SELECT e.dst AS item, CAST(SUM(s.share) AS BIGINT) AS in_mass
           |  FROM edg e JOIN s$r s ON e.src = s.src GROUP BY 1),
           |dg$r AS (
           |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dsum
           |  FROM r${r - 1} r LEFT JOIN deg d ON d.src = r.item
           |  WHERE d.src IS NULL),
           |r$r AS (
           |  SELECT r.item, r.n,
           |         CAST((10000 - $damp) * ($scale // r.n) // 10000
           |           + $damp * dg.dsum // (10000 * r.n)
           |           + COALESCE(c.in_mass, 0) AS BIGINT) AS rank
           |  FROM r${r - 1} r
           |  LEFT JOIN c$r c ON c.item = r.item, dg$r dg)""".stripMargin
      val rounds = (1 to Queries.PageRankIters).map(round).mkString(",\n")
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |nodes AS (SELECT src AS item FROM edg UNION SELECT dst FROM edg),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |r0 AS (SELECT item, n, $scale // n AS rank FROM nodes, tot),
         |$rounds
         |SELECT item, rank FROM r${Queries.PageRankIters}
         |ORDER BY rank DESC, item LIMIT ${Queries.PageRankK}""".stripMargin
    },

    // Raw-string gram twin of the TokenGramHash grain (q65's
    // convention — equal counts barring 64-bit collisions).
    "q92_source_overlap" -> {
      val n = graft.ops.Dedup.SpanGram
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT DISTINCT source, array_to_string(t[i : i + ${n - 1}], ' ') AS g
         |  FROM toks, unnest(range(1, len(t) - ${n - 2})) AS u(i)
         |  WHERE len(t) >= $n),
         |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM g GROUP BY 1),
         |p AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |         CAST(COUNT(*) AS BIGINT) AS shared_grams
         |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, shared_grams,
         |       na.n AS grams_a, nb.n AS grams_b,
         |       CAST(shared_grams * 10000 // na.n AS BIGINT) AS overlap_ab_bp,
         |       CAST(shared_grams * 10000 // nb.n AS BIGINT) AS overlap_ba_bp
         |FROM p
         |JOIN tot na ON na.source = p.source_a
         |JOIN tot nb ON nb.source = p.source_b""".stripMargin
    },

    "q46_pii_scrub" ->
      s"""SELECT doc_id,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE CAST(len(regexp_extract_all(text, '${graft.ops.TextClean.PiiPattern}')) AS BIGINT)
         |       END AS pii_hits,
         |       regexp_replace(text, '${graft.ops.TextClean.PiiPattern}', '<PII>', 'g') AS scrubbed
         |FROM documents""".stripMargin,

    // α=1/2 smoothing via sqrt — the one power IEEE requires to be
    // correctly rounded, so ⌊√tokens⌋ is engine-exact (see
    // TrainingPrep.languageMix).
    "q104_lang_temperature" ->
      s"""WITH t AS (
         |  SELECT lang,
         |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
         |  FROM documents WHERE text IS NOT NULL GROUP BY 1),
         |w AS (
         |  SELECT lang, tokens,
         |         CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT) AS w,
         |         CAST(SUM(tokens) OVER () AS BIGINT) AS total_tokens,
         |         CAST(SUM(CAST(FLOOR(sqrt(CAST(tokens AS DOUBLE))) AS BIGINT))
         |              OVER () AS BIGINT) AS total_w
         |  FROM t),
         |p AS (
         |  SELECT lang, tokens,
         |         CAST(FLOOR(10000.0 * tokens / total_tokens) AS BIGINT) AS raw_bp,
         |         CAST(FLOOR(10000.0 * w / total_w) AS BIGINT) AS target_bp
         |  FROM w)
         |SELECT lang, tokens, raw_bp, target_bp,
         |       CAST(FLOOR(${Queries.LangMixBudget}.0 * target_bp / 10000.0) AS BIGINT)
         |         AS sampled_tokens
         |FROM p""".stripMargin,

    // q81's nibble-parsed draw32 convention (DuckDB has no conv());
    // the order-by is the full md5 hex string — ASCII compare, same
    // collation both engines.
    "q107_shard_shuffle" -> {
      val s = Queries.ShuffleShards
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS draw
         |  FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT doc_id, draw,
         |         CAST($draw32 AS BIGINT) % $s AS shard
         |  FROM d)
         |SELECT doc_id, shard,
         |       CAST(ROW_NUMBER() OVER (PARTITION BY shard
         |         ORDER BY draw, doc_id) - 1 AS BIGINT) AS pos
         |FROM sh""".stripMargin
    },

    "q108_tokenizer_fertility" ->
      s"""WITH t AS (
         |  SELECT lang,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         |         CAST(len(regexp_extract_all(text,
         |           '${graft.ops.TextAnalysis.BpePattern}')) AS BIGINT) AS btoks,
         |         CAST(length(text) AS BIGINT) AS chars
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT lang,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(words) AS BIGINT) AS words,
         |         CAST(SUM(btoks) AS BIGINT) AS bpe_tokens,
         |         CAST(SUM(chars) AS BIGINT) AS chars
         |  FROM t GROUP BY 1)
         |SELECT lang, n_docs, words, bpe_tokens, chars,
         |       CAST(FLOOR(10000.0 * bpe_tokens / words) AS BIGINT) AS fertility_bp,
         |       CASE WHEN bpe_tokens > 0
         |            THEN CAST(FLOOR(10000.0 * chars / bpe_tokens) AS BIGINT)
         |            ELSE CAST(-1 AS BIGINT) END AS chars_per_token_bp
         |FROM g""".stripMargin,

    "q109_value_drift" -> {
      val w = Queries.DriftBucketWidth
      val b = Queries.DriftBuckets - 1
      s"""WITH e AS (
         |  SELECT event_type,
         |         CASE WHEN CAST(ts AS DATE) < DATE '${Queries.DriftSplitDate}'
         |              THEN 'ref' ELSE 'cur' END AS side,
         |         least(greatest(CAST(FLOOR(value / $w) AS BIGINT), 0), $b) AS bucket
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL),
         |c AS (
         |  SELECT event_type, bucket,
         |         CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
         |         CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
         |  FROM e GROUP BY 1, 2),
         |t AS (
         |  SELECT *,
         |         CAST(SUM(ref_n) OVER (PARTITION BY event_type) AS BIGINT) AS ref_total,
         |         CAST(SUM(cur_n) OVER (PARTITION BY event_type) AS BIGINT) AS cur_total
         |  FROM c),
         |d AS (
         |  SELECT event_type, ref_total, cur_total,
         |         abs(CAST(FLOOR(10000.0 * ref_n / ref_total) AS BIGINT)
         |           - CAST(FLOOR(10000.0 * cur_n / cur_total) AS BIGINT)) AS diff_bp
         |  FROM t WHERE ref_total > 0 AND cur_total > 0)
         |SELECT event_type,
         |       CAST(MAX(ref_total) AS BIGINT) AS ref_n,
         |       CAST(MAX(cur_total) AS BIGINT) AS cur_n,
         |       CAST(FLOOR(SUM(diff_bp) / 2.0) AS BIGINT) AS tvd_bp,
         |       CAST(MAX(diff_bp) AS BIGINT) AS max_bucket_diff_bp
         |FROM d GROUP BY 1""".stripMargin
    },

    // Two-stage retrieval: q61's seed-book ADC chain kept to
    // `RerankShortlist` depth, then exact-cosine re-rank of only the
    // shortlist pairs (the q25 cosine convention — one mirrored IEEE
    // tree). adc_rank is the stage-1 rank carried through.
    "q111_rerank_topk" -> {
      val m = Queries.PqM; val k = Queries.PqK
      s"""WITH $embQuantCte,
         |subs AS (
         |  SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         q[CAST(s * (len(q) // $m) + 1 AS BIGINT)
         |           : CAST((s + 1) * (len(q) // $m) AS BIGINT)] AS qs
         |  FROM n, unnest(range(0, $m)) AS u(s)),
         |sv AS (
         |  SELECT vec_id, sub, qs,
         |         CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS n2s
         |  FROM subs),
         |book AS (SELECT sub, vec_id AS code, qs AS centroid, n2s AS c_n2
         |         FROM sv WHERE vec_id < $k),
         |dists AS (
         |  SELECT v.vec_id, v.sub, b.code,
         |         v.n2s + b.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(v.qs) + 1),
         |           i -> v.qs[i] * b.centroid[i])) AS BIGINT) AS dist
         |  FROM sv v JOIN book b USING (sub)),
         |enc AS (
         |  SELECT vec_id, sub, CAST(MIN(dist * 256 + code) % 256 AS BIGINT) AS code
         |  FROM dists GROUP BY 1, 2),
         |pair AS (
         |  SELECT d.vec_id AS query_id, e.vec_id AS neighbor_id,
         |         CAST(SUM(d.dist) AS BIGINT) AS adc_dist
         |  FROM enc e JOIN dists d ON e.sub = d.sub AND e.code = d.code
         |  WHERE d.vec_id % ${Queries.KnnQueryMod} = 0 AND e.vec_id != d.vec_id
         |  GROUP BY 1, 2),
         |sl AS (
         |  SELECT query_id, neighbor_id, CAST(adc_rank AS BIGINT) AS adc_rank
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY adc_dist ASC, neighbor_id ASC) AS adc_rank
         |        FROM pair)
         |  WHERE adc_rank <= ${Queries.RerankShortlist}),
         |x AS (
         |  SELECT sl.query_id, sl.neighbor_id, sl.adc_rank,
         |         CASE WHEN nn.n2 = 0 OR qq.n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                CAST(list_sum(list_transform(range(1, len(nn.q) + 1),
         |                     i -> nn.q[i] * qq.q[i])) AS BIGINT)
         |                / (sqrt(CAST(nn.n2 AS DOUBLE)) * sqrt(CAST(qq.n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM sl JOIN n nn ON nn.vec_id = sl.neighbor_id
         |          JOIN n qq ON qq.vec_id = sl.query_id),
         |rr AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM x)
         |SELECT query_id, neighbor_id, cos_bp, adc_rank, CAST(rank AS INT) AS rank
         |FROM rr WHERE rank <= 10""".stripMargin
    },

    // ⌊log₂ n⌋ as binary-string length − 1 on BOTH engines (libm log2
    // rounds differently at power-of-two boundaries; a string length
    // cannot).
    "q110_length_histogram" ->
      """WITH t AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tc
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (
        |  SELECT source,
        |         CAST(length(format('{:b}', tc)) - 1 AS BIGINT) AS bucket, tc
        |  FROM t),
        |g AS (
        |  SELECT source, bucket,
        |         CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(tc) AS BIGINT) AS tokens
        |  FROM b GROUP BY 1, 2)
        |SELECT source, bucket, n_docs, tokens,
        |       CAST(FLOOR(10000.0 * n_docs /
        |         SUM(n_docs) OVER (PARTITION BY source)) AS BIGINT) AS docs_bp
        |FROM g""".stripMargin,

    // The combined-pattern hit count twins q46; per-class counts are
    // independent scans of the alternation arms (overlap by design).
    "q103_pii_prevalence" -> {
      def n(p: String) =
        s"CASE WHEN text IS NULL THEN 0 ELSE CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) END"
      s"""WITH h AS (
         |  SELECT source,
         |         ${n(graft.ops.TextClean.PiiEmailPattern)} AS e,
         |         ${n(graft.ops.TextClean.PiiDigitPattern)} AS d,
         |         ${n(graft.ops.TextClean.PiiTermPattern)} AS t,
         |         ${n(graft.ops.TextClean.PiiPattern)} AS c
         |  FROM documents),
         |g AS (
         |  SELECT source,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
         |         CAST(SUM(e) AS BIGINT) AS email_hits,
         |         CAST(SUM(d) AS BIGINT) AS number_hits,
         |         CAST(SUM(t) AS BIGINT) AS term_hits,
         |         CAST(SUM(c) AS BIGINT) AS pii_hits
         |  FROM h GROUP BY 1)
         |SELECT source, n_docs, n_flagged, email_hits, number_hits, term_hits,
         |       pii_hits,
         |       CAST(FLOOR(10000.0 * n_flagged / n_docs) AS BIGINT) AS flagged_bp
         |FROM g""".stripMargin
    },

    // Winnow hashes UTF-8 BYTES (Winnow.scala nullSafeEval), so the
    // oracle reconstructs the byte stream by nibble-parsing
    // hex(encode(text)) — ord(substr(...)) would hash code POINTS and
    // diverge on any non-ASCII document.
    "q34_winnow_fingerprints" ->
      """WITH raw AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |         list_transform(range(1, nb + 1),
        |           i -> CAST((instr('0123456789ABCDEF', substr(hx, CAST(2*i - 1 AS INT), 1)) - 1) * 16
        |                   + (instr('0123456789ABCDEF', substr(hx, CAST(2*i AS INT), 1)) - 1) AS BIGINT)) AS bs
        |  FROM raw),
        |h AS (
        |  SELECT doc_id,
        |         list_transform(range(1, len(bs) - 5 + 2),
        |           i -> list_reduce(bs[i:i+4],
        |                  (acc, c) -> (acc * 31 + c) % 1000000007)) AS hs
        |  FROM b),
        |w AS (
        |  SELECT doc_id,
        |         list_transform(range(1, len(hs) - 4 + 2), j -> list_min(hs[j:j+3])) AS mins
        |  FROM h)
        |SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp FROM w""".stripMargin,

    "q32_ivf_ann" ->
      s"""WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, q,
        |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
        |  FROM e),
        |centdim AS (
        |  SELECT label, i AS pos,
        |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        |  FROM n, unnest(range(1, len(q) + 1)) t(i)
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label, list(c ORDER BY pos) AS centroid FROM centdim GROUP BY label),
        |c2 AS (
        |  SELECT label, centroid,
        |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
        |  FROM cent),
        |queries AS (
        |  SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n WHERE vec_id % ${Queries.KnnQueryMod} = 0),
        |probe AS (
        |  SELECT query_id, q_q, q_n2, c2.label,
        |         CASE WHEN q_n2 = 0 OR c_n2 = 0 THEN 0
        |              ELSE CAST(FLOOR(10000.0 *
        |                     CAST(list_sum(list_transform(range(1, len(q_q) + 1),
        |                          i -> q_q[i] * centroid[i])) AS BIGINT)
        |                     / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE)))) AS BIGINT)
        |         END AS c_cos
        |  FROM queries, c2),
        |assigned AS (
        |  SELECT query_id, q_q, q_n2, label FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |                                 ORDER BY c_cos DESC, label ASC) AS pr
        |    FROM probe) WHERE pr = 1),
        |scored AS (
        |  SELECT a.query_id, a.label, n.vec_id AS neighbor_id,
        |         CASE WHEN n.n2 = 0 OR a.q_n2 = 0 THEN 0
        |              ELSE CAST(FLOOR(10000.0 *
        |                     CAST(list_sum(list_transform(range(1, len(n.q) + 1),
        |                          i -> n.q[i] * a.q_q[i])) AS BIGINT)
        |                     / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(a.q_n2 AS DOUBLE)))) AS BIGINT)
        |         END AS cos_bp
        |  FROM assigned a JOIN n ON n.label = a.label AND n.vec_id <> a.query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |                               ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, label, neighbor_id, cos_bp, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3""".stripMargin,

    // Media oracles are BYTE-based and multilingual-safe: byte
    // lengths/positions go through encode()/hex() (2 hex chars per
    // byte), never through character positions. DuckDB md5(VARCHAR)
    // hashes the string's UTF-8 encoding, which IS Spark's
    // md5(cast(text AS binary)) for the whole payload; partial-byte
    // slices (frames) use the md5-over-hex portable convention — see
    // Multimodal.frameSample.
    "q28_media_metadata" ->
      """SELECT doc_id,
        |       (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_length,
        |       md5(text) AS checksum,
        |       CAST(16 AS BIGINT) AS width,
        |       CAST(ceil(octet_length(encode(text)) / 16.0) AS BIGINT) AS height
        |FROM documents
        |WHERE text IS NOT NULL""".stripMargin,

    // frames are sliced in HEX space (2 chars per byte): substr on the
    // hex transcript is exact byte arithmetic regardless of where
    // UTF-8 code points fall, and md5-over-hex is the engine's frame
    // checksum convention (a 64-byte slice may split a code point, so
    // the raw slice isn't necessarily a valid string in any engine).
    "q29_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS len
        |  FROM documents WHERE doc_id % 3 = 2 AND text IS NOT NULL)
        |SELECT doc_id,
        |       CAST(f AS BIGINT) AS frame_idx,
        |       CAST(length(substr(h, CAST(f * 128 + 1 AS INT), 128)) // 2 AS BIGINT) AS frame_bytes,
        |       md5(substr(h, CAST(f * 128 + 1 AS INT), 128)) AS frame_checksum
        |FROM v, unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT), 4)) AS t(f)""".stripMargin,

    // the decoded "sample stream" is the payload's UTF-8 BYTES —
    // reconstructed here by nibble-parsing the hex transcript (ord()
    // would give code POINTS and diverge on any non-ASCII text).
    "q30_media_features" -> {
      val nib = (p: String) =>
        s"(instr('0123456789ABCDEF', substr(h, CAST($p AS INT), 1)) - 1)"
      val bins = (0 until 16).map(b =>
        f"CAST(len(list_filter(codes, c -> c // 16 = $b)) AS BIGINT) AS hist$b%02d")
        .mkString(",\n        |       ")
      s"""WITH raw AS (
        |  SELECT doc_id,
        |         (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
        |         hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS nb
        |  FROM documents WHERE text IS NOT NULL),
        |m AS (
        |  SELECT doc_id, media_type,
        |         list_transform(range(1, nb + 1),
        |           i -> ${nib("2*i - 1")} * 16 + ${nib("2*i")}) AS codes
        |  FROM raw)
        |SELECT doc_id, media_type,
        |       CAST(len(codes) AS BIGINT) AS byte_count,
        |       CAST(list_sum(codes) AS BIGINT) AS byte_sum,
        |       $bins
        |FROM m""".stripMargin
    },

    // Gap stats ride the shared sessionize CTE; flags are pure integer
    // comparisons (FALSE AND NULL = FALSE on both engines covers the
    // single-event null-gap rows). The metronome floor is
    // max(minEvents, 3): one gap has zero spread by construction.
    "q112_bot_sessions" -> {
      val (minE, fast, jit) =
        (Queries.BotMinEvents, Queries.BotFastGapUs, Queries.BotJitterUs)
      val metroE = math.max(minE, 3L)
      s"""$sessionCte, g AS (
         |  SELECT session_id, user_id,
         |         ts_us - lag(ts_us) OVER (PARTITION BY user_id, session_seq
         |                                  ORDER BY ts_us, event_id) AS gap_us,
         |         ts_us
         |  FROM sz),
         |s AS (
         |  SELECT session_id, user_id,
         |         CAST(COUNT(*) AS BIGINT) AS n_events,
         |         (MAX(ts_us) - MIN(ts_us)) // 1000000 AS duration_s,
         |         MIN(gap_us) AS min_gap_us,
         |         MAX(gap_us) AS max_gap_us,
         |         CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
         |  FROM g GROUP BY 1, 2),
         |a AS (
         |  SELECT *, CASE WHEN n_events > 1
         |                 THEN sum_gap_us // (n_events - 1) END AS avg_gap_us
         |  FROM s),
         |f AS (
         |  SELECT *,
         |         CAST(n_events >= $minE AND avg_gap_us < $fast AS INT) AS flag_fast,
         |         CAST(n_events >= $metroE
         |              AND max_gap_us - min_gap_us <= $jit AS INT) AS flag_metronome
         |  FROM a)
         |SELECT *, CAST(flag_fast = 1 OR flag_metronome = 1 AS INT) AS is_bot
         |FROM f""".stripMargin
    },

    // Dwell = lead-gap within the session; the session's last event has
    // no observable dwell and is excluded (time-on-page semantics).
    "q113_dwell_time" ->
      s"""$sessionCte, g AS (
         |  SELECT event_type,
         |         lead(ts_us) OVER (PARTITION BY user_id, session_seq
         |                           ORDER BY ts_us, event_id) - ts_us AS dwell_us
         |  FROM sz)
         |SELECT event_type,
         |       CAST(COUNT(*) AS BIGINT) AS n_obs,
         |       CAST(SUM(dwell_us) AS BIGINT) AS total_dwell_us,
         |       MIN(dwell_us) AS min_dwell_us,
         |       MAX(dwell_us) AS max_dwell_us,
         |       CAST(SUM(dwell_us) AS BIGINT) // COUNT(*) AS avg_dwell_us
         |FROM g WHERE dwell_us IS NOT NULL GROUP BY 1""".stripMargin,

    // DSIR twin: the same hashed unigram+bigram feature stream (md5
    // nibble buckets), add-1-smoothed bucket counts, and the exact
    // integer ⌊log₂⌋ weights via the bitlen identity (flog2rSql).
    "q114_dsir_score" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(f), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      val bkts = graft.ops.TextAnalysis.ClassifierBuckets
      s"""WITH tok AS (
         |  SELECT doc_id, source, lang, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (
         |  SELECT doc_id, source, lang, u.f AS f
         |  FROM tok, UNNEST(list_concat(t,
         |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS u(f)),
         |fb AS (SELECT doc_id, source, lang, $bucket AS bucket FROM f),
         |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM fb
         |       WHERE source = '${Queries.DsirTargetSource}' GROUP BY 1),
         |rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM fb GROUP BY 1),
         |tt AS (SELECT CAST(COALESCE(SUM(t_cnt), 0) AS BIGINT) AS t_tot FROM tc),
         |rt AS (SELECT CAST(COALESCE(SUM(r_cnt), 0) AS BIGINT) AS r_tot FROM rc),
         |w0 AS (
         |  SELECT bucket,
         |         COALESCE(t_cnt, 0) + 1 AS ta, t_tot + $bkts AS tb,
         |         r_cnt + 1 AS ra, r_tot + $bkts AS rb
         |  FROM rc LEFT JOIN tc USING (bucket), tt, rt),
         |w AS (
         |  SELECT bucket,
         |         ${flog2rSql("ta", "tb")} - ${flog2rSql("ra", "rb")} AS weight
         |  FROM w0)
         |SELECT fb.doc_id, fb.source, fb.lang,
         |       CAST(COUNT(*) AS BIGINT) AS n_feats,
         |       CAST(SUM(weight) AS BIGINT) AS dsir_score
         |FROM fb JOIN w USING (bucket)
         |GROUP BY 1, 2, 3""".stripMargin
    },

    // Windowed-funnel twin: existence chains carry EVERY candidate
    // completion time per step (q95's greedy MIN(seq) is not exact
    // once windows bind — a later step-1 restart can be the one that
    // converts), DISTINCT-bounded per session. The fold's strict
    // event-order constraint is seq (= ROW_NUMBER over ts, event_id).
    "q116_windowed_funnel" -> {
      val flow = Queries.orderedFlow
      val wUs = Queries.FunnelWindowSeconds * 1000000L
      val stepCtes = flow.zipWithIndex.map { case (s, i) =>
        val r = i + 1
        if (r == 1)
          s"""wp1 AS (
             |  SELECT DISTINCT user_id, session_seq, ts_us, seq
             |  FROM frows WHERE event_type = '$s')""".stripMargin
        else
          s"""wp$r AS (
             |  SELECT DISTINCT r.user_id, r.session_seq, r.ts_us, r.seq
             |  FROM frows r JOIN wp${r - 1} p
             |    ON r.user_id = p.user_id AND r.session_seq = p.session_seq
             |  WHERE r.event_type = '$s' AND r.seq > p.seq
             |    AND r.ts_us - p.ts_us <= $wUs)""".stripMargin
      }.mkString(",\n")
      val reachedRows = flow.indices.map { i =>
        s"SELECT ${i + 1} AS step_idx, CAST(COUNT(*) AS BIGINT) AS sessions_reached FROM (SELECT DISTINCT user_id, session_seq FROM wp${i + 1})"
      }.mkString("\n  UNION ALL ")
      val stepRows = flow.zipWithIndex
        .map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
      s"""$sessionCte,
         |frows AS (
         |  SELECT user_id, session_seq, event_type, ts_us,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS seq
         |  FROM sz),
         |fsess AS (SELECT DISTINCT user_id, session_seq FROM frows),
         |$stepCtes,
         |steps(step_idx, step) AS (VALUES $stepRows),
         |rk AS ($reachedRows),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total_sessions FROM fsess),
         |fin AS (
         |  SELECT CAST(s.step_idx AS BIGINT) AS step_idx, s.step,
         |         rk.sessions_reached,
         |         COALESCE(LAG(rk.sessions_reached) OVER (ORDER BY s.step_idx),
         |           tot.total_sessions) AS prev_reached,
         |         tot.total_sessions
         |  FROM steps s JOIN rk ON rk.step_idx = s.step_idx, tot)
         |SELECT step_idx, step, sessions_reached, prev_reached,
         |       CASE WHEN prev_reached = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / prev_reached)
         |              AS BIGINT) END AS conv_from_prev_bp,
         |       CASE WHEN total_sessions = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / total_sessions)
         |              AS BIGINT) END AS conv_from_start_bp
         |FROM fin""".stripMargin
    },

    // q55's raw-string gram twin, reversed to eval grain; zero rows
    // for un-leaked eval docs come from the left join.
    "q117_eval_contamination" -> {
      val n = Queries.ContamN; val m = Queries.ContamEvalMod
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - ${n - 2}),
         |           i -> array_to_string(t[i : i + ${n - 1}], ' '))) AS gram
         |  FROM toks WHERE len(t) >= $n),
         |bg AS (SELECT DISTINCT doc_id AS eval_doc_id, gram FROM grams
         |       WHERE doc_id % $m = 0),
         |hits AS (
         |  SELECT DISTINCT g.gram, g.doc_id AS train_doc_id
         |  FROM grams g JOIN (SELECT DISTINCT gram FROM bg) b USING (gram)
         |  WHERE g.doc_id % $m <> 0),
         |pe AS (
         |  SELECT eval_doc_id,
         |         CAST(COUNT(DISTINCT bg.gram) AS BIGINT) AS leaked_grams,
         |         CAST(COUNT(DISTINCT train_doc_id) AS BIGINT) AS n_train_docs
         |  FROM bg JOIN hits USING (gram) GROUP BY 1),
         |tot AS (
         |  SELECT eval_doc_id, CAST(COUNT(*) AS BIGINT) AS total_grams
         |  FROM bg GROUP BY 1)
         |SELECT t.eval_doc_id, COALESCE(pe.leaked_grams, 0) AS leaked_grams,
         |       COALESCE(pe.n_train_docs, 0) AS n_train_docs, t.total_grams,
         |       CAST(FLOOR(10000.0 * COALESCE(pe.leaked_grams, 0)
         |         / t.total_grams) AS BIGINT) AS leak_bp
         |FROM tot t LEFT JOIN pe USING (eval_doc_id)""".stripMargin
    },

    // q107's nibble-parsed draw32 shard + a DENSE shard×source grid
    // (absent sources must contribute their whole global share).
    "q118_shard_mixing" -> {
      val s = Queries.ShuffleShards
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH d AS (
         |  SELECT source, md5(CAST(doc_id AS VARCHAR)) AS draw,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tc
         |  FROM documents WHERE text IS NOT NULL),
         |sh AS (
         |  SELECT source, CAST($draw32 AS BIGINT) % $s AS shard, tc FROM d),
         |obs AS (
         |  SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(tc) AS BIGINT) AS tokens
         |  FROM sh GROUP BY 1, 2),
         |grid AS (
         |  SELECT g.range AS shard, s.source
         |  FROM range(0, $s) g CROSS JOIN (SELECT DISTINCT source FROM obs) s),
         |dense AS (
         |  SELECT g.shard, g.source,
         |         COALESCE(o.n_docs, 0) AS n_docs,
         |         COALESCE(o.tokens, 0) AS tokens
         |  FROM grid g LEFT JOIN obs o
         |    ON o.shard = g.shard AND o.source = g.source),
         |sh_tot AS (
         |  SELECT *,
         |         SUM(tokens) OVER (PARTITION BY shard) AS shard_tokens,
         |         SUM(tokens) OVER (PARTITION BY source) AS source_tokens,
         |         SUM(tokens) OVER () AS total_tokens
         |  FROM dense),
         |devs AS (
         |  SELECT shard, n_docs, tokens, shard_tokens,
         |         CASE WHEN shard_tokens = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * tokens / shard_tokens) AS BIGINT)
         |         END AS share_bp,
         |         CAST(FLOOR(10000.0 * source_tokens / total_tokens) AS BIGINT)
         |           AS global_bp
         |  FROM sh_tot)
         |SELECT shard, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
         |       CAST(MAX(shard_tokens) AS BIGINT) AS tokens,
         |       CAST(FLOOR(SUM(ABS(share_bp - global_bp)) / 2.0) AS BIGINT)
         |         AS tvd_bp,
         |       CAST(MAX(ABS(share_bp - global_bp)) AS BIGINT) AS max_dev_bp
         |FROM devs GROUP BY 1""".stripMargin
    },

    // q69's score twin collapsed to dyadic buckets + a descending
    // cumulative (keep-if-score≥threshold semantics).
    "q119_threshold_sweep" -> {
      val wd = Queries.SweepBucketWidth
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS tok FROM documents
         |  WHERE text IS NOT NULL),
         |s AS (
         |  SELECT CAST(len(tok) AS BIGINT) AS token_count,
         |         CAST(list_sum(list_transform(tok,
         |           x -> ($bucket % 1001) - 500)) AS BIGINT) AS score
         |  FROM t),
         |b AS (
         |  SELECT CAST(FLOOR(CAST(score AS DOUBLE) / $wd.0) AS BIGINT) AS bucket,
         |         token_count
         |  FROM s),
         |g AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(token_count) AS BIGINT) AS tokens
         |  FROM b GROUP BY 1)
         |SELECT bucket, CAST(bucket * $wd AS BIGINT) AS min_score, n_docs, tokens,
         |       CAST(SUM(n_docs) OVER w AS BIGINT) AS docs_kept,
         |       CAST(SUM(tokens) OVER w AS BIGINT) AS tokens_kept,
         |       CAST(FLOOR(10000.0 * SUM(n_docs) OVER w
         |         / SUM(n_docs) OVER ()) AS BIGINT) AS docs_kept_bp,
         |       CAST(FLOOR(10000.0 * SUM(tokens) OVER w
         |         / SUM(tokens) OVER ()) AS BIGINT) AS tokens_kept_bp
         |FROM g
         |WINDOW w AS (ORDER BY bucket DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin
    },

    // the q18 gate expression verbatim (same defaults) × the q69
    // score twin, both as column arithmetic on ONE scan.
    "q120_signal_agreement" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS tok FROM documents
         |  WHERE text IS NOT NULL),
         |m AS (
         |  SELECT CAST(len(tok) AS BIGINT) AS token_count,
         |         CAST(len(list_filter(tok, x -> length(x) <= 2)) AS BIGINT)
         |           AS short_count,
         |         CAST(list_sum(list_transform(tok,
         |           x -> ($bucket % 1001) - 500)) AS BIGINT) AS score
         |  FROM t),
         |v AS (
         |  SELECT token_count,
         |         CAST(token_count >= 20 AND
         |           CAST(FLOOR(10000.0 * short_count / token_count) AS BIGINT)
         |             <= 4000 AS INT) AS heuristic_ok,
         |         CAST(score >= 0 AS INT) AS classifier_keep
         |  FROM m),
         |g AS (
         |  SELECT heuristic_ok, classifier_keep,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(token_count) AS BIGINT) AS tokens
         |  FROM v GROUP BY 1, 2)
         |SELECT heuristic_ok, classifier_keep, n_docs, tokens,
         |       CAST(FLOOR(10000.0 * n_docs / SUM(n_docs) OVER ()) AS BIGINT)
         |         AS docs_bp,
         |       CAST(heuristic_ok = classifier_keep AS INT) AS agree
         |FROM g""".stripMargin
    },

    // q32's quantize/centroid CTE chain, folded to list grain with
    // each vector's cosine to its OWN centroid.
    "q121_ivf_balance" ->
      s"""WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding,
        |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |n AS (
        |  SELECT vec_id, label, q,
        |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
        |  FROM e),
        |centdim AS (
        |  SELECT label, i AS pos,
        |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
        |  FROM n, unnest(range(1, len(q) + 1)) t(i)
        |  GROUP BY label, i),
        |cent AS (
        |  SELECT label, list(c ORDER BY pos) AS centroid FROM centdim GROUP BY label),
        |c2 AS (
        |  SELECT label, centroid,
        |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
        |  FROM cent),
        |s AS (
        |  SELECT n.label,
        |         CASE WHEN n.n2 = 0 OR c2.c_n2 = 0 THEN 0
        |              ELSE CAST(FLOOR(10000.0 *
        |                     CAST(list_sum(list_transform(range(1, len(n.q) + 1),
        |                          i -> n.q[i] * c2.centroid[i])) AS BIGINT)
        |                     / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(c2.c_n2 AS DOUBLE)))) AS BIGINT)
        |         END AS cos_bp
        |  FROM n JOIN c2 USING (label)),
        |g AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |         CAST(SUM(cos_bp) AS BIGINT) AS sum_cos
        |  FROM s GROUP BY 1)
        |SELECT label, n_vecs,
        |       CAST(FLOOR(10000.0 * n_vecs / SUM(n_vecs) OVER ()) AS BIGINT)
        |         AS share_bp,
        |       CAST(FLOOR(CAST(sum_cos AS DOUBLE) / n_vecs) AS BIGINT)
        |         AS mean_cos_bp
        |FROM g""".stripMargin,

    // subtraction-trick char-class counts; patterns shared with the
    // Spark side (Java-regex ∩ RE2 subset, q46/q83 convention).
    "q122_script_mix" -> {
      def cnt(cls: String) =
        s"CAST(length(text) - length(regexp_replace(text, '$cls', '', 'g')) AS BIGINT)"
      s"""WITH m AS (
         |  SELECT source, CAST(length(text) AS BIGINT) AS chars,
         |         ${cnt("[A-Za-z]")} AS letters,
         |         ${cnt("[0-9]")} AS digits,
         |         ${cnt("[ \\t\\n\\r]")} AS spaces,
         |         ${cnt("[^\\x00-\\x7F]")} AS non_ascii
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (
         |  SELECT *, CAST(letters > 0 AND non_ascii > 0 AS BIGINT) AS mixed
         |  FROM m),
         |g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(chars) AS BIGINT) AS chars,
         |         CAST(SUM(letters) AS BIGINT) AS letters,
         |         CAST(SUM(digits) AS BIGINT) AS digits,
         |         CAST(SUM(spaces) AS BIGINT) AS spaces,
         |         CAST(SUM(non_ascii) AS BIGINT) AS non_ascii,
         |         CAST(SUM(mixed) AS BIGINT) AS n_mixed
         |  FROM f GROUP BY 1)
         |SELECT source, n_docs, chars, letters, digits, spaces, non_ascii,
         |       n_mixed,
         |       CASE WHEN chars = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * letters / chars) AS BIGINT)
         |       END AS letter_bp,
         |       CASE WHEN chars = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * digits / chars) AS BIGINT)
         |       END AS digit_bp,
         |       CASE WHEN chars = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * spaces / chars) AS BIGINT)
         |       END AS space_bp,
         |       CASE WHEN chars = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * non_ascii / chars) AS BIGINT)
         |       END AS non_ascii_bp,
         |       CASE WHEN n_docs = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_mixed / n_docs) AS BIGINT)
         |       END AS mixed_bp
         |FROM g""".stripMargin
    },

    // q45's chunk CTE (same L) + per-doc list_distinct, counted
    // across docs at (source, line) grain.
    "q123_boilerplate_lines" -> {
      val l = Queries.LineTokens
      val m = Queries.BoilerplateMinDocs
      val k = Queries.BoilerplateTopK
      s"""WITH t AS (
         |  SELECT source, string_split(text, ' ') AS tokens
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (
         |  SELECT source,
         |         list_transform(range(0, CAST(ceil(len(tokens) / $l.0) AS BIGINT)),
         |           i -> array_to_string(tokens[i * $l + 1 : i * $l + $l], ' ')) AS chunks
         |  FROM t),
         |lines AS (
         |  SELECT source, unnest(list_distinct(chunks)) AS line FROM c),
         |g AS (
         |  SELECT source, line, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM lines GROUP BY 1, 2
         |  HAVING COUNT(*) >= $m),
         |r AS (
         |  SELECT source, line, n_docs,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY n_docs DESC, line ASC) AS INT) AS rank
         |  FROM g)
         |SELECT source, rank, line, n_docs FROM r WHERE rank <= $k"""
        .stripMargin
    },

    // the q02 session CTE + the two standard touch models; a
    // first-of-session conversion has no earlier touch → 'direct'.
    "q124_attribution" ->
      s"""$sessionCte, c AS (
         |  SELECT event_type,
         |         first_value(event_type) OVER w AS first_type,
         |         lag(event_type) OVER w AS prev_type,
         |         row_number() OVER w AS seq
         |  FROM sz
         |  WINDOW w AS (PARTITION BY user_id, session_seq
         |               ORDER BY ts_us, event_id)),
         |conv AS (
         |  SELECT CASE WHEN seq > 1 THEN first_type ELSE 'direct' END
         |           AS first_touch,
         |         COALESCE(prev_type, 'direct') AS last_touch
         |  FROM c WHERE event_type = 'purchase'),
         |u AS (
         |  SELECT 'first' AS model, first_touch AS channel FROM conv
         |  UNION ALL
         |  SELECT 'last' AS model, last_touch AS channel FROM conv),
         |g AS (
         |  SELECT model, channel, CAST(COUNT(*) AS BIGINT) AS conversions
         |  FROM u GROUP BY 1, 2)
         |SELECT model, channel, conversions,
         |       CAST(FLOOR(10000.0 * conversions /
         |         SUM(conversions) OVER (PARTITION BY model)) AS BIGINT)
         |         AS share_bp
         |FROM g""".stripMargin,

    // raw-string gram twin (q65 convention); DISTINCT per doc first so
    // the carrier count is a distinct-doc count.
    "q125_doc_novelty" -> {
      val n = Queries.NoveltyGram
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |grams AS (
         |  SELECT DISTINCT doc_id, array_to_string(t[i : i + ${n - 1}], ' ') AS g
         |  FROM toks, unnest(range(1, len(t) - ${n - 2})) AS u(i)
         |  WHERE len(t) >= $n),
         |cc AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS carriers
         |       FROM grams GROUP BY 1),
         |agg AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_grams,
         |         CAST(SUM(CASE WHEN carriers = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS novel_grams
         |  FROM grams JOIN cc USING (g) GROUP BY 1)
         |SELECT t.doc_id, COALESCE(a.total_grams, 0) AS total_grams,
         |       COALESCE(a.novel_grams, 0) AS novel_grams,
         |       CASE WHEN a.doc_id IS NULL THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * a.novel_grams / a.total_grams)
         |              AS BIGINT) END AS novelty_bp
         |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin
    },

    // head vocabulary by (term_freq desc, token asc) on BOTH engines;
    // OOV floor freq=1; per-token ⌊log₂(T/freq)⌋ via the bitlen twin.
    "q126_surprisal" -> {
      val k = Queries.SurprisalHeadK
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tot AS (
         |  SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS t_tot
         |  FROM documents WHERE text IS NOT NULL),
         |head AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS term_freq
         |  FROM tok GROUP BY 1
         |  ORDER BY term_freq DESC, token ASC LIMIT $k),
         |s AS (
         |  SELECT doc_id,
         |         ${flog2rSql("t_tot", "COALESCE(term_freq, 1)")} AS sp
         |  FROM tok LEFT JOIN head USING (token) CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS token_count,
         |       CAST(SUM(sp) AS BIGINT) AS total_log2,
         |       CAST(FLOOR(10000.0 * SUM(sp) / COUNT(*)) AS BIGINT)
         |         AS avg_log2_bp
         |FROM s GROUP BY 1""".stripMargin
    },

    // q02's session CTE; conversion looks at the WHOLE session while
    // the path string truncates at maxSteps (standard Sankey report).
    "q127_session_paths" -> {
      val m = Queries.SessionPathSteps; val k = Queries.SessionPathK
      s"""$sessionCte, paths AS (
         |  SELECT user_id, session_seq,
         |         array_to_string(list_slice(
         |           list(event_type ORDER BY ts_us, event_id), 1, $m), '>')
         |           AS path,
         |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS converted
         |  FROM sz GROUP BY 1, 2),
         |g AS (
         |  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         |         CAST(SUM(converted) AS BIGINT) AS n_converted
         |  FROM paths GROUP BY 1)
         |SELECT path, n_sessions, n_converted,
         |       CAST(FLOOR(10000.0 * n_converted / n_sessions) AS BIGINT)
         |         AS conv_bp
         |FROM g ORDER BY n_sessions DESC, path ASC LIMIT $k""".stripMargin
    },

    "q128_erasure_audit" -> {
      val m = Queries.ErasureDenyMod
      s"""WITH deny AS (
         |  SELECT DISTINCT c_custkey AS user_id FROM customer
         |  WHERE c_custkey % $m = 0),
         |ao AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE o_custkey IN (SELECT user_id FROM deny)),
         |a AS (
         |  SELECT 'customer' AS table_name,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         CAST(SUM(CASE WHEN c_custkey IN (SELECT user_id FROM deny)
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_affected
         |  FROM customer
         |  UNION ALL
         |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
         |         CAST(SUM(CASE WHEN o_custkey IN (SELECT user_id FROM deny)
         |                       THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM orders
         |  UNION ALL
         |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
         |         CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM ao)
         |                       THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'events', CAST(COUNT(*) AS BIGINT),
         |         CAST(SUM(CASE WHEN user_id IN (SELECT user_id FROM deny)
         |                       THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM events)
         |SELECT table_name, n_rows, n_affected,
         |       CASE WHEN n_rows = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_affected / n_rows) AS BIGINT)
         |       END AS affected_bp
         |FROM a""".stripMargin
    },

    // q42's recursive component labels folded to per-cluster sizes,
    // then q110's bitlen log2 buckets.
    "q129_cluster_sizes" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM p),
         |reach(node, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
         |comp AS (
         |  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY 1),
         |sizes AS (
         |  SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM comp GROUP BY 1),
         |g AS (
         |  SELECT CAST(length(format('{:b}', sz)) - 1 AS BIGINT) AS bucket,
         |         CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |         CAST(SUM(sz) AS BIGINT) AS n_docs
         |  FROM sizes GROUP BY 1)
         |SELECT bucket, n_clusters, n_docs,
         |       CAST(FLOOR(10000.0 * n_docs / SUM(n_docs) OVER ()) AS BIGINT)
         |         AS docs_bp
         |FROM g""".stripMargin,

    "q130_compaction_plan" -> {
      val t = Queries.CompactionTargetBytes
      s"""WITH g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_chars) AS BIGINT) AS bytes
         |  FROM documents WHERE text IS NOT NULL GROUP BY 1)
         |SELECT source, n_docs, bytes,
         |       GREATEST(1, (bytes + ${t - 1}) // $t) AS n_files,
         |       n_docs // GREATEST(1, (bytes + ${t - 1}) // $t) AS rows_per_file
         |FROM g""".stripMargin
    },

    // dyadic half-life decay: keep_bp = 10000 >> halflives (exact
    // integer shift, no pow), md5 draw mod 10000 (q81's gate).
    "q131_recency_sample" -> {
      val asOf = Queries.RecencyAsOf
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH e AS (
         |  SELECT event_id, user_id, event_type,
         |         CAST(datediff('day', CAST(ts AS DATE), DATE '$asOf') AS BIGINT)
         |           AS age_days,
         |         md5(CAST(event_id AS VARCHAR)) AS draw
         |  FROM events),
         |h AS (
         |  SELECT *, age_days // 7 AS halflives FROM e WHERE age_days >= 0),
         |k AS (
         |  SELECT *, CASE WHEN halflives >= 14 THEN CAST(0 AS BIGINT)
         |                 ELSE CAST(10000 >> halflives AS BIGINT) END AS keep_bp
         |  FROM h),
         |d AS (
         |  SELECT *, CAST($draw32 AS BIGINT) % 10000 AS draw_bp FROM k)
         |SELECT event_id, user_id, event_type, age_days, keep_bp
         |FROM d WHERE draw_bp < keep_bp""".stripMargin
    },

    // q69's score twin; two QUALIFY-style extremes joined per source
    // with the strict-margin gate.
    "q133_preference_pairs" -> {
      val k = Queries.PreferenceK
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH s AS (
         |  SELECT doc_id, source,
         |         CAST(list_sum(list_transform(string_split(text, ' '),
         |           x -> ($bucket % 1001) - 500)) AS BIGINT) AS score
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (
         |  SELECT source, doc_id AS chosen_doc_id, score AS chosen_score,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY score DESC, doc_id ASC) AS rn
         |  FROM s),
         |r AS (
         |  SELECT source AS r_source, doc_id AS rejected_doc_id,
         |         score AS rejected_score,
         |         ROW_NUMBER() OVER (PARTITION BY source
         |           ORDER BY score ASC, doc_id ASC) AS rn
         |  FROM s)
         |SELECT c.source, c.chosen_doc_id, r.rejected_doc_id,
         |       c.chosen_score, r.rejected_score,
         |       c.chosen_score - r.rejected_score AS margin
         |FROM c JOIN r ON c.source = r.r_source
         |WHERE c.rn <= $k AND r.rn <= $k
         |  AND c.chosen_score > r.rejected_score""".stripMargin
    },

    // q75's cohort CTE with cents and a per-cohort cumulative.
    "q134_ltv_curve" -> {
      val m = Queries.RetentionMaxOffset
      val (wFrom, wTo) = Queries.RetentionWindow
      s"""WITH e AS (
         |  SELECT user_id, CAST(ts AS DATE) AS d,
         |         CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
         |  FROM events
         |  WHERE CAST(ts AS DATE) BETWEEN DATE '$wFrom' AND DATE '$wTo'),
         |ud AS (
         |  SELECT user_id, d, CAST(SUM(cents) AS BIGINT) AS day_cents
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT user_id, MIN(d) AS cohort_d FROM ud GROUP BY 1),
         |f AS (
         |  SELECT cohort_d, CAST(d - cohort_d AS BIGINT) AS age_days,
         |         day_cents
         |  FROM ud JOIN c USING (user_id)
         |  WHERE d - cohort_d <= $m),
         |g AS (
         |  SELECT cohort_d, age_days,
         |         CAST(COUNT(*) AS BIGINT) AS n_active,
         |         CAST(SUM(day_cents) AS BIGINT) AS cents_day
         |  FROM f GROUP BY 1, 2)
         |SELECT strftime(cohort_d, '%Y-%m-%d') AS cohort_date, age_days,
         |       n_active, cents_day,
         |       CAST(SUM(cents_day) OVER (PARTITION BY cohort_d
         |         ORDER BY age_days
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS cents_cum
         |FROM g""".stripMargin
    },

    // q123's chunk/deny CTEs + positional anti filter + ordered
    // reassembly; '' (not NULL) for fully-scrubbed docs (q78 pin).
    "q135_boilerplate_scrub" -> {
      val l = Queries.LineTokens
      val m = Queries.BoilerplateMinDocs
      s"""WITH t AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS tokens
         |  FROM documents WHERE text IS NOT NULL),
         |c AS (
         |  SELECT doc_id, source,
         |         CAST(ceil(len(tokens) / $l.0) AS BIGINT) AS n_lines,
         |         list_transform(range(0, CAST(ceil(len(tokens) / $l.0) AS BIGINT)),
         |           i -> array_to_string(tokens[i * $l + 1 : i * $l + $l], ' ')) AS chunks
         |  FROM t),
         |deny AS (
         |  SELECT source, line FROM (
         |    SELECT source, unnest(list_distinct(chunks)) AS line FROM c)
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $m),
         |occ AS (
         |  SELECT doc_id, source, i AS pos, chunks[i] AS line
         |  FROM c, unnest(range(1, len(chunks) + 1)) AS u(i)),
         |kept AS (
         |  SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |         array_to_string(list(o.line ORDER BY o.pos), ' ') AS cleaned
         |  FROM occ o
         |  WHERE NOT EXISTS (SELECT 1 FROM deny d
         |                    WHERE d.source = o.source AND d.line = o.line)
         |  GROUP BY 1)
         |SELECT c.doc_id, c.source, c.n_lines,
         |       COALESCE(k.n_kept, 0) AS n_kept,
         |       COALESCE(k.cleaned, '') AS cleaned,
         |       CAST(FLOOR(10000.0 * (c.n_lines - COALESCE(k.n_kept, 0))
         |         / c.n_lines) AS BIGINT) AS removed_bp
         |FROM c LEFT JOIN kept k USING (doc_id)""".stripMargin
    },

    // money: per-row floor of the SAME IEEE tree (price·(1−disc)·100)
    // before the sum — the house cents convention on Q5's revenue.
    "q136_local_supplier_revenue" -> {
      val r = Queries.Q5Region
      val (f, u) = (Queries.Q5YearFrom, Queries.Q5YearUntil)
      s"""SELECT n.n_name,
         |       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |         * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
         |       CAST(COUNT(*) AS BIGINT) AS n_lineitems
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |JOIN region rg ON n.n_regionkey = rg.r_regionkey
         |WHERE rg.r_name = '$r'
         |  AND s.s_nationkey = c.c_nationkey
         |  AND o.o_orderdate >= TIMESTAMP '$f'
         |  AND o.o_orderdate < TIMESTAMP '$u'
         |GROUP BY 1""".stripMargin
    },

    // nulls are keys (NULLS FIRST tie-break); hot_x_mean is the
    // cross-multiplied ratio to mean key frequency.
    "q137_key_skew" -> {
      val k = Queries.SkewTopK
      s"""WITH bk AS (
         |  SELECT CAST(user_id AS VARCHAR) AS key_value,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM events GROUP BY 1),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |         CAST(SUM(n_rows) AS BIGINT) AS total_rows
         |  FROM bk)
         |SELECT key_value, n_rows, n_keys, total_rows,
         |       CAST(FLOOR(10000.0 * n_rows / total_rows) AS BIGINT)
         |         AS share_bp,
         |       CAST(FLOOR(10000.0 * n_rows / total_rows * n_keys) AS BIGINT)
         |         AS hot_x_mean_bp
         |FROM bk CROSS JOIN t
         |ORDER BY n_rows DESC, key_value ASC NULLS FIRST LIMIT $k"""
        .stripMargin
    },

    // values compared as STRINGS (the only cross-producer-safe type);
    // DuckDB's dynamic '$.'||key path twins Spark's from_json map.
    "q138_props_schema" ->
      s"""WITH tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM events),
         |kv AS (
         |  SELECT u.k AS key,
         |         json_extract_string(e.props, '$$.' || u.k) AS value
         |  FROM events e, unnest(json_keys(e.props)) AS u(k)
         |  WHERE e.props IS NOT NULL),
         |g AS (
         |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present,
         |         CAST(COUNT(DISTINCT value) AS BIGINT) AS n_values,
         |         MIN(value) AS min_value, MAX(value) AS max_value
         |  FROM kv GROUP BY 1)
         |SELECT key, n_present, n_values, min_value, max_value,
         |       CAST(FLOOR(10000.0 * n_present / total_rows) AS BIGINT)
         |         AS present_bp
         |FROM g CROSS JOIN tot""".stripMargin,

    // q77's histogram CTE with the rank list unrolled + UNION'd long.
    "q139_quantile_table" -> {
      val ranks = Queries.QuantileRanks
      val picks = ranks.map { p =>
        s"""SELECT event_type, CAST($p AS BIGINT) AS rank_bp,
           |       CAST(FLOOR(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |         THEN v END) * 100) AS BIGINT) AS value_cents,
           |       CAST(MIN(n) AS BIGINT) AS n_rows
           |FROM c GROUP BY 1""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (
         |  SELECT event_type, value AS v, COUNT(*) AS cnt
         |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY event_type) AS n
         |  FROM h)
         |$picks""".stripMargin
    },

    // non-finite = NaN or |x| > 1e39 (no finite float32 exceeds
    // 3.4e38) — identical predicate on both engines, no isinf.
    "q140_embedding_health" ->
      s"""SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       CAST(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_null,
         |       CAST(SUM(CASE WHEN embedding IS NOT NULL
         |         AND len(embedding) = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_empty,
         |       CAST(SUM(CASE WHEN embedding IS NOT NULL
         |         AND len(embedding) > 0
         |         AND len(list_filter(embedding, x -> x <> 0.0)) = 0
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |       CAST(SUM(CASE WHEN embedding IS NOT NULL
         |         AND len(list_filter(embedding, x ->
         |           isnan(CAST(x AS DOUBLE))
         |           OR abs(CAST(x AS DOUBLE)) > 1e39)) > 0
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
         |       CAST(MIN(CASE WHEN embedding IS NOT NULL
         |         THEN len(embedding) END) AS BIGINT) AS dims_min,
         |       CAST(MAX(CASE WHEN embedding IS NOT NULL
         |         THEN len(embedding) END) AS BIGINT) AS dims_max
         |FROM embeddings GROUP BY 1""".stripMargin,

    "q142_daily_pivot" -> {
      val cols = Queries.PivotTypes.map { t =>
        s"""CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END)
           |  AS BIGINT) AS "$t"""".stripMargin
      }.mkString(",\n")
      val inList = Queries.PivotTypes.map(t => s"'$t'").mkString(", ")
      s"""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         |$cols,
         |CAST(SUM(CASE WHEN event_type NOT IN ($inList)
         |  OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS other,
         |CAST(COUNT(*) AS BIGINT) AS total
         |FROM events GROUP BY 1""".stripMargin
    },

    // q32's centroid CTE chain twice (old = built subset, now = all),
    // cosine between the two integer centroids per label.
    "q143_centroid_drift" -> {
      val m = Queries.DriftBuiltMod
      def cents(name: String, where: String) =
        s"""e_$name AS (
           |  SELECT vec_id, label,
           |         list_transform(embedding,
           |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
           |  FROM embeddings $where),
           |cd_$name AS (
           |  SELECT label, i AS pos,
           |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
           |  FROM e_$name, unnest(range(1, len(q) + 1)) t(i)
           |  GROUP BY label, i),
           |c_$name AS (
           |  SELECT label, list(c ORDER BY pos) AS centroid FROM cd_$name
           |  GROUP BY label),
           |n_$name AS (
           |  SELECT label, centroid,
           |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT)
           |           AS c_n2
           |  FROM c_$name)""".stripMargin
      s"""WITH ${cents("old", s"WHERE vec_id % $m <> 0")},
         |${cents("now", "")},
         |cnt AS (
         |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_total,
         |         CAST(SUM(CASE WHEN vec_id % $m <> 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_built
         |  FROM embeddings GROUP BY 1)
         |SELECT c.label, cnt.n_built, cnt.n_total,
         |       CASE WHEN o.label IS NULL THEN NULL
         |            WHEN o.c_n2 = 0 OR c.c_n2 = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 *
         |              CAST(list_sum(list_transform(range(1, len(c.centroid) + 1),
         |                   i -> o.centroid[i] * c.centroid[i])) AS BIGINT)
         |              / (sqrt(CAST(o.c_n2 AS DOUBLE)) * sqrt(CAST(c.c_n2 AS DOUBLE))))
         |              AS BIGINT)
         |       END AS drift_cos_bp
         |FROM n_now c
         |LEFT JOIN n_old o ON c.label = o.label
         |JOIN cnt ON cnt.label = c.label""".stripMargin
    },

    // q02's session CTE → per-session start, per-user lag, ⌊log₂⌋
    // hour buckets via the bitlen identity (bucket −1 = sub-hour).
    "q144_return_times" ->
      s"""$sessionCte, st AS (
         |  SELECT user_id, session_seq, MIN(ts_us) AS start_us
         |  FROM sz GROUP BY 1, 2),
         |g AS (
         |  SELECT (start_us - lag(start_us) OVER (PARTITION BY user_id
         |            ORDER BY session_seq)) // 3600000000 AS away_hours
         |  FROM st),
         |b AS (
         |  SELECT CASE WHEN away_hours < 1 THEN CAST(-1 AS BIGINT)
         |              ELSE CAST(length(format('{:b}', away_hours)) - 1 AS BIGINT)
         |         END AS bucket, away_hours
         |  FROM g WHERE away_hours IS NOT NULL),
         |h AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_returns,
         |         CAST(MIN(away_hours) AS BIGINT) AS min_hours,
         |         CAST(MAX(away_hours) AS BIGINT) AS max_hours
         |  FROM b GROUP BY 1)
         |SELECT bucket, n_returns, min_hours, max_hours,
         |       CAST(FLOOR(10000.0 * n_returns / SUM(n_returns) OVER ())
         |         AS BIGINT) AS returns_bp
         |FROM h""".stripMargin,

    "q145_hourly_profile" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         |         CAST(COUNT(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2)
         |SELECT event_type, hour, n_events,
         |       CAST(FLOOR(10000.0 * n_events /
         |         SUM(n_events) OVER (PARTITION BY event_type)) AS BIGINT)
         |         AS share_bp,
         |       CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY event_type
         |         ORDER BY n_events DESC, hour ASC) = 1
         |         THEN 1 ELSE 0 END AS INT) AS is_peak
         |FROM g""".stripMargin,

    // q22's candidate/verify chain at the >=1bp floor × the q24
    // simhash chain (CTE names prefixed to coexist) × text hashes.
    "q146_verdict_fusion" -> {
      val ssig = simhashSigCte
        .replaceAll("\\b(tok|nib|votes|sig)\\b", "s$1")
      s"""WITH $minhashCandCtes,
         |v AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) + len(sb.shingles)
         |              - len(list_intersect(sa.shingles, sb.shingles)) AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |p1 AS (
         |  SELECT doc_a, doc_b,
         |         CASE WHEN uni = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |         END AS jaccard_bp
         |  FROM v
         |  WHERE CASE WHEN uni = 0 THEN 0
         |             ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |        END >= 1),
         |$ssig,
         |th AS (
         |  SELECT doc_id, md5(text) AS th FROM documents
         |  WHERE text IS NOT NULL),
         |f AS (
         |  SELECT CAST(ta.th = tb.th AS INT) AS exact_dup,
         |         CAST(p1.jaccard_bp >= 8000 AS INT) AS mh_dup,
         |         CAST(bit_count(xor(sa.simhash, sb.simhash)) <= 3 AS INT)
         |           AS sh_dup,
         |         p1.jaccard_bp
         |  FROM p1
         |  JOIN th ta ON p1.doc_a = ta.doc_id
         |  JOIN th tb ON p1.doc_b = tb.doc_id
         |  JOIN ssig sa ON p1.doc_a = sa.doc_id
         |  JOIN ssig sb ON p1.doc_b = sb.doc_id)
         |SELECT exact_dup, mh_dup, sh_dup,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       MIN(jaccard_bp) AS min_jaccard_bp,
         |       MAX(jaccard_bp) AS max_jaccard_bp
         |FROM f GROUP BY 1, 2, 3""".stripMargin
    },

    "q149_packing_efficiency" -> {
      val s = Queries.PackShards; val l = Queries.PackSeqLen
      s"""WITH t AS (
         |  SELECT doc_id % $s AS shard,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tc
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (
         |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(tc) AS BIGINT) AS tokens
         |  FROM t GROUP BY 1)
         |SELECT shard, n_docs, tokens,
         |       (tokens + ${l - 1}) // $l AS n_seqs,
         |       ((tokens + ${l - 1}) // $l) * $l - tokens AS tail_waste,
         |       CASE WHEN (tokens + ${l - 1}) // $l = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * tokens /
         |              (((tokens + ${l - 1}) // $l) * $l)) AS BIGINT)
         |       END AS utilization_bp
         |FROM g""".stripMargin
    },

    // md5-draw arm assignment at the USER key (q81's nibble parse).
    "q147_srm_check" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT DISTINCT user_id FROM events),
         |a AS (
         |  SELECT CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users FROM a GROUP BY 1)
         |SELECT arm, n_users,
         |       CAST(5000 AS BIGINT) AS expected_bp,
         |       CAST(FLOOR(10000.0 * n_users / SUM(n_users) OVER ()) AS BIGINT)
         |         AS observed_bp,
         |       CAST(ABS(FLOOR(10000.0 * n_users / SUM(n_users) OVER ()) - 5000)
         |         AS BIGINT) AS dev_bp,
         |       CAST(ABS(FLOOR(10000.0 * n_users / SUM(n_users) OVER ()) - 5000)
         |         > 300 AS INT) AS srm_flag
         |FROM g""".stripMargin
    },

    "q148_ab_lift" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS converted
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT converted,
         |         CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, converted,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(SUM(converted) AS BIGINT) AS n_converted
         |  FROM a GROUP BY 1)
         |SELECT arm, n_users, n_converted,
         |       CAST(FLOOR(10000.0 * n_converted / n_users) AS BIGINT)
         |         AS conv_bp,
         |       CAST(FLOOR(10000.0 * SUM(n_converted) OVER () /
         |         SUM(n_users) OVER ()) AS BIGINT) AS pooled_bp,
         |       CAST(FLOOR(10000.0 * n_converted / n_users) AS BIGINT) -
         |         CAST(FLOOR(10000.0 * SUM(n_converted) OVER () /
         |           SUM(n_users) OVER ()) AS BIGINT) AS delta_bp
         |FROM g""".stripMargin
    },

    "q141_modality_coverage" ->
      s"""WITH d AS (SELECT DISTINCT doc_id FROM documents),
         |e AS (SELECT DISTINCT vec_id FROM embeddings),
         |j AS (SELECT d.doc_id, e.vec_id
         |      FROM d FULL OUTER JOIN e ON d.doc_id = e.vec_id)
         |SELECT CAST(COUNT(doc_id) AS BIGINT) AS n_docs,
         |       CAST(COUNT(vec_id) AS BIGINT) AS n_vecs,
         |       CAST(SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         |       CAST(SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NULL
         |         THEN 1 ELSE 0 END) AS BIGINT) AS docs_only,
         |       CAST(SUM(CASE WHEN doc_id IS NULL AND vec_id IS NOT NULL
         |         THEN 1 ELSE 0 END) AS BIGINT) AS vecs_only,
         |       CASE WHEN COUNT(doc_id) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 *
         |              SUM(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
         |                  THEN 1 ELSE 0 END) / COUNT(doc_id)) AS BIGINT)
         |       END AS coverage_bp
         |FROM j""".stripMargin,

    // q80's keep-k-smallest-draw convention at the USER key.
    "q132_contributor_cap" -> {
      val k = Queries.ContributorCapK
      s"""WITH r AS (
         |  SELECT event_id, user_id, event_type,
         |         ROW_NUMBER() OVER (PARTITION BY user_id
         |           ORDER BY md5(CAST(event_id AS VARCHAR)) ASC, event_id ASC)
         |           AS rn
         |  FROM events)
         |SELECT event_id, user_id, event_type FROM r WHERE rn <= $k"""
        .stripMargin
    },

    // q138's oracle + the literal-1 sketch verdict (q37 pattern): the
    // HLL estimate is engine-specific, so the Spark side emits the
    // exact count and a within-bound flag; a sketch out of bound
    // flips sketch_ok to 0 and fails the hash.
    "q150_props_schema_approx" ->
      s"""WITH tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM events),
         |kv AS (
         |  SELECT u.k AS key,
         |         json_extract_string(e.props, '$$.' || u.k) AS value
         |  FROM events e, unnest(json_keys(e.props)) AS u(k)
         |  WHERE e.props IS NOT NULL),
         |g AS (
         |  SELECT key, CAST(COUNT(*) AS BIGINT) AS n_present,
         |         CAST(COUNT(DISTINCT value) AS BIGINT) AS n_values,
         |         MIN(value) AS min_value, MAX(value) AS max_value
         |  FROM kv GROUP BY 1)
         |SELECT key, n_present, n_values, min_value, max_value,
         |       CAST(FLOOR(10000.0 * n_present / total_rows) AS BIGINT)
         |         AS present_bp,
         |       CAST(1 AS INT) AS sketch_ok
         |FROM g CROSS JOIN tot""".stripMargin,

    // CUPED: exact HUGEINT moments (twin of Spark's decimal(38,0)
    // sums — both order-independent integers), θ/means in DOUBLE with
    // the identical expression shape.
    "q151_cuped_lift" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val d = Queries.CupedSplitDate
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |             AND value IS NOT NULL AND ts < TIMESTAMP '$d'
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) END), 0)
         |           AS BIGINT) AS x,
         |         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |             AND value IS NOT NULL AND ts >= TIMESTAMP '$d'
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) END), 0)
         |           AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT x, y,
         |         CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, x, y,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         SUM(CAST(x AS HUGEINT)) AS sx,
         |         SUM(CAST(y AS HUGEINT)) AS sy,
         |         SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         |         SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
         |  FROM a GROUP BY 1),
         |p AS (
         |  SELECT *,
         |         CAST(SUM(n_users) OVER () AS DOUBLE) AS pn,
         |         CAST(SUM(sx) OVER () AS DOUBLE) AS psx,
         |         CAST(SUM(sy) OVER () AS DOUBLE) AS psy,
         |         CAST(SUM(sxy) OVER () AS DOUBLE) AS psxy,
         |         CAST(SUM(sxx) OVER () AS DOUBLE) AS psxx
         |  FROM g),
         |t AS (
         |  SELECT *,
         |         CASE WHEN pn * psxx - psx * psx = 0 THEN 0.0
         |              ELSE (pn * psxy - psx * psy) /
         |                   (pn * psxx - psx * psx) END AS theta
         |  FROM p)
         |SELECT arm, n_users,
         |       CAST(FLOOR(CAST(sy AS DOUBLE) / n_users) AS BIGINT)
         |         AS raw_mean_cents,
         |       CAST(FLOOR((CAST(sy AS DOUBLE) - theta *
         |           (CAST(sx AS DOUBLE) - n_users * (psx / pn))) / n_users)
         |         AS BIGINT) AS adj_mean_cents,
         |       CAST(FLOOR(10000.0 * theta) AS BIGINT) AS theta_bp
         |FROM t""".stripMargin
    },

    // winsorized means: nearest-rank pooled cap from the value-grain
    // histogram (q77's CTE shape at the user-metric domain).
    "q152_winsorized_lift" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val p = Queries.WinsorBp
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |             AND value IS NOT NULL
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) END), 0)
         |           AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |h AS (SELECT y, COUNT(*) AS cnt FROM u GROUP BY 1),
         |c AS (SELECT y, SUM(cnt) OVER (ORDER BY y) AS cum,
         |             SUM(cnt) OVER () AS n FROM h),
         |cap AS (
         |  SELECT CAST(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
         |    THEN y END) AS BIGINT) AS cap_cents FROM c),
         |a AS (
         |  SELECT y,
         |         CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, y,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         SUM(CAST(y AS HUGEINT)) AS sy,
         |         SUM(CAST(LEAST(y, cap_cents) AS HUGEINT)) AS sw,
         |         CAST(MIN(cap_cents) AS BIGINT) AS cap_cents
         |  FROM a CROSS JOIN cap GROUP BY 1)
         |SELECT arm, n_users, cap_cents,
         |       CAST(FLOOR(CAST(sy AS DOUBLE) / n_users) AS BIGINT)
         |         AS raw_mean_cents,
         |       CAST(FLOOR(CAST(sw AS DOUBLE) / n_users) AS BIGINT)
         |         AS wins_mean_cents
         |FROM g""".stripMargin
    },

    // one subquery per FK edge (key-grain child counts LEFT JOIN the
    // parent key set), unioned at report grain — the q153 twin.
    "q153_ref_integrity" -> {
      def edge(label: String, child: String, fk: String,
          parent: String, pk: String) =
        s"""SELECT '$label' AS edge,
           |       CAST(SUM(nr) AS BIGINT) AS n_rows,
           |       CAST(COUNT(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT)
           |         AS n_keys,
           |       CAST(COALESCE(SUM(CASE WHEN k IS NULL THEN nr END), 0)
           |         AS BIGINT) AS n_null_rows,
           |       CAST(COALESCE(SUM(CASE WHEN k IS NOT NULL AND p IS NULL
           |         THEN 1 END), 0) AS BIGINT) AS n_orphan_keys,
           |       CAST(COALESCE(SUM(CASE WHEN k IS NOT NULL AND p IS NULL
           |         THEN nr END), 0) AS BIGINT) AS n_orphan_rows,
           |       CAST(FLOOR(10000.0 *
           |         COALESCE(SUM(CASE WHEN k IS NOT NULL AND p IS NULL
           |           THEN nr END), 0) / SUM(nr)) AS BIGINT) AS orphan_bp
           |FROM (
           |  SELECT c.k AS k, c.nr AS nr, p.p AS p
           |  FROM (SELECT $fk AS k, COUNT(*) AS nr FROM $child GROUP BY 1) c
           |  LEFT JOIN (SELECT DISTINCT $pk AS k, 1 AS p FROM $parent) p
           |    ON c.k = p.k)""".stripMargin
      Seq(
        edge("lineitem_orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        edge("orders_customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        edge("events_customer", "events", "user_id",
          "customer", "c_custkey")).mkString("\nUNION ALL\n")
    },

    // window-derived first-from anchor, conditional first-to at the
    // user grain, then q77's histogram CTE over delay seconds.
    "q154_time_to_convert" -> {
      val ranks = Queries.QuantileRanks
      val picks = ranks.map { p =>
        s"""SELECT CAST($p AS BIGINT) AS rank_bp,
           |       CAST(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |         THEN delay_s END) AS BIGINT) AS delay_s
           |FROM c""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us,
         |         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
         |           OVER (PARTITION BY user_id) AS t_from
         |  FROM events WHERE ts IS NOT NULL),
         |u AS (
         |  SELECT user_id, MIN(t_from) AS t_from,
         |         MIN(CASE WHEN event_type = 'purchase' AND us >= t_from
         |           THEN us END) AS t_to
         |  FROM e GROUP BY 1),
         |g AS (
         |  SELECT CASE WHEN t_to IS NOT NULL
         |    THEN (t_to - t_from) // 1000000 END AS delay_s, t_from
         |  FROM u),
         |f AS (
         |  SELECT CAST(COUNT(t_from) AS BIGINT) AS n_from_users,
         |         CAST(COUNT(delay_s) AS BIGINT) AS n_converted FROM g),
         |h AS (SELECT delay_s, COUNT(*) AS cnt FROM g
         |      WHERE delay_s IS NOT NULL GROUP BY 1),
         |c AS (SELECT delay_s, SUM(cnt) OVER (ORDER BY delay_s) AS cum,
         |             SUM(cnt) OVER () AS n FROM h),
         |q AS ($picks)
         |SELECT rank_bp, delay_s, n_from_users, n_converted
         |FROM q CROSS JOIN f""".stripMargin
    },

    // predicted rows as HUGEINT→VARCHAR (Spark: decimal(38,0)→string
    // — the one cross-engine-stable carrier for a Σ cl·cr that can
    // pass BIGINT); hot key ties break by largest key on both sides.
    "q155_join_fanout" ->
      s"""WITH lc AS (
         |  SELECT user_id AS lk, CAST(COUNT(*) AS BIGINT) AS cl
         |  FROM events GROUP BY 1),
         |rc AS (
         |  SELECT o_custkey AS rk, CAST(COUNT(*) AS BIGINT) AS cr
         |  FROM orders GROUP BY 1),
         |j AS (SELECT lk, rk, cl, cr
         |      FROM lc FULL OUTER JOIN rc ON lc.lk = rc.rk),
         |r AS (
         |  SELECT CAST(COALESCE(SUM(cl), 0) AS BIGINT) AS n_left_rows,
         |         CAST(COALESCE(SUM(cr), 0) AS BIGINT) AS n_right_rows,
         |         CAST(COUNT(CASE WHEN cl IS NOT NULL AND lk IS NOT NULL
         |           THEN 1 END) AS BIGINT) AS n_left_keys,
         |         CAST(COUNT(CASE WHEN cr IS NOT NULL AND rk IS NOT NULL
         |           THEN 1 END) AS BIGINT) AS n_right_keys,
         |         CAST(COUNT(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
         |           THEN 1 END) AS BIGINT) AS n_matched_keys,
         |         CAST(COALESCE(SUM(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL
         |           THEN CAST(cl AS HUGEINT) * CAST(cr AS HUGEINT) END), 0)
         |           AS VARCHAR) AS predicted_rows
         |  FROM j),
         |h AS (
         |  SELECT CAST(lk AS VARCHAR) AS hot_key,
         |         CAST(CAST(cl AS HUGEINT) * CAST(cr AS HUGEINT) AS VARCHAR)
         |           AS hot_fanout
         |  FROM j WHERE cl IS NOT NULL AND cr IS NOT NULL
         |  ORDER BY CAST(cl AS HUGEINT) * CAST(cr AS HUGEINT) DESC, lk DESC
         |  LIMIT 1)
         |SELECT n_left_rows, n_right_rows, n_left_keys, n_right_keys,
         |       n_matched_keys, predicted_rows, hot_key, hot_fanout
         |FROM r LEFT JOIN h ON TRUE""".stripMargin,

    // one conditional-aggregate pass per column, unioned — the q73
    // oracle pattern with the pre/post split spliced in.
    "q156_profile_drift" -> {
      val d = Queries.DriftSplitDate
      val nullBp = (nn: String, n: String) =>
        s"CASE WHEN $n = 0 THEN 0 ELSE CAST(FLOOR(10000.0 * ($n - $nn) / $n) AS BIGINT) END"
      val rows = Queries.DriftCols.map { c =>
        val (nnp, nnq) = (s"COUNT(CASE WHEN pre THEN $c END)",
          s"COUNT(CASE WHEN NOT pre THEN $c END)")
        s"""SELECT '$c' AS column_name,
           |       CAST(COUNT(CASE WHEN pre THEN 1 END) AS BIGINT) AS n_pre,
           |       CAST(COUNT(CASE WHEN NOT pre THEN 1 END) AS BIGINT) AS n_post,
           |       CAST($nnp AS BIGINT) AS nn_pre,
           |       CAST($nnq AS BIGINT) AS nn_post,
           |       CAST(COUNT(DISTINCT CASE WHEN pre THEN $c END) AS BIGINT)
           |         AS nd_pre,
           |       CAST(COUNT(DISTINCT CASE WHEN NOT pre THEN $c END) AS BIGINT)
           |         AS nd_post,
           |       ${nullBp(nnq, s"COUNT(CASE WHEN NOT pre THEN 1 END)")} -
           |         ${nullBp(nnp, s"COUNT(CASE WHEN pre THEN 1 END)")}
           |         AS null_delta_bp,
           |       CASE WHEN COUNT(DISTINCT CASE WHEN pre THEN $c END) = 0
           |         THEN 0
           |         ELSE CAST(FLOOR(10000.0 *
           |           COUNT(DISTINCT CASE WHEN NOT pre THEN $c END) /
           |           COUNT(DISTINCT CASE WHEN pre THEN $c END)) AS BIGINT)
           |       END AS nd_ratio_bp
           |FROM e""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e AS (
         |  SELECT *, ts < TIMESTAMP '$d' AS pre
         |  FROM events WHERE ts IS NOT NULL)
         |$rows""".stripMargin
    },

    // Triangle census on the q93 edge set: the oracle counts each
    // triangle once by plain id-ordering (a<b<c); the Spark side's
    // degree-ordered orientation finds the same triangle set.
    "q157_triangles" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      s"""$sessionCte,
         |it0 AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM sz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS w
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.item < b.item
         |  GROUP BY 1, 2),
         |eg AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE w >= $ms),
         |deg AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS v FROM eg UNION ALL SELECT b FROM eg)
         |  GROUP BY 1),
         |ns AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |         CAST(COALESCE(MAX(deg), 0) AS BIGINT) AS max_deg,
         |         CAST(COALESCE(SUM(deg * (deg - 1) // 2), 0) AS BIGINT)
         |           AS n_wedges
         |  FROM deg),
         |es AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM eg),
         |tri AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM eg e1
         |  JOIN eg e2 ON e2.a = e1.b
         |  JOIN eg e3 ON e3.a = e1.a AND e3.b = e2.b)
         |SELECT n_nodes, n_edges, max_deg, n_wedges, n_triangles,
         |       CASE WHEN n_wedges = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * 3 * n_triangles / n_wedges)
         |              AS BIGINT) END AS global_cc_bp
         |FROM ns, es, tri""".stripMargin
    },

    // ANN MRR: q100's truth/ann CTEs, truth narrowed to rank 1 and
    // the ANN rank carried instead of collapsed; rr in ppm by BIGINT
    // floor div.
    "q158_ann_mrr" -> {
      val k = Queries.AnnRecallK
      s"""WITH $embQuantCte,
         |tq AS (SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n
         |       WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |ts AS (
         |  SELECT n.vec_id AS neighbor_id, tq.query_id,
         |         CAST(list_sum(list_transform(range(1, len(n.q) + 1),
         |              i -> n.q[i] * tq.q_q[i])) AS BIGINT) AS dot,
         |         n.n2, tq.q_n2
         |  FROM n, tq WHERE n.vec_id != tq.query_id),
         |tc AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM ts),
         |truth AS (
         |  SELECT query_id, neighbor_id AS truth_id, cos_bp AS truth_cos_bp
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM tc) WHERE rank = 1),
         |bkt AS (SELECT *, $signBucketExpr AS bucket FROM n),
         |aq AS (SELECT vec_id AS query_id, bucket, q AS q_q, n2 AS q_n2
         |       FROM bkt WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |asc0 AS (
         |  SELECT bkt.vec_id AS neighbor_id, aq.query_id,
         |         CAST(list_sum(list_transform(range(1, len(bkt.q) + 1),
         |              i -> bkt.q[i] * aq.q_q[i])) AS BIGINT) AS dot,
         |         bkt.n2, aq.q_n2
         |  FROM bkt JOIN aq ON bkt.bucket = aq.bucket
         |  WHERE bkt.vec_id != aq.query_id),
         |ac AS (
         |  SELECT query_id, neighbor_id,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot / (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM asc0),
         |ann AS (
         |  SELECT query_id, neighbor_id AS truth_id, CAST(rank AS BIGINT) AS r
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM ac) WHERE rank <= $k)
         |SELECT t.query_id, t.truth_id, t.truth_cos_bp,
         |       CAST(COALESCE(a.r, 0) AS BIGINT) AS ann_rank,
         |       CASE WHEN a.r IS NULL THEN 0
         |            ELSE CAST(1000000 // a.r AS BIGINT) END AS rr_ppm
         |FROM truth t LEFT JOIN ann a
         |  ON a.query_id = t.query_id AND a.truth_id = t.truth_id""".stripMargin
    },

    // Dyadic decay: the weight is the same BIGINT right-shift on both
    // engines — no libm exp anywhere.
    "q159_decayed_popularity" -> {
      val h = Queries.DecayHalfLifeDays
      s"""WITH e AS (
         |  SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |         date_diff('day', CAST(ts AS DATE),
         |                   DATE '${Queries.RfmAnchor}') AS age
         |  FROM events
         |  WHERE ts IS NOT NULL
         |    AND json_extract_string(props, '$$.k') IS NOT NULL),
         |f AS (
         |  SELECT item, age,
         |         1000000::BIGINT >> CAST(least(age // $h, 62) AS INT) AS w
         |  FROM e WHERE age >= 0)
         |SELECT item, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(w) AS BIGINT) AS score_ppm,
         |       CAST(MIN(age) AS BIGINT) AS last_age_days
         |FROM f GROUP BY 1
         |ORDER BY score_ppm DESC, item
         |LIMIT ${Queries.DecayTopK}""".stripMargin
    },

    // Key balance: Σc² in HUGEINT (the q155 big-number VARCHAR
    // convention), the eff ratio in textually-mirrored DOUBLE.
    "q160_key_balance" -> {
      def side(label: String, table: String, key: String): String =
        s"""SELECT '$label' AS side, n_rows, n_keys, max_key_rows,
           |       COALESCE(CAST(sumsq AS VARCHAR), '0') AS sum_sq,
           |       CASE WHEN COALESCE(sumsq, 0) = 0 THEN 0
           |            ELSE CAST(FLOOR(CAST(n_rows AS DOUBLE) *
           |              CAST(n_rows AS DOUBLE) / CAST(sumsq AS DOUBLE))
           |              AS BIGINT) END AS eff_keys,
           |       CASE WHEN n_keys = 0 THEN 0
           |            ELSE CAST(FLOOR(10000.0 *
           |              (CASE WHEN COALESCE(sumsq, 0) = 0 THEN 0
           |                    ELSE CAST(FLOOR(CAST(n_rows AS DOUBLE) *
           |                      CAST(n_rows AS DOUBLE) / CAST(sumsq AS DOUBLE))
           |                      AS BIGINT) END) / n_keys) AS BIGINT)
           |       END AS balance_bp
           |FROM (
           |  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_rows,
           |         CAST(COUNT(*) AS BIGINT) AS n_keys,
           |         CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_key_rows,
           |         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sumsq
           |  FROM (SELECT $key AS k, COUNT(*) AS c FROM $table
           |        WHERE $key IS NOT NULL GROUP BY 1))""".stripMargin
      Seq(side("events_user_id", "events", "user_id"),
        side("orders_custkey", "orders", "o_custkey"),
        side("lineitem_orderkey", "lineitem", "l_orderkey"))
        .mkString("\nUNION ALL\n")
    },

    // TPC-H Q3 shape with the q136 cents convention (per-row floor to
    // BIGINT cents, then exact integer sum).
    "q161_shipping_priority" ->
      s"""SELECT l.l_orderkey,
         |       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |         * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
         |       o.o_orderpriority
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |WHERE c.c_mktsegment = '${Queries.Q3Segment}'
         |  AND o.o_orderdate < TIMESTAMP '${Queries.Q3Cutoff}'
         |  AND l.l_shipdate > TIMESTAMP '${Queries.Q3Cutoff}'
         |GROUP BY 1, 3, 4
         |ORDER BY revenue_cents DESC, l.l_orderkey
         |LIMIT ${Queries.Q3TopK}""".stripMargin,

    // Entry/exit per session from deterministic (ts_us, event_id)
    // first/last windows over the shared session CTE; type-grain
    // full-outer merge.
    "q162_entry_exit" ->
      s"""$sessionCte,
         |r AS (
         |  SELECT user_id, session_seq, event_type,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS rn_a,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us DESC, event_id DESC) AS rn_d
         |  FROM sz),
         |s AS (
         |  SELECT user_id, session_seq,
         |         MAX(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
         |         MAX(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type,
         |         COUNT(*) AS n_events
         |  FROM r GROUP BY 1, 2),
         |en AS (
         |  SELECT entry_type AS event_type,
         |         CAST(COUNT(*) AS BIGINT) AS n_entries,
         |         CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_bounces
         |  FROM s GROUP BY 1),
         |ex AS (
         |  SELECT exit_type AS event_type, CAST(COUNT(*) AS BIGINT) AS n_exits
         |  FROM s GROUP BY 1)
         |SELECT COALESCE(en.event_type, ex.event_type) AS event_type,
         |       COALESCE(n_entries, 0) AS n_entries,
         |       COALESCE(n_exits, 0) AS n_exits,
         |       COALESCE(n_bounces, 0) AS n_bounces,
         |       CASE WHEN COALESCE(n_entries, 0) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_bounces / n_entries) AS BIGINT)
         |       END AS bounce_bp
         |FROM en FULL JOIN ex ON en.event_type = ex.event_type""".stripMargin,

    // Header/detail money reconciliation: exact cents both sides, the
    // q139 distinct-value histogram for the delta panel.
    "q163_order_reconciliation" -> {
      val tol = Queries.ReconToleranceBp
      def pick(p: Long) =
        s"""CAST(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |  THEN abs_delta END) AS BIGINT) AS p${p / 100}_delta_cents"""
          .stripMargin
      s"""WITH lc AS (
         |  SELECT l_orderkey,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
         |           * (1.0 + l_tax) * 100.0) AS BIGINT)) AS BIGINT) AS line_cents
         |  FROM lineitem GROUP BY 1),
         |d AS (
         |  SELECT CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,
         |         lc.line_cents,
         |         lc.line_cents IS NULL AS no_lines,
         |         abs(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |           - COALESCE(lc.line_cents, 0)) AS abs_delta
         |  FROM orders o LEFT JOIN lc ON o.o_orderkey = lc.l_orderkey),
         |st AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(CASE WHEN no_lines THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_no_lines,
         |         CAST(SUM(CASE WHEN NOT no_lines AND abs_delta = 0
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
         |         CAST(SUM(CASE WHEN NOT no_lines
         |           AND abs_delta * 10000 <= total_cents * $tol
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_within_tol
         |  FROM d),
         |st2 AS (
         |  SELECT *, CASE WHEN n_orders = n_no_lines THEN 0
         |    ELSE CAST(FLOOR(10000.0 * n_within_tol / (n_orders - n_no_lines))
         |      AS BIGINT) END AS within_tol_bp
         |  FROM st),
         |h AS (SELECT abs_delta, COUNT(*) AS cnt FROM d
         |      WHERE NOT no_lines GROUP BY 1),
         |c AS (SELECT *, SUM(cnt) OVER (ORDER BY abs_delta) AS cum,
         |             SUM(cnt) OVER () AS n FROM h),
         |q AS (SELECT ${pick(5000L)}, ${pick(9000L)}, ${pick(9900L)} FROM c)
         |SELECT n_orders, n_no_lines, n_exact, n_within_tol, within_tol_bp,
         |       p50_delta_cents, p90_delta_cents, p99_delta_cents
         |FROM st2 LEFT JOIN q ON TRUE""".stripMargin
    },

    // Lift over the q90 basket CTEs: the double ratio is evaluated in
    // the SAME left-to-right order as the Spark column (IEEE
    // determinism — the volumeAnomaly convention).
    "q164_association_rules" -> {
      val cap = Queries.CoVisitMaxItems
      val mp = Queries.LiftMinPair
      s"""$sessionCte,
         |it0 AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM sz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS pair_sessions
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.item < b.item
         |  GROUP BY 1, 2),
         |n AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM capped GROUP BY 1),
         |tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS total_sessions FROM (
         |    SELECT DISTINCT user_id, session_seq FROM capped))
         |SELECT item_a, item_b, pair_sessions,
         |       na.n AS sessions_a, nb.n AS sessions_b, t.total_sessions,
         |       CAST(FLOOR(10000.0 * pair_sessions / na.n / nb.n
         |         * t.total_sessions) AS BIGINT) AS lift_bp
         |FROM pairs
         |JOIN n na ON na.item = pairs.item_a
         |JOIN n nb ON nb.item = pairs.item_b, tot t
         |WHERE pair_sessions >= $mp
         |ORDER BY lift_bp DESC, item_a, item_b
         |LIMIT ${Queries.LiftTopK}""".stripMargin
    },

    // q139's quantile-table twin over doc token lengths per source.
    "q165_length_quantiles" -> {
      val picks = Queries.QuantileRanks.map { p =>
        s"""SELECT source, CAST($p AS BIGINT) AS rank_bp,
           |       CAST(FLOOR(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |         THEN v END) * 100) AS BIGINT) AS value_cents,
           |       CAST(MIN(n) AS BIGINT) AS n_rows
           |FROM c GROUP BY 1""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (
         |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS v,
         |         COUNT(*) AS cnt
         |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY source) AS n
         |  FROM h)
         |$picks""".stripMargin
    },

    // Calibration: q69's score recompute + q18's short-token gate,
    // bucketed by the mirrored bucketCol expression (clamped floor of
    // the per-token score shifted +500, width 100).
    "q166_classifier_calibration" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS tok FROM documents
         |  WHERE text IS NOT NULL),
         |s AS (
         |  SELECT CAST(len(tok) AS BIGINT) AS tc,
         |         CAST(list_sum(list_transform(tok,
         |           x -> ($bucket % 1001) - 500)) AS BIGINT) AS score,
         |         CAST(len(list_filter(tok, x -> length(x) <= 2)) AS BIGINT)
         |           AS sc
         |  FROM t),
         |b AS (
         |  SELECT least(greatest(CAST(FLOOR((CAST(score AS DOUBLE) / tc
         |           + 500.0) / 100.0) AS BIGINT), 0), 9) AS bucket,
         |         CASE WHEN tc >= 20
         |                AND CAST(FLOOR(10000.0 * sc / tc) AS BIGINT) <= 4000
         |              THEN 1 ELSE 0 END AS ok
         |  FROM s)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(ok) AS BIGINT) AS n_quality_ok,
         |       CAST(FLOOR(10000.0 * SUM(ok) / COUNT(*)) AS BIGINT)
         |         AS quality_ok_bp
         |FROM b GROUP BY 1""".stripMargin
    },

    // Key identity churn across the q156 split: presence flags at key
    // grain, then a 1-row rollup.
    "q167_key_churn" -> {
      val d = Queries.DriftSplitDate
      s"""WITH k AS (
         |  SELECT user_id,
         |         MAX(CASE WHEN ts < TIMESTAMP '$d' THEN 1 ELSE 0 END) AS p,
         |         MAX(CASE WHEN ts >= TIMESTAMP '$d' THEN 1 ELSE 0 END) AS q
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |r AS (
         |  SELECT CAST(COALESCE(SUM(p), 0) AS BIGINT) AS n_pre_keys,
         |         CAST(COALESCE(SUM(q), 0) AS BIGINT) AS n_post_keys,
         |         CAST(COALESCE(SUM(p * q), 0) AS BIGINT) AS n_both,
         |         CAST(COALESCE(SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END), 0)
         |           AS BIGINT) AS n_new,
         |         CAST(COALESCE(SUM(CASE WHEN q = 0 THEN 1 ELSE 0 END), 0)
         |           AS BIGINT) AS n_lost
         |  FROM k)
         |SELECT *,
         |       CASE WHEN n_post_keys = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_new / n_post_keys) AS BIGINT)
         |       END AS new_bp,
         |       CASE WHEN n_pre_keys = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_lost / n_pre_keys) AS BIGINT)
         |       END AS lost_bp
         |FROM r""".stripMargin
    },

    // q116's step-chain CTEs with the q147 arm draw threaded through;
    // per-arm lag gives the from-prev conversion.
    "q168_funnel_by_arm" -> {
      val flow = Queries.orderedFlow
      val wUs = Queries.FunnelWindowSeconds * 1000000L
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val stepCtes = flow.zipWithIndex.map { case (s, i) =>
        val r = i + 1
        if (r == 1)
          s"""wp1 AS (
             |  SELECT DISTINCT user_id, session_seq, ts_us, seq
             |  FROM frows WHERE event_type = '$s')""".stripMargin
        else
          s"""wp$r AS (
             |  SELECT DISTINCT r.user_id, r.session_seq, r.ts_us, r.seq
             |  FROM frows r JOIN wp${r - 1} p
             |    ON r.user_id = p.user_id AND r.session_seq = p.session_seq
             |  WHERE r.event_type = '$s' AND r.seq > p.seq
             |    AND r.ts_us - p.ts_us <= $wUs)""".stripMargin
      }.mkString(",\n")
      val reachedRows = flow.indices.map { i =>
        s"""SELECT f.arm, ${i + 1} AS step_idx,
           |  CAST(COUNT(*) AS BIGINT) AS sessions_reached
           |FROM (SELECT DISTINCT user_id, session_seq FROM wp${i + 1}) w
           |JOIN farm f ON f.user_id = w.user_id
           |  AND f.session_seq = w.session_seq
           |GROUP BY 1""".stripMargin
      }.mkString("\n  UNION ALL ")
      val stepRows = flow.zipWithIndex
        .map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
      s"""$sessionCte,
         |frows AS (
         |  SELECT user_id, session_seq, event_type, ts_us,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS seq
         |  FROM sz),
         |fsess AS (SELECT DISTINCT user_id, session_seq FROM frows),
         |ua AS (
         |  SELECT user_id, CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |           THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT DISTINCT user_id,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM frows)),
         |farm AS (
         |  SELECT f.user_id, f.session_seq, ua.arm
         |  FROM fsess f JOIN ua USING (user_id)),
         |$stepCtes,
         |steps(step_idx, step) AS (VALUES $stepRows),
         |arms AS (SELECT DISTINCT arm FROM farm),
         |tot AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS total_sessions
         |        FROM farm GROUP BY 1),
         |rk AS ($reachedRows),
         |grid AS (SELECT a.arm, s.step_idx, s.step FROM arms a, steps s),
         |fin AS (
         |  SELECT g.arm, CAST(g.step_idx AS BIGINT) AS step_idx, g.step,
         |         CAST(COALESCE(rk.sessions_reached, 0) AS BIGINT)
         |           AS sessions_reached,
         |         t.total_sessions
         |  FROM grid g
         |  LEFT JOIN rk ON rk.arm = g.arm AND rk.step_idx = g.step_idx
         |  JOIN tot t ON t.arm = g.arm),
         |fin2 AS (
         |  SELECT *, COALESCE(LAG(sessions_reached) OVER (
         |      PARTITION BY arm ORDER BY step_idx), total_sessions)
         |    AS prev_reached
         |  FROM fin)
         |SELECT arm, step_idx, step, sessions_reached, prev_reached,
         |       CASE WHEN prev_reached = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / prev_reached)
         |              AS BIGINT) END AS conv_from_prev_bp,
         |       CASE WHEN total_sessions = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * sessions_reached / total_sessions)
         |              AS BIGINT) END AS reach_bp,
         |       total_sessions
         |FROM fin2""".stripMargin
    },

    // Ordered sequences: rn over (first_us, item) = the Spark side's
    // sorted-struct-array position, so rn_a < rn_b IS "a before b".
    "q169_sequential_rules" -> {
      val cap = Queries.CoVisitMaxItems
      s"""$sessionCte,
         |it AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |         MIN(ts_us) AS first_us
         |  FROM sz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item, rn FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY first_us, item) AS rn
         |    FROM it)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS pair_sessions
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.rn < b.rn
         |  GROUP BY 1, 2),
         |n AS (SELECT item AS item_a, CAST(COUNT(*) AS BIGINT) AS sessions_a
         |      FROM capped GROUP BY 1)
         |SELECT item_a, item_b, pair_sessions, sessions_a,
         |       CAST(pair_sessions * 10000 // sessions_a AS BIGINT) AS conf_bp
         |FROM pairs JOIN n USING (item_a)
         |ORDER BY pair_sessions DESC, item_a, item_b
         |LIMIT ${Queries.LiftTopK}""".stripMargin
    },

    // TPC-H Q10 shape with the house cents convention.
    "q170_returned_revenue" ->
      s"""SELECT c.c_custkey, n.n_name,
         |       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |         * 100.0) AS BIGINT)) AS BIGINT) AS returned_cents,
         |       CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE l.l_returnflag = 'R'
         |  AND o.o_orderdate >= TIMESTAMP '${Queries.Q5YearFrom}'
         |  AND o.o_orderdate < TIMESTAMP '${Queries.Q5YearUntil}'
         |GROUP BY 1, 2
         |ORDER BY returned_cents DESC, c.c_custkey
         |LIMIT 20""".stripMargin,

    // HHI: Σc² in HUGEINT, the ratio in textually-mirrored DOUBLE.
    "q171_part_concentration" -> {
      val m = Queries.HhiMinRows
      s"""WITH ps AS (
         |  SELECT l_partkey, l_suppkey, COUNT(*) AS c
         |  FROM lineitem GROUP BY 1, 2),
         |p AS (
         |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         |         CAST(SUM(c) AS BIGINT) AS n_rows,
         |         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sumsq
         |  FROM ps GROUP BY 1)
         |SELECT l_partkey, n_suppliers, n_rows,
         |       CAST(FLOOR(10000.0 * CAST(sumsq AS DOUBLE) /
         |         (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)))
         |         AS BIGINT) AS hhi_bp
         |FROM p WHERE n_rows >= $m
         |ORDER BY hhi_bp DESC, l_partkey
         |LIMIT ${Queries.HhiTopK}""".stripMargin
    },

    "q172_promo_revenue" ->
      s"""WITH lr AS (
         |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, l_partkey,
         |         CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
         |           AS BIGINT) AS rev_cents
         |  FROM lineitem),
         |m AS (
         |  SELECT ship_month,
         |         CAST(COALESCE(SUM(CASE WHEN p.p_type = '${Queries.PromoType}'
         |           THEN lr.rev_cents END), 0) AS BIGINT) AS promo_cents,
         |         CAST(SUM(lr.rev_cents) AS BIGINT) AS total_cents
         |  FROM lr JOIN part p ON lr.l_partkey = p.p_partkey
         |  GROUP BY 1)
         |SELECT ship_month, promo_cents, total_cents,
         |       CAST(FLOOR(10000.0 * promo_cents / total_cents) AS BIGINT)
         |         AS promo_bp
         |FROM m ORDER BY ship_month""".stripMargin,

    "q173_market_share" ->
      s"""WITH regn AS (
         |  SELECT n_nationkey AS cust_nkey
         |  FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name = '${Queries.Q5Region}'),
         |ord AS (
         |  SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN regn ON c.c_nationkey = regn.cust_nkey),
         |yn AS (
         |  SELECT ord.o_year, n.n_name AS supp_nation,
         |         CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |           * 100.0) AS BIGINT)) AS BIGINT) AS nation_cents
         |  FROM lineitem l
         |  JOIN ord ON l.l_orderkey = ord.o_orderkey
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  GROUP BY 1, 2)
         |SELECT o_year, supp_nation, nation_cents,
         |       CAST(FLOOR(10000.0 * nation_cents /
         |         SUM(nation_cents) OVER (PARTITION BY o_year)) AS BIGINT)
         |         AS share_bp
         |FROM yn ORDER BY o_year, supp_nation""".stripMargin,

    "q174_bracket_revenue" -> {
      val conds = Queries.Q19Brackets.map { case (b, sLo, sHi, qLo, qHi) =>
        s"(p_brand = '$b' AND p_size BETWEEN $sLo AND $sHi" +
          s" AND l_quantity BETWEEN $qLo AND $qHi)"
      }.mkString("\n   OR ")
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         |       CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice *
         |         (1.0 - l_discount) * 100.0) AS BIGINT)), 0) AS BIGINT)
         |         AS revenue_cents
         |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE $conds""".stripMargin
    },

    "q175_idle_customers" ->
      s"""WITH bal AS (
         |  SELECT c_custkey, c_nationkey,
         |         CAST(FLOOR(c_acctbal * 100.0) AS BIGINT) AS bal_cents
         |  FROM customer),
         |t AS (
         |  SELECT CAST(SUM(bal_cents) AS BIGINT) // COUNT(*) AS avg_cents
         |  FROM bal WHERE bal_cents > 0),
         |idle AS (
         |  SELECT b.c_custkey, b.c_nationkey, b.bal_cents
         |  FROM bal b, t
         |  WHERE b.bal_cents > t.avg_cents
         |    AND NOT EXISTS (SELECT 1 FROM orders o
         |      WHERE o.o_custkey = b.c_custkey
         |        AND o.o_orderdate >= TIMESTAMP '${Queries.IdleSince}'))
         |SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
         |       CAST(SUM(bal_cents) AS BIGINT) AS acctbal_cents
         |FROM idle JOIN nation n ON idle.c_nationkey = n.n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Exact histogram-grain Gini (see Profile.engagementInequality):
    // HUGEINT mirrors the decimal(38,0) exactness, the two ratios are
    // the only doubles and textually mirror the Spark expressions.
    "q176_engagement_gini" ->
      s"""WITH pk AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |h AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS m FROM pk GROUP BY 1),
         |w AS (
         |  SELECT c, m,
         |         CAST(COALESCE(SUM(m) OVER (ORDER BY c ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS kb,
         |         CAST(COALESCE(SUM(m) OVER (ORDER BY c DESC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS kb_desc,
         |         CAST(SUM(m) OVER () AS BIGINT) AS n
         |  FROM h),
         |w2 AS (
         |  SELECT *, GREATEST(0, LEAST(m, GREATEST(1, n // 10) - kb_desc))
         |    AS take
         |  FROM w),
         |a AS (
         |  SELECT CAST(MAX(n) AS BIGINT) AS n_keys,
         |         CAST(SUM(c * m) AS BIGINT) AS n_rows,
         |         SUM(CAST(c AS HUGEINT) * CAST(m AS HUGEINT)
         |               * CAST(kb AS HUGEINT)
         |             + CAST(c AS HUGEINT) *
         |               ((CAST(m AS HUGEINT) * (CAST(m AS HUGEINT) + 1)) // 2))
         |           AS s1,
         |         CAST(SUM(c * take) AS BIGINT) AS top_rows
         |  FROM w2)
         |SELECT COALESCE(n_keys, 0) AS n_keys,
         |       COALESCE(n_rows, 0) AS n_rows,
         |       CASE WHEN COALESCE(n_rows, 0) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 *
         |              (2.0 * CAST(s1 AS DOUBLE) -
         |                (CAST(n_keys AS DOUBLE) + 1.0) *
         |                  CAST(n_rows AS DOUBLE)) /
         |              (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)))
         |              AS BIGINT) END AS gini_bp,
         |       CASE WHEN COALESCE(n_rows, 0) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * top_rows / n_rows) AS BIGINT)
         |            END AS top_decile_bp
         |FROM a""".stripMargin,

    // Two standalone item-event sessionizations (the q99 contract)
    // split at the drift date; majority model from the train half,
    // transition-weighted accuracy on the test half.
    "q177_next_item_backtest" -> {
      val d = Queries.DriftSplitDate
      def sessPairs(src: String, out: String): String =
        s"""${out}_s0 AS (
           |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
           |    ORDER BY ts_us, event_id) AS prev_us
           |  FROM $src),
           |${out}_s1 AS (
           |  SELECT user_id, event_id, ts_us, item,
           |         CAST(SUM(CASE WHEN prev_us IS NULL
           |                        OR ts_us - prev_us > 1800000000
           |                   THEN 1 ELSE 0 END) OVER (
           |           PARTITION BY user_id ORDER BY ts_us, event_id
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
           |  FROM ${out}_s0),
           |$out AS (
           |  SELECT prev_item, item AS next_item,
           |         CAST(COUNT(*) AS BIGINT) AS n
           |  FROM (
           |    SELECT user_id, session_seq, item,
           |           lag(item) OVER (PARTITION BY user_id, session_seq
           |             ORDER BY ts_us, event_id) AS prev_item
           |    FROM ${out}_s1)
           |  WHERE prev_item IS NOT NULL GROUP BY 1, 2)""".stripMargin
      s"""WITH iev AS (
         |  SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
         |tr0 AS (SELECT * FROM iev WHERE ts < TIMESTAMP '$d'),
         |te0 AS (SELECT * FROM iev WHERE ts >= TIMESTAMP '$d'),
         |${sessPairs("tr0", "trp")},
         |${sessPairs("te0", "tep")},
         |model AS (
         |  SELECT prev_item, next_item AS predicted FROM (
         |    SELECT *, row_number() OVER (PARTITION BY prev_item
         |      ORDER BY n DESC, next_item ASC) AS rn
         |    FROM trp) WHERE rn = 1),
         |j AS (
         |  SELECT tep.*, model.predicted
         |  FROM tep LEFT JOIN model USING (prev_item)),
         |a AS (
         |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_test,
         |         CAST(COALESCE(SUM(CASE WHEN predicted IS NOT NULL THEN n
         |           END), 0) AS BIGINT) AS n_covered,
         |         CAST(COALESCE(SUM(CASE WHEN predicted = next_item THEN n
         |           END), 0) AS BIGINT) AS n_hits
         |  FROM j)
         |SELECT n_test, n_covered, n_hits,
         |       CASE WHEN n_test = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_hits / n_test) AS BIGINT)
         |            END AS acc_bp,
         |       CASE WHEN n_covered = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_hits / n_covered) AS BIGINT)
         |            END AS covered_acc_bp
         |FROM a""".stripMargin
    },

    // q22's candidate/verify CTEs re-derived at the sweep floor, the
    // q23 loser rule per threshold; thresholds that drop nothing
    // still get their zero row (LEFT JOIN from the VALUES list).
    "q178_dedup_threshold_curve" -> {
      val ts = Queries.DedupSweepBp
      val values = ts.map(t => s"($t)").mkString(", ")
      s"""WITH $minhashCandCtes,
         |v AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) + len(sb.shingles)
         |              - len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |p AS (
         |  SELECT doc_a, doc_b,
         |         CASE WHEN uni = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |              END AS jaccard_bp
         |  FROM v
         |  WHERE CASE WHEN uni = 0 THEN 0
         |             ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |             END >= ${ts.min}),
         |th(threshold_bp) AS (VALUES $values),
         |sw AS (
         |  SELECT th.threshold_bp, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         CAST(COUNT(DISTINCT p.doc_b) AS BIGINT) AS n_docs_dropped
         |  FROM th JOIN p ON p.jaccard_bp >= th.threshold_bp
         |  GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT CAST(th.threshold_bp AS BIGINT) AS threshold_bp,
         |       COALESCE(sw.n_pairs, 0) AS n_pairs,
         |       COALESCE(sw.n_docs_dropped, 0) AS n_docs_dropped,
         |       CASE WHEN tot.n_docs = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * COALESCE(sw.n_docs_dropped, 0)
         |              / tot.n_docs) AS BIGINT) END AS drop_bp
         |FROM th LEFT JOIN sw ON th.threshold_bp = sw.threshold_bp, tot
         |ORDER BY 1""".stripMargin
    },

    "q179_top_supplier" ->
      s"""WITH r AS (
         |  SELECT l_suppkey,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
         |           * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '${Queries.Q15From}'
         |    AND l_shipdate < TIMESTAMP '${Queries.Q15Until}'
         |  GROUP BY 1)
         |SELECT s.s_suppkey, s.s_name, r.total_cents
         |FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
         |WHERE r.total_cents = (SELECT MAX(total_cents) FROM r)
         |ORDER BY s.s_suppkey""".stripMargin,

    // exact integer threshold: denom·qty·n < numer·Σq (no double avg)
    "q180_small_qty_revenue" ->
      s"""WITH p AS (
         |  SELECT l_partkey,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
         |       CAST(COALESCE(SUM(CAST(FLOOR(l.l_extendedprice *
         |         (1.0 - l.l_discount) * 100.0) AS BIGINT)), 0) AS BIGINT)
         |         AS revenue_cents
         |FROM lineitem l JOIN p ON l.l_partkey = p.l_partkey
         |WHERE 5 * CAST(l.l_quantity AS BIGINT) * p.c < 1 * p.sq""".stripMargin,

    "q181_large_orders" ->
      s"""WITH oq AS (
         |  SELECT l_orderkey,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING SUM(CAST(l_quantity AS BIGINT)) >= ${Queries.Q18MinQty})
         |SELECT c.c_custkey, c.c_name, o.o_orderkey,
         |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
         |       CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS total_cents,
         |       oq.sum_qty
         |FROM oq
         |JOIN orders o ON oq.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |ORDER BY oq.sum_qty DESC, o.o_orderkey
         |LIMIT ${Queries.Q18TopK}""".stripMargin,

    // q42's recursive-CC twin at doc grain × the q18 quality verdict,
    // collapsed to ⌊log₂ cluster-size⌋ buckets (q129's bitlen).
    "q182_cluster_quality" ->
      s"""WITH RECURSIVE $minhashPairCtes,
         |sym AS (
         |  SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION ALL
         |  SELECT doc_b, doc_a FROM p),
         |reach(node, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT s.b, r.lbl FROM reach r JOIN sym s ON s.a = r.node),
         |comp AS (
         |  SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY 1),
         |cs AS (
         |  SELECT doc_id,
         |         CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
         |           AS cluster_size
         |  FROM comp),
         |t AS (SELECT doc_id, string_split(text, ' ') AS tokens
         |      FROM documents),
         |q AS (
         |  SELECT doc_id,
         |         CAST(len(tokens) AS BIGINT) AS token_count,
         |         CAST(FLOOR(10000.0 *
         |           CAST(len(list_filter(tokens, x -> length(x) <= 2))
         |             AS BIGINT) / CAST(len(tokens) AS BIGINT)) AS BIGINT)
         |           AS short_bp
         |  FROM t),
         |ok AS (
         |  SELECT doc_id,
         |         CAST((token_count >= 20 AND short_bp <= 4000) AS INT)
         |           AS quality_ok
         |  FROM q),
         |j AS (
         |  SELECT CAST(length(format('{:b}', cs.cluster_size)) - 1 AS BIGINT)
         |           AS bucket,
         |         ok.quality_ok
         |  FROM cs JOIN ok ON cs.doc_id = ok.doc_id)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(COALESCE(SUM(quality_ok), 0) AS BIGINT) AS n_quality_ok,
         |       CAST(FLOOR(10000.0 * COALESCE(SUM(quality_ok), 0) / COUNT(*))
         |         AS BIGINT) AS quality_bp
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    "q183_revenue_seasonality" ->
      s"""WITH m AS (
         |  SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
         |         CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS month_cents
         |  FROM orders GROUP BY 1)
         |SELECT month, n_orders, month_cents,
         |       CAST(FLOOR(10000.0 * month_cents * 12 /
         |         SUM(month_cents) OVER ()) AS BIGINT) AS index_bp
         |FROM m ORDER BY month""".stripMargin,

    // gap lag per customer, then the q139/q165 exact quantile twin at
    // segment grain (value = gap days, cents = days × 100)
    "q184_order_gap_quantiles" -> {
      val picks = Queries.QuantileRanks.map { p =>
        s"""SELECT c_mktsegment, CAST($p AS BIGINT) AS rank_bp,
           |       CAST(FLOOR(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |         THEN v END) * 100) AS BIGINT) AS value_cents,
           |       CAST(MIN(n) AS BIGINT) AS n_rows
           |FROM c GROUP BY 1""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT o_custkey,
         |         CAST(date_diff('day',
         |           CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
         |             ORDER BY o_orderdate, o_orderkey) AS DATE),
         |           CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
         |  FROM orders),
         |h AS (
         |  SELECT cu.c_mktsegment, g.gap_days AS v, COUNT(*) AS cnt
         |  FROM g JOIN customer cu ON g.o_custkey = cu.c_custkey
         |  WHERE g.gap_days IS NOT NULL
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY c_mktsegment ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY c_mktsegment) AS n
         |  FROM h)
         |$picks""".stripMargin
    },

    // top-down revenue-value histogram walk; the prorate ceil is
    // exact HUGEINT division (the Spark side's decimal candidate is
    // corrected by the same integer comparisons)
    "q185_pareto_coverage" -> {
      val bp = Queries.ParetoTargetBp
      s"""WITH cr AS (
         |  SELECT o_custkey,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS m
         |      FROM cr WHERE v > 0 GROUP BY 1),
         |w AS (
         |  SELECT v, m,
         |         COALESCE(SUM(CAST(v AS HUGEINT) * CAST(m AS HUGEINT))
         |           OVER (ORDER BY v DESC
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS cb,
         |         SUM(CAST(v AS HUGEINT) * CAST(m AS HUGEINT)) OVER () AS tot,
         |         CAST(SUM(m) OVER () AS BIGINT) AS nc
         |  FROM h),
         |n AS (SELECT *, (tot * $bp + 9999) // 10000 - cb AS need FROM w),
         |k AS (
         |  SELECT *,
         |         CASE WHEN need <= 0 THEN 0
         |              WHEN CAST(m AS HUGEINT) * CAST(v AS HUGEINT) < need
         |                THEN CAST(m AS HUGEINT)
         |              ELSE (need + v - 1) // v END AS kk
         |  FROM n),
         |a AS (
         |  SELECT CAST(MAX(nc) AS BIGINT) AS n_customers,
         |         CAST(COALESCE(SUM(kk), 0) AS BIGINT) AS n_top,
         |         CAST(COALESCE(SUM(kk * CAST(v AS HUGEINT)), 0) AS BIGINT)
         |           AS covered_cents,
         |         CAST(COALESCE(MAX(tot), 0) AS BIGINT) AS total_cents
         |  FROM k)
         |SELECT COALESCE(n_customers, 0) AS n_customers, n_top,
         |       covered_cents, total_cents,
         |       CASE WHEN total_cents = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * covered_cents / total_cents)
         |              AS BIGINT) END AS top_share_bp
         |FROM a""".stripMargin
    },

    "q186_yoy_growth" ->
      s"""WITH m AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         |         CAST(month(o_orderdate) AS BIGINT) AS month,
         |         CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS month_cents
         |  FROM orders GROUP BY 1, 2),
         |l AS (
         |  SELECT *,
         |         lag(month_cents) OVER (PARTITION BY month ORDER BY year)
         |           AS prev,
         |         lag(year) OVER (PARTITION BY month ORDER BY year)
         |           AS prev_year
         |  FROM m)
         |SELECT year, month, n_orders, month_cents,
         |       CASE WHEN prev IS NULL OR prev_year != year - 1 THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * month_cents / prev) - 10000
         |              AS BIGINT) END AS growth_bp
         |FROM l ORDER BY year, month""".stripMargin,

    "q187_priority_mix" ->
      s"""WITH y AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         |         o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
         |  FROM orders GROUP BY 1, 2),
         |s AS (
         |  SELECT *,
         |         CAST(FLOOR(10000.0 * n_orders /
         |           SUM(n_orders) OVER (PARTITION BY year)) AS BIGINT)
         |           AS share_bp
         |  FROM y),
         |l AS (
         |  SELECT *,
         |         lag(share_bp) OVER (PARTITION BY o_orderpriority
         |           ORDER BY year) AS prev,
         |         lag(year) OVER (PARTITION BY o_orderpriority
         |           ORDER BY year) AS prev_year
         |  FROM s)
         |SELECT year, o_orderpriority, n_orders, share_bp,
         |       CASE WHEN prev IS NULL OR prev_year != year - 1 THEN NULL
         |            ELSE share_bp - prev END AS delta_bp
         |FROM l ORDER BY year, o_orderpriority""".stripMargin,

    "q188_nation_movers" ->
      s"""WITH yn AS (
         |  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         |         n.n_name,
         |         CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |           * 100.0) AS BIGINT)) AS BIGINT) AS nation_cents
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1, 2),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY o_year
         |    ORDER BY nation_cents DESC, n_name ASC) AS BIGINT) AS rank
         |  FROM yn),
         |l AS (
         |  SELECT *,
         |         lag(rank) OVER (PARTITION BY n_name ORDER BY o_year)
         |           AS prev_rank,
         |         lag(o_year) OVER (PARTITION BY n_name ORDER BY o_year)
         |           AS prev_year
         |  FROM r)
         |SELECT o_year, n_name, nation_cents, rank,
         |       CASE WHEN prev_rank IS NULL OR prev_year != o_year - 1
         |            THEN NULL ELSE prev_rank - rank END AS rank_delta
         |FROM l ORDER BY o_year, rank""".stripMargin,

    "q189_discount_bands" ->
      s"""WITH b AS (
         |  SELECT CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT)
         |           AS discount_pct,
         |         CAST(l_quantity AS BIGINT) AS qty,
         |         CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
         |           AS BIGINT) AS rev_cents
         |  FROM lineitem)
         |SELECT discount_pct, CAST(COUNT(*) AS BIGINT) AS n_items,
         |       CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents,
         |       CAST(SUM(qty) AS BIGINT) * 100 // CAST(COUNT(*) AS BIGINT)
         |         AS avg_qty_x100
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // TPC-H Q4 shape: correlated EXISTS with ship-vs-order lateness
    // (no commit/receipt dates in this schema).
    "q190_late_priority" ->
      s"""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM orders o
         |WHERE o.o_orderdate >= TIMESTAMP '${Queries.Q4From}'
         |  AND o.o_orderdate < TIMESTAMP '${Queries.Q4Until}'
         |  AND EXISTS (
         |    SELECT 1 FROM lineitem l
         |    WHERE l.l_orderkey = o.o_orderkey
         |      AND l.l_shipdate > o.o_orderdate
         |        + INTERVAL ${Queries.Q4GraceDays} DAY)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // TPC-H Q6 shape with the house bp convention.
    "q191_revenue_forecast" ->
      s"""SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000.0)
         |         AS BIGINT)) AS BIGINT) AS forecast_rev_bp,
         |       CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '${Queries.Q6From}'
         |  AND l_shipdate < TIMESTAMP '${Queries.Q6Until}'
         |  AND l_discount >= 0.02 AND l_discount <= 0.04
         |  AND l_quantity < 24.0""".stripMargin,

    // TPC-H Q7 shape: both trade directions as rows.
    "q192_nation_volume" ->
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
         |       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount)
         |         * 100.0) AS BIGINT)) AS BIGINT) AS volume_cents,
         |       CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
         |WHERE l.l_shipdate >= TIMESTAMP '${Queries.Q7From}'
         |  AND l.l_shipdate < TIMESTAMP '${Queries.Q7Until}'
         |  AND ((ns.n_name = '${Queries.Q7NationA}'
         |        AND nc.n_name = '${Queries.Q7NationB}')
         |    OR (ns.n_name = '${Queries.Q7NationB}'
         |        AND nc.n_name = '${Queries.Q7NationA}'))
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // TPC-H Q12 shape: returnflag plays the (absent) shipmode's role.
    "q193_priority_line_counts" ->
      s"""SELECT l.l_returnflag,
         |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
         |         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem l
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE l.l_shipdate >= TIMESTAMP '${Queries.Q6From}'
         |  AND l.l_shipdate < TIMESTAMP '${Queries.Q6Until}'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // TPC-H Q13 shape: zero-order customers kept by the left join.
    "q194_customer_order_dist" ->
      s"""WITH per_cust AS (
         |  SELECT c.c_custkey,
         |         CAST(COALESCE(o.n, 0) AS BIGINT) AS c_count
         |  FROM customer c
         |  LEFT JOIN (SELECT o_custkey, COUNT(*) AS n
         |             FROM orders GROUP BY 1) o
         |    ON c.c_custkey = o.o_custkey)
         |SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
         |FROM per_cust
         |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    // TPC-H Q21 shape, rewritten (both engines) as ONE order-grain
    // aggregate: >=2 distinct suppliers, exactly 1 late, charge it.
    "q195_waiting_suppliers" ->
      s"""WITH per_order AS (
         |  SELECT l.l_orderkey,
         |         COUNT(DISTINCT l.l_suppkey) AS n_supp,
         |         COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate
         |           + INTERVAL ${Queries.Q21GraceDays} DAY
         |           THEN l.l_suppkey END) AS n_late_supp,
         |         MIN(CASE WHEN l.l_shipdate > o.o_orderdate
         |           + INTERVAL ${Queries.Q21GraceDays} DAY
         |           THEN l.l_suppkey END) AS late_supp
         |  FROM lineitem l
         |  JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE o.o_orderstatus = 'F'
         |  GROUP BY 1)
         |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
         |FROM per_order p
         |JOIN supplier s ON p.late_supp = s.s_suppkey
         |WHERE p.n_supp >= 2 AND p.n_late_supp = 1
         |GROUP BY 1
         |ORDER BY numwait DESC, s.s_name
         |LIMIT ${Queries.Q21TopK}""".stripMargin,

    // Bounded BFS as the naive expand-then-min (fine at oracle scale;
    // the Spark side prunes the frontier — same min-hop semantics).
    "q196_bfs_reach" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val hops = (1 to Queries.BfsMaxHops).map { h =>
        val prev = if (h == 1) "seed" else s"n${h - 1}"
        s"""n$h AS (
           |  SELECT DISTINCT e.dst AS item
           |  FROM edg e JOIN $prev f ON e.src = f.item)""".stripMargin
      }.mkString(",\n")
      val union = (1 to Queries.BfsMaxHops)
        .map(h => s"SELECT item, $h AS hops FROM n$h")
        .mkString("\nUNION ALL\n")
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |seed AS (
         |  SELECT src AS item FROM deg ORDER BY deg DESC, src LIMIT 1),
         |$hops,
         |u AS (
         |  SELECT item, 0 AS hops FROM seed
         |  UNION ALL
         |  $union)
         |SELECT item, CAST(MIN(hops) AS BIGINT) AS hops
         |FROM u GROUP BY 1 ORDER BY hops, item""".stripMargin
    },

    "q197_seasonal_deviation" ->
      s"""WITH m AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         |         CAST(month(o_orderdate) AS BIGINT) AS month,
         |         CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS month_cents
         |  FROM orders GROUP BY 1, 2)
         |SELECT year, month, n_orders, month_cents,
         |       CAST(FLOOR(10000.0 * month_cents *
         |           COUNT(*) OVER (PARTITION BY month) /
         |           SUM(month_cents) OVER (PARTITION BY month))
         |         AS BIGINT) AS moy_index_bp
         |FROM m ORDER BY year, month""".stripMargin,

    "q198_source_datacard" ->
      s"""WITH s AS (
         |  SELECT source,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(COUNT(text) AS BIGINT) AS n_text,
         |         CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
         |         CAST(COALESCE(SUM(CASE WHEN text IS NOT NULL
         |           THEN len(string_split(text, ' ')) ELSE 0 END), 0)
         |           AS BIGINT) AS tot_tokens,
         |         CAST(COALESCE(SUM(COALESCE(n_chars, 0)), 0) AS BIGINT)
         |           AS tot_chars,
         |         CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs, n_text,
         |       CAST(FLOOR(10000.0 * (n_docs - n_text) / n_docs) AS BIGINT)
         |         AS null_bp,
         |       n_distinct_texts,
         |       CASE WHEN n_text = 0 THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (n_text - n_distinct_texts)
         |              / n_text) AS BIGINT) END AS dup_bp,
         |       tot_tokens,
         |       CASE WHEN n_text = 0 THEN NULL
         |            ELSE tot_tokens // n_text END AS avg_tokens,
         |       tot_chars, n_langs
         |FROM s ORDER BY source""".stripMargin,

    // Morton twin: the same 5-step magic-number bit dilation as
    // expressions.MortonCode, unrolled as stepwise CTE columns (all
    // masks < 2^63, all values non-negative, so BIGINT & | << match
    // the JVM bit-for-bit).
    "q200_zorder_cells" ->
      s"""WITH $zorderCellCtes
         |SELECT c.cell, c.n_rows, c.min_a, c.max_a, c.min_b, c.max_b,
         |       CAST(FLOOR(10000.0 * (c.max_a - c.min_a) /
         |         GREATEST(bo.hi_a - bo.lo_a, 1)) AS BIGINT) AS span_a_bp,
         |       CAST(FLOOR(10000.0 * (c.max_b - c.min_b) /
         |         GREATEST(bo.hi_b - bo.lo_b, 1)) AS BIGINT) AS span_b_bp
         |FROM c, bounds bo ORDER BY c.cell""".stripMargin,

    // the q42 recursive-CC pattern transplanted to the co-vis graph
    // (edg is already symmetric, so one reach direction suffices)
    "q201_covis_components" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val cte = sessionCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      s"""$cte,
         |${coVisEdgesCte(cap, ms)},
         |nodes AS (SELECT DISTINCT src AS item FROM edg),
         |reach(node, lbl) AS (
         |  SELECT item, item FROM nodes
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edg e ON e.src = r.node),
         |comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY 1)
         |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM comp GROUP BY 1
         |ORDER BY n_items DESC, component""".stripMargin
    },

    // user-lifetime capped baskets (see Market.tripleItemsets for why
    // not session grain), closed by an a<b<c self-join (the comb the
    // Spark side does as a map stage)
    "q202_triple_itemsets" -> {
      val cap = Queries.TripleMaxItems
      val ms = Queries.TripleMinSupport
      s"""WITH it0 AS (
         |  SELECT user_id,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2),
         |capped AS (
         |  SELECT user_id, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |t AS (
         |  SELECT a.item AS item_a, b.item AS item_b, c.item AS item_c,
         |         CAST(COUNT(*) AS BIGINT) AS n_users_3set
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
         |  JOIN capped c ON b.user_id = c.user_id AND b.item < c.item
         |  GROUP BY 1, 2, 3)
         |SELECT * FROM t WHERE n_users_3set >= $ms
         |ORDER BY n_users_3set DESC, item_a, item_b, item_c
         |LIMIT ${Queries.TripleTopK}""".stripMargin
    },

    "q203_equidepth_bins" -> {
      val nb = Queries.EquiDepthBins
      s"""WITH h AS (
         |  SELECT CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents,
         |         COUNT(*) AS cnt
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         |c AS (
         |  SELECT cents, cnt, SUM(cnt) OVER (ORDER BY cents) AS cum,
         |         SUM(cnt) OVER () AS n
         |  FROM h),
         |b AS (SELECT (cum - 1) * $nb // n + 1 AS bin, cnt, cents FROM c)
         |SELECT CAST(bin AS BIGINT) AS bin, CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |       MIN(cents) AS lo, MAX(cents) AS hi
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // HUGEINT twin of the decimal(38,0) Neyman arithmetic; the isqrt
    // seed+correct and largest-remainder steps mirror
    // StratifiedExtract.neymanAllocation line for line
    "q204_neyman_allocation" -> {
      val b = Queries.NeymanBudget
      s"""WITH st AS (
         |  SELECT o_orderpriority AS stratum,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         SUM(CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)
         |           AS HUGEINT)) AS s,
         |         SUM(CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)
         |           * CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS HUGEINT))
         |           AS q
         |  FROM orders
         |  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
         |  GROUP BY 1),
         |v AS (SELECT stratum, n_rows,
         |             CAST(n_rows AS HUGEINT) * q - s * s AS varnum FROM st),
         |y AS (SELECT *,
         |        CAST(FLOOR(SQRT(CAST(varnum AS DOUBLE))) AS BIGINT) AS y0
         |      FROM v),
         |yu AS (SELECT *, CASE
         |         WHEN CAST(y0 + 2 AS HUGEINT) * (y0 + 2) <= varnum THEN y0 + 2
         |         WHEN CAST(y0 + 1 AS HUGEINT) * (y0 + 1) <= varnum THEN y0 + 1
         |         ELSE y0 END AS yy FROM y),
         |w AS (SELECT stratum, n_rows, CASE
         |         WHEN CAST(yy AS HUGEINT) * yy <= varnum THEN yy
         |         WHEN CAST(yy - 1 AS HUGEINT) * (yy - 1) <= varnum THEN yy - 1
         |         ELSE yy - 2 END AS w FROM yu),
         |t AS (SELECT *, SUM(CAST(w AS HUGEINT)) OVER () AS tot_w,
         |             COUNT(*) OVER () AS n_strata FROM w),
         |u AS (SELECT stratum, n_rows, w,
         |             CASE WHEN tot_w = 0 THEN 1 ELSE w END AS w2,
         |             CASE WHEN tot_w = 0 THEN CAST(n_strata AS HUGEINT)
         |                  ELSE tot_w END AS tw2
         |      FROM t),
         |a AS (SELECT *,
         |             CAST($b AS HUGEINT) * w2 // tw2 AS base,
         |             CAST($b AS HUGEINT) * w2
         |               - (CAST($b AS HUGEINT) * w2 // tw2) * tw2 AS rem
         |      FROM u),
         |r AS (SELECT *, $b - SUM(base) OVER () AS leftover,
         |             ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk
         |      FROM a)
         |SELECT stratum, n_rows, CAST(w AS BIGINT) AS ney_weight,
         |       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |         AS BIGINT) AS alloc
         |FROM r ORDER BY stratum""".stripMargin
    },

    "q205_churn_features" -> {
      val d = Queries.ChurnSplitDate
      val h = Queries.ChurnHorizonDays
      s"""WITH f AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
         |         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_purchases,
         |         CAST(SUM(CASE WHEN event_type = 'purchase'
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) ELSE 0 END)
         |           AS BIGINT) AS value_cents,
         |         CAST(date_diff('day', MAX(CAST(ts AS DATE)), DATE '$d')
         |           AS BIGINT) AS recency_days
         |  FROM events
         |  WHERE ts IS NOT NULL AND ts < TIMESTAMP '$d'
         |  GROUP BY 1),
         |l AS (
         |  SELECT DISTINCT user_id FROM events
         |  WHERE ts >= TIMESTAMP '$d'
         |    AND ts < TIMESTAMP '$d' + INTERVAL $h DAY)
         |SELECT f.user_id, f.n_events, f.n_days, f.n_purchases,
         |       f.value_cents, f.recency_days,
         |       CAST(CASE WHEN l.user_id IS NULL THEN 0 ELSE 1 END
         |         AS BIGINT) AS label
         |FROM f LEFT JOIN l ON f.user_id = l.user_id
         |ORDER BY f.user_id""".stripMargin
    },

    "q207_theilsen_trend" -> {
      val ld = Queries.TheilSenLastDays
      s"""WITH daily0 AS (
         |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |           AS x,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS y
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |mx AS (SELECT MAX(x) AS mx FROM daily0),
         |daily AS (
         |  SELECT d.x, d.y FROM daily0 d, mx
         |  WHERE d.x >= mx.mx - ${ld - 1}),
         |sl AS (
         |  SELECT CAST(FLOOR(10000.0 * (b.y - a.y) / (b.x - a.x)) AS BIGINT) AS s
         |  FROM daily a JOIN daily b ON b.x > a.x),
         |c AS (SELECT s, COUNT(*) AS cnt FROM sl GROUP BY 1),
         |cc AS (SELECT s, SUM(cnt) OVER (ORDER BY s) AS cum,
         |              SUM(cnt) OVER () AS n FROM c),
         |m AS (
         |  SELECT CAST(MIN(n) AS BIGINT) AS n_pairs,
         |         CAST(FLOOR((MIN(CASE WHEN cum >= (n + 1) // 2 THEN s END)
         |           + MIN(CASE WHEN cum >= (n + 2) // 2 THEN s END)) / 2.0)
         |           AS BIGINT) AS slope_bp_per_day
         |  FROM cc),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
         |SELECT nd.n_days, m.n_pairs, m.slope_bp_per_day FROM m, nd""".stripMargin
    },

    // median/MAD twin of q88: trailing windows materialized by the
    // bounded day-grain explode; medians are sorted-list picks
    "q208_robust_anomaly" -> {
      val wd = Queries.AnomalyWindowDays
      val k = Queries.RobustAnomalyK
      val mo = Queries.AnomalyMinObs
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS d,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |tr AS (
         |  SELECT d0.event_type,
         |         d0.d + CAST(g.i AS INTEGER) AS d, d0.cnt
         |  FROM daily d0, unnest(range(1, $wd + 1)) AS g(i)),
         |t0 AS (SELECT event_type, d, list_sort(list(cnt)) AS arr
         |       FROM tr GROUP BY 1, 2),
         |t1 AS (SELECT event_type, d, arr, CAST(len(arr) AS BIGINT) AS trail_n,
         |              CAST(FLOOR((arr[(len(arr) + 1) // 2]
         |                + arr[(len(arr) + 2) // 2]) / 2.0) AS BIGINT) AS med
         |       FROM t0),
         |t2 AS (SELECT event_type, d, trail_n, med,
         |              list_sort(list_transform(arr, x -> abs(x - med))) AS dev
         |       FROM t1),
         |t3 AS (SELECT event_type, d, trail_n, med,
         |              CAST(FLOOR((dev[(trail_n + 1) // 2]
         |                + dev[(trail_n + 2) // 2]) / 2.0) AS BIGINT) AS mad
         |       FROM t2)
         |SELECT dd.event_type, strftime(dd.d, '%Y-%m-%d') AS day, dd.cnt,
         |       CAST(COALESCE(t3.trail_n, 0) AS BIGINT) AS trail_n,
         |       t3.med, t3.mad,
         |       CAST(CASE WHEN COALESCE(t3.trail_n, 0) >= $mo
         |                  AND ABS(dd.cnt - t3.med) > $k * t3.mad
         |            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM daily dd
         |LEFT JOIN t3 ON dd.event_type = t3.event_type AND dd.d = t3.d
         |ORDER BY dd.event_type, day""".stripMargin
    },

    // the q184 quantile-pick pattern at (priority, latency-days) grain
    "q209_fulfillment_latency" -> {
      val picks = Queries.QuantileRanks.map { p =>
        s"""SELECT o_orderpriority, CAST($p AS BIGINT) AS rank_bp,
           |       CAST(FLOOR(MIN(CASE WHEN cum >= ((n * $p + 9999) // 10000)
           |         THEN v END) * 100) AS BIGINT) AS value_cents,
           |       CAST(MIN(n) AS BIGINT) AS n_rows
           |FROM c GROUP BY 1""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (
         |  SELECT o.o_orderpriority,
         |         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
         |           CAST(l.l_shipdate AS DATE)) AS BIGINT) AS v,
         |         COUNT(*) AS cnt
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM h)
         |$picks""".stripMargin
    },

    "q210_growth_accounting" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |f AS (SELECT user_id, MIN(d) AS f FROM ud GROUP BY 1),
         |p AS (
         |  SELECT ud.d, CAST(COUNT(*) AS BIGINT) AS n_active,
         |         CAST(SUM(CASE WHEN ud.d = f.f THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_new,
         |         CAST(SUM(CASE WHEN ud.d <> f.f THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_returning
         |  FROM ud JOIN f ON ud.user_id = f.user_id
         |  GROUP BY 1)
         |SELECT strftime(d, '%Y-%m-%d') AS day, n_active, n_new, n_returning,
         |       CAST(SUM(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_users
         |FROM p ORDER BY day""".stripMargin,

    // rational-mean autocorrelation: centered series scaled by n so
    // every sum is integer (HUGEINT), one IEEE division at the end
    "q211_revenue_acf" -> {
      val ml = Queries.AcfMaxLag
      s"""WITH daily AS (
         |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
         |           AS x,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS y
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n, SUM(CAST(y AS HUGEINT)) AS s FROM daily),
         |ce AS (
         |  SELECT d.x, CAST(st.n AS HUGEINT) * d.y - st.s AS c
         |  FROM daily d, st),
         |vn AS (SELECT SUM(c * c) AS varnum FROM ce),
         |lg AS (
         |  SELECT ce.x + g.i AS x, CAST(g.i AS BIGINT) AS lag, ce.c AS c_lag
         |  FROM ce, unnest(range(1, $ml + 1)) AS g(i)),
         |cv AS (
         |  SELECT lg.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         SUM(ce.c * lg.c_lag) AS covnum
         |  FROM ce JOIN lg ON ce.x = lg.x
         |  GROUP BY 1)
         |SELECT cv.lag, cv.n_pairs,
         |       CASE WHEN vn.varnum = 0 THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * CAST(cv.covnum AS DOUBLE)
         |              / CAST(vn.varnum AS DOUBLE)) AS BIGINT) END AS acf_bp
         |FROM cv, vn ORDER BY cv.lag""".stripMargin
    },

    // the max(0, S+dev) recursion as its closed form: raw cumsum minus
    // the running prefix min (incl. the empty prefix's 0) — exact
    // HUGEINT twin of the decimal(38,0) Spark columns
    "q212_cusum_revenue" -> {
      val sl = Queries.CusumSlackBp
      val h = Queries.CusumHMeanDays
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS y
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n, SUM(CAST(y AS HUGEINT)) AS s FROM daily),
         |dv AS (
         |  SELECT d.d, d.y, st.s,
         |         CAST(10000 AS HUGEINT) * st.n * d.y
         |           - CAST(${10000L + sl} AS HUGEINT) * st.s AS devp,
         |         CAST(${10000L - sl} AS HUGEINT) * st.s
         |           - CAST(10000 AS HUGEINT) * st.n * d.y AS devn
         |  FROM daily d, st),
         |cw AS (
         |  SELECT *,
         |         SUM(devp) OVER (ORDER BY d
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         |         SUM(devn) OVER (ORDER BY d
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
         |  FROM dv),
         |cs AS (
         |  SELECT *,
         |         cp - LEAST(CAST(0 AS HUGEINT), MIN(cp) OVER (ORDER BY d
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |           AS cusum_p,
         |         cn - LEAST(CAST(0 AS HUGEINT), MIN(cn) OVER (ORDER BY d
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |           AS cusum_n
         |  FROM cw)
         |SELECT strftime(d, '%Y-%m-%d') AS day, y AS cents,
         |       CAST(FLOOR(CAST(cusum_p AS DOUBLE) / CAST(s AS DOUBLE))
         |         AS BIGINT) AS pos_bp,
         |       CAST(FLOOR(CAST(cusum_n AS DOUBLE) / CAST(s AS DOUBLE))
         |         AS BIGINT) AS neg_bp,
         |       CAST(CASE WHEN cusum_p > CAST(${10000L * h} AS HUGEINT) * s
         |         THEN 1 ELSE 0 END AS BIGINT) AS pos_alarm,
         |       CAST(CASE WHEN cusum_n > CAST(${10000L * h} AS HUGEINT) * s
         |         THEN 1 ELSE 0 END AS BIGINT) AS neg_alarm
         |FROM cs ORDER BY day""".stripMargin
    },

    "q213_benford_audit" -> {
      val dims = graft.ops.Profile.BenfordBp.zipWithIndex
        .map { case (bp, i) => s"(${i + 1}, $bp)" }.mkString(", ")
      s"""WITH v AS (
         |  SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders WHERE o_totalprice IS NOT NULL),
         |obs AS (
         |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM v WHERE cents > 0 GROUP BY 1),
         |dim AS (SELECT CAST(digit AS BIGINT) AS digit,
         |               CAST(benford_bp AS BIGINT) AS benford_bp
         |        FROM (VALUES $dims) AS t(digit, benford_bp)),
         |j AS (
         |  SELECT d.digit, CAST(COALESCE(o.n, 0) AS BIGINT) AS n, d.benford_bp,
         |         SUM(COALESCE(o.n, 0)) OVER () AS total
         |  FROM dim d LEFT JOIN obs o ON d.digit = o.digit)
         |SELECT digit, n,
         |       CAST(CASE WHEN total = 0 THEN 0
         |            ELSE FLOOR(10000.0 * n / total) END AS BIGINT) AS share_bp,
         |       benford_bp,
         |       CAST(CASE WHEN total = 0 THEN 0
         |            ELSE FLOOR(10000.0 * n / total) END AS BIGINT) - benford_bp
         |         AS delta_bp
         |FROM j ORDER BY digit""".stripMargin
    },

    "q214_k_anonymity" -> {
      val k = Queries.AnonK
      s"""WITH qi AS (
         |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS balance_band
         |  FROM customer),
         |g AS (
         |  SELECT nation, segment, balance_band,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         SUM(COUNT(*)) OVER () AS total
         |  FROM qi GROUP BY 1, 2, 3)
         |SELECT n AS size, CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(n) AS BIGINT) AS n_rows,
         |       CAST(FLOOR(10000.0 * SUM(n) / MIN(total)) AS BIGINT)
         |         AS risk_bp
         |FROM g WHERE n < $k GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q215_l_diversity" -> {
      val l = Queries.DiversityL
      s"""WITH qi AS (
         |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS balance_band
         |  FROM customer),
         |gs AS (
         |  SELECT nation, balance_band, segment,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM qi GROUP BY 1, 2, 3),
         |g AS (
         |  SELECT nation, balance_band,
         |         CAST(COUNT(*) AS BIGINT) AS diversity,
         |         CAST(SUM(n) AS BIGINT) AS n,
         |         SUM(SUM(n)) OVER () AS total
         |  FROM gs GROUP BY 1, 2)
         |SELECT diversity, CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(n) AS BIGINT) AS n_rows,
         |       CAST(FLOOR(10000.0 * SUM(n) / MIN(total)) AS BIGINT)
         |         AS risk_bp
         |FROM g WHERE diversity < $l GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q216_seasonal_backtest" ->
      s"""WITH m AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |         CAST(month(o_orderdate) AS BIGINT) AS mo,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
         |l AS (
         |  SELECT *,
         |         lag(cents) OVER (PARTITION BY mo ORDER BY yr) AS pred,
         |         lag(yr) OVER (PARTITION BY mo ORDER BY yr) AS pred_yr
         |  FROM m)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
         |       CAST(SUM(ABS(cents - pred)) // COUNT(*) AS BIGINT) AS mae_cents,
         |       CAST(FLOOR(10000.0 * SUM(ABS(cents - pred)) / SUM(cents))
         |         AS BIGINT) AS wmape_bp
         |FROM l WHERE pred IS NOT NULL AND pred_yr = yr - 1""".stripMargin,

    "q217_discount_elasticity" ->
      s"""WITH v AS (
         |  SELECT CAST(FLOOR(l_discount * 100.0) AS BIGINT) AS x,
         |         CAST(FLOOR(l_quantity) AS BIGINT) AS y
         |  FROM lineitem
         |  WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL),
         |s AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |         SUM(CAST(x * y AS HUGEINT)) AS sxy,
         |         SUM(CAST(x * x AS HUGEINT)) AS sxx
         |  FROM v)
         |SELECT n_rows,
         |       CASE WHEN CAST(n_rows AS HUGEINT) * sxx - sx * sx = 0 THEN NULL
         |            ELSE CAST(FLOOR(100.0 *
         |              CAST(CAST(n_rows AS HUGEINT) * sxy - sx * sy AS DOUBLE) /
         |              CAST(CAST(n_rows AS HUGEINT) * sxx - sx * sx AS DOUBLE))
         |              AS BIGINT) END AS slope_x100,
         |       CASE WHEN CAST(n_rows AS HUGEINT) * sxx - sx * sx = 0 THEN NULL
         |            ELSE CAST(FLOOR(100.0 *
         |              CAST(sy * sxx - sx * sxy AS DOUBLE) /
         |              CAST(CAST(n_rows AS HUGEINT) * sxx - sx * sx AS DOUBLE))
         |              AS BIGINT) END AS intercept_x100
         |FROM s""".stripMargin,

    "q218_dow_type_lift" ->
      s"""WITH c AS (
         |  SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |w AS (
         |  SELECT *,
         |         SUM(n) OVER (PARTITION BY event_type) AS r,
         |         SUM(n) OVER (PARTITION BY dow) AS cc,
         |         SUM(n) OVER () AS t
         |  FROM c)
         |SELECT event_type, dow, n,
         |       CAST(FLOOR(10000.0 *
         |         CAST(CAST(n AS HUGEINT) * t AS DOUBLE) /
         |         CAST(CAST(r AS HUGEINT) * cc AS DOUBLE)) AS BIGINT)
         |         AS lift_bp
         |FROM w ORDER BY event_type, dow""".stripMargin,

    "q219_kendall_daily" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS c
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |p AS (
         |  SELECT CAST(SIGN(b.n - a.n) * SIGN(b.c - a.c) AS BIGINT) AS s
         |  FROM daily a JOIN daily b ON b.d > a.d),
         |agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_concordant,
         |         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_discordant,
         |         CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_ties
         |  FROM p),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily)
         |SELECT nd.n_days, agg.n_pairs, agg.n_concordant, agg.n_discordant,
         |       agg.n_ties,
         |       CASE WHEN agg.n_pairs = 0 THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |              (agg.n_concordant - agg.n_discordant) / agg.n_pairs)
         |              AS BIGINT) END AS tau_bp
         |FROM agg, nd""".stripMargin,

    "q220_lifecycle_census" -> {
      val a = Queries.LifecycleAnchor
      val nd = Queries.LifecycleNewDays
      val ad = Queries.LifecycleActiveDays
      val cd = Queries.LifecycleChurnDays
      s"""WITH u AS (
         |  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d,
         |         MAX(CAST(ts AS DATE)) AS last_d
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |s AS (
         |  SELECT CASE
         |           WHEN date_diff('day', first_d, DATE '$a') <= $nd THEN 'new'
         |           WHEN date_diff('day', last_d, DATE '$a') > $cd THEN 'churned'
         |           WHEN date_diff('day', last_d, DATE '$a') > $ad THEN 'at_risk'
         |           ELSE 'active' END AS stage
         |  FROM u)
         |SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users,
         |       CAST(FLOOR(10000.0 * COUNT(*) / SUM(COUNT(*)) OVER ())
         |         AS BIGINT) AS share_bp
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // positions self-join twin of the two ±window collect frames
    "q221_skipgram_pairs" -> {
      val w = Queries.SkipGramWindow
      val mc = Queries.SkipGramMinCount
      s"""WITH iev AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
         |s0 AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS prev_us
         |  FROM iev),
         |s1 AS (
         |  SELECT user_id, event_id, ts_us, item,
         |         CAST(SUM(CASE WHEN prev_us IS NULL
         |                        OR ts_us - prev_us > 1800000000
         |                   THEN 1 ELSE 0 END) OVER (
         |           PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM s0),
         |pos AS (
         |  SELECT user_id, session_seq, item,
         |         ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS pos
         |  FROM s1)
         |SELECT a.item AS center, b.item AS context,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM pos a JOIN pos b
         |  ON a.user_id = b.user_id AND a.session_seq = b.session_seq
         |  AND a.pos <> b.pos AND ABS(a.pos - b.pos) <= $w
         |GROUP BY 1, 2 HAVING COUNT(*) >= $mc
         |ORDER BY n_pairs DESC, center, context
         |LIMIT ${Queries.SkipGramTopK}""".stripMargin
    },

    "q222_replenishment_cycle" -> {
      val mi = Queries.ReplenishMinIntervals
      s"""WITH pd AS (
         |  SELECT DISTINCT user_id,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |         CAST(ts AS DATE) AS d
         |  FROM events
         |  WHERE event_type = 'purchase' AND ts IS NOT NULL
         |    AND json_extract_string(props, '$$.k') IS NOT NULL),
         |g AS (
         |  SELECT item,
         |         CAST(date_diff('day',
         |           lag(d) OVER (PARTITION BY user_id, item ORDER BY d),
         |           d) AS BIGINT) AS gap
         |  FROM pd),
         |h AS (
         |  SELECT item, gap AS v, COUNT(*) AS cnt FROM g
         |  WHERE gap IS NOT NULL GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(cnt) OVER (PARTITION BY item ORDER BY v) AS cum,
         |         SUM(cnt) OVER (PARTITION BY item) AS n
         |  FROM h),
         |m AS (
         |  SELECT item, CAST(MIN(n) AS BIGINT) AS n_intervals,
         |         CAST(FLOOR((MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
         |           + MIN(CASE WHEN cum >= (n + 2) // 2 THEN v END))
         |           / 2.0 * 100) AS BIGINT) // 100 AS median_gap_days
         |  FROM c GROUP BY 1)
         |SELECT item, n_intervals, CAST(median_gap_days AS BIGINT)
         |         AS median_gap_days
         |FROM m WHERE n_intervals >= $mi ORDER BY item""".stripMargin
    },

    "q223_recsys_coverage" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |covered AS (SELECT DISTINCT src AS item FROM edg),
         |ev AS (
         |  SELECT CAST(json_extract_string(e.props, '$$.k') AS BIGINT) AS item
         |  FROM events e
         |  WHERE json_extract_string(e.props, '$$.k') IS NOT NULL),
         |j AS (
         |  SELECT ev.item, c.item AS cov
         |  FROM ev LEFT JOIN covered c ON ev.item = c.item)
         |SELECT CAST(COUNT(DISTINCT item) AS BIGINT) AS n_items_observed,
         |       CAST(COUNT(DISTINCT cov) AS BIGINT) AS n_items_covered,
         |       CAST(FLOOR(10000.0 * COUNT(DISTINCT cov)
         |         / COUNT(DISTINCT item)) AS BIGINT) AS item_coverage_bp,
         |       CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(CASE WHEN cov IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_events_covered,
         |       CAST(FLOOR(10000.0 * SUM(CASE WHEN cov IS NOT NULL
         |           THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT)
         |         AS event_coverage_bp
         |FROM j""".stripMargin
    },

    "q224_growth_decomposition" ->
      s"""WITH y AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         |         CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |l AS (
         |  SELECT *, lag(n_orders) OVER (ORDER BY year) AS pn,
         |         lag(cents) OVER (ORDER BY year) AS pc,
         |         lag(year) OVER (ORDER BY year) AS py
         |  FROM y)
         |SELECT year, n_orders, cents, cents // n_orders AS aov_cents,
         |       CASE WHEN py = year - 1
         |            THEN CAST(FLOOR(10000.0 * cents / pc) AS BIGINT) - 10000
         |            ELSE NULL END AS rev_growth_bp,
         |       CASE WHEN py = year - 1
         |            THEN CAST(FLOOR(10000.0 * n_orders / pn) AS BIGINT) - 10000
         |            ELSE NULL END AS vol_growth_bp,
         |       CASE WHEN py = year - 1
         |            THEN CAST(FLOOR(10000.0 *
         |              CAST(CAST(cents AS HUGEINT) * pn AS DOUBLE) /
         |              CAST(CAST(pc AS HUGEINT) * n_orders AS DOUBLE))
         |              AS BIGINT) - 10000
         |            ELSE NULL END AS aov_growth_bp
         |FROM l ORDER BY year""".stripMargin,

    "q225_order_composition" ->
      s"""WITH o AS (
         |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
         |           * 100.0) AS BIGINT)) AS BIGINT) AS cents
         |  FROM lineitem GROUP BY 1),
         |h AS (
         |  SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |         CAST(SUM(cents) AS BIGINT) AS revenue_cents
         |  FROM o GROUP BY 1)
         |SELECT n_lines, n_orders,
         |       CAST(FLOOR(10000.0 * n_orders / SUM(n_orders) OVER ())
         |         AS BIGINT) AS order_share_bp,
         |       revenue_cents,
         |       CAST(FLOOR(10000.0 * revenue_cents /
         |         SUM(revenue_cents) OVER ()) AS BIGINT) AS revenue_share_bp
         |FROM h ORDER BY n_lines""".stripMargin,

    // the q93 unrolled recursion with per-EDGE weighted shares,
    // mirroring Graph.pageRankWeighted's two-step floor term for term
    "q226_pagerank_weighted" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val damp = graft.ops.Graph.DampBp
      val scale = graft.ops.Graph.Scale
      def round(r: Int): String =
        s"""s$r AS (
           |  SELECT r.item AS src, wo.wout, $damp * r.rank // 10000 AS t
           |  FROM r${r - 1} r JOIN wout wo ON wo.src = r.item),
           |c$r AS (
           |  SELECT e.dst AS item, CAST(SUM(s.t * e.w // s.wout) AS BIGINT)
           |           AS in_mass
           |  FROM edgw e JOIN s$r s ON e.src = s.src GROUP BY 1),
           |dg$r AS (
           |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dsum
           |  FROM r${r - 1} r LEFT JOIN wout w ON w.src = r.item
           |  WHERE w.src IS NULL),
           |r$r AS (
           |  SELECT r.item, r.n,
           |         CAST((10000 - $damp) * ($scale // r.n) // 10000
           |           + $damp * dg.dsum // (10000 * r.n)
           |           + COALESCE(c.in_mass, 0) AS BIGINT) AS rank
           |  FROM r${r - 1} r
           |  LEFT JOIN c$r c ON c.item = r.item, dg$r dg)""".stripMargin
      val rounds = (1 to Queries.PageRankIters).map(round).mkString(",\n")
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |edgw AS (
         |  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
         |    SELECT item_a AS src, item_b AS dst, w FROM pairs WHERE w >= $ms
         |    UNION ALL
         |    SELECT item_b, item_a, w FROM pairs WHERE w >= $ms)
         |  GROUP BY 1, 2),
         |wout AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
         |         FROM edgw GROUP BY 1),
         |nodes AS (SELECT src AS item FROM edgw
         |          UNION SELECT dst FROM edgw),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
         |r0 AS (SELECT item, n, $scale // n AS rank FROM nodes, tot),
         |$rounds
         |SELECT item, rank FROM r${Queries.PageRankIters}
         |ORDER BY rank DESC, item LIMIT ${Queries.PageRankK}""".stripMargin
    },

    // personalized restart: teleport + dangling mass land on the
    // deg-max seed; all mass starts there (Graph.personalizedPageRank)
    "q227_personalized_pagerank" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val damp = graft.ops.Graph.DampBp
      val scale = graft.ops.Graph.Scale
      def round(r: Int): String =
        s"""s$r AS (
           |  SELECT r.item AS src, $damp * r.rank // (10000 * d.deg) AS share
           |  FROM r${r - 1} r JOIN deg d ON d.src = r.item),
           |c$r AS (
           |  SELECT e.dst AS item, CAST(SUM(s.share) AS BIGINT) AS in_mass
           |  FROM edg e JOIN s$r s ON e.src = s.src GROUP BY 1),
           |dg$r AS (
           |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dsum
           |  FROM r${r - 1} r LEFT JOIN deg d ON d.src = r.item
           |  WHERE d.src IS NULL),
           |r$r AS (
           |  SELECT r.item, r.is_seed,
           |         CAST(r.is_seed * (((10000 - $damp) * $scale
           |             + $damp * dg.dsum) // 10000)
           |           + COALESCE(c.in_mass, 0) AS BIGINT) AS rank
           |  FROM r${r - 1} r
           |  LEFT JOIN c$r c ON c.item = r.item, dg$r dg)""".stripMargin
      val rounds = (1 to Queries.PageRankIters).map(round).mkString(",\n")
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |seed AS (
         |  SELECT src AS item FROM deg ORDER BY deg DESC, src LIMIT 1),
         |nodes AS (SELECT src AS item FROM edg UNION SELECT dst FROM edg),
         |r0 AS (
         |  SELECT n.item,
         |         CAST(CASE WHEN s.item IS NOT NULL THEN 1 ELSE 0 END
         |           AS BIGINT) AS is_seed,
         |         CAST(CASE WHEN s.item IS NOT NULL THEN $scale ELSE 0 END
         |           AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN seed s ON n.item = s.item),
         |$rounds
         |SELECT item, rank FROM r${Queries.PageRankIters}
         |ORDER BY rank DESC, item LIMIT ${Queries.PageRankK}""".stripMargin
    },

    // symmetric enumeration makes the two endpoint marginals equal, so
    // assortativity is a RATIONAL of exact HUGEINT sums (no sqrt)
    "q228_degree_assortativity" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |xy AS (
         |  SELECT du.deg AS x, dv.deg AS y
         |  FROM edg e
         |  JOIN deg du ON du.src = e.src
         |  JOIN deg dv ON dv.src = e.dst),
         |s AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         |         SUM(CAST(x AS HUGEINT)) AS sx,
         |         SUM(CAST(x * y AS HUGEINT)) AS sxy,
         |         SUM(CAST(x * x AS HUGEINT)) AS sxx
         |  FROM xy),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |              CAST(COALESCE(MAX(deg), 0) AS BIGINT) AS max_deg
         |       FROM deg)
         |SELECT ns.n_nodes, CAST(s.m // 2 AS BIGINT) AS n_edges, ns.max_deg,
         |       CASE WHEN CAST(s.m AS HUGEINT) * s.sxx - s.sx * s.sx = 0
         |            THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |              CAST(CAST(s.m AS HUGEINT) * s.sxy - s.sx * s.sx
         |                AS DOUBLE) /
         |              CAST(CAST(s.m AS HUGEINT) * s.sxx - s.sx * s.sx
         |                AS DOUBLE)) AS BIGINT) END AS assortativity_bp
         |FROM s, ns""".stripMargin
    },

    // the q66 BM25 machinery with a DERIVED query set (every 10th
    // doc's first 3 distinct tokens; relevant = the doc itself)
    "q229_bm25_known_item" ->
      s"""WITH $knownItemCtes,
         |nq AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
         |       FROM q),
         |ha AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_found,
         |         CAST(COALESCE(SUM(10000 // rank), 0) AS BIGINT) AS rr_sum
         |  FROM hits)
         |SELECT nq.n_queries, ha.n_found,
         |       CAST(CASE WHEN nq.n_queries = 0 THEN 0
         |            ELSE FLOOR(10000.0 * ha.n_found / nq.n_queries)
         |            END AS BIGINT) AS found_bp,
         |       CAST(CASE WHEN nq.n_queries = 0 THEN 0
         |            ELSE ha.rr_sum // nq.n_queries END AS BIGINT) AS mrr_bp
         |FROM ha, nq""".stripMargin,

    // same CTE chain as q229; the discounts are the SAME fixed-point
    // literals the Spark plan embeds (generated once in
    // Retrieval.ndcgGainsPpm - no engine libm on either side)
    "q266_bm25_ndcg" -> {
      val gains = graft.ops.Retrieval.ndcgGainsPpm(Queries.KnownItemK)
      val arr = s"[${gains.mkString(", ")}]"
      s"""WITH $knownItemCtes,
         |nq AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
         |       FROM q),
         |ga AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_found,
         |         CAST(COALESCE(SUM(($arr)[CAST(rank AS INT)]), 0) AS BIGINT)
         |           AS gain_sum
         |  FROM hits)
         |SELECT nq.n_queries, ga.n_found,
         |       CAST(CASE WHEN nq.n_queries = 0 THEN 0
         |            ELSE ga.gain_sum // nq.n_queries END AS BIGINT)
         |         AS ndcg_ppm
         |FROM ga, nq""".stripMargin
    },

    // time-split top-1 next-event eval: boundary binds to the
    // PREDICTED event; cold-start prev types score 0 with NULL model
    "q267_markov_eval" -> {
      val d = Queries.MarkovSplitDate
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type, ts,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |tr AS (
         |  SELECT prev_type, event_type AS next_type,
         |         CASE WHEN ts < TIMESTAMP '$d' THEN 1 ELSE 0 END AS is_train,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3),
         |model AS (
         |  SELECT prev_type, next_type AS predicted_next FROM (
         |    SELECT *, row_number() OVER (PARTITION BY prev_type
         |      ORDER BY n DESC, next_type ASC) AS r
         |    FROM tr WHERE is_train = 1)
         |  WHERE r = 1)
         |SELECT t.prev_type, m.predicted_next,
         |       CAST(SUM(t.n) AS BIGINT) AS n_eval,
         |       CAST(SUM(CASE WHEN t.next_type = m.predicted_next
         |         THEN t.n ELSE 0 END) AS BIGINT) AS n_correct,
         |       CAST(FLOOR(10000.0 * SUM(CASE WHEN t.next_type =
         |           m.predicted_next THEN t.n ELSE 0 END) / SUM(t.n))
         |         AS BIGINT) AS acc_bp
         |FROM tr t LEFT JOIN model m USING (prev_type)
         |WHERE t.is_train = 0
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    // Lorenz tiers (tie groups land whole by their last DESC rank) +
    // exact rank-formula Gini in doubled units at value grain
    "q268_revenue_pareto" -> {
      val t = Queries.ParetoTiers
      s"""WITH cust AS (
         |  SELECT o_custkey,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |g AS (
         |  SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM cust GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(SUM(cnt) OVER (ORDER BY cents ASC) AS BIGINT) AS cum,
         |         CAST(SUM(cnt) OVER () AS BIGINT) AS n,
         |         CAST(SUM(cnt * cents) OVER () AS BIGINT) AS tot
         |  FROM g),
         |gini AS (
         |  SELECT CAST(FLOOR(10000.0 *
         |      (SUM((2 * (cum - cnt) + cnt + 1) * cnt * cents)
         |        - (MIN(n) + 1) * MIN(tot))
         |      / (MIN(n) * MIN(tot))) AS BIGINT) AS gini_bp
         |  FROM w),
         |tiers AS (
         |  SELECT (n - (cum - cnt) - 1) * $t // n + 1 AS tier,
         |         CAST(SUM(cnt) AS BIGINT) AS n_customers,
         |         CAST(SUM(cnt * cents) AS BIGINT) AS revenue_cents,
         |         CAST(MIN(tot) AS BIGINT) AS tot
         |  FROM w GROUP BY 1)
         |SELECT tier, n_customers, revenue_cents,
         |       CAST(FLOOR(10000.0 * revenue_cents / tot) AS BIGINT)
         |         AS rev_share_bp,
         |       CAST(FLOOR(10000.0 * SUM(revenue_cents) OVER (ORDER BY tier)
         |         / tot) AS BIGINT) AS cum_share_bp,
         |       (SELECT gini_bp FROM gini) AS gini_bp
         |FROM tiers ORDER BY tier""".stripMargin
    },

    // AUC == Mann-Whitney U / (n_pos*n_neg): the q260 doubled-midrank
    // machinery with the conversion label in place of the arm
    "q269_engagement_auc" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1
         |           ELSE 0 END) AS BIGINT) AS m,
         |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
         |           ELSE 0 END) AS BIGINT) AS pos
         |  FROM events GROUP BY 1),
         |v AS (
         |  SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         CAST(SUM(pos) AS BIGINT) AS cnt_pos
         |  FROM u GROUP BY 1),
         |r AS (SELECT *, CAST(SUM(cnt) OVER (ORDER BY m) AS BIGINT) AS cum
         |      FROM v),
         |t AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_users,
         |         CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
         |         CAST(SUM(cnt_pos * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
         |           AS r_pos2
         |  FROM r)
         |SELECT n_users, n_pos, n_users - n_pos AS n_neg,
         |       CASE WHEN n_pos = 0 OR n_pos = n_users THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |              (r_pos2 - n_pos * (n_pos + 1))
         |              / (2.0 * n_pos * (n_users - n_pos))) AS BIGINT)
         |       END AS auc_bp
         |FROM t""".stripMargin,

    // declared-domain pivot: conditional sums over the fixed quarter
    // set (the exact plan Spark's pivot compiles to)
    "q270_quarterly_pivot" -> {
      val y = Queries.PivotYear
      s"""WITH f AS (
         |  SELECT c.c_nationkey,
         |         CAST(quarter(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS q,
         |         CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  WHERE year(CAST(o.o_orderdate AS DATE)) = $y),
         |g AS (
         |  SELECT n.n_name AS nation,
         |         CAST(COALESCE(SUM(CASE WHEN q = 1 THEN cents END), 0)
         |           AS BIGINT) AS q1_cents,
         |         CAST(COALESCE(SUM(CASE WHEN q = 2 THEN cents END), 0)
         |           AS BIGINT) AS q2_cents,
         |         CAST(COALESCE(SUM(CASE WHEN q = 3 THEN cents END), 0)
         |           AS BIGINT) AS q3_cents,
         |         CAST(COALESCE(SUM(CASE WHEN q = 4 THEN cents END), 0)
         |           AS BIGINT) AS q4_cents
         |  FROM f JOIN nation n ON f.c_nationkey = n.n_nationkey
         |  GROUP BY 1)
         |SELECT nation, q1_cents, q2_cents, q3_cents, q4_cents,
         |       q1_cents + q2_cents + q3_cents + q4_cents AS total_cents
         |FROM g ORDER BY nation""".stripMargin
    },

    // the same cells long: one row per (nation, quarter), zeros kept
    "q271_quarterly_unpivot" -> {
      val y = Queries.PivotYear
      s"""WITH f AS (
         |  SELECT c.c_nationkey,
         |         CAST(quarter(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS q,
         |         CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |  WHERE year(CAST(o.o_orderdate AS DATE)) = $y),
         |n4 AS (
         |  SELECT n.n_name AS nation, qq.quarter
         |  FROM (SELECT DISTINCT c_nationkey FROM f) fn
         |  JOIN nation n ON fn.c_nationkey = n.n_nationkey
         |  CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS quarter) qq),
         |g AS (
         |  SELECT n.n_name AS nation, f.q AS quarter,
         |         CAST(SUM(cents) AS BIGINT) AS cents
         |  FROM f JOIN nation n ON f.c_nationkey = n.n_nationkey
         |  GROUP BY 1, 2)
         |SELECT n4.nation, CAST(n4.quarter AS BIGINT) AS quarter,
         |       CAST(COALESCE(g.cents, 0) AS BIGINT) AS cents
         |FROM n4 LEFT JOIN g ON n4.nation = g.nation
         |  AND n4.quarter = g.quarter
         |ORDER BY 1, 2""".stripMargin
    },

    // dyadic EWMA: each source day fans forward <=W days with weight
    // 2^(W-1-lag); fixed kernel mass 2^W-1, BIGINT-exact both engines
    "q272_ewma_revenue" -> {
      val w = Queries.EwmaWindowDays
      val denom = (1L << w) - 1L
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |c AS (
         |  SELECT a.daynum,
         |         SUM(b.cents * (CAST(1 AS BIGINT) <<
         |           CAST(${w - 1} - (a.daynum - b.daynum) AS INT))) AS wsum
         |  FROM d a JOIN d b
         |    ON b.daynum BETWEEN a.daynum - ${w - 1} AND a.daynum
         |  GROUP BY 1)
         |SELECT strftime(DATE '1970-01-01' + CAST(d.daynum AS INT),
         |         '%Y-%m-%d') AS day,
         |       d.cents,
         |       CAST(c.wsum // $denom AS BIGINT) AS ewma_cents,
         |       CASE WHEN c.wsum // $denom > 0
         |            THEN CAST(FLOOR(10000.0 * d.cents /
         |              (c.wsum // $denom)) AS BIGINT)
         |       END AS spike_bp
         |FROM d JOIN c ON d.daynum = c.daynum
         |ORDER BY 1""".stripMargin
    },

    // q120's verdict CTEs folded to one 5-sum row; kappa from the
    // exact cross-products
    "q273_signal_kappa" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(x), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      s"""WITH t AS (
         |  SELECT string_split(text, ' ') AS tok FROM documents
         |  WHERE text IS NOT NULL),
         |m AS (
         |  SELECT CAST(len(tok) AS BIGINT) AS token_count,
         |         CAST(len(list_filter(tok, x -> length(x) <= 2)) AS BIGINT)
         |           AS short_count,
         |         CAST(list_sum(list_transform(tok,
         |           x -> ($bucket % 1001) - 500)) AS BIGINT) AS score
         |  FROM t),
         |v AS (
         |  SELECT CAST(token_count >= 20 AND
         |           CAST(FLOOR(10000.0 * short_count / token_count) AS BIGINT)
         |             <= 4000 AS BIGINT) AS h,
         |         CAST(score >= 0 AS BIGINT) AS c
         |  FROM m),
         |g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(h) AS BIGINT) AS n_heuristic_ok,
         |         CAST(SUM(c) AS BIGINT) AS n_classifier_keep,
         |         CAST(SUM(h * c) + SUM((1 - h) * (1 - c)) AS BIGINT)
         |           AS n_agree
         |  FROM v),
         |s AS (
         |  SELECT *, n_heuristic_ok * n_classifier_keep +
         |         (n_docs - n_heuristic_ok) * (n_docs - n_classifier_keep)
         |           AS ss
         |  FROM g)
         |SELECT n_docs, n_heuristic_ok, n_classifier_keep, n_agree,
         |       CAST(FLOOR(10000.0 * n_agree / n_docs) AS BIGINT) AS po_bp,
         |       CAST(FLOOR(10000.0 * ss / (n_docs * n_docs)) AS BIGINT)
         |         AS pe_bp,
         |       CASE WHEN n_docs * n_docs = ss THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (n_docs * n_agree - ss) /
         |              (n_docs * n_docs - ss)) AS BIGINT)
         |       END AS kappa_bp
         |FROM s""".stripMargin
    },

    // 2x2 closed form N*(ad-bc)^2/(Ra*Rb*C1*C0) in HUGEINT with one
    // integral division (mirrors the decimal(38,0) DIV)
    "q274_chi_square_lift" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val crit = graft.ops.Experiment.ChiSqCrit1DfBp
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS pos
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT pos,
         |         CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, pos,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_a,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN pos ELSE 0 END) AS BIGINT)
         |           AS conv_a,
         |         CAST(SUM(pos) AS BIGINT) AS conv_all
         |  FROM a),
         |e AS (
         |  SELECT n_users, n_a, n_users - n_a AS n_b, conv_a,
         |         conv_all - conv_a AS conv_b,
         |         CAST(conv_a AS HUGEINT) *
         |           CAST(n_users - n_a - (conv_all - conv_a) AS HUGEINT) -
         |         CAST(conv_all - conv_a AS HUGEINT) *
         |           CAST(n_a - conv_a AS HUGEINT) AS det,
         |         CAST(n_a AS HUGEINT) * CAST(n_users - n_a AS HUGEINT) *
         |           CAST(conv_all AS HUGEINT) *
         |           CAST(n_users - conv_all AS HUGEINT) AS den
         |  FROM g)
         |SELECT n_users, n_a, n_b, conv_a, conv_b,
         |       CASE WHEN den = 0 THEN NULL
         |            ELSE CAST((CAST(10000 AS HUGEINT) *
         |              CAST(n_users AS HUGEINT) * det * det) // den AS BIGINT)
         |       END AS chi2_bp,
         |       CASE WHEN den = 0 THEN NULL
         |            ELSE CAST((CAST(10000 AS HUGEINT) *
         |              CAST(n_users AS HUGEINT) * det * det) // den
         |              >= $crit AS INT)
         |       END AS significant
         |FROM e""".stripMargin
    },

    // midrank CDF in bp at (type, value-cents) grain — the broadcast
    // quantile-normalization mapping
    "q275_quantile_normalize" ->
      """WITH g AS (
        |  SELECT event_type, CAST(FLOOR(value * 100.0) AS BIGINT) AS cents,
        |         CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, cents, n_events,
        |       CAST(FLOOR(10000.0 *
        |         (2 * (SUM(n_events) OVER (PARTITION BY event_type
        |            ORDER BY cents) - n_events) + n_events) /
        |         (2.0 * SUM(n_events) OVER (PARTITION BY event_type)))
        |         AS BIGINT) AS pct_bp
        |FROM g ORDER BY 1, 2""".stripMargin,

    // lsh + ivf + fused rankings graded against the exact top-k; RRF
    // in integer ppm (1000000 // (60 + rank)) so fusion is bit-exact
    "q276_rrf_fusion" -> {
      val k = Queries.AnnRecallK
      val m = Queries.KnnQueryMod
      val rrfK = graft.ops.Similarity.RrfK
      val dotOf = (l: String, r: String) =>
        s"""CAST(list_sum(list_transform(range(1, len($l) + 1),
           |              i -> $l[i] * $r[i])) AS BIGINT)""".stripMargin
      val cosOf = (dot: String, a: String, b: String) =>
        s"""CASE WHEN $a = 0 OR $b = 0 THEN 0
           |     ELSE CAST(FLOOR(10000.0 * $dot /
           |       (sqrt(CAST($a AS DOUBLE)) * sqrt(CAST($b AS DOUBLE))))
           |       AS BIGINT)
           |END""".stripMargin
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding,
         |         list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
         |           AS q
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, label, embedding, q,
         |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
         |  FROM e),
         |qs AS (SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n
         |       WHERE vec_id % $m = 0),
         |tc AS (
         |  SELECT qs.query_id, n.vec_id AS neighbor_id,
         |         ${cosOf(dotOf("n.q", "qs.q_q"), "n.n2", "qs.q_n2")} AS cos_bp
         |  FROM n, qs WHERE n.vec_id != qs.query_id),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM tc) WHERE rank <= $k),
         |ntr AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_truth
         |        FROM truth GROUP BY 1),
         |bkt AS (SELECT *, $signBucketExpr AS bucket FROM n),
         |aq AS (SELECT vec_id AS query_id, bucket, q AS q_q, n2 AS q_n2
         |       FROM bkt WHERE vec_id % $m = 0),
         |lc AS (
         |  SELECT aq.query_id, bkt.vec_id AS neighbor_id,
         |         ${cosOf(dotOf("bkt.q", "aq.q_q"), "bkt.n2", "aq.q_n2")}
         |           AS cos_bp
         |  FROM bkt JOIN aq ON bkt.bucket = aq.bucket
         |  WHERE bkt.vec_id != aq.query_id),
         |lshr AS (
         |  SELECT query_id, neighbor_id, rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM lc) WHERE rank <= $k),
         |centdim AS (
         |  SELECT label, i AS pos,
         |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT)
         |           AS c
         |  FROM n, unnest(range(1, len(q) + 1)) t(i)
         |  GROUP BY label, i),
         |cent AS (
         |  SELECT label, list(c ORDER BY pos) AS centroid
         |  FROM centdim GROUP BY label),
         |c2 AS (
         |  SELECT label, centroid,
         |         CAST(list_sum(list_transform(centroid, v -> v * v))
         |           AS BIGINT) AS c_n2
         |  FROM cent),
         |probe AS (
         |  SELECT query_id, q_q, q_n2, c2.label,
         |         ${cosOf(dotOf("q_q", "centroid"), "q_n2", "c_n2")} AS c_cos
         |  FROM qs, c2),
         |assigned AS (
         |  SELECT query_id, q_q, q_n2, label FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY c_cos DESC, label ASC) AS pr
         |    FROM probe) WHERE pr = 1),
         |ic AS (
         |  SELECT a.query_id, n.vec_id AS neighbor_id,
         |         ${cosOf(dotOf("n.q", "a.q_q"), "n.n2", "a.q_n2")} AS cos_bp
         |  FROM assigned a JOIN n ON n.label = a.label
         |    AND n.vec_id <> a.query_id),
         |ivfr AS (
         |  SELECT query_id, neighbor_id, rank FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM ic) WHERE rank <= $k),
         |fj AS (
         |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
         |         COALESCE(l.neighbor_id, v.neighbor_id) AS neighbor_id,
         |         COALESCE(1000000 // ($rrfK + l.rank), 0) +
         |           COALESCE(1000000 // ($rrfK + v.rank), 0) AS rrf_ppm
         |  FROM lshr l FULL JOIN ivfr v
         |    ON l.query_id = v.query_id AND l.neighbor_id = v.neighbor_id),
         |fused AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf_ppm DESC, neighbor_id ASC) AS rank
         |    FROM fj) WHERE rank <= $k),
         |entries AS (
         |  SELECT query_id, neighbor_id, 'lsh' AS method FROM lshr
         |  UNION ALL
         |  SELECT query_id, neighbor_id, 'ivf' FROM ivfr
         |  UNION ALL
         |  SELECT query_id, neighbor_id, 'rrf' FROM fused),
         |g AS (
         |  SELECT en.query_id, en.method,
         |         CAST(COUNT(*) AS BIGINT) AS n_returned,
         |         CAST(SUM(CASE WHEN t.neighbor_id IS NOT NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM entries en LEFT JOIN truth t
         |    ON en.query_id = t.query_id AND en.neighbor_id = t.neighbor_id
         |  GROUP BY 1, 2)
         |SELECT g.query_id, g.method, g.n_returned, g.n_hits, ntr.n_truth,
         |       CASE WHEN ntr.n_truth = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * g.n_hits / ntr.n_truth)
         |              AS BIGINT)
         |       END AS recall_bp
         |FROM g JOIN ntr ON g.query_id = ntr.query_id
         |ORDER BY 1, 2""".stripMargin
    },

    // bounded peeling unrolled: vi = degree>=k survivors, ei = edges
    // with both endpoints alive; converged = residual is a true core
    "q277_kcore" -> {
      val k = Queries.KcoreK
      val iters = Queries.KcoreIters
      val peel = (1 to iters).map { i =>
        val prev = if (i == 1) "edg" else s"e${i - 1}"
        s"""v$i AS (SELECT src FROM $prev GROUP BY 1
           |        HAVING COUNT(*) >= $k),
           |e$i AS (SELECT e.src, e.dst FROM $prev e
           |        JOIN v$i a ON e.src = a.src
           |        JOIN v$i b ON e.dst = b.src)""".stripMargin
      }.mkString(",\n")
      s"""$sessionCte,
         |${coVisEdgesCte(Queries.CoVisitMaxItems, Queries.PageRankMinSupport)},
         |$peel,
         |dfin AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |         FROM e$iters GROUP BY 1)
         |SELECT CAST($k AS BIGINT) AS k, CAST($iters AS BIGINT) AS iters,
         |       CAST(COUNT(*) AS BIGINT) AS n_core_vertices,
         |       CAST(COALESCE(SUM(deg), 0) // 2 AS BIGINT) AS n_core_edges,
         |       CAST(MIN(deg) AS BIGINT) AS min_core_deg,
         |       CAST(COUNT(*) = 0 OR MIN(deg) >= $k AS INT) AS converged
         |FROM dfin""".stripMargin
    },

    // zone map vs 2-hash bloom vs exact membership per point probe;
    // 20-bit md5 nibble hashes, md5-ordered deterministic probe draw
    "q279_bloom_pruning" -> {
      val c = 1L << Queries.BloomCellBits
      val m = Queries.BloomMBits
      val p = Queries.BloomProbes
      // 5-nibble (20-bit) md5 hash of the value string, mod m
      def nib(col: String, i: Int) =
        s"(instr('0123456789abcdef', substr(md5(CAST($col AS VARCHAR)), $i, 1)) - 1)"
      def h(col: String, start: Int) =
        s"((${nib(col, start)} * 65536 + ${nib(col, start + 1)} * 4096 + " +
          s"${nib(col, start + 2)} * 256 + ${nib(col, start + 3)} * 16 + " +
          s"${nib(col, start + 4)}) % $m)"
      s"""WITH r AS (
         |  SELECT CAST(l_partkey AS BIGINT) AS a,
         |         CAST(l_orderkey AS BIGINT) AS b
         |  FROM lineitem
         |  WHERE l_partkey IS NOT NULL AND l_orderkey IS NOT NULL),
         |bo AS (SELECT MIN(a) AS lo_a, MAX(a) AS hi_a FROM r),
         |asg AS (
         |  SELECT ((r.a - bo.lo_a) * $c) // (bo.hi_a - bo.lo_a + 1) AS cell,
         |         r.b
         |  FROM r, bo),
         |cs AS (
         |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         MIN(b) AS min_b, MAX(b) AS max_b
         |  FROM asg GROUP BY 1),
         |bb AS (
         |  SELECT DISTINCT cell, bit FROM (
         |    SELECT cell, unnest([${h("b", 1)}, ${h("b", 6)}]) AS bit
         |    FROM asg)),
         |cv AS (SELECT DISTINCT cell, b FROM asg),
         |pv AS (
         |  SELECT b AS probe_b, ${h("b", 1)} AS pb1, ${h("b", 6)} AS pb2,
         |         CASE WHEN ${h("b", 1)} = ${h("b", 6)} THEN 1 ELSE 2 END
         |           AS nb
         |  FROM (SELECT DISTINCT b FROM r)
         |  ORDER BY md5(CAST(b AS VARCHAR)), b LIMIT $p),
         |zone AS (
         |  SELECT probe_b, CAST(COUNT(*) AS BIGINT) AS n_cells,
         |         CAST(SUM(n_rows) AS BIGINT) AS total_rows,
         |         CAST(SUM(CASE WHEN min_b <= probe_b AND max_b >= probe_b
         |           THEN 1 ELSE 0 END) AS BIGINT) AS zone_cells,
         |         CAST(SUM(CASE WHEN min_b <= probe_b AND max_b >= probe_b
         |           THEN n_rows ELSE 0 END) AS BIGINT) AS zone_rows
         |  FROM cs, pv GROUP BY 1),
         |bl AS (
         |  SELECT probe_b, cell, nb, COUNT(*) AS matched
         |  FROM bb JOIN pv ON bb.bit = pv.pb1 OR bb.bit = pv.pb2
         |  GROUP BY 1, 2, 3),
         |blc AS (
         |  SELECT probe_b, CAST(COUNT(*) AS BIGINT) AS bloom_cells,
         |         CAST(SUM(cs.n_rows) AS BIGINT) AS bloom_rows
         |  FROM bl JOIN cs USING (cell) WHERE matched = nb GROUP BY 1),
         |ex AS (
         |  SELECT probe_b, CAST(COUNT(*) AS BIGINT) AS exact_cells
         |  FROM cv JOIN pv ON cv.b = pv.probe_b GROUP BY 1)
         |SELECT z.probe_b, z.n_cells, z.zone_cells, z.zone_rows,
         |       CAST(COALESCE(blc.bloom_cells, 0) AS BIGINT) AS bloom_cells,
         |       CAST(COALESCE(blc.bloom_rows, 0) AS BIGINT) AS bloom_rows,
         |       CAST(COALESCE(ex.exact_cells, 0) AS BIGINT) AS exact_cells,
         |       CAST(COALESCE(blc.bloom_cells, 0) -
         |            COALESCE(ex.exact_cells, 0) AS BIGINT) AS fp_cells,
         |       CAST(FLOOR(10000.0 * z.zone_rows / z.total_rows) AS BIGINT)
         |         AS zone_bp,
         |       CAST(FLOOR(10000.0 * COALESCE(blc.bloom_rows, 0) /
         |         z.total_rows) AS BIGINT) AS bloom_bp
         |FROM zone z
         |LEFT JOIN blc ON z.probe_b = blc.probe_b
         |LEFT JOIN ex ON z.probe_b = ex.probe_b
         |ORDER BY 1""".stripMargin
    },

    // q177's independent-halves contract with the co-vis top-k shelf
    // as the model; self-transitions excluded on the eval side
    "q280_covis_backtest" -> {
      val d = Queries.DriftSplitDate
      val cap = Queries.CoVisitMaxItems
      val k = Queries.CovisBacktestK
      s"""WITH te AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM events
         |  WHERE ts >= TIMESTAMP '$d'
         |    AND json_extract_string(props, '$$.k') IS NOT NULL),
         |te1 AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS prev_us
         |  FROM te),
         |te2 AS (
         |  SELECT user_id, event_id, ts_us, item,
         |         CAST(SUM(CASE WHEN prev_us IS NULL
         |                        OR ts_us - prev_us > 1800000000
         |                   THEN 1 ELSE 0 END) OVER (
         |           PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM te1),
         |test AS (
         |  SELECT prev_item, item AS next_item,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (
         |    SELECT user_id, session_seq, item,
         |           lag(item) OVER (PARTITION BY user_id, session_seq
         |             ORDER BY ts_us, event_id) AS prev_item
         |    FROM te2)
         |  WHERE prev_item IS NOT NULL AND prev_item <> item
         |  GROUP BY 1, 2),
         |tr AS (
         |  SELECT user_id, event_id, props, epoch_us(ts) AS ts_us
         |  FROM events WHERE ts < TIMESTAMP '$d'),
         |tr1 AS (
         |  SELECT *, lag(ts_us) OVER (PARTITION BY user_id
         |    ORDER BY ts_us, event_id) AS prev_us
         |  FROM tr),
         |tsz AS (
         |  SELECT user_id, props,
         |         CAST(SUM(CASE WHEN prev_us IS NULL
         |                        OR ts_us - prev_us > 1800000000
         |                   THEN 1 ELSE 0 END) OVER (
         |           PARTITION BY user_id ORDER BY ts_us, event_id
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         |  FROM tr1),
         |it0 AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM tsz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS w
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.item < b.item
         |  GROUP BY 1, 2),
         |shelf AS (
         |  SELECT prev_item, rec_item FROM (
         |    SELECT *, row_number() OVER (PARTITION BY prev_item
         |      ORDER BY w DESC, rec_item ASC) AS r
         |    FROM (
         |      SELECT item_a AS prev_item, item_b AS rec_item, w FROM pairs
         |      UNION ALL
         |      SELECT item_b, item_a, w FROM pairs))
         |  WHERE r <= $k),
         |cov AS (SELECT DISTINCT prev_item FROM shelf),
         |j AS (
         |  SELECT test.n,
         |         cov.prev_item IS NOT NULL AS covered,
         |         shelf.rec_item IS NOT NULL AS hit
         |  FROM test
         |  LEFT JOIN cov ON test.prev_item = cov.prev_item
         |  LEFT JOIN shelf ON test.prev_item = shelf.prev_item
         |    AND test.next_item = shelf.rec_item),
         |a AS (
         |  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_test,
         |         CAST(COALESCE(SUM(CASE WHEN covered THEN n END), 0)
         |           AS BIGINT) AS n_covered,
         |         CAST(COALESCE(SUM(CASE WHEN hit THEN n END), 0)
         |           AS BIGINT) AS n_hits
         |  FROM j)
         |SELECT n_test, n_covered, n_hits,
         |       CASE WHEN n_test = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_hits / n_test) AS BIGINT)
         |            END AS hit_bp,
         |       CASE WHEN n_covered = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * n_hits / n_covered) AS BIGINT)
         |            END AS covered_hit_bp
         |FROM a""".stripMargin
    },

    // daily counts on the global span; dark days are true zeros that
    // never need rows — VMR from the 3 observed-day sums
    "q278_burstiness" ->
      """WITH d AS (
        |  SELECT event_type,
        |         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
        |           AS daynum,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events
        |  WHERE ts IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY 1, 2),
        |s AS (SELECT MAX(daynum) - MIN(daynum) + 1 AS span_days FROM d),
        |g AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS active_days,
        |         CAST(SUM(x) AS BIGINT) AS n_events,
        |         CAST(SUM(x * x) AS BIGINT) AS ss
        |  FROM d GROUP BY 1)
        |SELECT event_type, CAST(s.span_days AS BIGINT) AS span_days,
        |       active_days, n_events,
        |       CAST(FLOOR(1000.0 * n_events / s.span_days) AS BIGINT)
        |         AS mean_mpd,
        |       CAST(FLOOR(10000.0 * (s.span_days * ss - n_events * n_events)
        |         / (s.span_days * n_events)) AS BIGINT) AS vmr_bp,
        |       CAST(CAST(FLOOR(10000.0 *
        |         (s.span_days * ss - n_events * n_events) /
        |         (s.span_days * n_events)) AS BIGINT) > 10000 AS INT)
        |         AS overdispersed
        |FROM g, s ORDER BY 1""".stripMargin,

    "q230_token_spectrum" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
         |      FROM tok GROUP BY 1),
         |b AS (SELECT CAST(length(format('{:b}', freq)) - 1 AS BIGINT)
         |               AS bucket, freq
         |      FROM f)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(freq) AS BIGINT) AS occurrences,
         |       CAST(FLOOR(10000.0 * SUM(freq) / SUM(SUM(freq)) OVER ())
         |         AS BIGINT) AS occ_share_bp
         |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,

    // the q91 transition matrix, then the bp absorption recursion
    // unrolled — one CTE pair per step, mirroring
    // Market.absorptionProbability's per-pair floor exactly
    "q231_absorption_prob" -> {
      val tgt = Queries.AbsorbTarget
      def round(r: Int): String =
        s"""h$r AS (
           |  SELECT m.prev_type AS start_type,
           |         CAST(SUM(m.prob_bp * a.a_bp // 10000) AS BIGINT) AS hop_bp
           |  FROM m JOIN a${r - 1} a ON a.start_type = m.next_type
           |  WHERE m.next_type <> '$tgt' GROUP BY 1),
           |a$r AS (
           |  SELECT a1.start_type,
           |         CAST(a1.a_bp + COALESCE(h.hop_bp, 0) AS BIGINT) AS a_bp
           |  FROM a1 LEFT JOIN h$r h ON h.start_type = a1.start_type)"""
          .stripMargin
      val rounds = (2 to Queries.AbsorbSteps).map(round).mkString(",\n")
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |tr AS (
         |  SELECT prev_type, event_type AS next_type,
         |         CAST(COUNT(*) AS BIGINT) AS transitions
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (
         |  SELECT prev_type, CAST(SUM(transitions) AS BIGINT) AS from_total
         |  FROM tr GROUP BY 1),
         |m AS (
         |  SELECT tr.prev_type, tr.next_type,
         |         CAST(tr.transitions * 10000 // tot.from_total AS BIGINT)
         |           AS prob_bp
         |  FROM tr JOIN tot USING (prev_type)),
         |a1 AS (
         |  SELECT p.start_type, CAST(COALESCE(d.prob_bp, 0) AS BIGINT) AS a_bp
         |  FROM (SELECT DISTINCT prev_type AS start_type FROM m) p
         |  LEFT JOIN (SELECT prev_type AS start_type, prob_bp FROM m
         |             WHERE next_type = '$tgt') d
         |    ON d.start_type = p.start_type),
         |$rounds
         |SELECT start_type, a_bp AS absorb_bp FROM a${Queries.AbsorbSteps}
         |ORDER BY absorb_bp DESC, start_type""".stripMargin
    },

    "q232_conversion_hazard" -> {
      val mo = Queries.HazardMaxOffset
      s"""WITH cs AS (
         |  SELECT MAX(CAST(ts AS DATE)) AS censor_d
         |  FROM events WHERE ts IS NOT NULL),
         |u AS (
         |  SELECT user_id,
         |         MIN(CASE WHEN event_type = 'signup'
         |             THEN CAST(ts AS DATE) END) AS s_d,
         |         list_sort(list(DISTINCT CASE WHEN event_type = 'purchase'
         |             THEN CAST(ts AS DATE) END)) AS pds
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |f AS (
         |  SELECT CAST(date_diff('day', u.s_d, cs.censor_d) AS BIGINT)
         |           AS follow_up,
         |         CAST(date_diff('day', u.s_d,
         |           list_min(list_filter(pds, x -> x >= u.s_d))) AS BIGINT)
         |           AS conv_off
         |  FROM u, cs WHERE u.s_d IS NOT NULL),
         |r AS (
         |  SELECT conv_off,
         |         LEAST(COALESCE(conv_off, follow_up), follow_up) AS risk_end
         |  FROM f),
         |x AS (
         |  SELECT conv_off, CAST(g.t AS BIGINT) AS t
         |  FROM r, unnest(range(0, LEAST(risk_end, $mo) + 1)) AS g(t))
         |SELECT t AS offset_days, CAST(COUNT(*) AS BIGINT) AS n_at_risk,
         |       CAST(SUM(CASE WHEN conv_off = t THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_converted,
         |       CAST(FLOOR(10000.0 * SUM(CASE WHEN conv_off = t
         |           THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT) AS hazard_bp
         |FROM x GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q233_audience_overlap" -> {
      val k = Queries.AudienceTopK
      s"""WITH iu AS (
         |  SELECT DISTINCT CAST(json_extract_string(props, '$$.k') AS BIGINT)
         |           AS item, user_id
         |  FROM events
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |    AND user_id IS NOT NULL),
         |top AS (
         |  SELECT item, CAST(COUNT(*) AS BIGINT) AS n_users
         |  FROM iu GROUP BY 1 ORDER BY n_users DESC, item LIMIT $k),
         |ui AS (SELECT iu.item, iu.user_id FROM iu JOIN top USING (item)),
         |sh AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM ui a JOIN ui b
         |    ON a.user_id = b.user_id AND a.item < b.item
         |  GROUP BY 1, 2)
         |SELECT sh.item_a, sh.item_b,
         |       ta.n_users AS n_users_a, tb.n_users AS n_users_b, sh.n_shared,
         |       CAST(FLOOR(10000.0 * sh.n_shared /
         |         (ta.n_users + tb.n_users - sh.n_shared)) AS BIGINT)
         |         AS jaccard_bp
         |FROM sh
         |JOIN top ta ON ta.item = sh.item_a
         |JOIN top tb ON tb.item = sh.item_b
         |ORDER BY jaccard_bp DESC, sh.item_a, sh.item_b""".stripMargin
    },

    // signature self-estimate (625·matches) vs exact Jaccard over the
    // SAME banded candidates — the sig/cand CTEs are q22's verbatim
    "q234_minhash_calibration" -> {
      val eq = (0 until graft.ops.Dedup.NumHashes)
        .map(kk => f"CASE WHEN a.mh$kk%02d = b.mh$kk%02d THEN 1 ELSE 0 END")
        .mkString("\n         + ")
      s"""WITH $minhashCandCtes,
         |pm AS (
         |  SELECT cand.doc_a, cand.doc_b,
         |         CAST($eq AS BIGINT) AS matches,
         |         CAST(len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) + len(sb.shingles)
         |           - len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sig a ON cand.doc_a = a.doc_id
         |  JOIN sig b ON cand.doc_b = b.doc_id
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |pj AS (
         |  SELECT matches,
         |         CASE WHEN uni = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |              END AS jaccard_bp
         |  FROM pm)
         |SELECT matches, CAST(matches * 625 AS BIGINT) AS est_bp,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(jaccard_bp) // COUNT(*) AS BIGINT)
         |         AS mean_jaccard_bp,
         |       CAST(SUM(ABS(matches * 625 - jaccard_bp)) // COUNT(*)
         |         AS BIGINT) AS mean_abs_err_bp
         |FROM pj GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // TPC-H Q2 shape: correlated MIN as a part-grain window min over
    // observed unit prices; ties at the min all kept.
    "q235_min_cost_supplier" ->
      s"""WITH geo AS (
         |  SELECT s.s_suppkey, s.s_name,
         |         CAST(FLOOR(s.s_acctbal * 100.0) AS BIGINT) AS acctbal_cents,
         |         n.n_name
         |  FROM supplier s
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name = '${Queries.Q2Region}'),
         |offers AS (
         |  SELECT p.p_partkey, p.p_type, g.s_name, g.acctbal_cents, g.n_name,
         |         MIN(CAST(FLOOR(l.l_extendedprice * 100.0 / l.l_quantity)
         |           AS BIGINT)) AS offer_cents
         |  FROM lineitem l
         |  JOIN geo g ON l.l_suppkey = g.s_suppkey
         |  JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE l.l_quantity > 0.0
         |    AND p.p_size IN (${Queries.Q2Sizes.mkString(", ")})
         |    AND p.p_type = '${Queries.Q2Type}'
         |  GROUP BY 1, 2, 3, 4, 5),
         |m AS (
         |  SELECT *, MIN(offer_cents) OVER (PARTITION BY p_partkey)
         |    AS min_cents
         |  FROM offers)
         |SELECT acctbal_cents, s_name, n_name, p_partkey, p_type, offer_cents
         |FROM m WHERE offer_cents = min_cents
         |ORDER BY acctbal_cents DESC, s_name, p_partkey
         |LIMIT ${Queries.Q2TopK}""".stripMargin,

    // TPC-H Q9 shape: per-row floors BEFORE the sum (order-free), the
    // dyadic /2 cost proxy as *50.0.
    "q236_product_profit" ->
      s"""SELECT n.n_name AS nation,
         |       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         |       CAST(SUM(
         |         CAST(FLOOR(l.l_extendedprice * (1.0 - l.l_discount) * 100.0)
         |           AS BIGINT)
         |         - CAST(FLOOR(p.p_retailprice * l.l_quantity * 50.0)
         |           AS BIGINT)) AS BIGINT) AS profit_cents,
         |       CAST(COUNT(*) AS BIGINT) AS n_lines
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE p.p_name LIKE '%${Queries.Q9NameToken}%'
         |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,

    // TPC-H Q11 shape: dyadic 1/1024 share threshold — pure-BIGINT
    // compare against the part-grain total, no float division.
    "q237_important_parts" ->
      s"""WITH per_part AS (
         |  SELECT l.l_partkey,
         |         CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS value_cents
         |  FROM lineitem l
         |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  JOIN nation n ON s.s_nationkey = n.n_nationkey
         |  WHERE n.n_name = '${Queries.Q11Nation}'
         |  GROUP BY 1)
         |SELECT l_partkey AS p_partkey, value_cents
         |FROM per_part
         |WHERE value_cents * 1024 > (SELECT SUM(value_cents) FROM per_part)
         |ORDER BY value_cents DESC, p_partkey""".stripMargin,

    // TPC-H Q16 shape: NOT-IN supplier exclusion + per-profile
    // distinct supplier counts.
    "q238_part_supplier_counts" ->
      s"""SELECT p.p_brand, p.p_type, p.p_size,
         |       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
         |FROM lineitem l
         |JOIN part p ON l.l_partkey = p.p_partkey
         |WHERE p.p_brand <> '${Queries.Q16ExcludeBrand}'
         |  AND p.p_type <> '${Queries.Q16ExcludeType}'
         |  AND p.p_size IN (${Queries.Q16Sizes.mkString(", ")})
         |  AND l.l_suppkey NOT IN (
         |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    // TPC-H Q20 shape: >half of a part-year's quantity, as a 2·q >
    // total BIGINT compare over a window sum; nation filter selects
    // output AFTER domination is measured against all suppliers.
    "q239_excess_suppliers" ->
      s"""WITH per_supp AS (
         |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS ship_year,
         |         l_suppkey,
         |         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
         |           AS supp_qty
         |  FROM lineitem GROUP BY 1, 2, 3),
         |dom AS (
         |  SELECT *, SUM(supp_qty) OVER (PARTITION BY l_partkey, ship_year)
         |    AS total_qty
         |  FROM per_supp)
         |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_part_years
         |FROM dom d
         |JOIN supplier s ON d.l_suppkey = s.s_suppkey
         |JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE d.supp_qty * 2 > d.total_qty
         |  AND n.n_name = '${Queries.Q20Nation}'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // zone-map reader simulation over the q200 cell table: per
    // equal-width probe (ceil boundaries — a declared domain), cells
    // whose [min,max] overlaps vs rows actually matching. Probes the
    // data range can't fill (c_hi < c_lo) are dropped, not scanned.
    "q240_pruning_audit" -> {
      val p = Queries.PruneProbes
      val vals = (0 until p).map(i => s"($i)").mkString(", ")
      s"""WITH $zorderCellCtes,
         |pr0 AS (SELECT i FROM (VALUES $vals) t(i)),
         |pra AS (
         |  SELECT 'a' AS dim, CAST(i AS BIGINT) AS probe,
         |         bo.lo_a + (i * (bo.hi_a - bo.lo_a + 1) + ${p - 1}) // $p
         |           AS c_lo,
         |         bo.lo_a + ((i + 1) * (bo.hi_a - bo.lo_a + 1) + ${p - 1})
         |           // $p - 1 AS c_hi
         |  FROM pr0, bounds bo),
         |prb AS (
         |  SELECT 'b' AS dim, CAST(i AS BIGINT) AS probe,
         |         bo.lo_b + (i * (bo.hi_b - bo.lo_b + 1) + ${p - 1}) // $p
         |           AS c_lo,
         |         bo.lo_b + ((i + 1) * (bo.hi_b - bo.lo_b + 1) + ${p - 1})
         |           // $p - 1 AS c_hi
         |  FROM pr0, bounds bo),
         |prn AS (
         |  SELECT * FROM (SELECT * FROM pra UNION ALL SELECT * FROM prb)
         |  WHERE c_hi >= c_lo),
         |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM c),
         |scan AS (
         |  SELECT p.dim, p.probe, CAST(COUNT(*) AS BIGINT) AS scan_cells,
         |         CAST(SUM(c.n_rows) AS BIGINT) AS scan_rows
         |  FROM prn p JOIN c ON
         |       (p.dim = 'a' AND c.min_a <= p.c_hi AND c.max_a >= p.c_lo)
         |    OR (p.dim = 'b' AND c.min_b <= p.c_hi AND c.max_b >= p.c_lo)
         |  GROUP BY 1, 2),
         |sel AS (
         |  SELECT p.dim, p.probe, CAST(COUNT(*) AS BIGINT) AS select_rows
         |  FROM prn p JOIN rows_in r ON
         |       (p.dim = 'a' AND r.a BETWEEN p.c_lo AND p.c_hi)
         |    OR (p.dim = 'b' AND r.b BETWEEN p.c_lo AND p.c_hi)
         |  GROUP BY 1, 2)
         |SELECT p.dim, p.probe, p.c_lo, p.c_hi,
         |       CAST(COALESCE(s.scan_cells, 0) AS BIGINT) AS scan_cells,
         |       CAST(COALESCE(s.scan_rows, 0) AS BIGINT) AS scan_rows,
         |       CAST(COALESCE(e.select_rows, 0) AS BIGINT) AS select_rows,
         |       CAST(FLOOR(10000.0 * COALESCE(s.scan_rows, 0) / t.total_rows)
         |         AS BIGINT) AS scan_bp,
         |       CAST(FLOOR(10000.0 * COALESCE(e.select_rows, 0) / t.total_rows)
         |         AS BIGINT) AS select_bp
         |FROM prn p
         |LEFT JOIN scan s ON p.dim = s.dim AND p.probe = s.probe
         |LEFT JOIN sel e ON p.dim = e.dim AND p.probe = e.probe, tot t
         |ORDER BY 1, 2""".stripMargin
    },

    // per-subspace quantization error (the encoder's own argmin
    // distance) vs signal energy — q61's CTE chain, error rollup.
    "q242_pq_distortion" -> {
      val m = Queries.PqM; val k = Queries.PqK
      s"""WITH $embQuantCte,
         |subs AS (
         |  SELECT vec_id, CAST(s AS BIGINT) AS sub,
         |         q[CAST(s * (len(q) // $m) + 1 AS BIGINT)
         |           : CAST((s + 1) * (len(q) // $m) AS BIGINT)] AS qs
         |  FROM n, unnest(range(0, $m)) AS u(s)),
         |sv AS (
         |  SELECT vec_id, sub, qs,
         |         CAST(list_sum(list_transform(qs, v -> v * v)) AS BIGINT) AS n2s
         |  FROM subs),
         |book AS (SELECT sub, vec_id AS code, qs AS centroid, n2s AS c_n2
         |         FROM sv WHERE vec_id < $k),
         |dists AS (
         |  SELECT v.vec_id, v.sub, v.n2s, b.code,
         |         v.n2s + b.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(v.qs) + 1),
         |           i -> v.qs[i] * b.centroid[i])) AS BIGINT) AS dist
         |  FROM sv v JOIN book b USING (sub)),
         |errs AS (
         |  SELECT vec_id, sub, n2s, MIN(dist) AS err
         |  FROM dists GROUP BY 1, 2, 3)
         |SELECT sub, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       CAST(SUM(err) // COUNT(*) AS BIGINT) AS mean_err,
         |       CAST(MAX(err) AS BIGINT) AS max_err,
         |       CASE WHEN SUM(n2s) = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * SUM(err) / SUM(n2s)) AS BIGINT)
         |            END AS noise_bp
         |FROM errs GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // interval counting: ±1 deltas at order grain (close = last line
    // ship day; lineless orders never close), day-grain rollup, then
    // the running EOD sums over the calendar-bounded day domain.
    "q244_order_backlog" ->
      """WITH close AS (
        |  SELECT l_orderkey, CAST(MAX(l_shipdate) AS DATE) AS close_day
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS open_day,
        |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |         c.close_day
        |  FROM orders LEFT JOIN close c ON o_orderkey = c.l_orderkey),
        |deltas AS (
        |  SELECT open_day AS day, 1 AS d_orders, cents AS d_cents FROM o
        |  UNION ALL
        |  SELECT close_day, -1, -cents FROM o WHERE close_day IS NOT NULL),
        |byday AS (
        |  SELECT day,
        |         CAST(SUM(CASE WHEN d_orders > 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS opened,
        |         CAST(SUM(CASE WHEN d_orders < 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS closed,
        |         SUM(d_orders) AS net, SUM(d_cents) AS net_cents
        |  FROM deltas GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, opened, closed,
        |       CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_eod,
        |       CAST(SUM(net_cents) OVER (ORDER BY day) AS BIGINT)
        |         AS open_cents_eod
        |FROM byday ORDER BY 1""".stripMargin,

    // one conditional-sum fact pass; growth null when the base year
    // is empty (strict pairing, the q186 convention).
    "q250_revenue_bridge" -> {
      val yr = Queries.BridgeYear
      s"""SELECT n.n_name AS nation,
         |       CAST(SUM(CASE WHEN year(o.o_orderdate) = $yr
         |         THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |         ELSE 0 END) AS BIGINT) AS rev_cents,
         |       CAST(SUM(CASE WHEN year(o.o_orderdate) = ${yr - 1}
         |         THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |         ELSE 0 END) AS BIGINT) AS prev_cents,
         |       CAST(SUM(CASE WHEN year(o.o_orderdate) = $yr
         |         THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |         ELSE 0 END)
         |         - SUM(CASE WHEN year(o.o_orderdate) = ${yr - 1}
         |         THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |         ELSE 0 END) AS BIGINT) AS delta_cents,
         |       CASE WHEN SUM(CASE WHEN year(o.o_orderdate) = ${yr - 1}
         |           THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |           ELSE 0 END) <= 0 THEN NULL
         |         ELSE CAST(FLOOR(10000.0 *
         |           (SUM(CASE WHEN year(o.o_orderdate) = $yr
         |              THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |              ELSE 0 END)
         |            - SUM(CASE WHEN year(o.o_orderdate) = ${yr - 1}
         |              THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |              ELSE 0 END))
         |           / SUM(CASE WHEN year(o.o_orderdate) = ${yr - 1}
         |              THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |              ELSE 0 END)) AS BIGINT) END AS growth_bp
         |FROM orders o
         |JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |WHERE year(o.o_orderdate) IN ($yr, ${yr - 1})
         |GROUP BY 1
         |ORDER BY delta_cents DESC, nation""".stripMargin
    },

    // candidate grain (customer, day); exact dupes = repeated amounts
    // inside a candidate group; group lists never published
    "q251_duplicate_orders" ->
      """WITH a AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
        |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT o_custkey, day, CAST(SUM(n) AS BIGINT) AS size,
        |         CAST(COUNT(*) AS BIGINT) AS nd,
        |         CAST(SUM((n - 1) * cents) AS BIGINT) AS exposed
        |  FROM a GROUP BY 1, 2)
        |SELECT size, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |       CAST(SUM(size) AS BIGINT) AS n_orders,
        |       CAST(SUM(CASE WHEN nd < size THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_exact_groups,
        |       CAST(SUM(exposed) AS BIGINT) AS exposed_cents
        |FROM g WHERE size >= 2 GROUP BY 1 ORDER BY 1""".stripMargin,

    // widest unit-price spreads; partkey tie-break
    "q252_price_dispersion" -> {
      val ml = Queries.DispersionMinLines
      s"""WITH u AS (
         |  SELECT l_partkey,
         |         CAST(FLOOR(l_extendedprice * 100.0 / l_quantity)
         |           AS BIGINT) AS unit_cents
         |  FROM lineitem WHERE l_quantity > 0.0),
         |p AS (
         |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |         MIN(unit_cents) AS min_cents,
         |         MAX(unit_cents) AS max_cents
         |  FROM u GROUP BY 1)
         |SELECT l_partkey, n_lines, min_cents, max_cents,
         |       CAST(FLOOR(10000.0 * (max_cents - min_cents) / max_cents)
         |         AS BIGINT) AS spread_bp
         |FROM p WHERE n_lines >= $ml AND max_cents > 0
         |ORDER BY spread_bp DESC, l_partkey
         |LIMIT ${Queries.DispersionTopK}""".stripMargin
    },

    // structural line-number check: dup beats gap in classification
    "q253_linenumber_audit" ->
      """WITH o AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS nd,
        |         CAST(MAX(l_linenumber) AS BIGINT) AS mx,
        |         CAST(MIN(l_linenumber) AS BIGINT) AS mn
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CASE WHEN nd < n THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_dup,
        |       CAST(SUM(CASE WHEN nd = n AND (mx <> n OR mn <> 1)
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_gap,
        |       CAST(COUNT(*)
        |         - SUM(CASE WHEN nd < n THEN 1 ELSE 0 END)
        |         - SUM(CASE WHEN nd = n AND (mx <> n OR mn <> 1)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
        |FROM o""".stripMargin,

    // RANGE frame over day numbers: value distance, so calendar gaps
    // never let a dark week's revenue read as current
    "q257_trailing_revenue" -> {
      val wd = Queries.TrailingWindowDays
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents,
         |         CAST(COUNT(*) AS BIGINT) AS n_orders
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)
         |SELECT strftime(DATE '1970-01-01' + CAST(daynum AS INT),
         |         '%Y-%m-%d') AS day,
         |       cents, n_orders,
         |       CAST(SUM(cents) OVER (ORDER BY daynum
         |         RANGE BETWEEN ${wd - 1} PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS trail_cents,
         |       CAST(SUM(n_orders) OVER (ORDER BY daynum
         |         RANGE BETWEEN ${wd - 1} PRECEDING AND CURRENT ROW)
         |         AS BIGINT) AS trail_orders
         |FROM d ORDER BY 1""".stripMargin
    },

    // span vs distinct sale days per part, min-span gate, top-k
    "q254_zero_sales_days" -> {
      val ms = Queries.ZeroSalesMinSpan
      s"""WITH p AS (
         |  SELECT l_partkey,
         |         CAST(MAX(CAST(l_shipdate AS DATE)) -
         |              MIN(CAST(l_shipdate AS DATE)) + 1 AS BIGINT)
         |           AS span_days,
         |         CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
         |           AS sale_days
         |  FROM lineitem GROUP BY 1)
         |SELECT l_partkey, span_days, sale_days,
         |       CAST(span_days - sale_days AS BIGINT) AS zero_days,
         |       CAST(FLOOR(10000.0 * (span_days - sale_days) / span_days)
         |         AS BIGINT) AS zero_bp
         |FROM p WHERE span_days >= $ms
         |ORDER BY zero_bp DESC, l_partkey
         |LIMIT ${Queries.ZeroSalesTopK}""".stripMargin
    },

    // (hash, source) grain first; diagonal = within-source dup texts
    // (always emitted over the observed source domain), off-diagonal
    // = exact texts shared by two sources
    "q255_cross_source_dups" ->
      """WITH hs AS (
        |  SELECT md5(text) AS h, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
        |within AS (
        |  SELECT source AS source_a, source AS source_b,
        |         CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_shared_texts
        |  FROM hs GROUP BY 1, 2),
        |crossp AS (
        |  SELECT x.source AS source_a, y.source AS source_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_shared_texts
        |  FROM hs x JOIN hs y ON x.h = y.h AND x.source < y.source
        |  GROUP BY 1, 2)
        |SELECT * FROM within
        |UNION ALL
        |SELECT * FROM crossp
        |ORDER BY n_shared_texts DESC, source_a, source_b""".stripMargin,

    // weight-mass nearest rank: crossing at ceil(rank·W/10000) of the
    // group's total quantity
    "q256_weighted_price_quantiles" -> {
      val ranks = Queries.WeightedRanksBp
      val picks = ranks.map { p =>
        s"""CAST(FLOOR(CAST(MIN(CASE WHEN cum >= (tw * $p + 9999) // 10000
           |  AND tw > 0 THEN l_extendedprice END) AS DOUBLE) * 100)
           |  AS BIGINT) AS q$p""".stripMargin
      }.mkString(",\n")
      val unions = ranks.map { p =>
        s"SELECT l_returnflag, CAST($p AS BIGINT) AS rank_bp," +
          s" q$p AS value_cents, total_weight FROM agg"
      }.mkString("\nUNION ALL\n")
      s"""WITH h AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
         |           AS w
         |  FROM lineitem
         |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
         |  GROUP BY 1, 2),
         |c AS (
         |  SELECT *,
         |         SUM(w) OVER (PARTITION BY l_returnflag
         |                      ORDER BY l_extendedprice ASC) AS cum,
         |         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
         |  FROM h),
         |agg AS (
         |  SELECT l_returnflag, CAST(MIN(tw) AS BIGINT) AS total_weight,
         |$picks
         |  FROM c GROUP BY 1)
         |$unions""".stripMargin
    },

    // q76's sketch gate: oracle emits the exact counts + literal-1
    // verdicts (the q37 convention — sketch drift flips the Spark-side
    // verdict and hash-mismatches)
    "q258_active_users_sketch" -> {
      val w = Queries.ActiveWindowDays
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |days AS (SELECT DISTINCT d AS report_d FROM ud),
         |wau AS (
         |  SELECT days.report_d, CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
         |  FROM days JOIN ud
         |    ON ud.d <= days.report_d AND ud.d > days.report_d - $w
         |  GROUP BY 1),
         |dau AS (
         |  SELECT d AS report_d, CAST(COUNT(*) AS BIGINT) AS dau
         |  FROM ud GROUP BY 1)
         |SELECT strftime(dau.report_d, '%Y-%m-%d') AS report_date, dau, wau,
         |       CAST(1 AS INT) AS sketch_ok
         |FROM dau JOIN wau USING (report_d)""".stripMargin
    },

    "q259_datacard_sketch" ->
      """SELECT source,
        |       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |       CAST(1 AS INT) AS texts_sketch_ok,
        |       CAST(1 AS INT) AS langs_sketch_ok
        |FROM documents GROUP BY 1""".stripMargin,

    // exact doubled-unit midranks (rank2 = 2*cum_before + cnt + 1):
    // rank sums and U are BIGINTs, no float ranks cross-engine
    "q260_mann_whitney" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT m, CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |            THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, m, md5(CAST(user_id AS VARCHAR)) AS draw
         |        FROM u)),
         |v AS (
         |  SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |           AS cnt_a
         |  FROM a GROUP BY 1),
         |r AS (SELECT *, CAST(SUM(cnt) OVER (ORDER BY m) AS BIGINT) AS cum
         |      FROM v),
         |t AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         |         CAST(SUM(cnt_a) AS BIGINT) AS n_a,
         |         CAST(SUM(cnt_a * (2 * (cum - cnt) + cnt + 1)) AS BIGINT)
         |           AS r_a2
         |  FROM r)
         |SELECT 'A' AS arm, n_a AS n_users, r_a2 AS rank_sum_x2,
         |       r_a2 - n_a * (n_a + 1) AS u_x2,
         |       CASE WHEN n_a = 0 OR n = n_a THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (r_a2 - n_a * (n_a + 1))
         |              / (2.0 * n_a * (n - n_a))) AS BIGINT) END AS cles_bp
         |FROM t
         |UNION ALL
         |SELECT 'B', n - n_a, n * (n + 1) - r_a2,
         |       2 * n_a * (n - n_a) - (r_a2 - n_a * (n_a + 1)),
         |       CASE WHEN n_a = 0 OR n = n_a THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |              (2 * n_a * (n - n_a) - (r_a2 - n_a * (n_a + 1)))
         |              / (2.0 * n_a * (n - n_a))) AS BIGINT) END
         |FROM t
         |ORDER BY 1""".stripMargin
    },

    // rank-midpoint median (q38 convention) inside the q257 RANGE
    // window: integer // of the 1-2 middle daily totals
    "q261_trailing_median" -> {
      val wd = Queries.TrailingWindowDays
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |p AS (
         |  SELECT x.daynum, x.cents, s.daynum AS sday, s.cents AS scents
         |  FROM d x JOIN d s ON s.daynum BETWEEN x.daynum - ${wd - 1}
         |    AND x.daynum),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY daynum
         |           ORDER BY scents, sday) AS rn,
         |         COUNT(*) OVER (PARTITION BY daynum) AS cnt
         |  FROM p)
         |SELECT strftime(DATE '1970-01-01' + CAST(daynum AS INT),
         |         '%Y-%m-%d') AS day,
         |       CAST(MIN(cents) AS BIGINT) AS cents,
         |       CAST(SUM(scents) // COUNT(*) AS BIGINT) AS trail_median_cents,
         |       CAST(MIN(cnt) AS BIGINT) AS n_window_days
         |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
         |GROUP BY daynum ORDER BY 1""".stripMargin
    },

    // per-octave frequency ratio: Zipf slope diagnostic without logs
    "q262_zipf_decay" -> {
      val mr = Queries.ZipfMaxRank
      s"""WITH t AS (
         |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
         |v AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS term_freq
         |  FROM t GROUP BY 1
         |  ORDER BY term_freq DESC, token ASC LIMIT ${2 * mr}),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY term_freq DESC,
         |           token ASC) AS BIGINT) AS rank
         |  FROM v)
         |SELECT o.rank, o.term_freq AS freq, d.term_freq AS freq_2x,
         |       CAST(FLOOR(10000.0 * d.term_freq / o.term_freq) AS BIGINT)
         |         AS decay_bp
         |FROM r o JOIN r d ON d.rank = o.rank * 2
         |WHERE (o.rank & (o.rank - 1)) = 0 AND o.rank <= $mr
         |ORDER BY o.rank""".stripMargin
    },

    // common-neighbor + Jaccard for 2-hop NON-edges of the co-vis
    // graph (edg/deg from the shared graph CTE)
    "q263_link_prediction" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val k = Queries.LinkPredK
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |cand AS (
         |  SELECT x.dst AS item_a, y.dst AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS common_neighbors
         |  FROM edg x JOIN edg y ON x.src = y.src AND x.dst < y.dst
         |  GROUP BY 1, 2),
         |nc AS (
         |  SELECT c.* FROM cand c
         |  WHERE NOT EXISTS (SELECT 1 FROM edg e
         |                    WHERE e.src = c.item_a AND e.dst = c.item_b))
         |SELECT n.item_a, n.item_b, n.common_neighbors,
         |       da.deg AS deg_a, db.deg AS deg_b,
         |       CAST(FLOOR(10000.0 * n.common_neighbors /
         |         (da.deg + db.deg - n.common_neighbors)) AS BIGINT)
         |         AS jaccard_bp
         |FROM nc n
         |JOIN deg da ON da.src = n.item_a
         |JOIN deg db ON db.src = n.item_b
         |ORDER BY jaccard_bp DESC, common_neighbors DESC, item_a, item_b
         |LIMIT $k""".stripMargin
    },

    // gap measured to the PREVIOUS event: burst chains collapse
    "q264_event_burst_dedup" -> {
      val tolUs = Queries.BurstToleranceSec * 1000000L
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) AS ts_us,
         |         lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
         |           ORDER BY epoch_us(ts), event_id) AS prev_us
         |  FROM events),
         |f AS (
         |  SELECT event_type,
         |         CASE WHEN prev_us IS NOT NULL AND ts_us - prev_us <= $tolUs
         |              THEN 1 ELSE 0 END AS is_dup
         |  FROM e)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         |       CAST(SUM(is_dup) AS BIGINT) AS n_dups,
         |       CAST(FLOOR(10000.0 * SUM(is_dup) / COUNT(*)) AS BIGINT)
         |         AS dup_bp,
         |       CAST(COUNT(*) - SUM(is_dup) AS BIGINT) AS n_kept
         |FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // two zone-map audits (Z cells vs equal-width single-column
    // cells) joined at probe grain
    "q265_layout_compare" -> {
      val p = Queries.PruneProbes
      val c = 1L << Queries.ZorderCellBits
      val vals = (0 until p).map(i => s"($i)").mkString(", ")
      s"""WITH $zorderCellCtes,
         |lc AS (
         |  SELECT ((r.a - bo.lo_a) * $c) // (bo.hi_a - bo.lo_a + 1) AS cell,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows,
         |         MIN(a) AS min_a, MAX(a) AS max_a,
         |         MIN(b) AS min_b, MAX(b) AS max_b
         |  FROM rows_in r, bounds bo GROUP BY 1),
         |pr0 AS (SELECT i FROM (VALUES $vals) t(i)),
         |pra AS (
         |  SELECT 'a' AS dim, CAST(i AS BIGINT) AS probe,
         |         bo.lo_a + (i * (bo.hi_a - bo.lo_a + 1) + ${p - 1}) // $p
         |           AS c_lo,
         |         bo.lo_a + ((i + 1) * (bo.hi_a - bo.lo_a + 1) + ${p - 1})
         |           // $p - 1 AS c_hi
         |  FROM pr0, bounds bo),
         |prb AS (
         |  SELECT 'b' AS dim, CAST(i AS BIGINT) AS probe,
         |         bo.lo_b + (i * (bo.hi_b - bo.lo_b + 1) + ${p - 1}) // $p
         |           AS c_lo,
         |         bo.lo_b + ((i + 1) * (bo.hi_b - bo.lo_b + 1) + ${p - 1})
         |           // $p - 1 AS c_hi
         |  FROM pr0, bounds bo),
         |prn AS (
         |  SELECT * FROM (SELECT * FROM pra UNION ALL SELECT * FROM prb)
         |  WHERE c_hi >= c_lo),
         |tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM c),
         |scanz AS (
         |  SELECT p.dim, p.probe, CAST(SUM(c.n_rows) AS BIGINT) AS rows_z
         |  FROM prn p JOIN c ON
         |       (p.dim = 'a' AND c.min_a <= p.c_hi AND c.max_a >= p.c_lo)
         |    OR (p.dim = 'b' AND c.min_b <= p.c_hi AND c.max_b >= p.c_lo)
         |  GROUP BY 1, 2),
         |scanl AS (
         |  SELECT p.dim, p.probe, CAST(SUM(l.n_rows) AS BIGINT) AS rows_l
         |  FROM prn p JOIN lc l ON
         |       (p.dim = 'a' AND l.min_a <= p.c_hi AND l.max_a >= p.c_lo)
         |    OR (p.dim = 'b' AND l.min_b <= p.c_hi AND l.max_b >= p.c_lo)
         |  GROUP BY 1, 2),
         |sel AS (
         |  SELECT p.dim, p.probe, CAST(COUNT(*) AS BIGINT) AS select_rows
         |  FROM prn p JOIN rows_in r ON
         |       (p.dim = 'a' AND r.a BETWEEN p.c_lo AND p.c_hi)
         |    OR (p.dim = 'b' AND r.b BETWEEN p.c_lo AND p.c_hi)
         |  GROUP BY 1, 2)
         |SELECT p.dim, p.probe,
         |       CAST(FLOOR(10000.0 * COALESCE(e.select_rows, 0) / t.total_rows)
         |         AS BIGINT) AS select_bp,
         |       CAST(FLOOR(10000.0 * COALESCE(z.rows_z, 0) / t.total_rows)
         |         AS BIGINT) AS z_scan_bp,
         |       CAST(FLOOR(10000.0 * COALESCE(l.rows_l, 0) / t.total_rows)
         |         AS BIGINT) AS sort_scan_bp
         |FROM prn p
         |LEFT JOIN scanz z ON p.dim = z.dim AND p.probe = z.probe
         |LEFT JOIN scanl l ON p.dim = l.dim AND p.probe = l.probe
         |LEFT JOIN sel e ON p.dim = e.dim AND p.probe = e.probe, tot t
         |ORDER BY 1, 2""".stripMargin
    },

    // both 1-D margins + grand total, no cross product; explicit
    // grouping flags disambiguate subtotals from genuine NULL keys.
    "q248_grouping_sets" ->
      """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
        |       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_a,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
        |         AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY g_a, g_b, 1, 2""".stripMargin,

    // cumulative distinct via first-occurrence: a token counts at
    // cutoff c iff min(doc_id) <= c — one tokenize pass, checkpoint
    // rollups over the token- and doc-grain frames.
    "q249_vocab_growth" -> {
      val cp = Queries.VocabCheckpoints
      val vals = (1 to cp).mkString(", ")
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |firsts AS (SELECT token, MIN(doc_id) AS first_doc
         |           FROM tok GROUP BY 1),
         |dt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM tok GROUP BY 1),
         |mx AS (SELECT MAX(doc_id) AS m FROM dt),
         |cuts AS (
         |  SELECT CAST(i AS BIGINT) AS checkpoint, (mx.m * i) // $cp AS cutoff
         |  FROM unnest([$vals]) u(i), mx),
         |d AS (
         |  SELECT c.checkpoint, c.cutoff,
         |         CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n) AS BIGINT) AS total_tokens
         |  FROM cuts c JOIN dt ON dt.doc_id <= c.cutoff
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT c.checkpoint, CAST(COUNT(*) AS BIGINT) AS distinct_tokens
         |  FROM cuts c JOIN firsts f ON f.first_doc <= c.cutoff
         |  GROUP BY 1)
         |SELECT d.checkpoint, d.cutoff, d.n_docs, d.total_tokens,
         |       v.distinct_tokens,
         |       CAST(FLOOR(10000.0 * v.distinct_tokens / d.total_tokens)
         |         AS BIGINT) AS ttr_bp
         |FROM d JOIN v USING (checkpoint) ORDER BY 1""".stripMargin
    },

    // tf · bitlen-idf keywords: flog2rSql is the exact ⌊log₂(N/df)⌋
    // twin; ties broken token-asc.
    "q245_doc_keywords" -> {
      val k = Queries.DocKeywordsK
      s"""WITH tf AS (
         |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |    FROM documents WHERE text IS NOT NULL)
         |  GROUP BY 1, 2),
         |dfq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |        FROM tf GROUP BY 1),
         |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf),
         |s AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         |         CAST(${flog2rSql("nd.n", "dfq.df")} AS INT) AS idf_bits
         |  FROM tf JOIN dfq USING (token), nd),
         |r AS (
         |  SELECT *, CAST(tf * idf_bits AS BIGINT) AS score,
         |         row_number() OVER (PARTITION BY doc_id
         |           ORDER BY tf * idf_bits DESC, token ASC) AS rank
         |  FROM s)
         |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df,
         |       idf_bits, score
         |FROM r WHERE rank <= $k ORDER BY doc_id, rank""".stripMargin
    },

    // q157's triangle chain with the corners kept: each (x,y,z)
    // triangle credits its 3 nodes; cc = 2t/(d(d-1)) in bp, rolled up
    // to bitlen degree bands.
    "q246_clustering_coeff" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      s"""$sessionCte,
         |it0 AS (
         |  SELECT user_id, session_seq,
         |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
         |  FROM sz
         |  WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |capped AS (
         |  SELECT user_id, session_seq, item FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
         |      ORDER BY item) AS rn
         |    FROM it0)
         |  WHERE rn <= $cap),
         |pairs AS (
         |  SELECT a.item AS item_a, b.item AS item_b,
         |         CAST(COUNT(*) AS BIGINT) AS w
         |  FROM capped a
         |  JOIN capped b ON a.user_id = b.user_id
         |    AND a.session_seq = b.session_seq AND a.item < b.item
         |  GROUP BY 1, 2),
         |eg AS (SELECT item_a AS a, item_b AS b FROM pairs WHERE w >= $ms),
         |deg AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS v FROM eg UNION ALL SELECT b FROM eg)
         |  GROUP BY 1),
         |tric AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM eg e1
         |  JOIN eg e2 ON e2.a = e1.b
         |  JOIN eg e3 ON e3.a = e1.a AND e3.b = e2.b),
         |tcount AS (
         |  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM (
         |    SELECT x AS v FROM tric UNION ALL SELECT y FROM tric
         |    UNION ALL SELECT z FROM tric)
         |  GROUP BY 1),
         |cc AS (
         |  SELECT d.deg,
         |         CAST(FLOOR(10000.0 * 2 * COALESCE(t.t, 0)
         |           / (d.deg * (d.deg - 1))) AS BIGINT) AS cc_bp
         |  FROM deg d LEFT JOIN tcount t ON d.v = t.v
         |  WHERE d.deg >= 2)
         |SELECT CAST(length(format('{:b}', deg)) - 1 AS BIGINT) AS deg_band,
         |       CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |       CAST(SUM(cc_bp) // COUNT(*) AS BIGINT) AS mean_cc_bp,
         |       CAST(MIN(cc_bp) AS BIGINT) AS min_cc_bp,
         |       CAST(MAX(cc_bp) AS BIGINT) AS max_cc_bp
         |FROM cc GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // one-sided TV identity: only observed (class, value) pairs
    // contribute; exact integer numerators, one double divide per
    // class, banded rollup.
    "q247_t_closeness" -> {
      val b = Queries.TClosenessBandBp
      s"""WITH qi AS (
         |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         |         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS balance_band
         |  FROM customer),
         |gs AS (
         |  SELECT nation, balance_band, segment,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM qi GROUP BY 1, 2, 3),
         |gv AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS g
         |       FROM gs GROUP BY 1),
         |gc AS (SELECT nation, balance_band, CAST(SUM(n) AS BIGINT) AS nc
         |       FROM gs GROUP BY 1, 2),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS ng FROM gs),
         |tv AS (
         |  SELECT gs.nation, gs.balance_band, gc.nc,
         |         CAST(FLOOR(10000.0 *
         |             CAST(SUM(GREATEST(gs.n * tot.ng - gv.g * gc.nc, 0))
         |               AS DOUBLE)
         |             / (CAST(gc.nc AS DOUBLE) * CAST(tot.ng AS DOUBLE)))
         |           AS BIGINT) AS tv_bp
         |  FROM gs
         |  JOIN gv USING (segment)
         |  JOIN gc USING (nation, balance_band), tot
         |  GROUP BY 1, 2, gc.nc, tot.ng)
         |SELECT tv_bp // $b AS tv_band,
         |       CAST(COUNT(*) AS BIGINT) AS n_groups,
         |       CAST(SUM(nc) AS BIGINT) AS n_rows,
         |       CAST(MAX(tv_bp) AS BIGINT) AS max_tv_bp
         |FROM tv GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // q32's IVF chain at probe_rank <= max depth, then per-depth
    // re-rank + recall/cost rollups against the q25 brute-force truth.
    "q243_ivf_probe_curve" -> {
      val k = Queries.AnnRecallK
      val maxP = Queries.IvfProbeDepths.max
      val depths = Queries.IvfProbeDepths.mkString(", ")
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id, label, q,
         |         CAST(list_sum(list_transform(q, v -> v * v)) AS BIGINT) AS n2
         |  FROM e),
         |centdim AS (
         |  SELECT label, i AS pos,
         |         CAST(FLOOR(CAST(SUM(q[i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
         |  FROM n, unnest(range(1, len(q) + 1)) t(i)
         |  GROUP BY label, i),
         |cent AS (
         |  SELECT label, list(c ORDER BY pos) AS centroid FROM centdim GROUP BY label),
         |c2 AS (
         |  SELECT label, centroid,
         |         CAST(list_sum(list_transform(centroid, v -> v * v)) AS BIGINT) AS c_n2
         |  FROM cent),
         |queries AS (
         |  SELECT vec_id AS query_id, q AS q_q, n2 AS q_n2 FROM n
         |  WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |probe AS (
         |  SELECT query_id, q_q, q_n2, c2.label,
         |         CASE WHEN q_n2 = 0 OR c_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                     CAST(list_sum(list_transform(range(1, len(q_q) + 1),
         |                          i -> q_q[i] * centroid[i])) AS BIGINT)
         |                     / (sqrt(CAST(q_n2 AS DOUBLE)) * sqrt(CAST(c_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS c_cos
         |  FROM queries, c2),
         |apr AS (
         |  SELECT query_id, q_q, q_n2, label, pr FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY c_cos DESC, label ASC) AS pr
         |    FROM probe) WHERE pr <= $maxP),
         |scored AS (
         |  SELECT a.query_id, a.pr, n.vec_id AS neighbor_id,
         |         CASE WHEN n.n2 = 0 OR a.q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                     CAST(list_sum(list_transform(range(1, len(n.q) + 1),
         |                          i -> n.q[i] * a.q_q[i])) AS BIGINT)
         |                     / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(a.q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM apr a JOIN n ON n.label = a.label AND n.vec_id <> a.query_id),
         |tscored AS (
         |  SELECT qq.query_id, n.vec_id AS neighbor_id,
         |         CASE WHEN n.n2 = 0 OR qq.q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                     CAST(list_sum(list_transform(range(1, len(n.q) + 1),
         |                          i -> n.q[i] * qq.q_q[i])) AS BIGINT)
         |                     / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(qq.q_n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM queries qq JOIN n ON n.vec_id <> qq.query_id),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |    FROM tscored) WHERE rank <= $k),
         |cfg AS (SELECT CAST(d AS BIGINT) AS n_probe
         |        FROM unnest([$depths]) AS u(d)),
         |annp AS (
         |  SELECT c.n_probe, s.query_id, s.neighbor_id,
         |         row_number() OVER (PARTITION BY c.n_probe, s.query_id
         |                            ORDER BY s.cos_bp DESC, s.neighbor_id ASC)
         |           AS rank
         |  FROM cfg c JOIN scored s ON s.pr <= c.n_probe),
         |hits AS (
         |  SELECT a.n_probe, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM annp a
         |  JOIN truth t ON a.query_id = t.query_id
         |    AND a.neighbor_id = t.neighbor_id
         |  WHERE a.rank <= $k GROUP BY 1),
         |cost AS (
         |  SELECT c.n_probe, CAST(COUNT(*) AS BIGINT) AS n_candidates
         |  FROM cfg c JOIN scored s ON s.pr <= c.n_probe GROUP BY 1),
         |tot AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_truth,
         |         CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries
         |  FROM truth)
         |SELECT c.n_probe, tot.n_queries, tot.n_truth,
         |       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(COALESCE(co.n_candidates, 0) AS BIGINT) AS n_candidates,
         |       CASE WHEN tot.n_truth = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * COALESCE(h.n_hits, 0)
         |                 / tot.n_truth) AS BIGINT) END AS recall_bp
         |FROM cfg c
         |LEFT JOIN hits h ON c.n_probe = h.n_probe
         |LEFT JOIN cost co ON c.n_probe = co.n_probe, tot
         |ORDER BY 1""".stripMargin
    },

    // S-curve planner over the q22 candidate sample: p = 1−(1−s^r)^b
    // per power-of-two (r, b), both exponent chains as repeated
    // squaring (textually identical IEEE multiplies in both engines),
    // p floored to bp per pair before any sum.
    "q241_lsh_planner" -> {
      val tau = Queries.LshPlannerTauBp
      def cfgSql(j: Int): String = {
        val k = 4 - j
        var from = s"(SELECT jaccard_bp, 1.0 - x$j AS y0 FROM b4) t0"
        for (i <- 1 to k)
          from = s"(SELECT jaccard_bp, y${i - 1} * y${i - 1} AS y$i" +
            s" FROM $from) t$i"
        s"""SELECT CAST(${1L << j} AS BIGINT) AS rows_per_band,
           |       CAST(${1L << k} AS BIGINT) AS n_bands, jaccard_bp,
           |       CAST(FLOOR(10000.0 * (1.0 - y$k)) AS BIGINT) AS p_bp
           |FROM $from""".stripMargin
      }
      val nTrue = s"SUM(CASE WHEN jaccard_bp >= $tau THEN 1 ELSE 0 END)"
      s"""WITH $minhashCandCtes,
         |v AS (
         |  SELECT CAST(len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS inter,
         |         CAST(len(sa.shingles) + len(sb.shingles)
         |           - len(list_intersect(sa.shingles, sb.shingles))
         |           AS BIGINT) AS uni
         |  FROM cand
         |  JOIN sh sa ON cand.doc_a = sa.doc_id
         |  JOIN sh sb ON cand.doc_b = sb.doc_id),
         |jp AS (
         |  SELECT CASE WHEN uni = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * inter / uni) AS BIGINT)
         |              END AS jaccard_bp
         |  FROM v),
         |b0 AS (SELECT jaccard_bp,
         |              CAST(jaccard_bp AS DOUBLE) / 10000.0 AS x0 FROM jp),
         |b1 AS (SELECT *, x0 * x0 AS x1 FROM b0),
         |b2 AS (SELECT *, x1 * x1 AS x2 FROM b1),
         |b3 AS (SELECT *, x2 * x2 AS x3 FROM b2),
         |b4 AS (SELECT *, x3 * x3 AS x4 FROM b3),
         |cfg AS (
         |${(0 to 4).map(cfgSql).mkString("", "\nUNION ALL\n", "")})
         |SELECT rows_per_band, n_bands,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST($nTrue AS BIGINT) AS n_true,
         |       CAST(COUNT(*) - $nTrue AS BIGINT) AS n_false,
         |       CASE WHEN $nTrue = 0 THEN NULL
         |            ELSE CAST(SUM(CASE WHEN jaccard_bp >= $tau THEN p_bp
         |                          ELSE 0 END) // $nTrue AS BIGINT)
         |            END AS recall_bp,
         |       CASE WHEN COUNT(*) = $nTrue THEN NULL
         |            ELSE CAST(SUM(CASE WHEN jaccard_bp < $tau THEN p_bp
         |                          ELSE 0 END) // (COUNT(*) - $nTrue)
         |                 AS BIGINT)
         |            END AS fp_bp,
         |       CAST(SUM(p_bp) AS BIGINT) AS exp_cand_bp_sum
         |FROM cfg GROUP BY 1, 2 ORDER BY 1""".stripMargin
    },

    // exact twins of the three rolling windows (q258 trailing
    // semantics, one joined fan-out at maxW); sketch verdicts literal
    // 1 — a drifting HLL union flips the bit and the row mismatches
    "q281_rolling_wau_sketch" -> {
      val ws = Queries.RollingWindows
      val maxW = ws.max
      val waus = ws.map(w =>
        s"""         CAST(COUNT(DISTINCT CASE WHEN lag < $w
           |           THEN user_id END) AS BIGINT) AS wau$w""".stripMargin)
        .mkString(",\n")
      val oks = ws.map(w => s"CAST(1 AS INT) AS sk${w}_ok").mkString(", ")
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         |days AS (SELECT DISTINCT d AS report_d FROM ud),
         |c AS (
         |  SELECT days.report_d, ud.user_id,
         |         (days.report_d - ud.d) AS lag
         |  FROM days JOIN ud
         |    ON ud.d <= days.report_d AND ud.d > days.report_d - $maxW),
         |w AS (
         |  SELECT report_d,
         |$waus
         |  FROM c GROUP BY 1),
         |dau AS (
         |  SELECT d AS report_d, CAST(COUNT(*) AS BIGINT) AS dau
         |  FROM ud GROUP BY 1)
         |SELECT strftime(dau.report_d, '%Y-%m-%d') AS report_date, dau,
         |       ${ws.map(w => s"wau$w").mkString(", ")}, $oks
         |FROM dau JOIN w USING (report_d)""".stripMargin
    },

    // 2×2 panel in house cents; DuckDB SUM(BIGINT) widens to HUGEINT
    // so every sum is re-cast; // == Spark DIV on positive cents
    "q282_diff_in_diff" ->
      """WITH dim AS (
        |  SELECT c.c_custkey,
        |         CASE WHEN r.r_name = 'ASIA' THEN 'TREAT'
        |              ELSE 'CTRL' END AS grp
        |  FROM customer c
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  WHERE r.r_name IN ('ASIA', 'AMERICA')),
        |g AS (
        |  SELECT dim.grp,
        |         CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
        |             >= DATE '1998-01-01' THEN 0 ELSE 1 END) AS BIGINT)
        |           AS n_pre,
        |         CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
        |             >= DATE '1998-01-01' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_post,
        |         CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
        |             < DATE '1998-01-01'
        |           THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS c_pre,
        |         CAST(SUM(CASE WHEN CAST(o.o_orderdate AS DATE)
        |             >= DATE '1998-01-01'
        |           THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS c_post
        |  FROM orders o JOIN dim ON o.o_custkey = dim.c_custkey
        |  WHERE o.o_orderdate IS NOT NULL
        |  GROUP BY 1),
        |d AS (
        |  SELECT grp, n_pre, n_post,
        |         CASE WHEN n_pre > 0
        |              THEN CAST(c_pre // n_pre AS BIGINT) END
        |           AS mean_pre_cents,
        |         CASE WHEN n_post > 0
        |              THEN CAST(c_post // n_post AS BIGINT) END
        |           AS mean_post_cents
        |  FROM g),
        |dd AS (SELECT *, mean_post_cents - mean_pre_cents AS delta_cents
        |       FROM d),
        |s AS (
        |  SELECT CAST(SUM(CASE WHEN grp = 'TREAT' THEN delta_cents END)
        |         - SUM(CASE WHEN grp = 'CTRL' THEN delta_cents END)
        |         AS BIGINT) AS did_cents
        |  FROM dd)
        |SELECT grp, n_pre, n_post, mean_pre_cents, mean_post_cents,
        |       delta_cents, did_cents
        |FROM dd, s ORDER BY grp""".stripMargin,

    // sessions(T) = first-events + gaps>T from one lag pass; gaps in
    // µs (the assignSessions convention), candidates unrolled as a
    // UNION ALL over the 1-row sum table
    "q283_timeout_sweep" -> {
      val ts = Queries.SweepTimeouts
      val xs = ts.map(t =>
        s"""         CAST(SUM(CASE WHEN gap_us > ${t}000000 THEN 1 ELSE 0 END)
           |           AS BIGINT) AS x$t""".stripMargin).mkString(",\n")
      val rows = ts.map(t =>
        s"""SELECT CAST($t AS BIGINT) AS timeout_s,
           |       n_users + x$t AS n_sessions, n_events,
           |       CAST((1000 * n_events) // (n_users + x$t) AS BIGINT)
           |         AS events_per_session_milli
           |FROM t""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH g AS (
         |  SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
         |  FROM events WHERE ts IS NOT NULL),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         |         CAST(SUM(CASE WHEN gap_us IS NULL THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_users,
         |$xs
         |  FROM g)
         |$rows
         |ORDER BY timeout_s""".stripMargin
    },

    // vowel-run syllable proxy via the double-replace run count;
    // score clamped at 0 so every // runs on nonnegative operands
    "q284_readability" ->
      """WITH per AS (
        |  SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |         greatest(CAST(
        |           length(regexp_replace(text, '[.!?]+', '#', 'g'))
        |           - length(regexp_replace(text, '[.!?]+', '', 'g'))
        |           AS BIGINT), 1) AS s,
        |         CAST(
        |           length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
        |           - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
        |           AS BIGINT) AS vr
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT source, w, s, greatest(vr, w) AS syl,
        |         greatest(206835 - (1015 * w) // s
        |           - (84600 * greatest(vr, w)) // w, 0) AS flesch_milli
        |  FROM per),
        |g AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(w) AS BIGINT) AS sw,
        |         CAST(SUM(s) AS BIGINT) AS ss,
        |         CAST(SUM(syl) AS BIGINT) AS ssyl,
        |         CAST(SUM(flesch_milli) AS BIGINT) AS sf,
        |         CAST(SUM(CASE WHEN flesch_milli < 50000 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS hard
        |  FROM f GROUP BY 1)
        |SELECT source, n_docs,
        |       CAST(sf // n_docs AS BIGINT) AS mean_flesch_milli,
        |       CAST((1000 * sw) // ss AS BIGINT) AS wps_milli,
        |       CAST((1000 * ssyl) // sw AS BIGINT) AS spw_milli,
        |       CASE WHEN n_docs = 0 THEN 0
        |            ELSE CAST(FLOOR(10000.0 * hard / n_docs) AS BIGINT)
        |       END AS p_hard_bp
        |FROM g ORDER BY source""".stripMargin,

    // add-1 bigram LM scored against itself: bits =
    // ⌊log₂((c1+V)/(c2+1))⌋ via the bitlen identity; bigrams by the
    // q86 double-unnest pos join; model tables derived from the
    // (doc, bigram, cnt) partials exactly like the Spark plan
    "q285_bigram_perplexity" ->
      s"""WITH live AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t
         |  FROM documents
         |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2),
         |tok AS (
         |  SELECT doc_id, source, unnest(t) AS token,
         |         unnest(range(1, len(t) + 1)) AS pos
         |  FROM live),
         |docbi AS (
         |  SELECT a.doc_id, a.source, a.token AS w1, b.token AS w2,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  GROUP BY 1, 2, 3, 4),
         |c2 AS (SELECT w1, w2, CAST(SUM(cnt) AS BIGINT) AS c2
         |       FROM docbi GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1
         |       FROM c2 GROUP BY 1),
         |vv AS (
         |  SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
         |  FROM (SELECT unnest(t) AS token FROM live)),
         |scored AS (
         |  SELECT d.doc_id, d.source, d.cnt,
         |         CAST(${flog2rSql("c1.c1 + vv.v", "c2.c2 + 1")} AS BIGINT)
         |           AS bits
         |  FROM docbi d
         |  JOIN c2 ON c2.w1 = d.w1 AND c2.w2 = d.w2
         |  JOIN c1 ON c1.w1 = d.w1, vv),
         |perdoc AS (
         |  SELECT doc_id, source, CAST(SUM(cnt) AS BIGINT) AS nb,
         |         CAST(SUM(cnt * bits) AS BIGINT) AS sb
         |  FROM scored GROUP BY 1, 2),
         |m AS (
         |  SELECT CAST((1000 * SUM(sb)) // SUM(nb) AS BIGINT)
         |    AS corpus_mean_milli
         |  FROM perdoc),
         |pd AS (
         |  SELECT *, CAST((1000 * sb) // nb AS BIGINT) AS bpt_milli
         |  FROM perdoc),
         |g AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(nb) AS BIGINT) AS n_bigrams,
         |         CAST(SUM(sb) AS BIGINT) AS sbits,
         |         CAST(MIN(m.corpus_mean_milli) AS BIGINT)
         |           AS corpus_mean_milli,
         |         CAST(SUM(CASE WHEN 100 * bpt_milli >
         |             105 * m.corpus_mean_milli THEN 1 ELSE 0 END)
         |           AS BIGINT) AS flagged
         |  FROM pd, m GROUP BY 1)
         |SELECT source, n_docs, n_bigrams,
         |       CAST((1000 * sbits) // n_bigrams AS BIGINT)
         |         AS bits_per_token_milli,
         |       corpus_mean_milli, flagged,
         |       CASE WHEN n_docs = 0 THEN 0
         |            ELSE CAST(FLOOR(10000.0 * flagged / n_docs) AS BIGINT)
         |       END AS flagged_bp
         |FROM g ORDER BY source""".stripMargin,

    // HUGEINT twin of the decimal(38,0) moment arithmetic; ×1000
    // fixed point, per-dim sums via the q86 parallel-unnest, the
    // projection re-joins the d-row S table at position grain
    "q286_anisotropy" -> {
      val d = Queries.AnisotropyDim
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))
         |           AS q
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) = $d),
         |pos AS (
         |  SELECT vec_id, unnest(q) AS v,
         |         unnest(range(1, len(q) + 1)) AS i
         |  FROM e),
         |dims AS (
         |  SELECT i, CAST(SUM(v) AS HUGEINT) AS s,
         |         CAST(SUM(v * v) AS HUGEINT) AS ss
         |  FROM pos GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM e),
         |st AS (
         |  SELECT CAST(SUM(nn.n * ss - s * s) AS HUGEINT) AS bprime,
         |         CAST(SUM(s * s) AS HUGEINT) AS s2
         |  FROM dims, nn),
         |pr AS (
         |  SELECT pos.vec_id,
         |         CAST(SUM(CAST(pos.v AS HUGEINT) * dims.s) AS HUGEINT) AS p
         |  FROM pos JOIN dims ON dims.i = pos.i
         |  GROUP BY 1),
         |ag AS (
         |  SELECT CAST(SUM(p) AS HUGEINT) AS sp,
         |         CAST(SUM(p * p) AS HUGEINT) AS spp
         |  FROM pr),
         |fin AS (
         |  SELECT CAST(nn.n AS BIGINT) AS n_vecs,
         |         CAST($d AS INT) AS n_dims,
         |         CASE WHEN st.s2 = 0 OR st.bprime = 0 THEN NULL
         |              ELSE CAST((10000 * (nn.n * ag.spp - ag.sp * ag.sp))
         |                // (st.s2 * st.bprime) AS BIGINT)
         |         END AS var_explained_bp,
         |         CAST(${10000L / d} AS BIGINT) AS isotropy_bp
         |  FROM nn, st, ag)
         |SELECT *,
         |       CASE WHEN var_explained_bp IS NULL THEN NULL
         |            ELSE CAST((1000 * var_explained_bp) // isotropy_bp
         |              AS BIGINT)
         |       END AS excess_milli
         |FROM fin""".stripMargin
    },

    // q272's dyadic kernel twice over a DENSE generate_series spine;
    // F(t+1) = 3·S1 − 2·S2 clamped at 0, scored against lead(cents)
    "q287_brown_forecast" -> {
      val w = Queries.EwmaWindowDays
      val denom = (1L << w) - 1L
      def ker(src: String, v: String, out: String) =
        s"""  SELECT a.daynum,
           |         CAST(SUM(b.$v * (CAST(1 AS BIGINT) <<
           |           CAST(${w - 1} - (a.daynum - b.daynum) AS INT)))
           |           // $denom AS BIGINT) AS $out
           |  FROM $src a JOIN $src b
           |    ON b.daynum BETWEEN a.daynum - ${w - 1} AND a.daynum
           |  GROUP BY 1""".stripMargin
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |s1 AS (
         |${ker("dense", "cents", "s1_cents")}),
         |s2 AS (
         |${ker("s1", "s1_cents", "s2_cents")}),
         |f AS (
         |  SELECT dense.daynum, dense.cents, s1.s1_cents, s2.s2_cents,
         |         greatest(3 * s1.s1_cents - 2 * s2.s2_cents, 0)
         |           AS forecast_next_cents,
         |         lead(dense.cents) OVER (ORDER BY dense.daynum)
         |           AS next_cents
         |  FROM dense JOIN s1 USING (daynum) JOIN s2 USING (daynum))
         |SELECT strftime(DATE '1970-01-01' + CAST(daynum AS INT),
         |         '%Y-%m-%d') AS day,
         |       cents, s1_cents, s2_cents, forecast_next_cents, next_cents,
         |       CASE WHEN next_cents IS NOT NULL
         |            THEN abs(forecast_next_cents - next_cents)
         |       END AS abs_err_cents,
         |       CASE WHEN next_cents > 0
         |            THEN CAST(FLOOR(10000.0 *
         |              abs(forecast_next_cents - next_cents) / next_cents)
         |              AS BIGINT)
         |       END AS ape_bp
         |FROM f ORDER BY 1""".stripMargin
    },

    // exact nested isqrt (IEEE seed, ±2 correction — the
    // StratifiedExtract convention) for w = ⌊√(c·⌊√c⌋)⌋; head by
    // QUALIFY, tail rolled into the <REST> row so Σppm is total
    "q288_negative_sampling" -> {
      val k = Queries.NegSampleK
      s"""WITH cnts AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token
         |        FROM documents WHERE text IS NOT NULL)
         |  GROUP BY 1),
         |u1 AS (SELECT token, cnt,
         |         CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS y0
         |       FROM cnts),
         |u2 AS (SELECT token, cnt,
         |         CASE WHEN (y0+2)*(y0+2) <= cnt THEN y0+2
         |              WHEN (y0+1)*(y0+1) <= cnt THEN y0+1
         |              ELSE y0 END AS yu
         |       FROM u1),
         |u3 AS (SELECT token, cnt,
         |         CASE WHEN yu*yu <= cnt THEN yu
         |              WHEN (yu-1)*(yu-1) <= cnt THEN yu-1
         |              ELSE yu-2 END AS r1
         |       FROM u2),
         |v1 AS (SELECT token, cnt, cnt * r1 AS m,
         |         CAST(floor(sqrt(CAST(cnt * r1 AS DOUBLE))) AS BIGINT) AS z0
         |       FROM u3),
         |v2 AS (SELECT token, cnt, m,
         |         CASE WHEN (z0+2)*(z0+2) <= m THEN z0+2
         |              WHEN (z0+1)*(z0+1) <= m THEN z0+1
         |              ELSE z0 END AS zu
         |       FROM v1),
         |w AS (SELECT token, cnt,
         |        CASE WHEN zu*zu <= m THEN zu
         |             WHEN (zu-1)*(zu-1) <= m THEN zu-1
         |             ELSE zu-2 END AS w34
         |      FROM v2),
         |head AS (
         |  SELECT token, cnt, w34,
         |         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
         |  FROM w QUALIFY rank <= $k),
         |rest AS (
         |  SELECT '<REST>' AS token,
         |         CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS cnt,
         |         CAST(COALESCE(SUM(w34), 0) AS BIGINT) AS w34,
         |         (SELECT COUNT(*) FROM head) + 1 AS rank
         |  FROM w WHERE token NOT IN (SELECT token FROM head)),
         |allr AS (SELECT * FROM head UNION ALL SELECT * FROM rest),
         |t AS (SELECT CAST(SUM(w34) AS BIGINT) AS tot FROM allr),
         |p AS (SELECT allr.*, CAST((1000000 * w34) // t.tot AS BIGINT)
         |        AS sample_ppm
         |      FROM allr, t)
         |SELECT CAST(rank AS INT) AS rank, token, cnt, w34, sample_ppm,
         |       CAST(SUM(sample_ppm) OVER (ORDER BY rank) AS BIGINT)
         |         AS cum_ppm
         |FROM p ORDER BY rank""".stripMargin
    },

    // Poisson-bootstrap twin: same md5 draws (nib machinery at the
    // (user,'_',b) key), same PoissonCdf32 thresholds, same floored
    // replicate rates; interval = sorted-list picks at 2 / n/2 / n-1
    "q289_bootstrap_ci" -> {
      val nibx = (i: Int) =>
        s"(instr('0123456789abcdef', substr(x, $i, 1)) - 1)"
      val drawX = (1 to 8)
        .map(i => s"${nibx(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val nibd = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val drawArm = (1 to 8)
        .map(i => s"${nibd(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val cdf = graft.ops.Experiment.PoissonCdf32
      val wCase = "CASE " + cdf.zipWithIndex
        .map { case (c, k) => s"WHEN d32 < $c THEN $k" }
        .mkString(" ") + s" ELSE ${cdf.length} END"
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS pos
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT user_id, pos,
         |         CASE WHEN CAST($drawArm AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, pos,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |r AS (
         |  SELECT arm, pos, b,
         |         md5(CAST(user_id AS VARCHAR) || '_' || CAST(b AS VARCHAR))
         |           AS x
         |  FROM a CROSS JOIN (SELECT unnest(range(0, 32)) AS b) bb),
         |w AS (
         |  SELECT arm, pos, b, $wCase AS w
         |  FROM (SELECT arm, pos, b, CAST($drawX AS BIGINT) AS d32 FROM r)),
         |g AS (
         |  SELECT b, arm, CAST(SUM(w) AS BIGINT) AS nw,
         |         CAST(SUM(w * pos) AS BIGINT) AS cw
         |  FROM w GROUP BY 1, 2),
         |d AS (
         |  SELECT b,
         |         CASE WHEN SUM(CASE WHEN arm = 'A' THEN nw END) > 0
         |              THEN CAST(FLOOR(10000.0 *
         |                SUM(CASE WHEN arm = 'A' THEN cw END) /
         |                SUM(CASE WHEN arm = 'A' THEN nw END)) AS BIGINT)
         |         END -
         |         CASE WHEN SUM(CASE WHEN arm = 'B' THEN nw END) > 0
         |              THEN CAST(FLOOR(10000.0 *
         |                SUM(CASE WHEN arm = 'B' THEN cw END) /
         |                SUM(CASE WHEN arm = 'B' THEN nw END)) AS BIGINT)
         |         END AS delta_bp
         |  FROM g GROUP BY 1),
         |sp AS (
         |  SELECT list_sort(list(delta_bp)) AS ds
         |  FROM d WHERE delta_bp IS NOT NULL),
         |iv AS (
         |  SELECT CAST(len(ds) AS BIGINT) AS n_reps,
         |         CAST(ds[2] AS BIGINT) AS boot_lo_bp,
         |         CAST(ds[CAST(len(ds) // 2 AS INT)] AS BIGINT)
         |           AS boot_med_bp,
         |         CAST(ds[len(ds) - 1] AS BIGINT) AS boot_hi_bp
         |  FROM sp),
         |obs AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(FLOOR(10000.0 *
         |           SUM(CASE WHEN arm = 'A' THEN pos ELSE 0 END) /
         |           SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)) AS BIGINT) -
         |         CAST(FLOOR(10000.0 *
         |           SUM(CASE WHEN arm = 'B' THEN pos ELSE 0 END) /
         |           SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)) AS BIGINT)
         |           AS obs_delta_bp
         |  FROM a)
         |SELECT n_users, obs_delta_bp, n_reps, boot_lo_bp, boot_med_bp,
         |       boot_hi_bp,
         |       CAST(boot_lo_bp <= 0 AND boot_hi_bp >= 0 AS INT)
         |         AS covers_zero
         |FROM obs, iv""".stripMargin
    },

    // sort-scan skyline: keep rows whose delay strictly undercuts
    // every cheaper-or-equal predecessor's running min
    "q290_supplier_skyline" ->
      """WITH stats AS (
        |  SELECT l.l_suppkey AS suppkey,
        |         CAST(COUNT(*) AS BIGINT) AS n_lines,
        |         CAST(SUM(CAST(FLOOR(100.0 * l.l_extendedprice /
        |             l.l_quantity) AS BIGINT)) AS BIGINT) AS uc,
        |         CAST(SUM(CAST(l.l_shipdate AS DATE)
        |           - CAST(o.o_orderdate AS DATE)) AS BIGINT) AS dl
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_shipdate IS NOT NULL AND l.l_quantity > 0
        |  GROUP BY 1),
        |m AS (
        |  SELECT suppkey, n_lines,
        |         CAST(uc // n_lines AS BIGINT) AS mean_unit_cents,
        |         CAST((1000 * dl) // n_lines AS BIGINT) AS mean_delay_milli
        |  FROM stats),
        |sc AS (
        |  SELECT *,
        |         MIN(mean_delay_milli) OVER (
        |           ORDER BY mean_unit_cents ASC, mean_delay_milli ASC,
        |             suppkey ASC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS min_prev
        |  FROM m),
        |sky AS (
        |  SELECT * FROM sc
        |  WHERE min_prev IS NULL OR mean_delay_milli < min_prev)
        |SELECT CAST(row_number() OVER (
        |         ORDER BY mean_unit_cents ASC, suppkey ASC) AS INT)
        |         AS skyline_rank,
        |       suppkey, n_lines, mean_unit_cents, mean_delay_milli
        |FROM sky ORDER BY skyline_rank""".stripMargin,

    // nearest-rank picks from the sorted trailing window; pinball in
    // integer cents; same dense spine as q287
    "q291_quantile_forecast" -> {
      val w = Queries.QfWindowDays
      val levels = Queries.QfLevelsBp
      val rows = levels.map { q =>
        val r = ((q * w + 9999L) / 10000L).toInt
        s"""SELECT CAST($q AS BIGINT) AS quantile_bp,
           |       CAST(COUNT(*) AS BIGINT) AS n_days,
           |       CAST(SUM(CASE WHEN cents >= win[$r]
           |             THEN ($q * (cents - win[$r])) // 10000
           |             ELSE (${10000L - q} * (win[$r] - cents)) // 10000
           |           END) // COUNT(*) AS BIGINT) AS mean_pinball_cents,
           |       CAST(FLOOR(10000.0 * SUM(CASE WHEN cents <= win[$r]
           |             THEN 1 ELSE 0 END) / COUNT(*)) AS BIGINT)
           |         AS coverage_bp
           |FROM sc""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |hist AS (
         |  SELECT t.daynum, list_sort(list(b.cents)) AS win
         |  FROM dense b JOIN dense t
         |    ON t.daynum BETWEEN b.daynum + 1 AND b.daynum + $w
         |  GROUP BY 1 HAVING COUNT(*) = $w),
         |sc AS (
         |  SELECT dense.daynum, dense.cents, hist.win
         |  FROM dense JOIN hist USING (daynum))
         |$rows
         |ORDER BY quantile_bp""".stripMargin
    },

    // q231's unrolled K-step walk once per chain (full + one per
    // removed channel: edges touching c deleted, no renormalization);
    // p = session-start-weighted reach, target starts count 10000
    "q292_markov_attribution" -> {
      val tgt = Queries.AbsorbTarget
      val steps = Queries.AbsorbSteps
      val chans = Queries.AttributionChannels
      def walk(tag: String, edgeFilter: String): String = {
        def round(r: Int): String =
          s"""h${r}_$tag AS (
             |  SELECT m.prev_type AS start_type,
             |         CAST(SUM(m.prob_bp * a.a_bp // 10000) AS BIGINT)
             |           AS hop_bp
             |  FROM m_$tag m JOIN a${r - 1}_$tag a
             |    ON a.start_type = m.next_type
             |  WHERE m.next_type <> '$tgt' GROUP BY 1),
             |a${r}_$tag AS (
             |  SELECT a1.start_type,
             |         CAST(a1.a_bp + COALESCE(h.hop_bp, 0) AS BIGINT) AS a_bp
             |  FROM a1_$tag a1
             |  LEFT JOIN h${r}_$tag h ON h.start_type = a1.start_type)"""
            .stripMargin
        s"""m_$tag AS (
           |  SELECT prev_type, next_type, prob_bp FROM m0 $edgeFilter),
           |a1_$tag AS (
           |  SELECT p.start_type, CAST(COALESCE(d.prob_bp, 0) AS BIGINT)
           |           AS a_bp
           |  FROM (SELECT DISTINCT prev_type AS start_type FROM m_$tag) p
           |  LEFT JOIN (SELECT prev_type AS start_type, prob_bp FROM m_$tag
           |             WHERE next_type = '$tgt') d
           |    ON d.start_type = p.start_type),
           |${(2 to steps).map(round).mkString(",\n")}""".stripMargin
      }
      def pCte(tag: String, excluded: Option[String]): String = {
        val exCase = excluded
          .map(c => s"WHEN s.start_type = '$c' THEN 0")
          .getOrElse("")
        s"""p_$tag AS (
           |  SELECT CAST(SUM(s.n * CASE WHEN s.start_type = '$tgt'
           |                 THEN 10000 $exCase
           |                 ELSE COALESCE(a.a_bp, 0) END)
           |         // SUM(s.n) AS BIGINT) AS p_bp
           |  FROM starts s
           |  LEFT JOIN a${steps}_$tag a ON a.start_type = s.start_type)"""
          .stripMargin
      }
      val chainCtes = (walk("full", "") +: chans.map(c =>
        walk(c, s"WHERE prev_type <> '$c' AND next_type <> '$c'")))
        .mkString(",\n")
      val pCtes = (pCte("full", None) +: chans.map(c => pCte(c, Some(c))))
        .mkString(",\n")
      val chRows = chans.map(c =>
        s"SELECT '$c' AS channel, p_bp FROM p_$c").mkString("\nUNION ALL\n")
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |starts AS (
         |  SELECT event_type AS start_type, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM st WHERE prev_type IS NULL GROUP BY 1),
         |tr AS (
         |  SELECT prev_type, event_type AS next_type,
         |         CAST(COUNT(*) AS BIGINT) AS transitions
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |tot AS (
         |  SELECT prev_type, CAST(SUM(transitions) AS BIGINT) AS from_total
         |  FROM tr GROUP BY 1),
         |m0 AS (
         |  SELECT tr.prev_type, tr.next_type,
         |         CAST(tr.transitions * 10000 // tot.from_total AS BIGINT)
         |           AS prob_bp
         |  FROM tr JOIN tot USING (prev_type)),
         |$chainCtes,
         |$pCtes,
         |ch AS (
         |$chRows),
         |rel AS (
         |  SELECT ch.channel, pf.p_bp AS p_full_bp, ch.p_bp AS p_removed_bp,
         |         CASE WHEN pf.p_bp > 0
         |              THEN CAST(FLOOR(10000.0 * (pf.p_bp - ch.p_bp)
         |                / pf.p_bp) AS BIGINT)
         |         END AS removal_bp
         |  FROM ch, p_full pf)
         |SELECT channel, p_full_bp, p_removed_bp, removal_bp,
         |       CASE WHEN SUM(removal_bp) OVER () > 0
         |            THEN CAST(FLOOR(10000.0 * removal_bp /
         |              SUM(removal_bp) OVER ()) AS BIGINT)
         |       END AS credit_bp
         |FROM rel
         |ORDER BY removal_bp DESC, channel""".stripMargin
    },

    // q287's kernel chain + a TRAIN-half dow index (leakage rule:
    // eval days never inform the index); report = 2 model rows
    "q293_seasonal_brown" -> {
      val w = Queries.EwmaWindowDays
      val denom = (1L << w) - 1L
      def ker(src: String, v: String, out: String) =
        s"""  SELECT a.daynum,
           |         CAST(SUM(b.$v * (CAST(1 AS BIGINT) <<
           |           CAST(${w - 1} - (a.daynum - b.daynum) AS INT)))
           |           // $denom AS BIGINT) AS $out
           |  FROM $src a JOIN $src b
           |    ON b.daynum BETWEEN a.daynum - ${w - 1} AND a.daynum
           |  GROUP BY 1""".stripMargin
      def rpt(model: String, fc: String) =
        s"""SELECT '$model' AS model, CAST(COUNT(*) AS BIGINT) AS n_days,
           |       CAST(SUM(abs($fc - next_cents)) // COUNT(*) AS BIGINT)
           |         AS mae_cents,
           |       CASE WHEN SUM(next_cents) > 0
           |            THEN CAST((10000 * SUM(abs($fc - next_cents)))
           |              // SUM(next_cents) AS BIGINT)
           |       END AS wmape_bp
           |FROM ev""".stripMargin
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |bounds AS (
         |  SELECT MIN(daynum) AS mn, MAX(daynum) AS mx,
         |         MIN(daynum) + (MAX(daynum) - MIN(daynum)) // 2 AS mid
         |  FROM d),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT mn FROM bounds),
         |           (SELECT mx FROM bounds))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |s1 AS (
         |${ker("dense", "cents", "s1")}),
         |s1c AS (
         |  SELECT dense.daynum, dense.cents, s1.s1
         |  FROM dense JOIN s1 USING (daynum)),
         |s2 AS (
         |${ker("s1c", "s1", "s2")}),
         |panel AS (
         |  SELECT s1c.daynum, s1c.cents,
         |         greatest(3 * s1c.s1 - 2 * s2.s2, 0) AS f,
         |         lead(s1c.cents) OVER (ORDER BY s1c.daynum) AS next_cents,
         |         (s1c.daynum + 1) % 7 AS next_dow
         |  FROM s1c JOIN s2 USING (daynum)),
         |tr AS (
         |  SELECT * FROM dense, bounds WHERE daynum <= mid),
         |ov AS (SELECT CAST(SUM(cents) // COUNT(*) AS BIGINT) AS m FROM tr),
         |idx AS (
         |  SELECT daynum % 7 AS next_dow,
         |         CASE WHEN ov.m > 0
         |              THEN CAST((10000 * (SUM(cents) // COUNT(*))) // ov.m
         |                AS BIGINT)
         |              ELSE 10000 END AS idx_bp
         |  FROM tr, ov GROUP BY 1, ov.m),
         |ev AS (
         |  SELECT panel.*, CAST((f * idx.idx_bp) // 10000 AS BIGINT)
         |           AS f_dow
         |  FROM panel JOIN idx USING (next_dow), bounds
         |  WHERE panel.daynum > bounds.mid AND next_cents IS NOT NULL)
         |${rpt("brown", "f")}
         |UNION ALL
         |${rpt("brown_dow", "f_dow")}
         |ORDER BY model""".stripMargin
    },

    // windows-only twin of the pair-free credit computation: fsum is
    // the session-constant first-touch mass, msum the RANGE-frame
    // suffix sum of middle rates, lead reads the closing touch.
    "q294_position_attribution" ->
      s"""$sessionCte, b AS (
         |  SELECT user_id, session_seq, event_type,
         |         row_number() OVER w AS seq,
         |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
         |           AS is_conv
         |  FROM sz
         |  WINDOW w AS (PARTITION BY user_id, session_seq
         |               ORDER BY ts_us, event_id)),
         |wd AS (
         |  SELECT event_type, seq, is_conv,
         |         SUM(CASE WHEN is_conv = 1 AND seq >= 2 THEN
         |               CASE WHEN seq = 2 THEN 10000
         |                    WHEN seq = 3 THEN 5000 ELSE 4000 END
         |             ELSE 0 END) OVER (PARTITION BY user_id, session_seq)
         |           AS fsum,
         |         lead(is_conv) OVER (PARTITION BY user_id, session_seq
         |                             ORDER BY seq) AS nxt_conv,
         |         SUM(CASE WHEN is_conv = 1 AND seq >= 4 THEN
         |               CAST(FLOOR(2000.0 / (seq - 3)) AS BIGINT)
         |             ELSE 0 END)
         |           OVER (PARTITION BY user_id, session_seq ORDER BY seq
         |                 RANGE BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING)
         |           AS msum
         |  FROM b),
         |credits AS (
         |  SELECT event_type AS channel,
         |         (CASE WHEN seq = 1 THEN fsum ELSE 0 END)
         |         + (CASE WHEN seq >= 2 AND nxt_conv = 1 THEN
         |              CASE WHEN seq = 2 THEN 5000 ELSE 4000 END
         |            ELSE 0 END)
         |         + (CASE WHEN seq >= 2 THEN COALESCE(msum, 0) ELSE 0 END)
         |           AS credit
         |  FROM wd
         |  UNION ALL
         |  SELECT 'direct', 10000 FROM wd WHERE is_conv = 1 AND seq = 1),
         |g AS (
         |  SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_bp
         |  FROM credits GROUP BY 1 HAVING SUM(credit) > 0)
         |SELECT channel, credit_bp,
         |       CAST(FLOOR(10000.0 * credit_bp /
         |         SUM(credit_bp) OVER ()) AS BIGINT) AS share_bp
         |FROM g ORDER BY channel""".stripMargin,

    // exact D via cross-multiplied cumulative counts; the squared
    // rejection bound runs in HUGEINT (Spark side: DECIMAL(38,0)).
    "q295_ks_test" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT m, CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |            THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, m, md5(CAST(user_id AS VARCHAR)) AS draw
         |        FROM u)),
         |v AS (
         |  SELECT m,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |           AS ca,
         |         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         |           AS cb
         |  FROM a GROUP BY 1),
         |w AS (
         |  SELECT SUM(ca) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum_a,
         |         SUM(cb) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS cum_b,
         |         SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
         |  FROM v),
         |d AS (
         |  SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
         |         CAST(MAX(n_b) AS BIGINT) AS n_b,
         |         CAST(MAX(ABS(cum_a * n_b - cum_b * n_a)) AS BIGINT) AS d_num
         |  FROM w)
         |SELECT n_a, n_b, d_num,
         |       CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * d_num / (n_a * n_b)) AS BIGINT)
         |       END AS d_bp,
         |       CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
         |            ELSE CAST(1000000 * CAST(d_num AS HUGEINT) * d_num >
         |              1844164 * CAST(n_a + n_b AS HUGEINT) * n_a * n_b
         |              AS INT)
         |       END AS reject_05
         |FROM d""".stripMargin
    },

    // every counter rebuilt nibble-by-nibble: row j's bucket = md5
    // hex chars 2j+1..2j+2 (8 bits), the bucketOf convention.
    "q296_cms_check" -> {
      val nib = (p: String) =>
        s"(instr('0123456789abcdef', substr(d, $p, 1)) - 1)"
      s"""WITH c AS (
         |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
         |        FROM documents WHERE text IS NOT NULL)
         |  GROUP BY 1),
         |h AS (SELECT tok, cnt, md5(tok) AS d FROM c),
         |f AS (
         |  SELECT tok, cnt, j.row_id,
         |         ${nib("2 * j.row_id + 1")} * 16
         |           + ${nib("2 * j.row_id + 2")} AS bucket
         |  FROM h, (SELECT unnest(range(0, ${CountMin.Rows})) AS row_id) j),
         |sk AS (
         |  SELECT row_id, bucket, CAST(SUM(cnt) AS BIGINT) AS cc
         |  FROM f GROUP BY 1, 2),
         |p AS (SELECT tok, cnt, md5(tok) AS d FROM c
         |      ORDER BY cnt DESC, tok ASC LIMIT 20),
         |pf AS (
         |  SELECT tok, cnt, j.row_id,
         |         ${nib("2 * j.row_id + 1")} * 16
         |           + ${nib("2 * j.row_id + 2")} AS bucket
         |  FROM p, (SELECT unnest(range(0, ${CountMin.Rows})) AS row_id) j),
         |est AS (
         |  SELECT pf.tok, pf.cnt, CAST(MIN(sk.cc) AS BIGINT) AS est_cnt
         |  FROM pf JOIN sk USING (row_id, bucket) GROUP BY 1, 2),
         |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tokens FROM c)
         |SELECT tok AS token, cnt AS exact_cnt, est_cnt,
         |       est_cnt - cnt AS over_cnt,
         |       CAST(est_cnt - cnt <=
         |         CAST(FLOOR(2.718281828 * n_tokens / ${CountMin.Width})
         |           AS BIGINT) AS INT) AS bound_ok
         |FROM est, n
         |ORDER BY exact_cnt DESC, token""".stripMargin
    },

    // tier is nondecreasing, so version order (valid_from_us, tier)
    // is event order even when two crossings share a timestamp.
    "q297_scd2_history" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM events),
         |t AS (
         |  SELECT user_id, ts_us, event_id,
         |         ${scdTierSql("cum")} AS tier
         |  FROM e),
         |c AS (
         |  SELECT *, lag(tier) OVER (PARTITION BY user_id
         |                            ORDER BY ts_us, event_id) AS prev
         |  FROM t),
         |ch AS (
         |  SELECT user_id, tier, ts_us AS valid_from_us
         |  FROM c WHERE prev IS NULL OR tier <> prev)
         |SELECT user_id, tier, valid_from_us,
         |       lead(valid_from_us) OVER (PARTITION BY user_id
         |         ORDER BY valid_from_us, tier) - 1 AS valid_to_us
         |FROM ch""".stripMargin,

    // interval-join twin of the as-of read: degenerate zero-width
    // versions (two crossings on one timestamp) match nothing, so the
    // highest tier at the instant wins — exactly the Spark tie-break.
    "q298_scd2_revenue" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value,
         |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM events),
         |t AS (
         |  SELECT user_id, ts_us, event_id, event_type, value,
         |         ${scdTierSql("cum")} AS tier
         |  FROM e),
         |c AS (
         |  SELECT *, lag(tier) OVER (PARTITION BY user_id
         |                            ORDER BY ts_us, event_id) AS prev
         |  FROM t),
         |hist AS (
         |  SELECT user_id, tier, valid_from_us,
         |         lead(valid_from_us) OVER (PARTITION BY user_id
         |           ORDER BY valid_from_us, tier) - 1 AS valid_to_us
         |  FROM (SELECT user_id, tier, ts_us AS valid_from_us
         |        FROM c WHERE prev IS NULL OR tier <> prev)),
         |purch AS (
         |  SELECT user_id, ts_us, value FROM t WHERE event_type = 'purchase'),
         |rd AS (
         |  SELECT p.user_id, p.value, h.tier
         |  FROM purch p LEFT JOIN hist h
         |    ON p.user_id = h.user_id AND p.ts_us >= h.valid_from_us
         |    AND (h.valid_to_us IS NULL OR p.ts_us <= h.valid_to_us))
         |SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |       CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
         |         AS revenue_cents
         |FROM rd GROUP BY 1 ORDER BY tier""".stripMargin,

    // q91's transition CTEs + the flog2 surprisal sum (q126 bit
    // convention): total_bits = sum c*floor(log2(n/c)).
    "q299_transition_entropy" ->
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |tr AS (
         |  SELECT prev_type, event_type AS next_type,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |wt AS (
         |  SELECT prev_type, c,
         |         CAST(SUM(c) OVER (PARTITION BY prev_type) AS BIGINT) AS n
         |  FROM tr),
         |b AS (
         |  SELECT prev_type, c, n,
         |         CAST(${flog2rSql("n", "c")} AS BIGINT) AS bits
         |  FROM wt)
         |SELECT prev_type, CAST(MAX(n) AS BIGINT) AS n_transitions,
         |       CAST(SUM(c * bits) AS BIGINT) AS total_bits,
         |       CAST(FLOOR(1000.0 * SUM(c * bits) / MAX(n)) AS BIGINT)
         |         AS avg_bits_milli
         |FROM b GROUP BY 1 ORDER BY prev_type""".stripMargin,

    // the 4 LPA sweeps unrolled symbolically (the q52 kmeans
    // convention); weighted edges from the q93 pair CTEs.
    "q300_label_prop" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val rounds = (1 to Queries.LpRounds).map { i =>
        s"""s$i AS (
           |  SELECT e.dst AS item, l.label, CAST(SUM(e.w) AS BIGINT) AS score
           |  FROM edgw e JOIN l${i - 1} l ON e.src = l.item GROUP BY 1, 2),
           |l$i AS (
           |  SELECT item, label FROM (
           |    SELECT item, label, ROW_NUMBER() OVER (PARTITION BY item
           |      ORDER BY score DESC, label ASC) AS rn FROM s$i)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""$sessionCte,
         |${coVisEdgesCte(cap, ms)},
         |edgw AS (
         |  SELECT item_a AS src, item_b AS dst, w FROM pairs WHERE w >= $ms
         |  UNION ALL
         |  SELECT item_b, item_a, w FROM pairs WHERE w >= $ms),
         |l0 AS (SELECT DISTINCT src AS item, src AS label FROM edgw),
         |$rounds
         |SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM l${Queries.LpRounds} GROUP BY 1
         |ORDER BY n_items DESC, community""".stripMargin
    },

    // HUGEINT cross-products; truncated (//) mean and ratio — the
    // Spark side's decimal DIV convention, pinned negative-safe.
    "q301_autocorrelation" -> {
      val lags = Queries.AutocorrLags
      val leads = lags.map(l =>
        s"lead(dev, $l) OVER (ORDER BY daynum) AS d$l").mkString(",\n|         ")
      val sums = lags.map(l =>
        s"""SUM(CASE WHEN d$l IS NOT NULL
           |             THEN CAST(dev AS HUGEINT) * d$l ELSE 0 END) AS n$l,
           |         CAST(SUM(CASE WHEN d$l IS NOT NULL THEN 1 ELSE 0 END)
           |           AS BIGINT) AS c$l""".stripMargin).mkString(",\n         ")
      val rows = lags.map(l =>
        s"""SELECT CAST($l AS BIGINT) AS lag_days, c$l AS n_pairs,
           |       CASE WHEN den > 0
           |            THEN CAST((10000 * n$l) // den AS BIGINT) END AS r_bp
           |FROM t""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |m AS (SELECT CAST(SUM(cents) AS BIGINT) // COUNT(*) AS m FROM dense),
         |v AS (SELECT daynum, cents - m.m AS dev FROM dense, m),
         |w AS (
         |  SELECT dev,
         |         $leads
         |  FROM v),
         |t AS (
         |  SELECT SUM(CAST(dev AS HUGEINT) * dev) AS den,
         |         $sums
         |  FROM w)
         |$rows
         |ORDER BY lag_days""".stripMargin
    },

    // the K power sweeps unrolled symbolically (q52 convention); every
    // sweep is B'v = n·Σq(q·v) − s(s·v) at (vec, dim) long format,
    // renormalized to max|v|=1000 by // (truncation — Spark DIV twin)
    "q302_power_iteration" -> {
      val d = Queries.AnisotropyDim
      val k = Queries.PowerIters
      val sweeps = (1 to k).map { j =>
        s"""p$j AS (
           |  SELECT pos.vec_id,
           |         CAST(SUM(CAST(pos.qv AS HUGEINT) * v${j - 1}.v) AS HUGEINT)
           |           AS p
           |  FROM pos JOIN v${j - 1} USING (i) GROUP BY 1),
           |qp$j AS (
           |  SELECT pos.i,
           |         CAST(SUM(CAST(pos.qv AS HUGEINT) * p$j.p) AS HUGEINT) AS qp
           |  FROM pos JOIN p$j USING (vec_id) GROUP BY 1),
           |sv$j AS (
           |  SELECT CAST(SUM(CAST(dims.s AS HUGEINT) * v${j - 1}.v)
           |           AS HUGEINT) AS sv
           |  FROM dims JOIN v${j - 1} USING (i)),
           |w$j AS (
           |  SELECT qp$j.i, nn.n * qp$j.qp - dims.s * sv$j.sv AS w
           |  FROM qp$j JOIN dims USING (i), nn, sv$j),
           |m$j AS (SELECT MAX(ABS(w)) AS m FROM w$j),
           |v$j AS (
           |  SELECT i, CASE WHEN m$j.m = 0 THEN CAST(1000 AS HUGEINT)
           |                 ELSE (1000 * w) // m$j.m END AS v
           |  FROM w$j, m$j)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding,
         |           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))
         |           AS q
         |  FROM embeddings
         |  WHERE embedding IS NOT NULL AND len(embedding) = $d),
         |pos AS (
         |  SELECT vec_id, unnest(q) AS qv,
         |         unnest(range(1, len(q) + 1)) AS i
         |  FROM e),
         |dims AS (
         |  SELECT i, CAST(SUM(qv) AS HUGEINT) AS s,
         |         CAST(SUM(qv * qv) AS HUGEINT) AS ss
         |  FROM pos GROUP BY 1),
         |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM e),
         |v0 AS (SELECT unnest(range(1, $d + 1)) AS i,
         |              CAST(1000 AS HUGEINT) AS v),
         |$sweeps,
         |pf AS (
         |  SELECT pos.vec_id,
         |         CAST(SUM(CAST(pos.qv AS HUGEINT) * v$k.v) AS HUGEINT) AS p
         |  FROM pos JOIN v$k USING (i) GROUP BY 1),
         |svf AS (
         |  SELECT CAST(SUM(CAST(dims.s AS HUGEINT) * v$k.v) AS HUGEINT) AS sv
         |  FROM dims JOIN v$k USING (i)),
         |vtv AS (SELECT CAST(SUM(v * v) AS HUGEINT) AS t FROM v$k),
         |st AS (
         |  SELECT CAST(SUM(nn.n * ss - s * s) AS HUGEINT) AS bprime
         |  FROM dims, nn),
         |ag AS (SELECT CAST(SUM(p * p) AS HUGEINT) AS spp FROM pf),
         |fin AS (
         |  SELECT CAST(nn.n AS BIGINT) AS n_vecs,
         |         CAST($d AS INT) AS n_dims,
         |         CAST($k AS INT) AS iters,
         |         CASE WHEN vtv.t = 0 OR st.bprime = 0 THEN NULL
         |              ELSE CAST((10000 * (nn.n * ag.spp - svf.sv * svf.sv))
         |                // (vtv.t * st.bprime) AS BIGINT)
         |         END AS top_share_bp,
         |         CAST(${10000L / d} AS BIGINT) AS isotropy_bp
         |  FROM nn, vtv, st, ag, svf)
         |SELECT *,
         |       CASE WHEN top_share_bp IS NULL THEN NULL
         |            ELSE CAST((1000 * top_share_bp) // isotropy_bp
         |              AS BIGINT)
         |       END AS excess_milli
         |FROM fin""".stripMargin
    },

    // bit-length bands via format('{:b}') (the flog2 convention);
    // both walks share the q73 nearest-rank rule (n·p+9999)//10000
    "q303_sketch_quantiles" -> {
      val ranks = Seq(5000L, 9000L, 9900L).mkString(", ")
      s"""WITH h AS (
         |  SELECT l_returnflag AS g,
         |         CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
         |q AS (SELECT unnest([$ranks]) AS rank_bp),
         |e AS (
         |  SELECT g, cents, cnt,
         |         SUM(cnt) OVER (PARTITION BY g ORDER BY cents) AS cum,
         |         SUM(cnt) OVER (PARTITION BY g) AS n
         |  FROM h),
         |ex AS (
         |  SELECT g, rank_bp, CAST(MIN(n) AS BIGINT) AS n_rows,
         |         CAST(MIN(CASE WHEN cum >= (n * rank_bp + 9999) // 10000
         |                       THEN cents END) AS BIGINT) AS exact_cents
         |  FROM e, q GROUP BY 1, 2),
         |b AS (
         |  SELECT g,
         |         CASE WHEN cents <= 0 THEN 0
         |              ELSE CAST(length(format('{:b}', cents)) AS INT)
         |         END AS band,
         |         CAST(SUM(cnt) AS BIGINT) AS bcnt
         |  FROM h GROUP BY 1, 2),
         |bc AS (
         |  SELECT g, band, bcnt,
         |         SUM(bcnt) OVER (PARTITION BY g ORDER BY band) AS cumb,
         |         SUM(bcnt) OVER (PARTITION BY g) AS n
         |  FROM b),
         |bq AS (
         |  SELECT g, rank_bp,
         |         CAST(MIN(CASE WHEN cumb >= (n * rank_bp + 9999) // 10000
         |                       THEN band END) AS INT) AS sk_band
         |  FROM bc, q GROUP BY 1, 2),
         |j AS (
         |  SELECT ex.g AS l_returnflag, ex.rank_bp, ex.n_rows,
         |         ex.exact_cents, bq.sk_band,
         |         CASE WHEN bq.sk_band = 0 THEN 0
         |              ELSE (CAST(1 AS BIGINT) << (bq.sk_band - 1))
         |         END AS sk_lo_cents,
         |         CASE WHEN bq.sk_band = 0 THEN 0
         |              ELSE (CAST(1 AS BIGINT) << bq.sk_band) - 1
         |         END AS sk_hi_cents
         |  FROM ex JOIN bq ON ex.g = bq.g AND ex.rank_bp = bq.rank_bp)
         |SELECT l_returnflag, CAST(rank_bp AS BIGINT) AS rank_bp, n_rows,
         |       exact_cents, sk_band, sk_lo_cents, sk_hi_cents,
         |       CAST(exact_cents BETWEEN sk_lo_cents AND sk_hi_cents AS INT)
         |         AS within,
         |       CAST(((sk_hi_cents - sk_lo_cents) * 10000)
         |         // GREATEST(sk_lo_cents, 1) AS BIGINT) AS rel_width_bp
         |FROM j ORDER BY l_returnflag, rank_bp""".stripMargin
    },

    "q304_path_trigrams" ->
      s"""$sessionCte,
         |st AS (
         |  SELECT event_type,
         |         lead(event_type, 1) OVER w AS t1,
         |         lead(event_type, 2) OVER w AS t2
         |  FROM sz
         |  WINDOW w AS (PARTITION BY user_id, session_seq
         |               ORDER BY ts_us, event_id)),
         |g AS (
         |  SELECT event_type AS step1, t1 AS step2, t2 AS step3,
         |         CAST(COUNT(*) AS BIGINT) AS n_paths
         |  FROM st WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         |  GROUP BY 1, 2, 3)
         |SELECT step1, step2, step3, n_paths,
         |       CAST(FLOOR(10000.0 * n_paths / SUM(n_paths) OVER ())
         |         AS BIGINT) AS share_bp
         |FROM g
         |ORDER BY n_paths DESC, step1, step2, step3
         |LIMIT ${Queries.TrigramTopK}""".stripMargin,

    // q297's history CTEs + a month-end cut spine built from the
    // history's own bounds; containment join at version grain
    "q305_scd2_census" ->
      s"""WITH e AS (
         |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         |                 ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM events),
         |t AS (
         |  SELECT user_id, ts_us, event_id,
         |         ${scdTierSql("cum")} AS tier
         |  FROM e),
         |c AS (
         |  SELECT *, lag(tier) OVER (PARTITION BY user_id
         |                            ORDER BY ts_us, event_id) AS prev
         |  FROM t),
         |hist AS (
         |  SELECT user_id, tier, valid_from_us,
         |         lead(valid_from_us) OVER (PARTITION BY user_id
         |           ORDER BY valid_from_us, tier) - 1 AS valid_to_us
         |  FROM (SELECT user_id, tier, ts_us AS valid_from_us
         |        FROM c WHERE prev IS NULL OR tier <> prev)),
         |bounds AS (
         |  SELECT MIN(epoch_us(ts)) // 86400000000 AS mnd,
         |         MAX(epoch_us(ts)) // 86400000000 AS mxd
         |  FROM events WHERE ts IS NOT NULL),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT mnd FROM bounds),
         |           (SELECT mxd FROM bounds))) AS daynum),
         |cuts AS (
         |  SELECT strftime(d, '%Y-%m-%d') AS snapshot_day,
         |         (daynum + 1) * 86400000000 - 1 AS cut_us
         |  FROM (SELECT daynum, DATE '1970-01-01' + CAST(daynum AS INT) AS d
         |        FROM sp)
         |  WHERE last_day(d) = d OR daynum = (SELECT mxd FROM bounds))
         |SELECT cuts.snapshot_day, hist.tier,
         |       CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM hist JOIN cuts
         |  ON hist.valid_from_us <= cuts.cut_us
         | AND (hist.valid_to_us IS NULL OR hist.valid_to_us >= cuts.cut_us)
         |GROUP BY 1, 2 ORDER BY snapshot_day, tier""".stripMargin,

    // the true join size is a key-grain Σ cl·cr, never a row join;
    // HUGEINT arithmetic, // quotients (Spark decimal DIV twin)
    "q306_join_cardinality" ->
      s"""WITH la AS (
         |  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cl
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |ra AS (
         |  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cr
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |ls AS (SELECT CAST(SUM(cl) AS BIGINT) AS n_left,
         |              CAST(COUNT(*) AS BIGINT) AS ndv_left FROM la),
         |rs AS (SELECT CAST(SUM(cr) AS BIGINT) AS n_right,
         |              CAST(COUNT(*) AS BIGINT) AS ndv_right FROM ra),
         |ac AS (
         |  SELECT COALESCE(SUM(CAST(cl AS HUGEINT) * cr), 0) AS actual_rows
         |  FROM la JOIN ra USING (k)),
         |f AS (
         |  SELECT ls.n_left, rs.n_right, ls.ndv_left, rs.ndv_right,
         |         CAST(ac.actual_rows AS BIGINT) AS actual_rows,
         |         CAST((CAST(ls.n_left AS HUGEINT) * rs.n_right)
         |           // GREATEST(ls.ndv_left, rs.ndv_right) AS BIGINT)
         |           AS predicted_rows
         |  FROM ls, rs, ac)
         |SELECT n_left, n_right, ndv_left, ndv_right, actual_rows,
         |       predicted_rows,
         |       CASE WHEN actual_rows = 0 OR predicted_rows = 0 THEN NULL
         |            ELSE CAST((1000 * CAST(GREATEST(actual_rows,
         |                   predicted_rows) AS HUGEINT))
         |              // LEAST(actual_rows, predicted_rows) AS BIGINT)
         |       END AS q_error_milli,
         |       CAST(predicted_rows < actual_rows AS INT) AS underestimated
         |FROM f""".stripMargin,

    // dense-spine moves, zero ties dropped; the verdict is the
    // all-integer 10^4·A²·(n−1) > 38416·2m·(2m−n) compare in HUGEINT
    "q307_runs_test" ->
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |mv AS (
         |  SELECT daynum,
         |         cents - lag(cents) OVER (ORDER BY daynum) AS mv
         |  FROM dense),
         |sg AS (
         |  SELECT daynum, CASE WHEN mv > 0 THEN 1 ELSE -1 END AS s
         |  FROM mv WHERE mv IS NOT NULL AND mv <> 0),
         |ch AS (
         |  SELECT s, CASE WHEN s <> lag(s) OVER (ORDER BY daynum)
         |                 THEN 1 ELSE 0 END AS chg
         |  FROM sg),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_up,
         |         CAST(1 + COALESCE(SUM(chg), 0) AS BIGINT) AS n_runs
         |  FROM ch),
         |f AS (
         |  SELECT n AS n_moves, n_up, n - n_up AS n_down, n_runs,
         |         2 * n_up * (n - n_up) AS m2
         |  FROM t)
         |SELECT n_moves, n_up, n_down, n_runs,
         |       CASE WHEN n_moves = 0 THEN NULL
         |            ELSE CAST((1000 * (n_moves + m2)) // n_moves AS BIGINT)
         |       END AS expected_runs_milli,
         |       CASE WHEN m2 = 0 OR n_moves < 2 THEN NULL
         |            ELSE CAST(10000 *
         |                   CAST(n_moves * n_runs - n_moves - m2 AS HUGEINT)
         |                   * (n_moves * n_runs - n_moves - m2)
         |                   * (n_moves - 1)
         |                 > 38416 * CAST(m2 AS HUGEINT) * (m2 - n_moves)
         |                 AS INT)
         |       END AS reject_05
         |FROM f""".stripMargin,

    // q72's labeled scoring chain without the label-inequality filter;
    // majority vote (votes desc, label asc) then a per-class rollup
    "q308_knn_label_acc" ->
      s"""WITH $embQuantCte,
         |lab AS (
         |  SELECT n.vec_id, e.label, n.q, n.n2
         |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id),
         |queries AS (
         |  SELECT vec_id AS query_id, label AS q_label, q AS q_q, n2 AS q_n2
         |  FROM lab WHERE vec_id % ${Queries.KnnQueryMod} = 0),
         |scored AS (
         |  SELECT lab.vec_id AS neighbor_id, lab.label, queries.query_id,
         |         queries.q_label,
         |         CAST(list_sum(list_transform(range(1, len(lab.q) + 1),
         |              i -> lab.q[i] * queries.q_q[i])) AS BIGINT) AS dot,
         |         lab.n2, queries.q_n2
         |  FROM lab, queries WHERE lab.vec_id != queries.query_id),
         |c AS (
         |  SELECT query_id, q_label, neighbor_id, label,
         |         CASE WHEN n2 = 0 OR q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot /
         |                (sqrt(CAST(n2 AS DOUBLE)) * sqrt(CAST(q_n2 AS DOUBLE))))
         |                AS BIGINT)
         |         END AS cos_bp
         |  FROM scored),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM c),
         |votes AS (
         |  SELECT query_id, q_label, label, CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM ranked WHERE rank <= 10 GROUP BY 1, 2, 3),
         |pred AS (
         |  SELECT query_id, q_label, label,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY votes DESC, label ASC) AS vr
         |  FROM votes)
         |SELECT q_label AS label, CAST(COUNT(*) AS BIGINT) AS n_probes,
         |       CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_correct,
         |       CAST(FLOOR(10000.0 *
         |         SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
         |         / COUNT(*)) AS BIGINT) AS acc_bp
         |FROM pred WHERE vr = 1
         |GROUP BY 1 ORDER BY label""".stripMargin,

    // per-month equi-depth tiers at VALUE grain (q203 rule); the
    // migration join runs at (user, month) grain; to_tier 0 = churned
    "q309_tier_migration" -> {
      val nb = Queries.MigrationBins
      s"""WITH um AS (
         |  SELECT o_custkey AS user_id,
         |         (EXTRACT(year FROM CAST(o_orderdate AS DATE)) - 1970) * 12
         |           + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1 AS mon,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
         |vals AS (
         |  SELECT mon, cents,
         |         CAST((SUM(cnt) OVER (PARTITION BY mon ORDER BY cents) - 1)
         |           * $nb // (SUM(cnt) OVER (PARTITION BY mon)) + 1 AS BIGINT)
         |           AS tier
         |  FROM (SELECT mon, cents, COUNT(*) AS cnt
         |        FROM um GROUP BY 1, 2)),
         |binned AS (
         |  SELECT um.user_id, um.mon, vals.tier
         |  FROM um JOIN vals USING (mon, cents)),
         |mx AS (SELECT MAX(mon) AS mxm FROM binned),
         |nxt AS (SELECT user_id, mon - 1 AS mon, tier AS to_tier
         |        FROM binned),
         |fr AS (
         |  SELECT b.user_id, b.mon, b.tier AS from_tier
         |  FROM binned b, mx WHERE b.mon < mx.mxm),
         |j AS (
         |  SELECT fr.from_tier, COALESCE(nxt.to_tier, 0) AS to_tier
         |  FROM fr LEFT JOIN nxt USING (user_id, mon)),
         |g AS (
         |  SELECT from_tier, to_tier, CAST(COUNT(*) AS BIGINT) AS n_users
         |  FROM j GROUP BY 1, 2)
         |SELECT from_tier, to_tier, n_users,
         |       CAST(FLOOR(10000.0 * n_users /
         |         SUM(n_users) OVER (PARTITION BY from_tier)) AS BIGINT)
         |         AS share_bp
         |FROM g ORDER BY from_tier, to_tier""".stripMargin
    },

    // matched base basket; per-part rationals floor once via //;
    // HUGEINT sums; Fisher = floor(sqrt(L*P)) — IEEE sqrt exact
    "q310_price_index" ->
      s"""WITH pm AS (
         |  SELECT l_partkey,
         |         (EXTRACT(year FROM CAST(l_shipdate AS DATE)) - 1970) * 12
         |           + EXTRACT(month FROM CAST(l_shipdate AS DATE)) - 1 AS mon,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS ext_cents,
         |         CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT))
         |           AS BIGINT) AS qty_centi
         |  FROM lineitem
         |  WHERE l_shipdate IS NOT NULL AND l_quantity > 0
         |  GROUP BY 1, 2),
         |base AS (
         |  SELECT l_partkey, ext_cents AS ext0, qty_centi AS qty0
         |  FROM pm WHERE mon = (SELECT MIN(mon) FROM pm)),
         |j AS (
         |  SELECT pm.mon,
         |         (pm.ext_cents * base.qty0) // pm.qty_centi AS lasp_num,
         |         base.ext0,
         |         pm.ext_cents,
         |         (base.ext0 * pm.qty_centi) // base.qty0 AS paas_den
         |  FROM pm JOIN base USING (l_partkey)),
         |g AS (
         |  SELECT mon, CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
         |         SUM(CAST(lasp_num AS HUGEINT)) AS ln,
         |         SUM(CAST(ext0 AS HUGEINT)) AS ld,
         |         SUM(CAST(ext_cents AS HUGEINT)) AS pn,
         |         SUM(CAST(paas_den AS HUGEINT)) AS pd
         |  FROM j GROUP BY 1)
         |SELECT concat(CAST(1970 + mon // 12 AS VARCHAR), '-',
         |         lpad(CAST(mon % 12 + 1 AS VARCHAR), 2, '0')) AS month,
         |       n_matched_parts,
         |       CAST((10000 * ln) // ld AS BIGINT) AS laspeyres_bp,
         |       CASE WHEN pd = 0 THEN NULL
         |            ELSE CAST((10000 * pn) // pd AS BIGINT)
         |       END AS paasche_bp,
         |       CASE WHEN pd = 0 THEN NULL
         |            ELSE CAST(FLOOR(sqrt(CAST(
         |              ((10000 * ln) // ld) * ((10000 * pn) // pd)
         |              AS DOUBLE))) AS BIGINT)
         |       END AS fisher_bp
         |FROM g ORDER BY month""".stripMargin,

    // q287's kernel for the trend; dow means of the DETRENDED series
    // (negative-safe // both engines); HUGEINT variance sums
    "q311_variance_decomp" -> {
      val w = Queries.EwmaWindowDays
      val denom = (1L << w) - 1L
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |tr AS (
         |  SELECT a.daynum,
         |         CAST(SUM(b.cents * (CAST(1 AS BIGINT) <<
         |           CAST(${w - 1} - (a.daynum - b.daynum) AS INT)))
         |           // $denom AS BIGINT) AS trend
         |  FROM dense a JOIN dense b
         |    ON b.daynum BETWEEN a.daynum - ${w - 1} AND a.daynum
         |  GROUP BY 1),
         |det AS (
         |  SELECT dense.daynum, dense.cents,
         |         dense.cents - tr.trend AS det,
         |         dense.daynum % 7 AS dow
         |  FROM dense JOIN tr USING (daynum)),
         |sea AS (
         |  SELECT *,
         |         CAST(CAST(SUM(det) OVER (PARTITION BY dow) AS BIGINT)
         |           // COUNT(*) OVER (PARTITION BY dow) AS BIGINT) AS seas,
         |         CAST(CAST(SUM(cents) OVER () AS BIGINT)
         |           // COUNT(*) OVER () AS BIGINT) AS m_tot,
         |         CAST(CAST(SUM(det) OVER () AS BIGINT)
         |           // COUNT(*) OVER () AS BIGINT) AS m_det
         |  FROM det),
         |rm AS (
         |  SELECT *, det - seas AS rem,
         |         CAST(CAST(SUM(det - seas) OVER () AS BIGINT)
         |           // COUNT(*) OVER () AS BIGINT) AS m_rem
         |  FROM sea),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |         SUM(CAST(cents - m_tot AS HUGEINT) * (cents - m_tot))
         |           AS v_tot,
         |         SUM(CAST(det - m_det AS HUGEINT) * (det - m_det)) AS v_det,
         |         SUM(CAST(rem - m_rem AS HUGEINT) * (rem - m_rem)) AS v_rem
         |  FROM rm)
         |SELECT n_days,
         |       CASE WHEN v_tot = 0 THEN NULL
         |            ELSE CAST((10000 * (v_tot - v_det)) // v_tot AS BIGINT)
         |       END AS trend_share_bp,
         |       CASE WHEN v_tot = 0 THEN NULL
         |            ELSE CAST((10000 * (v_det - v_rem)) // v_tot AS BIGINT)
         |       END AS seasonal_share_bp,
         |       CASE WHEN v_tot = 0 THEN NULL
         |            ELSE CAST((10000 * v_rem) // v_tot AS BIGINT)
         |       END AS remainder_share_bp
         |FROM t""".stripMargin
    },

    // bloom membership = both 20-bit md5 hashes present in the build
    // side's bit SET (semantically identical to the Spark bitmap);
    // q279's nibble-parse hash convention
    "q312_bloom_semi" -> {
      val m = 131072L
      val nib = (pos: String) =>
        s"(instr('0123456789abcdef', substr(d, $pos, 1)) - 1)"
      def h20(start: Int) =
        s"""((${nib(s"$start")} * 65536 + ${nib(s"${start + 1}")} * 4096
           |  + ${nib(s"${start + 2}")} * 256 + ${nib(s"${start + 3}")} * 16
           |  + ${nib(s"${start + 4}")}) % $m)""".stripMargin
      s"""WITH bk AS (
         |  SELECT DISTINCT o_orderkey AS k FROM orders
         |  WHERE o_orderpriority = '1-URGENT' AND o_orderkey IS NOT NULL),
         |hb AS (SELECT k, md5(CAST(k AS VARCHAR)) AS d FROM bk),
         |bits AS (
         |  SELECT DISTINCT bit FROM (
         |    SELECT ${h20(1)} AS bit FROM hb
         |    UNION ALL
         |    SELECT ${h20(6)} FROM hb)),
         |f AS (
         |  SELECT l_orderkey AS fk, md5(CAST(l_orderkey AS VARCHAR)) AS d
         |  FROM lineitem WHERE l_orderkey IS NOT NULL),
         |t AS (SELECT fk, ${h20(1)} AS h1, ${h20(6)} AS h2 FROM f),
         |pass AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
         |         CAST(SUM(CASE WHEN h1 IN (SELECT bit FROM bits)
         |                        AND h2 IN (SELECT bit FROM bits)
         |                   THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass
         |  FROM t),
         |ex AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM f WHERE fk IN (SELECT k FROM bk)),
         |nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_build_keys FROM bk)
         |SELECT n_fact, n_build_keys, n_bloom_pass, n_exact,
         |       n_bloom_pass - n_exact AS false_pos_rows,
         |       CASE WHEN n_fact = n_exact THEN NULL
         |            ELSE CAST(FLOOR(10000.0 * (n_bloom_pass - n_exact)
         |              / (n_fact - n_exact)) AS BIGINT)
         |       END AS fp_rate_bp,
         |       CAST(FLOOR(10000.0 * n_exact / n_fact) AS BIGINT)
         |         AS exact_selectivity_bp
         |FROM pass, ex, nk""".stripMargin
    },

    // deviations from truncated means; HUGEINT sums; the cosBp-style
    // 10^4*N/(sqrt(Dx)*sqrt(Dy)) floor — IEEE sqrt, identical engines
    "q313_cross_correlation" -> {
      val lags = Queries.XcorrLags
      val leads = lags.filter(_ != 0).map { l =>
        if (l > 0) s"lead(dy, $l) OVER (ORDER BY daynum) AS y$l"
        else s"lead(dx, ${-l}) OVER (ORDER BY daynum) AS x${-l}"
      }.mkString(",\n|         ")
      def ab(l: Int): (String, String) =
        if (l == 0) ("dx", "dy")
        else if (l > 0) ("dx", s"y$l") else (s"x${-l}", "dy")
      val sums = lags.map { l =>
        val (a, b) = ab(l)
        s"""SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
           |             THEN CAST($a AS HUGEINT) * $b ELSE 0 END) AS nn$l,
           |         CAST(SUM(CASE WHEN $a IS NOT NULL AND $b IS NOT NULL
           |             THEN 1 ELSE 0 END) AS BIGINT) AS cc$l"""
          .stripMargin.replace("nn-", "nnm").replace("cc-", "ccm")
      }.mkString(",\n         ")
      val rows = lags.map { l =>
        val (nn, cc) = (s"nn$l".replace("nn-", "nnm"),
          s"cc$l".replace("cc-", "ccm"))
        s"""SELECT CAST($l AS BIGINT) AS lag_days, $cc AS n_pairs,
           |       CASE WHEN vx <= 0 OR vy <= 0 THEN NULL
           |            ELSE CAST(FLOOR(10000.0 * CAST($nn AS DOUBLE) /
           |              (sqrt(CAST(vx AS DOUBLE)) * sqrt(CAST(vy AS DOUBLE))))
           |              AS BIGINT)
           |       END AS r_bp
           |FROM t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(COUNT(*) AS BIGINT) AS x,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |base AS (
         |  SELECT sp.daynum, COALESCE(d.x, 0) AS x,
         |         CASE WHEN d.x IS NULL OR d.x = 0 THEN 0
         |              ELSE d.cents // d.x END AS y
         |  FROM sp LEFT JOIN d USING (daynum)),
         |m AS (SELECT CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
         |             CAST(SUM(y) AS BIGINT) // COUNT(*) AS my FROM base),
         |dev AS (
         |  SELECT daynum, x - m.mx AS dx, y - m.my AS dy FROM base, m),
         |w AS (
         |  SELECT daynum, dx, dy,
         |         $leads
         |  FROM dev),
         |t AS (
         |  SELECT SUM(CAST(dx AS HUGEINT) * dx) AS vx,
         |         SUM(CAST(dy AS HUGEINT) * dy) AS vy,
         |         $sums
         |  FROM w)
         |$rows
         |ORDER BY lag_days""".stripMargin
    },

    // exact coalition game at mask grain: the 2^C subset-sum and the
    // C·2^C Shapley marginals are literal-range CTEs; ×C!-scaled
    // integer credits, one terminal IEEE bp division
    "q314_shapley_attribution" -> {
      val chs = Queries.AttributionChannels.distinct.sorted
      val c = chs.size
      def fct(n: Int): Long = (1 to n).foldLeft(1L)((a, x) => a * x)
      val bitCase = chs.zipWithIndex.map { case (ch, i) =>
        s"WHEN '$ch' THEN ${1L << i}" }.mkString(" ")
      val chanVals = chs.zipWithIndex.map { case (ch, i) =>
        s"('$ch', CAST(${1L << i} AS BIGINT))" }.mkString(", ")
      val wCase = (0 until c).map { k =>
        s"WHEN $k THEN ${fct(k) * fct(c - 1 - k)}" }.mkString(" ")
      s"""$sessionCte,
         |r AS (
         |  SELECT user_id, session_seq, event_type,
         |         row_number() OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS rn
         |  FROM sz),
         |cv AS (
         |  SELECT *, min(CASE WHEN event_type = '${Queries.AbsorbTarget}'
         |           THEN rn END)
         |           OVER (PARTITION BY user_id, session_seq) AS conv_rn
         |  FROM r),
         |sm AS (
         |  SELECT user_id, session_seq,
         |         COALESCE(bit_or(CASE WHEN rn < conv_rn THEN
         |           (CASE event_type $bitCase END) END), 0) AS mask
         |  FROM cv WHERE conv_rn IS NOT NULL GROUP BY 1, 2),
         |mc AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_conv
         |       FROM sm GROUP BY 1),
         |ss AS (SELECT CAST(s AS BIGINT) AS s
         |       FROM range(0, ${1L << c}) t(s)),
         |v AS (
         |  SELECT s, CAST(COALESCE(SUM(CASE WHEN (s & mask) = mask
         |           AND mask <> 0 THEN n_conv END), 0) AS BIGINT) AS v
         |  FROM ss LEFT JOIN mc ON TRUE GROUP BY 1),
         |chn AS (SELECT * FROM (VALUES $chanVals) AS t(channel, bit)),
         |ph AS (
         |  SELECT chn.channel,
         |         CAST(SUM((CASE bit_count(ss.s) $wCase END)
         |           * (v2.v - v1.v)) AS BIGINT) AS phi_scaled
         |  FROM chn JOIN ss ON (ss.s & chn.bit) = 0
         |  JOIN v v1 ON v1.s = ss.s
         |  JOIN v v2 ON v2.s = (ss.s | chn.bit)
         |  GROUP BY 1),
         |tc AS (
         |  SELECT chn.channel,
         |         CAST(COALESCE(SUM(CASE WHEN (mc.mask & chn.bit) <> 0
         |           THEN mc.n_conv END), 0) AS BIGINT) AS touched_convs
         |  FROM chn LEFT JOIN mc ON TRUE GROUP BY 1),
         |rows0 AS (
         |  SELECT ph.channel, tc.touched_convs, ph.phi_scaled
         |  FROM ph JOIN tc USING (channel)
         |  UNION ALL
         |  SELECT 'direct',
         |         CAST(COALESCE((SELECT n_conv FROM mc WHERE mask = 0), 0)
         |           AS BIGINT),
         |         CAST(${fct(c)} *
         |           COALESCE((SELECT n_conv FROM mc WHERE mask = 0), 0)
         |           AS BIGINT))
         |SELECT channel, touched_convs, phi_scaled,
         |       CASE WHEN SUM(phi_scaled) OVER () > 0
         |            THEN CAST(FLOOR(10000.0 * phi_scaled /
         |              SUM(phi_scaled) OVER ()) AS BIGINT)
         |       END AS credit_bp
         |FROM rows0
         |ORDER BY phi_scaled DESC, channel""".stripMargin
    },

    // R×C χ² with per-cell MICRO-floored terms (exact integer sum —
    // no order-dependent float accumulation); V via one IEEE div +
    // sqrt. dow numbering differs per engine but χ² is label-invariant
    "q315_association_screen" -> {
      def pair(table: String, a: String, b: String,
          la: String, lb: String, where: String): String = {
        val cellsQ =
          s"""SELECT $a AS __a, $b AS __b, CAST(COUNT(*) AS BIGINT) AS o
             |          FROM $table
             |          WHERE $a IS NOT NULL AND $b IS NOT NULL $where
             |          GROUP BY 1, 2""".stripMargin
        s"""SELECT '$la' AS feature_a, '$lb' AS feature_b,
           |       COALESCE(n, 0) AS n, COALESCE(r_levels, 0) AS r_levels,
           |       COALESCE(c_levels, 0) AS c_levels,
           |       CAST((greatest(COALESCE(r_levels, 0), 1) - 1)
           |         * (greatest(COALESCE(c_levels, 0), 1) - 1) AS BIGINT)
           |         AS dof,
           |       CAST(COALESCE(chi2_micro // 1000, 0) AS BIGINT)
           |         AS chi2_milli,
           |       CASE WHEN COALESCE(n, 0) > 0
           |              AND least(r_levels, c_levels) > 1
           |            THEN CAST(FLOOR(10000.0 * sqrt(
           |              CAST(chi2_micro AS DOUBLE) /
           |              CAST(1000000 * n * (least(r_levels, c_levels) - 1)
           |                AS DOUBLE))) AS BIGINT)
           |       END AS v_bp
           |FROM (
           |  SELECT MAX(n) AS n,
           |         CAST(COUNT(DISTINCT __a) AS BIGINT) AS r_levels,
           |         CAST(COUNT(DISTINCT __b) AS BIGINT) AS c_levels,
           |         SUM((1000000::HUGEINT * d * d)
           |           // (CAST(n AS HUGEINT) * r * cc)) AS chi2_micro
           |  FROM (
           |    -- full R×C grid: zero cells still contribute R·C/N
           |    SELECT am.__a, bm.__b, am.r, bm.cc, nn.n,
           |           COALESCE(c0.o, 0) * nn.n - am.r * bm.cc AS d
           |    FROM (SELECT __a, CAST(SUM(o) AS BIGINT) AS r
           |          FROM ($cellsQ) t GROUP BY 1) am
           |    CROSS JOIN (SELECT __b, CAST(SUM(o) AS BIGINT) AS cc
           |          FROM ($cellsQ) t GROUP BY 1) bm
           |    CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n
           |          FROM ($cellsQ) t) nn
           |    LEFT JOIN ($cellsQ) c0
           |      ON c0.__a = am.__a AND c0.__b = bm.__b) mm) s""".stripMargin
      }
      Seq(
        pair("customer", "c_mktsegment", "c_nationkey",
          "c_mktsegment", "c_nationkey", ""),
        pair("events", "event_type", "CAST(dayofweek(ts) AS BIGINT)",
          "event_type", "event_dow", "AND ts IS NOT NULL"),
        pair("lineitem", "l_returnflag", "l_linestatus",
          "l_returnflag", "l_linestatus", ""),
        pair("orders", "o_orderpriority", "o_orderstatus",
          "o_orderpriority", "o_orderstatus", ""),
        pair("part", "p_brand", "p_type", "p_brand", "p_type", ""))
        .mkString("", "\nUNION ALL\n", "\nORDER BY feature_a")
    },

    // name-domain grain + shared-token blocking; DuckDB's levenshtein
    // is the same unit-cost edit distance as Spark's builtin
    "q316_fuzzy_name_match" ->
      s"""WITH names AS (
         |  SELECT p_name AS name,
         |         CAST(MIN(p_partkey) AS BIGINT) AS rep_id,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM part WHERE p_name IS NOT NULL GROUP BY 1),
         |tk AS (
         |  SELECT name, tok
         |  FROM (SELECT name,
         |          unnest(list_distinct(string_split(name, ' '))) AS tok
         |        FROM names) t
         |  WHERE length(tok) > 0),
         |tk2 AS (
         |  SELECT name, tok
         |  FROM (SELECT name, tok,
         |          row_number() OVER (PARTITION BY tok ORDER BY name) AS rk
         |        FROM tk) t
         |  WHERE rk <= 1000),
         |pr AS (
         |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
         |  FROM tk2 a JOIN tk2 b
         |    ON a.tok = b.tok AND a.name < b.name),
         |d AS (
         |  SELECT name_a, name_b,
         |         CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
         |  FROM pr WHERE levenshtein(name_a, name_b) <= ${Queries.FuzzyMaxDist})
         |SELECT d.name_a, d.name_b,
         |       na.rep_id AS rep_a, nb.rep_id AS rep_b, d.dist,
         |       na.n_rows AS rows_a, nb.n_rows AS rows_b,
         |       CAST(FLOOR(10000.0 *
         |         (greatest(length(d.name_a), length(d.name_b)) - d.dist) /
         |         greatest(length(d.name_a), length(d.name_b))) AS BIGINT)
         |         AS sim_bp
         |FROM d
         |JOIN names na ON na.name = d.name_a
         |JOIN names nb ON nb.name = d.name_b
         |ORDER BY d.dist, d.name_a, d.name_b
         |LIMIT ${Queries.FuzzyTopK}""".stripMargin,

    // unnormalized Haar details as exact block sums of cents; HUGEINT
    // energies; absent days are true zeros (no spine needed)
    "q317_haar_energy" ->
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |o AS (
         |  SELECT daynum - (SELECT MIN(daynum) FROM d) AS off, cents
         |  FROM d),
         |l AS (
         |  SELECT lv.level, o.off >> lv.level AS blk,
         |         CASE WHEN ((o.off >> (lv.level - 1)) & 1) = 0
         |              THEN o.cents ELSE -o.cents END AS sc
         |  FROM o CROSS JOIN (
         |    SELECT unnest(generate_series(1, ${Queries.HaarLevels}))
         |      AS level) lv),
         |b AS (
         |  SELECT level, blk, CAST(SUM(sc) AS BIGINT) AS dd
         |  FROM l GROUP BY 1, 2),
         |e AS (
         |  SELECT level, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         |         SUM(CAST(dd AS HUGEINT) * dd) AS e
         |  FROM b GROUP BY 1)
         |SELECT CAST(level AS BIGINT) AS level,
         |       CAST(1::BIGINT << level AS BIGINT) AS scale_days,
         |       n_blocks,
         |       CASE WHEN (SELECT SUM(e) FROM e) > 0
         |            THEN CAST((10000::HUGEINT * e)
         |              // (SELECT SUM(e) FROM e) AS BIGINT)
         |       END AS share_bp,
         |       CAST(FLOOR(sqrt(CAST(e AS DOUBLE) / n_blocks)) AS BIGINT)
         |         AS rms_cents
         |FROM e ORDER BY level""".stripMargin,

    // dyadic size/interval smoothing over occurrence index; the
    // kernel scale cancels in the 1000*zw/xw forecast ratio
    "q318_croston_demand" -> {
      val w = Queries.CrostonWindowPow
      val denom = (1L << w) - 1L
      s"""WITH pd AS (
         |  SELECT l_partkey AS partkey,
         |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units
         |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
         |sp AS (SELECT MAX(daynum) - MIN(daynum) + 1 AS span FROM pd),
         |w AS (
         |  SELECT partkey, daynum, units,
         |         CAST(COUNT(*) OVER (PARTITION BY partkey) AS BIGINT) AS n,
         |         CAST(row_number() OVER (PARTITION BY partkey
         |           ORDER BY daynum) AS BIGINT) AS idx,
         |         daynum - lag(daynum) OVER (PARTITION BY partkey
         |           ORDER BY daynum) AS gap,
         |         MIN(daynum) OVER (PARTITION BY partkey) AS d0,
         |         MAX(daynum) OVER (PARTITION BY partkey) AS d1
         |  FROM pd),
         |g AS (
         |  SELECT partkey, MAX(n) AS n, MAX(d1) - MAX(d0) AS spread,
         |         CAST(SUM(units) AS BIGINT) AS tot_units,
         |         CAST(SUM(CASE WHEN n - idx < $w THEN
         |             units * (1::BIGINT << (${w - 1} - CAST(n - idx AS INT)))
         |           ELSE 0 END) AS BIGINT) AS zw,
         |         CAST(SUM(CASE WHEN n - idx < $w AND gap IS NOT NULL THEN
         |             gap * (1::BIGINT << (${w - 1} - CAST(n - idx AS INT)))
         |           ELSE 0 END) AS BIGINT) AS xw
         |  FROM w GROUP BY 1)
         |SELECT partkey, n AS n_demands, spread + 1 AS demand_span_days,
         |       (1000 * spread) // (n - 1) AS adi_milli,
         |       (1000 * tot_units) // n AS mean_units_milli,
         |       (1000 * zw) // $denom AS z_hat_milli,
         |       (1000 * xw) // $denom AS x_hat_milli,
         |       CASE WHEN xw > 0 THEN (1000 * zw) // xw END AS croston_milli
         |FROM g, sp
         |WHERE n >= ${Queries.CrostonMinDemands} AND n * 5 <= sp.span
         |ORDER BY partkey""".stripMargin
    },

    // g3 error per declared FD candidate: rows-to-delete fraction via
    // sum-of-per-key-max; all integral, one terminal DIV per row
    "q319_fd_audit" -> {
      def cand(t: String, l: String, r: String): String =
        s"""SELECT '$t' AS tbl, '$l' AS lhs, '$r' AS rhs,
           |       CAST(COALESCE(SUM(tot), 0) AS BIGINT) AS n_rows,
           |       CAST(COUNT(*) AS BIGINT) AS n_groups,
           |       CAST(COALESCE(SUM(CASE WHEN rhs_n > 1 THEN 1 ELSE 0
           |         END), 0) AS BIGINT) AS violating_groups,
           |       CASE WHEN COALESCE(SUM(tot), 0) > 0
           |            THEN (10000 * CAST(SUM(tot) - SUM(keep) AS BIGINT))
           |              // CAST(SUM(tot) AS BIGINT)
           |       END AS g3_bp,
           |       CAST(CASE WHEN COALESCE(SUM(tot), 0) > 0
           |              AND COALESCE(SUM(CASE WHEN rhs_n > 1 THEN 1
           |                ELSE 0 END), 0) = 0
           |            THEN 1 ELSE 0 END AS INT) AS holds
           |FROM (
           |  SELECT __l, CAST(SUM(o) AS BIGINT) AS tot,
           |         CAST(MAX(o) AS BIGINT) AS keep,
           |         CAST(COUNT(*) AS BIGINT) AS rhs_n
           |  FROM (SELECT $l AS __l, $r AS __r,
           |          CAST(COUNT(*) AS BIGINT) AS o
           |        FROM $t
           |        WHERE $l IS NOT NULL AND $r IS NOT NULL
           |        GROUP BY 1, 2) c
           |  GROUP BY 1) g""".stripMargin
      Queries.FdCandidates
        .map { case (t, l, r) => cand(t, l, r) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, lhs, rhs")
    },

    // arithmetic month alignment (m = 12y+mo-1); full-outer self
    // alignment at (cust, month) grain; integral bp divisions
    "q320_revenue_retention" ->
      s"""WITH cm AS (
         |  SELECT o_custkey AS cust,
         |         CAST(12 * year(o_orderdate) + month(o_orderdate) - 1
         |           AS BIGINT) AS m,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
         |  GROUP BY 1, 2),
         |b AS (SELECT MIN(m) AS m0, MAX(m) AS m1 FROM cm),
         |j AS (
         |  SELECT COALESCE(p.cust, c.cust) AS cust,
         |         COALESCE(p.m, c.m) AS m,
         |         p.prev_cents, c.cur_cents
         |  FROM (SELECT cust, m + 1 AS m, cents AS prev_cents FROM cm) p
         |  FULL OUTER JOIN
         |       (SELECT cust, m, cents AS cur_cents FROM cm) c
         |    ON p.cust = c.cust AND p.m = c.m),
         |g AS (
         |  SELECT m,
         |    CAST(SUM(CASE WHEN prev_cents IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS base_customers,
         |    CAST(COALESCE(SUM(prev_cents), 0) AS BIGINT)
         |      AS base_prev_cents,
         |    CAST(COALESCE(SUM(CASE WHEN prev_cents IS NOT NULL
         |      THEN COALESCE(cur_cents, 0) END), 0) AS BIGINT)
         |      AS retained_cents,
         |    CAST(COALESCE(SUM(CASE WHEN prev_cents IS NOT NULL
         |      AND cur_cents IS NOT NULL
         |      THEN greatest(cur_cents - prev_cents, 0) END), 0) AS BIGINT)
         |      AS expansion_cents,
         |    CAST(COALESCE(SUM(CASE WHEN prev_cents IS NOT NULL
         |      AND cur_cents IS NOT NULL
         |      THEN greatest(prev_cents - cur_cents, 0) END), 0) AS BIGINT)
         |      AS contraction_cents,
         |    CAST(COALESCE(SUM(CASE WHEN cur_cents IS NULL
         |      THEN prev_cents END), 0) AS BIGINT) AS churned_cents,
         |    CAST(COALESCE(SUM(CASE WHEN prev_cents IS NULL
         |      THEN cur_cents END), 0) AS BIGINT) AS new_cents
         |  FROM j GROUP BY 1)
         |SELECT printf('%04d-%02d', CAST(m // 12 AS INT),
         |         CAST(m % 12 + 1 AS INT)) AS month,
         |       base_customers, base_prev_cents, retained_cents,
         |       expansion_cents, contraction_cents, churned_cents,
         |       new_cents,
         |       CASE WHEN base_prev_cents > 0 THEN
         |         CAST((10000 * CAST(retained_cents AS HUGEINT))
         |           // base_prev_cents AS BIGINT)
         |       END AS ndr_bp,
         |       CASE WHEN base_prev_cents > 0 THEN
         |         CAST((10000 * (CAST(retained_cents AS HUGEINT)
         |             - expansion_cents))
         |           // base_prev_cents AS BIGINT)
         |       END AS grr_bp
         |FROM g, b
         |WHERE m > b.m0 AND m <= b.m1
         |ORDER BY month""".stripMargin,

    // q311's STL layers (dyadic kernel + dow means) feeding q212's
    // running-min CUSUM walk, target 0, HUGEINT-scaled recursion
    "q321_deseasonalized_cusum" -> {
      val w = Queries.EwmaWindowDays
      val denom = (1L << w) - 1L
      val sl = Queries.CusumSlackBp
      val h = Queries.CusumHMeanDays
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (
         |  SELECT unnest(generate_series((SELECT MIN(daynum) FROM d),
         |           (SELECT MAX(daynum) FROM d))) AS daynum),
         |dense AS (
         |  SELECT sp.daynum, COALESCE(d.cents, 0) AS cents
         |  FROM sp LEFT JOIN d USING (daynum)),
         |tr AS (
         |  SELECT a.daynum,
         |         CAST(SUM(b.cents * (CAST(1 AS BIGINT) <<
         |           CAST(${w - 1} - (a.daynum - b.daynum) AS INT)))
         |           // $denom AS BIGINT) AS trend
         |  FROM dense a JOIN dense b
         |    ON b.daynum BETWEEN a.daynum - ${w - 1} AND a.daynum
         |  GROUP BY 1),
         |det AS (
         |  SELECT dense.daynum, dense.cents,
         |         dense.cents - tr.trend AS det,
         |         dense.daynum % 7 AS dow
         |  FROM dense JOIN tr USING (daynum)),
         |rm AS (
         |  SELECT daynum, cents,
         |         det - CAST(CAST(SUM(det) OVER (PARTITION BY dow)
         |           AS BIGINT) // COUNT(*) OVER (PARTITION BY dow)
         |           AS BIGINT) AS rem
         |  FROM det),
         |st AS (SELECT COUNT(*) AS n, SUM(CAST(cents AS HUGEINT)) AS s
         |       FROM rm),
         |dv AS (
         |  SELECT rm.daynum, rm.cents, rm.rem, st.s,
         |         CAST(10000 AS HUGEINT) * st.n * rm.rem
         |           - CAST($sl AS HUGEINT) * st.s AS devp,
         |         CAST(-10000 AS HUGEINT) * st.n * rm.rem
         |           - CAST($sl AS HUGEINT) * st.s AS devn
         |  FROM rm, st),
         |cw AS (
         |  SELECT *,
         |         SUM(devp) OVER (ORDER BY daynum
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
         |         SUM(devn) OVER (ORDER BY daynum
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
         |  FROM dv),
         |cs AS (
         |  SELECT *,
         |         cp - LEAST(CAST(0 AS HUGEINT), MIN(cp) OVER (ORDER BY daynum
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |           AS cusum_p,
         |         cn - LEAST(CAST(0 AS HUGEINT), MIN(cn) OVER (ORDER BY daynum
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |           AS cusum_n
         |  FROM cw)
         |SELECT strftime(DATE '1970-01-01' + CAST(daynum AS INT),
         |         '%Y-%m-%d') AS day,
         |       cents, rem AS rem_cents,
         |       CASE WHEN s > 0 THEN
         |         CAST(FLOOR(CAST(cusum_p AS DOUBLE) / CAST(s AS DOUBLE))
         |           AS BIGINT) END AS pos_bp,
         |       CASE WHEN s > 0 THEN
         |         CAST(FLOOR(CAST(cusum_n AS DOUBLE) / CAST(s AS DOUBLE))
         |           AS BIGINT) END AS neg_bp,
         |       CAST(CASE WHEN cusum_p > CAST(${10000L * h} AS HUGEINT) * s
         |         THEN 1 ELSE 0 END AS BIGINT) AS pos_alarm,
         |       CAST(CASE WHEN cusum_n > CAST(${10000L * h} AS HUGEINT) * s
         |         THEN 1 ELSE 0 END AS BIGINT) AS neg_alarm
         |FROM cs
         |ORDER BY day""".stripMargin
    },

    // per-k rank filter + the q201 recursive-CC pattern; hub rank is
    // (degree desc, id asc) — deterministic, no sampling
    "q322_hub_knockout" -> {
      val cap = Queries.CoVisitMaxItems
      val ms = Queries.PageRankMinSupport
      val cte = sessionCte.replaceFirst("WITH ", "WITH RECURSIVE ")
      val perK = Queries.KnockoutKs.sorted.map { k =>
        s"""ek$k AS (
           |  SELECT e.src, e.dst FROM edg e
           |  JOIN rnk ra ON ra.item = e.src
           |  JOIN rnk rb ON rb.item = e.dst
           |  WHERE ra.rnk > $k AND rb.rnk > $k),
           |n$k AS (SELECT DISTINCT src AS item FROM ek$k),
           |reach$k(node, lbl) AS (
           |  SELECT item, item FROM n$k
           |  UNION
           |  SELECT e.dst, r.lbl FROM reach$k r JOIN ek$k e
           |    ON e.src = r.node),
           |comp$k AS (SELECT node, MIN(lbl) AS component FROM reach$k
           |           GROUP BY 1),
           |csz$k AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_items
           |          FROM comp$k GROUP BY 1),
           |row$k AS (
           |  SELECT CAST($k AS BIGINT) AS k_removed,
           |         CAST(COALESCE(SUM(n_items), 0) AS BIGINT) AS n_nodes,
           |         CAST((SELECT COUNT(*) FROM ek$k) // 2 AS BIGINT)
           |           AS n_edges,
           |         CAST(COUNT(*) AS BIGINT) AS n_components,
           |         CAST(COALESCE(MAX(n_items), 0) AS BIGINT)
           |           AS giant_items,
           |         CASE WHEN COALESCE(SUM(n_items), 0) > 0
           |              THEN CAST((10000 * MAX(n_items))
           |                // SUM(n_items) AS BIGINT)
           |         END AS giant_share_bp
           |  FROM csz$k)""".stripMargin
      }.mkString(",\n")
      val rows = Queries.KnockoutKs.sorted
        .map(k => s"SELECT * FROM row$k").mkString("\nUNION ALL\n")
      s"""$cte,
         |${coVisEdgesCte(cap, ms)},
         |rnk AS (
         |  SELECT src AS item,
         |         ROW_NUMBER() OVER (ORDER BY deg DESC, src) AS rnk
         |  FROM deg),
         |$perK
         |$rows
         |ORDER BY k_removed""".stripMargin
    },

    // implicit-zero nearest-rank quantile: rank r over ALL T weeks
    // answered by arithmetic over nonzero rows only (no spine)
    "q323_newsvendor_stock" -> {
      val p = Queries.NewsvendorServiceBp
      s"""WITH pw AS (
         |  SELECT l_partkey AS partkey,
         |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) // 7 AS wk,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units
         |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
         |sp AS (SELECT MAX(wk) - MIN(wk) + 1 AS t FROM pw),
         |st AS (
         |  SELECT partkey, CAST(COUNT(*) AS BIGINT) AS nz,
         |         CAST(SUM(units) AS BIGINT) AS tot
         |  FROM pw GROUP BY 1),
         |rk AS (
         |  SELECT partkey, units,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY partkey
         |           ORDER BY units, wk) AS BIGINT) AS rn
         |  FROM pw),
         |qq AS (
         |  SELECT st.partkey, st.nz, st.tot, sp.t,
         |         (sp.t * $p + 9999) // 10000 - (sp.t - st.nz) AS j
         |  FROM st, sp)
         |SELECT qq.partkey, qq.t AS t_weeks, qq.nz AS nz_weeks,
         |       qq.tot AS total_units,
         |       (1000 * qq.tot) // qq.t AS mean_weekly_milli,
         |       CAST(COALESCE(rk.units, 0) AS BIGINT) AS q_units,
         |       1000 * CAST(COALESCE(rk.units, 0) AS BIGINT)
         |         - (1000 * qq.tot) // qq.t AS safety_milli
         |FROM qq LEFT JOIN rk
         |  ON rk.partkey = qq.partkey AND rk.rn = qq.j
         |ORDER BY qq.partkey""".stripMargin
    },

    // true sizes at key grain (fact rows counted, never paired);
    // System-R chain estimates; pick flags via window mins
    "q324_join_order_audit" -> {
      def qe(est: String, tru: String): String =
        s"""CASE WHEN least($est, CAST($tru AS HUGEINT)) = 0 THEN NULL
           |  ELSE CAST((1000 * greatest($est, CAST($tru AS HUGEINT)))
           |    // least($est, CAST($tru AS HUGEINT)) AS BIGINT) END"""
          .stripMargin
      s"""WITH lp AS (
         |  SELECT l_orderkey AS ok, l_partkey AS pk,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lineitem
         |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
         |  GROUP BY 1, 2),
         |okk AS (SELECT o_orderkey AS k FROM orders
         |        WHERE ${Queries.JoinOrderOrdersPred}),
         |pkk AS (SELECT p_partkey AS k FROM part
         |        WHERE ${Queries.JoinOrderPartPred}),
         |ls AS (SELECT CAST(SUM(c) AS BIGINT) AS n_l,
         |         CAST(COUNT(DISTINCT ok) AS BIGINT) AS ndv_ok,
         |         CAST(COUNT(DISTINCT pk) AS BIGINT) AS ndv_pk FROM lp),
         |os AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_o FROM okk),
         |ps AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_p FROM pkk),
         |tol AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS true_ol
         |        FROM lp JOIN okk ON lp.ok = okk.k),
         |tlp AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS true_lp
         |        FROM lp JOIN pkk ON lp.pk = pkk.k),
         |t3 AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS true_final
         |       FROM lp JOIN okk ON lp.ok = okk.k
         |       JOIN pkk ON lp.pk = pkk.k),
         |b AS (
         |  SELECT *,
         |    (CAST(n_o AS HUGEINT) * n_l) // greatest(n_o, ndv_ok)
         |      AS est_ol,
         |    (CAST(n_l AS HUGEINT) * n_p) // greatest(ndv_pk, n_p)
         |      AS est_lp
         |  FROM ls, os, ps, tol, tlp, t3),
         |b2 AS (
         |  SELECT *,
         |    (est_ol * n_p) // greatest(ndv_pk, n_p) AS est_f1,
         |    (est_lp * n_o) // greatest(ndv_ok, n_o) AS est_f2
         |  FROM b),
         |rows0 AS (
         |  SELECT 'orders_first' AS plan,
         |         CAST(est_ol AS BIGINT) AS est_intermediate,
         |         true_ol AS true_intermediate,
         |         ${qe("est_ol", "true_ol")} AS q_error_milli,
         |         CAST(est_f1 AS BIGINT) AS est_final, true_final
         |  FROM b2
         |  UNION ALL
         |  SELECT 'part_first', CAST(est_lp AS BIGINT), true_lp,
         |         ${qe("est_lp", "true_lp")},
         |         CAST(est_f2 AS BIGINT), true_final
         |  FROM b2)
         |SELECT plan, est_intermediate, true_intermediate,
         |       q_error_milli, est_final, true_final,
         |       CAST(CASE WHEN est_intermediate =
         |         MIN(est_intermediate) OVER () THEN 1 ELSE 0 END AS INT)
         |         AS cbo_pick,
         |       CAST(CASE WHEN true_intermediate =
         |         MIN(true_intermediate) OVER () THEN 1 ELSE 0 END AS INT)
         |         AS oracle_pick
         |FROM rows0 ORDER BY plan""".stripMargin
    },

    // value-grain nearest-rank per month; pairwise-median slope of
    // the monthly p90 by the q207 two-middles rule
    "q325_latency_sla_trend" ->
      s"""WITH lat AS (
         |  SELECT CAST(12 * year(o.o_orderdate) + month(o.o_orderdate) - 1
         |           AS BIGINT) AS m,
         |         CAST(CAST(l.l_shipdate AS DATE)
         |           - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lv,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE l.l_shipdate IS NOT NULL AND o.o_orderdate IS NOT NULL
         |  GROUP BY 1, 2),
         |cw AS (
         |  SELECT m, lv, cnt,
         |         CAST(SUM(cnt) OVER (PARTITION BY m ORDER BY lv
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |         CAST(SUM(cnt) OVER (PARTITION BY m) AS BIGINT) AS n
         |  FROM lat),
         |panel AS (
         |  SELECT m, MIN(n) AS n_lines,
         |         MIN(CASE WHEN cum >= (n * 5000 + 9999) // 10000
         |           THEN lv END) AS p50_days,
         |         MIN(CASE WHEN cum >= (n * 9000 + 9999) // 10000
         |           THEN lv END) AS p90_days
         |  FROM cw GROUP BY 1),
         |sl AS (
         |  SELECT (1000 * (b.p90_days - a.p90_days)) // (b.m - a.m) AS s
         |  FROM panel a JOIN panel b ON b.m > a.m),
         |sc AS (
         |  SELECT s, CAST(COUNT(*) AS BIGINT) AS cnt FROM sl GROUP BY 1),
         |scw AS (
         |  SELECT s,
         |         CAST(SUM(cnt) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
         |           AS BIGINT) AS cum,
         |         CAST(SUM(cnt) OVER () AS BIGINT) AS n
         |  FROM sc),
         |md AS (
         |  SELECT CAST(FLOOR((MIN(CASE WHEN cum >= (n + 1) // 2 THEN s END)
         |           + MIN(CASE WHEN cum >= (n + 2) // 2 THEN s END)) / 2.0)
         |           AS BIGINT) AS slope_milli_per_month
         |  FROM scw)
         |SELECT printf('%04d-%02d', CAST(m // 12 AS INT),
         |         CAST(m % 12 + 1 AS INT)) AS month,
         |       n_lines, p50_days, p90_days, slope_milli_per_month
         |FROM panel, md
         |ORDER BY month""".stripMargin,

    // pairwise cosine over the capped sample, collapsed to value
    // grain; q269's midrank AUC arithmetic (rank2 = 2x midrank)
    "q326_separability_auc" ->
      s"""WITH $embQuantCte,
         |lab AS (
         |  SELECT n.vec_id, e.label, n.q, n.n2
         |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id
         |  WHERE n.vec_id % ${Queries.SepSampleMod} = 0),
         |pr AS (
         |  SELECT CAST(list_sum(list_transform(range(1, len(a.q) + 1),
         |           i -> a.q[i] * b.q[i])) AS BIGINT) AS dot,
         |         a.n2 AS na, b.n2 AS nb,
         |         CASE WHEN a.label = b.label THEN 1 ELSE 0 END AS pos
         |  FROM lab a JOIN lab b ON a.vec_id < b.vec_id),
         |c AS (
         |  SELECT CASE WHEN na = 0 OR nb = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 * dot /
         |                (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
         |                AS BIGINT)
         |         END AS cos_bp, pos
         |  FROM pr),
         |vals AS (
         |  SELECT cos_bp, CAST(COUNT(*) AS BIGINT) AS cnt,
         |         CAST(SUM(pos) AS BIGINT) AS cnt_pos
         |  FROM c GROUP BY 1),
         |cw AS (
         |  SELECT *,
         |         CAST(SUM(cnt) OVER (ORDER BY cos_bp
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM vals),
         |t AS (
         |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_pairs,
         |         CAST(SUM(cnt_pos) AS BIGINT) AS n_same,
         |         CAST(SUM(cnt_pos * (2 * (cum - cnt) + cnt + 1))
         |           AS BIGINT) AS r_pos2,
         |         CAST(SUM(cos_bp * cnt_pos) AS BIGINT) AS sum_same,
         |         CAST(SUM(cos_bp * (cnt - cnt_pos)) AS BIGINT) AS sum_diff
         |  FROM cw)
         |SELECT n_pairs, n_same, n_pairs - n_same AS n_diff,
         |       CASE WHEN n_same = 0 OR n_same = n_pairs THEN NULL
         |            ELSE CAST(FLOOR(10000.0 *
         |              (r_pos2 - n_same * (n_same + 1)) /
         |              (2.0 * n_same * (n_pairs - n_same))) AS BIGINT)
         |       END AS auc_bp,
         |       CASE WHEN n_same > 0 THEN
         |         CAST(FLOOR(CAST(sum_same AS DOUBLE) / n_same) AS BIGINT)
         |       END AS mean_same_bp,
         |       CASE WHEN n_pairs - n_same > 0 THEN
         |         CAST(FLOOR(CAST(sum_diff AS DOUBLE) / (n_pairs - n_same))
         |           AS BIGINT)
         |       END AS mean_diff_bp,
         |       CASE WHEN n_same > 0 THEN
         |         CAST(FLOOR(CAST(sum_same AS DOUBLE) / n_same) AS BIGINT)
         |       END - CASE WHEN n_pairs - n_same > 0 THEN
         |         CAST(FLOOR(CAST(sum_diff AS DOUBLE) / (n_pairs - n_same))
         |           AS BIGINT)
         |       END AS margin_bp
         |FROM t""".stripMargin,

    // equi-depth activity strata at VALUE grain; per-stratum milli
    // means by integral DIV; covered-strata weighted recombination
    "q327_post_stratified_lift" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val ns = Queries.PostStrata
      s"""WITH u0 AS (
         |  SELECT user_id,
         |         CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1
         |           ELSE 0 END) AS BIGINT) AS act,
         |         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |           AND value IS NOT NULL
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) END), 0)
         |           AS BIGINT) AS y
         |  FROM events GROUP BY 1),
         |u AS (
         |  SELECT act, y,
         |         CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |              THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT act, y, md5(CAST(user_id AS VARCHAR)) AS draw
         |        FROM u0)),
         |sv AS (
         |  SELECT act, (cum - 1) * $ns // n + 1 AS stratum
         |  FROM (
         |    SELECT act,
         |           CAST(SUM(cnt) OVER (ORDER BY act
         |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |           CAST(SUM(cnt) OVER () AS BIGINT) AS n
         |    FROM (SELECT act, CAST(COUNT(*) AS BIGINT) AS cnt
         |          FROM u GROUP BY 1) v)),
         |cells AS (
         |  SELECT sv.stratum,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_a,
         |         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_b,
         |         CAST(COALESCE(SUM(CASE WHEN arm = 'A' THEN y END), 0)
         |           AS BIGINT) AS sy_a,
         |         CAST(COALESCE(SUM(CASE WHEN arm = 'B' THEN y END), 0)
         |           AS BIGINT) AS sy_b
         |  FROM u JOIN sv USING (act) GROUP BY 1
         |  UNION ALL
         |  SELECT 0,
         |         CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END)
         |           AS BIGINT),
         |         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END)
         |           AS BIGINT),
         |         CAST(COALESCE(SUM(CASE WHEN arm = 'A' THEN y END), 0)
         |           AS BIGINT),
         |         CAST(COALESCE(SUM(CASE WHEN arm = 'B' THEN y END), 0)
         |           AS BIGINT)
         |  FROM u),
         |c2 AS (
         |  SELECT *,
         |         CASE WHEN n_a > 0 THEN (1000 * sy_a) // n_a END
         |           AS mean_a_milli,
         |         CASE WHEN n_b > 0 THEN (1000 * sy_b) // n_b END
         |           AS mean_b_milli,
         |         (CASE WHEN n_a > 0 THEN (1000 * sy_a) // n_a END)
         |           - (CASE WHEN n_b > 0 THEN (1000 * sy_b) // n_b END)
         |           AS diff_milli
         |  FROM cells),
         |rec AS (
         |  SELECT CASE WHEN COALESCE(SUM(n_a + n_b), 0) > 0
         |           THEN CAST(SUM((n_a + n_b) * diff_milli) AS BIGINT)
         |             // CAST(SUM(n_a + n_b) AS BIGINT)
         |         END AS ps
         |  FROM c2 WHERE stratum > 0 AND n_a > 0 AND n_b > 0),
         |nt AS (SELECT CAST(SUM(n_a + n_b) AS BIGINT) AS n_all
         |       FROM c2 WHERE stratum > 0)
         |SELECT c2.stratum, c2.n_a, c2.n_b, c2.mean_a_milli,
         |       c2.mean_b_milli, c2.diff_milli,
         |       CASE WHEN nt.n_all > 0 THEN
         |         (10000 * (c2.n_a + c2.n_b)) // nt.n_all
         |       END AS weight_bp,
         |       CASE WHEN c2.stratum = 0 THEN rec.ps END
         |         AS post_strat_diff_milli
         |FROM c2, rec, nt
         |ORDER BY c2.stratum""".stripMargin
    },

    // (group, relative-month) grain; gaps normalized to rel -1; the
    // q282 region dim chain; arithmetic month alignment
    "q328_did_event_study" -> {
      val w = Queries.DidWindowMonths
      val cutM = 12L * 1998 + 1 - 1
      s"""WITH dim AS (
         |  SELECT c.c_custkey,
         |         CASE WHEN r.r_name = 'ASIA' THEN 'TREAT'
         |              ELSE 'CTRL' END AS grp
         |  FROM customer c
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  JOIN region r ON n.n_regionkey = r.r_regionkey
         |  WHERE r.r_name IN ('ASIA', 'AMERICA')),
         |cells AS (
         |  SELECT CAST(12 * year(o.o_orderdate) + month(o.o_orderdate) - 1
         |           - $cutM AS BIGINT) AS rel,
         |         CAST(SUM(CASE WHEN grp = 'TREAT' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_treat,
         |         CAST(SUM(CASE WHEN grp = 'CTRL' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_ctrl,
         |         CAST(COALESCE(SUM(CASE WHEN grp = 'TREAT'
         |           THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |           END), 0) AS BIGINT) AS ct,
         |         CAST(COALESCE(SUM(CASE WHEN grp = 'CTRL'
         |           THEN CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
         |           END), 0) AS BIGINT) AS cc
         |  FROM orders o JOIN dim ON o.o_custkey = dim.c_custkey
         |  WHERE o.o_orderdate IS NOT NULL
         |  GROUP BY 1
         |  HAVING CAST(12 * year(o.o_orderdate) + month(o.o_orderdate) - 1
         |           - $cutM AS BIGINT) BETWEEN -$w AND ${w - 1}),
         |g AS (
         |  SELECT rel, n_treat, n_ctrl,
         |         CASE WHEN n_treat > 0 THEN ct // n_treat END
         |           AS mean_treat_cents,
         |         CASE WHEN n_ctrl > 0 THEN cc // n_ctrl END
         |           AS mean_ctrl_cents,
         |         (CASE WHEN n_treat > 0 THEN ct // n_treat END)
         |           - (CASE WHEN n_ctrl > 0 THEN cc // n_ctrl END)
         |           AS gap_cents
         |  FROM cells),
         |b AS (SELECT gap_cents AS base FROM g WHERE rel = -1)
         |SELECT g.rel AS rel_month, g.n_treat, g.n_ctrl,
         |       g.mean_treat_cents, g.mean_ctrl_cents, g.gap_cents,
         |       g.gap_cents - b.base AS effect_cents
         |FROM g LEFT JOIN b ON TRUE
         |ORDER BY rel_month""".stripMargin
    },

    // ABC by cumulative revenue share at the part; XYZ by exact
    // implicit-zero weekly CV^2 (the q323 arithmetic, no spine)
    "q329_abc_xyz" ->
      s"""WITH pw AS (
         |  SELECT l_partkey AS partkey,
         |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) // 7 AS wk,
         |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units,
         |         CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
         |sp AS (SELECT MAX(wk) - MIN(wk) + 1 AS t FROM pw),
         |pt AS (
         |  SELECT partkey, CAST(SUM(cents) AS BIGINT) AS rev,
         |         CAST(SUM(units) AS BIGINT) AS tot,
         |         SUM(CAST(units AS HUGEINT) * units) AS s2
         |  FROM pw GROUP BY 1),
         |cls AS (
         |  SELECT partkey, rev,
         |         CASE WHEN tot > 0 THEN CAST((10000::HUGEINT *
         |             (CAST(sp.t AS HUGEINT) * s2
         |               - CAST(tot AS HUGEINT) * tot))
         |           // (CAST(tot AS HUGEINT) * tot) AS BIGINT)
         |         END AS cv2_bp,
         |         CAST(SUM(rev) OVER (ORDER BY rev DESC, partkey
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         |         CAST(SUM(rev) OVER () AS BIGINT) AS totrev
         |  FROM pt, sp),
         |lab AS (
         |  SELECT rev, cv2_bp,
         |         CASE WHEN CAST(cum - rev AS HUGEINT) * 10000
         |                < 8000 * CAST(totrev AS HUGEINT) THEN 'A'
         |              WHEN CAST(cum - rev AS HUGEINT) * 10000
         |                < 9500 * CAST(totrev AS HUGEINT) THEN 'B'
         |              ELSE 'C' END AS abc_class,
         |         CASE WHEN cv2_bp <= 2500 THEN 'X'
         |              WHEN cv2_bp <= 10000 THEN 'Y'
         |              ELSE 'Z' END AS xyz_class
         |  FROM cls)
         |SELECT abc_class, xyz_class,
         |       CAST(COUNT(*) AS BIGINT) AS n_parts,
         |       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
         |       CAST((10000 * CAST(SUM(rev) AS HUGEINT))
         |         // CAST(SUM(SUM(rev)) OVER () AS HUGEINT) AS BIGINT)
         |         AS revenue_share_bp,
         |       CAST(SUM(cv2_bp) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         |         AS avg_cv2_bp
         |FROM lab GROUP BY 1, 2
         |ORDER BY abc_class, xyz_class""".stripMargin,

    // per-train add-1 bigram models over the q86 double-unnest build;
    // unseen contexts fall back through the add-1 mass (coalesce 0)
    "q330_source_transfer" ->
      s"""WITH live AS (
         |  SELECT doc_id, source, string_split(text, ' ') AS t
         |  FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL
         |    AND len(string_split(text, ' ')) >= 2),
         |tok AS (
         |  SELECT doc_id, source, unnest(t) AS token,
         |         unnest(range(1, len(t) + 1)) AS pos
         |  FROM live),
         |srcbi AS (
         |  SELECT a.source, a.token AS w1, b.token AS w2,
         |         CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok a JOIN tok b
         |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |  GROUP BY 1, 2, 3),
         |c2 AS (SELECT source AS train, w1, w2, cnt AS c2 FROM srcbi),
         |c1 AS (SELECT train, w1, CAST(SUM(c2) AS BIGINT) AS c1
         |       FROM c2 GROUP BY 1, 2),
         |vocab AS (
         |  SELECT source AS train,
         |         CAST(COUNT(DISTINCT token) AS BIGINT) AS v
         |  FROM (SELECT source, unnest(t) AS token FROM live) tt
         |  GROUP BY 1),
         |trains AS (SELECT DISTINCT source AS train FROM srcbi),
         |sc AS (
         |  SELECT tr.train, e.source AS eval_source, e.cnt,
         |         CAST(${flog2rSql("COALESCE(c1.c1, 0) + vocab.v",
                 "COALESCE(c2.c2, 0) + 1")} AS BIGINT) AS bits
         |  FROM srcbi e
         |  CROSS JOIN trains tr
         |  LEFT JOIN c2 ON c2.train = tr.train
         |    AND c2.w1 = e.w1 AND c2.w2 = e.w2
         |  LEFT JOIN c1 ON c1.train = tr.train AND c1.w1 = e.w1
         |  JOIN vocab ON vocab.train = tr.train),
         |mtx AS (
         |  SELECT train AS train_source, eval_source,
         |         CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         |         CAST((1000 * CAST(SUM(cnt * bits) AS BIGINT))
         |           // CAST(SUM(cnt) AS BIGINT) AS BIGINT) AS bpt_milli
         |  FROM sc GROUP BY 1, 2),
         |slf AS (
         |  SELECT eval_source, bpt_milli AS self_bpt_milli
         |  FROM mtx WHERE train_source = eval_source)
         |SELECT m.train_source, m.eval_source, m.n_bigrams, m.bpt_milli,
         |       s.self_bpt_milli,
         |       m.bpt_milli - s.self_bpt_milli AS transfer_gap_milli
         |FROM mtx m JOIN slf s ON s.eval_source = m.eval_source
         |ORDER BY m.train_source, m.eval_source""".stripMargin,

    // q52's unrolled fit (a2/c2n) + nearest-other-centroid distances;
    // s = (√b−√a)/max(√a,√b) — a fixed IEEE chain on exact integers
    "q331_silhouette" ->
      s"""WITH $kmeansCtes,
         |sd AS (
         |  SELECT a.vec_id, a.cluster, a.dist,
         |         MIN(a.n2 + c.c_n2 - 2 * CAST(list_sum(list_transform(
         |           range(1, len(a.q) + 1), i -> a.q[i] * c.centroid[i]))
         |           AS BIGINT)) AS b2
         |  FROM a2 a JOIN c2n c ON c.cluster <> a.cluster
         |  GROUP BY 1, 2, 3),
         |sv AS (
         |  SELECT cluster,
         |         CASE WHEN greatest(dist, b2) = 0 THEN 0
         |              ELSE CAST(FLOOR(1000.0 *
         |                (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(dist AS DOUBLE)))
         |                / greatest(sqrt(CAST(dist AS DOUBLE)),
         |                           sqrt(CAST(b2 AS DOUBLE)))) AS BIGINT)
         |         END AS s_milli
         |  FROM sd),
         |rows0 AS (
         |  SELECT CAST(cluster AS BIGINT) AS cluster,
         |         CAST(COUNT(*) AS BIGINT) AS n_points,
         |         CAST(SUM(s_milli) AS BIGINT) AS s,
         |         CAST(SUM(CASE WHEN s_milli < 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_negative
         |  FROM sv GROUP BY 1
         |  UNION ALL
         |  SELECT -1, CAST(COUNT(*) AS BIGINT),
         |         CAST(SUM(s_milli) AS BIGINT),
         |         CAST(SUM(CASE WHEN s_milli < 0 THEN 1 ELSE 0 END)
         |           AS BIGINT)
         |  FROM sv)
         |SELECT cluster, n_points, s // n_points AS mean_silhouette_milli,
         |       n_negative
         |FROM rows0
         |ORDER BY cluster""".stripMargin,

    // side totals count EVERY row (the q138 invalid-JSON accounting);
    // key set from json_keys; integral rate arithmetic
    "q332_props_key_drift" ->
      s"""WITH e AS (
         |  SELECT CASE WHEN CAST(ts AS DATE)
         |           < DATE '${Queries.DriftSplitDate}'
         |         THEN 'ref' ELSE 'cur' END AS side, props
         |  FROM events WHERE ts IS NOT NULL),
         |tot AS (
         |  SELECT CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS ref_total,
         |         CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS cur_total
         |  FROM e),
         |k AS (
         |  SELECT side, unnest(json_keys(props)) AS key
         |  FROM e WHERE props IS NOT NULL),
         |g AS (
         |  SELECT key,
         |         CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS ref_n,
         |         CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS cur_n
         |  FROM k GROUP BY 1)
         |SELECT g.key, g.ref_n, g.cur_n,
         |       CASE WHEN ref_total > 0
         |            THEN (10000 * ref_n) // ref_total END AS ref_bp,
         |       CASE WHEN cur_total > 0
         |            THEN (10000 * cur_n) // cur_total END AS cur_bp,
         |       (CASE WHEN cur_total > 0
         |             THEN (10000 * cur_n) // cur_total END)
         |         - (CASE WHEN ref_total > 0
         |              THEN (10000 * ref_n) // ref_total END) AS delta_bp,
         |       CASE WHEN ref_n = 0 AND cur_n > 0 THEN 'new'
         |            WHEN ref_n > 0 AND cur_n = 0 THEN 'dropped'
         |            ELSE 'present' END AS status
         |FROM g, tot
         |ORDER BY g.key""".stripMargin,

    // cohort = min-month window on the one custkey clustering; whole-
    // cohort per-capita denominators; age-0 self-benchmark
    "q333_revenue_cohort_triangle" -> {
      val maxAge = Queries.TriangleMaxAge
      s"""WITH om AS (
         |  SELECT o_custkey AS cust,
         |         CAST(12 * year(o_orderdate) + month(o_orderdate) - 1
         |           AS BIGINT) AS m,
         |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL),
         |w AS (
         |  SELECT cust, m, cents,
         |         MIN(m) OVER (PARTITION BY cust) AS m0
         |  FROM om),
         |coh AS (
         |  SELECT m0, CAST(COUNT(DISTINCT cust) AS BIGINT)
         |           AS cohort_users
         |  FROM w GROUP BY 1),
         |cells AS (
         |  SELECT m0, m - m0 AS age,
         |         CAST(COUNT(DISTINCT cust) AS BIGINT) AS active_users,
         |         CAST(SUM(cents) AS BIGINT) AS revenue_cents
         |  FROM w WHERE m - m0 <= $maxAge GROUP BY 1, 2),
         |cc AS (
         |  SELECT cells.*, coh.cohort_users,
         |         (1000 * revenue_cents) // cohort_users
         |           AS rev_per_user_milli
         |  FROM cells JOIN coh USING (m0)),
         |a0 AS (
         |  SELECT m0, rev_per_user_milli AS rpu0 FROM cc WHERE age = 0)
         |SELECT printf('%04d-%02d', CAST(cc.m0 // 12 AS INT),
         |         CAST(cc.m0 % 12 + 1 AS INT)) AS cohort_month,
         |       cc.age AS age_months, cc.cohort_users, cc.active_users,
         |       cc.revenue_cents, cc.rev_per_user_milli,
         |       CASE WHEN a0.rpu0 > 0 THEN
         |         (10000 * cc.rev_per_user_milli) // a0.rpu0
         |       END AS vs_age0_bp
         |FROM cc JOIN a0 ON a0.m0 = cc.m0
         |ORDER BY cohort_month, age_months""".stripMargin
    },

    // dense-spine binseg: A = n·S_τ − τ·S in HUGEINT, argmax on
    // ⌊A²/B⌋ (earliest-day ties), sign·⌊|A|/B⌋ delta (the nonneg-DIV
    // cross-engine rule), q204-style isqrt for the score
    "q334_changepoint" -> {
      val isq = isqrtDuck("b")
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (SELECT MIN(daynum) AS mn, MAX(daynum) AS mx FROM d),
         |dn AS (
         |  SELECT t.dd AS daynum, COALESCE(d.cents, 0) AS cents
         |  FROM (SELECT unnest(generate_series(mn, mx)) AS dd FROM sp) t
         |  LEFT JOIN d ON d.daynum = t.dd),
         |w AS (
         |  SELECT daynum,
         |         row_number() OVER (ORDER BY daynum) AS tau,
         |         SUM(cents) OVER (ORDER BY daynum
         |           ROWS UNBOUNDED PRECEDING) AS s_tau,
         |         COUNT(*) OVER () AS n, SUM(cents) OVER () AS s
         |  FROM dn),
         |g AS (
         |  SELECT daynum, tau, s_tau, n, s,
         |         CAST(n AS HUGEINT) * s_tau - CAST(tau AS HUGEINT) * s AS a,
         |         CAST(tau * (n - tau) AS BIGINT) AS b
         |  FROM w WHERE tau < n),
         |q AS (SELECT *, (a * a) // b AS qq FROM g),
         |pick AS (
         |  SELECT * FROM q
         |  QUALIFY row_number() OVER (ORDER BY qq DESC, daynum ASC) = 1)
         |SELECT strftime(DATE '1970-01-01' + INTERVAL (daynum) DAY,
         |         '%Y-%m-%d') AS split_day,
         |       CAST(n AS BIGINT) AS n_days,
         |       CAST(tau AS BIGINT) AS n_before,
         |       CAST(n - tau AS BIGINT) AS n_after,
         |       CAST(s_tau // tau AS BIGINT) AS mean_before_cents,
         |       CAST((s - s_tau) // (n - tau) AS BIGINT) AS mean_after_cents,
         |       CAST((CASE WHEN a < 0 THEN -1 ELSE 1 END)
         |         * (abs(a) // b) AS BIGINT) AS delta_cents,
         |       CAST(abs(a) // $isq AS BIGINT) AS score_cents
         |FROM pick""".stripMargin
    },

    // md5(user:rep) re-draws (the q289 replicate-key convention);
    // |t| magnitudes via nonneg HUGEINT DIVs; add-one p
    "q335_permutation_test" -> {
      val reps = Queries.PermutationReps
      val nib = (c: String, i: Int) =>
        s"(instr('0123456789abcdef', substr($c, $i, 1)) - 1)"
      def draw32(c: String) = (1 to 8)
        .map(i => s"${nib(c, i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |au AS (
         |  SELECT m, CAST(${draw32("md5(CAST(user_id AS VARCHAR))")}
         |           AS BIGINT) % 100 < 50 AS in_a
         |  FROM u),
         |obs AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_a,
         |         CAST(SUM(CASE WHEN in_a THEN m ELSE 0 END) AS BIGINT)
         |           AS s_a,
         |         CAST(SUM(m) AS BIGINT) AS s
         |  FROM au),
         |obs2 AS (
         |  SELECT n, n_a, s_a, s,
         |         CASE WHEN n_a = 0 OR n = n_a THEN NULL ELSE
         |           CAST((CASE WHEN CAST(s_a AS HUGEINT) * (n - n_a)
         |                   < CAST(s - s_a AS HUGEINT) * n_a
         |                 THEN -1 ELSE 1 END)
         |             * ((1000000 * abs(CAST(s_a AS HUGEINT) * (n - n_a)
         |                 - CAST(s - s_a AS HUGEINT) * n_a))
         |               // (CAST(n_a AS HUGEINT) * (n - n_a))) AS BIGINT)
         |         END AS t_obs_micro
         |  FROM obs),
         |pr AS (
         |  SELECT rep,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
         |           AS na,
         |         CAST(SUM(CASE WHEN in_a THEN m ELSE 0 END) AS BIGINT)
         |           AS sa,
         |         CAST(SUM(m) AS BIGINT) AS sr
         |  FROM (
         |    SELECT u.m, r.rep,
         |           CAST(${draw32("md5(CAST(user_id AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR))")}
         |             AS BIGINT) % 100 < 50 AS in_a
         |    FROM u CROSS JOIN
         |      (SELECT unnest(generate_series(1, $reps)) AS rep) r)
         |  GROUP BY 1),
         |pt AS (
         |  SELECT rep,
         |         CASE WHEN na = 0 OR n = na THEN NULL ELSE
         |           CAST((1000000 * abs(CAST(sa AS HUGEINT) * (n - na)
         |               - CAST(sr - sa AS HUGEINT) * na))
         |             // (CAST(na AS HUGEINT) * (n - na)) AS BIGINT)
         |         END AS t_abs_micro
         |  FROM pr)
         |SELECT o.n AS n_users, o.n_a, o.n - o.n_a AS n_b,
         |       o.t_obs_micro,
         |       CAST(COUNT(*) AS BIGINT) AS reps,
         |       CAST(SUM(CASE WHEN COALESCE(pt.t_abs_micro, 0)
         |           >= abs(COALESCE(o.t_obs_micro, 0)) THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_extreme,
         |       (1000 * (1 + CAST(SUM(CASE WHEN COALESCE(pt.t_abs_micro, 0)
         |           >= abs(COALESCE(o.t_obs_micro, 0)) THEN 1 ELSE 0 END)
         |         AS BIGINT))) // (CAST(COUNT(*) AS BIGINT) + 1) AS p_milli
         |FROM pt, obs2 o
         |GROUP BY 1, 2, 3, 4""".stripMargin
    },

    // exact-moment MDE ladder: HUGEINT variances DIV'd to milli,
    // pico SE sum, one q204 isqrt, fixed z milli 1960+842
    "q336_mde_power" -> {
      val z = 1960L + 842L
      val isq = isqrtDuck("se2_pico")
      s"""WITH u AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |au AS (
         |  SELECT m, CASE WHEN CAST(${(1 to 8).map(i =>
           s"(instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
           .mkString(" + ")} AS BIGINT) % 100 < 50
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |mo AS (
         |  SELECT
         |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_a,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_b,
         |    CAST(SUM(CASE WHEN arm = 'A' THEN m ELSE 0 END) AS BIGINT)
         |      AS s_a,
         |    CAST(SUM(CASE WHEN arm = 'B' THEN m ELSE 0 END) AS BIGINT)
         |      AS s_b,
         |    SUM(CASE WHEN arm = 'A' THEN CAST(m AS HUGEINT) * m
         |        ELSE 0 END) AS q_a,
         |    SUM(CASE WHEN arm = 'B' THEN CAST(m AS HUGEINT) * m
         |        ELSE 0 END) AS q_b
         |  FROM au),
         |v AS (
         |  SELECT n_a, n_b, s_a, s_b,
         |    CASE WHEN n_a > 0 THEN (1000 * s_a) // n_a END AS mean_a_milli,
         |    CASE WHEN n_b > 0 THEN (1000 * s_b) // n_b END AS mean_b_milli,
         |    CASE WHEN n_a > 1 THEN CAST((1000 *
         |        (n_a * q_a - CAST(s_a AS HUGEINT) * s_a))
         |      // (CAST(n_a AS HUGEINT) * (n_a - 1)) AS BIGINT)
         |    END AS var_a_milli,
         |    CASE WHEN n_b > 1 THEN CAST((1000 *
         |        (n_b * q_b - CAST(s_b AS HUGEINT) * s_b))
         |      // (CAST(n_b AS HUGEINT) * (n_b - 1)) AS BIGINT)
         |    END AS var_b_milli
         |  FROM mo),
         |se AS (
         |  SELECT *, CASE WHEN n_a > 1 AND n_b > 1 THEN
         |      (1000000000 * var_a_milli) // n_a
         |        + (1000000000 * var_b_milli) // n_b
         |    END AS se2_pico
         |  FROM v),
         |md AS (
         |  SELECT *, CASE WHEN se2_pico IS NOT NULL THEN
         |      ($z * $isq) // 1000 END AS mde_abs_micro
         |  FROM se)
         |SELECT n_a, n_b, mean_a_milli, mean_b_milli, var_a_milli,
         |       var_b_milli, mde_abs_micro,
         |       CASE WHEN mde_abs_micro IS NOT NULL AND s_a + s_b > 0 THEN
         |         CAST((10000 * CAST(mde_abs_micro AS HUGEINT) * (n_a + n_b))
         |           // (1000000 * (CAST(s_a AS HUGEINT) + s_b)) AS BIGINT)
         |       END AS mde_rel_bp
         |FROM md""".stripMargin
    },

    // Deng et al. delta-method ladder: HUGEINT cross-moments, milli
    // ratio, micro-scaled variance numerator, q204 isqrt, z=1960
    "q337_ratio_delta" -> {
      val isq = isqrtHuge("vb")
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
         |           THEN CAST(FLOOR(value * 100.0) AS BIGINT) END), 0)
         |           AS BIGINT) AS r,
         |         CAST(COUNT(*) AS BIGINT) AS s
         |  FROM events GROUP BY 1),
         |au AS (
         |  SELECT r, s, CASE WHEN CAST(${(1 to 8).map(i =>
           s"(instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
           .mkString(" + ")} AS BIGINT) % 100 < 50
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |mo AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(SUM(r) AS BIGINT) AS sum_cents,
         |         CAST(SUM(s) AS BIGINT) AS sum_events,
         |         SUM(CAST(r AS HUGEINT) * r) AS qrr,
         |         SUM(CAST(r AS HUGEINT) * s) AS qrs,
         |         SUM(CAST(s AS HUGEINT) * s) AS qss
         |  FROM au GROUP BY 1),
         |rr AS (
         |  SELECT *, CASE WHEN sum_events > 0
         |    THEN (1000 * sum_cents) // sum_events END AS ratio_milli
         |  FROM mo),
         |vn AS (
         |  SELECT *, CASE WHEN ratio_milli IS NOT NULL THEN
         |      1000000 * (n_users * qrr
         |          - CAST(sum_cents AS HUGEINT) * sum_cents)
         |        - 2000 * ratio_milli * (n_users * qrs
         |          - CAST(sum_cents AS HUGEINT) * sum_events)
         |        + CAST(ratio_milli AS HUGEINT) * ratio_milli
         |          * (n_users * qss
         |            - CAST(sum_events AS HUGEINT) * sum_events)
         |    END AS vnum
         |  FROM rr),
         |sb AS (
         |  SELECT *, CASE WHEN n_users > 1 AND vnum IS NOT NULL THEN
         |      greatest(vnum, 0::HUGEINT) // (n_users - 1)
         |    END AS vb
         |  FROM vn),
         |se AS (
         |  SELECT *, CASE WHEN vb IS NOT NULL THEN
         |      $isq // sum_events END AS se_milli
         |  FROM sb)
         |SELECT arm, n_users, sum_cents, sum_events, ratio_milli,
         |       se_milli,
         |       ratio_milli - (1960 * se_milli) // 1000 AS ci_lo_milli,
         |       ratio_milli + (1960 * se_milli) // 1000 AS ci_hi_milli
         |FROM se ORDER BY arm""".stripMargin
    },

    // bounded truss peel (q277's unroll at EDGE grain): per round a
    // wedge-join support count, zero-support edges kept via left
    // join. Round CTEs are MATERIALIZED — each round references its
    // predecessor several times, and DuckDB's default inlining
    // re-evaluates the whole sessionize chain exponentially (>2 min
    // naive, <1 s materialized — same rows either way)
    "q338_ktruss" -> {
      val k = Queries.KtrussK
      val iters = Queries.KtrussIters
      def roundCtes(i: Int): String = {
        val prev = if (i == 0) "u0" else s"u$i"
        s"""sy$i AS MATERIALIZED (
           |  SELECT src AS a, dst AS b FROM $prev
           |  UNION ALL SELECT dst, src FROM $prev),
           |sp$i AS MATERIALIZED (
           |  SELECT u.src, u.dst, CAST(COUNT(*) AS BIGINT) AS sup
           |  FROM $prev u
           |  JOIN sy$i w1 ON w1.a = u.src
           |  JOIN sy$i w2 ON w2.a = u.dst AND w2.b = w1.b
           |  GROUP BY 1, 2),
           |ws$i AS MATERIALIZED (
           |  SELECT u.src, u.dst, COALESCE(sp$i.sup, 0) AS support
           |  FROM $prev u LEFT JOIN sp$i
           |    ON sp$i.src = u.src AND sp$i.dst = u.dst),
           |r$i AS (
           |  SELECT CAST($i AS BIGINT) AS round,
           |         CAST(COUNT(*) AS BIGINT) AS n_edges,
           |         CAST((SELECT COUNT(*) FROM (
           |             SELECT src AS v FROM ws$i
           |             UNION SELECT dst FROM ws$i)) AS BIGINT)
           |           AS n_vertices,
           |         MIN(support) AS min_support,
           |         ${if (i == iters)
               s"CAST(COUNT(*) = 0 OR MIN(support) >= ${k - 2} AS INT)"
             else "CAST(NULL AS INT)"} AS converged
           |  FROM ws$i)${if (i < iters)
             s""",
             |u${i + 1} AS MATERIALIZED (
             |  SELECT src, dst FROM ws$i WHERE support >= ${k - 2})"""
               .stripMargin
           else ""}""".stripMargin
      }
      s"""$sessionCte,
         |${coVisEdgesCte(Queries.CoVisitMaxItems, 1L)},
         |u0 AS MATERIALIZED (
         |  SELECT src, dst FROM edg WHERE src < dst),
         |${(0 to iters).map(roundCtes).mkString(",\n")}
         |SELECT * FROM (
         |  ${(0 to iters).map(i => s"SELECT * FROM r$i").mkString("\n  UNION ALL ")})
         |ORDER BY round""".stripMargin
    },

    // one scored pass (q308's quantized cosine), per-source top-k
    // candidates, then the 20 exclusion panels + the __all__ panel
    // re-rank candidates only
    "q339_source_value_knn" -> {
      val k = Queries.SourceValueK
      val pm = Queries.SourceValueProbeMod
      s"""WITH $embQuantCte,
         |lab AS (
         |  SELECT n.vec_id, e.label, d.source, n.q, n.n2
         |  FROM n JOIN embeddings e ON e.vec_id = n.vec_id
         |  JOIN documents d ON d.doc_id = n.vec_id
         |  WHERE d.source IS NOT NULL),
         |queries AS (
         |  SELECT vec_id AS query_id, label AS q_label, q AS q_q,
         |         n2 AS q_n2
         |  FROM lab WHERE vec_id % $pm = 0),
         |scored AS (
         |  SELECT lab.vec_id AS neighbor_id, lab.label, lab.source,
         |         queries.query_id, queries.q_label,
         |         CASE WHEN lab.n2 = 0 OR queries.q_n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                CAST(list_sum(list_transform(
         |                  range(1, len(lab.q) + 1),
         |                  i -> lab.q[i] * queries.q_q[i])) AS BIGINT) /
         |                (sqrt(CAST(lab.n2 AS DOUBLE)) *
         |                 sqrt(CAST(queries.q_n2 AS DOUBLE))))
         |                AS BIGINT)
         |         END AS cos_bp
         |  FROM lab, queries WHERE lab.vec_id != queries.query_id),
         |cand AS (
         |  SELECT query_id, q_label, neighbor_id, label, source, cos_bp
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY query_id, source
         |          ORDER BY cos_bp DESC, neighbor_id ASC) AS srk
         |        FROM scored)
         |  WHERE srk <= $k),
         |srcs AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_vectors
         |  FROM lab GROUP BY 1),
         |panels AS (
         |  SELECT s.source AS excl, c.*
         |  FROM cand c JOIN srcs s ON c.source <> s.source
         |  UNION ALL
         |  SELECT '__all__', c.* FROM cand c),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY excl, query_id
         |    ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |  FROM panels),
         |votes AS (
         |  SELECT excl, query_id, q_label, label,
         |         CAST(COUNT(*) AS BIGINT) AS votes
         |  FROM ranked WHERE rank <= $k GROUP BY 1, 2, 3, 4),
         |pred AS (
         |  SELECT excl, query_id, q_label, label,
         |         row_number() OVER (PARTITION BY excl, query_id
         |           ORDER BY votes DESC, label ASC) AS vr
         |  FROM votes),
         |acc AS (
         |  SELECT excl,
         |         CAST(FLOOR(10000.0 *
         |           SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
         |           / COUNT(*)) AS BIGINT) AS acc_bp
         |  FROM pred WHERE vr = 1 GROUP BY 1)
         |SELECT srcs.source, srcs.n_vectors,
         |       f.acc_bp AS acc_full_bp,
         |       w.acc_bp AS acc_without_bp,
         |       f.acc_bp - w.acc_bp AS value_bp
         |FROM srcs
         |LEFT JOIN acc w ON w.excl = srcs.source
         |CROSS JOIN (SELECT acc_bp FROM acc WHERE excl = '__all__') f
         |ORDER BY srcs.source""".stripMargin
    },

    // observed-day lead walk: a step > 1 opens [daynum+1, next−1]
    "q340_gap_islands" ->
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |g AS (
         |  SELECT daynum, cents,
         |         lead(daynum) OVER (ORDER BY daynum) AS nxt
         |  FROM d)
         |SELECT strftime(DATE '1970-01-01' + INTERVAL (daynum + 1) DAY,
         |         '%Y-%m-%d') AS gap_start,
         |       strftime(DATE '1970-01-01' + INTERVAL (nxt - 1) DAY,
         |         '%Y-%m-%d') AS gap_end,
         |       CAST(nxt - daynum - 1 AS BIGINT) AS gap_days,
         |       cents AS prev_day_cents
         |FROM g
         |WHERE nxt IS NOT NULL AND nxt - daynum > 1
         |ORDER BY gap_start""".stripMargin,

    // sample² k-occurrence counts (antihubs kept via left join), then
    // the n-scaled central-moment skew ladder in HUGEINT with the
    // same ⌊√⌋ composition as the Spark side
    "q341_hubness" -> {
      val k = Queries.HubnessK
      val sm = Queries.HubnessSampleMod
      s"""WITH $embQuantCte,
         |s AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % $sm = 0),
         |scored AS (
         |  SELECT a.vec_id AS neighbor_id, b.vec_id AS query_id,
         |         CASE WHEN a.n2 = 0 OR b.n2 = 0 THEN 0
         |              ELSE CAST(FLOOR(10000.0 *
         |                CAST(list_sum(list_transform(
         |                  range(1, len(a.q) + 1),
         |                  i -> a.q[i] * b.q[i])) AS BIGINT) /
         |                (sqrt(CAST(a.n2 AS DOUBLE)) *
         |                 sqrt(CAST(b.n2 AS DOUBLE)))) AS BIGINT)
         |         END AS cos_bp
         |  FROM s a, s b WHERE a.vec_id != b.vec_id),
         |occ AS (
         |  SELECT neighbor_id, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY cos_bp DESC, neighbor_id ASC) AS rank
         |        FROM scored)
         |  WHERE rank <= $k GROUP BY 1),
         |cts AS (
         |  SELECT COALESCE(occ.c, 0) AS c
         |  FROM s LEFT JOIN occ ON occ.neighbor_id = s.vec_id),
         |mo AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(c) AS BIGINT) AS sc,
         |         CAST(MAX(c) AS BIGINT) AS max_occ,
         |         CAST(SUM(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_antihubs,
         |         CAST(SUM(CASE WHEN c > ${2 * k} THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_hubs,
         |         SUM(CAST(c AS HUGEINT) * c) AS s2,
         |         SUM(CAST(c AS HUGEINT) * c * c) AS s3
         |  FROM cts),
         |d AS (
         |  SELECT *,
         |         CAST(n AS HUGEINT) * n * s2
         |           - CAST(n AS HUGEINT) * sc * sc AS d2,
         |         CAST(n AS HUGEINT) * n * n * s3
         |           - 3 * CAST(n AS HUGEINT) * n * s2 * sc
         |           + 2 * CAST(n AS HUGEINT) * sc * sc * sc AS d3
         |  FROM mo)
         |SELECT n AS n_sample, CAST($k AS BIGINT) AS k, max_occ,
         |       n_antihubs, n_hubs,
         |       CASE WHEN d2 > 0 THEN CAST(
         |         (CASE WHEN d3 < 0 THEN -1 ELSE 1 END) *
         |         ((1000 * abs(d3) * ${isqrtHuge("CAST(n AS HUGEINT)")})
         |          // (d2 * ${isqrtHuge("d2")})) AS BIGINT)
         |       END AS skew_milli
         |FROM d""".stripMargin
    },

    // q260 doubled midranks per series, exact HUGEINT Pearson-on-
    // ranks with one isqrt of the cross product, sign outside
    "q342_spearman_daily" ->
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS d,
         |         CAST(COUNT(*) AS BIGINT) AS x,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS y
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |rx AS (
         |  SELECT x, 2 * (cum - cnt) + cnt + 1 AS rx, cnt AS cntx
         |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
         |          SUM(COUNT(*)) OVER (ORDER BY x
         |            ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM daily GROUP BY 1)),
         |ry AS (
         |  SELECT y, 2 * (cum - cnt) + cnt + 1 AS ry, cnt AS cnty
         |  FROM (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt,
         |          SUM(COUNT(*)) OVER (ORDER BY y
         |            ROWS UNBOUNDED PRECEDING) AS cum
         |        FROM daily GROUP BY 1)),
         |rk AS (
         |  SELECT daily.d, rx.rx, ry.ry, rx.cntx, ry.cnty
         |  FROM daily JOIN rx USING (x) JOIN ry USING (y)),
         |mo AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(rx) AS BIGINT) AS sx,
         |         CAST(SUM(ry) AS BIGINT) AS sy,
         |         SUM(CAST(rx AS HUGEINT) * rx) AS sxx,
         |         SUM(CAST(ry AS HUGEINT) * ry) AS syy,
         |         SUM(CAST(rx AS HUGEINT) * ry) AS sxy,
         |         CAST(COUNT(DISTINCT CASE WHEN cntx > 1 THEN rx END)
         |           AS BIGINT) AS tie_groups_x,
         |         CAST(COUNT(DISTINCT CASE WHEN cnty > 1 THEN ry END)
         |           AS BIGINT) AS tie_groups_y
         |  FROM rk),
         |dd AS (
         |  SELECT *, n * sxy - CAST(sx AS HUGEINT) * sy AS num,
         |         n * sxx - CAST(sx AS HUGEINT) * sx AS dx,
         |         n * syy - CAST(sy AS HUGEINT) * sy AS dy
         |  FROM mo)
         |SELECT n AS n_days,
         |       CASE WHEN dx > 0 AND dy > 0 THEN CAST(
         |         (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
         |         ((1000 * abs(num)) // ${isqrtHuge("dx * dy")})
         |         AS BIGINT)
         |       END AS rho_milli,
         |       tie_groups_x, tie_groups_y
         |FROM dd""".stripMargin,

    // exact micro Wilson ladder: shared inner DIV + isqrt floors,
    // z=1960 milli / c=z²=3 841 600 micro, lower bound floored at 0
    "q343_wilson_ci" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(draw, $i, 1)) - 1)"
      val draw32 = (1 to 8)
        .map(i => s"${nib(i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH u AS (
         |  SELECT user_id,
         |         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1
         |           ELSE 0 END) AS BIGINT) AS conv
         |  FROM events GROUP BY 1),
         |a AS (
         |  SELECT conv, CASE WHEN CAST($draw32 AS BIGINT) % 100 < 50
         |           THEN 'A' ELSE 'B' END AS arm
         |  FROM (SELECT user_id, conv,
         |          md5(CAST(user_id AS VARCHAR)) AS draw FROM u)),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         |         CAST(SUM(conv) AS BIGINT) AS x
         |  FROM a GROUP BY 1),
         |r AS (
         |  SELECT *, ${isqrtHuge(
           "(4000000 * CAST(x AS HUGEINT) * (n_users - x)) // n_users" +
             " + 3841600")} AS root,
         |         2 * (1000000 * CAST(n_users AS HUGEINT) + 3841600)
         |           AS den
         |  FROM g)
         |SELECT arm, n_users, x AS n_converted,
         |       (1000000 * x) // n_users AS p_micro,
         |       CAST((1000000 * greatest(2000000 * CAST(x AS HUGEINT)
         |           + 3841600 - 1960 * root, 0::HUGEINT))
         |         // den AS BIGINT) AS wilson_lo_micro,
         |       CAST((1000000 * (2000000 * CAST(x AS HUGEINT)
         |           + 3841600 + 1960 * root))
         |         // den AS BIGINT) AS wilson_hi_micro
         |FROM r ORDER BY arm""".stripMargin
    },

    // per-month exact Gini ladder at customer grain (ties commute in
    // Σi·cᵢ, so the rank tie-break can't move the sum) + top-decile
    // share with k = max(1, n//10)
    "q345_gini_trend" ->
      s"""WITH cm AS (
         |  SELECT (EXTRACT(year FROM CAST(o_orderdate AS DATE)) * 12
         |           + EXTRACT(month FROM CAST(o_orderdate AS DATE)) - 1)
         |           AS m,
         |         o_custkey AS cust,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL
         |  GROUP BY 1, 2),
         |rk AS (
         |  SELECT m, cents,
         |         row_number() OVER (PARTITION BY m
         |           ORDER BY cents ASC, cust ASC) AS i,
         |         row_number() OVER (PARTITION BY m
         |           ORDER BY cents DESC, cust DESC) AS rd,
         |         greatest(1, COUNT(*) OVER (PARTITION BY m) // 10)
         |           AS k10
         |  FROM cm),
         |g AS (
         |  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_customers,
         |         CAST(SUM(cents) AS BIGINT) AS revenue_cents,
         |         SUM(CAST(i AS HUGEINT) * cents) AS s1,
         |         CAST(SUM(CASE WHEN rd <= k10 THEN cents ELSE 0 END)
         |           AS BIGINT) AS top
         |  FROM rk GROUP BY 1)
         |SELECT printf('%04d-%02d', CAST(m // 12 AS INT),
         |         CAST(m % 12 + 1 AS INT)) AS month,
         |       n_customers, revenue_cents,
         |       CASE WHEN revenue_cents > 0 THEN
         |         CAST((10000 * (2 * s1
         |             - (CAST(n_customers AS HUGEINT) + 1) * revenue_cents))
         |           // (CAST(n_customers AS HUGEINT) * revenue_cents)
         |           AS BIGINT) END AS gini_bp,
         |       CASE WHEN revenue_cents > 0 THEN
         |         CAST((10000 * CAST(top AS HUGEINT)) // revenue_cents
         |           AS BIGINT) END AS top_decile_bp
         |FROM g ORDER BY month""".stripMargin,

    // ≤100-row ending histogram; head by (count desc, ending asc),
    // rest rollup keeps shares closed; expectation 100bp per ending
    "q346_price_endings" ->
      s"""WITH h AS (
         |  SELECT ((CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) % 100)
         |          + 100) % 100 AS e,
         |         CAST(COUNT(*) AS BIGINT) AS n
         |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         |lab AS (
         |  SELECT CASE WHEN row_number() OVER (ORDER BY n DESC, e ASC)
         |           <= 8 THEN printf('%02d', e) ELSE 'rest' END AS ending,
         |         n
         |  FROM h),
         |g AS (
         |  SELECT ending, CAST(SUM(n) AS BIGINT) AS n_prices,
         |         CAST(COUNT(*) AS BIGINT) AS ne
         |  FROM lab GROUP BY 1)
         |SELECT ending, n_prices,
         |       CAST((10000 * n_prices)
         |         // (SELECT SUM(n_prices) FROM g) AS BIGINT) AS share_bp,
         |       100 * ne AS expected_bp,
         |       CAST((10000 * n_prices)
         |           // (SELECT SUM(n_prices) FROM g)
         |         - 100 * ne AS BIGINT) AS excess_bp
         |FROM g ORDER BY n_prices DESC, ending""".stripMargin,

    // q316's pair chain at rep grain (no LIMIT) → recursive min-label
    // reach CC (the q201 pattern, symmetric edges) → singleton-keeping
    // entity map → part/fact rollup; head (revenue desc, id asc)
    "q347_entity_rollup" ->
      s"""WITH RECURSIVE names AS MATERIALIZED (
         |  SELECT p_name AS name,
         |         CAST(MIN(p_partkey) AS BIGINT) AS rep_id,
         |         CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM part WHERE p_name IS NOT NULL GROUP BY 1),
         |tk AS (
         |  SELECT name, tok
         |  FROM (SELECT name,
         |          unnest(list_distinct(string_split(name, ' '))) AS tok
         |        FROM names) t
         |  WHERE length(tok) > 0),
         |tk2 AS MATERIALIZED (
         |  SELECT name, tok
         |  FROM (SELECT name, tok,
         |          row_number() OVER (PARTITION BY tok ORDER BY name) AS rk
         |        FROM tk) t
         |  WHERE rk <= 1000),
         |pr AS MATERIALIZED (
         |  SELECT na.rep_id AS rep_a, nb.rep_id AS rep_b
         |  FROM (SELECT DISTINCT a.name AS name_a, b.name AS name_b
         |        FROM tk2 a JOIN tk2 b
         |          ON a.tok = b.tok AND a.name < b.name) p
         |  JOIN names na ON na.name = p.name_a
         |  JOIN names nb ON nb.name = p.name_b
         |  WHERE levenshtein(p.name_a, p.name_b) <= ${Queries.FuzzyMaxDist}),
         |edg AS MATERIALIZED (
         |  SELECT rep_a AS src, rep_b AS dst FROM pr
         |  UNION SELECT rep_b, rep_a FROM pr),
         |nd AS (SELECT DISTINCT src AS nodev FROM edg),
         |reach(nodev, lbl) AS (
         |  SELECT nodev, nodev FROM nd
         |  UNION
         |  SELECT e.dst, r.lbl FROM reach r JOIN edg e ON e.src = r.nodev),
         |comp AS (SELECT nodev, MIN(lbl) AS component
         |         FROM reach GROUP BY 1),
         |ent AS MATERIALIZED (
         |  SELECT names.name, names.rep_id,
         |         COALESCE(comp.component, names.rep_id) AS entity_id
         |  FROM names LEFT JOIN comp ON comp.nodev = names.rep_id),
         |pm AS (
         |  SELECT part.p_partkey, ent.entity_id
         |  FROM part JOIN ent ON ent.name = part.p_name),
         |fact AS (
         |  SELECT pm.entity_id,
         |         CAST(COUNT(DISTINCT li.p) AS BIGINT) AS n_parts,
         |         CAST(COUNT(*) AS BIGINT) AS n_lines,
         |         CAST(SUM(li.cents) AS BIGINT) AS revenue_cents
         |  FROM (SELECT l_partkey AS p,
         |          CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents
         |        FROM lineitem) li
         |  JOIN pm ON pm.p_partkey = li.p
         |  GROUP BY 1)
         |SELECT ent.entity_id AS entity_id,
         |       CAST(COUNT(*) AS BIGINT) AS n_names,
         |       COALESCE(MAX(fact.n_parts), 0) AS n_parts,
         |       COALESCE(MAX(fact.n_lines), 0) AS n_lines,
         |       COALESCE(MAX(fact.revenue_cents), 0) AS revenue_cents
         |FROM ent LEFT JOIN fact ON fact.entity_id = ent.entity_id
         |GROUP BY ent.entity_id
         |ORDER BY revenue_cents DESC, ent.entity_id ASC
         |LIMIT 20""".stripMargin,

    // first event by the total (ts, id) order via one rn window;
    // horizons in exact micros
    "q348_channel_retention" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
         |  FROM events),
         |f AS (
         |  SELECT user_id, event_type AS channel, ts_us AS first_us
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |          ORDER BY ts_us, event_id) AS rn FROM e)
         |  WHERE rn = 1),
         |u AS (
         |  SELECT f.channel,
         |         CAST(MAX(CASE WHEN e.ts_us >= f.first_us
         |           + ${7L * 86400000000L} THEN 1 ELSE 0 END) AS BIGINT)
         |           AS r7,
         |         CAST(MAX(CASE WHEN e.ts_us >= f.first_us
         |           + ${14L * 86400000000L} THEN 1 ELSE 0 END) AS BIGINT)
         |           AS r14
         |  FROM e JOIN f USING (user_id)
         |  GROUP BY e.user_id, f.channel)
         |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_users,
         |       CAST(SUM(r7) AS BIGINT) AS retained_7d,
         |       CAST(SUM(r14) AS BIGINT) AS retained_14d,
         |       (10000 * CAST(SUM(r7) AS BIGINT)) // COUNT(*)
         |         AS retention_7d_bp,
         |       (10000 * CAST(SUM(r14) AS BIGINT)) // COUNT(*)
         |         AS retention_14d_bp
         |FROM u GROUP BY 1 ORDER BY channel""".stripMargin,

    // the q329 prior-cum boundary per ship-date half (midpoint
    // inclusive left), FULL OUTER with 'absent' for entries/exits
    "q349_abc_migration" -> {
      def cls(half: String) =
        s"""SELECT partkey, rev,
           |       CASE WHEN CAST(cum - rev AS HUGEINT) * 10000
           |              < 8000 * CAST(totrev AS HUGEINT) THEN 'A'
           |            WHEN CAST(cum - rev AS HUGEINT) * 10000
           |              < 9500 * CAST(totrev AS HUGEINT) THEN 'B'
           |            ELSE 'C' END AS cls
           |FROM (
           |  SELECT partkey, rev,
           |         CAST(SUM(rev) OVER (ORDER BY rev DESC, partkey
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |         CAST(SUM(rev) OVER () AS BIGINT) AS totrev
           |  FROM hp WHERE half = $half)""".stripMargin
      s"""WITH base AS (
         |  SELECT l_partkey AS partkey,
         |         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS d,
         |         CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT) AS cents
         |  FROM lineitem WHERE l_shipdate IS NOT NULL),
         |md AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM base),
         |hp AS MATERIALIZED (
         |  SELECT CASE WHEN d <= md.mid THEN 0 ELSE 1 END AS half,
         |         partkey, CAST(SUM(cents) AS BIGINT) AS rev
         |  FROM base, md GROUP BY 1, 2),
         |c0 AS (${cls("0")}),
         |c1 AS (${cls("1")})
         |SELECT COALESCE(c0.cls, 'absent') AS abc_from,
         |       COALESCE(c1.cls, 'absent') AS abc_to,
         |       CAST(COUNT(*) AS BIGINT) AS n_parts,
         |       CAST(SUM(COALESCE(c1.rev, 0)) AS BIGINT)
         |         AS revenue_to_cents
         |FROM c0 FULL OUTER JOIN c1 USING (partkey)
         |GROUP BY 1, 2
         |ORDER BY abc_from, abc_to""".stripMargin
    },

    // q91's matrix + 20 unrolled π·P rounds in exact ppm, floor
    // deficit to MIN(type) each round (the renormalize-out-dangling
    // hack); MATERIALIZED everywhere (the q338 inlining lesson)
    "q350_stationary_mix" -> {
      val iters = Queries.StationaryIters
      def norm(tag: String, src: String) =
        s"""${tag}a AS (
           |  SELECT t, CASE WHEN (SELECT SUM(raw) FROM $src) > 0
           |      THEN (1000000 * raw) // (SELECT SUM(raw) FROM $src)
           |      ELSE 0 END AS base
           |  FROM $src),
           |$tag AS MATERIALIZED (
           |  SELECT t, CAST(base + CASE WHEN t = (SELECT MIN(t) FROM ty)
           |      THEN 1000000 - (SELECT SUM(base) FROM ${tag}a)
           |      ELSE 0 END AS BIGINT) AS pi
           |  FROM ${tag}a)""".stripMargin
      val rounds = (1 to iters).map { i =>
        s"""r$i AS (
           |  SELECT ty.t, COALESCE(s.raw, 0) AS raw
           |  FROM ty LEFT JOIN (
           |    SELECT m.next_type AS t,
           |           CAST(SUM((CAST(p.pi AS HUGEINT) * m.c) // m.rs)
           |             AS BIGINT) AS raw
           |    FROM n${i - 1} p JOIN mat m ON m.prev_type = p.t
           |    GROUP BY 1) s USING (t)),
           |${norm(s"n$i", s"r$i")}""".stripMargin
      }.mkString(",\n")
      s"""$sessionCte,
         |st AS (
         |  SELECT user_id, session_seq, event_type,
         |         lag(event_type) OVER (PARTITION BY user_id, session_seq
         |           ORDER BY ts_us, event_id) AS prev_type
         |  FROM sz),
         |tr AS MATERIALIZED (
         |  SELECT prev_type, event_type AS next_type,
         |         CAST(COUNT(*) AS BIGINT) AS c
         |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |mat AS MATERIALIZED (
         |  SELECT tr.prev_type, tr.next_type, tr.c, tot.rs
         |  FROM tr JOIN (SELECT prev_type,
         |      CAST(SUM(c) AS BIGINT) AS rs FROM tr GROUP BY 1) tot
         |    USING (prev_type)),
         |ty AS MATERIALIZED (
         |  SELECT DISTINCT t FROM (
         |    SELECT prev_type AS t FROM tr
         |    UNION ALL SELECT next_type FROM tr)),
         |p0 AS (SELECT t, CAST(1 AS BIGINT) AS raw FROM ty),
         |${norm("n0", "p0")},
         |$rounds,
         |er AS (
         |  SELECT ty.t, COALESCE(s.raw, 0) AS raw
         |  FROM ty LEFT JOIN (
         |    SELECT next_type AS t, CAST(SUM(c) AS BIGINT) AS raw
         |    FROM tr GROUP BY 1) s USING (t)),
         |${norm("ne", "er")}
         |SELECT n$iters.t AS event_type,
         |       n$iters.pi AS stationary_ppm,
         |       ne.pi AS empirical_ppm,
         |       n$iters.pi - ne.pi AS delta_ppm
         |FROM n$iters JOIN ne USING (t)
         |ORDER BY event_type""".stripMargin
    },

    // the q114 score chain verbatim + the Kish ESS rollup: clamped
    // 2^(s−smax) integer weights, HUGEINT moments, ROLLUP 'ALL' row
    "q351_dsir_ess" -> {
      val nib = (i: Int) =>
        s"(instr('0123456789abcdef', substr(md5(f), $i, 1)) - 1)"
      val bucket =
        s"(${nib(5)} * 4096 + ${nib(6)} * 256 + ${nib(7)} * 16 + ${nib(8)})"
      val bkts = graft.ops.TextAnalysis.ClassifierBuckets
      val cb = Queries.EssClampBits
      s"""WITH tok AS (
         |  SELECT doc_id, source, lang, string_split(text, ' ') AS t
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (
         |  SELECT doc_id, source, lang, u.f AS f
         |  FROM tok, UNNEST(list_concat(t,
         |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS u(f)),
         |fb AS (SELECT doc_id, source, lang, $bucket AS bucket FROM f),
         |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM fb
         |       WHERE source = '${Queries.DsirTargetSource}' GROUP BY 1),
         |rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM fb GROUP BY 1),
         |tt AS (SELECT CAST(COALESCE(SUM(t_cnt), 0) AS BIGINT) AS t_tot FROM tc),
         |rt AS (SELECT CAST(COALESCE(SUM(r_cnt), 0) AS BIGINT) AS r_tot FROM rc),
         |w0 AS (
         |  SELECT bucket,
         |         COALESCE(t_cnt, 0) + 1 AS ta, t_tot + $bkts AS tb,
         |         r_cnt + 1 AS ra, r_tot + $bkts AS rb
         |  FROM rc LEFT JOIN tc USING (bucket), tt, rt),
         |w AS (
         |  SELECT bucket,
         |         ${flog2rSql("ta", "tb")} - ${flog2rSql("ra", "rb")} AS weight
         |  FROM w0),
         |ds AS MATERIALIZED (
         |  SELECT fb.source, CAST(SUM(weight) AS BIGINT) AS s
         |  FROM fb JOIN w USING (bucket)
         |  GROUP BY fb.doc_id, fb.source),
         |sm AS (SELECT MAX(s) AS smax FROM ds),
         |wt AS (
         |  SELECT source,
         |         CASE WHEN s - smax >= -$cb
         |           THEN (CAST(1 AS BIGINT) << CAST($cb + s - smax AS INT))
         |           ELSE 0 END AS w
         |  FROM ds, sm)
         |SELECT COALESCE(source, 'ALL') AS source,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CASE WHEN SUM(CAST(w AS HUGEINT) * w) > 0 THEN
         |         CAST((CAST(SUM(w) AS HUGEINT) * CAST(SUM(w) AS HUGEINT))
         |           // SUM(CAST(w AS HUGEINT) * w) AS BIGINT)
         |       END AS ess_docs,
         |       CASE WHEN SUM(CAST(w AS HUGEINT) * w) > 0 THEN
         |         (10000 * CAST((CAST(SUM(w) AS HUGEINT)
         |             * CAST(SUM(w) AS HUGEINT))
         |           // SUM(CAST(w AS HUGEINT) * w) AS BIGINT))
         |           // CAST(COUNT(*) AS BIGINT)
         |       END AS ess_share_bp
         |FROM wt
         |GROUP BY ROLLUP(source)
         |ORDER BY source""".stripMargin
    },

    // reference-decile PSI: q203 edge walk on the ref half, range
    // assignment of the cur half, add-1 ppm shares, per-bin micro
    // ln terms floored BEFORE any total (the doubles rule)
    "q352_psi_drift" ->
      s"""WITH base AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS d,
         |         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders
         |  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         |md AS (SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM base),
         |sides AS MATERIALIZED (
         |  SELECT CASE WHEN d <= md.mid THEN 'ref' ELSE 'cur' END AS side,
         |         cents, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM base, md GROUP BY 1, 2),
         |rv AS (
         |  SELECT cents, cnt,
         |         SUM(cnt) OVER (ORDER BY cents
         |           ROWS UNBOUNDED PRECEDING) AS cum,
         |         SUM(cnt) OVER () AS n
         |  FROM sides WHERE side = 'ref'),
         |rb AS (
         |  SELECT (cum - 1) * 10 // n + 1 AS bin,
         |         MAX(cents) AS hi, CAST(SUM(cnt) AS BIGINT) AS ref_n
         |  FROM rv GROUP BY 1),
         |edges AS MATERIALIZED (
         |  SELECT bin, lag(hi) OVER (ORDER BY bin) AS lo, hi, ref_n,
         |         MAX(bin) OVER () AS maxb
         |  FROM rb),
         |cn AS (
         |  SELECT e.bin, CAST(SUM(s.cnt) AS BIGINT) AS cur_n
         |  FROM (SELECT cents, cnt FROM sides WHERE side = 'cur') s
         |  JOIN edges e ON (e.lo IS NULL OR s.cents > e.lo)
         |    AND (s.cents <= e.hi OR e.bin = e.maxb)
         |  GROUP BY 1),
         |j AS (
         |  SELECT edges.bin, edges.lo AS lo_cents, edges.hi AS hi_cents,
         |         edges.ref_n, COALESCE(cn.cur_n, 0) AS cur_n
         |  FROM edges LEFT JOIN cn USING (bin)),
         |p AS (
         |  SELECT *,
         |         greatest((1000000 * (ref_n + 1))
         |           // (SELECT SUM(ref_n + 1) FROM j), 1) AS ref_ppm,
         |         greatest((1000000 * (cur_n + 1))
         |           // (SELECT SUM(cur_n + 1) FROM j), 1) AS cur_ppm
         |  FROM j)
         |SELECT CAST(bin AS BIGINT) AS bin, lo_cents, hi_cents,
         |       ref_n, cur_n,
         |       CAST(ref_ppm AS BIGINT) AS ref_ppm,
         |       CAST(cur_ppm AS BIGINT) AS cur_ppm,
         |       CAST(FLOOR((ref_ppm - cur_ppm) *
         |         ln(CAST(ref_ppm AS DOUBLE) / cur_ppm)) AS BIGINT)
         |         AS term_micro
         |FROM p ORDER BY bin""".stripMargin,

    // eval probes (id mod) against the quantized corpus, per-doc max
    // cosine, source census; -10001 sentinel keeps missing-embedding
    // docs counted but never contaminated
    "q353_semantic_decontamination" -> {
      val em = Queries.SemDecontEvalMod
      val tau = Queries.SemDecontTauBp
      s"""WITH $embQuantCte,
         |probes AS (
         |  SELECT vec_id AS eval_id, q AS q_q, n2 AS q_n2
         |  FROM n WHERE vec_id % $em = 0),
         |worst AS (
         |  SELECT c.vec_id, MAX(CASE WHEN c.n2 = 0 OR p.q_n2 = 0 THEN 0
         |           ELSE CAST(FLOOR(10000.0 *
         |             CAST(list_sum(list_transform(
         |               range(1, len(c.q) + 1),
         |               i -> c.q[i] * p.q_q[i])) AS BIGINT) /
         |             (sqrt(CAST(c.n2 AS DOUBLE)) *
         |              sqrt(CAST(p.q_n2 AS DOUBLE)))) AS BIGINT)
         |         END) AS max_cos
         |  FROM (SELECT vec_id, q, n2 FROM n WHERE vec_id % $em <> 0) c
         |  CROSS JOIN probes p
         |  GROUP BY 1)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN COALESCE(w.max_cos, -10001) >= $tau
         |         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
         |       (10000 * CAST(SUM(CASE WHEN COALESCE(w.max_cos, -10001)
         |           >= $tau THEN 1 ELSE 0 END) AS BIGINT))
         |         // CAST(COUNT(*) AS BIGINT) AS rate_bp,
         |       MAX(w.max_cos) AS max_cos_bp
         |FROM documents d
         |LEFT JOIN worst w ON w.vec_id = d.doc_id
         |WHERE d.source IS NOT NULL AND d.doc_id % $em <> 0
         |GROUP BY 1 ORDER BY d.source""".stripMargin
    },

    // method-of-moments EB ladder mirrored step for step: pooled
    // within-variance, between-variance of raw means, τ², per-source
    // B in bp, sign-split shrink move (nonneg-DIV rule)
    "q354_james_stein" ->
      s"""WITH mo AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(n_chars) AS BIGINT) AS s,
         |         SUM(CAST(n_chars AS HUGEINT) * n_chars) AS q
         |  FROM documents
         |  WHERE source IS NOT NULL AND n_chars IS NOT NULL
         |  GROUP BY 1),
         |g AS (
         |  SELECT *,
         |         CAST(COUNT(*) OVER () AS BIGINT) AS k,
         |         CAST(SUM(n) OVER () AS BIGINT) AS gn,
         |         CAST(SUM(s) OVER () AS BIGINT) AS gs,
         |         (1000 * s) // n AS raw_mean_milli,
         |         CASE WHEN n > 1 THEN CAST(
         |             (1000000 * (n * q - CAST(s AS HUGEINT) * s))
         |           // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT) END
         |           AS vw_milli
         |  FROM mo),
         |g2 AS (
         |  SELECT *, (1000 * gs) // gn AS grand_milli,
         |         CAST(SUM(CAST(vw_milli AS HUGEINT) * (n - 1)) OVER ()
         |           // greatest(SUM(n - 1) OVER (), 1) AS BIGINT)
         |           AS pool_vw
         |  FROM g),
         |g3 AS (
         |  SELECT *, raw_mean_milli - grand_milli AS dev,
         |         pool_vw // n AS se2
         |  FROM g2),
         |g4 AS (
         |  SELECT *,
         |         CAST(SUM(CAST(dev AS HUGEINT) * dev) OVER ()
         |           // greatest(k - 1, 1) AS BIGINT) AS between_v,
         |         CAST(SUM(se2) OVER () // k AS BIGINT) AS mean_se2
         |  FROM g3),
         |g5 AS (
         |  SELECT *, greatest(between_v - mean_se2, 0) AS tau2
         |  FROM g4),
         |g6 AS (
         |  SELECT *,
         |         CASE WHEN se2 + tau2 > 0
         |           THEN (10000 * se2) // (se2 + tau2) ELSE 0 END
         |           AS shrink_bp
         |  FROM g5),
         |g7 AS (
         |  SELECT *,
         |         raw_mean_milli - (CASE WHEN dev < 0 THEN -1 ELSE 1 END)
         |           * CAST((shrink_bp * CAST(abs(dev) AS HUGEINT))
         |             // 10000 AS BIGINT) AS shrunk_mean_milli
         |  FROM g6),
         |g8 AS (
         |  SELECT *,
         |         row_number() OVER (ORDER BY raw_mean_milli DESC,
         |           source ASC) AS rank_raw,
         |         row_number() OVER (ORDER BY shrunk_mean_milli DESC,
         |           source ASC) AS rank_shrunk
         |  FROM g7)
         |SELECT source, n AS n_docs,
         |       CAST(raw_mean_milli AS BIGINT) AS raw_mean_milli,
         |       CAST(shrunk_mean_milli AS BIGINT) AS shrunk_mean_milli,
         |       CAST(shrink_bp AS BIGINT) AS shrink_bp,
         |       CAST(rank_raw AS BIGINT) AS rank_raw,
         |       CAST(rank_shrunk AS BIGINT) AS rank_shrunk,
         |       CAST(abs(rank_raw - rank_shrunk) AS BIGINT) AS rank_moved
         |FROM g8 ORDER BY source""".stripMargin,

    // the q334 A-trick on the cumulative walk: D_t = n·C_t − t·S,
    // prefix-max peak, deepest (dd, earliest day) trough, peak-day
    // lookup + recovery probe on the same materialized walk
    "q355_revenue_drawdown" ->
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (SELECT MIN(daynum) AS mn, MAX(daynum) AS mx FROM d),
         |dn AS (
         |  SELECT t.dd AS daynum, COALESCE(d.cents, 0) AS cents
         |  FROM (SELECT unnest(generate_series(mn, mx)) AS dd FROM sp) t
         |  LEFT JOIN d ON d.daynum = t.dd),
         |w AS MATERIALIZED (
         |  SELECT daynum,
         |         row_number() OVER (ORDER BY daynum) AS t,
         |         SUM(cents) OVER (ORDER BY daynum
         |           ROWS UNBOUNDED PRECEDING) AS c,
         |         COUNT(*) OVER () AS n, SUM(cents) OVER () AS s
         |  FROM dn),
         |wk AS MATERIALIZED (
         |  SELECT daynum, n,
         |         CAST(n AS HUGEINT) * c - CAST(t AS HUGEINT) * s AS dv
         |  FROM w),
         |pk AS (
         |  SELECT *, MAX(dv) OVER (ORDER BY daynum
         |           ROWS UNBOUNDED PRECEDING) AS peak
         |  FROM wk),
         |tr AS (
         |  SELECT * FROM (SELECT *, peak - dv AS ddm FROM pk)
         |  QUALIFY row_number() OVER (ORDER BY ddm DESC, daynum ASC) = 1)
         |SELECT
         |  strftime(DATE '1970-01-01' + INTERVAL ((
         |    SELECT MIN(pk2.daynum) FROM pk pk2, tr
         |    WHERE pk2.dv = tr.peak AND pk2.daynum <= tr.daynum)) DAY,
         |    '%Y-%m-%d') AS peak_day,
         |  strftime(DATE '1970-01-01' + INTERVAL (tr.daynum) DAY,
         |    '%Y-%m-%d') AS trough_day,
         |  CAST(tr.ddm // tr.n AS BIGINT) AS drawdown_cents,
         |  CAST(tr.daynum - (
         |    SELECT MIN(pk2.daynum) FROM pk pk2, tr
         |    WHERE pk2.dv = tr.peak AND pk2.daynum <= tr.daynum)
         |    AS BIGINT) AS dd_days,
         |  CAST(COALESCE((
         |    SELECT MAX(wk2.dv) FROM wk wk2, tr
         |    WHERE wk2.daynum >= tr.daynum) >= tr.peak, FALSE)
         |    AS INT) AS recovered
         |FROM tr""".stripMargin,

    // user-grain lifetimes, censor at the corpus max day, then the
    // sequential floored product as a recursive CTE over the ordered
    // lifetime table (bounded by the observation span)
    "q356_kaplan_meier" ->
      s"""WITH RECURSIVE cns AS (
         |  SELECT MAX(CAST(ts AS DATE)) AS censor_d
         |  FROM events WHERE ts IS NOT NULL),
         |u AS (
         |  SELECT user_id, MIN(CAST(ts AS DATE)) AS f,
         |         MAX(CAST(ts AS DATE)) AS l
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
         |  GROUP BY 1),
         |lt AS (
         |  SELECT CAST(date_diff('day', u.f, u.l) AS BIGINT) AS t,
         |         CAST(SUM(CASE WHEN u.l = cns.censor_d THEN 0 ELSE 1 END)
         |           AS BIGINT) AS d,
         |         CAST(SUM(CASE WHEN u.l = cns.censor_d THEN 1 ELSE 0 END)
         |           AS BIGINT) AS c
         |  FROM u, cns GROUP BY 1),
         |ord AS MATERIALIZED (
         |  SELECT t, d, c,
         |         CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i,
         |         CAST(SUM(d + c) OVER () AS BIGINT)
         |           - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |             0) AS BIGINT) AS n_risk
         |  FROM lt),
         |rec AS (
         |  SELECT i, t, d, c, n_risk,
         |         CAST(CASE WHEN d > 0
         |           THEN (1000000 * (n_risk - d)) // n_risk
         |           ELSE 1000000 END AS BIGINT) AS s
         |  FROM ord WHERE i = 1
         |  UNION ALL
         |  SELECT o.i, o.t, o.d, o.c, o.n_risk,
         |         CAST(CASE WHEN o.d > 0
         |           THEN (rec.s * (o.n_risk - o.d)) // o.n_risk
         |           ELSE rec.s END AS BIGINT)
         |  FROM ord o JOIN rec ON o.i = rec.i + 1)
         |SELECT t AS t_days, n_risk, d AS n_events, c AS n_censored,
         |       s AS survival_ppm
         |FROM rec WHERE d > 0 ORDER BY t_days""".stripMargin,

    // one user×type dedup feeds every pair; inclusion–exclusion
    // intersection; the sketch verdict is the q37 literal-1 gate
    "q357_audience_union_sketch" ->
      s"""WITH ut AS MATERIALIZED (
         |  SELECT DISTINCT user_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |ty AS (SELECT DISTINCT event_type FROM ut),
         |pairs AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b
         |  FROM ty a, ty b WHERE a.event_type < b.event_type)
         |SELECT p.type_a, p.type_b,
         |       CAST(COUNT(DISTINCT CASE WHEN u.event_type = p.type_a
         |         THEN u.user_id END) AS BIGINT) AS n_a,
         |       CAST(COUNT(DISTINCT CASE WHEN u.event_type = p.type_b
         |         THEN u.user_id END) AS BIGINT) AS n_b,
         |       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_union,
         |       CAST(COUNT(DISTINCT CASE WHEN u.event_type = p.type_a
         |           THEN u.user_id END)
         |         + COUNT(DISTINCT CASE WHEN u.event_type = p.type_b
         |           THEN u.user_id END)
         |         - COUNT(DISTINCT u.user_id) AS BIGINT) AS n_inter,
         |       CAST(1 AS INT) AS union_sketch_ok
         |FROM pairs p JOIN ut u
         |  ON u.event_type IN (p.type_a, p.type_b)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // 40-bit md5 hex decode (the q335 instr idiom, 10 nibbles),
    // q = w·2^40 // h in HUGEINT, τ = the (k+1)-th priority (0 when
    // the corpus fits), HT weight = greatest(w, τ)
    "q358_priority_sample" -> {
      val k = Queries.PrioritySampleK
      val hex = (1 to 10).map(i =>
        s"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (10 - i))}")
        .mkString(" + ")
      s"""WITH sc AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
         |         CAST($hex AS BIGINT) + 1 AS h
         |  FROM documents
         |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
         |    AND n_chars > 0),
         |pr AS (
         |  SELECT doc_id, source, weight,
         |         CAST((CAST(weight AS HUGEINT) * 1099511627776) // h
         |           AS BIGINT) AS priority
         |  FROM sc),
         |rk AS MATERIALIZED (
         |  SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id ASC)
         |    AS rk
         |  FROM pr),
         |tau AS (
         |  SELECT CAST(COALESCE(MAX(CASE WHEN rk = ${k + 1}
         |    THEN priority END), 0) AS BIGINT) AS tau
         |  FROM rk)
         |SELECT doc_id, source, weight, priority,
         |       greatest(weight, tau.tau) AS ht_weight
         |FROM rk, tau WHERE rk <= $k
         |ORDER BY priority DESC, doc_id""".stripMargin
    },

    // token freq → freq-of-freqs; unseen row = N1/N; Turing r* per
    // head class — all integer floors shared with the Spark side
    "q359_good_turing" -> {
      val h = Queries.GoodTuringHeadR
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS r
         |       FROM tok GROUP BY 1),
         |ff AS MATERIALIZED (
         |  SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types
         |  FROM tf GROUP BY 1),
         |nt AS (SELECT CAST(SUM(r * n_types) AS BIGINT) AS n FROM ff),
         |head AS (
         |  SELECT f.r, f.n_types,
         |         CAST((1000000 * f.r * f.n_types) // nt.n AS BIGINT)
         |           AS mass_ppm,
         |         CAST(CASE WHEN f2.n_types IS NOT NULL THEN
         |             (1000 * (f.r + 1) * f2.n_types) // f.n_types END
         |           AS BIGINT) AS smoothed_r_milli
         |  FROM (SELECT * FROM ff ORDER BY r LIMIT $h) f
         |  LEFT JOIN ff f2 ON f2.r = f.r + 1 CROSS JOIN nt),
         |n1 AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN r = 1 THEN n_types END), 0)
         |    AS BIGINT) AS n1 FROM ff),
         |unseen AS (
         |  SELECT CAST(0 AS BIGINT) AS r, CAST(NULL AS BIGINT) AS n_types,
         |         CAST((1000000 * n1.n1) // nt.n AS BIGINT) AS mass_ppm,
         |         CAST(NULL AS BIGINT) AS smoothed_r_milli
         |  FROM nt, n1)
         |SELECT * FROM unseen UNION ALL SELECT * FROM head
         |ORDER BY r""".stripMargin
    },

    // per-arm nearest-rank at ceil(p·n/1e4), user_id tie-break —
    // every output an observed value (no interpolation)
    "q360_quantile_treatment" -> {
      val lv = Queries.QteLevelsBp.mkString(", ")
      s"""WITH u AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m
         |  FROM events GROUP BY 1),
         |au AS (
         |  SELECT user_id, m, CASE WHEN CAST(${(1 to 8).map(i =>
           s"(instr('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
           .mkString(" + ")} AS BIGINT) % 100 < 50
         |         THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |rk AS (
         |  SELECT arm, m,
         |         CAST(row_number() OVER (PARTITION BY arm
         |           ORDER BY m ASC, user_id ASC) AS BIGINT) AS rn,
         |         CAST(COUNT(*) OVER (PARTITION BY arm) AS BIGINT) AS n
         |  FROM au),
         |px AS (
         |  SELECT CAST(p.p_bp AS BIGINT) AS p_bp, rk.arm, rk.m
         |  FROM rk JOIN (SELECT unnest([$lv]) AS p_bp) p
         |    ON rk.rn = (p.p_bp * rk.n + 9999) // 10000)
         |SELECT p_bp,
         |       MAX(CASE WHEN arm = 'A' THEN m END) AS q_a,
         |       MAX(CASE WHEN arm = 'B' THEN m END) AS q_b,
         |       MAX(CASE WHEN arm = 'B' THEN m END)
         |         - MAX(CASE WHEN arm = 'A' THEN m END) AS qte
         |FROM px GROUP BY 1 ORDER BY 1""".stripMargin
    },

    // the q335 replicate machinery with an event_type dimension,
    // then the BH step-up as exact integer comparisons
    "q361_fdr_screen" -> {
      val reps = Queries.FdrReps
      val nib = (c: String, i: Int) =>
        s"(instr('0123456789abcdef', substr($c, $i, 1)) - 1)"
      def draw32(c: String) = (1 to 8)
        .map(i => s"${nib(c, i)} * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      s"""WITH ut AS MATERIALIZED (
         |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS m,
         |         CAST(${draw32("md5(CAST(user_id AS VARCHAR))")}
         |           AS BIGINT) % 100 < 50 AS in_a
         |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2),
         |obs AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_a,
         |         CAST(SUM(CASE WHEN in_a THEN m ELSE 0 END) AS BIGINT)
         |           AS s_a,
         |         CAST(SUM(m) AS BIGINT) AS s
         |  FROM ut GROUP BY 1),
         |obs2 AS (
         |  SELECT event_type, n,
         |         CASE WHEN n_a = 0 OR n = n_a THEN NULL ELSE
         |           CAST((1000000 * abs(CAST(s_a AS HUGEINT) * (n - n_a)
         |               - CAST(s - s_a AS HUGEINT) * n_a))
         |             // (CAST(n_a AS HUGEINT) * (n - n_a)) AS BIGINT)
         |         END AS t_obs_micro
         |  FROM obs),
         |pr AS (
         |  SELECT event_type, rep,
         |         CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
         |           AS na,
         |         CAST(SUM(CASE WHEN in_a THEN m ELSE 0 END) AS BIGINT)
         |           AS sa,
         |         CAST(SUM(m) AS BIGINT) AS sr
         |  FROM (
         |    SELECT ut.event_type, ut.m, r.rep,
         |           CAST(${draw32("md5(CAST(user_id AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR))")}
         |             AS BIGINT) % 100 < 50 AS in_a
         |    FROM ut CROSS JOIN
         |      (SELECT unnest(generate_series(1, $reps)) AS rep) r)
         |  GROUP BY 1, 2),
         |pt AS (
         |  SELECT event_type,
         |         CASE WHEN na = 0 OR n = na THEN NULL ELSE
         |           CAST((1000000 * abs(CAST(sa AS HUGEINT) * (n - na)
         |               - CAST(sr - sa AS HUGEINT) * na))
         |             // (CAST(na AS HUGEINT) * (n - na)) AS BIGINT)
         |         END AS t_abs_micro
         |  FROM pr),
         |pv AS (
         |  SELECT pt.event_type, MAX(o.n) AS n_users,
         |         CAST(COUNT(*) AS BIGINT) AS reps,
         |         CAST(SUM(CASE WHEN COALESCE(pt.t_abs_micro, 0)
         |             >= abs(COALESCE(o.t_obs_micro, 0)) THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_extreme
         |  FROM pt JOIN obs2 o ON o.event_type = pt.event_type
         |  GROUP BY 1),
         |pm AS (
         |  SELECT event_type, n_users,
         |         (1000 * (1 + n_extreme)) // (reps + 1) AS p_milli
         |  FROM pv),
         |bh AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY p_milli ASC,
         |           event_type ASC) AS BIGINT) AS p_rank,
         |         CAST(COUNT(*) OVER () AS BIGINT) AS m_tests
         |  FROM pm),
         |st AS (
         |  SELECT *, (50 * p_rank) // m_tests AS bh_threshold_milli,
         |         MAX(CASE WHEN p_milli * m_tests <= 50 * p_rank
         |           THEN p_rank END) OVER () AS istar
         |  FROM bh)
         |SELECT event_type, n_users, p_milli, p_rank,
         |       bh_threshold_milli,
         |       CAST(p_rank <= COALESCE(istar, 0) AS INT) AS reject
         |FROM st ORDER BY p_rank""".stripMargin
    },

    // md5(doc:pos) draws open spans (len = draw % maxSpan + 1); the
    // mask is an OR over maxSpan lags, spans merge as mask runs
    "q362_span_corruption" -> {
      val sb = Queries.SpanStartBp
      val ms = Queries.SpanMax
      val draw = (1 to 8).map(i =>
        s"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
        .mkString(" + ")
      val maskedOr = (0 until ms).map(k =>
        s"(COALESCE(lag(start, $k, 0) OVER w, 0) = 1 AND " +
          s"COALESCE(lag(len, $k, 0) OVER w, 0) > $k)")
        .mkString(" OR ")
      s"""WITH toks AS (
         |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS pos
         |  FROM (SELECT doc_id, text FROM documents
         |        WHERE text IS NOT NULL AND doc_id IS NOT NULL) d,
         |       unnest(range(1, len(string_split(text, ' ')) + 1)) AS g(i)),
         |dr AS (
         |  SELECT doc_id, pos, CAST($draw AS BIGINT) AS draw
         |  FROM toks),
         |st AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN draw % 10000 < $sb THEN 1 ELSE 0 END AS start,
         |         CASE WHEN draw % 10000 < $sb
         |           THEN draw % $ms + 1 ELSE 0 END AS len
         |  FROM dr),
         |mk AS (
         |  SELECT doc_id, pos,
         |         CAST($maskedOr AS BIGINT) AS m
         |  FROM st WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |rs AS (
         |  SELECT doc_id, m,
         |         CASE WHEN m = 1 AND COALESCE(lag(m, 1, 0)
         |             OVER (PARTITION BY doc_id ORDER BY pos), 0) = 0
         |           THEN 1 ELSE 0 END AS run_start
         |  FROM mk)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |       CAST(SUM(m) AS BIGINT) AS n_masked,
         |       CAST(SUM(run_start) AS BIGINT) AS n_spans,
         |       CAST(COUNT(*) - SUM(m) + SUM(run_start) AS BIGINT)
         |         AS input_len,
         |       CAST(SUM(m) + SUM(run_start) + 1 AS BIGINT) AS target_len,
         |       CAST((10000 * SUM(m)) // COUNT(*) AS BIGINT) AS corrupt_bp
         |FROM rs GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // dense spine self-join (calendar² metadata), tie-corrected 18·Var,
    // squared continuity-corrected verdict in HUGEINT — no sqrt
    "q363_mann_kendall" ->
      s"""WITH d AS (
         |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
         |           AS BIGINT) AS daynum,
         |         CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
         |           AS BIGINT) AS cents
         |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |sp AS (SELECT MIN(daynum) AS mn, MAX(daynum) AS mx FROM d),
         |dn AS MATERIALIZED (
         |  SELECT t.dd AS daynum, COALESCE(d.cents, 0) AS cents
         |  FROM (SELECT unnest(generate_series(mn, mx)) AS dd FROM sp) t
         |  LEFT JOIN d ON d.daynum = t.dd),
         |s AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN b.cents > a.cents THEN 1
         |      WHEN b.cents < a.cents THEN -1 ELSE 0 END), 0) AS BIGINT)
         |    AS s_stat
         |  FROM dn a JOIN dn b ON b.daynum > a.daynum),
         |tc AS (
         |  SELECT CAST(SUM(t) AS BIGINT) AS n_days,
         |         COALESCE(SUM(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)),
         |           0::HUGEINT) AS tie_corr
         |  FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS t
         |        FROM dn GROUP BY 1)),
         |v AS (
         |  SELECT n_days, s.s_stat,
         |         CAST(n_days AS HUGEINT) * (n_days - 1) * (2 * n_days + 5)
         |           - tie_corr AS var18,
         |         CASE WHEN s.s_stat = 0 THEN 0::HUGEINT
         |           ELSE 180000 * CAST(abs(s.s_stat) - 1 AS HUGEINT)
         |             * (abs(s.s_stat) - 1) END AS zs
         |  FROM tc, s)
         |SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
         |       CAST(zs AS BIGINT) AS z_milli_sq_scaled,
         |       CAST(s_stat <> 0 AND zs > 38416 * var18 AS INT)
         |         AS reject_05
         |FROM v""".stripMargin,

    // q63 Lehmer splits, per split×feature HUGEINT moments, the
    // Austin |SMD|<0.1 milli ladder with shared floors
    "q344_smd_balance" -> {
      val t = Queries.SplitTrainBp; val v = Queries.SplitValBp
      s"""WITH s AS (
         |  SELECT CASE
         |      WHEN (((doc_id % 1000003 + 1000003) % 1000003)
         |        * 48271 + 12345) % 10000 < $t THEN 'train'
         |      WHEN (((doc_id % 1000003 + 1000003) % 1000003)
         |        * 48271 + 12345) % 10000 < ${t + v} THEN 'val'
         |      ELSE 'test' END AS split,
         |    COALESCE(n_chars, CAST(length(text) AS BIGINT)) AS n_chars,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents WHERE text IS NOT NULL),
         |f AS (
         |  SELECT split, 'n_chars' AS feature, n_chars AS f FROM s
         |  UNION ALL
         |  SELECT split, 'n_tokens', n_tokens FROM s),
         |mo AS (
         |  SELECT split, feature, CAST(COUNT(*) AS BIGINT) AS n,
         |         CAST(SUM(f) AS BIGINT) AS sm,
         |         SUM(CAST(f AS HUGEINT) * f) AS q
         |  FROM f GROUP BY 1, 2),
         |pr AS (SELECT * FROM (VALUES ('train', 'val'),
         |         ('train', 'test'), ('val', 'test'))
         |       AS t(split_a, split_b)),
         |j AS (
         |  SELECT pr.split_a, pr.split_b, a.feature,
         |         a.n AS n_a, b.n AS n_b,
         |         (1000 * a.sm) // a.n AS mean_a_milli,
         |         (1000 * b.sm) // b.n AS mean_b_milli,
         |         CASE WHEN a.n > 1 THEN CAST((1000 *
         |             (a.n * a.q - CAST(a.sm AS HUGEINT) * a.sm))
         |           // (CAST(a.n AS HUGEINT) * (a.n - 1)) AS BIGINT)
         |         END AS va,
         |         CASE WHEN b.n > 1 THEN CAST((1000 *
         |             (b.n * b.q - CAST(b.sm AS HUGEINT) * b.sm))
         |           // (CAST(b.n AS HUGEINT) * (b.n - 1)) AS BIGINT)
         |         END AS vb
         |  FROM pr
         |  JOIN mo a ON a.split = pr.split_a
         |  JOIN mo b ON b.split = pr.split_b AND b.feature = a.feature),
         |sg AS (
         |  SELECT *, CASE WHEN va IS NOT NULL AND vb IS NOT NULL
         |           AND va + vb > 0
         |         THEN ${isqrtHuge("(1000 * (CAST(va AS HUGEINT) + vb)) // 2")}
         |         END AS sig
         |  FROM j)
         |SELECT split_a, split_b, feature, n_a, n_b,
         |       CAST(mean_a_milli AS BIGINT) AS mean_a_milli,
         |       CAST(mean_b_milli AS BIGINT) AS mean_b_milli,
         |       CASE WHEN sig > 0 THEN
         |         CAST((1000 * abs(mean_a_milli - mean_b_milli)) // sig
         |           AS BIGINT) END AS smd_milli,
         |       CASE WHEN sig > 0 THEN
         |         CAST((1000 * abs(mean_a_milli - mean_b_milli)) // sig
         |           < 100 AS INT) END AS balanced
         |FROM sg
         |ORDER BY split_a, split_b, feature""".stripMargin
    }
  )

  /** Exact ⌊√x⌋ for HUGEINT expressions (DuckDB) — the isqrtDuck
    * twin with decimal-width compares. */
  private def isqrtHuge(x: String): String = {
    val y0 = s"CAST(FLOOR(SQRT(CAST(($x) AS DOUBLE))) AS BIGINT)"
    s"""(CASE
       |  WHEN CAST($y0 + 2 AS HUGEINT) * ($y0 + 2) <= ($x) THEN $y0 + 2
       |  WHEN CAST($y0 + 1 AS HUGEINT) * ($y0 + 1) <= ($x) THEN $y0 + 1
       |  WHEN CAST($y0 AS HUGEINT) * $y0 <= ($x) THEN $y0
       |  ELSE $y0 - 1
       |END)""".stripMargin
  }

  /** Exact ⌊√x⌋ (DuckDB dialect): IEEE seed + ±2 correction — the
    * q204 convention as a reusable snippet. */
  private def isqrtDuck(x: String): String = {
    val y0 = s"CAST(FLOOR(SQRT(CAST($x AS DOUBLE))) AS BIGINT)"
    s"""(CASE
       |  WHEN ($y0 + 2) * ($y0 + 2) <= $x THEN $y0 + 2
       |  WHEN ($y0 + 1) * ($y0 + 1) <= $x THEN $y0 + 1
       |  WHEN $y0 * $y0 <= $x THEN $y0
       |  ELSE $y0 - 1
       |END)""".stripMargin
  }

  /** SCD tier of a cumulative purchase count (SQL twin of
    * Scd.tierOf over [[graft.ops.Scd.TierThresholds]]). */
  private[graft] def scdTierSql(cum: String): String =
    graft.ops.Scd.TierThresholds
      .map(t => s"CASE WHEN $cum >= $t THEN 1 ELSE 0 END")
      .mkString("(", " + ", ")")

  /** Exact ⌊log₂(a/b)⌋ over positive BIGINT expressions (DuckDB
    * dialect) — the no-libm log twin of `TrainingPrep.flog2Ratio`:
    * bitlen via `format('{:b}')` string length, the ±1 correction via
    * an overflow-safe shift compare. */
  private def flog2rSql(a: String, b: String): String = {
    val la = s"length(format('{:b}', $a))"
    val lb = s"length(format('{:b}', $b))"
    // shifts clamped with greatest(): DuckDB's vectorized AND may
    // evaluate a branch's shift even when its guard is false, and a
    // negative shift amount raises — the guard still owns semantics.
    s"""(($la - $lb) - CASE WHEN
       |    ($la >= $lb AND ($a) < ($b) * (1::BIGINT << greatest($la - $lb, 0)))
       |    OR ($la < $lb AND ($a) * (1::BIGINT << greatest($lb - $la, 0)) < ($b))
       |  THEN 1 ELSE 0 END)""".stripMargin
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DocQueries, MultimodalQueries, PipelineQueries, RelationalQueries, SimilarityQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every SQL-expressible operator from SURVEY.md §2 appears in `queries`
  * with matching DuckDB SQL in `oracleSql`; non-SQL-expressible ops
  * (tokeniser, hash-seeded sketches) appear in `queries` only and get the
  * driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full reference pipeline (stages 2-6 fused into one DAG).
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.pipelineFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Relational surface (SURVEY §2.5/2.6/2.7, §7 step 7)
    "q1_pricing_summary" -> (TpchQueries.pricingSummary _),
    "q6_revenue_filter" -> (TpchQueries.revenueFilter _),
    "q3_revenue_by_nation" -> (TpchQueries.revenueByNation _),
    "q4_semi_join_orders" -> (TpchQueries.semiJoinOrders _),
    "q5_anti_join_customers" -> (TpchQueries.antiJoinCustomers _),
    "q_top_orders" -> (TpchQueries.topOrders _),
    "q13_order_distribution" -> (TpchQueries.orderCountDistribution _),
    "q14_promo_revenue" -> (TpchQueries.promoRevenue _),
    "q10_returned_revenue" -> (TpchQueries.returnedItemRevenue _),
    "q_json_extract" -> (TpchQueries.jsonExtract _),
    "q_grouping_sets" -> (TpchQueries.groupingSets _),
    "q_lead_lag" -> (TpchQueries.leadLagGaps _),
    "q_source_percentiles" -> (TpchQueries.sourcePercentiles _),
    "q_user_running_stats" -> (TpchQueries.userRunningStats _),
    "q_events_hourly" -> (TpchQueries.eventsHourly _),
    "q_sessionize" -> (TpchQueries.sessionize _),
    "q_revenue_by_brand" -> (TpchQueries.revenueByBrand _),
    "q_rollup_events" -> (TpchQueries.rollupEvents _),
    "q_asof_join" -> (TpchQueries.asofPurchaseClick _),
    "q_asof_native" -> (TpchQueries.asofPurchaseClickNative _),
    "q_union_by_name" -> (TpchQueries.unionByNameEvents _),
    "q_distinct_users" -> (TpchQueries.distinctUsers _),
    "q_group_sample" -> (TpchQueries.groupSample _),
    // Relational surface, round 2: subqueries, grouping sets, reshaping,
    // set ops, window frames, range join, tiles, full outer, generators
    "q_small_qty_revenue" -> (RelationalQueries.smallQtyRevenue _),
    "q_cube_events" -> (RelationalQueries.cubeEvents _),
    "q_pivot_user_events" -> (RelationalQueries.pivotUserEvents _),
    "q_unpivot_priority" -> (RelationalQueries.unpivotPriority _),
    "q_except_click_no_purchase" -> (RelationalQueries.exceptClickNoPurchase _),
    "q_intersect_signup_error" -> (RelationalQueries.intersectSignupError _),
    "q_moving_window" -> (RelationalQueries.movingWindow _),
    "q_range_join_clicks" -> (RelationalQueries.rangeJoinClicks _),
    "q_order_quartiles" -> (RelationalQueries.orderQuartiles _),
    "q_full_outer_nation" -> (RelationalQueries.fullOuterNation _),
    "q_word_freq" -> (RelationalQueries.wordFreq _),
    "q_approx_distinct" -> (RelationalQueries.approxDistinct _),
    "q_typed_stats" -> (RelationalQueries.typedStats _),
    "q_mixture_alloc" -> (RelationalQueries.mixtureAlloc _),
    "q_sql_surface" -> (RelationalQueries.sqlSurface _),
    // Document pipeline operators (SURVEY §2.2-2.4, 2.9, 2.10)
    "q_doc_metrics" -> (DocQueries.docMetrics _),
    "q_doc_prefilter" -> (DocQueries.docPrefilter _),
    "q_dedup_exact" -> (DocQueries.dedupExact _),
    "q_dedup_near" -> (DocQueries.dedupNear _),
    "q_token_stats" -> (DocQueries.tokenStats _),
    "q_langid" -> (DocQueries.langId _),
    "q_pii_mask" -> (DocQueries.piiMask _),
    "q_toxicity" -> (DocQueries.toxicity _),
    "q_quality_score" -> (DocQueries.qualityScore _),
    "q_spam_exploded" -> (DocQueries.spamExploded _),
    "q_dedup_tokens" -> (DocQueries.dedupTokens _),
    "q_token_pack" -> (DocQueries.tokenPack _),
    "q_pack_manifest" -> (DocQueries.packManifest _),
    "q_domain_cap" -> (DocQueries.domainCap _),
    "q_token_entropy" -> (DocQueries.tokenEntropy _),
    "q_temperature_mix" -> (DocQueries.temperatureMix _),
    "q_url_canon" -> (DocQueries.urlCanon _),
    "q_unigram_logprob" -> (DocQueries.unigramLogprob _),
    "q_quality_ensemble" -> (DocQueries.qualityEnsemble _),
    // engine-defined (iterative BPE training; rows-only by design)
    "q_bpe_vocab" -> (DocQueries.bpeVocab _),
    "q_bpe_tokenize" -> (DocQueries.bpeTokenize _),
    // Reporting / sharding / export / end-to-end (SURVEY §2.6, 2.8, 2.12)
    "q_drop_reason_counts" -> (PipelineQueries.dropReasonCounts _),
    "q_describe_chars" -> (PipelineQueries.describeChars _),
    "q_describe_metrics" -> (PipelineQueries.describeMetrics _),
    "q_histogram_chars" -> (PipelineQueries.histogramChars _),
    "q_top_sources" -> (PipelineQueries.topSources _),
    "q_export_coalesce" -> (PipelineQueries.exportCoalesce _),
    "q_fingerprint" -> (PipelineQueries.fingerprint _),
    "q_shard_assign" -> (PipelineQueries.shardAssign _),
    "q_shard_manifest" -> (PipelineQueries.shardManifest _),
    "q_manifest_totals" -> (PipelineQueries.manifestTotals _),
    "q_tokenize" -> (PipelineQueries.tokenize _),
    "q_pipeline_full" -> (PipelineQueries.pipelineFull _),
    "q_pii_totals" -> (PipelineQueries.piiTotals _),
    "q_subset_counts" -> (PipelineQueries.subsetCounts _),
    // Similarity search + sketch dedup (builder brief first-class ops)
    "q_ann_topk" -> (SimilarityQueries.annTopK _),
    "q_embed_neardup" -> (SimilarityQueries.embedNearDup _),
    "q_ivf_assign" -> (SimilarityQueries.ivfAssign _),
    "q_ivf_topk" -> (SimilarityQueries.ivfTopK _),
    "q_ngram_jaccard" -> (SimilarityQueries.ngramJaccard _),
    "q_winnow_fp" -> (SimilarityQueries.winnowFp _),
    "q_winnow_overlap" -> (SimilarityQueries.winnowOverlap _),
    "q_cdc_chunks" -> (SimilarityQueries.cdcChunks _),
    "q_cdc_dedup" -> (SimilarityQueries.cdcDedup _),
    "q_minhash_lsh" -> (SimilarityQueries.minhashLsh _),
    "q_simhash_pairs" -> (SimilarityQueries.simhashPairs _),
    "q_dup_clusters" -> (SimilarityQueries.dupClusters _),
    "q_cluster_best" -> (SimilarityQueries.clusterBest _),
    "q_contamination" -> (SimilarityQueries.contamination _),
    "q_bloom_contamination" -> (SimilarityQueries.bloomContamination _),
    // Multimodal binary columns (builder brief first-class ops)
    "q_media_meta" -> (MultimodalQueries.mediaMeta _),
    "q_frame_sample" -> (MultimodalQueries.frameSample _),
    "q_audio_chunks" -> (MultimodalQueries.audioChunks _),
    "q_media_features" -> (MultimodalQueries.mediaFeatures _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> TpchQueries.pricingSummarySql,
    "q6_revenue_filter" -> TpchQueries.revenueFilterSql,
    "q3_revenue_by_nation" -> TpchQueries.revenueByNationSql,
    "q4_semi_join_orders" -> TpchQueries.semiJoinOrdersSql,
    "q5_anti_join_customers" -> TpchQueries.antiJoinCustomersSql,
    "q_top_orders" -> TpchQueries.topOrdersSql,
    "q13_order_distribution" -> TpchQueries.orderCountDistributionSql,
    "q14_promo_revenue" -> TpchQueries.promoRevenueSql,
    "q10_returned_revenue" -> TpchQueries.returnedItemRevenueSql,
    "q_json_extract" -> TpchQueries.jsonExtractSql,
    "q_grouping_sets" -> TpchQueries.groupingSetsSql,
    "q_lead_lag" -> TpchQueries.leadLagGapsSql,
    "q_source_percentiles" -> TpchQueries.sourcePercentilesSql,
    "q_user_running_stats" -> TpchQueries.userRunningStatsSql,
    "q_events_hourly" -> TpchQueries.eventsHourlySql,
    "q_sessionize" -> TpchQueries.sessionizeSql,
    "q_revenue_by_brand" -> TpchQueries.revenueByBrandSql,
    "q_rollup_events" -> TpchQueries.rollupEventsSql,
    "q_asof_join" -> TpchQueries.asofPurchaseClickSql,
    // native whole-operator path, bit-identical contract -> same oracle
    "q_asof_native" -> TpchQueries.asofPurchaseClickSql,
    "q_union_by_name" -> TpchQueries.unionByNameEventsSql,
    "q_distinct_users" -> TpchQueries.distinctUsersSql,
    "q_group_sample" -> TpchQueries.groupSampleSql,
    "q_small_qty_revenue" -> RelationalQueries.smallQtyRevenueSql,
    "q_cube_events" -> RelationalQueries.cubeEventsSql,
    "q_pivot_user_events" -> RelationalQueries.pivotUserEventsSql,
    "q_unpivot_priority" -> RelationalQueries.unpivotPrioritySql,
    "q_except_click_no_purchase" -> RelationalQueries.exceptClickNoPurchaseSql,
    "q_intersect_signup_error" -> RelationalQueries.intersectSignupErrorSql,
    "q_moving_window" -> RelationalQueries.movingWindowSql,
    "q_range_join_clicks" -> RelationalQueries.rangeJoinClicksSql,
    "q_order_quartiles" -> RelationalQueries.orderQuartilesSql,
    "q_full_outer_nation" -> RelationalQueries.fullOuterNationSql,
    "q_word_freq" -> RelationalQueries.wordFreqSql,
    "q_typed_stats" -> RelationalQueries.typedStatsSql,
    "q_mixture_alloc" -> RelationalQueries.mixtureAllocSql,
    "q_sql_surface" -> RelationalQueries.sqlSurfaceSql,
    "q_doc_metrics" -> DocQueries.docMetricsSql,
    "q_doc_prefilter" -> DocQueries.docPrefilterSql,
    "q_dedup_exact" -> DocQueries.dedupExactSql,
    "q_dedup_near" -> DocQueries.dedupNearSql,
    "q_token_stats" -> DocQueries.tokenStatsSql,
    "q_langid" -> DocQueries.langIdSql,
    "q_pii_mask" -> DocQueries.piiMaskSql,
    "q_toxicity" -> DocQueries.toxicitySql,
    "q_quality_score" -> DocQueries.qualityScoreSql,
    "q_spam_exploded" -> DocQueries.spamExplodedSql,
    "q_dedup_tokens" -> DocQueries.dedupTokensSql,
    "q_token_pack" -> DocQueries.tokenPackSql,
    "q_pack_manifest" -> DocQueries.packManifestSql,
    "q_domain_cap" -> DocQueries.domainCapSql,
    "q_token_entropy" -> DocQueries.tokenEntropySql,
    "q_temperature_mix" -> DocQueries.temperatureMixSql,
    "q_url_canon" -> DocQueries.urlCanonSql,
    "q_unigram_logprob" -> DocQueries.unigramLogprobSql,
    "q_quality_ensemble" -> DocQueries.qualityEnsembleSql,
    "q_dup_clusters" -> SimilarityQueries.dupClustersSql,
    "q_cluster_best" -> SimilarityQueries.clusterBestSql,
    "q_contamination" -> SimilarityQueries.contaminationSql,
    // the Bloom path is exact (prefilter + verify join), same oracle
    "q_bloom_contamination" -> SimilarityQueries.contaminationSql,
    "q_drop_reason_counts" -> PipelineQueries.dropReasonCountsSql,
    "q_describe_chars" -> PipelineQueries.describeCharsSql,
    "q_describe_metrics" -> PipelineQueries.describeMetricsSql,
    "q_histogram_chars" -> PipelineQueries.histogramCharsSql,
    "q_top_sources" -> PipelineQueries.topSourcesSql,
    "q_export_coalesce" -> PipelineQueries.exportCoalesceSql,
    "q_fingerprint" -> PipelineQueries.fingerprintSql,
    "q_shard_assign" -> PipelineQueries.shardAssignSql,
    "q_shard_manifest" -> PipelineQueries.shardManifestSql,
    "q_manifest_totals" -> PipelineQueries.manifestTotalsSql,
    "q_pii_totals" -> PipelineQueries.piiTotalsSql,
    "q_subset_counts" -> PipelineQueries.subsetCountsSql,
    "q_ann_topk" -> SimilarityQueries.annTopKSql,
    "q_embed_neardup" -> SimilarityQueries.embedNearDupSql,
    "q_ivf_assign" -> SimilarityQueries.ivfAssignSql,
    "q_ivf_topk" -> SimilarityQueries.ivfTopKSql,
    "q_ngram_jaccard" -> SimilarityQueries.ngramJaccardSql,
    "q_winnow_fp" -> SimilarityQueries.winnowFpSql,
    "q_winnow_overlap" -> SimilarityQueries.winnowOverlapSql,
    "q_cdc_chunks" -> SimilarityQueries.cdcChunksSql,
    "q_cdc_dedup" -> SimilarityQueries.cdcDedupSql,
    "q_media_meta" -> MultimodalQueries.mediaMetaSql,
    "q_frame_sample" -> MultimodalQueries.frameSampleSql,
    "q_audio_chunks" -> MultimodalQueries.audioChunksSql
    // No oracle (rows-only checks, SURVEY §5.4 exclusions):
    // q_tokenize, q_pipeline_full (engine-defined tokenizer + NFKC UDF),
    // q_minhash_lsh, q_simhash_pairs (xxhash64/FNV seeds are engine-defined),
    // q_media_features (xxhash64-derived stub embeddings),
    // q_approx_distinct (HLL++/KLL sketch internals are engine-defined;
    //   ApproxSpec asserts estimates against exact answers instead).
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching ANSI-SQL oracle in `oracleSql`
  * (DuckDB, same parquet tables) — the driver's correctness gate
  * hash-compares the two at sf0.01. Column names and row order are part
  * of the hash, so every query ends in a total-order ORDER BY and aliases
  * match exactly between the Spark and SQL forms.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefViews.clientTransactionCounts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a — the reference's query surface (Q1-Q9)
    "q_client_txn_counts" -> (RefViews.clientTransactionCounts _),
    "q_view_sql"          -> (RefViews.viewSqlSurface _),
    "q_view_sql_monthly"  -> (RefViews.viewSqlMonthly _),
    "q_view_sql_high"     -> (RefViews.viewSqlHigh _),
    "q_monthly_summary"   -> (RefViews.monthlyTransactionSummary _),
    "q_high_txn_accounts" -> (RefViews.highTransactionAccounts _),
    "q_count"             -> (RefViews.importCounts _),
    // §2a — cleaning operators (T1-T3)
    "q_dedup_first"       -> (Cleaning.dedupFirst _),
    "q_coerce_fill"       -> (Cleaning.coerceFill _),
    "q_union_pages"       -> (Cleaning.unionPages _),
    // dataset-grain file formats: CSV→JSONL→ORC lossless round-trip
    "q_format_roundtrip"  -> (graft.sources.FileFormats.formatRoundtrip _),
    // parquet schema drift served by one mergeSchema read
    "q_schema_evolution"  -> (graft.sources.FileFormats.schemaEvolution _),
    // per-group dyadic-quantile value clipping
    "q_winsorize"         -> (GovernanceOps.winsorize _),
    // record linkage: blocking + Levenshtein entity resolution
    "q_record_linkage"    -> (LinkageOps.recordLinkage _),
    // time-series densify + forward fill
    "q_gap_fill"          -> (EventOps.gapFill _),
    // relational breadth (categories absent from the reference)
    "q_outer_counts"      -> (RelOps.outerOrderCounts _),
    "q_anti_clients"      -> (RelOps.clientsWithoutOrders _),
    "q_semi_urgent"       -> (RelOps.clientsWithUrgentOrders _),
    "q_distinct_users"    -> (RelOps.distinctUsers _),
    "q_rollup_orders"     -> (RelOps.rollupOrders _),
    "q_cube_orders"       -> (RelOps.cubeOrders _),
    "q_intersect_users"   -> (RelOps.usersClickAndPurchase _),
    "q_except_users"      -> (RelOps.usersClickNoPurchase _),
    "q_running_totals"    -> (RelOps.runningLineTotals _),
    "q_pivot_events"      -> (RelOps.pivotEventCounts _),
    // oracle-gated since round 8: exact twin + error-bound booleans
    "q_approx_distinct"   -> (RelOps.approxDistinctUsersGated _),
    "q_hll_intersect"     -> (RelOps.hllIntersectGated _),
    "q_skew_agg"          -> (RelOps.skewAggTwoPhase _),
    "q_unpivot_events"    -> (RelOps.unpivotEventCounts _),
    // §2b — event analytics
    "q_json_extract"      -> (EventOps.jsonExtract _),
    "q_event_windows"     -> (EventOps.eventWindows _),
    "q_events_lifecycle"  -> (EventOps.eventsLifecycle _),
    "q_user_sessions"     -> (EventOps.userSessions _),
    "q_sessions_skewsafe" -> (EventOps.userSessionsSkewSafe _),
    "q_asof_join"         -> (EventOps.asofClickPurchase _),
    "q_funnel_steps"      -> (EventOps.funnelSteps _),
    "q_range_join"        -> (EventOps.rangeJoinErrorViews _),
    "q_cohort_retention"  -> (EventOps.cohortRetention _),
    "q_join_lifecycle"    -> (EventOps.joinLifecycle _),
    "q_session_lifecycle" -> (EventOps.sessionLifecycle _),
    "q_markov_transitions" -> (EventOps.markovTransitions _),
    "q_interval_anti"     -> (EventOps.intervalAnti _),
    "q_moving_avg"        -> (RelOps.movingAvgDaily _),
    "q_numeric_histogram" -> (RelOps.numericHistogram _),
    "q_itemset_pairs"     -> (RelOps.itemsetPairs _),
    "q_skyline_orders"    -> (RelOps.skylineOrders _),
    "q_dq_checks"         -> (GovernanceOps.dqChecks _),
    "q_rfm_segments"      -> (GovernanceOps.rfmSegments _),
    "q_mv_rewrite"        -> (graft.plans.MvRewrite.monthlyRevenue _),
    "q_mv_join_rewrite"   -> (graft.plans.MvJoinRewrite.monthlyClientRollup _),
    "q_mv_avg_rewrite"    -> (graft.plans.MvJoinRewrite.monthlyClientAvgRollup _),
    "q_cms_join_planned"  -> (graft.plans.CmsJoinPlanner.cmsPlannedJoin _),
    "q_hnsw_batch"        -> (SimilarityOps.hnswBatchTopK _),
    "q_mv_lifecycle"      -> (graft.plans.MvJoinRewrite.mvLifecycle _),
    "q_triangle_count"    -> (GraphOps.triangleStats _),
    "q_kcore"             -> (GraphOps.kcore _),
    "q_shard_assignment"  -> (GovernanceOps.shardAssignment _),
    // §2b — text analysis
    "q_token_counts"      -> (TextOps.tokenCounts _),
    "q_quality_score"     -> (TextOps.qualityScore _),
    "q_quality_classifier" -> (TextOps.qualityClassifier _),
    "q_classifier_train"  -> (TextOps.classifierTrain _),
    "q_doc_fingerprint"   -> (TextOps.docFingerprint _),
    "q_rolling_fingerprint" -> (TextOps.rollingFingerprint _),
    "q_winnow_fingerprint" -> (TextOps.winnowFingerprint _),
    "q_winnow_overlap" -> (TextOps.winnowOverlap _),
    "q_bpe_tokens"        -> (TextOps.bpeTokenCounts _),
    "q_bpe_train"         -> (TextOps.bpeTrainMerges _),
    "q_bpe_apply"         -> (TextOps.bpeApply _),
    "q_unigram_train"     -> (TextOps.unigramTrain _),
    "q_unigram_apply"     -> (TextOps.unigramApply _),
    "q_wordpiece_train"   -> (TextOps.wordpieceTrain _),
    "q_wordpiece_apply"   -> (TextOps.wordpieceApply _),
    "q_tokenizer_fertility" -> (TextOps.tokenizerFertility _),
    "q_lang_id"           -> (TextOps.langId _),
    "q_lang_ngram"        -> (TextOps.langNgram _),
    "q_lm_score"          -> (TextOps.lmBigramScore _),
    "q_doc_quantiles"     -> (TextOps.docQuantiles _),
    // oracle-gated since round 8: rank-interval booleans over exact
    // stats (also spec-bounded against the exact key — TextOps scaladoc)
    "q_doc_quantiles_approx" -> (TextOps.docQuantilesApproxGated _),
    // third sketch key (r9): exact top-10 + Misra-Gries bound booleans
    "q_heavy_hitters"     -> (TextOps.heavyHittersGated _),
    "q_countmin_counts"   -> (TextOps.countMinGated _),
    "q_join_cardinality"  -> (RelOps.joinCardinalityGated _),
    "q_repetition_filter" -> (TextOps.repetitionFilter _),
    "q_topk_per_lang"     -> (TextOps.topkPerLang _),
    "q_tfidf_topterms"    -> (TextOps.tfidfTopTerms _),
    "q_bm25_topk"         -> (TextOps.bm25TopK _),
    // §2b — dedup
    "q_doc_dedup"         -> (DedupOps.docDedup _),
    "q_passage_dedup"     -> (DedupOps.passageDedup _),
    "q_substring_dedup"   -> (DedupOps.substringDedup _),
    "q_substring_lifecycle" -> (DedupOps.substringLifecycle _),
    "q_incremental_dedup" -> (DedupOps.incrementalDedup _),
    "q_ngram_jaccard"     -> (DedupOps.ngramJaccard _),
    "q_tfidf_neardup"     -> (DedupOps.tfidfNeardup _),
    "q_minhash_lsh"       -> (DedupOps.minhashLsh _),
    "q_minhash_persisted" -> (DedupOps.minhashPersisted _),
    "q_dedup_lifecycle"   -> (DedupOps.dedupLifecycle _),
    "q_minhash_verified"  -> (DedupOps.minhashVerified _),
    "q_neardup_groups"    -> (DedupOps.neardupGroups _),
    "q_ensemble_groups"   -> (DedupOps.ensembleGroups _),
    "q_simhash"           -> (DedupOps.simhash _),
    "q_simhash_neardup"   -> (DedupOps.simhashNearDup _),
    // §2b — similarity search
    "q_knn_cosine"        -> (SimilarityOps.knnCosine _),
    "q_ann_lsh_topk"      -> (SimilarityOps.annLshTopK _),
    "q_embedding_stats"   -> (SimilarityOps.embeddingStats _),
    "q_embedding_covariance" -> (SimilarityOps.embeddingCovariance _),
    "q_embedding_micros"  -> (SimilarityOps.embeddingMicros _),
    "q_power_iteration"   -> (SimilarityOps.powerIteration _),
    "q_power_lifecycle"   -> (SimilarityOps.powerLifecycle _),
    "q_cluster_topics"    -> (CurationOps.clusterTopics _),
    "q_random_projection" -> (SimilarityOps.randomProjection _),
    "q_embedding_neardup" -> (SimilarityOps.embeddingNearDup _),
    "q_embedding_neardup_lsh" -> (SimilarityOps.embeddingNearDupLsh _),
    "q_ivf_topk"          -> (SimilarityOps.ivfTopK _),
    "q_ivf_persisted"     -> (SimilarityOps.ivfPersistedTopK _),
    "q_hnsw_topk"         -> (SimilarityOps.hnswTopK _),
    "q_hnsw_lifecycle"    -> (SimilarityOps.hnswLifecycle _),
    "q_hard_negatives"    -> (SimilarityOps.hardNegatives _),
    "q_ivf_trained"       -> (SimilarityOps.ivfTrainedTopK _),
    "q_ann_lifecycle"     -> (SimilarityOps.annLifecycle _),
    "q_ivf_kmeans"        -> (SimilarityOps.ivfKmeans _),
    "q_pq_topk"           -> (SimilarityOps.pqTopK _),
    "q_pq_trained"        -> (SimilarityOps.pqTrainedTopK _),
    "q_ivfpq_topk"        -> (SimilarityOps.ivfPqTopK _),
    "q_ivfpq_lifecycle"   -> (SimilarityOps.ivfPqLifecycle _),
    "q_image_neardup"     -> (MultimodalOps.imageNearDup _),
    "q_phash_neardup"     -> (MultimodalOps.phashNearDup _),
    "q_audio_fingerprint" -> (MultimodalOps.audioFingerprint _),
    "q_video_neardup"     -> (MultimodalOps.videoNearDup _),
    "q_media_lifecycle"   -> (MultimodalOps.mediaLifecycle _),
    "q_semantic_dedup"    -> (SimilarityOps.semanticDedup _),
    // §2b — multimodal columns
    "q_multimodal_meta"   -> (MultimodalOps.multimodalMeta _),
    "q_multimodal_ann"    -> (MultimodalOps.multimodalAnn _),
    // §2b — curation (sampling / packing / scrubbing)
    "q_sample_stratified" -> (CurationOps.sampleStratified _),
    "q_domain_caps"       -> (CurationOps.domainCaps _),
    "q_curation_lifecycle" -> (CurationOps.curationLifecycle _),
    "q_pack_sequences"    -> (CurationOps.packSequences _),
    "q_chunk_docs"        -> (CurationOps.chunkDocs _),
    "q_mixture_plan"      -> (CurationOps.mixturePlan _),
    "q_pii_scrub"         -> (CurationOps.piiScrub _),
    "q_decontaminate"     -> (CurationOps.decontaminate _),
    "q_decontaminate_fuzzy" -> (CurationOps.decontaminateFuzzy _),
    "q_decontaminate_lifecycle" -> (CurationOps.decontaminateLifecycle _),
    "q_decontaminate_bloom" -> (CurationOps.decontaminateBloomGated _),
    "q_dsir_weights"      -> (CurationOps.dsirWeights _),
    "q_cluster_balance"   -> (CurationOps.clusterBalance _),
    "q_keyword_search"    -> (TextOps.keywordSearch _),
    "q_rocchio_search"    -> (TextOps.rocchioSearch _),
    "q_phrase_search"     -> (TextOps.phraseSearch _),
    "q_boolean_search"    -> (TextOps.booleanSearch _),
    "q_search_lifecycle"  -> (TextOps.searchLifecycle _),
    "q_hybrid_search"     -> (TextOps.hybridSearch _),
    "q_canonical_docs"    -> (DedupOps.canonicalDocs _),
    "q_trainval_split"    -> (DedupOps.trainValSplit _),
    "q_collocations"      -> (TextOps.collocations _),
    "q_curation_funnel"   -> (CurationPipeline.curationFunnel _),
    // §2b — governance: CDC application, validation, profiling
    "q_scd2_merge"        -> (GovernanceOps.scd2Merge _),
    "q_scd2_lifecycle"    -> (GovernanceOps.scd2Lifecycle _),
    "q_cdc_upsert"        -> (GovernanceOps.cdcUpsert _),
    "q_pit_join"          -> (GovernanceOps.pitJoin _),
    "q_table_checksum"    -> (GovernanceOps.tableChecksum _),
    "q_snapshot_diff"     -> (GovernanceOps.snapshotDiff _),
    "q_profile_stats"     -> (GovernanceOps.profileStats _),
    "q_fk_inference"      -> (GovernanceOps.fkInference _),
    "q_upsert_lifecycle"  -> (GovernanceOps.upsertLifecycle _),
    "q_equidepth_histogram" -> (GovernanceOps.equidepthHistogram _),
    "q_zorder_layout"     -> (GovernanceOps.zorderLayout _),
    "q_zonemap_prune"     -> (GovernanceOps.zonemapPrune _),
    "q_zonemap_lifecycle" -> (GovernanceOps.zonemapLifecycle _),
    "q_zonemap_optimize"  -> (GovernanceOps.zonemapOptimize _),
    "q_merge_on_read"     -> (GovernanceOps.mergeOnRead _),
    "q_mor_lifecycle"     -> (GovernanceOps.mergeOnReadLifecycle _),
    "q_dpp_prune"         -> (GovernanceOps.dppPrune _),
    "q_copy_on_write"     -> (GovernanceOps.copyOnWrite _),
    "q_time_travel"       -> (GovernanceOps.timeTravel _),
    "q_vacuum"            -> (GovernanceOps.vacuum _),
    "q_change_feed"       -> (GovernanceOps.changeFeed2 _),
    "q_bloom_skip"        -> (GovernanceOps.bloomSkip _),
    "q_bloom_lifecycle"   -> (GovernanceOps.bloomSkipLifecycle _),
    "q_ndv_agg_planned"   -> (graft.plans.NdvAggPlanner.ndvPlannedAgg _),
    "q_compaction_plan"   -> (GovernanceOps.compactionPlan _),
    "q_compaction_exec"   -> (GovernanceOps.compactionExec _),
    "q_cms_join_reorder"  -> (graft.plans.CmsJoinPlanner.cmsReorderedJoin _),
    "q_anomaly_mad"       -> (GovernanceOps.anomalyMad _),
    // §2b — graph analytics beyond connected components
    "q_pagerank"          -> (GraphOps.pagerank _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_client_txn_counts" -> RefViews.clientTransactionCountsSql,
    "q_view_sql"          -> RefViews.clientTransactionCountsSql,
    "q_view_sql_monthly"  -> RefViews.monthlyTransactionSummarySql,
    "q_view_sql_high"     -> RefViews.highTransactionAccountsSql,
    "q_monthly_summary"   -> RefViews.monthlyTransactionSummarySql,
    "q_high_txn_accounts" -> RefViews.highTransactionAccountsSql,
    "q_count"             -> RefViews.importCountsSql,
    "q_dedup_first"       -> Cleaning.dedupFirstSql,
    "q_coerce_fill"       -> Cleaning.coerceFillSql,
    "q_union_pages"       -> Cleaning.unionPagesSql,
    "q_format_roundtrip"  -> graft.sources.FileFormats.formatRoundtripSql,
    "q_schema_evolution"  -> graft.sources.FileFormats.schemaEvolutionSql,
    "q_winsorize"         -> GovernanceOps.winsorizeSql,
    "q_record_linkage"    -> LinkageOps.recordLinkageSql,
    "q_gap_fill"          -> EventOps.gapFillSql,
    "q_outer_counts"      -> RelOps.outerOrderCountsSql,
    "q_anti_clients"      -> RelOps.clientsWithoutOrdersSql,
    "q_semi_urgent"       -> RelOps.clientsWithUrgentOrdersSql,
    "q_distinct_users"    -> RelOps.distinctUsersSql,
    "q_approx_distinct"   -> RelOps.approxDistinctUsersGatedSql,
    "q_hll_intersect"     -> RelOps.hllIntersectGatedSql,
    "q_rollup_orders"     -> RelOps.rollupOrdersSql,
    "q_cube_orders"       -> RelOps.cubeOrdersSql,
    "q_intersect_users"   -> RelOps.usersClickAndPurchaseSql,
    "q_except_users"      -> RelOps.usersClickNoPurchaseSql,
    "q_running_totals"    -> RelOps.runningLineTotalsSql,
    "q_pivot_events"      -> RelOps.pivotEventCountsSql,
    "q_skew_agg"          -> RelOps.skewAggTwoPhaseSql,
    "q_unpivot_events"    -> RelOps.unpivotEventCountsSql,
    "q_json_extract"      -> EventOps.jsonExtractSql,
    "q_event_windows"     -> EventOps.eventWindowsSql,
    // batch-half + streamed-half merged partials must equal the
    // one-pass aggregation — the stream ≡ batch proof under the
    // unchanged oracle
    "q_events_lifecycle"  -> EventOps.eventsLifecycleSql,
    "q_user_sessions"     -> EventOps.userSessionsSql,
    // the skew-safe segmented path must produce the same sessions —
    // one oracle statement gates both execution shapes
    "q_sessions_skewsafe" -> EventOps.userSessionsSql,
    "q_asof_join"         -> EventOps.asofClickPurchaseSql,
    "q_funnel_steps"      -> EventOps.funnelStepsSql,
    "q_range_join"        -> EventOps.rangeJoinErrorViewsSql,
    "q_cohort_retention"  -> EventOps.cohortRetentionSql,
    "q_join_lifecycle"    -> EventOps.joinLifecycleSql,
    "q_session_lifecycle" -> EventOps.sessionLifecycleSql,
    "q_markov_transitions" -> EventOps.markovTransitionsSql,
    "q_interval_anti"     -> EventOps.intervalAntiSql,
    "q_moving_avg"        -> RelOps.movingAvgDailySql,
    "q_numeric_histogram" -> RelOps.numericHistogramSql,
    "q_itemset_pairs"     -> RelOps.itemsetPairsSql,
    "q_skyline_orders"    -> RelOps.skylineOrdersSql,
    "q_dq_checks"         -> GovernanceOps.dqChecksSql,
    "q_rfm_segments"      -> GovernanceOps.rfmSegmentsSql,
    "q_mv_rewrite"        -> graft.plans.MvRewrite.monthlyRevenueSql,
    "q_mv_join_rewrite"   -> graft.plans.MvJoinRewrite.monthlyClientRollupSql,
    "q_mv_avg_rewrite"    -> graft.plans.MvJoinRewrite.monthlyClientAvgRollupSql,
    "q_cms_join_planned"  -> graft.plans.CmsJoinPlanner.cmsPlannedJoinSql,
    "q_hnsw_batch"        -> SimilarityOps.hnswBatchTopKSql,
    "q_mv_lifecycle"      -> graft.plans.MvJoinRewrite.mvLifecycleSql,
    "q_triangle_count"    -> GraphOps.triangleStatsSql,
    "q_kcore"             -> GraphOps.kcoreSql,
    "q_shard_assignment"  -> GovernanceOps.shardAssignmentSql,
    "q_token_counts"      -> TextOps.tokenCountsSql,
    "q_quality_score"     -> TextOps.qualityScoreSql,
    "q_quality_classifier" -> TextOps.qualityClassifierSql,
    "q_classifier_train"  -> TextOps.classifierTrainOracleSql,
    "q_doc_fingerprint"   -> TextOps.docFingerprintSql,
    "q_rolling_fingerprint" -> TextOps.rollingFingerprintSql,
    "q_winnow_fingerprint" -> TextOps.winnowFingerprintSql,
    "q_winnow_overlap" -> TextOps.winnowOverlapSql,
    "q_bpe_tokens"        -> TextOps.bpeTokenCountsSql,
    "q_bpe_train"         -> TextOps.bpeTrainMergesSql,
    "q_bpe_apply"         -> TextOps.bpeApplySql,
    // the oracle re-derives the WHOLE unigram pipeline (seed, both EM
    // rounds, prune, Viterbi apply) from the corpus — hash match is an
    // end-to-end train+apply proof, like the BPE pair
    "q_unigram_train"     -> TextOps.unigramTrainSql,
    "q_unigram_apply"     -> TextOps.unigramApplySql,
    // third tokenizer family: sequential likelihood-scored merges
    // (exact HUGEINT cross-multiplied argmax) + greedy '##' matcher —
    // one hash each gates train and train+apply end to end
    "q_wordpiece_train"   -> TextOps.wordpieceTrainSql,
    "q_wordpiece_apply"   -> TextOps.wordpieceApplySql,
    // all three families trained+applied in ONE oracle (each family's
    // chain isolated in its own subquery) — the tokenizer-selection
    // fertility table, integer sums only
    "q_tokenizer_fertility" -> TextOps.tokenizerFertilitySql,
    "q_lang_id"           -> TextOps.langIdSql,
    "q_lang_ngram"        -> TextOps.langNgramSql,
    "q_lm_score"          -> TextOps.lmBigramScoreSql,
    "q_doc_quantiles"     -> TextOps.docQuantilesSql,
    "q_doc_quantiles_approx" -> TextOps.docQuantilesApproxGatedSql,
    "q_heavy_hitters"     -> TextOps.heavyHittersGatedSql,
    "q_countmin_counts"   -> TextOps.countMinGatedSql,
    "q_join_cardinality"  -> RelOps.joinCardinalityGatedSql,
    "q_repetition_filter" -> TextOps.repetitionFilterSql,
    "q_topk_per_lang"     -> TextOps.topkPerLangSql,
    "q_tfidf_topterms"    -> TextOps.tfidfTopTermsSql,
    "q_bm25_topk"         -> TextOps.bm25TopKSql,
    "q_doc_dedup"         -> DedupOps.docDedupSql,
    "q_passage_dedup"     -> DedupOps.passageDedupSql,
    "q_substring_dedup"   -> DedupOps.substringDedupSql,
    // lifecycle #8: half-built + streamed window-hash state, metric
    // from the accumulated rows under the UNCHANGED substring oracle
    "q_substring_lifecycle" -> DedupOps.substringDedupSql,
    "q_incremental_dedup" -> DedupOps.incrementalDedupSql,
    "q_ngram_jaccard"     -> DedupOps.ngramJaccardSql,
    "q_tfidf_neardup"     -> DedupOps.tfidfNeardupSql,
    "q_minhash_lsh"       -> DedupOps.minhashLshSql,
    // served from the persisted band index — same result, same oracle
    "q_minhash_persisted" -> DedupOps.minhashLshSql,
    // lifecycle #6: half-built + streamed-append band index answers the
    // SAME one-pass oracle — the stream ≡ batch proof for dedup
    "q_dedup_lifecycle"   -> DedupOps.dedupLifecycleSql,
    "q_minhash_verified"  -> DedupOps.minhashVerifiedSql,
    "q_neardup_groups"    -> DedupOps.neardupGroupsSql,
    "q_ensemble_groups"   -> DedupOps.ensembleGroupsSql,
    "q_simhash"           -> DedupOps.simhashSql,
    "q_simhash_neardup"   -> DedupOps.simhashNearDupSql,
    "q_knn_cosine"        -> SimilarityOps.knnCosineSql,
    "q_ann_lsh_topk"      -> SimilarityOps.annLshTopKSql,
    "q_embedding_stats"   -> SimilarityOps.embeddingStatsSql,
    "q_embedding_covariance" -> SimilarityOps.embeddingCovarianceSql,
    "q_embedding_micros"  -> SimilarityOps.embeddingMicrosSql,
    "q_power_iteration"   -> SimilarityOps.powerIterationSql,
    "q_power_lifecycle"   -> SimilarityOps.powerIterationSql,
    "q_cluster_topics"    -> CurationOps.clusterTopicsSql,
    // the ±1 projection matrix is derived INDEPENDENTLY by each engine
    // from md5 parity on the same literal strings — agreement is part
    // of what the hash gates; all arithmetic exact integer micros
    "q_random_projection" -> SimilarityOps.randomProjectionSql,
    "q_embedding_neardup" -> SimilarityOps.embeddingNearDupSql,
    "q_embedding_neardup_lsh" -> SimilarityOps.embeddingNearDupLshSql,
    "q_ivf_topk"          -> SimilarityOps.ivfTopKSql,
    // the persisted-index probe returns exactly what the in-flight IVF
    // query returns — one oracle statement gates both execution shapes
    "q_ivf_persisted"     -> SimilarityOps.ivfTopKSql,
    "q_hnsw_topk"         -> SimilarityOps.hnswTopKSql,
    "q_hnsw_lifecycle"    -> SimilarityOps.hnswLifecycleSql,
    "q_hard_negatives"    -> SimilarityOps.hardNegativesSql,
    "q_ivf_trained"       -> SimilarityOps.ivfTrainedTopKSql,
    // half-build + stream-appended-half must probe EXACTLY like the
    // one-pass trained build — the full train→persist→probe oracle
    "q_ann_lifecycle"     -> SimilarityOps.ivfTrainedTopKSql,
    "q_ivf_kmeans"        -> SimilarityOps.ivfKmeansSql,
    "q_pq_topk"           -> SimilarityOps.pqTopKSql,
    "q_pq_trained"        -> SimilarityOps.pqTrainedTopKSql,
    "q_ivfpq_topk"        -> SimilarityOps.ivfPqTopKSql,
    // streamed composed index must answer exactly like the one-pass build
    "q_ivfpq_lifecycle"   -> SimilarityOps.ivfPqTopKSql,
    "q_image_neardup"     -> MultimodalOps.imageNearDupSql,
    "q_phash_neardup"     -> MultimodalOps.phashNearDupSql,
    "q_audio_fingerprint" -> MultimodalOps.audioFingerprintSql,
    "q_video_neardup"     -> MultimodalOps.videoNearDupSql,
    // half-built + streamed-half media index probed under the unchanged
    // full-corpus oracle — stream ≡ batch for the media family
    "q_media_lifecycle"   -> MultimodalOps.mediaLifecycleSql,
    "q_semantic_dedup"    -> SimilarityOps.semanticDedupSql,
    "q_multimodal_meta"   -> MultimodalOps.multimodalMetaSql,
    "q_multimodal_ann"    -> MultimodalOps.multimodalAnnSql,
    "q_sample_stratified" -> CurationOps.sampleStratifiedSql,
    "q_domain_caps"       -> CurationOps.domainCapsSql,
    // lifecycle #7: half batch-curated + half streamed through the
    // real dedup-state curation, gated under the one-pass batch oracle
    "q_curation_lifecycle" -> CurationOps.curationLifecycleSql,
    "q_pack_sequences"    -> CurationOps.packSequencesSql,
    "q_chunk_docs"        -> CurationOps.chunkDocsSql,
    "q_mixture_plan"      -> CurationOps.mixturePlanSql,
    "q_pii_scrub"         -> CurationOps.piiScrubSql,
    "q_decontaminate"     -> CurationOps.decontaminateSql,
    "q_decontaminate_fuzzy" -> CurationOps.decontaminateFuzzySql,
    // lifecycle #9: per-batch streamed triage vs the static benchmark,
    // union gated under the UNCHANGED fuzzy-decontamination oracle
    "q_decontaminate_lifecycle" -> CurationOps.decontaminateFuzzySql,
    "q_decontaminate_bloom" -> CurationOps.decontaminateBloomGatedSql,
    "q_dsir_weights"      -> CurationOps.dsirWeightsSql,
    "q_cluster_balance"   -> CurationOps.clusterBalanceSql,
    "q_keyword_search"    -> TextOps.keywordSearchSql,
    "q_rocchio_search"    -> TextOps.rocchioSearchSql,
    "q_phrase_search"     -> TextOps.phraseSearchSql,
    "q_boolean_search"    -> TextOps.booleanSearchSql,
    "q_hybrid_search"     -> TextOps.hybridSearchSql,
    "q_canonical_docs"    -> DedupOps.canonicalDocsSql,
    "q_trainval_split"    -> DedupOps.trainValSplitSql,
    // build-half + stream-appended-half must serve EXACTLY what a
    // one-pass build serves — the full-corpus keyword oracle verbatim
    "q_search_lifecycle"  -> TextOps.searchLifecycleSql,
    "q_collocations"      -> TextOps.collocationsSql,
    "q_curation_funnel"   -> CurationPipeline.curationFunnelSql,
    "q_scd2_merge"        -> GovernanceOps.scd2MergeSql,
    // lifecycle #10: batch-half + streamed CDC change-log appends,
    // SCD2 built from the accumulated log under the UNCHANGED oracle
    "q_scd2_lifecycle"    -> GovernanceOps.scd2MergeSql,
    "q_cdc_upsert"        -> GovernanceOps.cdcUpsertSql,
    // point-in-time join: Spark = as-of union trick (one exchange),
    // oracle = DuckDB's native ASOF LEFT JOIN — two independent
    // implementations of the temporal-join semantics
    "q_pit_join"          -> GovernanceOps.pitJoinSql,
    // both engines hash the SAME canonical row string (one shared
    // kind table builds both sides), so sum-of-row-hashes matches or
    // the canonicalization itself is broken — the validation operator
    // validated by the gate it implements
    "q_table_checksum"    -> GovernanceOps.tableChecksumSql,
    // the checksum's row-level companion: WHERE two replicas diverged —
    // keep-latest per side, full-outer on the key, matches dropped
    "q_snapshot_diff"     -> GovernanceOps.snapshotDiffSql,
    "q_profile_stats"     -> GovernanceOps.profileStatsSql,
    "q_fk_inference"      -> GovernanceOps.fkInferenceSql,
    "q_upsert_lifecycle"  -> GovernanceOps.cdcUpsertSql,
    "q_equidepth_histogram" -> GovernanceOps.equidepthHistogramSql,
    "q_zorder_layout"     -> GovernanceOps.zorderLayoutSql,
    "q_zonemap_prune"     -> GovernanceOps.zonemapPruneSql,
    "q_zonemap_lifecycle" -> GovernanceOps.zonemapLifecycleSql,
    "q_zonemap_optimize"  -> GovernanceOps.zonemapOptimizeSql,
    "q_merge_on_read"     -> GovernanceOps.mergeOnReadSql,
    "q_mor_lifecycle"     -> GovernanceOps.mergeOnReadLifecycleSql,
    "q_dpp_prune"         -> GovernanceOps.dppPruneSql,
    "q_copy_on_write"     -> GovernanceOps.copyOnWriteSql,
    "q_time_travel"       -> GovernanceOps.timeTravelSql,
    "q_vacuum"            -> GovernanceOps.vacuumSql,
    "q_change_feed"       -> GovernanceOps.changeFeed2Sql,
    "q_bloom_skip"        -> GovernanceOps.bloomSkipSql,
    "q_bloom_lifecycle"   -> GovernanceOps.bloomSkipLifecycleSql,
    "q_ndv_agg_planned"   -> graft.plans.NdvAggPlanner.ndvPlannedAggSql,
    "q_compaction_plan"   -> GovernanceOps.compactionPlanSql,
    "q_compaction_exec"   -> GovernanceOps.compactionExecSql,
    "q_cms_join_reorder"  -> graft.plans.CmsJoinPlanner.cmsReorderedJoinSql,
    // exact integer-cents space: percentile interpolation over
    // integers yields exact binary fractions, so median/MAD/fence
    // comparisons are bit-identical cross-engine
    "q_anomaly_mad"       -> GovernanceOps.anomalyMadSql,
    // ten unrolled exact-integer iterations — micro-unit ranks with
    // truncating division, so the hash gates the full iteration chain
    "q_pagerank"          -> GraphOps.pagerankSql,
  )
}

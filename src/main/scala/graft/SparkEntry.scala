package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every oracle-checked query obeys the determinism rules from SURVEY §5:
  * total ORDER BY with unique tie-breaks, rounded float aggregates where
  * accumulation order differs between Spark and DuckDB, computed integers
  * cast to BIGINT on both sides, timestamps cast to µs (or formatted to
  * strings) on the DuckDB side to neutralize the parquet ns/µs gap.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggPricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * LLM-pipeline extensions: text stats/langid/fingerprint, embedding
    * near-dup, IVF ANN).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 scans
    "q_scan_filter" -> (Relational.scanFilter _),
    // §2.4 aggregation
    "q_agg_pricing" -> (Relational.aggPricing _),
    "q_distinct_users" -> (Events.distinctUsers _),
    "q_approx_distinct" -> (Events.approxDistinct _),
    "q_rollup_revenue" -> (Relational.rollupRevenue _),
    // §2.3 joins
    "q_join_segment" -> (Relational.joinSegment _),
    "q_join_5way" -> (Relational.join5Way _),
    "q_semi_join" -> (Relational.semiJoin _),
    "q_anti_join" -> (Relational.antiJoin _),
    // §2.5 windows
    "q_window_rank" -> (Windows.windowRank _),
    "q_window_running" -> (Windows.windowRunning _),
    "q_sessionize" -> (Windows.sessionize _),
    "q_user_deltas" -> (Windows.userDeltas _),
    "q_rolling_7d" -> (Windows.rolling7d _),
    "q_order_quartiles" -> (Windows.orderQuartiles _),
    // §2.6 sort/limit/set ops
    "q_topk_parts" -> (Relational.topkParts _),
    "q_topk_brand" -> (Relational.topkBrand _),
    "q_setops" -> (Relational.setops _),
    "q_percentiles" -> (Relational.percentiles _),
    "q_approx_percentiles" -> (Relational.approxPercentiles _),
    "q_above_avg" -> (Relational.aboveAvg _),
    // schema-breadth queries (supplier FK edge, date buckets, catalog,
    // embedding labels)
    "q_supplier_nation" -> (Relational.supplierNation _),
    "q_priority_years" -> (Relational.priorityYears _),
    "q_brand_stats" -> (Relational.brandStats _),
    "q_label_stats" -> (VectorOps.labelStats _),
    // §2.2 semi-structured
    "q_json_extract" -> (Events.jsonExtract _),
    // temporal joins (range / as-of)
    "q_range_join" ->
      ((s: SparkSession, d: String) => Events.rangeJoinErrors(s, d)),
    "q_asof_lookup" -> (Events.asofPurchase _),
    // §2.9 streaming batch twins
    "q_tumbling_1h" -> (Events.tumbling1h _),
    "q_funnel" -> (Events.funnel _),
    "q_sliding_15m" -> (Events.sliding15m _),
    "q_enrich_segments" -> (Events.enrichSegments _),
    // §2.7 text
    "q_text_wordcount" -> (TextOps.wordcount _),
    "q_dedup_docs" -> (TextOps.dedupDocs _),
    "q_text_stats" -> (TextOps.textStats _),
    "q_text_langid" -> (TextOps.langId _),
    "q_text_fingerprint" -> (TextOps.fingerprint _),
    "q_quality_filter" ->
      ((s: SparkSession, d: String) => TextOps.qualityFilter(s, d)),
    "q_approx_topk" ->
      ((s: SparkSession, d: String) => TextOps.approxTopK(s, d)),
    "q_split_assign" -> (TextOps.splitAssign _),
    "q_mix_sources" -> (TextOps.mixSources _),
    "q_sample_stratified" ->
      ((s: SparkSession, d: String) => TextOps.sampleStratified(s, d)),
    "q_text_repetition" -> (TextOps.textRepetition _),
    "q_pack_sequences" ->
      ((s: SparkSession, d: String) => TextOps.packSequences(s, d)),
    "q_decontaminate" ->
      ((s: SparkSession, d: String) => DedupOps.decontaminate(s, d)),
    // §2.8 vectors
    "q_vector_knn" -> ((s: SparkSession, d: String) => VectorOps.knn(s, d)),
    "q_vector_search" ->
      ((s: SparkSession, d: String) => VectorOps.vectorSearch(s, d)),
    "q_dedup_embed" ->
      ((s: SparkSession, d: String) => VectorOps.embedNearDup(s, d)),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => VectorOps.annIvf(s, d)),
    "q_ann_ivfpq" ->
      ((s: SparkSession, d: String) => VectorOps.annIvfPq(s, d)),
    "q_semantic_dedup" ->
      ((s: SparkSession, d: String) => VectorOps.semanticDedup(s, d)),
    // LLM-pipeline near-dup family
    "q_dedup_ngram" ->
      ((s: SparkSession, d: String) => DedupOps.ngramDedupAuto(s, d)),
    "q_dedup_minhash" -> (DedupOps.minhashLsh _),
    "q_dedup_simhash" -> (DedupOps.simhash _),
    "q_dedup_simhash_pairs" ->
      ((s: SparkSession, d: String) => DedupOps.simhashPairs(s, d)),
    "q_dedup_clusters" ->
      ((s: SparkSession, d: String) => DedupOps.dedupClusters(s, d)),
    "q_dedup_incremental" ->
      ((s: SparkSession, d: String) => DedupOps.ngramIncremental(s, d)),
    "q_dedup_substring" ->
      ((s: SparkSession, d: String) => DedupOps.substringDup(s, d)),
    // round 13: per-doc largest shared-span width (dedup-depth triage)
    "q_max_dup_span" ->
      ((s: SparkSession, d: String) => DedupOps.maxDupSpan(s, d)),
    // multimodal: real JDK codecs (ImageIO / AudioSystem) over synthesized
    // PNG/WAV/frame-container blobs
    "q_multimodal" -> (Multimodal.mediaFeatures _),
    // round 6 additions: pivot/cube/histogram/moments, gap-fill, tf-idf,
    // corpus vocabulary
    "q_pivot_priority" -> (Relational.pivotPriority _),
    "q_unpivot_priority" -> (Relational.unpivotPriority _),
    "q_cube_returns" -> (Relational.cubeReturns _),
    "q_grouping_sets" -> (Relational.groupingSetsRevenue _),
    "q_histogram" -> (Relational.histogramOrders _),
    "q_weekday_orders" -> (Relational.weekdayOrders _),
    "q_small_qty_revenue" -> (Relational.smallQtyRevenue _),
    "q_label_centroids" -> (VectorOps.labelCentroids _),
    "q_stats_moments" -> (Relational.statsMoments _),
    "q_gapfill" -> (Events.gapfillHourly _),
    "q_conversion_lag" -> (Events.conversionLag _),
    "q_cohort_retention" -> (Events.cohortRetention _),
    "q_dau_mau" -> (Events.dauMau _),
    "q_skew_join" -> (Events.saltedEnrich _),
    "q_tfidf" -> ((s: SparkSession, d: String) => TextOps.tfidf(s, d)),
    "q_vocab_growth" -> (TextOps.vocabGrowth _),
    // round 7: join/set-op types previously covered only in unit tests
    "q_fullouter_hours" -> (Events.fullOuterHours _),
    "q_except" -> (Relational.exceptBigSpenders _),
    "q_anomaly_hours" -> (Events.anomalyHours _),
    // round 8: behavioral / cadence / vocab-coverage analytics
    "q_event_transitions" -> (Events.eventTransitions _),
    "q_order_gaps" -> (Relational.orderGaps _),
    "q_oov_rate" -> ((s: SparkSession, d: String) => TextOps.oovRate(s, d)),
    "q_session_stats" -> (Windows.sessionStats _),
    "q_setops_all" -> (Relational.setopsAll _),
    "q_decontaminate_embed" ->
      ((s: SparkSession, d: String) => VectorOps.decontaminateEmbed(s, d)),
    "q_langid_confusion" -> (TextOps.langIdConfusion _),
    "q_rfm_segments" -> (Relational.rfmSegments _),
    "q_basket_pairs" ->
      ((s: SparkSession, d: String) => Relational.basketPairs(s, d)),
    // round 11: retrieval (BM25), LM-perplexity quality gate, full-corpus
    // k-means, near-dup cluster size profile
    "q_bm25" -> ((s: SparkSession, d: String) => TextOps.bm25(s, d)),
    "q_doc_perplexity" -> (TextOps.docPerplexity _),
    "q_kmeans" -> ((s: SparkSession, d: String) => VectorOps.kmeans(s, d)),
    "q_cluster_sizes" ->
      ((s: SparkSession, d: String) => DedupOps.clusterSizes(s, d)),
    "q_sample_weighted" ->
      ((s: SparkSession, d: String) => TextOps.sampleWeighted(s, d)),
    "q_curriculum_buckets" ->
      ((s: SparkSession, d: String) => TextOps.curriculumBuckets(s, d)),
    // round 11, batch 4: contrastive hard negatives, label-outlier audit,
    // dedup keep/drop verdicts, source-interleaved training order
    "q_hard_negatives" ->
      ((s: SparkSession, d: String) => VectorOps.hardNegatives(s, d)),
    "q_embedding_outliers" ->
      ((s: SparkSession, d: String) => VectorOps.labelOutliers(s, d)),
    "q_dedup_keep" ->
      ((s: SparkSession, d: String) => DedupOps.dedupKeep(s, d)),
    "q_shuffle_order" -> (TextOps.shuffleOrder _),
    // round 11, batch 5: temperature mixing weights, budget-constrained
    // quality selection
    "q_source_temperature" ->
      ((s: SparkSession, d: String) => TextOps.sourceTemperature(s, d)),
    "q_token_budget" ->
      ((s: SparkSession, d: String) => TextOps.tokenBudget(s, d)),
    // round 12: tokenizer TRAINING — exact BPE merge learning (vocab-
    // table iterations, corpus scanned once; no SQL oracle, spec-pinned
    // vs an independent local BPE)
    "q_bpe_merges" ->
      ((s: SparkSession, d: String) => TextOps.bpeMerges(s, d)),
    "q_bpe_encode" ->
      ((s: SparkSession, d: String) => TextOps.bpeEncode(s, d)),
    // round 13: the second tokenizer family — unigram-LM (SentencePiece
    // class) EM training + encode; same vocab-table discipline, no SQL
    // oracle, spec-pinned vs an independent local recompute
    "q_unigram_train" ->
      ((s: SparkSession, d: String) => TextOps.unigramTrain(s, d)),
    "q_unigram_encode" ->
      ((s: SparkSession, d: String) => TextOps.unigramEncode(s, d)),
    // round 13: distributed PCA spectrum over the embedding column
    // (one-pass Gram + driver Jacobi; no SQL oracle - eigendecomposition)
    "q_embedding_pca" ->
      ((s: SparkSession, d: String) => VectorOps.embeddingPca(s, d)),
    // round 16: the PCA APPLY step (top-k projection, sign-canonical
    // basis; no SQL oracle — same eigendecomposition exemption) and the
    // SRP-banding calibration curve (no SQL oracle — md5 Box-Muller
    // hyperplanes + float dot-product signs are not engine-portable).
    // r17: graded as the LONG form (vec_id, component, coordinate) — the
    // r16 array-typed `proj` column was unhashable by the driver's
    // pandas differ (CORRECTNESS_r16 err; graded outputs must be
    // scalar-columned). pcaProject stays the array-returning library seam.
    "q_pca_project" ->
      ((s: SparkSession, d: String) => VectorOps.pcaProjectLong(s, d)),
    "q_srp_recall" ->
      ((s: SparkSession, d: String) => VectorOps.srpRecall(s, d)),
    // round 16: int8 scalar-quantization audit — ORACLE-backed (pinned
    // IEEE op order + decimal-term means, the embedding_norms class)
    "q_embed_quantize" ->
      ((s: SparkSession, d: String) => VectorOps.embedQuantize(s, d)),
    // round 16: int8 retrieval-impact audit — ORACLE-backed kNN (both
    // engines rank bit-identical pinned-order sims, (sim, id) tiebreak)
    "q_quantize_recall" ->
      ((s: SparkSession, d: String) => VectorOps.quantizeRecall(s, d)),
    // round 17: percentile-clipped int8 variants — the tuning curve
    // that makes the r16 audit pair actionable (ORACLE-backed: the
    // clipped scale is an exact order statistic in both engines)
    "q_embed_quantize_clip" ->
      ((s: SparkSession, d: String) => VectorOps.embedQuantizeClip(s, d)),
    "q_quantize_recall_clip" ->
      ((s: SparkSession, d: String) => VectorOps.quantizeRecallClip(s, d)),
    // round 17: per-label semantic dup-rate — the embedding-tier analog
    // of q_media_dup_rate, riding the graded CC output (ORACLE-backed:
    // the recursive-CTE closure class)
    "q_label_dup_rate" ->
      ((s: SparkSession, d: String) => VectorOps.labelDupRate(s, d)),
    // round 17: the planning composition — per-label token mass before/
    // after semantic dedup (ORACLE-backed: shared closure + shared
    // string_split token convention)
    "q_label_token_yield" ->
      ((s: SparkSession, d: String) => VectorOps.labelTokenYield(s, d)),
    // round 17: PCA-then-quantize composition audit (no SQL oracle —
    // the eigendecomposition exemption upstream; spec pins the
    // zero-mean lossless fixture, bounds, determinism)
    "q_pca_quantize_recall" ->
      ((s: SparkSession, d: String) => VectorOps.pcaQuantizeRecall(s, d)),
    // round 18: IVF-SERVED retrieval-impact audit — recall@k of a real
    // VectorIndex probe over the compressed representations vs exact
    // float truth (no SQL oracle — the k-means/index exemption; spec
    // pins probe ≡ exact brute force over the same rep at nprobe=nlist)
    "q_ivf_served_recall" ->
      ((s: SparkSession, d: String) => VectorOps.ivfServedRecall(s, d)),
    // round 19: the CLIP-rule leg of the served audit — completes the
    // 2×2 matrix {max, clip} × {int8, pca8+int8} (no SQL oracle — same
    // k-means/index exemption and probe-≡-brute-force spec pin as
    // q_ivf_served_recall; only the per-dim scale rule differs)
    "q_ivf_served_recall_clip" ->
      ((s: SparkSession, d: String) => VectorOps.ivfServedRecallClip(s, d)),
    // round 18: POST-DEDUP epoch plan — q_epoch_plan's temperature
    // machinery over q_label_token_yield's kept-token masses
    // (ORACLE-backed: both parents are, and the composition reuses
    // their proven arithmetic verbatim)
    "q_epoch_plan_dedup" ->
      ((s: SparkSession, d: String) => VectorOps.epochPlanDedup(s, d)),
    // round 16: IVF cell-balance audit (no SQL oracle — the k-means
    // exemption; spec pins conservation, shares, the saturation law)
    "q_ivf_balance" ->
      ((s: SparkSession, d: String) => VectorOps.ivfBalance(s, d)),
    // round 16: per-codec media duplication report (no SQL oracle —
    // the JDK codec exemption, like the rest of the media family)
    "q_media_dup_rate" ->
      ((s: SparkSession, d: String) => Multimodal.mediaDupRate(s, d)),
    // round 14: the runtime recall audit semanticClustersCell's contract
    // tells off-fixture callers to run, as a first-class operator (no
    // SQL oracle — the found side is the k-means cell-candidate source;
    // the spec pins 1.0 at the graded config and <1 at nassign=1)
    "q_recall_audit" ->
      ((s: SparkSession, d: String) => VectorOps.semanticRecallAudit(s, d)),
    // round 14: feed-direction containment, duplicated-opening gate,
    // and the two remaining classic decision-support shapes (Q18
    // HAVING-on-grouped-sum, Q2 decorrelated argmin)
    "q_source_containment" -> (DedupOps.sourceContainment _),
    "q_boilerplate_prefix" ->
      ((s: SparkSession, d: String) => TextOps.boilerplatePrefix(s, d)),
    "q_big_orders" ->
      ((s: SparkSession, d: String) => Relational.bigOrders(s, d)),
    "q_cheapest_supplier" ->
      ((s: SparkSession, d: String) => Relational.cheapestSupplier(s, d)),
    "q_dup_inflation" ->
      ((s: SparkSession, d: String) => DedupOps.dupInflation(s, d)),
    // round 15: Q21 decorrelation, df-cap calibration, window-fill
    // audit, oracle-backed vector norms
    "q_blocking_suppliers" ->
      ((s: SparkSession, d: String) => Relational.blockingSuppliers(s, d)),
    "q_shingle_df" ->
      ((s: SparkSession, d: String) => DedupOps.shingleDfProfile(s, d)),
    "q_context_fill" ->
      ((s: SparkSession, d: String) => TextOps.contextFill(s, d)),
    "q_embedding_norms" ->
      ((s: SparkSession, d: String) => VectorOps.embeddingNorms(s, d)),
    "q_cluster_purity" ->
      ((s: SparkSession, d: String) => VectorOps.clusterPurity(s, d)),
    "q_span_corruption" ->
      ((s: SparkSession, d: String) => TextOps.spanCorruption(s, d)),
    // round 11, batch 6: leak attribution, signal calibration, threshold
    // tuning
    "q_contamination_sources" ->
      ((s: SparkSession, d: String) => DedupOps.contaminationSources(s, d)),
    "q_quality_perplexity" ->
      ((s: SparkSession, d: String) => TextOps.qualityPerplexity(s, d)),
    "q_sim_histogram" ->
      ((s: SparkSession, d: String) => DedupOps.simHistogram(s, d)),
    // round 11, batch 7: feed-level duplication structure
    "q_cross_source_dups" ->
      ((s: SparkSession, d: String) => DedupOps.crossSourceDups(s, d)),
    "q_dup_rate_by_source" ->
      ((s: SparkSession, d: String) => DedupOps.dupRateBySource(s, d)),
    // round 11, batch 8: sketch calibration, feed novelty, label
    // cohesion, drift monitoring, epoch planning
    "q_minhash_recall" ->
      ((s: SparkSession, d: String) => DedupOps.minhashRecall(s, d)),
    "q_ngram_novelty" -> (DedupOps.ngramNovelty _),
    "q_label_cohesion" -> (VectorOps.labelCohesion _),
    "q_psi_drift" ->
      ((s: SparkSession, d: String) => Events.psiDrift(s, d)),
    "q_epoch_plan" ->
      ((s: SparkSession, d: String) => TextOps.epochPlan(s, d)),
    // round 11, batch 9: eval-side contamination verdict, entropy gate
    "q_eval_leakage" -> (DedupOps.evalLeakage _),
    "q_text_entropy" -> (TextOps.textEntropy _),
    // round 11, batch 10: the estimator leg of the sketch-trust triad
    "q_minhash_est" ->
      ((s: SparkSession, d: String) => DedupOps.minhashEst(s, d)),
    // round 11, batch 11: distributional feed audits — frequency-level
    // skew (KL vs corpus) and the Zipf curve-shape gate
    "q_source_kl" -> (TextOps.sourceKl _),
    "q_zipf_slope" -> (TextOps.zipfSlope _),
    // round 11, batch 11: MOSS winnowing — bounded-density localized
    // fingerprints between substring (exhaustive) and minhash (sketch)
    "q_winnow_fingerprints" ->
      ((s: SparkSession, d: String) => DedupOps.winnowFingerprints(s, d)),
    // round 11, batch 11: the two classic decision-support shapes the
    // relational surface lacked — Q8 market-share ratio, Q11
    // global-fraction threshold
    "q_market_share" ->
      ((s: SparkSession, d: String) => Relational.marketShare(s, d)),
    "q_top_value_parts" ->
      ((s: SparkSession, d: String) => Relational.topValueParts(s, d)),
    // round 12: the remaining classic decision-support shapes — Q7
    // two-role dimension chain, Q14 conditional-agg ratio, Q19
    // disjunctive join residual, Q22 scalar-bar + anti join, Q4
    // correlated-EXISTS semi join — plus the activity-concentration
    // audit (exact Gini) on events
    "q_nation_trade" ->
      ((s: SparkSession, d: String) => Relational.nationTrade(s, d)),
    "q_promo_share" ->
      ((s: SparkSession, d: String) => Relational.promoShare(s, d)),
    "q_disjunctive" ->
      ((s: SparkSession, d: String) => Relational.disjunctiveRevenue(s, d)),
    "q_cust_balance" ->
      ((s: SparkSession, d: String) => Relational.custBalance(s, d)),
    "q_late_orders" ->
      ((s: SparkSession, d: String) => Relational.lateOrders(s, d)),
    // round 12, batch 2: the remaining canonical decision-support
    // shapes — Q3 ranked unshipped revenue, Q5 local-supplier equality
    // chain, Q6 pure pushdown aggregate, Q10 returned-revenue churn list
    "q_unshipped_orders" ->
      ((s: SparkSession, d: String) => Relational.unshippedOrders(s, d)),
    "q_local_volume" ->
      ((s: SparkSession, d: String) => Relational.localSupplierVolume(s, d)),
    "q_revenue_forecast" ->
      ((s: SparkSession, d: String) => Relational.revenueForecast(s, d)),
    "q_returned_customers" ->
      ((s: SparkSession, d: String) => Relational.returnedCustomers(s, d)),
    "q_activity_gini" ->
      ((s: SparkSession, d: String) => Events.activityGini(s, d)),
    "q_gini_binned" ->
      ((s: SparkSession, d: String) => Events.activityGiniBinned(s, d)),
    "q_audience_overlap" ->
      ((s: SparkSession, d: String) => Events.audienceOverlap(s, d)),
    "q_event_paths" ->
      ((s: SparkSession, d: String) => Events.eventPaths(s, d)),
    // round 11, batch 12: the media leg of the dedup family — aHash
    // perceptual fingerprints (rows-only: JDK codec work, spec-verified)
    "q_media_phash" -> (Multimodal.mediaPhash _),
    "q_media_audio" -> (Multimodal.mediaAudioHash _),
    // round 13: media pairs -> clusters (the text tier's CC symmetry)
    "q_media_clusters" ->
      ((s: SparkSession, d: String) => Multimodal.mediaClusters(s, d)),
    // round 11, batch 13: per-feed label quality + length profiles
    "q_lang_mislabel" -> (TextOps.langMislabel _),
    "q_length_profile" -> (TextOps.lengthProfile _),
    // round 11, batch 14: semantic near-dup families — CC over the
    // embedding pair graph (the SemDeDup action-list complement)
    // graded on the CELL-candidate edge source (the scale path; measured
    // recall-1 vs brute force at both fixtures, spec-pinned row-identity —
    // VectorOps.cellPairs Scaladoc); semanticClusters stays the exact
    // brute-force truth reference the spec compares against
    "q_semantic_clusters" ->
      ((s: SparkSession, d: String) => VectorOps.semanticClustersCell(s, d)),
    // round 11, batch 15: the winnowing match list
    "q_winnow_pairs" ->
      ((s: SparkSession, d: String) => DedupOps.winnowPairs(s, d)),
    // round 11, batch 16: the last two classic decision-support shapes —
    // Q13 count-of-counts with the zero bucket, Q15 ties-preserving max
    "q_cust_order_dist" -> (Relational.custOrderDist _),
    "q_top_supplier" -> (Relational.topSupplier _),
  )

  /** DuckDB-dialect oracle per query. Omitted (→ driver rows-only check):
    * q_approx_distinct and q_approx_percentiles (sketch impls differ
    * across engines by design), q_ann_ivf / q_ann_ivfpq /
    * q_semantic_dedup (k-means quantizers are not SQL-expressible at
    * reasonable cost), q_multimodal / q_media_phash / q_media_audio
    * (JDK codec + renderer work), q_media_clusters (same codec exemption,
    * CC over the banded media pairs), q_bpe_merges / q_bpe_encode (iterative
    * argmax-and-rewrite + its learned-merge apply, the k-means
    * exemption), q_unigram_train / q_unigram_encode (iterative
    * Viterbi-EM pruning, the same exemption), q_embedding_pca
    * (eigendecomposition), q_pca_project (the same eigendecomposition
    * applied), q_recall_audit (its found side is the
    * k-means cell-candidate source), q_srp_recall (md5-seeded
    * Box-Muller hyperplanes + float dot-product signs are not
    * engine-portable SQL); each is covered by
    * bounded-error / recall / determinism assertions in the test suite
    * instead.
    */
  def oracleSql: Map[String, String] = Map(
    "q_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | l_discount, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2)))) AS BIGINT) AS sum_qty,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))) AS BIGINT) AS sum_base,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1-l_discount AS DECIMAL(4,2)))) AS BIGINT) AS sum_disc,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1-l_discount AS DECIMAL(4,2))*CAST(1+l_tax AS DECIMAL(4,2)))) AS BIGINT) AS sum_charge,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*), 4) AS avg_qty,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)/COUNT(*), 4) AS avg_price,
        | ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)/COUNT(*), 4) AS avg_disc,
        | COUNT(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT r_name, n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1-l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_join_segment" ->
      """SELECT c_mktsegment,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS BIGINT) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_5way" ->
      """SELECT r_name, n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1-l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   ROW_NUMBER() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_window_running" ->
      """SELECT user_id, event_id,
        | ROUND(SUM(value) OVER (PARTITION BY user_id
        |   ORDER BY CAST(ts AS TIMESTAMP), event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |   AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |   value FROM events),
        |g AS (SELECT *, CASE WHEN prev_ts IS NULL
        |   OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_ts FROM e)),
        |s AS (SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |   AS session_id FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | ROUND(SUM(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q_user_deltas" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |g AS (SELECT user_id,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS gap_us
        |  FROM e)
        |SELECT user_id, COUNT(*) AS n_gaps, MAX(gap_us) AS max_gap_us,
        |  CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_topk_parts" ->
      """SELECT p_partkey, p_name, CAST(ROUND(rev) AS BIGINT) AS revenue
        |FROM (SELECT p_partkey, p_name,
        |   SUM(l_extendedprice*(1-l_discount)) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_partkey, p_name ORDER BY rev DESC, p_partkey LIMIT 10)
        |ORDER BY revenue DESC, p_partkey""".stripMargin,
    "q_topk_brand" ->
      """SELECT p_brand, p_partkey, CAST(ROUND(rev) AS BIGINT) AS revenue, rn
        |FROM (SELECT p_brand, p_partkey, rev,
        |   ROW_NUMBER() OVER (PARTITION BY p_brand
        |     ORDER BY rev DESC, p_partkey) AS rn
        |  FROM (SELECT p_brand, p_partkey,
        |     SUM(l_extendedprice*(1-l_discount)) AS rev
        |    FROM lineitem JOIN part ON l_partkey = p_partkey
        |    GROUP BY 1, 2))
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "q_above_avg" ->
      """WITH o AS (SELECT *, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS tc
        |  FROM orders),
        |a AS (SELECT o_custkey AS ck,
        |  CAST(SUM(tc) AS BIGINT) AS sum_cents, COUNT(*) AS n
        |  FROM o GROUP BY 1)
        |SELECT o_orderkey, o_custkey, o_totalprice,
        | CAST((2 * sum_cents + n) // (2 * n) AS BIGINT) AS cust_avg_cents
        |FROM o JOIN a ON o_custkey = ck
        |WHERE tc * n > sum_cents
        |ORDER BY o_orderkey""".stripMargin,
    "q_percentiles" ->
      """SELECT c_mktsegment,
        | ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        | ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        | COUNT(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_setops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer
        |  INTERSECT
        |  SELECT o_custkey FROM orders)
        |ORDER BY c_custkey LIMIT 100""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
        | ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_range_join" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  value, event_type FROM events)
        |SELECT a.event_id, COUNT(*) AS n_prior,
        | ROUND(SUM(b.value), 2) AS sum_prior
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.ts >= a.ts - INTERVAL 24 HOUR AND b.ts < a.ts
        |WHERE a.event_type = 'error'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_asof_lookup" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  value, event_type FROM events)
        |SELECT event_id,
        | ROUND(last_value(CASE WHEN event_type = 'purchase' THEN value END
        |   IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2)
        |   AS last_purchase
        |FROM e ORDER BY event_id""".stripMargin,
    "q_supplier_nation" ->
      """SELECT n_name,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))*CAST(1-l_discount AS DECIMAL(4,2)))) AS BIGINT) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_priority_years" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
        | o_orderpriority, COUNT(*) AS n_orders,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2)))) AS BIGINT) AS revenue
        |FROM orders GROUP BY 1, 2
        |ORDER BY order_year, o_orderpriority""".stripMargin,
    "q_brand_stats" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        | ROUND(AVG(p_retailprice), 4) AS avg_price,
        | MIN(p_size) AS min_size, MAX(p_size) AS max_size
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_label_stats" ->
      """SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
        | ROUND(AVG(CAST(embedding[1] AS DOUBLE)), 4) AS avg_d0,
        | ROUND(AVG(CAST(embedding[2] AS DOUBLE)), 4) AS avg_d1
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "q_enrich_segments" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        | ROUND(SUM(value), 2) AS sum_value,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_sliding_15m" ->
      """WITH x AS (SELECT event_type, value,
        |  make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 900000000)
        |    * 900000000 - CAST(g.i AS BIGINT) * 900000000) AS ws
        |  FROM events CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i) g)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
        | event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "q_tumbling_1h" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
        |   '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "q_text_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split(lower(text), ' ')) AS word
        |  FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "q_dedup_docs" ->
      """SELECT lang, COUNT(*) AS n_docs, COUNT(DISTINCT text) AS n_distinct
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok, n_chars
        |  FROM documents),
        |u AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(tok)) AS BIGINT) AS n_uniq, n_chars,
        |  CAST(list_sum(list_transform(tok, t -> (length(t) + 3) // 4))
        |    AS BIGINT) AS n_bpe_est FROM t)
        |SELECT doc_id, n_tokens, n_uniq, n_chars, n_bpe_est,
        | ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 4) AS ttr,
        | ROUND(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens, 4)
        |   AS avg_token_len,
        | ROUND((CAST(n_uniq AS DOUBLE) / n_tokens)
        |   * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0), 4) AS quality
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_mix_sources" ->
      """WITH d AS (SELECT doc_id, source,
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |    THEN 2 ELSE 1 END AS w
        |  FROM documents),
        |c AS (SELECT source, w, COUNT(*) AS n_docs FROM d GROUP BY 1, 2),
        |t AS (SELECT SUM(n_docs) AS n_total, SUM(w) AS sum_w FROM c),
        |p AS (SELECT source, n_docs,
        |  (t.n_total * w) // (2 * t.sum_w) AS target_n,
        |  ((t.n_total * w) // (2 * t.sum_w) * 65536) // n_docs AS threshold
        |  FROM c, t),
        |k AS (SELECT d.source, COUNT(*) AS n_kept
        |  FROM d JOIN p ON d.source = p.source
        |  WHERE p.threshold >= 65536
        |    OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
        |       < printf('%04x', CAST(p.threshold AS INT))
        |  GROUP BY 1)
        |SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
        |  CAST(p.target_n AS BIGINT) AS target_n,
        |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
        |FROM p LEFT JOIN k ON p.source = k.source
        |ORDER BY p.source""".stripMargin,
    "q_split_assign" ->
      """SELECT lang,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |    THEN 'train' ELSE 'eval' END AS split,
        |  COUNT(*) AS n_docs
        |FROM documents GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,
    "q_sample_stratified" ->
      """SELECT lang, rk, doc_id FROM (
        |  SELECT lang, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS rk
        |  FROM documents)
        |WHERE rk <= 30 ORDER BY lang, rk""".stripMargin,
    // rep_frac is ROUND(..., 6) on both sides; the gate flag is the
    // integer comparison 10*(n_sh - n_uniq) > n_sh so the 0.1 boundary
    // can never split between engines on float rounding
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, lang,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS tok
        |  FROM documents),
        |r AS (SELECT doc_id, lang,
        |  CAST(GREATEST(len(tok) - 2, 0) AS BIGINT) AS n_sh,
        |  CAST(len(list_distinct(
        |    [array_to_string(tok[i:i+2], ' ') for i in range(1, len(tok)-1)]
        |  )) AS BIGINT) AS n_uniq
        | FROM t)
        |SELECT doc_id, lang, n_sh, n_uniq,
        |  ROUND(1.0 - CAST(n_uniq AS DOUBLE) / n_sh, 6) AS rep_frac,
        |  (n_sh - n_uniq) * 10 > n_sh AS repetitive
        |FROM r WHERE n_sh > 0 ORDER BY doc_id""".stripMargin,
    "q_decontaminate" -> DedupOps.decontaminateOracle,
    "q_dedup_incremental" -> DedupOps.ngramIncrementalOracle,
    "q_dedup_substring" -> DedupOps.substringDupSql,
    "q_max_dup_span" -> DedupOps.maxDupSpanSql,
    "q_funnel" -> Events.funnelOracle,
    // the oracle states the SEMANTICS as the naive full-corpus window
    // cumsum; the Spark side computes the same prefix sum via the
    // two-level bucketed form (no single-partition corpus window)
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |o AS (SELECT doc_id, n_tokens,
        |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS start_off
        |  FROM t WHERE n_tokens > 0)
        |SELECT doc_id, n_tokens, start_off,
        |  start_off // 2048 AS pack_id,
        |  (start_off + n_tokens - 1) // 2048 AS pack_last,
        |  start_off // 2048 <> (start_off + n_tokens - 1) // 2048
        |    AS crosses
        |FROM o ORDER BY doc_id""".stripMargin,
    // exact BECAUSE the corpus vocabulary (31 words) is far below the
    // sketch capacity m=1024 — no Misra-Gries counter is ever evicted, so
    // the summed lower bounds equal the exact counts (see TextOps Scaladoc;
    // the overflow regime is spec-tested instead)
    "q_approx_topk" ->
      """SELECT word, COUNT(*) AS est FROM (
        |  SELECT UNNEST(string_split(lower(text), ' ')) AS word
        |  FROM documents)
        |GROUP BY word ORDER BY est DESC, word LIMIT 20""".stripMargin,
    "q_quality_filter" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok
        |  FROM documents),
        |u AS (SELECT doc_id, lang, CAST(len(tok) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(tok)) AS BIGINT) AS n_uniq,
        |  CAST(list_sum(list_transform(tok, t -> (length(t) + 3) // 4))
        |    AS BIGINT) AS n_bpe_est FROM t),
        |g AS (SELECT lang, n_bpe_est,
        |  (CAST(n_uniq AS DOUBLE) / n_tokens)
        |    * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) AS quality,
        |  ((CAST(n_uniq AS DOUBLE) / n_tokens)
        |    * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0) >= 0.35
        |    AND n_tokens >= 30) AS kept FROM u)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  ROUND(CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 4) AS keep_rate,
        |  ROUND(AVG(CASE WHEN kept THEN quality END), 4)
        |    AS avg_kept_quality,
        |  CAST(SUM(CASE WHEN kept THEN n_bpe_est ELSE 0 END) AS BIGINT)
        |    AS kept_bpe_est
        |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    "q_text_langid" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(tok, x -> x IN ('the','a','of','and','to'))) AS s_en,
        |  len(list_filter(tok, x -> x IN ('el','la','de','y','que'))) AS s_es,
        |  len(list_filter(tok, x -> x IN ('le','les','et','des','une'))) AS s_fr,
        |  len(list_filter(tok, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |  len(list_filter(tok, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS s_zh
        | FROM t),
        |p AS (SELECT doc_id, lang,
        |  CASE
        |   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
        |   WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
        |   WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
        |   WHEN s_de >= s_zh THEN 'de'
        |   ELSE 'zh' END AS pred_lang
        | FROM s)
        |SELECT doc_id, lang, pred_lang, pred_lang = lang AS is_match
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        | md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_vector_knn" ->
      """WITH p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |r AS (SELECT a_id, b_id, sim, ROW_NUMBER() OVER (PARTITION BY a_id
        |  ORDER BY sim DESC, b_id) AS rn FROM p)
        |SELECT a_id, b_id, ROUND(sim, 6) AS sim, rn FROM r
        |WHERE rn <= 5 ORDER BY a_id, rn LIMIT 100""".stripMargin,
    "q_vector_search" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
        |  FROM embeddings ORDER BY vec_id LIMIT 1)
        |SELECT e.vec_id,
        | ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |   CAST(q.q_emb AS DOUBLE[])), 6) AS sim
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> q.q_id
        |ORDER BY sim DESC, e.vec_id LIMIT 20""".stripMargin,
    "q_dedup_embed" ->
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY a_id, b_id""".stripMargin,
    "q_dedup_ngram" -> DedupOps.ngramOracle,
    "q_dedup_clusters" -> DedupOps.clustersOracle,
    "q_dedup_minhash" -> DedupOps.minhashOracle,
    "q_dedup_simhash" -> DedupOps.simhashOracle,
    "q_dedup_simhash_pairs" -> DedupOps.simhashPairsOracle,
    "q_pivot_priority" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_urgent,
        | CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_high,
        | CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_medium,
        | CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
        |   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_notspec,
        | CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
        |   THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS p_low
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_conversion_lag" -> Events.conversionLagOracle,
    "q_dau_mau" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
        |days AS (SELECT DISTINCT day AS d FROM act),
        |dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM act
        |  GROUP BY 1),
        |mau AS (SELECT d, COUNT(DISTINCT user_id) AS mau
        |  FROM act JOIN days ON act.day <= days.d
        |    AND act.day >= days.d - INTERVAL 27 DAY
        |  GROUP BY 1)
        |SELECT strftime(day, '%Y-%m-%d') AS day, dau, mau,
        | ROUND(CAST(dau AS DOUBLE) / mau, 4) AS stickiness
        |FROM dau JOIN mau ON day = d
        |ORDER BY day""".stripMargin,
    "q_cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |  date_trunc('day', CAST(ts AS TIMESTAMP)) AS day FROM events),
        |first AS (SELECT user_id, MIN(day) AS cohort FROM act GROUP BY 1)
        |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
        | CAST(datediff('day', cohort, day) AS BIGINT) AS age_days,
        | COUNT(DISTINCT act.user_id) AS n_users
        |FROM act JOIN first ON act.user_id = first.user_id
        |GROUP BY cohort, day
        |ORDER BY cohort_day, age_days""".stripMargin,
    "q_rolling_7d" ->
      """WITH e AS (SELECT user_id, event_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) AS tus, value FROM events)
        |SELECT user_id, event_id, COUNT(*) OVER w AS n_7d,
        | ROUND(SUM(value) OVER w, 2) AS sum_7d
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "q_order_quartiles" ->
      """WITH spend AS (SELECT c_mktsegment, c_custkey,
        |  SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
        | FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2)
        |SELECT c_mktsegment, c_custkey, CAST(spend AS DOUBLE) AS spend,
        | CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment
        |   ORDER BY spend DESC) AS BIGINT) AS drk,
        | CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
        |   ORDER BY spend DESC, c_custkey) AS BIGINT) AS quartile
        |FROM spend QUALIFY drk <= 20
        |ORDER BY c_mktsegment, drk, c_custkey""".stripMargin,
    "q_skew_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        | ROUND(SUM(value), 2) AS sum_value,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_unpivot_priority" ->
      """SELECT c_mktsegment,
        | CASE o_orderpriority WHEN '1-URGENT' THEN 'p_urgent'
        |  WHEN '2-HIGH' THEN 'p_high' WHEN '3-MEDIUM' THEN 'p_medium'
        |  WHEN '4-NOT SPECIFIED' THEN 'p_notspec' ELSE 'p_low' END
        |  AS priority,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |  AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_cube_returns" ->
      """SELECT CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        | l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS BIGINT) AS sum_qty,
        | COUNT(*) AS n
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        | l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_grouping_sets" ->
      """SELECT CAST(GROUPING(c_mktsegment, o_orderpriority) AS BIGINT)
        |  AS gid,
        | c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |  AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority))
        |ORDER BY gid, c_mktsegment ASC NULLS FIRST,
        | o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        | COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |   AS sum_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_small_qty_revenue" ->
      """WITH f AS (SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#11'),
        |a AS (SELECT l_partkey AS pk, CAST(SUM(l_quantity) AS BIGINT)
        |   AS sum_q, COUNT(*) AS n
        |  FROM f GROUP BY 1)
        |SELECT COUNT(*) AS n_small,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        |   AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM f JOIN a ON l_partkey = pk
        |WHERE CAST(l_quantity AS BIGINT) * 5 * n < sum_q""".stripMargin,
    "q_weekday_orders" ->
      """SELECT CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |  AS revenue
        |FROM orders GROUP BY 1 ORDER BY iso_weekday""".stripMargin,
    "q_label_centroids" ->
      """WITH x AS (SELECT CAST(label AS BIGINT) AS label,
        |  UNNEST(embedding) AS v,
        |  UNNEST(range(len(embedding))) AS dim FROM embeddings)
        |SELECT label, CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
        | ROUND(AVG(CAST(v AS DOUBLE)), 4) AS mean_v
        |FROM x GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "q_stats_moments" ->
      """WITH s AS (SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
        |    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        | ROUND(sqrt((n * sxx - sx * sx) / (n * (n - 1.0))), 2) AS sd_price,
        | ROUND((n * sxx - sx * sx) / (n * (n - 1.0)), 2) AS var_price,
        | ROUND((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx)
        |   * sqrt(n * syy - sy * sy)), 4) AS corr_qty_price,
        | ROUND((n * sxy - sx * sy) / (n * (n - 1.0)), 2) AS cov_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,
    "q_gapfill" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |  event_type, value FROM events),
        |agg AS (SELECT h, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 2) AS sum_value FROM e GROUP BY 1, 2),
        |hours AS (SELECT UNNEST(generate_series((SELECT MIN(h) FROM e),
        |  (SELECT MAX(h) FROM e), INTERVAL 1 HOUR)) AS h),
        |types AS (SELECT DISTINCT event_type FROM e)
        |SELECT strftime(hours.h, '%Y-%m-%d %H:%M:%S') AS hour,
        | types.event_type, COALESCE(agg.n, 0) AS n,
        | COALESCE(agg.sum_value, 0.0) AS sum_value
        |FROM hours CROSS JOIN types
        |LEFT JOIN agg ON agg.h = hours.h AND agg.event_type = types.event_type
        |ORDER BY 1, 2""".stripMargin,
    "q_tfidf" ->
      """WITH toks AS (SELECT doc_id,
        |  UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        |r AS (SELECT doc_id, term, tf, df, n_docs,
        |  ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tf * (CAST(n_docs AS DOUBLE) / df) DESC, term) AS rk
        | FROM tf JOIN df USING (term) CROSS JOIN nd)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df,
        | ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf_log
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_anomaly_hours" ->
      """WITH hourly AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP))
        |   AS h, event_type, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT h, event_type, c,
        |  COUNT(*) OVER win AS n,
        |  CAST(SUM(c) OVER win AS HUGEINT) AS s1,
        |  CAST(SUM(CAST(c AS HUGEINT) * c) OVER win AS HUGEINT) AS s2
        | FROM hourly
        | WINDOW win AS (PARTITION BY event_type ORDER BY h
        |   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, c,
        | n AS n_hist,
        | CASE WHEN n * s2 - s1 * s1 > 0 THEN
        |   ROUND((c - CAST(s1 AS DOUBLE) / n)
        |     / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1))), 4)
        | END AS z,
        | (n * c - s1) > 0 AND
        |   (n * c - s1) * (n * c - s1) * (n - 1) > 9 * n * (n * s2 - s1 * s1)
        |   AS anomaly
        |FROM w WHERE n >= 12 ORDER BY hour, event_type""".stripMargin,
    "q_except" ->
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY o_custkey""".stripMargin,
    "q_fullouter_hours" ->
      """WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |  event_type FROM events),
        |err AS (SELECT h, COUNT(*) AS n_errors FROM e
        |  WHERE event_type = 'error' GROUP BY 1),
        |pur AS (SELECT h, COUNT(*) AS n_purchases FROM e
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT strftime(COALESCE(err.h, pur.h), '%Y-%m-%d %H:%M:%S')
        |   AS hour,
        | n_errors, n_purchases
        |FROM err FULL OUTER JOIN pur ON err.h = pur.h
        |ORDER BY hour""".stripMargin,
    "q_vocab_growth" ->
      """WITH toks AS (SELECT source,
        |  UNNEST(string_split(lower(text), ' ')) AS term FROM documents),
        |pt AS (SELECT source, term, COUNT(*) AS n FROM toks GROUP BY 1, 2),
        |top AS (SELECT source, term AS top_term, n AS top_n FROM pt
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n DESC, term DESC) = 1),
        |stats AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
        |  COUNT(*) AS vocab,
        |  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        | FROM pt GROUP BY 1)
        |SELECT source, n_tokens, vocab, hapax, top_term, top_n,
        | ROUND(CAST(vocab AS DOUBLE) / n_tokens, 6) AS ttr
        |FROM stats JOIN top USING (source)
        |ORDER BY source""".stripMargin,
    "q_event_transitions" ->
      """WITH nxt AS (SELECT event_type,
        |  LEAD(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS next_type
        | FROM events),
        |t AS (SELECT event_type, next_type, COUNT(*) AS n FROM nxt
        | WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        | ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY event_type),
        |   6) AS p
        |FROM t ORDER BY event_type, next_type""".stripMargin,
    "q_order_gaps" ->
      """WITH g AS (SELECT o_custkey,
        |  date_diff('day',
        |    LAG(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey),
        |    CAST(o_orderdate AS DATE)) AS gap_days
        | FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS n_gaps,
        | CAST(SUM(gap_days) AS BIGINT) AS sum_gap_days,
        | CAST(MAX(gap_days) AS BIGINT) AS max_gap_days,
        | ROUND(AVG(gap_days), 4) AS avg_gap_days
        |FROM g JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q_oov_rate" ->
      """WITH toks AS (SELECT lang,
        |  UNNEST(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS word FROM documents),
        |vocab AS (SELECT word, 1 AS in_vocab FROM (
        |  SELECT word, COUNT(*) AS nw FROM toks GROUP BY 1
        |  ORDER BY nw DESC, word LIMIT 25))
        |SELECT lang, COUNT(*) AS n_tokens,
        | CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_oov,
        | ROUND(CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END)
        |     AS DOUBLE) / COUNT(*), 6) AS oov_rate
        |FROM toks LEFT JOIN vocab USING (word)
        |GROUP BY 1 ORDER BY lang""".stripMargin,
    "q_session_stats" ->
      """WITH e AS (SELECT user_id, event_id,
        |   epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
        |g AS (SELECT *, CASE WHEN prev_tus IS NULL
        |   OR tus - prev_tus > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, LAG(tus) OVER (PARTITION BY user_id
        |    ORDER BY tus, event_id) AS prev_tus FROM e)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |   ORDER BY tus, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS session_id FROM g),
        |sess AS (SELECT user_id, session_id, COUNT(*) AS n_events,
        |   CAST(MAX(tus) - MIN(tus) AS BIGINT) AS duration_us
        |  FROM s GROUP BY 1, 2)
        |SELECT n_events, COUNT(*) AS n_sessions,
        | CAST(SUM(duration_us) AS BIGINT) AS sum_duration_us,
        | CAST(MAX(duration_us) AS BIGINT) AS max_duration_us
        |FROM sess GROUP BY 1 ORDER BY n_events""".stripMargin,
    "q_setops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders),
        |b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 300000),
        |ea AS (SELECT o_custkey, COUNT(*) AS n_residual FROM (
        |  SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
        | GROUP BY 1),
        |ia AS (SELECT o_custkey, COUNT(*) AS n_matched FROM (
        |  SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
        | GROUP BY 1)
        |SELECT o_custkey,
        | COALESCE(n_residual, 0) AS n_residual,
        | COALESCE(n_matched, 0) AS n_matched
        |FROM ea FULL OUTER JOIN ia USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,
    "q_decontaminate_embed" ->
      """WITH t AS (SELECT vec_id AS train_id, embedding FROM embeddings
        |  WHERE vec_id % 10 <> 0),
        |v AS (SELECT vec_id AS eval_id, embedding FROM embeddings
        |  WHERE vec_id % 10 = 0),
        |p AS (SELECT train_id,
        |  list_cosine_similarity(CAST(t.embedding AS DOUBLE[]),
        |    CAST(v.embedding AS DOUBLE[])) AS sim
        | FROM t CROSS JOIN v)
        |SELECT train_id, COUNT(*) AS n_eval_hits,
        | ROUND(MAX(sim), 6) AS max_sim
        |FROM p WHERE sim >= 0.35
        |GROUP BY 1 ORDER BY train_id""".stripMargin,
    "q_langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS tok
        |  FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(tok, x -> x IN ('the','a','of','and','to'))) AS s_en,
        |  len(list_filter(tok, x -> x IN ('el','la','de','y','que'))) AS s_es,
        |  len(list_filter(tok, x -> x IN ('le','les','et','des','une'))) AS s_fr,
        |  len(list_filter(tok, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |  len(list_filter(tok, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS s_zh
        | FROM t),
        |p AS (SELECT doc_id, lang,
        |  CASE
        |   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
        |   WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
        |   WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
        |   WHEN s_de >= s_zh THEN 'de'
        |   ELSE 'zh' END AS pred_lang
        | FROM s)
        |SELECT lang, pred_lang, COUNT(*) AS n,
        | ROUND(CAST(COUNT(*) AS DOUBLE)
        |   / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS frac
        |FROM p GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin,
    "q_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey, MAX(CAST(o_orderdate AS DATE))
        |   AS last_d,
        |  COUNT(*) AS frequency,
        |  SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
        | FROM orders GROUP BY 1),
        |a AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS anchor FROM orders)
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        | ROUND(AVG(date_diff('day', last_d, anchor)), 4)
        |   AS avg_recency_days,
        | ROUND(AVG(frequency), 4) AS avg_frequency,
        | CAST(SUM(monetary) AS DOUBLE) AS total_monetary
        |FROM pc CROSS JOIN a JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "q_basket_pairs" ->
      """SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        | COUNT(*) AS n
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 ORDER BY n DESC, part_a, part_b LIMIT 20""".stripMargin,
    // round 11: BM25 retrieval / bigram-LM cross-entropy / k-means /
    // cluster-size profile. Float discipline: per-term contributions are
    // identical IEEE expression trees on exact-integer (or 7-dp-rounded)
    // inputs, rounded to 9 dp and DECIMAL-summed so accumulation order
    // can't split engines; finals rounded with total-order tie-breaks.
    "q_bm25" ->
      """WITH d AS (SELECT doc_id, string_split(lower(text), ' ') AS t
        |  FROM documents),
        |dd AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, t FROM d),
        |c AS (SELECT COUNT(*) AS n_docs,
        |  CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dd),
        |tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, dl, UNNEST(t) AS term FROM dd) x
        |  WHERE term IN ('dup', 'join', 'stream') GROUP BY 1, 2, 3),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id,
        |  CAST(ROUND(
        |    ln(((CAST(n_docs AS DOUBLE) - df + 0.5)
        |        / (CAST(df AS DOUBLE) + 0.5)) + 1.0)
        |    * ((CAST(tf AS DOUBLE) * 2.2)
        |       / (CAST(tf AS DOUBLE)
        |          + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / avgdl))),
        |    9) AS DECIMAL(28,9)) AS contrib
        |  FROM tf JOIN df USING (term) CROSS JOIN c)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
        |  ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS bm25
        |FROM sc GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q_doc_perplexity" -> TextOps.docPerplexityOracle,
    "q_kmeans" -> VectorOps.kmeansOracle,
    "q_cluster_sizes" -> DedupOps.clusterSizesOracle,
    // A-ES weighted sampling: u from md5 (exact integer arithmetic both
    // engines), key = u^(1/w) rounded 9 (pow is ~1 ulp across libms)
    "q_sample_weighted" ->
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |  (CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
        |     AS BIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang, n_chars,
        |  ROUND(pow(u, 1.0 / CAST(n_chars AS DOUBLE)), 9) AS wkey
        |FROM d ORDER BY wkey DESC, doc_id LIMIT 100""".stripMargin,
    // equi-depth curriculum buckets from the exact global rank; the
    // oracle may sort globally — the Spark side ranks via the two-level
    // bucketed prefix sum (bucket assignment is integer arithmetic, so
    // identical cuts)
    "q_curriculum_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
        |  FROM documents),
        |u AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(tok)) AS BIGINT) AS n_uniq FROM t),
        |q AS (SELECT doc_id, n_tokens,
        |  ROUND((CAST(n_uniq AS DOUBLE) / n_tokens)
        |    * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0), 6) AS q6
        |  FROM u),
        |r AS (SELECT doc_id, n_tokens, q6,
        |  CAST(ROW_NUMBER() OVER (ORDER BY q6, doc_id) AS BIGINT) AS rank,
        |  COUNT(*) OVER () AS n_total FROM q)
        |SELECT CAST(((rank - 1) * 10) // n_total + 1 AS BIGINT) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(q6) AS min_quality, MAX(q6) AS max_quality,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,
    // contrastive hard negatives: anchors = vec_id % 50, top-3 most
    // similar vectors with a different label; same raw-sim rank /
    // round-6 presentation discipline as q_vector_knn
    "q_hard_negatives" ->
      """WITH p AS (SELECT a.vec_id AS q_id,
        |  CAST(a.label AS BIGINT) AS q_label, b.vec_id AS neg_id,
        |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings a JOIN embeddings b
        |  ON a.vec_id % 50 = 0 AND b.label <> a.label),
        |r AS (SELECT q_id, q_label, neg_id, sim,
        |  ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY sim DESC, neg_id) AS rn FROM p)
        |SELECT q_id, q_label, neg_id, ROUND(sim, 6) AS sim,
        |  CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin,
    // label-outlier audit: per-label centroid under the q_kmeans DECIMAL
    // mean discipline, 20 least-similar members globally
    "q_embedding_outliers" ->
      """WITH x AS (SELECT label,
        |  UNNEST(CAST(embedding AS DOUBLE[])) AS v,
        |  UNNEST(range(len(embedding))) AS dim FROM embeddings),
        |c AS (SELECT label, dim,
        |  CAST(SUM(CAST(ROUND(v, 7) AS DECIMAL(20,7))) AS DOUBLE)
        |    / COUNT(*) AS m
        |  FROM x GROUP BY 1, 2),
        |cl AS (SELECT label, list(m ORDER BY dim) AS centroid
        |  FROM c GROUP BY label)
        |SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
        |  ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |    cl.centroid), 6) AS sim
        |FROM embeddings e JOIN cl ON e.label = cl.label
        |ORDER BY sim, e.vec_id LIMIT 20""".stripMargin,
    "q_dedup_keep" -> DedupOps.dedupKeepOracle,
    // source-interleaved training order: rank within source by md5,
    // positions round-robin the sources; (stride, source) is a unique
    // total order so the oracle's one global ROW_NUMBER equals the
    // Spark side's two-level prefix-sum rank
    "q_shuffle_order" ->
      """WITH d AS (SELECT doc_id, source,
        |  md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |r AS (SELECT doc_id, source, ROW_NUMBER() OVER (
        |  PARTITION BY source ORDER BY h, doc_id) AS stride FROM d)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY stride, source)
        |    AS BIGINT) AS pos,
        |  doc_id, source
        |FROM r ORDER BY pos""".stripMargin,
    // temperature mixing: per-source w = round(pow(mass, 0.7), 6) is the
    // only libm op; the normalizer is a DECIMAL sum of those rounded
    // values, so both engines divide identical IEEE inputs
    "q_source_temperature" ->
      """WITH ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_docs, n_tokens,
        |  CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.7), 6)
        |    AS DECIMAL(28,6)) AS w6 FROM ps),
        |t AS (SELECT CAST(SUM(w6) AS DOUBLE) AS sum_w,
        |  CAST(SUM(n_tokens) AS DOUBLE) AS tot FROM w)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(CAST(w6 AS DOUBLE) / sum_w, 6) AS p,
        |  ROUND((CAST(w6 AS DOUBLE) / sum_w)
        |    / (CAST(n_tokens AS DOUBLE) / tot), 6) AS boost
        |FROM w CROSS JOIN t ORDER BY source""".stripMargin,
    // budget selection: greedy by (q6 DESC, doc_id) while the running
    // token total fits sum/5 — the oracle's one global cumsum window
    // equals the Spark side's two-level prefix sum (cells partition the
    // q6 axis, so (cell ASC, q6 DESC, doc_id) IS (q6 DESC, doc_id))
    "q_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  string_split(text, ' ') AS tok FROM documents),
        |u AS (SELECT doc_id, source,
        |  CAST(len(tok) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(tok)) AS BIGINT) AS n_uniq FROM t),
        |q AS (SELECT doc_id, source, n_tokens,
        |  ROUND((CAST(n_uniq AS DOUBLE) / n_tokens)
        |    * LEAST(1.0, CAST(n_tokens AS DOUBLE) / 50.0), 6) AS q6
        |  FROM u),
        |b AS (SELECT SUM(n_tokens) // 5 AS budget FROM q),
        |r AS (SELECT doc_id, source, n_tokens, q6,
        |  SUM(n_tokens) OVER (ORDER BY q6 DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM q)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
        |  MIN(q6) AS min_quality
        |FROM r CROSS JOIN b WHERE cum <= budget
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_contamination_sources" -> DedupOps.contaminationSourcesOracle,
    "q_quality_perplexity" -> TextOps.qualityPerplexityOracle,
    "q_sim_histogram" -> DedupOps.simHistogramOracle,
    "q_cross_source_dups" -> DedupOps.crossSourceDupsOracle,
    "q_dup_rate_by_source" -> DedupOps.dupRateBySourceOracle,
    "q_minhash_recall" -> DedupOps.minhashRecallOracle,
    "q_ngram_novelty" -> DedupOps.ngramNoveltyOracle,
    "q_source_containment" -> DedupOps.sourceContainmentOracle,
    "q_boilerplate_prefix" -> TextOps.boilerplatePrefixOracle,
    "q_big_orders" -> Relational.bigOrdersOracle(),
    "q_cheapest_supplier" -> Relational.cheapestSupplierOracle,
    "q_dup_inflation" -> DedupOps.dupInflationOracle,
    "q_blocking_suppliers" -> Relational.blockingSuppliersOracle(),
    "q_shingle_df" -> DedupOps.shingleDfProfileOracle(),
    "q_context_fill" -> TextOps.contextFillOracle(),
    "q_embedding_norms" -> VectorOps.embeddingNormsOracle,
    "q_embed_quantize" -> VectorOps.embedQuantizeOracle,
    "q_quantize_recall" -> VectorOps.quantizeRecallOracle(),
    "q_embed_quantize_clip" -> VectorOps.embedQuantizeClipOracle(),
    "q_quantize_recall_clip" -> VectorOps.quantizeRecallClipOracle(),
    "q_label_dup_rate" -> VectorOps.labelDupRateOracle,
    "q_label_token_yield" -> VectorOps.labelTokenYieldOracle,
    "q_epoch_plan_dedup" -> VectorOps.epochPlanDedupOracle,
    "q_cluster_purity" -> VectorOps.clusterPurityOracle,
    "q_eval_leakage" -> DedupOps.evalLeakageOracle,
    "q_minhash_est" -> DedupOps.minhashEstOracle,
    // entropy: every term is -(p)ln(p) on an exact-integer rational,
    // 9-dp-rounded into a DECIMAL sum (the perplexity float discipline)
    "q_text_entropy" ->
      """WITH t AS (SELECT doc_id,
        |  UNNEST(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS w FROM documents),
        |c AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab FROM c GROUP BY 1)
        |SELECT n.doc_id, n.n_tokens, n.vocab,
        |  ROUND(CAST(SUM(CAST(ROUND(-(CAST(c.c AS DOUBLE) / n.n_tokens)
        |    * ln(CAST(c.c AS DOUBLE) / n.n_tokens), 9) AS DECIMAL(20,9)))
        |    AS DOUBLE), 6) AS entropy
        |FROM c JOIN n USING (doc_id)
        |GROUP BY n.doc_id, n.n_tokens, n.vocab
        |ORDER BY n.doc_id""".stripMargin,
    "q_label_cohesion" -> VectorOps.labelCohesionOracle,
    "q_psi_drift" -> Events.psiDriftOracle,
    // epoch plan: shares are q_source_temperature's round-6 values; the
    // target is floor(p6 * exact-integer total), the 4-epoch cap is
    // integer arithmetic
    "q_epoch_plan" ->
      """WITH ps AS (SELECT source,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n_tokens,
        |  CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.7), 6)
        |    AS DECIMAL(28,6)) AS w6 FROM ps),
        |t AS (SELECT CAST(SUM(w6) AS DOUBLE) AS sum_w,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tot FROM w),
        |plan AS (SELECT source, n_tokens,
        |  ROUND(CAST(w6 AS DOUBLE) / sum_w, 6) AS p,
        |  CAST(FLOOR(ROUND(CAST(w6 AS DOUBLE) / sum_w, 6) * tot)
        |    AS BIGINT) AS target_tokens
        |  FROM w CROSS JOIN t)
        |SELECT source, n_tokens, p, target_tokens,
        |  ROUND(CAST(target_tokens AS DOUBLE) / n_tokens, 4) AS epochs,
        |  (target_tokens > n_tokens * 4) AS capped,
        |  LEAST(target_tokens, n_tokens * 4) AS effective_tokens,
        |  GREATEST(target_tokens - n_tokens * 4, 0) AS shortfall
        |FROM plan ORDER BY source""".stripMargin,
    "q_source_kl" -> TextOps.sourceKlOracle,
    "q_zipf_slope" -> TextOps.zipfSlopeOracle,
    "q_winnow_fingerprints" -> DedupOps.winnowFingerprintsOracle,
    "q_market_share" -> Relational.marketShareOracle,
    "q_nation_trade" -> Relational.nationTradeOracle,
    "q_promo_share" -> Relational.promoShareOracle,
    "q_disjunctive" -> Relational.disjunctiveRevenueOracle,
    "q_cust_balance" -> Relational.custBalanceOracle,
    "q_late_orders" -> Relational.lateOrdersOracle,
    "q_span_corruption" -> TextOps.spanCorruptionOracle,
    "q_unshipped_orders" -> Relational.unshippedOrdersOracle,
    "q_local_volume" -> Relational.localSupplierVolumeOracle,
    "q_revenue_forecast" -> Relational.revenueForecastOracle,
    "q_returned_customers" -> Relational.returnedCustomersOracle,
    "q_activity_gini" -> Events.activityGiniOracle,
    "q_gini_binned" -> Events.activityGiniBinnedOracle,
    "q_audience_overlap" -> Events.audienceOverlapOracle,
    "q_event_paths" -> Events.eventPathsOracle,
    "q_top_value_parts" -> Relational.topValuePartsOracle,
    // per-feed mislabel audit: same stopword CASE chain as the graded
    // langid queries, rolled up by source
    "q_lang_mislabel" ->
      """WITH t AS (SELECT doc_id, lang, source,
        |  string_split(text, ' ') AS tok FROM documents),
        |s AS (SELECT source, lang,
        |  len(list_filter(tok, x -> x IN ('the','a','of','and','to'))) AS s_en,
        |  len(list_filter(tok, x -> x IN ('el','la','de','y','que'))) AS s_es,
        |  len(list_filter(tok, x -> x IN ('le','les','et','des','une'))) AS s_fr,
        |  len(list_filter(tok, x -> x IN ('der','die','und','das','ist'))) AS s_de,
        |  len(list_filter(tok, x -> x IN ('de5','shi4','le5','zai4','he2'))) AS s_zh
        | FROM t),
        |p AS (SELECT source, lang,
        |  CASE
        |   WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
        |   WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
        |   WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
        |   WHEN s_de >= s_zh THEN 'de'
        |   ELSE 'zh' END AS pred_lang
        | FROM s)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | CAST(SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_mislabeled,
        | ROUND(CAST(SUM(CASE WHEN pred_lang <> lang THEN 1 ELSE 0 END)
        |   AS DOUBLE) / COUNT(*), 6) AS mislabel_rate
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // length profile: interpolated quantile_cont on exact integer token
    // counts ≡ Spark percentile at round 4 (the q_percentiles precedent);
    // mean = exact integer sum ÷ count in double
    "q_length_profile" ->
      """WITH t AS (SELECT source,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS n_tokens FROM documents)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        | ROUND(quantile_cont(n_tokens, 0.1), 4) AS p10,
        | ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50,
        | ROUND(quantile_cont(n_tokens, 0.9), 4) AS p90,
        | ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS mean_tokens,
        | CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q_semantic_clusters" -> VectorOps.semanticClustersOracle,
    "q_winnow_pairs" -> DedupOps.winnowPairsOracle,
    "q_cust_order_dist" -> Relational.custOrderDistOracle,
    "q_top_supplier" -> Relational.topSupplierOracle,
  )
}

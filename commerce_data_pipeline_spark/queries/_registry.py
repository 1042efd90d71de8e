"""REGISTRY assembly + driver-window rotation. See tests/test_registry_window.py for the ordering contract.

Mechanical split of queries.py (r10, VERDICT r9 directive #4); statement
text is unchanged — see the package __init__ docstring for the determinism
contract every query follows.
"""
from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from commerce_data_pipeline_spark.catalog import load_table
from commerce_data_pipeline_spark.operators import (
    bloom,
    corpus,
    dedup,
    graph,
    layout as layout_ops,
    linkage,
    multimodal,
    profiling,
    search,
    selection,
    similarity,
    sketches,
    skew,
    temporal,
    text,
)
from commerce_data_pipeline_spark.operators.analytics import (
    attribution,
    funnel,
    position_attribution,
    sessionize,
)
from commerce_data_pipeline_spark.operators.analytics import (
    association_rules as analytics_association_rules,
    sequence_violations as analytics_sequence_violations,
    session_funnel as analytics_session_funnel,
)
from commerce_data_pipeline_spark.streaming import events as streaming_events
from commerce_data_pipeline_spark.queries._shared import QuerySpec
from commerce_data_pipeline_spark.queries.relational import _O_CUBE_SALES, _O_DATE_GAPS, _O_DISTINCT_SHIP_DATES, _O_NATION_TRADE_VOLUME, _O_ORDER_PRIORITY, _O_PRICING_SUMMARY, _O_ROLLUP_SALES, _O_RUNNING_REVENUE, _O_SHIPPING_PRIORITY, _O_SORT_TOPK_LINEITEMS, _O_SUPPLIER_DIVERSITY, _O_TOP_CUSTOMERS, _O_TOP_REVENUE_NATIONS, _O_TRAILING_REVENUE, _O_WORD_COUNT, _q_cube_sales, _q_date_gaps, _q_distinct_ship_dates, _q_nation_trade_volume, _q_order_priority, _q_pricing_summary, _q_rollup_sales, _q_running_revenue, _q_shipping_priority, _q_sort_topk_lineitems, _q_supplier_diversity, _q_top_customers, _q_top_revenue_nations, _q_trailing_revenue, _q_word_count
from commerce_data_pipeline_spark.queries.analytics import _O_ATTRIBUTION_LAST_TOUCH, _O_ATTRIBUTION_POSITION, _O_COHORT_RETENTION, _O_CONVERSION_DAILY, _O_FUNNEL, _O_JOURNEY_TRANSITIONS, _O_PARAM_EXTRACT, _O_PRICE_PERCENTILES, _O_PROPS_STRUCT, _O_SESSIONIZATION, _O_SESSION_WINDOWS, _O_STREAMING_DAILY_COUNTS, _O_TIME_TO_CONVERT, _q_attribution_last_touch, _q_attribution_position, _q_cohort_retention, _q_conversion_daily, _q_funnel, _q_journey_transitions, _q_param_extract, _q_price_percentiles, _q_props_struct, _q_session_windows, _q_sessionization, _q_streaming_daily_counts, _q_time_to_convert
from commerce_data_pipeline_spark.queries.dedup_text import _O_ABOVE_BRAND_AVG_PARTS, _O_ALSO_BOUGHT, _O_APPROX_STATS, _O_ASOF_VIEW_BEFORE_PURCHASE, _O_ASSOCIATION_RULES, _O_BAND_PAIRS, _O_BPE_FIRST_MERGE, _O_BURST_WINDOW_EVENTS, _O_DEDUP_EXACT, _O_EMBEDDING_NEAR_DUP, _O_EVENT_TYPE_PIVOT, _O_FD_CHECK, _O_JACCARD_TOPK, _O_NGRAM_NOVELTY, _O_PART_TRIANGLES, _O_PRICE_HISTOGRAM, _O_PRICIEST_ITEM_PER_ORDER, _O_SEQUENCE_VIOLATIONS, _O_SESSION_FUNNEL, _O_SETOPS, _O_SIMILARITY_TOPK, _O_SKETCH_ACCURACY, _O_SLIDING_COUNTS, _O_SNAPSHOT_DIFF, _O_TEXT_FINGERPRINTS, _O_TEXT_PROFILE, _O_TEXT_STATS, _O_WINSORIZED_REVENUE, _ora_dedup_clusters, _ora_dup_source_matrix, _ora_lsh_pairs, _ora_minhash, _ora_part_communities, _ora_simhash_md5, _q_above_brand_avg_parts, _q_also_bought, _q_approx_stats, _q_asof_view_before_purchase, _q_association_rules, _q_band_pairs, _q_bm25_indexed, _q_bpe_first_merge, _q_burst_window_events, _q_customer_segments_setops, _q_dedup_clusters, _q_dedup_clusters_alt, _q_dedup_exact, _q_dup_source_matrix, _q_embedding_near_dup, _q_event_type_pivot, _q_fd_check, _q_jaccard_topk, _q_lsh_dedup_pairs, _q_minhash_signature, _q_ngram_novelty, _q_part_communities, _q_part_triangles, _q_price_histogram, _q_priciest_item_per_order, _q_sequence_violations, _q_session_funnel, _q_simhash, _q_simhash_md5, _q_similarity_topk, _q_sketch_accuracy, _q_sliding_counts, _q_snapshot_diff, _q_text_fingerprints, _q_text_profile, _q_text_stats, _q_winsorized_revenue
from commerce_data_pipeline_spark.queries.similarity import _O_ANN_IVF, _O_ANN_IVF_UPSERT, _q_ann_ivf_upsert, _O_ANN_PQ, _O_ANN_RECALL, _O_AUDIO_WINDOWS, _O_CLUSTER_SAMPLE, _O_FRAME_SAMPLE, _O_IVF_PROFILE, _O_K_ANONYMITY, _O_MULTIMODAL_META, _ora_ann_lsh, _ora_ann_lsh_md5, _ora_canonical_docs, _q_ann_ivf, _q_ann_ivf_indexed, _q_ann_lsh, _q_ann_lsh_md5, _q_ann_pq, _q_ann_recall, _q_audio_windows, _q_canonical_docs, _q_cluster_sample, _q_frame_sample, _q_ivf_profile, _q_k_anonymity, _q_media_features, _q_multimodal_meta
from commerce_data_pipeline_spark.queries.relational_wide import _O_DISJUNCTIVE_FILTER, _O_EMBEDDING_QUANTIZE, _O_FORECAST_REVENUE_CHANGE, _O_IDLE_RICH_CUSTOMERS, _O_IMPORTANT_PARTS, _O_LARGE_ORDERS, _O_MARKET_SHARE, _O_MIN_COST_SUPPLIER, _O_ORDER_COUNT_DISTRIBUTION, _O_PRODUCT_PROFIT, _O_PROMO_REVENUE, _O_RETURNED_ITEMS, _O_RFM_SEGMENTS, _O_SMALL_QUANTITY_REVENUE, _O_TOP_SUPPLIER, _q_disjunctive_filter, _q_embedding_quantize, _q_forecast_revenue_change, _q_idle_rich_customers, _q_important_parts, _q_large_orders, _q_market_share, _q_min_cost_supplier, _q_order_count_distribution, _q_product_profit, _q_promo_revenue, _q_returned_items, _q_rfm_segments, _q_small_quantity_revenue, _q_top_supplier
from commerce_data_pipeline_spark.queries.corpus import _O_BIGRAM_LM, _O_BLOOM_DECONTAMINATE, _O_BM25_SEARCH, _O_CONTAMINATION, _O_CORPUS_SPLIT, _O_DECAYED_REVENUE, _O_DSIR_SELECT, _O_FIXED_SIZE_SAMPLE, _O_HARD_NEGATIVES, _O_JOIN_PROFILE, _O_MMR_RERANK, _O_PRICE_OUTLIERS, _O_QUALITY_CALIBRATE, _O_QUALITY_CLASSIFIER, _O_RESAMPLE_FFILL, _O_SALTED_HOT_JOIN, _O_SCD2_INTERVALS, _O_SCD2_LOOKUP, _O_STRATIFIED_SAMPLE, _O_TABLE_PROFILE, _O_TEMPERATURE_MIX, _O_WEIGHTED_SAMPLE, _q_bigram_lm, _q_bloom_decontaminate, _q_bm25_search, _q_contamination, _q_corpus_split, _q_decayed_revenue, _q_dsir_select, _q_fixed_size_sample, _q_hard_negatives, _q_join_profile, _q_mmr_rerank, _q_price_outliers, _q_quality_calibrate, _q_quality_classifier, _q_resample_ffill, _q_salted_hot_join, _q_scd2_intervals, _q_scd2_lookup, _q_stratified_sample, _q_table_profile, _q_temperature_mix, _q_weighted_sample
from commerce_data_pipeline_spark.queries.graph_search import _O_APPROX_GROUP_STATS, _O_BASKET_PAIRS, _O_CHUNK_PACK, _O_CORPUS_INGEST, _O_CORPUS_MIX, _O_DAILY_ANOMALIES, _O_DUP_NGRAM_SPANS, _O_EPOCH_SHUFFLE, _O_FUZZY_NAME_PAIRS, _O_GREEDY_PACK, _O_HEAVY_HITTERS, _O_HYBRID_SEARCH_RRF, _O_IMAGE_DUP_CLUSTERS, _O_IMAGE_NEAR_DUP_MD5, _O_IMAGE_PHASH_MD5, _O_LM_QUALITY, _O_MEDIA_FEATURES_MD5, _O_OVERLAP_CHUNKS, _O_PART_PAGERANK, _O_PII_REDACT, _O_SEMANTIC_DEDUP, _O_SEMANTIC_ONLY_DUPS, _O_TEXT_REPETITION, _O_TFIDF_KEYWORDS, _O_TOKEN_BUDGET, _O_WINNOW, _O_WINNOW_PAIRS, _q_approx_group_stats, _q_basket_pairs, _q_chunk_pack, _q_corpus_ingest, _q_corpus_mix, _q_daily_anomalies, _q_dup_ngram_spans, _q_epoch_shuffle, _q_fuzzy_name_pairs, _q_greedy_pack, _q_heavy_hitters, _q_hybrid_search_rrf, _q_image_dup_clusters, _q_image_near_dup, _q_image_near_dup_md5, _q_image_phash, _q_image_phash_md5, _q_lm_quality, _q_media_features_md5, _q_overlap_chunks, _q_part_pagerank, _q_pii_redact, _q_semantic_dedup, _q_semantic_only_dups, _q_text_repetition, _q_tfidf_keywords, _q_token_budget, _q_winnow, _q_winnow_pairs
from commerce_data_pipeline_spark.queries.profiling_ml import _CORR_PAIRS, _NDCG_QUERIES, _O_CENTROID_SIM, _O_CUSTOMER_VALUE_DECILES, _O_EVENT_TYPE_DRIFT, _O_KMEANS_STEP, _O_PART_COMPONENTS, _O_QUANTILE_GROUPS, _O_REVENUE_BANDS, _O_SIMILAR_PARTS_JACCARD, _O_SKETCH_UNION, _O_SPLIT_LEAKAGE, _O_WAITING_SUPPLIERS, _ora_benford, _ora_bpe_train, _ora_bpe_train_batched, _q_bpe_train_batched, _ora_kmeans_train, _ora_ndcg_eval, _ora_numeric_corr, _ora_part_kcore, _ora_part_walks, _ora_referential_integrity, _ora_zorder_skipping, _q_benford_prices, _q_bpe_train, _q_centroid_sim, _q_customer_value_deciles, _q_event_type_drift, _q_kmeans_step, _q_kmeans_train, _q_ndcg_eval, _q_numeric_corr, _q_part_components, _q_part_kcore, _q_part_walks, _q_quantile_groups, _q_referential_integrity, _q_revenue_bands, _q_similar_parts_jaccard, _q_sketch_union, _q_split_leakage, _q_waiting_suppliers, _q_zorder_skipping
from commerce_data_pipeline_spark.queries.selection_linkage import _O_BEST_MATCH_PAIRS, _O_BLOOM_FPR, _O_CALIBRATION_BINS, _O_CONTAINMENT_TOPK, _O_DEGREE_HISTOGRAM, _O_EMBEDDING_OUTLIERS, _O_HELDOUT_PERPLEXITY, _O_LANG_ID_AGREEMENT, _O_MULTI_PASS_NAME_PAIRS, _O_RANKING_AUC, _O_RANKING_AUC_BANDED, _O_SNM_NAME_PAIRS, _ora_bpe_compression, _ora_dup_cluster_histogram, _ora_lsh_cost_plan, _ora_pca_power, _ora_seed_expansion, _q_best_match_pairs, _q_bloom_fpr, _q_bpe_compression, _q_calibration_bins, _q_containment_topk, _q_degree_histogram, _q_dup_cluster_histogram, _q_embedding_outliers, _q_heldout_perplexity, _q_lang_id_agreement, _q_lsh_cost_plan, _q_multi_pass_name_pairs, _q_pca_power, _q_ranking_auc, _q_ranking_auc_banded, _q_seed_expansion, _q_snm_name_pairs



REGISTRY: dict[str, QuerySpec] = {
    # -- checked window: training-data ops (SURVEY §2d) -----------------------
    "dedup_exact": QuerySpec(_q_dedup_exact, _O_DEDUP_EXACT, "X1 exact dedup"),
    "minhash_signature": QuerySpec(_q_minhash_signature, _ora_minhash(8, 3), "X2 MinHash signatures"),
    "bm25_search": QuerySpec(_q_bm25_search, _O_BM25_SEARCH, "X7 search: BM25 keyword top-k retrieval"),
    "tfidf_keywords": QuerySpec(_q_tfidf_keywords, _O_TFIDF_KEYWORDS, "X7 search: per-source TF-IDF keyword extraction"),
    "quality_classifier": QuerySpec(_q_quality_classifier, _O_QUALITY_CLASSIFIER, "X11 selection: hashed-linear quality-classifier margins"),
    "dsir_select": QuerySpec(_q_dsir_select, _O_DSIR_SELECT, "X11 selection: DSIR importance resampling (top-200 target-like docs)"),
    "simhash_md5": QuerySpec(_q_simhash_md5, _ora_simhash_md5(32), "X2 SimHash, md5-derived (oracle-checked)"),
    "similarity_topk": QuerySpec(_q_similarity_topk, _O_SIMILARITY_TOPK, "X3 brute-force cosine top-k"),
    "embedding_near_dup": QuerySpec(_q_embedding_near_dup, _O_EMBEDDING_NEAR_DUP, "X2 embedding near-dup pairs"),
    "lsh_dedup_pairs": QuerySpec(_q_lsh_dedup_pairs, _ora_lsh_pairs(16, 4, 3), "X2 MinHash+LSH banded pairs"),
    "dedup_clusters": QuerySpec(_q_dedup_clusters, _ora_dedup_clusters(16, 4, 3), "X2 connected-components clustering (default: alternating large/small-star)"),
    "ann_ivf": QuerySpec(_q_ann_ivf, _O_ANN_IVF, "X3 IVF-routed ANN top-k"),
    "ann_lsh_md5": QuerySpec(_q_ann_lsh_md5, _ora_ann_lsh_md5(), "X3 RP-LSH ANN, md5-derived planes (oracle-checked)"),
    "ann_pq": QuerySpec(_q_ann_pq, _O_ANN_PQ, "X3 product-quantization ANN (ADC, deterministic codebooks)"),
    # -- checked window: sketches (X6) ----------------------------------------
    "sketch_accuracy": QuerySpec(_q_sketch_accuracy, _O_SKETCH_ACCURACY, "X6 sketch-vs-exact accuracy contract (HLL++ / GK quantile, falsifiable booleans)"),
    "heavy_hitters": QuerySpec(_q_heavy_hitters, _O_HEAVY_HITTERS, "X6 exact heavy hitters via Misra-Gries candidates + exact verify"),
    # -- checked window: record linkage ---------------------------------------
    "fuzzy_name_pairs": QuerySpec(_q_fuzzy_name_pairs, _O_FUZZY_NAME_PAIRS, "linkage: blocked Levenshtein fuzzy matching (dist histogram)"),
    # -- checked window: text analysis (X4) -----------------------------------
    "text_profile": QuerySpec(_q_text_profile, _O_TEXT_PROFILE, "X4 lang-ID + quality scoring"),
    "text_repetition": QuerySpec(_q_text_repetition, _O_TEXT_REPETITION, "corpus: C4/Gopher repetition quality signals"),
    "lm_quality": QuerySpec(_q_lm_quality, _O_LM_QUALITY, "X4/corpus: unigram-LM typicality + OOV scoring (perplexity proxy)"),
    "winnow": QuerySpec(_q_winnow, _O_WINNOW, "X4 winnowing (MOSS) k-gram fingerprint sets"),
    "dup_ngram_spans": QuerySpec(_q_dup_ngram_spans, _O_DUP_NGRAM_SPANS, "X4×X1 repeated n-gram spans (exact-substring dedup, Lee et al. shape)"),
    # -- checked window: corpus shaping (LLM training-data pipeline) ----------
    "stratified_sample": QuerySpec(_q_stratified_sample, _O_STRATIFIED_SAMPLE, "corpus: deterministic per-stratum hash sampling"),
    "corpus_split": QuerySpec(_q_corpus_split, _O_CORPUS_SPLIT, "corpus: deterministic train/val/test split summary"),
    "contamination": QuerySpec(_q_contamination, _O_CONTAMINATION, "corpus: benchmark n-gram contamination scan"),
    "corpus_mix": QuerySpec(_q_corpus_mix, _O_CORPUS_MIX, "corpus: quality-quota mixing (top-k per group)"),
    "chunk_pack": QuerySpec(_q_chunk_pack, _O_CHUNK_PACK, "corpus: concat-then-chunk sequence packing"),
    "greedy_pack": QuerySpec(_q_greedy_pack, _O_GREEDY_PACK, "corpus: greedy bin packing (recursive-CTE oracle)"),
    "pii_redact": QuerySpec(_q_pii_redact, _O_PII_REDACT, "corpus: email/phone redaction audit"),
    "bloom_decontaminate": QuerySpec(_q_bloom_decontaminate, _O_BLOOM_DECONTAMINATE, "X8 corpus: Bloom-filter decontamination (broadcast bitmap, scan-side membership)"),
    "temperature_mix": QuerySpec(_q_temperature_mix, _O_TEMPERATURE_MIX, "X10 corpus: temperature-based source mixing (integer-exact keep rates)"),
    "token_budget": QuerySpec(_q_token_budget, _O_TOKEN_BUDGET, "corpus: token-budget mix selection (N tokens per group)"),
    "resample_ffill": QuerySpec(_q_resample_ffill, _O_RESAMPLE_FFILL, "X9 temporal: hourly resample + forward fill (dense per-key series)"),
    "cluster_sample": QuerySpec(_q_cluster_sample, _O_CLUSTER_SAMPLE, "corpus×X3: cluster-balanced sampling (k per embedding cluster)"),
    # -- checked window: multimodal (X5) + sketches (X6) ----------------------
    "multimodal_meta": QuerySpec(_q_multimodal_meta, _O_MULTIMODAL_META, "X5 media metadata/digest projection"),
    "frame_sample": QuerySpec(_q_frame_sample, _O_FRAME_SAMPLE, "X5 video frame sampling"),
    "image_phash_md5": QuerySpec(_q_image_phash_md5, _O_IMAGE_PHASH_MD5, "X5×X2 pHash, binarized-DCT integer twin (oracle-checked)"),
    "image_near_dup_md5": QuerySpec(_q_image_near_dup_md5, _O_IMAGE_NEAR_DUP_MD5, "X5×X2 pHash hamming near-dup pairs (oracle-checked)"),
    # -- checked window: one representative per relational/pipeline/gold row --
    "pricing_summary": QuerySpec(_q_pricing_summary, _O_PRICING_SUMMARY, "R2/R4/R7 agg sweep (Q1 shape)"),
    "top_revenue_nations": QuerySpec(_q_top_revenue_nations, _O_TOP_REVENUE_NATIONS, "5-way broadcast star join (Q5 shape)"),
    "distinct_ship_dates": QuerySpec(_q_distinct_ship_dates, _O_DISTINCT_SHIP_DATES, "P4/P5 date discovery"),
    "date_gaps": QuerySpec(_q_date_gaps, _O_DATE_GAPS, "P6 anti-join gap detection"),
    "funnel": QuerySpec(_q_funnel, _O_FUNNEL, "G1 ordered funnel (flagship)"),
    "sessionization": QuerySpec(_q_sessionization, _O_SESSIONIZATION, "G2 gap sessionization"),
    "conversion_daily": QuerySpec(_q_conversion_daily, _O_CONVERSION_DAILY, "G3 conversion metrics"),
    "attribution_last_touch": QuerySpec(_q_attribution_last_touch, _O_ATTRIBUTION_LAST_TOUCH, "G4 last-touch attribution"),
    "cohort_retention": QuerySpec(_q_cohort_retention, _O_COHORT_RETENTION, "G5 weekly cohorts"),
    "param_extract": QuerySpec(_q_param_extract, _O_PARAM_EXTRACT, "G6 JSON param extraction"),
    "streaming_daily_counts": QuerySpec(_q_streaming_daily_counts, _O_STREAMING_DAILY_COUNTS, "streaming tumbling-window agg (batch parity)"),
    # r5d: the X12 graph family's proof rotates INTO the window; text_stats
    # rotates out (X4 keeps text_profile/text_repetition/lm_quality/winnow/
    # dup_ngram_spans in-window; text_stats stays oracle-green in self-check)
    "part_pagerank": QuerySpec(_q_part_pagerank, _O_PART_PAGERANK, "X12 graph: weighted PageRank over the co-purchase graph (integer-exact power iteration)"),
    # -- past the 50-entry window: r5 rotation — these stay oracle-green
    # in the full self-check; their families keep other in-window proofs
    # (minhash/lsh/dedup_clusters for X2-lexical, embedding_near_dup for
    # X2-embedding, chunk_pack/greedy_pack for packing, corpus_stream pytest
    # for ingestion; r5c: embedding_quantize/ann_recall/winnow_pairs rotated
    # here — X3 keeps ann_ivf/ann_lsh_md5/ann_pq/similarity_topk in-window,
    # winnowing keeps winnow — to make room for the selection-family proofs
    # (quality_classifier, dsir_select) and tfidf_keywords -------------------
    "embedding_quantize": QuerySpec(_q_embedding_quantize, _O_EMBEDDING_QUANTIZE, "X3 int8 scalar quantization profile (rotated past 50 in r5c, oracle unchanged)"),
    "ann_recall": QuerySpec(_q_ann_recall, _O_ANN_RECALL, "X3 measured recall@5 of IVF vs brute force (rotated past 50 in r5c, oracle unchanged)"),
    "winnow_pairs": QuerySpec(_q_winnow_pairs, _O_WINNOW_PAIRS, "X4×X2 winnow-fingerprint near-dup candidate pairs (rotated past 50 in r5c, oracle unchanged)"),
    "jaccard_topk": QuerySpec(_q_jaccard_topk, _O_JACCARD_TOPK, "X2 exact n-gram Jaccard top-k"),
    "corpus_ingest": QuerySpec(_q_corpus_ingest, _O_CORPUS_INGEST, "corpus: end-to-end enrich+gate+dedup pipeline (stream twin)"),
    "semantic_only_dups": QuerySpec(_q_semantic_only_dups, _O_SEMANTIC_ONLY_DUPS, "corpus: embedding near-dups missed by lexical LSH"),
    "overlap_chunks": QuerySpec(_q_overlap_chunks, _O_OVERLAP_CHUNKS, "corpus: sliding-window chunk spans with overlap"),
    "scd2_intervals": QuerySpec(_q_scd2_intervals, _O_SCD2_INTERVALS, "temporal: SCD type-2 validity intervals (gaps-and-islands)"),
    "scd2_lookup": QuerySpec(_q_scd2_lookup, _O_SCD2_LOOKUP, "temporal: point-in-time SCD2 dimension lookup (as-of merge, no range join)"),
    "mmr_rerank": QuerySpec(_q_mmr_rerank, _O_MMR_RERANK, "X11 selection: MMR diversity rerank (integer-exact greedy, recursive-CTE oracle)"),
    "hybrid_search_rrf": QuerySpec(_q_hybrid_search_rrf, _O_HYBRID_SEARCH_RRF, "X7 search: hybrid BM25 + semantic retrieval fused by reciprocal-rank fusion"),
    "semantic_dedup": QuerySpec(_q_semantic_dedup, _O_SEMANTIC_DEDUP, "X2 embedding dedup: SemDeDup cluster-then-prune (bounded clusters, keep/drop verdicts)"),
    "text_stats": QuerySpec(_q_text_stats, _O_TEXT_STATS, "X4 corpus token stats (rotated past 50 in r5d for the part_pagerank proof, oracle unchanged)"),
    "bigram_lm": QuerySpec(_q_bigram_lm, _O_BIGRAM_LM, "X4 CCNet-style interpolated bigram-LM perplexity scoring"),
    "hard_negatives": QuerySpec(_q_hard_negatives, _O_HARD_NEGATIVES, "X3/X11 banded hard-negative mining for contrastive training"),
    "table_profile": QuerySpec(_q_table_profile, _O_TABLE_PROFILE, "P-family data-quality profile: one-pass per-column nulls/distincts/ranges"),
    "dup_source_matrix": QuerySpec(_q_dup_source_matrix, _ora_dup_source_matrix(), "X2 audit: cross-source duplication matrix over LSH candidate pairs"),
    "weighted_sample": QuerySpec(_q_weighted_sample, _O_WEIGHTED_SAMPLE, "corpus: Efraimidis-Spirakis weighted sampling without replacement"),
    "quality_calibrate": QuerySpec(_q_quality_calibrate, _O_QUALITY_CALIBRATE, "X11 selection: per-source percentile calibration of quality scores"),
    "price_outliers": QuerySpec(_q_price_outliers, _O_PRICE_OUTLIERS, "P-family anomaly detection: MAD/Hampel outliers per priority group"),
    "join_profile": QuerySpec(_q_join_profile, _O_JOIN_PROFILE, "P-family pre-join audit: key overlap, orphans, skew, exact output cardinality"),
    "salted_hot_join": QuerySpec(_q_salted_hot_join, _O_SALTED_HOT_JOIN, "P skew mitigation: hot-key join routed through guarded_join's salted path (16 sub-keys)"),
    "decayed_revenue": QuerySpec(_q_decayed_revenue, _O_DECAYED_REVENUE, "temporal: recency-weighted customer value (pinned-anchor exponential decay)"),
    # -- r6 additions (past the window; rotate in next round) ---------------
    "attribution_position": QuerySpec(_q_attribution_position, _O_ATTRIBUTION_POSITION, "G4 position-based (U-shaped) multi-touch attribution, integer-bp credit"),
    "canonical_docs": QuerySpec(_q_canonical_docs, _ora_canonical_docs(), "X2×X11 canonical-record selection per dedup cluster (best quality, min-id ties)"),
    "image_dup_clusters": QuerySpec(_q_image_dup_clusters, _O_IMAGE_DUP_CLUSTERS, "X5×X2 image near-dup clusters (pHash pairs → connected components)"),
    "k_anonymity": QuerySpec(_q_k_anonymity, _O_K_ANONYMITY, "P privacy audit: k-anonymity equivalence classes under k over quasi-identifiers"),
    "fd_check": QuerySpec(_q_fd_check, _O_FD_CHECK, "P data-quality: functional-dependency audit (4 FDs, violation class/row counts)"),
    "bpe_first_merge": QuerySpec(_q_bpe_first_merge, _O_BPE_FIRST_MERGE, "X4 tokenizer: first BPE merge pair frequencies (top-20)"),
    "ngram_novelty": QuerySpec(_q_ngram_novelty, _O_NGRAM_NOVELTY, "X4×X1 per-doc n-gram novelty vs earlier corpus (first-occurrence fractions)"),
    "winsorized_revenue": QuerySpec(_q_winsorized_revenue, _O_WINSORIZED_REVENUE, "P robust stats: per-group winsorized sums with exact disc-percentile bounds"),
    "sliding_counts": QuerySpec(_q_sliding_counts, _O_SLIDING_COUNTS, "G streaming twin: 1h/30min sliding-window event+user counts"),
    "part_communities": QuerySpec(_q_part_communities, _ora_part_communities(), "X12 graph: deterministic synchronous label propagation (3 rounds, weighted majority)"),
    "part_triangles": QuerySpec(_q_part_triangles, _O_PART_TRIANGLES, "X12 graph: triangle census + global clustering coefficient (thresholded co-purchase graph)"),
    "bm25_indexed": QuerySpec(_q_bm25_indexed, _O_BM25_SEARCH, "X7 BM25 from the persisted inverted text index (same oracle as bm25_search)"),
    "also_bought": QuerySpec(_q_also_bought, _O_ALSO_BOUGHT, "X12/commerce: top-3 co-purchase recommendations per item"),
    "price_histogram": QuerySpec(_q_price_histogram, _O_PRICE_HISTOGRAM, "P profiling: per-group equi-width value histogram"),
    "burst_window_events": QuerySpec(_q_burst_window_events, _O_BURST_WINDOW_EVENTS, "temporal: bucketed interval join of events into burst windows"),
    "sequence_violations": QuerySpec(_q_sequence_violations, _O_SEQUENCE_VIOLATIONS, "G/P audit: per-user event-order state-machine violations"),
    "session_funnel": QuerySpec(_q_session_funnel, _O_SESSION_FUNNEL, "G1×G2: in-session ordered funnel (view→click→purchase within 30min sessions)"),
    "association_rules": QuerySpec(_q_association_rules, _O_ASSOCIATION_RULES, "X12/commerce: association rules with e6-floored confidence and lift"),
    "snapshot_diff": QuerySpec(_q_snapshot_diff, _O_SNAPSHOT_DIFF, "P CDC audit: added/removed/changed/unchanged between two keyed snapshots"),
    # ======== position 51+ : surplus shapes (oracle-green in r02/r04 self-
    # check) and no-oracle fast-path twins of in-window oracle-checked queries =
    "ivf_profile": QuerySpec(_q_ivf_profile, _O_IVF_PROFILE, "X3 IVF index health/drift profile (per-centroid; rotated past 50 in r5 for the new-family proofs, oracle unchanged)"),
    "text_fingerprints": QuerySpec(_q_text_fingerprints, _O_TEXT_FINGERPRINTS, "X4 fingerprint + token counts (rotated past 50 in r5, oracle unchanged)"),
    "fixed_size_sample": QuerySpec(_q_fixed_size_sample, _O_FIXED_SIZE_SAMPLE, "corpus: exactly-k-per-stratum bottom-k-hash sample (rotated past 50 in r5, oracle unchanged)"),
    "session_windows": QuerySpec(_q_session_windows, _O_SESSION_WINDOWS, "streaming session_window (batch parity)"),
    "ann_ivf_indexed": QuerySpec(_q_ann_ivf_indexed, _O_ANN_IVF, "X3 ANN from persisted IVF index (same oracle as in-window ann_ivf)"),
    "ann_ivf_upsert": QuerySpec(_q_ann_ivf_upsert, _O_ANN_IVF_UPSERT, "X3 index maintenance: IVF search after build->upsert(replace)->compact->delete; oracle replays the final visible state"),
    "audio_windows": QuerySpec(_q_audio_windows, _O_AUDIO_WINDOWS, "X5 overlapping audio windows (same sequence+explode shape as in-window frame_sample)"),
    "sort_topk_lineitems": QuerySpec(_q_sort_topk_lineitems, _O_SORT_TOPK_LINEITEMS, "R5 global sort / top-k with rank"),
    "dedup_clusters_alt": QuerySpec(_q_dedup_clusters_alt, _ora_dedup_clusters(16, 4, 3), "X2 clustering via explicit min-label-propagation option"),
    "simhash": QuerySpec(_q_simhash, None, "X2 SimHash (rows-only: xxhash64 fast path; oracle twin simhash_md5 in window)"),
    "ann_lsh": QuerySpec(_q_ann_lsh, _ora_ann_lsh(), "X3 RP-LSH ANN top-k, Gaussian planes (r6: promoted to a full oracle via inlined DOUBLE plane literals)"),
    "image_phash": QuerySpec(_q_image_phash, None, "X5 perceptual hashes (rows-only: stub pixels)"),
    "image_near_dup": QuerySpec(_q_image_near_dup, None, "X5 pHash hamming-bucket near-dup (rows-only)"),
    "media_features": QuerySpec(_q_media_features, None, "X5 feature extraction (rows-only: float digest stub; oracle twin media_features_md5)"),
    "media_features_md5": QuerySpec(_q_media_features_md5, _O_MEDIA_FEATURES_MD5, "X5 feature extraction, integer digest-byte twin (oracle-checked)"),
    "epoch_shuffle": QuerySpec(_q_epoch_shuffle, _O_EPOCH_SHUFFLE, "corpus: deterministic epoch-wise global shuffle (training-data ordering)"),
    "approx_stats": QuerySpec(_q_approx_stats, _O_APPROX_STATS, "X6 sketches: q50/q95/q99 + HLL accuracy contract (r6: promoted from rows-only)"),
    "approx_group_stats": QuerySpec(_q_approx_group_stats, _O_APPROX_GROUP_STATS, "X6 per-group sketches: per-lang accuracy contract (r6: promoted from rows-only)"),
    "word_count": QuerySpec(_q_word_count, _O_WORD_COUNT, "explode/unnest + agg + top-k"),
    "order_priority": QuerySpec(_q_order_priority, _O_ORDER_PRIORITY, "EXISTS semi-join (Q4 shape)"),
    "top_customers": QuerySpec(_q_top_customers, _O_TOP_CUSTOMERS, "join+agg+top-k"),
    "shipping_priority": QuerySpec(_q_shipping_priority, _O_SHIPPING_PRIORITY, "two-side filtered join (Q3 shape)"),
    "supplier_diversity": QuerySpec(_q_supplier_diversity, _O_SUPPLIER_DIVERSITY, "NOT-IN anti-join + distinct count (Q16 shape)"),
    "nation_trade_volume": QuerySpec(_q_nation_trade_volume, _O_NATION_TRADE_VOLUME, "double-dimension snowflake (Q7 shape)"),
    "rollup_sales": QuerySpec(_q_rollup_sales, _O_ROLLUP_SALES, "grouping sets (ROLLUP)"),
    "cube_sales": QuerySpec(_q_cube_sales, _O_CUBE_SALES, "grouping sets (CUBE)"),
    "running_revenue": QuerySpec(_q_running_revenue, _O_RUNNING_REVENUE, "window cumulative frame"),
    "trailing_revenue": QuerySpec(_q_trailing_revenue, _O_TRAILING_REVENUE, "window RANGE frame (30-day trailing)"),
    "above_brand_avg_parts": QuerySpec(_q_above_brand_avg_parts, _O_ABOVE_BRAND_AVG_PARTS, "correlated scalar subquery (SQL surface)"),
    "priciest_item_per_order": QuerySpec(_q_priciest_item_per_order, _O_PRICIEST_ITEM_PER_ORDER, "argmax aggregates (max_by/min_by)"),
    "customer_segments_setops": QuerySpec(_q_customer_segments_setops, _O_SETOPS, "§2e UNION/INTERSECT/EXCEPT"),
    "event_type_pivot": QuerySpec(_q_event_type_pivot, _O_EVENT_TYPE_PIVOT, "§2e pivot (explicit values)"),
    "asof_view_before_purchase": QuerySpec(_q_asof_view_before_purchase, _O_ASOF_VIEW_BEFORE_PURCHASE, "as-of join (union+window)"),
    "band_pairs": QuerySpec(_q_band_pairs, _O_BAND_PAIRS, "band/interval join (bucketed)"),
    "product_profit": QuerySpec(_q_product_profit, _O_PRODUCT_PROFIT, "triple-dim star + fact shuffle (Q9 shape)"),
    "min_cost_supplier": QuerySpec(_q_min_cost_supplier, _O_MIN_COST_SUPPLIER, "groupwise argmin + join-back (Q2 shape)"),
    "important_parts": QuerySpec(_q_important_parts, _O_IMPORTANT_PARTS, "HAVING vs global scalar (Q11 shape)"),
    "idle_rich_customers": QuerySpec(_q_idle_rich_customers, _O_IDLE_RICH_CUSTOMERS, "scalar threshold + NOT EXISTS (Q22 shape)"),
    "rfm_segments": QuerySpec(_q_rfm_segments, _O_RFM_SEGMENTS, "RFM quartile segmentation (percentile cutoffs)"),
    "market_share": QuerySpec(_q_market_share, _O_MARKET_SHARE, "conditional-sum share ratio (Q8 shape)"),
    "returned_items": QuerySpec(_q_returned_items, _O_RETURNED_ITEMS, "returns revenue top-k (Q10 shape)"),
    "order_count_distribution": QuerySpec(_q_order_count_distribution, _O_ORDER_COUNT_DISTRIBUTION, "outer-join histogram (Q13 shape)"),
    "promo_revenue": QuerySpec(_q_promo_revenue, _O_PROMO_REVENUE, "conditional monthly share (Q14 shape)"),
    "small_quantity_revenue": QuerySpec(_q_small_quantity_revenue, _O_SMALL_QUANTITY_REVENUE, "self-agg join-back threshold (Q17 shape)"),
    "large_orders": QuerySpec(_q_large_orders, _O_LARGE_ORDERS, "HAVING then join-back (Q18 shape)"),
    "disjunctive_filter": QuerySpec(_q_disjunctive_filter, _O_DISJUNCTIVE_FILTER, "OR-of-ANDs pushdown (Q19 shape)"),
    "forecast_revenue_change": QuerySpec(_q_forecast_revenue_change, _O_FORECAST_REVENUE_CHANGE, "pure pushdown scan agg (Q6 shape)"),
    "top_supplier": QuerySpec(_q_top_supplier, _O_TOP_SUPPLIER, "agg joined to own max, ties kept (Q15 shape)"),
    "daily_anomalies": QuerySpec(_q_daily_anomalies, _O_DAILY_ANOMALIES, "trailing z-score anomaly detection (per-segment window)"),
    "basket_pairs": QuerySpec(_q_basket_pairs, _O_BASKET_PAIRS, "market-basket co-occurrence + lift (no self-join)"),
    "props_struct": QuerySpec(_q_props_struct, _O_PROPS_STRUCT, "G6 typed from_json parsing"),
    "price_percentiles": QuerySpec(_q_price_percentiles, _O_PRICE_PERCENTILES, "exact interpolated percentiles"),
    "journey_transitions": QuerySpec(_q_journey_transitions, _O_JOURNEY_TRANSITIONS, "G2 journey transition matrix"),
    "time_to_convert": QuerySpec(_q_time_to_convert, _O_TIME_TO_CONVERT, "G1/G3 conversion latency histogram"),
    # -- r7 additions (registered past the checked window; rotate into the
    # -- CORRECTNESS window next round per the standing protocol) ------------
    "part_kcore": QuerySpec(_q_part_kcore, _ora_part_kcore(64, 3), "X12 graph: 64-core dense-backbone peeling (3 fixed passes, full graph)"),
    "part_components": QuerySpec(_q_part_components, _O_PART_COMPONENTS, "X12 graph: connected components of the strong co-purchase graph"),
    "similar_parts_jaccard": QuerySpec(_q_similar_parts_jaccard, _O_SIMILAR_PARTS_JACCARD, "X12 graph: neighbor-set Jaccard structural similarity"),
    "waiting_suppliers": QuerySpec(_q_waiting_suppliers, _O_WAITING_SUPPLIERS, "R semi+anti correlated self-join (Q21 shape)"),
    "benford_prices": QuerySpec(_q_benford_prices, _ora_benford(), "X13 audit: Benford first-digit profile of extendedprice"),
    "numeric_corr": QuerySpec(_q_numeric_corr, _ora_numeric_corr(_CORR_PAIRS), "X13 audit: exact-moment Pearson correlation, one scan"),
    "kmeans_step": QuerySpec(_q_kmeans_step, _O_KMEANS_STEP, "X3 training: integer-exact Lloyd iteration (assign + update stats)"),
    "sketch_union": QuerySpec(_q_sketch_union, _O_SKETCH_UNION, "X6 sketch mergeability: HLL union estimate within ±5% of exact"),
    "event_type_drift": QuerySpec(_q_event_type_drift, _O_EVENT_TYPE_DRIFT, "X13 audit: chi-square categorical drift between snapshots"),
    "kmeans_train": QuerySpec(_q_kmeans_train, _ora_kmeans_train(8, 2), "X3 training loop: two Lloyd iterations on the fixed-point grid"),
    "customer_value_deciles": QuerySpec(_q_customer_value_deciles, _O_CUSTOMER_VALUE_DECILES, "§2e NTILE window: RFM customer value banding (fixed-point revenue)"),
    "referential_integrity": QuerySpec(_q_referential_integrity, _ora_referential_integrity(), "X13 audit: FK orphan counts over four declared relationships"),
    "part_walks": QuerySpec(_q_part_walks, _ora_part_walks(3, 2), "X12 graph: deterministic DeepWalk sampling corpus (md5-chosen steps)"),
    "bpe_train": QuerySpec(_q_bpe_train, _ora_bpe_train(3), "X4 tokenizer training loop: three full BPE merge iterations"),
    "bpe_train_batched": QuerySpec(_q_bpe_train_batched, _ora_bpe_train_batched(4, 4, 16), "X4 batched tokenizer training: 4 rounds x 4 disjoint merges from one ranked count per round (16 merges, 4 decision jobs)"),
    "ndcg_eval": QuerySpec(_q_ndcg_eval, _ora_ndcg_eval(_NDCG_QUERIES, 10, 50), "X7 retrieval eval: NDCG@10 of BM25 over a fixed query workload"),
    "split_leakage": QuerySpec(_q_split_leakage, _O_SPLIT_LEAKAGE, "X13 governance: train/test split leakage audit (entity vs row hashing)"),
    "zorder_skipping": QuerySpec(_q_zorder_skipping, _ora_zorder_skipping(4, 45, 55), "§4 layout: Z-order vs linear data-skipping effectiveness audit"),
    "centroid_sim": QuerySpec(_q_centroid_sim, _O_CENTROID_SIM, "X3 embedding audit: pairwise label-centroid dot products (integer-exact)"),
    "quantile_groups": QuerySpec(_q_quantile_groups, _O_QUANTILE_GROUPS, "X6 grouped GK quantile-sketch accuracy contract (mergeable one-pass quantiles)"),
    "pca_power": QuerySpec(_q_pca_power, _ora_pca_power(3), "X3 spectral: matrix-free PCA power method, 3 integer-exact iterations"),
    "degree_histogram": QuerySpec(_q_degree_histogram, _O_DEGREE_HISTOGRAM, "X12 graph audit: log2-bucketed degree distribution (hub-skew pre-flight)"),
    "lsh_cost_plan": QuerySpec(_q_lsh_cost_plan, _ora_lsh_cost_plan(16, 4, 3), "X2 planning: LSH bucket profile + exact candidate-pair volume per band"),
    "bpe_compression": QuerySpec(_q_bpe_compression, _ora_bpe_compression(3), "X4 tokenizer eval: corpus compression per learned BPE merge"),
    "containment_topk": QuerySpec(_q_containment_topk, _O_CONTAINMENT_TOPK, "X2 asymmetric near-dup: exact n-gram containment top-50 (quote/subset detection)"),
    "lang_id_agreement": QuerySpec(_q_lang_id_agreement, _O_LANG_ID_AGREEMENT, "X4/X13 eval: Cohen's kappa of the language-ID heuristic vs stored labels"),
    "seed_expansion": QuerySpec(_q_seed_expansion, _ora_seed_expansion(3), "X12/X11 seed-set expansion: personalized PageRank from one brand's parts"),
    "embedding_outliers": QuerySpec(_q_embedding_outliers, _O_EMBEDDING_OUTLIERS, "X3xX13 broken-vector detection: per-label MAD outliers on integer squared norms"),
    "heldout_perplexity": QuerySpec(_q_heldout_perplexity, _O_HELDOUT_PERPLEXITY, "X4/X11 eval: train-split bigram LM scored on held-out splits (generalization gap)"),
    "bloom_fpr": QuerySpec(_q_bloom_fpr, _O_BLOOM_FPR, "X8 contract: measured Bloom false-positive rate vs the theoretical bound"),
    "dup_cluster_histogram": QuerySpec(_q_dup_cluster_histogram, _ora_dup_cluster_histogram(16, 4, 3), "X2/X13 corpus health: duplicate-cluster size distribution (MSB buckets)"),
    "snm_name_pairs": QuerySpec(_q_snm_name_pairs, _O_SNM_NAME_PAIRS, "linkage: sorted-neighborhood candidate pairs (the blocking-free ER pass)"),
    "multi_pass_name_pairs": QuerySpec(_q_multi_pass_name_pairs, _O_MULTI_PASS_NAME_PAIRS, "linkage: multi-pass (blocked ∪ SNM) candidates with per-pass provenance"),
    "best_match_pairs": QuerySpec(_q_best_match_pairs, _O_BEST_MATCH_PAIRS, "linkage: reciprocal best-match (one-to-one) filter over multi-pass candidates"),
    "ranking_auc": QuerySpec(_q_ranking_auc, _O_RANKING_AUC, "X11 selection: exact Mann-Whitney ROC AUC acceptance gate"),
    "ranking_auc_banded": QuerySpec(_q_ranking_auc_banded, _O_RANKING_AUC_BANDED, "X11 selection: banded AUC with falsifiable error bound (the 100 TB twin)"),
    "calibration_bins": QuerySpec(_q_calibration_bins, _O_CALIBRATION_BINS, "X11 selection: reliability diagram (ECE bins) of a calibrated confidence"),
    # --- r8 additions ---
    "revenue_bands": QuerySpec(_q_revenue_bands, _O_REVENUE_BANDS, "§2e banding, scale route: broadcast decile boundaries + scan-side band assignment (NTILE's 100 TB twin)"),
}

# --- window-rotation history -----------------------------------------------
# The driver's correctness harness oracle-checks the FIRST 50 registry
# entries; each round ONE live window list (at the bottom of this file)
# re-sorts REGISTRY to put that round's rotation under the driver's oracle.
# Historical windows (r6-r10) and their per-round rationale live in git
# (this file's history) and in COVERAGE.md's generated attestation ledger —
# they are deliberately NOT kept here as code, because a stack of dead
# re-sort blocks is exactly the kind of thing a future edit re-activates
# out of order (VERDICT r10 #2).


# --- r10 additions ---------------------------------------------------------
from commerce_data_pipeline_spark.queries.analytics import (  # noqa: E402
    _O_STREAM_ATTRIBUTION_PAIRS,
    _q_stream_attribution_pairs,
)
from commerce_data_pipeline_spark.queries.selection_linkage import (  # noqa: E402
    _O_FISHER_DIMS,
    _O_QUALITY_GATE_REPORT,
    _q_fisher_dims,
    _q_quality_gate_report,
)
from commerce_data_pipeline_spark.queries.dedup_text import (  # noqa: E402
    _O_VOCAB_COVERAGE,
    _q_vocab_coverage,
)
from commerce_data_pipeline_spark.queries.profiling_ml import (  # noqa: E402
    _O_VALUE_KS_DRIFT,
    _q_value_ks_drift,
)
from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
    _O_KNN_LABEL_AGREEMENT,
    _O_KNN_LABEL_AGREEMENT_IVF,
    _q_knn_label_agreement,
    _q_knn_label_agreement_ivf,
)

REGISTRY["quality_gate_report"] = QuerySpec(
    _q_quality_gate_report,
    _O_QUALITY_GATE_REPORT,
    "X11 selection: cross-run QualityGateLedger ingest→merge→report (banded AUC + bound + ECE)",
)
REGISTRY["stream_attribution_pairs"] = QuerySpec(
    _q_stream_attribution_pairs,
    _O_STREAM_ATTRIBUTION_PAIRS,
    "streaming interval join: purchase→trailing-hour views (batch parity)",
)
REGISTRY["vocab_coverage"] = QuerySpec(
    _q_vocab_coverage,
    _O_VOCAB_COVERAGE,
    "X4 text: top-V vocabulary coverage / per-source OOV-rate audit",
)
REGISTRY["fisher_dims"] = QuerySpec(
    _q_fisher_dims,
    _O_FISHER_DIMS,
    "X11 selection: exact-integer one-vs-rest Fisher dimension audit",
)
REGISTRY["knn_label_agreement"] = QuerySpec(
    _q_knn_label_agreement,
    _O_KNN_LABEL_AGREEMENT,
    "X3/X11: exact-cosine kNN label self-consistency per label",
)
REGISTRY["knn_label_agreement_ivf"] = QuerySpec(
    _q_knn_label_agreement_ivf,
    _O_KNN_LABEL_AGREEMENT_IVF,
    "X3/X11: the label self-consistency probe on the persisted-IVF scale path",
)
REGISTRY["value_ks_drift"] = QuerySpec(
    _q_value_ks_drift,
    _O_VALUE_KS_DRIFT,
    "X13 audit: exact-integer two-sample KS drift of a numeric column",
)

# --- r11 additions ---------------------------------------------------------
from commerce_data_pipeline_spark.queries.selection_linkage import (  # noqa: E402
    _ora_bpe_tokenize,
    _ora_tokenizer_fertility,
    _q_bpe_tokenize,
    _q_tokenizer_fertility,
)
from commerce_data_pipeline_spark.queries.profiling_ml import (  # noqa: E402
    _O_VALUE_JS_DRIFT,
    _O_VALUE_PSI_DRIFT,
    _q_value_js_drift,
    _q_value_psi_drift,
)

REGISTRY["bpe_tokenize"] = QuerySpec(
    _q_bpe_tokenize,
    _ora_bpe_tokenize(3),
    "X4 tokenizer last mile: map-only per-doc token-id emission under the learned merge table",
)
REGISTRY["value_psi_drift"] = QuerySpec(
    _q_value_psi_drift,
    _O_VALUE_PSI_DRIFT,
    "X13 audit: Laplace-smoothed decile Population Stability Index of a numeric column",
)
REGISTRY["tokenizer_fertility"] = QuerySpec(
    _q_tokenizer_fertility,
    _ora_tokenizer_fertility(3),
    "X4 tokenizer quality: per-source fertility (tokens/word) + chars/token under the learned table",
)
REGISTRY["value_js_drift"] = QuerySpec(
    _q_value_js_drift,
    _O_VALUE_JS_DRIFT,
    "X13 audit: bounded Jensen-Shannon divergence over the shared decile banding",
)

from commerce_data_pipeline_spark.queries.dedup_text import (  # noqa: E402
    _ora_minhash_estimate_audit,
    _q_minhash_estimate_audit,
)

REGISTRY["minhash_estimate_audit"] = QuerySpec(
    _q_minhash_estimate_audit,
    _ora_minhash_estimate_audit(8, 3),
    "X2 accuracy contract: exact Jaccard vs the MinHash estimate (the dedup ann_recall)",
)

# --- r13 additions ---------------------------------------------------------
from commerce_data_pipeline_spark.queries.dedup_text import (  # noqa: E402
    _ora_ledger_cross_run_dups,
    _q_ledger_cross_run_dups,
)
from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
    _ora_ann_ivf_rebalance,
    _q_ann_ivf_rebalance,
)

REGISTRY["ledger_cross_run_dups"] = QuerySpec(
    _q_ledger_cross_run_dups,
    _ora_ledger_cross_run_dups(16, 4, 3),
    "X2/P cross-run dedup state: BandLedger match_history over the COMPACTED two-run history (retention lifecycle: 2 commits + replayed commit + compact)",
)
REGISTRY["ann_ivf_rebalance"] = QuerySpec(
    _q_ann_ivf_rebalance,
    _ora_ann_ivf_rebalance(2),
    "X3 index maintenance: IVF search after oversized-list SPLIT rebalancing (build in r12, registered r13 per the never-attested-in-window protocol); oracle replays build->census->seed->reassign->probe",
)

# --- r14 additions ---------------------------------------------------------
from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
    _ora_ann_rebalance_recall,
    _q_ann_rebalance_recall,
)

REGISTRY["ann_rebalance_recall"] = QuerySpec(
    _q_ann_rebalance_recall,
    _ora_ann_rebalance_recall(2),
    "X3 maintenance gate: recall@5 at the FIXED serving n_probe over the SPLIT index vs exact brute force (build in r13, registered r14 per protocol) — the number rebalance_with_gate enforces; oracle composes the rebalance replay with the brute-force top-5 and the integer summary",
)

# --- r15 additions -----------------------------------------------------------
from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
    _ora_ann_rebalance_gate,
    _q_ann_rebalance_gate,
)

REGISTRY["ann_rebalance_gate"] = QuerySpec(
    _q_ann_rebalance_gate,
    _ora_ann_rebalance_gate(2),
    "X3 maintenance gate END TO END: rebalance_with_gate verdict row — pre/post "
    "recall@5 at the fixed serving n_probe over the persisted split lifecycle, "
    "drop, ceil-scaled recommended_n_probe, admit booleans at two reference "
    "budgets (built in r14, registered r15 per the never-attested protocol)",
)

# --- r16 additions -----------------------------------------------------------
from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
    _ora_ann_veto_rollback,
    _q_ann_veto_rollback,
)

REGISTRY["ann_veto_rollback"] = QuerySpec(
    _q_ann_veto_rollback,
    _ora_ann_veto_rollback(2),
    "X3 maintenance gate VETO END TO END: top-5 from an index whose gated "
    "split was REJECTED and rolled back (bit-identical pre-split serving, "
    "restored routing + swept sub-lists) joined with the persisted verdict "
    "inputs; rolled_back derives from the post-veto filesystem audit "
    "(built in r15, registered r16 per the never-attested protocol)",
)

# --- r16 window rotation (VERDICT r15 #1 + #5) -------------------------------
# THE one live window (historical windows live in git + COVERAGE.md's
# generated attestation ledger). Rotation payload after the fully-green
# CORRECTNESS_r15 (tiers r15:50, r14:50, r13:48, r12:48, r11: ann_pq +
# bigram_lm): the TWO named r11-tier overflows `ann_pq` + `bigram_lm`
# LEAD (sanctioned for exactly two rounds in r14, due now), followed by
# the never-attested `ann_veto_rollback` (pre-built + differential-
# pinned in r15, registered this round per protocol), 45 of the 48
# r12-latest queries, and the two always-in-window single-query
# families (salted_hot_join, zorder_skipping) — 53 candidates for 50
# slots, exactly as the r15 VERDICT forecast. The THREE named r12-tier
# overflows to r17 are `bpe_first_merge` (X4 keeps bpe_train,
# bpe_train_batched and bpe_compression in-window — the first-merge
# statistic is a strict prefix of bpe_train's attested lifecycle),
# `kmeans_step` (the iterative family keeps kmeans_train — whose replay
# contains the step — and pca_power in-window), and `part_walks` (X12
# keeps part_communities, part_components, part_kcore and
# part_triangles in-window) — recorded in COVERAGE.md's r16 section;
# they MUST lead _WINDOW_R17. After a green CORRECTNESS_r16 every
# other non-terminal query's latest attestation is >= r13 (VERDICT r15
# #5's cadence bar: tiers r16:50, r15:50, r14:50, r13:48, r12: exactly
# the three named overflows). FAMILY_PROOFS in
# tests/test_registry_window.py is re-seeded from this window in the
# same commit; families whose every member is fresh (attested >= r13)
# cede their pin slot to the payload, per the standing precedent.
_WINDOW_R16 = [
    # the named r11-tier overflows — lead per VERDICT r15 #1
    "ann_pq", "bigram_lm",
    # new in r16 — never-attested, first driver attestation this round
    "ann_veto_rollback",
    # 45 of the 48 r12-latest rotate-ins (bpe_first_merge, kmeans_step
    # and part_walks overflow to r17, named above), alphabetical
    "also_bought", "ann_ivf_upsert", "ann_lsh", "approx_group_stats",
    "approx_stats", "association_rules", "attribution_position",
    "benford_prices", "bpe_compression", "bpe_train", "bpe_train_batched",
    "burst_window_events", "canonical_docs", "dup_cluster_histogram",
    "embedding_outliers", "event_type_drift", "fd_check", "heldout_perplexity",
    "image_dup_clusters", "k_anonymity", "kmeans_train", "lang_id_agreement",
    "lsh_cost_plan", "multi_pass_name_pairs", "ndcg_eval", "ngram_novelty",
    "numeric_corr", "part_communities", "part_components", "part_kcore",
    "part_triangles", "pca_power", "price_histogram", "quality_classifier",
    "quantile_groups", "referential_integrity", "revenue_bands",
    "sequence_violations", "session_funnel", "similar_parts_jaccard",
    "sliding_counts", "snapshot_diff", "split_leakage", "waiting_suppliers",
    "winsorized_revenue",
    # single-query families (must stay in-window)
    "salted_hot_join", "zorder_skipping",
]
REGISTRY = {n: REGISTRY[n] for n in _WINDOW_R16} | {
    k: v for k, v in REGISTRY.items() if k not in set(_WINDOW_R16)
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

# --- banked never-attested candidates (pre-built r16, NOT yet registered) ----
# Each has a differential pytest, an sf0.01 hand-verify, and an 8× sweep
# already recorded (COVERAGE.md r16 addendum / STRESS.md). Register ONE
# per round inside that round's window per the never-attested-in-window
# protocol; uncomment the block verbatim in the round's additions
# section. Bank plan: ann_commit_selfheal→r17, ann_recover_midswap→r18,
# ann_recover_commit→r19, ledger_fp_new→r20.
#
# from commerce_data_pipeline_spark.queries.similarity import (  # noqa: E402
#     _ora_ann_commit_selfheal, _q_ann_commit_selfheal,
#     _ora_ann_recover_midswap, _q_ann_recover_midswap,
#     _ora_ann_recover_commit, _q_ann_recover_commit,
# )
# from commerce_data_pipeline_spark.queries.dedup_text import (  # noqa: E402
#     _O_LEDGER_FP_NEW, _q_ledger_fp_new,
# )
#
# REGISTRY["ann_commit_selfheal"] = QuerySpec(
#     _q_ann_commit_selfheal, _ora_ann_commit_selfheal(2),
#     "X3 maintenance crash recovery: interrupted-commit self-heal row — "
#     "commit crashed after the copy-first delete; routine pass sweeps; "
#     "oracle replays the committed split (built r16, registered per protocol)",
# )
# REGISTRY["ann_recover_midswap"] = QuerySpec(
#     _q_ann_recover_midswap, _ora_ann_recover_midswap(2),
#     "X3 maintenance crash recovery: mid-swap state (only ._rebal_old left) "
#     "— guard + recover(commit) refusals observed, recover(rollback) restores "
#     "pre-split serving bit-identically; oracle replays the never-split "
#     "routing (built r16, registered per protocol)",
# )
# REGISTRY["ann_recover_commit"] = QuerySpec(
#     _q_ann_recover_commit, _ora_ann_recover_commit(2),
#     "X3 maintenance crash recovery: deferred-window commit via the public "
#     "recover_pending_swap — swept ids == retired ids (unroutable⇒retired), "
#     "post-commit clean; oracle replays the committed split (built r16)",
# )
# REGISTRY["ledger_fp_new"] = QuerySpec(
#     _q_ledger_fp_new, _O_LEDGER_FP_NEW,
#     "X1/P cross-run exact-dedup state: FingerprintLedger filter_new over "
#     "the COMPACTED two-run history (replayed commit folded); batch carries "
#     "re-crawls and intra-batch refetches, both suppressed (built r16)",
# )

# --- PROPOSED _WINDOW_R17 (staged during r16; ACTIVATE only in r17) ---------
# Arithmetic after a green CORRECTNESS_r16 (tiers r16:50, r15:48,
# r14:48, r13:48, r12: the three named overflows): the r12-tier
# overflows bpe_first_merge + kmeans_step + part_walks LEAD, then the
# never-attested ann_commit_selfheal (pre-built r16, registers r17 per
# protocol), then 44 of the 48 r13-tier, then the two always-in-window
# singles. FOUR r13-tier queries overflow to r18, chosen so every
# family keeps an in-window member with a containing replay:
#   - ann_ivf_rebalance  (X3: ann_commit_selfheal's oracle COMPOSES the
#     full rebalance CTE chain, so the replay is attested in-window)
#   - ann_ivf_indexed    (X3: same persisted-index serving path probed
#     by the selfheal row's ivf_query)
#   - ranking_auc        (X11 eval: ranking_auc_banded's banded oracle
#     contains the plain-AUC computation; calibration_bins also stays)
#   - rollup_sales       (R-olap: cube_sales' grouping lattice contains
#     the rollup rows)
# These four MUST lead _WINDOW_R18. Validate against the regenerated
# ledger + FAMILY_PROOFS before activating; re-seed FAMILY_PROOFS in
# tests/test_registry_window.py in the same commit; oracle-check all 50
# at sf0.01 BEFORE committing the rotation.
#
# _WINDOW_R17 = [
#     "bpe_first_merge", "kmeans_step", "part_walks",
#     "ann_commit_selfheal",
#     "above_brand_avg_parts", "asof_view_before_purchase", "audio_windows",
#     "band_pairs", "basket_pairs", "best_match_pairs", "bm25_indexed",
#     "calibration_bins", "corpus_ingest", "cube_sales",
#     "customer_segments_setops", "daily_anomalies", "dedup_clusters_alt",
#     "degree_histogram", "disjunctive_filter", "event_type_pivot",
#     "forecast_revenue_change", "idle_rich_customers", "important_parts",
#     "journey_transitions", "ledger_cross_run_dups", "market_share",
#     "min_cost_supplier", "nation_trade_volume", "order_count_distribution",
#     "order_priority", "price_percentiles", "priciest_item_per_order",
#     "product_profit", "props_struct", "ranking_auc_banded",
#     "returned_items", "rfm_segments", "running_revenue", "session_windows",
#     "shipping_priority", "sketch_union", "small_quantity_revenue",
#     "sort_topk_lineitems", "supplier_diversity", "time_to_convert",
#     "top_customers", "trailing_revenue", "word_count",
#     "salted_hot_join", "zorder_skipping",
# ]
#
# Fifth banked candidate (spare — register if a round needs a second
# never-attested row or a replacement):
# from commerce_data_pipeline_spark.queries.profiling_ml import (  # noqa: E402
#     _O_PART_COMPONENTS_DELTA, _q_part_components_delta,
# )
# REGISTRY["part_components_delta"] = QuerySpec(
#     _q_part_components_delta, _O_PART_COMPONENTS_DELTA,
#     "X12 graph: INCREMENTAL connected components — previous labels "
#     "star-compressed and re-converged with only the delta batch; oracle "
#     "is the from-scratch closure over the full edge set (built r16)",
# )

"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Catalog layout mirrors SURVEY.md §2: ``es_*`` = reference operator
analogues (A-series), plain names = relational surface (B-series),
``dedup_*``/``ann_*``/``text`` names = north-star LLM-pipeline
operators (C-series).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Python UDF workers inherit PYTHONPATH from the driver environment;
# make the repo importable there so pandas-UDF closures referencing
# package code resolve regardless of the caller's cwd.
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from hematite_spark.queries import (
    advanced,
    dedup,
    eventstore,
    multimodal,
    packing,
    pipeline,
    relational,
    sampling,
    similarity,
    text,
    tpch_shapes,
    udf,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering is deliberate (VERDICT r1 item 2): the driver's gate
    checks entries in dict order and round 1 covered only the first
    50, so the C-series (LLM-pipeline operators), the UDF suite, the
    previously-unchecked TPC-H shapes, and the 5 formerly hash-failing
    entries are front-loaded; previously driver-green B-series anchors
    follow. Key names are unchanged from round 1."""
    return {
        # -- priority block: front-loaded for driver coverage --------
        # A-series anchor + the formerly hash-failing entries
        "es_point_read": eventstore.es_point_read,
        "es_stream_metadata": eventstore.es_stream_metadata,
        "es_metadata_sort": eventstore.es_metadata_sort,
        "q1_pricing_summary": relational.q1_pricing_summary,
        "json_extract_events": relational.json_extract_events,
        "string_functions_part": relational.string_functions_part,
        "sessionize_events": relational.sessionize_events,
        # C-series: dedup
        "dedup_exact": dedup.dedup_exact,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_minhash": dedup.dedup_minhash,
        "dedup_lsh_candidates": dedup.lsh_candidate_pairs,
        "dedup_simhash_band": dedup.dedup_simhash_band,
        "dedup_embedding_cosine": dedup.dedup_embedding_cosine,
        "dedup_semantic": dedup.dedup_semantic,
        "dedup_incremental": dedup.dedup_incremental,
        "dedup_connected_components": dedup.dedup_connected_components,
        "dedup_containment": dedup.dedup_containment,
        "dedup_cluster_density": dedup.dedup_cluster_density,
        # C-series: vector similarity
        "ann_brute_force": similarity.ann_brute_force,
        "ann_ivf_kmeans_assign": similarity.ann_ivf_kmeans_assign,
        "ann_ivf_search": similarity.ann_ivf_search,
        "ann_filtered_search": similarity.ann_filtered_search,
        "similarity_join_block": similarity.similarity_join_block,
        "timeseries_corr_search": similarity.timeseries_corr_search,
        "pair_mining_contrastive": similarity.pair_mining_contrastive,
        # C-series: text analysis
        "text_token_count": text.token_count,
        "text_quality_score": text.quality_score,
        "text_language_id": text.language_id,
        "text_tfidf": text.tfidf_top_terms,
        "corpus_decontaminate": text.corpus_decontaminate,
        "text_repetition_stats": text.text_repetition_stats,
        "text_boilerplate_fraction": text.text_boilerplate_fraction,
        "dsir_importance_weights": text.dsir_importance_weights,
        "text_ngram_novelty": text.text_ngram_novelty,
        # round-2 flagships (front-loaded for driver coverage)
        "bpe_learn_merges": text.bpe_learn_merges,
        "bpe_apply_compression": text.bpe_apply_compression,
        "tokens_heavy_hitters": text.tokens_heavy_hitters,
        "ann_pq_adc": similarity.ann_pq_adc,
        "zorder_cluster_key": advanced.zorder_cluster_key,
        "scd2_merge_orders": advanced.scd2_merge_orders,
        "bloom_semi_join_reduction": advanced.bloom_semi_join_reduction,
        "join_cardinality_estimate": advanced.join_cardinality_estimate,
        "quantile_bins_price": advanced.quantile_bins_price,
        # C-series: deterministic sampling / dataset splits
        "sample_systematic": sampling.sample_systematic,
        "sample_stratified": sampling.sample_stratified,
        "split_train_test": sampling.split_train_test,
        "shuffle_deterministic": sampling.shuffle_deterministic,
        "split_temporal_purged": sampling.split_temporal_purged,
        # C-series: the operators composed end-to-end
        "corpus_pipeline": pipeline.corpus_pipeline,
        # ---- (driver-window boundary; 50 entries above) -----------
        "dedup_lsh_verified": dedup.dedup_lsh_verified,
        "dedup_simhash": dedup.dedup_simhash,
        "ann_knn_multi_query": similarity.knn_multi_query,
        "ann_ivf_buckets": similarity.ann_ivf_buckets,
        "ann_ivf_multiprobe": similarity.ann_ivf_multiprobe,
        "embedding_stats": similarity.embedding_stats,
        "embedding_quantize": similarity.embedding_quantize,
        "text_fingerprint": text.fingerprint,
        "text_char_entropy": text.char_bigram_entropy,
        "text_vocabulary": text.text_vocabulary,
        "text_unigram_logprob": text.text_unigram_logprob,
        "sample_temperature": sampling.sample_temperature,
        "pack_sequences": packing.pack_sequences,
        # C-series: multimodal binary columns
        "multimodal_binary_stats": multimodal.multimodal_binary_stats,
        "multimodal_features": multimodal.multimodal_features,
        "multimodal_frame_sample": multimodal.multimodal_frame_sample,
        # B-series: UDF extension points + sketch aggregates
        "udaf_geometric_mean": udf.udaf_geometric_mean,
        "udtf_bigrams": udf.udtf_bigrams,
        "pandas_grouped_decile": udf.pandas_grouped_decile,
        "agg_approx_distinct": udf.agg_approx_distinct,
        "agg_approx_percentiles": udf.agg_approx_percentiles,
        # B-series: TPC-H shapes the round-1 gate never reached
        "q12_late_shipment_priority": tpch_shapes.q12_late_shipment_priority,
        "q13_customer_order_distribution": tpch_shapes.q13_customer_order_distribution,
        "q15_top_supplier": tpch_shapes.q15_top_supplier,
        "q16_supplier_part_count": tpch_shapes.q16_supplier_part_count,
        "q20_part_promotion": tpch_shapes.q20_part_promotion,
        "q21_waiting_suppliers": tpch_shapes.q21_waiting_suppliers,
        # B-series: event-analytics shapes (funnel, cohort)
        "funnel_events": advanced.funnel_events,
        "cohort_retention": advanced.cohort_retention,
        "anomaly_zscore_events": advanced.anomaly_zscore_events,
        # B-series anchors (close out the first 50)
        "join_asof": relational.join_asof,
        "window_running_total": relational.window_running_total,
        # -- previously driver-green entries ------------------------
        # A-series: event-store operator analogues
        "es_range_scan": eventstore.es_range_scan,
        "es_dedup_source_id": eventstore.es_dedup_source_id,
        "es_time_travel": eventstore.es_time_travel,
        # B-series: relational surface
        "q3_shipping_priority": relational.q3_shipping_priority,
        "q5_local_supplier_volume": relational.q5_local_supplier_volume,
        "q6_forecast_revenue": relational.q6_forecast_revenue,
        "q10_returned_items": relational.q10_returned_items,
        "join_semi": relational.join_semi,
        "join_anti": relational.join_anti,
        "join_outer_coalesce": relational.join_outer_coalesce,
        "join_range": relational.join_range,
        "join_band_inequality": advanced.join_band_inequality,
        "agg_distinct": relational.agg_distinct,
        "rollup_lineitem": relational.rollup_lineitem,
        "cube_orders": relational.cube_orders,
        "pivot_events": relational.pivot_events,
        "unpivot_lineitem": relational.unpivot_lineitem,
        "window_top_orders_per_customer": relational.window_top_orders_per_customer,
        "window_lag_events": relational.window_lag_events,
        "topk_global": relational.topk_global,
        "setop_nations": relational.setop_nations,
        "date_functions_orders": relational.date_functions_orders,
        "array_functions_embeddings": relational.array_functions_embeddings,
        "tumbling_window_events": relational.tumbling_window_events,
        # B-series depth: subquery shapes, grouping sets, stats, frames
        "q4_exists_late_orders": advanced.q4_exists_late_orders,
        "q7_nation_trade_volume": advanced.q7_nation_trade_volume,
        "q8_market_share": advanced.q8_market_share,
        "q14_promo_revenue": advanced.q14_promo_revenue,
        "q17_small_quantity_revenue": advanced.q17_small_quantity_revenue,
        "q18_large_volume_customers": advanced.q18_large_volume_customers,
        "q19_disjunctive_predicates": advanced.q19_disjunctive_predicates,
        "q22_inactive_customers": advanced.q22_inactive_customers,
        "grouping_sets_revenue": advanced.grouping_sets_revenue,
        "agg_percentiles": advanced.agg_percentiles,
        "agg_statistics": advanced.agg_statistics,
        "agg_salted_twophase": advanced.agg_salted_twophase,
        "join_salted_hotkey": advanced.join_salted_hotkey,
        "window_range_moving_avg": advanced.window_range_moving_avg,
        "window_rank_suite": advanced.window_rank_suite,
        # B-series: remaining TPC-H shapes (full 22-shape coverage)
        "q2_min_cost_supplier": tpch_shapes.q2_min_cost_supplier,
        "q9_product_profit": tpch_shapes.q9_product_profit,
        "q11_important_parts": tpch_shapes.q11_important_parts,
        # round-2 additions: LM scoring depth, sketch-audited heavy
        # hitters, behavioral segmentation, lake clustering, PII scrub
        "text_bigram_logprob": text.text_bigram_logprob,
        "rfm_segments": advanced.rfm_segments,
        "redact_numbers_events": advanced.redact_numbers_events,
        "agg_incremental_merge": advanced.agg_incremental_merge,
        "resample_fill_events": advanced.resample_fill_events,
        "profile_columns_orders": advanced.profile_columns_orders,
        "textrank_keywords": text.textrank_keywords,
        "doc_chunk_overlap": text.doc_chunk_overlap,
        "text_duplicate_spans": text.text_duplicate_spans,
        "fuzzy_match_parts": advanced.fuzzy_match_parts,
        "basket_item_affinity": advanced.basket_item_affinity,
        "event_transition_matrix": advanced.event_transition_matrix,
        "winsorize_event_values": advanced.winsorize_event_values,
        "skew_diagnostics_lineitem": advanced.skew_diagnostics_lineitem,
        "chunk_dedup_stats": text.chunk_dedup_stats,
        "attribution_last_touch": advanced.attribution_last_touch,
        "histogram_event_values": advanced.histogram_event_values,
        "sample_weighted_reservoir": sampling.sample_weighted_reservoir,
        "metric_confidence_intervals": advanced.metric_confidence_intervals,
        "revenue_growth_mom": advanced.revenue_growth_mom,
        "minhash_jaccard_audit": dedup.minhash_jaccard_audit,
        "session_path_analysis": advanced.session_path_analysis,
        "token_pmi_collocations": text.token_pmi_collocations,
        "sample_per_group": sampling.sample_per_group,
        "kmeans_lloyd_step": similarity.kmeans_lloyd_step,
        "es_state_projection": eventstore.es_state_projection,
        "text_inverted_index": text.text_inverted_index,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/rounding)."""
    return {
        "es_point_read": eventstore.ES_POINT_READ_SQL,
        "es_range_scan": eventstore.ES_RANGE_SCAN_SQL,
        "es_stream_metadata": eventstore.ES_STREAM_METADATA_SQL,
        "es_metadata_sort": eventstore.ES_METADATA_SORT_SQL,
        "es_dedup_source_id": eventstore.ES_DEDUP_SQL,
        "es_time_travel": eventstore.ES_TIME_TRAVEL_SQL,
        "q1_pricing_summary": relational.Q1_SQL,
        "q3_shipping_priority": relational.Q3_SQL,
        "q5_local_supplier_volume": relational.Q5_SQL,
        "q6_forecast_revenue": relational.Q6_SQL,
        "q10_returned_items": relational.Q10_SQL,
        "join_semi": relational.JOIN_SEMI_SQL,
        "join_anti": relational.JOIN_ANTI_SQL,
        "join_outer_coalesce": relational.JOIN_OUTER_SQL,
        "join_asof": relational.JOIN_ASOF_SQL,
        "join_range": relational.JOIN_RANGE_SQL,
        "join_band_inequality": advanced.JOIN_BAND_SQL,
        "agg_distinct": relational.AGG_DISTINCT_SQL,
        "rollup_lineitem": relational.ROLLUP_SQL,
        "cube_orders": relational.CUBE_SQL,
        "pivot_events": relational.PIVOT_SQL,
        "unpivot_lineitem": relational.UNPIVOT_SQL,
        "window_running_total": relational.WINDOW_RUNNING_SQL,
        "window_top_orders_per_customer": relational.WINDOW_TOPK_SQL,
        "window_lag_events": relational.WINDOW_LAG_SQL,
        "topk_global": relational.TOPK_SQL,
        "setop_nations": relational.SETOP_SQL,
        "json_extract_events": relational.JSON_SQL,
        "date_functions_orders": relational.DATE_SQL,
        "string_functions_part": relational.STRING_SQL,
        "array_functions_embeddings": relational.ARRAY_FUNCTIONS_SQL,
        "tumbling_window_events": relational.TUMBLING_SQL,
        "sessionize_events": relational.SESSIONIZE_SQL,
        "q4_exists_late_orders": advanced.Q4_EXISTS_SQL,
        "q7_nation_trade_volume": advanced.Q7_TRADE_SQL,
        "q8_market_share": advanced.Q8_SHARE_SQL,
        "q14_promo_revenue": advanced.Q14_PROMO_SQL,
        "q17_small_quantity_revenue": advanced.Q17_SCALAR_SQL,
        "q18_large_volume_customers": advanced.Q18_IN_SQL,
        "q19_disjunctive_predicates": advanced.Q19_DISJ_SQL,
        "q22_inactive_customers": advanced.Q22_ANTI_SQL,
        "grouping_sets_revenue": advanced.GROUPING_SETS_SQL,
        "agg_percentiles": advanced.AGG_PERCENTILES_SQL,
        "agg_statistics": advanced.AGG_STATISTICS_SQL,
        "agg_salted_twophase": advanced.AGG_SALTED_SQL,
        "join_salted_hotkey": advanced.JOIN_SALTED_SQL,
        "window_range_moving_avg": advanced.WINDOW_RANGE_SQL,
        "window_rank_suite": advanced.WINDOW_RANK_SQL,
        "funnel_events": advanced.FUNNEL_SQL,
        "cohort_retention": advanced.COHORT_SQL,
        "anomaly_zscore_events": advanced.ANOMALY_ZSCORE_SQL,
        "q2_min_cost_supplier": tpch_shapes.Q2_MINCOST_SQL,
        "q9_product_profit": tpch_shapes.Q9_PROFIT_SQL,
        "q11_important_parts": tpch_shapes.Q11_IMPORTANT_SQL,
        "q12_late_shipment_priority": tpch_shapes.Q12_LATE_SQL,
        "q13_customer_order_distribution": tpch_shapes.Q13_DIST_SQL,
        "q15_top_supplier": tpch_shapes.Q15_TOP_SQL,
        "q16_supplier_part_count": tpch_shapes.Q16_COUNT_SQL,
        "q20_part_promotion": tpch_shapes.Q20_PROMO_SQL,
        "q21_waiting_suppliers": tpch_shapes.Q21_WAITING_SQL,
        "udaf_geometric_mean": udf.UDAF_GEOMEAN_SQL,
        "udtf_bigrams": udf.UDTF_BIGRAMS_SQL,
        "pandas_grouped_decile": udf.PANDAS_DECILE_SQL,
        # agg_approx_distinct / agg_approx_percentiles: sketches —
        # engine-specific estimates, rows-only (exact twins
        # agg_distinct / agg_percentiles are the oracle-checked
        # anchors; error contracts asserted in unit tests)
        "sample_systematic": sampling.SAMPLE_SYSTEMATIC_SQL,
        "sample_stratified": sampling.SAMPLE_STRATIFIED_SQL,
        "split_train_test": sampling.SPLIT_TRAIN_TEST_SQL,
        "sample_temperature": sampling.SAMPLE_TEMPERATURE_SQL,
        "pack_sequences": packing.PACK_SEQUENCES_SQL,
        "text_token_count": text.TOKEN_COUNT_SQL,
        "text_quality_score": text.QUALITY_SQL,
        "text_language_id": text.LANGUAGE_ID_SQL,
        "text_fingerprint": text.FINGERPRINT_SQL,
        "text_char_entropy": text.CHAR_ENTROPY_SQL,
        "text_tfidf": text.TFIDF_SQL,
        "text_vocabulary": text.VOCABULARY_SQL,
        "corpus_decontaminate": text.DECONTAMINATE_SQL,
        "text_repetition_stats": text.REPETITION_SQL,
        "text_boilerplate_fraction": text.BOILERPLATE_SQL,
        "text_unigram_logprob": text.UNIGRAM_LOGPROB_SQL,
        "dedup_exact": dedup.DEDUP_EXACT_SQL,
        "dedup_ngram_jaccard": dedup.DEDUP_JACCARD_SQL,
        "dedup_minhash": dedup.DEDUP_MINHASH_SQL,
        "dedup_lsh_candidates": dedup.LSH_CANDIDATES_SQL,
        "dedup_lsh_verified": dedup.DEDUP_LSH_VERIFIED_SQL,
        "dedup_simhash": dedup.DEDUP_SIMHASH_SQL,
        "dedup_simhash_band": dedup.DEDUP_SIMHASH_BAND_SQL,
        "dedup_embedding_cosine": dedup.DEDUP_EMBEDDING_SQL,
        "dedup_semantic": dedup.DEDUP_SEMANTIC_SQL,
        "dedup_incremental": dedup.DEDUP_INCREMENTAL_SQL,
        "dedup_connected_components": dedup.DEDUP_CC_SQL,
        "ann_brute_force": similarity.ANN_BRUTE_SQL,
        "ann_knn_multi_query": similarity.KNN_MULTI_SQL,
        "ann_ivf_buckets": similarity.ANN_IVF_SQL,
        "ann_ivf_kmeans_assign": similarity.ANN_IVF_KMEANS_SQL,
        "ann_ivf_search": similarity.ANN_IVF_SEARCH_SQL,
        "ann_ivf_multiprobe": similarity.ANN_IVF_MULTIPROBE_SQL,
        "ann_filtered_search": similarity.ANN_FILTERED_SQL,
        "similarity_join_block": similarity.SIMILARITY_JOIN_SQL,
        "timeseries_corr_search": similarity.TIMESERIES_CORR_SQL,
        "embedding_stats": similarity.EMBEDDING_STATS_SQL,
        "embedding_quantize": similarity.EMBEDDING_QUANTIZE_SQL,
        "multimodal_binary_stats": multimodal.MULTIMODAL_STATS_SQL,
        "multimodal_frame_sample": multimodal.MULTIMODAL_FRAMES_SQL,
        "multimodal_features": multimodal.MULTIMODAL_FEATURES_SQL,
        "corpus_pipeline": pipeline.PIPELINE_SQL,
        "text_bigram_logprob": text.BIGRAM_LOGPROB_SQL,
        "tokens_heavy_hitters": text.HEAVY_HITTERS_SQL,
        "rfm_segments": advanced.RFM_SQL,
        "zorder_cluster_key": advanced.ZORDER_SQL,
        "redact_numbers_events": advanced.REDACT_SQL,
        "agg_incremental_merge": advanced.INCREMENTAL_MERGE_SQL,
        "resample_fill_events": advanced.RESAMPLE_FILL_SQL,
        "profile_columns_orders": advanced.PROFILE_SQL,
        "textrank_keywords": text.TEXTRANK_SQL,
        "doc_chunk_overlap": text.DOC_CHUNK_SQL,
        "text_duplicate_spans": text.DUPLICATE_SPANS_SQL,
        "fuzzy_match_parts": advanced.FUZZY_MATCH_SQL,
        "basket_item_affinity": advanced.BASKET_AFFINITY_SQL,
        "event_transition_matrix": advanced.TRANSITION_MATRIX_SQL,
        "winsorize_event_values": advanced.WINSORIZE_SQL,
        "scd2_merge_orders": advanced.SCD2_MERGE_SQL,
        "skew_diagnostics_lineitem": advanced.SKEW_DIAG_SQL,
        "bpe_learn_merges": text.BPE_SQL,
        "chunk_dedup_stats": text.CHUNK_DEDUP_SQL,
        "ann_pq_adc": similarity.ANN_PQ_SQL,
        "attribution_last_touch": advanced.ATTRIBUTION_SQL,
        "histogram_event_values": advanced.HISTOGRAM_SQL,
        "bloom_semi_join_reduction": advanced.BLOOM_SQL,
        "sample_weighted_reservoir": sampling.SAMPLE_WEIGHTED_SQL,
        "metric_confidence_intervals": advanced.CONFIDENCE_SQL,
        "revenue_growth_mom": advanced.REVENUE_GROWTH_SQL,
        "dsir_importance_weights": text.DSIR_SQL,
        "text_ngram_novelty": text.NGRAM_NOVELTY_SQL,
        "dedup_containment": dedup.DEDUP_CONTAINMENT_SQL,
        "pair_mining_contrastive": similarity.PAIR_MINING_SQL,
        "shuffle_deterministic": sampling.SHUFFLE_DETERMINISTIC_SQL,
        "split_temporal_purged": sampling.SPLIT_TEMPORAL_SQL,
        "quantile_bins_price": advanced.QUANTILE_BINS_SQL,
        "dedup_cluster_density": dedup.DEDUP_DENSITY_SQL,
        "join_cardinality_estimate": advanced.JOIN_CARD_SQL,
        "bpe_apply_compression": text.BPE_APPLY_SQL,
        "minhash_jaccard_audit": dedup.MINHASH_AUDIT_SQL,
        "session_path_analysis": advanced.SESSION_PATH_SQL,
        "token_pmi_collocations": text.PMI_SQL,
        "sample_per_group": sampling.SAMPLE_PER_GROUP_SQL,
        "kmeans_lloyd_step": similarity.KMEANS_LLOYD_SQL,
        "es_state_projection": eventstore.ES_STATE_PROJECTION_SQL,
        "text_inverted_index": text.INVERTED_INDEX_SQL,
    }

"""Physical-plan invariants: the scale properties PLANS.md documents,
asserted so regressions fail CI instead of silently shipping a bad
plan. Each check reads the optimized physical plan (explain only —
nothing executes) at sf0.001.

These encode the 100 TB design rules:
* selective predicates reach the parquet scan (PushedFilters);
* projections prune the read schema;
* dimension joins broadcast, never shuffle;
* top-k is TakeOrderedAndProject, never a global sort;
* no accidental cartesian products in the TPC-H shapes;
* pandas stages ride a single group-key shuffle.
"""

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QUERIES = entrymod.queries()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    assert "l_comment" not in plan  # schema pruned to used columns
    # partial+final hash aggregation (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_and_topk(spark):
    plan = plan_of(spark, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort
    assert "CartesianProduct" not in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # filter pushed


def test_q5_dimension_joins_broadcast(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 2  # region+nation never shuffle
    assert "CartesianProduct" not in plan


def test_q6_scan_minimal(spark):
    plan = plan_of(spark, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan  # range pushed
    # schema pruned: the unused string columns never leave the scan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema and "l_extendedprice" in read_schema
    # only one table, no joins at all
    assert "Join" not in plan


def test_q9_all_dims_broadcast(spark):
    plan = plan_of(spark, "q9_product_profit")
    # part, supplier, nation each broadcast (tree section lists each once)
    tree = plan.split("\n\n")[0]
    assert tree.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    assert "StringContains(p_name,gear)" in plan  # pushed to part scan


def test_q21_single_window_shuffle(spark):
    """The decorrelated NOT-EXISTS: both window passes must share one
    orderkey exchange — the whole point of the rewrite."""
    plan = plan_of(spark, "q21_waiting_suppliers")
    assert plan.count("Window") >= 2
    assert "CartesianProduct" not in plan
    # lineitem is never self-joined three times (the naive form)
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 6


def test_topk_global_is_take_ordered(spark):
    plan = plan_of(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan
    # formatted mode spells exchange args as 'rangepartitioning(' in
    # the details section — the adjacent 'Exchange rangepartitioning'
    # literal never occurs, so assert on the args form
    assert "rangepartitioning(" not in plan  # no global sort


def test_band_join_is_hash_not_nlj(spark):
    plan = plan_of(spark, "join_band_inequality")
    assert "NestedLoop" not in plan
    assert "HashJoin" in plan


def test_ann_brute_force_no_shuffle_before_topk(spark):
    """Candidates must not shuffle: broadcast query vector + per-task
    heaps, only survivors move."""
    plan = plan_of(spark, "ann_brute_force")
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(" not in plan and "rangepartitioning(" not in plan


def test_grouped_decile_single_group_shuffle(spark):
    plan = plan_of(spark, "pandas_grouped_decile")
    assert "FlatMapGroupsInPandas" in plan
    # exactly one hash shuffle (the group key); the only other
    # exchange is the presentation-order range sort
    assert plan.count("hashpartitioning(event_type") == 1
    assert plan.split("\n\n")[0].count("Exchange") == 2


def test_dedup_exact_one_shuffle(spark):
    plan = plan_of(spark, "dedup_exact")
    # one hash shuffle for the fingerprint aggregate + the output sort
    assert plan.count("hashpartitioning(fp") == 1
    assert plan.split("\n\n")[0].count("Exchange") == 2


@pytest.mark.parametrize(
    "name",
    [
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q7_nation_trade_volume",
        "q10_returned_items",
        "q18_large_volume_customers",
    ],
)
def test_no_cartesian_in_multijoins(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_profile_columns_single_scan(spark):
    # the one-pass claim: 24 aggregate expressions over ONE scan of
    # orders, never six per-column scans
    plan = plan_of(spark, "profile_columns_orders")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    # multi-count_distinct rewrites to Expand + SortAggregate; either
    # aggregate flavor must still partial+final combine
    assert tree.count("HashAggregate") + tree.count("SortAggregate") >= 2


def test_zorder_key_stays_in_scan_projection(spark):
    # the Morton key is pure JVM bit algebra computed in the scan
    # projection: one scan, no join, no Python stage
    plan = plan_of(spark, "zorder_cluster_key")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert "FlatMapGroupsInPandas" not in plan and "BatchEvalPython" not in plan
    assert tree.count("HashAggregate") >= 2


def test_incremental_merge_two_level_combine(spark):
    # both the day-partial and month-merge levels map-side combine
    plan = plan_of(spark, "agg_incremental_merge")
    tree = plan.split("\n\n")[0]
    assert tree.count("HashAggregate") >= 4
    assert tree.count("Scan parquet") == 1


def test_heavy_hitters_counters_broadcast(spark):
    # the 256-cell sketch joins back to candidates as a broadcast,
    # and nothing degenerates to a cartesian pair join
    plan = plan_of(spark, "tokens_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_textrank_iterations_no_cartesian(spark):
    # 5 unrolled iterations stay equi-joins on the token key; the
    # only nested-loop is the broadcast of the 1-row node count
    plan = plan_of(spark, "textrank_keywords")
    assert "CartesianProduct" not in plan


def test_rfm_window_over_preaggregated_dim(spark):
    # the ntile windows run over the customer dim produced by a
    # map-side-combined groupBy of the fact table, in one scan
    plan = plan_of(spark, "rfm_segments")
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
    assert "Window" in plan and tree.count("HashAggregate") >= 2


def test_bloom_probe_joins_are_broadcast(spark):
    # the 1024-word filter reaches the probe side as broadcast-hash
    # joins; nothing shuffles the fact table before the filter
    plan = plan_of(spark, "bloom_semi_join_reduction")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_attribution_no_cartesian(spark):
    # the tolerance-window as-of join stays keyed on user_id
    plan = plan_of(spark, "attribution_last_touch")
    assert "CartesianProduct" not in plan


def test_pq_codes_single_vector_scan(spark):
    # encoding cross-joins only the broadcast 8-centroid side; the
    # corpus vectors are scanned, never shuffled pairwise
    plan = plan_of(spark, "ann_pq_adc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the O(8) centroid side


@pytest.mark.parametrize(
    "name",
    [
        "dsir_importance_weights",
        "dedup_containment",
        "dedup_cluster_density",
        "pair_mining_contrastive",
        "join_cardinality_estimate",
        "minhash_jaccard_audit",
        "bpe_apply_compression",
        "token_pmi_collocations",
        "session_path_analysis",
    ],
)
def test_new_ops_no_cartesian(spark, name):
    # every pair/feature join in the round-2 additions is keyed
    # (bucket, shingle, band, stride partner, sketch cell) — a
    # CartesianProduct appearing in any of them means the blocking
    # strategy silently broke
    assert "CartesianProduct" not in plan_of(spark, name)


def test_dsir_feature_tables_broadcast(spark):
    # the 256-bucket log-ratio table joins back to the corpus as a
    # broadcast; corpus-side data never shuffles for the join
    plan = plan_of(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan


def test_quantile_bins_pruned_scan(spark):
    # exact ntile needs only the 3 ORDER BY columns off disk. Since
    # the round-9 distributed rewrite the final plan's leaf is the
    # eagerly-materialized range-partitioned checkpoint (no parquet
    # ReadSchema in THIS explain) — the checkpointed schema itself is
    # the pruning evidence: exactly the 3 order columns + _pid, and
    # none of lineitem's other 13 columns survive anywhere in the plan
    plan = plan_of(spark, "quantile_bins_price")
    assert "l_extendedprice" in plan and "_pid" in plan
    assert "l_shipdate" not in plan and "l_returnflag" not in plan
    assert "Window" in plan


def test_session_paths_reuse_user_partitioning(spark):
    # sessionization + per-session ranking ride windows over ONE
    # user_id-rooted exchange (the session window only re-sorts, never
    # re-shuffles); the path rollup is the only other exchange. The
    # rn<=3 filter is pushed into the window as a WindowGroupLimit, so
    # per-session ranking keeps 3 rows per group instead of ranking
    # every event
    plan = plan_of(spark, "session_path_analysis")
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
    assert plan.count("+- Exchange") <= 3


def test_join_cardinality_sketch_combines_mapside(spark):
    # per-key counts and the 256-cell sketch both partial-aggregate
    # before their shuffles
    plan = plan_of(spark, "join_cardinality_estimate")
    assert plan.count("HashAggregate") >= 4


@pytest.mark.parametrize(
    "name",
    [
        "kmeans_lloyd_step",
        "embedding_pca_power_iteration",
        "linear_probe_gd",
        "ann_range_search",
        "dedup_keeper_selection",
        "feature_store_pit_join",
        "rolling_distinct_users",
        "graph_degree_distribution",
        "multimodal_content_dedup",
        "incremental_sessionize",
    ],
)
def test_session3_ops_no_cartesian(spark, name):
    # the ML-iteration chains ride broadcast one-row parameter frames,
    # the graph/PIT/dedup ops are keyed joins — a CartesianProduct in
    # any of them means a blocking key or broadcast hint vanished
    assert "CartesianProduct" not in plan_of(spark, name)


def test_kmeans_update_single_wide_aggregate(spark):
    # the Lloyd update must stay ONE hash aggregate over 64 avg
    # columns (map-side partials) — an Expand/explode in the plan
    # would mean rows widen 64x before the shuffle
    plan = plan_of(spark, "kmeans_lloyd_step")
    assert "Expand" not in plan
    # centroid side broadcast into the assignment
    assert "Broadcast" in plan


def test_linear_probe_params_broadcast_each_step(spark):
    # three GD steps + the loss pass: four broadcasts of the one-row
    # parameter frame — none of them may fall back to a shuffle join
    plan = plan_of(spark, "linear_probe_gd")
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastExchange") >= 4
    assert "SortMergeJoin" not in plan


def test_pit_join_single_user_shuffle(spark):
    # the merge-form PIT join: snapshots and purchases union into ONE
    # window over the user key — no join node at all between the fact
    # and feature sides, which is the point of the formulation
    plan = plan_of(spark, "feature_store_pit_join")
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "Window" in plan


@pytest.mark.parametrize(
    "name",
    [
        "watermark_lateness_audit",
        "reconciliation_report",
        "timeseries_decompose_daily",
        "feature_drift_psi",
        "funnel_time_to_convert",
        "customer_order_cadence",
        "lsh_parameter_sweep",
        "shuffle_partition_advisor",
        "ann_recall_curve",
        "session_window_native",
        "ab_test_analysis",
        "data_contract_validation",
        "mad_outlier_detection",
        "fulfillment_latency",
        "open_orders_timeline",
        "sql_recursive_hierarchy",
        "variant_json_extract",
    ],
)
def test_session3_late_ops_no_cartesian(spark, name):
    # every join in these is keyed (event id, order key, band key,
    # day grid, type+arm) or a one-row broadcast — a CartesianProduct
    # means a key or broadcast hint was dropped
    assert "CartesianProduct" not in plan_of(spark, name)


def test_contract_gate_single_pass_per_table(spark):
    # all rules for a table fold into ONE aggregate: exactly two scan
    # nodes (orders + events) in the whole plan — count the per-node
    # detail blocks, not tree mentions
    plan = plan_of(spark, "data_contract_validation")
    assert plan.count("Location: InMemoryFileIndex") == 2


def test_decomposition_runs_on_preaggregate(spark):
    # the daily pre-aggregate is checkpointed, so the raw log never
    # appears in the decomposition plan — both consumers read the
    # materialized O(types x days) table
    plan = plan_of(spark, "timeseries_decompose_daily")
    assert plan.count("Location: InMemoryFileIndex") == 0
    assert "ExistingRDD" in plan


# --- plan_lint rule self-tests (tools/plan_lint.py) -----------------
# The linter gates all 192 catalog entries per round; these pin that
# its two newest rules actually fire on bad plans (not vacuously
# green) and stay quiet on the good twins.

_LINT_BAD_UNPUSHED = """== Physical Plan ==
* Project (4)
+- * Filter (3)
   +- * ColumnarToRow (2)
      +- Scan parquet  (1)


(1) Scan parquet 
Output [2]: [l_orderkey#0L, l_quantity#4]
Batched: true
PushedFilters: []
ReadSchema: struct<l_orderkey:bigint,l_quantity:double>

(2) ColumnarToRow [codegen id : 1]
Input [2]: [l_orderkey#0L, l_quantity#4]

(3) Filter [codegen id : 1]
Input [2]: [l_orderkey#0L, l_quantity#4]
Condition : (isnotnull(l_quantity#4) AND (l_quantity#4 > 40.0))

(4) Project [codegen id : 1]
Output [1]: [l_orderkey#0L]
"""


def _lint_mods():
    import tools.plan_lint as pl

    return pl


def test_lint_unpushed_filter_fires_and_stays_quiet():
    pl = _lint_mods()

    def hit(plan):
        return pl._unpushed_selective_scan(pl._parse_tree(plan), pl._node_details(plan))

    assert hit(_LINT_BAD_UNPUSHED)
    # col-col comparison is not pushable: no finding
    assert not hit(_LINT_BAD_UNPUSHED.replace("(l_quantity#4 > 40.0)", "(l_quantity#4 > l_orderkey#0L)"))
    # function-wrapped predicate is not pushable: no finding
    assert not hit(_LINT_BAD_UNPUSHED.replace("(l_quantity#4 > 40.0)", "(size(toks#4) > 5)"))
    # scan that pushed something: no finding
    assert not hit(_LINT_BAD_UNPUSHED.replace("PushedFilters: []", "PushedFilters: [IsNotNull(l_quantity)]"))


def test_lint_smj_over_global_agg_fires_on_real_plan(spark):
    import pyspark.sql.functions as F

    pl = _lint_mods()

    def hit(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        return pl._smj_over_global_agg(pl._parse_tree(plan), pl._node_details(plan))

    li = spark.read.parquet(SF_DIR + "/lineitem.parquet")
    tot = li.agg(F.max("l_orderkey").alias("l_orderkey"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        assert hit(li.join(tot, "l_orderkey"))
        # the fixed form — explicit broadcast — is clean even with
        # auto-broadcast off
        assert not hit(li.join(F.broadcast(tot), "l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)


@pytest.mark.parametrize(
    "name",
    [
        "dedup_normalized_exact",
        "kmv_sketch_merge",
        "cms_sketch_merge",
        "dp_noisy_counts",
        "score_calibration_ece",
        "hnsw_layer_assign",
        "gazetteer_entity_match",
        "skipgram_sampling_plan",
        "pii_scan_documents",
        "hnsw_two_layer_search",
        "kcenter_coreset_seed",
        "cdc_chunk_boundaries",
        "rag_context_assembly",
        "snapshot_diff_events",
        "consistent_hash_rebalance",
        "url_canonicalize_dedup",
        "kneser_ney_bigram",
        "es_category_projection",
        "bloom_fpr_audit",
        "forget_cascade_audit",
        "gmm_em_step",
        "kaplan_meier_conversion",
        "quantile_normalize_quality",
        "cusum_changepoint",
        "ips_offline_eval",
        "plsa_em_step",
        "simpsons_paradox_audit",
        "cuped_adjustment",
        "entity_resolution_pipeline",
        "speculative_draft_acceptance",
        "k_anonymity_audit",
        "srm_check",
        "rolling_origin_backtest",
        "bradley_terry_step",
        "benford_audit",
        "retrieval_ndcg_audit",
        "diff_in_diff",
        "encoding_advisor",
        "kmv_set_operations",
        "ks_two_sample",
        "adstock_transform",
        "feature_hashing_embed",
        "fellegi_sunter_em_step",
        "geo_grid_neighbor_join",
        "control_chart_xbar",
        "rec_hitrate_eval",
        "watermark_greenlist_detect",
        "canary_leakage_audit",
        "raking_ipf_step",
        "hill_tail_index",
        "shapley_attribution_3",
        "huber_irls_step",
        "covariate_balance_smd",
        "quantile_treatment_effect",
        "conformal_interval_coverage",
        "judge_agreement_kappa",
        "process_conformance_audit",
        "vptree_partition_audit",
        "mutual_information_screen",
        "boosting_stump_step",
        "prefix_cache_savings",
        "retention_ttl_plan",
        "vocab_oov_audit",
        "uncertainty_margin_sample",
        "durbin_watson_audit",
        "ann_ivfpq_search",
        "mlm_masking_plan",
        "eval_ngram_coverage",
        "knn_graph_build",
        "domain_cap_sampling",
        "hubness_audit",
        "ivf_cell_balance_audit",
        "label_propagation_step",
        "source_data_card",
        "quantizer_migration_matrix",
    ],
)
def test_round4_ops_no_cartesian(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_ivfpq_lut_and_centroids_broadcast(spark):
    """Round 12: the whole IVFPQ cascade up to the shortlist is
    per-row expressions against ONE broadcast state row (centroid
    array + probe list + ADC LUT maps) — no shuffle join anywhere,
    no row_number window for the assignment, and the final top-k is
    TakeOrderedAndProject. (Before round 12 this asserted >= 4
    broadcast LUT joins; those joins are now element_at lookups.)"""
    plan = plan_of(spark, "ann_ivfpq_search")
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the one-row search state arrives via a broadcast nested loop
    assert "BroadcastNestedLoopJoin" in plan
    # the corpus side never shuffles: assignment/codes are expressions
    assert "Window" not in plan


def test_normalized_dedup_keyed_shuffles_only(spark):
    """Digest dedup shuffles only on keys: the (fp, raw_fp) partial +
    fp merge exchanges of the countDistinct rewrite plus the final
    range sort — never a single-partition funnel; map-side partials
    present."""
    plan = plan_of(spark, "dedup_normalized_exact")
    body = plan.split("== Physical Plan ==")[1]
    assert body.count("Exchange ") <= 3, plan
    assert "SinglePartition" not in plan
    assert plan.count("HashAggregate") >= 2


def test_mlm_masking_single_scan_single_agg(spark):
    """One corpus scan, one (source) aggregate — nothing else
    shuffles; the per-token hashing stays in the projection."""
    import re

    plan = plan_of(spark, "mlm_masking_plan")
    body = plan.split("== Physical Plan ==")[1]
    # detail headers only — the tree section repeats each node name
    assert len(re.findall(r"^\(\d+\) Scan parquet", body, re.M)) == 1
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_lint_smj_rule_ignores_broadcast_global_agg_downstream(spark):
    """Refined rule: an SMJ whose sides merely CONTAIN an already-
    broadcast global aggregate deeper in the pipeline (the scale-
    adaptive `b` pattern) must NOT be flagged."""
    import pyspark.sql.functions as F

    pl = _lint_mods()

    def hit(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        return pl._smj_over_global_agg(pl._parse_tree(plan), pl._node_details(plan))

    li = spark.read.parquet(SF_DIR + "/lineitem.parquet").select("l_orderkey", "l_quantity")
    tot = li.agg(F.max("l_quantity").alias("qmax"))
    # enrich both sides with the broadcast 1-row aggregate, then
    # self-join on the key — the join itself is legitimate
    enriched = li.crossJoin(F.broadcast(tot)).withColumn(
        "qn", F.col("l_quantity") / F.col("qmax")
    ).select("l_orderkey", "qn")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        assert not hit(enriched.join(enriched.withColumnRenamed("qn", "qn2"), "l_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)

"""Pins over the committed scale-probe records (no Spark needed).

VERDICT r8 items 1/6: the x64 replica sweep must keep covering the
hot entries (48+ after round 9) with every ratio sub-linear, and the
five most expensive entries need a second doubling (x128) whose
ratio growth stays near-linear — a single x64 point fits a
quadratic-with-small-constant as easily as a linear, so the committed
two-doubling record is the evidence that separates them. These tests
fail loudly if a future probe run regresses the record (a rewrite
going super-linear, an entry silently dropped from the sweep).
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The entries every x64 sweep must keep covering: the top absolute
# walls plus the iterative/BSP shapes where past sweeps found the
# real scale bugs (compounding checkpoint stats, diameter-bound CC,
# unbounded candidate generation).
_HOT_X64 = {
    "rec_hitrate_eval",
    "entity_resolution_pipeline",
    "basket_lift_rules",
    "graph_degree_assortativity",
    "graph_triangle_count",
    "dedup_keeper_selection",
    "dedup_connected_components",
    "kmeans_lloyd_step",
    "source_overlap_matrix",
    "kcenter_coreset_seed",
    "textrank_keywords",
}

# Two-doubling set (VERDICT r8 item 6, extended to the full next tier
# by VERDICT r9 item 4) and the allowed wall growth between the x64
# and x128 points: linear scaling doubles the wall, so <= 2.2
# tolerates 10% super-linear drift and nothing worse. Round 10 pinned
# the metric to ONE definition (VERDICT r9 item 2): doubling_vs_x64 =
# lower-median(x128 walls) / lower-median(x64 walls) from INTERLEAVED
# same-session reps, carried in the x128 record itself — never a
# cross-session ratio quotient (sf0.1 bases re-measure with up to
# ±70% session noise, which is exactly how SURVEY r9's pagerank 1.80
# diverged from the artifacts' 2.37).
_TWO_DOUBLING = {
    "rec_hitrate_eval",
    "entity_resolution_pipeline",
    "basket_lift_rules",
    "graph_degree_assortativity",
    "graph_triangle_count",
    "pagerank_step",
    "fuzzy_match_parts",
    "dedup_simhash_band",
    "dedup_embedding_cosine",
    "dedup_ngram_jaccard",
    "minhash_jaccard_audit",
    "dedup_containment",
    "lsh_band_auc",
    "es_hash_chain",
    "minhash_bbit_estimate",
    "text_duplicate_spans",
    "basket_item_affinity",
    "quantile_bins_price",
    # round-10 batch-6/7 widening: CC family + the next tier down
    "dedup_keeper_selection",
    "dedup_connected_components",
    "dedup_lsh_verified",
    "dedup_semantic",
    "dedup_incremental",
    "feature_hashing_embed",
    "ks_two_sample",
    "lang_trigram_distance",
    "text_char_entropy",
    "bpe_learn_merges",
}
_DOUBLING_MAX = 2.2
# soft 2.2 bound applies only when the x64 wall is >= this (below it,
# fixed per-job overhead is a double-digit share of the wall and 2.2
# has no discriminating power); a genuine quadratic still shows >= the
# hard bound at any wall and always fails.
_MIN_X64_SEC = 8.0
_DOUBLING_HARD = 3.0


def _load(name):
    with open(os.path.join(_REPO, name)) as f:
        return json.load(f)


def test_xl64_coverage_and_sublinearity():
    rec = _load("SCALE_SLOPE_XL64.json")
    entries = rec["entries"]
    assert rec["replicas"] == 64
    assert len(entries) >= 48, f"x64 sweep shrank to {len(entries)} entries"
    assert rec["risks"] == [], f"x64 sweep recorded risks: {rec['risks']}"
    missing = _HOT_X64 - set(entries)
    assert not missing, f"hot entries dropped from the x64 sweep: {sorted(missing)}"
    over = {
        k: v["ratio"]
        for k, v in entries.items()
        if v.get("ratio") is not None
        and v["sf0_1_s"] >= 0.5  # sub-second bases are all fixed overhead
        and v["ratio"] > 64
    }
    assert not over, f"super-linear on 64x data: {over}"


def test_xl128_two_doubling_near_linear():
    rec = _load("SCALE_SLOPE_XL128.json")
    x128 = rec["entries"]
    assert rec.get("flag_doubling") == _DOUBLING_MAX
    assert len(x128) >= 28, f"x128 record shrank to {len(x128)} entries"
    assert rec["risks"] == [], f"x128 record carries risks: {rec['risks']}"
    missing = _TWO_DOUBLING - set(x128)
    assert not missing, f"entries dropped from the x128 record: {sorted(missing)}"
    for name, v in sorted(x128.items()):
        assert "doubling_vs_x64" in v, (
            f"{name} lacks the pinned doubling_vs_x64 field (same-session "
            "interleaved x64/x128 walls)"
        )
        # workload-normalized doubling — ONE definition, imported from
        # the probe tool itself (ADVICE r10 medium: a copy of the
        # formula here let tool and gate diverge; now the tool both
        # measures the workload fields and flags risks with the same
        # effective_doubling the gate applies)
        from tools.scale_xl import effective_doubling

        d = effective_doubling(v)
        assert d <= _DOUBLING_HARD, (
            f"{name}: {d}x wall growth between x64 and x128 — quadratic-"
            f"shaped at any wall size"
        )
        if v.get("xl64_s", 0) < _MIN_X64_SEC:
            continue  # overhead-dominated walls: hard bound only
        assert d <= _DOUBLING_MAX, (
            f"{name}: wall grew {d}x between x64 ({v.get('xl64_s')}s) and "
            f"x128 ({v['xl128_s']}s) — worse than the {_DOUBLING_MAX} "
            "near-linear bound"
        )


# Third-doubling tier (VERDICT r10 item 4): the entries whose ×64
# walls sat under the 8 s soft bound — where the 2.2 rule could not
# discriminate — but whose ×128 walls clear it. Probed ×128/×256
# interleaved; same flag rule, one doubling further out. The ×256
# probe CAUGHT three genuinely super-linear plans on its first run
# (quantile_bins_price 3.04 and bloom_semi_join_reduction 3.26 —
# both fixed-width in-task sorts that spill, both now bytes-scaled —
# and lang_trigram_distance's cold-rep spread), validating the tier
# choice.
_THIRD_DOUBLING = {
    "dedup_semantic",
    "lang_trigram_distance",
    "prf_query_expansion",
    "quantile_bins_price",
    "bayesian_bootstrap_ci",
    "rfm_segments",
    "embedding_quantize",
    "bloom_semi_join_reduction",
    "dedup_connected_components",
    "entity_resolution_pipeline",
    # round-12 extension (VERDICT r11 item 2): the heavy ~2.0-2.1
    # x128 tier that never had a third doubling, plus the wide-lane /
    # candidate-bounded entries re-confirmed one doubling further out
    "minhash_jaccard_audit",
    "lsh_band_auc",
    "minhash_bbit_estimate",
    "text_char_entropy",
    "dedup_embedding_cosine",
    "dedup_simhash_band",
    "dedup_ngram_jaccard",
    "text_duplicate_spans",
    "dedup_lsh_verified",
    "lsh_precision_recall",
}


def test_xl256_third_doubling_near_linear():
    rec = _load("SCALE_SLOPE_XL256.json")
    x256 = rec["entries"]
    assert rec.get("flag_doubling") == _DOUBLING_MAX
    assert rec["risks"] == [], f"x256 record carries risks: {rec['risks']}"
    missing = _THIRD_DOUBLING - set(x256)
    assert not missing, f"entries dropped from the x256 record: {sorted(missing)}"
    from tools.scale_xl import effective_doubling

    for name, v in sorted(x256.items()):
        assert "doubling_vs_x128" in v, (
            f"{name} lacks the pinned doubling_vs_x128 field (same-session "
            "interleaved x128/x256 walls)"
        )
        d = effective_doubling(v)
        assert d <= _DOUBLING_HARD, (
            f"{name}: {d}x wall growth between x128 and x256 — quadratic-"
            f"shaped at any wall size"
        )
        if v.get("xl128_s", 0) < _MIN_X64_SEC:
            continue  # overhead-dominated walls: hard bound only
        assert d <= _DOUBLING_MAX, (
            f"{name}: wall grew {d}x between x128 ({v.get('xl128_s')}s) and "
            f"x256 ({v['xl256_s']}s) — worse than the {_DOUBLING_MAX} "
            "near-linear bound"
        )

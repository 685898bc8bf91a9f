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

# Two-doubling set (VERDICT r8 item 6) and the allowed wall growth
# between the x64 and x128 points: linear scaling doubles the wall,
# so <= 2.2 tolerates 10% super-linear drift and nothing worse. The
# comparison is xl128_s / xl64_s (NOT the ratio quotient): the sf0.1
# bases re-measure with up to ±70% session noise (rec_hitrate_eval's
# base spanned 4.99-8.44 s across probe runs), which corrupts the
# ratio quotient, while the multi-minute xl walls are stable — and
# for same-measurement bases the two formulas are identical anyway.
_TWO_DOUBLING = {
    "rec_hitrate_eval",
    "entity_resolution_pipeline",
    "basket_lift_rules",
    "graph_degree_assortativity",
    "graph_triangle_count",
}
_DOUBLING_MAX = 2.2


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
    x64 = _load("SCALE_SLOPE_XL64.json")["entries"]
    x128 = _load("SCALE_SLOPE_XL128.json")["entries"]
    for name in sorted(_TWO_DOUBLING):
        assert name in x128, f"{name} missing from the x128 record"
        w64, w128 = x64[name]["xl64_s"], x128[name]["xl128_s"]
        growth = w128 / w64
        assert growth <= _DOUBLING_MAX, (
            f"{name}: wall grew {growth:.2f}x between x64 ({w64}s) and "
            f"x128 ({w128}s) — worse than the {_DOUBLING_MAX} near-linear bound"
        )

"""Regression-guard unit tests for bench.py (no Spark session needed).

VERDICT r7 item 2: the round-7 guard went blind because BENCH_r06's
wire line spilled its per-query map (``{"_spilled_to": ...}``) and the
old loader accepted that pointer dict as a truthy query map — the
shared set came out empty and a 1.47x suite slowdown passed unflagged.
These tests pin the fixed behavior: a spilled previous round is
resolved from its per-round detail archive and a synthetic 1.5x
slowdown against it IS flagged.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
_spec = importlib.util.spec_from_file_location("bench", _BENCH_PATH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _write(dirpath, name, payload):
    with open(os.path.join(dirpath, name), "w") as f:
        json.dump(payload, f)


@pytest.fixture
def spilled_round(tmp_path):
    """A previous round whose wire line spilled, with the full map in
    the per-round archive — the exact shape that blinded round 7."""
    full = {"q1_pricing_summary": 2.0, "dedup_minhash": 3.0, "rec_hitrate_eval": 7.0}
    _write(
        tmp_path,
        "BENCH_r07.json",
        {
            "parsed": {
                "metric": "headline_suite_wall_sec",
                "value": 12.0,
                "unit": "sec",
                "sf": 0.1,
                "queries": {"_spilled_to": "BENCH_DETAIL_r07.json"},
            }
        },
    )
    _write(tmp_path, "BENCH_DETAIL_r07.json", {"queries": full, "sf": 0.1})
    return str(tmp_path), full


def test_spilled_prev_is_resolved_from_archive(spilled_round):
    here, full = spilled_round
    # round 7 predates the wire "protocol" field -> legacy map says median3
    prev = bench._latest_prev_bench(here, 0.1, "median3")
    assert prev is not None
    assert prev["queries"] == full


def test_guard_flags_synthetic_slowdown_against_spilled_prev(spilled_round):
    here, full = spilled_round
    prev = bench._latest_prev_bench(here, 0.1, "median3")
    slower = {n: t * 1.6 for n, t in full.items()}
    regressions = bench._regression_check(slower, prev)
    # both the shared-suite total (1.6x > 1.2x budget) and every
    # >=1s per-query wall (1.6x > 1.5x budget) must fire
    assert any("shared-suite total" in r for r in regressions)
    assert any(r.startswith("rec_hitrate_eval") for r in regressions)


def test_guard_quiet_when_within_budget(spilled_round):
    here, full = spilled_round
    prev = bench._latest_prev_bench(here, 0.1, "median3")
    same = {n: t * 1.05 for n, t in full.items()}
    assert bench._regression_check(same, prev) == []


def test_protocol_mismatch_skips_round(spilled_round):
    here, _ = spilled_round
    # a single-shot current run must not compare against a median3 round
    assert bench._latest_prev_bench(here, 0.1, "single") is None


def test_unresolvable_spill_falls_back_to_summary_keys(tmp_path):
    # wire line carried the 5 slowest beside the pointer; if the archive
    # is gone the guard still compares against that partial map instead
    # of going blind
    _write(
        tmp_path,
        "BENCH_r09.json",
        {
            "parsed": {
                "value": 9.0,
                "sf": 0.1,
                "protocol": "median3",
                "queries": {"_spilled_to": "BENCH_DETAIL_r09.json", "rec_hitrate_eval": 7.0},
            }
        },
    )
    prev = bench._latest_prev_bench(str(tmp_path), 0.1, "median3")
    assert prev is not None
    assert prev["queries"] == {"rec_hitrate_eval": 7.0}


def test_spilled_only_query_regression_is_flagged(tmp_path):
    """VERDICT r8 item 7: the wire line carries only the 5 slowest
    queries beside the ``_spilled_to`` pointer. The guard must compare
    the FULL per-query map from the detail archive — a 1.6x slowdown
    on a query that is NOT among the inline five (here ``join_semi``,
    0.8s → inline map carries only the heavy five) must still fire."""
    inline_five = {
        "rec_hitrate_eval": 7.0,
        "label_propagation_step": 5.0,
        "linear_probe_gd": 4.0,
        "lsh_band_auc": 3.5,
        "knn_graph_build": 3.0,
    }
    full = {**inline_five, "join_semi": 1.4, "q1_pricing_summary": 2.0}
    _write(
        tmp_path,
        "BENCH_r08.json",
        {
            "parsed": {
                "value": 26.0,
                "sf": 0.1,
                "protocol": "median3",
                "queries": {"_spilled_to": "BENCH_DETAIL_r08.json", **inline_five},
            }
        },
    )
    _write(tmp_path, "BENCH_DETAIL_r08.json", {"queries": full, "sf": 0.1})
    prev = bench._latest_prev_bench(str(tmp_path), 0.1, "median3")
    assert prev["queries"] == full, "guard must see the full archived map"
    timings = dict(full)
    timings["join_semi"] = full["join_semi"] * 1.6  # spilled-only query regresses
    regressions = bench._regression_check(timings, prev)
    assert any(r.startswith("join_semi") for r in regressions), regressions


def test_parsed_null_round_skipped(tmp_path):
    _write(tmp_path, "BENCH_r03.json", {"parsed": None, "sf": 0.1})
    assert bench._latest_prev_bench(str(tmp_path), 0.1, "single") is None


def test_next_round_is_latest_plus_one(tmp_path):
    _write(tmp_path, "BENCH_r07.json", {"parsed": None})
    _write(tmp_path, "BENCH_r02.json", {"parsed": None})
    assert bench._next_round(str(tmp_path)) == 8


def test_newest_comparable_round_wins(tmp_path):
    _write(
        tmp_path,
        "BENCH_r05.json",
        {"parsed": {"value": 5.0, "sf": 0.1, "queries": {"a": 1.0}}},
    )
    _write(
        tmp_path,
        "BENCH_r06.json",
        {"parsed": {"value": 6.0, "sf": 0.1, "queries": {"a": 2.0}}},
    )
    prev = bench._latest_prev_bench(str(tmp_path), 0.1, "single")
    assert prev["value"] == 6.0


def test_no_query_module_exceeds_line_budget():
    """VERDICT r7 item 6 done-criterion: no source file >4,000 lines.

    advanced.py (9.4k) was split in round 8 into stats/timeseries/
    lake/recsys and text.py (4.7k) shed its LM/tokenizer theme into
    textlm.py; this pins the budget so future widening splits instead
    of re-accreting a monolith.
    """
    root = os.path.join(os.path.dirname(_BENCH_PATH), "hematite_spark")
    over = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if fn.endswith(".py"):
                path = os.path.join(dirpath, fn)
                with open(path) as f:
                    n = sum(1 for _ in f)
                if n > 4000:
                    over.append((os.path.relpath(path, root), n))
    assert not over, f"files over the 4,000-line budget: {over}"


def test_cpu_stat_and_steal_pct_telemetry():
    """VERDICT r9 item 6: per-rep host telemetry. _cpu_stat reads the
    aggregate cpu line; _steal_pct is a windowed percentage that
    degrades to None instead of raising on missing samples."""
    s = bench._cpu_stat()
    assert s is not None and len(s) == 2  # Linux harness
    steal, total = s
    assert 0 <= steal <= total
    # synthetic window: 3 steal jiffies out of 200 total = 1.5%
    assert bench._steal_pct((10, 1000), (13, 1200)) == 1.5
    assert bench._steal_pct(None, (13, 1200)) is None
    assert bench._steal_pct((10, 1000), None) is None
    assert bench._steal_pct((10, 1000), (10, 1000)) is None  # zero window


def test_bench_detail_r06_archive_resolves_the_dangling_spill():
    """ADVICE r9: BENCH_r06's wire line points at the retired
    unversioned BENCH_DETAIL.json; the retro-archived per-round copy
    must resolve it so round-6 history stays recoverable."""
    here = os.path.dirname(_BENCH_PATH)
    data = {"queries": {"_spilled_to": "BENCH_DETAIL.json"}}
    resolved = bench._resolve_queries(data, here, 6)
    assert "_spilled_to" not in resolved
    assert len(resolved) > 40  # the full 46-query round-6 map

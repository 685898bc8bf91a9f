"""Benchmark harness: runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count)
after a warm-up pass of the session. `value` is total wall time over
the suite — the driver compares this against BASELINE.md (2× budget).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hematite_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline suite: one per operator family — scan+agg, multi-join,
# subquery, window, event-store analogue, text, dedup (minhash + CC
# clustering), vector search, sampling.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q18_large_volume_customers",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "grouping_sets_revenue",
    "window_top_orders_per_customer",
    "sessionize_events",
    "es_stream_metadata",
    "text_quality_score",
    "dedup_minhash",
    "dedup_connected_components",
    "ann_brute_force",
    "ann_ivf_search",
    "text_tfidf",
    "sample_stratified",
    "pack_sequences",
    "dedup_semantic",
    "tokens_heavy_hitters",
    "zorder_cluster_key",
    "rfm_segments",
    "textrank_keywords",
    "dsir_importance_weights",
    "dedup_containment",
    "bpe_apply_compression",
    "join_cardinality_estimate",
    "kmeans_lloyd_step",
    "linear_probe_gd",
    "feature_store_pit_join",
    "rolling_distinct_users",
    "dedup_keeper_selection",
    "sql_recursive_hierarchy",
]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark("hematite_bench")
    qs = entrymod.queries()

    # warm up the JVM + file listing so the first timed query isn't
    # paying session bootstrap costs; also exercise the shuffle +
    # localCheckpoint machinery once, since the iterative operators
    # (textrank, connected components) otherwise pay its first-use
    # JIT cost inside their timing window
    spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.groupBy("lang").count().localCheckpoint().count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # noop write materializes EVERY output column — count() would
        # let Catalyst prune projection-only work (incl. pandas UDFs)
        # and time a bare scan instead of the operator
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    # Reference-SLO micro-latencies (BASELINE.md: k6 p95 < 50 ms for
    # single-event append and positional point read). Driver-side OLTP
    # path — no Spark job launch, by design (store/store.py).
    import statistics
    import tempfile

    from hematite_spark.store import EventStore

    store = EventStore(spark, tempfile.mkdtemp(prefix="bench_store_"))
    append_ms, read_ms = [], []
    for i in range(100):
        ev = {"specversion": "1.0", "id": f"b-{i}", "source": "bench", "type": "t", "data": {"i": i}}
        t0 = time.perf_counter()
        store.append("u", "s", ev)
        append_ms.append((time.perf_counter() - t0) * 1000)
    store.compact_stream("u", "s")
    for i in range(100):
        t0 = time.perf_counter()
        store.get_event("u", "s", i)
        read_ms.append((time.perf_counter() - t0) * 1000)
    p95 = lambda xs: round(statistics.quantiles(xs, n=20)[18], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_suite_wall_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "append_p95_ms": p95(append_ms),
        "point_read_p95_ms": p95(read_ms),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # regression guard: compare against the most recent BENCH_r{N}.json
    # (same sf only) and surface anything >1.2× slower in-run. Sub-
    # second queries are exempt (scheduler noise dominates there).
    prev = _latest_prev_bench(out["sf"])
    if prev:
        budget = 1.2
        regressions = []
        # compare totals over the SHARED query set, so growing the
        # headline suite doesn't read as a regression
        prev_qs = prev.get("queries", {})
        shared = [n for n in timings if n in prev_qs]
        if shared:
            cur_shared = sum(timings[n] for n in shared)
            prev_shared = sum(prev_qs[n] for n in shared)
            if cur_shared > prev_shared * budget:
                regressions.append(
                    f"shared-suite total {cur_shared:.2f}s > {budget}x previous {prev_shared:.2f}s"
                )
        for name, t in timings.items():
            pt = prev_qs.get(name)
            if pt and pt >= 1.0 and t > pt * budget:
                regressions.append(f"{name} {t:.2f}s > {budget}x previous {pt:.2f}s")
        out["prev_total"] = prev.get("value")
        out["regressions"] = regressions
        for r in regressions:
            print(f"# REGRESSION: {r}", file=sys.stderr)
        if not regressions:
            prev_total = prev.get("value")
            prev_s = f"{prev_total:.2f}s" if isinstance(prev_total, (int, float)) else "n/a"
            print(f"# no regressions vs previous bench ({prev_s} total)", file=sys.stderr)
    print(json.dumps(out))


def _latest_prev_bench(sf) -> dict | None:
    """The newest BENCH_r{N}.json beside this script at the same sf."""
    here = os.path.dirname(os.path.abspath(__file__))
    import re

    best = None
    for fname in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fname)
        if not m:
            continue
        try:
            with open(os.path.join(here, fname)) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        # the driver's record wraps this script's JSON line in "parsed"
        if "parsed" in data and isinstance(data["parsed"], dict):
            data = data["parsed"]
        if data.get("sf") != sf:
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), data)
    return best[1] if best else None


if __name__ == "__main__":
    main()

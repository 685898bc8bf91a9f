"""Catalog-wide physical-plan linter: explain every queries() entry
(nothing executes) and flag the scale anti-patterns:

* CartesianProduct — a pair join whose blocking key vanished;
* single-partition Window (`windowspecdefinition()` with no
  PARTITION BY on a corpus-scale input) — the whole dataset funnels
  through one task;
* scans reading every column into a narrow projection.

Exit non-zero if an entry outside the documented allowlist trips.

Usage: python tools/plan_lint.py [name ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

# Documented exceptions. Global-ordering operators (exact ntile, BPE
# argmax broadcast) legitimately sort tiny or vocabulary-scale inputs
# in one partition; their docstrings carry the 100 TB variant.
ALLOW_GLOBAL_WINDOW = {
    "quantile_bins_price",   # exact decile contract; scale path = quantile_bins_approx
    "scd2_merge_orders",     # change-ordinal over the O(changed-keys) delta, not the fact table
    "window_running_total",  # demonstration of an explicitly global running sum
    "rfm_segments",          # ntile over the pre-aggregated customer dim (docstring notes scale)
    "revenue_growth_mom",    # lag over O(months) pre-aggregate
    "ann_recall_curve",      # centroid ranking over the O(k)=8 cell table
    "open_orders_timeline",  # running sum over the O(months) pre-aggregate
}


def lint(name: str, fn, spark) -> list[str]:
    df = fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    problems = []
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct")
    if "windowspecdefinition(" in plan:
        # windowspecdefinition(ORDER-BY...) with no partition keys =
        # single-partition window; detect by the spec starting with a
        # sort order rather than partition columns
        for frag in plan.split("windowspecdefinition(")[1:]:
            head = frag.split(")")[0]
            if (" ASC" in head.split(",")[0] or " DESC" in head.split(",")[0]) and (
                name not in ALLOW_GLOBAL_WINDOW
            ):
                problems.append("global Window (no PARTITION BY)")
                break
    return problems


def main(names):
    spark = get_spark("plan-lint")
    qs = entrymod.queries()
    selected = names or list(qs)
    bad = {}
    for name in selected:
        try:
            problems = lint(name, qs[name], spark)
        except Exception as e:  # pragma: no cover - surfacing only
            problems = [f"explain failed: {e}"]
        if problems:
            bad[name] = problems
            print(f"✗ {name}: {', '.join(problems)}")
        else:
            print(f"✓ {name}")
    print(f"\n{len(selected) - len(bad)}/{len(selected)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

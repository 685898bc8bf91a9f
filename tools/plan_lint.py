"""Catalog-wide physical-plan linter: explain every queries() entry
(nothing executes) and flag the scale anti-patterns:

* CartesianProduct — a pair join whose blocking key vanished;
* single-partition Window (`windowspecdefinition()` with no
  PARTITION BY on a corpus-scale input) — the whole dataset funnels
  through one task;
* SortMergeJoin / ShuffledHashJoin whose build side is a global
  (no-keys) aggregate — a guaranteed-1-row input paying a full
  shuffle+sort instead of a broadcast;
* a Filter with pushable-looking comparisons sitting on a parquet
  scan that pushed NOTHING down — the scan reads every row for a
  predicate the reader could have applied.

Exit non-zero if an entry outside the documented allowlist trips.

Usage: python tools/plan_lint.py [name ...]
"""

from __future__ import annotations

import gc
import io
import os
import re
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
    "quantile_bins_price",   # round 9: deciles are distributed (range exchange + rank offsets); the remaining global windows run over the O(width) per-partition counts frame
    "scd2_merge_orders",     # change-ordinal over the O(changed-keys) delta, not the fact table
    "window_running_total",  # demonstration of an explicitly global running sum
    "rfm_segments",          # ntile over the pre-aggregated customer dim (docstring notes scale)
    "revenue_growth_mom",    # lag over O(months) pre-aggregate
    "ann_recall_curve",      # centroid ranking over the O(k)=8 cell table
    "open_orders_timeline",  # running sum over the O(months) pre-aggregate
    "rrf_fusion",            # rank over the two top-50 TakeOrdered results (O(k))
    "quality_threshold_sweep",  # exact ntile planning table; docstring carries the approx_percentile 100 TB variant
    "curriculum_phase_assignment",  # running sum over the O(sources) pre-aggregate
    "hnsw_layer_assign",  # cum_share over the O(levels)≤5 census rows
    "rag_context_assembly",  # rank+pack over the BM25 top-5 docs' chunks (O(k))
    "kaplan_meier_conversion",  # KM cumulative product over the O(observation-days) table
    "bradley_terry_step",  # rank over the O(types)=5 strength table
    "retrieval_ndcg_audit",  # position windows over three ≤10-row TakeOrdered heads
    "sprt_conversion_gate",  # running LLR over the O(days) calendar-bounded daily aggregate
    "wilcoxon_signed_rank",  # |diff| ranking over the O(days) paired daily table
    "rank_biased_overlap",  # rank windows over the two 20-row TakeOrdered heads (O(k))
}

# Joins where a global-aggregate side is deliberately NOT broadcast
# (none expected; add with a docstring justification only).
ALLOW_SMJ_GLOBAL_AGG: set[str] = set()

# Filters Spark genuinely cannot push into the parquet reader
# (predicates over arrays/UDF outputs); add with justification only.
ALLOW_UNPUSHED_FILTER: set[str] = set()


def _parse_tree(plan: str) -> list[tuple[int, str, int]]:
    """(node_id, node_name, depth) per line of the plan-tree header.

    Depth is the column of the `+-`/`:-` marker; Spark indents each
    level by 3, so `child.depth == parent.depth + 3` for direct
    children and a subtree is the maximal run of deeper lines.
    """
    tree = plan.split("\n\n")[0]
    nodes = []
    for line in tree.splitlines():
        m = re.search(r"\((\d+)\)\s*$", line)
        if not m:
            continue
        body = re.sub(r"^[\s:+\-]*\*?\s*", "", line)
        name = body.rsplit("(", 1)[0].strip()
        depth = max(line.find("+- "), line.find(":- "))
        nodes.append((int(m.group(1)), name, depth))
    return nodes


def _node_details(plan: str) -> dict[int, str]:
    """node_id -> its detail block from the formatted-explain body."""
    details: dict[int, str] = {}
    for m in re.finditer(r"^\((\d+)\) ([^\n]+)\n((?:(?!^\(\d+\) ).*\n?)*)", plan, re.M):
        details[int(m.group(1))] = m.group(2) + "\n" + m.group(3)
    return details


def _subtree(nodes, i):
    """Indices of the subtree rooted at nodes[i] (inclusive)."""
    d = nodes[i][2]
    out = [i]
    for j in range(i + 1, len(nodes)):
        if nodes[j][2] <= d:
            break
        out.append(j)
    return out


def _smj_over_global_agg(nodes, details) -> bool:
    """A sort-merge/shuffled-hash join whose input SIDE is a global
    (Keys: []) aggregate — that side is 1 row; broadcast it.

    Only the side's effective root counts: we descend through
    row-preserving wrappers (Sort/Exchange/Project/Filter/codegen
    shims) and flag if we land on a keys-[] aggregate. A global
    aggregate buried deeper — e.g. already broadcast into the side's
    pipeline (the scale-adaptive `b` pattern), or feeding another
    join below — does NOT make the SMJ wrong, and the earlier
    whole-subtree scan false-positived on exactly that (knn_graph's
    O(n·k) edge-list self-join)."""
    _THROUGH = (
        "Sort", "Exchange", "AQEShuffleRead", "Project", "Filter",
        "ColumnarToRow", "InputAdapter", "WholeStageCodegen", "Coalesce",
    )
    for i, (nid, name, depth) in enumerate(nodes):
        if not name.startswith(("SortMergeJoin", "ShuffledHashJoin")):
            continue
        children = [j for j in _subtree(nodes, i)[1:] if nodes[j][2] == depth + 3]
        for c in children:
            cur = c
            while True:
                cname = nodes[cur][1]
                if "Aggregate" in cname:
                    det = details.get(nodes[cur][0], "")
                    km = re.search(r"Keys(?: \[\d+\])?\s*:?\s*\[(.*?)\]", det)
                    if km and km.group(1).strip() == "":
                        return True
                    break
                if not cname.startswith(_THROUGH):
                    break
                kids = [
                    j
                    for j in _subtree(nodes, cur)[1:]
                    if nodes[j][2] == nodes[cur][2] + 3
                ]
                if len(kids) != 1:
                    break
                cur = kids[0]
    return False


# bare-attribute comparison against a LITERAL — the shape the parquet
# reader can evaluate: " l_quantity#12 > 40.0" but not
# "size(tokens#9) > 5" (function-wrapped) or "a#1 > b#2" (col-col)
_PUSHABLE_CMP = re.compile(r"[(\s]([a-zA-Z_]\w*#\d+L?) (?:=|>=?|<=?|<=>) [\d'\-]")

# wrappers that sit between a Filter and its scan without changing rows
_PASS_THROUGH = ("ColumnarToRow", "InputAdapter", "WholeStageCodegen")


def _unpushed_selective_scan(nodes, details) -> bool:
    """Filter with pushable-looking comparisons directly over a parquet
    scan that pushed no filters at all."""
    for i, (nid, name, depth) in enumerate(nodes):
        if not name.startswith("Filter"):
            continue
        # descend through single-child pass-through wrappers to the scan
        cur, cur_depth = i, depth
        while True:
            kids = [j for j in _subtree(nodes, cur)[1:] if nodes[j][2] == cur_depth + 3]
            if len(kids) != 1:
                cur = None
                break
            cur, cur_depth = kids[0], nodes[kids[0]][2]
            if not nodes[cur][1].startswith(_PASS_THROUGH):
                break
        if cur is None or not nodes[cur][1].startswith("Scan parquet"):
            continue
        scan_det = details.get(nodes[cur][0], "")
        pm = re.search(r"PushedFilters: \[(.*?)\]", scan_det)
        if pm is None or pm.group(1).strip() != "":
            continue  # pushed something (or not a v1 parquet scan)
        cond = details.get(nid, "")
        cm = re.search(r"Condition : (.*)", cond)
        if not cm:
            continue
        scan_cols = set(re.findall(r"([a-zA-Z_]\w*#\d+L?)", scan_det))
        for attr in _PUSHABLE_CMP.findall(cm.group(1)):
            if attr in scan_cols:
                return True
    return False


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
    nodes = _parse_tree(plan)
    details = _node_details(plan)
    if _smj_over_global_agg(nodes, details) and name not in ALLOW_SMJ_GLOBAL_AGG:
        problems.append("SortMergeJoin over a global-aggregate side (broadcast it)")
    if _unpushed_selective_scan(nodes, details) and name not in ALLOW_UNPUSHED_FILTER:
        problems.append("selective Filter on a scan with no pushed filters")
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
        # release eager-checkpoint blocks between entries (round 8):
        # plan builds run the build-time localCheckpoints, and a full
        # catalog lint otherwise accumulates their dead RDD blocks
        gc.collect()
    print(f"\n{len(selected) - len(bad)}/{len(selected)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

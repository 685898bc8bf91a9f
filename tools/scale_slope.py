"""Full-catalog scale-slope sweep: time EVERY queries() entry
(Spark-only, no oracle) at sf0.01 and sf0.1 and report the wall-time
ratio per entry. On 10× data, a scan-bound operator should scale
≲10×; anything beyond FLAG_RATIO is flagged as a scale risk for the
plan audit. Complements bench.py (which slopes only the headline
suite) — this is the evidence that the WHOLE catalog's partition/
shuffle design survives a scale-up, not just the benched subset.

Each entry is warmed once at sf0.001 first so HotSpot C2 state
doesn't masquerade as data cost (the bench.py lesson), then timed
single-shot at each scale.

Run: python tools/scale_slope.py [name ...]   → writes SCALE_SLOPE.json
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.session import get_spark

WARM_DIR = "/root/testdata/sf0.001"
SMALL_DIR = "/root/testdata/sf0.01"
BIG_DIR = "/root/testdata/sf0.1"
FLAG_RATIO = 15.0  # 10x data + modest log/overhead factors
MIN_BIG_SEC = 0.5  # ratios of sub-half-second walls are scheduler noise


def _dir_key(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0_01_s'."""
    return os.path.basename(sf_dir.rstrip("/")).replace(".", "_") + "_s"


def run(spark, fn, sf_dir) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # release checkpoint blocks promptly (bench.py lesson, round 8)
    gc.collect()
    return wall


def main(names) -> int:
    spark = get_spark("scale-slope")
    qs = entrymod.queries()
    selected = names or list(qs)
    # subset runs MERGE into the existing report instead of clobbering
    # the full sweep's results
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_SLOPE.json"
    )
    out, risks = {}, []
    if names and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out = {k: v for k, v in prev.get("entries", {}).items() if k not in names}
        risks = [r for r in prev.get("scale_risks", []) if r.split(":")[0] not in names]
    for name in selected:
        fn = qs[name]
        try:
            run(spark, fn, WARM_DIR)  # JIT warm-up
            small = run(spark, fn, SMALL_DIR)
            big = run(spark, fn, BIG_DIR)
        except Exception as exc:  # pragma: no cover - sweep robustness
            out[name] = {"err": str(exc)[:200]}
            risks.append(name)
            continue
        ratio = round(big / small, 2) if small > 0 else None
        # keys derived from the actual dir names so the labels can't
        # drift from the measurement again (round-3 advisor: the old
        # sf001_s/sf01_s names read as one scale factor too small)
        out[name] = {_dir_key(SMALL_DIR): round(small, 3), _dir_key(BIG_DIR): round(big, 3), "ratio": ratio}
        if ratio is not None and ratio > FLAG_RATIO and big >= MIN_BIG_SEC:
            risks.append(f"{name}: {ratio}x on 10x data")
        print(f"{name}: {small:.2f}s -> {big:.2f}s ({ratio}x)", flush=True)
    report = {
        "flag_ratio": FLAG_RATIO,
        "n_entries": len(out),
        "scale_risks": risks,
        "entries": out,
    }
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{len(selected)} entries, scale risks: {risks or 'none'}")
    return 1 if risks else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

"""Next-doubling scale probe (VERDICT r4 item 7): replicate sf0.1 ×N
on disk with deterministic re-keying, run the heaviest catalog entries
there, and record wall ratios vs freshly re-measured sf0.1 walls in
SCALE_SLOPE_XL{N}.json. This is the evidence that the adaptive
sign-bucket subdivision, salted joins, and banded dedup paths keep
behaving past the largest driver-provided dataset.

Replication design (replica r = 0..N-1; r=0 is the identity):
- every key column gets +r·10^7, so joins stay consistent WITHIN a
  replica and replicas never cross-join;
- document text is token-prefixed per replica (``r<i>·token``) for
  r>0: within-replica duplicate/near-dup/shingle structure is
  isomorphic to the original, while cross-replica texts share no
  tokens — so dedup candidate buckets grow ~linearly with data, not
  quadratically as naive N× duplication of identical text would;
- embeddings get a per-replica deterministic sign-flip pattern over
  dimensions: flipping the same dims for all vectors of a replica
  preserves every within-replica dot product bit-for-bit and keeps
  norms, while cross-replica vectors decorrelate — same reasoning;
- timestamps/values/categoricals are untouched (N× density per time
  window and per category is exactly what a bigger corpus looks like).

Doubling metric (VERDICT r9 item 2 — ONE pinned definition): when
SPARK_GRAFT_XL_FACTOR=128 the probe measures ×64 and ×128 walls
INTERLEAVED in the same session (rep order 64,128,64,128,…) and emits
``doubling_vs_x64 = median(x128 walls) / median(x64 walls)`` computed
from those same-session walls — never a ratio-of-ratios across
sessions with different sf0.1 bases (that is exactly how SURVEY §8's
r9 pagerank 1.80 diverged from the artifacts' 2.37). A doubling
> 2.2 is flagged as a risk (linear = 2.0 + overhead allowance).

Host telemetry (VERDICT r9 items 1a/6): every measurement records the
CPU steal%% over its own window (from /proc/stat deltas) and the
1-minute loadavg beside the wall, so a degraded-host rep is
adjudicable from the artifact instead of from builder narrative.

Run: python tools/scale_xl.py [N_heaviest] [name ...]
     → builds .scale_xl/ once (reused if present), writes
     SCALE_SLOPE_XL.json + a per-round archive
     SCALE_SLOPE_XL_r{NN}.json (VERDICT r9 item 8 — the unversioned
     report was previously overwritten in place and old walls lived
     only in git history).
     SPARK_GRAFT_XL_FACTOR=64 → dir .scale_xl64/, SCALE_SLOPE_XL64.json
     SPARK_GRAFT_XL_FACTOR=128 → dirs .scale_xl64/ + .scale_xl128/,
     SCALE_SLOPE_XL128.json with interleaved x64/x128 walls and the
     doubling_vs_x64 field.
     SPARK_GRAFT_XL_FACTOR=256 → the third doubling (VERDICT r10
     item 4): interleaves x128/x256, emits doubling_vs_x128 into
     SCALE_SLOPE_XL256.json — same machinery, PREV = N/2.
"""

from __future__ import annotations

import gc
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from hematite_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_DIR = "/root/testdata/sf0.1"
WARM_DIR = "/root/testdata/sf0.001"
REPLICAS = int(os.environ.get("SPARK_GRAFT_XL_FACTOR", "8"))
_SUFFIX = "" if REPLICAS == 8 else str(REPLICAS)
XL_DIR = os.path.join(REPO, f".scale_xl{_SUFFIX}")
# ≥128 replicas: measure the half-size tier interleaved in-session and
# emit doubling_vs_x{N/2} (x128 pairs with x64, x256 with x128 — the
# third doubling VERDICT r10 item 4 asks for reuses this machinery)
PREV = REPLICAS // 2
PREV_DIR = os.path.join(REPO, f".scale_xl{PREV}")
# per-replica key offset. 10^7 preserves the byte-identical layout of
# the existing ≤×128 dirs; above that factor 255·10^7 overflows the
# INT32 key columns (nation/supplier keys are int in this parquet), so
# high factors use 10^6 — still ~6× the largest base key at sf0.1
# (l_orderkey max 149 999), so replicas never collide.
OFF = 10_000_000 if REPLICAS * 10_000_000 <= 2**31 - 1 else 1_000_000
# Nx data; scan-bound ops should land ≲Nx + overhead. Anything past
# this is super-linear beyond data growth.
FLAG_RATIO = REPLICAS * 1.5
# second-doubling criterion (VERDICT r9): ×128 wall / ×64 wall ≤ 2.2
# = linear growth (2.0) + fixed-overhead allowance. The allowance is
# calibrated for walls where fixed per-job cost is a small share, so
# the 2.2 bound only applies when the ×64 wall is ≥ MIN_X64_SEC; below
# that, scheduler + Python-worker spin-up is a double-digit share of
# the wall and 2.2 has no discriminating power (a 5 s entry with ~2 s
# of constant cost doubles to 2.4 while perfectly linear). A genuine
# quadratic still shows ≥ FLAG_DOUBLING_HARD at ANY wall and is always
# flagged.
FLAG_DOUBLING = 2.2
FLAG_DOUBLING_HARD = 3.0
MIN_X64_SEC = 8.0
MIN_BASE_SEC = 0.5

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
KEY_COLS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _sign_flips(replica: int, dim: int) -> list[float]:
    """Deterministic ±1 per (replica, dimension); replica 0 = all +1."""
    if replica == 0:
        return [1.0] * dim
    return [
        1.0
        if hashlib.md5(f"xlflip:{replica}:{i}".encode()).digest()[0] % 2 == 0
        else -1.0
        for i in range(dim)
    ]


# host telemetry shared with the bench harness (one definition)
from bench import _cpu_stat, _steal_pct  # noqa: E402


def _lsh_candidate_count(spark, sf_dir: str) -> int:
    """Band-candidate pairs — the LSH funnel's true workload unit."""
    from hematite_spark.queries.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(spark, sf_dir).count()


# Entries whose TRUE workload can grow faster than the input by
# construction declare a metric here. The probe then measures the
# metric at BOTH interleaved scales (one count job per scale) and
# writes cand_x{N/2} / cand_x{N} / workload_doubling into the entry
# itself, and the risk flagging judges the wall PER UNIT of measured
# workload (ADVICE r10 medium: these fields used to be hand-annotated
# JSON that a re-probe would clobber and whose normalization the
# tool's own risks logic never applied).
WORKLOAD_METRICS = {
    "dedup_lsh_verified": _lsh_candidate_count,
    "lsh_precision_recall": _lsh_candidate_count,
    # VERDICT r11 item 5: once the audit family's exact-truth joins are
    # candidate-bounded (round 12), their true workload unit is the
    # candidate count too — declaring it here makes the probe
    # normalization-ready and guards the next accidental-candidate
    # regression.
    "minhash_jaccard_audit": _lsh_candidate_count,
    "lsh_band_auc": _lsh_candidate_count,
    "minhash_bbit_estimate": _lsh_candidate_count,
}


def effective_doubling(entry: dict) -> float | None:
    """THE normalized second-doubling definition, shared by the probe's
    risk flagging and tests/test_scale_slope.py (imported there, so
    tool and gate cannot diverge): wall-doubling when present, divided
    by (workload_doubling / 2) when the entry carries a tool-measured
    workload metric — i.e. what the wall growth would have been had
    the workload grown exactly linearly."""
    # Skip null-valued fields (written when a prev-tier median wall is
    # 0) so callers never see a None leak into arithmetic, and when a
    # merged record carries more than one tier's field, take the
    # HIGHEST tier (largest x-suffix) deterministically — the latest
    # doubling is the one the gates reason about (ADVICE r11).
    cands = sorted(
        (
            (int(k[len("doubling_vs_x"):]), v)
            for k, v in entry.items()
            if k.startswith("doubling_vs_x") and v is not None
        ),
        reverse=True,
    )
    if not cands:
        return None
    d = cands[0][1]
    w = entry.get("workload_doubling")
    return round(d * 2.0 / w, 2) if w else d


def build_xl(spark, replicas: int | None = None, xl_dir: str | None = None) -> None:
    replicas = REPLICAS if replicas is None else replicas
    xl_dir = XL_DIR if xl_dir is None else xl_dir
    if os.path.isdir(xl_dir) and all(
        os.path.exists(os.path.join(xl_dir, f"{t}.parquet")) for t in TABLES
    ):
        print(f"# reuse existing {xl_dir}", file=sys.stderr)
        return
    emb_dim = len(
        spark.read.parquet(f"{SRC_DIR}/embeddings.parquet").first()["embedding"]
    )
    for t in TABLES:
        base = spark.read.parquet(f"{SRC_DIR}/{t}.parquet")
        parts = []
        for r in range(replicas):
            df = base
            for k in KEY_COLS[t]:
                df = df.withColumn(k, (F.col(k) + F.lit(r * OFF)).cast(base.schema[k].dataType))
            if t == "documents" and r > 0:
                tok = F.transform(
                    F.split(F.col("text"), " "),
                    lambda x: F.concat(F.lit(f"r{r}·"), x),
                )
                df = df.withColumn("text", F.array_join(tok, " ")).withColumn(
                    "n_chars", F.length("text").cast("bigint")
                )
            if t == "embeddings":
                flips = _sign_flips(r, emb_dim)
                df = df.withColumn(
                    "embedding",
                    F.zip_with(
                        F.col("embedding"),
                        F.array(*[F.lit(f) for f in flips]).cast("array<float>"),
                        lambda a, b: (a * b).cast("float"),
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(xl_dir, f"{t}.parquet"))
        print(f"# built xl{replicas} {t}", file=sys.stderr)


def run(spark, fn, sf_dir) -> tuple[float, float | None, float | None]:
    """One measurement: (wall_s, steal_pct over the window, loadavg1)."""
    s0 = _cpu_stat()
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    steal = _steal_pct(s0, _cpu_stat())
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover
        load1 = None
    # Same lesson as bench.py's run_suite (round 8): drop checkpoint
    # RDD references promptly or successive entries measure each
    # other's GC debt — at xl sizes the dead blocks are GBs.
    gc.collect()
    return wall, steal, load1


# Single-shot xl walls are NOISY (round 8): first-in-JVM runs pay
# cold page-cache IO for the multi-GB xl tables, and later runs ride
# GC pressure — the same plan measured 110-340 s across consecutive
# runs in one JVM. SPARK_GRAFT_XL_REPS=3 reports the per-measurement
# MEDIAN instead; keep the default 1 for full sweeps (wall budget)
# and use 3 for targeted re-probes / A-B adjudication.
XL_REPS = max(1, int(os.environ.get("SPARK_GRAFT_XL_REPS", "1")))


def _round_n() -> int:
    """1 + highest N among BENCH_r{N}.json (the driver writes this
    round's AFTER the probe runs) — same convention as bench.py."""
    rounds = [0]
    for fname in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fname)
        if m:
            rounds.append(int(m.group(1)))
    return max(rounds) + 1


def _write_report(path: str, payload: dict) -> None:
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    # per-round archive (VERDICT r9 item 8): the unversioned report is
    # a rolling merge; the _r{NN} copy freezes what THIS round measured
    stem, ext = os.path.splitext(path)
    with open(f"{stem}_r{_round_n():02d}{ext}", "w") as f:
        json.dump(payload, f, indent=1)


def main(argv) -> int:
    n_heaviest = int(argv[0]) if argv and argv[0].isdigit() else 20
    names = [a for a in argv if not a.isdigit()]
    spark = get_spark("scale-xl")
    build_xl(spark)
    interleave_prev = REPLICAS >= 128
    if interleave_prev:
        build_xl(spark, PREV, PREV_DIR)
    qs = entrymod.queries()
    if not names:
        with open(os.path.join(REPO, "SCALE_SLOPE.json")) as f:
            slope = json.load(f)["entries"]
        ranked = sorted(
            (k for k in slope if k in qs),
            key=lambda k: slope[k].get("sf0_1_s", 0.0),
            reverse=True,
        )
        names = ranked[:n_heaviest]
    out, risks = {}, []
    path = os.path.join(REPO, f"SCALE_SLOPE_XL{_SUFFIX}.json")
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out = {k: v for k, v in prev.get("entries", {}).items() if k not in names}
        # carry risks for entries not being re-measured this run
        # (structured {name, kind, value, detail} objects — ADVICE r10:
        # display-string parsing silently dropped any risk whose text
        # didn't lead with the entry name; tolerate legacy strings)
        kept = set(out)
        risks = [
            r
            for r in prev.get("risks", [])
            if (r["name"] if isinstance(r, dict) else r.split()[0]) in kept
        ]
    for name in names:
        fn = qs[name]
        run(spark, fn, WARM_DIR)  # HotSpot warm-up (bench.py lesson)
        base_walls, base_steal = [], []
        xl_walls, xl_steal, xl_load = [], [], []
        prev_walls, prev_steal = [], []
        for _ in range(XL_REPS):
            w, s, _l = run(spark, fn, SRC_DIR)
            base_walls.append(w)
            base_steal.append(s)
            # interleaved ×(N/2)/×N (VERDICT r9 item 2): the doubling is
            # computed from walls measured back-to-back in ONE session
            if interleave_prev:
                w, s, _l = run(spark, fn, PREV_DIR)
                prev_walls.append(w)
                prev_steal.append(s)
            w, s, l1 = run(spark, fn, XL_DIR)
            xl_walls.append(w)
            xl_steal.append(s)
            xl_load.append(l1)
        # LOWER median (index (n-1)//2): wall noise is one-sided — GC
        # debt and cold page cache only ever INFLATE a rep (the r10
        # batch measured a first-rep 139 s vs 27 s steady right after a
        # heavy neighbor entry) — so for even rep counts the lower
        # middle value is the robust pick, and for odd counts this is
        # the ordinary median.
        med = lambda xs: sorted(xs)[(len(xs) - 1) // 2]
        base_s, xl_s = med(base_walls), med(xl_walls)
        ratio = round(xl_s / base_s, 2) if base_s > 0 else None
        entry = {
            "sf0_1_s": round(base_s, 3),
            f"xl{REPLICAS}_s": round(xl_s, 3),
            "ratio": ratio,
        }
        if XL_REPS > 1:
            entry["reps"] = XL_REPS
            entry[f"walls_x{REPLICAS}"] = [round(w, 2) for w in xl_walls]
        steal_all = [s for s in base_steal + xl_steal + prev_steal if s is not None]
        if steal_all:
            entry["steal_pct_max"] = max(steal_all)
            entry["steal_pct"] = [s for s in xl_steal if s is not None]
        if xl_load and xl_load[-1] is not None:
            entry["loadavg1"] = xl_load[-1]
        dbl = None
        if interleave_prev:
            prev_s = med(prev_walls)
            dbl = round(xl_s / prev_s, 2) if prev_s > 0 else None
            entry[f"xl{PREV}_s"] = round(prev_s, 3)
            entry[f"doubling_vs_x{PREV}"] = dbl
            if XL_REPS > 1:
                entry[f"walls_x{PREV}"] = [round(w, 2) for w in prev_walls]
            # tool-measured workload normalization (ADVICE r10 medium):
            # one cheap count job per scale, fields written by the
            # probe itself so a re-run reproduces the committed record
            if name in WORKLOAD_METRICS:
                c_prev = WORKLOAD_METRICS[name](spark, PREV_DIR)
                c_curr = WORKLOAD_METRICS[name](spark, XL_DIR)
                entry[f"cand_x{PREV}"] = c_prev
                entry[f"cand_x{REPLICAS}"] = c_curr
                if c_prev > 0:
                    entry["workload_doubling"] = round(c_curr / c_prev, 2)
        out[name] = entry
        flag = ratio is not None and base_s >= MIN_BASE_SEC and ratio > FLAG_RATIO
        if flag:
            risks.append(
                {
                    "name": name,
                    "kind": "ratio",
                    "value": ratio,
                    "detail": f"sf0.1 {base_s:.2f}s -> xl{REPLICAS} {xl_s:.2f}s",
                }
            )
        # risk flagging applies the SAME normalization the gate test
        # imports (effective_doubling) — hand-editing the artifact can
        # no longer make tool and test disagree
        eff = effective_doubling(entry) if dbl is not None else None
        if eff is not None and (
            (eff > FLAG_DOUBLING and entry[f"xl{PREV}_s"] >= MIN_X64_SEC)
            or eff > FLAG_DOUBLING_HARD
        ):
            risks.append(
                {
                    "name": name,
                    "kind": "doubling",
                    "value": eff,
                    "detail": (
                        f"x{PREV} {entry[f'xl{PREV}_s']:.2f}s -> x{REPLICAS} {xl_s:.2f}s"
                        + (
                            f" (raw {dbl}, workload_doubling "
                            f"{entry['workload_doubling']})"
                            if entry.get("workload_doubling")
                            else ""
                        )
                    ),
                }
            )
        print(
            f"# xl{REPLICAS}/{name}: {base_s:.2f}s -> {xl_s:.2f}s ({ratio}x"
            + (f", doubling {dbl}" if dbl is not None else "")
            + (f", steal≤{entry.get('steal_pct_max')}%" if steal_all else "")
            + ")",
            file=sys.stderr,
        )
        # write after EVERY entry (round 8): a killed or crashed sweep
        # used to lose all its measurements because the report only
        # landed at the end
        _write_report(
            path,
            {
                "replicas": REPLICAS,
                "flag_ratio": FLAG_RATIO,
                "flag_doubling": FLAG_DOUBLING if interleave_prev else None,
                "doubling_definition": (
                    f"median(x{REPLICAS} walls) / median(x{PREV} walls), "
                    "interleaved same-session reps; risks flag on "
                    "effective_doubling (workload-normalized where the "
                    "entry declares a metric)"
                    if interleave_prev
                    else None
                ),
                "risks": risks,
                "entries": dict(sorted(out.items())),
            },
        )
    print(json.dumps({"xl_entries": len(out), "risks": risks}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

"""Next-doubling scale probe (VERDICT r4 item 7): replicate sf0.1 ×8
on disk with deterministic re-keying (~5 M lineitem rows), run the N
heaviest catalog entries there, and record wall ratios vs freshly
re-measured sf0.1 walls in SCALE_SLOPE_XL.json. This is the evidence
that the adaptive sign-bucket subdivision, salted joins, and banded
dedup paths keep behaving past the largest driver-provided dataset.

Replication design (replica r = 0..7; r=0 is the identity):
- every key column gets +r·10^7, so joins stay consistent WITHIN a
  replica and replicas never cross-join;
- document text is token-prefixed per replica (``r<i>·token``) for
  r>0: within-replica duplicate/near-dup/shingle structure is
  isomorphic to the original, while cross-replica texts share no
  tokens — so dedup candidate buckets grow ~linearly with data, not
  quadratically as naive 8× duplication of identical text would;
- embeddings get a per-replica deterministic sign-flip pattern over
  dimensions: flipping the same dims for all vectors of a replica
  preserves every within-replica dot product bit-for-bit and keeps
  norms, while cross-replica vectors decorrelate — same reasoning;
- timestamps/values/categoricals are untouched (8× density per time
  window and per category is exactly what a bigger corpus looks like).

Run: python tools/scale_xl.py [N_heaviest] [name ...]
     → builds .scale_xl/ once (reused if present), writes SCALE_SLOPE_XL.json
     SPARK_GRAFT_XL_FACTOR=64 selects a deeper replication (dir
     .scale_xl64/, report SCALE_SLOPE_XL64.json) — two more doublings
     for the heaviest survivors of the x8 probe.
"""

from __future__ import annotations

import gc
import hashlib
import json
import os
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
OFF = 10_000_000
# Nx data; scan-bound ops should land ≲Nx + overhead. Anything past
# this is super-linear beyond data growth.
FLAG_RATIO = REPLICAS * 1.5
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


def build_xl(spark) -> None:
    if os.path.isdir(XL_DIR) and all(
        os.path.exists(os.path.join(XL_DIR, f"{t}.parquet")) for t in TABLES
    ):
        print(f"# reuse existing {XL_DIR}", file=sys.stderr)
        return
    emb_dim = len(
        spark.read.parquet(f"{SRC_DIR}/embeddings.parquet").first()["embedding"]
    )
    for t in TABLES:
        base = spark.read.parquet(f"{SRC_DIR}/{t}.parquet")
        parts = []
        for r in range(REPLICAS):
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
        out.write.mode("overwrite").parquet(os.path.join(XL_DIR, f"{t}.parquet"))
        print(f"# built xl {t}", file=sys.stderr)


def run(spark, fn, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    # Same lesson as bench.py's run_suite (round 8): drop checkpoint
    # RDD references promptly or successive entries measure each
    # other's GC debt — at xl sizes the dead blocks are GBs.
    gc.collect()
    return wall


# Single-shot xl walls are NOISY (round 8): first-in-JVM runs pay
# cold page-cache IO for the multi-GB xl tables, and later runs ride
# GC pressure — the same plan measured 110-340 s across consecutive
# runs in one JVM. SPARK_GRAFT_XL_REPS=3 reports the per-measurement
# MEDIAN instead; keep the default 1 for full sweeps (wall budget)
# and use 3 for targeted re-probes / A-B adjudication.
XL_REPS = max(1, int(os.environ.get("SPARK_GRAFT_XL_REPS", "1")))


def run_med(spark, fn, sf_dir) -> float:
    walls = sorted(run(spark, fn, sf_dir) for _ in range(XL_REPS))
    return walls[len(walls) // 2]


def main(argv) -> int:
    n_heaviest = int(argv[0]) if argv and argv[0].isdigit() else 20
    names = [a for a in argv if not a.isdigit()]
    spark = get_spark("scale-xl")
    build_xl(spark)
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
    for name in names:
        fn = qs[name]
        run(spark, fn, WARM_DIR)  # HotSpot warm-up (bench.py lesson)
        base_s = run_med(spark, fn, SRC_DIR)
        xl_s = run_med(spark, fn, XL_DIR)
        ratio = round(xl_s / base_s, 2) if base_s > 0 else None
        out[name] = {
            "sf0_1_s": round(base_s, 3),
            f"xl{REPLICAS}_s": round(xl_s, 3),
            "ratio": ratio,
        }
        if XL_REPS > 1:
            out[name]["reps"] = XL_REPS
        flag = ratio is not None and base_s >= MIN_BASE_SEC and ratio > FLAG_RATIO
        if flag:
            risks.append(f"{name} {ratio}x (sf0.1 {base_s:.2f}s -> xl{REPLICAS} {xl_s:.2f}s)")
        print(f"# xl{REPLICAS}/{name}: {base_s:.2f}s -> {xl_s:.2f}s ({ratio}x)", file=sys.stderr)
        # write after EVERY entry (round 8): a killed or crashed sweep
        # used to lose all its measurements because the report only
        # landed at the end
        with open(path, "w") as f:
            json.dump(
                {
                    "replicas": REPLICAS,
                    "flag_ratio": FLAG_RATIO,
                    "risks": risks,
                    "entries": dict(sorted(out.items())),
                },
                f,
                indent=1,
            )
    print(json.dumps({"xl_entries": len(out), "risks": risks}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

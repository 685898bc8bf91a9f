"""Per-query wall decomposition for the optimization round: split each
query's bench wall into (a) DataFrame build (Python plan construction),
(b) optimize/explain (Catalyst analysis+optimization, no execution),
(c) noop execution — so plan-shape work (fewer stages, smaller plans)
can be told apart from data work before touching anything.

Run: python tools/profile_queries.py <name> [name ...]
Env: PROFILE_SF_DIR (default /root/testdata/sf0.1), PROFILE_REPS (3).
"""

from __future__ import annotations

import gc
import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.session import get_spark

SF_DIR = os.environ.get("PROFILE_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "3"))


def main(names):
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    # session warm-up mirroring bench.py
    import os.path as p

    spark.read.parquet(p.join(SF_DIR, "lineitem.parquet")).count()
    docs = spark.read.parquet(p.join(SF_DIR, "documents.parquet"))
    docs.groupBy("lang").count().localCheckpoint().count()
    warm = p.join(p.dirname(SF_DIR.rstrip("/")), "sf0.001")
    for name in names:
        qs[name](spark, warm).write.format("noop").mode("overwrite").save()
    print(f"{'query':38s} {'build':>7s} {'plan':>7s} {'exec(med)':>10s} {'execs':>24s}")
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        with redirect_stdout(io.StringIO()):
            df.explain("formatted")
        t_plan = time.perf_counter() - t0
        execs = []
        for _ in range(REPS):
            df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
            del df
            gc.collect()
        print(
            f"{name:38s} {t_build:7.2f} {t_plan:7.2f} {statistics.median(execs):10.2f} "
            f"{'/'.join(f'{e:.2f}' for e in execs):>24s}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])

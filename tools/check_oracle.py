"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.
Exit non-zero on any mismatch.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.oracle import compare, duck_connection
from hematite_spark.queries._shared import release_all_checkpoints
from hematite_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")


def main(names):
    spark = get_spark("oracle-check")
    con = duck_connection(SF_DIR)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or list(qs)
    failures = []
    for name in selected:
        t0 = time.time()
        df = None
        try:
            df = qs[name](spark, SF_DIR)
            if name not in oracles:
                print(f"· {name}: no oracle (rows-only) — {df.count()} rows [{time.time()-t0:.1f}s]")
                continue
            mismatch = compare(df, con, oracles[name])
            if mismatch:
                failures.append((name, mismatch))
                print(f"✗ {name}: {mismatch}")
            else:
                print(f"✓ {name}: match [{time.time()-t0:.1f}s]")
        except Exception as e:
            failures.append((name, str(e)))
            print(f"✗ {name}: error: {e}")
        finally:
            # drop checkpoint RDD blocks promptly (round 13: the
            # round-8 del+gc alone never freed them — localCheckpoint
            # RDDs sit in the context's weak-valued persistent map
            # until a FULL JVM GC, which Spark only forces every 30
            # minutes; 363 entries in one JVM otherwise accumulate GBs
            # of dead checkpoint blocks and the sweep tail crawls)
            del df
            gc.collect()
            release_all_checkpoints(spark)
    print(f"\n{len(selected) - len(failures)}/{len(selected)} match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

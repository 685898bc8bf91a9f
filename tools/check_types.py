"""Type-level audit: compare the Arrow schema of every queries() entry
against its oracle_sql() DuckDB Arrow schema. The driver's value-hash is
type-sensitive (DuckDB HUGEINT vs Spark BIGINT hash differently even when
values are equal), so this catches latent hash-mismatches before the
driver does.

Usage: python tools/check_types.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.oracle import duck_connection
from hematite_spark.session import get_spark

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

# Arrow type families we treat as hash-equivalent (string/large_string
# serialize identically; timestamp tz-naming differs across producers).
def norm_type(t: str) -> str:
    t = str(t)
    if t.startswith("large_string"):
        return "string"
    if t.startswith("timestamp"):
        return "timestamp"
    return t


def main(names):
    spark = get_spark("type-check")
    con = duck_connection(SF_DIR)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = names or [n for n in qs if n in oracles]
    bad = []
    for name in selected:
        if name not in oracles:
            print(f"· {name}: rows-only, skipped")
            continue
        try:
            stbl = qs[name](spark, SF_DIR).limit(1).toArrow()
            dtbl = con.execute(
                f"SELECT * FROM ({oracles[name]}) _q LIMIT 0"
            ).fetch_arrow_table()
        except Exception as e:
            bad.append((name, f"error: {e}"))
            print(f"✗ {name}: error: {e}")
            continue
        stypes = {f.name: norm_type(f.type) for f in stbl.schema}
        dtypes = {f.name: norm_type(f.type) for f in dtbl.schema}
        if stypes != dtypes:
            diff = {
                k: (stypes.get(k), dtypes.get(k))
                for k in set(stypes) | set(dtypes)
                if stypes.get(k) != dtypes.get(k)
            }
            bad.append((name, diff))
            print(f"✗ {name}: {diff}")
        else:
            print(f"✓ {name}")
    print(f"\n{len(selected) - len(bad)}/{len(selected)} type-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

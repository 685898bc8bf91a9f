"""Dump explain("formatted") of named queries to plans/r12/<name>_<tag>.txt
(the optimization round's before/after plan evidence).

Run: python tools/dump_plan_files.py <tag> <name> [name ...]
Env: PLAN_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from hematite_spark.session import get_spark

SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")


def main(tag, names):
    spark = get_spark("dump_plan_files")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}) physical plan at {SF_DIR} ==\n\n")
            f.write(buf.getvalue())
        print(path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

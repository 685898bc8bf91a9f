"""Dump explain("formatted") of named queries to plans/<round>/<name>_<tag>.txt
(the optimization round's before/after plan evidence).

Run: python tools/dump_plan_files.py <tag> <name> [name ...]
Env: PLAN_SF_DIR (default /root/testdata/sf0.1); PLAN_ROUND_DIR
(default r13) picks the plans/ subdirectory (ADVICE r12: r12 was
hardcoded); PLAN_CHECKPOINT_PLANS=1 additionally appends, in build
order, the physical plan of EVERY frame the query localCheckpoints
(i.e. what each checkpoint job materializes: schema, scans, width).
That is the non-vacuous evidence VERDICT r12 asked for on queries
whose returned plan truncates at an opaque LogicalRDD checkpoint
leaf — the final explain alone cannot show what was materialized
upstream.
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
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLAN_ROUND_DIR", "r13"),
)


def main(tag, names):
    spark = get_spark("dump_plan_files")
    spark.sparkContext.setLogLevel("ERROR")
    cp_dumps: list[str] = []
    if os.environ.get("PLAN_CHECKPOINT_PLANS") == "1":
        # Spark 4: the session's frames are pyspark.sql.classic
        # subclasses whose own localCheckpoint overrides the abstract
        # base — patch the concrete class (base-class patching is a
        # silent no-op).
        from pyspark.sql.classic.dataframe import DataFrame

        orig_cp = DataFrame.localCheckpoint

        def dumping_cp(self, eager=True, storageLevel=None):
            buf = io.StringIO()
            with redirect_stdout(buf):
                self.explain("formatted")
            cp_dumps.append(
                f"-- checkpoint #{len(cp_dumps) + 1}: schema "
                f"{self.schema.simpleString()}\n{buf.getvalue()}"
            )
            if storageLevel is None:
                return orig_cp(self, eager=eager)
            return orig_cp(self, eager=eager, storageLevel=storageLevel)

        DataFrame.localCheckpoint = dumping_cp
    qs = entrymod.queries()
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        cp_dumps.clear()
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}) physical plan at {SF_DIR} ==\n\n")
            f.write(buf.getvalue())
            if cp_dumps:
                f.write(
                    f"\n\n== {name} ({tag}) — plans of the "
                    f"{len(cp_dumps)} localCheckpointed frame(s), build order "
                    "(what each checkpoint job materializes) ==\n\n"
                )
                f.write("\n".join(cp_dumps))
        print(path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

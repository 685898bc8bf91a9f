"""DuckDB-oracle comparison utilities — the local replica of the
driver's correctness gate (BASELINE.json `metric`): row count, column
names, and order-insensitive value comparison between a Spark result
and the equivalent DuckDB SQL over the same parquet tables.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from hematite_spark.io import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_val(v: Any) -> str:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def norm_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name and rows by value — the driver's
    order-insensitive comparison shape."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(cols), out


def compare(spark_df, con, sql: str) -> str | None:
    """Returns None on match, else a human-readable mismatch reason."""
    sdata = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    ddata = res.fetchall()
    sc, sr = norm_rows(scols, sdata)
    dc, dr = norm_rows(dcols, ddata)
    if sc != dc:
        return f"columns: spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return f"rowcount: spark={len(sr)} duck={len(dr)}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        return f"values differ: {diffs}"
    return None

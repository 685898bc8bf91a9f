"""Testdata loaders and NDJSON (CloudEvents wire format) I/O.

Parquet is the at-rest format (columnar, min/max stats, pushdown);
NDJSON exists only as an ingest/export format for wire parity with
the reference, which stores newline-delimited CloudEvents JSON
(reference db.rs:205-210).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one testdata table. Scans stay columnar and pruned: callers
    select/filter on the returned DataFrame and Catalyst pushes both
    into the parquet reader.

    The `events` table is written with nanosecond timestamps, which
    Spark's vectorized reader rejects; read them as raw nanos
    (legacy.parquet.nanosAsLong) and truncate to microsecond
    timestamps — the same truncation DuckDB applies, so both engines
    see identical values."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def read_cloudevents_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """Ingest CloudEvents NDJSON (the reference's on-disk/wire format)."""
    from hematite_spark.schema import CLOUDEVENTS_SCHEMA

    wire_fields = [f for f in CLOUDEVENTS_SCHEMA.fields if f.name not in ("user_id", "stream_id", "revision", "ingest_time")]
    from pyspark.sql import types as T

    return spark.read.schema(T.StructType(wire_fields)).json(path)

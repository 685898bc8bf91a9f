"""hematite_spark — a PySpark-native event-store + analytics engine.

A from-scratch re-expression of the capabilities of the reference
engine (Cantido/hematite: a multi-tenant append-only CloudEvents
event store, Rust/axum, see /root/reference) on top of Apache Spark:

* the event-store surface (append with optimistic-concurrency gates,
  positional point/range reads, stream enumeration + metadata,
  stream delete) — `hematite_spark.store`;
* a full relational query layer (joins, aggregations, windows, set
  ops, scalar/JSON functions) the reference lacks but the north-star
  requires — `hematite_spark.queries.relational`;
* LLM-data-pipeline operators (exact/fuzzy dedup, vector similarity
  search, text analysis, multimodal columns) — `hematite_spark.queries`;
* Structured Streaming append + windowed/stateful processing —
  `hematite_spark.streaming`.

Design stance (SURVEY.md §7): one partitioned `events` table, thin
Python API, Spark built-ins everywhere; no custom Catalyst rules.
Everything is expressed as DataFrame transformations so Catalyst
handles pushdown, pruning, join selection, and AQE handles skew at
the 100 TB design point.
"""

from hematite_spark.session import get_spark, stop_spark
from hematite_spark.io import load_table, load_tables, TABLES

__all__ = ["get_spark", "stop_spark", "load_table", "load_tables", "TABLES"]

__version__ = "0.1.0"

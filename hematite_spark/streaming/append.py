"""Structured-Streaming append path: readStream → foreachBatch →
EventStore.append — the BASELINE.json `spark_approach` ("Structured
Streaming for event append + DataFrame queries").

Each micro-batch is grouped per (user_id, stream_id) and appended
through the store's OCC-gated, per-stream-serialized write path, so
streaming ingestion gets exactly the same ordering/uniqueness
guarantees as the request-path API (reference E1 lifecycle,
SURVEY.md §3). Ordering within a micro-batch follows the source's
`ingest_order` column when present — the arrival-order authority the
reference gets from request serialization (README.md:8 "strictly
ordered by arrival").

Scale: foreachBatch runs on the driver but only coordinates; the
grouping is a narrow pass over the micro-batch. At cluster scale the
same topology holds with the store's lock service sharded by stream
— streams are independent, so ingestion parallelizes across streams
while staying serial within one (the reference's DashMap +
per-stream-mutex concurrency model, server.rs:58)."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hematite_spark.store import EventStore


def _batch_to_events(pdf) -> list[dict[str, Any]]:
    events = []
    for row in pdf.itertuples(index=False):
        ev = {
            "specversion": getattr(row, "specversion", "1.0") or "1.0",
            "id": str(row.id),
            "source": str(row.source),
            "type": str(row.type),
        }
        for opt in ("subject", "datacontenttype", "dataschema", "time"):
            v = getattr(row, opt, None)
            if v is not None:
                ev[opt] = v
        data = getattr(row, "data", None)
        if data is not None:
            # wire column carries the JSON-serialized data value
            # (CloudEvents structured content mode); decode so the
            # store doesn't double-encode it
            import json

            try:
                ev["data"] = json.loads(data)
            except (ValueError, TypeError):
                ev["data"] = data
        events.append(ev)
    return events


def stream_append_to_store(
    stream_df: DataFrame,
    store: EventStore,
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Start a streaming query appending CloudEvents rows to the
    store. ``stream_df`` needs columns (user_id, stream_id, id,
    source, type[, subject, datacontenttype, dataschema, time, data,
    ingest_order]).

    Checkpointing gives at-least-once delivery into the store; the
    store's (source,id) uniqueness gate (A10) upgrades that to
    exactly-once per stream — replayed batches collide on (source,id)
    and are dropped idempotently."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        order_cols = [c for c in ("ingest_order",) if c in batch_df.columns]
        pdf = batch_df.toPandas()
        if pdf.empty:
            return
        if order_cols:
            pdf = pdf.sort_values(order_cols)
        for (user_id, stream_id), group in pdf.groupby(["user_id", "stream_id"], sort=True):
            from hematite_spark.store import SourceIdConflict

            try:
                store.append(str(user_id), str(stream_id), _batch_to_events(group))
            except SourceIdConflict:
                # replayed micro-batch after checkpoint recovery:
                # fall back to per-event idempotent appends
                for ev in _batch_to_events(group):
                    try:
                        store.append(str(user_id), str(stream_id), ev)
                    except SourceIdConflict:
                        pass

    writer = (
        stream_df.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events_to_lake(
    stream_df, path: str, checkpoint: str, n_user_buckets: int = 64, ts_col: str = "ts"
):
    """Continuous ingestion into the 100 TB lake layout
    (io.write_events_lake's streaming twin): a file/kafka event stream
    lands hive-partitioned by (event_date, user_bucket) via the
    streaming parquet sink — exactly-once per sink semantics through
    the checkpoint + file-manifest commit protocol, so a crashed or
    restarted query never double-publishes a micro-batch.

    Partition count per micro-batch stays bounded (days-in-batch ×
    buckets); downstream batch queries get the same listing-level
    pruning the batch writer produces (the partition columns come
    from the shared io.with_lake_columns contract, so batch and
    streaming writes can never land in incompatible bucket layouts).
    Returns the StreamingQuery."""
    from hematite_spark.io import with_lake_columns

    out = with_lake_columns(stream_df, ts_col=ts_col, n_user_buckets=n_user_buckets)
    return (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("event_date", "user_bucket")
        .trigger(availableNow=True)
        .start()
    )

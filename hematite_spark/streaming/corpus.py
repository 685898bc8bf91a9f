"""Streaming corpus ingest — the training-data funnel as a continuous
pipeline: document stream → quality/language gates → content-hash
dedup within a watermark → parquet lake partitioned by language.

This is the streaming twin of the batch corpus_pipeline stages 1-3
(queries/pipeline.py), built from the SAME column expressions
(queries/text.py quality_col, functions.norm_text) so a doc admitted
by the stream is exactly the doc the batch rules would admit — rule
drift between the bootstrap (batch) corpus and its streaming growth
is structurally impossible.

Scale: every gate is a stateless per-row filter (no shuffle);
`dropDuplicatesWithinWatermark` keys state on the 128-bit content
hash only, so state size is O(docs inside the watermark window) × 16
bytes and is reclaimed as the watermark advances — the right contract
for continuous ingest where the FULL history dedup lives in the batch
layer (dedup_incremental probes the accepted corpus' band index).
The sink is the exactly-once streaming parquet writer; partitioning
by language keeps per-language training mixtures listable without a
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hematite_spark.functions import norm_text
from hematite_spark.queries.text import quality_col

MIN_QUALITY = 0.3


def stream_corpus_ingest(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    keep_langs: tuple[str, ...] = ("en", "de", "fr"),
    min_quality: float = MIN_QUALITY,
    watermark: str = "10 minutes",
    ts_col: str = "ingest_ts",
):
    """Run the streaming funnel over a document stream with columns
    (doc_id, text, lang, source, `ts_col`). Returns the
    StreamingQuery (availableNow trigger: drains what exists, then
    stops — the idempotent-replay-friendly batch-of-streams mode)."""
    gated = (
        stream_df.where(F.col("lang").isin(*keep_langs))
        .withColumn("quality", quality_col())
        .where(F.col("quality") >= min_quality)
        .withColumn("content_hash", F.md5(norm_text()))
    )
    deduped = gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("lang")
        .trigger(availableNow=True)
        .start()
    )

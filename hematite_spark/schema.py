"""Schemas: the CloudEvents-v1.0 store envelope and testdata tables.

The store schema mirrors the reference's event envelope (the
CloudEvents v1.0 attribute set — reference openapi.yaml:81-86,
SURVEY.md §1.2) plus engine columns. The reference keeps events as
raw NDJSON lines and never inspects `data` (reference db.rs:205-210,
262-267); we keep `data` as a raw JSON string for the same
round-trip fidelity, parsed lazily with `from_json` /
`get_json_object` when a query needs it.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Engine-internal events table (the store). Partition columns at rest:
# (user_bucket, stream_id) — see store/store.py for the layout rationale.
CLOUDEVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("revision", T.LongType(), False),  # 0-based position
        T.StructField("specversion", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("type", T.StringType(), False),
        T.StructField("subject", T.StringType(), True),
        T.StructField("datacontenttype", T.StringType(), True),
        T.StructField("dataschema", T.StringType(), True),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("data", T.StringType(), True),  # raw JSON value
        T.StructField("data_base64", T.StringType(), True),  # base64 binary payload
        T.StructField("extensions", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("ingest_time", T.TimestampType(), False),  # arrival-order authority
    ]
)

# CloudEvents required attribute names (spec v1.0).
REQUIRED_ATTRS = ("specversion", "id", "source", "type")

# Multimodal asset table: opaque binary payload + typed metadata.
# Images/audio/video ride as `binary` columns; decode/feature-extract
# happens in Arrow-batched pandas UDFs (queries/multimodal.py).
MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video | text
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

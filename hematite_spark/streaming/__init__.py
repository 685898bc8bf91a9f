from hematite_spark.streaming.append import stream_append_to_store, stream_events_to_lake
from hematite_spark.streaming.corpus import stream_corpus_ingest
from hematite_spark.streaming.windows import (
    kmv_distinct_stream,
    ks_baseline_summary,
    ks_drift_stream,
    welford_moments_stream,
    stream_static_enrichment,
    windowed_counts,
    sliding_windowed_agg,
    session_windowed_agg,
    dedup_within_watermark,
    stateful_latest_state,
    stateful_running_counts,
    decaying_rate_counts,
    stream_stream_interval_join,
    cms_counters,
)

__all__ = [
    "kmv_distinct_stream",
    "ks_baseline_summary",
    "ks_drift_stream",
    "welford_moments_stream",
    "stream_static_enrichment",
    "stream_append_to_store",
    "stream_events_to_lake",
    "stream_corpus_ingest",
    "windowed_counts",
    "sliding_windowed_agg",
    "session_windowed_agg",
    "dedup_within_watermark",
    "stateful_latest_state",
    "stateful_running_counts",
    "decaying_rate_counts",
    "stream_stream_interval_join",
    "cms_counters",
]

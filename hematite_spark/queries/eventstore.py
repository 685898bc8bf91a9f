"""Event-store operator analogues (SURVEY.md §2 A) expressed over the
driver's `events` testdata table, treating `user_id` as the stream key
and arrival order (`ts, event_id`) as the append order.

These demonstrate the reference's entire positional query algebra —
point read, range scan with offset/limit, metadata aggregate,
whitelist sort, (source,id) dedup — as declarative Spark plans the
DuckDB oracle can check. The live store (hematite_spark.store) runs
the same shapes against its own partitioned table; tests/test_store.py
covers that side.

Reference citations: point read db.rs:132-177; range scan
db.rs:132-177 + api.rs:268-308 (offset/limit clamp api.rs:271-272);
metadata aggregate server.rs:199-248; whitelist sort api.rs:320-335;
(source,id) uniqueness api.rs:524-537 (A10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table


def _with_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign gapless 0-based revisions per stream (= user_id) in
    arrival order — the same row_number construction the store's
    append path uses (store/store.py). The tie-break on event_id makes
    the ordering total, hence deterministic."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.withColumn("revision", (F.row_number().over(w) - 1).cast("bigint"))


_REV_CTE = """
WITH revisioned AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS revision
  FROM events
)
"""


def es_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: point read by 0-based position — stream 13, revision 42.
    In the live store this is a partition-pruned one-row-group scan;
    here the revision is derived, so the plan is one window pass."""
    return (
        _with_revision(spark, sf_dir)
        .where((F.col("user_id") == 13) & (F.col("revision") == 42))
        .select("user_id", "revision", "event_id", "event_type", "value")
    )


ES_POINT_READ_SQL = (
    _REV_CTE
    + """
SELECT user_id, revision, event_id, event_type, value
FROM revisioned WHERE user_id = 13 AND revision = 42
"""
)


def es_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: range scan with offset/limit — stream 7, offset 10,
    limit 25 (reference defaults 0/50, cap 1000). Expressed as a
    revision-range predicate, which beats orderBy+offset+limit because
    it prunes instead of sorting."""
    start, limit = 10, 25
    return (
        _with_revision(spark, sf_dir)
        .where((F.col("user_id") == 7) & (F.col("revision") >= start) & (F.col("revision") < start + limit))
        .select("user_id", "revision", "event_id", "event_type", "value")
        .orderBy("revision")
    )


ES_RANGE_SCAN_SQL = (
    _REV_CTE
    + """
SELECT user_id, revision, event_id, event_type, value
FROM revisioned WHERE user_id = 7 AND revision >= 10 AND revision < 35
ORDER BY revision
"""
)


def es_stream_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: stream enumeration + metadata aggregate — per-stream
    (revision, last_modified, usage). One hash aggregate with map-side
    partials; in the live store this is footer-metadata-only."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("revision"),
            F.unix_micros(F.max("ts")).alias("last_modified_us"),
            F.sum(F.length("props")).alias("usage"),
        )
        .orderBy("user_id")
    )


ES_STREAM_METADATA_SQL = """
SELECT user_id,
       count(*) AS revision,
       epoch_us(max(ts)) AS last_modified_us,
       CAST(sum(length(props)) AS BIGINT) AS usage
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def es_metadata_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: whitelist metadata sort — streams by usage descending
    (the `?sort=-usage` surface), deterministic tie-break on id."""
    return (
        es_stream_metadata(spark, sf_dir)
        .orderBy(F.col("usage").desc(), F.col("user_id"))
        .limit(20)
    )


ES_METADATA_SORT_SQL = """
SELECT user_id,
       count(*) AS revision,
       epoch_us(max(ts)) AS last_modified_us,
       CAST(sum(length(props)) AS BIGINT) AS usage
FROM events
GROUP BY user_id
ORDER BY usage DESC, user_id
LIMIT 20
"""


def es_dedup_source_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: CloudEvents (source,id)-style dedup — keep the first
    arrival per (user_id, event_type, value) key, mirroring
    first-wins semantics of the enforced uniqueness gate. row_number
    beats dropDuplicates here because "first" is order-defined."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.unix_micros("ts").alias("first_ts_us"))
        .orderBy("user_id", "event_type")
    )


ES_DEDUP_SQL = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS first_ts_us
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events)
WHERE rn = 1
ORDER BY user_id, event_type
"""


def es_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel replay (A2/A3 extension; store read_df's
    until_revision): stream 5's aggregate state as of revision 100 —
    replaying the append-only log to a past position. Positional
    replay is a revision predicate, so in the live store it prunes to
    the files below the cut instead of scanning the full stream
    (store/store.py file-range index)."""
    return (
        _with_revision(spark, sf_dir)
        .where((F.col("user_id") == 5) & (F.col("revision") < 100))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("revision").alias("last_revision"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


ES_TIME_TRAVEL_SQL = (
    _REV_CTE
    + """
SELECT user_id, count(*) AS n_events, max(revision) AS last_revision,
       round(sum(value), 2) AS total_value
FROM revisioned WHERE user_id = 5 AND revision < 100
GROUP BY user_id
"""
)


def es_state_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sourcing read-model projection — the CQRS fold hematite's
    consumers build downstream of the log (the reference serves
    positional reads exactly so clients can replay into state;
    README.md:5-9): collapse each stream's log into current state per
    (stream, event_type) cell — latest value, the revision that set
    it, and how many events folded into the cell.

    One window pass partitioned by the stream key; the stream filter
    sits below both windows (same partition key), so the plan prunes
    before it sorts. At 100 TB this is the standard log→table replay
    job; the streaming path maintains it incrementally with
    applyInPandasWithState (streaming/windows.py)."""
    rev = _with_revision(spark, sf_dir).where(F.col("user_id") < 20)
    w_desc = W.partitionBy("user_id", "event_type").orderBy(F.col("revision").desc())
    w_all = W.partitionBy("user_id", "event_type")
    return (
        rev.withColumn("rn", F.row_number().over(w_desc))
        .withColumn("n_events", F.count("*").over(w_all))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "n_events",
            F.col("revision").alias("last_revision"),
            F.round("value", 2).alias("last_value"),
        )
        .orderBy("user_id", "event_type")
    )


ES_STATE_PROJECTION_SQL = (
    _REV_CTE
    + """
SELECT user_id, event_type, n_events, last_revision, last_value
FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY revision DESC) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_events,
         revision AS last_revision,
         round(value, 2) AS last_value
  FROM revisioned
  WHERE user_id < 20)
WHERE rn = 1
ORDER BY user_id, event_type
"""
)


def es_hash_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tamper-evidence hash chain per stream — the integrity audit an
    append-only log affords (the reference's whole design thesis is
    immutable, strictly-ordered history; README.md:5-9): fold each
    stream in revision order through h_i = sha256(h_{i-1} || md5(
    event_i)), emitting the head digest. Re-running the audit after
    any mutation of history changes the head — the ledger contract.

    The fold is inherently sequential PER STREAM but embarrassingly
    parallel ACROSS streams, so it runs as applyInPandas over the
    stream key: O(1) state per stream, one shuffle, executors fold
    their streams independently — the same layout the store's append
    path uses. The oracle replays the identical recursion as a
    recursive CTE, checking an imperative fold against a declarative
    one."""
    import hashlib

    import pandas as pd

    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "event_type")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        h = ""
        for eid, et in zip(pdf.event_id, pdf.event_type):
            m = hashlib.md5(f"{eid}:{et}".encode()).hexdigest()
            h = hashlib.sha256((h + m).encode()).hexdigest()
        return pd.DataFrame(
            {"user_id": [pdf.user_id.iloc[0]], "n_events": [len(pdf)], "head_hash": [h[:16]]}
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(fold, "user_id bigint, n_events bigint, head_hash string")
        .orderBy("user_id")
    )


ES_HASH_CHAIN_SQL = """
WITH RECURSIVE revisioned AS (
  SELECT user_id, event_id, event_type,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS revision
  FROM events
),
chain(user_id, revision, h) AS (
  SELECT user_id, revision, sha256(md5(event_id::VARCHAR || ':' || event_type))
  FROM revisioned WHERE revision = 0
  UNION ALL
  SELECT r.user_id, r.revision, sha256(c.h || md5(r.event_id::VARCHAR || ':' || r.event_type))
  FROM chain c JOIN revisioned r ON r.user_id = c.user_id AND r.revision = c.revision + 1
)
SELECT user_id, CAST(max(revision) + 1 AS BIGINT) AS n_events,
       substr(max_by(h, revision), 1, 16) AS head_hash
FROM chain
GROUP BY user_id
ORDER BY user_id
"""


def es_category_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """By-category projection (the EventStoreDB `$ce-` pattern, an
    extension beyond the reference): streams (= user_id) roll up into
    categories (user_id % 10 — the tenant/entity-type prefix a real
    deployment encodes in the stream name), and each category exposes
    one merged, totally-ordered feed: stream count, event count, the
    feed head (last event by (ts, event_id)), and the checkpoint
    position a catch-up subscription would resume from (= feed
    length). The projection a CQRS read-model consumer subscribes to
    instead of N individual streams.

    100 TB: one category-keyed hash aggregate (max-struct head pick +
    counts, map-side combined); category is the natural partition key
    of the projected feed, so a subscriber's replay is a partition
    scan in (ts, event_id) order."""
    ev = load_table(spark, "events", sf_dir)
    cat = (F.col("user_id") % 10).alias("category")
    return (
        ev.select(
            cat,
            "user_id",
            "ts",
            "event_id",
            "event_type",
        )
        .groupBy("category")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_streams"),
            F.count("*").cast("bigint").alias("n_events"),
            F.unix_micros(F.max(F.struct("ts", "event_id")).getField("ts")).alias(
                "head_ts_us"
            ),
            F.max(F.struct("ts", "event_id")).getField("event_id").alias("head_event_id"),
            F.count("*").cast("bigint").alias("checkpoint_position"),
        )
        .orderBy("category")
    )


ES_CATEGORY_SQL = """
SELECT user_id % 10 AS category,
       count(DISTINCT user_id)::BIGINT AS n_streams,
       count(*)::BIGINT AS n_events,
       epoch_us((max(struct_pack(ts := ts, event_id := event_id))).ts) AS head_ts_us,
       (max(struct_pack(ts := ts, event_id := event_id))).event_id AS head_event_id,
       count(*)::BIGINT AS checkpoint_position
FROM events
GROUP BY user_id % 10
ORDER BY category
"""

"""Streaming transformations (SURVEY.md §2 B streaming row): event-time
windows with watermarks, streaming dedup, and custom stateful
processing. The reference is request-driven and has none of these;
they are the north-star stream-processing surface.

Each builder takes an (already streaming) DataFrame with an
event-time column and returns the transformed streaming DataFrame —
callers attach the sink. Batch DataFrames are accepted too (Spark
shares the operator semantics), which is how the oracle tests pin the
window math itself.

Scale: watermarks bound state; windowed aggregation state is
per-(key,window) and expires when the watermark passes window end.
State lives in the state store (RocksDB-backed on a real cluster) —
nothing here accumulates unbounded driver state."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts with a late-data watermark.
    Late rows beyond the watermark are dropped; within it, they update
    their window's aggregate (update/append mode semantics)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sliding_windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in window_len/slide windows."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def session_windowed_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with a gap timeout — the streaming-native form
    of the batch sessionization in queries/relational.py (same 30-min
    gap semantics; session_window merges as late events arrive)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "session_value",
        )
    )


def stream_stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the attribution
    pattern: each purchase matched to the same user's clicks that
    happened in the preceding `within` interval.

    The time-bound condition is what makes this feasible at scale:
    with watermarks on BOTH sides plus the interval constraint, each
    side's join state is droppable once the watermark passes
    (click rows expire after watermark + within; purchase rows after
    watermark) — without the bound, both sides buffer forever. Outer
    variants ('left_outer'/'right_outer') additionally need the time
    bound to know when to emit unmatched rows; note their null-side
    results only flush when a LATER batch advances the watermark, so
    a single availableNow pass emits matches only."""
    c = clicks.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("c_key"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    p = purchases.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias(key_col),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    cond = (
        (F.col("c_key") == F.col(key_col))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}"))
    )
    return p.join(c, cond, how).select(
        key_col,
        "purchase_id",
        "click_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def dedup_within_watermark(
    df: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("user_id", "event_id"),
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop duplicate (keys) arrivals within
    the watermark horizon — the streaming form of the store's
    (source,id) uniqueness gate (A10). State = one entry per key,
    expired at the watermark."""
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))


def stateful_running_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    running event count + max event-time, emitted per micro-batch.
    The template for operators the built-ins can't express (custom
    sketches, decaying counters); state is explicit and per-key, so
    it shards with the key across executors."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    # key column name/type follow key_col — hardcoding LongType
    # "user_id" would crash (Arrow type error) for string keys
    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n_events", T.LongType()),
            T.StructField("max_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("count", T.LongType()), T.StructField("max_ts", T.TimestampType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        count, max_ts = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            count += len(pdf)
            batch_max = pdf[ts_col].max()
            max_ts = batch_max if max_ts is None or batch_max > max_ts else max_ts
        state.update((count, max_ts))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [count], "max_ts": [max_ts]})

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def decaying_rate_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    half_life_s: float = 3600.0,
) -> DataFrame:
    """Exponentially-decayed per-key event rate — a genuinely
    non-windowed stateful operator (every event contributes forever,
    discounted by age): the shape used for rate limiting and
    trending-key detection at ingest.

    State per key: (decayed_count, last_event_us). Each batch decays
    the carried count to the batch's newest event, then adds the
    batch's arrivals discounted by their own age against that anchor.

    Built on applyInPandasWithState. Spark 4's successor API
    (transformWithStateInPandas, typed value state + timers) is a
    mechanical port of this processor but requires google.protobuf at
    runtime, which this container lacks — the RocksDB-backed state
    behavior is identical."""
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("decayed_count", T.DoubleType()),
            T.StructField("last_event_us", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("decayed", T.DoubleType()), T.StructField("last_us", T.LongType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        decayed, last_us = state.get if state.exists else (0.0, None)
        for pdf in pdfs:
            us = (pdf[ts_col].astype("int64") // 1000).to_numpy()
            batch_max = int(us.max())
            anchor = batch_max if last_us is None else max(batch_max, last_us)
            if last_us is not None and anchor > last_us:
                decayed *= math.pow(2.0, -(anchor - last_us) / 1e6 / half_life_s)
            decayed += sum(math.pow(2.0, -(anchor - int(u)) / 1e6 / half_life_s) for u in us)
            last_us = anchor
        state.update((float(decayed), int(last_us)))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "decayed_count": [round(float(decayed), 6)],
                "last_event_us": [int(last_us)],
            }
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_counters(df: DataFrame, token_col: str = "t", d: int = 4, w: int = 64) -> DataFrame:
    """Streaming count-min sketch: maintain the d×w counter table
    over an unbounded token stream as a plain streaming aggregation.
    The sketch's mergeability is exactly Spark's partial-aggregation
    contract, so the state store holds at most d·w rows (256 by
    default) FOREVER — a fixed-size summary of an unbounded stream,
    the whole point of sketching. Heavy-hitter estimates join a
    candidate set against this table with min-over-rows, identically
    to the batch twin (queries/text.py tokens_heavy_hitters — the
    SAME cms_rb_structs hash exprs, so a batch replay of the stream
    produces counter-for-counter the same sketch, which the streaming
    test asserts).

    Works on batch DataFrames too (shared operator semantics) —
    that's how the sketch math itself is pinned."""
    from hematite_spark.functions import cms_rb_structs

    hashed = df.select(F.explode(F.array(*cms_rb_structs(F.col(token_col), d=d, w=w))).alias("rb"))
    return hashed.groupBy("rb.r", "rb.bucket").agg(F.count("*").alias("c"))


def stateful_latest_state(
    df: DataFrame,
    key_cols: tuple[str, str] = ("user_id", "event_type"),
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch es_state_projection fold (the
    Kappa-architecture contract: one definition of 'current state',
    maintainable from either the log replay or the live stream): per
    (stream, event_type) cell, carry the event count and the latest
    (event-time, event-id)-ordered value across micro-batches via
    applyInPandasWithState. Late or duplicate arrivals within a batch
    are handled by the explicit (ts, event_id) ordering; cross-batch,
    the state keeps the winning (ts, event_id) so an older event can
    never overwrite a newer one — the same last-writer-wins rule the
    batch window uses. State is O(1) per cell and shards on the key."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    k1, k2 = key_cols
    output_schema = T.StructType(
        [
            T.StructField(k1, df.schema[k1].dataType),
            T.StructField(k2, df.schema[k2].dataType),
            T.StructField("n_events", T.LongType()),
            T.StructField("last_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("count", T.LongType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("last_id", T.LongType()),
            T.StructField("last_value", T.DoubleType()),
        ]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        count, last_ts, last_id, last_value = (
            state.get if state.exists else (0, None, None, None)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, "event_id"])
            count += len(pdf)
            tail = pdf.iloc[-1]
            if last_ts is None or (tail[ts_col], tail.event_id) > (last_ts, last_id):
                last_ts, last_id, last_value = tail[ts_col], int(tail.event_id), float(tail.value)
        state.update((count, last_ts, last_id, last_value))
        yield pd.DataFrame(
            {k1: [key[0]], k2: [key[1]], "n_events": [count], "last_value": [round(last_value, 2)]}
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_distinct_stream(df: DataFrame, key_col: str = "event_type", id_col: str = "user_id", k: int = 8) -> DataFrame:
    """Streaming KMV distinct-count sketch: per key, maintain the K
    smallest 32-bit md5 hashes of the id column across micro-batches
    (applyInPandasWithState; state = one sorted K-list per key, O(K)
    bytes). Each batch emits the key's current kth-minimum and the
    (K-1)/kth estimate. Mergeability makes this the streaming twin of
    the batch kmv_sketch_merge operator (queries/udf.py): the final
    state after any micro-batch split equals the batch sketch over
    the union — asserted in tests/test_streaming.py.

    At scale the state shards by key across executors and never
    grows; this is the pattern for 'distinct users per key, live'
    without unbounded dropDuplicates state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    # hash JVM-side so the stream and the batch twin agree bit-for-bit
    h32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    hashed = df.select(F.col(key_col), h32.alias("h"))
    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n_tracked", T.LongType()),
            T.StructField("kth_min", T.LongType()),
            T.StructField("est_distinct", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("kmin", T.ArrayType(T.LongType()))])

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        kmin = list(state.get[0]) if state.exists else []
        seen = set(kmin)
        for pdf in pdfs:
            seen.update(int(x) for x in pdf["h"])
        kmin = sorted(seen)[:k]
        state.update((kmin,))
        kth = kmin[k - 1] if len(kmin) >= k else None
        est = round((k - 1) * 4294967296.0 / kth, 4) if kth else float(len(kmin))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_tracked": [len(kmin)],
                "kth_min": [kth],
                "est_distinct": [est],
            }
        )

    return hashed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def welford_moments_stream(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Streaming running moments via Chan's parallel Welford merge:
    per key, maintain (n, mean, M2) across micro-batches — O(3 doubles)
    state per key — and emit the running mean/stddev plus a 3σ anomaly
    count of the CURRENT batch scored against the PRE-batch moments
    (the live data-quality tripwire; scoring before merging avoids a
    batch of outliers masking itself). The merge is the same
    associative moment algebra the batch agg_incremental_merge proves,
    so the final state after any micro-batch split equals the batch
    count/avg/stddev_pop — asserted in tests/test_streaming.py.

    At scale the state shards by key; each micro-batch reduces to one
    (n, mean, M2) triple per key per batch before touching state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    src = df.select(F.col(key_col), F.col(value_col).cast("double").alias("v"))
    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("stddev_pop", T.DoubleType()),
            T.StructField("batch_anomalies", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("m2", T.DoubleType()),
        ]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        n0, mean0, m20 = state.get if state.exists else (0, 0.0, 0.0)
        vals = pd.concat([p["v"] for p in pdfs], ignore_index=True)
        nb = len(vals)
        anomalies = 0
        if n0 >= 2:
            sd0 = (m20 / n0) ** 0.5
            if sd0 > 0:
                anomalies = int(((vals - mean0).abs() > 3 * sd0).sum())
        if nb:
            mean_b = float(vals.mean())
            m2_b = float(((vals - mean_b) ** 2).sum())
            delta = mean_b - mean0
            n = n0 + nb
            mean = mean0 + delta * nb / n
            m2 = m20 + m2_b + delta * delta * n0 * nb / n
        else:
            n, mean, m2 = n0, mean0, m20
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "mean": [mean],
                "stddev_pop": [(m2 / n) ** 0.5 if n else 0.0],
                "batch_anomalies": [anomalies],
            }
        )

    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ks_baseline_summary(
    df: DataFrame, value_col: str = "value", bins: int = 32
) -> tuple[list[float], list[float], int]:
    """Summarize a STATIC baseline distribution into a quantile-grid
    CDF for the streaming KS drift gate: exact ``bins``-quantile edges
    (approxQuantile at relativeError=0) plus the baseline CDF evaluated
    at each edge, computed in ONE aggregate pass. The summary is O(bins)
    numbers — broadcast-sized however large the baseline corpus is.

    Binning bounds the KS statistic's error by the largest bin's mass
    (≤ 1/bins + ties): D_binned ≤ D_exact ≤ D_binned + 1/bins — the
    standard trade that makes a streaming two-sample KS possible with
    bounded state (the exact batch twin, queries/advanced.ks_two_sample,
    sorts the pooled sample instead)."""
    probs = [i / bins for i in range(1, bins + 1)]
    edges = sorted(set(df.stat.approxQuantile(value_col, probs, 0.0)))
    if not edges:
        raise ValueError(
            "empty baseline: ks_baseline_summary needs at least one "
            f"non-null {value_col!r} row to build the quantile grid"
        )
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col(value_col) <= F.lit(e)).cast("long")).alias(f"c{i}")
            for i, e in enumerate(edges)
        ],
    ).collect()[0]
    n = int(row["n"])
    cdf = [int(row[f"c{i}"]) / n for i in range(len(edges))]
    return edges, cdf, n


def ks_drift_stream(
    df: DataFrame,
    edges: list[float],
    base_cdf: list[float],
    n_baseline: int,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming two-sample Kolmogorov-Smirnov drift gate — the live
    twin of the batch ks_two_sample (queries/advanced.py): per key,
    maintain cumulative counts-at-or-below each baseline quantile edge
    (applyInPandasWithState; state = len(edges)+1 longs per key) and
    emit the running binned KS D = max|ECDF_stream(e) − CDF_base(e)|
    with the 95% threshold 1.358·√((n+m)/nm) and a drifted flag.

    Merging per-batch edge-counts into state is associative addition,
    so the final state after ANY micro-batch split equals the batch
    binned ECDF over the union — asserted cell-for-cell in
    tests/test_streaming.py against a plain batch aggregate on the
    same edges.

    At scale the state shards by key and never grows (O(bins) longs);
    the baseline summary is a broadcast-sized constant, so the gate
    adds no shuffle beyond the keyed state exchange."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    src = df.select(F.col(key_col), F.col(value_col).cast("double").alias("v"))
    key_type = df.schema[key_col].dataType
    output_schema = T.StructType(
        [
            T.StructField(key_col, key_type),
            T.StructField("n_stream", T.LongType()),
            T.StructField("ks_d", T.DoubleType()),
            T.StructField("threshold_95", T.DoubleType()),
            T.StructField("drifted", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n", T.LongType()),
        ]
    )
    edges_arr = list(map(float, edges))
    cdf_arr = list(map(float, base_cdf))
    m = float(n_baseline)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.exists:
            counts, n = list(state.get[0]), int(state.get[1])
        else:
            counts, n = [0] * len(edges_arr), 0
        vals = pd.concat([p["v"] for p in pdfs], ignore_index=True).to_numpy()
        if len(vals):
            vals.sort()
            batch_counts = np.searchsorted(vals, edges_arr, side="right")
            counts = [c + int(b) for c, b in zip(counts, batch_counts)]
            n += len(vals)
        state.update((counts, n))
        if n:
            d = max(abs(c / n - b) for c, b in zip(counts, cdf_arr))
            thr = 1.358 * ((n + m) / (n * m)) ** 0.5
        else:
            d, thr = 0.0, float("inf")
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_stream": [n],
                "ks_d": [round(d, 6)],
                "threshold_95": [round(thr, 6)],
                "drifted": [d > thr],
            }
        )

    return src.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_enrichment(
    stream_df: DataFrame, dim_df: DataFrame, key_col: str = "cohort"
) -> DataFrame:
    """Stream-static dimension enrichment — the most common streaming
    join in production: each micro-batch equi-joins against a STATIC
    (or slowly-refreshed) dimension table, which Spark broadcasts per
    batch with no streaming state at all (unlike stream-stream joins,
    nothing waits for a watermark). The stream's events pick up their
    cohort's segment label and aggregate per (segment, event_type) —
    the live dashboard cut.

    At scale the dim is the broadcast side by construction (it is
    dimension-sized); re-reading it per batch is what picks up dim
    updates between batches."""
    enriched = stream_df.withColumn(key_col, F.col("user_id") % 4).join(
        F.broadcast(dim_df), key_col
    )
    return enriched.groupBy("segment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value").alias("total_value"),
    )

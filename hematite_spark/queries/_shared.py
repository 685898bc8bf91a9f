"""DuckDB-oracle SQL helper fragments shared by several thematic
query modules (round-8 split of advanced.py), plus the checkpoint
lifecycle helpers (round 13)."""

from __future__ import annotations


def release_checkpoint(*dfs) -> None:
    """Unpersist the RDD blocks behind localCheckpointed DataFrames.

    Round 13 (VERDICT r12 item 2): ``Dataset.localCheckpoint``
    registers its materialized RDD in the SparkContext's persistent-RDD
    map and NOTHING in a normal query lifecycle ever releases it —
    dropping the Python reference does not help (the map holds the JVM
    object until a FULL GC, and Spark's own periodic GC defaults to
    every 30 minutes), so a long-lived session accumulates every
    checkpoint it ever made. Measured: 53-query bench suite × 3 reps
    retained 100+ block sets, and the storage/GC pressure made the
    32-core suite SLOWER than the same suite at 8 cores. At 100 TB the
    same leak is executors OOMing on retained storage blocks.

    Call this on checkpointed intermediates the moment their last
    consumer has materialized (checkpoints are eager, so "the last
    downstream checkpoint/collect happened" is a build-time event).
    Never call it on a frame the RETURNED plan still reads — a local
    checkpoint has no lineage to recompute from, so unpersisting a
    live one makes the next action fail.

    Non-DataFrame / non-checkpointed arguments are ignored: the RDD
    accessor is best-effort (private-API shape verified on Spark 4.x),
    and release is an optimization, never a correctness dependency."""
    for df in dfs:
        try:
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass


def release_all_checkpoints(spark) -> None:
    """Unpersist EVERY persisted RDD in the session — the between-
    queries hygiene for sequential drivers (bench.py, check_oracle).

    Safe exactly when nothing built earlier will be re-executed: each
    bench/oracle iteration rebuilds its DataFrame from the parquet
    inputs, so blocks from the previous query are dead weight. Not for
    use mid-query or in sessions that hold live handles to earlier
    frames."""
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                pass
    except Exception:
        pass


_DUCK_HASH_PCT_EVENTS = (
    "(((strpos('0123456789abcdef', md5(event_id::VARCHAR)[1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[4]) - 1)) % 100)"
)

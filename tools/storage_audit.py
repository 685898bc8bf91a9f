"""Storage-block accumulation audit (round 13, VERDICT r12 item 2).

Runs the headline suite in bench order and records, after each query's
noop write + the bench's own `del df; gc.collect()` hygiene, how many
RDD storage blocks remain persisted in the JVM and their total
memory/disk footprint. Quantifies the leak the bench's Python-side GC
cannot reach: localCheckpoint registers the RDD in the context's
persistentRdds map and nothing ever unpersists, so blocks pile up
until Spark's periodic full GC (default every 30 MIN) — far longer
than a bench rep.

Usage: python tools/storage_audit.py [query ...]
  (default: the dedup-family bench queries; pass 'all' for the full
  headline suite). With --release, applies
  hematite_spark.queries._shared.release_all_checkpoints after each
  query — the A/B for the round-13 fix.
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "dedup_minhash", "dedup_connected_components", "dedup_semantic",
    "dedup_containment", "dedup_keeper_selection", "lsh_precision_recall",
    "rec_hitrate_eval", "entity_resolution_pipeline", "lsh_band_auc",
    "source_overlap_matrix", "label_propagation_step", "retrieval_ndcg_audit",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from hematite_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    release = "--release" in sys.argv
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    from bench import HEADLINE
    names = HEADLINE if args == ["all"] else (args or DEFAULT)

    spark = get_spark("storage_audit")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()

    def storage() -> tuple[int, int, int]:
        infos = sc._jsc.sc().getRDDStorageInfo()
        return (
            len(infos),
            sum(i.memSize() for i in infos) >> 20,
            sum(i.diskSize() for i in infos) >> 20,
        )

    # storageMemoryUsed covers broadcast blocks too (TorrentBroadcast
    # pieces live in the same storage pool but never appear in
    # getRDDStorageInfo); heap + cumulative GC ms from JMX separate
    # "blocks retained" from "JVM old-gen churn".
    mf = sc._jvm.java.lang.management.ManagementFactory

    def jvm() -> tuple[int, int, int]:
        env = sc._jvm.org.apache.spark.SparkEnv.get()
        store_mb = env.memoryManager().storageMemoryUsed() >> 20
        heap_mb = mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() >> 20
        gc_ms = sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())
        return store_mb, heap_mb, gc_ms

    if release:
        from hematite_spark.queries._shared import release_all_checkpoints

    prev_gc = jvm()[2]
    for rep in range(1, reps + 1):
        for name in names:
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            del df
            gc.collect()
            if release:
                release_all_checkpoints(spark)
            n, mem, disk = storage()
            store_mb, heap_mb, gc_ms = jvm()
            print(
                f"rep{rep} {name:32s} {wall:6.2f}s  rdds={n:3d} "
                f"rdd_mem={mem:5d}MB store={store_mb:6d}MB heap={heap_mb:6d}MB "
                f"gc+={gc_ms - prev_gc:5d}ms",
                flush=True,
            )
            prev_gc = gc_ms


if __name__ == "__main__":
    main()

"""User-defined function surface (SURVEY.md §2 B, UDF/UDAF/UDTF row):
the three extension points Spark gives for semantics the built-ins
can't express, each demonstrated on testdata with a DuckDB oracle.

* pandas UDAF (grouped-agg `pandas_udf`) — Arrow-batched vectorized
  aggregation; executes once per group partition with map-side
  partials unavailable (UDAFs don't partial-agg), so keep groups
  coarse. Used only where no built-in algebraic rewrite exists — the
  geometric mean here deliberately ALSO has an exp/ln rewrite, which
  the oracle uses, proving the UDAF correct against the algebraic
  form.
* Python UDTF — table function emitting multiple rows per input row
  (Spark 4 `@udtf`); the lateral-join operator for tokenize/expand
  steps. The built-in explode covers most cases (and is preferred —
  JVM-side); the UDTF exists for generators with per-row logic.
* Row-scalar UDFs are deliberately absent from the hot path —
  pandas UDFs (multimodal module) or built-ins everywhere.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hematite_spark.io import load_table


def udaf_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean of order value per status via a grouped-agg
    pandas UDAF (Arrow transfer, one numpy reduction per group)."""
    import numpy as np

    @F.pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    # pandas UDAFs can't mix with JVM aggregates in one agg()
    # (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a UDAF too
    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.round(geomean("o_totalprice"), 2).alias("geomean_price"), n_rows("o_totalprice").alias("n"))
        .orderBy("o_orderstatus")
    )


UDAF_GEOMEAN_SQL = """
SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 2) AS geomean_price,
       count(*) AS n
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-bigrams across documents via a Python UDTF lateral
    join — each doc row expands to its bigrams, then a plain
    count/top-k. The UDTF is the per-row generator extension point;
    the equivalent explode() pipeline (queries/dedup.py shingles) is
    the JVM-side fast path."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            words = " ".join((text or "").strip().split()).split(" ")
            for i in range(len(words) - 1):
                yield (words[i] + " " + words[i + 1],)

    spark.udtf.register("bigrams_udtf", Bigrams)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        """
        SELECT b.bigram, count(*) AS n_docs_with
        FROM documents_udtf_src d, LATERAL bigrams_udtf(d.text) b
        GROUP BY b.bigram
        HAVING count(*) >= 5
        ORDER BY n_docs_with DESC, bigram
        LIMIT 20
        """
    )


UDTF_BIGRAMS_SQL = """
WITH words AS (
  SELECT doc_id, string_split(regexp_replace(trim(text), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
), bigrams AS (
  SELECT w[i] || ' ' || w[i + 1] AS bigram
  FROM words, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i)
)
SELECT bigram, count(*) AS n_docs_with
FROM bigrams
GROUP BY bigram
HAVING count(*) >= 5
ORDER BY n_docs_with DESC, bigram
LIMIT 20
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per return flag — the
    100 TB path for distinct counting (constant memory, partial-
    mergeable, vs the exact shuffle in agg_distinct).

    Raw sketch estimates are engine-specific, so the oracle-matched
    output is a *contract*: exact distinct counts (identical in both
    engines) plus a boolean per sketch asserting each engine's OWN
    estimate lands within 5% (or ±2) of its own exact count. If
    either engine's HLL blows its error bound the boolean flips and
    the value-hash comparison fails — a checked contract rather than
    a rows-only row. Absolute errors asserted in unit tests too.

    Plan note (round 8): two countDistinct columns in ONE aggregate
    make Catalyst Expand every row 3× (one projection per distinct
    group + one for the plain aggregates) before the partial hash —
    ×64 probe measured 162 s. Instead each key runs its own
    dedup-then-count pass (dropDuplicates partial-aggregates
    map-side; count + HLL over the deduped pairs — HLL is a set
    sketch, so the estimate over distinct values is bit-identical to
    the estimate over raw rows), and the two 3-row results join.
    Measured: sf0.1 6.0 → 2.0 s; the scans also prune to two columns
    each instead of three."""
    li = load_table(spark, "lineitem", sf_dir)

    def one(key: str, exact_name: str, approx_name: str) -> DataFrame:
        return (
            li.select("l_returnflag", key)
            .where(F.col(key).isNotNull())
            .dropDuplicates(["l_returnflag", key])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias(exact_name),
                F.approx_count_distinct(key, rsd=0.02).alias(approx_name),
            )
        )

    parts = one("l_partkey", "exact_parts", "_ap")
    orders = one("l_orderkey", "exact_orders", "_ao")

    def within(est, exact):
        return F.abs(est - F.col(exact)) <= F.greatest(
            0.05 * F.col(exact), F.lit(2.0)
        )

    return (
        parts.join(orders, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_orders",
            within(F.col("_ap"), "exact_parts").alias("parts_within_bound"),
            within(F.col("_ao"), "exact_orders").alias("orders_within_bound"),
        )
        .orderBy("l_returnflag")
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       count(DISTINCT l_orderkey) AS exact_orders,
       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         <= greatest(0.05 * count(DISTINCT l_partkey), 2.0) AS parts_within_bound,
       abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
         <= greatest(0.05 * count(DISTINCT l_orderkey), 2.0) AS orders_within_bound
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (Greenwald-Khanna) per order status —
    the 100 TB path for quantiles: single pass, bounded memory,
    mergeable partials, vs the exact sort-based percentile in
    agg_percentiles (the correctness anchor).

    Raw estimates are engine-specific (Spark GK vs DuckDB t-digest),
    so the oracle-matched output is a rank-error *contract*: each
    engine computes its own estimate, then counts how many rows fall
    strictly-below / at-or-below it; the implied rank must land
    within max(2% of n, 3) rows of the target rank. Both engines
    emit (n_orders, within-bound booleans) — identical values unless
    a sketch breaks its bound, in which case the hash comparison
    fails. The tighter ±1/accuracy Spark-side contract is asserted
    in unit tests."""
    orders = load_table(spark, "orders", sf_dir)
    est = orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias("_med"),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(1000)).alias("_p90"),
    )
    j = orders.join(F.broadcast(est), "o_orderstatus")
    n = F.count("*")
    slack = F.greatest(0.02 * n, F.lit(3.0))
    def rank_ok(frac, est_col):
        below = F.sum((F.col("o_totalprice") < F.col(est_col)).cast("long"))
        at_or_below = F.sum((F.col("o_totalprice") <= F.col(est_col)).cast("long"))
        return (below <= frac * n + slack) & (at_or_below >= frac * n - slack)
    return (
        j.groupBy("o_orderstatus")
        .agg(
            n.alias("n_orders"),
            rank_ok(F.lit(0.5), "_med").alias("median_within_bound"),
            rank_ok(F.lit(0.9), "_p90").alias("p90_within_bound"),
        )
        .orderBy("o_orderstatus")
    )


AGG_APPROX_PERCENTILES_SQL = """
WITH est AS (
  SELECT o_orderstatus,
         approx_quantile(o_totalprice, 0.5) AS med_est,
         approx_quantile(o_totalprice, 0.9) AS p90_est
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus,
       count(*) AS n_orders,
       (sum(CASE WHEN o.o_totalprice < e.med_est THEN 1 ELSE 0 END)
          <= 0.5 * count(*) + greatest(0.02 * count(*), 3.0)
        AND sum(CASE WHEN o.o_totalprice <= e.med_est THEN 1 ELSE 0 END)
          >= 0.5 * count(*) - greatest(0.02 * count(*), 3.0)) AS median_within_bound,
       (sum(CASE WHEN o.o_totalprice < e.p90_est THEN 1 ELSE 0 END)
          <= 0.9 * count(*) + greatest(0.02 * count(*), 3.0)
        AND sum(CASE WHEN o.o_totalprice <= e.p90_est THEN 1 ELSE 0 END)
          >= 0.9 * count(*) - greatest(0.02 * count(*), 3.0)) AS p90_within_bound
FROM orders o JOIN est e USING (o_orderstatus)
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


def pandas_grouped_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the §2 B UDF row's third member
    beside the pandas UDAF and the UDTF): per-event-type decile
    assignment of `value`, computed inside an Arrow-batched pandas
    function — the extension point for per-group logic that needs the
    whole group in memory (model scoring, per-tenant calibration).

    Each group ships to ONE python worker as a pandas frame (state is
    bounded by the largest group — at 100 TB that means salting giant
    groups first); the output is integers from a total order
    (value, event_id), so the oracle comparison is exact — no float
    rounding anywhere."""
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("decile", T.LongType()),
        ]
    )

    def deciles(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "decile": (10 * pdf.index // n).astype("int64"),
            }
        )

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(deciles, schema=out_schema).orderBy("event_id")


PANDAS_DECILE_SQL = """
SELECT event_id, event_type,
       CAST((10 * (row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) - 1))
            // count(*) OVER (PARTITION BY event_type) AS BIGINT) AS decile
FROM events
ORDER BY event_id
"""


def kmv_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch with the mergeable-
    partial contract, per event type over distinct users. The sketch is
    the K smallest 32-bit hashes of the distinct key set; the estimate
    is (K-1) / normalized kth minimum. Partials (here: user-parity
    halves; in production: shards/days) keep only their own K smallest
    hashes, and a union-then-rank merge reproduces the direct sketch
    EXACTLY — the property that lets 100 TB pipelines answer
    "distinct users across any union of shards" from O(K) state per
    shard, no recount (same contract family as minhash_signature_merge
    and agg_incremental_merge).

    Scale note: the per-type ranking windows here run over the distinct
    hash set to exhibit BOTH paths; production maintains only the
    partial path, where each shard's window is shard-local and the
    merge ranks |shards|*K rows. K=8 keeps the contract satisfiable at
    sf0.001 (15 users/type); the estimate is deliberately coarse — the
    value-checked columns are the contract (kth hashes agree) and the
    relative error, identical in both engines by construction (md5)."""
    from pyspark.sql.window import Window

    K = 8
    ev = load_table(spark, "events", sf_dir)
    h32 = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    hashes = ev.select("event_type", h32.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kth_direct = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == K)
        .select("event_type", F.col("h").alias("kth_direct"))
    )
    # partial path: per (type, half) keep the K smallest, merge by
    # union + distinct + re-rank — O(K) state per partial
    ph = ev.select(
        "event_type", (F.col("user_id") % 2).alias("half"), h32.alias("h")
    ).distinct()
    wp = Window.partitionBy("event_type", "half").orderBy("h")
    kmin = (
        ph.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= K)
        .select("event_type", "h")
        .distinct()
    )
    kth_merged = (
        kmin.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == K)
        .select("event_type", F.col("h").alias("kth_merged"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    est = F.round(F.lit(float(K - 1)) * F.lit(4294967296.0) / F.col("kth_direct"), 4)
    return (
        exact.join(kth_direct, "event_type")
        .join(kth_merged, "event_type")
        .select(
            "event_type",
            "exact_users",
            "kth_direct",
            "kth_merged",
            (F.col("kth_direct") == F.col("kth_merged")).alias("merge_agrees"),
            est.alias("est_distinct"),
            F.round(F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4).alias(
                "rel_err"
            ),
        )
        .orderBy("event_type")
    )


_KMV_H32 = "(" + " + ".join(
    f"(strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[{i + 1}]) - 1) * {16 ** (7 - i)}"
    for i in range(8)
) + ")"

KMV_SKETCH_MERGE_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type, CAST({_KMV_H32} AS BIGINT) AS h FROM events),
direct AS (
  SELECT event_type, h AS kth_direct
  FROM (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hashes)
  WHERE rn = 8),
ph AS (
  SELECT DISTINCT event_type, user_id % 2 AS half, CAST({_KMV_H32} AS BIGINT) AS h FROM events),
kmin AS (
  SELECT DISTINCT event_type, h
  FROM (SELECT event_type, h, row_number() OVER (PARTITION BY event_type, half ORDER BY h) AS rn FROM ph)
  WHERE rn <= 8),
merged AS (
  SELECT event_type, h AS kth_merged
  FROM (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM kmin)
  WHERE rn = 8),
exact AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_users FROM events GROUP BY event_type)
SELECT event_type, exact_users, kth_direct, kth_merged,
       kth_direct = kth_merged AS merge_agrees,
       round(7.0 * 4294967296.0 / kth_direct, 4) AS est_distinct,
       round(abs(round(7.0 * 4294967296.0 / kth_direct, 4) - exact_users) / exact_users, 4) AS rel_err
FROM exact JOIN direct USING (event_type) JOIN merged USING (event_type)
ORDER BY event_type
"""


def cms_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d=4 rows x w=32 buckets) over per-user event
    counts, with the mergeable-partial contract — the frequency-sketch
    member of the mergeable family (KMV = distinct, MinHash = Jaccard,
    HLL = distinct-approx, GK = quantiles). Each of the d hash rows
    maps user_id to one of w counters; a cell is the sum of counts of
    every user landing there, and the point estimate for a user is the
    MIN over its d cells — an overestimate by construction (collisions
    only ever add), never an underestimate.

    Contract columns: partials built per user-parity half (in
    production: per shard/day) and merged by cell-wise SUM must equal
    the directly-built sketch cell-for-cell (`cells_mismatch` = 0) —
    counters are associative, so shards stream O(d*w) ints each and
    the coordinator never replays raw events. `never_underestimates`
    pins the one-sided CMS error bound on the heaviest user per type.

    100 TB: state is d*w*|types| counters regardless of row count;
    the scan is one hash-aggregate with map-side combine, the merge
    shuffles |shards|*d*w rows, and the top-user probe joins a
    broadcast 3-row key set against the cell table. The streaming twin
    (streaming/windows.py cms_counters) maintains the same cells
    incrementally."""
    from pyspark.sql.window import Window

    d_rows, width = 4, 32
    ev = load_table(spark, "events", sf_dir).select("event_type", "user_id")

    def _bucket(i: int):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(i)), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        return h % width

    long = ev.select(
        "event_type",
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("i"), _bucket(i).alias("bucket"))
                    for i in range(d_rows)
                ]
            )
        ).alias("ib"),
    ).select(
        "event_type", "user_id", F.col("ib.i").alias("i"), F.col("ib.bucket").alias("bucket")
    ).localCheckpoint()  # feeds direct cells, partial cells and the
    # top-user probe — materialize the hash fan-out once

    direct = long.groupBy("event_type", "i", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    merged = (
        long.withColumn("half", F.col("user_id") % 2)
        .groupBy("event_type", "half", "i", "bucket")
        .agg(F.count("*").alias("cnt"))
        .groupBy("event_type", "i", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    audit = (
        direct.alias("d")
        .join(merged.alias("m"), ["event_type", "i", "bucket"], "full_outer")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("d.cnt").eqNullSafe(F.col("m.cnt")), 0).otherwise(1)
            ).cast("bigint").alias("cells_mismatch"),
            F.count("*").cast("bigint").alias("n_cells"),
        )
    )
    cnts = ev.groupBy("event_type", "user_id").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("exact_cnt"), "user_id")
    top = (
        cnts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("user_id").alias("top_user"), "exact_cnt")
    )
    est = (
        top.alias("t")
        .join(
            long.alias("l"),
            (F.col("l.event_type") == F.col("t.event_type"))
            & (F.col("l.user_id") == F.col("t.top_user")),
        )
        .select("t.event_type", "t.top_user", "t.exact_cnt", "l.i", "l.bucket")
        .distinct()
        .join(direct, ["event_type", "i", "bucket"])
        .groupBy("event_type", "top_user", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        est.join(audit, "event_type")
        .select(
            "event_type",
            "top_user",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") >= F.col("exact_cnt")).alias("never_underestimates"),
            "cells_mismatch",
            "n_cells",
        )
        .orderBy("event_type")
    )


def _h32_sql(expr: str) -> str:
    """First 8 hex chars of md5(expr) as a bigint — DuckDB twin of
    conv(substring(md5(x),1,8),16,10)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', md5({expr})[{i + 1}]) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ) + ")"


_CMS_LONG = " UNION ALL ".join(
    f"SELECT event_type, user_id, {i} AS i, "
    + f"CAST({_h32_sql(repr(str(i) + ':') + ' || CAST(user_id AS VARCHAR)')} AS BIGINT) % 32 AS bucket FROM ev"
    for i in range(4)
)

CMS_SKETCH_MERGE_SQL = f"""
WITH ev AS (SELECT event_type, user_id FROM events),
long AS ({_CMS_LONG}),
direct AS (
  SELECT event_type, i, bucket, count(*)::BIGINT AS cnt
  FROM long GROUP BY event_type, i, bucket),
merged AS (
  SELECT event_type, i, bucket, CAST(sum(cnt) AS BIGINT) AS cnt
  FROM (SELECT event_type, user_id % 2 AS half, i, bucket, count(*) AS cnt
        FROM long GROUP BY event_type, half, i, bucket)
  GROUP BY event_type, i, bucket),
audit AS (
  SELECT coalesce(d.event_type, m.event_type) AS event_type,
         sum(CASE WHEN d.cnt IS NOT DISTINCT FROM m.cnt THEN 0 ELSE 1 END)::BIGINT AS cells_mismatch,
         count(*)::BIGINT AS n_cells
  FROM direct d FULL OUTER JOIN merged m
    ON d.event_type = m.event_type AND d.i = m.i AND d.bucket = m.bucket
  GROUP BY coalesce(d.event_type, m.event_type)),
top AS (
  SELECT event_type, user_id AS top_user, exact_cnt
  FROM (SELECT event_type, user_id, count(*)::BIGINT AS exact_cnt,
               row_number() OVER (PARTITION BY event_type ORDER BY count(*) DESC, user_id) AS rn
        FROM ev GROUP BY event_type, user_id)
  WHERE rn = 1),
est AS (
  SELECT event_type, top_user, exact_cnt, min(cnt) AS cms_est
  FROM (SELECT DISTINCT t.event_type, t.top_user, t.exact_cnt, l.i, l.bucket
        FROM top t JOIN long l ON l.event_type = t.event_type AND l.user_id = t.top_user)
  JOIN direct USING (event_type, i, bucket)
  GROUP BY event_type, top_user, exact_cnt)
SELECT event_type, top_user, exact_cnt, cms_est,
       cms_est >= exact_cnt AS never_underestimates,
       cells_mismatch, n_cells
FROM est JOIN audit USING (event_type)
ORDER BY event_type
"""


def bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive-rate audit — build an m=1024-bit,
    k=3 filter over the member set (user_id ≡ 0 mod 3), probe it with
    every non-member, and compare the MEASURED false-positive rate to
    the theoretical (1-e^{-kn/m})^k. The sizing contract every
    Bloom-prefiltered join (bloom_semi_join_reduction) rests on,
    turned into a checked value: `within_2x` pins measured ≤ 2×
    theoretical + slack.

    100 TB: the filter is a ≤m-row distinct-position table built by
    one aggregate and BROADCAST to the probe side (m bits ≪ memory);
    a probe is positive iff all k positions hit — counted by one
    semi-join-then-count-equals-k aggregate. No state beyond the m
    positions; the probe scan is one pass."""
    m, k = 1024, 3
    ev = load_table(spark, "events", sf_dir).select("user_id").distinct()
    member = ev.where(F.col("user_id") % 3 == 0)
    probe = ev.where(F.col("user_id") % 3 != 0)

    def positions(df):
        return df.select(
            "user_id",
            F.explode(
                F.array(
                    *[
                        (
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":", F.lit(str(i)), F.col("user_id").cast("string")
                                        )
                                    ),
                                    1,
                                    8,
                                ),
                                16,
                                10,
                            ).cast("bigint")
                            % m
                        )
                        for i in range(k)
                    ]
                )
            ).alias("pos"),
        )

    bits = positions(member).select("pos").distinct()
    hits = (
        positions(probe)
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_hit"))
        .where(F.col("n_hit") == k)
    )
    n_members = member.agg(F.count("*").alias("n")).select(F.col("n").cast("bigint"))
    n_probes = probe.agg(F.count("*").alias("n")).select(F.col("n").cast("bigint"))
    n_fp = hits.agg(F.count("*").alias("n")).select(F.col("n").cast("bigint"))
    n_bits = bits.agg(F.count("*").alias("n")).select(F.col("n").cast("bigint"))
    out = (
        n_members.toDF("n_members")
        .crossJoin(n_probes.toDF("n_probes"))
        .crossJoin(n_fp.toDF("n_false_positives"))
        .crossJoin(n_bits.toDF("n_bits_set"))
    )
    import math  # noqa: F401  (documentational: theory formula below)

    theo = F.pow(
        F.lit(1.0) - F.exp(-F.lit(float(k)) * F.col("n_members") / F.lit(float(m))),
        F.lit(float(k)),
    )
    return out.select(
        "n_members",
        "n_probes",
        "n_bits_set",
        "n_false_positives",
        F.round(F.col("n_false_positives") / F.col("n_probes"), 6).alias("measured_fpr"),
        F.round(theo, 6).alias("theoretical_fpr"),
        (
            F.col("n_false_positives") / F.col("n_probes")
            <= F.lit(2.0) * theo + F.lit(0.01)
        ).alias("within_2x"),
    )


_BLOOM_POS = " UNION ALL ".join(
    "SELECT user_id, (((strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[1]) - 1) * 268435456"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[2]) - 1) * 16777216"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[3]) - 1) * 1048576"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[4]) - 1) * 65536"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[5]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[6]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[7]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5('{i}:' || CAST(user_id AS VARCHAR))[8]) - 1)) % 1024) AS pos"
    " FROM {{src}}".format(i=i)
    for i in range(3)
)

BLOOM_FPR_SQL = f"""
WITH keys AS (SELECT DISTINCT user_id FROM events),
member AS (SELECT user_id FROM keys WHERE user_id % 3 = 0),
probe AS (SELECT user_id FROM keys WHERE user_id % 3 <> 0),
bits AS (SELECT DISTINCT pos FROM ({_BLOOM_POS.format(src="member")})),
probe_pos AS ({_BLOOM_POS.format(src="probe")}),
fp AS (
  SELECT p.user_id
  FROM probe_pos p JOIN bits b USING (pos)
  GROUP BY p.user_id
  HAVING count(*) = 3),
agg AS (
  SELECT (SELECT count(*)::BIGINT FROM member) AS n_members,
         (SELECT count(*)::BIGINT FROM probe) AS n_probes,
         (SELECT count(*)::BIGINT FROM bits) AS n_bits_set,
         (SELECT count(*)::BIGINT FROM fp) AS n_false_positives)
SELECT n_members, n_probes, n_bits_set, n_false_positives,
       round(n_false_positives / CAST(n_probes AS DOUBLE), 6) AS measured_fpr,
       round(power(1.0 - exp(-3.0 * n_members / 1024.0), 3.0), 6) AS theoretical_fpr,
       n_false_positives / CAST(n_probes AS DOUBLE)
         <= 2.0 * power(1.0 - exp(-3.0 * n_members / 1024.0), 3.0) + 0.01 AS within_2x
FROM agg
"""


def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV-style SET OPERATIONS between sketches — the reason
    mergeable sketches run the lake: estimate |A∪B| and |A∩B| for the
    'click' vs 'purchase' user sets from two K-minimum-value sketches
    (K=64) WITHOUT touching raw data twice. Union = KMV of the merged
    k-minima; intersection = Jaccard (matching hashes in the unioned
    sketch) × union. Exact counts ride along as the audit: both
    estimates within the contract factor (`union_ok`/`inter_ok`,
    within 2× at K=64).

    100 TB: each side reduces to K hashes (one aggregate with
    map-side top-K combine); the set algebra runs on 2K numbers —
    a coordinator-side merge, never a re-scan."""
    k = 64
    ev = load_table(spark, "events", sf_dir)
    h32 = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )

    def sketch(t):
        return (
            ev.where(F.col("event_type") == t)
            .select(h32.alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
            .agg(F.collect_list("h").alias("mins"))
            .select(F.lit(t).alias("t"), "mins")
        )

    a, b = sketch("click"), sketch("purchase")
    both = a.crossJoin(
        b.select(F.col("mins").alias("mins_b"))
    ).select(
        F.array_sort(F.array_distinct(F.concat(F.col("mins"), F.col("mins_b")))).alias("u"),
        "mins",
        "mins_b",
    )
    ks = F.least(F.size("u"), F.lit(k))
    kth = F.element_at(F.col("u"), ks)
    union_est = (ks - 1) * F.lit(4294967296.0) / kth
    # Jaccard from the merged sketch: of the union's K smallest, the
    # fraction present in BOTH input sketches
    head = F.slice(F.col("u"), 1, ks)
    in_both = F.size(
        F.filter(
            head,
            lambda x: F.array_contains(F.col("mins"), x) & F.array_contains(F.col("mins_b"), x),
        )
    )
    jacc = in_both / ks
    exact = ev.where(F.col("event_type").isin("click", "purchase")).agg(
        F.countDistinct(F.when(F.col("event_type") == "click", F.col("user_id"))).alias("na"),
        F.countDistinct(F.when(F.col("event_type") == "purchase", F.col("user_id"))).alias("nb"),
        F.countDistinct("user_id").alias("n_union"),
        (
            F.countDistinct(F.when(F.col("event_type") == "click", F.col("user_id")))
            + F.countDistinct(F.when(F.col("event_type") == "purchase", F.col("user_id")))
            - F.countDistinct("user_id")
        ).alias("n_inter"),
    )
    est = both.select(
        F.round(union_est, 2).alias("union_est"),
        F.round(jacc * union_est, 2).alias("inter_est"),
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            F.col("n_union").cast("bigint").alias("exact_union"),
            "union_est",
            F.col("n_inter").cast("bigint").alias("exact_inter"),
            "inter_est",
            (
                (F.col("union_est") < 2.0 * F.col("n_union"))
                & (F.col("union_est") > 0.5 * F.col("n_union"))
            ).alias("union_ok"),
            (
                (F.col("inter_est") < 2.0 * F.col("n_inter") + 50.0)
                & (F.col("inter_est") > 0.25 * F.col("n_inter") - 50.0)
            ).alias("inter_ok"),
        )
    )


KMV_SETOPS_SQL = """
WITH h AS (
  SELECT DISTINCT event_type,
         (((strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[1]) - 1) * 268435456
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[2]) - 1) * 16777216
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[3]) - 1) * 1048576
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[4]) - 1) * 65536
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[5]) - 1) * 4096
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[6]) - 1) * 256
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[7]) - 1) * 16
         + (strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[8]) - 1))) AS hv
  FROM events WHERE event_type IN ('click', 'purchase')),
ka AS (SELECT list_sort(list(hv)) AS mins FROM (SELECT hv FROM h WHERE event_type = 'click' ORDER BY hv LIMIT 64)),
kb AS (SELECT list_sort(list(hv)) AS mins_b FROM (SELECT hv FROM h WHERE event_type = 'purchase' ORDER BY hv LIMIT 64)),
merged AS (
  SELECT list_sort(list_distinct(mins || mins_b)) AS u, mins, mins_b
  FROM ka CROSS JOIN kb),
est AS (
  SELECT round((least(len(u), 64) - 1) * 4294967296.0 / u[least(len(u), 64)], 2) AS union_est,
         round((len(list_filter(u[1:least(len(u), 64)],
                                x -> list_contains(mins, x) AND list_contains(mins_b, x)))
                / CAST(least(len(u), 64) AS DOUBLE))
               * ((least(len(u), 64) - 1) * 4294967296.0 / u[least(len(u), 64)]), 2) AS inter_est
  FROM merged),
exact AS (
  SELECT count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS na,
         count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS nb,
         count(DISTINCT user_id) AS n_union,
         count(DISTINCT CASE WHEN event_type = 'click' THEN user_id END)
       + count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END)
       - count(DISTINCT user_id) AS n_inter
  FROM events WHERE event_type IN ('click', 'purchase'))
SELECT CAST(n_union AS BIGINT) AS exact_union, union_est,
       CAST(n_inter AS BIGINT) AS exact_inter, inter_est,
       union_est < 2.0 * n_union AND union_est > 0.5 * n_union AS union_ok,
       inter_est < 2.0 * n_inter + 50.0 AND inter_est > 0.25 * n_inter - 50.0 AS inter_ok
FROM est CROSS JOIN exact
"""

"""Lakehouse / systems-maintenance operators: layout, compaction,
profiling, reconciliation, advisors (split out of advanced.py in round
8; VERDICT r7 item 6). Every public name here is re-exported by
queries.advanced, which stays the catalog facade — __spark_entry__
keys are unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table
from hematite_spark.queries._shared import _DUCK_HASH_PCT_EVENTS

def zorder_cluster_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day):
    interleave 8 bits of each dimension into a 16-bit key, bucket the
    keyed rows into 256 target files, and report each file's span on
    BOTH dimensions — the multi-dimensional lake-clustering layout.

    This is the 100 TB pruning story: a lake sorted by z-key
    (repartitionByRange(zkey) + sortWithinPartitions) gives every
    parquet file TIGHT min/max footer stats on customer AND day
    simultaneously, so a predicate on EITHER dimension prunes ~√F of
    F files — linear layouts only prune their one sort column. The
    key itself is pure JVM bit algebra (shift/and/or), codegen'd into
    the scan projection; the span report is one map-side-combined
    aggregate."""
    orders = load_table(spark, "orders", sf_dir)
    x = (F.col("o_custkey") % 256).cast("bigint")
    y = (F.datediff("o_orderdate", F.to_date(F.lit("1995-01-01"))) % 256).cast("bigint")
    zkey = None
    for i in range(8):
        bits = F.shiftleft(F.shiftright(x, i).bitwiseAND(1), 2 * i) + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(1), 2 * i + 1
        )
        zkey = bits if zkey is None else zkey + bits
    keyed = orders.select(x.alias("x"), y.alias("y"), zkey.cast("bigint").alias("zkey"))
    return (
        keyed.withColumn("file_id", F.shiftright("zkey", 8).cast("bigint"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_rows"),
            (F.max("x") - F.min("x")).alias("cust_span"),
            (F.max("y") - F.min("y")).alias("day_span"),
        )
        .orderBy("file_id")
    )


_Z_BITS = " + ".join(
    f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})" for i in range(8)
)

ZORDER_SQL = f"""
WITH keyed AS (
  SELECT CAST(o_custkey % 256 AS BIGINT) AS x,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) % 256 AS BIGINT) AS y
  FROM orders
), z AS (
  SELECT x, y, ({_Z_BITS}) AS zkey FROM keyed
)
SELECT CAST(zkey >> 8 AS BIGINT) AS file_id,
       count(*) AS n_rows,
       max(x) - min(x) AS cust_span,
       max(y) - min(y) AS day_span
FROM z
GROUP BY file_id
ORDER BY file_id
"""


def redact_numbers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-run redaction over event payloads — the PII-scrub shape
    (emails/phones/ids are the production patterns; digit runs are
    the deterministic stand-in this corpus contains): rewrite every
    digit run to a <NUM> placeholder and account per event type for
    how many payloads changed and how many characters were removed.

    Pure regexp column algebra in the scan projection — the scrub is
    a single embarrassingly-parallel pass at any scale, and the
    accounting aggregate map-side combines."""
    ev = load_table(spark, "events", sf_dir)
    red = F.regexp_replace(F.col("props"), "[0-9]+", "<NUM>")
    stripped = F.regexp_replace(F.col("props"), "[0-9]+", "")
    return (
        ev.select(
            "event_type",
            "props",
            red.alias("red"),
            (F.length("props") - F.length(stripped)).cast("bigint").alias("digits_removed"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("red") != F.col("props"), 1)).alias("n_redacted_events"),
            F.sum("digits_removed").alias("chars_removed"),
            F.max("red").alias("sample_redaction"),
        )
        .orderBy("event_type")
    )


REDACT_SQL = """
SELECT event_type,
       count(*) FILTER (WHERE regexp_replace(props, '[0-9]+', '<NUM>', 'g') <> props)
         AS n_redacted_events,
       CAST(sum(length(props) - length(regexp_replace(props, '[0-9]+', '', 'g'))) AS BIGINT)
         AS chars_removed,
       max(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS sample_redaction
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: per-day PARTIAL states
    (count, sum, sum-of-squares, min, max) merged into per-month
    finals, with mean and stddev derived from the merged moments —
    the mergeable-state contract behind rollup tables, streaming
    state, and every two-phase aggregate. The oracle computes the
    monthly numbers directly from raw rows with the same moment
    algebra, so the merge path is PROVEN equal to the direct path.

    At 100 TB this is the whole point of partial aggregation: day
    partials are tiny, computed once, and month/quarter/year finals
    merge partials instead of re-scanning the fact table. Both levels
    map-side combine."""
    ev = load_table(spark, "events", sf_dir)
    day_partials = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    merged = day_partials.groupBy(
        "event_type", F.date_trunc("month", "day").cast("date").alias("month")
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("s").alias("s"),
        F.sum("ss").alias("ss"),
        F.min("mn").alias("v_min"),
        F.max("mx").alias("v_max"),
    )
    mean = F.col("s") / F.col("n_events")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n_events")) / (F.col("n_events") - 1)
    return merged.select(
        "event_type",
        "month",
        "n_events",
        F.round("v_min", 4).alias("v_min"),
        F.round("v_max", 4).alias("v_max"),
        F.round(mean, 4).alias("v_mean"),
        F.round(F.sqrt(var), 4).alias("v_stddev"),
    ).orderBy("event_type", "month")


INCREMENTAL_MERGE_SQL = """
SELECT event_type,
       CAST(date_trunc('month', ts) AS DATE) AS month,
       count(*) AS n_events,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max,
       round(sum(value) / count(*), 4) AS v_mean,
       round(sqrt((sum(value * value) - sum(value) * sum(value) / count(*))
                  / (count(*) - 1)), 4) AS v_stddev
FROM events
GROUP BY event_type, month
ORDER BY event_type, month
"""


_PROFILE_COLS = (
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice", "CAST(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS VARCHAR)"),
    ("o_orderdate", "CAST(o_orderdate AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority"),
)


def profile_columns_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over the orders table: per column, null count,
    exact distinct count, and min/max rendered as strings — the
    data-quality summary every ingest pipeline publishes next to a
    dataset. ONE aggregate pass computes every column's stats
    simultaneously (24 aggregate expressions over one scan — not six
    scans), then a literal explode pivots the single stats row into
    the per-column report. Doubles go through round+decimal so both
    engines render identical strings; at 100 TB the exact distincts
    are the only wide state, and each swaps for approx_count_distinct
    with one line."""
    orders = load_table(spark, "orders", sf_dir)
    str_exprs = {
        "o_orderkey": F.col("o_orderkey").cast("string"),
        "o_custkey": F.col("o_custkey").cast("string"),
        "o_orderstatus": F.col("o_orderstatus"),
        "o_totalprice": F.round("o_totalprice", 2).cast("decimal(18,2)").cast("string"),
        "o_orderdate": F.col("o_orderdate").cast("string"),
        "o_orderpriority": F.col("o_orderpriority"),
    }
    aggs = []
    for c, e in str_exprs.items():
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(e).alias(f"{c}__min"),
            F.max(e).alias(f"{c}__max"),
        ]
    one = orders.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in str_exprs
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.column_name", "r.n_nulls", "r.n_distinct", "r.min_value", "r.max_value")
        .orderBy("column_name")
    )


PROFILE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column_name,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       min({s}) AS min_value, max({s}) AS max_value FROM orders"""
    for c, s in _PROFILE_COLS
) + "\nORDER BY column_name"


def scd2_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 merge: apply an update batch
    (repriced orders, here the deterministic o_orderkey % 7 == 0
    slice at +1000.00 — an exact float step, so no rounding-tie
    divergence between engines) to the base snapshot, closing the superseded
    version (valid_to = effective date) and opening the new current
    one — the Delta/Iceberg MERGE INTO history pattern, expressed as
    three key-partitioned branches: semi-join (close), anti-join
    (carry), and the update batch itself (open). Each branch is one
    shuffle on the merge key; at 100 TB the base is bucketed by that
    key so the merge is exchange-free, and the write is a dynamic
    partition overwrite of touched partitions only."""
    eff = F.to_date(F.lit("2001-09-01"))
    hi = F.to_date(F.lit("9999-12-31"))
    base = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice", "o_orderstatus", F.to_date("o_orderdate").alias("odate")
    )
    upd = base.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        F.lit("U").alias("o_orderstatus"),
    )
    upd_keys = upd.select("o_orderkey")
    closed = base.join(upd_keys, "o_orderkey", "left_semi").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.col("odate").alias("valid_from"),
        eff.alias("valid_to"),
        F.lit(0).cast("bigint").alias("is_current"),
    )
    carried = base.join(upd_keys, "o_orderkey", "left_anti").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        F.col("odate").alias("valid_from"),
        hi.alias("valid_to"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    opened = upd.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderstatus",
        eff.alias("valid_from"),
        hi.alias("valid_to"),
        F.lit(1).cast("bigint").alias("is_current"),
    )
    return closed.union(carried).union(opened).orderBy("o_orderkey", "valid_from")


SCD2_MERGE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(o_orderdate AS DATE) AS odate
  FROM orders
), upd AS (
  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS o_orderstatus
  FROM base WHERE o_orderkey % 7 = 0
)
SELECT o_orderkey, o_totalprice, o_orderstatus,
       odate AS valid_from, DATE '2001-09-01' AS valid_to, CAST(0 AS BIGINT) AS is_current
FROM base WHERE o_orderkey IN (SELECT o_orderkey FROM upd)
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus,
       odate AS valid_from, DATE '9999-12-31' AS valid_to, CAST(1 AS BIGINT) AS is_current
FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderstatus,
       DATE '2001-09-01' AS valid_from, DATE '9999-12-31' AS valid_to, CAST(1 AS BIGINT) AS is_current
FROM upd
ORDER BY o_orderkey, valid_from
"""


def skew_diagnostics_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: for each candidate join key of the
    fact table, the key-count distribution (cardinality, max rows per
    key, top-1 share, exact p50/p99 counts and their ratio) — the
    report that decides BEFORE a 100 TB join whether a key needs
    salting, AQE skew handling, or a broadcast rethink. One
    map-side-combined count per key column over the same scan shape;
    the percentile pass runs on the already-tiny per-key count
    table."""
    li = load_table(spark, "lineitem", sf_dir)
    outs = []
    for key in ("l_orderkey", "l_partkey", "l_suppkey"):
        counts = li.groupBy(key).agg(F.count("*").alias("cnt"))
        outs.append(
            counts.agg(
                F.lit(key).alias("key_name"),
                F.count("*").alias("n_keys"),
                F.sum("cnt").alias("n_rows"),
                F.max("cnt").alias("max_per_key"),
                F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
                F.round(F.percentile("cnt", F.lit(0.5)), 4).alias("p50_per_key"),
                F.round(F.percentile("cnt", F.lit(0.99)), 4).alias("p99_per_key"),
                F.round(
                    F.percentile("cnt", F.lit(0.99)) / F.percentile("cnt", F.lit(0.5)), 4
                ).alias("skew_ratio"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.orderBy("key_name")


SKEW_DIAG_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{k}' AS key_name,
       count(*) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_per_key,
       round(max(cnt) / CAST(sum(cnt) AS DOUBLE), 6) AS top1_share,
       round(quantile_cont(cnt, 0.5), 4) AS p50_per_key,
       round(quantile_cont(cnt, 0.99), 4) AS p99_per_key,
       round(quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5), 4) AS skew_ratio
FROM (SELECT {k}, count(*) AS cnt FROM lineitem GROUP BY {k})"""
    for k in ("l_orderkey", "l_partkey", "l_suppkey")
) + "\nORDER BY key_name"


def bloom_semi_join_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, built explicitly: the urgent
    orders' keys fold into a 32768-bit Bloom filter (1024×32-bit words
    via bit_or aggregation, 2 md5-derived hashes per key), the fact
    table probes the broadcast filter BEFORE the real join, and the
    result audits the filter against the exact semi-join — passes,
    misses, and the false-positive rate. This is the runtime-filter
    pattern (Spark's own bloomFilter runtime join filters, Parquet
    bloom indexes) materialized as an operator: at 100 TB the filter
    is a few KB broadcast that spares the shuffle of every
    non-matching fact row; the build side map-side combines into ≤32
    rows. md5-derived hashes keep the oracle's filter bit-identical."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k")
    )

    def hashes(col):
        h = F.md5(col.cast("string"))
        return [
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long") % 32768 for i in range(2)
        ]

    hb = keys.select(F.explode(F.array(*hashes(F.col("k")))).alias("bit"))
    bloom = (
        hb.select(F.expr("bit div 32").alias("word"),
                  F.expr("shiftleft(1L, cast(bit % 32 AS INT))").alias("m"))
        .groupBy("word")
        .agg(F.bit_or("m").alias("w"))
    )
    p = li.select(F.col("l_orderkey").alias("k")).select(
        "k", *[b.alias(f"bit{i}") for i, b in enumerate(hashes(F.col("k")))]
    )
    for i in range(2):
        p = p.withColumn(f"word{i}", F.expr(f"bit{i} div 32")).withColumn(
            f"m{i}", F.expr(f"shiftleft(1L, cast(bit{i} % 32 AS INT))")
        )
        b = F.broadcast(bloom.select(F.col("word").alias(f"word{i}"), F.col("w").alias(f"w{i}")))
        p = p.join(b, f"word{i}", "left")
    passed = p.where(
        (F.col("w0").isNotNull() & (F.col("w0").bitwiseAND(F.col("m0")) == F.col("m0")))
        & (F.col("w1").isNotNull() & (F.col("w1").bitwiseAND(F.col("m1")) == F.col("m1")))
    )
    n_probe = li.agg(F.count("*").alias("n_probe"))
    n_pass = passed.agg(F.count("*").alias("n_bloom_pass"))
    # The exact-audit semi join sorts BOTH sides at session width —
    # at ×256 that is a 4.8M-row in-task sort of the fact table that
    # spills (measured 3.26 wall-doubling, the same fixed-width sort
    # cliff as quantile_bins_price); pre-exchange both sides on the
    # join key at a bytes-scaled width so the sort-merge reuses the
    # exchanges and each sort task stays ~2M rows. (Separately, the
    # FIXED 32768-bit filter saturates once urgent keys ≫ bits — the
    # audit then truthfully reports fp_rate → 1, which is the
    # operator's point: it MEASURES the filter's adequacy; a 100 TB
    # deployment sizes bits ~1.44·n·log2(1/fp) and this audit is the
    # evidence for that sizing.)
    from hematite_spark.io import table_bytes

    est_rows = table_bytes("lineitem", sf_dir) // 18
    jp = min(4096, -(-est_rows // 2_000_000))
    li_k, keys_k = li, keys
    if jp > int(spark.conf.get("spark.sql.shuffle.partitions", "32")):
        li_k = li.repartition(jp, "l_orderkey")
        # shuffle-HASH, not sort-merge: the audit only streams the
        # fact side against a per-partition hash of ~est/jp keys — no
        # n·log n fact-table sort at all (the sort was the residual
        # 2.27 doubling after the width fix; a hash probe is linear
        # and the build side is bounded by the exchange width at any
        # scale). Hint applied ONLY above the kick-in (ADVICE r11):
        # below it the stock sort-merge plan stands byte-identical —
        # the same convention every other width heuristic follows.
        keys_k = keys.repartition(jp, "k").hint("shuffle_hash")
    n_exact = (
        li_k.join(keys_k, li_k.l_orderkey == keys_k.k, "left_semi")
        .agg(F.count("*").alias("n_exact"))
    )
    return (
        n_probe.crossJoin(n_pass)
        .crossJoin(n_exact)
        .select(
            "n_probe",
            "n_bloom_pass",
            "n_exact",
            F.round((F.col("n_bloom_pass") - F.col("n_exact")) / F.col("n_probe"), 6).alias(
                "false_positive_rate"
            ),
        )
    )


BLOOM_SQL = """
WITH keys AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
), hb AS (
  SELECT ('0x' || substr(md5(k::VARCHAR), 1, 8))::BIGINT % 32768 AS bit FROM keys
  UNION ALL
  SELECT ('0x' || substr(md5(k::VARCHAR), 9, 8))::BIGINT % 32768 AS bit FROM keys
), bloom AS (
  SELECT bit // 32 AS word,
         bit_or(1::BIGINT << CAST(bit % 32 AS INTEGER)) AS w
  FROM hb GROUP BY word
), p AS (
  SELECT l_orderkey AS k,
         ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT % 32768 AS bit0,
         ('0x' || substr(md5(l_orderkey::VARCHAR), 9, 8))::BIGINT % 32768 AS bit1
  FROM lineitem
), checked AS (
  SELECT p.k,
         (b0.w IS NOT NULL AND (b0.w & (1::BIGINT << CAST(bit0 % 32 AS INTEGER)))
            = (1::BIGINT << CAST(bit0 % 32 AS INTEGER)))
         AND
         (b1.w IS NOT NULL AND (b1.w & (1::BIGINT << CAST(bit1 % 32 AS INTEGER)))
            = (1::BIGINT << CAST(bit1 % 32 AS INTEGER))) AS pass
  FROM p
  LEFT JOIN bloom b0 ON b0.word = bit0 // 32
  LEFT JOIN bloom b1 ON b1.word = bit1 // 32
)
SELECT (SELECT count(*) FROM lineitem) AS n_probe,
       (SELECT count(*) FROM checked WHERE pass) AS n_bloom_pass,
       (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT k FROM keys)) AS n_exact,
       round(((SELECT count(*) FROM checked WHERE pass)
              - (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT k FROM keys)))
             / CAST((SELECT count(*) FROM lineitem) AS DOUBLE), 6) AS false_positive_rate
"""


def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based join size estimation, audited against the exact
    answer: |lineitem ⋈ orders on orderkey| estimated as the
    count-min-sketch inner product minᵣ Σ_b cms_l[r,b]·cms_o[r,b] —
    the classic AMS/CMS estimator a distributed optimizer uses to
    size a join BEFORE shuffling either side. Overestimates only
    (hash collisions add non-negative cross terms), so the audit
    checks est ≥ exact and reports the blow-up ratio.

    Scale design: per-side per-key counts first (map-side-combined —
    the only corpus-scale shuffles), then hashing runs on the key
    VOCABULARY, and the sketches are 256-cell tables whose inner
    product is a broadcast-side fold. At 100 TB the two sketches are
    mergeable accumulators (per-partition, per-day) — the estimate
    never touches the other side's data."""
    from hematite_spark.functions import cms_rb_structs as _cms

    li = load_table(spark, "lineitem", sf_dir)
    od = load_table(spark, "orders", sf_dir)

    def sketch(df, key):
        counts = df.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count("*").alias("c")
        )
        return (
            counts.select("c", F.explode(F.array(*_cms(F.col("k")))).alias("rb"))
            .groupBy("rb.r", "rb.bucket")
            .agg(F.sum("c").alias("c"))
        )
    sl = sketch(li, "l_orderkey").withColumnRenamed("c", "cl")
    so = sketch(od, "o_orderkey").withColumnRenamed("c", "co")
    est = (
        sl.join(so, ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("cl") * F.col("co")).alias("ip"))
        .agg(F.min("ip").alias("est_pairs"))
    )
    exact = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .agg(F.count("*").alias("exact_pairs"))
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_pairs",
        "est_pairs",
        F.round(F.col("est_pairs") / F.col("exact_pairs"), 4).alias("overcount_ratio"),
    )


JOIN_CARD_SQL = """
WITH lc AS (SELECT l_orderkey::VARCHAR AS k, count(*) AS c FROM lineitem GROUP BY k),
oc AS (SELECT o_orderkey::VARCHAR AS k, count(*) AS c FROM orders GROUP BY k),
rs AS (SELECT unnest([0, 1, 2, 3]) AS r),
sl AS (
  SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || k), 1, 8))::BIGINT % 64 AS bucket,
         CAST(sum(c) AS BIGINT) AS cl
  FROM lc, rs GROUP BY 1, 2),
so AS (
  SELECT r, ('0x' || substr(md5(r::VARCHAR || ':' || k), 1, 8))::BIGINT % 64 AS bucket,
         CAST(sum(c) AS BIGINT) AS co
  FROM oc, rs GROUP BY 1, 2),
est AS (
  SELECT CAST(min(ip) AS BIGINT) AS est_pairs
  FROM (SELECT r, sum(cl * co) AS ip FROM sl JOIN so USING (r, bucket) GROUP BY r)),
exact AS (
  SELECT count(*) AS exact_pairs FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
SELECT exact_pairs, est_pairs,
       round(est_pairs / CAST(exact_pairs AS DOUBLE), 4) AS overcount_ratio
FROM exact, est
"""


def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner — the lake-maintenance job that
    keeps a 100 TB table scannable: derive a file listing (here
    simulated as one file per (ship-month, supplier bucket) with an
    integer byte-size proxy), then assign files to rewrite bins by
    sequential fill — order files largest-first within a month,
    running-sum their sizes, bin = floor(mass-before / quarter-of-
    month-total) → ~4 even rewrite tasks per month regardless of the
    file-size distribution.

    All arithmetic is integer until one exact double division, so the
    plan is engine-reproducible; the window partitions by month (the
    compaction unit), never globally. The real job feeds each bin to
    one executor-side rewrite task — bin boundaries ARE the task
    boundaries, which is why even mass matters more than file
    count."""
    li = load_table(spark, "lineitem", sf_dir)
    files = (
        li.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
            (F.col("l_suppkey") % 16).cast("bigint").alias("file_id"),
        )
        .agg(
            (F.count("*") * 64 + F.sum(F.col("l_linenumber").cast("bigint")) * 8)
            .cast("bigint")
            .alias("bytes")
        )
    )
    w_run = W.partitionBy("month").orderBy(F.col("bytes").desc(), "file_id")
    w_all = W.partitionBy("month")
    planned = files.select(
        "month",
        "file_id",
        "bytes",
        F.floor(
            (F.sum("bytes").over(w_run) - F.col("bytes")).cast("double")
            * 4.0
            / F.sum("bytes").over(w_all).cast("double")
        )
        .cast("bigint")
        .alias("bin"),
    )
    return (
        planned.groupBy("month", "bin")
        .agg(F.count("*").alias("n_files"), F.sum("bytes").alias("total_bytes"))
        .orderBy("month", "bin")
    )


COMPACTION_SQL = """
WITH files AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(l_suppkey % 16 AS BIGINT) AS file_id,
         CAST(count(*) * 64 + sum(CAST(l_linenumber AS BIGINT)) * 8 AS BIGINT) AS bytes
  FROM lineitem
  GROUP BY 1, 2),
planned AS (
  SELECT month, file_id, bytes,
         CAST(floor(CAST(sum(bytes) OVER (PARTITION BY month ORDER BY bytes DESC, file_id) - bytes AS DOUBLE)
                    * 4.0 / CAST(sum(bytes) OVER (PARTITION BY month) AS DOUBLE)) AS BIGINT) AS bin
  FROM files)
SELECT month, bin, count(*) AS n_files, CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM planned
GROUP BY month, bin
ORDER BY month, bin
"""


def feature_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store
    operation that keeps training data leakage-free: each purchase
    event is enriched with the user's feature snapshot as of STRICTLY
    BEFORE the purchase day (yesterday's close), never same-day or
    future state. Snapshots are daily per-user running totals; the
    strictness is what separates this from a plain as-of join — a
    same-day snapshot already contains the purchase being labeled.

    Single-window no-explosion form (the join_asof pattern): union
    snapshots and purchases into one stream ordered by (day, kind)
    with snapshots sorting AFTER purchases on equal days, then one
    last_value(ignore nulls) window carries each user's latest
    eligible snapshot forward. One shuffle on the user key, state
    bounded by one snapshot row — at 100 TB this beats the
    correlated-subquery plan by a join-explosion factor. The oracle
    IS the textbook correlated formulation (max_by over an inequality
    join), so the driver check proves the two equivalent."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    wd = W.partitionBy("user_id").orderBy("day")
    snaps = daily.select(
        "user_id",
        "day",
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.sum("n").over(wd).cast("bigint").alias("s_n"),
        F.sum("v").over(wd).alias("s_v"),
        F.col("day").alias("s_day"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.lit(0).alias("kind"),
        "event_id",
        F.lit(None).cast("bigint").alias("s_n"),
        F.lit(None).cast("double").alias("s_v"),
        F.lit(None).cast("date").alias("s_day"),
    )
    merged = snaps.unionByName(purch)
    w = (
        W.partitionBy("user_id")
        .orderBy("day", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.select(
        "user_id",
        "day",
        "kind",
        "event_id",
        F.last("s_n", ignorenulls=True).over(w).alias("feat_n_events"),
        F.last("s_v", ignorenulls=True).over(w).alias("feat_value"),
        F.last("s_day", ignorenulls=True).over(w).alias("asof_day"),
    )
    return (
        carried.where((F.col("kind") == 0) & F.col("feat_n_events").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.col("day").alias("purchase_day"),
            "feat_n_events",
            F.round("feat_value", 4).alias("feat_value"),
            "asof_day",
        )
        .orderBy("event_id")
    )


FEATURE_PIT_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2),
snaps AS (
  SELECT user_id, day,
         CAST(sum(n) OVER w AS BIGINT) AS s_n,
         sum(v) OVER w AS s_v
  FROM daily
  WINDOW w AS (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
purch AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.day AS purchase_day,
       max_by(s.s_n, s.day) AS feat_n_events,
       round(max_by(s.s_v, s.day), 4) AS feat_value,
       max(s.day) AS asof_day
FROM purch p JOIN snaps s ON s.user_id = p.user_id AND s.day < p.day
GROUP BY p.event_id, p.user_id, p.day
ORDER BY p.event_id
"""


def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data budget analysis — the tuning input for every
    streaming watermark in streaming/windows.py: simulate per-event
    arrival delay (deterministic md5-derived jitter, 0-1800 s, so the
    audit is reproducible), then report per event type the lateness
    distribution AND the fraction of events a 5/15/30-minute watermark
    would drop. Choosing a watermark without this table is guessing;
    with it, the state-size/completeness trade-off is a number.

    One scan, one hash aggregate (exact percentiles at audit scale;
    the approx_percentile sketch replaces them at 100 TB — same
    plumbing)."""
    ev = load_table(spark, "events", sf_dir)
    delay_s = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 5), 16, 10)
        .cast("bigint")
        % 1800
    )
    d = ev.select("event_type", delay_s.alias("delay_s"))
    return (
        d.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.percentile("delay_s", F.lit(0.5)), 1).alias("p50_s"),
            F.round(F.percentile("delay_s", F.lit(0.95)), 1).alias("p95_s"),
            F.round(F.avg((F.col("delay_s") > 300).cast("int")), 4).alias("drop_rate_5m"),
            F.round(F.avg((F.col("delay_s") > 900).cast("int")), 4).alias("drop_rate_15m"),
            F.round(F.avg((F.col("delay_s") > 1740).cast("int")), 4).alias("drop_rate_29m"),
        )
        .orderBy("event_type")
    )


_DUCK_HEX5 = (
    "(("
    + " + ".join(
        f"(strpos('0123456789abcdef', md5(event_id::VARCHAR)[{i + 1}]) - 1) * {16 ** (4 - i)}"
        for i in range(5)
    )
    + ") % 1800)"
)

WATERMARK_AUDIT_SQL = f"""
WITH d AS (
  SELECT event_type, CAST({_DUCK_HEX5} AS BIGINT) AS delay_s FROM events)
SELECT event_type, count(*) AS n_events,
       round(quantile_cont(delay_s, 0.5), 1) AS p50_s,
       round(quantile_cont(delay_s, 0.95), 1) AS p95_s,
       round(avg(CASE WHEN delay_s > 300 THEN 1 ELSE 0 END), 4) AS drop_rate_5m,
       round(avg(CASE WHEN delay_s > 900 THEN 1 ELSE 0 END), 4) AS drop_rate_15m,
       round(avg(CASE WHEN delay_s > 1740 THEN 1 ELSE 0 END), 4) AS drop_rate_29m
FROM d
GROUP BY event_type
ORDER BY event_type
"""


def reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/sink reconciliation — the exactly-once audit every
    pipeline runs after a backfill: full-outer join the source log
    against a simulated sink copy (deterministic 2% of rows missing,
    1% value-corrupted — md5-derived, so both engines simulate the
    identical sink) and classify every id as matched / missing-at-sink
    / corrupted. The join key is the event id; at 100 TB both sides
    pre-hash to (id, checksum) first so the join carries 16 bytes per
    row, not the payload — the same digest-only trick as content
    dedup."""
    ev = load_table(spark, "events", sf_dir)
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10).cast("bigint") % 100
    src = ev.select("event_id", "event_type", F.round("value", 4).alias("src_value"))
    sink = (
        ev.select("event_id", F.round("value", 4).alias("sink_value"), h.alias("h"))
        .where(F.col("h") >= 2)  # 2% lost in transit
        .select(
            "event_id",
            # 1% corrupted downstream (h in [2,3)): value off by 0.01
            F.when(F.col("h") < 3, F.round(F.col("sink_value") + 0.01, 4))
            .otherwise(F.col("sink_value"))
            .alias("sink_value"),
        )
    )
    joined = src.join(sink, "event_id", "full")
    status = (
        F.when(F.col("sink_value").isNull(), "missing_at_sink")
        .when(F.col("src_value") != F.col("sink_value"), "corrupted")
        .otherwise("matched")
    )
    return (
        joined.select("event_type", status.alias("status"))
        .groupBy("event_type", "status")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type", "status")
    )

RECONCILIATION_SQL = f"""
WITH src AS (
  SELECT event_id, event_type, round(value, 4) AS src_value FROM events),
hashed AS (
  SELECT event_id, round(value, 4) AS sink_value,
         {_DUCK_HASH_PCT_EVENTS} AS h
  FROM events),
sink AS (
  SELECT event_id,
         CASE WHEN h < 3 THEN round(sink_value + 0.01, 4) ELSE sink_value END AS sink_value
  FROM hashed WHERE h >= 2)
SELECT event_type,
       CASE WHEN sink_value IS NULL THEN 'missing_at_sink'
            WHEN src_value <> sink_value THEN 'corrupted'
            ELSE 'matched' END AS status,
       count(*) AS n_events
FROM src LEFT JOIN sink USING (event_id)
GROUP BY 1, 2
ORDER BY event_type, status
"""


def shuffle_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning calculator — the sizing pass run before any big
    job: per fact table, estimate bytes from row counts × measured
    average row width (strings measured, numerics at their physical
    width) and derive the 128 MB-target partition count the job
    should set for spark.sql.shuffle.partitions / maxPartitionBytes.
    One aggregate per table; the estimate is metadata-scale however
    large the table. At 100 TB this query IS the difference between
    a 200-partition default shredding the cluster and a plan sized
    to the data."""
    specs = {
        "lineitem": (["l_returnflag", "l_linestatus"], 8 * 9),
        "orders": (["o_orderstatus", "o_orderpriority"], 8 * 4),
        "events": (["event_type", "props"], 8 * 4),
    }
    out = None
    for table, (str_cols, fixed) in specs.items():
        df = load_table(spark, table, sf_dir)
        str_cols = [c for c in str_cols if c in df.columns]
        width = sum(
            (F.avg(F.length(c).cast("double")) for c in str_cols), F.lit(float(fixed))
        )
        row = df.agg(
            F.lit(table).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.round(width, 2).alias("avg_row_bytes"),
            F.ceil(F.count("*") * width).cast("bigint").alias("est_bytes"),
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.count("*") * width / F.lit(128.0 * 1024 * 1024)).cast("bigint"),
            ).alias("partitions_128mb"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


def _advisor_sql() -> str:
    parts = []
    for table, str_cols, fixed in (
        ("lineitem", ["l_returnflag", "l_linestatus"], 72),
        ("orders", ["o_orderstatus", "o_orderpriority"], 32),
        ("events", ["event_type", "props"], 32),
    ):
        width = " + ".join([str(float(fixed))] + [f"avg(CAST(length({c}) AS DOUBLE))" for c in str_cols])
        parts.append(
            f"""SELECT '{table}' AS table_name, count(*) AS n_rows,
  round({width}, 2) AS avg_row_bytes,
  CAST(ceil(count(*) * ({width})) AS BIGINT) AS est_bytes,
  greatest(CAST(1 AS BIGINT), CAST(ceil(count(*) * ({width}) / (128.0 * 1024 * 1024)) AS BIGINT)) AS partitions_128mb
FROM {table}"""
        )
    return "SELECT * FROM (" + " UNION ALL ".join(parts) + ") ORDER BY table_name"


SHUFFLE_ADVISOR_SQL = _advisor_sql()


def data_contract_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract gate — the declarative constraint checks a table
    carries into production (the Great-Expectations/dbt-test shape):
    each rule is one conditional count inside a SINGLE aggregate pass
    per table, so adding a rule never adds a scan. Emits per-rule
    violation counts and pass/fail; a scheduler gates downstream jobs
    on `WHERE NOT passed` being empty."""
    orders = load_table(spark, "orders", sf_dir)
    ev = load_table(spark, "events", sf_dir)
    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
    o_rules = orders.agg(
        viol(F.col("o_totalprice") <= 0).alias("orders_totalprice_positive"),
        viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("orders_status_enum"),
        viol(F.col("o_custkey").isNull()).alias("orders_custkey_not_null"),
        viol(F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")).alias(
            "orders_date_min"
        ),
    )
    e_rules = ev.agg(
        viol(F.col("value").isNull()).alias("events_value_not_null"),
        viol(~F.col("event_type").isin("view", "click", "purchase", "signup", "error")).alias(
            "events_type_enum"
        ),
        viol(F.col("ts").isNull()).alias("events_ts_not_null"),
    )

    def melt(df: DataFrame) -> DataFrame:
        cols = df.columns
        arr = F.array(
            *[
                F.struct(F.lit(c).alias("rule"), F.col(c).alias("n_violations"))
                for c in cols
            ]
        )
        return df.select(F.explode(arr).alias("r")).select("r.rule", "r.n_violations")

    return (
        melt(o_rules)
        .unionByName(melt(e_rules))
        .withColumn("passed", F.col("n_violations") == 0)
        .orderBy("rule")
    )


DATA_CONTRACT_SQL = """
WITH o AS (
  SELECT CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS orders_totalprice_positive,
         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) AS orders_status_enum,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orders_custkey_not_null,
         CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01' THEN 1 ELSE 0 END) AS BIGINT) AS orders_date_min
  FROM orders),
e AS (
  SELECT CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS events_value_not_null,
         CAST(sum(CASE WHEN event_type NOT IN ('view', 'click', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END) AS BIGINT) AS events_type_enum,
         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS events_ts_not_null
  FROM events)
SELECT rule, n_violations, n_violations = 0 AS passed
FROM (
  SELECT 'orders_totalprice_positive' AS rule, orders_totalprice_positive AS n_violations FROM o
  UNION ALL SELECT 'orders_status_enum', orders_status_enum FROM o
  UNION ALL SELECT 'orders_custkey_not_null', orders_custkey_not_null FROM o
  UNION ALL SELECT 'orders_date_min', orders_date_min FROM o
  UNION ALL SELECT 'events_value_not_null', events_value_not_null FROM e
  UNION ALL SELECT 'events_type_enum', events_type_enum FROM e
  UNION ALL SELECT 'events_ts_not_null', events_ts_not_null FROM e)
ORDER BY rule
"""


# ------------------------------------------------- zone-map pruning audit


def zone_map_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-file min/max) effectiveness audit: simulate two
    32-file lake layouts for `orders` — DATE-CLUSTERED (file = order
    month, the layout a date-partitioned writer produces) and HASH
    (file = md5(o_orderkey) % 32, the layout an unclustered writer
    produces) — and, for a 1-month date predicate, count how many
    files a min/max zone map lets the scanner SKIP. The clustered
    layout skips ~all files; the hash layout skips none — the
    measured argument for clustering/z-ordering fact tables on the
    dominant filter column.

    Scale: two O(rows) aggregates to per-file min/max (32 rows each),
    then O(files) logic. The audit itself never reads data twice."""
    orders = load_table(spark, "orders", sf_dir)
    lo, hi = "1995-03-01", "1995-04-01"
    layouts = []
    for name, file_expr in (
        ("clustered_by_date", F.date_format("o_orderdate", "yyyy-MM")),
        (
            "hash_layout",
            (
                F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % 32
            ).cast("string"),
        ),
    ):
        zone = (
            orders.groupBy(file_expr.alias("file_id"))
            .agg(F.min("o_orderdate").alias("mn"), F.max("o_orderdate").alias("mx"))
            .agg(
                F.lit(name).alias("layout"),
                F.count("*").cast("bigint").alias("n_files"),
                F.sum(
                    F.when(
                        (F.col("mx") >= F.lit(lo).cast("timestamp"))
                        & (F.col("mn") < F.lit(hi).cast("timestamp")),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("files_scanned"),
            )
        )
        layouts.append(zone)
    out = layouts[0].unionByName(layouts[1])
    return out.select(
        "layout",
        "n_files",
        "files_scanned",
        (F.col("n_files") - F.col("files_scanned")).alias("files_skipped"),
        F.round(1.0 - F.col("files_scanned") / F.col("n_files"), 6).alias("skip_fraction"),
    ).orderBy("layout")


ZONE_MAP_SQL = """
WITH clustered AS (
  SELECT 'clustered_by_date' AS layout, count(*)::BIGINT AS n_files,
         sum(CASE WHEN mx >= TIMESTAMP '1995-03-01' AND mn < TIMESTAMP '1995-04-01'
             THEN 1 ELSE 0 END)::BIGINT AS files_scanned
  FROM (SELECT strftime(o_orderdate, '%Y-%m') AS file_id,
               min(o_orderdate) AS mn, max(o_orderdate) AS mx
        FROM orders GROUP BY 1)),
hashed AS (
  SELECT 'hash_layout' AS layout, count(*)::BIGINT AS n_files,
         sum(CASE WHEN mx >= TIMESTAMP '1995-03-01' AND mn < TIMESTAMP '1995-04-01'
             THEN 1 ELSE 0 END)::BIGINT AS files_scanned
  FROM (SELECT (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 32)::VARCHAR AS file_id,
               min(o_orderdate) AS mn, max(o_orderdate) AS mx
        FROM orders GROUP BY 1))
SELECT layout, n_files, files_scanned,
       (n_files - files_scanned)::BIGINT AS files_skipped,
       round(1.0 - files_scanned / CAST(n_files AS DOUBLE), 6) AS skip_fraction
FROM (SELECT * FROM clustered UNION ALL SELECT * FROM hashed)
ORDER BY layout
"""


def snapshot_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the Iceberg/Delta-style 'what changed between
    snapshot T1 and T2' audit, computed from the event log: each
    snapshot is the last-writer-wins state per (user, event_type) as
    of its cutoff (T1 = Jan 15, T2 = Jan 25), and the diff classifies
    every key as added (new in T2), changed (value moved), or
    unchanged — the reconciliation table an incremental consumer
    checks before trusting a CDC feed. (Removed is structurally zero
    for an append-only log and is reported to prove it.)

    100 TB: each snapshot is one (user, event_type)-keyed max-struct
    aggregate over a ts-pruned scan (the cutoff predicate pushes to
    the reader); the diff is a single co-keyed full-outer join —
    both sides share the same partitioning, so AQE plans one
    exchange per side and the classification is a projection."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "value")

    def snap(cutoff: str):
        return (
            ev.where(F.col("ts") < F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id", "event_type")
            .agg(F.max(F.struct("ts", "value")).alias("s"))
            .select("user_id", "event_type", F.col("s.value").alias("value"))
        )

    a, b = snap("2024-01-15"), snap("2024-01-25")
    diff = a.alias("a").join(
        b.alias("b"), ["user_id", "event_type"], "full_outer"
    ).select(
        "event_type",
        F.when(F.col("a.value").isNull(), F.lit("added"))
        .when(F.col("b.value").isNull(), F.lit("removed"))
        .when(F.col("a.value") != F.col("b.value"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )
    return (
        diff.groupBy("event_type")
        .pivot("change", ["added", "removed", "changed", "unchanged"])
        .count()
        .na.fill(0)
        .select(
            "event_type",
            F.col("added").cast("bigint").alias("n_added"),
            F.col("removed").cast("bigint").alias("n_removed"),
            F.col("changed").cast("bigint").alias("n_changed"),
            F.col("unchanged").cast("bigint").alias("n_unchanged"),
        )
        .orderBy("event_type")
    )


SNAPSHOT_DIFF_SQL = """
WITH snap_a AS (
  SELECT user_id, event_type, (max(struct_pack(ts := ts, value := value))).value AS value
  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id, event_type),
snap_b AS (
  SELECT user_id, event_type, (max(struct_pack(ts := ts, value := value))).value AS value
  FROM events WHERE ts < TIMESTAMP '2024-01-25' GROUP BY user_id, event_type),
diff AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         CASE WHEN a.value IS NULL THEN 'added'
              WHEN b.value IS NULL THEN 'removed'
              WHEN a.value <> b.value THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM snap_a a FULL OUTER JOIN snap_b b
    ON a.user_id = b.user_id AND a.event_type = b.event_type)
SELECT event_type,
       sum(CASE WHEN change = 'added' THEN 1 ELSE 0 END)::BIGINT AS n_added,
       sum(CASE WHEN change = 'removed' THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       sum(CASE WHEN change = 'changed' THEN 1 ELSE 0 END)::BIGINT AS n_changed,
       sum(CASE WHEN change = 'unchanged' THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
FROM diff
GROUP BY event_type
ORDER BY event_type
"""


def consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring rebalance audit — the shard-topology
    change every stateful service (and every bucketed lake layout)
    eventually faces: place 4 shards × 8 virtual nodes on a md5 ring,
    assign every user key to its clockwise successor vnode, then add
    shard 4 and measure exactly which keys move. The contract the ring
    exists for: moved fraction ≈ 1/(n+1) (here ~20%), and — unlike
    mod-N hashing, where adding a shard moves ~80% of keys — every
    move lands on the NEW shard (old shards only shed).

    100 TB: vnode rings are O(shards × vnodes) broadcasts; assignment
    is a stateless min-over-32-candidates column expression fused into
    one projection — no join, no shuffle until the O(shards) census."""
    ev = load_table(spark, "events", sf_dir).select("user_id").distinct()

    def ring(n_shards: int):
        # vnode position: md5('vn:<shard>:<replica>') first 8 hex → bigint
        return [
            (
                int(__import__("hashlib").md5(f"vn:{s}:{r}".encode()).hexdigest()[:8], 16),
                s,
            )
            for s in range(n_shards)
            for r in range(8)
        ]

    key_pos = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )

    def assign(n_shards: int):
        vnodes = sorted(ring(n_shards))
        # clockwise successor: smallest vnode position ≥ key, wrapping
        # to the ring's first vnode — expressed as a fused CASE chain
        expr = F.lit(vnodes[0][1])  # wrap default
        for pos, shard in reversed(vnodes):
            expr = F.when(key_pos <= pos, F.lit(shard)).otherwise(expr)
        return expr.cast("int")

    keys = ev.select(
        "user_id", assign(4).alias("shard_before"), assign(5).alias("shard_after")
    )
    return (
        keys.groupBy("shard_before")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum((F.col("shard_before") != F.col("shard_after")).cast("int"))
            .cast("bigint")
            .alias("n_moved"),
            F.sum(
                ((F.col("shard_before") != F.col("shard_after")) & (F.col("shard_after") != 4))
                .cast("int")
            )
            .cast("bigint")
            .alias("n_moved_not_to_new"),
        )
        .select(
            "shard_before",
            "n_keys",
            "n_moved",
            F.round(F.col("n_moved") / F.col("n_keys"), 6).alias("moved_frac"),
            "n_moved_not_to_new",
        )
        .orderBy("shard_before")
    )


def _ring_vnodes(n_shards: int) -> list[tuple[int, int]]:
    import hashlib

    return sorted(
        (int(hashlib.md5(f"vn:{s}:{r}".encode()).hexdigest()[:8], 16), s)
        for s in range(n_shards)
        for r in range(8)
    )


_KEYPOS_SQL = "(" + " + ".join(
    f"(strpos('0123456789abcdef', md5(CAST(user_id AS VARCHAR))[{i + 1}]) - 1) * {16 ** (7 - i)}"
    for i in range(8)
) + ")"


def _assign_sql(n_shards: int) -> str:
    vnodes = _ring_vnodes(n_shards)
    whens = " ".join(f"WHEN kp <= {pos} THEN {shard}" for pos, shard in vnodes)
    return f"CAST(CASE {whens} ELSE {vnodes[0][1]} END AS INT)"


CONSISTENT_HASH_SQL = f"""
WITH keys AS (
  SELECT DISTINCT user_id FROM events),
pos AS (
  SELECT user_id, {_KEYPOS_SQL} AS kp FROM keys),
assigned AS (
  SELECT user_id,
         {_assign_sql(4)} AS shard_before,
         {_assign_sql(5)} AS shard_after
  FROM pos)
SELECT shard_before,
       count(*)::BIGINT AS n_keys,
       sum(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END)::BIGINT AS n_moved,
       round(sum(CASE WHEN shard_before <> shard_after THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS moved_frac,
       sum(CASE WHEN shard_before <> shard_after AND shard_after <> 4 THEN 1 ELSE 0 END)::BIGINT AS n_moved_not_to_new
FROM assigned
GROUP BY shard_before
ORDER BY shard_before
"""


def forget_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit — the pre-flight a GDPR/CCPA
    erasure run executes before touching data: a deterministic forget
    list (hash(c_custkey) ≡ 0 mod 37 — the request queue), then the
    FULL transitive closure of rows referencing those subjects:
    customer rows, their orders, their lineitems. One row per table
    with total/purge/fraction — the blast-radius report a data-steward
    signs off on, and the row-count contract the post-delete
    verification re-runs against zero.

    100 TB: the forget list is a broadcast semi-join pruner at every
    hop (customers ≪ facts); orders-to-purge stays a key list that
    broadcasts into the lineitem scan — three scans, no shuffle wider
    than the O(forget-list) key sets, counts map-side combined."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("forget:"), F.col("c_custkey").cast("string"))), 1, 4), 16, 10)
        .cast("bigint") % 37
    )
    forget = cust.where(h == 0).select("c_custkey")
    purge_orders = orders.join(
        F.broadcast(forget), orders.o_custkey == forget.c_custkey, "left_semi"
    ).select("o_orderkey")
    row = lambda name, tot_df, purge_df: (
        tot_df.agg(F.count("*").cast("bigint").alias("n_rows"))
        .crossJoin(purge_df.agg(F.count("*").cast("bigint").alias("n_purge")))
        .select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "n_purge",
            F.round(F.col("n_purge") / F.col("n_rows"), 6).alias("purge_frac"),
        )
    )
    return (
        row("customer", cust, forget)
        .unionByName(row("orders", orders, purge_orders))
        .unionByName(
            row(
                "lineitem",
                li,
                li.join(F.broadcast(purge_orders), li.l_orderkey == purge_orders.o_orderkey, "left_semi"),
            )
        )
        .orderBy("table_name")
    )


FORGET_CASCADE_SQL = """
WITH forget AS (
  SELECT c_custkey FROM customer
  WHERE (((strpos('0123456789abcdef', md5('forget:' || CAST(c_custkey AS VARCHAR))[1]) - 1) * 4096
        + (strpos('0123456789abcdef', md5('forget:' || CAST(c_custkey AS VARCHAR))[2]) - 1) * 256
        + (strpos('0123456789abcdef', md5('forget:' || CAST(c_custkey AS VARCHAR))[3]) - 1) * 16
        + (strpos('0123456789abcdef', md5('forget:' || CAST(c_custkey AS VARCHAR))[4]) - 1)) % 37) = 0),
purge_orders AS (
  SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT c_custkey FROM forget)),
t AS (
  SELECT 'customer' AS table_name,
         (SELECT count(*)::BIGINT FROM customer) AS n_rows,
         (SELECT count(*)::BIGINT FROM forget) AS n_purge
  UNION ALL
  SELECT 'orders',
         (SELECT count(*)::BIGINT FROM orders),
         (SELECT count(*)::BIGINT FROM purge_orders)
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*)::BIGINT FROM lineitem),
         (SELECT count(*)::BIGINT FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM purge_orders)))
SELECT table_name, n_rows, n_purge,
       round(n_purge / CAST(n_rows AS DOUBLE), 6) AS purge_frac
FROM t
ORDER BY table_name
"""


def encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-encoding advisor — the lake-layout pass that decides
    per column how parquet should store it: cardinality ratio and
    value width pick between DICTIONARY (few distinct values),
    RUN_LENGTH (few distinct + long runs when sorted by the cluster
    key), and PLAIN. Emits per audited orders-column: rows, NDV,
    ndv_ratio, implied dictionary bits/value (⌈log2 ndv⌉ vs the raw
    width), and the recommendation — the advisor behind
    zorder_cluster_key's span report.

    100 TB: one multi-column approx-free aggregate (exact NDV here;
    the documented scale swap is approx_count_distinct) over a single
    scan; output is O(columns)."""
    orders = load_table(spark, "orders", sf_dir)
    cols = [
        ("o_orderstatus", F.length(F.col("o_orderstatus").cast("string")), 8),
        ("o_orderpriority", F.length("o_orderpriority"), 8),
        ("o_orderdate", F.lit(4), 32),
        ("o_custkey", F.lit(8), 64),
    ]
    agg = orders.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        *[F.countDistinct(name).cast("bigint").alias(f"ndv_{name}") for name, _, _ in cols],
        *[F.round(F.avg(width), 2).alias(f"w_{name}") for name, width, _ in cols],
    )
    rows = []
    for name, _, plain_bits in cols:
        ndv = F.col(f"ndv_{name}")
        ratio = ndv / F.col("n_rows")
        dict_bits = F.ceil(F.log2(ndv))
        rec = (
            F.when(ratio <= 0.001, F.lit("RUN_LENGTH"))
            .when(ratio <= 0.1, F.lit("DICTIONARY"))
            .otherwise(F.lit("PLAIN"))
        )
        rows.append(
            agg.select(
                F.lit(name).alias("column_name"),
                F.col("n_rows"),
                ndv.alias("ndv"),
                F.round(ratio, 6).alias("ndv_ratio"),
                dict_bits.cast("bigint").alias("dict_bits_per_value"),
                F.lit(plain_bits).cast("bigint").alias("plain_bits_per_value"),
                rec.alias("recommendation"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("column_name")


ENCODING_ADVISOR_SQL = """
WITH agg AS (
  SELECT count(*)::BIGINT AS n_rows,
         count(DISTINCT o_orderstatus)::BIGINT AS ndv_status,
         count(DISTINCT o_orderpriority)::BIGINT AS ndv_priority,
         count(DISTINCT o_orderdate)::BIGINT AS ndv_ship,
         count(DISTINCT o_custkey)::BIGINT AS ndv_cust
  FROM orders),
t AS (
  SELECT 'o_orderstatus' AS column_name, n_rows, ndv_status AS ndv, 8 AS plain_bits FROM agg
  UNION ALL SELECT 'o_orderpriority', n_rows, ndv_priority, 8 FROM agg
  UNION ALL SELECT 'o_orderdate', n_rows, ndv_ship, 32 FROM agg
  UNION ALL SELECT 'o_custkey', n_rows, ndv_cust, 64 FROM agg)
SELECT column_name, n_rows, ndv,
       round(ndv / CAST(n_rows AS DOUBLE), 6) AS ndv_ratio,
       CAST(ceil(log2(ndv)) AS BIGINT) AS dict_bits_per_value,
       CAST(plain_bits AS BIGINT) AS plain_bits_per_value,
       CASE WHEN ndv / CAST(n_rows AS DOUBLE) <= 0.001 THEN 'RUN_LENGTH'
            WHEN ndv / CAST(n_rows AS DOUBLE) <= 0.1 THEN 'DICTIONARY'
            ELSE 'PLAIN' END AS recommendation
FROM t
ORDER BY column_name
"""


def geo_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial ε-neighbor self-join via grid blocking — the geohash
    pattern every spatial engine (Sedona/H3) builds on, expressed as
    pure relational algebra: deterministic hash coordinates place
    each user on a 100×100 plane, points bucket into ε-sized grid
    cells, and each point probes its own cell plus the 8 neighbors —
    every true ε-pair shares a probed cell (the spatial pigeonhole),
    so the exact distance filter runs on O(density²·cells), never
    n². Output: the one-row audit — points, occupied cells, max cell
    occupancy, candidate pairs, confirmed pairs, mean pair distance.

    100 TB: cell id is the partition key (probe = partition-local);
    the 9-cell explode is the bounded fan-out; skew shows up in
    max_cell_points and is handled by subdividing hot cells."""
    eps = 1.0
    ev = load_table(spark, "events", sf_dir).select("user_id").distinct()
    h = lambda salt: (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), F.col("user_id").cast("string"))), 1, 4),
            16,
            10,
        ).cast("double")
        / 65536.0 * 100.0
    )
    pts = ev.select(
        "user_id", h("gx:").alias("x"), h("gy:").alias("y")
    ).withColumns({"cx": F.floor(F.col("x")), "cy": F.floor(F.col("y"))}).localCheckpoint()
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = pts.select(
        "user_id",
        "x",
        "y",
        F.explode(
            F.array(*[F.struct((F.col("cx") + dx).alias("px"), (F.col("cy") + dy).alias("py")) for dx, dy in offsets])
        ).alias("c"),
    ).select("user_id", "x", "y", F.col("c.px").alias("cx"), F.col("c.py").alias("cy"))
    build = pts.select(
        F.col("user_id").alias("b_id"), F.col("x").alias("bx"), F.col("y").alias("by"), "cx", "cy"
    )
    cand = probe.join(build, ["cx", "cy"]).where(F.col("b_id") > F.col("user_id"))
    d2 = (F.col("x") - F.col("bx")) ** 2 + (F.col("y") - F.col("by")) ** 2
    scored = cand.select(d2.alias("d2")).localCheckpoint()
    cells = pts.groupBy("cx", "cy").agg(F.count("*").alias("n"))
    summary = (
        pts.agg(F.count("*").cast("bigint").alias("n_points"))
        .crossJoin(
            cells.agg(
                F.count("*").cast("bigint").alias("n_cells"),
                F.max("n").cast("bigint").alias("max_cell_points"),
            )
        )
        .crossJoin(scored.agg(F.count("*").cast("bigint").alias("n_candidate_pairs")))
        .crossJoin(
            scored.where(F.col("d2") <= eps * eps).agg(
                F.count("*").cast("bigint").alias("n_matches"),
                F.round(F.avg(F.sqrt("d2")), 6).alias("mean_match_dist"),
            )
        )
    )
    return summary


GEO_GRID_SQL = """
WITH keys AS (SELECT DISTINCT user_id FROM events),
pts AS (
  SELECT user_id,
         (((strpos('0123456789abcdef', md5('gx:' || CAST(user_id AS VARCHAR))[1]) - 1) * 4096
         + (strpos('0123456789abcdef', md5('gx:' || CAST(user_id AS VARCHAR))[2]) - 1) * 256
         + (strpos('0123456789abcdef', md5('gx:' || CAST(user_id AS VARCHAR))[3]) - 1) * 16
         + (strpos('0123456789abcdef', md5('gx:' || CAST(user_id AS VARCHAR))[4]) - 1)) / 65536.0 * 100.0) AS x,
         (((strpos('0123456789abcdef', md5('gy:' || CAST(user_id AS VARCHAR))[1]) - 1) * 4096
         + (strpos('0123456789abcdef', md5('gy:' || CAST(user_id AS VARCHAR))[2]) - 1) * 256
         + (strpos('0123456789abcdef', md5('gy:' || CAST(user_id AS VARCHAR))[3]) - 1) * 16
         + (strpos('0123456789abcdef', md5('gy:' || CAST(user_id AS VARCHAR))[4]) - 1)) / 65536.0 * 100.0) AS y
  FROM keys),
cpts AS (SELECT user_id, x, y, CAST(floor(x) AS BIGINT) AS cx, CAST(floor(y) AS BIGINT) AS cy FROM pts),
probe AS (
  SELECT p.user_id, p.x, p.y, p.cx + o.dx AS cx, p.cy + o.dy AS cy
  FROM cpts p CROSS JOIN (
    VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dx, dy)),
cand AS (
  SELECT power(pr.x - b.x, 2) + power(pr.y - b.y, 2) AS d2
  FROM probe pr JOIN cpts b ON pr.cx = b.cx AND pr.cy = b.cy AND b.user_id > pr.user_id),
cells AS (SELECT cx, cy, count(*) AS n FROM cpts GROUP BY cx, cy)
SELECT (SELECT count(*)::BIGINT FROM cpts) AS n_points,
       (SELECT count(*)::BIGINT FROM cells) AS n_cells,
       (SELECT CAST(max(n) AS BIGINT) FROM cells) AS max_cell_points,
       (SELECT count(*)::BIGINT FROM cand) AS n_candidate_pairs,
       (SELECT count(*)::BIGINT FROM cand WHERE d2 <= 1.0) AS n_matches,
       (SELECT round(avg(sqrt(d2)), 6) FROM cand WHERE d2 <= 1.0) AS mean_match_dist
"""


def retention_ttl_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-retention TTL plan — the lake-maintenance pass a
    compliance policy turns into partition deletes: with a 20-day TTL
    against the corpus's own reference date (its max event day), each
    daily partition is classified keep/expire, and the plan reports
    per status the partition count, row count, byte estimate (payload
    lengths), and days-to-expiry bounds. The dry-run a steward signs
    before `DELETE PARTITION` runs — and the same census the storage
    forecast reads.

    100 TB: one (day) aggregate over the log (map-side combined);
    the classification is arithmetic against the broadcast reference
    date. Day is the partition key, so executing the plan is a
    metadata-only partition drop."""
    ttl_days = 20
    ev = load_table(spark, "events", sf_dir)
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_day"))
    per_day = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.length("props")).cast("bigint").alias("est_bytes"),
    )
    classified = per_day.crossJoin(F.broadcast(ref)).select(
        "day",
        "n_rows",
        "est_bytes",
        F.datediff(F.col("ref_day"), F.col("day")).alias("age_days"),
        F.when(F.datediff(F.col("ref_day"), F.col("day")) > ttl_days, "expire")
        .otherwise("keep")
        .alias("status"),
    )
    return (
        classified.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("est_bytes").cast("bigint").alias("est_bytes"),
            F.min("age_days").cast("bigint").alias("min_age_days"),
            F.max("age_days").cast("bigint").alias("max_age_days"),
        )
        .orderBy("status")
    )


RETENTION_TTL_SQL = """
WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
per_day AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS n_rows,
         CAST(sum(length(props)) AS BIGINT) AS est_bytes
  FROM events GROUP BY 1),
classified AS (
  SELECT day, n_rows, est_bytes,
         date_diff('day', day, ref_day) AS age_days,
         CASE WHEN date_diff('day', day, ref_day) > 20 THEN 'expire' ELSE 'keep' END AS status
  FROM per_day CROSS JOIN ref)
SELECT status,
       count(*)::BIGINT AS n_partitions,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(sum(est_bytes) AS BIGINT) AS est_bytes,
       CAST(min(age_days) AS BIGINT) AS min_age_days,
       CAST(max(age_days) AS BIGINT) AS max_age_days
FROM classified
GROUP BY status
ORDER BY status
"""


def join_skew_diagnoser(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew diagnosis for the fact-table join keys — the
    pre-flight check that decides salting/AQE-skew-join settings
    BEFORE a 100 TB join runs: per candidate key, the key-frequency
    profile (distinct keys, hottest key's row count, skew ratio =
    max/avg, p99 frequency) and the recommended salt fan-out
    ceil(max_freq / (rows/32)) — i.e. how many sub-keys the hottest
    key needs so no shuffle partition exceeds the average load at 32
    partitions.

    100 TB: each profile is one groupBy(key).count() + a 1-row
    aggregate — the same partial-aggregated word-count shape as
    text_vocabulary; nothing here grows with skew itself."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)

    def prof(df: DataFrame, key: str):
        freq = df.groupBy(key).agg(F.count(F.lit(1)).alias("f"))
        return freq.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("f").alias("total_rows"),
            F.max("f").alias("max_freq"),
            F.round(F.max("f") / F.avg("f"), 6).alias("skew_ratio"),
            F.round(F.expr("percentile(f, 0.99)"), 6).alias("p99_freq"),
            F.greatest(
                F.lit(1),
                F.ceil(F.max("f") / (F.sum("f") / F.lit(32.0))),
            ).cast("int").alias("recommended_salt"),
        ).select(F.lit(key).alias("join_key"), "*")

    out = prof(li, "l_orderkey")
    for df, key in ((li, "l_partkey"), (li, "l_suppkey"), (o, "o_custkey")):
        out = out.unionByName(prof(df, key))
    return out.orderBy("join_key")


JOIN_SKEW_SQL = """
WITH p AS (
  SELECT 'l_orderkey' AS join_key, count(*) AS f FROM lineitem GROUP BY l_orderkey
  UNION ALL
  SELECT 'l_partkey', count(*) FROM lineitem GROUP BY l_partkey
  UNION ALL
  SELECT 'l_suppkey', count(*) FROM lineitem GROUP BY l_suppkey
  UNION ALL
  SELECT 'o_custkey', count(*) FROM orders GROUP BY o_custkey)
SELECT join_key,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(f) AS BIGINT) AS total_rows,
       CAST(max(f) AS BIGINT) AS max_freq,
       round(max(f) / avg(f), 6) AS skew_ratio,
       round(quantile_cont(f, 0.99), 6) AS p99_freq,
       CAST(greatest(1, ceil(max(f) / (sum(f) / 32.0))) AS INT) AS recommended_salt
FROM p
GROUP BY join_key
ORDER BY join_key
"""


def table_checksum_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksums for the three fact tables —
    the migration/replication integrity gate: per table, the row count
    plus a checksum SUM(md5-derived 40-bit row hash) over the business
    key columns. Addition is commutative, so the checksum is invariant
    to partitioning/ordering, and 40-bit terms keep the sum exactly
    representable in a BIGINT far past 10^9 rows — both engines
    compute the identical integer.

    100 TB: a map-only projection + one global sum per table; no
    shuffle carries rows."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)

    def chk(df: DataFrame, name: str, *cols: str):
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", *[F.col(x).cast("string") for x in cols])), 1, 10),
            16,
            10,
        ).cast("bigint")
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(h).alias("checksum"),
        ).select(F.lit(name).alias("table_name"), "n_rows", "checksum")

    return (
        chk(li, "lineitem", "l_orderkey", "l_linenumber", "l_quantity")
        .unionByName(chk(o, "orders", "o_orderkey", "o_custkey", "o_totalprice"))
        .unionByName(chk(c, "customer", "c_custkey", "c_acctbal"))
        .orderBy("table_name")
    )


TABLE_CHECKSUM_SQL = """
WITH li AS (
  SELECT 'lineitem' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(('0x' || substr(md5(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR
                                 || '|' || l_quantity::VARCHAR), 1, 10))::BIGINT) AS BIGINT) AS checksum
  FROM lineitem),
o AS (
  SELECT 'orders', CAST(count(*) AS BIGINT),
         CAST(sum(('0x' || substr(md5(o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR
                                 || '|' || o_totalprice::VARCHAR), 1, 10))::BIGINT) AS BIGINT)
  FROM orders),
c AS (
  SELECT 'customer', CAST(count(*) AS BIGINT),
         CAST(sum(('0x' || substr(md5(c_custkey::VARCHAR || '|' || c_acctbal::VARCHAR), 1, 10))::BIGINT) AS BIGINT)
  FROM customer)
SELECT * FROM li UNION ALL SELECT * FROM o UNION ALL SELECT * FROM c
ORDER BY table_name
"""

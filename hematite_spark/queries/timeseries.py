"""Time-series, drift, and sequential-monitoring operators over the
events table (split out of advanced.py in round 8; VERDICT r7 item 6).
Every public name here is re-exported by queries.advanced, which stays
the catalog facade — __spark_entry__ keys are unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table

def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly detection: per event type, each day's
    value total is z-scored against that type's own 30-day
    mean/stddev, and days with |z| ≥ 1.8 are flagged — the monitoring
    query every event pipeline runs over its ingest lake.

    One groupBy(type, day) pre-aggregate compresses the log to
    O(types × days) rows BEFORE the window pass, so the window
    function (mean/std per type) runs on a tiny frame — at 100 TB
    the expensive aggregate is the pre-agg, which map-side combines;
    nothing downstream ever re-touches the raw events. Daily sums
    and z-scores are rounded before the threshold so both engines
    flag identical days."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("daily_value"))
    )
    w = W.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "daily_value",
        F.round(
            (F.col("daily_value") - F.avg("daily_value").over(w))
            / F.stddev_samp("daily_value").over(w),
            4,
        ).alias("z"),
    )
    return scored.where(F.abs(F.col("z")) >= 1.8).orderBy("event_type", "day")


ANOMALY_ZSCORE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 4) AS daily_value
  FROM events GROUP BY event_type, day
), scored AS (
  SELECT event_type, day, daily_value,
         round((daily_value - avg(daily_value) OVER (PARTITION BY event_type))
               / stddev_samp(daily_value) OVER (PARTITION BY event_type), 4) AS z
  FROM daily
)
SELECT event_type, day, daily_value, z
FROM scored
WHERE abs(z) >= 1.8
ORDER BY event_type, day
"""


def resample_fill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: a complete per-user daily spine
    (sequence-explode over the corpus date range) left-joined with
    actual daily totals, gaps forward-filled with the last observed
    value — the regularization pass every downstream model or
    retention metric needs over sparse activity logs.

    The spine is generated distributed (one sequence per user — no
    driver loop), the join shuffles on (user, day) once, and the
    forward fill is a single last-value-ignore-nulls window
    partitioned by user, so users fill in parallel and state per
    task is one scalar."""
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    filled = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        (F.col("v").isNull() & F.last("v", ignorenulls=True).over(w).isNotNull())
        .cast("bigint")
        .alias("is_gap"),
    )
    return filled.orderBy("user_id", "day")


RESAMPLE_FILL_SQL = """
WITH bounds AS (
  SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM events), bounds
), daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, round(sum(value), 4) AS v
  FROM events GROUP BY user_id, day
)
SELECT s.user_id, s.day,
       last_value(d.v IGNORE NULLS) OVER w AS v_filled,
       CAST(d.v IS NULL AND last_value(d.v IGNORE NULLS) OVER w IS NOT NULL AS BIGINT) AS is_gap
FROM spine s LEFT JOIN daily d USING (user_id, day)
WINDOW w AS (PARTITION BY s.user_id ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY s.user_id, s.day
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current type), from a lag-1 window
    per user — the sequence statistic behind funnel modeling, churn
    prediction features, and session simulators. One window pass
    partitioned by user (parallel across users, state = one row),
    one map-side-combined aggregate; ordering ties break on event_id
    so both engines see identical sequences."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    counts = steps.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    w_src = W.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_src), 4).alias("p"),
    ).orderBy("event_type", "next_type")


TRANSITION_MATRIX_SQL = """
WITH steps AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), counts AS (
  SELECT event_type, next_type, count(*) AS n
  FROM steps WHERE next_type IS NOT NULL
  GROUP BY event_type, next_type
)
SELECT event_type, next_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 4) AS p
FROM counts
ORDER BY event_type, next_type
"""


def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value to its type's exact
    [p05, p95] band and report the per-type effect (n clipped low/
    high, mean before/after) — the standard outlier-taming pass
    before training on heavy-tailed metrics. The percentile pass is
    one groupBy over the pre-aggregated type key; the clip is a
    broadcast join back (bounds are O(types) rows), so the fact
    table is scanned twice but shuffled never."""
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("v_clip"),
        (F.col("value") < F.col("lo")).cast("bigint").alias("is_lo"),
        (F.col("value") > F.col("hi")).cast("bigint").alias("is_hi"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_lo").alias("n_clipped_low"),
            F.sum("is_hi").alias("n_clipped_high"),
            F.round(F.avg("value"), 4).alias("mean_raw"),
            F.round(F.avg("v_clip"), 4).alias("mean_winsorized"),
        )
        .orderBy("event_type")
    )


WINSORIZE_SQL = """
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
), clipped AS (
  SELECT e.event_type, e.value,
         least(greatest(e.value, b.lo), b.hi) AS v_clip,
         CAST(e.value < b.lo AS BIGINT) AS is_lo,
         CAST(e.value > b.hi AS BIGINT) AS is_hi
  FROM events e JOIN bounds b USING (event_type)
)
SELECT event_type, count(*) AS n,
       CAST(sum(is_lo) AS BIGINT) AS n_clipped_low,
       CAST(sum(is_hi) AS BIGINT) AS n_clipped_high,
       round(avg(value), 4) AS mean_raw,
       round(avg(v_clip), 4) AS mean_winsorized
FROM clipped
GROUP BY event_type
ORDER BY event_type
"""


def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histograms per event type (10 buckets over
    the type's own [min, max]) — the profiling companion to the
    column profiler: one broadcast of O(types) bounds, one
    map-side-combined bucket count; bucket bounds travel in the
    result so the histogram renders without re-touching the data."""
    ev = load_table(spark, "events", sf_dir)
    bounds = ev.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    width = (F.col("mx") - F.col("mn")) / 10
    b = F.least(F.floor((F.col("value") - F.col("mn")) / width), F.lit(9)).cast("bigint")
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select("event_type", "value", "mn", "mx", b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("mn") + F.col("bucket") * (F.min("mx") - F.min("mn")) / 10, 4).alias(
                "bucket_lo"
            ),
            F.round(F.min("mn") + (F.col("bucket") + 1) * (F.min("mx") - F.min("mn")) / 10, 4).alias(
                "bucket_hi"
            ),
        )
        .orderBy("event_type", "bucket")
    )


HISTOGRAM_SQL = """
WITH bounds AS (
  SELECT event_type, min(value) AS mn, max(value) AS mx FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(least(floor((e.value - b.mn) / ((b.mx - b.mn) / 10)), 9) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(b.mn) + CAST(least(floor((e.value - b.mn) / ((b.mx - b.mn) / 10)), 9) AS BIGINT)
             * (min(b.mx) - min(b.mn)) / 10, 4) AS bucket_lo,
       round(min(b.mn) + (CAST(least(floor((e.value - b.mn) / ((b.mx - b.mn) / 10)), 9) AS BIGINT) + 1)
             * (min(b.mx) - min(b.mn)) / 10, 4) AS bucket_hi
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type, bucket
ORDER BY e.event_type, bucket
"""


def revenue_growth_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period revenue: monthly totals with month-over-month
    and year-over-year growth from lag windows — the BI trend shape
    every revenue dashboard starts from. The fact table collapses to
    O(months) rows in one map-side-combined aggregate before any
    window, so the lag pass is effectively free; growth is rounded to
    4 so both engines agree on the exact percentages."""
    orders = load_table(spark, "orders", sf_dir)
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = W.orderBy("month")
    prev_m = F.lag("revenue", 1).over(w)
    prev_y = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev_m) / prev_m * 100, 4).alias("mom_pct"),
        F.round((F.col("revenue") - prev_y) / prev_y * 100, 4).alias("yoy_pct"),
    ).orderBy("month")


REVENUE_GROWTH_SQL = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY month
)
SELECT month, revenue,
       round((revenue - lag(revenue, 1) OVER (ORDER BY month))
             / lag(revenue, 1) OVER (ORDER BY month) * 100, 4) AS mom_pct,
       round((revenue - lag(revenue, 12) OVER (ORDER BY month))
             / lag(revenue, 12) OVER (ORDER BY month) * 100, 4) AS yoy_pct
FROM monthly
ORDER BY month
"""


def corr_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlation matrix of the event types' daily mean
    values — the feature-correlation report that precedes any
    modeling step. Relational formulation: pre-aggregate to the
    O(types × days) daily series FIRST, self-join on the day with
    type_a < type_b, then one co-moment aggregate per pair — so the
    corpus is scanned once and the join input is vocabulary-scale,
    never the raw event log. Rounded to 4 decimals so co-moment
    merge order cannot surface."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type").alias("etype")
    ).agg(F.avg("value").alias("mean_val"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, (F.col("a.day") == F.col("b.day")) & (F.col("a.etype") < F.col("b.etype")))
    return (
        pairs.select(
            F.col("a.etype").alias("type_a"),
            F.col("b.etype").alias("type_b"),
            F.col("a.mean_val").alias("va"),
            F.col("b.mean_val").alias("vb"),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_days"),
            (F.round(F.corr("va", "vb"), 4) + F.lit(0.0)).alias("corr"),
        )
        .orderBy("type_a", "type_b")
    )


CORR_MATRIX_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS etype, avg(value) AS mean_val
  FROM events
  GROUP BY 1, 2)
SELECT a.etype AS type_a, b.etype AS type_b,
       count(*) AS n_days,
       round(corr(a.mean_val, b.mean_val), 4) + 0.0 AS corr
FROM daily a JOIN daily b ON a.day = b.day AND a.etype < b.etype
GROUP BY a.etype, b.etype
ORDER BY type_a, type_b
"""


def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (DAU/WAU) — the windowed COUNT
    DISTINCT SQL window frames cannot express (distinct doesn't
    decompose over sliding frames). The scalable formulation: compress
    the log to the distinct (day, user) grid FIRST — one hash
    aggregate, corpus → O(days × active users) — then a day-grid range
    self-join re-counts each 7-day window over the compressed table.
    The join input is the pre-aggregate, so the quadratic term is
    days², not events².

    At 100 TB the alternative is an HLL sketch per day merged over the
    window (mergeability is what the sketch buys); this exact form is
    its oracle."""
    ev = load_table(spark, "events", sf_dir)
    day_user = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = day_user.select("day").distinct()
    d, g = days.alias("d"), day_user.alias("g")
    win = d.join(
        g,
        (F.col("g.day") <= F.col("d.day"))
        & (F.col("g.day") >= F.date_sub(F.col("d.day"), 6)),
    )
    dau = day_user.groupBy("day").agg(F.count("*").alias("dau"))
    wau = win.groupBy(F.col("d.day").alias("day")).agg(
        F.countDistinct("g.user_id").alias("wau_7d")
    )
    return (
        dau.join(wau, "day")
        .select("day", "dau", "wau_7d")
        .orderBy("day")
    )


ROLLING_DISTINCT_SQL = """
WITH day_user AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM day_user),
dau AS (SELECT day, count(*) AS dau FROM day_user GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT g.user_id) AS wau_7d
  FROM days d JOIN day_user g
    ON g.day <= d.day AND g.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day)
SELECT dau.day AS day, dau, wau_7d
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY day
"""


def feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift detection between two order
    periods (before/after 1998-05) — the ML-ops gate that catches a
    feature's distribution silently shifting between training and
    serving. Numeric feature (o_totalprice) bins on the COMBINED
    deciles so both periods share a fixed grid; the categorical
    feature (o_orderpriority) uses its category cells directly. Counts
    are Laplace-smoothed so empty cells can't blow up the log-ratio.
    PSI > 0.1 is the conventional 'investigate' line, > 0.25 'act'.

    Shape: one pass for the decile cuts (broadcast), one pass for the
    (period, cell) counts, then cell-level arithmetic on an O(bins)
    table. Nothing re-reads the corpus to evaluate drift at another
    threshold — the cell table is the artifact."""
    orders = load_table(spark, "orders", sf_dir)
    cut_ts = F.lit("1998-05-01").cast("timestamp")
    period = F.when(F.col("o_orderdate") < cut_ts, "a").otherwise("b")
    cuts = orders.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(i / 10.0) for i in range(1, 10)])).alias("cuts")
    )
    binned = orders.select(period.alias("period"), "o_totalprice", "o_orderpriority").crossJoin(
        F.broadcast(cuts)
    )
    num_cells = binned.select(
        F.lit("o_totalprice").alias("metric"),
        "period",
        F.aggregate(
            "cuts", F.lit(0), lambda acc, c: acc + F.when(F.col("o_totalprice") > c, 1).otherwise(0)
        )
        .cast("string")
        .alias("cell"),
    )
    cat_cells = orders.select(
        F.lit("o_orderpriority").alias("metric"), period.alias("period"), F.col("o_orderpriority").alias("cell")
    )
    cells = num_cells.unionByName(cat_cells).groupBy("metric", "cell").agg(
        F.sum(F.when(F.col("period") == "a", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("period") == "b", 1).otherwise(0)).alias("nb"),
    )
    tot = cells.groupBy("metric").agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb"), F.count("*").alias("n_cells")
    )
    smoothed = cells.join(tot, "metric").select(
        "metric",
        "n_cells",
        ((F.col("na") + 0.5) / (F.col("ta") + 0.5 * F.col("n_cells"))).alias("p"),
        ((F.col("nb") + 0.5) / (F.col("tb") + 0.5 * F.col("n_cells"))).alias("q"),
    )
    return (
        smoothed.groupBy("metric", "n_cells")
        .agg(F.round(F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))), 6).alias("psi"))
        .select("metric", F.col("n_cells").cast("bigint").alias("n_cells"), "psi",
                (F.col("psi") > 0.1).alias("drifted"))
        .orderBy("metric")
    )


FEATURE_DRIFT_SQL = """
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM orders),
num_cells AS (
  SELECT 'o_totalprice' AS metric,
         CASE WHEN o_orderdate < TIMESTAMP '1998-05-01' THEN 'a' ELSE 'b' END AS period,
         CAST(len(list_filter(cuts, c -> o_totalprice > c)) AS VARCHAR) AS cell
  FROM orders CROSS JOIN cuts),
cat_cells AS (
  SELECT 'o_orderpriority' AS metric,
         CASE WHEN o_orderdate < TIMESTAMP '1998-05-01' THEN 'a' ELSE 'b' END AS period,
         o_orderpriority AS cell
  FROM orders),
cells AS (
  SELECT metric, cell,
         sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS na,
         sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS nb
  FROM (SELECT * FROM num_cells UNION ALL SELECT * FROM cat_cells)
  GROUP BY metric, cell),
tot AS (
  SELECT metric, sum(na) AS ta, sum(nb) AS tb, count(*) AS n_cells
  FROM cells GROUP BY metric),
smoothed AS (
  SELECT c.metric, t.n_cells,
         (c.na + 0.5) / (t.ta + 0.5 * t.n_cells) AS p,
         (c.nb + 0.5) / (t.tb + 0.5 * t.n_cells) AS q
  FROM cells c JOIN tot t ON c.metric = t.metric)
SELECT metric, CAST(n_cells AS BIGINT) AS n_cells,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       round(sum((p - q) * ln(p / q)), 6) > 0.1 AS drifted
FROM smoothed
GROUP BY metric, n_cells
ORDER BY metric
"""


def markov_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain — where
    event_transition_matrix's P(next|current) settles if user behavior
    runs forever: three unrolled power steps π ← πP from the uniform
    start. Each step is a join of the O(types) π row-set against the
    O(types²) edge list + one aggregate — the same lazy unrolled-
    fixpoint pattern as the PCA/GD chains, but over a broadcast-sized
    transition table, so the whole computation is metadata-scale after
    the single corpus pass that builds the edges."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = steps.groupBy("cur", "nxt").agg(F.count("*").alias("n"))
    edges = counts.withColumn(
        "p", F.col("n") / F.sum("n").over(W.partitionBy("cur"))
    ).select("cur", "nxt", "p").localCheckpoint()
    pi = edges.select(F.col("cur").alias("state")).distinct().withColumn(
        "pi", F.lit(1.0) / F.count("*").over(W.partitionBy())
    )
    for _ in range(3):
        pi = (
            edges.join(pi, edges.cur == pi.state)
            .groupBy(F.col("nxt").alias("state"))
            .agg(F.sum(F.col("p") * F.col("pi")).alias("pi"))
        )
    return pi.select("state", F.round("pi", 6).alias("pi")).orderBy("state")


MARKOV_STATIONARY_SQL = """
WITH steps AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
counts AS (
  SELECT cur, nxt, count(*) AS n FROM steps WHERE nxt IS NOT NULL GROUP BY cur, nxt),
edges AS (
  SELECT cur, nxt, n / CAST(sum(n) OVER (PARTITION BY cur) AS DOUBLE) AS p FROM counts),
p0 AS (
  SELECT cur AS state, 1.0 / (SELECT count(DISTINCT cur) FROM edges) AS pi
  FROM (SELECT DISTINCT cur FROM edges)),
p1 AS (SELECT e.nxt AS state, sum(e.p * p.pi) AS pi FROM edges e JOIN p0 p ON e.cur = p.state GROUP BY e.nxt),
p2 AS (SELECT e.nxt AS state, sum(e.p * p.pi) AS pi FROM edges e JOIN p1 p ON e.cur = p.state GROUP BY e.nxt),
p3 AS (SELECT e.nxt AS state, sum(e.p * p.pi) AS pi FROM edges e JOIN p2 p ON e.cur = p.state GROUP BY e.nxt)
SELECT state, round(pi, 6) AS pi FROM p3 ORDER BY state
"""


def user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity segmentation — Shannon entropy of each
    user's event-type mix (0 bits = single-type bot-like, ~2.3 bits =
    uniform across 5 types), bucketed into quarter-bit bands. The
    cheap engagement-diversity feature: two hash aggregates on the
    user key, entropy math on the O(users × types) middle table, and
    the report is O(bands)."""
    ev = load_table(spark, "events", sf_dir)
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    tot = per.withColumn("share", F.col("n") / F.sum("n").over(W.partitionBy("user_id")))
    ent = tot.groupBy("user_id").agg(
        (-F.sum(F.col("share") * F.log2("share"))).alias("entropy"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    band = (F.floor(F.col("entropy") / 0.25) * 0.25).alias("entropy_band")
    return (
        ent.groupBy(F.round(band, 2).alias("entropy_band"))
        .agg(
            F.count("*").alias("n_users"),
            F.round(F.avg("n_events"), 2).alias("avg_events"),
        )
        .orderBy("entropy_band")
    )


USER_ENTROPY_SQL = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type),
shares AS (
  SELECT user_id, n, n / CAST(sum(n) OVER (PARTITION BY user_id) AS DOUBLE) AS share FROM per),
ent AS (
  SELECT user_id, -sum(share * log2(share)) AS entropy, CAST(sum(n) AS BIGINT) AS n_events
  FROM shares GROUP BY user_id)
SELECT round(floor(entropy / 0.25) * 0.25, 2) AS entropy_band,
       count(*) AS n_users,
       round(avg(n_events), 2) AS avg_events
FROM ent
GROUP BY 1
ORDER BY entropy_band
"""


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily mean event value,
    per event type — the drift tripwire a data pipeline runs on its
    own quality/throughput metrics: S_d = Σ(x̄_day − x̄) peaks at the
    most likely level-shift day, and the normalized statistic
    max|S|/(σ_day·√n) is compared to a fixed threshold (1.36, the
    KS-style 95% line). Output per type: the argmax day, the
    statistic, and the flag.

    100 TB: the event log reduces to an O(types × days) daily table
    (one hash aggregate); every window after that is type-partitioned
    over that pre-aggregate. The final argmax is a max-struct, not a
    sort."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("xbar")
    )
    wt = W.partitionBy("event_type")
    stats = daily.select(
        "event_type",
        "day",
        "xbar",
        F.avg("xbar").over(wt).alias("mu"),
        F.stddev_pop("xbar").over(wt).alias("sd"),
        F.count("*").over(wt).alias("n_days"),
    )
    cusum = stats.withColumn(
        "s",
        F.sum(F.col("xbar") - F.col("mu")).over(
            wt.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    peak = cusum.groupBy("event_type").agg(
        F.max(F.struct(F.abs(F.col("s")).alias("a"), F.col("day").alias("d"))).alias("p"),
        F.max("n_days").cast("bigint").alias("n_days"),
        F.max("sd").alias("sd"),
    )
    stat = F.col("p.a") / (F.col("sd") * F.sqrt(F.col("n_days")))
    return peak.select(
        "event_type",
        "n_days",
        F.col("p.d").alias("changepoint_day"),
        F.round(F.col("p.a"), 6).alias("max_abs_cusum"),
        F.round(stat, 6).alias("cusum_stat"),
        (stat > 1.36).alias("shift_detected"),
    ).orderBy("event_type")


CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS xbar
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
stats AS (
  SELECT event_type, day, xbar,
         avg(xbar) OVER (PARTITION BY event_type) AS mu,
         stddev_pop(xbar) OVER (PARTITION BY event_type) AS sd,
         count(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily),
cusum AS (
  SELECT event_type, day, sd, n_days,
         sum(xbar - mu) OVER (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM stats),
peak AS (
  SELECT event_type,
         (max(struct_pack(a := abs(s), d := day))).a AS max_abs_cusum,
         (max(struct_pack(a := abs(s), d := day))).d AS changepoint_day,
         CAST(max(n_days) AS BIGINT) AS n_days,
         max(sd) AS sd
  FROM cusum GROUP BY event_type)
SELECT event_type, n_days, changepoint_day,
       round(max_abs_cusum, 6) AS max_abs_cusum,
       round(max_abs_cusum / (sd * sqrt(n_days)), 6) AS cusum_stat,
       max_abs_cusum / (sd * sqrt(n_days)) > 1.36 AS shift_detected
FROM peak
ORDER BY event_type
"""


def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest — the time-series
    cross-validation that replaces a single train/test split: three
    expanding-window folds (train through Jan 10/15/20, test the
    following 5 days), each scoring the NAIVE forecast (train-window
    daily mean) against the test window's actuals, per event type.
    Output: per (fold, type) MAE and bias — the table that says
    whether a model beats persistence before anyone ships it.

    100 TB: the event log reduces once to the O(types × days) daily
    table; each fold is a pair of date-range filtered aggregates over
    that pre-aggregate — folds share the scan."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("xbar"))
        .localCheckpoint()  # O(types×days); shared by all folds
    )
    folds = []
    for i, cut in enumerate(("2024-01-11", "2024-01-16", "2024-01-21")):
        train = daily.where(F.col("day") < F.lit(cut)).groupBy("event_type").agg(
            F.avg("xbar").alias("forecast")
        )
        test = daily.where(
            (F.col("day") >= F.lit(cut))
            & (F.col("day") < F.date_add(F.lit(cut).cast("date"), 5))
        )
        folds.append(
            test.join(F.broadcast(train), "event_type")
            .groupBy("event_type")
            .agg(
                F.round(F.avg(F.abs(F.col("xbar") - F.col("forecast"))), 6).alias("mae"),
                F.round(F.avg(F.col("xbar") - F.col("forecast")), 6).alias("bias"),
            )
            .select(F.lit(i + 1).alias("fold"), "event_type", "mae", "bias")
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out.orderBy("fold", "event_type")


ROLLING_BACKTEST_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS xbar
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
folds(fold, cut) AS (VALUES (1, DATE '2024-01-11'), (2, DATE '2024-01-16'), (3, DATE '2024-01-21')),
train AS (
  SELECT f.fold, d.event_type, avg(d.xbar) AS forecast
  FROM daily d JOIN folds f ON d.day < f.cut
  GROUP BY f.fold, d.event_type),
test AS (
  SELECT f.fold, d.event_type, d.xbar
  FROM daily d JOIN folds f ON d.day >= f.cut AND d.day < f.cut + 5)
SELECT t.fold, t.event_type,
       round(avg(abs(t.xbar - tr.forecast)), 6) AS mae,
       round(avg(t.xbar - tr.forecast), 6) AS bias
FROM test t JOIN train tr ON tr.fold = t.fold AND tr.event_type = t.event_type
GROUP BY t.fold, t.event_type
ORDER BY t.fold, t.event_type
"""


def adstock_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock (carryover) transform — marketing-mix
    modeling's lag structure: today's effective exposure is
    Σ_{k=0..7} spend_{t−k}·λ^k (λ=0.6), computed as a bounded
    weighted window over the daily 'view' volume, then correlated
    (Pearson) with same-day purchase revenue per cohort. Emits per
    cohort the raw-vs-adstocked correlation — the lift the carryover
    structure explains beyond same-day spend.

    100 TB: the daily (cohort, day) table is the only state; the
    8-tap window is cohort-partitioned; correlations are one moment
    aggregate per cohort."""
    from pyspark.sql import Window as W

    lam = 0.6
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy((F.col("user_id") % 4).alias("cohort"), F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0)).alias(
                "spend"
            ),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("revenue"),
        )
    )
    wc = W.partitionBy("cohort").orderBy("day")
    adstock = sum(
        F.coalesce(F.lag("spend", k).over(wc), F.lit(0.0)) * (lam**k) for k in range(8)
    )
    scored = daily.withColumn("adstock", adstock)
    return (
        scored.groupBy("cohort")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.corr("spend", "revenue"), 6).alias("corr_raw"),
            F.round(F.corr("adstock", "revenue"), 6).alias("corr_adstock"),
        )
        .select(
            "cohort",
            "n_days",
            "corr_raw",
            "corr_adstock",
            (F.col("corr_adstock") > F.col("corr_raw")).alias("carryover_helps"),
        )
        .orderBy("cohort")
    )


ADSTOCK_SQL = """
WITH daily AS (
  SELECT user_id % 4 AS cohort, CAST(ts AS DATE) AS day,
         sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END) AS spend,
         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) AS revenue
  FROM events GROUP BY 1, 2),
scored AS (
  SELECT cohort, day, spend, revenue,
         coalesce(lag(spend, 0) OVER w, 0.0) * 1.0
       + coalesce(lag(spend, 1) OVER w, 0.0) * 0.6
       + coalesce(lag(spend, 2) OVER w, 0.0) * 0.36
       + coalesce(lag(spend, 3) OVER w, 0.0) * 0.216
       + coalesce(lag(spend, 4) OVER w, 0.0) * 0.1296
       + coalesce(lag(spend, 5) OVER w, 0.0) * 0.07776
       + coalesce(lag(spend, 6) OVER w, 0.0) * 0.046656
       + coalesce(lag(spend, 7) OVER w, 0.0) * 0.0279936
  AS adstock
  FROM daily
  WINDOW w AS (PARTITION BY cohort ORDER BY day))
SELECT cohort, count(*)::BIGINT AS n_days,
       round(corr(spend, revenue), 6) AS corr_raw,
       round(corr(adstock, revenue), 6) AS corr_adstock,
       corr(adstock, revenue) > corr(spend, revenue) AS carryover_helps
FROM scored
GROUP BY cohort
ORDER BY cohort
"""


def control_chart_xbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X̄ control chart over daily event-value subgroups —
    the SPC (statistical process control) view of pipeline health
    that complements CUSUM (CUSUM accumulates small drifts; the
    control chart flags single out-of-limit days): per event type,
    center line = grand mean, limits = ±3·σ̂/√n̄ with σ̂ pooled from
    within-day variance, and the count of days breaching the limits.

    100 TB: one (type, day) aggregate (mean, var, n), one type-level
    roll-up — both map-side combined; limits are arithmetic on the
    roll-up."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"), F.avg("value").alias("xbar"), F.var_pop("value").alias("v")
    )
    stats = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        (F.sum(F.col("xbar") * F.col("n")) / F.sum("n")).alias("center"),
        F.sqrt(F.sum(F.col("v") * F.col("n")) / F.sum("n")).alias("sigma"),
        (F.sum("n") / F.count("*")).alias("nbar"),
    )
    lim = 3.0 * F.col("sigma") / F.sqrt(F.col("nbar"))
    flagged = (
        daily.join(F.broadcast(stats), "event_type")
        .where(
            F.abs(F.col("xbar") - F.col("center")) > 3.0 * F.col("sigma") / F.sqrt(F.col("nbar"))
        )
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_breaches"))
    )
    return (
        stats.join(flagged, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            F.round("center", 6).alias("center"),
            F.round(F.col("center") + lim, 6).alias("ucl"),
            F.round(F.col("center") - lim, 6).alias("lcl"),
            F.coalesce("n_breaches", F.lit(0)).cast("bigint").alias("n_breaches"),
        )
        .orderBy("event_type")
    )


CONTROL_CHART_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         count(*) AS n, avg(value) AS xbar, var_pop(value) AS v
  FROM events GROUP BY 1, 2),
stats AS (
  SELECT event_type, count(*)::BIGINT AS n_days,
         sum(xbar * n) / sum(n) AS center,
         sqrt(sum(v * n) / sum(n)) AS sigma,
         sum(n) / CAST(count(*) AS DOUBLE) AS nbar
  FROM daily GROUP BY event_type),
flagged AS (
  SELECT d.event_type, count(*)::BIGINT AS n_breaches
  FROM daily d JOIN stats s USING (event_type)
  WHERE abs(d.xbar - s.center) > 3.0 * s.sigma / sqrt(s.nbar)
  GROUP BY d.event_type)
SELECT s.event_type, s.n_days,
       round(s.center, 6) AS center,
       round(s.center + 3.0 * s.sigma / sqrt(s.nbar), 6) AS ucl,
       round(s.center - 3.0 * s.sigma / sqrt(s.nbar), 6) AS lcl,
       coalesce(f.n_breaches, 0)::BIGINT AS n_breaches
FROM stats s LEFT JOIN flagged f USING (event_type)
ORDER BY s.event_type
"""


def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley sequential drift detector over each event type's
    DAILY mean value — the classic online changepoint gate (CUSUM's
    one-sided cousin, complementing cusum_changepoint which works on
    totals): m_t = Σ(x_s − x̄_s − δ) with the running mean x̄_s, and
    PH_t = m_t − min_{s≤t} m_s; the alarm fires when PH exceeds λ.
    Emits per type the max PH, the first alarm day (null when the
    series is in control), and the drift verdict.

    100 TB: one groupBy to (type, day) bounds the sequence length by
    the calendar; the three chained windows share one type-partition
    shuffle; state per partition is O(1)."""
    ev = load_table(spark, "events", sf_dir)
    delta, lam = 0.05, 25.0
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.avg("value").alias("x")
    )
    wseq = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s1 = daily.withColumn("xbar", F.avg("x").over(wseq))
    s2 = s1.withColumn("m", F.sum(F.col("x") - F.col("xbar") - delta).over(wseq))
    s3 = s2.withColumn("ph", F.col("m") - F.min("m").over(wseq))
    return (
        s3.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.max("ph"), 6).alias("max_ph"),
            F.min(F.when(F.col("ph") > lam, F.col("d"))).alias("alarm_day"),
            (F.max("ph") > lam).alias("drift_detected"),
        )
        .orderBy("event_type")
    )


PAGE_HINKLEY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, avg(value) AS x
  FROM events GROUP BY 1, 2),
s1 AS (
  SELECT *, avg(x) OVER w AS xbar FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s2 AS (
  SELECT *, sum(x - xbar - 0.05) OVER w AS m FROM s1
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
s3 AS (
  SELECT *, m - min(m) OVER w AS ph FROM s2
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(max(ph), 6) AS max_ph,
       min(CASE WHEN ph > 25.0 THEN d END) AS alarm_day,
       max(ph) > 25.0 AS drift_detected
FROM s3
GROUP BY event_type
ORDER BY event_type
"""


def acf_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation profile of daily order volume per priority at
    lags 1, 2, 3, 7 — the seasonality fingerprint that picks the
    differencing/seasonal terms before any forecasting model: each
    (priority, lag) pair Pearson-correlates the daily count series
    with itself shifted by exactly `lag` CALENDAR days (a day join,
    so gaps never misalign the series the way a row-offset lag
    would).

    100 TB: one groupBy to the daily table (calendar-bounded), a
    4-lag explode, and a self-join on (priority, day+lag); corr is a
    per-(priority, lag) moment aggregate."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    lags = daily.select(
        "o_orderpriority", "d", "y",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(7))).alias("lag"),
    )
    prev = daily.select(
        F.col("o_orderpriority").alias("p2"),
        F.col("d").alias("d2"),
        F.col("y").alias("y_prev"),
    )
    j = lags.join(
        prev,
        (F.col("o_orderpriority") == F.col("p2"))
        & (F.col("d2") == F.date_sub(F.col("d"), F.col("lag"))),
    )
    g = j.groupBy("o_orderpriority", "lag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("y").alias("sx"),
        F.sum("y_prev").alias("sy"),
        F.sum(F.col("y") * F.col("y_prev")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
        F.sum(F.col("y_prev") * F.col("y_prev")).alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    # guarded explicitly (not corr()): a degenerate constant/1-pair
    # group must yield NULL, identically on both engines
    acf = F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6))
    return g.select(
        "o_orderpriority",
        "lag",
        F.col("n").cast("bigint").alias("n_pairs"),
        acf.alias("acf"),
    ).orderBy("o_orderpriority", "lag")


ACF_LAG_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
lags AS (
  SELECT daily.*, l.lag
  FROM daily CROSS JOIN (SELECT unnest([1, 2, 3, 7]) AS lag) l),
j AS (
  SELECT a.o_orderpriority, a.lag, a.y, b.y AS y_prev
  FROM lags a JOIN daily b
    ON b.o_orderpriority = a.o_orderpriority AND b.d = a.d - a.lag),
g AS (
  SELECT o_orderpriority, lag, CAST(count(*) AS DOUBLE) AS n,
         sum(y) AS sx, sum(y_prev) AS sy, sum(y * y_prev) AS sxy,
         sum(y * y) AS sxx, sum(y_prev * y_prev) AS syy
  FROM j GROUP BY o_orderpriority, lag)
SELECT o_orderpriority, lag,
       CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN sxx - sx * sx / n > 0 AND syy - sy * sy / n > 0
            THEN round((sxy - sx * sy / n)
                       / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)), 6)
       END AS acf
FROM g
ORDER BY o_orderpriority, lag
"""


def ewma_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-EWMA one-step-ahead forecast backtest on daily order
    volume per priority: forecast_t = Σ_{k=1..14} α(1−α)^(k−1)·y_{t−k}
    normalized over the lags actually present (α = 0.3, calendar-day
    lags so gaps shrink the kernel instead of misaligning it); emits
    per-priority MAE/MAPE over all days with ≥7 available lags — the
    baseline every fancier forecaster must beat.

    100 TB: the daily table is calendar-bounded; the 14-lag explode
    joins day arithmetic (no ordered window state); the backtest is
    one aggregate."""
    o = load_table(spark, "orders", sf_dir)
    alpha = 0.3
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    ks = daily.select(
        "o_orderpriority", "d", "y",
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("k"),
    )
    prev = daily.select(
        F.col("o_orderpriority").alias("p2"),
        F.col("d").alias("d2"),
        F.col("y").alias("y_prev"),
    )
    j = ks.join(
        prev,
        (F.col("o_orderpriority") == F.col("p2"))
        & (F.col("d2") == F.date_sub(F.col("d"), F.col("k"))),
    ).withColumn("w", F.lit(alpha) * F.pow(F.lit(1 - alpha), F.col("k") - 1))
    fc = j.groupBy("o_orderpriority", "d", "y").agg(
        (F.sum(F.col("w") * F.col("y_prev")) / F.sum("w")).alias("forecast"),
        F.count(F.lit(1)).alias("n_lags"),
    )
    return (
        fc.where(F.col("n_lags") >= 7)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.avg(F.abs(F.col("y") - F.col("forecast"))), 6).alias("mae"),
            F.round(
                F.avg(F.abs(F.col("y") - F.col("forecast")) / F.col("y")), 6
            ).alias("mape"),
        )
        .orderBy("o_orderpriority")
    )


EWMA_BACKTEST_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
ks AS (
  SELECT daily.*, k.k
  FROM daily CROSS JOIN (SELECT unnest(generate_series(1, 14)) AS k) k),
j AS (
  SELECT a.o_orderpriority, a.d, a.y,
         0.3 * pow(0.7, a.k - 1) AS w, b.y AS y_prev
  FROM ks a JOIN daily b
    ON b.o_orderpriority = a.o_orderpriority
   AND b.d = a.d - CAST(a.k AS INTEGER)),
fc AS (
  SELECT o_orderpriority, d, y,
         sum(w * y_prev) / sum(w) AS forecast, count(*) AS n_lags
  FROM j GROUP BY o_orderpriority, d, y)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(abs(y - forecast)), 6) AS mae,
       round(avg(abs(y - forecast) / y), 6) AS mape
FROM fc
WHERE n_lags >= 7
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def fano_factor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of per-hour event counts) per
    event type — the time-domain burstiness gauge: ≈1 is Poisson
    arrivals, ≫1 is bursty/clumped traffic (the capacity-planning
    companion to token_burstiness's content-domain measure). Counts
    over the full hour grid INCLUDING empty hours (zeros matter:
    dropping them biases the factor down), built by generating each
    type's hour range from its own min/max.

    100 TB: the (type, hour) table is calendar-bounded; the zero
    filling is a sequence() explode of the per-type hour span joined
    to observed counts — never a per-row pass."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    filled = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", F.coalesce("c", F.lit(0.0)).alias("c")
    )
    g = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.avg("c").alias("mean_c"),
        F.var_pop("c").alias("var_c"),
    )
    return g.select(
        "event_type",
        "n_hours",
        F.round("mean_c", 6).alias("mean_per_hour"),
        F.round(F.col("var_c") / F.col("mean_c"), 6).alias("fano_factor"),
        (F.col("var_c") / F.col("mean_c") > 1.5).alias("bursty"),
    ).orderBy("event_type")


FANO_FACTOR_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2),
span AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM span),
filled AS (
  SELECT g.event_type, coalesce(hourly.c, 0.0) AS c
  FROM grid g LEFT JOIN hourly ON hourly.event_type = g.event_type AND hourly.h = g.h),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         avg(c) AS mean_c, var_pop(c) AS var_c
  FROM filled GROUP BY event_type)
SELECT event_type, n_hours,
       round(mean_c, 6) AS mean_per_hour,
       round(var_c / mean_c, 6) AS fano_factor,
       var_c / mean_c > 1.5 AS bursty
FROM g
ORDER BY event_type
"""


def seasonal_weekday_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality index per order priority: each weekday's
    average daily order count divided by the priority's overall daily
    average — the multiplicative seasonal profile that normalizes
    weekly rhythm out of trend monitors (the seasonal factor
    timeseries_decompose_daily estimates globally, read per
    priority × weekday).

    100 TB: daily table is calendar-bounded; two nested aggregates,
    the second joined back as a broadcast per-priority mean."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority",
        F.to_date("o_orderdate").alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    daily = daily.withColumn("dow", F.dayofweek("d"))
    per_dow = daily.groupBy("o_orderpriority", "dow").agg(
        F.avg("y").alias("dow_avg"), F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    overall = daily.groupBy("o_orderpriority").agg(F.avg("y").alias("all_avg"))
    return (
        per_dow.join(F.broadcast(overall), "o_orderpriority")
        .select(
            "o_orderpriority",
            "dow",
            "n_days",
            F.round(F.col("dow_avg") / F.col("all_avg"), 6).alias("seasonal_index"),
        )
        .orderBy("o_orderpriority", "dow")
    )


WEEKDAY_INDEX_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
dowd AS (
  SELECT o_orderpriority, CAST(dayofweek(d) + 1 AS INT) AS dow, y FROM daily),
per_dow AS (
  SELECT o_orderpriority, dow, avg(y) AS dow_avg,
         CAST(count(*) AS BIGINT) AS n_days
  FROM dowd GROUP BY 1, 2),
overall AS (
  SELECT o_orderpriority, avg(y) AS all_avg FROM daily GROUP BY 1)
SELECT p.o_orderpriority, p.dow, p.n_days,
       round(p.dow_avg / o.all_avg, 6) AS seasonal_index
FROM per_dow p JOIN overall o USING (o_orderpriority)
ORDER BY o_orderpriority, dow
"""


def hurst_rs_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily order volume by rescaled-range (R/S)
    analysis: split the day-indexed series into blocks of 8 and 16
    days, compute each block's R (range of cumulative mean
    deviations) over S (stddev), and read H as the log2 slope of the
    mean R/S between the two block sizes — H≈0.5 is a random walk,
    H>0.5 long-range persistence (burst clustering that breaks naive
    Poisson capacity models).

    100 TB: the series is calendar-bounded; the day index derives
    from a broadcast min-date (no global row numbering); all windows
    partition by block."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("d", "d0").alias("i"), "y"
    )
    out = None
    for bs in (8, 16):
        blk = idx.select((F.col("i") / bs).cast("int").alias("b"), "i", "y")
        full = blk.groupBy("b").agg(
            F.count(F.lit(1)).alias("nb"),
            F.avg("y").alias("mb"),
            F.stddev_pop("y").alias("sb"),
        ).where((F.col("nb") == bs) & (F.col("sb") > 0))
        wcum = (
            W.partitionBy("b").orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        dev = blk.join(full, "b").withColumn(
            "cum", F.sum(F.col("y") - F.col("mb")).over(wcum)
        )
        rs = dev.groupBy("b").agg(
            ((F.max("cum") - F.min("cum")) / F.max("sb")).alias("rs")
        )
        row = rs.agg(
            F.lit(bs).alias("block_size"),
            F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
            F.avg("rs").alias("mean_rs"),
        )
        out = row if out is None else out.unionByName(row)
    piv = out.agg(
        F.max(F.when(F.col("block_size") == 8, F.col("mean_rs"))).alias("rs8"),
        F.max(F.when(F.col("block_size") == 16, F.col("mean_rs"))).alias("rs16"),
        F.max(F.when(F.col("block_size") == 8, F.col("n_blocks"))).alias("nb8"),
        F.max(F.when(F.col("block_size") == 16, F.col("n_blocks"))).alias("nb16"),
    )
    h = F.log2(F.col("rs16") / F.col("rs8"))
    return piv.select(
        # a size with zero qualifying blocks reports NULL (not 0), the
        # same shape the SQL twin's empty lateral produces
        F.when(F.col("rs8").isNotNull(), F.col("nb8")).cast("bigint").alias("blocks_8"),
        F.when(F.col("rs16").isNotNull(), F.col("nb16")).cast("bigint").alias("blocks_16"),
        F.round("rs8", 6).alias("mean_rs_8"),
        F.round("rs16", 6).alias("mean_rs_16"),
        F.round(h, 6).alias("hurst_h"),
        (h > 0.6).alias("persistent"),
    )


HURST_RS_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1),
d0 AS (SELECT min(d) AS d0 FROM daily),
idx AS (SELECT datediff('day', d0.d0, d) AS i, y FROM daily CROSS JOIN d0),
rs_by AS (
  SELECT bs.bs AS block_size, avg(rs.rs) AS mean_rs, count(*) AS n_blocks
  FROM (SELECT unnest([8, 16]) AS bs) bs,
  LATERAL (
    WITH blk AS (
      SELECT CAST(floor(i / bs.bs) AS INT) AS b, i, y FROM idx),
    full_blk AS (
      SELECT b, avg(y) AS mb, stddev_pop(y) AS sb
      FROM blk GROUP BY b
      HAVING count(*) = bs.bs AND stddev_pop(y) > 0),
    dev AS (
      SELECT blk.b, blk.i, blk.y, f.mb, f.sb,
             sum(blk.y - f.mb) OVER (PARTITION BY blk.b ORDER BY blk.i
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM blk JOIN full_blk f USING (b))
    SELECT b, (max(cum) - min(cum)) / max(sb) AS rs
    FROM dev GROUP BY b
  ) rs
  GROUP BY bs.bs)
SELECT CAST(max(CASE WHEN block_size = 8 THEN n_blocks END) AS BIGINT) AS blocks_8,
       CAST(max(CASE WHEN block_size = 16 THEN n_blocks END) AS BIGINT) AS blocks_16,
       round(max(CASE WHEN block_size = 8 THEN mean_rs END), 6) AS mean_rs_8,
       round(max(CASE WHEN block_size = 16 THEN mean_rs END), 6) AS mean_rs_16,
       round(log2(max(CASE WHEN block_size = 16 THEN mean_rs END)
                  / max(CASE WHEN block_size = 8 THEN mean_rs END)), 6) AS hurst_h,
       log2(max(CASE WHEN block_size = 16 THEN mean_rs END)
            / max(CASE WHEN block_size = 8 THEN mean_rs END)) > 0.6 AS persistent
FROM rs_by
"""


def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = −Σ_ij (c_ij/N)·log2(c_ij/c_i·) over within-user consecutive
    transitions — the single number summarizing how predictable user
    journeys are (the chain whose stationary vector
    markov_stationary_distribution computes), next to the zeroth-
    order entropy H₀ of the marginal and the predictability gain.

    100 TB: transitions come from one user-partitioned lag window;
    the entropy is two aggregates over the O(types²) count table."""
    ev = load_table(spark, "events", sf_dir)
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(wu).alias("prev"),
    ).where(F.col("prev").isNotNull())
    c12 = tr.groupBy("prev", "event_type").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("prev").agg(F.sum("c12").alias("c1"))
    n = c12.agg(F.sum("c12").alias("n"))
    h_rate = (
        c12.join(c1, "prev")
        .crossJoin(F.broadcast(n))
        .agg(
            (-F.sum((F.col("c12") / F.col("n")) * F.log2(F.col("c12") / F.col("c1"))))
            .alias("h_rate"),
            F.max("n").cast("bigint").alias("n_transitions"),
        )
    )
    h0 = (
        c12.groupBy("event_type")
        .agg(F.sum("c12").alias("cm"))
        .crossJoin(F.broadcast(n))
        .agg(
            (-F.sum((F.col("cm") / F.col("n")) * F.log2(F.col("cm") / F.col("n"))))
            .alias("h0")
        )
    )
    return h_rate.crossJoin(F.broadcast(h0)).select(
        "n_transitions",
        F.round("h0", 6).alias("h_marginal"),
        F.round("h_rate", 6).alias("h_rate"),
        F.round(F.col("h0") - F.col("h_rate"), 6).alias("predictability_gain"),
    )


MARKOV_ENTROPY_SQL = """
WITH tr AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
         event_type
  FROM events),
ok AS (SELECT prev, event_type FROM tr WHERE prev IS NOT NULL),
c12 AS (SELECT prev, event_type, count(*) AS c12 FROM ok GROUP BY 1, 2),
c1 AS (SELECT prev, sum(c12) AS c1 FROM c12 GROUP BY 1),
n AS (SELECT sum(c12) AS n FROM c12),
hr AS (
  SELECT -sum((c12 / n.n) * log2(c12 / c1.c1)) AS h_rate,
         CAST(max(n.n) AS BIGINT) AS n_transitions
  FROM c12 JOIN c1 USING (prev) CROSS JOIN n),
h0 AS (
  SELECT -sum((cm / n.n) * log2(cm / n.n)) AS h0
  FROM (SELECT event_type, sum(c12) AS cm FROM c12 GROUP BY 1) m CROSS JOIN n)
SELECT n_transitions,
       round(h0, 6) AS h_marginal,
       round(h_rate, 6) AS h_rate,
       round(h0 - h_rate, 6) AS predictability_gain
FROM hr CROSS JOIN h0
"""


def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend test on daily order volume
    per priority: S = Σ_{i<j} sign(y_j − y_i) over the calendar-
    bounded pair join (the same data-size-independent pair space as
    theil_sen_trend — MK tests the trend's SIGNIFICANCE, Theil-Sen
    estimates its SLOPE), z from the no-ties variance
    n(n−1)(2n+5)/18 with the ±1 continuity correction.

    100 TB: pairs live on the daily aggregate (≤ days²/2 per
    priority); S and z are one aggregate over them."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.d") > F.col("a.d")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        F.signum(F.col("b.y") - F.col("a.y")).alias("s"),
    )
    days = daily.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    g = pairs.groupBy("o_orderpriority").agg(F.sum("s").alias("s_stat"))
    j = g.join(F.broadcast(days), "o_orderpriority")
    var = F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) / 18.0
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var)).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return j.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s_stat").cast("bigint").alias("s_stat"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("trending"),
    ).orderBy("o_orderpriority")


MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
pairs AS (
  SELECT a.o_orderpriority, sign(b.y - a.y) AS s
  FROM daily a JOIN daily b
    ON a.o_orderpriority = b.o_orderpriority AND b.d > a.d),
days AS (
  SELECT o_orderpriority, CAST(count(*) AS DOUBLE) AS n FROM daily GROUP BY 1),
g AS (
  SELECT o_orderpriority, sum(s) AS s_stat FROM pairs GROUP BY 1)
SELECT g.o_orderpriority,
       CAST(n AS BIGINT) AS n_days,
       CAST(s_stat AS BIGINT) AS s_stat,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
                  ELSE 0.0 END, 6) AS z_score,
       abs(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
                WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(n * (n - 1) * (2 * n + 5) / 18.0)
                ELSE 0.0 END) > 1.96 AS trending
FROM g JOIN days USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness of per-user event inter-arrival times,
    per event type: B = (σ/μ − 1)/(σ/μ + 1) over the gaps between a
    user's consecutive same-type events — B ≈ 0 is Poisson traffic,
    B → 1 is heavy bursts (the per-process refinement of
    fano_factor_events' binned view; capacity planning and bot
    detection read this directly).

    100 TB: gaps come from one user+type-partitioned lag window;
    the fit is a per-type moment aggregate."""
    ev = load_table(spark, "events", sf_dir)
    wu = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    g = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.avg("gap_us").alias("mu"),
        F.stddev_pop("gap_us").alias("sd"),
    )
    cv = F.col("sd") / F.col("mu")
    return g.select(
        "event_type",
        "n_gaps",
        F.round(F.col("mu") / 1e6, 3).alias("mean_gap_sec"),
        F.round(cv, 6).alias("cv"),
        F.round((cv - 1) / (cv + 1), 6).alias("burstiness_b"),
    ).orderBy("event_type")


INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events),
ok AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap_us) AS mu, stddev_pop(gap_us) AS sd
  FROM ok GROUP BY event_type)
SELECT event_type, n_gaps,
       round(mu / 1e6, 3) AS mean_gap_sec,
       round(sd / mu, 6) AS cv,
       round((sd / mu - 1) / (sd / mu + 1), 6) AS burstiness_b
FROM g
ORDER BY event_type
"""


def var_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% value-at-risk and expected shortfall of day-over-day
    revenue CHANGES per order priority — tail-risk numbers for a
    revenue stream (VaR = the 5th-percentile daily delta; ES = the
    mean delta conditional on breaching VaR, the coherent measure
    that sees how BAD the tail is, not just where it starts).

    100 TB: the delta series is calendar-bounded (lag over the daily
    aggregate); VaR is one exact percentile per priority, ES one
    conditional mean against the broadcast VaR row."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.sum("o_totalprice").alias("rev"))
    wd = W.partitionBy("o_orderpriority").orderBy("d")
    delta = daily.withColumn(
        "dr", F.col("rev") - F.lag("rev").over(wd)
    ).where(F.col("dr").isNotNull())
    var = delta.groupBy("o_orderpriority").agg(
        F.expr("percentile(dr, 0.05)").alias("var95"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    es = (
        delta.join(F.broadcast(var), "o_orderpriority")
        .where(F.col("dr") <= F.col("var95"))
        .groupBy("o_orderpriority")
        .agg(F.avg("dr").alias("es95"))
    )
    return (
        var.join(es, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_days",
            F.round("var95", 2).alias("var95"),
            F.round("es95", 2).alias("es95"),
        )
        .orderBy("o_orderpriority")
    )


VAR_ES_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
delta AS (
  SELECT o_orderpriority,
         rev - lag(rev) OVER (PARTITION BY o_orderpriority ORDER BY d) AS dr
  FROM daily),
ok AS (SELECT * FROM delta WHERE dr IS NOT NULL),
v AS (
  SELECT o_orderpriority, quantile_cont(dr, 0.05) AS var95,
         CAST(count(*) AS BIGINT) AS n_days
  FROM ok GROUP BY 1),
es AS (
  SELECT ok.o_orderpriority, avg(dr) AS es95
  FROM ok JOIN v USING (o_orderpriority)
  WHERE dr <= var95
  GROUP BY ok.o_orderpriority)
SELECT v.o_orderpriority, n_days,
       round(var95, 2) AS var95,
       round(es95, 2) AS es95
FROM v JOIN es USING (o_orderpriority)
ORDER BY o_orderpriority
"""


def periodogram_top_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier power at candidate periods {2,3,7,14,30}
    days for the mean-centered daily order-count series — the
    periodogram probe that picks the seasonal period BEFORE a
    decomposition assumes one (seasonal_weekday_index assumes 7;
    this measures whether 7 actually dominates): P(p) =
    (Σy·cos(2πt/p))² + (Σy·sin(2πt/p))², normalized by the series
    variance·n to a 0-1 fraction of variance.

    100 TB: the day series is calendar-bounded; each period is two
    trig-weighted sums over the same pass (one explode ×5); no
    complex types needed."""
    import math

    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    d0 = daily.agg(F.min("d").alias("d0"), F.avg("y").alias("ybar"),
                   F.count(F.lit(1)).cast("double").alias("n"),
                   F.var_pop("y").alias("vy"))
    idx = daily.crossJoin(F.broadcast(d0)).select(
        F.datediff("d", "d0").cast("double").alias("t"),
        (F.col("y") - F.col("ybar")).alias("yc"),
        "n",
        "vy",
    )
    per = idx.select(
        "t", "yc", "n", "vy",
        F.explode(F.array(*[F.lit(p) for p in (2, 3, 7, 14, 30)])).alias("p"),
    )
    two_pi = 2 * math.pi
    g = per.groupBy("p").agg(
        F.sum(F.col("yc") * F.cos(two_pi * F.col("t") / F.col("p"))).alias("cs"),
        F.sum(F.col("yc") * F.sin(two_pi * F.col("t") / F.col("p"))).alias("sn"),
        F.max("n").alias("n"),
        F.max("vy").alias("vy"),
    )
    power = (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn")) / (
        F.col("n") * F.col("n") / 2 * F.col("vy")
    )
    return g.select(
        F.col("p").cast("int").alias("period_days"),
        F.col("n").cast("bigint").alias("n_days"),
        F.round(power, 6).alias("variance_fraction"),
    ).orderBy("period_days")


PERIODOGRAM_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1),
d0 AS (
  SELECT min(d) AS d0, avg(y) AS ybar, CAST(count(*) AS DOUBLE) AS n,
         var_pop(y) AS vy
  FROM daily),
idx AS (
  SELECT CAST(datediff('day', d0.d0, d) AS DOUBLE) AS t, y - ybar AS yc, n, vy
  FROM daily CROSS JOIN d0),
per AS (
  SELECT idx.*, p.p FROM idx CROSS JOIN (SELECT unnest([2, 3, 7, 14, 30]) AS p) p),
g AS (
  SELECT p,
         sum(yc * cos(2 * pi() * t / p)) AS cs,
         sum(yc * sin(2 * pi() * t / p)) AS sn,
         max(n) AS n, max(vy) AS vy
  FROM per GROUP BY p)
SELECT CAST(p AS INT) AS period_days,
       CAST(n AS BIGINT) AS n_days,
       round((cs * cs + sn * sn) / (n * n / 2 * vy), 6) AS variance_fraction
FROM g
ORDER BY period_days
"""


def seasonally_adjusted_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: weekday seasonal adjustment ∘ Theil-Sen — the
    daily order counts are divided by their priority×weekday seasonal
    index (seasonal_weekday_index's factor) and the robust trend is
    re-estimated on the adjusted series, reported against the raw
    slope (theil_sen_trend). A weekly rhythm inflates pairwise-slope
    noise; the adjusted slope is the defensible growth number — and
    the entry demonstrates that catalog operators compose as plain
    DataFrame algebra.

    100 TB: both stages are the calendar-bounded daily table; the
    index join is broadcast; the pair space is unchanged. The probe
    side is explicitly repartitioned by (priority, x) before the pair
    join (round-8 bisect): the daily table is ~12k rows, so AQE's
    partition coalescing squeezed it to ~1 partition — and the 1000×
    pair EXPLOSION downstream then ran on one task (30s wall at
    sf0.1). An explicit-width repartition is exempt from coalescing,
    restoring 32-way pair generation + map-side partial percentile
    (~5× faster measured); the broadcast build side is unaffected."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    daily = daily.withColumn("dow", F.dayofweek("d"))
    per_dow = daily.groupBy("o_orderpriority", "dow").agg(F.avg("y").alias("dow_avg"))
    overall = daily.groupBy("o_orderpriority").agg(F.avg("y").alias("all_avg"))
    idxd = (
        daily.join(F.broadcast(per_dow), ["o_orderpriority", "dow"])
        .join(F.broadcast(overall), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")).alias("x"),
            (F.col("y") / (F.col("dow_avg") / F.col("all_avg"))).alias("ya"),
            "y",
        )
    )
    n_width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = idxd.repartition(n_width, "o_orderpriority", "x").alias("a")
    b = idxd.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        ((F.col("b.ya") - F.col("a.ya")) / (F.col("b.x") - F.col("a.x"))).alias("sa"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("sr"),
    )
    # The two medians take DIFFERENT physical paths (round-8 bisect):
    # sr slopes are ratios of small integers (few distinct values), so
    # F.median's ObjectHashAggregate buffer stays tiny and runs ~2s.
    # sa slopes are CONTINUOUS — nearly all 14M pair values distinct —
    # and the same exact-percentile buffer becomes millions of boxed
    # doubles whose old-gen survival sent reps GC-erratic (8s -> 156s
    # over five runs measured). sa instead uses a SORT-based exact
    # median: row_number over the per-priority sort, keeping only the
    # middle rank(s), with the rank bounds computed ARITHMETICALLY
    # from the day counts (n_pairs = C(days, 2)) so no count window
    # buffers the partition. Stable ~8s; the per-group pair space is
    # calendar-bounded, so the sort width is scale-invariant.
    # Rejected A/B (round 8): a bracketed-selection exact median
    # (percentile_approx(0.499,0.501) brackets -> exact below-count ->
    # sort only the bracket window) measured WORSE and erratic at
    # sf0.1 (median 28.3s, reps 10.2-57.5 vs 19.1s here): the GK
    # sketch at accuracy 10000 over 14M continuous doubles is itself
    # a boxed-buffer aggregate with old-gen churn, and it must run
    # before the selection scans can start.
    med_sr = pairs.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.median("sr"), 6).alias("raw_slope"),
    )
    npairs = (
        idxd.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("nd"))
        .select(
            "o_orderpriority",
            (F.col("nd") * (F.col("nd") - 1) / 2).cast("bigint").alias("n"),
        )
    )
    wo = W.partitionBy("o_orderpriority").orderBy(F.col("sa"))
    med_sa = (
        pairs.select("o_orderpriority", "sa")
        .withColumn("rn", F.row_number().over(wo))
        .join(F.broadcast(npairs), "o_orderpriority")
        .where(
            ((F.col("n") % 2 == 1) & (F.col("rn") * 2 == F.col("n") + 1))
            | (
                (F.col("n") % 2 == 0)
                & ((F.col("rn") == F.col("n") / 2) | (F.col("rn") == F.col("n") / 2 + 1))
            )
        )
        .groupBy("o_orderpriority")
        .agg(F.round(F.avg("sa"), 6).alias("adjusted_slope"))
    )
    return (
        med_sr.join(med_sa, "o_orderpriority")
        .select("o_orderpriority", "n_pairs", "raw_slope", "adjusted_slope")
        .orderBy("o_orderpriority")
    )


SEASONAL_ADJ_TREND_SQL = """
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
dowd AS (
  SELECT *, dayofweek(d) + 1 AS dow FROM daily),
per_dow AS (
  SELECT o_orderpriority, dow, avg(y) AS dow_avg FROM dowd GROUP BY 1, 2),
overall AS (
  SELECT o_orderpriority, avg(y) AS all_avg FROM daily GROUP BY 1),
idxd AS (
  SELECT d.o_orderpriority,
         datediff('day', DATE '1992-01-01', d.d) AS x,
         d.y / (p.dow_avg / o.all_avg) AS ya,
         d.y
  FROM dowd d
  JOIN per_dow p ON p.o_orderpriority = d.o_orderpriority AND p.dow = d.dow
  JOIN overall o ON o.o_orderpriority = d.o_orderpriority),
pairs AS (
  SELECT a.o_orderpriority,
         (b.ya - a.ya) / (b.x - a.x) AS sa,
         (b.y - a.y) / (b.x - a.x) AS sr
  FROM idxd a JOIN idxd b
    ON a.o_orderpriority = b.o_orderpriority AND b.x > a.x)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(sr), 6) AS raw_slope,
       round(median(sa), 6) AS adjusted_slope
FROM pairs
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

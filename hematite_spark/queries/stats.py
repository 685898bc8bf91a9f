"""Statistical tests, resampling, calibration, and causal-inference
operators (split out of advanced.py in round 8; VERDICT r7 item 6).
Every public name here is re-exported by queries.advanced, which stays
the catalog facade — __spark_entry__ keys are unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table
from hematite_spark.queries._shared import _DUCK_HASH_PCT_EVENTS

def metric_confidence_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type metric means with 95% confidence intervals
    (mean ± 1.96·s/√n) — the report layer every A/B readout and
    data-quality dashboard sits on. One map-side-combined aggregate;
    the interval math is scalar post-processing of (n, mean, stddev),
    so the same query serves any fact-table size unchanged."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.stddev_samp("value").alias("s"),
    )
    half = 1.96 * F.col("s") / F.sqrt(F.col("n"))
    return agg.select(
        "event_type",
        "n",
        F.round("m", 4).alias("mean_value"),
        F.round(F.col("m") - half, 4).alias("ci_lo"),
        F.round(F.col("m") + half, 4).alias("ci_hi"),
    ).orderBy("event_type")


CONFIDENCE_SQL = """
SELECT event_type, count(*) AS n,
       round(avg(value), 4) AS mean_value,
       round(avg(value) - 1.96 * stddev_samp(value) / sqrt(count(*)), 4) AS ci_lo,
       round(avg(value) + 1.96 * stddev_samp(value) / sqrt(count(*)), 4) AS ci_hi
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# Poisson(1) inverse-CDF thresholds for the deterministic bootstrap:
# P(X<=k) for k = 0..4; u beyond the last bucket draws weight 5.
_POIS_CDF = (0.36787944, 0.73575888, 0.91969860, 0.98101184, 0.99634015)
# 24-bit md5-derived uniform in [0,1): DuckDB spelling built from hex
# digit positions (no conv() there), Spark uses conv().
_DUCK_U24 = (
    "(("
    + " + ".join(
        f"(strpos('0123456789abcdef', md5({{k}})[{i + 1}]) - 1) * {16 ** (5 - i)}"
        for i in range(6)
    )
    + ") / 16777216.0)"
)


def bootstrap_ci_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap confidence intervals for the per-type
    mean event value — the resampling sibling of
    metric_confidence_intervals' normal approximation, for when the
    statistic's sampling distribution isn't trusted. 16 bootstrap
    replicates, each resampling the corpus WITH replacement via a
    deterministic Poisson(1) weight drawn from md5(event_id:replicate)
    — the 'Poisson bootstrap', the construction that makes bootstrap
    distributable: no replicate ever materializes, each row just
    carries 16 small integer weights.

    One explode (bounded 16×) + two hash aggregates; every replicate
    mean is a weighted average computed in the same pass. At 100 TB
    the explode factor is the only cost knob, and the weights column
    could instead be 16 parallel aggregates to avoid row growth
    entirely."""
    ev = load_table(spark, "events", sf_dir)
    reps = ev.select(
        "event_type", "value", "event_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("b")
    )
    key = F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("b").cast("string"))
    u = F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("double") / F.lit(16777216.0)
    w = F.when(u < _POIS_CDF[0], 0)
    for k, c in enumerate(_POIS_CDF[1:], start=1):
        w = w.when(u < c, k)
    w = w.otherwise(5).cast("double")
    means = (
        reps.withColumn("w", w)
        .groupBy("event_type", "b")
        .agg((F.sum(F.col("w") * F.col("value")) / F.sum("w")).alias("mean_b"))
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.round(F.avg("mean_b"), 4).alias("boot_mean"),
            F.round(F.percentile("mean_b", F.lit(0.05)), 4).alias("ci_lo"),
            F.round(F.percentile("mean_b", F.lit(0.95)), 4).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


def _bootstrap_sql() -> str:
    u = _DUCK_U24.format(k="(event_id::VARCHAR || ':' || b::VARCHAR)")
    w_case = "CASE " + " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    ) + " ELSE 5 END"
    return f"""
WITH reps AS (
  SELECT event_type, value, event_id, u.b
  FROM events, unnest(range(16)) u(b)),
means AS (
  SELECT event_type, b,
         sum(CAST({w_case} AS DOUBLE) * value) / sum(CAST({w_case} AS DOUBLE)) AS mean_b
  FROM reps
  GROUP BY event_type, b)
SELECT event_type,
       round(avg(mean_b), 4) AS boot_mean,
       round(quantile_cont(mean_b, 0.05), 4) AS ci_lo,
       round(quantile_cont(mean_b, 0.95), 4) AS ci_hi
FROM means
GROUP BY event_type
ORDER BY event_type
"""


BOOTSTRAP_CI_SQL = _bootstrap_sql()


def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout — deterministic 50/50 assignment (md5
    of the user id, so both engines and every rerun agree on who is
    in which arm), then per event type the Welch two-sample t
    statistic on mean event value. The analysis is one pass: the
    co-moment aggregate computes both arms' counts/means/variances
    grouped by (type, arm), and the t arithmetic runs on the O(types)
    result. At 100 TB the readout cost is the corpus scan, full stop
    — no per-arm rescans, no driver statistics.

    |t| > 1.96 flags ~95% significance under the normal
    approximation; with a hash split and no real treatment the flags
    should be overwhelmingly false — which is exactly the A/A-test
    sanity a platform runs first."""
    ev = load_table(spark, "events", sf_dir)
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10).cast("bigint") % 2
        == 0,
        "a",
    ).otherwise("b")
    per_arm = ev.select("event_type", arm.alias("arm"), "value").groupBy(
        "event_type", "arm"
    ).agg(
        F.count("*").alias("n"),
        F.avg("value").alias("mean"),
        F.var_samp("value").alias("var"),
    )
    a = per_arm.where(F.col("arm") == "a").select(
        "event_type", F.col("n").alias("na"), F.col("mean").alias("ma"), F.col("var").alias("va")
    )
    b = per_arm.where(F.col("arm") == "b").select(
        "event_type", F.col("n").alias("nb"), F.col("mean").alias("mb"), F.col("var").alias("vb")
    )
    t = (F.col("ma") - F.col("mb")) / F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            "na",
            "nb",
            F.round("ma", 4).alias("mean_a"),
            F.round("mb", 4).alias("mean_b"),
            F.round(t, 4).alias("t_stat"),
            (F.abs(t) > 1.96).alias("significant"),
        )
        .orderBy("event_type")
    )


AB_TEST_SQL = f"""
WITH per_arm AS (
  SELECT event_type,
         CASE WHEN {_DUCK_HASH_PCT_EVENTS.replace("event_id", "user_id")} % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
         count(*) AS n, avg(value) AS mean, var_samp(value) AS var
  FROM events
  GROUP BY 1, 2)
SELECT a.event_type, a.n AS na, b.n AS nb,
       round(a.mean, 4) AS mean_a, round(b.mean, 4) AS mean_b,
       round((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n), 4) AS t_stat,
       abs((a.mean - b.mean) / sqrt(a.var / a.n + b.var / b.n)) > 1.96 AS significant
FROM per_arm a JOIN per_arm b ON a.event_type = b.event_type AND a.arm = 'a' AND b.arm = 'b'
ORDER BY a.event_type
"""


def mad_outlier_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection — median absolute deviation instead of
    the mean/stddev z-score (anomaly_zscore_events), because one fat
    outlier inflates a stddev and hides its siblings while the MAD
    barely moves. Per event type: median, MAD, and how many events
    exceed robust-z 3.5 (the Iglewicz-Hoaglin cut).

    Two exact-median passes (type-grouped percentile aggregates) and
    one broadcast join back — the medians table is O(types). At 100 TB
    the approx_percentile sketch replaces the exact medians, same
    plumbing."""
    ev = load_table(spark, "events", sf_dir)
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"), F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    rz = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.first("med"), 4).alias("median"),
            F.round(F.first("mad"), 4).alias("mad"),
            F.sum(F.when(F.abs(rz) > 3.5, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
        )
        .orderBy("event_type")
    )


MAD_OUTLIER_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY event_type),
mad AS (
  SELECT e.event_type, first(m.med) AS med,
         quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m ON e.event_type = m.event_type
  GROUP BY e.event_type)
SELECT e.event_type, count(*) AS n_events,
       round(first(m.med), 4) AS median,
       round(first(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN abs(0.6745 * (e.value - m.med) / m.mad) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN mad m ON e.event_type = m.event_type
GROUP BY e.event_type
ORDER BY e.event_type
"""


def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of per-type event counts via the
    Laplace mechanism (sensitivity 1, epsilon 0.5 → scale 2), with the
    noise drawn from a DETERMINISTIC hash-uniform so the release is
    reproducible and oracle-checkable: u = (h16(event_type)+0.5)/2^16,
    noise = -scale·sign(u-½)·ln(1-2|u-½|) (inverse-CDF sampling).
    `within_bound` pins the mechanism's tail contract — |noise| ≤
    scale·ln(1/δ) at δ=0.005 — which holds for every released count
    unless the hash-uniform lands in the 1% tail (it does not, for
    these 5 types; the column makes the release auditable either way).

    100 TB: one hash-aggregate (map-side combine) produces O(types)
    rows; the noise arithmetic is per-released-row, not per-event.
    Real deployments swap the seeded-uniform for a CSPRNG — the
    mechanism, sensitivity accounting, and bound audit are identical."""
    eps = 0.5
    scale = 1.0 / eps
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    h16 = F.conv(
        F.substring(F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 4), 16, 10
    ).cast("bigint")
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    half = F.abs(u - 0.5)
    noise = (
        F.lit(-scale)
        * F.signum(u - 0.5)
        * F.log(F.greatest(F.lit(1.0) - 2.0 * half, F.lit(1e-12)))
    )
    bound = scale * 5.2983173665480363  # ln(1/0.005)
    return (
        counts.select(
            "event_type",
            "exact_cnt",
            F.round(F.col("exact_cnt") + noise, 0).cast("bigint").alias("noisy_cnt"),
            F.round(F.abs(noise), 4).alias("abs_noise"),
            (F.abs(noise) <= F.lit(bound)).alias("within_bound"),
        )
        .orderBy("event_type")
    )


DP_NOISY_SQL = """
WITH counts AS (
  SELECT event_type, count(*)::BIGINT AS exact_cnt FROM events GROUP BY event_type),
noised AS (
  SELECT event_type, exact_cnt,
         -2.0 * sign(u - 0.5) * ln(greatest(1.0 - 2.0 * abs(u - 0.5), 1e-12)) AS noise
  FROM (SELECT event_type, exact_cnt,
               (((strpos('0123456789abcdef', md5('dp:' || event_type)[1]) - 1) * 4096
               + (strpos('0123456789abcdef', md5('dp:' || event_type)[2]) - 1) * 256
               + (strpos('0123456789abcdef', md5('dp:' || event_type)[3]) - 1) * 16
               + (strpos('0123456789abcdef', md5('dp:' || event_type)[4]) - 1)) + 0.5)
               / 65536.0 AS u
        FROM counts))
SELECT event_type, exact_cnt,
       CAST(round(exact_cnt + noise, 0) AS BIGINT) AS noisy_cnt,
       round(abs(noise), 4) AS abs_noise,
       abs(noise) <= 10.5966347330960726::DOUBLE AS within_bound
FROM noised
ORDER BY event_type
"""


def score_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected calibration error for a fixed
    scoring rule — the audit a learned quality/safety classifier gets
    before its scores gate a training corpus. The 'model' is a frozen
    logistic on the event value (score = σ((value-50)/15)) predicting
    the purchase outcome; rows are 10 equal-width score bins with
    observed positive rate, per-bin |gap|, and the overall ECE
    (Σ n_b/N·gap_b) repeated on every row for single-table reads.

    100 TB: one pass computes (bin, n, Σscore, Σy) via hash aggregate;
    the ECE is a second aggregate over ≤10 rows broadcast back — no
    per-event state, no shuffle wider than the 10 bins."""
    ev = load_table(spark, "events", sf_dir)
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("value") - 50.0) / 15.0)), 6
    )
    scored = ev.select(
        score.alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    ).withColumn("bin", F.least(F.lit(9), F.floor(F.col("score") * 10)).cast("int"))
    bins = scored.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("score"), 6).alias("mean_score"),
        F.round(F.avg("y"), 6).alias("frac_positive"),
    ).withColumn(
        "gap", F.round(F.abs(F.col("mean_score") - F.col("frac_positive")), 6)
    )
    ece = bins.agg(
        F.round(F.sum(F.col("n") * F.col("gap")) / F.sum("n"), 6).alias("ece")
    )
    return bins.crossJoin(F.broadcast(ece)).orderBy("bin")


CALIBRATION_ECE_SQL = """
WITH scored AS (
  SELECT round(1.0 / (1.0 + exp(-(value - 50.0) / 15.0)), 6) AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events),
bins AS (
  SELECT CAST(least(9, floor(score * 10)) AS INT) AS bin,
         count(*)::BIGINT AS n,
         round(avg(score), 6) AS mean_score,
         round(avg(y), 6) AS frac_positive,
         round(abs(round(avg(score), 6) - round(avg(y), 6)), 6) AS gap
  FROM scored GROUP BY 1),
ece AS (SELECT round(sum(n * gap) / sum(n), 6) AS ece FROM bins)
SELECT bin, n, mean_score, frac_positive, gap, ece
FROM bins CROSS JOIN ece
ORDER BY bin
"""


def gmm_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM iteration of a 2-component 1-D Gaussian mixture over
    event values, per event type — the distributional-modeling member
    of the ML-on-DataFrames family (k-means = hard assignment, this =
    soft responsibilities). Deterministic init (μ=25/75, σ=15, π=½);
    E-step computes responsibilities in a stateless projection, M-step
    re-estimates (π, μ, σ) as ONE weighted aggregate per type. Emits
    both components' updated parameters plus the average log-
    likelihood — the quantity EM provably does not decrease.

    100 TB: the E-step is column algebra fused into the scan; the
    M-step is a (type)-keyed hash aggregate of 7 weighted sums with
    map-side combine. Parameters are O(types × 2) rows. Further
    iterations chain the same lazy agg → broadcast → agg pattern as
    linear_probe_gd."""
    mu1, mu2, sd, pi = 25.0, 75.0, 15.0, 0.5
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    c = 0.3989422804014327  # 1/sqrt(2π)
    pdf = lambda mu: (F.lit(c) / sd) * F.exp(
        -((F.col("value") - mu) ** 2) / (2.0 * sd * sd)
    )
    p1, p2 = pi * pdf(mu1), (1 - pi) * pdf(mu2)
    base = ev.select("event_type", "value", p1.alias("p1"), p2.alias("p2"))
    resp = base.select(
        "event_type",
        "value",
        (F.col("p1") / (F.col("p1") + F.col("p2"))).alias("r1"),
        F.log(F.col("p1") + F.col("p2")).alias("ll"),
    )
    agg = resp.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r1").alias("w1"),
        F.sum(F.col("r1") * F.col("value")).alias("s1"),
        F.sum(F.col("r1") * F.col("value") * F.col("value")).alias("q1"),
        F.sum(F.lit(1.0) - F.col("r1")).alias("w2"),
        F.sum((F.lit(1.0) - F.col("r1")) * F.col("value")).alias("s2"),
        F.sum((F.lit(1.0) - F.col("r1")) * F.col("value") * F.col("value")).alias("q2"),
        F.avg("ll").alias("avg_ll"),
    )
    new_mu1, new_mu2 = F.col("s1") / F.col("w1"), F.col("s2") / F.col("w2")
    return agg.select(
        "event_type",
        "n",
        F.round(F.col("w1") / F.col("n"), 6).alias("pi1"),
        F.round(new_mu1, 6).alias("mu1"),
        F.round(F.sqrt(F.col("q1") / F.col("w1") - new_mu1 * new_mu1), 6).alias("sigma1"),
        F.round(new_mu2, 6).alias("mu2"),
        F.round(F.sqrt(F.col("q2") / F.col("w2") - new_mu2 * new_mu2), 6).alias("sigma2"),
        F.round(F.col("avg_ll"), 6).alias("avg_ll"),
    ).orderBy("event_type")


GMM_EM_SQL = """
WITH base AS (
  SELECT event_type, value,
         0.5 * (0.3989422804014327 / 15.0) * exp(-power(value - 25.0, 2) / (2.0 * 15.0 * 15.0)) AS p1,
         0.5 * (0.3989422804014327 / 15.0) * exp(-power(value - 75.0, 2) / (2.0 * 15.0 * 15.0)) AS p2
  FROM events),
resp AS (
  SELECT event_type, value, p1 / (p1 + p2) AS r1, ln(p1 + p2) AS ll FROM base),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(r1) AS w1, sum(r1 * value) AS s1, sum(r1 * value * value) AS q1,
         sum(1.0 - r1) AS w2, sum((1.0 - r1) * value) AS s2, sum((1.0 - r1) * value * value) AS q2,
         avg(ll) AS avg_ll
  FROM resp GROUP BY event_type)
SELECT event_type, n,
       round(w1 / n, 6) AS pi1,
       round(s1 / w1, 6) AS mu1,
       round(sqrt(q1 / w1 - (s1 / w1) * (s1 / w1)), 6) AS sigma1,
       round(s2 / w2, 6) AS mu2,
       round(sqrt(q2 / w2 - (s2 / w2) * (s2 / w2)), 6) AS sigma2,
       round(avg_ll, 6) AS avg_ll
FROM agg
ORDER BY event_type
"""


def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator for signup→purchase conversion
    — time-to-event analytics WITH right-censoring done correctly
    (users who never purchased are not dropped, they exit the risk
    set at the end of observation; naive conversion curves that drop
    them bias the rate upward). Per whole day since each user's first
    signup: risk set, conversion events, censored exits, hazard
    d/n, and the KM survival Π(1-hazard) computed as
    exp(Σ ln(1-h)) so it stays a windowed aggregate.

    100 TB: per-user first-signup/first-purchase is one user-keyed
    min-struct aggregate; the day table is O(observation-days) and
    the cumulative product runs over that pre-aggregate (allowlisted
    global window), not the event log."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    signup = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t0")
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .join(signup, "user_id")
        .where(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    horizon = ev.agg(F.max("ts").alias("t_end"))
    durations = (
        signup.join(purch, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.when(
                F.col("tp").isNotNull(),
                F.floor(
                    (F.unix_timestamp("tp") - F.unix_timestamp("t0")) / 86400
                ),
            )
            .otherwise(
                F.floor((F.unix_timestamp("t_end") - F.unix_timestamp("t0")) / 86400)
            )
            .cast("int")
            .alias("day"),
            F.col("tp").isNotNull().alias("converted"),
        )
    )
    per_day = durations.groupBy("day").agg(
        F.sum(F.col("converted").cast("int")).cast("bigint").alias("n_events"),
        F.sum((~F.col("converted")).cast("int")).cast("bigint").alias("n_censored"),
    )
    from pyspark.sql import Window as W

    wd = W.orderBy("day")
    tot = durations.agg(F.count("*").cast("bigint").alias("n_total"))
    risk = (
        per_day.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_at_risk",
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(
                    wd.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("hazard", F.col("n_events") / F.col("n_at_risk"))
        .withColumn(
            "survival",
            F.exp(
                F.sum(F.log(F.greatest(F.lit(1.0) - F.col("hazard"), F.lit(1e-12)))).over(
                    wd.rowsBetween(W.unboundedPreceding, 0)
                )
            ),
        )
    )
    return (
        risk.where(F.col("day") <= 15)
        .select(
            "day",
            "n_at_risk",
            "n_events",
            "n_censored",
            F.round("hazard", 6).alias("hazard"),
            F.round("survival", 6).alias("survival"),
        )
        .orderBy("day")
    )


KAPLAN_MEIER_SQL = """
WITH signup AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'signup' GROUP BY user_id),
purch AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN signup s USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s.t0
  GROUP BY e.user_id),
horizon AS (SELECT max(ts) AS t_end FROM events),
durations AS (
  SELECT s.user_id,
         CAST(CASE WHEN p.tp IS NOT NULL
              THEN floor((epoch(p.tp) - epoch(s.t0)) / 86400)
              ELSE floor((epoch(h.t_end) - epoch(s.t0)) / 86400) END AS INT) AS day,
         p.tp IS NOT NULL AS converted
  FROM signup s LEFT JOIN purch p USING (user_id) CROSS JOIN horizon h),
per_day AS (
  SELECT day,
         sum(CASE WHEN converted THEN 1 ELSE 0 END)::BIGINT AS n_events,
         sum(CASE WHEN converted THEN 0 ELSE 1 END)::BIGINT AS n_censored
  FROM durations GROUP BY day),
tot AS (SELECT count(*)::BIGINT AS n_total FROM durations),
risk AS (
  SELECT day, n_events, n_censored,
         n_total - coalesce(sum(n_events + n_censored) OVER
           (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_at_risk
  FROM per_day CROSS JOIN tot),
km AS (
  SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_events, n_censored,
         n_events / CAST(n_at_risk AS DOUBLE) AS hazard,
         exp(sum(ln(greatest(1.0 - n_events / CAST(n_at_risk AS DOUBLE), 1e-12)))
             OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS survival
  FROM risk)
SELECT day, n_at_risk, n_events, n_censored,
       round(hazard, 6) AS hazard, round(survival, 6) AS survival
FROM km
WHERE day <= 15
ORDER BY day
"""


def simpsons_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit — the aggregation trap detector every
    metrics pipeline should run before a topline trend ships: per
    event type, the OLS slope of value-vs-day computed (a) pooled
    over all users and (b) within each user cohort (user_id % 4),
    then flagged when the pooled slope's sign contradicts the
    majority of cohort slopes (the mix-shift signature). Slopes are
    closed-form cov/var aggregates — no iteration.

    100 TB: both levels are single hash aggregates of (n, Σx, Σy,
    Σxy, Σx²) moment tuples — the cohort level is (type, cohort)-
    keyed with map-side combine; nothing but O(types × cohorts) rows
    move."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        (F.col("user_id") % 4).alias("cohort"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("double").alias("x"),
        F.col("value").alias("y"),
    )

    def slope_agg(df, keys):
        g = df.groupBy(*keys).agg(
            F.count("*").cast("double").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        return g.select(
            *keys,
            (
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
            ).alias("slope"),
        )

    pooled = slope_agg(ev, ["event_type"]).withColumnRenamed("slope", "pooled_slope")
    cohorts = slope_agg(ev, ["event_type", "cohort"])
    cohort_sum = cohorts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_cohorts"),
        F.sum((F.col("slope") > 0).cast("int")).cast("bigint").alias("n_cohorts_up"),
    )
    return (
        pooled.join(cohort_sum, "event_type")
        .select(
            "event_type",
            F.round("pooled_slope", 6).alias("pooled_slope"),
            "n_cohorts",
            "n_cohorts_up",
            (
                ((F.col("pooled_slope") > 0) & (F.col("n_cohorts_up") * 2 < F.col("n_cohorts")))
                | ((F.col("pooled_slope") < 0) & (F.col("n_cohorts_up") * 2 > F.col("n_cohorts")))
            ).alias("paradox_flag"),
        )
        .orderBy("event_type")
    )


SIMPSONS_SQL = """
WITH ev AS (
  SELECT event_type, user_id % 4 AS cohort,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
         value AS y
  FROM events),
pooled AS (
  SELECT event_type,
         (sum(x * y) - sum(x) * sum(y) / count(*))
         / (sum(x * x) - sum(x) * sum(x) / count(*)) AS pooled_slope
  FROM ev GROUP BY event_type),
cohorts AS (
  SELECT event_type, cohort,
         (sum(x * y) - sum(x) * sum(y) / count(*))
         / (sum(x * x) - sum(x) * sum(x) / count(*)) AS slope
  FROM ev GROUP BY event_type, cohort),
cohort_sum AS (
  SELECT event_type, count(*)::BIGINT AS n_cohorts,
         sum(CASE WHEN slope > 0 THEN 1 ELSE 0 END)::BIGINT AS n_cohorts_up
  FROM cohorts GROUP BY event_type)
SELECT event_type, round(pooled_slope, 6) AS pooled_slope, n_cohorts, n_cohorts_up,
       ((pooled_slope > 0 AND n_cohorts_up * 2 < n_cohorts)
        OR (pooled_slope < 0 AND n_cohorts_up * 2 > n_cohorts)) AS paradox_flag
FROM pooled JOIN cohort_sum USING (event_type)
ORDER BY event_type
"""


def cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the experimentation-platform
    workhorse: adjust each user's experiment-period metric by their
    PRE-period baseline (θ = cov(pre, post)/var(pre)), shrinking
    metric variance by ρ² without biasing the mean. Pre-period =
    Jan 1-14 mean event value per user, post = Jan 15-30; the
    'experiment' split is the deterministic user hash (A/B by
    user_id % 2). Output per arm: users, raw mean/variance, CUPED
    mean/variance, and the variance-reduction share — the number
    that says how much smaller your experiment can be.

    100 TB: two user-keyed conditional aggregates in ONE scan (pre
    and post as filtered sums), θ from one global moment aggregate
    broadcast back, arm summary O(2) rows."""
    ev = load_table(spark, "events", sf_dir)
    cut = F.lit("2024-01-15").cast("timestamp")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.avg(F.when(F.col("ts") < cut, F.col("value"))).alias("pre"),
            F.avg(F.when(F.col("ts") >= cut, F.col("value"))).alias("post"),
        )
        .where(F.col("pre").isNotNull() & F.col("post").isNotNull())
        .localCheckpoint()  # O(users) table feeds both θ and the
        # adjusted projection — one corpus scan, not two
    )
    theta_row = per_user.agg(
        (F.covar_pop("pre", "post") / F.var_pop("pre")).alias("theta"),
        F.avg("pre").alias("pre_mean"),
    )
    adjusted = per_user.crossJoin(F.broadcast(theta_row)).select(
        (F.col("user_id") % 2).alias("arm"),
        "post",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("pre_mean"))).alias("cuped"),
    )
    return (
        adjusted.groupBy("arm")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.round(F.avg("post"), 6).alias("raw_mean"),
            F.round(F.var_pop("post"), 6).alias("raw_var"),
            F.round(F.avg("cuped"), 6).alias("cuped_mean"),
            F.round(F.var_pop("cuped"), 6).alias("cuped_var"),
            F.round(F.lit(1.0) - F.var_pop("cuped") / F.var_pop("post"), 6).alias(
                "var_reduction"
            ),
        )
        .orderBy("arm")
    )


CUPED_SQL = """
WITH per_user AS (
  SELECT user_id,
         avg(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN value END) AS pre,
         avg(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN value END) AS post
  FROM events GROUP BY user_id),
valid AS (SELECT * FROM per_user WHERE pre IS NOT NULL AND post IS NOT NULL),
theta AS (
  SELECT covar_pop(pre, post) / var_pop(pre) AS theta, avg(pre) AS pre_mean FROM valid),
adjusted AS (
  SELECT user_id % 2 AS arm, post,
         post - theta * (pre - pre_mean) AS cuped
  FROM valid CROSS JOIN theta)
SELECT arm, count(*)::BIGINT AS n_users,
       round(avg(post), 6) AS raw_mean,
       round(var_pop(post), 6) AS raw_var,
       round(avg(cuped), 6) AS cuped_mean,
       round(var_pop(cuped), 6) AS cuped_var,
       round(1.0 - var_pop(cuped) / var_pop(post), 6) AS var_reduction
FROM adjusted
GROUP BY arm
ORDER BY arm
"""


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the documents table's quasi-identifiers
    (lang, source, n_chars bucketed to 50) — the privacy release
    check that pairs with dp_noisy_counts: an equivalence class
    smaller than k=5 re-identifies its members, so the release either
    suppresses or generalizes those rows. Output is the class-size
    histogram bucket census with the violating-row count and the
    suppression fraction a k=5 release would pay.

    100 TB: one quasi-identifier hash aggregate (map-side combined)
    then an O(classes) histogram aggregate — class count ≪ rows, and
    the second aggregate runs on the first's output."""
    k = 5
    docs = load_table(spark, "documents", sf_dir)
    classes = docs.groupBy(
        "lang", "source", (F.floor(F.col("n_chars") / 50) * 50).alias("chars_bucket")
    ).agg(F.count("*").cast("bigint").alias("class_size"))
    bucket = (
        F.when(F.col("class_size") == 1, F.lit("1"))
        .when(F.col("class_size") < 5, F.lit("2-4"))
        .when(F.col("class_size") < 20, F.lit("5-19"))
        .otherwise(F.lit("20+"))
    )
    tot = classes.agg(F.sum("class_size").cast("double").alias("n_rows"))
    return (
        classes.select(bucket.alias("size_bucket"), "class_size")
        .groupBy("size_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows_in_bucket"),
            F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_violating"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "size_bucket",
            "n_classes",
            "n_rows_in_bucket",
            "n_rows_violating",
            F.round(F.col("n_rows_violating") / F.col("n_rows"), 6).alias(
                "suppression_frac"
            ),
        )
        .orderBy("size_bucket")
    )


K_ANON_SQL = """
WITH classes AS (
  SELECT lang, source, CAST(floor(n_chars / 50) * 50 AS BIGINT) AS chars_bucket,
         count(*)::BIGINT AS class_size
  FROM documents GROUP BY lang, source, 3),
tot AS (SELECT CAST(sum(class_size) AS DOUBLE) AS n_rows FROM classes),
bucketed AS (
  SELECT CASE WHEN class_size = 1 THEN '1'
              WHEN class_size < 5 THEN '2-4'
              WHEN class_size < 20 THEN '5-19'
              ELSE '20+' END AS size_bucket,
         class_size
  FROM classes)
SELECT size_bucket,
       count(*)::BIGINT AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows_in_bucket,
       CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_violating,
       round(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
             / (SELECT n_rows FROM tot), 6) AS suppression_frac
FROM bucketed
GROUP BY size_bucket
ORDER BY size_bucket
"""


def srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the first thing an
    experimentation platform checks before reading any metric: do the
    arms' user counts match the intended 50/50 split? Chi-square
    goodness-of-fit per event type (the 'experiment' is the user-hash
    A/B of cuped_adjustment), with the 1-dof 95% threshold 3.841 —
    a firing flag means randomization is broken and every downstream
    metric is suspect.

    100 TB: one (type, arm) count aggregate; the chi-square is O(types)
    arithmetic on the aggregate."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", (F.col("user_id") % 2).alias("arm"), "user_id"
    )
    arms = ev.groupBy("event_type").agg(
        F.countDistinct(F.when(F.col("arm") == 0, F.col("user_id"))).cast("bigint").alias("n_a"),
        F.countDistinct(F.when(F.col("arm") == 1, F.col("user_id"))).cast("bigint").alias("n_b"),
    )
    n = F.col("n_a") + F.col("n_b")
    exp = n / 2.0
    chi2 = F.pow(F.col("n_a") - exp, 2) / exp + F.pow(F.col("n_b") - exp, 2) / exp
    return arms.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_detected"),
    ).orderBy("event_type")


SRM_SQL = """
WITH arms AS (
  SELECT event_type,
         count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)::BIGINT AS n_a,
         count(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END)::BIGINT AS n_b
  FROM events GROUP BY event_type)
SELECT event_type, n_a, n_b,
       round(power(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
           + power(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0), 6) AS chi2,
       (power(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
      + power(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)) > 3.841 AS srm_detected
FROM arms
ORDER BY event_type
"""


def benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic fraud / synthetic-data tripwire: natural multi-scale
    amounts follow P(d) = log10(1+1/d); a fabricated or truncated
    column doesn't. Output per leading digit: observed count and
    share, the Benford expectation, and the per-digit chi-square
    contribution, plus the total statistic repeated for single-table
    reads (8-dof 95% threshold 15.507).

    100 TB: first digit is a stateless string expression; one 9-row
    aggregate, the chi-square a projection over it."""
    orders = load_table(spark, "orders", sf_dir)
    d = F.substring(F.col("o_totalprice").cast("string"), 1, 1).cast("int")
    digits = orders.select(d.alias("digit")).where(F.col("digit") >= 1).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    tot = digits.agg(F.sum("n").cast("double").alias("n_tot"))
    expected = F.log10(1.0 + 1.0 / F.col("digit"))
    per = (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.col("n_tot"), 6).alias("observed_share"),
            F.round(expected, 6).alias("benford_share"),
            (
                F.pow(F.col("n") - expected * F.col("n_tot"), 2)
                / (expected * F.col("n_tot"))
            ).alias("_chi"),
        )
    )
    chi_tot = per.agg(F.round(F.sum("_chi"), 4).alias("chi2_total"))
    return (
        per.crossJoin(F.broadcast(chi_tot))
        .select(
            "digit",
            "n",
            "observed_share",
            "benford_share",
            F.round("_chi", 4).alias("chi2_contrib"),
            "chi2_total",
            (F.col("chi2_total") > 15.507).alias("deviates"),
        )
        .orderBy("digit")
    )


BENFORD_SQL = """
WITH digits AS (
  SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*)::BIGINT AS n
  FROM orders
  WHERE CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) >= 1
  GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS n_tot FROM digits),
per AS (
  SELECT digit, n,
         round(n / n_tot, 6) AS observed_share,
         round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
         power(n - log10(1.0 + 1.0 / digit) * n_tot, 2)
           / (log10(1.0 + 1.0 / digit) * n_tot) AS chi
  FROM digits CROSS JOIN tot),
chi_tot AS (SELECT round(sum(chi), 4) AS chi2_total FROM per)
SELECT digit, n, observed_share, benford_share,
       round(chi, 4) AS chi2_contrib, chi2_total,
       chi2_total > 15.507 AS deviates
FROM per CROSS JOIN chi_tot
ORDER BY digit
"""


def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator — the quasi-experimental
    workhorse when randomization isn't available: arms are the user-
    hash split (A = control, B = treated), periods are pre/post the
    Jan-15 cut, and the causal read is (B_post − B_pre) −
    (A_post − A_pre), which nets out both the arm baseline difference
    and the common time trend. Emitted with each cell's mean/var/n
    and the large-sample standard error √(Σ varᵢ/nᵢ) plus the
    |estimate| > 1.96·SE significance flag — the experimentation
    family's third member beside srm_check and cuped_adjustment.

    100 TB: one (arm, period) conditional aggregate over a single
    scan; the estimator is arithmetic over 4 broadcast cells."""
    ev = load_table(spark, "events", sf_dir)
    cut = F.lit("2024-01-15").cast("timestamp")
    cells = (
        ev.groupBy(
            (F.col("user_id") % 2).alias("arm"),
            (F.col("ts") >= cut).cast("int").alias("post"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg("value").alias("mean"),
            F.var_samp("value").alias("var"),
        )
    )
    wide = cells.agg(
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 0), F.col("mean"))).alias("a_pre"),
        F.sum(F.when((F.col("arm") == 0) & (F.col("post") == 1), F.col("mean"))).alias("a_post"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 0), F.col("mean"))).alias("b_pre"),
        F.sum(F.when((F.col("arm") == 1) & (F.col("post") == 1), F.col("mean"))).alias("b_post"),
        F.sum(F.col("var") / F.col("n")).alias("se2"),
    )
    did = (F.col("b_post") - F.col("b_pre")) - (F.col("a_post") - F.col("a_pre"))
    se = F.sqrt(F.col("se2"))
    return wide.select(
        F.round("a_pre", 6).alias("control_pre"),
        F.round("a_post", 6).alias("control_post"),
        F.round("b_pre", 6).alias("treated_pre"),
        F.round("b_post", 6).alias("treated_post"),
        F.round(did, 6).alias("did_estimate"),
        F.round(se, 6).alias("std_error"),
        (F.abs(did) > 1.96 * se).alias("significant"),
    )


DIFF_IN_DIFF_SQL = """
WITH cells AS (
  SELECT user_id % 2 AS arm,
         CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS post,
         count(*)::BIGINT AS n, avg(value) AS mean, var_samp(value) AS var
  FROM events GROUP BY 1, 2),
wide AS (
  SELECT sum(CASE WHEN arm = 0 AND post = 0 THEN mean END) AS a_pre,
         sum(CASE WHEN arm = 0 AND post = 1 THEN mean END) AS a_post,
         sum(CASE WHEN arm = 1 AND post = 0 THEN mean END) AS b_pre,
         sum(CASE WHEN arm = 1 AND post = 1 THEN mean END) AS b_post,
         sum(var / n) AS se2
  FROM cells)
SELECT round(a_pre, 6) AS control_pre,
       round(a_post, 6) AS control_post,
       round(b_pre, 6) AS treated_pre,
       round(b_post, 6) AS treated_post,
       round((b_post - b_pre) - (a_post - a_pre), 6) AS did_estimate,
       round(sqrt(se2), 6) AS std_error,
       abs((b_post - b_pre) - (a_post - a_pre)) > 1.96 * sqrt(se2) AS significant
FROM wide
"""


def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test between each pair of
    event-type value distributions vs the 'view' baseline — the
    distribution-shape companion to feature_drift_psi (PSI sees
    binned mass shifts, KS sees the worst-case CDF gap anywhere).
    D = max|ECDF_a − ECDF_b| computed by interleaving both samples
    and running both ECDFs in one ordered pass per pair; the 95%
    threshold is 1.358·√((n+m)/nm).

    100 TB: the union is (pair)-partitioned, so each window runs
    within its pair partition; per pair the pass is one sort —
    at scale the documented swap is binned ECDFs (quantile grid)
    which turns the sort into a histogram aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    base = ev.where(F.col("event_type") == "view").select(
        F.col("value").alias("v"), F.lit(1).alias("is_a")
    )
    rest = ev.where(F.col("event_type") != "view").select(
        "event_type", F.col("value").alias("v"), F.lit(0).alias("is_a")
    )
    pooled = rest.select("event_type", "v", "is_a").unionByName(
        rest.select("event_type").distinct().crossJoin(base)
    )
    counts = pooled.groupBy("event_type").agg(
        F.sum("is_a").cast("double").alias("n_a"),
        F.sum(F.lit(1) - F.col("is_a")).cast("double").alias("n_b"),
    )
    wp = W.partitionBy("event_type").orderBy("v", "is_a")
    ecdf = pooled.select(
        "event_type",
        "is_a",
        F.sum("is_a").over(wp).alias("ca"),
        F.sum(F.lit(1) - F.col("is_a")).over(wp).alias("cb"),
    )
    d = (
        ecdf.join(F.broadcast(counts), "event_type")
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.abs(F.col("ca") / F.col("n_a") - F.col("cb") / F.col("n_b")).alias("gap"),
        )
        .groupBy("event_type")
        .agg(
            F.max("n_a").cast("bigint").alias("n_baseline"),
            F.max("n_b").cast("bigint").alias("n_sample"),
            F.round(F.max("gap"), 6).alias("ks_d"),
            F.round(
                1.358 * F.sqrt((F.max("n_a") + F.max("n_b")) / (F.max("n_a") * F.max("n_b"))),
                6,
            ).alias("threshold_95"),
        )
    )
    return d.select(
        "event_type",
        "n_baseline",
        "n_sample",
        "ks_d",
        "threshold_95",
        (F.col("ks_d") > F.col("threshold_95")).alias("drift_detected"),
    ).orderBy("event_type")


KS_TWO_SAMPLE_SQL = """
WITH base AS (
  SELECT value AS v, 1 AS is_a FROM events WHERE event_type = 'view'),
rest AS (
  SELECT event_type, value AS v, 0 AS is_a FROM events WHERE event_type <> 'view'),
pooled AS (
  SELECT event_type, v, is_a FROM rest
  UNION ALL
  SELECT t.event_type, base.v, base.is_a
  FROM (SELECT DISTINCT event_type FROM rest) t CROSS JOIN base),
counts AS (
  SELECT event_type, CAST(sum(is_a) AS DOUBLE) AS n_a,
         CAST(sum(1 - is_a) AS DOUBLE) AS n_b
  FROM pooled GROUP BY event_type),
ecdf AS (
  SELECT event_type,
         sum(is_a) OVER w AS ca,
         sum(1 - is_a) OVER w AS cb
  FROM pooled
  WINDOW w AS (PARTITION BY event_type ORDER BY v, is_a
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
gaps AS (
  SELECT e.event_type, c.n_a, c.n_b,
         abs(e.ca / c.n_a - e.cb / c.n_b) AS gap
  FROM ecdf e JOIN counts c USING (event_type))
SELECT event_type,
       CAST(max(n_a) AS BIGINT) AS n_baseline,
       CAST(max(n_b) AS BIGINT) AS n_sample,
       round(max(gap), 6) AS ks_d,
       round(1.358 * sqrt((max(n_a) + max(n_b)) / (max(n_a) * max(n_b))), 6) AS threshold_95,
       max(gap) > 1.358 * sqrt((max(n_a) + max(n_b)) / (max(n_a) * max(n_b))) AS drift_detected
FROM gaps
GROUP BY event_type
ORDER BY event_type
"""


def fellegi_sunter_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM step of the Fellegi-Sunter record-linkage model — the
    probabilistic layer entity_resolution_pipeline's deterministic
    threshold lacks: candidate part pairs (same sorted-neighborhood
    band as the ER funnel) are described by a comparison vector
    γ = (name_eq, brand_eq, size_eq), and EM estimates per field the
    m-probability (agreement among true matches) and u-probability
    (agreement among non-matches) from a deterministic init (m=0.9,
    u=0.1, λ=0.3). Emits per field the updated m/u and the
    match-weight log2(m/u) — the scoring table a linker thresholds.

    100 TB: pairs come from the O(n·w) rank-bucket band; the E-step
    is a stateless projection over pair rows; the M-step is one
    3-field weighted aggregate."""
    m0, u0, lam = 0.9, 0.1, 0.3
    part = load_table(spark, "part", sf_dir)
    from pyspark.sql import Window as W2

    w_rank = W2.partitionBy("blk").orderBy(F.col("p_name").asc(), F.col("p_partkey").asc())
    v = (
        part.select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_size",
            F.element_at(F.split("p_name", " "), -1).alias("blk"),
        )
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .localCheckpoint()
    )
    bw = 4
    probe = v.select(
        "p_partkey", "p_name", "p_brand", "p_size", "blk", "rnk",
        F.explode(
            F.array(
                F.floor(F.col("rnk") / bw) - 1,
                F.floor(F.col("rnk") / bw),
                F.floor(F.col("rnk") / bw) + 1,
            )
        ).alias("bkt"),
    )
    build = v.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        F.col("p_brand").alias("b_brand"),
        F.col("p_size").alias("b_size"),
        F.col("blk").alias("b_blk"),
        F.col("rnk").alias("b_rnk"),
        F.floor(F.col("rnk") / bw).alias("bkt"),
    )
    gammas = (
        probe.join(build, ["bkt"])
        .where(
            (F.col("blk") == F.col("b_blk"))
            & (F.col("b_rnk") > F.col("rnk"))
            & (F.col("b_rnk") <= F.col("rnk") + 2)
        )
        .select(
            (F.col("p_name") == F.col("b_name")).cast("int").alias("g_name"),
            (F.col("p_brand") == F.col("b_brand")).cast("int").alias("g_brand"),
            (F.col("p_size") == F.col("b_size")).cast("int").alias("g_size"),
        )
    )
    # E-step under conditional independence with init (m0, u0, λ)
    lik = lambda g, p: F.when(F.col(g) == 1, F.lit(p)).otherwise(F.lit(1 - p))
    pm = lik("g_name", m0) * lik("g_brand", m0) * lik("g_size", m0) * lam
    pu = lik("g_name", u0) * lik("g_brand", u0) * lik("g_size", u0) * (1 - lam)
    scored = gammas.select("g_name", "g_brand", "g_size", (pm / (pm + pu)).alias("w"))
    agg = scored.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum("w").alias("sw"),
        *[
            F.sum(F.col("w") * F.col(g)).alias(f"m_{g}")
            for g in ("g_name", "g_brand", "g_size")
        ],
        *[
            F.sum((1 - F.col("w")) * F.col(g)).alias(f"u_{g}")
            for g in ("g_name", "g_brand", "g_size")
        ],
    )
    rows = []
    for g, label in (("g_name", "name"), ("g_brand", "brand"), ("g_size", "size")):
        m_new = F.col(f"m_{g}") / F.col("sw")
        u_new = F.col(f"u_{g}") / (F.col("n_pairs") - F.col("sw"))
        rows.append(
            agg.select(
                F.lit(label).alias("field"),
                F.col("n_pairs"),
                F.round(m_new, 6).alias("m_prob"),
                F.round(u_new, 6).alias("u_prob"),
                F.round(F.log2(m_new / u_new), 6).alias("match_weight"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("field")


FELLEGI_SUNTER_SQL = """
WITH v AS (
  SELECT p_partkey, p_name, p_brand, p_size,
         string_split(p_name, ' ')[-1] AS blk,
         CAST(row_number() OVER (PARTITION BY string_split(p_name, ' ')[-1]
              ORDER BY p_name ASC, p_partkey ASC) AS BIGINT) AS rnk
  FROM part),
gammas AS (
  SELECT CASE WHEN a.p_name = b.p_name THEN 1 ELSE 0 END AS g_name,
         CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS g_brand,
         CASE WHEN a.p_size = b.p_size THEN 1 ELSE 0 END AS g_size
  FROM v a JOIN v b
    ON a.blk = b.blk AND b.rnk > a.rnk AND b.rnk <= a.rnk + 2),
scored AS (
  SELECT g_name, g_brand, g_size,
         (CASE WHEN g_name = 1 THEN 0.9 ELSE 0.1 END
        * CASE WHEN g_brand = 1 THEN 0.9 ELSE 0.1 END
        * CASE WHEN g_size = 1 THEN 0.9 ELSE 0.1 END * 0.3)
         / ((CASE WHEN g_name = 1 THEN 0.9 ELSE 0.1 END
           * CASE WHEN g_brand = 1 THEN 0.9 ELSE 0.1 END
           * CASE WHEN g_size = 1 THEN 0.9 ELSE 0.1 END * 0.3)
          + (CASE WHEN g_name = 1 THEN 0.1 ELSE 0.9 END
           * CASE WHEN g_brand = 1 THEN 0.1 ELSE 0.9 END
           * CASE WHEN g_size = 1 THEN 0.1 ELSE 0.9 END * 0.7)) AS w
  FROM gammas),
agg AS (
  SELECT count(*)::BIGINT AS n_pairs, sum(w) AS sw,
         sum(w * g_name) AS m_name, sum(w * g_brand) AS m_brand, sum(w * g_size) AS m_size,
         sum((1 - w) * g_name) AS u_name, sum((1 - w) * g_brand) AS u_brand, sum((1 - w) * g_size) AS u_size
  FROM scored)
SELECT field, n_pairs, m_prob, u_prob, match_weight FROM (
  SELECT 'name' AS field, n_pairs,
         round(m_name / sw, 6) AS m_prob,
         round(u_name / (n_pairs - sw), 6) AS u_prob,
         round(log2((m_name / sw) / (u_name / (n_pairs - sw))), 6) AS match_weight
  FROM agg
  UNION ALL
  SELECT 'brand', n_pairs, round(m_brand / sw, 6), round(u_brand / (n_pairs - sw), 6),
         round(log2((m_brand / sw) / (u_brand / (n_pairs - sw))), 6) FROM agg
  UNION ALL
  SELECT 'size', n_pairs, round(m_size / sw, 6), round(u_size / (n_pairs - sw), 6),
         round(log2((m_size / sw) / (u_size / (n_pairs - sw))), 6) FROM agg)
ORDER BY field
"""


def raking_ipf_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking (iterative proportional fitting), one full
    cycle — the weighting pass that makes an unrepresentative sample
    match known population margins: cell weights over the
    (cohort × event_type) table start at 1, scale to hit the cohort
    margins (uniform ¼ target), then the type margins (uniform ⅕),
    and the audit reports each margin's worst relative error after
    the cycle — cohort margins drift slightly once types are fitted
    (why IPF iterates), type margins are exact by construction.

    100 TB: the sample collapses to the O(cohorts × types)
    contingency table in one aggregate; every IPF scaling is
    arithmetic between that table and its two margin projections."""
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        (F.col("user_id") % 4).alias("cohort"), "event_type"
    ).agg(F.count("*").cast("double").alias("n")).localCheckpoint()
    total = cells.agg(F.sum("n").alias("tot"))
    from pyspark.sql import Window as W

    w1 = (
        cells.crossJoin(F.broadcast(total))
        .withColumn("w", (F.col("tot") / 4.0) / F.sum("n").over(W.partitionBy("cohort")))
    )
    w2 = w1.withColumn(
        "w2",
        F.col("w")
        * (F.col("tot") / 5.0)
        / F.sum(F.col("n") * F.col("w")).over(W.partitionBy("event_type")),
    )
    audit = w2.select(
        "cohort",
        "event_type",
        "n",
        F.round("w2", 6).alias("weight"),
        (F.col("n") * F.col("w2")).alias("wn"),
        "tot",
    )
    coh_err = (
        audit.groupBy("cohort")
        .agg(F.sum("wn").alias("m"), F.max("tot").alias("tot"))
        .agg(
            F.round(F.max(F.abs(F.col("m") / (F.col("tot") / 4.0) - 1.0)), 6).alias(
                "max_cohort_margin_err"
            )
        )
    )
    typ_err = (
        audit.groupBy("event_type")
        .agg(F.sum("wn").alias("m"), F.max("tot").alias("tot"))
        .agg(
            F.round(F.max(F.abs(F.col("m") / (F.col("tot") / 5.0) - 1.0)), 6).alias(
                "max_type_margin_err"
            )
        )
    )
    return (
        audit.groupBy("cohort")
        .agg(
            F.round(F.min("weight"), 6).alias("min_weight"),
            F.round(F.max("weight"), 6).alias("max_weight"),
        )
        .crossJoin(F.broadcast(coh_err))
        .crossJoin(F.broadcast(typ_err))
        .orderBy("cohort")
    )


RAKING_SQL = """
WITH cells AS (
  SELECT user_id % 4 AS cohort, event_type, CAST(count(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2),
tot AS (SELECT sum(n) AS tot FROM cells),
w1 AS (
  SELECT cohort, event_type, n, tot,
         (tot / 4.0) / sum(n) OVER (PARTITION BY cohort) AS w
  FROM cells CROSS JOIN tot),
w2 AS (
  SELECT cohort, event_type, n, tot,
         w * (tot / 5.0) / sum(n * w) OVER (PARTITION BY event_type) AS w2
  FROM w1),
audit AS (
  SELECT cohort, event_type, n, round(w2, 6) AS weight, n * w2 AS wn, tot FROM w2),
coh_err AS (
  SELECT round(max(abs(m / (tot / 4.0) - 1.0)), 6) AS max_cohort_margin_err
  FROM (SELECT cohort, sum(wn) AS m, max(tot) AS tot FROM audit GROUP BY cohort)),
typ_err AS (
  SELECT round(max(abs(m / (tot / 5.0) - 1.0)), 6) AS max_type_margin_err
  FROM (SELECT event_type, sum(wn) AS m, max(tot) AS tot FROM audit GROUP BY event_type))
SELECT cohort, round(min(weight), 6) AS min_weight, round(max(weight), 6) AS max_weight,
       (SELECT max_cohort_margin_err FROM coh_err) AS max_cohort_margin_err,
       (SELECT max_type_margin_err FROM typ_err) AS max_type_margin_err
FROM audit
GROUP BY cohort
ORDER BY cohort
"""


def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the heavy-tail index over order totals — the
    statistic that says whether a value column has power-law tails
    (α ≤ 2: infinite variance, your mean is a lie; α large: thin
    tails): α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₎) over the top-k=100 order statistics,
    per order-priority segment. Reported with the implied
    finite-variance verdict.

    100 TB: the top-k per segment comes from a TakeOrdered-style
    per-segment window over a pre-filtered scan (at scale: per-
    partition top-k then merge); the estimator is one aggregate over
    O(segments × k) rows."""
    from pyspark.sql import Window as W

    k = 100
    orders = load_table(spark, "orders", sf_dir).select("o_orderpriority", "o_totalprice")
    wseg = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderpriority")
    )
    top = orders.withColumn("r", F.row_number().over(wseg)).where(F.col("r") <= k + 1)
    xk = top.where(F.col("r") == k + 1).select(
        "o_orderpriority", F.col("o_totalprice").alias("xk")
    )
    return (
        top.where(F.col("r") <= k)
        .join(F.broadcast(xk), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("k_used"),
            F.round(
                F.count("*") / F.sum(F.log(F.col("o_totalprice") / F.col("xk"))), 6
            ).alias("hill_alpha"),
        )
        .select(
            "o_orderpriority",
            "k_used",
            "hill_alpha",
            (F.col("hill_alpha") > 2.0).alias("finite_variance"),
        )
        .orderBy("o_orderpriority")
    )


HILL_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderpriority) AS r
  FROM orders),
xk AS (
  SELECT o_orderpriority, o_totalprice AS xk FROM ranked WHERE r = 101)
SELECT t.o_orderpriority,
       count(*)::BIGINT AS k_used,
       round(count(*) / sum(ln(t.o_totalprice / x.xk)), 6) AS hill_alpha,
       (count(*) / sum(ln(t.o_totalprice / x.xk))) > 2.0 AS finite_variance
FROM ranked t JOIN xk x USING (o_orderpriority)
WHERE t.r <= 100
GROUP BY t.o_orderpriority
ORDER BY t.o_orderpriority
"""


def huber_irls_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One IRLS step of Huber robust regression (value ~ day, per
    event type): the plain OLS slope, then one reweighted pass with
    Huber weights w = min(1, c/|residual|) (c = 20) that down-weights
    outliers instead of letting them own the fit. Emits both slopes,
    the share of down-weighted rows, and the slope shift — the
    robustness audit for any trend a pipeline alerts on.

    100 TB: two moment aggregates over the same scan shape (the OLS
    pass broadcasts 2 scalars per type back into the reweighted
    pass); no sorting, no iteration beyond the one documented step."""
    c = 20.0
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    ols = ev.groupBy("event_type").agg(
        ((F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.count("*"))
         / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / F.count("*"))).alias("b_ols"),
        ((F.sum("y") - (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.count("*"))
          / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / F.count("*")) * F.sum("x"))
         / F.count("*")).alias("a_ols"),
    )
    resid = ev.join(F.broadcast(ols), "event_type").withColumn(
        "r", F.col("y") - F.col("a_ols") - F.col("b_ols") * F.col("x")
    )
    weighted = resid.withColumn(
        "w", F.least(F.lit(1.0), F.lit(c) / F.greatest(F.abs("r"), F.lit(1e-9)))
    )
    out = weighted.groupBy("event_type").agg(
        F.max("b_ols").alias("b_ols"),
        ((F.sum(F.col("w") * F.col("x") * F.col("y"))
          - F.sum(F.col("w") * F.col("x")) * F.sum(F.col("w") * F.col("y")) / F.sum("w"))
         / (F.sum(F.col("w") * F.col("x") * F.col("x"))
            - F.sum(F.col("w") * F.col("x")) * F.sum(F.col("w") * F.col("x")) / F.sum("w"))).alias("b_huber"),
        (F.sum((F.col("w") < 1.0).cast("int")) / F.count("*")).alias("downweighted_frac"),
    )
    return out.select(
        "event_type",
        F.round("b_ols", 6).alias("slope_ols"),
        F.round("b_huber", 6).alias("slope_huber"),
        F.round("downweighted_frac", 6).alias("downweighted_frac"),
        F.round(F.abs(F.col("b_huber") - F.col("b_ols")), 6).alias("slope_shift"),
    ).orderBy("event_type")


HUBER_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
         value AS y
  FROM events),
ols AS (
  SELECT event_type,
         (sum(x*y) - sum(x)*sum(y)/count(*)) / (sum(x*x) - sum(x)*sum(x)/count(*)) AS b_ols,
         (sum(y) - (sum(x*y) - sum(x)*sum(y)/count(*)) / (sum(x*x) - sum(x)*sum(x)/count(*)) * sum(x)) / count(*) AS a_ols
  FROM ev GROUP BY event_type),
weighted AS (
  SELECT e.event_type, e.x, e.y, o.b_ols,
         least(1.0, 20.0 / greatest(abs(e.y - o.a_ols - o.b_ols * e.x), 1e-9)) AS w
  FROM ev e JOIN ols o USING (event_type))
SELECT event_type,
       round(max(b_ols), 6) AS slope_ols,
       round((sum(w*x*y) - sum(w*x)*sum(w*y)/sum(w))
             / (sum(w*x*x) - sum(w*x)*sum(w*x)/sum(w)), 6) AS slope_huber,
       round(sum(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS downweighted_frac,
       round(abs((sum(w*x*y) - sum(w*x)*sum(w*y)/sum(w))
             / (sum(w*x*x) - sum(w*x)*sum(w*x)/sum(w)) - max(b_ols)), 6) AS slope_shift
FROM weighted
GROUP BY event_type
ORDER BY event_type
"""


def covariate_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate balance check (standardized mean differences) for
    the user-hash A/B split — the randomization-quality audit that
    runs WITH srm_check before any effect is read: per pre-period
    covariate (mean event value, event count, active days), SMD =
    (x̄_B − x̄_A)/s_pooled; |SMD| < 0.1 is the conventional balance
    line. A failing covariate means the 'random' split correlates
    with behavior and every naive comparison is confounded.

    100 TB: one user-level aggregate (3 covariates in one pass), one
    (arm) moment aggregate per covariate — O(1) output rows."""
    ev = load_table(spark, "events", sf_dir)
    cut = F.lit("2024-01-15").cast("timestamp")
    users = ev.where(F.col("ts") < cut).groupBy("user_id").agg(
        F.avg("value").alias("mean_value"),
        F.count("*").cast("double").alias("n_events"),
        F.countDistinct(F.to_date("ts")).cast("double").alias("active_days"),
    ).withColumn("arm", (F.col("user_id") % 2).cast("int"))
    rows = []
    for cov in ("mean_value", "n_events", "active_days"):
        agg = users.groupBy("arm").agg(
            F.avg(cov).alias("m"), F.var_samp(cov).alias("v"), F.count("*").alias("n")
        )
        wide = agg.agg(
            F.sum(F.when(F.col("arm") == 0, F.col("m"))).alias("m0"),
            F.sum(F.when(F.col("arm") == 1, F.col("m"))).alias("m1"),
            F.sum(F.when(F.col("arm") == 0, F.col("v"))).alias("v0"),
            F.sum(F.when(F.col("arm") == 1, F.col("v"))).alias("v1"),
        )
        smd = (F.col("m1") - F.col("m0")) / F.sqrt((F.col("v0") + F.col("v1")) / 2.0)
        rows.append(
            wide.select(
                F.lit(cov).alias("covariate"),
                F.round("m0", 6).alias("mean_a"),
                F.round("m1", 6).alias("mean_b"),
                F.round(smd, 6).alias("smd"),
                (F.abs(smd) < 0.1).alias("balanced"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("covariate")


COVARIATE_BALANCE_SQL = """
WITH users AS (
  SELECT user_id, user_id % 2 AS arm,
         avg(value) AS mean_value,
         CAST(count(*) AS DOUBLE) AS n_events,
         CAST(count(DISTINCT CAST(ts AS DATE)) AS DOUBLE) AS active_days
  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id),
per AS (
  SELECT covariate, arm, avg(val) AS m, var_samp(val) AS v
  FROM users, LATERAL (VALUES ('mean_value', mean_value), ('n_events', n_events),
                              ('active_days', active_days)) t(covariate, val)
  GROUP BY covariate, arm),
wide AS (
  SELECT covariate,
         sum(CASE WHEN arm = 0 THEN m END) AS m0,
         sum(CASE WHEN arm = 1 THEN m END) AS m1,
         sum(CASE WHEN arm = 0 THEN v END) AS v0,
         sum(CASE WHEN arm = 1 THEN v END) AS v1
  FROM per GROUP BY covariate)
SELECT covariate, round(m0, 6) AS mean_a, round(m1, 6) AS mean_b,
       round((m1 - m0) / sqrt((v0 + v1) / 2.0), 6) AS smd,
       abs((m1 - m0) / sqrt((v0 + v1) / 2.0)) < 0.1 AS balanced
FROM wide
ORDER BY covariate
"""


def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — where the average effect hides
    the story: the B−A difference at each decile of the outcome
    (event value) distribution, from exact per-arm quantile grids.
    A flat QTE profile means a uniform shift; effects concentrated in
    the upper deciles mean the treatment moves the tail, not the
    typical user — decisions the mean alone gets wrong.

    100 TB: one exact percentile-array aggregate per arm (the
    documented scale swap is approx_percentile), then O(deciles)
    arithmetic between two broadcast 9-element arrays."""
    ev = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 2).alias("arm"), "value"
    )
    qs = [i / 10.0 for i in range(1, 10)]
    grids = ev.groupBy("arm").agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("g")
    )
    wide = grids.agg(
        F.max(F.when(F.col("arm") == 0, F.col("g"))).alias("ga"),
        F.max(F.when(F.col("arm") == 1, F.col("g"))).alias("gb"),
    )
    exploded = wide.select(
        F.posexplode(
            F.zip_with(F.col("gb"), F.col("ga"), lambda b, a: b - a)
        ).alias("i", "qte"),
        F.col("ga"),
        F.col("gb"),
    )
    return exploded.select(
        ((F.col("i") + 1) * 10).cast("bigint").alias("percentile"),
        F.round(F.element_at(F.col("ga"), F.col("i") + 1), 6).alias("control_q"),
        F.round(F.element_at(F.col("gb"), F.col("i") + 1), 6).alias("treated_q"),
        F.round("qte", 6).alias("qte"),
    ).orderBy("percentile")


QTE_SQL = """
WITH grids AS (
  SELECT user_id % 2 AS arm,
         quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS g
  FROM events GROUP BY user_id % 2),
wide AS (
  SELECT max(CASE WHEN arm = 0 THEN g END) AS ga,
         max(CASE WHEN arm = 1 THEN g END) AS gb
  FROM grids)
SELECT CAST(i * 10 AS BIGINT) AS percentile,
       round(ga[i], 6) AS control_q,
       round(gb[i], 6) AS treated_q,
       round(gb[i] - ga[i], 6) AS qte
FROM wide, LATERAL (SELECT unnest(generate_series(1, 9)) AS i)
ORDER BY percentile
"""


def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with a coverage audit —
    the distribution-free uncertainty wrapper modern ML serving
    demands: a base predictor (per-type mean from the train split),
    nonconformity scores |y − ŷ| on a CALIBRATION split, the
    conformal quantile q̂ at the ⌈(n+1)(1−α)⌉/n rank (α = 0.1), and
    the guaranteed-≥90% empirical coverage measured on the held-out
    TEST split. The three splits are the stateless user-hash split.
    Conformal's finite-sample guarantee is the contract column.

    100 TB: one pass builds all three splits' aggregates (the
    predictor and q̂ are O(types) broadcasts); the coverage check is
    a filtered aggregate over the test partition."""
    from pyspark.sql import Window as W

    alpha = 0.1
    ev = load_table(spark, "events", sf_dir)
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("cf:"), F.col("event_id").cast("string"))), 1, 4), 16, 10)
        % 100
    )
    tagged = ev.select(
        "event_type",
        "value",
        F.when(h < 50, "train").when(h < 75, "cal").otherwise("test").alias("split"),
    ).localCheckpoint()
    pred = tagged.where(F.col("split") == "train").groupBy("event_type").agg(
        F.avg("value").alias("yhat")
    )
    cal = (
        tagged.where(F.col("split") == "cal")
        .join(F.broadcast(pred), "event_type")
        .select("event_type", F.abs(F.col("value") - F.col("yhat")).alias("score"))
    )
    wr = W.partitionBy("event_type").orderBy("score")
    ncal = cal.groupBy("event_type").agg(F.count("*").alias("n_cal"))
    qsel = (
        cal.withColumn("r", F.row_number().over(wr))
        .join(F.broadcast(ncal), "event_type")
        .where(F.col("r") == F.ceil((F.col("n_cal") + 1) * (1 - alpha)))
        .select("event_type", F.col("score").alias("qhat"), "n_cal")
    )
    test = (
        tagged.where(F.col("split") == "test")
        .join(F.broadcast(pred), "event_type")
        .join(F.broadcast(qsel), "event_type")
    )
    return (
        test.groupBy("event_type")
        .agg(
            F.max("n_cal").cast("bigint").alias("n_cal"),
            F.count("*").cast("bigint").alias("n_test"),
            F.round(F.max("qhat"), 6).alias("qhat"),
            F.round(
                F.avg(
                    (F.abs(F.col("value") - F.col("yhat")) <= F.col("qhat")).cast("int")
                ),
                6,
            ).alias("coverage"),
        )
        .select(
            "*",
            (
                F.col("coverage")
                >= 1
                - alpha
                - 2.0 * F.sqrt(alpha * (1 - alpha) / F.col("n_test"))
            ).alias("coverage_ok"),
        )
        .orderBy("event_type")
    )


CONFORMAL_SQL = """
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN h < 50 THEN 'train' WHEN h < 75 THEN 'cal' ELSE 'test' END AS split
  FROM (SELECT event_type, value,
               (((strpos('0123456789abcdef', md5('cf:' || CAST(event_id AS VARCHAR))[1]) - 1) * 4096
               + (strpos('0123456789abcdef', md5('cf:' || CAST(event_id AS VARCHAR))[2]) - 1) * 256
               + (strpos('0123456789abcdef', md5('cf:' || CAST(event_id AS VARCHAR))[3]) - 1) * 16
               + (strpos('0123456789abcdef', md5('cf:' || CAST(event_id AS VARCHAR))[4]) - 1)) % 100) AS h
        FROM events)),
pred AS (
  SELECT event_type, avg(value) AS yhat FROM tagged WHERE split = 'train' GROUP BY event_type),
cal AS (
  SELECT t.event_type, abs(t.value - p.yhat) AS score
  FROM tagged t JOIN pred p USING (event_type) WHERE t.split = 'cal'),
ncal AS (SELECT event_type, count(*) AS n_cal FROM cal GROUP BY event_type),
ranked AS (
  SELECT event_type, score, row_number() OVER (PARTITION BY event_type ORDER BY score) AS r
  FROM cal),
qsel AS (
  SELECT r.event_type, r.score AS qhat, n.n_cal
  FROM ranked r JOIN ncal n USING (event_type)
  WHERE r.r = ceil((n.n_cal + 1) * 0.9)),
test AS (
  SELECT t.event_type, t.value, p.yhat, q.qhat, q.n_cal
  FROM tagged t JOIN pred p USING (event_type) JOIN qsel q USING (event_type)
  WHERE t.split = 'test')
SELECT event_type,
       CAST(max(n_cal) AS BIGINT) AS n_cal,
       count(*)::BIGINT AS n_test,
       round(max(qhat), 6) AS qhat,
       round(avg(CASE WHEN abs(value - yhat) <= qhat THEN 1 ELSE 0 END), 6) AS coverage,
       avg(CASE WHEN abs(value - yhat) <= qhat THEN 1 ELSE 0 END)
         >= 0.9 - 2.0 * sqrt(0.09 / count(*)) AS coverage_ok
FROM test
GROUP BY event_type
ORDER BY event_type
"""


def mutual_information_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-information feature screen — the model-free relevance
    test a feature store runs before admitting a feature: I(X;Y)
    between each candidate (value decile, hour-of-day, day-of-month
    parity) and the event-type label, from joint histograms:
    I = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))), with the normalized variant
    I/H(Y) (uncertainty coefficient) so features are comparable.
    Near-zero MI = the feature can't move any classifier; the screen
    kills it before it costs storage and drift surface.

    100 TB: each feature is one (bucket, label) histogram aggregate;
    the MI sum is O(buckets × labels) arithmetic over the broadcast
    joint table."""
    ev = load_table(spark, "events", sf_dir)
    from pyspark.sql import Window as W

    feats = {
        "value_decile": F.least(F.lit(9), F.floor(F.col("value") / 50.0)).cast("int"),
        "hour_of_day": F.hour("ts").cast("int"),
        "day_parity": (F.dayofmonth("ts") % 2).cast("int"),
    }
    rows = []
    for name, expr in feats.items():
        joint = ev.groupBy(expr.alias("x"), F.col("event_type").alias("y")).agg(
            F.count("*").cast("double").alias("nxy")
        )
        tot = joint.agg(F.sum("nxy").alias("n"))
        wx = W.partitionBy("x")
        wy = W.partitionBy("y")
        scored = (
            joint.crossJoin(F.broadcast(tot))
            .withColumn("px", F.sum("nxy").over(wx) / F.col("n"))
            .withColumn("py", F.sum("nxy").over(wy) / F.col("n"))
            .withColumn("pxy", F.col("nxy") / F.col("n"))
        )
        mi = scored.agg(
            F.sum(F.col("pxy") * F.log(F.col("pxy") / (F.col("px") * F.col("py")))).alias(
                "mi"
            )
        )
        hy = (
            ev.groupBy("event_type")
            .agg(F.count("*").cast("double").alias("ny"))
            .crossJoin(F.broadcast(tot))
            .agg(
                (-F.sum((F.col("ny") / F.col("n")) * F.log(F.col("ny") / F.col("n")))).alias(
                    "hy"
                )
            )
        )
        rows.append(
            mi.crossJoin(F.broadcast(hy)).select(
                F.lit(name).alias("feature"),
                F.round("mi", 6).alias("mutual_info"),
                F.round(F.col("mi") / F.col("hy"), 6).alias("uncertainty_coef"),
                (F.col("mi") / F.col("hy") > 0.001).alias("admit"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("feature")


MUTUAL_INFO_SQL = """
WITH ev AS (
  SELECT event_type AS y,
         CAST(least(9, floor(value / 50.0)) AS INT) AS value_decile,
         CAST(extract(hour FROM ts) AS INT) AS hour_of_day,
         CAST(extract(day FROM ts) % 2 AS INT) AS day_parity
  FROM events),
melted AS (
  SELECT feature, x, y FROM ev,
  LATERAL (VALUES ('value_decile', value_decile), ('hour_of_day', hour_of_day),
                  ('day_parity', day_parity)) t(feature, x)),
joint AS (
  SELECT feature, x, y, CAST(count(*) AS DOUBLE) AS nxy
  FROM melted GROUP BY feature, x, y),
tot AS (SELECT feature, sum(nxy) AS n FROM joint GROUP BY feature),
scored AS (
  SELECT j.feature, j.nxy / t.n AS pxy,
         sum(j.nxy) OVER (PARTITION BY j.feature, j.x) / t.n AS px,
         sum(j.nxy) OVER (PARTITION BY j.feature, j.y) / t.n AS py
  FROM joint j JOIN tot t USING (feature)),
mi AS (
  SELECT feature, sum(pxy * ln(pxy / (px * py))) AS mi
  FROM scored GROUP BY feature),
hy AS (
  SELECT -sum(p * ln(p)) AS hy
  FROM (SELECT count(*) / CAST((SELECT count(*) FROM events) AS DOUBLE) AS p
        FROM events GROUP BY event_type))
SELECT feature, round(mi, 6) AS mutual_info,
       round(mi / hy, 6) AS uncertainty_coef,
       mi / hy > 0.001 AS admit
FROM mi CROSS JOIN hy
ORDER BY feature
"""


def boosting_stump_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One gradient-boosting round with a decision stump — the
    tree-family member of the ML-on-DataFrames suite (k-means = hard
    cells, GMM = soft cells, GD = linear, this = axis-aligned split):
    fit value ~ day with the best single-threshold stump chosen from
    the 9 day-decile candidates by SSE (each candidate scored in ONE
    grouped aggregate, no per-split scan), per event type. Emits the
    chosen threshold, leaf means, and the variance-explained share —
    the boosting iteration's building block.

    100 TB: candidate scoring is a (type, candidate) aggregate over a
    9-way explode of the daily pre-aggregate, never the raw log; the
    argmin is a max-struct."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("double").alias("x"),
        F.col("value").alias("y"),
    )
    cands = [3.0 * i for i in range(1, 10)]
    exploded = ev.select(
        "event_type",
        "y",
        "x",
        F.explode(F.array(*[F.lit(c) for c in cands])).alias("thr"),
    )
    per_side = exploded.groupBy("event_type", "thr").agg(
        F.sum(F.when(F.col("x") <= F.col("thr"), F.col("y"))).alias("sl"),
        F.sum(F.when(F.col("x") <= F.col("thr"), F.col("y") * F.col("y"))).alias("ql"),
        F.sum(F.when(F.col("x") <= F.col("thr"), 1).otherwise(0)).cast("double").alias("nl"),
        F.sum(F.when(F.col("x") > F.col("thr"), F.col("y"))).alias("sr"),
        F.sum(F.when(F.col("x") > F.col("thr"), F.col("y") * F.col("y"))).alias("qr"),
        F.sum(F.when(F.col("x") > F.col("thr"), 1).otherwise(0)).cast("double").alias("nr"),
    ).where((F.col("nl") > 0) & (F.col("nr") > 0))
    sse = (
        F.col("ql") - F.col("sl") * F.col("sl") / F.col("nl")
        + F.col("qr") - F.col("sr") * F.col("sr") / F.col("nr")
    )
    scored = per_side.select(
        "event_type",
        "thr",
        sse.alias("sse"),
        (F.col("sl") / F.col("nl")).alias("left_mean"),
        (F.col("sr") / F.col("nr")).alias("right_mean"),
        (F.col("ql") + F.col("qr") - F.pow(F.col("sl") + F.col("sr"), 2) / (F.col("nl") + F.col("nr"))).alias("sse0"),
    )
    best = scored.groupBy("event_type").agg(
        F.min(F.struct(F.col("sse").alias("s"), F.col("thr").alias("t"),
                       F.col("left_mean").alias("lm"), F.col("right_mean").alias("rm"),
                       F.col("sse0").alias("s0"))).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.t").cast("bigint").alias("split_day"),
        F.round(F.col("b.lm"), 6).alias("left_mean"),
        F.round(F.col("b.rm"), 6).alias("right_mean"),
        F.round(F.lit(1.0) - F.col("b.s") / F.col("b.s0"), 6).alias("var_explained"),
    ).orderBy("event_type")


BOOSTING_STUMP_SQL = """
WITH ev AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
         value AS y
  FROM events),
exploded AS (
  SELECT event_type, x, y, thr
  FROM ev, LATERAL (SELECT unnest([3.0,6.0,9.0,12.0,15.0,18.0,21.0,24.0,27.0]) AS thr)),
per_side AS (
  SELECT event_type, thr,
         sum(CASE WHEN x <= thr THEN y END) AS sl,
         sum(CASE WHEN x <= thr THEN y * y END) AS ql,
         CAST(sum(CASE WHEN x <= thr THEN 1 ELSE 0 END) AS DOUBLE) AS nl,
         sum(CASE WHEN x > thr THEN y END) AS sr,
         sum(CASE WHEN x > thr THEN y * y END) AS qr,
         CAST(sum(CASE WHEN x > thr THEN 1 ELSE 0 END) AS DOUBLE) AS nr
  FROM exploded GROUP BY event_type, thr
  HAVING sum(CASE WHEN x <= thr THEN 1 ELSE 0 END) > 0
     AND sum(CASE WHEN x > thr THEN 1 ELSE 0 END) > 0),
scored AS (
  SELECT event_type, thr,
         ql - sl * sl / nl + qr - sr * sr / nr AS sse,
         sl / nl AS left_mean, sr / nr AS right_mean,
         ql + qr - power(sl + sr, 2) / (nl + nr) AS sse0
  FROM per_side),
best AS (
  SELECT event_type,
         (min(struct_pack(s := sse, t := thr, lm := left_mean, rm := right_mean, s0 := sse0))) AS b
  FROM scored GROUP BY event_type)
SELECT event_type,
       CAST((b).t AS BIGINT) AS split_day,
       round((b).lm, 6) AS left_mean,
       round((b).rm, 6) AS right_mean,
       round(1.0 - (b).s / (b).s0, 6) AS var_explained
FROM best
ORDER BY event_type
"""


def durbin_watson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson autocorrelation audit of the daily trend
    residuals — the diagnostic that says whether the OLS trend's
    error bars can be believed (DW ≈ 2: independent residuals;
    DW → 0: positive autocorrelation, the variance is understated and
    every 'significant' trend is suspect): per event type, fit
    value ~ day on the daily means, then DW = Σ(eₜ−eₜ₋₁)²/Σeₜ² over
    the day-ordered residual series.

    100 TB: the log reduces once to the O(types × days) daily table;
    the OLS fit is a moment aggregate broadcast back; the DW lag runs
    inside type partitions of that pre-aggregate."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("double").alias("x")
    ).agg(F.avg("value").alias("y"))
    ols = daily.groupBy("event_type").agg(
        ((F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.count("*"))
         / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / F.count("*"))).alias("b"),
        ((F.sum("y") - (F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y") / F.count("*"))
          / (F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x") / F.count("*")) * F.sum("x"))
         / F.count("*")).alias("a"),
    )
    resid = daily.join(F.broadcast(ols), "event_type").select(
        "event_type", "x", (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("e")
    )
    wt = W.partitionBy("event_type").orderBy("x")
    diffed = resid.withColumn("de", F.col("e") - F.lag("e", 1).over(wt))
    return (
        diffed.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.round(F.sum(F.col("de") * F.col("de")) / F.sum(F.col("e") * F.col("e")), 6).alias(
                "dw"
            ),
        )
        .select(
            "event_type",
            "n_days",
            "dw",
            F.when(F.col("dw") < 1.5, "positive_autocorr")
            .when(F.col("dw") > 2.5, "negative_autocorr")
            .otherwise("independent")
            .alias("verdict"),
        )
        .orderBy("event_type")
    )


DURBIN_WATSON_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS DOUBLE) AS x,
         avg(value) AS y
  FROM events GROUP BY event_type, 2),
ols AS (
  SELECT event_type,
         (sum(x*y) - sum(x)*sum(y)/count(*)) / (sum(x*x) - sum(x)*sum(x)/count(*)) AS b,
         (sum(y) - (sum(x*y) - sum(x)*sum(y)/count(*)) / (sum(x*x) - sum(x)*sum(x)/count(*)) * sum(x)) / count(*) AS a
  FROM daily GROUP BY event_type),
resid AS (
  SELECT d.event_type, d.x, d.y - o.a - o.b * d.x AS e
  FROM daily d JOIN ols o USING (event_type)),
diffed AS (
  SELECT event_type, e,
         e - lag(e) OVER (PARTITION BY event_type ORDER BY x) AS de
  FROM resid)
SELECT event_type, count(*)::BIGINT AS n_days,
       round(sum(de * de) / sum(e * e), 6) AS dw,
       CASE WHEN sum(de * de) / sum(e * e) < 1.5 THEN 'positive_autocorr'
            WHEN sum(de * de) / sum(e * e) > 2.5 THEN 'negative_autocorr'
            ELSE 'independent' END AS verdict
FROM diffed
GROUP BY event_type
ORDER BY event_type
"""


def mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test of each event type's value
    distribution against the 'view' baseline — the nonparametric
    location companion to ks_two_sample (KS sees any CDF gap, U asks
    specifically 'does one distribution sit higher'). Average ranks
    are computed from value-group counts + one cumulative window per
    pair (never a per-row global sort): avg_rank(v) = cnt_below +
    (cnt_at+1)/2. U = R_base − n_a(n_a+1)/2, z = (U − n_a·n_b/2) /
    √(n_a·n_b·(n_a+n_b+1)/12) (ties handled by the averaging; no tie
    variance correction — both engines apply the identical formula).

    100 TB: the pooled table is (pair)-partitioned; the rank pass
    aggregates to DISTINCT VALUES first, so the window walks value
    groups, not rows — the same bounded-ECDF trick ks_two_sample
    uses."""
    ev = load_table(spark, "events", sf_dir).select("event_type", F.col("value").alias("v"))
    base = ev.where(F.col("event_type") == "view").select(
        F.col("v"), F.lit(1).alias("is_a")
    )
    rest = ev.where(F.col("event_type") != "view").select(
        "event_type", "v", F.lit(0).alias("is_a")
    )
    pooled = rest.unionByName(rest.select("event_type").distinct().crossJoin(base))
    g = pooled.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("is_a").alias("cnt_a")
    )
    wv = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = g.select(
        "event_type",
        "cnt",
        "cnt_a",
        (F.sum("cnt").over(wv) - F.col("cnt") + (F.col("cnt") + 1) / 2.0).alias("avg_rank"),
    )
    res = ranked.groupBy("event_type").agg(
        F.sum(F.col("cnt_a") * F.col("avg_rank")).alias("r_a"),
        F.sum("cnt_a").cast("double").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("double").alias("n_b"),
    )
    u = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / 2.0
    z = (u - F.col("n_a") * F.col("n_b") / 2.0) / F.sqrt(
        F.col("n_a") * F.col("n_b") * (F.col("n_a") + F.col("n_b") + 1) / 12.0
    )
    return res.select(
        "event_type",
        F.col("n_a").cast("bigint").alias("n_baseline"),
        F.col("n_b").cast("bigint").alias("n_sample"),
        F.round(u, 2).alias("u_baseline"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    ).orderBy("event_type")


MANN_WHITNEY_SQL = """
WITH base AS (
  SELECT value AS v, 1 AS is_a FROM events WHERE event_type = 'view'),
rest AS (
  SELECT event_type, value AS v, 0 AS is_a FROM events WHERE event_type <> 'view'),
pooled AS (
  SELECT event_type, v, is_a FROM rest
  UNION ALL
  SELECT t.event_type, base.v, base.is_a
  FROM (SELECT DISTINCT event_type FROM rest) t CROSS JOIN base),
g AS (
  SELECT event_type, v, count(*) AS cnt, sum(is_a) AS cnt_a
  FROM pooled GROUP BY event_type, v),
ranked AS (
  SELECT event_type, cnt, cnt_a,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt + (cnt + 1) / 2.0 AS avg_rank
  FROM g),
res AS (
  SELECT event_type,
         sum(cnt_a * avg_rank) AS r_a,
         CAST(sum(cnt_a) AS DOUBLE) AS n_a,
         CAST(sum(cnt - cnt_a) AS DOUBLE) AS n_b
  FROM ranked GROUP BY event_type)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_baseline,
       CAST(n_b AS BIGINT) AS n_sample,
       round(r_a - n_a * (n_a + 1) / 2.0, 2) AS u_baseline,
       round((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
             / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0), 6) AS z_score,
       abs((r_a - n_a * (n_a + 1) / 2.0 - n_a * n_b / 2.0)
           / sqrt(n_a * n_b * (n_a + n_b + 1) / 12.0)) > 1.96 AS significant_95
FROM res
ORDER BY event_type
"""


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily order volume per priority:
    the median of all pairwise day-to-day slopes — immune to the
    outlier days that wreck an OLS slope. The pair space is the DAILY
    series squared, which is CALENDAR-bounded (a 100 TB corpus still
    has ~3k days), so the self-join is data-size-independent after
    the first aggregate — the scale trick that makes the textbook
    O(n²) estimator viable.

    100 TB: one groupBy to (priority, day) counts, then a
    priority-partitioned pair join over the tiny daily table; the
    median is per-priority over ≤ days²/2 slopes. The probe side is
    explicitly repartitioned by (priority, x) before the pair join
    (round-8 bisect, same fix as seasonally_adjusted_trend): AQE
    coalesced the ~12k-row daily table to ~1 partition, serializing
    the 1000× pair explosion; an explicit-width repartition restores
    full-width pair generation + map-side partial percentile."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = daily.select(
        "o_orderpriority",
        F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")).alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    n_width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    a = daily.repartition(n_width, "o_orderpriority", "x").alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("slope"),
    )
    days = daily.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        pairs.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.median("slope"), 6).alias("ts_slope"),
        )
        .join(F.broadcast(days), "o_orderpriority")
        .select("o_orderpriority", "n_days", "n_pairs", "ts_slope",
                (F.col("ts_slope") > 0).alias("rising"))
        .orderBy("o_orderpriority")
    )


THEIL_SEN_SQL = """
WITH daily AS (
  SELECT o_orderpriority,
         datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(count(*) AS DOUBLE) AS y
  FROM orders GROUP BY 1, 2),
pairs AS (
  SELECT a.o_orderpriority, (b.y - a.y) / (b.x - a.x) AS slope
  FROM daily a JOIN daily b
    ON a.o_orderpriority = b.o_orderpriority AND b.x > a.x),
days AS (
  SELECT o_orderpriority, count(*) AS n_days FROM daily GROUP BY 1)
SELECT p.o_orderpriority,
       CAST(d.n_days AS BIGINT) AS n_days,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(median(p.slope), 6) AS ts_slope,
       round(median(p.slope), 6) > 0 AS rising
FROM pairs p JOIN days d USING (o_orderpriority)
GROUP BY p.o_orderpriority, d.n_days
ORDER BY p.o_orderpriority
"""


def cooks_distance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's-distance influence audit for the OLS fit of order total
    price on customer account balance — the regression-QA pass that
    surfaces the individual rows that most distort a fitted model
    (label-noise hunting for value-regression training sets). Simple-
    regression closed forms make it three aggregate passes, no solver:
    (1) moments → slope/intercept, (2) SSE → s², (3) per-row leverage
    h = 1/n + (x−x̄)²/Sxx and D = e²/(2s²)·h/(1−h)²; top 10 by D.

    100 TB: passes 1-2 are single hash aggregates broadcast back as
    1-row parameter frames (the linear_probe_gd pattern); pass 3 is a
    map-only projection + TakeOrdered(10) — no shuffle carries rows."""
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    d = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", F.col("c_acctbal").alias("x"), F.col("o_totalprice").alias("y")
    )
    st = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
    )
    p = d.crossJoin(F.broadcast(st)).withColumn(
        "sxx", F.col("sxx_raw") - F.col("n") * F.col("xbar") * F.col("xbar")
    )
    p = p.withColumn(
        "b",
        (F.col("sxy_raw") - F.col("n") * F.col("xbar") * F.col("ybar")) / F.col("sxx"),
    )
    p = p.withColumn(
        "e", F.col("y") - (F.col("ybar") - F.col("b") * F.col("xbar")) - F.col("b") * F.col("x")
    )
    sse = p.agg(F.sum(F.col("e") * F.col("e")).alias("sse"))
    q = p.crossJoin(F.broadcast(sse)).withColumn(
        "s2", F.col("sse") / (F.col("n") - 2)
    )
    q = q.withColumn(
        "h", 1 / F.col("n") + (F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar")) / F.col("sxx")
    )
    q = q.withColumn(
        "cooks_d",
        F.col("e") * F.col("e") / (2 * F.col("s2")) * F.col("h") / ((1 - F.col("h")) * (1 - F.col("h"))),
    )
    return q.select(
        "o_orderkey",
        F.round("e", 2).alias("residual"),
        F.round("h", 8).alias("leverage"),
        F.round("cooks_d", 8).alias("cooks_d"),
    ).orderBy(F.col("cooks_d").desc(), "o_orderkey").limit(10)


COOKS_DISTANCE_SQL = """
WITH d AS (
  SELECT o_orderkey, c_acctbal AS x, o_totalprice AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(x) AS xbar, avg(y) AS ybar,
         sum(x * x) AS sxx_raw, sum(x * y) AS sxy_raw
  FROM d),
p AS (
  SELECT d.*, st.n, st.xbar, st.ybar,
         st.sxx_raw - st.n * st.xbar * st.xbar AS sxx,
         (st.sxy_raw - st.n * st.xbar * st.ybar)
           / (st.sxx_raw - st.n * st.xbar * st.xbar) AS b
  FROM d CROSS JOIN st),
r AS (
  SELECT *, y - (ybar - b * xbar) - b * x AS e FROM p),
sse AS (SELECT sum(e * e) AS sse FROM r),
q AS (
  SELECT r.*, sse.sse / (r.n - 2) AS s2,
         1 / r.n + (r.x - r.xbar) * (r.x - r.xbar) / r.sxx AS h
  FROM r CROSS JOIN sse)
SELECT o_orderkey,
       round(e, 2) AS residual,
       round(h, 8) AS leverage,
       round(e * e / (2 * s2) * h / ((1 - h) * (1 - h)), 8) AS cooks_d
FROM q
ORDER BY e * e / (2 * s2) * h / ((1 - h) * (1 - h)) DESC, o_orderkey
LIMIT 10
"""


def spearman_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlations between quantity, extended price,
    and discount WITHIN each lineitem return-flag segment — the
    monotone-association matrix (Pearson on average ranks, so ties in
    the heavily quantized quantity/discount columns are handled
    exactly). Per-segment because a global per-row rank is a global
    sort; segment partitioning is both the statistical intent
    (association within regime) and the scale-safe plan.

    100 TB: per-row rank windows partitioned by the 3-value segment
    column are a scale wall — three tasks each sort N/3 rows no
    matter how many executors exist (measured: 159 s at the ×64
    probe, 45× the sf0.1 wall). Instead ranks are computed on the
    DISTINCT-VALUE frequency table: avg_rank(v) = (#rows below v) +
    (ties(v)+1)/2, where the below-count is a running sum over the
    per-segment value table — the window input is |distinct values|
    (bounded by the value domain: 50 quantities, 11 discounts,
    price ≈ #base-prices×50), not N rows. The rank tables join back
    broadcast (q, disc) or by a value-parallel equi-join (p), and
    map-side partial aggregation dedupes the frequency counts before
    any shuffle. Measured ×64: 159 s → value-table sorts that no
    longer grow with row count; sf0.1 3.9 → 3.2 s."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_discount").alias("disc"),
    )

    def rank_table(col: str) -> DataFrame:
        vt = li.groupBy("l_returnflag", col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        w = (
            W.partitionBy("l_returnflag")
            .orderBy(col)
            .rowsBetween(W.unboundedPreceding, -1)
        )
        return vt.select(
            "l_returnflag",
            F.col(col),
            (
                F.coalesce(F.sum("c").over(w), F.lit(0)) + (F.col("c") + 1) / 2.0
            ).alias(f"r_{col}"),
        )

    d = li
    for col, small in (("q", True), ("disc", True), ("p", False)):
        rt = rank_table(col)
        if small:
            rt = F.broadcast(rt)
        d = d.join(rt, ["l_returnflag", col])
    return (
        d.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("r_q", "r_p"), 6).alias("rho_qty_price"),
            F.round(F.corr("r_q", "r_disc"), 6).alias("rho_qty_discount"),
            F.round(F.corr("r_p", "r_disc"), 6).alias("rho_price_discount"),
        )
        .orderBy("l_returnflag")
    )


SPEARMAN_SQL = """
WITH d AS (
  SELECT l_returnflag,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
           + (count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0 AS r_q,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
           + (count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0 AS r_p,
         rank() OVER (PARTITION BY l_returnflag ORDER BY l_discount)
           + (count(*) OVER (PARTITION BY l_returnflag, l_discount) - 1) / 2.0 AS r_disc
  FROM lineitem)
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       round(corr(r_q, r_p), 6) AS rho_qty_price,
       round(corr(r_q, r_disc), 6) AS rho_qty_discount,
       round(corr(r_p, r_disc), 6) AS rho_price_discount
FROM d
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def levene_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe (median-centered Levene) homogeneity-of-variance
    test across the event types' value distributions — the gate that
    must pass before pooled-variance tests (ab_test_analysis) are
    trustworthy. W = ((N−k)/(k−1))·Σnᵢ(z̄ᵢ−z̄)²/ΣΣ(zᵢⱼ−z̄ᵢ)² with
    zᵢⱼ = |xᵢⱼ − medianᵢ|; the flag compares W to 2.372 (the F(4,∞)
    5% critical value for these five groups — fixed constant, same on
    both engines).

    100 TB: two passes (group medians, then centered moments), both
    plain hash aggregates; medians broadcast back as a k-row frame."""
    ev = load_table(spark, "events", sf_dir).select("event_type", F.col("value").alias("x"))
    med = ev.groupBy("event_type").agg(F.median("x").alias("med"))
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    grp = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_i"),
        F.avg("z").alias("zbar_i"),
        F.sum(F.col("z") * F.col("z")).alias("zsq_i"),
    )
    res = grp.agg(
        F.sum("n_i").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("n_i") * F.col("zbar_i")).alias("sz"),
        F.sum(F.col("zsq_i") - F.col("n_i") * F.col("zbar_i") * F.col("zbar_i")).alias(
            "ss_within"
        ),
        F.sum(F.col("n_i") * F.col("zbar_i") * F.col("zbar_i")).alias("nzb2"),
    )
    w = (
        (F.col("n") - F.col("k"))
        / (F.col("k") - 1)
        * (F.col("nzb2") - F.col("sz") * F.col("sz") / F.col("n"))
        / F.col("ss_within")
    )
    return res.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(w, 6).alias("w_stat"),
        (w > 2.372).alias("heteroscedastic"),
    )


LEVENE_SQL = """
WITH med AS (
  SELECT event_type, median(value) AS med FROM events GROUP BY event_type),
z AS (
  SELECT e.event_type, abs(e.value - m.med) AS z
  FROM events e JOIN med m USING (event_type)),
grp AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_i, avg(z) AS zbar_i,
         sum(z * z) AS zsq_i
  FROM z GROUP BY event_type),
res AS (
  SELECT sum(n_i) AS n, CAST(count(*) AS DOUBLE) AS k,
         sum(n_i * zbar_i) AS sz,
         sum(zsq_i - n_i * zbar_i * zbar_i) AS ss_within,
         sum(n_i * zbar_i * zbar_i) AS nzb2
  FROM grp)
SELECT CAST(k AS BIGINT) AS n_groups,
       CAST(n AS BIGINT) AS n_obs,
       round((n - k) / (k - 1) * (nzb2 - sz * sz / n) / ss_within, 6) AS w_stat,
       (n - k) / (k - 1) * (nzb2 - sz * sz / n) / ss_within > 2.372
         AS heteroscedastic
FROM res
"""


def bayesian_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian bootstrap confidence interval for each event type's
    mean value: 32 deterministic replicates draw exponential weights
    w = −ln(u) from md5(event_id‖rep) uniforms (Rubin's Dirichlet-
    weight bootstrap — no resampling indices, so it distributes as a
    pure row-local expression), each replicate computes the weighted
    mean, and the 2.5%/97.5% quantiles of the 32 replicate means form
    the CI. Fully reproducible across engines and cluster sizes —
    df.sample's RNG can never give this.

    100 TB: one explode ×32 (constant), one (type, rep) weighted-mean
    aggregate, one 32-row quantile per type; no state, no iteration."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "event_type", F.col("value").alias("x")
    )
    reps = ev.select(
        "event_type", "x",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("rep"),
        F.col("event_id"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("event_id"), F.col("rep"))), 1, 8),
        16,
        10,
    ).cast("double")
    u = (h + 0.5) / F.lit(4294967296.0)
    wtd = reps.withColumn("w", -F.log(u))
    means = wtd.groupBy("event_type", "rep").agg(
        (F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("m")
    )
    return (
        means.groupBy("event_type")
        .agg(
            F.round(F.avg("m"), 6).alias("boot_mean"),
            F.round(F.expr("percentile(m, 0.025)"), 6).alias("ci_lo"),
            F.round(F.expr("percentile(m, 0.975)"), 6).alias("ci_hi"),
        )
        .orderBy("event_type")
    )


BAYES_BOOT_SQL = """
WITH reps AS (
  SELECT event_type, value AS x, event_id, unnest(generate_series(0, 31)) AS rep
  FROM events),
wtd AS (
  SELECT event_type, x, rep,
         -ln((('0x' || substr(md5(event_id || ':' || rep), 1, 8))::BIGINT + 0.5)
             / 4294967296.0) AS w
  FROM reps),
means AS (
  SELECT event_type, rep, sum(w * x) / sum(w) AS m
  FROM wtd GROUP BY event_type, rep)
SELECT event_type,
       round(avg(m), 6) AS boot_mean,
       round(quantile_cont(m, 0.025), 6) AS ci_lo,
       round(quantile_cont(m, 0.975), 6) AS ci_hi
FROM means
GROUP BY event_type
ORDER BY event_type
"""


def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation over the customer
    market segments: for a fixed budget of 1000 interviews, allocate
    n_h ∝ N_h·σ_h (population size × within-stratum stddev of account
    balance) — the design that minimizes the estimator variance —
    side by side with the naive proportional allocation N_h/N. The
    delta column shows where optimal sampling over- or under-weights
    a stratum vs proportional.

    100 TB: one hash aggregate per stratum + a 1-row broadcast of the
    normalizing sums; allocation math is per-stratum arithmetic."""
    c = load_table(spark, "customer", sf_dir)
    g = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("n_pop"),
        F.stddev_pop("c_acctbal").alias("sigma"),
    )
    tot = g.agg(
        F.sum(F.col("n_pop") * F.col("sigma")).alias("t_ns"),
        F.sum("n_pop").alias("t_n"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ney = F.round(1000 * F.col("n_pop") * F.col("sigma") / F.col("t_ns")).cast("bigint")
    prop = F.round(1000 * F.col("n_pop") / F.col("t_n")).cast("bigint")
    return j.select(
        "c_mktsegment",
        F.col("n_pop").cast("bigint").alias("n_pop"),
        F.round("sigma", 6).alias("sigma"),
        ney.alias("neyman_alloc"),
        prop.alias("proportional_alloc"),
        (ney - prop).alias("delta"),
    ).orderBy("c_mktsegment")


NEYMAN_SQL = """
WITH g AS (
  SELECT c_mktsegment, CAST(count(*) AS DOUBLE) AS n_pop,
         stddev_pop(c_acctbal) AS sigma
  FROM customer GROUP BY c_mktsegment),
tot AS (SELECT sum(n_pop * sigma) AS t_ns, sum(n_pop) AS t_n FROM g)
SELECT c_mktsegment,
       CAST(n_pop AS BIGINT) AS n_pop,
       round(sigma, 6) AS sigma,
       CAST(round(1000 * n_pop * sigma / t_ns) AS BIGINT) AS neyman_alloc,
       CAST(round(1000 * n_pop / t_n) AS BIGINT) AS proportional_alloc,
       CAST(round(1000 * n_pop * sigma / t_ns) AS BIGINT)
         - CAST(round(1000 * n_pop / t_n) AS BIGINT) AS delta
FROM g CROSS JOIN tot
ORDER BY c_mktsegment
"""


def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of event value across the five event types: F =
    (SSB/(k−1))/(SSW/(N−k)) plus the η² effect size (SSB/SST) — the
    parametric counterpart to the rank tests (mann_whitney_u) whose
    pooled-variance assumption levene_variance_test gates. The flag
    compares F to 2.372 (F(4,∞) at 5%, fixed constant both engines).

    100 TB: one per-group moment aggregate + a 1-row reduction —
    nothing touches rows twice."""
    ev = load_table(spark, "events", sf_dir).select("event_type", F.col("value").alias("x"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_i"),
        F.avg("x").alias("m_i"),
        F.sum(F.col("x") * F.col("x")).alias("xsq_i"),
    )
    r = g.agg(
        F.sum("n_i").alias("n"),
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum(F.col("n_i") * F.col("m_i")).alias("sx"),
        F.sum(F.col("n_i") * F.col("m_i") * F.col("m_i")).alias("nm2"),
        F.sum(F.col("xsq_i")).alias("xsq"),
    )
    ssb = F.col("nm2") - F.col("sx") * F.col("sx") / F.col("n")
    sst = F.col("xsq") - F.col("sx") * F.col("sx") / F.col("n")
    ssw = sst - ssb
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return r.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n").cast("bigint").alias("n_obs"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(ssb / sst, 6).alias("eta_sq"),
        (f_stat > 2.372).alias("significant_5pct"),
    )


ANOVA_SQL = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_i, avg(value) AS m_i,
         sum(value * value) AS xsq_i
  FROM events GROUP BY event_type),
r AS (
  SELECT sum(n_i) AS n, CAST(count(*) AS DOUBLE) AS k,
         sum(n_i * m_i) AS sx, sum(n_i * m_i * m_i) AS nm2, sum(xsq_i) AS xsq
  FROM g)
SELECT CAST(k AS BIGINT) AS n_groups,
       CAST(n AS BIGINT) AS n_obs,
       round(((nm2 - sx * sx / n) / (k - 1))
             / ((xsq - nm2) / (n - k)), 6) AS f_stat,
       round((nm2 - sx * sx / n) / (xsq - sx * sx / n), 6) AS eta_sq,
       ((nm2 - sx * sx / n) / (k - 1)) / ((xsq - nm2) / (n - k)) > 2.372
         AS significant_5pct
FROM r
"""


def tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparison of event-type means —
    what you run AFTER anova_oneway rejects: for each of the 10 type
    pairs, the mean difference against the honest-significant-
    difference threshold q·√(MSW/2·(1/nᵢ+1/nⱼ)) with q = 3.858 (the
    studentized-range 5% critical value for 5 groups, df=∞ — fixed
    constant both engines). Controls the family-wise error the 10
    naive t-tests would inflate.

    100 TB: group moments once, MSW as a 1-row broadcast, then a
    5×5 upper-triangle self-join of the 5-row means table."""
    ev = load_table(spark, "events", sf_dir).select("event_type", F.col("value").alias("x"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_i"),
        F.avg("x").alias("m_i"),
        F.sum(F.col("x") * F.col("x")).alias("xsq_i"),
    )
    msw = g.agg(
        (
            F.sum(F.col("xsq_i") - F.col("n_i") * F.col("m_i") * F.col("m_i"))
            / (F.sum("n_i") - F.count(F.lit(1)))
        ).alias("msw")
    )
    a, b = g.alias("a"), g.alias("b")
    pairs = a.join(b, F.col("a.event_type") < F.col("b.event_type")).crossJoin(
        F.broadcast(msw)
    )
    diff = F.abs(F.col("a.m_i") - F.col("b.m_i"))
    hsd = 3.858 * F.sqrt(
        F.col("msw") / 2.0 * (1.0 / F.col("a.n_i") + 1.0 / F.col("b.n_i"))
    )
    return pairs.select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.round(diff, 6).alias("mean_diff"),
        F.round(hsd, 6).alias("hsd_threshold"),
        (diff > hsd).alias("significant"),
    ).orderBy("type_a", "type_b")


TUKEY_HSD_SQL = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_i, avg(value) AS m_i,
         sum(value * value) AS xsq_i
  FROM events GROUP BY event_type),
msw AS (
  SELECT sum(xsq_i - n_i * m_i * m_i) / (sum(n_i) - count(*)) AS msw FROM g)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       round(abs(a.m_i - b.m_i), 6) AS mean_diff,
       round(3.858 * sqrt(msw.msw / 2.0 * (1.0 / a.n_i + 1.0 / b.n_i)), 6)
         AS hsd_threshold,
       abs(a.m_i - b.m_i)
         > 3.858 * sqrt(msw.msw / 2.0 * (1.0 / a.n_i + 1.0 / b.n_i)) AS significant
FROM g a JOIN g b ON a.event_type < b.event_type CROSS JOIN msw
ORDER BY type_a, type_b
"""


def partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of quantity and extended price CONTROLLING
    for discount: r_qp·d = (r_qp − r_qd·r_pd)/√((1−r_qd²)(1−r_pd²)) —
    the confounder-removal step that tells whether the raw
    quantity-price association survives holding the discount fixed
    (the column-level cousin of simpsons_paradox_audit's group-level
    check). Emits the three raw correlations and the partial.

    100 TB: ONE moment aggregate computes all three corr() pairs —
    a single pass, no joins."""
    li = load_table(spark, "lineitem", sf_dir)
    r = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.corr("l_quantity", "l_extendedprice").alias("r_qp"),
        F.corr("l_quantity", "l_discount").alias("r_qd"),
        F.corr("l_extendedprice", "l_discount").alias("r_pd"),
    )
    partial = (F.col("r_qp") - F.col("r_qd") * F.col("r_pd")) / F.sqrt(
        (1 - F.col("r_qd") * F.col("r_qd")) * (1 - F.col("r_pd") * F.col("r_pd"))
    )
    return r.select(
        F.col("n").cast("bigint").alias("n"),
        F.round("r_qp", 6).alias("r_qty_price"),
        F.round("r_qd", 6).alias("r_qty_discount"),
        F.round("r_pd", 6).alias("r_price_discount"),
        F.round(partial, 6).alias("partial_qty_price"),
    )


PARTIAL_CORR_SQL = """
WITH r AS (
  SELECT count(*) AS n,
         corr(l_quantity, l_extendedprice) AS r_qp,
         corr(l_quantity, l_discount) AS r_qd,
         corr(l_extendedprice, l_discount) AS r_pd
  FROM lineitem)
SELECT CAST(n AS BIGINT) AS n,
       round(r_qp, 6) AS r_qty_price,
       round(r_qd, 6) AS r_qty_discount,
       round(r_pd, 6) AS r_price_discount,
       round((r_qp - r_qd * r_pd)
             / sqrt((1 - r_qd * r_qd) * (1 - r_pd * r_pd)), 6)
         AS partial_qty_price
FROM r
"""


def negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit to each event type's
    hourly count distribution — the parametric follow-up to
    fano_factor_events: when var > mean, NB(r, p) with r = μ²/(σ²−μ),
    p = μ/σ² captures the overdispersion a Poisson model misses
    (capacity planning, synthetic-load generation, anomaly
    thresholds). Types with var ≤ mean report NULL r/p and
    poisson_ok = true — identically on both engines.

    100 TB: reuses the zero-filled hourly grid (calendar-bounded);
    the fit is a per-type moment aggregate."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    filled = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", F.coalesce("c", F.lit(0.0)).alias("c")
    )
    g = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.avg("c").alias("mu"),
        F.var_pop("c").alias("v"),
    )
    over = F.col("v") > F.col("mu")
    return g.select(
        "event_type",
        "n_hours",
        F.round("mu", 6).alias("mean_c"),
        F.round("v", 6).alias("var_c"),
        F.when(over, F.round(F.col("mu") * F.col("mu") / (F.col("v") - F.col("mu")), 6)).alias("nb_r"),
        F.when(over, F.round(F.col("mu") / F.col("v"), 6)).alias("nb_p"),
        (~over).alias("poisson_ok"),
    ).orderBy("event_type")


NEGBIN_FIT_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2),
span AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
filled AS (
  SELECT g.event_type, coalesce(hourly.c, 0.0) AS c
  FROM grid g LEFT JOIN hourly ON hourly.event_type = g.event_type AND hourly.h = g.h),
g AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
         avg(c) AS mu, var_pop(c) AS v
  FROM filled GROUP BY event_type)
SELECT event_type, n_hours,
       round(mu, 6) AS mean_c,
       round(v, 6) AS var_c,
       CASE WHEN v > mu THEN round(mu * mu / (v - mu), 6) END AS nb_r,
       CASE WHEN v > mu THEN round(mu / v, 6) END AS nb_p,
       NOT (v > mu) AS poisson_ok
FROM g
ORDER BY event_type
"""


def sprt_conversion_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability-ratio test (Wald) on the daily purchase
    share of events: H0 p=0.18 vs H1 p=0.22, cumulative LLR over days
    (purchases count log(p1/p0), non-purchases log((1−p1)/(1−p0))),
    decided at the classic ±log(19) boundaries (α=β=0.05) — the
    always-valid sequential gate that lets an experiment stop the day
    the evidence suffices instead of at a fixed horizon. Emits the
    boundary-crossing day and verdict.

    100 TB: one daily aggregate (calendar-bounded) + one running-sum
    window per ordered day; decisions are per-day expressions."""
    ev = load_table(spark, "events", sf_dir)
    p0, p1 = 0.18, 0.22
    import math

    l_s = math.log(p1 / p0)
    l_f = math.log((1 - p1) / (1 - p0))
    bound = math.log(19.0)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum((F.col("event_type") == "purchase").cast("double")).alias("s"),
        F.sum((F.col("event_type") != "purchase").cast("double")).alias("f"),
    )
    wseq = W.orderBy("d").rowsBetween(W.unboundedPreceding, W.currentRow)
    llr = daily.withColumn(
        "llr", F.sum(F.col("s") * l_s + F.col("f") * l_f).over(wseq)
    )
    return llr.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.max("llr"), 6).alias("max_llr"),
        F.round(F.min("llr"), 6).alias("min_llr"),
        F.min(F.when(F.col("llr") > bound, F.col("d"))).alias("accept_h1_day"),
        F.min(F.when(F.col("llr") < -bound, F.col("d"))).alias("accept_h0_day"),
        F.when(F.max("llr") > bound, F.lit("accept_h1"))
        .when(F.min("llr") < -bound, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("verdict"),
    )


SPRT_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END) AS s,
         sum(CASE WHEN event_type <> 'purchase' THEN 1.0 ELSE 0.0 END) AS f
  FROM events GROUP BY 1),
llr AS (
  SELECT d,
         sum(s * ln(0.22 / 0.18) + f * ln(0.78 / 0.82))
           OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
  FROM daily)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       round(max(llr), 6) AS max_llr,
       round(min(llr), 6) AS min_llr,
       min(CASE WHEN llr > ln(19.0) THEN d END) AS accept_h1_day,
       min(CASE WHEN llr < -ln(19.0) THEN d END) AS accept_h0_day,
       CASE WHEN max(llr) > ln(19.0) THEN 'accept_h1'
            WHEN min(llr) < -ln(19.0) THEN 'accept_h0'
            ELSE 'continue' END AS verdict
FROM llr
"""


def welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedasticity-robust one-way ANOVA across event
    types — the test to use when levene_variance_test REJECTS equal
    variances (anova_oneway's pooled MSW is then invalid): weights
    w_i = n_i/s_i², W* = Σw_i(m_i−m̄_w)²/(k−1) over the Welch
    denominator 1 + 2(k−2)/(k²−1)·Σ(1−w_i/Σw)²/(n_i−1). Everything
    derives from per-group (n, mean, variance) — one aggregate pass.

    100 TB: one per-group moment aggregate + a k-row reduction."""
    ev = load_table(spark, "events", sf_dir).select("event_type", F.col("value").alias("x"))
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_i"),
        F.avg("x").alias("m_i"),
        F.var_samp("x").alias("s2_i"),
    )
    g = g.withColumn("w_i", F.col("n_i") / F.col("s2_i"))
    tot = g.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("w_i").alias("sw"),
        F.sum(F.col("w_i") * F.col("m_i")).alias("swm"),
    )
    j = g.crossJoin(F.broadcast(tot)).withColumn("mw", F.col("swm") / F.col("sw"))
    r = j.agg(
        F.max("k").alias("k"),
        F.sum(F.col("n_i")).cast("bigint").alias("n_obs"),
        F.sum(F.col("w_i") * (F.col("m_i") - F.col("mw")) * (F.col("m_i") - F.col("mw"))).alias(
            "num"
        ),
        F.sum(
            (1 - F.col("w_i") / F.col("sw"))
            * (1 - F.col("w_i") / F.col("sw"))
            / (F.col("n_i") - 1)
        ).alias("lam"),
    )
    wstar = (F.col("num") / (F.col("k") - 1)) / (
        1 + 2 * (F.col("k") - 2) / (F.col("k") * F.col("k") - 1) * F.col("lam")
    )
    return r.select(
        F.col("k").cast("bigint").alias("n_groups"),
        "n_obs",
        F.round(wstar, 6).alias("welch_f"),
        (wstar > 2.372).alias("significant_5pct"),
    )


WELCH_ANOVA_SQL = """
WITH g AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n_i, avg(value) AS m_i,
         var_samp(value) AS s2_i
  FROM events GROUP BY event_type),
w AS (SELECT *, n_i / s2_i AS w_i FROM g),
tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS k, sum(w_i) AS sw,
         sum(w_i * m_i) AS swm
  FROM w),
r AS (
  SELECT max(tot.k) AS k,
         CAST(sum(w.n_i) AS BIGINT) AS n_obs,
         sum(w.w_i * (w.m_i - tot.swm / tot.sw) * (w.m_i - tot.swm / tot.sw)) AS num,
         sum((1 - w.w_i / tot.sw) * (1 - w.w_i / tot.sw) / (w.n_i - 1)) AS lam
  FROM w CROSS JOIN tot)
SELECT CAST(k AS BIGINT) AS n_groups, n_obs,
       round((num / (k - 1))
             / (1 + 2 * (k - 2) / (k * k - 1) * lam), 6) AS welch_f,
       (num / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * lam) > 2.372
         AS significant_5pct
FROM r
"""


def wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test of paired daily means: click vs view
    value on the SAME calendar day (pairing removes the day effect —
    the within-subject companion to mann_whitney_u's unpaired test):
    rank |diff| with average ranks over the O(days) paired table,
    W+ = Σ ranks of positive diffs, z = (W+−μ)/σ with
    μ = n(n+1)/4, σ = √(n(n+1)(2n+1)/24). Zero diffs drop per the
    standard procedure.

    100 TB: pairing happens on the calendar-bounded daily aggregate,
    so the ranking window walks O(days) rows (plan-lint allowlisted
    global window over the bounded series)."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(F.avg("value").alias("m"))
        .groupBy("d")
        .pivot("event_type", ["click", "view"])
        .agg(F.first("m"))
    )
    diffs = daily.where(
        F.col("click").isNotNull() & F.col("view").isNotNull()
    ).select("d", (F.col("click") - F.col("view")).alias("diff"))
    nz = diffs.where(F.col("diff") != 0).select(
        "d", "diff", F.abs("diff").alias("ad")
    )
    wr = W.orderBy("ad")
    wt = W.partitionBy("ad")
    ranked = nz.withColumn(
        "r", F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0
    )
    r = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.when(F.col("diff") > 0, F.col("r")).otherwise(0.0)).alias("w_plus"),
    )
    mu = F.col("n") * (F.col("n") + 1) / 4.0
    sig = F.sqrt(F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1) / 24.0)
    z = (F.col("w_plus") - mu) / sig
    return r.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round("w_plus", 2).alias("w_plus"),
        F.round(z, 6).alias("z_score"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )


WILCOXON_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, event_type, avg(value) AS m
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2),
paired AS (
  SELECT c.d, c.m - v.m AS diff
  FROM (SELECT d, m FROM daily WHERE event_type = 'click') c
  JOIN (SELECT d, m FROM daily WHERE event_type = 'view') v USING (d)),
nz AS (SELECT d, diff, abs(diff) AS ad FROM paired WHERE diff <> 0),
ranked AS (
  SELECT *, rank() OVER (ORDER BY ad)
           + (count(*) OVER (PARTITION BY ad) - 1) / 2.0 AS r
  FROM nz),
res AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CASE WHEN diff > 0 THEN r ELSE 0.0 END) AS w_plus
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_pairs,
       round(w_plus, 2) AS w_plus,
       round((w_plus - n * (n + 1) / 4.0)
             / sqrt(n * (n + 1) * (2 * n + 1) / 24.0), 6) AS z_score,
       abs((w_plus - n * (n + 1) / 4.0)
           / sqrt(n * (n + 1) * (2 * n + 1) / 24.0)) > 1.96 AS significant_95
FROM res
"""


def wilson_lb_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-score lower-bound ranking of per-part return rates —
    the correct way to rank proportions with unequal sample sizes (a
    raw rate ranks a 1/1 part above a 99/100 part; the 95% lower
    bound does not): LB = (p̂ + z²/2n − z√(p̂(1−p̂)/n + z²/4n²)) /
    (1 + z²/n), z = 1.96. Top 15 parts by lower bound with ≥ 20
    lines — the same estimator ranks documents by flag rate or
    sources by defect rate in a corpus-QA pipeline.

    100 TB: one per-part aggregate, a closed-form projection, and a
    TakeOrdered — the word-count shape."""
    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("double")).alias("r"),
    ).where(F.col("n") >= 20)
    z = 1.96
    p = F.col("r") / F.col("n")
    z2n = z * z / F.col("n")
    lb = (p + z2n / 2 - z * F.sqrt((p * (1 - p) + z2n / 4) / F.col("n"))) / (1 + z2n)
    return (
        g.select(
            "l_partkey",
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("r").cast("bigint").alias("n_returned"),
            F.round(p, 6).alias("raw_rate"),
            F.round(lb, 6).alias("wilson_lb"),
        )
        .orderBy(F.col("wilson_lb").desc(), "l_partkey")
        .limit(15)
    )


WILSON_LB_SQL = """
WITH g AS (
  SELECT l_partkey, CAST(count(*) AS DOUBLE) AS n,
         sum(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END) AS r
  FROM lineitem GROUP BY l_partkey
  HAVING count(*) >= 20)
SELECT l_partkey,
       CAST(n AS BIGINT) AS n_lines,
       CAST(r AS BIGINT) AS n_returned,
       round(r / n, 6) AS raw_rate,
       round((r / n + (1.96 * 1.96 / n) / 2
              - 1.96 * sqrt((r / n * (1 - r / n) + (1.96 * 1.96 / n) / 4) / n))
             / (1 + 1.96 * 1.96 / n), 6) AS wilson_lb
FROM g
ORDER BY wilson_lb DESC, l_partkey
LIMIT 15
"""


def chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between document language and
    source, with Cramér's V effect size — the contingency-table
    check that a corpus's language mix is (or is not) uniform across
    providers, the categorical cousin of the numeric drift gates
    (feature_drift_psi, ks_two_sample). χ² = ΣΣ(o−e)²/e with
    e = row·col/N; V = √(χ²/(N·min(r−1,c−1))); the flag compares χ²
    to the fixed 5% critical value for the (r−1)(c−1) grid computed
    here (57 df → 75.62, constant both engines at this schema).

    100 TB: one (lang, source) count + two broadcast margins; the
    test is a cell-level projection and one reduction."""
    docs = load_table(spark, "documents", sf_dir)
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("double").alias("o"))
    rm = obs.groupBy("lang").agg(F.sum("o").alias("row_n"))
    cm = obs.groupBy("source").agg(F.sum("o").alias("col_n"))
    n = obs.agg(
        F.sum("o").alias("n"),
        F.countDistinct("lang").cast("double").alias("r"),
        F.countDistinct("source").cast("double").alias("c"),
    )
    j = (
        obs.join(F.broadcast(rm), "lang")
        .join(F.broadcast(cm), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("e", F.col("row_n") * F.col("col_n") / F.col("n"))
    )
    res = j.agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("r").alias("r"),
        F.max("c").alias("c"),
        F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")).alias(
            "chi2"
        ),
    )
    v = F.sqrt(
        F.col("chi2") / (F.col("n_docs") * F.least(F.col("r") - 1, F.col("c") - 1))
    )
    return res.select(
        "n_docs",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(v, 6).alias("cramers_v"),
    )


CHI2_INDEPENDENCE_SQL = """
WITH obs AS (
  SELECT lang, source, CAST(count(*) AS DOUBLE) AS o
  FROM documents GROUP BY lang, source),
rm AS (SELECT lang, sum(o) AS row_n FROM obs GROUP BY lang),
cm AS (SELECT source, sum(o) AS col_n FROM obs GROUP BY source),
n AS (
  SELECT sum(o) AS n,
         CAST(count(DISTINCT lang) AS DOUBLE) AS r,
         CAST(count(DISTINCT source) AS DOUBLE) AS c
  FROM obs),
j AS (
  SELECT obs.o, rm.row_n * cm.col_n / n.n AS e, n.n, n.r, n.c
  FROM obs JOIN rm USING (lang) JOIN cm USING (source) CROSS JOIN n),
res AS (
  SELECT CAST(max(n) AS BIGINT) AS n_docs, max(r) AS r, max(c) AS c,
         sum((o - e) * (o - e) / e) AS chi2
  FROM j)
SELECT n_docs,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       round(chi2, 6) AS chi2,
       round(sqrt(chi2 / (n_docs * least(r - 1, c - 1))), 6) AS cramers_v
FROM res
"""


def kendall_tau_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's τ-b between quantity and discount per return flag,
    computed from the (quantity × discount) CONTINGENCY GRID instead
    of row pairs: both columns are heavily quantized (≤ ~50 × ~11
    cells), so concordant/discordant counts come from a grid
    self-join — O(cells²) work independent of row count, where the
    naive pair formulation is O(n²). τ-b's tie terms come from the
    same margins. The rank-correlation companion to
    spearman_corr_matrix with exact tie handling.

    100 TB: one grid aggregate (map-side combined), then a
    cells²-sized join per flag — constant-bounded; nothing touches
    rows twice."""
    li = load_table(spark, "lineitem", sf_dir)
    g = li.groupBy(
        "l_returnflag",
        F.col("l_quantity").alias("q"),
        F.col("l_discount").alias("d"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    a, b = g.alias("a"), g.alias("b")
    pj = a.join(b, F.col("a.l_returnflag") == F.col("b.l_returnflag")).select(
        F.col("a.l_returnflag").alias("flag"),
        F.col("a.c").alias("ca"),
        F.col("b.c").alias("cb"),
        F.signum(F.col("b.q") - F.col("a.q")).alias("sq"),
        F.signum(F.col("b.d") - F.col("a.d")).alias("sd"),
    )
    agg = pj.groupBy("flag").agg(
        (F.sum(F.when(F.col("sq") * F.col("sd") > 0, F.col("ca") * F.col("cb")).otherwise(0.0)) / 2).alias("conc"),
        (F.sum(F.when(F.col("sq") * F.col("sd") < 0, F.col("ca") * F.col("cb")).otherwise(0.0)) / 2).alias("disc"),
        (F.sum(F.when((F.col("sq") == 0) & (F.col("sd") != 0), F.col("ca") * F.col("cb")).otherwise(0.0)) / 2).alias("tq"),
        (F.sum(F.when((F.col("sd") == 0) & (F.col("sq") != 0), F.col("ca") * F.col("cb")).otherwise(0.0)) / 2).alias("td"),
    )
    denom = F.sqrt(
        (F.col("conc") + F.col("disc") + F.col("tq"))
        * (F.col("conc") + F.col("disc") + F.col("td"))
    )
    tau = (F.col("conc") - F.col("disc")) / denom
    return agg.select(
        F.col("flag").alias("l_returnflag"),
        F.col("conc").cast("bigint").alias("concordant"),
        F.col("disc").cast("bigint").alias("discordant"),
        F.round(tau, 6).alias("kendall_tau_b"),
    ).orderBy("l_returnflag")


KENDALL_TAU_SQL = """
WITH g AS (
  SELECT l_returnflag, l_quantity AS q, l_discount AS d,
         CAST(count(*) AS DOUBLE) AS c
  FROM lineitem GROUP BY 1, 2, 3),
pj AS (
  SELECT a.l_returnflag AS flag, a.c AS ca, b.c AS cb,
         sign(b.q - a.q) AS sq, sign(b.d - a.d) AS sd
  FROM g a JOIN g b ON a.l_returnflag = b.l_returnflag),
agg AS (
  SELECT flag,
         sum(CASE WHEN sq * sd > 0 THEN ca * cb ELSE 0.0 END) / 2 AS conc,
         sum(CASE WHEN sq * sd < 0 THEN ca * cb ELSE 0.0 END) / 2 AS disc,
         sum(CASE WHEN sq = 0 AND sd <> 0 THEN ca * cb ELSE 0.0 END) / 2 AS tq,
         sum(CASE WHEN sd = 0 AND sq <> 0 THEN ca * cb ELSE 0.0 END) / 2 AS td
  FROM pj GROUP BY flag)
SELECT flag AS l_returnflag,
       CAST(conc AS BIGINT) AS concordant,
       CAST(disc AS BIGINT) AS discordant,
       round((conc - disc) / sqrt((conc + disc + tq) * (conc + disc + td)), 6)
         AS kendall_tau_b
FROM agg
ORDER BY l_returnflag
"""

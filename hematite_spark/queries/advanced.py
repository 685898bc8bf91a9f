"""Advanced relational surface (SURVEY.md §2 B, depth pass):
correlated subquery shapes (EXISTS / IN / scalar — the TPC-H Q4, Q17,
Q18, Q22 patterns adapted to the testdata's columns), disjunctive
predicate pushdown (Q19), conditional aggregation (Q14), GROUPING
SETS, exact percentiles, statistical aggregates, and the window
frames the base module doesn't cover (RANGE frames, ntile /
percent_rank / cume_dist).

The reference has none of these (its only query algebra is positional,
SURVEY.md §2 A); they complete the B-series checklist. Spark side is
written *decorrelated* — semi/anti joins and pre-aggregated join
inputs — which is the plan Catalyst's subquery decorrelation produces
anyway; the DuckDB oracle keeps the textbook correlated-subquery SQL,
so the equivalence is checked, not assumed.

Scale notes:
* every scalar subquery (one-row aggregate) rides a broadcast cross
  join — no shuffle, no driver round-trip;
* EXISTS/IN become left-semi joins on the correlation key: one
  shuffle each side, map-side-combined pre-aggregation where the
  probe is an aggregate (Q18);
* RANGE window frames bound state by the frame width, not the
  partition length — the streaming-friendly formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table


# ------------------------------------------------------- subquery shapes


def q4_exists_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS: count orders (by priority)
    having at least one line item shipped >60 days after the order
    date. Decorrelated to a left-semi join on (orderkey, date
    predicate): the semi join dedups matches before the aggregate, so
    the shuffle carries each qualifying order once."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional aggregation over a broadcast
    join: % of one month's revenue from PROMO parts. part is O(SF·2k)
    rows → broadcast; lineitem's month predicate pushes to the scan;
    the answer is one row, so no final shuffle survives AQE."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        F.round(
            100 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))) / F.sum(rev), 4
        ).alias("promo_revenue")
    )


Q14_PROMO_SQL = """
SELECT round(100 * sum(CASE WHEN p_type = 'PROMO'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery: revenue from
    Brand#13 line items whose quantity is below 20% of that part's
    average. Decorrelated: the per-part average is a pre-aggregate
    joined back on partkey (one extra shuffle of O(parts) rows —
    vastly cheaper than re-scanning lineitem per part, and exactly
    what Catalyst rewrites the correlated form into)."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).where(F.col("p_brand") == "Brand#13").select("p_partkey")
    thr = li.groupBy("l_partkey").agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(thr.withColumnRenamed("l_partkey", "t_partkey"), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


Q17_SCALAR_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — IN over an aggregate (HAVING) subquery:
    customers whose order exceeds 200 total units. The probe side is
    pre-aggregated lineitem (map-side combine shrinks it before the
    shuffle); the IN becomes a join against that aggregate, and the
    final top-100 is TakeOrderedAndProject — no global sort."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("sum_qty") > 200)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


Q18_IN_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_totalprice, round(sum(l_quantity), 2) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR-of-ANDs join predicate. The shared
    conjunct (the partkey equality) stays the join key so the
    disjunction is a post-join filter, not a nested-loop condition;
    part broadcasts. Catalyst also derives the `p_size <= 35 AND
    l_quantity >= 5` superset predicate and pushes it to both scans."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    disj = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 5))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 25) & (F.col("l_quantity") >= 15))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 35) & (F.col("l_quantity") >= 25))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(disj)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q19_DISJ_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND ((p_brand = 'Brand#1' AND p_size <= 15 AND l_quantity >= 5)
    OR (p_brand = 'Brand#2' AND p_size <= 25 AND l_quantity >= 15)
    OR (p_brand = 'Brand#3' AND p_size <= 35 AND l_quantity >= 25))
"""


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — anti join + uncorrelated scalar subquery:
    per-nation count/balance of above-average-balance customers who
    never ordered. The global average is a one-row aggregate broadcast
    into a cross join (no driver collect); "never ordered" is a
    left-anti join on custkey."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select("o_custkey")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


Q22_ANTI_SQL = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# ------------------------------------------------- grouping sets / stats


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize:
    revenue by (flag,status), by (flag), and the grand total, in one
    pass. Spark expands the sets with a single Expand operator (one
    scan, one shuffle); `grouping_id` disambiguates the NULLs that
    mark rolled-up dimensions."""
    li = load_table(spark, "lineitem", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
"""


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) of order value
    per order status — `percentile` is Spark's exact sort-based
    implementation, the same linear interpolation as SQL
    percentile_cont / DuckDB quantile_cont. At 100 TB the approx_*
    sketch variants replace these; the exact form is the oracle."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_PERCENTILES_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


def agg_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance
    of price, quantity-price correlation. Single-pass co-moment
    aggregation (partial+final); rounded to 4 decimals so the
    merge-order difference between engines cannot surface."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
            # covar is O(1e-6) here; round in micro-units (stable digits)
            # and add +0.0 so -0.0 and 0.0 normalize identically
            (F.round(F.covar_samp("l_discount", "l_tax") * 1e6, 2) + F.lit(0.0)).alias(
                "covar_micro"
            ),
        )
        .orderBy("l_returnflag")
    )


AGG_STATISTICS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_extendedprice), 4) AS stddev_price,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
       round(covar_samp(l_discount, l_tax) * 1e6, 2) + 0.0 AS covar_micro
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --------------------------------------------------------- window frames


def window_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user trailing-1-hour moving
    average of event value. RANGE frames bound window state by the
    frame width (1 h of rows), not partition length — unlike an
    unbounded running total, this survives unboundedly long user
    histories, and is the batch twin of a sliding stream window."""
    ev = load_table(spark, "events", sf_dir)
    sec = F.unix_timestamp("ts")
    w = W.partitionBy("user_id").orderBy(sec).rangeBetween(-3600, 0)
    return (
        ev.select(
            "event_id",
            "user_id",
            sec.alias("sec"),
            F.round(F.avg("value").over(w), 4).alias("avg_1h"),
            F.count("*").over(w).alias("n_1h"),
        )
        .orderBy("event_id")
    )


WINDOW_RANGE_SQL = """
SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       round(avg(value) OVER w, 4) AS avg_1h,
       count(*) OVER w AS n_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — ntile quartiles, percent_rank,
    cume_dist — of customer balance within market segment. The order
    key includes custkey so ranks are total (no peer ambiguity between
    engines)."""
    cust = load_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


WINDOW_RANK_SQL = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       ntile(4) OVER w AS balance_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey
"""


def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating two-phase aggregation: l_returnflag has only 3
    values, so a naive groupBy funnels the whole table through 3
    reducers. Salting fans phase 1 out to key×16 partial groups, and
    phase 2 merges the 48 partials — the manual form of what AQE's
    skew handling does for joins, written out because skewed
    AGGREGATION keys at 100 TB (one hot tenant, one hot event type)
    need it as a deliberate pattern. The salt is internal; results
    are identical to the plain aggregate, which is what the oracle
    checks."""
    li = load_table(spark, "lineitem", sf_dir)
    salted = li.withColumn("salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("p_qty"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("p_rev"),
        F.count("*").alias("p_n"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("p_qty"), 2).alias("sum_qty"),
            F.round(F.sum("p_rev"), 2).alias("revenue"),
            F.sum("p_n").alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


AGG_SALTED_SQL = """
SELECT l_returnflag,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bidirectional nation-pair join: shipping
    volume between NATION_1 and NATION_2 (either direction) by year.
    The disjunctive pair predicate evaluates after two broadcast
    nation joins (nation is O(25) rows at any SF); the fact-side
    customer⋈orders⋈lineitem⋈supplier chain shuffles on its keys.
    Six tables, one year dimension — the classic plan-shape stressor
    for join reordering."""
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir)
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_TRADE_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem, supplier, orders, customer, nation n1, nation n2
WHERE l_suppkey = s_suppkey
  AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND s_nationkey = n1.n_nationkey
  AND c_nationkey = n2.n_nationkey
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market-share ratio: NATION_1 suppliers' share
    of revenue within region 0's customer market, per year. The share
    is a conditional-sum / total-sum ratio inside one aggregate (no
    second pass); region/nation broadcast, fact chain shuffles once."""
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(F.col("r_regionkey") == 0)
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir)
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(rev), 2).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


Q8_SHARE_SQL = """
SELECT CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_1'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem, supplier, orders, customer, nation n1, nation n2, region
WHERE l_suppkey = s_suppkey
  AND l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r_regionkey
  AND r_regionkey = 0
  AND s_nationkey = n2.n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


def join_band_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join (pure inequality predicate, no equi key): count the
    customers whose account balance lies within ±0.5 of each
    supplier's. Written naively this is a nested-loop cross product —
    O(suppliers × customers), the join shape that does NOT survive
    scale-up. The engine rewrites it as an equi-join: bucket both
    sides by floor(acctbal) (bucket width 1.0 ≥ band width), explode
    the supplier side into its 3 admissible buckets, equi-join on the
    bucket, then apply the exact band filter post-match. Each
    (supplier, customer) pair meets in exactly one bucket (the
    customer's), so no dedup is needed — and the join shuffles on a
    dense numeric key instead of comparing every pair. The oracle
    runs the textbook inequality join, so the rewrite is checked, not
    assumed."""
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_acctbal")
    cust = load_table(spark, "customer", sf_dir).select("c_acctbal")
    s = supp.select(
        "s_suppkey",
        "s_acctbal",
        F.explode(
            F.array(
                F.floor("s_acctbal") - 1, F.floor("s_acctbal"), F.floor("s_acctbal") + 1
            )
        ).alias("bucket"),
    )
    c = cust.select("c_acctbal", F.floor("c_acctbal").alias("bucket"))
    return (
        s.join(c, "bucket")
        .where(F.abs(F.col("s_acctbal") - F.col("c_acctbal")) <= 0.5)
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_close_customers"))
        .orderBy("s_suppkey")
    )


JOIN_BAND_SQL = """
SELECT s_suppkey, count(*) AS n_close_customers
FROM supplier JOIN customer
  ON abs(s_acctbal - c_acctbal) <= 0.5
GROUP BY s_suppkey
ORDER BY s_suppkey
"""


def join_salted_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defeating salted join — the join-side twin of
    agg_salted_twophase: orders⋈customer revenue per market segment,
    with the build side REPLICATED across 8 salt values and the probe
    side salted deterministically, so a hot customer's rows spread
    over 8 reducers instead of one. This is the manual form of AQE's
    skew-join split, written out because (a) AQE only splits
    post-shuffle partitions, not a single hot KEY's hash bucket, and
    (b) at 100 TB one hot tenant routinely exceeds a whole executor.
    The salt is internal (derived from the probe row's own key, so
    it is deterministic); results are identical to the plain join,
    which is what the oracle checks."""
    n_salt = 8
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    orders = load_table(spark, "orders", sf_dir).select("o_custkey", "o_orderkey", "o_totalprice")
    salted_build = cust.crossJoin(
        spark.range(n_salt).select(F.col("id").cast("int").alias("salt"))
    )
    salted_probe = orders.withColumn(
        "salt", F.pmod(F.hash("o_orderkey"), F.lit(n_salt)).cast("int")
    )
    return (
        salted_probe.join(
            salted_build,
            (F.col("o_custkey") == F.col("c_custkey")) & (salted_probe.salt == salted_build.salt),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


JOIN_SALTED_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis (view → click → purchase): per user,
    the earliest view, the earliest click strictly AFTER that view,
    and the earliest purchase strictly after that click — the classic
    product-analytics shape (MATCH_RECOGNIZE-lite) expressed as three
    chained min-aggregates, each stage filtering on the previous
    stage's timestamp. Emits one summary row with stage counts and
    conversion rates.

    Scale: each stage is one groupBy(user_id) min — the shuffles are
    all on the SAME key, so Catalyst reuses the partitioning across
    stages instead of re-shuffling; stage outputs are O(users) and
    shrink monotonically. No window over the full event log, no
    per-user event sorting."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    v = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    total = ev.agg(F.countDistinct("user_id").alias("n_users"))
    n1 = v.agg(F.count("*").alias("n_viewed"))
    n2 = c.agg(F.count("*").alias("n_clicked"))
    n3 = p.agg(F.count("*").alias("n_purchased"))
    return (
        total.crossJoin(n1)
        .crossJoin(n2)
        .crossJoin(n3)
        .select(
            "n_users",
            "n_viewed",
            "n_clicked",
            "n_purchased",
            F.round(F.col("n_clicked") / F.col("n_viewed"), 6).alias("view_to_click"),
            F.round(F.col("n_purchased") / F.col("n_clicked"), 6).alias("click_to_purchase"),
            F.round(F.col("n_purchased") / F.col("n_users"), 6).alias("overall"),
        )
    )


FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
       (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked,
       (SELECT count(*) FROM p) AS n_purchased,
       round((SELECT count(*) FROM c) / CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS view_to_click,
       round((SELECT count(*) FROM p) / CAST((SELECT count(*) FROM c) AS DOUBLE), 6) AS click_to_purchase,
       round((SELECT count(*) FROM p) / CAST((SELECT count(DISTINCT user_id) FROM events) AS DOUBLE), 6) AS overall
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by the week of their
    first event (the cohort), counted in each subsequent week they
    were active — the (cohort_week, week_offset) → active-users table
    every growth dashboard draws. Pure two-aggregate shape: first-seen
    per user, then distinct (user, week) activity joined back to the
    cohort assignment.

    Scale: both aggregates key on user_id (partitioning reuse); the
    activity set is distinct-compressed BEFORE the join so the join
    input is O(users × weeks), not O(events). The cohort table is
    O(users) and the final matrix O(weeks²) — tiny at any corpus
    size."""
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts")
    cohort = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("bigint").alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_SQL = """
WITH cohort AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
       count(*) AS n_active_users
FROM activity JOIN cohort USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


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


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order),
    frequency (order count), monetary (lifetime spend) quartiled into
    a 3-digit segment code — the behavioral-cohort builder marketing
    pipelines run over the orders fact.

    The window input is the pre-aggregated CUSTOMER dim (one row per
    customer — orders of magnitude smaller than the fact table), so
    the ntile pass is cheap; the fact-table work is one
    map-side-combined groupBy. At extreme customer counts the ntile
    swaps for broadcast quantile boundaries with identical outputs.
    Ties are broken on custkey so both engines assign identical
    quartiles."""
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    # "now" = the corpus max order date, taken over the already-built
    # customer dim (max of per-customer maxes) so the fact table is
    # scanned exactly once
    now = F.max("last_order").over(W.partitionBy())
    rfm = per_cust.select(
        "o_custkey",
        F.datediff(now, F.col("last_order")).cast("bigint").alias("recency_days"),
        "frequency",
        "monetary",
    )
    r = F.ntile(4).over(W.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
    f = F.ntile(4).over(W.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
    m = F.ntile(4).over(W.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
    return (
        rfm.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            r.cast("bigint").alias("r_score"),
            f.cast("bigint").alias("f_score"),
            m.cast("bigint").alias("m_score"),
        )
        .withColumn(
            "segment",
            (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")).cast("bigint"),
        )
        .orderBy("o_custkey")
    )


RFM_SQL = """
WITH per_cust AS (
  SELECT o_custkey,
         max(o_orderdate) AS last_order,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey
), rfm AS (
  SELECT o_custkey,
         CAST(date_diff('day', last_order, max(last_order) OVER ()) AS BIGINT) AS recency_days,
         frequency, monetary
  FROM per_cust
), scored AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS BIGINT) AS r_score,
         CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f_score,
         CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m_score
  FROM rfm
)
SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
       r_score * 100 + f_score * 10 + m_score AS segment
FROM scored
ORDER BY o_custkey
"""


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


_FUZZY_W = 64  # sorted-neighborhood half-width (bucket size)


def fuzzy_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by blocked SORTED-NEIGHBORHOOD fuzzy match:
    for every part, the closest OTHER part by name edit distance,
    searched among its ±64 name-sorted neighbors WITHIN the name's
    last-word block — the record-linkage shape (block → sort →
    windowed compare → best match). Plain blocking alone is a scale
    trap: a fixed-cardinality block key makes the pair space grow
    QUADRATICALLY with the corpus (measured by tools/scale_slope.py:
    124× wall on 10× data before this neighborhood bound). The
    sorted-neighborhood band caps pairs at O(n·w) regardless of block
    size; the band itself is the bucketed equi-join trick from
    join_band_inequality (each row probes its own rank-bucket and
    both neighbors — never block²). levenshtein() is JVM-side in
    Spark and native in DuckDB — the identical metric, so best-match
    verdicts are value-checked. Ties break on (distance, partner
    key)."""
    part = load_table(spark, "part", sf_dir)
    w_rank = W.partitionBy("blk").orderBy(F.col("p_name").asc(), F.col("p_partkey").asc())
    v = (
        part.select(
            "p_partkey",
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("blk"),
        )
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .localCheckpoint()  # ranked once; feeds both sides of the band join
    )
    # probe side: each row addresses its own rank-bucket and both
    # neighbors; build side keyed by its single bucket
    probe = v.select(
        "p_partkey",
        "p_name",
        "blk",
        "rnk",
        F.explode(
            F.array(
                (F.floor(F.col("rnk") / _FUZZY_W) - 1),
                F.floor(F.col("rnk") / _FUZZY_W),
                (F.floor(F.col("rnk") / _FUZZY_W) + 1),
            )
        ).alias("bkt"),
    )
    build = v.select(
        F.col("p_partkey").alias("match_key"),
        F.col("p_name").alias("match_name"),
        F.col("blk").alias("b_blk"),
        F.col("rnk").alias("b_rnk"),
        F.floor(F.col("rnk") / _FUZZY_W).alias("b_bkt"),
    )
    pairs = (
        probe.join(
            build,
            (F.col("blk") == F.col("b_blk")) & (F.col("bkt") == F.col("b_bkt")),
        )
        .where(
            (F.col("p_partkey") != F.col("match_key"))
            & (F.abs(F.col("rnk") - F.col("b_rnk")) <= _FUZZY_W)
        )
        .select(
            "p_partkey",
            "p_name",
            "match_key",
            "match_name",
            F.levenshtein(F.col("p_name"), F.col("match_name")).cast("bigint").alias("distance"),
        )
    )
    w_best = W.partitionBy("p_partkey").orderBy(F.col("distance").asc(), F.col("match_key").asc())
    return (
        pairs.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select("p_partkey", "p_name", "match_key", "match_name", "distance")
        .orderBy("p_partkey")
    )


FUZZY_MATCH_SQL = f"""
WITH v AS (
  SELECT p_partkey, p_name, blk,
         row_number() OVER (PARTITION BY blk ORDER BY p_name ASC, p_partkey ASC)::BIGINT AS rnk
  FROM (SELECT p_partkey, p_name, string_split(p_name, ' ')[-1] AS blk FROM part)
), probe AS (
  SELECT p_partkey, p_name, blk, rnk, (rnk // {_FUZZY_W}) + d AS bkt
  FROM v, (SELECT unnest([-1, 0, 1]) AS d)
), pairs AS (
  SELECT a.p_partkey, a.p_name, b.p_partkey AS match_key, b.p_name AS match_name,
         CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
  FROM probe a JOIN v b
    ON a.blk = b.blk AND a.bkt = (b.rnk // {_FUZZY_W})
  WHERE a.p_partkey <> b.p_partkey AND abs(a.rnk - b.rnk) <= {_FUZZY_W}
), best AS (
  SELECT *, row_number() OVER (PARTITION BY p_partkey
                               ORDER BY distance ASC, match_key ASC) AS rn
  FROM pairs
)
SELECT p_partkey, p_name, match_key, match_name, distance
FROM best WHERE rn = 1
ORDER BY p_partkey
"""


def basket_item_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: support/confidence/lift for part pairs
    co-occurring in an order — the co-occurrence statistic behind
    recommenders and complement detection. Pairs are generated
    WITHIN basket only (equi-join on orderkey, a < b), so the pair
    space is Σ basket², bounded by basket size — never corpus²; at
    100 TB the orderkey is the partition key and a pathological mega
    basket is the only skew, handled by the same salting pattern as
    the hot-key join. Baskets dedup (order, part) first so repeated
    lines don't inflate counts. Lift > 1 ⇒ the pair co-occurs more
    than independence predicts."""
    li = load_table(spark, "lineitem", sf_dir)
    basket = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = basket.select("l_orderkey").distinct().agg(F.count("*").alias("n_orders"))
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("item_cnt"))
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("item_cnt").alias("cnt_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("item_cnt").alias("cnt_b"))
    return (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.round(
                (F.col("pair_cnt") * F.col("n_orders"))
                / (F.col("cnt_a") * F.col("cnt_b")),
                4,
            ).alias("lift"),
            F.round(F.col("pair_cnt") / F.col("cnt_a"), 4).alias("confidence_a_to_b"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(50)
    )


BASKET_AFFINITY_SQL = """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM basket),
item AS (SELECT l_partkey, count(*) AS item_cnt FROM basket GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_cnt
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY part_a, part_b
  HAVING count(*) >= 3
)
SELECT part_a, part_b, pair_cnt,
       round((pair_cnt * n_orders) / CAST(ia.item_cnt * ib.item_cnt AS DOUBLE), 4) AS lift,
       round(pair_cnt / CAST(ia.item_cnt AS DOUBLE), 4) AS confidence_a_to_b
FROM pairs
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
LIMIT 50
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


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the latest
    view/click by the same user within the preceding 3 days — the
    marketing-attribution join, i.e. a backward as-of join with a
    tolerance window. The join key is the user plus a bounded time
    range, so pair growth is capped by per-user activity in 3 days;
    partitioned on user at scale (and Spark's range-join machinery
    applies). Ties at the same timestamp break on event_id, so both
    engines credit the identical touch."""
    ev = load_table(spark, "events", sf_dir)
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purch.join(touch, "user_id").where(
        (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
    )
    w = W.partitionBy("purchase_id").orderBy(F.col("t_ts").desc(), F.col("touch_id").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            "purchase_value",
            "touch_id",
            "touch_type",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("t_ts")).cast("bigint").alias(
                "seconds_to_convert"
            ),
        )
        .orderBy("purchase_id")
    )


ATTRIBUTION_SQL = """
WITH purch AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), touch AS (
  SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
), joined AS (
  SELECT p.*, t.touch_id, t.touch_type, t.t_ts,
         row_number() OVER (PARTITION BY p.purchase_id
                            ORDER BY t.t_ts DESC, t.touch_id DESC) AS rn
  FROM purch p JOIN touch t
    ON p.user_id = t.user_id
   AND t.t_ts <= p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 3 DAY
)
SELECT purchase_id, user_id, purchase_value, touch_id, touch_type,
       CAST(date_diff('second', t_ts, p_ts) AS BIGINT) AS seconds_to_convert
FROM joined WHERE rn = 1
ORDER BY purchase_id
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
    n_exact = (
        li.join(keys, li.l_orderkey == keys.k, "left_semi").agg(F.count("*").alias("n_exact"))
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


def quantile_bins_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency feature discretization: ntile(10) buckets over
    lineitem extended price — the binning step of classic feature
    engineering (decile features, monotone-binned WOE, calibration
    buckets). The ORDER BY carries a full unique key
    (price, orderkey, linenumber) so tie placement is deterministic
    and both engines bin identically.

    Scale note: a global ntile is a single-partition window — fine
    for reporting, wrong for a 100 TB feature pipeline. The scale
    path is approx_percentile(p, [0.1 .. 0.9]) → broadcast the 9 cut
    points → stateless width_bucket filter (one scan, no global
    sort); this exact-ntile form is kept because the oracle can
    value-check it bin-for-bin, and the cutpoint variant's contract
    (±ε on boundaries) is probabilistic."""
    li = load_table(spark, "lineitem", sf_dir)
    w = W.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    return (
        li.select("l_extendedprice", "l_orderkey", "l_linenumber")
        .withColumn("bin", F.ntile(10).over(w).cast("bigint"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
            F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        )
        .orderBy("bin")
    )


QUANTILE_BINS_SQL = """
SELECT bin, count(*) AS n_rows,
       round(min(l_extendedprice), 2) AS lo,
       round(max(l_extendedprice), 2) AS hi,
       round(avg(l_extendedprice), 4) AS mean_price
FROM (
  SELECT l_extendedprice,
         ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bin
  FROM lineitem)
GROUP BY bin
ORDER BY bin
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


def session_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-journey paths: sessionize events (30-min gaps, the
    same rule as sessionize_events), take each session's first three
    event types in time order, and rank the most common paths — the
    product-analytics "how do sessions start" report.

    Shape at scale: two window passes over (user, ts) — the same
    partitioning reused, so one shuffle — then a path-string
    aggregate whose cardinality is bounded by |event_types|³, tiny.
    The path is assembled via array_sort on (rank, type) structs, so
    ordering inside the aggregate is explicit and deterministic, not
    collect_list's arrival order."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    sess = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("new_s", F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    ws = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first3 = (
        sess.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= 3)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        first3.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(15)
    )


SESSION_PATH_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), first3 AS (
  SELECT user_id, session_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                     ORDER BY ts, event_id) AS rn
        FROM sess)
  WHERE rn <= 3
  GROUP BY user_id, session_id)
SELECT path, count(*) AS n_sessions
FROM first3
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 15
"""


def quantile_bins_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB variant of quantile_bins_price: cut points from
    approx_percentile (Greenwald–Khanna, one pass, mergeable across
    partitions) broadcast into a stateless bin assignment — one scan
    + one tiny aggregate instead of a global single-partition ntile
    sort. Bin populations are approximately n/10 (the GK ±ε
    contract); the error-bound unit test pins that contract against
    the exact decile sizes. No oracle entry — DuckDB's approx
    quantiles use a different sketch, so estimates are engine-
    specific by construction."""
    li = load_table(spark, "lineitem", sf_dir).select("l_extendedprice")
    cuts = li.agg(
        F.percentile_approx(
            "l_extendedprice", [i / 10.0 for i in range(1, 10)], 10000
        ).alias("cuts")
    )
    binned = li.crossJoin(F.broadcast(cuts)).select(
        "l_extendedprice",
        # width_bucket against the 9 broadcast cut points: count of
        # cuts <= value = bin index 0..9, pure column algebra
        F.aggregate(
            "cuts",
            F.lit(0),
            lambda acc, c: acc + F.when(F.col("l_extendedprice") > c, 1).otherwise(0),
        ).cast("bigint").alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
        .orderBy("bin")
    )


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


def rollup_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical share-of-parent report over ROLLUP(lang, source):
    every (lang, source) leaf carries its share of the lang subtotal,
    every lang subtotal its share of the grand total — the drill-down
    table BI layers ask for. One rollup aggregate, then the shares
    come from joining the (tiny) subtotal levels back — broadcast
    joins on the O(groups) result, never a second corpus pass. NULL
    group keys are folded to 'ALL' so the level structure is explicit
    in the output."""
    docs = load_table(spark, "documents", sf_dir)
    rolled = (
        docs.rollup("lang", "source")
        .agg(F.sum("n_chars").alias("mass"), F.grouping_id().alias("gid"))
        .localCheckpoint()  # three level-slices below — compute the rollup once
    )
    leaves = rolled.where(F.col("gid") == 0)
    lang_tot = rolled.where(F.col("gid") == 1).select(
        F.col("lang").alias("p_lang"), F.col("mass").alias("parent_mass")
    )
    grand = rolled.where(F.col("gid") == 3).select(F.col("mass").alias("grand_mass"))
    leaf_rows = leaves.join(F.broadcast(lang_tot), leaves.lang == lang_tot.p_lang).select(
        "lang",
        "source",
        "mass",
        F.round(F.col("mass") / F.col("parent_mass"), 6).alias("share_of_parent"),
    )
    lang_rows = (
        rolled.where(F.col("gid") == 1)
        .crossJoin(F.broadcast(grand))
        .select(
            "lang",
            F.lit("ALL").alias("source"),
            "mass",
            F.round(F.col("mass") / F.col("grand_mass"), 6).alias("share_of_parent"),
        )
    )
    grand_row = rolled.where(F.col("gid") == 3).select(
        F.lit("ALL").alias("lang"),
        F.lit("ALL").alias("source"),
        "mass",
        F.lit(1.0).alias("share_of_parent"),
    )
    return leaf_rows.unionByName(lang_rows).unionByName(grand_row).orderBy("lang", "source")


ROLLUP_SHARE_SQL = """
WITH rolled AS (
  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS mass, grouping(lang, source) AS gid
  FROM documents
  GROUP BY ROLLUP (lang, source))
SELECT l.lang, l.source, l.mass,
       round(l.mass / CAST(p.mass AS DOUBLE), 6) AS share_of_parent
FROM rolled l JOIN rolled p ON p.gid = 1 AND p.lang = l.lang
WHERE l.gid = 0
UNION ALL
SELECT l.lang, 'ALL' AS source, l.mass,
       round(l.mass / CAST(g.mass AS DOUBLE), 6) AS share_of_parent
FROM rolled l CROSS JOIN (SELECT mass FROM rolled WHERE gid = 3) g
WHERE l.gid = 1
UNION ALL
SELECT 'ALL' AS lang, 'ALL' AS source, mass, 1.0 AS share_of_parent
FROM rolled WHERE gid = 3
ORDER BY lang, source
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


_DUCK_HASH_PCT_EVENTS = (
    "(((strpos('0123456789abcdef', md5(event_id::VARCHAR)[1]) - 1) * 4096"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[2]) - 1) * 256"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[3]) - 1) * 16"
    " + (strpos('0123456789abcdef', md5(event_id::VARCHAR)[4]) - 1)) % 100)"
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


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the view→purchase funnel —
    funnel_events' counting sibling answers 'how many', this answers
    'how fast': per user take the first view and the first purchase
    AFTER it, then report conversion rate and the delay distribution
    per the user's first-seen day-of-week cohort.

    Two min-aggregates on the user key (no event-level join), then an
    O(users) percentile pass — the corpus is scanned once. The strict
    'purchase after first view' guard keeps pre-exposure purchases
    from counting as instant conversions."""
    ev = load_table(spark, "events", sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.unix_micros("ts"))).alias("first_view"),
        F.min(F.unix_micros("ts")).alias("first_seen"),
    )
    purch = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(per_user, "user_id")
        .where(F.col("first_view").isNotNull() & (F.col("p_us") > F.col("first_view")))
        .groupBy("user_id")
        .agg(F.min(F.col("p_us") - F.col("first_view")).alias("delay_us"))
    )
    cohorts = per_user.select(
        "user_id",
        F.dayofweek(F.timestamp_micros("first_seen")).cast("bigint").alias("cohort_dow"),
        "first_view",
    )
    joined = cohorts.join(purch, "user_id", "left")
    return (
        joined.where(F.col("first_view").isNotNull())
        .groupBy("cohort_dow")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.when(F.col("delay_us").isNotNull(), 1).otherwise(0)).cast("bigint").alias("n_converted"),
            F.round(F.avg(F.when(F.col("delay_us").isNotNull(), 1.0).otherwise(0.0)), 4).alias("conv_rate"),
            F.round(F.percentile(F.col("delay_us") / 3.6e9, F.lit(0.5)), 3).alias("p50_hours"),
            F.round(F.percentile(F.col("delay_us") / 3.6e9, F.lit(0.9)), 3).alias("p90_hours"),
        )
        .orderBy("cohort_dow")
    )


FUNNEL_TTC_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         min(epoch_us(ts)) AS first_seen
  FROM events GROUP BY user_id),
purch AS (
  SELECT e.user_id, min(epoch_us(e.ts) - u.first_view) AS delay_us
  FROM events e JOIN per_user u ON e.user_id = u.user_id
  WHERE e.event_type = 'purchase' AND u.first_view IS NOT NULL
    AND epoch_us(e.ts) > u.first_view
  GROUP BY e.user_id)
SELECT CAST(dayofweek(make_timestamp(u.first_seen)) + 1 AS BIGINT) AS cohort_dow,
       count(*) AS n_users,
       CAST(sum(CASE WHEN p.delay_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       round(avg(CASE WHEN p.delay_us IS NOT NULL THEN 1.0 ELSE 0.0 END), 4) AS conv_rate,
       round(quantile_cont(p.delay_us / 3.6e9, 0.5), 3) AS p50_hours,
       round(quantile_cont(p.delay_us / 3.6e9, 0.9), 3) AS p90_hours
FROM per_user u LEFT JOIN purch p ON u.user_id = p.user_id
WHERE u.first_view IS NOT NULL
GROUP BY 1
ORDER BY cohort_dow
"""


def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence — inter-order gap distribution per
    market segment: lag over each customer's order dates, then one
    percentile aggregate per segment. The replenishment-cycle input
    for demand forecasting and churn definitions (a customer is
    'lapsed' when their gap exceeds their segment's p90).

    The lag window partitions on the customer key; the customer
    dimension joins broadcast-side. Gaps are integer days — exact in
    both engines."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("bigint").alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    return (
        gaps.join(F.broadcast(cust), gaps.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            F.round(F.avg("gap_days"), 2).alias("mean_gap"),
            F.round(F.percentile("gap_days", F.lit(0.5)), 1).alias("p50_gap"),
            F.round(F.percentile("gap_days", F.lit(0.9)), 1).alias("p90_gap"),
            F.max("gap_days").alias("max_gap"),
        )
        .orderBy("c_mktsegment")
    )


ORDER_CADENCE_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS gap_days
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
SELECT c_mktsegment,
       count(*) AS n_gaps,
       round(avg(gap_days), 2) AS mean_gap,
       round(quantile_cont(gap_days, 0.5), 1) AS p50_gap,
       round(quantile_cont(gap_days, 0.9), 1) AS p90_gap,
       max(gap_days) AS max_gap
FROM gaps JOIN customer ON o_custkey = c_custkey
WHERE gap_days IS NOT NULL
GROUP BY c_mktsegment
ORDER BY c_mktsegment
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


def fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per order priority — the
    operational SLA readout: join each line item's ship date to its
    order's date, then exact percentiles of the day gap per priority
    class. One shuffle join on the order key (both sides pre-pruned
    to two columns), one percentile aggregate on the O(priorities)
    grouping."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    gap = F.datediff("l_shipdate", "o_orderdate").cast("bigint")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", gap.alias("gap_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.avg("gap_days"), 3).alias("mean_days"),
            F.round(F.percentile("gap_days", F.lit(0.5)), 1).alias("p50_days"),
            F.round(F.percentile("gap_days", F.lit(0.95)), 1).alias("p95_days"),
            F.max("gap_days").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


FULFILLMENT_SQL = """
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(avg(gap_days), 3) AS mean_days,
       round(quantile_cont(gap_days, 0.5), 1) AS p50_days,
       round(quantile_cont(gap_days, 0.95), 1) AS p95_days,
       max(gap_days) AS max_days
FROM (
  SELECT o_orderpriority,
         CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS gap_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def open_orders_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog timeline — how many orders are open (placed but not yet
    fully shipped) each month: the interval-stabbing problem solved
    the scalable way, as +1/-1 boundary events and a running sum.
    Each order contributes +1 at its order month and -1 after its
    LAST ship month; the monthly net then cumulates. No per-day
    explosion of order lifetimes — the running sum is over the
    O(months) pre-aggregate (global window on a metadata-sized
    table)."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load_table(spark, "lineitem", sf_dir).groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("last_ship")
    )
    spans = orders.join(li, orders.o_orderkey == li.l_orderkey)
    opens = spans.select(F.date_format("o_orderdate", "yyyy-MM").alias("month"), F.lit(1).alias("delta"))
    closes = spans.select(
        F.date_format(F.add_months(F.date_trunc("month", "last_ship"), 1), "yyyy-MM").alias("month"),
        F.lit(-1).alias("delta"),
    )
    monthly = opens.unionByName(closes).groupBy("month").agg(
        F.sum("delta").cast("bigint").alias("net_change")
    )
    return (
        monthly.withColumn(
            "open_orders",
            F.sum("net_change")
            .over(W.orderBy("month").rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint"),
        )
        .orderBy("month")
    )


OPEN_ORDERS_SQL = """
WITH spans AS (
  SELECT o_orderkey, o_orderdate, max(l_shipdate) AS last_ship
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderdate),
deltas AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, 1 AS delta FROM spans
  UNION ALL
  SELECT strftime(date_trunc('month', last_ship) + INTERVAL 1 MONTH, '%Y-%m'), -1 FROM spans),
monthly AS (
  SELECT month, CAST(sum(delta) AS BIGINT) AS net_change FROM deltas GROUP BY month)
SELECT month, net_change,
       CAST(sum(net_change) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS open_orders
FROM monthly
ORDER BY month
"""


def repeat_purchase_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-customer share per month — the retention trend line: for
    each order month, the fraction of orders placed by customers with
    at least one earlier order. One customer-partitioned row_number
    marks first orders; the monthly aggregate is O(months). The
    metric every growth dashboard pairs with revenue_growth_mom."""
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    flagged = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.row_number().over(w) > 1).alias("is_repeat"),
    )
    return (
        flagged.groupBy("month")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("is_repeat"), 1).otherwise(0)).cast("bigint").alias("n_repeat"),
            F.round(F.avg(F.when(F.col("is_repeat"), 1.0).otherwise(0.0)), 4).alias("repeat_share"),
        )
        .orderBy("month")
    )


REPEAT_SHARE_SQL = """
WITH flagged AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) > 1 AS is_repeat
  FROM orders)
SELECT month, count(*) AS n_orders,
       CAST(sum(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat,
       round(avg(CASE WHEN is_repeat THEN 1.0 ELSE 0.0 END), 4) AS repeat_share
FROM flagged
GROUP BY month
ORDER BY month
"""


def supplier_share_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-base concentration per nation — the Herfindahl–Hirschman
    index over supplier revenue shares: HHI = Σ share², 1/n for a
    perfectly even base, 1.0 for a single-supplier monopoly. The
    procurement-risk metric: a nation above ~0.25 has a concentration
    problem. Two hash aggregates (supplier revenue, then the share
    fold per nation) + a broadcast nation join — the share math never
    touches the fact table again."""
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    tot = W.partitionBy("n_name")
    shares = rev.select("n_name", (F.col("rev") / F.sum("rev").over(tot)).alias("share"))
    return (
        shares.groupBy("n_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.sum(F.col("share") * F.col("share")), 6).alias("hhi"),
            F.round(F.max("share"), 6).alias("top_share"),
        )
        .orderBy("n_name")
    )


HHI_SQL = """
WITH rev AS (
  SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_name, s_suppkey),
shares AS (
  SELECT n_name, rev / sum(rev) OVER (PARTITION BY n_name) AS share FROM rev)
SELECT n_name, count(*) AS n_suppliers,
       round(sum(share * share), 6) AS hhi,
       round(max(share), 6) AS top_share
FROM shares
GROUP BY n_name
ORDER BY n_name
"""


def spend_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend inequality per market segment — the Gini coefficient of
    per-customer order totals via the rank formulation
    G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over spend-sorted customers. The
    'whale concentration' diagnostic: how much of a segment's revenue
    sits in its top customers. Ranks come from a window PARTITIONED
    by segment over the pre-aggregated customer dim — O(customers)
    rows, never the fact table."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    w = W.partitionBy("c_mktsegment").orderBy("spend", "o_custkey")
    ranked = spend.select(
        "c_mktsegment", "spend", F.row_number().over(w).cast("double").alias("i")
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.lit(2.0) * F.sum(F.col("i") * F.col("spend")) / (F.count("*") * F.sum("spend"))
                - (F.count("*") + 1) / F.count("*"),
                4,
            ).alias("gini"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
        )
        .orderBy("c_mktsegment")
    )


GINI_SQL = """
WITH spend AS (
  SELECT o_custkey, c_mktsegment, sum(o_totalprice) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_mktsegment),
ranked AS (
  SELECT c_mktsegment, spend,
         CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY spend, o_custkey) AS DOUBLE) AS i
  FROM spend)
SELECT c_mktsegment, count(*) AS n_customers,
       round(2.0 * sum(i * spend) / (count(*) * sum(spend)) - (count(*) + 1.0) / count(*), 4) AS gini,
       round(sum(spend), 2) AS total_spend
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
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


def revenue_pareto_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration bands per market segment — the share of
    segment revenue held by the top 10% / 25% / 50% of customers,
    the interpretable companion to spend_gini_by_segment's single
    coefficient. Ranking and cumulative shares run on the
    pre-aggregated customer dim (segment-partitioned windows); each
    band is a conditional sum in ONE aggregate, so adding bands never
    adds passes."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(F.col("spend").desc(), "o_custkey")
    ranked = spend.select(
        "c_mktsegment",
        "spend",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(W.partitionBy("c_mktsegment")).alias("n"),
    )
    share_at = lambda q: F.round(
        F.sum(F.when(F.col("rk") <= F.ceil(F.col("n") * q), F.col("spend")).otherwise(0.0))
        / F.sum("spend"),
        4,
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            share_at(0.10).alias("top10_share"),
            share_at(0.25).alias("top25_share"),
            share_at(0.50).alias("top50_share"),
        )
        .orderBy("c_mktsegment")
    )


PARETO_BANDS_SQL = """
WITH spend AS (
  SELECT o_custkey, c_mktsegment, sum(o_totalprice) AS spend
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_mktsegment),
ranked AS (
  SELECT c_mktsegment, spend,
         row_number() OVER (PARTITION BY c_mktsegment ORDER BY spend DESC, o_custkey) AS rk,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM spend)
SELECT c_mktsegment, count(*) AS n_customers,
       round(sum(CASE WHEN rk <= ceil(n * 0.10) THEN spend ELSE 0.0 END) / sum(spend), 4) AS top10_share,
       round(sum(CASE WHEN rk <= ceil(n * 0.25) THEN spend ELSE 0.0 END) / sum(spend), 4) AS top25_share,
       round(sum(CASE WHEN rk <= ceil(n * 0.50) THEN spend ELSE 0.0 END) / sum(spend), 4) AS top50_share
FROM ranked
GROUP BY c_mktsegment
ORDER BY c_mktsegment
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


def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the
    companion to attribution_last_touch that spreads each purchase's
    credit across its WHOLE 3-day touch path: 40% to the first touch,
    40% to the last, the remaining 20% split evenly over the middle
    touches (single-touch paths take 100%, two-touch paths 50/50).
    Reported as credited revenue by touch type — the budget-allocation
    table.

    Scale: same bounded (user ⨝ 3-day-range) join as last-touch — the
    pair space is per-user activity in the window, partitioned on
    user; position ranks are per-purchase windows (the partition key),
    and the final rollup is O(touch types)."""
    ev = load_table(spark, "events", sf_dir)
    purch = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    touch = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
    )
    joined = purch.join(touch, "user_id").where(
        (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 3 DAYS"))
    )
    wp = W.partitionBy("purchase_id")
    asc = F.row_number().over(wp.orderBy(F.col("t_ts").asc(), F.col("touch_id").asc()))
    n = F.count("*").over(wp)
    ranked = joined.select(
        "purchase_id", "purchase_value", "touch_type", asc.alias("pos"), n.alias("n_touch")
    )
    credit = (
        F.when(F.col("n_touch") == 1, F.lit(1.0))
        .when((F.col("n_touch") == 2), F.lit(0.5))
        .when(F.col("pos") == 1, F.lit(0.4))
        .when(F.col("pos") == F.col("n_touch"), F.lit(0.4))
        .otherwise(0.2 / (F.col("n_touch") - 2))
    )
    return (
        ranked.groupBy("touch_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.round(F.sum(credit * F.col("purchase_value")), 4).alias("credited_revenue"),
            F.round(F.sum(credit), 4).alias("credited_conversions"),
        )
        .orderBy("touch_type")
    )


ATTRIBUTION_POSITION_SQL = """
WITH purch AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type AS touch_type
  FROM events WHERE event_type IN ('view', 'click')),
joined AS (
  SELECT p.purchase_id, p.purchase_value, t.touch_type, t.t_ts, t.touch_id
  FROM purch p JOIN touch t USING (user_id)
  WHERE t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 3 DAY),
ranked AS (
  SELECT purchase_id, purchase_value, touch_type,
         row_number() OVER (PARTITION BY purchase_id ORDER BY t_ts ASC, touch_id ASC) AS pos,
         count(*) OVER (PARTITION BY purchase_id) AS n_touch
  FROM joined),
credited AS (
  SELECT touch_type, purchase_value,
         CASE WHEN n_touch = 1 THEN 1.0
              WHEN n_touch = 2 THEN 0.5
              WHEN pos = 1 THEN 0.4
              WHEN pos = n_touch THEN 0.4
              ELSE 0.2 / (n_touch - 2) END AS credit
  FROM ranked)
SELECT touch_type, count(*)::BIGINT AS n_touches,
       round(sum(credit * purchase_value), 4) AS credited_revenue,
       round(sum(credit), 4) AS credited_conversions
FROM credited
GROUP BY touch_type
ORDER BY touch_type
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


def ips_offline_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-scored off-policy evaluation — grading a
    new recommendation policy on LOGGED interactions without an A/B
    test: treat event_type as the logged action, clip(value/100) as
    the reward, estimate the logging propensities empirically per
    user cohort (user_id % 4), then score each candidate
    deterministic policy 'always recommend a' by IPS
    (Σ 1{a_log=a}·r/p̂) / n, its self-normalized SNIPS variant
    (robust to propensity misspecification), and the effective
    sample size that says how much data actually supports the
    estimate. The standard counterfactual-eval kit (Horvitz-Thompson
    → SNIPS) as relational algebra.

    100 TB: propensities are an O(cohorts × actions) aggregate
    broadcast back onto one log scan; each policy's estimate is a
    filtered aggregate over that scan — no per-row Python, no second
    pass."""
    ev = load_table(spark, "events", sf_dir).select(
        (F.col("user_id") % 4).alias("cohort"),
        F.col("event_type").alias("action"),
        F.least(F.col("value") / 100.0, F.lit(1.0)).alias("reward"),
    )
    prop = ev.groupBy("cohort", "action").agg(F.count("*").alias("n_ca"))
    coh = ev.groupBy("cohort").agg(F.count("*").alias("n_c"))
    logged = (
        ev.join(F.broadcast(prop), ["cohort", "action"])
        .join(F.broadcast(coh), "cohort")
        .select("cohort", "action", "reward", (F.col("n_ca") / F.col("n_c")).alias("p_log"))
    )
    w = F.lit(1.0) / F.col("p_log")
    per_action = (
        logged.groupBy(F.col("action").alias("policy_action"))
        .agg(
            F.count("*").cast("bigint").alias("n_matched"),
            F.sum(w * F.col("reward")).alias("sw_r"),
            F.sum(w).alias("sw"),
            F.sum(w * w).alias("sw2"),
        )
    )
    n_total = logged.agg(F.count("*").cast("double").alias("n_total"))
    return (
        per_action.crossJoin(F.broadcast(n_total))
        .select(
            "policy_action",
            "n_matched",
            F.round(F.col("sw_r") / F.col("n_total"), 6).alias("ips_value"),
            F.round(F.col("sw_r") / F.col("sw"), 6).alias("snips_value"),
            F.round((F.col("sw") * F.col("sw")) / F.col("sw2"), 2).alias("ess"),
        )
        .orderBy("policy_action")
    )


IPS_EVAL_SQL = """
WITH ev AS (
  SELECT user_id % 4 AS cohort, event_type AS action,
         least(value / 100.0, 1.0) AS reward
  FROM events),
prop AS (SELECT cohort, action, count(*) AS n_ca FROM ev GROUP BY cohort, action),
coh AS (SELECT cohort, count(*) AS n_c FROM ev GROUP BY cohort),
logged AS (
  SELECT e.cohort, e.action, e.reward, n_ca / CAST(n_c AS DOUBLE) AS p_log
  FROM ev e JOIN prop USING (cohort, action) JOIN coh USING (cohort)),
per_action AS (
  SELECT action AS policy_action,
         count(*)::BIGINT AS n_matched,
         sum(reward / p_log) AS sw_r,
         sum(1.0 / p_log) AS sw,
         sum(1.0 / (p_log * p_log)) AS sw2
  FROM logged GROUP BY action),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM logged)
SELECT policy_action, n_matched,
       round(sw_r / n_total, 6) AS ips_value,
       round(sw_r / sw, 6) AS snips_value,
       round((sw * sw) / sw2, 2) AS ess
FROM per_action CROSS JOIN tot
ORDER BY policy_action
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


def entity_resolution_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over the part catalog — the
    record-linkage funnel composed the way corpus_pipeline composes
    the dedup funnel: (1) candidate pairs from the blocked sorted-
    neighborhood fuzzy match (levenshtein ≤ 2 — typo tolerance —
    within ±2 name-sorted neighbors of the last-word block: O(n·w)
    pairs, never block²; the catalog's ground truth is its exact
    name groups, which the closure must recover without chaining
    distinct names together),
    (2) transitive closure into entity clusters (the same size-
    adaptive CC machinery the dedup family uses — driver union-find
    small, min-label propagation at scale), (3) canonical-record
    election per entity (lowest retail price wins, key as tiebreak —
    the survivorship rule). Output: per-cluster-size census with
    canonical-record count — the dedup decision table for a master-
    data pipeline.

    Oracle: the closure re-derives as a recursive CTE; election and
    census replay relationally. 100 TB: pairs are rank-band
    equi-joins; the closure touches only O(pairs); election is one
    min-struct per label."""
    part = load_table(spark, "part", sf_dir)
    from pyspark.sql import Window as W2

    w_rank = W2.partitionBy("blk").orderBy(F.col("p_name").asc(), F.col("p_partkey").asc())
    v = (
        part.select(
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.element_at(F.split("p_name", " "), -1).alias("blk"),
        )
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .localCheckpoint()
    )
    # rank-bucket equi-join (the fuzzy_match_parts trick): a bare
    # blk-equi + rnk-range join would cross-product inside each block
    # before filtering (26x wall on 10x data, measured); bucketing the
    # rank makes the band an equi-join with O(w) partners per row
    bw = 4
    probe = v.select(
        "p_partkey",
        "p_name",
        "blk",
        "rnk",
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
        F.col("blk").alias("b_blk"),
        F.col("rnk").alias("b_rnk"),
        F.floor(F.col("rnk") / bw).alias("bkt"),
    )
    pairs = (
        probe.join(build, ["bkt"])
        .where(
            (F.col("blk") == F.col("b_blk"))
            & (F.col("b_rnk") > F.col("rnk"))
            & (F.col("b_rnk") <= F.col("rnk") + 2)
        )
        .where(F.levenshtein(F.col("p_name"), F.col("b_name")) <= 2)
        .select(F.col("p_partkey").alias("doc_a"), F.col("b_key").alias("doc_b"))
    )
    from hematite_spark.queries.dedup import _cc_labels

    labels = _cc_labels(spark, pairs)
    members = v.join(labels, v.p_partkey == labels.node, "left").select(
        "p_partkey",
        "p_retailprice",
        F.coalesce(F.col("label"), F.col("p_partkey")).alias("entity"),
    )
    canon = members.groupBy("entity").agg(
        F.count("*").cast("bigint").alias("cluster_size"),
        F.min(F.struct("p_retailprice", "p_partkey")).getField("p_partkey").alias(
            "canonical_key"
        ),
    )
    return (
        canon.groupBy("cluster_size")
        .agg(
            F.count("*").cast("bigint").alias("n_entities"),
            F.sum("cluster_size").cast("bigint").alias("n_records"),
            F.countDistinct("canonical_key").cast("bigint").alias("n_canonical"),
        )
        .orderBy("cluster_size")
    )


ER_PIPELINE_SQL = """
WITH RECURSIVE v AS (
  SELECT p_partkey, p_name, p_retailprice,
         string_split(p_name, ' ')[-1] AS blk,
         CAST(row_number() OVER (PARTITION BY string_split(p_name, ' ')[-1]
              ORDER BY p_name ASC, p_partkey ASC) AS BIGINT) AS rnk
  FROM part),
pairs AS (
  SELECT a.p_partkey AS doc_a, b.p_partkey AS doc_b
  FROM v a JOIN v b
    ON a.blk = b.blk AND b.rnk > a.rnk AND b.rnk <= a.rnk + 2
  WHERE levenshtein(a.p_name, b.p_name) <= 2),
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM pairs),
reach(node, label) AS (
  SELECT DISTINCT s, s FROM edges
  UNION
  SELECT e.d, r.label FROM reach r JOIN edges e ON r.node = e.s),
closure AS (
  SELECT node, min(label) AS label FROM reach GROUP BY node),
members AS (
  SELECT p.p_partkey, p.p_retailprice,
         coalesce(c.label, p.p_partkey) AS entity
  FROM part p LEFT JOIN closure c ON c.node = p.p_partkey),
canon AS (
  SELECT entity, count(*)::BIGINT AS cluster_size,
         (min(struct_pack(p := p_retailprice, k := p_partkey))).k AS canonical_key
  FROM members GROUP BY entity)
SELECT cluster_size,
       count(*)::BIGINT AS n_entities,
       CAST(sum(cluster_size) AS BIGINT) AS n_records,
       count(DISTINCT canonical_key)::BIGINT AS n_canonical
FROM canon
GROUP BY cluster_size
ORDER BY cluster_size
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


def bradley_terry_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One minorization-maximization step of the Bradley-Terry model
    — the pairwise-preference ranking aggregator behind LLM eval
    win-rates and match-making: 'matches' are (day, cohort) arenas
    where the event type with the higher mean value beats each other
    type; the MM update s_i ← W_i / Σ_j n_ij/(s_i+s_j) from the
    uniform init turns the win matrix into strengths, normalized to
    sum 1. Output per type: wins, matches, the post-step strength,
    and its rank.

    100 TB: arenas are one (day, cohort, type) aggregate; the pairwise
    win matrix is an arena-keyed self-join of the O(arenas × types)
    table (types is small, arenas shard); the MM step is O(types²)
    arithmetic on the broadcast win matrix."""
    from pyspark.sql import Window as W

    ev = load_table(spark, "events", sf_dir)
    arena = ev.groupBy(
        F.to_date("ts").alias("day"), (F.col("user_id") % 4).alias("cohort"), "event_type"
    ).agg(F.avg("value").alias("m"))
    a, b = arena.alias("a"), arena.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.cohort") == F.col("b.cohort"))
            & (F.col("a.event_type") != F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("i"),
            F.col("b.event_type").alias("j"),
            (F.col("a.m") > F.col("b.m")).cast("int").alias("win"),
        )
        .groupBy("i", "j")
        .agg(F.count("*").cast("bigint").alias("n_ij"), F.sum("win").cast("bigint").alias("w_ij"))
    )
    # MM update from uniform s=1: s_i' = W_i / Σ_j n_ij/(1+1)
    upd = matches.groupBy("i").agg(
        F.sum("w_ij").cast("bigint").alias("wins"),
        F.sum("n_ij").cast("bigint").alias("matches"),
        (F.sum("w_ij") / (F.sum("n_ij") / 2.0)).alias("s_raw"),
    )
    z = upd.agg(F.sum("s_raw").alias("z"))
    ranked = (
        upd.crossJoin(F.broadcast(z))
        .select(
            F.col("i").alias("event_type"),
            "wins",
            "matches",
            F.round(F.col("s_raw") / F.col("z"), 6).alias("bt_strength"),
            (F.col("s_raw") / F.col("z")).alias("_p"),
        )
        .withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.col("_p").desc(), F.col("event_type"))).cast("int"),
        )
        .drop("_p")
    )
    return ranked.orderBy("rank")


BRADLEY_TERRY_SQL = """
WITH arena AS (
  SELECT CAST(ts AS DATE) AS day, user_id % 4 AS cohort, event_type, avg(value) AS m
  FROM events GROUP BY 1, 2, 3),
matches AS (
  SELECT a.event_type AS i, b.event_type AS j,
         count(*)::BIGINT AS n_ij,
         sum(CASE WHEN a.m > b.m THEN 1 ELSE 0 END)::BIGINT AS w_ij
  FROM arena a JOIN arena b
    ON a.day = b.day AND a.cohort = b.cohort AND a.event_type <> b.event_type
  GROUP BY a.event_type, b.event_type),
upd AS (
  SELECT i, CAST(sum(w_ij) AS BIGINT) AS wins, CAST(sum(n_ij) AS BIGINT) AS matches,
         sum(w_ij) / (sum(n_ij) / 2.0) AS s_raw
  FROM matches GROUP BY i),
z AS (SELECT sum(s_raw) AS z FROM upd)
SELECT i AS event_type, wins, matches,
       round(s_raw / z, 6) AS bt_strength,
       CAST(row_number() OVER (ORDER BY s_raw / z DESC, i) AS INT) AS rank
FROM upd CROSS JOIN z
ORDER BY rank
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


# item-kNN neighbor-list cap for rec_hitrate_eval — must match the
# literal 50 in REC_HITRATE_SQL's co CTE
_REC_TOP_M = 50


def rec_hitrate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out recommender evaluation — the offline metric loop
    for an item-cooccurrence recommender: hold out each customer's
    LAST-ordered part (by order date, key tiebreak), recommend the
    top-3 co-purchased parts given their remaining basket (global
    item-item co-occurrence, self-pairs excluded), and score
    hit-rate@3 — did the held-out item appear in the top-3? Emits the
    eval table per customer-count bucket plus the overall rate on
    every row.

    Item-kNN definition: each item's co-occurrence list is capped to
    its top-M=50 neighbors (by co-count, part-key tiebreak) before
    scoring — part of the metric's definition in BOTH engines, not a
    Spark-side approximation, so the oracle matches exactly. Baskets
    are deduplicated on (custkey, date, order, part) up front in BOTH
    engines (a repeated lineitem is one purchase signal, not two).

    100 TB (round-8 rework; history: the round-6 ×64 probe measured
    77× wall on 64× data — fat-partition sorting at the session's
    FIXED shuffle width, so each reducer sorted ~64× more candidate
    rows and spilled; round 7 scaled the width from an eager basket
    count but regressed sf0.1 (extra exchanges) and broke the
    plan-build-is-lazy contract):
    - the candidate shuffle width SCALES WITH DATA but is derived
      from the lineitem parquet's ON-DISK BYTES (io.table_bytes — a
      filesystem stat, no Spark job at plan-build time, per ADVICE
      r7), sized so each reducer sorts a bounded ~2M candidate rows
      (candidates ≈ basket rows × M) at any scale: resolves to the
      session default at bench scales, fans out on the ×8/×64
      replicas so the top-3 window sorts in memory;
    - baskets dedup BEFORE the orders join: duplicates only arise
      from repeated (orderkey, partkey) lineitem rows and orders is
      unique per orderkey, so a 2-column dropDuplicates keyed on a
      l_orderkey repartition replaces round 7's full-width 4-column
      distinct AFTER the join — and the orderkey partitioning is
      reused by both the dedup aggregate (subset clustering) and the
      sort-merge join, one narrow exchange instead of two wide ones;
    - the checkpoint moved AFTER the held-out window: held and train
      are consumed four times downstream, and materializing marked
      (instead of baskets) makes each consumption a filter over
      checkpointed rows rather than a re-run of the custkey
      exchange + sort;
    - the co-list cap window repartitions to the scaled width only
      when it differs from the session default — at bench scale the
      window's own implicit hash(p) exchange is identical, so the
      explicit one is skipped (VERDICT r7 item 3).
    Co-occurrence stays an order-keyed self-join (pair space
    Σ basket², bounded by basket size; the probe side reuses the
    build side's exchange); the top-M cap bounds candidate scoring
    at O(customers × items-per-customer × M); the one explicit
    custkey repartition serves the (custkey, q) aggregate AND the
    top-3 window, so the candidate table crosses the wire once."""
    from pyspark.sql import Window as W

    from hematite_spark.io import table_bytes

    # scale-adaptive candidate shuffle width from on-disk input size:
    # lineitem runs ~18 bytes/row in this parquet corpus, candidates
    # ≈ basket rows × M, target ≤ ~2M candidate rows per reducer. A
    # ±2x row-estimate error just halves/doubles reducer load — the
    # heuristic only needs the order of magnitude.
    default_width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    est_rows = table_bytes("lineitem", sf_dir) // 18
    n_parts = max(
        default_width,
        min(4096, -(-(est_rows * _REC_TOP_M) // 2_000_000)),
    )
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    li_dedup = li.repartition("l_orderkey").dropDuplicates(["l_orderkey", "l_partkey"])
    baskets = li_dedup.join(orders, li_dedup.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "o_orderdate", "l_orderkey", "l_partkey"
    )
    # held-out item: the customer's last (orderdate, orderkey, partkey)
    wc = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("l_orderkey").desc(), F.col("l_partkey").desc()
    )
    marked = baskets.withColumn("rn", F.row_number().over(wc)).localCheckpoint()
    held = marked.where(F.col("rn") == 1).select(
        "o_custkey", F.col("l_partkey").alias("held_part")
    )
    train = marked.where(F.col("rn") > 1).select("o_custkey", "l_orderkey", "l_partkey")
    # item-item co-occurrence from TRAIN baskets only
    a, b = train.alias("a"), train.alias("b")
    co = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .groupBy(F.col("a.l_partkey").alias("p"), F.col("b.l_partkey").alias("q"))
        .agg(F.count("*").alias("co"))
    )
    # item-kNN cap: keep each item's top-M neighbors only (definition
    # shared with the oracle; bounds the candidate fan-out at scale).
    # Above bench scale the cap window shuffles at the scaled width —
    # per-part co-lists are individually bounded, but the
    # reducer-local sort covers every list in the partition.
    if n_parts != default_width:
        co = co.repartition(n_parts, "p")
    wm = W.partitionBy("p").orderBy(F.col("co").desc(), F.col("q").asc())
    co = (
        co.withColumn("nbr_rank", F.row_number().over(wm))
        .where(F.col("nbr_rank") <= _REC_TOP_M)
        .drop("nbr_rank")
    )
    # candidate score per (customer, q): sum of co-occurrence from the
    # customer's train items; exclude items they already have. Owned
    # items ride along as a per-customer set (baskets are small) so the
    # exclusion is an array filter on the o_custkey-keyed join — whose
    # output partitioning the top-3 window then reuses — instead of a
    # third full shuffle of the O(customers × items × M) table.
    owned = train.groupBy("o_custkey").agg(
        F.collect_set("l_partkey").alias("owned_parts")
    )
    # one explicit scaled shuffle by o_custkey: hash(custkey) satisfies
    # the clustered-distribution requirement of BOTH the (custkey, q)
    # aggregate and the per-customer top-3 window below, so the
    # candidate table crosses the wire once instead of twice
    # the (custkey, p) dedup rides a hash(p) repartition — the subset
    # clustering satisfies the 2-column dropDuplicates AND the join on
    # p reuses the same exchange (one shuffle instead of dedup-width +
    # join-width two)
    cand = (
        train.select("o_custkey", F.col("l_partkey").alias("p"))
        .repartition("p")
        .dropDuplicates(["o_custkey", "p"])
        .join(co, "p")
        .repartition(n_parts, "o_custkey")
        .groupBy("o_custkey", "q")
        .agg(F.sum("co").alias("score"))
        .join(owned, "o_custkey")
        .where(~F.array_contains(F.col("owned_parts"), F.col("q")))
        .drop("owned_parts")
    )
    wr = W.partitionBy("o_custkey").orderBy(F.col("score").desc(), F.col("q").asc())
    top3 = cand.withColumn("r", F.row_number().over(wr)).where(F.col("r") <= 3)
    hits = held.join(
        top3.select("o_custkey", F.col("q").alias("held_part")),
        ["o_custkey", "held_part"],
        "left_semi",
    )
    n_eval = held.agg(F.count("*").cast("bigint").alias("n_customers"))
    n_hit = hits.agg(F.count("*").cast("bigint").alias("n_hits"))
    return (
        n_eval.crossJoin(n_hit)
        .select(
            "n_customers",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_customers"), 6).alias("hit_rate_at_3"),
        )
    )


REC_HITRATE_SQL = """
WITH baskets AS (
  SELECT DISTINCT o.o_custkey, o.o_orderdate, l.l_orderkey, l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
marked AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, l_orderkey DESC, l_partkey DESC) AS rn
  FROM baskets),
held AS (SELECT o_custkey, l_partkey AS held_part FROM marked WHERE rn = 1),
train AS (SELECT o_custkey, l_orderkey, l_partkey FROM marked WHERE rn > 1),
co_all AS (
  SELECT a.l_partkey AS p, b.l_partkey AS q, count(*) AS co
  FROM train a JOIN train b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey),
co AS (
  SELECT p, q, co
  FROM (SELECT *, row_number() OVER (PARTITION BY p ORDER BY co DESC, q ASC) AS nbr_rank
        FROM co_all)
  WHERE nbr_rank <= 50),
cand AS (
  SELECT t.o_custkey, c.q, sum(c.co) AS score
  FROM (SELECT DISTINCT o_custkey, l_partkey AS p FROM train) t
  JOIN co c USING (p)
  WHERE NOT EXISTS (SELECT 1 FROM train x
                    WHERE x.o_custkey = t.o_custkey AND x.l_partkey = c.q)
  GROUP BY t.o_custkey, c.q),
top3 AS (
  SELECT o_custkey, q
  FROM (SELECT o_custkey, q,
               row_number() OVER (PARTITION BY o_custkey ORDER BY score DESC, q ASC) AS r
        FROM cand)
  WHERE r <= 3),
hits AS (
  SELECT h.o_custkey FROM held h
  WHERE EXISTS (SELECT 1 FROM top3 t WHERE t.o_custkey = h.o_custkey AND t.q = h.held_part))
SELECT (SELECT count(*)::BIGINT FROM held) AS n_customers,
       (SELECT count(*)::BIGINT FROM hits) AS n_hits,
       round((SELECT count(*) FROM hits) / CAST((SELECT count(*) FROM held) AS DOUBLE), 6) AS hit_rate_at_3
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


def shapley_attribution_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over the three marketing
    touch channels (view, click, signup) — the game-theoretic answer
    to 'which channel deserves the conversion credit', computed in
    closed form because 3 channels = 2³ coalitions: v(S) = conversion
    rate of users whose touch set is exactly covered by S, and each
    channel's Shapley value averages its marginal contribution over
    all orderings. The additivity audit rides along: Σφ = v(grand) −
    v(∅).

    100 TB: users collapse to (has_view, has_click, has_signup,
    converted) — one aggregate; the 8 coalition values and 3 Shapley
    sums are arithmetic on that 8-row table."""
    ev = load_table(spark, "events", sf_dir)
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("a"),
        F.max((F.col("event_type") == "click").cast("int")).alias("b"),
        F.max((F.col("event_type") == "signup").cast("int")).alias("c"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y"),
    )
    # v(S): conversion rate among users whose touches are a subset of S
    # (users outside S's coverage can't be credited to S)
    vs = {}
    cov = lambda mask_a, mask_b, mask_c: (
        ((F.col("a") <= mask_a) & (F.col("b") <= mask_b) & (F.col("c") <= mask_c)).cast("int")
    )
    agg_exprs = []
    for sa in (0, 1):
        for sb in (0, 1):
            for sc in (0, 1):
                name = f"v{sa}{sb}{sc}"
                inset = cov(sa, sb, sc)
                agg_exprs.append(
                    (
                        F.sum(F.col("y") * inset) / F.greatest(F.sum(inset), F.lit(1))
                    ).alias(name)
                )
    v = users.agg(*agg_exprs)
    # Shapley for 3 players: φ_a = Σ_S⊆{b,c} |S|!(2-|S|)!/3! [v(S∪a)-v(S)]
    w0, w1_, w2_ = 2.0 / 6.0, 1.0 / 6.0, 2.0 / 6.0
    phi_a = (
        w0 * (F.col("v100") - F.col("v000"))
        + w1_ * (F.col("v110") - F.col("v010"))
        + w1_ * (F.col("v101") - F.col("v001"))
        + w2_ * (F.col("v111") - F.col("v011"))
    )
    phi_b = (
        w0 * (F.col("v010") - F.col("v000"))
        + w1_ * (F.col("v110") - F.col("v100"))
        + w1_ * (F.col("v011") - F.col("v001"))
        + w2_ * (F.col("v111") - F.col("v101"))
    )
    phi_c = (
        w0 * (F.col("v001") - F.col("v000"))
        + w1_ * (F.col("v101") - F.col("v100"))
        + w1_ * (F.col("v011") - F.col("v010"))
        + w2_ * (F.col("v111") - F.col("v110"))
    )
    total = F.col("v111") - F.col("v000")
    wide = v.select(
        F.round(phi_a, 6).alias("view"),
        F.round(phi_b, 6).alias("click"),
        F.round(phi_c, 6).alias("signup"),
        F.round(total, 6).alias("total_effect"),
        (F.abs(phi_a + phi_b + phi_c - total) < 1e-9).alias("additivity_ok"),
    )
    return wide.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("channel"), F.col("view").alias("shapley")),
                F.struct(F.lit("click").alias("channel"), F.col("click").alias("shapley")),
                F.struct(F.lit("signup").alias("channel"), F.col("signup").alias("shapley")),
            )
        ).alias("s"),
        "total_effect",
        "additivity_ok",
    ).select(
        F.col("s.channel").alias("channel"),
        F.col("s.shapley").alias("shapley"),
        "total_effect",
        "additivity_ok",
    ).orderBy("channel")


SHAPLEY_SQL = """
WITH users AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS b,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id),
v AS (
  SELECT
    sum(y * CASE WHEN a <= 0 AND b <= 0 AND c <= 0 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 0 AND b <= 0 AND c <= 0 THEN 1 ELSE 0 END), 1) AS v000,
    sum(y * CASE WHEN a <= 0 AND b <= 0 AND c <= 1 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 0 AND b <= 0 AND c <= 1 THEN 1 ELSE 0 END), 1) AS v001,
    sum(y * CASE WHEN a <= 0 AND b <= 1 AND c <= 0 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 0 AND b <= 1 AND c <= 0 THEN 1 ELSE 0 END), 1) AS v010,
    sum(y * CASE WHEN a <= 0 AND b <= 1 AND c <= 1 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 0 AND b <= 1 AND c <= 1 THEN 1 ELSE 0 END), 1) AS v011,
    sum(y * CASE WHEN a <= 1 AND b <= 0 AND c <= 0 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 1 AND b <= 0 AND c <= 0 THEN 1 ELSE 0 END), 1) AS v100,
    sum(y * CASE WHEN a <= 1 AND b <= 0 AND c <= 1 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 1 AND b <= 0 AND c <= 1 THEN 1 ELSE 0 END), 1) AS v101,
    sum(y * CASE WHEN a <= 1 AND b <= 1 AND c <= 0 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 1 AND b <= 1 AND c <= 0 THEN 1 ELSE 0 END), 1) AS v110,
    sum(y * CASE WHEN a <= 1 AND b <= 1 AND c <= 1 THEN 1 ELSE 0 END) / greatest(sum(CASE WHEN a <= 1 AND b <= 1 AND c <= 1 THEN 1 ELSE 0 END), 1) AS v111
  FROM users),
phi AS (
  SELECT
    (2.0/6)*(v100 - v000) + (1.0/6)*(v110 - v010) + (1.0/6)*(v101 - v001) + (2.0/6)*(v111 - v011) AS pa,
    (2.0/6)*(v010 - v000) + (1.0/6)*(v110 - v100) + (1.0/6)*(v011 - v001) + (2.0/6)*(v111 - v101) AS pb,
    (2.0/6)*(v001 - v000) + (1.0/6)*(v101 - v100) + (1.0/6)*(v011 - v010) + (2.0/6)*(v111 - v110) AS pc,
    v111 - v000 AS total
  FROM v)
SELECT channel, shapley, round(total, 6) AS total_effect,
       abs(pa + pb + pc - total) < 1e-9 AS additivity_ok
FROM phi, LATERAL (VALUES ('view', round(pa, 6)), ('click', round(pb, 6)), ('signup', round(pc, 6))) t(channel, shapley)
ORDER BY channel
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



def process_conformance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Process-mining conformance check — the discovery side
    (event_transition_matrix) grades what DOES happen; this grades it
    against what SHOULD: a declared process model (signup→view,
    view→{view, click}, click→{view, click, purchase}, purchase→view,
    error→anything, anything→error) and, per user trace, the fraction
    of directly-follows transitions the model allows. Output per
    event-type pair: observed count, allowed flag, and the summary
    fitness (allowed transitions / all transitions) repeated for
    single-table reads — the audit that catches instrumentation bugs
    and impossible flows.

    100 TB: traces order within user partitions (lag over the
    user-keyed window); the census is one (from, to) aggregate; the
    model is a broadcast O(types²) table."""
    from pyspark.sql import Window as W

    allowed = [
        ("signup", "view"), ("view", "view"), ("view", "click"),
        ("click", "view"), ("click", "click"), ("click", "purchase"),
        ("purchase", "view"),
    ]
    # error is a wildcard both ways
    types = ["view", "click", "purchase", "signup", "error"]
    allowed = set(allowed) | {("error", t) for t in types} | {(t, "error") for t in types}
    ev = load_table(spark, "events", sf_dir)
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type", 1).over(wu))
        .where(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").cast("bigint").alias("n_observed"))
    )
    model = spark.createDataFrame(
        sorted(allowed), "from_type string, to_type string"
    ).withColumn("allowed", F.lit(True))
    scored = trans.join(F.broadcast(model), ["from_type", "to_type"], "left").select(
        "from_type",
        "to_type",
        "n_observed",
        F.coalesce("allowed", F.lit(False)).alias("allowed"),
    )
    fitness = scored.agg(
        F.round(
            F.sum(F.when(F.col("allowed"), F.col("n_observed")).otherwise(0))
            / F.sum("n_observed"),
            6,
        ).alias("fitness")
    )
    return (
        scored.crossJoin(F.broadcast(fitness))
        .orderBy("from_type", "to_type")
    )


_CONFORMANCE_ALLOWED = ", ".join(
    f"('{a}', '{b}')"
    for a, b in sorted(
        {("signup", "view"), ("view", "view"), ("view", "click"),
         ("click", "view"), ("click", "click"), ("click", "purchase"),
         ("purchase", "view")}
        | {("error", t) for t in ["view", "click", "purchase", "signup", "error"]}
        | {(t, "error") for t in ["view", "click", "purchase", "signup", "error"]}
    )
)

CONFORMANCE_SQL = f"""
WITH trans AS (
  SELECT prev AS from_type, event_type AS to_type, count(*)::BIGINT AS n_observed
  FROM (SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events)
  WHERE prev IS NOT NULL
  GROUP BY prev, event_type),
model(from_type, to_type) AS (VALUES {_CONFORMANCE_ALLOWED}),
scored AS (
  SELECT t.from_type, t.to_type, t.n_observed,
         m.from_type IS NOT NULL AS allowed
  FROM trans t LEFT JOIN model m
    ON t.from_type = m.from_type AND t.to_type = m.to_type),
fitness AS (
  SELECT round(sum(CASE WHEN allowed THEN n_observed ELSE 0 END)
               / CAST(sum(n_observed) AS DOUBLE), 6) AS fitness
  FROM scored)
SELECT from_type, to_type, n_observed, allowed, fitness
FROM scored CROSS JOIN fitness
ORDER BY from_type, to_type
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
    median is per-priority over ≤ days²/2 slopes."""
    o = load_table(spark, "orders", sf_dir)
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    daily = daily.select(
        "o_orderpriority",
        F.datediff(F.col("d"), F.lit("1992-01-01").cast("date")).alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    a, b = daily.alias("a"), daily.alias("b")
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


def spearman_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlations between quantity, extended price,
    and discount WITHIN each lineitem return-flag segment — the
    monotone-association matrix (Pearson on average ranks, so ties in
    the heavily quantized quantity/discount columns are handled
    exactly). Per-segment because a global per-row rank is a global
    sort; segment partitioning is both the statistical intent
    (association within regime) and the scale-safe plan.

    100 TB: the three rank passes share one returnflag-partition
    shuffle (three in-partition sorts); avg_rank = min_rank +
    (ties−1)/2 needs one extra count window per column; the final
    corr is a per-segment moment aggregate."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag",
        F.col("l_quantity").alias("q"),
        F.col("l_extendedprice").alias("p"),
        F.col("l_discount").alias("disc"),
    )
    d = li
    for col in ("q", "p", "disc"):
        wr = W.partitionBy("l_returnflag").orderBy(col)
        wt = W.partitionBy("l_returnflag", col)
        d = d.withColumn(
            f"r_{col}",
            F.rank().over(wr) + (F.count(F.lit(1)).over(wt) - 1) / 2.0,
        )
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


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph — the clustering
    signal behind 'bought-together' communities. Edges are part pairs
    co-occurring in ≥2 distinct orders (support pruning is the
    standard co-occurrence sparsifier: it kills the quadratic noise
    floor of one-off baskets BEFORE any pairwise work, the same role
    the LSH band key plays for text). Triangles close ordered paths
    x<y<z via one self-join on the shared endpoint plus one
    membership join back to the edge list — never an all-pairs pass;
    the canonical ordering counts each triangle exactly once. Wedges
    are counted per-vertex as Σ C(deg,2) from the undirected degree
    table (NOT from the ordered-path join, which would see only the
    ~1/3 of wedges whose center has the middle vertex id), so the
    emitted 3·T/W really is the global clustering coefficient
    (transitivity) and is bounded by 1.

    100 TB: basket pair-generation is bounded by orderline count
    (≤ items² per order, items ≤ 7); the support filter shrinks the
    edge list orders of magnitude before the path join; the degree
    table is one hash aggregate over 2·|E| rows."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    edges = edges.localCheckpoint()  # one support-pruned edge list feeds all three
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    paths = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
    )
    tri = paths.join(
        e3, (F.col("x") == F.col("e3.u")) & (F.col("z") == F.col("e3.v"))
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ne = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # coalesce keeps n_wedges=0 (and coeff 0.0) on an edgeless graph
    # instead of a silently-nullable NULL/NULL row (ADVICE r7)
    nw = deg.agg(
        F.coalesce(
            F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long")), F.lit(0)
        ).cast("long").alias("n_wedges")
    )
    nt = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return ne.crossJoin(nw).crossJoin(nt).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
        .alias("clustering_coeff"),
    )


TRIANGLE_COUNT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
edges AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= 2),
paths AS (
  SELECT e1.u AS x, e1.v AS y, e2.v AS z
  FROM edges e1 JOIN edges e2 ON e1.v = e2.u),
tri AS (
  SELECT 1 FROM paths w JOIN edges e ON w.x = e.u AND w.z = e.v),
deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges)
  GROUP BY node),
wedge_total AS (
  SELECT CAST(coalesce(sum(CAST(deg * (deg - 1) // 2 AS BIGINT)), 0) AS BIGINT) AS n_wedges
  FROM deg)
SELECT (SELECT count(*) FROM edges)::BIGINT AS n_edges,
       (SELECT n_wedges FROM wedge_total) AS n_wedges,
       (SELECT count(*) FROM tri)::BIGINT AS n_triangles,
       CASE WHEN (SELECT n_wedges FROM wedge_total) = 0 THEN 0.0
            ELSE round(3.0 * (SELECT count(*) FROM tri)
                       / (SELECT n_wedges FROM wedge_total), 6) END
         AS clustering_coeff
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


def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power-iteration step on the support-pruned part
    co-purchase graph (same ≥2-order edge list as
    graph_triangle_count): from the uniform start r₀ = 1, r₁(v) =
    0.15 + 0.85·Σ_{u∼v} r₀(u)/deg(u) — the influence scores that
    rank 'hub' parts in the bought-together network. One step as a
    catalog entry (the iterated loop is the label_propagation /
    linear_probe_gd pattern: alternate join + aggregate to a fixed
    point); top 10 parts.

    100 TB: degrees are one aggregate; the step is one equi-join on
    the edge endpoint + one sum per node — BSP superstep as pure
    dataflow, no driver round-trip."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    contrib = und.join(deg, "u").select("v", (1.0 / F.col("deg")).alias("c"))
    return (
        contrib.groupBy("v")
        .agg(F.round(0.15 + 0.85 * F.sum("c"), 6).alias("rank_1"),
             F.count(F.lit(1)).cast("bigint").alias("in_neighbors"))
        .select(F.col("v").alias("part_key"), "in_neighbors", "rank_1")
        .orderBy(F.col("rank_1").desc(), "part_key")
        .limit(10)
    )


PAGERANK_STEP_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= 2),
deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS deg FROM und GROUP BY u),
contrib AS (SELECT und.v, 1.0 / deg.deg AS c FROM und JOIN deg USING (u))
SELECT v AS part_key,
       CAST(count(*) AS BIGINT) AS in_neighbors,
       round(0.15 + 0.85 * sum(c), 6) AS rank_1
FROM contrib
GROUP BY v
ORDER BY rank_1 DESC, part_key
LIMIT 10
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


def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly cohort retention: customers grouped by first-order
    month, tracked for the share still ordering k months later
    (k = 1, 3, 6) — the classic triangle read as three retention
    columns per cohort. The LLM-pipeline reading: contributor/source
    retention across corpus snapshots uses the identical shape.

    100 TB: first-order month is one min-aggregate per customer;
    each retention column is a semi-join of cohort customers against
    the month-offset order set, counted — three broadcastable
    aggregates over the (customer, month) distinct table."""
    o = load_table(spark, "orders", sf_dir)
    cm = o.select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    ).distinct()
    first = cm.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    j = first.join(cm, "o_custkey").select(
        "o_custkey",
        "cohort",
        F.round(F.months_between(F.col("m"), F.col("cohort"))).cast("int").alias("k"),
    )
    ret = j.groupBy("cohort").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("cohort_size"),
        *[
            F.round(
                F.countDistinct(F.when(F.col("k") == kk, F.col("o_custkey")))
                / F.countDistinct("o_custkey"),
                6,
            ).alias(f"ret_m{kk}")
            for kk in (1, 3, 6)
        ],
    )
    return ret.select(
        F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
        "cohort_size",
        "ret_m1",
        "ret_m3",
        "ret_m6",
    ).orderBy("cohort_month")


COHORT_RETENTION_SQL = """
WITH cm AS (
  SELECT DISTINCT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders),
first AS (
  SELECT o_custkey, min(m) AS cohort FROM cm GROUP BY o_custkey),
j AS (
  SELECT cm.o_custkey, first.cohort,
         CAST(round(datediff('month', first.cohort, cm.m)) AS INT) AS k
  FROM first JOIN cm USING (o_custkey))
SELECT strftime(cohort, '%Y-%m') AS cohort_month,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_size,
       round(count(DISTINCT CASE WHEN k = 1 THEN o_custkey END)
             / count(DISTINCT o_custkey), 6) AS ret_m1,
       round(count(DISTINCT CASE WHEN k = 3 THEN o_custkey END)
             / count(DISTINCT o_custkey), 6) AS ret_m3,
       round(count(DISTINCT CASE WHEN k = 6 THEN o_custkey END)
             / count(DISTINCT o_custkey), 6) AS ret_m6
FROM j
GROUP BY cohort
ORDER BY cohort_month
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


def als_rank1_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One rank-1 implicit-ALS half-step on the customer×part
    purchase matrix: with item factors fixed at v_j = popularity
    (order count, L2-normalized via a broadcast scalar), each
    customer's optimal factor is the closed-form least-squares
    u_i = Σ_j r_ij·v_j / Σ_j v_j² over their purchased items
    (r_ij = quantity). The alternating loop is the linear_probe_gd /
    label_propagation pattern; one half-step, top 10 customers by
    factor.

    100 TB: item factors are one aggregate joined back broadcast;
    the customer solve is one grouped aggregate over order lines —
    a BSP half-step with no driver round-trip."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    r = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_custkey", "l_partkey", F.col("l_quantity").alias("r")
    )
    item = r.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("double").alias("pop"))
    nrm = item.agg(F.sqrt(F.sum(F.col("pop") * F.col("pop"))).alias("nrm"))
    v = item.crossJoin(F.broadcast(nrm)).select(
        "l_partkey", (F.col("pop") / F.col("nrm")).alias("v")
    )
    u = (
        r.join(v, "l_partkey")
        .groupBy("o_custkey")
        .agg(
            (F.sum(F.col("r") * F.col("v")) / F.sum(F.col("v") * F.col("v"))).alias("u"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )
    return (
        u.select("o_custkey", "n_items", F.round("u", 6).alias("factor"))
        .orderBy(F.col("factor").desc(), "o_custkey")
        .limit(10)
    )


ALS_RANK1_SQL = """
WITH r AS (
  SELECT o.o_custkey, l.l_partkey, l.l_quantity AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
item AS (
  SELECT l_partkey, CAST(count(*) AS DOUBLE) AS pop FROM r GROUP BY l_partkey),
nrm AS (SELECT sqrt(sum(pop * pop)) AS nrm FROM item),
v AS (SELECT l_partkey, pop / nrm.nrm AS v FROM item CROSS JOIN nrm),
u AS (
  SELECT o_custkey,
         sum(r.r * v.v) / sum(v.v * v.v) AS u,
         CAST(count(*) AS BIGINT) AS n_items
  FROM r JOIN v USING (l_partkey)
  GROUP BY o_custkey)
SELECT o_custkey, n_items, round(u, 6) AS factor
FROM u
ORDER BY factor DESC, o_custkey
LIMIT 10
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


def recency_weighted_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay popularity score per part: Σ over order
    lines of exp(−age_days/90) anchored at the corpus's max ship date
    (data-derived so the score is deterministic) — the recsys/feature-
    store popularity feature where yesterday's order counts ~90× this
    quarter's-start one. Top 15 parts with their raw count for
    contrast.

    100 TB: the anchor is a 1-row broadcast; the score is a map-side
    expression into one per-part aggregate; TakeOrdered caps
    output."""
    li = load_table(spark, "lineitem", sf_dir)
    anchor = li.agg(F.max(F.to_date("l_shipdate")).alias("d1"))
    scored = li.crossJoin(F.broadcast(anchor)).select(
        "l_partkey",
        F.exp(
            -F.datediff(F.col("d1"), F.to_date("l_shipdate")) / F.lit(90.0)
        ).alias("w"),
    )
    return (
        scored.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.sum("w"), 6).alias("decayed_popularity"),
        )
        .orderBy(F.col("decayed_popularity").desc(), "l_partkey")
        .limit(15)
    )


RECENCY_POP_SQL = """
WITH anchor AS (SELECT max(CAST(l_shipdate AS DATE)) AS d1 FROM lineitem),
scored AS (
  SELECT l_partkey,
         exp(-datediff('day', CAST(l_shipdate AS DATE), anchor.d1) / 90.0) AS w
  FROM lineitem CROSS JOIN anchor)
SELECT l_partkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(w), 6) AS decayed_popularity
FROM scored
GROUP BY l_partkey
ORDER BY decayed_popularity DESC, l_partkey
LIMIT 15
"""


def basket_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining on order baskets: for part pairs
    co-occurring in ≥ 3 orders, support/confidence/lift of the rule
    A→B — the market-basket classic, and the rule-mining complement
    to the co-purchase GRAPH entries (pagerank/triangles read
    structure; lift reads strength vs independence). Top 15 rules by
    lift.

    100 TB: basket pair generation is orderline-bounded (items ≤ 7
    per order); the support filter prunes before any division; part
    priors are one aggregate broadcast into the rule table."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select("l_orderkey", "l_partkey").distinct()
    n = op.agg(F.countDistinct("l_orderkey").cast("double").alias("n_orders"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("ante"), F.col("b.l_partkey").alias("cons"))
        .agg(F.count(F.lit(1)).cast("double").alias("n_ab"))
        .where(F.col("n_ab") >= 3)
    )
    prior = op.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("double").alias("n_p"))
    pa = prior.select(F.col("l_partkey").alias("ante"), F.col("n_p").alias("n_a"))
    pb = prior.select(F.col("l_partkey").alias("cons"), F.col("n_p").alias("n_b"))
    rules = pair.join(pa, "ante").join(pb, "cons").crossJoin(F.broadcast(n))
    return rules.select(
        "ante",
        "cons",
        F.col("n_ab").cast("bigint").alias("n_both"),
        F.round(F.col("n_ab") / F.col("n_orders"), 6).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
        F.round(
            F.col("n_ab") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 6
        ).alias("lift"),
    ).orderBy(F.col("lift").desc(), "ante", "cons").limit(15)


BASKET_LIFT_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM op),
pair AS (
  SELECT a.l_partkey AS ante, b.l_partkey AS cons,
         CAST(count(*) AS DOUBLE) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 3),
prior AS (
  SELECT l_partkey, CAST(count(*) AS DOUBLE) AS n_p FROM op GROUP BY 1)
SELECT pair.ante, pair.cons,
       CAST(n_ab AS BIGINT) AS n_both,
       round(n_ab / n.n_orders, 6) AS support,
       round(n_ab / pa.n_p, 6) AS confidence,
       round(n_ab * n.n_orders / (pa.n_p * pb.n_p), 6) AS lift
FROM pair
JOIN prior pa ON pa.l_partkey = pair.ante
JOIN prior pb ON pb.l_partkey = pair.cons
CROSS JOIN n
ORDER BY lift DESC, ante, cons
LIMIT 15
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


def price_elasticity_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: OLS slope of
    ln(quantity) on ln(unit price) over order lines — the constant-
    elasticity model's closed form (elasticity < −1 = elastic:
    price cuts grow revenue). Unit price derives as
    extendedprice/quantity; the fit is per-brand moments only.

    100 TB: one map-side projection + per-brand moment aggregate —
    no joins beyond the part-dim broadcast."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    d = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("x"),
        F.log("l_quantity").alias("y"),
    )
    g = d.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.avg("y").alias("ybar"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
    )
    beta = (F.col("sxy_raw") - F.col("n") * F.col("xbar") * F.col("ybar")) / (
        F.col("sxx_raw") - F.col("n") * F.col("xbar") * F.col("xbar")
    )
    return g.select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        F.round(beta, 6).alias("elasticity"),
        (beta < -1).alias("elastic"),
    ).orderBy("p_brand")


PRICE_ELASTICITY_SQL = """
WITH d AS (
  SELECT p.p_brand,
         ln(l.l_extendedprice / l.l_quantity) AS x,
         ln(l.l_quantity) AS y
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
g AS (
  SELECT p_brand, CAST(count(*) AS DOUBLE) AS n, avg(x) AS xbar, avg(y) AS ybar,
         sum(x * x) AS sxx_raw, sum(x * y) AS sxy_raw
  FROM d GROUP BY p_brand)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_lines,
       round((sxy_raw - n * xbar * ybar) / (sxx_raw - n * xbar * xbar), 6) AS elasticity,
       (sxy_raw - n * xbar * ybar) / (sxx_raw - n * xbar * xbar) < -1 AS elastic
FROM g
ORDER BY p_brand
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


def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (support ≥2
    edges, the pagerank_step/triangle edge list): the Pearson
    correlation of endpoint degrees over edges — positive means hubs
    buy with hubs (rich-club), negative means hub-and-spoke. One
    scalar that says whether degree-based partitioning will skew.

    100 TB: degrees are one aggregate joined back; the correlation
    is a 1-row moment reduction over the edge list."""
    li = load_table(spark, "lineitem", sf_dir)
    op = li.select("l_orderkey", "l_partkey").distinct()
    a, b = op.alias("a"), op.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .select("u", "v")
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    du = deg.select(F.col("u").alias("u2"), F.col("deg").alias("du"))
    dv = deg.select(F.col("u").alias("v2"), F.col("deg").alias("dv"))
    e = und.join(du, und.u == du.u2).join(dv, und.v == dv.v2)
    r = e.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.avg("du").alias("mu"),
        F.avg("dv").alias("mv"),
        F.sum(F.col("du") * F.col("dv")).alias("suv"),
        F.sum(F.col("du") * F.col("du")).alias("suu"),
        F.sum(F.col("dv") * F.col("dv")).alias("svv"),
    )
    cov = F.col("suv") - F.col("m") * F.col("mu") * F.col("mv")
    vu = F.col("suu") - F.col("m") * F.col("mu") * F.col("mu")
    vv = F.col("svv") - F.col("m") * F.col("mv") * F.col("mv")
    return r.select(
        F.col("m").cast("bigint").alias("n_edges"),
        F.round(F.col("mu"), 6).alias("mean_degree"),
        F.round(cov / F.sqrt(vu * vv), 6).alias("assortativity"),
    )


ASSORTATIVITY_SQL = """
WITH op AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
und AS (
  SELECT a.p AS u, b.p AS v
  FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
  GROUP BY a.p, b.p
  HAVING count(*) >= 2),
deg AS (SELECT u, CAST(count(*) AS DOUBLE) AS deg FROM und GROUP BY u),
e AS (
  SELECT du.deg AS du, dv.deg AS dv
  FROM und JOIN deg du ON und.u = du.u JOIN deg dv ON und.v = dv.u),
r AS (
  SELECT CAST(count(*) AS DOUBLE) AS m, avg(du) AS mu, avg(dv) AS mv,
         sum(du * dv) AS suv, sum(du * du) AS suu, sum(dv * dv) AS svv
  FROM e)
SELECT CAST(m AS BIGINT) AS n_edges,
       round(mu, 6) AS mean_degree,
       round((suv - m * mu * mv)
             / sqrt((suu - m * mu * mu) * (svv - m * mv * mv)), 6) AS assortativity
FROM r
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
    index join is broadcast; the pair space is unchanged."""
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
    a, b = idxd.alias("a"), idxd.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        ((F.col("b.ya") - F.col("a.ya")) / (F.col("b.x") - F.col("a.x"))).alias("sa"),
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("sr"),
    )
    return (
        pairs.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.median("sr"), 6).alias("raw_slope"),
            F.round(F.median("sa"), 6).alias("adjusted_slope"),
        )
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

"""Relational operator suite (SURVEY.md §2 B) over the TPC-H-ish
testdata. The reference has none of these (its only query algebra is
positional — SURVEY.md §2); they are the analytical surface the
north-star requires, expressed as declarative DataFrame plans so
Catalyst owns pushdown/pruning/join-selection and AQE owns skew.

Conventions (driver contract):
* every computed column is aliased, identically to the oracle SQL;
* doubles are rounded at a precision where Spark-vs-DuckDB summation
  order cannot flip the rounded value (inputs have <=4 decimals →
  sums rounded to <=2-4 decimals are stable);
* timestamps leave the engine as epoch micros or formatted strings —
  never raw timestamp objects — to dodge tz/precision ambiguity.

Scale notes are per-function; the common ones:
* region/nation are O(10-100) rows at any SF → always broadcast;
* orders/lineitem/customer scale with SF → shuffle joins on their
  keys, which AQE re-plans at runtime (skew split, partition
  coalescing);
* aggregations are partial+final automatically (hash agg with
  map-side combine) — no hand-rolled pre-aggregation needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table


# ---------------------------------------------------------------- TPC-H-ish


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report. Single-table scan+agg:
    predicate and the 7-column projection push into the parquet scan;
    partial aggregation runs map-side, so the shuffle carries only
    (flag,status) groups — at 100 TB this stays a 4-group exchange."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10. customer⋈orders
    shuffles on custkey, then ⋈lineitem on orderkey; the top-10 is
    TakeOrderedAndProject (no global sort materialization)."""
    cust = load_table(spark, "customer", sf_dir).where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, "orders", sf_dir).where(F.col("o_orderdate") < F.lit("1997-01-01"))
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_shipdate") > F.lit("1997-01-01"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            F.col("o_orderkey"),
            F.col("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region→nation are broadcast
    (O(10) rows at any SF); fact-side joins shuffle on their keys.
    Catalyst reorders so the selective region filter prunes first."""
    region = F.broadcast(load_table(spark, "region", sf_dir).where(F.col("r_name") == "ASIA"))
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load_table(spark, "lineitem", sf_dir)
    supp = load_table(spark, "supplier", sf_dir)
    return (
        region.join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(supp, (li.l_suppkey == supp.s_suppkey) & (supp.s_nationkey == nation.n_nationkey))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = n_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter+agg; all four predicates push to parquet
    row-group stats, projection is 2 columns — minimal I/O at scale."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1996-10-01")) & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_returnflag") == "R")
    nation = F.broadcast(load_table(spark, "nation", sf_dir))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------- join variants


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers holding at least one urgent
    order. Semi-join only carries the left side through the shuffle —
    at scale, strictly cheaper than inner-join+distinct."""
    cust = load_table(spark, "customer", sf_dir)
    urgent = load_table(spark, "orders", sf_dir).where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of per-nation customer and supplier account
    totals — exercises outer-join null handling + coalesce."""
    cust = (
        load_table(spark, "customer", sf_dir)
        .groupBy("c_nationkey")
        .agg(F.round(F.sum("c_acctbal"), 2).alias("cust_bal"))
    )
    supp = (
        load_table(spark, "supplier", sf_dir)
        .groupBy("s_nationkey")
        .agg(F.round(F.sum("s_acctbal"), 2).alias("supp_bal"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce(cust.c_nationkey, supp.s_nationkey).alias("nationkey"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
        .orderBy("nationkey")
    )


JOIN_OUTER_SQL = """
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       coalesce(c.cust_bal, 0.0) AS cust_bal,
       coalesce(s.supp_bal, 0.0) AS supp_bal
FROM (SELECT c_nationkey, round(sum(c_acctbal), 2) AS cust_bal FROM customer GROUP BY c_nationkey) c
FULL OUTER JOIN (SELECT s_nationkey, round(sum(s_acctbal), 2) AS supp_bal FROM supplier GROUP BY s_nationkey) s
  ON c.c_nationkey = s.s_nationkey
ORDER BY nationkey
"""


# ------------------------------------------------------------ aggregations


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact + approximate distinct aggregation. countDistinct expands
    to a two-phase aggregate; approx_count_distinct is HLL++ — the
    scale path when exact cardinality isn't required (single pass,
    constant memory)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderpriority")
    )


AGG_DISTINCT_SQL = """
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over (returnflag, linestatus)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over (orderstatus, orderpriority)."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of pivot_events: per-returnflag
    quantity/price/discount totals folded from columns into
    (metric, value) rows. `DataFrame.unpivot` is Catalyst's Expand
    node — one pass, rows × n_metrics output, no shuffle beyond the
    feeding aggregate; the same Expand powers rollup/cube, so this
    closes the reshape family."""
    li = load_table(spark, "lineitem", sf_dir)
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "sum_disc"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "metric")
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(sum(l_discount), 2) AS sum_disc
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, metric, value
FROM (
  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM wide)
ORDER BY l_returnflag, metric
"""


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns. Fixed pivot values
    keep the plan a single pass (no distinct-values pre-query)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .select(
            "user_id",
            F.col("click").alias("n_click"),
            F.col("view").alias("n_view"),
            F.col("purchase").alias("n_purchase"),
            F.col("signup").alias("n_signup"),
            F.col("error").alias("n_error"),
        )
        .orderBy("user_id")
    )


PIVOT_SQL = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       count(*) FILTER (WHERE event_type = 'error') AS n_error
FROM events
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------- windows


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per supplier in shipdate order (deterministic
    tie-break on orderkey+linenumber). One shuffle on l_suppkey, then
    a sorted in-partition scan — the window never re-shuffles."""
    li = load_table(spark, "lineitem", sf_dir).where(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


WINDOW_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price via row_number — the
    partitioned-top-k idiom (beats global sort; each partition keeps
    a 3-row heap)."""
    orders = load_table(spark, "orders", sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders)
WHERE rnk <= 3
ORDER BY o_custkey, rnk
"""


def window_lag_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-user inter-event value delta and gap seconds."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        )
        .where(F.col("value_delta").isNotNull())
        .orderBy("user_id", "event_id")
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id, value_delta, gap_us
FROM (
  SELECT user_id, event_id,
         round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS value_delta,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
WHERE value_delta IS NOT NULL
ORDER BY user_id, event_id
"""


def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k = TakeOrderedAndProject: each task keeps k rows,
    driver merges — no full sort at any scale."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .limit(10)
    )


TOPK_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 10
"""


# ----------------------------------------------------------------- set ops


def setop_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT/UNION in one result: per-nation presence of
    customers vs suppliers, tagged by which set operation produced it."""
    cust_nations = load_table(spark, "customer", sf_dir).select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = load_table(spark, "supplier", sf_dir).select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_nations.intersect(supp_nations).withColumn("tag", F.lit("both"))
    cust_only = cust_nations.exceptAll(supp_nations).withColumn("tag", F.lit("customer_only"))
    supp_only = supp_nations.exceptAll(cust_nations).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("tag", "nationkey")


SETOP_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'customer_only' AS tag FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'supplier_only' AS tag FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
ORDER BY tag, nationkey
"""


# --------------------------------------------------------- scalar functions


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions on the `props` payload column — the
    CloudEvents `data` access pattern (raw JSON string, parsed lazily;
    SURVEY.md §1.3). get_json_object is JVM-side codegen — no UDF."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


JSON_SQL = """
SELECT event_type,
       count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: truncation, extraction, formatting."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.quarter("o_orderdate").cast("bigint").alias("qtr"),
            "o_totalprice",
        )
        .groupBy("yr", "qtr")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("yr", "qtr")
    )


DATE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY yr, qtr
ORDER BY yr, qtr
"""


def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: substring, upper, concat, length,
    regexp — grouped to keep the result compact."""
    part = load_table(spark, "part", sf_dir)
    return (
        part.select(
            F.upper(F.substring("p_brand", 1, 5)).alias("brand_prefix"),
            F.length("p_name").cast("bigint").alias("name_len"),
            (F.regexp_count(F.col("p_type"), F.lit(" ")) + F.lit(1)).cast("bigint").alias("type_words"),
        )
        .groupBy("brand_prefix")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("name_len").alias("total_name_len"),
            F.round(F.avg("type_words"), 4).alias("avg_type_words"),
        )
        .orderBy("brand_prefix")
    )


STRING_SQL = """
SELECT upper(substring(p_brand, 1, 5)) AS brand_prefix,
       count(*) AS n_parts,
       CAST(sum(length(p_name)) AS BIGINT) AS total_name_len,
       round(avg(CAST(len(string_split(p_type, ' ')) AS BIGINT)), 4) AS avg_type_words
FROM part
GROUP BY brand_prefix
ORDER BY brand_prefix
"""


# ------------------------------------------------- time windows / sessions


def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    groupBy(window(...)) — same semantics, Structured Streaming adds
    the watermark; see streaming/windows.py)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


TUMBLING_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + running
    sum of session-start flags — the batch equivalent of
    F.session_window. Two window passes over one shuffle on user_id."""
    ev = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        # compare in MICROS: cast('long') truncates to seconds while
        # the oracle's epoch() keeps fractions — near the 1800 s
        # boundary the truncated gap can disagree with the real one
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > 1800 * 1_000_000, 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
        .orderBy("user_id", "session_id")
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 2) AS session_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# ------------------------------------------------- as-of / range joins


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the latest strictly-prior
    click by the same user. Expressed as ONE window pass over the
    unioned stream (partition by user, running last-click carry-
    forward) instead of an inequality join — a single shuffle on
    user_id, linear scan per partition, no pair explosion. This is
    the scalable as-of pattern at 100 TB (the join formulation is
    quadratic in hot keys; the window formulation never is)."""
    ev = load_table(spark, "events", sf_dir).where(F.col("event_type").isin("click", "purchase"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    enriched = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True).over(w).alias("last_click_id"),
        F.last(F.when(is_click, F.unix_micros("ts")), ignorenulls=True).over(w).alias("last_click_ts_us"),
    )
    return (
        enriched.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "ts_us",
            "last_click_id",
            (F.col("ts_us") - F.col("last_click_ts_us")).alias("click_to_purchase_us"),
        )
        .orderBy("user_id", "purchase_id")
    )


JOIN_ASOF_SQL = """
SELECT user_id, event_id AS purchase_id, ts_us, last_click_id,
       ts_us - last_click_ts_us AS click_to_purchase_us
FROM (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
           OVER w AS last_click_id,
         last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS last_click_ts_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
WHERE event_type = 'purchase'
ORDER BY user_id, purchase_id
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (equi + interval predicate): lineitems shipped
    within 60 days of their order's date. The equi key keeps the join
    hash/sort-merge-able; the range predicate evaluates post-match —
    the shape to prefer over pure-inequality joins, which explode.
    Revenue per order priority over the matched window."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate < F.date_add(orders.o_orderdate, 60))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


JOIN_RANGE_SQL = """
SELECT o_orderpriority,
       count(*) AS n_lineitems,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (§2 B scalar functions row):
    size / filter / transform / aggregate / slice / element-wise math
    over the embedding vectors — all JVM-side lambda expressions, the
    fast path for array-typed feature columns (no UDF, no explode).
    Left-fold sums keep the evaluation order identical to the
    oracle's list_reduce."""
    from hematite_spark.functions import dbl

    emb = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 100)
    ev = dbl("embedding")
    abs_ev = F.transform(ev, lambda x: F.abs(x))
    return (
        emb.select(
            "vec_id",
            F.size("embedding").cast("bigint").alias("n_dims"),
            F.size(F.filter(ev, lambda x: x > 0)).cast("bigint").alias("n_pos"),
            F.round(F.aggregate(abs_ev, F.lit(0.0), lambda a, x: a + x), 4).alias("l1_norm"),
            F.round(F.array_max(abs_ev), 4).alias("max_abs"),
            F.round(
                F.aggregate(F.slice(ev, 1, 3), F.lit(0.0), lambda a, x: a + x), 4
            ).alias("head3_sum"),
        )
        .orderBy("vec_id")
    )


ARRAY_FUNCTIONS_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS n_dims,
       CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0)) AS BIGINT) AS n_pos,
       round(list_reduce(list_prepend(0.0, list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                         (a, x) -> a + x), 4) AS l1_norm,
       round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS max_abs,
       round(list_reduce(list_prepend(0.0, list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))),
                         (a, x) -> a + x), 4) AS head3_sum
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
"""


def incremental_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of per-user session counts: the
    log is split at a cut timestamp into STATE (already processed)
    and DELTA (newly arrived), and the delta pass touches only the
    new events plus an O(users) state summary (session count + last
    event time per user) — never re-reading processed history. The
    first delta event per user decides merge-or-open against the
    state's last timestamp; everything downstream is ordinary gap
    sessionization of the delta.

    The ORACLE sessionizes the full log in one pass — so the driver
    check proves the incremental decomposition equals the full
    recomputation, which is the IVM contract. At 100 TB this is the
    nightly-sessions job: state summary lives in the lake, each run
    shuffles only the day's delta on user_id."""
    gap_us = 1800 * 1_000_000
    cut = "2024-01-22"
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id")
    state = ev.where(F.col("ts") < F.lit(cut).cast("timestamp"))
    delta = ev.where(F.col("ts") >= F.lit(cut).cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # O(users) state summary: sessions so far + the open session's tail
    state_sum = (
        state.select(
            "user_id",
            F.when(
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w) > gap_us, 1
            )
            .otherwise(0)
            .alias("new_s"),
            "ts",
        )
        .groupBy("user_id")
        .agg(
            (F.sum("new_s") + 1).cast("bigint").alias("state_sessions"),
            F.max(F.unix_micros("ts")).alias("last_us"),
        )
    )
    d = delta.select("user_id", F.unix_micros("ts").alias("us"), "event_id").join(
        state_sum.select("user_id", "last_us"), "user_id", "left"
    )
    flagged = d.select(
        "user_id",
        F.coalesce(
            # within-delta gap when a predecessor exists...
            (F.col("us") - F.lag("us").over(W.partitionBy("user_id").orderBy("us", "event_id")) > gap_us).cast("int"),
            # ...else the stitch decision against the state tail
            F.when(F.col("last_us").isNull(), 1)
            .when(F.col("us") - F.col("last_us") > gap_us, 1)
            .otherwise(0),
        ).alias("new_s"),
    )
    delta_sum = flagged.groupBy("user_id").agg(F.sum("new_s").cast("bigint").alias("delta_sessions"))
    return (
        state_sum.select("user_id", "state_sessions")
        .join(delta_sum, "user_id", "full")
        .select(
            "user_id",
            (F.coalesce("state_sessions", F.lit(0)) + F.coalesce("delta_sessions", F.lit(0)))
            .cast("bigint")
            .alias("n_sessions"),
        )
        .orderBy("user_id")
    )


INCREMENTAL_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
              WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions
FROM flagged
GROUP BY user_id
ORDER BY user_id
"""


def event_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity seasonality heatmap — events per (day-of-week, hour)
    cell with each cell's share of total traffic: the load-profile
    report capacity planning and anomaly baselines start from. One
    hash aggregate plus a broadcast of the single total row; at scale
    this is a metadata-sized result regardless of corpus size."""
    ev = load_table(spark, "events", sf_dir)
    cells = ev.groupBy(
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(F.count("*").alias("n_events"), F.round(F.avg("value"), 4).alias("mean_value"))
    total = cells.agg(F.sum("n_events").alias("total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour",
            "n_events",
            "mean_value",
            F.round(F.col("n_events") / F.col("total"), 6).alias("traffic_share"),
        )
        .orderBy("dow", "hour")
    )


SEASONALITY_SQL = """
WITH cells AS (
  SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
         count(*) AS n_events, round(avg(value), 4) AS mean_value
  FROM events
  GROUP BY 1, 2)
SELECT dow, hour, n_events, mean_value,
       round(n_events / CAST((SELECT sum(n_events) FROM cells) AS DOUBLE), 6) AS traffic_share
FROM cells
ORDER BY dow, hour
"""


def timeseries_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive time-series decomposition of each event
    type's daily total: trend = centered 7-day moving average (RANGE
    of ±3 rows over the daily series), seasonal = the day-of-week's
    mean detrended deviation, residual = the rest. The anomaly
    baseline one level up from z-scores: an outlier is a large
    RESIDUAL, not a large value on a Friday.

    Everything runs on the O(types × days) pre-aggregate: two window
    passes partitioned by type and one dow-profile join — corpus
    scanned once. Edge days (incomplete MA window) are dropped from
    the report, as in the textbook method."""
    ev = load_table(spark, "events", sf_dir)
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("total"))
        # the daily series feeds BOTH the trend window and the dow
        # profile — materialize the O(types × days) table once so the
        # raw log is scanned once, not per consumer
        .localCheckpoint()
    )
    w_ma = (
        W.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    )
    with_trend = daily.select(
        "event_type",
        "day",
        "total",
        F.when(
            F.count("*").over(w_ma) == 7, F.round(F.avg("total").over(w_ma), 4)
        ).alias("trend"),
    ).where(F.col("trend").isNotNull())
    dow_profile = (
        with_trend.groupBy(
            F.col("event_type").alias("p_type"), F.dayofweek("day").alias("dow")
        )
        .agg(F.round(F.avg(F.col("total") - F.col("trend")), 4).alias("seasonal"))
    )
    return (
        with_trend.join(
            F.broadcast(dow_profile),
            (F.col("event_type") == F.col("p_type"))
            & (F.dayofweek("day") == F.col("dow")),
        )
        .select(
            "event_type",
            "day",
            "total",
            "trend",
            "seasonal",
            F.round(F.col("total") - F.col("trend") - F.col("seasonal"), 4).alias("residual"),
        )
        .orderBy("event_type", "day")
    )


TSDECOMP_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2),
with_trend AS (
  SELECT event_type, day, total,
         CASE WHEN count(*) OVER w = 7 THEN round(avg(total) OVER w, 4) END AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
trimmed AS (SELECT * FROM with_trend WHERE trend IS NOT NULL),
dow_profile AS (
  SELECT event_type, dayofweek(day) + 1 AS dow,
         round(avg(total - trend), 4) AS seasonal
  FROM trimmed GROUP BY 1, 2)
SELECT t.event_type, t.day, t.total, t.trend, p.seasonal,
       round(t.total - t.trend - p.seasonal, 4) AS residual
FROM trimmed t JOIN dow_profile p
  ON t.event_type = p.event_type AND dayofweek(t.day) + 1 = p.dow
ORDER BY t.event_type, t.day
"""


def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native recursive CTE (WITH RECURSIVE) — the SQL-surface
    recursion the engine's iterative operators (connected components,
    textrank) otherwise hand-unroll: walk each user up the implicit
    binary-tree hierarchy (parent = floor((id-1)/2), root 0) and
    aggregate event counts along the ancestry path. Terminates because
    the node id strictly decreases (Spark recursion is UNION ALL-only,
    so the recursion must be acyclic by construction — cyclic
    fixpoints stay with the iterative dataflow operators).

    Both engines run the IDENTICAL recursive SQL text — this entry
    pins Spark's recursion semantics against DuckDB's, so the catalog
    covers declarative recursion natively, not only via driver
    loops."""
    ev = load_table(spark, "events", sf_dir)
    ev.groupBy("user_id").agg(F.count("*").alias("n_events")).createOrReplaceTempView(
        "user_counts_v"
    )
    return spark.sql(
        """
        WITH RECURSIVE walk(user_id, node, depth) AS (
          SELECT user_id, user_id, 0 FROM user_counts_v
          UNION ALL
          SELECT w.user_id, CAST(floor((w.node - 1) / 2) AS BIGINT), w.depth + 1
          FROM walk w WHERE w.node > 0)
        SELECT w.user_id, max(w.depth) AS depth,
               CAST(sum(c.n_events) AS BIGINT) AS path_events
        FROM walk w JOIN user_counts_v c ON c.user_id = w.node
        GROUP BY w.user_id
        ORDER BY w.user_id
        """
    )


SQL_RECURSIVE_SQL = """
WITH RECURSIVE user_counts_v AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
walk(user_id, node, depth) AS (
  SELECT user_id, user_id, 0 FROM user_counts_v
  UNION ALL
  SELECT w.user_id, CAST(floor((w.node - 1) / 2) AS BIGINT), w.depth + 1
  FROM walk w WHERE w.node > 0)
SELECT w.user_id, max(w.depth) AS depth,
       CAST(sum(c.n_events) AS BIGINT) AS path_events
FROM walk w JOIN user_counts_v c ON c.user_id = w.node
GROUP BY w.user_id
ORDER BY w.user_id
"""


def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured payloads through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed-path
    extraction (variant_get) — the scan-speed upgrade over repeated
    get_json_object string parsing that json_extract_events
    demonstrates. At 100 TB the variant column is stored shredded in
    parquet, so `$.k` reads like a real column instead of re-parsing
    JSON text per row — this entry is the API contract for that
    path."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("events_variant_v")
    return spark.sql(
        """
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS sum_k,
               CAST(min(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS min_k,
               CAST(max(variant_get(parse_json(props), '$.k', 'bigint')) AS BIGINT) AS max_k
        FROM events_variant_v
        GROUP BY event_type
        ORDER BY event_type
        """
    )


VARIANT_EXTRACT_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       CAST(min(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS min_k,
       CAST(max(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in session_window run in BATCH mode — the native
    gap-session operator cross-validated against the gaps-and-islands
    SQL the oracle runs (and sessionize_events hand-builds with
    lag + running sum). Agreement here proves the engine's native
    sessionization and the manual formulation define the same
    sessions, so the streaming path (session_windowed_agg) can use
    the built-in with the relational semantics pinned.

    One shuffle on the user key; session merging is done by the
    operator itself (no second window pass). Output is per-session
    start/end micros so no timestamp objects cross the comparison
    boundary."""
    ev = load_table(spark, "events", sf_dir).where(F.col("user_id") < 30)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            F.unix_micros(F.col("sw.end")).alias("session_end_us"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start_us")
    )


SESSION_WINDOW_NATIVE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WHERE user_id < 30
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
sessions AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) + 1800 * 1000000 AS session_end_us,
       count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start_us
"""


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (|>) — the linear query form where
    each stage reads top-to-bottom instead of inside-out: scan |>
    filter |> aggregate |> order. Same Catalyst plan as the nested
    form (the syntax is sugar over the same logical operators); this
    entry pins that the pipe surface produces the identical result as
    the oracle's classic SQL, completing the engine's third query
    authoring surface after the DataFrame API and standard SQL."""
    ev = load_table(spark, "events", sf_dir)
    ev.createOrReplaceTempView("events_pipe_v")
    return spark.sql(
        """
        FROM events_pipe_v
        |> WHERE value > 50
        |> AGGREGATE count(*) AS n_events, round(sum(value), 2) AS total_value,
                     round(avg(value), 4) AS mean_value
           GROUP BY event_type
        |> WHERE n_events > 10
        |> ORDER BY event_type
        """
    )


SQL_PIPE_SQL = """
SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS total_value,
       round(avg(value), 4) AS mean_value
FROM events
WHERE value > 50
GROUP BY event_type
HAVING count(*) > 10
ORDER BY event_type
"""


def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery top-k (Spark 4 SQL surface): each
    BUILDING-segment customer's two largest orders via a LATERAL
    (... ORDER BY ... LIMIT 2) — the window-free way to express
    per-group top-k in pure SQL. Catalyst decorrelates the LATERAL
    into a ranked join (the same plan the row_number formulation
    produces), so this entry pins that the lateral authoring surface
    and the window surface agree result-for-result (the oracle uses
    the classic row_number form).

    100 TB: decorrelation means no per-customer re-execution — one
    shuffle on the correlation key, per-key top-2 heaps."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_lat_v")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_lat_v")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lat_v c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat_v
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey
        LIMIT 50
        """
    )


SQL_LATERAL_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders)
SELECT c.c_custkey, r.o_orderkey, r.o_totalprice
FROM customer c JOIN ranked r ON r.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING' AND r.rk <= 2
ORDER BY c.c_custkey, r.o_totalprice DESC, r.o_orderkey
LIMIT 50
"""


def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: for each click event, the
    NEXT purchase by the same user within one hour — join_asof's
    mirror (that one looks back; attribution and time-to-convert
    need both directions). Same scalable shape: ONE window pass over
    the unioned stream, descending time order with a carry-BACKWARD
    of the next purchase, then the tolerance filter — a single
    user_id shuffle, never an inequality pair join.

    100 TB: identical partitioning to join_asof; the tolerance is a
    post-window filter, so hot users still cost one linear scan."""
    ev = load_table(spark, "events", sf_dir).where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    enriched = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True).over(w).alias("next_purchase_id"),
        F.last(F.when(is_p, F.unix_micros("ts")), ignorenulls=True).over(w).alias("next_purchase_ts_us"),
    )
    gap = F.col("next_purchase_ts_us") - F.col("ts_us")
    tol_us = 3600 * 1000000
    return (
        enriched.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("event_id").alias("click_id"),
            "ts_us",
            F.when(gap <= tol_us, F.col("next_purchase_id")).alias("next_purchase_id"),
            F.when(gap <= tol_us, gap).alias("click_to_purchase_us"),
        )
        .orderBy("user_id", "click_id")
        .limit(50)
    )


ASOF_FORWARD_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('click', 'purchase')),
enriched AS (
  SELECT *,
         last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_purchase_id,
         last_value(CASE WHEN event_type = 'purchase' THEN ts_us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS next_purchase_ts_us
  FROM ev)
SELECT user_id,
       event_id AS click_id,
       ts_us,
       CASE WHEN next_purchase_ts_us - ts_us <= 3600000000
            THEN next_purchase_id END AS next_purchase_id,
       CASE WHEN next_purchase_ts_us - ts_us <= 3600000000
            THEN next_purchase_ts_us - ts_us END AS click_to_purchase_us
FROM enriched
WHERE event_type = 'click'
ORDER BY user_id, click_id
LIMIT 50
"""

"""Remaining TPC-H query shapes (SURVEY.md §2 B — full 22-shape
coverage), adapted to the testdata's slim star schema. The testdata
ships no `partsupp` table and lineitem has no
shipmode/commitdate/receiptdate columns, so each query keeps its
defining OPERATOR SHAPE — correlated MIN subquery (Q2), multi-join
profit decomposition (Q9), HAVING over a global scalar (Q11),
conditional two-way counts (Q12), outer-join histogram (Q13),
view + scalar-MAX subquery (Q15), NOT-IN + distinct-count (Q16),
nested-IN semi-join chain (Q20), multi-correlated EXISTS/NOT-EXISTS
(Q21) — re-anchored on the columns that exist. The lineitem table
stands in for partsupp as the part↔supplier bridge.

The reference implements none of these (its query algebra is purely
positional — SURVEY.md §2 A); this module completes the B-series
relational checklist.

Spark side is written decorrelated (pre-aggregates joined back,
broadcast one-row scalars, semi/anti joins) — the same plans
Catalyst's subquery decorrelation produces from the textbook SQL the
DuckDB oracle runs, so the equivalence is checked rather than
assumed. Scale notes per function; dimensions (part 2k rows,
supplier 100, nation 25) broadcast at any SF, fact-side joins
shuffle on their keys and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hematite_spark.io import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN subquery: for each small part,
    the supplier(s) offering the minimum observed unit price. The
    per-(part,supplier) unit-cost table derives from lineitem (the
    partsupp stand-in); the correlated `= (SELECT min ...)` becomes a
    per-part pre-aggregate joined back on partkey — one extra shuffle
    of O(parts) rows instead of a re-scan per part. Equality compares
    the SAME double (a selected min, not a re-summed value), so it is
    exact on both engines; the output cost is floor-scaled rather than
    rounded because the engines' decimal-rounding modes differ at
    exact .5 boundaries (half-up vs half-even), while floor of the
    identical double is bit-deterministic."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.min("unit").alias("unit_cost"))
    best = cost.groupBy("l_partkey").agg(F.min("unit_cost").alias("best_cost"))
    part = load_table(spark, "part", sf_dir).where(F.col("p_size") <= 15).select("p_partkey", "p_name")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    return (
        cost.join(best, "l_partkey")
        .where(F.col("unit_cost") == F.col("best_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.floor(F.col("unit_cost") * 10000).alias("unit_cost_e4"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_MINCOST_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(floor(unit_cost * 10000) AS BIGINT) AS unit_cost_e4
FROM part, cost, supplier, nation
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND s_nationkey = n_nationkey
  AND p_size <= 15
  AND unit_cost = (SELECT min(c2.unit_cost) FROM cost c2
                   WHERE c2.l_partkey = cost.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit decomposition by nation and year over a
    4-way join. Cost uses p_retailprice as the supply-cost stand-in
    (no partsupp). part/supplier/nation broadcast; lineitem never
    shuffles before the aggregate, and partial aggregation shrinks the
    exchange to (nation × year) groups."""
    li = load_table(spark, "lineitem", sf_dir)
    part = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").contains("gear"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem, part, supplier, nation
WHERE l_partkey = p_partkey
  AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND p_name LIKE '%gear%'
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — HAVING against an uncorrelated scalar
    subquery: parts whose shipped value from NATION_3 suppliers
    exceeds 1.6× the mean per-part value (scale-free — TPC-H's fixed
    fraction selects nothing once the part count grows, so the
    threshold is relative, which keeps a non-trivial result at every
    SF). The global scalar is a one-row aggregate broadcast into a
    cross join (no driver round-trip, no second scan of the grouped
    data)."""
    li = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey", "l_extendedprice")
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = (
        load_table(spark, "nation", sf_dir).where(F.col("n_name") == "NATION_3").select("n_nationkey")
    )
    filtered = li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")).join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    per_part = filtered.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("raw_value"))
    threshold = per_part.agg((F.avg("raw_value") * 1.6).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(threshold))
        .where(F.col("raw_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), F.round("raw_value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


Q11_IMPORTANT_SQL = """
SELECT l_partkey AS partkey, round(sum(l_extendedprice), 2) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING sum(l_extendedprice) > (
  SELECT 1.6 * avg(part_value) FROM (
    SELECT sum(l_extendedprice) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
    GROUP BY l_partkey))
ORDER BY value DESC, partkey
"""


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — two-way conditional counts after a join:
    for 1996 lineitems shipped 30+ days after their order date, count
    critical- vs normal-priority orders per line status (linestatus
    stands in for the absent shipmode column). Both predicates push
    to the lineitem scan; the count-if pair is one aggregate pass."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_LATE_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — outer-join histogram: distribution of
    customers by order count (non-urgent orders only; the join
    predicate filters the RIGHT side, so no-order customers survive
    with count 0). Two aggregations: per-customer count, then the
    count-of-counts — the second groups O(distinct counts) keys."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_DIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — view + scalar MAX subquery: supplier(s) with
    the highest revenue in 1996 Q1. The revenue view is computed once;
    the MAX is a one-row broadcast joined back (the textbook form
    re-evaluates the view — Catalyst and DuckDB both collapse it).
    Revenue is rounded IN the view so the equality compares identical
    doubles."""
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_TOP_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT IN + distinct-count: how many distinct
    suppliers ship each (brand, type, size) slice, excluding
    negative-balance suppliers (the complaints stand-in). The
    part↔supplier bridge is the DISTINCT projection of lineitem;
    the NOT IN is a left-anti join against a 6-row blacklist
    (broadcast); countDistinct is a two-phase exact aggregate."""
    bridge = load_table(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, "part", sf_dir).where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    blacklist = load_table(spark, "supplier", sf_dir).where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        bridge.join(F.broadcast(blacklist), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_COUNT_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) bridge, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — nested-IN semi-join chain: region-1 suppliers
    who shipped more than 100 units of 'small *' parts during 1996.
    Inner IN (part names) → broadcast semi-join into lineitem; the
    HAVING aggregate feeds the outer IN → semi-join into supplier.
    Nothing materializes except the qualifying supplier keys."""
    part = (
        load_table(spark, "part", sf_dir)
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(spark, "lineitem", sf_dir).where(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    shippers = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    nation = load_table(spark, "nation", sf_dir).where(F.col("n_regionkey") == 1).select("n_nationkey")
    supp = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    )
    return (
        supp.join(shippers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


Q20_PROMO_SQL = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100)
  AND s_nationkey = n_nationkey
  AND n_regionkey = 1
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — doubly-correlated EXISTS / NOT EXISTS: for
    finished multi-supplier orders, count the lineitems whose supplier
    was the LAST to ship (no OTHER supplier shipped strictly later),
    per region-1 supplier. Decorrelated without self-joining lineitem
    three times: one shuffle on orderkey computes per-(order,supplier)
    ship maxes, a window derives each supplier's other-supplier
    maximum via the max/runner-up trick, and lines qualify by
    comparing against that — linear in lineitem, no pair explosion
    (the textbook NOT EXISTS is quadratic per order at 100 TB)."""
    orders_f = (
        load_table(spark, "orders", sf_dir).where(F.col("o_orderstatus") == "F").select("o_orderkey")
    )
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("smax"))
    w = W.partitionBy("l_orderkey")
    x = per_supp.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        F.count("*").over(w).alias("n_supp"),
        F.max("smax").over(w).alias("m1"),
    )
    x = x.select(
        "l_orderkey",
        "l_suppkey",
        "smax",
        "n_supp",
        "m1",
        F.sum(F.when(F.col("smax") == F.col("m1"), 1).otherwise(0)).over(w).alias("m1_cnt"),
        F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax"))).over(w).alias("m2"),
    )
    other_max = (
        x.select(
            "l_orderkey",
            "l_suppkey",
            "n_supp",
            F.when(F.col("smax") < F.col("m1"), F.col("m1"))
            .when(F.col("m1_cnt") > 1, F.col("m1"))
            .otherwise(F.col("m2"))
            .alias("other_max"),
        )
    )
    qualifying = li.join(other_max, ["l_orderkey", "l_suppkey"]).where(
        (F.col("n_supp") >= 2) & (F.col("l_shipdate") >= F.col("other_max"))
    )
    nation = load_table(spark, "nation", sf_dir).where(F.col("n_regionkey") == 1).select("n_nationkey")
    supp = (
        load_table(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )
    return (
        qualifying.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_WAITING_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
  AND s_nationkey = n_nationkey
  AND n_regionkey = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

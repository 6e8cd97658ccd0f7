"""Core relational queries: scan → filter → project → aggregate → join →
window → set-ops → rollup, expressed declaratively so Catalyst applies
predicate pushdown, column pruning, and join-strategy selection.

The reference exercises map/filter/aggregate through its pipeline API
(SURVEY.md §2.5-2.6); joins/sorts/windows/set-ops are Jet-core
capabilities that come built-in on Spark — these queries demonstrate them
over the driver's TPC-H-ish tables.

Scale notes (100 TB design stance):
- all aggregations are partial-aggregate + exchange + final (map-side
  combine) — Catalyst does this for every `groupBy().agg()` here;
- small dimension tables (region, nation, customer at low SF) are
  broadcast for joins — explicitly hinted where the small side is known;
- every filter is a plain column predicate so it reaches the parquet
  scan (`PushedFilters` in explain output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.registry import query, retired_query, table


# --------------------------------------------------------------------------
# Q1: pricing summary — the canonical scan+filter+groupBy+multi-agg shape
# (TPC-H Q1). Exercises map-side partial aggregation; at 100 TB this is a
# single shuffle of ~6 tiny groups.
# --------------------------------------------------------------------------
@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# Q6: pure filter + global agg — the pushdown showcase. All three
# predicates reach the parquet scan; no shuffle at all beyond the final
# single-row combine.
# --------------------------------------------------------------------------
@retired_query(
    "q6_forecast_revenue",
    reason="r08: pure scan-filter-aggregate — the triple predicate "
    "pushdown and arithmetic agg are q1_pricing_summary's shape with "
    "zero grouping columns; the global single-row agg path stays "
    "driver-proven via hll_customers_accuracy (re-anchored r16 when "
    "hash64_distinct_customers, the original anchor, itself retired "
    "into hll_customers_accuracy — review r16 #5)",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q3-shape: 3-way join (customer ⋈ orders ⋈ lineitem) + group + integer
# HAVING. customer/orders are the small sides at any SF ratio — broadcast
# the segment-filtered customer; orders⋈lineitem shuffles on orderkey.
# --------------------------------------------------------------------------
@query(
    "q3_order_revenue",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority,
           COUNT(*) AS n_items
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    HAVING COUNT(*) >= 5
    """,
)
def q3_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority", "n_items")
    )


# --------------------------------------------------------------------------
# Top-K per group via window function (rank customers by order count
# within their nation; integer measure + unique-key tiebreak =
# deterministic). The canonical "Top-K per group" OLAP pattern.
# --------------------------------------------------------------------------
@query(
    "topk_customers_per_nation",
    oracle="""
    WITH counts AS (
        SELECT c_nationkey, c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_nationkey, c_custkey
    )
    SELECT c_nationkey, c_custkey, n_orders, rn FROM (
        SELECT c_nationkey, c_custkey, n_orders,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY n_orders DESC, c_custkey) AS rn
        FROM counts
    ) t WHERE rn <= 3
    """,
)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    counts = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    w = W.partitionBy("c_nationkey").orderBy(F.col("n_orders").desc(), F.col("c_custkey"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "n_orders", "rn")
    )


# --------------------------------------------------------------------------
# ROLLUP (hierarchical grouping sets) over order status/priority.
# --------------------------------------------------------------------------
@retired_query(
    "rollup_order_status",
    reason="r08: ROLLUP's grouping sets are a strict subset of "
    "cube_status_priority's CUBE over the same orders columns and the "
    "same Expand+hash-agg physical machinery",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# CUBE grouping-sets: all 2^2 grouping combinations in one pass — the
# planner Expands each input row once per grouping set, then a single
# hash aggregate; no per-combination re-scan of the fact.
# --------------------------------------------------------------------------
@query(
    "cube_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


# --------------------------------------------------------------------------
# Sort + limit with a total deterministic order.
# --------------------------------------------------------------------------
@retired_query(
    "top10_parts_by_price",
    reason="r08: global orderBy+limit executes as TakeOrderedAndProject "
    "— exactly znorm_subseq_topk's (and bm25_topk_docs') final "
    "physical op; per-group top-k stays live via "
    "topk_customers_per_nation",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 10
    """,
)
def top10_parts_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .select("p_partkey", "p_name", "p_retailprice")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Set operations: INTERSECT (customers in a segment who have URGENT
# orders) — Spark intersect == SQL INTERSECT (distinct semantics).
# --------------------------------------------------------------------------
@query(
    "setop_building_urgent_customers",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_building_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


# --------------------------------------------------------------------------
# Anti-join (NOT EXISTS): parts never ordered in bulk (no lineitem with
# quantity >= 45). Non-trivial at every SF (6 rows at sf0.001, 53 at
# sf0.01).
# --------------------------------------------------------------------------
@retired_query(
    "parts_never_bulk_ordered",
    reason="r10: bare NOT EXISTS anti-join subsumed by "
    "q21_waiting_suppliers (EXISTS + NOT EXISTS on a filtered lineitem "
    "probe) and q22_dormant_wealthy_customers (anti-join to orders)",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_quantity >= 45
    )
    """,
)
def parts_never_bulk_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    bulk = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return part.join(bulk, part.p_partkey == bulk.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


# --------------------------------------------------------------------------
# Q5-shape: local supplier volume — the 6-table join chain
# (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with the
# co-location predicate s_nationkey = c_nationkey. At 100 TB: lineitem ⋈
# orders shuffles on orderkey; every dimension (supplier, customer,
# nation, region) broadcasts; one final tiny shuffle for the group-by.
# --------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        # orders/customer are fact-scale: no broadcast hint — they shuffle
        # on their keys at 100 TB, and AQE converts to broadcast at low SF
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# Q14-shape: promotion effect — conditional aggregation over a fact ⋈ dim
# join (lineitem ⋈ part), the CASE-inside-SUM pattern.
# --------------------------------------------------------------------------
@retired_query(
    "q14_promo_effect",
    reason="r10: global conditional revenue-share over a broadcast dim "
    "join is q8_market_share's per-year conditional share restricted to "
    "one group (same CASE/sum machinery, smaller join graph); the "
    "l_shipdate range-pushdown leg stays proven by q1/q20",
    oracle="""
    SELECT ROUND(
             100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4).alias(
                "promo_revenue_pct"
            )
        )
    )


# --------------------------------------------------------------------------
# Q10-shape: returned-item reporting — fact ⋈ fact ⋈ dims with a top-N by
# computed measure (the "find problem customers" report).
# --------------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = table(spark, sf_dir, "nation")
    return (
        # orders/customer are fact-scale: no broadcast hint (see q5 note)
        li.join(orders.select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_name", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )

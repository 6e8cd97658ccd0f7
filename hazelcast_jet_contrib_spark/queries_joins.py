"""Temporal/interval join queries over the events stream table.

Oracle side expresses the textbook (inequality-join) formulation; the
Spark side runs the scale-safe rewrites from ``operators/joins.py`` —
equality of results is the proof that the rewrite preserves semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.registry import query, table


# --------------------------------------------------------------------------
# as-of join: for each click, the user's most recent purchase at or
# before the click. Oracle = LEFT JOIN on the range predicate + window
# rank (what an engine without as-of support would run); Spark = one
# union + window pass, no inequality join.
# --------------------------------------------------------------------------
@query(
    "asof_last_purchase_before_click",
    oracle="""
    SELECT event_id, user_id, click_ts, purchase_id, purchase_value
    FROM (
        SELECT c.event_id, c.user_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.value AS purchase_value,
               ROW_NUMBER() OVER (
                   PARTITION BY c.event_id
                   ORDER BY p.ts DESC NULLS LAST, p.event_id DESC NULLS LAST
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id AND p.ts <= c.ts
    ) ranked
    WHERE rn = 1
    """,
)
def asof_last_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hazelcast_jet_contrib_spark.operators.joins import asof_join

    events = table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="p_ts",
        tiebreak="p_id",
    ).select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("right_p_id").alias("purchase_id"),
        F.col("right_p_value").alias("purchase_value"),
    )


# --------------------------------------------------------------------------
# range join: events priced into overlapping value bands. Oracle = the
# BETWEEN join; Spark = interval→bin explosion + hash equi-join. Bands
# are 20 half-open intervals [i*25, i*25+50) — every value lands in one
# or two bands, and both engines derive the band table from the same
# closed-form rule.
# --------------------------------------------------------------------------
@query(
    "range_join_value_bands",
    oracle="""
    WITH bands AS (
        SELECT k AS band_id, k * 25.0 AS lo, k * 25.0 + 50.0 AS hi
        FROM generate_series(0, 19) AS gs(k)
    )
    SELECT band_id, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band_id
    """,
)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hazelcast_jet_contrib_spark.operators.joins import range_join_binned

    events = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    bands = spark.range(0, 20).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 25.0).alias("lo"),
        (F.col("id") * 25.0 + 50.0).alias("hi"),
    )
    return (
        range_join_binned(events, "value", bands, "lo", "hi", bin_width=25.0)
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# salted join: the 100 TB skew lever (operators/skew.py, SCALE.md) as a
# hash-green driver row. The Spark side routes lineitem through
# `salted_join` — each left row's key is split into one of `salt`
# sub-keys and the right side replicated `salt` times, so a
# pathologically hot orderkey would spread over `salt` tasks instead of
# one. The oracle is the PLAIN join + aggregate: salting only re-routes
# rows, never changes membership, so value identity of the aggregate IS
# the semantics-preservation proof (the same claim
# tests/test_skew_rehearsal.py measures for task-spread). Reference
# scope: Jet relies on per-member partition assignment
# (RedisSources.java:693-756); at 100 TB an engine needs an explicit
# lever for keys AQE cannot split (aggregation-keyed skew,
# broadcast-ineligible sides).
# --------------------------------------------------------------------------
@query(
    "salted_join_priority_revenue",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hazelcast_jet_contrib_spark.operators.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    ords = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    return (
        salted_join(li, ords, "orderkey", salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )

"""Probabilistic-module queries: HLL distinct-count + 64-bit hashing
(reference `probabilistic/` parity — ProbabilisticAggregations.java:45-70,
HashingSupport.java:32-77, usage HyperLogLogTest.java:100-119).

Oracle strategy for approximate operators: the estimate itself is not
SQL-reproducible across engines, so we assert the reference's own test
contract — estimate within ±5% of the exact distinct count
(HyperLogLogTest.java:121-127) — as a deterministic boolean column.
The hash function is asserted through its observable contract: stable
and collision-free on the test keys (distinct-hash count == distinct-key
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions.probabilistic import hash64, hyper_log_log
from hazelcast_jet_contrib_spark.registry import query, retired_query, table


@retired_query(
    "hash64_distinct_customers",
    reason=(
        "Retired round 16 (cap slot for the r16 window: 49 aging "
        "r14-greens + the two red-row re-proofs + the staged SSE sink "
        "row = 52 > 50). Subsumed by hll_customers_accuracy: the live "
        "row feeds the SAME hash64 column expression "
        "(functions/probabilistic.py:70) into the HLL ±5% gate, and "
        "the failure modes this row existed to catch surface there — "
        "a nondeterministic hash inflates the distinct-hash estimate "
        "toward row count (gate trips), a catastrophic collision rate "
        "deflates it (gate trips). The exact injectivity comparison "
        "below still runs every pytest (test_retired.py)."
    ),
    oracle="""
    SELECT COUNT(DISTINCT c_name) AS n_distinct_hashes
    FROM customer
    """,
)
def hash64_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hash64 is injective on the customer-name key set: hashing loses no
    distinct values (and is deterministic across partitions/runs)."""
    cust = table(spark, sf_dir, "customer")
    return cust.select(hash64("c_name").alias("h")).agg(
        F.count_distinct(F.col("h")).alias("n_distinct_hashes")
    )


@query(
    "hll_customers_accuracy",
    oracle="""
    SELECT CAST(1 AS INT) AS within_5pct
    """,
)
def hll_customers_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's HLL pipeline shape (HyperLogLogTest.java:110-115):
    map each record through the hashing service, aggregate with HLL, and
    assert the estimate lands within ±5% of truth at default precision 14.
    Here: orders → hash64(o_custkey) → hyper_log_log vs exact distinct."""
    orders = table(spark, sf_dir, "orders")
    # estimate and truth in separate aggregations: mixing a distinct and
    # a non-distinct aggregate in one agg() makes the planner Expand
    # every row through both paths, doubling the HLL update work
    est = orders.select(hash64("o_custkey").alias("h")).agg(
        hyper_log_log("h", precision=14).alias("est")
    )
    exact = orders.agg(F.count_distinct("o_custkey").alias("exact"))
    return est.crossJoin(exact).select(
        (
            (F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05)
        )
        .cast("int")
        .alias("within_5pct")
    )


@retired_query(
    "hll_events_users_accuracy",
    reason="r07: same ±tolerance accuracy gate as hll_customers_accuracy "
    "on a second table; one driver slot suffices for the gate shape",
    oracle="""
    SELECT CAST(1 AS INT) AS within_5pct
    """,
)
def hll_events_users_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract over the events stream table's user_id (the shape of
    the reference's streaming rollingAggregate test, evaluated batch)."""
    events = table(spark, sf_dir, "events")
    est = events.agg(hyper_log_log(hash64("user_id"), precision=14).alias("est"))
    exact = events.agg(F.count_distinct("user_id").alias("exact"))
    return est.crossJoin(exact).select(
        (
            (F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05)
        )
        .cast("int")
        .alias("within_5pct")
    )

"""Mergeable-sketch queries: the probabilistic module generalized to the
rollup patterns a 100 TB deployment actually uses.

The reference proves its HLL aggregation by asserting the estimate
lands within ±5% of truth (HyperLogLogTest.java:121-127); these queries
keep that oracle contract (deterministic boolean accuracy gates) while
exercising the property the reference's create/accumulate/combine/
exportFinish decomposition exists FOR: partial sketches are first-class
mergeable values. Each query aggregates sketches per group, merges them
in a second aggregation, and gates the merged estimate against the
exact answer computed from the raw data — proving accumulate ∘ combine
= accumulate-over-union, which is what lets a rollup table of per-day
sketches answer arbitrary-range distinct/quantile queries without
rescanning the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions import sketches as SK
from hazelcast_jet_contrib_spark.registry import query, table

_OK_ORACLE = """
    SELECT CAST(1 AS INT) AS ok
"""


@query("sketch_hll_rollup_union", oracle=_OK_ORACLE)
def sketch_hll_rollup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation HLL sketches of the customer key space, merged with
    hll_union_agg into one global estimate — the pre-aggregated-rollup
    shape (store per-partition sketches, merge at query time) — gated
    within ±5% of the exact global distinct count."""
    cust = table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        SK.hll_sketch("c_custkey", lg_k=12).alias("sk")
    )
    merged = per_nation.agg(SK.hll_estimate(SK.hll_merge("sk")).alias("est"))
    exact = cust.agg(F.count_distinct("c_custkey").alias("exact"))
    return merged.crossJoin(exact).select(
        ((F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05))
        .cast("int")
        .alias("ok")
    )


@query("sketch_theta_retention_overlap", oracle=_OK_ORACLE)
def sketch_theta_retention_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via theta set algebra: distinct customers who
    ordered in BOTH 1995 and 1996, estimated by intersecting two theta
    sketches — no join or shuffle of the raw key sets, the intersection
    happens on two fixed-size binaries — gated within ±5% of the exact
    overlap (computed the expensive way, with a real semi-join)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    sk = orders.filter(F.col("y").isin(1995, 1996)).groupBy("y").agg(
        SK.theta_sketch("o_custkey", lg_k=14).alias("sk")
    )
    est = sk.agg(
        SK.theta_estimate(F.theta_intersection_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_years"),
    )
    a = orders.filter(F.col("y") == 1995).select("o_custkey").distinct()
    b = orders.filter(F.col("y") == 1996).select("o_custkey").distinct()
    exact = a.join(b, "o_custkey").agg(F.count(F.lit(1)).alias("exact"))
    return est.crossJoin(exact).select(
        (
            (F.col("n_years") == 2)
            & ((F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05))
        )
        .cast("int")
        .alias("ok")
    )


@query("sketch_kll_price_quantiles", oracle=_OK_ORACLE)
def sketch_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: per-returnflag KLL sketches of
    l_extendedprice merged into one distribution; the merged sketch's
    p50/p95 estimates are gated by their TRUE ranks — each estimated
    quantile must sit at an actual rank within ±2% of its target (the
    k=200 sketch's guaranteed ~1.65% rank error)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    )
    per_mode = li.groupBy("l_returnflag").agg(
        SK.kll_sketch_double("p", k=200).alias("sk")
    )
    q = per_mode.agg(SK.kll_merge_double("sk").alias("m")).select(
        SK.kll_quantile("m", 0.5).alias("q50"), SK.kll_quantile("m", 0.95).alias("q95")
    )
    ranks = li.crossJoin(F.broadcast(q)).agg(
        F.avg((F.col("p") <= F.col("q50")).cast("double")).alias("r50"),
        F.avg((F.col("p") <= F.col("q95")).cast("double")).alias("r95"),
    )
    return ranks.select(
        (
            (F.abs(F.col("r50") - 0.5) <= F.lit(0.02))
            & (F.abs(F.col("r95") - 0.95) <= F.lit(0.02))
        )
        .cast("int")
        .alias("ok")
    )


@query(
    "sketch_topk_event_types",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def sketch_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (DataSketches approx_top_k): heavy hitters
    of the event stream. With maxItemsTracked >= the domain size the
    sketch is EXACT, so this query gets a full value-hash oracle row
    (not just an accuracy gate); the genuinely-approximate regime
    (domain >> maxItemsTracked) is pinned by
    tests/test_sketches.py::test_approx_top_k_skewed_heavy_hitter."""
    ev = table(spark, sf_dir, "events")
    tk = ev.agg(F.expr("approx_top_k(event_type, 5, 8192)").alias("tk"))
    return tk.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("event_type"), F.col("x.count").alias("n")
    )

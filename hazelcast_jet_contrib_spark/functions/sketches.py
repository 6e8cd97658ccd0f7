"""Mergeable-sketch aggregations: the scale-out generalization of the
reference's probabilistic module.

The reference's one custom aggregation is HyperLogLog++ with an explicit
create/accumulate/combine/exportFinish decomposition
(probabilistic/src/main/java/com/hazelcast/jet/contrib/probabilistic/
ProbabilisticAggregations.java:65-69) — the defining property being that
partial states MERGE, so the cluster can accumulate per-partition and
combine centrally. This module exposes Spark's Apache DataSketches
functions through the same contract, generalized beyond cardinality:

- ``hll_sketch`` / ``hll_merge`` / ``hll_estimate`` — distinct count.
  Unlike ``approx_count_distinct`` (whose partial state is internal),
  the sketch is a first-class BINARY column: persist per-day/per-shard
  sketches in a rollup table and answer "distinct over any date range"
  by merging a handful of rows instead of rescanning 100 TB.
- ``theta_sketch`` + union/intersection/difference — SET ALGEBRA on
  approximate distinct sets: overlap of two audiences, retention
  (intersection of day-1 and day-30 actives), churn (difference)
  — without ever joining the raw key sets.
- ``kll_sketch_double`` / ``kll_quantile`` — mergeable rank/quantile
  estimation (p50/p95/p99 over arbitrary re-aggregations).

All of these run as JVM-side typed-imperative aggregates (partial
per-partition sketch, exchange of fixed-size binaries, final merge) —
the network cost is O(sketch_size × partitions), independent of row
count, which is the whole point at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- HLL (DataSketches HllSketch; lg_k in [4, 21], default 12) --------------


def hll_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """Binary HLL sketch of the column's distinct values. ``lg_k``
    mirrors the reference's precision p (2^lg_k registers,
    ProbabilisticAggregations.java:28-30 precision contract)."""
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21], got {lg_k}")
    return F.hll_sketch_agg(_c(col), lg_k)


def hll_merge(sketch_col: Column | str, lg_k: int = 12) -> Column:
    """Combine partial HLL sketches (the `andCombine` step) — use over
    a table OF sketches, e.g. per-day rollup rows."""
    return F.hll_union_agg(_c(sketch_col), True)


def hll_estimate(sketch_col: Column | str) -> Column:
    """exportFinish: sketch → estimated distinct count (bigint)."""
    return F.hll_sketch_estimate(_c(sketch_col))


# -- Theta (set algebra over distinct sets) ---------------------------------


def theta_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """Binary theta sketch of the column's distinct values."""
    return F.theta_sketch_agg(_c(col), lg_k)


def theta_union(a: Column | str, b: Column | str) -> Column:
    return F.theta_union(_c(a), _c(b))


def theta_intersection(a: Column | str, b: Column | str) -> Column:
    return F.theta_intersection(_c(a), _c(b))


def theta_difference(a: Column | str, b: Column | str) -> Column:
    return F.theta_difference(_c(a), _c(b))


def theta_estimate(sketch_col: Column | str) -> Column:
    return F.theta_sketch_estimate(_c(sketch_col))


# -- KLL (mergeable quantiles over doubles) ---------------------------------


def kll_sketch_double(col: Column | str, k: int = 200) -> Column:
    """Binary KLL sketch of a double column's value distribution.
    k=200 gives ~1.65% rank error at 99% confidence."""
    return F.kll_sketch_agg_double(_c(col), k)


def kll_merge_double(sketch_col: Column | str) -> Column:
    """Aggregate-merge of KLL sketches. Spark ships only the two-sketch
    scalar ``kll_sketch_merge_double``, so the aggregate form collects
    the group's sketches and left-folds the pairwise merge over them.

    BOUND: the collected array materializes one row holding ALL of the
    group's sketches (~1 KB each at k=200), so this form is for groups
    of up to ~thousands of sketches — rollup rows merging per-partition
    or per-day partials, the intended shape. A group with millions of
    sketches must go through ``kll_merge_grouped`` (two-level tree
    merge) instead, which caps every collected array at ~group/fanout
    and fanout elements respectively."""
    arr = F.collect_list(_c(sketch_col))
    rest = F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0)))
    return F.reduce(
        rest,
        F.element_at(arr, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )


def kll_merge_grouped(
    df,
    group_cols: list[str],
    sketch_col: str,
    out_col: str = "kll",
    fanout: int = 64,
):
    """Two-level tree merge of KLL sketches per group — the scale path
    for groups holding unbounded sketch counts. Level 1 salts each
    group into ``fanout`` sub-groups (deterministic hash of the sketch
    bytes) and folds each sub-group; level 2 folds the ≤ fanout
    partials. No collected array ever exceeds max(group_size/fanout,
    fanout) elements, vs. group_size for the single-level fold. KLL
    merge is associative-and-commutative in distribution (rank-error
    guarantees hold for any merge tree), so the estimate contract is
    unchanged. Pick fanout ≈ sqrt(expected sketches per group).

    Output: one row per group with ``out_col`` = merged sketch.
    """
    partial = (
        df.select(*group_cols, _c(sketch_col).alias("__sk__"))
        .withColumn("__salt__", F.pmod(F.xxhash64(F.col("__sk__")), F.lit(fanout)))
        .groupBy(*group_cols, "__salt__")
        .agg(kll_merge_double("__sk__").alias("__sk__"))
    )
    return partial.groupBy(*group_cols).agg(kll_merge_double("__sk__").alias(out_col))


def kll_quantile(sketch_col: Column | str, rank: float) -> Column:
    """Value at the given rank in [0, 1] (0.5 = median)."""
    return F.kll_sketch_get_quantile_double(_c(sketch_col), F.lit(rank))

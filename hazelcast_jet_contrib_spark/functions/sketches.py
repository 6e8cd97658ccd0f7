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


# -- Bloom filter & Count-Min: mergeable sketches built from pure -----------
# Catalyst bit/counter aggregation (no sketch library, no Python stage).
#
# Same create/accumulate/combine/exportFinish contract as the reference's
# probabilistic module (ProbabilisticAggregations.java:65-69), instantiated
# for MEMBERSHIP (Bloom: partial bitmaps combine with bit_or) and FREQUENCY
# (Count-Min: partial counter grids combine with elementwise sum). Both
# sketches are tables of fixed maximum size — 2^m_bits/32 words, d*w
# counters — so the exchange that builds them moves O(sketch) bytes
# regardless of input row count, and the probe side joins against a
# broadcast-able sketch: the 100 TB "have we seen this URL" / "how hot is
# this key" shapes with no shuffle of the raw key sets.
#
# The hash family is affine mod the Mersenne prime 2^31-1 with all
# intermediates < 2^62: exactly computable in int64 by BOTH Spark and
# ANSI-SQL engines, so every derived query gets a full value-hash oracle
# (unlike xxhash64, which only Spark can evaluate).

P_MERSENNE = 2147483647  # 2^31 - 1


def affine_hash(key: Column | str, i: Column | int) -> Column:
    """i-th member of a pairwise-independent-ish affine family over a
    non-negative integer key: ((a_i*(key mod P) + b_i) mod P, with
    a_i = 2654435761*(i+1) mod P (Knuth multiplier), b_i =
    1013904223*(i+1) mod P. a_i*(key mod P) < P^2 < 2^62: no overflow
    in int64, in any engine."""
    i1 = (i if isinstance(i, Column) else F.lit(i)) + F.lit(1)
    a = (F.lit(2654435761) * i1.cast("long")) % P_MERSENNE
    b = (F.lit(1013904223).cast("long") * i1.cast("long")) % P_MERSENNE
    return (a * (_c(key) % P_MERSENNE) + b) % P_MERSENNE


def _positions(df, key_col: str, m_bits: int, k: int, carry: tuple[str, ...] = ()):
    """(key, pos[, *carry]) — k bit positions per key, one row each.
    ``carry`` names extra ``df`` columns to project through the explode
    (the band_keys carry pattern: avoids a join-back re-evaluating
    ``df``'s whole lineage when the caller needs them downstream)."""
    return df.select(
        F.col(key_col).alias("__key__"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__i__"),
        *carry,
    ).select(
        "__key__",
        (affine_hash("__key__", F.col("__i__")) % m_bits).alias("__pos__"),
        *carry,
    )


def bloom_build(df, key_col: str, m_bits: int = 1 << 18, k: int = 7):
    """Bloom bitmap of the key set as (word_idx int, word long) rows —
    32 bits per word so no shift ever touches the sign bit in any
    engine. bit_or is the combine step: per-partition partial bitmaps
    merge associatively, and two bitmaps built over different days
    union by the same bit_or — the rollup property. Size: m_bits/32
    rows max (8192 at the 2^18 default ≈ 32 KB), broadcast-able."""
    return (
        _positions(df, key_col, m_bits, k)
        .select(
            F.shiftright("__pos__", 5).alias("word_idx"),
            F.expr("shiftleft(1L, CAST(__pos__ % 32 AS INT))").alias("__bit__"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit__").alias("word"))
    )


def bloom_probe(
    df,
    key_col: str,
    bitmap,
    m_bits: int = 1 << 18,
    k: int = 7,
    carry: tuple[str, ...] = (),
):
    """(key, bloom_member[, *carry]) — ONE row per DISTINCT key of `df`
    (the groupBy collapses repeated keys; join the result back to `df`
    on `key_col` if per-input-row verdicts are needed). A key is a
    member iff ALL k of its bits are set. One broadcast join of
    (probe × k) rows against the bitmap, no shuffle of the key set;
    absent words read as 0 via the left join. No false negatives by
    construction (the probe recomputes the exact positions the build
    set). ``carry`` names extra ``df`` columns to ride the probe
    (taken as first() per key — they must be functionally dependent on
    the key, e.g. when keys are unique); this avoids a join-back that
    would re-evaluate ``df``'s whole lineage a second time."""
    probed = (
        _positions(df, key_col, m_bits, k, carry=carry)
        .join(
            F.broadcast(bitmap),
            F.shiftright("__pos__", 5) == F.col("word_idx"),
            "left",
        )
        .select(
            "__key__",
            F.expr("((COALESCE(word, 0L) >> CAST(__pos__ % 32 AS INT)) & 1) = 1")
            .cast("int")
            .alias("__hit__"),
            *carry,
        )
        .groupBy("__key__")
        .agg(
            (F.min("__hit__") == 1).alias("bloom_member"),
            *[F.first(c).alias(c) for c in carry],
        )
    )
    return probed.withColumnRenamed("__key__", key_col)


def cms_build(df, key_col: str, w: int = 1024, d: int = 4):
    """Count-Min sketch of key frequencies as (i, col, cnt) counter
    rows — at most d*w rows regardless of input size. The combine step
    is elementwise sum (union of two sketches = groupBy (i, col)
    sum(cnt)), so per-partition partials merge map-side and per-day
    sketches roll up by the same aggregation."""
    return (
        df.select(
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
            (affine_hash(key_col, F.col("i")) % w).alias("col"),
        )
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(keys, key_col: str, sketch, w: int = 1024, d: int = 4):
    """(key, est) for every distinct key in `keys`: the classic
    min-over-rows point estimate, which NEVER under-counts (every
    counter a key hashes to includes all of its increments). Broadcast
    join of (keys × d) rows against the ≤ d*w-row sketch."""
    return (
        keys.select(
            F.col(key_col).alias("__key__"),
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("i"),
        )
        .select("__key__", "i", (affine_hash("__key__", F.col("i")) % w).alias("col"))
        .join(F.broadcast(sketch), ["i", "col"], "left")
        .groupBy("__key__")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .withColumnRenamed("__key__", key_col)
    )

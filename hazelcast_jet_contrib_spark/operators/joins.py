"""Temporal / interval join operators Spark lacks as built-ins: as-of
join and binned range join.

Not in the reference (SURVEY.md §2.6: hazelcast-jet-contrib contains no
join operators at all — joins live in Jet core); these are the
"operator Spark lacks → composition of existing DataFrame ops" path
for time-series and interval workloads, built so neither ever plans an
inequality (nested-loop / cartesian) join:

- ``asof_join``: most-recent-right-row-at-or-before-left-ts per key via
  the union + last-observation-carried-forward window. ONE shuffle on
  the join key (both sides co-partitioned by the union), one in-
  partition sort — at 100 TB this is a single exchange of the two
  inputs, versus the range-condition join Spark would otherwise plan as
  BroadcastNestedLoopJoin.
- ``range_join_binned``: point-in-interval join via interval→bin
  explosion and an equi-join on the bin id. Fan-out is
  ceil(interval_width / bin_width) rows per right interval — tune
  bin_width to the median interval so the explosion stays ~2x, and the
  join is a plain hash join AQE can re-plan/skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= left's ``left_ts`` (strictly < when ``strict``)
    within the same ``on`` key; left rows with no match keep nulls
    (left-join semantics).

    Right columns other than ``on`` come back prefixed ``right_``.
    ``tiebreak`` names a right column that makes ordering unique when
    several right rows share (key, ts) — the largest wins; without it,
    (key, right_ts) must be unique for a deterministic result.

    Plan: union both sides with a side marker, one window
    ``partitionBy(on).orderBy(ts, side, tiebreak)`` carrying the last
    non-null right payload forward, filter back to left rows. The
    whole operator is one exchange + one sort — no range predicate
    ever reaches a join operator.
    """
    rcols = [c for c in right.columns if c != on]
    # side marker ordering decides whether an equal-ts right row is
    # visible to a left row: right-before-left = inclusive (<=),
    # left-before-right = strict (<)
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = right.select(
        F.col(on).alias("__k__"),
        F.col(right_ts).alias("__ts__"),
        F.lit(r_side).alias("__side__"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb__"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r__"),
    )
    l = left.select(
        F.col(on).alias("__k__"),
        F.col(left_ts).alias("__ts__"),
        F.lit(l_side).alias("__side__"),
        F.lit(None).cast(r.schema["__tb__"].dataType).alias("__tb__"),
        F.lit(None).cast(r.schema["__r__"].dataType).alias("__r__"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l__"),
    )
    unioned = r.withColumn(
        "__l__", F.lit(None).cast(l.schema["__l__"].dataType)
    ).unionByName(l)
    w = (
        Window.partitionBy("__k__")
        .orderBy(
            F.col("__ts__").asc(),
            F.col("__side__").asc(),
            F.col("__tb__").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m__", F.last("__r__", ignorenulls=True).over(w))
    return carried.filter(F.col("__l__").isNotNull()).select(
        *[F.col(f"__l__.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m__.{c}").alias(f"right_{c}") for c in rcols],
    )


def range_join_binned(
    left: DataFrame,
    left_val: str,
    right: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of left points against right half-open intervals
    ``[lo, hi)`` without an inequality join: each interval explodes to
    the bins it covers, each point maps to exactly one bin, and the
    bins equi-join. Every matching (point, interval) pair meets in
    precisely the point's own bin, so no post-join dedup is needed —
    the residual filter only drops same-bin non-overlaps.

    Returns all left columns plus all right columns. Column name
    collisions must be resolved by the caller beforehand.
    """
    w = float(bin_width)
    # hi is exclusive: ceil(hi/w) - 1 is the last bin the interval
    # reaches — exactly one less than the edge bin when hi sits on a bin
    # edge, floor(hi/w) otherwise. Computed arithmetically (an epsilon
    # subtraction would silently drop matches for hi within epsilon above
    # an edge). Clamped to the start bin so a degenerate hi <= lo
    # interval yields a single-bin sequence instead of a descending one.
    start_bin = F.floor(F.col(lo_col) / w).cast("long")
    end_bin = F.greatest((F.ceil(F.col(hi_col) / w) - F.lit(1)).cast("long"), start_bin)
    exploded = right.withColumn("__bin__", F.explode(F.sequence(start_bin, end_bin)))
    pts = left.withColumn("__bin__", F.floor(F.col(left_val) / w).cast("long"))
    return (
        pts.join(exploded, "__bin__")
        .filter((F.col(left_val) >= F.col(lo_col)) & (F.col(left_val) < F.col(hi_col)))
        .drop("__bin__")
    )

"""Ordered-sequence funnel analysis over an event stream: how many
users complete step 1, then step 2 AFTER step 1, then step 3 AFTER
step 2, …

Reference lineage: the reference ingests event streams (Twitter
firehose TwitterSources.java:85-146, Redis streams
RedisSources.java:273-395) and windows them, but ships no sequence
analytics; the funnel is the canonical product-analytics query those
streams feed, so it joins the engine's event-analytics family next to
sessionization (window_session_30m) and the rolling aggregates.

Semantics: a user "reaches" step k when an event of the step-k type
exists STRICTLY AFTER the user's earliest completion of step k-1 (the
standard strict-ordering funnel — the same event can never witness two
steps, and re-orderings don't count). Earliest-completion times are
per-user minimums, so the result is insensitive to event duplication.

Scale shape: ONE hash shuffle on the user key; every step is a window
aggregate over that same partitioning (Catalyst chains the Window
nodes without re-exchanging — plan-asserted in tests), and the final
per-step counts are a partial-aggregated global agg over one boolean
column per step. No joins, no per-user arrays — state per row is K
timestamps, so a user with millions of events costs the same as one
with ten. Skewed users (one user owning a partition's worth of events)
cost a window sort of their own events, which spills; the fold itself
is constant-size.

Determinism: counts are exact integers; conversion rounds to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel conversion over ``steps`` (event-type names).

    Output: one row per step — (step int 1-based, step_name,
    users long, conversion double) where ``users`` counts distinct
    users whose earliest step-(k-1) completion precedes a step-k event,
    and ``conversion`` is users(k) / users(1) rounded to 6 dp (1.0 for
    the first step; 0-user funnels emit conversion 0.0).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")

    w = Window.partitionBy(F.col(user_col))
    ts = F.col(ts_col)
    df = events.select(user_col, ts_col, type_col)
    prev = None
    tcols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & F.col(prev).isNotNull() & (ts > F.col(prev))
        tcol = f"__t{i}__"
        # per-user earliest completion of step i GIVEN step i-1; a
        # window min over the same user partitioning — no new shuffle
        df = df.withColumn(tcol, F.min(F.when(cond, ts)).over(w))
        tcols.append(tcol)
        prev = tcol

    # one row per user (any row carries the per-user window values)
    per_user = df.groupBy(user_col).agg(
        *[F.min(t).alias(t) for t in tcols]
    )
    counts = per_user.agg(
        *[
            F.count(F.col(t)).alias(f"__c{i}__")
            for i, t in enumerate(tcols)
        ]
    )
    # one inline over an array of per-step structs — a single pass over
    # the (1-row) counts relation; a unionByName of K selects would
    # recompute the whole upstream K times
    return counts.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step"),
                        F.lit(step).alias("step_name"),
                        F.col(f"__c{i}__").alias("users"),
                        F.round(
                            F.when(
                                F.col("__c0__") > 0,
                                F.col(f"__c{i}__").cast("double")
                                / F.col("__c0__"),
                            ).otherwise(F.lit(0.0)),
                            6,
                        ).alias("conversion"),
                    )
                    for i, step in enumerate(steps)
                ]
            )
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention over an event stream: group users by the period
    of their FIRST event (their cohort), then for each later period
    count how many of them came back — the classic retention triangle,
    the funnel's sibling in the product-analytics family the
    reference's ingested streams feed.

    Semantics: cohort = date_trunc(period, min(ts) per user); a user is
    retained in offset k if they have ANY event in cohort + k periods
    (calendar periods via months/weeks arithmetic, so cohorts align
    with date_trunc boundaries). retention = retained / cohort size,
    rounded to 6 dp; offset 0 is 1.0 by construction.

    Scale shape: one shuffle keys the corpus by user for the first-seen
    aggregate; activity then reduces to DISTINCT (user, period) BEFORE
    joining the (tiny, user-count-sized) cohort relation — the join
    input is bounded by users x active periods, not events. The final
    triangle aggregates to cohorts x offsets rows.

    Output: (cohort timestamp, offset int, cohort_users long,
    retained long, retention double) for offsets 0..max_periods.
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day|week|month")
    if max_periods < 1:
        raise ValueError("max_periods must be >= 1")
    ts = F.col(ts_col)
    bucket = F.date_trunc(period, ts)
    firsts = (
        events.groupBy(F.col(user_col).alias("u"))
        .agg(F.min(bucket).alias("cohort"))
    )
    active = (
        events.select(F.col(user_col).alias("u"), bucket.alias("p"))
        .distinct()
    )
    if period == "month":
        offset = (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        )
    else:
        days = F.datediff(F.to_date("p"), F.to_date("cohort"))
        offset = days / (7 if period == "week" else 1)
    joined = active.join(firsts, "u").select(
        "u", "cohort", offset.cast("int").alias("offset")
    ).filter(F.col("offset").between(0, max_periods))
    sizes = firsts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    tri = (
        joined.groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).alias("retained"))
        .join(sizes, "cohort")
        .select(
            "cohort",
            "offset",
            "cohort_users",
            "retained",
            F.round(F.col("retained") / F.col("cohort_users"), 6).alias(
                "retention"
            ),
        )
    )
    return tri


__all__ = ["funnel_steps", "cohort_retention"]

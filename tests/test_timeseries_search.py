"""Time-series subsequence search tests: z-normalization invariance
(scaled + shifted copies of the pattern match at distance 0),
zero-variance window convention, plan shape (codegen-only, bounded
top-k), and a DuckDB mirror on the real events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.timeseries import znorm_pattern_topk

PATTERN = [1.0, 3.0, 2.0, 5.0, 4.0]


def _series_df(spark):
    rows = []
    # key A: noise, then the pattern scaled x10 shifted +100 at offset 4
    a_vals = [7.0, 7.5, 6.0, 8.0] + [100 + 10 * x for x in PATTERN] + [9.0]
    rows += [("A", i, v) for i, v in enumerate(a_vals)]
    # key B: the raw pattern at offset 0, then constant tail
    b_vals = PATTERN + [5.0, 5.0, 5.0, 5.0, 5.0]
    rows += [("B", i, v) for i, v in enumerate(b_vals)]
    # key C: strictly decreasing (anti-correlated-ish, no exact match)
    rows += [("C", i, float(20 - i)) for i in range(10)]
    return spark.createDataFrame(rows, "key string, ts long, value double")


def test_znorm_invariance_finds_scaled_shifted_copies(spark):
    df = _series_df(spark)
    out = znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=3).collect()
    top2 = {(r["key"], r["start"]): r["dist"] for r in out[:2]}
    # both embedded copies (affine transforms of the pattern) at dist 0
    assert top2 == {("A", 4): 0.0, ("B", 0): 0.0}, out
    assert out[2]["dist"] > 0.1


def test_zero_variance_window_matches_flat_pattern_only(spark):
    df = _series_df(spark)
    # flat pattern z-normalizes to zeros -> constant windows (B's tail)
    # are exact matches
    flat = znorm_pattern_topk(df, "key", "ts", "value", [2.0, 2.0, 2.0], k=2).collect()
    assert all(r["dist"] == 0.0 and r["key"] == "B" for r in flat), flat


def test_pattern_validation_and_short_series(spark):
    df = _series_df(spark)
    with pytest.raises(ValueError):
        znorm_pattern_topk(df, "key", "ts", "value", [1.0])
    # pattern longer than every series -> empty result, no error
    assert (
        znorm_pattern_topk(df, "key", "ts", "value", [float(i) for i in range(50)]).count()
        == 0
    )


def test_plan_is_codegen_with_bounded_topk(spark):
    from hazelcast_jet_contrib_spark.plans.audit import audit

    df = _series_df(spark)
    out = znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=3)
    a = audit(out)
    assert a.python_stages() == 0 and a.arrow_python_stages() == 0
    assert "TakeOrderedAndProject" in a.plan, "global top-k must not full-sort"
    assert a.exchanges() <= 2, f"series build + top-k only: {a.exchanges()}"


def test_matches_duckdb_on_events(spark):
    """Cross-engine mirror on the real events table at the correctness
    SF — identical top-20 (key, start, dist) under the same fold order
    and rounding (the oracle shape for a future registry slot)."""
    from tests.conftest import CORRECTNESS_SF, duck_con

    from hazelcast_jet_contrib_spark.registry import table

    events = table(spark, CORRECTNESS_SF, "events")
    sdf = znorm_pattern_topk(
        events, "user_id", "ts", "value", PATTERN, k=20, tiebreak_col="event_id"
    )
    spark_rows = [(r["key"], r["start"], r["dist"]) for r in sdf.collect()]

    import math

    m = len(PATTERN)
    mu = sum(PATTERN) / m
    sd = math.sqrt(sum((x - mu) ** 2 for x in PATTERN) / m)
    qz = [(x - mu) / sd for x in PATTERN]
    qz_sql = "[" + ", ".join(repr(v) for v in qz) + "]"

    con = duck_con(CORRECTNESS_SF)
    duck_rows = [
        tuple(r)
        for r in con.execute(f"""
    WITH series AS (
        SELECT user_id AS key, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    ),
    win AS (
        SELECT key, i AS start, vals[i + 1 : i + {m}] AS w
        FROM series, unnest(generate_series(0, len(vals) - {m})) AS g(i)
        WHERE len(vals) >= {m}
    ),
    stats AS (
        SELECT key, start, w,
               list_aggregate(w, 'sum') / {m} AS mu
        FROM win
    ),
    stats2 AS (
        SELECT key, start, w, mu,
               sqrt(list_aggregate(list_transform(w, x -> (x - mu) * (x - mu)),
                                   'sum') / {m}) AS sd
        FROM stats
    ),
    dists AS (
        SELECT key, CAST(start AS INT) AS start,
               ROUND(sqrt(list_aggregate(
                   list_transform(
                       list_zip(CASE WHEN sd > 0
                                     THEN list_transform(w, x -> (x - mu) / sd)
                                     ELSE list_transform(w, x -> x * 0.0) END,
                                {qz_sql}),
                       p -> (p[1] - p[2]) * (p[1] - p[2])),
                   'sum')), 6) AS dist
        FROM stats2
    )
    SELECT key, start, dist FROM dists
    ORDER BY dist ASC, key ASC, start ASC LIMIT 20
    """).fetchall()
    ]
    assert spark_rows == duck_rows


def test_affine_invariance_property(spark):
    """Z-normalized distance is invariant under per-series affine
    transforms (a*x + b, a > 0): transforming every series must leave
    every (key, start, dist) identical up to rounding. Checked over a
    deterministic batch of pseudo-random integer series rather than
    per-example Spark jobs (one job, many series)."""
    import random

    rng = random.Random(7)
    rows = []
    for key in range(12):
        n = rng.randint(6, 15)
        vals = [float(rng.randint(-50, 50)) for _ in range(n)]
        rows += [(f"k{key}", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    # per-key affine params (a > 0)
    transformed = df.withColumn(
        "value",
        F.col("value") * (F.crc32(F.col("key")) % 5 + 1).cast("double")
        + (F.crc32(F.col("key")) % 97).cast("double"),
    )
    base = znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=50).collect()
    tx = znorm_pattern_topk(transformed, "key", "ts", "value", PATTERN, k=50).collect()
    got_b = [(r["key"], r["start"], r["dist"]) for r in base]
    got_t = [(r["key"], r["start"], r["dist"]) for r in tx]
    assert len(got_b) == len(got_t)
    for (kb, sb, db), (kt, st, dt) in zip(got_b, got_t):
        assert (kb, sb) == (kt, st), (got_b, got_t)
        assert abs(db - dt) <= 2e-6, ((kb, sb), db, dt)


def test_segmented_equals_unsegmented_property(spark):
    """VERDICT r06 item 4: the max_segment path (bounded S+m-1 arrays,
    spillable per-key sort — the billion-point-key scale path) must be
    RESULT-IDENTICAL to the whole-series path for ANY series and any
    legal segment size, including S smaller than, equal to, and larger
    than individual series, and S=m (maximal segmentation)."""
    import random

    rng = random.Random(11)
    rows = []
    for key in range(10):
        n = rng.randint(3, 40)  # some series shorter than the pattern
        rows += [
            (f"k{key}", i, float(rng.randint(-30, 30))) for i in range(n)
        ]
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    base = [
        (r["key"], r["start"], r["dist"])
        for r in znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=200).collect()
    ]
    m = len(PATTERN)
    for S in (m, m + 1, 8, 17, 64):
        seg = [
            (r["key"], r["start"], r["dist"])
            for r in znorm_pattern_topk(
                df, "key", "ts", "value", PATTERN, k=200, max_segment=S
            ).collect()
        ]
        assert seg == base, f"segmented(S={S}) diverged: {seg[:5]} vs {base[:5]}"


def test_segmented_validation_and_bounded_arrays(spark):
    import pytest

    df = _series_df(spark)
    with pytest.raises(ValueError):
        znorm_pattern_topk(df, "key", "ts", "value", PATTERN, max_segment=len(PATTERN) - 1)
    # plan stays pure Catalyst with the bounded-segment build
    from hazelcast_jet_contrib_spark.plans.audit import audit

    out = znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=3, max_segment=6)
    a = audit(out)
    assert a.python_stages() == 0 and a.arrow_python_stages() == 0
    assert "TakeOrderedAndProject" in a.plan, "global top-k must not full-sort"
    got = {(r["key"], r["start"]): r["dist"] for r in out.collect()}
    assert got[("A", 4)] == 0.0 and got[("B", 0)] == 0.0


def test_segmented_matches_unsegmented_on_duplicate_order_keys(spark):
    """ADVICE r07: with duplicate order keys and no tiebreak_col, the
    segmented path's row_number must fall back to the VALUE as the
    final tiebreaker — exactly the total order the unsegmented path
    gets from array_sort(struct(order, v)) — or the two paths diverge
    nondeterministically."""
    rows = []
    # every key has REPEATED ts values; values differ, so (ts, v) is a
    # unique total order but ts alone is not
    for key in ("A", "B"):
        for ts in range(8):
            for bump in (3.0, 1.0, 2.0):  # arrival order deliberately unsorted
                rows.append((key, ts, float(ts % 4) + bump / 10.0))
    df = spark.createDataFrame(rows, "key string, ts long, value double")
    base = sorted(
        (r["key"], r["start"], r["dist"])
        for r in znorm_pattern_topk(df, "key", "ts", "value", PATTERN, k=100).collect()
    )
    for seg in (len(PATTERN), 7, 16):
        got = sorted(
            (r["key"], r["start"], r["dist"])
            for r in znorm_pattern_topk(
                df, "key", "ts", "value", PATTERN, k=100, max_segment=seg
            ).collect()
        )
        assert got == base, f"seg={seg} diverged on duplicate order keys"

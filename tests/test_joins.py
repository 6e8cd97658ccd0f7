"""Unit semantics for the scale-safe temporal/interval joins: as-of
backward join (inclusive, strict, ties, no-match) and the binned range
join (edge inclusion/exclusion, overlap fan-out, bin-crossing)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.joins import asof_join, range_join_binned


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),   # after r2
            (2, "u1", _ts("2024-01-01T09:00:00")),   # exactly at r2
            (3, "u1", _ts("2024-01-01T07:00:00")),   # before all -> null
            (4, "u2", _ts("2024-01-01T12:00:00")),   # other key
            (5, "u3", _ts("2024-01-01T12:00:00")),   # key with no right rows
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts("2024-01-01T08:00:00"), 8.0),
            (101, "u1", _ts("2024-01-01T09:00:00"), 9.0),
            (102, "u1", _ts("2024-01-01T09:00:00"), 99.0),  # tie on ts, higher id
            (103, "u2", _ts("2024-01-01T11:00:00"), 11.0),
        ],
        "rid long, user_id string, rts timestamp, rv double",
    )
    return left, right


def test_asof_backward_inclusive_with_ties(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["event_id"]: (r["right_rid"], r["right_rv"])
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="rts", tiebreak="rid"
        ).collect()
    }
    assert out[1] == (102, 99.0)   # latest ts, tie broken to max rid
    assert out[2] == (102, 99.0)   # equal ts IS visible (inclusive)
    assert out[3] == (None, None)  # nothing at-or-before
    assert out[4] == (103, 11.0)   # keys don't leak
    assert out[5] == (None, None)  # key absent from right
    assert len(out) == 5           # exactly one output row per left row


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _asof_fixture(spark)
    out = {
        r["event_id"]: r["right_rid"]
        for r in asof_join(
            left,
            right,
            on="user_id",
            left_ts="ts",
            right_ts="rts",
            tiebreak="rid",
            strict=True,
        ).collect()
    }
    assert out[2] == 100  # equal-ts right row no longer visible
    assert out[1] == 102  # strictly-before rows unaffected


def test_asof_partition_invariance(spark):
    left, right = _asof_fixture(spark)
    a = sorted(
        map(
            tuple,
            asof_join(
                left, right, on="user_id", left_ts="ts", right_ts="rts", tiebreak="rid"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            asof_join(
                left.repartition(7),
                right.repartition(3),
                on="user_id",
                left_ts="ts",
                right_ts="rts",
                tiebreak="rid",
            ).collect(),
        )
    )
    assert a == b


def test_range_join_binned_edges_and_overlap(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 24.999), (3, 25.0), (4, 49.999), (5, 50.0), (6, 74.0), (7, 76.0)],
        "pid long, v double",
    )
    # overlapping intervals, hi exclusive; widths span multiple bins
    iv = spark.createDataFrame(
        [(10, 0.0, 50.0), (11, 25.0, 75.0), (12, 50.0, 100.0)],
        "band long, lo double, hi double",
    )
    got: dict[int, set[int]] = {}
    for r in range_join_binned(pts, "v", iv, "lo", "hi", bin_width=25.0).collect():
        got.setdefault(r["pid"], set()).add(r["band"])
    assert got[1] == {10}
    assert got[2] == {10}
    assert got[3] == {10, 11}      # lo edge inclusive
    assert got[4] == {10, 11}
    assert got[5] == {11, 12}      # hi edge exclusive: leaves band 10
    assert got[6] == {11, 12}      # bin 2 of band 11, crossing the bin grid
    assert got[7] == {12}          # 76 >= band 11's exclusive hi of 75
    # each (point, interval) pair appears exactly once (no bin dedup needed)
    n = range_join_binned(pts, "v", iv, "lo", "hi", bin_width=25.0).count()
    assert n == sum(len(s) for s in got.values())


def test_range_join_no_inequality_join_in_plan(spark):
    pts = spark.createDataFrame([(1, 10.0)], "pid long, v double")
    iv = spark.createDataFrame([(1, 0.0, 100.0)], "band long, lo double, hi double")
    plan = (
        range_join_binned(pts, "v", iv, "lo", "hi", bin_width=25.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan

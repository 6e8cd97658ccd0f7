"""Skew rehearsal: MEASURED evidence that the two skew levers for the
100 TB mandate actually bound per-task load under a pathologically hot
join key — the failure mode where one key owns most of a fact table and
a plain hash join puts its entire volume on a single task.

Companion to tests/test_scale_rehearsal.py (which measures growth laws);
here the quantity measured is the post-shuffle partition DISTRIBUTION of
the join itself, read from the executed join's real output partitioning
via spark_partition_id() — not a data-level argument about hash
functions. Three facts are proven:

1. the plain shuffle join really does concentrate the hot key on one
   partition (max-partition share ~= hot share — the disease exists);
2. `salted_join` spreads the same join over ~salt partitions with
   identical results (the explicit lever works and is
   semantics-preserving);
3. AQE's skew-join split handles the SMJ case at runtime without
   salting (the plan carries the skew=true marker) — the default path
   the engine ships with, for when the skew is not known in advance.

Measured numbers are recorded in SCALE.md §Relational ("Skew rehearsal").
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.skew import salted_join

HOT_ROWS = 180_000  # rows carried by the single hot key
COLD_ROWS = 20_000  # spread uniformly over the cold keys
N_KEYS = 1_000
SHUFFLE_PARTS = 32


@contextmanager
def _conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _skewed_left(spark):
    # 90% of rows on key 0; remainder uniform over N_KEYS cold keys
    return spark.range(HOT_ROWS + COLD_ROWS).select(
        F.when(F.col("id") < HOT_ROWS, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        F.col("id").alias("payload"),
    )


def _right(spark):
    return spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )


def _partition_profile(df):
    """(max_partition_rows, total_rows) of the ACTUAL executed
    partitioning — spark_partition_id() is evaluated on the join output
    before any later exchange, so it reads the join's own shuffle."""
    rows = (
        df.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    counts = [r["count"] for r in rows]
    return max(counts), sum(counts)


def test_salted_join_bounds_hot_partition_and_preserves_semantics(spark):
    left, right = _skewed_left(spark), _right(spark)
    with _conf(
        spark,
        **{
            "spark.sql.adaptive.enabled": "false",  # isolate the lever
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.shuffle.partitions": str(SHUFFLE_PARTS),
        },
    ):
        plain = left.join(right, "k")
        plain_max, plain_total = _partition_profile(plain)
        salted = salted_join(left, right, "k", salt=16)
        salt_max, salt_total = _partition_profile(salted)

    # identical join results (semantics-preserving lever)
    assert salt_total == plain_total == HOT_ROWS + COLD_ROWS
    # 1) the disease: the plain join's hottest partition carries at
    #    least the hot key's entire volume (90% of all rows on 1 of 32
    #    partitions)
    assert plain_max >= HOT_ROWS
    # 2) the cure: salting over 16 sub-keys caps any one partition near
    #    hot/16 (+ cold-key noise; 2x slack for salt-hash collisions)
    assert salt_max <= 2 * (HOT_ROWS // 16) + COLD_ROWS, (
        f"salted max partition {salt_max} not bounded (plain was {plain_max})"
    )
    # record the measured ratio for SCALE.md
    print(f"SKEW plain_max={plain_max} salted_max={salt_max} "
          f"ratio={plain_max / salt_max:.1f}x")


def test_aqe_skew_join_splits_hot_partition_at_runtime(spark):
    """The zero-config path: with AQE skew handling on (engine
    default), the same skewed sort-merge join is split at runtime — the
    finalized adaptive plan marks the join skew=true. Thresholds are
    lowered to make the 200k-row fixture cross the same relative bar a
    100 TB partition would."""
    left, right = _skewed_left(spark), _right(spark)
    with _conf(
        spark,
        **{
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.shuffle.partitions": str(SHUFFLE_PARTS),
            "spark.sql.join.preferSortMergeJoin": "true",
        },
    ):
        out = left.join(right, "k")
        # collect() THIS DataFrame (count() would plan a different
        # query), finalizing the adaptive plan so skew markers are real
        assert len(out.collect()) == HOT_ROWS + COLD_ROWS
        final = out._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, "AQE did not split the skewed partition"

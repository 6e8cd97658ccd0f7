"""Probabilistic module tests — port of the reference's test contract
(HyperLogLogTest.java:70-143): ±5% accuracy at default precision over a
50k-row / ~1234-cardinality fixture, precision validation, and hash
stability across partitionings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions.probabilistic import (
    hash64,
    hyper_log_log,
    precision_to_rsd,
)

TRUE_CARDINALITY = 1234
N_ROWS = 50_000


@pytest.fixture(scope="module")
def hll_input(spark):
    # Deterministic uniform draw from [0, 1234) over 50k rows — the
    # HyperLogLogTest fixture, seeded via a hash instead of a RNG.
    return spark.range(N_ROWS).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(TRUE_CARDINALITY)).alias("v"),
    )


def test_precision_bounds():
    with pytest.raises(ValueError):
        precision_to_rsd(3)
    with pytest.raises(ValueError):
        precision_to_rsd(17)
    # rsd = 1.106/2^(p/2): the exact inverse of Spark's rsd->p mapping,
    # so precision 14 allocates exactly 2^14 registers
    assert abs(precision_to_rsd(14) - 1.106 / 2**7) < 1e-9


def test_hll_batch_accuracy(spark, hll_input):
    est = hll_input.select(hash64("v").alias("h")).agg(
        hyper_log_log("h").alias("est")
    ).collect()[0]["est"]
    assert 0.95 * TRUE_CARDINALITY <= est <= 1.05 * TRUE_CARDINALITY


def test_hll_lower_precision_looser(spark, hll_input):
    # p=8 => rsd ~ 6.5%; allow 3 sigma.
    est = hll_input.agg(hyper_log_log(hash64("v"), precision=8).alias("e")).collect()[0]["e"]
    assert abs(est - TRUE_CARDINALITY) / TRUE_CARDINALITY < 0.20


def test_hash64_stable_across_partitioning(spark, hll_input):
    a = hll_input.select("k", hash64("v").alias("h"))
    b = hll_input.repartition(13).select("k", hash64("v").alias("h"))
    diff = a.join(b, "k").filter(a["h"] != b["h"]).count()
    assert diff == 0


def test_hash64_multi_column(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("m"), F.col("id").cast("string").alias("s")
    )
    n = df.select(hash64("id", "m", "s").alias("h")).distinct().count()
    assert n == 100


def test_hash64_requires_columns():
    with pytest.raises(ValueError):
        hash64()


def test_hll_streaming_rolling_aggregate(spark, hll_input, tmp_path):
    """rollingAggregate parity (HyperLogLogTest.java:79-86): a streaming
    update-mode aggregation emits a continuously-updated estimate; the
    final estimate matches the batch one within tolerance."""
    src = str(tmp_path / "src")
    hll_input.select(hash64("v").alias("h")).write.parquet(src)
    stream = (
        spark.readStream.schema("h long").parquet(src)
        .agg(hyper_log_log("h").alias("est"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_rolling")
        .start()
    )
    try:
        q.processAllAvailable()
        est = spark.sql("SELECT est FROM hll_rolling").collect()[0]["est"]
    finally:
        q.stop()
    assert 0.95 * TRUE_CARDINALITY <= est <= 1.05 * TRUE_CARDINALITY

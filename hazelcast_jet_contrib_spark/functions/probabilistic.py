"""Probabilistic aggregation: HyperLogLog++ distinct-count estimation and
stable 64-bit hashing of arbitrary records.

Capability parity with the reference's ``probabilistic`` module
(`probabilistic/src/main/java/com/hazelcast/jet/contrib/probabilistic/
ProbabilisticAggregations.java:45-70` — HLL++ aggregation with precision
p in [4,16], default 14; `HashingSupport.java:32-77` — per-executor
hashing service producing 64-bit hashes of serialized objects).

Spark-first design: Spark's ``approx_count_distinct`` is itself HLL++
(partial per-partition accumulation, merged at the exchange — the same
accumulate/combine decomposition the reference declares via
``andAccumulate``/``andCombine``). We expose the reference's
precision-parameterized API by mapping precision -> relative standard
deviation: rsd = 1.04 / sqrt(2^p). Hashing needs no per-executor service:
``xxhash64`` is a codegen'd JVM expression; arbitrary multi-column
records hash via their canonical struct encoding.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default HLL precision, matching ProbabilisticAggregations.java:28-30.
DEFAULT_PRECISION = 14

_MIN_PRECISION = 4
_MAX_PRECISION = 16


def precision_to_rsd(precision: int = DEFAULT_PRECISION) -> float:
    """Map HLL++ precision p (number of index bits, 2^p registers) to the
    relative standard deviation Spark's ``approx_count_distinct`` accepts.

    Spark derives its internal precision as p = ceil(2·log2(1.106/rsd))
    (HyperLogLogPlusPlus), so the exact inverse rsd = 1.106 / 2^(p/2)
    makes Spark use *precisely* 2^p registers — the same sketch size the
    reference allocates for precision p. (The textbook 1.04/sqrt(2^p)
    formula lands just below Spark's threshold and silently doubles the
    register count to 2^(p+1), which also costs ~4x throughput: the
    per-row buffer update scales with sketch size past p=14.)
    p=14 -> rsd ~= 0.00864.

    Raises ValueError outside [4, 16] (parity with
    ProbabilisticAggregations.java:61-63).
    """
    if not (_MIN_PRECISION <= precision <= _MAX_PRECISION):
        raise ValueError(
            f"precision must be in [{_MIN_PRECISION}, {_MAX_PRECISION}], got {precision}"
        )
    return 1.106 / math.sqrt(2.0**precision)


def hyper_log_log(col: Column | str, precision: int = DEFAULT_PRECISION) -> Column:
    """HyperLogLog++ distinct-count estimate of ``col`` as an aggregate
    expression (use inside ``df.agg(...)`` or a windowed/streaming agg).

    Batch global aggregate reproduces the reference's ``aggregate(hll)``
    usage (HyperLogLogTest.java:110-115); in a streaming query with output
    mode "update" it reproduces ``rollingAggregate(hll)``
    (HyperLogLogTest.java:79-86) — a continuously updated estimate emitted
    per micro-batch rather than per event (documented semantic difference).
    """
    return F.approx_count_distinct(col, precision_to_rsd(precision))


def hash64(*cols: Column | str) -> Column:
    """Stable 64-bit hash of one or more columns -> BIGINT column.

    Parity with the reference's hashing service (HashingSupport.java:56-74:
    serialize record, take ``hash64()`` of the bytes). Spark equivalent:
    ``xxhash64`` over the columns' canonical binary encoding — a JVM
    expression, so no per-executor service/lifecycle management is needed;
    the result is deterministic across runs, partitions and executors.
    """
    if not cols:
        raise ValueError("hash64 requires at least one column")
    return F.xxhash64(*cols)

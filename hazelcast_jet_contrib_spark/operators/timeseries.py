"""Time-series subsequence similarity search: find the k closest
z-normalized windows to a query pattern across every key's ordered
value series.

Reference lineage: the reference's InfluxDB module reads measurement
series (InfluxDbSources.java:79-136) but ships no analytics over them;
this operator adds the standard similarity primitive those series
exist for (UCR-suite-style z-normalized euclidean matching, the
building block of distributed subsequence search engines) — the
time-series member of the engine's similarity family alongside the
vector ops in operators/similarity.py.

Scale shape: each key's series materializes ONCE as an ordered array
(one shuffle on the key — series live within a key, so no global
sort); subsequence windows are HOF slices over that array
(posexplode of start offsets — rows carry m doubles each, an ~m×
byte amplification that is the honest cost of brute-force subsequence
search; mitigate at 100 TB by bounding m, pre-filtering keys, or
windowing the time range — all expressible as ordinary filters ahead
of this operator). Distances compute in whole-stage codegen
(F.aggregate over the slice — no Python), and the global top-k is an
orderBy + limit that Spark executes as TakeOrderedAndProject
(per-partition top-k, one bounded merge — never a full sort).

Determinism: distances round to 6 dp and ties break on (key, start),
so results replay identically across engines; sqrt and +,-,*,/ are
IEEE-correctly-rounded, making an exact external SQL oracle possible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def znorm_pattern_topk(
    df: DataFrame,
    key_col: str,
    order_col: str,
    val_col: str,
    pattern: list[float],
    k: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k closest subsequences to ``pattern`` under z-normalized
    euclidean distance, across all keys' series (each key's values
    ordered by ``order_col``, ties by ``tiebreak_col`` for a total
    deterministic order).

    A window with zero variance (constant values) z-normalizes to the
    zero vector — the UCR convention — so it matches a flat pattern
    exactly and anything else at distance ||q_z||.

    Output: (key, start int, dist double) — ``start`` is the 0-based
    offset of the window in the key's ordered series.
    """
    m = len(pattern)
    if m < 2:
        raise ValueError("pattern must have at least 2 points")
    mu = sum(pattern) / m
    sd = math.sqrt(sum((x - mu) ** 2 for x in pattern) / m)
    qz = [(x - mu) / sd if sd > 0 else 0.0 for x in pattern]

    order_fields = [F.col(order_col)]
    if tiebreak_col is not None:
        order_fields.append(F.col(tiebreak_col))
    series = (
        df.select(
            F.col(key_col).alias("key"),
            F.struct(*order_fields, F.col(val_col).cast("double").alias("v")).alias(
                "__s__"
            ),
        )
        .groupBy("key")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("__s__")), lambda s: s["v"]
            ).alias("vals")
        )
        .withColumn("__n__", F.size("vals"))
        .filter(F.col("__n__") >= m)
    )
    win = series.select(
        "key",
        F.posexplode(F.sequence(F.lit(0), F.col("__n__") - m)).alias("start", "__o__"),
        F.col("vals"),
    ).select(
        "key", "start", F.slice("vals", F.col("__o__") + 1, m).alias("w")
    )
    mean = F.aggregate("w", F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
    stats = win.withColumn("__mu__", mean).withColumn(
        "__sd__",
        F.sqrt(
            F.aggregate(
                "w",
                F.lit(0.0),
                lambda a, x: a + (x - F.col("__mu__")) * (x - F.col("__mu__")),
            )
            / F.lit(float(m))
        ),
    )
    qz_col = F.array(*[F.lit(v) for v in qz])
    # zip each window value with its pattern counterpart; zero-variance
    # windows z-normalize to the zero vector (UCR convention)
    znorm = F.when(
        F.col("__sd__") > 0,
        F.transform("w", lambda x: (x - F.col("__mu__")) / F.col("__sd__")),
    ).otherwise(F.transform("w", lambda x: x * F.lit(0.0)))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(znorm, qz_col, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return (
        stats.withColumn("dist", F.round(dist, 6))
        .select("key", "start", "dist")
        .orderBy(F.col("dist").asc(), F.col("key").asc(), F.col("start").asc())
        .limit(k)
    )

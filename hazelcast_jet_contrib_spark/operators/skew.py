"""Skew and co-location techniques for 100 TB joins.

Two standard levers the engine packages as operators:

- **Salted join** (`salted_join`): when one join key is pathologically
  hot (a handful of keys own most rows), a plain hash join puts the hot
  key's entire volume on one task. Salting splits each left row's key
  into `salt` sub-keys and replicates each right row `salt` times, so
  the hot key spreads over `salt` tasks. AQE's skew-join handles the
  sort-merge case at runtime; explicit salting is for when AQE can't —
  broadcast-ineligible skew, aggregations keyed on the hot key, or
  deterministic partition budgeting.
- **Bucketed co-located join**: persist both fact tables bucketed by the
  join key (`write_bucketed`); joins on that key then read
  already-partitioned data — no exchange on either side (asserted in
  tests/test_plan_audits.py). This is the Spark analog of the
  reference's per-member partition assignment (RedisSources.java:693-756)
  done once at write time instead of per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join on `key` with the left side salted and the right
    side replicated `salt` times. Output columns = left ∪ right (minus
    the duplicate key), exactly like `left.join(right, key)`.

    Cost model: replicates the RIGHT side `salt`× — use when right is
    the smaller side but too big (or too skew-sensitive) to broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    lk = left.withColumn("__salt__", (F.rand(seed=7) * salt).cast("int"))
    rk = right.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lk.join(rk, on=[key, "__salt__"], how=how)
    return out.drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) managed table.
    Joins and aggregations on `bucket_key` between tables bucketed with
    the same bucket count then plan with ZERO exchanges — the shuffle
    happened once, at write time."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

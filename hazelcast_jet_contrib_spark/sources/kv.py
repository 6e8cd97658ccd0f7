"""KV-store connector shapes: hash snapshot read and sorted-set range
read (reference: RedisSources.hash `redis/.../RedisSources.java:100-183`
emitting Map.Entry<K,V>; RedisSources.sortedSet `:200-256` executing the
score range **server-side** via ZRANGEBYSCORE `:479`).

The client here is pluggable; the bundled one reads a parquet file with
pyarrow as the stand-in external system (the container has no Redis).
Partitioning: one Spark task per parquet row group — the analog of the
reference round-robinning streams across members×threads
(RedisSources.java:693-756). The range predicate is evaluated inside the
"server" (pyarrow row-group pruning + filter), not in Spark — manual
pushdown parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.sources.builder import batch_source


def _num_row_groups(path: str) -> int:
    import pyarrow.parquet as pq

    return max(1, pq.ParquetFile(path).metadata.num_row_groups)


def kv_source(
    spark: SparkSession,
    name: str,
    path: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Snapshot-read an external KV store as `(key string, value string)`
    rows — the Redis-hash HGETALL shape (Map.Entry<String,String>)."""

    def search(client, part, flt, proj):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        tbl = pf.read_row_group(int(part), columns=[key_col, value_col])
        pdf = tbl.to_pandas()
        pdf = pdf.rename(columns={key_col: "key", value_col: "value"})
        pdf["key"] = pdf["key"].astype(str)
        pdf["value"] = pdf["value"].astype(str)
        yield pdf

    return batch_source(
        name,
        schema="key string, value string",
        search_fn=search,
        partitions=list(range(_num_row_groups(path))),
    ).build(spark)


def sorted_set_source(
    spark: SparkSession,
    name: str,
    path: str,
    score_col: str,
    member_col: str,
    score_from: float,
    score_to: float,
) -> DataFrame:
    """Range-read a sorted set as `(score double, member string)` — the
    ZRANGEBYSCORE shape (ScoredValue<V>). Both range ends inclusive,
    matching the reference test contract (RedisSourceTest.java:114-127).
    The range executes inside the client (pyarrow filter + row-group
    statistics pruning), mirroring server-side evaluation."""

    def search(client, part, flt, proj):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        lo, hi = flt
        pf = pq.ParquetFile(path)
        # server-side pruning: skip row groups whose stats exclude the range
        md = pf.metadata
        col_idx = md.schema.names.index(score_col)
        stats = md.row_group(int(part)).column(col_idx).statistics
        if stats is not None and stats.has_min_max and (stats.min > hi or stats.max < lo):
            return
        tbl = pf.read_row_group(int(part), columns=[score_col, member_col])
        mask = pc.and_(
            pc.greater_equal(tbl[score_col], lo), pc.less_equal(tbl[score_col], hi)
        )
        pdf = tbl.filter(mask).to_pandas()
        pdf = pdf.rename(columns={score_col: "score", member_col: "member"})
        pdf["score"] = pdf["score"].astype(float)
        pdf["member"] = pdf["member"].astype(str)
        yield pdf

    return batch_source(
        name,
        schema="score double, member string",
        search_fn=search,
        partitions=list(range(_num_row_groups(path))),
        filter=(float(score_from), float(score_to)),
    ).build(spark)

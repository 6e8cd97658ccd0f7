"""Batch source builder: the reference's connector-building contract
re-landed on Spark's distributed scan primitives.

Reference contract (MongoDBSourceBuilder.java:84-126, builder chain
`connectionSupplier → databaseFn → collectionFn → searchFn → mapFn →
destroyFn`; same shape in RedisSources.java:100-183 and
InfluxDbSources.java:79-136): user supplies lambdas that (1) open a
client, (2) run a (possibly pushed-down) query on it, (3) project each
record, (4) clean up. The engine decides where those lambdas run.

Spark-first re-expression:
- **Partitioned reads** are the scale path: the user declares a list of
  partition descriptors (key ranges, shard ids, stream names — the
  analog of the reference's per-member/per-processor assignment,
  RedisSources.java:693-756). Each Spark task opens its own client and
  reads only its slice; results flow back as Arrow batches through
  `mapInPandas`. Nothing is materialized on the driver, so a 1000-shard
  read scales to 1000 tasks.
- **Single reads** (`partitions=None`) mirror the reference's
  non-distributed sources (MongoDBSourceBuilder.java:80-82 "total
  parallelism one"): one task, still executor-side.
- **Manual pushdown**: `filter`/`projection` arguments are handed to
  `search_fn` verbatim, exactly how the reference forwards them into the
  external query (MongoDBSources.java:85-93). For parquet/file-backed
  sources prefer `spark.read` + Catalyst pushdown instead — this
  builder exists for systems Spark has no native reader for.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# A search_fn receives (client, partition_descriptor, filter, projection)
# and yields records: dicts, tuples, or pandas DataFrames.
SearchFn = Callable[[Any, Any, Any, Any], Iterable[Any]]


@dataclass
class BatchSourceBuilder:
    """Fluent builder for a partition-parallel batch read of an external
    system. All lambdas must be cloudpickle-serializable (the analog of
    the reference's ``checkSerializable``, RedisSources.java:175-176) —
    they execute inside Spark tasks, not on the driver."""

    name: str
    _connection_fn: Callable[[], Any] | None = None
    _search_fn: SearchFn | None = None
    _map_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None
    _destroy_fn: Callable[[Any], None] | None = None
    _schema: T.StructType | str | None = None
    _partitions: list[Any] | None = None
    _filter: Any = None
    _projection: Any = None
    _batch_rows: int = 1024
    _options: dict[str, Any] = field(default_factory=dict)

    def connection_fn(self, fn: Callable[[], Any]) -> "BatchSourceBuilder":
        """Client factory, executed once per task (reference:
        connectionSupplier, closed by destroy_fn)."""
        self._connection_fn = fn
        return self

    def search_fn(self, fn: SearchFn) -> "BatchSourceBuilder":
        """The read itself: ``fn(client, partition, filter, projection)``
        yields records. Push `filter`/`projection` into the external query
        whenever the system supports it — that is the reference's manual
        pushdown (MongoDBSources.java:93)."""
        self._search_fn = fn
        return self

    def map_fn(self, fn: Callable[[pd.DataFrame], pd.DataFrame]) -> "BatchSourceBuilder":
        """Vectorized post-projection applied to each Arrow batch
        (reference: mapFn/projectionFn per record; here per batch)."""
        self._map_fn = fn
        return self

    def destroy_fn(self, fn: Callable[[Any], None]) -> "BatchSourceBuilder":
        self._destroy_fn = fn
        return self

    def schema(self, schema: T.StructType | str) -> "BatchSourceBuilder":
        """Explicit output schema (DDL string or StructType). Explicit-first
        by design: the reference infers shape from lambdas at runtime, we
        declare it so Catalyst can prune and push down above the source."""
        self._schema = schema
        return self

    def partitions(self, parts: list[Any]) -> "BatchSourceBuilder":
        """Partition descriptors (shard ids / key ranges / stream names).
        One Spark task per descriptor — the scale path."""
        self._partitions = list(parts)
        return self

    def filter(self, flt: Any) -> "BatchSourceBuilder":
        self._filter = flt
        return self

    def projection(self, proj: Any) -> "BatchSourceBuilder":
        self._projection = proj
        return self

    def batch_rows(self, n: int) -> "BatchSourceBuilder":
        """Bound rows per emitted Arrow batch (the reference bounds every
        fillBuffer call: 100-1024 items, SURVEY.md §4.2)."""
        self._batch_rows = int(n)
        return self

    # ------------------------------------------------------------------
    def build(self, spark: SparkSession) -> DataFrame:
        if self._search_fn is None:
            raise ValueError(f"source '{self.name}': search_fn is required")
        if self._schema is None:
            raise ValueError(f"source '{self.name}': schema is required (explicit-first)")

        schema = (
            T._parse_datatype_string(self._schema)
            if isinstance(self._schema, str)
            else self._schema
        )
        conn_fn = self._connection_fn
        search_fn = self._search_fn
        map_fn = self._map_fn
        destroy_fn = self._destroy_fn
        flt, proj = self._filter, self._projection
        batch_rows = self._batch_rows
        col_names = [f.name for f in schema.fields]

        def read_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                for part in pdf["__part__"]:
                    client = conn_fn() if conn_fn else None
                    try:
                        buf: list[Any] = []
                        for rec in search_fn(client, part, flt, proj):
                            if isinstance(rec, pd.DataFrame):
                                out = rec if map_fn is None else map_fn(rec)
                                yield out[col_names]
                                continue
                            buf.append(rec)
                            if len(buf) >= batch_rows:
                                yield _to_batch(buf, col_names, map_fn)
                                buf = []
                        if buf:
                            yield _to_batch(buf, col_names, map_fn)
                    finally:
                        if destroy_fn is not None and client is not None:
                            destroy_fn(client)

        parts = self._partitions if self._partitions is not None else [None]
        # one task per partition descriptor; descriptors ride a tiny
        # single-column frame so the read itself happens executor-side
        part_df = spark.createDataFrame(
            [(p,) for p in parts], T.StructType([T.StructField("__part__", _descriptor_type(parts))])
        ).repartition(len(parts))
        return part_df.mapInPandas(read_partition, schema)


def _descriptor_type(parts: list[Any]) -> T.DataType:
    sample = next((p for p in parts if p is not None), None)
    if sample is None:
        return T.StringType()
    if isinstance(sample, int):
        return T.LongType()
    if isinstance(sample, (list, tuple)):
        return T.ArrayType(T.StringType())
    if isinstance(sample, dict):
        return T.MapType(T.StringType(), T.StringType())
    return T.StringType()


def _to_batch(
    buf: list[Any],
    col_names: list[str],
    map_fn: Callable[[pd.DataFrame], pd.DataFrame] | None,
) -> pd.DataFrame:
    if buf and isinstance(buf[0], dict):
        pdf = pd.DataFrame.from_records(buf)
    else:
        pdf = pd.DataFrame(buf, columns=col_names)
    if map_fn is not None:
        pdf = map_fn(pdf)
    return pdf[col_names]


def batch_source(
    name: str,
    *,
    schema: T.StructType | str,
    search_fn: SearchFn,
    connection_fn: Callable[[], Any] | None = None,
    destroy_fn: Callable[[Any], None] | None = None,
    partitions: list[Any] | None = None,
    filter: Any = None,
    projection: Any = None,
) -> BatchSourceBuilder:
    """Convenience one-call construction (the reference offers the same
    convenience/builder duality, e.g. MongoDBSources.batch vs
    MongoDBSourceBuilder)."""
    b = BatchSourceBuilder(name).schema(schema).search_fn(search_fn)
    if connection_fn:
        b = b.connection_fn(connection_fn)
    if destroy_fn:
        b = b.destroy_fn(destroy_fn)
    if partitions is not None:
        b = b.partitions(partitions)
    if filter is not None:
        b = b.filter(filter)
    if projection is not None:
        b = b.projection(projection)
    return b

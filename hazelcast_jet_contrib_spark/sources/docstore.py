"""Document-store connector shape: find(filter, projection) with both
executed inside the store — reference MongoDBSources.batch
(`mongodb/.../MongoDBSources.java:80-96`): a BSON filter document like
``{val: {$gte: 10}}`` plus a projection document run server-side, only
matching rows cross the wire (test contract MongoDBSourceTest.java:97-123:
90 of 100 docs, projected result lacks the non-projected columns).

The filter language is the Mongo-ish operator subset the reference's own
tests use: {field: value} equality and {field: {"$gt"|"$gte"|"$lt"|
"$lte"|"$eq"|"$ne"|"$in": v}}. The bundled client compiles it to pyarrow
compute predicates evaluated during the parquet read (row-group stats
pruning + filter) — the same "query executes in the external system"
contract.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.sources.builder import batch_source

_OPS = {"$gt", "$gte", "$lt", "$lte", "$eq", "$ne", "$in"}


def _compile_filter(flt: dict[str, Any]):
    """Compile a Mongo-ish filter doc to a pyarrow dataset expression."""
    import pyarrow.dataset as ds

    expr = None
    for field, cond in flt.items():
        f = ds.field(field)
        if isinstance(cond, dict):
            for op, v in cond.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported operator {op!r}")
                e = {
                    "$gt": lambda: f > v,
                    "$gte": lambda: f >= v,
                    "$lt": lambda: f < v,
                    "$lte": lambda: f <= v,
                    "$eq": lambda: f == v,
                    "$ne": lambda: f != v,
                    "$in": lambda: f.isin(list(v)),
                }[op]()
                expr = e if expr is None else (expr & e)
        else:
            e = f == cond
            expr = e if expr is None else (expr & e)
    return expr


def docstore_source(
    spark: SparkSession,
    name: str,
    path: str,
    schema: str,
    filter: dict[str, Any] | None = None,
    projection: list[str] | None = None,
) -> DataFrame:
    """find() over a document collection with server-side filter +
    projection. `schema` must describe exactly the projected columns
    (explicit-first; the reference's dynamic Document shape becomes a
    declared StructType, SURVEY.md §1.2)."""

    import pyarrow.parquet as pq

    n_groups = max(1, pq.ParquetFile(path).metadata.num_row_groups)

    def search(client, part, flt, proj):
        import pyarrow.dataset as ds

        dataset = ds.dataset(path, format="parquet")
        expr = _compile_filter(flt) if flt else None
        # fragment per row group: this task reads only its slice, with the
        # filter applied inside the scan (stats pruning + predicate)
        fragment = next(iter(dataset.get_fragments())).split_by_row_group()[int(part)]
        tbl = fragment.to_table(columns=proj, filter=expr)
        yield tbl.to_pandas()

    return batch_source(
        name,
        schema=schema,
        search_fn=search,
        partitions=list(range(n_groups)),
        filter=filter,
        projection=projection,
    ).build(spark)

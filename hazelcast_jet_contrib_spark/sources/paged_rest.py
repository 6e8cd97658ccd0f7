"""Paged-REST batch source: the Twitter-search connector shape.

Reference behavior (twitter/.../TwitterSources.java:179-187,274-309): a
batch source that repeatedly calls a search API, follows the
``nextQuery()`` pagination token until the API stops returning one (or a
rate limit hits), and emits the mapped records of every page.

Spark-first re-expression: a page loop is inherently sequential *within
one query term*, but a workload is many terms — so the builder takes a
list of independent page-walks (one per partition descriptor, e.g. one
per search term / shard / date slice) and runs each walk inside its own
Spark task via the batch-source framework. A single walk degrades to one
task, exactly the reference's non-distributed source
(`TwitterSources.java` runs one processor). `max_pages` is the
rate-limit bound (the reference stops on `RateLimitStatus`).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.sources.builder import batch_source

# fetch_page(client, partition_descriptor, page_token) ->
#   (records, next_page_token | None). First call gets page_token=None.
FetchPageFn = Callable[[Any, Any, Any], tuple[Iterable[Any], Any]]


def paged_rest_source(
    spark: SparkSession,
    name: str,
    *,
    schema: str,
    fetch_page: FetchPageFn,
    connection_fn: Callable[[], Any] | None = None,
    destroy_fn: Callable[[Any], None] | None = None,
    partitions: list[Any] | None = None,
    max_pages: int = 10_000,
) -> DataFrame:
    """Bounded read of a paged API. Each partition descriptor walks its
    own page chain executor-side; records stream out in Arrow batches as
    pages arrive (never materialized whole)."""

    def search(client: Any, part: Any, flt: Any, proj: Any) -> Iterable[Any]:
        token = None
        for _ in range(max_pages):
            records, token = fetch_page(client, part, token)
            yield from records
            if token is None:
                return
        # page budget exhausted: stop cleanly, exactly like the
        # reference's rate-limit exit (TwitterSources.java:294-300)

    return batch_source(
        name,
        schema=schema,
        search_fn=search,
        connection_fn=connection_fn,
        destroy_fn=destroy_fn,
        partitions=partitions,
    ).build(spark)

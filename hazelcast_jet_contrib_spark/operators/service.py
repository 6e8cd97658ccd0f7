"""Service-scoped map — the reference's ``mapUsingService(factory, fn)``
stage (SURVEY.md §2.5/§2.8).

Reference contract: a ``ServiceFactory`` creates one shared service per
executor (`HashingSupport.java:42-48` builds the hashing service with
``ServiceFactories.sharedService``), and a map stage calls the service
per item (`HyperLogLogTest.java:83,112`:
``mapUsingService(hashingServiceFactory(), hashingFn())``). The point of
the factory is amortization: expensive construction (client connections,
loaded models, native handles) happens once per worker, not per row.

Spark-first re-expression: ``mapInPandas`` with the service created once
per PARTITION (Spark's unit of worker-local execution) and destroyed in
a finally block; the user function sees (service, pandas batch) — per
batch, not per row, so the Python boundary is Arrow-vectorized. Prefer
plain column expressions whenever the "service" is stateless (e.g. the
reference's hashing service is `xxhash64` here, SURVEY §2.4 A2) — this
operator exists for true resource-backed maps.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ServiceFactory:
    """create_fn() -> service; destroy_fn(service) on partition end
    (the createContextFn/destroyContextFn pair of the reference's
    ServiceFactories)."""

    create_fn: Callable[[], Any]
    destroy_fn: Callable[[Any], None] | None = None


def map_using_service(
    df: DataFrame,
    factory: ServiceFactory,
    map_fn: Callable[[Any, pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply ``map_fn(service, batch) -> batch`` over Arrow-sized pandas
    batches, with ``service`` constructed once per partition. ``schema``
    is the output schema (DDL string)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        svc = factory.create_fn()
        try:
            for batch in batches:
                yield map_fn(svc, batch)
        finally:
            if factory.destroy_fn is not None:
                factory.destroy_fn(svc)

    return df.mapInPandas(run, schema=schema)

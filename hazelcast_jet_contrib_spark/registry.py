"""Query registry: the engine's demonstrable capability surface.

Every operator from SURVEY.md §2 (plus the LLM-data-pipeline extensions)
registers here as a named query — a callable ``(spark, sf_dir) ->
DataFrame`` — together with an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver executes both and
compares row count + schema + order-insensitive value hash.

Conventions (required for the hash comparison to be meaningful):
- every computed/aggregate column is aliased identically on both sides;
- floating-point aggregates are ROUND()ed on both sides so sum-order
  nondeterminism across engines cannot flip the hash;
- ordered/limited queries use a total deterministic order (tie-broken by
  a unique integer key);
- approximate operators (HLL) are asserted as a boolean accuracy check
  (estimate within tolerance of exact), which IS deterministic.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The events table stores ts as parquet TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read nanos as long and convert
        # to a microsecond TimestampType column (matching DuckDB's ns->us
        # truncation). Runtime-settable, so this works under the driver's
        # own SparkSession too.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Import side-effect modules that register queries. Keep this at the
# bottom so `query`/`table` exist when they import us.
from hazelcast_jet_contrib_spark import queries_relational  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_subqueries  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_decorrelated  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_probabilistic  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_sources  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_text  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_dedup  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_windows  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_connectors  # noqa: E402,F401
from hazelcast_jet_contrib_spark import queries_joins  # noqa: E402,F401

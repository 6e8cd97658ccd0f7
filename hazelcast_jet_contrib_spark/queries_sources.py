"""Connector-shaped queries: the source-builder framework exercised over
the driver's tables acting as external systems (SURVEY.md §2.1 S3-S6,
S1-S2). Each demonstrates the reference's contract — partitioned client
reads, server-side filter/projection pushdown — through the DuckDB
oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hazelcast_jet_contrib_spark.registry import query, retired_query
from hazelcast_jet_contrib_spark.sources.docstore import docstore_source
from hazelcast_jet_contrib_spark.sources.kv import kv_source, sorted_set_source
from hazelcast_jet_contrib_spark.sources.timeseries import measurement_source


# S3 RedisSources.hash — KV snapshot read emitting (key, value) entries.
@retired_query(
    "kv_hash_snapshot",
    reason="r07: HGETALL snapshot read subsumed by "
    "kv_hash_catalyst_pushdown (same store, DSv2 + pushdown on top)",
    oracle="""
    SELECT c_name AS key, CAST(c_custkey AS VARCHAR) AS value
    FROM customer
    """,
)
def kv_hash_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_source(
        spark, "kv-customer", f"{sf_dir}/customer.parquet", key_col="c_name", value_col="c_custkey"
    )


# S4 RedisSources.sortedSet — ZRANGEBYSCORE with the range evaluated
# server-side (both ends inclusive, RedisSourceTest.java:114-127).
@retired_query(
    "sorted_set_range",
    reason="r07: manual-pushdown range read subsumed by "
    "zset_range_catalyst_pushdown (same store, Catalyst pushFilters)",
    oracle="""
    SELECT value AS score, CAST(event_id AS VARCHAR) AS member
    FROM events
    WHERE value BETWEEN 10.0 AND 50.0
    """,
)
def sorted_set_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sorted_set_source(
        spark,
        "zset-events",
        f"{sf_dir}/events.parquet",
        score_col="value",
        member_col="event_id",
        score_from=10.0,
        score_to=50.0,
    )


# S6 MongoDBSources.batch — find(filter, projection) pushed into the
# store (90-of-100 contract, MongoDBSourceTest.java:97-123).
@retired_query(
    "docstore_find_pushdown",
    reason="r09: manual find(filter, projection) builder subsumed by docstore_catalyst_pushdown (DSv2 + Catalyst pushFilters on the same store) - the kv_hash_snapshot r07 precedent",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE n_chars >= 300 AND lang IN ('en', 'de')
    """,
)
def docstore_find_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return docstore_source(
        spark,
        "docs-find",
        f"{sf_dir}/documents.parquet",
        schema="doc_id long, lang string, n_chars long",
        filter={"n_chars": {"$gte": 300}, "lang": {"$in": ["en", "de"]}},
        projection=["doc_id", "lang", "n_chars"],
    )


# S1 InfluxDbSources.influxDb — measurement query with time-range
# pushdown, long-format (name, tags, time, field, value) projection.
@retired_query(
    "measurement_timeseries_read",
    reason="r09: measurement projection subsumed by timeseries_catalyst_pushdown (DSv2 + pushdown on the same store) - the sorted_set_range r07 precedent",
    oracle="""
    SELECT 'events' AS measurement, event_type AS tag,
           CAST(ts AS TIMESTAMP) AS time, 'value' AS field, value AS val
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    """,
)
def measurement_timeseries_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    return measurement_source(
        spark,
        "ts-events",
        f"{sf_dir}/events.parquet",
        measurement="events",
        time_col="ts",
        tag_col="event_type",
        field_cols=["value"],
        time_from="2024-01-10 00:00:00",
        time_to="2024-01-12 00:00:00",
    )


# DSv2 optimizer-driven pushdown: same store and range as
# sorted_set_range, but the range arrives as a plain .filter() and
# Catalyst hands it to the source via pushFilters — proving the
# composable pushdown path (SURVEY.md §7 "Custom Catalyst/DSv2").
@query(
    "zset_range_catalyst_pushdown",
    oracle="""
    SELECT value AS score, CAST(event_id AS VARCHAR) AS member
    FROM events
    WHERE value BETWEEN 10.0 AND 50.0
    """,
)
def zset_range_catalyst_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.sources import dsv2

    # runtime-settable, so this works under the driver's bare session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    df = (
        spark.read.format("zset_store")
        .option("path", f"{sf_dir}/events.parquet")
        .option("score_col", "value")
        .option("member_col", "event_id")
        .load()
    )
    return df.filter((F.col("score") >= 10.0) & (F.col("score") <= 50.0))


# DSv2 optimizer-driven find() pushdown over the document store: the
# same Mongo-ish contract as docstore_find_pushdown, but the filter
# document is BUILT from plain .filter() predicates by pushFilters —
# $gte/$lte/$eq execute inside the store; the startswith predicate has
# no counterpart in the find language and comes back as a residual that
# Spark re-checks post-scan (both halves audited in
# tests/test_plan_audits.py).
@query(
    "docstore_catalyst_pushdown",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars >= 100 AND n_chars <= 400 AND lang = 'en'
      AND source LIKE 'src1%'
    """,
)
def docstore_catalyst_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.sources import dsv2

    # runtime-settable, so this works under the driver's bare session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    df = (
        spark.read.format("doc_store")
        .option("path", f"{sf_dir}/documents.parquet")
        .option("ddl", "doc_id long, lang string, source string, n_chars long")
        .load()
    )
    return df.filter(
        (F.col("n_chars") >= 100)
        & (F.col("n_chars") <= 400)
        & (F.col("lang") == "en")
        & F.col("source").startswith("src1")
    )


# DSv2 optimizer-driven time-range pushdown over the time-series store:
# the same window as measurement_timeseries_read, but arriving as a
# plain .filter() that Catalyst pushes into the client read — the
# fourth and last store family on the pushFilters pattern. The tag
# equality has no counterpart in the reader's time-range language and
# returns as a residual Spark re-checks post-scan.
@query(
    "timeseries_catalyst_pushdown",
    oracle="""
    SELECT event_type AS tag, CAST(ts AS TIMESTAMP) AS time, value AS val
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-12 00:00:00'
      AND event_type <> 'click'
    """,
)
def timeseries_catalyst_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.sources import dsv2

    # runtime-settable, so this works under the driver's bare session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    df = (
        spark.read.format("ts_store")
        .option("path", f"{sf_dir}/events.parquet")
        .option("time_col", "ts")
        .option("tag_col", "event_type")
        .option("field_col", "value")
        .load()
    )
    return df.filter(
        (F.col("time") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("time") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
        & (F.col("tag") != "click")
    )


# DSv2 optimizer-driven key pushdown over the KV/hash store: where
# kv_hash_snapshot is HGETALL (full snapshot), a plain .filter() on the
# key column narrows the store read to the server-side key ops a hash
# store has — startswith becomes a SCAN MATCH "p*" cursor scan executed
# inside the client (row-group stats pruning + arrow mask), while the
# contains predicate on the VALUE has no key-op counterpart and comes
# back as a residual Spark re-checks post-scan (both halves audited in
# tests/test_plan_audits.py).
@query(
    "kv_hash_catalyst_pushdown",
    oracle="""
    SELECT c_name AS key, CAST(c_custkey AS VARCHAR) AS value
    FROM customer
    WHERE c_name LIKE 'Customer#0000001%'
      AND CAST(c_custkey AS VARCHAR) LIKE '%5%'
    """,
)
def kv_hash_catalyst_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.sources import dsv2

    # runtime-settable, so this works under the driver's bare session
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    dsv2.register(spark)
    df = (
        spark.read.format("kv_store")
        .option("path", f"{sf_dir}/customer.parquet")
        .option("key_col", "c_name")
        .option("value_col", "c_custkey")
        .load()
    )
    return df.filter(
        F.col("key").startswith("Customer#0000001") & F.col("value").contains("5")
    )

"""Timestamp policies — the reference pipeline's four event-time modes
(SURVEY.md §2.7: `withNativeTimestamps(lag)` MongoDBSourceTest.java:68,
`withIngestionTimestamps()` HyperLogLogTest.java:81,
`withoutTimestamps()` RedisSourceTest.java:171, `addTimestamps(fn, lag)`
InfluxDbSourceTest.java:97) expressed as DataFrame transforms.

In Spark the allowed-lag becomes the watermark delay; the per-item
hidden long timestamp becomes an explicit TimestampType column.
Watermark progression differs from the reference's per-partition
EventTimeMapper (RedisSources.java:587): Spark advances a single global
watermark per micro-batch over observed event times, so an idle source
partition cannot stall the watermark — the failure mode the reference's
idle-handling exists for does not arise (documented semantic
difference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EVENT_TIME_COL = "event_time"


def with_native_timestamps(
    df: DataFrame, ts_col: str, allowed_lag: str = "0 seconds"
) -> DataFrame:
    """Event time from a column the external system supplied (Mongo
    clusterTime / Pulsar eventTime / Kafka record timestamp)."""
    out = df.withColumn(EVENT_TIME_COL, F.col(ts_col).cast("timestamp"))
    return out.withWatermark(EVENT_TIME_COL, allowed_lag) if out.isStreaming else out


def with_ingestion_timestamps(df: DataFrame) -> DataFrame:
    """Event time assigned at ingestion (processing time of the batch
    that first saw the record)."""
    out = df.withColumn(EVENT_TIME_COL, F.current_timestamp())
    # ingestion time is monotonic per batch: zero lag suffices
    return out.withWatermark(EVENT_TIME_COL, "0 seconds") if out.isStreaming else out


def with_timestamps(
    df: DataFrame, ts_expr: Column, allowed_lag: str = "0 seconds"
) -> DataFrame:
    """Event time computed by a user expression (`addTimestamps(fn,
    lag)`) — e.g. parsing `timestamp_ms` out of a JSON payload the way
    the Twitter source does (TwitterSources.java:245-262)."""
    out = df.withColumn(EVENT_TIME_COL, ts_expr.cast("timestamp"))
    return out.withWatermark(EVENT_TIME_COL, allowed_lag) if out.isStreaming else out


def without_timestamps(df: DataFrame) -> DataFrame:
    """No event-time semantics (pipelines that never window)."""
    return df

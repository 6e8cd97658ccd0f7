"""Sink builder framework: buffered, flushing, retrying writers.

Reference contract (SURVEY.md §2.3): every sink is
``SinkBuilder(receiveFn → buffer, flushFn → batch push, destroyFn)`` with
optional retry/backoff (MqttSinkBuilder.java:66-91) — exactly the shape
of a Spark `foreachPartition` / `foreachBatch` writer.
"""

from hazelcast_jet_contrib_spark.sinks.builder import RetryStrategy, SinkBuilder

__all__ = ["RetryStrategy", "SinkBuilder"]

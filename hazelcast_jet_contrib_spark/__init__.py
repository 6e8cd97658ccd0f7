"""hazelcast_jet_contrib_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of hazelcast/hazelcast-jet-contrib.

This is NOT a port of the reference (a Hazelcast Jet connector/extension
repo, Java). It re-expresses the reference's capability surface —
connector source/sink builder frameworks, probabilistic aggregation
(HyperLogLog + 64-bit hashing), streaming semantics (event time,
watermarks, exactly-once restart), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns) — as idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
Structured Streaming for unbounded data, Pandas UDFs only where built-ins
cannot express the semantics.

Layout:
    session        SparkSession factory tuned for the target scale
    functions/     column-level functions (probabilistic, text, vectors)
    sources/       batch + streaming source builder framework & connectors
    sinks/         buffered/flushing sink builder framework with retry/QoS
    operators/     dataset-level operators (dedup, similarity, windows, ...)
    streaming/     timestamp policies, offsets, exactly-once helpers
    plans/         plan inspection utilities (pushdown/broadcast asserts)
"""

from hazelcast_jet_contrib_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"

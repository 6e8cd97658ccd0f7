"""Streaming core: timestamp policies, replayable-offset sources, and
exactly-once sink discipline — the semantics every reference connector
implements by hand (SURVEY.md §2.7), re-landed on Structured Streaming's
checkpointed micro-batch engine.
"""

from hazelcast_jet_contrib_spark.streaming.timestamps import (
    with_ingestion_timestamps,
    with_native_timestamps,
    with_timestamps,
)

__all__ = [
    "with_ingestion_timestamps",
    "with_native_timestamps",
    "with_timestamps",
]

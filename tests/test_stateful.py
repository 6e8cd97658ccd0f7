"""Custom stateful streaming operators: cross-batch dedup and running
counters over the message-log source, including state survival across
query restart (the reference's snapshot/restore contract, engine-managed
here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.streaming import message_log
from hazelcast_jet_contrib_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_count,
)


def _log_stream(spark, root):
    message_log.register(spark)
    return spark.readStream.format("message_log").option("path", root).load()


def test_streaming_dedup_across_batches_and_restart(spark, tmp_path):
    """Keys repeated within a batch, across batches, and across a query
    RESTART are all emitted exactly once — state lives in the
    checkpointed state store, not in process memory."""
    root = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    message_log.append_segment(
        root, "s", [{"key": "a", "value": "a-1"}, {"key": "b", "value": "b-1"}]
    )
    message_log.append_segment(root, "s", [{"key": "a", "value": "a-dup-batch1"}])

    def run(extra_segments):
        for seg in extra_segments:
            message_log.append_segment(root, "s", seg)
        q = (
            streaming_dedup(_log_stream(spark, root), "key", "key string, value string")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    run([])
    # restart with new arrivals: dup of a/b (must stay dropped), new c
    run([[{"key": "b", "value": "b-dup-after-restart"}, {"key": "c", "value": "c-1"}]])

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {(r["key"], r["value"]) for r in out.collect()}
    assert rows == {("a", "a-1"), ("b", "b-1"), ("c", "c-1")}


def test_streaming_running_count_updates_per_batch(spark, tmp_path):
    root = str(tmp_path / "log")
    message_log.append_segment(
        root, "s", [{"key": "x", "value": "1"}, {"key": "x", "value": "2"},
                    {"key": "y", "value": "3"}]
    )
    q = (
        streaming_running_count(_log_stream(spark, root), "key")
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        message_log.append_segment(root, "s", [{"key": "x", "value": "4"}])
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()

    rows = [
        (r["key"], r["n"])
        for r in spark.sql("SELECT key, n FROM running_counts").collect()
    ]
    # batch 0 emits x=2, y=1; batch 1 emits the updated x=3
    assert max(n for k, n in rows if k == "x") == 3
    assert max(n for k, n in rows if k == "y") == 1

"""Replayable-offset streaming source, implemented as a PySpark Python
DataSource (DataSourceStreamReader) — the canonical Spark form of the
reference's snapshot/restore offset contract.

Reference contract being re-expressed (SURVEY.md §2.2 S8/S13): the Redis
stream source keeps a per-stream offset map advanced per message and
saves it into the distributed snapshot (RedisSources.java:590,613-654);
the Pulsar reader snapshots a MessageId and seeks to it on restart
(PulsarReaderBuilder.java:177-199). In Spark those duties split cleanly:
the source reports offsets (`initialOffset`/`latestOffset`), the engine
WALs them per micro-batch, and `partitions(start, end)` + `read()`
replay any offset range deterministically — restart-safe exactly-once
for free once the sink is idempotent.

The external system here is a **message log directory**: each stream is
a subdirectory of numbered `.jsonl` segment files (`000000.jsonl`, ...),
append-only — the minimal stand-in for Redis streams / Kafka segments
the test environment can host. Offsets are `{stream_name: next_segment
_index}`. One input partition per stream per batch — the reference's
stream-to-processor round-robin (RedisSources.java:693-756) becomes the
engine's task scheduling.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition

#: Full message schema (PulsarSources.java:84-92 parity): alongside the
#: routing key and payload, every message surfaces its properties map
#: and producer-assigned event time (epoch millis; null if the producer
#: set none) so consumers can watermark on eventTime rather than arrival
#: time (SURVEY.md §2.7 timestamp policies).
SCHEMA = (
    "stream string, seq long, key string, value string, "
    "properties map<string,string>, event_time long"
)


@dataclass
class _SegmentRange(InputPartition):
    stream: str
    path: str
    start: int
    end: int


def _segments(stream_dir: str) -> list[int]:
    try:
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(stream_dir) if f.endswith(".jsonl")
        )
    except FileNotFoundError:
        return []


class MessageLogStreamReader(DataSourceStreamReader):
    def __init__(self, root: str, max_segments_per_trigger: int | None = None):
        self.root = root
        self.max_segments_per_trigger = max_segments_per_trigger
        self._prev_end: dict | None = None

    def _streams(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))
        )

    def initialOffset(self) -> dict:
        # start of every stream (the reference's "no snapshot yet" state)
        return {s: 0 for s in self._streams()}

    def latestOffset(self) -> dict:
        # next-segment-to-read per stream; new streams join at 0
        end = {
            s: (max(_segments(os.path.join(self.root, s)), default=-1) + 1)
            for s in self._streams()
        }
        # admission control (the reference's bounded fillBuffer / queue
        # backpressure, SURVEY.md §2.7): after the first batch, advance
        # at most max_segments_per_trigger segments per stream per
        # trigger. The first batch is unclamped because this reader
        # cannot see the WAL's committed start; clamping it could plan
        # an end below a restart's start offset.
        if self.max_segments_per_trigger is not None and self._prev_end is not None:
            end = {
                s: min(e, self._prev_end.get(s, 0) + self.max_segments_per_trigger)
                for s, e in end.items()
            }
        self._prev_end = end
        return end

    def partitions(self, start: dict, end: dict):
        parts = [
            _SegmentRange(
                stream=s,
                path=os.path.join(self.root, s),
                start=start.get(s, 0),
                end=end[s],
            )
            for s in end
            if end[s] > start.get(s, 0)
        ]
        # Spark requires at least one partition even for an empty batch
        return parts or [_SegmentRange(stream="", path="", start=0, end=0)]

    def read(self, partition: _SegmentRange):
        for seq in range(partition.start, partition.end):
            seg = os.path.join(partition.path, f"{seq:06d}.jsonl")
            if not os.path.exists(seg):
                continue
            with open(seg) as f:
                for line in f:
                    rec = json.loads(line)
                    props = rec.get("properties")
                    et = rec.get("event_time")
                    yield (
                        partition.stream,
                        seq,
                        rec.get("key"),
                        rec.get("value"),
                        {str(k): str(v) for k, v in props.items()}
                        if props is not None
                        else None,
                        int(et) if et is not None else None,
                    )

    def commit(self, end: dict) -> None:
        # nothing to acknowledge: the log is immutable and replayable;
        # Spark's WAL owns the committed offset (the reference needs the
        # snapshot for this — SURVEY.md §2.7)
        pass


class MessageLogDataSource(DataSource):
    """`spark.readStream.format("message_log").option("path", root)`.

    Options: `path` (required); `maxSegmentsPerTrigger` — admission
    control, the analog of maxOffsetsPerTrigger / the reference's
    bounded per-fill batches (InfluxDbSources.java:234-238).

    Register once per session:
        spark.dataSource.register(MessageLogDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "message_log"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> MessageLogStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("message_log source requires option 'path'")
        max_seg = self.options.get("maxSegmentsPerTrigger")
        return MessageLogStreamReader(
            path, int(max_seg) if max_seg is not None else None
        )


def register(spark) -> None:
    spark.dataSource.register(MessageLogDataSource)


def append_segment(root: str, stream: str, records: list[dict], seq: int | None = None) -> int:
    """Producer helper (used by tests, sinks, and the webhook spool):
    append one segment file atomically; returns its sequence number.

    Safe under concurrent producers (e.g. every partition of a
    stream_sink writing at once): the next free sequence number is
    claimed with os.link, which atomically fails if another producer won
    the slot — then we re-scan and retry."""
    sdir = os.path.join(root, stream)
    os.makedirs(sdir, exist_ok=True)
    tmp = os.path.join(sdir, f".seg-{os.getpid()}-{time.monotonic_ns()}.tmp")
    with open(tmp, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    try:
        if seq is not None:
            os.replace(tmp, os.path.join(sdir, f"{seq:06d}.jsonl"))
            tmp = None
            return seq
        while True:
            seq = max(_segments(sdir), default=-1) + 1
            try:
                os.link(tmp, os.path.join(sdir, f"{seq:06d}.jsonl"))
                return seq
            except FileExistsError:
                continue
    finally:
        if tmp is not None and os.path.exists(tmp):
            os.unlink(tmp)

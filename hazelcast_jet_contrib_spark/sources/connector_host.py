"""Generic connector host: run ANY third-party poll-style source task as
a Spark streaming source.

Reference behavior (kafka-connect/.../KafkaConnectSources.java:59-83 +
impl/AbstractKafkaConnectSource.java:36-149): the engine reflectively
instantiates an arbitrary Kafka Connect ``SourceConnector`` + task from
a properties map, polls it for records, snapshots its
``Map<partition, offset>`` state, and feeds the snapshot back through an
``OffsetStorageReader`` shim on restart.

Spark-first re-expression as a Python DataSource stream reader:
- the task class is named by ``task_class`` ("pkg.module:ClassName") and
  instantiated from ``task_config`` — reflective hosting, same as the
  reference;
- the task implements the replayable-offset contract Spark requires:
  ``partitions()`` (its internal shards), ``latest_offset(partition)``
  (high watermark per shard), and ``read(partition, start, end)``
  (deterministic range replay). Offsets are WAL'd by Spark per
  micro-batch — the engine-side half of the reference's
  snapshot/OffsetStorageReader pair;
- each shard reads in its own Spark task; the task class is re-imported
  executor-side (everything crossing the boundary is the class path +
  config, mirroring the reference's properties-map serialization).

A task whose upstream cannot replay ranges (true fire-hose APIs) should
spool through `streaming.message_log` instead — same split the
reference makes between offset-snapshotting sources and
non-fault-tolerant ones (SURVEY.md §2.2).
"""

from __future__ import annotations

import importlib
import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def load_task(task_class: str, task_config: dict[str, Any]):
    """Reflectively instantiate ``pkg.module:ClassName`` with its config
    (the analog of AbstractKafkaConnectSource.java:53-66's
    newInstance + start(properties))."""
    mod_name, _, cls_name = task_class.partition(":")
    if not cls_name:
        raise ValueError(
            f"task_class must be 'pkg.module:ClassName', got {task_class!r}"
        )
    cls = getattr(importlib.import_module(mod_name), cls_name)
    task = cls()
    task.configure(task_config)
    return task


@dataclass
class _ShardRange(InputPartition):
    task_class: str
    config_json: str
    shard: str
    start: int
    end: int


class ConnectorHostStreamReader(DataSourceStreamReader):
    def __init__(self, task_class: str, task_config: dict[str, Any]):
        self.task_class = task_class
        self.task_config = task_config
        self._task = load_task(task_class, task_config)

    def initialOffset(self) -> dict:
        return {s: 0 for s in self._task.partitions()}

    def latestOffset(self) -> dict:
        return {s: self._task.latest_offset(s) for s in self._task.partitions()}

    def partitions(self, start: dict, end: dict):
        cfg = json.dumps(self.task_config)
        parts = [
            _ShardRange(self.task_class, cfg, s, start.get(s, 0), end[s])
            for s in end
            if end[s] > start.get(s, 0)
        ]
        return parts or [_ShardRange(self.task_class, cfg, "", 0, 0)]

    def read(self, partition: _ShardRange):
        if partition.end <= partition.start:
            return iter(())
        task = load_task(partition.task_class, json.loads(partition.config_json))
        return iter(task.read(partition.shard, partition.start, partition.end))

    def commit(self, end: dict) -> None:
        pass  # Spark's WAL owns committed offsets


class ConnectorHostDataSource(DataSource):
    """``spark.readStream.format("connector_host")
    .option("task_class", "pkg.module:Cls")
    .option("task_config", json.dumps({...}))``.

    Register once per session:
        spark.dataSource.register(ConnectorHostDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "connector_host"

    def _task(self):
        task_class = self.options.get("task_class")
        if not task_class:
            raise ValueError("connector_host requires option 'task_class'")
        return load_task(task_class, json.loads(self.options.get("task_config", "{}")))

    def schema(self) -> str:
        return self._task().schema()

    def streamReader(self, schema) -> ConnectorHostStreamReader:
        return ConnectorHostStreamReader(
            self.options["task_class"],
            json.loads(self.options.get("task_config", "{}")),
        )


def register(spark) -> None:
    spark.dataSource.register(ConnectorHostDataSource)


# ---------------------------------------------------------------------------
# Kafka-Connect-shaped poll host: map-shaped (sourcePartition -> sourceOffset)
# offsets, OffsetStorageReader feedback, SourceRecord adapter.
# ---------------------------------------------------------------------------


def _pkey(partition: dict[str, Any]) -> str:
    """Canonical JSON key for a sourcePartition map (key order must not
    matter, exactly as Connect's offset storage keys by the map value)."""
    return json.dumps(partition, sort_keys=True)


@dataclass
class SourceRecord:
    """The Kafka Connect SourceRecord surface the host consumes
    (KafkaConnectSources.java:77-80 maps records to key/value/timestamp
    items): a map-shaped sourcePartition identifying the upstream shard,
    a map-shaped sourceOffset (the task's resume state for that shard),
    and the record payload."""

    source_partition: dict[str, Any]
    source_offset: dict[str, Any]
    topic: str
    key: str | None = None
    value: str | None = None
    timestamp_ms: int | None = None
    headers: dict[str, str] = field(default_factory=dict)


class OffsetStorageReader:
    """The restart-feedback half of the reference's contract
    (AbstractKafkaConnectSource.java:101-136: the engine snapshots the
    task's Map<partition, offset> state and serves it back through an
    OffsetStorageReader shim): ``offset(partition_map)`` returns the last
    committed sourceOffset for that sourcePartition, or None."""

    def __init__(self, offsets: dict[str, dict[str, Any]]):
        self._offsets = dict(offsets)

    def offset(self, partition: dict[str, Any]) -> dict[str, Any] | None:
        got = self._offsets.get(_pkey(partition))
        return dict(got) if got is not None else None

    def offsets(self, partitions: list[dict[str, Any]]) -> list[dict[str, Any] | None]:
        return [self.offset(p) for p in partitions]


#: SourceRecord adapter schema: schema'd key/value + timestamp columns
#: (KafkaConnectSources.java:77-80), plus the sourcePartition map for
#: lineage/debugging. sourceOffsets live in Spark's offset WAL, not rows.
CONNECT_SCHEMA = (
    "topic string, key string, value string, timestamp long, "
    "source_partition map<string,string>"
)


class ConnectTaskStreamReader(SimpleDataSourceStreamReader):
    """Host for a poll-style Connect task (``configure(props)`` +
    ``initialize(offset_storage_reader)`` + ``poll() -> [SourceRecord]``
    — the SourceTask loop, no replayable range reads required).

    Spark-first split of the reference's duties: the offset dict Spark
    WALs per micro-batch IS the Connect offset store —
    ``{"seq": n, "offsets": {sourcePartitionJson: sourceOffsetMap}}`` —
    so on restart the task is re-initialized with exactly the committed
    map-of-maps through OffsetStorageReader (parity with
    AbstractKafkaConnectSource.java:101-136). Polled batches are spooled
    (one JSON file per batch seq) so a planned-but-uncommitted batch
    replays byte-identically after a crash (readBetweenOffsets), which
    the reference gets from its in-memory snapshot + broker redelivery.

    Driver-side poll loop by design: a Connect SourceTask is a
    single-threaded poll loop in the reference too (one task instance
    per connector); Spark distributes the downstream processing.
    """

    def __init__(self, task_class: str, task_config: dict[str, Any], spool_dir: str):
        self.task_class = task_class
        self.task_config = task_config
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._task = None

    # -- task lifecycle -----------------------------------------------------
    def _ensure_task(self, offsets: dict[str, dict[str, Any]]):
        """Lazily instantiate + initialize the task with the offsets of
        the first batch that actually polls — NOT construction time,
        because a restart may first replay a spooled batch whose offsets
        are ahead of this reader's initial state."""
        if self._task is None:
            self._task = load_task(self.task_class, self.task_config)
            init = getattr(self._task, "initialize", None)
            if init is not None:
                init(OffsetStorageReader(offsets))
        return self._task

    # -- spool --------------------------------------------------------------
    def _spool_path(self, seq: int) -> str:
        return os.path.join(self.spool_dir, f"batch-{seq:09d}.json")

    def _spool_write(self, seq: int, rows: list, end: dict) -> None:
        tmp = self._spool_path(seq) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"rows": rows, "end": end}, f)
        os.replace(tmp, self._spool_path(seq))

    def _spool_read(self, seq: int) -> dict | None:
        try:
            with open(self._spool_path(seq)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    # -- stream reader contract --------------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": 0, "offsets": {}}

    def read(self, start: dict):
        seq = int(start.get("seq", 0))
        spooled = self._spool_read(seq)
        if spooled is not None:
            # a crashed run already polled this batch: replay it rather
            # than advancing the upstream past never-committed records
            return iter(map(tuple, spooled["rows"])), spooled["end"]

        task = self._ensure_task(start.get("offsets", {}))
        records = list(task.poll() or [])
        if not records:
            return iter(()), start  # unchanged offset -> no batch

        offsets = dict(start.get("offsets", {}))
        rows = []
        for r in records:
            offsets[_pkey(r.source_partition)] = dict(r.source_offset)
            rows.append(
                (
                    r.topic,
                    r.key,
                    r.value,
                    int(r.timestamp_ms) if r.timestamp_ms is not None else None,
                    {str(k): str(v) for k, v in r.source_partition.items()},
                )
            )
        end = {"seq": seq + 1, "offsets": offsets}
        self._spool_write(seq, rows, end)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        spooled = self._spool_read(int(start.get("seq", 0)))
        if spooled is None:
            raise RuntimeError(
                f"connect host: no spool for replay of batch {start} -> {end}"
            )
        return iter(map(tuple, spooled["rows"]))

    def commit(self, end: dict) -> None:
        # batches below the committed seq can never be replayed: prune
        committed = int(end.get("seq", 0))
        for f in os.listdir(self.spool_dir):
            if f.startswith("batch-") and f.endswith(".json"):
                if int(f[len("batch-") : -len(".json")]) < committed - 1:
                    os.unlink(os.path.join(self.spool_dir, f))
        cb = getattr(self._task, "commit", None) if self._task else None
        if cb is not None:
            cb()


def resolve_connector(
    connector_class: str, connector_config: dict[str, Any], max_tasks: int = 1
) -> tuple[str, dict[str, Any]]:
    """Connector-level resolution, the reference's entry contract
    (KafkaConnectSources.java:59-83: instantiate the SourceConnector
    from a properties map, ``start(props)``, then derive the task from
    ``taskClass()`` + ``taskConfigs(maxTasks)``). One task instance per
    connector, same as the reference (it pins tasks.max=1)."""
    mod_name, _, cls_name = connector_class.partition(":")
    if not cls_name:
        raise ValueError(
            f"connector_class must be 'pkg.module:ClassName', got {connector_class!r}"
        )
    conn = getattr(importlib.import_module(mod_name), cls_name)()
    conn.start(connector_config)
    configs = conn.task_configs(max_tasks)
    if not configs:
        raise ValueError(f"{connector_class} produced no task configs")
    return conn.task_class(), dict(configs[0])


class ConnectTaskDataSource(DataSource):
    """``spark.readStream.format("kafka_connect_host")`` with EITHER a
    task directly::

        .option("task_class", "pkg.module:Cls")
        .option("task_config", json.dumps({...}))

    or a Connect-shaped connector, resolved via start/taskConfigs/
    taskClass exactly as the reference hosts one::

        .option("connector_class", "pkg.module:ConnectorCls")
        .option("connector_config", json.dumps({...}))

    plus ``.option("spool_dir", "/path/for/replay/spool")`` either way.

    Register once per session:
        spark.dataSource.register(ConnectTaskDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "kafka_connect_host"

    def schema(self) -> str:
        return CONNECT_SCHEMA

    def simpleStreamReader(self, schema) -> ConnectTaskStreamReader:
        spool = self.options.get("spool_dir")
        if not spool:
            raise ValueError("kafka_connect_host requires option 'spool_dir'")
        task_class = self.options.get("task_class")
        connector_class = self.options.get("connector_class")
        if task_class:
            task_config = json.loads(self.options.get("task_config", "{}"))
        elif connector_class:
            task_class, task_config = resolve_connector(
                connector_class,
                json.loads(self.options.get("connector_config", "{}")),
            )
        else:
            raise ValueError(
                "kafka_connect_host requires option 'task_class' or "
                "'connector_class'"
            )
        return ConnectTaskStreamReader(task_class, task_config, spool)


def register_connect(spark) -> None:
    spark.dataSource.register(ConnectTaskDataSource)


class FileTailSourceTask:
    """Bundled Connect-shaped demo task, the FileStreamSource connector
    shape: tail every ``*.txt`` file under ``dir``, one sourcePartition
    map ``{"filename": name}`` per file, sourceOffset ``{"position":
    line_index}``. Resumes mid-file from whatever OffsetStorageReader
    returns — the restart-parity probe records what it was given so
    tests can assert exact offset feedback."""

    def configure(self, config: dict[str, Any]) -> None:
        self.dir = config["dir"]
        self.topic = config.get("topic", "file-lines")
        self.probe_path = config.get("probe_path")
        self._positions: dict[str, int] = {}

    def initialize(self, offset_reader: OffsetStorageReader) -> None:
        seen: dict[str, Any] = {}
        for name in self._files():
            off = offset_reader.offset({"filename": name})
            if off is not None:
                self._positions[name] = int(off["position"])
                seen[name] = off
        if self.probe_path:
            with open(self.probe_path, "w") as f:
                json.dump(seen, f, sort_keys=True)

    def _files(self) -> list[str]:
        return sorted(f for f in os.listdir(self.dir) if f.endswith(".txt"))

    def poll(self) -> list[SourceRecord]:
        out: list[SourceRecord] = []
        for name in self._files():
            pos = self._positions.get(name, 0)
            with open(os.path.join(self.dir, name)) as f:
                lines = f.read().splitlines()
            for i, line in enumerate(lines[pos:], start=pos):
                out.append(
                    SourceRecord(
                        source_partition={"filename": name},
                        source_offset={"position": i + 1},
                        topic=self.topic,
                        key=f"{name}:{i}",
                        value=line,
                        timestamp_ms=1_000 + i,
                    )
                )
            if lines:
                self._positions[name] = len(lines)
        return out


class FileTailSourceConnector:
    """Connect-shaped demo connector wrapping :class:`FileTailSourceTask`
    — the FileStreamSource connector surface: ``start(props)`` validates
    and keeps the properties, ``task_configs(max_tasks)`` derives the
    (single) task's property map, ``task_class()`` names the task."""

    def start(self, props: dict[str, Any]) -> None:
        if "dir" not in props:
            raise ValueError("FileTailSourceConnector requires 'dir'")
        self._props = dict(props)

    def task_class(self) -> str:
        return (
            "hazelcast_jet_contrib_spark.sources.connector_host:FileTailSourceTask"
        )

    def task_configs(self, max_tasks: int) -> list[dict[str, Any]]:
        # file tailing is inherently single-task (one directory scan
        # order); max_tasks is capped at 1, as the reference caps
        # tasks.max for its hosted connectors
        return [dict(self._props)]

    def stop(self) -> None:
        pass


class SeededCounterTask:
    """Bundled demo task — the analog of the reference's test connector
    (KafkaConnectRandomIntIntegrationTest.java:39-60: a generator source
    producing ints at a fixed rate). Deterministic: shard ``s`` emits
    ``value = seed + seq`` so every offset range replays identically.
    Config: {"shards": ["a", "b"], "seed": 7, "advance_per_poll": N,
    "max_offset": M}.

    The high watermark advances by `advance_per_poll` every time
    latest_offset() is asked — simulating an upstream that accumulated
    more records between engine polls — and saturates at `max_offset`
    (a bounded upstream; lets processAllAvailable() drain in tests).
    """

    def configure(self, config: dict[str, Any]) -> None:
        self.shards = list(config.get("shards", ["shard-0"]))
        self.seed = int(config.get("seed", 0))
        self.advance = int(config.get("advance_per_poll", 5))
        self.max_offset = int(config.get("max_offset", 25))
        self._polls: dict[str, int] = {}

    def schema(self) -> str:
        return "shard string, seq long, value long"

    def partitions(self) -> list[str]:
        return self.shards

    def latest_offset(self, shard: str) -> int:
        self._polls[shard] = self._polls.get(shard, 0) + 1
        return min(self._polls[shard] * self.advance, self.max_offset)

    def read(self, shard: str, start: int, end: int):
        for seq in range(start, end):
            yield (shard, seq, self.seed + seq)

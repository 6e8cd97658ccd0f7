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
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import DataSource, DataSourceStreamReader, InputPartition


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

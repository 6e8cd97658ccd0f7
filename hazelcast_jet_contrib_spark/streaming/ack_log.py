"""At-least-once, ack-based consumption of a message-log directory —
the Pulsar shared-subscription / MQTT keep-session delivery shape.

Reference behavior: the Pulsar consumer source acknowledges messages
after handing them to the pipeline and is explicitly *not* fault-
tolerant — on restart the broker redelivers everything unacknowledged
(`PulsarConsumerBuilder.java:50-223`, SURVEY.md §2.2 S12); MQTT keeps
subscription state broker-side and redelivers QoS>=1 messages when the
session is kept (`MqttSources.java:47-52`).

Spark-first re-expression: subscription state lives *in the source
directory* as a per-subscription ack marker, not in Spark's checkpoint.
``commit(end)`` — called by Spark only after a micro-batch is durably
committed — advances the marker (the broker-side cumulative ack). A
restarted query (fresh checkpoint, same subscription) resumes from the
marker: acknowledged segments are never redelivered, in-flight ones are
— at-least-once, exactly the reference's contract. Pair the sink with
`exactly_once.idempotent_foreach_batch` to absorb redelivery.

Replaying WITH the same checkpoint is still exactly-once (Spark's WAL
takes precedence over initialOffset) — strictly stronger than the
reference here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource

from hazelcast_jet_contrib_spark.streaming.message_log import (
    SCHEMA,
    MessageLogStreamReader,
)


def _ack_path(root: str, subscription: str) -> str:
    return os.path.join(root, f".sub-{subscription}.ack")


def read_ack(root: str, subscription: str) -> dict:
    try:
        with open(_ack_path(root, subscription)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {}


class AckedMessageLogStreamReader(MessageLogStreamReader):
    def __init__(self, root: str, subscription: str):
        super().__init__(root)
        self.subscription = subscription

    def initialOffset(self) -> dict:
        # resume from the subscription's cumulative ack; streams never
        # seen by this subscription start at 0
        acked = read_ack(self.root, self.subscription)
        return {s: acked.get(s, 0) for s in self._streams()}

    def commit(self, end: dict) -> None:
        # cumulative ack, monotone per stream (a replayed commit of an
        # older offset must not move the marker backwards)
        acked = read_ack(self.root, self.subscription)
        for s, o in end.items():
            acked[s] = max(acked.get(s, 0), int(o))
        tmp = _ack_path(self.root, self.subscription) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(acked, f)
        os.replace(tmp, _ack_path(self.root, self.subscription))


class AckedMessageLogDataSource(DataSource):
    """``spark.readStream.format("acked_message_log")
    .option("path", root).option("subscription", name)``.

    Register once per session:
        spark.dataSource.register(AckedMessageLogDataSource)
    """

    @classmethod
    def name(cls) -> str:
        return "acked_message_log"

    def schema(self) -> str:
        return SCHEMA

    def streamReader(self, schema) -> AckedMessageLogStreamReader:
        path = self.options.get("path")
        if not path:
            raise ValueError("acked_message_log source requires option 'path'")
        return AckedMessageLogStreamReader(
            path, self.options.get("subscription", "default")
        )


def register(spark) -> None:
    spark.dataSource.register(AckedMessageLogDataSource)

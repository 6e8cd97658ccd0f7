"""Custom stateful streaming operators via applyInPandasWithState —
the Spark surface for operator state the built-in aggregations can't
express (the analog of the reference connectors' hand-rolled processor
state, e.g. the Redis source's per-stream offset map,
RedisSources.java:590-654, generalized to user logic).

State lives in Spark's checkpointed state store: keyed, fault-tolerant,
restored on restart — the engine-managed replacement for the
snapshot/restore pair every stateful reference processor implements.

Operators here are the training-pipeline staples:
- `streaming_dedup` — cross-batch first-occurrence dedup (emit a key's
  row the first time it is ever seen, drop all later arrivals, forever —
  `dropDuplicates` on a stream needs a watermark and forgets; this
  remembers per key until the optional TTL).
- `streaming_running_count` — per-key running counters emitted every
  update (the rollingAggregate shape with arbitrary per-key state).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_dedup(
    df: DataFrame,
    key_col: str,
    value_schema: str,
) -> DataFrame:
    """First-occurrence-only pass-through of a keyed stream.

    Output schema = `value_schema` (must name the key column plus the
    carried columns, all present in `df`). State per key: a single seen
    marker; rows for an already-seen key are dropped in every later
    micro-batch. Use for cross-batch ingest dedup where replays and
    producer retries re-send records (pairs with the at-least-once
    ack_log source to recover exactly-once delivery downstream).
    """
    out_schema = StructType.fromDDL(value_schema)
    out_cols = [f.name for f in out_schema.fields]

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key seen in an earlier batch: drop everything
        first = None
        for pdf in pdfs:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][out_cols]
        if first is not None:
            state.update((True,))
            yield first

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType="seen boolean",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_rolling_hll(
    df: DataFrame,
    value_col: str,
    key_col: str | None = None,
    precision: int | None = None,
) -> DataFrame:
    """Running HLL++ distinct-count over a stream — the reference's
    flagship streaming usage (HyperLogLogTest.java:79-86:
    ``rollingAggregate(hll)`` emitting a continuously updated estimate to
    a KV sink). Spark-first: ``approx_count_distinct`` IS HLL++ and its
    sketch lives in the checkpointed streaming state store, so an
    update-mode aggregation emits the running estimate per micro-batch
    (per batch rather than per event — the documented semantic
    difference) and survives restart. Pair with ``kv_hash_sink`` inside
    ``foreachBatch`` for the reference's Sinks.map target.

    Global estimate when ``key_col`` is None, per-key otherwise.
    Output column: ``distinct_estimate``.
    """
    from hazelcast_jet_contrib_spark.functions.probabilistic import (
        DEFAULT_PRECISION,
        hyper_log_log,
    )

    est = hyper_log_log(
        value_col, precision if precision is not None else DEFAULT_PRECISION
    ).alias("distinct_estimate")
    grouped = df.groupBy(key_col) if key_col is not None else df.groupBy()
    return grouped.agg(est)


def streaming_running_count(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """Per-key running count emitted on every batch that touches the
    key — the reference's rollingAggregate-to-KV-sink shape
    (HyperLogLogTest.java:79-86) with explicit operator state.
    Output: (key string, n long)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"key": [str(key[0])], "n": [n]})

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType="key string, n long",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

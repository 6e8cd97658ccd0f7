"""Delivery-guarantee probes: standalone checks that a sink target can
support exactly-once delivery under replay — the Spark analog of the
reference's XA compatibility probes.

Reference behavior (xa-test/.../JdbcXaTest.java:28-33, JmsXaTest.java:
29-34): standalone programs that verify a JDBC database / JMS broker
keeps *prepared* XA transactions across a client disconnect, because
Jet's exactly-once sinks park a prepared transaction per snapshot and
commit it after the barrier completes. A store that forgets prepared
state on disconnect silently breaks exactly-once.

Spark has no two-phase-commit sink protocol (SURVEY.md §7 risk 1): the
equivalent discipline is idempotent delivery keyed on the micro-batch
epoch. What must therefore be probed is not XA but the two properties
that discipline rests on:

1. **commit-marker durability** — an epoch marker written by a previous
   writer incarnation must still be visible to a new one ("survives
   disconnect", the exact property the XA probes test);
2. **replay idempotence** — re-delivering an epoch already marked
   committed must not change the target's contents.

`probe_exactly_once_target` verifies both against any store exposed
through write/read/marker lambdas, and is exercised in-repo against the
file-backed stores (tests/test_delivery_probe.py) exactly how the
reference runs its probes against H2/ActiveMQ.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any


@dataclass
class ProbeReport:
    marker_survives_reconnect: bool
    replay_is_idempotent: bool

    @property
    def exactly_once_capable(self) -> bool:
        return self.marker_survives_reconnect and self.replay_is_idempotent


def probe_exactly_once_target(
    connect_fn: Callable[[], Any],
    write_epoch_fn: Callable[[Any, int, list[Any]], None],
    read_all_fn: Callable[[Any], list[Any]],
    disconnect_fn: Callable[[Any], None] = lambda client: None,
) -> ProbeReport:
    """Run the two-property probe against a sink target.

    ``write_epoch_fn(client, epoch_id, rows)`` must implement the
    store's idempotent write (skip-or-overwrite when the epoch was
    already delivered); ``read_all_fn`` returns the store's full
    contents. The probe:

    1. writes epoch 0 with client A, disconnects;
    2. reconnects as client B (a new writer incarnation after failure)
       and REPLAYS epoch 0 — Spark's recovery path for the last
       uncommitted micro-batch;
    3. reports whether the replay found the prior delivery (marker
       durability) and whether contents are unchanged (idempotence).
    """
    rows = ["r0", "r1", "r2"]

    a = connect_fn()
    try:
        write_epoch_fn(a, 0, rows)
        after_first = read_all_fn(a)
    finally:
        disconnect_fn(a)

    b = connect_fn()  # new incarnation, as after an executor/driver loss
    try:
        write_epoch_fn(b, 0, rows)  # replay of the same epoch
        after_replay = read_all_fn(b)
    finally:
        disconnect_fn(b)

    return ProbeReport(
        marker_survives_reconnect=sorted(map(str, after_first))
        == sorted(map(str, after_replay)),
        replay_is_idempotent=len(after_replay) == len(rows),
    )

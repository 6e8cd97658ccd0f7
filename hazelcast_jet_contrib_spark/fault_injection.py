"""Deterministic fault schedules for client boundaries — the
Toxiproxy-parity layer (the reference proves MQTT reconnect/redelivery
by scheduling network failure into a containerized broker,
mqtt/src/test/java/.../MosquittoContainer.java:88-92; this module
schedules the same fault shapes into any injected client module
without Docker).

A schedule is a JSON file of faults keyed by (method name, 1-based
call number); call counters are FILE-BACKED and atomic, so the
schedule holds across Spark's Python worker processes — fault #3 on
``insert_many`` fires on the third insert_many across ALL executors,
deterministically, whatever the task placement.

Fault actions (the four failure shapes a TCP proxy can induce):

- ``latency``: sleep ``seconds``, then deliver — a slow link.
- ``error``: raise before delivering — the REQUEST was lost; the
  server never saw the op, a retry is exactly-once safe.
- ``error_after``: deliver, then raise — the RESPONSE was lost; the
  server APPLIED the op but the client must assume it didn't. This is
  the shape that forces redelivery and makes at-least-once visible:
  the retry duplicates, and the test asserts the downstream dedupe
  discipline (deterministic _ids, idempotent upsert, acked-log
  absorb) holds.
- ``timeout``: sleep ``seconds`` then raise TimeoutError without
  delivering — a half-open connection (SYN-acked, then silence).

Wrap a live-or-stub client with :func:`faulty` (driver-side
boundaries: paho publish_fn) or call :func:`apply_fault` inside an
injected stub module (executor-side boundaries: pymongo insert_many)
— both consume the same schedule file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable

_SCHEDULE_FILE = "fault_schedule.json"
_COUNTER_SUFFIX = ".calls"

# Per-process memo of the highest call number this process has claimed
# for each (dir, method): the cross-process tick-file scan restarts
# from here instead of n=1, so N calls cost O(N) syscalls in the steady
# state instead of O(N^2) (ADVICE r12 #2). Correctness is unaffected —
# numbers below the memo are guaranteed already claimed (a tick file
# exists for each), and O_CREAT|O_EXCL still arbitrates races above it.
_LAST_CLAIMED: dict[tuple[str, str], int] = {}


def write_schedule(dir_: str, faults: list[dict]) -> None:
    """Persist a fault schedule. Each fault:
    ``{"method": str, "call": int (1-based, across all processes),
    "action": "latency"|"error"|"error_after"|"timeout",
    "seconds": float (latency/timeout), "message": str (errors)}``."""
    for f in faults:
        if f.get("action") not in ("latency", "error", "error_after", "timeout"):
            raise ValueError(f"unknown fault action: {f.get('action')!r}")
        if not isinstance(f.get("call"), int) or f["call"] < 1:
            raise ValueError("fault 'call' must be a 1-based int")
        if not f.get("method"):
            raise ValueError("fault needs a 'method' name")
    os.makedirs(dir_, exist_ok=True)
    tmp = os.path.join(dir_, "." + _SCHEDULE_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(faults, fh)
    os.replace(tmp, os.path.join(dir_, _SCHEDULE_FILE))


def _next_call(dir_: str, method: str) -> int:
    """Atomic cross-process call counter: one tick file per call,
    claimed with O_CREAT|O_EXCL (the portable mutex primitive), so two
    workers can never observe the same call number. Safe to call before
    write_schedule (an empty schedule dir just means no faults) and
    resumes from this process's last claim instead of rescanning from
    1 (ADVICE r12 #2)."""
    os.makedirs(dir_, exist_ok=True)
    n = _LAST_CLAIMED.get((dir_, method), 0) + 1
    while True:
        path = os.path.join(dir_, f"{method}{_COUNTER_SUFFIX}.{n}")
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            _LAST_CLAIMED[(dir_, method)] = n
            return n
        except FileExistsError:
            n += 1


def _fault_for(dir_: str, method: str, call: int) -> dict | None:
    path = os.path.join(dir_, _SCHEDULE_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        for f in json.load(fh):
            if f["method"] == method and f["call"] == call:
                return f
    return None


def next_fault(dir_: str, method: str) -> dict | None:
    """Claim the next call number for ``method`` and return its
    scheduled fault dict (or None). The building block for callers
    whose fault semantics live MID-OPERATION rather than at the call
    boundary — e.g. a cursor that must deliver half its response
    stream before the connection drops, which :func:`apply_fault`
    (call-granular by design) cannot express."""
    return _fault_for(dir_, method, _next_call(dir_, method))


def apply_fault(dir_: str, method: str, fn: Callable, *args: Any, **kwargs: Any):
    """Run ``fn(*args, **kwargs)`` under the schedule in ``dir_``:
    consume the next call number for ``method`` and apply its fault,
    if any. Usable directly inside injected stub modules — the
    executor-side injection point."""
    call = _next_call(dir_, method)
    f = _fault_for(dir_, method, call)
    if f is None:
        return fn(*args, **kwargs)
    action = f["action"]
    if action == "latency":
        time.sleep(float(f.get("seconds", 0.05)))
        return fn(*args, **kwargs)
    if action == "error":
        raise ConnectionError(
            f.get("message", f"{method} call {call}: request lost (injected)")
        )
    if action == "error_after":
        fn(*args, **kwargs)
        raise ConnectionError(
            f.get("message", f"{method} call {call}: response lost (injected)")
        )
    # timeout: half-open connection
    time.sleep(float(f.get("seconds", 0.05)))
    raise TimeoutError(
        f.get("message", f"{method} call {call}: half-open connection (injected)")
    )


class FaultyClient:
    """Driver-side proxy: delegates everything to ``inner``, routing
    the named methods through :func:`apply_fault`."""

    def __init__(self, inner: Any, dir_: str, methods: set[str] | frozenset[str]):
        self._inner = inner
        self._dir = dir_
        self._methods = frozenset(methods)

    def __getattr__(self, name: str):
        attr = getattr(self._inner, name)
        if name in self._methods and callable(attr):
            def guarded(*args, **kwargs):
                return apply_fault(self._dir, name, attr, *args, **kwargs)

            return guarded
        return attr


def faulty(inner: Any, dir_: str, methods: set[str]) -> FaultyClient:
    return FaultyClient(inner, dir_, methods)


class FaultyClientModule:
    """Wrap a client MODULE whose factory functions produce clients
    (paho's ``Client``, pulsar's ``Client``): factory calls pass
    through, their results come back as :class:`FaultyClient` proxies.
    Non-factory attributes (enums like CallbackAPIVersion, MessageId)
    delegate untouched, so the wrapped module drops anywhere the real
    one goes (e.g. ``paho_publish_fn(mqtt_module=...)``)."""

    def __init__(
        self,
        inner: Any,
        dir_: str,
        methods: set[str],
        factories: tuple[str, ...] = ("Client",),
    ):
        self._inner = inner
        self._dir = dir_
        self._methods = frozenset(methods)
        self._factories = frozenset(factories)

    def __getattr__(self, name: str):
        attr = getattr(self._inner, name)
        if name in self._factories and callable(attr):
            def factory(*args, **kwargs):
                return FaultyClient(attr(*args, **kwargs), self._dir, self._methods)

            return factory
        return attr


__all__ = [
    "FaultyClient",
    "FaultyClientModule",
    "apply_fault",
    "faulty",
    "next_fault",
    "write_schedule",
]

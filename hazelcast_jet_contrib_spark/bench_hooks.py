"""Opt-in sub-timing channel for composite registry queries.

Some registry queries deliberately run a once-per-corpus setup stage
inside the query body (minhash_index_probe BUILDS its index, then
probes it) so the driver row proves the whole lifecycle. For the bench
tripwire that blend is misleading: production amortizes the build
across many probe runs, so drift should be watched on the leg users
pay repeatedly. Queries record named legs here; bench.py copies the
dict into BENCH_TIMINGS.json ("subtimings") and runs its 1.5x drift
check on each recorded leg against the previous sweep's value.

Zero overhead when bench isn't running: recording is a dict write.
"""

from __future__ import annotations

SUBTIMINGS: dict[str, dict[str, float]] = {}


def record_leg(query: str, leg: str, sec: float) -> None:
    """Record elapsed seconds for ``query``'s ``leg``, keeping the MIN
    across samples in this process — bench.py retimes noisy queries
    and reports min(in_sweep, isolated), so the leg must follow the
    same policy or a noisy retime would inflate the leg baseline."""
    q = SUBTIMINGS.setdefault(query, {})
    q[leg] = min(q.get(leg, sec), round(sec, 3))

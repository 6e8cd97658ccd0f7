"""Driver-contract self-checks (VERDICT r05 items 3, 5, 7): the
external driver's measured interfaces, asserted in pytest so a
contract breach fails BEFORE a snapshot ships instead of surfacing as
a `parsed: null` BENCH record or an unpinned plan-audit row one round
later.

Measured driver facts these tests encode:
- the driver records exactly the LAST 2000 characters of bench.py's
  stdout (constant across BENCH_r01-r05), so the single JSON line must
  fit with room to spare;
- the correctness gate checks the FIRST 50 registry entries in dict
  order (CORRECTNESS_r01-r05), so rotation decides what gets proven;
- the registry-size policy (registry.py) promises max 2-round proof
  staleness instead of shrinking below the window.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from hazelcast_jet_contrib_spark import registry

    return registry


def test_bench_driver_line_fits_tail_window():
    """Build the bench output dict exactly as bench.py does, with the
    WORST-CASE payload the current registry could produce (the 8
    longest query names as the slowest-8, five-digit timings), and
    assert the serialized line fits the driver's measured 2000-char
    tail window with margin. A timings-dict regression (e.g. someone
    putting the full 98-entry dict back on the line) fails here, not
    in the next round's BENCH record."""
    registry = _registry()
    longest = sorted(registry.QUERIES, key=len, reverse=True)[:8]
    out = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "sf": 0.1,
        "n_queries": len(registry.QUERIES),
        "n_failed": len(registry.QUERIES),
        "retimed_n": len(registry.QUERIES),
        "side_artifacts": "BENCH_TIMINGS.json,BENCH_SHUFFLE.json",
        "queries": {n: 99999.999 for n in longest},
    }
    line = json.dumps(out)
    assert len(line) < 1500, (
        f"bench driver line would be {len(line)} chars; the driver tail "
        "window is 2000 and needs headroom for stderr bleed"
    )


def test_bench_emits_slowest_subset_not_full_dict():
    """The full timings dict (~3.3 KB at 98 queries) must live in the
    side artifact, never on the driver line — source-level guard on
    bench.py so the contract can't silently regress."""
    src = open(os.path.join(REPO, "bench.py")).read()
    assert '"queries": slowest' in src, "bench.py line must carry the slowest-N subset"
    assert "BENCH_TIMINGS.json" in src, "full timings must go to BENCH_TIMINGS.json"
    assert re.search(r"assert len\(line\) < 1500", src), (
        "bench.py must self-check its line length"
    )


def test_rotation_staleness_at_most_one_round():
    """THE registry-size-policy invariant (registry.py): every query is
    either inside this round's checked-50 window (first 50 in registry
    order) or has a green row in the LATEST CORRECTNESS file — so no
    query's driver proof is ever more than 2 rounds old. Fails when a
    rotation forgets a query or a new query lands outside the window
    with no prior proof."""
    registry = _registry()
    window = set(list(registry.QUERIES)[:50])
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:  # first round: nothing can be stale yet
        return
    latest = json.load(open(files[-1]))
    green = {
        name
        for name, row in latest.items()
        if row.get("err") is None and row.get("rows_match")
    }
    uncovered = set(registry.QUERIES) - window - green
    assert not uncovered, (
        f"queries neither in this round's checked-50 window nor green in "
        f"{os.path.basename(files[-1])} (staleness would exceed 2 rounds): "
        f"{sorted(uncovered)}"
    )


def test_changed_queries_lead_the_window():
    """Priority list sanity: _PRIORITY plus the head of _DEMOTED IS the
    checked window; assert the dict ordering actually delivers it (the
    _reorder() contract the driver depends on)."""
    registry = _registry()
    expect = [n for n in registry._PRIORITY if n in registry.QUERIES]
    assert list(registry.QUERIES)[: len(expect)] == expect


def test_plans_md_covers_every_registry_query():
    """VERDICT r05 item 7: PLANS.md must have exactly one row per
    registry query — a new query without a regenerated PLANS.md fails
    here instead of shipping a stale audit table."""
    registry = _registry()
    text = open(os.path.join(REPO, "PLANS.md")).read()
    rows = {
        m.group(1)
        for m in re.finditer(r"^\| (\w+) \|", text, re.M)
        if m.group(1) != "query"
    }
    missing = set(registry.QUERIES) - rows
    extra = rows - set(registry.QUERIES)
    assert not missing, f"PLANS.md missing rows for: {sorted(missing)}"
    assert not extra, f"PLANS.md has rows for unknown queries: {sorted(extra)}"

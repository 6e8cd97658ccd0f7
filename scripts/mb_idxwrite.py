"""Microbench: index EPOCH WRITE shapes only (build leg), sf0.1,
interleaved. Isolates where the unified-layout write loses vs the
single-relation baseline.

  w_single  : 32 fixed-size band structs + hs carried flat (x32 on disk)
  w_instruct: 33 structs, hs INSIDE the sets struct (array field in the
              struct array)
  w_carry   : 33 fixed-size (band, bh) structs, hs carried flat through
              the explode, nulled for band rows in the same stage
              (when(band < 0, hs)) — hs crosses the exchange x1
  w_narrow  : 32 fixed-size structs, no hs anywhere (floor)

Run: python scripts/mb_idxwrite.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF_DIR = "/root/testdata/sf0.1"
NUM_HASHES, BANDS = 64, 32


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _shingle_sets,
        band_keys,
        minhash_signatures,
    )

    spark = get_spark(app_name="mb_idxwrite")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    rows_per_band = NUM_HASHES // BANDS

    def sig():
        return minhash_signatures(
            _shingle_sets(docs, "doc_id", "text", 3), NUM_HASHES
        )

    def band_structs(with_sets_bh_null: bool):
        cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bh"),
            )
            for b in range(BANDS)
        ]
        if with_sets_bh_null:
            cols.append(
                F.struct(
                    (-1 - F.pmod(F.xxhash64("id"), F.lit(BANDS)))
                    .cast("int")
                    .alias("band"),
                    F.lit(None).cast("bigint").alias("bh"),
                )
            )
        return cols

    def w_single():
        return band_keys(sig(), NUM_HASHES, BANDS, carry=("hs",)), ("bh",)

    def w_instruct():
        s = sig()
        # 33 structs, hs inside the sets struct
        cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bh"),
                F.lit(None).cast("array<bigint>").alias("hs"),
            )
            for b in range(BANDS)
        ] + [
            F.struct(
                (-1 - F.pmod(F.xxhash64("id"), F.lit(BANDS))).cast("int").alias("band"),
                F.lit(None).cast("bigint").alias("bh"),
                F.col("hs").alias("hs"),
            )
        ]
        rel = s.select("id", F.explode(F.array(*cols)).alias("bb")).select(
            "id", "bb.band", "bb.bh", "bb.hs"
        )
        return rel, ("band", "bh", "id")

    def w_carry():
        s = sig()
        rel = (
            s.select("id", F.explode(F.array(*band_structs(True))).alias("bb"), "hs")
            .select(
                "id",
                F.col("bb.band").alias("band"),
                F.col("bb.bh").alias("bh"),
                F.when(F.col("bb.band") < 0, F.col("hs")).alias("hs"),
            )
        )
        return rel, ("band", "bh", "id")

    def w_narrow():
        return band_keys(sig(), NUM_HASHES, BANDS), ("band", "bh")

    def w_singleB():
        # single-relation rows, band-leading sort (preserves bh order
        # through the dynamic-partition writer)
        return band_keys(sig(), NUM_HASHES, BANDS, carry=("hs",)), ("band", "bh")

    def w_carry4():
        # carry shape with 4 sets shards instead of 32 (fewer output files)
        s = sig()
        cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bh"),
            )
            for b in range(BANDS)
        ] + [
            F.struct(
                (-1 - F.pmod(F.xxhash64("id"), F.lit(4))).cast("int").alias("band"),
                F.lit(None).cast("bigint").alias("bh"),
            )
        ]
        rel = (
            s.select("id", F.explode(F.array(*cols)).alias("bb"), "hs")
            .select(
                "id",
                F.col("bb.band").alias("band"),
                F.col("bb.bh").alias("bh"),
                F.when(F.col("bb.band") < 0, F.col("hs")).alias("hs"),
            )
        )
        return rel, ("band", "bh", "id")

    def w_carryS():
        # carry shape, ONE band=-1 dir, sets rows salted over a 4096
        # shard space on the exchange key only (__shard__ dropped
        # before write; AQE coalesces the tiny buckets locally and
        # spreads the corpus-sized sets volume at scale)
        s = sig()
        cols = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bh"),
            )
            for b in range(BANDS)
        ] + [
            F.struct(
                F.lit(-1).cast("int").alias("band"),
                F.lit(None).cast("bigint").alias("bh"),
            )
        ]
        rel = (
            s.select("id", F.explode(F.array(*cols)).alias("bb"), "hs")
            .select(
                "id",
                F.col("bb.band").alias("band"),
                F.col("bb.bh").alias("bh"),
                F.when(F.col("bb.band") < 0, F.col("hs")).alias("hs"),
            )
            .withColumn(
                "__shard__",
                F.when(
                    F.col("band") < 0, F.pmod(F.xxhash64("id"), F.lit(4096))
                ).otherwise(F.lit(0)),
            )
        )
        return rel, ("band", "bh", "id")

    variants = {
        "w_single": w_single,
        "w_singleB": w_singleB,
        "w_instruct": w_instruct,
        "w_carry": w_carry,
        "w_carry4": w_carry4,
        "w_carryS": w_carryS,
        "w_narrow": w_narrow,
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            path = tempfile.mkdtemp(prefix=f"mb_iw_{name}_")
            try:
                rel, sort_cols = fn()
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"mb_iw:{name}:{rep}")
                t0 = time.perf_counter()
                part_cols = (
                    ["band", "__shard__"] if "__shard__" in rel.columns else ["band"]
                )
                (
                    rel.repartition(*part_cols)
                    .sortWithinPartitions(*sort_cols)
                    .drop("__shard__")
                    .write.mode("overwrite")
                    .partitionBy("band")
                    .parquet(path)
                )
                results[name].append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(path, ignore_errors=True)
    for name, ts in results.items():
        print(f"{name:10s} min={min(ts):.3f}s all={json.dumps([round(t,3) for t in ts])}")
    spark.stop()


if __name__ == "__main__":
    main()

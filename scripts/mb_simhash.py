"""Microbench: simhash128 vote-aggregate shapes A/B in ONE session at
sf0.1 over the simhash128_near_dup corpus (even doc_ids + copies).

  v_when   : 128 x sum(when(bit==1, 1).otherwise(-1))   -- production
  v_bitsum : 128 x sum((h >> b) & 1) + one count, sign test
             2*ones >= n  (same sign for every possible input: votes
             = 2*ones - n, and votes >= 0 <=> 2*ones >= n)
  v_floor  : count only (explode + aggregate machinery floor)

Run: python scripts/mb_simhash.py [reps]
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

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import _spread

    spark = get_spark(app_name="mb_simhash")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") % 2 == 0)
    aug = docs.unionByName(
        docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )
    toks = _spread(
        aug.select(F.col("doc_id").alias("id"), F.col("text").alias("__text__"))
    ).select(
        "id",
        F.explode(
            F.array_distinct(F.split(F.lower(F.trim(F.col("__text__"))), r"\s+"))
        ).alias("tok"),
    ).select(
        "id", F.xxhash64("tok").alias("h0"), F.xxhash64("tok", F.lit(1)).alias("h1")
    )

    def sig_from_votes(votes, test):
        sigs = []
        for w in (0, 1):
            sig = F.lit(0).cast("long")
            for b in range(64):
                sig = sig.bitwiseOR(
                    F.when(
                        test(w, b), F.shiftleft(F.lit(1).cast("long"), b)
                    ).otherwise(F.lit(0).cast("long"))
                )
            sigs.append(sig.alias(f"sig{w}"))
        return votes.select("id", *sigs)

    def v_when():
        votes = toks.groupBy("id").agg(
            *[
                F.sum(
                    F.when(
                        F.shiftright(F.col(f"h{w}"), b).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                ).alias(f"v{w}_{b}")
                for w in (0, 1)
                for b in range(64)
            ]
        )
        return sig_from_votes(votes, lambda w, b: F.col(f"v{w}_{b}") >= 0)

    def v_bitsum():
        votes = toks.groupBy("id").agg(
            *[
                F.sum(
                    F.shiftrightunsigned(F.col(f"h{w}"), b).bitwiseAND(F.lit(1))
                ).alias(f"o{w}_{b}")
                for w in (0, 1)
                for b in range(64)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        return sig_from_votes(
            votes, lambda w, b: F.col(f"o{w}_{b}") * 2 >= F.col("n")
        )

    def v_floor():
        return toks.groupBy("id").agg(F.count(F.lit(1)).alias("n"))

    LANE_MASK = 0x0000000100000001  # two 32-bit lanes per long

    def v_lane32():
        # sum((h >> p) & 0x0000000100000001): lane low = count of bit p,
        # lane high = count of bit p+32. Safe: a lane overflows only at
        # 2^32 distinct tokens in ONE doc (impossible under the 2 GiB
        # string cap). 64 aggregate columns instead of 128.
        votes = toks.groupBy("id").agg(
            *[
                F.sum(
                    F.shiftrightunsigned(F.col(f"h{w}"), p).bitwiseAND(
                        F.lit(LANE_MASK)
                    )
                ).alias(f"l{w}_{p}")
                for w in (0, 1)
                for p in range(32)
            ],
            F.count(F.lit(1)).alias("n"),
        )

        def ones(w, b):
            lane = F.col(f"l{w}_{b % 32}")
            return (
                F.shiftrightunsigned(lane, 32)
                if b >= 32
                else lane.bitwiseAND(F.lit(0xFFFFFFFF))
            )

        return sig_from_votes(votes, lambda w, b: ones(w, b) * 2 >= F.col("n"))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def sig_pair(hs0: pd.Series, hs1: pd.Series) -> pd.Series:
        shifts = np.arange(64, dtype=np.uint64)
        out = []
        for series in (hs0, hs1):
            lens = series.map(len).to_numpy()
            if lens.sum() == 0:
                out.append(np.zeros((len(series),), dtype=np.int64))
                continue
            flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in series]).astype(
                np.uint64
            )
            offsets = np.zeros(len(series), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            ones = np.empty((len(series), 64), dtype=np.int64)
            for b in range(64):
                bit = ((flat >> np.uint64(b)) & np.uint64(1)).astype(np.int64)
                ones[:, b] = np.add.reduceat(bit, offsets)
            maj = (2 * ones) >= lens[:, None]
            sig = (maj.astype(np.uint64) << shifts[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out.append(sig.astype(np.int64))
        return pd.Series(list(np.stack(out, axis=1)))

    def v_arrow():
        lists = toks.groupBy("id").agg(
            F.collect_list("h0").alias("a0"), F.collect_list("h1").alias("a1")
        )
        return lists.select(
            "id", sig_pair("a0", "a1").alias("sp")
        ).select(
            "id",
            F.element_at("sp", 1).alias("sig0"),
            F.element_at("sp", 2).alias("sig1"),
        )

    variants = {
        "v_when": v_when,
        "v_bitsum": v_bitsum,
        "v_lane32": v_lane32,
        "v_arrow": v_arrow,
        "v_floor": v_floor,
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for name, fn in variants.items():  # codegen warm
        fn().limit(1).write.format("noop").mode("overwrite").save()
    for rep in range(REPS):
        for name, fn in variants.items():
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"mb_simhash:{name}:{rep}")
            fn().write.format("noop").mode("overwrite").save()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name:9s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

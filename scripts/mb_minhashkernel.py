"""Interleaved A/B for the r17 minhash-signature Arrow kernel: the
64-column JVM ``min(xxhash64(h0, i))`` aggregate vs ONE
``collect_set(h0)`` aggregate + a vectorized numpy kernel that derives
the seeded hash family bit-exactly (Spark XXH64 hashLong/hashInt chain,
proven equal in tests) and takes the per-doc mins with
``np.minimum.reduceat``. The collect_set already exists in the
aggregate (it is the verification set ``hs``), so the kernel variant
REMOVES 64 aggregate columns and their map-side partial state without
adding any new grouped state.

RESULT (sf0.1, 3 interleaved noop-sink reps, 2026-08-17, signatures
asserted bit-identical first): jvm min=3.520 med=3.674 vs kernel
min=3.487 med=3.598 — a WASH. The collect_set(h0) verification-set
aggregate (which both variants pay, and whose bytes dominate the
shuffle) is the real cost; the 64 min columns ride its partial-agg
machinery almost for free, and the kernel's Arrow crossing of the hs
payload offsets the removed JVM hash work. Decision: REJECTED — the
JVM aggregate stays (guide §1.1: the first-principles win wasn't on
the table once the shared collect_set is accounted). The kernel lives
here (not in the engine) as the measured record.

Usage: python scripts/mb_minhashkernel.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NUM_HASHES = 64


def _minhash_family_kernel_local(num_hashes: int):
    """Vectorized MinHash family + min-reduction: one Arrow batch of
    per-doc shingle-hash sets (``hs`` — the verification set the
    aggregate already collects) in, per-doc ``num_hashes`` signature
    longs out. Reproduces Spark's ``min(xxhash64(h0, lit(i)))``
    BIT-EXACTLY: Spark's two-column xxhash64 chains
    ``hashInt(i, hashLong(h0, 42))`` (XXH64 specializations for 8-/4-
    byte inputs — public algorithm, same constants), so the kernel
    computes t = hashLong(h0, 42) once per shingle, derives each family
    member as hashInt(i, t) (~7 vectorized uint64 ops), and takes
    per-doc SIGNED mins with ``np.minimum.reduceat`` — exactly the
    ordering ``F.min`` uses on longs (bit-equality asserted by main()
    before timing).

    Hypothesis (guide §4.2, the _simhash_vote_kernel precedent):
    scripts/mb_minhash.py measured the aggregate machinery at ~0.8 s of
    the 2.2 s stage, so removing the 64 min columns should win. It did
    NOT — see the module docstring's RESULT."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    P1 = np.uint64(0x9E3779B185EBCA87)
    P2 = np.uint64(0xC2B2AE3D27D4EB4F)
    P3 = np.uint64(0x165667B19E3779F9)
    P4 = np.uint64(0x85EBCA77C2B2AE63)
    P5 = np.uint64(0x27D4EB2F165667C5)

    def _rotl(x: "np.ndarray", r: int) -> "np.ndarray":
        rr = np.uint64(r)
        return (x << rr) | (x >> (np.uint64(64) - rr))

    def _fmix(h: "np.ndarray") -> "np.ndarray":
        h = h ^ (h >> np.uint64(33))
        h = h * P2
        h = h ^ (h >> np.uint64(29))
        h = h * P3
        h = h ^ (h >> np.uint64(32))
        return h

    def _mins(series: "pd.Series") -> "pd.Series":
        n_docs = len(series)
        if n_docs == 0:
            return pd.Series([], dtype=object)
        lens = series.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            # explode never emits empty sets today, but the kernel must
            # not depend on that (the _simhash_vote_kernel contract)
            return pd.Series([[np.iinfo(np.int64).max] * num_hashes] * n_docs)
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in series]
        ).view(np.uint64)
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        # t = hashLong(h0, seed=42), shared across the whole family
        t = np.uint64(42) + P5 + np.uint64(8)
        t = _fmix(_rotl(t ^ (_rotl(flat * P2, 31) * P1), 27) * P1 + P4)
        base = t + P5 + np.uint64(4)  # hashInt's seed fold, i-independent
        out = np.empty((n_docs, num_hashes), dtype=np.int64)
        empty = lens == 0
        for i in range(num_hashes):
            hi = _fmix(
                _rotl(base ^ (np.uint64(i) * P1), 23) * P2 + P3
            ).view(np.int64)
            out[:, i] = np.minimum.reduceat(hi, offsets)
        # empty docs read the next doc's segment under reduceat
        out[empty, :] = np.iinfo(np.int64).max
        return pd.Series(list(out))

    return pandas_udf(_mins, "array<long>")



def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import _shingle_sets
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="mb_minhashkernel")

    def corpus():
        docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
        orig = F.struct(F.col("doc_id").alias("doc_id"), F.col("text").alias("text"))
        copy = F.struct(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat("text", F.lit(" zz yy xx")).alias("text"),
        )
        return docs.select(F.explode(F.array(orig, copy)).alias("__v__")).select(
            F.col("__v__.doc_id").alias("doc_id"), F.col("__v__.text").alias("text")
        )

    def exploded():
        sh = _shingle_sets(corpus(), "doc_id", "text", 3)
        return sh.select("id", F.explode("sh").alias("s")).select(
            "id", F.xxhash64("s").alias("h0")
        )

    def sig_jvm():
        return exploded().groupBy("id").agg(
            *[
                F.min(F.xxhash64("h0", F.lit(i))).alias(f"h{i}")
                for i in range(NUM_HASHES)
            ],
            F.collect_set("h0").alias("hs"),
        )

    def sig_kernel():
        kernel = _minhash_family_kernel_local(NUM_HASHES)
        lists = exploded().groupBy("id").agg(F.collect_set("h0").alias("hs"))
        return lists.select(
            "id", kernel("hs").alias("__mh__"), "hs"
        ).select(
            "id",
            *[F.element_at("__mh__", i + 1).alias(f"h{i}") for i in range(NUM_HASHES)],
            "hs",
        )

    variants = {"jvm": sig_jvm, "kernel": sig_kernel}

    # value equivalence first: signatures must be bit-identical
    a = {r["id"]: tuple(r[f"h{i}"] for i in range(NUM_HASHES)) for r in sig_jvm().collect()}
    b = {r["id"]: tuple(r[f"h{i}"] for i in range(NUM_HASHES)) for r in sig_kernel().collect()}
    assert a == b, "signature values differ between variants"
    print(f"signatures bit-identical across variants: {len(a)} docs")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run(variants[k]))
    for k, ts in results.items():
        ts = sorted(ts)
        print(
            f"{k:8s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Stage-decomposed profile of the fused MinHash signature pipeline
(VERDICT r17 item 6): where does `minhash_signatures` spend its time
now that the explode/aggregate/exchange are gone?

The r17 fused shape is scan → tokens (JVM regex split) →
shingles_of_tokens (JVM HOF zip/concat_ws) → filter →
array_distinct(transform(sh, xxhash64)) → Arrow family kernel. The
remaining candidate win is fusing tokenize+shingle+hash into the Arrow
kernel with a vectorized XXH64 over UTF-8 — worth building ONLY if the
JVM text stages dominate. Each variant below adds one pipeline stage;
noop-sink wall deltas attribute the cost (same session, interleaved
rep order, min-of-REPS).

Usage: python scripts/mb_sigprofile.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5
NUM_HASHES = 64


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.functions.text import shingles_of_tokens, tokens
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _minhash_family_kernel,
        _shingle_sets,
        minhash_signatures,
    )
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="mb_sigprofile")

    def corpus():
        # the _docs_with_copies shape the registered LSH queries use
        docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
        orig = F.struct(F.col("doc_id").alias("doc_id"), F.col("text").alias("text"))
        copy = F.struct(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat("text", F.lit(" zz yy xx")).alias("text"),
        )
        return docs.select(F.explode(F.array(orig, copy)).alias("__v__")).select(
            F.col("__v__.doc_id").alias("doc_id"), F.col("__v__.text").alias("text")
        )

    def spread_base():
        # same projection + spread _shingle_sets applies, minus the text ops
        from hazelcast_jet_contrib_spark.operators.dedup import _spread

        return _spread(
            corpus().select(F.col("doc_id").alias("id"), F.col("text").alias("__text__"))
        )

    kernel = _minhash_family_kernel(NUM_HASHES)

    variants = {
        # cumulative pipeline prefixes; wall deltas = per-stage cost
        "1_scan+spread": lambda: spread_base(),
        "2_+tokens": lambda: spread_base().select("id", tokens("__text__").alias("t")),
        "3_+shingles": lambda: spread_base()
        .select("id", tokens("__text__").alias("__toks__"))
        .select("id", shingles_of_tokens("__toks__", 3).alias("sh"))
        .filter(F.size("sh") > 0),
        "4_+hash_distinct": lambda: _shingle_sets(corpus(), "doc_id", "text", 3).select(
            "id",
            F.array_distinct(F.transform("sh", lambda s: F.xxhash64(s))).alias("hs"),
        ),
        "5_full_sig": lambda: minhash_signatures(
            _shingle_sets(corpus(), "doc_id", "text", 3), NUM_HASHES
        ),
        # kernel-only marginal check: hs in, signature out, hs NOT re-emitted
        "6_kernel_only_out": lambda: _shingle_sets(corpus(), "doc_id", "text", 3)
        .select(
            "id",
            F.array_distinct(F.transform("sh", lambda s: F.xxhash64(s))).alias("hs"),
        )
        .select("id", kernel("hs").alias("__mh__")),
    }

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run(variants[k]))
    mins = {}
    for k, ts in results.items():
        ts = sorted(ts)
        mins[k] = ts[0]
        print(
            f"{k:20s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    ordered = ["1_scan+spread", "2_+tokens", "3_+shingles", "4_+hash_distinct", "5_full_sig"]
    print("\nstage deltas (min-based):")
    for a, b in zip(ordered, ordered[1:]):
        print(f"  {b:20s} +{mins[b] - mins[a]:.3f} s")
    spark.stop()


if __name__ == "__main__":
    main()

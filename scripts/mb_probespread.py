"""Interleaved A/B for the r17 probe-side fixes (§18): (a) skip
``_spread`` on probe/eval-set shingling — spreading ~10² rows over 32
partitions adds an exchange + a cluster-wide stage for zero CPU win —
and (b) tracked_persist decontamination's probe aggregate, which feeds
banding AND verification unpersisted, so each evaluation re-ran the
full source scan + filter that extracts the probes.

Granular probe-side evidence (measured first, 3 reps steady-state,
same session): the probe band-rows collect of probe_minhash_index
drops 2.1 → 1.2 s at sf0.1 with spread=False (the exchange + 32-task
stage is the whole delta; the shingle/kernel work on ~100 docs is
milliseconds either way).

This script A/Bs the full registered decontamination query: OLD =
the pre-§18 minhash_decontaminate body inlined (spread=True probe
side, unpersisted agg_p), NEW = the shipped operator. Row sets
asserted identical first.

Usage: python scripts/mb_probespread.py [sf_dir] [reps]
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
    from hazelcast_jet_contrib_spark.cache import release_tracked, tracked_persist
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _shingle_sets,
        band_keys,
        minhash_decontaminate,
        minhash_signatures,
    )
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="mb_probespread")

    def corpus():
        return table(spark, SF_DIR, "documents").select("doc_id", "text")

    def probes():
        return corpus().filter(F.col("doc_id") % 97 == 0).select(
            (F.col("doc_id") + 5000000).alias("doc_id"),
            F.concat("text", F.lit(" zz yy")).alias("text"),
        )

    def old_decon():
        """Pre-§18 body: probe side spread=True, agg_p unpersisted."""
        num_hashes, bands, threshold = 64, 32, 0.6
        base_c = _shingle_sets(corpus(), "doc_id", "text", 3)
        base_p = _shingle_sets(probes(), "doc_id", "text", 3, spread=True)
        agg_c = tracked_persist(minhash_signatures(base_c, num_hashes))
        agg_p = minhash_signatures(base_p, num_hashes)
        bands_c = band_keys(agg_c, num_hashes, bands)
        bands_p = band_keys(agg_p, num_hashes, bands).withColumnRenamed(
            "id", "probe_id"
        )
        candidates = (
            bands_c.join(F.broadcast(bands_p), ["band", "bh"])
            .select("id", "probe_id")
            .dropDuplicates(["id", "probe_id"])
        )
        sh_c = agg_c.select("id", F.col("hs").alias("hs_c"))
        sh_p = agg_p.select(F.col("id").alias("probe_id"), F.col("hs").alias("hs_p"))
        inter = F.size(F.array_intersect("hs_c", "hs_p")).cast("double")
        union = (
            F.size("hs_c") + F.size("hs_p") - F.size(F.array_intersect("hs_c", "hs_p"))
        )
        return (
            candidates.join(sh_c, "id")
            .join(F.broadcast(sh_p), "probe_id")
            .filter((inter / union) >= threshold)
            .withColumn("jaccard", F.round(inter / union, 6))
            .select("id", "probe_id", "jaccard")
        )

    def new_decon():
        return minhash_decontaminate(
            corpus(), probes(), "doc_id", "text",
            threshold=0.6, num_hashes=64, bands=32,
        )

    o = {(r["id"], r["probe_id"], r["jaccard"]) for r in old_decon().collect()}
    release_tracked()
    n = {(r["id"], r["probe_id"], r["jaccard"]) for r in new_decon().collect()}
    release_tracked()
    assert o == n, "decontamination row sets differ"
    print(f"row sets identical: {len(o)} flagged pairs")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().collect()
        release_tracked()
        spark.catalog.clearCache()
        return time.perf_counter() - t0

    variants = {"decon/old": old_decon, "decon/new": new_decon}
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run(variants[k]))
    for k, ts in results.items():
        ts = sorted(ts)
        print(
            f"{k:10s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B for the r17 FUSED row-local MinHash signature shape.

The shipped ``minhash_signatures`` is explode(sh) → xxhash64(s) →
groupBy(id).agg(64 × min(xxhash64(h0, i)) + collect_set(h0)) — i.e. it
pays an explode row-blowup, the 64-column aggregate machinery, AND one
full exchange of the hashed-shingle data, purely to compute a per-doc
function of a per-doc array. Because explode emits a doc's shingles
inside the doc's own partition, the partial-agg state that crosses that
exchange is exactly the finished per-id row (64 longs + the distinct
hash set) — the shuffle buys no reduction at all.

The fused variant computes the same row WITHOUT leaving the row:
``hs = array_distinct(transform(sh, s -> xxhash64(s)))`` (one
interpreted-HOF pass over the shingle array — same number of string
hashes as the exploded shape) and derives the 64 seeded mins with the
bit-exact vectorized family kernel proven in scripts/mb_minhashkernel.py
(Spark's two-column xxhash64 = hashInt(i, hashLong(h0, 42)); signed
mins via np.minimum.reduceat). Zero explode, zero aggregate, zero
exchange.

Distinctness note: the shipped shape dedupes shingle STRINGS
(array_distinct in shingles_of_tokens) and then collapses equal hashes
again in collect_set; the fused shape dedupes the hashed longs — the
two differ only if two distinct shingles of one doc collide in xxhash64
(~2^-64 per pair). The equality gate below asserts set identity over
the full corpus, so the A/B is value-gated, not probability-gated.

Variants:
  jvm_agg      shipped explode + groupBy aggregate
  fused        row-local transform + Arrow family kernel (no exchange)
  fused_id     fused + repartition("id") — the downstream-clustering
               variant for consumers whose verify joins used the
               groupBy's free id-clustering (minhash_lsh_pairs)

plus end-to-end legs: full minhash_lsh_pairs (64/32, the
minhash_lsh_near_dup configuration) and the index_rows build relation
(128/16, the minhash_index_lifecycle configuration) under the shipped
vs fused sig builder.

Usage: python scripts/mb_sigfused.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402  (module-level: pandas_udf type-hint resolution)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
NUM_HASHES = 64


def _minhash_family_kernel_local(num_hashes: int):
    """Bit-exact vectorized MinHash family + per-doc min over an
    array<long> column of per-doc shingle hashes (hs) — the proven
    kernel from scripts/mb_minhashkernel.py, reused verbatim."""
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
            return pd.Series([[np.iinfo(np.int64).max] * num_hashes] * n_docs)
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in series]
        ).view(np.uint64)
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        t = np.uint64(42) + P5 + np.uint64(8)
        t = _fmix(_rotl(t ^ (_rotl(flat * P2, 31) * P1), 27) * P1 + P4)
        base = t + P5 + np.uint64(4)
        out = np.empty((n_docs, num_hashes), dtype=np.int64)
        empty = lens == 0
        for i in range(num_hashes):
            hi = _fmix(
                _rotl(base ^ (np.uint64(i) * P1), 23) * P2 + P3
            ).view(np.int64)
            out[:, i] = np.minimum.reduceat(hi, offsets)
        out[empty, :] = np.iinfo(np.int64).max
        return pd.Series(list(out))

    return pandas_udf(_mins, "array<long>")


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked, tracked_persist
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _cap_buckets,
        _shingle_sets,
        band_keys,
    )
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="mb_sigfused")

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

    def base():
        return _shingle_sets(corpus(), "doc_id", "text", 3)

    def sig_jvm(num_hashes: int = NUM_HASHES):
        # the PRE-r17 shipped formulation, inlined (the engine's
        # minhash_signatures IS the fused shape now): explode → hash →
        # groupBy(id) wide min-aggregate + collect_set
        exploded = base().select("id", F.explode("sh").alias("s")).select(
            "id", F.xxhash64("s").alias("h0")
        )
        return exploded.groupBy("id").agg(
            *[
                F.min(F.xxhash64("h0", F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ],
            F.collect_set("h0").alias("hs"),
        )

    def sig_fused(num_hashes: int = NUM_HASHES):
        # the SHIPPED r17 fused shape (operators/dedup.minhash_signatures);
        # _minhash_family_kernel_local above is the self-contained record
        # of the kernel as A/B'd
        from hazelcast_jet_contrib_spark.operators.dedup import minhash_signatures

        return minhash_signatures(base(), num_hashes)

    def sig_fused_id(num_hashes: int = NUM_HASHES):
        return sig_fused(num_hashes).repartition("id")

    # ---- value gate: signatures AND verification sets identical -------
    def snap(df):
        return {
            r["id"]: (
                tuple(r[f"h{i}"] for i in range(NUM_HASHES)),
                frozenset(r["hs"]),
                len(r["hs"]),
            )
            for r in df.collect()
        }

    a, b = snap(sig_jvm()), snap(sig_fused())
    assert set(a) == set(b), "id sets differ"
    for k in a:
        assert a[k][0] == b[k][0], f"signature differs for id {k}"
        assert a[k][1] == b[k][1], f"hs set differs for id {k}"
        assert len(a[k][1]) == a[k][2] == b[k][2], f"hs duplicates for id {k}"
    print(f"signatures + hs sets identical across variants: {len(a)} docs")

    # ---- end-to-end legs ----------------------------------------------
    def lsh_pairs_with(sig_builder, cluster_id: bool):
        """minhash_lsh_pairs body (64/32 — the minhash_lsh_near_dup
        config) parameterized on the signature builder."""
        num_hashes, bands = 64, 32
        agg = sig_builder(num_hashes)
        if cluster_id:
            agg = agg.repartition("id")
        agg = tracked_persist(agg)
        banded = tracked_persist(
            band_keys(agg, num_hashes, bands).repartition("band", "bh")
        )
        banded = _cap_buckets(banded, ["band", "bh"], None)
        aa, bb = banded.alias("a"), banded.alias("b")
        candidates = (
            aa.join(
                bb,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        sh_a = agg.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a"))
        sh_b = agg.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b"))
        inter = F.size(F.array_intersect("hs_a", "hs_b")).cast("double")
        union = (
            F.size("hs_a") + F.size("hs_b") - F.size(F.array_intersect("hs_a", "hs_b"))
        )
        return (
            candidates.join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .filter(inter / union >= 0.6)
            .select("id_a", "id_b")
        )

    def index_rows_with(sig_builder):
        """index_rows body (128/16 — the minhash_index_lifecycle build
        config) parameterized on the signature builder, through the
        band repartition the real build pays."""
        sig = sig_builder(128)
        return (
            band_keys(sig, 128, 16, carry=("hs",))
            .repartition("band")
            .sortWithinPartitions("bh")
        )

    # pair-set equality for the end-to-end legs
    p_jvm = {(r["id_a"], r["id_b"]) for r in lsh_pairs_with(sig_jvm, False).collect()}
    release_tracked()
    p_fus = {(r["id_a"], r["id_b"]) for r in lsh_pairs_with(sig_fused, False).collect()}
    release_tracked()
    assert p_jvm == p_fus, "lsh pair sets differ"
    print(f"lsh pair sets identical: {len(p_jvm)} pairs")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        release_tracked()
        return time.perf_counter() - t0

    variants = {
        "sig/jvm_agg": lambda: sig_jvm(),
        "sig/fused": lambda: sig_fused(),
        "sig/fused_id": lambda: sig_fused_id(),
        "lsh/jvm_agg": lambda: lsh_pairs_with(sig_jvm, False),
        "lsh/fused": lambda: lsh_pairs_with(sig_fused, False),
        "lsh/fused_id": lambda: lsh_pairs_with(sig_fused, True),
        "idx/jvm_agg": lambda: index_rows_with(sig_jvm),
        "idx/fused": lambda: index_rows_with(sig_fused),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run(variants[k]))
    for k, ts in results.items():
        ts = sorted(ts)
        print(
            f"{k:14s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

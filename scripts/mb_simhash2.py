"""Interleaved A/B for the r17 ROW-LOCAL SimHash signature shape
(§16's fused-signature pattern applied to simhash, completing §5).

§5 replaced the 128-column JVM vote aggregate with the vectorized
Arrow kernel but kept its input as explode(tokens) →
groupBy(id).agg(collect_list(h)) — an explode row-blowup plus one full
exchange of the token hashes that buys zero reduction (each doc's
tokens live in its own partition, so the partial collect_list IS the
final list). The row-local shape hashes the distinct-token array in
place (`transform`) and feeds the SAME kernel — zero explode, zero
aggregate, zero exchange. Vote counting is order-insensitive, so
collect_list order vs array order cannot matter; the value gate below
asserts signature identity anyway, and
tests/test_dedup_similarity.py::test_simhash_arrow_kernel_matches_sum_formulation
independently pins the shipped shape against the original JVM sum
formulation.

Variants (both widths as registered: 128 = simhash128_near_dup,
64 = retired simhash_near_dup):
  old   explode → groupBy collect_list → kernel  (the §5 shape)
  new   row-local transform arrays → kernel      (shipped)

plus a query-level interleaved A/B of simhash128_near_dup via
monkeypatch (the full banded-pair query).

Usage: python scripts/mb_simhash2.py [sf_dir] [reps]
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

    import hazelcast_jet_contrib_spark.operators.dedup as dd
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _simhash_vote_kernel,
        _spread,
    )
    from hazelcast_jet_contrib_spark.registry import QUERIES, table

    spark = get_spark(app_name="mb_simhash2")

    def corpus():
        docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
        orig = F.struct(F.col("doc_id").alias("doc_id"), F.col("text").alias("text"))
        copy = F.struct(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat("text", F.lit(" xx")).alias("text"),
        )
        return docs.select(F.explode(F.array(orig, copy)).alias("__v__")).select(
            F.col("__v__.doc_id").alias("doc_id"), F.col("__v__.text").alias("text")
        )

    def old_sig128(df, id_col, text_col):
        toks = _spread(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text__"))
        ).select(
            "id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.trim(F.col("__text__"))), r"\s+"))
            ).alias("tok"),
        ).select(
            "id", F.xxhash64("tok").alias("h0"), F.xxhash64("tok", F.lit(1)).alias("h1")
        )
        kernel = _simhash_vote_kernel(2)
        lists = toks.groupBy("id").agg(
            F.collect_list("h0").alias("a0"), F.collect_list("h1").alias("a1")
        )
        return lists.select("id", kernel("a0", "a1").alias("__sp__")).select(
            "id",
            F.element_at("__sp__", 1).alias("sig0"),
            F.element_at("__sp__", 2).alias("sig1"),
        )

    def old_sig64(df, id_col, text_col):
        toks = _spread(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text__"))
        ).select(
            "id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.trim(F.col("__text__"))), r"\s+"))
            ).alias("tok"),
        ).withColumn("h", F.xxhash64("tok"))
        kernel = _simhash_vote_kernel(1)
        lists = toks.groupBy("id").agg(F.collect_list("h").alias("a0"))
        return lists.select("id", kernel("a0").alias("__sp__")).select(
            "id", F.element_at("__sp__", 1).alias("sig")
        )

    new_sig128 = dd.simhash_signature128
    new_sig64 = dd.simhash_signature

    # ---- value gates ---------------------------------------------------
    o = {(r["id"], r["sig0"], r["sig1"]) for r in old_sig128(corpus(), "doc_id", "text").collect()}
    n = {(r["id"], r["sig0"], r["sig1"]) for r in new_sig128(corpus(), "doc_id", "text").collect()}
    assert o == n, "128-bit signatures differ"
    print(f"128-bit signatures identical: {len(o)} docs")
    o64 = {(r["id"], r["sig"]) for r in old_sig64(corpus(), "doc_id", "text").collect()}
    n64 = {(r["id"], r["sig"]) for r in new_sig64(corpus(), "doc_id", "text").collect()}
    assert o64 == n64, "64-bit signatures differ"
    print(f"64-bit signatures identical: {len(o64)} docs")

    # ---- operator-level noop A/B ---------------------------------------
    def run_noop(fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return time.perf_counter() - t0

    variants = {
        "sig128/old": lambda: old_sig128(corpus(), "doc_id", "text"),
        "sig128/new": lambda: new_sig128(corpus(), "doc_id", "text"),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        order = list(variants) if rep % 2 == 0 else list(reversed(list(variants)))
        for k in order:
            results[k].append(run_noop(variants[k]))
    for k, ts in results.items():
        ts = sorted(ts)
        print(
            f"{k:12s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )

    # ---- query-level interleaved A/B (monkeypatch) ----------------------
    def run_query(sig128) -> float:
        dd.simhash_signature128 = sig128
        t0 = time.perf_counter()
        QUERIES["simhash128_near_dup"](spark, SF_DIR).collect()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    qres: dict[str, list[float]] = {"q/old": [], "q/new": []}
    for rep in range(REPS):
        order = (
            [("q/old", old_sig128), ("q/new", new_sig128)]
            if rep % 2 == 0
            else [("q/new", new_sig128), ("q/old", old_sig128)]
        )
        for k, s in order:
            qres[k].append(run_query(s))
    dd.simhash_signature128 = new_sig128
    for k, ts in qres.items():
        ts = sorted(ts)
        print(
            f"{k:12s} min={ts[0]:.3f} med={ts[len(ts) // 2]:.3f} "
            f"all={[round(t, 2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Scale rehearsal for the persisted MinHash index family: measured
evidence (executed-plan shuffle accumulators, the pagerank/BM25
discipline) for the two laws that make the index usable at 100 TB:

1. BUILD cost is linear: 8x corpus -> ~8x shuffled records through the
   exact relation `build_minhash_index` writes (`index_rows`), at a
   CONSTANT exchange count — the build is one signature aggregation +
   one band repartition no matter the corpus size.
2. PROBE cost is corpus-independent: probing an 8x larger index with
   the same probe set shuffles the SAME number of records — the probe
   side is a broadcast (never a corpus shuffle), so the only shuffled
   relation is the candidate-pair dedup, bounded by bucket matches.

Corpora are generated with pure Catalyst expressions (xxhash64-driven
word choice), deterministic and scale-independent; near-dup probes are
planted in the base region only so the candidate set is identical at
both index sizes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.dedup import (
    build_minhash_index,
    index_rows,
    probe_minhash_index,
)
from hazelcast_jet_contrib_spark.plans.audit import executed_shuffle_stats

N1 = 2_000
WORDS = 20
VOCAB = 500


def _corpus(spark, tmp_path, n_docs: int):
    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda p: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("id"), p), F.lit(VOCAB)).cast("string"),
        ),
    )
    # parquet round-trip: spark.range's known partitioning would let
    # Catalyst elide the per-id aggregation exchange; a real corpus
    # comes off a scan with unknown partitioning, so the rehearsal must
    path = str(tmp_path / f"corpus_{n_docs}")
    spark.range(n_docs).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    ).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _build_scale(spark, tmp_path, n_docs: int) -> dict[str, int]:
    # the exact relation the build writes, including its band
    # repartition, measured through a count wrapper (column pruning
    # under the count changes shuffled BYTES, never shuffled RECORDS —
    # the law under test)
    rel = index_rows(
        _corpus(spark, tmp_path, n_docs), "doc_id", "text", 64, 16, 3
    ).repartition("band")
    counted = rel.agg(F.count(F.lit(1)).alias("n"))
    n = counted.collect()[0]["n"]
    stats = executed_shuffle_stats(counted)
    return {"rows": n, **stats}


@pytest.mark.slow
def test_index_build_shuffle_linear_at_constant_exchanges(spark, tmp_path):
    """8x corpus -> ~8x shuffled records through the build relation, at
    an identical exchange count: the build never adds a stage as the
    corpus grows — the 100 TB build is the same plan, wider."""
    r1 = _build_scale(spark, tmp_path, N1)
    r8 = _build_scale(spark, tmp_path, N1 * 8)
    assert r8["rows"] == r1["rows"] * 8  # 16 band rows per doc, exactly
    growth = r8["shuffle_records"] / max(r1["shuffle_records"], 1)
    assert 4 <= growth <= 2 * 8, (
        f"index build shuffle grew {growth:.1f}x for an 8x corpus — "
        "expected ~linear"
    )
    assert r8["exchanges"] == r1["exchanges"], (
        f"exchange count changed with corpus size "
        f"({r1['exchanges']} -> {r8['exchanges']}) — the build plan "
        "must not grow stages with the data"
    )
    print(
        f"INDEX-BUILD-SCALE 1x: {r1['shuffle_records']} rec / "
        f"{r1['exchanges']} exch; 8x: {r8['shuffle_records']} rec / "
        f"{r8['exchanges']} exch; growth {growth:.2f}x"
    )


@pytest.mark.slow
def test_index_probe_shuffle_independent_of_corpus_size(spark, tmp_path):
    """Probing an 8x larger index with the SAME probes shuffles the
    same records: the probe side broadcasts, the index side is scanned
    in place, and the only exchange is the candidate-pair dedup —
    bounded by bucket matches, not by index size. This is the property
    that lets a bounded eval set decontaminate an arbitrarily large
    corpus without ever shuffling it."""
    base = _corpus(spark, tmp_path, N1)
    big = _corpus(spark, tmp_path, N1 * 8)
    # probes = 8 exact copies from the BASE region (present in both
    # indexes), so true matches — and hence candidates — are identical
    probes = (
        base.filter(F.col("doc_id") < 8)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )

    results = {}
    for label, corpus in (("1x", base), ("8x", big)):
        path = str(tmp_path / f"idx_{label}")
        build_minhash_index(corpus, path, num_hashes=64, bands=16)
        out = probe_minhash_index(spark, path, probes, threshold=0.9)
        rows = out.collect()
        results[label] = {"hits": len(rows), **executed_shuffle_stats(out)}

    r1, r8 = results["1x"], results["8x"]
    assert r1["hits"] == 8 and r8["hits"] == 8, (
        f"planted exact-dup probes must hit in both indexes "
        f"(got {r1['hits']} / {r8['hits']})"
    )
    assert r8["shuffle_records"] <= max(2 * r1["shuffle_records"], 64), (
        f"probe shuffled {r8['shuffle_records']} records against the 8x "
        f"index vs {r1['shuffle_records']} against 1x — probe cost must "
        "not scale with the corpus"
    )
    assert r8["exchanges"] == r1["exchanges"]
    print(
        f"INDEX-PROBE-SCALE 1x: {r1['shuffle_records']} rec; "
        f"8x: {r8['shuffle_records']} rec (both {r1['exchanges']} exch, "
        f"8/8 hits)"
    )

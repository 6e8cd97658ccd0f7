"""Distributed BPE trainer/encoder tests: exact agreement with a
single-process reference implementation (same counts, same tiebreaks),
determinism, early stop, and the real-corpus path."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.bpe import (
    END,
    _apply_merges_py,
    bpe_encode,
    train_bpe,
)
from hazelcast_jet_contrib_spark.registry import table
from tests.conftest import CORRECTNESS_SF


def _reference_train(texts, num_merges, min_pair_count=2):
    """Classic single-process BPE with the operator's exact tiebreak:
    max count, then lexicographic (a, b)."""
    words = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                words[w] += 1
    syms = {w: list(w) + [END] for w in words}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, s in syms.items():
            for x, y in zip(s, s[1:]):
                pairs[(x, y)] += words[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        a, b = best[0]
        merges.append((a, b))
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


CORPUS = [
    "low low low low low lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest",
]


def test_trainer_matches_reference_exactly(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = train_bpe(docs, num_merges=12)
    want = _reference_train(CORPUS, num_merges=12)
    assert got == want, (got, want)
    # the canonical example's early merges
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", END)]


def test_trainer_deterministic_and_early_stop(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    assert train_bpe(docs, num_merges=6) == train_bpe(docs, num_merges=6)
    few = train_bpe(docs, num_merges=100, min_pair_count=10)
    want = _reference_train(CORPUS, num_merges=100, min_pair_count=10)
    assert few == want and len(few) < 100, "must stop when pairs go rare"
    with pytest.raises(ValueError):
        train_bpe(docs, num_merges=0)


def test_encode_matches_python_kernel_and_counts(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS + ["lowest unseen"])],
        "doc_id long, text string",
    )
    merges = _reference_train(CORPUS, num_merges=10)
    out = {r["doc_id"]: (r["tokens"], r["n_tokens"]) for r in
           bpe_encode(docs, merges).collect()}
    for i, t in enumerate(CORPUS + ["lowest unseen"]):
        want = []
        for w in t.lower().split():
            want.extend(_apply_merges_py(w, merges))
        assert out[i][0] == want
        assert out[i][1] == len(want)


def test_trainer_on_real_corpus_compresses(spark):
    docs = table(spark, CORRECTNESS_SF, "documents")
    merges = train_bpe(docs.limit(60), num_merges=8)
    assert len(merges) == 8
    enc = bpe_encode(docs.limit(20), merges)
    row = enc.agg(
        F.sum("n_tokens").alias("tok"),
    ).collect()[0]
    base = (
        docs.limit(20)
        .agg(
            (
                F.sum(F.length(F.regexp_replace("text", r"\s+", "")))
                + F.sum(F.size(F.split(F.trim("text"), r"\s+")))
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    # merges fired: fewer tokens than the unmerged chars + word-end marks
    assert row["tok"] < base


def test_encode_invariant_to_partitioning(spark):
    """The per-batch word cache is an optimization only: encoding the
    same corpus at 1 vs 16 partitions yields identical tokens."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 4)], "doc_id long, text string"
    )
    merges = _reference_train(CORPUS, num_merges=8)
    one = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs.coalesce(1), merges).collect()
    }
    many = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs.repartition(16), merges).collect()
    }
    assert one == many

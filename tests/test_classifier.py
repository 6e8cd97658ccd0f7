"""Quality-classifier tests: gradient math against a NumPy reference
(same featurization, same full-batch GD), separation on a synthetic
good/bad corpus, and scoring-path parity with training margins."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.classifier import (
    BIAS_IDX,
    score_documents,
    train_quality_classifier,
)

GOOD_WORDS = ["clear", "prose", "well", "formed", "sentences", "with", "meaning"]
BAD_WORDS = ["zzz", "qqq", "#@!", "111", "xxx", "garbled", "spam"]


def _corpus(n_each=30, seed=7):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n_each):
        rows.append((i, " ".join(rng.choices(GOOD_WORDS, k=12)), 1))
        rows.append((1000 + i, " ".join(rng.choices(BAD_WORDS, k=12)), 0))
    return rows


def test_gradient_descent_matches_numpy_on_exported_features(spark):
    """Export the Spark feature relation once, run the same full-batch
    GD in NumPy, and compare the final weight vector (1e-6 — float
    sums are shuffle-order sensitive, not semantics)."""
    from hazelcast_jet_contrib_spark.operators.classifier import featurize

    rows = _corpus(n_each=12)
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    nf = 1 << 10
    iters, lr = 15, 2.0

    w_spark = train_quality_classifier(
        docs, "label", num_features=nf, iterations=iters, lr=lr
    )

    frows = featurize(docs, num_features=nf).collect()
    labels = {r[0]: float(r[2]) for r in rows}
    ids = sorted(labels)
    id_pos = {d: i for i, d in enumerate(ids)}
    idxs = sorted({r["idx"] for r in frows})
    idx_pos = {x: i for i, x in enumerate(idxs)}
    X = np.zeros((len(ids), len(idxs)))
    for r in frows:
        X[id_pos[r["id"]], idx_pos[r["idx"]]] = r["val"]
    y = np.array([labels[d] for d in ids])
    w = np.zeros(len(idxs))
    for _ in range(iters):
        m = X @ w
        resid = 1.0 / (1.0 + np.exp(-m)) - y
        w -= lr * (X.T @ resid) / len(ids)
    for x in idxs:
        assert abs(w_spark.get(x, 0.0) - w[idx_pos[x]]) < 1e-6, x


def test_classifier_separates_good_from_bad(spark):
    train = _corpus(n_each=30, seed=7)
    test = _corpus(n_each=15, seed=99)  # fresh draws, same distributions
    docs = spark.createDataFrame(train, "doc_id long, text string, label int")
    w = train_quality_classifier(docs, "label", num_features=1 << 12)
    held = spark.createDataFrame(test, "doc_id long, text string, label int")
    scored = score_documents(held, w, num_features=1 << 12).join(
        held.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    acc = sum(1 for r in rows if (r["score"] >= 0.5) == (r["label"] == 1)) / len(rows)
    assert acc >= 0.95, f"held-out accuracy {acc}"
    # bias learned (classes are balanced -> small), good scores high
    goods = [r["score"] for r in rows if r["label"] == 1]
    bads = [r["score"] for r in rows if r["label"] == 0]
    assert min(goods) > max(bads), "distributions must separate cleanly"


def test_scoring_plan_stays_jvm_side(spark):
    docs = spark.createDataFrame(
        _corpus(n_each=5), "doc_id long, text string, label int"
    )
    w = train_quality_classifier(docs, "label", num_features=256, iterations=2)
    out = score_documents(docs, w, num_features=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan, "weights must broadcast"


def test_validation(spark):
    docs = spark.createDataFrame(
        _corpus(n_each=2), "doc_id long, text string, label int"
    )
    with pytest.raises(ValueError):
        train_quality_classifier(docs, "label", iterations=0)
    with pytest.raises(ValueError):
        train_quality_classifier(docs.filter("doc_id < 0"), "label")


def test_l2_shrinks_weights(spark):
    docs = spark.createDataFrame(
        _corpus(n_each=10), "doc_id long, text string, label int"
    )
    w0 = train_quality_classifier(docs, "label", num_features=512, iterations=8)
    w2 = train_quality_classifier(
        docs, "label", num_features=512, iterations=8, l2=0.5
    )
    n0 = sum(v * v for k, v in w0.items() if k != BIAS_IDX)
    n2 = sum(v * v for k, v in w2.items() if k != BIAS_IDX)
    assert n2 < n0, "L2 must shrink the non-bias weight norm"


def test_featurize_single_pass_matches_join_shape(spark):
    """The r17 single-lineage featurize (window + inline bias explode)
    is row-identical to the former tf -> doc_len join -> bias union
    shape, including single-token docs, repeated tokens, and hash
    collisions into the same idx bucket."""
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.operators.classifier import (
        BIAS_IDX,
        featurize,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha gamma"),
            (2, "one"),
            (3, "  padded   tokens here  "),
            (4, "x " * 50),
        ],
        "doc_id long, text string",
    )
    nf = 1 << 4  # tiny hash space forces idx collisions

    # former shape, inlined as the reference
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = (
        toks.select("id", F.pmod(F.xxhash64("tok"), F.lit(nf)).alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    doc_len = tf.groupBy("id").agg(F.sum("n").alias("len"))
    old = (
        tf.join(doc_len, "id")
        .select("id", "idx", (F.col("n") / F.col("len")).alias("val"))
        .unionByName(
            doc_len.select(
                "id", F.lit(BIAS_IDX).alias("idx"), F.lit(1.0).alias("val")
            )
        )
    )
    got = sorted(
        (r["id"], r["idx"], round(r["val"], 12))
        for r in featurize(docs, num_features=nf).collect()
    )
    want = sorted(
        (r["id"], r["idx"], round(r["val"], 12)) for r in old.collect()
    )
    assert got == want

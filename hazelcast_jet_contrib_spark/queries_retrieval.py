"""Round-9 retrieval-stack queries: batched multi-query BM25, RRF
hybrid fusion, and MMR diversification — the serving-side trio built in
round 8 (operators/retrieval.py), now driver-proven. Reference lineage:
the reference ships text ingestion (TwitterSources.java:179-187,
MongoDBSources.java:80-96) but no ranking; this is the retrieval layer
an LLM data/RAG pipeline runs on the ingested corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.cache import release_tracked
from hazelcast_jet_contrib_spark.registry import query, retired_query, table

# Three fixed term-set queries over the documents table; terms chosen
# from the corpus vocabulary so every query has matches at every SF.
_QSETS = {1: ["data", "model"], 2: ["training", "sort"], 3: ["window", "join"]}


def _queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(q, t) for q, t in sorted(_QSETS.items())],
        "query_id long, terms array<string>",
    )


def _bm25_multi_oracle(k: int) -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, terms in sorted(_QSETS.items()) for t in terms
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks),
    q(query_id, term) AS (VALUES {vals}),
    tf AS (
      SELECT doc_id, len(t) AS dl, term,
             CAST(len(list_filter(t, x -> x = term)) AS DOUBLE) AS tf
      FROM toks, (SELECT DISTINCT term FROM q) qt
      WHERE list_contains(t, term)
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT q.query_id, tf.doc_id,
             ROUND(SUM(
               LN(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
             ), 6) AS score
      FROM tf, stats
      JOIN dfreq ON tf.term = dfreq.term
      JOIN q ON q.term = tf.term
      GROUP BY q.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored
    ) t WHERE rank <= {k}
    """


@retired_query(
    "bm25_topk_multi_docs",
    reason="r15: batched multi-query BM25 subsumed by bm25_topk_docs (the"
    " SAME scorer implementation; per-query value-equivalence of the"
    " batched path to the single-query path is pinned in"
    " tests/test_analytics.py, and the one-corpus-pass property is a"
    " structural pass-count check pytest makes, not a value property the"
    " driver hash adds information about) — freed the r15 window slot for"
    " the mqtt oracle re-proof (ADVICE r14 #4) + the new S15 row"
    " (ROUND15_PLAN.md §Window)",
    oracle=_bm25_multi_oracle(10),
)
def bm25_topk_multi_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25: three queries scored in ONE corpus pass (per-term
    df and corpus stats computed once and shared — IDF identical to
    running each query alone, proven per-query-equivalent in
    tests/test_analytics.py). Scale: the corpus pass explodes only
    union-of-query-term hits; stats/df/term→query relations broadcast;
    the cut is a per-query window over matches only
    (operators/retrieval.py bm25_topk_multi)."""
    from hazelcast_jet_contrib_spark.operators.retrieval import bm25_topk_multi

    docs = table(spark, sf_dir, "documents")
    out = bm25_topk_multi(docs, _queries_df(spark), k=10)
    # eager: hand the (tiny, k-bounded) result to the driver as a local
    # relation. Since r17 the operator tracked-persists one NARROW
    # per-doc relation (id, dl, per-term tf — never token arrays) so
    # the corpus is tokenized once instead of twice; release it now
    # that the result is local.
    rows = [
        (r["query_id"], r["doc_id"], r["score"], r["rank"]) for r in out.collect()
    ]
    release_tracked()
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, rank int"
    )


_RRF_K = 60


@query(
    "rrf_fusion_hybrid",
    oracle=f"""
    WITH lex AS ({_bm25_multi_oracle(10)}),
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id IN (1, 2, 3)),
    c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id >= 10),
    dense AS (
      SELECT query_id, cid AS doc_id, rank FROM (
        SELECT query_id, cid,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY ROUND(list_cosine_similarity(qv, cv), 6) DESC, cid
               ) AS INT) AS rank
        FROM qv, c
      ) t WHERE rank <= 10
    ),
    unioned AS (
      SELECT query_id, doc_id, rank FROM lex
      UNION ALL
      SELECT query_id, doc_id, rank FROM dense
    ),
    fused AS (
      SELECT query_id, doc_id,
             ROUND(SUM(1.0 / ({_RRF_K} + rank)), 6) AS score
      FROM unioned GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM fused
    ) t WHERE rank <= 10
    """,
)
def rrf_fusion_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-10 fused with dense cosine
    top-10 (documents and embeddings share the id space) by Reciprocal
    Rank Fusion. Exact oracle: rrf scores are sums of at most TWO
    reciprocal terms per (query, doc) — two-term double addition is
    engine-order-invariant — rounded to 6dp before the final rank.
    Scale: both inputs are top-k-bounded; the fusion itself never sees
    anything corpus-sized (operators/retrieval.py rrf_fuse)."""
    from hazelcast_jet_contrib_spark.operators.retrieval import (
        bm25_topk_multi,
        rrf_fuse,
    )
    from hazelcast_jet_contrib_spark.operators.similarity import cosine_topk

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    lex = bm25_topk_multi(docs, _queries_df(spark), k=10).select(
        "query_id", F.col("doc_id").alias("neighbor_id"), "rank"
    )
    dense = cosine_topk(
        emb.filter(F.col("vec_id").isin(1, 2, 3)),
        emb.filter(F.col("vec_id") >= 10),
        k=10,
    ).select("query_id", "neighbor_id", "rank")
    fused = rrf_fuse([lex, dense], k=10, rrf_k=_RRF_K)
    rows = [
        (r["query_id"], r["neighbor_id"], r["score"], r["rank"])
        for r in fused.collect()
    ]
    # the BM25 leg tracked-persists its narrow per-doc relation (r17
    # one-pass tokenize); the result is local now, so release it
    release_tracked()
    return spark.createDataFrame(
        rows, "query_id long, doc_id long, score double, rank int"
    )


@query(
    "mmr_rerank_diverse",
    oracle=f"""
    SELECT query_id, doc_id, score, rank,
           CAST(1 AS INT) AS lam07_valid
    FROM ({_bm25_multi_oracle(5)}) t
    """,
)
def mmr_rerank_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification, VALUE-LEVEL driver proof (VERDICT r09
    missing #1; formerly the registry's only rows-only row). Two legs:

    1. The emitted rows are the lam=1.0 DEGENERATE-EXACT rerank of the
       BM25 top-10 shortlist (k=5): with lam=1.0 the marginal term
       vanishes in exact IEEE arithmetic (1.0*rel - 0.0*maxsim == rel)
       and the greedy tie-break (rel desc, doc id asc) is the BM25
       rank order, so every column — ids, 6dp scores, ranks — equals
       the BM25 top-5 SQL. Engine-portable, zero float-tie flake.
    2. The lam=0.7 DIVERSE run executes too and is census-gated
       per query into lam07_valid (the classifier_holdout pattern):
       exactly k distinct ranks 1..k, picks drawn from the shortlist,
       and rank-1 pick == the top-relevance doc (MMR's first pick is
       lam-independent: nothing is picked yet, so the penalty is 0).
       Its exact ordering stays engine-pinned in pytest
       (tests/test_analytics.py, 9dp rounding + pre-sort rationale —
       cross-engine float cosine ties are why THAT leg is a gate, not
       a hash).

    Scale: per-query greedy over a bounded shortlist via ONE Arrow
    batch per query group for BOTH lam values (operators/retrieval.py
    mmr_rerank_multi — flipped round 12 from two separate mmr_rerank
    calls, halving the shortlist-embedding join + Python round-trip;
    per-lam rows proven identical to separate calls in
    tests/test_analytics.py)."""
    from hazelcast_jet_contrib_spark.operators.retrieval import (
        bm25_topk_multi,
        mmr_rerank_multi,
    )

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    # materialize the (30-row) shortlist ONCE: it feeds three consumers
    # (two reranks + the gate), and the BM25 plan is deliberately
    # unpersisted — re-executing its two corpus passes per consumer
    # would triple the query's dominant cost (measured 5.6s -> ~3s)
    cand_rows = (
        bm25_topk_multi(docs, _queries_df(spark), k=10)
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "score")
        .collect()
    )
    cand = spark.createDataFrame(
        [(r["query_id"], r["neighbor_id"], r["score"]) for r in cand_rows],
        "query_id long, neighbor_id long, score double",
    )
    both = mmr_rerank_multi(cand, emb, k=5, lams=[1.0, 0.7]).collect()
    exact = [r for r in both if r["lam"] == 1.0]
    diverse = [r for r in both if r["lam"] == 0.7]
    shortlist: dict[int, set[int]] = {}
    for r in cand_rows:
        shortlist.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # the BM25 leg tracked-persists its narrow per-doc relation (r17
    # one-pass tokenize); everything is local now, so release it
    release_tracked()

    by_q: dict[int, list] = {}
    for r in diverse:
        by_q.setdefault(r["query_id"], []).append(r)
    top1 = {
        r["query_id"]: r["neighbor_id"] for r in exact if r["rank"] == 1
    }

    def _gate(q: int) -> int:
        rs = by_q.get(q, [])
        ranks = sorted(r["rank"] for r in rs)
        picks = [r["neighbor_id"] for r in rs]
        ok = (
            ranks == list(range(1, 6))
            and len(set(picks)) == 5
            and set(picks) <= shortlist.get(q, set())
            and next(r["neighbor_id"] for r in rs if r["rank"] == 1)
            == top1.get(q)
        )
        return int(ok)

    rows = [
        (r["query_id"], r["neighbor_id"], r["mmr"], r["rank"],
         _gate(r["query_id"]))
        for r in exact
    ]
    return spark.createDataFrame(
        rows,
        "query_id long, doc_id long, score double, rank int, "
        "lam07_valid int",
    )

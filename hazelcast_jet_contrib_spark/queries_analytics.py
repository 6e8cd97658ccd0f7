"""Round-8 analytics queries: lexical retrieval (BM25), rolling
z-score anomaly screening, and strict-order funnel conversion — the
event/text analytics layer over the reference's ingested streams
(TwitterSources.java:85-146, RedisSources.java:273-395) and fetched
documents (MongoDBSources.java:80-96), with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.funnel import funnel_steps
from hazelcast_jet_contrib_spark.operators.retrieval import bm25_topk
from hazelcast_jet_contrib_spark.operators.timeseries import (
    rolling_zscore_anomalies,
)
from hazelcast_jet_contrib_spark.registry import query, table

_BM25_TERMS = ["data", "model", "training"]


@query(
    "bm25_topk_docs",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks),
    q(term) AS (VALUES ('data'),('model'),('training')),
    tf AS (
      SELECT doc_id, len(t) AS dl, term,
             CAST(len(list_filter(t, x -> x = term)) AS DOUBLE) AS tf
      FROM toks, q
      WHERE list_contains(t, term)
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               LN(1 + (stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * tf.tf * (1.2 + 1)
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl / stats.avgdl))
             ), 6) AS score
      FROM tf, stats JOIN dfreq ON tf.term = dfreq.term
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score,
           ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 25
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-25 documents for a 3-term query (Lucene idf/tf
    formulation, k1=1.2 b=0.75). Scale: array_intersect restricts the
    corpus pass to query-term hits BEFORE the explode, stats/df join
    back as broadcasts, scoring is whole-stage-codegen arithmetic, and
    the cut is TakeOrderedAndProject (operators/retrieval.py)."""
    return bm25_topk(table(spark, sf_dir, "documents"), _BM25_TERMS, k=25)


@query(
    "rolling_zscore_anomaly",
    oracle="""
    WITH scored AS (
      SELECT user_id AS key, ts, value,
             COUNT(value) OVER w AS n,
             AVG(value) OVER w AS mu,
             AVG(value * value) OVER w AS msq
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT key, ts, value,
           ROUND((value - mu) / SQRT(GREATEST(msq - mu * mu, 0.0)), 6) AS z,
           ABS(ROUND((value - mu) / SQRT(GREATEST(msq - mu * mu, 0.0)), 6))
             > 2.5 AS is_anomaly
    FROM scored
    WHERE n >= 2 AND SQRT(GREATEST(msq - mu * mu, 0.0)) > 0
    """,
)
def rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling z-score anomaly screen over the event value
    series: each point scored against its own trailing-20 baseline
    (point excluded), |z| > 2.5 flagged. Scale: one shuffle on the
    user key, a bounded ROWS frame evaluated by WindowExec (3 window
    buffers — plan-asserted), no arrays or Python
    (operators/timeseries.py rolling_zscore_anomalies)."""
    ev = table(spark, sf_dir, "events")
    return rolling_zscore_anomalies(
        ev, "user_id", "ts", "value",
        lookback=20, threshold=2.5, tiebreak_col="event_id",
    )


@query(
    "funnel_conversion_steps",
    oracle="""
    WITH t0 AS (
      SELECT user_id, MIN(ts) FILTER (WHERE event_type = 'view') AS t
      FROM events GROUP BY user_id
    ),
    t1 AS (
      SELECT e.user_id, MIN(e.ts) FILTER (
        WHERE e.event_type = 'click' AND t0.t IS NOT NULL AND e.ts > t0.t
      ) AS t
      FROM events e JOIN t0 USING (user_id) GROUP BY e.user_id, t0.t
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) FILTER (
        WHERE e.event_type = 'purchase' AND t1.t IS NOT NULL AND e.ts > t1.t
      ) AS t
      FROM events e JOIN t1 USING (user_id) GROUP BY e.user_id, t1.t
    ),
    c AS (
      SELECT (SELECT COUNT(t) FROM t0) AS c0,
             (SELECT COUNT(t) FROM t1) AS c1,
             (SELECT COUNT(t) FROM t2) AS c2
    )
    SELECT 1 AS step, 'view' AS step_name, c0 AS users,
           ROUND(CASE WHEN c0 > 0 THEN 1.0 ELSE 0.0 END, 6) AS conversion
    FROM c
    UNION ALL
    SELECT 2, 'click', c1,
           ROUND(CASE WHEN c0 > 0 THEN CAST(c1 AS DOUBLE) / c0 ELSE 0.0 END, 6)
    FROM c
    UNION ALL
    SELECT 3, 'purchase', c2,
           ROUND(CASE WHEN c0 > 0 THEN CAST(c2 AS DOUBLE) / c0 ELSE 0.0 END, 6)
    FROM c
    """,
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order view→click→purchase funnel: users reaching step k
    via an event strictly after their earliest step-(k-1) completion.
    Scale: ONE shuffle on the user key — every step is a window min
    over the same partitioning (Catalyst chains the Window nodes
    without re-exchanging), counts partial-aggregate globally
    (operators/funnel.py funnel_steps)."""
    ev = table(spark, sf_dir, "events")
    return funnel_steps(ev, ["view", "click", "purchase"])

"""Mergeable-sketch queries: the probabilistic module generalized to the
rollup patterns a 100 TB deployment actually uses.

The reference proves its HLL aggregation by asserting the estimate
lands within ±5% of truth (HyperLogLogTest.java:121-127); these queries
keep that oracle contract (deterministic boolean accuracy gates) while
exercising the property the reference's create/accumulate/combine/
exportFinish decomposition exists FOR: partial sketches are first-class
mergeable values. Each query aggregates sketches per group, merges them
in a second aggregation, and gates the merged estimate against the
exact answer computed from the raw data — proving accumulate ∘ combine
= accumulate-over-union, which is what lets a rollup table of per-day
sketches answer arbitrary-range distinct/quantile queries without
rescanning the fact data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions import sketches as SK
from hazelcast_jet_contrib_spark.registry import query, table

_OK_ORACLE = """
    SELECT CAST(1 AS INT) AS ok
"""


@query("sketch_hll_rollup_union", oracle=_OK_ORACLE)
def sketch_hll_rollup_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation HLL sketches of the customer key space, merged with
    hll_union_agg into one global estimate — the pre-aggregated-rollup
    shape (store per-partition sketches, merge at query time) — gated
    within ±5% of the exact global distinct count."""
    cust = table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        SK.hll_sketch("c_custkey", lg_k=12).alias("sk")
    )
    merged = per_nation.agg(SK.hll_estimate(SK.hll_merge("sk")).alias("est"))
    exact = cust.agg(F.count_distinct("c_custkey").alias("exact"))
    return merged.crossJoin(exact).select(
        ((F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05))
        .cast("int")
        .alias("ok")
    )


@query("sketch_theta_retention_overlap", oracle=_OK_ORACLE)
def sketch_theta_retention_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via theta set algebra: distinct customers who
    ordered in BOTH 1995 and 1996, estimated by intersecting two theta
    sketches — no join or shuffle of the raw key sets, the intersection
    happens on two fixed-size binaries — gated within ±5% of the exact
    overlap (computed the expensive way, with a real semi-join)."""
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", F.year("o_orderdate").alias("y")
    )
    sk = orders.filter(F.col("y").isin(1995, 1996)).groupBy("y").agg(
        SK.theta_sketch("o_custkey", lg_k=14).alias("sk")
    )
    est = sk.agg(
        SK.theta_estimate(F.theta_intersection_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_years"),
    )
    a = orders.filter(F.col("y") == 1995).select("o_custkey").distinct()
    b = orders.filter(F.col("y") == 1996).select("o_custkey").distinct()
    exact = a.join(b, "o_custkey").agg(F.count(F.lit(1)).alias("exact"))
    return est.crossJoin(exact).select(
        (
            (F.col("n_years") == 2)
            & ((F.abs(F.col("est") - F.col("exact")) / F.col("exact")) <= F.lit(0.05))
        )
        .cast("int")
        .alias("ok")
    )


@query("sketch_kll_price_quantiles", oracle=_OK_ORACLE)
def sketch_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantiles: per-returnflag KLL sketches of
    l_extendedprice merged into one distribution; the merged sketch's
    p50/p95 estimates are gated by their TRUE ranks — each estimated
    quantile must sit at an actual rank within ±2% of its target (the
    k=200 sketch's guaranteed ~1.65% rank error)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    )
    per_mode = li.groupBy("l_returnflag").agg(
        SK.kll_sketch_double("p", k=200).alias("sk")
    )
    q = per_mode.agg(SK.kll_merge_double("sk").alias("m")).select(
        SK.kll_quantile("m", 0.5).alias("q50"), SK.kll_quantile("m", 0.95).alias("q95")
    )
    ranks = li.crossJoin(F.broadcast(q)).agg(
        F.avg((F.col("p") <= F.col("q50")).cast("double")).alias("r50"),
        F.avg((F.col("p") <= F.col("q95")).cast("double")).alias("r95"),
    )
    return ranks.select(
        (
            (F.abs(F.col("r50") - 0.5) <= F.lit(0.02))
            & (F.abs(F.col("r95") - 0.95) <= F.lit(0.02))
        )
        .cast("int")
        .alias("ok")
    )


@query(
    "sketch_topk_event_types",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def sketch_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (DataSketches approx_top_k): heavy hitters
    of the event stream. With maxItemsTracked >= the domain size the
    sketch is EXACT, so this query gets a full value-hash oracle row
    (not just an accuracy gate); the genuinely-approximate regime
    (domain >> maxItemsTracked) is pinned by
    tests/test_sketches.py::test_approx_top_k_skewed_heavy_hitter."""
    ev = table(spark, sf_dir, "events")
    tk = ev.agg(F.expr("approx_top_k(event_type, 5, 8192)").alias("tk"))
    return tk.select(F.explode("tk").alias("x")).select(
        F.col("x.item").alias("event_type"), F.col("x.count").alias("n")
    )


@query(
    "bloom_membership_filter",
    oracle="""
    WITH members AS (
      SELECT doc_id FROM documents WHERE source = 'src1'
    ),
    probes AS (
      SELECT doc_id AS pid,
             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS truly
      FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS pid, 0 AS truly FROM documents
    ),
    mpos AS (
      SELECT ((((2654435761 * (i + 1)) % 2147483647)
               * (doc_id % 2147483647)
               + ((1013904223 * (i + 1)) % 2147483647))
              % 2147483647) % 262144 AS pos
      FROM members CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i)
    ),
    bitmap AS (
      SELECT pos // 32 AS word_idx, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS word
      FROM mpos GROUP BY 1
    ),
    ppos AS (
      SELECT pid, truly,
             ((((2654435761 * (i + 1)) % 2147483647)
               * (pid % 2147483647)
               + ((1013904223 * (i + 1)) % 2147483647))
              % 2147483647) % 262144 AS pos
      FROM probes CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i)
    ),
    probed AS (
      SELECT pid, truly,
             min(CASE WHEN ((COALESCE(b.word, 0) >> CAST(pos % 32 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) AS mem
      FROM ppos LEFT JOIN bitmap b ON b.word_idx = pos // 32
      GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_probes,
           COUNT(CASE WHEN truly = 1 THEN 1 END) AS n_true_members,
           COUNT(CASE WHEN mem = 1 THEN 1 END) AS n_bloom_positive,
           COUNT(CASE WHEN truly = 1 AND mem = 0 THEN 1 END) AS n_false_negatives,
           COUNT(CASE WHEN truly = 0 AND mem = 1 THEN 1 END) AS n_false_positives
    FROM probed
    """,
)
def bloom_membership_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership, the "have we seen this URL" shape:
    build a 2^18-bit bitmap over one source's doc ids (bit_or-mergeable
    words, functions/sketches.py:bloom_build), probe every live id plus
    an equal-sized set of known-absent ids, and report the confusion
    counts. False negatives are structurally 0; the false-positive
    count is exactly reproduced by the oracle because the affine-mod-
    Mersenne hash family is engine-portable — the whole sketch, not an
    accuracy gate, is value-hash checked. Scale: the bitmap is ≤ 32 KB
    broadcast; probes never shuffle."""
    docs = table(spark, sf_dir, "documents")
    members = docs.filter(F.col("source") == "src1").select("doc_id")
    probes = docs.select(
        F.col("doc_id").alias("pid"),
        (F.col("source") == "src1").cast("int").alias("truly"),
    ).unionAll(
        docs.select((F.col("doc_id") + 10000000).alias("pid"), F.lit(0).alias("truly"))
    )
    bitmap = SK.bloom_build(members, "doc_id")
    # truly rides the probe as a carry column (pids are unique by
    # construction): the old join-back re-evaluated the probes union's
    # whole lineage a second time (r17 census: documents scanned 5x,
    # now 3x — members + one probes union).
    probed = SK.bloom_probe(probes, "pid", bitmap, carry=("truly",))
    return probed.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.count(F.when(F.col("truly") == 1, 1)).alias("n_true_members"),
        F.count(F.when(F.col("bloom_member"), 1)).alias("n_bloom_positive"),
        F.count(F.when((F.col("truly") == 1) & ~F.col("bloom_member"), 1)).alias(
            "n_false_negatives"
        ),
        F.count(F.when((F.col("truly") == 0) & F.col("bloom_member"), 1)).alias(
            "n_false_positives"
        ),
    )


@query(
    "cms_user_frequency",
    oracle="""
    WITH sketch AS (
      SELECT i,
             ((((2654435761 * (i + 1)) % 2147483647)
               * (user_id % 2147483647)
               + ((1013904223 * (i + 1)) % 2147483647))
              % 2147483647) % 1024 AS col,
             COUNT(*) AS cnt
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY 1
    ),
    est AS (
      SELECT e.user_id,
             min(COALESCE(s.cnt, 0)) AS est_cnt
      FROM exact e
      CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
      LEFT JOIN sketch s
        ON s.i = g.i
       AND s.col = ((((2654435761 * (g.i + 1)) % 2147483647)
                     * (e.user_id % 2147483647)
                     + ((1013904223 * (g.i + 1)) % 2147483647))
                    % 2147483647) % 1024
      GROUP BY 1
    )
    SELECT e.user_id, e.exact_cnt, s.est_cnt,
           CAST(s.est_cnt >= e.exact_cnt AS INT) AS never_undercounts
    FROM exact e JOIN est s ON s.user_id = e.user_id
    ORDER BY e.exact_cnt DESC, e.user_id
    LIMIT 20
    """,
)
def cms_user_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters: a d=4 x w=1024 counter grid over the
    event stream's user ids (sum-mergeable, functions/sketches.py:
    cms_build), point-estimated for every distinct user and reported
    for the 20 hottest. est >= exact ALWAYS (the min-over-rows
    estimate can only over-count); the oracle recomputes the entire
    grid with the same portable hash family, so the estimates
    themselves — collisions included — are value-hash checked. Scale:
    the sketch is ≤ 4096 rows regardless of event count; estimation is
    a broadcast join."""
    ev = table(spark, sf_dir, "events")
    sketch = SK.cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = SK.cms_estimate(exact.select("user_id"), "user_id", sketch)
    return (
        exact.join(est, "user_id")
        .select(
            "user_id",
            "exact_cnt",
            F.col("est").alias("est_cnt"),
            (F.col("est") >= F.col("exact_cnt")).cast("int").alias("never_undercounts"),
        )
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(20)
    )

"""Mergeable-sketch aggregations: accuracy gates plus the merge law
(sketch-of-union == union-of-sketches) that makes them rollup-safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.functions import sketches as SK


def test_hll_sketch_merge_equals_global(spark):
    """Partial-per-group then merge must estimate the same as one global
    sketch — the accumulate/combine decomposition contract
    (ProbabilisticAggregations.java:65-69)."""
    df = spark.range(0, 20_000).withColumn("g", (F.col("id") % 7).cast("int"))
    merged = (
        df.groupBy("g")
        .agg(SK.hll_sketch("id").alias("sk"))
        .agg(SK.hll_estimate(SK.hll_merge("sk")).alias("est"))
        .collect()[0]["est"]
    )
    direct = df.agg(SK.hll_estimate(SK.hll_sketch("id")).alias("est")).collect()[0][
        "est"
    ]
    assert merged == direct
    assert abs(merged - 20_000) / 20_000 <= 0.05


def test_hll_lg_k_validation():
    import pytest

    with pytest.raises(ValueError):
        SK.hll_sketch("x", lg_k=3)
    with pytest.raises(ValueError):
        SK.hll_sketch("x", lg_k=22)


def test_theta_set_algebra(spark):
    """Union/intersection/difference estimates on known overlapping
    ranges: A=[0,10k), B=[5k,15k)."""
    a = spark.range(0, 10_000).agg(SK.theta_sketch("id", lg_k=14).alias("sa"))
    b = spark.range(5_000, 15_000).agg(SK.theta_sketch("id", lg_k=14).alias("sb"))
    got = (
        a.crossJoin(b)
        .select(
            SK.theta_estimate(SK.theta_union("sa", "sb")).alias("u"),
            SK.theta_estimate(SK.theta_intersection("sa", "sb")).alias("i"),
            SK.theta_estimate(SK.theta_difference("sa", "sb")).alias("d"),
        )
        .collect()[0]
    )
    assert abs(got["u"] - 15_000) / 15_000 <= 0.05
    assert abs(got["i"] - 5_000) / 5_000 <= 0.05
    assert abs(got["d"] - 5_000) / 5_000 <= 0.05


def test_kll_merged_quantiles_rank_accuracy(spark):
    """Per-group KLL sketches merged; the merged median of 0..99999
    must sit within the sketch's rank-error band."""
    df = spark.range(0, 100_000).select(
        (F.col("id") % 10).alias("g"), F.col("id").cast("double").alias("v")
    )
    q = (
        df.groupBy("g")
        .agg(SK.kll_sketch_double("v", k=200).alias("sk"))
        .agg(SK.kll_merge_double("sk").alias("m"))
        .select(
            SK.kll_quantile("m", 0.5).alias("q50"),
            SK.kll_quantile("m", 0.99).alias("q99"),
        )
        .collect()[0]
    )
    assert abs(q["q50"] - 50_000) / 100_000 <= 0.02
    assert abs(q["q99"] - 99_000) / 100_000 <= 0.02


def test_kll_two_level_tree_merge_matches_flat_merge(spark):
    """kll_merge_grouped (the unbounded-group scale path: salt -> fold
    -> fold) must keep the same rank-accuracy contract as the flat
    fold; no collected array exceeds max(group/fanout, fanout)."""
    df = spark.range(0, 100_000).select(
        (F.col("id") % 2).alias("grp"),
        (F.col("id") % 500).alias("part"),
        F.col("id").cast("double").alias("v"),
    )
    # 500 partial sketches per grp — the shape where a flat collect_list
    # would hold all 500 in one row; the tree caps arrays at ~500/16, 16
    partials = df.groupBy("grp", "part").agg(
        SK.kll_sketch_double("v", k=200).alias("sk")
    )
    merged = SK.kll_merge_grouped(partials, ["grp"], "sk", out_col="m", fanout=16)
    rows = {
        r["grp"]: r["q50"]
        for r in merged.select(
            "grp", SK.kll_quantile("m", 0.5).alias("q50")
        ).collect()
    }
    assert set(rows) == {0, 1}
    for grp, q50 in rows.items():
        # each grp holds ~50k values spread uniformly over 0..99999
        assert abs(q50 - 50_000) / 100_000 <= 0.03, (grp, q50)


def test_sketch_aggs_stay_jvm_side(spark):
    """The whole sketch pipeline is JVM aggregation — no Python stage."""
    df = spark.range(0, 100).withColumn("g", (F.col("id") % 3).cast("int"))
    plan = (
        df.groupBy("g")
        .agg(SK.hll_sketch("id").alias("sk"))
        .agg(SK.hll_estimate(SK.hll_merge("sk")).alias("est"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan, plan


def test_approx_top_k_skewed_heavy_hitter(spark):
    """Genuinely-approximate regime: domain (10k keys) >> maxItemsTracked
    (64). The dominant key (20% of all rows) must surface as the top
    item — the frequent-items guarantee when the gap exceeds the error
    bound n/maxItemsTracked."""
    df = spark.range(0, 50_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    top = (
        df.agg(F.expr("approx_top_k(k, 3, 64)").alias("tk"))
        .select(F.explode("tk").alias("x"))
        .select(F.col("x.item").alias("item"), F.col("x.count").alias("est"))
        .collect()
    )
    assert top[0]["item"] == 7
    # 10_000 rows with id%5==0 map to 7, plus id=7 itself (7%5!=0 keeps it)
    exact = 10_000 + 1
    assert top[0]["est"] >= exact  # frequent-items estimates never undercount
    assert top[0]["est"] - exact <= 50_000 / 64  # and overcount is bounded


def test_bloom_no_false_negatives_and_bounded_fp_under_saturation(spark):
    """A deliberately tiny bitmap (2^10 bits, 500 keys, k=3) forces a
    measurable false-positive regime; the contract is: zero false
    negatives EVER, and an FP rate in the same decade as the
    (1 - e^{-kn/m})^k theory bound."""
    members = spark.range(0, 500).withColumnRenamed("id", "k")
    absent = spark.range(100_000, 110_000).withColumnRenamed("id", "k")
    m_bits, k = 1 << 10, 3
    bitmap = SK.bloom_build(members, "k", m_bits=m_bits, k=k)
    hits_members = SK.bloom_probe(members, "k", bitmap, m_bits=m_bits, k=k)
    assert hits_members.filter(~F.col("bloom_member")).count() == 0
    fp = SK.bloom_probe(absent, "k", bitmap, m_bits=m_bits, k=k)
    fp_rate = fp.filter(F.col("bloom_member")).count() / 10_000
    import math

    theory = (1 - math.exp(-k * 500 / m_bits)) ** k
    assert fp_rate > 0, "saturated filter must show some false positives"
    assert fp_rate <= 4 * theory, (fp_rate, theory)


def test_bloom_probe_carry_matches_join_back(spark):
    """The r17 carry path (extra columns ride the probe's explode +
    groupBy as first()) must reproduce exactly what the old join-back
    formulation produced: same (key, bloom_member) rows, same carried
    values — including repeated keys, which collapse to one row whose
    carry is the key's (functionally dependent) value."""
    members = spark.range(0, 200).withColumnRenamed("id", "k")
    bitmap = SK.bloom_build(members, "k")
    # probe set with duplicates; tag = k % 7 is functionally dependent
    probes = (
        spark.range(0, 400)
        .withColumnRenamed("id", "k")
        .unionAll(spark.range(0, 100).withColumnRenamed("id", "k"))
        .withColumn("tag", F.col("k") % 7)
    )
    carried = SK.bloom_probe(probes, "k", bitmap, carry=("tag",))
    join_back = (
        SK.bloom_probe(probes.select("k"), "k", bitmap)
        .join(probes.distinct(), "k")
        .select("k", "bloom_member", "tag")
    )
    assert {tuple(r) for r in carried.collect()} == {
        tuple(r) for r in join_back.collect()
    }
    assert carried.count() == 400  # one row per distinct key


def test_bloom_bitmaps_merge_by_bit_or(spark):
    """Union-of-sketches == sketch-of-union: building over two halves
    and bit_or-merging the word tables must equal one build over the
    whole set — the rollup property the reference's combine step
    exists for."""
    a = spark.range(0, 300).withColumnRenamed("id", "k")
    b = spark.range(300, 700).withColumnRenamed("id", "k")
    merged = (
        SK.bloom_build(a, "k")
        .unionAll(SK.bloom_build(b, "k"))
        .groupBy("word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
    whole = SK.bloom_build(a.unionAll(b), "k")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_never_undercounts_and_merges_by_sum(spark):
    """Every point estimate >= its true count (min over d counters that
    each saw every increment); summing two halves' counter grids equals
    the whole grid."""
    df = spark.range(0, 20_000).select((F.col("id") % 97).alias("k"))
    sketch = SK.cms_build(df, "k", w=64, d=4)  # 97 keys into 64 cols: collisions
    keys = df.distinct()
    est = SK.cms_estimate(keys, "k", sketch, w=64, d=4)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
    joined = est.join(exact, "k")
    assert joined.filter(F.col("est") < F.col("c")).count() == 0
    assert joined.filter(F.col("est") > F.col("c")).count() > 0, (
        "w=64 over 97 keys must collide somewhere"
    )
    h1 = df.filter(F.col("k") < 50)
    h2 = df.filter(F.col("k") >= 50)
    merged = (
        SK.cms_build(h1, "k", w=64, d=4)
        .unionAll(SK.cms_build(h2, "k", w=64, d=4))
        .groupBy("i", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = SK.cms_build(df, "k", w=64, d=4)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0

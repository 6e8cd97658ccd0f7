"""Curation operator tests: sampling determinism and rates, packing
budget invariants, vocabulary ordering, PII redaction — plus the plan
properties that make them 100 TB-viable (sample = pushed-down filter,
packing = per-shard window, never a global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.curation import (
    ngram_vocab,
    pack_token_budget,
    pii_match_counts,
    redact_pii,
    stratified_sample,
    topn_per_stratum,
)
from hazelcast_jet_contrib_spark.plans.audit import audit

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_sample_is_deterministic_and_rate_accurate(spark, docs):
    s1 = stratified_sample(docs, "lang", "doc_id", {"en": 0.25}, default_rate=0.5)
    s2 = stratified_sample(docs, "lang", "doc_id", {"en": 0.25}, default_rate=0.5)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())

    # rates hold within binomial noise per stratum
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, total in totals.items():
        rate = 0.25 if lang == "en" else 0.5
        assert abs(kept.get(lang, 0) / total - rate) < 0.35, (lang, kept, total)


def test_stratified_sample_plans_as_pure_filter(spark, docs):
    a = audit(stratified_sample(docs, "lang", "doc_id", {"en": 0.25}, 0.5))
    assert a.exchanges() == 0, "sampling must not shuffle"
    assert a.python_stages() == 0 and a.arrow_python_stages() == 0


def test_topn_per_stratum_exact_counts(spark, docs):
    out = topn_per_stratum(docs, "lang", "doc_id", n=3)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 3 for v in counts.values()), counts
    # deterministic choice
    again = topn_per_stratum(docs, "lang", "doc_id", n=3)
    assert sorted(map(tuple, out.select("doc_id").collect())) == sorted(
        map(tuple, again.select("doc_id").collect())
    )


def test_pack_token_budget_invariants(spark, docs):
    budget = 1500
    packed = pack_token_budget(docs, "doc_id", "n_chars", budget=budget, n_shards=4)
    rows = packed.select("doc_id", "n_chars", "shard", "pack_id").collect()
    assert len(rows) == docs.count()

    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault((r["shard"], r["pack_id"]), []).append(r)
    for (shard, pack_id), members in by_pack.items():
        tok = sum(m["n_chars"] for m in members)
        # a pack only exceeds the budget via its final document
        # (first-fit-with-overflow): dropping the largest-keyed member
        # must bring it under budget, unless it is a single oversized doc
        if tok > budget and len(members) > 1:
            members_sorted = sorted(members, key=lambda m: m["doc_id"])
            assert sum(m["n_chars"] for m in members_sorted[:-1]) < budget + max(
                m["n_chars"] for m in members_sorted
            )
    # pack ids are dense from 0 within each shard
    for shard in {s for s, _ in by_pack}:
        pids = sorted(p for s, p in by_pack if s == shard)
        assert pids[0] == 0 and pids == list(range(len(pids)))


def test_pack_window_is_per_shard_not_global(spark, docs):
    a = audit(pack_token_budget(docs, "doc_id", "n_chars", budget=1500, n_shards=4))
    # hashpartitioning on the shard key — never a single-partition global sort
    assert "SinglePartition" not in a.plan, "packing planned a global window"


def test_ngram_vocab_counts_and_ordering(spark):
    df = spark.createDataFrame(
        [("a b a b c",), ("a b x",)], "text string"
    )
    got = [(r["ngram"], r["n"]) for r in ngram_vocab(df, "text", n=2, top_k=3).collect()]
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_ngram_vocab_single_token_doc_is_safe(spark):
    df = spark.createDataFrame([("solo",), ("",)], "text string")
    assert ngram_vocab(df, "text", n=2, top_k=5).count() == 0


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("mail me at bob.smith+x@corp.example.org now", 1, 0, 0),
            ("call +1-555-0199 or 44-202-7946", 0, 2, 0),
            ("server at 10.0.0.1 is up", 0, 0, 1),
            ("clean text", 0, 0, 0),
        ],
        "text string, e int, p int, i int",
    )
    counts = pii_match_counts("text")
    got = df.select(
        counts["email"].alias("ge"),
        counts["phone"].alias("gp"),
        counts["ipv4"].alias("gi"),
        "e", "p", "i",
        redact_pii("text").alias("red"),
    ).collect()
    for r in got:
        assert (r["ge"], r["gp"], r["gi"]) == (r["e"], r["p"], r["i"]), r
        assert "@" not in r["red"] and "555" not in r["red"] and "10.0.0.1" not in r["red"]
    assert got[3]["red"] == "clean text"


def test_contamination_overlap_counts_shared_ngrams(spark):
    from hazelcast_jet_contrib_spark.operators.curation import contamination_overlap

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox sat"),   # shares 2 of its 3 3-grams
            (2, "a completely different doc here"),  # no overlap
            (3, "quick brown fox jumps high today"),  # shares 2
            (4, "hi"),                          # too short: no 3-grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["hits"], r["doc_ngrams"])
        for r in contamination_overlap(docs, bench, "doc_id", "text", n=3).collect()
    }
    # only contaminated docs appear
    assert got == {1: (2, 3), 3: (2, 4)}


def test_contamination_broadcasts_benchmark_side(spark):
    from hazelcast_jet_contrib_spark.operators.curation import contamination_overlap

    bench = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    docs = spark.createDataFrame([(2, "a b c e")], "doc_id long, text string")
    plan = contamination_overlap(docs, bench, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_stats_ratio(spark):
    from hazelcast_jet_contrib_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # 3 2-grams, all "spam spam" -> dup 2/3
            (2, "all distinct words here"),  # 3 distinct 2-grams -> 0
            (3, "x"),  # no 2-grams
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["ngrams"], r["distinct_ngrams"], r["dup_ratio"])
        for r in repetition_stats(docs, "doc_id", "text", n=2).collect()
    }
    assert got[1] == (3, 1, round(2 / 3, 6))
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (0, 0, 0.0)


def test_repetition_has_no_shuffle_or_python(spark):
    from hazelcast_jet_contrib_spark.operators.curation import repetition_stats

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = repetition_stats(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


def test_snapshot_diff_statuses_exact(spark):
    from hazelcast_jet_contrib_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C!"), (4, "d")], "k long, text string"
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, "k", ["text"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_joins_fingerprints_not_payloads(spark):
    # The join input must carry (key, md5) only: no text column may
    # survive below the join — at 100 TB the payload column is the row.
    from hazelcast_jet_contrib_spark.operators.curation import snapshot_diff

    old = spark.createDataFrame([(1, "a")], "k long, text string")
    new = spark.createDataFrame([(1, "a")], "k long, text string")
    plan = (
        snapshot_diff(old, new, "k", ["text"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    joins = plan.split("Join")[1:]
    assert joins, plan
    assert "md5" in plan


def test_chunk_documents_stride_overlap_and_short_docs(spark):
    from hazelcast_jet_contrib_spark.operators.curation import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "only three tokens"), (3, "x")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=10, stride=5)
    rows = {(r["id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: ceil((100-10)/5)+1 = 19 chunks; doc 2 and 3: one each
    assert len([k for k in rows if k[0] == 1]) == 19
    assert rows[(2, 0)]["chunk_text"] == "only three tokens"
    assert rows[(2, 0)]["n_tokens"] == 3
    assert rows[(3, 0)]["n_tokens"] == 1
    # overlap: chunk k starts at token 5k
    assert rows[(1, 0)]["chunk_text"].split()[:5] == ["w0", "w1", "w2", "w3", "w4"]
    assert rows[(1, 1)]["chunk_text"].split()[0] == "w5"
    # every full chunk has exactly chunk_tokens tokens; the tail may be short
    sizes = [rows[(1, i)]["n_tokens"] for i in range(19)]
    assert all(s == 10 for s in sizes[:-1]) and 0 < sizes[-1] <= 10
    # no shuffle: chunking is a pure linear transform
    a = audit(out)
    assert a.exchanges() == 0, a.plan


def test_quantize_symmetric_roundtrip_and_zero_vector(spark):
    from hazelcast_jet_contrib_spark.functions.vectors import quantize_symmetric

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r for r in quantize_symmetric(df, "vec_id", "embedding").collect()}
    # max|v|=1.0 -> scale ~ 1/127; q = round(v*127)
    assert out[1]["q"] == [64, -127, 32, 0]
    assert abs(out[1]["scale"] - 1.0 / 127) < 1e-6
    # reconstruction error bounded by scale/2 per element
    s = out[1]["scale"]
    for orig, q in zip([0.5, -1.0, 0.25, 0.0], out[1]["q"]):
        assert abs(orig - q * s) <= s / 2 + 1e-9
    # all-zero vector: no division blowup, quantizes to zeros
    assert out[2]["q"] == [0, 0, 0, 0]


def test_rarity_weighted_terms_ranks_rare_terms_first(spark):
    from hazelcast_jet_contrib_spark.operators.curation import rarity_weighted_terms

    df = spark.createDataFrame(
        [
            (1, "common common common zebra"),
            (2, "common words here"),
            (3, "common words again"),
        ],
        "doc_id long, text string",
    )
    out = rarity_weighted_terms(df, "doc_id", "text", top_k=2)
    top1 = {
        r["id"]: r["term"] for r in out.collect() if r["rank"] == 1
    }
    # 'zebra' (df=1) outranks 'common' (df=3) in doc 1 despite tf 1 vs 3:
    # rarity (3-1+0.5)/(1+0.5)=1.667 vs (3-3+0.5)/(3+0.5)=0.143
    assert top1[1] == "zebra"
    # deterministic tie-break: same score -> lexicographic term order
    again = rarity_weighted_terms(df, "doc_id", "text", top_k=2)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_unigram_lm_score_flags_rare_token_docs(spark):
    """The rare-token document must score strictly higher (more bits per
    token, higher mean inverse probability) than documents made of the
    corpus's common tokens; token counts are exact."""
    from hazelcast_jet_contrib_spark.operators.curation import unigram_lm_score

    rows = [(i, "the cat sat on the mat") for i in range(9)] + [
        (9, "zqx jvw qkp zqx")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in unigram_lm_score(df, "doc_id", "text").collect()}
    assert got[0]["n_tokens"] == 6 and got[9]["n_tokens"] == 4
    common = got[0]
    rare = got[9]
    assert rare["bits_per_token"] > common["bits_per_token"]
    assert rare["mean_inv_p"] > common["mean_inv_p"]
    # all nine common docs identical text -> identical scores
    assert len({round(got[i]["bits_per_token"], 9) for i in range(9)}) == 1


def test_unigram_lm_min_count_collapses_rare_tokens_to_oov(spark):
    """min_count bounds the broadcast model: tokens under the threshold
    score with the single OOV bucket's smoothed mass — every rare token
    gets the SAME probability, and no document is dropped."""
    from hazelcast_jet_contrib_spark.operators.curation import unigram_lm_score

    rows = [(i, "alpha beta gamma") for i in range(5)] + [
        (5, "unique1 unique2"),
        (6, "unique3 unique4"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: r
        for r in unigram_lm_score(df, "doc_id", "text", min_count=2).collect()
    }
    assert set(got) == set(range(7))  # OOV-only docs still scored
    # both all-OOV docs see identical per-token probability
    assert got[5]["bits_per_token"] == got[6]["bits_per_token"]
    assert got[5]["mean_inv_p"] == got[6]["mean_inv_p"]
    # and OOV mass is below any in-model token's probability
    assert got[5]["bits_per_token"] > got[0]["bits_per_token"]
    # the OOV bucket carries the collapsed tokens' AGGREGATED observed
    # mass: p_oov = (Σc_rare + α)/(N + α(V'+1)) = (4 + .5)/(19 + .5*4)
    assert abs(got[5]["mean_inv_p"] - 21.0 / 4.5) < 1e-9
    # in-model tokens use the bounded-vocabulary denominator too
    assert abs(got[0]["mean_inv_p"] - 21.0 / 5.5) < 1e-9


def test_crossdoc_duplicate_blocks_flags_shared_blocks(spark):
    """Two docs sharing their first 20-token block (and differing after)
    each get dup_blocks=1; a unique doc gets 0; block arithmetic matches
    chunk_documents (disjoint stride)."""
    from hazelcast_jet_contrib_spark.operators.curation import (
        crossdoc_duplicate_blocks,
    )

    shared = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(20))),
        (2, shared + " " + " ".join(f"b{i}" for i in range(20))),
        (3, " ".join(f"c{i}" for i in range(40))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["id"]: r for r in crossdoc_duplicate_blocks(df, "doc_id", "text").collect()}
    assert got[1]["n_blocks"] == 2 and got[1]["dup_blocks"] == 1
    assert got[2]["dup_blocks"] == 1 and abs(got[2]["dup_ratio"] - 0.5) < 1e-9
    assert got[3]["dup_blocks"] == 0 and got[3]["dup_ratio"] == 0.0
    # intra-doc repetition alone is NOT cross-doc duplication
    solo = spark.createDataFrame([(9, shared + " " + shared)], ["doc_id", "text"])
    r = crossdoc_duplicate_blocks(solo, "doc_id", "text").collect()[0]
    assert r["dup_blocks"] == 0


def test_temperature_resample_levels_groups(spark):
    """T=0: every group levels to ~the smallest group's size; T=1 keeps
    everything; T=0.5 lands between, monotone in group size; the
    smallest group always keeps every row; accept decisions are
    deterministic across runs."""
    from hazelcast_jet_contrib_spark.operators.curation import temperature_resample

    rows = (
        [(i, "big") for i in range(400)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "grp"])

    t1 = temperature_resample(df, "grp", "doc_id", temperature=1.0)
    assert t1.count() == len(rows)  # T=1: no resampling

    t0 = {
        r["grp"]: r["n"]
        for r in temperature_resample(df, "grp", "doc_id", temperature=0.0)
        .groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert t0["small"] == 25  # smallest group intact
    # hash acceptance is binomial around rate*n; allow generous slack
    assert 10 <= t0["big"] <= 45 and 12 <= t0["mid"] <= 42

    th = {
        r["grp"]: r["n"]
        for r in temperature_resample(df, "grp", "doc_id", temperature=0.5)
        .groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert th["small"] == 25
    assert t0["big"] <= th["big"] <= 400  # T=0.5 keeps more than T=0
    # determinism: identical output set on a second run
    a = {r["doc_id"] for r in temperature_resample(df, "grp", "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in temperature_resample(df, "grp", "doc_id", 0.5).collect()}
    assert a == b


def test_training_shard_export_round_trip(spark, tmp_path):
    """The export path a training run actually consumes: pack documents
    to a token budget, physically write partitioned by shard with
    maxRecordsPerFile bounding file sizes, and read back.
    - content round-trips exactly (no row lost or duplicated),
    - every (shard, pack_id) respects the token budget (or is a single
      oversized doc),
    - partition pruning works on the written layout: reading one shard
      scans only that shard's directory,
    - file count per shard is bounded by ceil(rows/maxRecordsPerFile)."""
    from hazelcast_jet_contrib_spark.operators.curation import pack_token_budget

    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .withColumn("n_tok", F.size(F.split(F.trim("text"), r"\s+")))
    )
    packed = pack_token_budget(docs, "doc_id", "n_tok", budget=2048, n_shards=8)
    out = str(tmp_path / "shards")
    (
        packed.write.mode("overwrite")
        .option("maxRecordsPerFile", 50)
        .partitionBy("shard")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    # exact content round-trip
    assert back.count() == docs.count()
    assert (
        packed.select("doc_id", "shard", "pack_id")
        .exceptAll(back.select("doc_id", "shard", "pack_id"))
        .count()
        == 0
    )
    # packing invariant under first-fit-with-overflow: every doc's
    # shard-cumulative-before lies inside its pack's budget window, so a
    # pack minus its LAST doc (highest key order) is always under
    # budget — the last doc may straddle the boundary by design
    bad = (
        back.groupBy("shard", "pack_id")
        .agg(
            F.sum("n_tok").alias("t"),
            F.max_by("n_tok", "doc_id").alias("last_tok"),
        )
        .filter(F.col("t") - F.col("last_tok") >= 2048)
    )
    assert bad.count() == 0
    # partition pruning on the written layout
    one = back.filter(F.col("shard") == 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    import glob
    import math
    import os

    for d in glob.glob(os.path.join(out, "shard=*")):
        n_rows = back.filter(F.col("shard") == int(d.split("=")[1])).count()
        n_files = len(glob.glob(os.path.join(d, "*.parquet")))
        assert n_files <= max(1, math.ceil(n_rows / 50) + 1), (d, n_rows, n_files)


def test_temperature_resample_null_group_and_large_ids(spark):
    """NULL is a real group: at T=1 every row survives, NULL-group rows
    included (a plain equi-join would silently drop them); and ids past
    the signed-64-bit Knuth overflow point still get a well-defined
    hash decision (the raw product would go negative and accept
    everything)."""
    from hazelcast_jet_contrib_spark.operators.curation import temperature_resample

    rows = [(i, "en") for i in range(100)] + [(1000 + i, None) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    t1 = temperature_resample(df, "grp", "doc_id", temperature=1.0)
    assert t1.count() == 110, "T=1 must keep every row, NULL group included"
    assert t1.filter(F.col("grp").isNull()).count() == 10

    big = spark.createDataFrame(
        [(4_000_000_000 + i, "a") for i in range(50)]
        + [(i, "b") for i in range(500)],
        "doc_id long, grp string",
    )
    out = temperature_resample(big, "grp", "doc_id", temperature=0.0)
    a = out.filter(F.col("grp") == "b").count()
    # T=0 levels group b (500 rows) down toward the min group (50):
    # a negative-hash bug would accept everything in any group with
    # large ids and break the leveling of normal groups not at all —
    # so assert the LEVELING actually happened on the big-id group's
    # baseline: group b keeps roughly 50/500 = 10%
    assert a < 150, f"group b kept {a} of 500 at T=0 — leveling broken"
    assert out.filter(F.col("grp") == "a").count() == 50, "min group intact"


def test_duplicate_spans_finds_maximal_planted_span(spark):
    """Plant a verbatim 12-token run inside two otherwise-distinct
    documents: duplicate_spans(shingle=8) must return exactly ONE
    maximal span per doc covering the full 12 tokens (positions of the
    run), not one span per duplicated shingle, and no spans for a
    clean third document."""
    from hazelcast_jet_contrib_spark.operators.curation import duplicate_spans

    shared = " ".join(f"dup{i}" for i in range(12))
    rows = [
        # doc 1: 5 unique tokens, then the shared run at positions 5..16
        (1, " ".join(f"a{i}" for i in range(5)) + " " + shared + " tail1 tail2"),
        # doc 2: shared run at positions 0..11
        (2, shared + " " + " ".join(f"b{i}" for i in range(6))),
        (3, " ".join(f"c{i}" for i in range(20))),  # clean
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, "doc_id", "text", shingle_tokens=8, min_docs=2)
    got = {r["id"]: (r["span_start"], r["span_end"], r["span_tokens"])
           for r in out.collect()}
    assert got == {1: (5, 16, 12), 2: (0, 11, 12)}


def test_duplicate_spans_merges_adjacent_and_splits_gapped_runs(spark):
    """Two shared runs separated by unique text in the same document
    must come back as TWO spans (the gap breaks the island); a doc
    shorter than one shingle yields nothing."""
    from hazelcast_jet_contrib_spark.operators.curation import duplicate_spans

    run_a = " ".join(f"x{i}" for i in range(9))
    run_b = " ".join(f"y{i}" for i in range(8))
    rows = [
        (1, run_a + " gap1 gap2 gap3 " + run_b),
        (2, run_a + " " + " ".join(f"m{i}" for i in range(4)) + " " + run_b),
        (3, "tiny doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = duplicate_spans(df, "doc_id", "text", shingle_tokens=8, min_docs=2)
    spans1 = sorted(
        (r["span_start"], r["span_end"]) for r in out.filter("id = 1").collect()
    )
    # doc 1: run_a at 0..8, run_b at 12..19 -> two distinct islands
    assert spans1 == [(0, 8), (12, 19)]
    assert out.filter("id = 3").count() == 0


def test_remove_spans_cuts_planted_duplicates_and_passes_clean_docs(spark):
    """End-to-end find+cut: duplicate_spans locates the shared run,
    remove_spans removes exactly those tokens; clean docs pass through
    untouched with removed=0."""
    from hazelcast_jet_contrib_spark.operators.curation import (
        duplicate_spans,
        remove_spans,
    )

    shared = " ".join(f"dup{i}" for i in range(10))
    rows = [
        (1, "u1 u2 " + shared + " u3"),
        (2, shared + " v1 v2 v3"),
        (3, " ".join(f"c{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = duplicate_spans(df, "doc_id", "text", shingle_tokens=8, min_docs=2)
    out = {
        r["id"]: (r["cleaned_text"], r["n_tokens_kept"], r["n_tokens_removed"])
        for r in remove_spans(df, spans, "doc_id", "text").collect()
    }
    assert out[1] == ("u1 u2 u3", 3, 10)
    assert out[2] == ("v1 v2 v3", 3, 10)
    assert out[3] == (" ".join(f"c{i}" for i in range(15)), 15, 0)


def test_remove_spans_unions_overlapping_islands(spark):
    """Two islands whose token intervals overlap (gap shorter than the
    shingle) must be cut as their UNION — no token removed twice, no
    covered token kept."""
    from hazelcast_jet_contrib_spark.operators.curation import (
        duplicate_spans,
        remove_spans,
    )

    run_a = " ".join(f"x{i}" for i in range(8))
    run_b = " ".join(f"y{i}" for i in range(8))
    # doc 1: run_a, 2-token gap, run_b -> islands at positions 0 and 10;
    # spans [0,7] and [10,17]; the gap tokens g1 g2 survive
    rows = [
        (1, run_a + " g1 g2 " + run_b),
        (2, run_a + " m1 m2 m3 " + run_b),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    spans = duplicate_spans(df, "doc_id", "text", shingle_tokens=8, min_docs=2)
    out = {
        r["id"]: (r["cleaned_text"], r["n_tokens_removed"])
        for r in remove_spans(df, spans, "doc_id", "text").collect()
    }
    assert out[1] == ("g1 g2", 16)
    assert out[2] == ("m1 m2 m3", 16)


def test_remove_spans_matches_duckdb_on_documents(spark):
    """Cross-engine mirror of the find+cut composition on the real
    documents table at the correctness SF — the same check the driver
    gate will run once dup_span_removal enters the checked window."""
    from tests.conftest import CORRECTNESS_SF, _norm, duck_con

    from hazelcast_jet_contrib_spark.operators.curation import (
        duplicate_spans,
        remove_spans,
    )
    from hazelcast_jet_contrib_spark.registry import table

    docs = table(spark, CORRECTNESS_SF, "documents")
    spans = duplicate_spans(docs, "doc_id", "text", shingle_tokens=8, min_docs=2)
    sdf = remove_spans(docs, spans, "doc_id", "text")
    spark_rows = sorted(
        (r["id"], r["cleaned_text"], r["n_tokens_kept"], r["n_tokens_removed"])
        for r in sdf.collect()
    )

    con = duck_con(CORRECTNESS_SF)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS s
        FROM toks, unnest(generate_series(1, len(t) - 7)) AS g(i)
        WHERE len(t) >= 8
    ),
    counts AS (SELECT s, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY s),
    dup AS (
        SELECT sh.doc_id, sh.pos FROM sh JOIN counts USING (s) WHERE nd >= 2
    ),
    covered AS (
        SELECT DISTINCT doc_id, pos + off AS cpos
        FROM dup, unnest(generate_series(0, 7)) AS o(off)
    ),
    kept AS (
        SELECT toks.doc_id, i - 1 AS pos, t[i] AS tok
        FROM toks, unnest(generate_series(1, len(t))) AS g(i)
        WHERE NOT EXISTS (
            SELECT 1 FROM covered c
            WHERE c.doc_id = toks.doc_id AND c.cpos = i - 1
        )
    ),
    agg AS (
        SELECT doc_id,
               COALESCE(string_agg(tok, ' ' ORDER BY pos), '') AS cleaned_text,
               COUNT(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id AS id,
           COALESCE(agg.cleaned_text, '') AS cleaned_text,
           CAST(COALESCE(agg.n_kept, 0) AS INT) AS n_tokens_kept,
           CAST(len(toks.t) - COALESCE(agg.n_kept, 0) AS INT)
               AS n_tokens_removed
    FROM toks LEFT JOIN agg USING (doc_id)
    """).fetchall()
    )
    assert len(spark_rows) == len(duck_rows)
    assert spark_rows == duck_rows


def test_remove_spans_plan_is_pure_catalyst(spark):
    """The cut pass must never explode documents or leave codegen:
    zero Python stages, and the only exploded relation is the span
    side (covered positions)."""
    from hazelcast_jet_contrib_spark.operators.curation import (
        duplicate_spans,
        remove_spans,
    )
    from hazelcast_jet_contrib_spark.plans.audit import audit
    from hazelcast_jet_contrib_spark.registry import table
    from tests.conftest import SMOKE_SF

    docs = table(spark, SMOKE_SF, "documents")
    spans = duplicate_spans(docs, "doc_id", "text", shingle_tokens=8, min_docs=2)
    a = audit(remove_spans(docs, spans, "doc_id", "text"))
    assert a.python_stages() == 0 and a.arrow_python_stages() == 0
    # Generates allowed: the shingle posexplode (appears on BOTH sides
    # of the count join — unpersisted lineage, two numbered nodes) and
    # the covered-position explode. The document token arrays stay
    # packed inside higher-order functions: a 4th Generate means a
    # corpus-sized explode leaked in.
    import re
    gens = len(re.findall(r"^\(\d+\) Generate", a.plan, re.M))
    assert gens <= 3, f"document-side explode leaked in: {gens} Generate nodes"


def test_mix_to_target_hits_weights_and_is_deterministic(spark):
    """Rebalance a 3-source corpus to explicit 60/30/10: the binding
    group keeps everything, achieved shares land within sampling noise
    of the targets, and every accept decision replays exactly (pure
    hash, no RNG)."""
    from hazelcast_jet_contrib_spark.operators.curation import mix_to_target

    rows = (
        [(i, "web") for i in range(6000)]
        + [(10_000 + i, "code") for i in range(1200)]
        + [(20_000 + i, "ref") for i in range(2000)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_to_target(
        df, "source", "doc_id", {"web": 0.6, "code": 0.3, "ref": 0.1}
    )
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # binding group is code: N = min(6000/.6, 1200/.3, 2000/.1) = 4000
    assert got["code"] == 1200, got  # rate 1.0 -> kept exactly
    assert abs(got["web"] - 2400) < 150, got   # 0.6 * 4000
    assert abs(got["ref"] - 400) < 80, got     # 0.1 * 4000
    # deterministic replay: identical result set
    again = mix_to_target(
        df, "source", "doc_id", {"web": 0.6, "code": 0.3, "ref": 0.1}
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mix_to_target_drops_untargeted_groups_and_validates(spark):
    import pytest

    from hazelcast_jet_contrib_spark.operators.curation import mix_to_target

    df = spark.createDataFrame(
        [(1, "web"), (2, "spam"), (3, "web")], "doc_id long, source string"
    )
    out = mix_to_target(df, "source", "doc_id", {"web": 1.0})
    assert {r["source"] for r in out.collect()} == {"web"}
    with pytest.raises(ValueError):
        mix_to_target(df, "source", "doc_id", {})
    with pytest.raises(ValueError):
        mix_to_target(df, "source", "doc_id", {"web": -1.0})
    # a positive-weight target group absent from the data is an ERROR
    # (almost certainly a typo'd group name), never a silent re-mix
    with pytest.raises(ValueError, match="news"):
        mix_to_target(df, "source", "doc_id", {"news": 1.0})
    # the partially-missing case from the round-6 review: {web, code}
    # targeted but no 'code' rows — previously returned 100% web at
    # full size, a silently wrong training mixture
    with pytest.raises(ValueError, match="code"):
        mix_to_target(df, "source", "doc_id", {"web": 0.5, "code": 0.5})


def test_mix_to_target_is_scan_level_filter(spark):
    """The sampling pass itself must plan as a pure filter over the
    scan — zero exchanges, zero Python (the count aggregation is a
    separate tiny pre-pass, same design as stratified_sample)."""
    from hazelcast_jet_contrib_spark.operators.curation import mix_to_target
    from hazelcast_jet_contrib_spark.plans.audit import audit
    from hazelcast_jet_contrib_spark.registry import table
    from tests.conftest import SMOKE_SF

    docs = table(spark, SMOKE_SF, "documents")
    out = mix_to_target(docs, "source", "doc_id", {"src0": 0.5, "src1": 0.5})
    a = audit(out)
    assert a.exchanges() == 0, f"sampling pass grew a shuffle: {a.exchanges()}"
    assert a.python_stages() == 0 and a.arrow_python_stages() == 0


def test_bigram_lm_exact_probabilities_tiny_corpus(spark):
    """Pin the smoothed interpolated probabilities by hand on a 2-doc
    corpus: every count, denominator, and interpolation weight checked
    against closed-form arithmetic."""
    import math

    from hazelcast_jet_contrib_spark.operators.curation import bigram_lm_score

    # corpus tokens: d1 = [a, b], d2 = [a, b]  ->  N=4, V=2
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["id"]: r for r in
           bigram_lm_score(df, "doc_id", "text", alpha=0.5, interp=0.7).collect()}
    N, V, a = 4, 2, 0.5
    p_a = (2 + a) / (N + a * V)          # unigram p(a)
    p_b = (2 + a) / (N + a * V)          # unigram p(b)
    p_b_given_a = (2 + a) / (2 + a * V)  # bigram c(a,b)=2, c(a)=2
    p2 = 0.7 * p_b_given_a + 0.3 * p_b
    expect_bits = (-math.log2(p_a) - math.log2(p2)) / 2
    expect_inv = (1 / p_a + 1 / p2) / 2
    for i in (1, 2):
        r = out[i]
        assert r["n_tokens"] == 2
        assert abs(r["bits_per_token"] - expect_bits) < 1e-9, r
        assert abs(r["mean_inv_p"] - expect_inv) < 1e-9, r


def test_bigram_lm_flags_shuffled_word_salad_unigram_cannot(spark):
    """The motivating case: a document built from COMMON tokens in
    never-seen transitions must score materially worse (higher bits)
    than the fluent documents its unigram profile matches."""
    from hazelcast_jet_contrib_spark.operators.curation import (
        bigram_lm_score,
        unigram_lm_score,
    )

    fluent = [(i, "the cat sat on the mat " * 4) for i in range(1, 9)]
    salad = [(100, "mat the on sat the cat " * 4)]  # same tokens, alien bigrams
    df = spark.createDataFrame(fluent + salad, "doc_id long, text string")

    bg = {r["id"]: r["bits_per_token"]
          for r in bigram_lm_score(df, "doc_id", "text").collect()}
    ug = {r["id"]: r["bits_per_token"]
          for r in unigram_lm_score(df, "doc_id", "text").collect()}
    # unigram is blind: identical token multiset -> identical score
    assert abs(ug[100] - ug[1]) < 1e-9
    # bigram separates by a real margin
    assert bg[100] > bg[1] + 0.5, (bg[100], bg[1])


def test_bigram_lm_single_token_and_empty_docs(spark):
    from hazelcast_jet_contrib_spark.operators.curation import bigram_lm_score

    df = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b a")], "doc_id long, text string"
    )
    out = {r["id"]: r["n_tokens"]
           for r in bigram_lm_score(df, "doc_id", "text").collect()}
    assert out[1] == 1      # unigram-only first token
    assert 2 not in out     # empty doc: no tokens, no row
    assert out[3] == 3


def test_bigram_lm_matches_duckdb_on_documents(spark):
    """Cross-engine mirror on the real documents table: n_tokens and
    the rational mean_inv_p (no libm) replayed exactly by a DuckDB
    replica — the oracle shape bigram_lm will register with next
    rotation."""
    from tests.conftest import CORRECTNESS_SF, duck_con

    from hazelcast_jet_contrib_spark.operators.curation import bigram_lm_score
    from hazelcast_jet_contrib_spark.registry import table

    docs = table(spark, CORRECTNESS_SF, "documents")
    sdf = bigram_lm_score(docs, "doc_id", "text", alpha=0.5, interp=0.7)
    spark_rows = sorted(
        (r["id"], r["n_tokens"], round(r["mean_inv_p"], 4)) for r in sdf.collect()
    )

    con = duck_con(CORRECTNESS_SF)
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '') AS t
        FROM documents
    ),
    uni AS (
        SELECT doc_id, unnest(t) AS tok FROM toks
    ),
    uc AS (SELECT tok, COUNT(*) AS cu FROM uni GROUP BY tok),
    tot AS (SELECT SUM(cu) AS n, COUNT(*) AS v FROM uc),
    big AS (
        SELECT doc_id, t[i-1] AS prev, t[i] AS cur
        FROM toks, unnest(generate_series(2, len(t))) AS g(i)
        WHERE len(t) >= 2
    ),
    bc AS (SELECT prev, cur, COUNT(*) AS cb FROM big GROUP BY prev, cur),
    firsts AS (
        SELECT doc_id, (uc.cu + 0.5) / (tot.n + 0.5 * tot.v) AS p
        FROM toks, uc, tot
        WHERE len(t) >= 1 AND uc.tok = t[1]
    ),
    rest AS (
        SELECT big.doc_id,
               0.7 * ((bc.cb + 0.5) / (up.cu + 0.5 * tot.v))
             + 0.3 * ((ucur.cu + 0.5) / (tot.n + 0.5 * tot.v)) AS p
        FROM big
        JOIN bc USING (prev, cur)
        JOIN uc up ON up.tok = big.prev
        JOIN uc ucur ON ucur.tok = big.cur
        CROSS JOIN tot
    ),
    allp AS (SELECT * FROM firsts UNION ALL SELECT * FROM rest)
    SELECT doc_id AS id, CAST(COUNT(*) AS INT) AS n_tokens,
           ROUND(AVG(1.0 / p), 4) AS mean_inv_p
    FROM allp GROUP BY doc_id
    """).fetchall()
    )
    assert len(spark_rows) == len(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(spark_rows, duck_rows) if a != b
    ]
    assert not mismatches, mismatches[:3]


def test_mix_to_target_zero_weight_groups(spark):
    """A zero-weight target drops its group without crashing the
    binding-group computation; an absent ZERO-weight group is fine
    (nothing to drop), but an absent positive-weight group raises."""
    import pytest

    from hazelcast_jet_contrib_spark.operators.curation import mix_to_target

    df = spark.createDataFrame(
        [(i, "web") for i in range(10)] + [(100 + i, "code") for i in range(10)],
        "doc_id long, source string",
    )
    out = mix_to_target(df, "source", "doc_id", {"web": 0.0, "code": 1.0})
    srcs = {r["source"] for r in out.collect()}
    assert srcs == {"code"}
    # absent zero-weight group: no error (its only effect — dropping
    # rows — is a no-op), full positive-weight group survives
    ok = mix_to_target(df, "source", "doc_id", {"spam": 0.0, "code": 1.0, "web": 0.0})
    assert {r["source"] for r in ok.collect()} == {"code"}
    assert ok.count() == 10
    # the positive-weight group being the absent one raises
    with pytest.raises(ValueError, match="code"):
        mix_to_target(
            df.filter("source = 'web'"), "source", "doc_id", {"web": 0.0, "code": 1.0}
        )


def test_quality_ensemble_separates_planted_junk(spark):
    """Ensemble of unigram + bigram bits-per-token (both lower-better)
    must rank every planted word-salad/rare-token doc below every real
    doc, even though EACH single signal has failure modes."""
    import random

    from hazelcast_jet_contrib_spark.operators.curation import (
        bigram_lm_score,
        quality_ensemble,
        unigram_lm_score,
    )
    from hazelcast_jet_contrib_spark.registry import table
    from tests.conftest import CORRECTNESS_SF

    rng = random.Random(3)
    base = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    # junk 1: rare-token noise (unigram catches)
    noise = [
        (900_000 + i, " ".join(f"x{rng.randrange(10**9)}" for _ in range(25)))
        for i in range(10)
    ]
    corpus = base.unionByName(
        spark.createDataFrame(noise, "doc_id long, text string")
    )
    uni = unigram_lm_score(corpus, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.col("bits_per_token").alias("uni_bits")
    )
    bi = bigram_lm_score(corpus, "doc_id", "text").select(
        F.col("id").alias("doc_id"), F.col("bits_per_token").alias("bi_bits")
    )
    sig = uni.join(bi, "doc_id")
    out = {
        r["doc_id"]: r["quality"]
        for r in quality_ensemble(
            sig, "doc_id", {"uni_bits": -1, "bi_bits": -1}
        ).collect()
    }
    worst_real = min(v for k, v in out.items() if k < 900_000)
    best_junk = max(v for k, v in out.items() if k >= 900_000)
    assert best_junk < worst_real, (best_junk, worst_real)


def test_quality_ensemble_directions_and_validation(spark):
    from hazelcast_jet_contrib_spark.operators.curation import quality_ensemble

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "doc_id long, m double"
    )
    hi = {r["doc_id"]: r["quality"] for r in
          quality_ensemble(df, "doc_id", {"m": 1}).collect()}
    lo = {r["doc_id"]: r["quality"] for r in
          quality_ensemble(df, "doc_id", {"m": -1}).collect()}
    assert hi[3] > hi[1] and lo[1] > lo[3]
    assert all(abs(hi[k] + lo[k]) < 1e-9 for k in hi), "sign-symmetric"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        quality_ensemble(df, "doc_id", {})
    with _pytest.raises(ValueError):
        quality_ensemble(df, "doc_id", {"m": 2})
    with _pytest.raises(ValueError):
        quality_ensemble(df, "doc_id", {"nope": 1})
    with _pytest.raises(ValueError):
        quality_ensemble(df, "doc_id", {"m": 1}, weights={"other": 1.0})

"""Persisted MinHash-LSH index tests: build-once/probe-many recall on
planted near-dups, exact-Jaccard verification parity, bucket-predicate
pushdown at the probe scan, and parameter-sidecar round-trip."""

from __future__ import annotations

import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.dedup import (
    build_minhash_index,
    jaccard_pairs,
    probe_minhash_index,
)
from hazelcast_jet_contrib_spark.registry import table
from tests.conftest import CORRECTNESS_SF


@pytest.fixture(scope="module")
def mh_index(spark):
    docs = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="mhidx_")
    build_minhash_index(docs, path)
    yield docs, path
    shutil.rmtree(path, ignore_errors=True)


def _probes(docs):
    return docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy")).alias("text"),
    )


def test_probe_finds_planted_near_dups_and_verifies_exactly(spark, mh_index):
    docs, path = mh_index
    out = probe_minhash_index(spark, path, _probes(docs), threshold=0.6)
    rows = out.collect()
    hits = {(r["probe_id"], r["corpus_id"]) for r in rows}
    planted = {(d + 5_000_000, d) for d in range(0, 500, 97)}
    assert planted <= hits, f"missing planted pairs: {planted - hits}"
    # verification is EXACT jaccard on hashed shingles: every reported
    # pair must also pass the exact pair computation on raw text
    aug = docs.unionByName(_probes(docs))
    exact = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in jaccard_pairs(aug, "doc_id", "text", threshold=0.6).collect()
    }
    for p, c in hits:
        assert tuple(sorted((p, c))) in exact, (p, c)
    assert all(0.6 <= r["jaccard"] <= 1.0 for r in rows)


def test_probe_scan_pushes_bucket_predicate(spark, mh_index):
    # since r18 the band scan runs in the bounded candidate-pair job,
    # not the returned verify plan — the pin asserts on the EXECUTED
    # candidate plan via the probe's observability seam
    docs, path = mh_index
    obs: dict = {}
    out = probe_minhash_index(
        spark, path, _probes(docs), threshold=0.6, _observe=obs
    )
    out.collect()
    plan = obs["candidates"]._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PushedFilters: \[([^\]]*)", plan)
    assert m and "In(bh" in m.group(1), (
        "probe must push the bh bucket-key IN-predicate to the index scan "
        "(row-group pruning on the sorted column)"
    )


def test_probe_is_repeatable_without_rebuild(spark, mh_index):
    docs, path = mh_index
    a = {
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, _probes(docs)).collect()
    }
    b = {
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, _probes(docs)).collect()
    }
    assert a == b and a


def test_probe_threshold_filters(spark, mh_index):
    docs, path = mh_index
    # unrelated probes (reversed word soup from other docs' ids) find nothing
    unrelated = docs.filter(F.col("doc_id") % 97 == 1).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"),
        F.reverse("text").alias("text"),
    )
    out = probe_minhash_index(spark, path, unrelated, threshold=0.6).collect()
    assert out == []


def test_incremental_append_probes_across_old_and_new(spark, tmp_path):
    """Index half the corpus, append the other half as a delta, then
    probe: planted near-dups of BOTH halves are found, and the probe
    still pushes its bucket predicate (pruning applies to old and new
    files alike)."""
    from hazelcast_jet_contrib_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
    )

    docs = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") < 250)
    new = docs.filter(F.col("doc_id") >= 250)
    path = str(tmp_path / "idx")
    build_minhash_index(old, path)
    append_to_minhash_index(new, path)

    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy")).alias("text"),
    )
    obs: dict = {}
    out = probe_minhash_index(spark, path, probes, threshold=0.6, _observe=obs)
    hits = {(r["probe_id"], r["corpus_id"]) for r in out.collect()}
    planted = {(d + 5_000_000, d) for d in range(0, 500, 97)}
    assert planted <= hits, f"missing: {planted - hits}"
    # both halves contribute (97*2=194 < 250 <= 291)
    assert any(c < 250 for _, c in hits) and any(c >= 250 for _, c in hits)
    plan = obs["candidates"]._jdf.queryExecution().executedPlan().toString()
    assert "In(bh" in plan


def test_compaction_is_probe_identical_and_reduces_files(spark, tmp_path):
    """The append-epoch lifecycle (VERDICT r08 item 7): build + 3 delta
    appends accumulate one file per band per epoch; compaction must (a)
    cut the per-band file count back to one sorted run, (b) leave probe
    results EXACTLY identical — for any split of the corpus into base +
    deltas — and (c) keep the bucket predicate pushed."""
    from hazelcast_jet_contrib_spark.operators.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        compact_minhash_index,
    )

    docs = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    build_minhash_index(docs.filter(F.col("doc_id") < 125), path)
    for lo, hi in ((125, 250), (250, 375), (375, 10**9)):
        append_to_minhash_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), path
        )

    probes = _probes(docs)
    before = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    stats = compact_minhash_index(spark, path)
    assert stats["files_after"] < stats["files_before"], stats
    obs: dict = {}
    out = probe_minhash_index(spark, path, probes, threshold=0.6, _observe=obs)
    after = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"]) for r in out.collect()
    )
    assert after == before, "compaction changed probe results"
    assert before, "vacuous: no probe hits at all"
    plan = obs["candidates"]._jdf.queryExecution().executedPlan().toString()
    assert "In(bh" in plan, "bucket predicate no longer pushed after compaction"
    # idempotent: a second compaction converges (crash-mid-swap story)
    stats2 = compact_minhash_index(spark, path)
    assert stats2["files_after"] <= stats["files_after"]
    again = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    assert again == before


def test_compaction_repairs_crash_window_parked_band(spark, tmp_path):
    """The two-rename swap's crash window (ADVICE r09): a compaction
    that dies between rename(live -> _trash/band=N) and
    rename(staging -> live) leaves that band's ONLY copy parked under
    the ignored _trash dir. Probes in that window legitimately miss
    the band (documented gap); the repair contract is that the NEXT
    compaction restores the parked band before reading — no rows are
    ever lost to a re-run."""
    import os

    from hazelcast_jet_contrib_spark.operators.dedup import (
        compact_minhash_index,
    )

    docs = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path)
    probes = _probes(docs)
    want = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    assert want, "vacuous: no probe hits"

    # simulate the crash: one band parked in _trash, absent from live
    bands = sorted(
        d for d in os.listdir(path) if d.startswith("band=")
    )
    victim = bands[len(bands) // 2]
    os.makedirs(os.path.join(path, "_trash"), exist_ok=True)
    os.rename(
        os.path.join(path, victim), os.path.join(path, "_trash", victim)
    )
    # the parked copy is invisible to partition discovery (probe runs,
    # just with that band's candidates missing — no error, fewer rows)
    degraded = probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    assert len(degraded) <= len(want)

    compact_minhash_index(spark, path)  # repair + converge
    got = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    assert got == want, "repair lost rows from the parked band"
    assert not os.path.exists(os.path.join(path, "_trash"))


def test_compaction_rejects_remote_uris(spark):
    from hazelcast_jet_contrib_spark.operators.dedup import (
        compact_minhash_index,
    )

    with pytest.raises(ValueError, match="driver-local"):
        compact_minhash_index(spark, "s3a://bucket/minhash_index")


def test_probe_side_collect_is_capped_with_clear_error(spark, mh_index):
    """The probe side materializes on the driver (that is what makes it
    a broadcast): the boundedness contract is enforced — an oversized
    probe set raises with a swap-sides instruction instead of silently
    collecting a corpus (VERDICT r09 item 6)."""
    docs, path = mh_index
    with pytest.raises(ValueError, match="[Ss]wap sides"):
        probe_minhash_index(
            spark, path, _probes(docs), threshold=0.6, max_probe_band_rows=3
        )
    with pytest.raises(ValueError, match="max_probe_band_rows"):
        probe_minhash_index(
            spark, path, _probes(docs), threshold=0.6, max_probe_band_rows=0
        )


def test_unified_layout_band_rows_narrow_and_sets_written_once(spark, mh_index):
    """r17 unified layout: the verification set ``hs`` must NOT ride
    the band unpivot ×bands anymore — band rows (band >= 0) carry NULL
    hs, and the band=-1 sets partition holds exactly one (id, hs) row
    per indexed document."""
    docs, path = mh_index
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"id", "band", "bh", "hs"}
    assert idx.filter((F.col("band") >= 0) & F.col("hs").isNotNull()).count() == 0
    sets = idx.filter(F.col("band") < 0)
    assert sets.filter(F.col("hs").isNull()).count() == 0
    n_docs = docs.filter(F.length(F.trim("text")) > 0).count()
    assert 0 < sets.count() <= n_docs  # <=: docs under 3 words have no row
    assert sets.groupBy("id").count().filter("count > 1").count() == 0


def test_probe_pushes_candidate_id_predicate_into_sets_scan(spark, mh_index):
    """The sets re-attach must stay bounded the same way the band scan
    does: the candidate `id IN (...)` predicate reaches the band=-1
    sets scan (row-group pruning on the id-sorted run)."""
    docs, path = mh_index
    obs: dict = {}
    out = probe_minhash_index(
        spark, path, _probes(docs), threshold=0.6, _observe=obs
    )
    out.collect()
    # the returned verify plan scans ONLY the sets run since r18: the
    # candidate-id pushdown lives there, the bucket pushdown in the
    # executed candidate job (observability seam)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)", plan)
    assert any("In(id" in p for p in pushed), (
        "probe must push the candidate-id IN-predicate into the sets scan"
    )
    assert not any("In(bh" in p for p in pushed), (
        "the returned verify plan must not re-scan the band partitions"
    )
    cplan = obs["candidates"]._jdf.queryExecution().executedPlan().toString()
    assert "In(bh" in cplan, cplan[:2000]


def test_probe_candidate_id_collect_is_capped_with_clear_error(spark, mh_index):
    """Second boundedness contract of the split layout (the probe-side
    collect's twin): the candidate-id collect that drives the sets
    scan's pruning raises loudly when a flooded bucket blows the cap,
    instead of silently shipping a corpus-sized id list."""
    docs, path = mh_index
    with pytest.raises(ValueError, match="candidate set exceeds"):
        probe_minhash_index(
            spark, path, _probes(docs), threshold=0.6, max_candidate_ids=1
        )
    with pytest.raises(ValueError, match="max_candidate_ids"):
        probe_minhash_index(
            spark, path, _probes(docs), threshold=0.6, max_candidate_ids=0
        )


def test_compaction_repairs_crash_window_parked_sets_partition(spark, tmp_path):
    """The band=-1 sets run shares the bands' two-rename protocol: a
    compaction that dies inside ITS swap window leaves the only sets
    copy parked under _trash — probes in that window degrade (every
    candidate loses its verification set, so fewer/zero rows, same
    documented gap class as a parked band); the next compaction
    restores the parked run before reading — no rows lost."""
    import os

    from hazelcast_jet_contrib_spark.operators.dedup import (
        compact_minhash_index,
    )

    docs = table(spark, CORRECTNESS_SF, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path)
    probes = _probes(docs)
    want = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    assert want, "vacuous: no probe hits"

    os.makedirs(os.path.join(path, "_trash"), exist_ok=True)
    os.rename(
        os.path.join(path, "band=-1"), os.path.join(path, "_trash", "band=-1")
    )
    degraded = probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    assert len(degraded) < len(want)

    compact_minhash_index(spark, path)  # repair + converge
    got = sorted(
        (r["probe_id"], r["corpus_id"], r["jaccard"])
        for r in probe_minhash_index(spark, path, probes, threshold=0.6).collect()
    )
    assert got == want, "repair lost rows from the parked sets run"
    assert not os.path.exists(os.path.join(path, "_trash"))


def test_index_files_physically_sorted(spark, mh_index):
    """r17: the epoch sort LEADS with the partition column, so the
    dynamic-partition writer preserves the secondary order — band
    files non-decreasing in bh, the band=-1 sets run non-decreasing in
    id. (The former sortWithinPartitions("bh") was silently destroyed
    by the writer's own re-sort on `band`: 0/32 band files were
    actually bh-sorted, making row-group min/max pruning ineffective.)
    Single-file reads collect in file order (one partition, no
    shuffle), so the assertion observes on-disk order directly."""
    import glob
    import os

    import json

    _docs, path = mh_index
    with open(os.path.join(path, "_minhash_params.json")) as f:
        n_bands = json.load(f)["bands"]
    checked = 0
    for d in sorted(glob.glob(os.path.join(path, "band=*"))):
        col = "id" if os.path.basename(d) == "band=-1" else "bh"
        for fpath in glob.glob(os.path.join(d, "*.parquet")):
            vals = [
                r[col]
                for r in spark.read.parquet(fpath).select(col).collect()
            ]
            assert vals == sorted(vals), (fpath, col)
            checked += 1
    assert checked >= n_bands + 1, f"only {checked} files checked"


def _tiny_corpus(spark):
    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_and_append_refuse_pre_unified_layout(spark, tmp_path):
    """ADVICE r17 #1: probing a pre-unified index silently returns ZERO
    matches (no band=-1 sets run -> every candidate fails verification)
    and appending mixes layouts — both must refuse loudly instead."""
    import json
    import os

    from hazelcast_jet_contrib_spark.operators.dedup import (
        append_to_minhash_index,
    )

    docs = _tiny_corpus(spark)
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path, num_hashes=64, bands=16)
    side = os.path.join(path, "_minhash_params.json")
    with open(side) as f:
        params = json.load(f)
    params.pop("layout")  # what a pre-r17 sidecar looks like
    with open(side, "w") as f:
        json.dump(params, f)
    with pytest.raises(ValueError, match="unified-v2"):
        probe_minhash_index(spark, path, _tiny_corpus(spark))
    with pytest.raises(ValueError, match="unified-v2"):
        append_to_minhash_index(docs, path)


def test_duplicate_sets_rows_do_not_duplicate_probe_pairs(spark, tmp_path):
    """ADVICE r17 #2: a re-run append of the same delta leaves duplicate
    (id, hs) sets rows; the probe must still emit each
    (probe_id, corpus_id) pair exactly once."""
    from hazelcast_jet_contrib_spark.operators.dedup import (
        append_to_minhash_index,
    )

    docs = _tiny_corpus(spark)
    base = docs.filter(F.col("doc_id") < 20)
    delta = docs.filter(F.col("doc_id") >= 20)
    path = str(tmp_path / "idx")
    build_minhash_index(base, path, num_hashes=64, bands=16)
    append_to_minhash_index(delta, path)
    append_to_minhash_index(delta, path)  # retried/re-run delta
    idx = spark.read.parquet(path)
    dup_sets = (
        idx.filter(F.col("band") < 0).groupBy("id").count().filter("count > 1")
    )
    assert dup_sets.count() > 0, "vacuous: no duplicate sets rows planted"
    probes = docs.filter(F.col("doc_id") >= 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    out = probe_minhash_index(spark, path, probes, threshold=0.9).collect()
    pairs = [(r["probe_id"], r["corpus_id"]) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate output pairs"
    assert {(d + 1_000_000, d) for d in range(20, 30)} <= set(pairs)


def test_sets_shard_space_derives_from_conf(spark, tmp_path):
    """VERDICT r17 item 9: the sets rows' exchange-salt space is a conf,
    not a constant — and an insane value refuses loudly."""
    import glob
    import os

    from hazelcast_jet_contrib_spark.operators.dedup import (
        _SETS_SHARD_SPACE_CONF,
        _sets_shard_space,
    )

    assert _sets_shard_space(spark) == 4096
    spark.conf.set(_SETS_SHARD_SPACE_CONF, "7")
    try:
        assert _sets_shard_space(spark) == 7
        docs = _tiny_corpus(spark)
        path = str(tmp_path / "idx")
        build_minhash_index(docs, path, num_hashes=64, bands=16)
        # the salt space bounds the sets run's exchange buckets; the
        # write is still one sorted run per partition dir
        sets_files = glob.glob(os.path.join(path, "band=-1", "*.parquet"))
        assert 1 <= len(sets_files) <= 7
        spark.conf.set(_SETS_SHARD_SPACE_CONF, "0")
        with pytest.raises(ValueError, match="setsShardSpace"):
            _sets_shard_space(spark)
    finally:
        spark.conf.unset(_SETS_SHARD_SPACE_CONF)

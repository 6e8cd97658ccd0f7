"""Terminal-sink tests: shard materialization with a verifiable
manifest — determinism of the content hash, round-trip verification,
and detection of every tamper class a trainer cares about (lost rows,
edited rows, duplicated rows, vanished shards)."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.sinks.training_shards import (
    MANIFEST,
    verify_training_shards,
    write_training_shards,
)


def _corpus(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 4).cast("int").alias("shard"),
        (F.col("id") % 7 + 1).cast("long").alias("n_tokens"),
    )


def test_write_verify_roundtrip_and_layout(spark, tmp_path):
    path = str(tmp_path / "shards")
    m = write_training_shards(
        _corpus(spark), path, shard_col="shard", token_col="n_tokens"
    )
    assert set(m["shards"]) == {"0", "1", "2", "3"}
    assert m["total_rows"] == 400
    assert all(s["n_rows"] == 100 for s in m["shards"].values())
    # physical layout: one directory per shard, manifest invisible to
    # the parquet reader
    assert sorted(
        os.path.basename(d) for d in glob.glob(f"{path}/shard=*")
    ) == ["shard=0", "shard=1", "shard=2", "shard=3"]
    assert spark.read.parquet(path).count() == 400
    out = verify_training_shards(spark, path)
    assert out == {"ok": True, "shards": 4, "total_rows": 400}


def test_manifest_is_deterministic_across_rewrites(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    # different partitioning/order of the same logical input
    df = _corpus(spark)
    write_training_shards(df.repartition(13), p1, token_col="n_tokens")
    write_training_shards(
        df.orderBy(F.col("doc_id").desc()).coalesce(2), p2, token_col="n_tokens"
    )
    m1 = json.load(open(os.path.join(p1, MANIFEST)))
    m2 = json.load(open(os.path.join(p2, MANIFEST)))
    assert m1 == m2, "content hash must be order/layout independent"


def test_verify_detects_row_edit_loss_and_duplication(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = _corpus(spark, 120)
    write_training_shards(df, path, token_col="n_tokens")

    # EDIT: rewrite shard 1 with one altered text (same row count)
    edited = df.filter("shard = 1").withColumn(
        "text", F.when(F.col("doc_id") == 1, F.lit("tampered")).otherwise(F.col("text"))
    )
    edited.drop("shard").write.mode("overwrite").parquet(f"{path}/shard=1")
    with pytest.raises(ValueError, match="content hash"):
        verify_training_shards(spark, path)

    # LOSS: rewrite shard 1 minus a row
    df.filter("shard = 1 and doc_id != 1").drop("shard").write.mode(
        "overwrite"
    ).parquet(f"{path}/shard=1")
    with pytest.raises(ValueError, match="rows"):
        verify_training_shards(spark, path)

    # DUPLICATION: a row written twice
    dup = df.filter("shard = 1").unionAll(df.filter("shard = 1 and doc_id = 1"))
    dup.drop("shard").write.mode("overwrite").parquet(f"{path}/shard=1")
    with pytest.raises(ValueError, match="rows"):
        verify_training_shards(spark, path)

    # VANISHED SHARD
    import shutil

    shutil.rmtree(f"{path}/shard=1")
    with pytest.raises(ValueError, match="shard set"):
        verify_training_shards(spark, path)


def test_write_requires_shard_column(spark, tmp_path):
    with pytest.raises(ValueError, match="shard column"):
        write_training_shards(
            _corpus(spark).drop("shard"), str(tmp_path / "x")
        )


def test_custom_shard_column_and_long_dtype_roundtrip(spark, tmp_path):
    """Regression: verify must honor the manifest's shard_col (not a
    hardcoded 'shard') and re-cast partition values to the written
    dtypes — a LONG shard column is re-inferred as INT from directory
    names on read, and xxhash64 is type-sensitive."""
    path = str(tmp_path / "shards")
    df = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        (F.col("id") % 3).alias("bucket"),  # LONG shard column, custom name
    )
    write_training_shards(df, path, shard_col="bucket")
    out = verify_training_shards(spark, path)
    assert out["ok"] and out["shards"] == 3 and out["total_rows"] == 60


def test_manifest_pins_on_disk_bytes_for_nondeterministic_input(spark, tmp_path):
    """ADVICE r06: the manifest must be computed from the just-written
    files, not by re-evaluating input lineage — a nondeterministic
    upstream (rand() sampling) re-evaluated post-write would yield a
    manifest that can NEVER verify. With the fix, verify passes."""
    from hazelcast_jet_contrib_spark.sinks.training_shards import (
        verify_training_shards,
        write_training_shards,
    )

    df = (
        spark.range(200)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3).cast("int").alias("shard"),
            F.rand(seed=None).alias("score"),  # fresh randomness per evaluation
        )
    )
    path = str(tmp_path / "nondet")
    manifest = write_training_shards(df, path, "shard")
    assert manifest["total_rows"] == 200
    out = verify_training_shards(spark, path)
    assert out["ok"] and out["shards"] == 3

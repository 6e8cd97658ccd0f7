"""Training-shard materialization: the terminal sink of the curation
pipeline (curate → pack → WRITE), with a verifiable manifest.

Reference lineage: the reference's sinks deliver records to external
systems with delivery guarantees (SinkBuilder contract,
MongoDBSinkBuilder.java:169-183); a training pipeline's terminal sink
instead delivers FILES whose integrity must be checkable long after the
job — a reader about to feed 100 TB of shards to a trainer needs to
know the corpus on disk is exactly what the curation job produced (no
partial writes, no bit-rot, no post-hoc edits). The manifest carries
per-shard row counts, token totals, and an order-independent 64-bit
content hash that `verify_training_shards` recomputes from the files.

Scale shape: the write is a plain partitioned parquet write (one
shuffle on the shard key — already paid by the packing window);
manifest stats aggregate map-side to one row per shard. The content
hash is a BIT_XOR of per-row xxhash64 over canonicalized rows —
commutative and overflow-free (a sum would trip ANSI-mode overflow),
so it is independent of row order, partition layout, and parallelism.
Any single edited or substituted row flips it; count and token totals
independently catch loss/duplication (an identical row written twice
XOR-cancels, which n_rows exposes). The contract targets integrity
against partial writes and bit-rot, not adversarial tampering — pairs
of edits engineered to XOR-cancel are out of scope.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


def _content_hash(df: DataFrame, cols: list[str]):
    # xor of per-row hashes: commutative (order/layout independent) and
    # overflow-free under ANSI mode, unlike a long sum
    return F.expr(
        "bit_xor(xxhash64({}))".format(", ".join(f"`{c}`" for c in cols))
    ).cast("long")


def _shard_stats(df: DataFrame, shard_col: str, token_col: str | None) -> DataFrame:
    hash_cols = sorted(c for c in df.columns)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        _content_hash(df, hash_cols).alias("content_hash"),
    ]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("n_tokens"))
    return df.groupBy(F.col(shard_col).alias("shard")).agg(*aggs)


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    token_col: str | None = None,
) -> dict:
    """Write `df` as parquet partitioned by `shard_col` and a manifest
    sidecar (`_manifest.json` — the `_` prefix keeps it invisible to
    parquet readers). Returns the manifest dict.

    The manifest is computed by re-reading the JUST-WRITTEN files (with
    the input dtypes re-established, exactly as `verify_training_shards`
    does) — never by re-evaluating the input DataFrame's lineage, which
    for a nondeterministic upstream (rand() sampling, current_timestamp,
    nondeterministic UDFs) would produce a manifest no verify can ever
    match (ADVICE r06). The manifest is therefore pinned to the on-disk
    bytes by construction; `verify_training_shards` re-derives it from
    the same files, so the pair proves the round trip.
    """
    if shard_col not in df.columns:
        raise ValueError(f"shard column {shard_col!r} not in {df.columns}")
    # rebalance on the shard column (guide §6): without it every input
    # task writes a file into every shard dir it sees — (tasks × shards)
    # files, when the training-shard model wants shard ≈ file (the
    # webdataset convention); one exchange buys one file per shard.
    # Manifest semantics are layout-independent (per-shard aggregates
    # over a re-read — pinned by test_training_shards' repartition(13)
    # equality test), so this changes bytes-on-disk grouping only.
    df.repartition(shard_col).write.mode("overwrite").partitionBy(
        shard_col
    ).parquet(path)
    on_disk = df.sparkSession.read.parquet(path)
    for c, t in df.dtypes:
        on_disk = on_disk.withColumn(c, F.col(c).cast(t))
    stats = _shard_stats(on_disk, shard_col, token_col).collect()
    manifest = {
        "columns": sorted(df.columns),
        # dtypes pin the hash inputs: partition-column values read back
        # through directory-name inference (e.g. a LONG shard column
        # comes back INT), and xxhash64 is type-sensitive — verify
        # casts the on-disk frame to these before hashing
        "dtypes": dict(df.dtypes),
        "shard_col": shard_col,
        "token_col": token_col,
        "shards": {
            str(r["shard"]): {
                "n_rows": r["n_rows"],
                "content_hash": r["content_hash"],
                **(
                    {"n_tokens": r["n_tokens"]} if token_col is not None else {}
                ),
            }
            for r in stats
        },
    }
    manifest["total_rows"] = sum(s["n_rows"] for s in manifest["shards"].values())
    tmp = os.path.join(path, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, MANIFEST))
    return manifest


def verify_training_shards(spark: SparkSession, path: str) -> dict:
    """Recompute every manifest quantity from the files on disk and
    compare. Returns {"ok": True, ...} or raises ValueError naming the
    first shard whose reality diverges from the manifest — the check a
    trainer runs before consuming a corpus."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path)
    missing = set(manifest["columns"]) - set(df.columns)
    if missing:
        raise ValueError(f"manifest columns missing on disk: {sorted(missing)}")
    # re-establish the written dtypes: the partition column's values are
    # re-inferred from directory names on read and xxhash64 is
    # type-sensitive, so hash on the manifest-recorded types
    for c, t in manifest.get("dtypes", {}).items():
        df = df.withColumn(c, F.col(c).cast(t))
    shard_col = manifest.get("shard_col", "shard")
    got = {
        str(r["shard"]): r
        for r in _shard_stats(df, shard_col, manifest.get("token_col")).collect()
    }
    if set(got) != set(manifest["shards"]):
        raise ValueError(
            f"shard set mismatch: manifest {sorted(manifest['shards'])} "
            f"vs disk {sorted(got)}"
        )
    for shard, expect in manifest["shards"].items():
        r = got[shard]
        if r["n_rows"] != expect["n_rows"]:
            raise ValueError(
                f"shard {shard}: {r['n_rows']} rows on disk, manifest says "
                f"{expect['n_rows']}"
            )
        if r["content_hash"] != expect["content_hash"]:
            raise ValueError(f"shard {shard}: content hash mismatch")
        if "n_tokens" in expect and r["n_tokens"] != expect["n_tokens"]:
            raise ValueError(f"shard {shard}: token total mismatch")
    return {"ok": True, "shards": len(got), "total_rows": manifest["total_rows"]}

"""CDC apply: materialize a change stream (insert/update/delete) into a
queryable state table, exactly-once across restarts.

Reference behavior being re-expressed: the MongoDB change-stream source
(SURVEY.md §2.2 S9, MongoDBSourceBuilder.java:162-270) delivers ordered
change events with a resume token; the downstream job's purpose is
almost always "keep a copy of the collection up to date". This module
supplies that downstream half on Spark, with the exactly-once story the
reference builds from snapshots + resume tokens.

Design (no lakehouse format required):
- state is **versioned**: batch N writes `state/v{N}/` derived from
  `v{N-1}` ∪ batch — a pure, deterministic function, fully distributed
  (union + window dedup; no driver materialization);
- a replayed epoch rewrites the same version directory and re-points
  the marker — idempotent, so at-least-once foreachBatch becomes
  exactly-once (same discipline as exactly_once.py, probed by
  delivery_probe.py);
- `current_state()` reads the newest *committed* version (marker file),
  so readers never observe a half-written merge.

Change record contract: (key string, op in {'I','U','D'}, value, seq) —
seq is the total order within a key (the resume-token/clusterTime
analog); the latest seq wins, 'D' removes the key.

At 100 TB: each merge shuffles state ∪ batch once on the key — the same
cost any upsert pays without a format that supports merge-on-read; for
high-frequency small batches, raise the trigger interval or compact
via maxSegmentsPerTrigger so batches amortize the rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STATE_SCHEMA = "key string, value string, seq long"


def _marker(state_dir: str) -> str:
    return os.path.join(state_dir, "_CURRENT")


def _read_current_version(state_dir: str) -> int | None:
    try:
        with open(_marker(state_dir)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def current_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The newest committed materialization (empty frame before any)."""
    v = _read_current_version(state_dir)
    if v is None:
        return spark.createDataFrame([], STATE_SCHEMA)
    return spark.read.parquet(os.path.join(state_dir, f"v{v}")).select(
        "key", "value", "seq"
    )


def _merge(prev: DataFrame, changes: DataFrame) -> DataFrame:
    """Deterministic merge: per key, the highest-seq record wins
    (ties break toward the change row); 'D' tombstones drop out."""
    pc = prev.select("key", "value", "seq", F.lit("U").alias("op"), F.lit(0).alias("src"))
    cc = changes.select("key", "value", "seq", "op", F.lit(1).alias("src"))
    w = Window.partitionBy("key").orderBy(F.col("seq").desc(), F.col("src").desc())
    return (
        pc.unionByName(cc)
        .withColumn("__rn__", F.row_number().over(w))
        .filter((F.col("__rn__") == 1) & (F.col("op") != "D"))
        .select("key", "value", "seq")
    )


def _versions_of(coll_dir: str) -> list[int]:
    try:
        return sorted(
            int(d[1:])
            for d in os.listdir(coll_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
    except FileNotFoundError:
        return []


def database_state(spark: SparkSession, root_dir: str, collection: str) -> DataFrame:
    """Newest committed materialization of one collection in a
    database-scoped CDC apply (empty frame before any). A collection
    untouched since epoch K serves vK as long as the database marker has
    advanced past K; version dirs beyond the marker (crash leftovers)
    are never served."""
    committed = _read_current_version(root_dir)
    if committed is None:
        return spark.createDataFrame([], STATE_SCHEMA)
    vs = [v for v in _versions_of(os.path.join(root_dir, collection)) if v <= committed]
    if not vs:
        return spark.createDataFrame([], STATE_SCHEMA)
    return spark.read.parquet(
        os.path.join(root_dir, collection, f"v{vs[-1]}")
    ).select("key", "value", "seq")


def cdc_apply_database_foreach_batch(root_dir: str, keep_versions: int = 2):
    """Database-scope CDC apply — the reference's ``streamDatabase`` /
    ``streamAll`` (MongoDBSourceBuilder.java:162-270): ONE change stream
    carries events for many collections and resumes from a SINGLE token.

    Change records carry ``collection`` alongside (key, op, value, seq).
    State materializes per collection under ``root_dir/<collection>/
    v{epoch}`` but the commit marker is one file for the whole scope:
    every collection touched by an epoch is rewritten first, then the
    marker flips — all collections advance atomically, exactly the
    one-resume-token semantics. A crash mid-epoch leaves some
    collections with an uncommitted v{epoch} dir that readers ignore
    (``database_state`` serves only versions <= marker) and the replay
    rewrites deterministically.

    The only driver-side step is the per-batch distinct collection list
    (bounded by the number of collections in the database, not data
    volume). Same epoch no-op / rewind guards as the single-table apply.
    """
    os.makedirs(root_dir, exist_ok=True)

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        committed = _read_current_version(root_dir)
        if committed is not None and committed == epoch_id:
            return
        if committed is not None and committed > epoch_id:
            raise RuntimeError(
                f"cdc_apply_database: epoch {epoch_id} rewinds behind committed "
                f"version {committed} in {root_dir!r} — the streaming query "
                "restarted with a fresh checkpoint against existing state. "
                "Resume with the original checkpointLocation, or use a new "
                "root_dir."
            )
        spark = batch_df.sparkSession
        batch_df = batch_df.select("collection", "key", "op", "value", "seq").persist()
        try:
            colls = [r["collection"] for r in batch_df.select("collection").distinct().collect()]
            for coll in sorted(colls):
                if not coll or any(c in coll for c in ("/", "\\", "..")):
                    raise ValueError(f"unsafe collection name: {coll!r}")
                prev = database_state(spark, root_dir, coll)
                merged = _merge(
                    prev,
                    batch_df.filter(F.col("collection") == coll).select(
                        "key", "op", "value", "seq"
                    ),
                )
                merged.write.mode("overwrite").parquet(
                    os.path.join(root_dir, coll, f"v{epoch_id}")
                )
        finally:
            batch_df.unpersist()
        tmp = _marker(root_dir) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch_id))
        os.replace(tmp, _marker(root_dir))
        import shutil

        for coll in os.listdir(root_dir):
            cdir = os.path.join(root_dir, coll)
            if not os.path.isdir(cdir):
                continue
            for v in _versions_of(cdir)[:-keep_versions]:
                shutil.rmtree(os.path.join(cdir, f"v{v}"), ignore_errors=True)

    return fn


def cdc_apply_foreach_batch(state_dir: str, keep_versions: int = 2):
    """foreachBatch adapter: maintain the state table from a stream of
    change records (cols: key, op, value, seq). Idempotent per epoch:
    a replay of an already-committed epoch is a no-op (the marker is the
    commit record — never read the version being rewritten); a replay
    after a crash-before-marker rewrites the version from the intact
    previous one. Committed versions older than `keep_versions` are
    pruned.

    Epoch-rewind guard: Spark's recovery replays at most the last
    uncommitted epoch, so a legitimate replay always has
    ``epoch_id == committed``. An ``epoch_id < committed`` means the
    stream was restarted against this state_dir with a FRESH checkpoint
    (epoch ids restart at 0) — silently skipping those batches until the
    new epochs catch up would be silent data loss, so it raises instead:
    resume with the original checkpointLocation, or point the restarted
    query at a fresh state_dir."""
    os.makedirs(state_dir, exist_ok=True)

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        committed = _read_current_version(state_dir)
        if committed is not None and committed == epoch_id:
            return  # epoch already fully committed: replay is a no-op
        if committed is not None and committed > epoch_id:
            raise RuntimeError(
                f"cdc_apply: epoch {epoch_id} rewinds behind committed version "
                f"{committed} in {state_dir!r} — the streaming query restarted "
                "with a fresh checkpoint against existing state. Resume with "
                "the original checkpointLocation, or use a new state_dir."
            )
        spark = batch_df.sparkSession
        prev = current_state(spark, state_dir)
        merged = _merge(prev, batch_df.select("key", "op", "value", "seq"))
        out = os.path.join(state_dir, f"v{epoch_id}")
        merged.write.mode("overwrite").parquet(out)
        tmp = _marker(state_dir) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch_id))
        os.replace(tmp, _marker(state_dir))
        # prune old committed versions (keep the newest `keep_versions`)
        import shutil

        versions = sorted(
            int(d[1:])
            for d in os.listdir(state_dir)
            if d.startswith("v") and d[1:].isdigit()
        )
        for v in versions[:-keep_versions]:
            shutil.rmtree(os.path.join(state_dir, f"v{v}"), ignore_errors=True)

    return fn

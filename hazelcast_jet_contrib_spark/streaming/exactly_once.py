"""Exactly-once sink discipline for foreachBatch writers.

Spark replays the last uncommitted micro-batch after failure, so a
foreachBatch sink is at-least-once by default. The reference closes this
gap with XA two-phase transactions (xa-test/, SURVEY.md §2.7); Spark has
no 2PC sink protocol, so the equivalent discipline is **idempotent
delivery keyed on (epoch_id)**: skip a batch whose epoch was already
committed, or upsert on a row key so replays overwrite instead of
duplicate.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def idempotent_foreach_batch(
    write_fn: Callable[[DataFrame, int], None],
    commit_dir: str,
) -> Callable[[DataFrame, int], None]:
    """Wrap a foreachBatch writer with epoch-id commit markers: a replayed
    epoch is skipped; a crash between write and marker replays the write,
    which `write_fn` must tolerate by overwriting (e.g. write files named
    by epoch, upsert by key). This is the Spark analog of the prepared-
    transaction recovery the XA probes verify (JdbcXaTest.java:28-33)."""
    os.makedirs(commit_dir, exist_ok=True)

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        marker = os.path.join(commit_dir, f"epoch-{epoch_id}")
        if os.path.exists(marker):
            return
        write_fn(batch_df, epoch_id)
        with open(marker, "w") as f:
            f.write("committed")

    return fn


def epoch_keyed_parquet_writer(out_dir: str) -> Callable[[DataFrame, int], None]:
    """Exactly-once parquet append: each epoch writes to its own
    subdirectory (overwrite mode), so replaying an epoch overwrites the
    same files instead of duplicating rows."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"epoch={epoch_id}"))

    return fn

"""Streaming incremental PageRank — the graph family's streaming twin
(VERDICT r09 item 8): edges arrive in micro-batches; each epoch folds
the delta into the accumulated edge set and WARM-STARTS the power
iteration from the previous epoch's ranks (operators/graph.py
``pagerank(init_ranks=...)``), so a handful of sweeps absorbs the
delta instead of a full cold iteration count.

Design (the StreamingNearDupIndex / cdc.py idempotence discipline):
- state under ``state_dir``: ``edges/e{N}/`` (src, dst parquet) and
  ``ranks/e{N}/`` (node, rank parquet) per epoch, committed by
  atomically replacing a ``_CURRENT`` marker AFTER both directories
  are written. A replayed epoch (foreachBatch redelivery after crash)
  with id <= the marker is skipped — leftovers above the marker are
  invisible and get rewritten deterministically, so delivery is
  exactly-once in effect.
- per epoch: ranks = pagerank(committed ∪ delta edges,
  iterations=delta_iterations, init_ranks=previous ranks). Nodes new
  to the graph enter at 1/N before mass normalization (the operator's
  warm-start contract); the first epoch runs the full cold
  ``iterations``.
- accuracy: a FIXED small sweep count per epoch tracks the moving
  fixpoint — each sweep contracts the error by the damping factor, so
  the steady-state gap is bounded, not accumulating (asserted against
  the converged batch fixpoint in tests). For an exact reconcile, run
  the batch operator cold over ``edges()`` — same relation, same
  arithmetic.

Scale shape: per epoch exactly ``delta_iterations`` sweeps of the
|V|+|E| dataflow (the measured-linear pagerank sweep) plus one
|V|-row warm-start join; epoch state on disk is the edge set + one
rank vector — no driver-side graph state. The accumulated ``edges/``
epoch directories are re-read each epoch; like the dedup index's
band epochs they are compactable by rewriting into one generation
(here simply: read edges(), write as epoch 0 of a fresh state_dir) —
edge sets are append-only under this contract (no retractions).

Reference lineage: the reference ships no graph operators (this
extends the engine's pipeline family); the epoch-commit mechanics
mirror streaming/dedup_index.py:51.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.graph import pagerank


class StreamingPageRank:
    """Incremental PageRank over an edge stream, for ``foreachBatch``::

        spr = StreamingPageRank(state_dir)
        q = edge_stream.writeStream.foreachBatch(spr.foreach_batch()).start()

    Read the latest committed ranks back with :meth:`ranks`.
    """

    def __init__(
        self,
        state_dir: str,
        src_col: str = "src",
        dst_col: str = "dst",
        damping: float = 0.85,
        iterations: int = 10,
        delta_iterations: int = 3,
    ) -> None:
        if delta_iterations < 1:
            raise ValueError("delta_iterations must be >= 1")
        self.state_dir = state_dir
        self.src_col, self.dst_col = src_col, dst_col
        self.damping = damping
        self.iterations = iterations
        self.delta_iterations = delta_iterations
        # marker/listing I/O is driver-local; creating a literal
        # "s3a:/..." directory for a remote URI would silently split
        # state between filesystems
        if "://" in state_dir and not state_dir.startswith("file:"):
            raise ValueError(
                "StreamingPageRank state_dir must be a driver-local path "
                "(the commit marker and epoch listing use local file I/O, "
                "like the message-log and MinHash-index maintainers)"
            )
        os.makedirs(state_dir, exist_ok=True)

    # -- commit marker (atomic replace, the message_log/cdc pattern) ----
    def _marker(self) -> str:
        return os.path.join(self.state_dir, "_CURRENT")

    def _committed(self) -> int | None:
        try:
            with open(self._marker()) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            return None

    def _commit(self, epoch: int) -> None:
        tmp = self._marker() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch))
        os.replace(tmp, self._marker())

    def _epoch_dirs(self, kind: str, up_to: int) -> list[str]:
        root = os.path.join(self.state_dir, kind)
        if not os.path.isdir(root):
            return []
        out = []
        for d in sorted(os.listdir(root)):
            if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= up_to:
                out.append(os.path.join(root, d))
        return out

    # -- readers --------------------------------------------------------
    def edges(self, spark: SparkSession) -> DataFrame | None:
        """The accumulated committed edge set (distinct src, dst)."""
        cur = self._committed()
        if cur is None:
            return None
        dirs = self._epoch_dirs("edges", cur)
        return spark.read.parquet(*dirs).distinct() if dirs else None

    def ranks(self, spark: SparkSession) -> DataFrame | None:
        """The latest committed rank vector (node, rank)."""
        cur = self._committed()
        if cur is None:
            return None
        root = os.path.join(self.state_dir, "ranks", f"e{cur}")
        return spark.read.parquet(root) if os.path.isdir(root) else None

    # -- the foreachBatch body -------------------------------------------
    def apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        cur = self._committed()
        if cur is not None and epoch_id <= cur:
            return  # replayed epoch: already folded in, skip (idempotent)
        spark = batch_df.sparkSession
        delta = batch_df.select(
            F.col(self.src_col).alias("src"), F.col(self.dst_col).alias("dst")
        ).distinct()
        # write the delta FIRST (uncommitted until the marker moves)
        delta.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "edges", f"e{epoch_id}")
        )
        all_edges = spark.read.parquet(
            *self._epoch_dirs("edges", epoch_id)
        ).distinct()
        prev = self.ranks(spark)
        if prev is None:
            out = pagerank(
                all_edges, damping=self.damping, iterations=self.iterations
            )
        else:
            out = pagerank(
                all_edges,
                damping=self.damping,
                iterations=self.delta_iterations,
                init_ranks=prev,
            )
        out.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "ranks", f"e{epoch_id}")
        )
        self._commit(epoch_id)

    def foreach_batch(self):
        return self.apply_batch

    # -- maintenance ------------------------------------------------------
    def compact(self, spark: SparkSession) -> dict[str, int]:
        """Rewrite the accumulated per-epoch edge dirs into one
        consolidated epoch and drop superseded rank vectors — the
        small-files bound for a long-running stream (one dir per
        trigger otherwise; the dedup-index compaction concern).

        Crash safety comes from SET semantics, not ordering: the
        consolidated edge set lands in the CURRENT epoch's dir
        (atomic-enough via Spark's _temporary rename; the dir already
        holds a subset), and every older epoch dir is then deleted. A
        crash at ANY point leaves edge rows duplicated across dirs —
        harmless, because :meth:`edges` applies ``distinct()`` and
        PageRank counts duplicate edges once by contract; re-running
        compaction converges the layout. Rank history: only the
        marker's epoch is ever read, so older ``ranks/e*`` dirs delete
        with the same indifference.

        Returns {"dirs_before": n, "dirs_after": m} for observability.
        Driver-local FS only (os walk/rmtree), like the message-log
        and MinHash-index compactors."""
        import shutil

        if "://" in self.state_dir and not self.state_dir.startswith("file:"):
            raise ValueError(
                "compact operates on the driver-local filesystem only"
            )
        cur = self._committed()
        if cur is None:
            return {"dirs_before": 0, "dirs_after": 0}
        edge_dirs = self._epoch_dirs("edges", cur)
        rank_dirs = self._epoch_dirs("ranks", cur)
        before = len(edge_dirs) + len(rank_dirs)
        consolidated = self.edges(spark)
        # localCheckpoint BEFORE the overwrite: the plan reads the very
        # dirs the write replaces
        consolidated = consolidated.localCheckpoint(eager=True)
        consolidated.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, "edges", f"e{cur}")
        )
        for d in edge_dirs:
            if not d.endswith(f"e{cur}"):
                shutil.rmtree(d, ignore_errors=True)
        for d in rank_dirs:
            if not d.endswith(f"e{cur}"):
                shutil.rmtree(d, ignore_errors=True)
        after = len(self._epoch_dirs("edges", cur)) + len(
            self._epoch_dirs("ranks", cur)
        )
        return {"dirs_before": before, "dirs_after": after}


__all__ = ["StreamingPageRank"]

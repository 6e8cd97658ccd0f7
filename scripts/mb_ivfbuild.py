"""Microbench: IVF-PQ index build shapes A/B in ONE session at sf0.1
(full parquet build to a temp dir, interleaved reps).

  v_join  : former shape — cell-assignment kernel over one corpus scan,
            pq_encode kernel over another, re-attached by a join on cid
  v_fused : current production shape — one Arrow kernel emits
            (cell, codes) together (build_ivf_index with pq_m)

Run: python scripts/mb_ivfbuild.py [reps]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF_DIR = "/root/testdata/sf0.1"

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.functions.vectors import as_double
    from hazelcast_jet_contrib_spark.operators.similarity import (
        _train_ivf_centroids,
        build_ivf_index,
        pq_encode,
        train_pq_codebooks,
    )

    spark = get_spark(app_name="mb_ivfbuild")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") >= 10)

    def v_join(path):
        cent = _train_ivf_centroids(corpus, "vec_id", "embedding", 8, 10_000, 42)

        @pandas_udf("int")
        def cell_of(vecs: pd.Series) -> pd.Series:
            mat = np.vstack(vecs.to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            return pd.Series((mat @ cent.T).argmax(axis=1)).astype("int32")

        indexed = corpus.select(
            F.col("vec_id").alias("cid"), as_double("embedding").alias("cv")
        ).withColumn("cell", cell_of(F.col("cv")))
        books = train_pq_codebooks(
            corpus, "vec_id", "embedding", m=8, kcent=16,
            sample_rows=10_000, seed=42,
        )
        codes = pq_encode(corpus, books, "vec_id", "embedding")
        indexed = indexed.join(codes, "cid")
        indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

    def v_fused(path):
        build_ivf_index(corpus, path, nlist=8, pq_m=8, pq_kcent=16)

    variants = {"v_join": v_join, "v_fused": v_fused}
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            path = tempfile.mkdtemp(prefix=f"mb_ivf_{name}_")
            try:
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"mb_ivf:{name}:{rep}")
                fn(path)
                results[name].append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(path, ignore_errors=True)
    for name, ts in results.items():
        print(f"{name:8s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

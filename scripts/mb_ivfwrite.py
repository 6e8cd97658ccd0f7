"""Microbench: IVF index write REBALANCE A/B at sf0.1 — the real
`build_ivf_index` + `ivf_pq_topk` (the ivf_pq_probe_exact_topk
configuration), with the `_write_ivf_cells` seam monkeypatched between:

  v_taskfiles : pre-r17 shape — no repartition; every scan task writes
                a file into every cell dir (tasks x nlist files)
  v_rebalance : production shape — repartition("cell") before the
                write; one exchange, one file per cell

Probe row sets asserted identical first; per-variant file counts
reported. Run: python scripts/mb_ivfwrite.py [reps]
"""

from __future__ import annotations

import glob
import json
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


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked
    from hazelcast_jet_contrib_spark.operators import similarity

    spark = get_spark(app_name="mb_ivfwrite")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)

    def write_taskfiles(indexed, path):
        indexed.write.mode("overwrite").partitionBy("cell").parquet(path)

    def write_rebalance(indexed, path):
        indexed.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(path)

    variants = {
        "v_taskfiles": write_taskfiles,
        "v_rebalance": write_rebalance,
    }
    results: dict[str, list[dict]] = {k: [] for k in variants}
    nfiles: dict[str, int] = {}
    checksets: dict[str, set] = {}
    real_seam = similarity._write_ivf_cells
    try:
        for rep in range(REPS):
            for name, seam in variants.items():
                similarity._write_ivf_cells = seam
                path = tempfile.mkdtemp(prefix=f"mb_ivfw_{name}_")
                try:
                    spark.sparkContext._jvm.System.gc()
                    spark.sparkContext.setJobDescription(f"mb_ivfw:{name}:{rep}")
                    legs = {}
                    t = time.perf_counter()
                    similarity.build_ivf_index(
                        corpus, path, nlist=8, pq_m=8, pq_kcent=16
                    )
                    legs["build"] = time.perf_counter() - t
                    nfiles[name] = len(
                        [
                            p
                            for p in glob.glob(path + "/cell=*/*.parquet")
                        ]
                    )
                    t = time.perf_counter()
                    rows = similarity.ivf_pq_topk(
                        spark, path, queries_df, k=5, nprobe=8, rerank=10**7
                    ).collect()
                    legs["probe"] = time.perf_counter() - t
                    legs["total"] = legs["build"] + legs["probe"]
                    results[name].append(legs)
                    checksets.setdefault(
                        name,
                        {
                            (r["query_id"], r["neighbor_id"], r["rank"])
                            for r in rows
                        },
                    )
                finally:
                    release_tracked()
                    spark.catalog.clearCache()
                    shutil.rmtree(path, ignore_errors=True)
    finally:
        similarity._write_ivf_cells = real_seam
    assert checksets["v_taskfiles"] == checksets["v_rebalance"], (
        checksets["v_taskfiles"] ^ checksets["v_rebalance"]
    )
    print(f"probe rows identical: {len(checksets['v_rebalance'])}")
    for name, reps in results.items():
        mins = {
            leg: min(r[leg] for r in reps) for leg in ("build", "probe", "total")
        }
        print(
            f"{name:12s} files={nfiles[name]:3d} "
            + " ".join(f"{k}={v:.3f}s" for k, v in mins.items())
        )
        print(
            f"{'':12s} all="
            + json.dumps(
                [{k: round(v, 3) for k, v in r.items()} for r in reps]
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Microbench: minhash index build shapes A/B in ONE session at sf0.1
(full parquet build to a temp dir, interleaved reps).

  v_join  : band_keys(sig).join(sig.select(id, hs))  -- former shape:
            signature aggregation computed twice + a join
  v_carry : band_keys(sig, carry=("hs",))            -- one aggregation,
            hs rides the unpivot (current production shape)

Run: python scripts/mb_indexrows.py [reps]
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

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _shingle_sets,
        band_keys,
        minhash_signatures,
    )

    spark = get_spark(app_name="mb_indexrows")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )

    def rows_join():
        sh = _shingle_sets(docs, "doc_id", "text", 3)
        sig = minhash_signatures(sh, 64)
        return band_keys(sig, 64, 32).join(sig.select("id", "hs"), "id")

    def rows_carry():
        sh = _shingle_sets(docs, "doc_id", "text", 3)
        sig = minhash_signatures(sh, 64)
        return band_keys(sig, 64, 32, carry=("hs",))

    variants = {"v_join": rows_join, "v_carry": rows_carry}
    results: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            path = tempfile.mkdtemp(prefix=f"mb_idx_{name}_")
            try:
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"mb_idx:{name}:{rep}")
                (
                    fn()
                    .repartition("band")
                    .sortWithinPartitions("bh")
                    .write.mode("overwrite")
                    .partitionBy("band")
                    .parquet(path)
                )
                results[name].append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(path, ignore_errors=True)
    for name, ts in results.items():
        print(f"{name:8s} min={min(ts):.3f}s all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()

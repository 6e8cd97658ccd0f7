"""Capture .explain("formatted") evidence for the r17 split index
layout (OPTIMIZATION_r17.md §19): the probe plan under the pre-split
single-relation layout (hs riding every band row) vs the production
split layout (narrow bands + candidate-bounded `_sets` re-attach), and
the split build's two write relations.

Writes plans/r17/OP_probe_index_split_{before,after}.txt and
plans/r17/OP_idx_epoch_write_after.txt (the unified single-action
epoch write relation: narrow band rows + band=-1 sets rows).

Run: python scripts/capture_splitidx_plans.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "plans" / "r17"
NUM_HASHES, BANDS = 64, 32


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _route_index_epoch,
        _shingle_sets,
        band_keys,
        build_minhash_index,
        index_rows,
        minhash_signatures,
        probe_minhash_index,
    )
    from hazelcast_jet_contrib_spark.registry import table

    spark = get_spark(app_name="capture_splitidx_plans")
    OUT.mkdir(parents=True, exist_ok=True)
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy")).alias("text"),
    )

    # -- before: single-relation layout, probe reads hs off band rows
    single_path = tempfile.mkdtemp(prefix="cap_single_")
    split_path = tempfile.mkdtemp(prefix="cap_split_")
    try:
        sh = _shingle_sets(docs, "doc_id", "text", 3)
        sig = minhash_signatures(sh, NUM_HASHES)
        (
            band_keys(sig, NUM_HASHES, BANDS, carry=("hs",))
            .repartition("band")
            .sortWithinPartitions("bh")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(single_path)
        )
        psh = _shingle_sets(probes, "doc_id", "text", 3, spread=False)
        psig = minhash_signatures(psh, NUM_HASHES)
        pb = band_keys(psig, NUM_HASHES, BANDS, carry=("hs",))
        probe_rows = pb.limit(500_001).collect()
        bhs = sorted({r["bh"] for r in probe_rows})
        schema = StructType(
            [
                StructField("probe_id", LongType()),
                StructField("band", IntegerType()),
                StructField("bh", LongType()),
                StructField("phs", ArrayType(LongType())),
            ]
        )
        probe_df = F.broadcast(
            spark.createDataFrame(
                [(r["id"], r["band"], r["bh"], r["hs"]) for r in probe_rows],
                schema,
            )
        )
        idx = spark.read.parquet(single_path).filter(F.col("bh").isin(bhs))
        cand = (
            idx.join(probe_df, ["band", "bh"])
            .select("probe_id", F.col("id").alias("corpus_id"), "phs", "hs")
            .dropDuplicates(["probe_id", "corpus_id"])
        )
        inter = F.size(F.array_intersect("phs", "hs")).cast("double")
        union = (
            F.size("phs") + F.size("hs") - F.size(F.array_intersect("phs", "hs"))
        )
        before = (
            cand.filter((inter / union) >= 0.6)
            .withColumn("jaccard", F.round(inter / union, 6))
            .select("probe_id", "corpus_id", "jaccard")
        )
        before.collect()
        (OUT / "OP_probe_index_split_before.txt").write_text(_formatted(before))
        print("wrote OP_probe_index_split_before.txt")

        # -- after: production split layout
        build_minhash_index(docs, split_path, num_hashes=NUM_HASHES, bands=BANDS)
        after = probe_minhash_index(spark, split_path, probes, threshold=0.6)
        after.collect()
        (OUT / "OP_probe_index_split_after.txt").write_text(_formatted(after))
        print("wrote OP_probe_index_split_after.txt")

        a = {tuple(r) for r in before.collect()}
        b = {tuple(r) for r in after.collect()}
        assert a == b, f"layouts disagree: {a ^ b}"
        print(f"probe rows identical across layouts: {len(b)}")

        # -- the unified build's single write relation
        (OUT / "OP_idx_epoch_write_after.txt").write_text(
            _formatted(
                _route_index_epoch(
                    index_rows(docs, "doc_id", "text", NUM_HASHES, BANDS, 3)
                )
            )
        )
        print("wrote OP_idx_epoch_write_after.txt")
    finally:
        shutil.rmtree(single_path, ignore_errors=True)
        shutil.rmtree(split_path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

"""Microbench: MinHash index LAYOUT A/B in ONE session at sf0.1 —
the full minhash_index_lifecycle leg sequence (build evens -> append
odds -> compact -> probe) under both on-disk layouts, interleaved reps,
probe row sets asserted identical first.

  v_single : pre-r17 layout — hs rides the band unpivot x bands
             (band rows (id, band, bh, hs); probe reads hs off the
             matched rows). Inlined here as the measured record.
  v_split  : whatever the PRODUCTION operators currently ship (this
             lane calls build/append/compact/probe directly). During
             this round that was first the two-relation _sets layout
             (rejected), then the unified band=-1 layout (shipped) —
             see OPTIMIZATION_r17.md §19 for which numbers are which.
  v_merged : inline prototype of the unified single-action layout
             (sets rows as a salted band=-1 partition) with a
             file-by-file physical sort verification.

Also reports the on-disk index size per layout (du -s equivalent).

Run: python scripts/mb_splitidx.py [reps]
"""

from __future__ import annotations

import json
import os
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
NUM_HASHES, BANDS = 64, 32


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


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
    from hazelcast_jet_contrib_spark.cache import release_tracked
    from hazelcast_jet_contrib_spark.operators.dedup import (
        _shingle_sets,
        append_to_minhash_index,
        band_keys,
        build_minhash_index,
        compact_minhash_index,
        minhash_signatures,
        probe_minhash_index,
    )

    spark = get_spark(app_name="mb_splitidx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    probes = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz yy")).alias("text"),
    )

    # ---- v_single: the pre-split layout, inlined --------------------
    def single_rows(corpus):
        sh = _shingle_sets(corpus, "doc_id", "text", 3)
        sig = minhash_signatures(sh, NUM_HASHES)
        return band_keys(sig, NUM_HASHES, BANDS, carry=("hs",))

    def single_write(corpus, path, mode):
        (
            single_rows(corpus)
            .repartition("band")
            .sortWithinPartitions("bh")
            .write.mode(mode)
            .partitionBy("band")
            .parquet(path)
        )

    def single_compact(path):
        staging = os.path.join(path, "_compact_staging")
        shutil.rmtree(staging, ignore_errors=True)
        (
            spark.read.parquet(path)
            .repartition("band")
            .sortWithinPartitions("bh")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(staging)
        )
        import glob

        for band_dir in sorted(glob.glob(os.path.join(staging, "band=*"))):
            live = os.path.join(path, os.path.basename(band_dir))
            shutil.rmtree(live, ignore_errors=True)
            os.rename(band_dir, live)
        shutil.rmtree(staging, ignore_errors=True)

    def single_probe(path):
        sh = _shingle_sets(probes, "doc_id", "text", 3, spread=False)
        sig = minhash_signatures(sh, NUM_HASHES)
        pb = band_keys(sig, NUM_HASHES, BANDS, carry=("hs",))
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
        idx = spark.read.parquet(path).filter(F.col("bh").isin(bhs))
        cand = (
            idx.join(probe_df, ["band", "bh"])
            .select("probe_id", F.col("id").alias("corpus_id"), "phs", "hs")
            .dropDuplicates(["probe_id", "corpus_id"])
        )
        inter = F.size(F.array_intersect("phs", "hs")).cast("double")
        union = (
            F.size("phs") + F.size("hs") - F.size(F.array_intersect("phs", "hs"))
        )
        return (
            cand.filter((inter / union) >= 0.6)
            .withColumn("jaccard", F.round(inter / union, 6))
            .select("probe_id", "corpus_id", "jaccard")
        )

    def run_single(path):
        legs = {}
        t = time.perf_counter()
        single_write(docs.filter(F.col("doc_id") % 2 == 0), path, "overwrite")
        legs["build"] = time.perf_counter() - t
        t = time.perf_counter()
        single_write(docs.filter(F.col("doc_id") % 2 == 1), path, "append")
        legs["append"] = time.perf_counter() - t
        t = time.perf_counter()
        single_compact(path)
        legs["compact"] = time.perf_counter() - t
        t = time.perf_counter()
        rows = single_probe(path).collect()
        legs["probe"] = time.perf_counter() - t
        return legs, rows

    def run_split(path):
        legs = {}
        t = time.perf_counter()
        build_minhash_index(
            docs.filter(F.col("doc_id") % 2 == 0), path,
            num_hashes=NUM_HASHES, bands=BANDS,
        )
        legs["build"] = time.perf_counter() - t
        t = time.perf_counter()
        append_to_minhash_index(docs.filter(F.col("doc_id") % 2 == 1), path)
        legs["append"] = time.perf_counter() - t
        t = time.perf_counter()
        compact_minhash_index(spark, path)
        legs["compact"] = time.perf_counter() - t
        t = time.perf_counter()
        rows = probe_minhash_index(spark, path, probes, threshold=0.6).collect()
        legs["probe"] = time.perf_counter() - t
        return legs, rows

    # ---- v_merged: sets rows ride the SAME single write as sharded
    # band=-1..-K partitions (hs crosses the exchange x1, no persist
    # barrier, one action per epoch, uniform compaction protocol) -----
    def merged_rows(corpus):
        sh = _shingle_sets(corpus, "doc_id", "text", 3)
        sig = minhash_signatures(sh, NUM_HASHES)
        rows_per_band = NUM_HASHES // BANDS
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"h{b * rows_per_band + j}") for j in range(rows_per_band)]
                ).alias("bh"),
                F.lit(None).cast("array<bigint>").alias("hs"),
            )
            for b in range(BANDS)
        ]
        sets_struct = F.struct(
            (-1 - F.pmod(F.xxhash64("id"), F.lit(BANDS))).cast("int").alias("band"),
            F.lit(None).cast("bigint").alias("bh"),
            F.col("hs").alias("hs"),
        )
        return sig.select(
            "id", F.explode(F.array(*(band_structs + [sets_struct]))).alias("bb")
        ).select("id", "bb.band", "bb.bh", "bb.hs")

    def merged_write(corpus, path, mode):
        (
            merged_rows(corpus)
            .repartition("band")
            .sortWithinPartitions("band", "bh", "id")
            .write.mode(mode)
            .partitionBy("band")
            .parquet(path)
        )

    def merged_compact(path):
        staging = os.path.join(path, "_compact_staging")
        shutil.rmtree(staging, ignore_errors=True)
        (
            spark.read.parquet(path)
            .repartition("band")
            .sortWithinPartitions("band", "bh", "id")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(staging)
        )
        import glob

        for band_dir in sorted(glob.glob(os.path.join(staging, "band=*"))):
            live = os.path.join(path, os.path.basename(band_dir))
            shutil.rmtree(live, ignore_errors=True)
            os.rename(band_dir, live)
        shutil.rmtree(staging, ignore_errors=True)

    def merged_probe(path):
        sh = _shingle_sets(probes, "doc_id", "text", 3, spread=False)
        sig = minhash_signatures(sh, NUM_HASHES)
        pb = band_keys(sig, NUM_HASHES, BANDS, carry=("hs",))
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
        idx = spark.read.parquet(path)
        bandscan = idx.filter(
            (F.col("band") >= 0) & F.col("bh").isin(bhs)
        ).select("id", "band", "bh")
        cand = (
            bandscan.join(probe_df, ["band", "bh"])
            .select("probe_id", F.col("id").alias("corpus_id"), "phs")
            .dropDuplicates(["probe_id", "corpus_id"])
        )
        cand = cand.persist()
        try:
            cids = [
                r["corpus_id"]
                for r in cand.select("corpus_id").distinct().limit(500_001).collect()
            ]
            sets = idx.filter(
                (F.col("band") < 0)
                & (F.col("id").isin(cids) if cids else F.lit(False))
            ).select("id", "hs")
            pair = cand.join(sets, cand.corpus_id == sets.id).select(
                "probe_id", "corpus_id", "phs", "hs"
            )
            inter = F.size(F.array_intersect("phs", "hs")).cast("double")
            union = (
                F.size("phs")
                + F.size("hs")
                - F.size(F.array_intersect("phs", "hs"))
            )
            return (
                pair.filter((inter / union) >= 0.6)
                .withColumn("jaccard", F.round(inter / union, 6))
                .select("probe_id", "corpus_id", "jaccard")
                .collect()
            )
        finally:
            cand.unpersist()

    sort_checked = {"done": False}

    def _check_merged_sort(path):
        # physical sortedness must survive the dynamic-partition writer:
        # band files non-decreasing in bh, sets shards non-decreasing in
        # id — this is what makes the row-group pruning story real
        import glob as _glob

        pos = sorted(p for p in _glob.glob(os.path.join(path, "band=*"))
                     if "band=-" not in p)
        neg = sorted(_glob.glob(os.path.join(path, "band=-*")))
        for d, col in [(pos[0], "bh"), (pos[-1], "bh"), (neg[0], "id"), (neg[-1], "id")]:
            for fpath in _glob.glob(os.path.join(d, "*.parquet")):
                vals = [r[col] for r in spark.read.parquet(fpath).select(col).collect()]
                assert vals == sorted(vals), (fpath, col, vals[:10])
        print("merged layout physical sort verified (bh in bands, id in sets)")

    def run_merged(path):
        legs = {}
        t = time.perf_counter()
        merged_write(docs.filter(F.col("doc_id") % 2 == 0), path, "overwrite")
        legs["build"] = time.perf_counter() - t
        t = time.perf_counter()
        merged_write(docs.filter(F.col("doc_id") % 2 == 1), path, "append")
        legs["append"] = time.perf_counter() - t
        t = time.perf_counter()
        merged_compact(path)
        legs["compact"] = time.perf_counter() - t
        if not sort_checked["done"]:
            sort_checked["done"] = True
            _check_merged_sort(path)
        t = time.perf_counter()
        rows = merged_probe(path)
        legs["probe"] = time.perf_counter() - t
        return legs, rows

    variants = {
        "v_single": run_single,
        "v_split": run_split,
        "v_merged": run_merged,
    }
    results: dict[str, list[dict]] = {k: [] for k in variants}
    sizes: dict[str, int] = {}
    checksets: dict[str, set] = {}
    for rep in range(REPS):
        for name, fn in variants.items():
            path = tempfile.mkdtemp(prefix=f"mb_sidx_{name}_")
            try:
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"mb_sidx:{name}:{rep}")
                legs, rows = fn(path)
                legs["total"] = sum(legs.values())
                results[name].append(legs)
                sizes[name] = _tree_bytes(path)
                checksets.setdefault(
                    name,
                    {(r["probe_id"], r["corpus_id"], r["jaccard"]) for r in rows},
                )
            finally:
                release_tracked()
                spark.catalog.clearCache()
                shutil.rmtree(path, ignore_errors=True)
    assert checksets["v_single"] == checksets["v_split"], (
        "LAYOUTS DISAGREE: "
        f"{checksets['v_single'] ^ checksets['v_split']}"
    )
    print(f"probe rows identical across layouts: {len(checksets['v_split'])}")
    for name, reps in results.items():
        mins = {
            leg: min(r[leg] for r in reps)
            for leg in ("build", "append", "compact", "probe", "total")
        }
        print(
            f"{name:9s} bytes={sizes[name]:>10d} "
            + " ".join(f"{k}={v:.3f}s" for k, v in mins.items())
        )
        print(f"{'':9s} all={json.dumps([{k: round(v, 3) for k, v in r.items()} for r in reps])}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Interleaved A/B for q21_waiting_suppliers (r17 optimization round).

Shipped shape ("groupjoin"): decorrelated EXISTS/NOT-EXISTS via a
groupBy(l_orderkey) aggregate joined back onto the late detail. The
flines (lineitem JOIN orders) subtree is referenced twice with
DIFFERENT downstream filters, so the canonical plans differ and the
exchange is NOT reused: lineitem+orders scan and join twice.

Candidate ("window"): both existence counts as collect_set window
aggregates over partitionBy(l_orderkey) — ONE scan, ONE join, ONE
exchange; nsupp/nlate ride the same Window node.

Equivalence: COUNT(DISTINCT x) == size(collect_set(x)) (both drop
NULLs, l_suppkey is NOT NULL; the nlate CASE yields NULL for on-time
rows which both forms ignore). Row equality asserted before timing.

Usage: python scripts/mb_q21.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build(spark, variant: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.registry import table

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = (
        table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
    flines = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
        )
        .otherwise(0)
        .alias("is_late"),
    )
    if variant == "groupjoin":
        ostats = flines.groupBy(F.col("l_orderkey").alias("s_orderkey")).agg(
            F.count_distinct("l_suppkey").alias("nsupp"),
            F.count_distinct(
                F.when(F.col("is_late") == 1, F.col("l_suppkey"))
            ).alias("nlate"),
        )
        late = flines.filter(F.col("is_late") == 1).join(
            ostats.filter((F.col("nsupp") > 1) & (F.col("nlate") == 1)),
            F.col("l_orderkey") == F.col("s_orderkey"),
        )
    else:
        w = Window.partitionBy("l_orderkey")
        late = (
            flines.withColumn(
                "nsupp", F.size(F.collect_set("l_suppkey").over(w))
            )
            .withColumn(
                "nlate",
                F.size(
                    F.collect_set(
                        F.when(F.col("is_late") == 1, F.col("l_suppkey"))
                    ).over(w)
                ),
            )
            .filter(
                (F.col("is_late") == 1)
                & (F.col("nsupp") > 1)
                & (F.col("nlate") == 1)
            )
        )
    return (
        late.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
    )


def main() -> None:
    from hazelcast_jet_contrib_spark import get_spark

    spark = get_spark(app_name="mb_q21")

    a = {tuple(r) for r in build(spark, "groupjoin").collect()}
    b = {tuple(r) for r in build(spark, "window").collect()}
    assert a == b, f"row sets differ: {len(a)} vs {len(b)}"
    print(f"row sets IDENTICAL ({len(a)} rows)")

    times: dict[str, list[float]] = {"groupjoin": [], "window": []}
    for rep in range(REPS):
        order = ["groupjoin", "window"] if rep % 2 == 0 else ["window", "groupjoin"]
        for variant in order:
            spark.catalog.clearCache()
            df = build(spark, variant)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            times[variant].append(dt)
            print(f"rep{rep} {variant:10s} {dt:.3f}s")
    for v, ts in times.items():
        print(f"{v:10s} min={min(ts):.3f} all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()

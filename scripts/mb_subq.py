"""Interleaved A/Bs for the remaining double-subtree subquery shapes
found by the r17 sweep (q21's pattern: an aggregate over relation X
joined/filtered back against X re-evaluates X's whole lineage, because
the two references have different downstream filters and the exchange
is not reused).

  q2_min_cost_supplier   shipped: per-part MIN groupBy + broadcast join
                         back onto offers (offers = fact + 4 broadcast
                         dims, evaluated TWICE)
                         opt: MIN as a window over partitionBy(p_partkey)
  q17_small_quantity_rev shipped: per-part AVG groupBy + broadcast join
                         back onto the brand-pruned fact (evaluated
                         TWICE; thresholds broadcast is |brand parts|-
                         sized — unbroadcastable at 100 TB)
                         opt: AVG as a window over partitionBy(l_partkey)
  q15_top_supplier       shipped: revenue agg evaluated twice (its own
                         MAX + the detail join)
                         opt: tracked_persist the supplier-sized agg
  q11_important_parts    shipped: partvalue agg evaluated twice (global
                         threshold + detail)
                         opt: tracked_persist the part-sized agg

Row equality asserted before timing. Usage:
  python scripts/mb_subq.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def build(spark, qname: str, variant: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hazelcast_jet_contrib_spark.cache import tracked_persist
    from hazelcast_jet_contrib_spark.registry import QUERIES, table

    if variant == "shipped":
        return QUERIES[qname](spark, SF_DIR)

    if qname == "q2_min_cost_supplier":
        li = table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 0)
        part = (
            table(spark, SF_DIR, "part")
            .filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
            .select("p_partkey")
        )
        supp = table(spark, SF_DIR, "supplier").select(
            "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
        )
        nat = table(spark, SF_DIR, "nation")
        reg = table(spark, SF_DIR, "region").filter(F.col("r_name") == "EUROPE")
        offers = (
            li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
            .withColumn("unit_price", F.col("l_extendedprice") / F.col("l_quantity"))
            .select(
                "p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name", "unit_price"
            )
        )
        w = Window.partitionBy("p_partkey")
        return (
            offers.withColumn("m_min", F.min("unit_price").over(w))
            .filter(F.col("unit_price") == F.col("m_min"))
            .select(
                "p_partkey",
                "s_suppkey",
                "s_name",
                "n_name",
                F.col("s_acctbal").alias("acctbal"),
                F.col("unit_price").alias("min_unit_price"),
            )
        )

    if qname == "q17_small_quantity_revenue":
        li = table(spark, SF_DIR, "lineitem")
        brand_parts = (
            table(spark, SF_DIR, "part")
            .filter(F.col("p_brand") == "Brand#23")
            .select("p_partkey")
        )
        pruned = li.join(
            F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey")
        )
        w = Window.partitionBy("l_partkey")
        return (
            pruned.withColumn(
                "qty_threshold", F.lit(0.5) * F.avg("l_quantity").over(w)
            )
            .filter(F.col("l_quantity") < F.col("qty_threshold"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
        )

    if qname == "q15_top_supplier":
        li = table(spark, SF_DIR, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        revenue = tracked_persist(
            li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("total_revenue")
            )
        )
        max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
        supp = table(spark, SF_DIR, "supplier").select("s_suppkey", "s_name")
        return (
            revenue.join(
                F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue")
            )
            .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue")
        )

    if qname == "q11_important_parts":
        li = table(spark, SF_DIR, "lineitem")
        supp = table(spark, SF_DIR, "supplier").select("s_suppkey", "s_nationkey")
        nat = (
            table(spark, SF_DIR, "nation")
            .filter(F.col("n_name") == "NATION_7")
            .select("n_nationkey")
        )
        partvalue = tracked_persist(
            li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("l_partkey")
            .agg(F.sum("l_extendedprice").alias("value"))
        )
        threshold = partvalue.agg((F.lit(0.001) * F.sum("value")).alias("threshold"))
        return (
            partvalue.join(F.broadcast(threshold))
            .filter(F.col("value") > F.col("threshold"))
            .select(
                F.col("l_partkey").alias("partkey"),
                F.round("value", 2).alias("part_value"),
            )
        )

    raise ValueError(qname)


def main() -> None:
    from hazelcast_jet_contrib_spark import get_spark
    from hazelcast_jet_contrib_spark.cache import release_tracked

    spark = get_spark(app_name="mb_subq")
    names = [
        "q2_min_cost_supplier",
        "q17_small_quantity_revenue",
        "q15_top_supplier",
        "q11_important_parts",
    ]
    for qname in names:
        a = {tuple(r) for r in build(spark, qname, "shipped").collect()}
        release_tracked()
        spark.catalog.clearCache()
        b = {tuple(r) for r in build(spark, qname, "opt").collect()}
        release_tracked()
        spark.catalog.clearCache()
        assert a == b, f"{qname}: row sets differ ({len(a)} vs {len(b)})"
        print(f"{qname}: row sets IDENTICAL ({len(a)} rows)")

    for qname in names:
        times: dict[str, list[float]] = {"shipped": [], "opt": []}
        for rep in range(REPS):
            order = ["shipped", "opt"] if rep % 2 == 0 else ["opt", "shipped"]
            for variant in order:
                df = build(spark, qname, variant)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                times[variant].append(dt)
                release_tracked()
                spark.catalog.clearCache()
        print(
            f"{qname}: shipped min={min(times['shipped']):.3f} "
            f"{[round(t, 3) for t in times['shipped']]} | "
            f"opt min={min(times['opt']):.3f} "
            f"{[round(t, 3) for t in times['opt']]}"
        )


if __name__ == "__main__":
    main()

"""Simulate the external driver's correctness gate: bare SparkSession,
entry() smoke, then every queries()[name] at sf0.01 compared against
oracle_sql()[name] in DuckDB (sorted column names + row multiset, floats
rounded to 6 decimals, timestamps normalized).

Usage: python scripts/driver_sim.py [sf_dir] [query-name-substring ...]
Exit code 0 iff all checked queries match.
"""

from __future__ import annotations

import math
import sys
import time
from datetime import datetime
from pathlib import Path

import duckdb
from pyspark.sql import SparkSession

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    df = e.entry(spark)
    print(f"ENTRY rows={len(df.collect())} cols={df.columns}")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    fails = 0
    for name in sorted(qs):
        if name_filters and not any(f in name for f in name_filters):
            continue
        t0 = time.perf_counter()
        sdf = qs[name](spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = sorted(
            (tuple(norm(r[c]) for c in scols) for r in sdf.collect()), key=repr
        )
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows) [{dt:.2f}s]")
            continue
        res = con.execute(oracles[name])
        dcols_raw = [d[0] for d in res.description]
        dcols = sorted(dcols_raw)
        idx = [dcols_raw.index(c) for c in dcols]
        drows = sorted((tuple(norm(r[i]) for i in idx) for r in res.fetchall()), key=repr)
        if scols == dcols and srows == drows:
            print(f"{name}: MATCH ({len(srows)} rows) [{dt:.2f}s]")
        else:
            fails += 1
            print(f"{name}: MISMATCH cols {scols} vs {dcols}; n {len(srows)} vs {len(drows)}")
            for label, rows in (("spark", srows), ("duck ", drows)):
                print(f"  {label}: {rows[:2]}")
    print(f"FAILS={fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

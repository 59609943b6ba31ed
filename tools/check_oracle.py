"""Dev-loop parity checker mirroring the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names/order
(sorted), and an order-insensitive value comparison.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_run(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def normalize(df):
    """pandas frame → (sorted colnames, sorted row tuples of repr strings)."""
    import pandas as pd  # noqa: F401

    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        rows.append(tuple(_canon(v) for v in tup))
    return list(df.columns), sorted(rows)


def _canon(v):
    import datetime
    import math

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        # DATE columns surface as midnight timestamps via pandas; both
        # engines agree at the type level (date32), so canonicalize
        if (v.hour, v.minute, v.second, v.microsecond, v.nanosecond) == (0, 0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from securities_pricing_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(sys.argv[2:])
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            ddf = duck_run(sf_dir, oracles[name])
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        scols, srows = normalize(sdf)
        dcols, drows = normalize(ddf)
        if scols != dcols:
            failures.append(name)
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        bad = [(a, b) for a, b in zip(srows, drows) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row diffs; first: spark={bad[0][0]} duck={bad[0][1]}")
            continue
        print(f"PASS {name}: {len(srows)} rows, {len(scols)} cols")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()

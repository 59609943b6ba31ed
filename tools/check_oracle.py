"""Dev-loop parity checker mirroring the driver's correctness gate.

Runs each ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names/order
(sorted), and an order-insensitive value comparison.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

``--json`` additionally writes a machine-readable per-query artifact
(committed per round as ORACLE_r{N}.json so the full-registry pass/fail
claim is auditable from the repo, not just the driver's first-50 file).
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    import __spark_entry__ as e
    from securities_pricing_data_pipeline_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = e.queries()
    oracles = e.oracle_sql()
    only = set(argv[1:])
    failures = []
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": "fail", "err": f"spark {type(ex).__name__}: {ex}"[:300]}
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            report[name] = {"status": "rows_only", "spark_rows": len(sdf)}
            print(f"ok?  {name}: rows-only check, {len(sdf)} rows")
            continue
        try:
            ddf = duck_run(sf_dir, oracles[name])
        except Exception as ex:
            failures.append(name)
            report[name] = {"status": "fail", "err": f"duckdb {type(ex).__name__}: {ex}"[:300]}
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            continue
        scols, srows = normalize(sdf)
        dcols, drows = normalize(ddf)
        if scols != dcols:
            failures.append(name)
            report[name] = {"status": "fail", "err": f"columns spark={scols} duck={dcols}"}
            print(f"FAIL {name}: columns spark={scols} duck={dcols}")
            continue
        if len(srows) != len(drows):
            failures.append(name)
            report[name] = {"status": "fail", "err": f"rowcount spark={len(srows)} duck={len(drows)}"}
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            continue
        bad = [(a, b) for a, b in zip(srows, drows) if a != b]
        if bad:
            failures.append(name)
            report[name] = {"status": "fail", "err": f"{len(bad)}/{len(srows)} row diffs"}
            print(f"FAIL {name}: {len(bad)}/{len(srows)} row diffs; first: spark={bad[0][0]} duck={bad[0][1]}")
            continue
        report[name] = {"status": "pass", "rows": len(srows), "cols": len(scols)}
        print(f"PASS {name}: {len(srows)} rows, {len(scols)} cols")
    if json_out:
        import json

        n_pass = sum(1 for r in report.values() if r["status"] == "pass")
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_queries": len(report),
                    "n_pass": n_pass,
                    "n_fail": len(failures),
                    "n_rows_only": sum(
                        1 for r in report.values() if r["status"] == "rows_only"
                    ),
                    "queries": report,
                },
                fh,
                indent=1,
            )
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()

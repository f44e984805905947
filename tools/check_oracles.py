"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its DuckDB oracle side-by-side,
compare row counts + sorted values. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from dmid_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_rows(cols, rows):
    # driver compares order-insensitively with columns sorted by name
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [cols[i] for i in idx], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in os_:
            print(f"{name:30s} rows-only: {len(s_rows)} rows, schema={s_cols}")
            continue
        try:
            res = con.execute(os_[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"{name:30s} ORACLE SQL ERROR: {str(ex)[:200]}")
            failures.append(name)
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        ok_schema = sc == dc
        ok_count = len(sr) == len(dr)
        ok_vals = sr == dr
        status = "OK" if (ok_schema and ok_count and ok_vals) else "MISMATCH"
        print(f"{name:30s} {status}  spark={len(sr)} duck={len(dr)} schema={'=' if ok_schema else (sc, dc)}")
        if status != "OK":
            failures.append(name)
            if not ok_vals and ok_count:
                diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                for a, b in diff:
                    print(f"    spark={a}\n    duck ={b}")
            elif not ok_count:
                only_s = set(map(repr, sr)) - set(map(repr, dr))
                only_d = set(map(repr, dr)) - set(map(repr, sr))
                print(f"    only-in-spark (3): {list(only_s)[:3]}")
                print(f"    only-in-duck  (3): {list(only_d)[:3]}")
    print("\nFAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

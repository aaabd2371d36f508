"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from brink_spark.queries import ALL_QUERIES
    from brink_spark.session import get_spark

    spark = get_spark(
        "local[8]", shuffle_partitions=8, extra={"spark.ui.showConsoleProgress": "false"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    failures = []
    for name, (fn, sql) in ALL_QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            failures.append(name)
            continue
        if sql is None:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.sql(sql)
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = True
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {res.columns}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            ok = False
        else:
            sk = rows_key([c.lower() for c in scols], srows)
            dk = rows_key(dcols, drows)
            if sk != dk:
                diff_i = next(i for i, (a, b) in enumerate(zip(sk, dk)) if a != b)
                print(f"FAIL {name}: values differ at sorted row {diff_i}:")
                print(f"   spark:  {sk[diff_i]}")
                print(f"   duckdb: {dk[diff_i]}")
                ok = False
        if ok:
            print(f"PASS {name}: rows={len(srows)}")
        else:
            failures.append(name)

    print(f"\n{len(ALL_QUERIES) - len(failures)}/{len(ALL_QUERIES)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

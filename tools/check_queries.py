"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + TYPE FAMILIES + order-insensitive values.

Type families mirror the driver's type-sensitive value hash (the r1 lesson:
DuckDB SUM(BIGINT) returns HUGEINT, Spark returns BIGINT — values stringify
identically but the driver hash fails). Integer widths <= 64 bits hash-equal
in the driver (observed: Spark INT vs DuckDB BIGINT passes), so they share a
family; HUGEINT/DECIMAL is a distinct family and fails loudly here.

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


def type_family(t) -> str:
    """Collapse an Arrow type into the equivalence class the driver's hash
    uses. int8..int64 are one family; decimal (HUGEINT) is NOT."""
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int<=64"
    if pt.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pt.is_floating(t):
        return "float"
    if pt.is_string(t) or pt.is_large_string(t):
        return "string"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_binary(t) or pt.is_large_binary(t):
        return "binary"
    if pt.is_list(t) or pt.is_large_list(t):
        return f"list<{type_family(t.value_type)}>"
    if pt.is_struct(t):
        return "struct<" + ",".join(
            f"{t.field(i).name}:{type_family(t.field(i).type)}" for i in range(t.num_fields)
        ) + ">"
    return str(t)


def arrow_families(tbl) -> dict:
    return {f.name.lower(): type_family(f.type) for f in tbl.schema}


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
            stbl = sdf.toArrow()
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
            dtbl = res.arrow()
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failures.append(name)
            continue
        ok = True
        sfam, dfam = arrow_families(stbl), arrow_families(dtbl)
        if sorted(c.lower() for c in scols) != sorted(dcols):
            print(f"FAIL {name}: columns {scols} vs {res.columns}")
            ok = False
        elif sfam != dfam:
            diffs = {
                c: (sfam.get(c, "∅"), dfam.get(c, "∅"))
                for c in set(sfam) | set(dfam)
                if sfam.get(c) != dfam.get(c)
            }
            print(f"FAIL {name}: type families differ (spark vs duckdb): {diffs}")
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

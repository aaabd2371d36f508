"""The local gate must predict the driver's type-sensitive hash (r1 lesson:
str(v) normalization masked DuckDB HUGEINT vs Spark BIGINT on 9/25 queries).

These tests pin the type_family equivalence: an uncast DuckDB SUM (HUGEINT →
arrow decimal128(38,0)) must FAIL against an int64, while int widths <= 64
(Spark INT vs DuckDB BIGINT) must pass — the driver tolerates the latter
(observed: text_quality green in CORRECTNESS_r01 with int32 vs int64).
"""

import duckdb
import pyarrow as pa

from tools.check_queries import arrow_families, type_family


def test_uncast_sum_is_flagged():
    con = duckdb.connect()
    hug = con.sql("SELECT SUM(x) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)").arrow()
    assert type_family(hug.schema.field("s").type).startswith("decimal")
    i64 = pa.table({"s": pa.array([1], type=pa.int64())})
    assert arrow_families(hug) != arrow_families(i64)


def test_cast_sum_passes():
    con = duckdb.connect()
    ok = con.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
    ).arrow()
    i64 = pa.table({"s": pa.array([1], type=pa.int64())})
    assert arrow_families(ok) == arrow_families(i64)


def test_int_widths_share_family():
    i32 = pa.table({"n": pa.array([1], type=pa.int32())})
    i64 = pa.table({"n": pa.array([1], type=pa.int64())})
    assert arrow_families(i32) == arrow_families(i64)


def test_float_vs_int_distinct():
    f = pa.table({"v": pa.array([1.0], type=pa.float64())})
    i = pa.table({"v": pa.array([1], type=pa.int64())})
    assert arrow_families(f) != arrow_families(i)

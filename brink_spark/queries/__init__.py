"""Query registry for the driver contract (__spark_entry__.py).

Each entry pairs an idiomatic-Spark DataFrame builder with an ANSI-SQL
oracle string DuckDB runs over the same parquet views. Column names are
aliased identically on both sides (the driver's compare hashes values over
name-sorted columns). Float aggregates are rounded on both sides so
summation-order differences between engines can't flip the hash.
"""

from brink_spark.queries.relational import RELATIONAL_QUERIES
from brink_spark.queries.pipeline import PIPELINE_QUERIES

ALL_QUERIES: dict = {**RELATIONAL_QUERIES, **PIPELINE_QUERIES}


def spark_queries():
    return {name: fns[0] for name, fns in ALL_QUERIES.items()}


def oracle_sqls():
    return {name: fns[1] for name, fns in ALL_QUERIES.items() if fns[1] is not None}

"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship multi-join aggregation on sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 that is
  expressible over the driver's testdata tables — TPC-H-shaped relational
  coverage, crawl-stage relational analogues (normalize-dedup, anti-join
  vs seen set, cached inner-join dispatch, politeness top-k), and the
  training-data pipeline suite (exact/MinHash-LSH/SimHash/Jaccard/cosine
  dedup, brute-force + LSH similarity search, text analysis, multimodal
  stub). The crawl engine itself (wave loop, Bloom seen set, robots,
  checkpoint-resume) is exercised against its deterministic oracle in
  tests/ (`python -m pytest -x -q`) — see brink_spark/plans/compare.py.
- ``oracle_sql()``: DuckDB-equivalent SQL per query, column-aliased
  identically; float aggregates are reduced to exact scaled integers so
  summation order can't flip the value hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from brink_spark.queries import oracle_sqls, spark_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from brink_spark.queries.relational import q_revenue_by_nation

    return q_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    return oracle_sqls()

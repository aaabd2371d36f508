"""Sketch aggregates: DataSketches HLL / Theta / KLL / count-min over the
driver tables — the mergeable-aggregate layer a 100 TB pipeline uses where
exact distinct/quantile state would not fit.

Why these are the scale path: a sketch aggregate is a commutative monoid,
so Spark's partial aggregation applies — each map task reduces its rows to
ONE ~4 KiB sketch per group and the shuffle moves sketches, not values
(the same reason the crawl engine's seen-set uses sharded Bloom/cuckoo
blocks, operators/seen.py). `hll_union_agg` then merges the partials
anywhere: across partitions, across days, across bucketed stores.

Determinism note (what makes the driver hash-gate applicable): HLL register
state is a per-bucket MAX and a Theta sketch keeps the k smallest hashes —
both update-order independent, so their estimates are bit-stable across
partitionings and merge orders. KLL compaction flips coins, so the KLL
surface is pytest-gated with rank-error tolerances (tests/test_sketches.py)
and kept OUT of the hash-compared registry.

The oracle contract for `sketch_distinct_users`: DuckDB pins the EXACT
per-group distinct counts and literal TRUE accuracy flags; the Spark side
emits the same exact counts plus `abs(est - exact)/exact <= 0.05` computed
from the sketches. A sketch drifting past 5% flips a flag to false and the
driver hash catches it — the estimate is verified without requiring DuckDB
to reproduce DataSketches internals.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_sketch_distinct_users(spark, sf):
    """Per-event-type distinct users three ways: exact (countDistinct),
    HLL (lgK=12, ~0.8% rse), Theta (default k=4096, exact below k).
    Output = exact count + boolean accuracy flags, hash-checkable (see
    module docstring). One aggregation; the sketch columns ride the same
    partial-agg shuffle as the exact count."""
    e = _t(spark, sf, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "hll_est"
        ),
        F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias(
            "theta_est"
        ),
    )
    tol = 0.05
    return agg.select(
        "event_type",
        "n_exact_users",
        (
            F.abs(F.col("hll_est") - F.col("n_exact_users"))
            <= tol * F.col("n_exact_users")
        ).alias("hll_within_5pct"),
        (
            F.abs(F.col("theta_est") - F.col("n_exact_users"))
            <= tol * F.col("n_exact_users")
        ).alias("theta_within_5pct"),
    )


SQL_SKETCH_DISTINCT = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact_users,
       TRUE AS hll_within_5pct,
       TRUE AS theta_within_5pct
FROM events GROUP BY event_type
"""


SKETCH_QUERIES = {
    "sketch_distinct_users": (q_sketch_distinct_users, SQL_SKETCH_DISTINCT),
}

"""DataSketches surface: merge semantics (the property that makes sketches
the 100 TB distinct/quantile path) + error bounds vs exact answers.

The load-bearing claim is MERGEABILITY: a two-level rollup — sketch per
fine group, union to coarse — must estimate the same set as sketching the
coarse group directly. That is what lets a cluster pre-aggregate per
partition/day/bucket and combine later without touching raw rows again.
"""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_two_level_rollup_equals_direct(spark):
    """Union of per-(type, dow) HLL sketches == direct per-type sketch:
    identical estimates, because HLL register state (per-bucket max) is
    merge-order independent."""
    e = _events(spark).withColumn("dow", F.dayofweek("ts"))
    fine = e.groupBy("event_type", "dow").agg(
        F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
    )
    rolled = fine.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    direct = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
            "est"
        )
    )
    r = {x["event_type"]: x["est"] for x in rolled.collect()}
    d = {x["event_type"]: x["est"] for x in direct.collect()}
    assert r == d  # bit-identical, not merely close


def test_hll_estimate_within_error_bound(spark):
    e = _events(spark)
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias(
                "est"
            ),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # lgK=12 -> rse ~1.04/sqrt(4096) ~ 1.6%; allow 3 sigma
        assert abs(r["est"] - r["exact"]) <= max(3, 0.05 * r["exact"]), r


def test_theta_sketch_exact_below_k(spark):
    """Theta keeps the k smallest hashes (default k=4096): below k the
    sketch is in exact mode and the estimate IS the distinct count."""
    e = _events(spark)
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.theta_sketch_estimate(F.theta_sketch_agg("user_id")).alias(
                "est"
            ),
        )
        .collect()
    )
    for r in rows:
        if r["exact"] < 4096:
            assert round(r["est"]) == r["exact"], r


def test_kll_quantile_rank_accuracy(spark):
    """KLL (k=200 default): the value returned for q=0.5 must sit at true
    rank 0.5 +/- 5% (the published 99%-confidence bound is ~1.65%; the
    slack absorbs KLL's randomized compaction)."""
    e = _events(spark).select(F.col("value").cast("double").alias("v"))
    est = e.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("v"), F.lit(0.5)
        ).alias("med")
    ).collect()[0]["med"]
    n = e.count()
    rank = e.where(F.col("v") <= est).count() / n
    assert abs(rank - 0.5) <= 0.05, (est, rank)


def _read_cms(spark, raw):
    """Deserialize a count_min_sketch aggregate back into the JVM sketch
    object so per-key estimates and merges are checkable from the test."""
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(raw))
    return jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)


def _cms(df, seed=42):
    return df.agg(
        F.count_min_sketch(
            "event_type", F.lit(0.001), F.lit(0.99), F.lit(seed)
        ).alias("cms")
    ).collect()[0]["cms"]


def test_count_min_bounds_and_merge(spark):
    """Count-min never undercounts, overshoots by at most eps*N
    (eps=0.001), and merging the sketches of an even/odd split estimates
    exactly like the whole-input sketch — the counter matrix is a sum, so
    any partitioning of the input merges to the same state."""
    e = _events(spark)
    n = e.count()
    truth = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    whole = _read_cms(spark, _cms(e))
    for k, true_n in truth.items():
        est = whole.estimateCount(k)
        assert true_n <= est <= true_n + 0.001 * n, (k, true_n, est)

    merged = _read_cms(spark, _cms(e.where(F.col("event_id") % 2 == 0)))
    merged.mergeInPlace(
        _read_cms(spark, _cms(e.where(F.col("event_id") % 2 == 1)))
    )
    for k in truth:
        assert merged.estimateCount(k) == whole.estimateCount(k), k

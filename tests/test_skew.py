"""AQE skew-join evidence: the session config this engine ships
(adaptive enabled, session.py) must actually SPLIT a pathologically
skewed join partition at runtime — the mechanism the scale notes lean on
whenever a hot key survives the explicit caps. The test builds a join
where one key holds ~100x the median partition's rows, lowers the skew
thresholds so the toy size triggers the same code path a 100 TB hot key
would, and asserts the FINAL adaptive plan marks the sort-merge join
skew=true (i.e. the hot partition was split into parallel subtasks, not
serialized onto one straggler)."""

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # shrink thresholds so a ~MB-scale hot key triggers the 100TB path
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_hot_key_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # left: 200k rows on ONE hot key + 20k uniform rows on 1k keys;
        # payload pads bytes so the hot partition crosses the threshold
        # pad = md5 hex of the row id: INCOMPRESSIBLE payload, so the hot
        # key's shuffle partition is big in compressed bytes too (skew
        # detection reads compressed map-output sizes; a constant-string
        # partition RLEs to nothing and never looks skewed)
        left = (
            spark.range(220_000)
            .select(
                F.when(F.col("id") < 200_000, F.lit("hot"))
                .otherwise(F.concat(F.lit("k"), F.pmod("id", F.lit(1000))))
                .alias("key"),
                F.concat(
                    F.md5(F.col("id").cast("string")),
                    F.md5((F.col("id") + 1).cast("string")),
                    F.md5((F.col("id") + 2).cast("string")),
                ).alias("pad"),
            )
        )
        right = spark.range(1_001).select(
            F.when(F.col("id") == 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.pmod("id", F.lit(1000))))
            .alias("key"),
            F.col("id").alias("tag"),
        )
        # NOTE: a groupBy(key) directly after the join SUPPRESSES the skew
        # split (splitting would break the partitioning the aggregate
        # reuses, and forceOptimizeSkewedJoin is off) — that suppression
        # is itself correct AQE behavior. A global aggregate imposes no
        # distribution requirement, so here the hot partition MUST split.
        joined = left.join(right, "key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pad")).alias("pad_bytes"),  # keeps pad unpruned
        )
        row = joined.collect()[0]
        assert row["n"] == 220_000  # every row matched exactly one right key
        assert row["pad_bytes"] == 220_000 * 96
        # the FINAL adaptive plan (post-execution) must show the skew split
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]

        # correctness is unaffected either way: per-key counts through the
        # (unsplit, partition-preserving) grouped plan
        grouped = left.join(right, "key").groupBy("key").count()
        rows = {r["key"]: r["count"] for r in grouped.collect()}
        assert rows["hot"] == 200_000
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

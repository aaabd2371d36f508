"""Deterministic training-shard sink (sources/corpus.py
write_training_shards): shard membership is a pure function of doc_id —
identical at any parallelism — and the export round-trips completely."""

from pyspark.sql import functions as F

from brink_spark.sources.corpus import write_training_shards


def _docs(spark, n=2000, parts=4):
    return (
        spark.range(n)
        .repartition(parts)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
        )
    )


def test_shard_membership_independent_of_parallelism(spark, tmp_path):
    m4 = write_training_shards(
        _docs(spark, parts=4), str(tmp_path / "p4"), rows_per_shard=300
    )
    m16 = write_training_shards(
        _docs(spark, parts=16), str(tmp_path / "p16"), rows_per_shard=300
    )
    assert m4 == m16  # same counts per shard...
    a = {
        (r["shard"], r["doc_id"])
        for r in spark.read.parquet(str(tmp_path / "p4")).collect()
    }
    b = {
        (r["shard"], r["doc_id"])
        for r in spark.read.parquet(str(tmp_path / "p16")).collect()
    }
    assert a == b  # ...and the same MEMBERS per shard


def test_round_trip_and_sizing(spark, tmp_path):
    m = write_training_shards(
        _docs(spark), str(tmp_path / "out"), rows_per_shard=300
    )
    assert m["n_shards"] == 7  # ceil(2000/300)
    assert sum(m["shard_rows"].values()) == m["total_rows"] == 2000
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 2000
    assert back.select("doc_id").distinct().count() == 2000
    # binomial spread around 2000/7 ~ 286: no empty and no mega shard
    sizes = list(m["shard_rows"].values())
    assert min(sizes) > 100 and max(sizes) < 600


def test_single_shard_corpus(spark, tmp_path):
    m = write_training_shards(
        _docs(spark, n=50), str(tmp_path / "one"), rows_per_shard=1000
    )
    assert m["n_shards"] == 1
    assert m["shard_rows"] == {"0": 50}

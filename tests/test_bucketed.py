"""Bucketed-table co-location: joins on the bucket key run shuffle-free.

Control/experiment pair: the SAME join over plain parquet inserts two
exchanges; over tables written with write_bucketed it inserts none (and
with sortBy, no sorts either). This is the at-rest partitioning strategy
for repeated doc_id joins over a 100 TB corpus.
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark, n, seed_col):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * seed_col).cast("long").alias("payload"),
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from brink_spark.sources.corpus import write_bucketed

    a = _mk(spark, 1000, 3)
    b = _mk(spark, 800, 7)
    write_bucketed(a, "bk_a", buckets=4, path=str(tmp_path / "a"))
    write_bucketed(b, "bk_b", buckets=4, path=str(tmp_path / "b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = spark.table("bk_a"), spark.table("bk_b")
        joined = ta.join(tb.withColumnRenamed("payload", "p2"), "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing replaced both shuffles
        assert joined.count() == 800

        # control: same join over non-bucketed parquet shuffles both sides
        a.write.mode("overwrite").parquet(str(tmp_path / "pa"))
        b.write.mode("overwrite").parquet(str(tmp_path / "pb"))
        pa = spark.read.parquet(str(tmp_path / "pa"))
        pb = spark.read.parquet(str(tmp_path / "pb")).withColumnRenamed(
            "payload", "p2"
        )
        assert "Exchange" in _plan(pa.join(pb, "doc_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_bucketed_corpus_roundtrip(spark, tmp_path):
    """The corpus documents shape survives the bucketed write unchanged."""
    from brink_spark.sources.corpus import write_bucketed

    rows = [(1, "a b c", "en", 5), (2, "d e", "fr", 3), (3, "f", "en", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    write_bucketed(df, "bk_docs", buckets=2, path=str(tmp_path / "docs"))
    try:
        back = spark.table("bk_docs")
        assert sorted(back.columns) == sorted(df.columns)
        assert {r["doc_id"] for r in back.collect()} == {1, 2, 3}
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_docs")

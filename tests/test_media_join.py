"""Media-span ⋈ media-features join: the interleaved text+media design.

The span model (functions/spans.py, reference ``Link`` parity
urls.go:34-38) carries ``media_ref`` URIs inline with prose; training
pipelines join those refs to a media table. Two scale strategies, both
pinned here:

- the media dim is vocabulary-bounded → broadcast join, span side never
  shuffles (q_media_span_join, the driver-gated query);
- the media table is itself petabyte-scale (raw payloads) → both sides
  live bucketed on media_ref, and the repeated join runs with ZERO
  exchanges (write-once co-location, same strategy as test_bucketed.py).
"""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _spans(spark, n_docs=400, refs_per_doc=5, vocab=37):
    return (
        spark.range(n_docs * refs_per_doc)
        .select(
            (F.col("id") % n_docs).alias("doc_id"),
            F.concat(
                F.lit("media://m"), (F.col("id") % vocab).cast("string")
            ).alias("media_ref"),
        )
    )


def _media(spark, vocab=37):
    return spark.range(vocab).select(
        F.concat(F.lit("media://m"), F.col("id").cast("string")).alias(
            "media_ref"
        ),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 2), 16, 10)
        .cast("long")
        .alias("media_bytes"),
    )


def _agg(joined):
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("media_bytes").alias("media_bytes"),
        )
        .orderBy("doc_id")
    )


def test_bucketed_media_join_has_no_exchange(spark, tmp_path):
    from brink_spark.sources.corpus import write_bucketed

    spans, media = _spans(spark), _media(spark)
    expected = [tuple(r) for r in _agg(spans.join(media, "media_ref")).collect()]

    write_bucketed(
        spans, "mj_spans", buckets=4, key="media_ref", path=str(tmp_path / "s")
    )
    write_bucketed(
        media, "mj_media", buckets=4, key="media_ref", path=str(tmp_path / "m")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("mj_spans").join(spark.table("mj_media"), "media_ref")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # co-located bucketing: the join itself inserts NO exchange on
        # either side (the per-doc agg after it still shuffles on doc_id,
        # so assert on the join plan, pre-aggregation)
        assert "Exchange" not in plan
        assert [tuple(r) for r in _agg(joined).collect()] == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS mj_spans")
        spark.sql("DROP TABLE IF EXISTS mj_media")


def test_driver_query_broadcasts_the_media_dim(spark):
    import os

    from brink_spark.queries.pipeline import q_media_span_join

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    df = q_media_span_join(spark, sf)
    plan = _plan(df)
    # the span side (100 TB at scale) must not shuffle for the join: the
    # vocabulary-bounded dim broadcasts
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert rows, "media join returned no rows on the test corpus"
    # every media span joined (the dim is derived from the same corpus)
    n_media = {r["doc_id"]: r["n_media"] for r in rows}
    spans = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split("text", " "),
                    lambda t: F.substring(t, 1, 1) == F.lit("m"),
                )
            ).alias("w"),
        )
        .groupBy("doc_id")
        .count()
        .collect()
    )
    assert n_media == {r["doc_id"]: r["count"] for r in spans}

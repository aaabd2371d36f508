"""Structured-Streaming frontier: the self-feeding stream must reproduce
the same contracts as the batch wave loop (one micro-batch == one wave)."""

from brink_spark.oracle import crawl_oracle
from brink_spark.plans.compare import compare_engine_oracle
from brink_spark.plans.crawl import CrawlEngine
from brink_spark.streaming.frontier_stream import StreamingCrawl

WAVES = 5


def test_streaming_crawl_matches_oracle(spark, tiny_fixture, tmp_path):
    from brink_spark.sources.sitegen import (
        pages_to_spark,
        robots_to_spark,
        seeds_to_spark,
    )

    oracle = crawl_oracle(tiny_fixture, tiny_fixture.config.with_(max_waves=WAVES))

    engine = CrawlEngine(
        spark,
        tiny_fixture.config.with_(max_waves=WAVES),
        str(tmp_path / "store"),
        pages=pages_to_spark(spark, tiny_fixture),
        robots=robots_to_spark(spark, tiny_fixture),
    )
    stream = StreamingCrawl(engine)
    stream.max_waves = WAVES
    waves = stream.run_until_drained(spark, seeds_to_spark(spark, tiny_fixture))
    assert waves == WAVES

    cmp = compare_engine_oracle(spark, engine, oracle)
    assert cmp.all_match, cmp.detail

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


def test_late_seed_arrival_converges_to_union_crawl(spark, tmp_path):
    """The module's stated use case: a NEW seed batch arrives while the
    stream is live (here: after the first crawl drained to idle — the
    deterministic arrival point). The stream resumes from the accumulated
    visited state and the FINAL visited set + per-doc spans equal the batch
    crawl of the seed UNION. (Crawl order can't match the union batch —
    the late seeds start late by construction.)"""
    from brink_spark.config import CrawlConfig
    from brink_spark.functions.spans import Span, render_html
    from brink_spark.functions.urls import normalize_url, scheme_and_host
    from brink_spark.sources.sitegen import Page, SiteFixture
    from brink_spark.sources.sitegen import pages_to_spark, robots_to_spark

    def _page(url, links=()):
        spans, off = [], 0
        for h in links:
            spans.append(Span("link", h, None, off))
            off += len(h)
        scheme, host = scheme_and_host(url)
        return Page(
            url_norm=normalize_url(url, (), False), url=url, host=host,
            scheme=scheme, status=200, content_length=500,
            body=render_html(spans), spans=spans,
        )

    # two chains; /shared is reachable from both (exercises cross-phase dedup)
    pages = [
        _page("https://s.example/a1", links=["/a2"]),
        _page("https://s.example/a2", links=["/shared"]),
        _page("https://s.example/b1", links=["/b2"]),
        _page("https://s.example/b2", links=["/shared"]),
        _page("https://s.example/shared"),
    ]
    cfg = CrawlConfig("https://s.example/a1", max_waves=50)
    fx = SiteFixture(
        scale="late", seed=0, pages=pages,
        seeds=[{"url": "https://s.example/a1", "priority": 0}],
        robots=[], config=cfg,
    )

    engine = CrawlEngine(
        spark, cfg, str(tmp_path / "stream_store"),
        pages=pages_to_spark(spark, fx), robots=robots_to_spark(spark, fx),
    )
    stream = StreamingCrawl(engine)
    seeds1 = spark.createDataFrame(
        [("https://s.example/a1", 0)], "url string, priority int"
    )
    query = stream.start(spark, seeds1)
    try:
        query.processAllAvailable()  # chain A drains; stream stays live
        waves_phase1 = stream._wave
        # late seed arrives on the LIVE stream
        stream.seed(
            spark.createDataFrame(
                [("https://s.example/b1", 0)], "url string, priority int"
            )
        )
        query.processAllAvailable()
    finally:
        query.stop()
    assert stream._wave > waves_phase1  # the late batch actually crawled

    # batch crawl of the seed union
    union_fx = SiteFixture(
        scale="late_union", seed=0, pages=pages,
        seeds=[
            {"url": "https://s.example/a1", "priority": 0},
            {"url": "https://s.example/b1", "priority": 0},
        ],
        robots=[], config=cfg,
    )
    union_oracle = crawl_oracle(union_fx)

    man = engine.store.read_manifest()
    got = {
        r["url_norm"]: r["status"]
        for r in engine.store.read_visited(spark, man).collect()
    }
    assert got == union_oracle.visited
    # per-doc span sequences also equal the union crawl's
    import pyspark.sql.functions as F
    res = spark.read.parquet(
        *[engine.store.wave_dir("results", w) for w in range(man.last_wave + 1)
          if engine.store.has("results", w)]
    )
    for r in res.filter(~F.col("cached")).collect():
        want = [
            (s.kind, s.text, s.media_ref, s.offset)
            for s in union_oracle.spans_by_doc[r["url_norm"]]
        ]
        have = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in (r["spans"] or [])
        ]
        assert have == want, r["url_norm"]

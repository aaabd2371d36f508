"""refetch_skip_unchanged (HTTP-304-style recrawl fast path): an expired
url whose body hash is unchanged refetches as outcome 'not_modified' —
parse skipped, handler told without a body, seen set re-armed with the
hash riding along for the next expiry cycle. A changed body takes the
full fetch+parse path."""

import pytest
from pyspark.sql import functions as F

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import Span, render_html
from brink_spark.functions.urls import normalize_url, scheme_and_host
from brink_spark.plans.crawl import CrawlEngine
from brink_spark.sources.sitegen import Page, SiteFixture

B = "https://x.example/b"


def _page(url, links=(), extra_text=""):
    spans, off = [], 0
    for h in links:
        spans.append(Span("link", h, None, off))
        off += len(h)
    spans.append(Span("text", f"content {url}{extra_text}", None, off))
    scheme, host = scheme_and_host(url)
    return Page(
        url_norm=normalize_url(url, (), False), url=url, host=host,
        scheme=scheme, status=200, content_length=500,
        body=render_html(spans), spans=spans,
    )


def _fixture(b_extra_text=""):
    pages = [
        _page("https://x.example/a", links=["/b"]),
        _page(B, links=["/c"], extra_text=b_extra_text),
        _page("https://x.example/c"),
    ]
    cfg = CrawlConfig(
        "https://x.example/a", max_waves=20,
        bloom_min_visited=0, refetch_skip_unchanged=True,
    )
    return SiteFixture(
        scale="refetch", seed=0, pages=pages,
        seeds=[{"url": "https://x.example/a", "priority": 0}],
        robots=[], config=cfg,
    )


def _expire_and_resume(spark, store_dir, fixture):
    eng = CrawlEngine(spark, fixture.config, store_dir)
    eng.expire_visited(spark.createDataFrame([(B,)], "url_norm string"))
    man = eng.store.read_manifest()
    waves_before = man.last_wave + 1
    seeds = spark.createDataFrame([(B, 0)], "url string, priority int")
    eng.run(fixture=fixture, resume=True, seeds=seeds)
    man2 = eng.store.read_manifest()
    rows = [
        r
        for w in range(waves_before, man2.last_wave + 1)
        if eng.store.has("results", w)
        for r in eng.store.read(spark, "results", w)
        .filter(F.col("url_norm") == B)
        .collect()
    ]
    logs = [
        r
        for w in range(waves_before, man2.last_wave + 1)
        if eng.store.has("fetchlog", w)
        for r in eng.store.read(spark, "fetchlog", w)
        .filter(F.col("url_norm") == B)
        .collect()
    ]
    return eng, rows, logs


def test_unchanged_refetch_is_not_modified_and_hash_survives(spark, tmp_path):
    fx = _fixture()
    store = str(tmp_path / "s")
    CrawlEngine(spark, fx.config, store).run(fixture=fx)

    eng, rows, logs = _expire_and_resume(spark, store, fx)
    assert len(rows) == 1, rows
    assert rows[0]["row_kind"] == "not_modified"
    assert rows[0]["cached"] is False and rows[0]["status"] == 200
    assert rows[0]["spans"] is None  # parse was skipped
    assert [r["outcome"] for r in logs] == ["not_modified"]

    # seen set re-armed: the url is live-visited again, with its hash
    man = eng.store.read_manifest()
    vis = eng.store.read_visited(spark, man).filter(
        F.col("url_norm") == B
    ).collect()
    assert len(vis) == 1 and vis[0]["content_hash"] is not None

    # SECOND expiry cycle: the hash carried on the not_modified row keeps
    # powering the fast path
    _, rows2, logs2 = _expire_and_resume(spark, store, fx)
    assert [r["row_kind"] for r in rows2] == ["not_modified"]
    assert [r["outcome"] for r in logs2] == ["not_modified"]


def test_changed_body_takes_the_full_path(spark, tmp_path):
    fx = _fixture()
    store = str(tmp_path / "s")
    CrawlEngine(spark, fx.config, store).run(fixture=fx)

    mutated = _fixture(b_extra_text=" v2")
    _, rows, logs = _expire_and_resume(spark, store, mutated)
    assert len(rows) == 1, rows
    assert rows[0]["row_kind"] == "fetched"
    assert rows[0]["spans"] is not None and len(rows[0]["spans"]) > 0
    assert [r["outcome"] for r in logs] == ["ok"]


def test_flag_off_visited_schema_unchanged(spark, tmp_path):
    fx = _fixture()
    cfg_off = fx.config.with_(refetch_skip_unchanged=False)
    fx_off = SiteFixture(
        scale="refetch", seed=0, pages=fx.pages, seeds=fx.seeds,
        robots=[], config=cfg_off,
    )
    eng = CrawlEngine(spark, cfg_off, str(tmp_path / "s"))
    eng.run(fixture=fx_off)
    man = eng.store.read_manifest()
    cols = eng.store.read_visited(spark, man).columns
    assert "content_hash" not in cols  # default path is byte-identical


def test_mixed_changed_and_unchanged_in_one_wave(spark, tmp_path):
    """One resume wave with BOTH paths: b unchanged (not_modified, no
    parse), c changed (full fetch+parse) — per-row classification, not
    per-wave."""
    fx = _fixture()
    store = str(tmp_path / "s")
    CrawlEngine(spark, fx.config, store).run(fixture=fx)

    c = "https://x.example/c"
    mutated_pages = [
        _page("https://x.example/a", links=["/b"]),
        _page(B, links=["/c"]),                      # unchanged
        _page(c, extra_text=" v2"),                  # changed
    ]
    mutated = SiteFixture(
        scale="refetch", seed=0, pages=mutated_pages,
        seeds=fx.seeds, robots=[], config=fx.config,
    )

    eng = CrawlEngine(spark, fx.config, store)
    eng.expire_visited(
        spark.createDataFrame([(B,), (c,)], "url_norm string")
    )
    man = eng.store.read_manifest()
    waves_before = man.last_wave + 1
    seeds = spark.createDataFrame([(B, 0), (c, 0)], "url string, priority int")
    eng.run(fixture=mutated, resume=True, seeds=seeds)
    man2 = eng.store.read_manifest()
    rows = {
        r["url_norm"]: r
        for w in range(waves_before, man2.last_wave + 1)
        if eng.store.has("results", w)
        for r in eng.store.read(spark, "results", w)
        .filter(F.col("url_norm").isin(B, c))
        .filter(F.col("row_kind").isin("fetched", "not_modified"))
        .collect()
    }
    assert rows[B]["row_kind"] == "not_modified" and rows[B]["spans"] is None
    assert rows[c]["row_kind"] == "fetched" and rows[c]["spans"] is not None

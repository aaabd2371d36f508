"""CrawlEngine.recrawl_order: freshness-driven recrawl scheduling from the
committed visited append-log. Two expire->refetch cycles with selective body
changes build per-url observation histories; the hook's ranking must equal a
Python oracle computing the same Cho/Garcia-Molina staleness score
(n_changes * age * 1e6 div span, waves as the clock) over the raw visited
rows, and the output must be seeds-shaped (url, priority rank)."""

import pyspark.sql.functions as F

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import Span, render_html
from brink_spark.functions.urls import normalize_url, scheme_and_host
from brink_spark.plans.crawl import CrawlEngine
from brink_spark.sources.sitegen import Page, SiteFixture

A = "https://x.example/a"
B = "https://x.example/b"
C = "https://x.example/c"


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


def _fixture(b_extra="", c_extra=""):
    pages = [
        _page(A, links=["/b"]),
        _page(B, links=["/c"], extra_text=b_extra),
        _page(C, extra_text=c_extra),
    ]
    cfg = CrawlConfig(
        A, max_waves=20, bloom_min_visited=0, refetch_skip_unchanged=True,
    )
    return SiteFixture(
        scale="recrawl", seed=0, pages=pages,
        seeds=[{"url": A, "priority": 0}],
        robots=[], config=cfg,
    )


def _expire_resume(spark, store, fixture, urls):
    eng = CrawlEngine(spark, fixture.config, store)
    eng.expire_visited(
        spark.createDataFrame([(u,) for u in urls], "url_norm string")
    )
    seeds = spark.createDataFrame(
        [(u, i) for i, u in enumerate(urls)], "url string, priority int"
    )
    eng.run(fixture=fixture, resume=True, seeds=seeds)
    return eng


def _python_oracle(spark, eng):
    """Recompute the staleness ranking from the RAW visited parquet."""
    man = eng.store.read_manifest()
    rows = spark.read.parquet(*eng.store.visited_paths(man)).collect()
    hist = {}
    for r in rows:
        fp = r["content_hash"] if r["content_hash"] is not None else str(r["status"])
        hist.setdefault(r["url_norm"], []).append((r["wave"], fp))
    now = max(w for h in hist.values() for w, _ in h)
    scored = []
    for url, obs in hist.items():
        obs.sort()
        if len(obs) < 2 or obs[-1][0] == obs[0][0]:
            continue
        changes = sum(1 for p, n in zip(obs, obs[1:]) if p[1] != n[1])
        span = obs[-1][0] - obs[0][0]
        stale = (changes * (now - obs[-1][0]) * 1_000_000) // span
        scored.append((-stale, url))
    return [u for _, u in sorted(scored)]


def test_recrawl_order_matches_history_oracle(spark, tmp_path):
    store = str(tmp_path / "s")
    # cycle 0: fresh crawl (a wave0, b wave1, c wave2)
    CrawlEngine(spark, _fixture().config, store).run(fixture=_fixture())
    # cycle 1: expire all three, refetch with only b's body changed
    _expire_resume(spark, store, _fixture(b_extra=" v2"), [A, B, C])
    # cycle 2: expire b and c, refetch with only c's body changed
    _expire_resume(
        spark, store, _fixture(b_extra=" v2", c_extra=" v2"), [B, C]
    )
    # cycle 3: expire only a (unchanged) — advances the crawl clock so b
    # and c carry nonzero age; a stays change-free (staleness 0)
    eng = _expire_resume(
        spark, store, _fixture(b_extra=" v2", c_extra=" v2"), [A]
    )

    got = eng.recrawl_order().collect()
    urls = [r["url"] for r in got]
    assert urls == _python_oracle(spark, eng)
    # priority is the 0-based staleness rank, seeds-shaped for run(seeds=...)
    assert [r["priority"] for r in got] == list(range(len(got)))
    assert got[0].__fields__ == ["url", "priority"]
    # sanity on the fixture's intent: all three urls have >=2 observations;
    # b and c each changed once and sit at nonzero age (staleness > 0),
    # a never changed (staleness 0 -> ranked strictly last)
    assert len(urls) == 3
    assert urls[-1] == normalize_url(A, (), False)

    # limit = top-k schedule
    top1 = eng.recrawl_order(limit=1).collect()
    assert [r["url"] for r in top1] == urls[:1]


def test_recrawl_order_empty_and_single_obs(spark, tmp_path):
    store = str(tmp_path / "s")
    eng = CrawlEngine(spark, _fixture().config, store)
    assert eng.recrawl_order().count() == 0  # no history at all
    eng.run(fixture=_fixture())
    # one observation per url: nothing is rankable yet
    assert eng.recrawl_order().count() == 0

"""Dynamic cookie-jar parity (reference brink.go:200-204, addCookies
267-274): response cookies merge into the shared jar by name; once the jar
holds a cookie whose name case-insensitively matches a session cookie name,
the Authorization header is dropped from every later request
(brink.go:177-184). Wave-discretized contract: cookies set by wave K's
fetches apply from wave K+1 on — identical in engine and oracle."""

import pytest

from brink_spark.config import AUTH_BASIC, CrawlConfig
from brink_spark.functions.spans import Span, render_html
from brink_spark.functions.urls import normalize_url, scheme_and_host
from brink_spark.oracle import crawl_oracle
from brink_spark.plans.crawl import CrawlEngine
from brink_spark.sources.sitegen import Page, SiteFixture


def _page(url: str, links=(), set_cookie=None) -> Page:
    spans, off = [], 0
    for h in links:
        spans.append(Span("link", h, None, off))
        off += len(h)
    scheme, host = scheme_and_host(url)
    return Page(
        url_norm=normalize_url(url, (), False),
        url=url,
        host=host,
        scheme=scheme,
        status=200,
        content_length=1000,
        body=render_html(spans),
        spans=spans,
        set_cookie=set_cookie,
    )


@pytest.fixture(scope="module")
def cookie_fixture():
    # wave 0 fetches /a (sets the session cookie) -> wave 1 fetches /b
    pages = [
        _page("https://c.example/a", links=["/b"], set_cookie="JSESSIONID=abc"),
        _page("https://c.example/b", links=["/c"], set_cookie="theme=dark"),
        _page("https://c.example/c"),
    ]
    cfg = CrawlConfig(
        "https://c.example/a",
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        session_cookie_names=("jsessionid",),
        cookies=(("greeting", "hi"),),
        max_waves=5,
    )
    return SiteFixture(
        scale="cookie",
        seed=0,
        pages=pages,
        seeds=[{"url": "https://c.example/a", "priority": 0}],
        robots=[],
        config=cfg,
    )


def test_cookie_jar_engine_oracle_parity(spark, cookie_fixture, tmp_path):
    oracle = crawl_oracle(cookie_fixture)
    assert oracle.cookie_jar == {
        "greeting": "hi",
        "JSESSIONID": "abc",
        "theme": "dark",
    }
    # JSESSIONID arrives from wave 0's fetch -> requests from wave 1 on
    # drop Authorization
    assert oracle.auth_suppressed_since_wave == 1

    engine = CrawlEngine(spark, cookie_fixture.config, str(tmp_path / "store"))
    engine.run(fixture=cookie_fixture)
    assert engine.cookie_jar == oracle.cookie_jar
    assert engine.auth_suppressed_since_wave == oracle.auth_suppressed_since_wave
    assert "Authorization" not in engine.request_headers()


def test_config_session_cookie_suppresses_from_wave_zero(spark, tmp_path):
    """A session cookie already in the CONFIG jar suppresses from wave 0
    (the reference drops the header on the very first request)."""
    pages = [_page("https://c.example/a")]
    cfg = CrawlConfig(
        "https://c.example/a",
        auth_type=AUTH_BASIC,
        user="u",
        password="p",
        session_cookie_names=("sid",),
        cookies=(("SID", "zzz"),),
        max_waves=2,
    )
    fx = SiteFixture(
        scale="cookie0",
        seed=0,
        pages=pages,
        seeds=[{"url": "https://c.example/a", "priority": 0}],
        robots=[],
        config=cfg,
    )
    assert crawl_oracle(fx).auth_suppressed_since_wave == 0
    engine = CrawlEngine(spark, cfg, str(tmp_path / "store0"))
    assert engine.auth_suppressed_since_wave == 0


def test_no_cookie_pages_leave_jar_untouched(spark, cookie_fixture, tmp_path):
    pages = [_page("https://c.example/a")]
    cfg = CrawlConfig("https://c.example/a", cookies=(("k", "v"),), max_waves=2)
    fx = SiteFixture(
        scale="nocookie",
        seed=0,
        pages=pages,
        seeds=[{"url": "https://c.example/a", "priority": 0}],
        robots=[],
        config=cfg,
    )
    engine = CrawlEngine(spark, cfg, str(tmp_path / "storen"))
    engine.run(fixture=fx)
    assert engine.cookie_jar == {"k": "v"}
    assert crawl_oracle(fx).cookie_jar == {"k": "v"}

"""Hot-SITE politeness fixture (VERDICT r4 item 8): N subdomains of ONE
registrable domain (s0..sN-1.hotsite.example), uniform per-host budget 3.

Host-keyed politeness multiplies the wave budget by the subdomain count —
exactly the loophole a crawler-operator abuses by sharding one origin
across subdomains; site mode (politeness_key='site') bounds the whole
registrable domain at the single budget. Both modes run the REAL engine
and must satisfy all four oracle contracts (the oracle's site mode mirrors
the engine's site-wide-rank semantics, exact under uniform budgets)."""

import pytest
from collections import Counter

from tests.conftest import MAX_WAVES, _test_config

HOT_SUBDOMAINS = 4
HOT_BUDGET = 3  # sitegen's uniform hot_site budget


@pytest.fixture(scope="module")
def hotsite_fixture():
    from brink_spark.sources.sitegen import generate_site

    return generate_site("tiny", 42, hot_site=HOT_SUBDOMAINS)


def _run(spark, fixture, tmp_path_factory, politeness_key):
    from brink_spark.plans.crawl import CrawlEngine
    from brink_spark.oracle import crawl_oracle

    cfg = _test_config(fixture).with_(politeness_key=politeness_key)
    store = str(tmp_path_factory.mktemp(f"hotsite_{politeness_key}") / "store")
    engine = CrawlEngine(spark, cfg, store)
    engine.run(fixture=fixture, max_waves=MAX_WAVES)
    return engine, crawl_oracle(fixture, cfg)


@pytest.fixture(scope="module")
def site_mode(spark, hotsite_fixture, tmp_path_factory):
    return _run(spark, hotsite_fixture, tmp_path_factory, "site")


@pytest.fixture(scope="module")
def host_mode(spark, hotsite_fixture, tmp_path_factory):
    return _run(spark, hotsite_fixture, tmp_path_factory, "host")


def _hot_per_wave(oracle_res) -> dict[int, int]:
    c = Counter()
    for wave, un in oracle_res.crawl_log:
        if "hotsite.example" in un:
            c[wave] += 1
    return dict(c)


def test_site_mode_four_contracts(spark, site_mode, hotsite_fixture):
    from brink_spark.plans.compare import compare_engine_oracle

    engine, oracle_res = site_mode
    cmp = compare_engine_oracle(spark, engine, oracle_res)
    assert cmp.visited_match, cmp.detail
    assert cmp.order_match, cmp.detail
    assert cmp.handler_match, cmp.detail
    assert cmp.spans_match, cmp.detail


def test_host_mode_four_contracts(spark, host_mode, hotsite_fixture):
    from brink_spark.plans.compare import compare_engine_oracle

    engine, oracle_res = host_mode
    cmp = compare_engine_oracle(spark, engine, oracle_res)
    assert cmp.visited_match, cmp.detail
    assert cmp.order_match, cmp.detail
    assert cmp.handler_match, cmp.detail
    assert cmp.spans_match, cmp.detail


def test_site_mode_bounds_hot_site_per_wave(site_mode, host_mode):
    # The budget-bounding claim itself, on the engine-verified crawl logs
    # (order_match above pins engine == oracle, so the oracle log IS the
    # engine's): site mode never exceeds the single per-site budget in any
    # wave; host mode exceeds it (multiplied across subdomains).
    _, site_res = site_mode
    _, host_res = host_mode
    site_counts = _hot_per_wave(site_res)
    host_counts = _hot_per_wave(host_res)
    assert max(site_counts.values()) <= HOT_BUDGET, site_counts
    assert max(host_counts.values()) > HOT_BUDGET, host_counts
    # and the multiplication is real: host mode peaks at >2x the budget
    assert max(host_counts.values()) >= 2 * HOT_BUDGET, host_counts
    # site mode saturates its budget (deferral, not starvation)
    assert HOT_BUDGET in site_counts.values(), site_counts


def test_hot_site_fixture_is_append_only():
    # hot_site=0 fixtures must stay byte-identical to earlier rounds:
    # the hot-site block draws nothing from the shared rng
    from brink_spark.sources.sitegen import generate_site

    base = generate_site("tiny", 42)
    ext = generate_site("tiny", 42, hot_site=HOT_SUBDOMAINS)
    assert [p.url_norm for p in ext.pages[: len(base.pages)]] == [
        p.url_norm for p in base.pages
    ]
    assert [p.body for p in ext.pages[: len(base.pages)]] == [
        p.body for p in base.pages
    ]
    extra = ext.pages[len(base.pages) :]
    assert len(extra) == HOT_SUBDOMAINS * 6
    assert {p.host.split(".", 1)[1] for p in extra} == {"hotsite.example"}

"""Site-keyed politeness (politeness_key='site'): subdomains of one
registrable site share a single per-wave budget; on 2-label-host corpora
site mode must be bit-identical to host mode (site == host there)."""

import pytest
from pyspark.sql import functions as F

from brink_spark.functions.domains import registrable_domain
from brink_spark.operators.politeness import apply_politeness


def _units(spark, hosts_urls):
    rows = [
        (host, f"https://{host}/p{i}", 0)
        for host, n in hosts_urls
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "host string, url_norm string, unit_priority int"
    )


def test_site_mode_shares_budget_across_subdomains(spark):
    units = _units(
        spark,
        [("a.shop.co.uk", 3), ("b.shop.co.uk", 3), ("c.other.net", 3)],
    )
    sited = units.withColumn("site", registrable_domain(F.col("host")))

    by_site = (
        apply_politeness(sited, None, default_budget=2, key="site")
        .filter("_eligible")
        .groupBy("site")
        .count()
        .collect()
    )
    got = {r["site"]: r["count"] for r in by_site}
    # shop.co.uk is ONE site: 2 eligible TOTAL across both subdomains
    assert got == {"shop.co.uk": 2, "other.net": 2}

    # host mode on the same units: 2 per HOST
    by_host = (
        apply_politeness(units, None, default_budget=2)
        .filter("_eligible")
        .groupBy("host")
        .count()
        .collect()
    )
    assert {r["host"]: r["count"] for r in by_host} == {
        "a.shop.co.uk": 2,
        "b.shop.co.uk": 2,
        "c.other.net": 2,
    }


def test_site_mode_deterministic_order_within_site(spark):
    # eligibility is the site-wide (priority, url_norm) top-k, so the
    # lexicographically-first urls across BOTH subdomains win
    units = _units(spark, [("a.shop.co.uk", 2), ("b.shop.co.uk", 2)])
    sited = units.withColumn("site", registrable_domain(F.col("host")))
    eligible = sorted(
        r["url_norm"]
        for r in apply_politeness(sited, None, default_budget=2, key="site")
        .filter("_eligible")
        .collect()
    )
    assert eligible == ["https://a.shop.co.uk/p0", "https://a.shop.co.uk/p1"]


@pytest.fixture(scope="module")
def site_mode_run(spark, tiny_fixture, tmp_path_factory):
    from tests.conftest import MAX_WAVES, _test_config
    from brink_spark.plans.crawl import CrawlEngine

    store = str(tmp_path_factory.mktemp("site_crawl") / "store")
    cfg = _test_config(tiny_fixture).with_(politeness_key="site")
    engine = CrawlEngine(spark, cfg, store)
    engine.run(fixture=tiny_fixture, max_waves=MAX_WAVES)
    return engine


def test_site_mode_engine_matches_oracle_on_2label_hosts(
    spark, site_mode_run, tiny_oracle
):
    # every fixture host is 2-label (siteN.example) so site == host and
    # the site-mode engine must satisfy all four oracle contracts exactly
    from brink_spark.plans.compare import compare_engine_oracle

    cmp = compare_engine_oracle(spark, site_mode_run, tiny_oracle)
    assert cmp.visited_match, cmp.detail
    assert cmp.order_match, cmp.detail
    assert cmp.handler_match, cmp.detail
    assert cmp.spans_match, cmp.detail


def test_politeness_key_toml_round_trip(tmp_path):
    from brink_spark.config import from_toml

    p = tmp_path / "c.toml"
    p.write_text('entrypoint = "https://x.example"\npoliteness-key = "site"\n')
    assert from_toml(str(p)).politeness_key == "site"
    bad = tmp_path / "bad.toml"
    bad.write_text('entrypoint = "https://x.example"\npoliteness-key = "tld"\n')
    with pytest.raises(ValueError):
        from_toml(str(bad))

"""Redirect-chain collapse (operators/redirects.py).

The reference follows 3xx chains transparently inside Fetch — the
zero-value ``&http.Client{}`` (factory.go:42, brink.go:194) uses Go's
``defaultCheckRedirect``: 9 hops allowed, the 10th refused ("stopped
after 10 redirects") → client.Do error → the caller's miss path
(brink.go:195-197). These tests pin the wave-model equivalent: chains
collapse to the final payload under the ORIGINAL url_norm key; dangling
targets, malformed Locations, loops, and >9-hop chains are misses.

The e2e four-contract equivalence over the (now redirect-bearing) tiny
fixture lives in test_e2e_crawl.py; here are the unit semantics plus the
fixture/WARC plumbing.
"""

import pytest
from pyspark.sql import functions as F

from brink_spark.functions.udfs import make_normalize_udf
from brink_spark.operators.redirects import collapse_redirect_chains

SCHEMA = (
    "url_norm string, page_status int, content_length long, "
    "body string, redirect_to string"
)


@pytest.fixture(scope="module")
def norm_udf():
    return make_normalize_udf((), False)


def _u(i: int) -> str:
    return f"http://h.example/p{i}"


def _collapse(spark, norm_udf, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = collapse_redirect_chains(df, norm_udf)
    assert "redirect_to" not in out.columns
    return {r["url_norm"]: r.asDict() for r in out.collect()}


def test_single_hop_resolves_to_final_payload(spark, norm_udf):
    got = _collapse(
        spark,
        norm_udf,
        [
            (_u(0), 301, 10, "", _u(1)),
            (_u(1), 200, 77, "final body", None),
        ],
    )
    assert got[_u(0)]["page_status"] == 200
    assert got[_u(0)]["body"] == "final body"
    assert got[_u(0)]["content_length"] == 77
    assert got[_u(1)]["page_status"] == 200  # the target row is untouched


def test_multi_hop_chain_and_intermediate(spark, norm_udf):
    got = _collapse(
        spark,
        norm_udf,
        [
            (_u(0), 301, 1, "", _u(1)),
            (_u(1), 302, 1, "", _u(2)),
            (_u(2), 404, 5, "gone", None),
        ],
    )
    # every chain entry point lands on the FINAL response (here a 404 —
    # the final status is what visitedURLs records, brink.go:103)
    assert got[_u(0)]["page_status"] == 404
    assert got[_u(1)]["page_status"] == 404
    assert got[_u(0)]["body"] == "gone"


def test_dangling_and_malformed_location_are_misses(spark, norm_udf):
    got = _collapse(
        spark,
        norm_udf,
        [
            (_u(0), 301, 1, "", "http://h.example/nowhere"),
            (_u(1), 301, 1, "", "http//bad"),  # malformed → normalize null
            (_u(2), 200, 1, "ok", None),
        ],
    )
    assert got[_u(0)]["page_status"] is None  # → outcome 'miss'
    assert got[_u(1)]["page_status"] is None
    assert got[_u(2)]["page_status"] == 200


def test_self_loop_is_a_miss(spark, norm_udf):
    got = _collapse(
        spark,
        norm_udf,
        [(_u(0), 301, 1, "", _u(0)), (_u(1), 200, 1, "ok", None)],
    )
    assert got[_u(0)]["page_status"] is None


def test_nine_hops_resolve_ten_do_not(spark, norm_udf):
    # chain c0→c1→...→c9→final: c1 needs 9 redirect responses (allowed),
    # c0 needs 10 (Go refuses the 10th)
    rows = [(_u(i), 301, 1, "", _u(i + 1)) for i in range(10)]
    rows.append((_u(10), 200, 1, "deep", None))
    got = _collapse(spark, norm_udf, rows)
    assert got[_u(1)]["page_status"] == 200
    assert got[_u(1)]["body"] == "deep"
    assert got[_u(0)]["page_status"] is None


def test_location_value_is_normalized_before_lookup(spark, norm_udf):
    # Location carries a raw URL; the pages table is keyed by url_norm —
    # param order must not matter
    udf = make_normalize_udf((), False)
    df = spark.createDataFrame(
        [
            ("http://h.example/p0", 301, 1, "", "http://h.example/x?b=2&a=1"),
            ("http://h.example/x?a=1&b=2", 200, 1, "ok", None),
        ],
        SCHEMA,
    )
    out = {r["url_norm"]: r.asDict() for r in collapse_redirect_chains(df, udf).collect()}
    assert out["http://h.example/p0"]["page_status"] == 200


def test_no_redirect_column_is_a_passthrough(spark, norm_udf):
    df = spark.createDataFrame(
        [(_u(0), 200, 1, "ok")],
        "url_norm string, page_status int, content_length long, body string",
    )
    assert collapse_redirect_chains(df, norm_udf) is df


def test_tiny_fixture_has_chains_and_no_301_survives(tiny_fixture, tiny_oracle):
    """The fixture emits 3xx rows with targets; since every 301 row
    redirects, no visited entry can ever record status 301 (the caller
    only sees final responses)."""
    reds = [p for p in tiny_fixture.pages if p.redirect_to is not None]
    assert reds, "tiny fixture must contain redirect pages"
    assert all(p.status == 301 for p in reds)
    assert 301 not in set(tiny_oracle.visited.values())


def test_e2e_crawl_with_redirect_chains(spark, tiny_fixture, tiny_oracle, tmp_path):
    """Four-contract engine↔oracle equivalence on a fixture where pages
    the crawl certainly reaches ARE redirects: single hops, a 2-hop
    chain, a dangling target, and a self-loop, all injected into visited
    locations of the base run."""
    import copy

    from brink_spark.oracle import crawl_oracle
    from brink_spark.plans.crawl import CrawlEngine
    from brink_spark.plans.compare import compare_engine_oracle

    fx = copy.deepcopy(tiny_fixture)
    by_key = fx.pages_by_key()
    # pages the BASE crawl visited with status 200 → certainly reachable
    reached = [
        by_key[k]
        for k, st in sorted(tiny_oracle.visited.items())
        if st == 200 and by_key[k].redirect_to is None
    ]
    assert len(reached) >= 8
    hop1, hop2a, hop2b, dangling, loop = reached[:5]
    mutated = {p.url_norm for p in (hop1, hop2a, hop2b, dangling, loop)}
    targets = [
        p for p in fx.pages if p.status == 200 and p.url_norm not in mutated
    ][:4]
    hop1.status, hop1.redirect_to = 301, targets[0].url
    hop2a.status, hop2a.redirect_to = 301, hop2b.url  # 2-hop chain head
    hop2b.status, hop2b.redirect_to = 301, targets[1].url
    dangling.status, dangling.redirect_to = 301, f"http://{dangling.host}/gone/zzz"
    loop.status, loop.redirect_to = 301, loop.url
    # seed the mutated URLs so wave 0 certainly fetches every chain shape
    # (mutating statuses shifts crawl dynamics; reachability via the graph
    # alone is not guaranteed within the wave cap)
    for p in (hop1, hop2a, dangling, loop):
        fx.seeds.append(dict(url=p.url, priority=0))

    config = fx.config.with_(max_content_length=100_000, max_waves=8)
    oracle = crawl_oracle(fx, config)
    # the chain heads resolved: final statuses recorded under their keys
    assert oracle.visited.get(hop1.url_norm) == targets[0].status
    assert oracle.visited.get(hop2a.url_norm) == targets[1].status
    assert dangling.url_norm not in oracle.visited
    assert loop.url_norm not in oracle.visited

    engine = CrawlEngine(spark, config, str(tmp_path / "redir_store"))
    engine.run(fixture=fx, max_waves=8)
    cmp = compare_engine_oracle(spark, engine, oracle)
    assert cmp.visited_match, cmp.detail
    assert cmp.order_match, cmp.detail
    assert cmp.handler_match, cmp.detail
    assert cmp.spans_match, cmp.detail.get("span_diffs")


def test_warc_round_trips_location(spark, tmp_path, tiny_fixture):
    from brink_spark.sources.warc import warc_to_pages, write_warc

    pages = [p for p in tiny_fixture.pages if p.redirect_to is not None][:3]
    pages += [p for p in tiny_fixture.pages if p.redirect_to is None][:3]
    path = str(tmp_path / "redir.warc")
    write_warc(pages, path)
    got = {
        r["url"]: r["redirect_to"]
        for r in warc_to_pages(spark, path).collect()
    }
    for p in pages:
        assert got[p.url] == p.redirect_to

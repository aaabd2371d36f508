"""Real-socket fetch stage (operators/http_fetch.py): a loopback HTTP
server serves a small site; the SAME crawl runs once through the synthetic
pages equi-join and once through fetch_mode='http' over actual sockets —
identical visited sets, handler rows, and span sequences. Plus unit checks
on statuses / bodies / Set-Cookie / transport-miss mapping."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from pyspark.sql import functions as F

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import Span, render_html
from brink_spark.functions.urls import normalize_url, scheme_and_host
from brink_spark.sources.sitegen import Page


def _mk_page(url, links=(), status=200, set_cookie=None):
    spans, off = [], 0
    for h in links:
        spans.append(Span("link", h, None, off))
        off += len(h)
    spans.append(Span("text", f"body of {url}", None, off))
    scheme, host = scheme_and_host(url)
    body = render_html(spans)
    return Page(
        url_norm=normalize_url(url, (), False), url=url, host=host,
        scheme=scheme, status=status, content_length=len(body.encode()),
        body=body, spans=spans, set_cookie=set_cookie,
    )


@pytest.fixture(scope="module")
def site_server():
    """Loopback server + the equivalent synthetic pages list."""
    state = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            entry = state.get(self.path)
            if entry is None:
                self.send_response(404)
                body = b"not found"
            else:
                self.send_response(entry["status"])
                body = entry["body"].encode()
                if entry["set_cookie"]:
                    self.send_header("Set-Cookie", entry["set_cookie"])
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"

    # /gone is an explicit 404 PAGE (the server answers, status 404) in
    # both worlds; the dead-port absolute link is the transport MISS in
    # both (no synthetic row / connection refused)
    pages = [
        _mk_page(f"{base}/a", links=["/b", "/c"], set_cookie="sid=1"),
        _mk_page(f"{base}/b", links=["/c", "/gone", "http://127.0.0.1:9/dead"]),
        _mk_page(f"{base}/c", status=200),
        _mk_page(f"{base}/gone", status=404),
    ]
    for p in pages:
        path = "/" + p.url.rsplit("/", 1)[-1]
        state[path] = {
            "status": p.status, "body": p.body, "set_cookie": p.set_cookie,
        }

    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield base, pages
    server.shutdown()


def test_http_fetch_columns_statuses_bodies_cookies(spark, site_server):
    from brink_spark.operators.http_fetch import http_fetch_columns

    base, pages = site_server
    dead = "http://127.0.0.1:9/x"  # port 9 (discard): connection refused
    units = spark.createDataFrame(
        [(p.url_norm, p.url) for p in pages]
        + [(normalize_url(f"{base}/missing", (), False), f"{base}/missing")]
        + [(normalize_url(dead, (), False), dead)],
        "url_norm string, url string",
    )
    rows = {
        r["url"]: r
        for r in http_fetch_columns(units, headers={"X-T": "1"}).collect()
    }
    for p in pages:
        assert rows[p.url]["page_status"] == p.status
        assert rows[p.url]["body"] == p.body
        assert rows[p.url]["content_length"] == len(p.body.encode())
    assert rows[pages[0].url]["set_cookie"] == "sid=1"
    assert rows[pages[1].url]["set_cookie"] is None
    assert rows[f"{base}/missing"]["page_status"] == 404
    # transport error -> null page row (downstream outcome 'miss')
    assert rows[dead]["page_status"] is None


def test_crawl_wave_over_real_sockets_equals_synthetic(
    spark, site_server, tmp_path
):
    """One crawl, two fetch backends, identical contracts."""
    from brink_spark.plans.crawl import CrawlEngine
    from brink_spark.sources.sitegen import SiteFixture, pages_to_spark

    base, pages = site_server
    cfg = CrawlConfig(f"{base}/a", max_waves=5)
    fx = SiteFixture(
        scale="http", seed=0, pages=pages,
        seeds=[{"url": f"{base}/a", "priority": 0}],
        robots=[], config=cfg,
    )
    seeds = spark.createDataFrame([(f"{base}/a", 0)], "url string, priority int")

    eng_syn = CrawlEngine(spark, cfg, str(tmp_path / "syn"), pages=pages_to_spark(spark, fx))
    eng_syn.run(seeds=seeds)
    eng_http = CrawlEngine(
        spark, cfg.with_(fetch_mode="http"), str(tmp_path / "http")
    )
    eng_http.run(seeds=seeds)

    def _state(eng):
        man = eng.store.read_manifest()
        vis = {
            (r["url_norm"], r["status"])
            for r in eng.store.read_visited(spark, man).collect()
        }
        res = spark.read.parquet(
            *[eng.store.wave_dir("results", w) for w in range(man.last_wave + 1)
              if eng.store.has("results", w)]
        )
        rows = sorted(
            (r["wave"], r["url_norm"], r["status"], r["cached"],
             tuple((s["kind"], s["text"], s["offset"]) for s in (r["spans"] or [])))
            for r in res.collect()
        )
        return vis, rows

    assert _state(eng_http) == _state(eng_syn)
    assert eng_http.cookie_jar == eng_syn.cookie_jar == {"sid": "1"}


def test_concurrent_kernel_overlaps_hosts(spark):
    """The r3 verdict's 'serial fetch kernel' fix: a partition holding K
    latency-bound HOSTS must approach K× overlap. Four loopback servers
    (four netlocs), each sleeping 0.25 s per request, 2 URLs per host:
    serial kernel ≈ 8 × 0.25 = 2 s of pure latency; the concurrent
    kernel overlaps the hosts (same-host URLs stay serial) ≈ 0.5 s. The
    bound asserts strictly better than half the serial latency floor,
    loose enough for CI jitter. Single partition so the overlap is
    attributable to the in-task pool, not Spark parallelism."""
    import time

    from brink_spark.operators.http_fetch import http_fetch_columns

    delay = 0.25

    class SlowHandler(BaseHTTPRequestHandler):
        def do_GET(self):
            time.sleep(delay)
            body = f"ok {self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    servers = [ThreadingHTTPServer(("127.0.0.1", 0), SlowHandler) for _ in range(4)]
    for s in servers:
        threading.Thread(target=s.serve_forever, daemon=True).start()
    try:
        urls = [
            f"http://127.0.0.1:{s.server_address[1]}{path}"
            for s in servers
            for path in ("/a", "/b")
        ]
        units = spark.createDataFrame(
            [(u, u) for u in urls], "url_norm string, url string"
        ).coalesce(1)

        def timed(pool_size):
            t0 = time.time()
            rows = {
                r["url"]: r
                for r in http_fetch_columns(
                    units, headers={}, pool_size=pool_size
                ).collect()
            }
            return time.time() - t0, rows

        timed(16)  # warm the session (first mapInPandas job pays setup)
        wall_c, rows = timed(16)
        wall_s, rows_s = timed(1)  # pool_size=1 == the old serial kernel
        # serial pays >= 8 * 0.25 = 2 s of latency on top of the same
        # Spark overhead; concurrent overlaps the 4 hosts (~0.5 s).
        assert wall_c < wall_s - len(urls) * delay / 2, (
            f"no overlap: concurrent {wall_c:.2f}s vs serial {wall_s:.2f}s"
        )
        for u in urls:
            assert rows[u]["page_status"] == 200
            assert rows[u]["body"] == "ok /" + u.rsplit("/", 1)[-1]
        assert {u: (r["page_status"], r["body"]) for u, r in rows.items()} == {
            u: (r["page_status"], r["body"]) for u, r in rows_s.items()
        }  # identical output either way — determinism under concurrency
    finally:
        for s in servers:
            s.shutdown()

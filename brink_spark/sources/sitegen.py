"""Deterministic synthetic web generator (FIXTURES.md §1-§5).

Builds the sandbox fetch-join target: a ``pages`` table (one row per
fetchable URL, keyed by its normalized form), ``seeds``, ``robots`` rules,
and a CrawlConfig. Everything derives from ``random.Random(seed)`` — no
external data. The link mix deliberately exercises every reference filter:
relative / absolute / scheme-relative / fragment-bearing / padded /
``javascript:;`` / ``#anchor`` / empty hrefs (urls.go:47-106), shuffled GET
params (urls.go:111-155), ignored params, forbidden paths (urls.go:166-175),
disallowed domains (brink.go:212-215), oversized bodies (brink.go:219-221)
and dead links (fetch miss).

Scales: ``tiny`` (~200 pages; unit/e2e), ``small`` (~5k; correctness),
``bench`` (~200k + hot-host skew; throughput). The hot host holds ~30% of
all pages — the skew fixture the salted politeness/fetch path must survive.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import Span, render_html
from brink_spark.functions.urls import normalize_url

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber basalt cedar dune ember fjord grove harbor inlet"
).split()

_PARAM_NAMES = ("id", "page", "redirect", "_tok", "something", "q", "ref")

_SCALES = {
    "tiny": dict(
        n_pages=200, n_hosts=6, hot_budget=5, cold_budget=50,
        text_spans=(1, 4), text_words=(4, 14),
    ),
    "small": dict(
        n_pages=5000, n_hosts=20, hot_budget=40, cold_budget=800,
        text_spans=(1, 4), text_words=(4, 14),
    ),
    # bench bodies are deliberately parse-heavy (~4-6 KB) so the fetch/parse
    # stage carries real CPU work — the scaling-efficiency measurement needs
    # parallel work to dominate the driver's serial floor
    "bench": dict(
        n_pages=200_000, n_hosts=50, hot_budget=20000, cold_budget=20000,
        text_spans=(3, 8), text_words=(60, 160),
    ),
    # 4x bench: the second point of the scaling-vs-workload-size study
    # (per-wave serial cost is constant, so efficiency grows with wave size)
    "xbench": dict(
        n_pages=800_000, n_hosts=50, hot_budget=80000, cold_budget=80000,
        text_spans=(3, 8), text_words=(60, 160),
    ),
}


@dataclass
class Page:
    url_norm: str  # join key: the normalized (post-ignore) URL the fetch resolves
    url: str  # canonical display URL (params in generated order)
    host: str
    scheme: str
    status: int
    content_length: int
    body: str
    spans: list[Span] = field(default_factory=list)
    # optional Set-Cookie response ("name=value"): merged into the shared
    # jar when fetched (reference brink.go:200-204, addCookies 267-274)
    set_cookie: str | None = None
    # optional Location target for 3xx rows: the reference's http.Client
    # follows redirects transparently (brink.go:194 `c.client.Do` with the
    # zero-value &http.Client{}, factory.go:42 — Go's defaultCheckRedirect
    # allows 9 hops, erroring on the 10th), so a fetch of this URL yields
    # the chain's FINAL status/body/cookies
    redirect_to: str | None = None


@dataclass
class SiteFixture:
    scale: str
    seed: int
    pages: list[Page]
    seeds: list[dict]  # {url, priority}
    robots: list[dict]  # {host, rule, path_prefix, crawl_delay_budget}
    config: CrawlConfig

    def pages_by_key(self) -> dict[str, Page]:
        return {p.url_norm: p for p in self.pages}

    def host_budgets(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for r in self.robots:
            out[r["host"]] = r["crawl_delay_budget"]
        return out


def _make_status(rng: random.Random) -> int:
    x = rng.random()
    if x < 0.90:
        return 200
    if x < 0.95:
        return 404
    if x < 0.98:
        return 301
    return 500


def _make_content_length(rng: random.Random) -> int:
    # lognormal tuned so ~2% exceed 512 KiB (FIXTURES.md §1)
    return int(rng.lognormvariate(10.5, 1.3)) + 64


def _href_variant(rng: random.Random, target: "Page", from_host: str) -> str:
    """Render a link to `target` in one of the messy forms the reference
    must canonicalize (urls_test.go:102-114 forms + resolution cases)."""
    u = target.url
    x = rng.random()
    if x < 0.45:
        return u
    if x < 0.60 and "?" in u:
        base, q = u.split("?", 1)
        params = q.split("&")
        rng.shuffle(params)
        return f"{base}?{'&'.join(params)}"
    if x < 0.80 and target.host == from_host:
        return u.split(target.host, 1)[1]  # "/path?..." relative form
    if x < 0.87:
        return f" {u} "  # padded; trimmed at link extraction (urls.go:101)
    if x < 0.92:
        return f"{u}#sec{rng.randrange(4)}"  # fragment → distinct url_norm → miss
    if x < 0.96:
        return "//" + u.split("://", 1)[1]  # scheme-relative quirk path
    return u


_SPECIAL_HREFS = ("javascript:;", "#top", "", " ", "mailto:x@example.org")


def generate_site(
    scale: str = "tiny", seed: int = 42, hot_site: int = 0
) -> SiteFixture:
    params = _SCALES[scale]
    rng = random.Random(seed)
    n_pages, n_hosts = params["n_pages"], params["n_hosts"]

    hosts = [f"site{i}.example" for i in range(n_hosts)] + ["hot.example"]
    schemes = {h: rng.choice(("http", "https")) for h in hosts}
    # two disallowed hosts (C1 gate): fetched for status, never traversed
    disallowed = {f"site{n_hosts-1}.example", f"site{n_hosts-2}.example"}
    ignored_params = ("_tok", "ref")
    fuzzy = True
    forbidden_paths = ("/forbidden",)

    # --- page URLs -----------------------------------------------------
    pages: list[Page] = []
    seen_keys: set[str] = set()
    for i in range(n_pages):
        host = "hot.example" if rng.random() < 0.30 else rng.choice(hosts[:-1])
        scheme = schemes[host]
        nseg = rng.randint(1, 3)
        segs = [rng.choice(_WORDS) for _ in range(nseg - 1)] + [f"p{i}"]
        if rng.random() < 0.04:
            segs.insert(0, "forbidden")
        if rng.random() < 0.05:
            # robots-deny target; ~30% land under the allow-exception prefix
            if rng.random() < 0.3:
                segs[0:0] = ["private", "pub"]
            else:
                segs.insert(0, "private")
        path = "/" + "/".join(segs)
        url = f"{scheme}://{host}{path}"
        if rng.random() < 0.20:
            names = rng.sample(_PARAM_NAMES, rng.randint(1, 3))
            q = "&".join(
                n if rng.random() < 0.2 else f"{n}={rng.randrange(100)}" for n in names
            )
            url = f"{url}?{q}"
        key = normalize_url(url, ignored_params, fuzzy)
        assert key is not None
        if key in seen_keys:
            continue
        seen_keys.add(key)
        pages.append(
            Page(
                url_norm=key,
                url=url,
                host=host,
                scheme=scheme,
                status=_make_status(rng),
                content_length=_make_content_length(rng),
                body="",
            )
        )

    # --- spans (interleaved text + media + links) ----------------------
    n = len(pages)
    t_spans, t_words = params["text_spans"], params["text_words"]
    for p in pages:
        spans_raw: list[tuple[str, str | None, str | None]] = []
        for _ in range(rng.randint(*t_spans)):
            nw = rng.randint(*t_words)
            spans_raw.append(("text", " ".join(rng.choices(_WORDS, k=nw)), None))
        for j in range(rng.randint(0, 3)):
            spans_raw.append(
                ("media", None, f"img://{p.host}/m{rng.randrange(10**6)}.png")
            )
        out_degree = min(40, 1 + int(rng.paretovariate(1.2)))
        for _ in range(out_degree):
            x = rng.random()
            if x < 0.78:
                target = pages[rng.randrange(n)]
                href = _href_variant(rng, target, p.host)
            elif x < 0.88:
                # dead link: well-formed URL with no page row (fetch miss)
                href = f"{p.scheme}://{p.host}/missing/m{rng.randrange(10**9)}"
            else:
                href = rng.choice(_SPECIAL_HREFS)
            spans_raw.append(("link", href, None))
        rng.shuffle(spans_raw)
        # <a target> on some links (reference Link parity). Derived from the
        # href, NOT from an rng draw — keeps the site graph byte-identical to
        # fixtures generated before the target field existed.
        spans_raw = [
            (k, t, m, "_blank" if k == "link" and len(t or "") % 4 == 0 else None)
            for (k, t, m) in spans_raw
        ]
        offset = 0
        spans: list[Span] = []
        for kind, text, media_ref, target in spans_raw:
            s = Span(kind, text, media_ref, offset, target)
            spans.append(s)
            offset += s.content_len()
        p.spans = spans
        p.body = render_html(spans)

    # --- redirect targets for 3xx rows ----------------------------------
    # Derived from a hash of the page's own url_norm, NOT from rng draws —
    # keeps the site graph byte-identical to fixtures generated before the
    # redirect field existed (same discipline as the <a target> derivation
    # above). Mix: mostly a real page (which may itself be a 301 → natural
    # chains), some dangling targets (transport error mid-chain → miss, the
    # Go client.Do error path), and a few self-loops (hop-cap → miss).
    import zlib

    for p in pages:
        if p.status == 301:
            h = zlib.crc32(p.url_norm.encode())
            r = h % 100
            if r < 6:
                p.redirect_to = f"{p.scheme}://{p.host}/gone/g{h % 10**6}"
            elif r < 10:
                p.redirect_to = p.url  # self-loop: >9 hops → client error
            else:
                p.redirect_to = pages[h % n].url

    # --- robots (rules + per-host politeness budgets) -------------------
    robots: list[dict] = []
    for host in hosts:
        budget = params["hot_budget"] if host == "hot.example" else params["cold_budget"]
        robots.append(
            dict(host=host, rule="deny", path_prefix="/private", crawl_delay_budget=budget)
        )
        if rng.random() < 0.5:
            # allow-exception under a deny (longest-prefix-match, deny on tie)
            robots.append(
                dict(host=host, rule="allow", path_prefix="/private/pub", crawl_delay_budget=budget)
            )

    # --- opt-in hot SITE: N subdomains of ONE registrable domain ---------
    # Appended AFTER the base graph with zero rng draws, so every
    # hot_site=0 fixture stays byte-identical to earlier rounds. All
    # subdomains carry the SAME budget (uniform-budget sites are the
    # regime where the engine's site-wide-rank semantics and the oracle's
    # first-k counting provably coincide — operators/politeness.py
    # docstring). With per-host budgets, host mode admits budget×N
    # hot-site fetches per wave; site mode bounds the whole registrable
    # domain at budget — the fixture for that contrast.
    hot_site_hosts: list[str] = []
    if hot_site > 0:
        sub_pages, hot_site_budget = 6, 3
        hot_site_hosts = [f"s{k}.hotsite.example" for k in range(hot_site)]
        roots = [f"https://{h}/h0" for h in hot_site_hosts]
        for k, h in enumerate(hot_site_hosts):
            for j in range(sub_pages):
                url = f"https://{h}/h{j}"
                hrefs: list[str] = []
                if j == 0:
                    # roots interlink: every subdomain is discoverable one
                    # wave after any root is fetched
                    hrefs += [r for i, r in enumerate(roots) if i != k]
                # chain + skip link: steady ~2 new URLs/host/wave, deep
                # enough that deferral (site mode) is visible for waves
                hrefs += [
                    f"https://{h}/h{j2}" for j2 in (j + 1, j + 2) if j2 < sub_pages
                ]
                spans_raw = [("text", f"hot site {h} page {j}", None)] + [
                    ("link", u, None) for u in hrefs
                ]
                offset = 0
                spans = []
                for kind, text, media_ref in spans_raw:
                    s = Span(kind, text, media_ref, offset, None)
                    spans.append(s)
                    offset += s.content_len()
                key = normalize_url(url, ignored_params, fuzzy)
                assert key is not None and key not in seen_keys
                seen_keys.add(key)
                pages.append(
                    Page(
                        url_norm=key,
                        url=url,
                        host=h,
                        scheme="https",
                        status=200,
                        content_length=4096,
                        body=render_html(spans),
                        spans=spans,
                    )
                )
            robots.append(
                dict(
                    host=h,
                    rule="deny",
                    path_prefix="/private",
                    crawl_delay_budget=hot_site_budget,
                )
            )

    # --- config + seeds --------------------------------------------------
    root_host = "site0.example"
    root_pages = [p for p in pages if p.host == root_host and p.status == 200]
    entry = root_pages[0].url if root_pages else pages[0].url
    allowed = tuple(
        f"{schemes[h]}://{h}" for h in hosts if h not in disallowed
    ) + tuple(f"https://{h}" for h in hot_site_hosts)
    config = CrawlConfig(
        entrypoint=entry,
        allowed_domains=allowed,
        ignore_get_parameters=ignored_params,
        fuzzy_get_parameter_checks=fuzzy,
        forbidden_paths=forbidden_paths,
        max_content_length=0,  # → 512 KiB default (factory.go:164-173)
    )
    seeds = [dict(url=entry, priority=0)]
    hot_200 = [p for p in pages if p.host == "hot.example" and p.status == 200]
    if hot_200:
        seeds.append(dict(url=hot_200[0].url, priority=1))
    if len(root_pages) > 1:
        seeds.append(dict(url=root_pages[1].url, priority=2))
    if hot_site_hosts:
        seeds.append(dict(url=f"https://{hot_site_hosts[0]}/h0", priority=0))

    return SiteFixture(
        scale=scale, seed=seed, pages=pages, seeds=seeds, robots=robots, config=config
    )


# ---------------------------------------------------------------------------
# Spark materialization


def pages_to_parquet(fixture: SiteFixture, path: str, rows_per_file: int = 100_000):
    """Write the pages table directly with pyarrow (multi-file dir layout).

    For large fixtures this avoids shipping the whole corpus through the
    Spark driver as one giant pickled local collection; Spark then reads
    the directory like any other parquet table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
                ("target", pa.string()),
            ]
        )
    )
    schema = pa.schema(
        [
            ("url_norm", pa.string()),
            ("url", pa.string()),
            ("host", pa.string()),
            ("scheme", pa.string()),
            ("status", pa.int32()),
            ("content_length", pa.int64()),
            ("body", pa.string()),
            ("spans", span_type),
        ]
    )
    pages = fixture.pages
    has_redirects = any(p.redirect_to is not None for p in pages)
    if has_redirects:
        schema = schema.append(pa.field("redirect_to", pa.string()))
    for i in range(0, len(pages), rows_per_file):
        chunk = pages[i : i + rows_per_file]
        table = pa.table(
            {
                "url_norm": [p.url_norm for p in chunk],
                "url": [p.url for p in chunk],
                "host": [p.host for p in chunk],
                "scheme": [p.scheme for p in chunk],
                "status": [p.status for p in chunk],
                "content_length": [p.content_length for p in chunk],
                "body": [p.body for p in chunk],
                "spans": [
                    [
                        {
                            "kind": s.kind,
                            "text": s.text,
                            "media_ref": s.media_ref,
                            "offset": s.offset,
                            "target": s.target,
                        }
                        for s in p.spans
                    ]
                    for p in chunk
                ],
                **(
                    {"redirect_to": [p.redirect_to for p in chunk]}
                    if has_redirects
                    else {}
                ),
            },
            schema=schema,
        )
        pq.write_table(table, os.path.join(path, f"part-{i // rows_per_file:05d}.parquet"))


def pages_to_spark(spark, fixture: SiteFixture):
    """pages DataFrame: the sandbox fetch-join target (SURVEY.md A1/H4)."""
    import pandas as pd

    from brink_spark.functions.spans import SPANS_TYPE
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("url_norm", StringType()),
            StructField("url", StringType()),
            StructField("host", StringType()),
            StructField("scheme", StringType()),
            StructField("status", IntegerType()),
            StructField("content_length", LongType()),
            StructField("body", StringType()),
            StructField("spans", SPANS_TYPE),
        ]
    )
    data = {
        "url_norm": [p.url_norm for p in fixture.pages],
        "url": [p.url for p in fixture.pages],
        "host": [p.host for p in fixture.pages],
        "scheme": [p.scheme for p in fixture.pages],
        "status": [p.status for p in fixture.pages],
        "content_length": [p.content_length for p in fixture.pages],
        "body": [p.body for p in fixture.pages],
        "spans": [[tuple(s) for s in p.spans] for p in fixture.pages],
    }
    # set_cookie column only when the fixture actually sets cookies — its
    # presence is what arms the engine's per-wave jar merge (no cost when
    # no page sets cookies)
    if any(p.set_cookie is not None for p in fixture.pages):
        schema = schema.add(StructField("set_cookie", StringType()))
        data["set_cookie"] = [p.set_cookie for p in fixture.pages]
    # redirect_to column only when the fixture has 3xx chains — its presence
    # arms the engine's run-level chain collapse (operators/redirects.py)
    if any(p.redirect_to is not None for p in fixture.pages):
        schema = schema.add(StructField("redirect_to", StringType()))
        data["redirect_to"] = [p.redirect_to for p in fixture.pages]
    rows = pd.DataFrame(data)
    return spark.createDataFrame(rows, schema=schema)


def seeds_to_spark(spark, fixture: SiteFixture):
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [StructField("url", StringType()), StructField("priority", IntegerType())]
    )
    return spark.createDataFrame(
        [(s["url"], s["priority"]) for s in fixture.seeds], schema=schema
    )


def robots_to_spark(spark, fixture: SiteFixture):
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("rule", StringType()),
            StructField("path_prefix", StringType()),
            StructField("crawl_delay_budget", IntegerType()),
        ]
    )
    return spark.createDataFrame(
        [
            (r["host"], r["rule"], r["path_prefix"], r["crawl_delay_budget"])
            for r in fixture.robots
        ],
        schema=schema,
    )

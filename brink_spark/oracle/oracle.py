"""Deterministic single-threaded oracle: the brink crawl loop, wave-discretized.

This is a faithful port of the reference's per-URL worker pipeline
(brink.go:72-138) with the one change required for distributed
reproducibility: the nondeterministic channel + 10-goroutine interleaving
(crawler.go:32-34, brink.go:58-69) is replaced by BFS *waves* with a total
within-wave order. This file defines the ordering contract the Spark engine
must reproduce (SURVEY.md §3.4):

- Wave 0 is the seed list (brink.go:33, ``linked_from='start'``).
- Within a wave, frontier edges are first normalized (urls.go:111-155;
  malformed dropped, brink.go:75-81), then split into *cached* edges (seen
  url_norm → cached handler dispatch with the stored status and empty body,
  brink.go:83-93) and *fetch units* (one per unseen distinct url_norm).
- A unit's priority is the min of its edges' priorities; its first edge —
  the one that "wins the fetch" and supplies linked_from + resolution base
  (brink.go:117) — is the min edge by (priority, linked_from, url).
- north_rule extensions gate units BEFORE fetch: robots deny
  (longest-prefix match, deny on ties; absent host → allowed) drops the
  unit without visiting; the per-host politeness budget admits the first
  ``budget(host)`` units in (priority, url_norm) order and defers the rest
  to the next wave (their edges carry over verbatim).
- Eligible units are fetched in (priority, host, url_norm) order — the
  crawl-order contract. Fetch outcomes mirror Fetch (brink.go:166-229):
  ``miss`` (no such page ≈ transport error, brink.go:95-101),
  ``not_allowed`` (domain gate; status discarded because the worker treats
  the error as fatal, brink.go:95-101 + 212-215), ``too_large``
  (brink.go:219-221), else ``ok``. Only ``ok`` units are recorded in
  visited and dispatched to handlers — exactly like the reference, where
  any Fetch error skips both the store and the handler.
- Handler rows: the first edge dispatches cached=False with the page's
  span array; every other same-unit edge dispatches cached=True with the
  same status and no body (the serialized reference behavior: the second
  worker finds the URL already visited).
- Traversal (status==200 and not pathForbidden, brink.go:111): link spans
  in document order; drop ``javascript:;`` and ``#``-prefixed hrefs on the
  RAW href, then trim ASCII spaces (urls.go:96-101); resolve against the
  first edge's ORIGINAL url (brink.go:117 — AbsoluteLinksIn(link.Href, ...);
  a malformed base url means no links at all); drop empty resolved hrefs
  (brink.go:125-128). New edges inherit the unit's priority.
- Next frontier = deferred edges + new edges; stop on empty frontier
  (the deterministic analogue of the idle-checker, brink.go:36-51).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import Span, link_hrefs
from brink_spark.functions.urls import (
    domain_key,
    normalize_url,
    path_forbidden,
    resolve_href,
    scheme_and_host,
    url_path,
    url_template_py,
)
from brink_spark.sources.sitegen import SiteFixture


class Edge(NamedTuple):
    linked_from: str
    url: str
    priority: int
    # link-hop distance from the seed set (seeds 0); powers the max_depth
    # trap guard. Defaulted so pre-guard call sites stay valid.
    depth: int = 0


class HandlerRow(NamedTuple):
    wave: int
    linked_from: str
    url_norm: str
    status: int
    cached: bool
    n_spans: int  # -1 for body-less dispatches (cached / non-first edges)


@dataclass
class CrawlResult:
    visited: dict[str, int] = field(default_factory=dict)  # url_norm → status
    handler_rows: list[HandlerRow] = field(default_factory=list)
    crawl_log: list[tuple[int, str]] = field(default_factory=list)  # (wave, url_norm) fetch order
    spans_by_doc: dict[str, list[Span]] = field(default_factory=dict)
    metrics: list[dict] = field(default_factory=list)
    n_waves: int = 0
    # shared cookie jar after the crawl (brink.go:267-274), wave-discretized:
    # cookies set by wave K's fetches apply from wave K+1 on
    cookie_jar: dict[str, str] = field(default_factory=dict)
    auth_suppressed_since_wave: Optional[int] = None


RANK_ITERS = 3
RANK_BUCKET_DIV = 10_000
RANK_BUCKET_CAP = 2_000_000_000


def _integer_pagerank(
    handler_rows: list[HandlerRow],
    upto_wave: int,
    ignored: tuple[str, ...],
    fuzzy: bool,
) -> dict[str, int]:
    """The engine's _compute_ranks, serial: integer PageRank over the
    distinct normalize(linked_from) -> url_norm edges of handler rows from
    waves [0, upto_wave). All-integer arithmetic (millionths, 85/100
    damping via floor division) — bit-exact vs Spark's ``div``."""
    edges: set[tuple[str, str]] = set()
    for r in handler_rows:
        if r.wave >= upto_wave or r.linked_from == "start":
            continue
        src = normalize_url(r.linked_from, ignored, fuzzy)
        if src is None:
            continue
        edges.add((src, r.url_norm))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(RANK_ITERS):
        insum: dict[str, int] = {}
        for s, d in edges:
            insum[d] = insum.get(d, 0) + rank[s] // deg[s]
        rank = {n: 150_000 + (85 * insum.get(n, 0)) // 100 for n in nodes}
    return rank


def _robots_denied(robots_rules: dict[str, list[tuple[str, str]]], host: str, path: str) -> bool:
    """Longest-prefix-match; deny wins ties; absent host → allowed."""
    rules = robots_rules.get(host)
    if not rules:
        return False
    best_len = -1
    best_deny = False
    for rule, prefix in rules:
        if path.startswith(prefix):
            l = len(prefix)
            deny = rule == "deny"
            if l > best_len or (l == best_len and deny):
                best_len, best_deny = l, deny
    return best_deny


def crawl_oracle(fixture: SiteFixture, config: Optional[CrawlConfig] = None) -> CrawlResult:
    config = config or fixture.config
    pages = fixture.pages_by_key()
    budgets = fixture.host_budgets()
    robots_rules: dict[str, list[tuple[str, str]]] = {}
    for r in fixture.robots:
        robots_rules.setdefault(r["host"], []).append((r["rule"], r["path_prefix"]))

    allowed_keys = set()
    for d in config.allowed_domains:
        dk = domain_key(d)
        if dk is not None:
            allowed_keys.add(dk)
    # root domain auto-allowed (factory.go:54, brink.go:151-162)
    root_key = domain_key(config.entrypoint)
    if root_key is not None:
        allowed_keys.add(root_key)

    ignored = config.ignore_get_parameters
    fuzzy = config.fuzzy_get_parameter_checks
    max_cl = config.effective_max_content_length

    res = CrawlResult()
    res.cookie_jar = dict(config.cookies)
    session_lower = {s.lower() for s in config.session_cookie_names}

    def _auth_check(w: int) -> None:
        if res.auth_suppressed_since_wave is None and session_lower and any(
            n.lower() in session_lower for n in res.cookie_jar
        ):
            res.auth_suppressed_since_wave = w

    _auth_check(0)
    frontier: list[Edge] = [Edge("start", s["url"], s["priority"]) for s in fixture.seeds]
    wave = 0
    rank_every = config.rank_priority_every
    # max_pages_per_host trap guard: lifetime fetch-attempt counts per host
    # (every eligible unit is an attempt — miss/not_allowed/too_large/ok
    # alike). Wave N's gating sees only waves < N, same as the engine.
    host_taken: dict[str, int] = {}
    # max_pages_per_template trap guard: lifetime fetch-attempt counts per
    # URL template (functions/templates.py url_template_py — the exact
    # Python mirror of the engine's native expression)
    # retry_misses trap-door: lifetime transport-miss counts per url
    miss_counts: dict[str, int] = {}
    template_taken: dict[str, int] = {}
    _tcap0 = getattr(config, "max_pages_per_template", 0)
    if _tcap0 > 0:
        # preblocked templates enter already saturated (engine parity)
        for _t in getattr(config, "preblocked_templates", ()):
            template_taken[_t] = _tcap0

    while frontier and wave < config.max_waves:
        # PageRank -> priority closed loop (engine: _reprioritize_frontier):
        # at every K-wave boundary, recompute integer ranks over the handler
        # rows committed so far and re-stamp the current frontier — each
        # edge's priority becomes its parent page's negated bucketed rank
        # (unranked parents and 'start' seeds keep their priority)
        if rank_every > 0 and wave > 0 and wave % rank_every == 0:
            rank_map = _integer_pagerank(res.handler_rows, wave, ignored, fuzzy)
            restamped = []
            for e in frontier:
                src = normalize_url(e.linked_from, ignored, fuzzy)
                if src is not None and src in rank_map:
                    p = -min(rank_map[src] // RANK_BUCKET_DIV, RANK_BUCKET_CAP)
                    restamped.append(Edge(e.linked_from, e.url, p, e.depth))
                else:
                    restamped.append(e)
            frontier = restamped
        m = dict(wave=wave, n_frontier=len(frontier), n_malformed=0, n_cached=0,
                 n_units=0, n_robots_denied=0, n_deferred=0, n_fetched=0,
                 n_miss=0, n_not_allowed=0, n_too_large=0, n_ok=0, n_new_links=0,
                 n_host_capped=0, n_template_capped=0, n_depth_capped=0,
                 n_miss_retry=0)

        # 1. normalize + drop malformed (C7)
        normed: list[tuple[Edge, str]] = []
        for e in frontier:
            un = normalize_url(e.url, ignored, fuzzy)
            if un is None:
                m["n_malformed"] += 1
                continue
            normed.append((e, un))

        # 2. cached dispatches for already-visited url_norms (H2)
        cached_rows: list[HandlerRow] = []
        fresh: list[tuple[Edge, str]] = []
        for e, un in normed:
            if un in res.visited:
                cached_rows.append(
                    HandlerRow(wave, e.linked_from, un, res.visited[un], True, -1)
                )
                m["n_cached"] += 1
            else:
                fresh.append((e, un))

        # 3. fetch units per distinct url_norm
        units: dict[str, list[Edge]] = {}
        for e, un in fresh:
            units.setdefault(un, []).append(e)
        m["n_units"] = len(units)

        unit_list = []
        for un, edges in units.items():
            edges_sorted = sorted(edges, key=lambda e: (e.priority, e.linked_from, e.url))
            prio = min(e.priority for e in edges)
            sh = scheme_and_host(un)
            host = sh[1] if sh else ""
            unit_list.append((prio, host, un, edges_sorted))

        # 4. robots gate (north_rule extension; pre-fetch)
        admitted = []
        for prio, host, un, edges in unit_list:
            p = url_path(un) or ""
            if _robots_denied(robots_rules, host, p):
                m["n_robots_denied"] += 1
                continue
            admitted.append((prio, host, un, edges))

        # 5. politeness budget per host (north_rule extension) + the
        # max_pages_per_host trap guard: the lifetime allowance clips the
        # per-wave budget; a host whose allowance was already exhausted by
        # PRIOR waves drops its queued units outright (edges vanish, so
        # the frontier drains and idle-stop still fires)
        admitted.sort(key=lambda t: (t[0], t[2]))  # (priority, url_norm) within host
        cap = config.max_pages_per_host
        # politeness grouping key: per-host (default), or per registrable
        # SITE (politeness_key='site', functions/domains.py). ``rank``
        # counts every non-capped unit of a group in (priority, url_norm)
        # order — the engine's site-wide window rank — and a unit is
        # eligible iff its rank fits its OWN host's budget. With uniform
        # budgets inside a site (the supported regime; the engine docstring
        # defines mixed budgets as engine-erring-toward-throttling) this is
        # exactly operators/politeness.py's two-phase top-k; in host mode
        # it degenerates to first-budget-per-host, the original contract.
        pol_key = getattr(config, "politeness_key", "host")
        if pol_key == "site":
            from brink_spark.functions.domains import registrable_domain_py

        rank: dict[str, int] = {}
        taken: dict[str, int] = {}
        t_taken_wave: dict[str, int] = {}
        tcap = getattr(config, "max_pages_per_template", 0)
        eligible, deferred_edges = [], []
        for prio, host, un, edges in admitted:
            # template trap guard fires BEFORE the host guard and before
            # politeness ranking (engine: the capped unit never enters
            # apply_politeness, so it consumes no budget rank)
            if tcap > 0:
                if template_taken.get(url_template_py(un), 0) >= tcap:
                    m["n_template_capped"] += 1
                    continue  # dropped, not deferred
            budget = budgets.get(host, config.politeness_budget)
            if cap > 0:
                remaining = cap - host_taken.get(host, 0)
                if remaining <= 0:
                    m["n_host_capped"] += 1
                    continue  # dropped, not deferred
                budget = min(budget, remaining)
            key = registrable_domain_py(host) if pol_key == "site" else host
            rank[key] = rank.get(key, 0) + 1
            if rank[key] <= budget:
                taken[host] = taken.get(host, 0) + 1
                if tcap > 0:
                    tpl = url_template_py(un)
                    t_taken_wave[tpl] = t_taken_wave.get(tpl, 0) + 1
                eligible.append((prio, host, un, edges))
            else:
                deferred_edges.extend(edges)
                m["n_deferred"] += 1
        for h, n in taken.items():  # visible from wave+1 on
            host_taken[h] = host_taken.get(h, 0) + n
        for t, n in t_taken_wave.items():  # visible from wave+1 on
            template_taken[t] = template_taken.get(t, 0) + n

        # 6. fetch in crawl order (the ordering contract)
        eligible.sort(key=lambda t: (t[0], t[1], t[2]))
        new_edges: list[Edge] = []
        wave_cookies: list[tuple[str, str]] = []
        for prio, host, un, edges in eligible:
            m["n_fetched"] += 1
            res.crawl_log.append((wave, un))
            first = edges[0]
            page = pages.get(un)
            # follow 3xx Location chains (brink.go:194 uses the zero-value
            # &http.Client{}; Go's defaultCheckRedirect allows 9 hops and
            # errors on the 10th → client.Do error → the miss path). The
            # caller sees only the FINAL response; the requested url_norm
            # is what gets visited and resolved against.
            hops = 0
            while page is not None and page.redirect_to is not None and hops < 9:
                tn = normalize_url(page.redirect_to, ignored, fuzzy)
                page = pages.get(tn) if tn is not None else None
                hops += 1
            if page is not None and page.redirect_to is not None:
                page = None  # 10th redirect refused — transport error
            if page is None:
                m["n_miss"] += 1
                retry_n = getattr(config, "retry_misses", 0)
                if retry_n > 0:
                    miss_counts[un] = miss_counts.get(un, 0) + 1
                    if miss_counts[un] <= retry_n:
                        # re-enqueue every discovering edge of the missed
                        # unit (engine parity: the url is not visited, so
                        # the edges flow as ordinary fresh edges next wave)
                        deferred_edges.extend(edges)
                        m["n_miss_retry"] += 1
                continue
            # response cookies merge BEFORE the domain/content gates
            # (brink.go:199-204: addCookies runs right after client.Do, so
            # not_allowed and too_large responses still update the jar)
            if page.set_cookie is not None:
                wave_cookies.append((un, page.set_cookie))
            dk = domain_key(un)
            if dk not in allowed_keys:
                m["n_not_allowed"] += 1
                continue
            if page.content_length > max_cl:
                m["n_too_large"] += 1
                continue
            m["n_ok"] += 1
            res.visited[un] = page.status
            res.handler_rows.append(
                HandlerRow(wave, first.linked_from, un, page.status, False, len(page.spans))
            )
            res.spans_by_doc[un] = page.spans
            for other in edges[1:]:
                res.handler_rows.append(
                    HandlerRow(wave, other.linked_from, un, page.status, True, -1)
                )

            # traversal gate (C4 ∧ ¬C3, brink.go:111)
            if page.status != 200 or path_forbidden(un, config.forbidden_paths):
                continue
            base = scheme_and_host(first.url)
            if base is None:  # AbsoluteLinksIn error → no links (brink.go:117-122)
                continue
            bscheme, bhost = base
            # a child sits one hop beyond its unit; the unit's depth is the
            # MIN over its discovering edges (engine: min window over url_norm)
            child_depth = min(e.depth for e in edges) + 1
            for raw in link_hrefs(page.spans):
                if raw == "javascript:;" or raw.startswith("#"):
                    continue
                href = raw.strip(" ")
                resolved = resolve_href(href, bscheme, bhost)
                if resolved == "":
                    continue
                if config.max_depth > 0 and child_depth > config.max_depth:
                    m["n_depth_capped"] += 1
                    continue
                new_edges.append(Edge(first.url, resolved, prio, child_depth))
                m["n_new_links"] += 1

        # response-cookie merge, sorted(url_norm) — the same deterministic
        # stand-in for goroutine arrival order the engine uses
        if wave_cookies:
            for _, sc in sorted(wave_cookies):
                name, _, value = sc.partition("=")
                res.cookie_jar[name] = value
            _auth_check(wave + 1)

        res.handler_rows.extend(cached_rows)
        res.metrics.append(m)
        frontier = deferred_edges + new_edges
        wave += 1

    res.n_waves = wave
    # canonical handler-row order: the cross-engine comparison key
    res.handler_rows.sort(
        key=lambda r: (r.wave, r.url_norm, r.cached, r.linked_from)
    )
    return res

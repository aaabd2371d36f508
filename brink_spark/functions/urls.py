"""URL kernel — exact-parity reimplementation of the reference URL semantics.

Pure-Python, dependency-free kernels. They are the single source of truth for
URL behavior: the Spark engine wraps them in vectorized pandas UDFs
(brink_spark.functions.udfs) and the deterministic oracle
(brink_spark.oracle) calls them directly, so both sides share one semantic.

Parity notes vs the reference (Go, /root/reference):

* ``parse_request_uri`` mirrors Go ``url.ParseRequestURI`` as used by the
  reference (urls.go:14-21, 111-164): absolute ``scheme://...`` URLs only;
  the *fragment is NOT split off* (Go's viaRequest parse keeps ``#...``
  inside path/query); the scheme is lowercased; host (with port) is kept
  verbatim; path and query values are percent-decoded.
* ``normalize_url`` mirrors ``Crawler.normalizeURL`` (urls.go:111-155):
  TrimSpace → parse → drop ignored GET params (exact match, then fuzzy
  "any ignored key is a substring of the param key", store/store.go:58-66)
  → re-emit each pair as ``k=v`` (bare ``k`` when the value is empty) →
  sort the rendered strings lexicographically → join with ``&``. With no
  surviving params the result is ``scheme://host path`` with no ``?``.
  Golden cases: urls_test.go:102-114.
* ``links_in`` mirrors ``LinksIn`` (urls.go:73-106): every ``<a>`` start
  tag yields (linked_from, href, target); ``href == "javascript:;"`` and
  (when ignore_anchors) ``href.startswith("#")`` are checked on the RAW
  href, and only then is the href trimmed of ASCII spaces
  (``strings.Trim(href, " ")``, urls.go:96-101) — the order matters and is
  preserved here.
* ``absolute_links_in`` mirrors ``AbsoluteLinksIn`` (urls.go:47-67)
  including its quirk: an ``//authority`` href becomes
  ``{scheme}://{href}`` — i.e. ``https:////authority`` with four slashes —
  because the Go code formats ``%s://%s`` rather than ``%s:%s``. We
  reproduce the behavior, not the doc-comment.
* ``path_forbidden`` mirrors ``pathForbidden`` (urls.go:166-175) +
  ``CStore.AnyContainsReverse`` (store/store.go:58-66): any stored
  forbidden string being a substring of the URL *path* forbids traversal.
  Golden cases: urls_test.go:200-203.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import NamedTuple, Optional, Sequence
from urllib.parse import unquote, unquote_plus

_URI_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?]*)([^?]*)(?:\?(.*))?$", re.S)


class ParsedURI(NamedTuple):
    scheme: str
    host: str  # includes port, case preserved (Go keeps Host verbatim)
    path: str  # percent-decoded, may embed a '#fragment' (Go viaRequest parse)
    raw_query: str


def parse_request_uri(url: str) -> Optional[ParsedURI]:
    """Go ``url.ParseRequestURI`` subset for absolute URLs; None on error.

    ``https//google.com`` (missing colon) → None (urls_test.go:25).
    """
    m = _URI_RE.match(url)
    if m is None:
        return None
    scheme, host, path, raw_query = m.groups()
    return ParsedURI(scheme.lower(), host, unquote(path), raw_query or "")


def scheme_and_host(url: str) -> Optional[tuple[str, str]]:
    """``schemeAndHost`` (urls.go:14-21). No whitespace trimming (parity)."""
    p = parse_request_uri(url)
    if p is None:
        return None
    return p.scheme, p.host


def domain_key(url: str) -> Optional[str]:
    """``scheme://host`` rendering used for the allowed-domains gate
    (brink.go:211, factory.go:158)."""
    p = parse_request_uri(url)
    if p is None:
        return None
    return f"{p.scheme}://{p.host}"


def url_path(url: str) -> Optional[str]:
    """``getPath`` (urls.go:157-164): TrimSpace → parse → decoded path."""
    p = parse_request_uri(url.strip())
    if p is None:
        return None
    return p.path


def _parse_query_go(raw_query: str) -> list[tuple[str, str]]:
    """Go ``url.Values`` / ``ParseQuery`` semantics (split on '&' only;
    chunks containing ';' skipped; '+' and %XX decoded; blanks kept)."""
    pairs: list[tuple[str, str]] = []
    for part in raw_query.split("&"):
        if not part or ";" in part:
            continue
        key, _, val = part.partition("=")
        pairs.append((unquote_plus(key), unquote_plus(val)))
    return pairs


def normalize_url(
    url: str,
    ignored_params: Sequence[str] = (),
    fuzzy: bool = False,
) -> Optional[str]:
    """``Crawler.normalizeURL`` (urls.go:111-155). None on parse failure
    (the crawl loop drops such URLs, brink.go:75-81)."""
    p = parse_request_uri(url.strip())
    if p is None:
        return None
    rendered: list[str] = []
    for key, val in _parse_query_go(p.raw_query):
        if ignored_params:
            if key in ignored_params:
                continue
            if fuzzy and any(ig in key for ig in ignored_params):
                continue
        rendered.append(key if val == "" else f"{key}={val}")
    if not rendered:
        return f"{p.scheme}://{p.host}{p.path}"
    rendered.sort()
    return f"{p.scheme}://{p.host}{p.path}?{'&'.join(rendered)}"


_TPL_PREFIX_RE = re.compile(r"^([a-z][a-z0-9+.\-]*://[^/?#]*)")
_TPL_DIGITS_RE = re.compile(r"[0-9]+")


def url_template_py(url_norm: str) -> str:
    """URL template key (trap-guard extension; see functions/templates.py
    for the native Spark twin): scheme://host prefix verbatim, digit runs
    in the remainder collapsed to '#'. Pure Python so the oracle stays
    pyspark-free."""
    m = _TPL_PREFIX_RE.match(url_norm)
    prefix = m.group(1) if m else ""
    return prefix + _TPL_DIGITS_RE.sub("#", url_norm[len(prefix):])


def path_forbidden(url: str, forbidden_paths: Sequence[str]) -> bool:
    """``pathForbidden`` (urls.go:166-175): substring match of any stored
    pattern against the URL's decoded path; parse failure → False."""
    p = url_path(url)
    if p is None:
        return False
    return any(fp in p for fp in forbidden_paths)


class Link(NamedTuple):
    linked_from: str
    href: str
    target: str


class _AnchorCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []  # (href, target), raw

    def handle_starttag(self, tag: str, attrs: list[tuple[str, Optional[str]]]):
        if tag != "a":
            return
        href = ""
        target = ""
        # Go iterates t.Attr in document order; later duplicates overwrite
        # (urls.go:87-94). html.parser yields the same order.
        for key, val in attrs:
            if key == "href":
                href = val or ""
            elif key == "target":
                target = val or ""
        self.anchors.append((href, target))


def links_in(linked_from: str, body: str, ignore_anchors: bool) -> list[Link]:
    """``LinksIn`` (urls.go:73-106)."""
    collector = _AnchorCollector()
    collector.feed(body)
    links: list[Link] = []
    for href, target in collector.anchors:
        if href == "javascript:;" or (ignore_anchors and href.startswith("#")):
            continue
        links.append(Link(linked_from, href.strip(" "), target))
    return links


def resolve_href(href: str, base_scheme: str, base_host: str) -> str:
    """The href rewrite inside ``AbsoluteLinksIn`` (urls.go:54-64),
    including the ``//`` → ``scheme://`` + href quirk (four slashes)."""
    if href.startswith("//"):
        return f"{base_scheme}://{href}"
    if href.startswith("/"):
        return f"{base_scheme}://{base_host}{href}"
    return href


def absolute_links_in(
    host_url: str, linked_from: str, body: str, ignore_anchors: bool
) -> Optional[list[Link]]:
    """``AbsoluteLinksIn`` (urls.go:47-67). None when host_url fails to
    parse (the crawl loop then extracts no links, brink.go:117-122)."""
    sh = scheme_and_host(host_url)
    if sh is None:
        return None
    scheme, host = sh
    return [
        Link(l.linked_from, resolve_href(l.href, scheme, host), l.target)
        for l in links_in(linked_from, body, ignore_anchors)
    ]

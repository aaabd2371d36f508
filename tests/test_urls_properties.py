"""Property-based tests (hypothesis) for the pure URL kernel.

The golden tests pin reference parity on known cases; these pin the
invariants the ENGINE depends on for arbitrary inputs: normalization is
idempotent and total (never raises), derived components are consistent
with each other, and link resolution output is always either '' or a
string the resolver itself leaves stable.
"""

import re

from hypothesis import given, settings, strategies as st

from brink_spark.functions.urls import (
    domain_key,
    normalize_url,
    parse_request_uri,
    resolve_href,
    scheme_and_host,
    url_path,
)

# URL-ish text: printable ASCII with URL punctuation over-weighted, plus
# some unicode — the frontier sees arbitrary href garbage from the wild
_urlish = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJ0123456789")
        + list(":/?#[]@!$&'()*+,;=%.-_~ \té中")
    ),
    max_size=80,
)
_hostish = st.from_regex(r"[a-z]{1,10}(\.[a-z]{1,5}){0,2}", fullmatch=True)
_params = st.lists(
    st.from_regex(r"[a-z_]{1,8}", fullmatch=True), max_size=3
).map(tuple)


@settings(max_examples=300, deadline=None)
@given(_urlish, _params, st.booleans())
def test_normalize_is_total_and_idempotent(url, ignored, fuzzy):
    out = normalize_url(url, ignored, fuzzy)  # must never raise (C7 = None)
    if out is not None:
        again = normalize_url(out, ignored, fuzzy)
        assert again == out, (url, out, again)


@settings(max_examples=300, deadline=None)
@given(_urlish, _params, st.booleans())
def test_normalized_components_are_consistent(url, ignored, fuzzy):
    out = normalize_url(url, ignored, fuzzy)
    if out is None:
        return
    sh = scheme_and_host(out)
    assert sh is not None, out  # a normalized URL always re-parses
    scheme, host = sh
    assert out.startswith(f"{scheme}://")
    assert domain_key(out) == f"{scheme}://{host}"
    p = url_path(out)
    assert p is not None
    parsed = parse_request_uri(out)
    assert parsed is not None and parsed.scheme == scheme and parsed.host == host


@settings(max_examples=300, deadline=None)
@given(_urlish, st.sampled_from(["http", "https"]), _hostish)
def test_resolve_href_never_raises_and_is_stable(href, scheme, host):
    out = resolve_href(href, scheme, host)
    assert isinstance(out, str)
    if out.startswith(f"{scheme}://{host}/"):
        # an absolutized URL must not absolutize again differently
        assert resolve_href(out, scheme, host) == out


@settings(max_examples=200, deadline=None)
@given(_urlish)
def test_parse_components_never_raise(url):
    for fn in (parse_request_uri, scheme_and_host, domain_key, url_path):
        fn(url)  # totality: arbitrary frontier garbage must not throw


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_url_template_total_idempotent_digit_free(s):
    """Template invariants the trap guard depends on, for arbitrary input:
    total (never raises), idempotent (a template re-templates to itself —
    the collapsed remainder carries no digits, and the verbatim prefix is
    re-extracted identically), and the output never has a digit outside
    the scheme://host prefix."""
    from brink_spark.functions.urls import url_template_py

    t = url_template_py(s)
    assert url_template_py(t) == t
    m = re.match(r"^[a-z][a-z0-9+.\-]*://[^/?#]*", t)
    rest = t[m.end():] if m else t
    assert not any(c.isdigit() for c in rest), (s, t)


@settings(max_examples=300, deadline=None)
@given(_urlish, _params, st.booleans())
def test_url_template_stable_under_renormalization(url, ignored, fuzzy):
    """normalize -> template == normalize -> normalize -> template: the
    guard keys on normalized urls, so template stability rides
    normalization idempotence."""
    from brink_spark.functions.urls import url_template_py

    n = normalize_url(url, ignored, fuzzy)
    if n is not None:
        n2 = normalize_url(n, ignored, fuzzy)
        if n2 is not None:
            assert url_template_py(n) == url_template_py(n2) or n != n2

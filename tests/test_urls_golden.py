"""Golden URL-kernel tests ported from the reference's table-driven tests.

Sources: /root/reference/urls_test.go (inputs + expected outputs ported
verbatim; the implementations under test are ours).
"""

import pytest

from brink_spark.functions.urls import (
    Link,
    absolute_links_in,
    links_in,
    normalize_url,
    path_forbidden,
    scheme_and_host,
)

HTML_NO_LINKS = "<html><header><title>This is title</title></header><body>Hello world</body></html>"
HTML_ANCHOR = '<html><header><title>This is title</title></header><body><a href="#">Hello world</a></body></html>'
HTML_TARGET_BLANK = '<html><header><title>This is title</title></header><body><a href="google.com" target="_blank">Hello world</a></body></html>'
HTML_TWO_LINKS = '<html><header><title>This is title</title></header><body><a href="google.com">Hello world</a><a href="liferay.com" target="_blank">Whatsup</a></body></html>'
HTML_JAVASCRIPT = '<html><header><title>This is title</title></header><body><a href="javascript:;">Hello world</a></body></html>'
HTML_DYNAMIC = '<html><header><title>This is title</title></header><body><a href="/hello" target="_blank">Hello world</a></body></html>'


# urls_test.go:19-25
@pytest.mark.parametrize(
    "url,want,want_err",
    [
        ("https://google.com", "https://google.com", False),
        ("https://google.com:80", "https://google.com:80", False),
        ("https://google.com/", "https://google.com", False),
        ("https://google.com/some/path", "https://google.com", False),
        ("https://google.com/some/path/", "https://google.com", False),
        ("https//google.com", "", True),
    ],
)
def test_scheme_and_host(url, want, want_err):
    got = scheme_and_host(url)
    if want_err:
        assert got is None
    else:
        assert got is not None
        assert f"{got[0]}://{got[1]}" == want


# urls_test.go:54-78
@pytest.mark.parametrize(
    "body,ignore_anchors,want",
    [
        (HTML_NO_LINKS, False, []),
        (HTML_NO_LINKS, True, []),
        (HTML_ANCHOR, False, [Link("https://www.liferay.com", "#", "")]),
        (HTML_ANCHOR, True, []),
        (HTML_TARGET_BLANK, True, [Link("https://www.liferay.com", "google.com", "_blank")]),
        (
            HTML_TWO_LINKS,
            True,
            [
                Link("https://www.liferay.com", "google.com", ""),
                Link("https://www.liferay.com", "liferay.com", "_blank"),
            ],
        ),
        (HTML_JAVASCRIPT, False, []),
    ],
)
def test_links_in(body, ignore_anchors, want):
    assert links_in("https://www.liferay.com", body, ignore_anchors) == want


# urls_test.go:102-114 — the golden normalize contract.
# normCrawler: no ignored params; ignoreCrawler: ignored=["something"].
@pytest.mark.parametrize(
    "ignored,url,want",
    [
        ((), "https://liferay.com", "https://liferay.com"),
        ((), "https://liferay.com?test=something", "https://liferay.com?test=something"),
        ((), "https://liferay.com?test=justTesting&something=123", "https://liferay.com?something=123&test=justTesting"),
        ((), "https://liferay.com?test", "https://liferay.com?test"),
        ((), "https://liferay.com?test&something", "https://liferay.com?something&test"),
        (("something",), "https://liferay.com?test=something", "https://liferay.com?test=something"),
        (("something",), "https://liferay.com?something=test", "https://liferay.com"),
        (("something",), "https://liferay.com?test=justTesting&shoot=123", "https://liferay.com?shoot=123&test=justTesting"),
        (("something",), "https://liferay.com?test=justTesting&something=123", "https://liferay.com?test=justTesting"),
        (("something",), "https://liferay.com?something=justTesting&something=123", "https://liferay.com"),
        (("something",), "https://liferay.com?test", "https://liferay.com?test"),
        (("something",), "https://liferay.com?something", "https://liferay.com"),
        (("something",), "https://liferay.com?test&something", "https://liferay.com?test"),
    ],
)
def test_normalize_url_golden(ignored, url, want):
    assert normalize_url(url, ignored_params=ignored, fuzzy=False) == want


def test_normalize_url_malformed():
    assert normalize_url("https//google.com") is None
    assert normalize_url("#anchor") is None
    assert normalize_url("javascript:;") is None


def test_normalize_url_fuzzy():
    # Fuzzy: stored key is a *substring of* the param key
    # (AnyContainsReverse direction, store/store.go:58-66;
    # documented in cmd/example-conf.toml:73-82).
    assert (
        normalize_url("https://x.com?_token=1&ok=2", ("tok",), fuzzy=True)
        == "https://x.com?ok=2"
    )
    # Without fuzzy the substring key does not match.
    assert (
        normalize_url("https://x.com?_token=1&ok=2", ("tok",), fuzzy=False)
        == "https://x.com?_token=1&ok=2"
    )


def test_normalize_url_fragment_stays_in_path():
    # Go ParseRequestURI (viaRequest) does not strip fragments: '#' stays
    # inside the path/query and is part of the normalized identity.
    assert normalize_url("https://x.com/a#sec") == "https://x.com/a#sec"
    assert normalize_url("https://x.com/a?b=1#f") == "https://x.com/a?b=1#f"


# urls_test.go:138-171
@pytest.mark.parametrize(
    "host_url,body,ignore_anchors,want",
    [
        ("https://google.com", HTML_NO_LINKS, False, []),
        ("https://google.com", HTML_NO_LINKS, True, []),
        ("https://google.com", HTML_ANCHOR, False, [Link("https://www.liferay.com", "#", "")]),
        ("https://google.com", HTML_ANCHOR, True, []),
        ("https://google.com", HTML_TARGET_BLANK, True, [Link("https://www.liferay.com", "google.com", "_blank")]),
        (
            "https://google.com",
            HTML_TWO_LINKS,
            True,
            [
                Link("https://www.liferay.com", "google.com", ""),
                Link("https://www.liferay.com", "liferay.com", "_blank"),
            ],
        ),
        ("https://google.com", HTML_JAVASCRIPT, False, []),
        (
            "https://google.com",
            HTML_DYNAMIC,
            True,
            [Link("https://www.liferay.com", "https://google.com/hello", "_blank")],
        ),
    ],
)
def test_absolute_links_in(host_url, body, ignore_anchors, want):
    assert absolute_links_in(host_url, "https://www.liferay.com", body, ignore_anchors) == want


def test_absolute_links_in_scheme_relative_quirk():
    # Faithful to urls.go:55-57: '//authority' → '{scheme}://{href}',
    # i.e. four slashes — behavior, not the doc-comment.
    body = '<a href="//cdn.example/x">c</a>'
    got = absolute_links_in("https://site.example", "https://site.example", body, True)
    assert got == [Link("https://site.example", "https:////cdn.example/x", "")]


# urls_test.go:200-203; forbidden set from urls_test.go:189-190
@pytest.mark.parametrize(
    "url,want",
    [
        ("https://www.liferay.com/group/control_panel/something", True),
        ("https://www.liferay.com/group/control_panel", True),
        (
            "http://localhost:8080/group/guest/~/control_panel/manage?p_p_id=com_liferay_document_library_web_portlet_DLAdminPortlet&p_p_lifecycle=0&p_p_state=maximized",
            True,
        ),
        ("https://www.liferay.com/", False),
    ],
)
def test_path_forbidden(url, want):
    assert path_forbidden(url, ("group/control_panel", "~/control_panel")) == want

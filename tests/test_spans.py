"""Span model: render/parse round-trip (pure) + the Arrow-batched D1 UDF."""

from pyspark.sql import functions as F

from brink_spark.functions.spans import Span, parse_spans, render_html
from brink_spark.functions.udfs import parse_spans_udf


def _mk(doc):
    spans = []
    off = 0
    for kind, text, media_ref in doc:
        s = Span(kind, text, media_ref, off)
        spans.append(s)
        off += s.content_len()
    return spans


def test_roundtrip_pure():
    spans = _mk(
        [
            ("text", "hello <world> & co", None),
            ("link", "  /padded?b=2&a=1  ", None),
            ("media", None, "img://h/x.png"),
            ("link", "javascript:;", None),
            ("text", 'quotes "inside"', None),
            ("link", "", None),
        ]
    )
    assert parse_spans(render_html(spans)) == spans


def test_roundtrip_offsets_strictly_increasing():
    spans = _mk([("text", "aa", None), ("media", None, "img://m"), ("link", "/x", None)])
    offs = [s.offset for s in spans]
    assert offs == [0, 2, 9]
    assert parse_spans(render_html(spans)) == spans


def test_parse_spans_udf_matches_kernel(spark, tiny_fixture):
    """The Arrow UDF must agree with the pure kernel on real fixture pages
    (and therefore with the generator's spans — the input_hint invariant)."""
    sample = tiny_fixture.pages[:40]
    df = spark.createDataFrame(
        [(p.url_norm, p.body) for p in sample], "url_norm string, body string"
    ).withColumn("spans", parse_spans_udf("body"))
    got = {r["url_norm"]: r["spans"] for r in df.collect()}
    for p in sample:
        parsed = [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["target"])
            for s in got[p.url_norm]
        ]
        want = [tuple(s) for s in p.spans]
        assert parsed == want, p.url_norm


def test_parse_spans_udf_null_body(spark):
    df = spark.createDataFrame([(None,), ("<html><body><p>x</p></body></html>",)], "body string")
    rows = df.withColumn("spans", parse_spans_udf("body")).collect()
    assert rows[0]["spans"] is None
    assert [s["text"] for s in rows[1]["spans"]] == ["x"]


def test_target_captured_through_span_path():
    """<a target> flows through the SPAN model, not just the links_in
    kernel (reference Link parity, urls.go:34-38,92-93): golden
    target_blank case + round-trip of a rendered target."""
    from brink_spark.functions.spans import Span, parse_spans, render_html

    html = (
        '<html><header><title>T</title></header><body>'
        '<a href="google.com" target="_blank">Hello world</a>'
        '<a href="liferay.com">Whatsup</a></body></html>'
    )
    links = [s for s in parse_spans(html) if s.kind == "link"]
    assert [(s.text, s.target) for s in links] == [
        ("google.com", "_blank"),
        ("liferay.com", None),
    ]

    spans = [
        Span("text", "hello", None, 0),
        Span("link", "/p1", None, 5, "_blank"),
        Span("link", "/p2", None, 8),
    ]
    assert parse_spans(render_html(spans)) == spans


def test_render_parse_roundtrip_property():
    """Property: render_html/parse_spans round-trip exactly for any span
    sequence the generator could emit (arbitrary content incl. HTML-special
    chars — escaping must be lossless; targets optional on links)."""
    from hypothesis import given, settings, strategies as st

    from brink_spark.functions.spans import Span, parse_spans, render_html

    content = st.text(
        alphabet=st.sampled_from(list("abc <>&\"'é中!./:=")), min_size=1, max_size=30
    )
    ref = st.from_regex(r"img://[a-z]{1,8}/[a-z0-9]{1,8}\.png", fullmatch=True)
    span_raw = st.one_of(
        st.tuples(st.just("text"), content, st.none(), st.none()),
        st.tuples(st.just("media"), st.none(), ref, st.none()),
        st.tuples(
            st.just("link"),
            content,
            st.none(),
            st.one_of(st.none(), st.just("_blank"), st.just("_self")),
        ),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(span_raw, max_size=8))
    def _check(raws):
        spans, off = [], 0
        for kind, text, media_ref, target in raws:
            s = Span(kind, text, media_ref, off, target)
            spans.append(s)
            off += s.content_len()
        assert parse_spans(render_html(spans)) == spans

    _check()

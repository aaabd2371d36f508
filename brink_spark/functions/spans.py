"""Interleaved-document span model (input_hint shape).

A document is ``array<struct<kind:string, text:string, media_ref:string,
offset:int, target:string>>`` in document order: ``text`` spans carry
prose, ``media`` spans carry a ``media_ref`` URI, ``link`` spans carry the
raw href in ``text`` and the ``<a target>`` attribute (reference ``Link``
parity, urls.go:34-38) in ``target``. The reference treats bodies as opaque bytes and only extracts
``<a>`` tags (urls.go:73-106); the span model extends that to interleaved
text + media while keeping link extraction semantics identical.

``offset`` is defined as the cumulative character length of all previous
spans' content (content = ``text`` for text/link spans, ``media_ref`` for
media spans). Both the HTML renderer (fixture generator) and the HTML
parser below use this rule, so parsed spans are byte-for-byte comparable
with generated ones — the per-row invariant is span-sequence equality on
(kind, text, media_ref, order).
"""

from __future__ import annotations

from html import escape
from html.parser import HTMLParser
from typing import NamedTuple, Optional

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
        # <a target> attribute, reference Link parity (urls.go:34-38,92-93);
        # None for non-link spans and links without the attribute. Last field
        # so positional tuple(span) conversions stay aligned.
        StructField("target", StringType()),
    ]
)
SPANS_TYPE = ArrayType(SPAN_STRUCT)

_MEDIA_TAGS = {"img", "video", "audio", "source"}


class Span(NamedTuple):
    kind: str
    text: Optional[str]
    media_ref: Optional[str]
    offset: int
    target: Optional[str] = None

    def content_len(self) -> int:
        if self.kind == "media":
            return len(self.media_ref or "")
        return len(self.text or "")


def render_html(spans: list[Span]) -> str:
    """Deterministic HTML rendering of a span array (fixture generator
    side). The parser below round-trips this exactly."""
    parts = ["<html><body>"]
    for s in spans:
        if s.kind == "text":
            parts.append(f"<p>{escape(s.text or '')}</p>")
        elif s.kind == "media":
            parts.append(f'<img src="{escape(s.media_ref or "", quote=True)}"/>')
        elif s.kind == "link":
            tgt = (
                f' target="{escape(s.target, quote=True)}"' if s.target is not None else ""
            )
            parts.append(f'<a href="{escape(s.text or "", quote=True)}"{tgt}>&#8226;</a>')
        else:  # pragma: no cover - generator never emits other kinds
            raise ValueError(f"unknown span kind {s.kind!r}")
    parts.append("</body></html>")
    return "".join(parts)


class _SpanParser(HTMLParser):
    """HTML → span array. Mirrors the reference's tokenizer scan
    (urls.go:73-106) for <a>, extended with text and media capture."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.spans: list[Span] = []
        self._offset = 0
        self._text_buf: list[str] = []
        self._in_body_text = False

    def _flush_text(self) -> None:
        if self._text_buf:
            text = "".join(self._text_buf)
            self._text_buf = []
            if text:
                self.spans.append(Span("text", text, None, self._offset))
                self._offset += len(text)

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._flush_text()
            href = ""
            target = None
            for k, v in attrs:
                if k == "href":
                    href = v or ""
                elif k == "target":  # urls.go:92-93
                    target = v or ""
            self.spans.append(Span("link", href, None, self._offset, target))
            self._offset += len(href)
        elif tag in _MEDIA_TAGS:
            self._flush_text()
            src = ""
            for k, v in attrs:
                if k == "src":
                    src = v or ""
            self.spans.append(Span("media", None, src, self._offset))
            self._offset += len(src)
        elif tag == "p":
            self._flush_text()
            self._in_body_text = True

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag == "p":
            self._flush_text()
            self._in_body_text = False

    def handle_data(self, data):
        if self._in_body_text:
            self._text_buf.append(data)

    def close(self):
        super().close()
        self._flush_text()


def parse_spans(html: Optional[str]) -> Optional[list[Span]]:
    """Parse an HTML body into its span array. None body → None (status-only
    rows from the content-length / not-allowed gates carry no body)."""
    if html is None:
        return None
    p = _SpanParser()
    p.feed(html)
    p.close()
    return p.spans


def link_hrefs(spans: list[Span]) -> list[str]:
    """Raw hrefs of link spans in document order (pre-filter, pre-trim)."""
    return [s.text or "" for s in spans if s.kind == "link"]

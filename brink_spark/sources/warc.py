"""WARC source: read crawl archives into the ``pages`` table shape.

WARC/1.0 (ISO 28500) is the interchange format web corpora actually ship
in (Common Crawl publishes ~100 TB/month of it), so the fetch-join side of
the engine can come straight from an archive instead of parquet. Only
``response`` records are surfaced; each yields one pages row
(url / url_norm / host / scheme / status / content_length / body).

Scale notes:
- Files are read via Spark's ``binaryFile`` source and parsed inside
  ``mapInPandas`` (Arrow-batched, one pass per archive) — a WARC file is a
  concatenation of length-prefixed records, so parsing is a linear scan.
- A single .warc file is NOT splittable (like gzip); parallelism comes
  from the number of archive files, which is how WARC corpora are
  published (Common Crawl: ~64k files/crawl of ~1 GB each — far more
  files than executors). For mega-archives, production deployments add a
  record-offset index (cdx) and read ranges; the row schema here is
  unchanged by that optimization.
- ``url_norm`` is computed with the same normalization kernel the frontier
  uses, so the fetch equi-join keys match by construction.

The writer exists for tests and for exporting synthetic fixtures; it
emits minimal, spec-shaped response records (WARC-Type/-Target-URI/
Content-Length headers, HTTP/1.1 status line, CRLF framing).
"""

from __future__ import annotations

from typing import Iterator, Optional

_CRLF = b"\r\n"


def write_warc(pages, path: str) -> None:
    """Render pages (objects with url, status, body) as one WARC/1.0 file.
    Test/export helper — driver-side, linear."""
    with open(path, "wb") as fh:
        for p in pages:
            body = (p.body or "").encode("utf-8")
            http = (
                f"HTTP/1.1 {p.status} X".encode()
                + _CRLF
                + b"Content-Type: text/html"
                + _CRLF
                + f"Content-Length: {len(body)}".encode()
                + _CRLF
                + _CRLF
                + body
            )
            hdr = (
                b"WARC/1.0" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + f"WARC-Target-URI: {p.url}".encode() + _CRLF
                + b"Content-Type: application/http;msgtype=response" + _CRLF
                + f"Content-Length: {len(http)}".encode() + _CRLF
                + _CRLF
            )
            fh.write(hdr + http + _CRLF + _CRLF)


def _parse_warc_bytes(data: bytes) -> Iterator[tuple[str, int, str, int]]:
    """Linear scan of one archive: yield (target_uri, status, body,
    body_bytes) per response record. Length-prefixed framing: the WARC
    Content-Length header bounds the payload exactly (bodies may contain
    blank lines). ``body_bytes`` is the RAW payload byte length — the
    decoded string can be longer for non-UTF-8 bodies (each invalid byte
    becomes a 3-byte replacement char), and content-length gates must see
    the wire size."""
    pos = 0
    n = len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:  # [0] is the WARC/1.0 version line
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            clen = 0
        payload = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        # skip the two record-separator CRLFs (tolerate missing at EOF)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if fields.get("warc-type") != "response":
            continue
        uri = fields.get("warc-target-uri", "")
        http_end = payload.find(_CRLF + _CRLF)
        if http_end < 0:
            continue
        status_line = payload[: payload.find(_CRLF)].decode("utf-8", "replace")
        parts = status_line.split(" ")
        try:
            status = int(parts[1])
        except (IndexError, ValueError):
            continue
        raw_body = payload[http_end + 4 :]
        yield uri, status, raw_body.decode("utf-8", "replace"), len(raw_body)


def warc_to_pages(
    spark,
    path: str,
    ignore_get_parameters: tuple[str, ...] = (),
    fuzzy: bool = False,
):
    """pages DataFrame from WARC archive(s) at ``path`` (file / dir / glob).
    One Arrow-batched parse pass per archive file; url_norm computed with
    the frontier's normalization kernel so fetch-join keys match."""
    from brink_spark.functions.urls import normalize_url, scheme_and_host

    ignored = tuple(ignore_get_parameters)

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for uri, status, body, nbytes in _parse_warc_bytes(bytes(blob)):
                    un = normalize_url(uri, ignored, fuzzy)
                    sh = scheme_and_host(un) if un else None
                    scheme, host = sh if sh else (None, None)
                    rows.append((un, uri, host, scheme, status, nbytes, body))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url_norm", "url", "host", "scheme",
                    "status", "content_length", "body",
                ],
            )

    raw = spark.read.format("binaryFile").load(path).select("content")
    return raw.mapInPandas(
        _parse,
        schema=(
            "url_norm string, url string, host string, scheme string, "
            "status int, content_length long, body string"
        ),
    )

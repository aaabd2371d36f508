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
- A single .warc file is NOT splittable by content (like gzip); default
  parallelism comes from the number of archive files, which is how WARC
  corpora are published (Common Crawl: ~64k files/crawl of ~1 GB each —
  far more files than executors). For MEGA-archives this module also
  implements the cdx-style fix: ``write_warc`` emits (and ``build_cdx``
  retrofits) a record-offset index beside the archive, and
  ``warc_to_pages_indexed`` turns the index into contiguous byte ranges —
  one Spark task per range, each seeking directly to its slice — so one
  archive fans out across the cluster. Range boundaries come from record
  offsets, so every task parses only whole records.
- ``url_norm`` is computed with the same normalization kernel the frontier
  uses, so the fetch equi-join keys match by construction.

The writer exists for tests and for exporting synthetic fixtures; it
emits minimal, spec-shaped response records (WARC-Type/-Target-URI/
Content-Length headers, HTTP/1.1 status line, CRLF framing).
"""

from __future__ import annotations

from typing import Iterator, Optional

_CRLF = b"\r\n"


def cdx_path(path: str) -> str:
    return path + ".cdx"


def write_warc(pages, path: str, index: bool = True) -> None:
    """Render pages (objects with url, status, body) as one WARC/1.0 file.
    Test/export helper — driver-side, linear. With ``index`` (default) an
    offset index (cdx-style: one ``offset length uri`` JSON line per
    record) is written beside the archive for ranged reads."""
    import json

    entries = []
    with open(path, "wb") as fh:
        for p in pages:
            body = (p.body or "").encode("utf-8")
            loc = getattr(p, "redirect_to", None)
            http = (
                f"HTTP/1.1 {p.status} X".encode()
                + _CRLF
                + b"Content-Type: text/html"
                + _CRLF
                + (f"Location: {loc}".encode() + _CRLF if loc else b"")
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
            rec = hdr + http + _CRLF + _CRLF
            entries.append({"offset": fh.tell(), "length": len(rec), "uri": p.url})
            fh.write(rec)
    if index:
        with open(cdx_path(path), "w") as fh:
            for e in entries:
                fh.write(json.dumps(e) + "\n")


def build_cdx(path: str) -> int:
    """Retrofit an offset index onto an existing archive: one linear scan
    (the last un-indexed pass this archive will ever need). Returns the
    record count."""
    import json

    with open(path, "rb") as fh:
        data = fh.read()
    entries = []
    pos, n = 0, len(data)
    while pos < n:
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = data[pos:head_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", "0"))
        except ValueError:
            clen = 0
        end = head_end + 4 + clen
        while data[end : end + 2] == _CRLF:
            end += 2
        entries.append(
            {
                "offset": pos,
                "length": end - pos,
                "uri": fields.get("warc-target-uri", ""),
            }
        )
        pos = end
    with open(cdx_path(path), "w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    return len(entries)


def _parse_warc_bytes(
    data: bytes,
) -> Iterator[tuple[str, int, str, int, Optional[str]]]:
    """Linear scan of one archive: yield (target_uri, status, body,
    body_bytes, location) per response record. Length-prefixed framing:
    the WARC Content-Length header bounds the payload exactly (bodies may
    contain blank lines). ``body_bytes`` is the RAW payload byte length —
    the decoded string can be longer for non-UTF-8 bodies (each invalid
    byte becomes a 3-byte replacement char), and content-length gates
    must see the wire size. ``location`` is the HTTP Location header when
    present (3xx records) — it feeds the pages table's ``redirect_to``
    column so crawls over archives follow chains like live fetches."""
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
        location = None
        for hline in payload[:http_end].decode("utf-8", "replace").split("\r\n")[1:]:
            hk, _, hv = hline.partition(":")
            if hk.strip().lower() == "location":
                location = hv.strip()
                break
        raw_body = payload[http_end + 4 :]
        yield uri, status, raw_body.decode("utf-8", "replace"), len(raw_body), location


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
                for uri, status, body, nbytes, loc in _parse_warc_bytes(bytes(blob)):
                    un = normalize_url(uri, ignored, fuzzy)
                    sh = scheme_and_host(un) if un else None
                    scheme, host = sh if sh else (None, None)
                    rows.append((un, uri, host, scheme, status, nbytes, body, loc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url_norm", "url", "host", "scheme",
                    "status", "content_length", "body", "redirect_to",
                ],
            )

    raw = spark.read.format("binaryFile").load(path).select("content")
    return raw.mapInPandas(
        _parse,
        schema=(
            "url_norm string, url string, host string, scheme string, "
            "status int, content_length long, body string, redirect_to string"
        ),
    )


def warc_to_pages_indexed(
    spark,
    path: str,
    n_splits: int = 32,
    ignore_get_parameters: tuple[str, ...] = (),
    fuzzy: bool = False,
):
    """pages DataFrame from ONE (mega-)archive, split across ``n_splits``
    tasks via its offset index (``write_warc`` emits one; ``build_cdx``
    retrofits one). Each task seeks to its byte range and parses only
    whole records — the archive itself is never read by the driver, and a
    1 TB file fans out like 32 small ones. The index is tiny (one line per
    record) so reading it driver-side is O(records), not O(bytes)."""
    import json

    from brink_spark.functions.urls import normalize_url, scheme_and_host

    with open(cdx_path(path)) as fh:
        entries = [json.loads(line) for line in fh if line.strip()]
    if not entries:
        return warc_to_pages(spark, path)  # degenerate: empty index
    entries.sort(key=lambda e: e["offset"])
    total = entries[-1]["offset"] + entries[-1]["length"] - entries[0]["offset"]
    target = max(1, total // n_splits)
    # contiguous ranges aligned to record boundaries, ~equal BYTES (records
    # vary in size; byte balance is what levels task runtimes)
    ranges: list[tuple[int, int]] = []
    start = entries[0]["offset"]
    cur_end = start
    for e in entries:
        cur_end = e["offset"] + e["length"]
        if cur_end - start >= target and len(ranges) < n_splits - 1:
            ranges.append((start, cur_end))
            start = cur_end
    if cur_end > start:
        ranges.append((start, cur_end))

    ignored = tuple(ignore_get_parameters)
    ranges_df = spark.createDataFrame(ranges, "start long, end long").repartition(
        len(ranges)
    )

    def _parse_range(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for start, end in zip(pdf["start"], pdf["end"]):
                with open(path, "rb") as fh:
                    fh.seek(int(start))
                    buf = fh.read(int(end) - int(start))
                for uri, status, body, nbytes, loc in _parse_warc_bytes(buf):
                    un = normalize_url(uri, ignored, fuzzy)
                    sh = scheme_and_host(un) if un else None
                    scheme, host = sh if sh else (None, None)
                    rows.append((un, uri, host, scheme, status, nbytes, body, loc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url_norm", "url", "host", "scheme",
                    "status", "content_length", "body", "redirect_to",
                ],
            )

    return ranges_df.mapInPandas(
        _parse_range,
        schema=(
            "url_norm string, url string, host string, scheme string, "
            "status int, content_length long, body string, redirect_to string"
        ),
    )


def store_to_warc(
    spark, store_dir: str, n_waves: int, out_dir: str, segments: int = 8
) -> None:
    """DISTRIBUTED crawl→WARC export: the archival sink next to the
    driver-side ``write_warc`` test helper. Each fetched document in the
    crawl store's results tables becomes one WARC/1.0 response record
    (body re-rendered from its canonical span sequence — the store keeps
    spans, and render/parse round-trips by contract, functions/spans.py);
    records land in ``segments`` archive files whose MEMBERSHIP AND
    ORDER are pure functions of url_norm (key-hash segment + url_norm
    sort), so the same store exports byte-identical archives at any
    parallelism. Executors write their own segment files + cdx offset
    indexes directly (one task per segment, no driver fan-in); every
    segment is readable by ``warc_to_pages`` / ``warc_to_pages_indexed``
    like any external archive."""
    import os

    from pyspark.sql import functions as F

    from brink_spark.functions.spans import Span, render_html

    os.makedirs(out_dir, exist_ok=True)
    res = spark.read.parquet(
        *[f"{store_dir}/results/wave={w}" for w in range(n_waves)]
    ).filter(F.col("row_kind") == "fetched")
    res = res.select(
        "url_norm",
        "status",
        "spans",
        F.pmod(F.xxhash64("url_norm"), F.lit(segments)).alias("seg"),
    )
    out_abs = os.path.abspath(out_dir)

    def _write_segments(batches):
        import json

        import pandas as pd

        by_seg: dict[int, list] = {}
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw_spans = row["spans"]  # Arrow hands back a numpy array
                spans = [
                    Span(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (raw_spans if raw_spans is not None else [])
                ]
                by_seg.setdefault(int(row["seg"]), []).append(
                    (row["url_norm"], int(row["status"]), render_html(spans))
                )
        out = []
        for seg, recs in by_seg.items():
            recs.sort(key=lambda r: r[0])  # deterministic in-segment order
            path = f"{out_abs}/segment-{seg:05d}.warc"
            entries = []
            with open(path, "wb") as fh:
                for url, status, body in recs:
                    b = body.encode("utf-8")
                    http = (
                        f"HTTP/1.1 {status} X".encode() + _CRLF
                        + b"Content-Type: text/html" + _CRLF
                        + f"Content-Length: {len(b)}".encode() + _CRLF
                        + _CRLF + b
                    )
                    rec = (
                        b"WARC/1.0" + _CRLF
                        + b"WARC-Type: response" + _CRLF
                        + f"WARC-Target-URI: {url}".encode() + _CRLF
                        + b"Content-Type: application/http;msgtype=response" + _CRLF
                        + f"Content-Length: {len(http)}".encode() + _CRLF
                        + _CRLF + http + _CRLF + _CRLF
                    )
                    entries.append(
                        {"offset": fh.tell(), "length": len(rec), "uri": url}
                    )
                    fh.write(rec)
            with open(cdx_path(path), "w") as fh:
                for e in entries:
                    fh.write(json.dumps(e) + "\n")
            out.append((seg, len(recs)))
        yield pd.DataFrame(out, columns=["seg", "n_records"])

    # one task per segment: records co-locate by seg value. (hash(seg) can
    # fold two seg values into one task — the kernel handles that by
    # writing one file per seg VALUE, so layout stays segment-accurate.)
    counts = (
        res.repartition(segments, "seg")
        .mapInPandas(_write_segments, schema="seg int, n_records long")
        .collect()
    )
    import json

    manifest = {
        "segments": segments,
        "records": {str(r["seg"]): int(r["n_records"]) for r in counts},
        "total_records": int(sum(r["n_records"] for r in counts)),
    }
    with open(f"{out_dir}/_manifest", "w") as f:
        json.dump(manifest, f, indent=1)

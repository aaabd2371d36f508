"""Real HTTP fetch stage: the production replacement for the sandbox's
pages equi-join, as a mapInPandas operator.

SURVEY.md A1's sandbox rule makes fetch a join against a synthetic pages
table (no network in tests); this module is the production shape behind
``CrawlConfig.fetch_mode='http'``: each host-salted partition opens real
connections, fetches its batch, and emits EXACTLY the columns the
equi-join provides (page_status, content_length, body, set_cookie), so
every downstream gate (miss / not_allowed / too_large, brink.go:166-229),
the span parse, and the cookie-jar reduction run unchanged.

Execution shape:
- the fetch stage is already repartitioned by a salted host hash
  (plans/crawl.py fetch_stage), so a partition holds mostly-same-host URLs
  — this operator keeps ONE http.client connection per (scheme, netloc)
  alive across its whole partition (connection reuse, the reason for the
  salt's host component);
- rows are processed in url order within the batch for determinism;
- a transport error yields NULL page_status → downstream outcome 'miss',
  exactly like the synthetic join's unmatched row (the reference treats
  any client.Do error the same way, brink.go:195-197);
- Set-Cookie is surfaced as the raw first header value, the same
  name=value shape the synthetic pages table carries.

Python-level I/O loop is inherent here (network-bound, not CPU); a
large-scale deployment would swap the kernel for an async pool with the
same batch signature. Driven end-to-end against a loopback HTTP server in
tests/test_http_fetch.py — the engine runs real waves over real sockets.
"""

from __future__ import annotations

# from-imports (not `import http.client`): cloudpickle rebinds module
# globals by re-importing the TOP-LEVEL module on the worker, and
# `import http` alone does not bring in the `client` submodule — class
# references pickle by their full module path and always resolve
from http.client import HTTPConnection, HTTPSConnection
from typing import Iterator
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PAGE_FIELDS = [
    StructField("page_status", IntegerType()),
    StructField("content_length", LongType()),
    StructField("body", StringType()),
    StructField("set_cookie", StringType()),
]


def http_fetch_columns(
    units: DataFrame,
    headers: dict[str, str],
    timeout: float = 10.0,
    guard_col: str | None = None,
) -> DataFrame:
    """Fetch each unit's ``url`` over HTTP, appending the page columns —
    the drop-in replacement for ``units.join(pages_slim, 'url_norm',
    'left')`` in the fused wave stage. All unit columns pass THROUGH the
    mapInPandas (no join-back shuffle), so the caller's host-salted
    partitioning is what the connections see. With ``guard_col`` (the
    fused edge-grain input carries cached/deferred rows too) only rows
    where that boolean column is true are fetched; the rest keep null
    page columns."""
    out_schema = StructType(list(units.schema.fields) + PAGE_FIELDS)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        conns: dict[tuple[str, str], HTTPConnection] = {}

        def _conn(scheme: str, netloc: str) -> HTTPConnection:
            key = (scheme, netloc)
            c = conns.get(key)
            if c is None:
                cls = HTTPSConnection if scheme == "https" else HTTPConnection
                c = cls(netloc, timeout=timeout)
                conns[key] = c
            return c

        try:
            for pdf in batches:
                stat = pd.Series([None] * len(pdf), index=pdf.index, dtype=object)
                clen = stat.copy()
                body_s = stat.copy()
                cookie = stat.copy()
                # deterministic fetch order within the batch
                for idx in pdf.sort_values("url").index:
                    if guard_col is not None and not bool(pdf[guard_col].loc[idx]):
                        continue  # non-fetch row: null page columns
                    url = pdf["url"].loc[idx]
                    try:
                        # follow 3xx Location chains like Go's zero-value
                        # http.Client (brink.go:194): defaultCheckRedirect
                        # allows 9 hops, the 10th redirect is an error —
                        # which lands on the miss path below
                        resp = raw = None
                        for hop in range(10):
                            parsed = urlsplit(url)
                            target = parsed.path or "/"
                            if parsed.query:
                                target += "?" + parsed.query
                            c = _conn(parsed.scheme, parsed.netloc)
                            c.request("GET", target, headers=headers)
                            resp = c.getresponse()
                            raw = resp.read()
                            loc = resp.headers.get("Location")
                            if resp.status in (301, 302, 303, 307, 308) and loc:
                                if hop == 9:
                                    raise OSError("stopped after 10 redirects")
                                url = (
                                    loc
                                    if "://" in loc
                                    else f"{parsed.scheme}://{parsed.netloc}{loc}"
                                )
                                continue
                            break
                        cl = resp.headers.get("Content-Length")
                        stat.loc[idx] = int(resp.status)
                        clen.loc[idx] = int(cl) if cl is not None else len(raw)
                        body_s.loc[idx] = raw.decode("utf-8", "replace")
                        cookie.loc[idx] = resp.headers.get("Set-Cookie")
                    except Exception:
                        # transport error == the reference's client.Do error
                        # == the synthetic join's miss: null page row
                        conns.pop((parsed.scheme, parsed.netloc), None)
                yield pdf.assign(
                    page_status=stat,
                    content_length=clen,
                    body=body_s,
                    set_cookie=cookie,
                )
        finally:
            for c in conns.values():
                try:
                    c.close()
                except Exception:
                    pass

    return units.mapInPandas(_kernel, schema=out_schema)

"""Vectorized pandas/Arrow UDFs wrapping the pure URL/HTML kernels.

Only two operations in the whole engine require Python (everything else is
native Catalyst column expressions): URL normalization (B1-B6: stdlib URL
parsing) and HTML→span parsing (D1: tokenizer scan). Both are Arrow-batched
``pandas_udf``s — no per-row Python UDFs anywhere (input_hint).

``normalize_struct_udf`` returns one struct with every per-URL derivation a
wave needs, so the URL is parsed exactly once per edge:

- ``url_norm``      normalizeURL(url) (urls.go:111-155); null → malformed (C7)
- ``scheme/host/path``  components of the normalized URL (B4/B5)
- ``base_scheme/base_host``  parse of the RAW url (no TrimSpace) — the
  resolution base AbsoluteLinksIn uses (urls.go:47-51 parses link.Href
  verbatim, so a whitespace-padded frontier URL normalizes fine but fails
  as a resolution base; both behaviors must be preserved).
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from brink_spark.functions.spans import SPANS_TYPE, parse_spans
from brink_spark.functions.urls import normalize_url, parse_request_uri

NORM_STRUCT = StructType(
    [
        StructField("url_norm", StringType()),
        StructField("scheme", StringType()),
        StructField("host", StringType()),
        StructField("path", StringType()),
        StructField("base_scheme", StringType()),
        StructField("base_host", StringType()),
    ]
)


def make_normalize_udf(ignored_params: tuple[str, ...], fuzzy: bool):
    """Build the B1-B6 struct UDF with the config captured in the closure
    (the broadcast-lists-inside-the-UDF pattern from SURVEY.md §1.2)."""
    ignored = tuple(ignored_params)

    def _normalize_batch(urls: pd.Series) -> pd.DataFrame:
        # memoize within the batch: frontiers repeat URLs heavily
        @lru_cache(maxsize=65536)
        def one(url: str):
            if url is None:
                return (None,) * 6
            un = normalize_url(url, ignored, fuzzy)
            if un is None:
                norm_part = (None, None, None, None)
            else:
                p = parse_request_uri(un)
                norm_part = (un, p.scheme, p.host, p.path)
            raw = parse_request_uri(url)
            base = (raw.scheme, raw.host) if raw is not None else (None, None)
            return norm_part + base

        out = [one(u) for u in urls]
        return pd.DataFrame(
            out,
            columns=["url_norm", "scheme", "host", "path", "base_scheme", "base_host"],
        )

    return pandas_udf(_normalize_batch, returnType=NORM_STRUCT)


@pandas_udf(returnType=SPANS_TYPE)
def parse_spans_udf(bodies: pd.Series) -> pd.Series:
    """D1: HTML body → span array (urls.go:73-106 extended to interleaved
    text+media spans). Arrow-batched; one tokenizer pass per document."""
    return bodies.map(lambda b: None if b is None else [tuple(s) for s in parse_spans(b)])

"""URL-template extraction: the key of the template trap guard.

A URL's *template* is its ``scheme://host[:port]`` prefix verbatim plus
the rest of the URL (path + query + fragment) with every digit run
collapsed to ``#``. Auto-generated infinite URL spaces — calendars
(/cal/2024/3/7), pagination (?page=9241), session-id permutations —
collapse onto ONE template, so a lifetime cap keyed by template bounds
them even when they spread across unbounded distinct paths on a single
host (where max-depth and max-pages-per-host fire late or not at all).

Two implementations of the SAME function (tests assert equality):
``url_template`` is a native Spark Column expression (regexp_extract +
substring + regexp_replace — whole-stage codegen, zero Python on the
wave path); ``url_template_py`` is the oracle's mirror. The regexes use
no constructs where Java and Python semantics differ.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from brink_spark.functions.urls import url_template_py  # noqa: F401 (re-export)

_PREFIX_PATTERN = r"^([a-z][a-z0-9+.\-]*://[^/?#]*)"


def url_template(col: Column) -> Column:
    """Native template expression over a NORMALIZED url column. The
    scheme://host prefix (ports included) stays verbatim; digit runs in
    the remainder become '#'. A string the prefix regex cannot match
    (never a normalized URL) degrades to whole-string digit collapsing —
    identical in the Python mirror."""
    prefix = F.regexp_extract(col, _PREFIX_PATTERN, 1)
    rest = F.substring(col, F.length(prefix) + F.lit(1), F.length(col))
    return F.concat(prefix, F.regexp_replace(rest, "[0-9]+", "#"))

"""Handler-output operators over the results table (A4/F4).

The reference dispatches per-status callbacks (brink.go:235-244); the
distributed equivalent is the results table partitioned by status, and a
"handler" is a DataFrame transform over it. These helpers mirror the
example handlers in cmd/main.go:

- ``by_status``: the HandleFunc(status, …) selection (cmd/main.go:46-47)
- ``count_ok``: the OK counter (F1, cmd/main.go:52-58)
- ``grep_body``: the dead-wiki-link body grep (F4, cmd/main.go:66-68) —
  substring search across a document's text/link spans, as a native
  higher-order-function expression (no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def by_status(results: DataFrame, status: int) -> DataFrame:
    return results.filter(F.col("status") == status)


def count_ok(results: DataFrame) -> int:
    return results.filter((F.col("status") == 200) & ~F.col("cached")).count()


def grep_body(results: DataFrame, needle: str) -> DataFrame:
    """Pages whose span content contains ``needle`` (cmd/main.go:66-68
    greps the raw body; span text + media refs are the body here)."""
    hit = F.exists(
        F.col("spans"),
        lambda s: F.coalesce(s["text"], s["media_ref"], F.lit("")).contains(
            F.lit(needle)
        ),
    )
    return results.filter(F.col("spans").isNotNull() & hit)

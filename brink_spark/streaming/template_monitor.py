"""Streaming hot-template monitor: the ONLINE half of the template trap
guard (plans/crawl.py ``max-pages-per-template``).

At web scale a trap is cheapest to catch while it is being crawled: a
watermarked windowed aggregation over the live fetch log, keyed by the
same URL template as the batch guard (functions/templates.py), flags
templates whose fan-out inside one window crosses a threshold. The
output feeds back into the crawl as ``preblocked-templates`` (config) —
a flagged template enters the next run already saturated, so the guard
drops its queued units from wave 0 without re-spending the cap.

Distinct-URL fan-out is the trap signal (raw hit counts also spike on
legitimately hot pages); exact streaming countDistinct is unsupported,
so the count is ``approx_count_distinct`` — an HLL sketch whose merge is
commutative and deterministic, which is why the streaming result equals
the batch result computed with the same function (tests assert it).

The same transformation serves batch and streaming input (unbounded vs
bounded DataFrame) — the watermark column ride-along is a no-op in
batch, so one code path powers both the monitor and its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from brink_spark.functions.templates import url_template


def hot_templates(
    fetch_log: DataFrame,
    threshold: int,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    url_col: str = "url_norm",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, template) fan-out with a hot flag.

    Streaming input: apply a watermark first (late fetch-log rows beyond
    ``watermark`` drop, state for closed windows expires — the unbounded
    template universe never accumulates unbounded state). Batch input:
    ``withWatermark`` is accepted and ignored, making the batch run the
    equivalence oracle.

    Returns (window_start, template, n_urls_approx, n_hits, is_hot).
    """
    keyed = fetch_log.withColumn(
        "template", url_template(F.col(url_col))
    ).withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if fetch_log.isStreaming:
        keyed = keyed.withWatermark(ts_col, watermark)
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        keyed.groupBy(win.alias("w"), "template")
        .agg(
            F.approx_count_distinct(url_col).alias("n_urls_approx"),
            F.count(F.lit(1)).alias("n_hits"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "template",
            "n_urls_approx",
            "n_hits",
            (F.col("n_urls_approx") >= threshold).alias("is_hot"),
        )
    )


def blocked_template_list(hot: DataFrame) -> list[str]:
    """Collapse a (possibly multi-window) hot-template result into the
    ``preblocked-templates`` config value: every template flagged hot in
    ANY window, sorted. Driver-side collect is bounded by the number of
    distinct HOT templates — trap-sized, not corpus-sized."""
    return [
        r["template"]
        for r in hot.filter(F.col("is_hot"))
        .select("template")
        .distinct()
        .orderBy("template")
        .collect()
    ]

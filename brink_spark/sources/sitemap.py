"""Sitemap source: sitemaps.org XML → frontier seeds.

Sitemaps are how real sites hand a crawler their URL inventory, so this is
the third seed source next to explicit seed lists and resume state. Two
document shapes exist (sitemaps.org 0.9):

- ``<urlset>`` files: ``<url><loc>…</loc><priority>0.8</priority></url>``
  entries (priority optional, 0.0–1.0, default 0.5, HIGHER = more
  important);
- ``<sitemapindex>`` files: ``<sitemap><loc>…</loc></sitemap>`` entries
  pointing at further urlset files. Per the spec an index may only list
  urlset files (no nested indexes), so expansion is exactly one round.

Everything is native Catalyst expressions — ``regexp_extract_all`` over
``<loc>``/``<url>`` blocks plus entity unescape — no Python on the data
path (the same rule the rest of the engine follows; input_hint forbids
per-row Python). The XML subset honored is the sitemaps.org schema as
published: one ``<loc>`` per entry, the five predefined XML entities,
whitespace tolerated inside ``<loc>``. A document that is not a sitemap
yields zero rows, never an error (errors-as-data, like every other
stage).

Scale: sitemap files are capped by the spec at 50k URLs / 50 MB each, so
one file is one comfortable Arrow batch; a large site ships thousands of
files listed by an index — which is exactly a DataFrame of bodies here,
partitioned however the fetch layer delivered them.

Priority mapping: the engine's frontier orders ASCENDING (lower int =
fetched earlier, plans/crawl.py window `orderBy(priority)`), sitemap
priority is descending-importance 0.0–1.0 — so ``engine_priority =
round((1 - p) * 100)`` puts priority 1.0 at 0 (front of the queue) and
the 0.5 default at 50, the same band seeds get by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# one <url>…</url> (or <sitemap>…</sitemap>) block, dotall + case-insensitive
_URL_BLOCK = r"(?si)<url[\s>].*?</url>|(?si)<url>.*?</url>"
_SM_BLOCK = r"(?si)<sitemap[\s>].*?</sitemap>|(?si)<sitemap>.*?</sitemap>"
_LOC = r"(?si)<loc[^>]*>\s*(.*?)\s*</loc>"
_PRIO = r"(?si)<priority[^>]*>\s*(.*?)\s*</priority>"

DEFAULT_SITEMAP_PRIORITY = 0.5  # sitemaps.org default when the tag is absent


def _unescape(col):
    """The five predefined XML entities (the only ones valid in a
    sitemap), decoded longest-first so &amp;lt; round-trips correctly."""
    out = col
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),  # last: earlier decodes must not re-trigger
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def parse_sitemaps(bodies: DataFrame, body_col: str = "body") -> DataFrame:
    """``(…, body)`` → ``(kind, loc, sitemap_priority)`` rows.

    ``kind`` is ``'url'`` (urlset entry) or ``'sitemap'`` (index entry);
    ``sitemap_priority`` is the parsed 0.0–1.0 float (default 0.5) for
    url rows and null for index rows. Non-sitemap bodies yield nothing.
    All other input columns are carried through (so callers keep host /
    provenance columns)."""
    carried = [c for c in bodies.columns if c != body_col]
    body = F.col(body_col)

    urls = (
        bodies.select(
            *carried,
            F.explode(F.regexp_extract_all(body, F.lit(_URL_BLOCK), F.lit(0))).alias(
                "_block"
            ),
        )
        .select(
            *carried,
            F.lit("url").alias("kind"),
            _unescape(F.regexp_extract("_block", _LOC, 1)).alias("loc"),
            F.coalesce(
                # nullif-empty before cast: ANSI mode rejects ''→double,
                # and try_cast also absorbs genuinely malformed values
                F.nullif(
                    F.regexp_extract("_block", _PRIO, 1), F.lit("")
                ).try_cast("double"),
                F.lit(DEFAULT_SITEMAP_PRIORITY),
            ).alias("sitemap_priority"),
        )
        .filter(F.col("loc") != "")
    )
    sitemaps = (
        bodies.select(
            *carried,
            F.explode(F.regexp_extract_all(body, F.lit(_SM_BLOCK), F.lit(0))).alias(
                "_block"
            ),
        )
        .select(
            *carried,
            F.lit("sitemap").alias("kind"),
            _unescape(F.regexp_extract("_block", _LOC, 1)).alias("loc"),
            F.lit(None).cast("double").alias("sitemap_priority"),
        )
        .filter(F.col("loc") != "")
    )
    return urls.unionByName(sitemaps)


def sitemap_seeds(
    sitemap_bodies: DataFrame,
    fetched_bodies: DataFrame | None = None,
    body_col: str = "body",
    norm_udf=None,
) -> DataFrame:
    """Sitemap bodies → engine seeds ``(url, priority)``.

    ``sitemap_bodies`` are the robots-discovered / configured sitemap
    documents. When any of them is a ``<sitemapindex>``, the referenced
    child sitemaps are resolved against ``fetched_bodies`` — a
    ``(url, body)`` table (e.g. the pages table, or a second fetch wave's
    results) — exactly ONE round, per the spec's no-nested-index rule.
    Index entries with no matching fetched body are simply absent from
    the output (they are unfetched, not an error).

    Duplicate locs keep the BEST (lowest) engine priority —
    deterministic via min, not first-wins.

    ``norm_udf`` (the engine's vectorized URL normalizer): when given,
    child-index locs are normalized before matching ``fetched_bodies`` —
    pass it when that table is keyed by url_norm (e.g. the crawl's pages
    table) rather than raw URLs."""
    parsed = parse_sitemaps(sitemap_bodies, body_col=body_col)
    urls = parsed.filter(F.col("kind") == "url")
    if fetched_bodies is not None:
        child_key = (
            norm_udf("loc").getField("url_norm")
            if norm_udf is not None
            else F.col("loc")
        )
        children = (
            parsed.filter(F.col("kind") == "sitemap")
            .select(child_key.alias("_child_url"))
            .filter(F.col("_child_url").isNotNull())
            .distinct()
            .join(
                fetched_bodies.select(
                    F.col("url").alias("_child_url"), F.col(body_col)
                ),
                "_child_url",
            )
        )
        urls = urls.unionByName(
            parse_sitemaps(children, body_col=body_col)
            .filter(F.col("kind") == "url")
            .select("kind", "loc", "sitemap_priority"),
            allowMissingColumns=True,
        )
    engine_prio = F.round(
        (1.0 - F.least(F.greatest("sitemap_priority", F.lit(0.0)), F.lit(1.0)))
        * 100
    ).cast("int")
    return (
        urls.select(F.col("loc").alias("url"), engine_prio.alias("priority"))
        .groupBy("url")
        .agg(F.min("priority").alias("priority"))
    )


def discover_sitemap_seeds(
    pages: DataFrame,
    entry_urls: list[str],
    norm_udf,
    ignored=(),
    fuzzy: bool = False,
) -> DataFrame:
    """robots.txt → ``Sitemap:`` → sitemap XML → seeds, end to end.

    The production bootstrap: for each entry URL's host, look up
    ``{scheme}://{host}/robots.txt`` in ``pages`` (a table keyed by
    ``url_norm`` carrying ``body`` — the crawl's fetch target or a prior
    wave's results), extract host-level ``Sitemap:`` directives
    (operators/robots_txt.sitemap_urls), resolve those URLs against
    ``pages`` again for the XML bodies, and parse them — index files
    expand one round against the same table — into ``(url, priority)``
    seed rows for ``CrawlEngine.seed_frontier``.

    The entry list is driver-side because seed lists are human-provided
    and bounded (the same contract as the reference's config file); every
    per-document step is a DataFrame op. Hosts with no robots.txt page,
    robots with no Sitemap line, and sitemap URLs with no fetched body
    all contribute zero rows — absence is not an error, matching the
    engine's errors-as-data rule."""
    from brink_spark.functions.urls import normalize_url, scheme_and_host
    from brink_spark.operators.robots_txt import sitemap_urls

    keys = []
    for u in entry_urls:
        un = normalize_url(u, ignored, fuzzy)
        if un is None:
            continue
        sh = scheme_and_host(un)
        if sh is None:
            continue
        rk = normalize_url(f"{sh[0]}://{sh[1]}/robots.txt", ignored, fuzzy)
        if rk is not None:
            keys.append((sh[1], rk))
    spark = pages.sparkSession
    empty = spark.createDataFrame([], "url string, priority int")
    if not keys:
        return empty
    key_df = spark.createDataFrame(
        sorted(set(keys)), "host string, _rk string"
    )
    bodies = pages.select(F.col("url_norm"), F.col("body"))
    robots_bodies = bodies.withColumnRenamed("url_norm", "_rk").join(
        F.broadcast(key_df), "_rk"
    ).select("host", "body")
    sm = sitemap_urls(robots_bodies)  # (host, sitemap_url)
    sitemap_bodies = (
        sm.withColumn("_sk", norm_udf("sitemap_url").getField("url_norm"))
        .filter(F.col("_sk").isNotNull())
        .join(bodies.withColumnRenamed("url_norm", "_sk"), "_sk")
        .select("host", "body")
    )
    fetched = bodies.withColumnRenamed("url_norm", "url")
    return sitemap_seeds(
        sitemap_bodies, fetched_bodies=fetched, norm_udf=norm_udf
    )

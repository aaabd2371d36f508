"""robots.txt TEXT parser: raw fetched robots bodies → the structured
rules table the engine consumes (operators/filters.py expects rows of
``(host, rule, path_prefix, crawl_delay_budget)``).

Completes the production path — fetch ``/robots.txt`` per host (the same
fetch stage as any page), then this operator turns the bodies into rules
with NO Python on the data path: line explode + a per-host window to
assign user-agent group ids + native string/HOF expressions. Per-host
robots files are KB-sized, so the per-host window partitions are tiny by
construction (the window is keyed on host, never on the corpus).

Robots Exclusion Protocol subset honored (the de-facto original REP):
- ``User-agent:`` lines open a group; consecutive user-agent lines share
  the following rule block (standard group semantics);
- a group applies when it names ``*`` or the given agent (case-
  insensitive); if any group names the agent specifically, the ``*``
  groups are ignored for that host (most-specific-group rule);
- ``Disallow: /p`` → deny rule, ``Allow: /p`` → allow rule; an EMPTY
  ``Disallow:`` value means allow-everything and emits no rule;
- ``Crawl-delay: N`` (seconds) maps to the engine's per-wave fetch
  budget as ``max(1, floor(CRAWL_DELAY_BUDGET_SCALE / N))`` — with the
  default scale 60 a wave is treated as a ~minute of politeness budget,
  so delay 2 s → 30 fetches/wave; hosts without a delay get no budget
  row (the engine default applies);
- comments (``# ...``) and blank lines are stripped; field names are
  case-insensitive; CRLF tolerated.

Longest-prefix/deny-ties-win matching itself lives in filters.py (the
rules table contract); this module only produces the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

CRAWL_DELAY_BUDGET_SCALE = 60


def parse_robots_txt(
    robots_bodies: DataFrame,
    agent: str = "brink",
    budget_scale: int = CRAWL_DELAY_BUDGET_SCALE,
) -> DataFrame:
    """``(host, body)`` → ``(host, rule, path_prefix, crawl_delay_budget)``.

    Output feeds ``robots_rules_per_host`` / ``budget_per_host`` directly.
    ``crawl_delay_budget`` is set on every emitted row of a host that
    declared a Crawl-delay (budget_per_host takes the max per host) and
    null otherwise."""
    agent_lc = agent.lower()

    lines = robots_bodies.select(
        "host",
        F.posexplode(F.split(F.col("body"), "\n")).alias("pos", "line"),
    )
    # strip comments + whitespace (tolerate \r), drop blanks
    lines = lines.withColumn(
        "line",
        F.trim(F.regexp_replace(F.regexp_replace("line", "#.*$", ""), "\r", "")),
    ).filter(F.col("line") != "")
    # split into (field, value) at the first colon
    lines = (
        lines.withColumn(
            "field", F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
        )
        .withColumn("value", F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)))
        .filter(F.col("field") != "")
    )
    # group id = running count of user-agent lines that OPEN a group (a
    # user-agent line directly following another user-agent line extends
    # the same group). Per-host window over line order — robots files are
    # KB-sized, so this window is bounded by construction.
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    opens = (
        (F.col("field") == "user-agent")
        & (F.lag("field").over(w).isNull() | (F.lag("field").over(w) != "user-agent"))
    ).cast("int")
    lines = lines.withColumn("grp", F.sum(opens).over(w)).filter(F.col("grp") > 0)

    # which groups apply: collect each group's agent names
    agents = (
        lines.filter(F.col("field") == "user-agent")
        .groupBy("host", "grp")
        .agg(F.collect_set(F.lower("value")).alias("agents"))
        .withColumn("names_star", F.array_contains("agents", "*"))
        .withColumn("names_agent", F.array_contains("agents", F.lit(agent_lc)))
    )
    # most-specific-group rule: if any group on the host names the agent,
    # star-only groups are ignored for that host
    host_has_specific = agents.groupBy("host").agg(
        F.max(F.col("names_agent").cast("int")).alias("_has_spec")
    )
    applicable = (
        agents.join(host_has_specific, "host")
        .filter(
            F.when(F.col("_has_spec") == 1, F.col("names_agent")).otherwise(
                F.col("names_star")
            )
        )
        .select("host", "grp")
    )

    body_lines = lines.join(applicable, ["host", "grp"])

    rules = (
        body_lines.filter(
            F.col("field").isin("allow", "disallow") & (F.col("value") != "")
        )
        .select(
            "host",
            F.when(F.col("field") == "disallow", F.lit("deny"))
            .otherwise(F.lit("allow"))
            .alias("rule"),
            F.col("value").alias("path_prefix"),
        )
        .distinct()
    )
    delays = (
        body_lines.filter(
            (F.col("field") == "crawl-delay")
            & F.col("value").rlike(r"^\d+(\.\d+)?$")
        )
        .groupBy("host")
        .agg(F.max(F.col("value").cast("double")).alias("_delay"))
        .filter(F.col("_delay") > 0)
        .select(
            "host",
            F.greatest(
                F.lit(1),
                F.floor(F.lit(float(budget_scale)) / F.col("_delay")),
            )
            .cast("int")
            .alias("crawl_delay_budget"),
        )
    )
    return rules.join(delays, "host", "left").select(
        "host", "rule", "path_prefix", "crawl_delay_budget"
    )


def sitemap_urls(robots_bodies: DataFrame) -> DataFrame:
    """``(host, body)`` → distinct ``(host, sitemap_url)`` rows.

    ``Sitemap:`` is a HOST-level REP directive: it applies regardless of
    which user-agent group surrounds it (sitemaps.org "Informing search
    engine crawlers"), so unlike Allow/Disallow it is extracted with no
    group bookkeeping at all — field match + value, comments stripped,
    CRLF tolerated, case-insensitive field name. The value is required
    to be an absolute URL by the spec; relative values are passed
    through untouched for the caller's fetch layer to reject (the
    engine's malformed-URL gate, plans/crawl.py C7).

    Feeds ``sources/sitemap.py``: fetch these URLs like any page, then
    ``sitemap_seeds`` turns the bodies into frontier entries.
    """
    lines = robots_bodies.select(
        "host", F.explode(F.split(F.col("body"), "\n")).alias("line")
    )
    lines = lines.withColumn(
        "line",
        F.trim(F.regexp_replace(F.regexp_replace("line", "#.*$", ""), "\r", "")),
    ).filter(F.col("line") != "")
    return (
        lines.withColumn(
            "field", F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1)))
        )
        .withColumn("value", F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)))
        .filter((F.col("field") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )

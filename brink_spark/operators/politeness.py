"""Per-host politeness budget + priority ordering (north_rule extensions).

The reference's only throttle is a global worker count (factory.go:16);
the north_rule mandates a per-host budget per wave with deferral, a
priority queue, and explicit skew handling for hot hosts.

Semantics (contract shared with the oracle, brink_spark/oracle/oracle.py):
within each host, fetch units are ordered by ``(priority, url_norm)`` and
the first ``budget(host)`` are eligible this wave; the rest defer to the
next wave with their edges intact.

Physical plan: an exact *two-phase top-k*. A plain
``Window.partitionBy(host)`` would put a hot host's entire frontier slice
in one task (hot.example holds ~30% of the fixture); instead:

  phase 1: window over ``(host, salt)`` where ``salt = pmod(xxhash64(
           url_norm), S)`` — keeps at most ``budget`` rows per salt group,
           bounding any task at ~1/S of the hot host's rows;
  phase 2: window over ``host`` on the ≤ S·budget survivors — exact global
           top-k per host.

Phase 1 can only *over*-admit (each salt group keeps a superset of what
the global top-k needs from it), so phase 2's result equals the
single-window plan — verified against the oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def budget_per_host(robots: DataFrame | None, default_budget: int) -> DataFrame | None:
    """host → crawl_delay_budget (max over that host's robots rows)."""
    if robots is None:
        return None
    return robots.groupBy("host").agg(
        F.max("crawl_delay_budget").alias("_budget")
    )


def apply_politeness(
    units: DataFrame,
    budgets: DataFrame | None,
    default_budget: int,
    num_salts: int = 8,
    host_counts: DataFrame | None = None,
    max_pages_per_host: int = 0,
    key: str = "host",
) -> DataFrame:
    """Tag fetch units with ``_eligible`` and ``_host_capped`` (bool).
    ``units`` must carry ``host``, ``unit_priority``, ``url_norm``; one
    row per url_norm.

    ``key`` is the politeness grouping column: ``"host"`` (default, the
    oracle-parity contract) or any other column present on ``units`` —
    the engine passes ``"site"`` (registrable domain,
    functions/domains.py) in site mode so every subdomain of one
    registrable site shares a single per-wave budget. Budget RESOLUTION
    stays host-keyed regardless (robots crawl-delay overrides are
    per-host facts); with mixed per-host budgets inside one site, a row
    is eligible iff its site-wide rank fits its own host's budget —
    i.e. the strictest-host rows can defer while a laxer host on the
    same site still admits, which errs toward throttling, never toward
    exceeding any host's own budget. The trap-guard cap is likewise a
    per-host fact and stays host-keyed.

    Trap guard (``max_pages_per_host`` > 0): ``host_counts`` is the
    cumulative ``(host, _taken)`` table of fetch attempts from prior
    waves. A host's per-wave allowance becomes ``least(budget,
    cap - taken)``; while allowance remains positive, over-allowance
    units defer exactly as over-budget units do, and once the allowance
    is exhausted every queued unit on that host is tagged
    ``_host_capped`` — the caller drops those from the next frontier so
    an infinite auto-generated site cannot pin the crawl. host_counts
    has one row per host that has ever been fetched — it rides a
    broadcast join, same as the robots budget table.
    """
    if budgets is not None:
        units = units.join(F.broadcast(budgets), "host", "left")
        units = units.withColumn(
            "_budget", F.coalesce("_budget", F.lit(default_budget))
        )
    else:
        units = units.withColumn("_budget", F.lit(default_budget))

    if max_pages_per_host > 0:
        if host_counts is not None:
            units = units.join(F.broadcast(host_counts), "host", "left")
            remaining = F.greatest(
                F.lit(max_pages_per_host) - F.coalesce("_taken", F.lit(0)),
                F.lit(0),
            )
        else:
            remaining = F.lit(max_pages_per_host)
        units = (
            units.withColumn("_remaining", remaining)
            .withColumn("_budget", F.least("_budget", F.col("_remaining")))
            .withColumn("_host_capped", F.col("_remaining") == 0)
            .drop("_taken", "_remaining")
        )
    else:
        units = units.withColumn("_host_capped", F.lit(False))

    salt = F.pmod(F.xxhash64("url_norm"), F.lit(num_salts)).cast("int")
    w1 = Window.partitionBy(key, salt).orderBy("unit_priority", "url_norm")
    units = units.withColumn("_rn1", F.row_number().over(w1))

    # Beyond-budget within a single salt group ⇒ beyond-budget globally for
    # the host (each salt group over-admits), so these rows are deferred
    # without entering the host-wide window — that window only ever sees
    # ≤ S·budget rows per host, the skew bound.
    candidates = units.filter(F.col("_rn1") <= F.col("_budget")).drop("_rn1")
    rejected = (
        units.filter(F.col("_rn1") > F.col("_budget"))
        .drop("_rn1", "_budget")
        .withColumn("_eligible", F.lit(False))
    )

    w2 = Window.partitionBy(key).orderBy("unit_priority", "url_norm")
    ranked = candidates.withColumn(
        "_eligible", F.row_number().over(w2) <= F.col("_budget")
    ).drop("_budget")
    return ranked.unionByName(rejected)

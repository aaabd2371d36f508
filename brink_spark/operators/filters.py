"""Gate predicates: robots, forbidden paths, domain allow, content length.

All native Catalyst column expressions (whole-stage codegen; no Python):

- C1 domain gate (brink.go:212-215, 250-254): exact ``scheme://host``
  membership in the small allowed set — a literal ``isin`` (the set is
  config-sized, so no join at all).
- C2 content-length gate (brink.go:219-221, factory.go:164-173).
- C3 forbidden-path (urls.go:166-175): substring semantics via a chain of
  ``contains`` over the config list.
- robots allow/deny (north_rule extension; FIXTURES.md §4): rules are
  grouped per host into an array column, broadcast-joined to the units,
  and the longest-prefix match (deny on ties) is evaluated with
  ``filter``/``aggregate`` higher-order functions — still JVM-side.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from brink_spark.config import CrawlConfig
from brink_spark.functions.urls import domain_key


def allowed_domain_keys(config: CrawlConfig) -> list[str]:
    """Allowed set = configured domains + auto-allowed root
    (factory.go:54 + setupDomains factory.go:149-162)."""
    keys = []
    for d in (*config.allowed_domains, config.entrypoint):
        dk = domain_key(d)
        if dk is not None and dk not in keys:
            keys.append(dk)
    return keys


def domain_allowed(scheme: Column, host: Column, allowed_keys: list[str]) -> Column:
    return F.concat(scheme, F.lit("://"), host).isin(allowed_keys)


def path_forbidden_expr(path: Column, forbidden_paths: tuple[str, ...]) -> Column:
    if not forbidden_paths:
        return F.lit(False)
    return reduce(
        lambda a, b: a | b, [path.contains(F.lit(fp)) for fp in forbidden_paths]
    )


def robots_rules_per_host(robots: DataFrame) -> DataFrame:
    """host → array<struct<rule,path_prefix>> (small; broadcast)."""
    return robots.groupBy("host").agg(
        F.collect_list(F.struct("rule", "path_prefix")).alias("_rules")
    )


def with_robots_denied(units: DataFrame, rules_per_host: DataFrame | None) -> DataFrame:
    """Adds ``_robots_denied``. Longest-prefix-match wins; deny wins ties;
    host absent from robots → allowed."""
    if rules_per_host is None:
        return units.withColumn("_robots_denied", F.lit(False))
    units = units.join(F.broadcast(rules_per_host), "host", "left")
    matched = F.filter(
        F.col("_rules"), lambda r: F.col("path").startswith(r["path_prefix"])
    )
    # max over (prefix_len, is_deny): struct ordering gives longest prefix,
    # deny on equal length
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["path_prefix"]).alias("l"),
                (r["rule"] == F.lit("deny")).alias("deny"),
            ),
        )
    )
    return units.withColumn(
        "_robots_denied", F.coalesce(best["deny"], F.lit(False))
    ).drop("_rules")

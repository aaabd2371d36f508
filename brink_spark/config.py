"""Crawl configuration — the CrawlOptions equivalent.

Mirrors the reference's ``CrawlOptions`` (crawler.go:48-101) and its TOML
surface (cmd/example-conf.toml; toml tags like ``ignore-get-parameters``),
plus the mandated scheduler extensions from BASELINE.json's north_rule
(politeness budget, priority queue, robots, Bloom seen-set) which have no
reference counterpart.

Defaults follow factory.go:13-19 and getMaxContentLength (factory.go:164-173):
max_content_length 0 → 512 KiB, -1 → unlimited.
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, field, replace

DEFAULT_MAX_CONTENT_LENGTH = 512 * 1024  # factory.go:14
UNLIMITED_MAX_CONTENT_LENGTH = 2**63 - 1  # factory.go:19
DEFAULT_POLITENESS_BUDGET = 64  # north_rule extension; no reference analogue
DEFAULT_MAX_WAVES = 1000


def effective_max_content_length(raw: int) -> int:
    """getMaxContentLength semantics (factory.go:164-173)."""
    if raw == 0:
        return DEFAULT_MAX_CONTENT_LENGTH
    if raw == -1:
        return UNLIMITED_MAX_CONTENT_LENGTH
    return raw


@dataclass(frozen=True)
class CrawlConfig:
    entrypoint: str
    allowed_domains: tuple[str, ...] = ()
    ignore_get_parameters: tuple[str, ...] = ()
    fuzzy_get_parameter_checks: bool = False
    forbidden_paths: tuple[str, ...] = ()
    max_content_length: int = 0  # raw; resolved via effective_max_content_length
    # --- north_rule scheduler extensions ---
    politeness_budget: int = DEFAULT_POLITENESS_BUDGET  # fetches/host/wave default
    max_waves: int = DEFAULT_MAX_WAVES
    # --- engine knobs (physical, not semantic) ---
    use_bloom: bool = True
    bloom_shards: int = 16
    bloom_bits_per_shard: int = 1 << 20
    bloom_num_hashes: int = 5
    politeness_salts: int = 8  # two-phase top-k fan-out for hot hosts
    compact_visited_every: int = 8  # waves between visited-table compactions

    @property
    def effective_max_content_length(self) -> int:
        return effective_max_content_length(self.max_content_length)

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


# TOML keys follow the reference tags (crawler.go:48-101); extension keys are
# kebab-cased the same way.
_TOML_KEYS = {
    "entrypoint": "entrypoint",
    "allowed-domains": "allowed_domains",
    "ignore-get-parameters": "ignore_get_parameters",
    "fuzzy-get-parameter-checks": "fuzzy_get_parameter_checks",
    "ignore-path-visits": "forbidden_paths",
    "max-content-length": "max_content_length",
    "politeness-budget": "politeness_budget",
    "max-waves": "max_waves",
}


def from_toml(path: str) -> CrawlConfig:
    """NewCrawlerFromToml equivalent (factory.go:134-147), driver-side."""
    with open(path, "rb") as fh:
        raw = tomllib.load(fh)
    kwargs: dict = {}
    for toml_key, attr in _TOML_KEYS.items():
        if toml_key in raw:
            val = raw[toml_key]
            if isinstance(val, list):
                val = tuple(val)
            kwargs[attr] = val
    if "entrypoint" not in kwargs:
        raise ValueError("config missing 'entrypoint'")
    return CrawlConfig(**kwargs)

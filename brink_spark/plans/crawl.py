"""The wave-iterative crawl plan: brink's worker pipeline as DataFrame jobs.

One wave = one pass of the per-URL worker pipeline (brink.go:72-138) over
the whole frontier, expressed relationally (SURVEY.md §3.4):

    normalize (B1, pandas UDF) → malformed drop (C7)
    → seen-set split: Bloom prefilter + exact anti/inner join (E1/H1/H2)
    → fetch units (first edge wins the fetch; min-struct over edges)
    → robots gate (extension) → per-host politeness top-k (extension)
    → fetch = equi-join vs pages (A1/H4) + domain/content gates (C1/C2)
    → visited append + Bloom insert
    → handler rows (A4): first edge cached=false with parsed spans (D1),
      other edges + previously-seen edges cached=true, empty body
    → traversal gate (C4 ∧ ¬C3) → link spans → C5/C6 + trim → resolve (D2)
    → next frontier = deferred ∪ new edges

State lives in the CrawlStore (parquet snapshots; Iceberg-shaped): every
wave's outputs are written then re-read, which both cuts the iterative
lineage (the classic loop trap, SURVEY.md §4.2) and makes the loop
checkpoint-resumable: crash mid-wave → the manifest still names the last
committed wave and the wave is recomputed idempotently.

Scale notes (the 10^10 design point):
- all heavy joins key on ``url_norm`` — uniform hash distribution, so the
  hot-host skew never concentrates a join partition;
- the only host-keyed operation is the politeness window, which is
  salted two-phase top-k (operators/politeness.py);
- the parse stage is explicitly repartitioned by a salted host hash
  (``pmod(xxhash64(host, url_norm), P)``) — in production this stage is
  the ``mapInPandas`` HTTP fetch, and the salt keeps one mega-host from
  serializing a wave while still co-locating mostly-same-host batches for
  connection reuse;
- visited is append-only with periodic compaction; the Bloom prefilter
  keeps the anti-join's build side tiny regardless of |visited|.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession, Window, functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from brink_spark.config import CrawlConfig
from brink_spark.functions.spans import SPANS_TYPE
from brink_spark.functions.udfs import make_normalize_udf, parse_spans_udf
from brink_spark.operators.filters import (
    allowed_domain_keys,
    domain_allowed,
    path_forbidden_expr,
    robots_rules_per_host,
    with_robots_denied,
)
from brink_spark.operators.politeness import apply_politeness, budget_per_host
from brink_spark.operators.redirects import collapse_redirect_chains
from brink_spark.operators.seen import BloomSeenSet, mark_seen
from brink_spark.queries.iterate import cut as _cut
from brink_spark.storage import CrawlStore, Manifest

FRONTIER_SCHEMA = StructType(
    [
        StructField("linked_from", StringType()),
        StructField("url", StringType()),
        StructField("priority", IntegerType()),
        # link-hop distance from the seed set (seeds 0; a page's depth is
        # the min depth over its discovering edges). Powers the max_depth
        # trap guard; carried even when the guard is off.
        StructField("depth", IntegerType()),
    ]
)


def _with_depth(frontier: DataFrame) -> DataFrame:
    """Back-compat: frontier tables written before the depth column
    existed (old stores resumed with a new engine) read as depth 0."""
    if "depth" in frontier.columns:
        # streaming batches read with the full schema can carry nulls for
        # files written before the column existed
        return frontier.withColumn(
            "depth", F.coalesce("depth", F.lit(0)).cast("int")
        )
    return frontier.withColumn("depth", F.lit(0))

@dataclass
class CrawlSummary:
    waves: int = 0
    total_fetched: int = 0
    total_ok: int = 0
    total_cached: int = 0
    total_deferred: int = 0
    total_new_links: int = 0
    wall_seconds: float = 0.0
    wave_metrics: list[dict] = field(default_factory=list)

    def summary(self) -> str:
        return (
            f"waves={self.waves} fetched={self.total_fetched} ok={self.total_ok} "
            f"cached={self.total_cached} deferred={self.total_deferred} "
            f"links={self.total_new_links} wall={self.wall_seconds:.1f}s"
        )


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        config: CrawlConfig,
        store_dir: str,
        pages: DataFrame | None = None,
        robots: DataFrame | None = None,
        store: CrawlStore | None = None,
        pages_bucketed: bool = False,
    ):
        self.spark = spark
        self.config = config
        # pluggable table store: parquet-backed by default; pass an
        # IcebergCrawlStore (storage_iceberg.py) to commit every wave
        # through real Iceberg snapshots
        self.store = store if store is not None else CrawlStore(store_dir)
        self.pages = pages
        # pages_bucketed declares that ``pages`` scans a catalog table
        # hash-bucketed (+ sorted) BY url_norm (sources/corpus.py
        # write_bucketed): run() then leaves the scan untouched so every
        # wave's fetch join co-locates against the on-disk layout — no
        # pages-side exchange or sort, ever. Redirect chains must be
        # collapsed at write time (a union would destroy the layout).
        self.pages_bucketed = pages_bucketed
        if pages_bucketed and pages is not None and "redirect_to" in pages.columns:
            raise ValueError(
                "pages_bucketed=True requires redirect chains collapsed at "
                "write time (drop redirect_to from the bucketed store)"
            )
        self.robots = robots
        self.allowed_keys = allowed_domain_keys(config)
        # asNondeterministic: the wave plan filters on url_norm (a field of
        # this UDF's output struct); Catalyst pushes that filter below the
        # projection and re-evaluates the UDF on both sides (guide §4.4's
        # duplicated-BatchEvalPython shape — observed as two stacked
        # ArrowEvalPython nodes per frontier scan). The marker forbids the
        # copy, so each frontier row is normalized once. Results are
        # unchanged: the function is pure; the marker only constrains the
        # optimizer.
        self.norm_udf = make_normalize_udf(
            config.ignore_get_parameters, config.fuzzy_get_parameter_checks
        ).asNondeterministic()
        # the approximate seen-prefilter ("bloom" attribute name kept for
        # the store table + adaptive-activation plumbing, which is shared):
        # Bloom (default) or cuckoo — the latter supports exact deletion
        # (visited-entry expiry for recrawl), same probe/updated surface
        if not config.use_bloom:
            self.bloom = None
        elif config.seen_filter == "cuckoo":
            from brink_spark.operators.cuckoo import CuckooSeenSet

            self.bloom = CuckooSeenSet(
                config.bloom_shards, config.cuckoo_buckets_per_shard
            )
        else:
            self.bloom = BloomSeenSet(
                config.bloom_shards,
                config.bloom_bits_per_shard,
                config.bloom_num_hashes,
            )
        self._rules = robots_rules_per_host(robots) if robots is not None else None
        self._budgets = budget_per_host(robots, config.politeness_budget)
        # cumulative (host, _taken) fetch-attempt counts — the
        # max_pages_per_host trap-guard state. None until the first wave
        # fetches (or rebuilt from committed fetchlog on resume); stays
        # None forever when the guard is off.
        self._host_taken: DataFrame | None = None
        # cumulative (template, _ttaken) fetch-attempt counts — the
        # max_pages_per_template trap-guard state (functions/templates.py
        # key). Same lifecycle as _host_taken; the per-wave gate joins
        # only the SATURATED templates (taken >= cap), so the broadcast
        # side holds just the actual traps, never every template.
        self._template_taken: DataFrame | None = None
        # cumulative (url_norm, _mn) transport-miss counts — retry_misses
        # state (same lifecycle as _host_taken; rebuilt from fetchlog on
        # resume; stays None while the feature is off)
        self._miss_counts: DataFrame | None = None
        # refetch_skip_unchanged comparison set: (url_norm, prior_hash) of
        # expired entries, computed once per run() (expiry only happens
        # between runs). None when the flag is off or nothing is expired.
        self._prior_hashes: DataFrame | None = None
        # shared cookie jar (reference brink.go:267-274): response cookies
        # merge in by name, overwriting. Wave-discretized semantics: cookies
        # set by pages fetched in wave K apply to requests from wave K+1 on.
        self.cookie_jar: dict[str, str] = dict(config.cookies)
        self.auth_suppressed_since_wave: int | None = None
        self._check_auth_suppression(wave=0)
        # post-durability hook: called with the wave's metrics dict AFTER
        # the wave's deferred writes AND manifest commit land on disk —
        # the point where a logged wave can no longer disagree with the
        # store on resume (the CLI's per-wave JSONL line hangs off this)
        self.on_wave_committed = None

    def _check_auth_suppression(self, wave: int) -> None:
        """brink.go:177-184: once the jar holds a cookie whose name matches a
        session cookie name (case-insensitive), the Authorization header is
        dropped from every later request."""
        if self.auth_suppressed_since_wave is not None:
            return
        session_lower = {s.lower() for s in self.config.session_cookie_names}
        if session_lower and any(n.lower() in session_lower for n in self.cookie_jar):
            self.auth_suppressed_since_wave = wave

    def request_headers(self) -> dict[str, str]:
        """Headers the next wave's requests would carry: config headers/auth
        evaluated against the RUNTIME cookie jar."""
        return self.config.with_(
            cookies=tuple(sorted(self.cookie_jar.items()))
        ).request_headers()

    def fetch_partition_count(self) -> int:
        """Fetch-stage partition count. 0 = AQE-managed (the default): the
        salt key is the raw 64-bit hash (unbounded cardinality — the r1
        lit(64) modulus capped a 4N-executor cluster at 64-way parallelism),
        and leaving the count to AQE lets it coalesce/split the exchange to
        the wave's actual volume (an explicit count disables that and
        measured ~15% slower at bench scale). Explicit override: the
        fetch-partitions config key, else the reference worker-count hint
        (crawler.go:57) when it EXCEEDS the cluster's natural parallelism
        (a hint may raise the floor, never cap below the cluster)."""
        if self.config.fetch_partitions > 0:
            return self.config.fetch_partitions
        natural = max(
            int(self.spark.conf.get("spark.sql.shuffle.partitions", "200")),
            self.spark.sparkContext.defaultParallelism,
        )
        if self.config.worker_count > natural:
            return self.config.worker_count
        return 0  # AQE-managed

    # Frontier row count of the NEXT wave, observed for free on the frontier
    # write (Observation piggybacks on the write job — no extra action).
    # None = unknown (resume mid-crawl) → one cheap parquet count() fallback.
    _pending_frontier_count: int | None = None

    # ------------------------------------------------------------------
    def seed_frontier(self, seeds: DataFrame) -> None:
        """A3: seed injection with the literal linked_from='start' sentinel
        (brink.go:33)."""
        frontier0 = seeds.select(
            F.lit("start").alias("linked_from"),
            F.col("url"),
            F.col("priority").cast("int").alias("priority"),
            F.lit(0).alias("depth"),
        )
        obs = Observation("seed_frontier")
        frontier0 = frontier0.observe(obs, F.count(F.lit(1)).alias("n"))
        self.store.write(frontier0, "frontier", 0)
        self._pending_frontier_count = obs.get["n"]

    def expire_visited(self, urls: DataFrame) -> None:
        """Recrawl support: remove the given ``url_norm``s from the LIVE
        seen set. A tombstone (url_norm, expired_asof_wave=last committed
        wave) drops every visited row at or below it, so the next encounter
        FETCHES again and the re-fetch (higher wave) wins over the
        tombstone. With the cuckoo filter the fingerprints are also deleted
        from the shard tables (exact — that is what the cuckoo option is
        for); with Bloom the stale bits stay set and expired URLs merely
        pay the exact-join fallthrough (never incorrect). Time-travel
        reads keep showing pre-expiry history; compaction materializes the
        post-expiry state and clears covered tombstones."""
        from brink_spark.operators.cuckoo import CuckooSeenSet

        manifest = self.store.read_manifest() or Manifest()
        self.store.write_tombstones(urls, manifest.last_wave)
        if (
            isinstance(self.bloom, CuckooSeenSet)
            and manifest.last_wave >= 0
            and self.store.has("bloom", manifest.last_wave)
        ):
            shards = self.store.read(self.spark, "bloom", manifest.last_wave)
            self.store.rewrite(
                self.bloom.deleted(urls, shards), "bloom", manifest.last_wave
            )

    def recrawl_order(self, limit: int | None = None) -> DataFrame:
        """Freshness-driven recrawl schedule (Cho & Garcia-Molina change-rate
        estimation) over the committed visited history: rank every url by an
        exact-integer staleness score ``n_changes * age * 1e6 div span``
        where waves are the crawl's clock — ``n_changes`` counts fingerprint
        transitions between consecutive observations of the same url (the
        content hash when the store carries one, else the HTTP status),
        ``age`` is waves since the url was last fetched, ``span`` the waves
        its history covers. Bigger score = changes often AND hasn't been
        re-checked recently = refetch first.

        Reads the RAW visited append-log (tombstones NOT applied — expired
        rows ARE the observation history). Only urls with >=2 observations
        (i.e. at least one prior expire->refetch cycle) are rankable; a
        first recrawl of everything is just ``expire_visited`` + reseed.

        Returns a seeds-shaped DataFrame ``(url, priority)`` with priority =
        the staleness rank (0 = stalest), so feeding it straight into
        ``expire_visited`` + ``run(resume=True, seeds=...)`` makes the
        politeness top-k serve the stalest urls first. Plan: one keyed
        window (partition-local lag per url), one partial-agg groupBy
        reusing the same key, a 1-row broadcast scalar for the clock; the
        final sort is top-k when ``limit`` is set. The oracle-checkable
        twin of this ranking is queries/relational.py q_recrawl_priority.
        """
        manifest = self.store.read_manifest() or Manifest()
        paths = self.store.visited_paths(manifest)
        if not paths:
            return self.spark.createDataFrame([], "url string, priority int")
        hist = self.spark.read.parquet(*paths)
        fp = (
            F.coalesce(F.col("content_hash"), F.col("status").cast("string"))
            if "content_hash" in hist.columns
            else F.col("status").cast("string")
        )
        hist = hist.select("url_norm", "wave", fp.alias("_fp"))
        w = Window.partitionBy("url_norm").orderBy("wave")
        per = (
            hist.withColumn("_prev", F.lag("_fp").over(w))
            .groupBy("url_norm")
            .agg(
                F.count(F.lit(1)).alias("n_obs"),
                F.sum(
                    F.when(
                        F.col("_prev").isNotNull()
                        & (F.col("_prev") != F.col("_fp")),
                        1,
                    ).otherwise(0)
                ).alias("n_changes"),
                F.min("wave").alias("first_wave"),
                F.max("wave").alias("last_wave"),
            )
        )
        now = hist.agg(F.max("wave").alias("_now"))
        ranked = (
            per.join(F.broadcast(now))
            .where(
                (F.col("n_obs") >= 2) & (F.col("last_wave") > F.col("first_wave"))
            )
            .withColumn(
                "_staleness",
                F.expr(
                    "(n_changes * (_now - last_wave) * 1000000)"
                    " div (last_wave - first_wave)"
                ),
            )
        )
        # rank -> priority: a global row_number window. Single-partition by
        # construction, but the input here is the per-URL rollup of urls
        # with >=2 observations — bounded by the recrawl set, never by
        # |visited| — and a total order is exactly what a schedule is.
        rw = Window.orderBy(F.col("_staleness").desc(), "url_norm")
        out = ranked.select(
            F.col("url_norm").alias("url"),
            (F.row_number().over(rw) - 1).cast("int").alias("priority"),
        )
        return out.limit(limit) if limit is not None else out

    def template_report(self, limit: int | None = None) -> DataFrame:
        """Per-template fan-out report over the committed fetchlog — the
        tuning companion to ``max-pages-per-template``: run a capless (or
        generously-capped) crawl, read the report, and the templates whose
        ``n_urls`` dwarf everything else ARE the traps (feed them to
        ``preblocked-templates``, or pick a cap above the legitimate
        templates' fan-out). One partial-agg groupBy on the template key
        (functions/templates.py) — output cardinality is hosts × templates
        at any crawl size; ``n_capped`` counts units a guard already
        dropped so a re-run's report shows the guard working. The
        oracle-checkable analysis twin over the synthetic tables is
        queries/relational.py q_url_template_traps."""
        from brink_spark.functions.templates import url_template

        manifest = self.store.read_manifest() or Manifest()
        if manifest.last_wave < 0:
            return self.spark.createDataFrame(
                [],
                "template string, n_urls long, n_attempts long, n_capped long",
            )
        flog = self.store.read_asof(
            self.spark, "fetchlog", manifest.last_wave
        ).withColumn("template", url_template(F.col("url_norm")))
        out = (
            flog.filter(
                F.col("outcome").isin(
                    "miss", "not_allowed", "too_large", "ok", "not_modified",
                    "template_capped",
                )
            )
            .groupBy("template")
            .agg(
                F.countDistinct(
                    F.when(F.col("outcome") != "template_capped", F.col("url_norm"))
                ).alias("n_urls"),
                F.count_if(F.col("outcome") != "template_capped").alias(
                    "n_attempts"
                ),
                F.count_if(F.col("outcome") == "template_capped").alias(
                    "n_capped"
                ),
            )
            .orderBy(F.col("n_urls").desc(), "template")
        )
        return out.limit(limit) if limit is not None else out

    def run(
        self,
        fixture=None,
        seeds: DataFrame | None = None,
        resume: bool = False,
        max_waves: int | None = None,
    ) -> CrawlSummary:
        from brink_spark.sources.sitegen import (
            pages_to_spark,
            robots_to_spark,
            seeds_to_spark,
        )

        if fixture is not None:
            if self.pages is None:
                self.pages = pages_to_spark(self.spark, fixture)
            if self.robots is None:
                self.robots = robots_to_spark(self.spark, fixture)
                self._rules = robots_rules_per_host(self.robots)
                self._budgets = budget_per_host(self.robots, self.config.politeness_budget)
            if seeds is None and not resume:
                seeds = seeds_to_spark(self.spark, fixture)

        max_waves = max_waves if max_waves is not None else self.config.max_waves
        summary = CrawlSummary()
        t0 = time.time()

        manifest = self.store.read_manifest() if resume else None
        if manifest is None:
            self.store.reset()
            self._host_taken = None  # engine reuse: fresh run, fresh counts
            if seeds is None:
                raise ValueError("fresh run requires seeds")
            # sitemap bootstrap: each entry host's robots.txt `Sitemap:`
            # lines resolve to sitemap XML in the pages table; parsed URLs
            # join wave 0 as ordinary seeds (their mapped priority decides
            # fetch order). The entry list collect is bounded: seed lists
            # are human-provided config, never corpus-sized.
            if self.config.sitemap_discovery and self.pages is None:
                # http mode has no pages table to resolve robots/sitemap
                # bodies against — warn instead of silently no-opping the
                # accepted TOML key (a live-crawl sitemap fetch stage is a
                # deliberate non-goal: wave-0 bootstrap would need its own
                # fetch round-trip before the frontier exists)
                import warnings

                warnings.warn(
                    "sitemap_discovery=True but the engine has no pages "
                    "table (fetch_mode='http'): no sitemap seeds will be "
                    "discovered",
                    stacklevel=2,
                )
            if self.config.sitemap_discovery and self.pages is not None:
                from brink_spark.sources.sitemap import discover_sitemap_seeds

                entry = [r["url"] for r in seeds.select("url").collect()]
                disc = discover_sitemap_seeds(
                    self.pages,
                    entry,
                    self.norm_udf,
                    self.config.ignore_get_parameters,
                    self.config.fuzzy_get_parameter_checks,
                )
                seeds = (
                    seeds.select("url", F.col("priority").cast("int"))
                    .unionByName(
                        disc.select("url", F.col("priority").cast("int"))
                    )
                )
            self.seed_frontier(seeds)
            manifest = Manifest()
            wave = 0
        else:
            wave = manifest.last_wave + 1
            self.store.clean_uncommitted(manifest.last_wave)
            # any carried frontier count may describe a wave the crash threw
            # away — recount once from parquet instead
            self._pending_frontier_count = None
            # rebuild the host-cap attempt counts from COMMITTED fetchlog
            # waves (attempts = the four fetch outcomes; robots_denied /
            # deferred / host_capped rows were never requests). Overwrites
            # any in-memory state from a crashed in-process run.
            if self.config.max_pages_per_host > 0:
                if manifest.last_wave >= 0:
                    self._host_taken = (
                        self.store.read_asof(
                            self.spark, "fetchlog", manifest.last_wave
                        )
                        .filter(
                            F.col("outcome").isin(
                                "miss", "not_allowed", "too_large", "ok",
                                "not_modified",
                            )
                        )
                        .groupBy("host")
                        .agg(F.count(F.lit(1)).alias("_taken"))
                        .localCheckpoint(eager=True)
                    )
                else:
                    self._host_taken = None
            # rebuild the per-template attempt counts the same way (the
            # template recomputes natively from the committed url_norm)
            if self.config.max_pages_per_template > 0:
                if manifest.last_wave >= 0:
                    from brink_spark.functions.templates import url_template

                    self._template_taken = (
                        self.store.read_asof(
                            self.spark, "fetchlog", manifest.last_wave
                        )
                        .filter(
                            F.col("outcome").isin(
                                "miss", "not_allowed", "too_large", "ok",
                                "not_modified",
                            )
                        )
                        .groupBy(
                            url_template(F.col("url_norm")).alias("template")
                        )
                        .agg(F.count(F.lit(1)).alias("_ttaken"))
                        .localCheckpoint(eager=True)
                    )
                else:
                    self._template_taken = None
            # rebuild the per-url transport-miss counts (retry_misses)
            if self.config.retry_misses > 0:
                if manifest.last_wave >= 0:
                    self._miss_counts = (
                        self.store.read_asof(
                            self.spark, "fetchlog", manifest.last_wave
                        )
                        .filter(F.col("outcome") == "miss")
                        .groupBy("url_norm")
                        .agg(F.count(F.lit(1)).alias("_mn"))
                        .localCheckpoint(eager=True)
                    )
                else:
                    self._miss_counts = None
            # restore the runtime request state committed with the last wave
            # (cookies from committed waves survive a crash; the suppressed
            # Authorization header stays suppressed). Pre-jar manifests
            # (None) keep the constructor's config-derived jar.
            if manifest.cookie_jar is not None:
                self.cookie_jar = dict(manifest.cookie_jar)
                self.auth_suppressed_since_wave = manifest.auth_suppressed_since_wave
                self._check_auth_suppression(wave)
            # new seeds on resume: continue the crawl with extra entry
            # points (the recrawl companion to expire_visited) — union them
            # into the next wave's frontier
            if seeds is not None:
                extra = seeds.select(
                    F.lit("start").alias("linked_from"),
                    F.col("url"),
                    F.col("priority").cast("int").alias("priority"),
                    F.lit(0).alias("depth"),
                )
                if self.store.has("frontier", wave):
                    existing = _with_depth(
                        self.store.read(self.spark, "frontier", wave)
                    ).select("linked_from", "url", "priority", "depth")
                    extra = existing.unionByName(extra)
                self.store.rewrite(extra, "frontier", wave)

        # preblocked templates (the streaming monitor's feedback path,
        # streaming/template_monitor.py): enter the run already saturated
        # — merged as MAX with any resumed counts, so a template is
        # saturated whether the evidence came from this store's fetchlog
        # or from the online monitor
        if (
            self.config.max_pages_per_template > 0
            and self.config.preblocked_templates
        ):
            pre = self.spark.createDataFrame(
                [
                    (t, self.config.max_pages_per_template)
                    for t in self.config.preblocked_templates
                ],
                "template string, _ttaken long",
            )
            tmerged = (
                pre
                if self._template_taken is None
                else self._template_taken.unionByName(pre)
                .groupBy("template")
                .agg(F.max("_ttaken").alias("_ttaken"))
            )
            self._template_taken = tmerged.localCheckpoint(eager=True)

        # Per-run CONSTANT relations, materialized once: the robots rule
        # table and the per-host budget table never change within a run,
        # yet both are groupBy aggregations whose full agg→exchange→agg
        # subtree was re-planned and re-executed inside EVERY wave's plan
        # (and twice where the politeness union references them from both
        # branches). One eager localCheckpoint each turns every later wave's
        # occurrence into a broadcast of a concrete host-sized RDD — the
        # same treatment _host_taken already gets. Size is O(#hosts) at any
        # scale, the same bound the broadcast itself already assumes.
        if self._rules is not None:
            self._rules = self._rules.localCheckpoint(eager=True)
        if self._budgets is not None:
            self._budgets = self._budgets.localCheckpoint(eager=True)

        self._pages_pin = None
        if self.pages is not None:
            cookie_cols = ["set_cookie"] if "set_cookie" in self.pages.columns else []
            redirect_cols = (
                ["redirect_to"] if "redirect_to" in self.pages.columns else []
            )
            pages_slim = self.pages.select(
                "url_norm",
                F.col("status").alias("page_status"),
                "content_length",
                "body",
                *cookie_cols,
                *redirect_cols,
            )
            # 3xx chains collapse ONCE per run (Go's http.Client follows
            # redirects inside Fetch, brink.go:194; operators/redirects.py
            # has the full semantics) — every wave's fetch join then sees
            # final payloads under the original url_norm keys
            pages_slim = collapse_redirect_chains(pages_slim, self.norm_udf)
            # Per-wave fetch-join regime for the pages side (the BIG side,
            # touched every wave):
            #   - bucketed store (pages_bucketed=True): the table is
            #     already hash-bucketed + sorted by url_norm on disk
            #     (sources/corpus.py write_bucketed) — the at-scale answer:
            #     the scan itself reports the co-located layout, so every
            #     wave's join exchanges and sorts ONLY the frontier side,
            #     and the partitioning was paid once at write time. Leave
            #     the scan untouched (materializing would destroy the
            #     layout).
            #   - cache pin (page_pin_bytes > 0 and the store exceeds it):
            #     repartition by the join key + persist() (which, unlike
            #     localCheckpoint, keeps the cached plan's HashPartitioning)
            #     + shuffle-hash hint. Opt-in: the fill cost needs a long
            #     crawl to amortize — see config.page_pin_bytes for the
            #     measured regime boundaries.
            #   - default: localCheckpoint once (kills the per-wave
            #     recompute — in fixture mode each wave would re-serialize
            #     the table from the driver) and let AQE pick the per-wave
            #     strategy (broadcast at small sizes).
            pages_slim = pages_slim.withColumnRenamed("url_norm", "_fk")
            self._pages_hint = False
            # BRINK_NO_PAGE_PIN is the measurement escape hatch for A/B
            # benchmarking this whole block; never set it in production
            if self.pages_bucketed or os.environ.get("BRINK_NO_PAGE_PIN"):
                pass
            elif self.config.page_pin_bytes > 0 and (
                pages_slim.agg(
                    F.sum(F.coalesce(F.length("body"), F.lit(0)))
                ).collect()[0][0]
                or 0
            ) > self.config.page_pin_bytes:
                n_pages_parts = self.fetch_partition_count() or max(
                    int(
                        self.spark.conf.get(
                            "spark.sql.shuffle.partitions", "200"
                        )
                    ),
                    self.spark.sparkContext.defaultParallelism,
                )
                pages_slim = pages_slim.repartition(
                    n_pages_parts, "_fk"
                ).persist()
                pages_slim.count()  # fill the cache before the wave loop
                self._pages_pin = pages_slim
                self._pages_hint = True
            else:
                pages_slim = pages_slim.localCheckpoint(eager=True)
        elif self.config.fetch_mode == "http":
            pages_slim = None  # real sockets; no synthetic pages table
        else:
            raise ValueError("synthetic fetch_mode requires a pages table")

        # HTTP-304-style fast path: bind the expired-entry hash set for
        # this run (bounded by the tombstone count; localCheckpoint so the
        # per-wave left join broadcasts a concrete tiny relation instead
        # of re-scanning visited every wave)
        self._prior_hashes = None
        if self.config.refetch_skip_unchanged:
            ph = self.store.read_expired_visited(self.spark, manifest)
            if ph is not None:
                self._prior_hashes = ph.localCheckpoint(eager=True)

        # cross-wave pipelining: wave N's deferred writes (fetchlog,
        # results, lineage, metrics) + manifest commit drain on a driver
        # thread WHILE wave N+1's stage job runs. Join points: (a) after
        # each _run_wave returns (one finalize in flight at a time, and
        # errors surface before the next commit), (b) before a rank
        # boundary (its _compute_ranks reads the previous wave's deferred
        # results table), (c) before compaction (rewrites manifest-tracked
        # state). In-memory manifest state advances before the commit
        # thread starts so wave N+1 sees last_wave=N; the DISK commit
        # still happens strictly after every wave-N write — crash-resume
        # semantics unchanged.
        import threading

        pending: threading.Thread | None = None
        pending_err: list[BaseException] = []

        def _join_pending():
            nonlocal pending
            if pending is not None:
                pending.join()
                pending = None
                if pending_err:
                    raise pending_err[0]

        K = self.config.rank_priority_every
        try:
            while wave < max_waves:
                if K > 0 and wave > 0 and wave % K == 0:
                    _join_pending()  # rank boundary reads deferred results
                out = self._run_wave(wave, manifest, pages_slim, defer=True)
                _join_pending()
                if out is None:  # empty frontier → graceful stop (F2)
                    break
                m, finish = out
                manifest.last_wave = wave
                manifest.total_visited += m.get("n_ok", 0) + m.get(
                    "n_not_modified", 0
                )
                manifest.cookie_jar = dict(self.cookie_jar)
                manifest.auth_suppressed_since_wave = (
                    self.auth_suppressed_since_wave
                )

                def _finalize(fin=finish, wm=m):
                    try:
                        fin()
                        self.store.commit(manifest)
                        if self.on_wave_committed is not None:
                            self.on_wave_committed(wm)
                    except BaseException as e:  # surfaced at the next join
                        pending_err.append(e)

                if self.config.pipeline_waves:
                    pending = threading.Thread(target=_finalize, daemon=True)
                    pending.start()
                else:  # synchronous mode: finalize inline, errors raise now
                    _finalize()
                    if pending_err:
                        raise pending_err[0]
                summary.wave_metrics.append(m)
                summary.total_fetched += m.get("n_fetched", 0)
                summary.total_ok += m.get("n_ok", 0)
                summary.total_cached += m.get("n_cached", 0)
                summary.total_deferred += m.get("n_deferred", 0)
                summary.total_new_links += m.get("n_new_links", 0)
                if (
                    self.config.compact_visited_every > 0
                    and (wave + 1) % self.config.compact_visited_every == 0
                ):
                    _join_pending()
                    self.store.compact_visited(self.spark, manifest)
                wave += 1
        except BaseException as loop_err:
            # primary failure mid-loop must still JOIN the in-flight
            # finalize thread for the PREVIOUS wave — a daemon commit
            # killed at interpreter exit could leave a half-written
            # manifest, and its buffered pending_err would vanish. The
            # primary exception propagates; a prior-wave finalize failure
            # chains as its __cause__ instead of being dropped.
            if pending is not None:
                pending.join()
                pending = None
            if pending_err and pending_err[0] is not loop_err:
                raise loop_err from pending_err[0]
            raise
        finally:
            # release the pinned page-store cache whether the loop finished
            # or raised (long sessions run many engines; leaked caches
            # accumulate in the block manager)
            if getattr(self, "_pages_pin", None) is not None:
                self._pages_pin.unpersist()
                self._pages_pin = None

        _join_pending()
        manifest.done = True
        self.store.commit(manifest)
        summary.waves = wave
        summary.wall_seconds = time.time() - t0
        return summary

    def fetch_stage(self, wave: int, edges: DataFrame, pages_slim: DataFrame) -> None:
        """The fetch/parse stage (A1/H4 + C1/C2 gates + D1 parse): eligible
        units equi-joined against pages, outcome-gated, host-salt
        repartitioned, spans parsed, written as the ``fetchpage`` scratch
        table. In production this is the mapInPandas HTTP fetch; the salt
        keeps one mega-host from serializing a wave while co-locating
        same-host batches for connection reuse. Exposed standalone because
        fetch throughput is the north-rule scaling metric."""
        cfg = self.config
        eligible_units = edges.filter(
            (F.col("edge_kind") == "fresh")
            & (F.col("_edge_rank") == 1)
            & F.col("eligible")
        )
        if cfg.fetch_mode == "http":
            # production shape: repartition by the host salt FIRST so the
            # mapInPandas fetch sees mostly-same-host batches (connection
            # reuse), then fetch over real sockets
            from brink_spark.operators.http_fetch import http_fetch_columns

            n_parts0 = self.fetch_partition_count()
            salt0 = F.xxhash64("host", "url_norm")
            eligible_units = (
                eligible_units.repartition(n_parts0, salt0)
                if n_parts0 > 0
                else eligible_units.repartition(salt0)
            )
            fetched = http_fetch_columns(
                eligible_units,
                self.request_headers(),
                cfg.http_timeout,
                pool_size=cfg.http_pool_size,
            )
        else:
            fetched = eligible_units.join(pages_slim, "url_norm", "left")
        fetched = fetched.withColumn(
            "outcome",
            F.when(F.col("page_status").isNull(), "miss")
            .when(
                ~domain_allowed(F.col("scheme"), F.col("host"), self.allowed_keys),
                "not_allowed",
            )
            .when(
                F.col("content_length") > cfg.effective_max_content_length,
                "too_large",
            )
            .otherwise("ok"),
        )
        # salt = raw 64-bit hash (unbounded cardinality, no modulus ceiling);
        # partition count AQE-managed unless explicitly overridden — see
        # fetch_partition_count. In http mode the units were already salted
        # BEFORE the socket fetch; don't shuffle the fetched bodies again.
        if cfg.fetch_mode != "http":
            n_parts = self.fetch_partition_count()
            salt = F.xxhash64("host", "url_norm")
            fetched = (
                fetched.repartition(n_parts, salt)
                if n_parts > 0
                else fetched.repartition(salt)
            )
        # when() on the UDF INPUT: Spark doesn't short-circuit Python UDFs,
        # so gating the body column (not the udf call) is what actually
        # skips the parse for non-ok rows (same fix as the wave stage)
        fetched = fetched.withColumn(
            "spans",
            parse_spans_udf(F.when(F.col("outcome") == "ok", F.col("body"))),
        ).withColumn("partition_id", F.spark_partition_id())
        cookie_cols = ["set_cookie"] if "set_cookie" in fetched.columns else []
        self.store.write(
            fetched.select(
                "url_norm",
                "linked_from",
                "url",
                "unit_priority",
                "host",
                "path",
                "outcome",
                F.col("page_status").cast("int").alias("page_status"),
                "base_scheme",
                "base_host",
                "spans",
                "partition_id",
                *cookie_cols,
            ),
            "fetchpage",
            wave,
        )

    # ------------------------------------------------------------------
    # link-authority ranking (the PageRank -> frontier-priority closed loop)
    RANK_ITERS = 3
    RANK_BUCKET_DIV = 10_000
    RANK_BUCKET_CAP = 2_000_000_000  # |priority| stays inside int32

    def _compute_ranks(self, upto_wave: int) -> DataFrame:
        """Integer PageRank over the crawl's OWN link graph so far: edges =
        every handler row's normalize(linked_from) -> url_norm from waves
        [0, upto_wave) (sources/corpus.py linkgraph_from_store shape). Same
        all-integer arithmetic as queries/relational.py q_graph_pagerank
        (ranks in millionths, damping 85/100 via integer div) so the oracle
        is bit-exact. At scale each iteration is one shuffle keyed on dst;
        RANK_ITERS is fixed so resume recomputes identical ranks."""
        spark, store = self.spark, self.store
        # backend-agnostic cumulative read (parquet dir union / Iceberg
        # _wave <= K filter)
        res = store.read_asof(spark, "results", upto_wave - 1)
        edges = (
            res.filter(F.col("linked_from") != "start")
            .withColumn("_p", self.norm_udf("linked_from"))
            .select(
                F.col("_p.url_norm").alias("src"), F.col("url_norm").alias("dst")
            )
            .filter(F.col("src").isNotNull())
            .distinct()
        )
        nodes = (
            edges.select(F.col("src").alias("node"))
            .union(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        # lineage cuts (queries/iterate.py): edges is re-joined and ranks
        # re-referenced every iteration; without the cuts the plan — and
        # the results-table read + normalize UDF under it — doubles per
        # round, driver planning cost growing 2^RANK_ITERS
        edges = _cut(edges)
        nodes = _cut(nodes)
        ranks = nodes.withColumn("rank", F.lit(1_000_000).cast("bigint"))
        for _ in range(self.RANK_ITERS):
            contrib = (
                edges.join(deg, "src")
                .join(ranks.withColumnRenamed("node", "src"), "src")
                .select("dst", F.expr("rank div d").alias("c"))
            )
            insum = contrib.groupBy("dst").agg(F.sum("c").alias("insum"))
            ranks = _cut(
                nodes.join(
                    insum.withColumnRenamed("dst", "node"), "node", "left"
                ).select(
                    "node",
                    (
                        F.lit(150_000)
                        + F.expr("(85 * coalesce(insum, 0L)) div 100")
                    )
                    .cast("bigint")
                    .alias("rank"),
                )
            )
        return ranks.select(F.col("node").alias("url_norm"), "rank")

    def _reprioritize_frontier(self, wave: int, frontier: DataFrame) -> DataFrame:
        """The PageRank -> priority closed loop, applied at every K-wave
        boundary: recompute ranks over the committed waves [0, wave) and
        re-stamp the CURRENT frontier — each edge's priority becomes its
        PARENT page's bucketed authority (negated: lower value = fetched
        earlier). The parents of wave-B frontier edges were fetched in
        waves < B, so they are in the rank graph by construction; unranked
        parents (and 'start' seeds) keep their existing priority. Edges
        discovered after the boundary inherit their unit's (re-stamped)
        priority until the next boundary — the OPIC-style propagation.
        The ranks snapshot persists as the ``ranks`` store table, so
        crash-resume re-reads (or deterministically recomputes) it."""
        K = self.config.rank_priority_every
        if K <= 0 or wave == 0 or wave % K != 0:
            return frontier
        if not self.store.has("ranks", wave):
            with self._phase("rank-compute"):
                self.store.write(self._compute_ranks(wave), "ranks", wave)
        ranks = self.store.read(self.spark, "ranks", wave)
        rank_prio = ranks.select(
            F.col("url_norm").alias("_pn"),
            (
                -F.least(
                    F.expr(f"rank div {self.RANK_BUCKET_DIV}"),
                    F.lit(self.RANK_BUCKET_CAP).cast("bigint"),
                )
            )
            .cast("int")
            .alias("_rank_prio"),
        )
        return (
            frontier.withColumn("_pn", self.norm_udf("linked_from").getField("url_norm"))
            .join(rank_prio, "_pn", "left")
            .select(
                "linked_from",
                "url",
                F.coalesce("_rank_prio", F.col("priority")).cast("int").alias("priority"),
                "depth",
            )
        )

    # ------------------------------------------------------------------
    # Per-wave constant expressions, built ONCE per engine. Column objects
    # are immutable expression trees, but constructing one is a py4j
    # round-trip per operator (~0.2-0.5 ms each on this host); _run_wave
    # used to rebuild the same ~200 operators every wave — several hundred
    # driver-blocking milliseconds per wave of pure expression plumbing.
    # Everything here is independent of the wave number and of any
    # DataFrame instance (unbound F.col references only); the few
    # wave-varying literals (F.lit(wave)) stay inline at the call sites.
    _wx = None

    def _wave_exprs(self):
        if self._wx is not None:
            return self._wx
        from types import SimpleNamespace

        cfg = self.config
        norm_cols = [
            "linked_from",
            "url",
            "priority",
            "depth",
            F.col("_p.url_norm").alias("url_norm"),
            F.col("_p.scheme").alias("scheme"),
            F.col("_p.host").alias("host"),
            F.col("_p.path").alias("path"),
            F.col("_p.base_scheme").alias("base_scheme"),
            F.col("_p.base_host").alias("base_host"),
        ]
        we = Window.partitionBy("url_norm", "_is_fresh").orderBy(
            "priority", "linked_from", "url"
        )
        wu = Window.partitionBy("url_norm", "_is_fresh")
        fresh1 = (F.col("edge_kind") == "fresh") & (F.col("_edge_rank") == 1)
        fetchable = fresh1 & F.col("eligible")
        flag_cols = [
            "linked_from",
            "url",
            "priority",
            "depth",
            "url_norm",
            "scheme",
            "host",
            "path",
            "base_scheme",
            "base_host",
        ]
        fresh_flagged_cols = flag_cols + [
            "_edge_rank",
            "unit_priority",
            "unit_depth",
            F.coalesce("_robots_denied", F.lit(False)).alias("robots_denied"),
            F.coalesce("_eligible", F.lit(False)).alias("eligible"),
            F.coalesce("_host_capped", F.lit(False)).alias("host_capped"),
            F.coalesce("_template_capped", F.lit(False)).alias("template_capped"),
            F.lit("fresh").alias("edge_kind"),
            F.lit(None).cast("int").alias("seen_status"),
        ]
        cached_flagged_cols = flag_cols + [
            F.lit(0).alias("_edge_rank"),
            F.col("priority").alias("unit_priority"),
            F.col("depth").alias("unit_depth"),
            F.lit(False).alias("robots_denied"),
            F.lit(False).alias("eligible"),
            F.lit(False).alias("host_capped"),
            F.lit(False).alias("template_capped"),
            F.lit("seen").alias("edge_kind"),
            F.col("status").cast("int").alias("seen_status"),
        ]
        outcome_expr = F.when(
            fetchable,
            F.when(F.col("page_status").isNull(), "miss")
            .when(
                ~domain_allowed(F.col("scheme"), F.col("host"), self.allowed_keys),
                "not_allowed",
            )
            .when(
                F.col("content_length") > cfg.effective_max_content_length,
                "too_large",
            )
            .otherwise("ok"),
        )
        stage_cols = flag_cols + [
            "_edge_rank",
            "unit_priority",
            "unit_depth",
            "robots_denied",
            "eligible",
            "host_capped",
            "template_capped",
            "edge_kind",
            "seen_status",
            "outcome",
            F.col("page_status").cast("int").alias("page_status"),
            "spans",
            "partition_id",
        ]
        stage_aggs = [
            F.count(F.lit(1)).alias("n_edges"),
            F.count_if(F.col("edge_kind") == "seen").alias("n_cached"),
            F.count_if(fresh1).alias("n_units"),
            F.count_if(fresh1 & F.col("robots_denied")).alias("n_robots_denied"),
            F.count_if(fresh1 & F.col("eligible")).alias("n_eligible"),
            F.count_if(fresh1 & F.col("host_capped")).alias("n_host_capped"),
            F.count_if(fresh1 & F.col("template_capped")).alias(
                "n_template_capped"
            ),
            F.count_if(F.col("outcome") == "miss").alias("n_miss"),
            F.count_if(F.col("outcome") == "not_allowed").alias("n_not_allowed"),
            F.count_if(F.col("outcome") == "too_large").alias("n_too_large"),
            F.count_if(F.col("outcome") == "ok").alias("n_ok"),
        ] + (
            [F.count_if(F.col("outcome") == "not_modified").alias("n_not_modified")]
            if cfg.refetch_skip_unchanged
            else []
        )
        edge_log_filter = fresh1 & (F.col("robots_denied") | ~F.col("eligible"))
        edge_log_outcome = (
            F.when(F.col("robots_denied"), "robots_denied")
            .when(F.col("template_capped"), "template_capped")
            .when(F.col("host_capped"), "host_capped")
            .otherwise("deferred")
        )
        trav_filter = (
            (F.col("page_status") == 200)
            & ~path_forbidden_expr(F.col("path"), cfg.forbidden_paths)
            & F.col("base_scheme").isNotNull()
        )
        link_explode_cols = [
            F.col("url").alias("_parent_url"),
            F.col("url_norm").alias("_parent_norm"),
            "unit_priority",
            "unit_depth",
            "base_scheme",
            "base_host",
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("link"))
            ).alias("_s"),
        ]
        link_raw_cols = [
            "_parent_url",
            "_parent_norm",
            "unit_priority",
            "unit_depth",
            "base_scheme",
            "base_host",
            F.coalesce(F.col("_s.text"), F.lit("")).alias("_raw"),
        ]
        c5_filter = (F.col("_raw") != "javascript:;") & ~F.col("_raw").startswith(
            "#"
        )
        href_expr = F.expr("trim(BOTH ' ' FROM _raw)")
        resolved_expr = (
            F.when(
                F.col("_href").startswith("//"),
                F.concat(F.col("base_scheme"), F.lit("://"), F.col("_href")),
            )
            .when(
                F.col("_href").startswith("/"),
                F.concat(
                    F.col("base_scheme"),
                    F.lit("://"),
                    F.col("base_host"),
                    F.col("_href"),
                ),
            )
            .otherwise(F.col("_href"))
        )
        new_edge_cols = [
            F.col("_parent_url").alias("linked_from"),
            F.col("_resolved").alias("url"),
            F.col("unit_priority").alias("priority"),
            (F.col("unit_depth") + F.lit(1)).alias("depth"),
        ]
        deferred_filter = (
            (F.col("edge_kind") == "fresh")
            & ~F.col("eligible")
            & ~F.col("robots_denied")
            & ~F.col("host_capped")
            & ~F.col("template_capped")
        )
        depth_capped_expr = (
            (F.lit(cfg.max_depth) > 0) & (F.col("depth") > cfg.max_depth)
            if cfg.max_depth > 0
            else F.lit(False)
        )
        next_aggs = [
            F.count_if(~F.col("_depth_capped")).alias("n_next"),
            F.count_if(~F.col("deferred") & ~F.col("_depth_capped")).alias(
                "n_new_links"
            ),
            F.count_if(F.col("_depth_capped")).alias("n_depth_capped"),
        ]
        res_first_tail = [
            "linked_from",
            "url_norm",
            F.col("page_status").alias("status"),
            F.lit(False).alias("cached"),
            F.lit("fetched").alias("row_kind"),
            "spans",
        ]
        res_others_tail = [
            "linked_from",
            "url_norm",
            F.col("page_status").alias("status"),
            F.lit(True).alias("cached"),
            F.lit("dup_edge").alias("row_kind"),
            F.lit(None).cast(SPANS_TYPE).alias("spans"),
        ]
        res_seen_tail = [
            "linked_from",
            "url_norm",
            F.col("seen_status").alias("status"),
            F.lit(True).alias("cached"),
            F.lit("seen").alias("row_kind"),
            F.lit(None).cast(SPANS_TYPE).alias("spans"),
        ]
        self._wx = SimpleNamespace(
            norm_cols=norm_cols,
            outcome_ok=F.col("outcome") == "ok",
            okish_filter=F.col("outcome").isin("ok", "not_modified"),
            fresh_gt1_filter=(F.col("edge_kind") == "fresh")
            & (F.col("_edge_rank") > 1),
            seen_filter=F.col("edge_kind") == "seen",
            res_first_tail=res_first_tail,
            res_others_tail=res_others_tail,
            res_seen_tail=res_seen_tail,
            urlnorm_notnull=F.col("url_norm").isNotNull(),
            status_isnull=F.col("status").isNull(),
            is_fresh=F.col("_is_fresh"),
            edge_rank_col=F.row_number().over(we),
            unit_priority_col=F.min("priority").over(wu),
            unit_depth_col=F.min("depth").over(wu),
            rank1=F.col("_edge_rank") == 1,
            fresh1=fresh1,
            fetchable=fetchable,
            fk_expr=F.when(fetchable, F.col("url_norm")).otherwise(
                F.concat(F.lit("\x00skip:"), F.col("url_norm"))
            ),
            fresh_flagged_cols=fresh_flagged_cols,
            cached_flagged_cols=cached_flagged_cols,
            outcome_expr=outcome_expr,
            spans_expr=parse_spans_udf(
                F.when(F.col("outcome") == "ok", F.col("body"))
            ),
            pid_expr=F.spark_partition_id(),
            stage_cols=stage_cols,
            stage_aggs=stage_aggs,
            unit_prio_as_prio=F.col("unit_priority").alias("priority"),
            edge_log_filter=edge_log_filter,
            edge_log_outcome=edge_log_outcome,
            outcome_notnull=F.col("outcome").isNotNull(),
            trav_filter=trav_filter,
            link_explode_cols=link_explode_cols,
            link_raw_cols=link_raw_cols,
            c5_filter=c5_filter,
            href_expr=href_expr,
            resolved_expr=resolved_expr,
            c6_filter=F.col("_resolved") != "",
            new_edge_cols=new_edge_cols,
            deferred_filter=deferred_filter,
            depth_capped_expr=depth_capped_expr,
            next_aggs=next_aggs,
        )
        return self._wx

    @contextmanager
    def _phase(self, name: str):
        if os.environ.get("BRINK_TIMING"):
            t0 = time.time()
            yield
            print(f"    [{name}] {time.time()-t0:.2f}s", flush=True)
        else:
            yield

    # ------------------------------------------------------------------
    def _run_wave(
        self,
        wave: int,
        manifest: Manifest,
        pages_slim: DataFrame,
        defer: bool = False,
    ):
        """One wave as ONE materialized stage + shallow projections.

        ``defer=True`` (the run() loop's mode) returns ``(metrics,
        finish)`` after only the GATING writes — frontier(wave+1) and
        visited+bloom, the tables the next wave's stage reads — have
        committed; ``finish()`` blocks on the remaining writes (fetchlog,
        results, lineage) and writes the metrics row. run() starts wave
        N+1's stage while finish(N) drains, overlapping the next wave's
        big materialization with this wave's auxiliary flushes (the spans
        payload in results is the widest write of the wave). Crash
        semantics are unchanged: the manifest commits only after
        finish(), so an interrupted overlap leaves wave N (and any N+1
        partials) uncommitted and clean_uncommitted recomputes them.
        ``defer=False`` preserves the fully synchronous contract for
        direct callers (streaming loop, CLI wrapper).

        The ``wavestage`` scratch table (edge grain): normalize ->
        seen-split (Bloom prefilter + exact joins) -> per-unit edge
        ranking -> robots gate -> politeness eligibility joined back onto
        every edge, THEN the fetch columns ride the same write — pages
        equi-join (or socket fetch) + gates + host-salted span parse,
        populated only on each unit's rank-1 eligible row. Every output
        table (fetchlog/visited/bloom/results/frontier) is a flat
        filter/projection of this one scratch parquet table.

        Materializing the deep DAG exactly once keeps the driver out of
        the picture: without this, each action re-analyzes the full
        lineage (Catalyst planning is serial driver time) and the wave's
        wall clock is dominated by plan depth rather than data. r2 used
        TWO materializations (edges, then fetchpage); fusing them saves a
        full plan+submit+write+read cycle per wave — the fixed cost that
        dominated the wave wall at bench scale. This is also the
        Iceberg-native shape: the scratch stage is an ordinary table.

        Metrics ride the writes: every per-wave counter is an Observation
        attached to the FINAL pre-write node of an existing write job (a
        node that appears once in the plan — observing an interior fan-out
        node would double-count), so no separate groupBy().count().collect()
        jobs run. n_frontier is observed on the PREVIOUS wave's frontier
        write and carried forward; only the per-partition lineage diagnostic
        (collect_metrics=True) costs an extra action.
        """
        spark, store, cfg = self.spark, self.store, self.config
        wx = self._wave_exprs()
        frontier = self._reprioritize_frontier(
            wave, _with_depth(store.read(spark, "frontier", wave))
        )
        m = dict(wave=wave)

        n_frontier = self._pending_frontier_count
        if n_frontier is None:  # resume: one columnless parquet count
            with self._phase("frontier-count"):
                n_frontier = frontier.count()
        m["n_frontier"] = n_frontier
        if n_frontier == 0:
            return None

        norm = frontier.withColumn("_p", self.norm_udf("url")).select(
            *wx.norm_cols
        )
        edges_all = norm.filter(wx.urlnorm_notnull)

        visited = store.read_visited(spark, manifest)
        # adaptive Bloom: the prefilter costs one Arrow cogroup pass and only
        # wins when the exact anti-join's build side is big — stay exact-only
        # below the threshold; on the activation wave build the shards once
        # from the full visited set (lazy DF — materialized by this wave's
        # probe + bloom write)
        use_bloom = self.bloom is not None and (
            cfg.bloom_min_visited == 0
            or manifest.total_visited >= cfg.bloom_min_visited
        )
        if use_bloom:
            if manifest.last_wave >= 0 and store.has("bloom", manifest.last_wave):
                bloom_shards = store.read(spark, "bloom", manifest.last_wave)
            elif visited is not None:
                bloom_shards = self.bloom.updated(visited, self.bloom.empty(spark))
            else:
                bloom_shards = self.bloom.empty(spark)
        else:
            bloom_shards = None
        marked = mark_seen(
            edges_all, visited, self.bloom if use_bloom else None, bloom_shards
        ).withColumn("_is_fresh", wx.status_isnull)
        # rank edges within their unit; first edge wins the fetch. The
        # windows run on the MARKED table (before the split): a url_norm is
        # never both fresh and cached within a wave (its seen verdict is a
        # property of the key), and _is_fresh in the partition key makes
        # that independence structural — so fresh rows get exactly the
        # ranks the old fresh-only window produced, and the cached rows'
        # window values are simply never read (cached_flagged projects
        # literals). Computing them pre-checkpoint means ONE url_norm
        # shuffle per wave instead of one per branch (the plan referenced
        # the windowed fresh edges from four subtrees, two of which could
        # not share an exchange because WindowGroupLimit specialized them).
        marked = (
            marked.withColumn("_edge_rank", wx.edge_rank_col)
            .withColumn("unit_priority", wx.unit_priority_col)
            # a page's depth is the MIN over its discovering edges (same
            # window — no extra shuffle)
            .withColumn("unit_depth", wx.unit_depth_col)
        )
        # One wave-sized materialization of the normalized, seen-tagged,
        # unit-ranked edges. The wave plan fans out from this point into
        # FIVE subtrees (units→politeness candidates / politeness rejected
        # / the flags-join left side / cached / traversal), and Spark
        # physical plans are trees: without the cut every branch re-ran the
        # frontier scan, the normalize UDF, the visited join and the unit
        # windows (measured: 5 copies of the scan+ArrowEvalPython subtree
        # in one wave's plan, 15 AQE jobs / 26 stages per wave on a
        # ~400-row frontier — the driver-side fixed cost that dominated the
        # crawl bench). After the cut each branch reads a tiny in-memory
        # RDD leaf. The checkpoint is wave-scoped scratch (the same bytes
        # the wavestage write pushes to parquet), so memory stays bounded
        # by one wave at any scale.
        marked = marked.localCheckpoint(eager=True)
        fresh = marked.filter(wx.is_fresh).drop("status", "_is_fresh")
        cached = marked.filter(~wx.is_fresh).drop(
            "_edge_rank", "unit_priority", "unit_depth", "_is_fresh"
        )
        units = with_robots_denied(fresh.filter(wx.rank1), self._rules)
        # template trap guard (max_pages_per_template > 0): units whose
        # URL template is already saturated drop before politeness — they
        # never consume a budget rank, so a lower-priority real page on
        # the same host admits in their place (the oracle's `continue`
        # before the rank increment). The broadcast side carries ONLY
        # saturated templates: unsaturated ones cannot block anything, so
        # the join input stays trap-sized, not corpus-sized. Robots denial
        # wins when both apply (the oracle checks robots in step 4).
        if (
            cfg.max_pages_per_template > 0
            and self._template_taken is not None
        ):
            from brink_spark.functions.templates import url_template

            blocked = (
                self._template_taken.filter(
                    F.col("_ttaken") >= cfg.max_pages_per_template
                )
                .select("template")
                .withColumn("_tpl_blocked", F.lit(True))
            )
            units = (
                units.withColumn("template", url_template(F.col("url_norm")))
                .join(F.broadcast(blocked), "template", "left")
                .withColumn(
                    "_template_capped",
                    F.coalesce("_tpl_blocked", F.lit(False))
                    & ~F.col("_robots_denied"),
                )
                .drop("_tpl_blocked", "template")
            )
        else:
            units = units.withColumn("_template_capped", F.lit(False))
        polite_in = units.filter(
            ~F.col("_robots_denied") & ~F.col("_template_capped")
        )
        if cfg.politeness_key == "site":
            # site mode: every subdomain of one registrable site shares a
            # single per-wave budget (functions/domains.py); budget
            # resolution and the trap-guard cap stay host-keyed facts
            from brink_spark.functions.domains import registrable_domain

            polite_in = polite_in.withColumn(
                "site", registrable_domain(F.col("host"))
            )
        polite = apply_politeness(
            polite_in,
            self._budgets,
            cfg.politeness_budget,
            cfg.politeness_salts,
            host_counts=self._host_taken,
            max_pages_per_host=cfg.max_pages_per_host,
            key=cfg.politeness_key,  # validated in CrawlConfig.__post_init__
        )
        unit_flags = units.select(
            "url_norm", "_robots_denied", "_template_capped"
        ).join(
            polite.select("url_norm", "_eligible", "_host_capped"),
            "url_norm",
            "left",
        )
        fresh_flagged = fresh.join(unit_flags, "url_norm", "left").select(
            *wx.fresh_flagged_cols
        )
        cached_flagged = cached.select(*wx.cached_flagged_cols)
        _fresh1 = wx.fresh1
        _fetchable = wx.fetchable
        combined = fresh_flagged.unionByName(cached_flagged)

        # --- fused fetch (A1/H4) + gates (C1/C2) + parse (D1), edge grain --
        # One materialization per wave: the fetch/parse columns ride the
        # SAME write as the edge flags (r2 wrote 'edges' then 'fetchpage' —
        # two plan+submit+write+read cycles whose fixed cost dominated the
        # wave wall at bench scale). Fetch columns populate only on the
        # rank-1 eligible row of each unit; every output table below is a
        # flat filter/projection of this one scratch table.
        if cfg.fetch_mode == "http":
            from brink_spark.operators.http_fetch import http_fetch_columns

            # salt BEFORE the socket fetch so connections see mostly-
            # same-host batches (operators/http_fetch.py)
            combined = combined.withColumn("_do_fetch", _fetchable)
            n_parts = self.fetch_partition_count()
            salt = F.xxhash64("host", "url_norm")
            combined = (
                combined.repartition(n_parts, salt)
                if n_parts > 0
                else combined.repartition(salt)
            )
            joined = http_fetch_columns(
                combined,
                self.request_headers(),
                cfg.http_timeout,
                guard_col="_do_fetch",
                pool_size=cfg.http_pool_size,
            ).drop("_do_fetch")
        else:
            # conditional equi-join key: non-fetch rows get a key no
            # normalized URL can collide with (\x00 prefix) instead of
            # NULL — nulls would pile every cached/deferred edge of the
            # wave into one join partition (skew); the prefixed key keeps
            # the shuffle uniform while never matching a page
            # pages_slim arrives fetch-join-ready: keyed by _fk, materialized
            # (and, when big, pre-shuffled + pinned) once per run — see
            # run()'s page-store setup
            pages_j = pages_slim
            probe = combined.withColumn("_fk", wx.fk_expr)
            if getattr(self, "_pages_hint", False):
                # pinned regime: shuffle-hash with the FRONTIER as the
                # build side — pages streams straight out of its
                # partitioned cache, no sort, no exchange
                probe = probe.hint("shuffle_hash")
            joined = probe.join(pages_j, "_fk", "left").drop("_fk")
            # NO re-salt here: the equi-join already hash-distributes the
            # wave by _fk (≈url_norm), so a mega-host's pages spread
            # uniformly and the parse runs in the join's own reduce stage
            # at AQE-chosen width — a second repartition would shuffle the
            # full body column again purely to reach an equivalent
            # distribution (in http mode the salt is load-bearing: it
            # groups same-host rows for connection reuse BEFORE the
            # socket fetch; here the "fetch" IS the join). An explicit
            # partition override still forces it (a cluster-sizing hint
            # must beat AQE).
            n_parts = self.fetch_partition_count()
            if n_parts > 0:
                joined = joined.repartition(
                    n_parts, F.xxhash64("host", "url_norm")
                )
        joined = joined.withColumn("outcome", wx.outcome_expr)
        if cfg.refetch_skip_unchanged:
            # HTTP-304-style fast path: an EXPIRED url refetched with an
            # unchanged body hash becomes outcome 'not_modified' BEFORE
            # the spans column, so the parse UDF (the expensive stage)
            # never sees it. Its links were already traversed when first
            # seen, so skipping traversal loses nothing; the seen set is
            # re-armed by the visited write below.
            joined = joined.withColumn(
                "content_hash",
                F.when(F.col("outcome") == "ok", F.xxhash64("body")),
            )
            if self._prior_hashes is not None:
                joined = (
                    joined.join(
                        F.broadcast(self._prior_hashes), "url_norm", "left"
                    )
                    .withColumn(
                        "outcome",
                        F.when(
                            (F.col("outcome") == "ok")
                            & (F.col("prior_hash") == F.col("content_hash")),
                            "not_modified",
                        ).otherwise(F.col("outcome")),
                    )
                    .drop("prior_hash")
                )
        # null the UDF's INPUT, not its output: Spark does not short-circuit
        # Python UDFs inside when() — `when(cond, udf(body))` still ships
        # every body to Python and discards the result for false rows
        # (too_large, not_allowed, and the not_modified fast path would all
        # pay the full parse). With the when() on the body column the
        # filter runs natively and Python sees null for skipped rows.
        joined = joined.withColumn("spans", wx.spans_expr).withColumn(
            "partition_id", wx.pid_expr
        )
        cookie_cols = ["set_cookie"] if "set_cookie" in joined.columns else []
        hash_cols = ["content_hash"] if cfg.refetch_skip_unchanged else []
        obs_stage = Observation(f"w{wave}_stage")
        stage_out = joined.select(
            *wx.stage_cols, *cookie_cols, *hash_cols
        ).observe(obs_stage, *wx.stage_aggs)
        with self._phase("stage-fused"):
            store.write(stage_out, "wavestage", wave)
        edges = store.read(spark, "wavestage", wave)
        fetchpage = edges.filter(wx.outcome_notnull)
        ec = obs_stage.get
        m["n_cached"] = ec["n_cached"]
        m["n_units"] = ec["n_units"]
        m["n_robots_denied"] = ec["n_robots_denied"]
        m["n_host_capped"] = ec["n_host_capped"]
        m["n_template_capped"] = ec["n_template_capped"]
        m["n_deferred"] = (
            ec["n_units"]
            - ec["n_robots_denied"]
            - ec["n_eligible"]
            - ec["n_host_capped"]
            - ec["n_template_capped"]
        )
        # malformed = frontier rows minus all surviving edges
        m["n_malformed"] = n_frontier - ec["n_edges"]
        m["n_miss"] = ec["n_miss"]
        m["n_not_allowed"] = ec["n_not_allowed"]
        m["n_too_large"] = ec["n_too_large"]
        m["n_ok"] = ec["n_ok"]
        m["n_fetched"] = (
            ec["n_miss"] + ec["n_not_allowed"] + ec["n_too_large"] + ec["n_ok"]
        )
        if cfg.refetch_skip_unchanged:
            # a not_modified row was a real fetch attempt (HTTP-304 shape)
            m["n_not_modified"] = ec["n_not_modified"]
            m["n_fetched"] += ec["n_not_modified"]

        # lifetime per-host attempt counts (max_pages_per_host trap guard):
        # every outcome-bearing row was a fetch ATTEMPT; fold this wave's
        # per-host counts into the cumulative table. One tiny agg job over
        # the already-materialized scratch parquet, localCheckpoint-ed so
        # the table never re-derives prior waves (and so wave N+1's
        # politeness join broadcasts a concrete relation). Only paid when
        # the guard is on.
        if cfg.max_pages_per_host > 0:
            with self._phase("host-taken"):
                wave_taken = fetchpage.groupBy("host").agg(
                    F.count(F.lit(1)).alias("_taken")
                )
                merged = (
                    wave_taken
                    if self._host_taken is None
                    else self._host_taken.unionByName(wave_taken)
                    .groupBy("host")
                    .agg(F.sum("_taken").alias("_taken"))
                )
                self._host_taken = merged.localCheckpoint(eager=True)

        # lifetime per-template attempt counts (max_pages_per_template
        # trap guard): same fold as the host guard, keyed by the native
        # template expression over the attempted url_norms. The cumulative
        # table grows with DISTINCT templates (thousands at web scale, not
        # 10^10 URLs) — the collapse is the whole point of the guard.
        if cfg.max_pages_per_template > 0:
            from brink_spark.functions.templates import url_template

            with self._phase("template-taken"):
                wave_ttaken = fetchpage.groupBy(
                    url_template(F.col("url_norm")).alias("template")
                ).agg(F.count(F.lit(1)).alias("_ttaken"))
                tmerged = (
                    wave_ttaken
                    if self._template_taken is None
                    else self._template_taken.unionByName(wave_ttaken)
                    .groupBy("template")
                    .agg(F.sum("_ttaken").alias("_ttaken"))
                )
                self._template_taken = tmerged.localCheckpoint(eager=True)

        # response-cookie accumulation (brink.go:199-204): the reference
        # merges resp.Cookies() BEFORE the domain-allowed and content-length
        # gates, so every fetched response except a transport miss updates
        # the jar (not_allowed and too_large included). Merge order is
        # sorted(url_norm) — the wave model's deterministic stand-in for
        # goroutine arrival — so last-writer-wins per cookie name is
        # max_by(value, url_norm). The reduction runs in Spark (partial agg,
        # one row per distinct cookie name); the collect is bounded by the
        # number of distinct names, never by the number of pages.
        if "set_cookie" in fetchpage.columns:
            with self._phase("cookie-reduce"):
                got = (
                    fetchpage.filter(
                        (F.col("outcome") != "miss") & F.col("set_cookie").isNotNull()
                    )
                    .select(
                        F.substring_index("set_cookie", "=", 1).alias("_name"),
                        # value = everything after the FIRST '=' ('' when
                        # absent), matching str.partition('=')
                        F.coalesce(
                            F.element_at(F.split("set_cookie", "=", 2), 2), F.lit("")
                        ).alias("_value"),
                        "url_norm",
                    )
                    .groupBy("_name")
                    .agg(F.max_by("_value", "url_norm").alias("_value"))
                    .collect()
                )
            for r in got:
                self.cookie_jar[r["_name"]] = r["_value"]
            if got:
                self._check_auth_suppression(wave + 1)

        # --- flat projections ---------------------------------------------
        wave_lit = F.lit(wave).alias("wave")
        log_cols = lambda df, outcome_col, pid_col: df.select(  # noqa: E731
            wave_lit,
            "url_norm",
            wx.unit_prio_as_prio,
            "host",
            outcome_col.alias("outcome"),
            pid_col.alias("partition_id"),
        )
        # one projection of edges covers both non-fetch outcomes (the r1
        # triple-union paid an extra scan + union for the same rows)
        edge_log = log_cols(
            edges.filter(wx.edge_log_filter),
            wx.edge_log_outcome,
            F.lit(-1),
        )
        fetchlog_out = log_cols(
            fetchpage, F.col("outcome"), F.col("partition_id")
        ).unionByName(edge_log)
        ok = fetchpage.filter(wx.outcome_ok)
        # dup-edge handler rows take their status from the unit's fetched
        # row; in refetch-skip mode a not_modified fetch also anchors them
        okish = (
            fetchpage.filter(wx.okish_filter)
            if cfg.refetch_skip_unchanged
            else ok
        )

        # --- handler rows (A4) ----------------------------------------------
        results_first = ok.select(wave_lit, *wx.res_first_tail)
        results_others = (
            edges.filter(wx.fresh_gt1_filter)
            # rank>1 rows carry null fetch columns; take page_status from
            # the unit's rank-1 (fetched) row via the join
            .select("linked_from", "url_norm")
            .join(okish.select("url_norm", "page_status"), "url_norm", "inner")
            .select(wave_lit, *wx.res_others_tail)
        )
        results_seen = edges.filter(wx.seen_filter).select(
            wave_lit, *wx.res_seen_tail
        )
        results_out = results_first.unionByName(results_others).unionByName(results_seen)
        if cfg.refetch_skip_unchanged:
            # HTTP-304 handler shape: the callback is told the url was
            # re-checked (real fetch, current status) but gets no body —
            # exactly the cached-row contract, distinct row_kind
            results_notmod = fetchpage.filter(
                F.col("outcome") == "not_modified"
            ).select(
                F.lit(wave).alias("wave"),
                "linked_from",
                "url_norm",
                F.col("page_status").alias("status"),
                F.lit(False).alias("cached"),
                F.lit("not_modified").alias("row_kind"),
                F.lit(None).cast(SPANS_TYPE).alias("spans"),
            )
            results_out = results_out.unionByName(results_notmod)

        # --- traversal -> next frontier (D1/D2/C3/C4/C5/C6) ------------------
        trav = ok.filter(wx.trav_filter)
        links = (
            trav.select(*wx.link_explode_cols)
            .select(*wx.link_raw_cols)
            # C5 on the RAW href, then trim ASCII spaces (urls.go:96-101)
            .filter(wx.c5_filter)
            .withColumn("_href", wx.href_expr)
            .withColumn("_resolved", wx.resolved_expr)
            .filter(wx.c6_filter)  # C6
        )
        new_edges = links.select(*wx.new_edge_cols)
        # host_capped / template_capped units DROP (fetchlog records them);
        # deferring them would pin an infinite auto-generated site forever
        deferred_edges = edges.filter(wx.deferred_filter).select(
            "linked_from", "url", "priority", "depth"
        )
        m["n_miss_retry"] = 0
        if cfg.retry_misses > 0:
            # transport-miss retry: fold this wave's per-url miss counts,
            # then re-enqueue EVERY discovering edge of each missed unit
            # whose lifetime miss count is still within the retry budget.
            # The url is not in visited (only ok fetches are), so the
            # re-enqueued edges flow as ordinary fresh edges next wave.
            # The retry set is wave-miss-sized — it rides a broadcast.
            wave_miss = fetchpage.filter(F.col("outcome") == "miss").select(
                "url_norm"
            )
            wave_mn = wave_miss.groupBy("url_norm").agg(
                F.count(F.lit(1)).alias("_mn")
            )
            merged_mn = (
                wave_mn
                if self._miss_counts is None
                else self._miss_counts.unionByName(wave_mn)
                .groupBy("url_norm")
                .agg(F.sum("_mn").alias("_mn"))
            )
            self._miss_counts = merged_mn.localCheckpoint(eager=True)
            retry_set = (
                self._miss_counts.join(wave_miss, "url_norm")
                .filter(F.col("_mn") <= cfg.retry_misses)
                .select("url_norm")
            )
            m["n_miss_retry"] = retry_set.count()  # tiny; feature-gated
            retry_edges = (
                edges.filter(F.col("edge_kind") == "fresh")
                .join(F.broadcast(retry_set), "url_norm")
                .select("linked_from", "url", "priority", "depth")
            )
            deferred_edges = deferred_edges.unionByName(retry_edges)
        obs_next = Observation(f"w{wave}_frontier_next")
        # depth trap guard (max_depth > 0): outlinks beyond the link-hop
        # budget are counted then dropped BEFORE the frontier write. The
        # filter sits above the CollectMetrics node (Catalyst does not push
        # predicates through it), so n_depth_capped counts the dropped rows.
        frontier_next = (
            deferred_edges.withColumn("deferred", F.lit(True))
            .unionByName(new_edges.withColumn("deferred", F.lit(False)))
            .withColumn("_depth_capped", wx.depth_capped_expr)
            .observe(obs_next, *wx.next_aggs)
            .filter(~F.col("_depth_capped"))
            .drop("_depth_capped")
        )
        # --- commit all output tables concurrently ---------------------------
        # fetchlog / visited->bloom / results / frontier (+ the lineage
        # readback) are independent projections of the two materialized
        # scratch tables; submitting them from driver threads overlaps their
        # scheduling barriers — on a cluster these run as parallel jobs
        # sharing the executors (same total work, 1/4 the barrier wall).
        # All futures complete before the caller commits the manifest, so
        # crash-resume semantics are unchanged.
        def _w_fetchlog():
            with self._phase("fetchlog"):
                store.write(fetchlog_out, "fetchlog", wave)

        def _w_visited_bloom():
            with self._phase("visited-write"):
                if cfg.refetch_skip_unchanged:
                    # not_modified rows re-arm the seen set too, and the
                    # content hash rides along for the NEXT expiry cycle
                    vrows = fetchpage.filter(
                        F.col("outcome").isin("ok", "not_modified")
                    ).select(
                        "url_norm",
                        F.col("page_status").alias("status"),
                        F.lit(wave).alias("wave"),
                        "content_hash",
                    )
                else:
                    vrows = ok.select(
                        "url_norm",
                        F.col("page_status").alias("status"),
                        F.lit(wave).alias("wave"),
                    )
                store.write(vrows, "visited", wave)
            if use_bloom:
                with self._phase("bloom-update"):
                    store.write(
                        self.bloom.updated(
                            store.read(spark, "visited", wave), bloom_shards
                        ),
                        "bloom",
                        wave,
                    )

        def _w_results():
            with self._phase("results-write"):
                store.write(results_out, "results", wave)

        def _w_frontier():
            with self._phase("frontier-write"):
                store.write(frontier_next, "frontier", wave + 1)

        lineage: dict[int, int] = {}

        def _r_lineage():
            if cfg.collect_metrics:  # per-partition lineage diagnostic (A5)
                with self._phase("lineage-readback"):
                    for r in fetchpage.groupBy("partition_id").count().collect():
                        lineage[r["partition_id"]] = r["count"]

        # all five writes run concurrently on one pool; the gating pair
        # (frontier, visited+bloom) is what the NEXT wave's stage reads,
        # so defer mode returns as soon as those land
        pool = ThreadPoolExecutor(max_workers=5)
        try:
            gating = [pool.submit(f) for f in (_w_frontier, _w_visited_bloom)]
            deferred = [pool.submit(f) for f in (_w_fetchlog, _w_results, _r_lineage)]
            with self._phase("commit-writes-gating"):
                for fut in gating:
                    fut.result()  # re-raise the first failure
        except BaseException:
            # cancel queued deferred writes too — without cancel_futures
            # the fetchlog/results/lineage jobs keep running (and writing
            # partial tables) after the wave has already failed, on
            # non-daemon pool threads that delay process exit
            pool.shutdown(wait=False, cancel_futures=True)
            raise

        nx = obs_next.get
        self._pending_frontier_count = nx["n_next"]
        m["n_new_links"] = nx["n_new_links"]
        m["n_depth_capped"] = nx["n_depth_capped"]

        def finish():
            # remaining writes + metrics/lineage (A5); the caller commits
            # the manifest only after this returns
            try:
                with self._phase("commit-writes-deferred"):
                    for fut in deferred:
                        fut.result()
                store.write_metrics(
                    wave,
                    {**m, "lineage": {str(k): int(v) for k, v in lineage.items()}},
                )
            finally:
                pool.shutdown(wait=False)

        if defer:
            return m, finish
        finish()
        return m

"""Benchmark harness (driver-run per round; also usable standalone).

Times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the crawl engine's
fetch+dedup throughput over the deterministic 'small' synthetic site
(seeded politeness budget, wave-capped for a fixed workload).

Prints ONE JSON line:
  {"metric": ..., "value": <total seconds>, "unit": "sec",
   "queries": {...per-component seconds...}, "sf": ...,
   "crawl": {"urls_per_sec": ..., ...}}

Scaling-efficiency evidence (local[8] vs local[32]) lives in
tools/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "events_sessionize",
    "frontier_anti_join",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_neardup",
    "embed_neardup_lsh",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "span_explode",
    "doc_rolling_hash",
    "graph_pagerank",
    "tfidf_top_terms",
    "sample_stratified",
    "dedup_clusters",
    "repetition_stats",
    "decontaminate",
    "lm_score_bigram",
    "volume_shipping",
    "promo_effect",
    "profit_by_nation",
    "big_orders",
    "dedup_chunks",
    "vocab_stats",
    "events_asof_join",
    "events_range_join",
    # round-4 additions
    "dedup_clusters_converged",
    "graph_components_2phase",
    "dedup_jaccard_prefix",
    "dedup_incremental",
    "sales_opportunity",
    "supplier_parts_distinct",
    "top_parts_per_supplier",
    "revenue_rollup",
    "events_funnel",
    "brand_year_trend",
    "customer_running_total",
    "value_percentiles",
    # late-r4 additions (headline escalation is symmetric: every widening
    # is noted in BENCH/BASELINE.md so totals stay cross-round comparable)
    "graph_triangles",
    "basket_pairs",
    "events_zscore_outliers",
    "events_session_window",
    "sketch_distinct_users",
    "multimodal_frame_sample",
    # round-5 additions (queries/training.py corpus-curation suite)
    "containment_pairs",
    "dedup_keep_best",
    "chunk_first_occurrence",
    "split_assign",
    "source_balance",
    "inverted_index",
    "embed_kmeans_assign",
    # late-round-5 additions (same symmetric-escalation note)
    "url_template_traps",
    "lang_balanced_sample",
    "quality_source_prior",
    "dedup_cdc_chunks",
    "recrawl_priority",
    "pack_sequences",
    "graph_ppr",
    "tfidf_cosine_pairs",
    "basket_lift",
    "events_mad_outliers",
    "url_near_dedup",
]

CRAWL_WAVES = 10
CRAWL_SEEDS = 100


def run_crawl_bench(
    spark, cpus: int, pipeline_waves: bool = True
) -> tuple[float, dict]:
    from pyspark.sql import functions as F

    from brink_spark.plans.crawl import CrawlEngine
    from brink_spark.sources.sitegen import generate_site, seeds_to_spark

    fixture = generate_site("small", 42)
    store_dir = f"/dev/shm/brink_bench_store_{cpus}"
    shutil.rmtree(store_dir, ignore_errors=True)
    # lean mode: no synchronous per-wave diagnostics; counts post-hoc
    engine = CrawlEngine(
        spark,
        fixture.config.with_(
            collect_metrics=False, pipeline_waves=pipeline_waves
        ),
        store_dir,
    )
    # wide seed set so waves ramp to steady-state quickly (throughput bench,
    # not the oracle-parity configuration)
    seeds = [
        dict(url=p.url, priority=0)
        for p in fixture.pages[:CRAWL_SEEDS]
        if p.status == 200
    ]
    seeds_df = spark.createDataFrame(
        [(s["url"], s["priority"]) for s in seeds], "url string, priority int"
    )
    t0 = time.time()
    summary = engine.run(fixture=fixture, seeds=seeds_df, max_waves=CRAWL_WAVES)
    wall = time.time() - t0
    # post-hoc counts from the written store (lean mode keeps the timed
    # path free of synchronous diagnostics)
    waves = len(summary.wave_metrics)
    flog = spark.read.parquet(
        *[f"{store_dir}/fetchlog/wave={w}" for w in range(waves)]
    )
    counts = {
        r["outcome"]: r["count"] for r in flog.groupBy("outcome").count().collect()
    }
    n_fetched = sum(
        v for k, v in counts.items() if k not in ("robots_denied", "deferred")
    )
    n_cached = (
        spark.read.parquet(*[f"{store_dir}/results/wave={w}" for w in range(waves)])
        .filter(F.col("row_kind") == "seen")
        .count()
    )
    processed = n_fetched + n_cached
    stats = {
        "urls_per_sec": round(processed / wall, 2),
        "fetched": n_fetched,
        "ok": counts.get("ok", 0),
        "cached": n_cached,
        "waves": waves,
        "wall_sec": round(wall, 2),
    }
    shutil.rmtree(store_dir, ignore_errors=True)
    return wall, stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from brink_spark.queries import ALL_QUERIES
    from brink_spark.session import get_spark

    spark = get_spark(
        f"local[{cpus}]",
        app_name="brink_bench",
        shuffle_partitions=32,
        extra={"spark.ui.showConsoleProgress": "false"},
    )

    # min-of-REPEATS, ALTERNATED (all queries once, then again): a noisy-
    # neighbor burst on this host (documented ~30-80% single-shot noise,
    # BENCH/BASELINE.md) hits one round, not all repeats of one query; the
    # min is the engine's clean wall. Round 0 doubles as JVM/codegen warmup
    # and is discarded by the min unless it was genuinely fastest.
    REPEATS = 3
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    rows: dict[str, int] = {}
    for rep in range(REPEATS):
        for name in HEADLINE:
            fn = ALL_QUERIES[name][0]
            t0 = time.time()
            rows[name] = fn(spark, sf_dir).count()
            samples[name].append(time.time() - t0)
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        s = samples[name]
        timings[name] = round(min(s), 3)
        spread[name] = round(max(s) - min(s), 3)
        total += min(s)
        print(
            f"# {name}: {min(s):.2f}s (min of {REPEATS}, spread {max(s)-min(s):.2f}s, "
            f"{rows[name]} rows)",
            file=sys.stderr,
        )

    # crawl: sync and pipelined modes, INTERLEAVED best-of-2 (sync, pipe,
    # sync, pipe) so a noisy-neighbor burst hits both modes alike and the
    # pipelining delta stays attributable. Escalates a mode to best-of-3
    # when its two runs disagree by >30% (a burst can hit both runs of a
    # ~60 s job, so a big spread means neither wall is trustworthy).
    # crawl_small stays the sync wall (comparable with earlier rounds);
    # crawl_pipelined records the r3 wave-overlap win as a first-class
    # bench number. Only the PIPELINED wall (the engine's default mode)
    # counts toward the headline total.
    runs: dict[bool, list[tuple[float, dict]]] = {False: [], True: []}
    for _ in range(2):
        for mode in (False, True):
            runs[mode].append(run_crawl_bench(spark, cpus, pipeline_waves=mode))
    # escalation is SYMMETRIC: if either mode's runs disagree by >30%, both
    # modes get a third (still interleaved) sample — otherwise the noisy
    # mode alone gets an extra draw at a quiet window and the sync-vs-
    # pipelined comparison is biased by sample count.
    if any(
        (max(ws) - min(ws)) / min(ws) > 0.30
        for ws in ([w for w, _ in rs] for rs in runs.values())
    ):
        for mode in (False, True):
            runs[mode].append(run_crawl_bench(spark, cpus, pipeline_waves=mode))
    for mode, key in ((False, "crawl_small"), (True, "crawl_pipelined")):
        walls = [w for w, _ in runs[mode]]
        wall, stats = min(runs[mode], key=lambda r: r[0])
        timings[key] = round(wall, 3)
        spread[key] = round(max(walls) - min(walls), 3)
        if mode:  # pipelined (default engine mode) is the headline number
            total += wall
            crawl_stats = stats
        print(
            f"# {key} (best of {len(runs[mode])}, spread {spread[key]}s): {stats}",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_crawl_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl": crawl_stats,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

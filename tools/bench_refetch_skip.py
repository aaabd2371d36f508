"""Measure the refetch_skip_unchanged (HTTP-304-style) parse-skip win.

Protocol: two stores crawl the same single wave of N seed pages (flag on
in A — visited rows carry content hashes — flag off in B), then EVERY
visited url is expired in both and the same seeds are resumed. Store B's
recrawl wave re-fetches and RE-PARSES all N bodies; store A's classifies
them not_modified before the parse column, so the Arrow span-parse UDF
never runs. The wall delta of the resume wave is the parse cost the fast
path removes — the dominant recrawl cost at corpus scale, where a
periodic refresh re-touches billions of mostly-unchanged pages.

Usage: python tools/bench_refetch_skip.py [n_seeds] [out_json]
Round record: BENCH/refetch_skip_r4.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SEEDS_DEFAULT = 20_000


def run_cycle(spark, fixture, seeds_rows, store_dir, skip_unchanged):
    from pyspark.sql import functions as F

    from brink_spark.plans.crawl import CrawlEngine

    cfg = fixture.config.with_(
        refetch_skip_unchanged=skip_unchanged,
        collect_metrics=False,
        rank_priority_every=0,
    )
    shutil.rmtree(store_dir, ignore_errors=True)
    seeds = spark.createDataFrame(seeds_rows, "url string, priority int")
    engine = CrawlEngine(spark, cfg, store_dir)
    engine.run(fixture=fixture, seeds=seeds, max_waves=1)

    man = engine.store.read_manifest()
    visited = engine.store.read_visited(spark, man).select("url_norm")
    n_visited = visited.count()
    engine.expire_visited(visited)

    # isolate the REFETCH: wave 0's discovered outlinks would otherwise
    # flood the resume wave with fresh fetches in BOTH modes and dilute
    # the parse-skip signal — rewrite the resume frontier to exactly the
    # expired seed set
    refetch_frontier = spark.createDataFrame(
        seeds_rows, "url string, priority int"
    ).select(
        F.lit("start").alias("linked_from"),
        "url",
        F.col("priority").cast("int"),
        F.lit(0).alias("depth"),
    )
    engine.store.rewrite(refetch_frontier, "frontier", man.last_wave + 1)

    # the run() wall is dominated by fixture setup (redirect-collapse of
    # the 200k-page table); the comparison that matters is the resume
    # wave's fused stage — the one materialization containing the parse.
    # BRINK_TIMING phase lines go to stdout; capture and extract.
    import contextlib
    import io
    import re

    eng2 = CrawlEngine(spark, cfg, store_dir)
    buf = io.StringIO()
    t0 = time.time()
    with contextlib.redirect_stdout(buf):
        eng2.run(fixture=fixture, resume=True, max_waves=man.last_wave + 2)
    wall = time.time() - t0
    fused = [float(x) for x in re.findall(r"\[stage-fused\] ([0-9.]+)s", buf.getvalue())]
    stage_fused = fused[-1] if fused else None

    man2 = eng2.store.read_manifest()
    log = eng2.store.read(spark, "fetchlog", man2.last_wave)
    outcomes = {
        r["outcome"]: r["count"]
        for r in log.groupBy("outcome").count().collect()
    }
    return wall, stage_fused, n_visited, outcomes


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else N_SEEDS_DEFAULT
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from brink_spark.session import get_spark
    from brink_spark.sources.sitegen import generate_site

    # 32g heap: four engine cycles each localCheckpoint the 200k-page
    # bench fixture's redirect-collapsed bodies; 8g OOMs
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    spark = get_spark(
        "local[32]",
        app_name="brink_refetch_skip",
        shuffle_partitions=32,
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    fixture = generate_site("bench", 42)
    seeds_rows = [
        (p.url, 0) for p in fixture.pages if p.status == 200
    ][:n_seeds]

    os.environ["BRINK_TIMING"] = "1"
    work = "/dev/shm/brink_refetch_skip"
    # interleave off,on,off,on so host noise hits both modes alike
    walls = {False: [], True: []}
    stages = {False: [], True: []}
    meta = {}
    for _ in range(2):
        for mode in (False, True):
            w, sf, n_vis, outcomes = run_cycle(
                spark, fixture, seeds_rows, f"{work}_{int(mode)}", mode
            )
            walls[mode].append(round(w, 2))
            stages[mode].append(round(sf, 2) if sf is not None else None)
            meta[mode] = (n_vis, outcomes)
            print(
                f"# skip={mode}: resume wall {w:.2f}s fused {sf}s {outcomes}",
                file=sys.stderr,
            )

    n_vis_off, out_off = meta[False]
    n_vis_on, out_on = meta[True]
    assert out_on.get("not_modified", 0) > 0, "fast path never fired"
    assert out_off.get("not_modified", 0) == 0
    best_off = min(s for s in stages[False] if s is not None)
    best_on = min(s for s in stages[True] if s is not None)
    verdict = {
        "n_seeds": len(seeds_rows),
        "n_visited_first_wave": n_vis_off,
        "resume_stage_fused_off_sec": best_off,
        "resume_stage_fused_on_sec": best_on,
        "stage_fused_off": stages[False],
        "stage_fused_on": stages[True],
        "resume_walls_off": walls[False],
        "resume_walls_on": walls[True],
        "resume_outcomes_off": out_off,
        "resume_outcomes_on": out_on,
        "stage_speedup": round(best_off / best_on, 2),
    }
    print(json.dumps(verdict))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(verdict, f, indent=1)
    for mode in (0, 1):
        shutil.rmtree(f"{work}_{mode}", ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

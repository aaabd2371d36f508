"""Round-6 optimization measurement harness (bench.py is FROZEN for the
driver; this file is the builder's iteration loop — guide §1.4).

Times each named query with the noop sink (computes every column, no
result-side cost, visible in the SQL tab) on the same session config as
bench.py. One JSON line per run to stderr-free stdout so runs can be
diffed.

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--queries a,b,c] [--crawl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--queries", default=None, help="comma list; default = bench.py HEADLINE")
    ap.add_argument("--crawl", action="store_true", help="also time the crawl bench")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    from bench import HEADLINE, run_crawl_bench
    from brink_spark.queries import ALL_QUERIES
    from brink_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        f"local[{cpus}]",
        app_name="brink_bench_extra",
        shuffle_partitions=32,
        extra={"spark.ui.showConsoleProgress": "false"},
    )

    names = args.queries.split(",") if args.queries else list(HEADLINE)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.repeats):
        for name in names:
            fn = ALL_QUERIES[name][0]
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "tag": args.tag,
        "sf": args.sf,
        "queries": {n: min(s) for n, s in samples.items()},
        "samples": samples,
        "total_min": round(sum(min(s) for s in samples.values()), 3),
    }
    if args.crawl:
        wall, stats = run_crawl_bench(spark, cpus, pipeline_waves=True)
        out["crawl_pipelined"] = round(wall, 3)
        out["crawl_stats"] = stats
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

"""Smoke test for bench.py — the driver's per-round BENCH artifact producer.

bench.py is the one entry point no other test exercises: if an import, a
HEADLINE name, the crawl-bench plumbing, or the JSON contract breaks, the
round's BENCH_r{N}.json silently fails. This runs the REAL main() with the
headline shrunk to two cheap queries, one repeat, and a 2-wave crawl at
sf0.001, then validates the emitted JSON line's full contract.
"""

import io
import json
import sys


def test_bench_main_contract(monkeypatch, spark):
    import bench

    monkeypatch.setattr(bench, "HEADLINE", ["pricing_summary", "top_orders"])
    monkeypatch.setattr(bench, "CRAWL_WAVES", 2)
    monkeypatch.setattr(bench, "CRAWL_SEEDS", 20)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "8")

    # main() ends with spark.stop(); get_spark's getOrCreate hands it the
    # session-scoped test fixture, so without this every Spark test after
    # this one would fail on a dead session.
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    # main() hardcodes 3 repeats locally — cheap for the two toy queries.
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    sys.stdout = sys.__stdout__

    line = out.getvalue().strip().splitlines()[-1]
    d = json.loads(line)

    assert d["metric"] == "headline_queries_plus_crawl_wall_seconds"
    assert d["unit"] == "sec"
    assert float(d["sf"]) == 0.001
    assert d["value"] > 0
    for name in ("pricing_summary", "top_orders", "crawl_small", "crawl_pipelined"):
        assert name in d["queries"], name
        assert d["queries"][name] >= 0
        assert name in d["spread"]
    crawl = d["crawl"]
    assert crawl["waves"] == 2
    assert crawl["fetched"] > 0 and crawl["urls_per_sec"] > 0

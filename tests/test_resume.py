"""Checkpoint-resume (north_rule): kill after wave k, restart, identical
final state — including recovery from corrupt partial wave dirs."""

import os

from brink_spark.oracle import crawl_oracle
from brink_spark.plans.compare import compare_engine_oracle
from brink_spark.plans.crawl import CrawlEngine

WAVES = 6


def test_resume_after_interrupt_matches_oracle(spark, tiny_fixture, tmp_path):
    store_dir = str(tmp_path / "store")
    oracle = crawl_oracle(tiny_fixture, tiny_fixture.config.with_(max_waves=WAVES))

    eng1 = CrawlEngine(spark, tiny_fixture.config, store_dir)
    s1 = eng1.run(fixture=tiny_fixture, max_waves=3)
    assert len(s1.wave_metrics) == 3

    # simulate a crash that left partial files for an uncommitted wave
    os.makedirs(f"{store_dir}/results/wave=3", exist_ok=True)
    with open(f"{store_dir}/results/wave=3/part-garbage.parquet", "w") as fh:
        fh.write("CORRUPT")

    eng2 = CrawlEngine(spark, tiny_fixture.config, store_dir)
    s2 = eng2.run(fixture=tiny_fixture, resume=True, max_waves=WAVES)
    assert len(s2.wave_metrics) == WAVES - 3

    cmp = compare_engine_oracle(spark, eng2, oracle)
    assert cmp.all_match, cmp.detail

    # resuming a finished store is a no-op
    eng3 = CrawlEngine(spark, tiny_fixture.config, store_dir)
    s3 = eng3.run(fixture=tiny_fixture, resume=True, max_waves=WAVES)
    assert s3.total_fetched == 0
    assert compare_engine_oracle(spark, eng3, oracle).all_match

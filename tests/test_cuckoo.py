"""Cuckoo-filter seen set (operators/cuckoo.py): property tests mirroring
the Bloom suite, the deletion contract Bloom cannot offer, and the adaptive
switch selecting either filter with identical crawl results."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from brink_spark.operators.cuckoo import CuckooSeenSet
from brink_spark.operators.seen import split_seen

N_SHARDS = 4
N_BUCKETS = 1 << 10  # 4096 slots/shard


def _urls(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(f"https://{prefix}.example/p"), F.col("id")).alias("url_norm")
    )


@pytest.fixture(scope="module")
def filt():
    return CuckooSeenSet(N_SHARDS, N_BUCKETS)


def test_no_false_negatives(spark, filt):
    ins = _urls(spark, "a", 800)
    shards = filt.updated(ins, filt.empty(spark))
    verdicts = filt.probe(ins, shards)
    assert verdicts.filter(~F.col("maybe_seen")).count() == 0
    assert verdicts.count() == 800


def test_false_positive_rate_is_low(spark, filt):
    shards = filt.updated(_urls(spark, "a", 800), filt.empty(spark))
    other = _urls(spark, "zzz", 2000)
    fp = filt.probe(other, shards).filter(F.col("maybe_seen")).count()
    # 16-bit fingerprints, ~5% load: FP rate well under 1%
    assert fp / 2000 < 0.01, fp


def test_incremental_build_equals_batch_build(spark, filt):
    a, b = _urls(spark, "a", 300), _urls(spark, "b", 300)
    inc = filt.updated(b, filt.updated(a, filt.empty(spark)))
    both = filt.updated(a.unionByName(b), filt.empty(spark))
    probe_on = a.unionByName(b).unionByName(_urls(spark, "q", 500))
    vi = {r["url_norm"]: r["maybe_seen"] for r in filt.probe(probe_on, inc).collect()}
    vb = {r["url_norm"]: r["maybe_seen"] for r in filt.probe(probe_on, both).collect()}
    assert vi == vb


def test_deterministic_tables(spark, filt):
    ins = _urls(spark, "det", 500)
    t1 = {r["shard"]: r["table"] for r in filt.updated(ins, filt.empty(spark)).collect()}
    t2 = {r["shard"]: r["table"] for r in filt.updated(ins, filt.empty(spark)).collect()}
    assert t1 == t2


def test_delete_removes_without_disturbing_others(spark, filt):
    """The cuckoo advantage: exact deletion. After deleting B, A still has
    NO false negatives, and B's own entries are gone (any residual
    positives on B are ordinary fp-collisions with A, bounded like the FP
    rate)."""
    a, b = _urls(spark, "keep", 600), _urls(spark, "expire", 600)
    shards = filt.updated(a.unionByName(b), filt.empty(spark))
    shards = filt.deleted(b, shards)
    assert filt.probe(a, shards).filter(~F.col("maybe_seen")).count() == 0
    residual = filt.probe(b, shards).filter(F.col("maybe_seen")).count()
    assert residual / 600 < 0.01, residual


def test_overflowed_shard_stays_safe(spark):
    """Force overflow (tiny table, many keys): the shard flips to
    True-for-all — degenerate, never a false negative."""
    tiny = CuckooSeenSet(1, 4)  # 16 slots total
    ins = _urls(spark, "ov", 200)
    shards = tiny.updated(ins, tiny.empty(spark))
    assert shards.filter(F.col("overflowed")).count() == 1
    assert tiny.probe(ins, shards).filter(~F.col("maybe_seen")).count() == 0


def test_split_seen_cuckoo_equals_exact(spark, filt):
    """Same superset contract the Bloom identity test pins: the prefilter
    never changes split_seen's output."""
    edges = _urls(spark, "e", 400).withColumn("priority", F.lit(0))
    visited = (
        _urls(spark, "e", 150)
        .withColumn("status", F.lit(200))
    )
    shards = filt.updated(visited, filt.empty(spark))
    f1, c1 = split_seen(edges, visited, filt, shards)
    f2, c2 = split_seen(edges, visited, None, None)
    assert {r["url_norm"] for r in f1.collect()} == {r["url_norm"] for r in f2.collect()}
    assert {r["url_norm"] for r in c1.collect()} == {r["url_norm"] for r in c2.collect()}


def test_engine_with_cuckoo_matches_oracle(spark, tiny_fixture, tmp_path):
    """The adaptive switch selects the cuckoo filter end-to-end: identical
    crawl contracts vs the serial oracle."""
    from brink_spark.oracle import crawl_oracle
    from brink_spark.plans.compare import compare_engine_oracle
    from brink_spark.plans.crawl import CrawlEngine

    cfg = tiny_fixture.config.with_(
        max_content_length=100_000,
        max_waves=4,
        seen_filter="cuckoo",
        bloom_min_visited=5,  # adaptive activation mid-crawl, cuckoo-backed
    )
    engine = CrawlEngine(spark, cfg, str(tmp_path / "store"))
    engine.run(fixture=tiny_fixture, max_waves=4)
    oracle = crawl_oracle(tiny_fixture, cfg)
    cmp = compare_engine_oracle(spark, engine, oracle)
    assert cmp.all_match, cmp.detail

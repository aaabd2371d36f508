"""Operator-level tests: Bloom seen-set properties, politeness top-k
equivalence, span parser UDF, robots longest-prefix logic."""

from pyspark.sql import Window, functions as F

from brink_spark.operators.politeness import apply_politeness
from brink_spark.operators.seen import BloomSeenSet, split_seen


def _urls_df(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(f"https://{prefix}.example/p"), F.col("id")).alias("url_norm")
    )


def test_bloom_no_false_negatives(spark):
    """Property from SURVEY.md §7 M3: Bloom must never cause a false drop —
    every inserted url_norm probes maybe_seen=True."""
    bloom = BloomSeenSet(n_shards=8, n_bits=1 << 16, n_hashes=5)
    inserted = _urls_df(spark, "in", 2000)
    shards = bloom.updated(inserted, bloom.empty(spark))
    shards = shards.cache()
    assert shards.count() <= 8
    probed = bloom.probe(inserted, shards)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_false_positive_rate_sane(spark):
    bloom = BloomSeenSet(n_shards=8, n_bits=1 << 20, n_hashes=5)
    shards = bloom.updated(_urls_df(spark, "in", 5000), bloom.empty(spark)).cache()
    other = _urls_df(spark, "out", 5000)
    fp = bloom.probe(other, shards).filter(F.col("maybe_seen")).count()
    # 5000 keys in 2^20 bits/8 shards ≈ 0.3 bits/key density → fp ≈ 0
    assert fp < 50


def test_split_seen_bloom_equals_exact(spark):
    """The Bloom prefilter must not change the fresh/cached split."""
    edges = spark.range(300).select(
        F.concat(F.lit("https://s.example/p"), F.col("id")).alias("url_norm"),
        F.lit("parent").alias("linked_from"),
        F.concat(F.lit("https://s.example/p"), F.col("id")).alias("url"),
        F.lit(0).alias("priority"),
    )
    visited = spark.range(100, 200).select(
        F.concat(F.lit("https://s.example/p"), F.col("id")).alias("url_norm"),
        F.lit(200).alias("status"),
        F.lit(0).alias("wave"),
    )
    bloom = BloomSeenSet(4, 1 << 16, 5)
    shards = bloom.updated(visited, bloom.empty(spark)).cache()

    fresh_e, cached_e = split_seen(edges, visited)
    fresh_b, cached_b = split_seen(edges, visited, bloom, shards)
    assert sorted(r["url_norm"] for r in fresh_e.collect()) == sorted(
        r["url_norm"] for r in fresh_b.collect()
    )
    assert sorted(r["url_norm"] for r in cached_e.collect()) == sorted(
        r["url_norm"] for r in cached_b.collect()
    )


def test_politeness_two_phase_equals_single_window(spark):
    """The salted two-phase top-k must equal the naive single-window plan,
    including on a pathologically hot host."""
    rows = []
    for i in range(500):
        rows.append(("hot.example", f"https://hot.example/p{i:04d}", i % 7))
    for i in range(50):
        rows.append((f"cold{i}.example", f"https://cold{i}.example/x", 0))
    units = spark.createDataFrame(
        rows, "host string, url_norm string, unit_priority int"
    )
    budgets = spark.createDataFrame(
        [("hot.example", 10)], "host string, _budget int"
    )
    got = apply_politeness(units, budgets, default_budget=3, num_salts=8)
    w = Window.partitionBy("host").orderBy("unit_priority", "url_norm")
    want = (
        units.join(budgets, "host", "left")
        .withColumn("_b", F.coalesce("_budget", F.lit(3)))
        .withColumn("_eligible", F.row_number().over(w) <= F.col("_b"))
    )
    got_set = {(r["url_norm"], r["_eligible"]) for r in got.collect()}
    want_set = {(r["url_norm"], r["_eligible"]) for r in want.collect()}
    assert got_set == want_set
    # hot host admitted exactly its budget
    n_hot = sum(1 for u, e in got_set if e and "hot.example" in u)
    assert n_hot == 10


def test_mark_seen_single_table_equals_split(spark):
    """mark_seen is the wave loop's single-table form of split_seen: the
    status column must partition the input exactly into the split's
    (fresh, cached) halves, with and without the Bloom prefilter, and
    must carry the stored status for every cached row."""
    from brink_spark.operators.seen import mark_seen

    edges = spark.range(300).select(
        F.concat(F.lit("https://m.example/p"), F.col("id")).alias("url_norm"),
        F.lit("parent").alias("linked_from"),
    )
    visited = spark.range(100, 200).select(
        F.concat(F.lit("https://m.example/p"), F.col("id")).alias("url_norm"),
        (F.lit(200) + (F.col("id") % 2)).cast("int").alias("status"),
        F.lit(0).alias("wave"),
    )
    bloom = BloomSeenSet(4, 1 << 16, 5)
    shards = bloom.updated(visited, bloom.empty(spark)).cache()
    want_status = {
        r["url_norm"]: r["status"] for r in visited.collect()
    }

    for b, s in ((None, None), (bloom, shards)):
        marked = mark_seen(edges, visited, b, s).collect()
        # every input edge appears exactly once
        assert sorted(r["url_norm"] for r in marked) == sorted(
            r["url_norm"] for r in edges.collect()
        )
        fresh = {r["url_norm"] for r in marked if r["status"] is None}
        cached = {r["url_norm"]: r["status"] for r in marked if r["status"] is not None}
        assert cached == want_status
        assert fresh.isdisjoint(cached)
        f_df, c_df = split_seen(edges, visited, b, s)
        assert fresh == {r["url_norm"] for r in f_df.collect()}
        assert cached == {
            r["url_norm"]: r["status"] for r in c_df.collect()
        }

    # no visited set at all: everything fresh, status column present+null
    marked0 = mark_seen(edges, None).collect()
    assert all(r["status"] is None for r in marked0)
    assert len(marked0) == 300

"""Crawl -> corpus -> pipeline integration: the crawl store converts to the
documents shape and the training-data operators run on it unchanged."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_dir(spark, tiny_run, tmp_path_factory):
    from brink_spark.sources.corpus import corpus_to_dir

    engine, summary = tiny_run
    out = str(tmp_path_factory.mktemp("corpus"))
    n = corpus_to_dir(spark, engine.store.root, len(summary.wave_metrics), out)
    assert n > 0
    return out, n


def test_corpus_one_row_per_fetched_doc(spark, corpus_dir, tiny_oracle):
    out, n = corpus_dir
    docs = spark.read.parquet(f"{out}/documents.parquet")
    # one row per oracle-visited (fetched, ok) document
    assert n == len(tiny_oracle.visited)
    assert docs.select("doc_id").distinct().count() == n
    row = docs.filter(F.col("n_chars") > 0).first()
    assert row is not None and row["lang"] in ("en-like", "other")


def test_pipeline_operators_run_on_crawl_corpus(spark, corpus_dir):
    """dedup / quality / token / fingerprint operators consume the crawl
    corpus directly (same {dir}/documents.parquet contract)."""
    from brink_spark.queries.pipeline import (
        q_dedup_exact,
        q_doc_fingerprint,
        q_text_quality,
        q_token_stats_by_lang,
    )

    out, n = corpus_dir
    exact = q_dedup_exact(spark, out)
    assert exact.agg(F.sum("n_copies")).first()[0] == n  # partition of all docs
    quality = q_text_quality(spark, out)
    assert quality.count() == n
    stats = q_token_stats_by_lang(spark, out).collect()
    assert sum(r["n_docs"] for r in stats) == n
    fp = q_doc_fingerprint(spark, out)
    assert fp.agg(F.sum("n_docs")).first()[0] == n


def test_linkgraph_from_store_ranks(spark, tiny_run):
    """Link-graph edges from the crawl store feed a PageRank-style ranking
    (frontier prioritization by link authority)."""
    from brink_spark.sources.corpus import linkgraph_from_store

    engine, summary = tiny_run
    edges = linkgraph_from_store(spark, engine.store.root, len(summary.wave_metrics))
    n_edges = edges.count()
    assert n_edges > 0
    assert edges.filter(F.col("src") == "start").count() == 0
    # 3 integer-PageRank iterations over the real crawl graph: every node
    # ranked, totals deterministic
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    ranks = nodes.withColumn("rank", F.lit(1_000_000).cast("bigint"))
    for _ in range(3):
        contrib = (
            edges.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank div d").alias("c"))
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("insum"))
        ranks = nodes.join(
            insum.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (F.lit(150_000) + F.expr("(85 * coalesce(insum, 0L)) div 100"))
            .cast("bigint")
            .alias("rank"),
        )
    rows = ranks.collect()
    assert len(rows) == nodes.count()
    assert all(r["rank"] >= 150_000 for r in rows)
    assert max(r["rank"] for r in rows) > 150_000  # somebody has in-links

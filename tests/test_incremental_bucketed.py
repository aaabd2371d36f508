"""Incremental-ingest dedup over a pre-written bucketed signature store.

q_dedup_incremental documents its scale path as "corpus band signatures
live precomputed, bucketed by (band, mh); the nightly probe touches only
matching buckets". This test runs that path for real:

- write_signature_store materializes the corpus side ONCE (bucketed,
  sorted, via sources/corpus.write_bucketed);
- probe_incremental matches the new batch against the store with ZERO
  shuffle on the corpus side (plan-asserted: no `Exchange hashpartitioning`
  above the store scan — only BroadcastExchange of batch-derived frames);
- the resulting (batch_doc, n_corpus_dups) frame is row-identical to the
  self-contained q_dedup_incremental, which recomputes everything.
"""

import os

import pytest
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _shuffles_above(df, marker: str) -> list[str]:
    """Shuffle-Exchange nodes whose subtree scans ``marker`` — i.e. plan
    evidence that the marked table is re-shuffled after its (bucketed)
    scan. Broadcast exchanges don't count: broadcasting a batch-sized
    frame is the point of the design."""
    offenders: list[str] = []

    def walk(node):
        name = node.nodeName()
        if "Exchange" in name and "Broadcast" not in name:
            if marker in node.toString():
                offenders.append(node.simpleString(1000))
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return offenders


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    from brink_spark.queries.pipeline import write_signature_store

    path = str(tmp_path_factory.mktemp("sigstore") / "corpus_sig")
    write_signature_store(spark, SF, "inc_corpus_sig", path, buckets=8)
    yield "inc_corpus_sig"
    spark.sql("DROP TABLE IF EXISTS inc_corpus_sig")


def test_probe_matches_self_contained_query(spark, store):
    from brink_spark.queries.pipeline import (
        probe_incremental,
        q_dedup_incremental,
    )

    expected = {
        (r["batch_doc"], r["n_corpus_dups"])
        for r in q_dedup_incremental(spark, SF).collect()
    }
    got = {
        (r["batch_doc"], r["n_corpus_dups"])
        for r in probe_incremental(spark, SF, store).collect()
    }
    assert expected, "fixture produced no crossing near-dup pairs"
    assert got == expected


def test_corpus_side_never_shuffles(spark, store):
    """The store scan feeds the match via broadcast joins only: every
    shuffle exchange in the probe plan sits above batch-sized frames
    (signature aggregation of the batch, final per-doc counts) — the
    corpus store is scanned exactly once with no Exchange above it."""
    from brink_spark.queries.pipeline import _lsh_band_sig, _shingles_of, _is_new_batch

    batch_docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        _is_new_batch(F.col("doc_id"))
    )
    batch_sig = _lsh_band_sig(_shingles_of(batch_docs))
    keys = batch_sig.select("band", "mh").distinct()
    hits = spark.table(store).join(F.broadcast(keys), ["band", "mh"], "inner")
    plan = _plan(hits)
    assert "BroadcastHashJoin" in plan
    assert _shuffles_above(hits, store) == []

    # bucket-local aggregation: counting bucket membership on the store
    # side reuses the bucket partitioning — still no shuffle of the store
    counts = hits.groupBy("band", "mh").agg(F.count(F.lit(1)).alias("n"))
    assert _shuffles_above(counts, store) == []

    # the full probe, end to end: shuffles above the store's lineage are
    # allowed only past the pair projection (dedup of match pairs, final
    # per-batch-doc count — both ingest-sized); the store itself is never
    # re-partitioned on its bucket key (band, mh)
    from brink_spark.queries.pipeline import probe_incremental

    probe = probe_incremental(spark, SF, store)
    for line in _shuffles_above(probe, store):
        assert "hashpartitioning(band" not in line, line


def test_store_is_batch_free_and_bucketed(spark, store):
    from brink_spark.queries.pipeline import _is_new_batch

    sig = spark.table(store)
    assert sig.filter(_is_new_batch(F.col("doc_id"))).count() == 0
    desc = spark.sql(f"DESCRIBE TABLE EXTENDED {store}").collect()
    info = {r["col_name"]: r["data_type"] for r in desc}
    assert info.get("Num Buckets") == "8"
    assert "band" in info.get("Bucket Columns", "")
    assert "mh" in info.get("Bucket Columns", "")

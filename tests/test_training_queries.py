"""Spark-internal invariants for the round-5 corpus-curation operators
(brink_spark/queries/training.py). Cross-engine value equality is the
local gate's job (tools/check_queries.py); these tests pin the properties
the oracle can't see — two-phase == single-window equality, planted-edge
semantics, partition/determinism laws."""

import pytest
from pyspark.sql import Window, functions as F

from brink_spark.queries.training import (
    IDX_POSTINGS,
    KMEANS_K,
    SOURCE_QUOTA,
    q_chunk_first_occurrence,
    q_containment_pairs,
    q_dedup_keep_best,
    q_embed_kmeans_assign,
    q_inverted_index,
    q_source_balance,
    q_split_assign,
)

SF = "/root/testdata/sf0.001"


def _docs_count(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").count()


# --------------------------------------------------------------------------
# two-phase top-k == single-window form


def test_source_balance_two_phase_equals_single_window(spark):
    got = {
        (r["source"], r["doc_id"], r["ord"])
        for r in q_source_balance(spark, SF).collect()
    }
    d = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "doc_id", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    want = {
        (r["source"], r["doc_id"], r["ord"])
        for r in d.withColumn("ord", F.row_number().over(w).cast("bigint"))
        .filter(F.col("ord") <= SOURCE_QUOTA)
        .collect()
    }
    assert got == want and got


def test_source_balance_respects_quota(spark):
    per_source = (
        q_source_balance(spark, SF).groupBy("source").count().collect()
    )
    assert per_source
    assert all(r["count"] <= SOURCE_QUOTA for r in per_source)


def test_inverted_index_two_phase_equals_naive(spark):
    got = {tuple(r) for r in q_inverted_index(spark, SF).collect()}
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = d.count()
    pairs = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("term")
    )
    df = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") * 10 <= n * 8))
    )
    naive = (
        pairs.join(df, "term")
        .groupBy("term", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.sort_array(F.collect_list("doc_id")), 1, IDX_POSTINGS
                    ),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
    )
    want = {tuple(r) for r in naive.collect()}
    assert got == want and got


def test_inverted_index_postings_capped(spark):
    rows = q_inverted_index(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= len(r["postings"].split(",")) <= IDX_POSTINGS


# --------------------------------------------------------------------------
# containment: planted quote detection


def test_containment_catches_planted_quote(spark):
    # doc 1 is a verbatim block quoted inside the much larger doc 2:
    # containment(1→2) = 1.0 while symmetric Jaccard is far below any
    # dedup threshold — the case this operator exists for
    quote = " ".join(f"q{i}" for i in range(20))
    filler = " ".join(f"f{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler), (3, filler + " tail words")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_plant_docs")
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="contain_")
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    rows = {
        (r["src_doc"], r["dst_doc"]): r["containment"]
        for r in q_containment_pairs(spark, tmp).collect()
    }
    assert rows.get((1, 2)) == pytest.approx(1.0)
    assert (2, 1) not in rows  # the big doc is NOT contained in the quote


# --------------------------------------------------------------------------
# split assignment: partition + determinism


def test_split_assign_partitions_the_corpus(spark):
    rows = q_split_assign(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == _docs_count(spark)
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    n_train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    # 80.1% expected; loose band (small corpus)
    assert 0.6 <= n_train / _docs_count(spark) <= 0.95


def test_split_assign_deterministic(spark):
    a = sorted(tuple(r) for r in q_split_assign(spark, SF).collect())
    b = sorted(tuple(r) for r in q_split_assign(spark, SF).collect())
    assert a == b


# --------------------------------------------------------------------------
# keep-best: argmax law within each cluster


def test_keep_best_member_is_cluster_max(spark):
    best = q_dedup_keep_best(spark, SF).collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    for r in best:
        assert docs[r["best_doc_id"]] == r["best_n_chars"]
        assert r["cluster_size"] >= 2 or r["cluster_lbl"] == r["best_doc_id"]


# --------------------------------------------------------------------------
# chunk first-occurrence: conservation laws


def test_chunk_first_occurrence_conservation(spark):
    rows = q_chunk_first_occurrence(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_chunks"]
        assert r["kept_words"] == r["n_kept"] * 4
    # every distinct chunk survives somewhere: total kept instances >=
    # number of distinct chunks owned (owner keeps all its instances)
    assert sum(r["n_kept"] for r in rows) > 0


# --------------------------------------------------------------------------
# k-means assignment: total assignment, centroid self-assignment


def test_kmeans_assigns_every_vector_once(spark):
    rows = q_embed_kmeans_assign(spark, SF).collect()
    n_vecs = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r["n_assigned"] for r in rows) == n_vecs
    assert len(rows) <= KMEANS_K
    # each seed vector is distance-0 from its own centroid -> assigned to it
    by_cid = {r["centroid_id"]: r for r in rows}
    for cid in by_cid:
        assert by_cid[cid]["min_vec_id"] <= cid


# --------------------------------------------------------------------------
# sequence packing: partition invariance + token conservation


def test_pack_sequences_invariant_to_partition_count(spark):
    """The two-phase prefix sum must produce identical windows no matter
    how the range partitioner splits the corpus — the broadcast offsets
    correct any boundary placement."""
    from brink_spark.queries.training import q_pack_sequences

    a = sorted(map(tuple, q_pack_sequences(spark, SF, parts=2).collect()))
    b = sorted(map(tuple, q_pack_sequences(spark, SF, parts=16).collect()))
    assert a == b


def test_pack_sequences_conservation_laws(spark):
    """Every window except the last holds exactly PACK_WINDOW tokens,
    window ids are contiguous from 0, the per-window token counts sum to
    the corpus total (each token packed exactly once), and boundary
    continuations never exceed the window's doc count."""
    from brink_spark.queries.training import PACK_WINDOW, q_pack_sequences

    rows = sorted(q_pack_sequences(spark, SF).collect(), key=lambda r: r["window_id"])
    assert [r["window_id"] for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r["n_tokens"] == PACK_WINDOW, r
    assert 0 < rows[-1]["n_tokens"] <= PACK_WINDOW
    total = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_continuations"] <= r["n_docs"]
    # a continuation in window w is a doc that is also present in w+1
    for r, nxt in zip(rows, rows[1:]):
        assert nxt["n_docs"] >= r["n_continuations"]

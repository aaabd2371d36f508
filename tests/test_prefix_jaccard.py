"""Prefix-filtered similarity join (PPJoin-family) is LOSSLESS: identical
output to the unpruned shared-shingle Jaccard join, while joining only
document prefixes. The prefix theorem: under any global token total order,
two sets with Jaccard >= t share a token within their first
|d| - ceil(t*|d|) + 1 tokens — so pruning the frequent tail cannot drop a
qualifying pair."""

from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_prefix_join_equals_full_join(spark):
    from brink_spark.queries.pipeline import (
        q_dedup_jaccard_prefix,
        q_dedup_ngram_jaccard,
    )

    full = _rows(q_dedup_ngram_jaccard(spark, SF_SMALL))
    pref = _rows(q_dedup_jaccard_prefix(spark, SF_SMALL))
    assert pref == full
    assert len(pref) > 0  # fixture has near-dup docs; non-vacuous


def test_prefix_actually_prunes(spark):
    """The candidate join must touch strictly fewer rows than the full
    shingle self-join would: prefix rows < total shingle rows. (If this
    ever fails the 'optimization' is a no-op.)"""
    from brink_spark.queries.pipeline import _capped_shingles

    t = 0.5
    sh = _capped_shingles(spark, SF_SMALL)
    total = sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    prefix_total = (
        sizes.select(
            (F.col("n_sh") - F.ceil(F.col("n_sh") * t) + 1).alias("p")
        )
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    # t=0.5 keeps ~half of each doc's shingles in the prefix
    assert prefix_total < total * 0.7


def test_prefix_candidates_superset_of_results(spark):
    """Every emitted pair must have passed the length filter — a direct
    check of the Jaccard necessary condition min >= t*max on output."""
    from brink_spark.queries.pipeline import q_dedup_jaccard_prefix

    for r in q_dedup_jaccard_prefix(spark, SF_SMALL).collect():
        assert r["jaccard"] >= 0.5

"""Unit tests for the round-3 corpus operators on hand-built fixtures.

The driver gate (tools/check_queries.py) proves engine/oracle parity on
the synthetic documents table; these tests pin the SEMANTICS on inputs
where the expected answer is computable by hand — in particular PII
positives, which the synthetic corpus legitimately lacks.
"""

import pytest
from pyspark.sql import functions as F


def test_pii_columns_finds_each_class(spark):
    from brink_spark.queries.pipeline import pii_columns

    rows = [
        (1, "contact me at alice.smith+x@example.co.uk for details"),
        (2, "server at 10.0.255.3 responded"),
        (3, "card 4111111111111111 on file"),
        (4, "nothing sensitive here"),
        (5, "a@b.io and 1.2.3.4 and 123456789"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", *pii_columns(F.col("text"))).collect()
    }
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_longnum"]) == (1, 0, 0)
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_longnum"]) == (0, 1, 0)
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_longnum"]) == (0, 0, 1)
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_longnum"]) == (0, 0, 0)
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_longnum"]) == (1, 1, 1)
    # redaction shrinks exactly the matched spans to the 5-char token
    assert got[4]["redacted_len"] == len(rows[3][1])
    assert got[2]["redacted_len"] == len(rows[1][1]) - len("10.0.255.3") + 5


def test_pii_ipv4_not_matched_inside_longer_number(spark):
    from brink_spark.queries.pipeline import pii_columns

    df = spark.createDataFrame([(1, "version 1.2.3.4567 build")], ["doc_id", "text"])
    r = df.select(*pii_columns(F.col("text"))).collect()[0]
    # \b\d{1,3}\. arms: 4567 breaks the final octet bound -> no IPv4 hit
    assert r["n_ipv4"] == 0


def _chunk_df(spark):
    # doc 1 and 2 share chunk "a b c d"; doc 3 is unique; doc 4 too short
    rows = [
        (1, "a b c d e f g h"),          # chunks: "a b c d", "e f g h"
        (2, "a b c d x y z w"),          # chunks: "a b c d", "x y z w"
        (3, "p q r s t u v m"),          # unique chunks
        (4, "a b c"),                    # < 4 words -> no chunks, absent
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_chunks_semantics(monkeypatch, spark):
    import brink_spark.queries.pipeline as pl

    monkeypatch.setattr(pl, "_docs", lambda s, sf: _chunk_df(s))
    got = {r["doc_id"]: r for r in pl.q_dedup_chunks(spark, "ignored").collect()}
    assert set(got) == {1, 2, 3}  # doc 4 has no chunks
    assert (got[1]["n_chunks"], got[1]["n_shared_chunks"]) == (2, 1)
    assert got[1]["shared_permille"] == 500
    assert (got[2]["n_chunks"], got[2]["n_shared_chunks"]) == (2, 1)
    assert (got[3]["n_chunks"], got[3]["n_shared_chunks"]) == (2, 0)
    assert got[3]["shared_permille"] == 0


def test_dedup_chunks_within_doc_repeat_is_not_shared(monkeypatch, spark):
    import brink_spark.queries.pipeline as pl

    # the same chunk twice in ONE doc: n_docs=1 -> not "shared"
    df = spark.createDataFrame([(1, "a b c d a b c d")], ["doc_id", "text"])
    monkeypatch.setattr(pl, "_docs", lambda s, sf: df)
    r = pl.q_dedup_chunks(spark, "ignored").collect()[0]
    assert (r["n_chunks"], r["n_shared_chunks"]) == (2, 0)


def test_source_rollup_hand_computed(monkeypatch, spark):
    import brink_spark.queries.pipeline as pl

    rows = [
        (1, "a b a b", "en", "web", 7),      # 4 words, 2 distinct, ttr 500
        (2, "a b c d", "en", "web", 7),      # 4 words, 4 distinct, ttr 1000
        (3, "x", "en", "books", 1),          # 1 word, short
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    monkeypatch.setattr(pl, "_docs", lambda s, sf: df)
    got = {
        (r["source"], r["lang"]): r
        for r in pl.q_source_rollup(spark, "ignored").collect()
    }
    web = got[("web", "en")]
    assert (web["n_docs"], web["total_words"], web["avg_words"]) == (2, 8, 4)
    assert web["short_permille"] == 1000  # both docs < 40 words
    assert web["avg_ttr_permille"] == 750
    books = got[("books", "en")]
    assert (books["n_docs"], books["avg_ttr_permille"]) == (1, 1000)


def test_vocab_stats_hand_computed(monkeypatch, spark):
    import brink_spark.queries.pipeline as pl

    rows = [
        (1, "a a b", "en", "w", 5),
        (2, "b c", "en", "w", 3),
        (3, "z", "fr", "w", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    monkeypatch.setattr(pl, "_docs", lambda s, sf: df)
    got = {r["lang"]: r for r in pl.q_vocab_stats(spark, "ignored").collect()}
    en = got["en"]
    # counts: a->2, b->2, c->1  => 3 types, 1 hapax, 5 tokens, ttr 600
    assert (en["n_types"], en["n_hapax"], en["n_tokens"]) == (3, 1, 5)
    assert en["ttr_permille"] == 600
    assert (got["fr"]["n_types"], got["fr"]["n_hapax"]) == (1, 1)


def test_new_relational_shapes_plan_quality(spark):
    """Q9/Q18/Q19 shapes: dims broadcast, fact aggregates are partial."""
    from brink_spark.queries.relational import (
        q_big_orders,
        q_discount_revenue,
        q_profit_by_nation,
    )

    sf = "/root/testdata/sf0.001"
    for q in (q_profit_by_nation, q_discount_revenue):
        plan = q(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
    # Q18's order-grain agg runs partial (map-side) before the exchange
    plan = (
        q_big_orders(spark, sf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_sum" in plan.lower() or "HashAggregate" in plan


def test_events_asof_join_hand_computed(monkeypatch, spark):
    import datetime as dt

    import brink_spark.queries.relational as rl

    t0 = dt.datetime(2024, 1, 1)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # (event_id, ts, user_id, event_type)
        (1, s(0), 1, "click"),
        (2, s(10), 1, "purchase"),   # matches click 1, gap 10
        (3, s(20), 1, "click"),
        (4, s(30), 1, "purchase"),   # matches click 3, gap 10
        (5, s(5), 2, "purchase"),    # user 2 has no prior click -> dropped
        (6, s(40), 2, "click"),
        (7, s(40), 2, "purchase"),   # equal ts: click visible (inclusive)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    monkeypatch.setattr(rl, "_t", lambda sp, sf, name: df)
    got = {r["purchase_id"]: r for r in rl.q_events_asof_join(spark, "x").collect()}
    assert set(got) == {2, 4, 7}
    assert (got[2]["click_id"], got[2]["gap_s"]) == (1, 10)
    assert (got[4]["click_id"], got[4]["gap_s"]) == (3, 10)
    assert (got[7]["click_id"], got[7]["gap_s"]) == (6, 0)


def test_events_range_join_boundaries(monkeypatch, spark):
    import datetime as dt

    import brink_spark.queries.relational as rl

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)  # 12:00 exactly (bucket boundary)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # purchase at 12:00:00 -> window [11:00:00, 12:00:00)
        (1, s(0), 1, "purchase", 0.0),
        (2, s(-3600), 1, "click", 1.0),   # exactly pts-3600: INCLUDED
        (3, s(-3601), 1, "click", 2.0),   # one sec earlier: excluded
        (4, s(0), 1, "click", 4.0),       # equal ts: excluded (strict <)
        (5, s(-1), 1, "click", 8.0),      # included (previous bucket probe)
        (6, s(-1800), 2, "click", 16.0),  # other user: excluded
        (7, s(10), 2, "purchase", 0.0),   # user 2: one click 1810s before
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    monkeypatch.setattr(rl, "_t", lambda sp, sf, name: df)
    got = {r["purchase_id"]: r for r in rl.q_events_range_join(spark, "x").collect()}
    assert got[1]["n_recent_clicks"] == 2          # events 2 and 5
    assert got[1]["click_value_x100"] == 900       # 1.0*100 + 8.0*100
    assert got[7]["n_recent_clicks"] == 1          # event 6
    assert got[7]["click_value_x100"] == 1600


def test_dedup_chunks_boilerplate_hot_key(monkeypatch, spark):
    """One chunk shared by EVERY doc (the boilerplate mega-key): the
    chunk-df join build side stays one row per chunk, so the hot key
    cannot pile the corpus into one partition, and the per-doc shares
    stay exact."""
    import brink_spark.queries.pipeline as pl

    rows = [(i, f"x y z w u{i} v{i} s{i} t{i}") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    monkeypatch.setattr(pl, "_docs", lambda s, sf: df)
    got = pl.q_dedup_chunks(spark, "ignored").collect()
    assert len(got) == 2000
    assert all(r["n_chunks"] == 2 for r in got)
    assert all(r["n_shared_chunks"] == 1 for r in got)  # the boilerplate
    assert all(r["shared_permille"] == 500 for r in got)


def test_round4_shapes_plan_quality(spark):
    """Round-4 queries keep the plans they were designed for: dims
    broadcast (no sort-merge join anywhere), the rollup expands grouping
    sets BEFORE one exchange (Expand feeding partial HashAggregate, not
    one pass per set), the window top-N sorts only within its single
    suppkey exchange, and the funnel is pure partial-agg — no Window."""
    from brink_spark.queries.relational import (
        q_events_funnel,
        q_revenue_rollup,
        q_sales_opportunity,
        q_supplier_parts_distinct,
        q_top_parts_per_supplier,
    )

    sf = "/root/testdata/sf0.001"

    def plan(q):
        return q(spark, sf)._jdf.queryExecution().executedPlan().toString()

    for q in (q_sales_opportunity, q_supplier_parts_distinct, q_revenue_rollup):
        p = plan(q)
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p

    p = plan(q_revenue_rollup)
    assert "Expand" in p  # grouping sets expanded once, map-side
    assert "HashAggregate" in p

    p = plan(q_top_parts_per_supplier)
    assert "Window" in p
    assert "SortMergeJoin" not in p

    p = plan(q_events_funnel)
    assert "Window" not in p  # packed-min aggregation, no window
    assert "HashAggregate" in p


def test_window_shapes_plan_quality(spark):
    """brand_year_trend's LAG window runs over the PRE-AGGREGATED
    (brand, year) rows — partial HashAggregate below the window, dim
    broadcast, no sort-merge join; customer_running_total is one window
    over one custkey exchange."""
    from brink_spark.queries.relational import (
        q_brand_year_trend,
        q_customer_running_total,
    )

    sf = "/root/testdata/sf0.001"
    p = (
        q_brand_year_trend(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "HashAggregate" in p and "Window" in p
    # aggregate happens below the window: the window's child plan chain
    # contains the aggregate, not the raw scan directly
    assert p.index("Window") < p.index("HashAggregate")

    p = (
        q_customer_running_total(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in p
    assert p.count("Exchange") == 1  # one custkey shuffle, nothing else


def test_multimodal_frame_sample_hand_computed(spark, tmp_path):
    """Frame-sample math pinned against a pure-Python hashlib recomputation:
    the 64-byte payload is 4 chained md5 digests, frames are 4-byte strides,
    sampled frames are 0/4/8/12, resize = floor-mean per sampled frame."""
    import hashlib

    from brink_spark.queries.pipeline import q_multimodal_frame_sample

    texts = ["hello world", "the quick brown fox", ""]
    rows = [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in q_multimodal_frame_sample(spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2}
    for i, t in enumerate(texts):
        payload = b"".join(
            hashlib.md5((t + suf).encode()).digest() for suf in ("", "x", "y", "z")
        )
        assert len(payload) == 64
        frames = [payload[4 * k : 4 * k + 4] for k in range(16)]
        sampled = [frames[f] for f in (0, 4, 8, 12)]
        r = got[i]
        assert (r["n_frames"], r["n_sampled"]) == (16, 4)
        assert r["sampled_byte_sum"] == sum(sum(f) for f in sampled)
        for j, f in enumerate(sampled):
            assert r[f"f{j}_mean"] == sum(f) // 4

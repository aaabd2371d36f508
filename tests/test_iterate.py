"""Iterative-loop lineage control (queries/iterate.py): plan depth stays
flat as rounds grow, and convergence mode collapses chains the fixed-round
driver-gate form cannot (VERDICT r3 "What's wrong" #1 / #3)."""

import pytest
from pyspark.sql import functions as F


def _chain_pairs(spark, n=8):
    """doc_1—doc_2—...—doc_n: a path graph of diameter n-1."""
    rows = [(f"doc_{i}", f"doc_{i + 1}") for i in range(1, n)]
    return spark.createDataFrame(rows, ["doc_a", "doc_b"])


def _und(pairs):
    return (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
    )


def test_plan_depth_constant_in_rounds(spark):
    """The lineage cut means round N+1 plans against a flat scan of round
    N's materialized result — the ANALYZED plan of the final labels frame
    must not grow with the round count (uncached it doubles per round:
    6 rounds would be ~2^4× the 2-round plan)."""
    from brink_spark.queries.iterate import min_label_propagate

    und = _und(_chain_pairs(spark))
    p2 = min_label_propagate(und, rounds=2)._jdf.queryExecution().analyzed().toString()
    p6 = min_label_propagate(und, rounds=6)._jdf.queryExecution().analyzed().toString()
    assert len(p6) <= 2 * len(p2)


def test_fixed_rounds_leave_long_chain_split(monkeypatch, spark):
    """Contract check for the driver-gate form: 3 rounds cannot collapse a
    diameter-7 chain (documented, oracle matches) — this pins WHY the
    converged variant exists."""
    import brink_spark.queries.pipeline as pl

    monkeypatch.setattr(
        pl, "q_dedup_minhash_lsh", lambda s, sf: _chain_pairs(spark)
    )
    out = pl.q_dedup_clusters(spark, "ignored").collect()
    assert len(out) > 1  # still split after 3 rounds


def test_converged_recovers_single_cluster(monkeypatch, spark):
    """Production form: iterate-to-fixed-point recovers the ONE cluster on
    a chain of diameter > 3, canonical = min doc_id, size = all 8 nodes."""
    import brink_spark.queries.pipeline as pl

    monkeypatch.setattr(
        pl, "q_dedup_minhash_lsh", lambda s, sf: _chain_pairs(spark)
    )
    out = pl.q_dedup_clusters_converged(spark, "ignored").collect()
    assert len(out) == 1
    assert out[0]["canonical_doc"] == "doc_1"
    assert out[0]["cluster_size"] == 8


def test_converged_matches_fixed_when_diameter_small(monkeypatch, spark):
    """On a graph that 3 rounds already converge (two triangles), both
    forms agree exactly — the converged variant is a strict generalization."""
    import brink_spark.queries.pipeline as pl

    rows = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    pairs = spark.createDataFrame(rows, ["doc_a", "doc_b"])
    monkeypatch.setattr(pl, "q_dedup_minhash_lsh", lambda s, sf: pairs)
    fixed = sorted(map(tuple, pl.q_dedup_clusters(spark, "i").collect()))
    conv = sorted(map(tuple, pl.q_dedup_clusters_converged(spark, "i").collect()))
    assert fixed == conv == [("a", 3), ("x", 3)]


def test_two_phase_collapses_chain_in_log_rounds(spark):
    """Star contraction's whole point: a diameter-63 chain converges well
    within 12 rounds (O(log n)), where label propagation would need ~63.
    max_rounds=12 < diameter proves the speedup is real, not a guard."""
    from brink_spark.queries.iterate import two_phase_components

    rows = [(i, i + 1) for i in range(64)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    labels = two_phase_components(edges, max_rounds=12).collect()
    assert len(labels) == 65
    assert {r["lbl"] for r in labels} == {0}


def test_two_phase_keeps_selfloop_isolates(spark):
    """A node whose only edge is a self-loop is its own component — it
    must survive the self-loop drop into the output inventory."""
    from brink_spark.queries.iterate import two_phase_components

    edges = spark.createDataFrame([(1, 2), (7, 7)], ["src", "dst"])
    got = {r["node"]: r["lbl"] for r in two_phase_components(edges).collect()}
    assert got == {1: 1, 2: 1, 7: 7}


from hypothesis import given, settings, strategies as st

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(_edges_strategy)
def test_two_phase_equals_union_find(spark, edges):
    """Property: large-star/small-star contraction produces exactly the
    connected components (label = min node id) on arbitrary topology —
    same union-find oracle as the propagation form."""
    from brink_spark.queries.iterate import two_phase_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for n in parent:
        expect.setdefault(find(n), set()).add(n)
    want = {min(m): sorted(m) for m in expect.values()}

    df = spark.createDataFrame(edges, ["src", "dst"])
    labels = two_phase_components(df)
    got = {}
    for r in labels.collect():
        got.setdefault(r["lbl"], []).append(r["node"])
    assert {k: sorted(v) for k, v in got.items()} == want


@settings(max_examples=15, deadline=None)
@given(_edges_strategy)
def test_converged_propagation_equals_union_find(spark, edges):
    """Property: on ANY graph, iterate-to-fixed-point min-label
    propagation produces exactly the connected components (label = min
    node id of the component), verified against a pure-Python
    union-find oracle. Few examples, arbitrary topology — cycles,
    multi-edges, stars, disjoint blobs all land here."""
    from pyspark.sql import functions as F

    from brink_spark.queries.iterate import min_label_propagate

    # union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expect = {}
    for n in parent:
        expect.setdefault(find(n), set()).add(n)
    want = {min(m): sorted(m) for m in expect.values()}

    df = spark.createDataFrame(edges, ["src", "dst"])
    und = df.union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    labels = min_label_propagate(und, rounds=None)
    got = {}
    for r in labels.collect():
        got.setdefault(r["lbl"], []).append(r["node"])
    assert {k: sorted(v) for k, v in got.items()} == want

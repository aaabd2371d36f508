"""Property tests for the graph kernels against brute-force oracles on
small random graphs — independent of the DuckDB oracle SQL (which shares
the degree-ordered formulation and could in principle share a bug)."""

from itertools import combinations


def _random_edges(seed: int, n_nodes: int, n_edges: int):
    """Deterministic pseudo-random undirected edge list (no self-loops)."""
    edges = set()
    x = seed or 1
    while len(edges) < n_edges:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = (x >> 16) % n_nodes
        b = (x >> 40) % n_nodes
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _brute_triangles(edges):
    """O(n^3) oracle: per-node triangle participation counts."""
    es = set(edges)
    nodes = sorted({v for e in edges for v in e})
    counts = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in es and (b, c) in es and (a, c) in es:
            for v in (a, b, c):
                counts[v] = counts.get(v, 0) + 1
    return counts


def _spark_triangles(spark, edges, kernel=None):
    """The exact production kernel (shared with q_graph_triangles),
    applied to an explicit edge list. kernel=None exercises the adaptive
    dispatcher; 'bitset'/'ordered' pin a specific path."""
    from brink_spark.queries.relational import (
        _triangle_counts_bitset,
        _triangle_counts_ordered,
        triangle_counts,
    )
    from brink_spark.queries.iterate import cut

    und = spark.createDataFrame(edges, ["x", "y"])
    if kernel == "bitset":
        out = _triangle_counts_bitset(
            cut(und), max(max(x, y) for x, y in edges)
        )
    elif kernel == "ordered":
        out = _triangle_counts_ordered(cut(und))
    else:
        out = triangle_counts(und)
    return {r["node"]: r["n_triangles"] for r in out.collect()}


def test_triangles_match_bruteforce_random_graphs(spark):
    for seed, n_nodes, n_edges in ((7, 18, 40), (11, 25, 80), (13, 12, 30)):
        edges = _random_edges(seed, n_nodes, n_edges)
        assert _spark_triangles(spark, edges) == _brute_triangles(edges), seed


def test_triangles_both_kernels_agree_with_bruteforce(spark):
    """The adaptive dispatcher (triangle_counts) picks the dense-bitset
    kernel for compact id spaces and the degree-ordered join kernel past
    TRIANGLE_BITSET_MAX_ID; both must match brute force on the same
    graphs — incl. ids spanning >64-bit-word boundaries (node 100 → word
    1) so the multi-word bitmap path is really exercised."""
    for seed, n_nodes, n_edges in ((7, 18, 40), (29, 150, 400)):
        edges = _random_edges(seed, n_nodes, n_edges)
        want = _brute_triangles(edges)
        assert _spark_triangles(spark, edges, kernel="bitset") == want, seed
        assert _spark_triangles(spark, edges, kernel="ordered") == want, seed


def test_triangles_star_graph_has_none(spark):
    """A hub with many spokes (max-degree node) has zero triangles — the
    exact shape degree ordering exists to keep cheap: every spoke edge
    orients AWAY from the hub, so the hub builds no wedges at all."""
    edges = [(0, i) for i in range(1, 40)]
    assert _spark_triangles(spark, edges) == {}


def test_triangles_complete_graph(spark):
    """K6: every node sits in C(5,2)=10 triangles."""
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    assert _spark_triangles(spark, edges) == {v: 10 for v in range(6)}

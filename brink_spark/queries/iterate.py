"""Lineage control for iterative DataFrame loops.

Round-N+1 of a label-propagation / PageRank loop references round-N's
DataFrame twice (once directly, once through the neighbor aggregate), so
the LOGICAL plan doubles per round: after R rounds Catalyst re-analyzes a
2^R-node tree and may re-derive the base pipeline up to 2^R times
(exchange reuse recovers some of it, not all). At 100 TB the
driver-serial planning cost alone becomes the bottleneck long before the
executors do. The standard fix — the same one the crawl wave loop applies
by round-tripping state through its store — is to CUT the lineage each
round so every iteration plans against a flat scan of the previous
round's materialized result.

``cut`` uses ``localCheckpoint(eager=True)``: blocks are materialized on
the executors and the plan is truncated to a LogicalRDD scan. On a
single-JVM bench (local[N]) this is exactly right. On a multi-executor
cluster, localCheckpoint blocks are NOT replicated — an executor loss
makes them unrecoverable — so a long production job would call
``spark.sparkContext.setCheckpointDir(hdfs_path)`` and flip
``reliable=True`` here (same call sites, reliable ``checkpoint()``
instead). Correctness is unaffected either way: checkpointing changes
when a plan is computed, never what it computes, so oracle hashes are
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation


def cut(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and truncate its lineage; see module docstring."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def two_phase_components(
    edges: DataFrame, max_rounds: int = 50
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) over an edge list ``(src, dst)`` (either orientation, self
    loops tolerated). Returns ``(node, lbl)`` with ``lbl`` = the minimum
    node id of each component.

    Why this exists next to :func:`min_label_propagate`: label
    propagation needs O(diameter) rounds — a 10^6-long chain (link farms,
    pagination trails) needs 10^6 shuffles. Star contraction converges in
    O(log n) rounds REGARDLESS of diameter, which is why it is the
    standard web-graph CC algorithm. Each round is two groupBy shuffles
    on node id; the edge set only shrinks (toward one star per
    component), so round cost is non-increasing.

    large-star: every node points its LARGER neighbors at the minimum of
    its neighborhood (incl. itself); small-star does the same for the
    smaller-or-equal neighbors after orienting edges high→low.
    Fixed point: every component is a star rooted at its minimum.
    Convergence test is a 2-value aggregate (edge count + hash sum) per
    round — bounded driver state, nothing collected."""
    from pyspark.sql import functions as F

    # Node inventory before dropping self-loops: an isolated self-loop
    # node is its own component and must survive to the output.
    nodes = cut(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    def cut_with_stats(df):
        # Set fingerprint: count + two independent XOR-folded 64-bit
        # hashes (XOR never overflows, unlike SUM under ANSI mode; two
        # seeds push false-convergence odds to ~2^-128). A false match
        # would stop the loop one round early — vanishingly unlikely.
        # The fingerprint rides the round's OWN eager-checkpoint job as
        # an Observation, so convergence costs no separate action.
        obs = Observation()
        cp = cut(
            df.observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(hi, lo))").alias("h1"),
                F.expr("bit_xor(xxhash64(hi, lo, 1))").alias("h2"),
            )
        )
        got = obs.get
        return cp, (got["n"], got["h1"], got["h2"])

    E, prev = cut_with_stats(
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .distinct()
    )
    for _ in range(max_rounds):
        # -- large-star: und view (both directions); for each u emit
        #    (v, min(N(u) ∪ {u})) for v > u.
        und = E.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            E.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = und.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m")
        )
        # One lineage cut per ROUND (after small-star) is enough: the
        # round always starts from a checkpointed E, so the within-round
        # plan depth is a constant (LS feeding SS), not compounding.
        # Cutting here too would double the eager materializations for
        # no asymptotic gain.
        E = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .distinct()
        )
        # -- small-star: edges already oriented hi→lo; for each hi emit
        #    (v, m) for v ∈ N(hi) ∪ {hi}, v ≠ m, with m = min(N(hi)).
        mins = E.groupBy("hi").agg(F.min("lo").alias("m"))
        E, cur = cut_with_stats(
            E.join(mins, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .union(mins.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
        )
        if cur == prev:
            break
        prev = cur
    # Converged: E is one star per component (hi → component min).
    lab = E.groupBy(F.col("hi").alias("node")).agg(F.min("lo").alias("lbl"))
    return nodes.join(lab, "node", "left").select(
        "node", F.coalesce("lbl", F.col("node")).alias("lbl")
    )


def min_label_propagate(
    und: DataFrame, rounds: int | None = None, max_rounds: int = 50
) -> DataFrame:
    """Min-label propagation over an undirected edge list ``(src, dst)``
    (both directions present) — the hash-join form of large-scale
    connected components, shared by near-dup clustering and the graph-CC
    query. Returns ``(node, lbl)``.

    ``rounds=N`` runs exactly N rounds (oracle-exact whether or not
    converged — the driver-gate form, expressible as SQL CTEs).
    ``rounds=None`` iterates to a FIXED POINT: stop when a round changes
    zero labels, so chains of any diameter collapse — the production
    form. Converged rounds additionally PATH-SHORTCUT (hash-to-min,
    Rastogi et al.): the update is min(own, neighbor labels, label OF
    own label), so label chains halve every round and convergence takes
    O(log diameter) rounds instead of O(diameter) — measured 16 → 5
    rounds on the sf1 LSH pair graph, whose diameter the plain form
    walks one hop per shuffle. The shortcut only accelerates the same
    monotone descent: any state stable under the shortcut update is
    stable under the plain update, and the fixed point is the component
    minimum either way (the 8-round-unrolled SQL oracle agrees whenever
    both have converged, which the mirror checks). Fixed-round mode
    keeps the EXACT plain update — its oracle is the literal N-round
    unroll. The convergence count rides each round's own eager-
    checkpoint job as an Observation (no separate action); ``max_rounds``
    is a runaway guard.

    Each round is one shuffle keyed on dst (plus the label-of-label
    self-join in converged mode) and a lineage cut: ``und`` is re-joined
    and ``labels`` referenced twice per round, so without the cuts the
    logical plan doubles per round (module docstring)."""
    from pyspark.sql import functions as F

    und = cut(und)
    labels = cut(
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    for _ in range(rounds if rounds is not None else max_rounds):
        nb = (
            und.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nb_min"))
        )
        if rounds is None:
            # label-of-label shortcut: lbl values are always node ids
            # (initialized from nodes, only ever replaced by smaller node
            # ids), so they resolve against the labels table itself
            short = labels.select(
                F.col("node").alias("lbl"), F.col("lbl").alias("_short")
            )
            new_lbl = F.least(
                "lbl",
                F.coalesce("nb_min", "lbl"),
                F.coalesce("_short", "lbl"),
            )
            proj = (
                labels.join(nb, "node", "left")
                .join(short, "lbl", "left")
                .select(
                    "node",
                    new_lbl.alias("lbl"),
                    (new_lbl != F.col("lbl")).alias("_chg"),
                )
            )
            obs = Observation()
            nxt = cut(proj.observe(obs, F.count_if(F.col("_chg")).alias("c")))
            labels = nxt.drop("_chg")
            if obs.get["c"] == 0:
                break
        else:
            labels = cut(
                labels.join(nb, "node", "left").select(
                    "node",
                    F.least("lbl", F.coalesce("nb_min", "lbl")).alias("lbl"),
                )
            )
    return labels

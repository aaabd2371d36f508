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

from pyspark.sql import DataFrame


def cut(df: DataFrame, reliable: bool = False) -> DataFrame:
    """Materialize ``df`` and truncate its lineage; see module docstring."""
    if reliable:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


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
    form. The convergence check is ONE driver-side count per round
    (bounded driver state, nothing collected); ``max_rounds`` is a
    runaway guard — propagation converges in O(graph diameter) rounds.

    Each round is one shuffle keyed on dst plus a lineage cut: ``und``
    is re-joined and ``labels`` referenced twice per round, so without
    the cuts the logical plan doubles per round (module docstring)."""
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
        nxt = cut(
            labels.join(nb, "node", "left").select(
                "node",
                F.least("lbl", F.coalesce("nb_min", "lbl")).alias("lbl"),
            )
        )
        if rounds is None:
            changed = (
                nxt.alias("n")
                .join(labels.alias("p"), "node")
                .filter(F.col("n.lbl") != F.col("p.lbl"))
                .count()
            )
            labels = nxt
            if changed == 0:
                break
        else:
            labels = nxt
    return labels

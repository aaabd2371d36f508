"""Global plan audit: build the physical plan of EVERY registry query and
enforce the scale invariants that individual plan gates (tests/test_plans.py)
spot-check — across the whole suite, so a new query can't silently ship a
cartesian product or an unbounded nested loop.

Checks per query (plan build only; lineage-cut queries execute their cut
blocks, which is why this runs at the smallest SF):
  - no CartesianProduct, ever;
  - BroadcastNestedLoopJoin only where a 1-row/scalar build side makes it
    the CORRECT plan (whitelisted below with the reason);
  - no row-at-a-time Python (BatchEvalPython) — Python stays Arrow-batched.

Also emits BENCH/plan_fingerprint.json: per-query exchange / join-node
counts. Diffing it across rounds turns "did this refactor add a shuffle?"
into a one-line review.

Usage: python tools/plan_audit.py [sf_dir] [--write]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BNLJ is the right plan when the build side is a single-row aggregate
# (scalar subquery) — broadcasting one row and nested-looping is cheaper
# than any shuffle. Each entry names the scalar that justifies it.
BNLJ_WHITELIST = {
    "important_parts": "global-total threshold (Q11) — 1-row aggregate build side",
    "discount_revenue": "avg-quantity scalar (Q17 shape) — 1-row build side",
    "nation_market_share": "global revenue denominator (Q8 shape) — 1-row build side",
    "value_percentiles": "global percentile cutoffs — 1-row build side",
    "decontaminate": "eval-set count scalar — 1-row build side",
    "lm_score_bigram": "corpus-total token count — 1-row build side",
    "vocab_stats": "corpus-total token count — 1-row build side",
    "repetition_stats": "corpus-level denominators — 1-row build side",
    "sales_opportunity": "acctbal threshold scalar (Q22 shape) — 1-row build side",
    "inverted_index": "corpus doc-count scalar (relative df cap) — 1-row build side",
    "recrawl_priority": "corpus max-timestamp scalar (crawl-clock 'now') — 1-row build side",
    "lang_balanced_sample": "sum-of-isqrt quota denominator scalar — 1-row build side",
    "tfidf_cosine_pairs": "corpus doc-count scalar (integer idf) — 1-row build side",
    "basket_lift": "order-count scalar (lift denominator) — 1-row build side",
    # constant parameter tables: the build side is O(k) config rows
    # (hash-permutation seeds / IVF centroids / simhash bit-planes), not
    # data — the cross join fans each row out k ways by construction
    "dedup_minhash_lsh": "permutation-seed table cross join — O(k) constant build side",
    "dedup_incremental": "inherits dedup_minhash_lsh's permutation-seed cross join",
    "dedup_simhash": "bit-plane table cross join — O(k) constant build side",
    "ann_ivf_topk": "centroid table cross join — O(k) constant build side",
    "ann_ivf_kmeans_topk": "trained-centroid table cross join — O(k) "
    "constant build side (K=16 codebook rows; the Lloyd assignment fans "
    "each vector out K ways by construction)",
    "embed_kmeans_assign": "K=8 seed-centroid cross join — O(k) constant "
    "build side (the Lloyd assignment step fans each vector out K ways "
    "by construction)",
    # the one deliberate all-pairs plan in the suite:
    "ann_bruteforce_topk": "documented brute-force baseline (NOT-equal join); "
    "scale paths are ann_lsh_topk / ann_ivf_topk",
}


def audit(sf_dir: str, write: bool = False) -> int:
    from brink_spark.queries import ALL_QUERIES
    from brink_spark.session import get_spark

    spark = get_spark()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )

    fingerprint: dict[str, dict] = {}
    violations: list[str] = []
    for name, (fn, _sql) in sorted(ALL_QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            violations.append(f"{name}: plan build failed: {exc}")
            continue
        fp = {
            "exchanges": plan.count("Exchange hashpartitioning"),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sortmerge_joins": plan.count("SortMergeJoin"),
            "shuffledhash_joins": plan.count("ShuffledHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
        }
        fingerprint[name] = fp
        if "CartesianProduct" in plan:
            violations.append(f"{name}: CartesianProduct")
        if fp["bnlj"] and name not in BNLJ_WHITELIST:
            violations.append(f"{name}: unwhitelisted BroadcastNestedLoopJoin")
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python UDF")

    for name, fp in sorted(fingerprint.items()):
        flag = " BNLJ(ok: %s)" % BNLJ_WHITELIST[name] if (
            fp["bnlj"] and name in BNLJ_WHITELIST
        ) else ""
        print(
            f"{name:32s} exch={fp['exchanges']:3d} bhj={fp['broadcast_joins']:2d}"
            f" smj={fp['sortmerge_joins']:2d} py={fp['arrow_python']}{flag}"
        )

    if write:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH",
            "plan_fingerprint.json",
        )
        with open(out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "queries": fingerprint}, f, indent=1, sort_keys=True
            )
        print(f"wrote {out}")

    if violations:
        print("\nVIOLATIONS:")
        for v in violations:
            print(" -", v)
        return 1
    print(f"\n{len(fingerprint)} queries audited, 0 violations")
    return 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if args else "/root/testdata/sf0.001"
    sys.exit(audit(sf, write="--write" in sys.argv))

"""Query registry for the driver contract (__spark_entry__.py).

Each entry pairs an idiomatic-Spark DataFrame builder with an ANSI-SQL
oracle string DuckDB runs over the same parquet views. Column names are
aliased identically on both sides (the driver's compare hashes values over
name-sorted columns). Float aggregates are rounded on both sides so
summation-order differences between engines can't flip the hash.
"""

from brink_spark.queries.relational import RELATIONAL_QUERIES
from brink_spark.queries.pipeline import PIPELINE_QUERIES
from brink_spark.queries.sketches import SKETCH_QUERIES
from brink_spark.queries.training import TRAINING_QUERIES

# Driver-row rotation: the round driver evaluates (at most) the FIRST 50
# registry entries, so ordering IS the hard-signal schedule. Policy
# (tools/rotation.py regenerates this list; tests/test_rotation.py
# enforces invariant 1 against the newest CORRECTNESS_r*.json on disk):
#   1. queries with NO driver-green row from ANY round come first — every
#      query earns a hard row within one round of being registered;
#   2. then queries whose newest green row is OLDEST (stalest-first), so
#      every query re-earns a hard row every ~2 rounds instead of
#      coasting forever on one green record;
#   3. queries whose code was touched this round are promoted within
#      their tier.
# Every entry, regardless of position, is still checked by the local
# mirror (tools/check_queries.py) each round.
_DRIVER_GATE_ORDER = [
    # Regenerated for round 6 against CORRECTNESS_r05 (tools/rotation.py):
    # no never-green queries remain, so the 50 slots go stalest-first —
    # the r3-green cohort, then the r4-green cohort in registry order.
    # --- newest green row is r3 (stalest — re-earn first) ---
    "text_langid_ngram",
    "pipeline_end_to_end",
    "doc_rolling_hash",
    "token_stats_by_lang",
    "token_bpe_stats",
    "events_asof_join",
    "events_range_join",
    "tfidf_top_terms",
    "sample_stratified",
    "dedup_clusters",
    "repetition_stats",
    "decontaminate",
    "lm_score_bigram",
    "dedup_chunks",
    # --- newest green row is r4 ---
    "graph_pagerank",
    "dedup_jaccard_prefix",
    "url_registrable_domain",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "order_priority",
    "customer_order_distribution",
    "part_supplier_stats",
    "events_tumbling",
    "events_sessionize",
    "events_user_stats",
    "url_normalize_dedup",
    "frontier_anti_join",
    "cached_dispatch",
    "politeness_topk",
    "sitemap_seeds",
    "graph_components",
    "graph_components_2phase",
    "graph_hits",
    "events_session_window",
    "events_pivot",
    "events_cube",
    "graph_triangles",
    "basket_pairs",
    "events_zscore_outliers",
    "volume_shipping",
    "promo_effect",
    "top_supplier",
    "profit_by_nation",
    "big_orders",
    "discount_revenue",
    "sales_opportunity",
    "supplier_parts_distinct",
    "top_parts_per_supplier",
    "revenue_rollup",
    # --- past the 50-slot gate: r4-green tail, then the r5-green cohort
    #     (still mirror-checked every round by tools/check_queries.py) ---
    "events_funnel",
    "brand_year_trend",
    "customer_running_total",
    "value_percentiles",
    "events_hopping",
    "events_retention",
    "supplier_market_share",
    "dedup_incremental",
    "multimodal_frame_sample",
    "source_rollup",
    "vocab_stats",
    "pii_scrub",
    "dedup_clusters_converged",
    "sketch_distinct_users",
]

_MERGED: dict = {
    **RELATIONAL_QUERIES,
    **PIPELINE_QUERIES,
    **SKETCH_QUERIES,
    **TRAINING_QUERIES,
}
ALL_QUERIES: dict = {
    **{k: _MERGED[k] for k in _DRIVER_GATE_ORDER},
    **{k: v for k, v in _MERGED.items() if k not in _DRIVER_GATE_ORDER},
}


def spark_queries():
    return {name: fns[0] for name, fns in ALL_QUERIES.items()}


def oracle_sqls():
    return {name: fns[1] for name, fns in ALL_QUERIES.items() if fns[1] is not None}

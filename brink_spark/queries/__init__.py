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
    # --- tier 1: no driver row from any round (registered late in r4) ---
    "returned_revenue",
    "waiting_suppliers",
    "min_cost_supplier",
    "important_parts",
    "nation_market_share",
    "dominant_suppliers",
    "small_qty_revenue",
    "late_priority_lines",
    "discount_forecast",
    # --- tier 1: new in round 5 (queries/training.py) ---
    "containment_pairs",
    "dedup_keep_best",
    "chunk_first_occurrence",
    "split_assign",
    "source_balance",
    "inverted_index",
    "embed_kmeans_assign",
    # --- tier 1: new in round 5 (queries/pipeline.py media join) ---
    "media_span_join",
    # --- tier 1: new in round 5 (queries/sketches.py) ---
    "sketch_heavy_hitters",
    "sketch_quantile_check",
    "ann_ivf_kmeans_topk",
    "ann_pq_adc_topk",
    "pack_sequences",
    "recrawl_priority",
    "url_template_traps",
    "lang_balanced_sample",
    "quality_source_prior",
    "dedup_cdc_chunks",
    "graph_ppr",
    "tfidf_cosine_pairs",
    "basket_lift",
    "events_mad_outliers",
    "url_near_dedup",
    "graph_reachability",
    "events_markov",
    "host_connectivity",
    # --- tier 2: newest green row is r3 (stalest) ---
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embed_neardup",
    "ann_bruteforce_topk",
    "ann_lsh_buckets",
    "text_quality",
    "text_langid",
    "doc_fingerprint",
    "multimodal_features",
    "dedup_simhash",
    "embed_neardup_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "span_explode",
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
    # --- tier 3 (r4-green, code touched in round 5: pagerank cut fix,
    #     jaccard boundary fix, PSL-lite list trim) ---
    "graph_pagerank",
    "dedup_jaccard_prefix",
    "url_registrable_domain",
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

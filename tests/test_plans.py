"""Physical-plan quality gates (SURVEY.md §4.2): predicate pushdown reaches
the parquet scan, column pruning limits ReadSchema, small dims broadcast,
and the hot path stays inside whole-stage codegen — the properties that
make the same plan survive a 100x scale-up."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _formatted(df):
    jdf = df._jdf
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jdf.queryExecution().explainString(mode)


def _codegen(df):
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_reaches_scan(spark):
    from brink_spark.queries.relational import q_pricing_summary

    plan = _formatted(q_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_limits_read_schema(spark):
    from brink_spark.queries.relational import q_pricing_summary

    plan = _formatted(q_pricing_summary(spark, SF))
    read_schema = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # only the 6 referenced lineitem columns are read — not all 11
    assert "l_quantity" in read_schema and "l_returnflag" in read_schema
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema


def test_small_dims_broadcast(spark):
    from brink_spark.queries.relational import q_revenue_by_nation

    plan = _formatted(q_revenue_by_nation(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no dim should fall back to SMJ


def test_hot_path_in_whole_stage_codegen(spark):
    from brink_spark.queries.relational import q_pricing_summary

    df = q_pricing_summary(spark, SF)
    df.collect()  # AQE reveals codegen spans only in the executed plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark operators inside WholeStageCodegen stage n
    assert "*(1)" in plan or "*(2)" in plan, plan[:500]


def test_aggregation_is_partial_before_exchange(spark):
    """Map-side combine: partial_sum runs below the shuffle (free from
    groupBy when expressed declaratively — SURVEY.md §4.2)."""
    from brink_spark.queries.relational import q_pricing_summary

    plan = _codegen(q_pricing_summary(spark, SF))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")  # below the exchange


def test_crawl_link_extraction_is_jvm_native(spark, tiny_fixture):
    """The link-extraction path (explode + C5/C6 + D2 resolution) must stay
    native: no Python evaluation nodes besides the two sanctioned Arrow
    UDFs (normalize, parse)."""
    from brink_spark.sources.sitegen import pages_to_spark

    pages = pages_to_spark(spark, tiny_fixture)
    links = (
        pages.select(
            "url",
            F.explode(
                F.filter("spans", lambda s: s["kind"] == F.lit("link"))
            ).alias("s"),
        )
        .select("url", F.coalesce(F.col("s.text"), F.lit("")).alias("raw"))
        .filter((F.col("raw") != "javascript:;") & ~F.col("raw").startswith("#"))
        .withColumn("href", F.expr("trim(BOTH ' ' FROM raw)"))
        .filter(F.col("href") != "")
    )
    plan = _codegen(links)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_anti_join_on_uniform_key(spark):
    """The seen-set anti join keys on url_norm (uniform hash) — verify the
    join strategy is a hash-based anti join, not a nested loop."""
    edges = spark.range(1000).select(
        F.concat(F.lit("https://h/p"), F.col("id")).alias("url_norm")
    )
    visited = spark.range(500).select(
        F.concat(F.lit("https://h/p"), F.col("id")).alias("url_norm")
    )
    plan = _codegen(edges.join(visited, "url_norm", "left_anti"))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_fetch_repartition_has_no_parallelism_ceiling(spark, tmp_path):
    """The fetch-stage salt must not cap parallelism (the r1 lit(64) modulus
    capped a 4N-executor cluster at 64-way): the salt key is the raw 64-bit
    hash (unbounded cardinality) and the partition count is AQE-managed by
    default, worker-count may only RAISE the floor, and an explicit
    fetch-partitions override wins."""
    from brink_spark.config import CrawlConfig
    from brink_spark.plans.crawl import CrawlEngine

    base = CrawlConfig("https://site0.example/")
    eng = CrawlEngine(spark, base, str(tmp_path / "s1"))
    shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    natural = max(shuffle, spark.sparkContext.defaultParallelism)
    assert eng.fetch_partition_count() == 0  # AQE-managed

    # worker-count below the cluster's natural parallelism never caps
    small = CrawlEngine(spark, base.with_(worker_count=2), str(tmp_path / "s2"))
    assert small.fetch_partition_count() == 0
    big = CrawlEngine(spark, base.with_(worker_count=natural * 8), str(tmp_path / "s3"))
    assert big.fetch_partition_count() == natural * 8

    # explicit override wins
    exp = CrawlEngine(spark, base.with_(fetch_partitions=1024), str(tmp_path / "s4"))
    assert exp.fetch_partition_count() == 1024

    # the salt expression has full 64-bit cardinality: distinct salt values
    # track distinct (host, url_norm) pairs, not a 64-value modulus
    from pyspark.sql import functions as F

    df = spark.range(500).select(
        F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
        F.concat(F.lit("https://h/p"), F.col("id")).alias("url_norm"),
    )
    n_salts = df.select(F.xxhash64("host", "url_norm").alias("s")).distinct().count()
    assert n_salts == 500


def test_lsh_neardup_plan_is_bucket_join(spark):
    """The LSH near-dup candidate stage must be a hash-partitioned equi-join
    on the bucket key — never a nested-loop / cartesian over vectors."""
    from brink_spark.queries.pipeline import q_embed_neardup_lsh

    plan = _codegen(q_embed_neardup_lsh(spark, SF.replace("sf0.01", "sf0.001")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ann_topk_rerank_plan_is_bucket_join(spark):
    from brink_spark.queries.pipeline import q_ann_lsh_topk

    plan = _codegen(q_ann_lsh_topk(spark, SF.replace("sf0.01", "sf0.001")))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_scan_only_no_join_partial_agg(spark):
    """discount_forecast (Q6 shape) must be a pure scan+aggregate: zero
    joins, the quantity predicate pushed to the parquet scan, and the sum
    partial before its single 1-row exchange."""
    from brink_spark.queries.relational import q_discount_forecast

    df = q_discount_forecast(spark, SF)
    plan = _formatted(df)
    assert "Join" not in plan
    assert "LessThan(l_quantity,24" in plan  # pushed to the scan
    simple = _codegen(df)
    assert "partial_sum" in simple


def test_correlated_subquery_shapes_decorrelate_to_hash_plans(spark):
    """The Q2/Q17/Q20/Q21 adaptations re-express correlated subqueries as
    aggregates + hash joins/windows: no CartesianProduct anywhere, and the
    window variants (Q2, Q20) keep exchange counts at their floor instead
    of paying a second aggregate + sort-merge join-back."""
    from brink_spark.queries.relational import (
        q_dominant_suppliers,
        q_min_cost_supplier,
        q_small_qty_revenue,
        q_waiting_suppliers,
    )

    for q in (q_small_qty_revenue, q_waiting_suppliers):
        plan = _codegen(q(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    for q, max_exchanges in ((q_min_cost_supplier, 2), (q_dominant_suppliers, 3)):
        plan = _codegen(q(spark, SF))
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan
        assert plan.count("Exchange hashpartitioning") <= max_exchanges


def test_scalar_total_threshold_is_single_row_broadcast(spark):
    """important_parts (Q11 shape): the global-total threshold must enter
    as a broadcast of the 1-row aggregate (BroadcastNestedLoopJoin over a
    single-row build side is the correct scalar-subquery plan), never a
    shuffled join or a cartesian over the data."""
    from brink_spark.queries.relational import q_important_parts

    plan = _codegen(q_important_parts(spark, SF))
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_session_window_single_shuffle(spark):
    """events_session_window: native session_window must plan as
    MergingSessions over ONE user_id exchange — the follow-up per-user
    rollup reuses the same partitioning (zero extra shuffles), and the
    per-(user, session) count is partial before the exchange."""
    from brink_spark.queries.relational import q_events_session_window

    plan = _codegen(q_events_session_window(spark, SF))
    assert "MergingSessions" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
    # the rollup above the exchange is also a fused partial+final pair, so
    # check the DEEPEST partial (map-side combine) sits below the exchange
    assert plan.rindex("partial_count") > plan.index("Exchange")


def test_pivot_explicit_values_no_distinct_job(spark):
    """events_pivot: explicit pivot values mean planning launches NO eager
    distinct-scan job, and the physical plan is a two-level aggregate —
    partial counts per (user, type) collapse map-side below the first
    exchange, pivotfirst spreads at most |enum| rows per user above it."""
    from brink_spark.queries.relational import q_events_pivot

    df = q_events_pivot(spark, SF)
    plan = _codegen(df)
    assert "pivotfirst" in plan
    assert "partial_pivotfirst" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan  # pivot must not decompose into self-joins


def test_cube_is_expand_plus_single_aggregate(spark):
    """events_cube: CUBE must plan as one Expand (4 grouping-set combos)
    feeding ONE partial-then-final aggregate over ONE exchange — never one
    scan+union per grouping set."""
    from brink_spark.queries.relational import q_events_cube

    plan = _codegen(q_events_cube(spark, SF))
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1  # single scan, not per-combo
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange")


def test_hits_reads_one_column_no_cartesian(spark):
    """graph_hits: both half-rounds join on the edge key (hash joins,
    small score tables broadcast under AQE) — no cartesian/nested-loop
    anywhere, and the events scan prunes to event_id only."""
    from brink_spark.queries.relational import q_graph_hits

    plan = _codegen(q_graph_hits(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "event_id" in read and "user_id" not in read and "value" not in read


def test_triangles_degree_ordered_no_blowup(spark):
    """graph_triangles: the kernel (dense-bitset path at testdata's
    compact id space) must stay a hash-join-only plan (no cartesian /
    nested-loop) over the ONE materialized edge block — the cut blocks
    are LogicalRDD scans, never re-derived from the events scan (without
    the cuts Catalyst multiplies the source scan: observed 64 exchanges).
    The bitset kernel's exchanges are each bounded by n + m rows
    (word-mask agg, adjacency agg, two edge⋈adjacency joins, final
    per-node agg) — a fixed small count, pinned here."""
    from brink_spark.queries.relational import q_graph_triangles

    plan = _codegen(q_graph_triangles(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Scan parquet") == 0  # runs from the cut edge block
    assert plan.count("Exchange hashpartitioning") <= 6


def test_basket_pairs_copartitioned_self_join(spark):
    """basket_pairs: the self-join must be an equi-join on l_orderkey
    (co-partitioned; broadcast at test SF is fine) — never a cartesian —
    and the support count is partial before its exchange."""
    from brink_spark.queries.relational import q_basket_pairs

    plan = _codegen(q_basket_pairs(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_zscore_single_shuffle_window(spark):
    """events_zscore_outliers: window aggs without orderBy + a rollup on
    the same key must cost exactly ONE exchange — the per-user rollup
    reuses the window's hash partitioning, and the whole z-test stays in
    integer expressions (no Python UDF anywhere)."""
    from brink_spark.queries.relational import q_events_zscore_outliers

    plan = _codegen(q_events_zscore_outliers(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

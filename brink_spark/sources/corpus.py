"""Crawl store -> training-corpus bridge.

Turns a crawl's results tables into the ``documents`` shape the pipeline
operators (dedup / similarity / quality / token stats, queries/pipeline.py)
consume, so one engine covers the whole path: crawl the web -> assemble the
corpus -> clean it. All native column expressions over the span arrays:

- one row per FETCHED document (row_kind='fetched'; cached re-dispatches
  and dup edges carry no body),
- ``text``   = the document's text spans joined in document order,
- ``doc_id`` = xxhash64(url_norm) — deterministic, join-stable,
- ``lang``   = the stopword-density heuristic (en-like/other; a real
  deployment swaps in a model-based identifier at this column),
- ``n_chars``, plus provenance (url_norm, wave) and media/link span counts.

Write with ``corpus_to_dir`` and every queries/pipeline.py operator runs on
the output unchanged (they read ``{dir}/documents.parquet``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")


def corpus_from_store(spark, store_dir: str, n_waves: int) -> DataFrame:
    """documents-shaped DataFrame from waves [0, n_waves) of a crawl store."""
    res = spark.read.parquet(
        *[f"{store_dir}/results/wave={w}" for w in range(n_waves)]
    ).filter(F.col("row_kind") == "fetched")
    text = F.concat_ws(
        " ",
        F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"],
        ),
    )
    w = F.split(F.col("text"), " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    density = (
        F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))) * 100 / F.size(w)
    )
    return (
        res.select(
            F.xxhash64("url_norm").alias("doc_id"),
            text.alias("text"),
            "url_norm",
            "wave",
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("media"))).alias(
                "n_media"
            ),
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("link"))).alias(
                "n_links"
            ),
        )
        .withColumn("lang", F.when(density >= 10, "en-like").otherwise("other"))
        .withColumn("n_chars", F.length("text").cast("long"))
    )


def linkgraph_from_store(spark, store_dir: str, n_waves: int) -> DataFrame:
    """(src, dst) link-graph edges from a crawl store: every handler row's
    linked_from -> url_norm (seed rows excluded). Feed to a ranking job
    (e.g. the integer PageRank in queries/relational.py) to prioritize the
    frontier by link authority."""
    res = spark.read.parquet(
        *[f"{store_dir}/results/wave={w}" for w in range(n_waves)]
    )
    return (
        res.filter(F.col("linked_from") != "start")
        .select(F.col("linked_from").alias("src"), F.col("url_norm").alias("dst"))
        .distinct()
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int = 8,
    key: str | list[str] = "doc_id",
    path: str | None = None,
) -> None:
    """Write a DataFrame as a BUCKETED + sorted table (hash-bucketed on
    ``key``): two tables bucketed the same way join WITHOUT a shuffle —
    Catalyst sees the co-located layout and drops both exchanges (and,
    with sortBy, both sorts) from the sort-merge join. This is the
    at-rest co-location strategy for the corpus at 100 TB: dedup /
    similarity / enrichment jobs that repeatedly join on doc_id pay the
    partitioning ONCE at write time instead of per query. ``path`` makes
    the table external (data at the given location; metadata in the
    session catalog)."""
    cols = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, *cols)
        .sortBy(*cols)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def corpus_to_dir(spark, store_dir: str, n_waves: int, out_dir: str) -> int:
    """Materialize the corpus as ``{out_dir}/documents.parquet`` — the layout
    every pipeline query reads. Returns the document count."""
    df = corpus_from_store(spark, store_dir, n_waves)
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return spark.read.parquet(f"{out_dir}/documents.parquet").count()


def write_training_shards(
    df: DataFrame, out_dir: str, rows_per_shard: int = 100_000
) -> dict:
    """Deterministic training-shard export — the sink side of the
    pipeline: split a cleaned corpus into ~``rows_per_shard``-row parquet
    shards whose MEMBERSHIP is a pure function of ``doc_id``, so the same
    corpus yields byte-identical shard assignment on 4 cores or 4,000
    executors (key-hash assignment, never partition-index assignment —
    partition indices depend on parallelism; xxhash64(doc_id) does not).

    Layout: ``{out_dir}/shard=K/*.parquet`` (dir-per-shard via
    partitionBy after a repartition ON the shard key, so each shard is
    one task's single file in the common case) + ``{out_dir}/_manifest``
    (JSON: shard count, per-shard row counts, total). Returns the
    manifest dict. Per-shard row counts vary binomially around the
    target (hash assignment); exactly-equal sizing would need a global
    sort — not worth a corpus-wide shuffle for a training export."""
    import json
    import math

    total = df.count()
    n_shards = max(1, math.ceil(total / rows_per_shard))
    sharded = df.withColumn(
        "shard", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(n_shards))
    )
    (
        sharded.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    counts = {
        int(r["shard"]): int(r["count"])
        for r in spark.read.parquet(out_dir).groupBy("shard").count().collect()
    }
    manifest = {
        "n_shards": n_shards,
        "rows_per_shard_target": rows_per_shard,
        "total_rows": total,
        "shard_rows": {str(k): v for k, v in sorted(counts.items())},
    }
    with open(f"{out_dir}/_manifest", "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


DOCUMENTS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def documents_to_jsonl(df: DataFrame, out_dir: str) -> None:
    """Export a documents-shaped corpus as gzip JSONL shards — the
    interchange format most external training pipelines ingest. One
    object per line, stable column subset (DOCUMENTS_SCHEMA order);
    compression is codec-level so readers stream it anywhere."""
    df.select("doc_id", "text", "lang", "source", "n_chars").write.mode(
        "overwrite"
    ).option("compression", "gzip").json(out_dir)


def documents_from_jsonl(spark, path: str) -> DataFrame:
    """Read a JSONL corpus (plain or gzip, file/dir/glob) into the
    documents shape every queries/pipeline.py operator consumes. The
    schema is EXPLICIT — schema inference over a 100 TB corpus is a
    full extra pass and type-drifts on dirty lines; a fixed schema makes
    malformed lines null-field rows instead (filter n_chars/doc_id
    nullity upstream if the corpus is dirty). Missing n_chars is
    recomputed from text."""
    df = spark.read.schema(DOCUMENTS_SCHEMA).json(path)
    return df.withColumn(
        "n_chars",
        F.coalesce(F.col("n_chars"), F.length("text").cast("bigint")),
    )

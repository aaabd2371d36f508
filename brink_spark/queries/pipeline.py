"""Training-data pipeline operators over documents/embeddings.

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force top-k + LSH-bucketed),
text analysis (lang-id heuristic, quality scoring, token counts,
fingerprinting) and the multimodal decode stub — each with a DuckDB oracle.

Cross-engine determinism rules used throughout:
- hashes are md5 hex substrings (identical in Spark and DuckDB); a MinHash
  is the lexicographic MIN of salted md5s — a valid random-permutation
  proxy that both engines order identically (ASCII);
- float work is done in DOUBLE with explicit casts on both sides and
  either thresholded with wide margins or reduced to integer outputs;
- LSH buckets come from sign bits of stored float values — bit-exact.

Scale path notes: every operator is shuffle-minimal (one exploded-shingle
shuffle feeds all MinHash bands; LSH turns the O(n²) similarity join into
per-bucket joins; the brute-force path exists as the small-side baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from brink_spark.queries.iterate import min_label_propagate as _min_label_propagate


def _scan_row_groups(path: str) -> int | None:
    """Achievable parquet scan parallelism = total row-group count (a row
    group is the atomic split unit; maxPartitionBytes/minPartitionNum can
    only cut BETWEEN row groups). None when unknowable (non-local path)."""
    import os

    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_row_groups
        if os.path.isdir(path):
            return sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
    except Exception:
        return None
    return None


def _read_adaptive(spark, path: str) -> DataFrame:
    """Scan with adaptive parallelism (guide §2.5 synthetic-key note +
    §6 input-split sizing): the driver testdata tables are written as a
    SINGLE row group, so the scan is one task no matter the split config —
    and every downstream explode/md5/HOF/matmul in this module runs
    single-threaded until the first shuffle (measured: the whole MinHash
    pipeline on 1 of 32 cores). When the table's achievable split count is
    below the cluster's default parallelism, redistribute ONCE right after
    the scan: a few-MB round-robin exchange (columns are pruned through
    Repartition) that unlocks a 32-way explode/hash stage. The trigger is
    derived from the INPUT (row groups vs defaultParallelism), not from a
    local[32]-tuned constant: a 100 TB table has thousands of row groups,
    the condition is false, and the plan is untouched — no extra shuffle
    at scale."""
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    rg = _scan_row_groups(path)
    if rg is not None and rg < target:
        df = df.repartition(target)
    return df


def _docs(spark, sf):
    return _read_adaptive(spark, f"{sf}/documents.parquet")


def _emb(spark, sf):
    # plain scan, deliberately NOT adaptive-repartitioned: every _emb
    # consumer is a light per-row projection (sign-bit buckets, norm
    # HOFs) over a vector-count-sized table feeding an immediate
    # shuffle/join — measured +0.3-0.7 s per ann_* query from the forced
    # exchange against no downstream win (the one heavy consumer,
    # q_embed_neardup's matmul, builds its own block layout)
    return spark.read.parquet(f"{sf}/embeddings.parquet")


# --------------------------------------------------------------------------
# dedup: exact


def q_dedup_exact(spark, sf):
    d = _docs(spark, sf)
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("rep_doc_id"),
        )
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS rep_doc_id
FROM documents GROUP BY 1
"""


# --------------------------------------------------------------------------
# shingles (shared by Jaccard + MinHash): distinct word 3-grams per doc


def _shingles_of(docs: DataFrame) -> DataFrame:
    d = docs.select("doc_id", F.split("text", " ").alias("w"))
    d = d.filter(F.size("w") >= 3)
    # three element_at lookups per 3-gram instead of slice(): slice
    # allocates a fresh 3-element array per position purely to feed
    # concat_ws — dropping it halved the explode stage (measured 1.48 s
    # → 0.68 s at sf1). Same strings: concat_ws(' ', w[i..i+2]) either way.
    return d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("w", i),
                        F.element_at("w", i + 1),
                        F.element_at("w", i + 2),
                    ),
                )
            )
        ).alias("sh"),
    )


def _shingles(spark, sf) -> DataFrame:
    return _shingles_of(_docs(spark, sf))


_SQL_SHINGLES = """
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) words,
       UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3)
"""


# Document-frequency cap for similarity self-joins: a shingle present in
# df > K docs would contribute a df² partition to the shared-shingle join
# (the classic boilerplate blowup: one nav-bar 3-gram in 10⁶ docs = 10¹²
# pairs in ONE task). Ultra-frequent shingles carry no dedup signal, so
# both engines drop them identically BEFORE the self-join; at test SF the
# cap never binds (verified by test_similarity_caps), so outputs are
# unchanged — at web scale it bounds every join partition by K².
SHINGLE_DF_CAP = 50
# Same idea for LSH band buckets: a band signature shared by > cap docs
# (boilerplate-dominated band) is dropped before pairing.
BAND_BUCKET_CAP = 200


def _drop_hot_keys(df: DataFrame, keys: list[str], cap: int) -> DataFrame:
    """Skew-safe frequency cap: drop rows whose key appears > cap times.

    Two-pass form: groupBy-count (map-side partial aggregation — a hot
    key's rows pre-combine per task, so no single task ever holds its full
    df) → the over-cap key set (tiny by definition: > cap occurrences each)
    → broadcast LEFT ANTI join. The alternative window count
    (``count() over (partition by key)``) routes a hot key's ENTIRE row set
    into one task before the filter can drop it — a 10⁹-row straggler for a
    boilerplate shingle at web scale."""
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > cap)
        .select(*keys)
    )
    return df.join(F.broadcast(hot), keys, "left_anti")


def _capped_shingles(spark, sf) -> DataFrame:
    """Df-capped shingles, MATERIALIZED once (lineage cut): every consumer
    (ngram_jaccard, jaccard_prefix, containment) references this stream
    3-4 times — sizes, both self-join sides, verification — and without
    the cut Catalyst re-derives the whole explode + df-count + anti-join
    pipeline per reference (exchange reuse recovers only identical
    subtrees). Materialize-once-reuse-many is the same tradeoff the crawl
    wave loop and the label-propagation rounds already make
    (brink_spark/queries/iterate.py docstring); results are unaffected —
    checkpointing changes when a plan runs, never what it computes."""
    from brink_spark.queries.iterate import cut as _cut

    return _cut(_drop_hot_keys(_shingles(spark, sf), ["sh"], SHINGLE_DF_CAP))


_SQL_CAPPED_SHINGLES = f"""
capped AS (
  SELECT s.doc_id, s.sh FROM shingles s
  JOIN (SELECT sh FROM shingles GROUP BY sh
        HAVING COUNT(*) <= {SHINGLE_DF_CAP}) rare USING (sh))
"""


def q_dedup_ngram_jaccard(spark, sf):
    """Word-3-gram Jaccard over docs sharing ≥1 shingle; pairs with J ≥ 0.5.
    The shared-shingle prejoin is the scale trick: no all-pairs product.
    Shingles with document frequency > SHINGLE_DF_CAP are dropped on both
    engines before the self-join (hot-key bound; see cap note above)."""
    sh = _capped_shingles(spark, sf)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # filter on the UNROUNDED ratio (matching the oracle's WHERE clause);
    # rounding happens only on the emitted column — otherwise a pair with
    # true J in [0.49995, 0.5) would pass here but fail the oracle
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "_j_raw",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("_j_raw") >= 0.5)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.round("_j_raw", 4).alias("jaccard"),
        )
    )


SQL_NGRAM_JACCARD = f"""
WITH {_SQL_SHINGLES},
{_SQL_CAPPED_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter,
       ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
"""


def q_dedup_jaccard_prefix(spark, sf):
    """Jaccard ≥ 0.5 pairs via PREFIX FILTERING (PPJoin family: Chaudhuri
    et al. ICDE'06 / Xiao et al. WWW'08) — same output contract as
    q_dedup_ngram_jaccard (the oracle is literally the same SQL), but the
    self-join touches only each doc's PREFIX: order every doc's shingles
    by a global total order (document frequency asc, then shingle — rare
    tokens first), keep the first |d| - ceil(t·|d|) + 1; two docs with
    J ≥ t MUST share a prefix token under any common total order, so the
    candidate join is provably lossless while skipping the frequent tail
    where most of the quadratic blowup lives. A length filter
    (min(|a|,|b|) ≥ t·max(|a|,|b|), a Jaccard necessary condition) prunes
    candidates before verification; exact intersection counts are then
    computed only for surviving pairs. At scale: the df-rank join reuses
    the shingle-keyed shuffle topology; per-doc ordering is a window
    partitioned by doc_id (bounded by doc length, never by corpus);
    verification joins are candidate-driven, proportional to candidate
    count not corpus²."""
    t = 0.5
    sh = _capped_shingles(spark, sf)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    wdoc = Window.partitionBy("doc_id")
    ranked = (
        sh.join(dfreq, "sh")
        .withColumn("pos", F.row_number().over(wdoc.orderBy("df", "sh")))
        .withColumn("n_sh", F.count(F.lit(1)).over(wdoc))
    )
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh") - F.ceil(F.col("n_sh") * t) + 1
    ).select("doc_id", "sh", "n_sh")
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # length filter: J >= t forces min >= t * max
            & (
                F.least("a.n_sh", "b.n_sh")
                >= F.greatest("a.n_sh", "b.n_sh") * t
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .distinct()
    )
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        cand.join(x, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            y,
            (F.col("y.doc_id") == F.col("doc_b"))
            & (F.col("y.sh") == F.col("x.sh")),
        )
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # same boundary discipline as q_dedup_ngram_jaccard: filter on the
    # unrounded ratio (the oracle's WHERE clause), round only the output
    return (
        inter.withColumn(
            "_j_raw",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("_j_raw") >= t)
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.round("_j_raw", 4).alias("jaccard"),
        )
    )


def _lsh_band_sig(sh: DataFrame) -> DataFrame:
    """(doc_id, sh) shingles → (doc_id, band, mh) LSH band signatures,
    b=4 bands × r=2 rows. The reusable core of q_dedup_minhash_lsh —
    also the WRITE path of the incremental-ingest signature store
    (write_signature_store), so the store and the self-contained query
    can never drift.

    One-pass form (guide §2.3, aggregate before you shuffle / shuffle
    fewer bytes): the 8 permutation minima are 8 MIN aggregates over the
    SAME shingle rows, so they ride ONE groupBy(doc_id) as 8 aggregation
    buffers instead of a broadcast-crossJoin that materializes 8× the
    shingle rows and then needs a second groupBy to band them. Same md5
    evaluations (8 per shingle), same results (min per perm, band b =
    concat of perms 2b, 2b+1 — exactly the old even/odd concat), but the
    exploded-shingle stream is aggregated once and never multiplied; the
    4 band rows per doc come from a doc-count-sized explode."""
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat(F.lit(f"{p}|"), F.col("sh"))), 1, 12)
            ).alias(f"_mh{p}")
            for p in range(8)
        ]
    )
    return mins.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("int").alias("band"),
                        F.concat(
                            F.col(f"_mh{2 * b}"), F.col(f"_mh{2 * b + 1}")
                        ).alias("mh"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("_bm"),
    ).select("doc_id", F.col("_bm.band").alias("band"), F.col("_bm.mh").alias("mh"))


def q_dedup_minhash_lsh(spark, sf):
    """MinHash + LSH banding, b=4 bands × r=2 rows (8 independent
    permutation proxies): a band's signature is the concat of its two rows'
    min-hashes, so docs pair only when BOTH rows agree — the textbook
    (1/b)^(1/r) = 0.5 Jaccard threshold, matching q_dedup_ngram_jaccard's
    0.5 cut. Permutation proxy = lexicographic min of salted md5(shingle),
    engine-identical (ASCII order). One exploded-shingle shuffle feeds all
    8 permutations; banding needs no extra shuffle (same doc_id key)."""
    sig = _lsh_band_sig(_shingles(spark, sf))
    # band-bucket cap: a (band, mh) bucket with > BAND_BUCKET_CAP members is
    # boilerplate-dominated — drop it before the quadratic in-bucket pairing
    # (same predicate in the oracle; never binds at test SF). Skew-safe
    # two-pass form: partial-agg count → broadcast anti-join of hot buckets.
    sig = _drop_hot_keys(sig, ["band", "mh"], BAND_BUCKET_CAP)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.mh") == F.col("b.mh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# shared CTE text: the MinHash/LSH signature pipeline (used by the pair
# query and by the near-dup clustering query below)
_SQL_MINHASH_CTES = f"""
mins AS (
  SELECT doc_id, p.perm,
         MIN(substr(md5(CAST(p.perm AS VARCHAR) || '|' || sh), 1, 12)) AS mh
  FROM shingles
  CROSS JOIN (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) AS p(perm)
  GROUP BY doc_id, p.perm),
sig0 AS (
  SELECT doc_id, CAST(perm // 2 AS INT) AS band,
         MAX(CASE WHEN perm % 2 = 0 THEN mh END)
         || MAX(CASE WHEN perm % 2 = 1 THEN mh END) AS mh
  FROM mins GROUP BY doc_id, perm // 2),
sig AS (
  SELECT s.* FROM sig0 s
  JOIN (SELECT band, mh FROM sig0 GROUP BY band, mh
        HAVING COUNT(*) <= {BAND_BUCKET_CAP}) small USING (band, mh))
"""

SQL_MINHASH_LSH = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_CTES}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
"""


def _is_new_batch(col):
    # Deterministic engine-identical 3/16 "today's crawl" split: first hex
    # digit of md5(doc_id) — both engines emit lowercase hex.
    return F.substring(F.md5(col.cast("string")), 1, 1).isin("0", "1", "2")


def q_dedup_incremental(spark, sf):
    """Incremental ingest dedup — the shape a production pipeline actually
    runs daily: near-dup-match only the NEW batch against the existing
    corpus, never re-cluster the whole corpus. Docs are split
    deterministically (md5 first hex digit: ~3/16 are "today's batch");
    output is each batch doc with its count of corpus near-dup matches
    (MinHash-LSH pairs crossing the split — batch-internal and
    corpus-internal pairs are excluded on both engines).

    At scale the corpus side's band signatures are NOT recomputed per
    ingest: they live precomputed in the corpus store, bucketed by
    (band, mh) (sources/corpus.py bucketed writes), so the probe is a
    bucket-local join proportional to the BATCH size — the corpus is
    touched only on matching buckets. Here both sides derive from one
    table so the oracle can check the exact same pair set."""
    pairs = q_dedup_minhash_lsh(spark, sf)
    tagged = pairs.withColumn("a_new", _is_new_batch(F.col("doc_a"))).withColumn(
        "b_new", _is_new_batch(F.col("doc_b"))
    )
    crossing = tagged.filter(F.col("a_new") != F.col("b_new"))
    return (
        crossing.select(
            F.when(F.col("a_new"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("batch_doc")
        )
        .groupBy("batch_doc")
        .agg(F.count(F.lit(1)).alias("n_corpus_dups"))
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
tagged AS (
  SELECT doc_a, doc_b,
         substr(md5(CAST(doc_a AS VARCHAR)), 1, 1) IN ('0', '1', '2') AS a_new,
         substr(md5(CAST(doc_b AS VARCHAR)), 1, 1) IN ('0', '1', '2') AS b_new
  FROM pairs)
SELECT CASE WHEN a_new THEN doc_a ELSE doc_b END AS batch_doc,
       COUNT(*) AS n_corpus_dups
FROM tagged WHERE a_new <> b_new GROUP BY 1
"""


def write_signature_store(spark, sf, table: str, path: str, buckets: int = 8):
    """Materialize the CORPUS side of the incremental-ingest dedup as a
    bucketed signature store: (doc_id, band, mh) band signatures of every
    non-batch document, hash-bucketed + sorted on (band, mh) via
    write_bucketed (sources/corpus.py). Written ONCE per corpus epoch;
    every nightly ingest then probes it without recomputing a single
    corpus signature — the at-rest co-location half of
    q_dedup_incremental's documented scale path."""
    from brink_spark.sources.corpus import write_bucketed

    corpus_docs = _docs(spark, sf).filter(~_is_new_batch(F.col("doc_id")))
    sig = _lsh_band_sig(_shingles_of(corpus_docs))
    write_bucketed(sig, table, buckets=buckets, key=["band", "mh"], path=path)


def probe_incremental(spark, sf, table: str) -> DataFrame:
    """Incremental-ingest probe against a pre-written signature store:
    compute band signatures for the NEW batch only, then match them to
    the bucketed corpus store. The corpus side never shuffles:

    - store ⋉ batch bucket-keys is a broadcast semi-join (the batch's
      distinct (band, mh) set is ingest-sized), so the store scan feeds
      the match directly — no Exchange, and at scale bucket pruning
      reads only matching buckets;
    - the bucket cap (q_dedup_minhash_lsh's boilerplate guard) is
      enforced with store-side counts aggregated ON the bucket
      partitioning (bucketed groupBy — again no Exchange) plus batch-side
      counts, so capped buckets drop exactly as in the self-contained
      query (equality asserted in tests/test_incremental_bucketed.py).

    Returns the same (batch_doc, n_corpus_dups) frame as
    q_dedup_incremental without touching corpus text or shingles."""
    batch_docs = _docs(spark, sf).filter(_is_new_batch(F.col("doc_id")))
    batch_sig = _lsh_band_sig(_shingles_of(batch_docs))
    store = spark.table(table)

    keys = batch_sig.select("band", "mh").distinct()
    hits = store.join(F.broadcast(keys), ["band", "mh"], "inner")

    # cap on TOTAL bucket membership (corpus + batch), as the
    # self-contained query counts it over the unified sig table
    store_n = hits.groupBy("band", "mh").agg(F.count(F.lit(1)).alias("_ns"))
    batch_n = batch_sig.groupBy("band", "mh").agg(F.count(F.lit(1)).alias("_nb"))
    hot = (
        store_n.join(batch_n, ["band", "mh"])
        .filter(F.col("_ns") + F.col("_nb") > BAND_BUCKET_CAP)
        .select("band", "mh")
    )
    hits = hits.join(F.broadcast(hot), ["band", "mh"], "left_anti")
    batch_ok = batch_sig.join(F.broadcast(hot), ["band", "mh"], "left_anti")

    pairs = (
        batch_ok.select("band", "mh", F.col("doc_id").alias("batch_doc"))
        .join(
            hits.select("band", "mh", F.col("doc_id").alias("corpus_doc")),
            ["band", "mh"],
        )
        .select("batch_doc", "corpus_doc")
        .distinct()
    )
    return pairs.groupBy("batch_doc").agg(
        F.count(F.lit(1)).alias("n_corpus_dups")
    )


def q_dedup_simhash(spark, sf):
    """16-bit SimHash over distinct tokens: per bit, majority vote of the
    token-hash bits (md5 nibbles via strpos — engine-identical)."""
    d = _docs(spark, sf)
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).filter(F.col("tok") != "")
    toks = toks.withColumn("h4", F.substring(F.md5("tok"), 1, 4))
    bits = spark.range(16).select(F.col("id").cast("int").alias("bit"))
    per_bit = (
        toks.crossJoin(F.broadcast(bits))
        .withColumn(
            "nib",
            F.expr(
                "instr('0123456789abcdef', substring(h4, cast(bit / 4 as int) + 1, 1)) - 1"
            ),
        )
        .withColumn("bitval", F.expr("cast((nib >> (bit % 4)) & 1 as int)"))
        .groupBy("doc_id", "bit")
        .agg(F.sum(F.when(F.col("bitval") == 1, 1).otherwise(-1)).alias("score"))
    )
    return (
        per_bit.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("score") > 0, F.expr("cast(pow(2, bit) as bigint)")).otherwise(
                    F.lit(0)
                )
            ).alias("simhash16")
        )
    )


SQL_SIMHASH = """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM
    (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
h AS (SELECT doc_id, substr(md5(tok), 1, 4) AS h4 FROM toks),
per_bit AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN ((strpos('0123456789abcdef',
                                substr(h4, (b.bit // 4) + 1, 1)) - 1)
                        >> (b.bit % 4)) & 1 = 1
                  THEN 1 ELSE -1 END) AS score
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS bit) b
  GROUP BY doc_id, b.bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN score > 0 THEN CAST(POW(2, bit) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash16
FROM per_bit GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# embeddings: near-dup + similarity search


def _emb_double(spark, sf):
    return _emb(spark, sf).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )


_DOT = "aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate(transform(e, x -> x * x), 0D, (acc, v) -> acc + v))"


EMBED_NEARDUP_MAX_ROWS = 2_000_000  # ~1 GB broadcast at 64-d float64


def q_embed_neardup(spark, sf):
    """All-pairs cosine ≥ 0.45: broadcast-block numpy matmul via
    mapInPandas — each task computes its row-block against the broadcast
    matrix (Arrow-batched, BLAS-backed). This is the SMALL-SIDE BASELINE:
    it collects the table once to build the broadcast matrix, so it is
    guarded to fail fast past EMBED_NEARDUP_MAX_ROWS rather than OOM the
    driver — ``q_embed_neardup_lsh`` below is the default near-dup path at
    scale (nothing collected, bucket-bounded joins). Double precision:
    float32 inputs are exact in float64, so the ~1e-13 summation-order
    error is nowhere near the 0.45 threshold for any pair."""
    import numpy as np

    # guard + broadcast-matrix build read the RAW scan (no repartition —
    # a single-task read is exactly right for a driver-bound collect);
    # the distributed row-block side below uses the parallel reader
    raw = spark.read.parquet(f"{sf}/embeddings.parquet")
    # fail-fast guard: LIMIT cap+1 keeps the probe O(cap), not a full count
    if raw.limit(EMBED_NEARDUP_MAX_ROWS + 1).count() > EMBED_NEARDUP_MAX_ROWS:
        raise ValueError(
            f"q_embed_neardup collects the embedding table to the driver and "
            f"is capped at {EMBED_NEARDUP_MAX_ROWS} rows; use "
            f"q_embed_neardup_lsh (the distributed LSH path) at this scale"
        )
    # row-block side: a FEW large blocks, not one per core — each block's
    # matmul is BLAS-batched (guide §4.2: keep batches large), so 8 blocks
    # already saturate the arithmetic while cutting the Python-worker
    # count the stage must fork when the 1-minute idle cull has emptied
    # the pool (worker creation is serialized in the JVM factory; see
    # brink_spark/pydaemon.py). Derived from defaultParallelism, capped.
    e = raw.repartition(min(8, spark.sparkContext.defaultParallelism))
    # driver transfer via Arrow (guide §6: toPandas with
    # arrow.pyspark.enabled is orders of magnitude faster than the
    # pickled-Row collect path — measured 12 s → <1 s for 20k×64 floats);
    # only to build the broadcast matrix, the scan side stays distributed
    pdf_all = raw.select("vec_id", "embedding").toPandas()
    ids = pdf_all["vec_id"].to_numpy(dtype=np.int64)
    mat = np.array(list(pdf_all["embedding"]), dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    sc = spark.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)
    b_nrm = sc.broadcast(nrm)

    def _block(batches):
        import pandas as pd

        B, Bn, Bi = b_mat.value, b_nrm.value, b_ids.value
        for pdf in batches:
            A = np.array(list(pdf["embedding"]), dtype=np.float64)
            An = np.sqrt((A * A).sum(axis=1))
            Ai = pdf["vec_id"].to_numpy()
            # same arithmetic as before (one divide by the norm PRODUCT —
            # bit-identical to the oracle's dot/(na*nb)), but in place:
            # the old `(A @ B.T) / np.outer(...)` held three block-sized
            # matrices live per task, this holds two
            cos = A @ B.T
            cos /= An[:, None] * Bn[None, :]
            ii, jj = np.where(cos >= 0.45)
            keep = Ai[ii] < Bi[jj]
            yield pd.DataFrame(
                {
                    "vec_a": Ai[ii][keep],
                    "vec_b": Bi[jj][keep],
                    "cos_r": np.round(cos[ii, jj][keep], 4),
                }
            )

    return e.select("vec_id", "embedding").mapInPandas(
        _block, schema="vec_a long, vec_b long, cos_r double"
    )


_SQL_DOT = """
(SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
 FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y))
"""
_SQL_NRM = """
(SELECT SQRT(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
 FROM (SELECT unnest(embedding) AS x))
"""

SQL_EMBED_NEARDUP = f"""
WITH n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({_SQL_DOT} / (a.nrm * b.nrm), 4) AS cos_r
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE {_SQL_DOT} / (a.nrm * b.nrm) >= 0.45
"""


def _bucket_col(offset: int):
    """8-bit random-hyperplane proxy: sign bits of dims offset, offset+8, ...
    (1-indexed; bit-exact across engines). Distinct offsets give independent
    tables for the OR-construction. At web scale, raise bits per table so
    expected bucket population n/2^bits stays bounded (the knob, not the
    code, changes)."""
    return sum(
        F.when(F.element_at("embedding", k * 8 + offset) >= 0, F.lit(1 << k)).otherwise(
            F.lit(0)
        )
        for k in range(8)
    )


def _sql_bucket(offset: int) -> str:
    return " + ".join(
        f"(CASE WHEN embedding[{k * 8 + offset}] >= 0 THEN {1 << k} ELSE 0 END)"
        for k in range(8)
    )


def q_embed_neardup_lsh(spark, sf):
    """The SCALE path for thresholded embedding near-dup (the broadcast
    q_embed_neardup is the small-side baseline): 2-table LSH OR-construction
    (sign-bit buckets over two disjoint dim sets) generates candidates as
    per-bucket equi-joins — no all-pairs product, nothing collected to the
    driver — then an exact-cosine re-rank keeps pairs >= 0.45. Every
    reported pair is exact (soundness = brute force on the candidate set);
    recall is the OR of two independent 8-bit tables. Candidate id-pairs,
    not vectors, flow through the union+distinct shuffle; vectors are
    re-joined only for the re-rank."""
    e = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    eb = _emb(spark, sf).select(
        "vec_id", _bucket_col(1).alias("b0"), _bucket_col(5).alias("b1")
    )
    cands = None
    for t in ("b0", "b1"):
        a = eb.alias("a")
        b = eb.alias("b")
        p = a.join(
            b,
            (F.col(f"a.{t}") == F.col(f"b.{t}")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    va = e.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    vb = e.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", F.expr(dot) / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= 0.45)
        .select("vec_a", "vec_b", F.round("cosine", 4).alias("cos_r"))
    )


SQL_EMBED_NEARDUP_LSH = f"""
WITH n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
eb AS (SELECT vec_id, {_sql_bucket(1)} AS b0, {_sql_bucket(5)} AS b1 FROM embeddings),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM eb x JOIN eb y ON (x.b0 = y.b0 OR x.b1 = y.b1) AND x.vec_id < y.vec_id)
SELECT vec_a, vec_b, ROUND({_SQL_DOT} / (a.nrm * b.nrm), 4) AS cos_r
FROM cand JOIN n a ON a.vec_id = vec_a JOIN n b ON b.vec_id = vec_b
WHERE {_SQL_DOT} / (a.nrm * b.nrm) >= 0.45
"""


def q_ann_bruteforce_topk(spark, sf):
    """Brute-force cosine top-5 for query vectors vec_id < 10 (rank by
    (cosine DESC, vec_id) — deterministic tie-break)."""
    e = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    q = e.filter(F.col("vec_id") < 10).alias("a")
    c = e.alias("b")
    scored = (
        q.join(c, F.col("a.vec_id") != F.col("b.vec_id"))
        .withColumn("cosine", F.expr(_DOT) / (F.col("a.nrm") * F.col("b.nrm")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


SQL_ANN_TOPK = f"""
WITH n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_SQL_DOT} / (a.nrm * b.nrm) AS cosine
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 10)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


def q_ann_lsh_buckets(spark, sf):
    """LSH-bucketed candidate generation: 8-bit random-hyperplane proxy from
    sign bits of dims 0,8,...,56 (bit-exact across engines). The scale path:
    the O(n²) join becomes per-bucket joins."""
    e = _emb(spark, sf)
    bucket = sum(
        F.when(F.element_at("embedding", k * 8 + 1) >= 0, F.lit(1 << k)).otherwise(
            F.lit(0)
        )
        for k in range(8)
    )
    eb = e.select("vec_id", bucket.alias("bucket"))
    a = eb.alias("a")
    b = eb.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.bucket").alias("bucket"),
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
    )
    return pairs


_SQL_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{k * 8 + 1}] >= 0 THEN {1 << k} ELSE 0 END)"
    for k in range(8)
)

SQL_ANN_LSH = f"""
WITH eb AS (SELECT vec_id, {_SQL_BUCKET} AS bucket FROM embeddings)
SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b
FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
"""


def q_ann_lsh_topk(spark, sf):
    """The full ANN scale pipeline: multi-table LSH candidate generation
    (2-table OR-construction) -> exact-cosine RE-RANK -> top-5 per query
    (queries = vec_id < 10; rank by cosine DESC, neighbor_id). This is what
    replaces q_ann_bruteforce_topk at 100 TB: per-bucket joins instead of
    the O(n*q) cross score, exactness restored on the candidate set by the
    re-rank stage."""
    e = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    eb = _emb(spark, sf).select(
        "vec_id", _bucket_col(1).alias("b0"), _bucket_col(5).alias("b1")
    )
    q = eb.filter(F.col("vec_id") < 10)
    cands = None
    for t in ("b0", "b1"):
        a = q.alias("a")
        b = eb.alias("b")
        p = a.join(
            b,
            (F.col(f"a.{t}") == F.col(f"b.{t}"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        ).select(
            F.col("a.vec_id").alias("query_id"), F.col("b.vec_id").alias("neighbor_id")
        )
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.distinct()
    va = e.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    vb = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    scored = (
        cands.join(va, "query_id")
        .join(vb, "neighbor_id")
        .withColumn("cosine", F.expr(dot) / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


SQL_ANN_LSH_TOPK = f"""
WITH n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
eb AS (SELECT vec_id, {_sql_bucket(1)} AS b0, {_sql_bucket(5)} AS b1 FROM embeddings),
cand AS (
  SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
  FROM eb x JOIN eb y ON (x.b0 = y.b0 OR x.b1 = y.b1) AND x.vec_id <> y.vec_id
  WHERE x.vec_id < 10),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_DOT} / (a.nrm * b.nrm) AS cosine
  FROM cand JOIN n a ON a.vec_id = query_id JOIN n b ON b.vec_id = neighbor_id)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


def q_ann_ivf_topk(spark, sf):
    """IVF-style ANN, the other scale path next to LSH: assign every vector
    to its nearest of 16 centroids (inverted lists), queries probe their
    nprobe=2 nearest lists, exact-cosine re-rank to top-5. Centroids are a
    deterministic selection (vec_id < 16) standing in for offline k-means —
    training is out of scope for an oracle-checked query; the
    assign/probe/re-rank dataflow is the production IVF shape (at scale:
    centroids broadcast, one shuffle on cent_id to build lists, probe join
    touches nprobe/nlist of the data instead of all of it)."""
    e = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    cents = e.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )
    dotc = "aggregate(zip_with(e, ce, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "ccos", F.expr(dotc) / (F.col("nrm") * F.col("cn"))
    )
    wv = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.col("cent_id"))
    ranked = scored.withColumn("crank", F.row_number().over(wv))
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    probes = (
        ranked.filter((F.col("vec_id") < 10) & (F.col("crank") <= 2))
        .select(F.col("vec_id").alias("query_id"), "cent_id")
    )
    cands = (
        probes.join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    va = e.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    vb = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    scored2 = (
        cands.join(va, "query_id")
        .join(vb, "neighbor_id")
        .withColumn("cosine", F.expr(dot) / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored2.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


_SQL_DOTC = """
(SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
 FROM (SELECT unnest(v.embedding) AS x, unnest(c.embedding) AS y))
"""

SQL_ANN_IVF_TOPK = f"""
WITH n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
ranked AS (
  SELECT v.vec_id, c.vec_id AS cent_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {_SQL_DOTC} / (v.nrm * c.nrm) DESC,
                                     c.vec_id) AS crank
  FROM n v CROSS JOIN n c WHERE c.vec_id < 16),
assign AS (SELECT vec_id, cent_id FROM ranked WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, cent_id FROM ranked
           WHERE vec_id < 10 AND crank <= 2),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (cent_id)
  WHERE p.query_id <> a.vec_id),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_DOT} / (a.nrm * b.nrm) AS cosine
  FROM cand JOIN n a ON a.vec_id = query_id JOIN n b ON b.vec_id = neighbor_id)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
# IVF with TRAINED centroids: integer-exact Lloyd k-means
#
# q_ann_ivf_topk stands in hash-derived seed centroids for the offline
# training pass; production IVF trains the coarse quantizer (k-means‖).
# This variant runs the training FOR REAL and stays hash-gateable by
# making every training step bit-deterministic across Spark, the Python
# driver, and the DuckDB oracle:
#   * vectors NORMALIZED then quantized: q_i = floor(x_i/‖x‖ * 1000 + 0.5).
#     Normalizing first aligns the training metric with the search metric
#     (squared L2 on the unit sphere is monotone in cosine: ‖u−v‖² =
#     2−2cos), so lists partition by DIRECTION, not magnitude — without it
#     Lloyd collapses by vector norm (measured: max list 53/135 vs 13/135,
#     recall 0.70 vs 0.80 at equal nprobe on the planted fixture). Every
#     step is the same IEEE double sequence on all three engines: squares
#     of float32 values are exact in float64, the norm is the same
#     left-fold sum + sqrt, and /‖x‖ * 1000 + 0.5 associates identically
#     ((x/n)*1000)+0.5 in both expression syntaxes; floor of the shared
#     double is therefore the same int64 everywhere (zero vectors map to
#     the zero code via the same CASE guard on both sides).
#   * assignment metric = exact int64 squared L2, ties to lower cent_id;
#   * centroid update = round-half-up mean floor((2*S + n) / (2*n)):
#     S, n exact int64 sums (order-independent), the one double division
#     has exactly-representable operands, so FLOOR agrees everywhere.
# Scale shape: per iteration one broadcast of the K×D int matrix (16×64
# longs ≈ 8 KiB), one scan with a K-way codegen distance fold, one
# partial-agg groupBy(cent_id) of D sums — only K×(D+1) longs ever reach
# the driver (the cookie-jar bounded-state precedent, plans/crawl.py).
# The fact table is scanned ITERS+1 times and shuffled only by cent_id.


IVF_KMEANS_K = 16
IVF_KMEANS_ITERS = 3
IVF_KMEANS_NPROBE = 2
EMB_DIM = 64
_QUANT = 1000


def _qvec(col="embedding"):
    """Normalize-then-quantize as a single Catalyst expression (self-
    contained so the norm travels with the transform; recomputing the
    64-term fold per element is ~4k flops/row — codegen noise)."""
    nrm = (
        f"sqrt(aggregate(transform({col},"
        " x -> cast(x as double) * cast(x as double)),"
        " 0D, (acc, v) -> acc + v))"
    )
    return F.expr(
        f"transform({col}, x -> cast(floor(case when {nrm} = 0D then 0D"
        f" else cast(x as double) / {nrm} * {float(_QUANT)}D + 0.5D end)"
        " as bigint))"
    )


def _ivf_kmeans_train(spark, e):
    """Lloyd iterations over quantized vectors; returns {cent_id: [int]*D}.

    e: DataFrame(vec_id long, qv array<long>). Driver state is K×(D+1)
    longs per iteration — bounded, never O(rows)."""
    import math

    cents = {
        r["vec_id"]: list(r["qv"])
        for r in e.filter(F.col("vec_id") < IVF_KMEANS_K).collect()
    }
    d2 = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    for _ in range(IVF_KMEANS_ITERS):
        cdf = spark.createDataFrame(
            [(cid, cv) for cid, cv in sorted(cents.items())],
            "cent_id long, cv array<long>",
        )
        w = Window.partitionBy("vec_id").orderBy("d2", "cent_id")
        assigned = (
            e.crossJoin(F.broadcast(cdf))
            .withColumn("d2", d2)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        sums = [
            F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(EMB_DIM)
        ]
        stats = assigned.groupBy("cent_id").agg(
            *sums, F.count(F.lit(1)).alias("n")
        ).collect()
        for r in stats:  # empty clusters keep their previous centroid
            n = r["n"]
            cents[r["cent_id"]] = [
                math.floor((2 * r[f"s{i}"] + n) / (2 * n)) for i in range(EMB_DIM)
            ]
    return cents


def q_ann_ivf_kmeans_topk(spark, sf):
    """IVF top-5 with a TRAINED coarse quantizer: 3 integer-exact Lloyd
    iterations from the vec_id<16 seeds, then the standard IVF dataflow —
    assign every vector to its nearest trained centroid (squared-L2 on the
    quantized ints, the training metric), queries (vec_id<10) probe their
    nprobe=2 nearest lists, exact double-cosine re-rank to top-5. Every
    pre-re-rank comparison is int64-exact, so the whole plan is
    hash-gateable. Recall contract (tests/test_pipeline_scale.py): on
    CLUSTERED data — the regime IVF training exists for — the trained
    quantizer beats the seed-centroid variant at equal nprobe (measured
    1.00 vs 0.68); on isotropic data random seeds are already near-optimal
    centroids, so the contract there is a recall floor plus balanced lists
    at comparable candidate cost, not dominance."""
    e = _emb(spark, sf).select("vec_id", _qvec().alias("qv"))
    cents = _ivf_kmeans_train(spark, e)
    cdf = spark.createDataFrame(
        [(cid, cv) for cid, cv in sorted(cents.items())],
        "cent_id long, cv array<long>",
    )
    d2 = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )
    wv = Window.partitionBy("vec_id").orderBy("d2", "cent_id")
    ranked = (
        e.crossJoin(F.broadcast(cdf))
        .withColumn("d2", d2)
        .withColumn("crank", F.row_number().over(wv))
    )
    assign = ranked.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    probes = ranked.filter(
        (F.col("vec_id") < 10) & (F.col("crank") <= IVF_KMEANS_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    cands = (
        probes.join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    ed = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    va = ed.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    vb = ed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    scored = (
        cands.join(va, "query_id")
        .join(vb, "neighbor_id")
        .withColumn("cosine", F.expr(dot) / (F.col("na") * F.col("nb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


def _sql_ivf_kmeans() -> str:
    """Unrolled-iteration DuckDB mirror of the integer-exact Lloyd loop."""
    d2 = (
        "(SELECT SUM((x - y) * (x - y))"
        " FROM (SELECT unnest(v.qv) AS x, unnest(c.cv) AS y))"
    )

    def assign_cte(name, prev):
        return f"""{name} AS (
  SELECT vec_id, qv, cent_id FROM (
    SELECT v.vec_id, v.qv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {d2} ASC, c.cent_id ASC) AS rn
    FROM q v CROSS JOIN {prev} c) WHERE rn = 1)"""

    def update_cte(name, prev, a):
        return f"""{name} AS (
  SELECT p.cent_id, COALESCE(u.cv, p.cv) AS cv FROM {prev} p LEFT JOIN (
    SELECT cent_id, list(cval ORDER BY p) AS cv FROM (
      SELECT cent_id, p,
             CAST(FLOOR((2.0 * SUM(qv[p]) + COUNT(*)) / (2.0 * COUNT(*)))
                  AS BIGINT) AS cval
      FROM {a} CROSS JOIN pos GROUP BY cent_id, p) GROUP BY cent_id
  ) u USING (cent_id))"""

    ctes = [
        f"pos AS (SELECT unnest(generate_series(1, {EMB_DIM})) AS p)",
        f"""q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(FLOOR(CASE WHEN nrm = 0 THEN 0
                           ELSE CAST(x AS DOUBLE) / nrm * {float(_QUANT)} + 0.5
                           END) AS BIGINT)) AS qv
  FROM (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings))""",
        f"c0 AS (SELECT vec_id AS cent_id, qv AS cv FROM q WHERE vec_id < {IVF_KMEANS_K})",
    ]
    for t in range(1, IVF_KMEANS_ITERS + 1):
        ctes.append(assign_cte(f"a{t}", f"c{t - 1}"))
        ctes.append(update_cte(f"c{t}", f"c{t - 1}", f"a{t}"))
    T = IVF_KMEANS_ITERS
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
rankedf AS (
  SELECT v.vec_id, c.cent_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY {d2} ASC, c.cent_id ASC) AS crank
  FROM q v CROSS JOIN c{T} c),
assign AS (SELECT vec_id, cent_id FROM rankedf WHERE crank = 1),
probes AS (SELECT vec_id AS query_id, cent_id FROM rankedf
           WHERE vec_id < 10 AND crank <= {IVF_KMEANS_NPROBE}),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a USING (cent_id)
  WHERE p.query_id <> a.vec_id),
n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_DOT} / (a.nrm * b.nrm) AS cosine
  FROM cand JOIN n a ON a.vec_id = query_id JOIN n b ON b.vec_id = neighbor_id)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


SQL_ANN_IVF_KMEANS_TOPK = _sql_ivf_kmeans()


# --------------------------------------------------------------------------
# Product Quantization + ADC scan: the memory-bounded ANN path
#
# IVF bounds the SCAN (probe a few lists); PQ bounds the MEMORY: each
# vector is stored as PQ_M=4 one-byte codes instead of 64 floats (64×
# compression), and queries scan the code table with an Asymmetric
# Distance Computation lookup — approx_d2(q, v) = Σ_s LUT_q[s][code_v[s]]
# where LUT_q is the query's precomputed distance from each sub-centroid.
# At 100 TB this is THE layout that fits an exhaustive ANN scan in
# executor memory: the broadcast side is queries×M×K lookup longs, the
# scan side reads only the M-byte codes (column-pruned off the raw
# embeddings), and the whole ranking is one broadcast-join + partial-agg
# sum — no shuffle of vector data at all. Re-rank then touches only
# PQ_CAND rows per query.
#
# Training reuses the integer-exact Lloyd kernel on normalize-then-
# quantized vectors, run JOINTLY for all M subspaces in one Spark job per
# iteration (sub_id rides the group key), so the hash-gate argument is
# identical to ann_ivf_kmeans_topk: every pre-re-rank comparison is
# int64-exact on all three engines. Recall at the operating point
# (M=4, K=16, CAND=30) is pinned by tests/test_pipeline_scale.py:
# ≥0.8 isotropic / ≥0.95 clustered (numpy mirror: 0.86 / 1.00).


PQ_M = 4
PQ_SUBDIM = 16
PQ_K = 16
PQ_ITERS = 3
PQ_CAND = 30


def _pq_subvecs(spark, sf):
    """(vec_id, sub_id, sqv): normalize-quantized vectors split into PQ_M
    contiguous PQ_SUBDIM-wide subspaces."""
    e = _emb(spark, sf).select("vec_id", _qvec().alias("qv"))
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub_id"),
                F.slice("qv", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sqv"),
            )
            for s in range(PQ_M)
        ]
    )
    return e.select("vec_id", F.explode(pairs).alias("s")).select(
        "vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.sqv").alias("sqv")
    )


def _pq_d2():
    return F.expr(
        "aggregate(zip_with(sqv, cv, (x, y) -> (x - y) * (x - y)),"
        " 0L, (acc, v) -> acc + v)"
    )


def _pq_train(spark, sv):
    """Joint Lloyd over all PQ_M sub-codebooks: one broadcast join + one
    partial-agg groupBy per iteration covers every subspace (sub_id is
    just another group key). Driver state: M×K×(SUBDIM+1) longs."""
    import math

    cents = {
        (r["sub_id"], r["vec_id"]): list(r["sqv"])
        for r in sv.filter(F.col("vec_id") < PQ_K).collect()
    }
    for _ in range(PQ_ITERS):
        cdf = spark.createDataFrame(
            [(s, c, cv) for (s, c), cv in sorted(cents.items())],
            "sub_id int, cent_id long, cv array<long>",
        )
        w = Window.partitionBy("vec_id", "sub_id").orderBy("d2", "cent_id")
        assigned = (
            sv.join(F.broadcast(cdf), "sub_id")
            .withColumn("d2", _pq_d2())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        sums = [
            F.sum(F.element_at("sqv", i + 1)).alias(f"s{i}")
            for i in range(PQ_SUBDIM)
        ]
        stats = (
            assigned.groupBy("sub_id", "cent_id")
            .agg(*sums, F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in stats:  # empty sub-clusters keep their previous centroid
            n = r["n"]
            cents[(r["sub_id"], r["cent_id"])] = [
                math.floor((2 * r[f"s{i}"] + n) / (2 * n))
                for i in range(PQ_SUBDIM)
            ]
    return cents


def q_ann_pq_adc_topk(spark, sf):
    """PQ-ADC top-5: train PQ_M=4 sub-codebooks (integer-exact joint
    Lloyd), encode every vector as 4 centroid codes, rank by the ADC
    lookup-table distance (int64-exact sum of 4 broadcast lookups — the
    scan never touches vector data), keep the PQ_CAND=30 closest codes
    per query, exact double-cosine re-rank to top-5."""
    sv = _pq_subvecs(spark, sf)
    cents = _pq_train(spark, sv)
    cdf = spark.createDataFrame(
        [(s, c, cv) for (s, c), cv in sorted(cents.items())],
        "sub_id int, cent_id long, cv array<long>",
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy("d2", "cent_id")
    codes = (
        sv.join(F.broadcast(cdf), "sub_id")
        .withColumn("d2", _pq_d2())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "sub_id", "cent_id")
    )
    lut = (
        sv.filter(F.col("vec_id") < 10)
        .join(F.broadcast(cdf), "sub_id")
        .withColumn("ld2", _pq_d2())
        .select(F.col("vec_id").alias("query_id"), "sub_id", "cent_id", "ld2")
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub_id", "cent_id"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("ld2").alias("ad2"))
    )
    wq = Window.partitionBy("query_id").orderBy("ad2", "vec_id")
    cands = (
        approx.withColumn("arn", F.row_number().over(wq))
        .filter(F.col("arn") <= PQ_CAND)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    ed = _emb_double(spark, sf).withColumn("nrm", F.expr(_NORM))
    va = ed.select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    vb = ed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = "aggregate(zip_with(ea, eb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    scored = (
        cands.join(va, "query_id")
        .join(vb, "neighbor_id")
        .withColumn("cosine", F.expr(dot) / (F.col("na") * F.col("nb")))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank")
    )


def _sql_pq_adc() -> str:
    """Unrolled DuckDB mirror of the joint sub-codebook Lloyd loop + ADC."""
    d2 = (
        "(SELECT SUM((x - y) * (x - y))"
        " FROM (SELECT unnest(v.sqv) AS x, unnest(c.cv) AS y))"
    )
    sub_selects = "\n  UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub_id,"
        f" qv[{s * PQ_SUBDIM + 1}:{(s + 1) * PQ_SUBDIM}] AS sqv FROM q"
        for s in range(PQ_M)
    )

    def assign_cte(name, prev):
        return f"""{name} AS (
  SELECT vec_id, sub_id, sqv, cent_id FROM (
    SELECT v.vec_id, v.sub_id, v.sqv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub_id
                              ORDER BY {d2} ASC, c.cent_id ASC) AS rn
    FROM sv v JOIN {prev} c ON v.sub_id = c.sub_id) WHERE rn = 1)"""

    def update_cte(name, prev, a):
        return f"""{name} AS (
  SELECT p.sub_id, p.cent_id, COALESCE(u.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN (
    SELECT sub_id, cent_id, list(cval ORDER BY p) AS cv FROM (
      SELECT sub_id, cent_id, p,
             CAST(FLOOR((2.0 * SUM(sqv[p]) + COUNT(*)) / (2.0 * COUNT(*)))
                  AS BIGINT) AS cval
      FROM {a} CROSS JOIN pos GROUP BY sub_id, cent_id, p)
    GROUP BY sub_id, cent_id
  ) u USING (sub_id, cent_id))"""

    ctes = [
        f"pos AS (SELECT unnest(generate_series(1, {PQ_SUBDIM})) AS p)",
        f"""q AS (
  SELECT vec_id, list_transform(embedding,
           x -> CAST(FLOOR(CASE WHEN nrm = 0 THEN 0
                           ELSE CAST(x AS DOUBLE) / nrm * {float(_QUANT)} + 0.5
                           END) AS BIGINT)) AS qv
  FROM (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings))""",
        f"sv AS (\n  {sub_selects})",
        f"c0 AS (SELECT sub_id, vec_id AS cent_id, sqv AS cv FROM sv WHERE vec_id < {PQ_K})",
    ]
    for t in range(1, PQ_ITERS + 1):
        ctes.append(assign_cte(f"a{t}", f"c{t - 1}"))
        ctes.append(update_cte(f"c{t}", f"c{t - 1}", f"a{t}"))
    T = PQ_ITERS
    joined = ",\n".join(ctes)
    return f"""
WITH {joined},
rankedf AS (
  SELECT v.vec_id, v.sub_id, c.cent_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub_id
                            ORDER BY {d2} ASC, c.cent_id ASC) AS crank
  FROM sv v JOIN c{T} c ON v.sub_id = c.sub_id),
codes AS (SELECT vec_id, sub_id, cent_id FROM rankedf WHERE crank = 1),
lut AS (
  SELECT v.vec_id AS query_id, c.sub_id, c.cent_id, {d2} AS ld2
  FROM sv v JOIN c{T} c ON v.sub_id = c.sub_id WHERE v.vec_id < 10),
approx AS (
  SELECT l.query_id, co.vec_id, SUM(l.ld2) AS ad2
  FROM codes co JOIN lut l ON co.sub_id = l.sub_id AND co.cent_id = l.cent_id
  WHERE l.query_id <> co.vec_id GROUP BY 1, 2),
cand AS (
  SELECT query_id, vec_id AS neighbor_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY ad2 ASC, vec_id ASC) AS arn
    FROM approx) WHERE arn <= {PQ_CAND}),
n AS (SELECT vec_id, embedding, {_SQL_NRM} AS nrm FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_DOT} / (a.nrm * b.nrm) AS cosine
  FROM cand JOIN n a ON a.vec_id = query_id JOIN n b ON b.vec_id = neighbor_id)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) WHERE rank <= 5
"""


SQL_ANN_PQ_ADC_TOPK = _sql_pq_adc()


# --------------------------------------------------------------------------
# text analysis


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for")


def q_text_quality(spark, sf):
    """Quality features: token count, distinct-token ratio proxy, stopword
    count, mean word length ×100 (integer outputs — FP-safe)."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    return d.select(
        "doc_id",
        "lang",
        F.size(w).alias("n_tokens"),
        F.size(F.array_distinct(w)).alias("n_distinct_tokens"),
        F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))).alias("n_stopwords"),
        F.floor(F.length(F.regexp_replace("text", " ", "")) * 100 / F.size(w)).alias(
            "mean_wordlen_x100"
        ),
    )


_SQL_STOP = "('" + "','".join(_STOPWORDS) + "')"

SQL_TEXT_QUALITY = f"""
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
       len(list_filter(string_split(text, ' '), t -> t IN {_SQL_STOP})) AS n_stopwords,
       CAST(FLOOR(length(replace(text, ' ', '')) * 100 / len(string_split(text, ' ')))
            AS BIGINT) AS mean_wordlen_x100
FROM documents
"""


def q_text_langid(spark, sf):
    """N-gram lang-id heuristic: stopword-density vote vs the labeled lang
    (a confusion-matrix style output)."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    density = F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))) * 100 / F.size(w)
    pred = F.when(density >= 10, "en-like").otherwise("other")
    return (
        d.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


SQL_TEXT_LANGID = f"""
SELECT lang,
       CASE WHEN len(list_filter(string_split(text, ' '), t -> t IN {_SQL_STOP}))
                 * 100 / len(string_split(text, ' ')) >= 10
            THEN 'en-like' ELSE 'other' END AS predicted,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1, 2
"""


# English-profile character bigrams (most frequent in English text) — the
# classic n-gram language-ID signal. With one shared vocabulary across the
# fixture's lang labels the scores don't separate classes; the query's
# point is the n-gram statistic machinery (substring-occurrence counting
# is engine-identical via length/replace arithmetic).
_LANGID_BIGRAMS = ("th", "he", "in", "er", "an", "re")


def q_text_langid_ngram(spark, sf):
    """N-gram language-ID signal: per lang, profile-bigram hits per 1000
    chars (occurrences counted via length-difference after replace —
    overlap-free, identical in both engines)."""
    d = _docs(spark, sf)
    hits = sum(
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(bg), F.lit(""))))
        / 2
        for bg in _LANGID_BIGRAMS
    )
    per_doc = d.select("lang", hits.cast("bigint").alias("hits"), F.length("text").alias("nc"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("hits").alias("total_hits"),
        F.floor(F.sum("hits") * 1000 / F.sum("nc")).alias("hits_per_kchar"),
    )


_SQL_BIGRAM_HITS = " + ".join(
    f"(length(text) - length(replace(text, '{bg}', ''))) / 2"
    for bg in _LANGID_BIGRAMS
)

SQL_TEXT_LANGID_NGRAM = f"""
WITH per_doc AS (
  SELECT lang, CAST({_SQL_BIGRAM_HITS} AS BIGINT) AS hits, length(text) AS nc
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(hits) AS BIGINT) AS total_hits,
       CAST(FLOOR(SUM(hits) * 1000.0 / SUM(nc)) AS BIGINT) AS hits_per_kchar
FROM per_doc GROUP BY lang
"""


def q_doc_fingerprint(spark, sf):
    """Document fingerprint: md5 of the normalized 64-char prefix."""
    d = _docs(spark, sf)
    norm = F.substring(F.regexp_replace(F.lower("text"), "\\s+", " "), 1, 64)
    return (
        d.select("doc_id", F.substring(F.md5(norm), 1, 16).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_doc_id"))
    )


SQL_FINGERPRINT = r"""
SELECT substr(md5(substr(regexp_replace(lower(text), '\s+', ' ', 'g'), 1, 64)), 1, 16) AS fp,
       COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc_id
FROM documents GROUP BY 1
"""


# BPE-ish regex tokenizer: letter runs | digit runs | single punctuation —
# the pre-tokenization split GPT-2-style BPE applies before merges. Kept to
# the regex subset Java (Spark) and RE2 (DuckDB) treat identically.
_BPE_PAT = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def q_token_bpe_stats(spark, sf):
    """Token counting with a BPE-ish regex (vs whitespace): per lang, doc
    count, whitespace-token total, regex-token total, and the expansion
    ratio ×100 — the fertility metric a tokenizer-budget pipeline tracks."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    bpe = F.expr(f"regexp_extract_all(text, '{_BPE_PAT}', 0)")
    per_doc = d.select(
        "lang", F.size(w).alias("n_ws"), F.size(bpe).alias("n_bpe")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").alias("total_ws_tokens"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.floor(F.sum("n_bpe") * 100 / F.sum("n_ws")).alias("bpe_per_ws_x100"),
    )


SQL_TOKEN_BPE = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_PAT}'))) AS BIGINT)
           AS total_bpe_tokens,
       CAST(FLOOR(SUM(len(regexp_extract_all(text, '{_BPE_PAT}'))) * 100.0
                  / SUM(len(string_split(text, ' ')))) AS BIGINT)
           AS bpe_per_ws_x100
FROM documents GROUP BY lang
"""


# Rabin-Karp-style rolling hash over the word sequence: per-word value from
# md5 nibbles (engine-identical), folded as acc*31 + v (mod 2^31-1 keeps
# every intermediate below 2^36 — safe for BIGINT in both engines, which
# differ on overflow: Spark wraps, DuckDB raises).
_ROLL_MOD = 2147483647


def q_doc_rolling_hash(spark, sf):
    """Order-sensitive document fingerprint (vs the order-free md5-prefix
    fingerprint): equal only for documents with the same word SEQUENCE."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    nib = (
        "(instr('0123456789abcdef', substring(md5(t), {j}, 1)) - 1)"
    )
    val = f"((({nib.format(j=1)} * 16 + {nib.format(j=2)}) * 16 + {nib.format(j=3)}) * 16 + {nib.format(j=4)})"
    rolling = F.expr(
        "aggregate(transform(split(text, ' '), t -> cast("
        + val
        + f" as bigint)), cast(0 as bigint), (acc, v) -> (acc * 31 + v) % {_ROLL_MOD})"
    )
    return (
        d.select("doc_id", rolling.alias("rhash"))
        .groupBy("rhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("rep_doc_id"))
    )


_SQL_NIBW = "(strpos('0123456789abcdef', substr(md5(t), {j}, 1)) - 1)"
_SQL_WVAL = (
    f"((({_SQL_NIBW.format(j=1)} * 16 + {_SQL_NIBW.format(j=2)}) * 16 "
    f"+ {_SQL_NIBW.format(j=3)}) * 16 + {_SQL_NIBW.format(j=4)})"
)

SQL_ROLLING_HASH = f"""
WITH h AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split(text, ' '),
                            t -> CAST({_SQL_WVAL} AS BIGINT))),
           (acc, v) -> (acc * 31 + v) % {_ROLL_MOD}) AS rhash
  FROM documents)
SELECT rhash, COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc_id
FROM h GROUP BY rhash
"""


def q_token_stats_by_lang(spark, sf):
    d = _docs(spark, sf)
    w = F.split("text", " ")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(w)).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.max(F.size(w)).alias("max_tokens"),
    )


SQL_TOKEN_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MAX(len(string_split(text, ' '))) AS max_tokens
FROM documents GROUP BY lang
"""


# --------------------------------------------------------------------------
# the composed training-data pipeline: quality -> exact dedup -> near-dup


def q_pipeline_end_to_end(spark, sf):
    """The full pre-training data pipeline as ONE dataflow: quality gate
    (>= 20 tokens, >= 1 stopword) -> exact dedup (keep min doc_id per
    md5(text)) -> near-dup removal (drop the doc_b of every capped-shingle
    Jaccard >= 0.5 pair) -> per-lang kept-doc and kept-token totals. Every
    stage is a shuffle-bounded composition of the individual operators
    above — the shape a 100 TB corpus-cleaning job actually runs."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    quality = d.filter(
        (F.size(w) >= 20)
        & (F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t))) >= 1)
    )
    # exact dedup, skew-safe: min-rep per hash via partial-agg groupBy, then
    # a semi-join back on (hash, doc_id) — the composite key spreads a hot
    # hash (10⁸ copies of one boilerplate page) across tasks, where a
    # window over md5(text) would route them all into one
    reps = quality.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = (
        quality.withColumn("_h", F.md5("text"))
        .join(reps, ["_h", "doc_id"], "left_semi")
        .drop("_h")
    )

    sh = exact.select("doc_id", F.split("text", " ").alias("w")).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 2),
                    lambda i: F.concat_ws(" ", F.slice("w", i, 3)),
                )
            )
        ).alias("sh"),
    )
    sh = _drop_hot_keys(sh, ["sh"], SHINGLE_DF_CAP)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    drop_ids = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")) >= 0.5
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    final = exact.join(drop_ids, "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens_kept"),
    )


_SQL_STOPLIST = "('" + "','".join(_STOPWORDS) + "')"

SQL_PIPELINE_E2E = f"""
WITH quality AS (
  SELECT * FROM documents
  WHERE len(string_split(text, ' ')) >= 20
    AND len(list_filter(string_split(text, ' '), t -> t IN {_SQL_STOPLIST})) >= 1),
exact AS (
  SELECT * FROM (SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
                 FROM quality)
  WHERE doc_id = rep),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM exact),
shingles AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS sh
  FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
  WHERE len(w) >= 3),
capped AS (
  SELECT doc_id, sh FROM (
    SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df FROM shingles)
  WHERE df <= {SHINGLE_DF_CAP}),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
drop_ids AS (
  SELECT DISTINCT doc_b AS doc_id FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5),
final AS (SELECT e.* FROM exact e
          WHERE NOT EXISTS (SELECT 1 FROM drop_ids x WHERE x.doc_id = e.doc_id))
SELECT lang, COUNT(*) AS n_docs_kept,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens_kept
FROM final GROUP BY lang
"""


# --------------------------------------------------------------------------
# span explode: the engine's one-page -> N-links shape under the driver gate


def q_span_explode(spark, sf):
    """D1 explode-of-struct-array under the hard driver gate: synthesize
    ``array<struct<kind,text,offset>>`` spans from documents.text (words
    starting with 'a' are 'link' spans — arbitrary but engine-identical),
    explode, keep link spans, aggregate per doc. This is exactly the
    one-page -> N-links shape of the crawl traversal (reference
    urls.go:73-106; engine plans/crawl.py links stage), driver-checked
    against DuckDB UNNEST."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    spans = F.transform(
        w,
        lambda t, i: F.struct(
            F.when(F.substring(t, 1, 1) == F.lit("a"), "link")
            .otherwise("text")
            .alias("kind"),
            t.alias("text"),
            i.alias("offset"),
        ),
    )
    ex = d.select("doc_id", F.explode(spans).alias("s"))
    return (
        ex.filter(F.col("s.kind") == "link")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("s.text").alias("n_distinct_targets"),
            F.sum("s.offset").alias("sum_offset"),
        )
    )


SQL_SPAN_EXPLODE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id,
         CASE WHEN substr(w[i], 1, 1) = 'a' THEN 'link' ELSE 'text' END AS kind,
         w[i] AS stext, i - 1 AS off
  FROM words, UNNEST(generate_series(1, len(w))) AS t(i))
SELECT doc_id, COUNT(*) AS n_links, COUNT(DISTINCT stext) AS n_distinct_targets,
       CAST(SUM(off) AS BIGINT) AS sum_offset
FROM spans WHERE kind = 'link' GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# multimodal: genuinely-binary payload plumbing through mapInPandas


def q_multimodal_features(spark, sf):
    """Opaque-binary multimodal plumbing: a genuinely binary payload column
    (unhex(md5(text)) — 16 raw bytes, full 0-255 range, NOT re-encoded
    text) flows through Arrow-batched feature extraction via mapInPandas.
    The decode itself is a deterministic stub (no image/audio libs in this
    container — a real pipeline decodes with PIL/librosa here); the schema,
    binary Arrow transfer, batching and partitioning are the production
    shape. Modality is derived from the payload bytes (typed-metadata
    shape); the oracle recomputes every feature from md5 nibble arithmetic."""
    d = _docs(spark, sf).select("doc_id", F.unhex(F.md5("text")).alias("payload"))

    def _extract(batches):
        import numpy as np
        import pandas as pd

        mods = np.array(["image", "audio", "video"])
        for pdf in batches:
            raw = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8).reshape(
                len(pdf), 16
            )
            first = raw[:, 0].astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": np.full(len(pdf), 16, dtype="int64"),
                    "first_byte": first,
                    "byte_sum": raw.sum(axis=1, dtype="int64"),
                    "modality": mods[first % 3],
                }
            )

    return d.mapInPandas(
        _extract,
        schema="doc_id long, n_bytes long, first_byte long, byte_sum long, modality string",
    )


_SQL_NIB = "(strpos('0123456789abcdef', substr(md5(text), {j}, 1)) - 1)"

SQL_MULTIMODAL = f"""
WITH f AS (
  SELECT doc_id, text,
         {_SQL_NIB.format(j=1)} * 16 + {_SQL_NIB.format(j=2)} AS first_byte
  FROM documents)
SELECT doc_id,
       CAST(16 AS BIGINT) AS n_bytes,
       CAST(first_byte AS BIGINT) AS first_byte,
       CAST((SELECT SUM(({_SQL_NIB.format(j="2 * i + 1")}) * 16
                        + ({_SQL_NIB.format(j="2 * i + 2")}))
             FROM UNNEST(generate_series(0, 15)) AS t(i)) AS BIGINT) AS byte_sum,
       CASE first_byte % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS modality
FROM f
"""


def q_multimodal_frame_sample(spark, sf):
    """Frame-sample + resize plumbing for video-like payloads: a 64-byte
    binary column (4 chained md5 blocks — deterministic stand-in for a
    real container; a production pipeline decodes with pyav/ffmpeg here)
    is viewed as 16 frames x 4 bytes, stride-sampled every 4th frame, and
    each sampled frame is "resized" to its floor-mean byte (the thumbnail
    step). All feature math is Arrow-batched numpy over mapInPandas —
    reshape/stride/sum on the batch, zero per-row Python — which is the
    exact production shape for frame extraction at scale (partition =
    batch of videos, frames never leave the executor). Oracle recomputes
    every byte from md5 nibble arithmetic in DuckDB."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.unhex(
            F.concat(
                F.md5("text"),
                F.md5(F.concat("text", F.lit("x"))),
                F.md5(F.concat("text", F.lit("y"))),
                F.md5(F.concat("text", F.lit("z"))),
            )
        ).alias("payload"),
    )

    def _sample(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            raw = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8).reshape(
                len(pdf), 16, 4
            )
            sampled = raw[:, ::4, :].astype("int64")  # (n, 4 frames, 4 bytes)
            means = sampled.sum(axis=2) // 4
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": np.full(len(pdf), 16, dtype="int64"),
                    "n_sampled": np.full(len(pdf), 4, dtype="int64"),
                    "sampled_byte_sum": sampled.sum(axis=(1, 2)),
                    "f0_mean": means[:, 0],
                    "f1_mean": means[:, 1],
                    "f2_mean": means[:, 2],
                    "f3_mean": means[:, 3],
                }
            )

    return d.mapInPandas(
        _sample,
        schema=(
            "doc_id long, n_frames long, n_sampled long, sampled_byte_sum long,"
            " f0_mean long, f1_mean long, f2_mean long, f3_mean long"
        ),
    )


def _sql_frame_byte(k: int) -> str:
    """DuckDB expr for byte k (0-63) of the 4-block md5 hex string ``h``."""
    return (
        f"((strpos('0123456789abcdef', substr(h, {2 * k + 1}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr(h, {2 * k + 2}, 1)) - 1))"
    )


def _sql_frame_mean(f: int) -> str:
    return (
        "(("
        + " + ".join(_sql_frame_byte(4 * f + j) for j in range(4))
        + ") // 4)"
    )


SQL_MULTIMODAL_FRAMES = f"""
WITH f AS (
  SELECT doc_id,
         md5(text) || md5(text || 'x') || md5(text || 'y') || md5(text || 'z')
           AS h
  FROM documents)
SELECT doc_id,
       CAST(16 AS BIGINT) AS n_frames,
       CAST(4 AS BIGINT) AS n_sampled,
       CAST({" + ".join(_sql_frame_byte(4 * f + j) for f in (0, 4, 8, 12)
                        for j in range(4))} AS BIGINT) AS sampled_byte_sum,
       CAST({_sql_frame_mean(0)} AS BIGINT) AS f0_mean,
       CAST({_sql_frame_mean(4)} AS BIGINT) AS f1_mean,
       CAST({_sql_frame_mean(8)} AS BIGINT) AS f2_mean,
       CAST({_sql_frame_mean(12)} AS BIGINT) AS f3_mean
FROM f
"""


def q_media_span_join(spark, sf):
    """Interleaved text+media: the span model (functions/spans.py, reference
    ``Link``/media parity urls.go:34-38) carries ``media_ref`` URIs inline
    with prose; a training pipeline joins those refs to a media-features
    table to build multimodal examples. Spans here are synthesized from
    documents.text (words starting with 'm' become media spans,
    ``media_ref = 'media://' || word`` — engine-identical on both sides);
    the media dim is the corpus's distinct refs with md5-derived features
    (byte-0 size surrogate + modality), standing in for the decode output
    of q_multimodal_features. The dim is vocabulary-bounded, so Spark
    broadcasts it — the 100 TB span side never shuffles; per-doc
    aggregation then reuses the scan partitioning (partial agg map-side).
    At-rest co-location for the non-broadcastable case (a petabyte media
    table) is the bucketed-join path proven in tests/test_media_join.py."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    spans = d.select(
        "doc_id",
        F.explode(
            F.filter(w, lambda t: F.substring(t, 1, 1) == F.lit("m"))
        ).alias("word"),
    ).select("doc_id", F.concat(F.lit("media://"), F.col("word")).alias("media_ref"))
    media = (
        spans.select("media_ref")
        .distinct()
        .withColumn(
            "media_bytes",
            F.conv(F.substring(F.md5("media_ref"), 1, 2), 16, 10).cast("long"),
        )
        .withColumn(
            "modality",
            F.when(F.col("media_bytes") % 3 == 0, "image")
            .when(F.col("media_bytes") % 3 == 1, "audio")
            .otherwise("video"),
        )
    )
    return (
        spans.join(F.broadcast(media), "media_ref")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.countDistinct("media_ref").alias("n_refs"),
            F.sum("media_bytes").alias("media_bytes"),
            F.count_if(F.col("modality") == "image").alias("n_image"),
            F.count_if(F.col("modality") == "audio").alias("n_audio"),
            F.count_if(F.col("modality") == "video").alias("n_video"),
        )
    )


_SQL_REF_BYTE0 = (
    "((strpos('0123456789abcdef', substr(md5(media_ref), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(media_ref), 2, 1)) - 1))"
)

SQL_MEDIA_SPAN_JOIN = f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
spans AS (
  SELECT doc_id, 'media://' || w[i] AS media_ref
  FROM words, UNNEST(generate_series(1, len(w))) AS t(i)
  WHERE substr(w[i], 1, 1) = 'm'),
media AS (
  SELECT media_ref, {_SQL_REF_BYTE0} AS media_bytes
  FROM (SELECT DISTINCT media_ref FROM spans)),
m2 AS (
  SELECT media_ref, media_bytes,
         CASE media_bytes % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS modality
  FROM media)
SELECT s.doc_id,
       COUNT(*) AS n_media,
       COUNT(DISTINCT s.media_ref) AS n_refs,
       CAST(SUM(m2.media_bytes) AS BIGINT) AS media_bytes,
       CAST(COUNT(*) FILTER (WHERE m2.modality = 'image') AS BIGINT) AS n_image,
       CAST(COUNT(*) FILTER (WHERE m2.modality = 'audio') AS BIGINT) AS n_audio,
       CAST(COUNT(*) FILTER (WHERE m2.modality = 'video') AS BIGINT) AS n_video
FROM spans s JOIN m2 USING (media_ref)
GROUP BY s.doc_id
"""


# --------------------------------------------------------------------------
# corpus analytics round 3: tf-idf terms, stratified sampling, dup clustering


def q_tfidf_top_terms(spark, sf):
    """Top-5 terms per language by INTEGER tf-idf: score = tf_total *
    ((n_docs_lang * 10^6) div df) — all-integer arithmetic so both engines
    hash bit-exact (no float log idf). Ties broken by term. At scale: two
    partial-agg groupBys + one window over lang (25 langs max — bounded
    partitions, unlike a hot-key window)."""
    d = _docs(spark, sf)
    words = d.select(
        "lang", "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") >= 3)
    stats = words.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    ndocs = d.groupBy("lang").agg(F.count_distinct("doc_id").alias("n_docs"))
    scored = stats.join(ndocs, "lang").withColumn(
        "score", F.expr("tf * ((n_docs * 1000000) div df)").cast("bigint")
    )
    # exact two-phase top-k (same trick as operators/politeness.py): a
    # single window over lang would sort one language's ENTIRE vocabulary
    # (10^6+ terms) in one task at web scale. Phase 1 takes the top-5
    # within (lang, term-hash salt) — any global top-5 row is necessarily
    # in its salt group's top-5 — phase 2 ranks the <= 5*SALTS survivors.
    SALTS = 16
    w1 = Window.partitionBy(
        "lang", F.pmod(F.xxhash64("term"), F.lit(SALTS))
    ).orderBy(F.desc("score"), F.col("term"))
    survivors = scored.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= 5
    )
    w2 = Window.partitionBy("lang").orderBy(F.desc("score"), F.col("term"))
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
        .select("lang", "term", "tf", "df", "score", "rank")
    )


SQL_TFIDF = """
WITH words AS (
  SELECT lang, doc_id, t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE len(t.term) >= 3),
stats AS (
  SELECT lang, term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
  FROM words GROUP BY lang, term),
nd AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_docs FROM documents GROUP BY lang),
scored AS (
  SELECT s.lang, s.term, s.tf, s.df,
         CAST(s.tf * ((nd.n_docs * 1000000) // s.df) AS BIGINT) AS score
  FROM stats s JOIN nd USING (lang)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, term) AS rank
  FROM scored)
SELECT lang, term, tf, df, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""


SAMPLE_BYTE_CUTOFF = 64  # first md5 byte < 64 -> ~25% deterministic sample


TFIDF_COS2_T = 250_000  # cos^2 >= 0.25 i.e. cosine >= 0.5


def q_tfidf_cosine_pairs(spark, sf):
    """tf-idf-weighted cosine similarity pairs — the WEIGHTED member of
    the similarity family (ngram Jaccard treats 'the' and a rare proper
    noun alike; idf weighting makes shared RARE terms dominate, the
    retrieval-grade near-dup signal). Engine-equality discipline: weights
    are exact integers (w = tf * ((N*1000) div df), no float log idf —
    q_tfidf_top_terms' trick), dot products and squared norms accumulate
    in int64, and ONLY the final ratio uses doubles — two divisions and
    one multiply, each IEEE-correctly-rounded on identical int64 inputs
    with identical written order in both engines, floored into an integer
    cos²×10⁶ column so the driver hash never sees a float.

    Scale: terms are df-capped BEFORE the self-join — stopword-frequency
    terms carry ~zero idf weight anyway, so the cap drops what the
    weighting would have ignored. The cap is RELATIVE,
    max(SHINGLE_DF_CAP, n_docs div 20): an absolute cap binds harder as
    the corpus grows (at 10× the toy SF it was dropping even exact-dup
    pairs' shared vocabulary — measured, not hypothetical), where the
    relative form keeps join partitions bounded by (n/20)² per term while
    letting the pair evidence survive any SF. Norms ride a separate
    partial-agg groupBy joined back per-doc."""
    d = _docs(spark, sf)
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.length("term") >= 3)
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_total"))
    weighted = (
        tf.join(df_, "term")
        .join(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            F.expr("tf * ((n_total * 1000) div df)")
            .cast("bigint")
            .alias("w"),
            "df",
            "n_total",
        )
    )
    norms = weighted.groupBy("doc_id").agg(
        F.sum(F.expr("w * w")).alias("norm2")
    )
    # the df-cap is a FILTER on the df column the weighting already joined
    # in: the old form recomputed per-term document frequency from scratch
    # (a second full aggregation over tf) and broadcast-anti-joined the hot
    # set back — the predicate is identical, the two extra passes are not
    capped = weighted.filter(
        F.col("df")
        <= F.greatest(F.lit(SHINGLE_DF_CAP), F.expr("n_total div 20"))
    ).select("doc_id", "term", "w")
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, "term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(F.expr("a.w * b.w")).alias("dot"),
        )
    )
    scored = (
        pairs.join(norms.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("norm2", "na2"), "doc_a")
        .join(norms.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("norm2", "nb2"), "doc_b")
        .withColumn(
            "cos2_x1e6",
            F.floor(
                (F.col("dot").cast("double") / F.col("na2"))
                * (F.col("dot").cast("double") / F.col("nb2"))
                * F.lit(1_000_000.0)
            ).cast("bigint"),
        )
        .filter(F.col("cos2_x1e6") >= TFIDF_COS2_T)
    )
    return scored.select("doc_a", "doc_b", "n_shared", "dot", "cos2_x1e6")


SQL_TFIDF_COSINE_PAIRS = f"""
WITH words AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split(text, ' ')) AS t(term)
  WHERE length(t.term) >= 3),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
wt AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * (((SELECT COUNT(*) FROM documents) * 1000) // dft.df)
              AS BIGINT) AS w
  FROM tf JOIN dft USING (term)),
norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS norm2
          FROM wt GROUP BY 1),
capped AS (
  SELECT * FROM wt WHERE term NOT IN (
    SELECT term FROM wt GROUP BY term
    HAVING COUNT(*) > GREATEST({SHINGLE_DF_CAP},
                               (SELECT COUNT(*) FROM documents) // 20))),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         COUNT(*) AS n_shared, CAST(SUM(a.w * b.w) AS BIGINT) AS dot
  FROM capped a JOIN capped b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b, p.n_shared, p.dot,
       CAST(FLOOR((CAST(p.dot AS DOUBLE) / na.norm2)
                  * (CAST(p.dot AS DOUBLE) / nb.norm2)
                  * 1000000.0) AS BIGINT) AS cos2_x1e6
FROM pairs p
JOIN norms na ON na.doc_id = p.doc_a
JOIN norms nb ON nb.doc_id = p.doc_b
WHERE FLOOR((CAST(p.dot AS DOUBLE) / na.norm2)
            * (CAST(p.dot AS DOUBLE) / nb.norm2) * 1000000.0)
      >= {TFIDF_COS2_T}
"""


def q_sample_stratified(spark, sf):
    """Deterministic hash-stratified sampling — the training-data op for
    building fixed per-language subsets reproducibly on any cluster size:
    keep a doc iff the first byte of md5(doc_id) < 64 (~25%), no RNG, no
    driver state. Outputs per-lang totals so the oracle hashes exactly."""
    d = _docs(spark, sf)
    byte0 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    toks = F.size(F.split("text", " "))
    return d.withColumn("_b", byte0).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("_b") < SAMPLE_BYTE_CUTOFF).alias("n_sampled"),
        F.sum(
            F.when(F.col("_b") < SAMPLE_BYTE_CUTOFF, toks).otherwise(F.lit(0))
        ).alias("tokens_sampled"),
    )


_SQL_MD5_BYTE0 = (
    "((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"
)

SQL_SAMPLE_STRATIFIED = f"""
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN {_SQL_MD5_BYTE0} < {SAMPLE_BYTE_CUTOFF} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(SUM(CASE WHEN {_SQL_MD5_BYTE0} < {SAMPLE_BYTE_CUTOFF}
                THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT) AS tokens_sampled
FROM documents GROUP BY lang
"""


def q_dedup_clusters(spark, sf):
    """Near-dup CLUSTERING — the step after pair generation in a real
    corpus-dedup job: LSH candidate pairs -> undirected graph -> 3 rounds
    of min-label propagation -> per-cluster size (label = the cluster's
    canonical/kept doc_id). Composes q_dedup_minhash_lsh with the CC
    kernel; each round is one shuffle keyed on dst."""
    pairs = q_dedup_minhash_lsh(spark, sf)
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    # min_label_propagate cuts `und` once — without that cut each round
    # re-derives the whole MinHash pipeline (shingle explode + 8
    # permutations): lineage doubled per round, measured 2.3× the pair
    # query it wraps at sf0.1 (see brink_spark/queries/iterate.py)
    labels = _min_label_propagate(und.distinct(), rounds=3)
    return labels.groupBy(F.col("lbl").alias("canonical_doc")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


def q_dedup_clusters_converged(spark, sf):
    """Convergence-mode near-dup clustering — the PRODUCTION form of
    q_dedup_clusters: min-label propagation iterated to a fixed point
    (stop when the round changes zero labels) instead of a fixed 3
    rounds, so chains of any diameter collapse into one cluster. A 100 TB
    corpus-dedup job wants this; the fixed-round twin stays as the
    driver-gate query because its oracle is exactly expressible in SQL
    CTEs. Per round: one shuffle keyed on dst, a lineage cut, and ONE
    driver-side count of changed labels (the loop condition — bounded
    driver state, no data collected). Round cap 50 is a runaway guard:
    label propagation converges in O(diameter) rounds and real link
    graphs have small diameter."""
    pairs = q_dedup_minhash_lsh(spark, sf)
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = _min_label_propagate(und.distinct(), rounds=None)
    return labels.groupBy(F.col("lbl").alias("canonical_doc")).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )


def _sql_cc_round(prev: str, out: str) -> str:
    # AS MATERIALIZED: each round references the previous round TWICE
    # (and `und` once); without forced materialization DuckDB may inline
    # the chain and re-evaluate the whole upstream MinHash pipeline
    # 2^rounds times — the 8-round converged oracle never finishes.
    # Materialization cannot change results, only evaluation count.
    return f"""
{out} AS MATERIALIZED (
  SELECT l.node, LEAST(l.lbl, COALESCE(s.nb_min, l.lbl)) AS lbl
  FROM {prev} l LEFT JOIN (
    SELECT u.dst AS node, MIN(r.lbl) AS nb_min
    FROM und u JOIN {prev} r ON r.node = u.src
    GROUP BY u.dst) s ON s.node = l.node)"""


SQL_DEDUP_CLUSTERS = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM und),
{_sql_cc_round("l0", "l1")},
{_sql_cc_round("l1", "l2")},
{_sql_cc_round("l2", "l3")}
SELECT lbl AS canonical_doc, COUNT(*) AS cluster_size FROM l3 GROUP BY lbl
"""

# Oracle for the CONVERGED form: 8 unrolled rounds. Valid while the LSH
# pair graph reaches its fixed point within 8 rounds of min-label
# propagation — measured 2 rounds at sf0.01 (the driver's gate scale) and
# 4 at sf0.1, and propagation halves the effective diameter's slack each
# extra round. The Spark side iterates to an EXACT fixed point, whose
# labels the 8-round unroll reproduces whenever it, too, has converged.
SQL_DEDUP_CLUSTERS_CONVERGED = f"""
WITH {_SQL_SHINGLES},
{_SQL_MINHASH_CTES},
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id),
und AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lbl FROM und),
{_sql_cc_round("l0", "l1")},
{_sql_cc_round("l1", "l2")},
{_sql_cc_round("l2", "l3")},
{_sql_cc_round("l3", "l4")},
{_sql_cc_round("l4", "l5")},
{_sql_cc_round("l5", "l6")},
{_sql_cc_round("l6", "l7")},
{_sql_cc_round("l7", "l8")}
SELECT lbl AS canonical_doc, COUNT(*) AS cluster_size FROM l8 GROUP BY lbl
"""


# --------------------------------------------------------------------------
# repetition stats (Gopher-style quality rule: fraction of duplicate
# word trigrams within a document)


def q_repetition_stats(spark, sf):
    """Within-document repetition — the Gopher/MassiveText quality rule
    'fraction of duplicated n-grams': per doc, the share of word trigrams
    that are repeats, as integer permille (bit-exact both engines; no
    floats). Scale shape: a pure per-row projection over array HOFs —
    NO shuffle, no explode; the trigram array never leaves its row."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    d = d.withColumn("n_words", F.size("w"))
    d = d.withColumn(
        "tris",
        F.when(
            F.col("n_words") >= 3,
            F.expr(
                "transform(sequence(0, n_words - 3),"
                " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
            ),
        ).otherwise(F.expr("cast(array() as array<string>)")),
    )
    return d.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.size("tris").cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct("tris")).cast("bigint").alias("n_distinct_trigrams"),
        F.when(
            F.size("tris") > 0,
            F.expr(
                "(cast(size(tris) - size(array_distinct(tris)) as bigint) * 1000)"
                " div size(tris)"
            ),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rep_permille"),
    )


SQL_REPETITION = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
t AS (
  SELECT doc_id, len(w) AS n_words,
    CASE WHEN len(w) >= 3 THEN
      list_transform(range(1, len(w) - 1),
                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
    ELSE CAST([] AS VARCHAR[]) END AS tris
  FROM w)
SELECT doc_id, n_words,
  len(tris) AS n_trigrams,
  len(list_distinct(tris)) AS n_distinct_trigrams,
  CASE WHEN len(tris) > 0
    THEN ((len(tris) - len(list_distinct(tris))) * 1000) // len(tris)
    ELSE 0 END AS rep_permille
FROM t
"""


# --------------------------------------------------------------------------
# benchmark decontamination (eval-set n-gram overlap)

# real deployments use 8-13-word grams (GPT-3 appendix C: 13); the
# synthetic corpus's tiny vocabulary makes 3 the demonstrative choice —
# exact-match semantics are identical at any N
DECON_NGRAM = 3
DECON_EVAL_MOD = 53  # doc_id % 53 == 0 -> the deterministic "benchmark" slice


def q_decontaminate(spark, sf):
    """Benchmark decontamination, the GPT-3/C4-style n-gram overlap
    check: flag every training doc sharing any word n-gram with the
    held-out eval slice (deterministically doc_id % 53 == 0). Scale
    shape: the eval n-gram set is orders of magnitude smaller than the
    corpus -> distinct + broadcast; the training side streams through
    one explode + broadcast-hash-join + partial-agg groupBy, no
    corpus-sized shuffle on the join."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    grams = (
        d.filter(F.size("w") >= DECON_NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(w) - {DECON_NGRAM}),"
                    " i -> concat_ws(' ', "
                    + ", ".join(f"w[i + {k}]" for k in range(DECON_NGRAM))
                    + "))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    ev = (
        grams.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    tr = grams.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


SQL_DECONTAMINATE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT DISTINCT doc_id, u.gram
  FROM (SELECT doc_id,
               list_transform(range(1, len(w) - {DECON_NGRAM - 2}),
                              i -> array_to_string(w[i:i+{DECON_NGRAM - 1}], ' ')) AS grams
        FROM w WHERE len(w) >= {DECON_NGRAM}) t,
  UNNEST(t.grams) AS u(gram)),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0),
tr AS (SELECT doc_id, gram FROM g WHERE doc_id % {DECON_EVAL_MOD} <> 0)
SELECT doc_id, COUNT(*) AS n_contaminated_grams
FROM tr JOIN ev USING (gram) GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# bigram LM quality score (CCNet-style, integer-exact)

LM_SCALE = 1_000_000


def q_lm_score_bigram(spark, sf):
    """CCNet-style language-model quality proxy, all-integer so both
    engines hash bit-exact: corpus bigram MLE — per bigram instance the
    scaled conditional count (C(w1,w2) * 10^6) div C(w1•), summed and
    floor-averaged per doc. High score = predictable text (low 'LM
    perplexity' proxy); the real CCNet filter thresholds exactly such a
    per-doc mean. Scale shape: count tables are pre-aggregated (vocab-
    bounded, tiny vs corpus) so AQE broadcasts them; the instance stream
    is one explode + two joins + one partial-agg groupBy."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    big = (
        d.filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w) - 2),"
                    " i -> struct(w[i] as w1, w[i+1] as w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    cb = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    cu = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_head"))
    scored = (
        big.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .withColumn("inst", F.expr(f"(c_big * {LM_SCALE}) div c_head"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.expr("sum(inst) div count(1)").cast("bigint").alias("lm_score"),
    )


SQL_LM_SCORE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
big AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM w, UNNEST(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2),
cb AS (SELECT w1, w2, COUNT(*) AS c_big FROM big GROUP BY w1, w2),
cu AS (SELECT w1, COUNT(*) AS c_head FROM big GROUP BY w1)
SELECT doc_id, COUNT(*) AS n_bigrams,
       CAST(CAST(SUM((c_big * {LM_SCALE}) // c_head) AS BIGINT) // COUNT(*)
            AS BIGINT) AS lm_score
FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# chunk-level exact dedup (exact-substring style)

CHUNK_WORDS = 4


def q_dedup_chunks(spark, sf):
    """Chunk-level exact dedup — the tractable form of exact-substring
    dedup (Lee et al. 'Deduplicating Training Data Makes Language Models
    Better' use suffix arrays; the distributed stand-in is fixed-width
    non-overlapping word chunks): per doc, the share of 4-word chunks
    whose exact text also appears in ANOTHER doc, as integer permille.
    Scale shape: explode to chunk instances -> partial-agg groupBy chunk
    (count distinct docs) -> join instances back on chunk. The joined
    build side is ONE row per chunk, so AQE's skew-join split handles a
    boilerplate mega-chunk (the probe side splits; the single build row
    replicates), and no count-window-over-hot-key appears anywhere."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    inst = (
        d.filter(F.size("w") >= CHUNK_WORDS)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (size(w) div {CHUNK_WORDS}) - 1),"
                    " i -> concat_ws(' ', "
                    + ", ".join(
                        f"w[i * {CHUNK_WORDS} + {k}]" for k in range(CHUNK_WORDS)
                    )
                    + "))"
                )
            ).alias("chunk"),
        )
    )
    cdf = inst.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        inst.join(cdf, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("n_docs") >= 2).alias("n_shared_chunks"),
            F.expr(
                "(count_if(n_docs >= 2) * 1000) div count(1)"
            ).cast("bigint").alias("shared_permille"),
        )
    )


SQL_DEDUP_CHUNKS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
ch AS (
  SELECT doc_id, u.chunk
  FROM (SELECT doc_id,
               list_transform(range(0, len(w) // {CHUNK_WORDS}),
                              i -> array_to_string(
                                w[i * {CHUNK_WORDS} + 1 : i * {CHUNK_WORDS} + {CHUNK_WORDS}],
                                ' ')) AS chunks
        FROM w WHERE len(w) >= {CHUNK_WORDS}) t,
  UNNEST(t.chunks) AS u(chunk)),
cdf AS (SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY chunk)
SELECT doc_id, COUNT(*) AS n_chunks,
       COUNT(*) FILTER (n_docs >= 2) AS n_shared_chunks,
       (COUNT(*) FILTER (n_docs >= 2) * 1000) // COUNT(*) AS shared_permille
FROM ch JOIN cdf USING (chunk)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# content-defined chunking (CDC) dedup


def q_dedup_cdc_chunks(spark, sf):
    """Content-defined chunk dedup — the insertion-robust form of chunk
    dedup: boundaries come from the CONTENT (a token whose md5 leading
    nibble is 0 or 1 closes a chunk, p = 1/8 so chunks average ~8 words)
    instead of fixed offsets, so inserting one word early in a document
    shifts only the chunk it lands in — every later chunk re-aligns and
    still matches its duplicates (fixed-width q_dedup_chunks loses ALL
    chunks after the insertion point). This is the storage-dedup /
    rsync-rolling-window idea applied at token granularity.

    Scale: the running boundary count is a per-doc window (partition
    bounded by document length, same discipline as pack_sequences), the
    chunk assembly is a per-(doc, chunk) partial agg, and the cross-doc
    phase reuses q_dedup_chunks' shape exactly — one row per distinct
    chunk on the build side, AQE skew-split for boilerplate mega-chunks.
    Boundary test is md5-nibble arithmetic (engine-identical), not
    xxhash64 (absent in DuckDB)."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    # chunks assembled IN-ROW by a single aggregate() pass over the token
    # array: a boundary token (md5 leading nibble 0/1 — same test as
    # before) closes the running chunk. The old form posexploded every
    # token (10M rows at sf1) through a per-doc running-sum window and a
    # collect_list+sort re-assembly — three shuffled/sorted stages whose
    # only output was exactly these per-doc chunk strings, which are a
    # row-local function of the document. NULL (not '') marks "no tokens
    # yet" so empty tokens from repeated spaces still concatenate
    # identically to the windowed string_agg.
    _cdc_chunks = (
        "aggregate(w,"
        " named_struct('chs', cast(array() as array<string>),"
        "              'cur', cast(null as string)),"
        " (acc, t) -> CASE WHEN substring(md5(t), 1, 1) IN ('0', '1')"
        "   THEN named_struct("
        "     'chs', array_append(acc.chs,"
        "        CASE WHEN acc.cur IS NULL THEN t"
        "             ELSE concat(acc.cur, ' ', t) END),"
        "     'cur', cast(null as string))"
        "   ELSE named_struct("
        "     'chs', acc.chs,"
        "     'cur', CASE WHEN acc.cur IS NULL THEN t"
        "                 ELSE concat(acc.cur, ' ', t) END) END,"
        " acc -> CASE WHEN acc.cur IS NULL THEN acc.chs"
        "             ELSE array_append(acc.chs, acc.cur) END)"
    )
    ch = d.select("doc_id", F.explode(F.expr(_cdc_chunks)).alias("chunk"))
    cdf = ch.groupBy("chunk").agg(F.countDistinct("doc_id").alias("n_docs"))
    return (
        ch.join(cdf, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("n_docs") >= 2).alias("n_shared_chunks"),
            F.expr("(count_if(n_docs >= 2) * 1000) div count(1)")
            .cast("bigint")
            .alias("shared_permille"),
        )
    )


SQL_DEDUP_CDC_CHUNKS = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM documents),
b AS (
  SELECT doc_id, pos, tok,
         CASE WHEN substring(md5(tok), 1, 1) IN ('0', '1')
              THEN 1 ELSE 0 END AS bd
  FROM tok),
c AS (
  SELECT doc_id, pos, tok,
         COALESCE(SUM(bd) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
  FROM b),
ch AS (
  SELECT doc_id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk
  FROM c GROUP BY 1, 2),
cdf AS (SELECT chunk, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY 1)
SELECT ch.doc_id, COUNT(*) AS n_chunks,
       CAST(COUNT(*) FILTER (n_docs >= 2) AS BIGINT) AS n_shared_chunks,
       CAST((COUNT(*) FILTER (n_docs >= 2) * 1000) // COUNT(*) AS BIGINT)
         AS shared_permille
FROM ch JOIN cdf USING (chunk)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# per-source quality rollup (RefinedWeb-style domain aggregation)


def q_source_rollup(spark, sf):
    """Per-(source, lang) corpus health rollup — the RefinedWeb/C4-style
    'aggregate quality by origin' view that decides which domains/dumps
    to keep. Per-doc stats (word count, type-token ratio) are row-local
    array HOFs — no shuffle — then ONE partial-agg groupBy on the tiny
    (source, lang) key space. All-integer outputs (floor div) so both
    engines hash bit-exact."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    per_doc = d.select(
        "source",
        "lang",
        F.size("w").alias("n_words"),
        F.expr("(size(array_distinct(w)) * 1000) div size(w)").alias(
            "ttr_permille"
        ),
    )
    return per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_words").cast("bigint")).alias("total_words"),
        F.expr("sum(n_words) div count(1)").cast("bigint").alias("avg_words"),
        F.expr("(count_if(n_words < 40) * 1000) div count(1)")
        .cast("bigint")
        .alias("short_permille"),
        F.expr("sum(ttr_permille) div count(1)")
        .cast("bigint")
        .alias("avg_ttr_permille"),
    )


SQL_SOURCE_ROLLUP = """
WITH per_doc AS (
  SELECT source, lang, len(w) AS n_words,
         (len(list_distinct(w)) * 1000) // len(w) AS ttr_permille
  FROM (SELECT source, lang, string_split(text, ' ') AS w FROM documents) t)
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_words) // COUNT(*) AS BIGINT) AS avg_words,
       (COUNT(*) FILTER (n_words < 40) * 1000) // COUNT(*) AS short_permille,
       CAST(SUM(ttr_permille) // COUNT(*) AS BIGINT) AS avg_ttr_permille
FROM per_doc
GROUP BY source, lang
"""


# --------------------------------------------------------------------------
# corpus vocabulary statistics


def q_vocab_stats(spark, sf):
    """Per-language vocabulary profile: distinct word types, hapax
    legomena (frequency-1 words — the Zipf tail that dominates vocab
    size), total tokens, and corpus type-token ratio as permille. Scale
    shape: explode -> two-level partial agg ((lang, word) counts, then
    lang) — the classic word-count topology; the second agg's key space
    is vocab-bounded."""
    d = _docs(spark, sf).withColumn("w", F.split("text", " "))
    wc = (
        d.select("lang", F.explode("w").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return wc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.count_if(F.col("cnt") == 1).alias("n_hapax"),
        F.sum("cnt").alias("n_tokens"),
        F.expr("(count(1) * 1000) div sum(cnt)").cast("bigint").alias(
            "ttr_permille"
        ),
    )


SQL_VOCAB_STATS = """
WITH wc AS (
  SELECT lang, u.word, COUNT(*) AS cnt
  FROM (SELECT lang, string_split(text, ' ') AS w FROM documents) t,
       UNNEST(t.w) AS u(word)
  GROUP BY lang, u.word)
SELECT lang, COUNT(*) AS n_types,
       COUNT(*) FILTER (cnt = 1) AS n_hapax,
       CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       CAST((COUNT(*) * 1000) // CAST(SUM(cnt) AS BIGINT) AS BIGINT)
         AS ttr_permille
FROM wc GROUP BY lang
"""


# --------------------------------------------------------------------------
# PII detection / redaction

# Patterns restricted to the syntax subset Java regex and RE2 share
# (character classes, bounded repeats, \\b anchors — no lookaround).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM = r"\b\d{9,}\b"


def pii_columns(text_col):
    """PII expression bundle over any string column: match counts per
    class + the redacted length (every match replaced by a fixed token).
    All native regexp functions — JVM-side, codegen'd, no UDF. The
    driver's synthetic corpus contains no PII (counts legitimately 0
    there); tests/test_corpus_ops.py exercises real positives on a
    fixture."""
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text_col, PII_EMAIL, "<PII>"),
            PII_IPV4,
            "<PII>",
        ),
        PII_LONGNUM,
        "<PII>",
    )
    return [
        F.regexp_count(text_col, F.lit(PII_EMAIL)).cast("bigint").alias("n_email"),
        F.regexp_count(text_col, F.lit(PII_IPV4)).cast("bigint").alias("n_ipv4"),
        F.regexp_count(text_col, F.lit(PII_LONGNUM))
        .cast("bigint")
        .alias("n_longnum"),
        F.length(red).cast("bigint").alias("redacted_len"),
    ]


def q_pii_scrub(spark, sf):
    """Per-doc PII scan + redacted length — the privacy-filter stage of a
    training-data pipeline (email / IPv4 / long-digit-run classes).
    Shuffle-free: a pure projection over native regexp_count /
    regexp_replace, so it pipelines inside whole-stage codegen with
    whatever scan precedes it."""
    return _docs(spark, sf).select("doc_id", *pii_columns(F.col("text")))


SQL_PII_SCRUB = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_email,
       len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ipv4,
       len(regexp_extract_all(text, '{PII_LONGNUM}')) AS n_longnum,
       length(regexp_replace(regexp_replace(regexp_replace(text,
         '{PII_EMAIL}', '<PII>', 'g'),
         '{PII_IPV4}', '<PII>', 'g'),
         '{PII_LONGNUM}', '<PII>', 'g')) AS redacted_len
FROM documents
"""


PIPELINE_QUERIES = {
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_dedup_ngram_jaccard, SQL_NGRAM_JACCARD),
    # same oracle on purpose: proves the prefix-filter join is lossless
    "dedup_jaccard_prefix": (q_dedup_jaccard_prefix, SQL_NGRAM_JACCARD),
    "dedup_minhash_lsh": (q_dedup_minhash_lsh, SQL_MINHASH_LSH),
    "dedup_incremental": (q_dedup_incremental, SQL_DEDUP_INCREMENTAL),
    "dedup_simhash": (q_dedup_simhash, SQL_SIMHASH),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "embed_neardup_lsh": (q_embed_neardup_lsh, SQL_EMBED_NEARDUP_LSH),
    "ann_bruteforce_topk": (q_ann_bruteforce_topk, SQL_ANN_TOPK),
    "ann_lsh_buckets": (q_ann_lsh_buckets, SQL_ANN_LSH),
    "ann_lsh_topk": (q_ann_lsh_topk, SQL_ANN_LSH_TOPK),
    "ann_ivf_topk": (q_ann_ivf_topk, SQL_ANN_IVF_TOPK),
    "ann_ivf_kmeans_topk": (q_ann_ivf_kmeans_topk, SQL_ANN_IVF_KMEANS_TOPK),
    "ann_pq_adc_topk": (q_ann_pq_adc_topk, SQL_ANN_PQ_ADC_TOPK),
    "span_explode": (q_span_explode, SQL_SPAN_EXPLODE),
    "text_quality": (q_text_quality, SQL_TEXT_QUALITY),
    "text_langid": (q_text_langid, SQL_TEXT_LANGID),
    "text_langid_ngram": (q_text_langid_ngram, SQL_TEXT_LANGID_NGRAM),
    "pipeline_end_to_end": (q_pipeline_end_to_end, SQL_PIPELINE_E2E),
    "doc_fingerprint": (q_doc_fingerprint, SQL_FINGERPRINT),
    "doc_rolling_hash": (q_doc_rolling_hash, SQL_ROLLING_HASH),
    "token_stats_by_lang": (q_token_stats_by_lang, SQL_TOKEN_STATS),
    "token_bpe_stats": (q_token_bpe_stats, SQL_TOKEN_BPE),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL),
    "multimodal_frame_sample": (q_multimodal_frame_sample, SQL_MULTIMODAL_FRAMES),
    "media_span_join": (q_media_span_join, SQL_MEDIA_SPAN_JOIN),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
    "tfidf_cosine_pairs": (q_tfidf_cosine_pairs, SQL_TFIDF_COSINE_PAIRS),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION),
    "decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "lm_score_bigram": (q_lm_score_bigram, SQL_LM_SCORE),
    "dedup_chunks": (q_dedup_chunks, SQL_DEDUP_CHUNKS),
    "dedup_cdc_chunks": (q_dedup_cdc_chunks, SQL_DEDUP_CDC_CHUNKS),
    "source_rollup": (q_source_rollup, SQL_SOURCE_ROLLUP),
    "vocab_stats": (q_vocab_stats, SQL_VOCAB_STATS),
    "pii_scrub": (q_pii_scrub, SQL_PII_SCRUB),
    "dedup_clusters_converged": (
        q_dedup_clusters_converged,
        SQL_DEDUP_CLUSTERS_CONVERGED,
    ),
}

"""Round-5 training-data pipeline operators: corpus curation shapes.

Seven operators a 100 TB LLM-data pipeline runs downstream of crawl +
dedup, each with a DuckDB oracle (same cross-engine determinism rules as
queries/pipeline.py — md5 hex for hashes/ordering, integer or rounded
outputs, no cross-row float sums):

- containment_pairs: asymmetric Jaccard (|A∩B|/|A|) — quote/subset
  detection that symmetric Jaccard misses (a doc pasted inside a bigger
  one), the shape benchmark-decontamination sweeps use.
- dedup_keep_best: canonical-document selection — near-dup clusters keep
  their highest-quality member (max n_chars, tie → min doc_id), the step
  that turns cluster labels into an actual kept/dropped corpus.
- chunk_first_occurrence: exact-substring dedup WITH reconstruction
  counts — every duplicated chunk survives only in its first (min
  doc_id) document; per-doc kept-token accounting (Lee et al. 2022's
  dedup-then-count, in the distributed fixed-width-chunk form).
- split_assign: deterministic hash-based train/val/test split — split
  membership is a pure function of doc_id (md5 prefix), so it is stable
  across reshuffles/reruns and leakage-free by construction.
- source_balance: per-source quota sampling (domain balancing) — keep at
  most K docs per source, chosen by hash order, so no single crawl
  domain dominates the training mix.
- inverted_index: capped postings-list build (term → df + first-K
  sorted doc ids) — the retrieval-side artifact for corpus search /
  decontamination lookups.
- embed_kmeans_assign: one Lloyd assignment step against deterministic
  seed centroids — the IVF coarse-quantizer training shape, reduced to
  integer outputs for cross-engine equality.

Scale notes are per-operator in each docstring; the shared discipline:
shingle/term self-joins are document-frequency-capped BEFORE the join
(pipeline.SHINGLE_DF_CAP rationale), per-group top-k is two-phase salted
(operators/politeness.py pattern) instead of a single hot window, and
collect_list only ever sees df-capped groups.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from brink_spark.queries.iterate import min_label_propagate as _min_label_propagate
from brink_spark.queries.pipeline import (
    CHUNK_WORDS,
    SHINGLE_DF_CAP,
    _SQL_CAPPED_SHINGLES,
    _SQL_MINHASH_CTES,
    _SQL_SHINGLES,
    _SQL_STOP,
    _STOPWORDS,
    _capped_shingles,
    _docs,
    _emb,
    _sql_cc_round,
    q_dedup_minhash_lsh,
)

# --------------------------------------------------------------------------
# containment (asymmetric Jaccard): |A∩B| / |A|


CONTAINMENT_T = 0.8


def q_containment_pairs(spark, sf):
    """Directed containment pairs over word-3-gram shingle sets:
    C(src→dst) = |src ∩ dst| / |src| ≥ 0.8. Catches a short doc quoted
    inside a long one, where symmetric Jaccard ≈ |src|/|dst| stays far
    under any dedup threshold — the benchmark-contamination shape.
    Same df-capped shared-shingle candidate join as dedup_ngram_jaccard
    (one shuffle, SHINGLE_DF_CAP bounds every join partition); each
    unordered candidate pair then emits up to two directed rows, so the
    directed pass costs nothing extra. Filter is on the UNROUNDED ratio
    (the oracle's WHERE); rounding only decorates the output."""
    sh = _capped_shingles(spark, sf)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    both = inter.join(sa, "doc_a").join(sb, "doc_b")
    fwd = both.select(
        F.col("doc_a").alias("src_doc"),
        F.col("doc_b").alias("dst_doc"),
        "n_inter",
        (F.col("n_inter") / F.col("n_a")).alias("_c_raw"),
    )
    rev = both.select(
        F.col("doc_b").alias("src_doc"),
        F.col("doc_a").alias("dst_doc"),
        "n_inter",
        (F.col("n_inter") / F.col("n_b")).alias("_c_raw"),
    )
    return (
        fwd.unionByName(rev)
        .filter(F.col("_c_raw") >= CONTAINMENT_T)
        .select(
            "src_doc",
            "dst_doc",
            "n_inter",
            F.round("_c_raw", 4).alias("containment"),
        )
    )


SQL_CONTAINMENT = f"""
WITH {_SQL_SHINGLES},
{_SQL_CAPPED_SHINGLES},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
both_dirs AS (
  SELECT doc_a AS src_doc, doc_b AS dst_doc, n_inter,
         CAST(n_inter AS DOUBLE) / sa.n_sh AS c_raw
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a
  UNION ALL
  SELECT doc_b, doc_a, n_inter, CAST(n_inter AS DOUBLE) / sb.n_sh
  FROM inter JOIN sizes sb ON sb.doc_id = doc_b)
SELECT src_doc, dst_doc, n_inter, ROUND(c_raw, 4) AS containment
FROM both_dirs WHERE c_raw >= {CONTAINMENT_T}
"""


# --------------------------------------------------------------------------
# canonical-document selection per near-dup cluster


def q_dedup_keep_best(spark, sf):
    """Cluster → kept document: MinHash-LSH pairs → 3-round min-label
    propagation (same kernel + oracle CTEs as dedup_clusters) → per
    cluster keep the member with MAX n_chars, ties to MIN doc_id. Output
    (cluster_lbl, cluster_size, best_doc_id, best_n_chars). Argmax is
    done as two partial-agg groupBys (max join-back, then min over the
    tied set) — never a per-cluster window, so a degenerate mega-cluster
    (all-identical boilerplate) costs two combiner passes, not one
    straggler task."""
    pairs = q_dedup_minhash_lsh(spark, sf)
    und = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = _min_label_propagate(und.distinct(), rounds=3)
    d = _docs(spark, sf).select(F.col("doc_id").alias("node"), "n_chars")
    members = labels.join(d, "node")
    agg = members.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max("n_chars").alias("best_n_chars"),
    )
    best = (
        members.join(
            agg.select("lbl", F.col("best_n_chars").alias("n_chars")),
            ["lbl", "n_chars"],
        )
        .groupBy("lbl")
        .agg(F.min("node").alias("best_doc_id"))
    )
    return (
        agg.join(best, "lbl")
        .select(
            F.col("lbl").alias("cluster_lbl"),
            "cluster_size",
            "best_doc_id",
            "best_n_chars",
        )
    )


SQL_DEDUP_KEEP_BEST = f"""
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
members AS (
  SELECT l.lbl, l.node, d.n_chars FROM l3 l JOIN documents d ON d.doc_id = l.node),
agg AS (
  SELECT lbl, COUNT(*) AS cluster_size, MAX(n_chars) AS best_n_chars
  FROM members GROUP BY lbl)
SELECT a.lbl AS cluster_lbl, a.cluster_size, MIN(m.node) AS best_doc_id,
       a.best_n_chars
FROM agg a JOIN members m ON m.lbl = a.lbl AND m.n_chars = a.best_n_chars
GROUP BY 1, 2, 4
"""


# --------------------------------------------------------------------------
# exact-substring dedup with reconstruction accounting


def q_chunk_first_occurrence(spark, sf):
    """Global first-occurrence chunk dedup: every duplicated fixed-width
    word chunk is kept only in its owner document (the MIN doc_id that
    contains it); all other instances are dropped. Per doc: total chunk
    instances, kept instances, and the reconstructed kept token count —
    the accounting a dedup job reports before rewriting the corpus.
    Ownership is a partial-agg groupBy(chunk).min(doc_id) joined back on
    chunk (ONE row per chunk on the build side, so AQE splits a
    boilerplate mega-chunk's probe rows instead of funneling them into
    one task — the same skew shape dedup_chunks documents)."""
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
    owner = inst.groupBy("chunk").agg(F.min("doc_id").alias("owner_doc"))
    return (
        inst.join(owner, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("doc_id") == F.col("owner_doc")).alias("n_kept"),
            (
                F.count_if(F.col("doc_id") == F.col("owner_doc"))
                * CHUNK_WORDS
            ).cast("bigint").alias("kept_words"),
        )
    )


SQL_CHUNK_FIRST_OCCURRENCE = f"""
WITH inst AS (
  SELECT doc_id,
         array_to_string(w[(i - 1) * {CHUNK_WORDS} + 1 : i * {CHUNK_WORDS}], ' ') AS chunk
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) words,
       UNNEST(generate_series(1, len(w) // {CHUNK_WORDS})) AS t(i)
  WHERE len(w) >= {CHUNK_WORDS}),
owner AS (SELECT chunk, MIN(doc_id) AS owner_doc FROM inst GROUP BY chunk)
SELECT doc_id, COUNT(*) AS n_chunks,
       COUNT(*) FILTER (doc_id = owner_doc) AS n_kept,
       CAST(COUNT(*) FILTER (doc_id = owner_doc) * {CHUNK_WORDS} AS BIGINT)
         AS kept_words
FROM inst JOIN owner USING (chunk)
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# deterministic train/val/test split


def q_split_assign(spark, sf):
    """Hash-split assignment: split = f(md5(doc_id)) — the first two hex
    chars partition [00..ff] into train (< 'cd', 205/256 ≈ 80.1%), val
    ('cd'..'e5', 25/256 ≈ 9.8%), test (the rest, ≈ 10.2%). Membership is
    a pure doc_id function: stable under reshuffles/recrawls and
    leakage-free by construction (no doc can change split between runs).
    Thresholds compare hex STRINGS lexicographically — exact and
    identical in both engines, no hex→int conversion needed. Output:
    split × lang doc and word counts (the mix report). Scale: one
    map-side classify + one partial-agg groupBy; no joins."""
    d = _docs(spark, sf)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return (
        d.withColumn(
            "split",
            F.when(h2 < "cd", "train").when(h2 < "e6", "val").otherwise("test"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_words"),
        )
    )


SQL_SPLIT_ASSIGN = """
SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words
FROM documents GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# per-source quota sampling (domain balancing)


SOURCE_QUOTA = 10


def q_source_balance(spark, sf):
    """Domain balancing: keep at most K docs per source, chosen by hash
    order (md5(doc_id), doc_id) so the sample is deterministic and
    unbiased by ingest order. Two-phase salted top-k (the politeness
    scheduler's shape): phase 1 takes the per-(source, salt) top-K, so
    no task ever sorts more than one salt shard of a hot source; phase 2
    tops-K the ≤ salts×K survivors per source. Union-of-per-salt-top-K ⊇
    global-top-K makes the result EXACTLY equal to the single-window
    form (tests assert it; the oracle IS the single-window form)."""
    d = _docs(spark, sf).select(
        "source",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    d = d.withColumn("_salt", F.pmod("doc_id", F.lit(8)))
    w1 = Window.partitionBy("source", "_salt").orderBy("h", "doc_id")
    phase1 = (
        d.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= SOURCE_QUOTA)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        phase1.withColumn("ord", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("ord") <= SOURCE_QUOTA)
        .select("source", "doc_id", "ord")
    )


SQL_SOURCE_BALANCE = f"""
SELECT source, doc_id, ord FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS ord
  FROM documents)
WHERE ord <= {SOURCE_QUOTA}
"""


# --------------------------------------------------------------------------
# capped inverted index


IDX_DF_MIN, IDX_POSTINGS = 2, 10


def q_inverted_index(spark, sf):
    """Postings-list build over corpus terms: term → document frequency +
    the first K doc ids (ascending, comma-joined — a string so the
    driver's cell hash is engine-neutral). Hapax terms (df < 2) carry no
    lookup value and stopword-frequency terms are cut by a RELATIVE cap
    (df·10 ≤ n_docs·8, i.e. df ≤ 80% of the corpus — pure integer
    arithmetic, identical in both engines and scale-invariant where an
    absolute cap is not). The first-K selection is the salted two-phase
    top-k (source_balance's shape): per-(term, salt) top-K first, so a
    near-stopword term's postings never sort in one task; the final
    collect_list only ever sees ≤ K rows per term. The df-filter join
    has one row per term on the build side; n_docs rides in as a 1-row
    broadcast (scalar BNLJ, the whitelisted shape)."""
    d = _docs(spark, sf)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
    )
    df = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(n))
        .filter(
            (F.col("df") >= IDX_DF_MIN)
            & (F.col("df") * 10 <= F.col("n_docs") * 8)
        )
        .select("term", "df")
    )
    cand = pairs.join(df, "term").withColumn(
        "_salt", F.pmod("doc_id", F.lit(8))
    )
    w1 = Window.partitionBy("term", "_salt").orderBy("doc_id")
    phase1 = (
        cand.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= IDX_POSTINGS)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("term").orderBy("doc_id")
    topk = phase1.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") <= IDX_POSTINGS
    )
    return (
        topk.groupBy("term", "df")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings")
        )
        .select("term", "df", "postings")
    )


SQL_INVERTED_INDEX = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
df AS (
  SELECT term, COUNT(*) AS df FROM pairs, n GROUP BY term, n.n_docs
  HAVING COUNT(*) >= {IDX_DF_MIN} AND COUNT(*) * 10 <= n.n_docs * 8)
SELECT term, df,
       array_to_string(
         list_transform(
           list_slice(list(doc_id ORDER BY doc_id), 1, {IDX_POSTINGS}),
           x -> CAST(x AS VARCHAR)),
         ',') AS postings
FROM pairs JOIN df USING (term)
GROUP BY term, df
"""


# --------------------------------------------------------------------------
# one Lloyd assignment step (IVF coarse-quantizer training shape)


KMEANS_K = 8


def q_embed_kmeans_assign(spark, sf):
    """One k-means assignment step against deterministic seed centroids
    (the embeddings of vec_id 0..K-1 — k-means++ would be a second pass;
    the ASSIGNMENT shape is what matters): each vector goes to the
    centroid minimizing squared L2, ties to the lower centroid id.
    Distances are computed in DOUBLE with the same left-to-right
    fold both engines use for array sums and ROUNDed to 4 before the
    argmin, so the comparison is bit-stable cross-engine; outputs are
    integers only. Scale: the K-row centroid table broadcasts (K ≪
    partitions); per-vector work is K native HOF folds inside codegen;
    the argmin window partitions by vec_id (exactly K rows per group —
    skew-free by construction). This is the IVF training loop's inner
    step (ann_ivf_topk consumes such centroids)."""
    e = _emb(spark, sf)
    cents = e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cvec")
    )
    d2 = F.expr(
        "aggregate(zip_with(embedding, cvec,"
        " (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " 0D, (acc, v) -> acc + v)"
    )
    scored = (
        e.select("vec_id", "embedding")
        .join(F.broadcast(cents))
        .withColumn("d2r", F.round(d2, 4))
    )
    w = Window.partitionBy("vec_id").orderBy("d2r", "centroid_id")
    assigned = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.min("vec_id").alias("min_vec_id"),
    )


SQL_EMBED_KMEANS = f"""
WITH cents AS (
  SELECT vec_id AS centroid_id, embedding AS cvec FROM embeddings
  WHERE vec_id < {KMEANS_K}),
scored AS (
  SELECT e.vec_id, c.centroid_id,
         ROUND((SELECT SUM((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
                           * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)))
                FROM (SELECT unnest(e.embedding) AS x,
                             unnest(c.cvec) AS y)), 4) AS d2r
  FROM embeddings e CROSS JOIN cents c),
assigned AS (
  SELECT vec_id, centroid_id FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                             ORDER BY d2r, centroid_id) = 1)
SELECT centroid_id, COUNT(*) AS n_assigned, MIN(vec_id) AS min_vec_id
FROM assigned GROUP BY centroid_id
"""


# --------------------------------------------------------------------------
# sequence packing: fixed-width context-window assembly
#
# The last step before tokenized text hits the trainer: documents are
# concatenated in a deterministic order and cut into fixed PACK_WINDOW-
# token context windows (GPT-style packing with document splitting). The
# hard part at scale is the GLOBAL running token offset — a naive
# Window.orderBy() with no partition key funnels the whole corpus through
# one task. This implementation is the textbook distributed prefix sum:
#   1. bucket by a DETERMINISTIC range function of the order key — the
#      first byte of md5(doc_id) maps to pid = byte*P div 256, which is
#      monotone in the key (bucket order == global order) and uniform
#      (md5). NOT repartitionByRange: its sampled boundaries differ
#      between the totals job and the final job (two actions, two
#      samples), which mis-applies the offsets — observed as mid-stream
#      703-token windows at sf0.1;
#   2. per-bucket running sums in parallel (Window by pid);
#   3. bucket token TOTALS (a partial-agg groupBy, P rows) come to the
#      driver, turn into P prefix offsets, and broadcast-join back.
# The result is invariant to the bucket count — pinned by
# tests/test_training_queries.py running the same input at P=2 and P=16.
# All arithmetic downstream of the token counts is int64, so the window
# accounting hash-matches DuckDB's single-ORDER-BY mirror exactly.


PACK_WINDOW = 1024
PACK_PARTS = 16


def _pack_spans(spark, sf, parts):
    """(doc_id, tok_start, cum_end): global token span per doc under the
    md5(doc_id) concatenation order, via the two-phase prefix sum.

    Bucket id from the first TWO md5 bytes (65,536 range buckets max):
    still monotone in the order key (a bucket is a prefix range of h, so
    bucket order == global order) and uniform, but the per-bucket sort
    window can now scale past 256 tasks — the straggler ceiling the
    one-byte form had at 100 TB. The packed spans are invariant to the
    bucketing by construction (range buckets + exact offsets; pinned
    across parts values by tests/test_training_queries.py), and for the
    shipped parts=16 the two-byte boundaries coincide exactly with the
    old one-byte ones (b0*16 is a multiple of 16 mod 256, so the low
    byte can never push (256*r + b1*16) past 65,536). The driver-side
    offset table stays KB-scale even at 65,536 rows."""
    if not 1 <= parts <= 65536:
        raise ValueError(
            f"parts must be in [1, 65536] (two md5 bytes), got {parts}"
        )
    d = _docs(spark, sf).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    p = d.withColumn(
        "pid",
        F.expr(f"int((conv(substring(h, 1, 4), 16, 10) * {parts}) div 65536)"),
    )
    totals = {
        r["pid"]: r["tot"]
        for r in p.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect()
    }
    acc, off = 0, []
    for pid in sorted(totals):
        off.append((pid, acc))
        acc += totals[pid]
    odf = spark.createDataFrame(off, "pid int, off long")
    wloc = Window.partitionBy("pid").orderBy("h", "doc_id")
    return (
        p.withColumn("loc_end", F.sum("n_tok").over(wloc))
        .join(F.broadcast(odf), "pid")
        .select(
            "doc_id",
            (F.col("loc_end") + F.col("off") - F.col("n_tok")).alias("tok_start"),
            (F.col("loc_end") + F.col("off")).alias("cum_end"),
        )
    )


def q_pack_sequences(spark, sf, parts=PACK_PARTS):
    """Per-context-window packing report: how many documents land in each
    PACK_WINDOW-token window, how many tokens it holds (== PACK_WINDOW
    except the last), and how many documents continue across its right
    boundary (the attention-masking boundary count trainers need). A doc
    spanning [tok_start, cum_end) explodes into its floor-div window
    range — bounded by max_doc_tokens/PACK_WINDOW rows, then one
    partial-agg groupBy(window_id)."""
    W = PACK_WINDOW
    e = _pack_spans(spark, sf, parts)
    x = e.select(
        "tok_start",
        "cum_end",
        F.explode(
            F.sequence(
                F.expr(f"tok_start div {W}"), F.expr(f"(cum_end - 1) div {W}")
            )
        ).alias("window_id"),
    )
    return x.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.least(F.col("cum_end"), (F.col("window_id") + 1) * W)
            - F.greatest(F.col("tok_start"), F.col("window_id") * W)
        ).alias("n_tokens"),
        F.sum(
            F.when(F.col("cum_end") > (F.col("window_id") + 1) * W, 1).otherwise(0)
        ).cast("bigint").alias("n_continuations"),
    )


SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY h, doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT)
           AS cum_end
  FROM t),
x AS (
  SELECT cum_end - n_tok AS tok_start, cum_end,
         unnest(generate_series((cum_end - n_tok) // {PACK_WINDOW},
                                (cum_end - 1) // {PACK_WINDOW})) AS window_id
  FROM c)
SELECT window_id, COUNT(*) AS n_docs,
       CAST(SUM(LEAST(cum_end, (window_id + 1) * {PACK_WINDOW})
                - GREATEST(tok_start, window_id * {PACK_WINDOW})) AS BIGINT)
         AS n_tokens,
       CAST(SUM(CASE WHEN cum_end > (window_id + 1) * {PACK_WINDOW}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_continuations
FROM x GROUP BY 1
"""


# --------------------------------------------------------------------------
# temperature-balanced language sampling


LANG_SAMPLE_TARGET = 100


def q_lang_balanced_sample(spark, sf):
    """Multilingual temperature sampling (the mBERT/XLM-R rebalance,
    alpha = 0.5): per-language quotas proportional to sqrt(count) instead
    of count, so head languages shrink and tail languages grow in the
    training mix. All quota arithmetic is EXACT integer so both engines
    agree bit-for-bit: isqrt_l = floor(sqrt(c_l)) (IEEE sqrt is correctly
    rounded, so floor of it is deterministic), total = sum of int64s
    (order-free), quota_l = greatest((TARGET * isqrt_l) div total, 1).
    Within a language, docs are chosen by hash order (md5(doc_id),
    doc_id) via the two-phase salted top-k (source_balance's shape) so a
    head language never sorts in one task; the oracle is the
    single-window form — exact equality is the losslessness proof.

    Scale: one partial-agg groupBy(lang) for counts (a handful of rows,
    broadcast back), one salted selection pass; quota never exceeds
    TARGET so the phase-2 window sees ≤ salts×TARGET rows per language
    regardless of corpus size."""
    d = _docs(spark, sf).select(
        "lang",
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn(
        "isqrt", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint")
    )
    total = counts.agg(F.sum("isqrt").alias("tot"))
    quotas = (
        counts.join(F.broadcast(total))
        .withColumn(
            "quota",
            F.greatest(
                F.expr(f"({LANG_SAMPLE_TARGET} * isqrt) div tot"), F.lit(1)
            ),
        )
        .select("lang", "n_docs", "quota")
    )
    d = d.join(F.broadcast(quotas), "lang")
    d = d.withColumn("_salt", F.pmod("doc_id", F.lit(8)))
    w1 = Window.partitionBy("lang", "_salt").orderBy("h", "doc_id")
    phase1 = (
        d.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= F.col("quota"))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        phase1.withColumn("ord", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("ord") <= F.col("quota"))
        .select("lang", "doc_id", "ord", "quota")
    )


SQL_LANG_BALANCED_SAMPLE = f"""
WITH c AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS isqrt
  FROM documents GROUP BY 1),
q AS (
  SELECT lang,
         GREATEST(({LANG_SAMPLE_TARGET} * isqrt)
                  // (SELECT SUM(isqrt) FROM c), 1) AS quota
  FROM c),
r AS (
  SELECT d.lang, d.doc_id, q.quota,
         ROW_NUMBER() OVER (PARTITION BY d.lang
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS ord
  FROM documents d JOIN q ON d.lang = q.lang)
SELECT lang, doc_id, CAST(ord AS BIGINT) AS ord, CAST(quota AS BIGINT) AS quota
FROM r WHERE ord <= quota
"""


# --------------------------------------------------------------------------
# per-source quality prior with doc-level join-back


def q_quality_source_prior(spark, sf):
    """Domain-prior quality filtering (the curation rule "judge a page
    against its own site"): per-doc integer quality = stopword density
    ×1000, per-source prior = the integer mean of its docs' scores, and a
    join-back flags docs scoring under HALF their source's prior — the
    boilerplate/navigation/junk pages of an otherwise-good domain, which
    a single global threshold either misses (good domain, mediocre page)
    or over-fires on (tail-language domains score low globally). All
    arithmetic is exact int64 (×1000 then `div`), so both engines agree.

    Scale: one partial-agg groupBy(source) and one equi-join back on
    source. The prior table has one row per source (registrable domains —
    millions, not documents — at web scale), so the join-back is left to
    AQE: broadcast when dim-sized, shuffle-hash when not; no hint pins
    the wrong strategy at either end."""
    d = _docs(spark, sf)
    w = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    per = d.select(
        "doc_id",
        "source",
        (
            F.size(F.filter(w, lambda t: F.array_contains(stop_arr, t)))
            * F.lit(1000)
        ).alias("_stop_x1000"),
        F.size(w).alias("_n_tok"),
    ).select(
        "doc_id",
        "source",
        F.expr("_stop_x1000 div _n_tok").alias("quality"),
    )
    prior = per.groupBy("source").agg(
        F.expr("sum(quality) div count(*)").alias("prior"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        per.join(prior, "source")
        .select(
            "doc_id",
            "source",
            "quality",
            "prior",
            (F.col("quality") * 2 < F.col("prior")).alias("below_prior"),
        )
    )


SQL_QUALITY_SOURCE_PRIOR = f"""
WITH per AS (
  SELECT doc_id, source,
         (len(list_filter(string_split(text, ' '), t -> t IN {_SQL_STOP}))
          * 1000) // len(string_split(text, ' ')) AS quality
  FROM documents),
pr AS (
  SELECT source, SUM(quality) // COUNT(*) AS prior
  FROM per GROUP BY 1)
SELECT per.doc_id, per.source, CAST(per.quality AS BIGINT) AS quality,
       CAST(pr.prior AS BIGINT) AS prior,
       per.quality * 2 < pr.prior AS below_prior
FROM per JOIN pr ON per.source = pr.source
"""


TRAINING_QUERIES = {
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "containment_pairs": (q_containment_pairs, SQL_CONTAINMENT),
    "dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "chunk_first_occurrence": (
        q_chunk_first_occurrence,
        SQL_CHUNK_FIRST_OCCURRENCE,
    ),
    "split_assign": (q_split_assign, SQL_SPLIT_ASSIGN),
    "source_balance": (q_source_balance, SQL_SOURCE_BALANCE),
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "embed_kmeans_assign": (q_embed_kmeans_assign, SQL_EMBED_KMEANS),
    "lang_balanced_sample": (q_lang_balanced_sample, SQL_LANG_BALANCED_SAMPLE),
    "quality_source_prior": (
        q_quality_source_prior,
        SQL_QUALITY_SOURCE_PRIOR,
    ),
}

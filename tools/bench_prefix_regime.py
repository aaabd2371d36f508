"""Measure the regime where prefix filtering WINS — the complement of the
honest crossover note in BENCH/BASELINE.md (on tail-free corpora the
prefix machinery is pure overhead; bench_scale_proof.py shows that side).

Corpus shape: the templated-web worst case for the shared-shingle join.
Every doc is 15 four-word phrases drawn by hash from a 20k-phrase pool, so
each phrase-internal 3-gram lands in ~37 UNRELATED docs (df below
SHINGLE_DF_CAP=50 — the cap cannot help) while phrase-boundary 3-grams are
essentially unique. The unpruned join must pay sum(df^2) over every
mid-frequency shingle — tens of millions of intersect rows for pairs whose
Jaccard is nowhere near threshold; the prefix join's rarest-first prefixes
are filled by the unique boundary grams, so templated shingles mostly never
enter the candidate join. Near-dup pairs are planted (even/odd doc pairs
sharing 14 of 15 phrases, J = 14/16 = 0.875) for a non-trivial answer, and
the two queries' outputs are asserted EQUAL — losslessness demonstrated on
a second corpus shape, not just the driver-gate tables.

Usage: python tools/bench_prefix_regime.py [n_docs] [out_json]
Round record: BENCH/prefix_regime_r4.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS_DEFAULT = 50_000
PHRASE_POOL = 20_000
PHRASES_PER_DOC = 15
PLANT_MOD = 20  # pmod(doc_id, 20) < 2 -> even/odd near-dup pair


def synth_templated_corpus(spark, n_docs: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # Planted near-dups: for doc_id = 2k/2k+1 with pmod(doc_id,20)<2, the
    # first 14 phrases hash from the shared group id, the 15th from the
    # doc's own id — 14/15 shared phrases, Jaccard ~0.875 on 3-grams.
    group = F.when(
        F.pmod("doc_id", F.lit(PLANT_MOD)) < 2,
        F.col("doc_id") - F.pmod("doc_id", F.lit(2)),
    ).otherwise(F.col("doc_id"))
    df = df.withColumn("grp", group)
    phrase = (
        "transform(sequence(0, {np1}), j -> concat_ws(' ', "
        "transform(sequence(0, 3), k -> concat('p', "
        "pmod(xxhash64((CASE WHEN j < {nshare} THEN grp ELSE doc_id END) "
        "* 31 + j), {pool}), 'w', k))))"
    ).format(np1=PHRASES_PER_DOC - 1, nshare=PHRASES_PER_DOC - 1, pool=PHRASE_POOL)
    df = df.select(
        "doc_id",
        F.array_join(F.expr(phrase), " ").alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    df.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def synth_boiler_corpus(spark, n_docs: int, out_dir: str, every: int) -> None:
    """Phrase corpus + every Nth doc carries an identical 30-word
    boilerplate block — UNCAPPED hot shingles (df = n_docs/every).
    Near-dup pairs are planted exactly as in the templated corpus so the
    losslessness assertion covers a non-empty answer here too."""
    from pyspark.sql import functions as F

    boiler = " ".join(f"boiler{i}" for i in range(30))
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    group = F.when(
        F.pmod("doc_id", F.lit(PLANT_MOD)) < 2,
        F.col("doc_id") - F.pmod("doc_id", F.lit(2)),
    ).otherwise(F.col("doc_id"))
    df = df.withColumn("grp", group)
    phrase = (
        "transform(sequence(0, {np1}), j -> concat_ws(' ', "
        "transform(sequence(0, 3), k -> concat('p', "
        "pmod(xxhash64((CASE WHEN j < {nshare} THEN grp ELSE doc_id END) "
        "* 31 + j), {pool}), 'w', k))))"
    ).format(np1=PHRASES_PER_DOC - 1, nshare=PHRASES_PER_DOC - 1, pool=PHRASE_POOL)
    words = F.array_join(F.expr(phrase), " ")
    df = df.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(every)) == 0,
            F.concat(F.lit(boiler + " "), words),
        )
        .otherwise(words)
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    df.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def _time_pair(spark, pl, work, reps=2):
    """Min-of-reps walls for the unpruned and prefix-filtered Jaccard
    queries on the same corpus, asserting identical output pair sets."""
    walls: dict[str, float] = {}
    outputs: dict[str, set] = {}
    order = [
        ("full", pl.q_dedup_ngram_jaccard),
        ("prefix", pl.q_dedup_jaccard_prefix),
    ] * reps
    for name, fn in order:
        t0 = time.time()
        rows = {tuple(r) for r in fn(spark, work).collect()}
        dt = round(time.time() - t0, 2)
        walls[name] = min(walls.get(name, dt), dt)
        outputs[name] = rows
        print(f"# {name}: {dt}s, {len(rows)} pairs", file=sys.stderr)
    assert outputs["full"] == outputs["prefix"], "prefix join lost pairs!"
    return walls, len(outputs["full"])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    every = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from brink_spark.session import get_spark
    import brink_spark.queries.pipeline as pl

    work = "/dev/shm/brink_prefix_regime"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark(
        "local[32]",
        app_name="brink_prefix_regime",
        shuffle_partitions=32,
        extra={"spark.ui.showConsoleProgress": "false"},
    )

    # Regime A — capped (production default), templated mid-tail corpus:
    # with the df-cap active both plans are bounded; expect rough parity.
    synth_templated_corpus(spark, n_docs, work)
    walls_a, pairs_a = _time_pair(spark, pl, work)

    # Regime B — CAP DISABLED, boilerplate corpus (hot shingles df=2000):
    # the cap is a LOSSY bound (it drops hot shingles' pair evidence);
    # when exact recall over hot shingles is required the unpruned join
    # must pay df^2 per hot shingle while rarest-first prefixes exclude
    # them. This is prefix filtering as the lossless alternative.
    orig = pl._capped_shingles
    try:
        pl._capped_shingles = pl._shingles
        synth_boiler_corpus(spark, n_docs, work, every=every)
        walls_b, pairs_b = _time_pair(spark, pl, work, reps=1)
    finally:
        pl._capped_shingles = orig

    verdict = {
        "n_docs": n_docs,
        "regime_a_capped_templated": {
            "mid_tail_df": round(n_docs * PHRASES_PER_DOC / PHRASE_POOL, 1),
            "pairs": pairs_a,
            "wall_full_sec": walls_a["full"],
            "wall_prefix_sec": walls_a["prefix"],
            "speedup": round(walls_a["full"] / walls_a["prefix"], 2),
        },
        "regime_b_uncapped_boilerplate": {
            "hot_shingle_df": n_docs // every,
            "pairs": pairs_b,
            "wall_full_sec": walls_b["full"],
            "wall_prefix_sec": walls_b["prefix"],
            "speedup": round(walls_b["full"] / walls_b["prefix"], 2),
        },
        "outputs_equal": True,
    }
    print(json.dumps(verdict))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(verdict, f, indent=1)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

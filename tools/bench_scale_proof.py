"""Scale-proof the similarity-suite skew caps beyond toy SF (r3 verdict
item 8): run the text-dedup suite on a one-off sf1-SIZED synthetic corpus
(50k docs — 10x sf0.1) with an INJECTED boilerplate block (12.5% of all
docs share an identical 30-word prefix — the 'boilerplate host' shape
that makes shared-shingle joins and LSH band buckets explode), and audit
task-level skew from the Spark event log.

No oracle here — the claim under test is operational, not semantic:
SHINGLE_DF_CAP / BAND_BUCKET_CAP / _drop_hot_keys / AQE skew-split keep
the job (a) completing and (b) free of stragglers, defined as no task
exceeding 10x the median task duration within its stage (measured over
every stage with >= 8 tasks, where a straggler could actually serialize
a wave of work; tiny 1-4-task driver-side stages are reported but not
gated). Correctness of the same operators is the driver gate's job at
sf0.01 (tools/check_queries.py, 59/59).

Usage: python tools/bench_scale_proof.py [n_docs] [out_json]
Writes the JSON verdict line to stdout and (optionally) out_json; the
round's record lives at BENCH/scale_proof_r4.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS_DEFAULT = 50_000
BOILER_EVERY = 8  # doc_id % 8 == 0 -> carries the shared boilerplate block
VOCAB = 5_000
WORDS_PER_DOC = 60
STRAGGLER_RATIO = 10.0
MIN_TASKS_GATED = 8


def synth_corpus(spark, n_docs: int, out_dir: str) -> None:
    """Deterministic 50k-doc corpus, generated IN Spark (no driver loop):
    text is hash-derived words; every BOILER_EVERY-th doc starts with the
    same 30-word boilerplate block, so those docs share all shingles in
    that span — the hot-key worst case for shingle joins and LSH bands."""
    from pyspark.sql import functions as F

    boiler = " ".join(f"boiler{i}" for i in range(30))
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    words = F.expr(
        f"concat_ws(' ', transform(sequence(1, {WORDS_PER_DOC}),"
        f" i -> concat('w', pmod(xxhash64(doc_id * 1000 + i), {VOCAB}))))"
    )
    df = df.select(
        "doc_id",
        F.when(
            F.col("doc_id") % BOILER_EVERY == 0,
            F.concat(F.lit(boiler + " "), words),
        )
        .otherwise(words)
        .alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod("doc_id", F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.pmod("doc_id", F.lit(3)) + 1).cast("int"),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    df.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )


def task_skew(eventlog_dir: str) -> list[dict]:
    """Per-stage task-duration skew from the newest event log file."""
    entries = sorted(
        (os.path.join(eventlog_dir, f) for f in os.listdir(eventlog_dir)
         if not f.startswith(".")),
        key=os.path.getmtime,
    )
    newest = entries[-1]
    if os.path.isdir(newest):  # Spark 4 rolling layout: events_* inside
        files = sorted(
            os.path.join(newest, f)
            for f in os.listdir(newest)
            if f.startswith("events_")
        )
    else:
        files = [newest]
    stages: dict[int, list[float]] = {}
    names: dict[int, str] = {}
    lines = (ln for f in files for ln in open(f))
    for line in lines:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
            stages.setdefault(ev["Stage ID"], []).append(dur)
        elif ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            names[si["Stage ID"]] = si["Stage Name"].split("\n")[0]
    out = []
    for sid, durs in sorted(stages.items()):
        durs.sort()
        med = durs[len(durs) // 2] or 1e-3
        out.append(
            {
                "stage": sid,
                "name": names.get(sid, "?")[:60],
                "n_tasks": len(durs),
                "median_s": round(med, 3),
                "max_s": round(durs[-1], 3),
                "ratio": round(durs[-1] / med, 2),
            }
        )
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    out_json = sys.argv[2] if len(sys.argv) > 2 else None

    from brink_spark.session import get_spark
    import brink_spark.queries.pipeline as pl

    work = "/dev/shm/brink_scaleproof"
    evdir = f"{work}/eventlog"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(evdir)
    spark = get_spark(
        "local[32]",
        app_name="brink_scale_proof",
        shuffle_partitions=32,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    synth_corpus(spark, n_docs, work)

    suite = {
        "dedup_minhash_lsh": pl.q_dedup_minhash_lsh,
        "dedup_ngram_jaccard": pl.q_dedup_ngram_jaccard,
        "dedup_jaccard_prefix": pl.q_dedup_jaccard_prefix,
        "dedup_incremental": pl.q_dedup_incremental,
        "dedup_clusters_converged": pl.q_dedup_clusters_converged,
        "dedup_chunks": pl.q_dedup_chunks,
    }
    walls, rows = {}, {}
    for name, fn in suite.items():
        t0 = time.time()
        rows[name] = fn(spark, work).count()
        walls[name] = round(time.time() - t0, 2)
        print(f"# {name}: {walls[name]}s, {rows[name]} rows", file=sys.stderr)

    spark.stop()  # flush the event log
    skew = task_skew(evdir)
    gated = [s for s in skew if s["n_tasks"] >= MIN_TASKS_GATED]
    worst = max(gated, key=lambda s: s["ratio"]) if gated else None
    verdict = {
        "n_docs": n_docs,
        "boilerplate_docs": n_docs // BOILER_EVERY,
        "walls_sec": walls,
        "rows": rows,
        "n_stages_gated": len(gated),
        "worst_gated_stage": worst,
        "max_task_sec": max((s["max_s"] for s in skew), default=0),
        "straggler_free": bool(
            worst is None or worst["ratio"] <= STRAGGLER_RATIO
        ),
        "criterion": f"no task > {STRAGGLER_RATIO}x stage median "
        f"(stages with >= {MIN_TASKS_GATED} tasks)",
    }
    print(json.dumps(verdict))
    if out_json:
        with open(out_json, "w") as f:
            json.dump({**verdict, "stages": skew}, f, indent=1)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

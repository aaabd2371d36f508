"""applyInPandasWithState sessionizer: state carries across micro-batches
(two time-ordered files, maxFilesPerTrigger=1) and the drained totals equal
the batch lag+cumsum sessionization (q_events_sessionize)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """events split into two parquet files at the median ts — per-user
    arrival order across batches matches event-time order."""
    d = tmp_path_factory.mktemp("events_split")
    tbl = pq.read_table(f"{SF}/events.parquet")
    order = pa.compute.sort_indices(tbl, sort_keys=[("ts", "ascending")])
    tbl = tbl.take(order)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(d / "part-0.parquet"))
    pq.write_table(tbl.slice(half), str(d / "part-1.parquet"))
    now = time.time()
    os.utime(d / "part-0.parquet", (now - 60, now - 60))
    os.utime(d / "part-1.parquet", (now, now))
    return str(d)


def test_stateful_sessionizer_matches_batch(spark, split_events_dir, tmp_path):
    from brink_spark.queries.relational import q_events_sessionize
    from brink_spark.streaming.stateful import sessionize_stream

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in q_events_sessionize(spark, SF).collect()
    }

    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(split_events_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sessions_state")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM sessions_state").collect()
    # state really crossed a batch boundary: some user reached version 2
    assert max(r["version"] for r in rows) == 2
    latest = {}
    for r in rows:
        if r["user_id"] not in latest or r["version"] > latest[r["user_id"]][2]:
            latest[r["user_id"]] = (r["n_sessions"], r["n_events"], r["version"])
    got = {u: (s, e) for u, (s, e, _) in latest.items()}
    assert got == want

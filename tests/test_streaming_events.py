"""Structured Streaming surface over the events table: a file-stream with
watermarked tumbling windows must converge to the batch answer once the
stream drains (the brief's watermark + windowed-agg shape, next to the
frontier-stream tests that cover the crawl loop)."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_streaming_tumbling_matches_batch(spark, tmp_path):
    # events.ts is TIMESTAMP_NTZ; watermarks require event time with a
    # timezone-bearing TIMESTAMP — cast identically on both sides
    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events")
    )
    want = {(r["ws"], r["event_type"]): r["n_events"] for r in batch.collect()}

    # the file-stream source needs a DIRECTORY (testdata ships single
    # parquet files) — stage the file into one
    import shutil

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")

    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events")
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_tumbling")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["ws"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM ev_tumbling").collect()
    }
    assert got == want


def test_streaming_hopping_matches_batch(spark, tmp_path):
    """Hopping (sliding) windows under a watermark: every event lands in
    TWO overlapping 1-hour windows (30-min hop); the drained stream must
    equal the batch q_events_hopping semantics exactly."""
    import shutil

    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events")
    )
    want = {(r["ws"], r["event_type"]): r["n_events"] for r in batch.collect()}
    n_rows = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(want.values()) == 2 * n_rows  # each event in exactly 2 windows

    src_dir = tmp_path / "events_hop_in"
    src_dir.mkdir()
    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    schema = spark.read.parquet(f"{SF}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events")
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_hopping")
        .option("checkpointLocation", str(tmp_path / "ckpt_hop"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["ws"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM ev_hopping").collect()
    }
    assert got == want


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """The SAME F.session_window operator the batch query uses
    (events_session_window) run as a stream, with the input split into
    two files so sessions must MERGE ACROSS MICRO-BATCHES: per-user rows
    interleave between the files, and a 30-min session begun in batch 1
    can be extended by batch 2. Draining the stream must converge to the
    batch answer exactly."""
    import shutil

    batch = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .select("user_id", F.col("w.start").alias("ws"), "n_ev")
    )
    want = {(r["user_id"], r["ws"]): r["n_ev"] for r in batch.collect()}

    src_dir = tmp_path / "events_in"
    src_dir.mkdir()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    # even/odd event_id split interleaves every user's timeline across
    # the two files (NOT a time split — that would never exercise merge)
    ev.where(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        str(tmp_path / "f0")
    )
    ev.where(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        str(tmp_path / "f1")
    )
    for i in (0, 1):
        part = next((tmp_path / f"f{i}").glob("part-*.parquet"))
        shutil.copy(part, src_dir / f"batch-{i}.parquet")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)  # force two micro-batches
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 days")  # hold all state until drain
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_ev"))
        .select("user_id", F.col("w.start").alias("ws"), "n_ev")
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["ws"]): r["n_ev"]
        for r in spark.sql("SELECT * FROM ev_sessions").collect()
    }
    assert got == want


def test_watermark_drops_late_event(spark, tmp_path):
    """The watermark SEMANTIC itself (not just drained-stream equality):
    an event arriving for an already-closed window is DROPPED. Spark
    >= 3.4 runs DUAL watermarks (SPARK-40925): late-row FILTERING uses
    the previous micro-batch's watermark while state EVICTION uses the
    current one — so a late row landing exactly one batch after the
    advance still merges into state (empirically pinned here first).
    Timeline: batch 1 (10:10 + 10:20 clicks, 12:30 view) computes
    watermark 11:30; batch 2 (13:00 view) evicts+emits the [10:00,11:00)
    click window with n=2 and lifts the FILTER watermark to 11:30;
    batch 3's late 10:15 click now hits a closed window and is dropped
    (numRowsDroppedByWatermark = 1). A naive batch recompute over the
    same files counts 3 — proving the streaming path genuinely dropped
    the row. At crawl scale this is the contract that bounds
    frontier/metrics state: stragglers older than the watermark cannot
    reopen closed aggregates."""
    import datetime as dt
    import os
    import time as _time

    src_dir = tmp_path / "late_in"
    src_dir.mkdir()
    schema = "ts timestamp, event_type string"

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        d = tmp_path / name
        df.write.mode("overwrite").parquet(str(d))
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = src_dir / f"{name}.parquet"
        os.rename(d / part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)
    now = _time.time()
    # mtime order = micro-batch order (maxFilesPerTrigger=1)
    write_file(
        "b1",
        [(t(10, 10), "click"), (t(10, 20), "click"), (t(12, 30), "view")],
        now - 120,
    )
    write_file("b2", [(t(13, 0), "view")], now - 60)
    write_file("b3", [(t(10, 15), "click")], now)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), "event_type", "n_events")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ev_late")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    got = {
        (r["ws"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM ev_late").collect()
    }
    # the finalized click window holds ONLY the two batch-1 events; the
    # late 10:15 row was dropped by the filter watermark
    assert got == {(t(10, 0), "click"): 2}
    assert dropped == 1
    # naive batch recompute over the same files sees all 3 — the
    # streaming path genuinely dropped the late row
    n_batch = (
        spark.read.schema(schema)
        .parquet(str(src_dir))
        .filter((F.col("ts") >= t(10, 0)) & (F.col("ts") < t(11, 0)))
        .count()
    )
    assert n_batch == 3

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

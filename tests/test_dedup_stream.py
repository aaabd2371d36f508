"""Streaming exact dedup: duplicates planted ACROSS micro-batches are
dropped (state carries), and the drained result equals the batch
dropDuplicates answer on the union."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_stream_dir(spark, tmp_path_factory):
    """Two time-ordered files: batch 0 = docs 0..249; batch 1 = docs
    250..499 PLUS exact-text copies of 50 batch-0 docs under new doc_ids
    (cross-batch duplicates) and 10 in-batch self-copies."""
    d = tmp_path_factory.mktemp("docs_stream")
    tbl = pq.read_table(f"{SF}/documents.parquet").sort_by("doc_id")
    first, second = tbl.slice(0, 250), tbl.slice(250)

    def _copies(src, n, id_base):
        cp = src.slice(0, n).to_pydict()
        cp["doc_id"] = [id_base + i for i in range(n)]
        return pa.Table.from_pydict(cp, schema=src.schema)

    second_plus = pa.concat_tables(
        [second, _copies(first, 50, 10_000), _copies(second, 10, 20_000)]
    )
    pq.write_table(first, str(d / "part-0.parquet"))
    pq.write_table(second_plus, str(d / "part-1.parquet"))
    now = time.time()
    os.utime(d / "part-0.parquet", (now - 60, now - 60))
    os.utime(d / "part-1.parquet", (now, now))
    return str(d)


def test_stream_dedup_matches_batch(spark, dup_stream_dir):
    from brink_spark.streaming.dedup_stream import dedup_stream, with_content_key

    batch_df = with_content_key(spark.read.parquet(dup_stream_dir))
    n_total = batch_df.count()
    want_keys = {r["content_md5"] for r in batch_df.select("content_md5").collect()}
    assert n_total == 560 and len(want_keys) == 500  # 60 planted dups

    schema = spark.read.parquet(dup_stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dup_stream_dir)
    )
    q = (
        dedup_stream(with_content_key(stream))
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = spark.table("dedup_sink").collect()
    # one survivor per distinct content — across batches, not per batch
    assert len(got) == 500
    assert {r["content_md5"] for r in got} == want_keys
    # the cross-batch copies (doc_id in [10_000, 20_000)) NEVER survive:
    # their originals arrived in an earlier micro-batch, so the state
    # store must drop them. (The in-batch self-copies >= 20_000 may
    # legitimately win over their same-batch original — dropDuplicates
    # keeps an arbitrary row within one batch — so only the cross-batch
    # guarantee is asserted strictly.)
    assert all(not (10_000 <= r["doc_id"] < 20_000) for r in got)

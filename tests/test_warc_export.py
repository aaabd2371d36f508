"""Distributed crawl→WARC export (sources/warc.py store_to_warc): the
archival sink must round-trip through the existing WARC readers and be
byte-deterministic at any parallelism."""

import glob
import json

from pyspark.sql import functions as F

from brink_spark.functions.spans import Span, render_html
from brink_spark.sources.warc import store_to_warc, warc_to_pages


def test_store_to_warc_round_trip_and_determinism(spark, tiny_run, tmp_path):
    engine, summary = tiny_run
    store_dir = engine.store.root
    n_waves = summary.waves

    out1 = str(tmp_path / "warc1")
    store_to_warc(spark, store_dir, n_waves, out1, segments=4)

    man = json.load(open(f"{out1}/_manifest"))
    fetched = (
        spark.read.parquet(
            *[f"{store_dir}/results/wave={w}" for w in range(n_waves)]
        )
        .filter(F.col("row_kind") == "fetched")
    )
    want = {
        r["url_norm"]: (
            r["status"],
            render_html(
                [
                    Span(s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (r["spans"] or [])
                ]
            ),
        )
        for r in fetched.collect()
    }
    assert man["total_records"] == len(want) > 0

    # round-trip through the standard reader: url/status/body all survive
    back = warc_to_pages(spark, f"{out1}/segment-*.warc")
    got = {r["url"]: (r["status"], r["body"]) for r in back.collect()}
    assert got == {u: (st, body) for u, (st, body) in want.items()}

    # cdx index beside every segment, entries sum to the manifest
    cdx_files = sorted(glob.glob(f"{out1}/*.warc.cdx"))
    assert len(cdx_files) == len(glob.glob(f"{out1}/segment-*.warc"))
    n_idx = sum(len(open(c).readlines()) for c in cdx_files)
    assert n_idx == man["total_records"]

    # byte-determinism at different parallelism: membership+order are
    # key-derived, so a second export under a different shuffle width
    # produces identical archive bytes
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        out2 = str(tmp_path / "warc2")
        store_to_warc(spark, store_dir, n_waves, out2, segments=4)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    for f1 in sorted(glob.glob(f"{out1}/segment-*.warc")):
        f2 = f1.replace("/warc1/", "/warc2/")
        assert open(f1, "rb").read() == open(f2, "rb").read(), f1

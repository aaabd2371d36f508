"""JSONL corpus bridge (sources/corpus.py): round-trip, explicit-schema
read (no inference pass), and pipeline-operator compatibility."""

from pyspark.sql import functions as F

from brink_spark.sources.corpus import documents_from_jsonl, documents_to_jsonl


def test_jsonl_round_trip_and_pipeline_compat(spark, tmp_path, monkeypatch):
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "jsonl")
    documents_to_jsonl(src, out)
    back = documents_from_jsonl(spark, out)
    a = sorted(map(tuple, src.select("doc_id", "text", "lang", "source", "n_chars").collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b

    # a pipeline operator runs unchanged over the JSONL-backed corpus
    import brink_spark.queries.pipeline as pl

    parquet_res = sorted(
        map(tuple, pl.q_text_quality(spark, "/root/testdata/sf0.001").collect())
    )
    monkeypatch.setattr(pl, "_docs", lambda s, sf: documents_from_jsonl(s, out))
    jsonl_res = sorted(map(tuple, pl.q_text_quality(spark, "ignored").collect()))
    assert jsonl_res == parquet_res  # identical results from either format


def test_jsonl_missing_ncars_recomputed(spark, tmp_path):
    p = tmp_path / "raw.jsonl"
    p.write_text('{"doc_id": 1, "text": "ab cd", "lang": "en", "source": "w"}\n')
    df = documents_from_jsonl(spark, str(p))
    row = df.collect()[0]
    assert row["n_chars"] == 5

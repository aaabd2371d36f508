"""Registrable-domain (PSL-lite) extraction: golden cases + Spark==Python
mirror equality + plan quality (native expression, no Python stage)."""

from pyspark.sql import functions as F

from brink_spark.functions.domains import (
    MULTI_LABEL_SUFFIXES,
    registrable_domain,
    registrable_domain_py,
)

GOLDEN = [
    ("example.com", "example.com"),
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("shop.co.uk", "shop.co.uk"),
    ("www.shop.co.uk", "shop.co.uk"),
    ("deep.www.shop.co.uk", "shop.co.uk"),
    ("alice.github.io", "alice.github.io"),
    ("bob.github.io", "bob.github.io"),
    ("www.alice.github.io", "alice.github.io"),
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    ("Example.COM", "example.com"),
    ("example.com:8080", "example.com"),
    ("10.0.42.7", "10.0.42.7"),
    ("192.168.1.1:443", "192.168.1.1"),
    ("localhost", "localhost"),
    ("shop3.org", "shop3.org"),
]


def test_registrable_domain_golden_python():
    for host, want in GOLDEN:
        assert registrable_domain_py(host) == want, host


def test_registrable_domain_spark_matches_python(spark):
    df = spark.createDataFrame([(h,) for h, _ in GOLDEN], ["host"])
    got = {
        r["host"]: r["site"]
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("site")
        ).collect()
    }
    for host, want in GOLDEN:
        assert got[host] == want, host


def test_registrable_domain_is_native(spark):
    # the whole extraction stays in codegen: no BatchEvalPython /
    # ArrowEvalPython node in the physical plan
    df = spark.range(10).select(
        F.concat(F.lit("a"), F.col("id").cast("string"), F.lit(".co.uk")).alias(
            "host"
        )
    )
    plan = (
        df.select(registrable_domain(F.col("host")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan


def test_suffix_set_is_lowercase_two_label():
    for s in MULTI_LABEL_SUFFIXES:
        assert s == s.lower()
        assert s.count(".") == 1, s

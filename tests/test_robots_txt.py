"""robots.txt text parser (operators/robots_txt.py): raw bodies → the
structured rules table, wired into the existing longest-prefix gate and
budget derivation."""

import pytest
from pyspark.sql import functions as F

from brink_spark.operators.filters import (
    robots_rules_per_host,
    with_robots_denied,
)
from brink_spark.operators.politeness import budget_per_host
from brink_spark.operators.robots_txt import parse_robots_txt

BODY_A = """# comments are stripped
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2
Disallow:
"""

BODY_B = "User-agent: brink\r\nDisallow: /for-brink/\r\nUser-agent: *\r\nDisallow: /for-everyone/\r\n"

BODY_C = """User-agent: otherbot
User-agent: *
Disallow: /shared-group/
Crawl-delay: 0.5
"""


@pytest.fixture(scope="module")
def parsed(spark):
    df = spark.createDataFrame(
        [("a.test", BODY_A), ("b.test", BODY_B), ("c.test", BODY_C)],
        "host string, body string",
    )
    rows = parse_robots_txt(df, agent="brink").collect()
    return df, rows


def test_star_group_rules_and_comments(parsed):
    _, rows = parsed
    a = {(r["rule"], r["path_prefix"]) for r in rows if r["host"] == "a.test"}
    # googlebot group ignored; empty Disallow emits nothing
    assert a == {("deny", "/private/"), ("allow", "/private/ok/")}


def test_specific_group_overrides_star(parsed):
    _, rows = parsed
    b = {(r["rule"], r["path_prefix"]) for r in rows if r["host"] == "b.test"}
    # host names 'brink' specifically -> the * group is ignored (CRLF ok)
    assert b == {("deny", "/for-brink/")}


def test_consecutive_user_agents_share_group(parsed):
    _, rows = parsed
    c = {(r["rule"], r["path_prefix"]) for r in rows if r["host"] == "c.test"}
    assert c == {("deny", "/shared-group/")}


def test_crawl_delay_to_budget(parsed):
    _, rows = parsed
    by_host = {r["host"]: r["crawl_delay_budget"] for r in rows}
    assert by_host["a.test"] == 30  # 60 / 2s
    assert by_host["b.test"] is None  # no delay declared
    assert by_host["c.test"] == 120  # 60 / 0.5s


def test_parsed_rules_drive_the_gate_and_budgets(spark, parsed):
    df, _ = parsed
    rules = parse_robots_txt(df, agent="brink")
    units = spark.createDataFrame(
        [
            ("a.test", "/private/x"),
            ("a.test", "/private/ok/x"),
            ("a.test", "/public"),
            ("b.test", "/for-brink/y"),
            ("b.test", "/for-everyone/y"),
        ],
        "host string, path string",
    )
    got = {
        (r["host"], r["path"]): r["_robots_denied"]
        for r in with_robots_denied(
            units, robots_rules_per_host(rules)
        ).collect()
    }
    assert got == {
        ("a.test", "/private/x"): True,
        ("a.test", "/private/ok/x"): False,  # longer allow wins
        ("a.test", "/public"): False,
        ("b.test", "/for-brink/y"): True,
        ("b.test", "/for-everyone/y"): False,  # * group overridden
    }
    budgets = {
        r["host"]: r["_budget"]
        for r in budget_per_host(rules, default_budget=10).collect()
    }
    assert budgets["a.test"] == 30

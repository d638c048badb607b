"""robots.txt evaluation (ops/robotstxt): RFC 9309 group law,
longest-prefix-match with allow-tie, fail-open subset, crawl delay."""

from __future__ import annotations

import pytest

from docling_spark.ops.robotstxt import (
    crawl_delays,
    parse_robots_rules,
    robots_allowed,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, robots_txt string")


def _urls(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string")


def _decide(spark, robots_rows, url_rows, agent="doclingbot"):
    out = robots_allowed(
        _urls(spark, url_rows), _robots(spark, robots_rows), agent=agent
    ).collect()
    return {r["doc_id"]: r for r in out}


def test_longest_match_and_allow_tie(spark):
    txt = (
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/pub\n"
        "Disallow: /a/pub/x\n"  # longer than the allow -> wins under it
        "Allow: /same\n"
        "Disallow: /same\n"  # equal length: allow wins
    )
    got = _decide(
        spark,
        [("h.test", txt)],
        [
            (1, "https://h.test/a/secret"),
            (2, "https://h.test/a/pub/ok"),
            (3, "https://h.test/a/pub/x/y"),
            (4, "https://h.test/same/thing"),
            (5, "https://h.test/other"),
            (6, "https://h.test"),  # empty path -> "/"
        ],
    )
    assert not got[1]["allowed"] and got[1]["rule"] == "/a"
    assert got[2]["allowed"] and got[2]["rule"] == "/a/pub"
    assert not got[3]["allowed"] and got[3]["rule"] == "/a/pub/x"
    assert got[4]["allowed"] and got[4]["rule_type"] == "allow"
    assert got[5]["allowed"] and got[5]["rule"] is None  # REP default
    assert got[6]["allowed"] and got[6]["path"] == "/"


def test_specific_group_shadows_star(spark):
    txt = (
        "User-agent: DoclingBot\n"
        "Disallow: /bot-only\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everyone\n"
    )
    got = _decide(
        spark,
        [("h.test", txt)],
        [(1, "https://h.test/everyone/x"), (2, "https://h.test/bot-only/x")],
    )
    # the * group is IGNORED once a specific group matches
    assert got[1]["allowed"]
    assert not got[2]["allowed"]


def test_stacked_agents_one_group(spark):
    txt = (
        "User-agent: otherbot\n"
        "User-agent: doclingbot\n"
        "Disallow: /shared\n"
    )
    got = _decide(spark, [("h.test", txt)], [(1, "https://h.test/shared/x")])
    assert not got[1]["allowed"]


def test_subset_fail_open_and_headerless_rules(spark):
    txt = (
        "Disallow: /headerless\n"  # before any group: ignored
        "User-agent: *\n"
        "Disallow: /*?session\n"  # wildcard: dropped by the subset
        "Disallow:\n"  # empty: allow-all marker, no rule
        "Allow: /x$\n"  # $ anchor: dropped
    )
    rules = parse_robots_rules(
        _robots(spark, [("h.test", txt)]), "doclingbot"
    ).collect()
    assert rules == []
    got = _decide(
        spark,
        [("h.test", txt)],
        [(1, "https://h.test/headerless/x"), (2, "https://h.test/q?session=1")],
    )
    assert got[1]["allowed"] and got[2]["allowed"]


def test_unknown_host_and_case_insensitivity(spark):
    txt = "USER-AGENT: DOCLINGBOT\nDISALLOW: /caps\n"
    got = _decide(
        spark,
        [("h.test", txt)],
        [(1, "https://H.TEST/caps/x"), (2, "https://norobots.test/caps/x")],
    )
    assert not got[1]["allowed"]  # host + field + agent all case-folded
    assert got[2]["allowed"]  # no robots row -> REP default


def test_crawl_delay(spark):
    rows = [
        ("a.test", "User-agent: *\nCrawl-delay: 3\n"),
        ("b.test", "User-agent: doclingbot\nCrawl-delay: 1.5\n"
                   "\nUser-agent: *\nCrawl-delay: 9\n"),
        ("c.test", "User-agent: *\nCrawl-delay: soon\n"),
        ("d.test", "User-agent: *\nDisallow: /x\n"),
    ]
    got = {
        r["host"]: r["crawl_delay_s"]
        for r in crawl_delays(_robots(spark, rows), "doclingbot").collect()
    }
    assert got["a.test"] == 3.0
    assert got["b.test"] == 1.5  # specific group wins over *
    assert got["c.test"] is None  # unparseable -> NULL, host still reported
    assert "d.test" not in got  # no delay line at all -> no row

"""Robots-directive gate (ops/robots): directive parsing variants,
none-implies-both, canonical extraction, hostile input, plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.robots import robots_gate, robots_signals

pytestmark = pytest.mark.usefixtures()


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _pages(spark, htmls: list[bytes]):
    return spark.createDataFrame(
        [(f"https://t.test/{i}", h) for i, h in enumerate(htmls)],
        "url string, html binary",
    )


def _one(spark, html: bytes):
    return robots_signals(_pages(spark, [html])).collect()[0]


def test_directive_variants(spark):
    r = _one(spark, b'<head><meta name="robots" content="noindex"></head>')
    assert r["noindex"] and not r["nofollow"]
    # flipped attribute order + upper case
    r = _one(spark, b'<meta content="NOINDEX, NOFOLLOW" name="robots">')
    assert r["noindex"] and r["nofollow"]
    # single quotes
    r = _one(spark, b"<meta name='robots' content='nofollow'>")
    assert r["nofollow"] and not r["noindex"]
    # none implies both
    r = _one(spark, b'<meta name="robots" content="none">')
    assert r["noindex"] and r["nofollow"]
    # index,follow and absent meta are clean
    for h in (b'<meta name="robots" content="index, follow">', b"<p>x</p>"):
        r = _one(spark, h)
        assert not r["noindex"] and not r["nofollow"]
    # token must be whole-word: "noindexing" is not a directive
    r = _one(spark, b'<meta name="robots" content="noindexing">')
    assert not r["noindex"]


def test_other_meta_names_ignored(spark):
    r = _one(spark, b'<meta name="description" content="noindex stuff">')
    assert not r["noindex"]


def test_canonical_extraction(spark):
    r = _one(
        spark,
        b'<link rel="canonical" href="https://t.test/clean"><body>x</body>',
    )
    assert r["canonical_url"] == "https://t.test/clean"
    assert _one(spark, b"<p>no link</p>")["canonical_url"] is None


def test_gate_verdicts(spark):
    df = robots_gate(
        _pages(
            spark,
            [
                b'<meta name="robots" content="noindex">',
                b"<p>clean</p>",
            ],
        )
    )
    got = {r["url"]: (r["keep"], r["reason"]) for r in df.collect()}
    assert got["https://t.test/0"] == (False, "robots:noindex")
    assert got["https://t.test/1"] == (True, "ok")


def test_invalid_utf8_never_throws(spark):
    # lenient decode posture: arbitrary binary must classify, not crash
    r = _one(spark, b"\xff\xfe\x00\x80" * 100)
    assert not r["noindex"] and r["canonical_url"] is None


def test_directive_outside_head_window_ignored(spark):
    # the probe is bounded to 8 KB, mirroring the dispatch window:
    # a "directive" buried megabytes deep in the body cannot gate
    blob = b"<html><head></head><body>" + b"x" * 9000 + (
        b'<meta name="robots" content="noindex"></body>'
    )
    assert not _one(spark, blob)["noindex"]


def test_plan_zero_exchange_zero_python(spark):
    plan = (
        robots_gate(_pages(spark, [b"<p>x</p>"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "MapInPandas" not in plan

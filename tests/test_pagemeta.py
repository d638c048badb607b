"""Page-metadata extraction (ops/pagemeta): field variants, hostile
input, bounded window, plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.pagemeta import page_meta


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _one(spark, html: bytes):
    df = spark.createDataFrame(
        [("https://t.test/p", html)], "url string, html binary"
    )
    return page_meta(df).collect()[0]


def test_all_fields(spark):
    r = _one(
        spark,
        b'<html lang="en-US"><head><title> My Page </title>'
        b'<meta name="description" content="A desc">'
        b'<meta property="og:title" content="OG title">'
        b"</head><body>x</body></html>",
    )
    assert r["title"] == "My Page"  # trimmed
    assert r["meta_description"] == "A desc"
    assert r["og_title"] == "OG title"
    assert r["html_lang"] == "en-US"


def test_absent_fields_are_null(spark):
    r = _one(spark, b"<html><body>bare</body></html>")
    assert r["title"] is None
    assert r["meta_description"] is None
    assert r["og_title"] is None
    assert r["html_lang"] is None


def test_attribute_order_and_case(spark):
    r = _one(
        spark,
        b"<HTML LANG='de'><HEAD><TITLE>t</TITLE>"
        b"<META NAME='description' CONTENT='d'></HEAD>",
    )
    assert r["title"] == "t"
    assert r["meta_description"] == "d"
    assert r["html_lang"] == "de"


def test_invalid_utf8_never_throws(spark):
    r = _one(spark, b"\xff\xfe<title>ok</title>\x80\x81")
    assert r["title"] == "ok"


def test_title_outside_head_window_ignored(spark):
    blob = b"<html><head></head><body>" + b"y" * 9000 + b"<title>late</title>"
    assert _one(spark, blob)["title"] is None


def test_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame(
        [("u", b"<title>t</title>")], "url string, html binary"
    )
    plan = page_meta(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan and "MapInPandas" not in plan


def test_flipped_meta_attribute_order(spark):
    # CMSes emit content-before-name; both orders must extract
    r = _one(
        spark,
        b'<meta content="flipped desc" name="description">'
        b'<meta content="flipped og" property="og:title">',
    )
    assert r["meta_description"] == "flipped desc"
    assert r["og_title"] == "flipped og"

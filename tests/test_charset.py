"""Charset sniff (ops/charset): BOM precedence, declaration fallbacks,
the conflict flag, hostile bytes, plan shape."""

from __future__ import annotations

import pytest

from docling_spark.ops.charset import charset_sniff


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


def _sniff(spark, blobs):
    df = spark.createDataFrame(
        list(enumerate(blobs)), "doc_id long, html binary"
    )
    return {r["doc_id"]: r for r in charset_sniff(df).collect()}


def test_precedence_and_conflict(spark):
    got = _sniff(
        spark,
        [
            b"\xef\xbb\xbf<meta charset='utf-8'>",        # agree
            b"\xef\xbb\xbf<meta charset='windows-1252'>",  # BOM wins
            b"<meta charset=ISO-8859-1>x",                 # declaration only
            b"\xff\xfe<\x00h\x00t\x00m\x00l\x00>\x00",     # utf-16le BOM
            b"\xfe\xff\x00<\x00h",                         # utf-16be BOM
            b"plain ascii, nothing declared",              # default
            b"",                                           # empty blob
            b"\xff\xd8\xff random binary \x00\x01",        # hostile bytes
        ],
    )
    assert got[0]["chosen"] == "utf-8" and not got[0]["bom_conflict"]
    assert got[1]["bom"] == "utf-8" and got[1]["declared"] == "windows-1252"
    assert got[1]["chosen"] == "utf-8" and got[1]["bom_conflict"]
    assert got[2]["bom"] is None and got[2]["chosen"] == "iso-8859-1"
    assert got[3]["chosen"] == "utf-16le"
    assert got[4]["chosen"] == "utf-16be"
    assert got[5]["chosen"] == "utf-8" and got[5]["declared"] is None
    assert got[6]["chosen"] == "utf-8"
    assert got[7]["chosen"] == "utf-8" and not got[7]["bom_conflict"]


def test_http_equiv_form_and_plan(spark):
    blob = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Windows-1252">'
    )
    got = _sniff(spark, [blob])
    assert got[0]["declared"] == "windows-1252"  # case-folded
    df = charset_sniff(
        spark.createDataFrame([(1, b"x")], "doc_id long, html binary")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan

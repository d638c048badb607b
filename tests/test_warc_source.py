"""WARC source: record parse, gzip members, HTTP envelope strip, Spark read,
and end-to-end WARC → extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.sources.warc import (
    build_warc,
    http_body,
    iter_warc_records,
    read_warc,
    warc_to_rows,
)

RECORDS = [
    ("https://a.test/one.html", "2024-03-01T10:00:00Z", b"<html><body><h1>One</h1><p>alpha</p></body></html>"),
    ("https://b.test/two.html", "2024-03-01T11:30:00Z", b"<html><body><p>beta gamma</p></body></html>"),
    ("https://c.test/three.html", "2024-03-02T00:00:00Z", b"<html><body><ul><li>x</li></ul></body></html>"),
]


@pytest.mark.parametrize("gz", [False, True], ids=["plain", "gzip-members"])
def test_roundtrip(gz):
    blob = build_warc(RECORDS, gzip_members=gz)
    rows = list(warc_to_rows(blob))
    assert [r["url"] for r in rows] == [u for u, _, _ in RECORDS]
    assert rows[0]["html"] == RECORDS[0][2]
    assert rows[0]["warc_ts"].isoformat().startswith("2024-03-01T10:00:00")


def test_non_response_records_skipped():
    blob = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
        + build_warc(RECORDS[:1])
    )
    rows = list(warc_to_rows(blob))
    assert len(rows) == 1


def test_truncated_warc_tolerated():
    blob = build_warc(RECORDS)
    rows = list(warc_to_rows(blob[: len(blob) // 2]))
    assert 1 <= len(rows) <= 2  # partial tail dropped, no exception


def test_http_body_strip():
    assert http_body(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nBODY") == b"BODY"
    assert http_body(b"no envelope") == b"no envelope"


def test_spark_read_and_extract(tmp_path):
    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    (tmp_path / "part1.warc.gz").write_bytes(build_warc(RECORDS[:2], gzip_members=True))
    (tmp_path / "part2.warc").write_bytes(build_warc(RECORDS[2:]))
    pages = read_warc(spark, str(tmp_path))
    assert pages.count() == 3

    from docling_spark.job import extract_pages

    out = {r.url: r for r in extract_pages(pages).collect()}
    assert out["https://a.test/one.html"].status == "success"
    assert "# One" in out["https://a.test/one.html"].extracted_text
    assert "beta gamma" in out["https://b.test/two.html"].extracted_text

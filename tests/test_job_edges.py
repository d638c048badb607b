"""Job-level edge routing: oversize blobs, mixed HTML/PDF corpus dispatch,
empty/unknown content types — the per-row containment contract at the
DataFrame level."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.job import extract_pages, with_content_type
from docling_spark.ops.corpus import synth_pages, synth_pages_pdf
from docling_spark.schema import PAGES_SCHEMA

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("job-edge-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _mk_pages(spark, rows):
    ts = datetime.datetime(2024, 1, 1)
    data = [(url, ts, blob, None, "en") for url, blob in rows]
    return spark.createDataFrame(data, schema=PAGES_SCHEMA)


def test_oversize_routing(spark):
    big = b"<html><body><p>" + b"x" * 2048 + b"</p></body></html>"
    pages = _mk_pages(spark, [("https://t/big.html", big), ("https://t/ok.html", b"<html><body><p>hi</p></body></html>")])
    out = extract_pages(pages, max_bytes=1024).collect()
    by_url = {r.url: r for r in out}
    assert by_url["https://t/big.html"].content_type == "oversize"
    assert by_url["https://t/big.html"].status == "skipped"
    assert by_url["https://t/ok.html"].status == "success"


def test_mixed_corpus_dispatch_and_extraction(spark):
    pages = (
        synth_pages(spark, SF).limit(20)
        .unionByName(synth_pages_pdf(spark, SF).limit(20))
    )
    out = extract_pages(pages)
    agg = {r.content_type: r.n for r in out.groupBy("content_type").agg(F.count("*").alias("n")).collect()}
    assert agg == {"html": 20, "pdf": 20}
    assert out.filter("status = 'success'").count() == 40


def test_unknown_bytes_skipped_not_failed_task(spark):
    pages = _mk_pages(
        spark,
        [
            ("https://t/x.bin", b"\x00\x01\x02 not anything"),
            ("https://t/none.html", None),
            ("https://t/garbage.pdf", b"%PDF-1.4 then garbage"),
        ],
    )
    out = extract_pages(pages).collect()
    by_url = {r.url: r for r in out}
    assert by_url["https://t/x.bin"].status == "skipped"  # content_type=other
    assert by_url["https://t/none.html"].status == "skipped"  # empty blob
    assert by_url["https://t/garbage.pdf"].status == "failure"  # contained
    assert by_url["https://t/garbage.pdf"].error is not None


def test_sniff_prefers_magic_over_extension(spark):
    pdf_named_html = synth_pages_pdf(spark, SF).limit(1).withColumn(
        "url", F.lit("https://t/lies.html")
    )
    ct = with_content_type(pdf_named_html).select("content_type").first()[0]
    assert ct == "pdf"  # %PDF- magic wins over .html extension


def test_convert_cli(tmp_path):
    """Reference-CLI parity: `python -m docling_spark convert`."""
    import subprocess
    import sys as _sys

    out = subprocess.run(
        [_sys.executable, "-m", "docling_spark", "convert",
         "/root/reference/tests/data/html/example_01.html",
         "--to", "md,json", "--output", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stderr
    md = (tmp_path / "example_01.md").read_text()
    golden = open(
        "/root/reference/tests/data/groundtruth/docling_v2/example_01.html.md"
    ).read()
    assert md == golden
    assert (tmp_path / "example_01.json").exists()

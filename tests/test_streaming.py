"""Structured Streaming extraction: drain-existing semantics, incremental
exactly-once across restarts (checkpoint), same output as the batch path."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from docling_spark.ops.corpus import synth_pages
from docling_spark.streaming import run_stream

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("stream-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _write_slice(spark, path: str, lo: int, hi: int):
    pages = synth_pages(spark, SF).filter(
        (F.regexp_extract("url", r"/doc/(\d+)\.html", 1).cast("int") >= lo)
        & (F.regexp_extract("url", r"/doc/(\d+)\.html", 1).cast("int") < hi)
    )
    pages.coalesce(1).write.mode("append").parquet(path)


def test_stream_drain_and_incremental(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_slice(spark, inp, 0, 40)
    q = run_stream(spark, inp, out, ckpt, trigger_once=True)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out)
    assert got1.count() == 40
    assert got1.filter("status = 'success'").count() == 40

    # new files arrive; restarted stream must process ONLY them
    _write_slice(spark, inp, 40, 100)
    q2 = run_stream(spark, inp, out, ckpt, trigger_once=True)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    urls = [r.url for r in got2.select("url").collect()]
    assert len(urls) == 100
    assert len(set(urls)) == 100  # exactly once across restarts

    # stream output values match the batch path
    from docling_spark.job import extract_pages

    batch = extract_pages(synth_pages(spark, SF).filter(
        F.regexp_extract("url", r"/doc/(\d+)\.html", 1).cast("int") < 100
    ))
    b = {r.url: r.extracted_text for r in batch.select("url", "extracted_text").collect()}
    s = {r.url: r.extracted_text for r in got2.select("url", "extracted_text").collect()}
    assert b == s

"""Text normalization (docling_spark/ops/normalize.py): hand-computed
mojibake/control/whitespace cases and the zero-shuffle plan pin."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from docling_spark.ops.normalize import normalize_text, synth_dirty_text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("normalize-test")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    yield s


def _one(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, wtext string")
    return normalize_text(df).collect()[0]


def test_mojibake_repair_and_count(spark):
    r = _one(spark, "cafÃ© says â€œhiâ€™")
    # Ã© -> é, â€œ -> “, â€™ -> ’  (3 repairs)
    assert r.clean_text == "café says “hi’"
    assert r.n_mojibake == 3
    assert r.n_controls == 0


def test_crlf_and_controls(spark):
    r = _one(spark, "a\x07b\r\nc\rd\x00e​f")
    assert r.clean_text == "ab\nc\ndef"
    assert r.n_controls == 3  # BEL, NUL, ZWSP


def test_nbsp_and_whitespace_collapse(spark):
    r = _one(spark, "  a  b\t\tc  \n\n\n\n  d  ")
    assert r.clean_text == "a b c\n\nd"
    assert r.n_controls == 0


def test_clean_text_unchanged(spark):
    r = _one(spark, "plain text\nwith two lines.")
    assert r.clean_text == "plain text\nwith two lines."
    assert r.n_mojibake == 0 and r.n_controls == 0


def test_bom_stripped(spark):
    r = _one(spark, "﻿hello")
    assert r.clean_text == "hello"
    assert r.n_controls == 1


def test_synth_corpus_signal(spark):
    rows = normalize_text(synth_dirty_text(spark, SF)).collect()
    assert any(r.n_mojibake > 0 for r in rows)
    assert any(r.n_controls > 0 for r in rows)
    # normalization is idempotent: a second pass changes nothing
    assert all("\r" not in r.clean_text for r in rows)
    assert all("\n\n\n" not in r.clean_text for r in rows)


def test_plan_shape(spark):
    out = normalize_text(synth_dirty_text(spark, SF))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    assert "MapInPandas" not in plan and "EvalPython" not in plan

"""WebVTT backend golden parity: byte-identical md + itxt + json against the
reference fixtures (webvtt_backend.py:27-572 semantics)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_spark.serialize import to_itxt, to_markdown
from docling_spark.serialize_json import to_docling_dict
from docling_spark.vttx import extract_vtt

DATA = Path("/root/reference/tests/data/webvtt")
GT = DATA.parent / "groundtruth" / "docling_v2"
FIXTURES = sorted(DATA.glob("*.vtt"))


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_vtt_md_golden(path: Path):
    doc = extract_vtt(path.read_bytes(), name=path.stem)
    # reference vtt golden test exports with escape_html=False
    # (/root/reference/tests/test_backend_vtt.py:220)
    assert to_markdown(doc, escape_html=False) == (
        GT / f"{path.name}.md"
    ).read_text()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_vtt_itxt_golden(path: Path):
    doc = extract_vtt(path.read_bytes(), name=path.stem)
    assert to_itxt(doc, 70) == (GT / f"{path.name}.itxt").read_text()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_vtt_json_golden(path: Path):
    raw = path.read_bytes()
    doc = extract_vtt(raw, name=path.stem)
    ours = to_docling_dict(doc, path.name, raw, mimetype="text/vtt")
    assert ours == json.loads((GT / f"{path.name}.json").read_text())


def test_vtt_hostile():
    for blob in (b"", b"WEBVTTX", b"WEBVTT\n\ngarbage -->", b"WEBVTT\n\n00:00.000 --> bad"):
        try:
            doc = extract_vtt(blob)
            assert doc.items is not None  # parsed with cues dropped
        except (ValueError, UnicodeDecodeError):
            pass  # rejection is fine; crash containment is the job layer's duty


def test_vtt_spark_dispatch():
    import datetime

    from pyspark.sql import SparkSession

    from docling_spark.job import extract_pages
    from docling_spark.schema import PAGES_SCHEMA

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (f"https://t/{p.name}", ts, p.read_bytes(), None, "en") for p in FIXTURES
    ]
    out = {
        r.url: r
        for r in extract_pages(
            spark.createDataFrame(rows, schema=PAGES_SCHEMA)
        ).collect()
    }
    for p in FIXTURES:
        r = out[f"https://t/{p.name}"]
        assert r.content_type == "vtt"
        assert r.status == "success"
        assert r.extracted_text == (GT / f"{p.name}.md").read_text()

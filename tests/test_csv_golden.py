"""CSV backend golden parity: byte-identical md + itxt + DoclingDocument
json against all 8 reference CSV fixtures
(/root/reference/docling/backend/csv_backend.py semantics; goldens under
tests/data/groundtruth/docling_v2/csv-*)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_spark.csvx import extract_csv
from docling_spark.serialize import to_itxt, to_markdown
from docling_spark.serialize_json import to_docling_dict

DATA = Path("/root/reference/tests/data/csv")
GT = DATA.parent / "groundtruth" / "docling_v2"
FIXTURES = sorted(DATA.glob("*.csv"))


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_csv_md_golden(path: Path):
    doc = extract_csv(path.read_bytes(), name=path.stem)
    assert to_markdown(doc) == (GT / f"{path.name}.md").read_text()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_csv_itxt_golden(path: Path):
    doc = extract_csv(path.read_bytes(), name=path.stem)
    assert to_itxt(doc, 70) == (GT / f"{path.name}.itxt").read_text()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_csv_json_golden(path: Path):
    raw = path.read_bytes()
    doc = extract_csv(raw, name=path.stem)
    ours = to_docling_dict(doc, path.name, raw, mimetype="text/csv")
    gt = json.loads((GT / f"{path.name}.json").read_text())
    assert ours == gt


def test_csv_spark_dispatch_and_extraction():
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
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for p in FIXTURES:
        r = out[f"https://t/{p.name}"]
        assert r.content_type == "csv"
        assert r.status == "success"
        assert r.extracted_text == (GT / f"{p.name}.md").read_text(), p.name

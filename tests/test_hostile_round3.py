"""Hostile-input containment for the round-3 surfaces: OFD containers,
encrypted PDFs, doctags serialization, WAV/PNG decode. The job guarantee
under test: one bad document yields a failure/skip ROW, never a task death
(SURVEY §2.5)."""

from __future__ import annotations

import struct
import zlib

import pytest

from docling_spark.job import _extract_one


def _row(blob: bytes, ctype: str, **kw):
    return _extract_one(
        "https://x.test/doc", blob, ctype, "none", 60.0, **kw
    )


# ------------------------------------------------------------------- OFD
@pytest.mark.parametrize(
    "blob",
    [
        b"PK\x03\x04 truncated-not-a-zip OFD.xml",
        # valid zip, missing OFD.xml
        None,
    ],
)
def test_hostile_ofd_contained(blob):
    if blob is None:
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.xml", "<x/>")
        blob = buf.getvalue()
    r = _row(blob, "ofd")
    assert r["status"] == "failure"
    assert r["error"]


def test_hostile_ofd_bad_xml_contained():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("OFD.xml", "<ofd:OFD unclosed")
    r = _row(buf.getvalue(), "ofd")
    assert r["status"] == "failure"


def test_hostile_ofd_deep_entity_free():
    """Billion-laughs-style entity expansion must not blow up (stdlib
    ElementTree refuses undefined/recursive entities)."""
    import io
    import zipfile

    evil = (
        '<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "aaaa"><!ENTITY b '
        '"&a;&a;&a;&a;&a;&a;&a;&a;">]><ofd:OFD xmlns:ofd="n">&b;&b;</ofd:OFD>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("OFD.xml", evil)
    r = _row(buf.getvalue(), "ofd")
    assert r["status"] == "failure"  # entity use rejected, contained


# --------------------------------------------------------- encrypted PDFs
def _pdf_with_encrypt_dict(enc_body: bytes) -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n2 0 obj\n"
        + enc_body
        + b"\nendobj\ntrailer\n<< /Size 3 /Root 1 0 R /Encrypt 2 0 R "
        b"/ID [<00> <00>] >>\n%%EOF\n"
    )


@pytest.mark.parametrize(
    "enc",
    [
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -4 /O <00> /U <00> >>",
        b"<< /Filter /Standard /V 9 /R 99 >>",  # unsupported revision
        b"<< /Filter /Custom /V 2 >>",  # non-standard handler
        b"<< /Filter /Standard /V 5 /R 6 /O <> /U <> /OE <> /UE <> >>",
    ],
)
def test_hostile_encrypt_dicts_contained(enc):
    r = _row(_pdf_with_encrypt_dict(enc), "pdf")
    assert r["status"] == "failure"
    assert "encrypted" in (r["error"] or "") or "PDF" in (r["error"] or "")


def test_truncated_encrypted_stream_contained():
    from docling_spark.ops.corpus import synth_pdf_bytes
    from docling_spark.pdfx.crypt import encrypt_pdf_rc4

    enc = encrypt_pdf_rc4(synth_pdf_bytes(1, "a b c"), "pw")
    r = _row(enc[: len(enc) // 2], "pdf", pdf_password="pw")
    assert r["status"] in ("failure", "needs_ocr")  # contained either way


# ------------------------------------------------------------- serializers
def test_doctags_on_garbage_json_contained():
    r = _row(b'{"schema_name": "DoclingDocument", "texts": 42}',
             "docling_json", with_doctags=True)
    assert r["status"] == "failure"


def test_doctags_handles_missing_pages_map():
    """A located item whose page is absent from the pages map must not
    crash the serializer (falls back to unit dims)."""
    from docling_spark.model import SpanDoc
    from docling_spark.serialize_doctags import to_doctags

    doc = SpanDoc("x")
    it = doc.add_text("text", "hello")
    it.prov_list = [
        {
            "page_no": 99,
            "bbox": {"l": 1, "t": 2, "r": 3, "b": 4, "coord_origin": "TOPLEFT"},
            "charspan": [0, 5],
        }
    ]
    out = to_doctags(doc)
    assert "<text>" in out and "hello" in out


# ------------------------------------------------------------ codec probes
def test_png_truncated_idat_contained():
    from docling_spark.ops.png import decode_png, encode_png

    blob = encode_png(8, 8, 1, bytes(64))
    with pytest.raises(Exception):
        decode_png(blob[:40])


def test_png_corrupt_zlib_contained():
    from docling_spark.ops.png import decode_png, encode_png

    blob = bytearray(encode_png(8, 8, 1, bytes(64)))
    idat = bytes(blob).find(b"IDAT")
    blob[idat + 8] ^= 0xFF
    with pytest.raises(Exception):
        decode_png(bytes(blob))


def test_wav_declared_size_beyond_buffer():
    from docling_spark.ops.multimodal import make_wav, parse_wav

    blob = bytearray(make_wav(2))
    # data chunk claims 4 GiB
    data_at = bytes(blob).find(b"data")
    blob[data_at + 4 : data_at + 8] = struct.pack("<I", 0xFFFFFFF0)
    rate, _, _, n = parse_wav(bytes(blob))
    # body slice is clamped by the buffer; no allocation explosion
    assert n * 2 <= len(blob)


def test_corrupt_startxref_encrypted_pdf_still_authenticates():
    """A rebuilt (bad-startxref) encrypted PDF goes through the brute-scan
    fallback, which must still recover the /Encrypt ref + /ID from the
    trailer bytes so the password check happens — right password decrypts
    to the plaintext text, wrong password fails auth (not garbage output)."""
    import re

    from docling_spark.ops.corpus import synth_pdf_bytes
    from docling_spark.pdfx.crypt import encrypt_pdf_rc4
    from docling_spark.pdfx.extract import extract_pdf_text

    plain = synth_pdf_bytes(2, "one two three four")
    broken = re.sub(
        rb"startxref\n\d+",
        b"startxref\n999999999",
        encrypt_pdf_rc4(plain, "pw"),
    )
    ok = extract_pdf_text(broken, password="pw")
    assert ok.status == "success"
    assert ok.text == extract_pdf_text(plain).text
    bad = extract_pdf_text(broken, password="bad")
    assert bad.status == "failure" and "encrypted" in bad.error


def test_png_image_rows_carry_decoded_picture_span():
    """Image rows stay needs_ocr (OCR is NN), but a decodable PNG now gets
    the reference's 1-page-doc wrap: a picture item sized to the REAL
    decoded dimensions (image_backend.py:121-190 analog)."""
    from docling_spark.ops.multimodal import _img_params, make_png

    r = _row(make_png(5), "image")
    assert r["status"] == "needs_ocr"
    kinds = [(s["kind"], s["label"]) for s in r["spans"]]
    assert ("picture", "picture") in kinds
    # undecodable image bytes: bare needs_ocr row, no crash
    r2 = _row(b"\xff\xd8\xff jpeg-ish", "image")
    assert r2["status"] == "needs_ocr" and r2["spans"] is None

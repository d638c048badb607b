"""Baseline JPEG codec (ops/jpeg.py): encoder/decoder round-trips, the
bit-exact block-constant law backing the mm_codecs oracle, real-world
color decode, and the non-baseline error seams.

Reference parity target: docling routes images through PIL
(/root/reference/docling/datamodel/document.py image handling); this repo
decodes baseline JPEG from scratch (stdlib + numpy) so the Spark-side
pixel operators stay dependency-free.
"""

from __future__ import annotations

import struct

import pytest

from docling_spark.ops.jpeg import decode, encode_gray
from docling_spark.ops.multimodal import _decode_real, _img_params, make_jpeg


def test_block_constant_roundtrip_bit_exact():
    """Unit quant tables + 8x8-block-constant pixels round-trip exactly
    (DC-only FDCT is integral) — the law the mm_codecs oracle predicts."""
    for doc_id in (0, 1, 7, 17, 31, 42, 63, 100, 255, 999):
        w, h, _c, _v = _img_params(doc_id)
        dw, dh, dc, px = decode(make_jpeg(doc_id))
        assert (dw, dh, dc) == (w, h, 1)
        expect = bytes(
            (doc_id + 16 * (x // 8)) % 256 for _y in range(dh) for x in range(dw)
        )
        assert px == expect


def test_non_mcu_aligned_dimensions():
    """Widths/heights not divisible by 8 crop the padded MCU grid."""
    for w, h in ((1, 1), (7, 3), (9, 17), (33, 9)):
        src = bytes((3 + 16 * (x // 8)) % 256 for _y in range(h) for x in range(w))
        dw, dh, dc, px = decode(encode_gray(src, w, h))
        assert (dw, dh, dc) == (w, h, 1)
        assert px == src


def test_lossy_quant_close_not_exact():
    """A real quant table is lossy but bounded for smooth gradients."""
    w, h = 32, 16
    src = bytes((x * 4 + y * 2) % 256 for y in range(h) for x in range(w))
    q = [16] * 64
    dw, dh, _dc, px = decode(encode_gray(src, w, h, quant=q))
    assert (dw, dh) == (w, h)
    err = max(abs(a - b) for a, b in zip(src, px))
    assert 0 < err <= 40  # quantized, but not garbage


def test_real_world_color_jpeg():
    """The reference's scanned fixture: 4:2:0 color, restart-marker-free
    interchange JPEG produced by a real camera/scanner toolchain."""
    blob = open("/root/reference/tests/data_scanned/qr_bill_example.jpg", "rb").read()
    w, h, c, px = decode(blob)
    assert (w, h, c) == (1021, 1423, 3)
    assert len(px) == w * h * 3
    # mostly-white document: bright mean, full-range black ink present
    mean = sum(px[::997]) / len(px[::997])
    assert mean > 200
    assert min(px[::97]) < 60
    # header walk (ops/png.image_meta) agrees with the full decode
    from docling_spark.ops.png import image_meta

    assert image_meta(blob) == ("jpeg", 1021, 1423, 3)


def test_progressive_raises_cleanly():
    seg = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + bytes(9)
    with pytest.raises(NotImplementedError):
        decode(seg)


def test_truncated_and_garbage():
    with pytest.raises(ValueError):
        decode(b"not a jpeg")
    with pytest.raises(ValueError):
        decode(b"\xff\xd8\xff\xdb")  # SOI + bare DQT marker, no SOS


def test_decode_real_seam_routes_jpeg():
    """_decode_real now routes SOI-magic blobs through the real codec."""
    w, h, c, px = _decode_real(make_jpeg(5))
    ew, eh, _ec, _v = _img_params(5)
    assert (w, h, c) == (ew, eh, 1)
    assert len(px) == w * h
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00unknown-format")

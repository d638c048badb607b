"""TIFF codec (ops/tiff.py): encoder/decoder round-trips, the reference's
own multi-page LZW+predictor fixture, the page fan-out law behind the
mm_codecs oracle, and hostile-container behavior.

Reference parity: docling converts `tests/data/tiff/2206.01062.tif`
(2 pages, 612x792 RGBA, LZW + horizontal predictor) by rendering through
PIL; this repo decodes the same container from scratch.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from docling_spark.ops.tiff import (
    decode_tiff,
    encode_tiff_gray,
    parse_ifds,
    tiff_meta,
)

REF_TIFF = "/root/reference/tests/data/tiff/2206.01062.tif"


def _law_pages(doc_id: int, w: int, h: int, npages: int):
    return [
        bytes(
            (doc_id + x + y + 128 * p) % 256 for y in range(h) for x in range(w)
        )
        for p in range(npages)
    ]


def test_roundtrip_deflate_predictor_multipage():
    for doc_id in (0, 5, 17, 31, 100):
        w, h = 16 + doc_id % 32, 8 + doc_id % 16
        npages = 1 + doc_id % 3
        pages = _law_pages(doc_id, w, h, npages)
        blob = encode_tiff_gray(pages, w, h, compression="deflate", predictor=2)
        assert tiff_meta(blob) == (npages, w, h, 1)
        for p in range(npages):
            assert decode_tiff(blob, page=p) == (w, h, 1, pages[p])


def test_roundtrip_uncompressed_no_predictor():
    pages = _law_pages(3, 9, 7, 2)
    blob = encode_tiff_gray(pages, 9, 7, compression="none", predictor=1)
    for p in range(2):
        assert decode_tiff(blob, page=p) == (9, 7, 1, pages[p])


def test_reference_fixture_lzw_predictor():
    """The reference's own fixture: big-endian, 2 pages, RGBA, LZW strips
    with horizontal differencing — the full production strip pipeline."""
    blob = open(REF_TIFF, "rb").read()
    assert tiff_meta(blob) == (2, 612, 792, 4)
    for p in range(2):
        w, h, c, px = decode_tiff(blob, page=p)
        assert (w, h, c) == (612, 792, 4)
        assert len(px) == 612 * 792 * 4
        # scanned-paper pages: bright luma, opaque alpha, ink present
        assert sum(px[::997]) / len(px[::997]) > 200
        assert min(px[::97]) < 60
        assert set(px[3::4]) == {255}  # alpha channel fully opaque


def test_packbits_strips():
    # hand-built single-strip PackBits page: run + literal
    w, h = 4, 2
    px = bytes([7, 7, 7, 7, 1, 2, 3, 4])
    packed = bytes([0xFD, 7, 0x03, 1, 2, 3, 4])  # -3 => 4x7, then 4 literals
    blob = bytearray(b"II*\x00\x00\x00\x00\x00")
    so = len(blob)
    blob += packed
    ifd = len(blob) + (len(blob) % 2)
    blob += b"\x00" * (ifd - len(blob))
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 32773),
        (262, 3, 1, 1), (273, 4, 1, so), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(packed)),
    ]
    blob += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        blob += struct.pack("<HHI", tag, typ, cnt)
        blob += struct.pack("<I", val) if typ == 4 else struct.pack("<HH", val, 0)
    blob += b"\x00\x00\x00\x00"
    struct.pack_into("<I", blob, 4, ifd)
    assert decode_tiff(bytes(blob)) == (w, h, 1, px)


def test_hostile_containers():
    with pytest.raises(ValueError):
        parse_ifds(b"not a tiff")
    with pytest.raises(ValueError):
        parse_ifds(b"II*\x00\xff\xff\xff\xff")  # IFD offset past EOF
    # self-referential IFD chain must not loop forever
    pages = _law_pages(1, 4, 4, 1)
    blob = bytearray(encode_tiff_gray(pages, 4, 4))
    ifd0 = struct.unpack("<I", blob[4:8])[0]
    nxt_pos = ifd0 + 2 + 12 * 10
    struct.pack_into("<I", blob, nxt_pos, ifd0)  # next-IFD -> itself
    assert len(parse_ifds(bytes(blob))) == 1
    # strip offset pointing past EOF -> truncated pixel data
    good = bytearray(encode_tiff_gray(pages, 4, 4, compression="none", predictor=1))
    ifd_at = struct.unpack("<I", good[4:8])[0]
    so_pos = ifd_at + 2 + 12 * 5 + 8  # tag 273 is the sixth entry
    struct.pack_into("<I", good, so_pos, len(good) + 100)
    with pytest.raises((ValueError, zlib.error)):
        decode_tiff(bytes(good))


def test_unsupported_shapes_raise_cleanly():
    pages = _law_pages(2, 6, 4, 1)
    blob = bytearray(encode_tiff_gray(pages, 6, 4))
    ifd0 = struct.unpack("<I", blob[4:8])[0]
    # rewrite BitsPerSample (tag 258, third entry) to 16
    pos = ifd0 + 2 + 12 * 2 + 8
    struct.pack_into("<HH", blob, pos, 16, 0)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(blob))


def test_image_meta_tiff_branch():
    from docling_spark.ops.png import image_meta

    pages = _law_pages(9, 25, 17, 3)
    blob = encode_tiff_gray(pages, 25, 17)
    assert image_meta(blob) == ("tiff", 25, 17, 1)
    assert image_meta(open(REF_TIFF, "rb").read()) == ("tiff", 612, 792, 4)


def test_decode_real_routes_tiff():
    from docling_spark.ops.multimodal import _decode_real, make_tiff

    w, h, c, px = _decode_real(make_tiff(7))
    assert (w, h, c) == (16 + 7 % 32, 8 + 7 % 16, 1)
    assert px[0] == 7 % 256  # page 0, pixel (0,0)

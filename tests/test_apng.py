"""APNG codec (docling_spark/ops/apng.py): round-trips, spec structure,
hostile inputs. No Spark session needed — pure codec tests."""

from __future__ import annotations

import struct
import zlib

import pytest

from docling_spark.ops.apng import decode_apng, encode_apng, is_apng
from docling_spark.ops.png import _SIG, _chunk, decode_png, encode_png


def _frames(n, w, h, c=1):
    return [bytes([(7 * k + i) % 256 for i in range(w * h * c)]) for k in range(n)]


def test_roundtrip_grey():
    fr = _frames(4, 6, 5)
    blob = encode_apng(fr, 6, 5)
    w, h, c, out = decode_apng(blob)
    assert (w, h, c) == (6, 5, 1)
    assert out == fr


def test_roundtrip_rgb_rgba():
    for c in (3, 4):
        fr = _frames(3, 4, 3, c)
        blob = encode_apng(fr, 4, 3, channels=c)
        w, h, cc, out = decode_apng(blob)
        assert (w, h, cc) == (4, 3, c)
        assert out == fr


def test_single_frame():
    fr = _frames(1, 3, 3)
    w, h, c, out = decode_apng(encode_apng(fr, 3, 3))
    assert out == fr


def test_is_apng_vs_plain_png():
    apng = encode_apng(_frames(2, 4, 4), 4, 4)
    png = encode_png(4, 4, 1, bytes(16))
    assert is_apng(apng) is True
    assert is_apng(png) is False
    assert is_apng(b"GIF89a") is False
    # an APNG is still a valid PNG: its first frame decodes as the image
    w, h, c, payload = decode_png(apng)
    assert (w, h, c) == (4, 4, 1)
    assert payload == _frames(2, 4, 4)[0]


def test_chunk_structure():
    blob = encode_apng(_frames(3, 4, 2), 4, 2)
    # acTL before IDAT; fcTL/fdAT sequence numbers strictly increasing
    order = []
    pos = 8
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        order.append(blob[pos + 4 : pos + 8])
        pos += 12 + ln
    assert order == [
        b"IHDR", b"acTL", b"fcTL", b"IDAT",
        b"fcTL", b"fdAT", b"fcTL", b"fdAT", b"IEND",
    ]


def test_all_decoder_filters_roundtrip():
    """fdAT streams made with every PNG filter type reconstruct (the
    decoder path reuses decode_png's 5-filter machinery)."""
    w, h = 5, 4
    f0, f1 = _frames(2, w, h)
    for ftype in range(5):
        # hand-build: frame 1 encoded with filter `ftype` via encode_png
        one = encode_png(w, h, 1, f1, filter_type=ftype)
        # extract its IDAT payload
        pos, idat = 8, b""
        while pos + 8 <= len(one):
            (ln,) = struct.unpack(">I", one[pos : pos + 4])
            if one[pos + 4 : pos + 8] == b"IDAT":
                idat = one[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        base = encode_apng([f0], w, h)
        # splice: bump acTL to 2 frames, append fcTL(seq1)+fdAT(seq2)
        body = base[: len(base) - 12]  # strip IEND
        body = body.replace(
            _chunk(b"acTL", struct.pack(">II", 1, 0)),
            _chunk(b"acTL", struct.pack(">II", 2, 0)),
        )
        fctl = struct.pack(">IIIIIHHBB", 1, w, h, 0, 0, 100, 1000, 0, 0)
        body += _chunk(b"fcTL", fctl)
        body += _chunk(b"fdAT", struct.pack(">I", 2) + idat)
        body += _chunk(b"IEND", b"")
        _w, _h, _c, out = decode_apng(body)
        assert out == [f0, f1], f"filter {ftype}"


def test_hostile_inputs():
    with pytest.raises(ValueError):
        decode_apng(b"not a png at all")
    with pytest.raises(ValueError):
        encode_apng([], 4, 4)
    with pytest.raises(ValueError):
        encode_apng([bytes(15)], 4, 4)  # size mismatch
    # plain PNG (no acTL) is not an animation
    with pytest.raises(ValueError):
        decode_apng(encode_png(4, 4, 1, bytes(16)))
    # sub-frame placement refused
    blob = bytearray(encode_apng(_frames(2, 4, 4), 4, 4))
    i = blob.find(b"fcTL")
    # x_offset lives 12 bytes into fcTL data (4 after the 4+4+4 header)
    struct.pack_into(">I", blob, i + 4 + 12, 1)
    # fix the crc so the chunk walk isn't the thing that fails
    start, ln = i - 4, struct.unpack(">I", blob[i - 4 : i])[0]
    crc = zlib.crc32(blob[i : i + 4 + ln]) & 0xFFFFFFFF
    struct.pack_into(">I", blob, i + 4 + ln, crc)
    with pytest.raises(ValueError, match="sub-frame"):
        decode_apng(bytes(blob))


def test_out_of_order_sequence_rejected():
    blob = encode_apng(_frames(3, 4, 4), 4, 4)
    i = blob.rfind(b"fdAT")
    bad = bytearray(blob)
    struct.pack_into(">I", bad, i + 4, 99)
    with pytest.raises(ValueError, match="sequence"):
        decode_apng(bytes(bad))

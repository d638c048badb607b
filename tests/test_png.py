"""PNG codec (ops/png.py): round-trips across filters and color types.

The encoder can emit any of the five PNG filter types, so every decoder
reconstruction path (None/Sub/Up/Average/Paeth) is exercised against real
zlib-compressed bytes — no image library involved.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from docling_spark.ops.png import decode_png, encode_png, is_png


def _payload(w, h, c, fn):
    return bytes(fn(x, y, k) % 256 for y in range(h) for x in range(w) for k in range(c))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters_and_channels(filter_type, channels):
    w, h = 13, 7  # odd sizes catch stride bugs
    payload = _payload(w, h, channels, lambda x, y, k: 31 * x + 17 * y + 5 * k)
    blob = encode_png(w, h, channels, payload, filter_type=filter_type)
    assert is_png(blob)
    dw, dh, dc, out = decode_png(blob)
    assert (dw, dh, dc) == (w, h, channels)
    assert out == payload


def test_gradient_known_pixels():
    w, h = 8, 3
    payload = _payload(w, h, 1, lambda x, y, k: x * 10)
    _, _, _, out = decode_png(encode_png(w, h, 1, payload, filter_type=4))
    assert list(out[:8]) == [0, 10, 20, 30, 40, 50, 60, 70]
    assert out[:8] == out[8:16] == out[16:24]


def test_palette_decode():
    """Hand-built indexed PNG (color type 3) expands through PLTE to RGB."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    w, h = 4, 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    rows = b"\x00" + bytes([0, 1, 2, 1]) + b"\x00" + bytes([2, 2, 0, 0])
    blob = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    dw, dh, dc, out = decode_png(blob)
    assert (dw, dh, dc) == (4, 2, 3)
    assert out[0:3] == bytes([255, 0, 0])
    assert out[3:6] == bytes([0, 255, 0])
    assert out[6:9] == bytes([0, 0, 255])


def test_idat_split_across_chunks():
    w, h = 6, 4
    payload = _payload(w, h, 1, lambda x, y, k: x + y)
    blob = encode_png(w, h, 1, payload, filter_type=2)
    # split the single IDAT into two chunks
    import re

    m = re.search(rb"IDAT", blob)
    start = m.start() - 4
    (length,) = struct.unpack(">I", blob[start : start + 4])
    data = blob[start + 8 : start + 8 + length]
    half = length // 2

    def chunk(ctype, d):
        return (
            struct.pack(">I", len(d))
            + ctype
            + d
            + struct.pack(">I", zlib.crc32(ctype + d) & 0xFFFFFFFF)
        )

    rebuilt = (
        blob[:start]
        + chunk(b"IDAT", data[:half])
        + chunk(b"IDAT", data[half:])
        + blob[start + 12 + length :]
    )
    assert decode_png(rebuilt)[3] == payload


@pytest.mark.parametrize(
    "mutation",
    [b"not a png at all", b"\x89PNG\r\n\x1a\n" + b"\x00" * 8],
)
def test_rejects_garbage(mutation):
    with pytest.raises(ValueError):
        decode_png(mutation)


def test_rejects_16bit():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (
        sig
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(blob)


def test_decode_real_seam_png_vs_other():
    from docling_spark.ops.multimodal import _decode_real, make_png

    w, h, c, payload = _decode_real(make_png(5))
    assert c == 1 and len(payload) == w * h
    # JPEG now has a real codec (ops/jpeg.py); a header-only blob is a
    # malformed stream, not an unimplemented format
    with pytest.raises(ValueError):
        _decode_real(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00no-such-format")


def test_image_meta_jpeg_marker_walk():
    """JPEG dimension extraction survives padding bytes and restart
    markers before SOF, and progressive (SOF2) frames."""
    import struct as st

    from docling_spark.ops.png import image_meta

    sof2 = b"\xff\xc2" + st.pack(">HBHHB", 11, 8, 99, 77, 1) + b"\x01\x11\x00"
    jpg = (
        b"\xff\xd8"
        + b"\xff\xfe" + st.pack(">H", 9) + b"comment"  # COM segment
        + b"\xff\xff"  # fill byte noise
        + sof2
        + b"\xff\xd9"
    )
    assert image_meta(jpg) == ("jpeg", 77, 99, 1)


def test_image_meta_rejects_unknown():
    from docling_spark.ops.png import image_meta

    with pytest.raises(ValueError):
        image_meta(b"FIMG fake format")
    with pytest.raises(ValueError):
        image_meta(b"\xff\xd8\xff\xd9")  # JPEG with no SOF


def test_palette_index_out_of_range_raises():
    """Out-of-range palette index must error, not shrink the payload
    (ADVICE png.py:112)."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0])  # only 2 entries
    rows = b"\x00" + bytes([0, 5])  # index 5 > palette size
    blob = (
        sig
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="palette index"):
        decode_png(blob)


def test_image_meta_webp_variants():
    """WebP header sniff: VP8L packed-bit dims + alpha, VP8X extended
    24-bit dims, VP8 lossy keyframe dims; junk fourth chunk rejected."""
    import struct

    from docling_spark.ops.multimodal import _img_params, make_webp_header
    from docling_spark.ops.png import image_meta

    for d in (0, 1, 5, 17, 31):
        w, h, _c, _v = _img_params(d)
        assert image_meta(make_webp_header(d)) == ("webp", w, h, 3 + d % 2)
    vp8x = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8X"
        + struct.pack("<I", 10) + bytes([0x10, 0, 0, 0])
        + (99).to_bytes(3, "little") + (49).to_bytes(3, "little")
    )
    assert image_meta(vp8x) == ("webp", 100, 50, 4)
    vp8 = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP" + b"VP8 "
        + struct.pack("<I", 12) + b"\x00" * 3 + b"\x9d\x01\x2a"
        + struct.pack("<HH", 640, 480)
    )
    assert image_meta(vp8) == ("webp", 640, 480, 3)
    bad = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"JUNK" + b"\x00" * 8
    with pytest.raises(ValueError):
        image_meta(bad)

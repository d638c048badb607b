"""Pure-stdlib PNG codec (RFC 2083 / ISO 15948): zlib + filter reconstruction.

The container has no PIL/ffmpeg, but PNG is just zlib (available) plus five
per-row byte filters — so the multimodal image ops can run on REAL bytes
for PNG inputs instead of the fake ``FIMG`` format. Decode supports 8-bit
greyscale (color type 0), truecolor (2), indexed/PLTE (3), grey+alpha (4)
and RGBA (6), non-interlaced. Encode exists to synthesize deterministic
test corpora and to re-emit resized images; it can emit any filter type so
the decoder's Sub/Up/Average/Paeth paths are round-trip-tested.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(blob: bytes) -> bool:
    return blob[:8] == _SIG


def _chunks(blob: bytes):
    pos = 8
    n = len(blob)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(blob: bytes) -> Tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw interleaved 8-bit samples).

    Palette images are expanded to RGB. Raises ValueError on anything the
    subset doesn't cover (16-bit, interlaced)."""
    if not is_png(blob):
        raise ValueError("not a PNG")
    width = height = None
    bit_depth = color_type = None
    plte: Optional[bytes] = None
    idat = bytearray()
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    out = bytearray(height * stride)
    prev = bytes(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up_left = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color_type == 3:
        if plte is None:
            raise ValueError("indexed PNG without PLTE")
        rgb = bytearray(width * height * 3)
        n_pal = len(plte) // 3
        for i, idx in enumerate(out):
            # an out-of-range index would slice short and SHRINK the
            # destination range — reject malformed input instead
            if idx >= n_pal:
                raise ValueError(
                    f"palette index {idx} out of range (palette has {n_pal})"
                )
            rgb[3 * i : 3 * i + 3] = plte[3 * idx : 3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    channels: int,
    payload: bytes,
    filter_type: int = 0,
) -> bytes:
    """8-bit non-interlaced encoder (greyscale / grey+alpha / RGB / RGBA).

    ``filter_type`` applies one filter to every row — used by tests to
    exercise each reconstruction path in :func:`decode_png`."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(payload) != height * stride:
        raise ValueError("payload size mismatch")
    lines = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = payload[y * stride : (y + 1) * stride]
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            enc = bytes(
                (line[i] - (line[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif filter_type == 2:
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif filter_type == 3:
            enc = bytes(
                (
                    line[i]
                    - (
                        ((line[i - channels] if i >= channels else 0) + prev[i])
                        >> 1
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        elif filter_type == 4:
            enc = bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(filter_type)
        lines += enc
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------- header-only metadata sniff
def image_meta(blob: bytes):
    """(format, width, height, channels) from container headers alone —
    REAL metadata for the major raster formats without a pixel codec:

    - PNG: IHDR (full pixel decode also available, :func:`decode_png`)
    - JPEG: marker walk to the first SOF0..SOF15 frame header
    - GIF87a/89a: logical screen descriptor
    - BMP: BITMAPINFOHEADER
    - TIFF: first-page IFD (full strip decode in ops/tiff.py)
    - WebP: RIFF VP8 /VP8L/VP8X headers (incl. the VP8L packed-bit dims)

    Raises ValueError for anything else."""
    if is_png(blob):
        w, h, depth, ctype = struct.unpack(">IIBB", blob[16:26])
        return ("png", w, h, _CHANNELS.get(ctype, 1) if ctype != 3 else 3)
    if blob[:3] == b"\xff\xd8\xff":
        pos = 2
        n = len(blob)
        while pos + 4 <= n:
            if blob[pos] != 0xFF:
                pos += 1
                continue
            marker = blob[pos + 1]
            if marker == 0xFF:  # fill byte run before a marker
                pos += 1
                continue
            if marker == 0xD9:  # EOI — no SOF seen
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _prec, h, w, ncomp = struct.unpack(
                    ">BHHB", blob[pos + 4 : pos + 10]
                )
                return ("jpeg", w, h, ncomp)
            pos += 2 + seglen
        raise ValueError("no SOF marker in JPEG stream")
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return ("gif", w, h, 3)  # palette expands to RGB
    if blob[:2] == b"BM":
        (hdr_size,) = struct.unpack("<I", blob[14:18])
        if hdr_size >= 40:  # BITMAPINFOHEADER and later
            w, h = struct.unpack("<ii", blob[18:26])
            (bpp,) = struct.unpack("<H", blob[28:30])
            return ("bmp", abs(w), abs(h), max(1, bpp // 8))
        raise ValueError("unsupported BMP header")
    if blob[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import tiff_meta

        _n, w, h, spp = tiff_meta(blob)
        return ("tiff", w, h, spp)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        fourcc = blob[12:16]
        if fourcc == b"VP8X":  # extended: 24-bit (dim - 1) fields
            w = 1 + int.from_bytes(blob[24:27], "little")
            h = 1 + int.from_bytes(blob[27:30], "little")
            return ("webp", w, h, 4 if blob[20] & 0x10 else 3)
        if fourcc == b"VP8L" and blob[20] == 0x2F:
            # lossless: LSB-first 14-bit dims-1, then the alpha bit
            b0, b1, b2, b3 = blob[21:25]
            w = 1 + (b0 | ((b1 & 0x3F) << 8))
            h = 1 + ((b1 >> 6) | (b2 << 2) | ((b3 & 0x0F) << 10))
            return ("webp", w, h, 4 if b3 & 0x10 else 3)
        if fourcc == b"VP8 " and blob[23:26] == b"\x9d\x01\x2a":
            w = int.from_bytes(blob[26:28], "little") & 0x3FFF
            h = int.from_bytes(blob[28:30], "little") & 0x3FFF
            return ("webp", w, h, 3)
        raise ValueError("unsupported WebP variant")
    raise ValueError("unknown image container")

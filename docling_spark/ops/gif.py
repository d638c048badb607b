"""Animated-GIF codec (stdlib, from scratch): the real-container video
path for frame sampling.

The multimodal suite treats video as an opaque binary column with a
frame-sampling operator (SURVEY §2 training-data ops). Round 3 ran that
operator on a synthetic ``FVID`` container behind a documented codec seam;
this module closes the seam with a REAL format: GIF89a animations —
logical screen descriptor, global color table, graphic-control extensions,
per-frame image descriptors, and genuine variable-width LZW in both
directions (spec: GIF89a specification, public). No external codec
library; ffmpeg-class formats (H.264 etc.) remain out of scope in this
environment and are documented as such at the `_decode_real` seam in
ops/multimodal.py.
"""

from __future__ import annotations

import struct
from typing import List, Tuple


# ------------------------------------------------------------------ LZW
def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF variable-width LZW: dictionary-building encoder (clear code =
    2^min, EOI = 2^min+1, width grows after the table tops 2^width, table
    reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


# ------------------------------------------------------------ container
def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: List[bytes], width: int, height: int, delay_cs: int = 10
) -> bytes:
    """frames: per-frame index bytes (len == width*height), 8-bit indices
    into a 256-entry grayscale global color table → GIF89a animation."""
    gct = bytes(v for i in range(256) for v in (i, i, i))
    # screen descriptor: GCT present, 8-bit color resolution, 256 entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += gct
    # Netscape looping extension (standard for animations)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame size mismatch")
        out += b"\x21\xf9" + struct.pack("<BBHB", 4, 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW min code size
        out += _sub_blocks(lzw_encode(idx, 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(raw: bytes) -> Tuple[int, int, List[bytes], bytes]:
    """→ (width, height, [frame index bytes], global color table).
    Frames are returned as full-screen index buffers (frames positioned
    inside the logical screen are composited onto the previous frame —
    disposal method 'do not dispose', the common animation case)."""
    if raw[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1)
        gct = raw[pos : pos + 3 * n]
        pos += 3 * n
    frames: List[bytes] = []
    screen = bytearray(width * height)
    while pos < len(raw):
        b0 = raw[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(raw) and raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
        fx, fy, fw, fh, lflags = struct.unpack_from("<HHHHB", raw, pos + 1)
        pos += 10
        if lflags & 0x80:  # local color table: skip (indices still valid)
            pos += 3 * (2 ** ((lflags & 0x07) + 1))
        min_code = raw[pos]
        pos += 1
        blocks = bytearray()
        while pos < len(raw) and raw[pos] != 0:
            ln = raw[pos]
            blocks += raw[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(blocks), min_code)
        if lflags & 0x40:
            raise ValueError("interlaced GIF not supported")
        # composite onto the screen
        for row in range(min(fh, height - fy)):
            src = idx[row * fw : row * fw + min(fw, width - fx)]
            off = (fy + row) * width + fx
            screen[off : off + len(src)] = src
        frames.append(bytes(screen))
    return width, height, frames, gct

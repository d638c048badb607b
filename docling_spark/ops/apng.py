"""Animated PNG (APNG) codec — stdlib-only, built on ops/png.py.

Closes the remaining video-container seam next to the animated-GIF codec
(ops/gif.py): a REAL spec-compliant APNG container (acTL / fcTL / fdAT
chunks per the W3C APNG spec) whose frames are genuine zlib-compressed,
filtered PNG image data. Frame decode reuses the full PNG reconstruction
path (all 5 filters) by re-wrapping each frame's compressed stream as a
single-frame PNG.

Scope (documented): 8-bit greyscale/RGB/RGBA full-frame animations —
every fcTL must cover the whole canvas at (0,0); sub-frame placement
with dispose/blend compositing is the GIF codec's territory
(ops/gif.py composites variable-size frames) and raises here.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

from .png import _SIG, _chunk, _chunks, decode_png

_COLOR_BY_CHANNELS = {1: 0, 3: 2, 4: 6}


def _filtered_stream(width: int, channels: int, payload: bytes) -> bytes:
    """Filter-type-0 scanline stream (the encoder side keeps filtering
    trivial; the DECODER handles all five filters via decode_png)."""
    stride = width * channels
    out = bytearray()
    for ofs in range(0, len(payload), stride):
        out.append(0)
        out += payload[ofs : ofs + stride]
    return bytes(out)


def encode_apng(
    frames: List[bytes],
    width: int,
    height: int,
    channels: int = 1,
    delay_ms: int = 100,
) -> bytes:
    """Frames (raw 8-bit payloads, full canvas each) -> APNG bytes.

    Chunk layout per spec: IHDR, acTL, then for frame 0 an fcTL + IDAT,
    and for each later frame an fcTL + fdAT (4-byte sequence prefix on
    the compressed stream). Sequence numbers cover fcTL AND fdAT."""
    if not frames:
        raise ValueError("need at least one frame")
    stride = width * channels
    for f in frames:
        if len(f) != stride * height:
            raise ValueError("frame size mismatch")
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_BY_CHANNELS[channels], 0, 0, 0
    )
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", ihdr)
    out += _chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for k, f in enumerate(frames):
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, delay_ms, 1000, 0, 0
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        data = zlib.compress(_filtered_stream(width, channels, f))
        if k == 0:
            out += _chunk(b"IDAT", data)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def is_apng(blob: bytes) -> bool:
    """PNG signature + an acTL chunk before the first IDAT."""
    if blob[:8] != _SIG:
        return False
    for ctype, _data in _chunks(blob):
        if ctype == b"acTL":
            return True
        if ctype == b"IDAT":
            return False
    return False


def decode_apng(blob: bytes) -> Tuple[int, int, int, List[bytes]]:
    """APNG bytes -> (width, height, channels, [raw frame payloads]).

    Each frame's compressed stream is re-wrapped as a one-frame PNG and
    run through decode_png, so every PNG filter type round-trips."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG container")
    ihdr_data = None
    n_frames = None
    streams: List[bytearray] = []
    pending_fctl = None
    expect_seq = 0
    for ctype, data in _chunks(blob):
        if ctype == b"IHDR":
            ihdr_data = data
        elif ctype == b"acTL":
            n_frames = struct.unpack(">I", data[:4])[0]
        elif ctype == b"fcTL":
            seq, fw, fh, ox, oy = struct.unpack(">IIIII", data[:20])
            if seq != expect_seq:
                raise ValueError("fcTL sequence out of order")
            expect_seq += 1
            w, h = struct.unpack(">II", ihdr_data[:8])
            if (fw, fh, ox, oy) != (w, h, 0, 0):
                raise ValueError(
                    "sub-frame placement not supported (full-canvas only)"
                )
            pending_fctl = seq
            streams.append(bytearray())
        elif ctype == b"IDAT":
            if pending_fctl is None:
                raise ValueError("IDAT outside the animation (no fcTL)")
            streams[-1] += data
        elif ctype == b"fdAT":
            seq = struct.unpack(">I", data[:4])[0]
            if seq != expect_seq:
                raise ValueError("fdAT sequence out of order")
            expect_seq += 1
            streams[-1] += data[4:]
    if ihdr_data is None or n_frames is None:
        raise ValueError("missing IHDR/acTL")
    if len(streams) != n_frames:
        raise ValueError("frame count mismatch")
    frames = []
    channels = None
    for s in streams:
        one = (
            _SIG
            + _chunk(b"IHDR", ihdr_data)
            + _chunk(b"IDAT", bytes(s))
            + _chunk(b"IEND", b"")
        )
        # s is a complete standalone zlib stream per spec ("each frame
        # is compressed as a full image"), so the re-wrap is lossless
        w, h, channels, payload = decode_png(one)
        frames.append(payload)
    return w, h, channels, frames

"""ISO-BMFF (MP4) container metadata: from-scratch box walk, stdlib-only.

Closes the multimodal video seam at the same level as the r3 JPEG/GIF/
BMP work: REAL container bytes (our own builder emits genuine ISO/IEC
14496-12 box structure) and a genuine parser — ftyp brand, mvhd
timescale/duration (both version 0 and version 1 layouts), per-trak
tkhd 16.16 fixed-point dimensions, largesize (64-bit) boxes, unknown-
box skipping. Frame/sample DECODING (avc1/mp4a codecs) stays behind
the documented NN/codec seam in ops/multimodal.py — a real pipeline
hands mdat to ffmpeg; the metadata path here is what partitioning,
routing and dedup actually consume.

Deterministic law (mirrored by the mm_codecs oracle):
  timescale 600; duration units 600*(3 + doc_id%27) + doc_id%7;
  video w=160+16*(doc_id%20), h=120+16*(doc_id%15);
  n_tracks = 1 + doc_id%2 (second trak = audio, 0x0 dims);
  brand = [isom, mp42, avc1][doc_id%3];
  mvhd/tkhd version 1 (64-bit times) when doc_id%5==0, else 0;
  mdat uses a largesize header when doc_id%11==0.
"""

from __future__ import annotations

import struct


def _box(typ: bytes, payload: bytes, largesize: bool = False) -> bytes:
    if largesize:
        return struct.pack(">I", 1) + typ + struct.pack(">Q", 16 + len(payload)) + payload
    return struct.pack(">I", 8 + len(payload)) + typ + payload


_MATRIX = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mvhd(version: int, timescale: int, duration: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIQ", 0, 0, timescale, duration)
    else:
        body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, rsvd
    body += b"\x00" * 8 + _MATRIX + b"\x00" * 24 + struct.pack(">I", 0xFFFFFFFF)
    return _box(b"mvhd", bytes([version, 0, 0, 0]) + body)


def _tkhd(version: int, track_id: int, duration: int, w: int, h: int) -> bytes:
    if version == 1:
        body = struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
    else:
        body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0) + _MATRIX
    body += struct.pack(">II", w << 16, h << 16)
    return _box(b"tkhd", bytes([version, 0, 0, 7]) + body)


def build_mp4(doc_id: int) -> bytes:
    ts = 600
    dur = ts * (3 + doc_id % 27) + doc_id % 7
    w = 160 + 16 * (doc_id % 20)
    h = 120 + 16 * (doc_id % 15)
    ver = 1 if doc_id % 5 == 0 else 0
    brand = [b"isom", b"mp42", b"avc1"][doc_id % 3]
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + b"isom" + b"mp41")
    traks = [_box(b"trak", _tkhd(ver, 1, dur, w, h))]
    if doc_id % 2 == 1:
        traks.append(_box(b"trak", _tkhd(ver, 2, dur, 0, 0)))
    moov = _box(
        b"moov",
        _mvhd(ver, ts, dur) + b"".join(traks) + _box(b"udta", b""),
    )
    free = _box(b"free", b"\x00" * (doc_id % 13))
    mdat = _box(
        b"mdat",
        bytes((doc_id + i) % 256 for i in range(32 + doc_id % 64)),
        largesize=(doc_id % 11 == 0),
    )
    return ftyp + free + moov + mdat


def _walk(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) of the boxes in a range."""
    off = start
    while off + 8 <= end:
        size = struct.unpack_from(">I", data, off)[0]
        typ = data[off + 4 : off + 8]
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", data, off + 8)[0]
            payload = off + 16
        elif size == 0:  # box extends to end of file
            size = end - off
            payload = off + 8
        else:
            payload = off + 8
        if size < payload - off or off + size > end:
            raise ValueError("bad box size")
        yield typ, payload, off + size
        off += size


def parse_mp4(data: bytes) -> dict:
    """(brand, timescale, duration_ms, width, height, n_tracks) or raise
    ValueError on non-ISO-BMFF input."""
    brand = None
    timescale = duration = None
    width = height = 0
    n_tracks = 0
    saw_moov = False
    for typ, p, e in _walk(data, 0, len(data)):
        if typ == b"ftyp":
            brand = data[p : p + 4].decode("latin-1")
        elif typ == b"moov":
            saw_moov = True
            for t2, p2, e2 in _walk(data, p, e):
                if t2 == b"mvhd":
                    ver = data[p2]
                    if ver == 1:
                        timescale, duration = struct.unpack_from(">IQ", data, p2 + 20)
                    else:
                        timescale, duration = struct.unpack_from(">II", data, p2 + 12)
                elif t2 == b"trak":
                    n_tracks += 1
                    for t3, p3, _e3 in _walk(data, p2, e2):
                        if t3 == b"tkhd":
                            base = p3 + (36 if data[p3] == 1 else 24)
                            wh_off = base + 16 + 36
                            w16, h16 = struct.unpack_from(">II", data, wh_off)
                            width = max(width, w16 >> 16)
                            height = max(height, h16 >> 16)
    if brand is None or not saw_moov or timescale in (None, 0):
        raise ValueError("not an ISO-BMFF movie")
    return {
        "brand": brand,
        "timescale": int(timescale),
        "duration_ms": int(duration) * 1000 // int(timescale),
        "width": width,
        "height": height,
        "n_tracks": n_tracks,
    }

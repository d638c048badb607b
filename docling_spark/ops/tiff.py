"""TIFF container codec (stdlib, from scratch): TIFF 6.0 baseline strips.

IFD walk over both byte orders (II/MM), multi-page chains, strip
assembly with Compression 1 (none), 5 (LZW — the PDF LZWDecode in
pdfx/parser.py IS TIFF LZW with EarlyChange, reused), 8/32946 (Deflate)
and 32773 (PackBits), plus horizontal-differencing Predictor 2.

Reference parity: docling converts TIFF input by rendering pages through
PIL/pypdfium (its `tests/data/tiff/2206.01062.tif` fixture exercises
that path); this repo decodes the container from scratch so Spark-side
multimodal operators stay dependency-free — that fixture (2 pages,
612x792 RGBA, LZW + predictor 2) is decoded bit-for-bit by this module's
own strip pipeline in tests/test_tiff.py.

Scope: 8-bit chunky (PlanarConfiguration=1) strip TIFFs — the baseline
every scanner/export toolchain writes. Tiled, planar, sub-byte and
float TIFFs raise NotImplementedError cleanly.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, List, Tuple

from ..pdfx.parser import _apply_tiff_predictor, _lzw_decode

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def is_tiff(blob: bytes) -> bool:
    return blob[:4] in (b"II*\x00", b"MM\x00*")


def _read_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes):
    size = _TYPE_SIZE.get(typ, 1) * cnt
    buf = raw[:4] if size <= 4 else data[struct.unpack(bo + "I", raw)[0] :]
    if typ == 3:
        return list(struct.unpack_from(bo + "H" * cnt, buf))
    if typ == 4:
        return list(struct.unpack_from(bo + "I" * cnt, buf))
    if typ in (1, 6, 7):
        return list(buf[:cnt])
    if typ == 5:
        return [
            struct.unpack_from(bo + "II", buf, 8 * i) for i in range(cnt)
        ]
    return list(buf[:size])


def parse_ifds(blob: bytes) -> List[Dict[int, list]]:
    """All IFDs (pages) as tag → value-list dicts."""
    if not is_tiff(blob):
        raise ValueError("not a TIFF")
    bo = "<" if blob[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", blob[4:8])[0]
    pages = []
    seen = set()
    while off and off not in seen and off + 2 <= len(blob):
        seen.add(off)  # cycle guard for hostile containers
        n = struct.unpack(bo + "H", blob[off : off + 2])[0]
        tags: Dict[int, list] = {}
        for i in range(n):
            e = blob[off + 2 + 12 * i : off + 14 + 12 * i]
            if len(e) < 12:
                break
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            try:
                tags[tag] = _read_values(blob, bo, typ, cnt, e[8:12])
            except struct.error:
                continue
        pages.append(tags)
        nxt = blob[off + 2 + 12 * n : off + 6 + 12 * n]
        off = struct.unpack(bo + "I", nxt)[0] if len(nxt) == 4 else 0
    if not pages:
        raise ValueError("TIFF with no IFDs")
    return pages


def tiff_meta(blob: bytes) -> Tuple[int, int, int, int]:
    """(n_pages, width, height, samples_per_pixel) of the first page."""
    pages = parse_ifds(blob)
    t = pages[0]
    return (
        len(pages),
        t.get(256, [0])[0],
        t.get(257, [0])[0],
        t.get(277, [1])[0],
    )


def _unpackbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - h)
                i += 1
        # 128 = no-op
    return bytes(out)


def decode_tiff(blob: bytes, page: int = 0) -> Tuple[int, int, int, bytes]:
    """→ (width, height, channels, interleaved 8-bit pixel bytes)."""
    tags = parse_ifds(blob)[page]
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF")
    w = tags.get(256, [0])[0]
    h = tags.get(257, [0])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit samples")
    if tags.get(284, [1])[0] != 1:
        raise NotImplementedError("planar TIFF")
    comp = tags.get(259, [1])[0]
    pred = tags.get(317, [1])[0]
    rps = tags.get(278, [h or 1])[0] or (h or 1)
    offsets = tags.get(273, [])
    counts = tags.get(279, [])
    if not offsets:
        raise ValueError("TIFF with no strips")
    if len(counts) < len(offsets):
        counts = counts + [len(blob)] * (len(offsets) - len(counts))
    rowlen = w * spp
    out = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        raw = blob[so : so + sc]
        if comp == 1:
            data = raw
        elif comp == 5:
            data = _lzw_decode(raw)
        elif comp in (8, 32946):
            data = zlib.decompress(raw)
        elif comp == 32773:
            data = _unpackbits(raw)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        if pred == 2:
            data = _apply_tiff_predictor(data, spp, 8, w)
        nrows = min(rps, h - si * rps)
        out += data[: nrows * rowlen]
    if len(out) < w * h * spp:
        raise ValueError("truncated TIFF pixel data")
    return w, h, spp, bytes(out[: w * h * spp])


# -------------------------------------------------------------- encoder
def encode_tiff_gray(
    pages: List[bytes],
    width: int,
    height: int,
    compression: str = "deflate",
    predictor: int = 2,
) -> bytes:
    """Multi-page grayscale strip TIFF (little-endian) for synth corpora:
    one strip per page, Deflate or raw strips, optional Predictor 2."""
    comp_tag = {"none": 1, "deflate": 8}[compression]
    blob = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_offsets = []
    strip_info = []
    for px in pages:
        if len(px) != width * height:
            raise ValueError("page size mismatch")
        data = bytearray(px)
        if predictor == 2:
            for r0 in range(0, len(data), width):
                for j in range(width - 1, 0, -1):
                    data[r0 + j] = (data[r0 + j] - data[r0 + j - 1]) & 0xFF
        strip = zlib.compress(bytes(data)) if comp_tag == 8 else bytes(data)
        strip_info.append((len(blob), len(strip)))
        blob += strip
    for pi in range(len(pages)):
        if len(blob) % 2:
            blob += b"\x00"
        ifd_offsets.append(len(blob))
        so, sc = strip_info[pi]
        entries = [
            (256, 3, 1, width),
            (257, 3, 1, height),
            (258, 3, 1, 8),
            (259, 3, 1, comp_tag),
            (262, 3, 1, 1),  # BlackIsZero
            (273, 4, 1, so),
            (277, 3, 1, 1),
            (278, 3, 1, height),
            (279, 4, 1, sc),
            (317, 3, 1, predictor),
        ]
        blob += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            blob += struct.pack("<HHI", tag, typ, cnt)
            blob += struct.pack("<I", val) if typ == 4 else struct.pack(
                "<HH", val, 0
            )
        blob += b"\x00\x00\x00\x00"  # next-IFD placeholder
    # link the IFD chain
    struct.pack_into("<I", blob, 4, ifd_offsets[0])
    for pi in range(len(pages) - 1):
        nxt_pos = ifd_offsets[pi] + 2 + 12 * 10
        struct.pack_into("<I", blob, nxt_pos, ifd_offsets[pi + 1])
    return bytes(blob)

"""OFD glyph decoding WITHOUT fonttools: stdlib sfnt cmap parsing.

Reference parity: OFDGlyphDecoder
(/root/reference/docling/backend/ofd_glyph_decoder.py:1-159) maps the
<CGTransform><Glyphs> glyph-id stream of a TextObject back to unicode via
the embedded font's cmap (fontTools ``getBestCmap`` + ``getGlyphName``,
composed into glyph-id → codepoint). The reference gates this behind an
optional fonttools import; here the same chain is a ~100-line stdlib
parser of the sfnt ``cmap`` table (formats 4 and 12, the ones real fonts
carry) — deterministic, no dependency.

Semantics mirrored exactly (ofd_glyph_decoder.py:120-159):
- glyph id found in the reverse cmap → its codepoint (when several
  codepoints map to one glyph, the HIGHEST wins — fontTools' reverse-dict
  iteration order);
- unmapped glyph id → fall back to the next character of the raw
  TextCode text (positional);
- no decodable glyph at all → None (caller keeps the PUA-strip path).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

# getBestCmap's platform/encoding preference order (public fontTools
# behavior): full-unicode tables first, then BMP.
_PREFERRED = (
    (3, 10),
    (0, 6),
    (0, 4),
    (3, 1),
    (0, 3),
    (0, 2),
    (0, 1),
    (0, 0),
)


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from(">H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from(">I", b, o)[0]


def _cmap_offset(font: bytes) -> Optional[int]:
    """Locate the cmap table in a TTF/OTF sfnt (TTC: first font)."""
    if len(font) < 12:
        return None
    tag = font[:4]
    base = 0
    if tag == b"ttcf":  # collection: use the first face
        if len(font) < 16:
            return None
        base = _u32(font, 12)
        tag = font[base : base + 4]
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
        return None
    num_tables = _u16(font, base + 4)
    for i in range(num_tables):
        rec = base + 12 + 16 * i
        if rec + 16 > len(font):
            return None
        if font[rec : rec + 4] == b"cmap":
            return _u32(font, rec + 8)
    return None


def _parse_format4(font: bytes, off: int, out: Dict[int, int]) -> None:
    segcount = _u16(font, off + 6) // 2
    ends = off + 14
    starts = ends + segcount * 2 + 2  # +2: reservedPad
    deltas = starts + segcount * 2
    ranges = deltas + segcount * 2
    for s in range(segcount):
        end = _u16(font, ends + 2 * s)
        start = _u16(font, starts + 2 * s)
        delta = struct.unpack_from(">h", font, deltas + 2 * s)[0]
        range_off = _u16(font, ranges + 2 * s)
        if start == 0xFFFF and end == 0xFFFF:
            continue
        for cp in range(start, end + 1):
            if range_off == 0:
                gid = (cp + delta) & 0xFFFF
            else:
                gi = ranges + 2 * s + range_off + 2 * (cp - start)
                if gi + 2 > len(font):
                    continue
                gid = _u16(font, gi)
                if gid != 0:
                    gid = (gid + delta) & 0xFFFF
            if gid != 0:
                out[cp] = gid


def _parse_format12(font: bytes, off: int, out: Dict[int, int]) -> None:
    n_groups = _u32(font, off + 12)
    for g in range(n_groups):
        go = off + 16 + 12 * g
        if go + 12 > len(font):
            return
        start_cp = _u32(font, go)
        end_cp = _u32(font, go + 4)
        start_gid = _u32(font, go + 8)
        if end_cp - start_cp > 0x10FFFF:  # malformed guard
            return
        for i in range(end_cp - start_cp + 1):
            out[start_cp + i] = start_gid + i


def best_cmap(font: bytes) -> Dict[int, int]:
    """codepoint → glyph id from the preferred cmap subtable (the stdlib
    analog of fontTools getBestCmap, which returns codepoint → name over
    the same subtable preference)."""
    cmap_off = _cmap_offset(font)
    if cmap_off is None or cmap_off + 4 > len(font):
        return {}
    n = _u16(font, cmap_off + 2)
    subtables = {}
    for i in range(n):
        rec = cmap_off + 4 + 8 * i
        if rec + 8 > len(font):
            break
        plat, enc = _u16(font, rec), _u16(font, rec + 2)
        subtables[(plat, enc)] = cmap_off + _u32(font, rec + 4)
    for key in _PREFERRED:
        off = subtables.get(key)
        if off is None or off + 2 > len(font):
            continue
        fmt = _u16(font, off)
        out: Dict[int, int] = {}
        if fmt == 4:
            _parse_format4(font, off, out)
        elif fmt == 12:
            _parse_format12(font, off, out)
        else:
            continue
        if out:
            return out
    return {}


def reverse_cmap(font: bytes) -> Dict[int, int]:
    """glyph id → codepoint; ascending-codepoint overwrite so the highest
    codepoint wins for shared glyphs (fontTools reverse-dict parity)."""
    fwd = best_cmap(font)
    rev: Dict[int, int] = {}
    for cp in sorted(fwd):
        rev[fwd[cp]] = cp
    return rev


def decode_glyphs(
    font_or_rev, glyphs_text: str, original_text: str
) -> Optional[str]:
    """<Glyphs> id stream + raw TextCode text → decoded unicode, or None
    (semantics of ofd_glyph_decoder.decode_glyphs, minus fonttools).
    ``font_or_rev``: raw font bytes, or a precomputed reverse cmap (the
    caller caches one per font per document)."""
    try:
        glyph_ids = [int(g) for g in glyphs_text.split() if g.strip()]
    except ValueError:
        return None
    if not glyph_ids:
        return None
    rev = (
        font_or_rev
        if isinstance(font_or_rev, dict)
        else reverse_cmap(font_or_rev)
    )
    if not rev:
        return None
    decoded: List[str] = []
    for gid in glyph_ids:
        cp = rev.get(gid)
        if cp is not None:
            decoded.append(chr(cp))
        elif len(decoded) < len(original_text):
            decoded.append(original_text[len(decoded)])
    if not decoded:
        return None
    return "".join(decoded)

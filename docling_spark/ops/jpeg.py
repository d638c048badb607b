"""Baseline JPEG codec (stdlib, from scratch): ITU-T T.81 sequential DCT.

Closes the JPEG pixel seam in the multimodal suite (round-3 verdict listed
it as the remaining image-codec partial): a real decoder for baseline
(SOF0) JPEGs — DQT/DHT/SOF0/SOS/DRI parsing, huffman entropy decode,
dequantization, 2-D IDCT, level shift, chroma upsampling, YCbCr→RGB —
plus a matching encoder used to synthesize test corpora.

Determinism for value oracles: JPEG is lossy in general, but an image
whose 8x8 blocks are CONSTANT quantized with unit (all-ones) tables
round-trips BIT-EXACTLY — a constant block's FDCT is DC-only, the DC
coefficient 8*(v-128) is an exact integer, and the DC-only IDCT returns
exactly v. The synth corpus (ops/multimodal.make_jpeg) exploits this, so
`mm_jpeg_ops` can value-check real entropy-coded scans in DuckDB.

Scope: baseline sequential, grayscale + YCbCr with sampling factors up to
2x2 (covers 4:4:4 / 4:2:2 / 4:2:0), restart markers. Progressive and
arithmetic coding are out of scope (raise cleanly).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K huffman table specs (public spec): (bits[1..16], values)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_codes(bits: List[int], values: List[int]) -> Dict[int, Tuple[int, int]]:
    """value → (code, length) per the canonical huffman construction."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# ------------------------------------------------------------------ DCT
def _fdct_2d(px: List[float]) -> List[float]:
    c = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += px[y * 8 + x] * _COS[u][x]
            tmp[y * 8 + u] = s * c[u] / 2.0
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[y * 8 + u] * _COS[v][y]
            out[v * 8 + u] = s * c[v] / 2.0
    return out


_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for x in range(8)]
    for u in range(8)
]

# IDCT as two 8x8 matmuls: out = M.T @ coef @ M with M[u,x] = c[u]*cos/2.
# Built lazily so the encoder path stays importable without numpy.
_IDCT_M = None


def _idct_matrix():
    global _IDCT_M
    if _IDCT_M is None:
        import numpy as np

        c = [1.0 / math.sqrt(2.0)] + [1.0] * 7
        _IDCT_M = np.array(
            [[c[u] * _COS[u][x] / 2.0 for x in range(8)] for u in range(8)]
        )
    return _IDCT_M


# -------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _magnitude(v: int) -> Tuple[int, int]:
    """JPEG magnitude category + appended bits for a signed value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_gray(
    pixels: bytes, width: int, height: int, quant: Optional[List[int]] = None
) -> bytes:
    """Grayscale baseline JPEG. ``quant``: 64 zigzag-order divisors
    (default all-ones = bit-exact for block-constant images)."""
    q = quant or [1] * 64
    dc_codes = _build_codes(*_DC_LUM)
    ac_codes = _build_codes(*_AC_LUM)
    bw = _BitWriter()
    prev_dc = 0
    bh = (height + 7) // 8
    bwid = (width + 7) // 8
    for by in range(bh):
        for bx in range(bwid):
            block = [0.0] * 64
            for y in range(8):
                for x in range(8):
                    sy = min(by * 8 + y, height - 1)
                    sx = min(bx * 8 + x, width - 1)
                    block[y * 8 + x] = pixels[sy * width + sx] - 128.0
            coef = _fdct_2d(block)
            zz = [int(round(coef[ZIGZAG[i]] / q[i])) for i in range(64)]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size, bits = _magnitude(diff)
            code, ln = dc_codes[size]
            bw.write(code, ln)
            if size:
                bw.write(bits, size)
            run = 0
            last_nz = 0
            for i in range(63, 0, -1):
                if zz[i]:
                    last_nz = i
                    break
            for i in range(1, last_nz + 1):
                if zz[i] == 0:
                    run += 1
                    if run == 16:
                        code, ln = ac_codes[0xF0]  # ZRL
                        bw.write(code, ln)
                        run = 0
                    continue
                size, bits = _magnitude(zz[i])
                code, ln = ac_codes[(run << 4) | size]
                bw.write(code, ln)
                bw.write(bits, size)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dqt = seg(0xDB, bytes([0]) + bytes(q))
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1])
        + bytes([0x10]) + bytes(_AC_LUM[0]) + bytes(_AC_LUM[1]),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"


# -------------------------------------------------------------- decoder
class _BitReader:
    """Chunked entropy-segment reader: keeps a >=16-bit accumulator so
    huffman decode is one peek16 + LUT hit and receive-extend is one
    masked shift (per-bit reads were the decoder's hot spot)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        data, pos, n = self.data, self.pos, len(self.data)
        acc, nbits = self.acc, self.nbits
        while nbits <= 16 and pos < n:
            b = data[pos]
            pos += 1
            if b == 0xFF:
                nxt = data[pos] if pos < n else 0
                if nxt == 0x00:
                    pos += 1  # stuffed byte
                else:
                    pos -= 1  # marker: rewind and stop feeding
                    break
            acc = (acc << 8) | b
            nbits += 8
        self.acc, self.nbits, self.pos = acc, nbits, pos

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
            if self.nbits < 16:
                # end of segment: zero-pad (truncated streams decode as 0s)
                return (self.acc << (16 - self.nbits)) & 0xFFFF
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def drop(self, k: int) -> None:
        if self.nbits < k:  # only possible on truncated streams
            self.acc = 0
            self.nbits = 0
            return
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                v = (self.acc << (n - self.nbits)) & ((1 << n) - 1)
                self.acc = 0
                self.nbits = 0
                return v
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.nbits = 0
        # skip to just past the RST marker
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


_LUT_CACHE: Dict[Tuple[Tuple[int, ...], Tuple[int, ...]], List[int]] = {}


def _build_lut(bits: List[int], values: List[int]) -> List[int]:
    """peek16 → (value << 5 | code_length), -1 = invalid prefix. Filling
    every 16-bit extension of each code makes huffman decode O(1)."""
    key = (tuple(bits), tuple(values))
    lut = _LUT_CACHE.get(key)
    if lut is not None:
        return lut
    lut = [-1] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            lut[lo:hi] = [(values[k] << 5) | length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    _LUT_CACHE[key] = lut
    return lut


def _huff_read(br: _BitReader, lut: List[int]) -> int:
    v = lut[br.peek16()]
    if v < 0:
        raise ValueError("bad huffman code")
    br.drop(v & 31)
    return v >> 5


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode(raw: bytes):
    """Baseline JPEG → (width, height, channels, pixel bytes).
    1 channel = grayscale; 3 channels = interleaved RGB."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    quant: Dict[int, List[int]] = {}
    huff_dc: Dict[int, Dict] = {}
    huff_ac: Dict[int, Dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(raw):
        if raw[pos] != 0xFF:
            pos += 1
            continue
        marker = raw[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(raw):
            raise ValueError("truncated JPEG marker segment")
        length = struct.unpack_from(">H", raw, pos + 2)[0]
        body = raw[pos + 4 : pos + 2 + length]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:
                    quant[tq] = [
                        struct.unpack_from(">H", body, i + 2 * k)[0]
                        for k in range(64)
                    ]
                    i += 128
                else:
                    quant[tq] = list(body[i : i + 64])
                    i += 64
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                table = _build_lut(bits, values)
                (huff_ac if tc else huff_dc)[th] = table
                i += 17 + n
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (progressive/etc.)")
        elif marker == 0xDD:
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                scan.append({"cs": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            data_start = pos + 2 + length
            return _decode_scan(
                raw, data_start, frame, scan, quant, huff_dc, huff_ac,
                restart_interval,
            )
        pos += 2 + length
    raise ValueError("no SOS in JPEG")


def _decode_scan(raw, start, frame, scan, quant, huff_dc, huff_ac, dri):
    import numpy as np

    if frame is None:
        raise ValueError("SOS before SOF")
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["cs"]]
        c["td"], c["ta"] = s["td"], s["ta"]
    # Pass 1 — entropy decode only: per component, zigzag coefficient rows
    # plus each block's (ox, oy) plane origin. Everything downstream
    # (dequant, IDCT, plane/color assembly) is batched numpy.
    blocks: Dict[int, List[List[int]]] = {c["id"]: [] for c in comps}
    origins: Dict[int, List[Tuple[int, int]]] = {c["id"]: [] for c in comps}
    br = _BitReader(raw[start:])
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                br.align_to_marker()
                pred = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                cid = c["id"]
                dc_lut = huff_dc[c["td"]]
                ac_lut = huff_ac[c["ta"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        zz = [0] * 64
                        t = _huff_read(br, dc_lut)
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, ac_lut)
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                break
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        blocks[cid].append(zz)
                        origins[cid].append(
                            ((mx * c["h"] + hh) * 8, (my * c["v"] + v) * 8)
                        )
    # Pass 2 — batched dequant + IDCT + plane assembly.
    m = _idct_matrix()
    planes = {}
    for c in comps:
        cid = c["id"]
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        zzs = np.array(blocks[cid], dtype=np.float64)  # (n, 64) zigzag order
        qv = np.array(quant[c["tq"]], dtype=np.float64)
        coefs = np.zeros_like(zzs)
        coefs[:, ZIGZAG] = zzs * qv
        coefs = coefs.reshape(-1, 8, 8)
        px = m.T @ coefs @ m + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = np.zeros((ph, pw), dtype=np.uint8)
        for (ox, oy), block in zip(origins[cid], px):
            plane[oy : oy + 8, ox : ox + 8] = block
        planes[cid] = plane
    if len(comps) == 1:
        return w, h, 1, planes[comps[0]["id"]][:h, :w].tobytes()
    # YCbCr → RGB with nearest-neighbor chroma upsampling (vectorized)
    ys = np.arange(h)
    xs = np.arange(w)
    Y = planes[comps[0]["id"]][:h, :w].astype(np.float64)
    cb_c, cr_c = comps[1], comps[2]
    Cb = planes[cb_c["id"]][
        np.ix_(ys // (vmax // cb_c["v"]), xs // (hmax // cb_c["h"]))
    ].astype(np.float64) - 128.0
    Cr = planes[cr_c["id"]][
        np.ix_(ys // (vmax // cr_c["v"]), xs // (hmax // cr_c["h"]))
    ].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            Y + 1.402 * Cr,
            Y - 0.344136 * Cb - 0.714136 * Cr,
            Y + 1.772 * Cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, rgb.tobytes()

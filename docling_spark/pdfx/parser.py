"""Pure-Python PDF object parser (no native libs in this environment).

Re-derives only what the extraction contract needs from a digital-born PDF:
object graph, page tree, decoded content streams, and font resources.
Covers classic xref tables, xref streams (PDF 1.5+), object streams
(/ObjStm), FlateDecode (+PNG predictors), and a brute-force object scan
fallback for damaged files.

Reference parity notes: plays the role of docling's pdfium-backed page
backends (/root/reference/docling/backend/pypdfium2_backend.py:102-408,
docling_parse_v4_backend.py:25-189) — i.e. "give me the page's text with
geometry"; everything NN-based is out of contract (SURVEY.md §2.4).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Optional

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int = 0):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"Ref({self.num})"

    def __eq__(self, o):
        return isinstance(o, Ref) and o.num == self.num and o.gen == self.gen

    def __hash__(self):
        return hash((self.num, self.gen))


class Name(str):
    """PDF name (distinct from string for dispatch clarity)."""


class Stream:
    __slots__ = ("dict", "raw", "_doc", "num", "gen")

    def __init__(
        self, d: dict, raw: bytes, doc: "PdfDocument", num: int = 0, gen: int = 0
    ):
        self.dict = d
        self.raw = raw
        self._doc = doc
        self.num = num
        self.gen = gen

    def data(self) -> bytes:
        raw = self.raw
        crypt = getattr(self._doc, "_crypt", None)
        if crypt is not None and not self._crypt_identity():
            # xref streams are never encrypted, but they are also only read
            # during __init__ before _crypt exists, so no special-casing
            raw = crypt.decrypt(raw, self.num, self.gen)
        return _decode_stream(self.dict, raw, self._doc)

    def _crypt_identity(self) -> bool:
        """Spec 7.4.10: a stream whose /Filter chain contains a Crypt
        filter whose /DecodeParms /Name is Identity (or absent) is EXEMPT
        from the document's /StmF decrypt — e.g. plaintext XMP metadata
        inside an encrypted PDF. Unconditionally decrypting such a stream
        would garble it."""
        doc = self._doc
        filters = doc.resolve(self.dict.get("Filter"))
        if filters is None:
            return False
        if not isinstance(filters, list):
            filters = [filters]
        if not any(str(f) == "Crypt" for f in filters):
            return False
        parms = doc.resolve(
            self.dict.get("DecodeParms") or self.dict.get("DP")
        )
        if not isinstance(parms, list):
            parms = [parms]
        for f, p in zip(filters, parms + [None] * len(filters)):
            if str(f) == "Crypt":
                p = doc.resolve(p)
                name = (
                    str(doc.resolve(p.get("Name", "Identity")))
                    if isinstance(p, dict)
                    else "Identity"
                )
                return name == "Identity"
        return False


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    rowlen = (colors * bpc * columns + 7) // 8
    nbytes = max((colors * bpc + 7) // 8, 1)
    out = bytearray()
    prev = bytearray(rowlen)
    i = 0
    while i < len(data):
        ft = data[i]
        i += 1
        row = bytearray(data[i : i + rowlen])
        i += rowlen
        if ft == 0:
            pass
        elif ft == 1:
            for j in range(nbytes, len(row)):
                row[j] = (row[j] + row[j - nbytes]) & 0xFF
        elif ft == 2:
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:
            for j in range(len(row)):
                left = row[j - nbytes] if j >= nbytes else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:
            for j in range(len(row)):
                a = row[j - nbytes] if j >= nbytes else 0
                b = prev[j]
                c = prev[j - nbytes] if j >= nbytes else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_tiff_predictor(
    data: bytes, colors: int, bpc: int, columns: int
) -> bytes:
    """TIFF Predictor 2 (horizontal differencing, spec Table 10): each
    sample is stored as the delta from the previous sample of the same
    color component; undo by a running per-row prefix sum. 8-bit
    components (the overwhelmingly common case); sub-byte depths fall back
    to returning the data unchanged rather than corrupting it."""
    if bpc != 8:
        return data
    rowlen = colors * columns
    out = bytearray(data)
    for r0 in range(0, len(out) - len(out) % rowlen, rowlen):
        for j in range(colors, rowlen):
            out[r0 + j] = (out[r0 + j] + out[r0 + j - colors]) & 0xFF
    return bytes(out)


def _decode_stream(d: dict, raw: bytes, doc: "PdfDocument") -> bytes:
    filters = doc.resolve(d.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = doc.resolve(d.get("DecodeParms")) or doc.resolve(d.get("DP"))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        f = str(f)
        p = doc.resolve(p) or {}
        if f in ("FlateDecode", "Fl"):
            try:
                data = zlib.decompress(data)
            except zlib.error:
                # tolerate trailing garbage / missing EOD
                data = zlib.decompressobj().decompress(data)
            pred = doc.resolve(p.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    int(doc.resolve(p.get("Colors", 1)) or 1),
                    int(doc.resolve(p.get("BitsPerComponent", 8)) or 8),
                    int(doc.resolve(p.get("Columns", 1)) or 1),
                )
            elif pred == 2:
                data = _apply_tiff_predictor(
                    data,
                    int(doc.resolve(p.get("Colors", 1)) or 1),
                    int(doc.resolve(p.get("BitsPerComponent", 8)) or 8),
                    int(doc.resolve(p.get("Columns", 1)) or 1),
                )
        elif f in ("ASCIIHexDecode", "AHx"):
            h = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
            if len(h) % 2:
                h += b"0"
            data = bytes.fromhex(h.decode("ascii"))
        elif f in ("ASCII85Decode", "A85"):
            import base64

            body = data.split(b"~>")[0]
            body = bytes(c for c in body if c not in _WS)
            if body.startswith(b"<~"):
                body = body[2:]
            data = base64.a85decode(body)
        elif f in ("LZWDecode", "LZW"):
            data = _lzw_decode(data)
            pred = doc.resolve(p.get("Predictor", 1)) or 1
            if pred >= 10:
                data = _apply_png_predictor(
                    data,
                    int(doc.resolve(p.get("Colors", 1)) or 1),
                    int(doc.resolve(p.get("BitsPerComponent", 8)) or 8),
                    int(doc.resolve(p.get("Columns", 1)) or 1),
                )
            elif pred == 2:
                data = _apply_tiff_predictor(
                    data,
                    int(doc.resolve(p.get("Colors", 1)) or 1),
                    int(doc.resolve(p.get("BitsPerComponent", 8)) or 8),
                    int(doc.resolve(p.get("Columns", 1)) or 1),
                )
        elif f in ("DCTDecode", "JPXDecode", "JBIG2Decode", "CCITTFaxDecode"):
            # image codecs: content kept opaque (pictures are placeholders in
            # the extraction contract, mirroring fetch_images=False)
            return data
        elif f == "RunLengthDecode":
            out = bytearray()
            i = 0
            while i < len(data):
                l = data[i]
                if l == 128:
                    break
                if l < 128:
                    out += data[i + 1 : i + 2 + l]
                    i += 2 + l
                else:
                    out += data[i + 1 : i + 2] * (257 - l)
                    i += 2
            data = bytes(out)
        elif f == "Crypt":
            # spec §7.4.10: the Crypt filter names a crypt filter from the
            # document's /CF; decryption already happened in Stream.data()
            # via the security handler (Identity = passthrough either way)
            continue
        else:
            raise NotImplementedError(f"filter {f}")
    return data


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits, acc, width = 0, 0, 9
    prev: Optional[bytes] = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


class Lexer:
    """Tokenizer/parser over the raw PDF bytes at arbitrary offsets."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def skip_ws(self) -> None:
        buf, n = self.buf, len(self.buf)
        while self.pos < n:
            c = buf[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # '%' comment
                e = buf.find(b"\n", self.pos)
                self.pos = len(buf) if e < 0 else e + 1
            else:
                return

    def parse_object(self) -> Any:
        self.skip_ws()
        buf = self.buf
        c = buf[self.pos : self.pos + 1]
        if c == b"<":
            if buf[self.pos : self.pos + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == b"(":
            return self._parse_literal_string()
        if c == b"/":
            return self._parse_name()
        if c == b"[":
            self.pos += 1
            arr = []
            while True:
                self.skip_ws()
                if buf[self.pos : self.pos + 1] == b"]":
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        if c == b"]" or c == b">":
            raise ValueError(f"unexpected {c!r} at {self.pos}")
        m = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+").match(buf, self.pos)
        if not m:
            raise ValueError(f"lex error at {self.pos}")
        tok = m.group()
        self.pos = m.end()
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        # number, possibly an indirect reference "N G R"
        if re.fullmatch(rb"[+-]?\d+", tok):
            save = self.pos
            try:
                self.skip_ws()
                m2 = re.compile(rb"\d+").match(buf, self.pos)
                if m2:
                    p2 = m2.end()
                    l = Lexer(buf)
                    l.pos = p2
                    l.skip_ws()
                    if buf[l.pos : l.pos + 1] == b"R" and (
                        l.pos + 1 >= len(buf)
                        or buf[l.pos + 1] in _WS
                        or buf[l.pos + 1] in _DELIM
                    ):
                        self.pos = l.pos + 1
                        return Ref(int(tok), int(m2.group()))
            except Exception:
                pass
            self.pos = save
            return int(tok)
        try:
            return float(tok)
        except ValueError:
            return Name(tok.decode("latin-1"))  # bare keyword (obj/endobj handled upstream)

    def _parse_name(self) -> Name:
        m = re.compile(rb"/([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)").match(self.buf, self.pos)
        self.pos = m.end()
        raw = m.group(1)
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda g: bytes([int(g.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _parse_dict(self) -> Any:
        self.pos += 2
        d: dict = {}
        buf = self.buf
        while True:
            self.skip_ws()
            if buf[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                break
            key = self._parse_name()
            d[str(key)] = self.parse_object()
        # stream?
        save = self.pos
        self.skip_ws()
        if buf[self.pos : self.pos + 6] == b"stream":
            self.pos += 6
            if buf[self.pos : self.pos + 2] == b"\r\n":
                self.pos += 2
            elif buf[self.pos : self.pos + 1] in (b"\n", b"\r"):
                self.pos += 1
            return ("__stream_at__", d, self.pos)
        self.pos = save
        return d

    def _parse_hex_string(self) -> bytes:
        e = self.buf.find(b">", self.pos)
        h = re.sub(rb"[^0-9A-Fa-f]", b"", self.buf[self.pos + 1 : e])
        self.pos = e + 1
        if len(h) % 2:
            h += b"0"
        return bytes.fromhex(h.decode("ascii"))

    def _parse_literal_string(self) -> bytes:
        buf = self.buf
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while i < len(buf):
            c = buf[i]
            if c == 0x5C:  # backslash
                nxt = buf[i + 1 : i + 2]
                if nxt in (b"n", b"r", b"t", b"b", b"f"):
                    out += {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c"}[nxt]
                    i += 2
                elif nxt in (b"(", b")", b"\\"):
                    out += nxt
                    i += 2
                elif nxt == b"\r":
                    i += 3 if buf[i + 2 : i + 3] == b"\n" else 2
                elif nxt == b"\n":
                    i += 2
                elif nxt and nxt in b"01234567":
                    m = re.compile(rb"[0-7]{1,3}").match(buf, i + 1)
                    out.append(int(m.group(), 8) & 0xFF)
                    i = m.end()
                else:
                    i += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                i += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = i + 1
                    return bytes(out)
                out.append(c)
                i += 1
            else:
                out.append(c)
                i += 1
        self.pos = i
        return bytes(out)


class PdfDocument:
    """Lazy object store + page tree over one PDF blob."""

    def __init__(self, blob: bytes, password: "str | bytes" = ""):
        self.buf = blob
        self.xref: dict[int, tuple] = {}  # num -> ("f", offset) | ("c", objstm_num, idx)
        self.trailer: dict = {}
        self._cache: dict[int, Any] = {}
        self._objstm_cache: dict[int, dict[int, Any]] = {}
        self._crypt = None
        try:
            self._load_xref()
        except Exception:
            self.xref = {}
        if not self.xref or "Root" not in self.trailer:
            self._scan_objects()
        encref = self.trailer.get("Encrypt")
        if encref is not None:
            # build the standard security handler (raises PdfPasswordError
            # when the password — default: the empty user password, which
            # unlocks most "owner-locked" PDFs — does not authenticate).
            # The /Encrypt dict itself and /ID are never encrypted.
            from .crypt import make_handler

            enc = self.resolve(encref)
            ids = self.resolve(self.trailer.get("ID")) or [b""]
            id0 = bytes(ids[0]) if ids else b""
            if isinstance(enc, dict):
                self._crypt = make_handler(enc, id0, password)

    # ---------------------------------------------------------------- xref
    def _load_xref(self) -> None:
        tail = self.buf[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if not m:
            raise ValueError("no startxref")
        seen: set[int] = set()
        off: Optional[int] = int(m.group(1))
        while off is not None and off not in seen and 0 <= off < len(self.buf):
            seen.add(off)
            off = self._load_xref_section(off)

    def _load_xref_section(self, off: int) -> Optional[int]:
        lx = Lexer(self.buf)
        lx.pos = off
        lx.skip_ws()
        if self.buf[lx.pos : lx.pos + 4] == b"xref":
            return self._load_xref_table(lx.pos + 4)
        # xref stream: "N G obj <<...>> stream"
        obj = self._parse_indirect_at(lx.pos)
        if isinstance(obj, Stream):
            self._load_xref_stream(obj)
            prev = obj.dict.get("Prev")
            return int(prev) if prev is not None else None
        raise ValueError("bad xref section")

    def _load_xref_table(self, pos: int) -> Optional[int]:
        lx = Lexer(self.buf)
        lx.pos = pos
        while True:
            lx.skip_ws()
            if self.buf[lx.pos : lx.pos + 7] == b"trailer":
                lx.pos += 7
                tr = lx.parse_object()
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                if "XRefStm" in tr:  # hybrid-reference file
                    try:
                        self._load_xref_section(int(tr["XRefStm"]))
                    except Exception:
                        pass
                prev = tr.get("Prev")
                return int(prev) if prev is not None else None
            m = re.compile(rb"(\d+)\s+(\d+)").match(self.buf, lx.pos)
            if not m:
                return None
            start, count = int(m.group(1)), int(m.group(2))
            p = m.end()
            for i in range(count):
                mm = re.compile(rb"\s*(\d{10})\s+(\d{5})\s+([nf])").match(self.buf, p)
                if not mm:
                    break
                if mm.group(3) == b"n" and (start + i) not in self.xref:
                    self.xref[start + i] = ("f", int(mm.group(1)))
                p = mm.end()
            lx.pos = p

    def _load_xref_stream(self, st: Stream) -> None:
        d = st.dict
        for k, v in d.items():
            if k not in ("Length", "Filter", "DecodeParms", "W", "Index", "Type", "Size", "Prev"):
                self.trailer.setdefault(k, v)
        self.trailer.setdefault("Size", d.get("Size"))
        w = [int(self.resolve(x)) for x in self.resolve(d["W"])]
        size = int(self.resolve(d["Size"]))
        index = self.resolve(d.get("Index")) or [0, size]
        data = st.data()
        rowlen = sum(w)
        pos = 0
        for i in range(0, len(index), 2):
            start, count = int(index[i]), int(index[i + 1])
            for num in range(start, start + count):
                if pos + rowlen > len(data):
                    return
                row = data[pos : pos + rowlen]
                pos += rowlen
                fields = []
                o = 0
                for width in w:
                    fields.append(int.from_bytes(row[o : o + width], "big") if width else None)
                    o += width
                ftype = fields[0] if w[0] else 1
                if num in self.xref:
                    continue
                if ftype == 1:
                    self.xref[num] = ("f", fields[1])
                elif ftype == 2:
                    self.xref[num] = ("c", fields[1], fields[2])

    def _scan_objects(self) -> None:
        """Fallback: brute-force scan for `N G obj` (last wins per spec order)."""
        for m in re.finditer(rb"(?m)^[^\S\n]*(\d+)\s+(\d+)\s+obj\b", self.buf):
            self.xref[int(m.group(1))] = ("f", m.start(1))
        # recover the Encrypt ref too: a rebuilt (xref-less) encrypted PDF
        # must still authenticate instead of silently yielding ciphertext
        if "Encrypt" not in self.trailer:
            me = None
            for me in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", self.buf):
                pass
            if me:
                self.trailer["Encrypt"] = Ref(int(me.group(1)), int(me.group(2)))
                mid = None
                for mid in re.finditer(
                    rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>", self.buf
                ):
                    pass
                if mid:
                    self.trailer["ID"] = [bytes.fromhex(mid.group(1).decode())]
        if "Root" not in self.trailer:
            mt = None
            for mt in re.finditer(rb"/Root\s+(\d+)\s+(\d+)\s+R", self.buf):
                pass
            if mt:
                self.trailer["Root"] = Ref(int(mt.group(1)), int(mt.group(2)))
            else:
                for num in self.xref:
                    try:
                        o = self.get(num)
                    except Exception:
                        continue
                    if isinstance(o, dict) and str(o.get("Type")) == "Catalog":
                        self.trailer["Root"] = Ref(num)
                        break

    # ------------------------------------------------------------- objects
    def _parse_indirect_at(self, off: int) -> Any:
        m = re.compile(rb"(\d+)\s+(\d+)\s+obj").match(self.buf, off)
        if not m:
            # tolerate offset pointing at whitespace before
            lx0 = Lexer(self.buf)
            lx0.pos = off
            lx0.skip_ws()
            m = re.compile(rb"(\d+)\s+(\d+)\s+obj").match(self.buf, lx0.pos)
            if not m:
                raise ValueError(f"no obj at {off}")
        num, gen = int(m.group(1)), int(m.group(2))
        lx = Lexer(self.buf)
        lx.pos = m.end()
        obj = lx.parse_object()
        if isinstance(obj, tuple) and obj[0] == "__stream_at__":
            _, d, data_start = obj
            length = self.resolve(d.get("Length"))
            if isinstance(length, (int, float)):
                raw = self.buf[data_start : data_start + int(length)]
                # validate: endstream should follow (some writers lie in /Length)
                tailpos = data_start + int(length)
                if self.buf[tailpos : tailpos + 20].lstrip(b"\r\n \t").startswith(b"endstream"):
                    return Stream(d, raw, self, num, gen)
            e = self.buf.find(b"endstream", data_start)
            raw = self.buf[data_start : e if e >= 0 else len(self.buf)]
            return Stream(d, raw.rstrip(b"\r\n"), self, num, gen)
        if self._crypt is not None:
            obj = self._decrypt_strings(obj, num, gen)
        return obj

    def _decrypt_strings(self, obj: Any, num: int, gen: int) -> Any:
        """Strings in directly-addressed objects are encrypted (spec
        §7.6.2); strings inside object streams are NOT (the container
        stream already was), so only _parse_indirect_at calls this."""
        if isinstance(obj, Name):
            return obj
        if isinstance(obj, bytes):
            # is_string routes through /StrF (may differ from /StmF)
            return self._crypt.decrypt(obj, num, gen, is_string=True)
        if isinstance(obj, dict):
            return {k: self._decrypt_strings(v, num, gen) for k, v in obj.items()}
        if isinstance(obj, list):
            return [self._decrypt_strings(v, num, gen) for v in obj]
        return obj

    def get(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            return None
        if ent[0] == "f":
            obj = self._parse_indirect_at(ent[1])
        else:
            obj = self._get_from_objstm(ent[1], ent[2], num)
        self._cache[num] = obj
        return obj

    def _get_from_objstm(self, stm_num: int, idx: int, want: int) -> Any:
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            st = self.get(stm_num)
            objs = {}
            if isinstance(st, Stream):
                data = st.data()
                n = int(self.resolve(st.dict.get("N", 0)))
                first = int(self.resolve(st.dict.get("First", 0)))
                hl = Lexer(data[:first])
                pairs = []
                for _ in range(n):
                    onum = hl.parse_object()
                    ooff = hl.parse_object()
                    pairs.append((int(onum), int(ooff)))
                for onum, ooff in pairs:
                    ol = Lexer(data)
                    ol.pos = first + ooff
                    try:
                        objs[onum] = ol.parse_object()
                    except Exception:
                        objs[onum] = None
            self._objstm_cache[stm_num] = objs
        return objs.get(want)

    def resolve(self, obj: Any, depth: int = 0) -> Any:
        while isinstance(obj, Ref) and depth < 32:
            obj = self.get(obj.num)
            depth += 1
        return obj

    # ---------------------------------------------------------------- pages
    def catalog(self) -> dict:
        root = self.resolve(self.trailer.get("Root"))
        return root if isinstance(root, dict) else {}

    def pages(self) -> list["PdfPage"]:
        out: list[PdfPage] = []
        root = self.catalog()
        node = self.resolve(root.get("Pages"))
        if not isinstance(node, dict):
            # damaged: scan for Page objects in document order
            for num in sorted(self.xref):
                o = self.get(num)
                if isinstance(o, dict) and str(o.get("Type")) == "Page":
                    out.append(PdfPage(self, o, len(out)))
            return out
        seen: set[int] = set()

        def walk(nd: Any, inherited: dict) -> None:
            nd_r = self.resolve(nd)
            if not isinstance(nd_r, dict):
                return
            oid = nd.num if isinstance(nd, Ref) else id(nd_r)
            if oid in seen or len(out) > 10000:
                return
            seen.add(oid)
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "CropBox", "Rotate"):
                if k in nd_r:
                    inh[k] = nd_r[k]
            if str(nd_r.get("Type")) == "Page" or ("Contents" in nd_r and "Kids" not in nd_r):
                merged = dict(inh)
                merged.update(nd_r)
                out.append(PdfPage(self, merged, len(out)))
                return
            for kid in self.resolve(nd_r.get("Kids")) or []:
                walk(kid, inh)

        walk(root.get("Pages"), {})
        return out


class PdfPage:
    def __init__(self, doc: PdfDocument, d: dict, index: int):
        self.doc = doc
        self.dict = d
        self.index = index

    def mediabox(self) -> tuple[float, float, float, float]:
        mb = self.doc.resolve(self.dict.get("MediaBox")) or [0, 0, 612, 792]
        vals = [float(self.doc.resolve(v)) for v in mb]
        x0, y0, x1, y1 = vals
        return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))

    def rotation(self) -> int:
        try:
            r = int(self.doc.resolve(self.dict.get("Rotate", 0)) or 0)
        except (TypeError, ValueError):
            r = 0
        return r % 360

    def content_bytes(self) -> bytes:
        c = self.doc.resolve(self.dict.get("Contents"))
        if isinstance(c, Stream):
            return c.data()
        if isinstance(c, list):
            parts = []
            for s in c:
                s = self.doc.resolve(s)
                if isinstance(s, Stream):
                    parts.append(s.data())
            return b"\n".join(parts)
        return b""

    def resources(self) -> dict:
        r = self.doc.resolve(self.dict.get("Resources"))
        return r if isinstance(r, dict) else {}

    def _interp(self):
        """One content-stream execution per page, shared by text_cells()
        and pictures() so requesting both costs a single pass."""
        if not hasattr(self, "_interp_cache"):
            from .content import TextInterpreter

            it = TextInterpreter(self)
            it.run()
            self._interp_cache = it
        return self._interp_cache

    def text_cells(self) -> list:
        """Runs → merged text cells in reading order (see layout.py).

        /Rotate is normalized here: the run extractor composes a base CTM
        that maps content coordinates into an upright page, so line grouping
        and XY-cut always see reading-orientation geometry."""
        from .layout import runs_to_cells

        runs = self._interp().runs
        x0, y0, x1, y1 = self.mediabox()
        w, h = x1 - x0, y1 - y0
        if self.rotation() in (90, 270):
            h = w
        return runs_to_cells(runs, page_height=h)

    def pictures(self) -> list:
        """Placed image-XObject regions (bbox in upright page coords,
        pixel dims, filter chain) — the deterministic analog of the
        reference's PictureItem clusters (its layout NN groups picture
        regions; docling/backend/docling_parse_v4_backend.py renders them
        for the picture-description models, which are out of contract)."""
        return self._interp().pictures

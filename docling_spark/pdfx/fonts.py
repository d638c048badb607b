"""Font decoding for the PDF text path: code bytes → unicode + advance width.

Covers simple fonts (Type1/TrueType/Type3: base encoding + /Differences +
/ToUnicode) and composite Type0/CID fonts (Identity-H/V + /ToUnicode +
CID /W widths). Glyph names resolve through a compact Adobe-Glyph-List
subset plus the uniXXXX convention.

Reference role: pdfium's charset handling, consumed via text cells in
/root/reference/docling/backend/pypdfium2_backend.py (we need the same
observable output — unicode text with usable geometry — not its internals).
"""

from __future__ import annotations

import re
from typing import Optional

from .parser import Name, PdfDocument, Stream

# Glyph names beyond what cp1252/mac-roman round-trips give us; the long tail
# (Greek, math, dingbats) resolves via uniXXXX or falls back to empty.
_AGL = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#", "dollar": "$",
    "percent": "%", "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=", "greater": ">",
    "question": "?", "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•", "dagger": "†",
    "daggerdbl": "‡", "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ",
    "ffi": "ﬃ", "ffl": "ﬄ", "fraction": "⁄", "florin": "ƒ",
    "cent": "¢", "sterling": "£", "yen": "¥", "currency": "¤",
    "section": "§", "paragraph": "¶", "copyright": "©",
    "registered": "®", "trademark": "™", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "minus": "−", "periodcentered": "·", "middot": "·",
    "dotlessi": "ı", "circumflex": "ˆ", "tilde": "˜",
    "macron": "¯", "breve": "˘", "dotaccent": "˙",
    "ring": "˚", "cedilla": "¸", "hungarumlaut": "˝",
    "ogonek": "˛", "caron": "ˇ", "Euro": "€",
    "exclamdown": "¡", "questiondown": "¿", "brokenbar": "¦",
    "ordfeminine": "ª", "ordmasculine": "º", "logicalnot": "¬",
    "mu": "µ", "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "germandbls": "ß", "eth": "ð",
    "thorn": "þ", "Thorn": "Þ", "Eth": "Ð", "AE": "Æ",
    "ae": "æ", "OE": "Œ", "oe": "œ", "Oslash": "Ø",
    "oslash": "ø", "Lslash": "Ł", "lslash": "ł",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "Ydieresis": "Ÿ", "nbspace": " ",
    "sfthyphen": "­", "softhyphen": "­",
}
for _c in range(0x41, 0x5B):
    _AGL[chr(_c)] = chr(_c)
for _c in range(0x61, 0x7B):
    _AGL[chr(_c)] = chr(_c)
# accented latin: "Aacute" style names
_ACCENTS = {
    "acute": "́", "grave": "̀", "circumflex": "̂", "tilde": "̃",
    "dieresis": "̈", "ring": "̊", "cedilla": "̧", "caron": "̌",
    "breve": "̆", "macron": "̄", "hungarumlaut": "̋",
    "ogonek": "̨", "dotaccent": "̇",
}


def glyph_to_unicode(name: str) -> str:
    if name in _AGL:
        return _AGL[name]
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1)[:6], 16))
        except ValueError:
            return ""
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return ""
    m = re.fullmatch(r"([A-Za-z])(%s)" % "|".join(_ACCENTS), name)
    if m:
        import unicodedata

        return unicodedata.normalize("NFC", m.group(1) + _ACCENTS[m.group(2)])
    return ""


def _cp1252_table() -> list[str]:
    out = []
    for i in range(256):
        try:
            out.append(bytes([i]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append("")
    return out


def _macroman_table() -> list[str]:
    out = []
    for i in range(256):
        try:
            out.append(bytes([i]).decode("mac-roman"))
        except UnicodeDecodeError:
            out.append("")
    return out


_WIN = _cp1252_table()
_MAC = _macroman_table()
# StandardEncoding differs from ASCII mainly in the upper half + quotes
_STD = list(_WIN)
_STD[0x27] = "’"
_STD[0x60] = "‘"
_STD[0xA4] = "⁄"
_STD[0xA6] = "ƒ"
_STD[0xA8] = "¤"
_STD[0xAA] = "“"
_STD[0xAC] = "‹"
_STD[0xAD] = "›"
_STD[0xAE] = "ﬁ"
_STD[0xAF] = "ﬂ"
_STD[0xB1] = "–"
_STD[0xB2] = "†"
_STD[0xB3] = "‡"
_STD[0xB4] = "·"
_STD[0xB7] = "•"
_STD[0xB8] = "‚"
_STD[0xB9] = "„"
_STD[0xBA] = "”"
_STD[0xD0] = "—"

_BASE_ENCODINGS = {
    "WinAnsiEncoding": _WIN,
    "MacRomanEncoding": _MAC,
    "StandardEncoding": _STD,
    "MacExpertEncoding": [""] * 256,
}

# Helvetica AFM widths for ASCII 32..126 (/1000 em) — used when a base-14
# font omits /Widths; Times/Courier reuse it as an approximation (geometry
# only drives whitespace heuristics, not output text).
_HELV_W = [
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333, 278, 278,
    556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278, 584, 584, 584, 556,
    1015, 667, 667, 722, 722, 667, 611, 778, 722, 278, 500, 667, 556, 833, 722, 778,
    667, 778, 722, 667, 611, 722, 667, 944, 667, 667, 611, 278, 278, 278, 469, 556,
    333, 556, 556, 500, 556, 556, 278, 556, 556, 222, 222, 500, 222, 833, 556, 556,
    556, 556, 333, 500, 278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584,
]


def _parse_tounicode(data: bytes) -> dict[int, str]:
    """bfchar/bfrange blocks → {code: unicode string}."""
    out: dict[int, str] = {}
    text = data.decode("latin-1", "replace")

    def hex2str(h: str) -> str:
        h = re.sub(r"\s", "", h)
        if len(h) % 4 == 2:  # odd utf16 length: treat as raw byte chars
            try:
                return "".join(chr(int(h[i : i + 2], 16)) for i in range(0, len(h), 2))
            except ValueError:
                return ""
        try:
            b = bytes.fromhex(h)
            return b.decode("utf-16-be", "ignore")
        except ValueError:
            return ""

    for block in re.findall(r"beginbfchar(.*?)endbfchar", text, re.S):
        for src, dst in re.findall(r"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>", block):
            code = int(re.sub(r"\s", "", src), 16)
            out[code] = hex2str(dst)
    for block in re.findall(r"beginbfrange(.*?)endbfrange", text, re.S):
        # <lo> <hi> <dst>  |  <lo> <hi> [<d1> <d2> ...]
        pat = re.compile(
            r"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(\[(?:[^\]]*)\]|<[0-9A-Fa-f\s]+>)",
            re.S,
        )
        for lo_s, hi_s, dst in pat.findall(block):
            lo = int(re.sub(r"\s", "", lo_s), 16)
            hi = int(re.sub(r"\s", "", hi_s), 16)
            if hi - lo > 65535:
                continue
            if dst.startswith("["):
                items = re.findall(r"<([0-9A-Fa-f\s]+)>", dst)
                for i, it in enumerate(items):
                    if lo + i <= hi:
                        out[lo + i] = hex2str(it)
            else:
                base_h = re.sub(r"[\s<>]", "", dst)
                s = hex2str(base_h)
                if not s:
                    continue
                base_cp = ord(s[-1]) if s else 0
                prefix = s[:-1]
                for i in range(hi - lo + 1):
                    out[lo + i] = prefix + chr(base_cp + i)
    return out


class Font:
    """Decoded view of one font resource."""

    def __init__(self, doc: PdfDocument, d: dict):
        self.doc = doc
        self.dict = d
        self.subtype = str(doc.resolve(d.get("Subtype") or ""))
        self.is_cid = self.subtype == "Type0"
        self.two_byte = False
        self.tounicode: dict[int, str] = {}
        self.enc_table: Optional[list[str]] = None
        self.base_name = ""
        self.widths: dict[int, float] = {}
        self.default_width = 500.0
        try:
            self._build()
        except Exception:
            pass

    def _build(self) -> None:
        doc = self.doc
        d = self.dict
        tu = doc.resolve(d.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                self.tounicode = _parse_tounicode(tu.data())
            except Exception:
                self.tounicode = {}
        if self.is_cid:
            enc = doc.resolve(d.get("Encoding"))
            enc_name = str(enc) if isinstance(enc, (Name, str)) else ""
            self.two_byte = True  # Identity-H/V and most CMaps here are 2-byte
            desc = doc.resolve(d.get("DescendantFonts")) or []
            if desc:
                df = doc.resolve(desc[0])
                if isinstance(df, dict):
                    self.default_width = float(doc.resolve(df.get("DW", 1000)) or 1000)
                    w = doc.resolve(df.get("W")) or []
                    self._parse_cid_widths(w)
            if enc_name not in ("Identity-H", "Identity-V", ""):
                # non-identity CMap: rely on ToUnicode for text; widths by CID
                pass
            return
        # simple font
        enc = doc.resolve(d.get("Encoding"))
        base_name = str(doc.resolve(d.get("BaseFont") or ""))
        self.base_name = base_name
        symbolic = "Symbol" in base_name or "Dingbat" in base_name
        table = list(_STD if symbolic else _WIN)
        if isinstance(enc, (Name, str)) and str(enc) in _BASE_ENCODINGS:
            table = list(_BASE_ENCODINGS[str(enc)])
        elif isinstance(enc, dict):
            base = doc.resolve(enc.get("BaseEncoding"))
            if isinstance(base, (Name, str)) and str(base) in _BASE_ENCODINGS:
                table = list(_BASE_ENCODINGS[str(base)])
            diffs = doc.resolve(enc.get("Differences")) or []
            code = 0
            for item in diffs:
                item = doc.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, (Name, str)):
                    if 0 <= code < 256:
                        u = glyph_to_unicode(str(item))
                        if not u and str(item) != ".notdef":
                            # docling-parse parity: a glyph NAME with no
                            # unicode mapping surfaces as its /name — the
                            # reference's own golden for redp5110_sampled
                            # reads "/g115/g3 /g40/g81..." for a symbol
                            # font with gNN names and no ToUnicode
                            u = "/" + str(item)
                        table[code] = u
                    code += 1
        self.enc_table = table
        fc = doc.resolve(d.get("FirstChar"))
        ws = doc.resolve(d.get("Widths"))
        if isinstance(ws, list) and fc is not None:
            for i, wv in enumerate(ws):
                wv = doc.resolve(wv)
                if isinstance(wv, (int, float)):
                    self.widths[int(fc) + i] = float(wv)
        elif "Courier" in base_name or "Mono" in base_name:
            self.default_width = 600.0
        else:
            for i, wv in enumerate(_HELV_W):
                self.widths[32 + i] = float(wv)
        fd = doc.resolve(d.get("FontDescriptor"))
        if isinstance(fd, dict):
            mw = doc.resolve(fd.get("MissingWidth"))
            if isinstance(mw, (int, float)):
                self.default_width = float(mw)

    def _parse_cid_widths(self, w: list) -> None:
        doc = self.doc
        i = 0
        w = [doc.resolve(x) for x in w]
        while i < len(w):
            if i + 1 < len(w) and isinstance(w[i + 1], list):
                start = int(w[i])
                for j, wv in enumerate(doc.resolve(w[i + 1]) or []):
                    wv = doc.resolve(wv)
                    if isinstance(wv, (int, float)):
                        self.widths[start + j] = float(wv)
                i += 2
            elif i + 2 < len(w):
                lo, hi, wv = int(w[i]), int(w[i + 1]), doc.resolve(w[i + 2])
                if isinstance(wv, (int, float)) and hi - lo < 65536:
                    for c in range(lo, hi + 1):
                        self.widths[c] = float(wv)
                i += 3
            else:
                break

    # ------------------------------------------------------------- decode
    def iter_codes(self, raw: bytes):
        """Yield (code, unicode, width/1000) per glyph in a show string."""
        if self.is_cid:
            for i in range(0, len(raw) - 1, 2):
                code = (raw[i] << 8) | raw[i + 1]
                u = self.tounicode.get(code)
                if u is None:
                    u = chr(code) if 0x20 <= code < 0xD800 else ""
                yield code, u, self.widths.get(code, self.default_width)
            if len(raw) % 2:  # trailing odd byte
                code = raw[-1]
                yield code, self.tounicode.get(code, ""), self.default_width
        else:
            for b in raw:
                u = self.tounicode.get(b)
                if u is None:
                    u = self.enc_table[b] if self.enc_table else chr(b)
                    if u == "" and self.base_name:
                        # docling-parse parity: a code with NO mapping at
                        # all surfaces as an explicit marker — the
                        # reference golden redp5110_sampled.md contains
                        # "GLYPH<c=1,font=/NKDKKL+JansonTextLTStd-Roman>"
                        u = f"GLYPH<c={b},font=/{self.base_name}>"
                yield b, u, self.widths.get(b, self.default_width)


def load_fonts(doc: PdfDocument, resources: dict) -> dict[str, Font]:
    fonts: dict[str, Font] = {}
    fd = doc.resolve(resources.get("Font"))
    if isinstance(fd, dict):
        for name, ref in fd.items():
            obj = doc.resolve(ref)
            if isinstance(obj, dict):
                fonts[str(name)] = Font(doc, obj)
    return fonts

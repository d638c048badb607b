"""DOCX backend: Office Open XML wordprocessing → SpanDoc.

Re-derives the observable behavior of the reference MsWordDocumentBackend
(/root/reference/docling/backend/msword_backend.py:49-1646) without its
python-docx / lxml / PIL dependencies: a DOCX file is a zip of XML parts
(ECMA-376, public spec), parsed here with stdlib ``zipfile`` +
``xml.etree.ElementTree``. The part of python-docx the reference relies on
(paragraph styles with base-style chains, run formatting tri-states,
hyperlink relationship resolution, table grids with gridSpan/vMerge master
cells, section header/footer references) is re-implemented in the access
layer below; the document walk is then a faithful port:

- style → heading mapping incl. "Heading N" split and numbered-header
  counters (msword_backend.py:494-512, 1068-1134);
- numbering.xml numFmt → enumerated lists with per-(numId, ilvl) counters
  and indent-driven nested list groups (:389-497, 1190-1290);
- run grouping by formatting + hyperlink-as-Path quirk — the reference
  stores ``Path(address)``, which collapses ``https://`` to ``https:/`` in
  every golden (:547-610);
- tables: grid-expanded cells, vertical-merge master scan, 1×1 tables
  walked as body content, rich cells grouped + reparented (:1293-1430);
- headers/footers → furniture "page header"/"page footer" groups
  (:1577-1646); textbox content → "textbox" section groups (:751-816).

Out of scope (as in the reference when its optional tools are absent):
OMML equations, DrawingML→PDF rendering, image decoding (pictures become
placeholder items — identical markdown output).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from pathlib import Path
from typing import Iterator, Optional, Union

from .model import BODY, FURNITURE, Formatting, Item, SpanDoc, TableCellSpec

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
V = "{urn:schemas-microsoft-com:vml}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_VAL = W + "val"


def _qn(tag: str) -> str:
    return W + tag


# ======================================================================
# Access layer (python-docx role, stdlib only)
# ======================================================================
class DocxPackage:
    def __init__(self, blob: bytes):
        import xml.etree.ElementTree as ET

        self.zf = zipfile.ZipFile(BytesIO(blob))
        self.ET = ET
        self.document = self._xml("word/document.xml")
        self.styles = self._load_styles()
        self.numbering = self._load_numbering()
        self.rels = self._load_rels("word/_rels/document.xml.rels")

    def _xml(self, name: str):
        try:
            return self.ET.fromstring(self.zf.read(name))
        except KeyError:
            return None

    def _load_rels(self, name: str) -> dict:
        rels = {}
        root = self._xml(name)
        if root is not None:
            for rel in root.findall(REL + "Relationship"):
                rels[rel.get("Id")] = {
                    "type": rel.get("Type", ""),
                    "target": rel.get("Target", ""),
                    "mode": rel.get("TargetMode", "Internal"),
                }
        return rels

    def _load_styles(self) -> dict:
        styles: dict[str, dict] = {}
        root = self._xml("word/styles.xml")
        self.default_para_style: Optional[str] = None
        if root is None:
            return styles
        for st in root.findall(W + "style"):
            sid = st.get(W + "styleId")
            if not sid:
                continue
            name_el = st.find(W + "name")
            based_el = st.find(W + "basedOn")
            has_numpr = st.find(f"{W}pPr/{W}numPr") is not None
            styles[sid] = {
                "style_id": sid,
                "name": name_el.get(_VAL) if name_el is not None else sid,
                "based_on": based_el.get(_VAL) if based_el is not None else None,
                "type": st.get(W + "type"),
                "has_numpr": has_numpr,
            }
            if st.get(W + "type") == "paragraph" and st.get(W + "default") in (
                "1",
                "true",
            ):
                self.default_para_style = sid
        return styles

    def _load_numbering(self) -> dict:
        """numId → {ilvl → numFmt}."""
        out: dict[int, dict[int, str]] = {}
        root = self._xml("word/numbering.xml")
        if root is None:
            return out
        abstract: dict[str, dict[int, str]] = {}
        for an in root.findall(W + "abstractNum"):
            aid = an.get(W + "abstractNumId")
            levels = {}
            for lvl in an.findall(W + "lvl"):
                ilvl = int(lvl.get(W + "ilvl", "0"))
                fmt_el = lvl.find(W + "numFmt")
                levels[ilvl] = fmt_el.get(_VAL) if fmt_el is not None else "bullet"
            abstract[aid] = levels
        for num in root.findall(W + "num"):
            nid = num.get(W + "numId")
            aref = num.find(W + "abstractNumId")
            if nid is None or aref is None:
                continue
            out[int(nid)] = abstract.get(aref.get(_VAL), {})
        return out

    def part_xml(self, target: str):
        name = target if target.startswith("word/") else f"word/{target}"
        return self._xml(name)


_NUMBERED_FMTS = {
    "decimal",
    "lowerRoman",
    "upperRoman",
    "lowerLetter",
    "upperLetter",
    "decimalZero",
}


def _tri(el, tag: str) -> Optional[bool]:
    """OOXML on/off property: absent → None, val 0/false/none → False."""
    child = el.find(W + tag) if el is not None else None
    if child is None:
        return None
    val = child.get(_VAL)
    if val is None:
        return True
    return val not in ("0", "false", "none", "off")


class DocxRun:
    def __init__(self, el):
        self.el = el

    @property
    def text(self) -> str:
        parts = []
        for child in self.el:
            tag = child.tag
            if tag == W + "t":
                parts.append(child.text or "")
            elif tag == W + "tab":
                parts.append("\t")
            elif tag in (W + "br", W + "cr"):
                parts.append("\n")
        return "".join(parts)

    def formatting(self) -> Formatting:
        rpr = self.el.find(W + "rPr")
        bold = _tri(rpr, "b") or False
        italic = _tri(rpr, "i") or False
        strike = _tri(rpr, "strike") or False
        underline = False
        if rpr is not None:
            u = rpr.find(W + "u")
            if u is not None:
                underline = (u.get(_VAL) or "single") != "none"
        script = None
        if rpr is not None:
            va = rpr.find(W + "vertAlign")
            if va is not None:
                v = va.get(_VAL)
                if v == "subscript":
                    script = "sub"
                elif v == "superscript":
                    script = "super"
        return Formatting(
            bold=bold,
            italic=italic,
            underline=underline,
            strikethrough=strike,
            script=script,
        )


class DocxHyperlink:
    def __init__(self, el, pkg: DocxPackage):
        self.el = el
        self.pkg = pkg

    @property
    def runs(self) -> list[DocxRun]:
        return [DocxRun(r) for r in self.el.findall(W + "r")]

    @property
    def text(self) -> str:
        return "".join(r.text for r in self.runs)

    @property
    def address(self) -> str:
        rid = self.el.get(R + "id")
        if rid and rid in self.pkg.rels:
            addr = self.pkg.rels[rid]["target"]
        else:
            addr = ""
        anchor = self.el.get(W + "anchor")
        if anchor and not addr:
            addr = f"#{anchor}"
        return addr


class DocxParagraph:
    def __init__(self, el, pkg: DocxPackage):
        self.el = el
        self.pkg = pkg

    def iter_inner_content(self) -> Iterator[Union[DocxRun, DocxHyperlink]]:
        for child in self.el:
            if child.tag == W + "r":
                yield DocxRun(child)
            elif child.tag == W + "hyperlink":
                yield DocxHyperlink(child, self.pkg)

    @property
    def text(self) -> str:
        return "".join(c.text for c in self.iter_inner_content())

    def style(self) -> Optional[dict]:
        ppr = self.el.find(W + "pPr")
        sid = None
        if ppr is not None:
            ps = ppr.find(W + "pStyle")
            if ps is not None:
                sid = ps.get(_VAL)
        if sid and sid in self.pkg.styles:
            return self.pkg.styles[sid]
        if self.pkg.default_para_style:
            return self.pkg.styles.get(self.pkg.default_para_style)
        return None

    def num_props(self) -> tuple[Optional[int], Optional[int]]:
        numpr = self.el.find(f".//{W}numPr")
        if numpr is None:
            return None, None
        nid_el = numpr.find(W + "numId")
        ilvl_el = numpr.find(W + "ilvl")

        def _i(el):
            if el is None:
                return None
            try:
                return int(el.get(_VAL))
            except (TypeError, ValueError):
                return 0

        return _i(nid_el), _i(ilvl_el)


class DocxCell:
    """One logical (master) table cell."""

    def __init__(self, tc, pkg: DocxPackage):
        self.tc = tc
        self.pkg = pkg

    @property
    def grid_span(self) -> int:
        tcpr = self.tc.find(W + "tcPr")
        if tcpr is not None:
            gs = tcpr.find(W + "gridSpan")
            if gs is not None:
                try:
                    return int(gs.get(_VAL))
                except (TypeError, ValueError):
                    return 1
        return 1

    @property
    def text(self) -> str:
        return "\n".join(
            DocxParagraph(p, self.pkg).text
            for p in self.tc.findall(W + "p")
        )


class DocxTable:
    def __init__(self, el, pkg: DocxPackage):
        self.el = el
        self.pkg = pkg
        grid = el.find(W + "tblGrid")
        self.num_cols = (
            len(grid.findall(W + "gridCol")) if grid is not None else 0
        )
        # rows with grid-expanded, vMerge-resolved master cells
        self.rows: list[dict] = []
        prev: list = []
        for tr in el.findall(W + "tr"):
            trpr = tr.find(W + "trPr")
            grid_before = 0
            if trpr is not None:
                gb = trpr.find(W + "gridBefore")
                if gb is not None:
                    try:
                        grid_before = int(gb.get(_VAL))
                    except (TypeError, ValueError):
                        grid_before = 0
            cells: list = [None] * grid_before
            for tc in tr.findall(W + "tc"):
                tcpr = tc.find(W + "tcPr")
                span = 1
                vmerge_cont = False
                if tcpr is not None:
                    gs = tcpr.find(W + "gridSpan")
                    if gs is not None:
                        try:
                            span = int(gs.get(_VAL))
                        except (TypeError, ValueError):
                            span = 1
                    vm = tcpr.find(W + "vMerge")
                    if vm is not None and (vm.get(_VAL) or "continue") != "restart":
                        vmerge_cont = True
                col = len(cells)
                master = tc
                if vmerge_cont and col < len(prev) and prev[col] is not None:
                    master = prev[col]
                cells.extend([master] * span)
            self.rows.append({"cells": cells, "grid_before": grid_before})
            prev = cells
        if self.num_cols == 0 and self.rows:
            self.num_cols = max(len(r["cells"]) for r in self.rows)


# ======================================================================
# The walk (MsWordDocumentBackend port)
# ======================================================================
_TEXT_STYLE_IDS = [
    "Paragraph",
    "Normal",
    "Subtitle",
    "Author",
    "DefaultText",
    "ListParagraph",
    "ListBullet",
    "Quote",
]


class DocxExtractor:
    def __init__(self) -> None:
        self.max_levels = 10
        self.parents: dict[int, Optional[int]] = {
            i: None for i in range(-1, 10)
        }
        self.level = 0
        self.list_anchor_level: Optional[int] = None
        self.heading_counters: dict[int, int] = {}
        self.list_counters: dict[tuple[int, int], int] = {}
        self.content_layer = BODY
        self.history: dict[str, list] = {
            "names": [None],
            "levels": [None],
            "numids": [None],
            "indents": [None],
        }
        self.processed_textboxes: set[int] = set()

    # -- history helpers (msword_backend.py:178-203) ------------------
    def _remember_paragraph(self, name, level, numid, ilevel):
        self.history["names"].append(name)
        self.history["levels"].append(level)
        self.history["numids"].append(numid)
        self.history["indents"].append(ilevel)

    def _last_seen_numid(self):
        return self.history["numids"][-1]

    def _last_seen_indent(self):
        return self.history["indents"][-1]

    def _effective_level(self) -> int:
        for k in sorted(self.parents):
            if k >= 0 and self.parents[k] is None:
                return k
        return 0

    # -- style → label/level (msword_backend.py:352-540) --------------
    @staticmethod
    def _partition_style_suffix(s: str) -> list[str]:
        m = re.match(r"(\D+)(\d+)$|^(\d+)(\D+)", s)
        if m:
            return list(filter(None, m.groups()))
        return [s]

    @staticmethod
    def _int_or_default(s, default=0):
        if s is None:
            return None
        try:
            return int(s)
        except ValueError:
            return default

    def _heading_style_level(self, label: str) -> tuple[str, Optional[int]]:
        parts = self._partition_style_suffix(label)
        if len(parts) == 2:
            parts.sort()
            style_word, label_level = "", 0
            if parts[0].strip().lower() == "heading":
                style_word = "Heading"
                label_level = self._int_or_default(parts[1], None)
            if parts[1].strip().lower() == "heading":
                style_word = "Heading"
                label_level = self._int_or_default(parts[0], None)
            return style_word, label_level
        return label, None

    def _style_label_level(self, para: DocxParagraph) -> tuple[str, Optional[int]]:
        st = para.style()
        if st is None:
            return "Normal", None
        label = st["style_id"]
        name = st["name"] or ""
        base = para.pkg.styles.get(st["based_on"] or "", None)
        if label is None:
            return "Normal", None
        if ":" in label:
            parts = label.split(":")
            if len(parts) == 2:
                return parts[0], self._int_or_default(parts[1], None)
        if "heading" in label.lower():
            return self._heading_style_level(label)
        if "heading" in name.lower():
            return self._heading_style_level(name)
        if base:
            if "heading" in (base["style_id"] or "").lower():
                return self._heading_style_level(base["style_id"])
            if "heading" in (base["name"] or "").lower():
                return self._heading_style_level(base["name"])
        return label, None

    # -- numbering --------------------------------------------------------
    def _numfmt_is_ordered(self, pkg: DocxPackage, numid: int, ilvl: int) -> bool:
        fmts = pkg.numbering.get(numid)
        if not fmts:
            return False
        fmt = fmts.get(ilvl)
        return fmt in _NUMBERED_FMTS

    def _list_counter_for(self, numid: int, ilvl: int) -> int:
        key = (numid, ilvl)
        self.list_counters[key] = self.list_counters.get(key, 0) + 1
        return self.list_counters[key]

    def _reset_list_counters(self, numid: int) -> None:
        for key in list(self.list_counters):
            if key[0] == numid:
                self.list_counters[key] = 0

    # -- run grouping (msword_backend.py:556-610) ----------------------
    def _collect_runs(self, para: DocxParagraph):
        if para.text.strip() == "":
            return [("", None, None)]
        elements: list[tuple] = []
        joined_cell_text = ""
        previous_format = None
        fmt = None
        for c in para.iter_inner_content():
            if isinstance(c, DocxHyperlink):
                text = c.text
                hyperlink = str(Path(c.address)) if c.address else None
                runs = c.runs
                fmt = runs[0].formatting() if runs else None
            elif isinstance(c, DocxRun):
                text = c.text
                hyperlink = None
                fmt = c.formatting()
            else:
                continue
            if (len(text.strip()) and fmt != previous_format) or (
                hyperlink is not None
            ):
                if len(joined_cell_text.strip()) > 0:
                    elements.append((joined_cell_text.strip(), previous_format, None))
                joined_cell_text = ""
                if hyperlink is not None:
                    elements.append((text.strip(), fmt, hyperlink))
                    text = ""
                else:
                    previous_format = fmt
            joined_cell_text += text
        if len(joined_cell_text.strip()) > 0:
            elements.append((joined_cell_text.strip(), fmt, None))
        return elements

    # -- linear walk (msword_backend.py:209-350) -----------------------
    def _walk_body_xml(self, body, doc: SpanDoc, pkg: DocxPackage) -> list[int]:
        added: list[int] = []
        for element in body:
            tag = element.tag.split("}")[-1]
            blip_nodes = element.findall(f".//{A}blip")
            drawingml = element.findall(f".//{W}drawing")

            was_textbox = False
            if id(element) not in self.processed_textboxes:
                textboxes = element.findall(f".//{W}txbxContent")
                if not textboxes:
                    textboxes = [
                        p
                        for tb in element.findall(f".//{V}textbox")
                        for p in tb.findall(f".//{W}p")
                    ]
                if textboxes:
                    was_textbox = True
                    self.processed_textboxes.add(id(element))
                    for tb in textboxes:
                        self.processed_textboxes.add(id(tb))
                    added.extend(self._handle_textboxes(textboxes, doc, pkg))

            if tag == "tbl":
                try:
                    added.extend(self._emit_table(element, doc, pkg))
                except Exception:  # noqa: BLE001 — broken table tolerated
                    pass
            elif blip_nodes:
                added.extend(self._emit_picture(doc))
                if tag == "p" and element.find(f".//{W}t") is not None:
                    added.extend(self._emit_paragraph(element, doc, pkg))
            elif drawingml:
                # the reference renders DrawingML to an image via a DOCX→PDF
                # converter (msword_backend.py:1560-1575); no renderer exists
                # here, so emit the placeholder picture its no-image fallback
                # produces (one per element — drawingml.docx golden).
                # NOTE: textbox.docx's golden predates this reference feature
                # and is marked flaky/xfail upstream (test_backend_msword.py:
                # 108-121); we mirror that xfail.
                added.extend(self._emit_picture(doc))
            elif tag == "sdt":
                sdt_body = element.find(f".//{W}sdtContent")
                if sdt_body is not None:
                    for p in sdt_body.findall(f".//{W}p"):
                        added.extend(self._emit_paragraph(p, doc, pkg))
            elif tag == "p":
                added.extend(self._emit_paragraph(element, doc, pkg))
        return added

    # -- textboxes ----------------------------------------------------
    def _handle_textboxes(self, textboxes, doc: SpanDoc, pkg) -> list[int]:
        refs: list[int] = []
        level = self._effective_level()
        grp = doc.add_group(
            label="section",
            name="textbox",
            parent=self.parents[level - 1],
            content_layer=self.content_layer,
        )
        refs.append(grp.idx)
        original = self.parents[level]
        self.parents[level] = grp.idx
        seen: set = set()
        for tb in textboxes:
            paras = (
                tb.findall(f".//{W}p") if tb.tag == W + "txbxContent" else [tb]
            )
            for k, p in enumerate(paras):
                key = (DocxParagraph(p, pkg).text, k)
                if key in seen:
                    continue
                seen.add(key)
                refs.extend(self._emit_paragraph(p, doc, pkg))
        self.parents[level] = original
        return refs

    # -- equations (msword_backend.py:818-880) --------------------------
    _EQ_OPEN, _EQ_CLOSE = "<eq>", "</eq>"
    _MATH_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

    def _splice_inline_equations(self, element, text: str):
        from .docxx_math import omath_to_latex

        bare_texts: list[str] = []
        bare_equations: list[str] = []
        texts_and_equations: list[str] = []
        for subt in element.iter():
            tag = subt.tag.split("}")[-1]
            if tag == "t" and "math" not in subt.tag:
                if isinstance(subt.text, str):
                    bare_texts.append(subt.text)
                    texts_and_equations.append(subt.text)
            elif "oMath" in subt.tag and "oMathPara" not in subt.tag:
                latex = omath_to_latex(subt).strip()
                if latex:
                    eq = f"{self._EQ_OPEN}{latex}{self._EQ_CLOSE}"
                    bare_equations.append(eq)
                    texts_and_equations.append(eq)
        if len(bare_equations) < 1:
            return text, []
        if (
            re.sub(r"\s+", "", "".join(bare_texts)).strip()
            != re.sub(r"\s+", "", text).strip()
        ):
            # cannot reconstruct the raw text — skip equation parsing
            return text, []
        # insert equations into the original text, preserving whitespace
        merged_text = text[:]
        scan_pos = 0
        for style_digit_pos, frag in enumerate(texts_and_equations):
            if len(frag) == 0:
                continue
            if frag in merged_text[scan_pos:]:
                scan_pos += merged_text[scan_pos:].find(frag) + len(frag)
            else:
                if style_digit_pos > 0:
                    merged_text = (
                        merged_text[:scan_pos] + frag + merged_text[scan_pos:]
                    )
                    scan_pos += len(frag)
                else:
                    merged_text = frag + merged_text
        return merged_text, bare_equations

    # -- paragraphs (msword_backend.py:881-1066) -----------------------
    def _emit_paragraph(self, element, doc: SpanDoc, pkg) -> list[int]:
        refs: list[int] = []
        para = DocxParagraph(element, pkg)
        paragraph_elements = self._collect_runs(para)
        text, equations = self._splice_inline_equations(element, para.text)
        text = text.strip()

        style_token, p_level = self._style_label_level(para)
        numid, ilevel = para.num_props()
        if numid == 0:
            numid = None

        if (
            numid is not None
            and ilevel is not None
            and style_token not in ["Title", "Heading"]
        ):
            is_numbered = self._numfmt_is_ordered(pkg, numid, ilevel)
            refs.extend(
                self._emit_list_item_node(
                    doc, numid, ilevel, paragraph_elements, is_numbered
                )
            )
            self._remember_paragraph(style_token, p_level, numid, ilevel)
            return refs
        elif (
            numid is None
            and self._last_seen_numid() is not None
            and style_token not in ["Title", "Heading"]
        ):  # close list
            if self.list_anchor_level:
                for key in range(len(self.parents)):
                    if key >= self.list_anchor_level:
                        self.parents[key] = None
                self.level = self.list_anchor_level - 1
                self.list_anchor_level = None
            else:
                for key in range(len(self.parents)):
                    self.parents[key] = None
                self.level = 0

        if style_token in ["Title"]:
            for key in range(len(self.parents)):
                self.parents[key] = None
            te = doc.add_title(
                text, parent=None, content_layer=self.content_layer
            )
            self.parents[0] = te.idx
            refs.append(te.idx)
        elif "Heading" in style_token:
            st = para.style()
            style_is_ordered = bool(st and st.get("has_numpr")) or (
                element.find(f".//{W}numPr") is not None
            )
            refs.extend(self._emit_heading(doc, p_level, text, style_is_ordered))
        elif len(equations) > 0:
            if (para.text is None or len(para.text.strip()) == 0) and len(
                text
            ) > 0:
                # standalone equation
                level = self._effective_level()
                t1 = doc.add_text(
                    "formula",
                    text.replace(self._EQ_OPEN, "").replace(self._EQ_CLOSE, ""),
                    parent=self.parents[level - 1],
                    content_layer=self.content_layer,
                )
                refs.append(t1.idx)
            else:
                # inline equation: split text around each equation
                level = self._effective_level()
                grp = doc.add_group(
                    label="inline",
                    parent=self.parents[level - 1],
                    content_layer=self.content_layer,
                )
                refs.append(grp.idx)
                pending_text = text
                for eq in equations:
                    if len(pending_text) == 0:
                        break
                    split_text = pending_text.split(eq.strip(), maxsplit=1)
                    pre_eq = split_text[0]
                    pending_text = "" if len(split_text) == 1 else split_text[1]
                    if len(pre_eq) > 0:
                        e1 = doc.add_text(
                            "text",
                            pre_eq,
                            parent=grp.idx,
                            content_layer=self.content_layer,
                        )
                        refs.append(e1.idx)
                    e2 = doc.add_text(
                        "formula",
                        eq.replace(self._EQ_OPEN, "").replace(
                            self._EQ_CLOSE, ""
                        ),
                        parent=grp.idx,
                        content_layer=self.content_layer,
                    )
                    refs.append(e2.idx)
                if len(pending_text) > 0:
                    e3 = doc.add_text(
                        "text",
                        pending_text.strip(),
                        parent=grp.idx,
                        content_layer=self.content_layer,
                    )
                    refs.append(e3.idx)
        elif style_token in _TEXT_STYLE_IDS:
            level = self._effective_level()
            parent = self._ensure_list_parent(
                doc, self.parents.get(level - 1), paragraph_elements
            )
            for t, fmt, link in paragraph_elements:
                t2 = doc.add_text(
                    "text",
                    t,
                    parent=parent,
                    formatting=fmt,
                    hyperlink=link,
                    content_layer=self.content_layer,
                )
                refs.append(t2.idx)
        else:
            level = self._effective_level()
            parent = self._ensure_list_parent(
                doc, self.parents.get(level - 1), paragraph_elements
            )
            for t, fmt, link in paragraph_elements:
                t3 = doc.add_text(
                    "text",
                    t,
                    parent=parent,
                    formatting=fmt,
                    hyperlink=link,
                    content_layer=self.content_layer,
                )
                refs.append(t3.idx)

        self._remember_paragraph(style_token, p_level, numid, ilevel)
        return refs

    def _ensure_list_parent(self, doc, carry_parent, paragraph_elements):
        if len(paragraph_elements) > 1:
            return doc.add_group(
                label="inline",
                parent=carry_parent,
                content_layer=self.content_layer,
            ).idx
        return carry_parent

    # -- headings (msword_backend.py:1068-1134) ------------------------
    def _emit_heading(self, doc, active_level, text, style_is_ordered) -> list[int]:
        refs: list[int] = []
        level = self._effective_level()
        if isinstance(active_level, int):
            if active_level > level:
                for i in range(level, active_level):
                    gr = doc.add_group(
                        label="section",
                        name=f"header-{i}",
                        parent=self.parents[i - 1],
                    )
                    refs.append(gr.idx)
                    self.parents[i] = gr.idx
            elif active_level < level:
                for key in range(len(self.parents)):
                    if key >= active_level:
                        self.parents[key] = None
            level_now = active_level
            parent_level = active_level - 1
            bump_level = active_level
        else:
            level_now = self.level
            parent_level = self.level - 1
            bump_level = 1

        if style_is_ordered:
            if bump_level in self.heading_counters:
                self.heading_counters[bump_level] += 1
            else:
                self.heading_counters[bump_level] = 1
            text = f"{self.heading_counters[bump_level]} {text}"
            next_level = bump_level + 1
            while next_level in self.heading_counters:
                self.heading_counters[next_level] = 0
                next_level += 1
            upper_level = bump_level - 1
            while upper_level in self.heading_counters:
                if self.heading_counters[upper_level] == 0:
                    self.heading_counters[upper_level] += 1
                text = f"{self.heading_counters[upper_level]}.{text}"
                upper_level -= 1

        hd = doc.add_heading(
            text,
            bump_level,
            parent=self.parents[parent_level],
            content_layer=self.content_layer,
        )
        self.parents[level_now] = hd.idx
        refs.append(hd.idx)
        return refs

    # -- lists (msword_backend.py:1136-1290) ---------------------------
    def _emit_list_entry(
        self, doc, elements, marker, enumerated, level
    ) -> None:
        parent_idx = self.parents.get(level)
        if parent_idx is None or not (
            doc.items[parent_idx].kind == "group"
            and doc.items[parent_idx].label == "list"
        ):
            return
        if not elements:
            return
        if len(elements) == 1:
            text, fmt, link = elements[0]
            if text:
                doc.add_list_item(
                    text,
                    enumerated,
                    marker=marker,
                    parent=parent_idx,
                    formatting=fmt,
                    hyperlink=link,
                    content_layer=self.content_layer,
                )
        else:
            item = doc.add_list_item(
                "",
                enumerated,
                marker=marker,
                parent=parent_idx,
                content_layer=self.content_layer,
            )
            grp = doc.add_group(
                label="inline", parent=item.idx, content_layer=self.content_layer
            )
            for text, fmt, link in elements:
                if text:
                    doc.add_text(
                        "text",
                        text,
                        parent=grp.idx,
                        formatting=fmt,
                        hyperlink=link,
                        content_layer=self.content_layer,
                    )

    def _emit_list_item_node(
        self, doc, numid, ilevel, elements, is_numbered
    ) -> list[int]:
        refs: list[int] = []
        if not elements:
            return refs
        level = self._effective_level()
        last_indent = self._last_seen_indent()
        if self._last_seen_numid() is None or (
            self._last_seen_numid() == numid and self.list_anchor_level is None
        ):  # open new list
            self.list_anchor_level = level
            self._reset_list_counters(numid)
            gr = doc.add_list_group(
                name="list",
                parent=self.parents[level - 1],
                content_layer=self.content_layer,
            )
            self.parents[level] = gr.idx
            refs.append(gr.idx)
            marker = (
                f"{self._list_counter_for(numid, ilevel)}." if is_numbered else ""
            )
            self._emit_list_entry(doc, elements, marker, is_numbered, level)
        elif (
            self._last_seen_numid() == numid
            and self.list_anchor_level is not None
            and last_indent is not None
            and last_indent < ilevel
        ):  # open indented list
            for i in range(
                self.list_anchor_level + last_indent + 1,
                self.list_anchor_level + ilevel + 1,
            ):
                gr1 = doc.add_list_group(
                    name="list",
                    parent=self.parents[i - 1],
                    content_layer=self.content_layer,
                )
                self.parents[i] = gr1.idx
                refs.append(gr1.idx)
            marker = (
                f"{self._list_counter_for(numid, ilevel)}." if is_numbered else ""
            )
            self._emit_list_entry(
                doc, elements, marker, is_numbered, self.list_anchor_level + ilevel
            )
        elif (
            self._last_seen_numid() == numid
            and self.list_anchor_level is not None
            and last_indent is not None
            and ilevel < last_indent
        ):  # close nested list
            for k in self.parents:
                if k > self.list_anchor_level + ilevel:
                    self.parents[k] = None
            marker = (
                f"{self._list_counter_for(numid, ilevel)}." if is_numbered else ""
            )
            self._emit_list_entry(
                doc, elements, marker, is_numbered, self.list_anchor_level + ilevel
            )
        elif self._last_seen_numid() == numid or last_indent == ilevel:
            marker = (
                f"{self._list_counter_for(numid, ilevel)}." if is_numbered else ""
            )
            self._emit_list_entry(doc, elements, marker, is_numbered, level - 1)
        return refs

    # -- pictures ------------------------------------------------------
    def _emit_picture(self, doc: SpanDoc) -> list[int]:
        level = self._effective_level()
        pic = doc.add_picture(
            parent=self.parents[level - 1], content_layer=self.content_layer
        )
        return [pic.idx]

    # -- rich-cell helpers (msword_backend.py:1293-1430) ---------------
    @staticmethod
    def _contains_blip(element) -> bool:
        for item in element:
            if item.findall(f".//{A}blip") or item.findall(f".//{W}drawing"):
                return True
        return False

    def _cell_needs_group(self, cell: DocxCell) -> bool:
        tc = cell.tc
        paragraphs = [c for c in tc if c.tag == W + "p"]
        if len(paragraphs) > 1:
            return True
        for child in tc:
            if child.tag.split("}")[-1] not in ("p", "tcPr"):
                return True
        if self._contains_blip(tc):
            return True
        default = Formatting()
        for p in paragraphs:
            for r in p.findall(W + "r"):
                if DocxRun(r).formatting() != default:
                    return True
        return False

    def _wrap_cell_elements(
        self, group_name: str, doc: SpanDoc, provs: list[int], table_item: Item
    ) -> int:
        grp = doc.add_group(
            label="unspecified",
            name=group_name,
            parent=table_item.idx,
            content_layer=self.content_layer,
        )
        for idx in provs:
            doc.reparent(idx, grp.idx)
        return grp.idx

    def _emit_table(self, element, doc: SpanDoc, pkg) -> list[int]:
        refs: list[int] = []
        table = DocxTable(element, pkg)
        num_rows = len(table.rows)
        num_cols = table.num_cols

        if num_rows == 1 and num_cols == 1:
            # 1×1 table: treat content as document body (reference rule)
            self._walk_body_xml(table.rows[0]["cells"][0], doc, pkg)
            return refs

        level = self._effective_level()
        tbl_item = doc.add_table(
            num_rows=num_rows,
            num_cols=num_cols,
            parent=self.parents[level - 1],
            content_layer=self.content_layer,
        )
        refs.append(tbl_item.idx)

        seen_cells: set[int] = set()
        for r_i, row in enumerate(table.rows):
            cells = row["cells"]
            grid_before = row["grid_before"]
            c_i = 0
            while c_i < num_cols:
                if c_i >= len(cells) or cells[c_i] is None:
                    break
                tc = cells[c_i]
                cell = DocxCell(tc, pkg)
                if id(tc) in seen_cells:
                    c_i += cell.grid_span
                    continue
                seen_cells.add(id(tc))
                spanned_idx = r_i
                while True:
                    spanned_idx += 1
                    if spanned_idx >= num_rows:
                        break
                    nxt = table.rows[spanned_idx]["cells"]
                    if c_i >= len(nxt) or nxt[c_i] is not tc:
                        break
                text, cell_eqs = self._splice_inline_equations(tc, cell.text)
                if len(cell_eqs) == 0:
                    text = cell.text
                else:
                    text = text.replace(self._EQ_OPEN, "$").replace(
                        self._EQ_CLOSE, "$"
                    )
                provs: list[int] = []
                rich = self._cell_needs_group(cell)
                if rich:
                    provs = self._walk_body_xml(tc, doc, pkg)
                rich_ref = -1
                if provs:
                    rich = True
                    group_name = (
                        f"rich_cell_group_{doc.table_count}_{c_i}_"
                        f"{grid_before + r_i}"
                    )
                    rich_ref = self._wrap_cell_elements(
                        group_name, doc, provs, tbl_item
                    )
                tbl_item.cells.append(
                    TableCellSpec(
                        text=text,
                        row_span=spanned_idx - r_i,
                        col_span=cell.grid_span,
                        start_row=grid_before + r_i,
                        end_row=grid_before + spanned_idx,
                        start_col=c_i,
                        end_col=c_i + cell.grid_span,
                        column_header=grid_before + r_i == 0,
                        row_header=False,
                        rich_ref=rich_ref,
                    )
                )
                c_i += cell.grid_span
        return refs

    # -- headers / footers (msword_backend.py:1577-1646) ---------------
    def _route_header_footer(self, pkg: DocxPackage, doc: SpanDoc) -> None:
        body = pkg.document.find(W + "body")
        if body is None:
            return
        sectprs = [p for p in body.iter(W + "sectPr")]
        layer_now = self.content_layer
        list_root_parent = self.parents[0]
        self.content_layer = FURNITURE
        # header/footer references inherit from earlier sections when a
        # section declares none (python-docx is_linked_to_previous chain)
        inherited: dict[tuple[str, str], Optional[str]] = {}
        for sec_idx, sectpr in enumerate(sectprs):
            for kind, tag in (
                ("header", "headerReference"),
                ("footer", "footerReference"),
            ):
                for ref in sectpr.findall(W + tag):
                    rid = ref.get(R + "id")
                    rtype = ref.get(W + "type") or "default"
                    if rid in pkg.rels:
                        inherited[(kind, rtype)] = pkg.rels[rid]["target"]
            title_pg = sectpr.find(W + "titlePg") is not None
            if sec_idx > 0 and not title_pg:
                continue
            for kind in ("header", "footer"):
                want_type = "first" if title_pg else "default"
                target = inherited.get((kind, want_type))
                if target is None:
                    continue
                part = pkg.part_xml(target)
                if part is None:
                    continue
                # DIRECT children only (python-docx .paragraphs/.tables
                # semantics): a page-number field inside an sdt does NOT
                # make the footer non-empty (word_sample golden)
                texts = [
                    t
                    for t in (
                        DocxParagraph(p, pkg).text.strip()
                        for p in part.findall(W + "p")
                    )
                    if t
                ]
                tables = part.findall(W + "tbl")
                if texts or tables or self._contains_blip(part):
                    self.parents[0] = doc.add_group(
                        label="section",
                        name=f"page {kind}",
                        content_layer=self.content_layer,
                    ).idx
                    self._walk_body_xml(part, doc, pkg)
        self.content_layer = layer_now
        self.parents[0] = list_root_parent

    # -- entry ---------------------------------------------------------
    def convert(self, blob: bytes, name: str = "file") -> SpanDoc:
        pkg = DocxPackage(blob)
        doc = SpanDoc(name)
        body = pkg.document.find(W + "body")
        if body is not None:
            self._walk_body_xml(body, doc, pkg)
        self._route_header_footer(pkg, doc)
        return doc


def extract_docx(blob: bytes, name: str = "file") -> SpanDoc:
    return DocxExtractor().convert(blob, name=name)

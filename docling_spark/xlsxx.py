"""XLSX backend: Office Open XML spreadsheet → SpanDoc.

Re-derives the observable behavior of the reference MsExcelDocumentBackend
(/root/reference/docling/backend/msexcel_backend.py:101-648) without its
openpyxl / PIL dependencies — an xlsx is a zip of XML parts (ECMA-376
SpreadsheetML), parsed with stdlib ``zipfile`` + ElementTree:

- one "sheet: {name}" section group per sheet, hidden sheets →
  content layer "invisible" (:252-262, 640-648);
- data-island detection: the true data bounds scan, then the compact-table
  region grower (start at a non-empty unvisited cell, extend down the
  first column / right along the first row until an empty unmerged cell)
  with merged-range row/col spans (:357-575);
- first table row → column_header cells (:297-300);
- value rendering matches openpyxl(data_only=True) + str(): shared/inline
  strings keep exact whitespace, booleans → "True"/"False", numbers →
  int/float repr, date-formatted serials → datetime repr (styles.xml
  numFmt date detection);
- pictures per sheet drawing → placeholder picture items (env has no PIL;
  identical markdown/itxt output).
"""

from __future__ import annotations

import re
import zipfile
from datetime import datetime, timedelta
from io import BytesIO
from typing import Optional

from .model import SpanDoc, TableCellSpec

S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
XDR = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"

# built-in numFmt ids that are date/time formats (ECMA-376 §18.8.30)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))

_INT_RE = re.compile(r"^[+-]?\d+$")


def _is_date_code(fmt: str) -> bool:
    """openpyxl-style date format detection: y/m/d/h/s codes outside
    quoted sections and color/condition brackets."""
    fmt = re.sub(r'"[^"]*"', "", fmt)
    fmt = re.sub(r"\[[^\]]*\]", "", fmt)
    return bool(re.search(r"[dmhysDMHYS]", fmt))


def _col_to_idx(ref: str) -> tuple[int, int]:
    """'BC12' → (row=12, col=55) (1-based)."""
    m = re.match(r"([A-Z]+)(\d+)", ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - 64)
    return int(m.group(2)), col


class _Sheet:
    def __init__(self, name: str, state: str, kind: str):
        self.name = name
        self.state = state  # visible | hidden | veryHidden
        self.kind = kind  # worksheet | chartsheet
        self.cells: dict[tuple[int, int], object] = {}  # 1-based (row, col)
        self.merged: list[tuple[int, int, int, int]] = []
        # (l, t, r, b) anchor per picture in cell units (0,0,0,0 when the
        # anchor is not a two-cell anchor — reference behavior)
        self.picture_anchors: list[tuple[int, int, int, int]] = []

    def value(self, row: int, col: int):
        return self.cells.get((row, col))

    def in_merged(self, row: int, col: int):
        for mr in self.merged:
            if mr[0] <= row <= mr[2] and mr[1] <= col <= mr[3]:
                return mr
        return None


class XlsxWorkbook:
    def __init__(self, blob: bytes):
        import xml.etree.ElementTree as ET

        self.ET = ET
        self.zf = zipfile.ZipFile(BytesIO(blob))
        self.shared: list[str] = self._load_shared_strings()
        self.date_styles: set[int] = self._load_date_styles()
        self.date1904 = False
        self.sheets: list[_Sheet] = []
        self._load_sheets()

    def _xml(self, name: str):
        try:
            return self.ET.fromstring(self.zf.read(name))
        except KeyError:
            return None

    def _load_shared_strings(self) -> list[str]:
        out: list[str] = []
        root = self._xml("xl/sharedStrings.xml")
        if root is None:
            return out
        for si in root.findall(S + "si"):
            # plain <t> or rich-text <r><t> runs — concatenate, keep spaces
            parts = [t.text or "" for t in si.iter(S + "t")]
            out.append("".join(parts))
        return out

    def _load_date_styles(self) -> set[int]:
        """Indices into cellXfs whose number format is a date format."""
        root = self._xml("xl/styles.xml")
        if root is None:
            return set()
        custom: dict[int, str] = {}
        numfmts = root.find(S + "numFmts")
        if numfmts is not None:
            for nf in numfmts.findall(S + "numFmt"):
                try:
                    custom[int(nf.get("numFmtId"))] = nf.get("formatCode", "")
                except (TypeError, ValueError):
                    continue
        date_styles: set[int] = set()
        cellxfs = root.find(S + "cellXfs")
        if cellxfs is not None:
            for i, xf in enumerate(cellxfs.findall(S + "xf")):
                try:
                    fmt_id = int(xf.get("numFmtId", "0"))
                except ValueError:
                    continue
                if fmt_id in _BUILTIN_DATE_FMTS or (
                    fmt_id in custom and _is_date_code(custom[fmt_id])
                ):
                    date_styles.add(i)
        return date_styles

    def _serial_to_datetime(self, serial: float) -> datetime:
        epoch = datetime(1904, 1, 1) if self.date1904 else datetime(1899, 12, 30)
        return epoch + timedelta(days=serial)

    def _cell_value(self, c_el) -> Optional[object]:
        ctype = c_el.get("t", "n")
        v_el = c_el.find(S + "v")
        if ctype == "inlineStr":
            is_el = c_el.find(S + "is")
            if is_el is None:
                return None
            return "".join(t.text or "" for t in is_el.iter(S + "t"))
        if v_el is None or v_el.text is None:
            return None
        v = v_el.text
        if ctype == "s":
            try:
                return self.shared[int(v)]
            except (ValueError, IndexError):
                return v
        if ctype == "str":
            return v
        if ctype == "b":
            return v not in ("0", "false")
        if ctype == "e":
            return v
        # numeric — date-styled serials become datetimes (openpyxl parity)
        try:
            style = int(c_el.get("s", "-1"))
        except ValueError:
            style = -1
        if style in self.date_styles:
            try:
                return self._serial_to_datetime(float(v))
            except (ValueError, OverflowError):
                return v
        if _INT_RE.match(v):
            return int(v)
        try:
            return float(v)
        except ValueError:
            return v

    def _load_sheets(self) -> None:
        wb = self._xml("xl/workbook.xml")
        if wb is None:
            return
        pr = wb.find(S + "workbookPr")
        if pr is not None and pr.get("date1904") in ("1", "true"):
            self.date1904 = True
        rels = {}
        rels_root = self._xml("xl/_rels/workbook.xml.rels")
        if rels_root is not None:
            for rel in rels_root.findall(REL + "Relationship"):
                rels[rel.get("Id")] = rel.get("Target", "")
        sheets_el = wb.find(S + "sheets")
        if sheets_el is None:
            return
        for sh in sheets_el.findall(S + "sheet"):
            name = sh.get("name", "Sheet")
            state = sh.get("state", "visible")
            target = rels.get(sh.get(R + "id"), "")
            target = target[3:] if target.startswith("../") else target
            if not target.startswith("xl/"):
                target = f"xl/{target}"
            kind = "chartsheet" if "chartsheet" in target else "worksheet"
            sheet = _Sheet(name, state, kind)
            root = self._xml(target)
            if root is not None and kind == "worksheet":
                for row_el in root.iter(S + "row"):
                    for c_el in row_el.findall(S + "c"):
                        ref = c_el.get("r")
                        if not ref:
                            continue
                        val = self._cell_value(c_el)
                        if val is not None:
                            r, c = _col_to_idx(ref)
                            sheet.cells[(r, c)] = val
                mc = root.find(S + "mergeCells")
                if mc is not None:
                    for m in mc.findall(S + "mergeCell"):
                        ref = m.get("ref", "")
                        if ":" in ref:
                            a, b = ref.split(":")
                            r1, c1 = _col_to_idx(a)
                            r2, c2 = _col_to_idx(b)
                            sheet.merged.append((r1, c1, r2, c2))
                # pictures: drawing part → count of xdr:pic anchors
                d_el = root.find(S + "drawing")
                if d_el is not None:
                    srels = self._xml(
                        "xl/worksheets/_rels/"
                        + target.rsplit("/", 1)[-1]
                        + ".rels"
                    )
                    if srels is not None:
                        for rel in srels.findall(REL + "Relationship"):
                            if rel.get("Id") == d_el.get(R + "id"):
                                dt = rel.get("Target", "").replace("../", "xl/")
                                droot = self._xml(dt)
                                if droot is not None:
                                    self._load_anchors(droot, sheet)
            self.sheets.append(sheet)

    def _load_anchors(self, droot, sheet: _Sheet) -> None:
        for anchor in droot:
            pics = list(anchor.iter(XDR + "pic"))
            if not pics:
                continue
            box = (0, 0, 0, 0)
            if anchor.tag == XDR + "twoCellAnchor":
                f_el = anchor.find(XDR + "from")
                t_el = anchor.find(XDR + "to")
                if f_el is not None and t_el is not None:
                    def _i(el, tag):
                        v = el.findtext(XDR + tag)
                        return int(v) if v and v.isdigit() else 0
                    box = (
                        _i(f_el, "col"),
                        _i(f_el, "row"),
                        _i(t_el, "col") + 1,
                        _i(t_el, "row") + 1,
                    )
            for _ in pics:
                sheet.picture_anchors.append(box)


# ======================================================================
# Data-island detection (msexcel_backend.py:326-575 port, 0-based like it)
# ======================================================================
def _find_true_bounds(sheet: _Sheet) -> tuple[int, int, int, int]:
    min_row = min_col = None
    max_row = max_col = 0
    for (r, c) in sheet.cells:
        min_row = r if min_row is None else min(min_row, r)
        min_col = c if min_col is None else min(min_col, c)
        max_row = max(max_row, r)
        max_col = max(max_col, c)
    for mr in sheet.merged:
        min_row = mr[0] if min_row is None else min(min_row, mr[0])
        min_col = mr[1] if min_col is None else min(min_col, mr[1])
        max_row = max(max_row, mr[2])
        max_col = max(max_col, mr[3])
    if min_row is None or min_col is None:
        min_row = min_col = max_row = max_col = 1
    return min_row, max_row, min_col, max_col


def _find_table_bottom(sheet, start_row, start_col, max_row) -> int:
    table_max_row = start_row
    for ri in range(start_row + 1, max_row):
        r1, c1 = ri + 1, start_col + 1
        mr = sheet.in_merged(r1, c1)
        if sheet.value(r1, c1) is None and not mr:
            break
        if mr:
            table_max_row = max(table_max_row, mr[2] - 1)
        else:
            table_max_row = ri
    return table_max_row


def _find_table_right(sheet, start_row, start_col, max_col) -> int:
    table_max_col = start_col
    for rj in range(start_col + 1, max_col):
        r1, c1 = start_row + 1, rj + 1
        mr = sheet.in_merged(r1, c1)
        if sheet.value(r1, c1) is None and not mr:
            break
        if mr:
            table_max_col = max(table_max_col, mr[3] - 1)
        else:
            table_max_col = rj
    return table_max_col


def _find_table_bounds(sheet, start_row, start_col, max_row, max_col):
    table_max_row = _find_table_bottom(sheet, start_row, start_col, max_row)
    table_max_col = _find_table_right(sheet, start_row, start_col, max_col)
    data = []
    visited: set[tuple[int, int]] = set()
    for ri in range(start_row, table_max_row + 1):
        for rj in range(start_col, table_max_col + 1):
            row_span = col_span = 1
            for mr in sheet.merged:
                if mr[0] <= ri + 1 <= mr[2] and mr[1] <= rj + 1 <= mr[3]:
                    row_span = mr[2] - mr[0] + 1
                    col_span = mr[3] - mr[1] + 1
                    break
            if (ri, rj) not in visited:
                data.append(
                    {
                        "row": ri - start_row,
                        "col": rj - start_col,
                        "text": str(sheet.value(ri + 1, rj + 1)),
                        "row_span": row_span,
                        "col_span": col_span,
                    }
                )
                for sr in range(ri, ri + row_span):
                    for sc in range(rj, rj + col_span):
                        visited.add((sr, sc))
    table = {
        "anchor": (start_col, start_row),
        "num_rows": table_max_row + 1 - start_row,
        "num_cols": table_max_col + 1 - start_col,
        "data": data,
    }
    return table, visited


def _find_data_tables(sheet: _Sheet) -> list[dict]:
    min_row, max_row, min_col, max_col = _find_true_bounds(sheet)
    tables: list[dict] = []
    visited: set[tuple[int, int]] = set()
    for ri in range(min_row - 1, max_row):
        for rj in range(min_col - 1, max_col):
            if sheet.value(ri + 1, rj + 1) is None or (ri, rj) in visited:
                continue
            table, cells = _find_table_bounds(sheet, ri, rj, max_row, max_col)
            visited.update(cells)
            tables.append(table)
    return tables


# ======================================================================
def extract_xlsx(blob: bytes, name: str = "file") -> SpanDoc:
    wb = XlsxWorkbook(blob)
    doc = SpanDoc(name)
    for page_no, sheet in enumerate(wb.sheets, start=1):
        layer = "body" if sheet.state == "visible" else "invisible"
        grp = doc.add_group(
            label="section", name=f"sheet: {sheet.name}", content_layer=layer
        )
        # page size spans the BODY items' bboxes only — hidden (invisible-
        # layer) sheets report (0, 0), matching the reference's
        # iterate_items-based _find_page_size
        bboxes: list[tuple] = []
        if sheet.kind == "worksheet":
            for table in _find_data_tables(sheet):
                bbox = (
                    table["anchor"][0],
                    table["anchor"][1],
                    table["anchor"][0] + table["num_cols"],
                    table["anchor"][1] + table["num_rows"],
                )
                bboxes.append(bbox)
                tbl = doc.add_table(
                    num_rows=table["num_rows"],
                    num_cols=table["num_cols"],
                    parent=grp.idx,
                    content_layer=layer,
                )
                tbl.prov = (page_no, *bbox)
                for cell in table["data"]:
                    tbl.cells.append(
                        TableCellSpec(
                            text=cell["text"],
                            row_span=cell["row_span"],
                            col_span=cell["col_span"],
                            start_row=cell["row"],
                            end_row=cell["row"] + cell["row_span"],
                            start_col=cell["col"],
                            end_col=cell["col"] + cell["col_span"],
                            column_header=cell["row"] == 0,
                            row_header=False,
                        )
                    )
            for box in sheet.picture_anchors:
                pic = doc.add_picture(parent=grp.idx, content_layer=layer)
                pic.prov = (page_no, *box)
                bboxes.append(box)
        # reference _find_page_size: page size spans the items' bboxes
        if layer != "body":
            bboxes = []
        if bboxes:
            left = min(b[0] for b in bboxes)
            top = min(b[1] for b in bboxes)
            right = max(b[2] for b in bboxes)
            bottom = max(b[3] for b in bboxes)
            doc.pages[page_no] = (right - left, bottom - top)
        else:
            doc.pages[page_no] = (0.0, 0.0)
    return doc

"""DocTags output serializer.

Produces the reference's ``OutputFormat.DOCTAGS`` text
(/root/reference/docling/datamodel/base_models.py:82) for a SpanDoc.  The tag
grammar is derived from the 12 frozen goldens in
``/root/reference/tests/data/groundtruth/docling_v2/*.doctags.txt`` (per the
round-2 verdict's instruction: goldens, not docling-core source):

- root ``<doctag>…\\n</doctag>``; one serialized part per line
- every located item carries four ``<loc_N>`` tokens (bbox quantized to a
  0..500 grid in top-left page coordinates, l/t/r/b order)
- ``<page_break>`` lines between consecutive pages
- lists wrap items in ``<ordered_list>``/``<unordered_list>``
- tables are OTSL: ``<otsl>`` + per-cell tokens (``fcel`` full, ``ecel``
  empty, ``ched`` column header, ``rhed`` row header, ``lcel``/``ucel``/
  ``xcel`` span continuations) with ``<nl>`` row terminators and the caption
  nested before ``</otsl>``
- code blocks embed a language token (``<_unknown_>``) and nest captions;
  pictures and formulas are located leaves with optional nested caption/text
"""

from __future__ import annotations

from typing import Optional

from .model import Item, SpanDoc

# label → doctags tag for plain located text leaves
_TEXT_TAGS = {
    "text": "text",
    "paragraph": "text",
    "page_header": "page_header",
    "page_footer": "page_footer",
    "caption": "caption",
    "footnote": "footnote",
    "title": "title",
    "checkbox_selected": "checkbox_selected",
    "checkbox_unselected": "checkbox_unselected",
    "reference": "text",
}

_GRID = 500  # quantization grid for <loc_N> tokens


def _locs(doc: SpanDoc, it: Item) -> str:
    """Four <loc_N> tokens for the item's first provenance entry."""
    if not it.prov_list:
        return ""

    def q(v: float, dim: float) -> int:
        if dim <= 0:
            return 0
        n = round(v / dim * _GRID)
        return max(0, min(_GRID, n))

    out = []
    for p in it.prov_list:
        page_no = p.get("page_no", 1)
        w, h = doc.pages.get(page_no, (1.0, 1.0)) or (1.0, 1.0)
        bb = p["bbox"]
        l, t, r, b = bb["l"], bb["t"], bb["r"], bb["b"]
        if bb.get("coord_origin", "TOPLEFT") == "BOTTOMLEFT":
            t, b = h - t, h - b
        out.append(f"<loc_{q(l, w)}><loc_{q(t, h)}><loc_{q(r, w)}><loc_{q(b, h)}>")
    return "".join(out)


def _page_of(doc: SpanDoc, idx: int) -> Optional[int]:
    """First provenance page of the item or its first located descendant."""
    it = doc.items[idx]
    if it.prov_list:
        return it.prov_list[0].get("page_no")
    for c in it.children:
        p = _page_of(doc, c)
        if p is not None:
            return p
    return None


def _caption_part(doc: SpanDoc, it: Item) -> str:
    caps = [doc.items[c] for c in it.captions]
    if not caps:
        return ""
    out = []
    for cap in caps:
        out.append(f"<caption>{_locs(doc, cap)}{cap.text}</caption>")
    return "".join(out)


def _otsl(doc: SpanDoc, it: Item) -> str:
    """OTSL token stream for a table item (grammar frozen by the goldens)."""
    grid: list[list] = [
        [None] * it.num_cols for _ in range(it.num_rows)
    ]
    for cell in it.cells:
        for r in range(cell.start_row, min(cell.end_row, it.num_rows)):
            for c in range(cell.start_col, min(cell.end_col, it.num_cols)):
                if grid[r][c] is None:
                    grid[r][c] = cell
    toks: list[str] = ["<otsl>", _locs(doc, it)]
    for r in range(it.num_rows):
        for c in range(it.num_cols):
            cell = grid[r][c]
            if cell is None:
                toks.append("<ecel>")
                continue
            at_origin_row = cell.start_row == r
            at_origin_col = cell.start_col == c
            if at_origin_row and at_origin_col:
                text = cell.text
                if cell.column_header:
                    toks.append("<ched>")
                elif cell.row_header:
                    toks.append("<rhed>")
                elif text:
                    toks.append("<fcel>")
                else:
                    toks.append("<ecel>")
                    continue
                toks.append(text)
            elif at_origin_row:
                toks.append("<lcel>")
            elif at_origin_col:
                toks.append("<ucel>")
            else:
                toks.append("<xcel>")
        toks.append("<nl>")
    toks.append(_caption_part(doc, it))
    toks.append("</otsl>")
    return "".join(toks)


def _leaf(doc: SpanDoc, it: Item) -> str:
    label = it.label
    if it.kind == "table":
        return _otsl(doc, it)
    if it.kind == "picture":
        return f"<picture>{_locs(doc, it)}{_caption_part(doc, it)}</picture>"
    if label == "code":
        lang = f"<_{it.code_language}_>"
        return f"<code>{_locs(doc, it)}{lang}{it.text}{_caption_part(doc, it)}</code>"
    if label == "formula":
        return f"<formula>{_locs(doc, it)}{it.text}</formula>"
    if label == "section_header":
        tag = f"section_header_level_{it.level}"
        return f"<{tag}>{_locs(doc, it)}{it.text}</{tag}>"
    if label == "list_item":
        return f"<list_item>{_locs(doc, it)}{it.text}</list_item>"
    tag = _TEXT_TAGS.get(label, "text")
    return f"<{tag}>{_locs(doc, it)}{it.text}</{tag}>"


def _emit(doc: SpanDoc, idx: int, parts: list[str], state: dict) -> None:
    it = doc.items[idx]
    page = _page_of(doc, idx)
    if page is not None:
        prev = state.get("page")
        if prev is not None and page > prev:
            parts.append("<page_break>")
        state["page"] = page

    if it.kind == "group":
        if it.label == "list":
            kids: list[str] = []
            sub = dict(state)
            for c in it.children:
                _emit(doc, c, kids, sub)
            state["page"] = sub.get("page", state.get("page"))
            # wrapper follows the FIRST list item's enumerated flag (rule
            # frozen by the 2203.01017v2 golden, where mixed-enumeration
            # groups take the first item's kind)
            first_enum = next(
                (
                    doc.items[c].enumerated
                    for c in it.children
                    if doc.items[c].label == "list_item"
                ),
                False,
            )
            wrapper = "ordered_list" if first_enum else "unordered_list"
            parts.append(f"<{wrapper}>" + "\n".join(kids) + f"\n</{wrapper}>")
        else:
            # transparent group (key_value_area, form_area, section…): emit
            # children as top-level parts
            for c in it.children:
                _emit(doc, c, parts, state)
        return

    parts.append(_leaf(doc, it))
    # text items can carry nested content (e.g. HTML sections parented
    # under their heading): serialize descendants in DFS pre-order.
    # table/picture/code children are their captions, already emitted inline.
    if it.kind == "text" and it.children:
        consumed = set(it.captions)  # code captions already emitted inline
        for c in it.children:
            if c not in consumed:
                _emit(doc, c, parts, state)


def to_doctags(doc: SpanDoc) -> str:
    parts: list[str] = []
    state: dict = {}
    for c in doc.items[0].children:
        _emit(doc, c, parts, state)
    return "<doctag>" + "\n".join(parts) + "\n</doctag>"

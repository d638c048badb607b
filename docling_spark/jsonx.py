"""JSON_DOCLING backend: deserialize a DoclingDocument JSON into a SpanDoc.

Reference parity: DoclingJSONBackend
(/root/reference/docling/backend/json/docling_json_backend.py, 58 lines) —
reads a ready document JSON and re-validates it into the model. Ours is the
exact inverse of serialize_json.to_docling_dict:
``to_docling_json(parse_docling_json(j)) == j`` (round-trip tested over the
whole golden corpus).
"""

from __future__ import annotations

import json

from .model import BODY, Formatting, Item, SpanDoc, TableCellSpec

_ARRAYS = ("texts", "groups", "tables", "pictures")
_KIND = {"texts": "text", "groups": "group", "tables": "table", "pictures": "picture"}


def _ref_key(ref: str) -> tuple[str, int]:
    if ref in ("#/body", "#/furniture"):
        return ("body", 0)
    parts = ref.lstrip("#/").split("/")
    return (parts[0], int(parts[1]))


def parse_docling_json(raw: bytes | str) -> SpanDoc:
    d = json.loads(raw)
    if d.get("schema_name") != "DoclingDocument":
        raise ValueError("not a DoclingDocument JSON")
    doc = SpanDoc(d.get("name", "doc"))
    for no, p in d.get("pages", {}).items():
        sz = p.get("size", {})
        doc.pages[int(no)] = (sz.get("width", 0.0), sz.get("height", 0.0))

    # create one Item per array entry, array-by-array: re-serialization
    # assigns per-kind positions by scan order over doc.items, so any global
    # interleaving that PRESERVES per-kind order reproduces identical refs
    idx_of: dict[tuple[str, int], int] = {}
    objs: list[tuple[str, int, dict]] = []
    for arr in _ARRAYS:
        for i, obj in enumerate(d.get(arr, [])):
            it = Item(0, _KIND[arr], obj.get("label", _KIND[arr]))
            it.content_layer = obj.get("content_layer", BODY)
            it.idx = len(doc.items)
            doc.items.append(it)
            idx_of[(arr, i)] = it.idx
            objs.append((arr, i, obj))

    def resolve(ref: str) -> int:
        arr, i = _ref_key(ref)
        return 0 if arr == "body" else idx_of[(arr, i)]

    # wire structure + payloads
    doc.items[0].children = [
        resolve(c["$ref"]) for c in d.get("body", {}).get("children", [])
    ]
    for arr, i, obj in objs:
        it = doc.items[idx_of[(arr, i)]]
        it.parent = resolve(obj.get("parent", {}).get("$ref", "#/body"))
        it.children = [resolve(c["$ref"]) for c in obj.get("children", [])]
        if obj.get("prov"):
            it.prov_list = obj["prov"]
        if obj.get("code_language"):
            it.code_language = obj["code_language"]
        kind = _KIND[arr]
        if kind == "group":
            it.name = obj.get("name", "group")
        elif kind == "text":
            it.text = obj.get("text", "")
            it.orig = obj.get("orig", it.text)
            it.level = obj.get("level", 1)
            it.marker = obj.get("marker", "")
            it.enumerated = obj.get("enumerated", False)
            f = obj.get("formatting")
            if f:
                it.formatting = Formatting(
                    bold=f.get("bold", False),
                    italic=f.get("italic", False),
                    underline=f.get("underline", False),
                    strikethrough=f.get("strikethrough", False),
                    script=None
                    if f.get("script") in (None, "baseline")
                    else f["script"],
                )
            if obj.get("hyperlink") is not None:
                it.hyperlink = obj["hyperlink"]
        for cap in obj.get("captions", []):
            it.captions.append(resolve(cap["$ref"]))
        if kind == "table":
            data = obj.get("data", {})
            it.num_rows = data.get("num_rows", 0)
            it.num_cols = data.get("num_cols", 0)
            for c in data.get("table_cells", []):
                rich = resolve(c["ref"]["$ref"]) if "ref" in c else -1
                it.cells.append(
                    TableCellSpec(
                        text=c.get("text", ""),
                        row_span=c.get("row_span", 1),
                        col_span=c.get("col_span", 1),
                        start_row=c.get("start_row_offset_idx", 0),
                        end_row=c.get("end_row_offset_idx", 1),
                        start_col=c.get("start_col_offset_idx", 0),
                        end_col=c.get("end_col_offset_idx", 1),
                        column_header=c.get("column_header", False),
                        row_header=c.get("row_header", False),
                        rich_ref=rich,
                    )
                )
    return doc

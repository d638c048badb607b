"""DoclingDocument JSON exporter over the span model.

Produces the exact `export_to_dict()` JSON the reference writes as golden
`.json` files (docling-core schema v1.7.0, observed from
/root/reference/tests/data/groundtruth/docling_v2/*.html.json — key orders,
optional-key rules and value conventions were derived from those files, not
from docling-core source). `binary_hash` is the low 64 bits of the sha-256
of the source bytes (verified across the golden corpus).
"""

from __future__ import annotations

import hashlib
from typing import Any, Optional

from .model import Formatting, Item, SpanDoc

VERSION = "1.7.0"

_ARRAY_OF_KIND = {
    "text": "texts",
    "group": "groups",
    "table": "tables",
    "picture": "pictures",
}


def binary_hash_of(raw: bytes) -> int:
    """Low 64 bits of sha256 — docling-core's str→uint64 coercion of the
    reference's hex document_hash (verified on 24/25 goldens; the one
    mismatch is a fixture whose bytes drifted after golden generation)."""
    return int(hashlib.sha256(raw, usedforsecurity=False).hexdigest(), 16) & (
        (1 << 64) - 1
    )


def _fmt_dict(f: Optional[Formatting]) -> dict:
    f = f or Formatting()
    return {
        "bold": f.bold,
        "italic": f.italic,
        "underline": f.underline,
        "strikethrough": f.strikethrough,
        "script": f.script if f.script else "baseline",
    }


def to_docling_dict(doc: SpanDoc, filename: str, raw: bytes,
                    mimetype: str = "text/html") -> dict:
    # ---- positional assignment per kind (insertion order) ----
    pos: dict[int, tuple[str, int]] = {}
    counters = {v: 0 for v in _ARRAY_OF_KIND.values()}
    for it in doc.items[1:]:
        arr = _ARRAY_OF_KIND[it.kind]
        pos[it.idx] = (arr, counters[arr])
        counters[arr] += 1

    def ref(idx: int) -> str:
        if idx <= 0:
            return "#/body"
        arr, i = pos[idx]
        return f"#/{arr}/{i}"

    def refobj(idx: int) -> dict:
        return {"$ref": ref(idx)}

    def common(it: Item) -> dict:
        return {
            "self_ref": ref(it.idx),
            "parent": refobj(it.parent),
            "children": [refobj(c) for c in it.children],
            "content_layer": it.content_layer,
        }

    def prov_list(it: Item) -> list:
        if it.prov is None:
            return []
        if isinstance(it.prov, dict):
            p = it.prov
            return [
                {
                    "page_no": p["page_no"],
                    "bbox": {
                        "l": float(p["l"]),
                        "t": float(p["t"]),
                        "r": float(p["r"]),
                        "b": float(p["b"]),
                        "coord_origin": p.get("coord_origin", "TOPLEFT"),
                    },
                    "charspan": list(p.get("charspan", (0, 0))),
                }
            ]
        page_no, l, t, r, b = it.prov
        return [
            {
                "page_no": page_no,
                "bbox": {
                    "l": float(l),
                    "t": float(t),
                    "r": float(r),
                    "b": float(b),
                    "coord_origin": "TOPLEFT",
                },
                "charspan": [0, 0],
            }
        ]

    out: dict[str, Any] = {
        "schema_name": "DoclingDocument",
        "version": VERSION,
        "name": doc.name,
        "origin": {
            "mimetype": mimetype,
            "binary_hash": binary_hash_of(raw),
            "filename": filename,
        },
        "furniture": {
            "self_ref": "#/furniture",
            "children": [],
            "content_layer": "furniture",
            "name": "_root_",
            "label": "unspecified",
        },
        "body": {
            "self_ref": "#/body",
            "children": [refobj(c) for c in doc.items[0].children],
            "content_layer": "body",
            "name": "_root_",
            "label": "unspecified",
        },
        "groups": [],
        "texts": [],
        "pictures": [],
        "tables": [],
        "key_value_items": [],
        "form_items": [],
        "pages": {
            str(no): {
                "size": {"width": float(w), "height": float(h)},
                "page_no": no,
            }
            for no, (w, h) in sorted(doc.pages.items())
        },
    }

    for it in doc.items[1:]:
        if it.kind == "group":
            g = common(it)
            g["name"] = it.name or "group"
            g["label"] = it.label
            out["groups"].append(g)
        elif it.kind == "text":
            t = common(it)
            t["label"] = it.label
            t["prov"] = prov_list(it)
            # orig is authoritative: every builder sets it at creation
            # (falling back to text there), and a later in-place .text
            # mutation must NOT leak into orig (USPTO APS claims keep
            # orig="" while text accumulates — pftaps json golden)
            t["orig"] = it.orig
            t["text"] = it.text
            if it.label == "code":
                t["captions"] = [refobj(c) for c in it.captions]
                t["references"] = []
                t["footnotes"] = []
                t["code_language"] = "unknown"
            else:
                # emitted whenever the builder attached a Formatting object,
                # even all-default (the VTT backend always does; HTML only
                # attaches non-default ones) — matches golden behavior
                if it.formatting is not None:
                    t["formatting"] = _fmt_dict(it.formatting)
                if it.hyperlink is not None:
                    t["hyperlink"] = str(it.hyperlink)
                if it.label == "section_header":
                    t["level"] = it.level
                elif it.label == "list_item":
                    t["enumerated"] = it.enumerated
                    t["marker"] = it.marker
            out["texts"].append(t)
        elif it.kind == "picture":
            p = common(it)
            p["label"] = it.label
            p["prov"] = prov_list(it)
            p["captions"] = [refobj(c) for c in it.captions]
            p["references"] = []
            p["footnotes"] = []
            p["annotations"] = []
            out["pictures"].append(p)
        elif it.kind == "table":
            tb = common(it)
            tb["label"] = it.label
            tb["prov"] = prov_list(it)
            tb["captions"] = [refobj(c) for c in it.captions]
            tb["references"] = []
            tb["footnotes"] = []
            tb["data"] = _table_data(it, ref)
            tb["annotations"] = []
            out["tables"].append(tb)
    return out


def _cell_dict(c, ref) -> dict:
    d = {
        "row_span": c.row_span,
        "col_span": c.col_span,
        "start_row_offset_idx": c.start_row,
        "end_row_offset_idx": c.end_row,
        "start_col_offset_idx": c.start_col,
        "end_col_offset_idx": c.end_col,
        "text": c.text,
        "column_header": c.column_header,
        "row_header": c.row_header,
        "row_section": False,
        "fillable": False,
    }
    if c.rich_ref >= 0:  # RichTableCell: points at the wrapping group
        d["ref"] = {"$ref": ref(c.rich_ref)}
    return d


def _table_data(it: Item, ref) -> dict:
    cells = [_cell_dict(c, ref) for c in it.cells]
    # the grid replicates cells WITHOUT the RichTableCell "ref" key (it
    # serializes plain TableCells there)
    grid_cells = [
        {k: v for k, v in d.items() if k != "ref"} for d in cells
    ]
    grid: list[list[Optional[dict]]] = [
        [None] * it.num_cols for _ in range(it.num_rows)
    ]
    for c, d in zip(it.cells, grid_cells):
        for r in range(c.start_row, min(c.end_row, it.num_rows)):
            for col in range(c.start_col, min(c.end_col, it.num_cols)):
                if grid[r][col] is None:
                    grid[r][col] = d
    # holes (uncovered positions) — the reference grid replicates cells to
    # every covered slot; truly empty slots shouldn't occur after grid fill
    filled = [[d if d is not None else _empty_cell(r, col) for col, d in enumerate(row)] for r, row in enumerate(grid)]
    return {
        "table_cells": cells,
        "num_rows": it.num_rows,
        "num_cols": it.num_cols,
        "grid": filled,
    }


def _empty_cell(r: int, col: int) -> dict:
    return {
        "row_span": 1,
        "col_span": 1,
        "start_row_offset_idx": r,
        "end_row_offset_idx": r + 1,
        "start_col_offset_idx": col,
        "end_col_offset_idx": col + 1,
        "text": "",
        "column_header": False,
        "row_header": False,
        "row_section": False,
        "fillable": False,
    }


def to_docling_json(doc: SpanDoc, filename: str, raw: bytes,
                    mimetype: str = "text/html") -> str:
    import json

    return json.dumps(
        to_docling_dict(doc, filename, raw, mimetype), indent=2, ensure_ascii=False
    )

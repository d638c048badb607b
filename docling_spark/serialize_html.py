"""HTML output serializer for the SpanDoc span model.

Role parity: the reference exposes OutputFormat.HTML via docling-core's
``HTMLDocSerializer`` (/root/reference/docling/datamodel/base_models.py:76-82,
/root/reference/docling/cli/main.py:15-19) and the Markdown backend uses
``doc.export_to_html()`` as the bridge for raw-HTML-block delegation
(/root/reference/docling/backend/md_backend.py:567-609).

The exact byte format of docling-core's HTML is not frozen by any golden
file; what IS observable (and tested) is the round-trip contract: a SpanDoc
serialized here and re-parsed through ``HtmlExtractor`` must yield the same
body item tree.  Two behaviors are load-bearing for that contract:

- code items are emitted with UNESCAPED content inside ``<pre><code>`` —
  required by the md backend's marker mechanism, where raw HTML blocks
  survive the export and are re-parsed as real markup after the marker
  wrapper is stripped (md_backend.py:582-586);
- inline groups join their children with single spaces inside one ``<p>``,
  which after whitespace collapse re-parses to the same text.
"""

from __future__ import annotations

from .model import BODY, Item, SpanDoc

# Exact head template of the reference HTML output format, re-derived from
# the frozen golden file tests/data/groundtruth/docling_v2/word_tables.docx.html
# (the only export_to_html golden the reference ships) — the {title} slot is
# the document name.
_HEAD_TEMPLATE = '<!DOCTYPE html>\n<html>\n<head>\n<meta charset="UTF-8"/>\n<title>{title}</title>\n<meta name="generator" content="Docling HTML Serializer"/>\n<style>\n    html {\n        background-color: #f5f5f5;\n        font-family: Arial, sans-serif;\n        line-height: 1.6;\n    }\n    body {\n        max-width: 800px;\n        margin: 0 auto;\n        padding: 2rem;\n        background-color: white;\n        box-shadow: 0 0 10px rgba(0,0,0,0.1);\n    }\n    h1, h2, h3, h4, h5, h6 {\n        color: #333;\n        margin-top: 1.5em;\n        margin-bottom: 0.5em;\n    }\n    h1 {\n        font-size: 2em;\n        border-bottom: 1px solid #eee;\n        padding-bottom: 0.3em;\n    }\n    table {\n        border-collapse: collapse;\n        margin: 1em 0;\n        width: 100%;\n    }\n    th, td {\n        border: 1px solid #ddd;\n        padding: 8px;\n        text-align: left;\n    }\n    th {\n        background-color: #f2f2f2;\n        font-weight: bold;\n    }\n    figure {\n        margin: 1.5em 0;\n        text-align: center;\n    }\n    figcaption {\n        color: #666;\n        font-style: italic;\n        margin-top: 0.5em;\n    }\n    img {\n        max-width: 100%;\n        height: auto;\n    }\n    pre {\n        background-color: #f6f8fa;\n        border-radius: 3px;\n        padding: 1em;\n        overflow: auto;\n    }\n    code {\n        font-family: monospace;\n        background-color: #f6f8fa;\n        padding: 0.2em 0.4em;\n        border-radius: 3px;\n    }\n    pre code {\n        background-color: transparent;\n        padding: 0;\n    }\n    .formula {\n        text-align: center;\n        padding: 0.5em;\n        margin: 1em 0;\n        background-color: #f9f9f9;\n    }\n    .formula-not-decoded {\n        text-align: center;\n        padding: 0.5em;\n        margin: 1em 0;\n        background: repeating-linear-gradient(\n            45deg,\n            #f0f0f0,\n            #f0f0f0 10px,\n            #f9f9f9 10px,\n            #f9f9f9 20px\n        );\n    }\n    .page-break {\n        page-break-after: always;\n        border-top: 1px dashed #ccc;\n        margin: 2em 0;\n    }\n    .key-value-region {\n        background-color: #f9f9f9;\n        padding: 1em;\n        border-radius: 4px;\n        margin: 1em 0;\n    }\n    .key-value-region dt {\n        font-weight: bold;\n    }\n    .key-value-region dd {\n        margin-left: 1em;\n        margin-bottom: 0.5em;\n    }\n    .form-container {\n        border: 1px solid #ddd;\n        padding: 1em;\n        border-radius: 4px;\n        margin: 1em 0;\n    }\n    .form-item {\n        margin-bottom: 0.5em;\n    }\n    .image-classification {\n        font-size: 0.9em;\n        color: #666;\n        margin-top: 0.5em;\n    }\n</style>\n</head>\n'



def _esc(text: str) -> str:
    return (
        text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _esc_attr(text: str) -> str:
    return _esc(text).replace('"', "&quot;")


def _inline_html(item: Item) -> str:
    """Inline form of a text item: formatting wrappers + hyperlink."""
    if item.label == "code":
        txt = f"<code>{item.text}</code>"
        f = item.formatting
        if f is not None:
            if f.italic:
                txt = f"<i>{txt}</i>"
            if f.bold:
                txt = f"<b>{txt}</b>"
        if item.hyperlink:
            txt = f'<a href="{_esc_attr(item.hyperlink)}">{txt}</a>'
        return txt
    txt = _esc(item.text)
    f = item.formatting
    if f is not None:
        if f.script == "sub":
            txt = f"<sub>{txt}</sub>"
        elif f.script == "super":
            txt = f"<sup>{txt}</sup>"
        if f.underline:
            txt = f"<u>{txt}</u>"
        if f.strikethrough:
            txt = f"<s>{txt}</s>"
        if f.italic:
            txt = f"<i>{txt}</i>"
        if f.bold:
            txt = f"<b>{txt}</b>"
    if item.hyperlink:
        txt = f'<a href="{_esc_attr(item.hyperlink)}">{txt}</a>'
    return txt


class _HtmlWriter:
    def __init__(self, doc: SpanDoc):
        self.doc = doc
        self.parts: list[str] = []

    def run(self) -> str:
        for cidx in self.doc.items[0].children:
            self._block(self.doc.items[cidx])
        body = "\n".join(self.parts)
        return (
            _HEAD_TEMPLATE.replace("{title}", _esc(self.doc.name))
            + "<body>\n<div class='page'>\n"
            + body
            + "\n</div>\n</body>\n</html>"
        )

    def _inline_children(self, item: Item) -> str:
        """Joined inline rendering of an item's inline-group children."""
        parts = []
        for c in item.children:
            ch = self.doc.items[c]
            if ch.kind == "group" and ch.label == "inline":
                for t in ch.children:
                    ti = self.doc.items[t]
                    if ti.kind == "text":
                        s = _inline_html(ti)
                        if s:
                            parts.append(s)
            elif ch.kind == "text" and ch.label == "caption":
                continue
        return " ".join(parts)

    def _block(self, item: Item) -> None:
        doc = self.doc
        if item.content_layer != BODY:
            return
        if item.kind == "group":
            if item.label == "list":
                self.parts.append(self._list_html(item))
            elif item.label == "inline":
                joined = " ".join(
                    s
                    for c in item.children
                    if doc.items[c].kind == "text"
                    and (s := _inline_html(doc.items[c]))
                )
                if joined:
                    self.parts.append(f"<p>{joined}</p>")
            else:  # section / unspecified: transparent container
                for c in item.children:
                    self._block(doc.items[c])
            return
        if item.kind == "text":
            if item.label == "caption":
                return  # rendered by the owning picture/table
            if item.label == "title":
                inner = _inline_html(item) if item.text else self._inline_children(item)
                self.parts.append(f"<h1>{inner}</h1>")
            elif item.label == "section_header":
                lvl = min(item.level + 1, 6)
                inner = _inline_html(item) if item.text else self._inline_children(item)
                self.parts.append(f"<h{lvl}>{inner}</h{lvl}>")
            elif item.label == "code":
                # unescaped on purpose — see module docstring
                self.parts.append(f"<pre><code>{item.text}</code></pre>")
            else:
                # empty paragraphs render as <p></p> (word_tables golden)
                self.parts.append(f"<p>{_inline_html(item)}</p>")
            for c in item.children:
                ch = doc.items[c]
                if ch.kind == "group" and ch.label == "inline" and not item.text:
                    continue  # already rendered inside the heading
                self._block(ch)
        elif item.kind == "picture":
            cap = ""
            for ci in item.captions:
                ct = doc.items[ci]
                if ct.text:
                    cap = f"<figcaption>{_esc(ct.text)}</figcaption>"
            self.parts.append(f"<figure>{cap}</figure>")
        elif item.kind == "table":
            self.parts.append(self._table_html(item))

    def _li_content(self, child: Item) -> str:
        parts = []
        if child.text:
            parts.append(_inline_html(child))
        subhtml = []
        for gidx in child.children:
            sub = self.doc.items[gidx]
            if sub.kind == "group" and sub.label == "inline":
                for t in sub.children:
                    ti = self.doc.items[t]
                    if ti.kind == "text":
                        s = _inline_html(ti)
                        if s:
                            parts.append(s)
            elif sub.kind == "group" and sub.label == "list":
                subhtml.append(self._list_html(sub))
            elif sub.kind == "text":
                s = _inline_html(sub)
                if s:
                    parts.append(s)
        return " ".join(parts) + "".join(subhtml)

    def _list_html(self, group: Item) -> str:
        doc = self.doc
        items_html = []
        ordered = False
        for cidx in group.children:
            child = doc.items[cidx]
            if child.kind == "group" and child.label == "list":
                items_html.append(self._list_html(child))
                continue
            if child.label != "list_item":
                continue
            ordered = ordered or child.enumerated
            items_html.append(f"<li>{self._li_content(child)}</li>")
        tag = "ol" if ordered else "ul"
        return f"<{tag}>" + "".join(items_html) + f"</{tag}>"

    def _table_html(self, item: Item) -> str:
        rows, cols = item.num_rows, item.num_cols
        if rows == 0 or cols == 0:
            return ""
        # anchor cells per (row, col); spans re-expand via row/colspan attrs
        grid: dict[tuple[int, int], object] = {}
        covered: set[tuple[int, int]] = set()
        for cell in item.cells:
            key = (cell.start_row, cell.start_col)
            if key in grid:
                continue
            grid[key] = cell
            for r in range(cell.start_row, min(cell.end_row, rows)):
                for c in range(cell.start_col, min(cell.end_col, cols)):
                    if (r, c) != key:
                        covered.add((r, c))
        out = ["<table><tbody>"]
        for r in range(rows):
            out.append("<tr>")
            for c in range(cols):
                if (r, c) in covered:
                    continue
                cell = grid.get((r, c))
                if cell is None:
                    out.append("<td></td>")
                    continue
                tag = "th" if cell.column_header or cell.row_header else "td"
                attrs = ""
                rs = cell.end_row - cell.start_row
                cs = cell.end_col - cell.start_col
                if rs > 1:
                    attrs += f' rowspan="{rs}"'
                if cs > 1:
                    attrs += f' colspan="{cs}"'
                out.append(f"<{tag}{attrs}>{_esc(cell.text)}</{tag}>")
            out.append("</tr>")
        out.append("</tbody></table>")
        cap = ""
        for ci in item.captions:
            ct = self.doc.items[ci]
            if ct.text:
                cap = f"<caption>{_esc(ct.text)}</caption>"
        if cap:
            out.insert(1, cap)
        return "".join(out)


def to_html(doc: SpanDoc) -> str:
    """SpanDoc → standalone HTML document string."""
    return _HtmlWriter(doc).run()

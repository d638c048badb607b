"""CSV backend: bytes → SpanDoc with one table.

Re-derives the reference CsvDocumentBackend's observable behavior
(/root/reference/docling/backend/csv_backend.py:17-127): utf-8 decode,
csv.Sniffer dialect detection over ",;\\t|:", strict parse, one TableItem
with the first row as column headers, cell grid without spans.
"""

from __future__ import annotations

import csv
from io import StringIO

from .model import SpanDoc, TableCellSpec


def extract_csv(raw: bytes, name: str = "file") -> SpanDoc:
    text = raw.decode("utf-8")
    head = text.split("\n", 1)[0]
    dialect = csv.Sniffer().sniff(head, ",;\t|:")
    if dialect.delimiter not in {",", ";", "\t", "|", ":"}:
        raise RuntimeError(
            f"Cannot convert csv with unknown delimiter {dialect.delimiter}."
        )
    rows = list(csv.reader(StringIO(text), dialect=dialect, strict=True))
    doc = SpanDoc(name)
    if rows:
        num_rows = len(rows)
        num_cols = max(len(r) for r in rows)
        tbl = doc.add_table(num_rows=num_rows, num_cols=num_cols)
        for row_idx, row in enumerate(rows):
            for col_idx, value in enumerate(row):
                tbl.cells.append(
                    TableCellSpec(
                        text=str(value),
                        row_span=1,
                        col_span=1,
                        start_row=row_idx,
                        end_row=row_idx + 1,
                        start_col=col_idx,
                        end_col=col_idx + 1,
                        column_header=row_idx == 0,
                        row_header=False,
                    )
                )
    return doc

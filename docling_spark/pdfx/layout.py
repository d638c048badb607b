"""PDF layout path: positioned runs → text cells → reading order → text.

Re-derives the deterministic parts of the reference pipeline:

- line/cell assembly mirrors pdfium's fragment merge heuristic
  (/root/reference/docling/backend/pypdfium2_backend.py:121-254:
  row grouping by vertical overlap, horizontal merge when the gap is
  below avg_height * threshold);
- reading order is a recursive XY-cut (segment by the widest horizontal
  whitespace band, then vertical), matching the role of the reference's
  deterministic cluster sort (min cell index, tie (top,left) —
  /root/reference/docling/utils/layout_postprocessor.py:657-683);
- ``sanitize_text`` replicates the hyphen-merge + unicode normalizations of
  /root/reference/docling/models/page_assemble_model.py:34-65 byte-for-byte.

Everything NN-based (layout labels, table structure) is out of contract
(SURVEY.md §2.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .content import Run


@dataclass
class Cell:
    """Merged text cell, top-left-origin coordinates."""

    index: int
    text: str
    l: float
    t: float
    r: float
    b: float

    @property
    def height(self) -> float:
        return self.b - self.t


# ------------------------------------------------------------------- bidi
def _is_rtl_char(c: str) -> bool:
    return "֐" <= c <= "ࣿ" or "יִ" <= c <= "ﻼ"


def _is_arabic(c: str) -> bool:
    # Arabic block + supplement + presentation forms A/B (cursive script)
    o = ord(c)
    return (
        0x0600 <= o <= 0x077F
        or 0xFB50 <= o <= 0xFDFF
        or 0xFE70 <= o <= 0xFEFF
    )


_LTR_RUN = re.compile(r"[A-Za-z0-9][A-Za-z0-9 .,:/%+\-]*[A-Za-z0-9]|[A-Za-z0-9]")


def visual_to_logical(line: str) -> str:
    """Simplified bidi inversion for RTL-dominant lines.

    PDF content streams store glyphs in VISUAL order (left-to-right as
    drawn); readers reorder to logical order (pdfium does full UBA). For an
    RTL-dominant line the visual string is the logical string reversed with
    embedded LTR tokens kept intact — so the inverse is: reverse the whole
    line, then un-reverse each maximal LTR (latin/digit) segment. Neutral
    punctuation between LTR tokens travels with them; full UBA edge cases
    (nested embeddings, mirrored brackets) are out of scope."""
    rtl = sum(1 for c in line if _is_rtl_char(c))
    if rtl == 0:
        return line
    ltr = sum(1 for c in line if c.isascii() and c.isalnum())
    if rtl <= ltr:
        return line
    rev = line[::-1]
    return _LTR_RUN.sub(lambda m: m.group()[::-1], rev)


# ------------------------------------------------------------------ lines
def _runs_to_lines(runs: list[Run], page_height: float) -> list[Cell]:
    """Group raw show-op runs into baseline lines (one Cell per line)."""
    if not runs:
        return []
    # convert to top-left origin; baseline key rounded to tolerance buckets
    items = []
    for i, r in enumerate(runs):
        if not r.text.strip():
            # pure-whitespace run still matters for spacing, keep but mark
            pass
        y = page_height - r.y0
        items.append((y, min(r.x0, r.x1), max(r.x0, r.x1), r, i))
    # sort by baseline then x then original order (stable for ties)
    items.sort(key=lambda it: (round(it[0], 1), it[1], it[4]))

    lines: list[list] = []
    cur: list = []
    cur_y = None
    cur_size = 1.0
    for it in items:
        y, _, _, r, _ = it
        tol = max(cur_size, r.size, 1.0) * 0.5
        if cur_y is None or abs(y - cur_y) <= tol:
            cur.append(it)
            cur_y = y if cur_y is None else (cur_y + y) / 2
            cur_size = max(cur_size, r.size)
        else:
            lines.append(cur)
            cur = [it]
            cur_y = y
            cur_size = r.size
    if cur:
        lines.append(cur)

    out: list[Cell] = []
    for ln in lines:
        ln.sort(key=lambda it: it[1])
        base = sum(it[0] for it in ln) / len(ln)
        size = max(it[3].size for it in ln) or 10.0
        # split a baseline into segments at column-scale gaps (> 1 line
        # height — the same threshold the pdfium-style horizontal merge
        # uses), so multi-column rows stay separate cells and the grid
        # detector (structure._try_table) can see table columns; word-scale
        # gaps (0.17–1.0 × size) become single spaces as before
        segments: list[list] = []
        cur_seg: list = []
        prev_x1 = None
        for it in ln:
            _, x0, x1, run, _ = it
            if prev_x1 is not None and x0 - prev_x1 > size * 1.0 and cur_seg:
                segments.append(cur_seg)
                cur_seg = []
            cur_seg.append(it)
            prev_x1 = max(x1, prev_x1 if prev_x1 is not None else x1)
        if cur_seg:
            segments.append(cur_seg)
        for seg in segments:
            parts: list[str] = []
            prev_x1 = None
            l = min(it[1] for it in seg)
            r_ = max(it[2] for it in seg)
            for _, x0, x1, run, _ in seg:
                txt = run.text
                if prev_x1 is not None:
                    gap = x0 - prev_x1
                    # cursive scripts carry wider intra-word glyph gaps:
                    # between two Arabic letters a real space is ≥ ~0.3 em,
                    # while Latin-tuned 0.17 em splits words ("فعال ة")
                    thr = 0.17
                    if parts and parts[-1] and txt:
                        if _is_arabic(parts[-1][-1]) and _is_arabic(txt[0]):
                            thr = 0.34
                    if gap > size * thr and parts and not parts[-1].endswith(" ") and not txt.startswith(" "):
                        parts.append(" ")
                parts.append(txt)
                prev_x1 = max(x1, prev_x1 if prev_x1 is not None else x1)
            text = re.sub(r" {2,}", " ", "".join(parts)).strip()
            if not text:
                continue
            text = visual_to_logical(text)
            out.append(
                Cell(len(out), text, l, base - size * 0.85, r_, base + size * 0.15)
            )
    return out


# ------------------------------------------------------- pdfium-style merge
def merge_horizontal_cells(
    cells: list[Cell],
    horizontal_threshold_factor: float = 1.0,
    vertical_threshold_factor: float = 0.5,
) -> list[Cell]:
    """Row-group + horizontal merge, re-derived from pypdfium2_backend's
    merge_horizontal_cells (same thresholds)."""
    if not cells:
        return []
    rows: list[list[Cell]] = []
    current = [cells[0]]
    row_top, row_bottom = cells[0].t, cells[0].b
    row_height = row_bottom - row_top
    for c in cells[1:]:
        vt = row_height * vertical_threshold_factor
        if abs(c.t - row_top) <= vt and abs(c.b - row_bottom) <= vt:
            current.append(c)
            row_top = min(row_top, c.t)
            row_bottom = max(row_bottom, c.b)
            row_height = row_bottom - row_top
        else:
            rows.append(current)
            current = [c]
            row_top, row_bottom = c.t, c.b
            row_height = c.b - c.t
    rows.append(current)

    merged: list[Cell] = []
    for row in rows:
        row = sorted(row, key=lambda c: c.l)
        group = [row[0]]
        for c in row[1:]:
            prev = group[-1]
            avg_h = (prev.height + c.height) / 2
            if c.l - prev.r <= avg_h * horizontal_threshold_factor:
                group.append(c)
            else:
                merged.append(_merge_group(group))
                group = [c]
        merged.append(_merge_group(group))
    for i, c in enumerate(merged):
        c.index = i
    return merged


def _merge_group(group: list[Cell]) -> Cell:
    if len(group) == 1:
        return group[0]
    text = " ".join(c.text for c in group)
    return Cell(
        group[0].index,
        text,
        min(c.l for c in group),
        min(c.t for c in group),
        max(c.r for c in group),
        max(c.b for c in group),
    )


def runs_to_cells(runs: list[Run], page_height: float) -> list[Cell]:
    return merge_horizontal_cells(_runs_to_lines(runs, page_height))


# ------------------------------------------------------------ reading order
def xycut_order(cells: list[Cell]) -> list[Cell]:
    """Deterministic page segmentation: recursively split on the widest
    whitespace band (horizontal first), emitting blocks top-down then
    left-right. O(n log n) per level; page cell counts are small."""
    if len(cells) <= 1:
        return list(cells)

    def split(group: list[Cell], depth: int) -> list[Cell]:
        if len(group) <= 1 or depth > 12:
            return sorted(group, key=lambda c: (c.t, c.l))
        med_h = sorted(c.height for c in group)[len(group) // 2] or 4.0
        # horizontal cut: gaps in y-projection
        ys = sorted((c.t, c.b) for c in group)
        gaps_h = _projection_gaps(ys)
        cut_h = max((g for g in gaps_h), key=lambda g: g[1] - g[0], default=None)
        if cut_h and (cut_h[1] - cut_h[0]) > med_h * 0.8:
            mid = (cut_h[0] + cut_h[1]) / 2
            top = [c for c in group if (c.t + c.b) / 2 < mid]
            bot = [c for c in group if (c.t + c.b) / 2 >= mid]
            if top and bot:
                return split(top, depth + 1) + split(bot, depth + 1)
        # vertical cut: gaps in x-projection (columns)
        xs = sorted((c.l, c.r) for c in group)
        gaps_v = _projection_gaps(xs)
        cut_v = max((g for g in gaps_v), key=lambda g: g[1] - g[0], default=None)
        if cut_v and (cut_v[1] - cut_v[0]) > med_h * 1.2:
            mid = (cut_v[0] + cut_v[1]) / 2
            left = [c for c in group if (c.l + c.r) / 2 < mid]
            right = [c for c in group if (c.l + c.r) / 2 >= mid]
            if left and right:
                return split(left, depth + 1) + split(right, depth + 1)
        return sorted(group, key=lambda c: (c.t, c.l))

    return split(list(cells), 0)


def _projection_gaps(intervals: list[tuple[float, float]]) -> list[tuple[float, float]]:
    """Uncovered bands strictly inside the union of sorted intervals."""
    gaps = []
    cover_end = None
    for a, b in intervals:
        if cover_end is None:
            cover_end = b
            continue
        if a > cover_end:
            gaps.append((cover_end, a))
            cover_end = b
        else:
            cover_end = max(cover_end, b)
    return gaps


# ------------------------------------------------------------- text assembly
def sanitize_text(lines: list[str]) -> str:
    """Byte-for-byte re-derivation of the reference sanitize_text
    (page_assemble_model.py:34-65): hyphen de-hyphenation between
    word-ending/word-starting lines, else join with spaces; then six
    unicode replacements; strip."""
    if len(lines) <= 1:
        return " ".join(lines)
    lines = list(lines)
    for ix, line in enumerate(lines[1:]):
        prev_line = lines[ix]
        if prev_line.endswith("-"):
            prev_words = re.findall(r"\b[\w]+\b", prev_line)
            line_words = re.findall(r"\b[\w]+\b", line)
            if (
                len(prev_words)
                and len(line_words)
                and prev_words[-1].isalnum()
                and line_words[0].isalnum()
            ):
                lines[ix] = prev_line[:-1]
        else:
            lines[ix] += " "
    s = "".join(lines)
    s = s.replace("⁄", "/")
    s = s.replace("’", "'")
    s = s.replace("‘", "'")
    s = s.replace("“", '"')
    s = s.replace("”", '"')
    s = s.replace("•", "·")
    return s.strip()


def paragraph_groups(cells: list[Cell]) -> list[list[Cell]]:
    """XY-cut order, then group consecutive cells whose vertical gap is
    within the line-height tolerance — the shared segmentation used by both
    the text assembly and the structural labeler (one rule, two views)."""
    ordered = xycut_order(cells)
    paras: list[list[Cell]] = []
    cur: list[Cell] = []
    prev: Cell | None = None
    for c in ordered:
        if prev is not None:
            gap = c.t - prev.b
            line_h = max(prev.height, c.height, 1.0)
            same_block = -line_h <= gap <= line_h * 0.6 or (
                abs(c.t - prev.t) < line_h * 0.3  # side-by-side fragments
            )
            if not same_block:
                paras.append(cur)
                cur = []
        cur.append(c)
        prev = c
    if cur:
        paras.append(cur)
    return [p for p in paras if p]


def page_cells_to_text(cells: list[Cell]) -> str:
    """Cells → paragraphs: XY-cut order, group consecutive cells whose
    vertical gap is within 1.6× line height, sanitize each group."""
    return "\n\n".join(
        sanitize_text([c.text for c in p]) for p in paragraph_groups(cells)
    )

"""WebVTT backend: subtitle/caption files → SpanDoc.

Re-derives the reference WebVTTDocumentBackend's observable behavior
(/root/reference/docling/backend/webvtt_backend.py:27-572): signature
check, NOTE/STYLE/REGION block removal, cue-block grammar (optional
identifier line, timings, settings ignored), cue-span parse (text / c / i /
b / u / v voice spans with classes), and the document mapping — one SECTION
group per cue ("WebVTT cue block"), timings as a text item, one INLINE
group per voice span ("WebVTT cue voice span") whose first item is
"Name (classes): " followed by the span texts with i/b/u formatting.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from .model import BODY, Formatting, Item, SpanDoc

_TS_RE = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_TAG_RE = re.compile(r"<(/?)(i|b|c|u|v(?:\.[^\t\n\r &<>.]+)*)(?:\s+([^>]*))?>")
_VOICE_RE = re.compile(
    r"^<v(?P<cls>\.[^\t\n\r &<>]+)?[ \t]+(?P<annotation>[^\n\r&>]+)>"
)


def _valid_ts(raw: str) -> bool:
    return bool(_TS_RE.match(raw))


def _ts_ms(raw: str) -> int:
    m = _TS_RE.match(raw)
    h = int(m.group(1) or 0)
    return ((h * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


@dataclass
class _Span:
    kind: str  # text | c | i | b | u | v
    text: str = ""
    annotation: str = ""
    classes: list[str] = field(default_factory=list)
    components: list["_Span"] = field(default_factory=list)


@dataclass
class _Cue:
    identifier: Optional[str]
    start: str
    end: str
    payload: list[_Span]


def _parse_cue(raw: str) -> _Cue:
    lines = raw.strip().splitlines()
    if not lines:
        raise ValueError("empty cue block")
    identifier = None
    timing_line = lines[0]
    cue_lines = lines[1:]
    if "-->" not in timing_line and len(lines) > 1:
        if "-->" in timing_line or "\n" in timing_line:
            raise ValueError("bad identifier")
        identifier = timing_line
        timing_line = lines[1]
        cue_lines = lines[2:]
    if "-->" not in timing_line:
        raise ValueError("cue block must contain timings")
    start, end = [t.strip() for t in timing_line.split("-->")]
    end = re.split(" |\t", end)[0]  # settings list ignored
    if not (_valid_ts(start) and _valid_ts(end)):
        raise ValueError("invalid timestamp")
    if _ts_ms(end) <= _ts_ms(start):
        # reference _WebVTTCueTimings validator requires end > start; such
        # cue blocks are skipped, not emitted
        raise ValueError("cue end timestamp must be greater than start")

    cue_text = " ".join(cue_lines).strip()
    if "-->" in cue_text:
        raise ValueError("payload must not contain -->")
    if cue_text.startswith("<v") and "</v>" not in cue_text:
        cue_text += "</v>"

    stack: list[list[_Span]] = [[]]
    tag_stack: list = []
    pos = 0
    for m in _TAG_RE.finditer(cue_text):
        if m.start() > pos:
            stack[-1].append(_Span("text", text=cue_text[pos : m.start()]))
        tag = m.group(0)
        if tag.startswith(("<i>", "<b>", "<u>", "<c>")):
            tag_stack.append(tag[1:2])
            stack.append([])
        elif tag in ("</i>", "</b>", "</u>", "</c>"):
            if tag_stack:
                children = stack.pop()
                stack[-1].append(_Span(tag[2:3], components=children))
                tag_stack.pop()
        elif tag.startswith("<v"):
            tag_stack.append(("v", tag))
            stack.append([])
        elif tag.startswith("</v"):
            children = stack.pop() if len(stack) > 1 else []
            if tag_stack and isinstance(tag_stack[-1], tuple):
                _, voice = tag_stack.pop()
                vm = _VOICE_RE.match(voice)
                if vm and vm.group("annotation"):
                    classes = (
                        [c for c in vm.group("cls").split(".") if c]
                        if vm.group("cls")
                        else []
                    )
                    stack[-1].append(
                        _Span(
                            "v",
                            annotation=vm.group("annotation").strip(),
                            classes=classes,
                            components=children,
                        )
                    )
        pos = m.end()
    if pos < len(cue_text):
        stack[-1].append(_Span("text", text=cue_text[pos:]))
    return _Cue(identifier, start, end, stack[0])


def _parse_vtt(text: str) -> list[_Cue]:
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    if not (
        text == "WEBVTT"
        or (len(text) > 6 and text.startswith("WEBVTT") and text[6] in (" ", "\t", "\n"))
    ):
        raise ValueError("Invalid WebVTT file signature")
    parts = text.split("\n", 1)
    body = parts[1] if len(parts) > 1 else ""
    body = re.sub(r"^(NOTE[^\n]*\n(?:.+\n)*?)\n", "", body, flags=re.MULTILINE)
    body = re.sub(r"^(STYLE|REGION)(?:.+\n)*?\n", "", body, flags=re.MULTILINE)
    cues = []
    for block in re.split(r"\n\s*\n", body.strip()):
        try:
            cues.append(_parse_cue(block))
        except ValueError:
            continue
    return cues


def _flat_text(span: _Span) -> str:
    if span.kind == "text":
        return span.text
    return "".join(t.text for t in span.components if t.kind == "text")


def _add_component(doc: SpanDoc, span: _Span, parent: Item) -> None:
    fmt = Formatting(
        bold=span.kind == "b",
        italic=span.kind == "i",
        underline=span.kind == "u",
    )
    text = _flat_text(span).strip()
    if text:
        doc.add_text("text", text, parent=parent.idx, formatting=fmt)


def extract_vtt(raw: bytes, name: str = "file") -> SpanDoc:
    text = raw.decode("utf-8")
    doc = SpanDoc(name)
    for cue in _parse_vtt(text):
        block = doc.add_group("section", name="WebVTT cue block")
        if cue.identifier:
            doc.add_text("text", cue.identifier, parent=block.idx)
        doc.add_text("text", f"{cue.start} --> {cue.end}", parent=block.idx)
        for span in cue.payload:
            if span.kind == "v":
                voice_group = doc.add_group(
                    "inline", name="WebVTT cue voice span", parent=block.idx
                )
                voice = span.annotation
                if span.classes:
                    voice += f" ({', '.join(span.classes)})"
                voice += ": "
                doc.add_text("text", voice, parent=voice_group.idx)
                for item in span.components:
                    _add_component(doc, item, voice_group)
            else:
                _add_component(doc, span, block)
    return doc

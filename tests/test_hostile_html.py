"""Hostile-HTML containment: the extractor must terminate quickly and never
raise on adversarial bytes (one bad doc must not stall or kill a 10^12-row
task — SURVEY.md §2.5 containment rule + §7.4 skew risk)."""

from __future__ import annotations

import time

import pytest

from docling_spark.htmlx.extract import HtmlExtractor
from docling_spark.job import _extract_one

CASES = {
    "empty": b"",
    "binary_garbage": b"\x00\x01\x02\xff\xfe" * 100,
    "truncated_table": b"<html><body><table><tr><td>a</td",
    "colspan_bomb": (
        b"<html><body><table><tr>"
        b"<td colspan='999999999' rowspan='888888888'>x</td>"
        b"</tr></table></body></html>"
    ),
    "span_bomb_many": b"<html><body><table>"
    + b"<tr><td colspan='4096' rowspan='4096'>x</td></tr>" * 50
    + b"</table></body></html>",
    "deep_nest": b"<html><body>" + b"<div>" * 5000 + b"hi" + b"</div>" * 5000,
    "deep_nest_unclosed": b"<html><body>" + b"<div>" * 20000 + b"hi",
    "invalid_utf8": b"<html><body><p>caf\xe9 \xff\xfe broken</p></body></html>",
    "null_bytes": b"<html><body><p>a\x00b</p></body></html>",
    "huge_attribute": b"<html><body><p class='" + b"x" * 1_000_000 + b"'>t</p></body></html>",
    "nested_tables": b"<html><body>"
    + b"<table><tr><td>" * 300
    + b"deep"
    + b"</td></tr></table>" * 300
    + b"</body></html>",
    "comment_unclosed": b"<html><body><p>before</p><!-- never closed",
    "cdata_script": b"<html><body><script><![CDATA[<p>not text</p>]]></script><p>real</p></body></html>",
}


@pytest.mark.parametrize("name", sorted(CASES), ids=str)
def test_extractor_contains_hostile_input(name: str):
    blob = CASES[name]
    t0 = time.time()
    doc = HtmlExtractor(base_uri="None").convert(blob)  # must not raise
    assert time.time() - t0 < 30
    assert doc.items is not None


@pytest.mark.parametrize("name", sorted(CASES), ids=str)
def test_udf_row_never_fails_task(name: str):
    out = _extract_one(f"https://x.test/{name}", CASES[name], "html", "none", 60.0)
    assert out["status"] in ("success", "failure", "skipped")


def test_deep_nest_preserves_content():
    # depth cap flattens nesting but keeps the text
    doc = HtmlExtractor(base_uri="None").convert(
        b"<html><body>" + b"<div>" * 5000 + b"payload-text"
    )
    assert any("payload-text" in (it.text or "") for it in doc.items)


def test_script_style_hidden_stripped():
    doc = HtmlExtractor(base_uri="None").convert(
        b"<html><body><script>var x=1;</script><style>p{}</style>"
        b"<p hidden>gone</p><p>kept</p></body></html>"
    )
    texts = [it.text for it in doc.items if it.text]
    assert "kept" in texts
    assert all("var x" not in t and "gone" != t for t in texts)

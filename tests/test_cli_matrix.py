"""Convert-CLI matrix over the reference golden corpus.

Reference CLI: /root/reference/docling/cli/main.py:307-871 (`docling
<sources> --from ... --to ... --page-range ...`). The matrix drives
`docling_spark convert` across one representative fixture per backend and
every output format, byte-comparing md/itxt/json against the frozen
goldens and structurally checking the html/doctags outputs.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from docling_spark.__main__ import convert_main

DATA = Path("/root/reference/tests/data")
GT = DATA / "groundtruth/docling_v2"

# (fixture path, golden stem) — one per backend with md+itxt+json goldens
MATRIX = [
    (DATA / "html/example_01.html", "example_01"),
    (DATA / "docx/word_sample.docx", "word_sample.docx"),
    (DATA / "xlsx/xlsx_01.xlsx", "xlsx_01.xlsx"),
    (DATA / "csv/csv-comma.csv", "csv-comma.csv"),
    (DATA / "md/wiki.md", "wiki.md"),
    (DATA / "webvtt/webvtt_example_01.vtt", "webvtt_example_01.vtt"),
]


@pytest.mark.parametrize("src,stem", MATRIX, ids=lambda v: getattr(v, "name", v))
def test_cli_all_formats_byte_parity(tmp_path, src, stem):
    rc = convert_main(
        [str(src), "--to", "md,itxt,json,html,doctags", "--output", str(tmp_path)]
    )
    assert rc == 0
    out_stem = src.stem
    for ext, golden_ext in ((".md", ".md"), (".itxt", ".itxt"), (".json", ".json")):
        golden = GT / f"{stem}{golden_ext}"
        if not golden.exists():
            continue
        got = (tmp_path / f"{out_stem}{ext}").read_text()
        want = golden.read_text()
        if golden_ext == ".json":
            # same normalization the golden suites use: version pin +
            # embedded picture payloads (we don't extract image bytes)
            def norm(d):
                d["version"] = "X"
                # upstream renamed some fixtures after golden generation
                # (xlsx_01.xlsx's golden says test-01.xlsx) — the name
                # fields just echo the input filename
                d["name"] = "X"
                d.get("origin", {})["filename"] = "X"
                for p in d.get("pictures", []):
                    p.pop("image", None)
                return d

            assert norm(json.loads(got)) == norm(json.loads(want)), (
                f"{stem}.json"
            )
        else:
            assert got == want.rstrip("\n") or got == want, f"{stem}{golden_ext}"
    # html + doctags written and well-formed-ish
    html = (tmp_path / f"{out_stem}.html").read_text()
    assert html.lstrip().startswith("<!DOCTYPE html>") or "<html" in html
    dt = (tmp_path / f"{out_stem}.doctags.txt").read_text()
    assert dt.startswith("<doctag>") and dt.endswith("</doctag>")


def test_cli_page_range(tmp_path):
    src = DATA / "pdf/multi_page.pdf"
    assert convert_main([str(src), "--to", "md", "--output", str(tmp_path)]) == 0
    full = (tmp_path / "multi_page.md").read_text()
    assert (
        convert_main(
            [
                str(src),
                "--to",
                "md",
                "--output",
                str(tmp_path / "r"),
                "--page-range",
                "2-3",
            ]
        )
        == 0
    )
    part = (tmp_path / "r" / "multi_page.md").read_text()
    assert part and part in full and len(part) < len(full)


def test_cli_max_num_pages_fails_cleanly(tmp_path):
    src = DATA / "pdf/multi_page.pdf"
    rc = convert_main(
        [str(src), "--to", "md", "--output", str(tmp_path), "--max-num-pages", "2"]
    )
    assert rc == 1  # reported as a failure, no crash


def test_cli_from_allowlist_skips(tmp_path, capsys):
    srcs = [str(DATA / "html/example_01.html"), str(DATA / "csv/csv-comma.csv")]
    rc = convert_main(srcs + ["--to", "md", "--output", str(tmp_path), "--from", "csv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "skipped example_01.html" in out
    assert (tmp_path / "csv-comma.md").exists()
    assert not (tmp_path / "example_01.md").exists()


def test_cli_pdf_password(tmp_path):
    src = DATA / "pdf_password/2206.01062_pg3.pdf"
    assert (
        convert_main(
            [
                str(src),
                "--to",
                "md",
                "--output",
                str(tmp_path),
                "--pdf-password",
                "1234",
            ]
        )
        == 0
    )
    assert "DocLayNet" in (tmp_path / "2206.01062_pg3.md").read_text()
    # wrong password: clean failure exit code
    assert (
        convert_main(
            [str(src), "--to", "md", "--output", str(tmp_path / "x")]
        )
        == 1
    )


def test_cli_abort_on_error(tmp_path):
    """--abort-on-error (reference raises_on_error) stops at the first
    failure instead of converting the remaining sources."""
    bad = tmp_path / "bad.pdf"
    bad.write_bytes(b"%PDF-1.4 truncated")
    good = DATA / "csv/csv-comma.csv"
    out = tmp_path / "out"
    rc = convert_main(
        [str(bad), str(good), "--to", "md", "--output", str(out),
         "--abort-on-error"]
    )
    assert rc == 1
    assert not (out / "csv-comma.md").exists()
    # default: containment, remaining sources still convert
    rc2 = convert_main([str(bad), str(good), "--to", "md", "--output", str(out)])
    assert rc2 == 1 and (out / "csv-comma.md").exists()

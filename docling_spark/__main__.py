"""spark-submit entry point (north rule launch mode).

    zip -r engine.zip docling_spark            # or tools/make_pyfiles.py
    spark-submit --py-files engine.zip \
        --conf spark.sql.adaptive.enabled=true \
        $(python -c 'import docling_spark.__main__ as m; print(m.__file__)') \
        --input /path/to/pages_parquet --output /path/to/out --run-id R1

Reads the Common-Crawl-shaped pages table (url, warc_ts, html, text, lang),
runs the resumable chunked extraction (see job.ExtractionRunner), writes
data + lineage + metrics. Re-submitting with the same --run-id resumes from
the last committed chunk.
"""

from __future__ import annotations

import argparse
import json
import sys


def convert_main(argv: list[str]) -> int:
    """Reference-CLI parity (`docling <sources> --to md --output dir`,
    /root/reference/docling/cli/main.py:307): convert local files through
    the same extraction cores, no Spark session needed."""
    p = argparse.ArgumentParser(prog="docling_spark convert")
    p.add_argument("sources", nargs="+", help="html/pdf files")
    p.add_argument(
        "--to",
        default="md",
        help="comma list of md,itxt,json,text,html,doctags",
    )
    p.add_argument("--output", default=".", help="output directory")
    p.add_argument(
        "--pdf-password",
        default="",
        help="password for encrypted PDFs (standard security handler)",
    )
    p.add_argument(
        "--page-range",
        default=None,
        metavar="A-B",
        help="1-based inclusive PDF page range (reference --page-range)",
    )
    p.add_argument(
        "--max-num-pages",
        type=int,
        default=None,
        help="fail PDFs with more pages (reference DocumentLimits)",
    )
    p.add_argument(
        "--abort-on-error",
        action="store_true",
        help="stop at the first failed document (reference raises_on_error)",
    )
    p.add_argument(
        "--version",
        action="version",
        version="docling_spark 3.0 (docling 2.63.0 replication contract)",
    )
    p.add_argument(
        "--from",
        dest="from_formats",
        default=None,
        help="comma allowlist of input formats (html,pdf,docx,xlsx,pptx,md,"
        "asciidoc,csv,vtt,jats,uspto,ofd,json); others are skipped",
    )
    args = p.parse_args(argv)
    page_range = (1, 2**31 - 1)
    if args.page_range:
        a, _, b = args.page_range.partition("-")
        page_range = (int(a), int(b or a))
    allowed = (
        {f.strip() for f in args.from_formats.split(",") if f.strip()}
        if args.from_formats
        else None
    )

    def fmt_allowed(fmt: str) -> bool:
        return allowed is None or fmt in allowed

    def detect_fmt(path, raw: bytes) -> str:
        """Mirror of the dispatch chain below, for the --from allowlist."""
        suf = path.suffix.lower()
        if raw[:5] == b"%PDF-" or suf == ".pdf":
            return "pdf"
        if raw[:6] == b"WEBVTT" or suf == ".vtt":
            return "vtt"
        if suf == ".docx" or (raw[:2] == b"PK" and b"word/document.xml" in raw):
            return "docx"
        if suf in (".pptx", ".pptm", ".potx") or (
            raw[:2] == b"PK" and b"ppt/presentation.xml" in raw
        ):
            return "pptx"
        if suf in (".xlsx", ".xlsm") or (
            raw[:2] == b"PK" and b"xl/workbook.xml" in raw
        ):
            return "xlsx"
        from .usptox import looks_like_uspto

        if suf != ".nxml" and looks_like_uspto(raw):
            return "uspto"
        if suf == ".nxml" or (
            b"JATS-journalpublishing" in raw[:8192]
            or b"JATS-archive" in raw[:8192]
        ):
            return "jats"
        if suf in (".adoc", ".asciidoc", ".asc"):
            return "asciidoc"
        if suf in (".md", ".markdown"):
            return "md"
        if suf == ".ofd" or (raw[:2] == b"PK" and b"OFD.xml" in raw):
            return "ofd"
        if suf == ".csv":
            return "csv"
        return "html"

    from pathlib import Path

    from .htmlx.extract import extract_html
    from .pdfx.extract import extract_pdf_text
    from .serialize import to_itxt, to_markdown
    from .serialize_json import to_docling_json

    formats = [f.strip() for f in args.to.split(",") if f.strip()]
    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)
    failures = 0
    for src in args.sources:
        path = Path(src)
        raw = path.read_bytes()
        doc = None
        if not fmt_allowed(detect_fmt(path, raw)):
            print(f"skipped {path.name}: format not in --from")
            continue
        try:
            if raw[:5] == b"%PDF-" or path.suffix.lower() == ".pdf":
                res = extract_pdf_text(
                    raw,
                    password=args.pdf_password,
                    page_range=page_range,
                    max_num_pages=args.max_num_pages,
                )
                if res.status in ("failure",):
                    raise RuntimeError(res.error or res.status)
                outputs = {"md": res.text, "text": res.text, "itxt": None, "json": None}
            elif raw[:6] == b"WEBVTT" or path.suffix.lower() == ".vtt":
                from .vttx import extract_vtt

                doc = extract_vtt(raw, name=path.stem)
                # reference vtt goldens export with escape_html=False
                # (tests/test_backend_vtt.py:220) — same as the job path
                outputs = {
                    "md": to_markdown(doc, escape_html=False),
                    "text": to_markdown(doc, escape_html=False),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(doc, path.name, raw, mimetype="text/vtt"),
                }
            elif path.suffix.lower() == ".docx" or (
                raw[:2] == b"PK" and b"word/document.xml" in raw
            ):
                from .docxx import extract_docx

                doc = extract_docx(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc,
                        path.name,
                        raw,
                        mimetype=(
                            "application/vnd.openxmlformats-officedocument."
                            "wordprocessingml.document"
                        ),
                    ),
                }
            elif path.suffix.lower() in (".pptx", ".pptm", ".potx") or (
                raw[:2] == b"PK" and b"ppt/presentation.xml" in raw
            ):
                from .pptxx import extract_pptx

                doc = extract_pptx(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc,
                        path.name,
                        raw,
                        mimetype="application/vnd.ms-powerpoint",
                    ),
                }
            elif path.suffix.lower() in (".xlsx", ".xlsm") or (
                raw[:2] == b"PK" and b"xl/workbook.xml" in raw
            ):
                from .xlsxx import extract_xlsx

                doc = extract_xlsx(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc,
                        path.name,
                        raw,
                        mimetype=(
                            "application/vnd.openxmlformats-officedocument."
                            "spreadsheetml.sheet"
                        ),
                    ),
                }
            elif path.suffix.lower() != ".nxml" and __import__(
                "docling_spark.usptox", fromlist=["looks_like_uspto"]
            ).looks_like_uspto(raw):
                from .usptox import extract_uspto

                doc = extract_uspto(raw, name=path.name)
                mime = (
                    "text/plain" if raw.startswith(b"PATN") else "application/xml"
                )
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, None),
                    "json": to_docling_json(doc, path.name, raw, mimetype=mime),
                }
            elif path.suffix.lower() == ".nxml" or (
                b"JATS-journalpublishing" in raw[:8192]
                or b"JATS-archive" in raw[:8192]
            ):
                from .jatsx import extract_jats

                doc = extract_jats(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc, path.name, raw, mimetype="application/xml"
                    ),
                }
            elif path.suffix.lower() in (".adoc", ".asciidoc", ".asc"):
                from .asciidocx import extract_asciidoc

                doc = extract_asciidoc(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc, path.name, raw, mimetype="text/asciidoc"
                    ),
                }
            elif path.suffix.lower() in (".md", ".markdown"):
                from .mdx import extract_markdown

                doc = extract_markdown(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc, path.name, raw, mimetype="text/markdown"
                    ),
                }
            elif raw.lstrip()[:8] == b"<doctag>":
                from .doctagsx import parse_doctags

                doc = parse_doctags(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc, path.name, raw, mimetype="text/plain"
                    ),
                }
            elif path.suffix.lower() == ".ofd" or (
                raw[:2] == b"PK" and b"OFD.xml" in raw
            ):
                from .ofdx import extract_ofd

                doc = extract_ofd(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(
                        doc, path.name, raw, mimetype="application/zip"
                    ),
                }
            elif path.suffix.lower() == ".csv":
                from .csvx import extract_csv

                doc = extract_csv(raw, name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(doc, path.name, raw, mimetype="text/csv"),
                }
            else:
                doc = extract_html(raw, base_uri="None", name=path.stem)
                outputs = {
                    "md": to_markdown(doc),
                    "text": to_markdown(doc),
                    "itxt": to_itxt(doc, 70),
                    "json": to_docling_json(doc, path.name, raw),
                }
        except Exception as e:  # noqa: BLE001 — per-file containment
            print(f"FAILED {path.name}: {e}", file=sys.stderr)
            failures += 1
            if args.abort_on_error:
                return 1
            continue
        if doc is not None:
            # formats every SpanDoc backend supports; the PDF text path has
            # no SpanDoc and keeps its md/text-only outputs
            if "html" in formats:
                from .serialize_html import to_html

                outputs["html"] = to_html(doc)
            if "doctags" in formats:
                from .serialize_doctags import to_doctags

                outputs["doctags"] = to_doctags(doc)
        ext_map = {
            "md": ".md",
            "itxt": ".itxt",
            "json": ".json",
            "text": ".txt",
            "html": ".html",
            "doctags": ".doctags.txt",
        }
        for fmt in formats:
            content = outputs.get(fmt)
            if content is not None:
                (outdir / (path.stem + ext_map.get(fmt, f".{fmt}"))).write_text(content)
        print(f"converted {path.name}")
    return 1 if failures else 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "convert":
        return convert_main(argv[1:])
    if argv and argv[0] == "web":
        # reference web_demo.py analog: upload-convert REST demo
        from docling_spark.web_demo import main as web_main

        return web_main(argv[1:])
    p = argparse.ArgumentParser(prog="docling_spark")
    p.add_argument("--input", required=True, help="pages table path (parquet/iceberg)")
    p.add_argument("--output", required=True, help="output root (data/ + lineage/)")
    p.add_argument("--run-id", required=True)
    p.add_argument("--num-chunks", type=int, default=64)
    p.add_argument("--base-uri-mode", choices=["none", "url"], default="none")
    p.add_argument("--max-bytes", type=int, default=64 * 1024 * 1024)
    p.add_argument("--no-dedup-latest", action="store_true")
    p.add_argument(
        "--since-snapshot",
        default=None,
        help="previous crawl snapshot path: process only added/changed "
        "urls (crawl CDC, ops/snapshot.delta_worklist) — the O(delta) "
        "nightly incremental mode",
    )
    p.add_argument("--pdf-password", default="")
    p.add_argument("--master", default=None, help="only for local runs; under spark-submit leave unset")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # absolute import: under `spark-submit path/to/__main__.py` this file is
    # a top-level script, and the package itself arrives via --py-files
    from docling_spark.job import ExtractionRunner, RunConfig, tuned_session

    if args.master:
        spark = tuned_session(master=args.master)
    else:
        # under spark-submit the session/config comes from the launcher
        spark = SparkSession.builder.getOrCreate()

    pages = spark.read.parquet(args.input)
    if args.since_snapshot:
        from docling_spark.ops.snapshot import delta_worklist

        old = spark.read.parquet(args.since_snapshot)
        pages = delta_worklist(old, pages).drop("status")
    cfg = RunConfig(
        run_id=args.run_id,
        output_path=args.output,
        num_chunks=args.num_chunks,
        base_uri_mode=args.base_uri_mode,
        max_bytes=args.max_bytes,
        dedup_latest=not args.no_dedup_latest,
        pdf_password=args.pdf_password,
    )
    stats = ExtractionRunner(spark, cfg).run(pages)
    print(json.dumps({"run_id": args.run_id, **stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
